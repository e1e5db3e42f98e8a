"""Scalar demo functions kept as smoke hooks for CLI parity
(/root/reference/src/main.cpp:27, :2232-2243;
/root/reference/src/networkx_graph/__main__.py:9-13)."""


def add(i: int, j: int) -> int:
    return i + j


def subtract(i: int, j: int) -> int:
    return i - j
