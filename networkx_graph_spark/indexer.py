"""Bidirectional string<->int64 node-id dictionary.

Reimplements the visible semantics of the reference ``Indexer``
(/root/reference/src/indexer.hpp:16-116):

- auto-assignment parses ``'44324' -> 44324`` and ``'w44324' -> 44324``
  (strip one leading ``w``; C++ ``std::stoll`` semantics: optional sign,
  leading-digit prefix parse — ``'12abc' -> 12``)
  (/root/reference/src/indexer.hpp:73-78);
- anything unparseable (or colliding with an already-taken int) allocates
  from a cursor starting at 1,000,000, skipping taken slots
  (/root/reference/src/indexer.hpp:83-87, :114);
- first-registered string wins an int id; later collisions fall through to
  the cursor.

Golden behavior: graph1 maps ``w1..w7 -> 1..7``
(/root/reference/tests/test_basic.py:1449-1453).

Two implementations:

- :class:`Indexer` — exact, order-dependent, driver-side. Used for fixture
  graphs and any small explicit node list (the order the reference sees is
  the call order, which only exists driver-side anyway).
- :func:`build_ids` — distributed bulk assignment for web-scale node sets
  (urls never parse as ints, so everything lands in the dense cursor range;
  the rule is made deterministic by ordering on a caller-supplied column,
  default the node string itself).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STOLL = re.compile(r"^\s*([+-]?[0-9]+)")
_CURSOR0 = 1_000_000


def _parse_stoll(s: str):
    """C++ std::stoll prefix-parse, or None."""
    body = s[1:] if s.startswith("w") else s
    m = _STOLL.match(body)
    if not m:
        return None
    try:
        v = int(m.group(1))
    except ValueError:  # pragma: no cover
        return None
    if v < -(2**63) or v >= 2**63:
        return None
    return v


class Indexer:
    """Exact order-dependent reimplementation of the reference Indexer."""

    def __init__(self):
        self._str2int: dict[str, int] = {}
        self._int2str: dict[int, str] = {}
        self._cursor = _CURSOR0

    def contains(self, key) -> bool:
        if isinstance(key, str):
            return key in self._str2int
        return key in self._int2str

    def get_id(self, key):
        if isinstance(key, str):
            return self._str2int.get(key)
        return self._int2str.get(key)

    def _register(self, str_id: str, int_id: int) -> bool:
        if str_id in self._str2int or int_id in self._int2str:
            return False
        self._str2int[str_id] = int_id
        self._int2str[int_id] = str_id
        return True

    def id(self, key):
        """str -> int64 (auto-setup), or int64 -> str (auto-setup)."""
        if isinstance(key, str):
            hit = self._str2int.get(key)
            if hit is not None:
                return hit
            parsed = _parse_stoll(key)
            if parsed is not None and self._register(key, parsed):
                return parsed
            while not self._register(key, self._cursor):
                self._cursor += 1
            out = self._cursor
            self._cursor += 1
            return out
        # int -> str with '/round' collision suffixes
        hit = self._int2str.get(key)
        if hit is not None:
            return hit
        base = str(key)
        cand, rnd = base, 0
        while cand in self._str2int:
            rnd += 1
            cand = f"{base}/{rnd}"
        self._register(cand, key)
        return cand

    def index(self) -> dict[str, int]:
        return dict(self._str2int)


def build_ids(nodes: DataFrame, node_col: str = "node", order_col: str | None = None) -> DataFrame:
    """Distributed bulk id assignment: ``(node STRING) -> (node, id BIGINT)``.

    Same visible rule as the reference cursor/parse behavior, made
    deterministic for bulk (unordered) input: direct parses win their int;
    among strings parsing to the same int the first in ``order_col`` order
    wins; everything else gets dense ids ``1_000_000 + rank`` in
    ``order_col`` order. (At web scale nothing parses, so this is a single
    sort + row_number job; parquet-friendly dense longs.)

    The rare case of direct-parsed ints landing inside the cursor range is
    handled exactly: cursor ids skip taken slots.
    """
    if order_col is None:
        order_col = node_col
    n = nodes.select(node_col).distinct()
    body = F.when(
        F.col(node_col).startswith("w"), F.expr(f"substring({node_col}, 2)")
    ).otherwise(F.col(node_col))
    parsed = F.regexp_extract(F.ltrim(body), r"^([+-]?[0-9]+)", 1)
    n = n.withColumn("_parsed", F.when(parsed != "", parsed.cast("long")))
    w = Window.partitionBy("_parsed").orderBy(order_col)
    n = n.withColumn(
        "_direct",
        F.when(F.col("_parsed").isNotNull() & (F.row_number().over(w) == 1), F.col("_parsed")),
    )
    fallback = n.filter(F.col("_direct").isNull())
    direct = n.filter(F.col("_direct").isNotNull()).select(
        node_col, F.col("_direct").alias("id")
    )
    # dense cursor assignment; skip slots already taken by direct parses
    taken = [
        r[0]
        for r in direct.filter(F.col("id") >= _CURSOR0)
        .select("id")
        .orderBy("id")
        .limit(100_000)
        .collect()
    ]
    wf = Window.orderBy(order_col)
    fb = fallback.select(node_col, (F.row_number().over(wf) - 1).alias("_rank"))
    if taken:
        # map rank -> k-th free integer >= cursor0 (taken list is tiny: only
        # direct parses >= 1e6; shift ranks past each taken slot)
        expr = F.col("_rank") + F.lit(_CURSOR0)
        for t in taken:
            expr = F.when(expr >= F.lit(t), expr + 1).otherwise(expr)
        fb = fb.select(node_col, expr.alias("id"))
    else:
        fb = fb.select(node_col, (F.col("_rank") + F.lit(_CURSOR0)).alias("id"))
    return direct.unionByName(fb)
