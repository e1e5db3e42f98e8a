"""CLI smoke entry points, mirroring
/root/reference/src/networkx_graph/__main__.py:9-13 (which dispatches
``add``/``subtract`` via python-fire; fire is not in this container, so a
stdlib argparse dispatcher provides the same surface):

    python -m networkx_graph_spark add 40 2
    python -m networkx_graph_spark subtract 40 2
"""

from __future__ import annotations

import argparse

from .functions.scalar import add, subtract


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="networkx_graph_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in ("add", "subtract"):
        p = sub.add_parser(name)
        p.add_argument("i", type=int)
        p.add_argument("j", type=int)
    args = parser.parse_args(argv)
    fn = {"add": add, "subtract": subtract}[args.cmd]
    print(fn(args.i, args.j))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
