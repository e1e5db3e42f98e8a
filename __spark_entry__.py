"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``networkx_graph_spark.contract``; queries
without an oracle entry are non-SQL-expressible (hash-based signatures,
fixpoint iteration) and get the rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from networkx_graph_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: tripartite link graph ->
    PageRank to 1e-6 convergence -> top-20 ranked nodes."""
    return contract.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.build_queries()


def oracle_sql() -> dict[str, str]:
    return contract.build_oracles()
