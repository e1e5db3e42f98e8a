"""Deterministic synthetic graph generators (seeded, partition-invariant).

The bench/scaling evidence needs a power-law edge table with hub skew
(FIXTURES.md §4). Determinism rule: every value is a pure function of
(seed, row index) via ``xxhash64`` — the same table comes out at any
parallelism / partition count, which is exactly what the local[8] vs
local[32] identical-results gate requires. No driver-side RNG, no
``rand()`` (Spark's rand is partition-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_M = 2_147_483_647  # 2^31 - 1


def _u01(seed: int, salt: int, col):
    """Uniform (0,1] as a pure function of (seed, salt, col)."""
    h = F.abs(F.xxhash64(F.lit(seed), F.lit(salt), col)) % F.lit(_M)
    return (h + F.lit(1)).cast("double") / F.lit(float(_M))


def powerlaw_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    seed: int = 42,
    exponent: float = 2.5,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, dst) with Zipf-ish endpoint skew: vertex v is picked with
    probability ∝ its rank via inverse-CDF ``floor(N * u^exponent)`` —
    low ids become hubs holding a constant share of edges (the salted-join
    / AQE-skew stress case). Self-loops removed; duplicates kept (real
    link graphs have them; dedupe is the caller's choice)."""
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = spark.range(0, n_edges, numPartitions=num_partitions)
    src = F.floor(F.lit(float(n_vertices)) * F.pow(_u01(seed, 1, F.col("id")), exponent))
    dst = F.floor(F.lit(float(n_vertices)) * F.pow(_u01(seed, 2, F.col("id")), exponent))
    return (
        base.select(src.cast("long").alias("src"), dst.cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def uniform_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """(src, dst) uniform random digraph, deterministic in (seed, index)."""
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = spark.range(0, n_edges, numPartitions=num_partitions)
    src = (F.abs(F.xxhash64(F.lit(seed), F.lit(11), F.col("id"))) % n_vertices)
    dst = (F.abs(F.xxhash64(F.lit(seed), F.lit(12), F.col("id"))) % n_vertices)
    return (
        base.select(src.cast("long").alias("src"), dst.cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
