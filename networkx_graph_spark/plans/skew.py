"""Explicit skew handling: hub detection + salted two-phase aggregation.

The north rule requires partitioning/shuffle/skew handled *explicitly*
(BASELINE.json:14). The session defaults already arm the implicit layers
(AQE skew-join splitting; hash aggregates are map-side partial, which
absorbs most power-law agg skew before the shuffle). This module is the
explicit layer for the cases those don't cover — e.g. high-cardinality
accumulations into a few hub keys where a single reducer partition still
receives a disproportionate merged load:

    salted:  groupBy(key, salt) partial-sum  ->  groupBy(key) final-sum

with the salt applied ONLY to detected hot keys (cold keys keep salt 0 so
they pay no second-stage cost beyond a single row).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hot_keys(
    edges: DataFrame, key: str = "dst", threshold: int = 10_000
) -> DataFrame:
    """Keys whose frequency exceeds ``threshold`` — the hub set (tiny;
    broadcastable by construction: at most |E|/threshold rows)."""
    return (
        edges.groupBy(key)
        .agg(F.count("*").alias("_deg"))
        .filter(F.col("_deg") > threshold)
        .select(F.col(key).alias("_hot_key"))
    )


def salted_sum(
    df: DataFrame,
    key_col: str,
    value_col: str,
    hot: DataFrame,
    num_salts: int = 16,
    salt_source: Optional[Column] = None,
) -> DataFrame:
    """Two-phase sum of ``value_col`` by ``key_col`` with explicit salting
    of hot keys. ``salt_source``: a column whose hash spreads a hot key's
    rows across salts (default: a deterministic hash of the value column's
    bit pattern is NOT usable — pass the natural spreading column, e.g.
    the message's source vertex). Results equal the plain groupBy-sum
    modulo FP summation order.
    """
    if salt_source is None:
        salt_source = F.spark_partition_id()
    j = df.join(
        F.broadcast(hot), df[key_col] == hot["_hot_key"], "left"
    )
    salt = F.when(
        F.col("_hot_key").isNotNull(), F.pmod(F.xxhash64(salt_source), F.lit(num_salts))
    ).otherwise(F.lit(0))
    partial = (
        j.withColumn("_salt", salt)
        .groupBy(key_col, "_salt")
        .agg(F.sum(value_col).alias("_psum"))
    )
    return partial.groupBy(key_col).agg(F.sum("_psum").alias(value_col))
