"""SparkSession factory with scale-appropriate defaults.

Single place where engine-wide Spark configs live so tests, bench and the
driver contract all run with the same posture:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing);
- Arrow on (vectorized pandas-UDF transfer — the only sanctioned Python path);
- UTC session timezone (DuckDB oracle comparisons are TZ-naive);
- shuffle partitions sized to cores, not the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "networkx_graph_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core; a real cluster would
        # size this to ~2-3x total executor cores (or let AQE coalesce down
        # from a high initial number).
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else max(1, int(n))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Join strategy: sort-merge stays the default. MEASURED this round
        # (BENCH/r06/bench_a2_shj.json vs bench_a1.json): a global
        # preferSortMergeJoin=false + AQE shuffled-hash rewrite regressed
        # the superstep kernels (pagerank_powerlaw 24.3->36.0s, cc_powerlaw
        # 14.5->18.5s — per-superstep hash-map rebuilds beat re-sorts only
        # on paper here) and was a wash for the wedge joins (triangles
        # 5.4s vs 5.6s warm either way). Guide §3.1's advice to pick
        # deliberately, applied: deliberately sort-merge.
        # 300s default broadcastTimeout is a known failure mode for long
        # degraded stages on busy hosts/clusters: the action thread throws
        # while the broadcast stage is still computing, killing the whole
        # job (seen in the 64M-edge endurance run under host contention)
        .config("spark.sql.broadcastTimeout", "3600")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
