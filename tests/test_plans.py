"""Physical-plan discipline: projections and filters must reach the
parquet scans (PLANS.md); scans that read every column for a 2-column
projection are wrong at 100 TB."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _scan_lines(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [ln for ln in plan.splitlines() if "ReadSchema" in ln or "PushedFilters" in ln], plan


def test_column_pruning_reaches_scan(spark):
    from networkx_graph_spark.contract import q_doc_tokens

    df = q_doc_tokens(spark, SF_DIR)
    lines, plan = _scan_lines(df)
    schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schemas
    for ln in schemas:
        # documents has (doc_id, url, lang, text, ...); the query needs
        # only doc_id + text — lang/url must be pruned from the scan
        assert "lang" not in ln and "url" not in ln


def test_filter_pushdown_reaches_scan(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") < 5
    )
    plan = emb._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,5)]" in plan


def test_kernel_join_uses_partial_aggregation(spark):
    """The PageRank contribution sum must be map-side partial (partial_sum
    HashAggregate below the exchange) — the hub-skew reducer."""
    from networkx_graph_spark.contract import tri_edges

    e = tri_edges(spark, SF_DIR)
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    plan = deg._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan


def _count_jobs(spark, fn):
    """Run fn() under a dedicated job group and count the blocking driver
    ACTIONS it scheduled. Two classes of job id are excluded, because they
    are children of a single action, not extra barriers: (a) AQE
    shuffle-stage materializations (AQE is disabled for the measurement),
    (b) broadcast-exchange jobs (submitted from the broadcast thread pool;
    their callsite is the CompletableFuture lambda)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = set(tracker.getJobIdsForGroup("jobcount"))
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # group id only (setJobGroup would overwrite every job DESCRIPTION,
    # erasing the broadcast-thread callsite we filter on)
    sc.setLocalProperty("spark.jobGroup.id", "jobcount")
    try:
        fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    new_ids = set(tracker.getJobIdsForGroup("jobcount")) - before
    store = sc._jsc.sc().statusStore()
    jobs = store.jobsList(None)
    actions = 0
    for i in range(jobs.size()):
        j = jobs.apply(i)
        if j.jobId() not in new_ids:
            continue
        desc = j.description().get() if j.description().isDefined() else j.name()
        if "CompletableFuture" not in desc:
            actions += 1
    return actions


def test_sssp_one_job_per_superstep(spark):
    """The SSSP kernel must schedule exactly one Spark job per superstep
    (+1 for the seed checkpoint): convergence count and p2p target hits
    ride the state-checkpoint action as Observation metrics, never as
    separate isEmpty/collect jobs."""
    from networkx_graph_spark.operators.sssp import bounded_sssp

    # chain 0->1->...->6: 6 improving supersteps + 1 confirming round
    edges = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(6)], "src long, dst long, weight double"
    )
    seeds = spark.createDataFrame(
        [(0, 0, 0.0, -1, float("-inf"))],
        "qid long, node long, dist double, prev long, prev_dist double",
    )
    jobs = _count_jobs(
        spark, lambda: bounded_sssp(spark, edges, seeds, cutoffs=100.0).collect()
    )
    # 1 seed checkpoint + 7 supersteps + 1 final collect
    assert jobs <= 9, f"expected <=9 jobs (1 seed + 7 supersteps + collect), got {jobs}"


def test_pagerank_one_job_per_superstep(spark):
    """PageRank at fuse=1: one job per iteration plus fixed setup jobs
    (vertex count, edge persist count, dangling count)."""
    from networkx_graph_spark.kernels.pagerank import pagerank

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (5, 0)], "src long, dst long"
    )
    jobs = _count_jobs(spark, lambda: pagerank(e, tol=-1.0, max_iter=5).state.collect())
    # 3 setup counts + 1 init checkpoint + 5 supersteps + 1 collect = 10
    assert jobs <= 10, f"expected <=10 jobs, got {jobs}"


def test_runner_table_namespace_and_cadence_guard(spark, tmp_path):
    """Catalog checkpoint-table names are namespaced by checkpoint_dir so
    two runs sharing a kernel name cannot DROP each other's entries; and
    bucketed mode rejects checkpoint_every != 1 instead of silently
    writing every superstep anyway."""
    import pytest

    from networkx_graph_spark.plans.supersteps import SuperstepRunner

    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    r1 = SuperstepRunner(spark, checkpoint_dir=d1, bucket_cols=["id"], bucket_count=4)
    r2 = SuperstepRunner(spark, checkpoint_dir=d2, bucket_cols=["id"], bucket_count=4)
    assert r1._table_name("sssp", 3) != r2._table_name("sssp", 3)
    # same dir -> same name (resume must find its own table)
    r1b = SuperstepRunner(spark, checkpoint_dir=d1, bucket_cols=["id"], bucket_count=4)
    assert r1._table_name("sssp", 3) == r1b._table_name("sssp", 3)

    with pytest.raises(ValueError, match="checkpoint_every"):
        SuperstepRunner(
            spark,
            checkpoint_dir=d1,
            checkpoint_every=2,
            bucket_cols=["id"],
            bucket_count=4,
        )


def test_bindings_enumeration_one_job_per_round(spark, graph1):
    """all_paths_to_bindings' enumeration loop runs ONE driver action per
    round (flagged state + Observation live-count) plus fixed setup: no
    isEmpty or per-round hit-collect jobs."""
    from networkx_graph_spark.operators.bindings import (
        all_paths_to_bindings,
        encode_bindings,
    )

    # pre-warm the graph's lazy one-time builds so the gate measures the
    # enumeration loop itself
    graph1.edges_w
    graph1.names_map
    graph1.lengths_map
    b = encode_bindings(graph1, {"w7": [(3, 4, "obj")]})
    jobs = _count_jobs(
        spark,
        lambda: all_paths_to_bindings(graph1, "w1", 50.0, b, direction=1),
    )
    # forward only: 1 no-successor probe + 5 rounds (deepest chain
    # w1>w3>w4>w6>w7 + terminal round) + 1 final hit collect
    assert jobs <= 7, f"expected <=7 driver actions, got {jobs}"


def test_cosine_topk_two_stage_plan(spark):
    """The exact cosine re-rank must execute as a TWO-stage top-k:
    Catalyst's InferWindowGroupLimit turns the row_number window +
    rank<=k filter into a per-partition Partial WindowGroupLimit BELOW
    the per-qid exchange (each map partition truncated to <= k rows per
    query) and a Final above it — the shuffle carries k·P rows per
    query, never the full scored corpus. This gate pins that shape so a
    refactor (different window function, lost rank filter) cannot
    silently reintroduce the single-reducer-per-query plan."""
    from networkx_graph_spark.contract import q_embed_topk

    df = q_embed_topk(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    i_final = plan.find("WindowGroupLimit")
    assert i_final >= 0 and ", Final" in plan, plan
    i_exch = plan.find("Exchange hashpartitioning(qid", i_final)
    assert i_exch > i_final, "per-qid exchange must sit below the Final limit"
    i_partial = plan.find("WindowGroupLimit", i_exch)
    assert i_partial > i_exch and ", Partial" in plan[i_partial:], (
        "map-side Partial WindowGroupLimit must sit below the exchange "
        "(otherwise the full scored corpus shuffles into one task per "
        "query)\n" + plan
    )
