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
