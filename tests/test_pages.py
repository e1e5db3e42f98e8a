"""Pages ingest: byte-identical text extraction + exact edge sets
(BASELINE.json:15 gating invariant)."""

from pyspark.sql import functions as F

from networkx_graph_spark.sources.pages import (
    encode_edges,
    extract_text,
    normalize_url,
    pages_to_edges,
    parse_pages,
)
from networkx_graph_spark.sources.pages_synth import (
    expected_edges,
    expected_normalized,
    synth_pages,
)

N_PAGES = 120


def test_normalize_url():
    base = "https://example.com/p/3"
    assert normalize_url(base, "/p/7") == "https://example.com/p/7"
    assert normalize_url(base, "../p/7") == "https://example.com/p/7"
    assert normalize_url(base, "HTTPS://EXAMPLE.COM/p/7") == "https://example.com/p/7"
    assert normalize_url(base, "https://example.com:443/p/7") == "https://example.com/p/7"
    assert normalize_url(base, "http://example.com:80/p/7") == "http://example.com/p/7"
    assert normalize_url(base, "http://example.com:8080/a") == "http://example.com:8080/a"
    assert normalize_url(base, "https://example.com/p/7#frag") == "https://example.com/p/7"
    assert normalize_url(base, "mailto:x@y.z") is None
    assert normalize_url(base, "javascript:void(0)") is None
    assert normalize_url(base, "https://Other.ORG/x/1?a=1") == "https://other.org/x/1?a=1"
    assert normalize_url(base, "https://example.com") == "https://example.com/"


def test_extract_text_unit():
    html = (
        b"<html><head><title>T</title><script>if (a<b) {}</script></head>"
        b"<body><h1>Hello &amp; bye</h1><p>one  two\n three</p>"
        b"<div>four</div><span>five</span> six</body></html>"
    )
    # raw source newlines split lines too (whitespace-normalized per line)
    assert extract_text(html) == "Hello & bye\none two\nthree\nfour\nfive six"


def test_byte_identical_text(spark):
    pages = synth_pages(spark, N_PAGES)
    parsed = parse_pages(pages)
    joined = pages.select("url", F.col("text").alias("expected")).join(
        parsed.select("url", "text"), "url"
    )
    n_bad = joined.filter(F.col("text") != F.col("expected")).count()
    assert n_bad == 0
    assert joined.count() == N_PAGES


def test_links_normalized(spark):
    pages = synth_pages(spark, N_PAGES)
    got = {
        r["url"]: r["links"] for r in parse_pages(pages).select("url", "links").collect()
    }
    for i in (0, 1, 5, 57, N_PAGES - 1):
        url = f"https://example.com/p/{i}"
        assert got[url] == expected_normalized(i, N_PAGES, 42), url


def test_edges_exact(spark):
    pages = synth_pages(spark, N_PAGES)
    edges = pages_to_edges(pages)
    got = {(r["src_url"], r["dst_url"]) for r in edges.collect()}
    assert got == expected_edges(N_PAGES)


def test_encode_edges(spark):
    pages = synth_pages(spark, N_PAGES)
    eu = pages_to_edges(pages)
    enc, ids = encode_edges(eu)
    assert enc.count() == eu.count()
    # ids dense from 1_000_000 (urls never parse as ints)
    id_vals = sorted(r["id"] for r in ids.collect())
    assert id_vals[0] == 1_000_000
    assert id_vals == list(range(1_000_000, 1_000_000 + len(id_vals)))


def test_read_pages_format_agnostic(spark, tmp_path):
    """read_pages resolves a filesystem path as parquet and a bare table
    identifier through the session catalog (the Iceberg path at design
    scale)."""
    from networkx_graph_spark.sources.pages import read_pages

    df = spark.createDataFrame([("http://a/", b"<p>hi</p>")], "url string, html binary")
    p = str(tmp_path / "pages_pq")
    df.write.parquet(p)
    assert read_pages(spark, p).count() == 1

    df.write.mode("overwrite").option("path", str(tmp_path / "pages_tbl")).saveAsTable(
        "pages_fixture_tbl"
    )
    try:
        got = read_pages(spark, "pages_fixture_tbl")
        assert got.count() == 1 and set(got.columns) == {"url", "html"}
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_fixture_tbl")


def test_read_pages_bare_relative_dir(spark):
    """A bare relative directory name (no '/', no .parquet suffix) that
    exists on the filesystem reads as parquet, not as a catalog
    identifier."""
    import shutil

    from networkx_graph_spark.sources.pages import read_pages

    name = "pages_probe_dir_fixture"
    df = spark.createDataFrame([("http://a/", b"<p>hi</p>")], "url string, html binary")
    df.write.mode("overwrite").parquet(name)
    try:
        assert read_pages(spark, name).count() == 1
    finally:
        shutil.rmtree(name, ignore_errors=True)


def test_read_pages_catalog_shadows_cwd_and_crisp_miss(spark, tmp_path):
    """Catalog-first resolution: a registered table wins over a
    same-named cwd dir (resolution must not be cwd-dependent); a name
    found nowhere raises the documented boundary error instead of a
    bogus parquet read."""
    import shutil

    import pytest

    from networkx_graph_spark.sources.pages import read_pages

    name = "pages_shadow_fixture"
    tbl = spark.createDataFrame(
        [("http://t/", b"<p>t</p>"), ("http://u/", b"<p>u</p>")],
        "url string, html binary",
    )
    tbl.write.mode("overwrite").option("path", str(tmp_path / "shadow_tbl")).saveAsTable(name)
    # decoy cwd dir with DIFFERENT row count
    spark.createDataFrame(
        [("http://x/", b"<p>x</p>")], "url string, html binary"
    ).write.mode("overwrite").parquet(name)
    try:
        assert read_pages(spark, name).count() == 2  # catalog, not cwd
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(name, ignore_errors=True)

    with pytest.raises(ValueError, match="neither a registered table"):
        read_pages(spark, "no_such_table_anywhere_xyz")
