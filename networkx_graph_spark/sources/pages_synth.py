"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §1).

No external data (sandbox rule): pages are a pure function of
(seed, page index), generated distributed via mapInPandas over
``spark.range`` — the same table at any parallelism.

Each page's ``html`` is constructed so that :func:`pages.extract_text`
yields the ``text`` column **byte-identically** (the gating invariant,
BASELINE.json:15), and its anchors encode a known edge set covering the
normalization corner cases: relative/absolute hrefs, uppercase
scheme/host, fragments, default ports, empty queries, duplicate links,
self-links, non-http schemes, and links out of the corpus.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

BASE = "https://example.com/p"
EXT = "https://other.org/x"

_WORDS = (
    "link graph page crawl rank spark shuffle partition vertex edge "
    "anchor text web index query join batch stream hash merge sort "
    "scan filter count label component triangle distance path node"
).split()

_LANGS = ["en", "es", "de", "zh", "fr"]


def _h(seed: int, *parts) -> int:
    m = hashlib.sha256(("|".join(map(str, (seed, *parts)))).encode()).hexdigest()
    return int(m[:15], 16)


def page_url(i: int) -> str:
    return f"{BASE}/{i}"


def _links_for(i: int, n_pages: int, seed: int) -> list[tuple[str, int | None]]:
    """[(raw_href, resolved_target_index_or_None)] — None = out of corpus
    or non-http. Variant forms exercise every normalization rule."""
    n_links = 1 + _h(seed, i, "nl") % 5
    out: list[tuple[str, int | None]] = []
    for k in range(n_links):
        j = _h(seed, i, "t", k) % n_pages
        v = _h(seed, i, "v", k) % 10
        if v == 0:
            out.append((f"{BASE}/{j}", j))
        elif v == 1:
            out.append((f"/p/{j}", j))
        elif v == 2:
            out.append((f"../p/{j}", j))
        elif v == 3:
            out.append((f"{BASE}/{j}#section-{k}", j))
        elif v == 4:
            out.append((f"HTTPS://EXAMPLE.COM/p/{j}", j))
        elif v == 5:
            out.append((f"https://example.com:443/p/{j}", j))
        elif v == 6:
            out.append((f"{BASE}/{j}", j))  # duplicate-prone absolute
        elif v == 7:
            out.append((f"{EXT}/{j}", None))  # out-of-corpus host
        elif v == 8:
            out.append((f"mailto:user{j}@example.com", None))  # non-http
        else:
            out.append((f"{BASE}/{i}", i))  # self-link (dropped in edges)
    return out


def expected_normalized(i: int, n_pages: int, seed: int) -> list[str]:
    """Normalized in-document link list (http(s) only), document order."""
    out = []
    for href, j in _links_for(i, n_pages, seed):
        if href.startswith("mailto:"):
            continue
        if j is None:
            out.append(f"{EXT}/{href.rsplit('/', 1)[1]}")
        else:
            out.append(f"{BASE}/{j}")
    return out


def expected_edges(n_pages: int, seed: int = 42) -> set[tuple[str, str]]:
    """Distinct in-corpus (src_url, dst_url), self-links removed — the
    oracle for pages_to_edges."""
    es = set()
    for i in range(n_pages):
        for _, j in _links_for(i, n_pages, seed):
            if j is not None and j != i:
                es.add((page_url(i), page_url(j)))
    return es


def _text_and_html(i: int, n_pages: int, seed: int) -> tuple[str, str]:
    title = f"Page {i} " + _WORDS[_h(seed, i, "tw") % len(_WORDS)]
    n_par = 2 + _h(seed, i, "np") % 3
    paras = []
    for p in range(n_par):
        n_words = 6 + _h(seed, i, "pw", p) % 10
        words = [
            _WORDS[_h(seed, i, "w", p, w) % len(_WORDS)] for w in range(n_words)
        ]
        paras.append(" ".join(words))
    links = _links_for(i, n_pages, seed)
    anchor_bits = []
    for k, (href, j) in enumerate(links):
        label = f"link {j if j is not None else 'ext'} {k}"
        anchor_bits.append(f'<a href="{href}">{label}</a>')
    # html constructed so extract_text == text exactly:
    # head (incl. title) is dropped; script/style dropped; h1 and p
    # close-tags become newlines; entities &amp; -> &.
    html = (
        "<html><head><title>IGNORED</title>"
        "<script>var x = 1 < 2;</script><style>p { color: red }</style></head>"
        f"<body><h1>{title} &amp; more</h1>"
        + "".join(f"<p>{p}</p>" for p in paras[:-1])
        + f"<p>{paras[-1]} " + " ".join(anchor_bits) + "</p>"
        + "</body></html>"
    )
    text_lines = [f"{title} & more"] + paras[:-1]
    last = paras[-1] + " " + " ".join(
        f"link {j if j is not None else 'ext'} {k}"
        for k, (_, j) in enumerate(links)
    )
    text_lines.append(last)
    return "\n".join(text_lines), html


def synth_pages(
    spark: SparkSession, n_pages: int = 200, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """pages(url, warc_ts, html BINARY, text, lang) — deterministic."""
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                text, html = _text_and_html(i, n_pages, seed)
                ts = pd.Timestamp("2024-01-01") + pd.Timedelta(
                    seconds=_h(seed, i, "ts") % 31_536_000
                )
                rows.append(
                    {
                        "url": page_url(i),
                        "warc_ts": ts,
                        "html": html.encode("utf-8"),
                        "text": text,
                        "lang": _LANGS[_h(seed, i, "lang") % len(_LANGS)],
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n_pages, numPartitions=num_partitions).mapInPandas(
        _gen,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )
