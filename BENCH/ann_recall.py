#!/usr/bin/env python
"""ANN recall evaluation: LSH (exact-bucket / multi-probe) and IVF
(nprobe sweep) against the exact cosine_topk baseline, at
$SPARK_GRAFT_SF_DIR (default sf0.1). Also reports candidate volume (the
cost axis recall trades against) and the auto-sizing-rule choices.

Writes BENCH/ANN_RECALL.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_QUERIES = 50


def main():
    from pyspark.sql import functions as F

    from networkx_graph_spark.functions.similarity import (
        ann_topk_ivf,
        ann_topk_lsh,
        auto_n_centroids,
        auto_num_planes,
        cosine_topk,
    )
    from networkx_graph_spark.session import get_spark

    spark = get_spark(
        app_name="ann-recall", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    n = emb.count()
    dim = len(emb.select("embedding").first()["embedding"])
    queries = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        .persist()
    )
    queries.count()

    def topk_set(df):
        return {(r["qid"], r["vec_id"]) for r in df.collect()}

    t0 = time.time()
    exact = topk_set(cosine_topk(emb, queries, k=K))
    t_exact = time.time() - t0

    rows = []

    def run(label, fn):
        t0 = time.time()
        got = topk_set(fn())
        dt = time.time() - t0
        recall = len(got & exact) / len(exact)
        rows.append((label, recall, len(got), dt))
        return recall

    for planes in (6, 8, 10):
        run(f"lsh planes={planes}", lambda p=planes: ann_topk_lsh(emb, queries, dim, k=K, num_planes=p))
        run(f"lsh planes={planes} probe=1", lambda p=planes: ann_topk_lsh(emb, queries, dim, k=K, num_planes=p, multi_probe=1))
    for nprobe in (2, 4, 8):
        run(f"ivf k=32 nprobe={nprobe}", lambda np_=nprobe: ann_topk_ivf(emb, queries, dim, k=K, n_centroids=32, nprobe=np_))

    auto_planes = auto_num_planes(n)
    auto_cent = auto_n_centroids(n)
    run(f"lsh AUTO planes={auto_planes} probe=1",
        lambda: ann_topk_lsh(emb, queries, dim, k=K, num_planes=auto_planes, multi_probe=1))
    run(f"ivf AUTO k={auto_cent} nprobe=4",
        lambda: ann_topk_ivf(emb, queries, dim, k=K, n_centroids=auto_cent, nprobe=4))

    md = [
        "# BENCH/ANN_RECALL.md — approximate-NN recall vs exact baseline",
        "",
        f"Corpus: {n} vectors, dim {dim} ({SF_DIR}); {N_QUERIES} queries, k={K};",
        f"exact cosine_topk baseline took {t_exact:.1f}s.",
        "",
        "| variant | recall@10 | returned | wall (s) |",
        "|---|---|---|---|",
    ]
    for label, recall, cnt, dt in rows:
        md.append(f"| {label} | {recall:.3f} | {cnt} | {dt:.1f} |")
    md += [
        "",
        "## Sizing rule (functions/similarity.py)",
        "",
        "- `auto_num_planes(n, B=256) = max(4, ceil(log2(n/B)))` — expected",
        "  bucket population n/2^planes stays ≈B as the corpus grows, so",
        "  within-bucket candidate work is bounded (near-dup pair",
        "  enumeration is O(B²) per bucket — a fixed plane count goes",
        "  quadratic at 100 TB). Recall lost to narrower buckets is",
        "  recovered structurally with `multi_probe=1` (probes the",
        "  num_planes Hamming-1 buckets on the broadcast query side), not",
        "  by letting buckets grow.",
        f"  At n={n}: auto planes = {auto_planes}.",
        "- `auto_n_centroids(n) = clamp(sqrt(n), 8, 65536)` with nprobe a",
        "  small constant — each query then touches ~nprobe·sqrt(n)",
        "  vectors; the Lloyd fit's driver traffic stays k×dim partial",
        f"  sums. At n={n}: auto k = {auto_cent}.",
        "",
        "Contract-golden queries keep their frozen r2 parameters",
        "(goldens_sf001.py pins them at sf0.01); the auto rules are the",
        "documented defaults for corpus-scale use.",
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "ANN_RECALL.md")
    with open(out, "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({
        "metric": "ann_recall_at_10",
        "results": {label: round(r, 4) for label, r, _, _ in rows},
        "n": n, "dim": dim, "queries": N_QUERIES,
    }))


if __name__ == "__main__":
    main()
