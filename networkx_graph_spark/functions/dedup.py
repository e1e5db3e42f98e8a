"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The scale posture of each:

- **exact**: fingerprint → groupBy → keep min id. One shuffle on a long
  key; map-side partial agg handles hot fingerprints.
- **MinHash+LSH**: shingle → k minhashes → b bands of r rows → bucket
  equi-join on the banded signature. The bucket join is the only
  pairwise-ish step and it never materializes the full O(n²) pair space;
  skewed buckets (boilerplate-heavy corpora) hit AQE skew splitting.
- **SimHash**: 64-bit signature per doc (Arrow-vectorized numpy, one pass),
  candidate pairing on 16-bit blocks (Hamming ≤ 3 over 4 blocks ⇒ at least
  one block equal — pigeonhole), verify exact Hamming.
- **n-gram Jaccard**: exact verification used on LSH candidates (never on
  the full cross product).

All signatures are pure functions of (seed, content) — partition-invariant.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, tokens_col


# --------------------------------------------------------------- exact
def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, keep_id): docs whose normalized text already appeared;
    keep_id = the minimum doc id of the group."""
    fp = docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    groups = fp.groupBy("fp").agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n")
    )
    return (
        fp.join(groups.filter(F.col("n") > 1), "fp")
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(F.col(id_col), "keep_id")
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one doc per normalized-text group (the min id)."""
    dupes = exact_duplicates(docs, id_col, text_col).select(id_col)
    return docs.join(dupes, id_col, "left_anti")


# ------------------------------------------------------------- shingles
def shingles_col(text, n: int = 3):
    """Word n-gram shingles of normalized text (distinct)."""
    toks = tokens_col(text)
    k = F.size(toks) - (n - 1)
    return F.when(
        k >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))


# --------------------------------------------------------- minhash + LSH
def minhash_signature(docs: DataFrame, id_col="doc_id", text_col="text",
                      num_hashes: int = 16, shingle_n: int = 3) -> DataFrame:
    """(id, sig ARRAY<BIGINT>[num_hashes]).

    Shape matters: higher-order array functions block Spark's
    subexpression elimination, so k inline ``array_min(transform(...))``
    calls would re-tokenize and re-shingle the text k times. Instead:
    shingle ONCE, explode, hash each shingle string ONCE (xxhash64), then
    take k mins of cheap integer re-mixes ``xxhash64(h, i)`` in a single
    map-side-partial aggregation."""
    sh = docs.select(
        F.col(id_col).alias("id"), F.explode(shingles_col(F.col(text_col), shingle_n)).alias("s")
    ).select("id", F.xxhash64("s").alias("h"))
    aggs = [
        F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"_s{i}") for i in range(num_hashes)
    ]
    return (
        sh.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[F.col(f"_s{i}") for i in range(num_hashes)]).alias("sig"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """(a, b, jaccard_est): candidate near-dup pairs from banded LSH,
    scored by full-signature agreement; filtered at ``threshold``."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signature(docs, id_col, text_col, num_hashes, shingle_n).persist()
    sigs.count()
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            *[F.col("sig")[bi * r + j] for j in range(r)]
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    a = banded.select(F.col("id").alias("a"), "band", "bucket")
    b = banded.select(F.col("id").alias("b"), "band", "bucket")
    # dedupe candidate pairs on the narrow (a, b) key FIRST, then join the
    # signatures back — never shuffle/dedupe the 16-long arrays per pair
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .join(sigs.select(F.col("id").alias("a"), F.col("sig").alias("sig_a")), "a")
        .join(sigs.select(F.col("id").alias("b"), F.col("sig").alias("sig_b")), "b")
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    out = pairs.select(
        "a", "b", (agree.cast("double") / F.lit(float(num_hashes))).alias("jaccard_est")
    )
    return out.filter(F.col("jaccard_est") >= threshold)


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate (a, b) pairs — the verification
    stage after LSH: join shingle sets in, intersect/union as array ops."""
    sh = docs.select(
        F.col(id_col).alias("id"), shingles_col(F.col(text_col), shingle_n).alias("sh")
    )
    j = (
        candidates.join(sh.withColumnRenamed("id", "a").withColumnRenamed("sh", "sh_a"), "a")
        .join(sh.withColumnRenamed("id", "b").withColumnRenamed("sh", "sh_b"), "b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select(
        "a", "b", F.when(union > 0, inter / union).otherwise(F.lit(0.0)).alias("jaccard")
    )


# --------------------------------------------------------------- simhash
def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash BIGINT): 64-bit SimHash via one Arrow-vectorized numpy
    pass (bit-majority over token hashes)."""
    import numpy as np

    def _sim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                toks = [t for t in (text or "").lower().split() if t]
                if not toks:
                    out.append(0)
                    continue
                hs = np.array(
                    [
                        int.from_bytes(
                            __import__("hashlib").blake2b(
                                t.encode(), digest_size=8
                            ).digest(),
                            "big",
                        )
                        for t in toks
                    ],
                    dtype=np.uint64,
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                    np.int64
                )
                maj = (bits.sum(axis=0) * 2 >= len(hs)).astype(np.uint64)
                val = 0
                for i in range(64):
                    if maj[i]:
                        val |= 1 << i
                out.append(val - (1 << 64) if val >= (1 << 63) else val)
            yield pd.DataFrame({"id": pdf[id_col], "simhash": pd.array(out, dtype="int64")})

    return docs.select(id_col, text_col).mapInPandas(_sim, schema="id long, simhash long")


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """(a, b, hamming): pairs within Hamming distance ``max_hamming``.
    Candidate generation: split the 64-bit signature into 4 16-bit blocks;
    by pigeonhole, distance ≤ 3 implies at least one equal block, so an
    equi-join per block finds all such pairs without a cross product."""
    sigs = simhash_signatures(docs, id_col, text_col).persist()
    sigs.count()
    blocks = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", "bb.blk", "bb.val")
    a = blocks.select(F.col("id").alias("a"), F.col("simhash").alias("ha"), "blk", "val")
    b = blocks.select(F.col("id").alias("b"), F.col("simhash").alias("hb"), "blk", "val")
    pairs = (
        a.join(b, ["blk", "val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return pairs.select("a", "b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
