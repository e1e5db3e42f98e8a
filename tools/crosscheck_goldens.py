#!/usr/bin/env python
"""Independent recomputation of the frozen seeded-hash goldens
(networkx_graph_spark/goldens_sf001.py) WITHOUT Spark.

tools/freeze_goldens.py freezes the output of the Spark implementations,
which pins determinism and regressions but cannot catch a logic bug
present at freeze time. This script replays every frozen query in pure
Python/numpy from the sf0.01 parquet files:

- xxhash64 comes from tools/xxh64_pure.py (own XXH64 implementation,
  self-validated below against transcribed Spark outputs);
- tokenization/shingling, MinHash remixes, band buckets, SimHash bit
  majorities, pigeonhole pairing, LSH bucket joins, IVF Lloyd fit and
  probing, cosine scoring (replicated as the same sequential left-fold
  Spark's ``F.aggregate`` performs, so doubles match bit-for-bit) and
  HALF_UP rounding are all re-implemented here, independently of the
  DataFrame code under test;
- the hyperplane matrix is imported from functions/similarity._planes —
  it is plain Python (blake2b + Box-Muller), not Spark, so importing it
  re-checks everything downstream of plane generation.

Exit code 0 iff every frozen table is reproduced exactly.
"""

from __future__ import annotations

import math
import os
import re
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from xxh64_pure import I32, spark_xxhash64  # noqa: E402

SF = "/root/testdata/sf0.01"

# --------------------------------------------------- hash self-validation
# transcribed Spark 4.1 outputs (see NOTES_r3): F.xxhash64 over these
# inputs — guards the pure implementation itself
_HASH_VECTORS = [
    (("abcd",), -6810745876291105281),
    ((1,), -7001672635703045582),
    (("",), -7444071767201028348),
    ((0,), -5252525462095825812),
    ((0, I32(3)), 3685650509796455440),
    (("", 0), 1172808402238552441),
]


def _check_hash_vectors():
    for args, want in _HASH_VECTORS:
        got = spark_xxhash64(*args)
        assert got == want, f"xxh64 self-check failed for {args}: {got} != {want}"


# ------------------------------------------------------------- utilities
_WS = re.compile("[ \t\n\x0b\x0c\r]+")  # Java \s (ASCII), not Python's \s


def tokens(text: str) -> list[str]:
    return [t for t in _WS.split(text.lower()) if t]


def shingles(text: str, n: int = 3) -> list[str]:
    toks = tokens(text)
    if len(toks) - (n - 1) >= 1:
        out, seen = [], set()
        for i in range(len(toks) - n + 1):
            s = " ".join(toks[i : i + n])
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out
    return [" ".join(toks)]


def round6(x: float) -> float:
    """Spark F.round(double, 6): BigDecimal.valueOf (shortest repr) +
    HALF_UP — Python's repr + Decimal HALF_UP replicates it."""
    return float(Decimal(repr(x)).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


def fold_dot(a, b) -> float:
    """F.aggregate(zip_with(a,b,*), 0.0, +) — strict left fold."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + (x * y)
    return acc


def fold_norm(a) -> float:
    acc = 0.0
    for x in a:
        acc = acc + (x * x)
    return math.sqrt(acc)


def cosine(a, b) -> float:
    na, nb = fold_norm(a), fold_norm(b)
    if na > 0 and nb > 0:
        return fold_dot(a, b) / (na * nb)
    return 0.0


def load_tables():
    import duckdb

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    emb_rows = con.execute(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = [r[0] for r in emb_rows]
    # float32 storage -> float64, exactly as Spark's cast("array<double>")
    vecs = {r[0]: [float(np.float32(x)) for x in r[1]] for r in emb_rows}
    return docs, ids, vecs


# ------------------------------------------------------------- MinHash
def replay_minhash(docs, num_hashes=16, bands=4, threshold=0.2):
    sigs = {}
    for doc_id, text in docs:
        hs = [spark_xxhash64(s) for s in shingles(text)]
        sigs[doc_id] = [
            min(spark_xxhash64(h, I32(i)) for h in hs) for i in range(num_hashes)
        ]
    r = num_hashes // bands
    buckets = {}
    for doc_id, sig in sigs.items():
        for bi in range(bands):
            key = (bi, spark_xxhash64(*sig[bi * r : bi * r + r]))
            buckets.setdefault(key, []).append(doc_id)
    pairs = set()
    for ids_ in buckets.values():
        ids_ = sorted(ids_)
        for i in range(len(ids_)):
            for j in range(i + 1, len(ids_)):
                pairs.add((ids_[i], ids_[j]))
    out = set()
    for a, b in pairs:
        agree = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        est = agree / float(num_hashes)
        if est >= threshold:
            out.add((a, b, round6(est)))
    return out


# ------------------------------------------------------------- SimHash
def replay_simhash(docs, max_hamming=6):
    sigs = {}
    for doc_id, text in docs:
        toks = tokens(text)
        if not toks:
            sigs[doc_id] = 0
            continue
        hs = [spark_xxhash64(t) & ((1 << 64) - 1) for t in toks]
        n = len(hs)
        sig = 0
        for i in range(64):
            ones = sum((h >> i) & 1 for h in hs)
            if 2 * ones >= n:
                sig |= 1 << i
        sigs[doc_id] = sig - (1 << 64) if sig >= (1 << 63) else sig
    ids_ = sorted(sigs)
    out = set()
    for i in range(len(ids_)):
        for j in range(i + 1, len(ids_)):
            a, b = ids_[i], ids_[j]
            ham = ((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).bit_count()
            if ham <= max_hamming:
                out.add((a, b, ham))
    return out


# ----------------------------------------------------------- LSH helpers
def lsh_buckets(ids, vecs, dim, num_planes, seed=42):
    from networkx_graph_spark.functions.similarity import _planes

    planes = _planes(seed, num_planes, dim)
    mat = np.stack([np.asarray(vecs[i], dtype=np.float64) for i in ids])
    signs = (mat @ planes.T) >= 0
    weights = 1 << np.arange(num_planes, dtype=np.uint64)
    return dict(
        zip(ids, (signs.astype(np.uint64) * weights).sum(axis=1).astype(np.int64))
    )


def replay_embed_near_dup(ids, vecs, dim, threshold=0.25, num_planes=6):
    bucket = lsh_buckets(ids, vecs, dim, num_planes)
    groups = {}
    for i in ids:
        groups.setdefault(bucket[i], []).append(i)
    out = set()
    for members in groups.values():
        members = sorted(members)
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b = members[x], members[y]
                c = cosine(vecs[a], vecs[b])
                if c >= threshold:
                    out.add((a, b, round6(c)))
    return out


def topk_rows(cands, vecs, qids, k):
    out = set()
    for q in qids:
        scored = sorted(
            ((cosine(vecs[v], vecs[q]), v) for v in cands[q] if v != q),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        for rank, (c, v) in enumerate(scored, 1):
            out.add((q, v, round6(c), rank))
    return out


def replay_ann_lsh(ids, vecs, dim, k=5, num_planes=4):
    bucket = lsh_buckets(ids, vecs, dim, num_planes)
    qids = [i for i in ids if i < 5]
    cands = {q: [v for v in ids if bucket[v] == bucket[q]] for q in qids}
    return topk_rows(cands, vecs, qids, k)


def replay_ann_ivf(ids, vecs, dim, k=5, n_centroids=16, nprobe=3, iters=3, seed=42):
    order = sorted(ids, key=lambda i: (spark_xxhash64(i, I32(seed)), i))
    C = np.round(
        np.stack([np.asarray(vecs[i], dtype=np.float64) for i in order[:n_centroids]]), 6
    )
    mat = np.stack([np.asarray(vecs[i], dtype=np.float64) for i in ids])
    matn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)

    def assign(C_):
        Cn = C_ / np.maximum(np.linalg.norm(C_, axis=1, keepdims=True), 1e-12)
        return (matn @ Cn.T).argmax(axis=1)

    for _ in range(iters):
        a = assign(C)
        newC = C.copy()
        for c in range(n_centroids):
            sel = mat[a == c]
            if len(sel):
                newC[c] = sel.sum(axis=0) / len(sel)
        C = np.round(newC, 6)
    a = assign(C)
    cluster = dict(zip(ids, a))
    qids = [i for i in ids if i < 5]
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    qmat = np.stack([np.asarray(vecs[q], dtype=np.float64) for q in qids])
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    sims = qmat @ Cn.T
    probes = np.argsort(-sims, kind="stable", axis=1)[:, :nprobe]
    cands = {
        q: [v for v in ids if cluster[v] in set(int(c) for c in probes[qi])]
        for qi, q in enumerate(qids)
    }
    return topk_rows(cands, vecs, qids, k)


def main():
    _check_hash_vectors()
    from networkx_graph_spark import goldens_sf001 as G

    docs, ids, vecs = load_tables()
    dim = len(vecs[ids[0]])
    failures = []

    def compare(name, got, frozen):
        frozen = set(map(tuple, frozen))
        if got == frozen:
            print(f"{name}: OK ({len(got)} rows, exact)")
            return
        missing = frozen - got
        extra = got - frozen
        failures.append(name)
        print(f"{name}: MISMATCH missing={len(missing)} extra={len(extra)}")
        for r in list(missing)[:5]:
            print("   missing:", r)
        for r in list(extra)[:5]:
            print("   extra:  ", r)

    compare("MINHASH_PAIRS", replay_minhash(docs), G.MINHASH_PAIRS)
    compare("SIMHASH_PAIRS", replay_simhash(docs), G.SIMHASH_PAIRS)
    compare("EMBED_NEAR_DUP", replay_embed_near_dup(ids, vecs, dim), G.EMBED_NEAR_DUP)
    compare("ANN_TOPK", replay_ann_lsh(ids, vecs, dim), G.ANN_TOPK)
    compare("ANN_IVF_TOPK", replay_ann_ivf(ids, vecs, dim), G.ANN_IVF_TOPK)
    if failures:
        print("CROSSCHECK FAILED:", failures)
        return 1
    print("CROSSCHECK PASSED: all frozen goldens independently reproduced")
    return 0


if __name__ == "__main__":
    sys.exit(main())
