"""Triangle counting via degree-ordered orientation + wedge join.

Canonical kernel (north rule, BASELINE.json:14). The standard
shuffle-efficient formulation (Suri & Vassilvitskii, WWW'11 "Counting
Triangles and the Curse of the Last Reducer"):

1. undirect + dedupe edges, drop self-loops;
2. orient each edge from the lower-(degree, id) endpoint to the higher —
   every hub's wedge set shrinks from O(deg²) to O(deg_out²) where
   deg_out ≤ sqrt(m), killing the power-law last-reducer;
3. wedges = oriented ⋈ oriented on the middle vertex;
4. close wedges against the oriented edge set (each triangle counted
   exactly once).

Fully expressible in joins/aggregations — Catalyst plans it; AQE splits
residual skew. Total-count and per-vertex variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame) -> DataFrame:
    """Canonical undirected pairs oriented low (degree, id) -> high.

    Returns a PERSISTED, materialized DataFrame (callers may persist
    again — idempotent — and own the unpersist). The canonical-pair
    dedup (``und``) and the degree table are cached for the duration of
    the build: un-persisted, the `und` distinct subtree (a full
    (a, b)-hash exchange + aggregate) re-executed once per reference —
    twice inside the degree union and once per degree join, four full
    dedup passes where one suffices (visible as four repeated
    HashAggregate+Exchange+HashAggregate subtrees in
    plans/r06/triangles_powerlaw_before.txt)."""
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    j = (
        und.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b")), "b")
    )
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    out = j.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).persist()
    out.count()
    und.unpersist()
    deg.unpersist()
    return out


def triangle_count(edges: DataFrame) -> int:
    """Total number of triangles in the undirected view of ``edges``."""
    o = _oriented(edges).persist()
    try:
        e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        wedges = e1.join(e2, "b").select("a", "b", "c")
        closed = wedges.join(
            o.select(F.col("src").alias("a"), F.col("dst").alias("c")), ["a", "c"]
        )
        return closed.count()
    finally:
        o.unpersist()


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, triangles): number of triangles each vertex participates in."""
    o = _oriented(edges).persist()
    try:
        e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        wedges = e1.join(e2, "b").select("a", "b", "c")
        closed = wedges.join(
            o.select(F.col("src").alias("a"), F.col("dst").alias("c")), ["a", "c"]
        ).persist()
        per = (
            closed.select(F.col("a").alias("id"))
            .unionByName(closed.select(F.col("b").alias("id")))
            .unionByName(closed.select(F.col("c").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("triangles"))
        )
        vertices = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        out = vertices.join(per, "id", "left").select(
            "id", F.coalesce("triangles", F.lit(0)).alias("triangles")
        )
        out = out.localCheckpoint(eager=True)
        closed.unpersist()
        return out
    finally:
        o.unpersist()
