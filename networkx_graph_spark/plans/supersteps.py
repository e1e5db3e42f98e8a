"""Generic superstep runtime: iteration + lineage control + checkpoint/resume.

Every iterative kernel (PageRank, CC, LPA, SSSP at scale) is a driver-side
loop over DataFrame jobs. Two things make that safe at 100 TB:

1. **Lineage truncation** — without it the logical plan doubles per
   iteration and the driver dies on plan analysis long before executors
   struggle. Default is ``localCheckpoint(eager=True)`` (cluster-reliable
   alternative: parquet checkpoints, below).
2. **Durable checkpoint/resume** (north rule, BASELINE.json:14): with a
   ``checkpoint_dir``, every k-th superstep writes the state DataFrame to
   ``{dir}/{name}/iter=NNNNN`` (parquet, partitioned the same way it will
   be re-read) and appends a metrics line to ``{dir}/{name}/metrics.jsonl``
   (iteration, wall-clock, convergence metric, row count, lineage of which
   checkpoint it resumed from). ``resume()`` finds the newest complete
   checkpoint (``_SUCCESS`` marker) and restarts the loop mid-iteration.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class SuperstepResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[dict]


class Materializer:
    """Iteration-state materialization with bounded memory.

    Every call ``localCheckpoint(eager)``s the state (lineage stays O(1)
    per superstep) and then explicitly frees the PREVIOUS checkpoint's
    blocks through the JVM handle
    (``df._jdf.queryExecution().analyzed().rdd().unpersist``) —
    ``Dataset.unpersist`` does not touch checkpoint RDDs, and waiting for
    driver GC + ContextCleaner leaks one vertex-state copy per superstep
    (measured as progressive slowdown on long convergence runs). Freeing
    is safe because the next state was just materialized from it: the new
    blocks are self-contained.
    """

    def __init__(self):
        self._prev: Optional[DataFrame] = None
        self._deferred: list[DataFrame] = []

    def materialize(self, df: DataFrame, free_prev: bool = True) -> DataFrame:
        """free_prev=False defers freeing the previous state one round —
        for steps that still read it AFTER materializing the new one
        (e.g. convergence checks that join old vs new)."""
        out = df.localCheckpoint(eager=True)
        for d in self._deferred:
            _free_checkpoint(d)
        self._deferred = []
        if self._prev is not None:
            if free_prev:
                _free_checkpoint(self._prev)
            else:
                self._deferred.append(self._prev)
        self._prev = out
        return out

    def release(self):
        """Stop tracking WITHOUT freeing (the caller owns the last state)."""
        self._prev = None


def _free_checkpoint(df: DataFrame) -> None:
    """Best-effort explicit release of a localCheckpointed DataFrame's
    cached blocks (no-op on anything that isn't a plain LogicalRDD)."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


class SuperstepRunner:
    """``bucket_cols``/``bucket_count``: durable CO-PARTITIONED checkpoints.
    A plain parquet checkpoint (and ``localCheckpoint``) erases the state's
    hash partitioning, so every subsequent superstep re-exchanges the
    vertex state before its id-keyed join. With bucketing enabled, each
    checkpoint writes a bucketed external table (Spark bucketing uses the
    same ``pmod(murmur3)`` placement as shuffle hash partitioning), and the
    read-back scan reports ``HashPartitioning(bucket_cols, bucket_count)``
    — the next superstep's join on those columns needs NO exchange on the
    state side. ``bucket_count`` must equal the kernel's shuffle partition
    count for the other join sides to align. This is also the real
    cluster-scale checkpoint/resume story: durable files + catalog table +
    per-partition placement preserved across the restart boundary."""

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 1,
        bucket_cols: Optional[list[str]] = None,
        bucket_count: Optional[int] = None,
    ):
        self.spark = spark
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = max(1, checkpoint_every)
        if (bucket_cols is None) != (bucket_count is None):
            raise ValueError("bucket_cols and bucket_count must be set together")
        if bucket_cols is not None and checkpoint_dir is None:
            raise ValueError("bucketed checkpoints need a checkpoint_dir")
        if bucket_cols is not None and self.checkpoint_every != 1:
            # Bucketed mode's whole point is that EVERY superstep's state
            # lands co-partitioned; skipping iterations would route the
            # off-cadence states through localCheckpoint, erasing the
            # partitioning the next join depends on. Reject rather than
            # silently ignore the cadence.
            raise ValueError("bucketed checkpoints imply checkpoint_every=1")
        self.bucket_cols = list(bucket_cols) if bucket_cols else None
        self.bucket_count = bucket_count
        # Catalog-entry namespace: two runs sharing a kernel name (or the
        # same name under different checkpoint dirs) must not DROP each
        # other's ckpt_* tables mid-run. The digest is a pure function of
        # the checkpoint dir, so same-session resume still finds its table.
        self._ns = (
            hashlib.md5(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:8]
            if checkpoint_dir is not None
            else ""
        )

    # ------------------------------------------------------------ plumbing
    def _job_dir(self, name: str) -> str:
        return os.path.join(self.checkpoint_dir, name)

    def _iter_dir(self, name: str, i: int) -> str:
        return os.path.join(self._job_dir(name), f"iter={i:05d}")

    def _append_metrics(self, name: str, rec: dict) -> None:
        if self.checkpoint_dir is None:
            return
        os.makedirs(self._job_dir(name), exist_ok=True)
        with open(os.path.join(self._job_dir(name), "metrics.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")

    def latest_checkpoint(self, name: str) -> Optional[int]:
        if self.checkpoint_dir is None:
            return None
        d = self._job_dir(name)
        if not os.path.isdir(d):
            return None
        done = []
        for entry in os.listdir(d):
            if entry.startswith("iter=") and os.path.exists(
                os.path.join(d, entry, "_SUCCESS")
            ):
                done.append(int(entry.split("=")[1]))
        return max(done) if done else None

    def resume(self, name: str) -> Optional[tuple[DataFrame, int]]:
        """(state, next_iteration) from the newest durable checkpoint.
        In bucketed mode the checkpoint files ARE bucketed (written via
        ``bucketBy().saveAsTable``), so a fresh process re-registers the
        external bucketed table over them — the read-back scan reports
        ``HashPartitioning(bucket_cols, bucket_count)`` and the first
        post-resume superstep needs no vertex-state exchange, exactly like
        an uninterrupted run. (Before this, a fresh process fell back to a
        plain parquet read: correct, but one extra exchange AND an
        ulp-level float-summation-order divergence at the resume seam —
        measured max rel diff ~5e-16 at 2M edges.)"""
        i = self.latest_checkpoint(name)
        if i is None:
            return None
        if self.bucket_cols is not None:
            tbl = self._table_name(name, i)
            try:
                if self.spark.catalog.tableExists(tbl):
                    return self.spark.table(tbl), i + 1
            except Exception:
                pass
            try:
                return self._register_bucketed(name, i), i + 1
            except Exception:
                pass  # fall through to the plain (re-exchanged) read
        return self.spark.read.parquet(self._iter_dir(name, i)), i + 1

    def _register_bucketed(self, name: str, i: int) -> DataFrame:
        """Re-create the external bucketed table definition over the
        durable checkpoint files of iteration ``i`` (fresh-process resume:
        the files carry bucket ids in their names; only the catalog entry
        died with the old session). Declaring a bucket spec over files
        written under a DIFFERENT spec would silently mis-place rows
        (Spark trusts the declared placement for exchange elision), so the
        spec recorded at write time must match exactly — any mismatch or
        missing marker raises, and resume() falls back to the plain
        (re-exchanged, always-correct) parquet read."""
        path = self._iter_dir(name, i)
        # the spec is recorded PER ITERATION DIR: it must describe the
        # exact files being registered. A job-dir-global marker goes
        # stale the moment two runs with different specs share the dir —
        # a resume matching the newer marker would declare it over an
        # OLDER iteration's files and Spark's trusted exchange elision
        # would silently misplace rows. No fallback: an iteration without
        # its own spec (older writer, crash between write and marker)
        # raises here and resume() takes the always-correct plain
        # parquet read.
        with open(os.path.join(path, "_bucket_spec.json")) as f:
            spec = json.load(f)
        if spec != {"cols": self.bucket_cols, "count": self.bucket_count}:
            raise ValueError(
                f"checkpoint bucket spec {spec} != runner "
                f"{{'cols': {self.bucket_cols}, 'count': {self.bucket_count}}}"
            )
        ddl = self.spark.read.parquet(path)._jdf.schema().toDDL()
        tbl = self._table_name(name, i)
        cols = ", ".join(self.bucket_cols)
        self.spark.sql(
            f"CREATE TABLE {tbl} ({ddl}) USING PARQUET "
            f"CLUSTERED BY ({cols}) INTO {self.bucket_count} BUCKETS "
            f"LOCATION '{path}'"
        )
        return self.spark.table(tbl)

    def metrics_for(self, name: str, iteration: int) -> Optional[dict]:
        """The recorded metrics line for ``iteration`` (newest wins), or
        None. Lets kernels resume driver-side scalars (e.g. PageRank's
        dangling mass) from the exact recorded value instead of
        re-aggregating the loaded state — JSON roundtrips doubles exactly,
        so the resumed plan's literals are bitwise those of an
        uninterrupted run."""
        if self.checkpoint_dir is None:
            return None
        p = os.path.join(self._job_dir(name), "metrics.jsonl")
        if not os.path.exists(p):
            return None
        rec = None
        with open(p) as f:
            for ln in f:
                ln = ln.strip()
                if not ln:
                    continue
                try:
                    m = json.loads(ln)
                except json.JSONDecodeError:
                    continue  # torn write at a kill seam
                if m.get("iteration") == iteration:
                    rec = m
        return rec

    def wants_step_persist(self) -> bool:
        """True when the kernel should route its per-superstep
        materialization through ``persist_state`` so the durable bucketed
        write IS the superstep action (Observation metrics ride it) — no
        extra localCheckpoint copy of the state."""
        return self.bucket_cols is not None

    def _table_name(self, name: str, i: int) -> str:
        safe = "".join(c if c.isalnum() else "_" for c in name)
        return f"ckpt_{self._ns}_{safe}_{i:05d}"

    def persist_state(self, state: DataFrame, name: str, i: int) -> DataFrame:
        """Write ``state`` as a bucketed external table under the iteration
        dir and return the bucketed scan. The caller must pre-cluster the
        plan on ``bucket_cols`` (e.g. ``repartition(bucket_count, *cols)``)
        so each task writes exactly one bucket file. Drops the i-2 catalog
        entry (files stay on disk for resume)."""
        if not self.wants_step_persist():
            raise RuntimeError("persist_state requires bucketed checkpoints")
        path = self._iter_dir(name, i)
        os.makedirs(self._job_dir(name), exist_ok=True)
        tbl = self._table_name(name, i)
        self.spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            state.write.mode("overwrite")
            .format("parquet")
            .option("path", path)
            .bucketBy(self.bucket_count, *self.bucket_cols)
            .saveAsTable(tbl)
        )
        # record the bucket spec INSIDE the iteration dir, after the
        # write, so a fresh-process resume re-registers exactly the spec
        # these files were written under (a job-dir-global marker goes
        # stale when runs with different specs share the dir — see
        # _register_bucketed, which refuses to register without it)
        with open(os.path.join(path, "_bucket_spec.json"), "w") as f:
            json.dump({"cols": self.bucket_cols, "count": self.bucket_count}, f)
        if i >= 2:
            self.spark.sql(f"DROP TABLE IF EXISTS {self._table_name(name, i - 2)}")
        return self.spark.table(tbl)

    def _persist(
        self,
        state: DataFrame,
        name: str,
        i: int,
        pre_checkpointed: bool = False,
        durable: bool = False,
    ) -> DataFrame:
        if durable:
            # step_fn already persisted via persist_state (bucketed write
            # was the superstep action) — nothing left to do
            return state
        if self.checkpoint_dir is not None and i % self.checkpoint_every == 0:
            path = self._iter_dir(name, i)
            state.write.mode("overwrite").parquet(path)
            return self.spark.read.parquet(path)
        if pre_checkpointed:
            # step_fn already localCheckpoint'ed (it needed an action, e.g.
            # a convergence agg) — avoid a second copy of the state
            return state
        return state.localCheckpoint(eager=True)

    # ---------------------------------------------------------------- loop
    def run(
        self,
        name: str,
        state: DataFrame,
        step_fn: Callable[[DataFrame, int], tuple[DataFrame, dict]],
        max_iter: int = 100,
        converged_key: Optional[str] = None,
        tol: float = 0.0,
        resume: bool = False,
    ) -> SuperstepResult:
        """Iterate ``step_fn(state, i) -> (new_state, metrics)`` until
        ``metrics[converged_key] <= tol`` or ``max_iter``.

        ``step_fn`` must return fully-computed metrics (it may run
        actions); the runtime handles checkpointing, metrics logging and
        the resume protocol.
        """
        start_iter = 0
        if resume:
            got = self.resume(name)
            if got is not None:
                state, start_iter = got
        if start_iter == 0:
            state = state.localCheckpoint(eager=True)
        all_metrics: list[dict] = []
        converged = False
        i = start_iter
        for i in range(start_iter, max_iter):
            t0 = time.time()
            new_state, metrics = step_fn(state, i)
            pre_ck = bool(metrics.pop("_checkpointed", False))
            durable = bool(metrics.pop("_durable", False))
            new_state = self._persist(
                new_state, name, i, pre_checkpointed=pre_ck, durable=durable
            )
            dt = time.time() - t0
            rec = {
                "name": name,
                "iteration": i,
                "wall_sec": round(dt, 4),
                "resumed_from": start_iter - 1 if resume and start_iter else None,
                **metrics,
            }
            self._append_metrics(name, rec)
            all_metrics.append(rec)
            state = new_state
            if converged_key is not None and metrics.get(converged_key) is not None:
                if metrics[converged_key] <= tol:
                    converged = True
                    i += 1
                    break
        else:
            i = max_iter
        return SuperstepResult(state, i, converged, all_metrics)
