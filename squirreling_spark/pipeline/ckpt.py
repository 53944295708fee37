"""Lineage truncation with a storage-policy knob, shared by every
operator that materializes a multiply-referenced intermediate (iterative
graph rounds, the CMS wide table, HLL overlap register leaves).

Why not bare ``localCheckpoint``: it truncates lineage onto
NON-REPLICATED executor blocks — fast locally, but on a real cluster an
executor loss (or dynamic-allocation scale-down) makes the query fail
unrecoverably (r11 advice). ``truncate_lineage`` therefore honors a
reliable checkpoint directory (argument or SPARK_GRAFT_CHECKPOINT_DIR)
— the fault-tolerant policy for production — and only falls back to
``localCheckpoint`` when none is configured.

No reference counterpart (execution policy, not query semantics).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _ckpt_file(out: DataFrame) -> str | None:
    """Checkpoint-file URI of an eagerly checkpointed DataFrame — the
    exact rdd-* directory THIS checkpoint wrote. Attribution is by the
    checkpointed RDD's own getCheckpointFile (the analyzed plan of
    ``Dataset.checkpoint``'s result is a LogicalRDD over exactly that
    RDD), never by diffing directory listings, so checkpoints written
    concurrently by other queries in the same SparkContext can never be
    claimed — or later deleted — by the supersede registry (r11 advice).

    The walk crosses py4j into Spark internals, which shift across
    majors; it is a capability probe: any failure returns None and the
    caller skips supersede cleanup for that generation (the disk-growth
    bound is lost, correctness never is, and nothing this code did not
    create is ever touched). tests/test_r9_ops.py asserts the soft-fail
    leaves checkpoints intact with LPA still converging."""
    try:
        opt = out._jdf.queryExecution().analyzed().rdd().getCheckpointFile()
        return opt.get() if opt.isDefined() else None
    except Exception:
        return None


def _ckpt_delete(spark, uri: str) -> None:
    """Best-effort recursive delete of a checkpoint URI via the Hadoop
    FS API (local paths and HDFS/S3 behave identically). Failure means
    the growth bound slips, never a correctness change."""
    try:
        p = spark._jvm.org.apache.hadoop.fs.Path(uri)
        fs = p.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        fs.delete(p, True)
    except Exception:
        pass


def truncate_lineage(
    df: DataFrame,
    checkpoint_dir: str | None = None,
    supersede: dict | None = None,
    eager: bool = False,
) -> DataFrame:
    """Materialize-and-truncate-lineage with a storage policy knob.

    ``checkpoint_dir`` (or the SPARK_GRAFT_CHECKPOINT_DIR env var when the
    argument is None) selects RELIABLE checkpointing: blocks go to that
    fault-tolerant path (HDFS/S3/local disk), surviving executor loss and
    freeing executor storage memory — the right policy on a real cluster
    and for memory-tight iterative runs. Unset, falls back to
    ``localCheckpoint`` (blocks on executor memory/disk): faster locally,
    but blocks accumulate on executors across repeated invocations and die
    with them.

    ``supersede`` bounds reliable-checkpoint DISK growth across iterative
    rounds (r10 advice: Spark's cleanCheckpoints is off by default, so
    per-round eager checkpoints otherwise accumulate for deep ``iters``).
    Pass the same dict at every per-round call site; each call records the
    rdd-* dir this checkpoint created (attributed exactly via the
    checkpointed RDD's own checkpoint file — see _ckpt_file) and deletes
    the dirs recorded TWO generations back (never anything it didn't
    create, even under concurrent checkpointing queries). One extra
    generation is kept because the immediately superseded round can still
    be referenced after the new checkpoint is written (e.g. a convergence
    compare against the previous labels). The last two generations remain
    on disk at exit — bounded residue; final removal belongs to the
    checkpoint-dir owner or spark.cleaner.referenceTracking.cleanCheckpoints.

    ``eager`` applies to the localCheckpoint FALLBACK only (the reliable
    path is always eager — see the persist note below): iterative loops
    whose next step immediately materializes (convergence probes) want
    eager=True so an upstream cache can be dropped right after."""
    if checkpoint_dir is None:
        checkpoint_dir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if checkpoint_dir:
        spark = df.sparkSession
        spark.sparkContext.setCheckpointDir(checkpoint_dir)
        # Persist BEFORE the eager reliable checkpoint: RDD.checkpoint's
        # documented caveat is that the checkpoint-file write job
        # recomputes the subtree unless it is cached — without this the
        # exact memory-tight runs the knob targets computed every
        # truncated subtree twice (r9 advice). Eager so the cache can be
        # dropped here instead of leaking into the caller.
        df = df.persist()
        out = df.checkpoint(eager=True)
        df.unpersist()
        if supersede is not None:
            gens = supersede.setdefault("gens", [])
            cf = _ckpt_file(out)
            # probe failed -> empty generation: nothing recorded, nothing
            # ever deleted for this round (soft-fail contract)
            gens.append([cf] if cf else [])
            while len(gens) > 2:
                for old in gens.pop(0):
                    _ckpt_delete(spark, old)
        return out
    return df.localCheckpoint(eager=eager)
