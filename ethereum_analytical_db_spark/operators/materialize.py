"""Materialization policy for iterative / multi-consumer plan points.

The dedup and similarity operators cut lineage at well-chosen points —
before self-joins that would otherwise recompute the whole upstream
pipeline per branch, and per iteration in the connected-components
loops (where lineage growth is not an optimization but a correctness
requirement: an unbounded plan eventually overflows the planner).

Two modes, one knob:

- ``local`` (default): ``DataFrame.localCheckpoint`` — blocks are
  pinned in executor storage with NO recompute path. Fastest (no
  distributed filesystem round-trip) and exactly right on a single
  machine or a small stable cluster, but on a 1000-executor cluster
  where executor loss is ROUTINE, one lost block fails the whole query
  instead of recomputing (there is no lineage left to recompute from).
- ``reliable``: ``DataFrame.checkpoint`` into the SparkContext
  checkpoint directory — survives executor loss (any executor re-reads
  the checkpoint files), at the cost of a write+read through the
  checkpoint filesystem per materialization. The 100 TB setting: a
  multi-hour dedup job that cannot afford to restart on the first
  preempted container. If no checkpoint dir is configured, one is
  derived under the session's warehouse dir (``<warehouse>/
  _checkpoints``) so callers don't need SparkContext plumbing; on a
  real cluster point ``spark.sparkContext.setCheckpointDir`` at a
  durable shared path (HDFS/S3) instead — executor-local disk would
  void the fault-tolerance this mode exists for.

Both modes truncate lineage identically; results are byte-identical
(pinned by test_dedup's reliable-mode parity test). See SCALE.md
"Materialization & executor loss".

Checkpoint-file lifecycle: ``checkpoint()`` files are NOT removed by
Spark by default — a long-lived session running repeated reliable-mode
jobs would grow the checkpoint FS without bound. The session factory
(``session.get_spark``) therefore enables
``spark.cleaner.referenceTracking.cleanCheckpoints`` (startup-only
conf), which deletes a checkpoint's files once its RDD is
garbage-collected; deployments handing us an external session should
set the same flag, and may clear the ``_checkpoints`` dir between jobs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

MODES = ("local", "reliable")


def materialize(df: DataFrame, mode: str = "local", eager: bool = True) -> DataFrame:
    """Cut lineage per ``mode`` (see module docstring). ``eager=False``
    defers the materialization job to the first action that needs it —
    used inside iteration bodies where the convergence count realizes
    the checkpoint anyway, avoiding one extra job per round."""
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode == "reliable":
        spark = df.sparkSession
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            warehouse = spark.conf.get("spark.sql.warehouse.dir")
            sc.setCheckpointDir(os.path.join(warehouse, "_checkpoints"))
        return df.checkpoint(eager=eager)
    raise ValueError(f"materialize mode {mode!r}: expected one of {MODES}")
