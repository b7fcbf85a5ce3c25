"""Deterministic storage release for superseded localCheckpoints.

Every iterative operator here (connected components, PageRank, BFS,
k-core, SSSP, batched BPE) cuts lineage per round with
``localCheckpoint`` — but Spark only frees a checkpoint's storage
blocks when the JVM garbage-collects the RDD object and the
ContextCleaner gets around to it. Python dropping its reference is
necessary but nowhere near sufficient (py4j finalizers → JVM GC →
async cleaner). In a 25-round peel over a billion-node graph that
lazy cleanup accumulates up to 25 superseded node-vectors of executor
storage — pure waste that evicts useful blocks, drives GC pressure
(the graph-tier bench variance band), and at 100 TB scale is an OOM
risk, since MEMORY_AND_DISK still spills through memory first.

``release_local_checkpoint`` frees the blocks the moment the round's
value is dead, via the checkpointed RDD reachable from the
DataFrame's LogicalRDD plan root.

SAFETY CONTRACT (the caller's, not the helper's): a localCheckpoint
TRUNCATES lineage — unpersisted blocks are unrecoverable, and any
later read fails with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND rather than
recomputing. Only release a DataFrame when (a) its successor
checkpoint is already MATERIALIZED (eager=True, or an action ran) and
(b) no returned/live plan can reference it. The iterative loops
release strictly after their per-round convergence probe — the last
consumer of the superseded round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(df: DataFrame) -> bool:
    """Drop the storage blocks behind a superseded localCheckpoint'ed
    DataFrame. Returns True only when persisted blocks were actually
    released; False otherwise — a derived (non-LogicalRDD) plan, a
    LogicalRDD that never persisted anything (createDataFrame frames
    and RELIABLE checkpoints are LogicalRDD-rooted too, with storage
    level NONE — reliable-checkpoint files live on the checkpoint dir,
    not in block storage), Spark Connect, or any py4j surprise. The
    False paths leave cleanup to the ContextCleaner — the status
    quo."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return False
        rdd = plan.rdd()
        lvl = rdd.getStorageLevel()
        if not (lvl.useMemory() or lvl.useDisk()):
            return False  # nothing persisted — unpersist would be a no-op
        rdd.unpersist(False)
        return True
    except Exception:
        return False
