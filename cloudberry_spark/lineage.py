"""Lineage truncation for iterative operators (shared utility).

Iterative algorithms (RecursiveUnion fixpoints, connected components,
PageRank-style loops) must break Catalyst lineage every few rounds or
the logical plan doubles per iteration and planning time explodes long
before data size matters — the reference materializes per iteration in
its WorktableScan (/root/reference/src/backend/executor/
nodeRecursiveunion.c:75) for the same reason.

``localCheckpoint`` stores blocks in executor memory/disk — fine under
local[*], but on a real cluster a lost executor makes the truncated
lineage IRRECOVERABLE mid-job. So: use reliable ``checkpoint()``
whenever a checkpoint dir is configured (production posture — set
``SPARK_GRAFT_CHECKPOINT_DIR`` to an HDFS/S3 path, picked up by
``get_session``), and fall back to localCheckpoint only when none is
set (local dev, where executor loss == driver loss anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def truncate_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Checkpoint ``df``, truncating its logical plan.

    Reliable checkpoint when a checkpoint dir is set (cluster-safe:
    survives executor loss), localCheckpoint otherwise.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
