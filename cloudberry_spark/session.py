"""SparkSession bootstrap.

The reference engine's session-level behavior (GUCs enabling multiphase
aggregation, predicate pushdown, runtime bloom filters, partition pruning
— /root/reference/src/backend/utils/misc/guc_gp.c:278,470,473) is all
Catalyst-native; this module just turns the right knobs on and pins
timezone/partition defaults so results are deterministic against the
DuckDB oracle.

Scale notes (targets a 1000-executor cluster even though tests run
local[32]):
- AQE handles runtime shuffle-partition coalescing, skew-join splitting
  and broadcast demotion — strictly better than the reference's static
  ``cdbpath_motion_for_join`` decisions.
- Runtime bloom-filter join == the reference's RuntimeFilter node
  (/root/reference/src/backend/executor/nodeRuntimeFilter.c:20).
- ``spark.sql.legacy.parquet.nanosAsLong`` lets us scan nanosecond
  parquet timestamps (the ``events`` fixture) without a driver-side
  rewrite; the catalog converts to TIMESTAMP with ``timestamp_micros``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Session-level SQL confs that are safe to (re)apply at runtime.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Respect the advisory partition size when coalescing instead of
    # maximizing parallelism (r13 opt, guide §2.2): with the default
    # (true), AQE deliberately keeps ~2x-cores post-shuffle partitions
    # even for KB-sized shuffles, so tiny-input plans pay 32-way task
    # launch per exchange — measured as the 8-cores-beats-32 inversion
    # on the K=1 spec suite (PERF_r12 scaling block; in-session A/B:
    # 11-query inversion list 8.27s -> 6.93s median). At real data
    # volumes partitions exceed the 64MB advisory size and this setting
    # changes nothing — it is scale-adaptive, not a local tuning.
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # events.parquet stores TIMESTAMP(NANOS); read as long, convert in catalog.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for any pandas_udf/mapInPandas path (the only Python hot paths).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (e.g. the driver's)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-modifiable in this deployment; keep going — every conf
            # here is an optimization or compat knob, not a correctness
            # requirement except nanosAsLong (catalog degrades gracefully).
            pass
    return spark


def get_session(app_name: str = "cloudberry-spark") -> SparkSession:
    """Build (or fetch) the engine session.

    ``SPARK_GRAFT_CPUS`` sets local parallelism; shuffle partitions default
    to the core count (AQE coalesces down at runtime, so oversizing is
    cheap; undersizing caps parallelism).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # JIT code cache: a long-lived analytics session compiles one or more
    # Janino classes per distinct plan; a few hundred distinct queries
    # overflow the JVM default (240 MB), after which freshly generated
    # code runs INTERPRETED — measured here as a uniform ~5x collapse of
    # the whole bench's tail (ds_real suite 488s -> 119s cold once the
    # cache is sized for the workload; see OPTIMIZATION_r12.md §1). Same
    # knob a production cluster sets for any plan-diverse workload.
    java_opts = os.environ.get(
        "SPARK_GRAFT_DRIVER_JAVA_OPTS",
        "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.driver.extraJavaOptions", java_opts)
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    # Reliable-checkpoint dir for iterative operators (lineage.py): on a
    # cluster point this at HDFS/S3 so truncated lineage survives
    # executor loss; unset => localCheckpoint fallback (local dev).
    ckpt = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckpt and spark.sparkContext.getCheckpointDir() is None:
        spark.sparkContext.setCheckpointDir(ckpt)
    return configure_session(spark)
