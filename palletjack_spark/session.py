"""SparkSession construction and scale-oriented tuning.

All confs here are chosen for the 100 TB target, not just local tests:
AQE (runtime re-planning, skew-join splitting, partition coalescing),
parquet filter/aggregate pushdown, nested-schema pruning, Arrow transport
for the Python boundary.  ``tune_session`` applies the runtime-settable
subset to an externally provided session (e.g. the verification driver's).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe to set at session-build time only.
BUILD_CONF = {
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "65536",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
}

#: Confs settable at runtime; applied defensively to any session we are
#: handed.  Each matters at scale:
#: - AQE: coalesces post-shuffle partitions and splits skewed join keys at
#:   runtime, which is the difference between a stalled straggler and an
#:   even 1000-executor stage.
#: - filterPushdown: predicates reach the parquet row-group stats (the
#:   built-in analogue of the reference's row-group pruning, SURVEY §4 O2).
#: - aggregatePushdown: COUNT/MIN/MAX answered from footer stats alone
#:   (the analogue of the reference's precomputed row counts, SURVEY §4 O4).
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.optimizer.nestedSchemaPruning.enabled": "true",
    "spark.sql.parquet.recordLevelFilter.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def tune_session(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply runtime-settable tuning confs; ignore anything the session
    refuses (e.g. static confs on a running session)."""
    conf = dict(RUNTIME_CONF)
    conf["spark.sql.shuffle.partitions"] = str(
        shuffle_partitions if shuffle_partitions is not None else default_parallelism()
    )
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark


def get_spark(
    app_name: str = "palletjack-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for this engine."""
    cpus = cpus if cpus is not None else os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    for k, v in {**BUILD_CONF, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return tune_session(spark, shuffle_partitions)
