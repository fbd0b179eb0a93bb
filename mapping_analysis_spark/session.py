"""SparkSession factory tuned for the engine.

Local mode is a single JVM; on a real cluster the same configs apply per
executor. AQE is on so skewed blocking-key joins re-plan at runtime
(the reference hand-balanced these with its BlockSplit custom partitioner,
analysis-core .../blocking/blocksplit/BlockSplitTripletCreator.java:49-117).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mapping_analysis_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` controls ``local[N]`` parallelism — the sandbox proxy for
    executor count (N vs 4N scaling evidence). Defaults to
    ``$SPARK_GRAFT_CPUS`` or all cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 4)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # audio `bytes` rows are ~0.1-0.6 MB: the default 4096-row columnar
        # batch would hold GBs per task on a binary-payload scan — size the
        # batch for the payload, not the row count
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
