"""SparkSession factory tuned for the CDC engine.

Design notes (100 TB target):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting.
- Arrow on: every Python-side transform in this engine is a vectorized
  pandas UDF / mapInPandas (no per-row Python, per BASELINE.json input_hint).
- shuffle partitions default to 2x cores locally; on a real cluster pass
  ``shuffle_partitions`` sized to (executors * cores * 2-3) or rely on AQE
  with a high initial partition number.
- Iceberg extensions are added opportunistically: if the Iceberg runtime jar
  is on the classpath (real cluster), `MERGE INTO` goes through Iceberg; in
  this sandbox the ParquetLakeTarget implements the same commit semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_PARALLELISM = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def iceberg_confs(warehouse: str, catalog: str = "lake") -> dict[str, str]:
    """Confs that enable Iceberg MERGE INTO on a real cluster.

    Only applied when the Iceberg Spark runtime jar is present; the sandbox
    container does not ship it, so tests route through ParquetLakeTarget.
    """
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def get_spark(
    app_name: str = "kjp-spark-cdc",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = DEFAULT_PARALLELISM
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cores}]")

    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or max(2 * cores, 32)),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.files.maxPartitionBytes": "134217728",
        "spark.sql.parquet.compression.codec": "snappy",
        # local mode runs executors in the driver JVM: size the heap for
        # cores × (shuffle sort buffers + parquet writers) or local[32]
        # spills while local[8] doesn't and scaling inverts
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "48g"),
        # G1 (the default) collapses under 32 concurrent task threads in one
        # JVM (measured 6x slowdown on agg-heavy stages); ParallelGC restores
        # near-linear thread scaling for this allocation pattern
        "spark.driver.extraJavaOptions": os.environ.get(
            "SPARK_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"
        ),
        "spark.executor.extraJavaOptions": "-XX:+UseParallelGC",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
