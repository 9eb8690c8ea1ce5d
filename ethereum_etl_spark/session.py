"""SparkSession factory tuned for this engine.

Local sandbox runs on ``local[N]`` (single JVM); production target is a
multi-executor cluster — every conf here is valid for both. The knobs
mirror what the reference tunes by hand (request batching, bounded queues
— src/clis/historical.py:26-31) but expressed as Spark parallelism confs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ethereum_etl_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None → ``local[*]``. shuffle_partitions defaults to the core
    count: on a real cluster you would size this to ~2-3× total executor
    cores; AQE coalescing makes the exact number forgiving.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    sp = shuffle_partitions if shuffle_partitions is not None else max(n, 8)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(n * 3))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT96 (Spark's legacy default) carries NO parquet column
        # statistics, which would blind the manifest min/max pruning
        # (read_updated_since) — and it's 12 bytes vs 8. TIMESTAMP_MICROS
        # is what Iceberg/Delta write.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # maxPartitionBytes meters ON-DISK bytes and snappy-parquet web
        # text compresses 10-30x, so a fixed 128 MB would collapse a
        # multi-GB (uncompressed) scan to a handful of tasks. Spark sizes
        # splits as min(maxPartitionBytes, max(openCost, bytes/parallelism))
        # — defaultParallelism = 3x cores (above) keeps scan task count
        # proportional to cores regardless of compression ratio.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Fresh Python worker per task: long-lived reused pandas workers
        # degrade badly under sustained Arrow-UDF load (measured 2-5×
        # job-to-job slowdown at 32 concurrent workers); forking from
        # pyspark.daemon is cheap on Linux, so reuse buys nothing here.
        .config("spark.python.worker.reuse", "false")
        # preload pandas/pyarrow/numpy + UDF modules in the daemon so each
        # fresh forked worker inherits warm imports copy-on-write (~1s/task
        # saved; without this, no-reuse pays a pandas import per task)
        .config("spark.python.daemon.module", "ethereum_etl_spark.daemon_preload")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
