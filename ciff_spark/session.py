"""SparkSession factory with the configuration this engine assumes.

Local-mode defaults are tuned for the sandbox (one JVM, N threads); every
setting is also the right default on a real multi-executor cluster except
``spark.driver.memory``, which a cluster submit would size per-node.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ciff_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "32g",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` or ``*``. Shuffle partitions
    default to the core count — at cluster scale the build pipeline overrides
    partitioning explicitly (repartitionByRange / repartition on shard keys),
    so this only sizes the residual shuffles.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cores or (os.cpu_count() or 8)
    # Arrow-UDF stages co-schedule one Python worker per JVM task — a task
    # really occupies ~2 CPUs. At high thread counts scheduling 1 task/CPU
    # oversubscribes and measurably regresses (local[32]: 8.2k → 14k turns/s
    # with task.cpus=2 on the bench build); below 16 threads the slack
    # covers it.
    task_cpus = os.environ.get("SPARK_GRAFT_TASK_CPUS") or (
        "2" if (cores or os.cpu_count() or 8) >= 16 else "1"
    )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.task.cpus", task_cpus)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        # shuffle/spill on tmpfs: emulates per-executor local NVMe — the
        # sandbox's single /tmp device otherwise serializes all executors'
        # shuffle I/O through one queue
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/ciff_spark_local"))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # shuffle codec stays lz4 (default): zstd's per-stream contexts
        # measurably regress high-thread local runs (A/B: 88s → 56s at
        # local[32] on the 60k-conv build)
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _prefork_python_workers(spark)
    return spark


def _prefork_python_workers(spark: SparkSession) -> None:
    """Fork the reusable Arrow/pandas Python worker pool ONCE per session.

    The first Arrow-UDF stage of a fresh session otherwise pays a fork +
    pandas/pyarrow import per worker (~1 s of wall, charged to whatever
    operator happens to run first) — a one-time cluster-startup cost, not
    steady-state work, the same rationale as the JVM warmup count() callers
    already do. ``spark.python.worker.reuse`` (default on) keeps the pool
    alive afterwards. Guarded so repeated ``get_spark`` calls on a live
    session cost nothing."""
    if getattr(spark, "_ciff_workers_preforked", False):
        return
    n = spark.sparkContext.defaultParallelism
    try:
        spark.range(n).repartition(n).mapInPandas(
            lambda it: it, "id long"
        ).write.format("noop").mode("overwrite").save()
    except Exception:
        pass  # warmup must never fail a session build
    spark._ciff_workers_preforked = True
