"""SparkSession factory with scale-appropriate defaults.

Local mode is the test/bench harness; the same config block is what we'd
ship in ``spark-submit --conf`` on a real multi-executor cluster (AQE on,
skew-join on, Arrow on, UTC session TZ for oracle comparability).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dedupe_trees_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``).
    ``shuffle_partitions`` defaults to 2× the core count — small enough to
    avoid tiny-task overhead locally, and AQE coalesces further at runtime.
    On a real cluster these two knobs come from spark-submit instead.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        try:
            n = int(cpus) if cpus else (os.cpu_count() or 8)
        except ValueError:
            n = os.cpu_count() or 8
        shuffle_partitions = max(8, 2 * n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # scan parallelism must scale with cores, not file sizes: the
        # default 128 MB per scan partition caps a ~1 GB stage at ~8
        # tasks — pandas-UDF stages then can't use >8 cores at all
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1 * 1024 * 1024))
        # long-lived driver hygiene: localCheckpoint blocks (CC rounds,
        # per-query materialized intermediates) are reclaimed by the
        # ContextCleaner only after a JVM GC notices the dropped
        # references — the 30min default lets tens of finished queries'
        # blocks pile up in storage memory first. 2min bounds that
        # accumulation on any deployment; no effect on results.
        .config("spark.cleaner.periodicGC.interval", "2min")
    )
    # shuffle/spill dir: a single local disk does not scale with thread
    # count the way a real cluster's per-node disks do — benchmarks point
    # this at tmpfs (SPARK_GRAFT_LOCAL_DIR=/dev/shm/...) so scaling
    # numbers measure the engine, not the sandbox's one virtual disk
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
