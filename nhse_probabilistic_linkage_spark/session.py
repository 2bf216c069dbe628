"""SparkSession factory tuned for the dedup workload.

Local-mode defaults mirror what we would set cluster-side: AQE on (skew-join
splitting + partition coalescing are load-bearing for hot LSH bands), Arrow on
(all Python kernels are vectorized pandas UDFs), and a shuffle-partition count
sized to the parallelism rather than Spark's default 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nhse-dedup-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or _default_shuffle_partitions(master)))
        # local mode runs all task threads in ONE JVM: heap must scale with
        # parallelism or GC throughput caps scaling (a real cluster gets this
        # for free — 4N executors bring 4N x executor.memory). Measured: the
        # allocation-heavy shingle stage anti-scales 4->16 threads on a fixed
        # 8g heap, and scales ~2.5x once the heap grows with the threads.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory(master)))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _local_cores(master: str) -> int | None:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return int(inner)
        except ValueError:
            return None
    return None


def _default_driver_memory(master: str) -> str:
    # 3GB/thread, floor 8 (GC throughput collapses when 16+ threads allocate
    # into a small shared heap), cap 40 (measured: a 96g heap runs the band
    # stage ~3x slower than 40g on the same input — oversized young gen page
    # churn; interleaved A/B, best-of-2 each).
    cores = _local_cores(master)
    if cores is None:
        return "8g"
    return f"{min(40, max(8, 3 * cores))}g"


def _default_shuffle_partitions(master: str) -> int:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return max(8, (os.cpu_count() or 8))
        try:
            return max(8, int(inner))
        except ValueError:
            return 32
    return 200
