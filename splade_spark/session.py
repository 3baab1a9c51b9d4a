"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we would set per-executor on a real
cluster: AQE on (runtime coalesce + skew-join), shuffle partitions
sized to cores (not the 200 default), Arrow enabled for every
pandas-UDF boundary, UTC session timezone so results compare cleanly
against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cores() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def physical_ram_gb() -> int:
    """Detected physical memory in GiB (0 if unreadable)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) // (1024 * 1024)
    except OSError:
        pass
    return 0


def default_driver_mem_gb(cores: int) -> int:
    """Heap heuristic: scale with parallelism but never past ~70% of
    physical RAM — on a high-core/low-RAM box an uncapped max(16, cores)
    heap would push the run into swap/OOM-kill."""
    want = max(16, cores)
    ram = physical_ram_gb()
    if ram:
        want = min(want, max(4, int(ram * 0.7)))
    return want


def get_spark(
    app: str = "splade-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = cores or default_cores()
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    # Make the package importable in Python workers regardless of the
    # driver's cwd (local-mode analog of `spark-submit --py-files`;
    # on a real cluster, ship the package zip via --py-files).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if pkg_root not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + os.pathsep + os.environ.get("PYTHONPATH", "")
        ).rstrip(os.pathsep)
    builder = (
        SparkSession.builder.appName(app)
        .master(f"local[{cores}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # default 10k-row Arrow batches fragment 100M-row kernel inputs
        # into thousands of pandas materializations; bigger batches cut
        # that fixed cost ~13x at a few MB per in-flight batch.
        # env-overridable for A/B attribution (BENCH/BASELINE.md drift
        # note)
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "131072"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # heap scales with parallelism: more concurrent tasks need more
        # headroom or GC serializes the run (local-mode analog of
        # per-executor memory on a cluster)
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", f"{default_driver_mem_gb(cores)}g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
