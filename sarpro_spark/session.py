"""SparkSession builders with scale-tuned defaults.

Defaults are chosen for the 100 TB design point and scaled down by env for
local testing: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), Arrow on (pandas UDF transfer), shuffle partitions sized to the
cluster rather than Spark's static 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def build_session(
    app_name: str = "sarpro_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    On a real cluster ``master`` comes from the environment; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = default_parallelism()
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # Local mode: ~1x cores. Cluster deployments override via conf or rely
        # on AQE coalescing from a higher initial number.
        shuffle_partitions = max(cpus, 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Adaptive execution: runtime partition coalescing, skew-join
        # splitting, dynamic join-strategy switch — essential at 100 TB where
        # static planning misguesses sizes.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas UDF / toPandas transfer (10-100x over pickle).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Broadcast threshold: generous locally; dimension tables up to 64 MB
        # are cheaper broadcast than shuffled at any scale.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Timestamps: avoid JVM<->Arrow ambiguity in tests.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # A 64 MB-threshold broadcast can legitimately SERIALIZE to >1 GiB of
        # task results (row-object overhead + AQE size estimates come from
        # compressed shuffle stats), and Spark's 1 GiB maxResultSize default
        # then kills the job mid-broadcast-build — hit for real during the
        # r5 sf1 soak. Size it to the driver heap; cluster deploys override
        # both together.
        .config("spark.driver.maxResultSize", os.environ.get("SPARK_GRAFT_MAX_RESULT", "4g"))
        .config("spark.ui.enabled", "false")
        # r13 optimization round: pyspark's worker_util calls
        # importlib.invalidate_caches() once per TASK, and the stock worker
        # sys.path leads with pyspark.zip (3.5 MB central directory) + the
        # py4j zip — every Python task re-parsed both zip directories,
        # ~0.23 s of pure-Python CPU per task before any data was touched
        # (cProfile'd inside the worker; see pydaemon.py). The custom
        # daemon module drops the zip entries when (and only when) the
        # same pyspark version resolves from site-packages without them.
        # The executorEnv PYTHONPATH entry makes the daemon module
        # importable regardless of the launch directory; Spark MERGES it
        # with its own python path, nothing is replaced.
        .config("spark.python.daemon.module", "sarpro_spark.pydaemon")
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
