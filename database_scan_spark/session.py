"""SparkSession factory with scale-appropriate defaults.

The engine targets a large multi-executor cluster; tests run on
``local[*]``. Every config below is cluster-meaningful, not a
local-mode hack:

- AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  and dynamic broadcast conversion — the reference's hand-rolled
  "dedup before the next fetch" / "filter before the hop" tricks
  (SURVEY.md §4) fall out of this for free.
- Arrow on: pandas UDFs and ``toPandas`` move columnar batches, not
  pickled rows.
- UTC session timezone: fixture timestamps are naive; keep Spark and
  the DuckDB oracle byte-identical.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "database-scan-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``spark.sql.shuffle.partitions`` is a *default*, not a tuning
    crutch: with AQE coalescing enabled Spark shrinks small shuffles
    at runtime, and at 100 TB the value should be raised to
    ~2-3x total executor cores via this same knob.
    """
    n = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    master = os.environ.get("SPARK_MASTER", f"local[{DEFAULT_SHUFFLE_PARTITIONS}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce/re-plan persisted intermediates too (off by
        # default; without it every .persist() pins its pre-AQE
        # partitioning and tiny cached stages keep 32 tasks each)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # keep stdout machine-parseable: the driver captures a bounded
        # tail of bench.py's output, and [Stage …] progress bars would
        # interleave with (and truncate) the summary JSON line
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()


# Recommended configuration for a real multi-executor deployment at
# the 100 TB design point — documentation-as-code; get_spark() stays
# local-mode-friendly and the driver owns its own session anyway.
CLUSTER_PROFILE_100TB = {
    # 2-3x total executor cores; AQE coalesces down per-stage
    "spark.sql.shuffle.partitions": "8000",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # scan granularity: ~256 MB splits keep task count sane on 100 TB
    "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
    # dims up to ~256 MB broadcast; beyond that AQE decides at runtime
    "spark.sql.autoBroadcastJoinThreshold": str(256 * 1024 * 1024),
    # Arrow batches for every pandas_udf/mapInPandas boundary
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # shuffle robustness at scale
    "spark.shuffle.service.enabled": "true",
    "spark.sql.adaptive.localShuffleReader.enabled": "true",
    # writers: size output files for the lake (~512 MB row groups)
    "spark.sql.files.maxRecordsPerFile": "20000000",
}
