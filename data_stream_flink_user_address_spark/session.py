"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]`` threads; the same configs are the
right defaults on a real cluster (AQE on, UTC session time, Arrow on for
the pandas-UDF operators).  Shuffle partitions default to the local core
count -- on a 1000-executor cluster you would raise this to ~2-3x total
cores, or simply rely on AQE coalescing which is enabled here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data_stream_flink_user_address_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    AQE handles runtime re-planning (partition coalescing, skew-join
    splitting, dynamic broadcast) so hand-tuned partition counts stay
    advisory rather than load-bearing at scale.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        # limit-probe collects (the dedup_clusters / connected_components /
        # pagerank / tokenizer-vocab hybrid driver paths all run
        # `df.limit(threshold + 1).collect()`) default to executeTake's
        # incremental ramp: 1 partition, then 4x more per round -- 3-4
        # SEQUENTIAL jobs before a 32-partition frame is fully read.
        # Those probes want all-or-threshold, so launch one full wave
        # sized to the core count (scale-adaptive, not a constant).
        # Row selection is unchanged: executeTake concatenates
        # partitions in partition-index order either way.
        .config("spark.sql.limit.initialNumPartitions", str(4 * int(cpus)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
