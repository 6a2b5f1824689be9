"""SparkSession factory.

Replaces the reference's session builder (etl.py:26-33, which targeted YARN +
hadoop-aws) with a locally-testable, cluster-ready factory: every scale knob
is a config, not code, so the same build runs on local[32] and on a
1000-executor cluster.

Scale posture (100 TB design point):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  dynamic broadcast decisions replace any hand-tuned per-job batching.
- UTC session timezone pinned: date-part semantics must not depend on the
  driver host zone (oracle parity + cross-cluster determinism).
- Arrow enabled for the few Pandas-UDF code paths (similarity/multimodal).
- Shuffle partitions default to a local-friendly count; on a real cluster
  AQE coalescing makes the initial number mostly irrelevant as long as it
  is high enough, so deployments should raise `shuffle_partitions`
  (e.g. 2-4x total cores) via the argument or spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nyc_bikeshare_datawarehouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect the advisory partition size when coalescing instead of
        # maximizing parallelism with many tiny partitions (the documented
        # production recommendation) — cuts per-stage scheduling overhead
        # without lowering the scale-safe initial partition count
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # UTC unless overridden (SPARK_GRAFT_TZ exists so the harness can
        # simulate a hostile caller session; library code re-pins UTC at
        # runtime in load_table regardless)
        .config("spark.sql.session.timeZone", os.environ.get("SPARK_GRAFT_TZ", "UTC"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
