"""SparkSession factory with the engine's standard configuration.

Replaces Twine's daemon bootstrap (twined `twine.conf` parsing `[U~]`,
SURVEY.md §3.1).  Local-mode defaults are sized for the sandbox
(local[32], 128 GiB); on a real cluster the same builder is used via
``spark-submit --py-files`` with master/executor conf supplied
externally (see runner.py docstring).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kgspark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("KGSPARK_MASTER", "local[32]")
    cores = 32
    if master.startswith("local["):
        spec = master[6:-1]
        if spec.isdigit():
            cores = int(spec)
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # shuffle sized to cores in local mode; a 1000-executor cluster
        # overrides this (and AQE coalescing re-sizes at runtime anyway)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("KGSPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # InferFiltersFromGenerate adds `size(e) > 0 AND isnotnull(e)`
        # below every Generate; predicate pushdown then substitutes the
        # generator input's PROJECTION into that filter, so an expensive
        # synthesized array (the span builder, shingle builders) is
        # re-evaluated per row at the scan — serially, below the
        # repartition — just to skip rows the generator (outer=false)
        # would drop anyway.  Optimizer-only rule: excluding it cannot
        # change results, only removes the duplicated evaluation
        # (r7: kg_spans_flat 1.05 s → 0.36 s warm; scale-independent).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
