"""SparkSession builder with scale-oriented defaults.

Defaults chosen for the 100 TB design target (see SURVEY.md §4):
- AQE on (runtime coalesce + skew-join splitting backs up our explicit
  salting of hot spatial cells),
- Arrow on (all geometry UDFs are pandas/Arrow-batched),
- shuffle partitions sized to the local core count for tests; on a real
  cluster this is overridden via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "osm_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``cores`` — int for ``local[n]``, ``"*"`` for all, None to respect
    ``$SPARK_GRAFT_CPUS`` (default ``*``).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores in ("*",) else max(int(cores), 4)

    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = SparkSession.builder.appName(app_name)
    # only pin local[] / loopback when no cluster master was supplied:
    # programmatic master/driver.host would OVERRIDE spark-submit
    # --master yarn/k8s, blocking cluster deployment
    from pyspark import SparkConf

    if not SparkConf().contains("spark.master"):
        builder = builder.master(f"local[{cores}]") \
            .config("spark.driver.host", "127.0.0.1")
    builder = (
        builder
        .config("spark.driver.memory", driver_mem)
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
