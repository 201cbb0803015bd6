"""Table IO: Iceberg when a catalog is configured, parquet otherwise.

The north rule targets Iceberg tables for inputs and checkpoints.  This
sandbox has no Iceberg runtime jar, so the writer/reader pair degrades
to plain parquet paths; on a cluster, set

    spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog

(public Iceberg-Spark runtime) and pass ``table='catalog.db.tbl'`` —
the same calls then go through the Iceberg catalog, which adds snapshot
isolation + min/max file pruning on the cell/tile key columns (the
R-tree-interior-node analog, SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "spark_catalog") -> bool:
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    return impl is not None and "Iceberg" in str(impl)


def write_table(df: DataFrame, target: str, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    """``target`` is a catalog table name (contains no '/') or a path.

    Table-name targets use the Iceberg format only when the catalog is
    actually Iceberg-backed (``iceberg_available``); otherwise they
    degrade to the session catalog's default source — the documented
    sandbox behavior, instead of 'Failed to find data source'."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if "/" in target:
        w.parquet(target)
    elif iceberg_available(df.sparkSession, target.split(".")[0]) \
            or iceberg_available(df.sparkSession):
        w.format("iceberg").saveAsTable(target)
    else:
        w.saveAsTable(target)


def read_table(spark: SparkSession, target: str) -> DataFrame:
    if "/" in target:
        return spark.read.parquet(target)
    return spark.read.table(target)
