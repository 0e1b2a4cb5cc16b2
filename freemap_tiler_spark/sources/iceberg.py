"""Iceberg table sink/source with a parquet-layout fallback.

The north rule targets "Iceberg tables ... checkpoints to Iceberg".  This
container ships no iceberg-spark runtime jar, so the writer is gated on
catalog detection:

- Iceberg available (``spark.sql.catalog.<name>`` configured with the
  Iceberg catalog impl): ``df.writeTo(table).using("iceberg")`` with the
  SAME partition spec (``PARTITIONED BY zoom`` for tiles, identity
  partition on ``level`` for lineage) — snapshot isolation and hidden
  partitioning come from Iceberg itself;
- otherwise: zoom-partitioned parquet directories (what plans/store and
  plans/lineage write today) — the identical logical layout minus the
  snapshot log, documented as the offline stand-in.

Every writer in plans/ goes through paths; swapping in Iceberg is a config
change (``--conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog``
on spark-submit), not a code change — which is what this module proves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession, catalog: str = "lake") -> bool:
    """True iff an Iceberg catalog is configured AND the runtime class
    loads (no jar in this container -> False, fallback used)."""
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)  # noqa: SLF001
        return True
    except Exception:
        return False


def write_tiles_table(
    spark: SparkSession,
    keyed: DataFrame,
    path_or_table: str,
    catalog: str = "lake",
    mode: str = "overwrite",
) -> str:
    """Write the (zoom, x, tms_y, tile_data, tile_alpha) tiles relation.

    Iceberg path: ``createOrReplace`` a table partitioned by zoom.
    Fallback: zoom-partitioned parquet under the given path."""
    if iceberg_available(spark, catalog):
        writer = keyed.writeTo(f"{catalog}.{path_or_table}").using("iceberg")
        from pyspark.sql import functions as F

        writer = writer.partitionedBy(F.col("zoom"))
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return f"{catalog}.{path_or_table}"
    keyed.write.mode(mode).partitionBy("zoom").parquet(path_or_table)
    return path_or_table


def read_tiles_table(
    spark: SparkSession, path_or_table: str, catalog: str = "lake"
) -> DataFrame:
    if iceberg_available(spark, catalog) and not path_or_table.startswith("/"):
        return spark.read.table(f"{catalog}.{path_or_table}")
    return spark.read.parquet(path_or_table)
