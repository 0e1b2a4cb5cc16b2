"""The MBTiles-equivalent tile store (S6/S7 parity, Spark-native).

Reference schema (src/schema.rs:11-40): tiles(zoom_level, tile_column,
tile_row, tile_data[, tile_alpha]) with a unique key index, plus
metadata(name, value).  Here:

- ``tiles``: parquet partitioned by zoom, columns (zoom, x, tms_y,
  tile_data, tile_alpha) — tile_row IS the TMS-flipped y, exactly like the
  reference's inserter (src/tile_inserter.rs:54).  Key uniqueness holds by
  construction: each row comes from one groupBy(cell) group.
- ``metadata`` + per-zoom ``limits`` (S7/S8) via plans.lineage.write_metadata.
- the reference's single-writer thread + bounded channel
  (src/tile_inserter.rs:15-69) disappears: Spark's committer parallelizes,
  backpressure is shuffle-native (SURVEY §4 X6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from freemap_tiler_spark.functions import cells
from freemap_tiler_spark.operators import pyramid as P


def write_tiles(
    spark: SparkSession,
    levels: DataFrame,
    root: str,
    fmt: str = "png",
    quality: int = 85,
    tile_size: int = 256,
    bands: int = 2,
    files_per_zoom_hint: int | None = None,
    png_filter: str = "adaptive",
) -> str:
    """(cell, payload) levels -> encoded tiles table at {root}/store.

    Encoding (F13-F17) happens in the same pass as the write — one shuffle
    to cluster by (zoom, morton) so files hold z-order-adjacent tiles (X3).

    Range-partition count defaults to 4x parallelism (not a fixed 32):
    cell ids sort by zoom prefix, so range partitioning naturally gives
    deep zooms many files and shallow zooms few — the file count scales
    with cluster size instead of capping write parallelism.
    """
    enc = P.encode_level(levels, fmt, quality, tile_size, bands,
                         png_filter=png_filter)
    keyed = enc.select(
        cells.cell_zoom("cell").alias("zoom"),
        cells.cell_x("cell").alias("x"),
        cells.reversed_y(cells.cell_zoom("cell"), cells.cell_y("cell")).alias("tms_y"),
        "tile_data",
        "tile_alpha",
        F.col("cell"),
    )
    out = os.path.join(root, "store")
    n = files_per_zoom_hint or max(32, spark.sparkContext.defaultParallelism * 4)
    keyed.repartitionByRange(n, "cell").drop("cell").write.mode(
        "overwrite"
    ).partitionBy("zoom").parquet(out)
    return out


def append_empty_markers(spark: SparkSession, markers: DataFrame, root: str) -> None:
    """Append known-empty tiles (P5/X8, src/processor.rs:186-190,594-601) to
    the store as NULL tile_data rows — present (so resume skips them), but
    carrying no payload and never passing through the encoder."""
    keyed = markers.select(
        cells.cell_zoom("cell").alias("zoom"),
        cells.cell_x("cell").alias("x"),
        cells.reversed_y(cells.cell_zoom("cell"), cells.cell_y("cell")).alias("tms_y"),
        F.lit(None).cast("binary").alias("tile_data"),
        F.lit(None).cast("binary").alias("tile_alpha"),
    )
    keyed.write.mode("append").partitionBy("zoom").parquet(os.path.join(root, "store"))


def read_tiles(spark: SparkSession, root: str) -> DataFrame:
    return spark.read.parquet(os.path.join(root, "store"))


def lookup_tile(spark: SparkSession, root: str, zoom: int, x: int, tms_y: int):
    """Point lookup (the reference's resume SELECT, src/processor.rs:143-148)
    — partition pruning on zoom + predicate pushdown on (x, tms_y)."""
    df = read_tiles(spark, root)
    return df.where(
        (F.col("zoom") == zoom) & (F.col("x") == x) & (F.col("tms_y") == tms_y)
    ).first()
