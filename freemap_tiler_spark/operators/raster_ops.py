"""Raster-block operators: validation, no-data masking, reprojecting warp.

The remaining reference-parity pieces of the raster path:

- **Band-layout validation** (S2, src/main.rs:82-110): accept only G / G+A /
  RGB / RGBA block tables; fail fast in the driver.
- **No-data masking** (P3, src/processor.rs:405-439): per pixel, if ANY band
  equals its nodata value, zero ALL bands (forcing alpha 0).
- **Warp** (F11, src/warp.rs:15-99): reproject + resample a block into the
  WebMercator tile grid.  Inverse mapping: for each target (3857) pixel
  center, compute the source pixel via the source CRS (EPSG:4326 supported
  offline — the inverse-mercator formula; EPSG:3857 = identity fast path,
  src/warp.rs:78-89), then sample bilinear or Lanczos.
- **Alpha gating** (P4, src/processor.rs:463-488): copy only where alpha>0
  when merging warped pieces.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from freemap_tiler_spark.functions import cells, mercator

VALID_BAND_COUNTS = {1: "G", 2: "GA", 3: "RGB", 4: "RGBA"}


def validate_blocks(blocks: DataFrame) -> str:
    """Fail-fast band-layout validation (S2).  Returns the layout name."""
    counts = [r[0] for r in blocks.select("bands").distinct().collect()]
    if len(counts) != 1:
        raise ValueError(f"mixed band counts {counts}; a source has ONE layout")
    n = counts[0]
    if n not in VALID_BAND_COUNTS:
        raise ValueError(
            f"unsupported band count {n}: need G/G+A/RGB/RGBA (reference src/main.rs:82-110)"
        )
    return VALID_BAND_COUNTS[n]


def mask_nodata(blocks: DataFrame) -> DataFrame:
    """P3: zero every band of a pixel where ANY band matches its nodata
    value (src/processor.rs:428-434 exact semantics), vectorized numpy."""

    def _mask(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                nb = int(row.bands)
                img = np.frombuffer(row.data, np.uint8).reshape(-1, nb).copy()
                nodata = list(row.nodata) if row.nodata is not None else []
                hit = np.zeros(img.shape[0], dtype=bool)
                for k in range(min(nb, len(nodata))):
                    if nodata[k] is not None:
                        hit |= img[:, k] == nodata[k]
                img[hit] = 0
                out.append(img.tobytes())
            pdf = pdf.copy()
            pdf["data"] = out
            yield pdf

    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in blocks.schema.fields)
    return blocks.mapInPandas(_mask, schema)


def _inverse_map_source_px(
    tx: int, ty: int, zoom: int, t: int, gt: np.ndarray, crs: str,
    block_x: int, block_y: int, w: int, h: int,
) -> tuple[np.ndarray, np.ndarray]:
    """For each target-tile pixel center (3857 grid), the fractional source
    pixel coordinate inside THIS block — returned as SEPARABLE 1-D maps
    (sx per column, sy per row): both supported transforms (3857 identity,
    4326 inverse-mercator — the two choices of src/main.rs:154-162) are
    axis-aligned, so the 2-D map factorizes and bilinear sampling needs no
    meshgrid."""
    assert gt[2] == 0.0 and gt[4] == 0.0, "rotated geo_transform unsupported"
    span = mercator.WORLD / (1 << zoom)
    mx = (tx + (np.arange(t) + 0.5) / t) * span - mercator.ORIGIN
    my = mercator.ORIGIN - (ty + (np.arange(t) + 0.5) / t) * span
    if crs == "EPSG:4326":
        gx = np.degrees(mx / mercator.R)
        gy = np.degrees(2.0 * np.arctan(np.exp(my / mercator.R)) - np.pi / 2.0)
    else:
        gx, gy = mx, my
    sx = (gx - gt[0]) / gt[1] - block_x * w   # (t,) per output column
    sy = (gy - gt[3]) / gt[5] - block_y * h   # (t,) per output row
    return sx, sy


def warp_blocks_to_tiles(
    blocks: DataFrame,
    zoom: int,
    tile_size: int = 256,
    resampling: str = "bilinear",
) -> DataFrame:
    """F11: reproject + resample raster blocks into (cell, payload) tiles at
    ``zoom``.  Handles EPSG:3857 (identity fast path) and EPSG:4326 sources;
    pieces from blocks straddling a tile merge alpha-gated (P4)."""
    t = tile_size

    def _warp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_c, out_p = [], []
            for row in pdf.itertuples(index=False):
                gt = np.asarray(row.geo_transform, float)
                w, h, nb = int(row.width), int(row.height), int(row.bands)
                img = np.frombuffer(row.data, np.uint8).reshape(h, w, nb).astype(np.float64)
                # block corner coords -> 3857 bbox -> covered tiles
                cx = gt[0] + (row.block_x * w + np.array([0.0, w])) * gt[1]
                cy = gt[3] + (row.block_y * h + np.array([0.0, h])) * gt[5]
                if row.crs == "EPSG:4326":
                    bx, by = mercator.np_lonlat_to_merc(cx, np.clip(cy, -85.06, 85.06))
                else:
                    bx, by = cx, cy
                span = mercator.WORLD / (1 << zoom)
                tx0 = int((bx.min() + mercator.ORIGIN) // span)
                tx1 = int((bx.max() + mercator.ORIGIN - 1e-9) // span)
                ty0 = int((mercator.ORIGIN - by.max()) // span)
                ty1 = int((mercator.ORIGIN - by.min() - 1e-9) // span)
                for ty in range(max(ty0, 0), min(ty1, (1 << zoom) - 1) + 1):
                    for tx in range(max(tx0, 0), min(tx1, (1 << zoom) - 1) + 1):
                        sx, sy = _inverse_map_source_px(
                            tx, ty, zoom, t, gt, row.crs, row.block_x, row.block_y, w, h
                        )
                        inbx = (sx >= -0.5) & (sx < w - 0.5)
                        inby = (sy >= -0.5) & (sy < h - 0.5)
                        if not (inbx.any() and inby.any()):
                            continue
                        # separable bilinear: row/column 1-D maps
                        x0 = np.clip(np.floor(sx).astype(int), 0, w - 1)
                        y0 = np.clip(np.floor(sy).astype(int), 0, h - 1)
                        if resampling == "nearest":
                            tile = img[np.clip(np.rint(sy).astype(int), 0, h - 1)][
                                :, np.clip(np.rint(sx).astype(int), 0, w - 1)
                            ]
                        else:  # bilinear, factorized: rows then columns
                            x1 = np.clip(x0 + 1, 0, w - 1)
                            y1 = np.clip(y0 + 1, 0, h - 1)
                            fx = np.clip(sx - x0, 0.0, 1.0)[None, :, None]
                            fy = np.clip(sy - y0, 0.0, 1.0)[:, None, None]
                            top = img[y0]
                            bot = img[y1]
                            rows_ = top * (1 - fy) + bot * fy        # (t, w, nb)
                            tile = rows_[:, x0] * (1 - fx) + rows_[:, x1] * fx
                        tile = np.clip(np.rint(tile), 0, 255).astype(np.uint8)
                        tile[~inby, :, :] = 0  # outside source: transparent
                        tile[:, ~inbx, :] = 0
                        out_c.append(int(cells.np_cell(zoom, tx, ty)))
                        out_p.append(tile.tobytes())
            yield pd.DataFrame({"cell": out_c, "payload": out_p})

    pieces = blocks.mapInPandas(_warp, "cell long, payload binary")
    nb = blocks.select("bands").first()[0]

    # batched alpha-gated merge: collect_list + ONE scalar Arrow UDF (a
    # groupBy.applyInPandas here would pay group dispatch per tile)
    @F.pandas_udf("binary")
    def _merge(payloads: pd.Series) -> pd.Series:
        out = []
        for lst in payloads:
            acc = None
            for p in lst:
                a = np.frombuffer(p, np.uint8).reshape(-1, nb)
                if acc is None:
                    acc = a.copy()
                else:
                    gate = a[:, -1] > 0  # alpha-gated copy (P4)
                    acc[gate] = a[gate]
            out.append(acc.tobytes())
        return pd.Series(out)

    packed = pieces.groupBy("cell").agg(F.collect_list("payload").alias("ps"))
    return packed.select("cell", _merge("ps").alias("payload"))


def tile_cover(spark, bbox_3857: tuple, zoom: int) -> DataFrame:
    """P1: all XYZ tiles at ``zoom`` intersecting a 3857 bbox, generated as
    a DataFrame (spark.range cross join — the distributed form of the
    reference's bbox_covered_tiles generator, src/main.rs:173-181)."""
    x0, y0, x1, y1 = bbox_3857
    span = mercator.WORLD / (1 << zoom)
    tx0 = max(int((x0 + mercator.ORIGIN) // span), 0)
    tx1 = min(int((x1 + mercator.ORIGIN - 1e-9) // span), (1 << zoom) - 1)
    ty0 = max(int((mercator.ORIGIN - y1) // span), 0)
    ty1 = min(int((mercator.ORIGIN - y0 - 1e-9) // span), (1 << zoom) - 1)
    xs = spark.range(tx0, tx1 + 1).select(F.col("id").alias("x"))
    ys = spark.range(ty0, ty1 + 1).select(F.col("id").alias("y"))
    return xs.crossJoin(ys).select(
        cells.cell(F.lit(zoom), F.col("x"), F.col("y")).alias("cell"), "x", "y"
    )


def empty_markers(cover: DataFrame, tiles: DataFrame) -> DataFrame:
    """P5/X8: zero-length payload rows for covered-but-empty tiles — the
    reference's 'known-empty' markers (src/processor.rs:186-190,594-601)
    that make the resume anti-join (S5) skip them next run."""
    missing = cover.select("cell").join(tiles.select("cell"), "cell", "left_anti")
    return missing.select("cell", F.lit(b"").alias("payload"))
