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
    # -0.5: (gx-gt0)/gt1 is EDGE-based (source pixel j spans [j, j+1), its
    # center at j+0.5); the samplers are CENTER-based (sample coord j ==
    # pixel j's center).  Without the shift every warp was misregistered by
    # half a source pixel (caught by the aligned-identity golden test).
    sx = (gx - gt[0]) / gt[1] - block_x * w - 0.5   # (t,) per output column
    sy = (gy - gt[3]) / gt[5] - block_y * h - 0.5   # (t,) per output row
    return sx, sy


def _lanczos_weights_at(
    centers: np.ndarray, src_lo: int, src_hi: int, scale: float
) -> np.ndarray:
    """(m, src_hi-src_lo) float32 Lanczos-3 weight rows at arbitrary
    fractional source centers (GRA_Lanczos equivalent, src/warp.rs:19).
    Kernel stretched by ``scale`` when downscaling; edge clamp by index
    clip; rows normalized."""
    from freemap_tiler_spark.functions.resample import lanczos_kernel

    sc = max(float(scale), 1.0)
    support = 3.0 * sc
    n = src_hi - src_lo
    w = np.zeros((len(centers), n), dtype=np.float32)
    for j, c in enumerate(centers):
        idx = np.arange(int(np.floor(c - support)), int(np.ceil(c + support)) + 1)
        k = lanczos_kernel((idx - c) / sc).astype(np.float32)
        np.add.at(w[j], np.clip(idx, src_lo, src_hi - 1) - src_lo, k)
        s = w[j].sum()
        if s != 0:
            w[j] /= s
    return w


def warp_blocks_to_tiles(
    blocks: DataFrame,
    zoom: int,
    tile_size: int = 256,
    resampling: str = "lanczos",
) -> DataFrame:
    """F11: reproject + resample raster blocks into (cell, payload) tiles at
    ``zoom``.  Handles EPSG:3857 (identity fast path) and EPSG:4326 sources;
    pieces from blocks straddling a tile merge alpha-gated (P4).

    Resampling: ``lanczos`` (the reference's default, src/warp.rs:19 /
    src/processor.rs:389), ``bilinear``, ``nearest``.

    Shuffle shape: each block emits CROPPED pieces — only the target-pixel
    rectangle whose source centers fall inside this block, with its (px0,
    py0) offset — so warp shuffle volume == source volume (emitting full
    tile canvases per piece measured 4x amplification, and this host's
    shared memory bus is the scaling ceiling)."""
    t = tile_size

    def _warp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            o_c, o_x0, o_y0, o_w, o_h, o_p = [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                gt = np.asarray(row.geo_transform, float)
                w, h, nb = int(row.width), int(row.height), int(row.bands)
                img = np.frombuffer(row.data, np.uint8).reshape(h, w, nb).astype(np.float32)
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
                # source pixels per target pixel (kernel stretch when the
                # warp downscales); axis-aligned transforms -> per-axis
                sx_scale = span / t / abs(gt[1])
                sy_scale = span / t / abs(gt[5])
                for ty in range(max(ty0, 0), min(ty1, (1 << zoom) - 1) + 1):
                    for tx in range(max(tx0, 0), min(tx1, (1 << zoom) - 1) + 1):
                        sx, sy = _inverse_map_source_px(
                            tx, ty, zoom, t, gt, row.crs, row.block_x, row.block_y, w, h
                        )
                        inbx = (sx >= -0.5) & (sx < w - 0.5)
                        inby = (sy >= -0.5) & (sy < h - 0.5)
                        if not (inbx.any() and inby.any()):
                            continue
                        # crop to the in-block target rectangle (the maps
                        # are monotone, so the masks are contiguous runs)
                        xi, yi = np.nonzero(inbx)[0], np.nonzero(inby)[0]
                        px0, px1 = int(xi[0]), int(xi[-1]) + 1
                        py0, py1 = int(yi[0]), int(yi[-1]) + 1
                        sxc, syc = sx[px0:px1], sy[py0:py1]
                        if resampling == "nearest":
                            piece = img[np.clip(np.rint(syc).astype(int), 0, h - 1)][
                                :, np.clip(np.rint(sxc).astype(int), 0, w - 1)
                            ]
                        elif resampling == "bilinear":
                            x0 = np.clip(np.floor(sxc).astype(int), 0, w - 1)
                            y0 = np.clip(np.floor(syc).astype(int), 0, h - 1)
                            x1 = np.clip(x0 + 1, 0, w - 1)
                            y1 = np.clip(y0 + 1, 0, h - 1)
                            fx = np.clip(sxc - x0, 0.0, 1.0).astype(np.float32)[None, :, None]
                            fy = np.clip(syc - y0, 0.0, 1.0).astype(np.float32)[:, None, None]
                            top, bot = img[y0], img[y1]
                            rows_ = top * (1 - fy) + bot * fy
                            piece = rows_[:, x0] * (1 - fx) + rows_[:, x1] * fx
                        else:  # lanczos (separable, windowed two-GEMM)
                            sup_y = 3.0 * max(sy_scale, 1.0)
                            sup_x = 3.0 * max(sx_scale, 1.0)
                            wy0 = max(int(np.floor(syc.min() - sup_y)), 0)
                            wy1 = min(int(np.ceil(syc.max() + sup_y)) + 1, h)
                            wx0 = max(int(np.floor(sxc.min() - sup_x)), 0)
                            wx1 = min(int(np.ceil(sxc.max() + sup_x)) + 1, w)
                            wy = _lanczos_weights_at(syc, wy0, wy1, sy_scale)
                            wx = _lanczos_weights_at(sxc, wx0, wx1, sx_scale)
                            win = img[wy0:wy1, wx0:wx1]
                            tmp = np.tensordot(wy, win, axes=(1, 0))
                            piece = np.tensordot(wx, tmp, axes=(1, 1)).transpose(1, 0, 2)
                        piece = np.clip(np.rint(piece), 0, 255).astype(np.uint8)
                        o_c.append(int(cells.np_cell(zoom, tx, ty)))
                        o_x0.append(px0)
                        o_y0.append(py0)
                        o_w.append(px1 - px0)
                        o_h.append(py1 - py0)
                        o_p.append(piece.tobytes())
            yield pd.DataFrame(
                {"cell": o_c, "px0": o_x0, "py0": o_y0,
                 "pw": o_w, "ph": o_h, "payload": o_p}
            )

    pieces = blocks.mapInPandas(
        _warp, "cell long, px0 int, py0 int, pw int, ph int, payload binary"
    )
    nb = blocks.select("bands").first()[0]

    # batched alpha-gated paste: collect_list + ONE scalar Arrow UDF (a
    # groupBy.applyInPandas here would pay group dispatch per tile); a tile
    # gathers ~4 small pieces, so the struct list stays tiny
    @F.pandas_udf("binary")
    def _merge(pieces_col: pd.Series) -> pd.Series:
        out = []
        for lst in pieces_col:
            canvas = np.zeros((t, t, nb), dtype=np.uint8)
            for pc in lst:
                ph, pw = int(pc["ph"]), int(pc["pw"])
                x0, y0 = int(pc["px0"]), int(pc["py0"])
                a = np.frombuffer(pc["payload"], np.uint8).reshape(ph, pw, nb)
                gate = a[:, :, -1] > 0  # alpha-gated copy (P4)
                dst = canvas[y0:y0 + ph, x0:x0 + pw]
                dst[gate] = a[gate]
            out.append(canvas.tobytes())
        return pd.Series(out)

    packed = pieces.groupBy("cell").agg(
        F.collect_list(F.struct("px0", "py0", "pw", "ph", "payload")).alias("ps")
    )
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
