"""GeoTIFF ingestion (S1 real path): binaryFile + numpy splitter.

The checked-in fixtures carry the synthetic block-pixel law
(FIXTURES.md §2) over the raster_blocks default geo-transform, so the
ingested table must be pixel-identical to the synthetic one — and a full
run_tiler over each must produce BYTE-identical stores.  Both fixtures
decode byte-exactly through Java ImageIO's TIFF reader (external
interchange evidence, verified at generation: gen_geotiff_fixtures.py).
"""

import os
import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from freemap_tiler_spark.sources import geotiff
from freemap_tiler_spark.sources.raster_blocks import block_pixels, raster_blocks

pytestmark = pytest.mark.spark

HERE = os.path.dirname(os.path.abspath(__file__))
FIX_TILED = os.path.join(HERE, "fixtures", "geotiff_law_tiled_deflate_p2.tif")
FIX_STRIPS = os.path.join(HERE, "fixtures", "geotiff_law_strips.tif")
GT = [1_870_000.0, 100.0, 0.0, 6_280_000.0, 0.0, -100.0]


def _law_image():
    img = np.zeros((128, 128, 4), np.uint8)
    for by in range(2):
        for bx in range(2):
            img[by*64:(by+1)*64, bx*64:(bx+1)*64] = block_pixels(bx, by, 64, 64, 4)
    return img


def _reassemble(rows):
    img = np.zeros((128, 128, 4), np.uint8)
    for r in rows:
        px0 = round((r.geo_transform[0] - GT[0]) / GT[1])
        py0 = round((r.geo_transform[3] - GT[3]) / GT[5])
        a = np.frombuffer(bytes(r.data), np.uint8).reshape(r.height, r.width, r.bands)
        img[py0:py0+r.height, px0:px0+r.width] = a
    return img


@pytest.mark.parametrize("fix", [FIX_TILED, FIX_STRIPS])
def test_ingested_pixels_match_law(spark, fix):
    rows = geotiff.geotiff_blocks(spark, fix).collect()
    assert all(r.crs == "EPSG:3857" for r in rows)
    assert np.array_equal(_reassemble(rows), _law_image())


def test_writer_variants_roundtrip(spark):
    """All writer layout/compression/predictor combinations survive the
    Spark ingestion path, including a non-multiple edge crop."""
    img = _law_image()[:100, :90]
    tmp = tempfile.mkdtemp(prefix="gtif_")
    try:
        cases = [
            dict(tile=(64, 64)),
            dict(tile=(64, 64), compression="deflate", predictor=2),
            dict(rows_per_strip=33),
            dict(rows_per_strip=33, compression="deflate", predictor=2),
            dict(tile=(64, 64), compression="lzw", predictor=2),
            dict(rows_per_strip=33, compression="lzw"),
            dict(rows_per_strip=33, compression="packbits"),
            dict(tile=(64, 64), compression="packbits"),
        ]
        for i, kw in enumerate(cases):
            p = os.path.join(tmp, f"v{i}.tif")
            geotiff.write_geotiff(p, img, GT, epsg=3857, **kw)
            rows = geotiff.geotiff_blocks(spark, p).collect()
            got = np.zeros_like(img)
            for r in rows:
                px0 = round((r.geo_transform[0] - GT[0]) / GT[1])
                py0 = round((r.geo_transform[3] - GT[3]) / GT[5])
                a = np.frombuffer(bytes(r.data), np.uint8).reshape(
                    r.height, r.width, r.bands)
                got[py0:py0+r.height, px0:px0+r.width] = a
            assert np.array_equal(got, img), kw
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_run_tiler_geotiff_matches_synthetic(spark):
    """Full pipeline parity (VERDICT r4 'Next round' #4 done criterion):
    run_tiler over the INGESTED fixture produces a store byte-identical
    to run_tiler over the synthetic blocks table with the same pixels."""
    from freemap_tiler_spark.pipeline import run_tiler
    from freemap_tiler_spark.plans import store

    synth = raster_blocks(spark, grid=2, width=64, height=64, bands=4)
    ingested = geotiff.geotiff_blocks(spark, FIX_TILED)
    roots = [tempfile.mkdtemp(prefix="gt_store_") for _ in range(2)]
    try:
        for blocks, root in zip([synth, ingested], roots):
            run_tiler(spark, blocks, root, max_zoom=9, min_zoom=8,
                      tile_size=32, fmt="png", resume=False)
        reads = [
            {(r.zoom, r.x, r.tms_y): bytes(r.tile_data)
             for r in store.read_tiles(spark, root).collect()}
            for root in roots
        ]
        assert reads[0].keys() == reads[1].keys() and len(reads[0]) > 0
        assert all(reads[0][k] == reads[1][k] for k in reads[0])
    finally:
        for root in roots:
            shutil.rmtree(root, ignore_errors=True)


def test_reader_rejects_unsupported():
    buf = open(FIX_TILED, "rb").read()
    with pytest.raises(geotiff.GeoTiffError):
        geotiff.geotiff_meta(b"XX" + buf[2:])
    with pytest.raises(geotiff.GeoTiffError):
        geotiff.geotiff_meta(buf[:4])
    # BigTIFF header with a wrong offset size must still be rejected
    import struct
    with pytest.raises(geotiff.GeoTiffError, match="BigTIFF"):
        geotiff.geotiff_meta(
            b"II" + struct.pack("<HHH", 43, 4, 0) + buf[8:])


def test_bigtiff_and_model_transform_roundtrip(spark):
    """BigTIFF container (magic 43, 8-byte offsets, LONG8 offset/count
    tags — the >4 GB orthophoto shape) and ModelTransformationTag
    georeferencing (GDAL's form for ROTATED sources) both roundtrip
    through the Spark ingestion path; the rotated case checks that the
    per-block geo_transform walks BOTH affine columns."""
    import numpy as np

    img = _law_image()[:100, :90]
    gt_rot = [GT[0], 90.0, 25.0, GT[3], 15.0, -90.0]
    tmp = tempfile.mkdtemp(prefix="gtif_big_")
    try:
        cases = [
            (dict(bigtiff=True, tile=(64, 64), compression="deflate",
                  predictor=2), GT),
            (dict(bigtiff=True, rows_per_strip=17, compression="lzw"), GT),
            (dict(model_transform=True, rows_per_strip=33), GT),
            (dict(bigtiff=True, model_transform=True, tile=(64, 64),
                  compression="packbits"), gt_rot),
        ]
        for i, (kw, g) in enumerate(cases):
            p = os.path.join(tmp, f"v{i}.tif")
            geotiff.write_geotiff(p, img, g, epsg=3857, **kw)
            m = geotiff.geotiff_meta(open(p, "rb").read())
            assert np.allclose(m["geo_transform"], g), kw
            rows = geotiff.geotiff_blocks(spark, p).collect()
            got = np.zeros_like(img)
            inv = np.linalg.inv([[g[1], g[2]], [g[4], g[5]]])
            for r in rows:
                bg = r.geo_transform
                px0, py0 = inv @ [bg[0] - g[0], bg[3] - g[3]]
                px0, py0 = round(px0), round(py0)
                a = np.frombuffer(bytes(r.data), np.uint8).reshape(
                    r.height, r.width, r.bands)
                got[py0:py0 + r.height, px0:px0 + r.width] = a
            assert np.array_equal(got, img), kw
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # rotated transforms refuse the PixelScale form (it cannot express them)
    with pytest.raises(geotiff.GeoTiffError, match="model_transform"):
        geotiff.write_geotiff(os.path.join("/tmp", "never.tif"),
                              img, gt_rot, epsg=3857)


def _imageio_ramp(w, h):
    """The deterministic RGB ramp GenTiffLzwFixtures.java writes."""
    img = np.zeros((h, w, 3), np.uint8)
    xs = np.arange(w)
    ys = np.arange(h)[:, None]
    img[..., 0] = (xs * 7 + ys * 3) & 0xFF
    img[..., 1] = (xs ^ ys) & 0xFF
    img[..., 2] = (xs + 2 * ys) & 0xFF
    img[(xs > w // 2) & (ys > h // 2)] = [200, 10, 10]
    return img


@pytest.mark.parametrize("name,comp", [
    ("imageio_lzw.tif", 5), ("imageio_packbits.tif", 32773),
])
def test_decode_imageio_compressed_tiff(name, comp):
    """External interchange (read side): strips written by Java ImageIO's
    TIFF plugin with LZW / PackBits compression decode pixel-exactly
    through our TIFF 6.0 §13/§9 codecs (generator: GenTiffLzwFixtures.java;
    the write side — ImageIO decoding OUR lzw/packbits files byte-exactly —
    was verified at fixture generation time with the same harness)."""
    buf = open(os.path.join(HERE, "fixtures", name), "rb").read()
    t = geotiff._read_ifd(buf)
    W, H, spp = t[256][0], t[257][0], t[277][0]
    assert t[259][0] == comp
    meta = {"compression": comp, "bands": spp,
            "predictor": t.get(317, (1,))[0]}
    rps = t.get(278, (H,))[0]
    offs, cnts = t[273], t[279]
    img = np.zeros((H, W, spp), np.uint8)
    for i in range(len(offs)):
        h = min(rps, H - i * rps)
        img[i * rps:i * rps + h] = geotiff._decode_block(
            buf, offs[i], cnts[i], meta, h, W)
    assert np.array_equal(img[..., :3], _imageio_ramp(W, H))


def test_jpeg_in_tiff_decode_matches_imageio():
    """Compression=7 (JPEG-in-TIFF, the dominant real orthophoto delivery
    form: YCbCr tiles/strips, optional shared JPEGTables): our decode of
    ImageIO's JPEG TIFF must match ImageIO's OWN decode of the same file
    within chroma-rounding tolerance (fixtures: GenTiffLzwFixtures.java
    write/read JPEG)."""
    buf = open(os.path.join(HERE, "fixtures", "imageio_jpeg.tif"),
               "rb").read()
    t = geotiff._read_ifd(buf)
    assert t[259][0] == 7 and t[262][0] == 6  # JPEG + YCbCr
    m = geotiff.geotiff_meta(buf, require_geo=False)
    ours = geotiff.read_region(buf, 0, 0, m["width"], m["height"], m)
    theirs = np.frombuffer(
        open(os.path.join(HERE, "fixtures", "imageio_jpeg.rgb"),
             "rb").read(), np.uint8,
    ).reshape(90, 150, 4)[:, :, :3]
    d = np.abs(ours.astype(int) - theirs.astype(int))
    assert d.max() <= 3 and d.mean() < 1.0


def test_jpeg_in_tiff_writer_roundtrip(spark):
    """Our own jpeg-compressed GeoTIFF roundtrips through the Spark
    ingestion path within lossy tolerance; geo carries exactly."""
    img = _law_image()[:100, :90, :3]
    tmp = tempfile.mkdtemp(prefix="gtif_jpg_")
    try:
        p = os.path.join(tmp, "q.tif")
        geotiff.write_geotiff(p, img, GT, epsg=3857, tile=(64, 64),
                              compression="jpeg")
        rows = geotiff.geotiff_blocks(spark, p).collect()
        got = np.zeros((100, 90, 4), np.uint8)
        for r in rows:
            px0 = round((r.geo_transform[0] - GT[0]) / GT[1])
            py0 = round((r.geo_transform[3] - GT[3]) / GT[5])
            a = np.frombuffer(bytes(r.data), np.uint8).reshape(
                r.height, r.width, r.bands)
            got[py0:py0 + r.height, px0:px0 + r.width] = a
        assert (got[:, :, 3] == 255).all()
        d = np.abs(got[:, :, :3].astype(int) - img.astype(int))
        assert d.mean() < 4.0 and d.max() <= 70, (d.mean(), d.max())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_lzw_packbits_corrupt_streams_raise():
    from freemap_tiler_spark.sources.geotiff import (
        GeoTiffError, _lzw_decode, _lzw_encode, _packbits_decode)
    good = _lzw_encode(b"hello world " * 40)
    assert _lzw_decode(good) == b"hello world " * 40
    with pytest.raises(GeoTiffError, match="truncated|corrupt"):
        _lzw_decode(good[:len(good) // 2])
    with pytest.raises(GeoTiffError, match="ClearCode"):
        _lzw_decode(b"\x00\x00\x00")  # literal before any Clear
    with pytest.raises(GeoTiffError, match="short|truncated"):
        _packbits_decode(b"\x05abc", 10)  # literal run cut off


def test_cog_overviews_roundtrip_and_selection(spark):
    """COG-style reduced-resolution IFD chain: the writer appends
    box-averaged overview levels (NewSubfileType=1), the reader walks the
    chain, derives each level's geo_transform by the size ratio, selects
    the coarsest level that still resolves a target pixel size, and the
    Spark ingestion path decodes THAT level."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (200, 176, 3), np.uint8)
    g = [1000.0, 10.0, 0.0, 5000.0, 0.0, -10.0]
    tmp = tempfile.mkdtemp(prefix="cog_")
    try:
        p = os.path.join(tmp, "cog.tif")
        geotiff.write_geotiff(p, img, g, epsg=3857, tile=(64, 64),
                              compression="deflate", overviews=[2, 4])
        buf = open(p, "rb").read()
        metas = geotiff.geotiff_overviews(buf)
        assert [m["width"] for m in metas] == [176, 88, 44]
        # level geo scales by the size ratio
        assert abs(metas[1]["geo_transform"][1] - 20.0) < 1e-9
        # full-res pixels exact; overview pixels equal the box-mean oracle
        assert np.array_equal(
            geotiff.read_region(buf, 0, 0, 176, 200, metas[0]), img)
        f = 4
        m = metas[2]
        c = img[:200 // f * f, :176 // f * f].astype(np.uint32)
        c = c.reshape(200 // f, f, 176 // f, f, 3)
        exp = ((c.sum(axis=(1, 3)) + f * f // 2) // (f * f)).astype(np.uint8)
        assert np.array_equal(
            geotiff.read_region(buf, 0, 0, m["width"], m["height"], m), exp)
        # selection semantics
        assert geotiff.select_overview(metas, 45.0) is metas[2]
        assert geotiff.select_overview(metas, 25.0) is metas[1]
        assert geotiff.select_overview(metas, 9.0) is metas[0]
        # Spark path: max_pixel_size picks the overview (4x fewer pixels
        # per axis -> the 44x50 level, still RGBA after ensure_alpha)
        rows = geotiff.geotiff_blocks(spark, p, max_pixel_size=45.0).collect()
        assert sum(r.width * r.height for r in rows) == 44 * 50
        assert all(abs(r.geo_transform[1] - 40.0) < 1e-9 for r in rows)
        full = geotiff.geotiff_blocks(spark, p).collect()
        assert sum(r.width * r.height for r in full) == 176 * 200
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_read_ifd_tolerates_sbyte_and_undefined_tags():
    """Type 6 (SBYTE) decodes; type 7 (UNDEFINED — ICC/EXIF/Photoshop
    blobs that GDAL output routinely carries) is kept as opaque bytes
    instead of crashing the whole ingestion with a KeyError."""
    import struct

    from freemap_tiler_spark.sources.geotiff import _read_ifd

    entries = [
        struct.pack("<HHI", 50000, 7, 3) + b"abc\0",   # UNDEFINED, inline
        struct.pack("<HHI", 50001, 6, 2) + struct.pack("<bb", -3, 5) + b"\0\0",
        struct.pack("<HHI", 256, 3, 1) + struct.pack("<HH", 64, 0),  # width
    ]
    buf = (b"II*\0" + struct.pack("<I", 8)
           + struct.pack("<H", len(entries)) + b"".join(entries)
           + struct.pack("<I", 0))
    tags = _read_ifd(buf)
    assert tags[50000] == (b"abc",)
    assert tags[50001] == (-3, 5)
    assert tags[256] == (64,)


def test_overview_chain_skips_mask_ifds_and_measures_true_pitch():
    """Only NewSubfileType bit-0 pages are overviews: a chained IFD
    retagged as an internal MASK (bit 2 — routine in GDAL JPEG COGs)
    must be skipped, not adopted as a pixel source; and select_overview
    must measure the TRUE column pitch (hypot of both x terms) so
    rotated ModelTransformation sources pick the right level."""
    import struct

    img = np.zeros((128, 128, 3), np.uint8)
    g = [0.0, 10.0, 0.0, 0.0, 0.0, -10.0]
    tmp = tempfile.mkdtemp(prefix="cogmask_")
    try:
        p = os.path.join(tmp, "c.tif")
        geotiff.write_geotiff(p, img, g, epsg=3857, tile=(64, 64),
                              overviews=[2])
        buf = bytearray(open(p, "rb").read())
        assert len(geotiff.geotiff_overviews(bytes(buf))) == 2
        # retag the overview IFD's NewSubfileType from 1 (reduced) to 4
        # (mask): entry bytes <HHI I> = (254, 4, 1, value)
        pat = struct.pack("<HHII", 254, 4, 1, 1)
        i = bytes(buf).find(pat)
        assert i > 0
        buf[i:i + len(pat)] = struct.pack("<HHII", 254, 4, 1, 4)
        metas = geotiff.geotiff_overviews(bytes(buf))
        assert len(metas) == 1  # mask page skipped; full-res remains
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # rotated pitch: gt columns (90, 15) have true pitch ~91.2; a naive
    # gt[1]-only measure would call the 2x level (182.5) "91*2=180<=184"
    # equally wrongly — assert the hypot rule picks correctly
    base = {"geo_transform": [0, 90.0, 25.0, 0, 15.0, -90.0]}
    lvl2 = {"geo_transform": [0, 180.0, 50.0, 0, 30.0, -180.0]}
    pick = geotiff.select_overview([base, lvl2], max_pixel_size=100.0)
    assert pick is base          # 182.5 > 100: the 2x level under-resolves
    pick = geotiff.select_overview([base, lvl2], max_pixel_size=200.0)
    assert pick is lvl2          # 182.5 <= 200: coarser level suffices
