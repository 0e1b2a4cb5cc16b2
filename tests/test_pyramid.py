"""End-to-end pyramid tests (SURVEY §5.3) + text byte-identity (§5.5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from freemap_tiler_spark.functions import cells, text
from freemap_tiler_spark.operators import pyramid
from freemap_tiler_spark.sources.corpus import geotagged_corpus

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def points(spark):
    corpus = geotagged_corpus(spark, 1500)
    return corpus.select(
        text.geo_lon("text").alias("lon"), text.geo_lat("text").alias("lat")
    ).dropna()


def test_tile_key_set_matches_numpy_oracle(spark, points):
    """(a) exact tile key set per zoom vs single-process numpy oracle."""
    pdf = points.toPandas()
    from freemap_tiler_spark.functions import mercator

    levels = pyramid.build_pyramid(points, max_zoom=7, min_zoom=0, tile_size=32)
    got = pyramid.with_tile_keys(levels).select("zoom", "x", "y").toPandas()
    tx, ty = mercator.np_lonlat_to_tile(pdf.lon.values, pdf.lat.values, 7)
    for z in range(7, -1, -1):
        exp = set(zip((tx >> (7 - z)).tolist(), (ty >> (7 - z)).tolist()))
        g = got[got.zoom == z]
        assert set(zip(g.x.tolist(), g.y.tolist())) == exp, z


def test_parent_pixels_match_numpy_oracle(spark, points):
    """(b) parent pixel values vs an independent numpy mosaic+downsample."""
    from freemap_tiler_spark.functions.resample import downsample2x, mosaic_children

    t = 32
    levels = pyramid.build_pyramid(points, max_zoom=6, min_zoom=5, tile_size=t)
    rows = levels.collect()
    tiles = {r.cell: np.frombuffer(r.payload, np.uint8) for r in rows}
    parents = [c for c in tiles if (c >> 58) == 5]
    assert parents
    for p in parents:
        kids = {}
        for i in range(4):
            ch = int(cells.np_children(np.array([p]))[0, i])
            if ch in tiles:
                kids[i] = tiles[ch]
        exp = downsample2x(mosaic_children(kids, t, 2)).reshape(-1)
        assert (tiles[p] == exp).all()


def test_levels_per_shuffle_invariant(spark, points):
    """The shuffle-amortization knob must not change any byte."""
    a = pyramid.build_pyramid(points, max_zoom=6, tile_size=32, levels_per_shuffle=1)
    b = pyramid.build_pyramid(points, max_zoom=6, tile_size=32, levels_per_shuffle=4)
    pa = {r.cell: bytes(r.payload) for r in a.collect()}
    pb = {r.cell: bytes(r.payload) for r in b.collect()}
    assert pa == pb


def test_limits_match_keys(spark, points):
    levels = pyramid.build_pyramid(points, max_zoom=5, tile_size=32)
    keyed = pyramid.with_tile_keys(levels).cache()
    lim = {r.zoom: r for r in pyramid.limits(keyed).collect()}
    keys = keyed.select("zoom", "x", "tms_y").toPandas()
    for z, g in keys.groupby("zoom"):
        assert lim[z].min_x == g.x.min() and lim[z].max_x == g.x.max()
        assert lim[z].min_y == g.tms_y.min() and lim[z].max_y == g.tms_y.max()


def test_text_byte_identity(spark):
    """input_hint invariant: text carried byte-identical per url through
    the pipeline (extraction never mutates the column)."""
    corpus = geotagged_corpus(spark, 300)
    before = {r.url: r.text for r in corpus.collect()}
    piped = (
        corpus.withColumn("lat", text.geo_lat("text"))
        .withColumn("lon", text.geo_lon("text"))
        .withColumn("quality", text.quality_score(F.col("text")))
        .withColumn("fp", text.md5_fingerprint(F.col("text")))
    )
    after = {r.url: r.text for r in piped.collect()}
    assert before == after


def test_empty_input(spark, points):
    empty = points.where(F.lit(False))
    assert pyramid.build_pyramid(empty, max_zoom=4, tile_size=32).count() == 0


def test_clamp_levels_per_shuffle_pixel_budget():
    """SURVEY §7(5): one compose group holds a 4^k subtree in memory —
    k is clamped so 4^k * tile_size^2 * bands <= 64 MB."""
    from freemap_tiler_spark.operators.pyramid import clamp_levels_per_shuffle

    assert clamp_levels_per_shuffle(5, 256, 4) == 4   # 4^5 would be 268 MB
    assert clamp_levels_per_shuffle(5, 64, 2) == 5    # small tiles: unclamped
    assert clamp_levels_per_shuffle(3, 1024, 4) == 2  # 1024px RGBA: k=2 is 67MB
    assert clamp_levels_per_shuffle(8, 4096, 4) == 1  # never below 1
