"""Spatial joins: PIP strategies agree; kNN grid == brute (SURVEY §2.11)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from freemap_tiler_spark.operators import knn, pip_join, skew

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def polys(spark):
    return spark.createDataFrame(
        [
            (1, 0, [17.0, 18.0, 18.0, 17.0], [48.0, 48.0, 49.0, 49.0], "quad"),
            (2, 0, [19.0, 21.0, 21.0, 20.0, 20.0, 19.0],
             [48.0, 48.0, 48.5, 48.5, 49.5, 49.5], "ell"),
            (3, 0, [16.9, 17.9, 17.9, 16.9], [47.0, 47.0, 47.9, 47.9], "holed"),
            (3, 1, [17.2, 17.6, 17.6, 17.2], [47.3, 47.3, 47.6, 47.6], "holed"),
        ],
        pip_join.POLYGON_SCHEMA,
    )


@pytest.fixture(scope="module")
def pts(spark):
    return spark.range(3000).select(
        F.col("id").alias("pid"),
        (16.5 + (F.col("id") * 2654435761 % 1000003) / 1000003.0 * 5.5).alias("lon"),
        (46.8 + (F.col("id") * 2246822519 % 1000033) / 1000033.0 * 3.0).alias("lat"),
    )


def test_ray_cast_known():
    sq = (np.array([0.0, 2.0, 2.0, 0.0]), np.array([0.0, 0.0, 2.0, 2.0]))
    inside = pip_join.points_in_polygon(
        np.array([1.0, 3.0, -1.0]), np.array([1.0, 1.0, 1.0]), [sq]
    )
    assert inside.tolist() == [True, False, False]


def test_hole_excluded():
    outer = (np.array([0.0, 4.0, 4.0, 0.0]), np.array([0.0, 0.0, 4.0, 4.0]))
    hole = (np.array([1.0, 3.0, 3.0, 1.0]), np.array([1.0, 1.0, 3.0, 3.0]))
    inside = pip_join.points_in_polygon(
        np.array([2.0, 0.5]), np.array([2.0, 0.5]), [outer, hole]
    )
    assert inside.tolist() == [False, True]


def test_pip_strategies_agree(spark, polys, pts):
    b = pip_join.pip_join_broadcast(pts, polys).select("pid", "poly_id").collect()
    c = pip_join.pip_join_cells(pts, polys, zoom=8).select("pid", "poly_id").collect()
    sb = {(r.pid, r.poly_id) for r in b}
    sc = {(r.pid, r.poly_id) for r in c}
    assert sb == sc and len(sb) > 50


def test_pip_left_join_keeps_misses(spark, polys, pts):
    small = pts.limit(200)
    out = pip_join.pip_join_broadcast(small, polys, how="left")
    assert out.count() >= 200
    assert out.where(F.col("poly_id").isNull()).count() > 0


def test_knn_grid_matches_brute(spark, pts):
    probes = pts.where("pid % 150 = 0").selectExpr("pid as probe_id", "lon", "lat")
    points = pts.selectExpr("pid as point_id", "lon", "lat")
    g = knn.knn_join(probes, points, k=4, zoom=8).collect()
    b = knn.knn_join_brute(probes, points, k=4).collect()
    assert {(r.probe_id, r.point_id, r.rank) for r in g} == {
        (r.probe_id, r.point_id, r.rank) for r in b
    }


def test_salted_count_equals_plain(spark, pts):
    df = pts.withColumn("cell", F.col("pid") % 5)
    plain = {r.cell: r["count"] for r in df.groupBy("cell").count().collect()}
    salted = {r.cell: r["count"] for r in skew.salted_count(df, "cell").collect()}
    assert plain == salted


def test_skew_probe_finds_hot(spark, pts):
    skewed = pts.withColumn("cell", F.when(F.col("pid") % 10 < 8, 99).otherwise(F.col("pid")))
    hot = skew.skew_probe(skewed, "cell")
    assert hot == [99]


def test_knn_isolated_probe_ring_expansion(spark):
    """A probe whose 3x3 neighborhood holds ZERO candidates must still get
    its k neighbors via ring expansion (regression: `under` derived from
    `ranked` silently dropped exactly the zero-candidate probes)."""
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [(i, 20.0 + i * 0.001, 48.0) for i in range(20)],
        "point_id long, lon double, lat double",
    )
    probes = spark.createDataFrame(
        [(1, 20.0, 48.0), (2, 25.0, 49.9)],
        "probe_id long, lon double, lat double",
    )
    out = knn.knn_join(probes, pts, k=3, zoom=12, expand_rounds=6)
    got = {r.probe_id for r in out.select("probe_id").distinct().collect()}
    assert got == {1, 2}
    assert out.where(F.col("probe_id") == 2).count() == 3
