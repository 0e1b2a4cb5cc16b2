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


def test_hierarchical_cover_exact_and_smaller(spark):
    """Quadtree cover: (a) cover-cell count for a diagonal fixture drops
    >= 3x vs the bbox meshgrid; (b) the pip join output is identical to
    the broadcast (exact) path; (c) interior+boundary classification is
    sound (interior cells' centers+corners all inside)."""
    import numpy as np

    from freemap_tiler_spark.functions import mercator
    from freemap_tiler_spark.operators import pip_join as PJ

    # long thin diagonal quad: bbox cover is mostly empty
    xs = [14.0, 14.6, 22.0, 21.4]
    ys = [46.0, 45.7, 51.0, 51.3]
    polys = spark.createDataFrame([(1, 0, xs, ys, "diag")], PJ.POLYGON_SCHEMA)
    zoom = 10
    cover = PJ.polygon_covering_cells(polys, zoom).collect()
    tx0, ty1 = mercator.np_lonlat_to_tile(min(xs), min(ys), zoom)
    tx1, ty0 = mercator.np_lonlat_to_tile(max(xs), max(ys), zoom)
    bbox_cells = (int(tx1) - int(tx0) + 1) * (int(ty1) - int(ty0) + 1)
    assert len(cover) * 3 <= bbox_cells, (len(cover), bbox_cells)
    # classification soundness
    rings = [(np.asarray(xs, float), np.asarray(ys, float))]
    for r in cover:
        if r.interior:
            from freemap_tiler_spark.functions import cells as C
            _, x, y = C.np_cell_zxy(np.array([r.cell]))
            lon0, lat0, lon1, lat1 = PJ._cell_lonlat_bounds(
                x.astype(np.int64), y.astype(np.int64), zoom)
            px = np.array([lon0[0], lon1[0], lon0[0], lon1[0], (lon0[0]+lon1[0])/2])
            py = np.array([lat0[0], lat0[0], lat1[0], lat1[0], (lat0[0]+lat1[0])/2])
            assert PJ.points_in_polygon(px, py, rings).all()
    # join parity vs broadcast exact path
    g = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        (F.lit(14.0) + F.pmod(F.xxhash64("id"), 8000) / 1000.0).alias("lon"),
        (F.lit(45.5) + F.pmod(F.xxhash64("id", "id"), 6000) / 1000.0).alias("lat"),
    )
    a = {(r.doc_id, r.poly_id) for r in PJ.pip_join_cells(g, polys, zoom=zoom).collect()}
    b = {(r.doc_id, r.poly_id) for r in PJ.pip_join_broadcast(g, polys).collect()}
    assert a == b and len(a) > 50


def test_segments_hit_rects_vs_dense_sampling():
    """Property: for random segments x rects, if dense t-sampling finds a
    point of the segment inside the rect then Liang-Barsky must report a
    hit, and if LB reports no hit then no sample may land inside.
    (One-way each: sampling can miss grazing hits, never invent them.)"""
    import numpy as np

    from freemap_tiler_spark.operators.pip_join import _segments_hit_rects

    rng = np.random.default_rng(42)
    ts = np.linspace(0.0, 1.0, 257)
    for _ in range(300):
        p1 = rng.uniform(-10, 10, 2)
        p2 = rng.uniform(-10, 10, 2)
        lo = rng.uniform(-10, 8, 2)
        hi = lo + rng.uniform(0.1, 4, 2)
        hit = _segments_hit_rects(
            np.array([p1[0]]), np.array([p1[1]]),
            np.array([p2[0]]), np.array([p2[1]]),
            np.array([lo[0]]), np.array([lo[1]]),
            np.array([hi[0]]), np.array([hi[1]]),
        )[0]
        sx = p1[0] + (p2[0] - p1[0]) * ts
        sy = p1[1] + (p2[1] - p1[1]) * ts
        sampled = bool(((sx >= lo[0]) & (sx <= hi[0])
                        & (sy >= lo[1]) & (sy <= hi[1])).any())
        if sampled:
            assert hit
        if not hit:
            assert not sampled
    # degenerate axes: vertical, horizontal, point segments
    for p1, p2, rect, want in [
        ((1.0, -5.0), (1.0, 5.0), (0.0, -1.0, 2.0, 1.0), True),   # vertical
        ((5.0, -5.0), (5.0, 5.0), (0.0, -1.0, 2.0, 1.0), False),
        ((-5.0, 0.5), (5.0, 0.5), (0.0, -1.0, 2.0, 1.0), True),   # horizontal
        ((0.5, 0.5), (0.5, 0.5), (0.0, -1.0, 2.0, 1.0), True),    # point in
        ((9.0, 9.0), (9.0, 9.0), (0.0, -1.0, 2.0, 1.0), False),   # point out
    ]:
        import numpy as np
        got = _segments_hit_rects(
            np.array([p1[0]]), np.array([p1[1]]),
            np.array([p2[0]]), np.array([p2[1]]),
            np.array([rect[0]]), np.array([rect[1]]),
            np.array([rect[2]]), np.array([rect[3]]),
        )[0]
        assert bool(got) == want, (p1, p2, rect)


def test_hier_cover_matches_flat_rule():
    """The quadtree descent must produce EXACTLY the cells the flat
    per-cell rule keeps (center-in-polygon | boundary-segment-hit) over
    the full bbox meshgrid — a wrong coarse-level prune or interior
    expansion shows up as a set difference."""
    import numpy as np

    from freemap_tiler_spark.functions import mercator
    from freemap_tiler_spark.operators import pip_join as PJ

    xs = np.array([14.3, 19.0, 21.7, 17.0, 15.2])
    ys = np.array([46.2, 45.9, 50.8, 49.9, 48.0])
    rings = [(xs, ys)]
    zoom = 9
    got_c, got_i = PJ._hier_cover_one(rings, zoom)
    got = set(int(c) for c in got_c)
    # flat rule over the bbox meshgrid
    tx0, ty1 = mercator.np_lonlat_to_tile(xs.min(), ys.min(), zoom)
    tx1, ty0 = mercator.np_lonlat_to_tile(xs.max(), ys.max(), zoom)
    gx, gy = np.meshgrid(np.arange(int(tx0), int(tx1) + 1),
                         np.arange(int(ty0), int(ty1) + 1))
    fx, fy = gx.ravel().astype(np.int64), gy.ravel().astype(np.int64)
    lon0, lat0, lon1, lat1 = PJ._cell_lonlat_bounds(fx, fy, zoom)
    e2x, e2y = np.roll(xs, -1), np.roll(ys, -1)
    hit = PJ._segments_hit_rects(xs, ys, e2x, e2y, lon0, lat0, lon1, lat1)
    inside = PJ.points_in_polygon((lon0 + lon1) / 2, (lat0 + lat1) / 2, rings)
    from freemap_tiler_spark.functions import cells as C
    want = set(int(c) for c in C.np_cell(zoom, fx[hit | inside], fy[hit | inside]))
    assert got == want
    # interior flags: every interior cell's center is inside and its
    # boundary is untouched by polygon edges
    inter = got_c[got_i]
    if len(inter):
        _, ix, iy = C.np_cell_zxy(inter)
        l0, b0, l1, b1 = PJ._cell_lonlat_bounds(ix.astype(np.int64),
                                                iy.astype(np.int64), zoom)
        assert PJ.points_in_polygon((l0 + l1) / 2, (b0 + b1) / 2, rings).all()
        assert not PJ._segments_hit_rects(xs, ys, e2x, e2y, l0, b0, l1, b1).any()


def test_pip_cells_large_layer_shuffle_plan(spark, polys, pts):
    """VERDICT r4 #3: with a ring payload above autoBroadcastJoinThreshold
    and no caller override, the rings reach boundary candidates through a
    SHUFFLE equi-join (no BroadcastHashJoin over the ring arrays), interior
    rows never touch the rings, and the result is unchanged vs the
    broadcast prune."""
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 1024)
    try:
        out = pip_join.pip_join_cells(pts, polys, zoom=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the rings join keys on _rpid — assert it is not a broadcast join
        # (the tiny per-polygon tag dim IS still broadcast)
        assert "_rpid" in plan
        rings_join = [
            line for line in plan.splitlines()
            if "Join" in line and "_rpid" in line
        ]
        assert rings_join, "rings join not found in plan"
        for line in rings_join:
            assert "BroadcastHashJoin" not in line, f"rings join was broadcast: {line}"
        got = {(r.pid, r.poly_id) for r in out.select("pid", "poly_id").collect()}
        ref = {
            (r.pid, r.poly_id)
            for r in pip_join.pip_join_broadcast(pts, polys)
            .select("pid", "poly_id").collect()
        }
        assert got == ref and len(got) > 50
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)


def test_asof_join_semantics(spark):
    """As-of join via union-and-running-window: each left row matches the
    LATEST right row with ts <= left.ts per key (inclusive at equal ts,
    the kdb/DuckDB convention), NULL when nothing precedes; verified
    against a hand-evaluated oracle and invariant to repartitioning."""
    from datetime import datetime as dt

    from freemap_tiler_spark.operators.asof import asof_join

    L = [(1, 10, dt(2024, 1, 1, 0, 0, 5)),
         (1, 11, dt(2024, 1, 1, 0, 0, 10)),   # equal-ts tie with right 102
         (1, 12, dt(2024, 1, 1, 0, 0, 1)),    # before any right row
         (2, 20, dt(2024, 1, 1, 0, 0, 7)),
         (3, 30, dt(2024, 1, 1, 0, 0, 9))]    # key with no right rows
    R = [(1, 101, dt(2024, 1, 1, 0, 0, 3)),
         (1, 102, dt(2024, 1, 1, 0, 0, 10)),
         (2, 201, dt(2024, 1, 1, 0, 0, 2)),
         (2, 202, dt(2024, 1, 1, 0, 0, 6))]
    left = spark.createDataFrame(L, "user_id long, event_id long, ts timestamp")
    right = spark.createDataFrame(R, "user_id long, rid long, ts timestamp")

    def run(ldf, rdf):
        out = asof_join(ldf, rdf, "user_id", "ts", ["rid"])
        return {r.event_id: (r.r_rid, r.r_ts) for r in out.collect()}

    got = run(left, right)
    assert got[10][0] == 101      # latest right at/before 00:05 is 00:03
    assert got[11][0] == 102      # equal ts matches (inclusive)
    assert got[12] == (None, None)
    assert got[20][0] == 202
    assert got[30] == (None, None)
    assert set(got) == {10, 11, 12, 20, 30}  # left rows preserved exactly
    assert got == run(left.repartition(5), right.repartition(3))


def test_range_join_matches_brute_force(spark):
    """Bucketed range join == the quadratic inequality join on randomized
    data (incl. interval edges exactly on bin boundaries), and the plan
    is a hash equi-join — no BroadcastNestedLoopJoin/CartesianProduct."""
    import random

    from freemap_tiler_spark.operators.range_join import range_join

    rng = random.Random(5)
    pts = [(i, round(rng.uniform(0, 100), 6)) for i in range(400)]
    ivs = [(j, float(j * 4), float(j * 4 + rng.choice([4.0, 6.5, 11.0])))
           for j in range(25)]  # edges on multiples of the bin width
    p = spark.createDataFrame(pts, "pid long, value double")
    iv = spark.createDataFrame(ivs, "iid long, lo double, hi double")

    out = range_join(p, iv, "value", "lo", "hi", bucket_width=4.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    got = {(r.pid, r.iid) for r in out.collect()}
    want = {(pid, iid) for pid, v in pts for iid, lo, hi in ivs
            if lo <= v < hi}
    assert got == want and len(want) > 500
