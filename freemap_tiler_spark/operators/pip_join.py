"""Point-in-polygon joins.

Generalizes the reference's single-polygon tile prune (rectangle-intersects-
polygon filter, src/main.rs:183-199) to a relational join between a point
table and a polygon layer, per BASELINE.json ("point-in-polygon joins ...
broadcast R-tree for small layers and a cell-prefix repartition-join with
salting for skewed hot cells").

Two physical strategies, chosen by layer size (the engine's only
"optimizer" decision, SURVEY.md §4):

- **Broadcast path** (small layer): polygon vertex arrays ship to every
  executor inside the UDF closure; candidate pruning via a vectorized bbox
  test (the flat R-tree: all boxes checked at once in numpy — at <=10^4
  polygons a dense bbox matrix beats tree traversal), then an exact
  even-odd ray-cast.  No shuffle at all.

- **Cell-prefix path** (large layer): polygons exploded to covering cells
  at a chosen zoom (the generalization of the reference's
  bbox_covered_tiles enumeration, src/main.rs:173-181), points assigned to
  the same cells (pure Column math), equi-join on cell (AQE handles skew;
  see operators.skew for explicit salting), exact ray-cast after the join.

Geometry model: a polygon = one or more rings; ring 0 is the outer shell,
further rings are holes.  The even-odd rule over all rings handles holes
with no special casing.  Coordinates are planar (lon/lat degrees or
EPSG:3857 meters — the test is affine-invariant).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from freemap_tiler_spark.functions import cells, mercator

POLYGON_SCHEMA = (
    "poly_id long, ring_idx int, xs array<double>, ys array<double>, tag string"
)


def ray_cast(px: np.ndarray, py: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized even-odd crossing test: (N,) points vs one (M,) ring.

    Returns (N,) bool of crossing parity against this ring; XOR parities
    across a polygon's rings for the with-holes test.
    """
    x1, y1 = xs, ys
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    py_ = py[:, None]
    px_ = px[:, None]
    crosses = (y1[None, :] > py_) != (y2[None, :] > py_)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1)[None, :] * (py_ - y1[None, :]) / (y2 - y1)[None, :] + x1[None, :]
    hits = crosses & (px_ < xint)
    return hits.sum(axis=1) % 2 == 1


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, rings: list[tuple[np.ndarray, np.ndarray]]
) -> np.ndarray:
    """Even-odd over all rings (outer + holes)."""
    inside = np.zeros(len(px), dtype=bool)
    for xs, ys in rings:
        inside ^= ray_cast(px, py, xs, ys)
    return inside


def collect_polygons(polygons: DataFrame) -> list[dict]:
    """Driver-side collect of a SMALL polygon layer into broadcastable form:
    [{poly_id, tag, rings: [(xs, ys), ...], bbox: (x0,y0,x1,y1)}]."""
    rows = polygons.orderBy("poly_id", "ring_idx").collect()
    out: dict[int, dict] = {}
    for r in rows:
        p = out.setdefault(
            int(r.poly_id), {"poly_id": int(r.poly_id), "tag": r.tag, "rings": []}
        )
        p["rings"].append((np.asarray(r.xs, float), np.asarray(r.ys, float)))
    for p in out.values():
        xs = np.concatenate([r[0] for r in p["rings"]])
        ys = np.concatenate([r[1] for r in p["rings"]])
        p["bbox"] = (xs.min(), ys.min(), xs.max(), ys.max())
    return list(out.values())


def pip_join_broadcast(
    points: DataFrame,
    polygons: DataFrame | list[dict],
    x_col: str = "lon",
    y_col: str = "lat",
    how: str = "inner",
) -> DataFrame:
    """points |><| polygons on contains(poly, point), broadcast strategy.

    Output: points columns + (poly_id, tag); a point inside k polygons
    yields k rows (true join semantics).  how='left' keeps misses with NULL
    poly_id.  Zero shuffles: mapInPandas over the points only.
    """
    polys = polygons if isinstance(polygons, list) else collect_polygons(polygons)
    bboxes = np.array([p["bbox"] for p in polys]) if polys else np.zeros((0, 4))
    out_fields = list(points.schema.fieldNames()) + ["poly_id", "tag"]
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in points.schema.fields]
        + ["poly_id long", "tag string"]
    )
    left = how == "left"

    def _match(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = pdf[x_col].to_numpy(float)
            py = pdf[y_col].to_numpy(float)
            idx_acc, pid_acc, tag_acc = [], [], []
            matched = np.zeros(len(pdf), dtype=bool)
            if len(polys):
                # flat R-tree: one vectorized bbox mask per polygon
                for p, bb in zip(polys, bboxes):
                    cand = (
                        (px >= bb[0]) & (px <= bb[2]) & (py >= bb[1]) & (py <= bb[3])
                    )
                    if not cand.any():
                        continue
                    ci = np.nonzero(cand)[0]
                    inside = points_in_polygon(px[ci], py[ci], p["rings"])
                    hit = ci[inside]
                    idx_acc.append(hit)
                    pid_acc.append(np.full(len(hit), p["poly_id"], dtype=np.int64))
                    tag_acc.extend([p["tag"]] * len(hit))
                    matched[hit] = True
            idx = np.concatenate(idx_acc) if idx_acc else np.array([], dtype=np.int64)
            pid = np.concatenate(pid_acc) if pid_acc else np.array([], dtype=np.int64)
            out = pdf.iloc[idx].copy()
            out["poly_id"] = pid
            out["tag"] = tag_acc
            if left:
                miss = pdf.iloc[~matched].copy()
                miss["poly_id"] = None
                miss["tag"] = None
                out = pd.concat([out, miss])
            yield out[out_fields]

    return points.mapInPandas(_match, schema)


def polygon_covering_cells(polygons: DataFrame, zoom: int) -> DataFrame:
    """Explode each polygon to the cells (at ``zoom``) its bbox covers —
    the P1 tile-coverage generator (src/main.rs:173-181) applied per row.

    Coordinates are lon/lat degrees.  Output: (poly_id, cell).
    """

    def _cover(pdf: pd.DataFrame) -> pd.DataFrame:
        pids, ccells = [], []
        for pid, g in pdf.groupby("poly_id"):
            xs = np.concatenate([np.asarray(v, float) for v in g["xs"]])
            ys = np.concatenate([np.asarray(v, float) for v in g["ys"]])
            tx0, ty1 = mercator.np_lonlat_to_tile(xs.min(), ys.min(), zoom)
            tx1, ty0 = mercator.np_lonlat_to_tile(xs.max(), ys.max(), zoom)
            gx, gy = np.meshgrid(
                np.arange(int(tx0), int(tx1) + 1), np.arange(int(ty0), int(ty1) + 1)
            )
            c = cells.np_cell(zoom, gx.ravel(), gy.ravel())
            pids.append(np.full(len(c), pid, dtype=np.int64))
            ccells.append(c)
        if not pids:
            return pd.DataFrame({"poly_id": [], "cell": []}).astype("int64")
        return pd.DataFrame(
            {"poly_id": np.concatenate(pids), "cell": np.concatenate(ccells)}
        )

    return polygons.groupBy("poly_id").applyInPandas(
        lambda _k, pdf: _cover(pdf), "poly_id long, cell long"
    )


def pip_join_cells(
    points: DataFrame,
    polygons: DataFrame,
    zoom: int = 10,
    x_col: str = "lon",
    y_col: str = "lat",
    salt: int | None = None,
) -> DataFrame:
    """Cell-prefix repartition join for LARGE polygon layers.

    points -> cell (Column math) ; polygons -> covering cells (explode) ;
    equi-join on cell ; exact ray-cast on the joined candidates.  The
    equi-join is a plain shuffle join Catalyst/AQE can optimize (skew split,
    broadcast if the exploded layer turns out small).

    ``salt=s`` adds EXPLICIT hot-cell salting (the north-star's dense-urban
    -tiles case): each point also carries a deterministic salt in [0, s),
    the covering-cell side is replicated s times, and the join key becomes
    (cell, salt) — one hot cell's candidates spread over s reducers even
    without AQE.  Result identical by construction.
    """
    pts = points.withColumn(
        "cell",
        cells.cell(
            F.lit(zoom),
            mercator.tile_x(F.col(x_col), F.lit(zoom)),
            mercator.tile_y(F.col(y_col), F.lit(zoom)),
        ),
    )
    cover = polygon_covering_cells(polygons, zoom)
    if salt and salt > 1:
        pts = pts.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col(x_col), F.col(y_col)), F.lit(salt)).cast("int"),
        )
        cover = cover.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        )
        rings = polygons.orderBy("ring_idx").groupBy("poly_id").agg(
            F.collect_list("xs").alias("all_xs"),
            F.collect_list("ys").alias("all_ys"),
            F.first("tag").alias("tag"),
        )
        cand = (
            pts.join(cover, ["cell", "_salt"]).drop("cell", "_salt").join(rings, "poly_id")
        )
        return _pip_exact_raycast(cand, points, x_col, y_col)
    # rings aggregated to ONE row per polygon (outer + holes as array<array>)
    rings = polygons.orderBy("ring_idx").groupBy("poly_id").agg(
        F.collect_list("xs").alias("all_xs"),
        F.collect_list("ys").alias("all_ys"),
        F.first("tag").alias("tag"),
    )
    cand = pts.join(cover, "cell").drop("cell").join(rings, "poly_id")
    return _pip_exact_raycast(cand, points, x_col, y_col)


def _pip_exact_raycast(
    cand: DataFrame, points: DataFrame, x_col: str, y_col: str
) -> DataFrame:
    """Exact even-odd verify over (point x candidate-polygon) rows."""
    out_cols = list(points.schema.fieldNames()) + ["poly_id", "tag"]
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in points.schema.fields]
        + ["poly_id long", "tag string"]
    )

    def _exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf.reindex(columns=out_cols)
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf[x_col].to_numpy(float)
            py = pdf[y_col].to_numpy(float)
            # vectorized per polygon: all candidate points of one polygon
            # in a single ray-cast batch
            for pid, g in pdf.groupby("poly_id", sort=False):
                first = g.iloc[0]
                poly_rings = [
                    (np.asarray(xs, float), np.asarray(ys, float))
                    for xs, ys in zip(first["all_xs"], first["all_ys"])
                ]
                ci = g.index.to_numpy()
                pos = pdf.index.get_indexer(ci)
                keep[pos] = points_in_polygon(px[pos], py[pos], poly_rings)
            yield pdf.loc[keep, out_cols]

    return cand.mapInPandas(_exact, schema)
