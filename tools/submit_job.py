"""spark-submit entrypoint (north_rule: "run via spark-submit --py-files").

Usage (see tools/submit.sh):
    spark-submit --master local[8] --py-files /tmp/freemap_tiler_spark.zip \\
        tools/submit_job.py <work_dir> [rows] [max_zoom]

Builds the geotagged corpus, runs the full pyramid pipeline (extract ->
rasterize -> compose -> lineage-committed write), prints ONE JSON line with
per-level counts, and exits non-zero if the pyramid closure property fails
— a self-checking job, not a smoke print.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> int:
    work = sys.argv[1]
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    max_zoom = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    # plain builder: configuration comes from spark-submit flags (the
    # cluster path), not from the library's local-mode defaults
    spark = SparkSession.builder.appName("freemap-tiler-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from freemap_tiler_spark.functions import text as T
    from freemap_tiler_spark.operators import pyramid as P
    from freemap_tiler_spark.plans import lineage as L
    from freemap_tiler_spark.sources.corpus import geotagged_corpus

    pts = geotagged_corpus(spark, rows).select(
        T.geo_lon("text").alias("lon"), T.geo_lat("text").alias("lat")
    ).dropna()
    leaves = P.rasterize_level(P.assign_cells(pts, "lon", "lat", max_zoom), 64)
    counts = L.write_pyramid(spark, leaves, work, max_zoom, 0, 64, resume=False)

    # closure self-check: zoom-z key set == distinct parents of zoom-(z+1)
    from freemap_tiler_spark.functions import cells

    ok = True
    for z in range(max_zoom, 0, -1):
        child = spark.read.parquet(L.level_path(work, z))
        parent = spark.read.parquet(L.level_path(work, z - 1))
        want = {r[0] for r in child.select(cells.parent("cell")).distinct().collect()}
        got = {r[0] for r in parent.select("cell").collect()}
        if want != got:
            ok = False
            break

    # second self-check (r5-cont): the reference README's input shape —
    # a VRT mosaic of geo-tag-free members declared in EPSG:8353
    # (Krovak + 7-param Helmert) — must tile correctly from the
    # zip-shipped engine: the Krovak closures pickle to executor python
    # workers and the VRT splitter opens member paths executor-side.
    import math
    import os

    import numpy as np

    from freemap_tiler_spark.functions import crs as C
    from freemap_tiler_spark.functions import mercator as M
    from freemap_tiler_spark.pipeline import run_tiler
    from freemap_tiler_spark.plans import store
    from freemap_tiler_spark.sources.geotiff import write_geotiff
    from freemap_tiler_spark.sources.vrt import vrt_blocks

    vdir = os.path.join(work, "vrt_sk")
    os.makedirs(vdir, exist_ok=True)
    img = np.zeros((128, 128, 3), np.uint8)
    img[:, :, 0] = np.arange(128, dtype=np.uint8)[None, :]
    img[:, :, 1] = 200
    write_geotiff(os.path.join(vdir, "a.tif"), img[:, :64], None,
                  tile=(64, 64), compression="deflate")
    write_geotiff(os.path.join(vdir, "b.tif"), img[:, 64:], None,
                  tile=(64, 64), compression="lzw")
    kr = C._Krovak()
    kx, ky = kr.fwd(np.array([math.radians(19.1)]),
                    np.array([math.radians(48.7)]))
    gt = [float(kx[0]), 100.0, 0.0, float(ky[0]), 0.0, -100.0]

    def band(b):
        srcs = "".join(f"""
    <SimpleSource>
      <SourceFilename relativeToVRT="1">{fn}</SourceFilename>
      <SourceBand>{b}</SourceBand>
      <SrcRect xOff="0" yOff="0" xSize="64" ySize="128" />
      <DstRect xOff="{dx}" yOff="0" xSize="64" ySize="128" />
    </SimpleSource>""" for fn, dx in [("a.tif", 0), ("b.tif", 64)])
        return (f'  <VRTRasterBand dataType="Byte" band="{b}">{srcs}\n'
                f"  </VRTRasterBand>")

    with open(os.path.join(vdir, "m.vrt"), "w") as fh:
        fh.write(
            f'<VRTDataset rasterXSize="128" rasterYSize="128">\n'
            f"  <SRS>EPSG:8353</SRS>\n"
            f'  <GeoTransform>{", ".join(str(v) for v in gt)}</GeoTransform>\n'
            + "\n".join(band(b) for b in (1, 2, 3)) + "\n</VRTDataset>"
        )
    vroot = os.path.join(work, "vrt_store")
    run_tiler(spark, vrt_blocks(spark, os.path.join(vdir, "m.vrt")), vroot,
              max_zoom=9, min_zoom=9, tile_size=32, fmt="png", resume=False)
    tiles = store.read_tiles(spark, vroot).where(
        "tile_data is not null").collect()
    to_merc, _ = C.lookup_crs("EPSG:8353")
    bx0, by0, bx1, by1 = C.densified_merc_bbox(
        to_merc, gt[0], gt[3] + 128 * gt[5], gt[0] + 128 * gt[1], gt[3])
    span = M.WORLD / (1 << 9)
    vrt_ok = len(tiles) > 0
    for r in tiles:
        x0 = r.x * span - M.ORIGIN
        if not (x0 < bx1 + span and x0 + span > bx0 - span):
            vrt_ok = False
            break

    print(json.dumps({"levels": {str(k): v for k, v in sorted(counts.items())},
                      "closure_ok": ok,
                      "vrt_krovak_tiles": len(tiles),
                      "vrt_krovak_ok": vrt_ok}))
    spark.stop()
    return 0 if (ok and vrt_ok) else 1


if __name__ == "__main__":
    raise SystemExit(main())
