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

    print(json.dumps({"levels": {str(k): v for k, v in sorted(counts.items())},
                      "closure_ok": ok}))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
