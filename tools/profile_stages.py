"""Per-stage profiling harness for optimization round 6 (guide §1).

Reproduces each bench.py stage in isolation inside ONE Spark session,
times sub-steps with noop sinks where useful, and dumps
``.explain('formatted')`` for the hot operators to plans/r06/.

Usage: python tools/profile_stages.py [sf_dir] [stage ...]
Stages: extract rasterize compose encode write pip knn dedup similarity
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from freemap_tiler_spark.functions import text as T
from freemap_tiler_spark.operators import dedup, knn, pip_join, pyramid, similarity
from freemap_tiler_spark.session import get_spark
from freemap_tiler_spark.sources.corpus import geotagged_corpus

MAX_ZOOM = 14
TILE = 64
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "plans", "r06")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label:45s} {dt:7.3f}s", flush=True)
    return out, dt


def dump_plan(df, name):
    os.makedirs(PLANS_DIR, exist_ok=True)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(PLANS_DIR, name), "w") as fh:
        fh.write(buf.getvalue())


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2:])
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_corpus = 100_000
    plan_tag = os.environ.get("PLAN_TAG", "before")

    spark = get_spark(app_name="profile-r06", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    # warm python workers as bench.py does
    spark.range(cpus * 8, numPartitions=cpus * 8).select(
        F.pandas_udf("long")(lambda s: s)("id").alias("x")
    ).agg(F.sum("x")).collect()

    sel = lambda s: not only or s in only

    corpus = geotagged_corpus(spark, n_corpus)
    pts = corpus.select(
        T.geo_lon("text").alias("lon"), T.geo_lat("text").alias("lat")
    ).dropna().persist()

    if sel("extract"):
        print("== extract", flush=True)
        spark.sparkContext.setJobDescription("extract: corpus gen + regexp")
        c2 = geotagged_corpus(spark, n_corpus)
        timed("corpus noop (gen only)", lambda: noop(c2))
        p2 = c2.select(T.geo_lon("text").alias("lon"), T.geo_lat("text").alias("lat")).dropna()
        timed("points noop (gen+regexp)", lambda: noop(p2))
        timed("points count (as bench: persist+count)", lambda: p2.persist().count())
        dump_plan(p2, f"extract_{plan_tag}.txt")
        p2.unpersist()

    n_pts = pts.count()
    print(f"n_pts={n_pts}", flush=True)

    assigned = pyramid.assign_cells(pts, "lon", "lat", MAX_ZOOM)
    leaves = None
    if sel("rasterize") or sel("compose") or sel("encode") or sel("write"):
        print("== rasterize", flush=True)
        spark.sparkContext.setJobDescription("rasterize")
        raster = pyramid.rasterize_level(assigned, TILE)
        timed("rasterize noop", lambda: noop(raster))
        timed("rasterize noop (2nd)", lambda: noop(raster))
        dump_plan(raster, f"rasterize_{plan_tag}.txt")
        leaves = pyramid.rasterize_level(assigned, TILE).persist(StorageLevel.MEMORY_AND_DISK)
        _, dt = timed("rasterize persist+count (as bench)", lambda: leaves.count())
        n_leaves = leaves.count()

    levels = None
    if sel("compose") or sel("encode") or sel("write"):
        print("== compose", flush=True)
        spark.sparkContext.setJobDescription("compose")
        rc = []
        levels = pyramid.compose_pyramid(
            leaves, MAX_ZOOM, 0, TILE, 2, levels_per_shuffle=5,
            round_cache=rc, approx_tiles=n_leaves,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _, dt = timed("compose persist+count (as bench)", lambda: levels.count())
        for df in rc:
            df.unpersist()
        dump_plan(levels, f"compose_{plan_tag}.txt")

    if sel("encode"):
        print("== encode", flush=True)
        spark.sparkContext.setJobDescription("encode")
        enc = pyramid.encode_level(levels, "png", tile_size=TILE, bands=2,
                                   png_filter="none")
        timed("encode count (as bench)", lambda: enc.count())
        timed("encode count (2nd)", lambda: enc.count())

    if sel("write"):
        print("== write", flush=True)
        import shutil
        import tempfile
        spark.sparkContext.setJobDescription("write")
        out_dir = tempfile.mkdtemp(prefix="prof_tiles_")

        def _w():
            pyramid.with_tile_keys(levels).drop("cell").repartitionByRange(
                cpus, "zoom", "x"
            ).write.mode("overwrite").partitionBy("zoom").parquet(out_dir)

        timed("write parquet (as bench)", _w)
        shutil.rmtree(out_dir, ignore_errors=True)

    if sel("pip"):
        print("== pip_join", flush=True)
        spark.sparkContext.setJobDescription("pip_join")
        import numpy as np

        quads = [
            ([17.0, 18.2, 18.0, 16.9], [48.0, 48.1, 49.2, 49.0]),
            ([19.0, 21.0, 21.0, 20.0, 20.0, 19.0], [48.0, 48.0, 48.5, 48.5, 49.5, 49.5]),
            ([16.9, 22.5, 22.5, 16.9], [47.8, 47.8, 48.2, 48.2]),
        ]
        polys = []
        for i, (xs, ys) in enumerate(quads):
            r = (np.asarray(xs, float), np.asarray(ys, float))
            polys.append({"poly_id": i + 1, "tag": f"p{i}", "rings": [r],
                          "bbox": (min(xs), min(ys), max(xs), max(ys))})
        pj = pip_join.pip_join_broadcast(pts, polys)
        timed("pip count", lambda: pj.count())
        timed("pip count (2nd)", lambda: pj.count())
        dump_plan(pj, f"pip_join_{plan_tag}.txt")

    if sel("knn"):
        print("== knn", flush=True)
        spark.sparkContext.setJobDescription("knn")
        every = max(n_pts // 1000, 1)
        probes = pts.where(F.xxhash64("lon", "lat") % every == 0).withColumn(
            "probe_id", F.xxhash64("lon", "lat")
        )
        points = pts.withColumn("point_id", F.monotonically_increasing_id())
        kj = knn.knn_join(probes, points, k=5, zoom=12)
        timed("knn count", lambda: kj.count())
        timed("knn count (2nd)", lambda: kj.count())
        timed("knn count (3rd)", lambda: kj.count())
        dump_plan(kj, f"knn_{plan_tag}.txt")

    if sel("dedup"):
        print("== dedup_lsh", flush=True)
        spark.sparkContext.setJobDescription("dedup_lsh")
        docs = corpus.select(F.col("url").alias("doc_id_s"), "text").withColumn(
            "doc_id", F.xxhash64("doc_id_s")
        )
        # substage: signature computation alone
        base = docs.select(
            F.col("doc_id").alias("_id"),
            F.transform(dedup.shingles(F.col("text"), 3),
                        lambda s: dedup.token_hash(s) % dedup.P).alias("_b"),
        )
        timed("shingle-hash base noop", lambda: noop(base))
        sig = base.select(
            "_id",
            *[F.array_min(F.transform("_b", (lambda i: lambda h: (F.lit(dedup.A[i]) * h + F.lit(dedup.B[i])) % dedup.P)(i))).alias(f"_h{i}")
              for i in range(8)],
        )
        timed("signatures noop", lambda: noop(sig))
        pairs = dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=4)
        timed("lsh pairs count (as bench)", lambda: pairs.count())
        timed("lsh pairs count (2nd)", lambda: pairs.count())
        dump_plan(pairs, f"dedup_lsh_{plan_tag}.txt")

    if sel("similarity"):
        print("== similarity_topk", flush=True)
        spark.sparkContext.setJobDescription("similarity")
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        n_emb = emb.count()
        dim = len(emb.first()["embedding"])
        print(f"  emb rows={n_emb} dim={dim}", flush=True)
        pr = emb.where(F.col("vec_id") % 20 == 0).select(
            F.col("vec_id").alias("probe_id"), "embedding"
        )
        st = similarity.brute_force_topk(pr, emb, k=10)
        timed("similarity count (as bench)", lambda: st.count())
        timed("similarity count (2nd)", lambda: st.count())
        dump_plan(st, f"similarity_{plan_tag}.txt")

    spark.stop()


if __name__ == "__main__":
    main()
