"""Sharded corpus sink: deterministic shards + manifest + resume.

The last mile of the training-data pipeline: the cleaned corpus lands as
`shard=K/` parquet directories with a manifest parquet recording each
shard's row count, token count, and an order-insensitive content digest.
The same two-phase commit discipline as the tile store (plans/lineage):
data writes to a `_tmp` directory and is renamed into place only after
the manifest row set is computed from WHAT WAS WRITTEN, so a killed job
leaves either a complete shard set + manifest or a `_tmp` to redo —
`write_corpus` re-invoked is a no-op when the manifest already matches.

100 TB shape: shard assignment is a pure column (id-hash modulo — no
sort, no skew: md5 spreads uniformly), the write is ONE
`partitionBy("shard")` job, and the manifest aggregation is one
map-side-combined groupBy over the written data.  Shards are
independently readable/verifiable — the unit of downstream parallelism
and of re-transfer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from freemap_tiler_spark.functions.text import md5_fingerprint
from freemap_tiler_spark.functions.text import ws_token_count
from freemap_tiler_spark.plans.fsutil import fs_delete, fs_exists, fs_rename


def shard_of(id_col, n_shards: int):
    """Deterministic shard id in [0, n_shards): md5-60(id ':shard') mod n."""
    h = md5_fingerprint(F.concat(F.col(id_col).cast("string"), F.lit(":shard")))
    return (h % n_shards).cast("int")


def _manifest(data: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-shard manifest rows: row count, token count, and an
    order-insensitive content digest (bit_xor over doc-level md5-60 of
    id|text — commutative, so stable under any row order/partitioning)."""
    doc_h = md5_fingerprint(
        F.concat(F.col(id_col).cast("string"), F.lit("|"), F.col(text_col))
    )
    return (
        data.select(
            "shard",
            F.col(id_col),
            ws_token_count(F.col(text_col)).alias("_nt"),
            doc_h.alias("_h"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("_nt").cast("bigint").alias("n_tokens"),
            F.expr("bit_xor(_h)").alias("digest"),
        )
    )


def write_corpus(
    df: DataFrame,
    root: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Write the corpus as n_shards deterministic shards + manifest.

    Returns the manifest DataFrame (shard, n_docs, n_tokens, digest).
    Re-invoking over an already-committed root verifies the manifest
    against the planned input and no-ops when they match (resume
    semantics); a mismatch raises so a half-baked store is never
    silently reused.
    """
    spark = df.sparkSession
    data_dir = os.path.join(root, "shards")
    man_path = os.path.join(root, "manifest")
    tmp_dir = os.path.join(root, "_tmp_shards")

    planned = df.withColumn("shard", shard_of(id_col, n_shards))
    if fs_exists(spark, man_path) and fs_exists(spark, data_dir):
        prev = spark.read.parquet(man_path)
        want = _manifest(planned, id_col, text_col)
        diff = prev.exceptAll(want).unionByName(want.exceptAll(prev))
        if diff.isEmpty():
            return prev  # committed and identical: resume no-op
        raise ValueError(
            f"corpus store at {root} exists but its manifest does not match "
            "the planned input; refusing to overwrite"
        )

    fs_delete(spark, tmp_dir)
    planned.write.mode("overwrite").partitionBy("shard").parquet(tmp_dir)
    # manifest from what was WRITTEN (not the plan): a torn write surfaces
    written = spark.read.parquet(tmp_dir)
    man = _manifest(written, id_col, text_col)
    man.write.mode("overwrite").parquet(man_path)
    fs_delete(spark, data_dir)
    fs_rename(spark, tmp_dir, data_dir)
    return spark.read.parquet(man_path)


def verify_corpus(
    spark: SparkSession,
    root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> bool:
    """Recompute the manifest from the stored shards and compare digests.
    True iff every shard's (n_docs, n_tokens, digest) matches."""
    data = spark.read.parquet(os.path.join(root, "shards"))
    man = spark.read.parquet(os.path.join(root, "manifest"))
    got = _manifest(data, id_col, text_col)
    return man.exceptAll(got).unionByName(got.exceptAll(man)).isEmpty()
