"""Sharded corpus sink: manifest correctness, resume no-op, tamper
detection, deterministic shard assignment."""

import pytest
from pyspark.sql import functions as F

from freemap_tiler_spark.plans import corpus_store as CS

pytestmark = pytest.mark.spark


@pytest.fixture()
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_write_manifest_and_verify(spark, docs, tmp_path):
    root = str(tmp_path / "corpus")
    man = CS.write_corpus(docs, root, n_shards=8)
    rows = man.collect()
    assert {r.shard for r in rows} <= set(range(8))
    assert sum(r.n_docs for r in rows) == docs.count()
    total_tok = docs.select(
        F.sum(F.expr("CASE WHEN TRIM(text)='' THEN 0 ELSE size(split(trim(text),'\\\\s+')) END"))
    ).first()[0]
    assert sum(r.n_tokens for r in rows) == total_tok
    assert CS.verify_corpus(spark, root)
    # stored data is the full corpus
    back = spark.read.parquet(f"{root}/shards")
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()


def test_write_resume_noop_and_mismatch(spark, docs, tmp_path):
    root = str(tmp_path / "corpus")
    m1 = {(r.shard, r.digest) for r in CS.write_corpus(docs, root, 4).collect()}
    # identical re-invoke: no-op, same manifest
    m2 = {(r.shard, r.digest) for r in CS.write_corpus(docs, root, 4).collect()}
    assert m1 == m2
    # different input against the same root: refuse
    with pytest.raises(ValueError):
        CS.write_corpus(docs.where("doc_id % 2 = 0"), root, 4)


def test_shard_assignment_deterministic(spark, docs):
    a = {(r.doc_id, r.shard) for r in docs.select(
        "doc_id", CS.shard_of("doc_id", 16).alias("shard")).collect()}
    b = {(r.doc_id, r.shard) for r in docs.repartition(13).select(
        "doc_id", CS.shard_of("doc_id", 16).alias("shard")).collect()}
    assert a == b
    # spread: no shard holds more than 3x the fair share on 500 docs
    from collections import Counter
    c = Counter(s for _, s in a)
    assert max(c.values()) <= 3 * (len(a) / 16)
