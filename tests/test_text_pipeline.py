"""Behavioral tests for the r5 webtext-pipeline scalars: PII scrubbing,
URL canonicalization, repetition metrics (cross-engine parity is covered
by the `text_metrics` contract row; these pin the per-case semantics)."""

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from freemap_tiler_spark.functions import text as T  # noqa: E402

pytestmark = pytest.mark.spark


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_scrub_pii_all_categories(spark):
    s = ("write bob.smith+x@mail.example.org or call 555-123-4567, "
         "server at 10.20.30.40 end")
    got = _one(spark, T.scrub_pii(F.lit(s)))
    assert got == "write [EMAIL] or call [PHONE], server at [IP] end"


def test_scrub_pii_counts_and_no_pii_passthrough(spark):
    s = "a@b.io c@d.co 1.2.3.4 call 200-300-4000"
    row = spark.range(1).select(
        *[v.alias(k) for k, v in T.pii_counts(F.lit(s)).items()]).collect()[0]
    assert (row["n_email"], row["n_phone"], row["n_ip"]) == (2, 1, 1)
    clean = "no personal data here, just words and 42 numbers"
    assert _one(spark, T.scrub_pii(F.lit(clean))) == clean


def test_phone_not_eaten_by_ip_pattern(spark):
    # dotted quads redact as IP, hyphenated as phone — order must not
    # cross-contaminate (IP runs before phone in _PII_ORDER)
    s = "ip 1.2.3.4 tel 555-123-4567"
    assert _one(spark, T.scrub_pii(F.lit(s))) == "ip [IP] tel [PHONE]"


@pytest.mark.parametrize("raw,want", [
    ("https://WWW.Example.COM/Path/?q=1#frag", "example.com/path"),
    ("http://example.com", "example.com"),
    ("example.com/a/b/", "example.com/a/b"),
    ("  HTTPS://www.Ex.org/x?utm_source=t  ", "ex.org/x"),
    ("https://wwwx.org/", "wwwx.org"),  # only a literal 'www.' prefix strips
])
def test_canonical_url(spark, raw, want):
    assert _one(spark, T.canonical_url(F.lit(raw))) == want


def test_rep_metrics_planted_repetition(spark, sf_dir, tmp_path):
    # a doc that is one trigram repeated: dup fractions must be high
    import pandas as pd

    docs = pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["a b c a b c a b c", "u v w x y z"],
        "lang": ["en", "en"], "source": ["s", "s"],
        "n_chars": [17, 11],
    })
    p = str(tmp_path / "documents.parquet")
    docs.to_parquet(p)
    from freemap_tiler_spark.contract import q_rep_metrics
    out = {r["doc_id"]: r for r in
           q_rep_metrics(spark, str(tmp_path)).collect()}
    r0, r1 = out[0], out[1]
    assert r0["n_words"] == 9 and r0["n_distinct"] == 3
    assert r0["dup_word_frac"] == pytest.approx(1 - 3 / 9)
    assert r0["top_word_frac"] == pytest.approx(3 / 9)
    # trigrams of the 9-word doc: 7 total, 3 distinct ('a b c','b c a','c a b')
    assert r0["dup_tri_frac"] == pytest.approx(1 - 3 / 7)
    assert r1["dup_word_frac"] == 0.0 and r1["dup_tri_frac"] == 0.0
