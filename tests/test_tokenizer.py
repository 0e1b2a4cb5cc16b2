"""BPE tokenizer (Sennrich et al. 2016): sample-trained merge table,
distributed Arrow application.  Anchors: the classic hand-computable
corpus, encode/train invariants, determinism across partitioning, and a
non-circular distributed == driver-side check."""

import pytest
from pyspark.sql import functions as F

from freemap_tiler_spark.operators import tokenizer as T

pytestmark = pytest.mark.spark


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_classic_corpus_merges(spark):
    """'low lower lowest' family: the first merges must build up 'low'
    (l+o, lo+w) — the textbook trace of the algorithm."""
    df = _df(spark, ["low low low lower lower lowest"])
    merges = T.bpe_train(df, n_merges=4, sample=10)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # after enough merges the whole word 'low' is one token
    toks = T.apply_merges("low", {p: i for i, p in enumerate(merges)})
    assert toks[0].startswith("low")


def test_encode_invariants(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the the the quick quick brown",
        "numbers 12345 and symbols !!! mixed-in",
        "",
    ]
    df = _df(spark, texts)
    merges = T.bpe_train(df, n_merges=50, sample=10)
    out = {r.doc_id: (list(r.tokens), r.n_tokens)
           for r in T.bpe_encode(df, merges).collect()}
    assert out[3] == ([], 0)
    for i, text in enumerate(texts):
        toks, n = out[i]
        assert n == len(toks)
        # lossless: stripping the end-of-word markers reassembles the
        # pre-token stream exactly
        joined = "".join(t.replace(T._EOW, "") for t in toks)
        assert joined == "".join(T.pretokenize(text))
    # zero merges = pure characters (+ EOW), and merges only shrink counts
    none = {r.doc_id: r.n_tokens for r in T.bpe_encode(df, []).collect()}
    for i, text in enumerate(texts):
        pre = T.pretokenize(text)
        assert none[i] == sum(len(w) + 1 for w in pre)
        assert out[i][1] <= none[i]


def test_distributed_matches_driver_and_partitioning(spark):
    """The mapInPandas encode must equal a pure-python application of the
    same merge table (non-circular: different code path), and be invariant
    to repartitioning."""
    base = [
        "web scale corpora repeat tokens tokens tokens",
        "deterministic byte pair encoding over web text",
        "the pipeline applies merges in rank order",
    ] * 7
    df = _df(spark, base)
    merges = T.bpe_train(df, n_merges=80, sample=30)
    ranks = {p: i for i, p in enumerate(merges)}
    got1 = {r.doc_id: list(r.tokens)
            for r in T.bpe_encode(df, merges).collect()}
    got2 = {r.doc_id: list(r.tokens)
            for r in T.bpe_encode(df.repartition(7), merges).collect()}
    assert got1 == got2
    for i, text in enumerate(base):
        want = [t for w in T.pretokenize(text)
                for t in T.apply_merges(w, ranks)]
        assert got1[i] == want, i


def test_train_determinism_and_vocab(spark):
    df = _df(spark, ["aa ab aa ab ba", "aa aa ab"])
    m1 = T.bpe_train(df, n_merges=10, sample=5)
    m2 = T.bpe_train(df, n_merges=10, sample=5)
    assert m1 == m2 and len(m1) >= 1
    vocab = T.vocab_from_merges(m1)
    assert len(vocab) == len(m1) and all(len(v) >= 2 for v in vocab)
