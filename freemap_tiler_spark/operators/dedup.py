"""Deduplication operators for the web-text corpus.

First-class training-data-pipeline components (no reference counterpart;
the engine-side requirement comes from the 100 TB web-corpus use case):

- exact dedup          — md5 fingerprint groupBy
- word-shingle MinHash — signature + banded LSH candidate pairs + exact
                         Jaccard verify
- SimHash              — 32-bit sign-of-sum over token hashes, near-dup by
                         small Hamming distance
- n-gram Jaccard       — exact pairwise Jaccard on candidate pairs

Design constraint: every hash is built from ``md5`` (identical in Spark and
DuckDB) + modular arithmetic, so the DuckDB oracle can recompute signatures
bit-for-bit — dedup correctness is checked end-to-end, not rows-only.

Scale notes: exact dedup is one shuffle on a 60-bit key.  MinHash-LSH is
the standard shape: explode shingles (narrow), per-doc signature agg (one
shuffle on doc_id — map-side combined), explode bands (narrow), self-join
on band bucket (one shuffle on a well-distributed 60-bit bucket key; AQE
splits hot buckets), exact verify on the (small) candidate set.  No
all-pairs product ever materializes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from freemap_tiler_spark.functions.text import md5_fingerprint

# modulus/coefficients for the minhash family h_i(x) = (a_i * x + b_i) mod P
P = 2147483647  # 2^31 - 1 (Mersenne prime): products fit in int64
A = [1103515245, 1299709, 15485863, 32452843, 49979687, 67867967, 86028121, 104395301]
B = [12345, 7919, 104729, 1299721, 15485917, 32452867, 49979693, 67867979]


def token_hash(col) -> Column:
    """60-bit md5-based token hash (engine/oracle-identical)."""
    return md5_fingerprint(col)


def shingles(text_col, n: int = 3) -> Column:
    """Word n-gram shingles: array of space-joined n-token windows.

    Pure Column math: split -> transform over a sequence of offsets.
    Documents shorter than n tokens produce a single shingle of all tokens.
    """
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    m = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(m - n, F.lit(0)))
    return F.when(m >= n, F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)])
    )).otherwise(F.array(F.concat_ws(" ", toks)))


def minhash_signature(text_col, num_hashes: int = 8, shingle_n: int = 3) -> Column:
    """array<long> MinHash signature: per hash i, min over shingles of
    (A[i] * (md5_60(shingle) mod P) + B[i]) mod P."""
    sh = shingles(text_col, shingle_n)
    base = F.transform(sh, lambda s: token_hash(s) % P)
    sigs = [
        F.array_min(F.transform(base, lambda h: (F.lit(A[i]) * h + F.lit(B[i])) % P))
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative per identical text.
    Returns (fingerprint, keep_id, dup_count)."""
    return (
        df.select(md5_fingerprint(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing >=1 LSH band.

    bands must divide num_hashes; band bucket = md5 hash of the band's
    signature slice.  Self-join on (band_idx, bucket) — the classic
    LSH join; dedup pairs found in multiple bands.

    Hot-bucket guard: a degenerate bucket of k near-identical docs would
    emit k^2/2 pairs from ONE task (AQE splits the shuffle, not the
    quadratic pair count).  Buckets larger than ``max_bucket_size`` switch
    to O(k) pairs: a star around the bucket's min id PLUS a chain linking
    members consecutively in full-minhash-signature order.  The star keeps
    the bucket one connected component; the chain matters when a mixed
    over-size bucket (band collision, not true dups) meets a downstream
    Jaccard verify — star-only edges to a dissimilar representative could
    all fail the verify and disconnect members whose true near-dup pairs
    were never emitted, while signature-sorted neighbors are the most
    similar available pairs and survive.  (Documented approximation:
    other pairs of an over-size bucket are still not emitted.)
    """
    r = num_hashes // bands
    # ONE Arrow pass computes every signature + band bucket from the text,
    # then the (tiny: id + num_hashes + bands longs per doc) signature table
    # is localCheckpoint'd so the five downstream consumers (bucket sizing,
    # small-bucket self-join x2, star, chain re-attach) read materialized
    # rows instead of re-running the md5-per-shingle work — the former
    # Column-HOF pipeline evaluated interpreted (transform/array_min are
    # CodegenFallback) and re-derived the signatures once per consumer
    # (measured 2.3s per pass at bench scale, ~3 passes).  Tokenization
    # (lower + trim + whitespace split) stays in the JVM so its semantics
    # are bit-identical to the shingles() Column path and the DuckDB twin;
    # Python only rejoins token windows and md5s them — both engines hash
    # the same UTF-8 bytes, and the minhash permutation arithmetic
    # ((A*h + B) % P) stays in int64 range either way.
    import numpy as np
    import pandas as pd

    a_coef, b_coef = A[:num_hashes], B[:num_hashes]
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col).alias("_id"), toks.alias("_toks"))
    sig_schema = "_id long, " + ", ".join(
        [f"_h{i} long" for i in range(num_hashes)]
        + [f"_bk{b} long" for b in range(bands)]
    )

    def _signatures(batches):
        import hashlib

        aa = np.asarray(a_coef, dtype=np.int64)[None, :]
        bb = np.asarray(b_coef, dtype=np.int64)[None, :]
        for pdf in batches:
            n = len(pdf)
            H = np.empty((n, num_hashes), dtype=np.int64)
            BK = np.empty((n, bands), dtype=np.int64)
            for i, tk in enumerate(pdf["_toks"]):
                tk = list(tk)
                if len(tk) >= shingle_n:
                    sh = [" ".join(tk[j:j + shingle_n])
                          for j in range(len(tk) - shingle_n + 1)]
                else:
                    sh = [" ".join(tk)]
                hs = np.fromiter(
                    (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % P
                     for s in sh),
                    dtype=np.int64, count=len(sh),
                )[:, None]
                m = ((aa * hs + bb) % P).min(axis=0)
                H[i] = m
                for b in range(bands):
                    key = ",".join(str(m[b * r + j]) for j in range(r))
                    BK[i, b] = int(
                        hashlib.md5(key.encode("utf-8")).hexdigest()[:15], 16
                    )
            out = {"_id": pdf["_id"]}
            out.update({f"_h{i}": H[:, i] for i in range(num_hashes)})
            out.update({f"_bk{b}": BK[:, b] for b in range(bands)})
            yield pd.DataFrame(out)

    # eager measured faster than lazy on fresh plans (1.7s vs 2.4s at bench
    # scale): the lazy form re-enters the checkpoint machinery inside the
    # tagged job's tasks
    sig = base.mapInPandas(_signatures, sig_schema).localCheckpoint(eager=True)
    banded = sig.select(
        "_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"_bk{b}").alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    # bucket size + representative via ONE window pass (the former
    # groupBy + join back re-shuffled banded twice); checkpointed because
    # FOUR consumers walk it (small self-join x2, star, chain) and the
    # preserved (band, bucket) hash partitioning makes the self-join
    # exchange-free
    wsz = Window.partitionBy("band", "bucket")
    tagged = banded.select(
        "_id", "band", "bucket",
        F.count("*").over(wsz).alias("_n"),
        F.min("_id").over(wsz).alias("_rep"),
    ).localCheckpoint(eager=True)
    small = tagged.where(F.col("_n") <= max_bucket_size).select("_id", "band", "bucket")
    left = small.alias("l")
    right = small.alias("r")
    pairs_small = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
    )
    pairs_star = tagged.where(
        (F.col("_n") > max_bucket_size) & (F.col("_id") != F.col("_rep"))
    ).select(F.col("_rep").alias("id_a"), F.col("_id").alias("id_b"))
    # chain: consecutive members in full-signature order (see docstring)
    big = tagged.where(F.col("_n") > max_bucket_size).select("_id", "band", "bucket")
    big_sig = big.join(sig, "_id")
    wchain = Window.partitionBy("band", "bucket").orderBy(
        *[f"_h{i}" for i in range(num_hashes)], "_id"
    )
    chained = big_sig.withColumn("_prev", F.lag("_id").over(wchain)).where(
        F.col("_prev").isNotNull()
    )
    pairs_chain = chained.select(
        F.least("_prev", "_id").alias("id_a"), F.greatest("_prev", "_id").alias("id_b")
    )
    return pairs_small.unionByName(pairs_star).unionByName(pairs_chain).distinct()


def jaccard_verify(
    pairs: DataFrame,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs; keeps >= threshold.
    Returns (id_a, id_b, jaccard)."""
    sh = df.select(
        F.col(id_col).alias("_jid"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    withs = (
        pairs.join(sh.withColumnRenamed("_jid", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_jid", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        withs.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(text_col, bits: int = 32) -> Column:
    """SimHash: bit b of the result = sign of sum over tokens of
    (+1 if bit b of token_hash set else -1).  Pure Column math.

    ONE aggregate pass carrying an array-of-votes accumulator — the naive
    per-bit form (``bits`` independent F.aggregate calls) scans the token
    array 32 times and builds a 32x-deep codegen tree."""
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    hashes = F.transform(toks, token_hash)
    idx = F.sequence(F.lit(0), F.lit(bits - 1))
    acc0 = F.array_repeat(F.lit(0).cast("long"), bits)
    votes = F.aggregate(
        hashes,
        acc0,
        lambda acc, h: F.zip_with(
            acc, idx,
            lambda a, b: a + F.when(
                F.call_function("shiftright", h, b.cast("int")).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        ),
    )
    bit_vals = F.zip_with(
        votes, idx,
        lambda v, b: F.when(
            v >= 0, F.call_function("shiftleft", F.lit(1).cast("long"), b.cast("int"))
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bit_vals, F.lit(0).cast("long"), lambda a, x: a.bitwiseOR(x))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    block_bits: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Candidate blocking: split the simhash into (max_hamming+1) bit blocks —
    by pigeonhole, any pair within max_hamming shares at least one exact
    block; self-join per block then verify with bit_count(xor).  The
    block-join core is the shared :func:`hamming_pairs` (also used by the
    pHash image path); ``block_bits`` is retained for signature
    compatibility but the block width is ``bits // (max_hamming + 1)``.
    """
    if block_bits != 8:
        import warnings

        warnings.warn(
            "simhash_near_dups ignores block_bits; blocking width is "
            "bits // (max_hamming + 1)",
            DeprecationWarning, stacklevel=2,
        )
    sh = df.select(
        F.col(id_col), simhash(F.col(text_col), bits).alias("_simhash")
    )
    return hamming_pairs(sh, "_simhash", id_col=id_col, bits=bits,
                         max_hamming=max_hamming)


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Distributed connected components over an edge list — the cluster
    step of near-duplicate dedup (LSH/SimHash emit PAIRS; a training-data
    pipeline keeps ONE document per component).  Alternating Large-Star /
    Small-Star (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14): every round is two groupBy-min + equi-join passes
    over the edge set, no collect_list of neighborhoods, so hot nodes
    never materialize their adjacency in one task.  Converges in
    O(log^2 n) rounds (O(log n) in practice); per-round edge count is
    monotonically driven toward the final star graph.

    Returns (node, component) with component == the smallest node id in
    the node's component — deterministic across runs and cluster sizes.
    Nodes appearing only as isolated (no edges) are absent; callers union
    self-labels for their full id universe.

    100 TB shape: each round = 2 shuffles on node id; each round's edge
    set is localCheckpoint'd — iterative DataFrame plans otherwise nest
    the whole history and the Catalyst tree grows exponentially with
    rounds (plan-size OOM long before data size matters).  On a cluster
    where executor loss during the (short) iteration matters, set a
    reliable spark.checkpoint.dir and swap localCheckpoint for
    checkpoint.  Convergence is a deterministic (count, xor-of-hash)
    digest, never a driver collect of edges.
    """
    e = (
        edges.select(F.col(src).cast("long").alias("a"),
                     F.col(dst).cast("long").alias("b"))
        .where(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
    )
    cur = e.localCheckpoint(eager=True)
    def _digest(df):
        # bit_xor digest: order-insensitive, overflow-free under ANSI mode
        return df.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
        ).first()

    digest = _digest(cur)

    def _sym(df: DataFrame) -> DataFrame:
        return df.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
            df.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )

    def _canon(df: DataFrame) -> DataFrame:
        return (
            df.where(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
            .distinct()
        )

    for _ in range(max_iters):
        sym = _sym(cur)
        # Large-Star: every neighbor v > u links to m(u) = min(Γ(u) ∪ {u})
        m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        big = (
            sym.where(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        ls = _canon(big.unionAll(m.select(F.col("u"), F.col("m").alias("v"))))
        # Small-Star: u and its smaller neighbors link to their minimum
        sym2 = _sym(ls)
        sm = sym2.where(F.col("v") < F.col("u"))
        m2 = sm.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            sm.join(m2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionAll(m2.select(F.col("u"), F.col("m").alias("v")))
        )
        nxt = _canon(small).localCheckpoint(eager=True)
        d2 = _digest(nxt)
        cur = nxt
        if (d2["n"], d2["h"]) == (digest["n"], digest["h"]):
            break
        digest = d2
    # star graph: component of a node = its (unique) smaller endpoint;
    # component roots label themselves
    sym = _sym(cur)
    labels = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("component"))
    return labels.select(F.col("u").alias("node"), "component")


def window_hashes(text_col, n: int = 8) -> Column:
    """array<long> of 60-bit hashes of every n-token window (stride 1).

    Same tokenization (lower + whitespace split) and hash (md5-60) as the
    MinHash family, so the DuckDB oracle reproduces it bit-for-bit.
    Documents shorter than ``n`` tokens emit no windows (a span shorter
    than the match length cannot be a duplicate-substring hit).
    """
    toks = F.split(F.trim(F.lower(text_col)), r"\s+")
    m = F.size(toks)
    idx = F.sequence(F.lit(0), m - n)
    return F.when(
        m >= n,
        F.transform(idx, lambda i: token_hash(F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ))),
    ).otherwise(F.expr("CAST(array() AS array<bigint>)"))


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Substring-level exact dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): find every maximal
    token span whose n-token windows all re-occur elsewhere in the
    corpus (>= ``min_count`` total occurrences), per document.

    Returns (id_col, tok_start, tok_end, n_windows, max_occ): token
    half-open span [tok_start, tok_end), the number of duplicated
    windows merged into it, and the hottest window's corpus count.

    100 TB shape (suffix arrays don't distribute; rolling window hashes
    do): one shuffle on whash for the corpus-wide occurrence count (map-
    side combined; output is one row per *duplicated* hash — tiny vs the
    corpus), one hash equi-join back to window positions, one per-doc
    window for the gaps-and-islands span merge.  A boilerplate window
    shared by millions of docs is ONE row in `hot` (no skew on the agg);
    the join back is an equi-join AQE can skew-split.  No UDFs, no
    driver actions.
    """
    wh = df.select(
        F.col(id_col),
        F.posexplode(window_hashes(F.col(text_col), n)).alias("pos", "whash"),
    )
    hot = (wh.groupBy("whash").agg(F.count("*").alias("occ"))
             .where(F.col("occ") >= min_count))
    hits = wh.join(hot, "whash").select(id_col, "pos", "occ")
    # gaps-and-islands: windows at pos p, p' belong to one span when
    # p' - p <= n (they overlap or touch in token space)
    from pyspark.sql import Window
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = hits.withColumn(
        "_new",
        F.when(F.col("pos") - F.lag("pos").over(w) <= n, F.lit(0)).otherwise(F.lit(1)),
    ).withColumn(
        "span_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        isl.groupBy(id_col, "span_id")
        .agg(
            F.min("pos").cast("bigint").alias("tok_start"),
            (F.max("pos") + n).cast("bigint").alias("tok_end"),
            F.count("*").cast("bigint").alias("n_windows"),
            F.max("occ").cast("bigint").alias("max_occ"),
        )
        .drop("span_id")
    )


def scrub_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """ExactSubstr removal (Lee et al. 2022 §3.2): cut every maximal
    duplicated span from every document EXCEPT its canonical occurrence,
    so each duplicated substring survives exactly once corpus-wide.

    Canonical occurrence of a duplicated n-token window = the corpus-wide
    minimum (doc, pos) pair holding it; a span is kept iff it contains at
    least one canonical window, otherwise its token range is removed.
    Deterministic: ties cannot occur ((doc, pos) is unique).

    Returns (id_col, clean_text, n_tokens, n_removed): the document with
    scrubbed spans cut out (whitespace-normalized: tokens re-joined with
    single spaces), its surviving token count, and how many tokens were
    removed.  Original token casing is preserved (hashing lowercases,
    cutting operates on positions).

    100 TB shape: duplicate_spans' plan plus one map-side-combinable
    min(struct(doc, pos)) per duplicated hash and one equi-join of each
    doc against its own (tiny) scrub-interval list; the text rebuild is
    pure JVM higher-order-function Column work (transform/filter/exists/
    concat_ws) — no UDFs, no driver actions, no extra full-corpus
    shuffle beyond the per-doc interval join.
    """
    from pyspark.sql import Window

    wh = df.select(
        F.col(id_col),
        F.posexplode(window_hashes(F.col(text_col), n)).alias("pos", "whash"),
    )
    hot = (wh.groupBy("whash").agg(F.count("*").alias("occ"))
             .where(F.col("occ") >= min_count).select("whash"))
    hits = wh.join(hot, "whash")
    keeper = hits.groupBy("whash").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias("k")
    )
    flagged = hits.join(keeper, "whash").select(
        id_col, "pos",
        ((F.col(f"k.d") == F.col(id_col)) & (F.col("k.p") == F.col("pos")))
        .alias("kept"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = flagged.withColumn(
        "_new",
        F.when(F.col("pos") - F.lag("pos").over(w) <= n, F.lit(0)).otherwise(F.lit(1)),
    ).withColumn(
        "span_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    cut = (
        isl.groupBy(id_col, "span_id")
        .agg(F.min("pos").alias("s"), (F.max("pos") + n).alias("e"),
             F.max(F.col("kept").cast("int")).alias("keep"))
        .where(F.col("keep") == 0)
        .groupBy(id_col)
        .agg(F.collect_list(F.struct("s", "e")).alias("ivs"))
    )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    ivs = F.coalesce(F.col("ivs"), F.expr(
        "CAST(array() AS array<struct<s:int,e:int>>)"))
    indexed = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(ivs, lambda iv: (s["i"] >= iv["s"]) & (s["i"] < iv["e"])),
    )
    return (
        df.join(cut, id_col, "left")
        .select(
            id_col,
            F.concat_ws(" ", F.transform(indexed, lambda s: s["t"]))
            .alias("clean_text"),
            F.size(indexed).cast("bigint").alias("n_tokens"),
            (F.size(toks) - F.size(indexed)).cast("bigint").alias("n_removed"),
        )
    )


def contamination(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Test-set contamination flags (the GPT-3 appendix-C / PaLM recipe:
    n-gram collision against the evaluation set, canonically n=13): for
    every training document, the fraction of its n-token windows that
    occur anywhere in the test corpus.

    Returns (id_col, n_windows, n_hits, frac): total windows, windows
    colliding with the test set, and n_hits/n_windows (0.0 for docs
    shorter than n tokens — they cannot carry an n-gram collision).

    100 TB shape: the test side reduces to DISTINCT window hashes (tiny —
    eval sets are MBs against a TB-scale train corpus), the train side is
    one explode + one equi-semi-join on the hash (broadcast-able when the
    test set is small; AQE decides) + one per-doc count.  No UDFs, no
    driver actions, nothing quadratic.
    """
    tw = (
        test.select(F.explode(window_hashes(F.col(text_col), n)).alias("whash"))
        .distinct()
    )
    tot = train.select(
        F.col(id_col),
        F.size(window_hashes(F.col(text_col), n)).cast("bigint").alias("n_windows"),
    )
    hits = (
        train.select(
            F.col(id_col),
            F.explode(window_hashes(F.col(text_col), n)).alias("whash"),
        )
        .join(tw, "whash", "semi")
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )
    return (
        tot.join(hits, id_col, "left")
        .select(
            id_col,
            "n_windows",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
            F.when(F.col("n_windows") > 0,
                   F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_windows"))
            .otherwise(F.lit(0.0)).alias("frac"),
        )
    )


def hamming_pairs(
    df: DataFrame,
    hash_col: str,
    id_col: str = "doc_id",
    bits: int = 64,
    max_hamming: int = 3,
) -> DataFrame:
    """Generic Hamming-distance pair join over any integer hash column
    (the simhash_near_dups pigeonhole core, factored for reuse by e.g.
    perceptual image hashes): split the hash into (max_hamming+1) bit
    blocks — any pair within max_hamming shares one exact block — self-
    join per block, verify with bit_count(xor).  Returns
    (id_a, id_b, hamming) with id_a < id_b, distinct.
    """
    n_blocks = max_hamming + 1
    bb = bits // n_blocks
    sh = df.select(F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"))

    def _key(i):
        sr = F.shiftright("_h", i * bb)
        # a full-width block needs no mask ((1<<64)-1 overflows a long)
        return sr if bb >= 64 else sr.bitwiseAND(F.lit((1 << bb) - 1))

    blocked = sh.select(
        "_id", "_h",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("blk"), _key(i).alias("key"))
            for i in range(n_blocks)
        ])).alias("b"),
    ).select("_id", "_h", "b.blk", "b.key")
    l, r = blocked.alias("l"), blocked.alias("r")
    ham = F.bit_count(F.col("l._h").bitwiseXOR(F.col("r._h")))
    return (
        l.join(r, (F.col("l.blk") == F.col("r.blk")) & (F.col("l.key") == F.col("r.key"))
               & (F.col("l._id") < F.col("r._id")))
        .where(ham <= max_hamming)
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"),
                ham.alias("hamming"))
        .distinct()
    )
