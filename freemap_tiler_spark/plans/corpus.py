"""End-to-end training-corpus cleaning pipeline.

Composes the engine's text operators into the standard web-corpus recipe
(C4 / Gopher / Lee et al. order):

    quality filter -> PII redaction -> exact dedup (keep-one)
    -> ExactSubstr span scrub -> post-scrub length filter
    [-> LM perplexity cut (CCNet)] [-> classifier + Pareto (GPT-3)]
    -> alpha-smoothed domain mixture sample

Every stage is the already-tested declarative operator; this module only
wires them and exposes per-stage row counters.  Nothing here collects:
``clean_corpus`` returns (clean DataFrame, counters DataFrame) and the
caller materializes either — so on a cluster the whole pipeline is one
logical plan Catalyst can prune through (e.g. a downstream ``select``
of doc_id only drops the rebuilt text from earlier stages).

100 TB shape: the corpus-wide shuffles are exactly those of the member
operators (one fingerprint agg, one window-hash agg + equi-join, one
per-domain count); stages communicate by column, not by materialized
intermediates, and the keep-decisions (dedup keep-one, mixture draw) are
deterministic so a resumed/re-run job reproduces the same corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from freemap_tiler_spark.functions import text as T
from freemap_tiler_spark.operators import dedup, mixing


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str | None = "lang",
    min_quality: float = 0.3,
    min_words: int = 5,
    span_n: int = 8,
    mix_alpha: float = 0.5,
    mix_target_rows: int | None = None,
    test_df: DataFrame | None = None,
    max_contamination: float = 0.05,
    contam_n: int = 13,
    persist: bool = False,
    max_log_ppl: float | None = None,
    lm_model: dict | None = None,
    quality_clf=None,
    clf_alpha: float = 9.0,
) -> tuple[DataFrame, DataFrame]:
    """Run the full cleaning recipe; return (clean_df, counters_df).

    ``persist=True`` caches the scrub-stage output (MEMORY_AND_DISK) so
    materializing the counters does not re-run the expensive span-scrub
    plan once per downstream stage; leave False when the corpus is too
    large to cache and you only materialize ``clean_df`` (one pass).
    The caller owns unpersisting (``clean_df.sparkSession.catalog.
    clearCache()`` or track the returned plan's persisted parent).

    clean_df columns: the input's, with ``text_col`` replaced by the
    scrubbed/rebuilt text and a ``quality`` column attached.
    counters_df: (stage, rows) — one row per pipeline stage, in order,
    counting the rows that SURVIVE that stage.  Stage order is fixed:
    input, quality, dedup, decontam (only when ``test_df`` is given:
    drop docs whose ``contam_n``-gram collision fraction against the
    evaluation corpus exceeds ``max_contamination``), scrub, length,
    ppl (only with ``max_log_ppl``: CCNet cut under ``lm_model`` — or a
    bigram LM trained on the length-stage survivors; docs with < 2
    alpha tokens drop here, the LM has no evidence for them),
    classifier (only with ``quality_clf``: GPT-3 score + deterministic
    Pareto(``clf_alpha``) admission), mix (absent when ``domain_col``
    is None).
    """
    stages: list[tuple[str, DataFrame]] = [("input", df)]

    # 1. quality + PII: keep docs above the C4/Gopher-style score, redact
    # PII in the survivors (redaction never drops rows)
    q = (
        df.withColumn("quality", T.quality_score(F.col(text_col)))
        .where(
            (F.col("quality") >= min_quality)
            & (T.ws_token_count(F.col(text_col)) >= min_words)
        )
        .withColumn(text_col, T.scrub_pii(F.col(text_col)))
    )
    stages.append(("quality", q))

    # 2. exact dedup: keep the lowest-id doc per identical text
    keep = dedup.exact_dedup(q, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    d = q.join(keep, id_col, "semi")
    stages.append(("dedup", d))

    # 2b. decontamination: remove training docs that leak the eval set
    if test_df is not None:
        dirty = (
            dedup.contamination(d, test_df, text_col, id_col, n=contam_n)
            .where(F.col("frac") > max_contamination)
            .select(id_col)
        )
        d = d.join(dirty, id_col, "anti")
        stages.append(("decontam", d))

    # 3. ExactSubstr scrub: cut duplicated spans (canonical occurrence
    # survives), swap in the rebuilt text
    scrubbed = dedup.scrub_spans(d, text_col, id_col, n=span_n).select(
        id_col, F.col("clean_text"), F.col("n_tokens")
    )
    s = (
        d.drop(text_col)
        .join(scrubbed, id_col)
        .withColumnRenamed("clean_text", text_col)
    )
    if persist:
        # the scrub output feeds the length/mix stages AND three counter
        # rows; without a persist each consumer re-runs the window-hash
        # explode + equi-join (the pipeline's most expensive plan)
        from pyspark import StorageLevel

        s = s.persist(StorageLevel.MEMORY_AND_DISK)
    stages.append(("scrub", s))

    # 4. post-scrub length floor: a doc hollowed out by span removal
    # (e.g. a full clone) no longer qualifies
    ln = s.where(F.col("n_tokens") >= min_words).drop("n_tokens")
    stages.append(("length", ln))

    out = ln
    # 5. optional model-based cuts (CCNet perplexity, GPT-3 classifier)
    if max_log_ppl is not None:
        from freemap_tiler_spark.operators import lm as lm_mod

        model = lm_model or lm_mod.train_bigram_lm(out, text_col, id_col)
        out = lm_mod.perplexity_filter(
            out, model, max_log_ppl, text_col, id_col)
        stages.append(("ppl", out))
    if quality_clf is not None:
        from freemap_tiler_spark.operators import quality_model as qm_mod

        out = qm_mod.quality_filter(
            out, quality_clf, clf_alpha, text_col, id_col)
        stages.append(("classifier", out))
    if domain_col is not None:
        out = mixing.domain_mix(
            out, domain_col, id_col, alpha=mix_alpha,
            target_rows=mix_target_rows,
        ).drop("n_d", "rate")
        stages.append(("mix", out))

    counters = None
    for i, (name, sdf) in enumerate(stages):
        row = sdf.agg(F.count("*").alias("rows")).select(
            F.lit(i).alias("ord"), F.lit(name).alias("stage"), "rows"
        )
        counters = row if counters is None else counters.unionByName(row)
    return out, counters.orderBy("ord").drop("ord")
