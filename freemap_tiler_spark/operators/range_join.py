"""Range (interval) join — the second custom-join class the brief names
alongside as-of.  Spark plans a raw `lo <= v AND v < hi` join as a
BroadcastNestedLoopJoin (quadratic); the scalable shape is BUCKETING:
fixed-width bins over the value domain, intervals EXPLODE to the bins
they overlap, points land in exactly one bin, and the join becomes a
hash equi-join on the bin id with the exact predicate as a post-filter.

Cost model: shuffle volume is |points| + Σ_i ceil(len_i / w) rows — the
classic trade where the bin width ``w`` balances interval replication
against post-filter selectivity.  Each (interval, point) pair meets in
EXACTLY one bin (the point's), so no dedup pass is needed."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    val: str,
    lo: str,
    hi: str,
    bucket_width: float,
) -> DataFrame:
    """Inner join of points to the intervals containing them
    (``lo <= val < hi``), as a bucketed hash equi-join.  Returns
    points-columns + intervals-columns rows, one per containment."""
    w = float(bucket_width)
    p = points.withColumn("_bkt", F.floor(F.col(val) / F.lit(w)))
    b0 = F.floor(F.col(lo) / F.lit(w))
    # hi's bin is included even though hi is exclusive — at worst one
    # empty extra bin per interval, removed by the exact post-filter
    # (cheaper and safer than epsilon games on the bin edge)
    b1 = F.floor(F.col(hi) / F.lit(w))
    # guard malformed hi < lo intervals: F.sequence with hi-bin < lo-bin
    # DESCENDS (default step -1) and would explode every bin between the
    # two bounds — correct via the post-filter, but a garbage interval
    # could blow up shuffle volume.  greatest() pins such rows to one
    # empty bin instead.
    iv = intervals.withColumn(
        "_bkt",
        F.explode(F.sequence(
            b0.cast("long"), F.greatest(b0.cast("long"), b1.cast("long"))
        )),
    )
    return (
        p.join(iv, "_bkt")
        .where((F.col(val) >= F.col(lo)) & (F.col(val) < F.col(hi)))
        .drop("_bkt")
    )
