"""Streaming surface.

The reference is a single-shot batch job with NO streaming operators
(verified in SURVEY.md §2.9: its channels are intra-process pipelining, not
event-time streaming).  The engine therefore expresses the reference's only
stream-like semantic — resumability — as deterministic batch jobs + the
``plans.lineage`` commit table, which is the Spark-native equivalent and
what BASELINE.json's north_rule asks for ("resumable from checkpoint with
per-partition lineage").

For genuinely incremental ingest (new WARC drops appending to the corpus),
the same pipeline runs incrementally without Structured Streaming: the
resume anti-join (plans.lineage.resume_anti_join) computes only tiles whose
inputs changed, and the per-level writes are idempotent.  A
``readStream``-based wrapper would add watermark machinery the semantics
don't need; see streaming.incremental for the micro-batch driver.
"""

from freemap_tiler_spark.streaming.incremental import incremental_update

__all__ = ["incremental_update"]
