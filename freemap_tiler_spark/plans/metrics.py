"""Per-stage metrics table (A3 parity; north_rule 'lineage + metrics').

The reference folds (count, total_duration) per metric over an mpsc channel
and prints every 10 s (src/time_track.rs:22-33,117-127).  Spark-native
equivalent: a driver-side stage timer that appends rows to a ``_metrics``
parquet table — (stage, seconds, rows, ts) — one row per job stage, plus
executor-side row counts via Spark's own instrumentation (no custom
accumulator plumbing needed: counts come from the DataFrames themselves).

The five reference metric names map as: select->resume_probe,
warp->rasterize, compose->compose, encode->encode, insert->write.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


class MetricsSink:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.path = os.path.join(root, "_metrics")
        self._rows: list[tuple] = []

    @contextmanager
    def stage(self, name: str, rows: int | None = None):
        t0 = time.time()
        holder = {"rows": rows}
        try:
            yield holder
        finally:
            self._rows.append(
                (name, time.time() - t0, holder.get("rows"), float(time.time()))
            )

    def flush(self) -> None:
        if not self._rows:
            return
        df = self.spark.createDataFrame(
            self._rows, "stage string, seconds double, rows long, ts double"
        )
        df.write.mode("append").parquet(self.path)
        self._rows = []

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def summary(self) -> DataFrame:
        """The reference's per-metric fold: count + total + mean seconds."""
        from pyspark.sql import functions as F

        return (
            self.read()
            .groupBy("stage")
            .agg(
                F.count("*").alias("runs"),
                F.sum("seconds").alias("total_sec"),
                F.avg("seconds").alias("mean_sec"),
                F.sum("rows").alias("rows"),
            )
        )
