"""Per-stage metrics table + live progress (A3/A4 parity).

The reference folds (count, total_duration) per metric over an mpsc channel
and prints every 10 s (src/time_track.rs:22-33,117-127).  Spark-native
equivalent:

- a driver-side stage timer that appends rows to a ``_metrics`` parquet
  table — (stage, seconds, rows, ts) — one row per pipeline stage;
- a LIVE progress reporter (A4): while a stage runs, a daemon thread polls
  ``sparkContext.statusTracker()`` every ``progress_interval`` seconds and
  emits pct / completed-vs-total tasks / elapsed to stderr (the reference's
  10-s ticker), recording the same rows to a ``_progress`` parquet table.
  A final 100% row is always emitted at stage end, so every stage has at
  least one progress row regardless of its duration.

The five reference metric names map as: select->resume_probe,
warp->rasterize, compose->compose, encode->encode, insert->write.
"""

from __future__ import annotations

import os
import sys
import threading
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


class MetricsSink:
    def __init__(
        self, spark: SparkSession, root: str, progress_interval: float = 10.0
    ):
        self.spark = spark
        self.path = os.path.join(root, "_metrics")
        self.progress_path = os.path.join(root, "_progress")
        self.progress_interval = progress_interval
        self._rows: list[tuple] = []
        self._progress: list[tuple] = []
        self._lock = threading.Lock()

    def _emit_progress(self, name: str, t0: float, final: bool = False) -> None:
        completed = total = 0
        try:
            st = self.spark.sparkContext.statusTracker()
            for sid in st.getActiveStageIds():
                info = st.getStageInfo(sid)
                if info is not None:
                    total += info.numTasks
                    completed += info.numCompletedTasks
        except Exception:
            pass  # progress must never kill the job
        pct = 100.0 if final else (100.0 * completed / total if total else 0.0)
        el = time.time() - t0
        print(
            f"[tiler] {name}: {pct:.0f}% tasks {completed}/{total} {el:.1f}s",
            file=sys.stderr,
        )
        with self._lock:
            self._progress.append((name, pct, completed, total, el, time.time()))

    @contextmanager
    def stage(self, name: str, rows: int | None = None):
        t0 = time.time()
        holder = {"rows": rows}
        stop = threading.Event()

        def _tick():
            while not stop.wait(self.progress_interval):
                self._emit_progress(name, t0)

        th = threading.Thread(target=_tick, daemon=True, name=f"progress-{name}")
        th.start()
        try:
            yield holder
        finally:
            stop.set()
            th.join(timeout=1.0)
            self._emit_progress(name, t0, final=True)
            self._rows.append(
                (name, time.time() - t0, holder.get("rows"), float(time.time()))
            )

    def flush(self) -> None:
        if self._rows:
            self.spark.createDataFrame(
                self._rows, "stage string, seconds double, rows long, ts double"
            ).write.mode("append").parquet(self.path)
            self._rows = []
        with self._lock:
            prog, self._progress = self._progress, []
        if prog:
            self.spark.createDataFrame(
                prog,
                "stage string, pct double, completed long, total long,"
                " seconds double, ts double",
            ).write.mode("append").parquet(self.progress_path)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def read_progress(self) -> DataFrame:
        return self.spark.read.parquet(self.progress_path)

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
