"""MBTiles SQLite export — the reference's user-facing artifact.

The engine's native store is zoom-partitioned parquet (plans/store.py, the
correct Spark-scale mapping per SURVEY §1.3); `.mbtiles` is an EXPORT step:
SQLite is a single-file single-writer format, so this necessarily runs
driver-side (sqlite3 is in the Python stdlib).  The DDL matches
src/schema.rs:11-40 exactly — tiles(zoom_level, tile_column, tile_row,
tile_data[, tile_alpha]) with the unique key index and the same five
metadata rows; tile_row is already TMS-flipped in the store
(src/tile_inserter.rs:54 parity).

Streamed via ``toLocalIterator`` over a zoom+morton-ordered frame: bounded
driver memory (one partition in flight), and the insert order matches the
store's z-order clustering so SQLite page locality mirrors tile adjacency.
"""

from __future__ import annotations

import os
import sqlite3

from pyspark.sql import SparkSession

from freemap_tiler_spark.plans.store import read_tiles


def export_mbtiles(
    spark: SparkSession,
    root: str,
    path: str,
    batch: int = 1024,
) -> str:
    """{root}/store parquet + {root}/metadata -> a consumable .mbtiles file.

    Format (jpeg => 5-column tiles table with tile_alpha, png => 4-column,
    src/schema.rs:20-33) and the metadata values come from the run's own
    metadata table (plans/lineage.write_metadata).  Known-empty marker rows
    (NULL tile_data) are skipped: MBTiles represents absence by absence.
    Opaque-elided alpha (None) is stored as an empty blob to satisfy the
    reference's NOT NULL column; its decoder treats empty as constant 255.
    """
    meta = {
        r["name"]: r["value"]
        for r in spark.read.parquet(os.path.join(root, "metadata")).collect()
    }
    fmt = meta.get("format", "png")
    jpeg = fmt != "png"
    if os.path.exists(path):
        os.remove(path)
    conn = sqlite3.connect(path)
    try:
        cur = conn.cursor()
        # src/schema.rs:40-44 pragmas are perf tuning for the writer; the
        # stdlib defaults are durable-correct, keep journaling simple
        cur.execute("PRAGMA synchronous = OFF")
        cur.execute("PRAGMA journal_mode = MEMORY")
        cur.execute(
            "CREATE TABLE metadata (name TEXT NOT NULL, value TEXT NOT NULL, UNIQUE(name))"
        )
        cur.execute(
            "CREATE TABLE tiles (zoom_level INTEGER NOT NULL,"
            " tile_column INTEGER NOT NULL, tile_row INTEGER NOT NULL,"
            " tile_data BLOB NOT NULL"
            + (", tile_alpha BLOB NOT NULL" if jpeg else "")
            + ")"
        )
        cur.execute(
            "CREATE UNIQUE INDEX idx_tiles ON tiles (zoom_level, tile_column, tile_row)"
        )
        cur.executemany(
            "INSERT INTO metadata (name, value) VALUES (?, ?)",
            [
                ("name", meta.get("name", "Tiles")),
                ("format", fmt),
                ("minzoom", meta.get("minzoom", "0")),
                ("maxzoom", meta.get("maxzoom", "0")),
                ("bounds", meta.get("bounds", "")),
            ],
        )
        tiles = (
            read_tiles(spark, root)
            .where("tile_data IS NOT NULL")
            .select("zoom", "x", "tms_y", "tile_data", "tile_alpha")
            .orderBy("zoom", "x", "tms_y")
        )
        ins = (
            "INSERT INTO tiles (zoom_level, tile_column, tile_row, tile_data"
            + (", tile_alpha) VALUES (?, ?, ?, ?, ?)" if jpeg else ") VALUES (?, ?, ?, ?)")
        )
        buf = []
        for r in tiles.toLocalIterator():
            row = (int(r["zoom"]), int(r["x"]), int(r["tms_y"]), r["tile_data"])
            if jpeg:
                row += (r["tile_alpha"] if r["tile_alpha"] is not None else b"",)
            buf.append(row)
            if len(buf) >= batch:
                cur.executemany(ins, buf)
                buf.clear()
        if buf:
            cur.executemany(ins, buf)
        conn.commit()
    finally:
        conn.close()
    return path
