"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All query logic lives in ``freemap_tiler_spark.contract``; this module is
the thin driver-facing surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from freemap_tiler_spark import contract

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the geotagged corpus -> zoom 0-8 document-density
    tile pyramid (rasterize -> recursive 2x2 Lanczos compose -> tile keys
    + payload sizes)."""
    return contract.q_pyramid_build(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; rows-only queries intentionally omitted
    (approximate ANN, binary tile payloads, multimodal plumbing)."""
    return contract.oracle_sql()
