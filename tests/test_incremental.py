"""Incremental pyramid maintenance: dirty-subtree recompute equals full rebuild."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from freemap_tiler_spark.contract import _docs_geo
from freemap_tiler_spark.operators import pyramid as P
from freemap_tiler_spark.plans import lineage as L
from freemap_tiler_spark.streaming import incremental_update

pytestmark = pytest.mark.spark


def test_incremental_equals_full_rebuild(spark, sf_dir):
    g = _docs_geo(spark, sf_dir).cache()
    old = g.where("doc_id % 7 != 0")
    new = g.where("doc_id % 7 = 0")
    root = tempfile.mkdtemp(prefix="incr_")
    root_full = tempfile.mkdtemp(prefix="full_")
    try:
        # initial pyramid from the old corpus
        leaves_old = P.rasterize_level(P.assign_cells(old, "lon", "lat", 5), 32)
        L.write_pyramid(spark, leaves_old, root, 5, 0, 32)
        # incremental update with the new rows
        dirty = incremental_update(spark, g, new, root, 5, 0, 32)
        assert dirty[5] > 0
        got = {r.cell: bytes(r.payload) for r in L.read_pyramid(spark, root).collect()}
        # oracle: full rebuild from the complete corpus
        leaves_all = P.rasterize_level(P.assign_cells(g, "lon", "lat", 5), 32)
        L.write_pyramid(spark, leaves_all, root_full, 5, 0, 32)
        exp = {r.cell: bytes(r.payload) for r in L.read_pyramid(spark, root_full).collect()}
        assert got == exp
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(root_full, ignore_errors=True)
