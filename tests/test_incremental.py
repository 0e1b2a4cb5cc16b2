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


def test_swap_commit_recovery_states(spark, tmp_path):
    """Every crash point of the two-rename swap leaves a readable level:
    live present, or complete staging, or the set-aside old version."""
    from freemap_tiler_spark.streaming.incremental import (
        _aside_paths, _recover_swap, _swap_commit,
    )

    final = str(tmp_path / "zoom=3")
    staging, old = _aside_paths(final)
    spark.range(5).write.parquet(final)
    spark.range(9).write.parquet(staging)
    # normal promote: staging becomes live, old cleaned
    _swap_commit(spark, final)
    assert spark.read.parquet(final).count() == 9
    import os
    assert not os.path.exists(staging) and not os.path.exists(old)
    # crash after final->old, before staging->final: live missing
    spark.range(11).write.parquet(staging)
    os.rename(final, old)
    _recover_swap(spark, final)
    assert spark.read.parquet(final).count() == 11  # staging was complete
    # crash with INCOMPLETE staging (no _SUCCESS): old is restored
    os.makedirs(staging)
    open(os.path.join(staging, "part-00000.parquet"), "wb").close()
    os.rename(final, old)
    _recover_swap(spark, final)
    assert spark.read.parquet(final).count() == 11
    assert not os.path.exists(staging)
    # staging/old leftovers next to a healthy live dir are swept
    spark.range(2).write.parquet(staging)
    _recover_swap(spark, final)
    assert not os.path.exists(staging)
    assert spark.read.parquet(final).count() == 11
