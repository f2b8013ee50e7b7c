"""Small-file compaction: sizing plan, rewrite equivalence, layout."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from hfp_loader_spark.maintenance import compact_table, plan_compaction
from hfp_loader_spark.plans.catalog import load_table


def _parquet_files(path: str) -> list[str]:
    return glob.glob(f"{path}/**/*.parquet", recursive=True)


@pytest.fixture()
def fragmented(spark, sf_dir, tmp_path):
    """An oday-partitioned table fragmented by 12 tiny appends (the exact
    pattern ParquetSink.write produces across re-runs)."""
    path = str(tmp_path / "frag")
    src = (
        load_table(spark, sf_dir, "events")
        .withColumn("oday", F.to_date("ts"))
        .select("event_id", "user_id", "value", "oday")
    )
    for i in range(12):
        (
            src.where(F.col("event_id") % 12 == i)
            .repartition(2)
            .write.mode("append")
            .partitionBy("oday")
            .parquet(path)
        )
    return path, src.count()


def test_plan_counts_fragmentation(spark, fragmented):
    path, _ = fragmented
    plan = plan_compaction(spark, path, target_file_bytes=1024 * 1024)
    assert plan.n_files == len(_parquet_files(path)) > 12
    assert plan.small_files == plan.n_files  # every append file is tiny
    assert plan.worthwhile


def test_compact_preserves_data_and_reduces_files(spark, fragmented):
    path, n_rows = fragmented
    before = spark.read.parquet(path)
    before_sum = before.agg(F.sum("event_id")).collect()[0][0]
    n_days = before.select("oday").distinct().count()

    plan = compact_table(
        spark, path, partition_cols=["oday"], target_file_bytes=1024 * 1024
    )
    assert plan.worthwhile

    files = _parquet_files(path)
    # one file per partition value (12 appends collapsed)
    assert len(files) == n_days
    assert len(files) < plan.n_files

    after = spark.read.parquet(path)
    assert after.count() == n_rows
    assert after.agg(F.sum("event_id")).collect()[0][0] == before_sum
    # partition dirs survive → pruning still works
    assert any("oday=" in f for f in files)
    one_day = after.select("oday").first()["oday"]
    pruned = after.where(F.col("oday") == F.lit(one_day))
    plan_str = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan_str


def test_compact_noop_when_already_compact(spark, fragmented):
    path, _ = fragmented
    compact_table(
        spark, path, partition_cols=["oday"], target_file_bytes=1024 * 1024
    )
    n_before = len(_parquet_files(path))
    plan = compact_table(
        spark, path, partition_cols=["oday"], target_file_bytes=1024 * 1024
    )
    assert not plan.worthwhile  # second pass declines to rewrite
    assert len(_parquet_files(path)) == n_before


def test_compact_snapshot_collapses_tag_log_preserving_meta(
    spark, sf_dir, tmp_path
):
    """VERDICT r11 #6: a long O(delta) append chain on the versioned
    cell-tag table compacts to ONE data dir with load_cell_tags output
    unchanged, the manifest meta (model fingerprint / scale pin)
    carried over, time travel to pre-compaction versions intact, and a
    short chain left alone (min_dirs no-op)."""
    from hfp_loader_spark.maintenance import compact_snapshot
    from hfp_loader_spark.operators.similarity import (
        append_cell_tags,
        load_cell_tags,
    )
    from hfp_loader_spark.plans.model_queries import _ivf_serve_model
    from hfp_loader_spark.versioned import _read_manifest, latest_version

    cent_assign, _ = _ivf_serve_model(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    root = str(tmp_path / "tags")
    n_batches = 10
    for i in range(n_batches):
        append_cell_tags(
            spark,
            emb.where(F.col("vec_id") % n_batches == i),
            root,
            cent_assign,
            1_000_000,
        )
    before = sorted(map(tuple, load_cell_tags(spark, root).collect()))
    pre_head = latest_version(spark, root)
    assert len(_read_manifest(spark, root, pre_head).data_dirs) == n_batches

    v = compact_snapshot(spark, root, min_dirs=8)
    assert v == pre_head + 1
    info = _read_manifest(spark, root, v)
    assert len(info.data_dirs) == 1
    assert info.meta["compacted_from"] == pre_head
    assert info.meta["kind"] == "ivf_cell_tags"
    assert info.meta["model_fingerprint"] is not None
    after = sorted(map(tuple, load_cell_tags(spark, root).collect()))
    assert after == before
    # time travel to the pre-compaction head still reads the old chain
    assert (
        sorted(map(tuple, load_cell_tags(spark, root, pre_head).collect()))
        == before
    )
    # a further O(delta) append on the compacted table still pins the
    # model generation (the meta carry-over is load-bearing, not
    # cosmetic)
    append_cell_tags(
        spark, emb.limit(0), root, cent_assign, 1_000_000
    )
    # compacting the already-compact chain is a no-op
    assert compact_snapshot(spark, root, min_dirs=8) is None
    assert compact_snapshot(spark, str(tmp_path / "empty")) is None
