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
