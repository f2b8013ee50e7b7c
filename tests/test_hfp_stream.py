"""Streaming HFP load: agreement with the batch job + stricter dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hfp_fixtures import write_fixture
from hfp_loader_spark.job import hfp_load
from hfp_loader_spark.schema import VEHICLE_POSITION
from hfp_loader_spark.sink import ParquetSink
from hfp_loader_spark.streaming.hfp_stream import hfp_stream_load

DATE = "2021-02-09"


@pytest.fixture(scope="module")
def fixture_root(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("hfp_stream")
    write_fixture(root, date=DATE)
    return root


def test_stream_load_matches_batch_minus_intra_dups(spark, fixture_root):
    """Streamed VP load = batch VP load with intra-day duplicates removed
    (dropDuplicates is the documented stricter-scoping extension)."""
    batch_sink = ParquetSink(str(fixture_root / "stage_batch"))
    hfp_load(spark, str(fixture_root), DATE, batch_sink, [VEHICLE_POSITION])

    stream_sink = ParquetSink(str(fixture_root / "stage_stream"))
    hfp_stream_load(
        spark, str(fixture_root), VEHICLE_POSITION, DATE, stream_sink
    )

    for table in ("vehicleposition", "unsignedevent"):
        batch = spark.read.parquet(batch_sink.table_path(table))
        stream = spark.read.parquet(stream_sink.table_path(table))
        b_uuids = {r["uuid"] for r in batch.select("uuid").collect()}
        s_uuids = {r["uuid"] for r in stream.select("uuid").collect()}
        assert s_uuids == b_uuids  # same distinct events
        assert stream.count() == len(s_uuids)  # strict: no dups at all
        assert batch.count() >= stream.count()


def test_stream_load_rerun_is_idempotent(spark, fixture_root, tmp_path):
    sink = ParquetSink(str(fixture_root / "stage_rerun"))
    hfp_stream_load(
        spark,
        str(fixture_root),
        VEHICLE_POSITION,
        DATE,
        sink,
        checkpoint_dir=str(tmp_path / "chk1"),
    )
    first = spark.read.parquet(sink.table_path("vehicleposition")).count()
    # FRESH checkpoint, same data → full re-read; the foreachBatch
    # anti-join against sink state must insert 0 (batch-job semantics)
    hfp_stream_load(
        spark,
        str(fixture_root),
        VEHICLE_POSITION,
        DATE,
        sink,
        checkpoint_dir=str(tmp_path / "chk2"),
    )
    again = spark.read.parquet(sink.table_path("vehicleposition")).count()
    assert again == first
