"""JDBC sink: gated integration test + ungated contract checks.

The reference's production sink is Postgres (utils/upsert.ts, getEvents.ts).
No database exists in this environment, so the round-trip test SKIPS
explicitly (VERDICT r1: gate it visibly, don't let it silently never run).
Set SPARK_GRAFT_PG_URL (jdbc:postgresql://…) to enable it.
"""

from __future__ import annotations

import os

import pytest

from hfp_loader_spark.sink import JdbcSink

PG_URL = os.environ.get("SPARK_GRAFT_PG_URL")


def test_jdbc_sink_defaults_match_reference():
    """batchsize / reWriteBatchedInserts / write concurrency map to
    EVENT_BATCH_SIZE (constants.ts:52) and INSERT_CONCURRENCY (deployed
    value 10, .env.example:14)."""
    sink = JdbcSink("jdbc:postgresql://example/db")
    assert sink.properties["batchsize"] == "1000"
    assert sink.properties["reWriteBatchedInserts"] == "true"
    assert sink.num_partitions == 10


def test_jdbc_existing_keys_query_shape():
    """The dedup scan must push the day predicate into the remote query
    (getEvents.ts:10-15) — verified on the constructed subquery string."""
    captured = {}

    class SpyReader:
        def jdbc(self, url, table, properties=None):
            captured["table"] = table
            return None

    class SpySpark:
        read = SpyReader()

    sink = JdbcSink("jdbc:postgresql://example/db")
    sink.existing_keys(SpySpark(), "vehicleposition", "2021-02-09")
    assert captured["table"] == (
        "(SELECT uuid FROM public.vehicleposition WHERE oday = DATE '2021-02-09') q"
    )


@pytest.mark.skipif(
    not PG_URL, reason="no Postgres available (set SPARK_GRAFT_PG_URL to run)"
)
def test_jdbc_round_trip(spark, tmp_path):  # pragma: no cover - gated
    from hfp_fixtures import write_fixture
    from hfp_loader_spark.job import hfp_load

    write_fixture(tmp_path, date="2021-02-09")
    sink = JdbcSink(PG_URL)
    report = hfp_load(spark, str(tmp_path), "2021-02-09", sink)
    assert report.total_inserted > 0
    rerun = hfp_load(spark, str(tmp_path), "2021-02-09", sink)
    assert rerun.total_inserted == 0
