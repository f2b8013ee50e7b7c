"""Incremental materialized view: refresh modes, merge algebra, and
equivalence with full recompute at every step."""

from __future__ import annotations

import pytest

from hfp_loader_spark.incremental import AggView, refresh_view
from hfp_loader_spark.versioned import commit_snapshot, read_snapshot

VIEW = AggView(
    keys=["k"],
    measures={
        "total": ("v", "sum"),
        "n": ("v", "count"),
        "lo": ("v", "min"),
        "hi": ("v", "max"),
    },
)


def _rows(spark, data):
    return spark.createDataFrame(data, ["k", "v"])


def _materialized(spark, view_root):
    return {
        r["k"]: (r["total"], r["n"], r["lo"], r["hi"])
        for r in read_snapshot(spark, view_root).collect()
    }


def _expected(spark, source_root):
    df = VIEW.aggregate(read_snapshot(spark, source_root))
    return {
        r["k"]: (r["total"], r["n"], r["lo"], r["hi"]) for r in df.collect()
    }


def test_initial_incremental_noop_and_full(spark, tmp_path):
    src, viw = str(tmp_path / "src"), str(tmp_path / "view")
    commit_snapshot(spark, _rows(spark, [(1, 10.0), (2, 5.0)]), src, "overwrite")

    r = refresh_view(spark, src, viw, VIEW)
    assert r["mode"] == "initial"
    assert _materialized(spark, viw) == _expected(spark, src)

    # append → incremental refresh scanning ONLY the new dir
    commit_snapshot(spark, _rows(spark, [(1, 2.0), (3, 7.0)]), src, "append")
    r = refresh_view(spark, src, viw, VIEW)
    assert r == {"mode": "incremental", "source_version": 2, "new_dirs": 1}
    assert _materialized(spark, viw) == _expected(spark, src)
    assert _materialized(spark, viw)[1] == (12.0, 2, 2.0, 10.0)

    # nothing new → noop
    assert refresh_view(spark, src, viw, VIEW)["mode"] == "noop"

    # overwrite rewrites history → full recompute fallback
    commit_snapshot(spark, _rows(spark, [(9, 1.0)]), src, "overwrite")
    r = refresh_view(spark, src, viw, VIEW)
    assert r["mode"] == "full"
    assert _materialized(spark, viw) == _expected(spark, src) == {
        9: (1.0, 1, 1.0, 1.0)
    }


def test_many_appends_stay_equivalent(spark, tmp_path):
    src, viw = str(tmp_path / "src"), str(tmp_path / "view")
    commit_snapshot(spark, _rows(spark, [(0, 1.0)]), src, "overwrite")
    refresh_view(spark, src, viw, VIEW)
    for i in range(1, 5):
        commit_snapshot(
            spark, _rows(spark, [(i % 2, float(i)), (i, -float(i))]), src, "append"
        )
        r = refresh_view(spark, src, viw, VIEW)
        assert r["mode"] == "incremental" and r["new_dirs"] == 1
        assert _materialized(spark, viw) == _expected(spark, src)


def test_view_readers_see_atomic_refreshes(spark, tmp_path):
    src, viw = str(tmp_path / "src"), str(tmp_path / "view")
    commit_snapshot(spark, _rows(spark, [(1, 1.0)]), src, "overwrite")
    refresh_view(spark, src, viw, VIEW)
    before = read_snapshot(spark, viw)  # resolved at view version 1
    commit_snapshot(spark, _rows(spark, [(1, 1.0)]), src, "append")
    refresh_view(spark, src, viw, VIEW)
    # the old reader's plan still scans the pre-refresh state
    assert {r["k"]: r["total"] for r in before.collect()} == {1: 1.0}
    assert _materialized(spark, viw)[1][0] == 2.0


def test_non_mergeable_measure_rejected():
    with pytest.raises(ValueError, match="not mergeable"):
        AggView(keys=["k"], measures={"a": ("v", "avg")})


def test_stream_to_versioned_lake_to_incremental_view(spark, sf_dir, tmp_path):
    """The lakehouse composition end-to-end: a stream lands micro-batches
    as atomic versioned commits (foreachBatch), each commit triggers an
    incremental view refresh, and the final materialized aggregate equals
    the batch groupBy over the whole source — streaming ingest, table
    format, and IVM working as one pipeline."""
    from pyspark.sql import functions as F

    from hfp_loader_spark.plans.catalog import load_table
    from hfp_loader_spark.streaming.jobs import read_events_stream

    lake, viw = str(tmp_path / "lake"), str(tmp_path / "view")
    view = AggView(
        keys=["event_type"],
        measures={"n": ("value", "count"), "total": ("value", "sum")},
    )
    modes = []

    def land(batch_df, _bid):
        commit_snapshot(
            spark,
            batch_df.select("event_type", "value"),
            lake,
            mode="append",
        )
        modes.append(refresh_view(spark, lake, viw, view)["mode"])

    q = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(land)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    q.awaitTermination(300)

    assert modes and modes[0] == "initial"
    assert all(m in ("initial", "incremental") for m in modes)  # never full

    got = {
        (r["event_type"]): (r["n"], round(r["total"], 4))
        for r in read_snapshot(spark, viw).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r["event_type"]: (r["n"], round(r["total"], 4))
        for r in ev.groupBy("event_type")
        .agg(F.count("value").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want


def test_idempotent_batch_commit_skips_replays(spark, tmp_path):
    from hfp_loader_spark.incremental import idempotent_batch_commit

    root = str(tmp_path / "lake")
    df1 = _rows(spark, [(1, 1.0)])
    assert idempotent_batch_commit(spark, df1, root, batch_id=0) == 1
    # crash-replay of batch 0 → skipped, table unchanged
    assert idempotent_batch_commit(spark, df1, root, batch_id=0) is None
    assert read_snapshot(spark, root).count() == 1
    # next batch lands normally
    assert idempotent_batch_commit(
        spark, _rows(spark, [(2, 2.0)]), root, batch_id=1
    ) == 2
    assert read_snapshot(spark, root).count() == 2
