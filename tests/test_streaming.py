"""Streaming tier: batch/stream agreement and watermark semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hfp_loader_spark.plans.catalog import load_table
from hfp_loader_spark.streaming.jobs import (
    read_events_stream,
    run_available_now,
    tumbling_window_counts,
    watermark_dedup,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_stream_watermark_dedup_equals_batch_distinct(spark, sf_dir, events):
    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(watermark_dedup(stream, ["user_id", "event_type"]))
    got = {(r["user_id"], r["event_type"]) for r in out.collect()}
    expect = {
        (r["user_id"], r["event_type"])
        for r in events.select("user_id", "event_type").distinct().collect()
    }
    assert got == expect


def test_stream_tumbling_is_watermark_truncated_prefix_of_batch(
    spark, sf_dir, events
):
    """Append-mode emits exactly the windows closed by the final watermark:
    a subset of the batch result, equal on every emitted window, missing
    only windows near max(ts)."""
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in tumbling_window_counts(events).collect()
    }
    stream = read_events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    emitted = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in run_available_now(tumbling_window_counts(stream)).collect()
    }
    assert emitted  # something closed
    assert set(emitted) <= set(batch)
    for k, v in emitted.items():
        assert v == batch[k]
    # everything missing is at the tail (within watermark horizon of max ts)
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts.replace(minute=0, second=0, microsecond=0)
    for window_start, _etype in set(batch) - set(emitted):
        assert window_start >= horizon.strftime("%Y-%m-%d %H:%M:%S")


def test_stateful_counters_carry_state_across_batches(spark, sf_dir, events, tmp_path):
    """Split the archive into multiple files and rate-limit to one file
    per micro-batch: per-user totals must accumulate across batches (the
    final emission per user equals the batch aggregate)."""
    from hfp_loader_spark.streaming.stateful import stateful_user_counters

    src = tmp_path / "events_split"
    events.repartition(3).write.parquet(str(src))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = run_available_now(stateful_user_counters(stream))
    # append mode emits one row per touched user per batch → keep the max
    emissions = out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.count("*").alias("n_emissions"),
    )
    got = {r["user_id"]: r for r in emissions.collect()}
    expect = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert {u: r["n_events"] for u, r in got.items()} == expect
    # state genuinely crossed batches: users were touched in >1 batch
    assert any(r["n_emissions"] > 1 for r in got.values())


def test_transform_with_state_distinct_types(spark, sf_dir, events):
    """transformWithState ListState variant — skipped where the worker
    protobuf dependency is absent (this container)."""
    from hfp_loader_spark.streaming.stateful import (
        HAS_TRANSFORM_WITH_STATE,
        stateful_distinct_types,
    )
    from hfp_loader_spark.streaming.jobs import read_events_stream

    if not HAS_TRANSFORM_WITH_STATE:
        import pytest

        pytest.skip("transformWithStateInPandas needs protobuf on workers")

    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(stateful_distinct_types(stream))
    got = {
        r["user_id"]: r["n_distinct_types"]
        for r in out.groupBy("user_id")
        .agg(F.max("n_distinct_types").alias("n_distinct_types"))
        .collect()
    }
    expect = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("n"))
        .collect()
    }
    assert got == expect


def test_stream_left_outer_join_emits_nulls_only_below_watermark(
    spark, sf_dir, events
):
    """Left-outer stream-stream join: matched pairs equal the batch
    join; unmatched probes appear (NULL match) ONLY when the final
    watermark — min over both inputs, i.e. max(probe_ts) − delay since
    the probe side is filtered — passed their horizon end; later
    unmatched probes are withheld (their absence is not yet provable)."""
    import datetime

    from hfp_loader_spark.streaming.jobs import followup_join

    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(
        followup_join(stream, probe_mod=89, horizon="2 hours", how="left_outer")
    ).collect()

    probes = (
        events.where(F.col("event_id") % 89 == 0)
        .select("event_id", "user_id", "ts")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in events.select("user_id", "ts", "event_id").collect():
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_id"]))
    horizon = datetime.timedelta(hours=2)
    wm = max(p["ts"] for p in probes) - datetime.timedelta(minutes=10)

    expect_matched = set()
    expect_null = set()
    for p in probes:
        matches = [
            eid
            for (ts, eid) in by_user.get(p["user_id"], [])
            if p["ts"] < ts <= p["ts"] + horizon
        ]
        if matches:
            expect_matched |= {(p["event_id"], m) for m in matches}
        elif p["ts"] + horizon < wm:
            expect_null.add((p["event_id"], None))

    got_matched = {
        (r["probe_id"], r["matched_event_id"])
        for r in out
        if r["matched_event_id"] is not None
    }
    got_null = {
        (r["probe_id"], None) for r in out if r["matched_event_id"] is None
    }
    assert got_matched == expect_matched
    assert got_null == expect_null
    # the withheld tail exists in this fixture (otherwise the truncation
    # assertion is vacuous): at least one unmatched probe sits above wm
    all_null_probes = {
        p["event_id"]
        for p in probes
        if not any(
            p["ts"] < ts <= p["ts"] + horizon
            for (ts, _e) in by_user.get(p["user_id"], [])
        )
    }
    assert {pid for pid, _ in got_null} <= all_null_probes
    assert len(all_null_probes) > len(got_null)


def test_stream_ingest_cell_tags_equals_batch_recompute(spark, sf_dir, tmp_path):
    """Streaming O(delta) tagging: draining two embedding files through
    availableNow foreachBatch must leave a tag table equal row-for-row
    to one batch assignment of the union, each commit pinned to the
    model fingerprint."""
    import os

    from pyspark.sql import functions as F

    from hfp_loader_spark.operators.similarity import (
        append_cell_tags,
        load_cell_tags,
    )
    from hfp_loader_spark.plans.model_queries import _ivf_serve_model
    from hfp_loader_spark.streaming.jobs import stream_ingest_cell_tags

    cent_assign, _ = _ivf_serve_model(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # the file stream source reads FILES in a directory (no recursion):
    # stage each batch's single part file as landing/fN.parquet
    import glob
    import shutil

    src = tmp_path / "landing"
    src.mkdir()
    halves = (
        ("f1", emb.where(F.col("vec_id") < 250)),
        ("f2", emb.where(F.col("vec_id") >= 250)),
    )
    for name, frame in halves:
        stage = tmp_path / f"_stage_{name}"
        frame.coalesce(1).write.parquet(str(stage))
        part = glob.glob(os.path.join(str(stage), "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{name}.parquet"))
    src = str(src)

    tags_root = str(tmp_path / "tags")
    versions = stream_ingest_cell_tags(
        spark,
        src,
        tags_root,
        cent_assign,
        schema="vec_id long, embedding array<float>, label int",
    )
    assert sorted(versions.values()) == [1, 2]

    got = sorted(map(tuple, load_cell_tags(spark, tags_root).collect()))
    full_root = str(tmp_path / "tags_full")
    append_cell_tags(spark, emb, full_root, cent_assign, 1_000_000)
    full = sorted(map(tuple, load_cell_tags(spark, full_root).collect()))
    assert got == full and len(got) == 500


def test_stream_ingest_positions_equals_batch_recompute(
    spark, sf_dir, tmp_path
):
    """Streaming O(delta) position ingest (the geo twin of the tag
    ingest): draining two position files through availableNow
    foreachBatch must leave a position log equal row-for-row to one
    batch append of the union, each commit pinned to the grid
    generation; the drained log materializes into a servable lake."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from hfp_loader_spark.operators.geo import (
        append_positions,
        load_positions,
        materialize_position_lake_from_log,
        read_position_lake,
    )
    from hfp_loader_spark.plans.geo_queries import _traj
    from hfp_loader_spark.streaming.jobs import stream_ingest_positions

    tr = _traj(spark, sf_dir).select(
        "vehicle_id", "event_id", "t_us", "lat", "lng"
    )
    src = tmp_path / "landing"
    src.mkdir()
    halves = (
        ("f1", tr.where(F.col("vehicle_id") % 2 == 0)),
        ("f2", tr.where(F.col("vehicle_id") % 2 == 1)),
    )
    for name, frame in halves:
        stage = tmp_path / f"_stage_{name}"
        frame.coalesce(1).write.parquet(str(stage))
        part = glob.glob(os.path.join(str(stage), "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    log_root = str(tmp_path / "poslog")
    versions = stream_ingest_positions(spark, str(src), log_root)
    assert sorted(versions.values()) == [1, 2]

    key = ["event_id", "cell"]
    got = sorted(
        map(tuple, load_positions(spark, log_root).select(*key).collect())
    )
    full_root = str(tmp_path / "poslog_full")
    append_positions(spark, tr, full_root)
    full = sorted(
        map(tuple, load_positions(spark, full_root).select(*key).collect())
    )
    assert got == full and len(got) == tr.count()

    # a grid change mid-stream would refuse at the append layer
    import pytest

    with pytest.raises(ValueError, match="mixing grid generations"):
        append_positions(spark, tr.limit(1), log_root, cells_per_deg=50)

    # crash-replay guard: each commit stamped its stream_batch_id AND
    # the checkpoint generation's identity, so a replayed batch (driver
    # died between commit and checkpoint write) is recognized and
    # skipped, genuinely new batches are not, and a FOREIGN stream
    # (different checkpoint identity) fails loud instead of silently
    # dropping its data
    import os

    from hfp_loader_spark.streaming.jobs import _ingest_identity, _replayed
    from hfp_loader_spark.versioned import _read_manifest, latest_version

    ident = _ingest_identity(
        spark, os.path.join(log_root, "_stream_checkpoint")
    )
    head = latest_version(spark, log_root)
    meta = _read_manifest(spark, log_root, head).meta
    assert meta["stream_batch_id"] == max(versions)
    assert meta["stream_ingest_id"] == ident
    assert _replayed(spark, log_root, max(versions), ident) is True
    assert _replayed(spark, log_root, 0, ident) is True
    assert _replayed(spark, log_root, max(versions) + 1, ident) is False
    with pytest.raises(ValueError, match="cannot be compared"):
        _replayed(spark, log_root, 0, "someone-else")
    # the stamp riders did NOT join the generation pin: a same-grid
    # batch append still passes the pin check, and a rider may never
    # SHADOW a pin key
    append_positions(spark, tr.limit(0), log_root)
    with pytest.raises(ValueError, match="shadow the generation pin"):
        append_positions(
            spark, tr.limit(0), log_root, extra_meta={"cells_per_deg": 50}
        )

    # ADVICE r13: the batch append above left an UNSTAMPED head — a
    # head-only guard would now re-commit a crash-replayed batch and
    # duplicate its rows.  The guard must find the stream's high-water
    # stamp BEHIND the interleaved commit, and still refuse a foreign
    # checkpoint's numbering.
    assert _replayed(spark, log_root, max(versions), ident) is True
    assert _replayed(spark, log_root, max(versions) + 1, ident) is False
    with pytest.raises(ValueError, match="cannot be compared"):
        _replayed(spark, log_root, 0, "someone-else")
    # the drained log serves: materialize and read one cell back (the
    # pin-check append above committed an empty v3 on top of the two
    # streamed batches)
    lake_root = str(tmp_path / "lake")
    doc = materialize_position_lake_from_log(spark, log_root, lake_root)
    assert doc["log_version"] == latest_version(spark, log_root) == 3
    lake = read_position_lake(spark, lake_root, expect_cells_per_deg=20)
    assert lake.count() == len(got)

    # ... and an overwrite (rebuild) is a hard boundary: stamps behind
    # it describe rows that no longer exist, so a NEW stream's batch 0
    # is not a replay and a foreign stamp behind the rebuild no longer
    # poisons the table for it.
    from hfp_loader_spark.operators.geo import rebuild_positions

    rebuild_positions(spark, tr, log_root)
    assert _replayed(spark, log_root, 0, "a-fresh-stream") is False


def test_bench_stream_lifecycle_o_delta_and_serves(spark, sf_dir, tmp_path):
    """The measured BENCH lifecycle entry (bench.run_stream_lifecycle,
    VERDICT r13 #7) — replayed here step-by-step with the O(delta)
    plan caps the timer can't assert: every streamed micro-batch
    commits EXACTLY ONE new data dir holding ONLY its own rows (an
    append that rescans the log would widen the delta dir), compaction
    collapses the chain to one dir carrying the stream stamp, truncate
    leaves a single manifest, and the compacted head serves the same
    per-cell counts as a batch recompute."""
    import glob
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import bench
    from hfp_loader_spark.maintenance import compact_snapshot
    from hfp_loader_spark.operators.geo import (
        append_positions,
        load_positions,
    )
    from hfp_loader_spark.streaming.jobs import stream_ingest_positions
    from hfp_loader_spark.versioned import (
        _existing_versions,
        _read_manifest,
        truncate_history,
    )

    landing = bench._lifecycle_landing_dir(spark, sf_dir)
    n_files = len(glob.glob(os.path.join(landing, "*.parquet")))
    assert n_files == 4
    log_root = str(tmp_path / "poslog")
    versions = stream_ingest_positions(spark, landing, log_root)
    assert sorted(versions.values()) == [1, 2, 3, 4]

    # O(delta): version N references exactly N dirs, and each batch's
    # OWN dir holds only that batch's rows (sum of per-dir counts ==
    # total; a log rescan would double-write earlier rows)
    infos = {
        v: _read_manifest(spark, log_root, v)
        for v in _existing_versions(spark, log_root)
    }
    for v, info in infos.items():
        assert len(info.data_dirs) == v
    per_dir = [
        spark.read.parquet(f"{log_root}/{d}").count()
        for d in infos[4].data_dirs
    ]
    total = load_positions(spark, log_root).count()
    assert sum(per_dir) == total and all(n > 0 for n in per_dir)

    before = sorted(
        map(
            tuple,
            load_positions(spark, log_root)
            .groupBy("cell")
            .count()
            .collect(),
        )
    )

    v5 = compact_snapshot(spark, log_root, min_dirs=2)
    assert v5 == 5
    info5 = _read_manifest(spark, log_root, 5)
    assert len(info5.data_dirs) == 1
    # compaction carried the stream stamp — replay detection survives
    assert info5.meta.get("stream_batch_id") == max(versions)
    truncate_history(spark, log_root, keep_last=1)
    assert _existing_versions(spark, log_root) == [5]

    after = sorted(
        map(
            tuple,
            load_positions(spark, log_root)
            .groupBy("cell")
            .count()
            .collect(),
        )
    )
    assert after == before

    # ... and equals a one-shot batch recompute of the same source
    batch_root = str(tmp_path / "poslog_batch")
    src = spark.read.parquet(os.path.join(landing, "*.parquet"))
    append_positions(spark, src, batch_root)
    batch = sorted(
        map(
            tuple,
            load_positions(spark, batch_root)
            .groupBy("cell")
            .count()
            .collect(),
        )
    )
    assert after == batch


def test_compaction_carries_stream_stamp_past_unstamped_head(
    spark, sf_dir, tmp_path
):
    """Review r14: compact_snapshot copies the HEAD manifest's meta; if
    a plain batch append interleaved after the last stream commit, the
    head is UNSTAMPED and a naive copy would launder the stream's
    replay stamp into the compacted overwrite — which is the walk
    boundary for _replayed, re-opening the crash-replay duplicate
    window.  The compaction must carry the newest stamp found behind
    the head."""
    import glob
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import bench
    from hfp_loader_spark.maintenance import compact_snapshot
    from hfp_loader_spark.operators.geo import append_positions
    from hfp_loader_spark.streaming.jobs import (
        _ingest_identity,
        _replayed,
    )
    from hfp_loader_spark.streaming.jobs import stream_ingest_positions
    from hfp_loader_spark.versioned import _read_manifest

    landing = bench._lifecycle_landing_dir(spark, sf_dir)
    log_root = str(tmp_path / "poslog")
    versions = stream_ingest_positions(spark, landing, log_root)
    last_batch = max(versions)
    ident = _ingest_identity(
        spark, os.path.join(log_root, "_stream_checkpoint")
    )

    # interleaved batch append → unstamped head
    src = spark.read.parquet(os.path.join(landing, "*.parquet"))
    append_positions(spark, src.limit(0), log_root)

    v = compact_snapshot(spark, log_root, min_dirs=2)
    assert v is not None
    meta = _read_manifest(spark, log_root, v).meta
    assert meta.get("stream_batch_id") == last_batch
    assert meta.get("stream_ingest_id") == ident
    # the guard still recognizes a crash-replay after the compaction
    assert _replayed(spark, log_root, last_batch, ident) is True
    assert _replayed(spark, log_root, last_batch + 1, ident) is False
