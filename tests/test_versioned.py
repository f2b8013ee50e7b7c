"""Snapshot-versioned tables: atomic commit, isolation, time travel,
conflict handling, vacuum."""

from __future__ import annotations

import pytest

from hfp_loader_spark.versioned import (
    CommitConflict,
    commit_snapshot,
    latest_version,
    read_snapshot,
    table_history,
    vacuum,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"])


def test_overwrite_append_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v1 = commit_snapshot(spark, _df(spark, [(1, "a")]), root, mode="overwrite")
    v2 = commit_snapshot(spark, _df(spark, [(2, "b")]), root, mode="append")
    v3 = commit_snapshot(spark, _df(spark, [(9, "z")]), root, mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)

    def keys(version=None):
        return sorted(
            r["k"] for r in read_snapshot(spark, root, version).collect()
        )

    assert keys() == [9]            # latest = the overwrite
    assert keys(1) == [1]           # time travel
    assert keys(2) == [1, 2]        # append unioned with parent
    assert latest_version(spark, root) == 3
    ops = [s.op for s in table_history(spark, root)]
    assert ops == ["overwrite", "append", "overwrite"]


def test_append_is_o1_no_rewrite(spark, tmp_path):
    root = str(tmp_path / "tbl")
    commit_snapshot(spark, _df(spark, [(1, "a")]), root, mode="overwrite")
    commit_snapshot(spark, _df(spark, [(2, "b")]), root, mode="append")
    hist = table_history(spark, root)
    # v2 reuses v1's data dir untouched and adds exactly one new dir
    assert hist[1].data_dirs[: len(hist[0].data_dirs)] == hist[0].data_dirs
    assert len(hist[1].data_dirs) == len(hist[0].data_dirs) + 1


def test_reader_snapshot_isolation(spark, tmp_path):
    root = str(tmp_path / "tbl")
    commit_snapshot(spark, _df(spark, [(1, "a")]), root, mode="overwrite")
    snapshot = read_snapshot(spark, root)  # plan resolved at version 1
    commit_snapshot(spark, _df(spark, [(2, "b")]), root, mode="append")
    # the pre-commit reader still sees only version 1's rows
    assert sorted(r["k"] for r in snapshot.collect()) == [1]


def test_commit_conflict_retries_onto_next_version(spark, tmp_path):
    root = str(tmp_path / "tbl")
    commit_snapshot(spark, _df(spark, [(1, "a")]), root, mode="overwrite")
    # simulate a racing writer owning version 2: pre-create its manifest
    vdir = tmp_path / "tbl" / "_versions"
    (vdir / "v00000002.json").write_text(
        '{"version": 2, "op": "overwrite", "data_dirs": []}'
    )
    v = commit_snapshot(spark, _df(spark, [(3, "c")]), root, mode="overwrite")
    assert v == 3  # lost v2, retried, won v3


def test_commit_conflict_exhausts_retries(spark, tmp_path, monkeypatch):
    """A writer whose view of the head never advances (simulating a peer
    that wins every race) must give up with CommitConflict, not spin."""
    import hfp_loader_spark.versioned as V

    root = str(tmp_path / "tbl")
    commit_snapshot(spark, _df(spark, [(1, "a")]), root, mode="overwrite")
    (tmp_path / "tbl" / "_versions" / "v00000002.json").write_text(
        '{"version": 2, "op": "overwrite", "data_dirs": []}'
    )
    monkeypatch.setattr(V, "latest_version", lambda *_: 1)  # stale head
    with pytest.raises(CommitConflict):
        V.commit_snapshot(
            spark, _df(spark, [(9, "x")]), root, mode="append", max_retries=3
        )


def test_vacuum_reaps_only_orphans(spark, tmp_path):
    root = str(tmp_path / "tbl")
    commit_snapshot(spark, _df(spark, [(1, "a")]), root, mode="overwrite")
    commit_snapshot(spark, _df(spark, [(2, "b")]), root, mode="append")
    # orphan: a data dir no manifest references (failed commit debris)
    _df(spark, [(99, "junk")]).write.parquet(str(tmp_path / "tbl" / "d-orphan99"))
    removed = vacuum(spark, root)
    assert removed == ["d-orphan99"]
    # every committed version still reads
    assert sorted(r["k"] for r in read_snapshot(spark, root, 1).collect()) == [1]
    assert sorted(r["k"] for r in read_snapshot(spark, root, 2).collect()) == [1, 2]


def test_read_uninitialized_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, str(tmp_path / "nope"))


def test_hfp_load_through_versioned_sink(spark, tmp_path):
    """The full daily load works on the versioned sink: correct routing,
    idempotent re-run, one committed version per written table per run."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from hfp_fixtures import write_fixture

    from hfp_loader_spark.job import hfp_load
    from hfp_loader_spark.sink import VersionedParquetSink
    from hfp_loader_spark.versioned import table_history

    write_fixture(tmp_path, date="2021-02-09")
    sink = VersionedParquetSink(str(tmp_path / "stage"))

    r1 = hfp_load(spark, str(tmp_path), "2021-02-09", sink)
    assert r1.total_inserted > 0
    r2 = hfp_load(spark, str(tmp_path), "2021-02-09", sink)
    assert r2.total_inserted == 0  # anti-join against the latest snapshot

    hist = table_history(spark, str(tmp_path / "stage" / "vehicleposition"))
    # run 1 commits v1; run 2 writes nothing new (0-row writes still
    # commit a version — the load is append-per-run by design)
    assert len(hist) >= 1 and hist[0].op == "append"


def test_schema_evolution_added_column_reads_back_null(spark, tmp_path):
    """A column added by a later append must read back (merge_schema=True)
    with NULLs for rows committed before it existed; time travel to the
    pre-evolution version must NOT show the new column."""
    from hfp_loader_spark.versioned import commit_snapshot, read_snapshot

    root = str(tmp_path / "evolving")
    v1 = commit_snapshot(
        spark,
        spark.createDataFrame([(1, "a")], "id long, val string"),
        root,
        mode="overwrite",
    )
    v2 = commit_snapshot(
        spark,
        spark.createDataFrame(
            [(2, "b", 0.5)], "id long, val string, score double"
        ),
        root,
        mode="append",
    )
    assert (v1, v2) == (1, 2)
    merged = read_snapshot(spark, root, merge_schema=True)
    assert set(merged.columns) == {"id", "val", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows == {1: None, 2: 0.5}
    # time travel to v1: the old snapshot never saw the new column
    old = read_snapshot(spark, root, version=1, merge_schema=True)
    assert set(old.columns) == {"id", "val"}


def test_snapshot_diff_classifies_and_roundtrips(spark, tmp_path):
    """A→D→U classification between two committed versions, and the
    inverse property: applying the diff as a changelog onto v_from
    reproduces v_to exactly."""
    from pyspark.sql import functions as F

    from hfp_loader_spark.operators.relational import apply_changelog
    from hfp_loader_spark.versioned import (
        commit_snapshot,
        read_snapshot,
        snapshot_diff,
    )

    root = str(tmp_path / "diff_table")
    v1_rows = [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    v2_rows = [(2, "b", 20), (3, "cc", 31), (4, "d", 40)]  # del 1, upd 3, add 4
    schema = "id int, name string, val int"
    v1 = commit_snapshot(
        spark, spark.createDataFrame(v1_rows, schema), root, mode="overwrite"
    )
    v2 = commit_snapshot(
        spark, spark.createDataFrame(v2_rows, schema), root, mode="overwrite"
    )

    diff = snapshot_diff(spark, root, ["id"], v_from=v1, v_to=v2)
    got = {r["id"]: (r["op"], r["name"], r["val"]) for r in diff.collect()}
    assert got == {
        1: ("D", "a", 10),
        3: ("U", "cc", 31),
        4: ("A", "d", 40),
    }

    # inverse: diff applied as a changelog onto v1 == v2
    changes = diff.select(
        "id", "name", "val",
        F.col("op").alias("op"), F.lit(1).alias("seq"),
    )
    replayed = apply_changelog(
        read_snapshot(spark, root, version=v1), changes, ["id"]
    )
    assert sorted(map(tuple, replayed.collect())) == sorted(v2_rows)

    # unchanged versions diff to zero rows
    assert snapshot_diff(spark, root, ["id"], v_from=v2, v_to=v2).count() == 0


def test_truncate_history_reclaims_storage_keeping_head(spark, tmp_path):
    """truncate_history: drops old manifests oldest-first, vacuums the
    dirs only they referenced, keeps the newest keep_last versions
    readable and identical — the storage-reclaim valve paired with
    compact_snapshot (r12)."""
    import glob

    import pytest

    from hfp_loader_spark.versioned import (
        commit_snapshot,
        latest_version,
        read_snapshot,
        truncate_history,
    )

    root = str(tmp_path / "t")
    for i in range(5):
        commit_snapshot(
            spark,
            spark.range(i * 10, i * 10 + 10).withColumnRenamed("id", "k"),
            root,
            mode="append",
        )
    head_rows = sorted(r["k"] for r in read_snapshot(spark, root).collect())
    assert len(head_rows) == 50

    dropped = truncate_history(spark, root, keep_last=2)
    assert dropped == [1, 2, 3]
    # head + one time-travel version survive, bit-identical
    assert latest_version(spark, root) == 5
    assert sorted(
        r["k"] for r in read_snapshot(spark, root).collect()
    ) == head_rows
    assert len(read_snapshot(spark, root, version=4).collect()) == 40
    # append-chain data dirs are all still referenced by v4/v5 (appends
    # share parents), so nothing was reaped yet — now overwrite, then
    # truncate to 1: every old dir becomes orphaned and is deleted
    commit_snapshot(
        spark,
        spark.range(3).withColumnRenamed("id", "k"),
        root,
        mode="overwrite",
    )
    truncate_history(spark, root, keep_last=1)
    assert sorted(
        r["k"] for r in read_snapshot(spark, root).collect()
    ) == [0, 1, 2]
    assert len(glob.glob(f"{root}/d-*")) == 1, "orphaned dirs not reaped"
    with pytest.raises(Exception):
        read_snapshot(spark, root, version=5)
    with pytest.raises(ValueError, match="keep_last"):
        truncate_history(spark, root, keep_last=0)
    assert truncate_history(spark, str(tmp_path / "none")) == []


def test_stamped_snapshot_serves_builds_and_invalidates(spark, tmp_path):
    """stamped_snapshot (r16, VERDICT r15 #2): first call builds and
    commits under the stamp meta; a second call with the SAME stamp
    serves the committed parquet WITHOUT invoking build(); a changed
    stamp (regenerated corpus / new definition) rebuilds.  This is the
    serve-or-build contract the persisted dup-edge/CC-label/serve-model
    artifacts rely on for their warm-process fast path."""
    from hfp_loader_spark.versioned import stamped_snapshot

    root = str(tmp_path / "idx")
    calls = []

    def build_v(tag):
        def build():
            calls.append(tag)
            return _df(spark, [(1, tag)])

        return build

    out1 = stamped_snapshot(spark, root, {"stamp": "s1"}, build_v("a"))
    assert [r["v"] for r in out1.collect()] == ["a"]
    out2 = stamped_snapshot(spark, root, {"stamp": "s1"}, build_v("b"))
    assert [r["v"] for r in out2.collect()] == ["a"]  # served, not rebuilt
    assert calls == ["a"]
    out3 = stamped_snapshot(spark, root, {"stamp": "s2"}, build_v("c"))
    assert [r["v"] for r in out3.collect()] == ["c"]  # stale stamp rebuilt
    assert calls == ["a", "c"]
    assert latest_version(spark, root) == 2
    # cache semantics: superseded generations truncate to keep_last=2 —
    # a third generation drops version 1's manifest (and its orphaned
    # data), the previous head survives one generation
    out4 = stamped_snapshot(spark, root, {"stamp": "s3"}, build_v("d"))
    assert [r["v"] for r in out4.collect()] == ["d"]
    assert latest_version(spark, root) == 3
    ops = {s.version for s in table_history(spark, root)}
    assert ops == {2, 3}


def test_vacuum_grace_spares_recent_unreferenced_dirs(spark, tmp_path):
    """The in-flight-commit race (r16 review): commit_snapshot writes
    its data dir BEFORE its manifest, so a vacuum with a grace period
    must SPARE a fresh unreferenced dir (possibly a racing builder's)
    and an ungraced vacuum may reap it.  The automatic cache truncation
    stamped_snapshot runs passes a 10-minute grace for exactly this."""
    import os

    from hfp_loader_spark.versioned import vacuum

    root = str(tmp_path / "t")
    commit_snapshot(spark, _df(spark, [(1, "a")]), root)
    orphan = os.path.join(root, "d-orphan-fresh")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "w") as fh:
        fh.write("x")

    assert vacuum(spark, root, min_age_seconds=600) == []  # spared
    assert os.path.isdir(orphan)
    assert vacuum(spark, root) == ["d-orphan-fresh"]  # ungraced reap
    assert not os.path.isdir(orphan)
    # the committed version is untouched either way
    assert [r["k"] for r in read_snapshot(spark, root).collect()] == [1]
