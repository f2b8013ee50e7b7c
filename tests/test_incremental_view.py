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
