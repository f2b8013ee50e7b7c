"""Bench output framing contract (VERDICT r14 #1/#2/#8).

The driver records only the last ~2000 chars of bench.py's stdout and
parses the LAST line as the round's perf record.  r14's headline line
grew past that window and the round's entire perf story was recorded as
``parsed: null``.  These tests pin the contract:

* the final stdout line parses standalone, carries the headline metric,
  and stays under the byte budget even for a 45-query run;
* per-query detail survives on earlier stdout lines and in the committed
  ``BENCH_DETAIL.json`` artifact;
* ``prev_round_comparison`` walks past unparseable BENCH files (r14's
  ``parsed: null``) and can recover a compact-headline round's query map
  from the detail artifact — but never from a rehearsal detail that has
  no driver BENCH file yet.

No SparkSession needed: pure stdlib.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import bench


def _synthetic_out(n_queries: int = 45) -> dict:
    queries = {
        f"tier_{i % 9}_operator_with_a_long_descriptive_name_{i:03d}": round(
            0.317 * (i + 1) % 7.0, 3
        )
        for i in range(n_queries)
    }
    spread = {
        q: sorted(round(v * f, 3) for f in (1.0, 1.21, 1.44))
        for q, v in queries.items()
    }
    regressions = [
        {
            "query": q,
            "ratio": 1.31,
            "prev_sec": round(v / 1.31, 3),
            "now_spread_sec": spread[q],
            "within_spread_heuristic": True,
        }
        for q, v in list(queries.items())[:15]
    ]
    return {
        "metric": "headline_queries_wall",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "queries_spread": spread,
        "queries_build": {q: round(v * 0.3, 3) for q, v in queries.items()},
        "sf": 0.1,
        "calib_sec": 1.748,
        "calib_pre_sec": 1.748,
        "calib_post_sec": 1.901,
        "calib_arrow_sec": 0.784,
        "calib_ref_sec": 1.6,
        "value_normalized": 48.123,
        "prev_bench": "BENCH_r13.json",
        "queries_common_prev": 37,
        "raw_common_now_sec": 47.9,
        "raw_common_prev_sec": 52.5,
        "ratio_vs_prev_common": 0.912,
        "ratio_vs_prev_common_med": 0.969,
        "regressions_1p25x": regressions,
    }


class TestFinalLine:
    def test_final_line_parses_and_fits_budget(self):
        detail_lines, final_line = bench.render_output(_synthetic_out())
        assert len(final_line) <= bench.FINAL_LINE_MAX_BYTES
        assert len(final_line) < 1800  # driver tail-capture hard bound
        doc = json.loads(final_line)
        assert doc["metric"] == "headline_queries_wall"
        assert doc["value_normalized"] == 48.123
        assert doc["ratio_vs_prev_common"] == 0.912
        assert doc["calib_pre_sec"] == 1.748
        assert doc["calib_arrow_sec"] == 0.784
        assert doc["n_queries"] == 45
        assert doc["regressions_1p25x_count"] == 15
        # the bulky maps must NOT be on the final line
        assert "queries" not in doc
        assert "queries_spread" not in doc
        assert "queries_build" not in doc
        assert "regressions_1p25x" not in doc

    def test_arrow_attribution_ratio_and_clamp(self):
        """VERDICT r15 #3: the Python-lane probe now has a pinned
        reference; a plausible reading publishes the attribution ratio,
        an implausible one (>5x off) publishes a rejection note instead
        — never a bogus ratio — and the fields fit the final line."""
        ok = bench.arrow_attribution(bench.CALIB_ARROW_REF * 1.4)
        assert ok == {"calib_arrow_ratio": 1.4}
        low = bench.arrow_attribution(bench.CALIB_ARROW_REF / 6.0)
        high = bench.arrow_attribution(bench.CALIB_ARROW_REF * 6.0)
        zero = bench.arrow_attribution(0.0)
        for rej in (low, high, zero):
            assert "calib_arrow_ratio" not in rej
            assert "outside" in rej["calib_arrow_rejected"]
        out = _synthetic_out()
        out["calib_arrow_ref_sec"] = bench.CALIB_ARROW_REF
        out.update(bench.arrow_attribution(0.784))
        _, final_line = bench.render_output(out)
        assert len(final_line) <= bench.FINAL_LINE_MAX_BYTES
        doc = json.loads(final_line)
        assert doc["calib_arrow_ref_sec"] == bench.CALIB_ARROW_REF
        assert doc["calib_arrow_ratio"] == round(
            0.784 / bench.CALIB_ARROW_REF, 3
        )

    def test_detail_lines_carry_the_maps(self):
        out = _synthetic_out()
        detail_lines, _ = bench.render_output(out)
        parsed = [json.loads(line) for line in detail_lines]
        kinds = {p["bench_detail"] for p in parsed}
        assert kinds == {
            "queries",
            "queries_spread",
            "queries_build",
            "regressions_1p25x",
        }
        by_kind = {p["bench_detail"]: p for p in parsed}
        assert by_kind["queries"]["queries"] == out["queries"]
        assert (
            by_kind["regressions_1p25x"]["regressions_1p25x"]
            == out["regressions_1p25x"]
        )

    def test_final_line_sheds_keys_rather_than_outgrow_budget(self):
        out = _synthetic_out()
        out["prev_bench"] = "B" * 3000  # pathological future field
        _, final_line = bench.render_output(out)
        assert len(final_line) <= bench.FINAL_LINE_MAX_BYTES
        doc = json.loads(final_line)
        assert doc["metric"] == "headline_queries_wall"
        assert doc["value_normalized"] == 48.123

    def test_full_print_path_last_line_contract(self, capsys):
        """Render through the exact print sequence main() uses and
        assert the LAST stdout line parses standalone (VERDICT r14 #8)."""
        detail_lines, final_line = bench.render_output(_synthetic_out(40))
        for line in detail_lines:
            print(line)
        print(final_line)
        stdout = capsys.readouterr().out
        last = stdout.rstrip("\n").rsplit("\n", 1)[-1]
        assert len(last) < 1800
        assert json.loads(last)["metric"] == "headline_queries_wall"


def _write_bench(tmp_path, name: str, parsed) -> None:
    (tmp_path / name).write_text(
        json.dumps({"n": 0, "rc": 0, "tail": "...", "parsed": parsed})
    )


class TestPrevRoundWalkback:
    def test_skips_parsed_null(self, tmp_path):
        _write_bench(
            tmp_path,
            "BENCH_r13.json",
            {"queries": {"q1": 1.0, "q5": 2.0}},
        )
        _write_bench(tmp_path, "BENCH_r14.json", None)  # r14's real state
        q, name = bench._load_prev_queries(str(tmp_path))
        assert name == "BENCH_r13.json"
        assert q == {"q1": 1.0, "q5": 2.0}

    def test_skips_compact_headline_without_queries(self, tmp_path):
        _write_bench(tmp_path, "BENCH_r13.json", {"queries": {"q1": 1.0}})
        _write_bench(
            tmp_path,
            "BENCH_r15.json",
            {"metric": "headline_queries_wall", "value": 50.0},
        )
        q, name = bench._load_prev_queries(str(tmp_path))
        assert name == "BENCH_r13.json"

    def test_detail_fills_compact_round(self, tmp_path):
        """r16 view: BENCH_r15 is compact (no queries), but the detail
        artifact committed during r15 (stamped after_bench=r14) carries
        r15's map — the walkback must surface IT, not fall to r13."""
        _write_bench(tmp_path, "BENCH_r14.json", None)
        _write_bench(
            tmp_path,
            "BENCH_r15.json",
            {"metric": "headline_queries_wall", "value": 50.0},
        )
        (tmp_path / bench.DETAIL_FILE).write_text(
            json.dumps(
                {
                    "after_bench": "BENCH_r14.json",
                    "queries": {"q1": 0.9, "q5": 1.8},
                }
            )
        )
        q, name = bench._load_prev_queries(str(tmp_path))
        assert q == {"q1": 0.9, "q5": 1.8}
        assert name == f"BENCH_r15.json (via {bench.DETAIL_FILE})"

    def test_newer_parseable_bench_beats_older_detail(self, tmp_path):
        """Walk order: a newer BENCH file WITH queries wins over a
        detail artifact that filled an older compact round."""
        _write_bench(tmp_path, "BENCH_r14.json", None)
        _write_bench(
            tmp_path,
            "BENCH_r15.json",
            {"metric": "headline_queries_wall", "value": 50.0},
        )
        _write_bench(tmp_path, "BENCH_r16.json", {"queries": {"q1": 0.8}})
        (tmp_path / bench.DETAIL_FILE).write_text(
            json.dumps(
                {"after_bench": "BENCH_r14.json", "queries": {"q1": 0.9}}
            )
        )
        q, name = bench._load_prev_queries(str(tmp_path))
        assert name == "BENCH_r16.json"
        assert q == {"q1": 0.8}

    def test_rehearsal_detail_is_ignored(self, tmp_path):
        """A detail stamped with the CURRENT newest BENCH file belongs to
        a round with no driver BENCH yet (a local rehearsal, possibly a
        different host) — the driver must compare against the last real
        driver round instead."""
        _write_bench(tmp_path, "BENCH_r13.json", {"queries": {"q1": 1.0}})
        _write_bench(tmp_path, "BENCH_r14.json", None)
        (tmp_path / bench.DETAIL_FILE).write_text(
            json.dumps(
                {
                    "after_bench": "BENCH_r14.json",  # newest → pending round
                    "queries": {"q1": 0.001},
                }
            )
        )
        q, name = bench._load_prev_queries(str(tmp_path))
        assert name == "BENCH_r13.json"
        assert q == {"q1": 1.0}

    def test_comparison_fields_and_heuristic_name(self, tmp_path):
        _write_bench(
            tmp_path,
            "BENCH_r13.json",
            {"queries": {"q1": 1.0, "q5": 2.0, "gone": 9.9}},
        )
        _write_bench(tmp_path, "BENCH_r14.json", None)
        times = {"q1": 1.4, "q5": 1.9, "new_entry": 0.5}
        spread = {"q1": [1.4, 1.45, 1.5], "q5": [1.9, 2.0, 2.1]}
        cmp = bench.prev_round_comparison(times, str(tmp_path), spread)
        assert cmp["prev_bench"] == "BENCH_r13.json"
        assert cmp["queries_common_prev"] == 2
        assert cmp["raw_common_now_sec"] == 3.3
        assert cmp["raw_common_prev_sec"] == 3.0
        assert cmp["ratio_vs_prev_common"] == 1.1
        regs = cmp["regressions_1p25x"]
        assert [r["query"] for r in regs] == ["q1"]
        assert "within_spread_heuristic" in regs[0]
        assert "within_spread" not in regs[0]

    def test_no_usable_prev_returns_none(self, tmp_path):
        _write_bench(tmp_path, "BENCH_r14.json", None)
        assert bench.prev_round_comparison({"q1": 1.0}, str(tmp_path)) is None


class TestWriteDetail:
    def test_stamps_after_bench_and_roundtrips(self, tmp_path):
        _write_bench(tmp_path, "BENCH_r14.json", None)
        out = _synthetic_out(5)
        bench.write_detail(out, str(tmp_path))
        doc = json.loads((tmp_path / bench.DETAIL_FILE).read_text())
        assert doc["after_bench"] == "BENCH_r14.json"
        assert doc["queries"] == out["queries"]
        assert not (tmp_path / (bench.DETAIL_FILE + ".tmp")).exists()

    def test_no_prior_bench_stamps_null(self, tmp_path):
        bench.write_detail(_synthetic_out(2), str(tmp_path))
        doc = json.loads((tmp_path / bench.DETAIL_FILE).read_text())
        assert doc["after_bench"] is None

    def test_scaling_wrappers_invisible_to_stamp_and_walkback(
        self, tmp_path
    ):
        """VERDICT r16 #5 root cause: the driver's BENCH_r16_c8.json
        wrapper sorted after BENCH_r16.json, so the stamp and the
        walkback disagreed about the newest bench file.  Round files
        are strictly BENCH_r<digits>.json."""
        _write_bench(tmp_path, "BENCH_r15.json", {"queries": {"q1": 1.0}})
        _write_bench(tmp_path, "BENCH_r16.json", {"metric": "m"})
        _write_bench(tmp_path, "BENCH_r16_c8.json", {"metric": "m"})
        names = [
            os.path.basename(p)
            for p in bench._round_bench_files(str(tmp_path))
        ]
        assert names == ["BENCH_r15.json", "BENCH_r16.json"]
        bench.write_detail(_synthetic_out(2), str(tmp_path), cpus=32)
        doc = json.loads((tmp_path / bench.DETAIL_FILE).read_text())
        assert doc["after_bench"] == "BENCH_r16.json"  # not the _c8 file

    def test_scaling_run_never_clobbers_canonical(self, tmp_path):
        """The exact r16 failure: the 8-core scaling run must not
        overwrite the full-core run's canonical detail — it gets its
        own keyed file instead."""
        out32 = _synthetic_out(3)
        name32 = bench.write_detail(out32, str(tmp_path), cpus=32)
        assert name32 == "BENCH_DETAIL_c32.json"
        out8 = dict(_synthetic_out(3), value=99.9)
        name8 = bench.write_detail(out8, str(tmp_path), cpus=8)
        assert name8 == "BENCH_DETAIL_c8.json"
        canon = json.loads((tmp_path / bench.DETAIL_FILE).read_text())
        assert canon["cpus"] == 32 and canon["value"] == out32["value"]
        keyed8 = json.loads((tmp_path / name8).read_text())
        assert keyed8["cpus"] == 8 and keyed8["value"] == 99.9
        keyed32 = json.loads((tmp_path / name32).read_text())
        assert keyed32["value"] == out32["value"]

    def test_higher_core_run_takes_canonical(self, tmp_path):
        bench.write_detail(
            dict(_synthetic_out(2), value=8.0), str(tmp_path), cpus=8
        )
        bench.write_detail(
            dict(_synthetic_out(2), value=32.0), str(tmp_path), cpus=32
        )
        canon = json.loads((tmp_path / bench.DETAIL_FILE).read_text())
        assert canon["cpus"] == 32 and canon["value"] == 32.0

    def test_legacy_canonical_without_cpus_is_replaceable(self, tmp_path):
        (tmp_path / bench.DETAIL_FILE).write_text(
            json.dumps({"queries": {"q1": 1.0}})  # pre-r17 format
        )
        bench.write_detail(
            dict(_synthetic_out(2), value=7.0), str(tmp_path), cpus=8
        )
        canon = json.loads((tmp_path / bench.DETAIL_FILE).read_text())
        assert canon["cpus"] == 8 and canon["value"] == 7.0


def test_headline_entries_all_registered():
    """A renamed/deleted catalog entry must fail HERE, not as a KeyError
    inside the driver's bench run."""
    from bench import HEADLINE

    from hfp_loader_spark.plans.catalog import REGISTRY

    missing = [n for n in HEADLINE if n not in REGISTRY]
    assert not missing, missing
    assert len(set(HEADLINE)) == len(HEADLINE)  # no duplicate entries


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _q_names = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_0123456789", min_size=1, max_size=60
    )
    _times = st.floats(
        min_value=0.0, max_value=10_000.0, allow_nan=False, allow_infinity=False
    )

    @given(
        queries=st.dictionaries(_q_names, _times, min_size=0, max_size=80),
        prev_name=st.one_of(st.none(), _q_names),
        ratio=st.one_of(st.none(), _times),
    )
    @settings(max_examples=150, deadline=None)
    def test_final_line_contract_property(queries, prev_name, ratio):
        """For ANY query map size/naming, the final line parses
        standalone, stays under the driver capture bound, and keeps the
        headline metric — the r14 failure can't come back by growth."""
        out = {
            "metric": "headline_queries_wall",
            "value": round(sum(queries.values()), 3),
            "unit": "sec",
            "sf": 0.1,
            "queries": queries,
            "queries_spread": {q: [v, v, v] for q, v in queries.items()},
            "queries_build": dict(queries),
            "calib_sec": 1.9,
            "calib_pre_sec": 1.9,
            "calib_post_sec": 2.0,
            "calib_arrow_sec": 0.8,
            "calib_ref_sec": 1.6,
            "value_normalized": 1.0,
        }
        if prev_name is not None:
            out["prev_bench"] = f"BENCH_{prev_name}.json"
        if ratio is not None:
            out["ratio_vs_prev_common"] = round(ratio, 3)
        detail_lines, final_line = bench.render_output(out)
        assert len(final_line) <= bench.FINAL_LINE_MAX_BYTES
        doc = json.loads(final_line)
        assert doc["metric"] == "headline_queries_wall"
        assert doc["n_queries"] == len(queries)
        assert "queries" not in doc
        for line in detail_lines:
            json.loads(line)

except ImportError:  # pragma: no cover — hypothesis is baked in
    pass


class TestBenchReport:
    def test_classification(self):
        sys.path.insert(
            0,
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "tools",
            ),
        )
        import bench_report

        detail = {
            "calib_sec": 1.922,  # host 1.10x vs 1.748 ref
            "queries": {"a": 2.0, "b": 4.0, "c": 1.0, "d": 3.0},
            "queries_build": {"a": 0.1, "b": 3.5, "c": 0.2, "d": 0.3},
            "regressions_1p25x": [
                # inside 1.10 * 1.15 = 1.264 -> host-band
                {"query": "a", "ratio": 1.26, "within_spread_heuristic": False},
                # 87% build -> build-bound
                {"query": "b", "ratio": 1.5, "within_spread_heuristic": False},
                # fits own spread -> jitter
                {"query": "c", "ratio": 1.4, "within_spread_heuristic": True},
                # none of the above -> investigate
                {"query": "d", "ratio": 1.6, "within_spread_heuristic": False},
            ],
        }
        rows = bench_report.classify(detail, 1.748)
        kinds = {r["query"]: r["class"] for r in rows}
        assert kinds == {
            "a": "host-band",
            "b": "build-bound",
            "c": "jitter",
            "d": "investigate",
        }
