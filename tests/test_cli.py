"""CLI surface (__main__): parity with index.ts arg handling."""

from __future__ import annotations

from hfp_loader_spark.__main__ import build_parser, main, make_sink
from hfp_loader_spark.sink import JdbcSink, ParquetSink


def test_sink_spec_parsing():
    assert isinstance(make_sink("parquet:/tmp/x"), ParquetSink)
    assert make_sink("parquet:/tmp/x").root == "/tmp/x"
    assert isinstance(make_sink("jdbc:postgresql://h/db"), JdbcSink)
    assert isinstance(make_sink("/plain/dir"), ParquetSink)


def test_invalid_date_exits_nonzero(capsys):
    # index.ts:12-21: invalid date → error message + non-zero exit
    rc = main(["not-a-date", "--storage-root", "/nope"])
    assert rc == 2
    assert "Invalid date" in capsys.readouterr().err


def test_parser_defaults(monkeypatch):
    monkeypatch.setenv("HFP_STORAGE_ROOT", "/data/hfp")
    monkeypatch.setenv("HFP_SINK", "parquet:/data/stage")
    args = build_parser().parse_args(["2021-02-09"])
    assert args.storage_root == "/data/hfp"
    assert args.sink == "parquet:/data/stage"
    assert not args.streaming


def test_cli_query_list_and_unknown(capsys):
    from hfp_loader_spark.__main__ import main

    assert main(["query", "--list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary\toracle" in out
    assert main(["query", "no_such_query"]) == 2
    assert main(["query"]) == 2


def test_bench_calibration_clamp():
    """VERDICT r10 #8: normalization must refuse a >5×-off calibration
    probe (broken probe silently rescaling the total is the new failure
    mode) and fall back to the raw total, flagged."""
    from bench import CALIB_REF, normalize_total

    # sane probe: exact rescale
    v, note = normalize_total(100.0, CALIB_REF * 2)
    assert (v, note) == (50.0, None)
    # identity at the reference host
    assert normalize_total(46.26, CALIB_REF) == (46.26, None)
    # rejected: too slow, too fast, degenerate
    for bad in (CALIB_REF * 5.01, CALIB_REF / 5.01, 0.0, -1.0):
        v, note = normalize_total(100.0, bad)
        assert v == 100.0 and note and "normalization skipped" in note
    # boundary values are accepted
    assert normalize_total(100.0, CALIB_REF * 5.0)[1] is None
    assert normalize_total(100.0, CALIB_REF / 5.0)[1] is None
