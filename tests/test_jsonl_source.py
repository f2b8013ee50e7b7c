"""JSONL source: schema enforcement, quarantine routing, parquet stage."""

from __future__ import annotations

import json

from hfp_loader_spark.sources.jsonl_source import (
    CORRUPT_COL,
    read_jsonl,
    split_corrupt,
    to_parquet_stage,
)

GOOD = [
    {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s0",
     "n_chars": 10},
    {"doc_id": 2, "text": "gamma", "lang": "fi", "source": "s1",
     "n_chars": 5},
]
BAD_LINES = ['{"doc_id": 3, "text": "unterminated', "not json at all"]


def _write_fixture(tmp_path):
    p = tmp_path / "docs.jsonl"
    lines = [json.dumps(g) for g in GOOD] + BAD_LINES
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_jsonl_captures_corrupt_lines(spark, tmp_path):
    raw = read_jsonl(spark, _write_fixture(tmp_path))
    assert CORRUPT_COL in raw.columns
    rows = raw.collect()
    assert len(rows) == 4
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert sorted(r[CORRUPT_COL] for r in bad) == sorted(BAD_LINES)
    # malformed lines contribute NULL payload columns, never garbage
    assert all(r["doc_id"] is None for r in bad)


def test_split_corrupt_routes_both_sides(spark, tmp_path):
    clean, quarantine = split_corrupt(
        read_jsonl(spark, _write_fixture(tmp_path))
    )
    assert CORRUPT_COL not in clean.columns
    got = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert got == {1: "alpha beta", 2: "gamma"}
    assert quarantine.columns == ["raw_line"]
    assert quarantine.count() == 2


def test_to_parquet_stage_counts_and_quarantines(spark, tmp_path):
    src = _write_fixture(tmp_path)
    out = str(tmp_path / "stage")
    n_clean, n_bad = to_parquet_stage(spark, src, out)
    assert (n_clean, n_bad) == (2, 2)
    staged = spark.read.parquet(out + "/clean")
    assert staged.count() == 2
    assert set(staged.columns) == {
        "doc_id", "text", "lang", "source", "n_chars",
    }
    q = spark.read.parquet(out + "/_quarantine")
    assert sorted(r["raw_line"] for r in q.collect()) == sorted(BAD_LINES)


def test_clean_file_quarantines_nothing(spark, tmp_path):
    p = tmp_path / "clean.jsonl"
    p.write_text("\n".join(json.dumps(g) for g in GOOD) + "\n")
    out = str(tmp_path / "stage2")
    n_clean, n_bad = to_parquet_stage(spark, str(p), out)
    assert (n_clean, n_bad) == (2, 0)


def test_write_jsonl_roundtrip(spark, tmp_path):
    """write_jsonl → read_jsonl reproduces the frame (gzip parts,
    partitioned layout), and the quarantine column stays absent on a
    clean round-trip."""
    from pyspark.sql import functions as F

    from hfp_loader_spark.sources.jsonl_source import (
        DOCUMENTS_SCHEMA,
        read_jsonl,
        split_corrupt,
        write_jsonl,
    )

    rows = [
        (1, "alpha", "en", "s1", 5),
        (2, 'quote " and , comma', "de", "s1", 19),
        (3, None, "fr", "s2", 0),  # NULL text survives the round-trip
        (4, "café αβ", "en", "s2", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "export")
    write_jsonl(df, out, partition_by=["source"])
    back_raw = read_jsonl(spark, f"{out}/*/*.json.gz", DOCUMENTS_SCHEMA)
    clean, bad = split_corrupt(back_raw)
    assert bad.count() == 0
    # partition column rides the directory, not the JSON body
    got = sorted(
        (r["doc_id"], r["text"], r["lang"], r["n_chars"])
        for r in clean.collect()
    )
    want = sorted((i, t, lg, n) for i, t, lg, _, n in rows)
    assert got == want
