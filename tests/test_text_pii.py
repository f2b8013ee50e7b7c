"""PII scrub + repetition metrics: hand-checked semantics and cross-engine
regex-dialect parity on adversarial literals (the catalog query only sees
the synthetic corpus's planted PII; these cover the tricky shapes)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hfp_loader_spark.operators.text import (
    PII_PATTERNS,
    pii_counts,
    repetition_metrics,
    scrub_pii,
)

TRICKY = [
    (1, "mail me at jane.doe+tag@sub.example.co.uk today"),
    (2, "server at 192.168.0.1 and 10.0.0.255, version 1.2"),
    (3, "call +358 40 123-4567 or +1 (555) 000 1234 now"),
    (4, "no pii here, just text with dots... and @ signs @ large"),
    (5, "a@b.io x@y.z 1.2.3.4"),  # minimal email; 1-letter TLD must NOT match
    (6, ""),
]


def _spark_scrub(spark):
    df = spark.createDataFrame(TRICKY, ["id", "body"])
    out = df.select(
        "id",
        scrub_pii(F.col("body")).alias("clean"),
        *[
            pii_counts(F.col("body"))[name].alias(f"n_{name}")
            for name, _, _ in PII_PATTERNS
        ],
    )
    return {r["id"]: r.asDict() for r in out.collect()}


def _duck_scrub():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, body VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", TRICKY)
    clean = "body"
    counts = []
    for name, pattern, repl in PII_PATTERNS:
        counts.append(
            f"len(regexp_extract_all(body, '{pattern}')) AS n_{name}"
        )
        clean = f"regexp_replace({clean}, '{pattern}', '{repl}', 'g')"
    rows = con.execute(
        f"SELECT id, {clean} AS clean, {', '.join(counts)} FROM t"
    ).fetchall()
    cols = ["id", "clean"] + [f"n_{n}" for n, _, _ in PII_PATTERNS]
    return {r[0]: dict(zip(cols, r)) for r in rows}


def test_scrub_matches_duckdb_on_adversarial_literals(spark):
    got, want = _spark_scrub(spark), _duck_scrub()
    assert got == want


def test_scrub_semantics(spark):
    got = _spark_scrub(spark)
    assert "<EMAIL>" in got[1]["clean"] and got[1]["n_email"] == 1
    assert got[2]["clean"].count("<IP>") == 2 and got[2]["n_ipv4"] == 2
    # "version 1.2" must survive (not an IPv4)
    assert "version 1.2" in got[2]["clean"]
    assert got[3]["n_phone"] == 2 and got[3]["clean"].count("<PHONE>") == 2
    assert got[4]["clean"] == TRICKY[3][1]  # untouched
    # one-letter TLD is not an email; the bare quad IS an IP
    assert got[5]["n_email"] == 1 and got[5]["n_ipv4"] == 1


def test_repetition_metrics_hand_checked(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # dup=3/4, top bigram 'spam spam'=3/3
            (2, "all words here differ"),  # dup=0, every bigram unique
            (3, "x"),  # single token: no bigrams → top_frac 0
            (4, ""),  # empty: zero tokens, zero division guarded
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in repetition_metrics(df).collect()
    }
    assert out[1]["dup_unigram_frac"] == 0.75
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[1]["flagged"] is True
    assert out[2]["dup_unigram_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[2]["flagged"] is True  # 1/3 ≥ 0.18 top-bigram gate
    assert out[3]["top_bigram_frac"] == 0.0 and out[3]["flagged"] is False
    assert out[4]["n_tokens"] == 0 and out[4]["dup_unigram_frac"] == 0.0


def test_repetition_thresholds_configurable(spark):
    df = spark.createDataFrame([(1, "a b a b a b")], ["doc_id", "text"])
    strict = repetition_metrics(df, dup_unigram_threshold=0.1).collect()[0]
    lax = repetition_metrics(
        df, dup_unigram_threshold=0.99, top_bigram_threshold=0.99
    ).collect()[0]
    assert strict["flagged"] is True
    assert lax["flagged"] is False
