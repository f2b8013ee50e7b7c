"""Tests for the windowed-funnel twin, boilerplate, chunking, emb stats."""

from __future__ import annotations

import datetime
import hashlib

from pyspark.sql import functions as F

from hfp_loader_spark.operators.relational import (
    funnel_counts,
    funnel_counts_windowed,
)
from hfp_loader_spark.operators.text import boilerplate_fractions, chunk_documents
from hfp_loader_spark.plans.catalog import load_table


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, _ts(ts), user, typ) for i, (user, ts, typ) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_windowed_funnel_requires_strict_ordering(spark):
    ev = _events(
        spark,
        [
            # u1 completes all three steps in order
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 10:05:00", "click"),
            (1, "2024-01-01 10:10:00", "purchase"),
            # u2 clicks BEFORE viewing → click must not count
            (2, "2024-01-01 09:00:00", "click"),
            (2, "2024-01-01 09:30:00", "view"),
            # u3 views only
            (3, "2024-01-01 08:00:00", "view"),
            # u4 purchase happens before the click → stops at click
            (4, "2024-01-01 07:00:00", "view"),
            (4, "2024-01-01 07:01:00", "purchase"),
            (4, "2024-01-01 07:02:00", "click"),
        ],
    )
    report = {
        r["step"]: r
        for r in funnel_counts_windowed(
            ev, ["view", "click", "purchase"]
        ).collect()
    }
    assert report["view"]["n_users"] == 4
    assert report["click"]["n_users"] == 2
    assert report["purchase"]["n_users"] == 1
    assert [report[s]["step_idx"] for s in ("view", "click", "purchase")] == [
        1,
        2,
        3,
    ]


def test_windowed_funnel_same_timestamp_step_does_not_count(spark):
    ev = _events(
        spark,
        [
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 10:00:00", "click"),  # ts == anchor → strict > fails
            (2, "2024-01-01 10:00:00", "view"),
            (2, "2024-01-01 10:00:01", "click"),
        ],
    )
    report = {
        r["step"]: r["n_users"]
        for r in funnel_counts_windowed(ev, ["view", "click"]).collect()
    }
    assert report == {"view": 2, "click": 1}


def test_windowed_funnel_empty_input(spark):
    ev = _events(spark, []).limit(0)
    rows = funnel_counts_windowed(ev, ["view", "click"]).collect()
    assert [r["n_users"] for r in rows] == [0, 0]


def test_windowed_funnel_matches_join_chain_twin(spark, sf_dir):
    """The two physical strategies implement ONE semantics — assert it."""
    ev = load_table(spark, sf_dir, "events")
    steps = ["view", "click", "purchase"]
    windowed = {
        (r["step"], r["step_idx"]): r["n_users"]
        for r in funnel_counts_windowed(ev, steps).collect()
    }
    chained = {
        (r["step"], r["step_idx"]): r["n_users"]
        for r in funnel_counts(ev, steps).collect()
    }
    assert windowed == chained
    # funnel monotonicity: user counts can only shrink down the funnel
    users = [windowed[(s, i)] for i, s in enumerate(steps, start=1)]
    assert users == sorted(users, reverse=True)


def test_chunk_documents_spans_and_hashes(spark):
    toks = [f"w{i}" for i in range(40)]
    docs = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "solo"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_documents(docs, window=32, stride=24).collect()
    }
    # doc 1: 40 tokens → starts 0 and 24
    assert out[(1, 0)]["n_tokens"] == 32
    assert out[(1, 1)]["n_tokens"] == 16  # tail chunk truncates
    expect = hashlib.md5(" ".join(toks[:32]).encode()).hexdigest()
    assert out[(1, 0)]["chunk_md5"] == expect
    expect_tail = hashlib.md5(" ".join(toks[24:40]).encode()).hexdigest()
    assert out[(1, 1)]["chunk_md5"] == expect_tail
    # short doc → exactly one chunk
    assert out[(2, 0)]["n_tokens"] == 1
    assert (2, 1) not in out
    # empty doc → one empty chunk (md5 of the empty string)
    assert out[(3, 0)]["n_tokens"] == 0
    assert out[(3, 0)]["chunk_md5"] == hashlib.md5(b"").hexdigest()


def test_boilerplate_fractions_flags_shared_bigrams(spark):
    # "common gram" appears in 3/4 docs (df >= ceil(0.5*4)=2 → boilerplate);
    # every other bigram is unique to its document.
    docs = spark.createDataFrame(
        [
            (1, "common gram alpha beta"),
            (2, "common gram gamma delta"),
            (3, "common gram epsilon zeta"),
            (4, "eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_fractions(docs, n=2, min_df_frac=0.5).collect()
    }
    # doc 1 distinct bigrams: common-gram, gram-alpha, alpha-beta → 1/3 flagged
    assert out[1]["n_grams"] == 3
    assert out[1]["n_boiler"] == 1
    assert out[1]["boiler_frac"] == 0.3333
    assert out[4]["n_boiler"] == 0


def test_analytics_catalog_entries_run_on_driver_data(spark, sf_dir):
    from hfp_loader_spark.plans.catalog import REGISTRY

    for name in (
        "events_funnel_windowed",
        "text_boilerplate_by_source",
        "text_chunk_windows",
        "emb_dim_stats",
    ):
        df = REGISTRY[name].builder(spark, sf_dir)
        assert df.count() >= 0

    # emb stats cover every dimension exactly once
    dims = [
        r["dim"]
        for r in REGISTRY["emb_dim_stats"].builder(spark, sf_dir).collect()
    ]
    emb = load_table(spark, sf_dir, "embeddings")
    dim = emb.select(F.size("embedding").alias("d")).first()["d"]
    assert sorted(dims) == list(range(dim))


def test_khop_reachability_min_distances(spark):
    from hfp_loader_spark.operators.graph import khop_reachability

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (2, 1)],  # dup/reverse edges ok
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(1,), (5,), (9,)], "id long")
    out = {
        r["node"]: r["hops"]
        for r in khop_reachability(edges, seeds, k=2).collect()
    }
    # 9 is isolated but still reported at distance 0
    assert out == {1: 0, 5: 0, 9: 0, 2: 1, 6: 1, 3: 2}
    # k=0 → seeds only
    out0 = {
        r["node"]: r["hops"]
        for r in khop_reachability(edges, seeds, k=0).collect()
    }
    assert out0 == {1: 0, 5: 0, 9: 0}
    # a triangle must not re-expand visited nodes into longer distances
    tri = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    s1 = spark.createDataFrame([(1,)], "id long")
    outt = {
        r["node"]: r["hops"] for r in khop_reachability(tri, s1, k=3).collect()
    }
    assert outt == {1: 0, 2: 1, 3: 1}


def test_chunk_dedup_stats_counts_duplicate_chunks(spark, sf_dir):
    from hfp_loader_spark.plans.catalog import REGISTRY

    row = REGISTRY["text_chunk_dedup_stats"].builder(spark, sf_dir).first()
    assert row["n_chunks"] == row["n_distinct"] + row["n_dup"]
    assert 0.0 <= row["dup_frac"] <= 1.0


def test_cooccurrence_and_outlier_invariants(spark, sf_dir):
    from hfp_loader_spark.plans.catalog import REGISTRY, load_table

    co = REGISTRY["events_type_cooccurrence"].builder(spark, sf_dir).collect()
    n_users = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    for r in co:
        assert r["type_a"] < r["type_b"]  # unordered pairs, no mirrors
        assert 0 < r["n_users_both"] <= n_users
        assert 0.0 < r["support"] <= 1.0

    out = REGISTRY["events_value_outliers"].builder(spark, sf_dir).collect()
    for r in out:
        assert r["n_outliers"] <= r["n_events"]
        # |z|>3 outliers require max|z|>3; otherwise max|z| <= 3
        if r["n_outliers"] > 0:
            assert r["max_abs_z"] > 3
        else:
            assert r["max_abs_z"] <= 3


def test_funnel_max_gap_expires_conversions(spark):
    from hfp_loader_spark.operators.relational import funnel_counts_windowed

    ev = _events(
        spark,
        [
            # u1 clicks 30s after viewing → inside a 60s window
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 10:00:30", "click"),
            # u2 clicks 2 minutes after viewing → expired
            (2, "2024-01-01 10:00:00", "view"),
            (2, "2024-01-01 10:02:00", "click"),
            # u3: a second view re-anchors nothing (earliest anchor rule),
            # so the late click stays expired
            (3, "2024-01-01 10:00:00", "view"),
            (3, "2024-01-01 10:01:30", "view"),
            (3, "2024-01-01 10:02:00", "click"),
        ],
    )
    report = {
        r["step"]: r["n_users"]
        for r in funnel_counts_windowed(
            ev, ["view", "click"], max_gap_seconds=60
        ).collect()
    }
    assert report == {"view": 3, "click": 1}
    # boundary: exactly at the gap still counts (<=)
    ev2 = _events(
        spark,
        [
            (1, "2024-01-01 10:00:00", "view"),
            (1, "2024-01-01 10:01:00", "click"),
        ],
    )
    report2 = {
        r["step"]: r["n_users"]
        for r in funnel_counts_windowed(
            ev2, ["view", "click"], max_gap_seconds=60
        ).collect()
    }
    assert report2["click"] == 1


def test_transition_matrix_rows_are_probability_distributions(spark, sf_dir):
    from hfp_loader_spark.plans.catalog import REGISTRY

    rows = REGISTRY["events_transition_matrix"].builder(spark, sf_dir).collect()
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r["type_from"], []).append(r)
    for outs in by_from.values():
        total = sum(r["prob"] for r in outs)
        assert abs(total - 1.0) < 0.01  # rounding slack of 25 4dp terms
        assert all(r["n_trans"] > 0 for r in outs)


def test_duplicate_ngram_spans_detects_planted_dup(spark):
    base = " ".join(f"tok{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, base + " alpha beta gamma delta"),  # shares 12-token prefix
            (2, base + " epsilon zeta eta theta"),
            (3, " ".join(f"uniq{i}" for i in range(12))),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_fractions(docs, n=8, min_df=2).collect()
    }
    # docs 1 and 2 share the 5 eight-grams fully inside the 12-token prefix
    assert out[1]["n_boiler"] == 5
    assert out[2]["n_boiler"] == 5
    assert out[3]["n_boiler"] == 0


def test_remove_duplicate_spans_exact_surgery(spark):
    """Lee-et-al. exact-substring surgery at word 8-grams: the
    corpus-wide FIRST occurrence of a duplicated n-gram survives, every
    other occurrence's covered tokens are excised (cross-document and
    within-document alike), and untouched / short / NULL / empty docs
    pass through with their token stream intact."""
    from hfp_loader_spark.operators.text import remove_duplicate_spans

    rows = [
        (1, "A B C D e f g h tail one two three"),       # canonical holder
        (2, "prefix words A B C D e f g h more stuff"),  # cross-doc dup
        (3, "x y z " + "r1 r2 r3 r4 r5 r6 r7 r8 " * 2 + "end"),  # self dup
        (4, "short doc"),
        (5, None),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(df, n=8).collect()
    }
    assert len(out) == 6  # one row per input row, none dropped
    assert out[1] == ("A B C D e f g h tail one two three", 12, 0)
    assert out[2] == ("prefix words more stuff", 12, 8)
    assert out[3] == ("x y z r1 r2 r3 r4 r5 r6 r7 r8 end", 20, 8)
    assert out[4] == ("short doc", 2, 0)
    assert out[5] == (None, 0, 0)
    assert out[6] == ("", 0, 0)


def test_remove_duplicate_spans_merges_overlapping_occurrences(spark):
    """Overlapping duplicated grams excise the UNION of covered
    positions — no double counting, no gaps."""
    from hfp_loader_spark.operators.text import remove_duplicate_spans

    nine = " ".join(f"t{i}" for i in range(9))  # two overlapping 8-grams
    rows = [(1, nine + " filler alpha beta"), (2, "lead in " + nine)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in remove_duplicate_spans(df, n=8).collect()
    }
    assert out[1] == (nine + " filler alpha beta", 0)
    assert out[2] == ("lead in", 9)  # both grams' cover = 9 tokens, once


def test_vocab_oov_rates_planted(spark):
    """Vocab = top-2 of {aa×4, bb×3, cc×2, dd×1} = {aa, bb}; doc OOV
    rates follow exactly; a zero-token doc keeps its row with NULL
    rate (0/0 is unmeasured), and ties at the vocab boundary break by
    term asc."""
    from hfp_loader_spark.operators.text import (
        vocab_oov_rates,
        vocab_top_terms,
    )

    rows = [
        (1, "aa aa bb cc"),     # 1 OOV of 4
        (2, "aa bb bb dd cc"),  # 2 OOV of 5
        (3, "aa aa"),           # 0 OOV of 2
        (4, "...!!!"),          # tokenizes to nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = [r["term"] for r in vocab_top_terms(df, 2).collect()]
    assert vocab == ["aa", "bb"]
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in vocab_oov_rates(df, 2).collect()
    }
    assert got == {
        1: (4, 1, 0.25),
        2: (5, 2, 0.4),
        3: (2, 0, 0.0),
        4: (0, 0, None),
    }
    # boundary tie: equal counts fall back to term order (ee before ff)
    tie = spark.createDataFrame(
        [(1, "ee ff ee ff gg")], "doc_id long, text string"
    )
    assert [r["term"] for r in vocab_top_terms(tie, 1).collect()] == ["ee"]


def test_token_entropy_known_distributions(spark):
    """Uniform over 4 tokens → ln 4; single repeated token → 0;
    empty → NULL with a kept row."""
    import math

    from hfp_loader_spark.operators.text import token_entropy

    rows = [
        (1, "a b c d"),          # uniform: H = ln 4
        (2, "x x x x x"),        # degenerate: H = 0
        (3, "a a b b"),          # two evens: H = ln 2
        (4, ""),                 # no tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy"])
        for r in token_entropy(df).collect()
    }
    assert got[1] == (4, 4, round(math.log(4), 4))
    assert got[2] == (5, 1, 0.0)
    assert got[3] == (4, 2, round(math.log(2), 4))
    assert got[4] == (0, 0, None)
