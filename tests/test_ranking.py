"""operators.ranking — BM25 and the hashed linear classifier.

Hand-computed expectations (not engine-vs-engine): the BM25 case is a
3-document corpus small enough to evaluate the Okapi formula by hand,
and the classifier case replays the md5 hashing trick in pure Python
(hashlib) so the Spark plan is checked against an independent
implementation, not against itself.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from hfp_loader_spark.operators.ranking import (
    bm25_scores,
    bm25_topk,
    hashed_feature,
    hashed_linear_score,
    pseudo_weights,
)


@pytest.fixture()
def tiny_corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry cherry"),
        ],
        "doc_id long, text string",
    )


def test_bm25_hand_checked(spark, tiny_corpus):
    """N=3, Σdl=9, avgdl=3, query 'apple cherry':

    idf(apple)  = ln(1 + 2.5/1.5) = ln(8/3)      (df=1)
    idf(cherry) = ln(1 + 1.5/2.5) = ln(1.6)      (df=2)
    d1: tf(apple)=2, dl=3 → ln(8/3)·4.4/(2+1.2·1.0)
    d2: tf(cherry)=1, dl=2 → ln(1.6)·2.2/(1+1.2·0.75)
    d3: tf(cherry)=4, dl=4 → ln(1.6)·8.8/(4+1.2·1.25)
    """
    q = spark.createDataFrame(
        [(1, "apple cherry")], "query_id long, query_text string"
    )
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(tiny_corpus, q).collect()
    }
    assert out[1] == round(math.log(8 / 3) * 4.4 / 3.2, 4)
    assert out[2] == round(math.log(1.6) * 2.2 / 1.9, 4)
    assert out[3] == round(math.log(1.6) * 8.8 / 5.5, 4)
    # ranking follows the rounded scores, best first
    ranked = bm25_topk(tiny_corpus, q, 2).collect()
    assert [(r["doc_id"], r["rn"]) for r in ranked] == [(1, 1), (3, 2)]


def test_bm25_set_semantics_and_no_match(spark, tiny_corpus):
    """Duplicate query terms count once; a no-overlap query yields no
    rows; a no-overlap document never appears."""
    q = spark.createDataFrame(
        [(1, "apple apple apple"), (2, "durian fig")],
        "query_id long, query_text string",
    )
    rows = bm25_scores(tiny_corpus, q).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    assert 2 not in by_q  # no term in corpus
    assert set(by_q[1]) == {1}  # only d1 contains 'apple'
    single = spark.createDataFrame(
        [(9, "apple")], "query_id long, query_text string"
    )
    want = {r["doc_id"]: r["score"] for r in bm25_scores(tiny_corpus, single).collect()}
    assert by_q[1] == want  # tripled term == single term


def test_hard_negatives_exclusions(spark, tiny_corpus):
    """Anchor d1 = 'apple banana apple': d3 shares no term (never a
    candidate), d2 shares 'banana' with Jaccard({apple,banana},
    {banana,cherry}) = 1/3 — in at cap 0.5, out at cap 0.3; the anchor
    itself is always excluded."""
    from hfp_loader_spark.operators.ranking import hard_negatives

    anchors = tiny_corpus.where(F.col("doc_id") == 1).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    rows = hard_negatives(tiny_corpus, anchors, 5, max_jaccard=0.5).collect()
    assert [(r["query_id"], r["doc_id"]) for r in rows] == [(1, 2)]
    assert rows[0]["jaccard"] == round(1 / 3, 6)
    assert hard_negatives(tiny_corpus, anchors, 5, max_jaccard=0.3).count() == 0


def test_hashed_feature_matches_hashlib(spark):
    df = spark.createDataFrame(
        [("hash",), ("join",), ("the",)], "term string"
    )
    got = {
        r["term"]: r["b"]
        for r in df.select("term", hashed_feature(F.col("term"), 256).alias("b")).collect()
    }
    for t, b in got.items():
        assert b == int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 256


def test_hashed_linear_score_python_replica(spark):
    """Full-model agreement with an independent hashlib/math replica,
    including the empty-document prior row."""
    dim, seed, bias = 64, "tw", 0.2
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "spam spam spam"), (3, "")],
        "doc_id long, text string",
    )
    w = pseudo_weights(spark, dim, seed=seed, scale=1.0)
    out = {
        r["doc_id"]: r
        for r in hashed_linear_score(
            docs, w, dim=dim, bias=bias, threshold=0.5
        ).collect()
    }

    def weight(j: int) -> float:
        h = int(hashlib.md5(f"{seed}:{j}".encode()).hexdigest()[:8], 16)
        return (h % 2001 - 1000) / 1000.0

    def expect(text: str) -> tuple[int, float]:
        toks = [t for t in text.lower().split() if t]
        if not toks:
            return 0, round(1 / (1 + math.exp(-bias)), 4)
        s = sum(
            weight(int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim)
            for t in toks
        )
        return len(toks), round(1 / (1 + math.exp(-(bias + s / len(toks)))), 4)

    for doc_id, text in [(1, "the quick brown fox"), (2, "spam spam spam"), (3, "")]:
        n, p = expect(text)
        assert out[doc_id]["n_tokens"] == n
        assert out[doc_id]["p"] == p
        assert out[doc_id]["keep"] is (p >= 0.5)


def test_pseudo_weights_bounded_and_deterministic(spark):
    w1 = pseudo_weights(spark, 128, seed="a", scale=0.5).collect()
    w2 = pseudo_weights(spark, 128, seed="a", scale=0.5).collect()
    assert sorted(map(tuple, w1)) == sorted(map(tuple, w2))
    assert len(w1) == 128
    assert all(-0.5 <= r["weight"] <= 0.5 for r in w1)


def test_bm25_query_side_broadcast(spark, tiny_corpus):
    """The corpus must never shuffle for the model inputs: every join
    against query-derived frames is a broadcast join in the plan."""
    q = spark.createDataFrame(
        [(1, "apple cherry")], "query_id long, query_text string"
    )
    plan = bm25_scores(tiny_corpus, q)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the only sort-merge-eligible join is tf ⋈ dl on doc_id
    assert plan.count("SortMergeJoin") <= 1


def test_rrf_fuse_arithmetic_and_absent_sides(spark):
    """d1 ranked 1st in both lists → 2/(61); d2 only lexical rank 2 →
    1/62; d3 only dense rank 2 → 1/62 (tie broken by id); absent-from-
    both never appears."""
    from hfp_loader_spark.operators.ranking import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2)], "query_id long, doc_id long, rn long"
    )
    dense = spark.createDataFrame(
        [(1, 10, 1), (1, 30, 2)], "query_id long, doc_id long, rn long"
    )
    rows = rrf_fuse([lex, dense], topk=5).collect()
    got = [(r["doc_id"], r["rrf"], r["rn"]) for r in sorted(rows, key=lambda r: r["rn"])]
    assert got == [
        (10, round(2 / 61, 6), 1),
        (20, round(1 / 62, 6), 2),
        (30, round(1 / 62, 6), 3),
    ]


def test_roc_auc_separation_inversion_ties_and_degenerate(spark):
    """Textbook AUC properties: perfect separation → 1, inversion → 0,
    constant score → 0.5 (tie correction), single-class → NULL auc with
    counts still reported."""
    from hfp_loader_spark.operators.ranking import roc_auc

    def auc_of(rows):
        df = spark.createDataFrame(rows, "score double, label boolean")
        r = roc_auc(df, "score", "label").collect()[0]
        return r["auc"], r["n_pos"], r["n_neg"]

    sep = [(0.9, True), (0.8, True), (0.2, False), (0.1, False)]
    assert auc_of(sep) == (1.0, 2, 2)
    inv = [(s, not l) for s, l in sep]
    assert auc_of(inv)[0] == 0.0
    const = [(0.5, True), (0.5, False), (0.5, True), (0.5, False)]
    assert auc_of(const)[0] == 0.5
    one_class = [(0.9, True), (0.1, True)]
    a, np_, nn = auc_of(one_class)
    assert a is None and np_ == 2 and nn == 0

    # hand-computable mixed case with a cross-class tie:
    # scores: pos {0.8, 0.5}, neg {0.5, 0.2}  → pairs: (0.8 beats both)
    # + (0.5 vs 0.5 = half) + (0.5 beats 0.2) → (2 + 0.5 + 1)/4 = 0.875
    mixed = [(0.8, True), (0.5, True), (0.5, False), (0.2, False)]
    assert auc_of(mixed)[0] == 0.875


def test_roc_auc_excludes_null_scores(spark):
    """ADVICE r10 #3: NULL scores must be excluded before the rank
    histogram (Spark orders NULLs first, so including them would shift
    every rank) and n_pos/n_neg must count only scored rows."""
    from hfp_loader_spark.operators.ranking import roc_auc

    rows = [
        (0.9, True),
        (0.8, True),
        (0.2, False),
        (0.1, False),
        (None, True),   # unscorable rows — must not shift ranks
        (None, False),
    ]
    r = roc_auc(
        spark.createDataFrame(rows, "score double, label boolean"),
        "score",
        "label",
    ).collect()[0]
    assert (r["auc"], r["n_pos"], r["n_neg"]) == (1.0, 2, 2)


def test_roc_auc_bounds_unrounded_score_domain(spark):
    """VERDICT r10 #2: the operator rounds the score INSIDE the groupBy,
    so the global rank window runs over a provably bounded distinct-score
    frame for ANY caller — verified here with unrounded random doubles
    against a brute-force tie-aware Mann–Whitney on the rounded scores."""
    import random

    from hfp_loader_spark.operators.ranking import roc_auc

    rng = random.Random(411)
    rows = [(rng.random(), rng.random() < 0.4) for _ in range(400)]
    df = spark.createDataFrame(rows, "score double, label boolean")

    d = 3  # coarse rounding → many ties → the correction must carry
    got = roc_auc(df, "score", "label", score_round_to=d).collect()[0]

    rounded = [(round(s, d), l) for s, l in rows]
    pos = [s for s, l in rounded if l]
    neg = [s for s, l in rounded if not l]
    wins = sum(
        1.0 if p > q else 0.5 if p == q else 0.0 for p in pos for q in neg
    )
    assert got["auc"] == round(wins / (len(pos) * len(neg)), 6)
    assert (got["n_pos"], got["n_neg"]) == (len(pos), len(neg))
    # the distinct-score frame the rank window sorts is domain-bounded:
    # scores in [0,1] at d decimals → ≤ 10^d + 1 distinct values
    assert df.select(
        F.round("score", d).alias("s")
    ).distinct().count() <= 10**d + 1


def test_roc_auc_score_round_to_none_preserves_exact_scores(spark):
    """ADVICE r11 #5: score_round_to=None must keep scores closer than
    1e-6 DISTINCT (no forced ties), while the default merges them —
    constructed so the two modes provably differ."""
    from hfp_loader_spark.operators.ranking import roc_auc

    rows = [
        (0.5, True),
        (0.5 + 1e-9, False),  # above the positive only if unrounded
        (0.1, False),
        (0.9, True),
    ]
    df = spark.createDataFrame(rows, "score double, label boolean")
    exact = roc_auc(df, "score", "label", score_round_to=None).collect()[0]
    merged = roc_auc(df, "score", "label").collect()[0]
    # exact: positive 0.5 is beaten by the 1e-9-higher negative
    # (rank pairs: 0.5 beats 0.1 → 1; 0.9 beats all → 2) AUC = 3/4
    assert abs(exact["auc"] - 0.75) < 1e-9
    # merged: the two 0.5s tie → 0.5 credit → AUC = 3.5/4
    assert abs(merged["auc"] - 0.875) < 1e-9
    assert exact["n_pos"] == merged["n_pos"] == 2


def test_roc_auc_unrounded_high_cardinality_sharded_cumsum(spark):
    """VERDICT r15 #5: with score_round_to=None on a continuous score
    the distinct-score frame is data-sized, so the rank cumsum must NOT
    run through one unpartitioned global window.  Planted: 3000 unique
    random doubles — the result must match a brute-force tie-aware
    Mann-Whitney exactly, and the physical plan's only unpartitioned
    window must be over the bounded n_shards totals frame (the
    data-sized window is partitioned by the range shard)."""
    import random

    from hfp_loader_spark.operators.ranking import roc_auc

    rng = random.Random(1612)
    rows = [(rng.random(), rng.random() < 0.3) for _ in range(3000)]
    assert len({s for s, _ in rows}) == len(rows)  # all distinct
    df = spark.createDataFrame(rows, "score double, label boolean")

    out = roc_auc(df, "score", "label", score_round_to=None, n_shards=7)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # the distinct-score window is shard-partitioned ...
    assert "_shard" in plan
    # ... and every unpartitioned Window in the plan sits over the
    # n_shards-row totals frame, never the score frame: the totals
    # frame is the output of the groupBy(_shard) agg, so the global
    # window's child must carry _tot, not _n.
    import re

    # ADVICE r16: the old `Window [...]` regex was written for the
    # SIMPLE explain format and matched nothing in "formatted" output —
    # the guard was vacuous.  Parse the formatted node structure
    # instead: each `(N) Window` node's Arguments line carries 2 bracket
    # groups when unpartitioned ([exprs], [order]) and 3 when
    # partitioned ([exprs], [partition], [order]).  Every unpartitioned
    # window must sit over the n_shards-row totals frame (Input carries
    # _tot), never the distinct-score frame (_n/_s).
    lines = plan.splitlines()
    win_nodes = []
    for i, line in enumerate(lines):
        if re.match(r"\(\d+\) Window", line.strip()):
            node = {"input": "", "args": ""}
            for j in range(i + 1, min(i + 6, len(lines))):
                ls = lines[j].strip()
                if ls.startswith("Input"):
                    node["input"] = ls
                elif ls.startswith("Arguments:"):
                    node["args"] = ls
            win_nodes.append(node)
    assert win_nodes, "no Window node found — explain format drifted?"
    unpartitioned = [
        n for n in win_nodes if n["args"].count("], [") == 1
    ]
    # the totals-frame offset window exists and is the ONLY global one
    assert unpartitioned, "expected one unpartitioned totals window"
    for n in unpartitioned:
        assert "_tot" in n["input"], (
            "global window over a non-totals frame:\n" + n["input"]
        )

    got = out.collect()[0]
    pos = [s for s, l in rows if l]
    neg = [s for s, l in rows if not l]
    wins = sum(
        1.0 if p > q else 0.5 if p == q else 0.0 for p in pos for q in neg
    )
    assert got["auc"] == round(wins / (len(pos) * len(neg)), 6)
    assert (got["n_pos"], got["n_neg"]) == (len(pos), len(neg))

    # and the two formulations agree bit-for-bit on tied/degenerate
    # inputs too (integer-valued double sums are exact in both shapes)
    tied = [(float(i % 5) / 10.0, i % 3 == 0) for i in range(200)]
    tdf = spark.createDataFrame(tied, "score double, label boolean")
    a = roc_auc(tdf, "score", "label", score_round_to=None).collect()[0]
    b = roc_auc(tdf, "score", "label", score_round_to=6).collect()[0]
    assert (a["auc"], a["n_pos"], a["n_neg"]) == (
        b["auc"],
        b["n_pos"],
        b["n_neg"],
    )
