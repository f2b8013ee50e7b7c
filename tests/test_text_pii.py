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


def test_gopher_quality_flags_rules(spark):
    """Each Gopher rule fires on its planted violation and only there
    (Rae et al. §A1.1): too-short page, 1-char words (mean length),
    symbol spam, bullet walls, missing stopwords."""
    from pyspark.sql import functions as F

    from hfp_loader_spark.operators.text import gopher_quality_flags

    good = ("the cat sat with all of that and more here today " * 6).strip()
    rows = [
        (1, good),                                      # passes everything
        (2, "short text with the and of"),              # < 50 words
        (3, ("a b c " * 40).strip()),                   # mean word len < 3
        (4, good + " " + "### " * 30),                  # symbol spam
        (5, "\n".join(["- item " + good] * 10)),        # 10/10 bullet lines
        (6, ("value table query scan merge " * 12).strip()),  # no stopwords
        (7, ""),                                        # empty page
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flags = gopher_quality_flags(F.col("text"))
    out = {
        r["doc_id"]: r.asDict()
        for r in df.select("doc_id", *[
            v.alias(k) for k, v in flags.items()
        ]).collect()
    }
    assert out[1]["gopher_keep"]
    assert not out[2]["word_count_ok"] and out[2]["mean_word_len_ok"]
    assert not out[3]["mean_word_len_ok"]
    assert not out[4]["symbol_ratio_ok"]
    assert not out[5]["bullet_frac_ok"]
    assert not out[6]["stopword_ok"] and out[6]["word_count_ok"]
    assert not out[7]["word_count_ok"] and not out[7]["mean_word_len_ok"]
    assert all(not out[k]["gopher_keep"] for k in range(2, 8))
    # ellipsis-line rule: 1/2 lines ending in '...' > 0.3
    ell = spark.createDataFrame(
        [(8, "the first line is fine.\nthe second trails off...")],
        "doc_id long, text string",
    )
    r8 = ell.select(
        *[v.alias(k) for k, v in gopher_quality_flags(F.col("text")).items()]
    ).collect()[0]
    assert not r8["ellipsis_frac_ok"]


def test_c4_line_filter_rules(spark):
    """C4 §2.2 line retention: terminal punctuation + ≥3 words +
    no-javascript per line; ≥5 kept lines + no brace + no lorem ipsum
    per page; cleaned_text is exactly the surviving lines."""
    from pyspark.sql import functions as F

    from hfp_loader_spark.operators.text import c4_line_filter

    page = "\n".join(
        [
            "This is a perfectly good sentence.",   # kept
            "Another fine sentence ends here too!", # kept
            "no terminal punctuation on this line", # dropped: punct
            "Too few.",                             # dropped: < 3 words
            "Enable javascript to view this page.", # dropped: blacklist
            'He said "stop right there."',          # kept (quote end)
            "Does this question count as well?",    # kept
            "",                                     # dropped: empty
            "The fifth and final proper sentence.", # kept
        ]
    )
    rows = [
        (1, page),                                   # 5 kept → page keep
        (2, page + "\nint main() { return 0; }"),    # brace → page drop
        (3, "Lorem ipsum dolor sit amet filler.\n" + page),  # lorem drop
        (4, "Only one good sentence lives here.\nsecond line bad"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flt = c4_line_filter(F.col("text"))
    out = {
        r["doc_id"]: r.asDict()
        for r in df.select("doc_id", *[
            v.alias(k) for k, v in flt.items()
        ]).collect()
    }
    assert out[1]["n_lines"] == 8 and out[1]["n_kept_lines"] == 5
    assert out[1]["page_keep"]
    assert out[1]["cleaned_text"].split("\n") == [
        "This is a perfectly good sentence.",
        "Another fine sentence ends here too!",
        'He said "stop right there."',
        "Does this question count as well?",
        "The fifth and final proper sentence.",
    ]
    assert not out[2]["page_keep"]          # brace, despite 6 kept lines
    assert not out[3]["page_keep"]          # lorem ipsum (kept lines ≥ 5)
    assert out[3]["n_kept_lines"] >= 5
    assert out[4]["n_kept_lines"] == 1 and not out[4]["page_keep"]
    assert out[5]["n_lines"] == 0 and not out[5]["page_keep"]


def test_dsir_importance_prefers_target_like_docs(spark):
    """DSIR (Xie et al. 2023): a document written in the target domain's
    vocabulary must outscore one written in the raw-only vocabulary, and
    a mixed document lands between them; n_tokens is the tokenizer
    count."""
    from pyspark.sql import functions as F  # noqa: F401

    from hfp_loader_spark.operators.sampling import dsir_importance_weights

    target_vocab = "alpha beta gamma delta epsilon"
    raw_vocab = "zork grue troll dungeon lantern"
    docs = spark.createDataFrame(
        [
            (1, (target_vocab + " ") * 8),
            (2, (raw_vocab + " ") * 8),
            (3, (target_vocab + " " + raw_vocab + " ") * 4),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, (target_vocab + " ") * 20)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["dsir_logw"])
        for r in dsir_importance_weights(docs, target).collect()
    }
    assert out[1][0] == 40 and out[2][0] == 40 and out[3][0] == 40
    assert out[1][1] > out[3][1] > out[2][1]
    # target-like is genuinely positive, raw-only genuinely negative
    assert out[1][1] > 0 > out[2][1]


def test_dsir_rejects_bad_bucket_count(spark):
    import pytest

    from hfp_loader_spark.operators.sampling import dsir_importance_weights

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="num_buckets"):
        dsir_importance_weights(df, df, num_buckets=1024)


def test_ccnet_perplexity_prefers_lm_domain_docs(spark):
    """CCNet (Wenzek et al. 2020): a document written in the LM corpus's
    vocabulary scores LOWER cross-entropy than one in vocabulary the LM
    never saw; an unseen-context bigram costs exactly the smoothing
    floor ln(B) = ln((0+s)/(0+s·B))⁻¹ when its buckets are untrained."""
    import math

    from hfp_loader_spark.operators.text import ccnet_perplexity

    lm_vocab = "alpha beta gamma delta epsilon"
    odd_vocab = "zork grue troll dungeon lantern"
    docs = spark.createDataFrame(
        [(1, (lm_vocab + " ") * 8), (2, (odd_vocab + " ") * 8)],
        "doc_id long, text string",
    )
    lm = spark.createDataFrame(
        [(100, (lm_vocab + " ") * 20)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["n_bigrams"], r["ce_nats"])
        for r in ccnet_perplexity(docs, lm, num_buckets=64).collect()
    }
    assert out[1][0] == 39 and out[2][0] == 39  # 40 tokens → 39 bigrams
    assert out[1][1] < out[2][1]
    # trained bigrams are far below the smoothing floor; unseen ones at
    # most at it (hash collisions can only lower the cost, never raise it)
    assert out[1][1] < 2.0
    assert out[2][1] <= math.log(64) + 1e-9


def test_ccnet_perplexity_short_docs_and_validation(spark):
    import pytest

    from hfp_loader_spark.operators.text import ccnet_perplexity

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "two tokens"), (3, None)],
        "doc_id long, text string",
    )
    lm = spark.createDataFrame([(9, "two tokens")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in ccnet_perplexity(docs, lm).collect()}
    assert set(rows) == {2}  # <2 tokens → no events → dropped
    assert rows[2]["n_bigrams"] == 1
    with pytest.raises(ValueError, match="num_buckets"):
        ccnet_perplexity(docs, lm, num_buckets=0)


def test_ccnet_bucket_and_cutoffs(spark):
    from hfp_loader_spark.operators.text import (
        ccnet_bucket,
        ccnet_cutoffs,
        ccnet_perplexity,
    )

    lm_vocab = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [(i, (lm_vocab + " ") * (2 + i % 5) + "zork grue " * (i % 3))
         for i in range(30)],
        "doc_id long, text string",
    )
    lm = spark.createDataFrame(
        [(100, (lm_vocab + " ") * 20)], "doc_id long, text string"
    )
    scored = ccnet_perplexity(docs, lm, num_buckets=64)
    lo, hi = ccnet_cutoffs(scored)
    assert lo <= hi
    out = scored.withColumn(
        "bucket", ccnet_bucket(F.col("ce_nats"), lo, hi)
    ).collect()
    seen = {r["bucket"] for r in out}
    assert seen <= {"head", "middle", "tail"}
    # percentile cutoffs split a 30-doc corpus into non-empty tertiles
    assert {"head", "tail"} <= seen
    for r in out:
        want = (
            "head" if r["ce_nats"] < lo
            else "middle" if r["ce_nats"] < hi else "tail"
        )
        assert r["bucket"] == want


def test_gopher_repetition_fractions_hand_checked(spark):
    """Exact Rae-et-al. Table-A1 fractions on planted docs: top-n-gram
    counts ALL occurrences (overlaps included, so fractions may exceed
    1), duplicate-n-gram coverage counts each character ONCE (position
    union), and short/empty docs fall through to zero fractions."""
    from hfp_loader_spark.operators.text import gopher_repetition_fractions

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),
            (2, "a b c d e a b c d e"),
            (3, ""),
            (4, "hello"),
            (5, "w w w w w w"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_repetition_fractions(df).collect()
    }

    # doc 1: 4 tokens, 16 chars. "spam spam" ×3 → 3·8/16; "spam spam
    # spam" ×2 → 2·12/16; the 4-gram once → 16/16; too short for n≥5.
    assert out[1]["n_tokens"] == 4 and out[1]["total_chars"] == 16
    assert out[1]["top_ngram_frac_2"] == 1.5
    assert out[1]["top_ngram_frac_3"] == 1.5
    assert out[1]["top_ngram_frac_4"] == 1.0
    assert all(out[1][f"dup_ngram_frac_{n}"] == 0.0 for n in range(5, 11))
    assert out[1]["gopher_rep_keep"] is False

    # doc 2: 10 single-char tokens. Max-count bigram/trigram/4-gram all
    # occur 2× → 2·2/10, 2·3/10, 2·4/10; "a b c d e" ×2 covers every
    # position → dup_5 = 1.0; every n≥6 gram is unique → 0.
    assert out[2]["top_ngram_frac_2"] == 0.4
    assert out[2]["top_ngram_frac_3"] == 0.6
    assert out[2]["top_ngram_frac_4"] == 0.8
    assert out[2]["dup_ngram_frac_5"] == 1.0
    assert all(out[2][f"dup_ngram_frac_{n}"] == 0.0 for n in range(6, 11))
    assert out[2]["gopher_rep_keep"] is False

    # empty + single-token docs: all-zero fractions, keep=True
    for d in (3, 4):
        assert all(
            out[d][c] == 0.0
            for c in out[d]
            if c.startswith(("top_ngram", "dup_ngram"))
        )
        assert out[d]["gopher_rep_keep"] is True
    assert out[3]["n_tokens"] == 0 and out[3]["total_chars"] == 0
    assert out[4]["n_tokens"] == 1 and out[4]["total_chars"] == 5

    # doc 5: "w"×6 — the duplicate 5-gram occurs at pos 0 and 1 with
    # 4 overlapping positions; union coverage = 6/6 chars exactly 1.0
    # (an occurrence·len count would give 10/6 — the union is the test).
    assert out[5]["dup_ngram_frac_5"] == 1.0
    assert out[5]["dup_ngram_frac_6"] == 0.0


def test_dedup_lines_crossdoc_hand_checked(spark):
    from hfp_loader_spark.operators.text import dedup_lines_crossdoc

    docs = spark.createDataFrame(
        [
            # doc 1: "shared" appears first here (line 0); internal
            # repeat of "twice" keeps only the first copy
            (1, "shared\ntwice\ntwice\nunique one"),
            # doc 2: both lines are later occurrences → fully excised
            (2, "shared\ntwice"),
            # doc 3: blank/whitespace lines are dropped before dedup
            (3, "  \n\nunique three\n   \n"),
            # doc 4: no non-empty lines → no output row
            (4, "  \n "),
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_lines_crossdoc(docs).collect()
    }
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (4, 3)
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (2, 0)
    assert (out[3]["n_lines"], out[3]["n_kept"]) == (1, 1)
    import hashlib

    assert out[1]["clean_hash"] == hashlib.md5(
        b"shared\ntwice\nunique one"
    ).hexdigest()
    # fully-duplicated page pins to md5('')
    assert out[2]["clean_hash"] == hashlib.md5(b"").hexdigest()
