"""Composition invariants for the end-to-end corpus-prep pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from hfp_loader_spark.pipeline import PipelineConfig, chunk_corpus, prepare_corpus
from hfp_loader_spark.plans.catalog import load_table


def test_pipeline_stages_shrink_and_account(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    heldout = docs.where(F.col("doc_id") % 17 == 0)
    corpus = docs.where(F.col("doc_id") % 17 != 0)
    clean, counts, release = prepare_corpus(
        spark,
        corpus,
        heldout=heldout,
        config=PipelineConfig(mixture_thresholds={"src0": "8000"}),
    )
    # every stage ran and is recorded in order
    assert list(counts) == [
        "input",
        "quality",
        "exact_dedup",
        "near_dedup",
        "decontaminate",
        "mixture",
        "output",
    ]
    # monotone shrinkage: each gate can only remove documents
    vals = list(counts.values())
    assert all(a >= b for a, b in zip(vals, vals[1:])), counts
    assert counts["input"] == corpus.count()
    assert counts["output"] == clean.count()
    assert counts["output"] > 0
    # the mixture stage actually dropped part of src0 (threshold ~50%)
    assert counts["mixture"] < counts["decontaminate"]
    # survivors are a subset of the input ids
    ids_in = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    ids_out = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert ids_out <= ids_in


def test_pipeline_removes_planted_duplicates_and_contamination(spark):
    base = " ".join(f"w{i}" for i in range(30))
    bench_text = " ".join(f"bench{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, base, "src0"),
            (2, base, "src0"),  # exact duplicate of 1 → dropped
            (3, base + " tail", "src0"),  # near-dup of 1 → clustered out
            (4, bench_text + " extra words here", "src0"),  # contaminated
            (5, " ".join(f"u{i}" for i in range(30)), "src1"),  # clean
        ],
        "doc_id long, text string, source string",
    )
    heldout = spark.createDataFrame(
        [(100, bench_text)], "doc_id long, text string"
    )
    clean, counts, _rel = prepare_corpus(spark, docs, heldout=heldout)
    kept = sorted(r["doc_id"] for r in clean.select("doc_id").collect())
    assert 2 not in kept  # exact dup removed, min id kept
    assert 1 in kept
    assert 4 not in kept  # contaminated doc removed
    assert 5 in kept
    assert counts["output"] == len(kept)


def test_pipeline_is_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    _, c1, _r1 = prepare_corpus(spark, docs)
    _, c2, _r2 = prepare_corpus(spark, docs)
    assert c1 == c2


def test_chunk_corpus_covers_every_survivor(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    clean, _, _rel = prepare_corpus(spark, docs)
    chunks = chunk_corpus(clean)
    n_docs = clean.count()
    chunk_docs = chunks.select("doc_id").distinct().count()
    assert chunk_docs == n_docs  # every surviving doc yields >= 1 chunk


def test_ingest_delta_dedups_against_history(spark, tmp_path):
    from hfp_loader_spark.operators.neardup import save_signature_index
    from hfp_loader_spark.pipeline import ingest_delta

    root = str(tmp_path / "sig_index")
    hist_text = " ".join(f"h{i}" for i in range(30))
    history = spark.createDataFrame(
        [(1, hist_text), (2, " ".join(f"g{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    save_signature_index(spark, history, root, mode="overwrite")

    delta = spark.createDataFrame(
        [
            (10, hist_text),  # near/exact dup of history doc 1 → dropped
            (11, " ".join(f"n{i}" for i in range(30))),  # genuinely new
            (12, " ".join(f"n{i}" for i in range(30))),  # exact dup of 11
            (13, " ".join(f"m{i}" for i in range(30))),  # new
        ],
        "doc_id long, text string",
    )
    clean, counts = ingest_delta(spark, delta, root)
    kept = sorted(r["doc_id"] for r in clean.select("doc_id").collect())
    assert kept == [11, 13]
    assert counts["input"] == 4
    assert counts["exact_dedup"] == 3  # 12 removed within the batch
    assert counts["output"] == 2  # 10 removed against history

    # a SECOND ingest of the same new content dedups against the now-
    # appended index — exactly-once corpus growth
    delta2 = spark.createDataFrame(
        [(20, " ".join(f"n{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    clean2, counts2 = ingest_delta(spark, delta2, root)
    assert clean2.count() == 0
    assert counts2["output"] == 0


def test_stream_ingest_corpus_dedups_across_batches(spark, tmp_path):
    from hfp_loader_spark.operators.neardup import save_signature_index
    from hfp_loader_spark.streaming.jobs import stream_ingest_corpus
    from hfp_loader_spark.versioned import read_snapshot

    # seed the index with one history doc
    root = str(tmp_path / "sig_index")
    hist_text = " ".join(f"h{i}" for i in range(30))
    save_signature_index(
        spark,
        spark.createDataFrame([(1, hist_text)], "doc_id long, text string"),
        root,
        mode="overwrite",
    )

    # two source files → two micro-batches (maxFilesPerTrigger=1)
    src = tmp_path / "incoming"
    batch_a = spark.createDataFrame(
        [
            (10, " ".join(f"a{i}" for i in range(30))),  # new
            (11, hist_text),  # dup of pre-seeded history → dropped
        ],
        "doc_id long, text string",
    )
    batch_b = spark.createDataFrame(
        # dup of batch A's doc 10 → must be caught via the index
        [(20, " ".join(f"a{i}" for i in range(30))),
         (21, " ".join(f"b{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    # the file stream source reads FILES in a directory (no recursion):
    # stage each batch's single part file as src/fN.parquet
    import glob
    import os
    import shutil

    src.mkdir()
    for name, frame in (("f1", batch_a), ("f2", batch_b)):
        stage = tmp_path / f"_stage_{name}"
        frame.coalesce(1).write.parquet(str(stage))
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    reports = stream_ingest_corpus(spark, str(src), root)
    assert len(reports) == 2
    total_out = sum(r["output"] for r in reports.values())
    assert total_out == 2  # docs 10 and 21 only
    # the index now holds history + the two survivors
    assert read_snapshot(spark, root).select("doc_id").distinct().count() == 3


def test_ingest_delta_history_wins_even_with_lower_delta_id(spark, tmp_path):
    """A delta doc whose id sorts BELOW the colliding history doc must
    still lose — history is already part of the corpus (the fixed-column
    prune a review pass caught would have kept it)."""
    from hfp_loader_spark.operators.neardup import save_signature_index
    from hfp_loader_spark.pipeline import ingest_delta

    root = str(tmp_path / "sig_index")
    shared = " ".join(f"h{i}" for i in range(30))
    history = spark.createDataFrame(
        [(100, shared)], "doc_id long, text string"
    )
    save_signature_index(spark, history, root, mode="overwrite")

    delta = spark.createDataFrame(
        [(10, shared), (11, " ".join(f"x{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    clean, counts = ingest_delta(spark, delta, root)
    kept = sorted(r["doc_id"] for r in clean.select("doc_id").collect())
    assert kept == [11]
    assert counts["output"] == 1


def test_ingest_delta_bootstraps_fresh_index(spark, tmp_path):
    """The very first ingest against an uninitialized index root must not
    fail — it dedups within itself and its append creates version 1."""
    from hfp_loader_spark.pipeline import ingest_delta
    from hfp_loader_spark.versioned import latest_version

    root = str(tmp_path / "fresh_index")
    delta = spark.createDataFrame(
        [
            (1, " ".join(f"a{i}" for i in range(30))),
            (2, " ".join(f"a{i}" for i in range(30))),  # within-batch dup
            (3, " ".join(f"b{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    clean, counts = ingest_delta(spark, delta, root)
    kept = sorted(r["doc_id"] for r in clean.select("doc_id").collect())
    assert kept == [1, 3]
    assert counts["output"] == 2
    assert latest_version(spark, root) == 1

    # second batch dedups against the bootstrap-created index
    delta2 = spark.createDataFrame(
        [(10, " ".join(f"b{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    clean2, counts2 = ingest_delta(spark, delta2, root)
    assert clean2.count() == 0
    assert counts2["output"] == 0


def test_ingest_indexes_raw_text_so_pii_dups_are_caught(spark, tmp_path):
    """Signatures must be appended from the PRE-scrub text: a raw
    duplicate of a PII-bearing doc in a later batch must hit the index
    (post-scrub signatures would differ from the raw comparison side and
    let it slip through — exactly-once growth would break)."""
    from hfp_loader_spark.pipeline import ingest_delta

    root = str(tmp_path / "pii_index")
    pii_text = (
        "contact alice at alice@example.com about "
        + " ".join(f"p{i}" for i in range(30))
    )
    clean, counts = ingest_delta(
        spark,
        spark.createDataFrame([(1, pii_text)], "doc_id long, text string"),
        root,
    )
    assert counts["output"] == 1
    # the RETURNED doc is scrubbed…
    assert "alice@example.com" not in clean.collect()[0]["text"]

    # …but an identical RAW duplicate in the next batch is still caught
    clean2, counts2 = ingest_delta(
        spark,
        spark.createDataFrame([(2, pii_text)], "doc_id long, text string"),
        root,
    )
    assert counts2["output"] == 0
    assert clean2.count() == 0


def test_dedup_delta_index_width_mismatch_fails_fast(spark, tmp_path):
    from hfp_loader_spark.operators.neardup import (
        dedup_delta_against_index,
        save_signature_index,
    )
    import pytest

    root = str(tmp_path / "w32_index")
    docs = spark.createDataFrame(
        [(1, " ".join(f"h{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    save_signature_index(spark, docs, root, num_hashes=32, mode="overwrite")
    # the manifest signature_params stamp fires first (r8); the
    # data-level width probe remains as a backstop behind it
    with pytest.raises(ValueError, match="was built with"):
        dedup_delta_against_index(spark, docs, root, num_hashes=16)


def test_stream_ingest_corpus_bootstraps_fresh_root(spark, tmp_path):
    """Streaming ingest into a brand-new index root: the first
    micro-batch must not crash on the missing index; later batches dedup
    against the index the first batch created."""
    import glob
    import os
    import shutil

    from hfp_loader_spark.streaming.jobs import stream_ingest_corpus
    from hfp_loader_spark.versioned import read_snapshot

    root = str(tmp_path / "fresh_stream_index")
    src = tmp_path / "incoming"
    src.mkdir()
    batch_a = spark.createDataFrame(
        [(10, " ".join(f"a{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    batch_b = spark.createDataFrame(
        [(20, " ".join(f"a{i}" for i in range(30))),  # dup of batch A
         (21, " ".join(f"b{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    for name, frame in (("f1", batch_a), ("f2", batch_b)):
        stage = tmp_path / f"_stage_{name}"
        frame.coalesce(1).write.parquet(str(stage))
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    reports = stream_ingest_corpus(spark, str(src), root)
    assert len(reports) == 2
    assert sum(r["output"] for r in reports.values()) == 2  # 10 and 21
    assert read_snapshot(spark, root).select("doc_id").distinct().count() == 2


def test_prepare_corpus_consumes_checkpointed_boundary(spark, sf_dir):
    """The returned frame must read from the last persisted stage
    boundary (InMemoryTableScan in the plan), not re-run the whole
    gate/dedup chain — the O(stages²) recompute fix."""
    docs = load_table(spark, sf_dir, "documents")
    clean, _, _rel = prepare_corpus(spark, docs)
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    # and the cached boundary means the scan chain is NOT in the plan
    assert "minhash" not in plan.lower()


def test_prepare_corpus_release_handle_clears_cache(spark, sf_dir):
    """The third return value must unpersist the final cached stage
    boundary — without it every prepare_corpus call leaked one
    MEMORY_AND_DISK frame until session end (the ingest-loop leak class
    ingest_delta already guards against)."""
    spark.catalog.clearCache()
    docs = load_table(spark, sf_dir, "documents")
    clean, _, release = prepare_corpus(spark, docs)
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    assert not cache_mgr.isEmpty()  # final boundary is cached for the write
    release()
    assert cache_mgr.isEmpty()  # no cached frame survives the release


def test_pipeline_remove_span_stage_trims_shared_spans(spark):
    """With remove_span_n set, a duplicated 8-gram shared by two
    SURVIVING documents must be excised from the non-canonical one,
    rows must not be dropped, and the stage must be recorded."""
    span = " ".join(f"s{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, span + " " + " ".join(f"a{i}" for i in range(20)), "src0"),
            (2, " ".join(f"b{i}" for i in range(20)) + " " + span, "src0"),
            (3, " ".join(f"c{i}" for i in range(28)), "src1"),
        ],
        "doc_id long, text string, source string",
    )
    clean, counts, release = prepare_corpus(
        spark, docs, config=PipelineConfig(remove_span_n=8)
    )
    out = {r["doc_id"]: r["text"] for r in clean.collect()}
    release()
    assert list(counts) == [
        "input", "quality", "exact_dedup", "near_dedup",
        "remove_dup_spans", "output",
    ]
    assert counts["remove_dup_spans"] == counts["near_dedup"]  # no rows drop
    assert sorted(out) == [1, 2, 3]
    assert span in out[1]          # canonical (min doc_id) keeps the span
    assert span not in out[2]      # non-canonical occurrence excised
    assert out[2] == " ".join(f"b{i}" for i in range(20))
    assert out[3] == " ".join(f"c{i}" for i in range(28))


def test_pipeline_quality_keeper_keeps_best_duplicate(spark):
    """keeper='quality': the cluster survivor is the highest-quality
    member, not the min id — and the stage accounting is unchanged."""
    # doc 2 is a longer (higher length-score) near-dup of doc 1: same
    # content plus a tail, Jaccard above the 0.8 threshold
    base = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, base, "src0"),
            (2, base + " extra tail words", "src0"),
            (3, " ".join(f"u{i}" for i in range(30)), "src1"),
        ],
        "doc_id long, text string, source string",
    )
    from hfp_loader_spark.pipeline import PipelineConfig, prepare_corpus

    clean_q, counts_q, rel_q = prepare_corpus(
        spark, docs, config=PipelineConfig(keeper="quality")
    )
    kept_q = sorted(r["doc_id"] for r in clean_q.select("doc_id").collect())
    rel_q()
    clean_m, counts_m, rel_m = prepare_corpus(spark, docs)
    kept_m = sorted(r["doc_id"] for r in clean_m.select("doc_id").collect())
    rel_m()
    assert kept_m == [1, 3]   # canonical min-id keeper
    assert kept_q == [2, 3]   # quality keeper prefers the longer doc
    assert counts_q["near_dedup"] == counts_m["near_dedup"] == 2


def test_pipeline_c4_and_gopher_stages(spark):
    """Opt-in C4 line cleaning runs FIRST (pages trimmed, brace pages
    dropped, later stages see cleaned text) and the Gopher hard rules
    fold into the quality gate; both record stage counts and keep the
    monotone-shrinkage invariant."""
    # page-unique vocabulary (the repetition gate flags templated
    # pages); one stopword per line gives ≥2 distinct for Gopher
    stops = ["the", "with", "that", "of", "and", "have"]
    page = "\n".join(
        [
            f"{stops[i]} alpha{i} bravo{i} charlie{i} delta{i} echo{i} "
            f"foxtrot{i} golf{i} hotel{i}."
            for i in range(6)
        ]
        + ["no terminal punctuation line"]
    )
    nostop = "\n".join(
        [
            f"query{i} scan{i} merge{i} row{i} data{i} line{i} "
            f"value{i} table{i} now{i}."
            for i in range(6)
        ]
    )
    rows = [
        (1, page, "src0"),
        (2, page + "\nint main() { return 0; }", "src0"),  # brace → dropped
        # passes C4 (6 kept lines) but has NO stopwords → gopher drop
        (3, nostop, "src0"),
        # too few kept lines → C4 page drop
        (4, "Short page.\nonly one terminal sentence lives here.", "src0"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    clean, counts, release = prepare_corpus(
        spark,
        docs,
        config=PipelineConfig(
            min_quality=0.0,
            c4_clean=True,
            gopher_rules=True,
        ),
    )
    try:
        assert list(counts)[:3] == ["input", "c4_clean", "quality"]
        vals = list(counts.values())
        assert all(a >= b for a, b in zip(vals, vals[1:])), counts
        assert counts["input"] == 4
        assert counts["c4_clean"] == 2      # brace + short page dropped
        assert counts["quality"] == 1       # stopword-less page dropped
        out = clean.collect()
        assert [r["doc_id"] for r in out] == [1]
        # the surviving text is the CLEANED page: the punctuation-less
        # line is gone, the six good lines remain
        assert out[0]["text"].count("\n") == 5
        assert "no terminal punctuation" not in out[0]["text"]
    finally:
        release()


def test_pipeline_c4_off_by_default_single_line_corpus(spark, sf_dir):
    """The default config must NOT run C4 on the single-line synthetic
    corpus (every line lacks terminal punctuation — the stage would
    erase the corpus); defaults keep the historical stage list."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    clean, counts, release = prepare_corpus(spark, docs)
    try:
        assert "c4_clean" not in counts
        assert counts["output"] > 0
    finally:
        release()


def test_pipeline_ccnet_stage_gates_on_lm_perplexity(spark):
    """The opt-in CCNet stage keeps documents fluent under the trusted
    LM and drops off-domain + unscorable (<2 tokens) ones, recording its
    stage count between exact_dedup and near_dedup; off by default."""
    # all-distinct tokens per doc (the repetition gate must NOT fire);
    # the LM corpus repeats the fluent sentences so their bucket bigrams
    # are trained (measured ce ≈ 2.0/2.2) while the junk doc's are not
    # (ce ≈ 4.25 — unseen pairs cost at least the smoothing floor)
    sents = [" ".join(f"w{i}x{j}" for j in range(8)) for i in range(6)]
    rows = [
        (1, " ".join(sents), "src0"),
        (2, " ".join(sents[::-1]), "src0"),  # fluent, not an exact dup
        (3, " ".join(f"q{i}z{j}" for i in range(6) for j in range(8)), "src0"),
        (4, "solo", "src0"),  # unscorable: 1 token
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    lm = spark.createDataFrame(
        [(100, (" ".join(sents) + " ") * 5)], "doc_id long, text string"
    )
    clean, counts, release = prepare_corpus(
        spark,
        docs,
        config=PipelineConfig(min_quality=0.0, ccnet_max_ce=3.5),
        ccnet_lm=lm,
    )
    try:
        keys = list(counts)
        assert keys.index("ccnet_perplexity") == keys.index("exact_dedup") + 1
        assert counts["ccnet_perplexity"] == 2
        assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
        vals = list(counts.values())
        assert all(a >= b for a, b in zip(vals, vals[1:])), counts
    finally:
        release()

    # off by default: no ccnet stage without both the LM and the cutoff
    _, counts2, release2 = prepare_corpus(
        spark, docs, config=PipelineConfig(min_quality=0.0)
    )
    try:
        assert "ccnet_perplexity" not in counts2
    finally:
        release2()


def test_pipeline_crossdoc_line_dedup_stage(spark):
    """crossdoc_line_dedup excises every later occurrence of a line
    corpus-wide, drops fully-duplicated documents, and later stages see
    the deduplicated text."""
    from hfp_loader_spark.pipeline import PipelineConfig, prepare_corpus

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india."
    uniq = [
        f"unique{i} words{i} here{i} fill{i} the{i} line{i} out{i} ok{i}."
        for i in range(4)
    ]
    rows = [
        # doc 1 owns the shared line (first occurrence by (id, pos))
        (1, shared + "\n" + uniq[0] + "\n" + uniq[1], "src0"),
        # doc 2 repeats it → only its unique line survives
        (2, shared + "\n" + uniq[2], "src0"),
        # doc 3 is ONLY the shared line → fully duplicated → dropped
        (3, shared, "src0"),
        (4, uniq[3], "src0"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    clean, counts, release = prepare_corpus(
        spark,
        docs,
        config=PipelineConfig(min_quality=0.0, crossdoc_line_dedup=True),
    )
    try:
        assert list(counts)[:2] == ["input", "crossdoc_line_dedup"]
        assert counts["input"] == 4
        assert counts["crossdoc_line_dedup"] == 3  # doc 3 dropped
        out = {r["doc_id"]: r["text"] for r in clean.collect()}
        assert shared in out[1]
        assert shared not in out[2] and uniq[2].split()[0] in out[2]
        assert 3 not in out
    finally:
        release()
