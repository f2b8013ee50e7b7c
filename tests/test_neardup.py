"""Near-dup operator properties: LSH recall, SimHash locality.

The MinHash+LSH and SimHash catalog entries are rows-only at the driver
gate (engine-specific hash functions); these tests supply the missing
correctness signal by comparing them against the exact oracle-checked
Jaccard join on the same data.
"""

from __future__ import annotations

import pytest

from hfp_loader_spark.operators.neardup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    shingle_docs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from hfp_loader_spark.plans.catalog import load_table

THRESHOLD = 0.8


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def exact_pairs(docs):
    shingled = shingle_docs(docs, "doc_id", "text")
    rows = jaccard_pairs(shingled, THRESHOLD).collect()
    return {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}


def test_exact_jaccard_finds_planted_neardups(exact_pairs):
    assert len(exact_pairs) > 0
    assert all(j >= THRESHOLD for j in exact_pairs.values())


def test_minhash_lsh_recall_and_precision(docs, exact_pairs):
    """LSH + exact verification must reproduce the exact join at high
    similarity: verification guarantees precision = 1; banding (b=8, r=4:
    P[candidate] = 1-(1-s^4)^8 ≈ 0.9998 at s=0.8) makes missing a planted
    pair overwhelmingly unlikely."""
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", THRESHOLD
        ).collect()
    }
    assert set(got) <= set(exact_pairs)  # precision 1 (exact-verified)
    recall = len(got) / len(exact_pairs)
    assert recall >= 0.9
    for pair, j in got.items():
        assert j == exact_pairs[pair]


def test_lsh_candidates_far_below_all_pairs(docs):
    """The scale property: candidate count ≪ n(n-1)/2 (never all-pairs)."""
    shingled = shingle_docs(docs, "doc_id", "text")
    n = shingled.count()
    cands = lsh_candidate_pairs(minhash_signatures(shingled)).count()
    assert cands < 0.05 * n * (n - 1) / 2


def test_simhash_locality(docs, exact_pairs):
    """Near-identical documents (exact Jaccard ≥ 0.8) must land within the
    Hamming radius; the pair search must find a superset-limited, small
    candidate set rather than all pairs."""
    fps = simhash_fingerprints(docs, "doc_id", "text")
    near = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(fps, max_hamming=3).collect()
    }
    n = fps.count()
    assert len(near) < 0.05 * n * (n - 1) / 2
    # most planted near-dups should be within the radius (SimHash is a
    # weaker signal than MinHash; allow some misses but not a no-op)
    hit = sum(1 for p in exact_pairs if p in near)
    assert hit / len(exact_pairs) >= 0.5


def test_fuzzy_pairs_blocked_exact_recall(spark):
    """Pigeonhole blocking must find every ≤1-substitution pair that
    brute force finds — and nothing else (insert/delete pairs have
    different lengths and are out of contract)."""
    from hfp_loader_spark.operators.neardup import fuzzy_pairs_blocked

    rows = [
        (1, "abcdef"),
        (2, "abcdeX"),   # sub in 2nd half of 1
        (3, "Xbcdef"),   # sub in 1st half of 1
        (4, "abcdXX"),   # 2 subs from 1 → excluded
        (5, "abcde"),    # deletion of 1 → different length, excluded
        (6, "zzzzzz"),   # unrelated
    ]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in fuzzy_pairs_blocked(df, "id", "name", max_subs=1).collect()
    )
    # (2,4) also matches: "abcdeX"/"abcdXX" differ only at position 5
    assert got == [(1, 2), (1, 3), (2, 4)]


def test_fuzzy_pairs_blocked_two_subs(spark):
    from hfp_loader_spark.operators.neardup import fuzzy_pairs_blocked

    rows = [(1, "abcdefghi"), (2, "abXdefgXi"), (3, "XbXdefgXi")]
    df = spark.createDataFrame(rows, ["id", "name"])
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in fuzzy_pairs_blocked(df, "id", "name", max_subs=2).collect()
    )
    # 1↔2: 2 subs ✓; 2↔3: 1 sub ✓; 1↔3: 3 subs ✗
    assert got == [(1, 2), (2, 3)]


def test_jaccard_doc_freq_cap_bounds_stop_shingle_blowup(spark):
    """VERDICT r3 #7: a stop-shingle shared by every doc must NOT produce
    an all-pairs candidate set when ``max_doc_freq`` is set.  Synthetic
    corpus: 40 docs all sharing one boilerplate sentence (the stop
    shingles) plus unique content; two planted near-dup pairs."""
    boiler = "subscribe to our newsletter for updates today"
    rows = []
    for i in range(40):
        uniq = " ".join(f"w{i}x{j} tok{i * 7 + j} z{i}" for j in range(6))
        rows.append((i, f"{boiler} {uniq}"))
    # planted near-dups: docs 100/101 and 102/103 share all content
    rows += [
        (100, f"{boiler} alpha beta gamma delta epsilon zeta eta theta"),
        (101, f"{boiler} alpha beta gamma delta epsilon zeta eta theta"),
        (102, f"{boiler} one two three four five six seven eight nine"),
        (103, f"{boiler} one two three four five six seven eight nine"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    shingled = shingle_docs(docs, "doc_id", "text")

    # Cap at 8: the boilerplate shingles (df=44) are dropped, the unique
    # content shingles (df<=2) survive — the planted pairs must still be
    # found, at J=1.0 over the retained shingle space.
    capped = jaccard_pairs(shingled, threshold=0.8, max_doc_freq=8)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in capped.collect()}
    assert got == {(100, 101): 1.0, (102, 103): 1.0}

    # And the candidate join itself is bounded: count pairs sharing ANY
    # retained shingle (pre-threshold) — without the cap every one of the
    # C(44,2)=946 pairs is a candidate via the boilerplate.
    uncapped_candidates = (
        jaccard_pairs(shingled, threshold=0.0).count()
    )
    capped_candidates = (
        jaccard_pairs(shingled, threshold=0.0, max_doc_freq=8).count()
    )
    assert uncapped_candidates == 946  # all-pairs blowup, the failure mode
    assert capped_candidates == 2  # only genuinely similar pairs remain


def test_bigram_surprisal_properties(spark, sf_dir):
    """Surprisal invariants: non-negative, and a doc of pure repeated
    bigrams scores lower than the corpus median (predictability)."""
    from pyspark.sql import functions as F

    from hfp_loader_spark.plans.catalog import REGISTRY

    df = REGISTRY["text_bigram_surprisal"].builder(spark, sf_dir)
    stats = df.agg(
        F.min("avg_neg_logp2").alias("lo"),
        F.expr("percentile(avg_neg_logp2, 0.5)").alias("med"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert stats["n"] > 0
    assert stats["lo"] >= 0.0
    assert stats["med"] > stats["lo"]


def test_decontaminate_flags_only_overlapping_docs(spark):
    from hfp_loader_spark.operators.neardup import decontaminate

    bench_text = "alpha bravo charlie delta echo foxtrot golf hotel india"
    corpus = spark.createDataFrame(
        [
            # shares the full 8-gram prefix with the benchmark doc
            (1, "alpha bravo charlie delta echo foxtrot golf hotel zulu"),
            # no shared 8-gram (one word differs inside every window)
            (2, "alpha bravo charlie delta echo foxtrot golf kilo india"),
            (3, "totally unrelated text with nothing in common at all here"),
        ],
        "doc_id int, text string",
    )
    heldout = spark.createDataFrame([(100, bench_text)], "doc_id int, text string")
    rows = {
        r["doc_id"]: r
        for r in decontaminate(corpus, heldout, "doc_id", "text", n=8).collect()
    }
    assert set(rows) == {1}
    assert rows[1]["n_matched_spans"] == 1  # exactly the shared prefix 8-gram
    assert rows[1]["n_bench_docs"] == 1


def test_decontaminate_benchmark_side_broadcasts(spark, sf_dir):
    """The corpus-side flag pass must be a broadcast hash join — a shuffled
    corpus-shingle exchange is the at-scale failure mode."""
    from hfp_loader_spark.operators.neardup import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    df = decontaminate(
        docs.where("doc_id % 17 != 0"),
        docs.where("doc_id % 17 = 0"),
        "doc_id",
        "text",
        n=8,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_gated_decontaminate_matches_exact(spark, sf_dir):
    """Identity contract: the Bloom gate has no false negatives and
    phase 2 re-checks exactly, so the two-phase result must EQUAL plain
    decontaminate row-for-row — and phase 1 must gate map-side (chained
    broadcast left-semi joins against the bit-set frame), shuffling only
    surviving doc ids, never the (doc, shingle) pair set."""
    from hfp_loader_spark.operators.neardup import (
        decontaminate,
        decontaminate_bloom_gated,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where("doc_id % 17 != 0")
    heldout = docs.where("doc_id % 17 = 0")
    gated = decontaminate_bloom_gated(
        corpus, heldout, "doc_id", "text", n=8, num_bits=1 << 14
    )
    exact = decontaminate(corpus, heldout, "doc_id", "text", n=8)
    assert sorted(map(tuple, gated.collect())) == sorted(
        map(tuple, exact.collect())
    )
    import re

    plan = gated._jdf.queryExecution().optimizedPlan().toString()
    # the k-bit verdict is a chain of LeftSemi joins on the probe-bit
    # equality — all map-side once the bit set broadcasts
    assert plan.count("LeftSemi") >= 5
    # phase 1 must NOT aggregate the full (doc_id, shingle) pair set —
    # the old exploded-probe gate grouped by exactly those two keys to
    # sum bit hits, shuffling every corpus shingle; the semi-join gate's
    # only phase-1 aggregate is the survivor doc_id distinct.
    assert not re.search(r"Aggregate \[doc_id#\d+L?, _sh#\d+L?\]", plan)


def test_incremental_signature_index_matches_full_recompute(spark, sf_dir, tmp_path):
    """Index 80% of the corpus, then dedup the 20% delta against the
    stored signatures: candidate pairs touching the delta must equal the
    delta-touching subset of a full-corpus LSH run (same hashes, same
    bands — the index changes WHERE signatures come from, not what they
    are)."""
    from pyspark.sql import functions as F

    from hfp_loader_spark.operators.neardup import (
        dedup_delta_against_index,
        lsh_candidate_pairs,
        minhash_signatures,
        save_signature_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = docs.where("doc_id % 5 != 0")
    delta = docs.where("doc_id % 5 = 0")
    root = str(tmp_path / "sig_index")
    save_signature_index(spark, hist, root)

    got = sorted(
        map(tuple, dedup_delta_against_index(spark, delta, root).collect())
    )

    full = lsh_candidate_pairs(minhash_signatures(shingle_docs(docs, "doc_id", "text")))
    delta_ids = {r["doc_id"] for r in delta.select("doc_id").collect()}
    want = sorted(
        (r["doc_a"], r["doc_b"])
        for r in full.collect()
        if r["doc_a"] in delta_ids or r["doc_b"] in delta_ids
    )
    assert got == want
    assert len(got) > 0  # the synthetic corpus plants near-dups across the split


def test_signature_index_append_is_incremental(spark, sf_dir, tmp_path):
    """A second ingest appends its signatures (O(1) commit): the index
    then serves both batches' signatures without re-shingling batch 1."""
    from hfp_loader_spark.operators.neardup import save_signature_index
    from hfp_loader_spark.versioned import read_snapshot

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b1 = docs.where("doc_id % 2 = 0")
    b2 = docs.where("doc_id % 2 = 1")
    root = str(tmp_path / "sig_index2")
    v1 = save_signature_index(spark, b1, root)
    v2 = save_signature_index(spark, b2, root)
    assert v2 == v1 + 1
    assert read_snapshot(spark, root, v1).count() == b1.count()
    assert read_snapshot(spark, root, v2).count() == docs.count()


def test_fuzzy_pairs_wildcard_handles_empty_and_short_keys(spark):
    """Equal-length contract must hold at the degenerate lengths: empty
    strings pair only with empty strings, 1-char values only with
    1-char values (regression: sequence(1,0) is DESCENDING [1,0] and
    fabricated variants for empty strings)."""
    from hfp_loader_spark.operators.neardup import fuzzy_pairs_blocked

    df = spark.createDataFrame(
        [(1, ""), (2, ""), (3, "x"), (4, "y"), (5, "xy")],
        "id int, v string",
    )
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in fuzzy_pairs_blocked(df, "id", "v", max_subs=1).collect()
    )
    # ('','') lev 0; ('x','y') lev 1; nothing crosses lengths
    assert got == [(1, 2), (3, 4)]


def test_signature_index_stamps_and_rejects_mismatched_params(
    spark, sf_dir, tmp_path
):
    """Every index commit records signature_params (text representation,
    shingle_n, num_hashes); appending or delta-deduping with DIFFERENT
    params — or against an unstamped legacy index — must fail fast
    instead of silently under-matching near-dups."""
    import pytest

    from hfp_loader_spark.operators.neardup import (
        dedup_delta_against_index,
        index_signature_params,
        save_signature_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = docs.where("doc_id % 5 != 0").limit(40)
    delta = docs.where("doc_id % 5 = 0").limit(10)

    root = str(tmp_path / "sig_index")
    save_signature_index(spark, hist, root)
    assert index_signature_params(spark, root) == {
        "text_representation": "raw",
        "shingle_n": 3,
        "num_hashes": 32,
    }
    # matching params: append and delta-dedup both proceed
    save_signature_index(spark, delta, root)
    dedup_delta_against_index(spark, delta, root).unpersist()

    # any divergent parameter fails fast on append AND on read
    with pytest.raises(ValueError, match="was built with"):
        save_signature_index(spark, delta, root, shingle_n=5)
    with pytest.raises(ValueError, match="was built with"):
        save_signature_index(
            spark, delta, root, text_representation="scrubbed"
        )
    with pytest.raises(ValueError, match="was built with"):
        dedup_delta_against_index(spark, delta, root, num_hashes=16)

    # a legacy index with commits but NO stamp is refused, not guessed at
    from hfp_loader_spark.operators.neardup import (
        minhash_signatures,
        shingle_docs,
    )
    from hfp_loader_spark.versioned import commit_snapshot

    legacy = str(tmp_path / "legacy_index")
    commit_snapshot(
        spark,
        minhash_signatures(shingle_docs(hist, "doc_id", "text")),
        legacy,
    )
    with pytest.raises(ValueError, match="no signature_params stamp"):
        dedup_delta_against_index(spark, delta, legacy)
    with pytest.raises(ValueError, match="no signature_params stamp"):
        save_signature_index(spark, delta, legacy)


def test_restamp_signature_index_migrates_legacy(spark, sf_dir, tmp_path):
    """restamp_signature_index is the legacy-index migration path the
    stamp-check error points at (ADVICE r8): after an out-of-band
    verified restamp, append and delta-dedup accept the index; a wrong
    claimed width, a missing index, and an already-stamped index are
    all refused."""
    import pytest

    from hfp_loader_spark.operators.neardup import (
        dedup_delta_against_index,
        index_signature_params,
        minhash_signatures,
        restamp_signature_index,
        save_signature_index,
        shingle_docs,
    )
    from hfp_loader_spark.versioned import commit_snapshot, read_snapshot

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hist = docs.where("doc_id % 5 != 0").limit(30)
    delta = docs.where("doc_id % 5 = 0").limit(8)

    # a pre-marker index: data committed with no signature_params meta
    legacy = str(tmp_path / "legacy_restamp")
    commit_snapshot(
        spark,
        minhash_signatures(shingle_docs(hist, "doc_id", "text"), 32),
        legacy,
    )
    assert index_signature_params(spark, legacy) is None
    with pytest.raises(ValueError, match="no signature_params stamp"):
        dedup_delta_against_index(spark, delta, legacy)

    # claiming a width the data contradicts is caught from the data
    with pytest.raises(ValueError, match="contradicts the claim"):
        restamp_signature_index(spark, legacy, "raw", 3, 16)

    n_before = read_snapshot(spark, legacy).count()
    v = restamp_signature_index(spark, legacy, "raw", 3, 32)
    assert v == 2
    assert index_signature_params(spark, legacy) == {
        "text_representation": "raw",
        "shingle_n": 3,
        "num_hashes": 32,
    }
    # manifest-only: the restamp appended zero data rows
    assert read_snapshot(spark, legacy).count() == n_before

    # and the index is now a first-class citizen of the stamped world
    dedup_delta_against_index(spark, delta, legacy).unpersist()
    save_signature_index(spark, delta, legacy)

    # restamping a stamped index is refused in both flavours
    with pytest.raises(ValueError, match="already carries exactly"):
        restamp_signature_index(spark, legacy, "raw", 3, 32)
    with pytest.raises(ValueError, match="must be rebuilt"):
        restamp_signature_index(spark, legacy, "scrubbed", 3, 32)

    with pytest.raises(FileNotFoundError, match="nothing to restamp"):
        restamp_signature_index(
            spark, str(tmp_path / "nowhere"), "raw", 3, 32
        )


def test_ensure_parallelism_detects_tuned_file_packing(spark, tmp_path):
    """With spark.sql.files.openCostInBytes tuned below the default,
    Spark bin-packs many small files into fewer partitions than files —
    the fast file-count path must NOT conclude 'enough partitions' from
    the file count alone (ADVICE r8); the conf gate falls back to the
    exact probe and the repartition fires."""
    from hfp_loader_spark.operators.neardup import ensure_parallelism

    target = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "many_small")
    (
        spark.range(200)
        .selectExpr("id as doc_id", "cast(id as string) as text")
        .repartition(2 * target)
        .write.parquet(p)
    )
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) >= 2 * target

    # default configs: fast path, and the lower bound genuinely holds
    assert ensure_parallelism(df, "doc_id") is df
    assert df.rdd.getNumPartitions() >= target

    conf = spark.conf
    try:
        conf.set("spark.sql.files.openCostInBytes", "0")
        conf.set("spark.sql.files.minPartitionNum", "1")
        packed = spark.read.parquet(p)
        assert packed.rdd.getNumPartitions() < target  # bin-packed
        out = ensure_parallelism(packed, "doc_id")
        assert out.rdd.getNumPartitions() >= target
    finally:
        conf.unset("spark.sql.files.openCostInBytes")
        conf.unset("spark.sql.files.minPartitionNum")


def test_cross_source_overlap_planted_matrix(spark):
    """Planted three sources: A and B share exactly one trigram, C has
    too few tokens for any shingle — its pairs stay in the matrix with
    n 0 and NULL overlap (0/0 unmeasured); the A-B overlap coefficient
    is shared / min(|A|,|B|) exactly."""
    from hfp_loader_spark.operators.neardup import cross_source_overlap

    rows = [
        (1, "one two three four", "A"),    # shingles: {one two three, two three four}
        (2, "one two three", "B"),         # {one two three}
        (3, "nine eight seven six", "B"),  # {nine eight seven, eight seven six}
        (4, "tiny", "C"),                  # none
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_shared"], r["n_a"], r["n_b"], r["overlap"]
        )
        for r in cross_source_overlap(df).collect()
    }
    assert got == {
        ("A", "B"): (1, 2, 3, round(1 / 2, 4)),
        ("A", "C"): (0, 2, 0, None),
        ("B", "C"): (0, 3, 0, None),
    }


def test_containment_asymmetry_catches_quoted_subset(spark):
    """A short doc fully quoted inside a long one: containment(short →
    long) = 1.0 while Jaccard stays far below any dedup threshold —
    and the reverse direction is correctly weak."""
    from hfp_loader_spark.operators.neardup import (
        containment_pairs,
        jaccard_pairs,
        shingle_docs,
    )

    short = "alpha beta gamma delta epsilon"
    longd = short + " " + " ".join(f"w{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, short), (2, longd)], "doc_id long, text string"
    )
    sh = shingle_docs(df, "doc_id", "text")
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in containment_pairs(sh, threshold=0.0).collect()
    }
    assert got[(1, 2)] == 1.0          # short is fully contained
    assert got[(2, 1)] < 0.1           # long is barely contained in short
    # Jaccard on the same pair is far below a 0.8 dedup threshold
    assert jaccard_pairs(sh, threshold=0.8).count() == 0


def test_weighted_minhash_identical_and_disjoint_sources(spark):
    """Identical sources must sketch to est_wj = exact_wj = 1; disjoint
    vocabularies to 0/0 — and the estimate sits within binomial noise
    of the exact value on a partial overlap."""
    from hfp_loader_spark.operators.neardup import weighted_minhash_matrix

    rows = [
        (1, "alpha beta gamma alpha", "s1"),
        (2, "alpha beta gamma alpha", "s2"),      # mirror of s1
        (3, "delta epsilon zeta eta", "s3"),       # disjoint from s1/s2
        (4, "alpha beta delta delta", "s4"),       # partial overlap
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, source string")
    got = {
        (r["source_a"], r["source_b"]): (r["est_wj"], r["exact_wj"])
        for r in weighted_minhash_matrix(df, num_hashes=16).collect()
    }
    assert got[("s1", "s2")] == (1.0, 1.0)
    assert got[("s1", "s3")] == (0.0, 0.0)
    est, exact = got[("s1", "s4")]
    # s1: alpha 2, beta 1, gamma 1 (T=4); s4: alpha 1, beta 1, delta 2
    # (T=4); smin = 1+1 = 2 -> exact = 2/(4+4-2) = 1/3
    assert exact == 0.333333
    assert abs(est - exact) <= 0.35  # 16-slot binomial noise bound


def test_weighted_minhash_tokenless_sources_present(spark):
    """ADVICE r10 #4: the matrix is built from DISTINCT sources (like the
    exact sibling), so a source whose documents tokenize to nothing still
    appears — 0.0/0.0 against a non-empty source (the true weighted
    Jaccard of an empty bag) and NULL/NULL when BOTH sides are empty."""
    from hfp_loader_spark.operators.neardup import (
        weighted_jaccard_matrix,
        weighted_minhash_matrix,
    )

    rows = [
        (1, "alpha beta gamma", "s1"),
        (2, "", "s2"),          # tokenless
        (3, None, "s3"),        # tokenless (NULL text)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, source string")
    got = {
        (r["source_a"], r["source_b"]): (r["est_wj"], r["exact_wj"])
        for r in weighted_minhash_matrix(df, num_hashes=16).collect()
    }
    assert set(got) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert got[("s1", "s2")] == (0.0, 0.0)
    assert got[("s1", "s3")] == (0.0, 0.0)
    assert got[("s2", "s3")] == (None, None)
    # parity with the exact sibling's source enumeration
    wj = {
        (r["source_a"], r["source_b"]): r["weighted_jaccard"]
        for r in weighted_jaccard_matrix(df).collect()
    }
    assert set(wj) == set(got)
    assert wj[("s1", "s2")] == 0.0 and wj[("s2", "s3")] is None


def test_minhash_lsh_discovers_full_exact_pair_set(spark, sf_dir):
    """The r11 full-oracle upgrade of dedup_minhash_lsh rests on a
    measured property: the xxhash64 banding discovers EVERY pair with
    exact Jaccard ≥ 0.8 on the gate corpora (recall 1.0), so the
    verified output equals the SQL-expressible exact pair set.  Locked
    here against both the md5-family twin and the all-pairs join; if a
    hash/band/param change ever breaks the equality, this fails before
    the driver gate does."""
    from hfp_loader_spark.plans.catalog import REGISTRY

    lsh = sorted(
        map(tuple, REGISTRY["dedup_minhash_lsh"].builder(spark, sf_dir).collect())
    )
    twin = sorted(
        map(
            tuple,
            REGISTRY["dedup_minhash_lsh_exact"].builder(spark, sf_dir).collect(),
        )
    )
    allp = sorted(
        map(tuple, REGISTRY["dedup_jaccard_pairs"].builder(spark, sf_dir).collect())
    )
    assert lsh == twin == allp and lsh  # non-empty at every gate sf
