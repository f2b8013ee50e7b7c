"""Text-analysis operators for a large-scale training-data pipeline.

All pure Catalyst expressions (zero Python UDFs): tokenization, shingling,
language-ID heuristic, quality scoring, token counting, and document
fingerprinting over a ``text`` column.  Extension tier — the reference has
no string operators at all (SURVEY §2.8: "no string manipulation … anywhere
in the reference"); this is the §2.11 text-analysis surface.

Scale notes:
- every helper is a narrow projection (no shuffle); aggregations are left to
  the caller so the single shuffle happens once, after all per-row work;
- ``explode`` of token arrays multiplies rows ~100× — do it *after* any
  per-document filter, and aggregate immediately (partial aggregation keeps
  the shuffle small);
- fingerprints are fixed-width (md5 / xxhash64), so dedup group-bys shuffle
  16-byte keys, not document bodies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[^a-z0-9]+"

# Tiny per-language stopword lexicons for the n-gram/stopword language-ID
# heuristic.  Deliberately small: the heuristic is the operator; real
# deployments swap in fuller lexicons via the ``lexicons`` parameter.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "value", "table"),
    "fr": ("le", "la", "et", "de", "un", "une", "est", "dans"),
    "es": ("el", "la", "y", "de", "un", "una", "es", "en"),
    "de": ("der", "die", "das", "und", "ein", "ist", "von", "mit"),
}


def tokens(text: Column) -> Column:
    """Lowercased word tokens with empties removed (whitespace + regex)."""
    return F.filter(
        F.split(F.lower(text), TOKEN_RE), lambda t: F.length(t) > 0
    )


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a token array (MinHash/Jaccard input).

    Built by zipping the token array with its own shifted slices, with
    the token array LET-BOUND once via the one-element ``transform``
    trick: the zip chain references the array 3(n-1)+1 times (each level
    slices it and takes its size), and Spark evaluates interpreted
    expression trees without common-subexpression elimination — unbound,
    the TOKENIZER re-runs per reference, ~22× per row at n=8 (measured
    ~8× wall on the shingle stage).  Bound, every reference is a lambda
    variable read and the regex split happens exactly once per row.
    (An index-based ``transform(sequence(...), i -> element_at(toks,
    i+k))`` has the same inlining problem per ELEMENT — far worse.)

    ``zip_with`` pads the shorter side with NULL and ``concat`` propagates
    it, so the padded tail drops in the NULL filter; documents shorter
    than ``n`` tokens yield an empty array.
    """

    def build(t: Column) -> Column:
        out = t
        for k in range(1, n):
            shifted = F.slice(t, k + 1, F.greatest(F.size(t) - k, F.lit(0)))
            out = F.zip_with(
                out, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
            )
        return F.array_distinct(F.filter(out, lambda x: x.isNotNull()))

    return F.element_at(F.transform(F.array(toks), build), 1)


def token_count(text: Column) -> Column:
    """Token count (whitespace + regex tokenizer) — BPE-ish proxy."""
    return F.size(tokens(text))


def lang_scores(toks: Column, lexicons: dict[str, tuple[str, ...]] | None = None) -> dict[str, Column]:
    """Per-language stopword-hit counts over a token array."""
    lex = lexicons or LANG_LEXICONS
    return {
        lang: F.size(
            F.filter(toks, lambda t: t.isin(*[F.lit(w) for w in words]))
        )
        for lang, words in lex.items()
    }


def predict_lang(toks: Column, lexicons: dict[str, tuple[str, ...]] | None = None) -> Column:
    """argmax language by stopword hits, deterministic tiebreak by name;
    no hits at all → 'und' (undetermined)."""
    lex = lexicons or LANG_LEXICONS
    scores = lang_scores(toks, lex)
    # struct sort: (-hits, lang) ascending → first element is the argmax.
    pairs = F.array(
        *[
            F.struct((-scores[lang]).alias("neg"), F.lit(lang).alias("lang"))
            for lang in sorted(lex)
        ]
    )
    best = F.array_sort(pairs).getItem(0)
    return F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und"))


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality features: length, token stats, ratios."""
    toks = tokens(text)
    n_tok = F.size(toks)
    n_chars = F.length(text)
    mean_tok_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / n_tok,
    ).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(F.lower(text), "[^a-z]", "")) / n_chars,
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0,
        F.size(
            F.filter(
                toks,
                lambda t: t.isin(*[F.lit(w) for w in LANG_LEXICONS["en"]]),
            )
        )
        / n_tok,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "mean_token_len": mean_tok_len,
        "alpha_ratio": alpha_ratio,
        "stopword_ratio": stop_ratio,
    }


def quality_score(text: Column, round_to: int = 6) -> Column:
    """Scalar quality score in [0, 1]: length + word-shape + stopword mix.

    The formula is arbitrary-but-deterministic; what matters at scale is
    that it is a single narrow projection usable as a pushed-down filter
    before expensive downstream stages.

    ``round_to`` is the SINGLE rounding applied to the raw score.
    Catalog entries whose oracle rounds to 4 must pass ``round_to=4``
    here rather than re-rounding the default-6 result: double rounding
    diverges from the oracle's direct round exactly at the half-way
    boundaries (observed at sf0.1 — a raw score of ~0.56724999…
    rounded 6→4 gives 0.5673 where round(x, 4) gives 0.5672)."""
    f = quality_features(text)
    length_score = F.least(f["n_tokens"] / F.lit(50.0), F.lit(1.0))
    shape_score = F.lit(1.0) - F.least(
        F.abs(f["mean_token_len"] - 5.0) / F.lit(5.0), F.lit(1.0)
    )
    return F.round(
        0.4 * length_score + 0.3 * shape_score + 0.3 * f["stopword_ratio"],
        round_to,
    )


def fingerprint(text: Column, n_prefix_tokens: int = 5) -> Column:
    """Document fingerprint: md5 of the normalized leading token shingle.

    Normalization (lowercase, collapse non-alphanumerics) makes the
    fingerprint robust to whitespace/punctuation noise; md5 keeps the
    dedup shuffle key at 16 bytes regardless of document size.
    """
    head = F.concat_ws(" ", F.slice(tokens(text), 1, n_prefix_tokens))
    return F.md5(head)


def word_ngrams(toks: Column, n: int = 2) -> Column:
    """NON-distinct, order-preserving word n-grams (repetition metrics need
    multiplicity — ``word_shingles``'s ``array_distinct`` would erase the
    very signal being measured). Same shifted-slice zip construction, same
    NULL-padding drop for the tail."""
    out = toks
    for k in range(1, n):
        shifted = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(out, lambda x: x.isNotNull())


def repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_bigram_threshold: float = 0.18,
    dup_unigram_threshold: float = 0.30,
) -> DataFrame:
    """Gopher-style repetition quality gates (Rae et al. 2021, §A1.1):
    fraction of tokens that are repeats (1 - distinct/total) and the
    fraction of all bigrams taken by the single most frequent bigram.
    Documents exceeding either threshold get ``flagged = true``.

    Shape at scale: the unigram side is a narrow per-row projection (array
    functions, no explode). Only the bigram mode needs an explode →
    two-level aggregate, and partial aggregation compacts the ~n_tokens×
    blowup before the (id, gram) shuffle. The two sides join back on the
    unique id — at 100 TB both sides are id-partitioned aggregates, so AQE
    plans a plain shuffle join with no skew (ids are unique)."""
    toks = tokens(F.col(text_col))
    uni = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("_n_distinct"),
        word_ngrams(toks, 2).alias("_bigrams"),
    )
    bigram_mode = (
        uni.select(id_col, F.explode("_bigrams").alias("_gram"))
        .groupBy(id_col, "_gram")
        .agg(F.count("*").alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_max_c"), F.sum("_c").alias("_tot_c"))
    )
    dup_frac = F.when(
        F.col("n_tokens") > 0,
        1.0 - F.col("_n_distinct") / F.col("n_tokens"),
    ).otherwise(F.lit(0.0))
    top_frac = F.coalesce(F.col("_max_c") / F.col("_tot_c"), F.lit(0.0))
    return (
        uni.drop("_bigrams")
        .join(bigram_mode, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(dup_frac, 6).alias("dup_unigram_frac"),
            F.round(top_frac, 6).alias("top_bigram_frac"),
            (
                (F.round(dup_frac, 6) >= dup_unigram_threshold)
                | (F.round(top_frac, 6) >= top_bigram_threshold)
            ).alias("flagged"),
        )
    )


# PII scrub patterns, applied IN ORDER (emails contain digits and dots, so
# they must be scrubbed before the phone/IP patterns can misfire on their
# fragments). Every regex is in the common Java-regex ∩ RE2 dialect so
# Spark and DuckDB agree character-for-character.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 ()-]{6,}[0-9]", "<PHONE>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category PII match counts (regexp_extract_all → size)."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pattern), 0))
        for name, pattern, _ in PII_PATTERNS
    }


def scrub_pii(text: Column) -> Column:
    """Replace every PII match with its category placeholder, in the fixed
    pattern order. One chained narrow projection — fused into the scan."""
    out = text
    for _, pattern, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, repl)
    return out


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into overlapping token-window chunks.

    The pre-training chunking step: each document becomes
    ``ceil(max(n_tokens,1) / stride)``-ish chunks of ``window`` tokens
    starting every ``stride`` tokens (the final chunk may be shorter; a
    document shorter than ``window`` yields one chunk).  Output columns:
    ``(id_col, chunk_id, n_tokens, chunk_md5)`` — the md5 is over the
    space-joined chunk tokens, so downstream chunk-level dedup shuffles a
    16-byte key instead of chunk bodies.

    Zero-UDF: tokens are materialized ONCE per document in a projection
    (so the tokenizer does not re-run per chunk), starts come from
    ``posexplode(sequence(0, n-1, stride))``, and each chunk is a
    ``slice`` of the bound token array.  Narrow until the explode; the
    explode multiplies rows only ~n_tokens/stride ×, and each output row
    carries the hash, not the tokens.
    """
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    # NULL text is dropped (matching the oracle, whose generate_series
    # over a NULL length emits nothing); empty text still yields its one
    # empty chunk on both engines
    toked = docs.where(F.col(text_col).isNotNull()).select(
        id_col, tokens(F.col(text_col)).alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("_n") - 1, F.lit(0)), F.lit(stride)
    )
    exploded = toked.select(
        id_col,
        "_toks",
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, window)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).cast("int").alias("n_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    reuse_tokens: bool = False,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Excise duplicated n-gram spans from document text — the SURGERY
    counterpart of the ``text_duplicate_ngram_spans`` measurement (the
    exact-substring deduplication of Lee et al., 'Deduplicating Training
    Data Makes Language Models Better', §4, at word n-gram granularity).

    Semantics: tokenize on whitespace (tokens keep their case and
    punctuation — only inter-token whitespace is normalized), emit every
    n-gram OCCURRENCE with its start position, and call an n-gram
    duplicated when it occurs ≥ 2 times corpus-wide (across documents or
    repeated inside one).  For each duplicated n-gram, the corpus-wide
    FIRST occurrence (min (doc_id, position)) is canonical and kept —
    "all but one of the occurrences" is removed, per the paper — and
    every token position covered by a non-canonical occurrence is
    excised.  Output: ``(id_col, text_col, n_tokens, n_removed)`` with
    the trimmed, single-space-joined text (one row per input row;
    NULL text passes through as NULL with zero counts).

    Scale shape: grams are built in ONE projection over the bound token
    array (the array is materialized before any explode, so the explode
    carries (id, pos, hash) rows — never the token array itself), and
    duplicated-gram detection is a single groupBy on the 8-byte
    ``xxhash64`` of the gram with constant per-gram state
    (count + min-struct canonical): no posting lists, no window sort.
    Occurrences re-join the surviving gram set on the same hash key, the
    covered positions fold back per document via ``collect_set``
    (bounded by the document's own token count), and reconstruction is a
    doc-local array filter — tokens are never shuffled.  Hash note: a
    64-bit gram-hash collision can only merge two distinct grams into
    one duplicate group (slight over-removal), never resurrect a
    duplicate.

    The token arrays feed THREE consumers (occurrence pass, occurrence
    re-join, reconstruction), so the corpus is scanned and re-split
    three times.  ``reuse_tokens=True`` persists the tokenized
    projection instead — MEASURED SLOWER here (0.3 s vs 0.6 s at sf0.1:
    a whitespace split is cheaper than materializing and re-reading the
    uncompressed token arrays, and at 100 TB three scans of compressed
    columnar parquet beat spilling a token-array copy of the corpus),
    so the default stays off; the knob exists for genuinely CPU-heavy
    tokenizations, with the ``minhash_lsh_pairs(reuse_shingles)``
    lifetime contract (``cache_registry`` to own the cache)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    raw_toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: F.length(t) > 0
    )
    toked = docs.withColumn("_toks", raw_toks)
    if reuse_tokens:
        from pyspark import StorageLevel

        toked = toked.persist(StorageLevel.MEMORY_AND_DISK)
        toked.count()
        if cache_registry is not None:
            cache_registry.append(toked)
    # One gram hash per start position, built inside a single projection.
    # The transform is guarded by a CASE WHEN rather than a row filter:
    # InferFiltersFromGenerate copies the generator input into an
    # inferred `size(e) > 0` predicate that can evaluate BEFORE the
    # size>=n conjunct, and an unguarded transform then runs
    # sequence(0, negative) → slice(start 0) → runtime error on short
    # documents.  CaseWhen branches evaluate lazily, so the guard is
    # part of the expression itself and survives any predicate
    # inference or reordering.
    starts = F.sequence(F.lit(0), F.size("_toks") - n)
    gram_hashes = F.when(
        F.size("_toks") >= n,
        F.transform(
            starts,
            lambda i: F.xxhash64(
                F.concat_ws(" ", F.slice("_toks", i + 1, n))
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    occ = toked.select(id_col, gram_hashes.alias("_ghs")).select(
        id_col, F.posexplode("_ghs").alias("pos", "_gh")
    )
    dup = occ.groupBy("_gh").agg(
        F.count("*").alias("_c"),
        F.min(
            F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
        ).alias("_canon"),
    ).where(F.col("_c") >= 2)
    rem_occ = occ.join(dup, "_gh").where(
        ~(
            (F.col(id_col) == F.col("_canon.d"))
            & (F.col("pos") == F.col("_canon.p"))
        )
    )
    rem = (
        rem_occ.select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("p"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("p").alias("_rm"))
    )
    kept = F.filter(
        F.col("_toks"),
        lambda t, i: ~F.array_contains(F.col("_rm"), i),
    )
    out_toks = F.when(F.col("_rm").isNull(), F.col("_toks")).otherwise(kept)
    return (
        toked.join(rem, id_col, "left")
        .select(
            id_col,
            F.when(
                F.col("_toks").isNull(), F.lit(None).cast("string")
            ).otherwise(F.concat_ws(" ", out_toks)).alias(text_col),
            F.coalesce(F.size("_toks"), F.lit(0)).cast("int").alias(
                "n_tokens"
            ),
            (
                F.coalesce(F.size("_toks"), F.lit(0))
                - F.coalesce(F.size(out_toks), F.lit(0))
            ).cast("int").alias("n_removed"),
        )
    )


def boilerplate_fractions(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    min_df_frac: float = 0.10,
    extra_cols: tuple[str, ...] = (),
    min_df: int | None = None,
) -> DataFrame:
    """Per-document boilerplate fraction via corpus-frequent n-grams.

    An n-gram is "boilerplate" when it appears in at least
    ``ceil(min_df_frac * n_docs)`` DISTINCT documents (the C4/RefinedWeb
    style corpus-level repetition signal — per-document repetition is
    ``repetition_metrics``; this measures cross-document repetition).
    ``min_df`` overrides the fraction with an ABSOLUTE document count —
    ``min_df=2`` with a long ``n`` is the duplicated-substring signal
    (any span shared with at least one other document).
    Output: one row per document with >= 1 n-gram:
    ``(id_col, *extra_cols, n_grams, n_boiler, boiler_frac)``.

    Scale shape: document frequencies come from a ``count() OVER
    (PARTITION BY gram)`` window on the exploded (doc, gram) rows — NOT a
    groupBy + self-join, which would tokenize and explode the corpus
    TWICE (the plan audit caught exactly that in the first cut: two
    parquet scans, 6 exchanges).  The window form scans once and
    shuffles the explode once (on the gram key); per-gram state is a
    single running count, never a posting list, so stop-gram skew costs
    sort time, not memory.  The total-doc count is a 1-row aggregate
    broadcast (scalar-subquery pattern).  Nothing is quadratic in
    documents.
    """
    from pyspark.sql import Window

    doc_grams = docs.select(
        id_col,
        *extra_cols,
        F.explode(word_shingles(tokens(F.col(text_col)), n=n)).alias("gram"),
    )
    df_count = F.count("*").over(Window.partitionBy("gram"))
    flagged = doc_grams.withColumn("df", df_count)
    if min_df is not None:
        # absolute threshold: no corpus count needed — skip the extra
        # count aggregate + 1-row broadcast entirely
        threshold = F.lit(int(min_df))
    else:
        n_docs = docs.select(F.count("*").alias("_nd"))
        flagged = flagged.crossJoin(F.broadcast(n_docs))
        threshold = F.ceil(F.lit(min_df_frac) * F.col("_nd"))
    flagged = flagged.groupBy(id_col, *extra_cols).agg(
        F.count("*").cast("long").alias("n_grams"),
        F.sum(F.when(F.col("df") >= threshold, 1).otherwise(0))
        .cast("long")
        .alias("n_boiler"),
    )
    return flagged.withColumn(
        "boiler_frac", F.round(F.col("n_boiler") / F.col("n_grams"), 4)
    )


# Gopher's §A1.1 quality-rule stopword list (Rae et al. 2021): a page
# must contain at least GOPHER_MIN_STOPWORDS distinct members.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)
GOPHER_MIN_STOPWORDS = 2


def gopher_quality_flags(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    min_stopwords: int = GOPHER_MIN_STOPWORDS,
) -> dict[str, Column]:
    """The Gopher rule-based quality filters (Rae et al. 2021, §A1.1) as
    per-rule boolean columns plus the conjunction ``gopher_keep`` — the
    hard-gate companion to :func:`quality_score`'s soft signal (MassiveWeb
    used exactly these rules as the FIRST curation stage, before any
    model-based scoring).

    Words are WHITESPACE tokens of the raw text (punctuation attached),
    not the alnum ``tokens()`` — mean word length and the symbol ratio
    are defined over surface words in the paper.  All rule arithmetic is
    integer counts with at most one division per ratio, so a SQL oracle
    re-deriving the flags lands on bit-identical doubles.  Empty pages
    (0 words / 0 lines) fail the respective bound checks rather than
    dividing by zero.

    Rules: word count in [min_words, max_words]; mean word length in
    [min_mean_word_len, max_mean_word_len]; '#'-or-'...' symbols per
    word ≤ max_symbol_ratio; ≥ min_alpha_word_frac of words contain an
    alphabetic character; ≥ ``min_stopwords`` distinct members of
    ``stopwords`` (default: Gopher's eight); ≤ max_bullet_line_frac of lines start
    with a bullet; ≤ max_ellipsis_line_frac of lines end with an
    ellipsis.

    Scale shape: one narrow projection, no shuffle, no UDF — usable as a
    pushed-down pre-filter in front of every expensive stage."""
    words = F.filter(F.split(text, "\\s+"), lambda w: F.length(w) > 0)
    n_words = F.size(words)
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#"), F.lit("")))
    n_ellipsis = (
        F.length(text)
        - F.length(F.replace(text, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    n_alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[a-zA-Z]"))
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(words, F.lower)),
            F.array(*[F.lit(s) for s in stopwords]),
        )
    )
    lines = F.filter(F.split(text, "\n"), lambda l: F.length(l) > 0)
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda l: l.rlike("^\\s*[-*•]"))
    )
    n_ell_lines = F.size(
        F.filter(lines, lambda l: l.rlike("(\\.\\.\\.|…)\\s*$"))
    )
    word_count_ok = (n_words >= F.lit(min_words)) & (
        n_words <= F.lit(max_words)
    )
    # the zero-word/zero-line guards must be CASE WHEN around the
    # division, not a conjunct: ANSI mode evaluates both sides of `&`,
    # so a bare `(n > 0) & (x / n <= c)` raises DIVIDE_BY_ZERO on an
    # empty page (CASE branches ARE lazy)
    mean_word_len_ok = F.when(
        n_words > 0,
        ((sum_len / n_words) >= F.lit(min_mean_word_len))
        & ((sum_len / n_words) <= F.lit(max_mean_word_len)),
    ).otherwise(F.lit(False))
    symbol_ratio_ok = F.when(
        n_words > 0,
        ((n_hash + n_ellipsis) / n_words) <= F.lit(max_symbol_ratio),
    ).otherwise(F.lit(False))
    alpha_word_frac_ok = F.when(
        n_words > 0,
        (n_alpha_words / n_words) >= F.lit(min_alpha_word_frac),
    ).otherwise(F.lit(False))
    stopword_ok = n_stop >= F.lit(min_stopwords)
    bullet_frac_ok = F.when(
        n_lines > 0, (n_bullet / n_lines) <= F.lit(max_bullet_line_frac)
    ).otherwise(F.lit(True))
    ellipsis_frac_ok = F.when(
        n_lines > 0,
        (n_ell_lines / n_lines) <= F.lit(max_ellipsis_line_frac),
    ).otherwise(F.lit(True))
    keep = (
        word_count_ok
        & mean_word_len_ok
        & symbol_ratio_ok
        & alpha_word_frac_ok
        & stopword_ok
        & bullet_frac_ok
        & ellipsis_frac_ok
    )
    return {
        "n_words": n_words.cast("long"),
        "word_count_ok": word_count_ok,
        "mean_word_len_ok": mean_word_len_ok,
        "symbol_ratio_ok": symbol_ratio_ok,
        "alpha_word_frac_ok": alpha_word_frac_ok,
        "stopword_ok": stopword_ok,
        "bullet_frac_ok": bullet_frac_ok,
        "ellipsis_frac_ok": ellipsis_frac_ok,
        "gopher_keep": keep,
    }


def c4_line_filter(
    text: Column,
    min_line_words: int = 3,
    min_kept_lines: int = 5,
) -> dict[str, Column]:
    """The C4 line-level cleaning rules (Raffel et al. 2020, §2.2) as
    expression columns: per-line retention plus the page-level verdict.

    A line is RETAINED when it ends in a terminal punctuation mark
    (``.``, ``!``, ``?``, or a closing double quote), has at least
    ``min_line_words`` whitespace words, and does not contain the word
    "javascript" (case-insensitive) — the paper's cookie/boilerplate
    heuristic.  The PAGE is kept only when at least ``min_kept_lines``
    lines survive (C4's "fewer than 5 sentences" proxy) and the raw
    text contains neither a curly brace (code) nor "lorem ipsum"
    (placeholder), both page-level in the paper.

    Everything is deterministic string logic (split, regexp test, word
    count) — no floats at all, so oracle parity is exact by
    construction.  Output columns: ``cleaned_text`` (retained lines
    re-joined with newlines), ``n_lines`` (non-empty), ``n_kept_lines``,
    ``page_keep``.

    Scale shape: a narrow projection; the cleaned text is computed
    without exploding lines into rows, so no shuffle and no row
    multiplication — the whole filter rides along with the scan."""
    lines = F.filter(F.split(text, "\n"), lambda l: F.length(F.trim(l)) > 0)
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?"]\\s*$')
        & (
            F.size(F.filter(F.split(l, "\\s+"), lambda w: F.length(w) > 0))
            >= F.lit(min_line_words)
        )
        & ~F.lower(l).contains("javascript"),
    )
    n_kept = F.size(kept)
    page_keep = (
        (n_kept >= F.lit(min_kept_lines))
        & ~text.contains("{")
        & ~F.lower(text).contains("lorem ipsum")
    )
    return {
        "cleaned_text": F.array_join(kept, "\n"),
        "n_lines": F.size(lines).cast("long"),
        "n_kept_lines": n_kept.cast("long"),
        "page_keep": page_keep,
    }


def dedup_lines_crossdoc(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    return_text: bool = False,
) -> DataFrame:
    """Corpus-wide line-level deduplication — the cross-DOCUMENT sibling
    of ``c4_line_filter`` (C4, Raffel et al. 2020 §2.2: "we discarded all
    but one of any three-sentence span occurring more than once", here at
    line granularity like CCNet's paragraph dedup, Wenzek et al. 2020
    §3.1).

    Semantics: split each document on newlines (blank/whitespace-only
    lines dropped), key each line by its md5, and keep a line iff its
    (doc, position) IS the corpus-wide first occurrence of that key —
    ``min(struct(id, line_no))``.  Every later occurrence, whether in
    another document or a repeat inside the same one, is excised; each
    surviving document is re-joined in original line order.  Documents
    with zero non-empty lines produce no output row (nothing to dedup —
    both engines agree by construction).

    Output: ``(id_col, n_lines, n_kept, clean_hash)`` — md5 of the
    rejoined text pins the reconstruction; a fully-duplicated document
    keeps zero lines and hashes the empty string.  ``return_text=True``
    adds the rejoined text itself as ``clean_text`` (the pipeline-stage
    form; the catalog entry ships only the hash to keep the compared
    surface small).

    Scale shape: one explode to (id, line_no, 16-byte key) — the line
    text rides only to the first aggregate, which folds it away into
    constant per-key state (count + min-struct); the keep decision is an
    equi-join of the occurrence stream back on the key (co-partitioned
    with the aggregate's own shuffle, so AQE reuses the exchange); the
    reconstruction is a per-document sort-free ``array_sort(collect_
    list)`` bounded by the document's own line count.  No window over
    the corpus, no cross join; all string/integer logic, so the SQL
    oracle reproduces it bit-for-bit."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.split(F.col(text_col), "\n"),
                lambda l: F.length(F.trim(l)) > 0,
            )
        ).alias("line_no", "line"),
    )
    firsts = lines.groupBy(F.md5("line").alias("line_key")).agg(
        F.min(F.struct(F.col(id_col), F.col("line_no"))).alias("_first"),
    )
    kept = (
        lines.withColumn("line_key", F.md5("line"))
        .join(firsts, "line_key")
        .where(
            (F.col(id_col) == F.col(f"_first.{id_col}"))
            & (F.col("line_no") == F.col("_first.line_no"))
        )
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_kept"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("line_no"), F.col("line")))
                ),
                lambda s: s.getField("line"),
            ).alias("_kl"),
        )
    )
    totals = lines.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    joined = F.coalesce(F.array_join(F.col("_kl"), "\n"), F.lit(""))
    cols = [
        F.col(id_col),
        F.col("n_lines").cast("long").alias("n_lines"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.md5(joined).alias("clean_hash"),
    ]
    if return_text:
        cols.append(joined.alias("clean_text"))
    return totals.join(kept, id_col, "left").select(*cols)


def _md5_bucket(tok: Column, num_buckets: int) -> Column:
    """One engine-portable hash bucket of a token: the first md5 byte
    (mod ``num_buckets``).  md5 is bit-identical in Spark and DuckDB, so
    a SQL oracle re-derives the SAME buckets; the xxhash64 family does
    not cross engines (the dsir_importance_weights precedent)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 2), 16, 10).cast("int")
        % num_buckets
    )


def ccnet_perplexity(
    docs: DataFrame,
    lm_corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-document cross-entropy under a target-domain bigram LM — the
    CCNet quality signal (Wenzek et al. 2020, "CCNet: Extracting High
    Quality Monolingual Datasets from Web Crawl Data", §4.3): score every
    document by the perplexity of a language model TRAINED ON A TRUSTED
    TARGET DOMAIN (the paper uses Wikipedia; KenLM 5-gram), then keep the
    low-perplexity head of the corpus.  This is the absolute-fluency
    complement of ``sampling.dsir_importance_weights`` (a RATIO of two
    domains): DSIR asks "more target-like than raw-like?", CCNet asks
    "fluent under the target LM at all?".

    The LM here is a hashed-bucket BIGRAM model: tokens map to
    ``num_buckets`` md5 buckets (engine-portable, OOV-free — every
    possible token has a bucket, the hashed-feature trick DSIR also
    uses), and the conditional probability is Laplace-smoothed:
    ``p(b2|b1) = (c(b1,b2) + s) / (c(b1,·) + s·B)``.  Per document,
    ``ce_nats = avg(-ln p)`` over its bigram events — ln(perplexity).
    The probability is ONE fixed expression shape (add, add, divide —
    all IEEE correctly-rounded) so only the final ``ln`` and the per-doc
    mean's summation order are engine-soft; callers pin oracle parity by
    rounding once (the dsir/surprisal precedent).

    Output: ``(id_col, n_bigrams, ce_nats)`` — UNROUNDED, one row per
    document with ≥ 1 bigram (documents with < 2 tokens have no events
    and are dropped, as in ``text_bigram_surprisal``).  Classify with
    ``ccnet_bucket`` (fixed cutoffs) or derive corpus-relative cutoffs
    with ``ccnet_cutoffs``.

    Scale shape: the LM is at most ``num_buckets²`` rows (one hash
    aggregate over the target's exploded bigrams — map-side partial
    aggregation collapses the explode before the shuffle) and both the
    pair-count and context-count tables BROADCAST onto the corpus's
    exploded bigram stream; the only data-sized shuffle is the final
    per-document aggregate, and partial aggregation collapses the ~T×
    bigram explode before it.  No vocabulary is ever shuffled."""
    if not 1 <= num_buckets <= 256:
        raise ValueError("num_buckets must be in [1, 256] (one md5 byte)")
    s = float(smoothing)

    def bigram_events(df: DataFrame) -> DataFrame:
        toks = tokens(F.col(text_col))
        n1 = F.greatest(F.size(toks) - 1, F.lit(0))
        return df.select(
            F.col(id_col),
            F.explode(
                F.zip_with(
                    F.slice(toks, 1, n1),
                    F.slice(toks, 2, n1),
                    lambda a, b: F.struct(
                        _md5_bucket(a, num_buckets).alias("_b1"),
                        _md5_bucket(b, num_buckets).alias("_b2"),
                    ),
                )
            ).alias("_bg"),
        ).select(id_col, "_bg._b1", "_bg._b2")

    c2 = bigram_events(lm_corpus).groupBy("_b1", "_b2").agg(
        F.count("*").alias("_c2")
    )
    c1 = c2.groupBy("_b1").agg(F.sum("_c2").alias("_c1"))
    denom = F.lit(s * num_buckets)
    return (
        bigram_events(docs)
        .join(F.broadcast(c2), ["_b1", "_b2"], "left")
        .join(F.broadcast(c1), ["_b1"], "left")
        .withColumn(
            "_logp",
            F.log(
                (F.coalesce("_c2", F.lit(0)) + F.lit(s))
                / (F.coalesce("_c1", F.lit(0)) + denom)
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.avg(-F.col("_logp")).alias("ce_nats"),
        )
    )


def ccnet_bucket(
    ce: Column, head_cutoff: float, tail_cutoff: float
) -> Column:
    """CCNet's head/middle/tail split on a cross-entropy column with
    FIXED cutoffs: ``ce < head_cutoff`` → 'head' (most fluent),
    ``ce < tail_cutoff`` → 'middle', else 'tail'.  The paper derives the
    cutoffs as the corpus's ⅓/⅔ perplexity percentiles ONCE per
    language and then applies them as constants — which is exactly the
    scale-correct shape (a constant comparison that rides the scan, no
    global rank window); ``ccnet_cutoffs`` computes them."""
    return (
        F.when(ce < F.lit(head_cutoff), F.lit("head"))
        .when(ce < F.lit(tail_cutoff), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )


def ccnet_cutoffs(
    scored: DataFrame,
    ce_col: str = "ce_nats",
    probs: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
) -> tuple[float, float]:
    """Derive the head/tail cross-entropy cutoffs as corpus percentiles
    (CCNet computes them per language on a sample, then freezes them).
    Uses ``approx_percentile`` — the mergeable-sketch percentile whose
    memory is bounded by accuracy, not by corpus size (the exact
    ``percentile`` buffers every value per group: wrong at 100 TB).
    Returns driver-side floats to be passed to ``ccnet_bucket`` as
    constants — two scalars, the only thing collected."""
    lo, hi = probs
    row = scored.agg(
        F.approx_percentile(ce_col, F.lit(lo), F.lit(10000)).alias("_lo"),
        F.approx_percentile(ce_col, F.lit(hi), F.lit(10000)).alias("_hi"),
    ).collect()[0]
    return float(row["_lo"]), float(row["_hi"])


#: Rae et al. 2021, Table A1 — repetition thresholds: a document is
#: removed when ANY fraction exceeds its bound.
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def gopher_repetition_fractions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """The COMPLETE Gopher §A1.2 intra-document repetition suite (Rae et
    al. 2021): per document, the fraction of characters (a) contained in
    the single most frequent n-gram for small n (``top_ns`` — all
    occurrences counted, overlaps included, the paper's definition) and
    (b) covered by n-grams that occur ≥ 2× within the document for
    larger n (``dup_ns`` — each character counted ONCE via position
    union).  ``repetition_metrics`` implements the unigram + top-bigram
    corner of this table; this operator fills in the remaining seven
    rows.  (The paper's duplicate line/paragraph variants are the
    newline-delimited siblings of the same computation; ``c4_line_filter``
    owns the line tier.)

    Characters are counted over tokens only (whitespace excluded,
    denominator = Σ token lengths), so every fraction is a ratio of two
    integers — exact on both engines; display rounds once at 6.

    Output: ``(id_col, n_tokens, total_chars, top_ngram_frac_{n}…,
    dup_ngram_frac_{n}…, gopher_rep_keep)`` — one row per input row,
    zero fractions for documents too short to have the n-gram, NULL
    text treated as empty, ``gopher_rep_keep`` = all fractions within
    the paper's Table A1 bounds.

    Scale shape: gram arrays for every n are built POSITIONALLY in one
    let-bound projection (the ``word_shingles`` zip chain, tokenizer
    runs once per consumer), exploded to (id, n, pos, gram) rows that
    one hash aggregate counts — map-side partials absorb the ~Σn×
    blowup.  The duplicate-coverage pass re-joins occurrences to the
    ≥2× gram set on (id, n, gram) and unions covered token positions
    with a distinct — all aggregates keyed by the document, nothing
    corpus-global; total work is linear in corpus tokens × |ns|."""
    all_ns = sorted(set(top_ns) | set(dup_ns))

    def gram_positions(t: Column) -> Column:
        """Concat over n of (n, pos, gram-starting-at-pos) structs."""
        parts = []
        for n in all_ns:
            out = t
            for k in range(1, n):
                shifted = F.slice(
                    t, k + 1, F.greatest(F.size(t) - k, F.lit(0))
                )
                out = F.zip_with(
                    out, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
                )
            parts.append(
                F.filter(
                    F.transform(
                        out,
                        lambda x, i: F.struct(
                            F.lit(n).alias("n"),
                            i.alias("pos"),
                            x.alias("gram"),
                        ),
                    ),
                    lambda s: s.getField("gram").isNotNull(),
                )
            )
        return F.concat(*parts)

    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    # base (the tokenized corpus) feeds three branches (gram events,
    # per-position lengths, the output row) and counts feeds two (the
    # top-gram max and the ≥2× duplicate join) — unpinned, each branch
    # replayed the corpus tokenize / gram aggregate (5 scans in the
    # committed plan).  Both are lazily pinned (optimization r17, the
    # minhash shingle-cache rationale); the exploded gram stream itself
    # stays unpinned — storing ~Σn gram copies costs more than
    # re-deriving them from the pinned token arrays.  Value neutral.
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(
            F.transform(toks, F.length), F.lit(0), lambda a, x: a + x
        )
        .cast("long")
        .alias("total_chars"),
    ).localCheckpoint(eager=False)
    evs = base.select(
        id_col,
        F.explode(
            F.element_at(F.transform(F.array(F.col("_toks")), gram_positions), 1)
        ).alias("_g"),
    ).select(id_col, "_g.n", "_g.pos", "_g.gram")
    counts = evs.groupBy(id_col, "n", "gram").agg(
        F.count("*").alias("_c")
    ).localCheckpoint(eager=False)

    top = (
        counts.where(F.col("n").isin(list(top_ns)))
        .withColumn("_chars", F.length("gram") - (F.col("n") - 1))
        .groupBy(id_col, "n")
        .agg(F.max(F.struct("_c", "_chars", "gram")).alias("_m"))
        .select(
            id_col,
            "n",
            (F.col("_m._c") * F.col("_m._chars")).alias("_topchars"),
        )
    )
    dup_occ = evs.where(F.col("n").isin(list(dup_ns))).join(
        counts.where((F.col("_c") >= 2) & F.col("n").isin(list(dup_ns))),
        [id_col, "n", "gram"],
    )
    covered = (
        dup_occ.select(
            id_col,
            "n",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.col("n") - 1)
            ).alias("_tp"),
        )
        .distinct()
    )
    lens = base.select(
        id_col, F.posexplode("_toks").alias("_tp", "_tok")
    ).select(id_col, "_tp", F.length("_tok").alias("_l"))
    dupchars = (
        covered.join(lens, [id_col, "_tp"])
        .groupBy(id_col, "n")
        .agg(F.sum("_l").alias("_dupchars"))
    )

    def frac(chars: Column) -> Column:
        return F.round(
            F.when(
                F.col("total_chars") > 0,
                F.coalesce(chars, F.lit(0)) / F.col("total_chars"),
            ).otherwise(F.lit(0.0)),
            6,
        )

    top_p = top.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("_topchars"))).alias(
                f"_top{n}"
            )
            for n in top_ns
        ]
    )
    dup_p = dupchars.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("n") == n, F.col("_dupchars"))).alias(
                f"_dup{n}"
            )
            for n in dup_ns
        ]
    )
    out = (
        base.drop("_toks")
        .join(top_p, id_col, "left")
        .join(dup_p, id_col, "left")
    )
    frac_cols = [
        frac(F.col(f"_top{n}")).alias(f"top_ngram_frac_{n}") for n in top_ns
    ] + [
        frac(F.col(f"_dup{n}")).alias(f"dup_ngram_frac_{n}") for n in dup_ns
    ]
    out = out.select(id_col, "n_tokens", "total_chars", *frac_cols)
    keep = F.lit(True)
    for n in top_ns:
        keep = keep & (
            F.col(f"top_ngram_frac_{n}") <= F.lit(GOPHER_TOP_NGRAM_MAX[n])
        )
    for n in dup_ns:
        keep = keep & (
            F.col(f"dup_ngram_frac_{n}") <= F.lit(GOPHER_DUP_NGRAM_MAX[n])
        )
    return out.withColumn("gopher_rep_keep", keep)


def vocab_top_terms(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
) -> DataFrame:
    """The corpus's ``vocab_size`` most frequent tokens (ties broken by
    term asc): ``(term, term_count)``.  Scale shape: partial-aggregated
    term counts (map-side combine collapses each partition to its
    distinct terms) followed by a global top-k — Spark plans
    ``orderBy().limit()`` as TakeOrderedAndProject, a per-partition heap
    plus a driver merge of k rows, never a full sort."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("term_count"))
        .orderBy(F.desc("term_count"), F.asc("term"))
        .limit(vocab_size)
    )


def vocab_oov_rates(
    docs: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Tokenizer-coverage measurement: per document, how much of its
    token stream falls outside the corpus's own top-``vocab_size``
    vocabulary — ``(id, n_tokens, n_oov, oov_rate)``.

    The pre-tokenizer-training question at 100 TB: a vocab sized too
    small shows up here as a heavy OOV tail (documents that would
    shatter into bytes/unk), and per-source OOV aggregates locate WHICH
    slice the vocab underserves.  Scale shape: the vocabulary is a
    global top-k (TakeOrderedAndProject) then BROADCAST onto the token
    stream — the stream itself shuffles once, for the per-document
    count.  Zero-token documents keep a row with ``oov_rate`` NULL
    (0/0 is unmeasured, not 0)."""
    vocab = vocab_top_terms(docs, vocab_size, text_col).select("term")
    dt = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    per = (
        dt.join(F.broadcast(vocab.withColumn("_in", F.lit(1))), "term", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.count_if(F.col("_in").isNull()).alias("n_oov"),
        )
    )
    return docs.select(id_col).join(per, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.col("n_oov") / F.col("n_tokens").cast("double"),
            ),
            round_to,
        ).alias("oov_rate"),
    )


def token_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 4,
) -> DataFrame:
    """Within-document token-distribution Shannon entropy (nats):
    ``H(d) = −Σ_t (c_t/n) ln(c_t/n)`` — the diversity twin of the
    repetition fractions: near-zero H means the document is a handful
    of tokens repeated (template junk, keyword stuffing) even when no
    single n-gram dominates enough to trip a Gopher repetition
    threshold; H ≈ ln(n_distinct) means tokens are used evenly.

    Output: ``(id, n_tokens, n_distinct, entropy)``; zero-token
    documents keep a row with NULL entropy (an empty distribution has
    no entropy, not zero — a one-token doc is the H = 0 case).

    Scale shape: explode → (doc, token) hash count with map-side
    combine → one per-doc aggregate; ln runs on exact integer ratios
    so both engines see identical doubles before the single round."""
    dt = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    cnt = dt.groupBy(id_col, "term").agg(F.count("*").alias("c"))
    per = cnt.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        # -Σ c·ln(c) aggregated exactly; H = ln(n) − (Σ c·ln c)/n
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
        .alias("_clnc"),
    )
    h = F.log(F.col("n_tokens").cast("double")) - F.col("_clnc") / F.col(
        "n_tokens"
    ).cast("double")
    return docs.select(id_col).join(per, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.col("n_distinct"), F.lit(0)).alias("n_distinct"),
        F.round(h, round_to).alias("entropy"),
    )
