"""Model-based scoring over text: BM25 relevance ranking and a
hashed-feature linear classifier.

Extension tier — the reference has no search or model-scoring surface at
all (SURVEY §2.8); this is the retrieval / quality-classifier corner of
the §2.11 training-data toolkit: BM25 is the standard sparse retriever
for RAG-style chunk selection and hard-negative mining, and the hashed
linear model is the fastText-shaped quality gate (a dot product over
hashing-trick features) that corpus pipelines run when a trained filter
is available.

All pure Catalyst expressions — zero Python UDFs.  Scale shape:

- the QUERY side is always tiny (a handful of query strings, a weight
  table bounded by the feature dimension) and is ``broadcast()`` onto the
  corpus side, so the corpus never shuffles for the model inputs;
- corpus-side work is explode → aggregate with map-side partial
  aggregation absorbing the token blowup, exactly like
  ``operators.text``;
- document frequencies are computed ONLY for query terms (semi-join
  against the broadcast term set before the df aggregate), so the df
  shuffle carries |query vocabulary| keys, not the corpus vocabulary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hfp_loader_spark.operators.text import tokens


def _doc_lengths(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, dl) — token count per document, a narrow projection."""
    return docs.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("dl"),
    )


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
    round_at: int = 4,
) -> DataFrame:
    """Okapi BM25 relevance of every matching document for every query:
    ``score(q, d) = Σ_{t ∈ distinct(q)} idf(t) · tf(t,d)·(k1+1) /
    (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))`` with the Lucene-style
    always-positive ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))``.
    Duplicate query terms count once (set semantics — the common
    retrieval convention; term weighting within the query belongs to the
    caller's query builder).  Documents sharing no term with a query get
    no row, not a zero.

    Output: ``(qid_col, id_col, score)``, score rounded once at
    ``round_at`` — rank on the rounded value so downstream top-k ties
    break identically on any engine.

    Exactness: tf, df, N and dl are integers; ``dl/avgdl`` is computed
    as ``dl·N / Σdl`` (one int64 product, one division) so both factors
    of every term's contribution are correctly-rounded doubles of exact
    rationals; only ``ln`` and the cross-term sum are inexact, which the
    single rounding absorbs.

    Scale shape: one corpus shuffle for ``tf`` (map-side combine on
    (doc, term)), one narrow projection for ``dl``; the query-term set,
    the per-term idf table (≤ query vocabulary) and the single-row
    (N, Σdl) stats frame are all broadcast; df aggregates only terms
    surviving the broadcast semi-join with the query vocabulary.  The
    final per-(query, doc) sum shuffles ``|queries| × matched docs``
    rows — the output size."""
    # Both corpus-derived frames below feed MULTIPLE plan branches (dl →
    # stats + the contrib join; tf → df/idf + the contrib join), and an
    # unpinned reference replays the corpus tokenize+count per branch —
    # the committed rank_rrf_fusion plan carried 7 documents scans.
    # Lazy localCheckpoint pins each ONCE per computation (optimization
    # r17, guide §2.4/§5 — the minhash shingle-persist rationale: at
    # 100 TB you spill the term table to local disk rather than re-read
    # and re-tokenize the corpus per reference).  No value change.
    dl = _doc_lengths(docs, id_col, text_col).localCheckpoint(eager=False)
    stats = dl.agg(
        F.count("*").alias("_n_docs"), F.sum("dl").alias("_sum_dl")
    )

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.count("*").alias("tf")
    ).localCheckpoint(eager=False)

    qterms = queries.select(
        F.col(qid_col),
        F.explode(F.array_distinct(tokens(F.col(qtext_col)))).alias("term"),
    )
    qvocab = qterms.select("term").distinct()

    df_t = (
        tf.join(F.broadcast(qvocab), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(
            F.lit(1.0)
            + (F.col("_n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        ).alias("idf"),
    )

    norm = (
        F.lit(float(k1))
        * (
            F.lit(1.0 - float(b))
            + F.lit(float(b))
            * (F.col("dl") * F.col("_n_docs") / F.col("_sum_dl"))
        )
    )
    contrib = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(idf), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            qid_col,
            id_col,
            (
                F.col("idf")
                * (F.col("tf") * F.lit(float(k1) + 1.0))
                / (F.col("tf") + norm)
            ).alias("_c"),
        )
    )
    return contrib.groupBy(qid_col, id_col).agg(
        F.round(F.sum("_c"), round_at).alias("score")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query by BM25, rank ties broken by lowest
    document id on the ROUNDED score (deterministic across engines and
    re-runs).  The rank window partitions by query — parallelism is the
    query count, which is the right axis for a retrieval batch; a
    single-query call at 100 TB should shard the corpus and merge
    per-shard top-k lists instead (see ``relational.global_top_k``)."""
    from hfp_loader_spark.operators.relational import top_k_per_group

    scored = bm25_scores(
        docs, queries, id_col, text_col, qid_col, qtext_col, k1, b
    )
    return top_k_per_group(
        scored, [qid_col], [F.desc("score"), F.asc(id_col)], k
    )


def hard_negatives(
    docs: DataFrame,
    anchors: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    anchor_id_col: str = "query_id",
    anchor_text_col: str = "query_text",
    max_jaccard: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """DPR-style hard-negative mining for contrastive training: per
    anchor document, the top-``k`` BM25-most-similar documents that are
    NOT near-duplicates of the anchor.  Lexically close but
    sub-duplicate is exactly the "hard" band — BM25 supplies closeness,
    a distinct-token Jaccard cap (``max_jaccard``, strict ``<``)
    removes the probable-positives that would poison the negative set,
    and the anchor itself is always excluded.  Candidates sharing no
    term with the anchor never surface (they are easy negatives; random
    sampling covers them, not this operator).

    Output: ``(anchor_id_col, id_col, score, jaccard, rn)`` — BM25
    score and exact-rational Jaccard both rounded (4 / 6), rank by
    (rounded score desc, id asc).

    Scale shape: the BM25 side is :func:`bm25_scores` (corpus shuffles
    once for tf); the Jaccard side joins the BROADCAST distinct
    anchor-token set onto the corpus tokens and aggregates per
    (anchor, doc) — intersection counts only exist for candidate pairs,
    never all-pairs.  Anchor-side sizes are broadcast; document token
    counts ride the same aggregate."""
    scored = bm25_scores(
        docs, anchors, id_col, text_col, anchor_id_col, anchor_text_col,
        k1, b,
    ).where(F.col(anchor_id_col) != F.col(id_col))

    dtok = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"),
    )
    atok = anchors.select(
        F.col(anchor_id_col),
        F.explode(
            F.array_distinct(tokens(F.col(anchor_text_col)))
        ).alias("term"),
    )
    # dtok feeds both the per-doc sizes and the intersection join —
    # unpinned, each branch replays the corpus distinct-tokenize
    # (optimization r17, same rationale as bm25_scores above).
    dtok = dtok.localCheckpoint(eager=False)
    asize = atok.groupBy(anchor_id_col).agg(F.count("*").alias("_na"))
    dsize = dtok.groupBy(id_col).agg(F.count("*").alias("_nd"))
    inter = (
        dtok.join(F.broadcast(atok), "term")
        .groupBy(anchor_id_col, id_col)
        .agg(F.count("*").alias("_ni"))
    )
    jac = (
        inter.join(F.broadcast(asize), anchor_id_col)
        .join(dsize, id_col)
        .select(
            anchor_id_col,
            id_col,
            F.round(
                F.col("_ni")
                / (F.col("_na") + F.col("_nd") - F.col("_ni")),
                6,
            ).alias("jaccard"),
        )
    )
    from hfp_loader_spark.operators.relational import top_k_per_group

    cand = scored.join(jac, [anchor_id_col, id_col]).where(
        F.col("jaccard") < F.lit(float(max_jaccard))
    )
    return top_k_per_group(
        cand, [anchor_id_col], [F.desc("score"), F.asc(id_col)], k
    )


def hashed_feature(term: Column, dim: int) -> Column:
    """Hashing-trick feature index of a token: the first 8 hex digits of
    ``md5(term)`` read as an integer, mod ``dim``.  md5 (not xxhash64)
    so any engine with an md5 builtin lands on the same bucket."""
    return (
        F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("long")
        % F.lit(dim)
    )


def pseudo_weights(spark, dim: int, seed: str = "w", scale: float = 1.0) -> DataFrame:
    """A deterministic stand-in weight vector for the hashed linear
    model: ``w_j = scale · ((int(md5(seed||':'||j)[:8], 16) mod 2001) −
    1000)/1000`` — uniform-ish in [−scale, +scale], reproducible on any
    engine from the (seed, dim) pair alone.  Real deployments load a
    TRAINED vector into the same (bucket, weight) shape; everything
    downstream is engine-side and identical."""
    return spark.range(dim).select(
        F.col("id").cast("long").alias("bucket"),
        (
            F.lit(float(scale))
            * (
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{seed}:"), F.col("id"))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.lit(2001)
                    - F.lit(1000)
                )
                / F.lit(1000.0)
            )
        ).alias("weight"),
    )


def hashed_linear_score(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    bias: float = 0.0,
    threshold: float = 0.5,
    round_at: int = 4,
) -> DataFrame:
    """fastText-shaped linear text classifier: mean-pooled hashing-trick
    bag-of-words → dot product with a broadcast weight vector → sigmoid.
    ``p(d) = σ(bias + (Σ_t w[h(t)]) / n_tokens(d))`` with ``h`` =
    :func:`hashed_feature`; tokens hitting the same bucket add their
    weight once per OCCURRENCE (mean pooling over token instances, the
    fastText convention).  Output: ``(id_col, n_tokens, p, keep)`` with
    ``p`` rounded at ``round_at`` and ``keep = p ≥ threshold`` (the
    quality-gate reading: p is "probability the document is keepable").
    Empty documents score ``σ(bias)`` — the model's prior.

    ``weights`` is any ``(bucket, weight)`` frame with ``dim`` rows —
    :func:`pseudo_weights` for a reproducible fake, or a trained vector
    loaded from parquet.  Scale shape: explode → broadcast-join the
    weight table (≤ ``dim`` rows) → one (doc) hash aggregate; the only
    shuffle carries one row per document.  The sigmoid and division
    happen after the aggregate, per document."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    summed = (
        toks.select(id_col, hashed_feature(F.col("term"), dim).alias("bucket"))
        .join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum("weight").alias("_sw"), F.count("*").alias("n_tokens"))
    )
    # left join back so token-less documents keep a row (score = σ(bias))
    base = docs.select(id_col).join(summed, id_col, "left")
    logit = F.lit(float(bias)) + F.coalesce(
        F.col("_sw") / F.col("n_tokens"), F.lit(0.0)
    )
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), round_at)
    return base.select(
        id_col,
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        p.alias("p"),
        (p >= F.lit(float(threshold))).alias("keep"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    topk: int,
    k_rrf: int = 60,
    qid_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rn",
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009): merge any number of
    per-query rankings into one by ``score(d) = Σ_r 1/(k_rrf +
    rank_r(d))``, a document absent from a ranking contributing 0 — the
    standard hybrid-retrieval combiner (lexical BM25 + dense cosine)
    that needs NO score calibration because it only consumes RANKS.

    Output: ``(qid_col, id_col, rrf, rn ≤ topk)``, ordered by rounded
    rrf desc with id tiebreak.  Scale shape: each input ranking is
    already a per-query top-k (bounded rows per query); the fusion is
    ONE union + ONE (query, doc) aggregate + the per-query top-k
    window — work proportional to queries × k × len(rankings),
    independent of corpus size.  (r10: previously a cascade of R−1
    full-outer joins — each a shuffle of both sides; the union+agg form
    measures 20 → 8 exchanges on the rank_rrf_fusion entry with
    identical values.)

    Determinism under floats: the per-doc contributions are summed by
    an IN-ROW fold over the contributions SORTED BY RANKING INDEX —
    float addition is commutative but not associative, so a plain
    ``sum()`` over the union would add in partition order and could
    drift a last ulp across runs/engines at R ≥ 3; the sorted fold
    reproduces the cascade's fixed left-to-right order exactly."""
    from functools import reduce

    from hfp_loader_spark.operators.relational import top_k_per_group

    sides = [
        r.select(
            F.col(qid_col),
            F.col(id_col),
            F.lit(i).alias("_ri"),
            (F.lit(1.0) / (F.lit(k_rrf) + F.col(rank_col).cast("double")))
            .alias("_c"),
        )
        for i, r in enumerate(rankings)
    ]
    allc = reduce(lambda a, b: a.unionByName(b), sides)
    score = F.aggregate(
        F.array_sort(F.collect_list(F.struct(F.col("_ri"), F.col("_c")))),
        F.lit(0.0),
        lambda acc, s: acc + s.getField("_c"),
    )
    scored = allc.groupBy(qid_col, id_col).agg(
        F.round(score, round_to).alias("rrf")
    )
    return top_k_per_group(
        scored, [qid_col], [F.desc("rrf"), F.asc(id_col)], topk
    )


def _sharded_score_cumsum(g: DataFrame, n_shards: int) -> DataFrame:
    """Exclusive cumsum of ``_n`` over ``_s`` order for a DISTINCT-score
    frame, without a data-sized single-partition window: scores are
    value-range-sharded (monotone in ``_s``, so per-shard prefixes +
    cumulative shard totals compose to the global prefix), the bounds
    come from a broadcast 1-row aggregate (declarative — plan build
    runs no Spark job), and the only unpartitioned window orders the
    ``n_shards``-row totals frame.  Degenerate ranges (all scores
    equal, or an infinite bound making the shard expression NaN)
    collapse every row into one shard — correct, just unsharded.
    Returns ``(_npos, _n, _below)``.

    Plan note (ADVICE r16): ``g`` (the distinct-score frame) feeds
    three branches — the bounds aggregate, the per-shard window side,
    and the totals→offsets side.  Collapsing those to one corpus pass
    relies on Spark's ReuseExchange deduplicating the identical
    shuffle subtree (on by default, ``spark.sql.exchange.reuse``); with
    reuse disabled the plan is still correct, just recomputes ``g`` per
    branch.  Callers on exotic configs can localCheckpoint/persist
    ``g`` before calling if that matters."""
    from pyspark.sql import Window

    bounds = g.agg(
        F.min("_s").alias("_lo"), F.max("_s").alias("_hi")
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_shards))
    shard = (
        F.when(
            width > 0,
            F.least(
                F.floor((F.col("_s") - F.col("_lo")) / width),
                F.lit(n_shards - 1),
            ),
        )
        .otherwise(0)
        .cast("int")
    )
    sharded = (
        g.crossJoin(F.broadcast(bounds))
        .withColumn("_shard", shard)
        .drop("_lo", "_hi")
    )
    w_in = (
        Window.partitionBy("_shard")
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum("_n").over(w_in), F.lit(0.0))
    totals = sharded.groupBy("_shard").agg(F.sum("_n").alias("_tot"))
    w_sh = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_shard",
        F.coalesce(F.sum("_tot").over(w_sh), F.lit(0.0)).alias("_off"),
    )
    return (
        sharded.join(F.broadcast(offsets), "_shard")
        .select(
            "_npos",
            "_n",
            (F.col("_off") + within).alias("_below"),
        )
    )


def roc_auc(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    round_to: int = 6,
    score_round_to: int | None = 6,
    n_shards: int = 32,
) -> DataFrame:
    """Exact ROC-AUC via the Mann–Whitney rank statistic, computed from
    the SCORE HISTOGRAM rather than a global sort:

        AUC = (Σ_{positives} avgrank(score) − n⁺(n⁺+1)/2) / (n⁺·n⁻)

    with average ranks for ties (the textbook tie correction — without
    it a constant classifier scores 0 instead of 0.5).

    Scale shape: one ``groupBy(score)`` aggregate over the corpus (the
    only corpus-sized pass, map-side combinable), then the rank algebra
    runs on the DISTINCT-SCORE frame.  The score is ROUNDED to
    ``score_round_to`` decimals INSIDE the groupBy, so the distinct
    frame is provably bounded for ANY caller — ≤ (hi−lo)·10^d + 1 rows
    for scores in [lo, hi] — not just callers that pre-round; without
    this, unrounded random doubles would put a corpus-sized frame
    through the single global rank sort (rounding at d decimals is the
    histogram-AUC trade: scores within 10^-d become ties, which the
    tie correction handles exactly).  The global window orders that
    bounded frame, never the corpus.  One row out: n_pos, n_neg, auc,
    gini (= 2·AUC − 1).

    NULL scores are EXCLUDED before the groupBy (n_pos/n_neg count only
    scored rows): Spark's rank window orders NULLs first, so including
    them would silently shift every rank — an unscorable row is not a
    worst-ranked row.  Output is NULL-auc when either class is empty
    (AUC undefined), with the counts still reported — the caller's
    signal to fix labels, not a silent 0.5.

    ``score_round_to=None`` preserves EXACT scores (no merging of
    scores closer than 10^-d into ties — ADVICE r11 #5) for callers
    that already bound their score domain.  Since optimization r16 that
    path no longer funnels the distinct-score frame through ONE global
    window task (VERDICT r15 #5: a continuous score makes the frame
    corpus-sized): the rank cumsum is computed as a sharded prefix sum
    — value-range shards from a broadcast 1-row bounds aggregate, a
    per-shard window, and an ``n_shards``-row offset frame — the same
    shape as ``operators.packing.exclusive_prefix_sum``, with bounds
    derived declaratively (no driver job at plan-build time).  All
    summed quantities are integer-valued doubles, so the regrouped
    additions are exact and the result is bit-identical to the global
    window.  The rounded path keeps the single bounded global window
    (≤ (hi−lo)·10^d + 1 rows by construction — cheaper than a shard
    shuffle for a provably small frame).
    """
    from pyspark.sql import Window

    s = F.col(score_col).cast("double")
    if score_round_to is not None:
        s = F.round(s, score_round_to)
    g = scored.where(F.col(score_col).isNotNull()).groupBy(
        s.alias("_s")
    ).agg(
        F.count("*").cast("double").alias("_n"),
        F.sum(F.when(F.col(label_col), 1).otherwise(0))
        .cast("double")
        .alias("_npos"),
    )
    if score_round_to is None:
        cum = _sharded_score_cumsum(g, n_shards=n_shards)
    else:
        w = (
            Window.orderBy("_s")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum = g.select(
            "_npos",
            "_n",
            F.coalesce(F.sum("_n").over(w), F.lit(0.0)).alias("_below"),
        )
    ranked = cum.select(
        "_npos",
        "_n",
        (F.col("_below") + (F.col("_n") + 1.0) / 2.0).alias("_avgrank"),
    )
    agg = ranked.agg(
        F.sum("_npos").alias("np"),
        (F.sum("_n") - F.sum("_npos")).alias("nn"),
        F.sum(F.col("_npos") * F.col("_avgrank")).alias("rsum"),
    )
    auc = F.when(
        (F.col("np") > 0) & (F.col("nn") > 0),
        F.round(
            (F.col("rsum") - F.col("np") * (F.col("np") + 1.0) / 2.0)
            / (F.col("np") * F.col("nn")),
            round_to,
        ),
    )
    return agg.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        auc.alias("auc"),
        F.round(auc * 2.0 - 1.0, round_to).alias("gini"),
    )
