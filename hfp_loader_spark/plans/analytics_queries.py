"""Corpus/embedding analytics catalog entries (SURVEY §2.11 extension tier).

Corpus-level boilerplate/duplicated-span detection and pre-training
chunking over ``documents``, per-dimension statistics over
``embeddings``, the single-shuffle windowed funnel twins (unbounded +
conversion-window), co-occurrence mining / anomaly gating / transition
matrices over ``events``, and the skew-diagnosis + table-profiling
operational reports.  The reference (HSLdevcom/hfp-loader) has no
analytics queries at all — it is a loader (SURVEY §0); this module is
"north star" surface built on the driver's synthetic tables, every
entry with an exact DuckDB oracle.

Scale shapes (100 TB):
- the windowed funnels are ONE exchange of events on ``user_id`` — all k
  step windows share a single partitioning+sort and the per-user
  aggregate reuses it (vs one shuffle per step for the join-chain form in
  ``funnel_view_click_purchase``; both exist deliberately, see
  ``operators.relational.funnel_counts_windowed``); the transition
  matrix rides the same exchange via lead();
- boilerplate AND duplicated-span document frequencies come from a count
  window over the gram partition of the exploded (doc, gram) rows — one
  corpus scan, one gram-keyed shuffle, no groupBy+self-join re-scan;
- chunking is narrow until a ~n_tokens/stride × explode whose output rows
  carry 16-byte md5s, not token arrays;
- embedding stats explode 64× but partial (map-side) aggregation folds
  them to 64 rows per partition before the only shuffle;
- co-occurrence distinct-compacts (user, type) BEFORE its self-join;
  outliers broadcast a |types|-row stats table back over the stream;
  skew/profile are single-pass mergeable aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hfp_loader_spark.operators.relational import funnel_counts_windowed
from hfp_loader_spark.operators.text import boilerplate_fractions, chunk_documents
from hfp_loader_spark.plans import money as _mny
from hfp_loader_spark.plans.catalog import TOKS_SQL, _t, defquery

_TOKS_SQL = TOKS_SQL  # the shared oracle tokenizer (plans.catalog)


@defquery(
    "events_funnel_windowed",
    """
    WITH s1 AS (
      SELECT user_id, ts, event_type, event_id,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS t1
      FROM events
    ), s2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS t2
      FROM s1
    ), s3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS t3
      FROM s2
    ), per_user AS (
      SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
      FROM s3 GROUP BY user_id
    ), c AS (
      SELECT CAST(count(t1) AS BIGINT) AS n1,
             CAST(count(t2) AS BIGINT) AS n2,
             CAST(count(t3) AS BIGINT) AS n3
      FROM per_user
    )
    SELECT 'view' AS step, CAST(1 AS INT) AS step_idx, n1 AS n_users FROM c
    UNION ALL
    SELECT 'click', CAST(2 AS INT), n2 FROM c
    UNION ALL
    SELECT 'purchase', CAST(3 AS INT), n3 FROM c
    """,
    doc="The sequential funnel re-planned as chained running-min windows "
    "sharing ONE exchange on user_id "
    "(operators.relational.funnel_counts_windowed) — the single-shuffle "
    "physical twin of funnel_view_click_purchase (join-chain, one "
    "shuffle per step); identical semantics, cross-checked row-for-row "
    "in tests/test_analytics.py. Oracle states the same chained windows "
    "in SQL.",
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    return funnel_counts_windowed(ev, ["view", "click", "purchase"])


@defquery(
    "text_boilerplate_by_source",
    f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS_SQL} AS t FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, source, t[i] || ' ' || t[i+1] AS g
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
      WHERE len(t) >= 2
    ), dfreq AS (
      SELECT g, count(*) AS df FROM grams GROUP BY g
    ), nd AS (
      SELECT count(*) AS nd FROM documents
    ), per_doc AS (
      SELECT doc_id, source, count(*) AS n_grams,
             sum(CASE WHEN df >= ceil(0.10 * (SELECT nd FROM nd))
                      THEN 1 ELSE 0 END) AS n_boiler
      FROM grams JOIN dfreq USING (g)
      GROUP BY doc_id, source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(CAST(n_boiler AS DOUBLE) / n_grams), 4) AS avg_boiler_frac,
           round(max(CAST(n_boiler AS DOUBLE) / n_grams), 4) AS max_boiler_frac
    FROM per_doc GROUP BY source
    """,
    doc="Corpus-frequent bigram boilerplate signal "
    "(operators.text.boilerplate_fractions, min_df 10% of docs): distinct "
    "per-doc bigrams → document frequencies via a count window on the "
    "gram partition (single corpus scan) → flag fraction per doc → "
    "per-source rollup. Cross-document repetition — the corpus-level "
    "complement of the per-document repetition_metrics gates.",
)
def text_boilerplate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    per_doc = boilerplate_fractions(
        docs, n=2, min_df_frac=0.10, extra_cols=("source",)
    )
    frac = F.col("n_boiler") / F.col("n_grams")
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.avg(frac), 4).alias("avg_boiler_frac"),
        F.round(F.max(frac), 4).alias("max_boiler_frac"),
    )


@defquery(
    "text_chunk_windows",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE text IS NOT NULL
    ), starts AS (
      SELECT doc_id, t,
             unnest(generate_series(0, CAST(greatest(len(t) - 1, 0) AS BIGINT),
                                    24)) AS s
      FROM toks
    )
    SELECT doc_id,
           CAST(s / 24 AS INT) AS chunk_id,
           CAST(len(t[s + 1 : s + 32]) AS INT) AS n_tokens,
           md5(coalesce(array_to_string(t[s + 1 : s + 32], ' '), '')) AS chunk_md5
    FROM starts
    """,
    doc="Pre-training token-window chunking "
    "(operators.text.chunk_documents, window 32 / stride 24): tokens "
    "bound once per doc, starts via posexplode(sequence), chunks carry "
    "md5 fingerprints so chunk-level dedup shuffles 16-byte keys.",
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, window=32, stride=24)


@defquery(
    "emb_dim_stats",
    """
    WITH idx AS (
      SELECT embedding,
             unnest(generate_series(1, len(embedding))) AS i
      FROM embeddings
    )
    -- + 0.0 after every rounded stat: a zero-centered dimension's mean
    -- rounds to IEEE -0.0 on DuckDB (sign-preserving round) and +0.0
    -- on Spark, and the value hash distinguishes them — bit on dims 9
    -- and 24 at sf0.1 (r13 hardened sweep)
    SELECT CAST(i - 1 AS INT) AS dim,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(CAST(embedding[i] AS DOUBLE)), 4) + 0.0 AS mean,
           round(stddev_pop(CAST(embedding[i] AS DOUBLE)), 4) + 0.0 AS std,
           round(min(CAST(embedding[i] AS DOUBLE)), 4) + 0.0 AS vmin,
           round(max(CAST(embedding[i] AS DOUBLE)), 4) + 0.0 AS vmax
    FROM idx GROUP BY dim
    """,
    doc="Per-dimension embedding statistics (mean/std/min/max via "
    "posexplode → groupBy pos): the feature-scaling prerequisite for "
    "standardized ANN; the 64× explode is folded back to 64 rows per "
    "partition by partial aggregation before the only shuffle. Rounded "
    "stats are negative-zero-normalized on both engines (a "
    "zero-centered dim's mean hit the -0.0 hash flip at sf0.1).",
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    x = F.col("x").cast("double")
    return (
        emb.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy(F.col("dim").cast("int").alias("dim"))
        .agg(
            F.count("*").cast("long").alias("n"),
            (F.round(F.avg(x), 4) + F.lit(0.0)).alias("mean"),
            (F.round(F.stddev_pop(x), 4) + F.lit(0.0)).alias("std"),
            (F.round(F.min(x), 4) + F.lit(0.0)).alias("vmin"),
            (F.round(F.max(x), 4) + F.lit(0.0)).alias("vmax"),
        )
    )


@defquery(
    "text_chunk_dedup_stats",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
      WHERE text IS NOT NULL
    ), starts AS (
      SELECT doc_id, t,
             unnest(generate_series(0, CAST(greatest(len(t) - 1, 0) AS BIGINT),
                                    24)) AS s
      FROM toks
    ), chunks AS (
      SELECT md5(coalesce(array_to_string(t[s + 1 : s + 32], ' '), '')) AS chunk_md5
      FROM starts
    )
    SELECT CAST(count(*) AS BIGINT)                          AS n_chunks,
           CAST(count(DISTINCT chunk_md5) AS BIGINT)         AS n_distinct,
           CAST(count(*) - count(DISTINCT chunk_md5) AS BIGINT) AS n_dup,
           round((count(*) - count(DISTINCT chunk_md5))
                 / CAST(count(*) AS DOUBLE), 4)              AS dup_frac
    FROM chunks
    """,
    doc="Chunk-level exact-dedup rate: chunk_documents feeding a "
    "count/count-distinct aggregate over the 16-byte chunk md5s — the "
    "granularity training pipelines actually dedup at (a doc repeated "
    "inside another doc dedups here but not at whole-doc fingerprint "
    "level). The distinct runs as a two-phase aggregate on fixed-width "
    "keys; no chunk text is ever shuffled.",
)
def text_chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, window=32, stride=24)
    return chunks.agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.countDistinct("chunk_md5").cast("long").alias("n_distinct"),
        (F.count("*") - F.countDistinct("chunk_md5"))
        .cast("long")
        .alias("n_dup"),
        F.round(
            (F.count("*") - F.countDistinct("chunk_md5"))
            / F.count("*").cast("double"),
            4,
        ).alias("dup_frac"),
    )


@defquery(
    "events_type_cooccurrence",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT count(DISTINCT user_id) AS n_users FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_users_both,
           round(count(*) / CAST((SELECT n_users FROM n) AS DOUBLE), 4)
             AS support
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY type_a, type_b
    """,
    doc="Pairwise event-type co-occurrence (market-basket support over "
    "users): distinct (user, type) compaction FIRST — so the per-user "
    "self-join is over at most |event-type-vocabulary| rows per user, "
    "never the raw stream — then a count per unordered type pair and "
    "support against the 1-row distinct-user broadcast. The classic "
    "co-occurrence mining shape: compact, self-join within key, "
    "aggregate.",
)
def events_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.alias("b")
    n = ev.agg(F.countDistinct("user_id").alias("n_users"))
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_users_both"))
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_users_both",
            F.round(
                F.col("n_users_both") / F.col("n_users").cast("double"), 4
            ).alias("support"),
        )
    )


@defquery(
    "events_value_outliers",
    """
    WITH stats AS (
      SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sigma
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN abs((e.value - s.mu) / nullif(s.sigma, 0)) > 3
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(max(abs((e.value - s.mu) / nullif(s.sigma, 0))), 4)
             AS max_abs_z
    FROM events e JOIN stats s USING (event_type)
    GROUP BY e.event_type
    """,
    doc="Z-score anomaly gate per event type: one aggregate pass pins "
    "(mean, stddev_pop) per type — a |types|-row table BROADCAST back "
    "onto the stream — then a second scan flags |z| > 3 and reports "
    "outlier counts and the max |z|. The data-monitoring primitive; "
    "two scans, one tiny broadcast, no window over the raw stream.",
)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    z = F.abs(
        (F.col("value") - F.col("mu")) / F.nullif(F.col("sigma"), F.lit(0))
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.when(z > 3, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            F.round(F.max(z), 4).alias("max_abs_z"),
        )
    )


@defquery(
    "events_funnel_time_bounded",
    """
    WITH s1 AS (
      SELECT user_id, ts, event_type, event_id,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS t1
      FROM events
    ), s2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
                          AND ts <= t1 + INTERVAL '48' HOUR THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS t2
      FROM s1
    ), s3 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
                          AND ts <= t2 + INTERVAL '48' HOUR THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS t3
      FROM s2
    ), per_user AS (
      SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
      FROM s3 GROUP BY user_id
    ), c AS (
      SELECT CAST(count(t1) AS BIGINT) AS n1,
             CAST(count(t2) AS BIGINT) AS n2,
             CAST(count(t3) AS BIGINT) AS n3
      FROM per_user
    )
    SELECT 'view' AS step, CAST(1 AS INT) AS step_idx, n1 AS n_users FROM c
    UNION ALL
    SELECT 'click', CAST(2 AS INT), n2 FROM c
    UNION ALL
    SELECT 'purchase', CAST(3 AS INT), n3 FROM c
    """,
    doc="The conversion-window funnel (each step must land within 48h of "
    "the previous anchor) — the variant every funnel product offers, on "
    "the same single-exchange chained-window plan as "
    "events_funnel_windowed; the gap predicate rides inside the running-"
    "min CASE, costing nothing extra.",
)
def events_funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    return funnel_counts_windowed(
        ev, ["view", "click", "purchase"], max_gap_seconds=48 * 3600
    )


@defquery(
    "events_transition_matrix",
    """
    WITH nxt AS (
      SELECT event_type AS type_from,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS type_to
      FROM events
    ), trans AS (
      SELECT type_from, type_to, count(*) AS n_trans
      FROM nxt WHERE type_to IS NOT NULL
      GROUP BY type_from, type_to
    )
    SELECT type_from, type_to,
           CAST(n_trans AS BIGINT) AS n_trans,
           round(n_trans / CAST(sum(n_trans) OVER (PARTITION BY type_from)
                                AS DOUBLE), 4) AS prob
    FROM trans
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lead() on the user_id exchange pairs each event with its "
    "successor, counts aggregate per (from, to), and row-normalized "
    "probabilities come from a window over the |types|^2-row RESULT — "
    "the clickstream path-analysis primitive; the raw stream is "
    "shuffled once.",
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("type_from"),
            F.lead("event_type").over(w).alias("type_to"),
        )
        .where(F.col("type_to").isNotNull())
        .groupBy("type_from", "type_to")
        .agg(F.count("*").cast("long").alias("n_trans"))
    )
    total = Window.partitionBy("type_from")
    return trans.select(
        "type_from",
        "type_to",
        "n_trans",
        F.round(
            F.col("n_trans") / F.sum("n_trans").over(total).cast("double"), 4
        ).alias("prob"),
    )


@defquery(
    "text_duplicate_ngram_spans",
    f"""
    WITH toks AS (
      SELECT doc_id, source, {_TOKS_SQL} AS t FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, source, array_to_string(t[i : i + 7], ' ') AS g
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 7)) AS i)
      WHERE len(t) >= 8
    ), dfreq AS (
      SELECT g, count(*) AS df FROM grams GROUP BY g
    ), per_doc AS (
      SELECT doc_id, source, count(*) AS n_grams,
             sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS n_dup
      FROM grams JOIN dfreq USING (g)
      GROUP BY doc_id, source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_dup > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS docs_with_dup_spans,
           CAST(sum(n_dup) AS BIGINT) AS dup_spans
    FROM per_doc GROUP BY source
    """,
    doc="Duplicated-substring signal (the exact-substring dedup metric of "
    "Lee et al., 'Deduplicating Training Data Makes Language Models "
    "Better', at 8-gram granularity): per doc, distinct word 8-grams "
    "shared with AT LEAST ONE other document (document frequency >= 2 "
    "via the count-window on the gram partition — single corpus scan, "
    "same plan as the boilerplate entry with an absolute min_df), "
    "rolled up per source. Chunk-level md5 dedup catches whole-window "
    "repeats; this catches arbitrary-alignment span sharing.",
)
def text_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    per_doc = boilerplate_fractions(
        docs, n=8, min_df=2, extra_cols=("source",)
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("n_boiler") > 0, 1).otherwise(0))
        .cast("long")
        .alias("docs_with_dup_spans"),
        F.sum("n_boiler").cast("long").alias("dup_spans"),
    )


@defquery(
    "text_remove_duplicate_spans",
    r"""
    WITH toks AS (
      SELECT doc_id, text,
             list_filter(regexp_split_to_array(text, '\s+'),
                         t -> len(t) > 0) AS t
      FROM documents
    ), occ AS (
      SELECT doc_id, i AS pos, array_to_string(t[i+1 : i+8], ' ') AS g
      FROM toks,
           LATERAL (SELECT unnest(generate_series(0, len(t) - 8)) AS i)
      WHERE len(t) >= 8
    ), ranked AS (
      SELECT doc_id, pos,
             count(*)     OVER (PARTITION BY g) AS c,
             row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
      FROM occ
    ), rem AS (
      SELECT DISTINCT doc_id, pos + j AS p
      FROM ranked, LATERAL (SELECT unnest(generate_series(0, 7)) AS j)
      WHERE c >= 2 AND rn > 1
    ), tok_rows AS (
      SELECT doc_id, i - 1 AS p, t[i] AS tok
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i)
    ), kept AS (
      SELECT tr.doc_id,
             string_agg(tr.tok, ' ' ORDER BY tr.p)
               FILTER (WHERE r.p IS NULL) AS new_text,
             count(*) FILTER (WHERE r.p IS NOT NULL) AS n_rm
      FROM tok_rows tr
      LEFT JOIN rem r ON tr.doc_id = r.doc_id AND tr.p = r.p
      GROUP BY tr.doc_id
    )
    SELECT d.doc_id,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE coalesce(k.new_text, '') END AS text,
           CAST(coalesce(len(tk.t), 0) AS INT) AS n_tokens,
           CAST(coalesce(k.n_rm, 0)   AS INT) AS n_removed
    FROM documents d
    LEFT JOIN toks tk ON d.doc_id = tk.doc_id
    LEFT JOIN kept k  ON d.doc_id = k.doc_id
    """,
    doc="Duplicated-span SURGERY (operators.text.remove_duplicate_spans) — "
    "the removal counterpart of the text_duplicate_ngram_spans "
    "measurement, per Lee et al. §4 exact-substring dedup at word "
    "8-grams: every n-gram occurring ≥2× corpus-wide keeps its "
    "corpus-wide FIRST occurrence (min (doc_id, pos)) and every other "
    "occurrence's covered tokens are excised; the trimmed text is the "
    "single-space re-join of surviving tokens (case and punctuation "
    "preserved — only inter-token whitespace normalizes). Scale shape: "
    "grams hash to 8 bytes in one projection over the bound token "
    "array, duplicate detection is a constant-state groupBy (count + "
    "min-struct canonical — no posting lists, no window sort), covered "
    "positions fold back per doc via collect_set, and reconstruction "
    "is a doc-local array filter: tokens are never shuffled. The "
    "oracle restates the contract with the gram STRINGS and a "
    "row_number canonical — agreeing with the hash path bit-for-bit "
    "on every doc_id/text/n_tokens/n_removed.",
)
def text_remove_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.text import remove_duplicate_spans

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_duplicate_spans(docs, n=8)


@defquery(
    "dq_skew_report",
    f"""
    WITH per_key AS (
      SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
    )
    -- integer-quotient stats round TIE-FREE via integer half-up
    -- (plans.money discipline): exact rationals land ON 4dp rounding
    -- ties, where the engines' round() implementations can disagree
    SELECT CAST(count(*) AS BIGINT)            AS n_keys,
           CAST(max(cnt) AS BIGINT)            AS max_rows_per_key,
           {_mny._sql_int_avg("sum(CAST(cnt AS HUGEINT))", 4, 1)}
             AS avg_rows_per_key,
           CAST((2 * 10000 * CAST(max(cnt) AS HUGEINT) * count(*)
                 + sum(CAST(cnt AS HUGEINT)))
                // (2 * sum(CAST(cnt AS HUGEINT))) AS DOUBLE) / 10000.0
             AS skew_ratio,
           CAST(quantile_disc(cnt, 0.99) AS BIGINT) AS p99_rows_per_key
    FROM per_key
    """,
    doc="Join-key skew diagnosis for events.user_id: per-key cardinality "
    "profile (max / avg / discrete p99 / max-to-mean skew ratio) — the "
    "report that decides whether a 100 TB join on this key needs "
    "salting or AQE skew handling BEFORE it runs. One aggregate over "
    "the key, one over the (small) per-key counts; the raw stream is "
    "shuffled once. percentile_approx at the catalog's standard "
    "accuracy 10000 — exact at gate scale (≪10k distinct count values) "
    "and GK-sketch-bounded at billions of keys, where an exact-retain "
    "sketch would OOM the final merge; oracle = quantile_disc.",
)
def dq_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    dec = "decimal(38,0)"
    s_cnt = F.sum(F.col("cnt").cast(dec))
    # skew = max/(sum/n) = max*n/sum, integer half-up at 4dp (tie-free)
    skew_t = (
        F.max("cnt").cast(dec) * F.count("*").cast(dec)
        * F.lit(2 * 10000).cast(dec)
        + s_cnt
    )
    skew_m = s_cnt * F.lit(2).cast(dec)
    return per_key.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_rows_per_key"),
        _mny._int_avg(s_cnt, F.count("*"), 4, 1).alias("avg_rows_per_key"),
        (
            ((skew_t - skew_t % skew_m) / skew_m).cast("double") / 10000.0
        ).alias("skew_ratio"),
        F.expr("percentile_approx(cnt, 0.99, 10000)")
        .cast("long")
        .alias("p99_rows_per_key"),
    )


@defquery(
    "profile_documents_table",
    f"""
    SELECT CAST(count(*) AS BIGINT)                       AS n_rows,
           CAST(count(*) - count(text) AS BIGINT)         AS text_nulls,
           CAST(count(DISTINCT lang) AS BIGINT)           AS lang_distinct,
           CAST(count(DISTINCT source) AS BIGINT)         AS source_distinct,
           -- tie-free integer half-up (integer-quotient average)
           {_mny._sql_int_avg("sum(CAST(n_chars AS HUGEINT))", 4, 1,
                              count_sql="count(n_chars)")}
             AS avg_n_chars,
           CAST(min(n_chars) AS BIGINT)                   AS min_n_chars,
           CAST(max(n_chars) AS BIGINT)                   AS max_n_chars
    FROM documents
    """,
    doc="Table profiling (the ANALYZE-style summary a pipeline emits per "
    "snapshot): row count, null counts, distinct cardinalities of the "
    "partition-candidate columns, numeric column envelope — one pass, "
    "all mergeable aggregates, the input to layout decisions "
    "(partition-by-source? bucket count?) at 100 TB.",
)
def profile_documents_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").cast("long").alias("n_rows"),
        (F.count("*") - F.count("text")).cast("long").alias("text_nulls"),
        F.countDistinct("lang").cast("long").alias("lang_distinct"),
        F.countDistinct("source").cast("long").alias("source_distinct"),
        _mny._int_avg(
            F.sum(F.col("n_chars").cast("decimal(38,0)")),
            F.count("n_chars"),
            4,
            1,
        ).alias("avg_n_chars"),
        F.min("n_chars").cast("long").alias("min_n_chars"),
        F.max("n_chars").cast("long").alias("max_n_chars"),
    )


@defquery(
    "timeseries_ewma_daily",
    # the decay weights are emitted as repr(0.7**j) so both engines
    # compute with BIT-IDENTICAL doubles — a hand-written 0.49 differs
    # from Python's 0.7**2 (0.48999999999999994) in the last ulp, and
    # the value-hash comparison has no tolerance
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d, round(sum(value), 4) AS v
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT d, v,
             lag(v, 1) OVER w AS v1, lag(v, 2) OVER w AS v2,
             lag(v, 3) OVER w AS v3, lag(v, 4) OVER w AS v4,
             lag(v, 5) OVER w AS v5, lag(v, 6) OVER w AS v6,
             lag(v, 7) OVER w AS v7
      FROM daily WINDOW w AS (ORDER BY d)
    )
    SELECT d, v,
           round((v + coalesce(v1,0)*0.7::DOUBLE + coalesce(v2,0)*0.48999999999999994::DOUBLE + coalesce(v3,0)*0.3429999999999999::DOUBLE + coalesce(v4,0)*0.24009999999999995::DOUBLE + coalesce(v5,0)*0.16806999999999994::DOUBLE + coalesce(v6,0)*0.11764899999999996::DOUBLE + coalesce(v7,0)*0.08235429999999996::DOUBLE)
                 / (1 + CASE WHEN v1 IS NULL THEN 0 ELSE 0.7::DOUBLE END + CASE WHEN v2 IS NULL THEN 0 ELSE 0.48999999999999994::DOUBLE END + CASE WHEN v3 IS NULL THEN 0 ELSE 0.3429999999999999::DOUBLE END + CASE WHEN v4 IS NULL THEN 0 ELSE 0.24009999999999995::DOUBLE END + CASE WHEN v5 IS NULL THEN 0 ELSE 0.16806999999999994::DOUBLE END + CASE WHEN v6 IS NULL THEN 0 ELSE 0.11764899999999996::DOUBLE END + CASE WHEN v7 IS NULL THEN 0 ELSE 0.08235429999999996::DOUBLE END), 4) AS ewma
    FROM lagged
    """,
    doc="Exponentially weighted moving average (alpha=0.3, trailing 8 "
    "OBSERVATIONS of the daily series — row offsets, so a gapped series "
    "weights the previous observation as adjacent; compose with the "
    "gap-fill spine first for calendar-faithful decay) of daily event "
    "value totals: weights (1-alpha)^j as plan-time literals over "
    "explicit lag() taps, normalized by the weights actually present so "
    "the series head is unbiased — the smoothing primitive dashboards "
    "and anomaly baselines run. The daily rollup reduces the stream "
    "BEFORE the ordered window, so the single-partition sort is over "
    "|days| rows, not events (bounded special case, same argument as "
    "the gap-fill spine).",
)
def timeseries_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import ewma

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.round(F.sum("value"), 4).alias("v")
    )
    # empty key list = the documented bounded special case (|days| rows)
    return ewma(daily, [], "d", "v", alpha=0.3, taps=8).select(
        "d", "v", "ewma"
    )


# decay weights emitted as repr(0.7**j) so both engines compute with
# BIT-IDENTICAL doubles (same trick as timeseries_ewma_daily)
_EWMA_W = {j: repr(0.7**j) for j in range(1, 8)}


@defquery(
    "timeseries_ewma_per_user",
    f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d, round(sum(value), 4) AS v
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT user_id, d, v,
             {", ".join(f"lag(v, {j}) OVER w AS v{j}" for j in range(1, 8))}
      FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY d)
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, d, v,
           round((v + {" + ".join(f"coalesce(v{j},0)*{_EWMA_W[j]}::DOUBLE" for j in range(1, 8))})
                 / (1 + {" + ".join(f"CASE WHEN v{j} IS NULL THEN 0 ELSE {_EWMA_W[j]}::DOUBLE END" for j in range(1, 8))}),
                 4) AS ewma
    FROM lagged
    """,
    doc="PER-KEY EWMA (operators.relational.ewma, alpha=0.3, 8 trailing "
    "observations) over each user's daily value series — the API-default "
    "shape of the smoothing operator: Window.partitionBy(user_id) "
    "distributes the sort by key, all 7 lag taps share one shuffle, and "
    "NO single-partition WindowExec appears in the plan (the global-"
    "spine form timeseries_ewma_daily stays the documented bounded "
    "special case). Head-unbiased via present-weight normalization, "
    "decay literals bit-identical across engines.",
)
def timeseries_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import ewma

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("user_id").cast("long").alias("user_id"),
        F.to_date("ts").alias("d"),
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    return ewma(daily, ["user_id"], "d", "v", alpha=0.3, taps=8).select(
        "user_id", "d", "v", "ewma"
    )


@defquery(
    "events_funnel_per_session",
    """
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, ts, event_type,
             sum(new_session) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM marked
    ),
    s1 AS (
      SELECT user_id, session_id, ts, event_type, event_id,
             min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS t1
      FROM sess
    ), s2 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
               OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS t2
      FROM s1
    ), per_sess AS (
      SELECT user_id, session_id, min(t1) AS t1, min(t2) AS t2
      FROM s2 GROUP BY user_id, session_id
    ), c AS (
      SELECT CAST(count(t1) AS BIGINT) AS n1,
             CAST(count(t2) AS BIGINT) AS n2
      FROM per_sess
    )
    SELECT 'view' AS step, CAST(1 AS INT) AS step_idx, n1 AS n_sessions FROM c
    UNION ALL
    SELECT 'click', CAST(2 AS INT), n2 FROM c
    """,
    doc="Within-session funnel (view → click inside ONE 30-min-gap "
    "session): operator COMPOSITION — sessionize's lag+cumsum islands "
    "assign the session number, then funnel_counts_windowed partitions "
    "its chained running-min windows by the (user_id, session_id) "
    "COLUMN PAIR. Keeping the pair (not a concatenated key) lets "
    "hashpartitioning(user_id) from the sessionize exchange satisfy the "
    "funnel's clustering (subset-of-keys rule), so the whole "
    "composition is genuinely ONE shuffle — a derived concat column "
    "forced a second full exchange in the first cut (plan-audited). "
    "The oracle replicates sessionize's floor-second gap semantics "
    "(date_diff('second') ≡ Spark's cast-to-long difference). Counts "
    "sessions, not users.",
)
def events_funnel_per_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import sessionize

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    sess = sessionize(ev, "user_id", "ts", gap_seconds=1800)
    out = funnel_counts_windowed(
        sess, ["view", "click"], id_col=["user_id", "session_id"]
    )
    return out.select(
        "step",
        "step_idx",
        F.col("n_users").alias("n_sessions"),
    )


@defquery(
    "dq_ks_source_drift",
    """
    WITH c AS (
      SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
      WHERE n_chars >= 0
    ),
    b AS (
      -- log-linear bucket floor: top 6 significant bits, rest zeroed
      SELECT source,
             (v >> greatest(length(bin(v)) - 6, 0))
               << greatest(length(bin(v)) - 6, 0) AS bucket_lo
      FROM c
    ),
    m AS (SELECT source, bucket_lo, CAST(count(*) AS BIGINT) AS cnt
          FROM b GROUP BY 1, 2),
    grid AS (
      SELECT s.source, k.bucket_lo
      FROM (SELECT DISTINCT source FROM m) s,
           (SELECT DISTINCT bucket_lo FROM m) k
    ),
    f AS (
      SELECT g.source, g.bucket_lo, coalesce(m.cnt, 0) AS cnt
      FROM grid g LEFT JOIN m USING (source, bucket_lo)
    ),
    cs AS (
      SELECT source, bucket_lo,
             sum(cnt) OVER (PARTITION BY source ORDER BY bucket_lo) AS cum
      FROM f
    ),
    gg AS (SELECT bucket_lo, sum(cnt) AS gcnt FROM m GROUP BY 1),
    cg AS (SELECT bucket_lo,
                  sum(gcnt) OVER (ORDER BY bucket_lo) AS gcum
           FROM gg),
    tot AS (SELECT source, sum(cnt) AS n_rows FROM m GROUP BY 1),
    n AS (SELECT sum(cnt) AS nn FROM m)
    SELECT source, CAST(n_rows AS BIGINT) AS n_rows,
           round(max(abs(cum / CAST(n_rows AS DOUBLE)
                         - (gcum - cum) / CAST(nn - n_rows AS DOUBLE))), 4)
             AS ks_d
    FROM cs JOIN cg USING (bucket_lo) JOIN tot USING (source) CROSS JOIN n
    WHERE nn > n_rows
    GROUP BY source, n_rows
    """,
    doc="Per-source Kolmogorov–Smirnov drift of the n_chars "
    "distribution vs the rest of the corpus (operators.sketches."
    "qhist_ks_drift), computed ENTIRELY over log-linear histogram "
    "sketches — the slice audit that finds a source whose length "
    "distribution wandered without sorting any data. D is the true KS "
    "statistic of the bucketed distributions (per-bucket counts are "
    "exact; only shifts narrower than one ≤3.1%-wide bucket can hide). "
    "Scale shape: one bounded-key hash aggregate builds the sketch; "
    "every window and join after it runs on sketch rows (sources × "
    "≤ ~2k buckets), never on data.",
)
def dq_ks_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.sketches import qhist_ks_drift

    return qhist_ks_drift(
        _t(spark, sf_dir, "documents"), "n_chars", "source"
    )


@defquery(
    "events_ab_conversion_lift",
    """
    WITH fv AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    conv AS (
      SELECT DISTINCT e.user_id
      FROM events e JOIN fv ON e.user_id = fv.user_id
      WHERE e.event_type = 'purchase' AND e.ts > fv.t
    ),
    armed AS (
      SELECT fv.user_id,
             CASE WHEN substr(md5(CAST(fv.user_id AS VARCHAR)), 1, 1) < '8'
                  THEN 'A' ELSE 'B' END AS arm,
             CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END AS c
      FROM fv LEFT JOIN conv ON fv.user_id = conv.user_id
    ),
    s AS (
      SELECT
        CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS base_a,
        CAST(sum(CASE WHEN arm = 'A' THEN c ELSE 0 END) AS BIGINT) AS conv_a,
        CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS base_b,
        CAST(sum(CASE WHEN arm = 'B' THEN c ELSE 0 END) AS BIGINT) AS conv_b
      FROM armed
    )
    SELECT base_a, conv_a,
           round(CAST(conv_a AS DOUBLE) / CAST(base_a AS DOUBLE), 6)
             AS rate_a,
           base_b, conv_b,
           round(CAST(conv_b AS DOUBLE) / CAST(base_b AS DOUBLE), 6)
             AS rate_b,
           round(CAST(conv_a * base_b AS DOUBLE)
                 / CAST(nullif(conv_b * base_a, 0) AS DOUBLE), 6) AS lift
    FROM s
    """,
    doc="A/B experiment readout: users split into deterministic arms by "
    "an md5 first-hex-digit coin (engine-portable, stable under data "
    "growth — the sampling tier's hash-threshold trick applied to "
    "experimentation), conversion = a purchase STRICTLY AFTER the "
    "user's first view (the funnel tier's anchor semantics), lift "
    "computed from exact integer counts with ONE division + round "
    "(conv_a·base_b / conv_b·base_a — never a ratio of two rounded "
    "rates; nullif guards the degenerate arm). Scale shape: one "
    "per-user min, one type-filtered join back, one conditional "
    "aggregate to a single row.",
)
def events_ab_conversion_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .where(F.col("ts") > F.col("t"))
        .select("user_id")
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    armed = fv.join(conv, "user_id", "left").select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
            "A",
        )
        .otherwise("B")
        .alias("arm"),
        F.coalesce(F.col("_c"), F.lit(0)).alias("c"),
    )
    s = armed.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0))
        .cast("long")
        .alias("base_a"),
        F.sum(F.when(F.col("arm") == "A", F.col("c")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0))
        .cast("long")
        .alias("base_b"),
        F.sum(F.when(F.col("arm") == "B", F.col("c")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    return s.select(
        "base_a",
        "conv_a",
        F.round(
            F.col("conv_a").cast("double") / F.col("base_a").cast("double"),
            6,
        ).alias("rate_a"),
        "base_b",
        "conv_b",
        F.round(
            F.col("conv_b").cast("double") / F.col("base_b").cast("double"),
            6,
        ).alias("rate_b"),
        F.round(
            (F.col("conv_a") * F.col("base_b")).cast("double")
            / F.nullif(
                (F.col("conv_b") * F.col("base_a")), F.lit(0)
            ).cast("double"),
            6,
        ).alias("lift"),
    )


def _markov_stationary_oracle(n_iter: int = 4) -> str:
    """The transition-count CTE + the integer stationary recurrence
    unrolled — SQL twin of operators.graph.markov_stationary."""
    def fd(a: str, b: str) -> str:
        return f"((({a}) - ((({a}) % ({b})) + ({b})) % ({b})) // ({b}))"

    parts = [f"""
    WITH nxt AS (
      SELECT event_type AS type_from,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS type_to
      FROM events
    ),
    trans AS (
      SELECT type_from, type_to, CAST(count(*) AS HUGEINT) AS n_trans
      FROM nxt WHERE type_to IS NOT NULL
      GROUP BY type_from, type_to
    ),
    states AS (SELECT DISTINCT type_from AS state FROM trans),
    c AS (
      SELECT type_from AS s, type_to AS t, n_trans AS c
      FROM trans WHERE type_to IN (SELECT state FROM states)
    ),
    r AS (SELECT s, CAST(sum(c) AS HUGEINT) AS rsum FROM c GROUP BY s),
    p0 AS (SELECT state AS s, CAST(1000000 AS HUGEINT) AS p FROM states)"""]
    for t in range(1, n_iter + 1):
        parts.append(f""",
    raw{t} AS (
      SELECT c.t AS t,
             CAST(sum({fd("p * c", "rsum")}) AS HUGEINT) AS raw
      FROM c
      JOIN r ON r.s = c.s
      JOIN p{t - 1} ON p{t - 1}.s = c.s
      GROUP BY c.t
    ),
    tot{t} AS (
      SELECT greatest(CAST(sum(raw) AS HUGEINT), CAST(1 AS HUGEINT))
               AS tot
      FROM raw{t}
    ),
    p{t} AS (
      SELECT t AS s, {fd("raw * CAST(1000000 AS HUGEINT)", "tot")} AS p
      FROM raw{t} CROSS JOIN tot{t}
    )""")
    parts.append(f"""
    SELECT s AS event_type, CAST(p AS BIGINT) AS pi_q,
           round(CAST(p AS DOUBLE) / 1e6, 6) AS pi
    FROM p{n_iter}
    """)
    return "".join(parts)


@defquery(
    "events_markov_stationary",
    _markov_stationary_oracle(4),
    doc="Stationary distribution of the clickstream Markov chain "
    "(operators.graph.markov_stationary, 4 fixed-point rounds): where "
    "does a long random session SPEND its time — the chain-level "
    "complement of events_transition_matrix's one-step view. The "
    "integer power-iteration recurrence (per-edge floors against the "
    "source row sum, renormalize by flooring against the total) "
    "replays bit-for-bit in the unrolled SQL oracle. The event stream "
    "is touched once (the lead() count aggregate); the iteration runs "
    "on the |types|²-row matrix.",
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from hfp_loader_spark.operators.graph import markov_stationary

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("type_from"),
            F.lead("event_type").over(w).alias("type_to"),
        )
        .where(F.col("type_to").isNotNull())
        .groupBy("type_from", "type_to")
        .agg(F.count("*").cast("long").alias("n_trans"))
    )
    pi = markov_stationary(trans, n_iter=4)
    return pi.select(
        F.col("state").alias("event_type"),
        "pi_q",
        F.round(F.col("pi_q").cast("double") / F.lit(1e6), 6).alias("pi"),
    )


@defquery(
    "agg_gini_revenue_by_nation",
    """
    WITH rev AS (
      SELECT c.c_custkey, c.c_nationkey,
             CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)),
                           0) AS BIGINT) AS cents
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    rk AS (
      SELECT c_nationkey, cents,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY cents, c_custkey) AS i
      FROM rev
    ),
    ag AS (
      SELECT c_nationkey,
             CAST(count(*) AS HUGEINT)          AS n,
             CAST(sum(cents) AS HUGEINT)        AS sx,
             CAST(sum(i * cents) AS HUGEINT)    AS six
      FROM rk GROUP BY 1
    )
    SELECT n_name,
           CAST(n AS BIGINT) AS n_customers,
           round(CAST(2 * six - (n + 1) * sx AS DOUBLE)
                 / CAST(n * sx AS DOUBLE), 6) AS gini
    FROM ag JOIN nation ON n_nationkey = c_nationkey
    """,
    doc="Gini coefficient of customer revenue per nation — the "
    "inequality / concentration audit (a data-mixture analogue: how "
    "skewed is contribution across members of a group). Revenue "
    "quantized to integer cents so the rank-weighted sums are exact; "
    "G = (2Σi·xᵢ − (n+1)Σx) / (n·Σx) with deterministic (revenue, "
    "custkey) tiebreaks — ONE division + round. Scale shape: the rank "
    "window partitions by nation (per-group sort, never global), then "
    "one constant-state aggregate per nation; customers without "
    "orders count at zero revenue.",
)
def agg_gini_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    rev = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).alias("cents"))
    )
    w = Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
    dec = "decimal(38,0)"
    rk = rev.withColumn("i", F.row_number().over(w).cast(dec))
    ag = rk.groupBy("c_nationkey").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("cents").cast(dec)).alias("sx"),
        F.sum(F.col("i") * F.col("cents").cast(dec)).alias("six"),
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    two = F.lit(2).cast(dec)
    one = F.lit(1).cast(dec)
    return ag.join(
        F.broadcast(nation), ag.c_nationkey == nation.n_nationkey
    ).select(
        "n_name",
        F.col("n").cast("long").alias("n_customers"),
        F.round(
            (two * F.col("six") - (F.col("n") + one) * F.col("sx")).cast(
                "double"
            )
            / (F.col("n") * F.col("sx")).cast("double"),
            6,
        ).alias("gini"),
    )


@defquery(
    "customer_rfm_segments",
    """
    WITH mx AS (SELECT max(o_orderdate) AS md FROM orders),
    rfm AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate), mx.md) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS monetary_cents
      FROM orders CROSS JOIN mx
      GROUP BY o_custkey, mx.md
    ),
    seg AS (
      SELECT o_custkey,
             CASE WHEN recency_days <= 365 THEN 'R1'
                  WHEN recency_days <= 1095 THEN 'R2' ELSE 'R3' END
               AS r_bin,
             CASE WHEN frequency >= 20 THEN 'F1'
                  WHEN frequency >= 10 THEN 'F2' ELSE 'F3' END AS f_bin,
             CASE WHEN monetary_cents >= 300000000 THEN 'M1'
                  WHEN monetary_cents >= 100000000 THEN 'M2'
                  ELSE 'M3' END AS m_bin,
             monetary_cents
      FROM rfm
    )
    SELECT r_bin || f_bin || m_bin AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(monetary_cents) AS BIGINT) AS total_cents,
           CAST(min(o_custkey) AS BIGINT) AS min_custkey
    FROM seg GROUP BY 1
    """,
    doc="RFM (recency / frequency / monetary) customer segmentation — "
    "the canonical warehouse cohorting query: per customer, days since "
    "last order vs the corpus max date, order count, and exact "
    "integer-cent lifetime value, bucketed by FIXED literal edges "
    "(data-derived quantile edges would need a global sort; fixed "
    "edges keep segments stable across runs and scales — the "
    "text_quality_bin_budget argument). One customer-keyed aggregate + "
    "a ≤27-row rollup; the max-date scalar broadcasts.",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    mx = orders.agg(F.max("o_orderdate").alias("md"))
    rfm = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "md")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count("*").alias("frequency"),
            F.sum("cents").alias("monetary_cents"),
        )
        .select(
            "o_custkey",
            F.datediff(F.col("md"), F.col("_last")).alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    r_bin = (
        F.when(F.col("recency_days") <= 365, "R1")
        .when(F.col("recency_days") <= 1095, "R2")
        .otherwise("R3")
    )
    f_bin = (
        F.when(F.col("frequency") >= 20, "F1")
        .when(F.col("frequency") >= 10, "F2")
        .otherwise("F3")
    )
    m_bin = (
        F.when(F.col("monetary_cents") >= 300000000, "M1")
        .when(F.col("monetary_cents") >= 100000000, "M2")
        .otherwise("M3")
    )
    return (
        rfm.select(
            "o_custkey",
            F.concat(r_bin, f_bin, m_bin).alias("segment"),
            "monetary_cents",
        )
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("monetary_cents").alias("total_cents"),
            F.min("o_custkey").alias("min_custkey"),
        )
    )


@defquery(
    "events_bounce_rate_daily",
    """
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER win IS NULL
                       OR date_diff('second', lag(ts) OVER win, ts) > 600
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts)
    ),
    islands AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM marked
    ),
    sessions AS (
      SELECT user_id, session_no,
             CAST(min(ts) AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_events
      FROM islands GROUP BY 1, 2
    )
    SELECT day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
             AS bounce_rate
    FROM sessions GROUP BY day
    """,
    doc="Daily bounce rate from batch sessionization "
    "(operators.relational.sessionize, 10-min gap): fraction of "
    "sessions with exactly one event, by session-start day — the "
    "product-analytics health metric, and a worked example that the "
    "islands session ids are TIE-INVARIANT (equal timestamps always "
    "land in the same session whichever order the window visits them, "
    "so the unordered-tie window is still deterministic in "
    "aggregate). One user-keyed exchange shared by both window "
    "passes, then two bounded rollups.",
)
def events_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import sessionize

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    ses = sessionize(ev, "user_id", "ts", 600)
    sessions = ses.groupBy("user_id", "session_id").agg(
        F.min("ts").cast("date").alias("day"),
        F.count("*").alias("n_events"),
    )
    bounce = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return sessions.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        bounce.cast("long").alias("n_bounces"),
        F.round(
            bounce.cast("double") / F.count("*").cast("double"), 4
        ).alias("bounce_rate"),
    )


@defquery(
    "orders_cohort_ltv",
    """
    WITH first AS (
      SELECT o_custkey,
             CAST(min(year(o_orderdate)) AS INT) AS cohort_year
      FROM orders GROUP BY 1
    ),
    rev AS (
      SELECT f.cohort_year,
             CAST(year(o.o_orderdate) AS INT) - f.cohort_year AS age_years,
             o.o_custkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN first f ON f.o_custkey = o.o_custkey
    )
    SELECT cohort_year, age_years,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM rev GROUP BY 1, 2
    """,
    doc="Cohort lifetime value: customers grouped by first-order year, "
    "revenue tracked by cohort age — the LTV triangle every "
    "subscription/marketplace warehouse maintains (the orders twin of "
    "cohort_weekly_retention's event-side view). Exact integer cents; "
    "one customer-keyed min, one broadcast-able join back, one "
    "(cohort, age) rollup.",
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    first = orders.groupBy("o_custkey").agg(
        F.min("yr").alias("cohort_year")
    )
    rev = orders.join(first, "o_custkey").select(
        "cohort_year",
        (F.col("yr") - F.col("cohort_year")).alias("age_years"),
        "o_custkey",
        "cents",
    )
    return rev.groupBy("cohort_year", "age_years").agg(
        F.countDistinct("o_custkey").alias("n_active"),
        F.sum("cents").alias("revenue_cents"),
    )


@defquery(
    "events_dau_wau_stickiness",
    """
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    ),
    active AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    dau AS (
      SELECT day, CAST(count(*) AS BIGINT) AS dau FROM active GROUP BY 1
    ),
    wau AS (
      SELECT d.day, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
      FROM days d JOIN active a
        ON a.day BETWEEN d.day - INTERVAL '6 days' AND d.day
      GROUP BY d.day
    )
    SELECT dau.day, dau.dau, wau.wau,
           round(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 4)
             AS stickiness
    FROM dau JOIN wau ON wau.day = dau.day
    """,
    doc="DAU/WAU stickiness per day — the engagement-health ratio, "
    "computed EXACTLY: distinct (day, user) once, daily actives by "
    "count, trailing-7-day actives via a bounded day×active range "
    "join (the day dimension is tiny — the join is broadcast — so "
    "exactness is affordable; sketch_sliding_distinct is the same "
    "question answered from mergeable HLL sketches when the day "
    "dimension isn't small). One division + round.",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    active = ev.distinct()
    days = active.select("day").distinct()
    dau = active.groupBy("day").agg(F.count("*").alias("dau"))
    d2 = days.select(F.col("day").alias("d"))
    wau = (
        F.broadcast(d2)
        .join(
            active,
            (F.col("day") >= F.date_sub(F.col("d"), 6))
            & (F.col("day") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, dau.day == wau.d).select(
        "day",
        "dau",
        "wau",
        F.round(
            F.col("dau").cast("double") / F.col("wau").cast("double"), 4
        ).alias("stickiness"),
    )


@defquery(
    "events_hourly_reliability",
    """
    WITH h AS (
      SELECT CAST(hour(ts) AS INT) AS hour_of_day,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
      FROM events
    )
    SELECT hour_of_day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(is_err) AS BIGINT) AS n_errors,
           round(CAST(sum(is_err) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS error_rate
    FROM h GROUP BY hour_of_day
    """,
    doc="Diurnal reliability profile: error share of the event stream "
    "per hour-of-day — the ops dashboard row that separates load-"
    "correlated failures (rate tracks traffic peaks) from scheduled-"
    "job breakage (a fixed-hour spike). One conditional 24-row "
    "aggregate, hour extraction fused into the scan.",
)
def events_hourly_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.hour("ts").cast("int").alias("hour_of_day"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias(
            "is_err"
        ),
    )
    err = F.sum("is_err")
    return ev.groupBy("hour_of_day").agg(
        F.count("*").alias("n_events"),
        err.cast("long").alias("n_errors"),
        F.round(
            err.cast("double") / F.count("*").cast("double"), 6
        ).alias("error_rate"),
    )


@defquery(
    "customer_segment_value_matrix",
    """
    WITH rev AS (
      SELECT c.c_mktsegment, n.n_name,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
    ),
    t AS (SELECT CAST(sum(cents) AS HUGEINT) AS total FROM rev)
    SELECT c_mktsegment, n_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           round(CAST(sum(cents) AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
             AS revenue_share
    FROM rev CROSS JOIN t
    GROUP BY c_mktsegment, n_name, t.total
    """,
    doc="Market-segment × nation revenue matrix with exact integer-cent "
    "shares — the GTM planning cut (which segment carries which "
    "geography). Customer joins with NO forced hint (SF-proportional — "
    "AQE broadcasts at gate scale only), the 25-row nation broadcasts, "
    "one (segment, nation)-keyed rollup, one broadcast scalar total; "
    "Q5's join tree re-aimed at a marketing question.",
)
def customer_segment_value_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    # customer is SF-proportional — no forced hint (AQE broadcasts at
    # gate scale, shuffles at 100 TB); the 25-row nation keeps its hint.
    rev = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    t = rev.agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("total")
    )
    return (
        rev.crossJoin(F.broadcast(t))
        .groupBy("c_mktsegment", "n_name", "total")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("revenue_cents"),
        )
        .select(
            "c_mktsegment",
            "n_name",
            "n_orders",
            "revenue_cents",
            F.round(
                F.col("revenue_cents").cast("double")
                / F.col("total").cast("double"),
                6,
            ).alias("revenue_share"),
        )
    )


@defquery(
    "events_conversion_attribution",
    """
    WITH seq AS (
      SELECT event_type,
             first_value(CASE WHEN event_type IN ('click', 'view')
                              THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS ft,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lt
      FROM events
    ),
    conv AS (
      SELECT model, touch_type FROM (
        SELECT 'first_touch' AS model,
               coalesce(ft, '(none)') AS touch_type
        FROM seq WHERE event_type = 'purchase'
        UNION ALL
        SELECT 'last_touch', coalesce(lt, '(none)')
        FROM seq WHERE event_type = 'purchase'
      )
    ),
    n AS (SELECT count(*) / 2 AS n_conv FROM conv)
    SELECT model, touch_type,
           CAST(count(*) AS BIGINT) AS n_conversions,
           round(count(*) / CAST(n.n_conv AS DOUBLE), 6) AS share
    FROM conv CROSS JOIN n
    GROUP BY model, touch_type, n.n_conv
    """,
    doc="First-touch vs last-touch conversion attribution "
    "(operators.relational.conversion_attribution): per purchase, the "
    "earliest and latest click/view the same user produced at-or-"
    "before it (ties broken on event_id → deterministic), rolled up to "
    "per-(model, touch_type) counts and shares; un-attributable "
    "purchases report as '(none)' rather than vanishing. Both running "
    "extrema share ONE user-keyed shuffle + local sort; the rollup is "
    "≤ 2·3 rows + a 1-row broadcast denominator — the marketing-mix "
    "input a warehouse derives from the same clickstream the funnel "
    "and markov entries read.",
)
def events_conversion_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hfp_loader_spark.operators.relational import conversion_attribution

    return conversion_attribution(
        _t(spark, sf_dir, "events"),
        "user_id",
        "ts",
        "event_type",
        "event_id",
        touch_types=["click", "view"],
        conversion_type="purchase",
    )


@defquery(
    "orders_revenue_trend_fit",
    """
    WITH m AS (
      SELECT (CAST(year(o_orderdate) AS INT) - 1992) * 12
             + CAST(month(o_orderdate) AS INT) - 1 AS x,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS yc
      FROM orders GROUP BY 1
    ),
    -- the five OLS sums run EXACT (HUGEINT — 128-bit integer, the twin
    -- of the Spark side's decimal(38,0)) and convert to double ONCE: a
    -- double sum is summation-order-dependent, and at sf0.1 the
    -- engines' orders differ in the intercept's last ulp — which a 6dp
    -- rounding of a 5e8-magnitude value cannot absorb (r13 sf0.1 sweep)
    a AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(sum(CAST(yc AS HUGEINT)) AS DOUBLE) / 100.0 AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(sum(CAST(yc AS HUGEINT) * yc) AS DOUBLE) / 10000.0 AS syy,
             CAST(sum(CAST(x AS HUGEINT) * yc) AS DOUBLE) / 100.0 AS sxy
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0
             AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 6) + 0.0 AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) + 0.0
             AS r2
    FROM a
    """,
    doc="Monthly revenue linear trend "
    "(operators.relational.linear_fit_exact_cents): exact integer-cent "
    "monthly sums indexed by months-since-1992, then the five OLS sums "
    "in EXACT decimal(38,0) (the engine-independent twin of DuckDB "
    "HUGEINT) converted to double once — so slope/intercept/R² are "
    "bit-identical across engines at ANY sf, where the former "
    "double-sum path diverged in the intercept's last ulp at sf0.1 "
    "(caught by the r13 hardened sweep). The demand-growth number a "
    "capacity plan extrapolates from, and the regression twin of "
    "orders_month_seasonality's share view. Bounded ~84-month rollup; "
    "identical expression tree in the oracle.",
)
def orders_revenue_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import linear_fit_exact_cents

    m = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            (
                (F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1
            ).cast("int").alias("x")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "yc"
            )
        )
    )
    return linear_fit_exact_cents(m, "x", "yc", y_scale=100)


@defquery(
    "events_time_to_conversion",
    """
    WITH seq AS (
      SELECT event_type, ts,
             min(CASE WHEN event_type IN ('click', 'view') THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS first_touch_ts
      FROM events
    ),
    conv AS (
      -- exact integer microseconds: the timestamps carry sub-second
      -- precision, and truncate-then-diff vs diff-then-round diverge
      SELECT epoch_us(ts) - epoch_us(first_touch_ts) AS lag_us
      FROM seq
      WHERE event_type = 'purchase' AND first_touch_ts IS NOT NULL
    )
    SELECT CAST(count(*) AS BIGINT) AS n_conversions,
           round(quantile_cont(lag_us, 0.5) / 1000000.0, 4) AS p50_sec,
           round(quantile_cont(lag_us, 0.9) / 1000000.0, 4) AS p90_sec,
           round(CAST(max(lag_us) AS DOUBLE) / 1000000.0, 4) AS max_sec
    FROM conv
    """,
    doc="Time-to-conversion distribution: per purchase, seconds since "
    "the user's FIRST touchpoint at-or-before it (the running-min "
    "window the funnel entries use, event_id-tiebroken), then exact "
    "interpolated p50/p90/max over the integer second lags (the "
    "percentile ≡ quantile_cont parity of agg_percentiles). "
    "Un-touched purchases are excluded here — they carry no defined "
    "lag — and are counted instead by events_conversion_attribution's "
    "'(none)' bucket, so the two entries jointly cover every "
    "conversion. One user-keyed shuffle + a single-row summary; at "
    "100 TB the exact percentile swaps to approx_percentile/qhist.",
)
def events_time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    touch_ts = F.when(
        F.col("event_type").isin("click", "view"), F.col("ts")
    )
    lags = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            "ts",
            F.min(touch_ts).over(w).alias("first_touch_ts"),
        )
        .where(
            (F.col("event_type") == "purchase")
            & F.col("first_touch_ts").isNotNull()
        )
        .select(
            (
                F.unix_micros("ts") - F.unix_micros("first_touch_ts")
            ).alias("lag_us")
        )
    )
    us = 1_000_000.0
    return lags.agg(
        F.count("*").alias("n_conversions"),
        F.round(F.percentile(F.col("lag_us"), F.lit(0.5)) / us, 4).alias(
            "p50_sec"
        ),
        F.round(F.percentile(F.col("lag_us"), F.lit(0.9)) / us, 4).alias(
            "p90_sec"
        ),
        F.round(F.max("lag_us").cast("double") / us, 4).alias("max_sec"),
    )


@defquery(
    "events_retention_bitmap",
    """
    WITH b AS (
      SELECT CAST(ts AS DATE) AS day, user_id // 63 AS word_idx,
             bit_or(1::BIGINT << CAST(user_id % 63 AS INT)) AS word
      FROM events WHERE user_id IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT day, CAST(sum(bit_count(word)) AS BIGINT) AS n FROM b
      GROUP BY day
    ),
    ret AS (
      SELECT a.day AS day,
             CAST(sum(bit_count(a.word & n.word)) AS BIGINT) AS n_retained
      FROM b a JOIN b n ON n.day = a.day + INTERVAL 1 DAY
                       AND n.word_idx = a.word_idx
      GROUP BY a.day
    )
    SELECT t.day, t.n AS n_users, tn.n AS n_next_day,
           coalesce(r.n_retained, 0) AS n_retained,
           round(coalesce(r.n_retained, 0) / CAST(t.n AS DOUBLE), 6)
             AS retention_rate
    FROM tot t
    JOIN tot tn ON tn.day = t.day + INTERVAL 1 DAY
    LEFT JOIN ret r ON r.day = t.day
    """,
    doc="Next-day retention via BITMAP INDEXES "
    "(operators.sketches.key_bitmaps / bitmap_intersect_cardinality "
    "family): per day, users packed into 63-bit words by one bit_or "
    "aggregate (63 not 64 — 1<<63 overflows signed BIGINT: Spark wraps "
    "silently, DuckDB raises; the top bit is never used so both "
    "engines hold identical words), then |day ∩ next-day| is a "
    "word-aligned join + popcount — no distinct-join per day pair, "
    "~8 bytes per 63 users of state. The mechanism-diverse exact twin "
    "of events_dau_wau_stickiness (distinct counts) and "
    "sketch_sliding_distinct (HLL): three routes to the same retention "
    "numbers, each with a different cost curve — bitmaps win when the "
    "id space is dense and MANY pairwise intersections are asked of "
    "the same index.",
)
def events_retention_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.sketches import (
        bitmap_cardinality,
        key_bitmaps,
    )

    ev = _t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    bm = key_bitmaps(ev, "day", "user_id")
    tot = bitmap_cardinality(bm)
    nxt = bm.select(
        F.date_sub(F.col("dim"), 1).alias("dim"),
        "word_idx",
        F.col("word").alias("_wn"),
    )
    ret = (
        bm.join(nxt, ["dim", "word_idx"])
        .groupBy("dim")
        .agg(
            F.sum(F.bit_count(F.col("word").bitwiseAND(F.col("_wn")))).alias(
                "n_retained"
            )
        )
    )
    tot_next = tot.select(
        F.date_sub(F.col("dim"), 1).alias("dim"),
        F.col("n_keys").alias("n_next_day"),
    )
    return (
        tot.join(tot_next, "dim")
        .join(ret, "dim", "left")
        .select(
            F.col("dim").alias("day"),
            F.col("n_keys").alias("n_users"),
            "n_next_day",
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.round(
                F.coalesce("n_retained", F.lit(0)).cast("double")
                / F.col("n_keys").cast("double"),
                6,
            ).alias("retention_rate"),
        )
    )


@defquery(
    "events_audience_overlap_bitmap",
    """
    WITH b AS (
      SELECT CAST(ts AS DATE) AS day, user_id // 63 AS word_idx,
             bit_or(1::BIGINT << CAST(user_id % 63 AS INT)) AS word
      FROM events WHERE user_id IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT day, CAST(sum(bit_count(word)) AS BIGINT) AS n FROM b
      GROUP BY day
    ),
    inter AS (
      SELECT a.day AS day_a, c.day AS day_b,
             CAST(sum(bit_count(a.word & c.word)) AS BIGINT) AS n_common
      FROM b a JOIN b c ON a.day < c.day AND a.word_idx = c.word_idx
      GROUP BY 1, 2
    )
    SELECT i.day_a, i.day_b, i.n_common,
           round(i.n_common
                 / CAST(ta.n + tb.n - i.n_common AS DOUBLE), 6) AS jaccard
    FROM inter i
    JOIN tot ta ON ta.day = i.day_a
    JOIN tot tb ON tb.day = i.day_b
    WHERE i.n_common > 0
    """,
    doc="All-pairs audience overlap from ONE bitmap index "
    "(operators.sketches.bitmap_intersect_cardinality): every day pair "
    "with any shared users gets exact |A∩B| and user-set Jaccard — "
    "~435 pairwise intersections answered by word-aligned popcounts "
    "over the same (day, word) frame the retention and streaming-DAU "
    "entries build, which is the bitmap index's whole argument: "
    "distinct-join approaches pay a shuffle PER QUESTION, the index "
    "pays one build and then every question is a popcount join. The "
    "pair fanout is |days|² per word at worst — bounded by the "
    "calendar, not the corpus.",
)
def events_audience_overlap_bitmap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hfp_loader_spark.operators.sketches import (
        bitmap_cardinality,
        bitmap_intersect_cardinality,
        key_bitmaps,
    )

    ev = _t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    bm = key_bitmaps(ev, "day", "user_id")
    inter = bitmap_intersect_cardinality(bm, bm).where(
        (F.col("dim_a") < F.col("dim_b")) & (F.col("n_common") > 0)
    )
    tot = bitmap_cardinality(bm)
    return (
        inter.join(
            F.broadcast(tot.select(F.col("dim").alias("dim_a"), F.col("n_keys").alias("_na"))),
            "dim_a",
        )
        .join(
            F.broadcast(tot.select(F.col("dim").alias("dim_b"), F.col("n_keys").alias("_nb"))),
            "dim_b",
        )
        .select(
            F.col("dim_a").alias("day_a"),
            F.col("dim_b").alias("day_b"),
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("n_common")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard"),
        )
    )
