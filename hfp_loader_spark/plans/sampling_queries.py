"""Dataset sampling / splitting for training-data pipelines.

A 100 TB corpus needs reproducible, engine-independent sampling: random()
splits are neither (different seeds per task, different generators per
engine, and a re-run re-deals every row).  The portable primitive is a
**content hash partition**: ``md5(key)`` is identical in every engine, and
comparing its leading hex digits lexicographically IS a uniform draw on
[0, 1) — 4 hex chars give 2^-16 granularity.  Rows never migrate between
splits when the corpus grows, the split is a pure projection (no shuffle,
no state, trivially pushed into a scan filter), and any engine — Spark,
DuckDB, a downstream loader — reproduces the exact membership.

Also here: deterministic stratified sampling (fixed k per group via a
hash-ordered window) and PIVOT (conditional-aggregate matrix layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hfp_loader_spark.plans import money as _m
from hfp_loader_spark.plans.catalog import _t, defquery

# Lexicographic thresholds on the first 4 hex chars of md5(doc_id):
# 'c000'/16^4 = 0.75, 'e000'/16^4 = 0.875 → 75 / 12.5 / 12.5 % splits.
_TRAIN_HI = "c000"
_VAL_HI = "e000"


@defquery(
    "sample_train_test_split",
    f"""
    SELECT split,
           CAST(count(*) AS BIGINT)  AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT)  AS min_doc_id
    FROM (
      SELECT doc_id, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_TRAIN_HI}'
                    THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_VAL_HI}'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    GROUP BY split
    """,
    doc="Deterministic 75/12.5/12.5 train/val/test split by content hash "
    "(md5 leading hex vs lexicographic threshold — engine-portable, "
    "shuffle-free, stable under corpus growth). Aggregated per split; the "
    "n_chars checksum pins exact membership, not just proportions.",
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = (
        F.when(bucket < _TRAIN_HI, "train")
        .when(bucket < _VAL_HI, "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars", "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@defquery(
    "sample_stratified_per_lang",
    """
    SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rnk
      FROM documents)
    WHERE rnk <= 5
    """,
    doc="Stratified sample: exactly k=5 docs per language, chosen by "
    "hash-order (md5 of the key = a deterministic, engine-portable "
    "shuffle) with the unique key as tiebreaker. One exchange on the "
    "stratum key; per-group top-k heaps, never a global sort.",
)
def sample_stratified_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("_h")
    )
    w = Window.partitionBy("lang").orderBy("_h", "doc_id")
    return (
        docs.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 5)
        .select("doc_id", "lang", "rnk")
    )


@defquery(
    "sample_weighted_reservoir",
    """
    WITH s AS (
      SELECT doc_id, n_chars,
             list_sum(list_transform(generate_series(1, 12),
               i -> (strpos('0123456789abcdef',
                            substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
                    * 16.0 ** (12 - i))) / 16.0 ** 12 AS u
      FROM documents WHERE n_chars > 0
    )
    SELECT doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           round(u ** (1.0 / n_chars), 8) AS w_key
    FROM s
    ORDER BY w_key DESC, doc_id
    LIMIT 20
    """,
    doc="Weighted reservoir sample (Efraimidis-Spirakis A-ES): key = "
    "u^(1/weight) with u a DETERMINISTIC uniform draw — the first 12 hex "
    "digits of md5(doc_id) as an integer / 16^12, exactly representable "
    "in a double so both engines hold the identical u — and weight = "
    "n_chars; the global top-k by key IS a weighted-without-replacement "
    "sample. Engine-portable and re-run-stable (vs rand(), which re-deals "
    "per task attempt); the top-k is TakeOrderedAndProject — per-task "
    "heaps, no global sort, one narrow projection over the corpus. Keys "
    "rounded to 8 decimals before ranking so both engines rank identical "
    "values (libm pow may differ in the last ulp).",
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import global_top_k

    docs = _t(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("double") / F.lit(float(16**12))
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(F.pow(u, F.lit(1.0) / F.col("n_chars")), 8).alias("w_key"),
    )
    return global_top_k(keyed, [F.desc("w_key"), F.asc("doc_id")], 20)


@defquery(
    "pivot_priority_by_status",
    f"""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending,
           round(CAST(sum(CAST(round(o_totalprice * 100) AS HUGEINT))
                      FILTER (WHERE o_orderstatus = 'O') AS DOUBLE)
                 / 100.0, 2) + 0.0 AS open_total
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="PIVOT (long → wide matrix layout): status becomes columns via "
    "``groupBy().pivot(values=[…])``. Pinning the pivot values keeps it a "
    "single-pass conditional aggregate — omitting them costs an extra "
    "distinct scan to discover columns. Oracle: FILTER aggregates.",
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            # count("*") is invalid inside Pivot — count(lit(1)) is the same
            F.count(F.lit(1)).alias("n"),
            _m.money_sum(F.col("o_totalprice")).alias("total"),
        )
    )
    return wide.select(
        "o_orderpriority",
        F.coalesce("O_n", F.lit(0)).alias("n_open"),
        F.coalesce("F_n", F.lit(0)).alias("n_filled"),
        F.coalesce("P_n", F.lit(0)).alias("n_pending"),
        F.col("O_total").alias("open_total"),
    )


# Per-source keep-rates for the mixture entry: a 4-tier downsampling
# ladder (keep-all / 50% / 25% / 10%) over the driver's 20 uniform
# sources — the shape of a crawl-vs-curated rebalance.
_MIX_THRESHOLDS = {
    **{f"src{i}": "zzzz" for i in range(5)},
    **{f"src{i}": "8000" for i in range(5, 10)},
    **{f"src{i}": "4000" for i in range(10, 15)},
    **{f"src{i}": "199a" for i in range(15, 20)},
}


@defquery(
    "sample_source_mixture",
    f"""
    WITH kept AS (
      SELECT source, doc_id, n_chars
      FROM documents
      WHERE substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4) <
            CASE {" ".join(f"WHEN source = 'src{i}' THEN '{_MIX_THRESHOLDS[f'src{i}']}'" for i in range(20))}
                 ELSE 'zzzz' END
    )
    SELECT source,
           CAST(count(*) AS BIGINT)     AS n_kept,
           CAST(sum(doc_id) AS BIGINT)  AS id_checksum,
           CAST(sum(n_chars) AS BIGINT) AS chars_kept
    FROM kept GROUP BY source
    """,
    doc="Per-source mixture sampling (operators.sampling.mixture_sample): "
    "the LLM-pretraining rebalance — each source keeps a configured "
    "fraction (here a keep-all/50%/25%/10% ladder) chosen by salted "
    "content hash, so membership is engine-portable, re-run-stable, and "
    "a pure projection with no shuffle or RNG state. The id_checksum "
    "pins EXACT membership per source, not just proportions.",
)
def sample_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.sampling import mixture_sample

    kept = mixture_sample(
        _t(spark, sf_dir, "documents"),
        "source",
        _MIX_THRESHOLDS,
        key_col="doc_id",
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("id_checksum"),
        F.sum("n_chars").alias("chars_kept"),
    )


@defquery(
    "sample_temperature_mixture",
    """
    WITH counts AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n
      FROM documents WHERE source IS NOT NULL GROUP BY source
    ), tot AS (
      SELECT sum(n) AS t FROM counts
    ), rel AS (
      -- keep_rate ∝ sqrt(share)/share; every op here (divide, sqrt,
      -- max, floor) is IEEE correctly-rounded, so these doubles are
      -- BIT-IDENTICAL to the planner's python — which is why the
      -- Σw normalizer is absent on both sides (it cancels, and
      -- summation order is engine-dependent)
      SELECT source, n, sqrt(n / t) / (n / t) AS r FROM counts, tot
    ), thr AS (
      -- rate 1 (raw >= 65536, always the most-constrained source) maps
      -- to 'zzzz' = keep-all: every hex threshold drops the bucket
      -- equal to it under the strict < comparison, so 'ffff' would
      -- lose ~1/65536 of the source it claims to keep in full
      SELECT source, n,
             CASE WHEN raw >= 65536 THEN 'zzzz'
                  ELSE printf('%04x', CAST(greatest(0, raw) AS INT))
             END AS t4
      FROM (
        SELECT source, n,
               floor(r / (SELECT max(r) FROM rel) * 65536) AS raw
        FROM rel
      )
    ), kept AS (
      SELECT d.source, d.doc_id
      FROM documents d JOIN thr ON d.source = thr.source
      WHERE substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 4) < thr.t4
    )
    SELECT thr.source,
           CAST(thr.n AS BIGINT)       AS n_total,
           CAST(count(k.doc_id) AS BIGINT) AS n_kept,
           CAST(sum(k.doc_id) AS BIGINT)   AS id_checksum
    FROM thr LEFT JOIN kept k ON thr.source = k.source
    GROUP BY thr.source, thr.n
    """,
    doc="TEMPERATURE mixture sampling (operators.sampling."
    "temperature_thresholds → mixture_sample): per-source keep rates "
    "∝ share^(α−1) with α=0.5 — the XLM-R/mC4 α-smoothed source "
    "rebalance that downsamples the dominant crawl toward a flatter "
    "mix, capped at keep-all for the rarest source (a keep/drop filter "
    "cannot upsample; the cap is EXACT — rate-1 sources get the "
    "above-hex KEEP_ALL sentinel, not 'ffff', on both sides). "
    "Planning is ONE bounded groupBy collected to "
    "#sources scalars; selection stays the deterministic salted-md5 "
    "projection, so membership is engine-portable and pinned here by "
    "the per-source id_checksum. The oracle re-derives the thresholds "
    "in SQL from the same correctly-rounded operations — bit-identical "
    "doubles by construction, no float-tolerance band needed.",
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.sampling import (
        mixture_sample,
        temperature_thresholds,
    )

    docs = _t(spark, sf_dir, "documents")
    thresholds = temperature_thresholds(docs, "source", alpha=0.5)
    kept = mixture_sample(
        docs, "source", thresholds, key_col="doc_id",
        default_threshold="0000",
    )
    totals = docs.where(F.col("source").isNotNull()).groupBy("source").agg(
        F.count("*").alias("n_total")
    )
    per_source = kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("doc_id").alias("id_checksum"),
    )
    return totals.join(per_source, "source", "left").select(
        "source",
        "n_total",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.col("id_checksum"),
    )


_PACK_BUDGET = 512
_PACK_SHARDS = 8
_PACK_TOKS = (
    "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
    "t -> len(t) > 0))"
)


@defquery(
    "pack_token_budget_bins",
    f"""
    WITH sized AS (
      SELECT doc_id,
             CAST({_PACK_TOKS} AS BIGINT) AS n_tokens,
             md5('pack:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ),
    sharded AS (
      SELECT doc_id, n_tokens, h,
             CAST(((strpos('0123456789abcdef', h[1]) - 1) * 16
                   + strpos('0123456789abcdef', h[2]) - 1) % {_PACK_SHARDS}
                  AS INTEGER) AS shard
      FROM sized
    )
    SELECT doc_id, shard,
           CAST(floor(pos / {_PACK_BUDGET}) AS BIGINT) AS bin_id,
           CAST(pos AS BIGINT) AS stream_pos,
           n_tokens
    FROM (
      SELECT doc_id, shard, n_tokens,
             coalesce(sum(n_tokens) OVER (PARTITION BY shard
                      ORDER BY h, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS pos
      FROM sharded
    )
    """,
    doc="Sequence packing into fixed token budgets "
    "(operators.sampling.pack_sequences): documents are hash-sharded "
    f"({_PACK_SHARDS} ways), each shard lays its documents out as a "
    "deterministic hash-ordered stream, and the stream is cut into "
    f"{_PACK_BUDGET}-token bins — the packing step that turns a corpus "
    "into fixed-length training examples. The prefix-sum window "
    "partitions by shard, so packing distributes instead of collapsing "
    "into one global window; every (shard, bin, stream position) is "
    "SQL-restatable and re-run-stable.",
)
def pack_token_budget_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.sampling import pack_sequences
    from hfp_loader_spark.operators.text import token_count

    sized = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    return pack_sequences(
        sized, "doc_id", "n_tokens", budget=_PACK_BUDGET, n_shards=_PACK_SHARDS
    )


@defquery(
    "sample_per_source_cap",
    """
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 4),
                        doc_id) AS rn
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT)        AS n_kept,
           CAST(sum(n_chars) AS BIGINT)    AS total_chars,
           CAST(min(doc_id) AS BIGINT)     AS min_doc_id
    FROM ranked WHERE rn <= 120
    GROUP BY source
    """,
    doc="Per-source document cap (operators.sampling.per_group_cap, cap "
    "120): the host-/domain-level cap a web-corpus pipeline applies so "
    "no single source dominates the mix. Selection is hash-ordered and "
    "content-deterministic (md5(salt||key) then key) — the same rows "
    "survive every re-run, and growth displaces rows only hash-locally. "
    "One window on the source hash domain; the per-source aggregate "
    "pins exact membership via the n_chars checksum.",
)
def sample_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.sampling import per_group_cap

    docs = _t(spark, sf_dir, "documents")
    capped = per_group_cap(docs, "source", cap=120, key_col="doc_id")
    return capped.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
    )


_DSIR_TOKS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
    "t -> len(t) > 0)"
)


@defquery(
    "sample_dsir_importance",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DSIR_TOKS}) AS t FROM documents
    ), b AS (
      SELECT doc_id,
             CAST(((strpos('0123456789abcdef', md5(t)[1]) - 1) * 16
                   + strpos('0123456789abcdef', md5(t)[2]) - 1) % 256
                  AS INT) AS bkt
      FROM toks
    ), tb AS (
      SELECT b.bkt FROM b JOIN documents d USING (doc_id)
      WHERE d.lang = 'fr'
    ), cr AS (SELECT bkt, count(*) AS c FROM b GROUP BY bkt),
       ct AS (SELECT bkt, count(*) AS c FROM tb GROUP BY bkt),
       nr AS (SELECT sum(c) AS n FROM cr),
       nt AS (SELECT sum(c) AS n FROM ct),
       r AS (
         -- ONE fixed expression shape, mirrored in the Spark plan:
         -- products/divide are correctly rounded, so only ln and the
         -- per-doc sum order are engine-soft (pinned by round 6)
         SELECT cr.bkt,
                ln(((coalesce(ct.c, 0) + 0.5) * (nr.n + 128.0))
                   / ((cr.c + 0.5) * (coalesce(nt.n, 0) + 128.0))) AS logr
         FROM cr LEFT JOIN ct USING (bkt), nr, nt
       )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           round(sum(logr), 6) AS dsir_logw
    FROM b JOIN r USING (bkt)
    GROUP BY doc_id
    """,
    doc="DSIR importance weights (operators.sampling."
    "dsir_importance_weights; Xie et al. 2023): score every raw-corpus "
    "document by the summed log-likelihood ratio of its hashed unigram "
    "buckets under a TARGET domain (here: the French documents) vs the "
    "raw corpus — the model-free data-selection signal that resampling "
    "proportionally to w shifts the mix toward the target. Buckets are "
    "one md5 byte (engine-portable, unlike xxhash), both distributions "
    "Laplace-smoothed (s=0.5, B=256). Scale shape: two ≤256-row count "
    "tables (map-side partials absorb the token explode), scalar totals "
    "as 1-row broadcast crossJoins, log-ratio table broadcast onto the "
    "exploded corpus, one per-doc aggregate — no data-sized shuffle "
    "beyond the doc key.",
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.sampling import dsir_importance_weights

    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "fr")
    w = dsir_importance_weights(
        docs, target, num_buckets=256, smoothing=0.5
    )
    return w.select(
        "doc_id", "n_tokens", F.round("dsir_logw", 6).alias("dsir_logw")
    )


@defquery(
    "sample_dsir_gumbel_topk",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DSIR_TOKS}) AS t FROM documents
    ), b AS (
      SELECT doc_id,
             CAST(((strpos('0123456789abcdef', md5(t)[1]) - 1) * 16
                   + strpos('0123456789abcdef', md5(t)[2]) - 1) % 256
                  AS INT) AS bkt
      FROM toks
    ), tb AS (
      SELECT b.bkt FROM b JOIN documents d USING (doc_id)
      WHERE d.lang = 'fr'
    ), cr AS (SELECT bkt, count(*) AS c FROM b GROUP BY bkt),
       ct AS (SELECT bkt, count(*) AS c FROM tb GROUP BY bkt),
       nr AS (SELECT sum(c) AS n FROM cr),
       nt AS (SELECT sum(c) AS n FROM ct),
       r AS (
         SELECT cr.bkt,
                ln(((coalesce(ct.c, 0) + 0.5) * (nr.n + 128.0))
                   / ((cr.c + 0.5) * (coalesce(nt.n, 0) + 128.0))) AS logr
         FROM cr LEFT JOIN ct USING (bkt), nr, nt
       ), w AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             round(sum(logr), 6) AS dsir_logw
      FROM b JOIN r USING (bkt) GROUP BY doc_id
    ), g AS (
      -- u from 12 md5 hex digits, +0.5 → strictly inside (0,1), every
      -- term an exact double, so both engines hold the identical
      -- Gumbel; ranking uses the UNROUNDED key (identical doubles),
      -- display rounds once
      SELECT doc_id, n_tokens, dsir_logw,
             dsir_logw + (-ln(-ln(
               (list_sum(list_transform(generate_series(1, 12),
                  i -> (strpos('0123456789abcdef',
                         substr(md5('gumbel:' || CAST(doc_id AS VARCHAR)),
                                i, 1)) - 1)
                       * 16.0 ** (12 - i))) + 0.5) / 16.0 ** 12)))
               AS key_raw
      FROM w
    )
    SELECT doc_id, n_tokens, dsir_logw, round(key_raw, 6) AS gumbel_key
    FROM g ORDER BY key_raw DESC, doc_id LIMIT 20
    """,
    doc="DSIR SELECTION via deterministic Gumbel-top-k "
    "(operators.sampling.gumbel_topk over dsir_importance_weights): "
    "sample 20 documents without replacement ∝ exp(importance) by "
    "ranking w_i + G_i with G_i a Gumbel draw derived from md5(doc_id) "
    "— the Gumbel-max trick in log space, where exponentiating DSIR "
    "weights would over/underflow. Engine-portable: u is 12 exact md5 "
    "hex digits (+0.5, so ln never sees 0 under ANSI), both engines "
    "hold bit-identical keys, and the top-k is TakeOrderedAndProject "
    "(per-task heaps, no global sort) over one narrow projection — the "
    "whole selection adds zero shuffles to the weight computation.",
)
def sample_dsir_gumbel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.sampling import (
        dsir_importance_weights,
        gumbel_topk,
    )

    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "fr")
    w = dsir_importance_weights(
        docs, target, num_buckets=256, smoothing=0.5
    ).select(
        "doc_id", "n_tokens", F.round("dsir_logw", 6).alias("dsir_logw")
    )
    picked = gumbel_topk(w, "dsir_logw", 20, key_col="doc_id")
    return picked.select(
        "doc_id",
        "n_tokens",
        "dsir_logw",
        F.round("gumbel_key", 6).alias("gumbel_key"),
    )


def _hex_int_sql(expr: str, ndigits: int) -> str:
    """SQL for 'first ``ndigits`` md5 hex chars as an integer' — the
    DuckDB twin of Spark's ``conv(substring(md5(..), 1, n), 16, 10)``
    (DuckDB has no base-16 conv; digitwise strpos arithmetic is exact
    integer math, 16^12 < 2^53)."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1)"
            f" * {16 ** (ndigits - 1 - i)}"
            for i in range(ndigits)
        )
        + ")"
    )


_EPOCH_U = (
    "(("
    + _hex_int_sql("md5('epoch:' || CAST(doc_id AS VARCHAR))", 12)
    + " + 0.5) / 16.0 ** 12)"
)


@defquery(
    "sample_upsample_epochs",
    f"""
    WITH w AS (
      SELECT doc_id, source,
             CASE WHEN source = 'src0' THEN 2.5
                  WHEN source = 'src1' THEN 1.5
                  ELSE 0.4 END AS wt
      FROM documents
    ), n AS (
      SELECT doc_id, source, wt,
             CAST(floor(wt) AS INT)
             + CASE WHEN {_EPOCH_U} < wt - floor(wt)
                    THEN 1 ELSE 0 END AS n_copies
      FROM w
    ), e AS (
      SELECT doc_id, source, unnest(generate_series(1, n_copies)) AS copy
      FROM n WHERE n_copies >= 1
    ), outs AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_rows_out,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_kept
      FROM e GROUP BY source
    ), ins AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             round(sum(wt), 2) AS expected_rows
      FROM w GROUP BY source
    )
    SELECT source, n_docs, expected_rows,
           coalesce(n_rows_out, 0) AS n_rows_out,
           coalesce(n_docs_kept, 0) AS n_docs_kept
    FROM ins LEFT JOIN outs USING (source)
    """,
    doc="Epoch upsampling / fractional replication (operators.sampling."
    "upsample_epochs): the data-mixing step that runs src0 for 2.5 "
    "epochs, src1 for 1.5, and downsamples the rest to 0.4 — each doc "
    "gets floor(w) copies plus one more iff its deterministic md5 draw "
    "falls below frac(w), so E[copies] = w per row with NO rand() "
    "(engines and re-runs agree row-for-row; the entry also restates "
    "Σw as expected_rows next to the realized count). Scale shape: one "
    "narrow projection + a row-local explode of sequence(1, n) — no "
    "shuffle; the row multiplication IS the requested output.",
)
def sample_upsample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.sampling import upsample_epochs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    wt = (
        F.when(F.col("source") == "src0", F.lit(2.5))
        .when(F.col("source") == "src1", F.lit(1.5))
        .otherwise(F.lit(0.4))
    )
    w = docs.withColumn("wt", wt)
    outs = (
        upsample_epochs(w, F.col("wt"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_rows_out"),
            F.countDistinct("doc_id").cast("long").alias("n_docs_kept"),
        )
    )
    ins = w.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.sum("wt"), 2).alias("expected_rows"),
    )
    return ins.join(outs, "source", "left").select(
        "source",
        "n_docs",
        "expected_rows",
        F.coalesce("n_rows_out", F.lit(0)).alias("n_rows_out"),
        F.coalesce("n_docs_kept", F.lit(0)).alias("n_docs_kept"),
    )


_SHARD_ID = (
    "CAST("
    + _hex_int_sql("md5('shard:' || CAST(doc_id AS VARCHAR))", 12)
    + " % 8 AS INT)"
)


@defquery(
    "sample_shuffle_shards",
    f"""
    WITH a AS (
      SELECT doc_id, {_SHARD_ID} AS shard,
             md5('order:' || CAST(doc_id AS VARCHAR)) AS sort_key
      FROM documents
    )
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           md5(string_agg(CAST(doc_id AS VARCHAR), ','
                          ORDER BY sort_key, doc_id)) AS order_md5
    FROM a GROUP BY shard
    """,
    doc="Seeded training-order shuffle + sharding (operators.sampling."
    "shuffle_shards / write_shards): every document gets an md5 shard "
    "id (8 shards) and an independent md5 sort key whose within-shard "
    "lexicographic order IS the training order — the final corpus-prep "
    "step, reproducible across engines/re-runs and stable under corpus "
    "growth (new docs land somewhere; existing docs never move, unlike "
    "rand()/zipWithIndex shuffles). The entry pins the EXACT per-shard "
    "order as md5(comma-joined doc_ids in shard order); the per-shard "
    "collect behind that checksum is the verification instrument — "
    "production materialization is write_shards: one hash repartition + "
    "distributed within-partition sort, no global sort, no driver "
    "collect, shard sizes balanced by md5 uniformity.",
)
def sample_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.sampling import shuffle_shards

    a = shuffle_shards(
        _t(spark, sf_dir, "documents").select("doc_id"), 8, "doc_id"
    )
    ordered_ids = F.transform(
        F.array_sort(F.collect_list(F.struct("sort_key", "doc_id"))),
        lambda s: s.getField("doc_id").cast("string"),
    )
    return a.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.md5(F.array_join(ordered_ids, ",")).alias("order_md5"),
    )


_KC_K, _KC_CAP = 6, 150
_KC_NORMSQ = "list_sum(list_transform({side}, x -> x * x)) > 0"


def _kcenter_oracle() -> str:
    """Gonzalez farthest-point traversal unrolled one CTE pair per
    selection round — the same fixed recurrence the Spark plan unrolls,
    with the cosine guarded exactly like the operator's NULL-safe
    ``when(norm_a·norm_b > 0)``."""
    ga = _KC_NORMSQ.format(side="c.v")
    gb = _KC_NORMSQ.format(side="pe.v")
    dist = (
        f"round(1.0 - CASE WHEN {ga} AND {gb} "
        "THEN list_cosine_similarity(c.v, pe.v) END, 4)"
    )
    parts = [
        f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE vec_id < {_KC_CAP} AND len(embedding) > 0
    ),
    a1 AS (
      SELECT vec_id, 1 AS sel_rank, CAST(NULL AS DOUBLE) AS min_dist
      FROM e WHERE vec_id = (SELECT min(vec_id) FROM e)
    )"""
    ]
    for t in range(2, _KC_K + 1):
        parts.append(f""",
    d{t} AS (
      SELECT c.vec_id, min({dist}) AS min_dist
      FROM e c
      JOIN a{t - 1} p ON true
      JOIN e pe ON pe.vec_id = p.vec_id
      WHERE c.vec_id NOT IN (SELECT vec_id FROM a{t - 1})
      GROUP BY c.vec_id
    ),
    s{t} AS (
      SELECT vec_id, {t} AS sel_rank, min_dist
      FROM d{t} ORDER BY min_dist DESC, vec_id LIMIT 1
    ),
    a{t} AS (SELECT * FROM a{t - 1} UNION ALL SELECT * FROM s{t})""")
    parts.append(f"""
    SELECT vec_id, CAST(sel_rank AS INT) AS sel_rank, min_dist
    FROM a{_KC_K}
    """)
    return "".join(parts)


@defquery(
    "sample_kcenter_coreset",
    _kcenter_oracle(),
    doc="Greedy k-center coreset selection (operators.similarity."
    "kcenter_coreset; Gonzalez 1985): 6 farthest-point rounds over a "
    "bounded instrument sample (vec_id < 150) — the diversity-first "
    "data-selection strategy whose covering radius is provably within "
    "2× of the optimal k-center, used to seed eval sets and annotation "
    "budgets; the decreasing min_dist column IS the coverage curve. "
    "Both engines unroll the same fixed recurrence (the oracle one CTE "
    "pair per round). Scale shape per round: one corpus pass scoring "
    "remaining points against the ≤ k-row broadcast selected set, "
    "argmax via TakeOrderedAndProject, pick lazily checkpointed so the "
    "unrolled plan stays linear in k; at real scale feed it cluster "
    "representatives, not raw points.",
)
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.similarity import kcenter_coreset

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < _KC_CAP)
    return kcenter_coreset(emb, _KC_K)


# --- Poisson bootstrap CI (Chamandy et al. 2012) -----------------------

_BOOT_B = 32


def _boot_oracle() -> str:
    """64 conditional sums — one (Σw, Σw·x) pair per replicate — over
    md5-derived Poisson(1) weights; the exact SQL twin of
    operators.sampling.poisson_bootstrap_ci with the SAME CDF doubles."""
    from hfp_loader_spark.operators.sampling import POISSON1_CDF

    def w_sql(b: int) -> str:
        u = (
            "(("
            + _hex_int_sql(
                f"md5('boot{b}:' || CAST(o_orderkey AS VARCHAR))", 12
            )
            + " + 0.5) / 16.0 ** 12)"
        )
        branches = " ".join(
            f"WHEN {u} < {c!r} THEN {n}"
            for n, c in enumerate(POISSON1_CDF)
        )
        return f"(CASE {branches} ELSE {len(POISSON1_CDF)} END)"

    sums = ",\n      ".join(
        f"CAST(sum({w_sql(b)} * cents) AS BIGINT) AS wx{b},\n      "
        f"CAST(sum({w_sql(b)}) AS BIGINT) AS w{b}"
        for b in range(_BOOT_B)
    )
    # degenerate-replicate guard mirrors the operator (ADVICE r9): an
    # all-zero-weight replicate coalesces to the point estimate
    means = ", ".join(
        f"CASE WHEN w{b} > 0 THEN "
        f"round(CAST(wx{b} AS DOUBLE) / CAST(w{b} AS DOUBLE) / 100.0, 4) "
        f"ELSE round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 4) END"
        for b in range(_BOOT_B)
    )
    return f"""
    WITH src AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sx,
      {sums}
      FROM src
    ),
    m AS (SELECT *, list_sort([{means}]) AS means FROM agg)
    SELECT n AS n_rows,
           round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 4)
             AS point_mean,
           means[2]  AS ci_lo,
           means[31] AS ci_hi
    FROM m
    """


@defquery(
    "agg_bootstrap_ci_totalprice",
    _boot_oracle(),
    doc="Distributed Poisson-bootstrap confidence interval for the mean "
    "order price (operators.sampling.poisson_bootstrap_ci; Chamandy et "
    "al. 2012): 32 resample replicates in ONE corpus pass with NO row "
    "replication — each replicate is a pair of conditional sums inside "
    "a single aggregate, weights drawn by inverting the Poisson(1) CDF "
    "at an md5 uniform (same literal CDF doubles on both engines). "
    "Prices quantized to integer cents so every replicate sum is "
    "exact and the whole CI reproduces bit-for-bit — the uncertainty "
    "quantification a 100 TB pipeline can actually afford (map-side "
    "partials, 65 running sums, zero shuffle growth).",
)
def agg_bootstrap_ci_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.sampling import poisson_bootstrap_ci

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100)
        .cast("long")
        .alias("cents"),
    )
    return poisson_bootstrap_ci(
        orders, "o_orderkey", "cents", n_replicates=_BOOT_B
    )
