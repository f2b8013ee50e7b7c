"""Deterministic corpus-shaping operators for training-data pipelines:
source-mixture sampling and token-budget sequence packing.

Both follow the engine-portable determinism rule of plans/sampling_queries:
membership comes from md5 content hashes compared lexicographically, never
from ``rand()`` — identical in Spark, DuckDB, and any downstream loader,
stable under corpus growth and re-runs, and expressible as a pure
projection (pushable into scans, no state, no shuffle for the sampling
itself).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: lexicographic threshold on 4 leading md5 hex chars ⟺ keep-rate ≈
#: int(threshold, 16) / 65536; "zzzz" sorts above every hex digit → keep all
KEEP_ALL = "zzzz"


def _bucket(key: Column, salt: str) -> Column:
    """Uniform [0,1) draw as 4 hex chars: md5 of (salt || key).  The salt
    decorrelates this draw from every OTHER hash-based decision on the
    same key (splits, shuffles) — without it, 'sampled at 50%' and
    'train split' would select the same rows."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 4)


def mixture_sample(
    df: DataFrame,
    source_col: str,
    thresholds: dict[str, str],
    key_col: str,
    salt: str = "mix:",
    default_threshold: str = KEEP_ALL,
) -> DataFrame:
    """Deterministic mixture sampling: keep each row with a per-SOURCE
    rate — the standard LLM-pretraining rebalancing step (upsample rare
    high-quality sources is a union of this with replicated salts;
    downsample dominant crawls is exactly this).

    ``thresholds`` maps source → 4-hex-char lexicographic threshold
    (rate ≈ int(t,16)/65536); unmapped sources use ``default_threshold``
    (keep-all by default).  Membership is a pure projection on
    md5(salt‖key): no shuffle, no RNG state, identical row set in every
    engine and on every re-run, and rows never migrate when the corpus
    grows — the properties a 100 TB mixture re-weighting needs to be
    auditable."""
    lit_map = F.create_map(
        *[x for k, v in thresholds.items() for x in (F.lit(k), F.lit(v))]
    )
    thr = F.coalesce(
        F.element_at(lit_map, F.col(source_col)), F.lit(default_threshold)
    )
    return df.where(_bucket(F.col(key_col), salt) < thr)


def temperature_thresholds(
    df: DataFrame,
    source_col: str,
    alpha: float = 0.5,
    budget_frac: float = 1.0,
) -> dict[str, str]:
    """Per-source keep thresholds from TEMPERATURE sampling — the
    multilingual/multi-source rebalancing rule (the α-smoothed sampling
    of XLM-R / mC4): target share of source s ∝ (n_s)^α, so α=1 keeps
    the natural mix, α→0 flattens toward uniform, and the dominant
    crawl is downsampled in favour of rare sources.

    Returns the ``thresholds`` dict for :func:`mixture_sample` — per-
    source 4-hex lexicographic md5 thresholds, so the SELECTION stays a
    deterministic, shuffle-free projection; only this PLANNING step
    aggregates (one groupBy over the source column, collected to a
    bounded #sources-row scalar read — the per-layout pass a production
    pipeline caches).  ``budget_frac`` scales the total kept volume
    (1.0 = as many rows as the most-constrained source allows without
    upsampling).  Rates are capped at 1: temperature sampling UPsamples
    rare sources by repetition, which a keep/drop filter cannot express
    — callers wanting true upsampling union replicated salted passes
    (see mixture_sample's doc); capping instead preserves the rare
    sources in full and downsamples the rest proportionally, the usual
    curation choice.  "In full" is exact: a source whose computed rate
    reaches 1 gets :data:`KEEP_ALL` (lexicographically above every hex
    bucket), not the largest hex threshold ``'ffff'`` — the latter would
    drop the ~1/65536 of rows whose 4-hex bucket is exactly ``'ffff'``
    under mixture_sample's strict ``<`` comparison."""
    import math

    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    counts = {
        r[source_col]: r["_n"]
        for r in df.groupBy(source_col).agg(F.count("*").alias("_n")).collect()
        if r[source_col] is not None
    }
    if not counts:
        return {}
    total = sum(counts.values())
    # keep_rate_s ∝ share_s^α / share_s, scaled so the max rate is
    # budget_frac (the target-share normalizer Σ w_s cancels in the
    # ratio and is deliberately NOT computed: every remaining operation
    # — divide, sqrt, max, floor — is IEEE-754 correctly-rounded, so an
    # oracle re-deriving the thresholds in SQL lands on bit-identical
    # doubles; a summation would instead expose engine-dependent
    # accumulation order).  α=0.5 routes through sqrt explicitly, the
    # correctly-rounded primitive, rather than pow(x, 0.5).
    def w(n: int) -> float:
        share = n / total
        return math.sqrt(share) if alpha == 0.5 else share**alpha

    rel = {s: w(n) / (n / total) for s, n in counts.items()}
    rel_max = max(rel.values())

    def threshold(r: float) -> str:
        # rate 1 (raw ≥ 65536 — always at least the most-constrained
        # source when budget_frac ≥ 1) means KEEP ALL, which no hex
        # threshold expresses under the strict `<` comparison; the
        # branch condition is a floor over correctly-rounded doubles, so
        # a SQL oracle re-deriving it lands on the same branch
        raw = math.floor(budget_frac * (r / rel_max) * 65536)
        if raw >= 65536:
            return KEEP_ALL
        return "{:04x}".format(max(0, raw))

    return {s: threshold(r) for s, r in rel.items()}


def pack_sequences(
    df: DataFrame,
    key_col: str,
    size_col: str,
    budget: int,
    n_shards: int = 32,
    salt: str = "pack:",
) -> DataFrame:
    """Contiguous token-budget packing: order documents deterministically,
    lay them out as a stream, and cut the stream into ``budget``-token
    bins — the sequence-packing step that turns a document corpus into
    fixed-length training examples.

    Documents are first sharded by content hash (``n_shards`` ways) and
    each shard packs INDEPENDENTLY: the prefix-sum window partitions by
    shard, so at 100 TB the packing distributes instead of collapsing
    into one unpartitioned window task (the per-key gap-fill lesson).
    Within a shard, order is (md5 hash, key) — a deterministic shuffle —
    and a document is assigned to the bin where its stream position
    starts (loaders split the straddling document at the boundary; the
    assignment records ``stream_pos`` so that cut is reproducible).

    Output: ``(key, shard, bin_id, stream_pos, <size_col>)`` — one row
    per document, exactly restatable in SQL (window prefix-sum over the
    same hash order)."""
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    shard = (
        (
            (F.conv(F.substring(h, 1, 2), 16, 10)).cast("int") % n_shards
        ).alias("shard")
    )
    base = df.select(
        F.col(key_col),
        F.col(size_col),
        h.alias("_h"),
        shard,
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("_h", key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("long")
    return base.select(
        key_col,
        "shard",
        F.floor(prefix / budget).cast("long").alias("bin_id"),
        prefix.alias("stream_pos"),
        size_col,
    )


def per_group_cap(
    df: DataFrame,
    group_col: str,
    cap: int,
    key_col: str,
    salt: str = "cap:",
) -> DataFrame:
    """Deterministic per-group row cap: keep at most ``cap`` rows per
    group, chosen by hash order — the host-/source-level cap a web-corpus
    pipeline applies so no single domain dominates the training mix.

    Selection order is ``(md5(salt‖key), key)`` — a uniform, content-
    deterministic shuffle within each group (re-runs keep the SAME rows;
    appending new rows displaces old ones only when the new hash sorts
    earlier, never wholesale).  One hash-partitioned window on the group
    key; groups over the cap cost sort time, never memory beyond the
    window buffer — and at 100 TB the same shuffle domain serves every
    other per-group stage."""
    w = Window.partitionBy(group_col).orderBy(
        _bucket(F.col(key_col), salt), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def dsir_importance_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 256,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-document DSIR importance weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score each
    raw-corpus document by how much more likely its hashed n-gram
    features are under a TARGET domain than under the raw corpus —
    ``log w(x) = Σ_tokens log p_target(b(t)) / p_raw(b(t))`` — so that
    resampling proportionally to ``w`` shifts the corpus toward the
    target distribution without a learned model.

    Features are hashed UNIGRAM buckets: ``b(t) = first-byte of
    md5(t)`` (``num_buckets`` ≤ 256 uses a prefix of it), the
    engine-portable stand-in for the paper's hashed n-gram features —
    md5 exists bit-identically in Spark and DuckDB, so a SQL oracle
    re-derives the same buckets (the xxhash64 family does not cross
    engines).  Both bucket distributions are Laplace-smoothed:
    ``p(b) = (c_b + smoothing) / (N + smoothing·num_buckets)``.
    The per-bucket log-ratio is computed in ONE fixed expression shape —
    ``ln(((c_t+s)·(N_r+s·B)) / ((c_r+s)·(N_t+s·B)))`` — every step of
    which is an IEEE correctly-rounded op on both engines, so only the
    final ``ln`` and the per-doc summation order are engine-soft; like
    the surprisal entries, callers pin parity by rounding once at the
    oracle's precision.

    Output: ``(id_col, n_tokens, dsir_logw)`` with ``dsir_logw``
    UNROUNDED (log-space; positive = target-like).  Downstream, keep
    top-k by weight or resample via a Gumbel-style deterministic draw.

    Scale shape: both count tables are ≤ ``num_buckets`` rows (built by
    one hash aggregate over each corpus's exploded tokens — map-side
    partial aggregation collapses the explode before any shuffle), the
    scalar totals ride along by crossJoin of 1-row aggregates, and the
    joined log-ratio table broadcasts onto the exploded raw corpus; the
    only data-sized shuffle is the final per-document aggregate."""
    from hfp_loader_spark.operators.text import tokens

    if not 1 <= num_buckets <= 256:
        raise ValueError("num_buckets must be in [1, 256] (one md5 byte)")
    s = float(smoothing)
    b_expr = (
        F.conv(F.substring(F.md5(F.col("_t")), 1, 2), 16, 10).cast("int")
        % num_buckets
    ).alias("_b")

    def bucketed(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t")
        ).select(id_col, b_expr)

    raw_toks = bucketed(docs)
    # The RAW-side ≤num_buckets-row count table feeds TWO branches (the
    # ratio join and its own total) — unpinned, every reference replays
    # the full-corpus tokenize+hash pass (5 scans in the committed r16
    # plan).  Lazy localCheckpoint pins it once (optimization r17,
    # guide §2.4).  The corpus-sized raw_toks stays unpinned — its
    # final-join pass is the one unavoidable second read, cheaper to
    # re-tokenize than to store the exploded token stream — and the
    # TARGET-side count stays unpinned too: the target is the small
    # predicate-pushed slice (its filter must stay visible at the scan
    # for pushdown, and two passes over the slice are cheaper than
    # pinning would save).
    c_raw = raw_toks.groupBy("_b").agg(
        F.count("*").alias("_cr")
    ).localCheckpoint(eager=False)
    c_tgt = bucketed(target).groupBy("_b").agg(F.count("*").alias("_ct"))
    n_raw = c_raw.agg(F.sum("_cr").alias("_nr"))
    n_tgt = c_tgt.agg(F.sum(F.col("_ct")).alias("_nt"))
    denom = F.lit(s * num_buckets)
    ratios = (
        c_raw.join(c_tgt, "_b", "left")
        .crossJoin(F.broadcast(n_raw))
        .crossJoin(F.broadcast(n_tgt))
        .select(
            "_b",
            F.log(
                (
                    (F.coalesce("_ct", F.lit(0)) + F.lit(s))
                    * (F.col("_nr") + denom)
                )
                / (
                    (F.col("_cr") + F.lit(s))
                    * (F.coalesce("_nt", F.lit(0)) + denom)
                )
            ).alias("_logr"),
        )
    )
    return (
        raw_toks.join(F.broadcast(ratios), "_b")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("_logr").alias("dsir_logw"),
        )
    )


def gumbel_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    salt: str = "gumbel:",
) -> DataFrame:
    """Deterministic Gumbel-top-k: sample ``k`` rows WITHOUT replacement
    with probability ∝ ``exp(weight_col)`` — the log-space companion of
    the A-ES weighted reservoir (:mod:`plans.sampling_queries`'s
    ``sample_weighted_reservoir``), for weights that ARRIVE in log space
    (DSIR importance scores, log-perplexities) where exponentiating
    would overflow.  The Gumbel-max trick: ``argtop_k(w_i + G_i)`` with
    ``G_i`` standard Gumbel draws IS such a sample (Vieira 2014).

    The draw is DETERMINISTIC and engine-portable: ``u`` is the first
    12 hex digits of ``md5(salt‖key)`` as an integer, shifted by +0.5
    and scaled by 16^-12 — strictly inside (0,1) so ``-ln(-ln(u))`` is
    always finite (ANSI mode turns ln(0) into ±inf downstream), and
    exactly representable, so both engines hold the identical double and
    the identical Gumbel.  Re-runs and engines agree on the exact row
    set; rows never migrate when the corpus grows (their keys don't
    change — only the global top-k cutoff moves).

    Output: the input columns + ``gumbel_key`` (unrounded; callers
    comparing across engines should round ONCE at their precision).
    Scale shape: one narrow projection + TakeOrderedAndProject (per-task
    k-row heaps, driver merge) — no global sort, no shuffle of the
    corpus."""
    from hfp_loader_spark.operators.relational import global_top_k

    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**12))
    g = -F.log(-F.log(u))
    keyed = df.withColumn("gumbel_key", F.col(weight_col) + g)
    return global_top_k(
        keyed, [F.desc("gumbel_key"), F.asc(key_col)], k
    )


def _unit_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform draw strictly inside (0,1): the first 12 md5
    hex digits of (salt ‖ key) as an integer, +0.5, scaled by 16^-12 —
    every term an exact double, so Spark and DuckDB hold the identical
    value (the ``gumbel_topk`` idiom).  The salt decorrelates this draw
    from every other hash decision on the same key."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16**12))


def upsample_epochs(
    df: DataFrame,
    weight: Column,
    key_col: str,
    salt: str = "epoch:",
) -> DataFrame:
    """Deterministic fractional replication — the data-mixing step that
    runs some sources for MORE than one epoch (Wikipedia ×3 in GPT-3's
    mix; The Pile's per-set epoch counts) and others for less than one,
    in a single rule: each row gets ``floor(w)`` guaranteed copies plus
    one more iff its deterministic uniform draw falls below ``frac(w)``,
    so E[copies] = w exactly, per row.  ``w < 1`` degenerates to plain
    downsampling (keep with probability w), ``w = 2.5`` yields 2 or 3
    copies — re-runs and engines agree row-for-row because the draw is
    ``md5(salt ‖ key)``, never ``rand()``.

    Output: the input columns + ``n_copies`` + ``copy`` (1-based),
    one row per copy; rows with ``n_copies = 0`` disappear.  Downstream
    shuffling should include ``copy`` in its sort key so replicas of a
    document spread across the training order instead of clumping.

    Scale shape: one narrow projection + a row-local ``explode`` of a
    ``sequence(1, n)`` literal — no shuffle, no state; the explode's
    row multiplication IS the requested output size (Σ n_copies)."""
    w = weight.cast("double")
    n = (
        F.floor(w)
        + F.when(
            _unit_uniform(F.col(key_col), salt) < (w - F.floor(w)),
            F.lit(1),
        ).otherwise(F.lit(0))
    ).cast("int")
    # sequence(1, 0) would count DOWN ([1, 0]); guard the empty case
    copies = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn("n_copies", n).withColumn(
        "copy", F.explode(copies)
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic training-order shuffle + sharding: every row gets a
    ``shard`` in [0, n_shards) and a ``sort_key`` whose within-shard
    lexicographic order IS the training order — the final step of a
    corpus pipeline (a seeded global shuffle written as N shard files
    that data loaders stream in order).

    Both columns are md5 draws with DIFFERENT salts (``<salt>shard:`` /
    ``<salt>order:``), so shard assignment and within-shard order are
    independent, reproducible across engines and re-runs, and stable
    under corpus growth (a new document lands somewhere; existing
    documents never move — unlike rand() or zipWithIndex shuffles, which
    reshuffle everything on every change).  Vary ``salt`` per epoch for
    a fresh order.

    Scale shape: the assignment is a pure projection.  ``write_shards``
    materializes it with ONE hash repartition on ``shard`` and a
    distributed within-partition sort — no global sort, no driver
    involvement; shard sizes concentrate tightly around n/n_shards (md5
    is uniform), so tasks are balanced by construction."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    k = F.col(key_col).cast("string")
    # 12 hex digits = 48 hash bits (the _unit_uniform width): modulo
    # bias is ≤ n_shards/2^48 (immeasurable) and the shard-count ceiling
    # is 2.8e14 — 4 digits (16 bits) gave visible bias whenever n_shards
    # didn't divide 65536 and empty shards past 65536 (ADVICE r9).
    shard = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + "shard:"), k)), 1, 12),
            16,
            10,
        ).cast("long")
        % n_shards
    ).cast("int")
    order = F.md5(F.concat(F.lit(salt + "order:"), k))
    return df.withColumn("shard", shard).withColumn("sort_key", order)


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    salt: str = "",
) -> None:
    """Materialize ``shuffle_shards`` as ``shard=…`` parquet directories,
    each file internally in training order.  One hash repartition on the
    shard id + a within-partition sort on (shard, sort_key) — rows of a
    shard are contiguous and ordered within their task, so each
    ``shard=k`` directory holds ordered files; loaders stream them
    sequentially with zero further shuffling."""
    assigned = shuffle_shards(df, n_shards, key_col, salt)
    (
        assigned.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "sort_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


# Cumulative Poisson(1) CDF — the SAME Python doubles are injected into
# the Spark plan (F.lit) and the SQL oracle (repr), so the weight
# thresholds are bit-identical on both engines.
POISSON1_CDF = tuple(
    sum(math.exp(-1) / math.factorial(j) for j in range(n + 1))
    for n in range(6)
)


def poisson_weight(key: Column, salt: str) -> Column:
    """Deterministic Poisson(1) draw for a key: invert the CDF at the
    md5-derived uniform (``_unit_uniform``) — the per-row resample
    weight of the Poisson bootstrap (each replicate observes each row
    0, 1, 2, … times with the multinomial-bootstrap's limiting
    distribution).  Truncated at 6 (P ≈ 6e-5), identically on every
    engine."""
    u = _unit_uniform(key, salt)
    w: Column | None = None
    for n, c in enumerate(POISSON1_CDF):
        w = (
            F.when(u < F.lit(c), n)
            if w is None
            else w.when(u < F.lit(c), n)
        )
    return w.otherwise(len(POISSON1_CDF))


def poisson_bootstrap_ci(
    df: DataFrame,
    key_col: str,
    cents_col: str,
    n_replicates: int = 32,
    lo_rank: int = 2,
    hi_rank: int = 31,
) -> DataFrame:
    """Distributed bootstrap confidence interval for a mean, in ONE
    pass with NO row replication: every replicate's Σw and Σw·x are
    conditional sums inside a single aggregate (2·B running sums per
    partition), so the corpus is scanned once and nothing is exploded —
    the Poisson bootstrap is THE scalable bootstrap (Chamandy et al.
    2012, 'Estimating Uncertainty for Massive Data Streams').

    ``cents_col`` must be an integer-valued column (quantize upstream):
    integer sums are exact, so replicate means are single
    divisions of exact integers and the whole CI is reproducible
    bit-for-bit on any engine — a float-valued bootstrap would diverge
    in partition order.

    Output: one row — ``point_mean``, ``ci_lo``, ``ci_hi`` (the
    ``lo_rank``-th / ``hi_rank``-th order statistics of the B replicate
    means; defaults ≈ a 91% interval at B=32), ``n_rows``.

    Degenerate-replicate guard (ADVICE r9): on small inputs a
    replicate's Poisson(1) weights can all be 0 (P ≈ e^−n per
    replicate — negligible past n ≈ 30, the implicit minimum-n for a
    meaningful bootstrap anyway); such a replicate's mean coalesces to
    the point estimate instead of poisoning the sorted order statistics
    with NULL/NaN, deterministically on every engine."""
    key = F.col(key_col)
    x = F.col(cents_col)
    aggs = [
        F.count("*").alias("_n"),
        F.sum(x).alias("_sx"),
    ]
    for b in range(n_replicates):
        w = poisson_weight(key, f"boot{b}:")
        aggs.append(F.sum(w * x).alias(f"_wx{b}"))
        aggs.append(F.sum(w).alias(f"_w{b}"))
    row = df.agg(*aggs)
    point = F.round(
        F.col("_sx").cast("double") / F.col("_n").cast("double") / F.lit(100.0),
        4,
    )
    means = F.array_sort(
        F.array(
            *[
                F.when(
                    F.col(f"_w{b}") > 0,
                    F.round(
                        F.col(f"_wx{b}").cast("double")
                        / F.col(f"_w{b}").cast("double")
                        / F.lit(100.0),
                        4,
                    ),
                ).otherwise(point)
                for b in range(n_replicates)
            ]
        )
    )
    return row.select(
        F.col("_n").cast("long").alias("n_rows"),
        F.round(
            F.col("_sx").cast("double")
            / F.col("_n").cast("double")
            / F.lit(100.0),
            4,
        ).alias("point_mean"),
        F.element_at(means, lo_rank).alias("ci_lo"),
        F.element_at(means, hi_rank).alias("ci_hi"),
    )
