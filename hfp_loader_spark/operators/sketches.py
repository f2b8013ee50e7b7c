"""Mergeable frequency sketches: count-min as first-class DataFrames.

The warehouse sketch pattern (same rationale as the HLL entry in
plans/relational_extra): build one small sketch per partition of the data,
PERSIST the sketches, and answer later rollups — any grouping of
partitions — by MERGING sketches instead of rescanning the corpus.
Count-min merges by per-cell addition, so a sketch is just a
``(depth, bucket, count)`` DataFrame and merging is a groupBy-sum.

Estimates carry the classic guarantees: ``est ≥ true`` always (hash
collisions only ADD), and ``est ≤ true + (e/width)·N`` with probability
``1 − e^(−depth)`` — both stated as oracle-checkable booleans in the
catalog entry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, depth_idx: Column | int, width: int) -> Column:
    """Row ``depth_idx``'s bucket for ``key``: xxhash64 seeded by the row
    index, folded into [0, width).  ``pmod`` keeps negative hashes in
    range."""
    return F.pmod(F.xxhash64(key.cast("string"), F.lit(depth_idx)), F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    part_cols: list[str] | None = None,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch(es) of ``key_col`` frequencies, one per value of
    ``part_cols`` (no partitioning → a single global sketch).

    Output: ``(*part_cols, depth_idx, bucket, cnt)`` — at most
    ``depth·width`` rows per partition, whatever the input cardinality.
    One explode (depth×) + one aggregate; map-side partial sums compact
    the blowup before the shuffle, and the shuffle key space is the
    sketch's own (partition, depth, bucket) domain."""
    part_cols = list(part_cols or ())
    rows = df.select(
        *part_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth_idx"),
                        _bucket(F.col(key_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_db"),
    ).select(*part_cols, "_db.depth_idx", "_db.bucket")
    return rows.groupBy(*part_cols, "depth_idx", "bucket").agg(
        F.count("*").alias("cnt")
    )


def cms_merge(sketches: DataFrame, part_cols: list[str] | None = None) -> DataFrame:
    """Merge sketches by cell-wise addition — the operation that makes a
    persisted per-partition sketch table answer ANY coarser grouping
    without rescanning the data.  ``part_cols``: the grouping to KEEP
    (empty → one global sketch)."""
    part_cols = list(part_cols or ())
    return sketches.groupBy(*part_cols, "depth_idx", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point estimates for ``keys[key_col]`` from a (merged, global)
    sketch: min over depth rows of the key's bucket counts.

    The keys frame is expected to be small (a watch-list); it explodes
    depth× and joins the BROADCAST sketch (``depth·width`` rows, bounded
    by construction) — a lookup, not a scan of anything data-sized."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth_idx"),
                        _bucket(F.col(key_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_db"),
    ).select(key_col, "_db.depth_idx", "_db.bucket")
    # LEFT join from the probes: an EMPTY sketch cell has no stored row,
    # but count-min's minimum must see it as 0 — an inner join would
    # take the min over only the colliding non-empty cells (breaking the
    # ε-bound) and drop absent keys from the output entirely.
    return (
        probes.join(F.broadcast(sketch), ["depth_idx", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    part_cols: list[str] | None = None,
    num_bits: int = 4096,
    num_hashes: int = 5,
) -> DataFrame:
    """Bloom filter(s) of ``key_col`` membership, one per value of
    ``part_cols`` — as a DataFrame of SET BITS (``*part_cols, bit``).

    The third mergeable sketch of the family (HLL: distinct counts,
    count-min: frequencies, Bloom: membership).  At most
    ``min(distinct·k, num_bits)`` rows per partition regardless of input
    size; the k bit positions are xxhash64 seeded by the hash index —
    the same double-hashing family as the count-min buckets.  One
    explode (k×) + distinct; map-side partial dedup compacts before the
    shuffle, whose key space is the sketch's own (partition, bit)
    domain.  At 100 TB the use is decontamination-style membership
    gating: persist per-shard filters, merge (union-distinct), broadcast
    the merged bit set, and gate the big side map-side — no shuffle of
    the corpus."""
    part_cols = list(part_cols or ())
    rows = df.select(
        *part_cols,
        F.explode(
            F.array(
                *[
                    _bucket(F.col(key_col), j, num_bits).alias(f"_b{j}")
                    for j in range(num_hashes)
                ]
            )
        ).alias("bit"),
    )
    return rows.distinct()


def bloom_merge(
    filters: DataFrame, part_cols: list[str] | None = None
) -> DataFrame:
    """Merge Bloom filters by bit-set union — ``part_cols`` is the
    grouping to KEEP (empty → one global filter).  Exact merge, like
    all Bloom unions built with identical (num_bits, num_hashes)."""
    part_cols = list(part_cols or ())
    return filters.select(*part_cols, "bit").distinct()


def bloom_bitmap_words(bloom: DataFrame, num_bits: int) -> list[int]:
    """Pack a Bloom bit-set frame into ``⌈num_bits/64⌉`` signed 64-bit
    words (LongType-ready).  The collect is BOUNDED by construction:
    a bit-set frame has at most ``num_bits`` rows regardless of how much
    data built it — this is the sketch family's whole point, so
    materializing it on the driver is a constant-size read, not a scan."""
    words = [0] * ((num_bits + 63) // 64)
    for (b,) in bloom.select("bit").distinct().collect():
        words[b >> 6] |= 1 << (b & 63)
    # two's-complement fold into signed LongType range
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_bitmap_test(words_lit: Column, bit: Column) -> Column:
    """TRUE iff ``bit`` is set in a packed-word bitmap literal — a pure
    map-side expression (``element_at`` + ``getbit``), no join."""
    word = words_lit[F.shiftright(bit, 6).cast("int")]
    return F.getbit(word, bit.bitwiseAND(F.lit(63))) == F.lit(1)


def bloom_contains(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    num_bits: int = 4096,
    num_hashes: int = 5,
) -> DataFrame:
    """Membership probes against a (merged, global) filter: ``(key_col,
    maybe_present)``, one row per DISTINCT key — TRUE iff ALL k probe
    bits are set.

    No false negatives is a THEOREM (an inserted key's bits are all
    set); false positives occur at ≈ (1 − e^(−k·n/m))^k.  The filter is
    materialized once into a packed-word ARRAY LITERAL (≤ num_bits/64
    longs — a bounded driver read, see :func:`bloom_bitmap_words`) and
    every key tests its k bits map-side via ``element_at``+``getbit``:
    no explode, no join, no shuffle of the probe side beyond the
    distinct.  The per-key AND over the k bit tests also makes the
    no-false-negative theorem hold for DUPLICATE probe keys — the
    earlier exploded-join formulation summed set-bit hits per key and
    compared against k, so a key probed twice scored 2k ≠ k and was
    falsely reported absent.

    EAGER at construction: packing the literal collects the bit-set
    frame, so building this DataFrame runs Spark jobs for ``bloom``'s
    lineage before any action on the result.  That buys the joinless
    probe plan — right for a hot path that packs once and probes much.
    A builder that must stay lazy until first action (e.g. a catalog
    constructing plans it may never run) should use
    :func:`bloom_contains_lazy`, which trades one broadcast join for
    zero construction-time work."""
    # the cast is load-bearing: a sparse filter whose words all fit in
    # 32 bits would otherwise infer array<int>, and getbit rejects bit
    # positions ≥ 32 on an int word
    words_lit = F.lit(bloom_bitmap_words(bloom, num_bits)).cast(
        "array<bigint>"
    )
    key = F.col(key_col)
    pred = None
    for j in range(num_hashes):
        t = bloom_bitmap_test(words_lit, _bucket(key, j, num_bits))
        pred = t if pred is None else (pred & t)
    return (
        keys.select(key_col)
        .distinct()
        .select(key, pred.alias("maybe_present"))
    )


def bloom_contains_lazy(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    num_bits: int = 4096,
    num_hashes: int = 5,
) -> DataFrame:
    """:func:`bloom_contains` with ZERO construction-time work: the
    bit-set is packed into words BY THE PLAN (``bit_or`` aggregate over
    ``⌈num_bits/64⌉`` word indices, folded to one array row) and
    broadcast onto the probe side, instead of being collected into a
    literal on the driver.  Same output, same no-false-negative and
    FP-rate contracts — including on duplicate probe keys.

    The trade: one broadcast nested-loop join of a single-row side (and
    a bounded ≤ num_bits-row aggregate inside the job) replaces the
    joinless literal probe, and in exchange constructing the DataFrame
    runs no Spark job at all.  Use this from catalog/plan builders that
    must stay lazy; use the literal form on a hot path that packs once
    and probes repeatedly."""
    spark = bloom.sparkSession
    num_words = (num_bits + 63) // 64
    word_rows = (
        bloom.select(F.col("bit").cast("bigint").alias("bit"))
        .distinct()
        .select(
            F.shiftright("bit", 6).cast("int").alias("w"),
            # python shiftleft() only takes a literal shift; the SQL
            # builtin accepts a per-row expression
            F.expr("shiftleft(1L, cast(bit % 64 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
    )
    # complete the word domain so element_at never reads a hole, and
    # fold into ONE ordered-array row (bounded: ≤ num_bits/64 entries)
    packed = (
        spark.range(num_words)
        .select(F.col("id").cast("int").alias("w"))
        .join(word_rows, "w", "left")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("w"), F.col("word")))
            ).alias("_s")
        )
        .select(
            F.transform(
                "_s", lambda x: F.coalesce(x["word"], F.lit(0).cast("bigint"))
            ).alias("_words")
        )
    )
    key = F.col(key_col)
    pred = None
    for j in range(num_hashes):
        t = bloom_bitmap_test(F.col("_words"), _bucket(key, j, num_bits))
        pred = t if pred is None else (pred & t)
    return (
        keys.select(key_col)
        .distinct()
        .crossJoin(F.broadcast(packed))
        .select(key, pred.alias("maybe_present"))
    )


def cms_join_size(
    sketch_a: DataFrame, sketch_b: DataFrame, depth: int = 4
) -> DataFrame:
    """Inner-equi-join CARDINALITY estimate from two count-min sketches
    of the join keys: per depth row, the bucket-wise dot product
    Σ cnt_a·cnt_b; the estimate is the MIN over depth rows — the classic
    sketch join-size estimator (never underestimates: every colliding
    pair only adds; E[overshoot] ≤ (e/width)·N_a·N_b per row).

    The pre-flight planning primitive at 100 TB: both sketches are
    ≤ depth·width rows built in one pass each (or read from persisted
    per-partition sketches via ``cms_merge``), so "how big is this join"
    costs a bounded-size join of two tiny frames — BEFORE committing to
    a shuffle of two huge tables, and without trusting stale table
    stats.  Output: one row, ``est_join_rows``.

    Depth rows with zero overlapping buckets contribute a 0 dot product
    (the estimate is then 0 = the truth: no key collides anywhere), so
    the depth domain is completed explicitly — an inner-join-only
    formulation would take the min over surviving rows and overestimate.
    """
    spark = sketch_a.sparkSession
    dots = (
        sketch_a.alias("a")
        .join(
            sketch_b.alias("b"),
            (F.col("a.depth_idx") == F.col("b.depth_idx"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .groupBy(F.col("a.depth_idx").alias("depth_idx"))
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("_dot"))
    )
    domain = spark.range(depth).select(F.col("id").cast("int").alias("depth_idx"))
    return (
        domain.join(F.broadcast(dots), "depth_idx", "left")
        .agg(
            F.min(F.coalesce("_dot", F.lit(0)))
            .cast("long")
            .alias("est_join_rows")
        )
    )


# ---------------------------------------------------------------------------
# Mergeable quantile sketch: log-linear histogram (HdrHistogram family)
# ---------------------------------------------------------------------------


def qhist_floor(value: Column, sub_bits: int = 5) -> Column:
    """Deterministic log-linear bucket LOWER BOUND of a non-negative long
    (the HdrHistogram / DDSketch bucketing family, integer-exact): keep
    the top ``sub_bits + 1`` significant bits and zero the rest —
    ``floor = (v >> s) << s`` with ``s = max(bitlen(v) - 1 - sub_bits,
    0)``.  Values below ``2^(sub_bits+1)`` are their own bucket (exact);
    above, the bucket width is ``2^s`` so ``width / floor ≤ 2^-sub_bits``
    — a hard RELATIVE-error bound at every magnitude, in pure integer
    ops that DuckDB replicates bit-identically (``length(bin(v))`` and
    ``>>``/``<<`` exist on both engines; no log2, whose last-ulp
    behavior at power-of-two boundaries does NOT cross engines).

    Precondition: ``value ≥ 0`` (shift semantics on negatives diverge);
    builders enforce it with an explicit filter they must document."""
    from pyspark.sql.functions import call_function

    v = value.cast("long")
    s = F.greatest(F.length(F.bin(v)) - F.lit(1 + sub_bits), F.lit(0))
    # the python wrappers F.shiftright/F.shiftleft only accept int
    # literals for the shift; the underlying SQL expressions take a
    # column, reachable via call_function
    return call_function("shiftleft", call_function("shiftright", v, s), s)


def qhist_build(
    df: DataFrame,
    value_col: str,
    part_cols: list[str] | None = None,
    sub_bits: int = 5,
) -> DataFrame:
    """Quantile-histogram sketch(es) of ``value_col``, one per value of
    ``part_cols`` — the MERGEABLE quantile summary completing the sketch
    tier (HLL = distincts, CMS = frequencies, Bloom = membership, this =
    quantiles).  approx_percentile cannot do the persisted-sketch rollup
    because its digest never leaves the aggregate; a histogram is just a
    ``(bucket_lo, cnt)`` DataFrame and merging is a groupBy-sum.

    Output: ``(*part_cols, bucket_lo, cnt)`` — at most ``~63·2^sub_bits``
    rows per partition whatever the input size (≈ 2k at the default 5),
    with relative bucket error ≤ ``2^-sub_bits`` (3.1%).  NULL and
    negative values are EXCLUDED by an explicit filter (shift semantics
    on negatives diverge between engines) — callers needing signed data
    shift it into the non-negative domain first; the filter is part of
    the operator's declared semantics, not a silent drop.

    Scale shape: one narrow projection + one hash aggregate whose key
    space is the sketch's own bounded (partition, bucket) domain;
    map-side partial aggregation collapses the input before the
    shuffle."""
    part_cols = list(part_cols or ())
    v = F.col(value_col).cast("long")
    return (
        df.where(v >= 0)
        .select(*part_cols, qhist_floor(v, sub_bits).alias("bucket_lo"))
        .groupBy(*part_cols, "bucket_lo")
        .agg(F.count("*").alias("cnt"))
    )


def qhist_merge(
    sketches: DataFrame, part_cols: list[str] | None = None
) -> DataFrame:
    """Merge histogram sketches by per-bucket addition — any coarser
    grouping of persisted per-partition sketches without a rescan."""
    part_cols = list(part_cols or ())
    return sketches.groupBy(*part_cols, "bucket_lo").agg(
        F.sum("cnt").alias("cnt")
    )


def qhist_quantiles(sketch: DataFrame, qs: list[float]) -> DataFrame:
    """Quantile estimates from a (merged, global) histogram sketch:
    for each ``q``, the smallest ``bucket_lo`` whose cumulative count
    reaches rank ``max(ceil(q·N), 1)``.

    Because per-bucket counts are EXACT, the selected bucket provably
    CONTAINS the true q-th smallest value — the only error is the
    bucket's own width, so ``est ≤ true < est·(1 + 2^-sub_bits)`` (est
    is the bucket's lower bound).  The rank arithmetic is
    ``ceil(q · double(N))`` — one IEEE multiply + ceil, bit-identical
    across engines for identical ``q`` literals.

    The cumulative window runs UNPARTITIONED — correct here because a
    sketch is bounded by construction (~2k rows at sub_bits=5),
    independent of the data size it summarizes; this is a reduction over
    a sketch, not over data."""
    from pyspark.sql import Window

    cum = sketch.withColumn(
        "_cum",
        F.sum("cnt").over(
            Window.orderBy("bucket_lo").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    total = sketch.agg(F.sum("cnt").alias("_n"))
    qdf = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(qdf))
        .where(
            F.col("_cum")
            >= F.greatest(
                F.ceil(F.col("q") * F.col("_n").cast("double")), F.lit(1)
            )
        )
        .groupBy("q")
        .agg(F.min("bucket_lo").alias("q_est"))
    )


def qhist_ks_drift(
    df: DataFrame,
    value_col: str,
    part_col: str,
    sub_bits: int = 5,
    round_to: int = 4,
) -> DataFrame:
    """Kolmogorov–Smirnov drift of each partition's value distribution
    vs the REST of the corpus, computed entirely over histogram
    sketches: ``(part_col, n_rows, ks_d)`` with ``D = max_b |CDF_part(b)
    − CDF_rest(b)|`` evaluated at the shared log-linear bucket
    boundaries.

    The slice-audit question at 100 TB ("which source's length/score
    distribution wandered?") without ever sorting data: exactness of
    the per-bucket counts makes this the true KS statistic OF THE
    BUCKETED distributions — discretization can only blur a shift
    narrower than one bucket (relative width ≤ 2^-sub_bits), so a large
    D is always real.  NULL and negative values are excluded
    (:func:`qhist_build`'s declared domain); a partition that IS the
    whole corpus has no rest-side and yields no row.

    Scale shape: one sketch build (hash aggregate onto the bounded
    (partition, bucket) domain), then every window/join runs on sketch
    rows (P × ≤ ~2k), never on data — same bounded-reduction argument
    as :func:`qhist_quantiles`."""
    from pyspark.sql import Window

    # bounded (partition, bucket) sketch, lazily pinned (optimization
    # r17): six plan branches reference it (grid both axes, the fill,
    # the global merge, per-part totals, the corpus total) and each
    # unpinned reference replayed the corpus histogram aggregate — 6
    # scans in the committed plan.  Value neutral.
    h = qhist_build(df, value_col, [part_col], sub_bits).localCheckpoint(
        eager=False
    )
    grid = (
        h.select(part_col).distinct()
        .crossJoin(h.select("bucket_lo").distinct())
    )
    filled = grid.join(h, [part_col, "bucket_lo"], "left").select(
        part_col, "bucket_lo", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    w_part = (
        Window.partitionBy(part_col)
        .orderBy("bucket_lo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cs = filled.withColumn("cum", F.sum("cnt").over(w_part))
    g = qhist_merge(h)
    w_glob = Window.orderBy("bucket_lo").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cg = g.withColumn("gcum", F.sum("cnt").over(w_glob)).select(
        "bucket_lo", "gcum"
    )
    tot = h.groupBy(part_col).agg(F.sum("cnt").alias("n_rows"))
    n = h.agg(F.sum("cnt").alias("_nn"))
    return (
        cs.join(cg, "bucket_lo")
        .join(F.broadcast(tot), part_col)
        .crossJoin(F.broadcast(n))
        .where(F.col("_nn") > F.col("n_rows"))
        .groupBy(part_col, "n_rows")
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum") / F.col("n_rows").cast("double")
                        - (F.col("gcum") - F.col("cum"))
                        / (F.col("_nn") - F.col("n_rows")).cast("double")
                    )
                ),
                round_to,
            ).alias("ks_d")
        )
    )


# --- KMV (k-minimum-values) distinct sketches -------------------------

# 13 hex digits = 52 bits: fits exactly in both a BIGINT and an IEEE
# double mantissa, so the [0,1) fraction below is exact on every engine
_KMV_HEX_DIGITS = 13
_KMV_SPACE = 16**_KMV_HEX_DIGITS


def kmv_hash(key: Column) -> Column:
    """The KMV hash of a key: the first 13 hex digits of its md5 as a
    BIGINT — engine-portable (md5 is bit-identical everywhere; the SQL
    twin folds the same digits with literal powers of 16)."""
    return F.conv(F.substring(F.md5(key), 1, _KMV_HEX_DIGITS), 16, 10).cast(
        "long"
    )


def kmv_sketch(
    df: DataFrame, group_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """K-minimum-values distinct sketch per group: the ``k`` smallest
    distinct md5-derived hash values of ``key_col`` (Bar-Yossef et al.
    2002).  Output ``(group_col, h)`` — ≤ k rows per group.

    Unlike HLL, a KMV sketch supports set INTERSECTION (and so Jaccard)
    by combining sketches, and — because "k smallest distinct hashes" is
    a pure function of the data — the sketch and every estimate built
    from it are deterministic and hash-match an independent SQL oracle
    exactly (no tolerance bands, unlike the HLL/CMS contracts).

    Mergeable: union two groups' sketches, dedup h, keep the k smallest
    — ``kmv_merge``.  Scale shape: one distinct on (group, h) — the
    shuffle carries 8-byte hashes — then a per-group top-k heap
    (row_number over a k-bounded frame), never a global sort."""
    from pyspark.sql import Window

    hashed = df.select(
        F.col(group_col), kmv_hash(F.col(key_col)).alias("h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        hashed.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .select(group_col, "h")
        # ≤ k rows per group, lazily pinned (optimization r17):
        # kmv_jaccard alone references the sketch six times (both pair
        # sides, the union expansion, both membership marks), and each
        # unpinned reference replayed the corpus distinct+top-k — 12
        # documents scans in the committed kmv-jaccard plan.  Value
        # neutral; the sketch is the designed reuse artifact.
        .localCheckpoint(eager=False)
    )


def kmv_distinct_estimate(
    sketch: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch: with a full
    sketch, D̂ = (k−1) / (h_k / 16¹³); a sketch smaller than k IS the
    distinct set, so the estimate is its exact size.  One k-bounded
    aggregate per group."""
    agg = sketch.groupBy(group_col).agg(
        F.count("*").alias("_n"), F.max("h").alias("_hk")
    )
    frac = F.col("_hk").cast("double") / F.lit(float(_KMV_SPACE))
    return agg.select(
        group_col,
        F.when(F.col("_n") < k, F.col("_n").cast("double"))
        .otherwise((F.lit(k) - F.lit(1)).cast("double") / frac)
        .alias("est_distinct"),
    )


def kmv_jaccard(
    sketch: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """Pairwise Jaccard estimates between groups from their KMV sketches
    (Beyer et al. 2007): for groups (a, b), take the k smallest hashes
    of the UNION of their sketches; the fraction of those present in
    BOTH sketches estimates |A∩B| / |A∪B|.  Deterministic — exact SQL
    parity.  Scale shape: sketches are ≤ k rows per group, so the pair
    expansion is (groups² · k) sketch rows — independent of data size."""
    from pyspark.sql import Window

    a = sketch.select(
        F.col(group_col).alias("ga"), F.col("h").alias("h")
    )
    b = sketch.select(
        F.col(group_col).alias("gb"), F.col("h").alias("h")
    )
    pairs = (
        a.select("ga")
        .distinct()
        .join(b.select("gb").distinct(), F.col("ga") < F.col("gb"))
    )
    un = (
        pairs.join(a, "ga")
        .select("ga", "gb", "h")
        .unionByName(pairs.join(b, "gb").select("ga", "gb", "h"))
        .distinct()
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    topk = un.withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= k)
    in_a = a.withColumn("_ia", F.lit(1))
    in_b = b.withColumn("_ib", F.lit(1))
    marked = (
        topk.join(in_a, ["ga", "h"], "left")
        .join(in_b, ["gb", "h"], "left")
        .groupBy("ga", "gb")
        .agg(
            F.count("*").alias("_m"),
            F.sum(
                F.when(
                    F.col("_ia").isNotNull() & F.col("_ib").isNotNull(), 1
                ).otherwise(0)
            ).alias("_both"),
        )
    )
    return marked.select(
        "ga",
        "gb",
        (F.col("_both").cast("double") / F.col("_m").cast("double")).alias(
            "est_jaccard"
        ),
    )


def kmv_merge(
    parts: list[DataFrame], group_col: str, k: int = 64
) -> DataFrame:
    """Merge KMV sketches: union, dedup (group, h), keep the k smallest
    per group — by construction identical to sketching the concatenated
    inputs (min-k of a union is the min-k of the mins), so partitioned
    corpora sketch independently and roll up without a rescan, like the
    CMS/HLL/qhist members of the persisted-sketch family."""
    from pyspark.sql import Window

    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        merged.distinct()
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .select(group_col, "h")
    )


def key_bitmaps(
    df: DataFrame,
    dim_col: str,
    key_col: str,
    word_bits: int = 63,
) -> DataFrame:
    """Bitmap index of a non-negative integer key per dimension value:
    one ``(dim, word_idx, word)`` row per occupied 63-bit word, built by
    a single ``bit_or`` aggregate — the audience-segmentation structure
    (roaring-bitmap-style, fixed words instead of RLE) that answers
    repeated set intersections WITHOUT a distinct-join per question:
    |A ∩ B| over pre-built bitmaps is a word-aligned join + popcount,
    ~8 bytes per 63 present keys instead of 8 bytes per key per query.

    63-bit words (not 64): ``1 << 63`` overflows a signed BIGINT —
    Spark wraps silently, DuckDB raises — so the top bit is simply
    never used and every engine computes identical words.  Keys must be
    non-negative integers (ids); NULL keys are dropped, NEGATIVE keys
    RAISE (``assert_true`` in the plan): a negative key would shift by
    a negative count and land in a negative word_idx — silently corrupt
    words, with Spark and DuckDB additionally disagreeing on negative
    ``%`` — so the precondition is enforced, not trusted.

    Scale shape: one (dim, word_idx) hash aggregate, map-side
    combinable; the bitmap is ~n_keys/63 rows per dim — dense id spaces
    compress 63×, and every downstream intersection/union/difference is
    a co-partitioned equi-join on (dim, word_idx)."""
    d = df.select(
        F.col(dim_col).alias("dim"), F.col(key_col).alias("_k")
    ).where(F.col("_k").isNotNull())
    word_idx = F.when(
        F.col("_k") < 0,
        F.raise_error(
            F.lit(
                "key_bitmaps: negative key — keys must be non-negative ids"
            )
        ).cast("long"),
    ).otherwise(F.expr(f"_k div {word_bits}"))
    return (
        d.select(
            "dim",
            word_idx.alias("word_idx"),
            F.expr(
                f"shiftleft(cast(1 as bigint), cast(_k % {word_bits} as int))"
            ).alias("_bit"),
        )
        .groupBy("dim", "word_idx")
        .agg(F.bit_or("_bit").alias("word"))
    )


def bitmap_cardinality(bitmaps: DataFrame) -> DataFrame:
    """(dim, n_keys): exact distinct-key count per dimension from a
    :func:`key_bitmaps` frame — Σ popcount(word), one tiny aggregate."""
    return bitmaps.groupBy("dim").agg(
        F.sum(F.bit_count("word")).alias("n_keys")
    )


def bitmap_intersect_cardinality(
    a: DataFrame, b: DataFrame
) -> DataFrame:
    """(dim_a, dim_b, n_common): exact |A ∩ B| for every (dim_a, dim_b)
    pair present in both frames — word-aligned inner join + popcount of
    the AND.  Words absent on either side intersect to nothing, so the
    inner join IS the intersection; no outer handling needed."""
    aw = a.select(
        F.col("dim").alias("dim_a"), "word_idx", F.col("word").alias("_wa")
    )
    bw = b.select(
        F.col("dim").alias("dim_b"), "word_idx", F.col("word").alias("_wb")
    )
    return (
        aw.join(bw, "word_idx")
        .groupBy("dim_a", "dim_b")
        .agg(
            F.sum(
                F.bit_count(F.col("_wa").bitwiseAND(F.col("_wb")))
            ).alias("n_common")
        )
    )


def save_bitmap_index(
    spark,
    df: DataFrame,
    root: str,
    dim_col: str,
    key_col: str,
    word_bits: int = 63,
    mode: str = "append",
) -> int:
    """Persist (or append to) a versioned bitmap index: the batch's
    :func:`key_bitmaps` rows committed as a snapshot, manifest-stamped
    with ``word_bits`` so a later reader refuses to OR words of a
    different width (same fail-loud stamping as the signature index).

    Appends are O(delta): each ingest commits only ITS batch's words;
    :func:`load_bitmap_index` merges on read with one ``bit_or`` —
    valid precisely because bit_or is idempotent/commutative/
    associative, so delta-commits OR-merged equal the full recompute
    bit-for-bit (the mergeable-aggregate argument every structure in
    this module leans on).  Returns the committed version."""
    from hfp_loader_spark.versioned import (
        _read_manifest,
        commit_snapshot,
        latest_version,
    )

    head = latest_version(spark, root)
    if head is not None and mode == "append":
        meta = _read_manifest(spark, root, head).meta or {}
        stored = (meta.get("bitmap_params") or {}).get("word_bits")
        if stored is not None and stored != word_bits:
            raise ValueError(
                f"bitmap index at {root!r} uses word_bits={stored}; "
                f"appending word_bits={word_bits} words would corrupt "
                "every merged popcount — rebuild, don't mix"
            )
    bm = key_bitmaps(df, dim_col, key_col, word_bits=word_bits)
    return commit_snapshot(
        spark,
        bm,
        root,
        mode=mode,
        meta={"bitmap_params": {"word_bits": word_bits}},
    )


def load_bitmap_index(spark, root: str, version: int | None = None) -> DataFrame:
    """Read a versioned bitmap index, OR-merging the per-commit delta
    words into one row per (dim, word_idx) — the merged frame is
    identical to :func:`key_bitmaps` over the union of every ingested
    batch, and feeds :func:`bitmap_cardinality` /
    :func:`bitmap_intersect_cardinality` directly."""
    from hfp_loader_spark.versioned import read_snapshot

    return (
        read_snapshot(spark, root, version=version)
        .groupBy("dim", "word_idx")
        .agg(F.bit_or("word").alias("word"))
    )
