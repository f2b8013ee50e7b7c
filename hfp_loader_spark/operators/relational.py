"""Core relational operator tier (SURVEY §2.11 / §7 step 7).

Thin, tested helpers over DataFrame ops.  Everything here compiles to
built-in Catalyst plans — the value added is the scale-aware defaults
(broadcast hints for dimension tables, tiebroken orderings for deterministic
top-k, map-side-combinable aggregations) and a uniform API the query catalog
builds on.

Scale notes are per-function; the common themes:
- dimension joins take an explicit ``broadcast`` hint when the dimension is
  known-small (region/nation-sized) — saves a shuffle of the fact table;
- every ranking is tiebroken on a unique key so results are deterministic
  under parallel execution (a bare row_number over ties is not);
- top-k is window + filter: Spark pushes a per-partition local limit before
  the shuffle, so the full sort never materializes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Join with an explicit broadcast of the dimension side.

    For region/nation-sized dims this avoids shuffling the fact table
    entirely; AQE would usually get there on its own, but the hint makes the
    plan deterministic at any scale.
    """
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS: left rows with at least one match (dedup-free, no row blowup)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — the dedup primitive of the HFP load (SURVEY §2.3 J1)."""
    return left.join(right, on, "left_anti")


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Deterministic top-k per group: row_number over a tiebroken ordering.

    ``order_by`` must end with a unique tiebreaker column.  Physical plan:
    per-partition local sort + global window — no full global sort.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def global_top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """ORDER BY … LIMIT k — Spark plans TakeOrderedAndProject: each task
    keeps a k-row heap, the driver merges; no global sort at any scale."""
    return df.orderBy(*order_by).limit(k)


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Batch sessionization: new session when the gap to the previous event
    exceeds ``gap_seconds`` (the lag + cumulative-sum islands pattern).

    One shuffle on ``user_col``; both window passes reuse the same
    partitioning, so Catalyst plans a single exchange.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    gap = F.col(ts_col).cast("long") - prev_ts.cast("long")
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int | None = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-spreading equi-join: salt the hot side, replicate the other.

    AQE's skew-join split (enabled in session.py) handles most skew at
    runtime; salting is the explicit fallback for joins AQE cannot split
    (e.g. followed by a same-key aggregate, or under bucketed layouts).
    The skewed side gets a uniform salt in [0, n_salts); the small side is
    replicated n_salts× via an in-row explode — its shuffle volume grows
    n_salts×, so use this only when ``small`` is orders of magnitude
    smaller than the hot keys' row counts.  Join semantics are unchanged:
    every (key, salt) pair on the left finds exactly the original right
    rows for that key.

    ``n_salts=None`` → MEASURE, then decide: profile the skewed side's
    key cardinalities (``quality.key_skew_stats``, one aggregate pass)
    and derive the factor from the max/avg skew ratio
    (``quality.derive_salt_factor`` — max, not p99: one mega-hot key
    among thousands of uniform ones leaves p99 ≈ avg).  Below the
    engage threshold the
    join runs PLAIN — no salt column, no replicated dimension — so the
    auto mode is safe to leave on for keys that might not be skewed.
    """
    if n_salts is None:
        from hfp_loader_spark.operators.quality import (
            derive_salt_factor,
            key_skew_stats,
        )

        n_salts = derive_salt_factor(key_skew_stats(skewed, on))
        if n_salts <= 1:
            return skewed.join(small, on, how)
    salt = F.floor(F.rand(42) * n_salts).cast("int")
    left = skewed.withColumn("_salt", salt)
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return left.join(right, [*on, "_salt"], how).drop("_salt")


def choose_join_strategy(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    broadcast_max_rows: int = 500_000,
    prefilter_below_match_ratio: float = 0.5,
    engage_at: float = 2.0,
    max_salts: int = 64,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
) -> tuple[DataFrame, dict]:
    """Pre-flight join planning from bounded instruments: pick broadcast
    vs salted vs Bloom-prefiltered vs plain shuffle BEFORE committing to
    a 100 TB shuffle, and return (joined_df, decision).

    The planning pass a production job runs once per layout, built from
    this repo's own instruments — each a bounded aggregate, none a scan
    retained in memory:

    1. ``dim.count()`` — at or under ``broadcast_max_rows`` the dim
       broadcasts (`strategy='broadcast'`): zero shuffle of the fact
       side, skew irrelevant.
    2. ``quality.key_skew_stats`` on the fact keys →
       ``derive_salt_factor`` (max/avg signal): a factor above 1 salts
       the join (`'salted'`, the measured factor) — AQE's runtime skew
       split can't help a join feeding a same-key aggregate.
    3. ``sketches.cms_join_size`` over count-min sketches of BOTH key
       streams: when the estimated join cardinality is below
       ``prefilter_below_match_ratio × fact_rows`` (a miss-heavy join —
       most fact rows find no partner), the fact side is gated through
       a Bloom filter of the dim keys (k chained broadcast left-semi
       joins, map-side — same gate as the decontamination phase 1)
       BEFORE the shuffle, so non-matching rows never shuffle at all
       (`'bloom_prefilter_shuffle'`; inner joins only — dropping
       non-matching fact rows early would change outer semantics, and
       CMS over-estimation means the gate can only be conservative).
    4. Otherwise `'shuffle'`: the plain hash join, AQE handling the
       residuals.

    The decision dict records the strategy and every measured input
    (dim rows, fact rows, skew stats, estimated join rows) — the audit
    line a pipeline logs next to the chosen plan."""
    from hfp_loader_spark.operators.quality import (
        derive_salt_factor,
        key_skew_stats,
    )
    from hfp_loader_spark.operators.sketches import (
        _bucket,
        bloom_build,
        cms_build,
        cms_join_size,
    )

    on = [on] if isinstance(on, str) else list(on)
    decision: dict = {}

    n_dim = dim.count()
    decision["dim_rows"] = n_dim
    if n_dim <= broadcast_max_rows:
        decision["strategy"] = "broadcast"
        return fact.join(F.broadcast(dim), on, how), decision

    stats = key_skew_stats(fact, on)
    decision["fact_key_stats"] = stats
    n_fact = int(round(stats["n_keys"] * stats["avg_rows_per_key"]))
    decision["fact_rows"] = n_fact
    factor = derive_salt_factor(stats, max_salts=max_salts, engage_at=engage_at)
    if factor > 1:
        decision["strategy"] = "salted"
        decision["n_salts"] = factor
        return salted_join(fact, dim, on, n_salts=factor, how=how), decision

    key = F.xxhash64(*on)
    est = cms_join_size(
        cms_build(fact.select(key.alias("_k")), "_k"),
        cms_build(dim.select(key.alias("_k")), "_k"),
    ).collect()[0]["est_join_rows"]
    decision["est_join_rows"] = est
    if how == "inner" and n_fact > 0 and (
        est < prefilter_below_match_ratio * n_fact
    ):
        decision["strategy"] = "bloom_prefilter_shuffle"
        bits = bloom_build(
            dim.select(key.alias("_k")),
            "_k",
            num_bits=num_bits,
            num_hashes=num_hashes,
        )
        gated = fact
        for j in range(num_hashes):
            gated = gated.join(
                F.broadcast(bits),
                _bucket(key, j, num_bits) == bits["bit"],
                "left_semi",
            )
        return gated.join(dim, on, how), decision

    decision["strategy"] = "shuffle"
    return fact.join(dim, on, how), decision


def asof_join(
    probes: DataFrame,
    events: DataFrame,
    key: str,
    probe_ts: str,
    event_ts: str,
    event_cols: list[str],
) -> DataFrame:
    """As-of join: for each probe row, the latest event with the same key
    and ``event_ts <= probe_ts`` (inclusive), inner semantics.

    Spark has no ASOF JOIN; the naive formulation is an inequality join
    (quadratic per key).  This composition is the scale-correct plan:
    union both sides tagged, ONE shuffle+sort on (key, ts, side), then a
    running ``last(…, ignorenulls)`` carries the most recent event's
    columns forward onto each probe row.  Cost is sort-merge-like:
    O((|events|+|probes|) log) per key partition, no pair blowup, and the
    single exchange is shared by every carried column.

    The event columns are carried as ONE STRUCT, not column-by-column:
    ``ignorenulls`` must skip the probe rows' filler NULLs, but a
    per-column carry also skips an event's genuinely-NULL value and
    resurrects an OLDER event's value for that column — splicing fields
    of different events into one match (and the old
    first-column-NULL inner filter dropped genuinely matched probes).
    A NULL struct marks "probe row"; a non-NULL struct with NULL fields
    is a real event, carried intact — exactly ASOF-join semantics."""
    probe_cols = [c for c in probes.columns if c not in (key, probe_ts)]
    ev = events.select(
        F.col(key),
        F.col(event_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in event_cols]).alias("_ev"),
        *[F.lit(None).cast(dict(probes.dtypes)[c]).alias(c) for c in probe_cols],
    )
    pr = probes.select(
        F.col(key),
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(ev.schema["_ev"].dataType).alias("_ev"),
        *[F.col(c) for c in probe_cols],
    )
    u = ev.unionByName(pr)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        key,
        "_ts",
        "_side",
        *probe_cols,
        F.last("_ev", ignorenulls=True).over(w).alias("_ev"),
    )
    out = carried.where(F.col("_side") == 1).drop("_side")
    # inner semantics: drop probes with no event at or before them (the
    # struct is NULL iff no event row precedes the probe)
    return (
        out.where(F.col("_ev").isNotNull())
        .select(
            key,
            "_ts",
            *probe_cols,
            *[F.col(f"_ev.{c}").alias(c) for c in event_cols],
        )
        .withColumnRenamed("_ts", probe_ts)
    )


def bucketed_interval_join(
    intervals: DataFrame,
    events: DataFrame,
    key: str,
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Range (interval-containment) join: event rows with
    ``start <= ts <= end`` per key — without the quadratic blowup.

    A naive ``ON ts BETWEEN start AND end`` is a conditional join Spark
    executes as broadcast-nested-loop.  Bucketing makes it an equi-join:
    events hash to their time bucket; each interval explodes to the (few)
    buckets it overlaps; the join runs on (key, bucket) equality and the
    exact BETWEEN predicate refines.  Shuffle volume is rows × overlap
    factor (≈ interval_len/bucket + 1), independent of corpus size per
    key.  Pick ``bucket_seconds`` ≈ the typical interval length.
    """
    ev = events.withColumn(
        "_bucket", F.floor(F.col(ts_col).cast("long") / bucket_seconds)
    )
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("long") / bucket_seconds),
                F.floor(F.col(end_col).cast("long") / bucket_seconds),
            )
        ),
    )
    joined = iv.join(ev, [key, "_bucket"]).where(
        F.col(ts_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("_bucket")


def merge_upsert(
    target: DataFrame, source: DataFrame, keys: list[str]
) -> DataFrame:
    """MERGE semantics as a pure DataFrame composition: source rows replace
    key-matching target rows (WHEN MATCHED THEN UPDATE with full-row
    payload), unmatched source rows are inserted, untouched target rows
    survive.  ``new_target = source ∪ (target ANTI source ON keys)``.

    Sources must be key-unique (enforce upstream with dropDuplicates —
    SQL MERGE raises on multiple matches; a silent union would
    nondeterministically duplicate).

    Scale shape: one anti-join on the keys (broadcast when the changeset
    is small — the common CDC case) + a union; no window, no sort. This
    is the engine-level core of Delta/Iceberg MERGE INTO, minus the
    transaction log — pair with an atomic-swap rewrite
    (maintenance.compact_table) for the durable variant."""
    assert target.columns == source.columns, (
        f"schema mismatch: {target.columns} vs {source.columns}"
    )
    kept = target.join(source.select(*keys), keys, "left_anti")
    return kept.unionByName(source)


def apply_changelog(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """CDC changelog application with tombstones — the generalization of
    :func:`merge_upsert` to full INSERT/UPDATE/DELETE streams (Debezium /
    Delta CDF shape; the reference's loader is the degenerate
    append-only case of this, `service/hfpTask.ts:96-118`).

    Per key, the WINNING change is the max of ``struct(seq, op,
    payload…)`` — highest sequence number wins; equal sequences break
    ties lexicographically on (op, payload), deterministically on any
    engine (prefer unique sequences upstream; the tiebreak exists so
    malformed feeds still resolve reproducibly rather than
    nondeterministically).  A winning ``'D'`` removes the key; any other
    op replaces (or inserts) the full-row payload.  Untouched target
    rows survive.

    Scale shape: one key-grouped aggregate over the changeset (constant
    per-key state), one anti-join of the target against the changed-key
    set (broadcast when the changeset is small — the common CDC case),
    one union.  No window over the target, no sort."""
    payload = [c for c in target.columns if c not in keys]
    missing = [c for c in target.columns if c not in changes.columns]
    assert not missing, f"changes missing target columns: {missing}"
    winners = (
        changes.groupBy(*keys)
        .agg(
            F.max(
                F.struct(
                    F.col(seq_col), F.col(op_col), *[F.col(c) for c in payload]
                )
            ).alias("_w")
        )
        .select(
            *keys,
            F.col(f"_w.{op_col}").alias("_op"),
            *[F.col(f"_w.{c}").alias(c) for c in payload],
        )
        # the winner table feeds BOTH the anti-join key set and the
        # applied rows — unpinned, each reference replays the whole
        # changeset aggregate (the cdc entry's plan scanned its change
        # branches twice: 11 scans).  Lazily pinned, one changeset pass
        # (optimization r17; value neutral, changed-key-count rows).
        .localCheckpoint(eager=False)
    )
    kept = target.join(winners.select(*keys), keys, "left_anti")
    applied = winners.where(F.col("_op") != "D").select(*target.columns)
    return kept.unionByName(applied)


def scd2_intervals(
    df: DataFrame,
    key: str,
    state_col: str,
    ts_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2 build: collapse a change-event
    stream into effective-dated intervals per key.

    Consecutive duplicate states compress away first (lag over the
    per-key timeline — a repeated reading is not a change), then lead()
    closes each interval at the next change's timestamp; the current
    state gets valid_to = NULL.

    One shuffle total: both windows partition by ``key`` and order by
    (``ts_col``, tiebreak on ``state_col``), so Catalyst evaluates them
    in a single sort pass. At 100 TB the shuffle is the per-key history —
    bounded by entity count, and naturally partition-prunable on the key."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(ts_col, state_col)
    changes = df.select(key, state_col, ts_col).withColumn(
        "_prev_state", F.lag(state_col).over(w)
    ).where(
        F.col("_prev_state").isNull()
        | (F.col(state_col) != F.col("_prev_state"))
    )
    w2 = Window.partitionBy(key).orderBy(ts_col, state_col)
    return changes.select(
        key,
        state_col,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    id_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Sequential funnel conversion: users completing step i must have an
    event of ``steps[i]`` STRICTLY AFTER their earliest completion of
    step i-1 (the standard product-analytics semantics — re-ordered
    events don't count).

    Returns (step, step_idx, n_users), one row per step.

    Shape at scale: per step, the events side is filtered to ONE type
    before its groupBy/join — each round shuffles only that step's
    events plus the surviving-user set, all keyed on ``id_col`` so AQE
    can reuse the partitioning; no window over the full event stream, no
    per-user event arrays in memory (a collect_list-based funnel dies on
    power users; this never materializes a user's history)."""
    # each step's survivor frame feeds BOTH the next step's join and its
    # own count — unpinned, the unrolled recurrence replays every prior
    # step inside every later one (events scanned 1+2+…+n times; 6
    # scans for 3 steps in the committed plan).  The lazy per-step
    # localCheckpoint pins the per-user-bounded frame so each step's
    # type-filtered events pass runs exactly once (optimization r17,
    # guide §2.4/§5 — the kmeans-round lineage fix applied here; value
    # neutral).
    step0 = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(id_col)
        .agg(F.min(ts_col).alias("_t"))
        .localCheckpoint(eager=False)
    )
    reached = [step0]
    for s in steps[1:]:
        prev = reached[-1]
        nxt = (
            events.where(F.col(type_col) == s)
            .join(prev.select(id_col, F.col("_t").alias("_prev_t")), id_col)
            .where(F.col(ts_col) > F.col("_prev_t"))
            .groupBy(id_col)
            .agg(F.min(ts_col).alias("_t"))
            .localCheckpoint(eager=False)
        )
        reached.append(nxt)
    out = None
    for i, (s, df) in enumerate(zip(steps, reached), start=1):
        row = df.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(s).alias("step"),
            F.lit(i).alias("step_idx"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out


def funnel_counts_windowed(
    events: DataFrame,
    steps: list[str],
    id_col: str | list[str] = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """``funnel_counts`` with the alternate physical strategy: ONE
    exchange instead of k join rounds.

    Same semantics (step i counts users with a ``steps[i]`` event
    STRICTLY AFTER their earliest step-i-1 completion; ties at the exact
    anchor timestamp do not count) and the same (step, step_idx, n_users)
    output — ``tests/test_analytics.py`` asserts the two agree row-for-row
    on driver data.

    ``max_gap_seconds`` adds the conversion-window variant every funnel
    tool offers: step i must also land WITHIN that many seconds of the
    step-i-1 anchor (``anchor < ts <= anchor + gap``).  Note the anchor
    stays the earliest in-window completion — a later in-gap repeat does
    not re-open an expired window, matching the strict earliest-anchor
    semantics of the unbounded form.

    Strategy: per step a running-min window ``min(CASE step THEN ts)``,
    every window over the SAME ``partitionBy(id_col).orderBy(ts,
    order_col)`` spec, each referencing the previous step's running
    anchor.  Catalyst plans one Exchange+Sort and chains the k windows in
    a single ``WindowExec`` stack, and the per-user terminal aggregate
    reuses the partitioning — the whole funnel shuffles the events table
    once, vs once per step for the join-chain form.  Row state is k
    running timestamps (no per-user history arrays), so power users cost
    nothing extra.  The join-chain twin wins when steps are rare (its
    per-round inputs are type-filtered first); this form wins when the
    funnel is deep or steps are dense — the planner-level trade both
    docstrings exist to record.

    ``id_col`` may be a COLUMN LIST (e.g. ``["user_id", "session_id"]``
    for a within-session funnel): keep the grouping as the column tuple,
    not a concatenated string key — ``hashpartitioning(user_id)`` from an
    upstream sessionize satisfies clustering on the (user, session) PAIR
    (subset-of-keys rule), so the narrower partition is a re-sort on the
    existing exchange, while a derived concat column would force a second
    full shuffle (a plan audit caught exactly that).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    id_cols = [id_col] if isinstance(id_col, str) else list(id_col)
    w = (
        Window.partitionBy(*id_cols)
        .orderBy(ts_col, order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = events
    prev = None
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == F.lit(step)
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
            if max_gap_seconds is not None:
                cond = cond & (
                    F.col(ts_col)
                    <= prev + F.expr(f"INTERVAL {int(max_gap_seconds)} SECOND")
                )
        out = out.withColumn(
            f"_step_{i}_ts", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = F.col(f"_step_{i}_ts")
    per_user = out.groupBy(*id_cols).agg(
        *[
            F.min(f"_step_{i}_ts").alias(f"_step_{i}_ts")
            for i in range(1, len(steps) + 1)
        ]
    )
    counts = per_user.agg(
        *[
            F.count(f"_step_{i}_ts").cast("long").alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # per-step fan-out via explode of struct literals — names go through
    # F.lit (never interpolated into SQL text), so arbitrary step strings
    # are safe, matching the join-chain twin
    report = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(step).alias("step"),
                    F.lit(i).cast("int").alias("step_idx"),
                    F.col(f"n{i}").alias("n_users"),
                )
                for i, step in enumerate(steps, start=1)
            ]
        )
    )
    return counts.select(report.alias("r")).select(
        "r.step", "r.step_idx", "r.n_users"
    )


def cohort_retention(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "week",
) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity period
    (their cohort), counted by how many distinct periods-after-cohort
    they came back in.

    Returns (cohort, period_offset, n_users): for offset 0 this is the
    cohort's size; for offset k, how many of them were active k periods
    later — the numerator of every retention-curve percentage.

    Shape at scale: one aggregate to pin each user's cohort (min over
    the user key), one broadcast-or-shuffle join back (keyed on the same
    ``id_col`` — AQE reuses the partitioning), then a distinct-compacted
    aggregate on (cohort, offset, user) before the final count — the
    distinct happens as a two-phase aggregate, never a count(distinct)
    expansion over the raw event stream."""
    if bucket not in ("week", "day"):
        raise ValueError("bucket must be 'week' or 'day'")
    days_per = 7 if bucket == "week" else 1
    period = F.date_trunc(bucket, F.col(ts_col))
    firsts = events.groupBy(id_col).agg(
        F.min(period).alias("_cohort")
    )
    joined = events.select(id_col, period.alias("_p")).join(firsts, id_col)
    per_user_period = (
        joined.select(
            id_col,
            F.col("_cohort"),
            # both sides are bucket-starts, so the day delta is an exact
            # multiple of days_per — integer division is lossless
            (F.datediff(F.col("_p"), F.col("_cohort")) / days_per)
            .cast("long")
            .alias("_offset"),
        )
        .distinct()
    )
    return (
        per_user_period.groupBy(
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort"),
            F.col("_offset").cast("long").alias("period_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def gapfill_daily(
    df: DataFrame,
    date_col: str,
    key_cols: list[str],
    zero_cols: list[str] | None = None,
    ffill_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key daily gap-fill (resample): for each key, a complete date
    spine between that key's min and max observed date, LEFT JOIN of the
    observed rows onto it, zero-fill for ``zero_cols`` (counts) and
    forward-fill for ``ffill_cols`` (levels), plus a ``was_gap`` flag.

    The forward-fill window is ``partitionBy(key_cols)`` — the safe
    default: per-key series keep their fills inside the key, and Spark
    distributes the window by key instead of collapsing everything into
    one unpartitioned task.  An empty ``key_cols`` degenerates to the
    single global spine (bounded: date-cardinality rows), which is the
    only shape where the WindowExec single-partition warning is
    acceptable.

    Scale: the spine is generated in-plan from per-key bounds (no driver
    loop); its cardinality is Σ per-key day-spans — the OUTPUT size, so
    nothing is amplified.  The join and window share the key hash
    domain; one shuffle each."""
    zero_cols = list(zero_cols or ())
    ffill_cols = list(ffill_cols or ())
    bounds = df.groupBy(*key_cols).agg(
        F.min(date_col).alias("_lo"), F.max(date_col).alias("_hi")
    )
    spine = bounds.select(
        *key_cols,
        F.explode(
            F.sequence("_lo", "_hi", F.expr("interval 1 day"))
        ).alias(date_col),
    )
    # explicit observation marker: probing a value column for NULL would
    # silently mis-flag when no zero/ffill columns are passed (the
    # fallback would probe a join KEY, which is never NULL on gap rows)
    joined = spine.join(
        df.withColumn("_observed", F.lit(1)), [*key_cols, date_col], "left"
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = [
        *key_cols,
        date_col,
        *[F.coalesce(c, F.lit(0)).alias(c) for c in zero_cols],
        *[
            F.coalesce(F.col(c), F.last(c, ignorenulls=True).over(w), F.lit(0.0)).alias(c)
            for c in ffill_cols
        ],
        F.when(F.col("_observed").isNull(), 1).otherwise(0).alias("was_gap"),
    ]
    return joined.select(*out)


def ewma(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
    taps: int = 8,
    out_col: str = "ewma",
    round_to: int = 4,
) -> DataFrame:
    """Per-key trailing exponentially-weighted moving average.

    Adds ``out_col`` = Σ w_j·value[t-j] / Σ w_j over the ``taps`` most
    recent OBSERVATIONS per key (w_j = (1-alpha)^j as plan-time
    literals over explicit ``lag()`` taps), normalized by the weights
    actually present so the series head is unbiased.  Row offsets, not
    calendar offsets: compose with ``gapfill_daily`` first when gapped
    series need calendar-faithful decay.

    The window is ``partitionBy(key_cols)`` — the scale-safe default:
    Spark distributes the sort by key, and all ``taps`` lags share ONE
    shuffle + local sort.  An empty ``key_cols`` degenerates to the
    single global ordered window — acceptable ONLY when the input is
    already a bounded rollup (|days| rows), the same argument as the
    gap-fill spine."""
    w = (
        Window.partitionBy(*key_cols).orderBy(order_col)
        if key_cols
        else Window.orderBy(order_col)
    )
    decay = 1.0 - alpha
    num = F.col(value_col).cast("double")
    den = F.lit(1.0)
    for j in range(1, taps):
        tap = F.lag(value_col, j).over(w)
        num = num + F.coalesce(tap, F.lit(0)) * (decay**j)
        den = den + F.when(tap.isNull(), 0.0).otherwise(decay**j)
    return df.withColumn(out_col, F.round(num / den, round_to))


def integer_sigma_outliers(
    df: DataFrame,
    cents_col: str,
    keep_cols: list[str],
    k: int = 2,
) -> DataFrame:
    """Exact k-sigma outlier flag over integer-quantized values with a
    ZERO-float decision rule: flag x where

        (x·n − Σx)² > k² · (n·Σx² − (Σx)²)

    — algebraically |x − mean| > k·stddev_pop, but cross-multiplied so
    the comparison runs entirely in ``decimal(38,0)``: no division,
    sqrt, or rounding anywhere in the flag, so any two engines select
    identical rows by construction (the emb_projection_outliers idiom
    generalized to relational data).

    ``k`` must be a positive int (the rule compares against k² exactly).
    Overflow envelope (enforced, not assumed): the hottest products are
    dev² = (x·n − Σx)² ≤ (2·max|x|·n)² and k²·spread ≤ k²·n·Σx², so the
    rule fits decimal(38,0) iff  2·max|cents|·n < 10¹⁹  and
    k²·n·Σx² < 10³⁸; enforced one decade tighter (10¹⁸ / 10³⁷) because
    the guard runs in double (TPC-H balances: |cents| < 10⁹, safe past
    n = 10⁸ rows — every SF this engine targets).
    Both bounds are CHECKED from the same moment aggregate and the plan
    raises (``assert_true`` inside the filter — ANSI on or off) instead
    of silently NULL-dropping outliers on overflow; verified by planted
    2e12-cent / 1e7-row cases that DO overflow the old documented
    "|cents| ≤ 2e12 and n ≤ 1e9" envelope.

    Scale shape: ONE global-moment aggregate (count/sum/sum-of-squares,
    map-side combinable) broadcast back over the scan — the fact table
    never shuffles. The anomalous-balance audit a finance warehouse
    runs nightly.
    """
    assert isinstance(k, int) and k >= 1, "k must be a positive int"
    dec = "decimal(38,0)"
    c = df.select(*keep_cols, F.col(cents_col).cast(dec).alias("_cents"))
    ag = c.agg(
        F.count("*").cast(dec).alias("_n"),
        F.sum("_cents").alias("_s1"),
        F.sum(F.col("_cents") * F.col("_cents")).alias("_s2"),
        F.max(F.abs(F.col("_cents"))).alias("_mx"),
    )
    dev = F.col("_cents") * F.col("_n") - F.col("_s1")
    spread = F.col("_n") * F.col("_s2") - F.col("_s1") * F.col("_s1")
    # Headroom guard in DOUBLE (exactness irrelevant — order-of-magnitude
    # check with a 10× safety factor below decimal(38,0)'s 1e38 ceiling).
    n_d = F.col("_n").cast("double")
    # An all-NULL cents column makes _mx/_s1/_s2 NULL → `fits` NULL →
    # assert_true would raise the (misleading) overflow message; an
    # input with no usable values has no outliers, so treat the NULL
    # moments as trivially in-bounds and fall through to an empty
    # result (ADVICE r11 #4).
    fits = F.coalesce(
        (F.lit(2.0) * F.col("_mx").cast("double") * n_d < F.lit(1.0e18))
        & (
            F.lit(float(k * k)) * n_d * F.col("_s2").cast("double")
            < F.lit(1.0e37)
        ),
        F.lit(True),
    )
    guard = F.assert_true(
        fits,
        F.lit(
            "integer_sigma_outliers: decimal(38,0) overflow — need "
            "2*max|cents|*n < 1e18 and k^2*n*sum(cents^2) < 1e37; "
            "rescale cents (divide by a power of 10) and retry"
        ),
    )
    return (
        c.crossJoin(F.broadcast(ag))
        .where(guard.isNull() & (dev * dev > F.lit(k * k).cast(dec) * spread))
        .select(*keep_cols, F.col("_cents").alias(cents_col))
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Market-basket pair association: for every unordered item pair
    (a < b) co-occurring in at least one basket —

        support   = n_ab / N          (pair frequency)
        conf_a_b  = n_ab / n_a        (P(b | a))
        conf_b_a  = n_ab / n_b
        lift      = N·n_ab / (n_a·n_b)  (>1 ⇒ positive association)

    Scale shape (optimization r17 — guide §2.4: the old shape referenced
    the basket frame from FOUR independent subtrees — pair counts, item
    counts twice, basket total — and each re-ran the corpus scan + the
    per-basket aggregate; 8 scans / 30 exchanges in the plan): shuffle 1
    groups rows into per-basket DISTINCT item arrays (map-side
    combinable collect_set); the pair expansion is IN-ROW over the
    sorted array — bounded by (items-per-basket choose 2), never a
    basket self-join, so a 10-item basket emits 45 pairs regardless of
    corpus size.  Pairs, per-item counts, AND the basket total now ride
    that ONE explode as tagged entries — (a, b) = pair, (a, NULL) =
    item, (NULL, NULL) = basket marker — into ONE counting aggregate
    over the ≤ |I|²/2 + |I| + 1 key domain, which is lazily
    localCheckpointed (bounded rows) so its three consumers share one
    computation instead of replaying the corpus per reference.  The
    rule statistics then assemble from broadcast joins of slices of
    that one bounded frame (broadcast-safe at any SF for a
    catalog-bounded item domain — the premise of basket analysis).
    """
    b = F.col(basket_col)
    baskets = (
        df.where(b.isNotNull() & F.col(item_col).isNotNull())
        .groupBy(b.alias("_b"))
        .agg(F.array_sort(F.collect_set(item_col)).alias("_items"))
    )
    arr = F.col("_items")
    pair_structs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: F.struct(x.alias("item_a"), y.alias("item_b")),
            ),
        )
    )
    null_item = F.lit(None).cast(df.schema[item_col].dataType)
    item_structs = F.transform(
        arr,
        lambda x: F.struct(x.alias("item_a"), null_item.alias("item_b")),
    )
    basket_marker = F.array(
        F.struct(null_item.alias("item_a"), null_item.alias("item_b"))
    )
    counts = (
        baskets.select(
            F.explode(
                F.concat(pair_structs, item_structs, basket_marker)
            ).alias("_p")
        )
        .groupBy(
            F.col("_p.item_a").alias("item_a"),
            F.col("_p.item_b").alias("item_b"),
        )
        .agg(F.count("*").alias("n_ab"))
        .localCheckpoint(eager=False)
    )
    pairs = counts.where(
        F.col("item_a").isNotNull() & F.col("item_b").isNotNull()
    )
    items = counts.where(
        F.col("item_a").isNotNull() & F.col("item_b").isNull()
    ).select(F.col("item_a").alias("_i"), F.col("n_ab").alias("_ni"))
    total = counts.where(F.col("item_a").isNull()).select(
        F.col("n_ab").alias("_nb")
    )
    na = F.col("_na").cast("double")
    nb = F.col("_nb_i").cast("double")
    nab = F.col("n_ab").cast("double")
    n = F.col("_nb").cast("double")
    return (
        pairs.join(
            F.broadcast(
                items.select(
                    F.col("_i").alias("item_a"), F.col("_ni").alias("_na")
                )
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                items.select(
                    F.col("_i").alias("item_b"), F.col("_ni").alias("_nb_i")
                )
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "n_ab",
            F.round(nab / n, round_to).alias("support"),
            F.round(nab / na, round_to).alias("conf_a_b"),
            F.round(nab / nb, round_to).alias("conf_b_a"),
            F.round(n * nab / (na * nb), round_to).alias("lift"),
        )
    )


def mad_outliers(
    df: DataFrame,
    cents_col: str,
    keep_cols: list[str],
    k_tenths: int = 19,
) -> DataFrame:
    """Robust outliers by median absolute deviation with an exact
    integer-comparison decision rule: flag x where

        |x − median| > (k_tenths/10) · MAD

    The moment-free sibling of :func:`integer_sigma_outliers` — median/
    MAD have a 50% breakdown point, so the rule still stands when the
    contamination itself inflates the spread (the case that blinds a
    sigma rule).

    Exactness: over integer ``cents`` the interpolated median is integer
    or half-integer, so ``d2 = |2·x − 2·med|`` is integer-valued, MAD of
    the halves doubles back to the integer-valued ``m4 = 2·(2·MAD)``,
    and the flag compares ``20·d2 > k_tenths·m4`` — integer-valued
    doubles throughout (exact ≤ 2^53), identical on every engine; k in
    tenths keeps the threshold rational without a float multiply.

    Scale shape: two exact percentile aggregates (median, then MAD of
    the deviations) + one broadcast scalar each — the gate-exact form;
    at 100 TB swap ``percentile`` for ``approx_percentile`` (t-digest)
    or the repo's qhist sketch, same plan shape (the agg_percentiles
    precedent).  All-equal inputs give MAD = 0 and flag nothing — by
    construction, since 20·d2 = 0 is never > 0.
    """
    assert isinstance(k_tenths, int) and k_tenths >= 1
    x2 = (F.col(cents_col) * 2).cast("double")
    med2 = df.agg(
        (F.percentile(F.col(cents_col), F.lit(0.5)) * 2.0).alias("_m2")
    )
    dev = df.crossJoin(F.broadcast(med2)).select(
        *keep_cols,
        F.col(cents_col),
        F.abs(x2 - F.col("_m2")).alias("_d2"),
    )
    m4 = dev.agg(
        (F.percentile(F.col("_d2"), F.lit(0.5)) * 2.0).alias("_m4")
    )
    return (
        dev.crossJoin(F.broadcast(m4))
        .where(F.col("_d2") * 20.0 > F.lit(float(k_tenths)) * F.col("_m4"))
        .select(*keep_cols, cents_col)
    )


def conversion_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    touch_types: list[str],
    conversion_type: str,
    round_to: int = 6,
) -> DataFrame:
    """First-touch / last-touch conversion attribution in ONE window
    pass: for every conversion event, the earliest and the latest
    touchpoint the same user produced at-or-before it (ties broken on
    ``id_col``, so same-timestamp rows attribute deterministically),
    rolled up to per-(model, touch_type) conversion counts and shares.

    Conversions with no prior touchpoint attribute to ``'(none)'`` —
    reported, never dropped: the un-attributable share is exactly the
    number a marketing-mix model needs to see.

    Scale shape: both running extrema share ONE shuffle + local sort on
    the user key (the sessionize argument); the rollup output is
    bounded by 2·(|touch_types|+1) rows; the share denominator is a
    1-row broadcast."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    touch = F.when(F.col(type_col).isin(*touch_types), F.col(type_col))
    conv = (
        df.select(
            F.col(type_col),
            F.first(touch, ignorenulls=True).over(w).alias("_first"),
            F.last(touch, ignorenulls=True).over(w).alias("_last"),
        )
        .where(F.col(type_col) == conversion_type)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("first_touch").alias("model"),
                        F.coalesce("_first", F.lit("(none)")).alias(
                            "touch_type"
                        ),
                    ),
                    F.struct(
                        F.lit("last_touch").alias("model"),
                        F.coalesce("_last", F.lit("(none)")).alias(
                            "touch_type"
                        ),
                    ),
                )
            ).alias("_m")
        )
        .select("_m.model", "_m.touch_type")
    )
    total = conv.where(F.col("model") == "first_touch").agg(
        F.count("*").alias("_n_conv")
    )
    return (
        conv.groupBy("model", "touch_type")
        .agg(F.count("*").alias("n_conversions"))
        .crossJoin(F.broadcast(total))
        .select(
            "model",
            "touch_type",
            "n_conversions",
            F.round(
                F.col("n_conversions").cast("double") / F.col("_n_conv"),
                round_to,
            ).alias("share"),
        )
    )


def linear_fit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Ordinary least squares fit of y on x as ONE aggregate pass —
    the cross-engine-exact regression primitive:

        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n
        r2        = (n·Σxy − Σx·Σy)² / ((n·Σx²−(Σx)²)·(n·Σy²−(Σy)²))

    Spelled out as sums (not an engine's ``regr_*``) so the arithmetic
    is the identical expression tree on every engine — same doubles,
    same single rounding at the end.  NULL slope/r2 on degenerate
    inputs (n < 2 or zero x-variance); a zero y-variance series fits
    slope 0 with NULL r2 (0/0).

    Scale shape: five map-side-combinable sums + one row out — use it
    on bounded frames (rollups, top-k) or the full corpus alike.

    The double SUMS are summation-order-dependent — fine when the
    fitted magnitudes keep the rounding far above the ulp noise (the
    Zipf fit's O(1) slopes), but NOT when the rounded output is large
    (an sf0.1 revenue intercept ~5e8 rounded to 6dp demands 1e-15
    relative agreement, and the engines' sum orders differ) — use
    :func:`linear_fit_exact_cents` for integer-quantified series."""
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    a = df.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    return _ols_from_sums(a, round_to)


def _ols_from_sums(a: DataFrame, round_to: int) -> DataFrame:
    """The OLS closed form over a 1-row (n, sx, sy, sxx, syy, sxy)
    frame — only correctly-rounded double ops (* − /), so identical
    sum inputs give bit-identical outputs on every engine.  Every
    rounded output is ``+ 0.0``-normalized: a tiny negative slope
    rounds to IEEE ``-0.0`` on engines whose round() preserves the
    sign (DuckDB) and ``+0.0`` on Spark, and value hashes distinguish
    them (the r12 sim_rp_distortion lesson)."""
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when((F.col("n") >= 2) & (dx > 0), num / dx)
    return a.select(
        F.col("n").cast("long").alias("n_points"),
        (F.round(slope, round_to) + F.lit(0.0)).alias("slope"),
        (
            F.round(
                (F.col("sy") - slope * F.col("sx")) / F.col("n"), round_to
            )
            + F.lit(0.0)
        ).alias("intercept"),
        (
            F.when(
                (F.col("n") >= 2) & (dx > 0) & (dy > 0),
                F.round(num * num / (dx * dy), round_to),
            )
            + F.lit(0.0)
        ).alias("r2"),
    )


def linear_fit_exact_cents(
    df: DataFrame,
    x_col: str,
    y_cents_col: str,
    y_scale: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """:func:`linear_fit` for integer-quantified series (y in cents,
    µs, …): the five sums run in ``decimal(38,0)`` — EXACT 128-bit
    integer arithmetic, the engine-independent twin of DuckDB's
    HUGEINT sum — and convert to double ONCE (a correctly-rounded
    cast), so the closed form sees bit-identical inputs on every
    engine regardless of summation order.  This is what lets a 5e8-
    magnitude intercept survive a 6dp value hash at any sf, where the
    double-sum path diverges in the last ulp (caught by the sf0.1
    sweep, r13).  ``y_scale`` converts the integer unit back (cents →
    dollars = 100); x must be integer-valued.  Overflow fails loud
    (ANSI decimal)."""
    dec = "decimal(38,0)"
    xd = F.col(x_col).cast(dec)
    yd = F.col(y_cents_col).cast(dec)
    s = float(y_scale)
    a = df.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        (F.sum(yd).cast("double") / F.lit(s)).alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        (F.sum(yd * yd).cast("double") / F.lit(s * s)).alias("syy"),
        (F.sum(xd * yd).cast("double") / F.lit(s)).alias("sxy"),
    )
    return _ols_from_sums(a, round_to)
