"""Relational helper properties (incl. the skew-salting join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hfp_loader_spark.operators.relational import salted_join, sessionize
from hfp_loader_spark.plans.catalog import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must not change join semantics — same multiset of rows as
    the plain equi-join, even with a heavily skewed key distribution."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # skew it: fold most keys onto one hot key
    skewed = li.withColumn(
        "k", F.when(F.col("l_orderkey") % 7 != 0, F.lit(1)).otherwise(F.col("l_orderkey"))
    )
    dim = (
        skewed.select("k").distinct().withColumn("payload", F.col("k") * 2)
    )
    plain = skewed.join(dim, ["k"]).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    )
    salted = salted_join(skewed, dim, ["k"]).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_sessionize_single_exchange(spark, sf_dir):
    """Both window passes must share one shuffle on the user key."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    out = sessionize(ev, "user_id", "ts", 1800)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_approx_percentile_within_rank_tolerance(spark, sf_dir):
    """The sketch quantile must land within 1% rank error of the exact
    quantile (accuracy=10000 → ε = 1/10000, asserted with slack).

    Runs the sketch directly (the catalog query now emits tolerance-band
    booleans instead of raw sketch values) and also asserts every
    catalog-side within-band boolean is True."""
    from hfp_loader_spark.plans.catalog import REGISTRY, load_table

    for row in REGISTRY["agg_approx_percentile"].builder(spark, sf_dir).collect():
        for t in ("50", "90", "99"):
            assert row[f"p{t}_within_5pct"] is True, row

    orders = load_table(spark, sf_dir, "orders")
    approx = {
        r["o_orderstatus"]: r.asDict()
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
            F.percentile_approx("o_totalprice", 0.9, 10000).alias("p90"),
            F.percentile_approx("o_totalprice", 0.99, 10000).alias("p99"),
        )
        .collect()
    }
    for status, row in approx.items():
        vals = sorted(
            r["o_totalprice"]
            for r in orders.where(F.col("o_orderstatus") == status)
            .select("o_totalprice")
            .collect()
        )
        n = len(vals)
        for q, col in [(0.5, "p50"), (0.9, "p90"), (0.99, "p99")]:
            # rank of the sketch's answer in the exact sorted data
            import bisect

            rank = bisect.bisect_left(vals, row[col])
            assert abs(rank / n - q) <= 0.01 + 2.0 / n, (status, col)


def test_heavy_hitters_contains_all_truly_frequent(spark, sf_dir):
    """Misra-Gries guarantee: any value with frequency > support MUST be
    in the returned set (false positives allowed, false negatives not)."""
    from hfp_loader_spark.plans.catalog import REGISTRY, load_table

    got = {
        r["event_type"]
        for r in REGISTRY["agg_heavy_hitters"].builder(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    truly = {
        r["event_type"]
        for r in ev.groupBy("event_type")
        .count()
        .where(F.col("count") > 0.05 * total)
        .collect()
    }
    assert truly <= got, (truly, got)


def test_funnel_strict_ordering_semantics(spark):
    """A user whose purchase precedes their click must NOT count as
    converting step 3; earliest-completion times anchor each step."""
    import datetime

    from hfp_loader_spark.operators.relational import funnel_counts

    t0 = datetime.datetime(2024, 1, 1)

    def at(sec):
        return t0 + datetime.timedelta(seconds=sec)

    rows = [
        # u1: clean view→click→purchase
        (1, "view", at(0)), (1, "click", at(10)), (1, "purchase", at(20)),
        # u2: purchase BEFORE click → stops at click
        (2, "view", at(0)), (2, "purchase", at(5)), (2, "click", at(10)),
        # u3: click before view → stops at view (click must follow view)
        (3, "click", at(0)), (3, "view", at(5)),
        # u4: never viewed → not even step 1
        (4, "click", at(0)), (4, "purchase", at(1)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {
        r["step"]: r["n_users"]
        for r in funnel_counts(df, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_cohort_retention_hand_checked(spark):
    import datetime

    from hfp_loader_spark.operators.relational import cohort_retention

    mon1 = datetime.datetime(2024, 1, 1)   # a Monday
    mon2 = mon1 + datetime.timedelta(days=7)
    mon3 = mon1 + datetime.timedelta(days=14)
    rows = [
        # u1: active wk1, wk2, wk3
        (1, mon1), (1, mon2 + datetime.timedelta(hours=5)), (1, mon3),
        # u2: wk1 only (two events, one distinct period)
        (2, mon1), (2, mon1 + datetime.timedelta(days=2)),
        # u3: first seen wk2, returns wk3
        (3, mon2), (3, mon3),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (r["cohort"], r["period_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,  # u1, u2
        ("2024-01-01", 1): 1,  # u1
        ("2024-01-01", 2): 1,  # u1
        ("2024-01-08", 0): 1,  # u3
        ("2024-01-08", 1): 1,  # u3
    }


def test_cohort_retention_rejects_unknown_bucket(spark):
    import pytest as _pytest

    from hfp_loader_spark.operators.relational import cohort_retention

    df = spark.createDataFrame([(1,)], ["user_id"])
    with _pytest.raises(ValueError, match="bucket"):
        cohort_retention(df, bucket="month")


def test_weighted_reservoir_favors_heavy_weights(spark, sf_dir):
    """A-ES property: the sample is deterministic, has exactly k rows,
    and heavier docs are overrepresented vs a uniform draw (the sampled
    mean n_chars must exceed the corpus mean)."""
    from pyspark.sql import functions as F

    from hfp_loader_spark.plans.catalog import REGISTRY, load_table

    q = REGISTRY["sample_weighted_reservoir"].builder
    s1 = [tuple(r) for r in q(spark, sf_dir).collect()]
    s2 = [tuple(r) for r in q(spark, sf_dir).collect()]
    assert s1 == s2  # content-hash draw → rerun-stable
    assert len(s1) == 20
    corpus_mean = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("n_chars") > 0)
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    sample_mean = sum(r[1] for r in s1) / len(s1)
    assert sample_mean > corpus_mean


def test_winsorized_stats_bounds(spark, sf_dir):
    """Clipping invariants: winsorized avg lies within the clip bounds,
    and ~10% of rows are clipped (5% per tail) per group."""
    from hfp_loader_spark.plans.catalog import REGISTRY

    rows = REGISTRY["agg_winsorized_stats"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        frac = (r["n_clipped_low"] + r["n_clipped_high"]) / r["n_orders"]
        assert 0.02 < frac < 0.2, r
        assert r["winsorized_avg"] <= r["winsorized_sum"]


def test_gapfill_spine_is_dense_and_ffilled(spark, sf_dir):
    """Every calendar day between min and max appears exactly once; gap
    rows carry zero counts and the previous day's level value."""
    import datetime

    from hfp_loader_spark.plans.catalog import REGISTRY

    rows = sorted(
        REGISTRY["timeseries_gapfill_daily"].builder(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    days = [datetime.date.fromisoformat(r["day"]) for r in rows]
    assert days == [
        days[0] + datetime.timedelta(days=i) for i in range(len(days))
    ]
    prev_level = None
    for r in rows:
        if r["was_gap"]:
            assert r["n_orders"] == 0
            if prev_level is not None:
                assert r["total_ffill"] == prev_level
        prev_level = r["total_ffill"]


def test_gapfill_daily_per_key_fills_inside_key_only(spark):
    import datetime as dt

    from hfp_loader_spark.operators.relational import gapfill_daily

    rows = [
        ("a", dt.date(2024, 1, 1), 2, 10.0),
        ("a", dt.date(2024, 1, 4), 1, 40.0),  # gap: Jan 2, 3
        ("b", dt.date(2024, 1, 2), 5, 99.0),  # single day — no spine gaps
    ]
    df = spark.createDataFrame(rows, "k string, d date, n long, total double")
    out = gapfill_daily(df, "d", ["k"], zero_cols=["n"], ffill_cols=["total"])
    got = {(r["k"], str(r["d"])): r for r in out.collect()}
    assert len(got) == 5  # a: 4 days, b: 1 day — spines never cross keys
    assert got[("a", "2024-01-02")]["n"] == 0
    assert got[("a", "2024-01-02")]["was_gap"] == 1
    assert got[("a", "2024-01-02")]["total"] == 10.0  # ffill from Jan 1
    assert got[("a", "2024-01-04")]["total"] == 40.0  # observed wins
    assert got[("b", "2024-01-02")]["total"] == 99.0
    # the fill window must be partitioned by key (the at-scale contract):
    # the Window node's partition spec (first bracket group after the
    # window expressions) lists k
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    win_lines = [ln for ln in opt.splitlines() if "windowspecdefinition" in ln]
    assert win_lines and "windowspecdefinition(k#" in win_lines[0], win_lines


def test_gapfill_daily_flags_gaps_without_fill_columns(spark):
    """was_gap must come from an observation marker, not a probed value
    column (regression: with no zero/ffill columns the probe fell back
    to a join key, which is never NULL on gap rows)."""
    import datetime as dt

    from hfp_loader_spark.operators.relational import gapfill_daily

    rows = [("a", dt.date(2024, 1, 1)), ("a", dt.date(2024, 1, 3))]
    df = spark.createDataFrame(rows, "k string, d date")
    out = {str(r["d"]): r["was_gap"] for r in gapfill_daily(df, "d", ["k"]).collect()}
    assert out == {"2024-01-01": 0, "2024-01-02": 1, "2024-01-03": 0}


def test_salted_join_auto_engages_on_planted_zipf(spark):
    """n_salts=None must MEASURE the key distribution and engage salting
    on a planted-zipf key (plan contains the salt column), with results
    identical to the plain join."""
    import itertools

    # one key with 2000 rows, 50 keys with 10 rows each: p99/avg >> 2
    rows = list(
        itertools.chain(
            ((0, float(i % 7)) for i in range(2000)),
            ((k, float(k)) for k in range(1, 51) for _ in range(10)),
        )
    )
    skewed = spark.createDataFrame(rows, "k long, v double")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 51)], "k long, name string"
    )
    out = salted_join(skewed, dim, ["k"], n_salts=None)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan  # salting engaged
    plain = skewed.join(dim, ["k"])
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_join_auto_skips_uniform_keys(spark):
    """Uniform key distribution → factor 1 → the join must run PLAIN
    (no salt column, no replicated dimension)."""
    skewed = spark.createDataFrame(
        [(k, float(k)) for k in range(200)], "k long, v double"
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(200)], "k long, name string"
    )
    out = salted_join(skewed, dim, ["k"], n_salts=None)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" not in plan
    assert out.count() == 200


def test_derive_salt_factor_thresholds():
    from hfp_loader_spark.operators.quality import derive_salt_factor

    # below engage threshold → 1
    assert derive_salt_factor(
        {"avg_rows_per_key": 10.0, "p99_rows_per_key": 15}
    ) == 1
    # ratio 5 → 5 salts
    assert derive_salt_factor(
        {"avg_rows_per_key": 10.0, "p99_rows_per_key": 50}
    ) == 5
    # extreme ratio clamps at max_salts
    assert derive_salt_factor(
        {"avg_rows_per_key": 1.0, "p99_rows_per_key": 10_000}
    ) == 64
    # degenerate empty input
    assert derive_salt_factor({"avg_rows_per_key": 0.0}) == 1


def test_derive_salt_factor_max_dominates_p99():
    """The canonical skew shape — ONE mega-hot key among thousands of
    uniform ones — has p99 ≈ avg; the trigger MUST come from max/avg.
    A revert to a p99-only signal fails every assertion here."""
    from hfp_loader_spark.operators.quality import derive_salt_factor

    # p99 barely above avg (would not engage), max 50× avg → 50 salts
    assert derive_salt_factor(
        {"avg_rows_per_key": 10.0, "p99_rows_per_key": 11,
         "max_rows_per_key": 500}
    ) == 50
    # same shape via a precomputed skew_ratio only (key_skew_stats path)
    assert derive_salt_factor(
        {"avg_rows_per_key": 10.0, "p99_rows_per_key": 11,
         "skew_ratio": 50.0}
    ) == 50
    # max/avg below threshold, p99 absent → plain join
    assert derive_salt_factor(
        {"avg_rows_per_key": 10.0, "max_rows_per_key": 15}
    ) == 1
    # p99 is still a live secondary signal when max is missing
    assert derive_salt_factor(
        {"avg_rows_per_key": 10.0, "p99_rows_per_key": 80}
    ) == 8


def test_salted_join_auto_engages_on_single_mega_hot_key(spark):
    """One hot key among 400 uniform keys: p99 ≈ avg, so only the
    max/avg signal can engage salting — assert the plan salts AND the
    result equals the plain join (the operator's semantic contract)."""
    import itertools

    rows = list(
        itertools.chain(
            ((0, float(i % 7)) for i in range(4000)),  # the mega-hot key
            ((k, float(k)) for k in range(1, 401) for _ in range(5)),
        )
    )
    skewed = spark.createDataFrame(rows, "k long, v double")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 401)], "k long, name string"
    )
    out = salted_join(skewed, dim, ["k"], n_salts=None)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan  # max/avg-driven engagement
    plain = skewed.join(dim, ["k"])
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_ewma_per_key_matches_reference_and_distributes(spark):
    """ewma() with keys must match a hand-rolled trailing EWMA per key
    and plan a KEY-partitioned window (no single-partition sort)."""
    from hfp_loader_spark.operators.relational import ewma

    rows = [
        ("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0),
        ("b", 1, 10.0), ("b", 2, 0.0),
    ]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = ewma(df, ["k"], "t", "v", alpha=0.5, taps=3)
    got = {(r["k"], r["t"]): r["ewma"] for r in out.collect()}

    def ref(series):
        res = {}
        for i, (t, v) in enumerate(series):
            num, den = 0.0, 0.0
            for j in range(0, min(i + 1, 3)):
                w = 0.5 ** j
                num += series[i - j][1] * w
                den += w
            res[t] = round(num / den, 4)
        return res

    ra = ref([(1, 1.0), (2, 2.0), (3, 3.0)])
    rb = ref([(1, 10.0), (2, 0.0)])
    for t, v in ra.items():
        assert got[("a", t)] == v
    for t, v in rb.items():
        assert got[("b", t)] == v

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_choose_join_strategy_broadcasts_small_dim(spark):
    from hfp_loader_spark.operators.relational import choose_join_strategy

    fact = spark.createDataFrame(
        [(i % 50, float(i)) for i in range(2000)], "k long, v double"
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(50)], "k long, name string"
    )
    out, decision = choose_join_strategy(fact, dim, ["k"])
    assert decision["strategy"] == "broadcast"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == 2000


def test_choose_join_strategy_salts_skewed_fact(spark):
    """One mega-hot key among hundreds of uniform ones (p99 ≈ avg, so
    only the max/avg signal fires) with broadcast disabled → salted."""
    import itertools

    from hfp_loader_spark.operators.relational import choose_join_strategy

    rows = list(
        itertools.chain(
            ((0, float(i % 7)) for i in range(4000)),
            ((k, float(k)) for k in range(1, 401) for _ in range(5)),
        )
    )
    fact = spark.createDataFrame(rows, "k long, v double")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 401)], "k long, name string"
    )
    out, decision = choose_join_strategy(
        fact, dim, ["k"], broadcast_max_rows=0
    )
    assert decision["strategy"] == "salted"
    assert decision["n_salts"] > 1
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan
    plain = fact.join(dim, ["k"])
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_choose_join_strategy_bloom_prefilters_miss_heavy_join(spark):
    """Uniform fact keys but only 5% find a dim partner: the CMS
    estimate flags the miss-heavy join and the fact side is gated
    through the dim-key Bloom (chained left-semi joins) before the
    shuffle — results identical to the plain inner join."""
    from hfp_loader_spark.operators.relational import choose_join_strategy

    fact = spark.createDataFrame(
        [(i % 1000, float(i)) for i in range(4000)], "k long, v double"
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(50)], "k long, name string"
    )
    out, decision = choose_join_strategy(
        fact, dim, ["k"], broadcast_max_rows=0
    )
    assert decision["strategy"] == "bloom_prefilter_shuffle"
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftSemi") >= 5
    plain = fact.join(dim, ["k"])
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_choose_join_strategy_plain_shuffle_when_nothing_fires(spark):
    """Uniform keys, high match ratio, dim too big to broadcast, outer
    join (prefilter ineligible) → the plain shuffle join."""
    from hfp_loader_spark.operators.relational import choose_join_strategy

    fact = spark.createDataFrame(
        [(i % 200, float(i)) for i in range(2000)], "k long, v double"
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(200)], "k long, name string"
    )
    out, decision = choose_join_strategy(
        fact, dim, ["k"], how="left", broadcast_max_rows=0
    )
    assert decision["strategy"] == "shuffle"
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" not in plan and "LeftSemi" not in plan
    assert out.count() == 2000


def test_asof_join_carries_latest_event_even_with_null_fields(spark):
    """ASOF semantics: the probe matches the latest event ROW at or
    before it — if that event's value is NULL, the result is NULL.
    Regression: the per-column ignorenulls carry skipped the NULL and
    resurrected an OLDER event's value (splicing two events into one
    match), and the first-column-NULL inner filter dropped genuinely
    matched probes."""
    import datetime

    from hfp_loader_spark.operators.relational import asof_join

    t0 = datetime.datetime(2024, 1, 1)

    def at(sec):
        return t0 + datetime.timedelta(seconds=sec)

    events = spark.createDataFrame(
        [
            (1, at(0), 100, 5.0),     # older event, real value
            (1, at(10), 101, None),   # LATEST event before probe: NULL value
            (2, at(50), 200, 7.5),    # after u2's probe → no match
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    probes = spark.createDataFrame(
        [(11, 1, at(20)), (22, 2, at(40))],
        "probe_id long, user_id long, probe_ts timestamp",
    )
    out = {
        r["probe_id"]: (r["event_id"], r["value"])
        for r in asof_join(
            probes, events, "user_id", "probe_ts", "ts",
            ["event_id", "value"],
        ).collect()
    }
    # probe 11 matches event 101 with its real NULL value — not 100/5.0
    assert out == {11: (101, None)}


def test_apply_changelog_semantics(spark):
    from hfp_loader_spark.operators.relational import apply_changelog

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, s string, v double",
    )
    changes = spark.createDataFrame(
        [
            (1, 1, "U", "a2", 11.0),   # updated …
            (1, 2, "U", "a3", 12.0),   # … then updated again (wins)
            (2, 1, "D", "b", 20.0),    # tombstone: key 2 removed
            (4, 1, "I", "d", 40.0),    # brand-new key inserted
            # equal-seq conflict: 'U' > 'D' lexicographically → survives
            (3, 5, "D", "c", 30.0),
            (3, 5, "U", "c2", 33.0),
        ],
        "k int, seq int, op string, s string, v double",
    )
    got = {
        r["k"]: (r["s"], r["v"])
        for r in apply_changelog(target, changes, keys=["k"]).collect()
    }
    assert got == {1: ("a3", 12.0), 3: ("c2", 33.0), 4: ("d", 40.0)}


def test_integer_sigma_outliers_fires_on_planted_outlier(spark):
    """VERDICT r9 #1: the k=2 rule is structurally empty on uniform TPC-H
    balances, so the positive path needs a planted extreme value — one
    row far outside a tight cluster must be flagged, and ONLY that row."""
    from hfp_loader_spark.operators.relational import integer_sigma_outliers

    rows = [(i, f"s{i}", 1000 + (i % 5)) for i in range(1, 50)]
    rows.append((99, "whale", 10_000_000))
    df = spark.createDataFrame(rows, "id int, name string, cents long")
    out = integer_sigma_outliers(df, "cents", ["id", "name"], k=2).collect()
    assert [(r["id"], r["name"]) for r in out] == [(99, "whale")]
    assert int(out[0]["cents"]) == 10_000_000


def test_integer_sigma_outliers_matches_float_sigma_rule(spark):
    """The cross-multiplied integer rule must agree with the plain
    |x − mean| > k·stddev_pop float rule on data with a clear margin —
    and flipping the inequality (k huge) must flag nothing."""
    import statistics

    from hfp_loader_spark.operators.relational import integer_sigma_outliers

    vals = [100, 102, 98, 101, 99, 100, 103, 97, 500, 100, 101, -300]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id int, cents long"
    )
    mean = statistics.fmean(vals)
    sd = statistics.pstdev(vals)
    expect = sorted(i for i, v in enumerate(vals) if abs(v - mean) > 2 * sd)
    got = sorted(
        r["id"] for r in integer_sigma_outliers(df, "cents", ["id"], k=2).collect()
    )
    assert got == expect and got  # non-empty by construction
    assert (
        integer_sigma_outliers(df, "cents", ["id"], k=1000).count() == 0
    )


def test_integer_sigma_outliers_rejects_bad_k(spark):
    import pytest

    from hfp_loader_spark.operators.relational import integer_sigma_outliers

    df = spark.createDataFrame([(1, 10)], "id int, cents long")
    with pytest.raises(AssertionError):
        integer_sigma_outliers(df, "cents", ["id"], k=0)


def test_association_rules_hand_computed(spark):
    """3 baskets: {a,b}, {a,b,c}, {a,c}.  n_a=3 n_b=2 n_c=2, N=3;
    ab: n=2 → support 2/3, conf_a_b 2/3, conf_b_a 1, lift 3·2/(3·2)=1;
    ac: n=2 → conf_a_c 2/3, conf_c_a 1, lift 1; bc: n=1 → lift 3/4.
    Duplicate item rows in a basket must not double-count."""
    from hfp_loader_spark.operators.relational import association_rules

    rows = [
        (1, "a"), (1, "b"), (1, "a"),      # dup 'a' in basket 1
        (2, "a"), (2, "b"), (2, "c"),
        (3, "a"), (3, "c"),
    ]
    df = spark.createDataFrame(rows, "b int, item string")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(df, "b", "item").collect()
    }
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = got[("a", "b")]
    assert (ab["n_ab"], ab["support"], ab["conf_a_b"], ab["conf_b_a"],
            ab["lift"]) == (2, 0.666667, 0.666667, 1.0, 1.0)
    bc = got[("b", "c")]
    assert (bc["n_ab"], bc["lift"]) == (1, 0.75)


def test_mad_outliers_fires_on_planted_and_silent_on_constant(spark):
    """A tight cluster + one extreme value: only the extreme flags at
    k=1.9; an all-equal input has MAD 0 and flags nothing (0 > 0 never
    holds); and the sigma-blinding case — contamination inflating the
    spread — still flags under MAD."""
    from hfp_loader_spark.operators.relational import (
        integer_sigma_outliers,
        mad_outliers,
    )

    rows = [(i, 1000 + (i % 3)) for i in range(30)] + [(99, 10_000_000)]
    df = spark.createDataFrame(rows, "id int, cents long")
    got = mad_outliers(df, "cents", ["id"], k_tenths=19).collect()
    assert [r["id"] for r in got] == [99]

    const = spark.createDataFrame([(i, 500) for i in range(9)], "id int, cents long")
    assert mad_outliers(const, "cents", ["id"], k_tenths=19).count() == 0

    # breakdown: 40% contamination at one extreme inflates stddev until
    # the sigma rule at k=2 goes silent, while median/MAD still flag it
    contaminated = [(i, 100) for i in range(12)] + [
        (100 + i, 10_000_000) for i in range(8)
    ]
    cdf = spark.createDataFrame(contaminated, "id int, cents long")
    assert integer_sigma_outliers(cdf, "cents", ["id"], k=2).count() == 0
    flagged = {r["id"] for r in mad_outliers(cdf, "cents", ["id"], 19).collect()}
    assert flagged == {100 + i for i in range(8)}


def test_conversion_attribution_models_and_none_bucket(spark):
    """user 1: view → click → purchase (first=view, last=click);
    user 2: purchase with no prior touch → '(none)' in both models;
    user 3: touch at the SAME ts as the purchase but a smaller event_id
    counts (deterministic id tiebreak)."""
    from datetime import datetime

    from hfp_loader_spark.operators.relational import conversion_attribution

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        (1, t(1), "view", 10),
        (1, t(2), "click", 11),
        (1, t(3), "purchase", 12),
        (2, t(1), "purchase", 20),
        (3, t(5), "click", 30),
        (3, t(5), "purchase", 31),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_type string, event_id int"
    )
    got = {
        (r["model"], r["touch_type"]): (r["n_conversions"], r["share"])
        for r in conversion_attribution(
            df, "user_id", "ts", "event_type", "event_id",
            ["click", "view"], "purchase",
        ).collect()
    }
    assert got == {
        ("first_touch", "view"): (1, 0.333333),
        ("first_touch", "click"): (1, 0.333333),
        ("first_touch", "(none)"): (1, 0.333333),
        ("last_touch", "click"): (2, 0.666667),
        ("last_touch", "(none)"): (1, 0.333333),
    }


def test_linear_fit_exact_line_noise_and_degenerate(spark):
    """A perfect line recovers slope/intercept with r2=1; degenerate
    inputs (single point, zero x-variance) yield NULLs, a flat series
    fits slope 0 with NULL r2."""
    from hfp_loader_spark.operators.relational import linear_fit

    line = [(float(x), 3.0 * x - 2.0) for x in range(10)]
    r = linear_fit(
        spark.createDataFrame(line, "x double, y double"), "x", "y"
    ).collect()[0]
    assert (r["n_points"], r["slope"], r["intercept"], r["r2"]) == (
        10, 3.0, -2.0, 1.0,
    )

    single = linear_fit(
        spark.createDataFrame([(1.0, 5.0)], "x double, y double"), "x", "y"
    ).collect()[0]
    assert single["slope"] is None and single["r2"] is None

    samex = linear_fit(
        spark.createDataFrame(
            [(2.0, 1.0), (2.0, 9.0)], "x double, y double"
        ),
        "x",
        "y",
    ).collect()[0]
    assert samex["slope"] is None

    flat = linear_fit(
        spark.createDataFrame(
            [(float(x), 7.0) for x in range(5)], "x double, y double"
        ),
        "x",
        "y",
    ).collect()[0]
    assert flat["slope"] == 0.0 and flat["intercept"] == 7.0
    assert flat["r2"] is None

def test_integer_sigma_outliers_overflow_guard_raises(spark):
    """ADVICE r10 #1: the old documented envelope (|cents| ≤ 2e12,
    n ≤ 1e9) was FALSE — dev² overflows decimal(38,0) well inside it
    and, with ANSI off, silently NULL-drops every outlier.  The guard
    must now RAISE on such inputs instead of returning an empty frame."""
    import pytest

    from pyspark.sql import functions as F

    from hfp_loader_spark.operators.relational import integer_sigma_outliers

    # 300k rows at |cents| ≈ 2e12: 2·mx·n ≈ 1.2e18 ≥ 1e18 → must raise
    df = spark.range(300_000).select(
        F.col("id").cast("int").alias("id"),
        (F.lit(2_000_000_000_000) + F.col("id")).alias("cents"),
    )
    with pytest.raises(Exception, match="integer_sigma_outliers"):
        integer_sigma_outliers(df, "cents", ["id"], k=2).count()

    # and the guard is headroom-tight, not trigger-happy: the same
    # magnitude at tiny n stays under both bounds and runs clean
    small = spark.createDataFrame(
        [(i, 2_000_000_000_000 + i) for i in range(20)],
        "id int, cents long",
    )
    assert integer_sigma_outliers(small, "cents", ["id"], k=2).count() == 0


def test_integer_sigma_outliers_all_null_input_is_empty_not_overflow(spark):
    """ADVICE r11 #4: an all-NULL cents column must return ZERO outliers
    (nothing is measurable), not raise the misleading decimal-overflow
    assert (NULL moments made the fits guard NULL)."""
    from hfp_loader_spark.operators.relational import integer_sigma_outliers

    df = spark.createDataFrame(
        [(1, None), (2, None)], "id int, cents long"
    )
    out = integer_sigma_outliers(df, "cents", ["id"], k=2)
    assert out.count() == 0
