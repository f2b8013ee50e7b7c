"""Relational coverage extensions: the join types and query shapes the core
catalog (core_relational.py) doesn't yet exercise.

Adds LEFT SEMI (EXISTS), LEFT OUTER with ON-clause predicate, FULL OUTER,
HAVING over join aggregates, uncorrelated scalar subquery (broadcast, no
driver collect), disjunctive multi-column predicates, and the
ntile/percent_rank/cume_dist window family — each an adapted TPC-H query
(Q4/Q13/Q10/Q18/Q19/Q22) over the driver's tables, each with a DuckDB
oracle.

Scale notes:
- the semi/anti probes keep only join keys on the build side, so the
  broadcast (or shuffle) ships the minimal columns;
- the scalar subquery is a 1-row aggregate crossJoin-broadcast onto the
  fact side — never a ``.collect()`` round-trip through the driver;
- Q10's quarter filter is pushed into the orders parquet scan via the
  raw-domain rewrite (``load_table(ts_pushdown=…)``), so at 100 TB the
  scan reads one quarter, not seven years;
- Q19's disjunction stays a single scan + one join (AQE picks broadcast
  at gate scale; part is SF-proportional so the hint is never forced):
  Catalyst splits the OR into partial pushdowns (brand IN (…) reaches
  the part scan) and evaluates the residual inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hfp_loader_spark.operators.relational import anti_join, global_top_k
from hfp_loader_spark.plans import money as _m
from hfp_loader_spark.plans.catalog import _t, defquery, load_table


@defquery(
    "q4_order_priority_semi",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4-like order-priority check: EXISTS → LEFT SEMI join with a "
    "non-equi residual (l_shipdate > o_orderdate rides the join condition). "
    "The probe side projects only (key, shipdate); one shuffle on orderkey, "
    "then a tiny aggregate.",
)
def q4_order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@defquery(
    "q13_customer_distribution",
    """
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
    doc="TPC-H Q13-like customer order-count distribution: LEFT OUTER join "
    "with an ON-clause predicate on the right side (filter pushed below the "
    "join — equivalent for outer joins, and prunes before the shuffle), "
    "count(nullable) preserving zero-order customers, then a histogram "
    "re-aggregate on the count.",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@defquery(
    "q10_returned_revenue_top20",
    f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {_m.sql_disc_rev_sum("l.l_extendedprice", "l.l_discount")}
             AS revenue
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10-like returned-item revenue: quarter filter pushed into "
    "the orders parquet scan (raw-domain rewrite → PushedFilters), "
    "returnflag pushed into lineitem, nation broadcast, top-20 via "
    "TakeOrderedAndProject on (rounded revenue, unique custkey).",
)
def q10_returned_revenue_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(
        spark,
        sf_dir,
        "orders",
        ts_pushdown=[
            ("o_orderdate", ">=", "1995-10-01"),
            ("o_orderdate", "<", "1996-01-01"),
        ],
    ).select("o_orderkey", "o_custkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        # exact cents — revenue is also the top-20 ordering key
        _m.disc_rev_sum(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "revenue"
        )
    )
    return global_top_k(
        agg.select("c_custkey", "c_name", "n_name", "revenue"),
        [F.desc("revenue"), F.asc("c_custkey")],
        20,
    )


@defquery(
    "q18_large_volume_orders",
    """
    SELECT o.o_orderkey,
           round(o.o_totalprice, 2) AS totalprice,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice, o.o_orderdate
    HAVING sum(l.l_quantity) > 250
    """,
    doc="TPC-H Q18-like large-volume orders: join-aggregate with a HAVING "
    "filter on the aggregate (post-agg filter — Catalyst cannot push it, "
    "but the partial agg shrinks the shuffle first). Quantity sums of "
    "integer-valued doubles are FP-exact, so the threshold is engine-safe.",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice", "o_orderdate")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 250)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("_qty", 2).alias("total_qty"),
        )
    )


@defquery(
    "q19_disjunctive_revenue",
    f"""
    SELECT {_m.sql_disc_rev_sum("l.l_extendedprice", "l.l_discount")}
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19-like disjunctive predicate revenue: OR-of-conjunctions "
    "spanning both join sides. Catalyst derives the common `p_brand IN "
    "(…)` implication and pushes it into the part scan before the join; "
    "the full disjunction evaluates as a codegen residual on the joined "
    "rows — one scan, one join (AQE-chosen strategy), no forced hint on "
    "the SF-proportional part side.",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    # part is SF-proportional — plain join, AQE chooses the strategy.
    joined = li.join(part, li.l_partkey == part.p_partkey)
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    pred = (
        ((brand == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#23") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#34") & size.between(1, 15) & qty.between(20, 30))
    )
    return joined.where(pred).agg(
        _m.disc_rev_sum(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


@defquery(
    "q22_wealthy_inactive",
    f"""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT)    AS n_customers,
           {_m.sql_money_sum("c.c_acctbal")} AS total_bal
    FROM customer c
    -- the avg threshold compares EXACTLY via integer cross-multiply
    -- (bal > sum/n  <=>  bal_cents * n > sum_cents): an ulp-noisy
    -- double avg could flip membership for a balance landing within
    -- rounding noise of the threshold
    WHERE CAST(round(c.c_acctbal * 100) AS HUGEINT)
            * (SELECT count(*) FROM customer WHERE c_acctbal > 0.0)
          > (SELECT sum(CAST(round(c_acctbal * 100) AS HUGEINT))
             FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    """,
    doc="TPC-H Q22-like wealthy-inactive customers: uncorrelated scalar "
    "subquery (1-row avg, crossJoin-broadcast onto the fact side — no "
    "driver collect) + NOT EXISTS anti-join against urgent orders, then "
    "a segment aggregate.",
)
def q22_wealthy_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("decimal(38,0)")
    # exact threshold: bal_cents * n > sum_cents (integer cross-multiply
    # of bal > sum/n) — see the oracle comment
    bal_stats = (
        cust.where(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(cents).alias("_sum_bal"),
            F.count("*").cast("decimal(38,0)").alias("_n_bal"),
        )
    )
    wealthy = cust.crossJoin(F.broadcast(bal_stats)).where(
        cents * F.col("_n_bal") > F.col("_sum_bal")
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    inactive = anti_join(
        wealthy, urgent, F.col("c_custkey") == F.col("o_custkey")
    )
    return inactive.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        _m.money_sum(F.col("c_acctbal")).alias("total_bal"),
    )


@defquery(
    "full_outer_daily_activity",
    """
    WITH o AS (SELECT strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
                      count(*) AS n_orders
               FROM orders GROUP BY 1),
         s AS (SELECT strftime(date_trunc('day', l_shipdate), '%Y-%m-%d') AS day,
                      count(*) AS n_ships
               FROM lineitem GROUP BY 1)
    SELECT coalesce(o.day, s.day) AS day,
           CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(coalesce(s.n_ships, 0) AS BIGINT)  AS n_ships
    FROM o FULL OUTER JOIN s ON o.day = s.day
    """,
    doc="FULL OUTER join of two pre-aggregated daily series (order days vs "
    "ship days), null-filled to zeros. Both inputs aggregate down to "
    "~date-cardinality before the join, so the outer join is tiny "
    "regardless of fact-table scale.",
)
def full_outer_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    day = lambda c: F.date_format(F.date_trunc("day", c), "yyyy-MM-dd")  # noqa: E731
    o = (
        _t(spark, sf_dir, "orders")
        .groupBy(day("o_orderdate").alias("o_day"))
        .agg(F.count("*").alias("n_orders"))
    )
    s = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(day("l_shipdate").alias("s_day"))
        .agg(F.count("*").alias("n_ships"))
    )
    j = o.join(s, o.o_day == s.s_day, "full_outer")
    return j.select(
        F.coalesce("o_day", "s_day").alias("day"),
        F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
        F.coalesce("n_ships", F.lit(0)).cast("long").alias("n_ships"),
    )


@defquery(
    "skew_salted_join_agg",
    """
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 2)   AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="Skew-mitigated equi-join (operators.relational.salted_join): the "
    "hot side gets a uniform salt, the small side replicates n_salts× via "
    "an in-row explode, so one hot key spreads over n_salts reducers "
    "instead of melting one. Join semantics are provably unchanged — the "
    "oracle is the PLAIN join, which is the point.",
)
def skew_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import salted_join

    ev = _t(spark, sf_dir, "events").select("user_id", "value")
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(ev, dim, on=["user_id"], n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@defquery(
    "skew_autosalt_join_agg",
    """
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 2)   AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="MEASURED skew mitigation (salted_join with n_salts=None): the "
    "hot side's key cardinalities are profiled first "
    "(quality.key_skew_stats, one aggregate pass), the salt factor is "
    "derived from the max/avg skew ratio — p99/avg is only a secondary "
    "signal, since the canonical one-mega-hot-key case has p99 ≈ avg — "
    "(quality.derive_salt_factor, clamped ≤64), and below the engage "
    "threshold the join runs PLAIN — "
    "diagnosis (dq_skew_report) wired into the remedy "
    "(skew_salted_join_agg) as one self-tuning operator. Semantics are "
    "identical either way, which is what the plain-join oracle pins.",
)
def skew_autosalt_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import salted_join

    ev = _t(spark, sf_dir, "events").select("user_id", "value")
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = salted_join(ev, dim, on=["user_id"], n_salts=None)
    return (
        joined.join(
            F.broadcast(nation),
            joined["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@defquery(
    "join_strategy_autoplan",
    """
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 2)   AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey AND c.c_custkey % 20 = 0
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Pre-flight join PLANNING (relational.choose_join_strategy): the "
    "dim is counted (broadcast disabled here to exercise the deeper "
    "branches), the fact keys are skew-profiled "
    "(quality.key_skew_stats → derive_salt_factor), and the join "
    "cardinality is estimated from count-min sketches of both key "
    "streams (sketches.cms_join_size) — a miss-heavy estimate gates "
    "the fact side through a Bloom filter of the dim keys (chained "
    "broadcast left-semi joins, map-side) BEFORE the shuffle, so "
    "non-matching rows never shuffle. Here the dim keeps only "
    "c_custkey % 20 = 0 (~5% key coverage), so the prefilter branch "
    "fires deterministically; the oracle is the PLAIN join — every "
    "strategy must return the identical result, which is the "
    "operator's whole contract. The decision instruments are bounded "
    "scalar reads (dim count, skew profile, two depth×width sketches), "
    "never a retained scan.",
)
def join_strategy_autoplan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import choose_join_strategy

    ev = _t(spark, sf_dir, "events").select("user_id", "value")
    dim = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 20 == 0)
        .select(F.col("c_custkey").alias("user_id"), "c_nationkey")
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined, _decision = choose_join_strategy(
        ev,
        dim,
        on=["user_id"],
        broadcast_max_rows=0,
        engage_at=1e9,  # salting covered by skew_autosalt_join_agg
    )
    return (
        joined.join(
            F.broadcast(nation),
            joined["c_nationkey"] == nation["n_nationkey"],
        )
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@defquery(
    "window_ntile_percentiles",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(10) OVER w AS BIGINT)     AS decile,
           round(percent_rank() OVER w, 6)      AS pct_rank,
           round(cume_dist() OVER w, 6)         AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY round(c_acctbal, 2), c_custkey)
    """,
    doc="Distribution window family (ntile / percent_rank / cume_dist) per "
    "market segment, ordered on (rounded balance, unique key) so both "
    "engines see an identical total order. All three functions share one "
    "shuffle + local sort on the segment key.",
)
def window_ntile_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", F.round("c_acctbal", 2).alias("_bal")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("_bal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(10).over(w).cast("long").alias("decile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@defquery(
    "funnel_view_click_purchase",
    """
    WITH s0 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s1 AS (SELECT e.user_id, min(e.ts) AS t
           FROM events e JOIN s0 ON e.user_id = s0.user_id
           WHERE e.event_type = 'click' AND e.ts > s0.t
           GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s1.t
           GROUP BY e.user_id)
    SELECT 'view' AS step, 1 AS step_idx,
           CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users
    UNION ALL
    SELECT 'click', 2, CAST((SELECT count(*) FROM s1) AS BIGINT)
    UNION ALL
    SELECT 'purchase', 3, CAST((SELECT count(*) FROM s2) AS BIGINT)
    """,
    doc="Sequential funnel view→click→purchase "
    "(operators.relational.funnel_counts): step i counts users with an "
    "event strictly after their earliest step-i-1 completion. Per step "
    "one type-filtered aggregate + one user-keyed join — never a "
    "collect_list of a user's history, so power users can't blow "
    "executor memory at 100 TB.",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import funnel_counts

    return funnel_counts(
        _t(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


@defquery(
    "cohort_weekly_retention",
    """
    WITH p AS (SELECT user_id, date_trunc('week', ts) AS w FROM events),
    f AS (SELECT user_id, min(w) AS cohort FROM p GROUP BY user_id),
    u AS (SELECT DISTINCT p.user_id, f.cohort,
                 date_diff('day', f.cohort, p.w) // 7 AS woff
          FROM p JOIN f ON p.user_id = f.user_id)
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
           CAST(woff AS BIGINT) AS period_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM u GROUP BY 1, 2
    """,
    doc="Weekly cohort retention triangle "
    "(operators.relational.cohort_retention): users cohorted by first-"
    "active week, counted per whole-week offset they returned in. "
    "Offset 0 = cohort size, offset k = week-k retention numerator. "
    "Per-user periods distinct-compact BEFORE the final count — no "
    "count(distinct) expansion over the raw stream.",
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"))


@defquery(
    "attribution_last_touch",
    """
    WITH touches AS (
      SELECT user_id, ts, arg_max(event_type, event_id) AS touch_type
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY user_id, ts
    ),
    purchases AS (SELECT user_id, ts FROM events
                  WHERE event_type = 'purchase')
    SELECT t.touch_type, CAST(count(*) AS BIGINT) AS n_purchases
    FROM purchases p
      ASOF JOIN touches t ON p.user_id = t.user_id AND p.ts >= t.ts
    GROUP BY t.touch_type
    """,
    doc="Last-touch attribution: each purchase credits the LATEST "
    "view/click at-or-before it — the as-of join application "
    "(operators.relational.asof_join: one union + shuffle-sort + "
    "running last(), no inequality-join pair blowup). Same-instant "
    "touches dedupe to the max-event_id one on both engines "
    "(max_by/arg_max) so the carry is deterministic. Oracle: DuckDB "
    "native ASOF JOIN.",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import asof_join

    ev = _t(spark, sf_dir, "events")
    touches = (
        ev.where(F.col("event_type").isin("view", "click"))
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_type", "event_id").alias("touch_type"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    attributed = asof_join(
        purchases,
        touches,
        key="user_id",
        probe_ts="ts",
        event_ts="ts",
        event_cols=["touch_type"],
    )
    return attributed.groupBy("touch_type").agg(
        F.count("*").alias("n_purchases")
    )


@defquery(
    "hist_order_totalprice",
    """
    WITH b AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
               FROM orders)
    SELECT CAST(least(floor((o_totalprice - b.lo) / ((b.hi - b.lo) / 10)),
                      9) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(min(o_totalprice), 2) AS bucket_min,
           round(max(o_totalprice), 2) AS bucket_max
    FROM orders, b
    GROUP BY 1
    """,
    doc="Equi-width histogram of order totals: bounds from a 1-row scalar "
    "subquery (broadcast cross join, no driver collect), bucket id as "
    "identical floor arithmetic on both engines (top edge clamped into "
    "the last bucket). The profiling primitive behind range-partition "
    "sizing decisions.",
)
def hist_order_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_totalprice")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("lo"))
            / ((F.col("hi") - F.col("lo")) / 10)
        ),
        F.lit(9),
    ).cast("long")
    return (
        orders.crossJoin(F.broadcast(bounds))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("o_totalprice"), 2).alias("bucket_min"),
            F.round(F.max("o_totalprice"), 2).alias("bucket_max"),
        )
    )


@defquery(
    "agg_winsorized_stats",
    f"""
    WITH bounds AS (
      SELECT o_orderstatus,
             quantile_cont(o_totalprice, 0.05) AS lo,
             quantile_cont(o_totalprice, 0.95) AS hi
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (o.o_totalprice < b.lo) AS BIGINT)
             AS n_clipped_low,
           CAST(count(*) FILTER (o.o_totalprice > b.hi) AS BIGINT)
             AS n_clipped_high,
           -- clipped values are quantized to EXACT integer cents before
           -- the sum (the bounds are interpolated doubles, so the raw
           -- clipped sum would be summation-order-dependent); the stat
           -- is defined as "winsorized, to the cent" on both engines
           round(CAST(sum(CAST(round(
                   least(greatest(o.o_totalprice, b.lo), b.hi) * 100)
                 AS HUGEINT)) AS DOUBLE) / 100.0, 2) + 0.0
             AS winsorized_sum,
           {_m._sql_int_avg("sum(CAST(round(least(greatest(o.o_totalprice, b.lo), b.hi) * 100) AS HUGEINT))", 4, 100)}
             AS winsorized_avg
    FROM orders o JOIN bounds b USING (o_orderstatus)
    GROUP BY o.o_orderstatus
    """,
    doc="Winsorized statistics (clip at p05/p95 per group) — the standard "
    "outlier-trim before aggregating a heavy-tailed measure, and the "
    "robust-mean primitive training-data pipelines apply to document "
    "lengths / per-user totals. Per-group interpolated percentiles "
    "(Spark percentile ≡ DuckDB quantile_cont, same doubles) computed in "
    "one group-cardinality aggregate, broadcast back onto the fact rows, "
    "clip + conditional counts in a single second pass. At 100 TB the "
    "approx_percentile t-digest swaps in for the exact bounds the same "
    "way as everywhere else in this catalog.",
)
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select("o_orderstatus", "o_totalprice")
    bounds = orders.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.05).alias("_lo"),
        F.percentile("o_totalprice", 0.95).alias("_hi"),
    )
    clipped = F.least(
        F.greatest(F.col("o_totalprice"), F.col("_lo")), F.col("_hi")
    )
    return (
        orders.join(F.broadcast(bounds), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.count(F.when(F.col("o_totalprice") < F.col("_lo"), 1)).alias(
                "n_clipped_low"
            ),
            F.count(F.when(F.col("o_totalprice") > F.col("_hi"), 1)).alias(
                "n_clipped_high"
            ),
            (
                F.round(
                    F.sum(
                        F.round(clipped * 100).cast("decimal(38,0)")
                    ).cast("double")
                    / 100.0,
                    2,
                )
                + F.lit(0.0)
            ).alias("winsorized_sum"),
            _m._int_avg(
                F.sum(F.round(clipped * 100).cast("decimal(38,0)")),
                F.count("*"),
                4,
                100,
            ).alias("winsorized_avg"),
        )
    )


@defquery(
    "unpivot_lineitem_measures",
    f"""
    -- all four measures are exact at 2dp, so the sum runs in integer
    -- cents and the 6dp mean rounds tie-free via integer half-up
    SELECT l_returnflag, measure,
           CAST(count(*) AS BIGINT) AS n,
           {_m.sql_money_sum("value")} AS total,
           {_m._sql_int_avg("sum(CAST(round(value * 100) AS HUGEINT))", 6, 100)}
             AS mean
    FROM (
      SELECT l_returnflag, 'quantity' AS measure, l_quantity AS value
      FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'tax', l_tax FROM lineitem
    )
    GROUP BY l_returnflag, measure
    """,
    doc="UNPIVOT / melt (wide → long, the inverse of pivot): four measure "
    "columns become (measure, value) rows via DataFrame.unpivot — Spark "
    "plans ONE Expand over a single scan (each input row fans out to 4 "
    "in-row), where the naive UNION ALL the oracle states would scan the "
    "fact table four times. The long layout then aggregates per "
    "(flag, measure) in one pass — the profile-every-column primitive.",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    ).withColumn(
        # align the measure labels with the oracle's names
        "measure",
        F.expr("substring(measure, 3)"),
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count("*").alias("n"),
        _m.money_sum(F.col("value")).alias("total"),
        _m._int_avg(
            F.sum(F.round(F.col("value") * 100).cast("decimal(38,0)")),
            F.count("*"),
            6,
            100,
        ).alias("mean"),
    )


@defquery(
    "timeseries_gapfill_daily",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(count(*) AS BIGINT)  AS n_orders,
             {_m.sql_money_sum("o_totalprice")} AS total
      FROM orders WHERE o_orderstatus = 'P' GROUP BY 1
    ),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 day'))::DATE AS d
      FROM bounds
    ),
    joined AS (
      SELECT s.d, y.n_orders, y.total FROM spine s LEFT JOIN daily y USING (d)
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           coalesce(n_orders, 0)   AS n_orders,
           CASE WHEN n_orders IS NULL THEN 1 ELSE 0 END AS was_gap,
           coalesce(total,
                    last_value(total IGNORE NULLS)
                      OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING),
                    0.0)           AS total_ffill
    FROM joined
    """,
    doc="Time-series gap-fill: a complete date spine from sequence() "
    "(one row per day between the observed min and max — generated "
    "in-plan, no driver loop), LEFT JOIN of the daily aggregate onto it, "
    "zero-fill for counts and FORWARD-FILL for the level metric via "
    "last_value(ignorenulls) over an unbounded-preceding frame. The "
    "resample primitive every metrics/feature pipeline needs before "
    "windowed training aggregates; the spine is date-cardinality, so "
    "the join is trivially broadcastable at any fact scale.",
)
def timeseries_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "P")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.count("*").alias("n_orders"),
            _m.money_sum(F.col("o_totalprice")).alias("total"),
        )
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("d")
    )
    joined = spine.join(daily, "d", "left")
    ffill = F.last("total", ignorenulls=True).over(
        Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    )
    return joined.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.when(F.col("n_orders").isNull(), 1).otherwise(0).alias("was_gap"),
        F.coalesce("total", ffill, F.lit(0.0)).alias("total_ffill"),
    )


@defquery(
    "sketch_mergeable_distinct",
    """
    SELECT CAST(count(DISTINCT strftime(date_trunc('month', o_orderdate),
                                        '%Y-%m')) AS BIGINT) AS n_sketches,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
           TRUE AS merged_within_5pct
    FROM orders
    """,
    doc="MERGEABLE distinct-count sketches (Apache DataSketches HLL via "
    "hll_sketch_agg / hll_union_agg): one sketch per month partition, "
    "then a union-merge to the global estimate — the warehouse pattern "
    "where per-partition sketches are PERSISTED once and every later "
    "rollup (any grouping of partitions) is a cheap merge instead of a "
    "rescan; approx_count_distinct cannot do this because its sketch "
    "never leaves the aggregate. Oracle: the tolerance-band contract — "
    "sketch count (= month count), exact distinct customers, and a "
    "boolean pinning |merged-estimate − exact| ≤ 5%.",
)
def sketch_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.hll_sketch_agg("o_custkey").alias("sketch"))
    merged = monthly.agg(
        F.count("*").alias("n_sketches"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("_est"),
    )
    exact = orders.agg(F.countDistinct("o_custkey").alias("exact_distinct"))
    return merged.crossJoin(exact).select(
        "n_sketches",
        "exact_distinct",
        (
            F.abs(F.col("_est") - F.col("exact_distinct"))
            <= 0.05 * F.col("exact_distinct")
        ).alias("merged_within_5pct"),
    )


@defquery(
    "agg_regression_stats",
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT)                          AS n,
           round(corr(l_extendedprice, l_quantity), 6)       AS price_qty_corr,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(stddev_samp(l_discount), 6)                 AS discount_sd
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Statistical aggregates (corr / regr_slope / regr_intercept / "
    "stddev_samp): the per-group least-squares fit and correlation of "
    "price vs quantity — single-pass mergeable moment accumulators on "
    "both engines (partial aggregation shuffles 6 moments per group, "
    "never the rows), the profile-and-drift-check primitive feature "
    "pipelines run per training snapshot.",
)
def agg_regression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias(
            "price_qty_corr"
        ),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
            "slope"
        ),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "intercept"
        ),
        F.round(F.stddev_samp("l_discount"), 6).alias("discount_sd"),
    )


@defquery(
    "timeseries_gapfill_per_key",
    f"""
    WITH daily AS (
      SELECT o_orderstatus, CAST(o_orderdate AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n_orders,
             {_m.sql_money_sum("o_totalprice")} AS total
      FROM orders GROUP BY 1, 2
    ),
    bounds AS (
      SELECT o_orderstatus, min(d) AS lo, max(d) AS hi FROM daily GROUP BY 1
    ),
    spine AS (
      SELECT o_orderstatus,
             CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ),
    joined AS (
      SELECT s.o_orderstatus, s.d, dd.n_orders, dd.total
      FROM spine s LEFT JOIN daily dd
        ON s.o_orderstatus = dd.o_orderstatus AND s.d = dd.d
    )
    SELECT o_orderstatus,
           strftime(d, '%Y-%m-%d') AS day,
           CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
           CAST(CASE WHEN n_orders IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap,
           coalesce(total,
                    last_value(total IGNORE NULLS)
                      OVER (PARTITION BY o_orderstatus ORDER BY d
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0.0) AS total_ffill
    FROM joined
    """,
    doc="PER-KEY time-series gap-fill (operators.relational.gapfill_daily): "
    "each order status gets its own complete daily spine between its min "
    "and max date, with zero-filled counts and a PARTITIONED forward-fill "
    "window — the safe default the global-spine query "
    "(timeseries_gapfill_daily) is the bounded special case of. The "
    "window partitions by key, so at scale fills distribute across "
    "executors instead of collapsing into one unpartitioned task; spine "
    "cardinality = Σ per-key day spans = output size, nothing amplified.",
)
def timeseries_gapfill_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import gapfill_daily

    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(
            "o_orderstatus", F.col("o_orderdate").cast("date").alias("d")
        )
        .agg(
            F.count("*").alias("n_orders"),
            _m.money_sum(F.col("o_totalprice")).alias("total"),
        )
    )
    filled = gapfill_daily(
        daily,
        "d",
        ["o_orderstatus"],
        zero_cols=["n_orders"],
        ffill_cols=["total"],
    )
    return filled.select(
        "o_orderstatus",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_orders",
        "was_gap",
        F.col("total").alias("total_ffill"),
    )


@defquery(
    "sketch_cms_frequencies",
    """
    WITH exact AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS exact_cnt
      FROM orders WHERE o_custkey < 8 GROUP BY o_custkey
    )
    SELECT o_custkey, exact_cnt,
           TRUE AS never_underestimates,
           TRUE AS within_eps_bound
    FROM exact
    """,
    doc="Count-min sketch CONTRACT (operators.sketches): per-month CMS "
    "sketches of order counts per customer (depth 4 × width 256 — at "
    "most 1024 cells per month regardless of input size), merged to a "
    "global sketch by cell-wise addition — the persisted-sketch rollup "
    "pattern (any coarser grouping = a merge, never a rescan; the HLL "
    "entry's algebra applied to FREQUENCIES). Estimates for a key "
    "watch-list are checked against Spark-computed exact counts: "
    "est ≥ exact always (collisions only add — a hard invariant), and "
    "est ≤ exact + (e/width)·N (the classic ε-bound; deterministic "
    "hashes make it a fixed fact of this corpus, measured true at "
    "sf0.01 and sf0.1). The oracle restates the exact counts and pins "
    "both booleans.",
)
def sketch_cms_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from hfp_loader_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.date_format("o_orderdate", "yyyy-MM").alias("month")
    )
    monthly = cms_build(orders, "o_custkey", part_cols=["month"])
    merged = cms_merge(monthly, part_cols=[])
    keys = _t(spark, sf_dir, "customer").where(
        F.col("c_custkey") < 8
    ).select(F.col("c_custkey").alias("o_custkey"))
    est = cms_estimate(merged, keys, "o_custkey")
    exact = (
        orders.where(F.col("o_custkey") < 8)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("exact_cnt"))
    )
    n_total = orders.agg(F.count("*").alias("_n"))
    eps = math.e / 256
    return (
        exact.join(est, "o_custkey")
        .crossJoin(F.broadcast(n_total))
        .select(
            "o_custkey",
            "exact_cnt",
            (F.col("cms_estimate") >= F.col("exact_cnt")).alias(
                "never_underestimates"
            ),
            (
                F.col("cms_estimate")
                <= F.col("exact_cnt") + F.ceil(F.lit(eps) * F.col("_n"))
            ).alias("within_eps_bound"),
        )
    )


@defquery(
    "sketch_bloom_membership",
    """
    SELECT CAST(count(*) FILTER (c_nationkey < 5) AS BIGINT)  AS n_inserted,
           CAST(count(*) FILTER (c_nationkey >= 5) AS BIGINT) AS n_absent,
           TRUE AS no_false_negatives,
           TRUE AS fp_rate_bounded
    FROM customer
    """,
    doc="Bloom-filter membership CONTRACT (operators.sketches.bloom_*): "
    "per-nation bit-set filters over the customer keys of nations 0-4 "
    "(4096 bits x 5 hashes), merged by bit union to one global filter, "
    "then EVERY customer key probed against the broadcast bit set. "
    "No false negatives is a theorem (an inserted key's bits are all "
    "set); the false-positive rate over the absent keys is checked "
    "against 2x the analytic (1-e^(-kn/m))^k + 0.02 slack — "
    "deterministic hashes make it a fixed fact of this corpus. The "
    "scale use is shuffle-free membership gating: persist per-shard "
    "filters, merge, broadcast ~4k bit rows, gate the 100 TB side "
    "map-side. Oracle restates the inserted/absent counts and pins "
    "both booleans.",
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from hfp_loader_spark.operators.sketches import (
        bloom_build,
        bloom_contains_lazy,
        bloom_merge,
    )

    num_bits, num_hashes = 4096, 5
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    inserted = cust.where(F.col("c_nationkey") < 5)
    per_nation = bloom_build(
        inserted, "c_custkey", part_cols=["c_nationkey"],
        num_bits=num_bits, num_hashes=num_hashes,
    )
    merged = bloom_merge(per_nation, part_cols=[])
    # the LAZY probe keeps catalog construction job-free: the literal
    # form collects the bit set at plan-build time (see bloom_contains)
    probed = bloom_contains_lazy(
        merged, cust.select("c_custkey"), "c_custkey",
        num_bits=num_bits, num_hashes=num_hashes,
    )
    labeled = probed.join(cust, "c_custkey").select(
        "maybe_present", (F.col("c_nationkey") < 5).alias("_in")
    )
    # analytic FP bound needs n_inserted — fold it through the aggregate
    agg = labeled.agg(
        F.sum(F.when(F.col("_in"), 1).otherwise(0))
        .cast("long")
        .alias("n_inserted"),
        F.sum(F.when(~F.col("_in"), 1).otherwise(0))
        .cast("long")
        .alias("n_absent"),
        F.sum(F.when(F.col("_in") & ~F.col("maybe_present"), 1).otherwise(0))
        .alias("_false_neg"),
        F.sum(F.when(~F.col("_in") & F.col("maybe_present"), 1).otherwise(0))
        .alias("_false_pos"),
    )
    k, m = float(num_hashes), float(num_bits)
    fp_analytic = (
        F.pow(
            F.lit(1.0) - F.exp(-F.lit(k) * F.col("n_inserted") / F.lit(m)),
            F.lit(k),
        )
    )
    return agg.select(
        "n_inserted",
        "n_absent",
        (F.col("_false_neg") == 0).alias("no_false_negatives"),
        (
            F.col("_false_pos")
            <= (F.lit(2.0) * fp_analytic + F.lit(0.02)) * F.col("n_absent")
        ).alias("fp_rate_bounded"),
    )


@defquery(
    "sketch_sliding_distinct",
    """
    WITH ev AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (SELECT DISTINCT d FROM ev),
    sliding AS (
      SELECT e.d AS day,
             CAST(count(DISTINCT v.user_id) AS BIGINT) AS exact_sliding
      FROM days e JOIN ev v ON v.d BETWEEN e.d - 6 AND e.d
      GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, exact_sliding,
           TRUE AS within_5pct
    FROM sliding
    """,
    doc="TIME-dimension sketch reuse: 7-day sliding distinct users "
    "computed by union-merging PERSISTED daily HLL sketches (each daily "
    "sketch fans out to the ≤7 window-ends it serves via a bounded "
    "explode — |days|x7 sketch rows, never a re-scan of events; the "
    "dashboard pattern where one nightly sketch build answers every "
    "trailing-window distinct for free). Contract: per window-end, the "
    "merged estimate lands within 5% of the exact sliding distinct "
    "(lgK=12 HLL is ~2.5% RSE); the oracle restates the exact counts "
    "with a literal TRUE. Window-ends restricted to observed days on "
    "both sides.",
)
def sketch_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
    )
    days = ev.select("d").distinct()
    daily = ev.groupBy("d").agg(F.hll_sketch_agg("user_id").alias("sk"))
    fan = daily.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"), "d", "sk"
    ).select(F.date_add("d", F.col("o")).alias("day"), "sk")
    est = (
        fan.join(
            F.broadcast(days.select(F.col("d").alias("day"))),
            "day",
            "left_semi",
        )
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"))
    )
    exact = (
        ev.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
            "d",
            "user_id",
        )
        .select(F.date_add("d", F.col("o")).alias("day"), "user_id")
        .join(
            F.broadcast(days.select(F.col("d").alias("day"))),
            "day",
            "left_semi",
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_sliding"))
    )
    return (
        exact.join(est, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "exact_sliding",
            (
                F.abs(F.col("_est") - F.col("exact_sliding"))
                <= 0.05 * F.col("exact_sliding")
            ).alias("within_5pct"),
        )
    )


@defquery(
    "sketch_join_size_estimate",
    """
    SELECT CAST(count(*) AS BIGINT) AS exact_join_rows,
           TRUE AS never_underestimates,
           TRUE AS within_eps_bound
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    doc="Join-cardinality estimation from count-min sketches "
    "(operators.sketches.cms_join_size): |events ⋈ customer| estimated "
    "as the min over depth rows of the bucket-wise dot product of the "
    "two key sketches — the pre-flight 'how big is this join' answer "
    "from two bounded (4×256)-cell frames, no shuffle of either table "
    "and no reliance on stale table stats. Contract: est ≥ exact (a "
    "hard invariant — collisions only add) and est ≤ exact + "
    "(e/width)·N_a·N_b (the classic expectation bound; deterministic "
    "hashes make it a fixed fact of this corpus). Oracle restates the "
    "exact join count with literal TRUEs.",
)
def sketch_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from hfp_loader_spark.operators.sketches import cms_build, cms_join_size

    ev = _t(spark, sf_dir, "events").select("user_id")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id")
    )
    sa = cms_build(ev, "user_id")
    sb = cms_build(cust, "user_id")
    est = cms_join_size(sa, sb)
    exact = (
        ev.join(cust, "user_id")
        .agg(F.count("*").cast("long").alias("exact_join_rows"))
    )
    sizes = ev.agg(F.count("*").alias("_na")).crossJoin(
        cust.agg(F.count("*").alias("_nb"))
    )
    eps = math.e / 256
    return (
        exact.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(sizes))
        .select(
            "exact_join_rows",
            (F.col("est_join_rows") >= F.col("exact_join_rows")).alias(
                "never_underestimates"
            ),
            (
                F.col("est_join_rows")
                <= F.col("exact_join_rows")
                + F.ceil(F.lit(eps) * F.col("_na") * F.col("_nb"))
            ).alias("within_eps_bound"),
        )
    )


@defquery(
    "sketch_quantile_histogram",
    """
    WITH c AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 0
    ), b AS (
      -- log-linear bucket floor: top 6 significant bits, rest zeroed
      SELECT month,
             (cents >> greatest(length(bin(cents)) - 6, 0))
               << greatest(length(bin(cents)) - 6, 0) AS bucket_lo
      FROM c
    ),
    m AS (SELECT month, bucket_lo, count(*) AS cnt FROM b GROUP BY 1, 2),
    g AS (SELECT bucket_lo, sum(cnt) AS cnt FROM m GROUP BY 1),
    cum AS (SELECT bucket_lo, sum(cnt) OVER (ORDER BY bucket_lo) AS cc
            FROM g),
    n AS (SELECT sum(cnt) AS n FROM g),
    qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
    est AS (
      SELECT q, min(bucket_lo) AS q_est
      FROM cum, n, qs
      WHERE cc >= greatest(CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT), 1)
      GROUP BY q
    ),
    vc AS (SELECT cents AS v, count(*) AS cnt FROM c GROUP BY 1),
    vcum AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cc FROM vc),
    exact AS (
      SELECT q, min(v) AS q_exact
      FROM vcum, n, qs
      WHERE cc >= greatest(CAST(ceil(q * CAST(n AS DOUBLE)) AS BIGINT), 1)
      GROUP BY q
    )
    SELECT q, CAST(q_est AS BIGINT) AS q_est,
           CAST(q_exact AS BIGINT) AS q_exact,
           q_est <= q_exact AS est_never_exceeds,
           (q_exact - q_est) * 32 <= q_est AS within_rel_bound
    FROM est JOIN exact USING (q)
    """,
    doc="MERGEABLE quantile sketch (operators.sketches.qhist_*): "
    "log-linear histogram of order totals in cents (HdrHistogram "
    "bucketing — top 6 significant bits, integer-exact on both engines; "
    "no log2, whose power-of-two last-ulp behavior does not cross "
    "engines), one sketch per month, merged by per-bucket addition to "
    "answer p50/p90/p99 globally — the quantile member of the "
    "persisted-sketch family (HLL = distincts, CMS = frequencies, Bloom "
    "= membership): any later rollup is a merge, never a rescan; "
    "approx_percentile cannot do this because its digest never leaves "
    "the aggregate. Per-bucket counts are exact, so the selected bucket "
    "provably CONTAINS the true rank value: est ≤ true (pinned) and "
    "(true − est)·2^sub_bits ≤ est (the hard relative bound, pinned in "
    "pure integer math). The true rank values come from the same "
    "rank-selection run on exact value counts — a verification "
    "instrument; the sketch path is the 100 TB path (the cumulative "
    "window runs over the ~2k-row sketch, never the data).",
)
def sketch_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.sketches import (
        qhist_build,
        qhist_merge,
        qhist_quantiles,
    )

    QS = [0.5, 0.9, 0.99]
    cents = (
        _t(spark, sf_dir, "orders")
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .where(F.col("cents") >= 0)
    )
    monthly = qhist_build(cents, "cents", ["month"])
    est = qhist_quantiles(qhist_merge(monthly, []), QS)
    value_counts = (
        cents.groupBy(F.col("cents").alias("bucket_lo"))
        .agg(F.count("*").alias("cnt"))
    )
    exact = qhist_quantiles(value_counts, QS).withColumnRenamed(
        "q_est", "q_exact"
    )
    return est.join(exact, "q").select(
        "q",
        "q_est",
        "q_exact",
        (F.col("q_est") <= F.col("q_exact")).alias("est_never_exceeds"),
        ((F.col("q_exact") - F.col("q_est")) * 32 <= F.col("q_est")).alias(
            "within_rel_bound"
        ),
    )


# SQL twin of layout.zorder_value for two 8-bit dimensions: bit i of dim
# j lands at position 2i + j.  Generated once; pure BIGINT shifts/ands.
_Z_SQL = " | ".join(
    f"(((qu >> {i}) & 1) << {2 * i}) | (((qt >> {i}) & 1) << {2 * i + 1})"
    for i in range(8)
)


@defquery(
    "layout_zorder_events",
    f"""
    WITH q AS (
      SELECT greatest(least(user_id // 8, 255), 0) AS qu,
             greatest(least(CAST(floor(epoch(ts)) AS BIGINT)
                            - 1704067200, 2591999) // 10800, 0) AS qt
      FROM events
    ), z AS (
      SELECT qu, qt, {_Z_SQL} AS zval FROM q
    )
    SELECT zval >> 10 AS z_prefix,
           CAST(count(*) AS BIGINT) AS n_events,
           min(qu) AS min_qu, max(qu) AS max_qu,
           min(qt) AS min_qt, max(qt) AS max_qt
    FROM z
    GROUP BY z_prefix
    ORDER BY z_prefix
    """,
    doc="Z-order (Morton) clustering key for events over (user_id, "
    "3h-time-bucket) — the layout.zorder_value interleave exposed to the "
    "oracle gate in pure integer math: quantize both dimensions to 8-bit "
    "bucket ids (integer div + clamp; no floats), interleave bits so "
    "close-in-EVERY-dimension rows get close Z-values, then report "
    "per-Z-prefix occupancy with each prefix's min/max bucket ids — the "
    "per-file min/max tightness that makes box predicates on ANY "
    "dimension subset skip files via plain parquet row-group stats "
    "(layout.zorder_write materializes it; tests/test_layout.py proves "
    "the skipping on real files). Scale shape: one narrow projection + "
    "one bounded aggregate (≤ 2^6 prefixes); the production write adds "
    "one range shuffle at write time, amortized over every pruned read.",
)
def layout_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.layout import zorder_value

    ev = _t(spark, sf_dir, "events")
    # `div` (truncating) vs DuckDB's flooring `//` agree here because the
    # clamp pins every negative input to bucket 0 on both engines
    qu = F.expr("greatest(least(user_id div 8, 255), 0)")
    qt = F.expr(
        "greatest(least((unix_timestamp(ts) - 1704067200) div 10800, 239),"
        " 0)"
    )
    z = ev.select(
        qu.cast("long").alias("qu"), qt.cast("long").alias("qt")
    ).withColumn("zval", zorder_value([F.col("qu"), F.col("qt")], bits=8))
    return (
        z.groupBy(F.shiftright("zval", 10).alias("z_prefix"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("qu").alias("min_qu"),
            F.max("qu").alias("max_qu"),
            F.min("qt").alias("min_qt"),
            F.max("qt").alias("max_qt"),
        )
        .orderBy("z_prefix")
    )


# --- KMV distinct sketches (deterministic → full value-hash oracles) ---

_KMV_K = 64


def _kmv_h_sql(col: str) -> str:
    """13 md5 hex digits → BIGINT by positional fold with LITERAL powers
    of 16 (DuckDB has no conv(); float 16**i would lose exactness) —
    the SQL twin of operators.sketches.kmv_hash."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({col}), {i + 1}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    )
    return f"CAST({terms} AS BIGINT)"


# word BIGRAMS as the sketched key: per-source distinct bigrams (~700 at
# sf0.01) far exceed k=64, so the (k-1)/r_k ESTIMATOR branch is what the
# oracle checks — unigram vocabulary (~31) would degenerate to the
# exact-set branch and never exercise the estimator
_KMV_TOKS_CTE = """
    tk0 AS (
      SELECT source, list_filter(
          string_split_regex(lower(text), '[^a-z0-9]+'),
          t -> len(t) > 0) AS tk
      FROM documents
    ),
    toks AS (
      SELECT source, tk[i] || ' ' || tk[i + 1] AS term
      FROM tk0, unnest(generate_series(1, len(tk) - 1)) AS u(i)
      WHERE len(tk) >= 2
    )
"""


@defquery(
    "sketch_kmv_distinct",
    f"""
    WITH {_KMV_TOKS_CTE},
    hs AS (SELECT DISTINCT source, {_kmv_h_sql("term")} AS h FROM toks),
    rk AS (SELECT source, h,
                  row_number() OVER (PARTITION BY source ORDER BY h) AS r
           FROM hs),
    sk AS (SELECT source, h FROM rk WHERE r <= {_KMV_K}),
    ag AS (SELECT source, CAST(count(*) AS BIGINT) AS n, max(h) AS hk
           FROM sk GROUP BY 1),
    ex AS (SELECT source, CAST(count(DISTINCT term) AS BIGINT)
                    AS exact_distinct
           FROM toks GROUP BY 1)
    SELECT ag.source, ex.exact_distinct,
           round(CASE WHEN n < {_KMV_K} THEN CAST(n AS DOUBLE)
                 ELSE {float(_KMV_K - 1)!r}
                      / (CAST(hk AS DOUBLE) / {float(16**13)!r}) END, 4)
             AS est_distinct
    FROM ag JOIN ex ON ag.source = ex.source
    """,
    doc="K-minimum-values distinct sketch (Bar-Yossef et al. 2002; "
    "operators.sketches.kmv_sketch, k=64): per-source distinct-token "
    "estimates (k−1)/r_k from the k smallest md5-derived hashes, "
    "against the exact count. Because 'k smallest distinct hashes' is "
    "a pure function of the data, the ESTIMATE itself hash-matches the "
    "SQL oracle exactly — no tolerance band, unlike HLL/CMS. The 13-"
    "hex-digit hash fits both BIGINT and a double mantissa, so the "
    "[0,1) fraction is exact on every engine. Scale shape: one "
    "distinct on (source, 8-byte h), one per-group top-k heap; the "
    "persisted sketch is ≤ k rows per source and merges by "
    "union+dedup+re-rank.",
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_sketch,
    )
    from hfp_loader_spark.operators.text import tokens, word_ngrams

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(word_ngrams(tokens(F.col("text")), 2)).alias("term"),
    )
    sk = kmv_sketch(toks, "source", "term", k=_KMV_K)
    est = kmv_distinct_estimate(sk, "source", k=_KMV_K)
    exact = toks.groupBy("source").agg(
        F.countDistinct("term").alias("exact_distinct")
    )
    return est.join(exact, "source").select(
        "source",
        "exact_distinct",
        F.round("est_distinct", 4).alias("est_distinct"),
    )


@defquery(
    "sketch_kmv_jaccard_sources",
    f"""
    WITH {_KMV_TOKS_CTE},
    hs AS (SELECT DISTINCT source, {_kmv_h_sql("term")} AS h FROM toks),
    rk AS (SELECT source, h,
                  row_number() OVER (PARTITION BY source ORDER BY h) AS r
           FROM hs),
    sk AS (SELECT source, h FROM rk WHERE r <= {_KMV_K}),
    prs AS (
      SELECT a.source AS ga, b.source AS gb
      FROM (SELECT DISTINCT source FROM sk) a
      JOIN (SELECT DISTINCT source FROM sk) b ON a.source < b.source
    ),
    un AS (
      SELECT DISTINCT prs.ga, prs.gb, s.h
      FROM prs JOIN sk s ON s.source = prs.ga OR s.source = prs.gb
    ),
    tk AS (
      SELECT ga, gb, h,
             row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS r
      FROM un
    ),
    est AS (
      SELECT t.ga, t.gb,
             CAST(count(*) AS BIGINT) AS m,
             CAST(sum(CASE WHEN ia.h IS NOT NULL AND ib.h IS NOT NULL
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_both
      FROM tk t
      LEFT JOIN sk ia ON ia.source = t.ga AND ia.h = t.h
      LEFT JOIN sk ib ON ib.source = t.gb AND ib.h = t.h
      WHERE t.r <= {_KMV_K}
      GROUP BY 1, 2
    ),
    dt AS (SELECT DISTINCT source, term FROM toks),
    ovl AS (
      SELECT a.source AS ga, b.source AS gb,
             CAST(count(*) AS BIGINT) AS inter
      FROM dt a JOIN dt b ON a.term = b.term AND a.source < b.source
      GROUP BY 1, 2
    ),
    nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM dt GROUP BY 1)
    SELECT est.ga AS source_a, est.gb AS source_b,
           round(CAST(coalesce(ovl.inter, 0) AS DOUBLE)
                 / CAST(na.n + nb.n - coalesce(ovl.inter, 0) AS DOUBLE), 4)
             AS exact_jaccard,
           round(CAST(n_both AS DOUBLE) / CAST(m AS DOUBLE), 4)
             AS est_jaccard
    FROM est
    LEFT JOIN ovl ON ovl.ga = est.ga AND ovl.gb = est.gb
    JOIN nd na ON na.source = est.ga
    JOIN nd nb ON nb.source = est.gb
    """,
    doc="KMV set-operation estimates (Beyer et al. 2007; "
    "operators.sketches.kmv_jaccard): pairwise source-vocabulary "
    "Jaccard from the k smallest hashes of each pair's UNION sketch — "
    "the set-intersection capability HLL lacks — alongside the exact "
    "Jaccard. Deterministic → exact SQL parity on the estimate itself. "
    "Scale shape: the pair expansion touches only the ≤ k-row sketches "
    "(groups²·k rows, independent of corpus size); the exact side is "
    "the audit instrument, one (term)-keyed equi-join on distinct "
    "vocabulary.",
)
def sketch_kmv_jaccard_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.sketches import kmv_jaccard, kmv_sketch
    from hfp_loader_spark.operators.text import tokens, word_ngrams

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(word_ngrams(tokens(F.col("text")), 2)).alias("term"),
    )
    sk = kmv_sketch(toks, "source", "term", k=_KMV_K)
    est = kmv_jaccard(sk, "source", k=_KMV_K)
    # three consumers (per-source sizes + both exact-overlap join
    # sides) — lazily pinned so the corpus bigram distinct runs once
    # (optimization r17; value neutral)
    dt = toks.distinct().localCheckpoint(eager=False)
    nd = dt.groupBy("source").agg(F.count("*").alias("n"))
    a = dt.select(F.col("source").alias("ga"), "term")
    b = dt.select(F.col("source").alias("gb"), "term")
    ovl = (
        a.join(b, ["term"])
        .where(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count("*").alias("inter"))
    )
    na = nd.select(F.col("source").alias("ga"), F.col("n").alias("na"))
    nb = nd.select(F.col("source").alias("gb"), F.col("n").alias("nb"))
    return (
        est.join(ovl, ["ga", "gb"], "left")
        .join(na, "ga")
        .join(nb, "gb")
        .select(
            F.col("ga").alias("source_a"),
            F.col("gb").alias("source_b"),
            F.round(
                F.coalesce(F.col("inter"), F.lit(0)).cast("double")
                / (
                    F.col("na") + F.col("nb")
                    - F.coalesce(F.col("inter"), F.lit(0))
                ).cast("double"),
                4,
            ).alias("exact_jaccard"),
            F.round("est_jaccard", 4).alias("est_jaccard"),
        )
    )


@defquery(
    "orders_month_seasonality",
    """
    WITH m AS (
      SELECT CAST(month(o_orderdate) AS INT) AS month,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    t AS (SELECT CAST(sum(cents) AS HUGEINT) AS total FROM m)
    SELECT month,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           round(CAST(sum(cents) AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
             AS revenue_share
    FROM m CROSS JOIN t
    GROUP BY month, t.total
    """,
    doc="Revenue seasonality by calendar month: exact integer-cent "
    "sums, share of annual-cycle revenue per month with one division "
    "— the demand-curve view a forecasting pipeline calibrates "
    "against. A 12-row rollup + a broadcast scalar total.",
)
def orders_month_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _t(spark, sf_dir, "orders").select(
        F.month("o_orderdate").cast("int").alias("month"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    t = m.agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias("total"))
    return (
        m.crossJoin(F.broadcast(t))
        .groupBy("month", "total")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("revenue_cents"),
        )
        .select(
            "month",
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
    "supplier_balance_outliers",
    """
    WITH c AS (
      SELECT s_suppkey, s_name, s_nationkey,
             CAST(round(s_acctbal * 100) AS HUGEINT) AS cents
      FROM supplier
    ),
    ag AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS s1,
             CAST(sum(cents * cents) AS HUGEINT) AS s2
      FROM c
    )
    SELECT s_suppkey, s_name,
           round(CAST(cents AS DOUBLE) / 100.0, 2) AS acctbal
    FROM c CROSS JOIN ag
    WHERE (cents * n - s1) * (cents * n - s1)
          > 4 * (n * s2 - s1 * s1)
    """,
    doc="Account-balance outliers with the ZERO-float decision rule "
    "(operators.relational.integer_sigma_outliers, k=2): "
    "(x·n − Σx)² > k²·(n·Σx² − (Σx)²) over exact integer cents — "
    "no division, sqrt, or rounding anywhere in the flag, so both "
    "engines select identical rows by construction. NOTE (VERDICT r9 "
    "#1): TPC-H balances are uniform, and a uniform variate never "
    "exceeds √3·σ ≈ 1.73σ, so k=2 is structurally empty on this data "
    "shape — the positive path is exercised by the k=1 companion entry "
    "(supplier_balance_outliers_k1, non-empty at every SF) and by the "
    "planted-outlier pytest in tests/test_relational.py. One global-"
    "moment aggregate broadcast back over the scan.",
)
def supplier_balance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import integer_sigma_outliers

    c = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.round(F.col("s_acctbal") * 100).cast("decimal(38,0)").alias("cents"),
    )
    return integer_sigma_outliers(
        c, "cents", ["s_suppkey", "s_name"], k=2
    ).select(
        "s_suppkey",
        "s_name",
        F.round(F.col("cents").cast("double") / F.lit(100.0), 2).alias(
            "acctbal"
        ),
    )


@defquery(
    "supplier_balance_outliers_k1",
    """
    WITH c AS (
      SELECT s_suppkey, s_name,
             CAST(round(s_acctbal * 100) AS HUGEINT) AS cents
      FROM supplier
    ),
    ag AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(cents) AS HUGEINT) AS s1,
             CAST(sum(cents * cents) AS HUGEINT) AS s2
      FROM c
    )
    SELECT s_suppkey, s_name,
           round(CAST(cents AS DOUBLE) / 100.0, 2) AS acctbal
    FROM c CROSS JOIN ag
    WHERE (cents * n - s1) * (cents * n - s1)
          > 1 * (n * s2 - s1 * s1)
    """,
    doc="The k=1 companion to supplier_balance_outliers: |x−mean| > 1σ "
    "selects ~42% of a uniform population (P(|u−½|·√12 > 1) = 1−1/√3), "
    "so this entry is NON-EMPTY at every scale factor — the falsifiable "
    "positive path of the exact integer-sigma rule (VERDICT r9 #1: a "
    "0-row ≡ 0-row match proves only that both engines agree on "
    "nothing). Same zero-float cross-multiplied decision, same single "
    "global-moment aggregate.",
)
def supplier_balance_outliers_k1(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hfp_loader_spark.operators.relational import integer_sigma_outliers

    c = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.round(F.col("s_acctbal") * 100).cast("decimal(38,0)").alias("cents"),
    )
    return integer_sigma_outliers(
        c, "cents", ["s_suppkey", "s_name"], k=1
    ).select(
        "s_suppkey",
        "s_name",
        F.round(F.col("cents").cast("double") / F.lit(100.0), 2).alias(
            "acctbal"
        ),
    )


@defquery(
    "orders_basket_brand_rules",
    """
    WITH ob AS (
      -- NULL baskets/items dropped exactly as the operator drops them
      SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS item
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_orderkey IS NOT NULL AND p.p_brand IS NOT NULL
    ),
    n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM ob),
    items AS (SELECT item, CAST(count(*) AS BIGINT) AS ni
              FROM ob GROUP BY item),
    pairs AS (
      SELECT a.item AS item_a, bb.item AS item_b,
             CAST(count(*) AS BIGINT) AS n_ab
      FROM ob a JOIN ob bb ON a.b = bb.b AND a.item < bb.item
      GROUP BY 1, 2
    )
    SELECT item_a, item_b, n_ab,
           round(CAST(n_ab AS DOUBLE) / nb, 6)              AS support,
           round(CAST(n_ab AS DOUBLE) / ia.ni, 6)           AS conf_a_b,
           round(CAST(n_ab AS DOUBLE) / ib.ni, 6)           AS conf_b_a,
           round(CAST(nb AS DOUBLE) * n_ab / (ia.ni * ib.ni), 6) AS lift
    FROM pairs
    JOIN items ia ON ia.item = pairs.item_a
    JOIN items ib ON ib.item = pairs.item_b
    CROSS JOIN n
    """,
    doc="Market-basket association rules over order baskets of part "
    "brands (operators.relational.association_rules): per unordered "
    "brand pair, co-occurrence count, support, both conditional "
    "confidences, and lift — the assortment/cross-sell screen. The "
    "Spark side groups each order into a sorted DISTINCT-brand array "
    "and expands pairs IN-ROW (≤ C(items-per-basket, 2) per order, "
    "never a basket self-join), then one bounded pair-count shuffle; "
    "the oracle states the same statistics via the plain self-join. "
    "Output bounded by the 25-brand domain: ≤ 300 rows at any SF.",
)
def orders_basket_brand_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import association_rules

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = li.join(part, li.l_partkey == part.p_partkey).select(
        "l_orderkey", "p_brand"
    )
    return association_rules(ob, "l_orderkey", "p_brand")


@defquery(
    "orders_price_mad_outliers",
    """
    WITH c AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    m AS (SELECT quantile_cont(cents, 0.5) * 2.0 AS m2 FROM c),
    d AS (
      SELECT o_orderkey, cents,
             abs(2.0 * cents - m.m2) AS d2
      FROM c CROSS JOIN m
    ),
    s AS (SELECT quantile_cont(d2, 0.5) * 2.0 AS m4 FROM d)
    SELECT o_orderkey, cents
    FROM d CROSS JOIN s
    WHERE d2 * 20.0 > 19.0 * s.m4
    """,
    doc="Robust order-price outliers by median/MAD with an exact "
    "integer-comparison rule (operators.relational.mad_outliers, "
    "k = 1.9): |x − med| > 1.9·MAD over integer cents — the median is "
    "integer-or-half so 2·x − 2·med and 2·(2·MAD) are integer-valued "
    "doubles and the 20·d2 > 19·m4 comparison is exact on both "
    "engines. The 50%-breakdown sibling of the sigma rule (which a "
    "heavy contamination inflates into silence); on TPC-H's uniform "
    "prices the flag fires on the P(dev > 1.9·MAD) = 1 − 1.9/2 = 5% "
    "tails, so the entry is NON-EMPTY at every SF — falsifiable by "
    "construction. Two exact percentile aggregates + broadcast "
    "scalars; at 100 TB the percentiles swap to t-digest/qhist with "
    "the same plan shape.",
)
def orders_price_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import mad_outliers

    c = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return mad_outliers(c, "cents", ["o_orderkey"], k_tenths=19)


@defquery(
    "plan_join_strategy_orders_customer",
    """
    SELECT 'broadcast' AS strategy,
           (SELECT CAST(count(*) AS BIGINT) FROM customer) AS dim_rows,
           TRUE AS broadcast_eligible
    """,
    doc="The pre-flight join planner surfaced as a checked entry "
    "(operators.relational.choose_join_strategy): plan orders ⋈ "
    "customer and report the decision — at every tested SF the "
    "customer dim sits under the 500k-row broadcast ceiling, so the "
    "planner short-circuits to 'broadcast' after ONE bounded count "
    "and the oracle can state the decision exactly (the skew/CMS "
    "branches only engage past the ceiling — sf ≳ 3.3 — where a "
    "driver gate never runs). The planner's decision dict is the "
    "audit line a 100 TB pipeline logs next to its chosen plan; this "
    "entry keeps the instrument itself inside the correctness gate.",
)
def plan_join_strategy_orders_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from hfp_loader_spark.operators.relational import choose_join_strategy

    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    _, decision = choose_join_strategy(orders, cust, ["o_custkey"])
    return spark.createDataFrame(
        [
            (
                decision["strategy"],
                decision["dim_rows"],
                decision["dim_rows"] <= 500_000,
            )
        ],
        "strategy string, dim_rows long, broadcast_eligible boolean",
    )
