"""Core relational query catalog (SURVEY §2.11 "core relational" row).

Broadcast/shuffle joins, hash aggregates, rollup/cube, exact and approximate
distinct counts, ranking/lag/lead windows, top-k, and set operations over the
driver's TPC-H-ish tables — each paired with a DuckDB oracle.

Scale notes (the plans you'd want at 100 TB):
- dimension joins (region/nation/customer-sized) broadcast explicitly, so the
  fact table never shuffles for them;
- every aggregate is a plain ``groupBy().agg()`` → Catalyst plans partial
  (map-side) aggregation before the exchange;
- top-k is ``orderBy().limit()`` → TakeOrderedAndProject (per-task k-row
  heaps, driver merge, no global sort) or window row_number ≤ k with a
  per-partition local sort;
- all rankings are tiebroken on a unique key and rank on *rounded* measures
  so results are deterministic across engines and parallelism levels.

Cross-engine hash-match conventions (see catalog.py docstring): float
aggregates rounded on both sides, DuckDB ``sum(int)`` HUGEINT cast to BIGINT,
timestamps/dates stringified on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hfp_loader_spark.operators.relational import (
    anti_join,
    broadcast_join,
    global_top_k,
    top_k_per_group,
)
from hfp_loader_spark.plans import money as _m
from hfp_loader_spark.plans.catalog import _t, defquery


@defquery(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_m.sql_qty_sum("l_quantity")} AS sum_qty,
           {_m.sql_money_sum("l_extendedprice")} AS sum_base_price,
           {_m.sql_disc_rev_sum("l_extendedprice", "l_discount")}
             AS sum_disc_price,
           {_m.sql_charge_sum("l_extendedprice", "l_discount", "l_tax")}
             AS sum_charge,
           {_m.sql_qty_avg("l_quantity")} AS avg_qty,
           {_m.sql_money_avg("l_extendedprice")} AS avg_price,
           {_m.sql_pct_avg("l_discount")} AS avg_disc,
           CAST(count(*) AS BIGINT)             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: filtered scan → partial+final hash agg. "
    "Flagship query; the big exchange stays on the tiny (group, input-"
    "partition) partials. Money/qty sums run EXACT in 128-bit integer "
    "cents (plans.money — r13: a double sum is summation-order-"
    "dependent and a 2dp rounding of a ~1e9 total demands more relative "
    "agreement than the engines' differing sum orders give at scale), "
    "two-tier since r14: long partials per input partition, one "
    "decimal(38,0) sum over partials — the per-row decimal cast was "
    "2.8× of q1's wall (VERDICT r13 #2); averages derive from the same "
    "exact sums via correctly-rounded divisions.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.plans.catalog import load_table

    # shipdate filter rewritten into the raw scan domain → PushedFilters
    # (see load_table docstring; asserted in tests/test_plans.py)
    li = load_table(
        spark,
        sf_dir,
        "lineitem",
        ts_pushdown=[("l_shipdate", "<=", "1998-09-02")],
    )
    return _m.two_tier_group_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            _m.agg_qty_sum("sum_qty", F.col("l_quantity"), slot="qty"),
            _m.agg_money_sum(
                "sum_base_price", F.col("l_extendedprice"), slot="price"
            ),
            _m.agg_disc_rev_sum(
                "sum_disc_price",
                F.col("l_extendedprice"),
                F.col("l_discount"),
            ),
            _m.agg_charge_sum(
                "sum_charge",
                F.col("l_extendedprice"),
                F.col("l_discount"),
                F.col("l_tax"),
            ),
            _m.agg_qty_avg("avg_qty", F.col("l_quantity"), slot="qty"),
            _m.agg_money_avg(
                "avg_price", F.col("l_extendedprice"), slot="price"
            ),
            _m.agg_pct_avg("avg_disc", F.col("l_discount")),
            _m.agg_count("count_order"),
        ],
    )


@defquery(
    "q5_local_supplier_revenue",
    f"""
    SELECT n.n_name,
           {_m.sql_disc_rev_sum("l.l_extendedprice", "l.l_discount")}
             AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-like local-supplier revenue: 6-table join. The fixed-size "
    "region→nation chain broadcasts onto supplier; the region-filtered "
    "supplier side is SF-proportional, so it carries NO forced hint — AQE "
    "broadcasts it at gate scale and falls back to a shuffled hash join "
    "at 100 TB instead of failing on the 8 GB broadcast cap. The only "
    "guaranteed fact-fact shuffle is lineitem⋈orders⋈customer on their "
    "keys; the c_nationkey = s_nationkey residual rides the join "
    "condition — no extra exchange.",
)
def q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    asia_nations = broadcast_join(
        nation, region, nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = broadcast_join(
        _t(spark, sf_dir, "supplier"),
        asia_nations,
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
    )
    # two-tier exact sum (r14): 5 nation groups over an ASIA-filtered
    # lineitem-scale join output — the long partials drop the per-row
    # decimal cast from the join-output pass; values identical
    return _m.two_tier_group_agg(
        joined.select("n_name", "l_extendedprice", "l_discount"),
        ["n_name"],
        [
            _m.agg_disc_rev_sum(
                "revenue", F.col("l_extendedprice"), F.col("l_discount")
            )
        ],
    )


@defquery(
    "q14_promo_revenue",
    f"""
    -- both sums EXACT in integer cents*100; the share is a ratio of the
    -- two exact sums cast to double — no order-dependent double sums
    SELECT round(100.00 * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                  THEN {_m.sql_disc_rev_term("l.l_extendedprice", "l.l_discount")}
                  ELSE 0 END) AS DOUBLE)
             / CAST(sum({_m.sql_disc_rev_term("l.l_extendedprice", "l.l_discount")})
                    AS DOUBLE), 4) + 0.0 AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
      AND l.l_shipdate <  TIMESTAMP '1995-10-01'
    """,
    doc="TPC-H Q14-like promotion revenue share: date-pruned lineitem scan "
    "(shipdate predicate pushed into the parquet reader via the raw-domain "
    "rewrite) ⋈ part (no forced hint — part is SF-proportional, AQE "
    "broadcasts at gate scale only), conditional aggregate to a single "
    "row.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.plans.catalog import load_table

    li = load_table(
        spark,
        sf_dir,
        "lineitem",
        ts_pushdown=[
            ("l_shipdate", ">=", "1995-09-01"),
            ("l_shipdate", "<", "1995-10-01"),
        ],
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    dec = "decimal(38,0)"
    disc = _m.disc_rev_term(F.col("l_extendedprice"), F.col("l_discount"))
    # ``part`` is SF-proportional — no forced broadcast; AQE picks
    # broadcast at gate scale, shuffled hash join at 100 TB.
    joined = li.select("l_partkey", "l_extendedprice", "l_discount").join(
        part, F.col("l_partkey") == F.col("p_partkey")
    )
    return joined.agg(
        (
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type").startswith("PROMO"), disc)
                    .otherwise(F.lit(0))
                    .cast(dec)
                ).cast("double")
                / F.sum(disc.cast(dec)).cast("double"),
                4,
            )
            + F.lit(0.0)
        ).alias("promo_revenue_pct"),
        F.count("*").alias("n_lineitems"),
    )


@defquery(
    "q3_top_unshipped_orders",
    f"""
    SELECT l.l_orderkey AS o_orderkey,
           {_m.sql_disc_rev_sum("l.l_extendedprice", "l.l_discount")}
             AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND l.l_shipdate > o.o_orderdate
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-like shipping priority: 3-way join (customer side "
    "broadcast-able) → hash agg → global top-k via TakeOrderedAndProject.",
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # Segment-filtered customer is still SF-proportional — AQE decides.
    joined = orders.join(
        cust.select("c_custkey"), orders.o_custkey == F.col("c_custkey")
    ).join(li, li.l_orderkey == orders.o_orderkey)
    agg = (
        joined.where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy(F.col("l_orderkey").alias("o_orderkey"), "o_orderdate")
        .agg(
            # exact cents: revenue is also the top-k ORDER BY key, so an
            # ulp flip would change top-10 membership, not just a digit
            _m.disc_rev_sum(
                F.col("l_extendedprice"), F.col("l_discount")
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )
    return global_top_k(agg, [F.desc("revenue"), F.asc("o_orderkey")], 10)


@defquery(
    "join_region_rollup",
    f"""
    SELECT coalesce(r.r_name, '<all>') AS region_name,
           coalesce(n.n_name, '<all>') AS nation_name,
           CAST(count(c.c_custkey) AS BIGINT) AS n_customers,
           {_m.sql_money_sum("coalesce(c.c_acctbal, 0)")} AS total_acctbal
    FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="Broadcast dim join (region, nation ≤ 25 rows) + ROLLUP hierarchy "
    "aggregate. Fact table shuffles once, for the grouping only.",
)
def join_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    joined = broadcast_join(
        broadcast_join(cust, nat, cust.c_nationkey == nat.n_nationkey),
        reg,
        nat.n_regionkey == reg.r_regionkey,
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("c_custkey").alias("n_customers"),
            _m.money_sum(F.coalesce(F.col("c_acctbal"), F.lit(0.0))).alias(
                "total_acctbal"
            ),
        )
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region_name"),
            F.coalesce("n_name", F.lit("<all>")).alias("nation_name"),
            "n_customers",
            "total_acctbal",
        )
    )


@defquery(
    "agg_cube_orders",
    f"""
    SELECT coalesce(o_orderstatus, '<all>')   AS orderstatus,
           coalesce(o_orderpriority, '<all>') AS orderpriority,
           CAST(count(*) AS BIGINT)           AS n_orders,
           {_m.sql_money_sum("o_totalprice")} AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two low-cardinality dims: Spark expands grouping sets "
    "before the single shuffle; map-side partial aggs keep it cheap.",
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            _m.money_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("orderpriority"),
            "n_orders",
            "total_price",
        )
    )


@defquery(
    "agg_exact_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact multi-column distinct counts: Catalyst plans expand + "
    "two-phase aggregate; the scale-path alternative is "
    "approx_count_distinct (see agg_approx_distinct, rows-only).",
)
def agg_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@defquery(
    "agg_approx_distinct",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
           TRUE AS parts_within_5pct,
           TRUE AS supps_within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_count_distinct (HyperLogLog++, rsd=0.01) per returnflag — "
    "the 100 TB path for distinct counts: one pass, fixed memory, no "
    "expand. HLL sketches differ across engines, so the oracle is a "
    "tolerance band (VERDICT r3 #9): the Spark side emits exact distinct "
    "counts plus booleans asserting |approx-exact| ≤ 5%·exact; the "
    "oracle emits the same exact counts with TRUE — a hash match PROVES "
    "the sketch landed inside the band. The exact countDistincts exist "
    "for verification only; a production caller would project the "
    "approx_count_distinct aggregates directly (they are computed here "
    "and consumed by the band check).",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    within = lambda approx, exact: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) <= 0.05 * F.col(exact)
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.countDistinct("l_suppkey").alias("exact_supps"),
            F.approx_count_distinct("l_partkey", rsd=0.01).alias("_ap"),
            F.approx_count_distinct("l_suppkey", rsd=0.01).alias("_as"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            "exact_supps",
            within("_ap", "exact_parts").alias("parts_within_5pct"),
            within("_as", "exact_supps").alias("supps_within_5pct"),
        )
    )


@defquery(
    "agg_monthly_orders",
    f"""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           CAST(count(*) AS BIGINT)    AS n_orders,
           {_m.sql_money_sum("o_totalprice")} AS total_price,
           {_m.sql_money_avg("o_totalprice")} AS avg_price
    FROM orders
    GROUP BY 1
    """,
    doc="Time-bucketed aggregate (date_trunc month). At scale this keys the "
    "natural partition layout (month) so the shuffle is pruning-friendly. "
    "Two-tier exact money since r15 (VERDICT r14 #7): ~84 month groups "
    "over the whole orders table is exactly the low-cardinality-over-"
    "large-input shape two_tier_group_agg is scoped to; sum and avg "
    "share one long cents partial per (month, input partition).",
)
def agg_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    months = _t(spark, sf_dir, "orders").select(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month"
        ),
        "o_totalprice",
    )
    return _m.two_tier_group_agg(
        months,
        ["order_month"],
        [
            _m.agg_count("n_orders"),
            _m.agg_money_sum(
                "total_price", F.col("o_totalprice"), slot="price"
            ),
            _m.agg_money_avg(
                "avg_price", F.col("o_totalprice"), slot="price"
            ),
        ],
    )


@defquery(
    "window_topk_per_nation",
    """
    SELECT n_name, c_custkey, round(c_acctbal, 2) AS acctbal, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT n.n_name, c.c_custkey, c.c_acctbal,
             row_number() OVER (PARTITION BY n.n_name
                                ORDER BY round(c.c_acctbal, 2) DESC, c.c_custkey) AS rn
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    WHERE rn <= 3
    """,
    doc="Top-k per group: row_number over (rounded measure, unique "
    "tiebreaker). One shuffle on the partition key; local sorts only.",
)
def window_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    joined = broadcast_join(cust, nat, cust.c_nationkey == nat.n_nationkey).select(
        "n_name", "c_custkey", F.round("c_acctbal", 2).alias("acctbal")
    )
    return top_k_per_group(
        joined,
        ["n_name"],
        [F.desc("acctbal"), F.asc("c_custkey")],
        3,
    ).select("n_name", "c_custkey", "acctbal", F.col("rn").cast("long").alias("rn"))


@defquery(
    "window_lag_lead_running",
    """
    SELECT user_id, event_id,
           round(value, 4)                         AS value,
           round(coalesce(lag(value)  OVER w, 0), 4) AS prev_value,
           round(coalesce(lead(value) OVER w, 0), 4) AS next_value,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Analytic windows (lag/lead/running sum) per user ordered by event "
    "time with unique tiebreaker. All three frames share one shuffle+sort.",
)
def window_lag_lead_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round("value", 4).alias("value"),
        F.round(F.coalesce(F.lag("value").over(w), F.lit(0)), 4).alias("prev_value"),
        F.round(F.coalesce(F.lead("value").over(w), F.lit(0)), 4).alias("next_value"),
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_sum"),
    )


@defquery(
    "set_ops_custkeys",
    """
    SELECT CAST(c AS BIGINT) AS n_custkeys, label FROM (
      SELECT count(*) AS c, 'both_O_and_F' AS label FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      UNION ALL
      SELECT count(*) AS c, 'O_not_F' AS label FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    )
    """,
    doc="Set operations (INTERSECT / EXCEPT distinct) between key scans, "
    "summarized to counts. Spark plans these as aggregate+join — no "
    "driver-side set materialization (contrast reference hfpTask.ts:105).",
)
def set_ops_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    o_keys = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    f_keys = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    both = (
        o_keys.intersect(f_keys)
        .agg(F.count("*").alias("n_custkeys"))
        .select("n_custkeys", F.lit("both_O_and_F").alias("label"))
    )
    only_o = (
        o_keys.subtract(f_keys)  # EXCEPT (distinct set difference)
        .agg(F.count("*").alias("n_custkeys"))
        .select("n_custkeys", F.lit("O_not_F").alias("label"))
    )
    return both.unionByName(only_o)


@defquery(
    "anti_join_customers_no_orders",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    doc="LEFT ANTI join (NOT EXISTS) — the same primitive as the HFP dedup "
    "J1 (SURVEY §2.3): customers with no urgent order, then aggregated.",
)
def anti_join_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        anti_join(cust, urgent, cust.c_custkey == F.col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@defquery(
    "global_topk_orders",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice, o_orderpriority
    FROM orders
    ORDER BY round(o_totalprice, 2) DESC, o_orderkey
    LIMIT 15
    """,
    doc="Global ORDER BY + LIMIT → TakeOrderedAndProject: per-task k-heaps, "
    "driver merge; no full sort at any scale.",
)
def global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        "o_orderpriority",
    )
    return global_top_k(orders, [F.desc("totalprice"), F.asc("o_orderkey")], 15)


@defquery(
    "window_rank_dense",
    """
    SELECT n_name, c_custkey, acctbal,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk
    FROM (
      SELECT n.n_name, c.c_custkey, round(c.c_acctbal, 0) AS acctbal
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    WINDOW w AS (PARTITION BY n_name ORDER BY acctbal DESC)
    QUALIFY rank() OVER w <= 5
    """,
    doc="rank/dense_rank with genuine ties (acctbal rounded to integers): "
    "gap vs no-gap ranking semantics, deterministic because equal inputs "
    "get equal ranks. Same single-shuffle window shape as top-k.",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    joined = broadcast_join(cust, nat, cust.c_nationkey == nat.n_nationkey).select(
        "n_name", "c_custkey", F.round("c_acctbal", 0).alias("acctbal")
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("acctbal"))
    return (
        joined.withColumn("rnk", F.rank().over(w).cast("long"))
        .withColumn("drnk", F.dense_rank().over(w).cast("long"))
        .where(F.col("rnk") <= 5)
    )


@defquery(
    "window_range_trailing",
    """
    SELECT user_id, event_id,
           CAST(count(*) OVER w AS BIGINT)  AS n_last_10min,
           round(sum(value) OVER w, 2)      AS sum_last_10min
    FROM (SELECT user_id, event_id, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
          FROM events WHERE user_id < 30)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                 RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
    """,
    doc="RANGE frame (trailing 10 minutes by event time, not row count): "
    "value-based window bounds over epoch seconds — the sliding-metric "
    "primitive. One shuffle + sort per user partition.",
)
def window_range_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id") < 30)
        .select(
            "user_id",
            "event_id",
            "value",
            F.col("ts").cast("long").alias("ts_sec"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-600, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w).cast("long").alias("n_last_10min"),
        F.round(F.sum("value").over(w), 2).alias("sum_last_10min"),
    )


@defquery(
    "q17_small_quantity_avg",
    f"""
    SELECT p.p_brand,
           {_m.sql_money_sum("l.l_extendedprice")} AS total_price,
           CAST(count(*) AS BIGINT)         AS n_items
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < (
      SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p.p_brand
    """,
    doc="TPC-H Q17-like correlated scalar subquery: Catalyst decorrelates "
    "it into an aggregate + equi-join (no per-row re-scan). The per-part "
    "avg side is a partial-agg shuffle on the join key.",
)
def q17_small_quantity_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    small = li.join(per_part, li.l_partkey == F.col("pk")).where(
        F.col("l_quantity") < F.col("half_avg_qty")
    )
    return (
        small.join(part, small.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            _m.money_sum(F.col("l_extendedprice")).alias("total_price"),
            F.count("*").alias("n_items"),
        )
    )


@defquery(
    "agg_percentiles",
    """
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(max(o_totalprice), 2)                AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Exact interpolated percentiles (median/p90) per group — Spark "
    "``percentile`` ≡ DuckDB ``quantile_cont``. The 100 TB path swaps in "
    "approx_percentile (t-digest) the same way approx_count_distinct "
    "replaces exact distinct.",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", 0.5), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", 0.9), 4).alias("p90"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


@defquery(
    "sessionize_islands",
    """
    WITH marked AS (
      SELECT user_id, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(sum(new_session) OVER (PARTITION BY user_id
                ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
    FROM marked
    """,
    doc="Batch sessionization via the lag+cumsum islands operator "
    "(operators.relational.sessionize, 30 min gap): both window passes "
    "share one exchange on user_id. The batch twin of session_window.",
)
def sessionize_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import sessionize

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    out = sessionize(ev, "user_id", "ts", gap_seconds=1800)
    return out.select(
        "user_id", "event_id", F.col("session_id").cast("long").alias("session_id")
    )


@defquery(
    "json_extract_stats",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT)                          AS n_events,
           CAST(sum(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
           -- tie-free integer half-up (integer-quotient average)
           {_m._sql_int_avg(
               "sum(CAST(CAST(props->>'$.k' AS INTEGER) AS HUGEINT))",
               4, 1, count_sql="count(props->>'$.k')")}
             AS avg_k
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured extraction: JSON path into the props column "
    "(get_json_object ≡ DuckDB ->>), typed cast, aggregate. The JSON "
    "probe is a narrow projection fused into the scan.",
)
def json_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").cast("long").alias("sum_k"),
            _m._int_avg(
                F.sum(F.col("k").cast("decimal(38,0)")),
                F.count("k"),
                4,
                1,
            ).alias("avg_k"),
        )
    )


@defquery(
    "agg_grouping_sets",
    """
    SELECT coalesce(o_orderstatus, '<all>')   AS orderstatus,
           coalesce(o_orderpriority, '<all>') AS orderpriority,
           CAST(count(*) AS BIGINT)           AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS (neither rollup nor cube): two 1-D "
    "marginals + grand total in ONE pass — Spark expands the sets before "
    "a single shuffle instead of three separate aggregates.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # views are registered by the defquery wrapper → plain Spark SQL
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, '<all>')   AS orderstatus,
               coalesce(o_orderpriority, '<all>') AS orderpriority,
               CAST(count(*) AS BIGINT)           AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@defquery(
    "asof_join_latest_event",
    """
    WITH probes AS (
      SELECT event_id AS probe_id, user_id,
             ts + INTERVAL '30 seconds' AS probe_ts
      FROM events WHERE event_id % 97 = 0
    )
    SELECT p.probe_id, p.user_id,
           e.event_id AS matched_event_id,
           round(e.value, 4) AS matched_value
    FROM probes p
    ASOF JOIN events e
      ON p.user_id = e.user_id AND p.probe_ts >= e.ts
    """,
    doc="AS-OF join (Spark has none built in): latest event per key at or "
    "before each probe time, composed as union + one (key, ts) sort + "
    "carry-forward last() — sort-merge cost, no inequality-join pair "
    "blowup. Oracle: DuckDB's native ASOF JOIN.",
)
def asof_join_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import asof_join

    ev = _t(spark, sf_dir, "events")
    probes = ev.where(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("probe_id"),
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 30 SECONDS")).alias("probe_ts"),
    )
    events_side = ev.select(
        "user_id", "ts", F.col("event_id").alias("matched_event_id"),
        F.round("value", 4).alias("matched_value"),
    )
    out = asof_join(
        probes,
        events_side,
        key="user_id",
        probe_ts="probe_ts",
        event_ts="ts",
        event_cols=["matched_event_id", "matched_value"],
    )
    return out.select("probe_id", "user_id", "matched_event_id", "matched_value")


@defquery(
    "range_join_interval_counts",
    """
    WITH intervals AS (
      SELECT event_id AS interval_id, user_id,
             ts AS start_ts, ts + INTERVAL '15 minutes' AS end_ts
      FROM events WHERE event_id % 131 = 0
    )
    SELECT i.interval_id,
           CAST(count(*) AS BIGINT)  AS n_events,
           round(sum(e.value), 2)    AS total_value
    FROM intervals i JOIN events e
      ON i.user_id = e.user_id
     AND e.ts BETWEEN i.start_ts AND i.end_ts
    GROUP BY i.interval_id
    """,
    doc="Range join (interval containment) via time-bucketing: intervals "
    "explode to overlapped buckets, events hash to theirs, equi-join on "
    "(key, bucket) + exact BETWEEN refine — no BroadcastNestedLoopJoin, "
    "shuffle ∝ rows × overlap factor. Oracle: DuckDB inequality join.",
)
def range_join_interval_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.relational import bucketed_interval_join

    ev = _t(spark, sf_dir, "events")
    intervals = ev.where(F.col("event_id") % 131 == 0).select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("end_ts"),
    )
    joined = bucketed_interval_join(
        intervals,
        ev.select("user_id", "ts", "value"),
        key="user_id",
        start_col="start_ts",
        end_col="end_ts",
        ts_col="ts",
        bucket_seconds=900,
    )
    return joined.groupBy("interval_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@defquery(
    "agg_approx_percentile",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 2)  AS p50_exact,
           round(quantile_cont(o_totalprice, 0.9), 2)  AS p90_exact,
           round(quantile_cont(o_totalprice, 0.99), 2) AS p99_exact,
           TRUE AS p50_within_5pct,
           TRUE AS p90_within_5pct,
           TRUE AS p99_within_5pct
    FROM orders GROUP BY o_orderstatus
    """,
    doc="approx_percentile (p50/p90/p99 of o_totalprice per orderstatus, "
    "accuracy 10000) — the 100 TB quantile path: one pass, bounded "
    "memory, mergeable sketches, vs the exact sort-based percentile "
    "(agg_percentiles). GK sketch internals differ across engines, so "
    "the oracle is a tolerance band (VERDICT r3 #9): exact continuous "
    "percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`, both "
    "linear-interpolated) anchor the rows, booleans assert the sketch "
    "landed within 5% of each.",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    within = lambda approx, exact: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) <= 0.05 * F.abs(F.col(exact))
    )
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            *[
                F.expr(f"percentile(o_totalprice, {q})").alias(f"_e{tag}")
                for tag, q in (("50", 0.5), ("90", 0.9), ("99", 0.99))
            ],
            *[
                F.percentile_approx("o_totalprice", q, 10000).alias(f"_a{tag}")
                for tag, q in (("50", 0.5), ("90", 0.9), ("99", 0.99))
            ],
        )
        .select(
            "o_orderstatus",
            *[F.round(f"_e{t}", 2).alias(f"p{t}_exact") for t in ("50", "90", "99")],
            *[
                within(f"_a{t}", f"_e{t}").alias(f"p{t}_within_5pct")
                for t in ("50", "90", "99")
            ],
        )
    )


@defquery(
    "dq_constraint_report",
    """
    SELECT 'o_custkey_not_null' AS check_name,
           CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_positive',
           CAST(count(*) FILTER (WHERE NOT coalesce(o_totalprice > 0.0,
                                                    FALSE)) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate_in_range',
           CAST(count(*) FILTER (WHERE NOT coalesce(
             o_orderdate >= TIMESTAMP '1990-01-01'
             AND o_orderdate < TIMESTAMP '2010-01-01', FALSE)) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderkey_unique',
           CAST(coalesce(sum(n - 1), 0) AS BIGINT)
    FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey
          HAVING count(*) > 1)
    UNION ALL
    SELECT 'orders_custkey_fk',
           CAST(count(*) AS BIGINT)
    FROM orders o
    WHERE o.o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
    """,
    doc="Declarative data-quality gate (operators.quality.run_constraints): "
    "not-null, range, and positivity checks compile into ONE conditional-"
    "aggregate pass over orders (stack()-pivoted to a tall report); "
    "uniqueness counts excess rows per duplicated key; the FK check is a "
    "key-only broadcast anti-join against customer. The publish gate a "
    "100 TB pipeline runs before promoting a snapshot.",
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.quality import (
        ConstraintSuite,
        ForeignKey,
        run_constraints,
    )

    orders = _t(spark, sf_dir, "orders")
    suite = ConstraintSuite(
        not_null={"o_custkey_not_null": "o_custkey"},
        unique={"o_orderkey_unique": ["o_orderkey"]},
        checks={
            "o_totalprice_positive": F.col("o_totalprice") > 0.0,
            "o_orderdate_in_range": (
                F.col("o_orderdate") >= F.lit("1990-01-01").cast("timestamp")
            )
            & (F.col("o_orderdate") < F.lit("2010-01-01").cast("timestamp")),
        },
        foreign_keys=[
            ForeignKey(
                "orders_custkey_fk",
                "o_custkey",
                _t(spark, sf_dir, "customer"),
                "c_custkey",
            )
        ],
    )
    return run_constraints(orders, suite)


@defquery(
    "window_first_last_nth",
    """
    SELECT o_orderkey, o_custkey,
           round(first_value(o_totalprice) OVER w, 2)  AS first_price,
           round(last_value(o_totalprice)
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING), 2) AS last_price,
           round(nth_value(o_totalprice, 2) OVER w, 2)  AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="first_value / last_value / nth_value per customer order history "
    "(tiebroken on the unique key). last_value gets the full-partition "
    "frame explicitly — the default running frame is the classic "
    "gotcha on both engines, pinned identically here. One shuffle + one "
    "sort serves all three.",
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w_full), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
    )


@defquery(
    "agg_heavy_hitters",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS exact_count
    FROM events GROUP BY event_type
    HAVING count(*) > 0.05 * (SELECT count(*) FROM events)
    ORDER BY event_type
    """,
    doc="Heavy hitters via DataFrame.stat.freqItems (Misra-Gries, "
    "support 5%): single-pass, fixed memory, mergeable across "
    "partitions — the 100 TB path for 'which keys dominate' (skew "
    "diagnosis, hot-key salting decisions). The raw support set may "
    "carry engine-specific false positives, so the emitted result is "
    "the support set FILTERED by exact frequency > support — which is "
    "exactly the true heavy-hitter set IFF Misra-Gries' no-false-"
    "negative guarantee holds, making it oracle-checkable against the "
    "plain HAVING query (VERDICT r3 #9): a missed true hitter on the "
    "Spark side is a row-count mismatch.",
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    freq = ev.select("event_type").stat.freqItems(["event_type"], support=0.05)
    support_set = freq.select(
        F.explode("event_type_freqItems").alias("event_type")
    )
    counts = ev.groupBy("event_type").agg(F.count("*").alias("exact_count"))
    total = ev.agg(F.count("*").alias("_total"))
    return (
        support_set.join(F.broadcast(counts), "event_type")
        .crossJoin(F.broadcast(total))
        .where(F.col("exact_count") > 0.05 * F.col("_total"))
        .select("event_type", "exact_count")
        .orderBy("event_type")
    )


@defquery(
    "set_ops_all_variants",
    """
    SELECT CAST(c AS BIGINT) AS n_rows, label FROM (
      SELECT count(*) AS c, 'intersect_all' AS label FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      UNION ALL
      SELECT count(*) AS c, 'except_all' AS label FROM (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    )
    """,
    doc="Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): multiplicity "
    "min / saturating difference per key. Spark plans both as a single "
    "count-per-key aggregate pair + join — multiplicities travel as "
    "counts, never replicated rows, so a key duplicated a million times "
    "costs one row in the shuffle.",
)
def set_ops_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    o_keys = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    f_keys = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    ia = (
        o_keys.intersectAll(f_keys)
        .agg(F.count("*").alias("n_rows"))
        .select("n_rows", F.lit("intersect_all").alias("label"))
    )
    ea = (
        o_keys.exceptAll(f_keys)
        .agg(F.count("*").alias("n_rows"))
        .select("n_rows", F.lit("except_all").alias("label"))
    )
    return ia.unionByName(ea)


@defquery(
    "dq_column_profile_orders",
    """
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders)
    SELECT p.column, n.n_rows, p.n_nulls, p.ndv, p.min_value, p.max_value
    FROM n, (
      SELECT 'o_orderkey' AS column,
             CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT) AS n_nulls,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS ndv,
             CAST(min(o_orderkey) AS VARCHAR) AS min_value,
             CAST(max(o_orderkey) AS VARCHAR) AS max_value
      FROM orders
      UNION ALL
      SELECT 'o_custkey',
             CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT),
             CAST(count(DISTINCT o_custkey) AS BIGINT),
             CAST(min(o_custkey) AS VARCHAR),
             CAST(max(o_custkey) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus',
             CAST(count(*) FILTER (o_orderstatus IS NULL) AS BIGINT),
             CAST(count(DISTINCT o_orderstatus) AS BIGINT),
             CAST(min(o_orderstatus) AS VARCHAR),
             CAST(max(o_orderstatus) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority',
             CAST(count(*) FILTER (o_orderpriority IS NULL) AS BIGINT),
             CAST(count(DISTINCT o_orderpriority) AS BIGINT),
             CAST(min(o_orderpriority) AS VARCHAR),
             CAST(max(o_orderpriority) AS VARCHAR)
      FROM orders
    ) p
    """,
    doc="ANALYZE-style column profile (operators.quality.profile_columns) "
    "over four orders columns: per column, row/NULL/exact-distinct "
    "counts and stringified min/max in ONE scan — the stats a "
    "cost-based planner, a data contract, or a bucket/z-order layout "
    "decision feeds on (and the exact twin of what "
    "choose_join_strategy's instruments estimate). At 100 TB the "
    "count_distincts swap to approx_count_distinct with the same "
    "output shape. Timestamp columns are excluded from the entry only "
    "because engines stringify timestamps differently — the operator "
    "itself profiles any column.",
)
def dq_column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.operators.quality import profile_columns

    return profile_columns(
        _t(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    )
