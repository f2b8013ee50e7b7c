"""TPC-H breadth tier two: Q6/Q7/Q8/Q9/Q11/Q15/Q16/Q20 shapes adapted to the
driver's simplified star schema (no partsupp table, lineitem has shipdate
only — adaptations noted per query).

What each adds over core_relational/relational_extra:

- Q6: the pure scan-aggregate — every predicate reaches PushedFilters, no
  join, no wide shuffle; the canonical "is pushdown working" probe.
- Q7: four-way join with TWO independent broadcast dims of the same table
  (nation twice under different roles) + year extraction grouping.
- Q8: conditional aggregation (market share = sum(CASE)/sum) over a
  region-filtered six-table join.
- Q9: profit rollup with a LIKE filter crossing a broadcast join.
- Q11: HAVING against an uncorrelated scalar aggregate (group share of a
  global total) — post-agg filter against a broadcast 1-row subquery.
- Q15: window-max over an aggregate (top revenue supplier(s), ties kept)
  — the view+scalar-subquery classic as one shuffle + one broadcast.
- Q16: NOT IN (anti-join) feeding a count(DISTINCT) aggregate.
- Q20: two-level nested semi-join chain (suppliers → qualifying shipments).

All dates land in the synthetic data's 1995-2001 range; revenue/profit
formulas follow TPC-H's l_extendedprice * (1 - l_discount).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hfp_loader_spark.operators.relational import anti_join
from hfp_loader_spark.plans import money as _m
from hfp_loader_spark.plans.catalog import _t, defquery, load_table

_REV = "l.l_extendedprice * (1 - l.l_discount)"


@defquery(
    "q6_forecast_revenue",
    f"""
    SELECT {_m.sql_plain_disc_sum("l.l_extendedprice", "l.l_discount")}
             AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
      AND l.l_discount BETWEEN 0.05 AND 0.07
      AND l.l_quantity < 24
    """,
    doc="TPC-H Q6 forecast-revenue change: scan-aggregate with zero joins. "
    "Every predicate (shipdate year via raw-domain rewrite, discount band, "
    "quantity cap) reaches the parquet scan as PushedFilters; the agg is a "
    "2-value partial→final. At 100 TB this reads one year of row groups "
    "and ships ~32 doubles to the driver.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark,
        sf_dir,
        "lineitem",
        ts_pushdown=[
            ("l_shipdate", ">=", "1996-01-01"),
            ("l_shipdate", "<", "1997-01-01"),
        ],
    )
    return li.where(
        F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24)
    ).agg(
        _m.plain_disc_sum(
            F.col("l_extendedprice"), F.col("l_discount")
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@defquery(
    "q7_volume_shipping",
    f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           {_m.sql_disc_rev_sum("l.l_extendedprice", "l.l_discount")}
             AS revenue
    FROM lineitem l
      JOIN orders o    ON l.l_orderkey = o.o_orderkey
      JOIN customer c  ON o.o_custkey = c.c_custkey
      JOIN supplier s  ON l.l_suppkey = s.s_suppkey
      JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
      JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
    doc="TPC-H Q7 volume shipping: nation appears TWICE under different "
    "roles (supplier's vs customer's), each a 25-row broadcast; the "
    "symmetric pair-disjunction filters after both joins. customer and "
    "supplier are SF-proportional, so they carry NO forced hint — AQE "
    "broadcasts them at gate scale and shuffles at 100 TB; lineitem⋈"
    "orders is the one guaranteed shuffle.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark,
        sf_dir,
        "lineitem",
        ts_pushdown=[
            ("l_shipdate", ">=", "1995-01-01"),
            ("l_shipdate", "<", "1997-01-01"),
        ],
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        j.where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            _m.disc_rev_sum(
                F.col("l_extendedprice"), F.col("l_discount")
            ).alias("revenue")
        )
    )


@defquery(
    "q8_market_share",
    f"""
    WITH base AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             {_m.sql_disc_rev_term("l.l_extendedprice", "l.l_discount")}
               AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN region r   ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
    )
    -- volume is EXACT integer cents*100; the share is a ratio of two
    -- exact sums cast to double (correctly rounded), the total converts
    -- once — no order-dependent double sums anywhere
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                               THEN volume ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) + 0.0 AS mkt_share,
           round(CAST(sum(volume) AS DOUBLE) / 10000.0, 2) + 0.0
             AS total_volume
    FROM base GROUP BY o_year
    """,
    doc="TPC-H Q8 national market share: eight-table join (nation twice, "
    "region gating the customer side, part-type gating the fact rows) "
    "feeding a conditional-aggregation ratio sum(CASE)/sum — one pass, no "
    "self-join. Fixed-size nation dims broadcast; the SF-proportional "
    "part/customer/supplier sides are un-hinted (AQE decides); the only "
    "guaranteed shuffles are lineitem⋈orders and the final year "
    "aggregate.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    euro_nations = (
        nat.join(
            region.where(F.col("r_name") == "EUROPE"),
            nat.n_regionkey == region.r_regionkey,
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    promo_parts = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    j = (
        li.join(promo_parts, li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(euro_nations), F.col("c_nationkey") == F.col("cn_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    dec = "decimal(38,0)"
    vol = _m.disc_rev_term(F.col("l_extendedprice"), F.col("l_discount"))
    return (
        j.select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            (
                F.round(
                    F.sum(
                        F.when(
                            F.col("supp_nation") == "NATION_3",
                            F.col("volume"),
                        )
                        .otherwise(F.lit(0))
                        .cast(dec)
                    ).cast("double")
                    / F.sum(F.col("volume").cast(dec)).cast("double"),
                    6,
                )
                + F.lit(0.0)
            ).alias("mkt_share"),
            (
                F.round(
                    F.sum(F.col("volume").cast(dec)).cast("double")
                    / 10000.0,
                    2,
                )
                + F.lit(0.0)
            ).alias("total_volume"),
        )
    )


@defquery(
    "q9_profit_by_nation_year",
    f"""
    SELECT n.n_name AS nation,
           CAST(year(l.l_shipdate) AS INT) AS o_year,
           {_m.sql_disc_rev_sum("l.l_extendedprice", "l.l_discount")}
             AS profit
    FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY n.n_name, year(l.l_shipdate)
    """,
    doc="TPC-H Q9-like product profit (schema has no partsupp, so profit = "
    "revenue without ps_supplycost — adaptation documented): LIKE "
    "'%bolt%' (the spec's '%green%' matches zero synthetic part names — a "
    "0-row comparison proves nothing, VERDICT r3 #6) prunes part before "
    "its join (a contains filter can't reach parquet stats but runs "
    "codegen-side before the join; part/supplier are SF-proportional so "
    "neither is hint-forced — AQE decides), nation chain broadcast, "
    "grouped by (nation, ship year).",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    parts = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").contains("bolt"))
        .select("p_partkey")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(parts, li.l_partkey == F.col("p_partkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    # two-tier exact sum (r14): 175 (nation, year) groups over the
    # largest money agg input after Q1 — the long partials drop the
    # per-row decimal cast from the join-output pass; values identical
    pre = j.select(
        F.col("n_name").alias("nation"),
        F.year("l_shipdate").cast("int").alias("o_year"),
        "l_extendedprice",
        "l_discount",
    )
    return _m.two_tier_group_agg(
        pre,
        ["nation", "o_year"],
        [
            _m.agg_disc_rev_sum(
                "profit", F.col("l_extendedprice"), F.col("l_discount")
            )
        ],
    )


@defquery(
    "q11_important_parts",
    f"""
    WITH part_rev AS (
      SELECT l.l_partkey,
             sum({_m.sql_disc_rev_term("l.l_extendedprice", "l.l_discount")})
               AS rev
      FROM lineitem l GROUP BY l.l_partkey
    )
    -- EXACT integer threshold: rev > total * 0.0005 restated as
    -- rev * 10000 > total * 5, both sides 128-bit integers — an
    -- ulp-noisy double total could flip membership for a part landing
    -- within rounding noise of the cutoff
    SELECT l_partkey, round(CAST(rev AS DOUBLE) / 10000.0, 2) + 0.0
             AS part_revenue
    FROM part_rev
    WHERE rev * 10000 >
          (SELECT sum({_m.sql_disc_rev_term("l.l_extendedprice",
                                            "l.l_discount")}) * 5
           FROM lineitem l)
    """,
    doc="TPC-H Q11-like important inventory: per-part revenue HAVING > "
    "fraction-of-global-total. The global total is an uncorrelated scalar "
    "subquery — 1-row aggregate broadcast against the grouped result, "
    "never a driver collect. Two scans of lineitem (group + total) — "
    "Spark and DuckDB both share none; at scale the total could piggyback "
    "on the same shuffle via grouping sets, kept simple here to mirror "
    "the TPC-H plan.",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    dec = "decimal(38,0)"
    rev = _m.disc_rev_term(
        F.col("l_extendedprice"), F.col("l_discount")
    ).alias("_r")
    per_part = li.select("l_partkey", rev).groupBy("l_partkey").agg(
        F.sum(F.col("_r").cast(dec)).alias("_rev")
    )
    # exact integer threshold: rev * 10000 > total * 5 (== total*0.0005)
    total = li.select(rev).agg(
        (F.sum(F.col("_r").cast(dec)) * F.lit(5).cast(dec)).alias("_t5")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("_rev") * F.lit(10000).cast(dec) > F.col("_t5"))
        .select(
            "l_partkey",
            (
                F.round(F.col("_rev").cast("double") / 10000.0, 2)
                + F.lit(0.0)
            ).alias("part_revenue"),
        )
    )


@defquery(
    "q15_top_supplier",
    f"""
    WITH supp_rev AS (
      SELECT l.l_suppkey,
             {_m.sql_disc_rev_sum("l.l_extendedprice", "l.l_discount")}
               AS total_revenue
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supp_rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM supp_rev)
    """,
    doc="TPC-H Q15 top supplier: quarter-scoped per-supplier revenue "
    "(rounded BEFORE the max comparison so ties are engine-stable), then "
    "keep the max-revenue supplier(s) via an unpartitioned window max over "
    "the ~|suppliers| aggregate — the CREATE VIEW + scalar subquery of the "
    "spec collapsed into one pass, no second lineitem scan.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark,
        sf_dir,
        "lineitem",
        ts_pushdown=[
            ("l_shipdate", ">=", "1996-01-01"),
            ("l_shipdate", "<", "1996-04-01"),
        ],
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    supp_rev = li.groupBy("l_suppkey").agg(
        _m.disc_rev_sum(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "total_revenue"
        )
    )
    w = Window.partitionBy()
    top = supp_rev.withColumn(
        "_max_rev", F.max("total_revenue").over(w)
    ).where(F.col("total_revenue") == F.col("_max_rev"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return top.join(
        supp, top.l_suppkey == supp.s_suppkey
    ).select("s_suppkey", "s_name", "total_revenue")


@defquery(
    "q16_brand_supplier_counts",
    """
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS INT) AS p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16-like supplier-part relationships (partsupp stood in by "
    "lineitem's observed (partkey, suppkey) pairs — adaptation "
    "documented): negated-predicate part pruning + NOT IN as a LEFT ANTI "
    "join against negative-balance suppliers (keys are non-null so "
    "NOT IN ≡ anti-join), then count(DISTINCT suppkey) per brand/type/"
    "size — Spark expands the distinct inside the aggregate, one shuffle.",
)
def q16_brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = (
        _t(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    kept = anti_join(li, bad_supp, F.col("l_suppkey") == F.col("s_suppkey"))
    return (
        kept.join(parts, kept.l_partkey == parts.p_partkey)
        .groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@defquery(
    "q20_qualifying_suppliers",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l.l_suppkey
      HAVING sum(l.l_quantity) > 100
    )
    """,
    doc="TPC-H Q20-like qualifying suppliers: two-level nested IN — parts "
    "by name prefix (semi-join onto lineitem, strategy AQE-chosen), "
    "year-scoped shipments "
    "aggregated per supplier with a HAVING volume floor, then supplier "
    "LEFT SEMI against the qualifying keys. Both INs become semi-joins; "
    "no correlated re-execution anywhere.",
)
def q20_qualifying_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    small_parts = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = load_table(
        spark,
        sf_dir,
        "lineitem",
        ts_pushdown=[
            ("l_shipdate", ">=", "1996-01-01"),
            ("l_shipdate", "<", "1997-01-01"),
        ],
    ).select("l_partkey", "l_suppkey", "l_quantity")
    qualifying = (
        li.join(
            small_parts, li.l_partkey == F.col("p_partkey"), "left_semi"
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 100)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return supp.join(
        qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi"
    )


@defquery(
    "q12_priority_by_mode",
    """
    SELECT l.l_returnflag AS ship_mode,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag IN ('R', 'A')
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
    doc="TPC-H Q12 shipping modes / order priority (schema has no "
    "l_shipmode or commit/receipt dates, so l_returnflag IN ('R','A') "
    "stands in for the two-mode filter and 'late receipt' becomes a "
    ">60-day ship lag vs the order date — adaptation documented): the "
    "two-way sum(CASE) pivot on priority class. Year + mode predicates "
    "prune lineitem at the scan; the lag predicate needs o_orderdate so "
    "it runs right after the one fact-fact join; the final agg is 2 "
    "groups × 2 longs.",
)
def q12_priority_by_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(
        spark,
        sf_dir,
        "lineitem",
        ts_pushdown=[
            ("l_shipdate", ">=", "1996-01-01"),
            ("l_shipdate", "<", "1997-01-01"),
        ],
    ).where(F.col("l_returnflag").isin("R", "A")).select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy(F.col("l_returnflag").alias("ship_mode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@defquery(
    "q21_waiting_suppliers",
    """
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM li l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 10
    """,
    doc="TPC-H Q21 suppliers who kept orders waiting — the multi-EXISTS "
    "decorrelation stress test (no commit/receipt dates in this schema, "
    "so 'late' = shipped >90 days after the order date — adaptation "
    "documented). The EXISTS (another supplier on the order) becomes a "
    "LEFT SEMI against multi-supplier orderkeys; the NOT EXISTS (another "
    "LATE supplier on the order) becomes a LEFT ANTI on orderkey equality "
    "plus a suppkey inequality — both decorrelated to single hash joins, "
    "no per-row re-execution, no cartesian (plan-asserted in "
    "tests/test_plans.py). The li CTE is computed once and persisted for "
    "its three roles; LIMIT tiebreaks on unique s_name.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lio = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
            ).alias("late"),
        )
        .persist()
    )
    # EXISTS other-supplier  ⟺  order has ≥2 distinct suppliers.
    multi_supp = (
        lio.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("_ns"))
        .where(F.col("_ns") >= 2)
        .select(F.col("l_orderkey").alias("_mk"))
    )
    # NOT EXISTS other-LATE-supplier: anti-join the late rows against the
    # distinct late (orderkey, suppkey) pairs of OTHER suppliers.
    late_pairs = (
        lio.where(F.col("late"))
        .select(
            F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
        )
        .distinct()
    )
    l1 = lio.where(F.col("late"))
    kept = l1.join(
        multi_supp, l1.l_orderkey == F.col("_mk"), "left_semi"
    ).join(
        late_pairs,
        (F.col("l_orderkey") == F.col("_ok")) & (F.col("l_suppkey") != F.col("_sk")),
        "left_anti",
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        kept.join(supp, kept.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@defquery(
    "q2_min_cost_supplier",
    """
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    euro_supp AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT es.s_acctbal, es.s_name, es.n_name, p.p_partkey, p.p_name,
           round(o.unit_cost, 4) AS unit_cost
    FROM part p
      JOIN offers o ON o.l_partkey = p.p_partkey
      JOIN euro_supp es ON o.l_suppkey = es.s_suppkey
    WHERE p.p_type = 'STANDARD' AND p.p_size < 10
      AND o.unit_cost = (SELECT min(o2.unit_cost) FROM offers o2
                         JOIN euro_supp es2 ON o2.l_suppkey = es2.s_suppkey
                         WHERE o2.l_partkey = p.p_partkey)
    ORDER BY es.s_acctbal DESC, es.n_name, es.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 minimum-cost supplier — the correlated-min-subquery "
    "shape (no partsupp in this schema, so the 'supply offer' relation is "
    "derived: per observed (l_partkey, l_suppkey) pair, unit cost = "
    "min(l_extendedprice / l_quantity) — adaptation documented like Q9). "
    "The correlated `cost = (SELECT min ... WHERE partkey = p.partkey)` "
    "decorrelates into a groupBy(partkey).min over the region-filtered "
    "offers joined back on (partkey, min_cost) equality — min returns an "
    "actual element of a deterministic IEEE double division, so the "
    "equality is exact in both engines. Offers computed once, persisted "
    "for both roles; region→nation (fixed-size, broadcast) gates "
    "supplier into an un-hinted keep-list semi-join before the offers "
    "aggregate. LIMIT tiebreaks to a unique "
    "(acctbal desc, nation, name, partkey) total order.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    euro_supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nat.join(region, nat.n_regionkey == region.r_regionkey).select(
                    "n_nationkey", "n_name"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # Offers restricted to European suppliers up front: one aggregate feeds
    # both the candidate rows and the per-part min (the decorrelated subquery).
    offers = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(
            euro_supp.select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
        )
        .persist()
    )
    min_cost = offers.groupBy(F.col("l_partkey").alias("_mpk")).agg(
        F.min("unit_cost").alias("_min_cost")
    )
    parts = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_type") == "STANDARD") & (F.col("p_size") < 10))
        .select("p_partkey", "p_name")
    )
    return (
        offers.join(
            min_cost,
            (F.col("l_partkey") == F.col("_mpk"))
            & (F.col("unit_cost") == F.col("_min_cost")),
        )
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(euro_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )
