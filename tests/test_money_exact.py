"""The exact-integer money discipline (plans/money.py, r13).

The sf0.1 hardened sweep proved double money sums are NOT value-stable
across engines (orders_revenue_trend_fit's intercept flipped in its
last rounded digit), so every TPC-H monetary sum now runs in 128-bit
integer cents.  These tests pin the module's three claims:

- SUM order-independence: the same rows in a different physical order
  (different partitioning) give the BIT-IDENTICAL rounded result, and
  it equals DuckDB's HUGEINT-sum twin;
- AVG tie-freedom: an exact cent-quotient landing exactly ON a 4dp
  rounding tie (the case both engines' round() can disagree on) takes
  the half-up value on both engines;
- negative-zero normalization: a tiny negative money sum never emits
  IEEE ``-0.0``.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hfp_loader_spark.plans import money as m


def _spark_one(df, col):
    return df.agg(col.alias("v")).collect()[0]["v"]


def test_money_sums_are_order_independent_and_match_duckdb(spark):
    import random

    rng = random.Random(13)
    rows = [
        (
            round(rng.uniform(900.0, 105000.0), 2),
            round(rng.uniform(0.0, 0.10), 2),
            round(rng.uniform(0.0, 0.08), 2),
        )
        for _ in range(5000)
    ]
    df = spark.createDataFrame(rows, "p double, d double, t double")
    # a deliberately different physical order and partitioning
    shuffled = df.orderBy(F.desc("d"), F.desc("p")).repartition(7)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE r AS SELECT * FROM (VALUES "
        + ",".join(f"({p!r}, {d!r}, {t!r})" for p, d, t in rows)
        + ") v(p, d, t)"
    )
    for spark_col, sql in [
        (m.money_sum(F.col("p")), m.sql_money_sum("p")),
        (m.disc_rev_sum(F.col("p"), F.col("d")), m.sql_disc_rev_sum("p", "d")),
        (m.plain_disc_sum(F.col("p"), F.col("d")), m.sql_plain_disc_sum("p", "d")),
        (
            m.charge_sum(F.col("p"), F.col("d"), F.col("t")),
            m.sql_charge_sum("p", "d", "t"),
        ),
        (m.money_avg(F.col("p")), m.sql_money_avg("p")),
        (m.pct_avg(F.col("d")), m.sql_pct_avg("d")),
    ]:
        a = _spark_one(df, spark_col)
        b = _spark_one(shuffled, spark_col)
        c = con.execute(f"SELECT {sql} FROM r").fetchall()[0][0]
        assert repr(a) == repr(b) == repr(c), (sql, a, b, c)


def test_exact_avg_resolves_rounding_tie_half_up(spark):
    """41891909.05 dollars over 184 rows = 227673.41875 — exactly on a
    4dp tie, where Spark round() (decimal-string) and DuckDB round()
    (fp multiply) have been observed to disagree.  The integer half-up
    average takes .4188 on BOTH engines."""
    total = 4189190905  # cents
    n = 184
    rows = [
        (total // n + (1 if i < total % n else 0),) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "c long")
    got = _spark_one(
        df,
        m._int_avg(
            F.sum(F.col("c").cast("decimal(38,0)")), F.count("*"), 4, 100
        ),
    )
    sql = m._sql_int_avg("sum(CAST(c AS HUGEINT))", 4, 100)
    duck = (
        duckdb.connect()
        .execute(
            f"SELECT {sql} FROM (SELECT unnest("
            f"[{','.join(str(r[0]) for r in rows)}]) AS c)"
        )
        .fetchall()[0][0]
    )
    assert repr(got) == repr(duck) == "227673.4188"


def test_negative_money_sum_never_emits_negative_zero(spark):
    import math

    df = spark.createDataFrame([(-0.001,)], "p double")
    got = _spark_one(df, m.money_sum(F.col("p")))
    assert got == 0.0 and math.copysign(1.0, got) == 1.0
    duck = (
        duckdb.connect()
        .execute(f"SELECT {m.sql_money_sum('p')} FROM (SELECT -0.001::DOUBLE AS p)")
        .fetchall()[0][0]
    )
    assert repr(duck) == repr(got)


def test_charge_term_fits_long_per_row(spark):
    """The long-arithmetic claim: the largest possible per-row charge
    term (max price, max tax, zero discount) stays far inside int64 —
    the reason terms run in fast 64-bit and only the SUM widens to
    decimal(38,0)."""
    p_max_cents = 11_000_000  # $110k, above any TPC-H extendedprice
    term = p_max_cents * 100 * 110
    assert term < 2**62
    df = spark.createDataFrame([(110000.0, 0.0, 0.10)], "p double, d double, t double")
    got = _spark_one(df, m.charge_sum(F.col("p"), F.col("d"), F.col("t")))
    assert got == pytest.approx(121000.0)


def test_two_tier_equals_single_tier_and_oracle(spark):
    """two_tier_group_agg (r14, VERDICT r13 #2) must be value-identical
    to the single-tier forms — integer addition is associative, so the
    long-partial/decimal-final split may never show — under hostile
    partitioning, and match the DuckDB oracle fragments unchanged."""
    import random

    rng = random.Random(14)
    rows = [
        (
            "g%d" % (i % 3),
            round(rng.uniform(900.0, 105000.0), 2),
            round(rng.uniform(0.0, 0.10), 2),
            round(rng.uniform(0.0, 0.08), 2),
            float(rng.randint(1, 50)),
        )
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "g string, p double, d double, t double, q double")
    aggs = [
        m.agg_qty_sum("sum_q", F.col("q")),
        m.agg_money_sum("sum_p", F.col("p")),
        m.agg_disc_rev_sum("sum_rev", F.col("p"), F.col("d")),
        m.agg_charge_sum("sum_chg", F.col("p"), F.col("d"), F.col("t")),
        m.agg_qty_avg("avg_q", F.col("q")),
        m.agg_money_avg("avg_p", F.col("p")),
        m.agg_pct_avg("avg_d", F.col("d")),
        m.agg_count("n"),
    ]
    single = df.groupBy("g").agg(
        m.qty_sum(F.col("q")).alias("sum_q"),
        m.money_sum(F.col("p")).alias("sum_p"),
        m.disc_rev_sum(F.col("p"), F.col("d")).alias("sum_rev"),
        m.charge_sum(F.col("p"), F.col("d"), F.col("t")).alias("sum_chg"),
        m.qty_avg(F.col("q")).alias("avg_q"),
        m.money_avg(F.col("p")).alias("avg_p"),
        m.pct_avg(F.col("d")).alias("avg_d"),
        F.count("*").alias("n"),
    )
    want = sorted(map(tuple, single.collect()))
    for frame in (df, df.orderBy(F.desc("p")).repartition(11)):
        got = sorted(
            map(tuple, m.two_tier_group_agg(frame, ["g"], aggs).collect())
        )
        assert [list(map(repr, r)) for r in got] == [
            list(map(repr, r)) for r in want
        ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE r AS SELECT * FROM (VALUES "
        + ",".join(
            f"({g!r}, {p!r}, {d!r}, {t!r}, {q!r})" for g, p, d, t, q in rows
        )
        + ") v(g, p, d, t, q)"
    )
    duck = sorted(
        map(
            tuple,
            con.execute(
                f"""SELECT g, {m.sql_qty_sum('q')}, {m.sql_money_sum('p')},
                {m.sql_disc_rev_sum('p', 'd')}, {m.sql_charge_sum('p', 'd', 't')},
                {m.sql_qty_avg('q')}, {m.sql_money_avg('p')}, {m.sql_pct_avg('d')},
                CAST(count(*) AS BIGINT) FROM r GROUP BY g"""
            ).fetchall(),
        )
    )
    assert [list(map(repr, r)) for r in duck] == [
        list(map(repr, r)) for r in want
    ]


def test_two_tier_falls_back_without_ansi(spark):
    """Without ANSI a long partial overflow would WRAP silently — the
    helper must detect the session config and take the per-row decimal
    path instead (same values, no long tier)."""
    df = spark.createDataFrame([("a", 10.0), ("a", 20.0)], "g string, p double")
    aggs = [m.agg_money_sum("s", F.col("p")), m.agg_count("n")]
    old = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        out = m.two_tier_group_agg(df, ["g"], aggs)
        assert "__shard" not in out.sparkSession.createDataFrame(
            [], out.schema
        ).columns
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "spark_partition_id" not in plan
        assert sorted(map(tuple, out.collect())) == [("a", 30.0, 2)]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    assert sorted(
        map(tuple, m.two_tier_group_agg(df, ["g"], aggs).collect())
    ) == [("a", 30.0, 2)]


def test_int_avg_negative_sum_rounds_half_toward_plus_inf(spark):
    """ADVICE r13: the floor-mod form makes the documented half-up rule
    hold for NEGATIVE sums too, identically on both engines: mean of
    -455.345 over 2 rows at 2dp → -227.67 (the tie -227.675 rounds
    toward +∞ to -227.67, not away to -227.68)."""
    rows = [(-45534,), (-1,)]  # cents; sum = -45535, n=2 → -227.675
    df = spark.createDataFrame(rows, "c long")
    got = _spark_one(
        df,
        m._int_avg(
            F.sum(F.col("c").cast("decimal(38,0)")), F.count("*"), 2, 100
        ),
    )
    sql = m._sql_int_avg("sum(CAST(c AS HUGEINT))", 2, 100)
    duck = (
        duckdb.connect()
        .execute(
            f"SELECT {sql} FROM (SELECT unnest([-45534, -1]) AS c)"
        )
        .fetchall()[0][0]
    )
    assert repr(got) == repr(duck) == "-227.67"


def test_int_avg_rejects_non_dividing_unit():
    """ADVICE r13: a unit that doesn't divide 10**decimals must raise
    (a silent floor gives a wrong scale), on BOTH dialect builders."""
    with pytest.raises(ValueError, match="does not divide"):
        m._int_avg(F.lit(1).cast("decimal(38,0)"), F.lit(1), 1, 3)
    with pytest.raises(ValueError, match="does not divide"):
        m._sql_int_avg("sum(x)", 1, 3)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_money2dp = st.integers(min_value=-10_500_000, max_value=10_500_000).map(
    lambda c: c / 100.0
)
_pct2dp = st.integers(min_value=0, max_value=10).map(lambda p: p / 100.0)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # group
            _money2dp,
            _pct2dp,
            _pct2dp,
            st.integers(1, 50),
        ),
        min_size=1,
        max_size=60,
    ),
    parts=st.integers(1, 9),
)
def test_two_tier_equals_single_tier_property(spark, rows, parts):
    """Whatever the data and partitioning (negative money included —
    acctbal-like domains), the two-tier plan is value-IDENTICAL to the
    single-tier exact forms: the split is pure associativity, so any
    divergence is a bug, not noise."""
    df = spark.createDataFrame(
        [(g, p, d, t, float(q)) for g, p, d, t, q in rows],
        "g int, p double, d double, t double, q double",
    ).repartition(parts)
    aggs = [
        m.agg_money_sum("sum_p", F.col("p")),
        m.agg_disc_rev_sum("rev", F.col("p"), F.col("d")),
        m.agg_charge_sum("chg", F.col("p"), F.col("d"), F.col("t")),
        m.agg_qty_avg("avg_q", F.col("q")),
        m.agg_count("n"),
    ]
    single = df.groupBy("g").agg(
        m.money_sum(F.col("p")).alias("sum_p"),
        m.disc_rev_sum(F.col("p"), F.col("d")).alias("rev"),
        m.charge_sum(F.col("p"), F.col("d"), F.col("t")).alias("chg"),
        m.qty_avg(F.col("q")).alias("avg_q"),
        F.count("*").alias("n"),
    )
    got = sorted(map(tuple, m.two_tier_group_agg(df, ["g"], aggs).collect()))
    want = sorted(map(tuple, single.collect()))
    assert [list(map(repr, r)) for r in got] == [
        list(map(repr, r)) for r in want
    ]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cents=st.lists(
        st.integers(min_value=-2_000_000, max_value=2_000_000),
        min_size=1,
        max_size=40,
    ),
    decimals=st.sampled_from([2, 4]),
)
def test_int_avg_matches_python_int_model(spark, cents, decimals):
    """_int_avg against the pure-integer Python model of the documented
    rule — q = floor((2*scale*s + n) / (2n)), i.e. half-up toward +∞ —
    for sums of EITHER sign, on Spark and DuckDB alike."""
    s, n = sum(cents), len(cents)
    scale = 10**decimals // 100
    model = ((2 * scale * s + n) - (((2 * scale * s + n) % (2 * n)) + 2 * n) % (2 * n)) // (
        2 * n
    ) / float(10**decimals)
    df = spark.createDataFrame([(c,) for c in cents], "c long")
    got = _spark_one(
        df,
        m._int_avg(
            F.sum(F.col("c").cast("decimal(38,0)")),
            F.count("*"),
            decimals,
            100,
        ),
    )
    sql = m._sql_int_avg("sum(CAST(c AS HUGEINT))", decimals, 100)
    duck = (
        duckdb.connect()
        .execute(
            f"SELECT {sql} FROM (SELECT unnest("
            f"[{','.join(map(str, cents))}]) AS c)"
        )
        .fetchall()[0][0]
    )
    assert repr(got) == repr(duck) == repr(model)
