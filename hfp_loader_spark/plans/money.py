"""Exact-integer money aggregation — the cents discipline for TPC-H
monetary sums, in BOTH engines' dialects so an entry's Spark plan and
DuckDB oracle can never drift apart.

Why this exists (r13, found by the sf0.1 hardened sweep): a double SUM
is summation-order-dependent, and the engines sum in different orders.
For a 2-decimal rounding of a revenue total the required cross-engine
agreement is ``0.005 / magnitude`` relative — at sf0.1 a Q1-class sum
is ~6e9, demanding ~1e-12 while the accumulated ulp noise is ~1e-7
absolute, i.e. the hash holds only while no sum lands within the noise
of a boundary.  `orders_revenue_trend_fit` actually crossed one.  The
shipped-data sweeps re-roll those dice every time testdata regenerates.

The TPC-H money domain is EXACT in integer units by construction:
prices/balances are exact cents, discount/tax are exact percent
fractions.  So every sum here runs in 128-bit integer arithmetic —
Spark ``decimal(38,0)`` ≡ DuckDB ``HUGEINT`` (plain BIGINT would
overflow: a charge row is cents×10⁴ ≈ 4e10, and sf100's ~6e8 rows put
the sum at ~2.6e19 > int64) — and converts to double ONCE through a
correctly-rounded cast, after which the display division and rounding
are correctly-rounded ops on bit-identical inputs.  Overflow fails
loud on both engines (ANSI decimal / HUGEINT bounds ~1.7e38 ≫ any sf).

Unit bookkeeping: cents (×100), discount/tax percent-of-unit (×100) —
a discounted revenue term is cents×10² units, a taxed charge cents×10⁴.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _cents(col: Column) -> Column:
    """Exact integer cents of an exact-cent money double.

    LONG, not decimal: per-row terms stay far inside int64 (a taxed
    charge row is ≤ ~4.4e10), and 64-bit multiplies run ~1.5× faster
    than Decimal128 in codegen — only the SUM boundary widens to
    decimal(38,0), where overflow is actually possible at scale.
    (Measured on Q1 at sf0.1: double 0.20 s, long-terms+decimal-sum
    0.50 s, all-decimal 0.73 s.)"""
    return F.round(col * 100).cast("long")


def _pct(col: Column) -> Column:
    """Exact integer hundredths of an exact-2dp fraction (discount/tax)."""
    return F.round(col * 100).cast("long")


def _dsum(term: Column) -> Column:
    """The 128-bit exact sum of a long row term."""
    return F.sum(term.cast(_DEC))


def money_sum(col: Column, round_to: int = 2) -> Column:
    """``round(sum(money), 2)`` with the sum exact in integer cents."""
    return F.round(
        _dsum(_cents(col)).cast("double") / 100.0, round_to
    ) + F.lit(0.0)


def _qty(col: Column) -> Column:
    """Exact integer of an integer-valued double quantity.  round()
    BEFORE the cast, matching the SQL twins' ``CAST(round(q) AS …)``:
    a bare Spark cast TRUNCATES while a bare DuckDB cast ROUNDS — the
    classic cross-engine trap — so neither side ever bare-casts."""
    return F.round(col).cast("long")


def qty_sum(col: Column, round_to: int = 2) -> Column:
    """``round(sum(qty), 2)`` for an integer-valued double quantity."""
    return F.round(F.sum(_qty(col)).cast("double"), round_to) + F.lit(0.0)


def disc_rev_sum(price: Column, disc: Column, round_to: int = 2) -> Column:
    """``round(sum(price * (1 - disc)), 2)`` exact in cents×10²."""
    term = _cents(price) * (F.lit(100) - _pct(disc))
    return F.round(
        _dsum(term).cast("double") / 10000.0, round_to
    ) + F.lit(0.0)


def plain_disc_sum(price: Column, disc: Column, round_to: int = 2) -> Column:
    """``round(sum(price * disc), 2)`` (the TPC-H Q6 shape), cents×10²."""
    term = _cents(price) * _pct(disc)
    return F.round(
        _dsum(term).cast("double") / 10000.0, round_to
    ) + F.lit(0.0)


def charge_sum(
    price: Column, disc: Column, tax: Column, round_to: int = 2
) -> Column:
    """``round(sum(price*(1-disc)*(1+tax)), 2)`` exact in cents×10⁴."""
    term = (
        _cents(price)
        * (F.lit(100) - _pct(disc))
        * (F.lit(100) + _pct(tax))
    )
    return F.round(
        _dsum(term).cast("double") / 1000000.0, round_to
    ) + F.lit(0.0)


def _int_avg(sum_int: Column, n: Column, decimals: int, unit: int) -> Column:
    """Half-up average of an exact integer sum, rounded to ``decimals``
    WITHOUT either engine's ``round()``: exact cent-quotients land
    exactly ON rounding ties far more often than noisy doubles do
    (41891909.05 / 184 = 227673.41875 — a 4dp tie), and at a tie
    Spark's decimal-string rounding and DuckDB's fp-multiply rounding
    can disagree by one final digit.  Integer half-up —
    ``floor((2·scale·s + n) / (2n))`` — has no ties: computed via
    FLOOR-mod-subtract (``((t % m) + m) % m``; both engines' plain
    ``%`` takes the dividend's sign) so the decimal division is
    remainder-free and EXACT for either sign of the sum — a negative
    sum (e.g. an avg over c_acctbal) rounds half-toward-+∞, the same
    documented rule as positives (-2.5 → -2).  ``unit`` is the integer
    unit per 1.0 (cents → 100) and must divide ``10**decimals`` —
    anything else would silently floor the scale to a wrong value."""
    if 10**decimals % unit != 0:
        raise ValueError(
            f"unit {unit} does not divide 10**{decimals}; the requested "
            "rounding cannot be expressed in integer arithmetic"
        )
    scale = 10**decimals // unit
    t = sum_int * F.lit(2 * scale).cast(_DEC) + n.cast(_DEC)
    m = n.cast(_DEC) * F.lit(2).cast(_DEC)
    q = (t - ((t % m) + m) % m) / m
    return q.cast("double") / float(10**decimals)


def money_avg(col: Column, decimals: int = 4) -> Column:
    """``round(avg(money), 4)``-equivalent, exact and tie-free."""
    return _int_avg(_dsum(_cents(col)), F.count("*"), decimals, 100)


def pct_avg(col: Column, decimals: int = 4) -> Column:
    """``round(avg(discount-like), 4)``-equivalent (exact 2dp fraction)."""
    return _int_avg(_dsum(_pct(col)), F.count("*"), decimals, 100)


def qty_avg(col: Column, decimals: int = 4) -> Column:
    """``round(avg(int-valued qty), 4)``-equivalent, exact and tie-free."""
    return _int_avg(
        F.sum(_qty(col)).cast(_DEC), F.count("*"), decimals, 1
    )


# --- two-tier exact aggregation (VERDICT r13 #2) ---------------------
#
# The r13 exact-money rewrite put a per-ROW decimal(38,0) cast in front
# of every monetary sum; measured on Q1 at sf0.1 that cast is most of
# the 0.20 s → 0.50 s step in the cost ladder.  The decimal width is
# only needed at the SUM boundary, and only because a whole GROUP's sum
# can exceed int64 at large SF — a single input PARTITION's partial sum
# cannot: the largest row term (a taxed charge) is ≤ ~2×10¹¹, so a long
# partial stays inside int64 up to ~4.6×10⁷ rows per partition.  For a
# SCAN input, spark.sql.files.maxPartitionBytes bounds real partitions
# to a few million rows at ANY total SF (partition size is a constant
# of the scan, not of the corpus).  CAVEAT (ADVICE r14): when the input
# is JOIN OUTPUT (q5/q9 feed lineitem⋈orders⋈…), partition sizes are
# set by spark.sql.shuffle.partitions / AQE target-size, not the scan
# bound — AQE's default 64 MB advisory size still keeps partitions ≪
# 4.6×10⁷ rows, but a cluster tuned for gigabyte shuffle partitions
# could reach the bound, where ANSI aborts the query loudly at runtime
# rather than degrading (see two_tier_group_agg).  So: tier 1 sums
# LONG row terms per
# (group keys, input partition) — pure int64 codegen, map-side-combined
# to ≤|groups| rows per partition — and tier 2 sums the partials in
# decimal(38,0), where overflow is actually possible and still fails
# loud.  Spark 4 ANSI mode (on by default, never disabled by
# session.py) makes a tier-1 violation raise instead of wrap; under a
# caller's ANSI-off session the helper falls back to the per-row
# decimal path so exactness never depends on a config flag.
#
# Values are bit-identical to the single-tier forms (integer addition
# is associative), so the DuckDB oracle fragments are unchanged.


class ExactAgg(NamedTuple):
    """One aggregate of a two-tier exact group aggregation: ``term`` is
    the exact LONG row term (None → plain row count) and ``final`` maps
    (decimal-exact sum, bigint group count) to the display column.

    ``slot`` (VERDICT r15 #6) names the tier-1 partial this aggregate
    reads: two aggregates carrying the SAME slot string share one
    per-row term (sum_qty/avg_qty compute ``_qty(l_quantity)`` once —
    each extra term costs a round + multiply + cast per row, measured
    ~0.1 s on Q1 at sf0.1).  ``slot=None`` falls back to the term's
    OBJECT IDENTITY, so sharing is always an explicit caller opt-in —
    two genuinely different columns that merely render identically
    (same-named columns off an unaliased self-join) can never silently
    share a partial, which the previous repr-keyed dedup allowed in
    principle."""

    name: str
    term: Column | None
    final: Callable[[Column | None, Column], Column]
    slot: str | None = None


def agg_qty_sum(
    name: str, col: Column, round_to: int = 2, slot: str | None = None
) -> ExactAgg:
    return ExactAgg(
        name,
        _qty(col),
        lambda s, n: F.round(s.cast("double"), round_to) + F.lit(0.0),
        slot,
    )


def agg_money_sum(
    name: str, col: Column, round_to: int = 2, slot: str | None = None
) -> ExactAgg:
    return ExactAgg(
        name,
        _cents(col),
        lambda s, n: F.round(s.cast("double") / 100.0, round_to)
        + F.lit(0.0),
        slot,
    )


def agg_disc_rev_sum(
    name: str, price: Column, disc: Column, round_to: int = 2
) -> ExactAgg:
    return ExactAgg(
        name,
        disc_rev_term(price, disc),
        lambda s, n: F.round(s.cast("double") / 10000.0, round_to)
        + F.lit(0.0),
    )


def agg_charge_sum(
    name: str, price: Column, disc: Column, tax: Column, round_to: int = 2
) -> ExactAgg:
    term = (
        _cents(price)
        * (F.lit(100) - _pct(disc))
        * (F.lit(100) + _pct(tax))
    )
    return ExactAgg(
        name,
        term,
        lambda s, n: F.round(s.cast("double") / 1000000.0, round_to)
        + F.lit(0.0),
    )


def agg_qty_avg(
    name: str, col: Column, decimals: int = 4, slot: str | None = None
) -> ExactAgg:
    return ExactAgg(
        name, _qty(col), lambda s, n: _int_avg(s, n, decimals, 1), slot
    )


def agg_money_avg(
    name: str, col: Column, decimals: int = 4, slot: str | None = None
) -> ExactAgg:
    return ExactAgg(
        name, _cents(col), lambda s, n: _int_avg(s, n, decimals, 100), slot
    )


def agg_pct_avg(
    name: str, col: Column, decimals: int = 4, slot: str | None = None
) -> ExactAgg:
    return ExactAgg(
        name, _pct(col), lambda s, n: _int_avg(s, n, decimals, 100), slot
    )


def agg_count(name: str) -> ExactAgg:
    return ExactAgg(name, None, lambda s, n: n.cast("long"))


def two_tier_group_agg(
    df: DataFrame, keys: list[str], aggs: list[ExactAgg]
) -> DataFrame:
    """``df.groupBy(keys).agg(...)`` with every sum exact, long partials
    first (see the tier rationale above).  Output columns appear in
    ``aggs`` order after the keys, exactly like the single-tier form.

    Use for LOW-cardinality groups only (Q1's 6, a nation×year 175):
    tier 1's exchange carries ~|groups| × |input partitions| partial
    rows, so a per-order/per-customer grouping would ship more partials
    than the single-tier form ships rows — there the per-row decimal
    forms (:func:`money_sum` etc.) remain the right shape.

    Two caller contracts (ADVICE r14):

    * **ANSI is read at plan-BUILD time.**  The returned DataFrame
      assumes the session's ``spark.sql.ansi.enabled`` value holds when
      the plan executes; a caller that builds under ANSI-on and flips
      the conf off before the action would run the long tier without
      the loud-overflow backstop.  ``session.py`` never disables ANSI
      and no catalog entry toggles it, so the contract holds everywhere
      in this repo — external callers juggling the flag must rebuild
      the plan after flipping it.
    * **Partial sharing is slot-keyed (VERDICT r15 #6).**  Two
      aggregates share one tier-1 partial iff they carry the same
      explicit ``slot`` string (or are literally the same ``Column``
      object); distinct columns can never silently share however they
      render.  The caller owns slot-string correctness: assigning one
      slot to two semantically different terms is a bug on the same
      footing as aliasing two different columns to one name."""
    ansi = (
        df.sparkSession.conf.get("spark.sql.ansi.enabled", "true") or ""
    ).lower() == "true"
    if not ansi:
        # No loud overflow without ANSI → keep the decimal cast per row.
        return df.groupBy(*keys).agg(
            *[
                a.final(
                    _dsum(a.term) if a.term is not None else None,
                    F.count(F.lit(1)),
                ).alias(a.name)
                for a in aggs
            ]
        )
    # Share tier-1 partials across aggregates by EXPLICIT slot string
    # (sum_qty/avg_qty both declare slot="qty" and compute the row term
    # once), falling back to the term's object identity — see the
    # ExactAgg.slot docstring for why repr-keyed dedup was retired.
    slot_of: dict[object, int] = {}
    slots: list[Column] = []
    agg_slot: list[int | None] = []
    for a in aggs:
        if a.term is None:
            agg_slot.append(None)
            continue
        key: object = a.slot if a.slot is not None else id(a.term)
        if key not in slot_of:
            slot_of[key] = len(slots)
            slots.append(a.term)
        agg_slot.append(slot_of[key])
    partials = (
        # withColumn, not groupBy(spark_partition_id()): grouping keys
        # must be deterministic expressions, a projected column is.
        df.withColumn("__shard", F.spark_partition_id())
        .groupBy(*keys, "__shard")
        .agg(
            *[
                F.sum(term).alias(f"__p_{i}")
                for i, term in enumerate(slots)
            ],
            F.count(F.lit(1)).alias("__p_n"),
        )
    )
    n = F.sum("__p_n")
    dec_sums = [F.sum(F.col(f"__p_{i}").cast(_DEC)) for i in range(len(slots))]
    return partials.groupBy(*keys).agg(
        *[
            a.final(
                dec_sums[slot] if slot is not None else None, n
            ).alias(a.name)
            for a, slot in zip(aggs, agg_slot)
        ]
    )


def disc_rev_term(price: Column, disc: Column) -> Column:
    """The exact cents×10² discounted-revenue ROW term (long) — for
    entries that need the unrounded sum (ratios, thresholds); the
    rounded display form is :func:`disc_rev_sum`."""
    return _cents(price) * (F.lit(100) - _pct(disc))


# --- DuckDB oracle fragments (the EXACT twins of the columns above) ---


def _sql_int_avg(
    sum_sql: str, decimals: int, unit: int, count_sql: str = "count(*)"
) -> str:
    """SQL twin of :func:`_int_avg` — the same floor-mod half-up form
    (DuckDB's ``//`` and ``%`` truncate toward zero exactly like
    Spark's, so the twin needs the same floor-mod subtract to round
    negative sums half-toward-+∞)."""
    if 10**decimals % unit != 0:
        raise ValueError(
            f"unit {unit} does not divide 10**{decimals}; the requested "
            "rounding cannot be expressed in integer arithmetic"
        )
    scale = 10**decimals // unit
    t = f"(2 * {scale} * ({sum_sql}) + {count_sql})"
    m = f"(2 * ({count_sql}))"
    return (
        f"CAST(({t} - ((({t}) % {m}) + {m}) % {m}) // {m}"
        f" AS DOUBLE) / {10**decimals}.0"
    )


def sql_disc_rev_term(price: str, disc: str) -> str:
    """SQL twin of :func:`disc_rev_term` (HUGEINT row term)."""
    return (
        f"CAST(round(({price}) * 100) AS HUGEINT)"
        f" * (100 - CAST(round(({disc}) * 100) AS HUGEINT))"
    )


def sql_money_avg(expr: str, decimals: int = 4) -> str:
    return _sql_int_avg(
        f"sum(CAST(round(({expr}) * 100) AS HUGEINT))", decimals, 100
    )


def sql_pct_avg(expr: str, decimals: int = 4) -> str:
    return _sql_int_avg(
        f"sum(CAST(round(({expr}) * 100) AS HUGEINT))", decimals, 100
    )


def sql_qty_avg(expr: str, decimals: int = 4) -> str:
    return _sql_int_avg(
        f"sum(CAST(round(({expr})) AS HUGEINT))", decimals, 1
    )


def sql_money_sum(expr: str, round_to: int = 2) -> str:
    return (
        f"round(CAST(sum(CAST(round(({expr}) * 100) AS HUGEINT)) AS DOUBLE)"
        f" / 100.0, {round_to}) + 0.0"
    )


def sql_qty_sum(expr: str, round_to: int = 2) -> str:
    return (
        f"round(CAST(sum(CAST(round(({expr})) AS BIGINT)) AS DOUBLE),"
        f" {round_to}) + 0.0"
    )


def sql_disc_rev_sum(price: str, disc: str, round_to: int = 2) -> str:
    return (
        f"round(CAST(sum(CAST(round(({price}) * 100) AS HUGEINT)"
        f" * (100 - CAST(round(({disc}) * 100) AS HUGEINT))) AS DOUBLE)"
        f" / 10000.0, {round_to}) + 0.0"
    )


def sql_plain_disc_sum(price: str, disc: str, round_to: int = 2) -> str:
    return (
        f"round(CAST(sum(CAST(round(({price}) * 100) AS HUGEINT)"
        f" * CAST(round(({disc}) * 100) AS HUGEINT)) AS DOUBLE)"
        f" / 10000.0, {round_to}) + 0.0"
    )


def sql_charge_sum(
    price: str, disc: str, tax: str, round_to: int = 2
) -> str:
    return (
        f"round(CAST(sum(CAST(round(({price}) * 100) AS HUGEINT)"
        f" * (100 - CAST(round(({disc}) * 100) AS HUGEINT))"
        f" * (100 + CAST(round(({tax}) * 100) AS HUGEINT))) AS DOUBLE)"
        f" / 1000000.0, {round_to}) + 0.0"
    )
