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

from pyspark.sql import Column
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
    mod-subtract so the decimal division is remainder-free and EXACT.
    ``unit`` is the integer unit per 1.0 (cents → 100)."""
    scale = 10**decimals // unit
    assert scale >= 1, "decimals must cover the integer unit"
    t = sum_int * F.lit(2 * scale).cast(_DEC) + n.cast(_DEC)
    m = n.cast(_DEC) * F.lit(2).cast(_DEC)
    q = (t - t % m) / m
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


def disc_rev_term(price: Column, disc: Column) -> Column:
    """The exact cents×10² discounted-revenue ROW term (long) — for
    entries that need the unrounded sum (ratios, thresholds); the
    rounded display form is :func:`disc_rev_sum`."""
    return _cents(price) * (F.lit(100) - _pct(disc))


# --- DuckDB oracle fragments (the EXACT twins of the columns above) ---


def _sql_int_avg(
    sum_sql: str, decimals: int, unit: int, count_sql: str = "count(*)"
) -> str:
    scale = 10**decimals // unit
    return (
        f"CAST((2 * {scale} * ({sum_sql}) + {count_sql})"
        f" // (2 * ({count_sql})) AS DOUBLE) / {10**decimals}.0"
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
