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
    n_salts: int = 8,
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
    """
    salt = F.floor(F.rand(42) * n_salts).cast("int")
    left = skewed.withColumn("_salt", salt)
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return left.join(right, [*on, "_salt"], how).drop("_salt")
