"""Declarative data-quality constraint checking (dbt-test / Deequ shape).

A constraint suite compiles to ONE pass over the checked table (conditional
aggregates — no per-constraint scans) plus one aggregate per referential
constraint (an anti-join on the parent key).  Output is a tall
(check_name, n_violations) report — the thing a 100 TB pipeline gates a
publish on.

Scale notes: the single-pass design matters — N unique/non-null/range
checks cost one scan, not N; each FK check is a key-only anti-join
(broadcast when the parent's key set is small); uniqueness runs as a
groupBy on the key with a HAVING count>1, counting VIOLATING ROWS (every
row beyond the first occurrence), so the number is actionable ("how many
rows to drop"), not just a flag.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ForeignKey:
    name: str
    child_key: str
    parent: DataFrame
    parent_key: str


@dataclass(frozen=True)
class ConstraintSuite:
    not_null: dict[str, str] = field(default_factory=dict)  # name → col
    unique: dict[str, list[str]] = field(default_factory=dict)  # name → key cols
    checks: dict[str, Column] = field(default_factory=dict)  # name → must-hold predicate
    foreign_keys: list[ForeignKey] = field(default_factory=list)


def run_constraints(df: DataFrame, suite: ConstraintSuite) -> DataFrame:
    """Evaluate the suite; returns (check_name: string, n_violations: long)."""
    aggs, names = [], []
    for name, col in suite.not_null.items():
        aggs.append(F.count_if(F.col(col).isNull()).alias(name))
        names.append(name)
    for name, pred in suite.checks.items():
        # violations = rows where the predicate does NOT hold (null counts
        # as a violation: an unevaluable constraint is not a passing one)
        aggs.append(F.count_if(~F.coalesce(pred, F.lit(False))).alias(name))
        names.append(name)
    reports = []
    if aggs:
        row = df.agg(*aggs)
        stacked = row.selectExpr(
            "stack({n}, {pairs}) as (check_name, n_violations)".format(
                n=len(names),
                pairs=", ".join(
                    f"'{a}', cast(`{a}` as long)" for a in names
                ),
            )
        )
        reports.append(stacked)
    for name, keys in suite.unique.items():
        dup_rows = (
            df.groupBy(*keys)
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > 1)
            .agg(
                F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
                .cast("long")
                .alias("n_violations")
            )
            .select(F.lit(name).alias("check_name"), "n_violations")
        )
        reports.append(dup_rows)
    for fk in suite.foreign_keys:
        orphans = (
            df.select(F.col(fk.child_key))
            .where(F.col(fk.child_key).isNotNull())
            .join(
                fk.parent.select(
                    F.col(fk.parent_key).alias(fk.child_key)
                ).distinct(),
                fk.child_key,
                "left_anti",
            )
            .agg(F.count("*").cast("long").alias("n_violations"))
            .select(F.lit(fk.name).alias("check_name"), "n_violations")
        )
        reports.append(orphans)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def key_skew_stats(df: DataFrame, key_cols: list[str]) -> dict[str, float]:
    """One-pass join-key skew profile, collected to a bounded scalar row.

    The diagnosis half of skew mitigation (the catalog's
    ``dq_skew_report`` as a reusable primitive): per-key cardinalities
    via one hash aggregate, then max / avg / approximate p99 over the
    (small) per-key counts.  ``percentile_approx`` keeps the final merge
    GK-sketch-bounded at billions of keys.  Cost: one shuffle of per-key
    count partials — the pass a production job runs once per layout and
    caches (or reads from table stats) rather than per query.
    """
    per_key = df.groupBy(*key_cols).agg(F.count("*").alias("_cnt"))
    row = per_key.agg(
        F.count("*").alias("n_keys"),
        F.max("_cnt").alias("max_rows_per_key"),
        F.avg("_cnt").alias("avg_rows_per_key"),
        F.expr("percentile_approx(_cnt, 0.99, 10000)").alias(
            "p99_rows_per_key"
        ),
    ).collect()[0]
    d = row.asDict()
    d["skew_ratio"] = (
        d["max_rows_per_key"] / d["avg_rows_per_key"]
        if d["avg_rows_per_key"]
        else 0.0
    )
    return d


def derive_salt_factor(
    stats: dict[str, float], max_salts: int = 64, engage_at: float = 2.0
) -> int:
    """Salt replication factor from a :func:`key_skew_stats` report.

    Spreads the HOTTEST key: factor = ⌈max / avg⌉ (``skew_ratio``) —
    enough salts that the worst key lands ~avg-sized slices per reducer
    — clamped to ``max_salts`` (the replicated small side's shuffle
    volume grows linearly with the factor, so an extreme ratio caps out
    rather than exploding the dimension broadcast).  max/avg is the
    signal, NOT p99/avg: the canonical skew case is ONE mega-hot key
    among thousands of uniform ones, where the hot key sits far above
    the 99th percentile and p99 ≈ avg — a p99-based trigger silently
    runs the plain join exactly when salting is needed.  p99/avg stays
    as a secondary signal (and the fallback when a caller-built stats
    dict carries no max) — max/avg always dominates it when both are
    present.  Below ``engage_at`` the skew isn't worth the
    replication cost and the factor is 1 (= don't salt; AQE's runtime
    skew split handles residual imbalance)."""
    import math

    avg = stats.get("avg_rows_per_key") or 0.0
    if avg <= 0:
        return 1
    mx = stats.get("max_rows_per_key") or 0.0
    p99 = stats.get("p99_rows_per_key") or 0.0
    ratio = max(
        stats.get("skew_ratio") or (mx / avg if mx else 0.0), p99 / avg
    )
    if ratio < engage_at:
        return 1
    return max(1, min(max_salts, math.ceil(ratio)))


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """ANALYZE-style column profile in ONE scan: per column, row count,
    NULL count, exact distinct count, and min/max (cast to string for a
    uniform tall schema — lexicographic ordering is NOT implied; the
    values are the column's own type ordering, stringified for
    transport).

    The stats a cost-based planner, a data contract, or a layout
    decision (bucket count, z-order column choice) feeds on.  All
    aggregates ride one pass over the scan; the exact distinct counts
    expand the aggregate (one shuffle per distinct in Spark's plan) —
    at 100 TB swap ``count_distinct`` for ``approx_count_distinct``
    (HLL) with the same output shape, the usual exactness/one-pass
    trade.  Output: |cols| rows (column, n_rows, n_nulls, ndv,
    min_value, max_value)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"_ndv_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nulls"),
                F.col(f"_ndv_{c}").alias("ndv"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("_r")).select("_r.*")
