"""Local replica of the driver's t2 correctness gate — bit-faithful.

Runs every ``__spark_entry__.queries()`` entry on a given sf dir through
Spark AND (where declared) the matching ``oracle_sql()`` through DuckDB,
then compares row count, column-name set, and order-insensitive values.

Round-12 lesson (VERDICT r12 #3): the previous ``_norm_cell`` was WEAKER
than the driver's hash in exactly two ways that let real divergences
reach the driver undetected —

- it collapsed int-valued floats (``-0.0`` → ``"0"``), masking the
  ``sim_rp_distortion`` negative-zero hash flip (DuckDB ``round()``
  preserves the sign of a tiny negative; Spark returns ``+0.0``);
- it stringified lists, masking ``sim_random_projection``'s
  ``array<double>`` output column, which the driver's pandas
  ``sort_values`` canonicalization cannot factorize
  (``TypeError: unhashable type: 'list'``).

This version replicates the driver's canonicalization shape: both
results are materialized as pandas frames (Spark ``toPandas()``, DuckDB
``.df()`` — so engine→pandas dtype promotions like DuckDB HUGEINT →
float64 are visible, exactly as the driver sees them), columns sorted
by name, rows sorted via pandas ``sort_values`` over ALL columns (which
raises the driver's own TypeError on non-scalar cells), and cells
compared at repr-level float identity — ``-0.0`` ≠ ``0.0``,
``2`` ≠ ``2.0``.  Anything this gate passes, the driver's hash passes;
anything the driver would reject, this gate rejects first.

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SCALAR_BAD = ("array", "map", "struct")


def _strict_cell(v) -> str:
    """Normalize one pandas cell to a driver-hash-faithful string.

    Float identity is repr-level: preserves the ``-0.0``/``0.0``
    distinction and the int/float distinction (``2`` vs ``2.0``) — the
    two collapses that hid r12's driver failures.  NaN ≡ NULL because
    pandas itself represents SQL NULL as NaN in promoted numeric
    columns (symmetric across both engines, as at the driver).
    """
    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        # DuckDB DATE arrives in pandas as a midnight datetime64; Spark
        # DateType arrives as datetime.date objects — unify the rendering.
        return v.isoformat() + " 00:00:00"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple, dict, set)) or hasattr(v, "__array__"):
        # The driver's canonicalizer cannot hash these (r12
        # sim_random_projection err) — fail loudly, never stringify.
        raise TypeError(f"unhashable type: {type(v).__name__!r}")
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return repr(float(v))
    except ImportError:
        pass
    return str(v)


def canon_cells(pdf) -> list[tuple[str, ...]]:
    """Canonical sorted string matrix for a pandas frame.

    Cells are normalized FIRST (so ``-0.0`` and ``0.0`` — which compare
    equal and would tie under ``sort_values`` — sort deterministically),
    then rows are sorted on the normalized tuples.  The driver-parity
    TypeError on non-scalar cells comes from ``_strict_cell`` itself
    (same ``unhashable type`` message as the driver's ``sort_values``) —
    running a full pandas mergesort just for that side effect would
    double the gate's sort cost for a discarded result.
    """
    cols = sorted(pdf.columns)
    rows = [
        tuple(_strict_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


# Back-compat shims for tests that import the tuple-based normalizers
# (tests/test_differential_fuzz.py).  Same strict semantics, fed from
# collect()/fetchall() tuples instead of pandas frames.
def _norm_cell(v):
    return _strict_cell(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_strict_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def _spark_frame(sdf):
    import pandas as pd

    for f in sdf.schema.fields:
        tn = f.dataType.typeName()
        if tn in _SCALAR_BAD:
            raise TypeError(
                f"non-scalar output column {f.name!r} ({tn}): the driver's"
                " canonicalizer cannot hash it — reshape the entry to"
                " scalar columns"
            )
    pdf = sdf.toPandas()
    return pd.DataFrame(pdf)


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from hfp_loader_spark.plans.catalog import TABLES

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Deliberately a PLAIN session — no hfp_loader_spark.session factory —
    # to faithfully replicate the driver's t2 gate (round 2 failure mode:
    # confs that exist only in our factory).  The catalog must self-configure.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = _spark_frame(sdf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            try:
                srows = canon_cells(spdf)
            except Exception as e:  # noqa: BLE001
                print(f"FAIL  {name}: canon raised {type(e).__name__}: {e}")
                n_fail += 1
                continue
            print(f"rows  {name}: {len(srows)} rows (no oracle, rows-only)")
            n_rows_only += 1
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sc, oc = sorted(spdf.columns), sorted(opdf.columns)
        if sc != oc:
            print(f"FAIL  {name}: schema spark={sc} oracle={oc}")
            n_fail += 1
            continue
        try:
            sr = canon_cells(spdf)
            orr = canon_cells(opdf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: canon raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL  {name}: rows spark={len(sr)} oracle={len(orr)}")
            n_fail += 1
        elif sr != orr:
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs {diffs}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sr)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
