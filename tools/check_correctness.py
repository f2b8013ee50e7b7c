"""Local replica of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on a given sf dir through
Spark AND (where declared) the matching ``oracle_sql()`` through DuckDB,
then compares row count, column-name set, and order-insensitive values
(columns sorted by name, rows sorted, floats compared via repr after the
query's own rounding — mirroring the driver's value-hash).

Usage:  python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonicalize -0.0 and int-valued floats
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, (datetime.datetime,)):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return _norm_cell(float(v))
    except ImportError:
        pass
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


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
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle, rows-only)")
            n_rows_only += 1
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sc, sr = _norm_rows(scols, srows)
        oc, orr = _norm_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: schema spark={sc} oracle={oc}")
            n_fail += 1
        elif len(sr) != len(orr):
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
