"""CLI entry point — the reference's ``yarn start <date>`` surface.

Reference: /root/reference/index.ts:9-34 — one positional ISO date,
validated, then the full day load; non-zero exit on failure.  Config
comes from flags or environment (the reference's constants.ts env
surface maps onto SPARK_GRAFT_* / HFP_* variables).

Usage::

    python -m hfp_loader_spark 2021-02-09 \
        --storage-root /data/hfp --sink parquet:/data/stage
    python -m hfp_loader_spark 2021-02-09 \
        --storage-root abfss://container@acct.dfs.core.windows.net/hfp \
        --sink jdbc:postgresql://host/db --streaming
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hfp_loader_spark",
        description="Load one calendar day of HFP events (reference parity).",
    )
    p.add_argument("date", help="ISO date of the day to load (index.ts:9)")
    p.add_argument(
        "--storage-root",
        default=os.environ.get("HFP_STORAGE_ROOT", "."),
        help="blob/file root containing csv/<EventGroup>/ (default: $HFP_STORAGE_ROOT)",
    )
    p.add_argument(
        "--sink",
        default=os.environ.get("HFP_SINK", "parquet:./stage"),
        help="'parquet:<dir>' staging sink, 'versioned:<dir>' snapshot-versioned sink, or a 'jdbc:…' URL "
        "(default: $HFP_SINK or parquet:./stage)",
    )
    p.add_argument(
        "--streaming",
        action="store_true",
        help="use the Structured Streaming load (availableNow + watermark "
        "dedup) instead of the batch anti-join pipeline",
    )
    p.add_argument("--master", default=None, help="Spark master override")
    return p


def make_sink(spec: str):
    from hfp_loader_spark.sink import (
        JdbcSink,
        ParquetSink,
        VersionedParquetSink,
    )

    if spec.startswith("jdbc:"):
        return JdbcSink(spec)
    if spec.startswith("versioned:"):
        return VersionedParquetSink(spec.split(":", 1)[1])
    if spec.startswith("parquet:"):
        return ParquetSink(spec.split(":", 1)[1])
    return ParquetSink(spec)


def build_query_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hfp_loader_spark query",
        description="Run a catalog query (SURVEY §2 inventory) by name.",
    )
    p.add_argument(
        "name",
        nargs="?",
        help="catalog entry name (omit with --list to enumerate)",
    )
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="parquet table dir (default: $SPARK_GRAFT_SF_DIR or sf0.01)",
    )
    p.add_argument("--show", type=int, default=20, help="rows to print")
    p.add_argument(
        "--explain",
        action="store_true",
        help="print the formatted physical plan instead of rows",
    )
    p.add_argument(
        "--list", action="store_true", help="list catalog entry names"
    )
    p.add_argument("--master", default=None, help="Spark master override")
    return p


def query_main(argv: list[str]) -> int:
    args = build_query_parser().parse_args(argv)
    from hfp_loader_spark.plans.catalog import REGISTRY

    if args.list:
        for name, spec in REGISTRY.items():
            mark = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t{mark}\t{spec.module}")
        return 0
    if not args.name:
        print("query name required (or --list)", file=sys.stderr)
        return 2
    if args.name not in REGISTRY:
        print(f"unknown query: {args.name!r} (try --list)", file=sys.stderr)
        return 2

    from hfp_loader_spark.session import get_spark

    spark = get_spark(app_name=f"query_{args.name}", master=args.master)
    df = REGISTRY[args.name].builder(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.show, truncate=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "query":
        return query_main(argv[1:])
    args = build_parser().parse_args(argv)

    from hfp_loader_spark.job import hfp_load, validate_date
    from hfp_loader_spark.session import get_spark

    try:
        validate_date(args.date)
    except ValueError:
        # index.ts:12-21: invalid date → error + non-zero exit
        print(f"Invalid date argument: {args.date!r} (expected ISO date)", file=sys.stderr)
        return 2

    spark = get_spark(app_name=f"hfp_load_{args.date}", master=args.master)
    sink = make_sink(args.sink)
    if args.streaming:
        from hfp_loader_spark.schema import EVENT_GROUPS
        from hfp_loader_spark.streaming.hfp_stream import hfp_stream_load

        for group in EVENT_GROUPS:  # reference group order, hfpTask.ts:83-86
            hfp_stream_load(spark, args.storage_root, group, args.date, sink)
        print(f"[hfp_loader_spark] streaming load complete for {args.date}")
        return 0
    report = hfp_load(spark, args.storage_root, args.date, sink)
    # the reference's end-of-run counters (hfpTask.ts:27-31 status surface)
    for table, n in sorted(report.inserted_by_table.items()):
        print(f"[hfp_loader_spark] {table}: {n} rows inserted")
    print(f"[hfp_loader_spark] total: {report.total_inserted} rows for {args.date}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
