"""Dump ``explain("formatted")`` for catalog entries to files.

Usage: python tools/dump_plans.py OUT_DIR SUFFIX [sf_dir] QUERY [QUERY ...]

Writes ``OUT_DIR/<query>_<SUFFIX>.txt`` per query — the before/after
plan evidence the optimization rounds commit under ``plans/r16/``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest
    os.makedirs(out_dir, exist_ok=True)

    from hfp_loader_spark.plans.catalog import REGISTRY
    from hfp_loader_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
