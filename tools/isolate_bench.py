"""Isolate one or more catalog entries with the bench's exact
methodology (noop sink, min-of-3, labelled jobs) — guide §1.4/§1.5.

Usage: python tools/isolate_bench.py <sf_dir> <entry> [<entry> ...]
Prints one line per entry: name, build_sec, [run1 run2 run3] sorted.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from hfp_loader_spark.plans import catalog
    from hfp_loader_spark.session import get_spark

    spark = get_spark(app_name="isolate_bench")

    # same warmup as bench.py's flagship warmup
    catalog.REGISTRY["q1_pricing_summary"].builder(
        spark, sf_dir
    ).write.format("noop").mode("overwrite").save()

    for name in names:
        builder = catalog.REGISTRY[name].builder
        t0 = time.perf_counter()
        builder(spark, sf_dir)
        build = time.perf_counter() - t0
        runs = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(
            f"ISO {name} build={build:.3f} runs={sorted(runs)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
