"""Sharded test runner (VERDICT r10 #3): the full suite is ~31 min in
one process; this splits the test MODULES across N concurrent pytest
processes — each with its own session-scoped Spark JVM — and brings the
wall under the max-shard time (~10-12 min with 4 shards on 32 CPUs,
dominated by the fuzz/oracle modules).

Design choices:
- module-level sharding (not per-test) keeps every session-scoped
  fixture and every cross-test invariant inside one process exactly as
  the plain run has them — the same 568+ tests are collected, no test
  semantics change;
- shards are packed by greedy longest-processing-time over a measured
  weight table (seconds; unmeasured modules fall back to line count as
  a rough proxy), so the known-heavy modules (differential fuzz, the
  oracle replay, plan audit) land on different shards;
- each shard gets SPARK_GRAFT_CPUS = total/N so the N local[M] JVMs
  don't oversubscribe the box, and its own pytest basetemp.

Usage: python tools/run_tests_sharded.py [--shards 4] [pytest args...]
Exit code is nonzero if any shard fails; per-shard logs land in
/tmp/test_shard_<i>.log and the combined tail is printed on failure.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Measured single-process wall seconds per module (r11 host; the exact
#: numbers only matter relative to each other for packing).  Unlisted
#: modules use line-count/3 as a proxy.
WEIGHTS = {
    "test_differential_fuzz.py": 600,
    "test_queries_oracle.py": 420,
    "test_plan_audit.py": 280,
    "test_similarity.py": 280,  # r11: +7 twin-lock / model-store tests
    "test_properties.py": 180,
    "test_streaming.py": 150,
    "test_neardup.py": 120,
    "test_relational.py": 100,
    "test_pipeline.py": 90,
    "test_sampling_ops.py": 80,
    "test_hfp_stream.py": 80,
    "test_clustering.py": 70,
    "test_analytics.py": 70,
}


#: Module whose dominant test iterates the whole catalog and honors the
#: FUZZ_SHARD=i/n env slice — scheduled as one slice per shard so the
#: single biggest module no longer bounds the wall (at 237 entries the
#: unsliced sweep alone runs ~17 min).
FUZZ_MODULE = "test_differential_fuzz.py"


def pack(
    files: list[str], shards: int
) -> list[tuple[list[str], dict[str, str]]]:
    def weight(path: str) -> float:
        name = os.path.basename(path)
        if name in WEIGHTS:
            return WEIGHTS[name]
        with open(path) as fh:
            return sum(1 for _ in fh) / 3.0

    fuzz = [f for f in files if os.path.basename(f) == FUZZ_MODULE]
    rest = [f for f in files if os.path.basename(f) != FUZZ_MODULE]
    buckets: list[tuple[float, list[str], dict[str, str]]] = [
        (0.0, [], {}) for _ in range(shards)
    ]
    if fuzz and shards > 1:
        # one registry slice per shard; the module's few fixed-list
        # tests repeat per slice (cheap), the catalog sweep partitions
        per = weight(fuzz[0]) / shards + 60
        buckets = [
            (per, [fuzz[0]], {"FUZZ_SHARD": f"{i}/{shards}"})
            for i in range(shards)
        ]
    elif fuzz:
        buckets[0] = (weight(fuzz[0]), [fuzz[0]], {})
    for f in sorted(rest, key=weight, reverse=True):
        w, members, env = min(buckets, key=lambda b: b[0])
        buckets.remove((w, members, env))
        members.append(f)
        buckets.append((w + weight(f), members, env))
    return [(members, env) for _, members, env in sorted(
        buckets, key=lambda b: b[0], reverse=True
    )]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=os.cpu_count() or 8,
                    help="total CPUs to split across shards")
    ap.add_argument("pytest_args", nargs="*", default=[])
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    groups = [g for g in pack(files, args.shards) if g[0]]
    per_shard_cpus = max(2, args.cpus // max(1, len(groups)))

    t0 = time.time()
    procs = []
    for i, (group, extra_env) in enumerate(groups):
        env = dict(os.environ)
        env.update(extra_env)
        env["SPARK_GRAFT_CPUS"] = str(per_shard_cpus)
        env.setdefault("SPARK_DRIVER_MEMORY", "8g")
        log = open(f"/tmp/test_shard_{i}.log", "w")
        cmd = [
            sys.executable, "-m", "pytest", *group, "-q",
            "--basetemp", f"/tmp/test_shard_{i}_tmp",
            *args.pytest_args,
        ]
        procs.append((i, group, log,
                      subprocess.Popen(cmd, cwd=REPO, env=env,
                                       stdout=log, stderr=subprocess.STDOUT)))
        tag = f" [{extra_env['FUZZ_SHARD']}]" if "FUZZ_SHARD" in extra_env else ""
        print(f"shard {i}: {len(group)} modules{tag} "
              f"({', '.join(os.path.basename(g) for g in group[:4])}"
              f"{', …' if len(group) > 4 else ''})")

    rc = 0
    for i, group, log, p in procs:
        p.wait()
        log.close()
        tail = open(f"/tmp/test_shard_{i}.log").read().strip().splitlines()
        summary = tail[-1] if tail else "(no output)"
        print(f"shard {i}: rc={p.returncode}  {summary}")
        if p.returncode != 0:
            rc = 1
            print("\n".join(tail[-30:]))
    print(f"total wall: {time.time() - t0:.0f}s across {len(groups)} shards")
    return rc


if __name__ == "__main__":
    sys.exit(main())
