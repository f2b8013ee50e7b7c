"""Attribution report over a bench run's BENCH_DETAIL.json.

Reads the detail artifact (and optionally the previous round's usable
query map, via bench._load_prev_queries) and classifies every ≥1.25×
regression mechanically, using the same evidence the r14/r15 verdicts
had to reconstruct by hand:

- ``host-band``   — the per-entry ratio is within the JVM-calib host
                    ratio × a jitter allowance;
- ``build-bound`` — ≥60% of the entry's wall is driver-side plan
                    construction (py4j / bounded driver rounds), which
                    tracks host Python speed, not plan quality;
- ``jitter``      — the regression fits inside the entry's own
                    [min..max] run spread (the within_spread heuristic);
- ``investigate`` — none of the above: a genuine plan-change suspect.

Usage: ``python tools/bench_report.py [BENCH_DETAIL.json]``
Prints a human table; exits 0 always (reporting, not gating).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

#: Previous rounds' published JVM calib to normalize against (r13 build
#: host — the last round with a parseable driver BENCH before the r15
#: channel fix).  Override with the REF_CALIB env var when comparing
#: against a different round.
DEFAULT_REF_CALIB = 1.748

#: Multiplicative slack on the host ratio before a regression stops
#: counting as host-band (scheduling jitter rides on top of CPU speed).
HOST_BAND_SLACK = 1.15


def classify(detail: dict, ref_calib: float) -> list[dict]:
    build = detail.get("queries_build") or {}
    times = detail.get("queries") or {}
    host_ratio = (detail.get("calib_sec") or ref_calib) / ref_calib
    out = []
    for reg in detail.get("regressions_1p25x") or []:
        name = reg["query"]
        ratio = reg["ratio"]
        b = build.get(name)
        t = times.get(name)
        build_frac = (b / t) if (b and t) else None
        if ratio <= host_ratio * HOST_BAND_SLACK:
            kind = "host-band"
        elif build_frac is not None and build_frac >= 0.6:
            kind = "build-bound"
        elif reg.get("within_spread_heuristic"):
            kind = "jitter"
        else:
            kind = "investigate"
        out.append(
            {
                "query": name,
                "ratio": ratio,
                "class": kind,
                "build_frac": round(build_frac, 2)
                if build_frac is not None
                else None,
                "host_ratio": round(host_ratio, 3),
            }
        )
    return out


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
    ref = float(os.environ.get("REF_CALIB", DEFAULT_REF_CALIB))
    with open(path) as fh:
        detail = json.load(fh)
    host_ratio = (detail.get("calib_sec") or ref) / ref
    print(
        f"value={detail.get('value')}  calib={detail.get('calib_sec')}"
        f" (host {host_ratio:.3f}× vs ref {ref})"
        f"  arrow={detail.get('calib_arrow_sec')}"
        f"  ratio_vs_prev={detail.get('ratio_vs_prev_common')}"
    )
    rows = classify(detail, ref)
    if not rows:
        print("no ≥1.25× regressions")
        return 0
    w = max(len(r["query"]) for r in rows)
    for r in rows:
        bf = "" if r["build_frac"] is None else f"  build_frac={r['build_frac']}"
        print(f"{r['query']:{w}s}  {r['ratio']:>5}  {r['class']}{bf}")
    hot = [r["query"] for r in rows if r["class"] == "investigate"]
    print(
        f"\n{len(rows)} regressions: "
        + ", ".join(
            f"{k}={sum(1 for r in rows if r['class'] == k)}"
            for k in ("host-band", "build-bound", "jitter", "investigate")
        )
    )
    if hot:
        print("investigate: " + ", ".join(hot))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
