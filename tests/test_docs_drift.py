"""Generated-docs drift gate (VERDICT r10 #6).

The round-10 catalog count drifted 217→228→231→234→236 mid-round and
was hand-synced into QUERIES.md / README.md / SURVEY.md five separate
times.  These tests make the sync mechanical: QUERIES.md must equal a
fresh render of the live registry byte-for-byte, and every canonical
"N entries, F full-oracle / R rows-only" count line in the prose docs
must state the live numbers.  A deliberate stale-count edit (or adding
a catalog entry without regenerating) fails here, not in a judge pass.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

#: Canonical count-line shape shared by README.md and SURVEY.md prose.
_COUNT_RE = re.compile(
    r"\b(\d+) entries, (\d+) full-oracle / (\d+) rows-only"
)


def _live_counts():
    from hfp_loader_spark.plans.catalog import REGISTRY

    total = len(REGISTRY)
    full = sum(1 for s in REGISTRY.values() if s.oracle)
    return total, full, total - full


def test_queries_md_matches_live_registry():
    """QUERIES.md is generated — the committed file must equal a fresh
    render (so `python tools/gen_query_docs.py` is a no-op on a clean
    tree)."""
    from gen_query_docs import render

    committed = (REPO / "QUERIES.md").read_text()
    assert committed == render(), (
        "QUERIES.md is stale — run `python tools/gen_query_docs.py`"
    )


def test_prose_docs_state_live_catalog_counts():
    """Every 'N entries, F full-oracle / R rows-only' line in README.md
    and SURVEY.md must state the LIVE registry counts — no exemptions:
    a historical snapshot that should stay frozen must be worded so it
    doesn't match the canonical count-line shape (e.g. 'closed round 10
    at 236 entries (232 ✓)'), which keeps exactly one greppable format
    for the CURRENT truth."""
    total, full, rows_only = _live_counts()
    stale = []
    for doc in ("README.md", "SURVEY.md"):
        for line in (REPO / doc).read_text().splitlines():
            m = _COUNT_RE.search(line)
            if not m:
                continue
            got = tuple(int(x) for x in m.groups())
            if got != (total, full, rows_only):
                stale.append(f"{doc}: {line.strip()[:120]}")
    assert not stale, (
        f"stale catalog counts (live: {total} entries, {full} "
        f"full-oracle / {rows_only} rows-only):\n" + "\n".join(stale)
    )
