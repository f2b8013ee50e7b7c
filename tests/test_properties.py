"""Property-based invariants (SURVEY §5.3) + the zero-UDF plan guard."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hfp_loader_spark.operators.dedup import exact_dedup, filter_valid_uuid
from hfp_loader_spark.operators.transform import typed_projection
from hfp_loader_spark.schema import HFP_COLUMNS, HFP_TYPE_MAP, RAW_SCHEMA

# Garbage-heavy raw cell values: every coercion path, incl. traps.
_cell = st.one_of(
    st.just(""),
    st.just("0"),
    st.just("false"),
    st.just("true"),
    st.just("NaN"),
    st.just("garbage"),
    st.just("2.5"),
    st.just("-17"),
    st.just("1612851330000"),
    st.just("2021-02-09T06:15:30.000Z"),
    st.text(alphabet="abc019.-", min_size=0, max_size=12),
)

_row = st.lists(_cell, min_size=len(HFP_COLUMNS), max_size=len(HFP_COLUMNS))


@pytest.fixture(scope="module")
def mk_raw(spark):
    def make(rows):
        return spark.createDataFrame([tuple(r) for r in rows], RAW_SCHEMA)

    return make


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, min_size=1, max_size=8))
def test_typed_projection_domains(spark, mk_raw, rows):
    """Whatever the input garbage: booleans are TRUE/NULL (never FALSE),
    numerics are non-zero/NULL (the falsy→NULL trap), strings never empty,
    and row count is preserved (projection drops nothing)."""
    typed = typed_projection(mk_raw(rows))
    assert typed.count() == len(rows)
    collected = typed.collect()
    for r in collected:
        for name in HFP_COLUMNS:
            kind = HFP_TYPE_MAP.get(name, "string")
            v = r[name]
            if v is None:
                continue
            if kind == "boolean":
                assert v is True
            elif kind in ("int", "bigint", "float"):
                assert v != 0
            elif kind == "string":
                assert v != ""


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, min_size=1, max_size=6), data=st.data())
def test_uuid_filter_and_dedup_counts(spark, mk_raw, rows, data):
    """count(valid) = total - empties; exact_dedup is idempotent and
    produces exactly the distinct key count."""
    uuids = data.draw(
        st.lists(
            st.sampled_from(["", "k1", "k2", "k3"]),
            min_size=len(rows),
            max_size=len(rows),
        )
    )
    uuid_idx = HFP_COLUMNS.index("uuid")
    rows2 = [
        tuple(list(r[:uuid_idx]) + [u] + list(r[uuid_idx + 1 :]))
        for r, u in zip(rows, uuids)
    ]
    raw = spark.createDataFrame(rows2, RAW_SCHEMA)
    valid = filter_valid_uuid(raw)
    assert valid.count() == sum(1 for u in uuids if u)
    deduped = exact_dedup(valid, ["uuid"])
    assert deduped.count() == len({u for u in uuids if u})
    assert exact_dedup(deduped, ["uuid"]).count() == deduped.count()


def test_no_python_row_udfs_in_catalog_plans(spark, sf_dir):
    """SURVEY §2.10: zero row-at-a-time Python UDFs anywhere.  Arrow-batched
    mapInPandas/applyInPandasWithState (multimodal + stateful entries) are
    the sanctioned exceptions; BatchEvalPython (per-row pickling) is not."""
    from hfp_loader_spark.plans.catalog import REGISTRY

    for name, spec in REGISTRY.items():
        if name.startswith("streaming"):
            continue  # streaming plans analyzed at start(); skip the run
        df = spec.builder(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name


# --- r2 operator invariants: merge_upsert / scd2 / connected_components ---

_kv_rows = st.lists(
    st.tuples(st.integers(0, 20), st.text("ab", min_size=1, max_size=3)),
    min_size=0,
    max_size=15,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=_kv_rows, source=_kv_rows)
def test_merge_upsert_invariants(spark, target, source):
    """Keys(result) = keys(target) ∪ keys(source); every source key holds
    the source's value; target-only keys are untouched."""
    from hfp_loader_spark.operators.relational import merge_upsert

    # merge contract: source key-unique (last writer wins for the build)
    src_map = dict(source)
    tgt_map = dict(target)
    t = spark.createDataFrame(
        list(tgt_map.items()) or [(99999, "z")], ["k", "v"]
    )
    s_items = list(src_map.items())
    s = (
        spark.createDataFrame(s_items, ["k", "v"])
        if s_items
        else spark.createDataFrame([], t.schema)
    )
    if not tgt_map:
        tgt_map = {99999: "z"}
    got = {r["k"]: r["v"] for r in merge_upsert(t, s, ["k"]).collect()}
    want = {**tgt_map, **src_map}
    assert got == want


_events = st.lists(
    st.tuples(
        st.integers(1, 3),           # key
        st.sampled_from(["a", "b", "c"]),  # state
        st.integers(0, 50),          # ts (seconds offset)
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda e: (e[0], e[2]),  # one event per (key, ts)
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_events)
def test_scd2_intervals_partition_the_timeline(spark, events):
    """Per key: intervals are ordered, non-overlapping, chain exactly
    (valid_to = next valid_from), exactly one open interval, and states
    never repeat consecutively."""
    import datetime

    from hfp_loader_spark.operators.relational import scd2_intervals

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (k, s, base + datetime.timedelta(seconds=ts)) for k, s, ts in events
    ]
    df = spark.createDataFrame(rows, ["k", "state", "ts"])
    out = scd2_intervals(df, "k", "state", "ts").collect()
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for k, ivs in by_key.items():
        ivs.sort(key=lambda r: r["valid_from"])
        opens = [r for r in ivs if r["valid_to"] is None]
        assert len(opens) == 1 and opens[0] is ivs[-1]
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]  # chained, no gaps
            assert a["state"] != b["state"]          # compressed


_edges = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges)
def test_connected_components_match_union_find(spark, edges):
    from hfp_loader_spark.operators.graph import connected_components

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent[find(a)] = find(b)

    for a, b in edges:
        union(a, b)
    want = {}
    for v in parent:
        want.setdefault(find(v), set()).add(v)
    want_sets = sorted(tuple(sorted(s)) for s in want.values())

    df = spark.createDataFrame(edges, ["src", "dst"])
    got_rows = connected_components(df).collect()
    got: dict = {}
    for r in got_rows:
        got.setdefault(r["component"], set()).add(r["id"])
    got_sets = sorted(tuple(sorted(s)) for s in got.values())
    assert got_sets == want_sets
    # canonical label = min member of its component
    for comp, members in got.items():
        assert comp == min(members)


# Random small event streams for the funnel property: few users and a
# coarse timestamp grid force collisions (same user, same second) so the
# strict-ordering tie rule is actually exercised.
_funnel_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),  # user_id
        st.integers(min_value=0, max_value=30),  # seconds offset
        st.sampled_from(["view", "click", "purchase", "other"]),
    ),
    min_size=1,
    max_size=25,
)


def _funnel_model(rows, steps):
    """Brute-force reference: per user, scan events in (ts, event_id)
    order keeping the running min anchor per step with strict-after."""
    import datetime

    per_user: dict = {}
    for eid, (u, sec, typ) in enumerate(rows):
        ts = datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec)
        per_user.setdefault(u, []).append((ts, eid, typ))
    counts = [0] * len(steps)
    for evs in per_user.values():
        evs.sort()
        anchors = [None] * len(steps)
        for ts, _eid, typ in evs:
            for i, s in enumerate(steps):
                if typ != s:
                    continue
                if i > 0 and (anchors[i - 1] is None or ts <= anchors[i - 1]):
                    continue
                if anchors[i] is None or ts < anchors[i]:
                    anchors[i] = ts
        for i in range(len(steps)):
            if anchors[i] is not None:
                counts[i] += 1
    return counts


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_funnel_events)
def test_funnel_twins_match_reference_model(spark, rows):
    """Both funnel strategies == the brute-force per-user scan model."""
    import datetime

    from hfp_loader_spark.operators.relational import (
        funnel_counts,
        funnel_counts_windowed,
    )

    steps = ["view", "click", "purchase"]
    df = spark.createDataFrame(
        [
            (
                eid,
                datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec),
                u,
                typ,
            )
            for eid, (u, sec, typ) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    want = _funnel_model(rows, steps)
    got_w = {
        r["step_idx"]: r["n_users"]
        for r in funnel_counts_windowed(df, steps).collect()
    }
    got_j = {
        r["step_idx"]: r["n_users"] for r in funnel_counts(df, steps).collect()
    }
    assert [got_w[i] for i in (1, 2, 3)] == want
    assert [got_j[i] for i in (1, 2, 3)] == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges, data=st.data())
def test_khop_matches_python_bfs(spark, edges, data):
    from hfp_loader_spark.operators.graph import khop_reachability

    nodes = sorted({v for e in edges for v in e})
    seeds = data.draw(
        st.lists(st.sampled_from(nodes), min_size=1, max_size=3, unique=True)
    )
    k = data.draw(st.integers(min_value=0, max_value=3))

    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, k + 1):
        frontier = {
            n for f in frontier for n in adj.get(f, ()) if n not in want
        }
        for n in frontier:
            want[n] = h
    df_edges = spark.createDataFrame(edges, ["src", "dst"])
    df_seeds = spark.createDataFrame([(s,) for s in seeds], ["id"])
    got = {
        r["node"]: r["hops"]
        for r in khop_reachability(df_edges, df_seeds, k=k).collect()
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    probes=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=40,
    ),
)
def test_bloom_never_false_negative(spark, keys, probes):
    """For ANY key set: every inserted key probes TRUE (hard theorem of
    the construction), and every DISTINCT probe gets exactly one verdict
    row.  The probe frame deliberately carries DUPLICATE keys (each
    inserted key is probed twice, and the hypothesis probe list is not
    unique) — regression for the exploded-join formulation that scored a
    twice-probed key 2k set-bit hits ≠ k and reported it absent."""
    from hfp_loader_spark.operators.sketches import bloom_build, bloom_contains

    inserted = spark.createDataFrame([(k,) for k in keys], "k long")
    bloom = bloom_build(inserted, "k", num_bits=512, num_hashes=4)
    probe_df = spark.createDataFrame(
        [(p,) for p in probes + keys + keys], "k long"
    )
    out = {
        r["k"]: r["maybe_present"]
        for r in bloom_contains(
            bloom, probe_df, "k", num_bits=512, num_hashes=4
        ).collect()
    }
    assert len(out) == len(set(probes) | set(keys))
    assert all(out[k] for k in keys)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=10_000),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    cap=st.integers(min_value=1, max_value=8),
)
def test_per_group_cap_invariants(spark, rows, cap):
    """For ANY input: ≤cap rows per group, output ⊆ input, groups at or
    under the cap pass through whole, and the SAME rows survive a
    re-run (content-deterministic selection)."""
    from collections import Counter

    from hfp_loader_spark.operators.sampling import per_group_cap

    df = spark.createDataFrame(rows, "g string, k long")
    out1 = {(r["g"], r["k"]) for r in per_group_cap(df, "g", cap, "k").collect()}
    out2 = {(r["g"], r["k"]) for r in per_group_cap(df, "g", cap, "k").collect()}
    assert out1 == out2  # deterministic
    assert out1 <= set(rows)
    in_sizes = Counter(g for g, _ in rows)
    out_sizes = Counter(g for g, _ in out1)
    for g, n in in_sizes.items():
        assert out_sizes[g] == min(n, cap)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdefgh"),  # tiny vocab → dense collisions
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(min_value=2, max_value=4),
)
def test_remove_duplicate_spans_reference_model(spark, docs, n):
    """Differential check against a direct python model of the contract:
    for every duplicated n-gram (≥2 occurrences corpus-wide), the
    corpus-wide first occurrence (min (doc_id, pos)) is canonical and
    every other occurrence's covered positions are excised; output text
    is the space-join of surviving tokens IN ORDER.  Also pins the
    arithmetic invariant n_removed = n_tokens - len(out_tokens)."""
    from hfp_loader_spark.operators.text import remove_duplicate_spans

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]

    # reference model
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for i, toks in enumerate(docs):
        for p in range(len(toks) - n + 1):
            occ.setdefault(tuple(toks[p : p + n]), []).append((i, p))
    removed: dict[int, set[int]] = {i: set() for i in range(len(docs))}
    for gram, sites in occ.items():
        if len(sites) < 2:
            continue
        canon = min(sites)
        for d, p in sites:
            if (d, p) != canon:
                removed[d].update(range(p, p + n))
    want = {
        i: (
            " ".join(
                t for j, t in enumerate(toks) if j not in removed[i]
            ),
            len(toks),
            len(removed[i]),
        )
        for i, toks in enumerate(docs)
    }

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(df, n=n).collect()
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=2**45),
        min_size=1,
        max_size=60,
    ),
    qs=st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=4,
        unique=True,
    ),
    sub_bits=st.integers(min_value=2, max_value=7),
)
def test_qhist_quantile_bounds_and_mergeability(spark, vals, qs, sub_bits):
    """For ANY non-negative value multiset and ANY q: the histogram
    estimate never exceeds the true rank value, the true value sits
    within the bucket's relative width (true − est ≤ est·2^-sub_bits),
    and building one sketch over everything equals merging per-part
    sketches (the mergeability contract that makes persisted sketches
    answer later rollups)."""
    import math

    from hfp_loader_spark.operators.sketches import (
        qhist_build,
        qhist_merge,
        qhist_quantiles,
    )

    df = spark.createDataFrame(
        [(i % 3, v) for i, v in enumerate(vals)], "p int, v long"
    )
    merged = qhist_merge(qhist_build(df, "v", ["p"], sub_bits), [])
    whole = qhist_build(df, "v", None, sub_bits)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    est = {
        r["q"]: r["q_est"]
        for r in qhist_quantiles(merged, qs).collect()
    }
    xs = sorted(vals)
    for q in qs:
        true = xs[max(math.ceil(q * len(xs)), 1) - 1]
        assert est[q] <= true
        assert (true - est[q]) * (2**sub_bits) <= est[q] or est[q] == true


def test_qhist_ks_drift_planted_shift(spark):
    """Disjoint magnitude ranges → D = 1 (CDFs never overlap); an
    identically-distributed source scores D ≈ 0 against the pooled
    rest; the whole-corpus case yields no row (no rest side)."""
    from hfp_loader_spark.operators.sketches import qhist_ks_drift

    rows = (
        [("low", v) for v in range(10, 30)]          # small values
        + [("high", v * 100_000) for v in range(10, 30)]  # disjoint range
    )
    df = spark.createDataFrame(rows, "src string, v long")
    got = {r["src"]: r["ks_d"] for r in qhist_ks_drift(df, "v", "src").collect()}
    assert got["low"] == 1.0 and got["high"] == 1.0

    same = spark.createDataFrame(
        [("a", v) for v in range(100)] + [("b", v) for v in range(100)],
        "src string, v long",
    )
    got2 = {r["src"]: r["ks_d"] for r in qhist_ks_drift(same, "v", "src").collect()}
    assert got2["a"] == 0.0 and got2["b"] == 0.0

    solo = spark.createDataFrame([("only", 5)], "src string, v long")
    assert qhist_ks_drift(solo, "v", "src").count() == 0


# --- r9 session-3 operator invariants: apply_changelog / line dedup ---

_cdc_target = st.lists(
    st.tuples(st.integers(0, 12), st.text("xy", min_size=1, max_size=2)),
    min_size=1,
    max_size=8,
    unique_by=lambda r: r[0],
)
_cdc_changes = st.lists(
    st.tuples(
        st.integers(0, 12),                 # key
        st.integers(0, 5),                  # seq
        st.sampled_from(["I", "U", "D"]),   # op
        st.text("xy", min_size=1, max_size=2),
    ),
    min_size=0,
    max_size=15,
    unique_by=lambda r: (r[0], r[1], r[2], r[3]),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=_cdc_target, changes=_cdc_changes)
def test_apply_changelog_matches_dict_replay(spark, target, changes):
    """apply_changelog == the obvious dict model: per key the max
    (seq, op, payload) change wins; 'D' deletes, else the payload lands;
    untouched keys survive."""
    from hfp_loader_spark.operators.relational import apply_changelog

    t = spark.createDataFrame(target, ["k", "v"])
    c = (
        spark.createDataFrame(changes, ["k", "seq", "op", "v"])
        if changes
        else spark.createDataFrame([], "k int, seq int, op string, v string")
    )
    got = {
        r["k"]: r["v"]
        for r in apply_changelog(t, c, keys=["k"]).collect()
    }
    want = dict(target)
    winners: dict[int, tuple] = {}
    for k, seq, op, v in changes:
        cand = (seq, op, v)
        if k not in winners or cand > winners[k]:
            winners[k] = cand
    for k, (_, op, v) in winners.items():
        if op == "D":
            want.pop(k, None)
        else:
            want[k] = v
    assert got == want


_linedoc = st.lists(
    st.tuples(
        st.integers(1, 8),
        st.lists(
            st.sampled_from(["aa bb", "cc dd", "ee ff", "gg hh", ""]),
            min_size=0,
            max_size=4,
        ),
    ),
    min_size=1,
    max_size=6,
    unique_by=lambda r: r[0],
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_linedoc)
def test_dedup_lines_crossdoc_is_idempotent(spark, docs):
    """After one pass every surviving line is corpus-unique, so a second
    pass keeps everything (n_kept == n_lines for every document)."""
    from hfp_loader_spark.operators.text import dedup_lines_crossdoc

    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in docs],
        "doc_id int, text string",
    )
    once = dedup_lines_crossdoc(df, return_text=True).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = dedup_lines_crossdoc(once).collect()
    assert all(r["n_kept"] == r["n_lines"] for r in twice)


_lpa_edges = st.lists(
    st.tuples(st.integers(1, 8), st.integers(1, 8)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda e: (min(e), max(e)),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_lpa_edges)
def test_label_propagation_matches_python_model(spark, edges):
    """Synchronous LPA with min-label ties is a pure function of the
    edge set — replay it in plain Python and demand identical labels."""
    from collections import Counter

    from hfp_loader_spark.operators.graph import label_propagation

    und: dict[int, set[int]] = {}
    for a, b in edges:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    lab = {v: v for v in und}
    for _ in range(3):
        new = {}
        for v, nbrs in und.items():
            cnt = Counter(lab[u] for u in nbrs)
            best = min(((-c, l) for l, c in cnt.items()))
            new[v] = best[1]
        lab = new
    df = spark.createDataFrame(list(edges), "src int, dst int")
    got = {
        r["id"]: r["label"]
        for r in label_propagation(df, n_iter=3).collect()
    }
    assert got == lab


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.text("abcdef", min_size=1, max_size=4), min_size=1, max_size=30
    )
)
def test_kmv_estimate_exact_below_k(spark, keys):
    """A KMV sketch smaller than k IS the distinct set — the estimate
    must equal the exact distinct count whenever n_distinct < k."""
    from hfp_loader_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_sketch,
    )

    df = spark.createDataFrame([("g", k) for k in keys], "g string, key string")
    n_distinct = len(set(keys))
    k = 64
    est = kmv_distinct_estimate(
        kmv_sketch(df, "g", "key", k=k), "g", k=k
    ).collect()
    if n_distinct < k:
        assert est[0]["est_distinct"] == float(n_distinct)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    baskets=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),
            st.sampled_from(["a", "b", "c", "d"]),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_association_rules_matches_python_model(spark, baskets):
    """support/confidence/lift agree with a brute-force Python model on
    arbitrary basket streams (dup item rows collapse to sets)."""
    from collections import defaultdict
    from itertools import combinations

    from hfp_loader_spark.operators.relational import association_rules

    sets = defaultdict(set)
    for b, item in baskets:
        sets[b].add(item)
    n = len(sets)
    item_n = defaultdict(int)
    pair_n = defaultdict(int)
    for items in sets.values():
        for i in items:
            item_n[i] += 1
        for a, b in combinations(sorted(items), 2):
            pair_n[(a, b)] += 1

    df = spark.createDataFrame(baskets, "b int, item string")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in association_rules(df, "b", "item").collect()
    }
    assert set(got) == set(pair_n)
    for (a, b), nab in pair_n.items():
        r = got[(a, b)]
        assert r["n_ab"] == nab
        assert r["support"] == round(nab / n, 6)
        assert r["conf_a_b"] == round(nab / item_n[a], 6)
        assert r["conf_b_a"] == round(nab / item_n[b], 6)
        assert r["lift"] == round(n * nab / (item_n[a] * item_n[b]), 6)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from([0.1, 0.25, 0.5, 0.5, 0.75, 0.9]),
            st.booleans(),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_roc_auc_matches_pairwise_model(spark, rows):
    """AUC equals the tie-aware pairwise probability
    P(score⁺ > score⁻) + ½·P(score⁺ = score⁻) on arbitrary inputs."""
    from hfp_loader_spark.operators.ranking import roc_auc

    pos = [s for s, l in rows if l]
    neg = [s for s, l in rows if not l]
    df = spark.createDataFrame(rows, "score double, label boolean")
    got = roc_auc(df, "score", "label").collect()[0]
    if not pos or not neg:
        assert got["auc"] is None
        return
    wins = sum(
        1.0 if p > q else 0.5 if p == q else 0.0 for p in pos for q in neg
    )
    assert got["auc"] == round(wins / (len(pos) * len(neg)), 6)


@given(
    st.lists(  # corpus of small int vectors
        st.lists(st.integers(-50, 50), min_size=4, max_size=4),
        min_size=1,
        max_size=12,
    ),
    st.lists(  # centroids — duplicates allowed, to exercise ties
        st.lists(st.integers(-50, 50), min_size=4, max_size=4),
        min_size=1,
        max_size=6,
    ),
)
@settings(max_examples=25, deadline=None)
def test_int_argmin_cluster_matches_python_argmin(spark, vecs, cents):
    """_int_argmin_cluster — the expression every r11 serve path rests
    on — must equal the reference rule exactly on arbitrary integer
    inputs: argmin of squared L2 with FIRST-minimum (lowest-cluster)
    tie-break, via the Σc²−2qc rearrangement in int64."""
    from hfp_loader_spark.operators.similarity import _int_argmin_cluster

    cent_list = [(i, c) for i, c in enumerate(cents)]
    df = spark.createDataFrame(
        [(i, [int(v) for v in q]) for i, q in enumerate(vecs)],
        "id int, q array<long>",
    )
    got = {
        r["id"]: r["cell"]
        for r in df.select(
            "id", _int_argmin_cluster(F.col("q"), cent_list).alias("cell")
        ).collect()
    }
    for i, q in enumerate(vecs):
        d = [sum((a - b) ** 2 for a, b in zip(q, c)) for c in cents]
        expect = d.index(min(d))  # first minimum = lowest cluster id
        assert got[i] == expect
