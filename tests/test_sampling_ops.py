"""Property tests for mixture sampling and sequence packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from hfp_loader_spark.operators.sampling import mixture_sample, pack_sequences
from hfp_loader_spark.plans.catalog import load_table


def test_mixture_sample_is_deterministic_and_rate_shaped(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    thr = {"src0": "zzzz", "src1": "8000", "src2": "0000"}
    kept = mixture_sample(docs, "source", thr, key_col="doc_id")
    counts = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    src_totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["src0"] == src_totals["src0"]  # keep-all tier
    assert "src2" not in counts  # zero-rate tier drops everything
    assert 0 < counts.get("src1", 0) < src_totals["src1"]  # ~50% tier
    # unmapped sources default to keep-all
    assert counts["src3"] == src_totals["src3"]
    # deterministic: a second evaluation selects the identical rows
    a = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert a == b


def test_pack_sequences_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("sz")
    )
    budget = 1000
    out = pack_sequences(docs, "doc_id", "sz", budget=budget, n_shards=4)
    rows = out.collect()
    assert len(rows) == docs.count()  # every document is placed
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4))
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["stream_pos"])
        pos = 0
        for r in shard_rows:
            # stream positions are the exact prefix sums: contiguous, no gaps
            assert r["stream_pos"] == pos
            assert r["bin_id"] == pos // budget
            pos += r["sz"]


def test_cms_merge_equals_direct_build_and_never_underestimates(spark):
    """Cell-wise merge of per-partition sketches must equal the sketch
    built directly on the union (the mergeability contract), and point
    estimates must never undercount."""
    from pyspark.sql import functions as F

    from hfp_loader_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    rows = [(i % 7, "p1" if i % 2 else "p2") for i in range(500)]
    rows += [(99, "p1")] * 40  # a heavy hitter concentrated in one part
    df = spark.createDataFrame(rows, "k long, part string")

    per_part = cms_build(df, "k", part_cols=["part"])
    merged = cms_merge(per_part).select("depth_idx", "bucket", "cnt")
    direct = cms_build(df, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )

    keys = spark.createDataFrame([(99,), (0,), (3,)], "k long")
    est = {r["k"]: r["cms_estimate"] for r in cms_estimate(merged, keys, "k").collect()}
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    for k in (99, 0, 3):
        assert est[k] >= exact[k]


def test_cms_estimate_absent_key_is_zero(spark):
    """A key whose cells are all empty must be reported with estimate 0,
    not dropped (regression: inner join removed empty cells, breaking
    the min and the ε-bound)."""
    from hfp_loader_spark.operators.sketches import cms_build, cms_estimate

    df = spark.createDataFrame([(1,)] * 10, "k long")
    sketch = cms_build(df, "k", width=1024)
    keys = spark.createDataFrame([(1,), (123456789,)], "k long")
    est = {r["k"]: r["cms_estimate"] for r in cms_estimate(sketch, keys, "k", width=1024).collect()}
    assert est[1] >= 10
    assert est.get(123456789) == 0  # width 1024, 1 occupied bucket/row: no collision


def test_bloom_merge_equals_direct_build(spark):
    """Union of per-partition Bloom filters must equal the filter built
    directly over the whole data (exact merge)."""
    from hfp_loader_spark.operators.sketches import bloom_build, bloom_merge

    rows = [(i, i % 3) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, part int")
    per_part = bloom_build(df, "k", part_cols=["part"])
    merged = bloom_merge(per_part, part_cols=[])
    direct = bloom_build(df, "k")
    a = sorted(r["bit"] for r in merged.collect())
    b = sorted(r["bit"] for r in direct.collect())
    assert a == b


def test_bloom_contains_duplicate_probe_keys(spark):
    """An inserted key probed MULTIPLE times must still report
    maybe_present=TRUE, with one verdict row per distinct key.
    Regression: the exploded-join formulation summed set-bit hits per
    key and compared against num_hashes, so a key probed twice scored
    2k ≠ k and was falsely reported ABSENT — violating the docstring's
    no-false-negative theorem on plausible input."""
    from hfp_loader_spark.operators.sketches import bloom_build, bloom_contains

    present = spark.createDataFrame([(i,) for i in range(50)], "k long")
    bloom = bloom_build(present, "k", num_bits=4096, num_hashes=5)
    probes = spark.createDataFrame(
        [(i % 25,) for i in range(100)] + [(7,)] * 5, "k long"
    )
    rows = bloom_contains(
        bloom, probes, "k", num_bits=4096, num_hashes=5
    ).collect()
    out = {r["k"]: r["maybe_present"] for r in rows}
    assert len(rows) == 25  # one row per DISTINCT probe key
    assert all(out[i] for i in range(25))


def test_bloom_contains_probe_is_joinless(spark):
    """The probe must be a map-side bitmap test (element_at + getbit on
    a packed-word literal) — no join, no exploded probe frame.  The only
    exchange allowed is the distinct over probe keys."""
    from hfp_loader_spark.operators.sketches import bloom_build, bloom_contains

    present = spark.createDataFrame([(i,) for i in range(50)], "k long")
    bloom = bloom_build(present, "k", num_bits=4096, num_hashes=5)
    probes = spark.createDataFrame([(i,) for i in range(100)], "k long")
    df = bloom_contains(bloom, probes, "k", num_bits=4096, num_hashes=5)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "getbit" in plan
    assert "Join" not in plan and "Generate" not in plan
    # one exchange: the probe-key distinct
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange hashpartitioning") <= 1


def test_bloom_contains_lazy_matches_eager_and_runs_no_job(spark):
    """bloom_contains_lazy: identical verdicts to the literal form on
    every probe (including duplicates), and CONSTRUCTING the frame runs
    zero Spark work — the property catalog builders need (ADVICE r8:
    the literal form collects at plan-build time)."""
    from unittest import mock

    from pyspark.sql import DataFrame

    from hfp_loader_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
        bloom_contains_lazy,
    )

    present = spark.createDataFrame([(i,) for i in range(200)], "k long")
    bloom = bloom_build(present, "k", num_bits=4096, num_hashes=5)
    probes = spark.createDataFrame(
        [(i,) for i in range(400)] + [(7,), (7,), (399,)], "k long"
    )

    # construction must not touch the cluster: any eager materialization
    # funnels through DataFrame.collect (bloom_bitmap_words) — forbid it
    with mock.patch.object(
        DataFrame, "collect", side_effect=AssertionError("eager collect")
    ):
        lazy = bloom_contains_lazy(
            bloom, probes, "k", num_bits=4096, num_hashes=5
        )
    got = {r["k"]: r["maybe_present"] for r in lazy.collect()}
    want = {
        r["k"]: r["maybe_present"]
        for r in bloom_contains(
            bloom, probes, "k", num_bits=4096, num_hashes=5
        ).collect()
    }
    assert got == want
    assert len(got) == 400  # distinct probes, duplicates collapsed
    assert all(got[i] for i in range(200))  # no false negatives


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from hfp_loader_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
    )

    present = spark.createDataFrame(
        [(i,) for i in range(500)], "k long"
    )
    bloom = bloom_build(present, "k", num_bits=8192, num_hashes=5)
    probes = spark.createDataFrame(
        [(i,) for i in range(2000)], "k long"
    )
    out = {
        r["k"]: r["maybe_present"]
        for r in bloom_contains(
            bloom, probes, "k", num_bits=8192, num_hashes=5
        ).collect()
    }
    # theorem: every inserted key must probe TRUE
    assert all(out[i] for i in range(500))
    # absent keys: fp rate well under 4x the analytic bound
    import math

    fp = sum(1 for i in range(500, 2000) if out[i]) / 1500
    analytic = (1 - math.exp(-5 * 500 / 8192)) ** 5
    assert fp <= 4 * analytic + 0.01, (fp, analytic)


def test_cms_join_size_exact_on_collision_free_keys(spark):
    """With few distinct keys vs 256 buckets (collision-free whp), the
    estimate should EQUAL the exact join size; and it must never
    underestimate regardless."""
    from hfp_loader_spark.operators.sketches import cms_build, cms_join_size

    a = spark.createDataFrame([(i % 5,) for i in range(100)], "k long")
    b = spark.createDataFrame([(i % 7,) for i in range(70)], "k long")
    exact = a.join(b, "k").count()
    est = cms_join_size(cms_build(a, "k"), cms_build(b, "k")).collect()[0][
        "est_join_rows"
    ]
    assert est >= exact
    assert est == exact  # 12 distinct keys over 4x256 cells: no collisions


def test_cms_join_size_zero_when_disjoint(spark):
    """Disjoint key sets: if ANY depth row has no colliding bucket the
    min must be 0 — the explicit depth-domain completion (an inner-join
    min would overestimate from the surviving rows only)."""
    from hfp_loader_spark.operators.sketches import cms_build, cms_join_size

    a = spark.createDataFrame([(i,) for i in range(5)], "k long")
    b = spark.createDataFrame([(i,) for i in range(1000, 1005)], "k long")
    est = cms_join_size(cms_build(a, "k"), cms_build(b, "k")).collect()[0][
        "est_join_rows"
    ]
    exact = a.join(b, "k").count()
    assert exact == 0
    assert est >= exact
    # 10 keys in 1024 cells: overwhelmingly likely some depth row is
    # collision-free, giving the exact 0
    assert est == 0


def test_temperature_thresholds_invariants(spark):
    """α-temperature planning invariants: the rarest source keeps
    (nearly) everything, rarer ⇒ strictly higher keep rate, α=1
    reproduces the natural mix (all rates equal the cap), and α=0
    targets a uniform mix (rates ∝ 1/n)."""
    from hfp_loader_spark.operators.sampling import (
        KEEP_ALL,
        temperature_thresholds,
    )

    def rate(v: str) -> int:
        # KEEP_ALL expresses rate 1 exactly — no hex threshold can,
        # since mixture_sample's comparison is a strict <
        return 65536 if v == KEEP_ALL else int(v, 16)

    rows = (
        [(i, "big") for i in range(900)]
        + [(i + 1000, "mid") for i in range(90)]
        + [(i + 2000, "rare") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")

    t = temperature_thresholds(df, "source", alpha=0.5)
    rates = {s: rate(v) for s, v in t.items()}
    assert t["rare"] == KEEP_ALL            # rarest: keep-all, EXACTLY
    assert rates["rare"] > rates["mid"] > rates["big"]
    # α=0.5: rate ratio between sources = sqrt(n_rare/n_big) etc.
    assert abs(rates["big"] / rates["rare"] - (10 / 900) ** 0.5) < 1e-3

    t1 = temperature_thresholds(df, "source", alpha=1.0)
    assert set(t1.values()) == {KEEP_ALL}   # natural mix: keep everything

    t0 = {s: rate(v) for s, v in
          temperature_thresholds(df, "source", alpha=0.0).items()}
    assert t0["rare"] == 65536
    assert abs(t0["big"] / t0["rare"] - 10 / 900) < 1e-3  # uniform target

    # budget_frac scales every rate proportionally (and below 1 no
    # source reaches the keep-all sentinel)
    th = {s: rate(v) for s, v in
          temperature_thresholds(df, "source", alpha=0.5,
                                 budget_frac=0.5).items()}
    assert abs(th["rare"] - 65536 / 2) <= 1


def test_temperature_keep_all_retains_ffff_bucket(spark):
    """The rate-1 source keeps even the ~1/65536 of rows whose 4-hex
    md5 bucket is exactly 'ffff' — the rows an 'ffff' threshold would
    drop under mixture_sample's strict < (ADVICE r8: the 'preserves
    rare sources in full' claim must be literally true)."""
    from hfp_loader_spark.operators.sampling import (
        KEEP_ALL,
        mixture_sample,
        temperature_thresholds,
    )

    # md5('mix:51373')[:4] == 'ffff' — the exact boundary bucket
    boundary = 51373
    rows = [(boundary, "rare"), (1, "rare")] + [
        (i + 100000, "big") for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    t = temperature_thresholds(df, "source", alpha=0.5)
    assert t["rare"] == KEEP_ALL

    kept = {
        r["doc_id"]
        for r in mixture_sample(df, "source", t, key_col="doc_id")
        .where("source = 'rare'")
        .collect()
    }
    assert kept == {boundary, 1}  # nothing lost at the cap

    # counter-check: the old 'ffff' cap does drop the boundary row
    dropped = {
        r["doc_id"]
        for r in mixture_sample(
            df, "source", {"rare": "ffff", "big": "0000"}, key_col="doc_id"
        ).collect()
    }
    assert boundary not in dropped and 1 in dropped


def test_gumbel_topk_is_deterministic_and_weight_monotone(spark):
    """Gumbel-top-k: identical selection on re-run (no RNG state), a
    different salt re-deals, and cranking one row's weight far above the
    rest forces it into the sample — the ∝exp(weight) direction."""
    from hfp_loader_spark.operators.sampling import gumbel_topk

    df = spark.createDataFrame(
        [(i, 0.0) for i in range(200)], "doc_id long, w double"
    )
    a = [r["doc_id"] for r in gumbel_topk(df, "w", 10, "doc_id").collect()]
    b = [r["doc_id"] for r in gumbel_topk(df, "w", 10, "doc_id").collect()]
    assert a == b and len(a) == 10
    c = [
        r["doc_id"]
        for r in gumbel_topk(df, "w", 10, "doc_id", salt="other:").collect()
    ]
    assert set(c) != set(a)  # 10-of-200 twice: overlap of all 10 ≈ 1e-13

    # Gumbel noise is bounded in practice; +1e6 dominates any draw
    boosted = df.withColumn(
        "w",
        (F.col("doc_id") == 137).cast("int").cast("double") * 1_000_000.0,
    )
    top = {r["doc_id"] for r in gumbel_topk(boosted, "w", 3, "doc_id").collect()}
    assert 137 in top


def test_upsample_epochs_copy_counts_and_determinism(spark):
    from hfp_loader_spark.operators.sampling import upsample_epochs

    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3)) for i in range(60)], "doc_id long, src string"
    )
    # integer weight → exactly w copies, no randomness involved
    out3 = upsample_epochs(df, F.lit(3.0), "doc_id").collect()
    assert len(out3) == 180
    assert all(r["n_copies"] == 3 for r in out3)
    assert sorted({r["copy"] for r in out3}) == [1, 2, 3]
    # zero weight → empty
    assert upsample_epochs(df, F.lit(0.0), "doc_id").count() == 0
    # fractional: every doc gets 2 or 3 copies; identical on re-run
    a = upsample_epochs(df, F.lit(2.5), "doc_id").collect()
    b = upsample_epochs(df, F.lit(2.5), "doc_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_doc = {}
    for r in a:
        per_doc.setdefault(r["doc_id"], set()).add(r["n_copies"])
    assert all(v <= {2} or v <= {3} for v in per_doc.values())
    assert {2, 3} == {n for v in per_doc.values() for n in v}
    # the copy column enumerates 1..n_copies exactly
    from collections import Counter

    c = Counter(r["doc_id"] for r in a)
    assert all(c[d] == next(iter(per_doc[d])) for d in c)


def test_shuffle_shards_stability_and_write(spark, tmp_path):
    from hfp_loader_spark.operators.sampling import (
        shuffle_shards,
        write_shards,
    )

    base = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    a = {r["doc_id"]: (r["shard"], r["sort_key"])
         for r in shuffle_shards(base, 8, "doc_id").collect()}
    assert all(0 <= s < 8 for s, _ in a.values())
    assert len({s for s, _ in a.values()}) == 8  # every shard populated
    # stability under growth: adding docs never moves existing ones
    grown = spark.createDataFrame(
        [(i,) for i in range(300)], "doc_id long"
    )
    b = {r["doc_id"]: (r["shard"], r["sort_key"])
         for r in shuffle_shards(grown, 8, "doc_id").collect()}
    assert all(b[d] == a[d] for d in a)
    # a different salt reshuffles (new epoch order)
    c = {r["doc_id"]: (r["shard"], r["sort_key"])
         for r in shuffle_shards(base, 8, "doc_id", salt="ep2:").collect()}
    assert any(c[d] != a[d] for d in a)

    # materialized layout: shard dirs exist, each file in training order
    path = str(tmp_path / "shards")
    write_shards(base, path, 8, "doc_id")
    import glob

    import pyarrow.parquet as pq

    dirs = sorted(glob.glob(path + "/shard=*"))
    assert len(dirs) == 8
    seen = 0
    for d in dirs:
        for f in glob.glob(d + "/*.parquet"):
            keys = pq.read_table(f, columns=["sort_key"])["sort_key"].to_pylist()
            assert keys == sorted(keys)
            seen += len(keys)
    assert seen == 200


def test_kmv_merge_equals_full_sketch(spark):
    from hfp_loader_spark.operators.sketches import kmv_merge, kmv_sketch

    rows = [("g%d" % (i % 3), "key%d" % (i % 40)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, key string")
    a = df.where(F.md5("key") < "8")
    b = df.where(F.md5("key") >= "8")
    full = {
        (r["g"], r["h"])
        for r in kmv_sketch(df, "g", "key", k=16).collect()
    }
    merged = {
        (r["g"], r["h"])
        for r in kmv_merge(
            [kmv_sketch(a, "g", "key", k=16), kmv_sketch(b, "g", "key", k=16)],
            "g",
            k=16,
        ).collect()
    }
    assert merged == full


def test_poisson_bootstrap_ci_degenerate_replicates_never_null(spark):
    """ADVICE r9: with n=1 each replicate's weights are all-zero with
    P=1/e, so over 32 replicates several are degenerate — their means
    must coalesce to the point estimate, never NULL/NaN, keeping the
    sorted order statistics finite."""
    import math

    from hfp_loader_spark.operators.sampling import poisson_bootstrap_ci

    df = spark.createDataFrame([(1, 500)], "k int, cents long")
    row = poisson_bootstrap_ci(df, "k", "cents", n_replicates=32).collect()[0]
    assert row["n_rows"] == 1
    assert row["point_mean"] == 5.0
    for v in (row["ci_lo"], row["ci_hi"]):
        assert v is not None and not math.isnan(v)
        assert v == 5.0  # every non-degenerate replicate sees the one row
