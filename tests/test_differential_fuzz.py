"""Differential fuzzing: catalog entries vs their DuckDB oracles on
MUTATED data — NULLs, empty strings, non-ASCII text, empty arrays,
duplicated fact rows.

The driver's gate (and tools/check_correctness.py) compare the two
engines only on the driver's clean synthetic data; rounds 2-3 were lost
to data-shape drift the catalog had never seen.  This module is the
drift insurance: it rewrites a copy of sf0.001 with the mutations a
future driver regeneration could plausibly introduce and asserts the
Spark/oracle agreement SURVIVES them for a broad entry subset.  An
entry that agrees on clean data but diverges on NULLs fails here first,
not in a lost round.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)
from check_correctness import _norm_rows  # noqa: E402

def _all_oracle_entries() -> list[str]:
    """EVERY oracle-checked catalog entry — the full mutated-data gate.

    The list below was the hand-grown subset; r8 verified every
    remaining entry individually against the mutated fixture (finding
    and fixing the as-of NULL splicing, the ragged-vector crashes in
    arrow_top_k / IVF / PQ / SemDeDup training, the ANSI element_at,
    and four unguarded list_cosine_similarity oracles along the way),
    so the harness now derives the set from the live registry: a future
    entry is fuzzed from the day it is registered, not when someone
    remembers to list it.

    ``FUZZ_SHARD=i/n`` (env) restricts this to the i-th of n
    round-robin slices of the sorted entry list — how
    tools/run_tests_sharded.py splits the ~15-min whole-catalog sweep
    across concurrent shards.  The union of slices 0..n-1 is exactly
    the full set (and the default, no env, remains the full set), so
    sharding changes scheduling, never coverage."""
    from hfp_loader_spark.plans.catalog import REGISTRY

    names = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
    shard = os.environ.get("FUZZ_SHARD")
    if shard:
        i, n = (int(x) for x in shard.split("/"))
        assert 0 <= i < n, f"bad FUZZ_SHARD {shard!r}"
        names = names[i::n]
    return names


def _rows_only_entries() -> list[str]:
    from hfp_loader_spark.plans.catalog import REGISTRY

    return [n for n, s in REGISTRY.items() if s.oracle is None]


# Historical hand-grown subset, kept as documentation of WHY tiers were
# added; the tests below run _all_oracle_entries() instead.
FUZZ_ENTRIES = [
    "q1_pricing_summary",
    "agg_monthly_orders",
    "anti_join_customers_no_orders",
    "sessionize_islands",
    "json_extract_stats",
    "events_funnel_windowed",
    "events_funnel_time_bounded",
    "events_transition_matrix",
    "events_value_outliers",
    "events_type_cooccurrence",
    "text_token_counts_top20",
    "text_doc_token_stats",
    "text_tfidf_top_terms",
    "text_quality_top20",
    "text_langid_agreement",
    "text_bpe_token_counts",
    "text_repetition_flags",
    "text_bigram_surprisal",
    "text_chunk_windows",
    "text_chunk_dedup_stats",
    "text_boilerplate_by_source",
    "text_duplicate_ngram_spans",
    "text_fingerprint_groups",
    "dedup_exact_by_fingerprint",
    "dedup_jaccard_pairs",
    "decontaminate_ngram_overlap",
    "sample_train_test_split",
    "sample_stratified_per_lang",
    "multimodal_byte_features",
    "multimodal_decode_frames",
    "multimodal_resize",
    "multimodal_audio_features",
    "multimodal_blockhash_fingerprints",
    "multimodal_phash_neardup",
    "emb_dim_stats",
    "dq_skew_report",
    "profile_documents_table",
    "timeseries_ewma_daily",
    "events_funnel_per_session",
    # round-6 additions: per-key EWMA (NULL values hit the lag taps),
    # measured-salt join (NULL values in the summed measure), MinHash
    # completeness contract (NULL/empty/non-ASCII docs must stay excluded
    # symmetrically on both engines)
    "timeseries_ewma_per_user",
    "skew_autosalt_join_agg",
    "dedup_minhash_selfmatch",
    "text_quality_bin_budget",
    "sketch_bloom_membership",
    "sketch_join_size_estimate",
    "sample_per_source_cap",
    "decontaminate_bloom_gated",
    # sliding distinct (ts fan-out over mutated events), semantic
    # clusters (the banded-discovery + CC composition over mutated
    # text), and duplicate-span surgery (NULL / empty / non-ASCII text
    # is exactly the reconstruction path's risk surface)
    "sketch_sliding_distinct",
    "sim_semantic_clusters",
    "text_remove_duplicate_spans",
    # r8 widening — duplicated lineitem facts through the TPC-H tier
    "q14_promo_revenue",
    "q17_small_quantity_avg",
    "q19_disjunctive_revenue",
    "q6_forecast_revenue",
    "unpivot_lineitem_measures",
    # NULL event values/props through the event-analytics tier
    "attribution_last_touch",
    "funnel_view_click_purchase",
    "asof_join_latest_event",
    "sketch_cms_frequencies",
    "timeseries_gapfill_per_key",
    "join_strategy_autoplan",
    # NULL / empty embedding vectors — previously only emb_dim_stats
    # carried this signal for the whole similarity tier
    "sim_cosine_topk",
    "sim_cosine_topk_arrow",
    "sim_cosine_neardup_pairs",
    "sim_embedding_norm_stats",
    "sim_quantize_int8",
    # mutated text through dedup recall/cluster compositions + PII
    "dedup_minhash_recall",
    "dedup_duplicate_clusters",
    "text_pii_redaction",
    "text_unigram_surprisal",
    # streaming tier over mutated events — the availableNow micro-batch
    # lifecycle previously had zero mutated-data signal
    "stream_session_counts",
    "streaming_watermark_dedup",
    "streaming_static_enrich",
    "q3_top_unshipped_orders",
    "q12_priority_by_mode",
    "sample_temperature_mixture",
]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory, sf_dir):
    """A mutated copy of the smallest driver SF."""
    out = tmp_path_factory.mktemp("fuzz_sf")
    con = duckdb.connect()
    mutations = {
        # NULL text, empty text, and appended non-ASCII (multi-byte UTF-8)
        "documents": """
            SELECT doc_id,
                   CASE WHEN doc_id % 13 = 0 THEN NULL
                        WHEN doc_id % 17 = 0 THEN ''
                        WHEN doc_id % 19 = 0 THEN text || ' café αβ δοκός'
                        ELSE text END AS text,
                   lang, source, n_chars
            FROM t
        """,
        # NULL json props and NULL measure values
        "events": """
            SELECT event_id, ts, user_id, event_type,
                   CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
                     AS value,
                   CASE WHEN event_id % 11 = 0 THEN NULL ELSE props END
                     AS props
            FROM t
        """,
        # NULL and empty embedding arrays
        "embeddings": """
            SELECT vec_id,
                   CASE WHEN vec_id % 31 = 0 THEN NULL
                        WHEN vec_id % 37 = 0 THEN []::FLOAT[]
                        ELSE embedding END AS embedding,
                   label
            FROM t
        """,
        # exact duplicate fact rows (aggregates must count them twice)
        "lineitem": """
            SELECT * FROM t
            UNION ALL
            SELECT * FROM t WHERE l_orderkey % 50 = 0
        """,
    }
    for name in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        con.execute(
            f"CREATE OR REPLACE VIEW t AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
        sel = mutations.get(name, "SELECT * FROM t")
        con.execute(f"COPY ({sel}) TO '{out}/{name}.parquet' (FORMAT PARQUET)")
    return str(out)


def test_catalog_agrees_with_oracle_on_mutated_data(spark, fuzz_dir):
    import __spark_entry__ as entry_mod
    from hfp_loader_spark.plans.catalog import TABLES, register_views

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{fuzz_dir}/{t}.parquet'"
        )
    # the session may have memoized views for another sf_dir
    register_views(spark, fuzz_dir, force=True)

    failures = []
    for name in _all_oracle_entries():
        try:
            sdf = queries[name](spark, fuzz_dir)
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001 — reported, not raised
            failures.append(f"{name}: SPARK ERROR {str(ex)[:160]}")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: ORACLE ERROR {str(ex)[:160]}")
            continue
        sc, sr = _norm_rows(scols, srows)
        oc, orr = _norm_rows(ocols, orows)
        if sc != oc:
            failures.append(f"{name}: schema {sc} vs {oc}")
        elif sr != orr:
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:2]
            failures.append(
                f"{name}: {len(sr)} vs {len(orr)} rows; first diffs {diffs}"
            )
    assert not failures, "\n".join(failures)


def test_rows_only_entries_survive_mutated_data(spark, fuzz_dir):
    """Rows-only entries (LSH/ANN pair lists, keep-lists) have no oracle
    to diverge from, but they must still EXECUTE on mutated data — the
    ragged-vector crashes in the ANN training and SemDeDup paths were
    exactly this failure class."""
    import __spark_entry__ as entry_mod
    from hfp_loader_spark.plans.catalog import register_views

    queries = entry_mod.queries()
    register_views(spark, fuzz_dir, force=True)
    for name in _rows_only_entries():
        n = queries[name](spark, fuzz_dir).count()
        assert n >= 0, name


NANOS_ENTRIES = [
    # every entry here touches at least one of the ts-bearing tables
    "q1_pricing_summary",
    "agg_monthly_orders",
    "sessionize_islands",
    "json_extract_stats",
    "events_funnel_windowed",
    "events_funnel_time_bounded",  # gap arithmetic on ts — the most exposed
    "events_transition_matrix",
    "events_value_outliers",
    "asof_join_latest_event",
    # round-6 ts consumers: per-user EWMA's to_date taps and the sliding-
    # distinct day fan-out both ride the nanos→timestamp normalization
    "timeseries_ewma_per_user",
    "sketch_sliding_distinct",
    # events-reading round-6 entries: neither consumes ts directly, but
    # both scan the re-encoded table and must survive the schema change
    "skew_autosalt_join_agg",
    "sketch_join_size_estimate",
    # r8: the heaviest ts-arithmetic consumers — as-of probe offsets,
    # interval range joins, tumbling windows + watermark lifecycle,
    # week bucketing, attribution ordering, funnel step ordering
    "asof_join_latest_event",
    "range_join_interval_counts",
    "stream_tumbling_counts",
    "streaming_watermark_dedup",
    "cohort_weekly_retention",
    "attribution_last_touch",
    "funnel_view_click_purchase",
]


@pytest.fixture(scope="module")
def nanos_dir(tmp_path_factory, sf_dir):
    """sf0.001 rewritten with TIMESTAMP(NANOS) event-time columns — the
    exact physical encoding one driver round shipped (SURVEY: rounds 2-3
    were lost to it).  Spark reads these as epoch-nanos BIGINT under
    ``nanosAsLong`` and load_table converts; DuckDB reads TIMESTAMP_NS
    natively — so the oracle comparison exercises the real drift path
    end-to-end."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ns_cols = {
        "orders": ["o_orderdate"],
        "lineitem": ["l_shipdate"],
        "events": ["ts"],
    }
    out = tmp_path_factory.mktemp("nanos_sf")
    for name in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]:
        t = pq.read_table(f"{sf_dir}/{name}.parquet")
        for c in ns_cols.get(name, []):
            i = t.schema.get_field_index(c)
            t = t.set_column(
                i, c, t.column(c).cast(pa.timestamp("ns"))
            )
        pq.write_table(t, f"{out}/{name}.parquet")
    return str(out)


def test_catalog_agrees_with_oracle_on_nanos_timestamps(spark, nanos_dir):
    """Registry-derived like the mutated-data gate (r8 verified all 149
    oracle-checked entries pass on the re-encoding individually): the
    entries NOT touching a ts-bearing table are trivially immune, and
    running them costs nothing compared to losing a round to drift —
    NANOS_ENTRIES above documents which consumers motivated the fixture."""
    import __spark_entry__ as entry_mod
    from hfp_loader_spark.plans.catalog import TABLES, register_views

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{nanos_dir}/{t}.parquet'"
        )
    register_views(spark, nanos_dir, force=True)

    failures = []
    for name in _all_oracle_entries():
        try:
            sdf = queries[name](spark, nanos_dir)
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001 — reported, not raised
            failures.append(f"{name}: SPARK ERROR {str(ex)[:160]}")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:  # noqa: BLE001
            failures.append(f"{name}: ORACLE ERROR {str(ex)[:160]}")
            continue
        sc, sr = _norm_rows(scols, srows)
        oc, orr = _norm_rows(ocols, orows)
        if sc != oc:
            failures.append(f"{name}: schema {sc} vs {oc}")
        elif sr != orr:
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:2]
            failures.append(
                f"{name}: {len(sr)} vs {len(orr)} rows; first diffs {diffs}"
            )
    assert not failures, "\n".join(failures)
