"""End-to-end corpus-preparation pipeline: the operators composed.

Every stage of the standard LLM pre-training data pipeline, chained from
this repo's operator tier into one declarative flow:

    profile → C4 line cleaning (optional, first — Raffel et al. §2.2)
            → quality gates (score + Gopher repetition + optional
              Gopher §A1.1 hard rules + PII scrub)
            → exact dedup (full-content fingerprint)
            → near-dup clustering (MinHash-LSH pairs → connected
              components → keep the min-id doc per cluster)
            → decontamination (n-gram overlap vs a held-out slice)
            → mixture sampling (per-source rates)
            → chunking (token windows) or sequence packing

Each stage is the SAME operator the catalog oracle-checks individually
(`plans/*`); this module only composes them, so pipeline correctness
reduces to stage correctness + the composition invariants tested in
``tests/test_pipeline.py`` (monotone shrinkage, determinism, stage
accounting, history-wins incremental semantics).

Scale shape: stage boundaries are CHECKPOINTED (persisted
MEMORY_AND_DISK and materialized by the boundary count, previous
boundary released) — each stage's lineage executes exactly once, the
way a production pipeline lands an intermediate dataset between stages.
Without the checkpoints every boundary count re-ran the chain from the
scan: O(stages²) recompute at 100 TB.  Within a stage the program stays
lazy, so Catalyst still pushes the row-local gates into the scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hfp_loader_spark.operators.graph import connected_components_alternating
from hfp_loader_spark.operators.neardup import decontaminate, minhash_lsh_pairs
from hfp_loader_spark.operators.sampling import mixture_sample
from hfp_loader_spark.operators.text import (
    c4_line_filter,
    ccnet_perplexity,
    chunk_documents,
    gopher_quality_flags,
    quality_score,
    remove_duplicate_spans,
    repetition_metrics,
    scrub_pii,
    tokens,
)


@dataclass
class PipelineConfig:
    """Knobs for :func:`prepare_corpus` / :func:`ingest_delta` — defaults
    mirror the catalog entries so the composed pipeline stays on
    oracle-checked settings."""

    min_quality: float = 0.3
    jaccard_threshold: float = 0.8
    decontaminate_n: int = 8
    # per-source keep thresholds (4-hex lexicographic, see mixture_sample);
    # empty → keep every source in full
    mixture_thresholds: dict[str, str] = field(default_factory=dict)
    # duplicated-span SURGERY (Lee et al. exact-substring dedup): excise
    # word n-grams occurring ≥2× corpus-wide from the surviving docs'
    # text, keeping the corpus-wide first occurrence.  None → skip the
    # stage (whole-document dedup only).  Runs LAST, on the final
    # survivor set, so the expensive gram pass sees the fewest docs and
    # whole-doc near-dedup operates on unmodified text.
    remove_span_n: int | None = None
    # which member of each near-dup cluster survives: "min_id" (the
    # canonical component label — free) or "quality" (the highest
    # text.quality_score member, ties → lowest id — one extra join on
    # the small cluster-member set, keeps the better-written duplicate)
    keeper: str = "min_id"
    chunk_window: int = 32
    chunk_stride: int = 24
    # C4 line-level cleaning (Raffel et al. §2.2) as the FIRST stage:
    # lines without terminal punctuation / enough words / with
    # "javascript" are excised, and pages failing the brace /
    # lorem-ipsum / min-kept-lines rules are dropped — the paper's
    # order, before any whole-document scoring (scores should see the
    # cleaned text).  Off by default: single-line corpora lose every
    # line to the punctuation rule.
    c4_clean: bool = False
    # corpus-wide cross-document line dedup (C4 §2.2 span removal at
    # line granularity / CCNet §3.1 paragraph dedup): only the
    # corpus-wide FIRST occurrence of each line survives; documents
    # whose every line was a duplicate are dropped.  Runs right after
    # c4_clean (scores must see deduplicated text), before any
    # whole-document gate.  Off by default: single-line corpora reduce
    # it to whole-document exact dedup at explode cost.
    crossdoc_line_dedup: bool = False
    # Gopher hard rule gates (Rae et al. §A1.1) folded into the quality
    # stage's filter; ``gopher_stopwords=None`` uses the paper's list —
    # pass a corpus-adapted tuple when the corpus vocabulary doesn't
    # overlap English function words.
    gopher_rules: bool = False
    gopher_stopwords: tuple[str, ...] | None = None
    # CCNet perplexity gate (Wenzek et al. §4.3): keep documents whose
    # cross-entropy under the target-domain bigram LM (the ``ccnet_lm``
    # corpus passed to prepare_corpus) stays below this cutoff — the
    # paper's head/middle split frozen into a constant (derive it once
    # with text.ccnet_cutoffs).  None → stage skipped.  Documents with
    # < 2 tokens have no LM events and are DROPPED when the stage runs
    # (CCNet cannot score them; they are junk for training regardless).
    ccnet_max_ce: float | None = None
    ccnet_buckets: int = 64


def _content_fingerprint(text_col: str):
    """md5 over the FULL whitespace-normalized token stream — a true
    exact-dedup key.  (``operators.text.fingerprint`` hashes only a
    5-token prefix; using it here would collapse distinct documents
    sharing a boilerplate opening — a silent-data-loss bug a review
    pass caught.)"""
    return F.md5(F.concat_ws(" ", tokens(F.col(text_col))))


class _StageLedger:
    """Stage-boundary checkpointing for the composed pipeline.

    ``checkpoint(df, stage)`` persists the stage's survivor frame
    (MEMORY_AND_DISK — the executor-local equivalent of the intermediate
    write a production pipeline lands between stages), records its count
    (the one action that materializes the cache), and unpersists the
    PREVIOUS boundary's cache (now fully folded into this one).  Net
    effect: each stage's lineage executes exactly ONCE — without this,
    every boundary ``count()`` re-ran the whole chain from the scan, so
    the near-dedup count re-executed quality+exact-dedup, the
    decontaminate count re-executed all of those plus LSH, and the final
    write ran everything again: O(stages²) recompute at 100 TB.

    The LAST checkpointed frame is left cached on purpose — the caller's
    output write consumes it; ``release()`` drops it for callers (tests,
    ingest loops) that want a clean session afterwards."""

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        self._prev: DataFrame | None = None

    def checkpoint(self, df: DataFrame, stage: str, id_col: str) -> DataFrame:
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        self.counts[stage] = df.select(id_col).count()
        if self._prev is not None:
            self._prev.unpersist()
        self._prev = df
        return df

    def release(self) -> None:
        if self._prev is not None:
            self._prev.unpersist()
            self._prev = None


def _gate_and_exact_dedup(
    docs: DataFrame,
    cfg: PipelineConfig,
    id_col: str,
    text_col: str,
    ledger: _StageLedger,
) -> DataFrame:
    """Shared head of both pipeline shapes: quality gates (score +
    Gopher repetition, plus the Gopher §A1.1 hard rules when
    ``cfg.gopher_rules``) then full-content exact dedup keeping the min
    id per key.  Records the 'quality' and 'exact_dedup' stage counts."""
    gate = F.col(text_col).isNotNull() & (
        quality_score(F.col(text_col)) >= cfg.min_quality
    )
    if cfg.gopher_rules:
        kwargs = (
            {"stopwords": cfg.gopher_stopwords}
            if cfg.gopher_stopwords is not None
            else {}
        )
        gate = gate & gopher_quality_flags(F.col(text_col), **kwargs)[
            "gopher_keep"
        ]
    scored = docs.where(gate)
    rep = repetition_metrics(scored, id_col=id_col, text_col=text_col)
    survivors = scored.join(
        rep.where(~F.col("flagged")).select(id_col), id_col, "left_semi"
    )
    survivors = ledger.checkpoint(survivors, "quality", id_col)

    fp = survivors.withColumn("_fp", _content_fingerprint(text_col))
    keep = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    survivors = fp.join(keep, [id_col], "left_semi").drop("_fp")
    return ledger.checkpoint(survivors, "exact_dedup", id_col)


def prepare_corpus(
    spark: SparkSession,
    docs: DataFrame,
    heldout: DataFrame | None = None,
    config: PipelineConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    ccnet_lm: DataFrame | None = None,
) -> tuple[DataFrame, dict[str, int], Callable[[], None]]:
    """Run the full corpus-prep chain; returns (clean_docs, stage_counts,
    release).

    ``clean_docs`` carries the surviving documents with ``text`` PII-
    scrubbed; ``stage_counts`` maps stage name → surviving row count (the
    audit trail a production pipeline persists next to the output);
    ``release()`` unpersists the final cached stage boundary — call it
    AFTER writing ``clean_docs`` (writing first consumes the cache;
    releasing first turns the write into a full-chain recompute).
    Stages that need a second input (decontamination: ``heldout``; the
    CCNet perplexity gate: ``ccnet_lm`` + ``cfg.ccnet_max_ce``) or
    configuration (mixture) are skipped when not provided — the report
    records only the stages that ran.
    """
    cfg = config or PipelineConfig()
    counts: dict[str, int] = {}
    counts["input"] = docs.select(id_col).count()
    ledger = _StageLedger(counts)

    if cfg.c4_clean:
        # line surgery BEFORE any scoring (the C4 order): both the page
        # verdict and the cleaned text derive from the ORIGINAL text in
        # one projection, then the text column is swapped in place so
        # every later stage sees cleaned pages only
        flt = c4_line_filter(F.col(text_col))
        docs = (
            docs.where(F.col(text_col).isNotNull())
            .withColumn("_c4_text", flt["cleaned_text"])
            .where(flt["page_keep"])
            .withColumn(text_col, F.col("_c4_text"))
            .drop("_c4_text")
        )
        docs = ledger.checkpoint(docs, "c4_clean", id_col)

    if cfg.crossdoc_line_dedup:
        # cross-document line dedup AFTER page cleaning, BEFORE scoring
        # (the CCNet order: scores must see deduplicated text).  The
        # inner join doubles as the drop gate: documents with no
        # surviving line (n_kept = 0) or no lines at all produce no
        # match and fall out here.
        from hfp_loader_spark.operators.text import dedup_lines_crossdoc

        ld = dedup_lines_crossdoc(
            docs.where(F.col(text_col).isNotNull()),
            id_col=id_col,
            text_col=text_col,
            return_text=True,
        ).where(F.col("n_kept") > 0)
        docs = (
            docs.join(ld.select(id_col, "clean_text"), id_col)
            .withColumn(text_col, F.col("clean_text"))
            .drop("clean_text")
        )
        docs = ledger.checkpoint(docs, "crossdoc_line_dedup", id_col)

    survivors = _gate_and_exact_dedup(docs, cfg, id_col, text_col, ledger)

    if ccnet_lm is not None and cfg.ccnet_max_ce is not None:
        # CCNet perplexity gate AFTER the cheap rule gates and exact
        # dedup (fewer docs feed the bigram pass), BEFORE the expensive
        # LSH near-dedup.  The LM corpus is external trusted text; the
        # ≤ B² conditional-prob table broadcasts, so the gate adds one
        # per-doc aggregate + one semi-join — no corpus-sized shuffle
        # beyond the doc key.  Unscorable docs (< 2 tokens) drop here by
        # construction, as documented on ccnet_max_ce.
        scored = ccnet_perplexity(
            survivors.select(id_col, text_col),
            ccnet_lm,
            id_col=id_col,
            text_col=text_col,
            num_buckets=cfg.ccnet_buckets,
        )
        keep_ids = scored.where(
            F.col("ce_nats") < cfg.ccnet_max_ce
        ).select(id_col)
        survivors = survivors.join(keep_ids, id_col, "left_semi")
        survivors = ledger.checkpoint(survivors, "ccnet_perplexity", id_col)

    # near-dup clustering: LSH pairs → components → keep min-id doc.
    # No emptiness pre-check: connected_components handles an empty edge
    # list, and a take(1) probe would materialize the whole LSH+verify
    # chain a second time.
    lsh_caches: list[DataFrame] = []
    pairs = minhash_lsh_pairs(
        survivors,
        id_col,
        text_col,
        threshold=cfg.jaccard_threshold,
        cache_registry=lsh_caches,
    )
    comp = connected_components_alternating(pairs, src="doc_a", dst="doc_b")
    if cfg.keeper == "quality":
        # keep each cluster's highest-quality member (ties → lowest id)
        # instead of the canonical min-id doc — one extra join on the
        # (small) cluster-member set, same anti-join shape after
        from hfp_loader_spark.operators.graph import cluster_keepers_by_score

        scores = survivors.select(
            F.col(id_col).alias("id"),
            quality_score(F.col(text_col)).alias("score"),
        )
        keep = cluster_keepers_by_score(comp, scores).select(
            F.col("component"), F.col("keeper_id")
        )
        drop = (
            comp.join(keep, "component")
            .where(F.col("id") != F.col("keeper_id"))
            .select(F.col("id").alias(id_col))
        )
    else:
        drop = comp.where(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
    survivors = survivors.join(drop, id_col, "left_anti")
    survivors = ledger.checkpoint(survivors, "near_dedup", id_col)
    # the boundary count above materialized the pair lineage into the
    # near_dedup cache — the LSH intermediates (shingles + signatures)
    # are dead weight from here on
    for c in lsh_caches:
        c.unpersist()

    if heldout is not None:
        contaminated = decontaminate(
            survivors, heldout, id_col, text_col, n=cfg.decontaminate_n
        ).select(id_col)
        survivors = survivors.join(contaminated, id_col, "left_anti")
        survivors = ledger.checkpoint(survivors, "decontaminate", id_col)

    if cfg.mixture_thresholds:
        survivors = mixture_sample(
            survivors, source_col, cfg.mixture_thresholds, key_col=id_col
        )
        survivors = ledger.checkpoint(survivors, "mixture", id_col)
        last = "mixture"
    else:
        last = "decontaminate" if heldout is not None else "near_dedup"

    if cfg.remove_span_n:
        # duplicated-span SURGERY on the final survivor set: trim the
        # text in place (rows are never dropped — the stage count stays
        # equal to the previous boundary, which keeps the monotone-
        # shrinkage invariant).  Only (id, text) feed the gram pass; the
        # trimmed text joins back so every other column passes through.
        span_caches: list[DataFrame] = []
        trimmed = remove_duplicate_spans(
            survivors.select(id_col, text_col),
            id_col=id_col,
            text_col=text_col,
            n=cfg.remove_span_n,
            cache_registry=span_caches,
        )
        survivors = survivors.drop(text_col).join(
            trimmed.select(id_col, text_col), id_col
        )
        survivors = ledger.checkpoint(survivors, "remove_dup_spans", id_col)
        for c in span_caches:
            c.unpersist()
        last = "remove_dup_spans"

    # scrub_pii is a row-local projection — it drops nothing, so the
    # output count IS the last stage's count (no extra action, and the
    # caller's write over `clean` reads the cached boundary frame once).
    clean = survivors.withColumn(text_col, scrub_pii(F.col(text_col)))
    counts["output"] = counts[last]
    # The final boundary stays cached so the caller's write consumes it
    # (see _StageLedger); the release handle is how a long-lived session
    # drops it once the output is landed — without it the last
    # MEMORY_AND_DISK frame leaked until session end (the ingest loop in
    # ingest_delta releases eagerly instead, trading a batch-sized
    # recompute; a full-corpus caller should write first, then release).
    return clean, counts, ledger.release


def ingest_delta(
    spark: SparkSession,
    new_docs: DataFrame,
    index_root: str,
    config: PipelineConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, dict[str, int]]:
    """Incremental ingest: clean a NEW batch against the corpus history.

    The production shape of :func:`prepare_corpus` — a daily delta is
    gated and repetition-filtered, exact-deduped within itself,
    near-deduped against the PERSISTED MinHash signature index
    (``operators.neardup``: O(|delta|) hashing + a bucket join on stored
    32-long signatures, verified by SIGNATURE-estimated Jaccard at the
    configured threshold; the history's text is never re-read), PII-
    scrubbed, and the survivors' signatures are appended to the index
    (O(1) versioned-table commit) so the next ingest sees them.
    Returns (clean_delta, stage_counts).

    History always wins: for every verified collision pair, the DELTA
    member is dropped — whichever side of the (doc_a < doc_b) ordering
    it is.  Between two colliding delta docs the lower id survives.
    """
    from hfp_loader_spark.operators.neardup import (
        dedup_delta_against_index,
        save_signature_index,
    )

    cfg = config or PipelineConfig()
    counts: dict[str, int] = {}
    counts["input"] = new_docs.select(id_col).count()
    ledger = _StageLedger(counts)

    gated = _gate_and_exact_dedup(new_docs, cfg, id_col, text_col, ledger)

    pairs = dedup_delta_against_index(
        spark,
        gated,
        index_root,
        id_col=id_col,
        text_col=text_col,
        estimate_threshold=cfg.jaccard_threshold,
    )
    delta_ids = gated.select(F.col(id_col).alias("_did")).distinct()
    # drop the DELTA member(s) of each verified pair: doc_b when it is a
    # delta doc (its counterpart — history or a lower-id delta doc —
    # wins), and doc_a when doc_a is a delta doc but doc_b is history
    # (ids don't order history below delta in general, so a fixed-column
    # prune would let a low-id delta dup of a high-id history doc slip
    # through)
    drop_b = pairs.join(
        F.broadcast(delta_ids), pairs["doc_b"] == F.col("_did"), "left_semi"
    ).select(F.col("doc_b").alias(id_col))
    hist_b = pairs.join(
        F.broadcast(delta_ids), pairs["doc_b"] == F.col("_did"), "left_anti"
    )
    drop_a = hist_b.join(
        F.broadcast(delta_ids), hist_b["doc_a"] == F.col("_did"), "left_semi"
    ).select(F.col("doc_a").alias(id_col))
    survivors = gated.join(
        drop_b.unionByName(drop_a).distinct(), id_col, "left_anti"
    )
    survivors = ledger.checkpoint(survivors, "near_dedup_vs_index", id_col)

    clean = survivors.withColumn(text_col, scrub_pii(F.col(text_col)))
    # Index the RAW (pre-scrub) text: dedup_delta_against_index hashes each
    # incoming batch's raw text, so index-time and compare-time
    # representations must match.  Appending post-scrub signatures would
    # let a later raw duplicate of any PII-bearing doc evade the index
    # (signatures differ ⟺ scrub altered the text) — breaking the
    # exactly-once growth invariant.
    save_signature_index(
        spark, survivors, index_root, id_col=id_col, text_col=text_col,
        mode="append",
    )
    # Release every cache this call created — the pair list from
    # dedup_delta_against_index and the ledger's boundary frames.  A
    # long-running ingest stream calls this once per micro-batch; leaked
    # MEMORY_AND_DISK entries would otherwise grow executor storage
    # without bound.  Counts and the signature commit are already
    # materialized; a caller consuming `clean` afterwards recomputes the
    # (batch-sized, deterministic) chain — read_snapshot pins its file
    # list at call time, so the recompute sees the same history even
    # though this batch's signatures were appended meanwhile.
    pairs.unpersist()
    ledger.release()
    counts["output"] = counts["near_dedup_vs_index"]
    return clean, counts


def chunk_corpus(
    docs: DataFrame,
    config: PipelineConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Final packaging: overlapping token-window chunks of the cleaned
    corpus (see ``operators.text.chunk_documents``) — the step that
    turns surviving documents into training-sequence rows."""
    cfg = config or PipelineConfig()
    return chunk_documents(
        docs,
        id_col=id_col,
        text_col=text_col,
        window=cfg.chunk_window,
        stride=cfg.chunk_stride,
    )


def main(argv: list[str] | None = None) -> int:
    """CLI: run the corpus-prep chain over a driver-layout table dir.

    Usage::

        python -m hfp_loader_spark.pipeline /root/testdata/sf0.01 /tmp/out \
            [--heldout-mod 17] [--min-quality 0.3]

    Writes ``<out>/corpus.parquet`` (cleaned documents),
    ``<out>/chunks.parquet`` (token-window rows), and
    ``<out>/report.json`` (per-stage audit counts).
    """
    import argparse
    import json
    import os

    p = argparse.ArgumentParser(
        prog="hfp_loader_spark.pipeline",
        description="End-to-end corpus preparation over a documents table.",
    )
    p.add_argument("sf_dir", help="dir containing documents.parquet")
    p.add_argument("out_dir", help="output dir (parquet + report.json)")
    p.add_argument(
        "--heldout-mod",
        type=int,
        default=0,
        help="treat doc_id %% N == 0 as the held-out slice (0 = no "
        "decontamination stage)",
    )
    p.add_argument("--min-quality", type=float, default=0.3)
    args = p.parse_args(argv)

    from hfp_loader_spark.plans.catalog import load_table
    from hfp_loader_spark.session import get_spark

    spark = get_spark(app_name="corpus_pipeline")
    docs = load_table(spark, args.sf_dir, "documents")
    heldout = None
    if args.heldout_mod:
        heldout = docs.where(F.col("doc_id") % args.heldout_mod == 0)
        docs = docs.where(F.col("doc_id") % args.heldout_mod != 0)
    cfg = PipelineConfig(min_quality=args.min_quality)
    clean, counts, release = prepare_corpus(
        spark, docs, heldout=heldout, config=cfg
    )
    corpus_path = os.path.join(args.out_dir, "corpus.parquet")
    clean.write.mode("overwrite").parquet(corpus_path)
    release()  # output landed — drop the final cached stage boundary
    # chunk from the materialized output, not the live lineage — re-running
    # the whole gate/dedup chain for the second write would double the cost
    chunk_corpus(spark.read.parquet(corpus_path), cfg).write.mode(
        "overwrite"
    ).parquet(os.path.join(args.out_dir, "chunks.parquet"))
    with open(os.path.join(args.out_dir, "report.json"), "w") as fh:
        json.dump(counts, fh, indent=2)
    print(json.dumps(counts))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
