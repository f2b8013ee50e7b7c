"""Training-example assembly: deterministic sequence packing of a
document corpus into fixed-length token windows (extension tier; the
reference has no text surface — SURVEY §2.11).

The pretraining data-prep step every LLM pipeline runs after curation:
concatenate the corpus in a canonical document order and cut it into
``seq_len``-token training examples ("document concatenation + chunking"
— documents cross chunk boundaries, the standard pretraining packing; a
chunk is full by construction, so there is no padding waste and fill
ratio is exactly 1 everywhere except the final chunk).

The distributed primitive underneath is an EXCLUSIVE PREFIX SUM over a
global document order.  The naive plan — one Window over everything —
moves the corpus through a single partition (Spark literally warns
"Moving all data to a single partition"); the classic fix is the
two-level scan: order-contiguous range shards, a per-shard window for
the within-shard running sum, a BOUNDED (n_shards-row) cumulative sum of
shard totals, and a broadcast join gluing them — every corpus-sized step
is partition-parallel, and the only serial work is over n_shards rows.
Exactness: shards are contiguous in the order column, so
``global_prefix(x) = shard_offset(shard(x)) + within_shard_prefix(x)``
— integer arithmetic, identical to the single-window definition, which
is what the DuckDB oracle runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exclusive_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out_col: str = "offset",
    n_shards: int = 32,
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` over the global
    ``order_col`` order, without a single-partition window.

    ``order_col`` must be integral and unique (the corpus's canonical
    id); range sharding on its VALUE keeps shards order-contiguous, so
    per-shard prefixes + cumulative shard totals compose to the exact
    global prefix.  Plan shape: one bounds aggregate (2 scalars to the
    driver), one per-shard window, one n_shards-row aggregate + bounded
    window, one broadcast join — corpus never passes through one
    partition.  Skew bound: shards are equal VALUE ranges, so id-dense
    corpora shard evenly; a pathologically sparse id space degrades to
    fewer effective shards, never to wrong answers.

    Returns ``df`` + ``out_col`` (bigint, 0 for the first row)."""
    s, _, _ = range_shard(df, order_col, n_shards, out_col="_shard")
    w_in = (
        Window.partitionBy("_shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(
        F.sum(F.col(value_col).cast("long")).over(w_in), F.lit(0)
    )
    # bounded frame: one row per shard; the serial scan is O(n_shards)
    totals = s.groupBy("_shard").agg(
        F.sum(F.col(value_col).cast("long")).alias("_tot")
    )
    w_sh = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_shard",
        F.coalesce(F.sum("_tot").over(w_sh), F.lit(0)).alias("_shard_off"),
    )
    return (
        s.join(F.broadcast(offsets), "_shard")
        .withColumn(out_col, (F.col("_shard_off") + within).cast("long"))
        .drop("_shard", "_shard_off")
    )


def pack_chunks(
    docs: DataFrame,
    n_col: str,
    seq_len: int,
    id_col: str = "doc_id",
    out_chunk_col: str = "chunk_id",
    n_shards: int = 32,
) -> DataFrame:
    """Assign every document its training-chunk spans under
    concatenate-then-cut packing: documents are laid head-to-tail in
    ``id_col`` order and the stream is cut every ``seq_len`` tokens.

    Output: one row per (chunk, document) overlap —
    ``(chunk_id, id_col, n_chunk_tokens, doc_offset)`` where
    ``n_chunk_tokens`` is how many of the doc's tokens land in that
    chunk (Σ over a doc's rows = its token count; Σ over a chunk's rows
    = seq_len except the final chunk) and ``doc_offset`` is the doc's
    global start position.  Zero-token documents produce no rows (they
    occupy no space in the stream).

    Everything after the prefix sum is per-row arithmetic + one bounded
    explode (a doc spans ceil(n/seq_len)+1 chunks at most), so the plan
    scales exactly like the prefix sum."""
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    p = exclusive_prefix_sum(
        docs, n_col, id_col, out_col="_off", n_shards=n_shards
    ).where(F.col(n_col) > 0)
    start = F.col("_off")
    end = F.col("_off") + F.col(n_col).cast("long")

    def idiv(c: Column) -> Column:
        # exact nonneg integer division by seq_len: subtract the
        # remainder first so the double division is over a multiple
        # (exact below 2^53 — ~9e15 tokens, past any corpus)
        return ((c - F.pmod(c, F.lit(seq_len))) / F.lit(seq_len)).cast(
            "long"
        )

    chunks = F.sequence(idiv(start), idiv(end - 1))
    out = p.select(
        F.explode(chunks).alias(out_chunk_col),
        F.col(id_col),
        F.col(n_col).cast("long").alias("_n"),
        start.alias("doc_offset"),
    )
    lo = F.greatest(F.col("doc_offset"), F.col(out_chunk_col) * seq_len)
    hi = F.least(
        F.col("doc_offset") + F.col("_n"),
        (F.col(out_chunk_col) + 1) * seq_len,
    )
    return out.select(
        out_chunk_col,
        id_col,
        (hi - lo).cast("long").alias("n_chunk_tokens"),
        "doc_offset",
    )


def range_shard(
    df: DataFrame, order_col: str, n_shards: int, out_col: str = "shard"
) -> tuple[DataFrame, int, int]:
    """Order-contiguous range sharding on an integral id column — the
    deterministic split both :func:`exclusive_prefix_sum` and
    :func:`pack_greedy_bins` build on, factored so the SQL oracle can
    replicate the exact shard function: ``shard = (id − lo) div width``
    with ``width = max(1, (hi − lo + n_shards) div n_shards)`` from the
    data's bounds.  Returns ``(df + out_col, lo, width)``."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    bounds = df.agg(
        F.min(order_col).alias("lo"), F.max(order_col).alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return df.withColumn(out_col, F.lit(0).cast("long")), 0, 1
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    width = max(1, (hi - lo + n_shards) // n_shards)
    shard = ((F.col(order_col) - F.lit(lo)).cast("long") / F.lit(width)).cast(
        "long"
    )
    return df.withColumn(out_col, shard), lo, width


def pack_greedy_bins(
    docs: DataFrame,
    n_col: str,
    seq_len: int,
    id_col: str = "doc_id",
    n_shards: int = 8,
) -> DataFrame:
    """NO-SPLIT sequence packing — the instruction-tuning variant:
    documents are never cut; within each range shard they are scanned
    in ``id_col`` order and greedily appended to the current bin,
    opening a new bin whenever the document would overflow ``seq_len``.
    A document longer than ``seq_len`` lands alone in an over-full
    singleton bin (the same rule, applied uniformly — nothing is
    silently dropped; downstream truncation is a curation decision,
    not a packing one).  Zero-token documents occupy no bin.

    Output: ``(shard, bin, id_col, n_tokens)`` — bins are dense from 0
    within each shard.

    The greedy scan is a data-dependent-reset recurrence (the running
    fill resets when a bin closes), which no window function expresses
    — per shard it runs as ONE ``applyInPandas`` pass (Arrow batch, a
    few lines of numpy-free Python over the shard's rows), and shards
    pack independently and in parallel, exactly how production packers
    shard by output file.  Determinism: the shard function is
    :func:`range_shard` (value-based, data-derived bounds) and the scan
    order is ``id_col`` — so a SQL engine replicates the whole thing
    with a recursive CTE stepping one document per shard per iteration
    (the catalog oracle does exactly that)."""
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    sharded, _, _ = range_shard(
        docs.where(F.col(n_col) > 0), id_col, n_shards
    )
    sharded = sharded.select(
        F.col("shard"),
        F.col(id_col),
        F.col(n_col).cast("long").alias("n_tokens"),
    )

    def pack(pdf):
        pdf = pdf.sort_values(id_col)
        bins = []
        bin_id = -1
        fill = seq_len + 1  # force a new bin for the first doc
        for n in pdf["n_tokens"]:
            if fill + n > seq_len:
                bin_id += 1
                fill = int(n)
            else:
                fill += int(n)
            bins.append(bin_id)
        pdf = pdf.assign(bin=bins)
        return pdf[["shard", "bin", id_col, "n_tokens"]]

    return sharded.groupBy("shard").applyInPandas(
        pack, schema=f"shard long, bin long, {id_col} long, n_tokens long"
    )
