"""Sequence packing + distributed prefix sum (operators/packing.py, r12)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n int")


def test_prefix_sum_matches_single_window_and_is_shard_invariant(spark):
    """The sharded exclusive prefix sum must equal the one-window
    definition for EVERY shard count — including degenerate (1 shard =
    the naive plan; more shards than rows) — on gappy, zero-heavy
    input."""
    from hfp_loader_spark.operators.packing import exclusive_prefix_sum

    rows = [
        (3, 5), (7, 0), (8, 12), (100, 1), (101, 0), (102, 7),
        (5000, 3), (5001, 9), (9999, 2),
    ]
    df = _docs(spark, rows)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r["doc_id"]: r["off"]
        for r in df.select(
            "doc_id",
            F.coalesce(F.sum("n").over(w), F.lit(0)).alias("off"),
        ).collect()
    }
    for n_shards in (1, 2, 7, 64):
        got = {
            r["doc_id"]: r["offset"]
            for r in exclusive_prefix_sum(
                df, "n", "doc_id", n_shards=n_shards
            ).collect()
        }
        assert got == want, f"n_shards={n_shards}"
    with pytest.raises(ValueError, match="n_shards"):
        exclusive_prefix_sum(df, "n", "doc_id", n_shards=0)
    # empty input: offset column appears, zero rows
    empty = exclusive_prefix_sum(_docs(spark, []), "n", "doc_id")
    assert empty.columns[-1] == "offset" and empty.count() == 0


def test_pack_chunks_conservation_and_boundaries(spark):
    """Packing invariants on a hand-checkable corpus (seq_len=10):
    every token lands in exactly one chunk (Σ per doc = n), every chunk
    holds exactly seq_len tokens except the last, chunk ids are dense
    from 0, zero-token docs vanish, and a doc longer than seq_len spans
    consecutive chunks."""
    from hfp_loader_spark.operators.packing import pack_chunks

    rows = [(1, 4), (2, 0), (3, 9), (4, 25), (5, 2)]  # total 40 tokens
    out = pack_chunks(
        _docs(spark, rows), "n", seq_len=10, n_shards=3
    ).collect()
    per_doc = {}
    per_chunk = {}
    for r in out:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_chunk_tokens"]
        per_chunk[r["chunk_id"]] = (
            per_chunk.get(r["chunk_id"], 0) + r["n_chunk_tokens"]
        )
    assert per_doc == {1: 4, 3: 9, 4: 25, 5: 2}  # doc 2 vanished
    assert sorted(per_chunk) == [0, 1, 2, 3]  # dense from 0
    assert per_chunk == {0: 10, 1: 10, 2: 10, 3: 10}  # 40 tokens exactly
    # doc 4 (offset 13, 25 tokens) spans chunks 1..3
    doc4 = sorted(r["chunk_id"] for r in out if r["doc_id"] == 4)
    assert doc4 == [1, 2, 3]
    # offsets are the exclusive prefix: doc 4 starts at 4+0+9 = 13
    assert {r["doc_offset"] for r in out if r["doc_id"] == 4} == {13}
    with pytest.raises(ValueError, match="seq_len"):
        pack_chunks(_docs(spark, rows), "n", seq_len=0)
