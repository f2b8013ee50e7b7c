"""Incremental materialized-view maintenance over snapshot-versioned
tables: refresh a per-key aggregate by scanning ONLY the data committed
since the last refresh.

The view is itself a versioned table whose manifest ``meta`` records the
source version it reflects (the refresh cursor).  A refresh:

1. reads the source head's manifest and the cursor's manifest;
2. if the source history is append-only since the cursor (old dir list is
   a prefix-set of the new one), scans JUST the new dirs, partially
   aggregates them, and MERGES with the stored aggregate — sums/counts
   add, min/max fold with least/greatest (mergeable aggregates only, the
   same algebra Spark's own partial aggregation relies on);
3. if the source was overwritten (dirs removed), falls back to a full
   recompute — correctness first, incrementality when provable;
4. commits the merged view with ``meta={"source_version": head}`` —
   atomically, so view readers see either the old or the new refresh.

At 100 TB this is the difference between a nightly full groupBy over the
lake and touching only the day's appended files: refresh cost is
O(new data + |view|), independent of table history size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hfp_loader_spark.versioned import (
    _read_manifest,
    commit_snapshot,
    latest_version,
    read_snapshot,
)

_MERGEABLE = ("sum", "count", "min", "max")


@dataclass(frozen=True)
class AggView:
    """Mergeable aggregate spec: measures = {out_col: (src_col, kind)} with
    kind ∈ sum|count|min|max. count uses COUNT(src_col) semantics
    (non-null rows); pass a literal-1 column upstream for COUNT(*)."""

    keys: list[str]
    measures: dict[str, tuple[str, str]]

    def __post_init__(self):
        for out, (_, kind) in self.measures.items():
            if kind not in _MERGEABLE:
                raise ValueError(
                    f"{out}: {kind!r} is not mergeable "
                    f"(supported: {_MERGEABLE}); avg = sum/count at read"
                )

    def aggregate(self, df: DataFrame) -> DataFrame:
        aggs = []
        for out, (src, kind) in self.measures.items():
            fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[
                kind
            ]
            col = fn(src)
            if kind == "count":
                col = col.cast("long")
            aggs.append(col.alias(out))
        return df.groupBy(*self.keys).agg(*aggs)

    def merge(self, stored: DataFrame, partial: DataFrame) -> DataFrame:
        """Combine two aggregate states (full outer on the keys)."""
        s = stored.select(
            *self.keys,
            *[F.col(c).alias(f"_s_{c}") for c in self.measures],
        )
        p = partial.select(
            *self.keys,
            *[F.col(c).alias(f"_p_{c}") for c in self.measures],
        )
        j = s.join(p, self.keys, "full_outer")
        out_cols = list(self.keys)
        for out, (_, kind) in self.measures.items():
            a, b = F.col(f"_s_{out}"), F.col(f"_p_{out}")
            if kind in ("sum", "count"):
                merged = F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
                if kind == "count":
                    merged = merged.cast("long")
            elif kind == "min":
                merged = F.coalesce(F.least(a, b), a, b)
            else:  # max
                merged = F.coalesce(F.greatest(a, b), a, b)
            out_cols.append(merged.alias(out))
        return j.select(*out_cols)


def refresh_view(
    spark: SparkSession,
    source_root: str,
    view_root: str,
    view: AggView,
) -> dict:
    """Refresh the materialized aggregate; returns a report dict:
    ``{"mode": "initial"|"incremental"|"full"|"noop",
    "source_version": N, "new_dirs": k}``."""
    head = latest_version(spark, source_root)
    if head is None:
        raise FileNotFoundError(f"no committed versions at {source_root}")
    head_info = _read_manifest(spark, source_root, head)

    view_head = latest_version(spark, view_root)
    if view_head is None:
        full = view.aggregate(read_snapshot(spark, source_root, head))
        commit_snapshot(
            spark, full, view_root, mode="overwrite",
            meta={"source_version": head},
        )
        return {
            "mode": "initial",
            "source_version": head,
            "new_dirs": len(head_info.data_dirs),
        }

    cursor = _read_manifest(spark, view_root, view_head).meta.get(
        "source_version"
    )
    if cursor == head:
        return {"mode": "noop", "source_version": head, "new_dirs": 0}

    old_dirs = set(_read_manifest(spark, source_root, cursor).data_dirs)
    new_dirs = [d for d in head_info.data_dirs if d not in old_dirs]
    append_only = old_dirs.issubset(set(head_info.data_dirs))

    if not append_only:
        full = view.aggregate(read_snapshot(spark, source_root, head))
        commit_snapshot(
            spark, full, view_root, mode="overwrite",
            meta={"source_version": head},
        )
        return {
            "mode": "full",
            "source_version": head,
            "new_dirs": len(head_info.data_dirs),
        }

    delta = spark.read.parquet(
        *[f"{source_root.rstrip('/')}/{d}" for d in new_dirs]
    )
    partial = view.aggregate(delta)
    stored = read_snapshot(spark, view_root)
    merged = view.merge(stored, partial)
    commit_snapshot(
        spark, merged, view_root, mode="overwrite",
        meta={"source_version": head},
    )
    return {
        "mode": "incremental",
        "source_version": head,
        "new_dirs": len(new_dirs),
    }


def idempotent_batch_commit(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    batch_id: int,
) -> int | None:
    """Exactly-once micro-batch landing for ``foreachBatch`` sinks.

    Structured Streaming's contract is at-least-once per batch: after a
    crash between the sink action and the checkpoint commit, the SAME
    (batch_id, data) is replayed.  A plain ``commit_snapshot`` would
    append it twice.  This wrapper records the batch id in the manifest
    ``meta`` and skips ids already present in the table history — replay
    becomes a no-op, upgrading the pipeline to effective exactly-once
    (the same scheme Delta's idempotent ``txnAppId``/``txnVersion``
    writes use).

    Returns the committed version, or None if the batch was already
    landed.  The scan of history metas is driver-side manifest JSON —
    O(#versions), no data read."""
    from hfp_loader_spark.versioned import table_history

    for info in table_history(spark, root):
        if info.meta.get("batch_id") == batch_id:
            return None
    return commit_snapshot(
        spark, df, root, mode="append", meta={"batch_id": batch_id}
    )
