"""Table maintenance: small-file compaction for append-heavy layouts.

The staging sink (sink.py) appends per load and partitions by ``oday`` —
exactly the write pattern that fragments a lake: every re-run adds files,
and at 100 TB a scan of 10-million 1 MB files spends more time in
listing/open overhead than in I/O.  Compaction rewrites a table (or one
partition of it) into files sized for the scan path.

Scale notes:
- sizing is computed from the ACTUAL on-disk bytes (driver-side Hadoop
  FS listing — metadata only, no data read);
- the rewrite is one narrow job: scan → repartition(target) → write;
  with a partition column, repartitioning on it keeps each output file
  single-partition so partition pruning still skips whole files;
- the swap is directory-rename based (write to a sibling tmp dir, then
  rename).  That is atomic per-rename on HDFS/local but NOT transactional
  end-to-end — concurrent writers must be fenced by the caller, which is
  the honest contract of plain-parquet lakes (table formats like
  Iceberg/Delta exist precisely to lift it).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class CompactionPlan:
    path: str
    n_files: int
    total_bytes: int
    small_files: int  # files under half the target size
    target_files: int
    n_leaf_dirs: int  # partition directories (1 for unpartitioned)

    @property
    def worthwhile(self) -> bool:
        """Compact when fragmentation dominates: more than half the files
        are small and compaction would at least halve the file count."""
        return self.small_files > self.n_files // 2 and (
            self.target_files * 2 <= self.n_files
        )


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    return jvm.org.apache.hadoop.fs.FileSystem.get(
        jvm.java.net.URI.create(path), conf
    ), jvm.org.apache.hadoop.fs.Path


def plan_compaction(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> CompactionPlan:
    """Inspect a parquet directory and size the compaction (metadata only)."""
    fs, HPath = _fs(spark, path)
    it = fs.listFiles(HPath(path), True)
    n = total = small = 0
    leaf_dirs: set[str] = set()
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if not name.endswith(".parquet"):
            continue
        size = status.getLen()
        n += 1
        total += size
        leaf_dirs.add(str(status.getPath().getParent()))
        if size < target_file_bytes // 2:
            small += 1
    # A layout that keeps its partition dirs cannot drop below one file
    # per partition value — floor the target there, or a freshly
    # compacted table would look compactable forever.
    return CompactionPlan(
        path=path,
        n_files=n,
        total_bytes=total,
        small_files=small,
        target_files=max(
            1, -(-total // target_file_bytes), len(leaf_dirs) or 1
        ),
        n_leaf_dirs=len(leaf_dirs) or 1,
    )


def compact_table(
    spark: SparkSession,
    path: str,
    partition_cols: list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    force: bool = False,
) -> CompactionPlan:
    """Rewrite ``path`` into ~target-sized files; returns the plan executed.

    No-op (returns the plan, rewrites nothing) unless ``plan.worthwhile``
    or ``force``.  With ``partition_cols`` the rewrite keeps the
    partitioned layout — repartitioning by the partition columns, so each
    output file belongs to exactly one partition directory and pruning
    keeps skipping whole files.  One file per partition VALUE; a single
    partition that outgrows the target should be compacted on its own by
    passing its subdirectory as ``path`` (with no partition_cols).
    """
    plan = plan_compaction(spark, path, target_file_bytes)
    if not (plan.worthwhile or force) or plan.n_files == 0:
        return plan

    df = spark.read.parquet(path)
    fs, HPath = _fs(spark, path)
    tmp = path.rstrip("/") + "__compacting"
    fs.delete(HPath(tmp), True)

    writer_df = (
        df.repartition(plan.target_files, *partition_cols)
        if partition_cols
        else df.repartition(plan.target_files)
    )
    writer = writer_df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)

    old = path.rstrip("/") + "__precompact"
    fs.delete(HPath(old), True)
    if not fs.rename(HPath(path), HPath(old)):
        raise IOError(f"compaction fence failed: cannot move {path} aside")
    if not fs.rename(HPath(tmp), HPath(path)):
        # roll back: put the original directory back
        fs.rename(HPath(old), HPath(path))
        raise IOError(f"compaction swap failed for {path}; original restored")
    fs.delete(HPath(old), True)
    return plan


def compact_snapshot(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_dirs: int = 8,
    vacuum_after: bool = True,
) -> int | None:
    """Collapse a VERSIONED table's append chain (``versioned.py``) into
    one compacted version — the maintenance valve for O(delta) append
    logs like the IVF cell-tag table, where every streaming micro-batch
    commits its own data directory (``stream_ingest_cell_tags``) and a
    long-running ingest accretes unbounded small files/dirs (VERDICT
    r11 #6).

    Reads the LATEST snapshot, rewrites it sized by the same
    byte-budget rule as :func:`compact_table`, and ``overwrite``-commits
    it as a new version CARRYING THE PARENT'S MANIFEST META (model
    fingerprint, scale, kind stamps survive — a compaction must never
    launder a generation pin).  Readers are snapshot-isolated throughout:
    anyone holding version N keeps scanning N's directories; only new
    readers see the compacted head.  Nothing is deleted — the old data
    dirs stay referenced by OLDER manifests, so time travel keeps
    working; ``vacuum_after`` only reaps dirs orphaned by failed/raced
    commits.  No-op (returns None) when the chain is shorter than
    ``min_dirs`` directories — compacting a compact table forever is
    its own small-file generator.

    Returns the committed version, or None if skipped."""
    from hfp_loader_spark.versioned import (
        _read_manifest,
        commit_snapshot,
        latest_version,
        read_snapshot,
        vacuum,
    )

    head = latest_version(spark, root)
    if head is None:
        return None
    info = _read_manifest(spark, root, head)
    if len(info.data_dirs) < min_dirs:
        return None
    df = read_snapshot(spark, root, head)
    total = 0
    fs, HPath = _fs(spark, root)
    for d in info.data_dirs:
        it = fs.listFiles(HPath(f"{root.rstrip('/')}/{d}"), False)
        while it.hasNext():
            status = it.next()
            if status.getPath().getName().endswith(".parquet"):
                total += status.getLen()
    target_files = max(1, -(-total // target_file_bytes))
    meta = {**(info.meta or {}), "compacted_from": head}
    if "stream_batch_id" not in meta:
        # An unstamped head (a plain batch append interleaved after the
        # last stream commit) must not LAUNDER the stream's replay
        # stamp: the compacted overwrite becomes the walk boundary for
        # streaming.jobs._replayed, so carry forward the newest stamp
        # found behind the head (back to the previous overwrite — older
        # rows aren't in this snapshot's lineage anyway), or a
        # crash-replayed batch would re-append rows the compacted
        # snapshot already contains.
        from hfp_loader_spark.versioned import _existing_versions

        for v in reversed(_existing_versions(spark, root)):
            if v > head:
                continue
            past = info if v == head else _read_manifest(spark, root, v)
            if past.meta.get("stream_batch_id") is not None:
                meta["stream_batch_id"] = past.meta["stream_batch_id"]
                meta["stream_ingest_id"] = past.meta.get(
                    "stream_ingest_id"
                )
                break
            if past.op == "overwrite":
                break
    version = commit_snapshot(
        spark,
        df.repartition(target_files),
        root,
        mode="overwrite",
        meta=meta,
    )
    if vacuum_after:
        vacuum(spark, root)
    return version
