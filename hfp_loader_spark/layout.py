"""Physical layout helpers: bucketing for co-located joins.

At 100 TB the dominant recurring cost of fact-fact joins (lineitem ⋈
orders, events ⋈ events) is the shuffle.  Writing both sides bucketed by
the join key with the same bucket count makes the join co-located: Spark
plans a SortMergeJoin with NO Exchange on either side — the shuffle is
paid once at write time and amortized over every subsequent join.

Bucketing metadata lives in the catalog, so bucketed frames are written
with ``saveAsTable`` (a plain ``parquet(path)`` write cannot record
bucket spec).  Readers use ``spark.table(name)``.

Rules of thumb:
- bucket count ≈ total-data / target-partition-size (128-512 MB), and the
  SAME on both sides of the intended join;
- also ``sortBy`` the bucket key so the merge join skips the local sort;
- combine with ``partitionBy(date)`` for prune+co-locate layouts (the
  staging sink's oday partitioning composes with bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    ``path`` makes the table external (data at ``path``, bucket spec in the
    catalog) — the layout a production lake would use; omitted → managed
    table under ``spark.sql.warehouse.dir``.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.

    ``on`` is a join-column name, a list of names, or a Column built from
    ``spark.table(left_table)`` / ``spark.table(right_table)`` (the catalog
    caches the analyzed relation, so attribute ids line up).  With matching
    bucket specs Spark elides both Exchanges (asserted in
    tests/test_layout.py) — the join reads co-located buckets directly.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
