"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``hfp_loader_spark/plans/`` — one module per
tier (core relational, HFP parity, dedup, text, similarity, streaming),
each registering (Spark builder, DuckDB oracle SQL) pairs via
``defquery``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1 pricing summary on sf0.001."""
    from hfp_loader_spark.plans import catalog

    return catalog.REGISTRY["q1_pricing_summary"].builder(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+§2.11)."""
    from hfp_loader_spark.plans import catalog

    return catalog.query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted → rows-only check."""
    from hfp_loader_spark.plans import catalog

    return catalog.oracle_map()
