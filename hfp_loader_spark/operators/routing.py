"""Row routing: VehiclePosition rows split between two sink tables (P4).

Reference: service/insertHfpFromBlobStream.ts:62-70 — rows of the
VehiclePosition event group with ``journey_type != 'journey'`` go to
``unsignedevent``; everything else goes to the group's primary table
(utils/hfp.ts:54-58).

NULL semantics note: in JS, ``null !== 'journey'`` is true, so a NULL
journey_type routes to ``unsignedevent``.  The Spark predicate below uses
null-safe equality to match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hfp_loader_spark.schema import (
    EVENT_GROUP_TABLES,
    UNSIGNED_TABLE,
    VEHICLE_POSITION,
)

TARGET_COL = "_target_table"


def target_table_column(event_group: str) -> Column:
    """Derived routing column for one event group."""
    primary = EVENT_GROUP_TABLES[event_group]
    if event_group != VEHICLE_POSITION:
        return F.lit(primary)
    is_journey = F.col("journey_type").eqNullSafe("journey")
    return F.when(is_journey, F.lit(primary)).otherwise(F.lit(UNSIGNED_TABLE))


def with_target_table(df: DataFrame, event_group: str) -> DataFrame:
    """Attach the routing column (cheap narrow projection, no shuffle)."""
    return df.withColumn(TARGET_COL, target_table_column(event_group))


def routed_tables(event_group: str) -> list[str]:
    """The sink tables an event group can write to."""
    primary = EVENT_GROUP_TABLES[event_group]
    if event_group == VEHICLE_POSITION:
        return [primary, UNSIGNED_TABLE]
    return [primary]
