"""HFP parity queries: the reference's operator semantics under an oracle.

The driver's DuckDB oracle can only see the ten registered testdata views,
so these queries re-create HFP-shaped inputs *deterministically from the
``events`` table* (both engines derive the identical strings) and then run
the REAL operator code paths — ``operators.transform`` coercion expressions,
``operators.dedup`` anti-join/union/uuid-filter, ``operators.routing`` —
against DuckDB SQL that independently states the reference semantics:

- net null/zero trap (transformHfpItem.ts:54-107 ∘ upsert.ts:36): empty or
  unparseable or zero numerics → NULL, boolean = non-empty-string → TRUE
  else NULL, string '' → NULL;
- dual date parse (transformHfpItem.ts:87-103): value contains '-' ⇒ ISO,
  else epoch-milliseconds;
- day-scoped dedup anti-join + key-set union (hfpTask.ts:97-115, :100-103);
- VP routing on ``journey_type != 'journey'`` with JS null semantics
  (insertHfpFromBlobStream.ts:62-70: NULL routes to unsignedevent).

This gives the trap semantics an independent oracle check instead of pytest
self-agreement (golden CSV fixtures cover the file-level path in
tests/test_etl_golden.py).

Documented divergence (SURVEY §2.8 F2): JS parseInt prefix-parses '7abc'→7;
this engine uses cast semantics ('7abc'→NULL). The oracle states the
*engine's* documented semantics (try_cast), exercised on garbage input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hfp_loader_spark.operators.dedup import (
    anti_join_existing,
    filter_valid_uuid,
    union_key_sets,
)
from hfp_loader_spark.operators.routing import with_target_table
from hfp_loader_spark.operators.transform import (
    _boolean_expr,
    _numeric_expr,
    _string_expr,
    _temporal_expr,
)
from hfp_loader_spark.plans.catalog import _t, defquery

# Deterministic HFP-shaped raw strings derived from events.  The SQL and
# Spark expressions below MUST stay in lockstep — both engines build the
# same inputs, then each applies its own statement of the coercion.
_RAW_NUM_SQL = """
    CASE event_id % 7
      WHEN 0 THEN ''
      WHEN 1 THEN '0'
      WHEN 2 THEN CAST(user_id AS VARCHAR)
      WHEN 3 THEN 'garbage'
      WHEN 4 THEN '2.5'
      WHEN 5 THEN '-3'
      ELSE CAST(round(value, 2) AS VARCHAR)
    END
"""

_RAW_TS_SQL = """
    CASE event_id % 3
      WHEN 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
      WHEN 1 THEN CAST(epoch_ms(ts) AS VARCHAR)
      ELSE ''
    END
"""

_RAW_STR_SQL = """
    CASE event_id % 4
      WHEN 0 THEN ''
      WHEN 1 THEN event_type
      WHEN 2 THEN 'false'
      ELSE CAST(user_id AS VARCHAR)
    END
"""


def _raw_num_col() -> F.Column:
    ev = F.col("event_id") % 7
    return (
        F.when(ev == 0, F.lit(""))
        .when(ev == 1, F.lit("0"))
        .when(ev == 2, F.col("user_id").cast("string"))
        .when(ev == 3, F.lit("garbage"))
        .when(ev == 4, F.lit("2.5"))
        .when(ev == 5, F.lit("-3"))
        .otherwise(F.round("value", 2).cast("string"))
    )


def _raw_ts_col() -> F.Column:
    ev = F.col("event_id") % 3
    return (
        F.when(ev == 0, F.date_format("ts", "yyyy-MM-dd HH:mm:ss"))
        .when(ev == 1, F.unix_millis(F.col("ts")).cast("string"))
        .otherwise(F.lit(""))
    )


def _raw_str_col() -> F.Column:
    ev = F.col("event_id") % 4
    return (
        F.when(ev == 0, F.lit(""))
        .when(ev == 1, F.col("event_type"))
        .when(ev == 2, F.lit("false"))
        .otherwise(F.col("user_id").cast("string"))
    )


@defquery(
    "hfp_typed_coercion_net",
    f"""
    WITH raw AS (
      SELECT event_id,
             {_RAW_NUM_SQL} AS s_num,
             {_RAW_TS_SQL}  AS s_ts,
             {_RAW_STR_SQL} AS s_str
      FROM events
    )
    SELECT event_id,
           -- int: parse (truncating toward zero like parseInt), 0/NaN/fail→NULL
           nullif(CAST(trunc(try_cast(s_num AS DOUBLE)) AS INTEGER), 0) AS int_val,
           -- float: parse, 0/fail→NULL, rounded for cross-engine hashing
           round(nullif(try_cast(s_num AS DOUBLE), 0.0), 4)             AS float_val,
           -- boolean: non-empty → TRUE else NULL ('false' IS TRUE)
           CASE WHEN length(s_str) > 0 THEN TRUE END                    AS bool_val,
           -- dual date parse: '-' ⇒ ISO, else epoch-millis; stringified
           strftime(CASE WHEN length(s_ts) = 0 THEN NULL
                         WHEN contains(s_ts, '-') THEN try_cast(s_ts AS TIMESTAMP)
                         ELSE epoch_ms(try_cast(s_ts AS BIGINT)) END,
                    '%Y-%m-%d %H:%M:%S')                                AS ts_val,
           strftime(CASE WHEN length(s_ts) = 0 THEN NULL
                         WHEN contains(s_ts, '-') THEN try_cast(s_ts AS TIMESTAMP)
                         ELSE epoch_ms(try_cast(s_ts AS BIGINT)) END,
                    '%Y-%m-%d')                                         AS date_val,
           -- string: '' → NULL
           nullif(s_str, '')                                            AS str_val
    FROM raw
    """,
    doc="P2+F1-F4 net coercion (empty/zero/garbage→NULL, truthiness bool, "
    "dual ISO/epoch-ms date parse) via the real operators.transform "
    "expressions, oracle-stated independently in DuckDB SQL.",
)
def hfp_typed_coercion_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _t(spark, sf_dir, "events").select(
        "event_id",
        _raw_num_col().alias("s_num"),
        _raw_ts_col().alias("s_ts"),
        _raw_str_col().alias("s_str"),
    )
    return raw.select(
        "event_id",
        _numeric_expr(F.col("s_num"), "int").alias("int_val"),
        F.round(_numeric_expr(F.col("s_num"), "float"), 4).alias("float_val"),
        _boolean_expr(F.col("s_str")).alias("bool_val"),
        F.date_format(_temporal_expr(F.col("s_ts"), "isodate"), "yyyy-MM-dd HH:mm:ss").alias(
            "ts_val"
        ),
        F.date_format(_temporal_expr(F.col("s_ts"), "date"), "yyyy-MM-dd").alias(
            "date_val"
        ),
        _string_expr(F.col("s_str")).alias("str_val"),
    )


# uuid analog: empty for %13, NULL for %17, else a deterministic string key.
_UUID_SQL = """
    CASE WHEN event_id % 13 = 0 THEN ''
         WHEN event_id % 17 = 0 THEN NULL
         ELSE 'k' || CAST(event_id AS VARCHAR) END
"""


def _uuid_col() -> F.Column:
    return (
        F.when(F.col("event_id") % 13 == 0, F.lit(""))
        .when(F.col("event_id") % 17 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("k"), F.col("event_id").cast("string")))
    )


@defquery(
    "hfp_dedup_anti_join",
    f"""
    WITH incoming AS (
      SELECT event_id, event_type, {_UUID_SQL} AS uuid FROM events
    ),
    existing AS (  -- keys already loaded for the day: every 10th event
      SELECT uuid FROM incoming WHERE event_id % 10 = 0
    )
    SELECT i.event_type, CAST(count(*) AS BIGINT) AS n_inserted
    FROM incoming i
    WHERE i.uuid IS NOT NULL AND length(i.uuid) > 0
      AND NOT EXISTS (SELECT 1 FROM existing e
                      WHERE e.uuid = i.uuid AND length(e.uuid) > 0)
    GROUP BY i.event_type
    """,
    doc="J1+P3+F5: null/empty-uuid drop then LEFT ANTI join against the "
    "existing-day key set, via the real operators.dedup code path.",
)
def hfp_dedup_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    incoming = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", _uuid_col().alias("uuid")
    )
    existing = incoming.where(F.col("event_id") % 10 == 0).select("uuid")
    deduped = anti_join_existing(filter_valid_uuid(incoming), existing)
    return deduped.groupBy("event_type").agg(F.count("*").alias("n_inserted"))


@defquery(
    "hfp_key_union_dedup",
    f"""
    WITH incoming AS (
      SELECT event_id, user_id, {_UUID_SQL} AS uuid FROM events
    ),
    vp_keys AS (SELECT uuid FROM incoming WHERE event_id % 10 = 0),
    unsigned_keys AS (SELECT uuid FROM incoming WHERE event_id % 15 = 0)
    SELECT CAST(count(*) AS BIGINT)              AS n_inserted,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM incoming i
    WHERE i.uuid IS NOT NULL AND length(i.uuid) > 0
      AND NOT EXISTS (
        SELECT 1 FROM (SELECT uuid FROM vp_keys UNION ALL
                       SELECT uuid FROM unsigned_keys) e
        WHERE e.uuid = i.uuid AND length(e.uuid) > 0)
    """,
    doc="J2/U1: VehiclePosition key-set = union-all of two table scans "
    "(hfpTask.ts:100-103) probed by the anti-join — union without distinct "
    "(duplicate probe keys are harmless, saves a shuffle).",
)
def hfp_key_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    incoming = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", _uuid_col().alias("uuid")
    )
    vp_keys = incoming.where(F.col("event_id") % 10 == 0).select("uuid")
    unsigned_keys = incoming.where(F.col("event_id") % 15 == 0).select("uuid")
    existing = union_key_sets(vp_keys, unsigned_keys)
    deduped = anti_join_existing(filter_valid_uuid(incoming), existing)
    return deduped.agg(
        F.count("*").alias("n_inserted"),
        F.countDistinct("user_id").alias("n_users"),
    )


@defquery(
    "hfp_vp_routing",
    """
    WITH vp AS (
      SELECT event_id,
             CASE WHEN event_id % 11 = 0 THEN NULL
                  WHEN event_type = 'click' THEN 'journey'
                  ELSE 'deadrun' END AS journey_type
      FROM events
    )
    SELECT CASE WHEN journey_type = 'journey' THEN 'vehicleposition'
                ELSE 'unsignedevent' END AS _target_table,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM vp
    GROUP BY 1
    """,
    doc="P4 routing: journey_type != 'journey' (JS semantics: NULL routes "
    "to unsignedevent) via the real operators.routing column.",
)
def hfp_vp_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hfp_loader_spark.schema import VEHICLE_POSITION

    vp = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 11 == 0, F.lit(None).cast("string"))
        .when(F.col("event_type") == "click", F.lit("journey"))
        .otherwise(F.lit("deadrun"))
        .alias("journey_type"),
    )
    routed = with_target_table(vp, VEHICLE_POSITION)
    return routed.groupBy("_target_table").agg(F.count("*").alias("n_rows"))
