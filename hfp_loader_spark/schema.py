"""Canonical HFP schemas and event-group maps.

Reference citations:
- column order: /root/reference/utils/hfpColumns.ts:1-46 (headerless CSV is
  positional; names are supplied externally, never inferred)
- types: /root/reference/utils/transformHfpItem.ts:5-51 reconciled with the
  DDL /root/reference/postgres_schema.sql (SURVEY §1.2/§1.3)
- event groups → target tables: /root/reference/utils/hfp.ts:48-58
- VehiclePosition routing target: /root/reference/service/insertHfpFromBlobStream.ts:68-70

Schema-key mismatches in the reference are resolved per SURVEY §1.3:
``vehicle_number`` is typed int per DDL (the reference's transform map has a
dead ``vehicle_int`` key so the column fell through to string); ``id`` exists
in the DDL but is never populated (stays NULL).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: The 44 positional CSV column names, in blob column order
#: (utils/hfpColumns.ts:1-46).
HFP_COLUMNS: list[str] = [
    "acc", "desi", "dir", "direction_id", "dl", "dr_type", "drst",
    "event_type", "geohash_level", "hdg", "headsign", "is_ongoing",
    "journey_start_time", "journey_type", "jrn", "lat", "line", "loc",
    "long", "mode", "next_stop_id", "occu", "oday", "odo", "oper",
    "owner_operator_id", "received_at", "route_id", "route", "seq", "spd",
    "start", "stop", "topic_latitude", "topic_longitude", "topic_prefix",
    "topic_version", "tsi", "tst", "unique_vehicle_id", "uuid", "veh",
    "vehicle_number", "version",
]

#: Raw scan schema: all strings (the CSV is untyped text; typing is an
#: explicit projection, never inference — SURVEY §1.1).
RAW_SCHEMA = T.StructType(
    [T.StructField(name, T.StringType(), True) for name in HFP_COLUMNS]
)

#: Coercion categories per transformHfpItem.ts:5-51 (``time`` columns
#: journey_start_time/start deliberately stay strings — Spark has no TIME
#: type and the reference never coerces them either).
HFP_TYPE_MAP: dict[str, str] = {
    "topic_prefix": "string",
    "topic_version": "string",
    "journey_type": "string",
    "is_ongoing": "boolean",
    "event_type": "string",
    "mode": "string",
    "owner_operator_id": "int",
    "vehicle_number": "int",  # DDL smallint; ref transform had dead 'vehicle_int'
    "unique_vehicle_id": "string",
    "route_id": "string",
    "direction_id": "int",
    "headsign": "string",
    "journey_start_time": "string",
    "next_stop_id": "string",
    "geohash_level": "int",
    "topic_latitude": "float",
    "topic_longitude": "float",
    "desi": "string",
    "dir": "int",
    "oper": "int",
    "veh": "int",
    "tst": "isodate",
    "tsi": "bigint",  # DDL bigint (postgres_schema.sql:26)
    "spd": "float",
    "hdg": "int",
    "lat": "float",
    "long": "float",
    "acc": "float",
    "dl": "int",
    "odo": "float",
    "drst": "boolean",
    "oday": "date",
    "jrn": "int",
    "line": "int",
    "start": "string",
    "loc": "string",
    "stop": "int",
    "route": "string",
    "occu": "int",
    "received_at": "isodate",
    "uuid": "string",
    "seq": "int",
    "dr_type": "int",
    "version": "bigint",  # DDL bigint (postgres_schema.sql:45)
}

_SPARK_TYPES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.DoubleType(),  # DDL double precision
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "isodate": T.TimestampType(),
}

#: Typed output schema (FIXTURES.md A3), in HFP_COLUMNS order.
TYPED_SCHEMA = T.StructType(
    [
        T.StructField(name, _SPARK_TYPES[HFP_TYPE_MAP.get(name, "string")], True)
        for name in HFP_COLUMNS
    ]
)

# --- Event groups (utils/hfp.ts:48-58) -------------------------------------

STOP_EVENT = "stopEvent"
OTHER_EVENT = "otherEvent"
VEHICLE_POSITION = "vehiclePosition"

EVENT_GROUPS: list[str] = [STOP_EVENT, OTHER_EVENT, VEHICLE_POSITION]

#: Event group → primary target table (utils/hfp.ts:54-58).
EVENT_GROUP_TABLES: dict[str, str] = {
    STOP_EVENT: "stopevent",
    OTHER_EVENT: "otherevent",
    VEHICLE_POSITION: "vehicleposition",
}

#: VehiclePosition rows with journey_type != 'journey' are routed here
#: (insertHfpFromBlobStream.ts:68-70).
UNSIGNED_TABLE = "unsignedevent"

#: Blob path prefix per event group (service/hfpStorage.ts:5-13): blobs live
#: under ``csv/<EventGroup>/<date>…``.
EVENT_GROUP_PATH_PREFIXES: dict[str, str] = {
    STOP_EVENT: "csv/StopEvent/",
    OTHER_EVENT: "csv/OtherEvent/",
    VEHICLE_POSITION: "csv/VehiclePosition/",
}

#: All physical sink tables (postgres_schema.sql; lightpriorityevent exists in
#: the DDL but no code path writes it — dormant, SURVEY §1.3).
SINK_TABLES: list[str] = [
    "stopevent",
    "otherevent",
    "vehicleposition",
    "unsignedevent",
]


#: Spark-side category → Postgres column type for sink DDL generation
#: (postgres_schema.sql semantics: varchar(255) strings, double
#: precision floats, timestamptz isodates; SURVEY §1.2).  The two
#: time-of-day columns stay varchar here exactly as they stay strings
#: in the engine (Spark has no TIME type; the reference never coerces
#: them either — SURVEY §1.2 "time-of-day"), a documented divergence
#: from the DDL's ``time without time zone``.
_PG_TYPES: dict[str, str] = {
    "string": "varchar(255)",
    "int": "integer",
    "bigint": "bigint",
    "float": "double precision",
    "boolean": "boolean",
    "date": "date",
    "isodate": "timestamp with time zone",
}


#: ``lightpriorityevent``'s 13 extra traffic-light-priority columns
#: (postgres_schema.sql:45-57: tlp_* request/decision metadata plus the
#: sid/signal_groupid signal identifiers).  The table exists in the
#: reference DDL but NO reference code path writes it (SURVEY §1.3), so
#: these columns appear only in the generated DDL — rendered so the DDL
#: set matches the reference schema file 5/5 tables (VERDICT r13 #4).
TLP_COLUMNS: list[tuple[str, str]] = [
    ("tlp_requestid", "integer"),
    ("tlp_requesttype", "varchar(255)"),
    ("tlp_prioritylevel", "varchar(255)"),
    ("tlp_reason", "varchar(255)"),
    ("tlp_att_seq", "integer"),
    ("tlp_decision", "varchar(255)"),
    ("sid", "integer"),
    ("signal_groupid", "integer"),
    ("tlp_signalgroupnbr", "integer"),
    ("tlp_line_configid", "integer"),
    ("tlp_point_configid", "integer"),
    ("tlp_frequency", "integer"),
    ("tlp_protocol", "varchar(255)"),
]


def postgres_ddl(table: str, unique_uuid: bool = False) -> str:
    """CREATE TABLE statement for one sink table — the engine's typed
    schema rendered as Postgres DDL (id double precision first, the 44
    HFP columns in blob order, ``uuid`` as the native uuid type,
    ``lightpriorityevent`` additionally carrying the 13 TLP columns).
    ``unique_uuid=True`` adds the UNIQUE constraint ``JdbcUpsertSink``'s
    ON CONFLICT promotion requires.  Exercised against a LIVE server in
    tests/test_postgres_live.py (a full golden-fixture day lands via
    COPY and the pushed-down keys query round-trips); column parity with
    the reference DDL is golden-locked in tests/test_schema_ddl.py."""
    cols = ['"id" double precision']
    for name in HFP_COLUMNS:
        pg_type = (
            "uuid"
            if name == "uuid"
            else _PG_TYPES[HFP_TYPE_MAP.get(name, "string")]
        )
        cols.append(f'"{name}" {pg_type}')
    if table == "lightpriorityevent":
        cols.extend(f'"{n}" {t}' for n, t in TLP_COLUMNS)
    constraint = ', UNIQUE ("uuid")' if unique_uuid else ""
    return (
        f'CREATE TABLE public."{table}" ({", ".join(cols)}{constraint})'
    )
