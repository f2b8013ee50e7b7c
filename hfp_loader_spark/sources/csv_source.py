"""HFP CSV source: headerless, positional, externally-named columns.

Reference parity (S1-S3 in SURVEY §2.1):

- blob enumeration by ``csv/<EventGroup>/<date>`` prefix
  (service/hfpStorage.ts:23-28) → path-glob construction here; on a cluster
  the same glob goes straight to the DataFrameReader and the object store
  listing happens distributed (no driver-side manifest materialization
  needed for immutable archives — the reference's point-in-time blob
  snapshot, azureStorage.ts:40-42, is dropped as documented in SURVEY §4).
- CSV parse options (utils/parseCsv.ts:1-11): delimiter ``,``, quote ``"``,
  trim fields, skip empty lines, skip lines whose values are all empty.
- positional column names from the fixed 44-name list
  (utils/hfpColumns.ts:1-46) via an explicit schema — never ``inferSchema``.

Scale: the scan is a plain distributed file scan; filters and column pruning
applied downstream reach it through Catalyst.  ``badRecordsPath``-style
tolerance is PERMISSIVE mode (malformed columns → null), matching the
reference's forgiving row-object construction.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hfp_loader_spark.schema import (
    EVENT_GROUP_PATH_PREFIXES,
    HFP_COLUMNS,
    RAW_SCHEMA,
)


def hfp_blob_glob(storage_root: str, event_group: str, date: str) -> str:
    """Path pattern for one (event_group, date): ``csv/<Group>/<date>*``.

    Mirrors the Azure prefix construction at service/hfpStorage.ts:26-27;
    ``storage_root`` may be a local dir, ``abfss://…``, ``s3a://…`` etc.
    """
    prefix = EVENT_GROUP_PATH_PREFIXES[event_group]
    return f"{storage_root.rstrip('/')}/{prefix}{date}*"


def read_hfp_csv(
    spark: SparkSession, paths: str | list[str], multi_line: bool = False
) -> DataFrame:
    """Raw scan: 44 string columns in hfpColumns order.

    All parse options map 1:1 to utils/parseCsv.ts:1-11.  Spark's text-line
    reader already drops fully empty lines; the ``skip_lines_with_empty_
    values`` semantic (a line like ``,,,…,``) needs the explicit all-empty
    filter below.

    ``multi_line``: the reference's csv-parse is quote-aware across
    newlines (a quoted field may contain ``\\n``).  Spark needs
    ``multiLine=true`` for that, which disables input splitting (one task
    per file) — a real throughput cost at scale.  HFP archives never quote
    newlines (telemetry fields are machine-generated scalars), so the
    default keeps splittable scans; pass ``multi_line=True`` for exact
    parity on hypothetical embedded newlines.
    """
    reader = (
        spark.read.schema(RAW_SCHEMA)
        .option("header", "false")
        .option("sep", ",")
        .option("quote", '"')
        .option("escape", '"')  # csv standard "" escaping inside quotes
        .option("ignoreLeadingWhiteSpace", "true")
        .option("ignoreTrailingWhiteSpace", "true")
        .option("mode", "PERMISSIVE")
    )
    if multi_line:
        reader = reader.option("multiLine", "true")
    df = reader.csv(paths)

    # skip_lines_with_empty_values: drop rows where every field is null/''.
    return df.filter(_any_nonempty_expr())


# Building the 44-term all-empty predicate costs ~1.2 s of driver time
# in py4j round trips per call (measured r15: ~130 JVM calls per term),
# and a day-load builds it once per event group.  Like the typed
# projection's column list (operators/transform.py), the unresolved
# expression is DataFrame-independent — cache it per py4j gateway
# (reference held so the identity can't be recycled by GC).
_ANY_NONEMPTY_CACHE: tuple[object, object] | None = None


def _any_nonempty_expr():
    global _ANY_NONEMPTY_CACHE
    from pyspark import SparkContext

    gw = SparkContext._gateway
    if gw is not None and _ANY_NONEMPTY_CACHE is not None and (
        _ANY_NONEMPTY_CACHE[0] is gw
    ):
        return _ANY_NONEMPTY_CACHE[1]
    expr = reduce(
        lambda a, b: a | b,
        [(F.col(c).isNotNull() & (F.length(c) > 0)) for c in HFP_COLUMNS],
    )
    if gw is not None:
        _ANY_NONEMPTY_CACHE = (gw, expr)
    return expr


def read_hfp_group(
    spark: SparkSession,
    storage_root: str,
    event_group: str,
    date: str,
    multi_line: bool = False,
) -> DataFrame:
    """Scan all blobs of one event group for one date (S1 + S3)."""
    return read_hfp_csv(
        spark, hfp_blob_glob(storage_root, event_group, date), multi_line
    )
