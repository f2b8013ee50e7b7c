"""JSON-Lines document source with corrupt-record quarantine.

The reference loader ingests CSV blobs only (service/hfpStorage.ts,
utils/parseCsv.ts); training-data corpora overwhelmingly arrive as
JSONL (one JSON object per line: Common Crawl derivatives, exported
conversation logs, annotation dumps).  This source is the Spark-first
ingestion path for that shape:

- **explicit schema, never inference** — same rule as the CSV source:
  ``inferSchema`` is a full extra pass over 100 TB and silently
  type-drifts between days; callers declare what they expect.
- **PERMISSIVE + corrupt-record capture** — a malformed line becomes a
  row whose ``_corrupt_record`` column holds the raw text and whose
  declared columns are NULL; :func:`split_corrupt` routes those rows to
  a quarantine frame instead of failing the 100-TB job at line
  3 billion.  (DROPMALFORMED silently deletes data; FAILFAST turns one
  bad line into a dead job — both are the wrong default for archives
  you don't control.)
- **compression for free** — .gz/.zst/.bz2 files decode in the scan
  (codec from the extension); note .gz is NOT splittable, so at scale
  prefer many ~100 MB gzip files (or zstd) over few giant ones — the
  file count bounds scan parallelism.

Scale: a plain distributed file scan; column pruning reaches it through
Catalyst (JSON parsing still touches every byte of each line — unlike
parquet there is no projection pushdown into the codec, which is why
:func:`to_parquet_stage` exists: parse JSONL once, then let every
downstream query scan columnar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

#: The documents-table shape (TESTDATA.md) as the default payload schema.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _with_corrupt(schema: T.StructType) -> T.StructType:
    """The caller's schema plus the corrupt-record capture column.

    Spark only populates ``columnNameOfCorruptRecord`` when the column
    is PRESENT in the user-supplied schema — with an explicit schema
    that lacks it, malformed lines degrade to all-NULL rows that are
    indistinguishable from legitimately-null data."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_jsonl(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """PERMISSIVE JSONL scan: declared columns plus ``_corrupt_record``
    (NULL for clean lines, the raw line for malformed ones).

    Implemented as ``read.text`` + ``from_json`` rather than
    ``read.json``: Spark REFUSES plans over a raw json scan that
    reference only the corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) and its
    documented workaround is caching the parsed frame — a non-starter
    at 100 TB.  A text scan has no such restriction, parses identically
    (same parser, same PERMISSIVE semantics), and lets one scan feed
    the clean and quarantine sides lazily."""
    if isinstance(paths, str):
        paths = [paths]
    parsed = spark.read.text(paths).select(
        F.from_json(
            "value",
            _with_corrupt(schema),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_r")
    )
    return parsed.select("_r.*")


def split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows without the capture column;
    quarantined rows as ``(raw_line)`` for offline repair/triage.

    One scan feeds both sides lazily — writers that need both should
    persist ``raw`` first or write clean/quarantine in one pass via
    partitioned output on ``is_corrupt``."""
    clean = raw.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = raw.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, bad


def to_parquet_stage(
    spark: SparkSession,
    paths: str | list[str],
    out_dir: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    partition_by: list[str] | None = None,
) -> tuple[int, int]:
    """Parse JSONL once, stage as parquet, quarantine bad lines under
    ``<out_dir>/_quarantine``; returns (clean_rows, quarantined_rows).

    The 100 TB pattern: JSON decode is the most expensive scan Spark
    does (every byte of every line, no pushdown) — pay it exactly once,
    then every downstream query gets columnar pruning, predicate
    pushdown, and splittable files.  BOTH counts ride the clean write
    via ONE ``observe`` placed ABOVE the corrupt filter (CollectMetrics
    is a pushdown barrier, so every parsed row — clean and corrupt —
    flows through the metric before the filter drops the corrupt ones).
    The clean path is therefore exactly one JSON decode; only when
    corrupt lines exist does the quarantine write pay a second decode
    of the input (ADVICE r9: the old shape paid up to three — a
    ``bad.count()`` pass plus the quarantine write, unconditionally)."""
    from pyspark.sql import Observation

    raw = read_jsonl(spark, paths, schema)
    obs = Observation()
    observed = raw.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.coalesce(
            F.sum(F.col(CORRUPT_COL).isNotNull().cast("long")), F.lit(0)
        ).alias("n_bad"),
    )
    clean, _ = split_corrupt(observed)
    writer = clean.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(f"{out_dir.rstrip('/')}/clean")
    n_total = int(obs.get["n_total"])
    n_bad = int(obs.get["n_bad"])
    if n_bad:
        _, bad = split_corrupt(raw)
        bad.write.mode("overwrite").parquet(
            f"{out_dir.rstrip('/')}/_quarantine"
        )
    return n_total - n_bad, n_bad


def write_jsonl(
    df: DataFrame,
    out_dir: str,
    partition_by: list[str] | None = None,
    compression: str = "gzip",
) -> None:
    """Export a frame as JSON-Lines — the interchange counterpart of
    :func:`read_jsonl` (annotation hand-off, cross-org corpus delivery,
    loaders that read text, not parquet).

    Defaults to gzip: at 100 TB the export is network-bound and JSONL
    compresses 5-10×; note gzip parts are NOT splittable, so size the
    upstream partitioning to the ~100 MB-per-file rule the module
    docstring gives for the read side (the writer emits one file per
    partition — ``repartition`` first to control part count/size).
    ``partition_by`` lays out ``col=value/`` directories exactly like
    the parquet writers, so the same partition pruning applies when the
    export is read back."""
    w = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.json(out_dir.rstrip("/"))
