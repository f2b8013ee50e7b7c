"""Typed projection: raw string HFP rows → typed columns (P2, F1-F5).

Replicates the *net* end-to-end coercion of the reference — the composition
of the transform pass (/root/reference/utils/transformHfpItem.ts:54-107) and
the insert layer's falsy→NULL pass (/root/reference/utils/upsert.ts:36) —
as pure Catalyst column expressions (zero Python UDFs, SURVEY §2.10).

Net semantics per category (SURVEY §1.2, the "null/zero trap"):

- string   : empty → NULL, else kept (CSV parser already trims)
- int/float: empty → 0 → NULL; unparseable → NaN → 0 → NULL; parsed 0 → NULL
             (``item[key] || null`` converts numeric 0 back to SQL NULL)
- boolean  : any non-empty string → TRUE (even ``"false"`` / ``"0"``,
             transformHfpItem.ts:78-80); empty / FALSE → NULL (falsy pass)
- date     : contains '-' → ISO parse; else epoch-millis; failure → NULL
- isodate  : same dual parse, kept as timestamp
- time-of-day (journey_start_time, start): never coerced, stays string
  (transformHfpItem.ts:19,41; Postgres ``time`` has no Spark equivalent)

Documented divergence (SURVEY F2): JS ``parseInt``/``parseFloat`` prefix-parse
malformed input (``'7abc'`` → 7); this engine uses cast semantics (→ NULL).
Fractional ints ('2.5' → 2) are matched by casting through double, which
truncates toward zero exactly like ``parseInt``'s digit-prefix scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hfp_loader_spark.schema import HFP_COLUMNS, HFP_TYPE_MAP


def _nonempty(col: Column) -> Column:
    return col.isNotNull() & (F.length(col) > 0)


def _string_expr(col: Column) -> Column:
    # '' → NULL (transformHfpItem.ts:58-64); non-empty strings are truthy in
    # the falsy→NULL pass so they survive unchanged.
    return F.when(_nonempty(col), col)


def _numeric_expr(col: Column, spark_type: str) -> Column:
    # parseInt/parseFloat with NaN→0 (transformHfpItem.ts:66-76), then 0→NULL
    # (upsert.ts:36).  Casting through double truncates '2.5'→2 like parseInt.
    as_double = col.try_cast("double")
    parsed = as_double if spark_type == "float" else as_double.try_cast(spark_type)
    # NULL (unparseable/empty), 0, and NaN all collapse to NULL.
    return F.when(parsed.isNotNull() & ~F.isnan(parsed.cast("double")) & (parsed != 0), parsed)


def _boolean_expr(col: Column) -> Column:
    # !!value (transformHfpItem.ts:78-80) then false→NULL (upsert.ts:36):
    # net result is TRUE for any non-empty string, NULL otherwise.
    return F.when(_nonempty(col), F.lit(True))


def _temporal_expr(col: Column, spark_type: str) -> Column:
    # Dual parse (transformHfpItem.ts:87-103): '-' in the value ⇒ ISO string,
    # else epoch-milliseconds integer.  Parse failure → NULL (the try/catch
    # around formatFn), and '' → NULL upfront.
    iso = col.try_cast("timestamp")
    epoch_ms = F.timestamp_millis(col.try_cast("long"))
    ts = F.when(col.contains("-"), iso).otherwise(epoch_ms)
    # Documented divergence: JS Date accepts ±273k-year epochs, but no
    # real HFP timestamp leaves [0001, 9999] — values outside the
    # proleptic-Gregorian window Python/Arrow/Postgres-sane tooling can
    # represent are garbage input, coerced to NULL like any other parse
    # failure (a driver-side collect of year −1857 would otherwise throw
    # in pyspark's DateType.fromInternal).
    ts = F.when(
        ts.between(F.lit("0001-01-01").cast("timestamp"),
                   F.lit("9999-12-31 23:59:59").cast("timestamp")),
        ts,
    )
    out = ts.cast("date") if spark_type == "date" else ts
    return F.when(_nonempty(col), out)


def typed_column(name: str) -> Column:
    """The coercion expression for one HFP column, aliased to its name."""
    col = F.col(name)
    kind = HFP_TYPE_MAP.get(name, "string")
    if kind == "string":
        expr = _string_expr(col)
    elif kind in ("int", "bigint", "float"):
        expr = _numeric_expr(col, kind)
    elif kind == "boolean":
        expr = _boolean_expr(col)
    elif kind in ("date", "isodate"):
        expr = _temporal_expr(col, kind)
    else:  # pragma: no cover — unmapped keys default to string (ts:56)
        expr = _string_expr(col)
    return expr.alias(name)


# Building the 44 coercion expressions costs ~0.65 s of driver time in
# py4j round trips (measured r15; ~500 JVM calls), and a day-load builds
# them once per event group — ~2 s of the e2e wall was pure expression
# re-construction (VERDICT r14 #5).  Unresolved Column trees are
# DataFrame-independent, so one list serves every plan; the cache holds
# the py4j gateway it was built against (identity-compared, reference
# held so the id can't be recycled) and rebuilds if the JVM changed.
#
# Constraint (ADVICE r15): the cached Alias expressions carry fixed JVM
# exprIds, so every typed projection in the process shares identical
# output exprIds.  Safe for self-joins/unions of two typed_projection
# outputs because Spark's DeduplicateRelations re-aliases one side
# during analysis (locked by test_transform.py::
# test_two_typed_projections_self_join); if a future Spark version ever
# drops that rescue, the symptom is an ambiguous-attribute analysis
# error and the fix is rebuilding the list per call site.
_TYPED_COLS_CACHE: tuple[object, list[Column]] | None = None


def _typed_columns() -> list[Column]:
    global _TYPED_COLS_CACHE
    from pyspark import SparkContext

    gw = SparkContext._gateway
    if gw is None:  # no JVM yet — caller will fail in select() anyway
        return [typed_column(name) for name in HFP_COLUMNS]
    if _TYPED_COLS_CACHE is not None and _TYPED_COLS_CACHE[0] is gw:
        return _TYPED_COLS_CACHE[1]
    cols = [typed_column(name) for name in HFP_COLUMNS]
    _TYPED_COLS_CACHE = (gw, cols)
    return cols


def typed_projection(raw: DataFrame) -> DataFrame:
    """Apply the full 44-column typed projection.

    One ``select`` of pure column expressions — whole-stage-codegen friendly,
    pipelined with the scan; no shuffle, no UDF.
    """
    return raw.select(*_typed_columns())
