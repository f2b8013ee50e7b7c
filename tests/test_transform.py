"""Unit tests for the typed projection's net coercion semantics (SURVEY §1.2).

Each case states the NET reference behavior: transformHfpItem.ts coercion
composed with upsert.ts:36's falsy→NULL pass.
"""

from __future__ import annotations

import datetime

import pytest

from hfp_loader_spark.operators.transform import typed_projection
from hfp_loader_spark.schema import HFP_COLUMNS, RAW_SCHEMA


def _run_one(spark, **overrides):
    row = {c: None for c in HFP_COLUMNS}
    row.update(overrides)
    df = spark.createDataFrame([tuple(row[c] for c in HFP_COLUMNS)], RAW_SCHEMA)
    return typed_projection(df).collect()[0]


def test_string_empty_to_null(spark):
    out = _run_one(spark, desi="", route_id="2551", mode=None)
    assert out["desi"] is None
    assert out["route_id"] == "2551"
    assert out["mode"] is None


@pytest.mark.parametrize(
    "value,expected",
    [
        ("", None),  # empty → 0 → NULL
        ("0", None),  # parsed 0 → NULL (falsy pass)
        ("garbage", None),  # NaN → 0 → NULL
        ("120", 120),
        ("-30", -30),
        ("2.5", 2),  # parseInt truncation toward zero
        ("-2.5", -2),
    ],
)
def test_int_coercion(spark, value, expected):
    out = _run_one(spark, dl=value)
    assert out["dl"] == expected


@pytest.mark.parametrize(
    "value,expected",
    [
        ("", None),
        ("0", None),
        ("0.0", None),
        ("abc", None),
        ("nan", None),  # JS parseFloat('nan') → NaN → 0 → NULL
        ("11.9", 11.9),
        ("-0.3", -0.3),
    ],
)
def test_float_coercion(spark, value, expected):
    out = _run_one(spark, spd=value)
    assert out["spd"] == expected


@pytest.mark.parametrize(
    "value,expected",
    [
        ("true", True),
        ("false", True),  # !!'false' is true (transformHfpItem.ts:78-80)
        ("1", True),
        ("0", True),  # non-empty string ⇒ true
        ("", None),  # false → NULL via falsy pass
        (None, None),
    ],
)
def test_boolean_truthiness(spark, value, expected):
    out = _run_one(spark, drst=value)
    assert out["drst"] == expected


def test_date_iso_and_epoch(spark):
    out = _run_one(spark, oday="2021-02-09")
    assert out["oday"] == datetime.date(2021, 2, 9)
    # epoch millis branch: no '-' in value
    out = _run_one(spark, oday="1612851330000")  # 2021-02-09T06:15:30Z
    assert out["oday"] == datetime.date(2021, 2, 9)
    out = _run_one(spark, oday="not-a-date")
    assert out["oday"] is None
    out = _run_one(spark, oday="")
    assert out["oday"] is None


def test_timestamp_iso_and_epoch(spark):
    expected = datetime.datetime(2021, 2, 9, 6, 15, 30)
    out = _run_one(spark, tst="2021-02-09T06:15:30.000Z")
    assert out["tst"] == expected
    out = _run_one(spark, tst="1612851330000")
    assert out["tst"] == expected
    out = _run_one(spark, received_at="2021-02-09 06:15:30")
    assert out["received_at"] == expected


def test_time_of_day_stays_string(spark):
    out = _run_one(spark, journey_start_time="06:15:00", start="06:15:00")
    assert out["journey_start_time"] == "06:15:00"
    assert out["start"] == "06:15:00"


def test_bigint_columns(spark):
    out = _run_one(spark, tsi="1612851330", version="1")
    assert out["tsi"] == 1612851330
    assert out["version"] == 1


def test_two_typed_projections_self_join(spark):
    """Locks the cached-exprId constraint (ADVICE r15): the memoized
    typed-column list gives every typed projection identical output
    exprIds, so joining/unioning two of them leans on Spark's
    DeduplicateRelations re-aliasing one side.  If a Spark upgrade ever
    drops that rescue this fails with an ambiguous-attribute analysis
    error — the signal to rebuild the column list per call site."""
    row = {c: None for c in HFP_COLUMNS}
    row.update(uuid="u-1", route_id="2551", tsi="10")
    df = spark.createDataFrame(
        [tuple(row[c] for c in HFP_COLUMNS)], RAW_SCHEMA
    )
    a = typed_projection(df)
    b = typed_projection(df).withColumnRenamed("route_id", "route_b")
    joined = a.join(b, "uuid").select("uuid", "route_id", "route_b")
    assert joined.collect() == [("u-1", "2551", "2551")]
    unioned = typed_projection(df).unionByName(typed_projection(df))
    assert unioned.count() == 2


def test_schema_types(spark):
    from hfp_loader_spark.schema import TYPED_SCHEMA

    row = {c: None for c in HFP_COLUMNS}
    df = spark.createDataFrame([tuple(row[c] for c in HFP_COLUMNS)], RAW_SCHEMA)
    assert typed_projection(df).schema == TYPED_SCHEMA
