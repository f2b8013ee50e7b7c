"""Property-based invariants (SURVEY §5.3) + the zero-UDF plan guard."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hfp_loader_spark.operators.dedup import exact_dedup, filter_valid_uuid
from hfp_loader_spark.operators.transform import typed_projection
from hfp_loader_spark.schema import HFP_COLUMNS, HFP_TYPE_MAP, RAW_SCHEMA

# Garbage-heavy raw cell values: every coercion path, incl. traps.
_cell = st.one_of(
    st.just(""),
    st.just("0"),
    st.just("false"),
    st.just("true"),
    st.just("NaN"),
    st.just("garbage"),
    st.just("2.5"),
    st.just("-17"),
    st.just("1612851330000"),
    st.just("2021-02-09T06:15:30.000Z"),
    st.text(alphabet="abc019.-", min_size=0, max_size=12),
)

_row = st.lists(_cell, min_size=len(HFP_COLUMNS), max_size=len(HFP_COLUMNS))


@pytest.fixture(scope="module")
def mk_raw(spark):
    def make(rows):
        return spark.createDataFrame([tuple(r) for r in rows], RAW_SCHEMA)

    return make


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, min_size=1, max_size=8))
def test_typed_projection_domains(spark, mk_raw, rows):
    """Whatever the input garbage: booleans are TRUE/NULL (never FALSE),
    numerics are non-zero/NULL (the falsy→NULL trap), strings never empty,
    and row count is preserved (projection drops nothing)."""
    typed = typed_projection(mk_raw(rows))
    assert typed.count() == len(rows)
    collected = typed.collect()
    for r in collected:
        for name in HFP_COLUMNS:
            kind = HFP_TYPE_MAP.get(name, "string")
            v = r[name]
            if v is None:
                continue
            if kind == "boolean":
                assert v is True
            elif kind in ("int", "bigint", "float"):
                assert v != 0
            elif kind == "string":
                assert v != ""


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_row, min_size=1, max_size=6), data=st.data())
def test_uuid_filter_and_dedup_counts(spark, mk_raw, rows, data):
    """count(valid) = total - empties; exact_dedup is idempotent and
    produces exactly the distinct key count."""
    uuids = data.draw(
        st.lists(
            st.sampled_from(["", "k1", "k2", "k3"]),
            min_size=len(rows),
            max_size=len(rows),
        )
    )
    uuid_idx = HFP_COLUMNS.index("uuid")
    rows2 = [
        tuple(list(r[:uuid_idx]) + [u] + list(r[uuid_idx + 1 :]))
        for r, u in zip(rows, uuids)
    ]
    raw = spark.createDataFrame(rows2, RAW_SCHEMA)
    valid = filter_valid_uuid(raw)
    assert valid.count() == sum(1 for u in uuids if u)
    deduped = exact_dedup(valid, ["uuid"])
    assert deduped.count() == len({u for u in uuids if u})
    assert exact_dedup(deduped, ["uuid"]).count() == deduped.count()


def test_no_python_row_udfs_in_catalog_plans(spark, sf_dir):
    """SURVEY §2.10: zero row-at-a-time Python UDFs anywhere.  Arrow-batched
    mapInPandas/applyInPandasWithState (multimodal + stateful entries) are
    the sanctioned exceptions; BatchEvalPython (per-row pickling) is not."""
    from hfp_loader_spark.plans.catalog import REGISTRY

    for name, spec in REGISTRY.items():
        if name.startswith("streaming"):
            continue  # streaming plans analyzed at start(); skip the run
        df = spec.builder(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
