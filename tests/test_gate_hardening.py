"""The hardened local correctness gate (VERDICT r12 #3).

Round 12's driver gate failed two entries that the LOCAL replica passed,
because ``tools/check_correctness.py`` normalized values more loosely
than the driver's hash in exactly two ways:

- int-valued floats were collapsed (``-0.0`` → ``"0"``), masking the
  ``sim_rp_distortion`` negative-zero divergence (DuckDB ``round()``
  preserves the sign of a tiny negative; Spark returns ``+0.0``);
- lists were stringified, masking ``sim_random_projection``'s
  ``array<double>`` column, which the driver's pandas ``sort_values``
  canonicalization cannot factorize (``TypeError: unhashable 'list'``).

These tests pin the hardened gate's strictness (each one retro-fails
the pre-r13 ``_norm_cell``), the catalog-wide scalar-only output
contract, and the cross-engine negative-zero normalizer itself.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)
from check_correctness import (  # noqa: E402
    _norm_rows,
    _strict_cell,
    canon_cells,
)

_SCALAR_BAD = ("array", "map", "struct")


def test_negative_zero_is_distinguished():
    """Retro-fails the pre-r13 gate, which mapped both to ``"0"``."""
    assert _strict_cell(-0.0) == "-0.0"
    assert _strict_cell(0.0) == "0.0"
    assert _strict_cell(-0.0) != _strict_cell(0.0)


def test_int_valued_floats_not_collapsed():
    """``2.0`` vs ``2`` is a dtype divergence the driver's pandas-frame
    hash sees (e.g. DuckDB HUGEINT → float64 vs Spark long → int64);
    the gate must see it too.  Retro-fails the pre-r13 gate."""
    assert _strict_cell(2.0) == "2.0"
    assert _strict_cell(2) == "2"
    assert _strict_cell(2.0) != _strict_cell(2)


def test_list_cells_raise_not_stringify():
    """The driver's canonicalizer errors on non-scalar cells; the local
    gate must too, never silently stringify.  Retro-fails the pre-r13
    gate, which produced ``"[1.0,2.0]"``."""
    with pytest.raises(TypeError, match="unhashable"):
        _strict_cell([1.0, 2.0])
    with pytest.raises(TypeError):
        _norm_rows(["a", "rp"], [(1, [1.0, 2.0])])


def test_canon_cells_raises_on_list_column():
    import pandas as pd

    pdf = pd.DataFrame({"vec_id": [1, 2], "rp": [[1.0], [2.0]]})
    with pytest.raises(TypeError, match="unhashable"):
        canon_cells(pdf)


def test_canon_cells_sorts_order_insensitively():
    import pandas as pd

    a = pd.DataFrame({"k": [2, 1], "v": [0.5, -0.5]})
    b = pd.DataFrame({"v": [-0.5, 0.5], "k": [1, 2]})
    assert canon_cells(a) == canon_cells(b)


def test_negative_zero_normalizer_cross_engine(spark):
    """The fix pattern itself: ``round(x, 3) + 0.0`` yields the same
    bits on both engines for a tiny negative input, while a bare
    ``round`` does NOT (DuckDB preserves ``-0.0``).  This is the exact
    r12 ``sim_rp_distortion`` failure reduced to one value."""
    import math

    import duckdb
    from pyspark.sql import functions as F

    con = duckdb.connect()
    bare, normed = con.execute(
        "SELECT round(-0.0001::DOUBLE, 3) AS bare,"
        " round(-0.0001::DOUBLE, 3) + 0.0 AS normed"
    ).fetchall()[0]
    assert math.copysign(1.0, bare) == -1.0  # DuckDB preserves the sign
    assert math.copysign(1.0, normed) == 1.0

    row = (
        spark.range(1)
        .select(
            F.round(F.lit(-0.0001), 3).alias("bare"),
            (F.round(F.lit(-0.0001), 3) + F.lit(0.0)).alias("normed"),
        )
        .collect()[0]
    )
    assert math.copysign(1.0, row.bare) == 1.0  # Spark already +0.0
    assert math.copysign(1.0, row.normed) == 1.0
    # the hardened gate distinguishes the bare pair, passes the normed
    assert _strict_cell(bare) != _strict_cell(row.bare)
    assert _strict_cell(normed) == _strict_cell(row.normed)


def test_every_catalog_entry_output_is_scalar_only(spark, sf_dir):
    """No entry may return an array/map/struct top-level column — the
    driver's canonicalizer cannot hash one (r12 ``sim_random_projection``
    err).  Schema-only: builds every plan, executes none."""
    from hfp_loader_spark.plans.catalog import REGISTRY

    offenders: list[str] = []
    for name, spec in REGISTRY.items():
        try:
            schema = spec.builder(spark, sf_dir).schema
        except Exception:  # noqa: BLE001 — runnability is pinned elsewhere
            continue
        for f in schema.fields:
            if f.dataType.typeName() in _SCALAR_BAD:
                offenders.append(f"{name}.{f.name}:{f.dataType.typeName()}")
    assert not offenders, f"non-scalar entry outputs: {offenders}"
