"""run_constraints: each constraint type catches planted violations."""

from __future__ import annotations

from pyspark.sql import functions as F

from hfp_loader_spark.operators.quality import (
    ConstraintSuite,
    ForeignKey,
    run_constraints,
)


def test_constraints_catch_planted_violations(spark):
    child = spark.createDataFrame(
        [
            (1, 100, 5.0),
            (1, 100, 6.0),   # dup key 1 (x2 → 1 excess row)
            (1, 101, 7.0),   # dup key 1 (x3 → 2 excess rows total)
            (2, None, -1.0), # null fk + negative amount
            (3, 999, 2.0),   # fk orphan (999 not in parent)
        ],
        ["k", "fk", "amount"],
    )
    parent = spark.createDataFrame([(100,), (101,)], ["pk"])
    suite = ConstraintSuite(
        not_null={"fk_not_null": "fk"},
        unique={"k_unique": ["k"]},
        checks={"amount_positive": F.col("amount") > 0},
        foreign_keys=[ForeignKey("fk_valid", "fk", parent, "pk")],
    )
    got = {
        r["check_name"]: r["n_violations"]
        for r in run_constraints(child, suite).collect()
    }
    assert got == {
        "fk_not_null": 1,
        "k_unique": 2,        # excess rows beyond first occurrence
        "amount_positive": 1,
        "fk_valid": 1,        # NULL fk is not an orphan — not-null's job
    }


def test_constraints_all_green_on_clean_data(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], ["k", "v"])
    suite = ConstraintSuite(
        not_null={"k_not_null": "k"},
        unique={"k_unique": ["k"]},
        checks={"v_positive": F.col("v") > 0},
    )
    got = {
        r["check_name"]: r["n_violations"]
        for r in run_constraints(df, suite).collect()
    }
    assert set(got.values()) == {0}


def test_key_bitmaps_match_distinct_counts(spark, sf_dir):
    """Bitmap popcounts must equal exact count_distinct per dim, and the
    word-aligned intersection must equal the exact distinct-join — on
    real event days AND a planted frame crossing word boundaries."""
    from pyspark.sql import functions as F

    from hfp_loader_spark.operators.sketches import (
        bitmap_cardinality,
        bitmap_intersect_cardinality,
        key_bitmaps,
    )
    from hfp_loader_spark.plans.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("d"), "user_id"
    )
    bm = key_bitmaps(ev, "d", "user_id")
    got = {
        r["dim"]: r["n_keys"] for r in bitmap_cardinality(bm).collect()
    }
    want = {
        r["d"]: r["n"]
        for r in ev.groupBy("d")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == want

    # planted: keys straddling word boundaries (62, 63, 64, 126, 127)
    rows = [("a", k) for k in [0, 62, 63, 64, 126, 127, 63]] + [
        ("b", k) for k in [63, 64, 1000, 0]
    ]
    df = spark.createDataFrame(rows, "g string, k long")
    pb = key_bitmaps(df, "g", "k")
    card = {r["dim"]: r["n_keys"] for r in bitmap_cardinality(pb).collect()}
    assert card == {"a": 6, "b": 4}  # dup 63 in 'a' collapses
    inter = bitmap_intersect_cardinality(
        pb.where(F.col("dim") == "a"), pb.where(F.col("dim") == "b")
    ).collect()
    assert [(r["dim_a"], r["dim_b"], r["n_common"]) for r in inter] == [
        ("a", "b", 3)  # {0, 63, 64}
    ]


def test_bitmap_index_incremental_merge_equals_full(spark, sf_dir, tmp_path):
    """Two O(delta) appends OR-merged on load must equal key_bitmaps
    over the full input (the mergeable-aggregate property), and a
    mismatched word width must be refused at append time."""
    import pytest
    from pyspark.sql import functions as F

    from hfp_loader_spark.operators.sketches import (
        bitmap_cardinality,
        key_bitmaps,
        load_bitmap_index,
        save_bitmap_index,
    )
    from hfp_loader_spark.plans.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("d"), "user_id"
    )
    b1 = ev.where("user_id % 2 = 0")
    b2 = ev.where("user_id % 2 = 1")
    root = str(tmp_path / "bitmap_index")
    v1 = save_bitmap_index(spark, b1, root, "d", "user_id")
    v2 = save_bitmap_index(spark, b2, root, "d", "user_id")
    assert v2 == v1 + 1

    merged = load_bitmap_index(spark, root)
    full = key_bitmaps(ev, "d", "user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    got = {r["dim"]: r["n_keys"] for r in bitmap_cardinality(merged).collect()}
    want = {
        r["d"]: r["n"]
        for r in ev.groupBy("d")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert got == want

    with pytest.raises(ValueError, match="word_bits"):
        save_bitmap_index(spark, b1, root, "d", "user_id", word_bits=31)


def test_key_bitmaps_negative_key_raises(spark):
    """ADVICE r10 #2: a negative key would shift by a negative count and
    land in a negative word_idx — silently corrupt words (with Spark and
    DuckDB additionally disagreeing on negative %).  The plan must RAISE,
    and NULL keys must still be quietly dropped."""
    import pytest

    from hfp_loader_spark.operators.sketches import (
        bitmap_cardinality,
        key_bitmaps,
    )

    bad = spark.createDataFrame(
        [("a", 1), ("a", -5), ("a", 2)], "g string, k long"
    )
    with pytest.raises(Exception, match="key_bitmaps"):
        key_bitmaps(bad, "g", "k").collect()

    ok = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 2)], "g string, k long"
    )
    card = bitmap_cardinality(key_bitmaps(ok, "g", "k")).collect()
    assert [(r["dim"], r["n_keys"]) for r in card] == [("a", 2)]
