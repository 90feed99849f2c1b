"""R4 transpose (reference investigate_2022_fs_data.py:113 `.T`)."""

from pyspark.sql import functions as F

from cassandra_fs_pp_spark.operators.projection import transpose_frame


def test_transpose_rows_become_columns(spark):
    df = spark.createDataFrame(
        [("r0", 1, 10.5), ("r1", 2, 20.5), ("r2", 3, 30.5)],
        "k string, a int, b double",
    )
    t = transpose_frame(df, "k")
    assert sorted(t.columns) == ["column", "r0", "r1", "r2"]
    rows = {r["column"]: r for r in t.collect()}
    assert rows["a"]["r1"] == "2"
    assert rows["b"]["r2"] == "30.5"
    assert set(rows) == {"a", "b"}


def test_transpose_involution_shape(spark):
    df = spark.createDataFrame([("x", 1), ("y", 2)], "k string, v int")
    back = transpose_frame(transpose_frame(df, "k"), "column")
    # transposing twice restores the original orientation: one row per
    # original key, one column per original value column (stringified)
    assert sorted(back.columns) == ["column", "v"]
    rows = {r["column"]: r["v"] for r in back.collect()}
    assert rows == {"x": "1", "y": "2"}


def test_transpose_duplicate_keys_rejected(spark):
    import pytest

    df = spark.createDataFrame([("x", 1), ("x", 2)], "k string, v int")
    with pytest.raises(ValueError, match="duplicate"):
        transpose_frame(df, "k")
