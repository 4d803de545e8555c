"""as-of join semantics: greatest right.ts <= left.ts per group, exact-ts
ties match, rows before any snapshot get null."""

import datetime as dt

from pyspark.sql import functions as F

from python_web_scraper_cleaner_spark.operators.asof import asof_join


def _ts(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


def test_asof_join_picks_most_recent_at_or_before(spark):
    right = spark.createDataFrame(
        [("a", _ts(1), 10), ("a", _ts(3), 30), ("b", _ts(2), 99)],
        "g string, ts timestamp, v int")
    left = spark.createDataFrame(
        [(1, "a", _ts(0, 30)),   # before any snapshot → null
         (2, "a", _ts(1)),       # exact tie → 10 (<= semantics)
         (3, "a", _ts(2, 59)),   # between → 10
         (4, "a", _ts(3, 1)),    # after later snapshot → 30
         (5, "b", _ts(5)),       # other group → 99
         (6, "b", _ts(1))],      # before b's snapshot → null
        "id long, g string, ts timestamp")
    out = {r["id"]: r["v"] for r in
           asof_join(left, right, on="ts", by="g",
                     value_cols=["v"]).collect()}
    assert out == {1: None, 2: 10, 3: 10, 4: 30, 5: 99, 6: None}
    # inner semantics = filter nulls afterwards
    inner = asof_join(left, right, on="ts", by="g", value_cols=["v"]) \
        .filter(F.col("v").isNotNull()).count()
    assert inner == 4


def test_asof_matched_null_value_wins_and_no_row_tearing(spark):
    """A matched snapshot whose value field is NULL must win over older
    snapshots (DuckDB ASOF semantics), and multiple value columns must all
    come from the SAME snapshot row."""
    right = spark.createDataFrame(
        [("a", _ts(1), 10, 100), ("a", _ts(2), None, 200)],
        "g string, ts timestamp, v int, w int")
    left = spark.createDataFrame([(1, "a", _ts(3))],
                                 "id long, g string, ts timestamp")
    row = asof_join(left, right, on="ts", by="g",
                    value_cols=["v", "w"]).collect()[0]
    assert row["v"] is None and row["w"] == 200   # both from the 02:00 row


def test_asof_null_right_ts_never_matches(spark):
    right = spark.createDataFrame([("a", None, 7)],
                                  "g string, ts timestamp, v int")
    left = spark.createDataFrame([(1, "a", _ts(1))],
                                 "id long, g string, ts timestamp")
    row = asof_join(left, right, on="ts", by="g",
                    value_cols=["v"]).collect()[0]
    assert row["v"] is None


def test_asof_rejects_column_collisions(spark):
    import pytest
    right = spark.createDataFrame([("a", _ts(1), 1)],
                                  "g string, ts timestamp, v int")
    left = spark.createDataFrame([(1, "a", _ts(2), 9)],
                                 "v long, g string, ts timestamp, x int")
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, on="ts", by="g", value_cols=["v"])
