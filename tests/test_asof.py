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
