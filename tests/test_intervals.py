"""Interval operators: island merging and the bucketed join rewrite must
equal a naive exact range join."""

import datetime as dt

from pyspark.sql import functions as F

from python_web_scraper_cleaner_spark.operators.intervals import (
    incident_windows, interval_join_bucketed)


def _ts(h, m=0):
    return dt.datetime(2026, 1, 1, h, m)


def _events(spark):
    rows = []
    base = dt.datetime(2026, 1, 1)
    # type 'a': hours 0,1,2 hot (7 events each), hour 3 cold (2), hour 5 hot
    for h, n in ((0, 7), (1, 8), (2, 7), (3, 2), (5, 9)):
        for i in range(n):
            rows.append(("a", base + dt.timedelta(hours=h, minutes=i),
                         i % 3))
    # type 'b': single hot hour
    for i in range(6):
        rows.append(("b", base + dt.timedelta(hours=2, minutes=i), i))
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, user_id long")


def test_islands_merge_consecutive_hot_hours(spark):
    win = {(r["event_type"], r["win_start"].hour, r["win_end"].hour)
           for r in incident_windows(_events(spark), threshold=6).collect()}
    assert win == {("a", 0, 3), ("a", 5, 6), ("b", 2, 3)}


def test_bucketed_interval_join_equals_naive_range_join(spark):
    ev = _events(spark)
    win = incident_windows(ev, threshold=6)
    got = interval_join_bucketed(ev, win).select(
        "event_type", "ts", "win_start").collect()
    naive = (ev.join(win, "event_type")
             .filter((F.col("ts") >= F.col("win_start"))
                     & (F.col("ts") < F.col("win_end")))
             .select("event_type", "ts", "win_start").collect())
    assert sorted(map(tuple, got)) == sorted(map(tuple, naive))
    assert len(got) > 0


def test_interval_join_tolerates_empty_and_subhour_intervals(spark):
    """Zero-length intervals yield no rows (not a crash); sub-hour
    intervals match only their contained points."""
    ev = _events(spark)
    win = spark.createDataFrame(
        [("a", _ts(1), _ts(1)),            # empty [t, t) → no rows
         ("a", _ts(1), _ts(1, 30)),        # sub-hour → minutes 0-29
         ("b", _ts(2, 10), _ts(2, 3))],    # negative → no rows
        "event_type string, win_start timestamp, win_end timestamp")
    got = interval_join_bucketed(ev, win).collect()
    assert all(r["win_end"] == _ts(1, 30) for r in got)
    # type-a hour-1 events at minutes 0..7 → only minutes < 30 match (all 8)
    assert len(got) == 8


def test_interval_join_non_hour_aligned_bounds(spark):
    """Regression: intervals whose bounds are not hour-aligned must still
    match every contained point. [01:00, 02:30) used to miss the partial
    last hour (a 02:05 point joined zero intervals) and a non-aligned
    START like [01:30, 02:30) produced bucket values no truncated point
    bucket could ever equal — the whole join silently emptied."""
    ev = spark.createDataFrame(
        [("a", _ts(1, 40), 0), ("a", _ts(2, 5), 1), ("a", _ts(2, 45), 2)],
        "event_type string, ts timestamp, user_id long")
    win = spark.createDataFrame(
        [("a", _ts(1), _ts(2, 30)),       # partial last hour
         ("a", _ts(1, 30), _ts(2, 30))],  # non-aligned start AND end
        "event_type string, win_start timestamp, win_end timestamp")
    got = interval_join_bucketed(ev, win).select(
        "ts", "win_start").collect()
    naive = (ev.join(win, "event_type")
             .filter((F.col("ts") >= F.col("win_start"))
                     & (F.col("ts") < F.col("win_end")))
             .select("ts", "win_start").collect())
    assert sorted(map(tuple, got)) == sorted(map(tuple, naive))
    # both intervals contain 01:40 and 02:05; neither contains 02:45
    assert len(got) == 4
