"""Gaps-and-islands incident windows + bucketed interval join.

Two temporal operators a crawl-monitoring pipeline needs that Spark has
no primitive for:

- incident_windows: merge consecutive over-threshold hours into maximal
  [start, end) windows (the classic gaps-and-islands rewrite: lag →
  break flag → running sum → group). One shuffle on the group key.
- interval_join_bucketed: points-in-interval join WITHOUT the cross
  product a naive theta-join plans: intervals explode into the fixed
  time buckets they overlap, points map to exactly one bucket, and the
  join runs as an equi-join on (key, bucket) with the exact range
  predicate as a post-filter. Expansion factor = interval length in
  buckets — bounded and known — versus |points|×|intervals| for the
  nested loop. The DuckDB oracle (plans/queries.py `incident_windows`)
  uses a plain range join, so the bucketing rewrite is verified against
  an independent exact implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HOUR = "INTERVAL 1 HOUR"


def incident_windows(events: DataFrame, *, ts_col: str = "ts",
                     by: str = "event_type",
                     threshold: int = 6) -> DataFrame:
    """(by, win_start, win_end): maximal runs of consecutive hours whose
    event count ≥ threshold. Deterministic; one shuffle on ``by``."""
    hourly = (events.groupBy(by, F.date_trunc("hour", F.col(ts_col))
                             .alias("hr"))
              .agg(F.count("*").alias("n")))
    hot = hourly.filter(F.col("n") >= threshold)
    w = Window.partitionBy(by).orderBy("hr")
    brk = F.when(F.lag("hr").over(w) == F.col("hr") - F.expr(_HOUR),
                 F.lit(0)).otherwise(F.lit(1))
    run = (hot.withColumn("_brk", brk)
           .withColumn("_gid", F.sum("_brk").over(
               w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    return (run.groupBy(by, "_gid")
            .agg(F.min("hr").alias("win_start"),
                 (F.max("hr") + F.expr(_HOUR)).alias("win_end"))
            .drop("_gid"))


def interval_join_bucketed(points: DataFrame, intervals: DataFrame, *,
                           ts_col: str = "ts", by: str = "event_type",
                           start_col: str = "win_start",
                           end_col: str = "win_end") -> DataFrame:
    """Inner join of points to the [start, end) intervals containing them
    (arbitrary, not necessarily hour-aligned bounds), via bucket expansion
    instead of a range cross join. Output: every point row plus the
    matching interval's columns."""
    # Buckets are generated from the TRUNCATED bounds: points map to
    # date_trunc('hour', ts), so an interval must cover every truncated
    # hour it overlaps — from trunc(start) through trunc(end - 1us)
    # (end is exclusive, so the last covered instant is end - 1 microsecond).
    # Truncating both stops also keeps the sequence legal for sub-hour
    # intervals: end > start ⟹ trunc(end - 1us) >= trunc(start).
    # Non-truncated stops silently missed the last partial hour and, for
    # non-aligned starts, produced bucket values no point could equal.
    b = (intervals.filter(F.col(end_col) > F.col(start_col))
         .withColumn(
             "_bucket",
             F.explode(F.sequence(
                 F.date_trunc("hour", F.col(start_col)),
                 F.date_trunc("hour", F.col(end_col)
                              - F.expr("INTERVAL 1 MICROSECOND")),
                 F.expr(_HOUR)))))
    p = points.withColumn("_bucket",
                          F.date_trunc("hour", F.col(ts_col)))
    return (p.join(b, [by, "_bucket"])
            .filter((F.col(ts_col) >= F.col(start_col))
                    & (F.col(ts_col) < F.col(end_col)))
            .drop("_bucket"))
