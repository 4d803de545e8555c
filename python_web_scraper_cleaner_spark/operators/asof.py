"""As-of (most-recent-match) join — the classic temporal operator Spark
lacks natively, composed scale-safe from union + window.

Crawl framing: configuration that versions over time (robots rules,
politeness budgets, per-host rate snapshots) must be joined to events at
"the latest version at or before the event's timestamp". A naive range
join explodes per key; the union-window trick below does ONE shuffle on
the group key and a single ordered window pass — linear in rows, no
per-key blowup, AQE-friendly. DuckDB's native ASOF JOIN provides the
independent oracle (plans/queries.py `asof_rate_join`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *,
              on: str, by: list[str] | str,
              value_cols: list[str]) -> DataFrame:
    """For each left row: the right row with the greatest ``right.on`` ≤
    ``left.on`` within the same ``by`` group (inner semantics: left rows
    with no preceding right row carry nulls — filter afterwards if inner
    is wanted).

    Mechanics: right rows are tagged 0, left rows 1; the union sorts per
    group by (on, tag) so a right row at the exact same timestamp sorts
    BEFORE the left row (≤ semantics, matching DuckDB ASOF JOIN); a
    last(ignorenulls) window carries each right value forward to the left
    rows that follow it. One hash shuffle on ``by``, one sort — no range
    explode, no broadcast requirement on either side.

    The matched right row travels as ONE struct, so all value columns come
    from the SAME snapshot (no per-column tearing) and a snapshot whose
    value field is NULL still wins over older snapshots (the struct itself
    is non-null). Right rows with a NULL ``on`` never match (SQL range
    semantics). Duplicate right timestamps within a group resolve
    deterministically to the greatest value tuple.
    """
    from pyspark.sql import types as T

    by = [by] if isinstance(by, str) else list(by)
    left_cols = left.columns
    reserved = {"_on", "_src", "_vals"}
    clash = ((set(value_cols) & set(left_cols))
             | (reserved & (set(left_cols) | set(right.columns))))
    if clash:
        raise ValueError(f"asof_join column collision: {sorted(clash)} — "
                         "rename before joining")
    vals_type = T.StructType([
        T.StructField(c, right.schema[c].dataType) for c in value_cols])
    r = right.filter(F.col(on).isNotNull()).select(
        *by, F.col(on).alias("_on"), F.lit(0).alias("_src"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_vals"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in by and c != on])
    l = left.select(
        *by, F.col(on).alias("_on"), F.lit(1).alias("_src"),
        F.lit(None).cast(vals_type).alias("_vals"),
        *[F.col(c) for c in left_cols if c not in by and c != on])
    u = r.unionByName(l)
    w = (Window.partitionBy(*by)
         .orderBy(F.asc("_on"), F.asc("_src"), F.asc("_vals"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = u.withColumn("_vals", F.last("_vals", ignorenulls=True).over(w))
    out_cols = ([F.col(c) for c in by] + [F.col("_on").alias(on)]
                + [F.col(c) for c in left_cols if c not in by and c != on]
                + [F.col("_vals")[c].alias(c) for c in value_cols])
    return u.filter(F.col("_src") == 1).select(*out_cols)
