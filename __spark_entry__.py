"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship crawl slice on sf0.001: synthesize a Common-Crawl-
                style pages table, run the vectorized HTML→clean-text
                extraction (byte-identical to the reference cleaner per
                tests/test_extraction_parity.py), dedup by canonical URL,
                and roll up the per-host manifest.
queries()     — one entry per implemented SURVEY.md §2 operator.
oracle_sql()  — DuckDB twins (identical column names/values) for every
                SQL-expressible query; pandas-UDF pipelines are rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: pages → extract → canonicalize → per-host manifest."""
    from pyspark.sql import functions as F

    from python_web_scraper_cleaner_spark.functions.udfs import with_clean_text
    from python_web_scraper_cleaner_spark.plans.queries import _canonicalize
    from python_web_scraper_cleaner_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(spark, 1000)
    cleaned = with_clean_text(pages, output_format="txt")
    canon = _canonicalize(cleaned)
    return (canon.groupBy("host")
            .agg(F.count("*").alias("n_pages"),
                 F.sum(F.col("ok").cast("int")).alias("n_ok"),
                 F.sum("extracted_chars").alias("sum_chars"),
                 F.min("warc_ts").alias("first_ts"),
                 F.max("warc_ts").alias("last_ts"))
            .orderBy("host"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from python_web_scraper_cleaner_spark.plans.queries import registry
    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle per query. Entries whose expected result is computed by
    the single-node kernel (pandas-UDF pipelines with deterministic inputs)
    store a lazy generator in the registry — resolved to literal VALUES SQL
    here."""
    from python_web_scraper_cleaner_spark.plans.queries import registry
    out = {}
    for name, (_fn, sql) in registry().items():
        if sql is None:
            continue
        if callable(sql):
            try:
                sql = sql()
            except Exception as e:
                # a broken generator (e.g. its sf-dir parquet is absent)
                # must degrade THAT entry to rows-only, not take down the
                # whole oracle map — but the downgrade must be VISIBLE:
                # a bug in a kernel-derived oracle would otherwise disable
                # its correctness check with no signal anywhere
                import sys
                print(f"oracle_sql: generator for {name!r} failed, "
                      f"degrading to rows-only: {type(e).__name__}: {e}",
                      file=sys.stderr)
                continue
        out[name] = sql
    return out
