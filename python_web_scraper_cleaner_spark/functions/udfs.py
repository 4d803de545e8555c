"""Vectorized pandas UDFs wrapping the pure-Python kernel.

Per BASELINE.json ``input_hint``: pandas/Arrow UDFs only — never per-row
Python ``udf()`` and never RDD ``.map``. Each UDF here ships the *same*
kernel functions used by the single-node oracle, so Spark output is
byte-identical to the plain-Python loop by construction.

UDFs exist only where a built-in Spark expression cannot reproduce the
reference semantics byte-for-byte (SURVEY §7 risk 1: Python ``\\w`` vs Java
regex). Everything countable/joinable stays JVM-side — the expression twins
live in plans/queries.py (F5/F8/F10/F13/F14) and operators/textstats.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from . import kernel as K

# ---------------------------------------------------------------------------
# Extraction (ref: html_cleaner_core.py:61-99; trafilatura_scraper.py:56-116)
# ---------------------------------------------------------------------------

CLEAN_RESULT_SCHEMA = T.StructType([
    T.StructField("text", T.StringType()),
    T.StructField("ok", T.BooleanType(), nullable=False),
    T.StructField("extracted_chars", T.IntegerType(), nullable=False),
    T.StructField("error", T.StringType()),
])


def make_extract_clean_text(output_format: str = "txt",
                            include_tables: bool = True,
                            include_comments: bool = False):
    """Scalar pandas UDF: html binary → struct(text, ok, extracted_chars,
    error). The CleanResult envelope of html_cleaner_core.py:16-24 as
    result-columns (errors are rows, not exceptions — run_batch semantics
    :257-266)."""

    import numpy as np

    @pandas_udf(CLEAN_RESULT_SCHEMA)
    def extract_clean_text(html: pd.Series) -> pd.DataFrame:
        outs = [K.clean_html(raw if raw is not None else b"",
                             output_format=output_format,
                             include_tables=include_tables,
                             include_comments=include_comments)
                for raw in html]
        n = len(outs)
        # typed numpy columns: object-dtype bools/ints make the
        # pandas→Arrow struct conversion ~5× slower than the extraction
        # itself (measured: 8.2s vs 1.7s for 100k rows on local[32])
        return pd.DataFrame({
            "text": pd.array([o.text for o in outs], dtype=object),
            "ok": np.fromiter((o.ok for o in outs), dtype=bool, count=n),
            "extracted_chars": np.fromiter(
                (o.extracted_chars for o in outs), dtype=np.int32, count=n),
            "error": pd.array([o.error for o in outs], dtype=object),
        })

    return extract_clean_text


METADATA_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("author", T.StringType()),
    T.StructField("date", T.StringType()),
    T.StructField("sitename", T.StringType()),
    T.StructField("hostname", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("categories", T.ArrayType(T.StringType())),
    T.StructField("tags", T.ArrayType(T.StringType())),
    T.StructField("fingerprint", T.StringType()),
    T.StructField("language", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("raw_text", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("source_hostname", T.StringType()),
])


@pandas_udf(METADATA_SCHEMA)
def extract_metadata_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    """16-field article record (trafilatura_scraper.py:99-116) minus
    scraped_at (injected by caller for determinism)."""
    recs = [K.extract_metadata(h if h is not None else b"", u)
            for h, u in zip(html, url)]
    return pd.DataFrame.from_records(recs, columns=[f.name for f in METADATA_SCHEMA])


# ---------------------------------------------------------------------------
# Normalization / formatting
# ---------------------------------------------------------------------------


@pandas_udf(T.StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: K.normalize_text(x) if x is not None else None)


@pandas_udf(T.StringType())
def normalize_markdown_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: K.normalize_markdown(x) if x is not None else None)


@pandas_udf(T.StringType())
def slugify_udf(s: pd.Series) -> pd.Series:
    """Python-\\w-exact slugify (trafilatura_scraper.py:126-146). Used where
    unicode titles occur; the expression twin lives in exprs.slugify_expr."""
    return s.map(K.slugify)


@pandas_udf(T.StringType())
def reflow_markdown_udf(s: pd.Series) -> pd.Series:
    return s.map(K.reflow_text_to_markdown_paragraphs)


@pandas_udf(T.StringType())
def assemble_markdown_udf(meta_json: pd.Series, text: pd.Series) -> pd.Series:
    """F7: full article-markdown assembly (trafilatura_scraper.py:200-236)
    from the 15-field metadata struct (as JSON) + extracted text."""
    import json

    return pd.Series([
        K.format_article_markdown(json.loads(m) if m else {}, t)
        for m, t in zip(meta_json, text)])


@pandas_udf(T.StringType())
def canonicalize_url_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: K.canonicalize_url(x) if x is not None else None)


@pandas_udf(T.StringType())
def lang_id_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: K.lang_id(x) if x is not None else "und")


@pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    """URL discovery: unique absolute out-links per page (kernel
    .extract_links) — the frontier-growing half of the crawl loop."""
    return pd.Series([
        K.extract_links(h if h is not None else b"", u)
        for h, u in zip(html, url)])


@pandas_udf(T.LongType())
def fingerprint64_udf(s: pd.Series) -> pd.Series:
    # kernel.fingerprint64 is already reduced mod (2^61 - 1), so every
    # value fits a signed long as-is — no further reduction
    return s.map(lambda x: K.fingerprint64(x) if x is not None else None)


@pandas_udf(T.LongType())
def simhash32_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda x: K.simhash32(x) if x is not None else None)


def make_minhash_udf(k: int = 3, n_hashes: int = 16):
    @pandas_udf(T.ArrayType(T.StringType()))
    def minhash_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda x: K.minhash_signature(x, k=k, n_hashes=n_hashes)
                     if x is not None else None)
    return minhash_udf


# ---------------------------------------------------------------------------
# Column helpers used with the UDFs
# ---------------------------------------------------------------------------


def with_clean_text(df, html_col: str = "html", output_format: str = "txt",
                    drop_html: bool = True,
                    include_tables: bool = True,
                    include_comments: bool = False):
    """pages → cleaned pages: apply extraction, unpack the result struct,
    and (by default) drop the heavy binary column immediately so it never
    crosses a shuffle (SURVEY §4.2 'never shuffle html past extraction')."""
    udf = make_extract_clean_text(output_format=output_format,
                                  include_tables=include_tables,
                                  include_comments=include_comments)
    out = df.withColumn("_clean", udf(F.col(html_col)))
    out = (out
           .withColumn("text", F.col("_clean.text"))
           .withColumn("ok", F.col("_clean.ok"))
           .withColumn("extracted_chars", F.col("_clean.extracted_chars"))
           .withColumn("error", F.col("_clean.error"))
           .drop("_clean"))
    if drop_html:
        out = out.drop(html_col)
    return out


ANCHOR_PAIR_TYPE = T.ArrayType(T.StructType([
    T.StructField("target", T.StringType()),
    T.StructField("anchor", T.StringType())]))


@pandas_udf(ANCHOR_PAIR_TYPE)
def extract_anchors_udf(html: pd.Series, url: pd.Series) -> pd.Series:
    """(target url, anchor text) pairs per page (kernel.extract_anchors) —
    duplicates kept; the anchor-corpus aggregation downstream owns the
    collapsing. Arrow-batched like every UDF in this module."""
    return pd.Series([
        K.extract_anchors(h if h is not None else b"", u)
        for h, u in zip(html, url)])
