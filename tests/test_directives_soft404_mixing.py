"""Page directives (meta robots / rel=canonical), soft-404 detection,
conditional-GET revalidation pricing, and temperature-scaled mixture
weights (operators/frontier.py, textstats.py, sampling.py).

Pins: directive regexes against both attribute orders and the no-tag
default; soft-404 verdict against hard-404 and long-prose decoys;
revalidation byte math against hand-computed expectations; mixture
allocation against integer sqrt weighting including the empty stratum.
"""

import datetime as dt
import math

from pyspark.sql import functions as F

from python_web_scraper_cleaner_spark.operators import frontier as FR
from python_web_scraper_cleaner_spark.operators.sampling import (
    mixture_weights)
from python_web_scraper_cleaner_spark.operators.textstats import (
    soft404_signals)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_extract_directives_parses_both_attribute_orders(spark):
    rows = [
        ("https://a/1", '<head><meta name="robots" content="noindex"></head>'),
        ("https://a/2", '<head><meta content="nofollow" name="robots"></head>'),
        ("https://a/3", '<head><META NAME="robots" CONTENT="NOINDEX, '
                        'nofollow"></head>'),
        ("https://a/4", "<head><title>plain</title></head>"),
    ]
    out = {r.url: r for r in
           FR.extract_directives(_pages(spark, rows)).collect()}
    assert out["https://a/1"].noindex and not out["https://a/1"].nofollow
    assert out["https://a/2"].nofollow and not out["https://a/2"].noindex
    assert out["https://a/3"].noindex and out["https://a/3"].nofollow
    assert not out["https://a/4"].noindex and not out["https://a/4"].nofollow


def test_extract_directives_canonical_defaults_to_self(spark):
    rows = [
        ("https://a/1", '<link rel="canonical" href="https://a/canon">'),
        ("https://a/2", '<link rel="canonical" href="https://a/2">'),
        ("https://a/3", '<link rel="canonical" href="">'),
        ("https://a/4", "<p>no tag</p>"),
    ]
    out = {r.url: r for r in
           FR.extract_directives(_pages(spark, rows)).collect()}
    assert out["https://a/1"].canonical_url == "https://a/canon"
    assert not out["https://a/1"].canonical_self
    assert out["https://a/2"].canonical_self
    assert out["https://a/3"].canonical_url == "https://a/3"  # empty href
    assert out["https://a/4"].canonical_url == "https://a/4"
    assert "html" not in out["https://a/1"].asDict()  # blob dropped


def test_soft404_verdict_and_decoys(spark):
    rows = [
        (1, "Doc 1", "this article is a perfectly fine long read " * 20, 200),
        (2, "Error 404 - Not Found", "404. page not found.", 200),
        (3, "Error 404 - Not Found", "404. page not found.", 404),
        (4, "Doc 4", "long prose " * 50 + " an error occurred in 1923.", 200),
        (5, "Doc 5", "short note: this page does not exist anymore", 200),
    ]
    df = spark.createDataFrame(
        rows, "id long, title string, text string, http_status int")
    out = {r.id: r for r in soft404_signals(df).collect()}
    assert not out[1].is_soft404 and out[1].phrase_hits == 0
    assert out[2].is_soft404 and out[2].phrase_hits >= 2
    assert not out[3].is_soft404          # hard 404: status gate
    assert not out[4].is_soft404          # long + clean title
    assert out[5].is_soft404              # short + phrase, clean title


def _history(spark, rows):
    base = dt.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [(p, base + dt.timedelta(hours=i), i, c)
         for i, (p, c) in enumerate(rows)],
        "page_id long, ts timestamp, fetch_id long, changed boolean")


def test_revalidation_plan_byte_math(spark):
    # page 1: 4 fetches, 1 change, validators; page 2: 2 fetches, 2
    # changes, no validators; page 3: never changes, etag only.
    hist = _history(spark, [(1, False), (1, True), (1, False), (1, False),
                            (2, True), (2, True),
                            (3, False), (3, False)])
    pages = spark.createDataFrame(
        [(1, True, True, 10000), (2, False, False, 10000),
         (3, True, False, 10000)],
        "page_id long, has_etag boolean, has_last_modified boolean,"
        " page_bytes long")
    out = {r.page_id: r for r in
           FR.revalidation_plan(hist, pages, header_bytes=600).collect()}
    r1 = out[1]
    assert r1.mode == "conditional" and r1.change_bp == 2500
    assert r1.expected_bytes == (2500 * 10000 + 7500 * 600) // 10000
    assert r1.saved_bp == (10000 * (10000 - r1.expected_bytes)) // 10000
    r2 = out[2]
    assert r2.mode == "full" and r2.expected_bytes == 10000
    assert r2.saved_bp == 0
    r3 = out[3]  # still page: conditional pays ~the header bill
    assert r3.change_bp == 0 and r3.expected_bytes == 600
    assert r3.saved_bp == 9400


def test_mixture_weights_sqrt_allocation(spark):
    rows = ([("en", 100 + i) for i in range(100)]      # big stratum
            + [("de", 100 + i) for i in range(25)]     # smaller
            + [("xx", 0), ("xx", 0)])                  # empty texts
    df = spark.createDataFrame(rows, "lang string, n_toks long")
    out = {r.lang: r for r in
           mixture_weights(df, strata_cols=["lang"], tokens_col="n_toks",
                           budget_tokens=100_000).collect()}
    en, de, xx = out["en"], out["de"], out["xx"]
    assert en.weight == math.isqrt(en.n_tokens)
    assert de.weight == math.isqrt(de.n_tokens)
    assert xx.weight == 0 and xx.alloc_tokens == 0 and xx.epochs_bp == 0
    tw = en.weight + de.weight
    assert en.alloc_tokens == 100_000 * en.weight // tw
    # floor division never overshoots the budget
    assert sum(r.alloc_tokens for r in out.values()) <= 100_000
    assert sum(r.share_bp for r in out.values()) <= 10_000
    # sqrt temperature flattens the mix: de gets MORE than its raw share
    assert de.share_bp * (en.n_tokens + de.n_tokens) \
        > 10_000 * de.n_tokens
    # budget is ~7.5x the corpus: every non-empty stratum repeats
    assert en.epochs_bp > 10_000 and de.epochs_bp > 10_000
