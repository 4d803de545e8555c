"""Meta-refresh soft-redirect extraction + chain resolution
(operators/frontier.extract_meta_refresh → graph.resolve_redirect_chains)
and the linear bag-of-words quality classifier
(operators/textstats.linear_quality_score).

Pins: refresh-tag regexes against both attribute orders, case variants,
malformed delays, and tagless pages; resolved terminals/hops/cycles on a
hand graph; classifier margins against hand-summed integer weights,
including punctuation-stripped tokens and the empty document.
"""

from pyspark.sql import functions as F

from python_web_scraper_cleaner_spark.operators import frontier as FR
from python_web_scraper_cleaner_spark.operators.graph import (
    resolve_redirect_chains)
from python_web_scraper_cleaner_spark.operators.textstats import (
    linear_quality_score)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_extract_meta_refresh_both_orders_and_malformed(spark):
    rows = [
        ("https://a/1", '<head><meta http-equiv="refresh" '
                        'content="5; url=https://a/t1"></head>'),
        ("https://a/2", '<head><meta content="0; url=https://a/t2" '
                        'http-equiv="refresh"></head>'),
        ("https://a/3", '<head><META HTTP-EQUIV="refresh" '
                        'CONTENT="12; URL=https://a/t3"></head>'),
        ("https://a/4", "<head><title>no refresh</title></head>"),
        ("https://a/5", '<head><meta http-equiv="refresh" '
                        'content="soon; url=https://a/t5"></head>'),
    ]
    out = {r.src: r for r in
           FR.extract_meta_refresh(_pages(spark, rows)).collect()}
    assert out["https://a/1"].dst == "https://a/t1"
    assert out["https://a/1"].refresh_delay == 5
    assert out["https://a/2"].dst == "https://a/t2"
    assert out["https://a/2"].refresh_delay == 0
    # case-insensitive tag, uppercase URL= key
    assert out["https://a/3"].dst == "https://a/t3"
    assert out["https://a/3"].refresh_delay == 12
    # tagless and non-numeric-delay pages are dropped, not nulled
    assert "https://a/4" not in out and "https://a/5" not in out
    assert "html" not in out["https://a/1"].asDict()  # blob dropped


def test_meta_refresh_chain_resolution(spark):
    # a -> b -> c (terminal content page); d <-> e cycle
    rows = [
        ("https://a", '<meta http-equiv="refresh" content="0; url=https://b">'),
        ("https://b", '<meta http-equiv="refresh" content="3; url=https://c">'),
        ("https://c", "<p>content</p>"),
        ("https://d", '<meta http-equiv="refresh" content="1; url=https://e">'),
        ("https://e", '<meta http-equiv="refresh" content="1; url=https://d">'),
    ]
    edges = FR.extract_meta_refresh(_pages(spark, rows))
    out = {r.src: r for r in
           resolve_redirect_chains(edges.select("src", "dst"),
                                   max_hops=16).collect()}
    assert out["https://a"].final_url == "https://c"
    assert out["https://a"].hops == 2
    assert out["https://b"].final_url == "https://c"
    assert out["https://b"].hops == 1
    assert "https://c" not in out          # terminal: no outgoing edge
    assert out["https://d"].unresolved and out["https://e"].unresolved
    assert out["https://d"].final_url is None


def test_linear_quality_score_hand_margins(spark):
    w = {"data": 100, "slow": -70, "spark": 30}
    docs = spark.createDataFrame(
        [(1, "data spark data"),            # 100+30+100 = 230
         (2, "slow Slow DATA,"),            # -70-70+100 = -40 (norm+strip)
         (3, "unweighted words only"),      # 0 hits
         (4, "")],                          # empty doc
        "id long, text string")
    out = {r.id: r for r in
           linear_quality_score(docs, w, bias_bp=-50,
                                threshold_bp=0).collect()}
    assert out[1].margin_bp == 180 and out[1].n_weighted_tokens == 3
    assert out[1].keep
    # lowercasing + punctuation strip: "Slow" and "DATA," both count
    assert out[2].margin_bp == -90 and out[2].n_weighted_tokens == 3
    assert not out[2].keep
    assert out[3].margin_bp == -50 and out[3].n_weighted_tokens == 0
    assert out[4].margin_bp == -50 and out[4].n_weighted_tokens == 0


def test_linear_quality_score_zero_exchange_plan(spark):
    # the weight map folds into the projection: no Exchange anywhere
    docs = spark.createDataFrame([(i, "data slow") for i in range(10)],
                                 "id long, text string")
    plan = linear_quality_score(
        docs, {"data": 10}, bias_bp=0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_extract_meta_refresh_page_with_both_attribute_orders(spark):
    """Review regression: a page carrying refresh tags in BOTH attribute
    orders (templated heads duplicate meta tags) must yield ONE sane
    edge — pattern A's pair wholesale — not a concatenation that welds
    '5'+'0' into delay 50 and two urls into a garbage target."""
    rows = [("https://a/both",
             '<head><meta http-equiv="refresh" content="5; url=https://a/x">'
             '<meta content="0; url=https://a/y" http-equiv="refresh">'
             '</head>')]
    out = {r.src: r for r in
           FR.extract_meta_refresh(_pages(spark, rows)).collect()}
    r = out["https://a/both"]
    assert r.dst == "https://a/x" and r.refresh_delay == 5
