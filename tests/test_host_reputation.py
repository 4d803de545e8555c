"""Host reputation rollup (operators/textstats.py:host_reputation).

Pins both verdict gates independently: a host can fail on quality
(pass_bp) with zero duplication, fail on duplication (dup_bp) with
perfect quality, and cross-host exact copies flag BOTH hosts' docs.
"""

from python_web_scraper_cleaner_spark.operators import textstats as TS


def _good(tag):
    # 61 words, mean word length ~4: passes every gopher gate
    return " ".join(["word"] * 60) + f" {tag}"


BAD = "too short"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _by_host(df):
    return {r["host"]: r.asDict() for r in df.collect()}


def test_quality_gate_fails_low_pass_host(spark):
    docs = _df(spark, [
        (0, "a", _good("a0")), (1, "a", _good("a1")), (2, "a", _good("a2")),
        (3, "b", BAD), (4, "b", BAD + " again"), (5, "b", _good("b0")),
    ])
    out = _by_host(TS.host_reputation(docs))
    assert out["a"]["pass_bp"] == 10000 and out["a"]["reputation_ok"]
    assert out["b"]["pass_bp"] == 3333 and not out["b"]["reputation_ok"]
    assert out["a"]["dup_bp"] == 0 and out["b"]["dup_bp"] == 0


def test_dup_gate_fails_mirror_host_despite_quality(spark):
    # host m republishes the same (gopher-passing) page: dup_bp 10000
    docs = _df(spark, [
        (0, "m", _good("same")), (1, "m", _good("same")),
        (2, "u", _good("u0")), (3, "u", _good("u1")),
    ])
    out = _by_host(TS.host_reputation(docs))
    assert out["m"]["pass_bp"] == 10000
    assert out["m"]["dup_bp"] == 10000 and not out["m"]["reputation_ok"]
    assert out["u"]["reputation_ok"]


def test_cross_host_copies_flag_both_hosts(spark):
    docs = _df(spark, [
        (0, "x", _good("shared")), (1, "y", _good("shared")),
        (2, "x", _good("x1")), (3, "y", _good("y1")),
        (4, "y", _good("y2")), (5, "y", _good("y3")),
    ])
    out = _by_host(TS.host_reputation(docs))
    assert out["x"]["n_dup"] == 1 and out["y"]["n_dup"] == 1
    # x: 1/2 docs duplicated -> 5000 bp > 3000; y: 1/4 -> 2500 bp ok
    assert out["x"]["dup_bp"] == 5000 and not out["x"]["reputation_ok"]
    assert out["y"]["dup_bp"] == 2500 and out["y"]["reputation_ok"]


def test_thresholds_are_parameters(spark):
    docs = _df(spark, [(0, "h", _good("h0")), (1, "h", BAD)])
    strict = _by_host(TS.host_reputation(docs, min_pass_bp=6000))
    lax = _by_host(TS.host_reputation(docs, min_pass_bp=5000))
    assert not strict["h"]["reputation_ok"]
    assert lax["h"]["reputation_ok"]
