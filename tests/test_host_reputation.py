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


def test_strip_boilerplate_threshold_and_order(spark):
    """Lines in >= min_doc_frac of a host's docs strip; rarer lines and
    empty lines survive; surviving lines keep original order; a fully-
    boilerplate doc yields clean_text '' (not NULL)."""
    from python_web_scraper_cleaner_spark.operators.textstats import (
        strip_boilerplate_lines)
    rows = [
        (1, "h", "NAV\nalpha\n\nbeta\nFOOT"),
        (2, "h", "NAV\ngamma\nrare\nFOOT"),
        (3, "h", "NAV\ndelta\nFOOT"),
        (4, "h", "NAV\nFOOT"),              # fully boilerplate
        (5, "g", "NAV\nsolo"),              # other host: NAV in 1 doc only
    ]
    docs = spark.createDataFrame(rows, "id long, host string, text string")
    out = {r["id"]: r for r in strip_boilerplate_lines(
        docs, min_doc_frac=0.5, min_docs=2).collect()}
    assert out[1]["clean_text"] == "alpha\n\nbeta"
    assert (out[1]["n_lines"], out[1]["n_boiler_lines"]) == (5, 2)
    assert out[2]["clean_text"] == "gamma\nrare"
    assert out[4]["clean_text"] == ""
    # min_docs guard: host g's NAV appears in 100% of docs but only 1 doc
    assert out[5]["clean_text"] == "NAV\nsolo"


def test_url_trap_signals_flags_variant_explosion(spark):
    from python_web_scraper_cleaner_spark.operators.frontier import (
        url_trap_signals)
    rows = ([("t", "/cal", f"d={i}") for i in range(60)]
            + [("t", "/page", ""), ("t", "/page", "ref=x")]
            + [("ok", "/a", ""), ("ok", "/b", "x=1")])
    urls = spark.createDataFrame(rows, "host string, path string, "
                                       "query string")
    out = {r["host"]: r for r in url_trap_signals(
        urls, min_variants=50).collect()}
    assert (out["t"]["n_paths"], out["t"]["n_trap_paths"],
            out["t"]["max_variants"], out["t"]["worst_path"]) == \
        (2, 1, 60, "/cal")
    assert (out["ok"]["n_trap_paths"], out["ok"]["max_variants"]) == (0, 1)


def _slot_urls(spark, loads):
    """loads: {host: n_pending} → one row per pending URL."""
    rows = [(h,) for h, n in loads.items() for _ in range(n)]
    return spark.createDataFrame(rows, "host string")


def test_fetch_slots_hot_serpentine_balances_heavies(spark):
    """8 hot hosts over K=4 slots: ranks 0..7 land 0,1,2,3,3,2,1,0 —
    heaviest + lightest-of-the-hot share a slot (LPT shape)."""
    from python_web_scraper_cleaner_spark.operators.frontier import (
        assign_fetch_slots)
    loads = {f"h{i}": 100 - i for i in range(8)}
    out = {r["host"]: r for r in assign_fetch_slots(
        _slot_urls(spark, loads), n_slots=4, hot_threshold=10).collect()}
    assert all(out[h]["hot"] for h in loads)
    assert [out[f"h{i}"]["slot"] for i in range(8)] == [
        0, 1, 2, 3, 3, 2, 1, 0]
    per_slot = {}
    for h, n in loads.items():
        per_slot[out[h]["slot"]] = per_slot.get(out[h]["slot"], 0) + n
    assert max(per_slot.values()) - min(per_slot.values()) <= 7


def test_fetch_slots_cold_hashed_and_threshold_boundary(spark):
    """pending == threshold stays cold; cold slots are stable md5 picks
    in [0, K); every host appears exactly once with its true count."""
    from python_web_scraper_cleaner_spark.operators.frontier import (
        assign_fetch_slots)
    loads = {"big": 50, "edge": 10, **{f"c{i}": 1 + i % 3
                                       for i in range(20)}}
    df = assign_fetch_slots(_slot_urls(spark, loads), n_slots=4,
                            hot_threshold=10)
    rows = df.collect()
    assert len(rows) == len(loads)
    out = {r["host"]: r for r in rows}
    assert out["big"]["hot"] and not out["edge"]["hot"]
    assert all(0 <= r["slot"] < 4 for r in rows)
    assert all(out[h]["pending"] == n for h, n in loads.items())
    again = {r["host"]: r["slot"] for r in assign_fetch_slots(
        _slot_urls(spark, loads), n_slots=4, hot_threshold=10).collect()}
    assert again == {r["host"]: r["slot"] for r in rows}


def test_estimate_crawl_delays_exact_nearest_rank(spark):
    """Hand log: p95 is the exact nearest-rank element, duplicates
    collapse into the histogram, clamps apply on both ends."""
    from python_web_scraper_cleaner_spark.operators.frontier import (
        estimate_crawl_delays)
    rows = ([("slow", 1000)] * 19 + [("slow", 40000)]      # p95 = 40000
            + [("fast", 10)] * 20                           # p95 = 10
            + [("mid", ms) for ms in range(100, 2100, 100)])  # 20 vals
    log = spark.createDataFrame(rows, "host string, latency_ms long")
    out = {r["host"]: r for r in estimate_crawl_delays(log).collect()}
    # slow: ceil(0.95*20)=19 -> 19th value is 1000 (the 20th is 40000)
    assert (out["slow"]["n_fetches"], out["slow"]["q_ms"]) == (20, 1000)
    assert out["slow"]["delay_ms"] == 1500                  # 1.5x p95
    # fast: all 10 ms -> one histogram row; clamped up to the floor
    assert (out["fast"]["q_ms"], out["fast"]["delay_ms"]) == (10, 100)
    # mid: 20 distinct values, rank 19 -> 1900 ms -> 2850
    assert (out["mid"]["q_ms"], out["mid"]["delay_ms"]) == (1900, 2850)
    # ceiling clamp
    cap = {r["host"]: r["delay_ms"] for r in estimate_crawl_delays(
        spark.createDataFrame([("h", 50000)] * 3,
                              "host string, latency_ms long")).collect()}
    assert cap["h"] == 30000


def test_estimate_crawl_delays_ignores_null_latency(spark):
    """Failed fetches (NULL latency) must not shift the rank target."""
    from python_web_scraper_cleaner_spark.operators.frontier import (
        estimate_crawl_delays)
    log = spark.createDataFrame(
        [("h", 100)] * 19 + [("h", 9000)] + [("h", None)] * 80,
        "host string, latency_ms long")
    out = estimate_crawl_delays(log).collect()[0]
    # without the filter, n=100 -> rank 95 lands on 9000; with it,
    # n=20 -> rank 19 -> 100 ms
    assert (out["n_fetches"], out["q_ms"]) == (20, 100)
