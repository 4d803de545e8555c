"""Session-8 operators: DUST param-rule mining, per-IP politeness
grouping, WARC revisit-record archival dedup, focused-crawl priority,
and the toxicity lexicon gate.

Each test pins the semantic contract the registry oracle cannot state
as sharply: DUST must never flag a content-coupled parameter, the IP
budget split must conserve the per-IP budget exactly, revisit stubs
must point at the (ts, url)-minimal archived response, focused priority
must let anchors dominate source scores, and the toxicity gate must
separate flag (any hit) from drop (density over the line).
"""

from pyspark.sql import functions as F

from python_web_scraper_cleaner_spark.operators import frontier as FR
from python_web_scraper_cleaner_spark.operators import graph as G
from python_web_scraper_cleaner_spark.operators import textstats as TS
from python_web_scraper_cleaner_spark.sources import warc as W


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


# ------------------------------------------------------------------- dust

def test_dust_flags_varying_param_not_stable_one(spark):
    # two aliases of identical content: id stable, sess varies -> only
    # sess is a rule; support accrues per alias group (2 groups here)
    rows = []
    for doc in ("a", "b"):
        rows += [(f"http://h/{doc}?id={doc}", f"text {doc}"),
                 (f"http://h/{doc}?id={doc}&sess=1", f"text {doc}"),
                 (f"http://h/{doc}?id={doc}&sess=2", f"text {doc}")]
    out = FR.dust_param_rules(_pages(spark, rows), min_support=2).collect()
    assert [(r.host, r.param, r.support) for r in out] == [("h", "sess", 2)]


def test_dust_never_flags_content_coupled_param(spark):
    # ?page selects DIFFERENT content -> different digest -> singleton
    # groups -> no rule, even across many docs
    rows = []
    for i in range(5):
        rows += [(f"http://h/{i}?page=1", f"p1 of {i}"),
                 (f"http://h/{i}?page=2", f"p2 of {i}")]
    assert FR.dust_param_rules(_pages(spark, rows), min_support=1).count() == 0


def test_dust_hot_group_guard(spark):
    # one digest shared by more aliases than the cap -> group excluded
    rows = [(f"http://h/x?v={i}", "same text") for i in range(9)]
    out = FR.dust_param_rules(_pages(spark, rows), min_support=1,
                              max_aliases_per_group=8)
    assert out.count() == 0


def test_dust_param_absent_in_some_aliases_varies(spark):
    # ref present in one of two identical-content aliases -> varies
    rows = [("http://h/a?id=1", "t"), ("http://h/a?id=1&ref=x", "t"),
            ("http://h/b?id=2", "u"), ("http://h/b?id=2&ref=y", "u")]
    out = FR.dust_param_rules(_pages(spark, rows), min_support=2).collect()
    assert [(r.host, r.param, r.support) for r in out] == [("h", "ref", 2)]


# ------------------------------------------------------------- ip budgets

def test_ip_budget_split_conserves_budget(spark):
    frontier = spark.createDataFrame(
        [("h1",)] * 5 + [("h2",)] * 3 + [("h3",)] * 1, "host string")
    hostmap = spark.createDataFrame(
        [("h1", "ip0"), ("h2", "ip0"), ("h3", "ip0")], "host string, ip string")
    rows = FR.ip_politeness_groups(frontier, hostmap,
                                   per_ip_budget=16).collect()
    budgets = {r.host: r.host_budget for r in rows}
    # 16 over 3 hosts: 6/5/5 with the remainder on the first host
    assert budgets == {"h1": 6, "h2": 5, "h3": 5}
    assert sum(budgets.values()) == 16
    assert all(r.n_hosts_on_ip == 3 for r in rows)


def test_ip_unmapped_host_keeps_solo_budget(spark):
    frontier = spark.createDataFrame([("lone",)] * 30, "host string")
    hostmap = spark.createDataFrame([], "host string, ip string")
    r = FR.ip_politeness_groups(frontier, hostmap, per_ip_budget=16).first()
    assert r.ip == "self:lone" and r.host_budget == 16
    assert r.throttled  # 30 urls > 16 budget


# ---------------------------------------------------------------- revisit

def test_revisit_plan_elects_first_and_points_back(spark):
    rec = spark.createDataFrame(
        [("u1", "t1", "same"), ("u2", "t2", "same"), ("u3", "t3", "other")],
        "url string, warc_ts string, html string")
    rows = {r.url: r for r in W.revisit_dedup_plan(rec).collect()}
    assert rows["u1"].record_type == "response"
    assert rows["u1"].refers_to_url is None and rows["u1"].saved_bytes == 0
    assert rows["u2"].record_type == "revisit"
    assert (rows["u2"].refers_to_url, rows["u2"].refers_to_ts) == ("u1", "t1")
    assert rows["u2"].saved_bytes == len("same")
    assert rows["u3"].record_type == "response"


def test_revisit_plan_tie_breaks_on_url(spark):
    rec = spark.createDataFrame(
        [("ub", "t", "x"), ("ua", "t", "x")],
        "url string, warc_ts string, html string")
    rows = {r.url: r for r in W.revisit_dedup_plan(rec).collect()}
    assert rows["ua"].record_type == "response"
    assert rows["ub"].refers_to_url == "ua"


def test_revisit_record_roundtrip():
    blob = (W.build_warcinfo(1)
            + W.build_warc_record("http://a", "t1", b"<p>x</p>")
            + W.build_revisit_record("http://b", "t2", "http://a", "t1",
                                     "d" * 32))
    revisits = W.parse_warc_segment(blob, record_type="revisit")
    assert len(revisits) == 1
    idx, url, ts, status, payload = revisits[0]
    assert url == "http://b" and ts == "t2" and payload == b""
    # the response record is still parsed independently
    assert len(W.parse_warc_segment(blob)) == 1


# ---------------------------------------------------------------- focused

def test_focused_priority_anchor_dominates_source_score(spark):
    anchors = spark.createDataFrame(
        [(0, 10, "spark learning guide"), (1, 11, "random page")],
        "src long, target long, anchor string")
    scores = spark.createDataFrame(
        [(0, 0), (1, 9999)], "src long, score_bp long")
    rows = G.focused_priority(anchors, scores,
                              ("spark", "learning")).collect()
    # target 10 has topical anchors from a zero-scored source; target 11
    # has a max-scored source but no topical anchor — anchors must win
    by = {r.target: r for r in rows}
    assert by[10].anchor_hits == 2 and by[10].priority_fp == 20000
    assert by[11].anchor_hits == 0 and by[11].priority_fp == 9999
    assert by[10].priority_fp > by[11].priority_fp


def test_focused_priority_word_boundary_and_missing_source(spark):
    # "sparkle" must not match "spark"; unknown src score -> 0
    anchors = spark.createDataFrame(
        [(5, 20, "sparkle dust")], "src long, target long, anchor string")
    scores = spark.createDataFrame([], "src long, score_bp long")
    r = G.focused_priority(anchors, scores, ("spark",)).first()
    assert r.anchor_hits == 0 and r.mean_src_bp == 0 and r.priority_fp == 0


# --------------------------------------------------------------- toxicity

def test_toxicity_flag_vs_drop(spark):
    docs = spark.createDataFrame(
        [(1, "a perfectly clean sentence about engines and tables ok"),
         (2, "a long mostly clean sentence that mentions nsfw once "
             + "pad " * 200),
         (3, "nsfw gore explicit")],
        "id long, text string")
    rows = {r.id: r for r in TS.toxicity_score(docs).collect()}
    assert not rows[1].flagged and not rows[1].dropped
    assert rows[2].flagged and not rows[2].dropped  # 1 hit / ~209 tokens
    assert rows[3].flagged and rows[3].dropped      # 10000 bp
    assert rows[3].hits_bp == 10000


def test_toxicity_word_boundary(spark):
    docs = spark.createDataFrame(
        [(1, "the gorefest and nsfwish words must not match unbounded")],
        "id long, text string")
    r = TS.toxicity_score(docs).first()
    # 'gorefest'/'nsfwish' contain lexicon entries but not word-bounded
    assert r.n_hits == 0 and not r.flagged


# ------------------------------------------------------- cluster sampling

def test_cluster_balanced_cap_and_tail_survival(spark):
    from python_web_scraper_cleaner_spark.operators.sampling import (
        cluster_balanced_sample)

    rows = [(i, 0) for i in range(40)] + [(100, 1)]  # mega + singleton
    asg = spark.createDataFrame(rows, "id long, cid int")
    out = cluster_balanced_sample(asg, cap_per_cluster=5).collect()
    mega = [r for r in out if r.cid == 0]
    assert sum(r.kept for r in mega) == 5
    assert all(r.n_in_cluster == 40 for r in mega)
    single = [r for r in out if r.cid == 1]
    assert len(single) == 1 and single[0].kept  # tail survives whole
    # deterministic: two runs agree exactly
    again = cluster_balanced_sample(asg, cap_per_cluster=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_semantic_decontaminate_flags_only_near_copies(spark):
    from python_web_scraper_cleaner_spark.operators import similarity as SIM

    probes = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])], "id long, vec array<double>")
    corpus = spark.createDataFrame(
        [(10, [0.999, 0.01, 0.0]),   # near-copy of probe 1
         (11, [0.5, 0.5, 0.7]),      # unrelated
         (12, [0.0, 0.0, 1.0])],     # orthogonal
        "id long, vec array<double>")
    rows = {r.id: r for r in SIM.semantic_decontaminate(
        corpus, probes, threshold=0.99).collect()}
    assert rows[10].contaminated and rows[10].nearest_probe == 1
    assert not rows[11].contaminated and not rows[12].contaminated


def test_polyglot_segments_flags_language_sandwich(spark):
    en = "the and is of it for on are this that with from " * 10  # 120 tok
    de = "der die das ein eine den dem auf und nicht mit von " * 10
    docs = spark.createDataFrame(
        [(1, en), (2, en + " " + de), (3, "zz qq ww " * 20)],
        "id long, text string")
    from python_web_scraper_cleaner_spark.operators.textstats import (
        polyglot_segments)
    rows = {r.id: r for r in polyglot_segments(
        docs, window_tokens=40, dominant_bp=7000).collect()}
    assert rows[1].dom_lang == "en" and not rows[1].mixed
    assert rows[2].n_langs == 2 and rows[2].mixed  # 3 en + 3 de windows
    # marker-free text: nothing identified -> und, NOT "mixed"
    assert rows[3].dom_lang == "und" and not rows[3].mixed
    assert rows[3].n_langs == 0


def test_focused_priority_empty_topic_and_metachar_terms(spark):
    """Review regressions: an empty topic lexicon must yield zero hits
    (not an AttributeError), and topic terms carrying regex
    metacharacters ('c++', 'node.js') must match literally instead of
    raising PatternSyntaxException / false-matching '.' as any char."""
    anchors = spark.createDataFrame(
        [(1, 10, "learn c++ today"), (2, 10, "node.js guide"),
         (3, 11, "nodexjs is not node.js spelled wrong"),
         (4, 11, "mc++ is word-preceded and must not hit")],
        "src long, target long, anchor string")
    scores = spark.createDataFrame([(1, 100), (2, 200), (3, 300), (4, 400)],
                                   "src long, score_bp long")
    empty = {r.target: r for r in G.focused_priority(
        anchors, scores, ()).collect()}
    assert empty[10].anchor_hits == 0 and empty[11].anchor_hits == 0

    got = {r.target: r for r in G.focused_priority(
        anchors, scores, ("c++", "node.js")).collect()}
    assert got[10].anchor_hits == 2          # one hit per anchor
    # 'nodexjs' must NOT match 'node.js' ('.' escaped); trailing
    # 'node.js' in the same anchor DOES; 'mc++' is word-preceded -> no
    assert got[11].anchor_hits == 1


def test_semantic_decontaminate_string_ids(spark):
    """Review regression: the argmax tie-break must work for STRING ids
    (urls) — negating a string column casts to double (NULL or ANSI
    abort). Two identical probes tie on cosine; the lower id wins."""
    from python_web_scraper_cleaner_spark.operators import similarity as SIM

    probes = spark.createDataFrame(
        [("bench/b", [1.0, 0.0]), ("bench/a", [1.0, 0.0])],
        "id string, vec array<double>")
    corpus = spark.createDataFrame(
        [("doc/x", [1.0, 0.0]), ("doc/y", [0.0, 1.0])],
        "id string, vec array<double>")
    rows = {r.id: r for r in SIM.semantic_decontaminate(
        corpus, probes, threshold=0.99).collect()}
    assert rows["doc/x"].contaminated
    assert rows["doc/x"].nearest_probe == "bench/a"   # tie -> lower id
    assert not rows["doc/y"].contaminated


def test_polyglot_segments_null_and_empty_text_survive(spark):
    """Review regression: NULL-text and empty-text docs must appear in
    the output with the empty-doc verdict (0 segments, 'und', not
    mixed) — not silently vanish from the per-doc rollup."""
    from python_web_scraper_cleaner_spark.operators.textstats import (
        polyglot_segments)

    en = "the and is of it for on are this that with from " * 10
    docs = spark.createDataFrame(
        [(1, en), (2, None), (3, ""), (4, "   ")],
        "id long, text string")
    rows = {r.id: r for r in polyglot_segments(docs).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for i in (2, 3, 4):
        r = rows[i]
        assert r.n_segments == 0 and r.n_langs == 0
        assert r.dom_lang == "und" and r.dom_bp == 0 and not r.mixed
    assert rows[1].dom_lang == "en"
