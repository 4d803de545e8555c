"""Cross-host mirror pairs (operators/dedup.host_mirror_pairs) and the
URL pre-fetch filter (operators/frontier.url_prefilter).

Pins the mirror containment math, the hot-digest guard (a ubiquitous
boilerplate digest must NOT weld unrelated hosts into pairs), and every
url_prefilter verdict class with its CASE priority.
"""

import pytest

from python_web_scraper_cleaner_spark.operators import dedup as D
from python_web_scraper_cleaner_spark.operators import frontier as FR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "host string, text string")


def _pairs(df):
    return {(r["host_a"], r["host_b"]): r.asDict() for r in df.collect()}


def test_full_mirror_scores_containment_10000(spark):
    docs = _docs(spark, [
        ("big", "page one"), ("big", "page two"), ("big", "page three"),
        ("big", "page four"),
        # "m" carries ONLY copies of big's content: containment of the
        # smaller side is total even though big is larger
        ("m", "page one"), ("m", "page two"),
    ])
    out = _pairs(D.host_mirror_pairs(docs))
    row = out[("big", "m")]
    assert row["shared_digests"] == 2
    assert (row["digests_a"], row["digests_b"]) == (4, 2)
    assert row["overlap_bp"] == 10000 and row["is_mirror"]


def test_low_overlap_pair_not_flagged(spark):
    docs = _docs(spark, [
        ("a", "x1"), ("a", "x2"), ("a", "x3"), ("a", "shared"),
        ("b", "y1"), ("b", "y2"), ("b", "y3"), ("b", "shared"),
    ])
    out = _pairs(D.host_mirror_pairs(docs))
    row = out[("a", "b")]
    assert row["shared_digests"] == 1
    assert row["overlap_bp"] == 2500 and not row["is_mirror"]


def test_hot_digest_guard_excludes_boilerplate(spark):
    # one cookie-wall digest on 5 hosts; cap at 4 hosts -> the digest is
    # ineligible, so NO pairs exist at all (the hosts share nothing else)
    docs = _docs(spark, [(f"h{i}", "cookie wall") for i in range(5)])
    assert D.host_mirror_pairs(docs, max_hosts_per_digest=4).count() == 0
    # raising the cap makes all C(5,2)=10 pairs appear
    assert D.host_mirror_pairs(docs, max_hosts_per_digest=5).count() == 10


def test_within_host_repeats_collapse_before_pairing(spark):
    # the same text twice on one host is ONE digest — shared counts
    # distinct content, not doc copies
    docs = _docs(spark, [
        ("a", "dup"), ("a", "dup"), ("a", "solo"),
        ("b", "dup"),
    ])
    row = _pairs(D.host_mirror_pairs(docs))[("a", "b")]
    assert row["shared_digests"] == 1 and row["digests_a"] == 2
    assert row["overlap_bp"] == 10000  # containment of b (1 digest)


def test_guard_rejects_cap_below_two(spark):
    docs = _docs(spark, [("a", "x")])
    with pytest.raises(ValueError):
        D.host_mirror_pairs(docs, max_hosts_per_digest=1)


# -- url_prefilter ----------------------------------------------------------

def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def _verdicts(urls_df):
    out = FR.url_prefilter(urls_df)
    return {r["url"]: r.asDict() for r in out.collect()}


def test_prefilter_flags_every_class_and_keeps_clean(spark):
    clean = "https://example.com/news/story.html"
    v = _verdicts(_urls(spark, [
        clean,
        "https://example.com/casino/bonus",
        "https://example.com/a?" + "&".join(f"p{i}={i}" for i in range(9)),
        "https://example.com/id" + "1234567890" * 9,
        "https://example.com" + "/s" * 9,
        "https://example.com/" + "z" * 230,
    ]))
    reasons = {d["drop_reason"] for d in v.values()}
    assert reasons == {"ok", "blockword", "params", "digits", "depth",
                       "length"}
    assert v[clean]["keep"] and v[clean]["path_depth"] == 2
    assert sum(1 for d in v.values() if d["keep"]) == 1


def test_prefilter_priority_blockword_wins(spark):
    # a url tripping blockword AND params AND depth reports blockword
    u = ("https://example.com" + "/casino" * 10
         + "?" + "&".join(f"p{i}={i}" for i in range(9)))
    v = _verdicts(_urls(spark, [u]))[u]
    assert v["drop_reason"] == "blockword" and not v["keep"]
    assert v["n_params"] == 9 and v["path_depth"] == 10


def test_prefilter_counts_are_exact(spark):
    u = "https://h.example.com/a/b/c.html?x=1&y=22"
    v = _verdicts(_urls(spark, [u]))[u]
    assert v["url_len"] == len(u)
    assert v["path_depth"] == 3
    assert v["n_params"] == 2
    n_digits = sum(c.isdigit() for c in u)
    assert v["digit_bp"] == 10000 * n_digits // len(u)
    assert v["keep"]
