"""CCNet per-language tercile bucketing (operators/textstats.ccnet_lang_buckets)."""

from python_web_scraper_cleaner_spark.operators import textstats as TS


def _buckets(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, lang string, score long")
    out = TS.ccnet_lang_buckets(df, **kw).collect()
    return {r.id: r for r in out}


def test_terciles_known_cuts(spark):
    # 9 docs, one language, scores 1..9 → n=9, t1=ceil(9·.3334)=4,
    # t2=ceil(9·.6667)=7 → cut1=4, cut2=7
    rows = [(i, "en", i) for i in range(1, 10)]
    got = _buckets(spark, rows)
    assert all(r.cut1 == 4 and r.cut2 == 7 for r in got.values())
    assert {i: got[i].bucket for i in range(1, 10)} == {
        1: "tail", 2: "tail", 3: "tail", 4: "tail",
        5: "middle", 6: "middle", 7: "middle",
        8: "head", 9: "head"}


def test_cuts_are_per_language(spark):
    # same ranks, disjoint score ranges: each language gets its OWN head —
    # the property that distinguishes CCNet from one global quantile
    rows = [(i, "en", 100 + i) for i in range(1, 10)]
    rows += [(10 + i, "de", i) for i in range(1, 10)]
    got = _buckets(spark, rows)
    assert got[9].bucket == "head" and got[19].bucket == "head"
    assert got[1].bucket == "tail" and got[11].bucket == "tail"
    # a global cut would have put ALL de docs in the tail
    assert got[11].cut1 != got[1].cut1


def test_ties_collapse_into_histogram(spark):
    # heavy ties: 6 docs score 5, 3 docs score 9 → n=9, t1=4, t2=7;
    # cum(5)=6 ≥ 4 and ≥... t2=7 → cut1=5, cut2=9
    rows = [(i, "en", 5) for i in range(6)] + [(i, "en", 9) for i in range(6, 9)]
    got = _buckets(spark, rows)
    assert all(r.cut1 == 5 and r.cut2 == 9 for r in got.values())
    assert got[0].bucket == "tail" and got[8].bucket == "middle"


def test_singleton_language(spark):
    got = _buckets(spark, [(1, "fr", 42)])
    r = got[1]
    assert (r.cut1, r.cut2, r.bucket) == (42, 42, "tail")
