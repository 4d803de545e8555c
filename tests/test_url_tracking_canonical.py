"""Aggressive URL canonicalization (operators/frontier.url_tracking_canonical)."""

from python_web_scraper_cleaner_spark.operators import frontier as FR


def _canon(spark, *urls):
    df = spark.createDataFrame(list(enumerate(urls)), "doc_id long, url string")
    rows = FR.url_tracking_canonical(df).orderBy("doc_id").collect()
    return [r.canon_url for r in rows], rows


def test_strip_sort_and_fragment(spark):
    got, rows = _canon(
        spark,
        "https://a.com/p?utm_source=x&b=2&a=1",
        "https://a.com/p;jsessionid=ABC?a=1#frag",
        "https://a.com/p?FBCLID=9",          # case-insensitive lexicon
        "https://a.com/p?",                  # bare '?' drops
        "https://a.com/p",                   # untouched
    )
    assert got == ["https://a.com/p?a=1&b=2", "https://a.com/p?a=1",
                   "https://a.com/p", "https://a.com/p", "https://a.com/p"]
    assert [r.changed for r in rows] == [True, True, True, True, False]


def test_variants_collapse_to_one(spark):
    # the operator's reason to exist: distinct raw urls, ONE canonical
    got, _ = _canon(
        spark,
        "https://a.com/p?b=2&a=1",
        "https://a.com/p?a=1&b=2&utm_medium=email",
        "https://a.com/p?a=1&gclid=zzz&b=2#middle",
        "https://a.com/p;jsessionid=S1?b=2&a=1",
    )
    assert len(set(got)) == 1


def test_param_counts(spark):
    _, rows = _canon(spark, "https://a.com/p?z=1&y=2&utm_a=m&SID=s")
    assert (rows[0].n_params_in, rows[0].n_params_kept) == (4, 2)


def test_sid_prefix_not_overmatched(spark):
    # 'sid' must match the WHOLE key: 'side=1' and 'sidebar=x' survive
    got, _ = _canon(spark, "https://a.com/p?side=1&sidebar=x&sid=KILL")
    assert got == ["https://a.com/p?side=1&sidebar=x"]
