"""Rendezvous sharding + linear-counting sketch (operators/frontier.py)
and weighted ticket sampling (operators/sampling.py) and asymmetric
containment pairs (operators/dedup.py).

Pins: HRW minimal-disruption invariant (losing a shard moves ONLY that
shard's hosts), sketch accuracy/saturation/bounded-state, ticket-key
monotonicity in the weight, and the syndication case Jaccard misses but
containment catches.
"""

import pytest
from pyspark.sql import functions as F

from python_web_scraper_cleaner_spark.operators.dedup import (
    containment_pairs)
from python_web_scraper_cleaner_spark.operators.frontier import (
    distinct_linear_count, rendezvous_shard)
from python_web_scraper_cleaner_spark.operators.sampling import (
    weighted_sample_keys)


# ---------------------------------------------------------------------------
# rendezvous_shard
# ---------------------------------------------------------------------------


def _hosts(spark, n):
    return spark.createDataFrame([(f"host{i}.example.com",) for i in range(n)],
                                 "host string")


def test_rendezvous_assigns_in_range_and_deterministically(spark):
    df = _hosts(spark, 200)
    a = {r.host: r.shard for r in
         rendezvous_shard(df, n_shards=8).collect()}
    b = {r.host: r.shard for r in
         rendezvous_shard(df.repartition(7), n_shards=8).collect()}
    assert a == b  # pure function of the host string
    assert set(a.values()) <= set(range(8))


def test_rendezvous_minimal_disruption_on_shard_loss(spark):
    df = _hosts(spark, 300)
    both = rendezvous_shard(
        rendezvous_shard(df, n_shards=8, out_col="s8"),
        n_shards=7, out_col="s7").collect()
    movers = [r for r in both if r.s8 != r.s7]
    # ONLY hosts whose 8-shard home was the lost shard (7) move…
    assert all(r.s8 == 7 for r in movers)
    # …and every one of them moves (shard 7 no longer exists)
    assert {r.host for r in movers} == {r.host for r in both if r.s8 == 7}


def test_rendezvous_spreads_load(spark):
    counts = (rendezvous_shard(_hosts(spark, 800), n_shards=8)
              .groupBy("shard").count().collect())
    assert len(counts) == 8
    assert all(40 <= r["count"] <= 200 for r in counts)  # mean 100


# ---------------------------------------------------------------------------
# distinct_linear_count
# ---------------------------------------------------------------------------


def _refs(spark, n_distinct, reps):
    rows = [("h", f"https://h/p/{i}") for i in range(n_distinct)
            for _ in range(reps)]
    return spark.createDataFrame(rows, "host string, url string")


def test_linear_count_estimates_within_tolerance(spark):
    out = distinct_linear_count(_refs(spark, 200, 5), m=4096).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_refs == 1000
    assert r.buckets_used <= 200  # bounded state: ≤ distinct, ≤ m
    assert abs(r.est_distinct - 200) / 200 < 0.10


def test_linear_count_saturates_to_null(spark):
    out = distinct_linear_count(_refs(spark, 500, 1), m=4).collect()
    assert out[0].buckets_used == 4
    assert out[0].est_distinct is None  # V = m ⇒ ln 0 guarded


def test_linear_count_repetition_invariant(spark):
    # the estimate depends on the distinct set, not on reference volume
    once = distinct_linear_count(_refs(spark, 100, 1), m=1024).collect()[0]
    many = distinct_linear_count(_refs(spark, 100, 50), m=1024).collect()[0]
    assert once.est_distinct == many.est_distinct
    assert once.buckets_used == many.buckets_used
    assert many.n_refs == 50 * once.n_refs


# ---------------------------------------------------------------------------
# weighted_sample_keys
# ---------------------------------------------------------------------------


def _weighted(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, w long")


def test_ticket_key_monotone_in_weight(spark):
    # more tickets can only LOWER the min — per id, key(w=5) ≤ key(w=1)
    ids = list(range(500))
    lo = {r.doc_id: r.ticket_key for r in weighted_sample_keys(
        _weighted(spark, [(i, 1) for i in ids]), id_col="doc_id",
        weight_col="w").collect()}
    hi = {r.doc_id: r.ticket_key for r in weighted_sample_keys(
        _weighted(spark, [(i, 5) for i in ids]), id_col="doc_id",
        weight_col="w").collect()}
    assert all(hi[i] <= lo[i] for i in ids)
    assert any(hi[i] < lo[i] for i in ids)


def test_ticket_weight_clamped(spark):
    out = {r.doc_id: r.weight for r in weighted_sample_keys(
        _weighted(spark, [(1, 0), (2, -3), (3, 999)]), id_col="doc_id",
        weight_col="w", max_weight=16).collect()}
    assert out == {1: 1, 2: 1, 3: 16}


def test_ticket_sampling_prefers_heavy_rows(spark):
    # statistical sanity at n=2000: the heavy half should dominate the
    # low-key end of the ranking (not a flaky bound — the gap is wide)
    rows = [(i, 8 if i % 2 == 0 else 1) for i in range(2000)]
    keyed = weighted_sample_keys(_weighted(spark, rows), id_col="doc_id",
                                 weight_col="w")
    top = keyed.orderBy("ticket_key", "doc_id").limit(400).collect()
    heavy = sum(1 for r in top if r.doc_id % 2 == 0)
    assert heavy > 260  # expect ≈ 8/9 · 400 ≈ 356


def test_ticket_key_partitioning_independent(spark):
    rows = [(i, 1 + i % 5) for i in range(200)]
    a = {r.doc_id: r.ticket_key for r in weighted_sample_keys(
        _weighted(spark, rows), id_col="doc_id", weight_col="w").collect()}
    b = {r.doc_id: r.ticket_key for r in weighted_sample_keys(
        _weighted(spark, rows).repartition(9), id_col="doc_id",
        weight_col="w").collect()}
    assert a == b


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------

_ARTICLE = ("the committee approved the updated water treatment budget "
            "after a lengthy public hearing on tuesday evening")
_WRAP_HEAD = "portal navigation home news sports weather business "
_WRAP_FOOT = (" related stories trending now comments section footer "
              "copyright notice all rights reserved contact us about")


def test_containment_catches_syndication_jaccard_misses(spark):
    df = spark.createDataFrame(
        [(1, _ARTICLE),
         (2, _WRAP_HEAD + _ARTICLE + _WRAP_FOOT),
         (3, "entirely unrelated text about gardening and soil quality "
             "for raised vegetable beds in a cold climate")],
        "doc_id long, text string")
    pairs = containment_pairs(df, "doc_id", "text", k=3,
                              threshold_bp=8000, max_df=None).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.id_a, p.id_b) == (1, 2)
    assert p.contained_id == 1          # the article is the contained side
    assert p.containment_bp >= 8500     # nearly all article shingles survive
    assert p.jaccard_bp < 5000          # symmetric measure would miss it


def test_containment_bounds_and_symmetric_case(spark):
    df = spark.createDataFrame(
        [(1, _ARTICLE), (2, _ARTICLE)], "doc_id long, text string")
    p = containment_pairs(df, "doc_id", "text", threshold_bp=8000,
                          max_df=None).collect()[0]
    # identical docs: both measures saturate
    assert p.containment_bp == 10000 and p.jaccard_bp == 10000


def test_containment_never_below_jaccard(spark):
    rows = [(i, f"shared prefix tokens here {'x' * (i % 3)} tail {i}")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for r in containment_pairs(df, "doc_id", "text", threshold_bp=0,
                               max_df=None).collect():
        assert r.containment_bp >= r.jaccard_bp


def test_containment_hot_shingle_guard(spark):
    # with max_df=1 every shared shingle is "hot" and dropped — no pairs
    df = spark.createDataFrame(
        [(1, _ARTICLE), (2, _ARTICLE), (3, _ARTICLE)],
        "doc_id long, text string")
    assert containment_pairs(df, "doc_id", "text", threshold_bp=0,
                             max_df=1).count() == 0


# ---------------------------------------------------------------------------
# distinct_hll
# ---------------------------------------------------------------------------


def test_hll_estimates_large_cardinality(spark):
    from python_web_scraper_cleaner_spark.operators.frontier import (
        distinct_hll)
    out = distinct_hll(_refs(spark, 2000, 2)).collect()
    assert len(out) == 1
    # σ ≈ 1.04/√256 ≈ 6.5%; 15% is a comfortable non-flaky bound
    assert abs(out[0].est_distinct - 2000) / 2000 < 0.15


def test_hll_small_range_correction(spark):
    from python_web_scraper_cleaner_spark.operators.frontier import (
        distinct_hll)
    out = distinct_hll(_refs(spark, 30, 1)).collect()
    assert abs(out[0].est_distinct - 30) / 30 < 0.20


def test_hll_registers_merge_like_union(spark):
    # THE distributed property: max-merging two streams' registers gives
    # exactly the union stream's estimate
    import pyspark.sql.functions as SF

    from python_web_scraper_cleaner_spark.operators.frontier import (
        hll_estimate, hll_registers)
    a = spark.createDataFrame(
        [("h", f"https://h/a/{i}") for i in range(400)],
        "host string, url string")
    b = spark.createDataFrame(
        [("h", f"https://h/b/{i}") for i in range(300)]
        + [("h", f"https://h/a/{i}") for i in range(100)],  # overlap
        "host string, url string")
    union_est = hll_estimate(hll_registers(a.union(b))).collect()[0]
    merged = (hll_registers(a).union(hll_registers(b))
              .groupBy("key", "bucket")
              .agg(SF.max("m_rho").alias("m_rho")))
    merge_est = hll_estimate(merged).collect()[0]
    assert union_est.est_distinct == merge_est.est_distinct


def test_hll_repetition_invariant(spark):
    from python_web_scraper_cleaner_spark.operators.frontier import (
        distinct_hll)
    once = distinct_hll(_refs(spark, 500, 1)).collect()[0]
    many = distinct_hll(_refs(spark, 500, 9)).collect()[0]
    assert once.est_distinct == many.est_distinct


# ---------------------------------------------------------------------------
# count-min sketch + zipf fit
# ---------------------------------------------------------------------------


def _token_stream(spark, spec):
    # spec: {token: count}
    rows = [(t,) for t, c in spec.items() for _ in range(c)]
    return spark.createDataFrame(rows, "token string")


def test_cms_never_undercounts(spark):
    from python_web_scraper_cleaner_spark.operators.textstats import (
        cms_build, cms_probe)
    spec = {f"tok{i}": 1 + (i * 7) % 40 for i in range(300)}
    stream = _token_stream(spark, spec)
    probes = spark.createDataFrame([(t,) for t in list(spec)[:50]],
                                   "token string")
    est = {r.token: r.n_est for r in
           cms_probe(cms_build(stream), probes).collect()}
    n_total = sum(spec.values())
    for t in list(spec)[:50]:
        assert est[t] >= spec[t]                  # one-sided guarantee
        assert est[t] - spec[t] <= 0.01 * n_total  # ε = e/1024 ≈ 0.0027


def test_cms_unknown_token_estimates_near_zero(spark):
    from python_web_scraper_cleaner_spark.operators.textstats import (
        cms_build, cms_probe)
    stream = _token_stream(spark, {f"tok{i}": 5 for i in range(100)})
    probes = spark.createDataFrame([("never-seen-token",)], "token string")
    est = cms_probe(cms_build(stream), probes).collect()[0]
    # min over 4 rows of a sparse sketch: tiny collision mass at most
    assert est.n_est <= 10


def test_cms_cells_add_like_union(spark):
    import pyspark.sql.functions as SF

    from python_web_scraper_cleaner_spark.operators.textstats import (
        cms_build)
    a = _token_stream(spark, {f"a{i}": 3 for i in range(50)})
    b = _token_stream(spark, {f"b{i}": 2 for i in range(70)})
    union = {(r.row, r.bucket): r.n for r in cms_build(a.union(b)).collect()}
    summed = {(r.row, r.bucket): r.n for r in
              (cms_build(a).union(cms_build(b))
               .groupBy("row", "bucket")
               .agg(SF.sum("n").alias("n")).collect())}
    assert union == summed


def test_zipf_fit_recovers_exponent(spark):
    from python_web_scraper_cleaner_spark.operators.textstats import (
        zipf_fit)
    # exact power law n(r) = floor(100000 / r): slope ≈ −1, r2 ≈ 1
    rows = [("en", f"t{r:04d}", 100000 // r) for r in range(1, 201)]
    counts = spark.createDataFrame(rows, "lang string, token string, n long")
    out = zipf_fit(counts, group_col="lang", count_col="n",
                   top_ranks=200).collect()[0]
    assert abs(out.slope - (-1.0)) < 0.02
    assert out.r2 > 0.999


def test_zipf_fit_degenerate_group_is_null(spark):
    from python_web_scraper_cleaner_spark.operators.textstats import (
        zipf_fit)
    counts = spark.createDataFrame([("xx", "only", 5)],
                                   "lang string, token string, n long")
    out = zipf_fit(counts, group_col="lang", count_col="n").collect()[0]
    assert out.n_ranks == 1 and out.slope is None and out.r2 is None


def test_ticket_null_weight_gets_minimum_not_maximum(spark):
    # least/greatest skip NULLs — without the coalesce a NULL weight
    # clamps to max_weight, giving MISSING data the best odds
    out = {r.doc_id: r.weight for r in weighted_sample_keys(
        spark.createDataFrame([(1, 3), (2, None)], "doc_id long, w long"),
        id_col="doc_id", weight_col="w", max_weight=16).collect()}
    assert out == {1: 3, 2: 1}


def test_zipf_fit_custom_token_column(spark):
    from python_web_scraper_cleaner_spark.operators.textstats import (
        zipf_fit)
    rows = [("hostA", f"/path/{r}", 100000 // r) for r in range(1, 101)]
    counts = spark.createDataFrame(rows, "host string, path string, n long")
    out = zipf_fit(counts, group_col="host", count_col="n",
                   token_col="path", top_ranks=100).collect()[0]
    assert abs(out.slope - (-1.0)) < 0.03
