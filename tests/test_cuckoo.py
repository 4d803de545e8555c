"""Cuckoo-filter tier tests: zero false negatives (the contract-critical
property), bounded FPR, exact deletion, and the Spark dedup pipeline
equaling the plain anti-join."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from python_web_scraper_cleaner_spark.operators import cuckoo as CK


def _table(n, seed=7, load=0.84):
    rng = np.random.default_rng(seed)
    h = np.unique(rng.integers(-2**62, 2**62, size=n, dtype=np.int64))
    need = max(8, int(len(h) / (CK.SLOTS * load)))
    m = 1 << (need - 1).bit_length()
    t = np.zeros((m, CK.SLOTS), dtype=np.uint16)
    failed = CK._insert_all(t, h, m, rng_seed=1)
    return t, h, m, failed


def test_no_false_negatives_and_bounded_fpr():
    t, h, m, failed = _table(50_000)
    assert failed == 0
    assert CK._probe_table(t, h, m).all()          # zero false negatives
    rng = np.random.default_rng(11)
    other = np.setdiff1d(
        rng.integers(-2**62, 2**62, size=200_000, dtype=np.int64), h)
    assert CK._probe_table(t, other, m).mean() < 0.01


def test_delete_removes_without_harming_others():
    t, h, m, _ = _table(20_000)
    removed = CK.delete_from_table(t, h[:500], m)
    assert removed == 500
    assert not CK._probe_table(t, h[:500], m).any()
    assert CK._probe_table(t, h[500:], m).all()


def test_involution_partner_map():
    """alt(alt(i)) == i for power-of-two m — the property that guarantees
    no false negatives after evictions."""
    rng = np.random.default_rng(3)
    m = 1 << 14
    i = rng.integers(0, m, size=10_000, dtype=np.int64)
    f = CK._fingerprint(rng.integers(-2**62, 2**62, size=10_000,
                                     dtype=np.int64))
    assert (CK._alt(CK._alt(i, f, m), f, m) == i).all()


def test_cuckoo_dedup_equals_exact_antijoin(spark):
    urls = (spark.range(3000)
            .select(F.concat(F.lit("https://h"), (F.col("id") % 9).cast("string"),
                             F.lit("/p/"), F.col("id").cast("string"))
                    .alias("canonical_url")))
    cand = urls.withColumn("url_hash", F.xxhash64("canonical_url"))
    seen = (urls.filter(F.xxhash64("canonical_url") % 3 == 0)
            .withColumn("url_hash", F.xxhash64("canonical_url")))
    ck = CK.build_cuckoo(seen.select("url_hash"), n_buckets=4,
                         expected_per_bucket=512)
    got = {r.canonical_url for r in
           CK.cuckoo_dedup(cand, seen, ck, n_buckets=4).collect()}
    expect = {r.canonical_url for r in
              cand.join(seen.select("url_hash"), "url_hash",
                        "left_anti").collect()}
    assert got == expect
    # overfull build reports failures instead of silently dropping
    tiny = CK.build_cuckoo(seen.select("url_hash"), n_buckets=1,
                           expected_per_bucket=8)
    row = tiny.collect()[0]
    assert row.n_items == seen.count()


def test_cuckoo_revoke_restores_revoked_urls_as_new(spark):
    """Distributed deletion: revoked (TTL-expired) urls must dedup as NEW
    after cuckoo_revoke, and the result must equal the plain anti-join
    against (seen minus revoked)."""
    urls = (spark.range(2000)
            .select(F.concat(F.lit("https://h"),
                             (F.col("id") % 7).cast("string"),
                             F.lit("/p/"), F.col("id").cast("string"))
                    .alias("canonical_url"), F.col("id")))
    cand = urls.withColumn("url_hash", F.xxhash64("canonical_url"))
    seen = cand.filter(F.col("id") % 2 == 0)
    revoked = seen.filter(F.col("id") % 6 == 0)
    kept = seen.join(revoked.select("url_hash"), "url_hash", "left_anti")
    ck = CK.build_cuckoo(seen.select("url_hash"), n_buckets=4,
                         expected_per_bucket=512)
    ck2 = CK.cuckoo_revoke(ck, revoked, n_buckets=4)
    # revoked keys were removed from the filter
    before = sum(r["n_items"] for r in ck.collect())
    after = sum(r["n_items"] for r in ck2.collect())
    assert before - after == revoked.count()
    got = {r.canonical_url for r in
           CK.cuckoo_dedup(cand, kept, ck2, n_buckets=4).collect()}
    expect = {r.canonical_url for r in
              cand.join(kept.select("url_hash"), "url_hash",
                        "left_anti").collect()}
    assert got == expect
    # every revoked url is back in the "new" set
    assert {r.canonical_url for r in revoked.collect()} <= got


def test_overfull_filter_falls_back_to_exact(spark):
    """A cuckoo table too small for its keys reports n_failed > 0; the
    dedup pipeline must then fall back to the exact anti-join instead of
    leaking seen URLs as 'definitely new'."""
    urls = (spark.range(5000)
            .select(F.concat(F.lit("u"), F.col("id").cast("string"))
                    .alias("u")))
    cand = urls.withColumn("url_hash", F.xxhash64("u"))
    seen = (urls.filter(F.col("u").substr(2, 10).cast("long") % 2 == 0)
            .withColumn("url_hash", F.xxhash64("u")))
    ck = CK.build_cuckoo(seen.select("url_hash"), n_buckets=1,
                         expected_per_bucket=8)
    assert ck.collect()[0].n_failed > 0
    got = CK.cuckoo_dedup(cand, seen, ck, n_buckets=1).count()
    expect = cand.join(seen.select("url_hash"), "url_hash",
                       "left_anti").count()
    assert got == expect
