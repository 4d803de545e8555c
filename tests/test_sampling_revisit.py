"""Stratified sampling, token-budget shard packing (operators/sampling.py)
and freshness-aware revisit scheduling (operators/frontier.py).

Pins: sampling determinism + threshold math; packing vs a sequential
python prefix-sum (including bucket-boundary and over-budget docs);
revisit backoff vs hand-computed histories.
"""

import pytest
from pyspark.sql import functions as F

from python_web_scraper_cleaner_spark.operators import frontier as FR
from python_web_scraper_cleaner_spark.operators.sampling import (
    pack_shards, sample_audit, stratified_sample)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_stratified_sample_is_deterministic_and_pure_filter(spark):
    rows = [(i, "en" if i % 3 else "de") for i in range(90)]
    df = _docs(spark, rows)
    a = {r.doc_id: r.sampled for r in
         stratified_sample(df, strata_cols=["lang"], id_col="doc_id",
                           target=10).collect()}
    b = {r.doc_id: r.sampled for r in
         stratified_sample(df.repartition(7), strata_cols=["lang"],
                           id_col="doc_id", target=10).collect()}
    assert a == b  # partitioning-independent: fate is a function of id
    assert any(a.values()) and not all(a.values())


def test_stratified_sample_keeps_everything_when_under_target(spark):
    df = _docs(spark, [(i, "fr") for i in range(5)])
    out = stratified_sample(df, strata_cols=["lang"], id_col="doc_id",
                            target=10).collect()
    assert all(r.sampled for r in out)  # keep_bp clamps at 10000


def test_sample_audit_counts(spark):
    df = _docs(spark, [(i, "en" if i % 3 else "de") for i in range(90)])
    audit = {r.lang: (r.n_total, r.n_kept) for r in
             sample_audit(df, strata_cols=["lang"], id_col="doc_id",
                          target=10).collect()}
    assert audit["en"][0] == 60 and audit["de"][0] == 30
    for lang, (total, kept) in audit.items():
        assert 0 < kept <= total


@pytest.mark.parametrize("bucket_width", [1, 3, 100])
def test_pack_shards_matches_sequential_prefix_sum(spark, bucket_width):
    toks = [7, 3, 12, 1, 1, 30, 2, 9, 4, 4]  # one doc over budget (30)
    df = spark.createDataFrame(list(enumerate(toks)),
                               "doc_id long, n long")
    got = {r.id: r.shard_id for r in
           pack_shards(df, id_col="doc_id", tokens_col="n", budget=10,
                       bucket_width=bucket_width).collect()}
    prefix, want = 0, {}
    for i, t in enumerate(toks):
        want[i] = prefix // 10
        prefix += t
    assert got == want, bucket_width


def test_pack_shards_sparse_ids(spark):
    # id gaps leave empty buckets; packing must not care
    df = spark.createDataFrame([(5, 6), (900, 6), (90001, 6)],
                               "doc_id long, n long")
    got = {r.id: r.shard_id for r in
           pack_shards(df, id_col="doc_id", tokens_col="n",
                       budget=10, bucket_width=100).collect()}
    assert got == {5: 0, 900: 0, 90001: 1}


def test_pack_shards_derived_width_bounds_buckets_on_sparse_ids(spark):
    # xxhash-style sparse id space: the default (derived) bucket width
    # must bound the bucket-TOTALS frame at ~target_buckets rows instead
    # of one row per doc, and stay bit-identical to the sequential pack
    ids = sorted((i * 2654435761) % (1 << 40) for i in range(1, 200))
    toks = [(i % 13) + 1 for i in range(len(ids))]
    df = spark.createDataFrame(list(zip(ids, toks)), "doc_id long, n long")
    out = pack_shards(df, id_col="doc_id", tokens_col="n", budget=25,
                      target_buckets=16)
    got = {r.id: r.shard_id for r in out.collect()}
    prefix, want = 0, {}
    for i, t in zip(ids, toks):
        want[i] = prefix // 25
        prefix += t
    assert got == want
    # derived geometry: distinct buckets bounded by target (+1 rounding)
    span = ids[-1] - ids[0] + 1
    width = max(1, -(-span // 16))
    n_buckets = len({i // width for i in ids})
    assert n_buckets <= 17


def _history(spark, rows):
    return spark.createDataFrame(
        rows, "page_id long, ts timestamp, fetch_id long, changed boolean")


def test_revisit_backoff_and_reset(spark):
    import datetime as dt
    t = lambda h: dt.datetime(2026, 6, 1, h)
    rows = (
        # page 0: changed on latest fetch -> tail 0 -> base interval
        [(0, t(1), 1, False), (0, t(2), 2, True)]
        # page 1: changed once, then 3 unchanged -> tail 3 -> 2^3
        + [(1, t(1), 3, True), (1, t(2), 4, False), (1, t(3), 5, False),
           (1, t(4), 6, False)]
        # page 2: never changed -> tail = n_fetches = 2 -> 2^2
        + [(2, t(1), 7, False), (2, t(2), 8, False)])
    out = {r.page_id: r for r in
           FR.revisit_schedule(_history(spark, rows)).collect()}
    assert (out[0].unchanged_tail, out[0].next_interval_hours) == (0, 1)
    assert (out[1].unchanged_tail, out[1].next_interval_hours) == (3, 8)
    assert (out[2].n_changes, out[2].unchanged_tail,
            out[2].next_interval_hours) == (0, 2, 4)


def test_revisit_clamps_at_max_and_breaks_ts_ties_by_id(spark):
    import datetime as dt
    t0 = dt.datetime(2026, 6, 1)
    # 12 unchanged fetches, cap=10 -> 2^10=1024 clamps to 720
    rows = [(7, t0, i, False) for i in range(12)]
    out = FR.revisit_schedule(_history(spark, rows)).collect()[0]
    assert out.next_interval_hours == 720
    # same ts everywhere: latest by fetch_id is id=11; mark it changed
    rows[-1] = (7, t0, 11, True)
    out = FR.revisit_schedule(_history(spark, rows)).collect()[0]
    assert out.unchanged_tail == 0 and out.next_interval_hours == 1


def test_chunk_documents_windows_and_edges(spark):
    from python_web_scraper_cleaner_spark.operators.sampling import (
        chunk_documents)
    toks20 = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, toks20), (2, "a b c"), (3, ""), (4, "   ")],
        "doc_id long, text string")
    out = chunk_documents(df, id_col="doc_id", text_col="text",
                          chunk_tokens=8, overlap=3)
    rows = {(r.id, r.chunk_idx): (r.n_chunk_tokens, r.chunk)
            for r in out.collect()}
    # doc 1: stride 5 -> windows [0:8],[5:13],[10:18],[15:20]
    assert {k for k in rows if k[0] == 1} == {(1, i) for i in range(4)}
    assert rows[(1, 0)][1] == " ".join(f"w{i}" for i in range(8))
    assert rows[(1, 1)][1] == " ".join(f"w{i}" for i in range(5, 13))
    assert rows[(1, 3)] == (5, " ".join(f"w{i}" for i in range(15, 20)))
    # overlap reconstruction: chunk0 + each later chunk minus its first
    # `overlap` tokens == the original token stream
    rebuilt = rows[(1, 0)][1].split()
    for i in (1, 2, 3):
        rebuilt += rows[(1, i)][1].split()[3:]
    assert rebuilt == toks20.split()
    # short doc -> one whole-text chunk; empty/whitespace -> no chunks
    assert rows[(2, 0)] == (3, "a b c")
    assert not any(k[0] in (3, 4) for k in rows)


def test_chunk_documents_rejects_bad_overlap(spark):
    from python_web_scraper_cleaner_spark.operators.sampling import (
        chunk_documents)
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, id_col="doc_id", text_col="text",
                        chunk_tokens=4, overlap=4)


def test_leakage_safe_split_unit_exclusive_and_deterministic(spark):
    import pytest

    from python_web_scraper_cleaner_spark.operators.sampling import (
        leakage_safe_split)

    rows = [(i, f"dom{i % 37}.example") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, domain string")
    out = leakage_safe_split(df, unit_col="domain",
                             splits=(("train", 6000), ("valid", 2000),
                                     ("test", 2000)))
    # every domain maps to exactly ONE split (the leakage-safety property)
    multi = (out.groupBy("domain")
             .agg(F.countDistinct("split").alias("n"))
             .filter("n > 1").count())
    assert multi == 0
    # at least two splits realized, and the assignment is reproducible
    a = {(r["id"], r["split"]) for r in out.collect()}
    b = {(r["id"], r["split"]) for r in leakage_safe_split(
        df, unit_col="domain",
        splits=(("train", 6000), ("valid", 2000),
                ("test", 2000))).collect()}
    assert a == b
    assert out.select("split").distinct().count() >= 2
    # widths must sum to 10000 basis points
    with pytest.raises(ValueError):
        leakage_safe_split(df, unit_col="domain",
                           splits=(("a", 5000), ("b", 4000)))
