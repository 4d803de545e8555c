"""BM25 fixed-point relevance (operators/search.py:bm25_topk) and n-gram
decontamination (operators/dedup.py:contamination_check).

bm25 tests pin the fixed-point IDF arithmetic against a hand-computed
value, the down-weighting of corpus-wide terms relative to rare ones,
and ranking determinism; decontamination tests pin hit detection for
verbatim k-gram overlap, non-detection for disjoint text, and the hit
count (= number of distinct shared shingles).
"""

from pyspark.sql import functions as F

from python_web_scraper_cleaner_spark.operators import dedup as D
from python_web_scraper_cleaner_spark.operators import search as S


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")


def _idf_fp(n, df, scale=1_000_000):
    return (scale * (2 * n - 2 * df + 1)) // (2 * df + 1)


def test_bm25_rare_term_outranks_common_term(spark):
    # 'zebra' appears in 1/4 docs, 'data' in all 4: one zebra mention must
    # outscore one data mention; doc 3 (both) must outscore doc 0 (zebra
    # only), and doc 0 must outscore docs with only 'data'.
    docs = _docs(spark, [
        "zebra data",
        "data here",
        "data there",
        "zebra data data",
    ])
    rows = S.bm25_topk(docs, "zebra data", k=10).collect()
    scores = {r.id: r.score for r in rows}
    n = 4
    idf_z, idf_d = _idf_fp(n, 2), _idf_fp(n, 4)  # zebra in docs 0,3
    assert scores[0] == idf_z + idf_d
    assert scores[3] == idf_z + 2 * idf_d
    assert scores[1] == scores[2] == idf_d
    assert idf_z > idf_d  # rarity wins
    assert [r.id for r in rows] == [3, 0, 1, 2]  # ties break by id asc


def test_bm25_fixed_point_matches_float_formula_direction(spark):
    # the log-free RSJ idf must be monotone decreasing in df, like ln-idf
    n = 100
    vals = [_idf_fp(n, df) for df in (1, 5, 25, 99)]
    assert vals == sorted(vals, reverse=True)
    assert all(v >= 0 for v in vals)


def test_bm25_zero_score_docs_are_excluded(spark):
    docs = _docs(spark, ["nothing relevant here", "zebra sighting"])
    rows = S.bm25_topk(docs, "zebra", k=10).collect()
    assert [r.id for r in rows] == [1]


def test_contamination_detects_verbatim_kgram(spark):
    probe_text = "alpha bravo charlie delta echo foxtrot golf hotel india"
    corpus = _docs(spark, [
        "x " + probe_text,          # contains every probe 8-gram
        "completely different words with no shared eight gram at all ok",
    ])
    probes = spark.createDataFrame([(100, probe_text)],
                                   "doc_id long, text string")
    rows = (D.contamination_check(corpus, probes, k=8)
            .orderBy("id").collect())
    # probe has 9 tokens -> 2 distinct 8-grams; doc 0 contains both
    assert [(r.id, r.n_hits) for r in rows] == [(0, 2)]


def test_contamination_short_doc_whole_text_shingle(spark):
    # docs under k tokens shingle as the whole text: only an exact
    # (normalized) match hits
    corpus = _docs(spark, ["tiny doc", "Tiny  DOC", "tiny dog"])
    probes = spark.createDataFrame([(9, "tiny doc")],
                                   "doc_id long, text string")
    rows = (D.contamination_check(corpus, probes, k=8)
            .orderBy("id").collect())
    assert [(r.id, r.n_hits) for r in rows] == [(0, 1), (1, 1)]


def test_incremental_dedup_finds_cross_batch_near_dups_only(spark):
    # index: two distinct docs; new batch: an exact copy of doc 0, a near
    # copy of doc 1, and a fresh doc. Pairs must cross index x new only.
    base0 = "the quick brown fox jumps over the lazy dog again and again"
    base1 = "completely different content about spark shuffles and joins ok"
    index = _docs(spark, [base0, base1])
    new = spark.createDataFrame(
        [(100, base0),                              # exact re-crawl
         (101, base1 + " tail"),                    # near-dup
         (102, "entirely novel text with nothing shared at all here yes")],
        "doc_id long, text string")
    rows = (D.minhash_lsh_dedup_incremental(index, new, threshold=0.5)
            .orderBy("id_a", "id_b").collect())
    got = {(r.id_a, r.id_b): round(r.jaccard, 4) for r in rows}
    assert (0, 100) in got and got[(0, 100)] == 1.0
    assert all(a < 100 <= b for a, b in got)        # never new x new
    assert (0, 102) not in got and (1, 102) not in got


def test_incremental_dedup_ids_never_pair_within_one_side(spark):
    # two identical docs INSIDE the new batch must not pair with each
    # other (that's the self-join op's job), only with the index
    text = "same words repeated across the whole batch of documents here"
    index = _docs(spark, [text])
    new = spark.createDataFrame([(100, text), (101, text)],
                                "doc_id long, text string")
    rows = D.minhash_lsh_dedup_incremental(index, new).collect()
    assert sorted((r.id_a, r.id_b) for r in rows) == [(0, 100), (0, 101)]


def test_bm25_empty_query_returns_empty_frame(spark):
    # empty / stopword-only / punctuation-only queries have no meaningful
    # terms; the operator must return an empty (id, score) frame, not
    # crash building a score expression over zero terms
    docs = _docs(spark, ["some text", "more text"])
    for q in ("", "   ", "the and of", "!!! ???"):
        out = S.bm25_topk(docs, q, k=5)
        assert [f.name for f in out.schema.fields] == ["id", "score"]
        assert out.count() == 0


def test_build_postings_exact_counts_and_order(spark):
    """Hand corpus: df/cf exact, postings ordered (tf desc, id asc) and
    capped at k."""
    from python_web_scraper_cleaner_spark.operators.search import (
        build_postings)
    docs = spark.createDataFrame(
        [(1, "apple banana apple"),
         (2, "banana banana banana cherry"),
         (3, "apple cherry cherry"),
         (4, "   ")],
        "doc_id long, text string")
    out = {r["tok"]: r for r in build_postings(docs, k=2).collect()}
    assert set(out) == {"apple", "banana", "cherry"}
    assert (out["apple"]["df"], out["apple"]["cf"]) == (2, 3)
    assert out["apple"]["postings"] == "1:2,3:1"
    assert (out["banana"]["df"], out["banana"]["cf"]) == (2, 4)
    assert out["banana"]["postings"] == "2:3,1:1"
    # k=2 cap drops cherry's third doc; tf tie breaks by id asc
    assert (out["cherry"]["df"], out["cherry"]["cf"]) == (2, 3)
    assert out["cherry"]["postings"] == "3:2,2:1"


def test_build_postings_salt_count_is_invisible(spark):
    """The salted two-stage merge is exact: any n_salts yields the
    identical index (df, cf, AND posting heads)."""
    from python_web_scraper_cleaner_spark.operators.search import (
        build_postings)
    docs = spark.createDataFrame(
        [(i, " ".join(["the"] * (1 + i % 4) + [f"w{i % 7}", "corpus"]))
         for i in range(40)],
        "doc_id long, text string")
    base = sorted(build_postings(docs, k=3, n_salts=1).collect())
    for s in (2, 5, 16):
        assert sorted(build_postings(docs, k=3, n_salts=s).collect()) \
            == base
    the = {r["tok"]: r for r in base}["the"]
    assert the["df"] == 40 and the["cf"] == sum(1 + i % 4
                                                for i in range(40))


def test_postings_lookup_ranks_by_matched_then_score(spark):
    """Serve from the built heads: docs matching more query terms beat
    higher-tf single-term docs; ties rank by summed tf then id; a doc
    outside every queried head cannot surface."""
    from python_web_scraper_cleaner_spark.operators.search import (
        posting_heads, postings_lookup)
    docs = spark.createDataFrame(
        [(1, "data spark spark"),      # in spark head (tf 2) + data tf 1
         (2, "data data data"),        # data head only, tf 3
         (3, "spark data data"),       # both heads: data tf 2, spark tf 1
         (4, "other words only"),
         (5, "data")],
        "doc_id long, text string")
    heads = posting_heads(docs, k=2, n_salts=3)
    got = postings_lookup(heads, ["data", "SPARK"], k=10).collect()
    ids = [r["id"] for r in got]
    # data's k=2 head = docs 2,3 (tf 3,2) — docs 1 and 5 (tf 1) fall
    # outside it; spark's head = docs 1,3. Two-term doc 3 leads; the
    # tf-3 single-term doc 2 beats doc 1's spark-only tf 2.
    assert ids == [3, 2, 1]
    assert [(r["matched"], r["score"]) for r in got] == [
        (2, 3), (1, 3), (1, 2)]
    assert 4 not in ids and 5 not in ids


def test_build_postings_string_doc_ids(spark):
    """The salt is type-agnostic (pmod(xxhash64)): string doc ids — the
    natural key for a web corpus — keep the per-salt bound instead of
    collapsing into one NULL salt (or aborting under ANSI)."""
    from python_web_scraper_cleaner_spark.operators.search import (
        build_postings)
    docs = spark.createDataFrame(
        [(f"https://h{i}.example/p", "common w" + str(i % 3))
         for i in range(12)],
        "doc_id string, text string")
    out = {r["tok"]: r for r in build_postings(
        docs, k=3, n_salts=4, id_col="doc_id").collect()}
    assert out["common"]["df"] == 12 and out["common"]["cf"] == 12
    # head is (tf desc, id asc): ties on tf=1 break by string id order
    assert out["common"]["postings"].startswith("https://h0.example/p:1")


def test_merge_posting_heads_equals_full_build(spark):
    """The exactness claim, unit-sized: merge(build(A), build(B)) is
    bit-identical to build(A ∪ B) for disjoint doc sets, any salt
    count, k ≤ build k."""
    from python_web_scraper_cleaner_spark.operators.search import (
        build_postings, format_posting_heads, merge_posting_heads,
        posting_heads)
    rows = [(i, " ".join(["the"] * (1 + i % 3) + [f"w{i % 5}", "all"]))
            for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")
    merged = format_posting_heads(merge_posting_heads(
        posting_heads(a, k=3, n_salts=4),
        posting_heads(b, k=3, n_salts=2), k=3))
    assert sorted(merged.collect()) == \
        sorted(build_postings(docs, k=3).collect())


def test_retract_from_postings_exact_df_cf_and_tombstones(spark):
    """Retraction: df/cf drop exactly, removed ids vanish from heads
    with NO backfill (capped-head tombstone), all-doc tokens drop."""
    from python_web_scraper_cleaner_spark.operators.search import (
        format_posting_heads, posting_heads, retract_from_postings)
    docs = spark.createDataFrame(
        [(1, "apple banana apple gone"),
         (2, "banana banana cherry"),
         (3, "apple cherry cherry"),
         (4, "banana gone")],
        "doc_id long, text string")
    heads = posting_heads(docs, k=2)
    removed = docs.filter("doc_id in (1, 4)")
    out = {r["tok"]: r for r in format_posting_heads(
        retract_from_postings(heads, removed)).collect()}
    # 'gone' appeared only in removed docs -> df 0 -> dropped entirely
    assert set(out) == {"apple", "banana", "cherry"}
    assert (out["apple"]["df"], out["apple"]["cf"]) == (1, 1)
    assert out["apple"]["postings"] == "3:1"
    # banana head was [2:2, 1:1] at k=2; doc 1 stripped, doc 4 was
    # outside the stored head so it is NOT backfilled — but df/cf count
    # it exactly
    assert (out["banana"]["df"], out["banana"]["cf"]) == (1, 2)
    assert out["banana"]["postings"] == "2:2"
    # untouched token passes through the null side of the left join
    assert (out["cherry"]["df"], out["cherry"]["cf"]) == (2, 3)
    assert out["cherry"]["postings"] == "3:2,2:1"


def test_retract_entire_head_leaves_empty_postings(spark):
    """A token whose whole stored head is retracted keeps df>0 (other
    docs exist beyond the cap) with an empty head — the compaction
    trigger a deployment watches for."""
    from python_web_scraper_cleaner_spark.operators.search import (
        format_posting_heads, posting_heads, retract_from_postings)
    docs = spark.createDataFrame(
        [(i, "word " * (10 - i)) for i in range(1, 6)],
        "doc_id long, text string")
    heads = posting_heads(docs, k=2)  # head = docs 1,2
    out = format_posting_heads(
        retract_from_postings(heads, docs.filter("doc_id in (1, 2)"))
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["tok"], r["df"], r["postings"]) == ("word", 3, "")


def test_compact_postings_restores_decayed_heads(spark):
    """The lifecycle identity, unit-sized: retract shrinks heads,
    compact rebuilds exactly build(surviving) — including backfilling a
    survivor that the capped head had excluded."""
    from python_web_scraper_cleaner_spark.operators.search import (
        build_postings, compact_postings, format_posting_heads,
        posting_heads, retract_from_postings)
    docs = spark.createDataFrame(
        [(i, ("word " * (10 - i)) + ("other " if i % 2 else ""))
         for i in range(1, 6)],
        "doc_id long, text string")
    removed = docs.filter("doc_id in (1, 2)")
    surviving = docs.filter("doc_id not in (1, 2)")
    compacted = format_posting_heads(compact_postings(
        retract_from_postings(posting_heads(docs, k=2), removed),
        surviving, k=2))
    out = {r["tok"]: r for r in compacted.collect()}
    # 'word': stored head was docs 1,2 — BOTH retracted, head decayed
    # to [] with df=3 > 0, so compaction must rebuild (backfilling docs
    # 3,4 which the capped head had excluded)
    assert (out["word"]["df"], out["word"]["postings"]) == (3, "3:7,4:6")
    # 'other' (docs 1,3,5): head [1:1,3:1] decayed to [3:1] but df=2
    # still exceeds depth 1 -> rebuilt to the true surviving head
    assert (out["other"]["df"], out["other"]["postings"]) == (2, "3:1,5:1")
    # and the full lifecycle identity
    assert sorted(compacted.collect()) == \
        sorted(build_postings(surviving, k=2).collect())


def test_postings_lookup_bm25_scores_and_head_cap(spark):
    """Hand corpus: the fixed-point RSJ idf weighting is exact, rare
    terms outweigh common ones, and candidates still come only from the
    stored heads (impact-order approximation)."""
    from pyspark.sql import functions as F
    from python_web_scraper_cleaner_spark.operators.search import (
        posting_heads, postings_lookup_bm25)
    docs = spark.createDataFrame(
        [(1, "common rare"),
         (2, "common common"),
         (3, "common"),
         (4, "filler")],
        "doc_id long, text string")
    stats = docs.agg(F.count("*").alias("n"))  # n = 4

    def idf(df):  # mirrors the operator's integer formula, scale=10
        return (10 * (2 * 4 - 2 * df + 1)) // (2 * df + 1)

    out = {r["id"]: r["score"] for r in postings_lookup_bm25(
        posting_heads(docs, k=8), ["common", "rare"], stats,
        k=10, scale=10).collect()}
    # df(common)=3, df(rare)=1 -> idf 4 vs 23: doc 1 (1 common + 1
    # rare) must beat doc 2 (2 common)
    assert out == {1: idf(3) + idf(1), 2: 2 * idf(3), 3: idf(3)}
    assert out[1] > out[2]
    # k=1 heads: common's head is doc 2 (tf 2); docs 1,3 fall outside
    # and can only surface through rare's head
    capped = {r["id"]: r["score"] for r in postings_lookup_bm25(
        posting_heads(docs, k=1), ["common", "rare"], stats,
        k=10, scale=10).collect()}
    assert capped == {2: 2 * idf(3), 1: idf(1)}
