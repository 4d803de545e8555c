"""Exact-substring dedup (operators/dedup.py:substring_dup_spans).

Pins the span arithmetic against hand-computed cases at k=3: a shared
k-token run reported at exactly its length, overlapping-window merging,
intra-document repeats counting toward min_count, disjoint runs staying
separate spans, and sub-k docs emitting nothing.
"""

from python_web_scraper_cleaner_spark.operators import dedup as D


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["id"]: r.asDict() for r in df.collect()}


def test_shared_run_reported_at_exact_length(spark):
    # docs share exactly the 5-token run "p q r s t"; every other window
    # is globally unique. Dup windows at positions {1,2,3} (doc 0) and
    # {3,4,5} (doc 1) merge into one span of max-min+k = 5 tokens.
    docs = _docs(spark, [
        (0, "p q r s t u v w x y"),
        (1, "m n p q r s t z1 z2"),
    ])
    out = _by_id(D.substring_dup_spans(docs, k=3))
    assert out[0]["dup_tokens"] == 5 and out[0]["n_spans"] == 1
    assert out[1]["dup_tokens"] == 5 and out[1]["n_spans"] == 1
    assert out[0]["n_tokens"] == 10
    assert abs(out[0]["dup_frac"] - 0.5) < 1e-9


def test_intra_doc_repeat_counts_toward_min_count(spark):
    # "a b c" occurs twice WITHIN one doc -> flagged with no second doc;
    # positions {1,4} merge (4-1 <= k) covering the whole 6-token text.
    docs = _docs(spark, [(0, "a b c a b c"), (1, "q w e r t y")])
    out = _by_id(D.substring_dup_spans(docs, k=3))
    assert set(out) == {0}
    assert out[0]["dup_tokens"] == 6 and out[0]["n_spans"] == 1
    assert out[0]["dup_frac"] == 1.0


def test_disjoint_runs_stay_separate_spans(spark):
    # "p q r" at positions 1 and 8 of each doc: gap 7 > k=3 -> two spans
    # of 3 tokens each, never bridged.
    docs = _docs(spark, [
        (0, "p q r g1 g2 g3 g4 p q r"),
        (1, "p q r h1 h2 h3 h4 p q r"),
    ])
    out = _by_id(D.substring_dup_spans(docs, k=3))
    for i in (0, 1):
        assert out[i]["dup_tokens"] == 6 and out[i]["n_spans"] == 2


def test_exact_copies_fully_covered(spark):
    docs = _docs(spark, [(0, "u v w x y z"), (1, "u v w x y z")])
    out = _by_id(D.substring_dup_spans(docs, k=3))
    assert out[0]["dup_frac"] == 1.0 and out[1]["dup_frac"] == 1.0


def test_sub_k_docs_emit_nothing(spark):
    # identical 2-token docs cannot contain a 3-token duplicate substring
    docs = _docs(spark, [(0, "x y"), (1, "x y"), (2, "a b c d e f")])
    assert D.substring_dup_spans(docs, k=3).count() == 0


def test_token_windows_positions_and_pruning(spark):
    w = D.token_windows(_docs(spark, [(0, "a b c d"), (1, "a b")]),
                        "doc_id", "text", 3).collect()
    assert {(r["id"], r["pos"]) for r in w} == {(0, 1), (0, 2)}


def test_reuse_windows_identical_results(spark):
    docs = _docs(spark, [
        (0, "p q r s t u v w x y"),
        (1, "m n p q r s t z1 z2"),
        (2, "a b c a b c"),
    ])
    base = sorted(map(tuple, D.substring_dup_spans(docs, k=3).collect()))
    reuse = sorted(map(tuple, D.substring_dup_spans(
        docs, k=3, reuse_windows=True).collect()))
    assert base == reuse


def test_degenerate_parameters_rejected(spark):
    import pytest
    docs = _docs(spark, [(0, "a b c")])
    with pytest.raises(ValueError, match="k must be >= 1"):
        D.token_windows(docs, "doc_id", "text", 0)
    with pytest.raises(ValueError, match="min_count < 2"):
        D.substring_dup_spans(docs, k=3, min_count=1)
