"""Gopher repetition signals (operators/textstats.ngram_repetition)."""

from python_web_scraper_cleaner_spark.operators import textstats as TS


def _run(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "id long, text string")
    return TS.ngram_repetition(df, "id", "text", **kw).collect()[0]


def test_repetition_known_values(spark):
    # tokens: a b a b a b c → 2-grams: 'a b'×3, 'b a'×2, 'b c'×1
    # top2 mass = 3·len('a b') = 9; chars = 13
    # 3-grams: 'a b a'×2, 'b a b'×2, 'a b c'×1 → dup3 = 2·5 + 2·5 = 20
    r = _run(spark, "a b a b a b c")
    assert r.top2gram_char_frac == round(9 / 13, 4)
    assert r.dup3gram_char_frac == round(20 / 13, 4)


def test_repetition_no_dups_is_zero(spark):
    r = _run(spark, "one two three four five")
    assert r.dup3gram_char_frac == 0.0
    # every 2-gram unique: top mass = single occurrence of longest 2-gram
    assert 0 < r.top2gram_char_frac < 1


def test_repetition_short_doc_single_gram(spark):
    # fewer tokens than n → one whole-text gram, count 1
    r = _run(spark, "hello")
    assert r.dup3gram_char_frac == 0.0
    assert r.top2gram_char_frac == 1.0


def test_repetition_pure_spam_saturates(spark):
    r = _run(spark, "spam spam spam spam spam spam spam spam")
    # all 2-grams identical: top mass = 7 runs × 9 chars ≈>> n_chars
    assert r.top2gram_char_frac > 1.0
    assert r.dup3gram_char_frac > 1.0


# ---------------------------------------------------------------------------
# trigram-LM familiarity (textstats.trigram_lm_train / lm_familiarity)
# ---------------------------------------------------------------------------


def test_lm_familiarity_hand_computed(spark):
    from python_web_scraper_cleaner_spark.operators.textstats import (
        LM_SCALE, lm_familiarity, trigram_lm_train)
    ref = spark.createDataFrame([(0, "aaab")], "doc_id long, text string")
    model = trigram_lm_train(ref)               # {aaa:1, aab:1}, total 2
    docs = spark.createDataFrame(
        [(1, "aaaa"),   # trigrams aaa,aaa -> mass 2, n 2 -> SCALE/2
         (2, "zzzz"),   # all out-of-vocab -> 0
         (3, "ab")],    # too short -> n_trigrams 0, familiarity 0
        "doc_id long, text string")
    got = {r.id: r for r in lm_familiarity(docs, model).collect()}
    assert (got[1].n_trigrams, got[1].familiarity_fp) == (2, LM_SCALE // 2)
    assert (got[2].n_trigrams, got[2].familiarity_fp) == (2, 0)
    assert (got[3].n_trigrams, got[3].familiarity_fp) == (0, 0)


def test_lm_familiarity_oov_drags_score_down(spark):
    from python_web_scraper_cleaner_spark.operators.textstats import (
        lm_familiarity, trigram_lm_train)
    ref = spark.createDataFrame([(0, "the cat sat on the mat")],
                                "doc_id long, text string")
    model = trigram_lm_train(ref)
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat sat qqxqzj")],
        "doc_id long, text string")
    got = {r.id: r.familiarity_fp for r in
           lm_familiarity(docs, model).collect()}
    assert got[1] > got[2] > 0


def test_dsir_weights_hand_computed(spark):
    """DSIR importance weight = target-familiarity / background-
    familiarity in LM_SCALE fixed point; keep_bp proportional, capped
    at certainty."""
    from python_web_scraper_cleaner_spark.operators.textstats import (
        LM_SCALE, dsir_weights, trigram_lm_train)
    target = spark.createDataFrame([(0, "aaab")],
                                   "doc_id long, text string")
    background = spark.createDataFrame([(0, "aaab"), (1, "zzzz")],
                                       "doc_id long, text string")
    tm = trigram_lm_train(target)      # {aaa:1, aab:1}, total 2
    bm = trigram_lm_train(background)  # {aaa:1, aab:1, zzz:2}, total 4
    docs = spark.createDataFrame(
        [(1, "aaaa"),    # target-like: fam_t SCALE/2, fam_b SCALE/4
         (2, "zzzz"),    # background-only: fam_t 0 -> weight 0
         (3, "qq")],     # no trigrams -> everything 0
        "doc_id long, text string")
    got = {r.id: r for r in dsir_weights(docs, tm, bm).collect()}

    r1 = got[1]
    assert r1.fam_target_fp == LM_SCALE // 2
    assert r1.fam_background_fp == LM_SCALE // 4
    assert r1.weight_fp == (LM_SCALE * (LM_SCALE // 2)) \
        // (LM_SCALE // 4 + 1)
    assert r1.keep_bp == 10000          # weight ~2.0 -> capped certainty
    assert r1.sampled

    assert got[2].weight_fp == 0 and got[2].keep_bp == 0
    assert not got[2].sampled
    assert got[3].n_trigrams == 0 and got[3].keep_bp == 0


def test_dsir_keep_rate_tracks_weight(spark):
    """A sub-unit weight keeps ~weight fraction of docs (md5-bp draw):
    docs half-target half-noise get keep_bp strictly between 0 and
    10000, and the realized keep rate lands near keep_bp/10000."""
    from python_web_scraper_cleaner_spark.operators.textstats import (
        dsir_weights, trigram_lm_train)
    import pyspark.sql.functions as F
    target = spark.createDataFrame([(0, "abcdefgh" * 4)],
                                   "doc_id long, text string")
    noise = "zq" * 16
    background = spark.createDataFrame(
        [(0, "abcdefgh" * 4), (1, noise), (2, noise), (3, noise)],
        "doc_id long, text string")
    docs = spark.createDataFrame([(i, "abcdefgh" + noise)
                                  for i in range(400)],
                                 "doc_id long, text string")
    out = dsir_weights(docs, trigram_lm_train(target),
                       trigram_lm_train(background))
    row = out.agg(F.min("keep_bp").alias("lo"),
                  F.max("keep_bp").alias("hi"),
                  F.avg(F.col("sampled").cast("int")).alias("rate")
                  ).collect()[0]
    assert row.lo == row.hi and 0 < row.lo < 10000  # same text, same bp
    assert abs(row.rate - row.lo / 10000) < 0.12
