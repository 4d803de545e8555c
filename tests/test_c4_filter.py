"""C4 line-level cleaning (operators/textstats.c4_quality_filter vs the
kernel twin functions/kernel.c4_clean): rule-class unit checks on the
kernel, exhaustive Spark/kernel parity over the extracted pages corpus
with contamination lines that make every rule fire."""

from python_web_scraper_cleaner_spark.functions.kernel import c4_clean


def test_kernel_structural_gates():
    t = ("A good long sentence with plenty of words here.\n"
         "short one.\n"                      # < 5 words
         "no terminal punctuation at all\n"  # no end mark
         "This line trails off with an ellipsis and is dropped...\n"
         "   \n"                             # blank
         'He said "a quoted ending counts as terminal."\n'
         "One more full sentence to clear the threshold today!")
    r = c4_clean(t)
    assert r["n_lines"] == 7
    assert r["n_cand"] == 3 == r["n_kept"]
    assert r["n_sentences"] == 3  # the ["] line still carries one [.]
    assert r["kept"] is True


def test_kernel_page_drops_and_line_drops():
    base = ("First full sentence with enough words here.\n"
            "Second full sentence with enough words too.\n"
            "Third full sentence closes out the minimum.")
    # lorem ipsum on a CANDIDATE line drops the page
    r = c4_clean(base + "\nlorem ipsum dolor sit amet today.")
    assert r["kept"] is False and r["n_kept"] == 0
    # brace on a candidate line drops the page
    r = c4_clean(base + "\nWe log data = { page: 1 } daily.")
    assert r["kept"] is False
    # brace on a NON-candidate line (no end mark) never reaches the check
    r = c4_clean(base + "\nfunction f() { return 1 }")
    assert r["kept"] is True and r["n_kept"] == 3
    # javascript / policy lines drop the LINE only
    r = c4_clean(base + "\nPlease enable javascript to read this article."
                 + "\nThis website uses cookies to improve your experience.")
    assert r["kept"] is True and r["n_kept"] == 3
    # a brace on a javascript line is shadowed by the javascript skip
    r = c4_clean(base + "\nEnable javascript objects like { this } today.")
    assert r["kept"] is True and r["n_kept"] == 3


def test_kernel_sentence_threshold():
    two = ("First full sentence with enough words here.\n"
           "Second full sentence with enough words too.")
    r = c4_clean(two)
    assert r["n_kept"] == 2 and r["n_sentences"] == 2
    assert r["kept"] is False and r["clean_text"] == ""
    # abbreviation dots count toward the [.!?] approximation — documented
    r = c4_clean("One line with e.g. several marks inside it today.")
    assert r["n_sentences"] == 3 and r["kept"] is True


def test_spark_parity_over_extracted_pages(spark):
    from python_web_scraper_cleaner_spark.functions.kernel import clean_html
    from python_web_scraper_cleaner_spark.operators.textstats import (
        c4_quality_filter)
    from python_web_scraper_cleaner_spark.sources.pages import pages_local

    contam = {
        3: "\nlorem ipsum dolor sit amet today.",
        5: "\nPlease enable javascript to continue reading this article.",
        7: "\nWe log data = { page: 1 } daily.",
        9: "\nThis website uses cookies to improve your browsing experience.",
    }
    rows, expected = [], {}
    for i, page in enumerate(pages_local(300)):
        out = clean_html(page["html"], output_format="txt")
        if not out.ok:
            continue
        text = out.text + contam.get(i % 11, "")
        if i % 13 == 4:
            text += "\nRead more..."
        rows.append((i, text))
        r = c4_clean(text)
        expected[i] = (r["n_lines"], r["n_cand"], r["n_kept"],
                       r["n_sentences"], int(r["kept"]))

    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: (r["n_lines"], r["n_cand"], r["n_kept"],
                     r["n_sentences"], r["kept"])
           for r in c4_quality_filter(df).collect()}
    assert got == expected
    # the fixture must actually exercise the rules
    kept = [v[4] for v in expected.values()]
    assert 0 < sum(kept) < len(kept)
    assert any(v[1] != v[2] for v in expected.values())  # line drops fired


def test_spark_clean_text_matches_kernel(spark):
    from python_web_scraper_cleaner_spark.operators.textstats import (
        c4_quality_filter)
    texts = [
        "Alpha beta gamma delta epsilon sentence one.\n"
        "skip me\nSecond keeper sentence with enough words here!\n"
        "Third keeper sentence with enough words too?",
        "Only one short keeper sentence with words here.",  # < 3 sentences
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "id long, text string")
    got = {r["id"]: r["clean_text"]
           for r in c4_quality_filter(df, keep_text=True).collect()}
    for i, t in enumerate(texts):
        assert got[i] == c4_clean(t)["clean_text"]
