"""M1 parity gate: Spark pandas-UDF extraction output must be byte-identical
per url to the single-node kernel loop (BASELINE.json input_hint invariant).
"""

import pytest

from python_web_scraper_cleaner_spark.functions import kernel as K
from python_web_scraper_cleaner_spark.functions.udfs import with_clean_text
from python_web_scraper_cleaner_spark.sources.pages import (
    pages_local, synthesize_pages)

N = 300


@pytest.fixture(scope="module")
def oracle():
    """Single-process reference pipeline: generate → clean, python loop."""
    out = {}
    for rec in pages_local(N):
        res = K.clean_html(rec["html"], output_format="txt")
        out[rec["url"]] = res
    return out


def test_generation_is_deterministic_across_paths(spark, oracle):
    rows = synthesize_pages(spark, N, partitions=7).collect()
    assert len(rows) == N
    local = {r["url"]: r for r in pages_local(N)}
    assert set(r["url"] for r in rows) == set(local)
    for r in rows:
        exp = local[r["url"]]
        assert bytes(r["html"]) == exp["html"], r["url"]
        assert r["lang"] == exp["lang"]
        assert r["warc_ts"].replace(tzinfo=None) == exp["warc_ts"].replace(tzinfo=None)


def test_spark_extraction_byte_identical_to_kernel_loop(spark, oracle):
    pages = synthesize_pages(spark, N, partitions=7)
    cleaned = with_clean_text(pages, output_format="txt").collect()
    assert len(cleaned) == N
    n_ok = 0
    for row in cleaned:
        exp = oracle[row["url"]]
        assert row["ok"] == exp.ok, row["url"]
        assert row["text"] == exp.text, row["url"]  # byte-identical
        assert row["extracted_chars"] == exp.extracted_chars
        if row["ok"]:
            n_ok += 1
        else:
            assert row["error"] == exp.error
    # the empty-body template must fail, everything else extracts ok
    assert n_ok == sum(1 for o in oracle.values() if o.ok)
    assert 0 < n_ok < N


def test_markdown_extraction_parity(spark):
    pages = synthesize_pages(spark, 100, partitions=5)
    cleaned = {r["url"]: r for r in
               with_clean_text(pages, output_format="markdown").collect()}
    for rec in pages_local(100):
        exp = K.clean_html(rec["html"], output_format="markdown")
        got = cleaned[rec["url"]]
        assert got["text"] == exp.text
        if exp.ok:
            assert got["text"].endswith("\n")


def test_html_dropped_after_extraction(spark):
    pages = synthesize_pages(spark, 10)
    cleaned = with_clean_text(pages)
    assert "html" not in cleaned.columns  # binary never crosses a shuffle
