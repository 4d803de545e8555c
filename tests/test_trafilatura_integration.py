"""Real-trafilatura integration (conditional) + extractor-contract tests.

SURVEY F3: the engine uses real trafilatura 2.0.0 when importable and the
stdlib extractor otherwise. The sandbox has no trafilatura, so the live
test skips here — it exists to catch signature drift in the pluggable
``extract_fn`` wiring before a production deploy (the reference's exact
call: /root/reference/scraper_cleaner/html_cleaner_core.py:85-91 with
output_format / include_tables / include_comments / with_metadata kwargs).

The kwargs-forwarding contract itself is verified unconditionally with a
fake trafilatura module (the reference's own test strategy — its suite
monkeypatches trafilatura.extract, tests/test_html_cleaner.py:46-64).
"""

import sys
import types

import pytest

from python_web_scraper_cleaner_spark.functions import kernel as K

_HTML = ("<html><head><title>T</title></head>"
         "<body><p>Alpha beta gamma delta epsilon.</p>"
         "<p>Second paragraph with more words.</p></body></html>")


def test_real_trafilatura_branch_when_importable():
    """Runs only where trafilatura is installed (production image)."""
    pytest.importorskip("trafilatura")
    fn = K._trafilatura_extract_or_none()
    assert fn is not None
    # the exact call shape clean_html uses (html_cleaner_core.py:85-91)
    out = fn(_HTML, output_format="txt", include_tables=True,
             include_comments=False, with_metadata=False)
    assert out and "Alpha beta gamma" in out
    # end-to-end through the CleanResult envelope
    prev = K.get_extractor()
    try:
        K.set_extractor(fn)
        res = K.clean_html(_HTML.encode(), output_format="txt")
        assert res.ok and res.error is None
        assert res.text.endswith("\n") and not res.text.endswith("\n\n")
        assert res.extracted_chars == len(res.text)
    finally:
        K.set_extractor(prev)


def test_trafilatura_wiring_forwards_exact_kwargs(monkeypatch):
    """Contract test without the real lib: a fake trafilatura module
    records the kwargs the wiring passes — they must match the
    reference's call (html_cleaner_core.py:85-91) byte for byte."""
    calls = []

    def fake_extract(html_text, **kwargs):
        calls.append((html_text, kwargs))
        return "extracted body text"

    fake = types.ModuleType("trafilatura")
    fake.extract = fake_extract
    monkeypatch.setitem(sys.modules, "trafilatura", fake)

    fn = K._trafilatura_extract_or_none()
    assert fn is not None
    out = fn(_HTML, output_format="markdown", include_tables=False,
             include_comments=True, with_metadata=False)
    assert out == "extracted body text"
    html_arg, kwargs = calls[0]
    assert html_arg == _HTML
    assert kwargs == {"output_format": "markdown", "include_tables": False,
                      "include_comments": True, "with_metadata": False}

    # and through the public extract_text entry (the UDF path)
    prev = K.get_extractor()
    try:
        K.set_extractor(fn)
        K.extract_text(_HTML, output_format="txt", include_tables=True,
                       include_comments=False)
        _, kwargs2 = calls[-1]
        assert kwargs2 == {"output_format": "txt", "include_tables": True,
                           "include_comments": False, "with_metadata": False}
    finally:
        K.set_extractor(prev)


def test_trafilatura_wiring_metadata_call_shape(monkeypatch):
    """F4 contract: the metadata-extraction call shape of the reference
    (trafilatura_scraper.py:58-66) — output_format='json',
    with_metadata=True, include_comments=False, include_tables=True,
    include_images=False, include_links=False — must forward through the
    seam byte for byte, so a production deploy with the real wheel makes
    the exact reference call."""
    calls = []

    def fake_extract(html_text, **kwargs):
        calls.append(kwargs)
        return '{"title": "T"}'

    fake = types.ModuleType("trafilatura")
    fake.extract = fake_extract
    monkeypatch.setitem(sys.modules, "trafilatura", fake)

    fn = K._trafilatura_extract_or_none()
    out = fn(_HTML, output_format="json", with_metadata=True,
             include_comments=False, include_tables=True,
             include_images=False, include_links=False)
    assert out == '{"title": "T"}'
    assert calls[0] == {"output_format": "json", "with_metadata": True,
                        "include_comments": False, "include_tables": True,
                        "include_images": False, "include_links": False}
    # the clean-text call (with_metadata=False) must NOT grow the extra
    # kwargs — html_cleaner_core.py:85-91 passes exactly four
    fn(_HTML, output_format="txt", include_tables=True,
       include_comments=False, with_metadata=False)
    assert calls[1] == {"output_format": "txt", "include_tables": True,
                        "include_comments": False, "with_metadata": False}
