"""Property-based tests (hypothesis) for the pure-Python kernel — the
functions shipped inside every pandas UDF. Invariants, not examples:
whatever bytes arrive from a 100 TB crawl, these must hold.
"""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from python_web_scraper_cleaner_spark.functions import kernel as K

text_st = st.text(max_size=400)
messy_text_st = st.text(
    alphabet=st.characters(codec="utf-8"), max_size=400)


@settings(max_examples=200, deadline=None)
@given(messy_text_st)
def test_normalize_text_invariants(s):
    out = K.normalize_text(s)
    assert K.normalize_text(out) == out                 # idempotent
    assert "\r" not in out
    if out != "\n":
        assert out.endswith("\n") and not out.endswith("\n\n")
    assert "\n\n\n\n" not in out                        # blank runs ≤ 2
    for line in out.split("\n"):
        assert line == line.rstrip()                    # no trailing ws


@settings(max_examples=200, deadline=None)
@given(messy_text_st)
def test_normalize_markdown_invariants(s):
    out = K.normalize_markdown(s)
    assert K.normalize_markdown(out) == out
    assert "\r" not in out
    assert out.endswith("\n")


@settings(max_examples=200, deadline=None)
@given(st.one_of(st.none(), messy_text_st))
def test_slugify_invariants(s):
    slug = K.slugify(s)
    assert 0 < len(slug) <= 100
    assert " " not in slug and "-" not in slug
    assert slug == slug.lower() or not slug.isascii()   # ascii part lowered
    assert not slug.startswith("_") and not slug.endswith("_")
    assert K.slugify(slug) in (slug, "untitled")        # near-idempotent


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
               min_size=1, max_size=120))
def test_canonicalize_url_idempotent(s):
    url = "https://Example.COM:443/" + s
    canon = K.canonicalize_url(url)
    assert K.canonicalize_url(canon) == canon
    host = re.match(r"^[a-z][a-z0-9+.-]*://([^/?#]*)", canon)
    assert host and host.group(1) == host.group(1).lower()


@settings(max_examples=300, deadline=None)
@given(messy_text_st)
def test_parse_robots_never_raises(s):
    rules = K.parse_robots_txt(s)
    assert set(rules) == {"disallow_prefixes", "allow_prefixes",
                          "crawl_delay_ms"}
    assert rules["crawl_delay_ms"] >= 0
    # decision function total over arbitrary paths
    assert K.robots_allows("/", rules) in (True, False)


@settings(max_examples=100, deadline=None)
@given(messy_text_st)
def test_reflow_preserves_nonspace_content(s):
    out = K.reflow_text_to_markdown_paragraphs(s)
    strip = lambda t: re.sub(r"\s+", "", t)
    assert strip(out) == strip(s)


@settings(max_examples=100, deadline=None)
@given(text_st)
def test_fingerprint_and_simhash_deterministic(s):
    assert K.fingerprint64(s) == K.fingerprint64(s)
    assert 0 <= K.simhash32(s) < 2 ** 32
    assert K.lang_id(s) in set(K.LANG_MARKERS) | {"und"}


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200), st.integers(min_value=1, max_value=5))
def test_shingles_cover_tokens(s, k):
    sh = K.shingles(s, k)
    toks = s.lower().strip().split()
    if toks:
        assert len(sh) >= 1
        # every token appears in at least one shingle
        joined = " ".join(sh)
        for t in toks:
            assert t in joined


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=600))
def test_parse_warc_segment_never_raises(blob):
    from python_web_scraper_cleaner_spark.sources.warc import (
        parse_warc_segment)
    recs = parse_warc_segment(blob)
    for idx, url, ts, status, html in recs:
        assert isinstance(url, str) and isinstance(html, bytes)
        assert isinstance(status, int)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400), st.binary(max_size=300))
def test_warc_roundtrip_arbitrary_payload(payload, junk_tail):
    """Any payload bytes — including ones that LOOK like WARC headers —
    survive the write→parse round trip intact; junk after the last record
    never corrupts the parsed ones."""
    from python_web_scraper_cleaner_spark.sources.warc import (
        build_warc_record, parse_warc_segment)
    seg = build_warc_record("http://x.example/p", "2026-06-01T00:00:00Z",
                            payload) + junk_tail
    recs = parse_warc_segment(seg)
    assert recs and recs[0][4] == payload


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=400), st.binary(max_size=120))
def test_warc_gzip_roundtrip_and_corrupt_tail(payload, junk_tail):
    """Gzip-member framing: any payload survives compress→parse; junk
    appended after the last member (including bytes starting 0x1f8b)
    degrades — already-inflated records still parse, never an exception
    or a hang."""
    from python_web_scraper_cleaner_spark.sources.warc import (
        build_warc_record, gzip_member, parse_warc_segment)
    rec = gzip_member(build_warc_record(
        "http://x.example/p", "2026-06-01T00:00:00Z", payload))
    recs = parse_warc_segment(rec + junk_tail)
    assert recs and recs[0][4] == payload
    # truncated member: the complete first member still parses
    recs2 = parse_warc_segment(rec + rec[:-7])
    assert recs2 and recs2[0][4] == payload


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=600))
def test_parse_warc_gzip_prefix_never_raises(blob):
    """Arbitrary bytes behind a gzip magic prefix must never raise or
    loop: the member walk stops at the first undecodable member."""
    from python_web_scraper_cleaner_spark.sources.warc import (
        parse_warc_segment)
    for idx, url, ts, status, html in parse_warc_segment(
            b"\x1f\x8b" + blob):
        assert isinstance(html, bytes)


@settings(max_examples=200, deadline=None)
@given(messy_text_st, st.text(max_size=80))
def test_extract_anchors_never_raises(html, base):
    out = K.extract_anchors(html, base)
    for url, anchor in out:
        assert url.startswith(("http://", "https://"))
        assert "\n" not in anchor and "  " not in anchor  # ws-normalized
