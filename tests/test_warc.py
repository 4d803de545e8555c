"""WARC source (sources/warc.py): record writer/parser round trip,
length-delimited robustness, Spark segment explode."""

from python_web_scraper_cleaner_spark.sources.warc import (
    build_warc_record, build_warcinfo, parse_warc_segment,
    synthesize_warc_segments, warc_records)

TS = "2026-06-01T00:00:00Z"


def test_roundtrip_payload_containing_warc_header_bytes():
    # a page QUOTING a warc header must not split the record (the naive
    # regex-splitter failure mode) — Content-Length delimits, not content
    sneaky = b"<html>WARC/1.0\r\nWARC-Type: response\r\n\r\nquoted</html>"
    seg = (build_warcinfo(0)
           + build_warc_record("http://a.example/1", TS, sneaky)
           + build_warc_record("http://a.example/2", TS, b"<html>b</html>",
                               status=404))
    recs = parse_warc_segment(seg)
    assert [(r[1], r[3]) for r in recs] == [("http://a.example/1", 200),
                                            ("http://a.example/2", 404)]
    assert recs[0][4] == sneaky


def test_truncated_tail_drops_partial_record_only():
    seg = (build_warc_record("http://a.example/1", TS, b"<html>x</html>")
           + build_warc_record("http://a.example/2", TS, b"<html>y</html>"))
    recs = parse_warc_segment(seg[:-10])
    assert len(recs) == 1 and recs[0][1] == "http://a.example/1"


def test_garbage_and_bad_content_length_stop_cleanly():
    assert parse_warc_segment(b"not a warc at all") == []
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: zzz\r\n\r\nbody")
    assert parse_warc_segment(bad) == []


def test_negative_content_length_terminates():
    # a record declaring a NEGATIVE length would rewind the cursor onto
    # its own header — before the guard this looped forever (or appended
    # duplicate rows unboundedly if the rewind hit an earlier record)
    evil = (b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://a.example/evil\r\n"
            b"Content-Length: -33\r\n\r\n")
    assert parse_warc_segment(evil) == []
    # a good record BEFORE the corrupt one still parses (degrade, not fail)
    seg = build_warc_record("http://a.example/1", TS,
                            b"<html>x</html>") + evil
    recs = parse_warc_segment(seg)
    assert [(r[1], r[3]) for r in recs] == [("http://a.example/1", 200)]


def test_non_response_records_are_skipped_but_consumed():
    seg = (build_warcinfo(7)
           + build_warc_record("http://a.example/1", TS, b"<html>x</html>"))
    recs = parse_warc_segment(seg)
    assert len(recs) == 1
    assert recs[0][0] == 1  # warcinfo consumed rec_idx 0


def test_gzip_member_framing_roundtrip():
    """Per-record gzip members (the real Common Crawl layout) parse to
    the identical record list as the plain framing; a corrupt middle
    member degrades to the records before it."""
    from python_web_scraper_cleaner_spark.sources.warc import (
        _gunzip_members, gzip_member)
    recs_plain = [build_warcinfo(0),
                  build_warc_record("http://a.example/1", TS,
                                    b"<html>x</html>"),
                  build_warc_record("http://a.example/2", TS,
                                    b"<html>y</html>", status=404)]
    gz = b"".join(gzip_member(r) for r in recs_plain)
    assert parse_warc_segment(gz) == parse_warc_segment(b"".join(recs_plain))
    # inflation is lossless
    assert _gunzip_members(gz) == b"".join(recs_plain)
    # corrupt the SECOND member's deflate stream: record 1 still parses
    m0 = gzip_member(recs_plain[0]) + gzip_member(recs_plain[1])
    m1 = bytearray(gzip_member(recs_plain[2]))
    m1[12] ^= 0xFF
    recs = parse_warc_segment(m0 + bytes(m1))
    assert [(r[1], r[3]) for r in recs] == [("http://a.example/1", 200)]


def test_spark_gzip_segments_match_plain(spark):
    from python_web_scraper_cleaner_spark.sources.warc import (
        synthesize_warc_segments)
    plain = warc_records(synthesize_warc_segments(
        spark, 80, pages_per_segment=40)).orderBy("segment_id", "rec_idx")
    gz = warc_records(synthesize_warc_segments(
        spark, 80, pages_per_segment=40, gzip_members=True)) \
        .orderBy("segment_id", "rec_idx")
    assert [tuple(r) for r in plain.collect()] == \
           [tuple(r) for r in gz.collect()]


def test_spark_segments_roundtrip_counts(spark):
    segs = synthesize_warc_segments(spark, 120, pages_per_segment=40)
    recs = warc_records(segs)
    assert recs.count() == 120
    by_seg = {r.segment_id: r.n for r in
              recs.groupBy("segment_id").count()
              .withColumnRenamed("count", "n").collect()}
    assert by_seg == {0: 40, 1: 40, 2: 40}
    urls = recs.select("url").distinct().count()
    assert urls == 120


def test_wet_conversion_record_roundtrip():
    from python_web_scraper_cleaner_spark.sources.warc import (
        build_warc_record, build_wet_record, parse_warc_segment)
    wet = build_wet_record("http://a.example/1", "2026-06-01T00:00:00Z",
                           "hello\nworld WARC/1.0\r\n\r\n quoted")
    # conversion parse returns the body verbatim even when it quotes
    # warc header bytes (the length-delimited guarantee)
    recs = parse_warc_segment(wet, record_type="conversion")
    assert len(recs) == 1
    idx, url, ts, status, body = recs[0]
    assert body.decode() == "hello\nworld WARC/1.0\r\n\r\n quoted"
    assert status == 0 and url == "http://a.example/1"
    # a response record in the same stream is skipped by the
    # conversion parse and vice versa
    mixed = build_warc_record("http://a.example/2", ts, b"<p>x</p>") + wet
    assert len(parse_warc_segment(mixed, record_type="conversion")) == 1
    assert len(parse_warc_segment(mixed)) == 1
    assert parse_warc_segment(mixed)[0][1] == "http://a.example/2"


def test_wet_segments_exclude_failed_extractions(spark):
    from python_web_scraper_cleaner_spark.functions.kernel import clean_html
    from python_web_scraper_cleaner_spark.sources.pages import page_record
    from python_web_scraper_cleaner_spark.sources.warc import (
        synthesize_wet_segments, wet_records)
    n_ok = sum(clean_html(page_record(i)["html"], output_format="txt").ok
               for i in range(120))
    assert n_ok < 120  # the fixture must exercise the absent-record case
    recs = wet_records(synthesize_wet_segments(
        spark, 120, pages_per_segment=40))
    assert recs.count() == n_ok
    # texts are the kernel outputs byte-for-byte
    got = {r.url: r.text for r in recs.collect()}
    for i in range(120):
        page = page_record(i)
        out = clean_html(page["html"], output_format="txt")
        if out.ok:
            assert got[page["url"]] == out.text
        else:
            assert page["url"] not in got


def test_wet_gzip_members_match_plain(spark):
    from python_web_scraper_cleaner_spark.sources.warc import (
        synthesize_wet_segments, wet_records)
    plain = wet_records(synthesize_wet_segments(
        spark, 80, pages_per_segment=40)).orderBy("segment_id", "rec_idx")
    gz = wet_records(synthesize_wet_segments(
        spark, 80, pages_per_segment=40, gzip_members=True)) \
        .orderBy("segment_id", "rec_idx")
    assert [tuple(r) for r in plain.collect()] == \
           [tuple(r) for r in gz.collect()]


# ---------------------------------------------------------------------------
# WAT (metadata JSON link records) — the third Common Crawl file
# ---------------------------------------------------------------------------

def test_wat_record_roundtrip_and_json_shape():
    import json

    from python_web_scraper_cleaner_spark.sources.warc import (
        build_wat_record, wat_records)  # noqa: F401 (import surface)
    links = ["https://b.example/x", "https://c.example/y"]
    rec = build_wat_record("http://a.example/1", TS, links)
    parsed = parse_warc_segment(build_warcinfo(0) + rec,
                                record_type="metadata")
    assert len(parsed) == 1
    idx, url, ts, _status, body = parsed[0]
    assert url == "http://a.example/1" and ts == TS
    env = json.loads(body)
    got = [e["url"] for e in env["Envelope"]["Payload-Metadata"]
           ["HTTP-Response-Metadata"]["HTML-Metadata"]["Links"]]
    assert got == links
    # response parse of the same segment finds nothing (type filter works)
    assert parse_warc_segment(build_warcinfo(0) + rec) == []


def test_wat_links_match_kernel_extractor(spark):
    # the full chain — write (gzip members) → parse → from_json → explode —
    # must reproduce exactly what kernel.extract_links sees per page
    from python_web_scraper_cleaner_spark.functions.kernel import (
        extract_links)
    from python_web_scraper_cleaner_spark.sources.pages import pages_local
    from python_web_scraper_cleaner_spark.sources.warc import (
        synthesize_wat_segments, wat_links, wat_records)

    n = 120
    segs = synthesize_wat_segments(spark, n, pages_per_segment=25,
                                   gzip_members=True)
    edges = wat_links(wat_records(segs)).collect()
    got = {}
    for r in edges:
        got.setdefault(r["src"], []).append(r["target"])
    expected = {}
    for page in pages_local(n):
        links = extract_links(page["html"], page["url"])
        if links:
            expected[page["url"]] = links
    assert set(got) == set(expected)
    for src, targets in expected.items():
        assert sorted(got[src]) == sorted(targets), src


def test_wat_corrupt_segment_degrades_not_raises(spark):
    import pandas as pd

    from python_web_scraper_cleaner_spark.sources.warc import (
        build_wat_record, wat_links, wat_records)
    good = build_warcinfo(0) + build_wat_record(
        "http://a.example/1", TS, ["https://b.example/x"])
    corrupt = good + b"WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 999999\r\n\r\ntrunc"
    segs = spark.createDataFrame(
        pd.DataFrame({"segment_id": [0], "wat": [corrupt]}))
    rows = wat_links(wat_records(segs)).collect()
    assert [(r["src"], r["target"]) for r in rows] == [
        ("http://a.example/1", "https://b.example/x")]
