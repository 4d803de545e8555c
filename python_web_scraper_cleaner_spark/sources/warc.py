"""WARC segment source: synthesize + parse Common-Crawl-style archives.

The north-star input is "Common-Crawl-style web pages"; Common Crawl
ships WARC (ISO 28500) segment files. This module provides the missing
source format: a deterministic WARC writer (for fixtures — in production
the segments already exist in object storage) and a record parser that
turns opaque segment blobs into (url, warc_ts, html, status) rows.

Parsing is length-delimited, not regex-split: each record declares
``Content-Length``, so the parser never misfires on payload bytes that
happen to contain "WARC/1.0" (a real failure mode of naive splitters —
web pages QUOTE warc headers all the time). Malformed tails degrade to
a truncated-record skip, never an exception: one corrupt segment must
not fail a 100-TB scan.

Scale shape: segments are opaque ``binary`` cells processed by
``mapInPandas`` — one Arrow batch in, narrow rows out; the segment blob
itself never crosses an exchange, and record extraction is
embarrassingly parallel per segment (exactly how Common Crawl is laid
out: ~1 GB segment files, one task each). Record rows carry html as
binary for the downstream vectorized extraction stage.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARC_RECORD_SCHEMA = ("segment_id long, rec_idx int, url string, "
                      "warc_ts string, status int, html binary")


def build_warc_record(url: str, ts: str, html: bytes,
                      status: int = 200) -> bytes:
    """One WARC/1.0 response record with an HTTP/1.1 payload."""
    http = (f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: text/html\r\n\r\n").encode("ascii") + html
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(http)}\r\n\r\n").encode("ascii")
    return head + http + b"\r\n\r\n"


def build_warcinfo(segment_id: int) -> bytes:
    """Leading non-response record (real segments start with warcinfo);
    parsers must skip it."""
    body = f"software: spark-graft-synth segment {segment_id}\r\n".encode()
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: warcinfo\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode("ascii")
    return head + body + b"\r\n\r\n"


def gzip_member(record: bytes) -> bytes:
    """One record as its own gzip member — the real Common Crawl segment
    framing (each WARC record is individually gzipped, members
    concatenated, so a reader can seek to a CDX offset and inflate one
    member). mtime pinned to 0 so output bytes are deterministic."""
    import gzip

    return gzip.compress(record, compresslevel=6, mtime=0)


def _gunzip_members(blob: bytes) -> bytes:
    """Inflate concatenated gzip members back into the plain byte stream.
    Walks member by member via zlib (stdlib only); a corrupt or truncated
    member stops the walk there — everything already inflated still
    parses, matching the plain parser's degrade-per-record contract."""
    import zlib

    parts: list[bytes] = []
    data = blob
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            parts.append(d.decompress(data))
        except zlib.error:
            break  # corrupt member: keep what inflated so far
        if not d.eof:
            break  # truncated final member — its bytes are partial
        data = d.unused_data
    return b"".join(parts)


def parse_warc_segment(blob: bytes,
                       record_type: str = "response") -> list[tuple]:
    """(rec_idx, url, warc_ts, status, payload) for every WELL-FORMED
    record of the wanted type, in file order. Length-delimited walk;
    truncated/malformed tails stop the walk (partial record dropped),
    other record types are skipped but consume their declared length.

    record_type="response" (WARC): the payload is the HTTP body after
    the header split, with the parsed status; "conversion" (WET): the
    payload IS the record body (no HTTP envelope), status fixed 0.

    Accepts BOTH segment framings transparently: plain concatenated
    records, and per-record gzip members (the actual Common Crawl layout
    — detected by the 0x1f8b magic and inflated via _gunzip_members
    before the walk)."""
    want = record_type.encode("ascii")
    if blob[:2] == b"\x1f\x8b":
        blob = _gunzip_members(blob)
    out: list[tuple] = []
    pos, idx = 0, 0
    n = len(blob)
    while pos < n:
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        head = blob[pos:hdr_end]
        if not head.startswith(b"WARC/"):
            break
        fields = {}
        for line in head.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get(b"content-length", b""))
        except ValueError:
            break
        if clen < 0:
            # a negative declared length would rewind the cursor onto (or
            # before) this same header and the walk would never terminate
            # — treat it like any other malformed record: stop the walk
            # for this segment (the module contract is that one corrupt
            # segment degrades, it never hangs or fails the scan)
            break
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end > n:
            break  # truncated record
        assert body_end > pos  # cursor strictly monotonic — no re-parse
        if fields.get(b"warc-type") == want:
            body = blob[body_start:body_end]
            status = 0
            if want == b"response":
                http_end = body.find(b"\r\n\r\n")
                payload = b""
                if http_end >= 0:
                    status_line = body[:body.find(b"\r\n")].split(b" ")
                    if len(status_line) >= 2 and status_line[1].isdigit():
                        status = int(status_line[1])
                    payload = body[http_end + 4:]
            else:
                payload = body  # conversion: the body IS the text
            out.append((idx,
                        fields.get(b"warc-target-uri", b"").decode("utf-8",
                                                                   "replace"),
                        fields.get(b"warc-date", b"").decode("ascii",
                                                             "replace"),
                        status, payload))
        idx += 1
        pos = body_end
        while blob.startswith(b"\r\n", pos):
            pos += 2
    return out


def synthesize_warc_segments(spark, n_pages: int, *,
                             pages_per_segment: int = 50,
                             gzip_members: bool = False) -> DataFrame:
    """(segment_id, warc:binary): deterministic WARC segments over the
    synthetic pages corpus (sources/pages.py) — the fixture twin of a
    Common-Crawl segment listing. Built inside mapInPandas so segment
    assembly is distributed (one task builds its own segments; nothing
    but the segment ids is exchanged). ``gzip_members=True`` writes the
    real Common Crawl framing: each record its own gzip member."""
    import pandas as pd

    from .pages import page_record

    n_segments = -(-n_pages // pages_per_segment)
    frame = gzip_member if gzip_members else (lambda b: b)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seg in pdf["id"]:
                seg = int(seg)
                lo = seg * pages_per_segment
                hi = min(lo + pages_per_segment, n_pages)
                parts = [frame(build_warcinfo(seg))]
                for i in range(lo, hi):
                    page = page_record(i)
                    h = page["html"]  # str, or raw bytes for the
                    # encoding-repair templates — pass bytes through so
                    # the mojibake-repair path is exercised END TO END
                    parts.append(frame(build_warc_record(
                        page["url"], "2026-06-01T00:00:00Z",
                        h if isinstance(h, bytes) else h.encode("utf-8"))))
                rows.append((seg, b"".join(parts)))
            yield pd.DataFrame(rows, columns=["segment_id", "warc"])

    return (spark.range(n_segments)
            .repartition(min(n_segments, 32))
            .mapInPandas(gen, schema="segment_id long, warc binary"))


def warc_records(segments: DataFrame, *,
                 blob_col: str = "warc") -> DataFrame:
    """Explode WARC segment blobs into response-record rows
    (WARC_RECORD_SCHEMA). The blob is consumed inside the Arrow stage;
    only narrow record rows (url, ts, status, html) leave it."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seg_id, blob in zip(pdf["segment_id"], pdf[blob_col]):
                for idx, url, ts, status, html in parse_warc_segment(
                        bytes(blob)):
                    rows.append((int(seg_id), idx, url, ts, status, html))
            yield pd.DataFrame(rows, columns=[
                "segment_id", "rec_idx", "url", "warc_ts", "status",
                "html"])

    return segments.mapInPandas(gen, schema=WARC_RECORD_SCHEMA)


# ---------------------------------------------------------------------------
# WET (extracted-text conversion records) — the WARC sibling Common Crawl
# ships alongside each segment
# ---------------------------------------------------------------------------

WET_RECORD_SCHEMA = ("segment_id long, rec_idx int, url string, "
                     "warc_ts string, text string")


def build_wet_record(url: str, ts: str, text: str) -> bytes:
    """One WARC/1.0 conversion record — the WET (extracted-text) sibling
    of build_warc_record: no HTTP envelope, the payload IS the UTF-8
    text. Real WET files contain one conversion record per successfully
    extracted page (failed extractions are absent), plus the leading
    warcinfo."""
    body = text.encode("utf-8")
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode("ascii")
    return head + body + b"\r\n\r\n"


def synthesize_wet_segments(spark, n_pages: int, *,
                            pages_per_segment: int = 50,
                            gzip_members: bool = False) -> DataFrame:
    """(segment_id, wet:binary): deterministic WET segments — the
    extracted-text twin of synthesize_warc_segments, built by running the
    SAME kernel extraction the WARC path uses (kernel.clean_html) over
    each logical page and emitting conversion records for the ok ones
    (failed extractions are absent, exactly like real WET). Segment
    boundaries mirror the WARC layout so (warc, wet) pairs align."""
    import pandas as pd

    from ..functions.kernel import clean_html
    from .pages import page_record

    n_segments = -(-n_pages // pages_per_segment)
    frame = gzip_member if gzip_members else (lambda b: b)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seg in pdf["id"]:
                seg = int(seg)
                lo = seg * pages_per_segment
                hi = min(lo + pages_per_segment, n_pages)
                parts = [frame(build_warcinfo(seg))]
                for i in range(lo, hi):
                    page = page_record(i)
                    out = clean_html(page["html"], output_format="txt")
                    if out.ok:
                        parts.append(frame(build_wet_record(
                            page["url"], "2026-06-01T00:00:00Z",
                            out.text)))
                rows.append((seg, b"".join(parts)))
            yield pd.DataFrame(rows, columns=["segment_id", "wet"])

    return (spark.range(n_segments)
            .repartition(min(n_segments, 32))
            .mapInPandas(gen, schema="segment_id long, wet binary"))


def wet_records(segments: DataFrame, *,
                blob_col: str = "wet") -> DataFrame:
    """Explode WET segment blobs into conversion-record rows
    (WET_RECORD_SCHEMA) — same Arrow-stage contract as warc_records:
    the blob never leaves the stage, only narrow (url, ts, text) rows
    do."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seg_id, blob in zip(pdf["segment_id"], pdf[blob_col]):
                for idx, url, ts, _status, body in parse_warc_segment(
                        bytes(blob), record_type="conversion"):
                    rows.append((int(seg_id), idx, url, ts,
                                 body.decode("utf-8", "replace")))
            yield pd.DataFrame(rows, columns=[
                "segment_id", "rec_idx", "url", "warc_ts", "text"])

    return segments.mapInPandas(gen, schema=WET_RECORD_SCHEMA)


# ---------------------------------------------------------------------------
# WAT (metadata JSON records) — the third file of the Common Crawl triple.
# Real crawls build their link graph from WAT, never by re-parsing HTML:
# each WARC response gets a metadata record whose JSON payload carries the
# already-extracted out-links (Envelope → Payload-Metadata →
# HTTP-Response-Metadata → HTML-Metadata → Links). This tier completes the
# WARC/WET/WAT source set with the same framing, writer-determinism, and
# degrade-per-record contracts as its two siblings above.
# ---------------------------------------------------------------------------

WAT_RECORD_SCHEMA = ("segment_id long, rec_idx int, url string, "
                     "warc_ts string, wat_json string")

# the JSON envelope path real WAT files use (subset: the link fields)
WAT_LINKS_SPARK_SCHEMA = (
    "struct<Envelope:struct<`Payload-Metadata`:struct<"
    "`HTTP-Response-Metadata`:struct<`HTML-Metadata`:struct<"
    "Links:array<struct<path:string,url:string>>>>>>>")


def build_wat_record(url: str, ts: str, links: list[str]) -> bytes:
    """One WARC/1.0 metadata record whose payload is the WAT JSON
    envelope for a response record — the link list as
    ``{"path": "A@/href", "url": ...}`` entries, document order
    preserved. ``separators=(',', ':')`` + ``ensure_ascii`` keep the
    bytes deterministic and ASCII (oracle-derivable)."""
    import json

    envelope = {"Envelope": {
        "WARC-Header-Metadata": {"WARC-Target-URI": url},
        "Payload-Metadata": {"HTTP-Response-Metadata": {"HTML-Metadata": {
            "Links": [{"path": "A@/href", "url": u} for u in links],
        }}},
    }}
    body = json.dumps(envelope, separators=(",", ":"),
                      ensure_ascii=True).encode("ascii")
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: metadata\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Type: application/json\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode("ascii")
    return head + body + b"\r\n\r\n"


def synthesize_wat_segments(spark, n_pages: int, *,
                            pages_per_segment: int = 50,
                            gzip_members: bool = False) -> DataFrame:
    """(segment_id, wat:binary): deterministic WAT segments — one
    metadata record per logical page, links computed by the SAME kernel
    extractor the crawl discovery path uses (kernel.extract_links), so
    the WAT link graph is byte-consistent with what a WARC re-parse
    would yield. Segment boundaries mirror the WARC/WET layout so the
    (warc, wet, wat) triple aligns — exactly how Common Crawl ships."""
    import pandas as pd

    from ..functions.kernel import extract_links
    from .pages import page_record

    n_segments = -(-n_pages // pages_per_segment)
    frame = gzip_member if gzip_members else (lambda b: b)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seg in pdf["id"]:
                seg = int(seg)
                lo = seg * pages_per_segment
                hi = min(lo + pages_per_segment, n_pages)
                parts = [frame(build_warcinfo(seg))]
                for i in range(lo, hi):
                    page = page_record(i)
                    links = extract_links(page["html"], page["url"])
                    parts.append(frame(build_wat_record(
                        page["url"], "2026-06-01T00:00:00Z", links)))
                rows.append((seg, b"".join(parts)))
            yield pd.DataFrame(rows, columns=["segment_id", "wat"])

    return (spark.range(n_segments)
            .repartition(min(n_segments, 32))
            .mapInPandas(gen, schema="segment_id long, wat binary"))


def wat_records(segments: DataFrame, *,
                blob_col: str = "wat") -> DataFrame:
    """Explode WAT segment blobs into metadata-record rows
    (WAT_RECORD_SCHEMA). Same Arrow-stage contract as warc_records /
    wet_records: the segment blob never leaves the stage — only the
    narrow (url, ts, wat_json) rows do. The JSON STAYS A STRING here on
    purpose: decoding it is ``F.from_json`` with WAT_LINKS_SPARK_SCHEMA
    downstream, whole-stage JVM — the link graph is built without any
    Python in the hot path after this parse."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for seg_id, blob in zip(pdf["segment_id"], pdf[blob_col]):
                for idx, url, ts, _status, body in parse_warc_segment(
                        bytes(blob), record_type="metadata"):
                    rows.append((int(seg_id), idx, url, ts,
                                 body.decode("ascii", "replace")))
            yield pd.DataFrame(rows, columns=[
                "segment_id", "rec_idx", "url", "warc_ts", "wat_json"])

    return segments.mapInPandas(gen, schema=WAT_RECORD_SCHEMA)


def wat_links(records: DataFrame) -> DataFrame:
    """(segment_id, src, target) edge rows from WAT metadata records —
    ``from_json`` + ``explode`` only, whole-stage JVM after the Arrow
    parse. This is the production link-graph ingestion path: feeding
    operators/graph.py (pagerank, HITS, anchor rollup inputs) from WAT
    costs a JSON decode per record instead of an HTML parse per page."""
    links = F.from_json(F.col("wat_json"), WAT_LINKS_SPARK_SCHEMA) \
        ["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"] \
        ["HTML-Metadata"]["Links"]
    return (records
            .select("segment_id", F.col("url").alias("src"),
                    F.explode(links).alias("l"))
            .select("segment_id", "src", F.col("l")["url"].alias("target")))


def build_revisit_record(url: str, ts: str, refers_to_url: str,
                         refers_to_ts: str, digest: str) -> bytes:
    """One WARC/1.0 ``revisit`` record (ISO 28500 §6.7.2, the
    identical-payload-digest profile) — how Common Crawl and Heritrix
    store a re-fetch whose payload digest was already archived: a stub
    pointing at the original response instead of the bytes again. The
    payload is empty; WARC-Refers-To-Target-URI/-Date name the archived
    copy and WARC-Payload-Digest carries the matching digest."""
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: revisit\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"WARC-Profile: identical-payload-digest\r\n"
            f"WARC-Refers-To-Target-URI: {refers_to_url}\r\n"
            f"WARC-Refers-To-Date: {refers_to_ts}\r\n"
            f"WARC-Payload-Digest: md5:{digest}\r\n"
            f"Content-Length: 0\r\n\r\n").encode("ascii")
    return head + b"\r\n\r\n"


def elect_archive_winners(slim: DataFrame, *,
                          prior: DataFrame | None = None) -> DataFrame:
    """Shared ISO 28500 §6.7.2 winner election + response/revisit
    classification over a slim ``(url, ts, digest, …)`` frame,
    optionally probed against ``prior`` winners ``(digest, url, ts)``
    from earlier rounds. The single source of truth for the election
    semantics — used by :func:`revisit_dedup_plan` (standalone archive
    dedup) AND ``CrawlEngine._archive_plan`` (the engine's incremental
    variant), so the two can never diverge.

    Election: a digest already in ``prior`` refers every new capture to
    the archived copy; among unseen digests the ``min(struct(ts, url))``
    capture — never arrival order — is the response, the rest refer to
    it. Adds ``_is_resp`` / ``_ref_url`` / ``_ref_ts`` (refs NULL on
    responses' own winning row only after the caller's when(); here they
    always carry the elected winner), preserving every input column.

    Scale shape: one digest-keyed partial-min aggregate + join-backs on
    digest; only (url, ts, 32-byte digest) columns participate."""
    if prior is not None:
        probe = prior.select("digest", F.col("url").alias("_pu"),
                             F.col("ts").alias("_pt"))
        j = slim.join(probe, "digest", "left")
    else:
        j = (slim.withColumn("_pu", F.lit(None).cast("string"))
             .withColumn("_pt", F.lit(None).cast("string")))
    rw = (j.filter(F.col("_pu").isNull())
          .groupBy("digest")
          .agg(F.min(F.struct("ts", "url")).alias("_w"))
          .select("digest", F.col("_w.url").alias("_wu"),
                  F.col("_w.ts").alias("_wt")))
    j2 = j.join(rw, "digest", "left")
    is_resp = (F.col("_pu").isNull()
               & (F.col("url") == F.col("_wu"))
               & (F.col("ts") == F.col("_wt")))
    return (j2.withColumn("_is_resp", is_resp)
            .withColumn("_ref_url", F.coalesce(F.col("_pu"), F.col("_wu")))
            .withColumn("_ref_ts", F.coalesce(F.col("_pt"), F.col("_wt")))
            .drop("_pu", "_pt", "_wu", "_wt"))


def revisit_dedup_plan(records: DataFrame, *, url_col: str = "url",
                       ts_col: str = "warc_ts",
                       payload_col: str = "html") -> DataFrame:
    """Archival payload dedup: decide, per record, whether the archive
    stores a full ``response`` or a digest-``revisit`` stub (ISO 28500
    §6.7.2; the dedup Common Crawl runs at write time — upwards of half
    of a recrawl's payload bytes are unchanged). The FIRST record per
    payload digest — ordered (warc_ts, url), never arrival order — is
    the archived response; every later record with the same digest
    becomes a revisit stub pointing at it, and its payload bytes are the
    saving. Content dedup of the CORPUS is dedup_exact's job; this is
    dedup of the ARCHIVE, where every record must remain addressable.

    Output per record: url, warc_ts, digest, record_type
    ('response'|'revisit'), refers_to_url/refers_to_ts (null on
    responses), payload_bytes, saved_bytes (payload_bytes on revisits,
    0 on responses).

    Scale shape (100 TB archive): digest and byte length are computed in
    the scan projection and the payload column is dropped BEFORE any
    exchange — only (url, ts, 32-byte digest, length) rows shuffle. One
    digest-keyed map-side-combined min(struct) aggregate elects winners;
    the plan is that aggregate joined back on digest (AQE broadcasts the
    winner side when digests are few). No window over the full archive,
    no payload bytes in motion.
    """
    slim = records.select(
        F.col(url_col).alias("url"), F.col(ts_col).alias("ts"),
        F.md5(F.col(payload_col).cast("string")).alias("digest"),
        F.length(F.col(payload_col)).cast("long").alias("payload_bytes"))
    e = elect_archive_winners(slim)
    is_resp = F.col("_is_resp")
    return (e.withColumn("record_type", F.when(is_resp, F.lit("response"))
                         .otherwise(F.lit("revisit")))
            .withColumn("refers_to_url",
                        F.when(is_resp, F.lit(None).cast("string"))
                        .otherwise(F.col("_ref_url")))
            .withColumn("refers_to_ts",
                        F.when(is_resp, F.lit(None).cast("string"))
                        .otherwise(F.col("_ref_ts")))
            .withColumn("saved_bytes",
                        F.when(is_resp, F.lit(0)).otherwise(
                            F.col("payload_bytes")).cast("long"))
            .select("url", F.col("ts").alias("warc_ts"), "digest",
                    "record_type", "refers_to_url", "refers_to_ts",
                    "payload_bytes", "saved_bytes"))
