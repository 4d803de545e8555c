"""Synthetic Common-Crawl-style ``pages`` table (FIXTURES.md §1-2).

One pure function ``page_record(doc_id)`` defines every row
deterministically (seed folded into the constants); the same function is
used by the plain-Python oracle loop and by the distributed
``synthesize_pages`` (mapInPandas) generator, so both paths are
byte-identical by construction. No external data, no RNG state.

Schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp, html:binary, text:string(null), lang:string

The HTML template corpus reproduces the reference's fixture shapes
(tests/test_html_cleaner.py, tests/test_scraper_functions.py — see
FIXTURES.md §2): simple page, empty body (extraction must fail), boilerplate
-heavy, tables, comments, entity-laden, CRLF/blank-run, unicode long title,
metadata-rich, minimal.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BASE_TS = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)

_WORDS = (
    "spark engine frontier crawl clean text host queue priority robots "
    "table scan merge join shuffle partition bloom filter hash token "
    "article news data batch round seed url fetch extract normalize"
).split()

_SECTIONS = ("news", "tech", "sports", "private")

N_TEMPLATES = 10

# bump when page_record's html changes — benchmark page caches key on it
PAGES_VERSION = 3


def _host_index(doc_id: int) -> int:
    """Zipf-ish host skew: host 0 holds ~30% of URLs (hot-domain skew for
    salting/AQE tests, SURVEY §4.2), hosts 1-2 ~12% each, rest spread thin."""
    r = (doc_id * 2654435761) % 100
    if r < 30:
        return 0
    if r < 42:
        return 1
    if r < 54:
        return 2
    return 3 + (r - 54) % 45


def _sentence(doc_id: int, i: int) -> str:
    x = (doc_id * 1103515245 + i * 12345 + 6789) & 0x7FFFFFFF
    words = []
    for j in range(5 + (x % 9)):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        words.append(_WORDS[x % len(_WORDS)])
    return " ".join(words).capitalize() + "."


def _paragraph(doc_id: int, p: int, n_sents: int = 4) -> str:
    return " ".join(_sentence(doc_id, p * 100 + s) for s in range(n_sents))


def page_host_section(doc_id: int) -> tuple[str, str]:
    """(host, section) for a page id — THE single definition shared by
    page_url and the template-8 metadata (article:section/og:site_name),
    so the metadata can never silently diverge from the URL the page
    lives at if the host-skew or section scheme changes."""
    host = f"host{_host_index(doc_id)}.example"
    section = _SECTIONS[3] if doc_id % 20 == 19 else _SECTIONS[doc_id % 3]
    return host, section


def page_url(doc_id: int) -> str:
    """The canonical URL scheme shared by page generation, seed synthesis,
    and in-page link targets."""
    host, section = page_host_section(doc_id)
    return f"https://{host}/{section}/{doc_id}.html"


def out_link_ids(doc_id: int) -> list[int]:
    """Deterministic out-link TARGETS the body template embeds. id//2
    walks toward the low ids and (id*7+3)%100 lands inside [0,100), so
    the link closure of ANY seed set is finite — discovery-mode crawls
    terminate. NOTE: template-1 pages (~10% of ids) discard the body
    entirely and emit ZERO links — harvested edges are a SUBSET of
    {(d, t) : t ∈ out_link_ids(d)}; derive expected discovery from
    extract_links over the HTML, never from this list alone."""
    return [doc_id // 2, (doc_id * 7 + 3) % 100]


def page_record(doc_id: int, *, paragraphs: int = 4) -> dict:
    """Deterministic page row. ``text`` is None — the extraction stage fills
    it; the parity oracle computes the expectation with kernel.clean_html."""
    # mixed so template choice decorrelates from the mod-100 host classes
    tmpl = ((doc_id * 1103515245 + 12345) >> 16) % N_TEMPLATES
    url = page_url(doc_id)
    host, section = page_host_section(doc_id)
    title = f"Article {doc_id}: {_sentence(doc_id, 0)[:-1]}"
    body = "\n".join(f"<p>{_paragraph(doc_id, p)}</p>"
                     for p in range(1, paragraphs + 1))
    # every page links two deterministic others (URL-discovery substrate)
    body += ("\n<p>Related: "
             + " ".join(f'<a href="{page_url(t)}">related {t}</a>'
                        for t in out_link_ids(doc_id))
             + "</p>")

    if tmpl == 0:
        html = f"<html><head><title>{title}</title></head><body>{body}</body></html>"
    elif tmpl == 1:
        # extraction must fail → ok=false row (ref tests/test_html_cleaner.py:67-76)
        html = "<html><head><title>empty</title></head><body>   </body></html>"
    elif tmpl == 2:
        html = (f"<html><head><title>{title}</title><style>p{{margin:0}}</style>"
                f"</head><body><nav><a href='/'>home</a> menu items</nav>"
                f"<header>site header</header><div class='article'>{body}</div>"
                f"<script>var x = 1;</script><aside>related links</aside>"
                f"<footer>copyright footer</footer></body></html>")
    elif tmpl == 3:
        rows = "".join(f"<tr><td>k{doc_id % 7}-{r}</td><td>v{r}</td></tr>"
                       for r in range(3))
        html = (f"<html><head><title>{title}</title></head><body>{body}"
                f"<table>{rows}</table></body></html>")
    elif tmpl == 4:
        html = (f"<html><head><title>{title}</title></head><body>"
                f"<!-- hidden editorial note {doc_id} -->{body}</body></html>")
    elif tmpl == 5:
        html = (f"<html><head><title>{title}</title></head><body>{body}"
                f"<p>Fish &amp; chips &lt;best&gt; in town&nbsp;&#8212; really.</p>"
                f"</body></html>")
    elif tmpl == 6:
        crlf_body = body.replace("\n", "\r\n")
        html = (f"<html><head><title>{title}</title></head><body>"
                f"<pre>line one   \r\n\r\n\r\n\r\nline two\rline three</pre>"
                f"{crlf_body}</body></html>")
    elif tmpl == 7:
        long_title = ("Überraschend — " + "véry löng title " * 12).strip()
        html = (f"<html><head><title>{long_title}</title></head>"
                f"<body><h1>{long_title}</h1>{body}</body></html>")
    elif tmpl == 8:
        html = (f"<html><head><title>{title}</title>"
                f"<meta name=\"author\" content=\"Author {doc_id % 11}\">"
                f"<meta name=\"description\" content=\"Summary of article {doc_id}\">"
                f"<meta property=\"og:site_name\" content=\"Host{_host_index(doc_id)} News\">"
                f"<meta name=\"keywords\" content=\"tag{doc_id % 5}, tag{doc_id % 3}\">"
                f"<meta property=\"article:published_time\" content=\"2026-01-{1 + doc_id % 28:02d}\">"
                f"<meta property=\"article:section\" content=\"{section}\">"
                f"</head><body><h1>{title}</h1>{body}</body></html>")
    else:
        html = f"<html><head><title>{title}</title></head><body>{body}</body></html>"

    # per-page crawl directives, head-only (extracted text, links, and
    # template metadata are untouched): mod-11 classes guarantee every
    # directive combination in any 33-page window. 7 uses the reversed
    # attribute order on purpose — parsers must accept both.
    drc = doc_id % 11
    directive = {5: '<meta name="robots" content="noindex">',
                 7: '<meta content="nofollow" name="robots">',
                 9: '<meta name="robots" content="noindex, nofollow">'
                 }.get(drc, "")
    if drc == 3:
        directive += f'<link rel="canonical" href="{page_url(doc_id // 2)}">'
    if directive:
        html = html.replace("<head>", "<head>" + directive, 1)

    raw = html.encode("utf-8")
    if doc_id % 37 == 0:
        # invalid continuation byte exercises errors="replace"
        # (ref html_cleaner_core.py:82)
        raw = raw.replace(b"</body>", b"caf\xe9\xff</body>", 1)

    return {
        "url": url,
        "warc_ts": BASE_TS + dt.timedelta(seconds=doc_id),
        "html": raw,
        "text": None,
        "lang": ("en", "de", "fr")[doc_id % 3],
    }


PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), nullable=False),
    T.StructField("warc_ts", T.TimestampType(), nullable=False),
    T.StructField("html", T.BinaryType(), nullable=False),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType(), nullable=False),
])


def synthesize_pages(spark: SparkSession, n: int, *,
                     partitions: int | None = None,
                     paragraphs: int = 4) -> DataFrame:
    """Distributed deterministic generation: spark.range → mapInPandas.

    Scales linearly with cores and rows — at a real 100 TB run this stage is
    replaced by a scan of the Iceberg ``pages`` table; generation exists only
    because the sandbox has no Common Crawl input (FIXTURES.md)."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = [page_record(int(i), paragraphs=paragraphs)
                    for i in pdf["id"]]
            yield pd.DataFrame.from_records(recs)

    rng = spark.range(0, n, numPartitions=partitions or max(
        spark.sparkContext.defaultParallelism, 1))
    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


def pages_local(n: int, *, paragraphs: int = 4) -> list[dict]:
    """Single-process twin of synthesize_pages — the parity oracle input."""
    return [page_record(i, paragraphs=paragraphs) for i in range(n)]
