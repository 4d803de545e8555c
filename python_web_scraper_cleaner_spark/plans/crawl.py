"""CrawlEngine — deterministic batch micro-rounds over the frontier.

The Spark-first rebuild of the reference's crawl loop (seed discovery →
URL dedup → polite sequential fetch → extract → write, /root/reference/
scripts/news.py + scripts/trafilatura_scraper.py + scraper_cleaner/
html_cleaner_core.py:run_batch), re-expressed as north_rule demands:

  round r:
    pending frontier ──bloom prefilter──► exact anti-join vs url_seen (J1)
      ──robots broadcast filter (J3)──► dynamic priority (optional,
      priority_mode='pagerank'|'opic'|'trustrank': committed link graph
      → the chosen centrality × revisit due-ness, the frontier_priority
      composition; trustrank teleports to the committed seed_set)
      ──per-host top-k window (O4, salted)──politeness schedule──►
      fetch stage (groupBy(host).applyInPandas — per-host pacing
      serialized within a task, S3)
      ──vectorized extraction (F3, byte-identical kernel)──►
      C4 line-quality verdict (optional, c4_filter=True: pages failing
      the Raffel et al. line recipe are flagged `c4_kept=false` and
      excluded from the corpus view / signature index, audit rows kept)
      ──► near-dup probe vs the persisted MinHash signature index (optional,
      dedup_index=True: batch band-probes sig_index, near-dups flagged,
      only kept docs' bands appended — corpus never re-shingled)
    transactional commits: pages+r, warc_segments+r (optional,
      archive=True: WARC capture + WET extracted-text twins — the pair
      of files Common Crawl ships; archive_dedup=True additionally
      maintains archive_digests+r and writes ISO 28500 revisit stubs
      instead of already-archived payload bytes), sig_index+r, links+r,
      url_seen+r, crawl_log+r, frontier−batch

Every table commit is one TableIO snapshot per round, so a killed job
resumes at the last committed round and — because every ordering derives
from explicit sort keys — replays the exact same crawl order and URL-seen
set (north_rule checkpoint/resume; tests/test_crawl_engine.py proves it).

In this sandbox the fetch stage regenerates the deterministic synthetic
HTML (sources/pages.page_record) instead of hitting the network — the
politeness scheduling, grouping, and pacing bookkeeping are the real
thing (SURVEY S3: "fetch is simulated by reading html from the synthetic
pages table").
"""

from __future__ import annotations

import re as _re
import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.udfs import with_clean_text
from ..operators import bloom as B
from ..operators import frontier as FR
from ..sources.pages import page_record
from ..sources.tableio import TableIO

FRONTIER_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), nullable=False),
    T.StructField("canonical_url", T.StringType(), nullable=False),
    T.StructField("url_hash", T.LongType(), nullable=False),
    T.StructField("host", T.StringType(), nullable=False),
    T.StructField("priority", T.IntegerType(), nullable=False),
    T.StructField("warc_ts", T.TimestampType(), nullable=False),
])

SEEN_SCHEMA = T.StructType([
    T.StructField("url_hash", T.LongType(), nullable=False),
    T.StructField("canonical_url", T.StringType(), nullable=False),
    T.StructField("first_seen_round", T.IntegerType(), nullable=False),
])

# transient-failure retry state (retry_failed=True): attempt = fetches
# already consumed; due_round = earliest round the next attempt may run
RETRY_SCHEMA = T.StructType([
    T.StructField("url_hash", T.LongType(), nullable=False),
    T.StructField("attempt", T.IntegerType(), nullable=False),
    T.StructField("due_round", T.IntegerType(), nullable=False),
])

ROBOTS_SCHEMA = T.StructType([
    T.StructField("host", T.StringType(), nullable=False),
    T.StructField("crawl_delay_ms", T.LongType(), nullable=False),
    T.StructField("disallow_prefixes", T.ArrayType(T.StringType()),
                  nullable=False),
])

_FETCH_EXTRA = [
    T.StructField("fetch_slot", T.IntegerType(), nullable=False),
    T.StructField("scheduled_offset_ms", T.LongType(), nullable=False),
    T.StructField("html", T.BinaryType()),
    T.StructField("fetch_ok", T.BooleanType(), nullable=False),
]

_DOCID_RE = _re.compile(r"/(\d+)\.html$")


def synthesize_seeds(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic seed list matching sources/pages.page_record's URL
    scheme, built with pure expressions (no Python loop — the 100k+ seed
    path for benchmarks). Same Zipf-ish host skew: host0 ≈ 30% of URLs."""
    ids = spark.range(n)
    r = (F.col("id") * 2654435761) % 100
    hostidx = (F.when(r < 30, 0).when(r < 42, 1).when(r < 54, 2)
               .otherwise(3 + (r - 54) % 45))
    section = F.when(F.col("id") % 20 == 19, F.lit("private")).otherwise(
        F.element_at(F.array(F.lit("news"), F.lit("tech"), F.lit("sports")),
                     (F.col("id") % 3 + 1).cast("int")))
    url = F.concat(F.lit("https://host"), hostidx.cast("string"),
                   F.lit(".example/"), section, F.lit("/"),
                   F.col("id").cast("string"), F.lit(".html"))
    return ids.select(url.alias("url"),
                      (F.col("id") % 10).cast("int").alias("priority"),
                      F.to_timestamp(F.lit("2026-01-01"))
                      .alias("discovered_ts"))


def default_robots(spark: SparkSession, n_hosts: int = 48) -> DataFrame:
    """Deterministic per-host rules for the synthetic hosts: staggered
    crawl delays, '/private' disallowed everywhere."""
    rows = [(f"host{h}.example", (h * 250) % 1000, ["/private"])
            for h in range(n_hosts)]
    return spark.createDataFrame(rows, ROBOTS_SCHEMA)


def canonicalize_seeds(seeds: DataFrame) -> DataFrame:
    """seeds(url, priority, discovered_ts) → FRONTIER_SCHEMA rows, one per
    canonical url (min priority / earliest ts win — deterministic)."""
    from .queries import _canonicalize
    canon = _canonicalize(seeds)
    return (canon
            .groupBy("canonical_url", "host")
            .agg(F.min("url").alias("url"),
                 F.min("priority").cast("int").alias("priority"),
                 F.min("discovered_ts").alias("warc_ts"))
            .withColumn("url_hash", F.xxhash64("canonical_url"))
            .select(*[f.name for f in FRONTIER_SCHEMA]))


def simulated_fetch(batch: DataFrame) -> DataFrame:
    """Fetch stage: groupBy(host).applyInPandas so one task owns one host and
    its pacing (SURVEY O4/S3). Rows are processed in fetch_slot order —
    exactly the committed politeness schedule. HTML comes from the
    deterministic corpus generator; a missing doc_id models a fetch error
    (the reference's download-failure row, trafilatura_scraper.py:48-54)."""
    out_schema = T.StructType(
        [f for f in batch.schema.fields
         if f.name not in ("fetch_slot", "scheduled_offset_ms")]
        + _FETCH_EXTRA)
    cols = [f.name for f in out_schema.fields]

    def fetch_host(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("fetch_slot").reset_index(drop=True)
        htmls, oks = [], []
        for url in pdf["url"]:
            m = _DOCID_RE.search(url)
            if m:
                htmls.append(page_record(int(m.group(1)))["html"])
                oks.append(True)
            else:
                htmls.append(None)
                oks.append(False)
        pdf["html"] = htmls
        pdf["fetch_ok"] = pd.array(oks, dtype=bool)
        return pdf[cols]

    return batch.groupBy("host").applyInPandas(fetch_host, schema=out_schema)


@F.pandas_udf(T.StringType())
def _capture_md5(urls: pd.Series) -> pd.Series:
    """md5 hex of the CAPTURE payload per url — the archival-dedup key.
    In this sandbox the capture regenerates from the url via the same
    deterministic seam _build_segments uses (sources/pages.page_record);
    a real deployment hashes the fetched bytes inside the fetch task and
    commits the digest into pages. Arrow-batched, never per-row udf()."""
    import hashlib

    out = []
    for url in urls:
        m = _DOCID_RE.search(url)
        blob = page_record(int(m.group(1)))["html"] if m else b""
        out.append(hashlib.md5(blob).hexdigest())
    return pd.Series(out)


def _observed_latency_ms(url_hash_col, host_col):
    """The fetch clock's simulated stand-in: per-fetch latency as a pure
    function of (host, url_hash) — hosts get distinct base latencies
    (their "server speed"), urls jitter around it. A REAL deployment
    replaces this one expression with the elapsed-ms the fetch stage
    measured (the fetcher owns the clock and writes it into pages);
    everything downstream (estimate_crawl_delays, budgets, pacing) is
    already wired for that column. Purity is the point in simulation:
    adaptive delays derive from committed pages alone, so crash replay
    and kill/resume reproduce byte-identical schedules (north_rule)."""
    base = F.pmod(F.xxhash64(host_col), F.lit(900))
    jitter = F.pmod(F.xxhash64(url_hash_col), F.lit(400))
    return (base + jitter).cast("long")


class CrawlEngine:
    """Round-driven crawl over TableIO tables: frontier, url_seen, robots,
    pages, crawl_log."""

    def __init__(self, spark: SparkSession, root: str, *,
                 per_host_budget: int = 5,
                 n_bloom_buckets: int = 16,
                 bloom_capacity_per_bucket: int = 100_000,
                 bloom_fpr: float = 0.01,
                 hot_host_threshold: int | None = None,
                 n_salts: int = 8,
                 discover_links: bool = False,
                 discovery_priority: int = 9,
                 priority_mode: str = "static",
                 pagerank_iters: int = 3,
                 rank_refresh_every: int = 1,
                 dedup_index: bool = False,
                 dedup_threshold: float = 0.7,
                 archive: bool = False,
                 archive_pages_per_segment: int = 50,
                 archive_gzip: bool = True,
                 archive_dedup: bool = False,
                 revisit: bool = False,
                 revisit_base_hours: int = 1,
                 trap_variant_cap: int | None = None,
                 adaptive_delay: bool = False,
                 round_ms: int | None = None,
                 robots_wildcard: bool = False,
                 retry_failed: bool = False,
                 max_attempts: int = 3,
                 retry_backoff_rounds: int = 1,
                 url_filter: bool = False,
                 strip_tracking: bool = False,
                 c4_filter: bool = False,
                 c4_min_words: int = 5,
                 c4_min_sentences: int = 3,
                 honor_directives: bool = False) -> None:
        self.spark = spark
        self.io = TableIO(spark, root)
        self.per_host_budget = per_host_budget
        self.n_bloom_buckets = n_bloom_buckets
        # Fixed filter geometry, sized ONCE from design capacity (not from
        # the current url_seen count): incremental OR-maintenance requires
        # every delta to share (m_bits, n_hashes). Size n_bloom_buckets ×
        # bloom_capacity_per_bucket for the deployment's total URL volume
        # (10^10 URLs: B=16384 at the default per-bucket capacity).
        self._bloom_m = B.optimal_m_bits(bloom_capacity_per_bucket, bloom_fpr)
        self._bloom_k = B.optimal_k(self._bloom_m, bloom_capacity_per_bucket)
        self.hot_host_threshold = hot_host_threshold
        self.n_salts = n_salts
        # URL discovery: harvest <a href> from fetched pages and grow the
        # frontier (the reference only discovers via its external seed
        # source, scripts/news.py:1-9 — in-page discovery is what makes
        # this a crawler rather than a fetch queue). Discovered URLs get
        # the lowest priority so seeds always crawl first — deterministic.
        self.discover_links = discover_links
        self.discovery_priority = discovery_priority
        # Dynamic frontier priority (VERDICT r4 #1): the rank modes
        # replace the static seed `priority` ordering with the composed
        # frontier_priority decision (plans/queries.q_frontier_priority,
        # proven oracle-green as a registry entry) inside the production
        # round loop: link centrality over the DISCOVERED graph (a
        # `links` table appended every round) × revisit due-ness (an
        # optional `fetch_history` table), never-fetched pages first.
        # Three interchangeable centralities share the seam (all bigint
        # fixed-point over the committed graph — operators/graph.py):
        #   'pagerank'  — damped global importance (the default choice);
        #   'opic'      — Abiteboul's OPIC cash+history estimator, the
        #                 crawl-native importance that needs no global
        #                 convergence (rank = hist_fp + cash_fp);
        #   'trustrank' — teleport restricted to the BOOTSTRAP SEED SET
        #                 (committed as `seed_set` at bootstrap): trust
        #                 flows out of the operator-vetted seeds, so
        #                 link-farm neighborhoods unreachable from them
        #                 rank exactly 0 — spam demotion in the fetch
        #                 order itself.
        # Everything derives from committed tables, so kill/resume still
        # replays the identical order (north_rule invariant).
        # pagerank_iters is the iteration/round knob for ALL rank modes.
        if priority_mode not in ("static", "pagerank", "opic", "trustrank"):
            raise ValueError(f"unknown priority_mode {priority_mode!r}")
        self.priority_mode = priority_mode
        self._rank_mode = priority_mode != "static"
        self.pagerank_iters = pagerank_iters
        # Rank refresh cadence: round r ranks over the links committed
        # BEFORE basis = r - (r % K). At 10^10 urls re-ranking the whole
        # accumulated graph every round is the dominant scheduler cost;
        # K>1 freezes the basis for K rounds so the rank frame is
        # computed once per window (cached in-process, persisted) and
        # each round pays only the 8-byte-key join. Resume-deterministic
        # at any K: the basis is a pure function of the round id and the
        # committed links table (rows are round-stamped).
        if rank_refresh_every < 1:
            raise ValueError("rank_refresh_every must be >= 1")
        self.rank_refresh_every = rank_refresh_every
        self._rank_cache: tuple | None = None  # (basis, persisted ranks)
        self._harvest_links = discover_links or self._rank_mode
        # Per-round near-dup dedup against a PERSISTED MinHash signature
        # index (VERDICT r4 #2): each round probes the new batch against
        # the `sig_index` table (operators/dedup.minhash_lsh_probe_index),
        # flags near-dups in the pages sink, and appends only the KEPT
        # docs' bands — the corpus is never re-shingled. Fixed signature
        # geometry per store, same contract as the bloom filter.
        self.dedup_index = dedup_index
        self.dedup_threshold = dedup_threshold
        self._sig_k, self._sig_hashes, self._sig_band = 3, 16, 4
        # Archival sink: commit each round's captures as WARC segments
        # plus their WET (extracted-text conversion) twins — the exact
        # pair of files Common Crawl ships — in the same transactional
        # commit set as the round's tables (sources/warc.py writers,
        # gzip-member framing by default, the real CC layout).
        self.archive = archive
        if archive_pages_per_segment < 1:
            raise ValueError("archive_pages_per_segment must be >= 1")
        self.archive_pages_per_segment = archive_pages_per_segment
        self.archive_gzip = archive_gzip
        # Archival payload dedup (ISO 28500 §6.7.2, what Common Crawl
        # does at write time): maintain an `archive_digests` table of
        # every payload digest ever archived; a re-capture whose digest
        # is already committed is written as a `revisit` stub pointing
        # at the first archived copy instead of the bytes again
        # (sources/warc.revisit_dedup_plan semantics, inside the engine's
        # transactional round commit set). Matters most with revisit=True
        # — unchanged re-crawls stop paying payload storage.
        if archive_dedup and not archive:
            raise ValueError("archive_dedup=True requires archive=True")
        self.archive_dedup = archive_dedup
        # Re-crawl loop: revisit=True makes the engine MAINTAIN the
        # fetch_history table (per-fetch content-change observations —
        # the substrate _apply_priority's due-ness ordering and
        # schedule_revisits' Cho–G-M backoff consume). The engine's time
        # axis is the round id: 1 round == 1 "hour" of the backoff
        # schedule (revisit_base_hours scales it).
        self.revisit = revisit
        self.revisit_base_hours = revisit_base_hours
        # Crawler-trap guard: at most N pending urls per (host, path)
        # enter a round; the overflow is DROPPED from the frontier (the
        # enforcement half of operators/frontier.url_trap_signals /
        # cap_trap_variants — a crawler abandons a calendar, it doesn't
        # queue it forever)
        if trap_variant_cap is not None and trap_variant_cap < 1:
            raise ValueError("trap_variant_cap must be >= 1")
        self.trap_variant_cap = trap_variant_cap
        # Adaptive politeness: adaptive_delay=True raises each host's
        # effective crawl delay to max(robots Crawl-delay, 1.5 × observed
        # p95 fetch latency) before budgets and pacing are computed
        # (operators/frontier.estimate_crawl_delays over the COMMITTED
        # pages — a pure function of committed state, so crash replay and
        # kill/resume stay byte-identical; see _observed_latency_ms for
        # the simulated-clock seam). round_ms additionally makes per-host
        # budgets delay-aware (select_round_batch round_ms semantics: a
        # host that asks for d ms absorbs at most round_ms/d fetches).
        self.adaptive_delay = adaptive_delay
        if round_ms is not None and round_ms < 1:
            raise ValueError("round_ms must be >= 1")
        self.round_ms = round_ms
        # Robots matcher mode: wildcard=True runs the full RFC 9309
        # §2.2.3 pattern grammar (operators/frontier.apply_robots_
        # wildcard — '*' and trailing-'$' honoured, longest-octets wins)
        # instead of the prefix subset. A plain prefix is a valid
        # pattern, so both matchers agree on prefix-only rule tables;
        # the mode only changes behavior when the robots table actually
        # carries metacharacter rules. Pure function of the committed
        # robots table either way → replay/resume stay byte-identical.
        self.robots_wildcard = robots_wildcard
        # Transient-failure retry: retry_failed=True stops treating a
        # failed fetch as permanent. Failed urls stay OUT of url_seen and
        # IN the frontier while attempts remain; a `retries` table
        # (url_hash, attempt, due_round) gates re-selection with
        # exponential backoff (due = round + backoff·2^attempt); urls
        # that exhaust max_attempts enter url_seen as permanent failures.
        # All transitions are pure functions of committed tables, so WAL
        # replay and kill/resume stay byte-identical. The simulated fetch
        # seam models transience as a pure function of (url_hash,
        # attempt) — a REAL fetcher just reports fetch_ok and everything
        # downstream is already wired.
        self.retry_failed = retry_failed
        if max_attempts < 1:
            raise ValueError("max_attempts must be >= 1")
        if retry_backoff_rounds < 0:
            raise ValueError("retry_backoff_rounds must be >= 0")
        self.max_attempts = max_attempts
        self.retry_backoff_rounds = retry_backoff_rounds
        # URL pre-fetch filter (operators/frontier.url_prefilter): gate
        # BOTH frontier-ingestion points — bootstrap seeds and per-round
        # discovered links — so a blocklisted/spam-shaped url never
        # occupies frontier state or a fetch slot. A pure stateless
        # projection over the candidate set, so replay/resume stay
        # byte-identical; at web scale this is the cheapest drop point
        # there is (the byte never downloaded).
        self.url_filter = url_filter
        # Aggressive URL canonicalization (operators/frontier.
        # url_tracking_canonical): strip tracking/session params + sort
        # survivors on RAW candidate urls BEFORE the lossless
        # canonicalization, so tracking variants of one page collapse to
        # a single frontier row and a single fetch. A pure projection of
        # the candidate url — replay/resume stay byte-identical. Off by
        # default: parameter dropping is a per-crawl policy choice and
        # changes crawl ordering vs the reference contract.
        self.strip_tracking = strip_tracking
        # C4 line-level quality gate (operators/textstats.c4_kept_col —
        # the Raffel et al. 2020 recipe, kernel.c4_clean twin): each
        # round stamps extracted pages with a `c4_kept` verdict; failed
        # pages stay in the sink for audit but are excluded from the
        # corpus view the signature index and near-dup probe consume
        # (same flag-don't-delete contract as near_dup). A pure
        # projection of the extracted text, so replay/resume stay
        # byte-identical.
        self.c4_filter = c4_filter
        self.c4_min_words = c4_min_words
        self.c4_min_sentences = c4_min_sentences
        # Per-page crawl directives (operators/frontier.meta_robots_flags
        # — the extract_directives expressions): each round stamps
        # extracted pages with `noindex`/`nofollow` from the robots meta
        # tag. noindex pages stay in the sink for audit but are excluded
        # from the corpus view and the signature index (the c4_kept
        # flag-don't-delete contract); nofollow suppresses THIS page's
        # out-link harvest, so its targets never enter the frontier via
        # it (they remain discoverable through other pages — per-page
        # directive semantics, not a url blocklist). Pure projections of
        # the fetched html, so replay/resume stay byte-identical.
        self.honor_directives = honor_directives

    def _strip_tracking(self, seeds: DataFrame) -> DataFrame:
        """Apply aggressive param-strip canonicalization to raw seed rows
        (url, priority, discovered_ts) — no-op unless strip_tracking."""
        if not self.strip_tracking:
            return seeds
        cols = seeds.columns
        return (FR.url_tracking_canonical(seeds, url_col="url")
                .withColumn("url", F.col("canon_url"))
                .select(*cols))

    def _ingest_gate(self, frontier: DataFrame) -> DataFrame:
        """Apply the URL pre-fetch filter to FRONTIER_SCHEMA rows (no-op
        unless url_filter=True). Runs on canonical_url — post-
        normalization, so an uppercased blockword or a default-port
        variant cannot sneak past the lexical gate."""
        if not self.url_filter:
            return frontier
        cols = frontier.columns
        return (FR.url_prefilter(frontier, url_col="canonical_url")
                .filter(F.col("keep")).select(*cols))

    # -- lifecycle ------------------------------------------------------------
    def bootstrap(self, seeds: DataFrame | None = None,
                  robots: DataFrame | None = None,
                  *, robots_txt: DataFrame | None = None,
                  sitemap_docs: DataFrame | None = None,
                  sitemap_priority: int = 9,
                  feed_docs: DataFrame | None = None,
                  feed_priority: int = 8) -> None:
        """Seed the frontier and robots tables. ``robots`` is a pre-parsed
        rules table (host, crawl_delay_ms, disallow_prefixes[,
        allow_prefixes]); alternatively pass ``robots_txt`` as raw
        (host, robots_txt) rows and the RFC-9309-subset parser builds the
        rules (operators/frontier.parse_robots_table).

        ``sitemap_docs`` seeds the frontier from fetched sitemap-protocol
        urlset documents (rows with a ``sitemap_xml`` column — the output
        of fetching what robots_sitemap_urls / parse_sitemap_index
        discovered): each listed URL becomes a seed at
        ``sitemap_priority`` with ``discovered_ts`` taken from the
        optional <lastmod> (epoch when absent — 'age unknown' sorts
        oldest, so explicit seeds and dated entries outrank it). Explicit
        ``seeds`` and sitemap entries landing on the same canonical URL
        collapse in canonicalize_seeds (min priority / earliest ts win —
        an explicit priority-0 seed beats its sitemap twin
        deterministically).

        ``feed_docs`` seeds the same way from fetched RSS/Atom feed
        documents (rows with a ``feed_xml`` column — see
        operators/frontier.parse_feeds): entry URLs enter at
        ``feed_priority`` (default 8 — BELOW sitemap's 9 because a feed
        lists what the site just published, the freshness channel) with
        ``discovered_ts`` from the optional pubDate/updated via the same
        try_to_timestamp degrade-to-epoch seam (RFC-822 pubDates a real
        feed may carry parse as NULL → epoch, never an ANSI abort). All
        three channels merge by canonical key in canonicalize_seeds."""
        if robots is None:
            if robots_txt is None:
                raise ValueError("pass robots or robots_txt")
            robots = FR.parse_robots_table(robots_txt)
        if seeds is None and sitemap_docs is None and feed_docs is None:
            raise ValueError("pass seeds and/or sitemap_docs/feed_docs")
        if sitemap_docs is not None:
            parsed = FR.parse_sitemaps(sitemap_docs)
            sm_seeds = parsed.select(
                "url",
                F.lit(int(sitemap_priority)).alias("priority"),
                F.coalesce(
                    # try_: a malformed <lastmod> in one wild sitemap must
                    # degrade to the epoch default, not ANSI-abort the job
                    F.try_to_timestamp(F.when(F.col("lastmod") != "",
                                              F.col("lastmod"))),
                    F.to_timestamp(F.lit("1970-01-01")),
                ).alias("discovered_ts"))
            seeds = (sm_seeds if seeds is None
                     else seeds.select("url", "priority", "discovered_ts")
                     .unionByName(sm_seeds))
        if feed_docs is not None:
            fd_seeds = FR.parse_feeds(feed_docs).select(
                "url",
                F.lit(int(feed_priority)).alias("priority"),
                F.coalesce(
                    F.try_to_timestamp(F.when(F.col("published") != "",
                                              F.col("published"))),
                    F.to_timestamp(F.lit("1970-01-01")),
                ).alias("discovered_ts"))
            seeds = (fd_seeds if seeds is None
                     else seeds.select("url", "priority", "discovered_ts")
                     .unionByName(fd_seeds))
        frontier = self._ingest_gate(
            canonicalize_seeds(self._strip_tracking(seeds)))
        self.io.overwrite(frontier, "frontier", round_id=-1)
        self.io.overwrite(robots, "robots", round_id=-1)
        # the vetted seed identity, durable: trustrank teleports to this
        # set (committed unconditionally — tiny, and it lets any store
        # switch into trustrank mode later without re-bootstrapping)
        self.io.overwrite(frontier.select("url_hash").distinct(),
                          "seed_set", round_id=-1)

    def last_round(self) -> int:
        r = self.io.latest_round("crawl_log")
        return -1 if r is None else r

    def _bloom(self, seen: DataFrame) -> DataFrame:
        """The URL-seen bloom filter for this round: the committed filter
        table when it is in sync with url_seen (the per-round fast path —
        no url_seen rescan), else a one-time full rebuild (first round
        after upgrade, or a crash landed between the url_seen and bloom
        commits — bloom must never MISS a seen hash, or a dup re-crawls).

        Sync means BOTH round id AND filter geometry. Every bloom row is
        stamped with (n_buckets, m_bits, n_hashes); if this engine's
        config differs from what built the committed filter, the table is
        unusable — a different n_buckets remaps hashes to other buckets
        (probe would return silent false negatives → duplicate crawls),
        and a different m/k would wedge merge_blooms at commit time on
        every retry. Either drift falls back to a full rebuild with the
        CURRENT geometry, which the commit then overwrites."""
        io = self.io
        if (io.exists("bloom")
                and io.latest_round("bloom") == io.latest_round("url_seen")):
            committed = io.read("bloom")
            # a bloom table committed by a pre-geometry-stamp build lacks
            # the stamp columns entirely — that is geometry drift too
            # (unknowable geometry ⇒ unusable filter), so it must take the
            # same full-rebuild fallback, not raise on the select
            stamped = {"n_buckets", "m_bits", "n_hashes"}.issubset(
                committed.columns)
            if stamped and B.bloom_geometry(committed) == (
                    self.n_bloom_buckets, self._bloom_m, self._bloom_k):
                return committed
        return B.build_bloom(seen.select("url_hash"),
                             n_buckets=self.n_bloom_buckets,
                             m_bits=self._bloom_m, n_hashes=self._bloom_k)

    def _ranks_at_basis(self, basis: int):
        """Centrality frame (id, rank_fp) over the links committed BEFORE
        ``basis``, or None when that graph is empty. A pure function of
        (committed links table [+ committed seed_set for trustrank],
        basis) — which is what makes kill/resume reproduce the ordering
        at any refresh cadence. Cached in-process per basis (persisted,
        nodes-sized): with rank_refresh_every=K the graph is ranked once
        per K-round window and the other K−1 rounds pay only the join.

        The centrality is the priority_mode: pagerank (damped global),
        opic (hist+cash — the crawl-native estimator), or trustrank
        (teleport restricted to the bootstrap seed_set; seeds that never
        appeared in the harvested graph contribute no reachable mass and
        are skipped via a semi-join — conservative, deterministic). All
        three share the two-shuffles-per-iteration integer profile
        (operators/graph.py)."""
        from ..caching import bounded_persist
        from ..operators import graph as G

        if self._rank_cache is not None and self._rank_cache[0] == basis:
            return self._rank_cache[1]
        ranks = None
        if self.io.exists("links") and basis > 0:
            edges = (self.io.read("links")
                     .filter(F.col("round") < basis)
                     .select(F.col("src_hash").alias("src"),
                             F.col("dst_hash").alias("dst")))
            # rank nodes = edge endpoints only: never-linked frontier
            # entries take rank 0 via the join coalesce, so the rank
            # frame does not depend on the (round-varying) pending set
            # and one frame serves the whole refresh window
            nodes = (edges.select(F.col("src").alias("id"))
                     .unionByName(edges.select(F.col("dst").alias("id")))
                     .distinct())
            n = nodes.count()
            if n > 0:
                ranks = bounded_persist(
                    self._centrality(G, edges, nodes, n), tag="crawl_rank")
        self._rank_cache = (basis, ranks)
        return ranks

    def _centrality(self, G, edges, nodes, n):
        """Dispatch the priority_mode's centrality to (id, rank_fp)."""
        if self.priority_mode == "opic":
            st = G.opic_cash(edges, nodes, n_nodes=n,
                             rounds=self.pagerank_iters)
            # the OPIC importance estimate: accumulated history plus the
            # cash not yet credited (Abiteboul's h+c estimator)
            return st.select(
                "id", (F.col("hist_fp") + F.col("cash_fp"))
                .alias("rank_fp"))
        if self.priority_mode == "trustrank":
            if not self.io.exists("seed_set"):
                raise RuntimeError(
                    "priority_mode='trustrank' needs the committed "
                    "seed_set table — re-run bootstrap() (this engine "
                    "version commits it) before resuming in this mode")
            seeds = (self.io.read("seed_set")
                     .select(F.col("url_hash").alias("id"))
                     .join(nodes, "id", "left_semi"))
            ns = seeds.count()
            if ns == 0:
                return nodes.select(
                    "id", F.lit(0).cast("long").alias("rank_fp"))
            return (G.trustrank_fixed_point(
                edges, seeds, nodes, n_seeds=ns,
                iters=self.pagerank_iters)
                .select("id", F.col("trust_fp").alias("rank_fp")))
        return G.pagerank_fixed_point(edges, nodes, n_nodes=n,
                                      iters=self.pagerank_iters)

    def _apply_priority(self, allowed: DataFrame, round_id: int):
        """Compose the round's dynamic fetch ordering (any rank mode):
        never-fetched first (revisit due-ness from an optional
        ``fetch_history`` table second), then link-centrality rank —
        pagerank / opic / trustrank per priority_mode — over the
        committed ``links`` graph as of the refresh basis (see
        _ranks_at_basis), then the static FRONTIER_ORDER as the
        deterministic tiebreak — the exact composition proven
        oracle-green by the `frontier_priority` registry entry
        (plans/queries.py:q_frontier_priority; the trustrank/opic
        centralities by `link_trustrank` / `frontier_opic`).

        Returns (frontier_with_rank_cols, order_exprs | None,
        helper_cols_to_drop). Every input is a committed table, so a
        resumed engine recomputes the identical ordering (north_rule).

        Scale shape: every centrality is 2 shuffles/iteration on 8-byte
        keys (operators/graph.py), amortized over rank_refresh_every
        rounds; the rank and due-ness joins are id-keyed; nothing
        touches html/text."""
        if not self._rank_mode:
            return allowed, None, []
        io = self.io
        basis = round_id - (round_id % self.rank_refresh_every)
        ranks = self._ranks_at_basis(basis)
        if ranks is not None:
            allowed = (allowed.join(
                ranks.select(F.col("id").alias("url_hash"), "rank_fp"),
                "url_hash", "left")
                .withColumn("rank_fp", F.coalesce(
                    F.col("rank_fp"), F.lit(0).cast("long"))))
        else:
            allowed = allowed.withColumn("rank_fp", F.lit(0).cast("long"))
        if io.exists("fetch_history"):
            # SAME backoff clock as schedule_revisits — a configured
            # revisit_base_hours must drive the due-ness ordering too,
            # or the fetch order diverges from the schedule it claims
            # to compose
            rev = FR.revisit_schedule(io.read("fetch_history"),
                                      base_hours=self.revisit_base_hours)
            allowed = allowed.join(
                rev.select(F.col("page_id").alias("url_hash"),
                           F.col("next_interval_hours").alias("_due_h")),
                "url_hash", "left")
        else:
            allowed = allowed.withColumn("_due_h",
                                         F.lit(None).cast("long"))
        allowed = (allowed
                   .withColumn("never_fetched", F.col("_due_h").isNull())
                   .withColumn("due_h", F.coalesce(
                       F.col("_due_h"), F.lit(0).cast("long")))
                   .drop("_due_h"))
        order = [F.desc("never_fetched"), F.asc("due_h"),
                 F.desc("rank_fp")] + FR.order_exprs(None)
        return allowed, order, ["never_fetched", "due_h", "rank_fp"]

    @staticmethod
    def _corpus_view(df: DataFrame) -> DataFrame:
        """THE corpus-membership filter — the single definition of which
        pages rows are "the corpus": extraction ok, not a near-dup, C4
        gate passed, not publisher-noindexed. Column-presence-tolerant
        so it applies both to this round's in-flight batch (which may
        not carry every flag yet) and to committed stores written before
        a flag existed. The signature-index state, the probe set, and
        the per-round band append all call this one implementation —
        adding the next exclusion flag happens HERE, nowhere else, so
        the three views can never silently disagree."""
        out = df.filter(F.col("ok"))
        if "near_dup" in df.columns:
            out = out.filter(~F.col("near_dup"))
        if "c4_kept" in df.columns:
            out = out.filter(F.col("c4_kept"))
        if "noindex" in df.columns:
            out = out.filter(~F.col("noindex"))
        return out

    def _sig_state(self):
        """(index_bands | None, repair_bands | None) for this round's
        near-dup probe. The committed ``sig_index`` table is the fast
        path; a round-id gap vs ``pages`` (crash between the two commits,
        or dedup_index newly enabled on an existing store) is repaired by
        banding ONLY the gap rounds' kept docs — bounded re-shingling,
        never the whole corpus (same repair contract as _bloom). The
        repair bands join this round's append so the store heals."""
        from ..operators import dedup as D
        io = self.io
        if not io.exists("pages"):
            return None, None
        committed = io.read("pages")
        kept = self._corpus_view(committed)
        sig_r = io.latest_round("sig_index") if io.exists("sig_index") \
            else None
        index = io.read("sig_index") if sig_r is not None else None
        if sig_r == io.latest_round("pages"):
            return index, None
        gap = kept.filter(F.col("round") > (-1 if sig_r is None else sig_r))
        par = self.spark.sparkContext.defaultParallelism
        repair = D.banded_signatures(
            gap.select("url_hash", "text")
            .repartition(par, F.col("url_hash")), "url_hash", "text",
            k=self._sig_k, n_hashes=self._sig_hashes,
            band_size=self._sig_band).localCheckpoint(eager=True)
        index = repair if index is None else index.unionByName(repair)
        return index, repair

    def _flag_near_dups(self, pages: DataFrame, index_bands) -> DataFrame:
        """Probe this round's extracted batch against the signature index
        and flag near-dups (kept in the pages sink for audit; excluded
        from the index and from the corpus view). Probe cost scales with
        the batch — the index text is consulted only for candidate docs
        (minhash_lsh_probe_index's left_semi verify)."""
        from ..operators import dedup as D
        if index_bands is None:
            return pages.withColumn("near_dup", F.lit(False))
        # corpus-excluded pages (c4-dropped, noindexed) never enter the
        # corpus — skip their probe; the in-flight batch has no near_dup
        # column yet, which _corpus_view tolerates
        new_docs = self._corpus_view(pages).select("url_hash", "text")
        index_docs = self._corpus_view(self.io.read("pages"))
        pairs = D.minhash_lsh_probe_index(
            index_bands, index_docs.select("url_hash", "text"), new_docs,
            id_col="url_hash", text_col="text", k=self._sig_k,
            n_hashes=self._sig_hashes, band_size=self._sig_band,
            threshold=self.dedup_threshold)
        dup_ids = (pairs.select(F.col("id_b").alias("url_hash"))
                   .distinct().withColumn("_nd", F.lit(True)))
        return (pages.join(dup_ids, "url_hash", "left")
                .withColumn("near_dup",
                            F.coalesce(F.col("_nd"), F.lit(False)))
                .drop("_nd"))

    ARCHIVE_SCHEMA = T.StructType([
        T.StructField("round", T.IntegerType(), nullable=False),
        T.StructField("host", T.StringType(), nullable=False),
        T.StructField("seg_block", T.IntegerType(), nullable=False),
        T.StructField("n_warc", T.IntegerType(), nullable=False),
        T.StructField("n_wet", T.IntegerType(), nullable=False),
        T.StructField("n_revisit", T.IntegerType(), nullable=False),
        T.StructField("warc", T.BinaryType(), nullable=False),
        T.StructField("wet", T.BinaryType(), nullable=False),
    ])

    def _archive_plan(self, pages: DataFrame,
                      round_id: int) -> tuple:
        """(per-url record plan, new digest rows) for archive_dedup=True —
        a PURE FUNCTION of (this round's pages rows, archive_digests
        rounds < round_id), so a crash anywhere in the commit set replays
        to the identical plan. A capture whose digest is already
        committed becomes a revisit stub pointing at the FIRST archived
        copy (min(struct(ts, url)) — never arrival order); among digests
        new THIS round the same election picks the one response, and the
        rest of the round's copies refer to it. Only the winners' rows
        enter archive_digests.

        Scale shape: digests are md5 inside the Arrow fetch-seam UDF and
        only (url, ts, 32-byte digest) rows reach the two digest-keyed
        aggregates + join-backs; the archive_digests probe side carries
        three narrow columns per UNIQUE payload ever archived, and the
        payload bytes themselves never enter the plan at all."""
        from ..sources.warc import elect_archive_winners
        fetched = (pages.filter("fetch_ok")
                   .select("url",
                           F.date_format("warc_ts",
                                         "yyyy-MM-dd'T'HH:mm:ss'Z'")
                           .alias("ts"))
                   .withColumn("digest", _capture_md5(F.col("url"))))
        prior = None
        if self.io.exists("archive_digests"):
            prior = (self.io.read("archive_digests")
                     .filter(F.col("round") < round_id)
                     .groupBy("digest")
                     .agg(F.min(F.struct("ts", "url")).alias("_p"))
                     .select("digest", F.col("_p.url").alias("url"),
                             F.col("_p.ts").alias("ts")))
        # shared election (sources/warc.elect_archive_winners) — the
        # ONE implementation of the §6.7.2 winner semantics, so the
        # engine sink and the standalone revisit_dedup_plan operator
        # cannot drift apart
        j2 = elect_archive_winners(fetched, prior=prior)
        is_resp = F.col("_is_resp")
        plan = j2.select(
            "url", "digest",
            F.when(is_resp, F.lit("response")).otherwise(F.lit("revisit"))
            .alias("record_type"),
            F.when(is_resp, F.lit(None).cast("string"))
            .otherwise(F.col("_ref_url")).alias("refers_to_url"),
            F.when(is_resp, F.lit(None).cast("string"))
            .otherwise(F.col("_ref_ts")).alias("refers_to_ts"))
        new_digests = (j2.filter(is_resp)
                       .select("digest", "url", "ts",
                               F.lit(round_id).cast("int").alias("round")))
        return plan, new_digests

    def _build_segments(self, pages: DataFrame, round_id: int,
                        plan: DataFrame | None = None) -> DataFrame:
        """The round's archival output: one WARC segment (response records,
        raw capture) + its WET twin (conversion records, the committed
        extracted text — failed extractions absent, real WET semantics)
        per (host, fetch_slot-block) group, in crawl order within each
        segment. Everything is a PURE FUNCTION of the committed pages rows
        — which is what makes the commit replay-safe: a crash between the
        pages and warc_segments commits heals to byte-identical segments
        (gzip members are mtime-0 deterministic).

        Scale shape: segment grouping is (host, fetch_slot // N) — dense
        per-host slots bound every segment at N records with NO global
        window or extra shuffle beyond the one groupBy; blobs are built
        and stay inside the Arrow stage. In this sandbox html regenerates
        from the url via the deterministic simulated-fetch seam
        (sources/pages.page_record — same seam simulated_fetch uses); in
        a real deployment the capture is taken inside the fetch task and
        this builder consumes the fetch cache instead."""
        from ..sources.warc import (build_revisit_record, build_warc_record,
                                    build_warcinfo, build_wet_record,
                                    gzip_member)

        pps = self.archive_pages_per_segment
        frame = gzip_member if self.archive_gzip else (lambda b: b)
        src = (pages.filter("fetch_ok")
               .withColumn("seg_block",
                           (F.col("fetch_slot") / pps).cast("int"))
               .select("host", "seg_block", "fetch_slot", "url",
                       F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
                       .alias("ts"), "ok", "text"))
        if plan is not None:
            # archive_dedup: per-url record plan (response vs revisit
            # stub) joined on the round-unique url key
            src = src.join(plan, "url", "left")
        else:
            src = (src.withColumn("record_type", F.lit("response"))
                   .withColumn("digest", F.lit(None).cast("string"))
                   .withColumn("refers_to_url", F.lit(None).cast("string"))
                   .withColumn("refers_to_ts", F.lit(None).cast("string")))

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("fetch_slot").reset_index(drop=True)
            host, block = pdf["host"][0], int(pdf["seg_block"][0])
            warc_parts = [frame(build_warcinfo(block))]
            wet_parts = [frame(build_warcinfo(block))]
            n_warc = n_wet = n_revisit = 0
            for row in pdf.itertuples():
                if row.record_type == "revisit":
                    warc_parts.append(frame(build_revisit_record(
                        row.url, row.ts, row.refers_to_url,
                        row.refers_to_ts, row.digest)))
                    n_revisit += 1
                else:
                    m = _DOCID_RE.search(row.url)
                    html = page_record(int(m.group(1)))["html"]
                    warc_parts.append(frame(
                        build_warc_record(row.url, row.ts, html)))
                    n_warc += 1
                if row.ok:
                    wet_parts.append(frame(
                        build_wet_record(row.url, row.ts, row.text)))
                    n_wet += 1
            return pd.DataFrame(
                [(round_id, host, block, n_warc, n_wet, n_revisit,
                  b"".join(warc_parts), b"".join(wet_parts))],
                columns=["round", "host", "seg_block", "n_warc", "n_wet",
                         "n_revisit", "warc", "wet"])

        return (src.groupBy("host", "seg_block")
                .applyInPandas(build, schema=self.ARCHIVE_SCHEMA))

    def _build_fetch_history(self, pages: DataFrame,
                             round_id: int) -> DataFrame:
        """The round's content-change observations (revisit=True): one row
        per successful fetch with page_id=url_hash, ts=round (the engine's
        time axis), a text digest, and ``changed`` = the digest differs
        from the LAST committed digest for that page (first-ever fetch
        counts as a change — it starts the backoff clock at base). Fetch
        failures don't advance the change clock (no row). A pure function
        of (this round's committed pages rows, fetch_history rounds < r),
        so replay after a crash between the pages and fetch_history
        commits re-derives identical rows.

        Scale shape: one per-page max_by aggregate over history < r plus
        an 8-byte-keyed left join; digests are xxhash64 inside codegen;
        text never shuffles (digest is computed before the join)."""
        fetched = (pages.filter("fetch_ok")
                   .select(F.col("url_hash").alias("page_id"),
                           F.lit(round_id).cast("int").alias("ts"),
                           F.col("url_hash").alias("fetch_id"),
                           F.xxhash64(F.coalesce(F.col("text"), F.lit("")))
                           .alias("digest")))
        if self.io.exists("fetch_history"):
            prev = (self.io.read("fetch_history")
                    .filter(F.col("ts") < round_id)
                    .groupBy("page_id")
                    .agg(F.max_by("digest", F.struct("ts", "fetch_id"))
                         .alias("_prev")))
            fetched = fetched.join(prev, "page_id", "left")
        else:
            fetched = fetched.withColumn("_prev",
                                         F.lit(None).cast("long"))
        return (fetched
                .withColumn("changed",
                            F.col("_prev").isNull()
                            | (F.col("_prev") != F.col("digest")))
                .select("page_id", "ts", "fetch_id", "changed", "digest"))

    def schedule_revisits(self, round_id: int) -> int:
        """The re-crawl transition: pages DUE under the Cho–G-M backoff
        (last fetch ts + next_interval_hours ≤ round_id, intervals from
        operators/frontier.revisit_schedule over the committed
        fetch_history) re-enter the frontier, leave url_seen, and the
        bloom filter is rebuilt over the compacted seen set — all
        committed at ``round_id`` (the transition owns a round id so
        last_round()/resume see it). Returns the number of due pages.

        IDEMPOTENT BY CONSTRUCTION, which is the crash-healing story:
        the due set is a pure function of (fetch_history, pages,
        round_id) — tables this transition never writes — and each
        commit is a set operation that re-applies to the same result
        (frontier ∪ due deduped on the canonical key; url_seen − due
        twice is url_seen − due; bloom/crawl_log rebuild/guard). A crash
        between any two commits heals by re-running the whole
        transition (run() detects frontier round > last_round and does
        exactly that), landing byte-identical to an uninterrupted one.

        Scale shape: everything is keyed on the 8-byte url_hash; the
        due set is typically a small fraction of the corpus, so the
        frontier/url_seen updates are anti/semi joins with a small
        build side; the bloom rebuild is the one full url_seen scan —
        the same cost _bloom already pays on any geometry drift.

        With dedup_index=True a refetched page probes an index that
        already contains its own bands: the probe drops self-pairs
        (same url_hash) structurally, so an unchanged refetch is NOT
        self-flagged; its bands append again (demo-acceptable index
        growth — production would merge bands per url_hash on append).
        """
        io = self.io
        if round_id <= self.last_round():
            raise ValueError("schedule_revisits round_id must be beyond "
                             "the last committed round")
        if not io.exists("fetch_history"):
            return 0
        fh = io.read("fetch_history")
        rev = FR.revisit_schedule(fh, base_hours=self.revisit_base_hours)
        last = fh.groupBy("page_id").agg(F.max("ts").alias("_last_ts"))
        due = (rev.join(last, "page_id")
               .filter(F.col("_last_ts") + F.col("next_interval_hours")
                       <= F.lit(round_id))
               .select(F.col("page_id").alias("url_hash"))
               .localCheckpoint(eager=True))
        n_due = due.count()
        if n_due == 0:
            return 0
        cols = ["url", "canonical_url", "host", "priority", "warc_ts"]
        latest = (io.read("pages").groupBy("url_hash")
                  .agg(F.max_by(F.struct(*cols), F.col("round"))
                       .alias("_p"))
                  .select("url_hash", "_p.*"))
        due_rows = (latest.join(due, "url_hash", "left_semi")
                    .select(*[f.name for f in FRONTIER_SCHEMA]))
        merged = (io.read("frontier").unionByName(due_rows)
                  .groupBy("canonical_url", "host")
                  .agg(F.min("url").alias("url"),
                       F.min("priority").cast("int").alias("priority"),
                       F.min("warc_ts").alias("warc_ts"),
                       F.min("url_hash").alias("url_hash"))
                  .select(*[f.name for f in FRONTIER_SCHEMA]))
        io.overwrite(merged, "frontier", round_id)
        # the reads below resolved their snapshot dirs BEFORE the
        # overwrites above (TableIO.read pins dirs eagerly), so the
        # lineage stays on the pre-transition versions
        compacted = io.read("url_seen").join(due, "url_hash", "left_anti")
        io.overwrite(compacted, "url_seen", round_id)
        io.overwrite(
            B.build_bloom(compacted.select("url_hash"),
                          n_buckets=self.n_bloom_buckets,
                          m_bits=self._bloom_m, n_hashes=self._bloom_k),
            "bloom", round_id)
        if not self._committed("crawl_log", round_id):
            # partition_id = -1 marks the revisit-transition row; it
            # advances last_round() so resume lands after the transition
            marker = self.spark.range(1).select(
                F.lit(round_id).cast("int").alias("round"),
                F.lit(-1).cast("int").alias("partition_id"),
                F.lit(0).cast("long").alias("n_urls"),
                F.lit(0).cast("long").alias("n_ok"),
                F.lit(0).cast("long").alias("n_err"),
                F.lit(0).cast("long").alias("extracted_chars"),
                F.lit(time.time()).cast("double").alias("wall_ts"))
            io.append_round(marker, "crawl_log", round_id)
        return n_due

    def _committed(self, name: str, round_id: int) -> bool:
        """True when ``name`` already carries this round's commit (replay
        must skip it — an append-again would duplicate rows). >= not ==:
        a table can be AHEAD of a replayed round in rolled-back stores."""
        return (self.io.exists(name)
                and (self.io.latest_round(name) or -1) >= round_id)

    # -- one round -------------------------------------------------------------
    def run_round(self, round_id: int) -> dict:
        io = self.io
        pending = io.read("frontier")
        trap_dropped = None
        if self.trap_variant_cap is not None:
            # applied to the COMMITTED frontier before any other stage,
            # so both the normal and WAL-replay paths see the same capped
            # pending set (the drop re-derives identically on resume —
            # it's a pure function of the committed frontier)
            pending, trap_dropped = FR.cap_trap_variants(
                pending, max_variants=self.trap_variant_cap)
        seen = io.read_or_empty("url_seen", SEEN_SCHEMA)
        robots = io.read("robots")

        # J1: bloom prefilter + exact anti-join against url_seen. The
        # filter is PERSISTED and maintained incrementally (see _bloom):
        # no full url_seen rescan (and no seen.count() action) per round.
        bloom = self._bloom(seen) if io.exists("url_seen") else None

        # WAL-style replay: pages is the round's write-ahead record — it
        # commits FIRST. If a crash interrupted the rest of the commit
        # set (crawl_log not yet at round_id, so run() re-enters this
        # round), the batch must NOT be re-selected: with url_seen still
        # pre-round the same urls would be re-fetched and APPENDED TWICE.
        # Rebuild the round frame from the committed rows (they carry
        # every derived column — flags, links, slots) and re-derive only
        # the outstanding commits, each guarded per table below. All
        # re-derivations are pure functions of committed state, so the
        # healed store is byte-identical to an uninterrupted run
        # (north_rule; tests/test_crawl_engine.py crash-window tests).
        replay = self._committed("pages", round_id)
        retries = (io.read_or_empty("retries", RETRY_SCHEMA)
                   if self.retry_failed else None)
        sig_repair = None
        if replay:
            pages = io.read("pages").filter(F.col("round") == round_id)
        else:
            if bloom is not None:
                fresh = B.bloom_dedup(pending, seen, bloom,
                                      n_buckets=self.n_bloom_buckets)
            else:
                fresh = pending
            if self.retry_failed:
                # retry gate: join per-url attempt state; urls whose
                # backoff window is still open sit this round out (they
                # stay in the frontier — only selection skips them).
                # 8-byte-key left join with a small build side.
                fresh = (fresh.join(retries, "url_hash", "left")
                         .withColumn("attempt",
                                     F.coalesce(F.col("attempt"),
                                                F.lit(0)))
                         .filter(F.col("due_round").isNull()
                                 | (F.col("due_round")
                                    <= F.lit(round_id)))
                         .drop("due_round"))

            # J3 + O4: robots filter, dynamic priority (pagerank mode),
            # per-host budget, politeness schedule
            allowed = (FR.apply_robots_wildcard(fresh, robots)
                       if self.robots_wildcard
                       else FR.apply_robots(fresh, robots))
            if self.adaptive_delay and io.exists("pages"):
                # observed-latency backoff: raise each host's effective
                # delay to max(robots, 1.5 × p95 observed). Derived from
                # committed pages only (prior rounds) via the pure
                # latency function — replay-safe with no new table. The
                # estimate is host-cardinality → broadcast.
                hist = (io.read("pages")
                        .select("host", _observed_latency_ms(
                            F.col("url_hash"), F.col("host"))
                            .alias("latency_ms")))
                est = FR.estimate_crawl_delays(hist).select(
                    "host", F.col("delay_ms").alias("_obs_delay_ms"))
                allowed = (allowed
                           .join(F.broadcast(est), "host", "left")
                           .withColumn(
                               "crawl_delay_ms",
                               F.greatest(
                                   F.coalesce(F.col("crawl_delay_ms"),
                                              F.lit(0)).cast("long"),
                                   F.coalesce(F.col("_obs_delay_ms"),
                                              F.lit(0)).cast("long")))
                           .drop("_obs_delay_ms"))
            allowed, order_cols, rank_helper_cols = self._apply_priority(
                allowed, round_id)
            batch = FR.select_round_batch(
                allowed, per_host_budget=self.per_host_budget,
                hot_host_threshold=self.hot_host_threshold,
                n_salts=self.n_salts, order_cols=order_cols,
                round_ms=self.round_ms)
            if rank_helper_cols:
                batch = batch.drop(*rank_helper_cols)
            # batch comes straight from select_round_batch — its
            # fetch_slot IS the politeness rank, so the second window
            # shuffle is skipped
            sched = FR.politeness_schedule(batch, trust_existing_slot=True)

            # S3 + F3: fetch (grouped per host) then vectorized
            # extraction + deterministic language tagging (input_hint:
            # extraction fills text AND lang; failed extractions tag
            # 'und'); in discovery mode out-links are harvested from
            # html BEFORE the binary column is dropped (links travel as
            # a small array column, never the blob)
            from ..functions.udfs import extract_links_udf, lang_id_udf
            fetched = simulated_fetch(sched)
            if self.retry_failed:
                # transient-failure seam: a pure function of (url_hash,
                # attempt), so attempt n and attempt n+1 are independent
                # deterministic draws (~12.5% fail) and replay/repeat
                # runs reproduce the identical outcome. A real fetcher
                # deletes this expression and reports actual fetch_ok.
                transient = (F.pmod(F.xxhash64(F.col("url_hash"),
                                               F.col("attempt")),
                                    F.lit(8)) == 0)
                fetched = (fetched
                           .withColumn("fetch_ok",
                                       F.col("fetch_ok") & ~transient)
                           .withColumn("html",
                                       F.when(F.col("fetch_ok"),
                                              F.col("html"))))
            extra_cols = []
            if self.honor_directives:
                noindex, nofollow = FR.meta_robots_flags(
                    F.col("html").cast("string"))
                fetched = (fetched.withColumn("noindex", noindex)
                           .withColumn("nofollow", nofollow))
                extra_cols += ["noindex", "nofollow"]
            if self._harvest_links:
                links = extract_links_udf(F.col("html"), F.col("url"))
                if self.honor_directives:
                    # nofollow: this page contributes NO discovery edges
                    links = (F.when(F.col("nofollow"),
                                    F.array().cast("array<string>"))
                             .otherwise(links))
                fetched = fetched.withColumn("links", links)
                extra_cols += ["links"]
            cleaned = with_clean_text(fetched, output_format="txt")
            pages = (cleaned
                     .withColumn("lang",
                                 F.when(F.col("ok"),
                                        lang_id_udf(F.col("text")))
                                 .otherwise(F.lit("und")))
                     .withColumn("round", F.lit(round_id))
                     .withColumn("partition_id", F.spark_partition_id())
                     .select("url", "canonical_url", "url_hash", "host",
                             "priority", "warc_ts", "round",
                             "partition_id", "fetch_slot",
                             "scheduled_offset_ms", "fetch_ok", "text",
                             "lang", "ok", "extracted_chars", "error",
                             *extra_cols,
                             *(["attempt"] if self.retry_failed else [])))
            if self.c4_filter:
                from ..operators.textstats import c4_kept_col
                pages = pages.withColumn(
                    "c4_kept",
                    F.col("ok") & c4_kept_col(
                        F.col("text"),
                        min_words_per_line=self.c4_min_words,
                        min_sentences=self.c4_min_sentences))
            if self.dedup_index:
                # localCheckpoint, not persist: the probe + flag + every
                # commit re-enter this frame, and a plain persist caches
                # the DATA but not the analyzed plan — each consumer
                # would re-analyze the whole round lineage (bloom probe
                # + rank join + windows + Arrow stages; measured ~+10
                # s/round of pure driver time at a 2.6k-url demo round).
                # The frame is batch-sized and html is already dropped,
                # so truncating it to an RDD scan is cheap and every
                # consumer plans in O(1) of the round plan. (Same
                # medicine as the round-4 minhash_lsh_probe_index fix —
                # see BASELINE.md.)
                pages = pages.localCheckpoint(eager=True)
                index_bands, sig_repair = self._sig_state()
                pages = self._flag_near_dups(pages, index_bands)
        # one shuffle-free pass feeds the commits: cache the round result.
        # persist (NOT localCheckpoint) is deliberate here: the commit
        # consumers re-plan the round lineage, but with the static plan
        # that analysis is cheap, while a checkpointed RDD loses the
        # columnar cache + codegen scan and freezes the AQE-coalesced
        # partitioning — measured 4.4 s → 9.1 s on the 26k-url round.
        # The dedup branch above checkpoints instead because its probe
        # re-enters a much deeper plan (see that comment).
        pages.persist()
        try:
            n_fetched = pages.count()

            if not replay:
                io.append_round(pages, "pages", round_id)

            if self.archive:
                # archival capture: WARC + WET segment blobs, a pure
                # function of the committed pages rows (see
                # _build_segments) — guarded like every other member of
                # the commit set, so a crash between the pages and
                # warc_segments commits replays to identical bytes.
                # With archive_dedup the per-url plan (and the digest
                # rows it elects) derives from archive_digests rounds
                # < round_id, so BOTH commits replay identically no
                # matter where the crash landed between them.
                seg_plan = new_digests = None
                if self.archive_dedup:
                    seg_plan, new_digests = self._archive_plan(pages,
                                                               round_id)
                if not self._committed("warc_segments", round_id):
                    io.append_round(
                        self._build_segments(pages, round_id, seg_plan),
                        "warc_segments", round_id)
                if (self.archive_dedup
                        and not self._committed("archive_digests",
                                                round_id)):
                    io.append_round(new_digests, "archive_digests",
                                    round_id)

            if self.dedup_index and not self._committed("sig_index",
                                                        round_id):
                # index maintenance: band ONLY this round's kept docs and
                # APPEND (operators/dedup.append_to_signature_index
                # semantics — near-dups never enter the index, the corpus
                # is never re-shingled); committed AFTER pages with the
                # same round id so a crash between the two commits is
                # detected as a round-id gap and repaired by _sig_state.
                if replay:
                    # _sig_state's gap repair already covers this
                    # (committed) round's kept docs — banding them again
                    # here would duplicate index rows
                    _, new_bands = self._sig_state()
                else:
                    from ..operators import dedup as D
                    # fan the batch out before shingling: AQE coalesces
                    # the small round frame to ~1 partition (the
                    # checkpointed RDD inherits it), and the minhash CPU
                    # would run on one core otherwise — measured 33 s →
                    # ~3 s on the 7k-url demo round (same fix as
                    # q_dedup_incremental's index build,
                    # plans/queries.py)
                    par = self.spark.sparkContext.defaultParallelism
                    kept_new = (self._corpus_view(pages)
                                .select("url_hash", "text")
                                .repartition(par, F.col("url_hash")))
                    new_bands = D.banded_signatures(
                        kept_new, "url_hash", "text", k=self._sig_k,
                        n_hashes=self._sig_hashes,
                        band_size=self._sig_band)
                    if sig_repair is not None:
                        new_bands = sig_repair.unionByName(new_bands)
                io.append_round(new_bands, "sig_index", round_id)

            if (self._rank_mode
                    and not self._committed("links", round_id)):
                # grow the committed link graph: (fetching page → link
                # target) as 8-byte hash edges, distinct per round. The
                # NEXT round's _apply_priority ranks over it — discovery
                # feeds the ordering, exactly the frontier_priority
                # composition, now in the production loop.
                from .queries import _canonicalize as _canon
                harvested = (pages.filter("fetch_ok")
                             .select(F.col("url_hash").alias("src_hash"),
                                     F.explode("links").alias("url")))
                edges = (_canon(harvested)
                         .select("src_hash",
                                 F.xxhash64("canonical_url")
                                 .alias("dst_hash"))
                         .distinct()
                         .withColumn("round", F.lit(round_id)
                                     .cast("int")))
                io.append_round(edges, "links", round_id)

            # retry mode: a transiently-failed url with attempts left is
            # NOT done — it stays out of url_seen (and in the frontier)
            # until it succeeds or exhausts max_attempts. `done` is the
            # membership set every downstream commit keys on.
            if self.retry_failed:
                done = pages.filter(
                    F.col("fetch_ok")
                    | (F.col("attempt") + 1 >= F.lit(self.max_attempts)))
            else:
                done = pages
            new_seen = (done.select(
                "url_hash", "canonical_url",
                F.lit(round_id).cast("int").alias("first_seen_round")))
            if not self._committed("url_seen", round_id):
                io.append_round(new_seen, "url_seen", round_id)

            # frontier advance (computed here, COMMITTED below after the
            # state tables): only DONE urls leave the pending set (== all
            # fetched urls outside retry mode) — a retryable failure
            # stays in the frontier, gated by the retries table at the
            # next selection
            remaining = pending.join(done.select("canonical_url"),
                                     "canonical_url", "left_anti")

            if self.discover_links:
                # grow the frontier: harvested links − (already seen ∪
                # already pending). Deterministic: fixed discovery
                # priority, discovered_ts = this round's id as seconds —
                # same inputs always yield the same frontier state.
                discovered = (pages
                              .select(F.explode("links").alias("url"))
                              .distinct()
                              .withColumn("priority",
                                          F.lit(self.discovery_priority)
                                          .cast("int"))
                              .withColumn(
                                  "discovered_ts",
                                  F.to_timestamp(F.lit("2026-06-01"))
                                  + F.make_interval(secs=F.lit(round_id))))
                fresh = self._ingest_gate(
                    canonicalize_seeds(self._strip_tracking(discovered)))
                # read AFTER the url_seen commit above so this round's
                # done urls are excluded (TableIO.read pins the snapshot)
                known_seen = io.read("url_seen").select("canonical_url")
                fresh = (fresh
                         .join(known_seen, "canonical_url", "left_anti")
                         .join(remaining.select("canonical_url"),
                               "canonical_url", "left_anti"))
                remaining = remaining.unionByName(fresh)

            if self.retry_failed:
                # retries' = (old − urls fetched this round) ∪ next
                # attempts, kept ONLY for urls still in the frontier.
                # Idempotent on replay: next ⊆ this round's urls, so
                # re-deriving from the post-crash table lands on the
                # same rows (see WAL notes above). Backoff is
                # exponential in attempts consumed: due = round +
                # backoff·2^attempt. The frontier semi-join purges
                # orphans — a retryable url later dropped from the
                # frontier (trap-variant cap) would otherwise hold a
                # retries row forever and pin run()'s idle-forward loop
                # at max_rounds.
                failed = (pages.filter(~F.col("fetch_ok"))
                          .select("url_hash", "attempt"))
                nxt = (failed
                       .filter(F.col("attempt") + 1
                               < F.lit(self.max_attempts))
                       .select(
                           "url_hash",
                           (F.col("attempt") + 1).cast("int")
                           .alias("attempt"),
                           (F.lit(round_id)
                            + F.lit(self.retry_backoff_rounds)
                            * F.expr("shiftleft(1, attempt)"))
                           .cast("int").alias("due_round")))
                merged_retries = (retries
                                  .join(pages.select("url_hash"),
                                        "url_hash", "left_anti")
                                  .unionByName(nxt)
                                  .join(remaining.select("url_hash"),
                                        "url_hash", "left_semi"))
                io.overwrite(merged_retries, "retries", round_id)

            # incremental bloom maintenance: OR in ONLY this round's hashes
            # (bitmap union is associative — equals a full rebuild) instead
            # of rescanning the whole url_seen table every round. Committed
            # AFTER url_seen with the same round id; a crash between the
            # two commits is detected by the round-id comparison in _bloom
            # and repaired with a one-time full rebuild.
            # (replay-safe without a guard: bitmap OR is idempotent, and
            # on replay _bloom() already returned either the in-sync
            # committed filter or a full rebuild over the post-crash
            # url_seen — OR-ing this round's delta again changes nothing)
            delta = B.build_bloom(new_seen.select("url_hash"),
                                  n_buckets=self.n_bloom_buckets,
                                  m_bits=self._bloom_m,
                                  n_hashes=self._bloom_k)
            merged = delta if bloom is None else B.merge_blooms(bloom, delta)
            io.overwrite(merged, "bloom", round_id)

            if self.revisit and not self._committed("fetch_history",
                                                    round_id):
                # re-crawl substrate: per-fetch change observations, a
                # pure function of (pages@r, fetch_history<r) — guarded
                # like every member of the commit set (crash between the
                # pages and fetch_history commits replays identically)
                io.append_round(self._build_fetch_history(pages, round_id),
                                "fetch_history", round_id)

            io.overwrite(remaining, "frontier", round_id)

            # K3: per-partition lineage/metrics (manifest analog).
            # crawl_log is the RESUME MARKER (last_round() keys on it),
            # so it commits LAST: every earlier crash window leaves
            # crawl_log behind and run() re-enters this round's replay
            # path, which re-derives each outstanding commit from
            # committed state. Were the marker committed before the
            # frontier advance (as it once was), a crash in between
            # would be unreplayable — resume would skip past the round,
            # permanently losing its discovered links and leaving its
            # fetched urls in the frontier forever.
            log = (pages.groupBy("round", "partition_id")
                   .agg(F.count("*").alias("n_urls"),
                        F.sum(F.col("ok").cast("int")).alias("n_ok"),
                        F.sum((~F.col("ok")).cast("int")).alias("n_err"),
                        F.sum("extracted_chars").alias("extracted_chars"))
                   .withColumn("wall_ts", F.lit(time.time()).cast("double")))
            if not self._committed("crawl_log", round_id):
                io.append_round(log, "crawl_log", round_id)

            # count the COMMITTED frontier (parquet metadata read) instead
            # of re-running the anti-join lineage a second time
            stats = {"round": round_id, "n_fetched": n_fetched,
                     "n_remaining": io.read("frontier").count()}
            if self.dedup_index:
                stats["n_near_dup"] = pages.filter("near_dup").count()
            if self.c4_filter:
                stats["n_c4_dropped"] = pages.filter(
                    F.col("ok") & ~F.col("c4_kept")).count()
            if self.honor_directives:
                stats["n_noindex"] = pages.filter("noindex").count()
                stats["n_nofollow"] = pages.filter("nofollow").count()
            if trap_dropped is not None:
                # stat-only action: replays the cap pipeline once more
                # (frontier scan + count agg + window over hot rows
                # only). Inherent to lazy eval without persisting round
                # state; the hot-row window input is trap paths only, so
                # the recompute is bounded by the frontier scan itself.
                stats["n_trap_dropped"] = trap_dropped.count()
        finally:
            pages.unpersist()
        return stats

    def run(self, *, max_rounds: int = 100,
            refresh_cycles: int = 0) -> list[dict]:
        """Run rounds until the frontier drains (resumable: starts after the
        last committed round). With revisit=True and refresh_cycles=K,
        each drain triggers schedule_revisits (the Cho–G-M re-crawl
        transition) up to K times — the full crawl → age → re-crawl loop
        in one call, still deterministic and resumable: the transition
        owns a round id, and an interrupted one is detected here
        (frontier committed past last_round) and idempotently re-run."""
        stats = []
        r = self.last_round() + 1
        if self.revisit and self.io.exists("frontier"):
            fr = self.io.latest_round("frontier")
            if fr is not None and fr >= r \
                    and not self._committed("pages", fr):
                # crash landed inside a revisit transition (its crawl_log
                # marker — the last commit — is missing): complete it.
                # The pages guard disambiguates from a run_round crash in
                # the frontier→crawl_log window: a crawl round commits
                # pages FIRST, a transition never writes pages — so
                # pages@fr present means "replay round fr", absent means
                # "finish the transition".
                self.schedule_revisits(fr)
                r = self.last_round() + 1
        round_id, end, cycles = r, r + max_rounds, refresh_cycles
        while round_id < end:
            s = self.run_round(round_id)
            stats.append(s)
            if s["n_fetched"] == 0:
                if (self.retry_failed
                        and self.io.exists("retries")
                        and self.io.read("retries").limit(1).count() > 0):
                    # outstanding retries whose backoff window is still
                    # open: idle forward to their due round (bounded —
                    # every entry's due_round is ≤ backoff·2^max_attempts
                    # ahead, and max_rounds still caps the loop)
                    round_id += 1
                    continue
                if not (self.revisit and cycles > 0):
                    break
                cycles -= 1
                if self.schedule_revisits(round_id + 1) == 0:
                    break
                round_id += 2      # the transition consumed round_id+1
                continue
            round_id += 1
        return stats

    def vacuum(self, *, keep_last: int = 2) -> dict:
        """Expire old table snapshots (TableIO.vacuum per engine table).
        A long crawl overwrites frontier and bloom EVERY round, so without
        maintenance their superseded data dirs accumulate one per round —
        at 10^10 urls that is real storage. keep_last=2 preserves one
        rollback step; resume semantics are untouched because resume only
        ever reads LATEST."""
        out = {}
        for name in ("frontier", "bloom", "url_seen", "pages", "crawl_log",
                     "robots", "links", "sig_index", "fetch_history",
                     "warc_segments", "retries", "archive_digests",
                     "seed_set"):
            if self.io.exists(name):
                out[name] = self.io.vacuum(name, keep_last=keep_last)
        return out

    # -- audit ------------------------------------------------------------------
    def crawl_order(self) -> list[tuple]:
        """The committed crawl order: (round, host, fetch_slot, url) — the
        engine's deterministic analog of the reference's sequential log."""
        pages = self.io.read("pages")
        rows = (pages.select("round", "host", "fetch_slot", "canonical_url")
                .orderBy("round", "host", "fetch_slot", "canonical_url")
                .collect())
        return [(r["round"], r["host"], r["fetch_slot"], r["canonical_url"])
                for r in rows]

    def seen_set(self) -> set:
        return {r["canonical_url"]
                for r in self.io.read("url_seen").collect()}
