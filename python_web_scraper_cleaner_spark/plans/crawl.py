"""CrawlEngine — deterministic batch micro-rounds over the frontier.

The Spark-first rebuild of the reference's crawl loop (seed discovery →
URL dedup → polite sequential fetch → extract → write, /root/reference/
scripts/news.py + scripts/trafilatura_scraper.py + scraper_cleaner/
html_cleaner_core.py:run_batch), re-expressed as north_rule demands:

  round r:
    pending frontier ──bloom prefilter──► exact anti-join vs url_seen (J1)
      ──robots broadcast filter (J3)──► per-host top-k window (O4, salted)
      ──politeness schedule──► fetch stage (groupBy(host).applyInPandas —
      per-host pacing serialized within a task, S3)
      ──vectorized extraction (F3, byte-identical kernel)──►
    transactional commits: pages+r, url_seen+r, crawl_log+r, frontier−batch

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
                 discovery_priority: int = 9) -> None:
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

    # -- lifecycle ------------------------------------------------------------
    def bootstrap(self, seeds: DataFrame, robots: DataFrame | None = None,
                  *, robots_txt: DataFrame | None = None) -> None:
        """Seed the frontier and robots tables. ``robots`` is a pre-parsed
        rules table (host, crawl_delay_ms, disallow_prefixes[,
        allow_prefixes]); alternatively pass ``robots_txt`` as raw
        (host, robots_txt) rows and the RFC-9309-subset parser builds the
        rules (operators/frontier.parse_robots_table)."""
        if robots is None:
            if robots_txt is None:
                raise ValueError("pass robots or robots_txt")
            robots = FR.parse_robots_table(robots_txt)
        frontier = canonicalize_seeds(seeds)
        self.io.overwrite(frontier, "frontier", round_id=-1)
        self.io.overwrite(robots, "robots", round_id=-1)

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
            if B.bloom_geometry(committed) == (
                    self.n_bloom_buckets, self._bloom_m, self._bloom_k):
                return committed
        return B.build_bloom(seen.select("url_hash"),
                             n_buckets=self.n_bloom_buckets,
                             m_bits=self._bloom_m, n_hashes=self._bloom_k)

    # -- one round -------------------------------------------------------------
    def run_round(self, round_id: int) -> dict:
        io = self.io
        pending = io.read("frontier")
        seen = io.read_or_empty("url_seen", SEEN_SCHEMA)
        robots = io.read("robots")

        # J1: bloom prefilter + exact anti-join against url_seen. The
        # filter is PERSISTED and maintained incrementally (see _bloom):
        # no full url_seen rescan (and no seen.count() action) per round.
        bloom = self._bloom(seen) if io.exists("url_seen") else None
        if bloom is not None:
            fresh = B.bloom_dedup(pending, seen, bloom,
                                  n_buckets=self.n_bloom_buckets)
        else:
            fresh = pending

        # J3 + O4: robots filter, per-host budget, politeness schedule
        allowed = FR.apply_robots(fresh, robots)
        batch = FR.select_round_batch(
            allowed, per_host_budget=self.per_host_budget,
            hot_host_threshold=self.hot_host_threshold,
            n_salts=self.n_salts)
        # batch comes straight from select_round_batch — its fetch_slot IS
        # the politeness rank, so the second window shuffle is skipped
        sched = FR.politeness_schedule(batch, trust_existing_slot=True)

        # S3 + F3: fetch (grouped per host) then vectorized extraction +
        # deterministic language tagging (input_hint: extraction fills
        # text AND lang; failed extractions tag 'und'); in discovery mode
        # out-links are harvested from html BEFORE the binary column is
        # dropped (links travel as a small array column, never the blob)
        from ..functions.udfs import extract_links_udf, lang_id_udf
        fetched = simulated_fetch(sched)
        extra_cols = []
        if self.discover_links:
            fetched = fetched.withColumn(
                "links", extract_links_udf(F.col("html"), F.col("url")))
            extra_cols = ["links"]
        cleaned = with_clean_text(fetched, output_format="txt")
        pages = (cleaned
                 .withColumn("lang",
                             F.when(F.col("ok"), lang_id_udf(F.col("text")))
                             .otherwise(F.lit("und")))
                 .withColumn("round", F.lit(round_id))
                 .withColumn("partition_id", F.spark_partition_id())
                 .select("url", "canonical_url", "url_hash", "host",
                         "priority", "warc_ts", "round", "partition_id",
                         "fetch_slot", "scheduled_offset_ms", "fetch_ok",
                         "text", "lang", "ok", "extracted_chars", "error",
                         *extra_cols))
        # one shuffle-free pass feeds three commits: cache the round result
        pages.persist()
        try:
            n_fetched = pages.count()

            io.append_round(pages, "pages", round_id)

            new_seen = (pages.select(
                "url_hash", "canonical_url",
                F.lit(round_id).cast("int").alias("first_seen_round")))
            io.append_round(new_seen, "url_seen", round_id)

            # incremental bloom maintenance: OR in ONLY this round's hashes
            # (bitmap union is associative — equals a full rebuild) instead
            # of rescanning the whole url_seen table every round. Committed
            # AFTER url_seen with the same round id; a crash between the
            # two commits is detected by the round-id comparison in _bloom
            # and repaired with a one-time full rebuild.
            delta = B.build_bloom(new_seen.select("url_hash"),
                                  n_buckets=self.n_bloom_buckets,
                                  m_bits=self._bloom_m,
                                  n_hashes=self._bloom_k)
            merged = delta if bloom is None else B.merge_blooms(bloom, delta)
            io.overwrite(merged, "bloom", round_id)

            # K3: per-partition lineage/metrics (manifest analog)
            log = (pages.groupBy("round", "partition_id")
                   .agg(F.count("*").alias("n_urls"),
                        F.sum(F.col("ok").cast("int")).alias("n_ok"),
                        F.sum((~F.col("ok")).cast("int")).alias("n_err"),
                        F.sum("extracted_chars").alias("extracted_chars"))
                   .withColumn("wall_ts", F.lit(time.time()).cast("double")))
            io.append_round(log, "crawl_log", round_id)

            # frontier advance: committed batch leaves the pending set
            remaining = pending.join(pages.select("canonical_url"),
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
                fresh = canonicalize_seeds(discovered)
                known_seen = io.read("url_seen").select("canonical_url")
                fresh = (fresh
                         .join(known_seen, "canonical_url", "left_anti")
                         .join(remaining.select("canonical_url"),
                               "canonical_url", "left_anti"))
                remaining = remaining.unionByName(fresh)

            io.overwrite(remaining, "frontier", round_id)

            # count the COMMITTED frontier (parquet metadata read) instead
            # of re-running the anti-join lineage a second time
            stats = {"round": round_id, "n_fetched": n_fetched,
                     "n_remaining": io.read("frontier").count()}
        finally:
            pages.unpersist()
        return stats

    def run(self, *, max_rounds: int = 100) -> list[dict]:
        """Run rounds until the frontier drains (resumable: starts after the
        last committed round)."""
        stats = []
        r = self.last_round() + 1
        for round_id in range(r, r + max_rounds):
            s = self.run_round(round_id)
            stats.append(s)
            if s["n_fetched"] == 0:
                break
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
                     "robots"):
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
