"""Structured Streaming tests: stateful URL-seen dedup across micro-batches
(with checkpoint resume) and the watermarked crawl-log rollup.

north_rule coverage: a killed/restarted job keeps the URL-seen set — here
the second availableNow run resumes from the same checkpoint and must
suppress every URL the first run saw.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from python_web_scraper_cleaner_spark.streaming import rounds as R

BASE = dt.datetime(2026, 1, 1)


def _urls(spark, lo, hi, day=0):
    return (spark.range(lo, hi)
            .select(F.concat(F.lit("https://host"), (F.col("id") % 5).cast("string"),
                             F.lit(".example/p/"), F.col("id").cast("string"))
                    .alias("url"),
                    (F.lit(BASE) + F.make_interval(days=F.lit(day),
                                                   secs=F.col("id")))
                    .alias("warc_ts")))


def test_streaming_urlseen_dedup_and_resume(spark, tmp_path):
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # round 1: urls 0..50 (written as one file → one micro-batch)
    _urls(spark, 0, 50).coalesce(1).write.mode("append").parquet(in_dir)
    stream = R.streaming_url_seen_dedup(
        spark.readStream.schema("url string, warc_ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(in_dir))
    R.run_stream_to_table(stream, ckpt, out_dir)
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == 50
    assert got1.select("url").distinct().count() == 50

    # round 2: urls 25..75 arrive (25 dup, 25 fresh) — NEW query, SAME
    # checkpoint: state must survive the restart (resume semantics)
    _urls(spark, 25, 75, day=1).coalesce(1).write.mode("append").parquet(in_dir)
    stream2 = R.streaming_url_seen_dedup(
        spark.readStream.schema("url string, warc_ts timestamp")
        .option("maxFilesPerTrigger", 1).parquet(in_dir))
    R.run_stream_to_table(stream2, ckpt, out_dir)

    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 75              # every url exactly once
    assert got2.select("url").distinct().count() == 75
    ids = sorted(int(r.url.rsplit("/", 1)[1]) for r in got2.collect())
    assert ids == list(range(75))


def test_streaming_dedup_within_batch(spark, tmp_path):
    """Duplicates inside one micro-batch collapse to the earliest row."""
    in_dir = str(tmp_path / "in")
    dup = _urls(spark, 0, 10).unionByName(_urls(spark, 0, 10, day=2))
    dup.coalesce(1).write.parquet(in_dir)
    stream = R.streaming_url_seen_dedup(
        spark.readStream.schema("url string, warc_ts timestamp").parquet(in_dir))
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    R.run_stream_to_table(stream, ckpt, out_dir)
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 10
    # earliest warc_ts kept (day 0, not day 2)
    assert all(r.warc_ts < BASE + dt.timedelta(days=1) for r in rows)


def test_state_bucket_budget(spark, tmp_path):
    """State sizing contract: many batches through FEW buckets stays green
    while per-bucket state fits the cap, and a deliberately undersized cap
    fails loudly with the capacity error — the 'bounded state' claim is
    enforced, not aspirational."""
    in_dir = str(tmp_path / "in")
    for batch in range(3):
        (_urls(spark, batch * 200, (batch + 1) * 200)
         .repartition(1).write.mode("append").parquet(in_dir))

    def run(tag, **kw):
        stream = R.streaming_url_seen_dedup(
            spark.readStream.schema("url string, warc_ts timestamp")
            .option("maxFilesPerTrigger", 1).parquet(in_dir), **kw)
        out, ckpt = str(tmp_path / f"out{tag}"), str(tmp_path / f"ckpt{tag}")
        R.run_stream_to_table(stream, ckpt, out)
        return spark.read.parquet(out)

    # 600 urls / 4 buckets ≈ 150 per bucket: cap 200 holds across 3 batches
    assert run("ok", n_buckets=4, max_hashes_per_bucket=200).count() == 600
    # cap 100 < ~150 per bucket must raise the capacity error, not OOM on
    with pytest.raises(Exception, match="undersized"):
        run("boom", n_buckets=4, max_hashes_per_bucket=100)
    # sizing helper: 10^10 urls → ~153k buckets of ≤2^16 hashes
    assert R.n_buckets_for(10_000_000_000) == -(-10_000_000_000 // (1 << 16))
    assert R.n_buckets_for(1000) == R.N_STATE_BUCKETS


def test_windowed_crawl_log_matches_batch(spark, tmp_path):
    """availableNow drain of the watermarked rollup: closed windows match
    the batch groupBy exactly; the final (unclosed) windows stay pending —
    append-mode watermark semantics."""
    from python_web_scraper_cleaner_spark.sources.pages import synthesize_pages

    in_dir = str(tmp_path / "pages")
    pages = synthesize_pages(spark, 500)   # warc_ts spans ~8 minutes
    pages.coalesce(1).write.parquet(in_dir)
    # a second file a day later forces the watermark past file-1 windows
    late = (synthesize_pages(spark, 50)
            .withColumn("warc_ts",
                        F.col("warc_ts") + F.make_interval(days=F.lit(1))))
    late.coalesce(1).write.mode("append").parquet(in_dir)

    stream = R.read_pages_stream(spark, in_dir, max_files_per_trigger=1)
    log = R.windowed_crawl_log(stream, window="1 minute", watermark="1 minute")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    R.run_stream_to_table(stream_df=log, checkpoint_dir=ckpt, out_path=out_dir)

    got = {(r.window_start, r.lang): (r.n_pages, r.html_bytes)
           for r in spark.read.parquet(out_dir).collect()}
    assert got, "no windows closed"

    batch = (spark.read.parquet(in_dir)
             .groupBy(F.window("warc_ts", "1 minute").alias("win"), "lang")
             .agg(F.count("*").alias("n_pages"),
                  F.sum(F.length("html")).alias("html_bytes"))
             .select(F.col("win.start").alias("window_start"),
                     "lang", "n_pages", "html_bytes"))
    expect = {(r.window_start, r.lang): (r.n_pages, r.html_bytes)
              for r in batch.collect()}
    for key, val in got.items():
        assert expect[key] == val, key
    # every emitted window is from the old (closed) event-time region
    assert all(ws < BASE + dt.timedelta(hours=12) for ws, _ in got)


def test_sliding_host_rate_batch_semantics(spark):
    """Sliding 1h/30min windows: each event lands in exactly two windows;
    counts verified against hand-placed timestamps (batch mode — the
    window arithmetic is identical in a stream)."""
    import datetime as dt

    from python_web_scraper_cleaner_spark.streaming.rounds import (
        sliding_host_rate)
    t = lambda h, m: dt.datetime(2026, 1, 1, h, m)
    rows = [("http://a.example/1", t(1, 10)),   # windows 00:30, 01:00
            ("http://a.example/2", t(1, 40)),   # windows 01:00, 01:30
            ("http://b.example/1", t(1, 40))]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp")
    got = {(r.window_start, r.host): r.n_fetches
           for r in sliding_host_rate(df).collect()}
    assert got[(t(1, 0), "a.example")] == 2      # both a-events overlap here
    assert got[(t(0, 30), "a.example")] == 1
    assert got[(t(1, 30), "a.example")] == 1
    assert got[(t(1, 30), "b.example")] == 1
    assert sum(v for (w, h), v in got.items() if h == "a.example") == 4
