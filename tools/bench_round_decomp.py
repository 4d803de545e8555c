"""Full-crawl-round throughput: quiet-box measurement + stage decomposition.

Round-3 verdict flagged the bench.py ``full_round`` number (3,471 → 3,189
urls/s file-to-file) with no solo quiet measurement to adjudicate it. This
tool applies the slice's own medicine (BENCH_SLICE_DECOMP.json):

1. INTEGRATED: ``CrawlEngine.run_round(0)`` on a fresh root, 1 untimed
   warm-up + min of N timed runs — the same work bench.py measures.
2. STAGED: the identical round replayed with persist+count barriers
   between its three phases, so the wall attributes to
     select   — frontier scan → robots broadcast → salted politeness top-k
     extract  — grouped fetch → vectorized clean-extract → lang tag
     commits  — pages/url_seen/bloom/crawl_log/frontier snapshot commits
   (barriers add work, so staged totals slightly exceed integrated wall;
   the SPLIT is the signal, not the sum).
3. SCALE FIT: integrated wall at three seed counts, least-squares
   ``sec = fixed + per_url * n`` — the load-robust engine-cost statement.

Writes BENCH_ROUND_DECOMP.json. Run on a quiet box (check /proc/loadavg);
loadavg is recorded before and after.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def loadavg() -> float:
    return round(os.getloadavg()[0], 2)


def integrated_round(spark, n_seeds: int) -> tuple:
    """(wall_sec, n_fetched) — n_fetched, not n_seeds, is the numerator
    bench.py's full_round metric uses (the politeness budget admits only
    part of the frontier into a round's batch)."""
    from python_web_scraper_cleaner_spark.plans.crawl import (
        CrawlEngine, default_robots, synthesize_seeds)
    root = tempfile.mkdtemp(prefix="spark_graft_rdec_")
    eng = CrawlEngine(spark, root, per_host_budget=max(64, n_seeds // 32),
                      hot_host_threshold=5000, n_salts=16)
    eng.bootstrap(synthesize_seeds(spark, n_seeds), default_robots(spark))
    t0 = time.time()
    stats = eng.run_round(0)
    dt = time.time() - t0
    assert stats["n_fetched"] > 0
    return dt, stats["n_fetched"]


def staged_round(spark, n_seeds: int) -> dict:
    """run_round(0)'s exact dataflow with a persist+count barrier after the
    select and extract phases. Mirrors plans/crawl.py:run_round — keep in
    sync with it (round 0: url_seen empty, so no bloom leg, same as the
    integrated metric)."""
    from pyspark.sql import functions as F

    from python_web_scraper_cleaner_spark.functions.udfs import (
        lang_id_udf, with_clean_text)
    from python_web_scraper_cleaner_spark.operators import frontier as FR
    from python_web_scraper_cleaner_spark.plans import crawl as C
    from python_web_scraper_cleaner_spark.plans.crawl import (
        CrawlEngine, default_robots, synthesize_seeds)

    root = tempfile.mkdtemp(prefix="spark_graft_rdec_staged_")
    eng = CrawlEngine(spark, root, per_host_budget=max(64, n_seeds // 32),
                      hot_host_threshold=5000, n_salts=16)
    eng.bootstrap(synthesize_seeds(spark, n_seeds), default_robots(spark))
    io = eng.io

    t0 = time.time()
    pending = io.read("frontier")
    robots = io.read("robots")
    allowed = FR.apply_robots(pending, robots)
    batch = FR.select_round_batch(allowed,
                                  per_host_budget=eng.per_host_budget,
                                  hot_host_threshold=eng.hot_host_threshold,
                                  n_salts=eng.n_salts)
    sched = FR.politeness_schedule(batch, trust_existing_slot=True).persist()
    n_sched = sched.count()
    t_select = time.time() - t0

    t0 = time.time()
    fetched = C.simulated_fetch(sched)
    cleaned = with_clean_text(fetched, output_format="txt")
    pages = (cleaned
             .withColumn("lang", F.when(F.col("ok"),
                                        lang_id_udf(F.col("text")))
                         .otherwise(F.lit("und")))
             .withColumn("round", F.lit(0))
             .withColumn("partition_id", F.spark_partition_id())
             .select("url", "canonical_url", "url_hash", "host", "priority",
                     "warc_ts", "round", "partition_id", "fetch_slot",
                     "scheduled_offset_ms", "fetch_ok", "text", "lang",
                     "ok", "extracted_chars", "error")
             .persist())
    n_fetched = pages.count()
    t_extract = time.time() - t0

    t0 = time.time()
    from python_web_scraper_cleaner_spark.operators import bloom as B
    io.append_round(pages, "pages", 0)
    new_seen = pages.select("url_hash", "canonical_url",
                            F.lit(0).cast("int").alias("first_seen_round"))
    io.append_round(new_seen, "url_seen", 0)
    delta = B.build_bloom(new_seen.select("url_hash"),
                          n_buckets=eng.n_bloom_buckets,
                          m_bits=eng._bloom_m, n_hashes=eng._bloom_k)
    io.overwrite(delta, "bloom", 0)
    log = (pages.groupBy("round", "partition_id")
           .agg(F.count("*").alias("n_urls"),
                F.sum(F.col("ok").cast("int")).alias("n_ok"),
                F.sum((~F.col("ok")).cast("int")).alias("n_err"),
                F.sum("extracted_chars").alias("extracted_chars"))
           .withColumn("wall_ts", F.lit(time.time()).cast("double")))
    io.append_round(log, "crawl_log", 0)
    remaining = pending.join(pages.select("canonical_url"),
                             "canonical_url", "left_anti")
    io.overwrite(remaining, "frontier", 0)
    io.read("frontier").count()
    t_commits = time.time() - t0

    sched.unpersist()
    pages.unpersist()
    return {"n_sched": n_sched, "n_fetched": n_fetched,
            "select_s": round(t_select, 3),
            "extract_s": round(t_extract, 3),
            "commits_s": round(t_commits, 3)}


def main() -> None:
    from python_web_scraper_cleaner_spark.session import build_session
    n_seeds = int(os.environ.get("SPARK_GRAFT_ROUND_N", "50000"))
    reps = int(os.environ.get("SPARK_GRAFT_ROUND_REPS", "3"))
    out = {"job": "full crawl round: quiet wall + stage decomposition",
           "method": ("integrated: 1 untimed warm-up + min of %d; staged: "
                      "min of %d with persist barriers; fit over 3 seed "
                      "counts, min of %d each" % (reps, reps, reps)),
           "loadavg_1m_start": loadavg()}
    spark = build_session(app_name="bench_round_decomp")
    spark.sparkContext.setLogLevel("ERROR")

    integrated_round(spark, n_seeds)          # warm-up (codegen, page-in)
    runs = [integrated_round(spark, n_seeds) for _ in range(reps)]
    best, n_fetched = min(runs)
    out["integrated"] = {
        "n_seeds": n_seeds, "n_fetched": n_fetched,
        "runs_sec": [round(w, 3) for w, _ in runs],
        "best_sec": round(best, 3),
        "fetched_urls_per_sec": round(n_fetched / best, 1),
        "loadavg_1m": loadavg(),
        "note": "fetched_urls_per_sec is bench.py full_round's metric "
                "(n_fetched/wall, politeness-admitted batch only)"}

    stages = [staged_round(spark, n_seeds) for _ in range(reps)]
    out["staged"] = min(stages, key=lambda s: (s["select_s"]
                                               + s["extract_s"]
                                               + s["commits_s"]))

    fit_runs, fetched_at = {}, {}
    for n in (n_seeds // 4, n_seeds, n_seeds * 4):
        rs = [integrated_round(spark, n) for _ in range(reps)]
        fit_runs[n] = [round(w, 3) for w, _ in rs]
        fetched_at[n] = rs[0][1]
    # fit over FETCHED urls (the work actually done), not seed count
    xs = sorted(fit_runs)
    ys = [min(fit_runs[x]) for x in xs]
    out["fetched_at"] = {str(k): v for k, v in fetched_at.items()}
    xs = [fetched_at[x] for x in xs]
    n_ = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n_ * sxy - sx * sy) / (n_ * sxx - sx * sx)
    fixed = (sy - slope * sx) / n_
    out["fit"] = {"runs_sec": {str(k): v for k, v in fit_runs.items()},
                  "fixed_s": round(fixed, 3),
                  "per_url_us": round(slope * 1e6, 3),
                  "marginal_urls_per_sec": round(1.0 / slope, 1)}
    out["loadavg_1m_end"] = loadavg()
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_ROUND_DECOMP.json"),
            "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
