"""Hot-host skew evidence: salted vs unsalted per-host round selection.

north_rule: "host-key salting and AQE-aware repartitioning handle
hot-domain skew explicitly". This benchmark builds a frontier where one
host owns ~50% of all URLs, then runs the round-batch window selection
(operators/frontier.select_round_batch) with and without salting and
reports wall time + the per-host budget invariant (identical totals both
ways — salting is a physical rewrite, not a semantic one).

Run: python tools/bench_salting.py   → stdout JSON + BENCH_SALTING.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 4_000_000
BUDGET = 100_000


def make_frontier(spark):
    from pyspark.sql import functions as F

    ids = spark.range(N, numPartitions=32)
    # half the urls on megahost, the rest spread over 63 hosts
    host = (F.when(F.col("id") % 2 == 0, F.lit("megahost.example"))
            .otherwise(F.concat(F.lit("host"),
                                (F.col("id") % 63).cast("string"),
                                F.lit(".example"))))
    return ids.select(
        host.alias("host"),
        F.concat(F.lit("https://"), host, F.lit("/p/"),
                 F.col("id").cast("string")).alias("canonical_url"),
        (F.col("id") % 10).cast("int").alias("priority"),
        (F.to_timestamp(F.lit("2026-01-01"))
         + F.make_interval(secs=F.col("id") % 86400)).alias("warc_ts"),
        F.lit(0).cast("long").alias("crawl_delay_ms"))


def run(spark, frontier, *, salted: bool) -> dict:
    from pyspark.sql import functions as F

    from python_web_scraper_cleaner_spark.operators.frontier import (
        select_round_batch)

    t0 = time.time()
    batch = select_round_batch(
        frontier, per_host_budget=BUDGET,
        hot_host_threshold=(500_000 if salted else None), n_salts=16)
    per_host = {r["host"]: r["n"] for r in
                (batch.groupBy("host").agg(F.count("*").alias("n"))
                 .collect())}
    dt = time.time() - t0
    return {"sec": round(dt, 3), "total": sum(per_host.values()),
            "megahost": per_host.get("megahost.example", 0),
            "n_hosts": len(per_host)}


def main() -> None:
    from python_web_scraper_cleaner_spark.session import build_session

    spark = build_session(app_name="bench_salting")
    spark.sparkContext.setLogLevel("ERROR")
    frontier = make_frontier(spark).persist()
    frontier.count()

    # interleave, take best-of-2 per mode to damp JIT/cache noise
    runs = {"unsalted": [], "salted": []}
    for _ in range(2):
        runs["unsalted"].append(run(spark, frontier, salted=False))
        runs["salted"].append(run(spark, frontier, salted=True))
    best = {k: min(v, key=lambda r: r["sec"]) for k, v in runs.items()}

    out = {
        "n_frontier": N, "budget_per_host": BUDGET,
        "skew": "megahost holds 50% of frontier",
        "unsalted": best["unsalted"],
        "salted": best["salted"],
        "speedup": round(best["unsalted"]["sec"] / best["salted"]["sec"], 2),
        "budget_equal": (best["unsalted"]["megahost"]
                         == best["salted"]["megahost"] == BUDGET),
        "note": ("salting splits the megahost window across 16 sub-groups; "
                 "a second per-host window over the salted survivors caps "
                 "selection at exactly min(B, pending) — no salt-rounding "
                 "overshoot"),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SALTING.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
