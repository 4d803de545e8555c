"""Per-round cost of the round-5 CrawlEngine features, measured.

Round 4's verdict asked for frontier_priority (PageRank × revisit
due-ness) and the persisted MinHash signature index to run INSIDE the
production round loop; this tool prices that wiring: the same 3-round
crawl on the same seed list under four engine configs —

  static    — baseline (round-4 behavior)
  pagerank  — priority_mode='pagerank' (link harvest + edges commit per
              round, PageRank over the committed graph ranks each batch)
  dedup     — dedup_index=True (per-round band probe of sig_index +
              kept-docs band append)
  both      — pagerank + dedup together (the full production shape)

Each config runs on a fresh root, min of N reps (shared-host noise —
see BASELINE.md measurement caveat); overhead is reported vs the static
minimum. Writes BENCH_ENGINE_MODES.json.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SEEDS = int(os.environ.get("SPARK_GRAFT_MODES_SEEDS", "20000"))
ROUNDS = 4
REPS = int(os.environ.get("SPARK_GRAFT_MODES_REPS", "2"))

MODES = {
    "static": {},
    "pagerank": {"priority_mode": "pagerank"},
    # rank_refresh_every=2: rank the frozen graph once per 2-round
    # window (the production cadence lever) — rounds 2-3 share one
    # persisted rank frame instead of re-ranking per round
    "pagerank_k2": {"priority_mode": "pagerank", "rank_refresh_every": 2},
    # the alternative centralities on the same rank seam: OPIC
    # (hist+cash, one src-join + one dst-sum + 1-row dangling agg per
    # round — cheaper per iteration than pagerank's profile plus its
    # dangling scalar) and seed-teleport TrustRank (adds the broadcast
    # seed-flag join once per refresh basis)
    "opic": {"priority_mode": "opic"},
    "trustrank": {"priority_mode": "trustrank"},
    "dedup": {"dedup_index": True},
    "both": {"priority_mode": "pagerank", "dedup_index": True},
    # archival sink: per-round WARC+WET segment commits (gzip members)
    "archive": {"archive": True},
    # re-crawl substrate: per-round fetch_history change-observation
    # commits (the Cho–G-M revisit loop's input; transitions themselves
    # only fire on frontier drain, so this prices the per-round tax)
    "revisit": {"revisit": True},
    # observed-latency politeness: per-round exact-p95 estimate over
    # committed pages + broadcast delay override before selection
    "adaptive_delay": {"adaptive_delay": True, "round_ms": 10_000_000},
    # RFC 9309 wildcard robots matching: broadcast side carries
    # pattern→regex rules; prices the per-candidate regex gate vs the
    # prefix-only path
    "robots_wildcard": {"robots_wildcard": True},
    # URL pre-fetch filter: per-candidate lexical gate at both frontier
    # ingestion points (bootstrap + discovery)
    "url_filter": {"url_filter": True},
    # transient-failure retry: per-round retries-ledger gate join +
    # done-set filtering + ledger overwrite commit (~12.5% of fetches
    # fail transiently under the simulated seam and re-enter later
    # rounds, so n_fetched counts attempts, not urls)
    "retry": {"retry_failed": True, "max_attempts": 3,
              "retry_backoff_rounds": 1},
    # aggressive URL canonicalization: tracking-param strip + param sort
    # on raw candidates at both ingestion points (pure projection)
    "strip_tracking": {"strip_tracking": True},
    # C4 line-quality verdict: higher-order array exprs over the
    # extracted text in the same projection as the extract stage — the
    # cheapest mode by construction (no new table, no join, no shuffle)
    "c4_filter": {"c4_filter": True},
    # meta-robots directives: two regexps over fetched html in the
    # extract projection (noindex/nofollow stamps + link-harvest gate)
    "directives": {"honor_directives": True},
    # archival payload dedup on top of the archive sink: per-round
    # capture-digest UDF + one digest-keyed agg/join against the
    # committed archive_digests table + the digests commit (a fresh
    # crawl re-captures nothing, so this prices pure bookkeeping; the
    # payoff lands in revisit re-crawls, where stubs replace payloads)
    "archive_dedup": {"archive": True, "archive_dedup": True},
}


def loadavg() -> float:
    return round(os.getloadavg()[0], 2)


def run_config(spark, kwargs) -> tuple:
    """(wall_sec, n_fetched) for ROUNDS rounds on a fresh store."""
    from python_web_scraper_cleaner_spark.plans.crawl import (
        CrawlEngine, default_robots, synthesize_seeds)
    root = tempfile.mkdtemp(prefix="spark_graft_modes_")
    try:
        eng = CrawlEngine(spark, root,
                          per_host_budget=max(64, N_SEEDS // 128),
                          hot_host_threshold=5000, n_salts=16, **kwargs)
        eng.bootstrap(synthesize_seeds(spark, N_SEEDS),
                      default_robots(spark))
        t0 = time.time()
        fetched = 0
        for r in range(ROUNDS):
            fetched += eng.run_round(r)["n_fetched"]
        dt = time.time() - t0
        assert fetched > 0
        return dt, fetched
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from python_web_scraper_cleaner_spark.session import build_session

    spark = build_session()
    out = {"n_seeds": N_SEEDS, "rounds": ROUNDS, "reps": REPS,
           "loadavg_1m_start": loadavg(), "modes": {}}
    run_config(spark, {})  # one untimed warm-up (JVM/codegen/Arrow paths)
    for name, kwargs in MODES.items():
        walls, fetched = [], 0
        for _ in range(REPS):
            dt, fetched = run_config(spark, kwargs)
            walls.append(round(dt, 2))
        best = min(walls)
        out["modes"][name] = {
            "walls": walls, "best_wall": best, "n_fetched": fetched,
            "urls_per_sec": round(fetched / best, 1)}
    base = out["modes"]["static"]["best_wall"]
    out["overhead_vs_static"] = {
        name: round(m["best_wall"] / base, 3)
        for name, m in out["modes"].items()}
    out["loadavg_1m_end"] = loadavg()
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_ENGINE_MODES.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
