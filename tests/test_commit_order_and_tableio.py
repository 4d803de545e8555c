"""Crash-window and maintenance regressions from the round-5 engine
review: the resume marker (crawl_log) must commit LAST so every crash
window replays; retries rows may never outlive their frontier url;
TableIO must survive torn snapshot files and >5-digit snapshot ids.
"""

import json
import os

from pyspark.sql import functions as F

from python_web_scraper_cleaner_spark.plans.crawl import CrawlEngine
from python_web_scraper_cleaner_spark.sources.tableio import TableIO


def _seeds(spark, n, n_hosts=3):
    rows = [(f"https://host{i % n_hosts}.test/p/{i}", 0,
             "2026-06-01T00:00:00") for i in range(n)]
    return (spark.createDataFrame(rows, "url string, priority int, "
                                  "discovered_ts string")
            .withColumn("discovered_ts",
                        F.to_timestamp("discovered_ts")))


def _robots(spark, n_hosts=3):
    return spark.createDataFrame(
        [(f"host{i}.test", [], [], 0) for i in range(n_hosts)],
        "host string, disallow_prefixes array<string>, "
        "allow_prefixes array<string>, crawl_delay_ms long")


def _rollback_to_round(io, name, round_id):
    for snap in reversed(io.snapshots(name)):
        if snap["round"] <= round_id:
            io.rollback(name, snap["snapshot"])
            return
    # no snapshot at/below round_id: drop the table pointer entirely
    os.remove(os.path.join(io.root, name, "LATEST"))


# ---------------------------------------------------------------------------
# crawl_log-last commit ordering
# ---------------------------------------------------------------------------


def test_crawl_log_is_the_last_commit_of_a_round(spark, tmp_path):
    """The resume marker must trail every other table's round id — a
    crash at ANY point inside run_round leaves crawl_log behind, so
    run() re-enters the round's replay path instead of skipping it."""
    eng = CrawlEngine(spark, str(tmp_path / "s"), per_host_budget=4,
                      discover_links=True)
    eng.bootstrap(_seeds(spark, 12), _robots(spark))
    eng.run(max_rounds=2)
    last = eng.last_round()
    # every member of the commit set is at (or past) the marker's round
    for t in ("pages", "url_seen", "bloom", "frontier"):
        assert (eng.io.latest_round(t) or -1) >= last, t


def test_crash_between_frontier_and_crawl_log_replays(spark, tmp_path):
    """THE window the old ordering could not heal: everything committed
    except the crawl_log marker. Resume must replay the round (not skip
    it), keep the discovered links in the frontier, and converge to the
    uninterrupted store."""
    def mk(root):
        e = CrawlEngine(spark, str(root), per_host_budget=4,
                        discover_links=True)
        e.bootstrap(_seeds(spark, 12), _robots(spark))
        return e

    full = mk(tmp_path / "full")
    full.run(max_rounds=3)

    crashed = mk(tmp_path / "c")
    crashed.run(max_rounds=3)
    # simulate: round-1 crash after the frontier advance, before the
    # marker — ONLY crawl_log rolls back
    _rollback_to_round(crashed.io, "crawl_log", 0)
    del crashed

    resumed = CrawlEngine(spark, str(tmp_path / "c"), per_host_budget=4,
                          discover_links=True)
    assert resumed.last_round() == 0          # marker behind ⇒ replay
    resumed.run(max_rounds=3)

    assert resumed.crawl_order() == full.crawl_order()
    assert resumed.seen_set() == full.seen_set()
    assert (resumed.io.read("pages").count()
            == full.io.read("pages").count())
    got = {r.canonical_url for r in resumed.io.read("frontier").collect()}
    want = {r.canonical_url for r in full.io.read("frontier").collect()}
    assert got == want                        # discovered links survived


def test_run_round_crash_not_mistaken_for_revisit_transition(
        spark, tmp_path):
    """With revisit=True, a run_round crash in the frontier→crawl_log
    window leaves frontier@r ahead of last_round — the exact signature
    an interrupted revisit transition has. The pages@r guard must route
    this to round replay, NOT to schedule_revisits (which would stamp a
    transition marker and skip the round's replay)."""
    def mk(root):
        e = CrawlEngine(spark, str(root), per_host_budget=4,
                        revisit=True)
        e.bootstrap(_seeds(spark, 12), _robots(spark))
        return e

    full = mk(tmp_path / "full")
    full.run(max_rounds=3)

    crashed = mk(tmp_path / "c")
    crashed.run(max_rounds=3)
    _rollback_to_round(crashed.io, "crawl_log", 0)
    del crashed

    resumed = CrawlEngine(spark, str(tmp_path / "c"), per_host_budget=4,
                          revisit=True)
    resumed.run(max_rounds=3)
    # a mis-detected transition would stamp a partition_id=-1 marker row
    markers = (resumed.io.read("crawl_log")
               .filter(F.col("partition_id") == -1).count())
    assert markers == 0
    assert resumed.crawl_order() == full.crawl_order()
    assert resumed.seen_set() == full.seen_set()


# ---------------------------------------------------------------------------
# retries never outlive their frontier url
# ---------------------------------------------------------------------------


def test_orphaned_retries_are_purged(spark, tmp_path):
    """A retries row whose url is no longer in the frontier (e.g. later
    dropped by the trap cap) must be purged at the next round's commit —
    otherwise run()'s idle-forward loop sees outstanding retries forever
    and burns the whole max_rounds budget on empty rounds."""
    eng = CrawlEngine(spark, str(tmp_path / "s"), per_host_budget=4,
                      retry_failed=True)
    eng.bootstrap(_seeds(spark, 8), _robots(spark))
    eng.run_round(1)
    # plant an orphan: a retries row for a url_hash not in the frontier
    orphan = spark.createDataFrame([(999999999, 1, 2)],
                                   "url_hash long, attempt int, "
                                   "due_round int")
    merged = eng.io.read("retries").unionByName(orphan)
    eng.io.overwrite(merged, "retries", 1)
    eng.run_round(2)
    frontier_hashes = {r.url_hash for r in
                       eng.io.read("frontier").collect()}
    retry_hashes = {r.url_hash for r in eng.io.read("retries").collect()}
    assert 999999999 not in retry_hashes
    assert retry_hashes <= frontier_hashes    # the invariant itself


# ---------------------------------------------------------------------------
# TableIO: torn snapshots + numeric snapshot ordering
# ---------------------------------------------------------------------------


def test_tableio_torn_snapshot_is_uncommitted_garbage(spark, tmp_path):
    io = TableIO(spark, str(tmp_path / "t"))
    df = spark.range(3).select(F.col("id"))
    io.overwrite(df, "x", 0)
    io.append_round(df, "x", 1)
    # crash mid-_commit: a torn snap file whose LATEST never advanced
    torn = os.path.join(io.root, "x", "snap-00003.json")
    with open(torn, "w") as f:
        f.write('{"snapshot": 3, "round": 2, "dirs": [')  # truncated
    assert io.latest_round("x") == 1          # reads unaffected
    assert [s["snapshot"] for s in io.snapshots("x")] == [1, 2]
    out = io.vacuum("x", keep_last=2)         # must not raise
    assert not os.path.exists(torn)           # torn file expired
    assert io.read("x").count() == 6
    assert out["expired_snapshots"] >= 1


def test_tableio_snapshot_order_is_numeric_past_5_digits(spark, tmp_path):
    io = TableIO(spark, str(tmp_path / "t"))
    df = spark.range(2)
    io.overwrite(df, "x", 0)
    td = os.path.join(io.root, "x")
    # simulate a store whose snapshot counter crossed 99999: rewrite the
    # one real snapshot under high ids (dirs stay valid)
    with open(os.path.join(td, "snap-00001.json")) as f:
        manifest = json.load(f)
    os.remove(os.path.join(td, "snap-00001.json"))
    for snap_num in (99999, 100000, 100001):
        m = dict(manifest, snapshot=snap_num, round=snap_num)
        with open(os.path.join(td, f"snap-{snap_num:05d}.json"), "w") as f:
            json.dump(m, f)
    with open(os.path.join(td, "LATEST"), "w") as f:
        f.write(f"{100001:05d}")
    snaps = [s["snapshot"] for s in io.snapshots("x")]
    assert snaps == [99999, 100000, 100001]   # numeric, not lexicographic
    io.vacuum("x", keep_last=2)
    kept = [s["snapshot"] for s in io.snapshots("x")]
    assert kept == [100000, 100001]           # newest two, NOT {99999,100001}
