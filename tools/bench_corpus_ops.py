"""Scale smoke for the round-4/5 corpus operators: do the plans hold when
the input is 100-1000× the sf0.1 tables?

Synthesizes inputs with spark.range (no disk, pure generation cost is
measured separately via a count-only baseline) and times:

- stratified_sample: 10M rows, 8 strata — the keep decision must stay a
  pure filter (wall ≈ the count-only baseline + hash math).
- pack_shards: 5M rows — the distributed prefix sum's single-partition
  window sees only n/bucket_width bucket totals; wall must stay in the
  seconds, not the minutes a naive global window would cost.
- revisit_schedule: 5M fetch rows over 100k pages — one exchange.
- substring_dup_spans: 300k docs (~12M k=20 windows, 10% carrying a
  shared 30-token block) — the window-hash count must combine map-side
  and only hit windows may reach the per-doc span merge.

Writes BENCH_CORPUS_OPS.json. Run on a quiet box; loadavg recorded.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from python_web_scraper_cleaner_spark.operators.frontier import (
        revisit_schedule)
    from python_web_scraper_cleaner_spark.operators.sampling import (
        pack_shards, stratified_sample)
    from python_web_scraper_cleaner_spark.session import build_session

    spark = build_session(app_name="bench_corpus_ops")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"job": "round-4/5 corpus ops at 100-1000x sf0.1 row counts",
           "loadavg_1m_start": round(os.getloadavg()[0], 2)}

    def best_of(fn, n=3):
        walls = []
        for _ in range(n):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        return walls

    # -- stratified sample, 10M rows ------------------------------------
    docs = (spark.range(10_000_000)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("lang"), (F.col("id") % 8).cast("string"))
                    .alias("lang")))
    base = best_of(lambda: docs.count())
    sample = best_of(lambda: (
        stratified_sample(docs, strata_cols=["lang"], id_col="doc_id",
                          target=100_000)
        .agg(F.sum(F.col("sampled").cast("long"))).collect()))
    out["stratified_sample_10m"] = {
        "count_only_baseline_sec": base, "sample_sec": sample,
        "note": "sample wall minus baseline = md5 + filter + stratum agg"}

    # -- pack_shards, 5M rows -------------------------------------------
    toks = (spark.range(5_000_000)
            .select(F.col("id").alias("doc_id"),
                    (F.col("id") % 997 + 10).alias("n_toks")))
    packed = best_of(lambda: (
        pack_shards(toks, id_col="doc_id", tokens_col="n_toks",
                    budget=1_000_000, bucket_width=10_000)
        .agg(F.max("shard_id"), F.count("*")).collect()))
    out["pack_shards_5m"] = {
        "sec": packed,
        "bucket_totals_rows": 5_000_000 // 10_000,
        "note": "single-partition window sees 500 bucket totals, not 5M"}

    # -- revisit_schedule, 5M fetches over 100k pages ---------------------
    hist = (spark.range(5_000_000)
            .select((F.col("id") % 100_000).alias("page_id"),
                    F.timestamp_seconds(F.lit(1_750_000_000)
                                        + F.col("id")).alias("ts"),
                    F.col("id").alias("fetch_id"),
                    (F.col("id") % 7 == 0).alias("changed")))
    rev = best_of(lambda: (
        revisit_schedule(hist)
        .agg(F.sum("unchanged_tail"), F.count("*")).collect()))
    out["revisit_5m_fetches_100k_pages"] = {"sec": rev}

    # -- substring dup spans, 300k docs (~12M k=20 windows) ---------------
    from python_web_scraper_cleaner_spark.operators.dedup import (
        substring_dup_spans)
    shared = " ".join(f"d{i}" for i in range(30))
    uniq = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), F.lit(60)),
        lambda j: F.concat(F.lit("t"), ((F.col("id") * 61 + j)
                                        % 1_000_000_000).cast("string"))))
    corpus = (spark.range(300_000)
              .select(F.col("id").alias("doc_id"),
                      F.when(F.col("id") % 10 == 0,
                             F.concat(F.lit(shared + " "), uniq))
                      .otherwise(uniq).alias("text")))
    sub = best_of(lambda: (
        substring_dup_spans(corpus, k=20)
        .agg(F.count("*"), F.sum("dup_tokens")).collect()))
    sub_reuse = best_of(lambda: (
        substring_dup_spans(corpus, k=20, reuse_windows=True)
        .agg(F.count("*"), F.sum("dup_tokens")).collect()))
    out["substring_dup_300k_docs_12m_windows"] = {
        "sec": sub, "sec_reuse_windows": sub_reuse,
        "note": ("every 10th doc carries a shared 30-token block -> 30k "
                 "docs flagged; dup-hash side stays partial-combined; "
                 "only hit windows reach the span merge; reuse_windows "
                 "localCheckpoints the fingerprint frame so both "
                 "branches share one materialization")}

    # -- inverted-index build + serve, 1M docs / ~10M token rows ----------
    # three corpus-wide stopwords (df = 1M each) are the salted-top-k
    # stress case: n_salts=64 bounds their per-salt collect at ~15.6k
    # entries; n_salts=1 makes the same collect 1M structs on ONE reducer
    from python_web_scraper_cleaner_spark.operators.search import (
        posting_heads, postings_lookup)
    idocs = (spark.range(1_000_000)
             .select(F.col("id").alias("doc_id"),
                     F.concat(
                         F.lit("the a of w"),
                         (F.col("id") % 50_000).cast("string"),
                         F.lit(" v"), (F.col("id") % 997).cast("string"),
                         F.lit(" x"), (F.col("id") % 31).cast("string"),
                         F.lit(" the a of the")).alias("text")))
    heads64 = best_of(lambda: (
        posting_heads(idocs, k=10, n_salts=64)
        .agg(F.count("*"), F.sum("cf")).collect()), n=2)
    heads1 = best_of(lambda: (
        posting_heads(idocs, k=10, n_salts=1)
        .agg(F.count("*"), F.sum("cf")).collect()), n=2)
    stored = posting_heads(idocs, k=10, n_salts=64).persist()
    stored.count()
    probe = best_of(lambda: (
        postings_lookup(stored, ["the", "v7", "x3"], k=10).collect()))
    stored.unpersist()
    out["postings_1m_docs_10m_tokens"] = {
        "build_sec_n_salts_64": heads64,
        "build_sec_n_salts_1": heads1,
        "probe_sec_persisted_heads": probe,
        "note": ("3 stopwords with df=1M; 64 salts bound their per-salt "
                 "collect at ~15.6k entries vs 1M structs (~16 MB) on "
                 "ONE reducer at n_salts=1. At this scale the unsalted "
                 "collect still fits and is ~1.5x faster (one fewer "
                 "combine stage) - the salting buys the BOUND, not demo "
                 "speed: at 100-TB df the unsalted shape cannot complete "
                 "at all; probe = IN-filter + 30-row head explode + "
                 "TakeOrderedAndProject against the persisted heads")}

    # -- index maintenance: delta merge + takedown retract + compact ------
    # the per-round costs a deployment actually pays: merge two 500k-doc
    # round indexes (index-sized work), retract a 10k-doc takedown batch
    # (batch-sized work), compact the decayed heads (affected-token work)
    from python_web_scraper_cleaner_spark.operators.search import (
        compact_postings, merge_posting_heads, retract_from_postings)
    ha = posting_heads(idocs.filter("doc_id % 2 = 0"),
                       k=10, n_salts=64).persist()
    hb = posting_heads(idocs.filter("doc_id % 2 = 1"),
                       k=10, n_salts=64).persist()
    full = posting_heads(idocs, k=10, n_salts=64).persist()
    ha.count(); hb.count(); full.count()
    merge = best_of(lambda: (
        merge_posting_heads(ha, hb, k=10)
        .agg(F.count("*"), F.sum("cf")).collect()), n=2)
    removed = idocs.filter("doc_id % 100 = 7")  # 10k-doc takedown batch
    retract = best_of(lambda: (
        retract_from_postings(full, removed)
        .agg(F.count("*"), F.sum("cf")).collect()), n=2)
    surviving = idocs.filter("doc_id % 100 <> 7")
    retracted = retract_from_postings(full, removed).persist()
    retracted.count()
    compact = best_of(lambda: (
        compact_postings(retracted, surviving, k=10, n_salts=64)
        .agg(F.count("*"), F.sum("cf")).collect()), n=2)
    for df_ in (ha, hb, full, retracted):
        df_.unpersist()
    out["postings_maintenance_1m_docs"] = {
        "merge_two_500k_indexes_sec": merge,
        "retract_10k_batch_sec": retract,
        "compact_after_retract_sec": compact,
        "note": ("merge = one tok aggregate over two persisted "
                 "index-sized tables (no corpus re-scan); retract = "
                 "batch re-tokenize + broadcast correction join; "
                 "compact re-scans ONLY affected tokens via broadcast "
                 "semi-join above the tokenizer explode")}

    # -- DUST rule mining, 2M alias urls over 500k pages -------------------
    from python_web_scraper_cleaner_spark.operators.frontier import (
        dust_param_rules)
    d = F.col("id")
    base_url = F.concat(F.lit("http://h"), (d % 5_000).cast("string"),
                        F.lit("/p"), d.cast("string"))
    pg = spark.range(500_000)
    dtext = F.concat(F.lit("page body "), d.cast("string"))
    aliases = (pg.select(F.concat(base_url, F.lit("?id="),
                                  d.cast("string")).alias("url"),
                         dtext.alias("text"))
               .unionByName(pg.select(
                   F.concat(base_url, F.lit("?id="), d.cast("string"),
                            F.lit("&sess=s"),
                            ((d * 7) % 997).cast("string")).alias("url"),
                   dtext.alias("text")))
               .unionByName(pg.select(
                   F.concat(base_url, F.lit("?id="), d.cast("string"),
                            F.lit("&utm=u"),
                            (d % 13).cast("string")).alias("url"),
                   dtext.alias("text")))
               .unionByName(pg.filter(d % 2 == 0).select(
                   F.concat(base_url, F.lit("?id="), d.cast("string"),
                            F.lit("&page=2")).alias("url"),
                   F.concat(dtext, F.lit(" p2")).alias("text"))))
    dust = best_of(lambda: (
        dust_param_rules(aliases, min_support=2)
        .agg(F.count("*"), F.sum("support")).collect()), n=2)
    out["dust_rules_2m_aliases_500k_pages"] = {
        "sec": dust,
        "note": ("3.5M alias rows, 5k hosts, sess+utm vary per group -> "
                 "10k (host, param) rules; no pair self-join — two "
                 "map-combined aggregates on (host, base, digest)")}

    # -- WARC revisit dedup plan, 5M records, ~33% re-captures -------------
    from python_web_scraper_cleaner_spark.sources.warc import (
        revisit_dedup_plan)
    rec = (spark.range(5_000_000)
           .select(F.concat(F.lit("http://h"), (d % 10_000).cast("string"),
                            F.lit("/p"), (d % 3_300_000).cast("string"))
                   .alias("url"),
                   F.concat(F.lit("t"),
                            F.lpad(d.cast("string"), 9, "0")).alias("ts"),
                   F.concat(F.lit("payload "),
                            (d % 3_300_000).cast("string")).alias("html")))
    revp = best_of(lambda: (
        revisit_dedup_plan(rec, ts_col="ts")
        .agg(F.sum("saved_bytes"),
             F.sum(F.when(F.col("record_type") == "revisit", 1)
                   .otherwise(0))).collect()), n=2)
    out["warc_revisit_plan_5m_records"] = {
        "sec": revp,
        "note": ("~1.7M re-captures become revisit stubs; payload never "
                 "crosses an exchange — one digest-keyed partial-min agg "
                 "+ join-back")}

    # -- cluster-balanced sampling, 5M assigned vectors, 4k clusters -------
    from python_web_scraper_cleaner_spark.operators.sampling import (
        cluster_balanced_sample)
    asg = (spark.range(5_000_000)
           .select(F.col("id"), ((F.col("id") * 2654435761) % 4_096)
                   .cast("int").alias("cid")))
    cbs = best_of(lambda: (
        cluster_balanced_sample(asg, cap_per_cluster=100)
        .agg(F.sum(F.col("kept").cast("long")),
             F.count("*")).collect()), n=2)
    out["cluster_balanced_5m_rows_4k_clusters"] = {
        "sec": cbs,
        "note": ("rank + cluster size share ONE hashpartitioning(cid) "
                 "exchange; ~1.2k rows/cluster sort per task")}

    # -- distinct sketches + weighted sampling, 20M refs / 10M docs -------
    from python_web_scraper_cleaner_spark.operators.frontier import (
        distinct_hll, distinct_linear_count)
    from python_web_scraper_cleaner_spark.operators.sampling import (
        weighted_sample_keys)
    d = F.col("id")
    refs20 = (spark.range(20_000_000)
              .select(F.concat(F.lit("h"), (d % 64).cast("string"))
                      .alias("host"),
                      F.concat(F.lit("u"), ((d * 37) % 500_000)
                               .cast("string")).alias("url")))
    lc = best_of(lambda: (
        distinct_linear_count(refs20, m=4096)
        .agg(F.sum("buckets_used"), F.count("*")).collect()), n=2)
    out["linear_count_20m_refs_64_hosts"] = {
        "sec": lc,
        "note": ("≤4096 integers per host cross the exchange; the "
                 "500k-distinct url strings never shuffle")}
    hll = best_of(lambda: (
        distinct_hll(refs20)
        .agg(F.sum("est_distinct"), F.count("*")).collect()), n=2)
    out["hll_20m_refs_64_hosts"] = {
        "sec": hll,
        "note": "≤256 registers per host; same scan, register max-agg"}
    wdocs = (spark.range(10_000_000)
             .select(F.col("id").alias("doc_id"),
                     (1 + F.col("id") % 5).alias("w")))
    ws = best_of(lambda: (
        weighted_sample_keys(wdocs, id_col="doc_id", weight_col="w")
        .orderBy("ticket_key", "doc_id").limit(1000).count()), n=2)
    out["weighted_sample_10m_docs_top1k"] = {
        "sec": ws,
        "note": ("ticket min folded in the projection (≤5 md5/row); "
                 "plan = scan → TakeOrderedAndProject, no shuffle")}

    out["loadavg_1m_end"] = round(os.getloadavg()[0], 2)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_CORPUS_OPS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
