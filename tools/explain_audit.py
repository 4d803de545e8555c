"""Physical-plan audit: proves pushdown/pruning/join-strategy claims.

Writes PLANS_AUDIT.md with, for each audited registry query, the scan
lines (PushedFilters + ReadSchema — the "filter reached parquet" and
"column pruning" evidence), every join node with its strategy, and every
exchange — the artifacts a reviewer checks for 100 TB readiness.

Run: python tools/explain_audit.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = [
    ("p1_scan_filter_project", "filter+projection pushdown into parquet"),
    ("tpch_q3_topk", "broadcast joins for dims, single shuffle for the agg"),
    ("tpch_q5_local_supplier", "5-table join: 3 broadcasts, orderkey shuffle"),
    ("j1_urlseen_antijoin", "anti-join dedup, aggregate pushdown"),
    ("o4_perhost_topk", "per-host window (politeness top-k)"),
    ("window_top_orders", "WindowGroupLimit (top-k without full sort)"),
    ("ann_cosine_topk", "broadcast NL join + WindowGroupLimit rank pushdown"),
    ("mm_media_features", "column pruning: only (doc_id, text) read"),
    ("events_hourly", "partial+final hash aggregation"),
    ("dedup_minhash_lsh",
     "no global-distinct exchange on the shingle frame (per-doc "
     "array_distinct); signature shuffle = |docs|×16 longs post-combine"),
    ("p8_conditional_projection", "conditional projection stays codegen"),
    ("asof_rate_join",
     "as-of via union+window: single exchange on the group key, no range "
     "explode"),
    ("incident_windows",
     "interval join via bucket expansion: equi-join, not a range cross "
     "join (no BroadcastNestedLoopJoin node)"),
    ("ann_ivf_kmeans",
     "k-means/IVF assignment argmax via max_by: partial_max_by on the map "
     "side, no per-id row_number window exchange"),
    ("read_get_article",
     "point lookup by derived key: single scan, tiny result (bucketed "
     "single-probe shape at 100 TB)"),
    ("quality_repetition",
     "per-row sort+run-length aggregate: the only exchange is the final "
     "orderBy — gram counting never shuffles"),
    ("paragraph_dedup",
     "first-occurrence chunk dedup: partial_min(struct) carries the "
     "winning chunk inside the aggregate — two exchanges total (md5 key, "
     "then doc id), no join-back of the exploded frame, no window"),
    ("link_pagerank",
     "3 unrolled PageRank iterations: per iteration one src-keyed join + "
     "one partial/final integer SUM on dst; out-degree computed once and "
     "reused; top-20 via TakeOrderedAndProject, no full sort"),
    ("dedup_keep_best",
     "keep/drop tail after component closure (CC rounds audited below): "
     "per-component argmax via partial_max_by on a single bigint key — "
     "map-side combine, no window exchange, no member lists"),
    ("bm25_topk",
     "corpus-relative relevance: ONE 1-row stats aggregate "
     "(partial_count/partial_sum map-side, SinglePartition final), "
     "IdentityBroadcastMode onto the scoring scan, score filter evaluated "
     "inside the BroadcastNestedLoopJoin condition, top-20 via "
     "TakeOrderedAndProject — no wide shuffle anywhere"),
    ("decontaminate_ngram",
     "probe shingle hashes broadcast (BuildRight HashedRelation); corpus "
     "8-gram explode is narrow over the union-of-scans (dup-corpus "
     "variants pushed as DataFilters); only HIT rows reach the "
     "groupBy(id) partial_count — the corpus never shuffles a shingle"),
    ("dedup_incremental",
     "batch-vs-index LSH: the NEW-batch band frame is the broadcast build "
     "side probing the index bands (no corpus self-join); signature "
     "minhashes combine map-side (partial_min) before their per-doc "
     "shuffle; Jaccard verify joins only candidate docs' shingles"),
    ("sample_stratified",
     "stratified corpus sampling: the keep decision is a PURE FILTER "
     "(md5 basis points vs broadcast per-stratum threshold) — the only "
     "exchanges are the tiny stratum-count aggregate and the audit "
     "re-aggregate; no window, corpus scan itself shuffle-free"),
    ("pack_shards",
     "distributed prefix sum: per-bucket window cumsums after one hash "
     "exchange; ONLY bucket totals cross the SinglePartition window; "
     "global offsets broadcast back — the corpus never funnels through "
     "one task"),
    ("frontier_revisit",
     "revisit backoff: the row_number window and the per-page aggregate "
     "share one hashpartitioning(page_id) exchange — no second exchange "
     "before the final presentation sort"),
    ("lm_familiarity",
     "trigram-LM scoring: vocab-bounded model broadcast onto the exploded "
     "doc-trigram stream (BuildRight), per-doc sum is the only doc-keyed "
     "exchange; 1-row total broadcast; integer div scoring stays codegen"),
    ("cdx_prefix_scan",
     "SURT prefix lookup: here the key is COMPUTED from the url, so the "
     "StartsWith evaluates post-projection inside codegen (single narrow "
     "scan, no exchange before the filter); cdx_stored_lookup below is "
     "the stored-key plan a real deployment runs"),
    ("dedup_substring",
     "exact-substring spans: the window frame is id-fanned then "
     "materialized ONCE (reuse_windows localCheckpoint — count and hit "
     "branches share it, 2x measured); the dup-hash side is a map-side-"
     "combined HashAggregate pair around ONE exchange joining back as "
     "the BROADCAST build side at this scale (at 100 TB AQE decides "
     "broadcast-vs-skew-shuffle from the measured dup rate); both "
     "span-merge Window ops share ONE per-doc sort+exchange; only hit "
     "rows reach it"),
    ("host_reputation",
     "domain rollup: gopher gate + md5 digest + host in ONE projection "
     "(no corpus-by-id joins); per-doc frame id-fanned and materialized "
     "once (reuse_rows); digest count = partial-combined HashAggregate "
     "around one exchange, surviving dup digests probe back as the "
     "BROADCAST build side; ONE host exchange; the verdict table is "
     "broadcast-sized for downstream corpus filters"),
    ("pipeline_host_substring",
     "composed gate→dedup→rollup: the ok-host verdict side collapses to "
     "a BroadcastExchange feeding a left_semi BroadcastHashJoin (the "
     "corpus is never hash-partitioned by host for the gate); the kept "
     "corpus is persisted + id-fanned ONCE for its three consumers "
     "(InMemoryTableScan below, 2.6x measured); the substring stage "
     "inherits its audited shape; assembly adds only host-keyed "
     "partial-combined aggregates"),
    ("chunk_documents",
     "context-window chunking: split→sequence→posexplode→slice all "
     "inside whole-stage codegen — NO exchange before the final orderBy "
     "(the corpus scan is shuffle-free; chunk text leaves the stage "
     "only as its own rows)"),
    ("sample_by_quality",
     "quality-mixture sampling: one doc-keyed exchange for the "
     "familiarity sum, 1-row min/max + model broadcasts, tiny "
     "per-bucket aggregate; the keep decision is a pure filter — no "
     "per-stratum sort or window"),
    ("cdx_stored_lookup",
     "the same prefix lookup against the STORED surt-sorted index: "
     "expect PushedFilters: [IsNotNull(surt), StringStartsWith(surt, "
     "com,example,host3)/)] on the parquet scan — the predicate reaches "
     "the reader, and with the index range-partitioned+sorted on surt, "
     "row-group stats turn the lookup into a contiguous range read at "
     "10^10 rows"),
    ("frontier_priority",
     "composed next-fetch ordering: PageRank iterations' own shuffles + "
     "one revisit window/aggregate sharing a page_id exchange + an "
     "8-byte-key join + TakeOrderedAndProject — no extra exchanges "
     "added by the composition"),
    ("robots_sitemap_discovery",
     "robots→index→urlsets discovery chain: every parse stage is "
     "regexp_extract_all+explode inside codegen (zero UDFs); the "
     "advertised→index and refs→urlset joins carry per-host-small build "
     "sides (broadcast); the only wide exchange is the final per-host "
     "rollup"),
    ("resolve_redirects",
     "path doubling: per round ONE self-join of the pointer table keyed "
     "on the jump target (8-byte-ish string keys) over a checkpointed "
     "scan — no window, no per-hop rounds; final projection is "
     "codegen-only"),
    ("strip_boilerplate",
     "three exchanges total: line doc-frequency takes two (the "
     "(host,line_hash,id) distinct with map-side partials, then the "
     "(host,line_hash) count — line TEXT never shuffles, hashes do), "
     "and the per-doc regroup whose sort_array((pos,line)) runs inside "
     "the aggregate (not a window) takes the third; boilerplate "
     "verdicts join back as a BroadcastHashJoin build side"),
    ("trap_detection",
     "aggregates all the way down: (host,path,query-hash) distinct with "
     "partial combine, per-(host,path) count, per-host rollup via "
     "min_by struct — no windows, no UDFs, query strings collapse to "
     "hashes before any exchange"),
    ("robots_wildcard_gate",
     "RFC 9309 wildcard gate: pattern→regex built once on the broadcast "
     "robots side (BroadcastHashJoin, no UDF anywhere), per-URL match is "
     "a codegen higher-order filter; one exchange total (final host agg "
     "with partial combine)"),
    ("registrable_domain",
     "PSL lookup with the rule set folded to literal arrays: zero joins, "
     "zero per-row exchanges — the only Exchange is the final rollup "
     "agg with partial combine; scan prunes to doc_id"),
    ("snapshot_diff",
     "cross-snapshot diff: md5 digests computed map-side so text never "
     "shuffles — only (url, digest) crosses the full-outer SortMergeJoin "
     "exchanges; at scale both snapshots are url-bucketed (zero-exchange "
     "SMJ), demo pays the two url hash exchanges + partial-agg rollup"),
    ("c4_line_filter",
     "C4 line cleaning adds ZERO exchanges to the extraction scan: the "
     "keep decision and all per-page stats are higher-order array exprs "
     "in the same projection as the pandas-UDF extract — the only "
     "Exchange is the demo's final orderBy; no window, no join, no "
     "Python beyond the mandated extraction kernel"),
    ("wat_scan_links",
     "WAT link ingestion: segment blob consumed inside the Arrow stage, "
     "from_json+explode run whole-stage JVM; the demo's countDistinct "
     "rollup takes the standard two-level distinct-agg shape — partial "
     "(target,src) collapse then the target agg, both map-side combined "
     "— so only 8-byte-ish key pairs ever shuffle, never JSON or HTML"),
    ("page_directives",
     "meta-robots + rel=canonical extraction: all three regexps and the "
     "canonical/self defaults evaluate in ONE codegen projection with "
     "the html column dropped inside it — the wide blob never reaches "
     "an exchange; the only exchanges are the fixture's doc_id "
     "build-join and the final presentation sort"),
    ("soft404_detect",
     "soft-404 verdict: five contains probes + one regexp + the token "
     "count all in a single projection over the union-of-scans (inject "
     "branches pushed as DataFilters); ZERO exchanges before the final "
     "orderBy — a pushdown-friendly corpus filter like url_prefilter"),
    ("revalidation_plan",
     "conditional-GET pricing: the history row_number window and the "
     "per-page aggregate share ONE hashpartitioning(page_id) exchange "
     "(the revisit_schedule shape, reused); the validator frame joins "
     "on the same 8-byte key; byte/bp math stays codegen"),
    ("meta_refresh_chain",
     "meta-refresh soft redirects: four regexp extractions + html drop "
     "in the scan-side projection; the path-doubling resolver exchanges "
     "only (src, dst) url pairs per jump round with localCheckpoint "
     "lineage cuts; the delay join is url-keyed — no text, no html, no "
     "window anywhere"),
    ("quality_linear",
     "linear quality classifier: the weight table folds into a literal "
     "create_map INSIDE the projection — expect ZERO Exchange operators "
     "over the corpus scan (the demo orderBy is the only wide op); both "
     "F.aggregate passes stay in whole-stage codegen"),
    ("canonical_fold",
     "canonical-group folding: the directive extraction (regexps + "
     "canonical default) stays in the scan-side projection; the ONLY "
     "wide exchange is the canonical_url groupBy with map-side partial "
     "aggregation — html never reaches it, noindex/representative fold "
     "inside the aggregate (no window, no second pass)"),
    ("mixture_weights",
     "temperature mixing: ONE map-side-combined stratum aggregate, then "
     "the 1-row total weight broadcasts back (IdentityBroadcastMode "
     "nested-loop, the bm25 stats pattern) — nothing text-sized moves; "
     "token counts collapse in the scan projection"),
    ("link_trustrank",
     "seeded-teleport TrustRank: the seed flag joins onto nodes as a "
     "BroadcastHashJoin ONCE (seeds are whitelist-sized); each of the 3 "
     "iterations keeps the pagerank profile — edges⋈ranks hash join on "
     "src + ONE hashaggregate exchange on dst; bigint math codegen"),
    ("frontier_opic",
     "OPIC cash rounds: per round one edges⋈cash join on src, one "
     "map-side-combined SUM on dst, and a 1-row dangling aggregate that "
     "broadcasts (IdentityBroadcastMode) — history rides in the "
     "node-keyed frame, no extra exchange for it"),
    ("seed_distance",
     "level-synchronous BFS: per level the frontier (small side) joins "
     "edges on src, new labels distinct + left_anti against the "
     "accumulated set; localCheckpoint truncates lineage per level so "
     "round planning stays O(1) in depth"),
    ("token_vocab_coverage",
     "vocab head: ONE map-side-combined token count (partial_count before "
     "the token-key exchange), TakeOrderedAndProject for the top-k (no "
     "global sort), 1-row total via IdentityBroadcastMode; the window "
     "runs over the constant-k head only"),
    ("mirror_clusters",
     "mirror pairs → components → canonical election: text collapses "
     "to md5 map-side (shuffle #1 carries digests, never text); the "
     "pair self-join is hot-digest-capped; min-label propagation runs "
     "on the host-cardinality graph; sizes via aggregate+join, no "
     "window"),
    ("dust_rules",
     "DUST mining without a pair self-join: text collapses to md5 in "
     "the scan projection; alias-group election and per-param variance "
     "are both map-side-combined aggregates on (host, base, digest[, "
     "param]); the rule rollup joins group-sized frames only"),
    ("dust_collapse",
     "mined rules applied: the (host × param) rule table broadcasts "
     "into a left_anti join on the posexploded params; canonical "
     "rebuild is one url-keyed order-preserving aggregate; per-host "
     "counts map-side-combine — the url frame never self-joins"),
    ("sample_cluster_balanced",
     "k-means diversity sampling: centroids broadcast (codebook rows), "
     "assignment argmax via partial_max_by (no corpus×k window); the "
     "hash rank and the cluster size share ONE hashpartitioning(cid) "
     "exchange"),
    ("decontaminate_semantic",
     "embedding decontamination: probe side BroadcastExchange into a "
     "codegen dot-product projection; per-doc argmax via partial_min "
     "over struct(-cos, pid) in the scan stage (string-id-safe "
     "tie-break) — only post-combine (id, best) rows cross the one "
     "hash exchange, vectors never shuffle"),
    ("polyglot_segments",
     "per-segment lang-ID: window slicing + marker intersection in one "
     "codegen projection (text dies in the stage, only (id, lang) rows "
     "exit); two map-side-combined aggregates, no window functions"),
    ("warc_revisit_plan",
     "archival dedup: payload length+digest computed map-side, payload "
     "column dropped before any exchange; ONE digest-keyed partial-min "
     "(struct) aggregate elects winners; plan = aggregate joined back "
     "on digest (broadcast-eligible winner side)"),
    ("ip_politeness",
     "per-IP budgets: demand is a map-side-combined per-host count; "
     "the resolver map joins via BroadcastHashJoin; the ip window runs "
     "over host-cardinality rows only (no url-cardinality exchange "
     "past the first count)"),
    ("focused_priority",
     "focused-crawl scoring: per-edge topic hits in one codegen "
     "projection (no explode, no UDF); source scores broadcast; the "
     "only wide exchange is the target-keyed map-side-combined "
     "aggregate; TakeOrderedAndProject for the head"),
    ("toxicity_lexicon",
     "content-policy gate: one alternation regexp_count inside "
     "whole-stage codegen — the operator is a pure projection (the "
     "plan's only exchange is the registry entry's display orderBy); "
     "token counts share the same projection"),
    ("feed_seed_extract",
     "RSS/Atom discovery: feed XML → entry URLs entirely in JVM "
     "regex/explode codegen (zero UDFs); the seen-set anti-join is "
     "BroadcastHashJoin (LeftAnti-shaped via null flag) on the "
     "canonical key; exchanges = fixture XML assembly + final per-host "
     "rollup only"),
    ("robots_failure_policy",
     "RFC 9309 fetch-failure semantics: the per-host decision table is "
     "a tiny broadcast side; verdict classification is a pure codegen "
     "CASE projection — the frontier side never shuffles on anything "
     "but its pre-existing host key"),
    ("containment_pairs",
     "asymmetric containment: same inverted-index shape as ngram "
     "jaccard (per-doc array_distinct, hot-shingle left_anti guard, "
     "candidates only via shared shingles); containment/jaccard bp are "
     "pure integer projections over the (sizes × inter) joins — no new "
     "exchange beyond the jaccard plan"),
    ("sample_weighted",
     "weighted ticket sampling: the ticket array is built and "
     "min-folded INSIDE the scan projection (transform+array_min, no "
     "explode — row count never grows); the ONLY data movement is "
     "TakeOrderedAndProject for the top-k"),
    ("distinct_sketch",
     "linear-counting distinct sketch: two map-side-combined "
     "aggregates — (key, bucket) then key — so at most m=1024 integer "
     "rows per key cross the exchange regardless of corpus size; no "
     "distinct-URL strings ever shuffle (the exact-count join is the "
     "test-scale oracle companion, not the production path)"),
    ("frontier_shard",
     "rendezvous sharding: per-host score array folded in the "
     "projection (transform + array_max/array_position, zero UDFs); "
     "both the 8-shard and the after-loss 7-shard assignment are pure "
     "per-row exprs; rollups are host-cardinality aggregates with "
     "map-side partials"),
    ("distinct_hll",
     "HyperLogLog: register build is a (key, bucket) max-aggregate "
     "with map-side partials — ≤256 integer rows per key cross the "
     "exchange; the estimate is one more key-level aggregate; the "
     "exact-distinct join exists only as the oracle companion"),
    ("heavyhitters_cms",
     "count-min sketch: cell build is a (row, bucket) count-aggregate "
     "with map-side combine — ≤4096 rows total cross the exchange "
     "regardless of token volume; the probe side is 20×4 rows joined "
     "against the tiny cell frame (broadcast-eligible)"),
    ("zipf_fit",
     "Zipf exponent: the only wide work is the (lang, token) "
     "count-aggregate; the rank window and closed-form fit run over "
     "top-300-per-lang rows; sums feed one tiny per-lang aggregate"),
    ("politeness_audit",
     "compliance audit: the lag() window and the per-host aggregate "
     "SHARE one hashpartitioning(host) exchange — the only wide work "
     "at 10^10 fetch rows; gaps are integer epoch-second arithmetic "
     "in codegen"),
]

KEEP = re.compile(
    r"^\(\d+\) (Scan parquet|Filter|BroadcastHashJoin|SortMergeJoin|"
    r"ShuffledHashJoin|BroadcastNestedLoopJoin|Exchange|BroadcastExchange|"
    r"HashAggregate|ObjectHashAggregate|SortAggregate|WindowGroupLimit|"
    r"Window|TakeOrderedAndProject)")
DETAIL = re.compile(r"PushedFilters|ReadSchema|^Arguments: |^Keys|^Functions")


def main() -> None:
    from python_web_scraper_cleaner_spark.plans.queries import registry
    from python_web_scraper_cleaner_spark.session import build_session

    spark = build_session(app_name="explain_audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    sf_dir = "/root/testdata/sf0.01"

    out = ["# PLANS_AUDIT — physical-plan evidence (generated by "
           "tools/explain_audit.py)", "",
           "For each audited query: parquet scans (PushedFilters shows the "
           "predicate reached the scan; ReadSchema shows column pruning), "
           "join strategies, exchanges, and window/top-k pushdowns.", ""]
    for name, why in AUDITED:
        df = reg[name][0](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        out.append(f"## {name} — {why}\n")
        out.append("```")
        emit = False
        for line in plan.splitlines():
            stripped = line.strip()
            if KEEP.match(stripped):
                out.append(stripped)
                emit = True
            elif emit and DETAIL.search(stripped):
                out.append("   " + stripped[:160])
            elif not stripped:
                emit = False
        out.append("```\n")

    # dedup_components is iterative with per-round lineage truncation, so
    # the registry entry's final plan is just a checkpoint scan. Audit the
    # repeated unit instead: one propagation round (neighbor-min + path
    # halving) over a representative labels/edges pair — this is the
    # complete per-round shuffle budget, repeated O(log diameter) times.
    from pyspark.sql import functions as SF

    from python_web_scraper_cleaner_spark.operators import dedup as D
    pairs = spark.range(0, 1000).select(
        SF.col("id").alias("id_a"), (SF.col("id") + 1).alias("id_b"))
    edges = (pairs.select(SF.col("id_a").alias("src"),
                          SF.col("id_b").alias("dst"))
             .unionByName(pairs.select(SF.col("id_b").alias("src"),
                                       SF.col("id_a").alias("dst"))))
    labels = edges.select(SF.col("src").alias("id")).distinct() \
                  .select("id", SF.col("id").alias("comp"))
    rnd = D.cc_propagation_round(edges, labels)
    plan = rnd._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    out.append("## dedup_components (one propagation round) — neighbor-min "
               "join + partial/final min agg + path-halving self-join; "
               "repeated O(log diameter) times with localCheckpoint "
               "truncating lineage between rounds\n")
    out.append("```")
    emit = False
    for line in plan.splitlines():
        stripped = line.strip()
        if KEEP.match(stripped):
            out.append(stripped)
            emit = True
        elif emit and DETAIL.search(stripped):
            out.append("   " + stripped[:160])
        elif not stripped:
            emit = False
    out.append("```\n")

    # Hand-audited sections (everything after the marker) are authored
    # per-operator during development with verified node references —
    # regeneration must carry them over, not wipe them.
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS_AUDIT.md")
    marker = ("<!-- manual sections below: hand-audited plans, preserved "
              "across explain_audit.py regenerations -->")
    manual = ""
    if os.path.exists(path):
        prev = open(path).read()
        if marker in prev:
            manual = prev[prev.index(marker):]
    with open(path, "w") as f:
        f.write("\n".join(out))
        if manual:
            f.write("\n" + manual)
    print("wrote PLANS_AUDIT.md"
          + (" (manual sections preserved)" if manual else ""))
    spark.stop()


if __name__ == "__main__":
    main()
