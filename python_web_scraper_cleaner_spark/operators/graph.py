"""Link-graph operators for crawl frontier prioritization.

Reference analog: the reference crawls its seed list in file order with no
notion of page importance (/root/reference/scripts/news.py:37-48); a
web-scale frontier wants link-centrality-ordered scheduling, so this module
adds PageRank over the discovered link graph as a first-class operator. The
rank column feeds the same (host, priority) frontier ordering the engine's
politeness scheduler already consumes (plans/crawl.py).

Everything is FIXED-POINT integer arithmetic (rank mass scaled by
``scale``), so results are bit-deterministic: integer addition is
associative, so shuffle/partial-aggregation order cannot perturb the
result, and a DuckDB oracle reproduces it exactly — the same trick the
IVF k-means codebook uses (operators/similarity.py).

Scale notes (10^10-edge design point):
- Each iteration is exactly two shuffles: edges⋈ranks on src (ranks is
  the small side early on but same cardinality as nodes — a sort-merge
  join co-partitioned on src across iterations), then a partial+final
  integer SUM keyed on dst. Nothing else moves.
- out-degrees are computed ONCE and reused across iterations.
- Rank mass of dangling nodes (out-degree 0) is dropped, the common
  simplification; with the synthetic closure graph every node has
  out-degree ≥ 1 so no mass is lost there.
- For many iterations, persist + localCheckpoint `ranks` every few
  rounds to truncate lineage (connected_components does the same); at
  the 3-iteration default the unrolled plan is fine as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank_fixed_point(edges: DataFrame, nodes: DataFrame, *,
                         n_nodes: int, iters: int = 3,
                         damp_num: int = 85, damp_den: int = 100,
                         scale: int = SCALE) -> DataFrame:
    """PageRank over ``edges`` (src, dst) for ``nodes`` (id).

    Returns (id, rank_fp) where rank_fp is the rank scaled by ``scale``
    and floored — pure bigint math end to end (multiplications stay under
    2^63 for scale ≤ 10^12 and damp_num ≤ 100). ``n_nodes`` is passed by
    the caller (it already knows the frontier size) so the operator adds
    no count() action of its own.
    """
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # literals cast to long explicitly: for large n_nodes they would infer
    # IntegerType and the per-iteration multiply would wrap silently
    ranks = nodes.select("id", F.lit(scale // n_nodes).cast("long")
                         .alias("rank_fp"))
    teleport = scale * (damp_den - damp_num) // (damp_den * n_nodes)
    for _ in range(iters):
        contribs = (edges
                    .join(ranks.withColumnRenamed("id", "src"), "src")
                    .join(outdeg, "src")
                    .select(F.col("dst").alias("id"),
                            F.expr(f"rank_fp * {damp_num} "
                                   f"div ({damp_den} * outdeg)").alias("c")))
        summed = contribs.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(summed, "id", "left")
                 .select("id",
                         (F.lit(teleport) + F.coalesce(F.col("s"), F.lit(0)))
                         .alias("rank_fp")))
    return ranks


def _hits_half(edges: DataFrame, scores: DataFrame, nodes: DataFrame, *,
               join_side: str, group_side: str, scale: int) -> DataFrame:
    """One HITS half-step: sum partner scores over edges, then
    max-normalize back to [0, scale] in integer arithmetic. Nodes with no
    contributing edge get 0."""
    raw = (edges.join(scores.withColumnRenamed("id", join_side), join_side)
           .groupBy(group_side).agg(F.sum("v").alias("_raw")))
    mx = raw.agg(F.greatest(F.max("_raw"), F.lit(1).cast("long"))
                 .alias("_mx"))
    return (nodes.join(raw.withColumnRenamed(group_side, "id"), "id", "left")
            .crossJoin(F.broadcast(mx))
            .select("id", F.coalesce(
                F.expr(f"_raw * {scale} div _mx"),
                F.lit(0).cast("long")).alias("v")))


def hits_fixed_point(edges: DataFrame, nodes: DataFrame, *,
                     iters: int = 2, scale: int = 10**6) -> DataFrame:
    """HITS hubs-and-authorities over ``edges`` (src, dst) for ``nodes``
    (id) — the complementary centrality to PageRank for frontier
    prioritization: authority ranks CONTENT worth fetching, hub ranks
    DIRECTORY pages worth re-visiting for discovery (the distinction a
    seed-list crawler like the reference, scripts/news.py:3-7, never
    needs — a discovery crawler schedules hubs early to widen the
    frontier fast).

    Fixed-point integer arithmetic throughout, like pagerank_fixed_point
    above: scores live in [0, scale]; each half-step sums partner scores
    (bigint, associative → shuffle-order-proof) then MAX-normalizes via
    ``v * scale div max`` (floor division, positive operands — identical
    in Spark and DuckDB). Returns (id, auth_fp, hub_fp).

    Overflow bound: a summed score ≤ D·scale where D is the maximum
    IN-EDGE ROW count of any node (duplicate (src,dst) rows each
    contribute — this operator does NOT dedup edges, so a multigraph
    links table counts multiplicities), and normalization multiplies by
    scale again: pick scale ≤ sqrt(2^63 / D). The default 10^6 is safe
    to D ~ 9×10^6; a 10^10-edge crawl graph wants scale = 10^4 (rank
    resolution trades against headroom), or pre-`edges.distinct()` when
    simple-graph semantics are wanted — which also shrinks D to the
    true in-degree.

    Scale shape per half-step: one edges⋈scores hash join keyed on the
    edge endpoint + one integer SUM with map-side partials (same
    two-shuffle profile as a pagerank iteration), plus a scalar max agg
    whose single row broadcasts. 2·iters half-steps total; for deep
    iteration counts, localCheckpoint the score table every few rounds
    (same lineage note as pagerank)."""
    auth = nodes.select("id", F.lit(scale).cast("long").alias("v"))
    hub = auth
    for _ in range(iters):
        # hub(i) = Σ auth(j) over i→j: join scores on dst, group by src
        hub = _hits_half(edges, auth, nodes, join_side="dst",
                         group_side="src", scale=scale)
        # auth(j) = Σ hub(i) over i→j: join scores on src, group by dst
        auth = _hits_half(edges, hub, nodes, join_side="src",
                          group_side="dst", scale=scale)
    return (auth.withColumnRenamed("v", "auth_fp")
            .join(hub.withColumnRenamed("v", "hub_fp"), "id"))


def anchor_rollup(pages: DataFrame, *, url_col: str = "url",
                  html_col: str = "html") -> DataFrame:
    """Per-target anchor-text corpus from the link graph — the classic
    web-ranking signal (how OTHER pages describe a target), aggregated
    from (page html, page url) without ever materializing per-target
    member lists.

    Output per target url: n_refs (total in-links), n_unique_anchors,
    top_anchor (most frequent anchor string; ties break lexicographically
    — bit-deterministic).

    Scale shape: the anchor pairs leave the Arrow stage as narrow
    (target, anchor) rows — the html blob never crosses an exchange.
    Aggregation is two-stage: (target, anchor) counts collapse map-side
    first (duplicate anchors are the common case: nav/footer links), then
    the per-target roll-up picks top_anchor via min_by on a (−count,
    anchor) struct — an aggregate, not a window, so no second sort and no
    per-target row explosion.
    """
    from ..functions.udfs import extract_anchors_udf

    pairs = (pages
             .select(F.explode(extract_anchors_udf(
                 F.col(html_col), F.col(url_col))).alias("p"))
             .select(F.col("p.target").alias("target"),
                     F.col("p.anchor").alias("anchor")))
    per_anchor = (pairs.groupBy("target", "anchor")
                  .agg(F.count("*").alias("n")))
    return (per_anchor.groupBy("target")
            .agg(F.sum("n").cast("long").alias("n_refs"),
                 F.count("*").alias("n_unique_anchors"),
                 F.min_by("anchor",
                          F.struct((-F.col("n")).alias("neg_n"),
                                   F.col("anchor"))).alias("top_anchor")))


def resolve_redirect_chains(redirects: DataFrame, *, src_col: str = "src",
                            dst_col: str = "dst",
                            max_hops: int = 32) -> DataFrame:
    """HTTP redirect-chain resolution: (src, dst) single-hop redirect
    records → (src, final_url, hops, unresolved) — every source mapped to
    the terminal URL its chain lands on, with the exact hop count. The
    step a crawl pipeline runs before URL-seen/canonical bookkeeping so
    captures are attributed to the page that actually served them (the
    reference follows redirects implicitly inside requests/trafilatura,
    /root/reference/scripts/trafilatura_scraper.py:43 — it never records
    the chain; Common Crawl ships redirects as first-class records).

    Algorithm: PATH DOUBLING, the pointer-jumping trick connected
    components uses (operators/dedup.py) — each round every unresolved
    pointer jumps through the CURRENT pointer table, doubling the covered
    distance, so ceil(log2(max_hops)) rounds bound chains of max_hops
    links. Hop counts stay EXACT: a jump through an already-terminal row
    adds that row's remaining hops, never overshooting. A linear
    walk-one-hop loop would need max_hops shuffle rounds; doubling needs
    5 for 32.

    ``unresolved`` = the chain did not reach a terminal within
    ``max_hops`` — a redirect cycle (self-loops included) or an
    over-budget chain; real crawlers cap exactly this way (browsers stop
    near 20). final_url/hops are NULL for those rows.

    One dst per src is enforced by min(dst) (deterministic last-writer
    pick when the input carries competing records).

    Scale shape: per round, ONE self-join of the pointer table keyed on
    the jump target plus a localCheckpoint lineage cut (the iterative-op
    lesson: persist alone leaves per-round Catalyst re-analysis growing
    with plan depth). State is |srcs| rows forever; nothing is ever
    collected to the driver; early-exit when all rows are done.
    """
    import math

    m = (redirects
         .select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
         .groupBy("src").agg(F.min("dst").alias("dst"))
         .localCheckpoint(eager=True))
    has_out = m.select(F.col("src").alias("cur"),
                       F.lit(True).alias("_has_out"))
    p = (m.select("src", F.col("dst").alias("cur"),
                  F.lit(1).alias("hops"))
         .join(has_out, "cur", "left")
         .select("src", "cur", "hops",
                 F.col("_has_out").isNull().alias("done")))
    for _ in range(max(1, math.ceil(math.log2(max(2, max_hops))))):
        p = p.localCheckpoint(eager=True)
        if p.filter(~F.col("done")).isEmpty():
            break
        jumped = (p.filter(~F.col("done"))
                  .join(p.select(F.col("src").alias("cur"),
                                 F.col("cur").alias("_cur2"),
                                 F.col("hops").alias("_hops2"),
                                 F.col("done").alias("_done2")), "cur")
                  .select("src", F.col("_cur2").alias("cur"),
                          (F.col("hops") + F.col("_hops2")).alias("hops"),
                          F.col("_done2").alias("done")))
        p = p.filter(F.col("done")).unionByName(jumped)
    # doubling rounds cover up to 2^ceil(log2(max_hops)) hops — enforce
    # the EXACT budget here: a chain that terminated but needed more
    # than max_hops is over-budget and reports unresolved (the
    # documented contract; the oracle's recursive walk stops at
    # max_hops exactly)
    done_ok = F.col("done") & (F.col("hops") <= max_hops)
    return p.select(
        "src",
        F.when(done_ok, F.col("cur")).alias("final_url"),
        F.when(done_ok, F.col("hops")).alias("hops"),
        (~done_ok).alias("unresolved"))


def host_link_rollup(edges: DataFrame, *, src_host_col: str = "src_host",
                     dst_host_col: str = "dst_host",
                     persist: bool = True) -> DataFrame:
    """Host-level link-graph rollup — the STRUCTURE-side spam signal
    complementing host_reputation's content-side one: link farms show up
    as high reciprocity between small host cliques, mirror/self-promo
    hosts as high intra-host link fractions, long before any content
    model fires (classic TrustRank-era heuristics). The reference's
    fixed seed list never sees hostile link structure; a discovery
    crawler budget-allocates by it.

    Input: page-level edges already mapped to (src_host, dst_host) —
    URL→host is the caller's one-liner and keeps this operator join-free
    on the big side. Output per host: n_out / n_in (edge rows),
    intra_bp (basis points of out-edges staying on-host), n_peers_out
    (distinct other hosts linked), recip_bp (basis points of those
    peers that link BACK).

    Scale shape: edges collapse to the (src_host, dst_host) pair table
    in ONE map-side-combined aggregate — the only exchange that sees
    edge cardinality; pairs are |hosts|²-bounded in theory and
    near-linear in |hosts| in practice, so everything after (per-host
    sums, the reversed-pair reciprocity self-join keyed on both hosts,
    the final rollup) runs on the small table. The pair table feeds
    FOUR branches (inter, its reversal, outs, ins), so ``persist``
    (default on, bounded) materializes it once — without it each branch
    re-pays the edge-cardinality aggregate. Integer bp outputs with
    zero-guarded denominators (ANSI-safe)."""
    hp = (edges.select(F.col(src_host_col).alias("s"),
                       F.col(dst_host_col).alias("d"))
          .groupBy("s", "d").agg(F.count("*").alias("n")))
    if persist:
        from ..caching import bounded_persist
        hp = bounded_persist(hp, tag="host_link_rollup")
    inter = hp.filter(F.col("s") != F.col("d"))
    back = inter.select(F.col("d").alias("s"), F.col("s").alias("d"),
                        F.lit(True).alias("_back"))
    peers = (inter.join(back, ["s", "d"], "left")
             .groupBy("s")
             .agg(F.count("*").alias("n_peers_out"),
                  F.sum(F.col("_back").isNotNull().cast("long"))
                  .alias("n_recip")))
    outs = (hp.groupBy("s")
            .agg(F.sum("n").cast("long").alias("n_out"),
                 F.sum(F.when(F.col("s") == F.col("d"), F.col("n"))
                       .otherwise(F.lit(0))).cast("long")
                 .alias("n_intra")))
    ins = (hp.groupBy(F.col("d").alias("host"))
           .agg(F.sum("n").cast("long").alias("n_in")))
    return (outs.select(F.col("s").alias("host"), "n_out", "n_intra")
            .join(ins, "host", "full")
            .join(peers.withColumnRenamed("s", "host"), "host", "left")
            .select("host",
                    F.coalesce("n_out", F.lit(0)).cast("long")
                    .alias("n_out"),
                    F.coalesce("n_in", F.lit(0)).cast("long")
                    .alias("n_in"),
                    F.when(F.coalesce("n_out", F.lit(0)) > 0,
                           F.expr("10000 * n_intra div n_out"))
                    .otherwise(F.lit(0)).cast("long").alias("intra_bp"),
                    F.coalesce("n_peers_out", F.lit(0)).cast("long")
                    .alias("n_peers_out"),
                    F.when(F.coalesce("n_peers_out", F.lit(0)) > 0,
                           F.expr("10000 * n_recip div n_peers_out"))
                    .otherwise(F.lit(0)).cast("long").alias("recip_bp")))


def trustrank_fixed_point(edges: DataFrame, seeds: DataFrame,
                          nodes: DataFrame, *, n_seeds: int,
                          iters: int = 3, damp_num: int = 85,
                          damp_den: int = 100,
                          scale: int = SCALE) -> DataFrame:
    """TrustRank (Gyöngyi/Garcia-Molina/Pedersen, VLDB'04) over
    ``edges`` (src, dst): PageRank with the teleport vector concentrated
    on a hand-vetted trusted ``seeds`` (id) set instead of uniform, so
    trust flows OUT of the seeds along links and spam neighborhoods —
    reachable mostly from other spam — starve. The demotion-side
    complement to pagerank_fixed_point above: a discovery crawler
    schedules by rank but BUDGETS by trust (pages with high rank but
    negligible trust are the classic link-farm signature). The
    reference's fixed seed list is implicitly an all-trusted-seeds crawl
    (/root/reference/scripts/news.py:3-7); this makes that trust
    assumption an explicit, propagating score.

    Same fixed-point integer contract as pagerank_fixed_point: rank mass
    scaled by ``scale``, bigint math end to end, bit-deterministic (sums
    are associative; floor div matches DuckDB `//` on non-negative
    operands). r0 = scale//n_seeds on seeds else 0; each iteration
    r(j) = tele(j) + Σ_{i→j} r(i)·damp div (den·outdeg(i)), where
    tele(j) = scale·(den−num) div (den·n_seeds) on seeds else 0.

    Returns (id, trust_fp, is_seed).

    Scale shape: identical two-shuffles-per-iteration profile to
    pagerank_fixed_point (edges⋈ranks on src, integer SUM on dst), plus
    a ONE-OFF broadcast hash join of the seed flag onto nodes — seeds
    are tiny by construction (hundreds of hand-vetted hosts even at
    10^10 URLs). outdeg computed once; deep ``iters`` wants the same
    periodic localCheckpoint note as pagerank."""
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    tele = scale * (damp_den - damp_num) // (damp_den * n_seeds)
    base = (nodes.join(
        F.broadcast(seeds.select("id", F.lit(True).alias("_seed"))),
        "id", "left")
        .select("id", F.coalesce("_seed", F.lit(False)).alias("is_seed"),
                F.when(F.col("_seed"), F.lit(tele).cast("long"))
                .otherwise(F.lit(0).cast("long")).alias("tele_fp")))
    ranks = base.select(
        "id", F.when(F.col("is_seed"),
                     F.lit(scale // n_seeds).cast("long"))
        .otherwise(F.lit(0).cast("long")).alias("trust_fp"))
    for _ in range(iters):
        contribs = (edges
                    .join(ranks.withColumnRenamed("id", "src"), "src")
                    .join(outdeg, "src")
                    .select(F.col("dst").alias("id"),
                            F.expr(f"trust_fp * {damp_num} "
                                   f"div ({damp_den} * outdeg)")
                            .alias("c")))
        summed = contribs.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = (base.join(summed, "id", "left")
                 .select("id",
                         (F.col("tele_fp")
                          + F.coalesce(F.col("s"), F.lit(0)))
                         .alias("trust_fp")))
    return ranks.join(base.select("id", "is_seed"), "id")


def opic_cash(edges: DataFrame, nodes: DataFrame, *, n_nodes: int,
              rounds: int = 3, scale: int = SCALE) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul/Preda/
    Cobena, WWW'03), THE frontier-priority algorithm built for crawlers:
    unlike PageRank it needs no converged global iteration before being
    useful — every page carries ``cash`` (importance arriving since its
    last fetch) and ``history`` (total cash ever credited), and the
    frontier simply fetches the highest-cash page next. This operator is
    the synchronous batch analog over the discovered graph: per round
    every page distributes its whole cash equally along its out-links
    and is credited to history; dangling pages (no out-links) pay their
    cash to the virtual root, which redistributes it uniformly next
    round (the paper's virtual-page trick, keeping total cash ~constant
    instead of leaking).

    Fixed-point integer contract as pagerank_fixed_point: cash_0 =
    scale//n_nodes each; cash_{k+1}(j) = Σ_{i→j} cash_k(i) div
    outdeg(i) + dangling_k div n_nodes; hist after ``rounds`` =
    Σ_{t=0..rounds-1} cash_t (floor-div remainders evaporate — bounded
    by |E| per round, deterministic on both engines). Returns (id,
    cash_fp, hist_fp): schedule by hist + cash (the paper's estimator),
    or by cash alone for pure adaptivity.

    Scale shape: per round exactly one edges⋈cash hash join keyed on
    src (same co-partitioned profile as a pagerank iteration), one
    map-side-combinable integer SUM keyed on dst, and ONE single-row
    dangling aggregate whose scalar broadcasts — no extra exchanges.
    hist rides along in the same node-keyed frame, so no second join.
    Deep ``rounds`` wants periodic localCheckpoint (iterative-lineage
    note on pagerank_fixed_point)."""
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    state = nodes.select(
        "id", F.lit(scale // n_nodes).cast("long").alias("cash_fp"),
        F.lit(0).cast("long").alias("hist_fp"))
    for _ in range(rounds):
        withdeg = state.join(
            outdeg.withColumnRenamed("src", "id"), "id", "left")
        dang = (withdeg.filter(F.col("outdeg").isNull())
                .agg(F.coalesce(F.sum("cash_fp"), F.lit(0))
                     .cast("long").alias("_dang")))
        recv = (edges
                .join(state.withColumnRenamed("id", "src"), "src")
                .join(outdeg, "src")
                .select(F.col("dst").alias("id"),
                        F.expr("cash_fp div outdeg").alias("c"))
                .groupBy("id").agg(F.sum("c").alias("s")))
        state = (state.join(recv, "id", "left")
                 .crossJoin(F.broadcast(dang))
                 .select("id",
                         (F.coalesce(F.col("s"), F.lit(0))
                          + F.expr(f"_dang div {n_nodes}"))
                         .cast("long").alias("cash_fp"),
                         (F.col("hist_fp") + F.col("cash_fp"))
                         .alias("hist_fp")))
    return state


def bfs_seed_distance(edges: DataFrame, seeds: DataFrame, *,
                      max_depth: int = 4) -> DataFrame:
    """Crawl-depth labeling: minimum hop count from the ``seeds`` (id)
    set along ``edges`` (src, dst), capped at ``max_depth`` — exactly
    the max-depth budget real crawlers enforce (Heritrix max-hops,
    wget -l). The reference crawls its seed list at depth 0 plus one
    in-page discovery hop (/root/reference/scripts/news.py:37-48 —
    implicitly max_depth=1); a frontier at 10^10 URLs budgets
    systematically by depth because URL count grows geometrically
    with it.

    Returns (id, depth) for every node WITHIN ``max_depth`` hops of a
    seed — unreached nodes are simply absent (anti-joinable), so the
    output is frontier-sized, not graph-sized, at small depths.

    Algorithm: ``max_depth`` rounds of min-relaxation — frontier_k =
    nodes first reached at depth k (join frontier with edges on src,
    anti-join already-labeled) — the textbook level-synchronous BFS.
    Deliberately NOT path-doubling (cf. resolve_redirect_chains): the
    depth cap IS the semantics, the round count equals the cap (small,
    single digits), and level-synchronous rounds touch only the
    frontier's out-edges, not the whole pointer table. Early exit when
    a level comes up empty.

    Scale shape: per round, one frontier⋈edges hash join keyed on src
    (frontier is the small side at low depths — broadcastable), one
    distinct on the new level, one left_anti against the accumulated
    labels, and a localCheckpoint lineage cut. Nothing driver-side
    except the empty-level check."""
    labels = (seeds.select("id").distinct()
              .select("id", F.lit(0).alias("depth"))
              .localCheckpoint(eager=True))
    frontier = labels
    for k in range(1, max_depth + 1):
        nxt = (edges.join(frontier.withColumnRenamed("id", "src")
                          .select("src"), "src")
               .select(F.col("dst").alias("id")).distinct()
               .join(labels.select("id"), "id", "left_anti")
               .select("id", F.lit(k).alias("depth"))
               .localCheckpoint(eager=True))
        if nxt.isEmpty():
            break
        labels = labels.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return labels


def focused_priority(anchors: DataFrame, source_scores: DataFrame,
                     topic: tuple, *, src_col: str = "src",
                     target_col: str = "target",
                     anchor_col: str = "anchor",
                     score_col: str = "score_bp") -> DataFrame:
    """Focused-crawl frontier scoring (Chakrabarti/van den Berg/Dom '99):
    rank UNFETCHED frontier candidates by how topical the web says they
    are — the anchor text of their in-links plus the topical score of
    the pages those links come from. PageRank/OPIC rank by popularity;
    a focused crawl ranks by topic, which is how a 10^10-URL frontier
    is steered toward a domain-specific corpus (medical, legal, code)
    without fetching the whole web first.

    Inputs: ``anchors`` (src, target, anchor) edge rows from the link
    extractor; ``source_scores`` (src, score_bp) — the topical
    relevance of already-FETCHED pages in basis points (quality_linear
    or a lang/keyword gate supplies this upstream). ``topic`` is the
    query lexicon; per edge, hits = number of topic terms appearing
    word-bounded in the anchor text.

    Output per target: n_inlinks, anchor_hits (summed over in-edges),
    mean_src_bp (integer div), priority_fp = 10000*anchor_hits +
    mean_src_bp — the anchor weight sits above the bp ceiling, so ONE
    topical anchor outranks any source score: anchors describe the
    TARGET; source score only tiebreaks within equally-described
    candidates. Integer math throughout, bit-deterministic.

    Scale shape: per-edge hits are a fixed sum of word-boundary rlikes
    inside one codegen projection (topic lexicons are tens of terms);
    the only exchange is the target-keyed map-side-combined aggregate;
    source_scores joins on src BEFORE that aggregate (broadcast — the
    fetched set's score table is host/page-cardinality, and only
    (src, score) columns ship). No window, no explode.
    """
    import re as _re

    # empty lexicon ⇒ zero hits (not a crash); terms are regex-ESCAPED
    # ('c++', 'node.js' are legitimate topics) and bounded by word-char
    # lookarounds — equivalent to \b for word-edged terms but correct
    # when a term starts/ends on a non-word char (where \b inverts)
    hits = F.lit(0)
    for t in topic:
        # the anchor is lowercased, so the term must be too — an
        # uppercase topic ('Medicare') could otherwise never match
        h = F.when(F.lower(F.col(anchor_col))
                   .rlike(rf"(?<!\w){_re.escape(t.lower())}(?!\w)"),
                   F.lit(1)).otherwise(F.lit(0))
        hits = hits + h
    scored = (anchors.select(
        F.col(src_col).alias("src"), F.col(target_col).alias("target"),
        hits.cast("long").alias("_hits"))
        .join(F.broadcast(source_scores.select(
            F.col(src_col).alias("src"),
            F.col(score_col).cast("long").alias("_sbp"))), "src", "left")
        .withColumn("_sbp", F.coalesce(F.col("_sbp"), F.lit(0))))
    agg = (scored.groupBy("target")
           .agg(F.count(F.lit(1)).cast("long").alias("n_inlinks"),
                F.sum("_hits").cast("long").alias("anchor_hits"),
                F.sum("_sbp").cast("long").alias("_sbp_sum")))
    return (agg.withColumn("mean_src_bp",
                           F.expr("_sbp_sum div n_inlinks").cast("long"))
            .withColumn("priority_fp",
                        (F.lit(10000) * F.col("anchor_hits")
                         + F.col("mean_src_bp")).cast("long"))
            .select("target", "n_inlinks", "anchor_hits", "mean_src_bp",
                    "priority_fp")
            .orderBy(F.desc("priority_fp"), "target"))
