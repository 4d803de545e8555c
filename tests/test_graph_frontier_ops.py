"""TrustRank, OPIC cash/history, and seed-BFS depth (operators/graph.py).

TrustRank tests pin the seeded-teleport semantics (unreachable-from-seeds
nodes get zero trust even with high in-degree — the spam-demotion
property PageRank lacks); OPIC pins cycle conservation, the round-1
hand math of dangling redistribution, and history accumulation; BFS pins
min-hop labels, the depth cap, and absence of unreached nodes.
"""

from python_web_scraper_cleaner_spark.operators import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


# ---------------------------------------------------------------- trustrank

def test_trustrank_unreachable_spam_gets_zero(spark):
    # 0 (seed) ⇄ 1 form the trusted zone; 2 and 3 link INTO it heavily
    # (2→0, 3→0, 2⇄3) but nothing trusted links back — classic link-farm
    # shape. PageRank would reward 0's in-degree indiscriminately;
    # TrustRank must leave 2 and 3 at exactly zero.
    edges = _edges(spark, [(0, 1), (1, 0), (2, 0), (3, 0), (2, 3), (3, 2)])
    rows = G.trustrank_fixed_point(
        edges, _ids(spark, [0]), _nodes(spark, range(4)),
        n_seeds=1, iters=4).collect()
    t = {r.id: r.trust_fp for r in rows}
    seeds = {r.id: r.is_seed for r in rows}
    assert t[2] == 0 and t[3] == 0
    assert t[0] > 0 and t[1] > 0
    assert seeds == {0: True, 1: False, 2: False, 3: False}


def test_trustrank_two_cycle_hand_math(spark):
    # seed 0, edges 0→1→0, one iteration:
    #   r0 = (scale, 0); tele = (scale·15/100, 0)
    #   r1(0) = tele(0) + r0(1)·85/100 = tele(0)
    #   r1(1) = 0 + r0(0)·85/100
    scale = G.SCALE
    edges = _edges(spark, [(0, 1), (1, 0)])
    rows = G.trustrank_fixed_point(
        edges, _ids(spark, [0]), _nodes(spark, [0, 1]),
        n_seeds=1, iters=1).collect()
    t = {r.id: r.trust_fp for r in rows}
    assert t[0] == scale * 15 // 100
    assert t[1] == scale * 85 // 100


def test_trustrank_trust_decays_with_distance(spark):
    # chain 0→1→2→3 from seed 0: monotone 0.85× decay along the chain —
    # but only once the INITIAL trust pulse has run off the DAG's end
    # (at iters < chain length the pulse front transiently outranks the
    # steady state), so iterate past the diameter
    edges = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    rows = G.trustrank_fixed_point(
        edges, _ids(spark, [0]), _nodes(spark, range(4)),
        n_seeds=1, iters=6).collect()
    t = {r.id: r.trust_fp for r in rows}
    assert t[0] > t[1] > t[2] > t[3] > 0


# --------------------------------------------------------------------- opic

def test_opic_cycle_conserves_cash_and_accumulates_history(spark):
    # 0→1→2→0: cash stays scale//3 per node every round; after k rounds
    # hist = k · (scale//3)
    n, rounds = 3, 4
    scale = G.SCALE
    edges = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    rows = G.opic_cash(edges, _nodes(spark, range(n)),
                       n_nodes=n, rounds=rounds).collect()
    per = scale // n
    for r in rows:
        assert r.cash_fp == per
        assert r.hist_fp == rounds * per


def test_opic_dangling_redistributes_uniformly(spark):
    # nodes {0,1}, edge 0→1 only; 1 is dangling. Round 1 by hand:
    #   cash0 = s/2 each; recv(1) = s/2; dangling pot = cash0(1) = s/2,
    #   each node gets (s/2)//2 = s/4
    #   cash1 = (0 + s/4, s/2 + s/4); hist1 = s/2 each
    s = G.SCALE
    edges = _edges(spark, [(0, 1)])
    rows = G.opic_cash(edges, _nodes(spark, [0, 1]),
                       n_nodes=2, rounds=1).collect()
    got = {r.id: (r.cash_fp, r.hist_fp) for r in rows}
    assert got[0] == (s // 4, s // 2)
    assert got[1] == (s // 2 + s // 4, s // 2)


def test_opic_hub_history_dominates(spark):
    # star into 0 with 0→1 as the only hub out-link: the hub's history
    # dominates; its sole out-link co-dominates (the initial spoke cash
    # ping-pongs 0⇄1 — after round 3 they tie exactly at 7·(s/6)); the
    # remaining spokes, which only ever SPEND cash, trail strictly
    spokes = list(range(1, 6))
    edges = _edges(spark, [(i, 0) for i in spokes] + [(0, 1)])
    rows = G.opic_cash(edges, _nodes(spark, range(6)),
                       n_nodes=6, rounds=3).collect()
    hist = {r.id: r.hist_fp for r in rows}
    assert hist[0] == max(hist.values())
    assert hist[0] == hist[1]
    assert all(hist[0] > hist[i] for i in spokes[1:])


# ---------------------------------------------------------------- seed BFS

def test_bfs_min_hop_labels_on_diamond(spark):
    # 0→1, 0→2, 1→3, 2→3, 3→4: depths 0,1,1,2,3; the two depth-2 paths
    # to 3 collapse to one row
    edges = _edges(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)])
    rows = G.bfs_seed_distance(edges, _ids(spark, [0]),
                               max_depth=4).collect()
    got = {r.id: r.depth for r in rows}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_bfs_depth_cap_excludes_deeper_nodes(spark):
    # chain 0→1→2→3→4→5 with max_depth=3: 4 and 5 are over budget and
    # ABSENT (not null-depth)
    chain = [(i, i + 1) for i in range(5)]
    rows = G.bfs_seed_distance(_edges(spark, chain), _ids(spark, [0]),
                               max_depth=3).collect()
    got = {r.id: r.depth for r in rows}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_multi_seed_takes_nearest(spark):
    # seeds {0, 5} on chain 0→1→2→3→4→5→6: node 4 is depth 4 from seed 0
    # but node 6 is depth 1 from seed 5; every node keeps its NEAREST
    # seed's distance, and a shortcut via an already-labeled seed does
    # not relabel it
    chain = [(i, i + 1) for i in range(6)]
    rows = G.bfs_seed_distance(_edges(spark, chain), _ids(spark, [0, 5]),
                               max_depth=10).collect()
    got = {r.id: r.depth for r in rows}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 0, 6: 1}


def test_bfs_early_exit_on_exhausted_frontier(spark):
    # 2-node graph fully labeled at depth 1; a generous max_depth must
    # terminate via the empty-level break, returning the same labels
    rows = G.bfs_seed_distance(_edges(spark, [(0, 1)]), _ids(spark, [0]),
                               max_depth=50).collect()
    assert {r.id: r.depth for r in rows} == {0: 0, 1: 1}


# -------------------------------------------------------------- vocab head

def test_vocab_coverage_hand_counts(spark):
    # corpus: "a a a b b" + "c A" → lowercase folds A into a:
    # counts a:4 b:2 c:1, total 7
    # cum_bp: a 10000*4//7=5714, a+b 10000*6//7=8571, all 10000
    from python_web_scraper_cleaner_spark.operators import textstats as TS

    docs = spark.createDataFrame([("a a a b b",), ("c A",)],
                                 "text string")
    rows = TS.vocab_coverage(docs, top_k=10).collect()
    got = [(r.rank, r.token, r.n, r.cum_bp) for r in rows]
    assert got == [(1, "a", 4, 5714), (2, "b", 2, 8571),
                   (3, "c", 1, 10000)]


def test_vocab_coverage_top_k_truncates_and_ties_lexicographic(spark):
    # equal counts order lexicographically; top_k=2 keeps the head only
    from python_web_scraper_cleaner_spark.operators import textstats as TS

    docs = spark.createDataFrame([("z y x",)], "text string")
    rows = TS.vocab_coverage(docs, top_k=2).collect()
    got = [(r.rank, r.token, r.cum_bp) for r in rows]
    assert got == [(1, "x", 3333), (2, "y", 6666)]
