"""Fixed-point PageRank (operators/graph.py), quality-aware keep_best and
paragraph-level dedup (operators/dedup.py).

PageRank tests pin mass conservation and hand-checked ranking on tiny
graphs; keep_best pins best-wins + tiebreak semantics; paragraph dedup
pins first-occurrence-wins, exact-duplicate elimination, and reassembly
order.
"""

import pytest
from pyspark.sql import functions as F

from python_web_scraper_cleaner_spark.operators import dedup as D
from python_web_scraper_cleaner_spark.operators import graph as G


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def test_pagerank_mass_is_conserved_on_a_cycle(spark):
    # 0→1→2→0: perfect symmetry, every node keeps exactly scale/3 (the
    # floor of it) for any iteration count
    n = 3
    edges = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    rows = G.pagerank_fixed_point(edges, _nodes(spark, range(n)),
                                  n_nodes=n, iters=4).collect()
    assert len(rows) == 3
    ranks = {r.id: r.rank_fp for r in rows}
    assert len(set(ranks.values())) == 1  # symmetric
    # teleport + damped pass-through of the symmetric rank
    scale = G.SCALE
    expected = scale * 15 // (100 * n) + (scale // n) * 85 // 100
    assert ranks[0] == expected


def test_pagerank_sink_hub_ranks_highest(spark):
    # star: every spoke links to the hub, hub links back to node 1
    spokes = list(range(1, 6))
    edges = _edges(spark, [(i, 0) for i in spokes] + [(0, 1)])
    rows = G.pagerank_fixed_point(edges, _nodes(spark, range(6)),
                                  n_nodes=6, iters=3).collect()
    ranks = {r.id: r.rank_fp for r in rows}
    assert ranks[0] == max(ranks.values())          # hub dominates
    assert ranks[1] > ranks[2]                      # hub's out-link boosted
    assert ranks[2] == ranks[3] == ranks[4] == ranks[5]


def test_pagerank_matches_float_reference(spark):
    # integer fixed-point tracks the float recurrence within rounding:
    # 1 unit per division, ~iters*(1+indegree) units accumulated
    n, iters = 7, 3
    edge_list = [(i, (i * 2 + 1) % n) for i in range(n)] + \
                [(i, (i + 3) % n) for i in range(n)]
    got = {r.id: r.rank_fp
           for r in G.pagerank_fixed_point(
               _edges(spark, edge_list), _nodes(spark, range(n)),
               n_nodes=n, iters=iters).collect()}
    ranks = {i: 1.0 / n for i in range(n)}
    outdeg = {i: 2 for i in range(n)}
    for _ in range(iters):
        nxt = {i: 0.15 / n for i in range(n)}
        for s, d in edge_list:
            nxt[d] += 0.85 * ranks[s] / outdeg[s]
        ranks = nxt
    for i in range(n):
        assert got[i] == pytest.approx(ranks[i] * G.SCALE, abs=100)


def test_keep_best_picks_highest_quality_then_smallest_id(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (9, 5)], "id long, quality long")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "id long, component_id long")
    rows = {r.id: r for r in D.keep_best(docs, clusters).collect()}
    assert not rows[1].kept               # quality 10 loses to 30
    assert rows[2].kept                   # tie on 30 → smaller id wins
    assert not rows[3].kept
    assert rows[9].kept                   # unpaired → singleton, kept
    assert rows[9].component_id == 9


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_dedup_drops_exact_duplicate_doc(spark):
    text = " ".join(f"w{i}" for i in range(20))
    out = D.dedup_paragraphs(
        _docs(spark, [(1, text), (2, text)]), chunk_words=8).collect()
    # doc 2's every chunk first occurred in doc 1 → doc 2 vanishes
    assert {r.id for r in out} == {1}
    r = out[0]
    assert r.n_chunks == 3 and r.n_kept == 3
    assert r.text_dedup == text


def test_paragraph_dedup_keeps_only_novel_suffix(spark):
    base = " ".join(f"w{i}" for i in range(16))      # 2 aligned chunks
    extra = "fresh words here"
    out = {r.id: r for r in D.dedup_paragraphs(
        _docs(spark, [(1, base), (2, base + " " + extra)]),
        chunk_words=8).collect()}
    assert out[1].n_kept == 2 and out[1].text_dedup == base
    # doc 2 keeps only its third, novel chunk
    assert out[2].n_chunks == 3 and out[2].n_kept == 1
    assert out[2].text_dedup == extra


def test_paragraph_dedup_reassembles_in_position_order(spark):
    # shared MIDDLE chunk: doc 2 keeps chunks 0 and 2, joined in order
    a = " ".join(f"a{i}" for i in range(8))
    shared = " ".join(f"s{i}" for i in range(8))
    b = " ".join(f"b{i}" for i in range(8))
    out = {r.id: r for r in D.dedup_paragraphs(
        _docs(spark, [(1, shared), (2, a + " " + shared + " " + b)]),
        chunk_words=8).collect()}
    assert out[2].text_dedup == a + " " + b
    assert out[2].n_kept == 2 and out[2].n_chunks == 3


def test_paragraph_dedup_whitespace_variants_collapse(spark):
    text = " ".join(f"w{i}" for i in range(8))
    out = D.dedup_paragraphs(
        _docs(spark, [(1, text), (2, text + "  "), (3, "  " + text)]),
        chunk_words=8).collect()
    assert {r.id for r in out} == {1}


def test_keep_best_exact_beyond_ten_million_ids(spark):
    # struct-keyed argmax (quality desc, id asc) must stay exact at id
    # spaces past 10^7 where the old single-column quality*10^7 - id key
    # would overflow/mis-rank
    big = 10_000_000_007
    docs = spark.createDataFrame(
        [(big, 50), (big + 1, 50), (big + 2, 99)], "id long, quality long")
    clusters = spark.createDataFrame(
        [(big, big), (big + 1, big), (big + 2, big)],
        "id long, component_id long")
    rows = {r.id: r for r in D.keep_best(docs, clusters).collect()}
    assert rows[big + 2].kept            # highest quality wins
    assert not rows[big].kept and not rows[big + 1].kept


# ---------------------------------------------------------------------------
# simhash_near_pairs banding geometry (configurable n_bands + pigeonhole)
# ---------------------------------------------------------------------------


def _sig(spark, sigs):
    return spark.createDataFrame(list(enumerate(sigs)),
                                 "id long, simhash long")


def test_simhash_pigeonhole_violation_raises(spark):
    sim = _sig(spark, [0, 1])
    with pytest.raises(ValueError, match="pigeonhole"):
        D.simhash_near_pairs(sim, max_hamming=3, n_bands=2)
    with pytest.raises(ValueError, match="divide 64"):
        D.simhash_near_pairs(sim, n_bands=5, max_hamming=3)


def test_simhash_band_geometries_agree_with_brute_force(spark):
    # signatures spanning sign bit, adjacent bits, cross-band flips
    sigs = [0, 1, 3, 1 << 17, (1 << 17) | 1, -1, -2, (1 << 63) - 1,
            -(1 << 63), 0b111, (1 << 48) | (1 << 16)]
    sim = _sig(spark, sigs)

    def brute(h):
        out = set()
        for i, a in enumerate(sigs):
            for j, b in enumerate(sigs):
                if i < j and bin((a ^ b) & ((1 << 64) - 1)).count("1") <= h:
                    out.add((i, j))
        return out

    for n_bands, h in [(4, 3), (8, 3), (2, 1), (16, 7)]:
        got = {(r.id_a, r.id_b) for r in
               D.simhash_near_pairs(sim, max_hamming=h,
                                    n_bands=n_bands).collect()}
        assert got == brute(h), (n_bands, h)


# ---------------------------------------------------------------------------
# anchor-text extraction + per-target rollup (graph.anchor_rollup)
# ---------------------------------------------------------------------------


def test_extract_anchors_kernel():
    from python_web_scraper_cleaner_spark.functions.kernel import (
        extract_anchors)
    h = ('<a href="/x">go <b>here</b></a>'
         '<a href="http://e.com/y">y1</a><a href="http://e.com/y">y1</a>'
         '<a href="mailto:a@b">skip</a><a href="#frag">skip</a>'
         '<a href="/tail">unclosed trailing')
    got = extract_anchors(h, "http://base.example/dir/")
    assert got == [("http://base.example/x", "go here"),
                   ("http://e.com/y", "y1"), ("http://e.com/y", "y1"),
                   ("http://base.example/tail", "unclosed trailing")]


def test_anchor_rollup_counts_and_top_anchor(spark):
    from python_web_scraper_cleaner_spark.operators.graph import anchor_rollup
    pages = spark.createDataFrame(
        [("http://s1.example/", b'<a href="/t">alpha</a><a href="/t">beta</a>'),
         ("http://s1.example/b", b'<a href="/t">beta</a>'),
         ("http://s2.example/", b'<a href="http://s1.example/t">beta</a>'
                                b'<a href="http://s1.example/t">gamma</a>')],
        "url string, html binary")
    got = {r.target: r for r in anchor_rollup(pages).collect()}
    t = got["http://s1.example/t"]
    # anchors: alpha×1, beta×3, gamma×1 → top = beta (max count)
    assert (t.n_refs, t.n_unique_anchors, t.top_anchor) == (5, 3, "beta")


def test_anchor_rollup_tie_breaks_lexicographically(spark):
    from python_web_scraper_cleaner_spark.operators.graph import anchor_rollup
    pages = spark.createDataFrame(
        [("http://s.example/", b'<a href="/t">zeta</a><a href="/t">alpha</a>')],
        "url string, html binary")
    r = anchor_rollup(pages).collect()[0]
    assert r.top_anchor == "alpha"  # counts tie at 1 → lexicographic min


def test_incremental_index_append_loop(spark):
    """Two crawl rounds against a growing signature index: round 1's kept
    doc becomes round 2's dedup evidence — the full production loop
    (probe -> drop -> append) with the corpus never re-shingled."""
    base_txt = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame([(1, base_txt)], "doc_id long, text string")
    bands = D.banded_signatures(corpus, "doc_id", "text",
                                k=3, n_hashes=16, band_size=4)

    # round 1: one dup of doc 1, one novel doc
    novel_txt = "completely different words about spark shuffles and joins"
    r1 = spark.createDataFrame(
        [(100, base_txt), (101, novel_txt)], "doc_id long, text string")
    pairs = D.minhash_lsh_probe_index(bands, corpus, r1, k=3, n_hashes=16,
                                      band_size=4, threshold=0.7)
    dropped = {r.id_b for r in pairs.collect()}
    assert dropped == {100}
    kept = r1.filter(~F.col("doc_id").isin(list(dropped)))
    kept_bands = D.banded_signatures(kept, "doc_id", "text",
                                     k=3, n_hashes=16, band_size=4)
    bands2 = D.append_to_signature_index(
        bands, kept_bands, kept.select(F.col("doc_id").alias("id")))

    # round 2: a dup of the ROUND-1 doc must now be caught by the index
    corpus2 = corpus.unionByName(kept)
    r2 = spark.createDataFrame([(200, novel_txt)], "doc_id long, text string")
    pairs2 = D.minhash_lsh_probe_index(bands2, corpus2, r2, k=3,
                                       n_hashes=16, band_size=4,
                                       threshold=0.7)
    got = {(r.id_a, r.id_b) for r in pairs2.select("id_a", "id_b").collect()}
    assert got == {(101, 200)}


def _redirects(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_resolve_redirects_exact_hops_and_terminals(spark):
    """Path doubling resolves every chain position to the shared terminal
    with EXACT hop counts (a jump through an already-terminal row adds
    its remaining hops, never overshooting)."""
    # chain a0->a1->...->a6 (terminal a6) + a separate 1-hop pair
    pairs = [(f"a{i}", f"a{i+1}") for i in range(6)] + [("b0", "b1")]
    out = {r["src"]: r for r in G.resolve_redirect_chains(
        _redirects(spark, pairs), max_hops=8).collect()}
    assert len(out) == 7
    for i in range(6):
        r = out[f"a{i}"]
        assert (r["final_url"], r["hops"], r["unresolved"]) == \
            ("a6", 6 - i, False)
    assert (out["b0"]["final_url"], out["b0"]["hops"]) == ("b1", 1)


def test_resolve_redirects_cycles_and_budget(spark):
    """Cycles (self-loops included) and over-budget chains flag
    unresolved with NULL final_url/hops; raising the budget resolves the
    long chain."""
    cycle = [("c0", "c1"), ("c1", "c2"), ("c2", "c0"), ("s", "s")]
    # entering a cycle from outside is unresolvable too
    pairs = cycle + [("e", "c0")] + \
        [(f"L{i}", f"L{i+1}") for i in range(40)]
    out = {r["src"]: r for r in G.resolve_redirect_chains(
        _redirects(spark, pairs), max_hops=32).collect()}
    for s in ("c0", "c1", "c2", "s", "e", "L0"):
        r = out[s]
        assert r["unresolved"] and r["final_url"] is None \
            and r["hops"] is None
    assert not out["L20"]["unresolved"]          # 20 hops fits the budget
    wide = {r["src"]: r for r in G.resolve_redirect_chains(
        _redirects(spark, pairs), max_hops=64).collect()}
    assert (wide["L0"]["final_url"], wide["L0"]["hops"]) == ("L40", 40)


def test_resolve_redirects_competing_records_pick_min_dst(spark):
    """Multiple records for one src collapse deterministically to
    min(dst) before resolution."""
    out = {r["src"]: r for r in G.resolve_redirect_chains(
        _redirects(spark, [("x", "z"), ("x", "a"), ("a", "m")])).collect()}
    assert (out["x"]["final_url"], out["x"]["hops"]) == ("m", 2)


def test_hits_star_separates_hubs_from_authority(spark):
    """Spokes 1..5 → hub 0 (no out-edge from 0): node 0 is the ONLY
    authority (max-normalized to scale), spokes are equal pure hubs."""
    scale = 10**6
    edges = _edges(spark, [(i, 0) for i in range(1, 6)])
    rows = {r.id: r for r in G.hits_fixed_point(
        edges, _nodes(spark, range(6)), iters=2, scale=scale).collect()}
    assert rows[0].auth_fp == scale and rows[0].hub_fp == 0
    for i in range(1, 6):
        assert rows[i].hub_fp == scale and rows[i].auth_fp == 0


def test_hits_bipartite_roles_are_disjoint(spark):
    """Edges {0,1}→{2,3}: hub mass only on the left, authority mass only
    on the right; 1 links to both targets so it out-hubs 0."""
    edges = _edges(spark, [(0, 2), (1, 2), (1, 3)])
    rows = {r.id: r for r in G.hits_fixed_point(
        edges, _nodes(spark, range(4)), iters=2).collect()}
    assert rows[0].auth_fp == 0 and rows[1].auth_fp == 0
    assert rows[2].hub_fp == 0 and rows[3].hub_fp == 0
    assert rows[1].hub_fp == 10**6 > rows[0].hub_fp > 0
    assert rows[2].auth_fp == 10**6 > rows[3].auth_fp > 0


def test_hits_empty_edges_all_zero_no_div_error(spark):
    """No edges: every score collapses to 0 via the greatest(max,1)
    guard — never an ANSI division-by-zero abort."""
    edges = _edges(spark, []).limit(0)
    rows = G.hits_fixed_point(edges, _nodes(spark, range(3)),
                              iters=1).collect()
    assert all(r.auth_fp == 0 and r.hub_fp == 0 for r in rows)


def test_hits_matches_float_reference(spark):
    """Integer fixed-point tracks float HITS with max-normalization
    within rounding (1 unit per floor division per half-step)."""
    n, iters, scale = 8, 3, 10**6
    edge_list = [(i, (i * 3 + 1) % n) for i in range(n)] + \
                [(i, (i + 2) % n) for i in range(n)]
    got = {r.id: r for r in G.hits_fixed_point(
        _edges(spark, edge_list), _nodes(spark, range(n)),
        iters=iters, scale=scale).collect()}
    auth = {i: 1.0 for i in range(n)}
    hub = {}
    for _ in range(iters):
        hub = {i: sum(auth[d] for s, d in edge_list if s == i)
               for i in range(n)}
        mx = max(max(hub.values()), 1e-12)
        hub = {i: v / mx for i, v in hub.items()}
        auth = {j: sum(hub[s] for s, d in edge_list if d == j)
                for j in range(n)}
        mx = max(max(auth.values()), 1e-12)
        auth = {j: v / mx for j, v in auth.items()}
    for i in range(n):
        assert abs(got[i].auth_fp - auth[i] * scale) <= 2 * iters + 2
        assert abs(got[i].hub_fp - hub[i] * scale) <= 2 * iters + 2


def test_host_link_rollup_hand_graph(spark):
    """Hand graph: a↔b reciprocal pair (the link-farm tell), a→a
    self-links, c linked-to only. All bp integers, zero-guarded."""
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a"),   # reciprocal peers
         ("a", "a"), ("a", "a"),               # intra-host
         ("a", "c"), ("b", "c")],              # c: in-only host
        "src_host string, dst_host string")
    out = {r["host"]: r for r in G.host_link_rollup(edges).collect()}
    a, b, c = out["a"], out["b"], out["c"]
    assert (a["n_out"], a["n_in"]) == (5, 3)   # 2ab+2aa+1ac / 1ba+2aa
    assert a["intra_bp"] == 10000 * 2 // 5
    # a's distinct out-peers: b, c; only b links back -> 5000 bp
    assert (a["n_peers_out"], a["recip_bp"]) == (2, 5000)
    assert (b["n_peers_out"], b["recip_bp"]) == (2, 5000)
    # c never links out: zero-guarded ratios, not a division error
    assert (c["n_out"], c["n_in"], c["intra_bp"],
            c["n_peers_out"], c["recip_bp"]) == (0, 2, 0, 0, 0)
