"""Connected components over near-dup pairs (operators/dedup.py).

The component closure is what turns pairwise near-dup relations into
keep/drop decisions; these tests pin convergence (including long chains,
which exercise pointer jumping) and canonical selection.
"""

import pytest

from python_web_scraper_cleaner_spark.operators import dedup as D


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_components_basic_clusters(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)]
    got = {(r.id, r.component_id)
           for r in D.connected_components(_pairs_df(spark, pairs)).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10),
                   (20, 20), (21, 20), (22, 20)}


def test_components_long_chain_converges_logarithmically(spark):
    # a 40-node path has diameter 39; plain min-propagation needs ~39
    # rounds — pointer jumping must close it inside max_iter=15
    pairs = [(i, i + 1) for i in range(1, 40)]
    rows = D.connected_components(_pairs_df(spark, pairs),
                                  max_iter=15).collect()
    assert len(rows) == 40
    assert {r.component_id for r in rows} == {1}


def test_components_order_and_orientation_invariant(spark):
    # reversed pair orientation and duplicate edges change nothing
    fwd = [(1, 2), (2, 3)]
    rev = [(3, 2), (2, 1), (2, 1)]
    a = {(r.id, r.component_id)
         for r in D.connected_components(_pairs_df(spark, fwd)).collect()}
    b = {(r.id, r.component_id)
         for r in D.connected_components(_pairs_df(spark, rev)).collect()}
    assert a == b == {(1, 1), (2, 1), (3, 1)}


def test_dedup_clusters_canonical_is_min_id(spark):
    pairs = [(7, 5), (5, 9), (30, 31)]
    rows = D.dedup_clusters(_pairs_df(spark, pairs)).collect()
    canon = {r.id for r in rows if r.is_canonical}
    assert canon == {5, 30}
    dropped = {r.id for r in rows if not r.is_canonical}
    assert dropped == {7, 9, 31}


def test_components_unconverged_raises(spark):
    pairs = [(i, i + 1) for i in range(1, 20)]
    with pytest.raises(RuntimeError, match="no convergence"):
        D.connected_components(_pairs_df(spark, pairs), max_iter=1)
