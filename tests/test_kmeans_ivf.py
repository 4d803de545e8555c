"""k-means IVF codebook tests: exact determinism (the property the SQL
oracle depends on) and sane codebook/topk shapes."""

from pyspark.sql import functions as F

from python_web_scraper_cleaner_spark.operators import similarity as SIM


def _emb(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
            .select(F.col("vec_id").alias("id"),
                    F.col("embedding").alias("vec")))


def test_kmeans_centroids_deterministic(spark):
    emb = _emb(spark)
    a = {r["cid"]: tuple(r["cv"]) for r in
         SIM.kmeans_centroids(emb, k=8, iters=2).collect()}
    b = {r["cid"]: tuple(r["cv"]) for r in
         SIM.kmeans_centroids(emb, k=8, iters=2).collect()}
    assert a == b
    assert 0 < len(a) <= 8
    # centroids moved off their init vectors (training actually happened)
    init = {r["id"]: tuple(r["fv"]) for r in
            emb.orderBy("id").limit(8)
            .select("id", SIM._fixed_vec(F.col("vec"), 1_000_000)
                    .alias("fv")).collect()}
    assert any(a[cid] != init[cid] for cid in a if cid in init)


def test_multiprobe_recall_at_least_single_probe(spark):
    """Multi-probe must recover at least as many true (brute-force)
    top-1 neighbors as single-probe — that's its whole point."""
    emb = _emb(spark)
    q, c = emb.filter(F.col("id") < 20), emb.filter(F.col("id") >= 20)
    truth = {r["query_id"]: r["neighbor_id"] for r in
             SIM.brute_force_topk(q, c, k=1).collect()}
    single = {r["query_id"]: r["neighbor_id"] for r in
              SIM.lsh_topk(q, c, k=1, n_planes=4).collect()}
    multi = {r["query_id"]: r["neighbor_id"] for r in
             SIM.lsh_multiprobe_topk(q, c, k=1, n_planes=4).collect()}
    hits_single = sum(single.get(i) == truth[i] for i in truth)
    hits_multi = sum(multi.get(i) == truth[i] for i in truth)
    assert hits_multi >= hits_single
    assert len(multi) == len(truth)  # every query answered


def test_ivf_kmeans_topk_shape(spark):
    emb = _emb(spark)
    out = SIM.ivf_kmeans_topk(emb.filter(F.col("id") < 5),
                              emb.filter(F.col("id") >= 5),
                              k=3, n_centroids=8, iters=1).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r)
        assert -1.0001 <= r["cos_sim"] <= 1.0001
    assert set(per_q) == {0, 1, 2, 3, 4}
    for rows in per_q.values():
        assert sorted(r["rank"] for r in rows) == [1, 2, 3]
