"""Deterministic corpus sampling + training-shard packing.

Engine extensions for large-scale training-data pipelines (the reference
repo at /root/reference is a scraper/cleaner; these are the downstream
corpus-assembly steps the build brief mandates as first-class
components). Two operators:

``stratified_sample`` — rebalance a skewed language/source mix by keeping
at most ``target`` docs per stratum, chosen DETERMINISTICALLY by a
content-independent hash of the doc id. The keep/drop decision is a pure
filter (md5-derived uniform in [0, 10000) compared against a per-stratum
threshold), so at 100 TB the corpus scan stays shuffle-free: the only
exchange is the tiny per-stratum count aggregate, which is then broadcast
back. No window functions, no per-stratum sorting, no text movement.

``pack_shards`` — assign docs (in a stable global order) to fixed
token-budget training shards: shard_id = floor(tokens_before / budget).
A single global cumulative-sum window would serialize the corpus through
ONE task, so the prefix sum is distributed classically: per-bucket
cumulative sums run in parallel (window partitioned by bucket), bucket
TOTALS — thousands of rows, not billions — take the only global window,
and each doc's global prefix = bucket offset + within-bucket prefix.
Exchanges: one hash shuffle on bucket for the window, one tiny aggregate,
one broadcast join back. The bucket width trades parallelism against the
offset-frame size; any value keeps the result bit-identical.

md5 rather than xxhash64 for the sampling key so the DuckDB oracle can
reproduce the exact decision; in production xxhash64(id) drops in with
the same plan shape and a cheaper hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_bp(col):
    """Deterministic uniform in [0, 10000) from the first 8 md5 hex chars
    of the stringified column — bit-identical in Spark and DuckDB."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
            .cast("long") % 10000)


def stratified_sample(df: DataFrame, *, strata_cols: list[str],
                      id_col: str, target: int) -> DataFrame:
    """Keep ~``target`` rows per stratum, deterministically.

    Returns the input rows plus a ``sampled`` boolean — callers filter on
    it (kept separate so the same pass can emit the audit aggregate).
    Per stratum the keep threshold is floor(10000 * target / n_total)
    basis points, so expected kept ≈ target with each row's fate a pure
    function of its id — re-runs, retries, and different cluster sizes
    all keep the SAME rows (the property that makes corpus builds
    reproducible).
    """
    counts = (df.groupBy(*strata_cols)
              .agg(F.count("*").alias("stratum_total")))
    thresh = counts.withColumn(
        "keep_bp",
        F.least(F.lit(10000),
                F.floor(F.lit(10000.0) * target / F.col("stratum_total"))
                .cast("long")))
    return (df.join(F.broadcast(thresh), strata_cols)
            .withColumn("sampled", _hash_bp(F.col(id_col)) < F.col("keep_bp")))


def sample_audit(df: DataFrame, *, strata_cols: list[str],
                 id_col: str, target: int) -> DataFrame:
    """(strata…, n_total, n_kept): the rebalancing audit a corpus build
    logs — one tiny aggregate over the sampled flag."""
    s = stratified_sample(df, strata_cols=strata_cols, id_col=id_col,
                          target=target)
    return (s.groupBy(*strata_cols)
            .agg(F.count("*").alias("n_total"),
                 F.sum(F.col("sampled").cast("long")).alias("n_kept")))


def chunk_documents(df: DataFrame, *, id_col: str, text_col: str,
                    chunk_tokens: int, overlap: int = 0) -> DataFrame:
    """(id, chunk_idx, n_chunk_tokens, chunk): fixed-token-window
    segmentation with overlap — the standard context-window chunking a
    training pipeline runs before token-budget packing (pack_shards
    consumes its output). Window i covers tokens [i·stride, i·stride +
    chunk_tokens) with stride = chunk_tokens − overlap; the last window
    may be shorter; empty documents yield no chunks.

    Scale shape: pure JVM expressions end to end (split → sequence →
    posexplode → slice/array_join inside whole-stage codegen) — the
    corpus scan is SHUFFLE-FREE and the text column never moves except
    as its own chunk rows; no UDF, no window function. Number of chunks
    per doc is 1 + ceil(max(0, n − chunk_tokens)/stride), so output size
    is ~n/stride rows per doc regardless of skew.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(F.trim(F.col(text_col)) == "", F.lit(0)) \
        .otherwise(F.size(toks))
    n_chunks = F.when(n <= 0, F.lit(0).cast("long")).otherwise(
        F.lit(1) + F.floor((F.greatest(n - F.lit(chunk_tokens), F.lit(0))
                            + F.lit(stride - 1)) / stride)).cast("long")
    base = (df.select(F.col(id_col).alias("id"), toks.alias("_toks"),
                      n_chunks.alias("_nc"))
            .filter(F.col("_nc") > 0))
    idx = F.explode(F.sequence(F.lit(0).cast("long"),
                               F.col("_nc") - 1)).alias("chunk_idx")
    piece = F.slice(F.col("_toks"),
                    (F.col("chunk_idx") * stride + 1).cast("int"),
                    chunk_tokens)
    return (base.select("id", idx, "_toks")
            .select("id", F.col("chunk_idx").cast("long").alias("chunk_idx"),
                    F.size(piece).cast("long").alias("n_chunk_tokens"),
                    F.array_join(piece, " ").alias("chunk")))


def pack_shards(df: DataFrame, *, id_col: str, tokens_col: str,
                budget: int, bucket_width: int | None = None,
                target_buckets: int = 4096) -> DataFrame:
    """(id, n_tokens, shard_id): fixed token-budget shard assignment in
    ``id_col`` order via a distributed prefix sum.

    shard_id = floor(prefix_tokens_before_this_doc / budget) — the greedy
    sequential packing a training-data writer uses, computed without ever
    funneling the corpus through a single-task global window:

      1. bucket = id // bucket_width; within-bucket cumulative sum
         (window PARTITIONED by bucket — parallel).
      2. bucket totals get the only unpartitioned window — bounded rows
         (see below), safely single-task.
      3. global prefix = bucket offset (broadcast join) + local prefix.

    Bucket geometry: with ``bucket_width=None`` (default) the width is
    derived from the OBSERVED id span — ceil(span / target_buckets) via
    one tiny min/max aggregate — so the single-task bucket-totals window
    sees at most ~``target_buckets`` rows no matter how sparse or
    clustered the id space is (xxhash64 ids, tombstoned ranges, …).
    Passing an explicit ``bucket_width`` skips that aggregate but assumes
    ROUGHLY DENSE ids: the totals frame is then driven by
    span/bucket_width, not n_docs/bucket_width, and a sparse id space
    (span ≫ n_docs) degrades it back toward one row per doc — only pin a
    width when you control the id layout. Heavily clustered ids cost
    parallelism on the derived path (few non-empty buckets), never
    correctness: the result is bit-identical for ANY bucketing because
    buckets are contiguous in id order.

    Docs longer than ``budget`` get a shard to themselves (floor math
    handles it; the NEXT doc starts a fresh shard).
    """
    if bucket_width is None:
        lo, hi = df.select(F.min(F.col(id_col).cast("long")),
                           F.max(F.col(id_col).cast("long"))).first()
        span = 1 if lo is None else hi - lo + 1
        bucket_width = max(1, -(-span // target_buckets))
    w_local = (Window.partitionBy("bucket").orderBy("id")
               .rowsBetween(Window.unboundedPreceding, -1))
    local = (df.select(F.col(id_col).alias("id"),
                       F.col(tokens_col).cast("long").alias("n_tokens"))
             .withColumn("bucket", F.floor(F.col("id") / bucket_width)
                         .cast("long"))
             .withColumn("local_prefix",
                         F.coalesce(F.sum("n_tokens").over(w_local),
                                    F.lit(0))))
    totals = (local.groupBy("bucket")
              .agg(F.sum("n_tokens").alias("bucket_tokens")))
    w_bucket = (Window.orderBy("bucket")
                .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.withColumn(
        "bucket_offset",
        F.coalesce(F.sum("bucket_tokens").over(w_bucket), F.lit(0)))
    return (local.join(F.broadcast(offsets.select("bucket", "bucket_offset")),
                       "bucket")
            .select("id", "n_tokens",
                    F.floor((F.col("bucket_offset")
                             + F.col("local_prefix")) / budget)
                    .cast("long").alias("shard_id")))


def leakage_safe_split(df: DataFrame, *, unit_col: str,
                       splits: tuple = (("train", 9800), ("valid", 100),
                                        ("test", 100))) -> DataFrame:
    """Assign every row to a train/valid/test split by hashing the
    GROUPING UNIT (registrable domain / host), never the document id.

    Near-duplicate documents cluster within a site, so a doc-keyed split
    leaks templated near-dups across train and eval — the contamination
    vector per-split MinHash dedup cannot fix (each split dedups only
    against itself). Hashing the unit makes the split a pure function of
    the domain: every doc of a domain lands in ONE split, and re-runs,
    retries, and cluster resizes reproduce the identical assignment
    (same md5-basis-point determinism as stratified_sample). Split
    widths are basis points and must sum to 10000; the realized DOC
    share tracks the widths only insofar as domains are balanced —
    report the audit rollup, don't assume.

    100-TB shape: one md5 projection + a literal when-chain — zero
    joins, zero exchanges; composes into any corpus scan."""
    total = sum(w for _, w in splits)
    if total != 10000:
        raise ValueError(f"split widths must sum to 10000 bp, got {total}")
    if len(splits) < 2:
        raise ValueError("need at least two splits")
    bp = _hash_bp(F.col(unit_col))
    expr = None
    acc = 0
    for name, width in splits[:-1]:
        acc += width
        expr = (F.when(bp < acc, name) if expr is None
                else expr.when(bp < acc, name))
    return df.withColumn("split", expr.otherwise(splits[-1][0]))


def mixture_weights(df: DataFrame, *, strata_cols: list[str],
                    tokens_col: str, budget_tokens: int) -> DataFrame:
    """Temperature-scaled data-mixing allocation: split a training token
    budget across (language, source, ...) strata proportionally to
    sqrt(stratum tokens) — the tau = 0.5 temperature sampling used for
    multilingual/multi-source LLM mixes (mT5/XLM-R convention: raw
    proportions starve tail strata, uniform over-weights them; the square
    root is the standard compromise).

    Input: one row per doc with a precomputed token count. Output per
    stratum: n_docs, n_tokens, weight (floor(sqrt(n_tokens)) — integer
    fixed-point so Spark and the oracle agree bit-for-bit; IEEE-754
    sqrt is correctly rounded and n_tokens is exact in double far beyond
    any real stratum), share_bp (basis points of the mix), alloc_tokens
    (integer split of ``budget_tokens``; floor division, so the total
    never overshoots the budget), and epochs_bp (alloc / available — a
    value over 10000 means the stratum repeats during training: the
    oversampling audit reviewers check before a run).

    Scale shape (100 TB): ONE map-side-combined aggregate to stratum
    cardinality, then a single-row total joined back by broadcast —
    stratum counts are thousands of rows; nothing text-sized moves.
    ANSI-safe: total weight >= 1 whenever any stratum has a token, and
    both divisions are guarded for the degenerate all-empty stratum.
    """
    per = (df.groupBy(*strata_cols)
           .agg(F.count("*").alias("n_docs"),
                F.sum(F.col(tokens_col).cast("long")).alias("n_tokens")))
    per = per.withColumn(
        "weight", F.floor(F.sqrt(F.col("n_tokens"))).cast("long"))
    total = per.agg(F.sum("weight").alias("_tw"))
    j = per.crossJoin(F.broadcast(total))
    alloc = F.when(F.col("_tw") > 0,
                   F.expr(f"({budget_tokens} * weight) div _tw")) \
             .otherwise(F.lit(0)).cast("long")
    share = F.when(F.col("_tw") > 0,
                   F.expr("(10000 * weight) div _tw")) \
             .otherwise(F.lit(0)).cast("long")
    out = (j.withColumn("share_bp", share)
           .withColumn("alloc_tokens", alloc)
           .withColumn(
               "epochs_bp",
               F.when(F.col("n_tokens") > 0,
                      F.expr("(10000 * alloc_tokens) div n_tokens"))
               .otherwise(F.lit(0)).cast("long")))
    return out.select(*strata_cols, "n_docs", "n_tokens", "weight",
                      "share_bp", "alloc_tokens", "epochs_bp")


def cluster_balanced_sample(assigned: DataFrame, *, id_col: str = "id",
                            cluster_col: str = "cid",
                            cap_per_cluster: int = 5) -> DataFrame:
    """Diversity sampling over an embedding clustering (the SemDeDup /
    cluster-balanced curation stage): keep AT MOST cap_per_cluster docs
    per cluster, chosen by a content-independent hash of the id — so
    mega-clusters (boilerplate, templates, near-dup families the
    verbatim dedup tiers missed) stop dominating the training mix while
    the long tail of small clusters survives intact. Input is any
    (id, cluster) assignment — similarity.ivf_assign over a
    kmeans_centroids codebook is the canonical producer.

    Output: input row + n_in_cluster, sample_rank (1-based hash rank
    within the cluster), kept.

    Scale shape: the rank and the cluster size share ONE
    hashpartitioning(cluster) exchange (window + count over the same
    partitioning). The window sorts per cluster, so a pathological
    mega-cluster serializes through one task — at 10^9-vector scale
    either pre-split hot clusters by a salt (rank within (cluster,
    salt), cap//n_salts each, exact and parallel) or switch to
    stratified_sample's rate-based pure-filter shape when an
    approximate cap suffices; for the typical k-means codebook
    (bounded k, clusters ~corpus/k) the single exchange is the right
    trade."""
    w = Window.partitionBy(cluster_col)
    rank = F.row_number().over(
        w.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col)))
    return (assigned
            .withColumn("n_in_cluster",
                        F.count(F.lit(1)).over(w).cast("long"))
            .withColumn("sample_rank", rank.cast("long"))
            .withColumn("kept", F.col("sample_rank") <= cap_per_cluster))


def weighted_sample_keys(df: DataFrame, *, id_col: str,
                         weight_col: str, max_weight: int = 16) -> DataFrame:
    """Integer-exact weighted priority keys for top-k sampling WITHOUT
    replacement: each row gets ``weight`` lottery tickets, ticket j's
    value is the md5-derived 32-bit integer of ``id:j``, and the row's
    key is the MIN ticket. Taking the k smallest keys yields a weighted
    sample — higher-weight rows hold more tickets, so their minimum is
    stochastically smaller (inclusion odds scale ~linearly with weight
    for weights ≪ 2^32).

    This is the bit-deterministic cousin of Efraimidis–Spirakis A-ES
    sampling: A-ES keys are u^(1/w) — transcendental floats whose last
    ulp can differ across engines/libm builds and silently flip ranks at
    the k-boundary. Ticket-min keys are pure integer md5 arithmetic, so
    the SAME sample falls out of Spark, the DuckDB oracle, a re-run, or
    a different cluster size — the reproducibility property a corpus
    build needs more than exact A-ES inclusion probabilities.

    Scale shape: the ticket array is built and min-folded INSIDE the
    row's projection (transform over sequence(0, w-1) + array_min — no
    explode, no extra rows), so the corpus scan stays shuffle-free; the
    only data movement is the final TakeOrderedAndProject for top-k.
    ``max_weight`` bounds per-row hashing cost; weights are clamped into
    [1, max_weight]."""
    # coalesce BEFORE clamping: least/greatest skip NULL args, so a NULL
    # weight would otherwise clamp to max_weight — handing a row with
    # MISSING data the best inclusion odds. Missing weight = 1 ticket.
    w = F.greatest(F.lit(1), F.least(F.lit(max_weight),
                                     F.coalesce(
                                         F.col(weight_col).cast("long"),
                                         F.lit(1))))
    idc = F.col(id_col).cast("string")
    tickets = F.transform(
        F.sequence(F.lit(0), (w - 1).cast("int")),
        lambda j: F.conv(
            F.substring(F.md5(F.concat(idc, F.lit(":"), j.cast("string"))),
                        1, 8), 16, 10).cast("long"))
    return df.withColumn("weight", w).withColumn(
        "ticket_key", F.array_min(tickets))
