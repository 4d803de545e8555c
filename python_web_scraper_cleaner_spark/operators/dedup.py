"""Deduplication operators for web-scale corpora.

Reference analog: the URL-seen set + skip-if-output-exists incremental logic
(/root/reference/scripts/news.py:17-34, scraper_cleaner/html_cleaner_core.py
:169-177) generalized to *content* dedup, the core of a training-data
pipeline. All operators are pure DataFrame compositions (JVM-side, whole-
stage-codegen-able) — no Python UDFs anywhere in this module.

Scale notes (100 TB design point):
- exact dedup: one hash-shuffle on a 32-char digest, AQE-coalesced.
- MinHash-LSH: tokenize → shingle → n_hashes minhashes → band → bucket join.
  Only docs sharing a (band, signature) bucket pair up, so candidate
  generation is linear-ish; the exact Jaccard verify joins only candidates.
- hot-shingle cap (``max_df``): drops shingles appearing in too many docs
  before the inverted-index join — the classic guard against quadratic
  blowup on boilerplate shingles.
- SimHash: 32-bit signature built with integer expressions over md5 hex
  (stable across engines → DuckDB-oracle-checkable), banded into 4×8-bit
  chunks for candidate generation, Hamming-verified.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tokenize / shingle (JVM-side)
# ---------------------------------------------------------------------------


def tokens(text: Column) -> Column:
    """Whitespace tokens of lowercased text (JVM split, no UDF)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def shingles_col(text: Column, k: int = 3) -> Column:
    """k-token shingles as an array<string>; shorter docs yield one shingle
    (kernel.shingles parity)."""
    toks = tokens(text)
    n = F.size(toks)
    return F.when(n <= k, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ))


def exploded_shingles(df: DataFrame, id_col: str, text_col: str,
                      k: int = 3, *, distinct: bool = True) -> DataFrame:
    """(id, shingle) long format — the inverted-index input.

    Dedup happens per-document with ``array_distinct`` BEFORE the explode:
    (id, shingle) pairs can only repeat within one document, so this equals
    a global ``.distinct()`` — without its full shuffle of the exploded
    frame. The explode is narrow, so an upstream repartition by id still
    satisfies the groupBy(id) distributions downstream (signature, sizes):
    the whole shingle→signature path runs shuffle-free."""
    col = shingles_col(F.col(text_col), k)
    if distinct:
        col = F.array_distinct(col)
    return df.select(F.col(id_col).alias("id"),
                     F.explode(col).alias("shingle"))


# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group rows by content fingerprint; representative = min id.

    Returns (fingerprint, rep_id, n_copies). One shuffle on the digest —
    at 100 TB hash only, never shuffle the text column itself."""
    return (df
            .select(F.md5(F.col(text_col)).alias("fingerprint"),
                    F.col(id_col).alias("id"))
            .groupBy("fingerprint")
            .agg(F.min("id").alias("rep_id"),
                 F.count("*").alias("n_copies")))


def drop_exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep only the min-id representative per identical text."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


MINHASH_P = 2_147_483_647  # 2^31 - 1 (prime) — universal-hash modulus


def minhash_wide(sh: DataFrame, n_hashes: int = 16) -> DataFrame:
    """(id, mh0..mhN): one hash-aggregate pass over the exploded shingles.

    Signature scheme: ONE md5 per shingle, split into two 32-bit ints
    (a, b); minhash j = min over shingles of (a + j·b) mod (2^31-1) — the
    classic universal-hash family. Hashing cost drops n_hashes× versus
    md5-per-seed (measured 12.0 s → well under at sf0.1: the 16 md5s per
    shingle dominated the query), while the same integer arithmetic is
    reproducible exactly in ANSI SQL for the DuckDB oracle.

    The min() aggregates combine map-side, so the shuffle carries only
    |docs| × n_hashes longs per partition — the scale path."""
    hashed = sh.select("id", F.md5(F.col("shingle")).alias("_h"))
    ab = hashed.select(
        "id",
        F.conv(F.substring("_h", 1, 8), 16, 10).cast("long").alias("_a"),
        F.conv(F.substring("_h", 9, 8), 16, 10).cast("long").alias("_b"))
    cols = [F.min((F.col("_a") + F.lit(j) * F.col("_b")) % MINHASH_P)
            .alias(f"mh{j}") for j in range(n_hashes)]
    return ab.groupBy("id").agg(*cols)


def _band_explode(wide: DataFrame, n_hashes: int, band_size: int) -> DataFrame:
    """(id, band, band_key) from the wide signature frame. band_key format
    matches the oracle SQL: sorted 'seed#minhash' strings joined by '|'.
    Single source of truth — both the standalone banded_signatures and
    minhash_lsh_dedup go through here so the key format cannot diverge
    from the SQL oracle."""
    n_bands = n_hashes // band_size
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("|", F.array_sort(F.array(*[
                F.concat_ws("#", F.lit(s), F.col(f"mh{s}"))
                for s in range(b * band_size, (b + 1) * band_size)])))
            .alias("band_key"))
        for b in range(n_bands)])
    return (wide.select("id", F.explode(bands).alias("bk"))
            .select("id", F.col("bk.band").alias("band"),
                    F.col("bk.band_key").alias("band_key")))


def banded_signatures(df: DataFrame, id_col: str, text_col: str, *,
                      k: int = 3, n_hashes: int = 16,
                      band_size: int = 4) -> DataFrame:
    """(id, band, band_key): LSH banding over the wide signature."""
    sh = exploded_shingles(df, id_col, text_col, k)
    return _band_explode(minhash_wide(sh, n_hashes), n_hashes, band_size)


def candidate_pairs_from_bands(banded: DataFrame) -> DataFrame:
    a, b = banded.alias("a"), banded.alias("b")
    return (a.join(b, ["band", "band_key"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())


def jaccard_for_pairs(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for given candidate pairs only: the pair list drives
    the shingle joins (candidates × shingles, not corpus × corpus).

    The intersection join runs on xxhash64(shingle) — 8-byte shuffle keys
    instead of ~25-byte strings; distinct shingles colliding at 64 bits is
    negligible at any realistic corpus size. Only shingles of ids that
    appear in some candidate pair enter the join (semi-join prefilter)."""
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    cand_ids = (pairs.select(F.col("id_a").alias("id"))
                .unionByName(pairs.select(F.col("id_b").alias("id")))
                .distinct())
    sh_c = (sh.join(cand_ids, "id", "left_semi")
            .select("id", F.xxhash64("shingle").alias("sh_h")))
    sh_a = sh_c.select(F.col("id").alias("id_a"), "sh_h")
    sh_b = sh_c.select(F.col("id").alias("id_b"), "sh_h")
    inter = (pairs.join(sh_a, "id_a")
             .join(sh_b, ["id_b", "sh_h"])
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("n_inter")))
    return (pairs
            .join(inter, ["id_a", "id_b"], "left")
            .join(sizes.withColumnRenamed("id", "id_a")
                  .withColumnRenamed("n_sh", "n_a"), "id_a")
            .join(sizes.withColumnRenamed("id", "id_b")
                  .withColumnRenamed("n_sh", "n_b"), "id_b")
            .select("id_a", "id_b",
                    (F.coalesce(F.col("n_inter"), F.lit(0)) /
                     (F.col("n_a") + F.col("n_b")
                      - F.coalesce(F.col("n_inter"), F.lit(0))))
                    .alias("jaccard")))


def minhash_long(sh: DataFrame, n_hashes: int = 16) -> DataFrame:
    """(id, seed, minhash): minhash = min over shingles of
    md5(seed || ':' || shingle). Hex-lexicographic min — the md5 PARITY
    tier matching kernel.minhash_signature / udfs.make_minhash_udf exactly.
    NOTE: a different scheme from minhash_wide (the fast universal-hash
    scale tier used by minhash_lsh_dedup); signatures from the two tiers
    are not comparable with each other."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    return (sh.select("id", "shingle", seeds)
            .select("id", "seed",
                    F.md5(F.concat_ws(":", F.col("seed"), F.col("shingle")))
                    .alias("h"))
            .groupBy("id", "seed")
            .agg(F.min("h").alias("minhash")))


def lsh_candidate_pairs(mh: DataFrame, n_hashes: int = 16,
                        band_size: int = 4) -> DataFrame:
    """Band minhashes and bucket-join: docs agreeing on ALL hashes of any
    band become candidate pairs (id_a < id_b)."""
    banded = (mh
              .withColumn("band", (F.col("seed") / band_size).cast("int"))
              .groupBy("id", "band")
              .agg(F.concat_ws("|", F.array_sort(
                  F.collect_list(F.concat_ws("#", "seed", "minhash"))))
                  .alias("band_key")))
    a = banded.alias("a")
    b = banded.alias("b")
    return (a.join(b, ["band", "band_key"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())


def jaccard_verify(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs from their distinct shingle sets.

    |A∩B| via shingle join restricted to candidates; |A∪B| = |A|+|B|-∩."""
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    inter = (sh.withColumnRenamed("id", "id_a")
             .join(sh.withColumnRenamed("id", "id_b"), "shingle")
             .filter(F.col("id_a") < F.col("id_b"))
             .join(pairs, ["id_a", "id_b"], "left_semi")
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("n_inter")))
    return (inter
            .join(sizes.withColumnRenamed("id", "id_a")
                  .withColumnRenamed("n_sh", "n_a"), "id_a")
            .join(sizes.withColumnRenamed("id", "id_b")
                  .withColumnRenamed("n_sh", "n_b"), "id_b")
            .select("id_a", "id_b",
                    (F.col("n_inter") /
                     (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
                    .alias("jaccard")))


def minhash_lsh_dedup(df: DataFrame, id_col: str, text_col: str, *,
                      k: int = 3, n_hashes: int = 16, band_size: int = 4,
                      threshold: float = 0.8) -> DataFrame:
    """End-to-end near-dup pairs: array-expression minhash signature →
    band-bucket join → candidate-driven exact-Jaccard verify ≥ threshold.
    Returns (id_a, id_b, jaccard).

    Scale shape: the only shuffles are the band self-join (rows = docs ×
    n_bands) and the verify joins (rows = candidates × shingles) — the
    signature computation itself is shuffle-free. The input is repartitioned
    to full parallelism first: a small parquet scan yields few partitions,
    and shingling+hashing (the dominant CPU) must fan out across all cores
    (measured 29s → single-digit s at sf0.1 on local[32]); the exploded
    shingle frame is shared by the signature and verify stages."""
    from ..caching import bounded_persist

    par = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(par, F.col(id_col))
    sh = bounded_persist(exploded_shingles(df, id_col, text_col, k),
                         tag="minhash_shingles")
    # persist the banded frame too: candidate_pairs_from_bands self-joins
    # it, and without the cache each join side recomputes the whole
    # shingle→signature lineage (visible as two identical 16-min
    # hash-aggregates in the physical plan)
    banded = bounded_persist(
        _band_explode(minhash_wide(sh, n_hashes), n_hashes, band_size),
        tag="minhash_banded")
    cand = candidate_pairs_from_bands(banded)
    return (jaccard_for_pairs(sh, cand)
            .filter(F.col("jaccard") >= threshold))


# ---------------------------------------------------------------------------
# n-gram Jaccard (inverted-index join, no LSH)
# ---------------------------------------------------------------------------


def _inverted_index_inter(df: DataFrame, id_col: str, text_col: str, *,
                          k: int, max_df: int | None,
                          tag: str) -> tuple:
    """Shared candidate-generation core of the inverted-index pair
    operators (ngram_jaccard_pairs, containment_pairs): per-doc distinct
    shingles with the hot-shingle ``max_df`` guard, per-doc set sizes,
    and pairwise intersection counts from the shingle self-join.
    Returns (sizes, inter). One implementation on purpose — a fix to
    the guard or the join semantics must reach both measures.

    The raw shingle frame is persisted (``tag``-scoped, bounded): the
    hot-filter aggregate, the left_anti probe, the sizes aggregate and
    BOTH self-join sides all read it — without the cache each consumer
    replays the full text-scan+shingle lineage (the same wall
    minhash_lsh_dedup's persist comment documents)."""
    from ..caching import bounded_persist

    par = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(par, F.col(id_col))
    sh = bounded_persist(exploded_shingles(df, id_col, text_col, k),
                         tag=tag)
    if max_df is not None:
        hot = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
               .filter(F.col("df") > max_df).select("shingle"))
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    inter = (sh.withColumnRenamed("id", "id_a")
             .join(sh.withColumnRenamed("id", "id_b"), "shingle")
             .filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count("*").alias("n_inter")))
    return sizes, inter


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str, *,
                        k: int = 3, threshold: float = 0.5,
                        max_df: int | None = 1000) -> DataFrame:
    """All-pairs Jaccard ≥ threshold via shared-shingle inverted index.

    ``max_df`` drops boilerplate shingles present in more than max_df docs
    before the self-join — the standard guard that keeps the join linear-ish
    at corpus scale."""
    sizes, inter = _inverted_index_inter(df, id_col, text_col, k=k,
                                         max_df=max_df,
                                         tag="ngram_shingles")
    return (inter
            .join(sizes.withColumnRenamed("id", "id_a")
                  .withColumnRenamed("n_sh", "n_a"), "id_a")
            .join(sizes.withColumnRenamed("id", "id_b")
                  .withColumnRenamed("n_sh", "n_b"), "id_b")
            .select("id_a", "id_b",
                    (F.col("n_inter") /
                     (F.col("n_a") + F.col("n_b") - F.col("n_inter")))
                    .alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def containment_pairs(df: DataFrame, id_col: str, text_col: str, *,
                      k: int = 3, threshold_bp: int = 8000,
                      max_df: int | None = 1000) -> DataFrame:
    """ASYMMETRIC near-dup detection: pairs where the smaller document's
    shingle set is mostly CONTAINED in the larger one's.

    Jaccard-based dedup (ngram_jaccard_pairs, MinHash-LSH) misses the
    dominant web-duplication mode: syndication. A wire article republished
    inside a much larger page (nav, comments, related-stories boilerplate)
    has containment ≈ 1 but Jaccard = |A|/|B| — arbitrarily low as the
    host page grows, so a symmetric threshold never fires. Broder's
    original resemblance paper defines both measures for exactly this
    reason; containment is what catches quote-inclusion and
    article-in-portal duplication in an LLM corpus.

    containment(A→B) = |S(A) ∩ S(B)| / |S(A)| with |S(A)| ≤ |S(B)|
    (the smaller set into the larger). Reported in integer basis points
    (floor(10000·inter/min)) so the decision is bit-deterministic and
    DuckDB-oracle-checkable; jaccard_bp rides along for contrast.

    Scale shape — identical to ngram_jaccard_pairs, with which it
    SHARES the candidate-generation core (_inverted_index_inter, one
    implementation of the guard + join semantics for both measures):
    per-doc distinct shingles (array_distinct before explode, no
    global distinct shuffle), hot-shingle ``max_df`` cap so boilerplate
    shingles can't go quadratic in the inverted-index self-join, and
    candidate generation strictly via shared shingles (a pair with zero
    intersection never materializes). Only (id, shingle-hash) pairs
    shuffle; text never leaves the scan stage."""
    sizes, inter = _inverted_index_inter(df, id_col, text_col, k=k,
                                         max_df=max_df,
                                         tag="containment_shingles")
    n_min = F.least(F.col("n_a"), F.col("n_b"))
    cont_bp = F.floor(10000 * F.col("n_inter") / n_min).cast("long")
    jac_bp = F.floor(
        10000 * F.col("n_inter")
        / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).cast("long")
    return (inter
            .join(sizes.withColumnRenamed("id", "id_a")
                  .withColumnRenamed("n_sh", "n_a"), "id_a")
            .join(sizes.withColumnRenamed("id", "id_b")
                  .withColumnRenamed("n_sh", "n_b"), "id_b")
            .select("id_a", "id_b", F.col("n_inter").cast("long"),
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    cont_bp.alias("containment_bp"),
                    jac_bp.alias("jaccard_bp"),
                    # which side is contained: the smaller shingle set
                    F.when(F.col("n_a") <= F.col("n_b"),
                           F.col("id_a")).otherwise(F.col("id_b"))
                    .alias("contained_id"))
            .filter(F.col("containment_bp") >= threshold_bp))


# ---------------------------------------------------------------------------
# SimHash (md5-derived — engine-portable integer math; 32-bit kernel-parity
# signature for dedup_simhash, 64-bit signature for near-pair banding)
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def simhash_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash): 32-bit SimHash over whitespace tokens with md5-derived
    per-token hashes — kernel.simhash32 parity, entirely JVM expressions.

    Token hash hv = int(md5(token)[:8], 16) via conv(); bit b of the
    signature is the sign of sum over tokens of (2*((hv>>b)&1) - 1)."""
    toks = (df.select(F.col(id_col).alias("id"),
                      F.explode(tokens(F.col(text_col))).alias("tok"))
            .filter(F.col("tok") != ""))
    hashed = toks.select(
        "id",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10)
        .cast("long").alias("hv"))
    bits = hashed.select(
        "id", "hv",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("b"))
    # floor(hv / 2^b) % 2 — pow is exact in double for b ≤ 31, hv < 2^32
    bitval = F.floor(F.col("hv") / F.pow(F.lit(2.0), F.col("b"))).cast("long") % 2
    contrib = bits.select("id", "b", (bitval * 2 - 1).alias("c"))
    return (contrib.groupBy("id", "b").agg(F.sum("c").alias("s"))
            .withColumn("bit", (F.col("s") > 0).cast("long"))
            .groupBy("id")
            .agg(F.sum((F.col("bit") * F.pow(F.lit(2.0), F.col("b"))).cast("long"))
                 .alias("simhash")))


def simhash64_df(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash): 64-bit SimHash over whitespace tokens, entirely JVM
    expressions. md5-derived token hashes (two 32-bit halves of the first
    16 hex chars) rather than xxhash64 so the DuckDB oracle can reproduce
    the exact signature; in production xxhash64(tok) drops in with the
    same plan shape and one less hash call.

    The signed signature is assembled from unsigned 32-bit halves as
    (hi - [hi ≥ 2^31]·2^32)·2^32 + lo — exact bigint math in [−2^63, 2^63),
    no unsigned-64 intermediate anywhere."""
    toks = (df.select(F.col(id_col).alias("id"),
                      F.explode(tokens(F.col(text_col))).alias("tok"))
            .filter(F.col("tok") != ""))
    hashed = toks.select(
        "id",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10)
        .cast("long").alias("hi"),
        F.conv(F.substring(F.md5(F.col("tok")), 9, 8), 16, 10)
        .cast("long").alias("lo"))
    bits = hashed.select(
        "id", "hi", "lo",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("b"))
    half = F.when(F.col("b") < 32, F.col("lo")).otherwise(F.col("hi"))
    shift = F.when(F.col("b") < 32, F.col("b")).otherwise(F.col("b") - 32)
    # floor(half / 2^shift) % 2 — exact in double for 32-bit halves
    bitval = F.floor(half / F.pow(F.lit(2.0), shift)).cast("long") % 2
    contrib = bits.select("id", "b", (bitval * 2 - 1).alias("c"))
    votes = (contrib.groupBy("id", "b").agg(F.sum("c").alias("s"))
             .withColumn("bit", (F.col("s") > 0).cast("long")))
    lo_sig = F.sum(F.when(
        F.col("b") < 32,
        (F.col("bit") * F.pow(F.lit(2.0), F.col("b"))).cast("long"))
        .otherwise(F.lit(0)))
    hi_sig = F.sum(F.when(
        F.col("b") >= 32,
        (F.col("bit") * F.pow(F.lit(2.0), F.col("b") - 32)).cast("long"))
        .otherwise(F.lit(0)))
    halves = votes.groupBy("id").agg(lo_sig.alias("lo_sig"),
                                     hi_sig.alias("hi_sig"))
    signed = ((F.col("hi_sig")
               - F.when(F.col("hi_sig") >= 2 ** 31, F.lit(2 ** 32))
               .otherwise(F.lit(0))) * F.lit(2 ** 32) + F.col("lo_sig"))
    return halves.select("id", signed.alias("simhash"))


def simhash_near_pairs(sim: DataFrame, *, max_hamming: int = 3,
                       n_bands: int = 4) -> DataFrame:
    """Candidate pairs by band bucketing over 64-bit signatures, verified
    by exact Hamming distance (popcount via bit_count on XOR). The
    signature is tiled into ``n_bands`` contiguous bands of 64/n_bands
    bits each.

    Pigeonhole: hamming ≤ max_hamming ⟹ the pair agrees on ≥
    n_bands − max_hamming full bands, so the candidate set is lossless
    iff n_bands ≥ max_hamming + 1 — asserted below, because a silent
    violation would DROP true near-dup pairs, not just slow down.

    SCALE CEILING (choose n_bands accordingly): each band has
    2^(64/n_bands) buckets, so expected candidates grow ~ n_bands ·
    n² / 2^(64/n_bands). The default 4×16-bit geometry (65 536 buckets
    per band) is comfortable to ~10^7 docs; beyond that either tighten
    to max_hamming=1 with n_bands=2 (32-bit bands, 4·10^9 buckets) or —
    the intended 10^9-doc path in this engine — use MinHash-LSH
    (:func:`minhash_lsh_dedup` / :func:`minhash_lsh_probe_index`) as
    the primary tier and SimHash only to re-verify its candidates.

    shiftright is arithmetic, but the mask makes each band the exact
    two's-complement bit field regardless of sign."""
    if 64 % n_bands != 0:
        raise ValueError(f"n_bands={n_bands} must divide 64")
    if n_bands < max_hamming + 1:
        raise ValueError(
            f"pigeonhole violated: n_bands={n_bands} < max_hamming+1="
            f"{max_hamming + 1} would silently drop true near-dup pairs")
    band_bits = 64 // n_bands
    mask = (1 << band_bits) - 1
    bands = F.array(*[
        F.shiftright(F.col("simhash"), band_bits * i)
        .bitwiseAND(F.lit(mask))
        for i in range(n_bands)])
    banded = sim.select(
        "id", "simhash", F.posexplode(bands).alias("band", "band_val"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (a.join(b, ["band", "band_val"])
            .filter(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"),
                    F.col("a.simhash").alias("sh_a"),
                    F.col("b.id").alias("id_b"),
                    F.col("b.simhash").alias("sh_b"))
            .distinct())
    return (cand
            .withColumn("hamming",
                        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------------
# Connected components over near-dup pairs → dedup clusters
# ---------------------------------------------------------------------------


def cc_propagation_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One connected-components round: neighbor-min then path halving.

    Input: symmetric ``edges`` (src, dst) and ``labels`` (id, comp).
    Output: (id, comp, ncomp) — old and new label, so the caller can both
    count convergence and continue, off one materialization. This is the
    plan that repeats O(log diameter) times inside connected_components;
    it contains the round's complete shuffle budget: one edges⋈labels
    equi-join + partial/final min aggregate, one label lookup join, one
    label self-join (path halving). No other exchange."""
    nb_min = (edges
              .join(labels.withColumnRenamed("id", "src")
                    .withColumnRenamed("comp", "nb_comp"), "src")
              .groupBy(F.col("dst").alias("id"))
              .agg(F.min("nb_comp").alias("nb_min")))
    stepped = (labels.join(nb_min, "id", "left")
               .select("id", "comp",
                       F.least(F.col("comp"),
                               F.coalesce("nb_min", F.col("comp")))
                       .alias("ncomp")))
    # path halving: ncomp := ncomp(ncomp). Labels are node ids, so every
    # ncomp value has a row in `stepped`; the left join is total,
    # coalesce is defensive only.
    hop = stepped.select(F.col("id").alias("ncomp"),
                         F.col("ncomp").alias("gcomp"))
    return (stepped.join(hop, "ncomp", "left")
            .select("id", "comp", F.coalesce("gcomp", "ncomp").alias("ncomp")))


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", *,
                         max_iter: int = 15) -> DataFrame:
    """(id, component_id) for every node appearing in ``pairs``:
    component_id = the minimum node id of its connected component.

    LSH/SimHash emit near-dup *pairs*; a dedup pipeline needs *clusters*
    (pick one canonical doc per group, drop the rest). Pair relations are
    not transitive, so grouping is a graph connected-components problem —
    the generalization of the reference's per-URL skip-if-seen dedup
    (/root/reference/scripts/news.py:17-34) to content near-dup groups.

    Algorithm: iterative min-label propagation with pointer jumping.
    Each round does (1) neighbor-min: every node takes the min label over
    itself and its neighbors (one equi-join + map-side-combinable min
    aggregate); (2) path halving: comp := comp(comp) (a self-join on the
    label table), which short-circuits label chains so convergence is
    O(log diameter) rounds rather than O(diameter) — the standard
    large-graph CC shape (cf. Kiveris et al., "Connected Components in
    MapReduce and Beyond", two-phase star contraction; path halving gives
    the same logarithmic round bound with simpler invariants).

    Scale shape: per round, one shuffle join (edges ⋈ labels, keyed on
    node id — co-partitioned after the first round), one partial+final
    min aggregate, and one label self-join. Lineage is truncated per
    round via localCheckpoint (on a real cluster, set a reliable
    checkpoint dir and use ``.checkpoint()`` — localCheckpoint trades
    executor-loss resilience for speed, the right default on local[n]).
    State per round is |V| labels + |E| edges — never materializes a
    component's member list on one executor.

    Raises RuntimeError if not converged after ``max_iter`` rounds
    (max_iter=15 covers diameters up to ~2^15 via path halving).
    """
    src, dst = F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    # localCheckpoint (not just persist): ``pairs`` often arrives with a
    # deep lineage (LSH probe trees reference their shingle frames several
    # times via self-joins, so the analyzed plan grows combinatorially),
    # and every propagation round re-ANALYZES the edges subtree inside its
    # joins. persist() caches the data but not the plan tree — measured
    # 25 s/round of pure driver-side Catalyst analysis on an LSH-derived
    # pairs frame vs 0.1 s of compute. Truncating to an RDD scan makes
    # per-round planning O(1) in upstream plan depth.
    edges = (pairs.select(src, dst)
             .unionByName(pairs.select(F.col(id_b).alias("src"),
                                       F.col(id_a).alias("dst")))
             .distinct()
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .select("id", F.col("id").alias("comp")))
    for _ in range(max_iter):
        nxt = cc_propagation_round(edges, labels) \
            .localCheckpoint(eager=True)
        changed = nxt.filter(F.col("comp") != F.col("ncomp")).count()
        labels = nxt.select("id", F.col("ncomp").alias("comp"))
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: no convergence in {max_iter} rounds")
    return labels.select("id", F.col("comp").alias("component_id"))


def dedup_clusters(pairs: DataFrame, id_a: str = "id_a",
                   id_b: str = "id_b", *, max_iter: int = 15) -> DataFrame:
    """(id, component_id, is_canonical): connected components plus the
    keep/drop decision — the min-id member of each cluster is canonical;
    a pipeline keeps canonicals (plus all unpaired docs) and drops the
    rest."""
    comp = connected_components(pairs, id_a, id_b, max_iter=max_iter)
    return comp.select(
        "id", "component_id",
        (F.col("id") == F.col("component_id")).alias("is_canonical"))


def keep_best(docs: DataFrame, clusters: DataFrame, *, id_col: str = "id",
              quality_col: str = "quality") -> DataFrame:
    """Quality-aware keep/drop over dedup clusters.

    ``docs``: (id, quality) for EVERY document; ``clusters``: (id,
    component_id) for the paired subset (connected_components output).
    Unpaired docs form singleton components of themselves. Per component
    the highest-quality member is kept (ties → smallest id) — the
    content-dedup version of the reference's "skip if output exists"
    keep/drop decision (/root/reference/scripts/news.py:17-34), upgraded
    from first-seen-wins to best-wins as web pipelines do.

    Scale shape: one left join on id, then ONE max_by aggregate on
    component_id (partial map-side, no window exchange — the same
    argmax-not-window rule applied to IVF assignment), then a join of the
    per-component best back to members. Never materializes member lists.
    The argmax key is ``struct(quality, -id)`` — struct comparison is
    lexicographic fieldwise, so (quality desc, id asc) is exact over the
    FULL bigint domain (no scale factor to overflow at 10^10-doc id
    spaces), and struct-keyed max_by still combines map-side.
    """
    members = (docs.select(F.col(id_col).alias("id"),
                           F.col(quality_col).cast("long").alias("quality"))
               .join(clusters.select("id", "component_id"), "id", "left")
               .withColumn("component_id",
                           F.coalesce("component_id", F.col("id"))))
    best = (members
            .groupBy("component_id")
            .agg(F.max_by(
                "id", F.struct(F.col("quality").alias("q"),
                               (-F.col("id")).alias("neg_id")))
                .alias("best_id")))
    return (members.join(best, "component_id")
            .select("id", "component_id", "quality",
                    (F.col("id") == F.col("best_id")).alias("kept")))


def dedup_paragraphs(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", *,
                     chunk_words: int = 8) -> DataFrame:
    """CCNet-style cross-document paragraph dedup: each paragraph is kept
    only at its FIRST occurrence (smallest (doc_id, position)); documents
    are reassembled from their surviving paragraphs.

    The corpus here is single-line text, so "paragraphs" are fixed
    ``chunk_words``-word chunks — the unit is a parameter of the method,
    not of this plan. Returns (id, n_chunks, n_kept, text_dedup); docs
    whose every chunk already appeared elsewhere (exact duplicates) keep
    zero chunks and drop out entirely, which IS the dedup decision.

    Scale shape (100 TB): two shuffles total. groupBy(md5(chunk)) with
    min(struct(id, pos, chunk)) carries the winning chunk INSIDE the
    aggregation state, so there is no join-back of the exploded frame and
    the map-side partial combine collapses duplicates before they ship —
    under heavy duplication the shuffle moves ~unique-chunk rows, not
    corpus rows. Reassembly is one groupBy(id) with a sorted collect of
    the (pos, chunk) structs; per-doc chunk counts are bounded by doc
    length so the collect_list state is bounded. No window over the full
    exploded frame, no Python.
    """
    norm = F.trim(F.regexp_replace(F.col(text_col), " +", " "))
    words = F.split(norm, " ")
    n_chunks = F.ceil(F.size(words) / F.lit(chunk_words))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(
            " ", F.slice(words, i * chunk_words + 1, chunk_words)))
    exploded = (df.select(F.col(id_col).alias("id"),
                          n_chunks.alias("n_chunks"),
                          F.posexplode(chunks).alias("pos", "chunk")))
    firsts = (exploded
              .groupBy(F.md5("chunk").alias("h"))
              .agg(F.min(F.struct("id", "pos", "n_chunks", "chunk"))
                   .alias("f")))
    kept = firsts.select(F.col("f.id").alias("id"), F.col("f.pos").alias("pos"),
                         F.col("f.n_chunks").alias("n_chunks"),
                         F.col("f.chunk").alias("chunk"))
    return (kept.groupBy("id")
            .agg(F.max("n_chunks").alias("n_chunks"),
                 F.count("*").alias("n_kept"),
                 F.concat_ws(" ", F.transform(
                     F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                     lambda s: s["chunk"])).alias("text_dedup")))


# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap vs a held-out probe set)
# ---------------------------------------------------------------------------


def contamination_check(corpus: DataFrame, probes: DataFrame, *,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 8) -> DataFrame:
    """Training-data decontamination: flag corpus documents sharing any
    k-token shingle with a held-out probe/eval set, with the hit count.

    Standard LLM-pipeline step (eval-benchmark n-gram decontamination,
    typically k≈8-13): any document that contains a verbatim k-gram of an
    eval document must be dropped before training.

    Returns (id, n_hits): n_hits = number of DISTINCT shingles of the
    document that occur anywhere in the probe set; only contaminated
    documents (n_hits ≥ 1) are returned.

    Scale shape: eval benchmarks are small (MBs) next to a 100-TB corpus,
    so the probe shingle-hash set is broadcast — the corpus side never
    shuffles its shingles; the explode is narrow over the scan and only
    HIT rows (a tiny fraction) reach the groupBy(id) count, whose partial
    aggregation collapses them map-side. Join keys are 8-byte xxhash64
    of the shingle, not the string (collision odds negligible; same
    trade documented at jaccard_for_pairs).
    """
    c = (exploded_shingles(corpus, id_col, text_col, k)
         .select("id", F.xxhash64("shingle").alias("h")))
    p = (exploded_shingles(probes, id_col, text_col, k)
         .select(F.xxhash64("shingle").alias("h")).distinct())
    return (c.join(F.broadcast(p), "h")
            .groupBy("id").agg(F.count(F.lit(1)).alias("n_hits")))


# ---------------------------------------------------------------------------
# Incremental dedup: new crawl batch vs an existing corpus index
# ---------------------------------------------------------------------------


def minhash_lsh_dedup_incremental(index: DataFrame, new: DataFrame, *,
                                  id_col: str = "doc_id",
                                  text_col: str = "text", k: int = 3,
                                  n_hashes: int = 16, band_size: int = 4,
                                  threshold: float = 0.7) -> DataFrame:
    """Near-dup pairs between a NEW crawl batch and the existing corpus
    index — the recurring-crawl shape of MinHash-LSH dedup: each round
    only asks "is anything in this batch a near-dup of what we already
    keep?", never re-deduping the whole corpus.

    Id spaces must be disjoint (index ids never collide with new ids).
    Returns (id_a = index doc, id_b = new doc, jaccard) with
    jaccard >= threshold.

    Scale shape: candidates come from an index×new BAND join — new-batch
    bands probe the index bands, so candidate count scales with the batch,
    not the corpus; there is no corpus self-join anywhere. This raw-text
    convenience wrapper computes the index band frame in-plan; the
    production path is ``minhash_lsh_probe_index`` with a PERSISTED band
    table (exactly ``banded_signatures`` output — per-doc, append-only),
    where each round computes signatures for the new batch only and the
    100-TB index text is touched only for the few candidate docs.
    """
    bands_i = banded_signatures(index, id_col, text_col, k=k,
                                n_hashes=n_hashes, band_size=band_size)
    return minhash_lsh_probe_index(
        bands_i, index, new, id_col=id_col, text_col=text_col, k=k,
        n_hashes=n_hashes, band_size=band_size, threshold=threshold)


def minhash_lsh_probe_index(index_bands: DataFrame, index_docs: DataFrame,
                            new: DataFrame, *, id_col: str = "doc_id",
                            text_col: str = "text", k: int = 3,
                            n_hashes: int = 16, band_size: int = 4,
                            threshold: float = 0.7) -> DataFrame:
    """Production incremental near-dup: probe a PERSISTED signature index
    with a new crawl batch.

    ``index_bands`` is a previously-built (and in production, stored)
    ``banded_signatures`` frame over the corpus — (id, band, band_key),
    per-doc and append-only, so each crawl round appends the new batch's
    bands after dedup and never recomputes the corpus side.
    ``index_docs`` is the corpus (id, text) table, consulted ONLY for docs
    that appear in some candidate pair (a left_semi prefilter inside the
    verify stage — point-ish lookups that scale with candidates, not with
    the corpus). ``new`` is the raw new batch.

    Scale shape per round: shingle+minhash the BATCH only; one band join
    batch-bands × index-bands (broadcast the batch side at typical batch
    ≪ index sizes is Catalyst/AQE's call — both sides are (band,
    band_key)-keyed); candidate-driven exact-Jaccard verify re-shingles
    only candidate index docs. The full index text is scanned zero times.
    """
    from ..caching import bounded_persist

    par = new.sparkSession.sparkContext.defaultParallelism
    new = new.repartition(par, F.col(id_col))
    # batch shingles feed BOTH the signature and the verify stage; the
    # candidate-pair frame is consumed three times downstream (index-doc
    # semi-join + the two jaccard_for_pairs joins) — persist both so the
    # band probe runs once, not per consumer
    sh_n = bounded_persist(exploded_shingles(new, id_col, text_col, k),
                           tag="lsh_probe_shingles")
    b_n = _band_explode(minhash_wide(sh_n, n_hashes), n_hashes, band_size)
    # localCheckpoint, not persist: the candidate frame is re-entered by
    # the verify stage (index semi-join + both jaccard joins), so with a
    # plain persist its deep band-probe lineage is re-ANALYZED inside
    # every consumer and the downstream analyzed tree grows ~quadratically
    # (measured ~30 s of driver-side Catalyst time on a 58-pair result).
    # The frame is candidate-sized — truncating it to an RDD scan is
    # cheap and makes all consumers plan in O(1) of the probe tree.
    # id_a != id_b: the contract says index/new id spaces are disjoint,
    # but if a caller violates it (replaying an odd store state), a
    # self-pair's Jaccard denominator is exactly zero — under ANSI that
    # aborts the whole job instead of flagging one pair. Self-pairs are
    # meaningless either way, so drop them structurally.
    pairs = (index_bands.alias("a").join(b_n.alias("b"),
                                         ["band", "band_key"])
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"))
             .filter(F.col("id_a") != F.col("id_b"))
             .distinct()
             .localCheckpoint(eager=True))
    cand_index = index_docs.join(
        pairs.select(F.col("id_a").alias(id_col)).distinct(),
        id_col, "left_semi")
    sh_i = exploded_shingles(cand_index, id_col, text_col, k)
    # the verify-stage shingle frame is consumed three times inside
    # jaccard_for_pairs (sizes + both sides of the intersection join);
    # without the cache the candidate semi-join + re-shingling lineage
    # re-runs per consumer. It is candidate-sized, so caching it is cheap.
    sh_all = bounded_persist(sh_i.unionByName(sh_n),
                             tag="lsh_probe_verify_shingles")
    return (jaccard_for_pairs(sh_all, pairs)
            .filter(F.col("jaccard") >= threshold))


def append_to_signature_index(index_bands: DataFrame,
                              new_bands: DataFrame,
                              kept_new_ids: DataFrame,
                              id_col: str = "id") -> DataFrame:
    """Per-round index maintenance closing the incremental loop: probe
    (minhash_lsh_probe_index) → drop near-dups → APPEND the kept batch's
    bands. Docs dropped as near-dups never enter the index, so it stays
    one row set per canonical doc; the union is append-only (no index
    rewrite, no corpus re-shingle) — in production this is an INSERT INTO
    the stored signature table, O(batch) per crawl round."""
    kept = new_bands.join(kept_new_ids.select(id_col), id_col, "left_semi")
    return index_bands.unionByName(kept)


# ---------------------------------------------------------------------------
# Exact-substring dedup (duplicated k-token spans)
# ---------------------------------------------------------------------------


def token_windows(df: DataFrame, id_col: str, text_col: str,
                  k: int) -> DataFrame:
    """(id, pos, h): xxhash64 of every k-token window at stride 1.

    Docs with fewer than k tokens emit nothing — they cannot contain a
    duplicated k-token substring, so the length filter prunes them at the
    scan. The sequence→slice→hash chain is pure JVM whole-stage codegen;
    the explode is narrow (no exchange before it)."""
    if k < 1:
        raise ValueError(f"window length k must be >= 1, got {k}")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    wins = F.transform(
        F.sequence(F.lit(1), n - k + 1),
        lambda i: F.struct(
            i.alias("pos"),
            F.xxhash64(F.concat_ws(" ", F.slice(toks, i, k))).alias("h")))
    return (df.filter(n >= k)
            .select(F.col(id_col).alias("id"), F.explode(wins).alias("w"))
            .select("id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h")))


def substring_dup_spans(df: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 20,
                        min_count: int = 2,
                        reuse_windows: bool = False) -> DataFrame:
    """Exact-substring duplication report: per document, the maximal spans
    of tokens covered by some k-token window that occurs >= min_count
    times ANYWHERE in the corpus (intra-doc repeats included).

    This is the Spark-native equivalent of suffix-array exact-substring
    dedup (the published recipe removes any ~50-token substring appearing
    twice in the training corpus): a single-node suffix array cannot shard,
    so the distributed formulation fingerprints every k-token window with a
    64-bit hash and counts occurrences globally. Reference analog: the
    engine's content-dedup family generalizing the URL-seen skip logic
    (/root/reference/scripts/news.py:17-34).

    Returns only contaminated docs: (id, n_tokens, dup_tokens, n_spans,
    dup_frac) where dup_tokens sums merged span lengths (windows at
    positions p1 < p2 merge iff p2 - p1 <= k, i.e. overlap or abut).

    Scale shape (100 TB): the window frame is ~one row per corpus token;
    its groupBy(h) count combines map-side so shuffle #1 carries only
    distinct-hash partials, and only hashes with count >= min_count
    survive the HAVING. Shuffle #2 re-keys the window frame by h for the
    hit join (AQE broadcasts the dup-hash side when the duplicate rate is
    low, and its skew-join handles hot boilerplate windows — which CANNOT
    be max_df-capped here, because hot windows are precisely the dups
    being measured). Only hit rows (typically a few % of windows) reach
    the per-doc span-merge window, partitioned by doc id.

    reuse_windows=True localCheckpoints the window frame so the count
    branch and the hit branch share ONE materialization instead of
    re-building every window string per branch — measured 1.6× at 300k
    docs / 12M windows (BENCH_CORPUS_OPS.json); on a real cluster,
    persist the fingerprint frame to storage instead (localCheckpoint is
    executor-local and dies with the executor). A count-over-
    partitionBy(h) window would be faster still here (one shuffle, no
    recompute) but is rejected as the default: WindowExec cannot
    skew-split, so ONE hot boilerplate k-gram serializes a whole
    partition onto a single task, while agg+join gets AQE skew-join
    handling."""
    if min_count < 2:
        raise ValueError("min_count < 2 would flag every window as "
                         f"duplicated, got {min_count}")
    w = token_windows(df, id_col, text_col, k)
    if reuse_windows:
        w = w.localCheckpoint(eager=False)
    dup_h = (w.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
             .filter(F.col("c") >= min_count).select("h"))
    hits = w.join(dup_h, "h").select("id", "pos")
    by_pos = Window.partitionBy("id").orderBy("pos")
    flagged = hits.withColumn(
        "new_span",
        F.when(F.col("pos") - F.lag("pos", 1).over(by_pos) <= k,
               F.lit(0)).otherwise(F.lit(1)))
    spans = flagged.withColumn("span", F.sum("new_span").over(by_pos))
    per_span = (spans.groupBy("id", "span")
                .agg((F.max("pos") - F.min("pos") + k).alias("span_tokens")))
    per_doc = (per_span.groupBy("id")
               .agg(F.sum("span_tokens").alias("dup_tokens"),
                    F.count(F.lit(1)).alias("n_spans")))
    ntok = df.select(F.col(id_col).alias("id"),
                     F.size(tokens(F.col(text_col))).alias("n_tokens"))
    return (per_doc.join(ntok, "id")
            .select("id",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("dup_tokens").cast("long").alias("dup_tokens"),
                    F.col("n_spans").cast("long").alias("n_spans"),
                    F.round(F.col("dup_tokens") / F.col("n_tokens"), 4)
                    .alias("dup_frac")))


def host_mirror_pairs(docs: DataFrame, *, host_col: str = "host",
                      text_col: str = "text",
                      max_hosts_per_digest: int = 16,
                      mirror_bp: int = 8000) -> DataFrame:
    """Cross-host mirror detection: pairs of hosts whose content sets
    overlap almost entirely — the mirror farms / scraper re-hosts that
    same-host dup-rate rollups (host_reputation) cannot see, because
    each individual host looks internally clean. Reference analog: the
    URL-seen skip logic (/root/reference/scripts/news.py:17-34)
    generalized from "same url twice" to "same content under two
    hostnames".

    Per unordered host pair sharing >= 1 eligible digest: shared distinct
    digests, each side's total distinct digests, overlap_bp = 10000 *
    shared // min(totals) (containment of the smaller host — a full
    mirror scores 10000 even when the canonical host is far larger), and
    is_mirror = overlap_bp >= mirror_bp.

    Scale shape (100 TB): text collapses to md5 map-side, so shuffle #1
    carries only distinct (digest, host) pairs. The pair generation is
    candidate-driven, NOT all-pairs-of-hosts: only digests on 2..
    ``max_hosts_per_digest`` hosts enter the digest-keyed self-join, so
    per-digest fanout is bounded by C(max_hosts, 2) — the cap is what
    keeps boilerplate (empty pages, parked-domain templates, cookie
    walls, which live on MILLIONS of hosts) from exploding the join; a
    digest that ubiquitous carries no mirror signal anyway. Host totals
    are host-cardinality and broadcast into the pair frame. No windows,
    no UDFs — aggregates and one bounded join end-to-end."""
    if max_hosts_per_digest < 2:
        raise ValueError("max_hosts_per_digest must be >= 2, got "
                         f"{max_hosts_per_digest}")
    hd = (docs.select(F.col(host_col).alias("host"),
                      F.md5(F.col(text_col)).alias("digest"))
          .distinct())
    eligible = hd.join(
        hd.groupBy("digest").agg(F.count(F.lit(1)).alias("n_hosts"))
        .filter((F.col("n_hosts") >= 2)
                & (F.col("n_hosts") <= max_hosts_per_digest))
        .select("digest"),
        "digest", "left_semi")
    pairs = (eligible.alias("a")
             .join(eligible.alias("b"), "digest")
             .filter(F.col("a.host") < F.col("b.host"))
             .select(F.col("a.host").alias("host_a"),
                     F.col("b.host").alias("host_b"))
             .groupBy("host_a", "host_b")
             .agg(F.count(F.lit(1)).alias("shared_digests")))
    totals = hd.groupBy("host").agg(F.count(F.lit(1)).alias("n_digests"))
    ta = totals.select(F.col("host").alias("host_a"),
                       F.col("n_digests").alias("digests_a"))
    tb = totals.select(F.col("host").alias("host_b"),
                       F.col("n_digests").alias("digests_b"))
    # integer `div` (not `/` + floor): float division is only exact below
    # 2^53 — same convention as host_reputation's bp rates. least >= 1
    # always (a paired host owns >= 1 digest), so ANSI div cannot abort.
    overlap = F.expr("(10000 * shared_digests) "
                     "div least(digests_a, digests_b)")
    return (pairs.join(F.broadcast(ta), "host_a")
            .join(F.broadcast(tb), "host_b")
            .select("host_a", "host_b",
                    F.col("shared_digests").cast("long"),
                    F.col("digests_a").cast("long"),
                    F.col("digests_b").cast("long"),
                    overlap.cast("long").alias("overlap_bp"),
                    (overlap >= F.lit(mirror_bp)).alias("is_mirror")))
