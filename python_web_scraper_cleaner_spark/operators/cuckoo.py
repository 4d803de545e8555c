"""Partitioned cuckoo filter for URL-seen membership — the deletable
alternative to the bloom tier (north_star: "partitioned bloom/cuckoo
filter"; PAPERS.md: cuckoo filters support deletion and beat bloom on
space below ~3% FPR).

Same engine contract as operators/bloom.py: per-bucket filters built by
``mapInPandas`` over ``xxhash64(canonical_url)`` keys, probe is a
vectorized numpy pass, and the filter is strictly a PRE-filter — the exact
``left_anti`` join confirms survivors, so false positives never drop a
never-seen URL and the end result equals the plain anti-join
(plans/queries.py `j1_cuckoo_prefilter` proves it against the exact SQL).

Filter layout (standard 2-choice cuckoo, 4 slots/bucket, 16-bit
fingerprints): fingerprint f(h) = 1 + (h >> 40) & 0xFFFE (never 0 — 0
marks an empty slot); i1 = h mod m; i2 = i1 XOR (f * 0x5bd1e995 mod m).
The XOR trick makes i2(i1, f) an involution, so probe and delete need
only (f, i1). Inserts are batch-vectorized with a bounded eviction loop
for the collision tail; an insert that still fails marks the build
over-full (caller sizes slots ≥ n/0.95 — 95% max load is the standard
cuckoo ceiling).

Deletion — the capability bloom lacks — removes one copy of a
fingerprint, enabling url_seen revocation (re-crawl after TTL) without a
rebuild.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

CUCKOO_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType(), nullable=False),
    # geometry stamp (bloom-parity): probes/revokes derive the bucket
    # count from the FILTER, never from a caller parameter — a mismatch
    # would look keys up in buckets that never saw them (silent false
    # negatives ⇒ seen URLs re-crawled as new)
    T.StructField("n_buckets", T.IntegerType(), nullable=False),
    T.StructField("m_buckets", T.LongType(), nullable=False),
    T.StructField("n_items", T.LongType(), nullable=False),
    T.StructField("n_failed", T.LongType(), nullable=False),
    T.StructField("table", T.BinaryType(), nullable=False),
])

SLOTS = 4
_FP_MIX = np.uint64(0x5BD1E995)
MAX_KICKS = 500


def _fingerprint(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the high hash bits (0 marks an empty
    slot, so hash-value 0 maps to 1 — full ~16 bits of entropy, not a
    parity mask that would halve the space and double FPR)."""
    f = ((h.astype(np.uint64) >> np.uint64(40)) & np.uint64(0xFFFF))
    f = np.where(f == 0, np.uint64(1), f)
    return f.astype(np.uint16)


_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _i1(h: np.ndarray, m: int) -> np.ndarray:
    """First-choice row from a full-avalanche (splitmix64-finalizer) mix of
    the hash. A bare ``h mod m`` reuses the same low bits that chose the
    partition bucket (pmod(h, n_buckets); both powers of two), confining
    every key in a bucket to m/n_buckets rows — measured 10.4% insert
    failures at the nominal 0.76 load vs 0 for uncorrelated keys. The
    xor-shift steps fold high bits into the low ones, decorrelating the
    row choice from any modulus-derived partitioning upstream."""
    z = h.astype(np.uint64).copy()
    z ^= z >> np.uint64(30)
    z *= _MIX1
    z ^= z >> np.uint64(27)
    z *= _MIX2
    z ^= z >> np.uint64(31)
    return (z % np.uint64(m)).astype(np.int64)


def _alt(i: np.ndarray, f: np.ndarray, m: int) -> np.ndarray:
    """Partner bucket: i XOR (f * MIX mod m). ``m`` MUST be a power of two
    so the XOR stays in range and the map is an involution — without that,
    an evicted item can land in a bucket probe never checks, i.e. a FALSE
    NEGATIVE, which would break the equals-exact-anti-join contract."""
    step = ((f.astype(np.uint64) * _FP_MIX) % np.uint64(m)).astype(np.int64)
    return np.bitwise_xor(i, step)


def _insert_all(table: np.ndarray, h: np.ndarray, m: int,
                rng_seed: int) -> int:
    """Insert all hashes; returns number that could not be placed.
    Vectorized two-choice placement; eviction loop only for the tail."""
    f = _fingerprint(h)
    i1 = _i1(h, m)
    failed = 0
    # bounded deterministic RNG for eviction slot choice (Python int with
    # explicit 64-bit mask — numpy uint64 wrap emits RuntimeWarnings)
    rng_state = (rng_seed * 2654435761 + 12345) & 0xFFFFFFFFFFFFFFFF

    def try_place(fv: int, iv: int) -> bool:
        row = table[iv]
        for s in range(SLOTS):
            if row[s] == 0:
                row[s] = fv
                return True
        return False

    for k in range(len(h)):
        fv, iv = int(f[k]), int(i1[k])
        # NOTE: duplicate fingerprints are stored as extra copies, NOT
        # deduplicated — delete_from_table removes one copy per call, so
        # two distinct keys sharing (fingerprint, bucket-pair) must hold
        # two slots or deleting one would false-negative the other.
        if try_place(fv, iv):
            continue
        iv2 = int(_alt(np.array([iv]), np.array([fv], dtype=np.uint16), m)[0])
        if try_place(fv, iv2):
            continue
        # eviction loop
        cur_f, cur_i = fv, iv
        placed = False
        for _ in range(MAX_KICKS):
            rng_state = ((rng_state * 6364136223846793005
                          + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF)
            slot = (rng_state >> 60) % SLOTS
            cur_f, table[cur_i][slot] = int(table[cur_i][slot]), cur_f
            cur_i = int(_alt(np.array([cur_i]),
                             np.array([cur_f], dtype=np.uint16), m)[0])
            if try_place(cur_f, cur_i):
                placed = True
                break
        if not placed:
            failed += 1
    return failed


def build_cuckoo(df: DataFrame, hash_col: str = "url_hash", *,
                 n_buckets: int = 64,
                 expected_per_bucket: int = 100_000,
                 load_factor: float = 0.84) -> DataFrame:
    """Build per-partition cuckoo tables: repartition by bucket → one
    mapInPandas pass. ``m_buckets`` is sized so expected load stays under
    ``load_factor`` (standard cuckoo fill ceiling ~0.95 with 4 slots)."""
    # round UP to a power of two — the XOR partner map requires it (_alt)
    need = max(8, int(expected_per_bucket / (SLOTS * load_factor)))
    m = 1 << (need - 1).bit_length()

    bucketed = (df.select(hash_col)
                .withColumn("bucket",
                            F.pmod(F.col(hash_col), F.lit(n_buckets))
                            .cast("int"))
                .repartition(n_buckets, "bucket"))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # accumulate each bucket's hashes, then insert in SORTED order:
        # cuckoo layout is insertion-order-dependent, and shuffle arrival
        # order is not stable across task retries/recomputes — sorting
        # makes the built table a pure function of the key multiset, so a
        # recomputed partition (cache eviction, executor loss) is
        # byte-identical to the one any earlier gate inspected. Memory is
        # one int64 per key — the same order as the table itself.
        pend: dict[int, list] = {}
        for pdf in batches:
            for bucket, grp in pdf.groupby("bucket"):
                pend.setdefault(int(bucket), []).append(
                    grp[hash_col].to_numpy(dtype=np.int64))
        if not pend:
            return
        tables: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        fails: dict[int, int] = {}
        for bucket in sorted(pend):
            h = np.sort(np.concatenate(pend[bucket]))
            t = np.zeros((m, SLOTS), dtype=np.uint16)
            tables[bucket] = t
            fails[bucket] = _insert_all(t, h, m, rng_seed=bucket)
            counts[bucket] = len(h)
        yield pd.DataFrame({
            "bucket": np.fromiter(tables, dtype=np.int32,
                                  count=len(tables)),
            "n_buckets": np.full(len(tables), n_buckets, dtype=np.int32),
            "m_buckets": np.full(len(tables), m, dtype=np.int64),
            "n_items": np.fromiter((counts[b] for b in tables),
                                   dtype=np.int64, count=len(tables)),
            "n_failed": np.fromiter((fails[b] for b in tables),
                                    dtype=np.int64, count=len(tables)),
            "table": [t.tobytes() for t in tables.values()],
        })

    return bucketed.mapInPandas(build, schema=CUCKOO_SCHEMA)


def _probe_table(t: np.ndarray, h: np.ndarray, m: int) -> np.ndarray:
    """Vectorized membership: fingerprint present in bucket i1 or i2."""
    f = _fingerprint(h)
    i1 = _i1(h, m)
    i2 = _alt(i1, f, m)
    f16 = f[:, None]
    return ((t[i1] == f16).any(axis=1)) | ((t[i2] == f16).any(axis=1))


def cuckoo_geometry(cuckoo: DataFrame) -> int | None:
    """The n_buckets stamped on a CUCKOO_SCHEMA table (None for an empty
    or pre-stamp table) — the authoritative bucketing geometry for
    probes/revokes; bloom_geometry's cuckoo sibling."""
    if "n_buckets" not in cuckoo.columns:
        return None
    row = cuckoo.select("n_buckets").first()
    return None if row is None else int(row["n_buckets"])


def cuckoo_probe(candidates: DataFrame, cuckoo: DataFrame,
                 hash_col: str = "url_hash", *,
                 n_buckets: int = 64,
                 broadcast_bytes: int = 64 << 20) -> DataFrame:
    """Tag candidates with ``maybe_seen`` (mirror of bloom_probe).

    Size-gated join like bloom_probe: broadcast while total table bytes fit
    ``broadcast_bytes``, else bucket-co-partitioned shuffle join (at the
    10^10-URL point per-bucket tables are ~512 MB × 64 buckets — tens of GB,
    unbroadcastable)."""
    if cuckoo.storageLevel == StorageLevel.NONE:
        # the size-gate aggregate below materializes the build; pin it so
        # the join doesn't pay (and possibly recompute) the expensive
        # mapInPandas construction a second time
        from ..caching import bounded_persist
        cuckoo = bounded_persist(cuckoo, tag="cuckoo_filter_probe")
    geo = cuckoo_geometry(cuckoo)
    if geo is not None:
        n_buckets = geo
    cand = candidates.withColumn(
        "bucket", F.pmod(F.col(hash_col), F.lit(n_buckets)).cast("int"))
    total_bytes = cuckoo.agg(
        F.sum(F.octet_length("table"))).first()[0] or 0
    if total_bytes <= broadcast_bytes:
        joined = cand.join(F.broadcast(cuckoo), "bucket", "left")
    else:
        joined = (cand.repartition(n_buckets, "bucket")
                  .join(cuckoo.repartition(n_buckets, "bucket"),
                        "bucket", "left"))
    out_schema = T.StructType(cand.schema.fields
                              + [T.StructField("maybe_seen", T.BooleanType(),
                                               nullable=False)])
    cand_cols = [f.name for f in cand.schema.fields]

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.reset_index(drop=True)
            maybe = np.zeros(len(pdf), dtype=bool)
            with_t = pdf[pdf["table"].notna()]
            for bucket, grp in with_t.groupby("bucket"):
                m = int(grp["m_buckets"].iloc[0])
                t = np.frombuffer(grp["table"].iloc[0],
                                  dtype=np.uint16).reshape(m, SLOTS)
                h = grp[hash_col].to_numpy(dtype=np.int64)
                maybe[grp.index.to_numpy()] = _probe_table(t, h, m)
            out = pdf[cand_cols].copy()
            out["maybe_seen"] = maybe
            yield out

    return joined.mapInPandas(probe, schema=out_schema)


def cuckoo_dedup(candidates: DataFrame, seen: DataFrame, cuckoo: DataFrame,
                 hash_col: str = "url_hash", *,
                 n_buckets: int = 64) -> DataFrame:
    """J1 pipeline over the cuckoo tier: prefilter + exact anti-join
    confirm (result equals the plain anti-join, like bloom_dedup).

    Safety gate: unlike bloom, a cuckoo INSERT can fail when the table is
    over-full — a failed insert is a stored-but-absent item, i.e. a false
    negative that would leak a seen URL through as "definitely new". If
    any bucket reports n_failed > 0 the prefilter is unsound, so fall back
    to the plain exact anti-join for the whole batch (correct, just
    without the prefilter saving).

    Correctness does not depend on caching: build_cuckoo inserts each
    bucket's keys in sorted order, so the table is a pure function of the
    key multiset and any recompute (cache eviction, executor loss)
    reproduces byte-identically what the gate inspected. The persist here
    is purely an optimization — the gate aggregate (executor-side, no
    driver collect: at the 10^10-URL design point the tables are tens of
    GB) and the probe join share one materialization."""
    from ..caching import bounded_persist

    cuckoo = bounded_persist(cuckoo, tag="cuckoo_filter")
    n_failed = cuckoo.agg(F.sum("n_failed")).first()[0] or 0
    if n_failed > 0:
        return candidates.join(seen.select(hash_col), hash_col, "left_anti")
    # persist: two filters read the probed frame — without the cache the
    # bucket join + vectorized table probe would execute twice
    probed = bounded_persist(
        cuckoo_probe(candidates, cuckoo, hash_col, n_buckets=n_buckets),
        tag="cuckoo_probed")
    definitely_new = probed.filter(~F.col("maybe_seen")).drop(
        "maybe_seen", "bucket")
    suspects = probed.filter(F.col("maybe_seen")).drop("maybe_seen", "bucket")
    confirmed = suspects.join(seen.select(hash_col), hash_col, "left_anti")
    return definitely_new.unionByName(confirmed)


def cuckoo_revoke(cuckoo: DataFrame, revoked: DataFrame,
                  hash_col: str = "url_hash", *,
                  n_buckets: int = 64) -> DataFrame:
    """Distributed deletion — url_seen revocation (re-crawl after TTL),
    the capability bloom lacks. Each bucket's filter row cogroups with
    that bucket's revoked keys and delete_from_table removes ONE stored
    copy per key (duplicate fingerprints are stored as extra copies at
    insert time, so deleting one key never false-negatives another
    *inserted duplicate*; the textbook caveat stands that deleting keys
    never inserted, or 16-bit fingerprint+bucket-pair collisions, can
    remove another key's copy — callers keep the exact url_seen table as
    ground truth and use the filter strictly as a prefilter)."""
    geo = cuckoo_geometry(cuckoo)
    if geo is not None:
        n_buckets = geo      # stamped geometry wins (see cuckoo_probe)
    rev = (revoked.select(F.col(hash_col).alias("_h"))
           .withColumn("bucket",
                       F.pmod(F.col("_h"), F.lit(n_buckets)).cast("int")))

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return left
        out = left.copy()
        m = int(out["m_buckets"].iloc[0])
        t = np.frombuffer(out["table"].iloc[0],
                          dtype=np.uint16).reshape(m, SLOTS).copy()
        removed = delete_from_table(
            t, right["_h"].to_numpy(dtype=np.int64), m)
        out.loc[out.index[0], "table"] = t.tobytes()
        out.loc[out.index[0], "n_items"] = \
            int(out["n_items"].iloc[0]) - removed
        return out

    return (cuckoo.groupBy("bucket").cogroup(rev.groupBy("bucket"))
            .applyInPandas(fn, schema=CUCKOO_SCHEMA))


def delete_from_table(t: np.ndarray, h: np.ndarray, m: int) -> int:
    """Remove one stored copy of each hash's fingerprint (the op bloom
    cannot do — url_seen revocation for re-crawl). Returns #removed."""
    f = _fingerprint(h)
    i1 = _i1(h, m)
    i2 = _alt(i1, f, m)
    removed = 0
    for k in range(len(h)):
        for iv in (int(i1[k]), int(i2[k])):
            row = t[iv]
            hit = np.nonzero(row == f[k])[0]
            if len(hit):
                row[hit[0]] = 0
                removed += 1
                break
    return removed
