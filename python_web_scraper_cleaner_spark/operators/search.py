"""Corpus search substrate — DataFrame rebuilds of the reference's
MCP news-archive operations (/root/reference/mcp_server/news_server.py).

Every loop in the reference becomes one declarative plan: the per-file
Python loops (news_server.py:44, :103) are full scans the engine expresses
as filters/aggregations that Catalyst parallelizes and prunes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.kernel import STOP_WORDS


def snippet_col(content: Column, query: str, *, before: int = 50,
                after: int = 150) -> Column:
    """Match snippet (news_server.py:48-53): slice [idx-50, idx+150] around
    the first case-insensitive match, newlines→spaces. NULL when no match.

    1-based SQL indexing: idx1 = locate(); python idx = idx1-1;
    start(1-based) = max(1, idx1-50); length = min(len, idx-1+150) - start + 1.
    """
    idx1 = F.locate(query.lower(), F.lower(content))
    start = F.greatest(idx1 - before, F.lit(1))
    end1 = F.least(F.length(content), idx1 - 1 + after)  # inclusive 1-based
    return F.when(idx1 > 0,
                  F.regexp_replace(
                      F.substring(content, start, end1 - start + 1),
                      "\n", " "))


def search_news(df: DataFrame, query: str, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Case-insensitive substring search + snippet (news_server.py:40-60,
    SURVEY P5/F13). Returns (id, snippet)."""
    return (df
            .filter(F.lower(F.col(text_col)).contains(query.lower()))
            .select(F.col(id_col).alias("id"),
                    snippet_col(F.col(text_col), query).alias("snippet")))


def occurrences(content: Column, term: str) -> Column:
    """Substring occurrence count — the reference's str.count
    (news_server.py:109), as pure JVM expressions."""
    lc = F.lower(content)
    return ((F.length(lc) - F.length(F.replace(lc, F.lit(term.lower()), F.lit(""))))
            / F.lit(len(term))).cast("long")


def meaningful_terms(query: str) -> list[str]:
    """Stopword-aware query tokenization (news_server.py:86-101) — driver-
    side, the query string is a literal."""
    import string as _string
    clean = query.lower().translate(str.maketrans("", "", _string.punctuation))
    terms = [t for t in clean.split() if t not in STOP_WORDS]
    return terms or clean.split()


def score_docs(df: DataFrame, query: str, *, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Per-document term-frequency relevance (news_server.py:103-113,
    SURVEY A5): score = Σ occurrences of each meaningful term."""
    terms = meaningful_terms(query)
    score = None
    for t in terms:
        c = occurrences(F.col(text_col), t)
        score = c if score is None else score + c
    return df.select(F.col(id_col).alias("id"),
                     (score if score is not None else F.lit(0)).alias("score"))


def best_doc(df: DataFrame, query: str, *, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """Argmax doc for a query (news_server.py:103-117, SURVEY A6/J5):
    max score wins, score must be > 0, ties → lowest id (the reference's
    'first file wins' under its sorted scan order)."""
    scored = score_docs(df, query, id_col=id_col, text_col=text_col)
    # orderBy+limit(1), NOT a global row_number window: an empty
    # partition spec funnels every scored row through ONE task, while
    # this shape runs as TakeOrderedAndProject (same argmax+tiebreak)
    return (scored.filter(F.col("score") > 0)
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(1)
            .select("id", "score"))


def latest_k(df: DataFrame, *, k: int = 5, ts_col: str = "ts",
             id_col: str = "event_id",
             summary_col: Column | None = None) -> DataFrame:
    """Latest-k by timestamp desc (news_server.py:62-78, SURVEY O3) with a
    deterministic id tiebreak; Catalyst executes as TakeOrderedAndProject —
    no full sort at scale."""
    out = df.orderBy(F.desc(ts_col), F.desc(id_col)).limit(k)
    if summary_col is not None:
        out = out.withColumn("summary", summary_col)
    return out


def bm25_topk(df: DataFrame, query: str, *, k: int = 20,
              id_col: str = "doc_id", text_col: str = "text",
              scale: int = 1_000_000) -> DataFrame:
    """Corpus-relative relevance top-k — extends score_docs (A5, raw TF;
    news_server.py:103-113) with a BM25-style IDF so common terms stop
    dominating, the step the reference's scorer lacks.

    The IDF is the Robertson–Spärck-Jones form with the log dropped and
    evaluated in BIGINT fixed point::

        idf_fp(t) = (scale * (2N - 2*df_t + 1)) div (2*df_t + 1)
                  = floor(scale * (N - df_t + 0.5) / (df_t + 0.5))
        score(d)  = sum_t tf(t, d) * idf_fp(t)

    Pure integer arithmetic end-to-end: the ranking is bit-deterministic
    and portable across engines (no libm ``ln`` whose last ulp differs
    between JVM and C), which is what lets a plain-SQL oracle match the
    hash exactly. Monotone in the same direction as the log form, so the
    ranking semantics survive.

    Scale shape: one 1-row map-side aggregate over the corpus computes
    (N, df_t...) — partial aggregation ships ONE row per partition; the
    stats row then broadcast-crossJoins onto the scoring scan and top-k
    runs as TakeOrderedAndProject. Two corpus scans, no wide shuffle.
    """
    terms = meaningful_terms(query)
    if not terms:
        # empty / stopword-only / punctuation-only query: nothing can
        # score > 0, so return an empty (id, score) frame with the same
        # schema instead of crashing on an un-built score expression
        return df.select(F.col(id_col).alias("id"),
                         F.lit(0).cast("long").alias("score")).limit(0)
    per_doc = df.select(
        F.col(id_col).alias("id"),
        *[occurrences(F.col(text_col), t).alias(f"tf{i}")
          for i in range(len(terms)) for t in [terms[i]]])
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
          for i in range(len(terms))])
    idf = [F.expr(f"({scale} * (2*n - 2*df{i} + 1)) div (2*df{i} + 1)")
           for i in range(len(terms))]
    score = None
    for i in range(len(terms)):
        part = F.col(f"tf{i}") * idf[i]
        score = part if score is None else score + part
    return (per_doc.crossJoin(F.broadcast(stats))
            .select("id", score.cast("long").alias("score"))
            .filter(F.col("score") > 0)
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(k))


def build_postings(df: DataFrame, *, k: int = 10, n_salts: int = 8,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Inverted-index construction: token → (df, cf, capped posting list)
    — the index the reference's per-query full scans (news_server.py:103-
    113: every search re-reads every file) are a stand-in for; a corpus
    engine builds the index ONCE and serves queries from it.

    Output per token: df (documents containing it), cf (total
    occurrences), postings ("id:tf" pairs for the top-``k`` documents by
    (tf desc, id asc) — the impact-ordered index head, Common-Crawl-scale
    indexes cap posting storage exactly this way).

    Scale shape — SALTED TWO-STAGE TOP-K, the hot-key pattern
    select_round_batch uses for hosts: stopword tokens appear in
    virtually every document, so a naive per-token collect would build
    corpus-sized lists on single reducers. Stage 1 groups by (token,
    id % n_salts) and keeps only the per-salt top-k (sort_array + slice
    over a collect_list bounded by that salt's share of the token's
    docs); stage 2 merges n_salts·k candidates per token — bounded
    regardless of document frequency — and sums the exact df/cf from the
    per-salt partials. Size ``n_salts`` to the corpus: per-salt lists
    hold ≈ df_max/n_salts entries. Everything is built-in JVM exprs:
    struct sort keys (−tf, id) make (tf desc, id asc) a plain ascending
    sort_array in both stages."""
    heads = posting_heads(df, k=k, n_salts=n_salts, id_col=id_col,
                          text_col=text_col)
    return format_posting_heads(heads)


def format_posting_heads(heads: DataFrame) -> DataFrame:
    """Render a heads table (tok, top, df, cf) to the storage/export
    shape: postings = comma-joined 'id:tf' in impact order. Shared by
    build_postings and the merge/retract maintenance ops so the export
    format can't drift between build and maintenance paths."""
    return heads.select(
        "tok", "df", "cf",
        F.array_join(F.transform(
            "top", lambda s: F.concat(s["id"].cast("string"), F.lit(":"),
                                      (-s["ntf"]).cast("string"))),
            ",").alias("postings"))


def posting_heads(df: DataFrame, *, k: int = 10, n_salts: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  tokens_subset: DataFrame | None = None) -> DataFrame:
    """The structured index build_postings formats: token → (df, cf,
    top: array<struct(ntf, id)>) with top the (tf desc, id asc) head of
    the posting list, stored with the negated tf so ascending struct
    sorts in both stages ARE the impact order. A deployment persists
    THIS table and serves queries from it (postings_lookup) — the same
    build-once/probe-per-round shape as the dedup signature index
    (dedup_incremental). See build_postings for the salted-top-k scale
    argument."""
    from .dedup import tokens  # the one whitespace tokenizer all
    # oracle-paired text ops share — a drifting copy here would silently
    # break build_postings/postings_lookup oracle parity

    toks = (df.select(F.col(id_col).alias("id"),
                      F.explode(tokens(F.col(text_col))).alias("tok"))
            .filter(F.col("tok") != ""))
    if tokens_subset is not None:
        # partial rebuild (compact_postings): keep only the named tokens
        # — the broadcast semi-join sits directly above the explode, so
        # unaffected tokens never reach the tf aggregate
        toks = toks.join(F.broadcast(tokens_subset.select("tok")),
                         "tok", "left_semi")
    tf = toks.groupBy("tok", "id").agg(F.count("*").alias("tf"))
    entry = F.struct((-F.col("tf")).alias("ntf"), F.col("id").alias("id"))
    # type-agnostic salt: pmod(xxhash64) keeps the per-salt bound for
    # string doc ids too (arithmetic % on a string id casts to NULL in
    # default mode — every row in ONE salt — and aborts under ANSI)
    part = (tf.withColumn("_salt", F.pmod(F.xxhash64("id"),
                                          F.lit(n_salts)))
            .groupBy("tok", "_salt")
            .agg(F.slice(F.sort_array(F.collect_list(entry)), 1, k)
                 .alias("top"),
                 F.count("*").alias("pdf"), F.sum("tf").alias("pcf")))
    return (part.groupBy("tok")
            .agg(F.slice(F.sort_array(F.flatten(F.collect_list("top"))),
                         1, k).alias("top"),
                 F.sum("pdf").cast("long").alias("df"),
                 F.sum("pcf").cast("long").alias("cf")))


def merge_posting_heads(old: DataFrame, delta: DataFrame, *,
                        k: int = 10) -> DataFrame:
    """Merge a DELTA index (the heads built from one crawl round's NEW
    docs) into the stored heads table — the serve-path analog of the
    dedup signature index's append_to_signature_index: each round
    indexes only its own batch and folds it in, never re-tokenizing the
    corpus (the reference rescans every file per query,
    news_server.py:103-113; a deployment must not rescan per ROUND
    either).

    EXACT, not approximate, under the deployment's own invariants:
    (1) the round batch is dedup'd against the corpus first (engine
    order: probe signature index → drop dups → index the kept docs), so
    no doc id appears in both inputs and df/cf partial sums are exact;
    (2) ``k`` ≤ both builds' k, so any doc in the true top-k of the
    merged corpus is in its own corpus's stored head (its tf is what it
    is; fewer competitors in the part than in the whole) — the merged
    slice can't miss it. The registry entry proves this literally:
    merge(build(A), build(B)) hash-equals build(A ∪ B).

    Scale shape: ONE map-side-combined aggregate on tok over the two
    heads tables (index-sized, not corpus-sized); per-token state is
    bounded by 2k structs. The sort keys (−tf, id) are stored negated,
    so ascending sort_array IS impact order — same trick as the build."""
    cols = ["tok", "top", "df", "cf"]
    u = old.select(*cols).unionByName(delta.select(*cols))
    return (u.groupBy("tok")
            .agg(F.slice(F.sort_array(F.flatten(F.collect_list("top"))),
                         1, k).alias("top"),
                 F.sum("df").cast("long").alias("df"),
                 F.sum("cf").cast("long").alias("cf")))


def retract_from_postings(heads: DataFrame, removed: DataFrame, *,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Takedown/compliance retraction: remove a batch of documents from
    the stored index WITHOUT rebuilding it — robots revocation, DMCA,
    right-to-be-forgotten all land here, and at 10^10 docs "rebuild the
    index" is not a same-day answer.

    ``removed`` carries the doc TEXT (the corpus table still has it at
    retraction time), so the per-token df/cf corrections are EXACT: the
    batch is re-tokenized (batch-sized work, not corpus-sized) and its
    (df, cf) contributions subtracted. Head arrays drop the removed ids
    in place. Capped-head tombstone semantics, stated plainly: a doc
    OUTSIDE a token's stored top-k cannot be backfilled in — heads
    shrink under retraction until the next compaction rebuild, exactly
    how impact-ordered indexes handle deletes in production. df/cf stay
    exact throughout; only head depth decays.

    Contract: ``removed`` must be a subset of the docs the index was
    built over (the engine guarantees this — retraction reads the doc
    from the corpus table it is deleting). Retracting a never-indexed
    doc would subtract phantom df/cf.

    Scale shape: the removed batch aggregates to a per-token correction
    table (rdf, rcf, rem_ids) that BROADCASTS into a left join against
    the heads table; untouched tokens pass through the join null-side
    with their head unchanged; the in-place strip is a codegen
    higher-order F.filter. Tokens whose df hits zero drop out."""
    from .dedup import tokens  # shared tokenizer — see posting_heads

    rtf = (removed.select(F.col(id_col).alias("id"),
                          F.explode(tokens(F.col(text_col))).alias("tok"))
           .filter(F.col("tok") != "")
           .groupBy("tok", "id").agg(F.count("*").alias("tf")))
    corr = (rtf.groupBy("tok")
            .agg(F.count("*").cast("long").alias("rdf"),
                 F.sum("tf").cast("long").alias("rcf"),
                 F.collect_list("id").alias("rem_ids")))
    stripped = F.filter(
        "top", lambda s: ~F.array_contains(F.col("rem_ids"), s["id"]))
    return (heads.join(F.broadcast(corr), "tok", "left")
            .select("tok",
                    F.when(F.col("rem_ids").isNotNull(), stripped)
                    .otherwise(F.col("top")).alias("top"),
                    (F.col("df") - F.coalesce("rdf", F.lit(0)))
                    .cast("long").alias("df"),
                    (F.col("cf") - F.coalesce("rcf", F.lit(0)))
                    .cast("long").alias("cf"))
            .filter(F.col("df") > 0))


def compact_postings(heads: DataFrame, corpus: DataFrame, *,
                     k: int = 10, n_salts: int = 8,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Compaction after retraction — the third leg of the index
    maintenance cycle (build → merge deltas → retract → COMPACT):
    restore heads that retraction has shrunk below their full depth by
    re-scanning the corpus for ONLY those tokens.

    Which heads need it is decidable from the index alone: a stripped
    head of size s always holds exactly the top-s surviving docs (every
    survivor outside the original head had tf below every head member),
    so a head is stale iff size(top) < min(k, df) — it has fewer entries
    than the surviving corpus could fill. Those tokens' heads are
    rebuilt exactly; every other head is ALREADY the true top-k of the
    surviving corpus. Hence the exactness identity the registry entry
    proves literally: compact(retract(build(C), R), C∖R) hash-equals
    build(C∖R).

    Scale shape: the affected-token set (takedown-driven, small)
    broadcasts into a semi-join directly above the corpus tokenizer
    explode — unaffected tokens never reach the tf aggregate, so the
    rebuild costs scale with the affected tokens' posting mass, not the
    corpus; untouched heads pass through via one broadcast anti-join."""
    affected = (heads.filter(F.size("top") < F.least(F.lit(k), F.col("df")))
                .select("tok"))
    rebuilt = posting_heads(corpus, k=k, n_salts=n_salts, id_col=id_col,
                            text_col=text_col, tokens_subset=affected)
    keep = heads.join(F.broadcast(affected), "tok", "left_anti")
    return keep.select("tok", "top", "df", "cf").unionByName(
        rebuilt.select("tok", "top", "df", "cf"))


def postings_lookup_bm25(heads: DataFrame, terms: list[str],
                         corpus_stats: DataFrame, *, k: int = 10,
                         scale: int = 1_000_000) -> DataFrame:
    """Index-served BM25: the ranked-retrieval twin of postings_lookup —
    candidates still come from the stored impact-ordered heads (no
    corpus scan at query time), but they are scored with the SAME
    fixed-point RSJ IDF as bm25_topk, using the df the index already
    carries::

        idf_fp(t) = (scale * (2N - 2*df_t + 1)) div (2*df_t + 1)
        score(d)  = sum_t head_tf(t, d) * idf_fp(t)

    This is how a deployment actually serves relevance queries: the
    corpus-scanning bm25_topk is the offline/exact tier, this is the
    online tier whose cost is |terms|·k_head rows regardless of corpus
    size. ``corpus_stats`` is a 1-row frame with column ``n`` (corpus
    doc count — index metadata a deployment stores at build/merge time);
    keeping it a frame keeps the whole query lazy and lets Spark
    broadcast it, no driver-side scalar plumbing.

    Same documented head-approximation as postings_lookup: a doc's
    score misses contributions from terms whose stored head excludes
    it, and a doc outside every queried head can't surface. Integer
    arithmetic end-to-end — bit-deterministic, plain-SQL-oracle-able."""
    hits = (heads.filter(F.col("tok").isin([t.lower() for t in terms]))
            .select("tok", "df", F.explode("top").alias("p"))
            .select("df", F.col("p.id").alias("id"),
                    (-F.col("p.ntf")).alias("tf"))
            .crossJoin(F.broadcast(corpus_stats)))
    idf = F.expr(f"({scale} * (2*n - 2*df + 1)) div (2*df + 1)")
    return (hits.select("id", (F.col("tf") * idf).alias("w"))
            .groupBy("id").agg(F.sum("w").cast("long").alias("score"))
            .orderBy(F.desc("score"), "id")
            .limit(k))


def postings_lookup(heads: DataFrame, terms: list[str], *,
                    k: int = 10) -> DataFrame:
    """Serve a conjunctive-ish query FROM the built index (no corpus
    scan): filter the heads table to the query terms (an IN filter the
    scan pushes down — at 10^10 docs the heads table is sorted/
    bucketed by tok so this is an index seek, the cdx_stored_lookup
    argument), explode only those terms' capped heads, and rank docs by
    (matched terms desc, summed tf desc, id asc), top ``k``.

    Impact-ordered-index semantics: candidates come from the stored
    top-``k_head`` head of each term's posting list, exactly how
    early-termination engines bound per-query work — a doc outside
    every queried head can't surface (documented approximation; the
    exact variant is bm25_topk's corpus scan). Scale shape: the head
    explode is |terms|·k_head rows, the rollup is a map-side-combined
    aggregate on doc id, and the final top-k is TakeOrderedAndProject."""
    hits = (heads.filter(F.col("tok").isin([t.lower() for t in terms]))
            .select("tok", F.explode("top").alias("p"))
            .select("tok", F.col("p.id").alias("id"),
                    (-F.col("p.ntf")).alias("tf")))
    return (hits.groupBy("id")
            .agg(F.count("*").cast("long").alias("matched"),
                 F.sum("tf").cast("long").alias("score"))
            .orderBy(F.desc("matched"), F.desc("score"), "id")
            .limit(k))
