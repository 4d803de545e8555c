"""Frontier operators: distributed priority queue + polite per-host
scheduling + hot-host salting.

Reference analog: the sequential ``new_urls`` list and sorted-file queue
(/root/reference/scripts/news.py:34-48, scraper_cleaner/html_cleaner_core
.py:222-229) — one URL at a time, one process. The engine's frontier is a
table keyed (host, priority, warc_ts, url); each round selects a per-host
budget with a window function (SURVEY O4), respecting robots disallow
rules broadcast to executors (J3) and splitting hot hosts across salted
sub-groups so a single mega-domain cannot skew one task (north_star:
"host-key salting and AQE-aware repartitioning handle hot-domain skew").

Determinism: all selection order derives from explicit sort keys, never
arrival order (SURVEY §7 risk 2) — the same frontier state always yields
the same round batch, which is what makes kill/resume reproduce the
reference's crawl ordering.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FRONTIER_ORDER = ("priority", "warc_ts", "canonical_url")


ROBOTS_RULES_SCHEMA = ("disallow_prefixes array<string>, "
                       "allow_prefixes array<string>, crawl_delay_ms long")


def parse_robots_table(robots_txt: DataFrame, *, host_col: str = "host",
                       txt_col: str = "robots_txt",
                       user_agent: str = "*") -> DataFrame:
    """(host, robots_txt) → (host, disallow_prefixes, allow_prefixes,
    crawl_delay_ms) via the kernel's RFC-9309-subset parser in a scalar
    pandas UDF. The output is per-host tiny → broadcast to executors
    (north_rule: "robots.txt rules broadcast to executors")."""
    from pyspark.sql.functions import pandas_udf

    from ..functions.kernel import parse_robots_txt

    @pandas_udf(ROBOTS_RULES_SCHEMA)
    def parse_udf(txt: pd.Series) -> pd.DataFrame:
        rules = [parse_robots_txt(t, user_agent) for t in txt]
        return pd.DataFrame({
            "disallow_prefixes": [r["disallow_prefixes"] for r in rules],
            "allow_prefixes": [r["allow_prefixes"] for r in rules],
            "crawl_delay_ms": [r["crawl_delay_ms"] for r in rules],
        })

    return (robots_txt
            .withColumn("_rules", parse_udf(F.col(txt_col)))
            .select(F.col(host_col).alias("host"), "_rules.*"))


def apply_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Filter URLs by RFC 9309 longest-match allow/disallow: the longest
    matching prefix wins, ties go to Allow, hosts without rules pass.
    robots(host, crawl_delay_ms, disallow_prefixes, [allow_prefixes]) is
    per-host tiny → broadcast (reference analog: invariant hoisting,
    api/main.py:47-48); the match itself is JVM array expressions (codegen,
    no UDF on the 10^10-row side)."""
    path = F.regexp_extract(F.col("canonical_url"),
                            r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)$", 1)
    if "allow_prefixes" not in robots.columns:
        robots = robots.withColumn("allow_prefixes",
                                   F.array().cast("array<string>"))
    j = frontier.join(F.broadcast(robots), "host", "left")

    # conservative reduction of RFC 9309 metacharacter rules for the
    # prefix matcher (kernel._prefix_form twin): a literal '/private*'
    # never startswith-matches, so the rule would silently not apply —
    # disallow rules truncate at the first '*' ('$' stripped):
    # over-blocks, never under-blocks; allow rules with metacharacters
    # drop. Exact wildcard semantics: apply_robots_wildcard.
    def _dis_form(p):
        return F.substring_index(
            F.regexp_replace(p, r"\$$", ""), "*", 1)

    def longest_match(col):
        return F.coalesce(
            F.array_max(F.transform(
                F.filter(F.coalesce(col, F.array()),
                         lambda p: F.startswith(path, p)),
                F.length)),
            F.lit(-1))

    allow_pats = F.filter(
        F.coalesce(F.col("allow_prefixes"), F.array()),
        lambda p: ~p.contains("*") & ~p.endswith("$"))
    dis_pats = F.transform(
        F.coalesce(F.col("disallow_prefixes"), F.array()), _dis_form)
    allowed = longest_match(allow_pats) >= longest_match(dis_pats)
    return (j.withColumn("crawl_delay_ms",
                         F.coalesce(F.col("crawl_delay_ms"), F.lit(0)))
            .filter(allowed)
            .drop("disallow_prefixes", "allow_prefixes"))


def robots_pattern_regex_col(pattern):
    """JVM-expression twin of kernel.robots_pattern_regex: RFC 9309 path
    pattern → anchored regex, built with regexp_replace/concat so the
    translation runs inside codegen on the tiny robots side (no UDF).
    Escapes every regex metacharacter except ``*`` (which becomes ``.*``)
    and honours a trailing ``$`` as an end anchor."""
    anchored = F.endswith(pattern, F.lit("$"))
    body = F.when(anchored,
                  pattern.substr(F.lit(1), F.length(pattern) - 1)) \
            .otherwise(pattern)
    escaped = F.regexp_replace(
        body, r"([.^$+?()\[\]{}|\\])", r"\\$1")
    return F.concat(F.lit("^"),
                    F.replace(escaped, F.lit("*"), F.lit(".*")),
                    F.when(anchored, F.lit("$")).otherwise(F.lit("")))


def apply_robots_wildcard(frontier: DataFrame, robots: DataFrame,
                          *, keep_decision: bool = False) -> DataFrame:
    """Full RFC 9309 §2.2.3 matching: patterns may contain ``*`` (any run)
    and a trailing ``$`` (end anchor); the matching rule with the most
    octets wins, equal-length ties go to Allow, no match → allowed
    (§2.2.2).  Superset of apply_robots, which handles the prefix-only
    subset with pure startswith.

    Scale shape: robots(host, allow_patterns, disallow_patterns) is
    per-host tiny → pattern→regex translation happens ONCE there (JVM
    expressions, robots_pattern_regex_col) and the result broadcasts; the
    10^10-row frontier evaluates regexp_like per (url, rule) inside
    codegen — no Python anywhere.  regexp_like with a column pattern
    recompiles per row; real deployments with >~100 rules/host should
    pre-compile by pivoting hot rules into literal columns, noted in
    PLANS_AUDIT.  Reference analog: the reference never checks robots at
    all (scripts/news.py fetches unconditionally); this is the productionized
    J3 surface (SURVEY §2.4).

    ``keep_decision=True`` keeps ``robots_allowed`` and ``decisive_len``
    (octet length of the winning rule, -1 = no rule matched) instead of
    filtering — the audit shape.

    Accepts either (allow_patterns, disallow_patterns) columns or the
    parse_robots_table names (allow_prefixes, disallow_prefixes) — a
    plain prefix IS a valid RFC pattern, so the engine can switch matcher
    without reparsing.  A ``crawl_delay_ms`` column, when present, is
    carried through (null → 0) exactly like apply_robots.
    """
    robots = (robots
              .withColumnRenamed("allow_prefixes", "allow_patterns")
              .withColumnRenamed("disallow_prefixes", "disallow_patterns"))
    for c in ("allow_patterns", "disallow_patterns"):
        if c not in robots.columns:   # e.g. ROBOTS_SCHEMA has no allows
            robots = robots.withColumn(c, F.array().cast("array<string>"))
    path = F.regexp_extract(F.col("canonical_url"),
                            r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)$", 1)
    to_rules = lambda col: F.transform(
        F.coalesce(col, F.array().cast("array<string>")),
        lambda p: F.struct(p.alias("pattern"),
                           robots_pattern_regex_col(p).alias("rx")))
    has_delay = "crawl_delay_ms" in robots.columns
    robots = robots.select(
        "host",
        *(["crawl_delay_ms"] if has_delay else []),
        to_rules(F.col("allow_patterns")).alias("_allow_rules"),
        to_rules(F.col("disallow_patterns")).alias("_dis_rules"))
    j = frontier.join(F.broadcast(robots), "host", "left")
    if has_delay:
        j = j.withColumn("crawl_delay_ms",
                         F.coalesce(F.col("crawl_delay_ms"), F.lit(0)))

    def best(col):
        return F.coalesce(
            F.array_max(F.transform(
                F.filter(F.coalesce(col, F.array().cast(
                    "array<struct<pattern:string,rx:string>>")),
                    lambda s: F.regexp_like(path, s["rx"])),
                lambda s: F.length(s["pattern"]))),
            F.lit(-1))

    ba, bd = best(F.col("_allow_rules")), best(F.col("_dis_rules"))
    out = (j.withColumn("robots_allowed", ba >= bd)
           .withColumn("decisive_len",
                       F.greatest(ba, bd).cast("long"))
           .drop("_allow_rules", "_dis_rules"))
    if keep_decision:
        return out
    return (out.filter(F.col("robots_allowed"))
            .drop("robots_allowed", "decisive_len"))


def order_exprs(order_cols=None) -> list:
    """The frontier ordering as sort expressions. ``order_cols=None``
    yields the static FRONTIER_ORDER (ascending); callers composing a
    dynamic priority (PageRank, revisit due-ness — plans/crawl.py
    priority_mode='pagerank') pass explicit Column expressions. Every
    window in the selection path MUST use the same list, or fetch_slot
    and the budget cap would rank by different keys."""
    if order_cols is None:
        return [F.asc(c) for c in FRONTIER_ORDER]
    return list(order_cols)


def select_round_batch(frontier: DataFrame, *, per_host_budget: int,
                       hot_host_threshold: int | None = None,
                       n_salts: int = 8,
                       round_ms: int | None = None,
                       order_cols=None) -> DataFrame:
    """Pick this round's fetch batch: deterministic top-k per host.

    Plain path: one window per host. Hot-host path: hosts whose pending
    count exceeds ``hot_host_threshold`` are salted into ``n_salts``
    sub-groups keyed (host, salt) — the window shuffle then spreads a
    mega-host over n_salts reducers instead of one (skew kill). Budget is
    split evenly across salts (ceil), preserving the per-host total.

    ``round_ms`` makes the budget DELAY-AWARE: a host whose robots
    crawl-delay is d ms can politely absorb at most round_ms/d fetches in
    a round of that length, so its effective budget is
    min(per_host_budget, max(1, round_ms div d)). Hosts with no/zero
    delay keep the flat budget. Default None = flat budgets (back-compat
    and the deterministic-fixture path).

    The output carries ``fetch_slot`` (the deterministic per-host rank) so
    politeness_schedule can reuse it instead of running a second window.
    """
    if round_ms is None:
        budget = F.lit(per_host_budget)
    else:
        delay = F.greatest(F.coalesce(F.col("crawl_delay_ms"),
                                      F.lit(0)).cast("long"), F.lit(1))
        # float div + cast is exact here: round_ms is a job parameter far
        # below 2^53, and truncation-toward-zero is the wanted floor
        budget = F.least(
            F.lit(per_host_budget).cast("long"),
            F.greatest(F.lit(1).cast("long"),
                       (F.lit(round_ms).cast("long") / delay)
                       .cast("long")))
    order = order_exprs(order_cols)
    if hot_host_threshold is None:
        w = Window.partitionBy("host").orderBy(*order)
        return (frontier.withColumn("fetch_slot", F.row_number().over(w))
                .filter(F.col("fetch_slot") <= budget))

    counts = frontier.groupBy("host").agg(F.count("*").alias("_pending"))
    hot = counts.filter(F.col("_pending") > hot_host_threshold) \
                .select("host", "_pending")
    salted = (frontier
              .join(F.broadcast(hot), "host", "left")
              .withColumn("_salt",
                          F.when(F.col("_pending").isNotNull(),
                                 F.pmod(F.xxhash64("canonical_url"),
                                        F.lit(n_salts)))
                          .otherwise(F.lit(0))))
    per_salt = F.when(F.col("_pending").isNotNull(),
                      F.ceil(budget / n_salts)) \
                .otherwise(budget)
    w = Window.partitionBy("host", "_salt").orderBy(*order)
    survivors = (salted.withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") <= per_salt)
                 .drop("rn", "_salt", "_pending"))
    # per-salt ceil() overshoots for hot hosts (n_salts·ceil(B/S) ≥ B, e.g.
    # B=5, 8 salts → 8 selected): a second per-host window over the salted
    # survivors caps the batch at exactly B. Cheap by construction — its
    # input is already ≤ B + n_salts rows per host, so the single-reducer-
    # per-host skew the salting avoided cannot reappear here. Its rank IS
    # the final per-host fetch order, exported as fetch_slot.
    w2 = Window.partitionBy("host").orderBy(*order)
    return (survivors.withColumn("fetch_slot", F.row_number().over(w2))
            .filter(F.col("fetch_slot") <= budget))


def politeness_schedule(batch: DataFrame, *,
                        trust_existing_slot: bool = False,
                        order_cols=None) -> DataFrame:
    """Assign each selected URL its in-round fetch slot and simulated start
    offset: slot = rank within host (deterministic FRONTIER_ORDER),
    offset_ms = (slot-1) * crawl_delay_ms. The fetch stage executes one
    host per task group (groupBy(host).applyInPandas) so pacing is honored
    within the task; offsets make the schedule auditable and deterministic.

    Batches straight from select_round_batch already carry ``fetch_slot``
    (its budget-cap rank uses the same partition + ordering); pass
    ``trust_existing_slot=True`` to skip the second window shuffle on
    that path. The default RECOMPUTES: a batch that was filtered or
    unioned after selection carries stale/duplicate slots, and trusting
    them would silently violate per-host pacing.
    """
    if not (trust_existing_slot and "fetch_slot" in batch.columns):
        if "fetch_slot" in batch.columns:
            batch = batch.drop("fetch_slot")
        w = Window.partitionBy("host").orderBy(*order_exprs(order_cols))
        batch = batch.withColumn("fetch_slot", F.row_number().over(w))
    return batch.withColumn(
        "scheduled_offset_ms",
        ((F.col("fetch_slot") - 1)
         * F.coalesce(F.col("crawl_delay_ms"), F.lit(0))).cast("long"))


def revisit_schedule(history: DataFrame, *, page_col: str = "page_id",
                     ts_col: str = "ts", id_col: str = "fetch_id",
                     changed_col: str = "changed", base_hours: int = 1,
                     cap: int = 10, max_hours: int = 720) -> DataFrame:
    """Freshness-aware recrawl priority: per page, exponential backoff on
    consecutive unchanged fetches (cf. Cho & Garcia-Molina, "Effective
    Page Refresh Policies for Web Crawlers" — the multiplicative
    adjust-on-no-change family).

    Input: one row per historical fetch with a ``changed`` boolean
    (content hash differed from the previous fetch). Output per page:
      n_fetches, n_changes,
      unchanged_tail   — fetches since the last observed change
                         (= n_fetches if the page never changed),
      next_interval_hours = min(max_hours,
                                base_hours * 2^min(unchanged_tail, cap)).
    A page that changed on its latest fetch goes back to ``base_hours``;
    a dead-still page backs off geometrically to the ``max_hours`` clamp.

    Scale shape: ONE hash exchange total. The row_number window and the
    per-page aggregate use the same partitioning key, so Catalyst reuses
    the window's shuffle for the groupBy (no second exchange); integer
    backoff math is a JVM expression (2^k exact in double for k ≤ cap ≤
    52). Ordering ties on ``ts`` break by ``id_col`` so replays are
    bit-deterministic.
    """
    w = Window.partitionBy(page_col).orderBy(F.desc(ts_col), F.desc(id_col))
    ranked = history.withColumn("_rn_from_latest", F.row_number().over(w))
    agg = (ranked.groupBy(F.col(page_col).alias("page_id"))
           .agg(F.count("*").alias("n_fetches"),
                F.sum(F.col(changed_col).cast("long")).alias("n_changes"),
                F.coalesce(
                    F.min(F.when(F.col(changed_col),
                                 F.col("_rn_from_latest"))) - 1,
                    F.count("*")).alias("unchanged_tail")))
    backoff = F.lit(base_hours) * F.pow(
        F.lit(2.0), F.least(F.col("unchanged_tail"),
                            F.lit(cap))).cast("long")
    return agg.withColumn(
        "next_interval_hours",
        F.least(F.lit(max_hours).cast("long"), backoff))


def psl_lookup_cols(host, rules, *, max_depth: int = 4):
    """Public-suffix-list lookup as pure JVM expressions: returns
    (public_suffix, registrable_domain) Columns for a host Column under
    the given PSL-format ``rules`` (normal ``co.uk``, wildcard ``*.ck``,
    exception ``!www.ck`` — publicsuffix.org semantics; kernel twin
    public_suffix_registrable).

    Scale shape: the rule set folds into per-depth LITERAL arrays inside
    the plan, so a 10^10-row frontier computes registrable domains with
    ZERO joins and ZERO exchanges — entirely inside whole-stage codegen
    (array_contains over a literal array is a hash-set probe after
    constant folding).  The real PSL is ~9k rules; at that size embed the
    rules as one broadcast map-side join on the depth-sliced suffix
    instead of literals (plan-size, not correctness).  ``max_depth``
    bounds suffix candidates (the real list's deepest rule is 5 labels).

    Registrable domain — not hostname — is what politeness budgets and
    host reputation should group by (a.blogspot.com and b.blogspot.com
    are different parties; www.example.co.uk and example.co.uk are the
    same one)."""
    labels = F.split(F.lower(host), r"\.")
    n = F.size(labels)

    def suffix(d):
        # start clamped to 1: slice() raises on start=0 and the n>=d
        # guard's other conjunct still evaluates eagerly; when n < d the
        # guard is false, so the (wrong-length) suffix is never used
        return F.array_join(
            F.slice(labels, F.greatest(n - d + 1, F.lit(1)), d), ".")

    def match_depth(rule_set, *, offset=0):
        """Max match depth over the set, 0 = none. offset=1 is the
        wildcard shape: a rule of depth d matches hosts with d+1+ labels
        whose depth-d suffix equals the rule, at match depth d+1."""
        by_depth: dict[int, list[str]] = {}
        for r in rule_set:
            by_depth.setdefault(r.count(".") + 1, []).append(r)
        expr = F.lit(0)
        for d, rs in sorted(by_depth.items()):
            if d > max_depth:
                raise ValueError(f"rule deeper than max_depth={max_depth}")
            arr = F.array(*[F.lit(x) for x in sorted(rs)])
            cond = (n >= d + offset) & F.array_contains(arr, suffix(d))
            expr = F.greatest(expr,
                              F.when(cond, F.lit(d + offset)).otherwise(0))
        return expr

    norm = [r for r in rules if not r.startswith(("!", "*."))]
    wild = [r[2:] for r in rules if r.startswith("*.")]
    exc = [r[1:] for r in rules if r.startswith("!")]
    exc_d = match_depth(exc)
    pub_d = F.when(exc_d >= 2, exc_d - 1).otherwise(
        F.greatest(match_depth(norm),
                   match_depth(wild, offset=1), F.lit(1)))
    public_suffix = F.array_join(F.slice(labels, n - pub_d + 1, pub_d), ".")
    registrable = F.when(
        n >= pub_d + 1,
        F.array_join(F.slice(labels, F.greatest(n - pub_d, F.lit(1)),
                             pub_d + 1), "."))
    return public_suffix, registrable


def surt_key(url: Column) -> Column:
    """CDX-style SURT key (Sort-friendly URI Reordering Transform) — the
    Common-Crawl index ordering: host labels lowercased and REVERSED
    (com,example,host3), then ')' + path, '?query' kept, fragment and
    port dropped. All JVM expressions (parse_url + array ops), so a
    10^10-row index builds inside whole-stage codegen and a prefix scan
    over the stored-sorted key is a contiguous range read — the layout
    that makes per-domain lookups on a Common-Crawl-scale index cheap.
    """
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    path = F.lower(F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")))
    query = F.parse_url(url, F.lit("QUERY"))
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"), path,
        F.when(query.isNotNull() & (query != ""),
               F.concat(F.lit("?"), F.lower(query))).otherwise(F.lit("")))


def parse_sitemaps(sitemaps: DataFrame, *,
                   xml_col: str = "sitemap_xml",
                   block_tag: str = "url") -> DataFrame:
    """Sitemap-protocol (sitemaps.org) urlset parse: one input row per
    sitemap document → one output row per listed URL, columns ``url``
    and ``lastmod`` ('' when the optional tag is absent) appended to the
    input row. The crawl seed source the reference lacks entirely — its
    seed list is an external API (scripts/news.py:1-9); a real crawler
    bootstraps frontiers from published sitemaps.

    Pure JVM expressions (regexp_extract_all + explode — whole-stage
    codegen, no UDF): <url> BLOCKS are extracted first and each block is
    parsed independently, so an entry without <lastmod> cannot misalign
    a positional loc↔lastmod zip (the classic bug in naive two-list
    parsers — lastmod IS optional in the protocol). Sitemap-index files
    (<sitemapindex> of child sitemap <loc>s) are the same block parse
    with ``block_tag='sitemap'`` — see :func:`parse_sitemap_index`.

    Scale shape: sitemap documents are small per-host files; the parse
    is a narrow per-row regex inside codegen, the explode multiplies
    rows without a shuffle, and everything downstream (canonicalize,
    seen anti-join) joins on the url key."""
    # (?s): published sitemaps are pretty-printed — <url> blocks span
    # lines, and Java-regex '.' does not match \n without DOTALL
    block = F.explode(
        F.regexp_extract_all(F.col(xml_col),
                             F.lit(rf"(?s)<{block_tag}>(.*?)</{block_tag}>"),
                             F.lit(1)))
    out = sitemaps.withColumn("_block", block).drop(xml_col)
    return (out
            .withColumn("url",
                        F.regexp_extract("_block", r"<loc>([^<]*)</loc>", 1))
            .withColumn("lastmod",
                        F.regexp_extract("_block",
                                         r"<lastmod>([^<]*)</lastmod>", 1))
            .drop("_block")
            .filter(F.col("url") != ""))


def parse_sitemap_index(index_docs: DataFrame, *,
                        xml_col: str = "sitemap_xml") -> DataFrame:
    """Sitemap-INDEX parse (sitemaps.org two-level layout: a
    ``<sitemapindex>`` of child-sitemap ``<sitemap><loc>`` entries, the
    shape every large site publishes because urlsets cap at 50k URLs):
    one input row per index document → one row per child sitemap,
    columns ``child_url`` / ``child_lastmod`` appended. Same pure-JVM
    block parse as :func:`parse_sitemaps`; the caller fetches the child
    documents and runs ``parse_sitemaps`` on them — the fetch itself is
    outside the data plane, like every fetch in this engine.

    Input must not already carry ``url``/``lastmod`` columns (they are
    the parse's scratch names before the rename)."""
    out = parse_sitemaps(index_docs, xml_col=xml_col, block_tag="sitemap")
    return (out.withColumnRenamed("url", "child_url")
            .withColumnRenamed("lastmod", "child_lastmod"))


def robots_sitemap_urls(robots_txt: DataFrame, *, host_col: str = "host",
                        txt_col: str = "robots_txt") -> DataFrame:
    """``Sitemap:`` directive extraction from raw robots.txt bodies:
    (host, robots_txt) → one row per advertised sitemap URL, columns
    ``host`` and ``sitemap_url``. Per the sitemaps.org protocol the
    directive is independent of user-agent groups (it can appear
    anywhere in the file, any case), so this is a flat line scan — NOT
    part of the per-group kernel parser (functions/kernel.py:745), whose
    rules tables stay unchanged. Hosts advertising nothing simply emit
    no rows (explode of the empty match array).

    Pure JVM `(?im)` anchored regex inside codegen; composes with
    :func:`parse_sitemap_index` / :func:`parse_sitemaps` into the
    standard discovery bootstrap: robots → index → urlsets → frontier
    seeds (plans/queries.q_robots_sitemap_discovery)."""
    sm = F.explode(F.regexp_extract_all(
        F.col(txt_col),
        F.lit(r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*(\S+)"), F.lit(1)))
    return robots_txt.select(F.col(host_col).alias("host"),
                             sm.alias("sitemap_url"))


def parse_feeds(feeds: DataFrame, *, xml_col: str = "feed_xml") -> DataFrame:
    """RSS-2.0 / Atom-1.0 feed parse: one input row per fetched feed
    document → one output row per listed entry, columns ``url``,
    ``published`` ('' when the optional date tag is absent) and
    ``feed_format`` ('rss' | 'atom') appended. Feeds are the OTHER
    standard discovery channel beside sitemaps (sites publish new-page
    URLs there first — news, blogs, changelogs), and the reference has
    neither (its seed list is an external API, scripts/news.py:1-9).

    Same block-scoped pure-JVM parse as :func:`parse_sitemaps` (codegen
    regexp_extract_all + explode, zero UDFs), with the format-specific
    hazards kept structural:

    - RSS ``<item>`` blocks carry ``<link>url</link>`` — but the CHANNEL
      header carries a ``<link>`` too (the site homepage, required by the
      RSS spec). Extracting blocks FIRST means the channel link can never
      leak into the entry list (a naive global ``<link>`` scan
      overcounts every feed by one).
    - Atom ``<entry>`` blocks carry ``<link ... href="url"/>`` with
      arbitrary attributes (``rel="alternate"`` etc.) before the href,
      and the FEED header carries self/alternate links outside any
      entry — excluded the same way.
    - ``<pubDate>`` / ``<updated>`` are optional per entry; block-level
      parsing cannot misalign a positional zip when they're absent.

    Both branches parse every document; a row yields entries only for
    blocks its format actually contains, so mixed inputs need no
    per-document format sniff (union of two narrow codegen projections).
    Date normalization is the CALLER's seam (bootstrap uses
    try_to_timestamp so one malformed date degrades to the epoch instead
    of ANSI-aborting the job) — real RSS pubDates also arrive RFC-822;
    normalizing them is a to_timestamp format list, not a parser change.

    Scale shape: feed documents are small per-host files; blocks explode
    without a shuffle and everything downstream (canonicalize, seen
    anti-join) joins on the url key — identical to the sitemap path."""
    def _blocks(tag: str) -> F.Column:
        # (?s): real feeds are pretty-printed — entry blocks SPAN LINES,
        # and without DOTALL the block regex silently yields zero entries
        return F.explode(F.regexp_extract_all(
            F.col(xml_col), F.lit(rf"(?s)<{tag}>(.*?)</{tag}>"), F.lit(1)))

    rss = (feeds.withColumn("_b", _blocks("item")).drop(xml_col)
           .withColumn("url",
                       F.regexp_extract("_b", r"<link>([^<]*)</link>", 1))
           .withColumn("published",
                       F.regexp_extract("_b",
                                        r"<pubDate>([^<]*)</pubDate>", 1))
           .withColumn("feed_format", F.lit("rss")))
    atom = (feeds.withColumn("_b", _blocks("entry")).drop(xml_col)
            .withColumn("url",
                        F.regexp_extract("_b",
                                         r'<link[^>]*href="([^"]*)"', 1))
            .withColumn("published",
                        F.regexp_extract("_b",
                                         r"<updated>([^<]*)</updated>", 1))
            .withColumn("feed_format", F.lit("atom")))
    return (rss.unionByName(atom).drop("_b")
            .filter(F.col("url") != ""))


def robots_failure_policy(fetches: DataFrame,
                          cached: DataFrame | None = None, *,
                          now_ts: int,
                          max_cache_age_s: int = 30 * 24 * 3600,
                          user_agent: str = "*") -> DataFrame:
    """RFC 9309 §2.3.1 robots.txt FETCH-FAILURE semantics — the policy
    layer between fetching /robots.txt and applying rules, which the
    parse/apply operators alone cannot express (the reference never
    fetches robots at all):

    - 2xx with a body → ``parsed``: the body's rules apply.
    - "unavailable" (4xx — including the overwhelmingly-common 404 — or
      a terminal 3xx after the fetch layer exhausts its redirect budget)
      → ``allow_all``: the spec says crawlers MAY access everything.
    - "unreachable" (5xx, or a network timeout = NULL status) →
      ``cached`` when a previously-good parse exists and is younger than
      ``max_cache_age_s`` (the spec's MAY-use-cached clause; 30 days is
      the widely-documented crawler default), else ``deny_all``
      (disallow ``/`` — the spec's MUST for newly-unreachable hosts).

    Input ``fetches``: one row per host — (host, status int|NULL,
    robots_txt). ``cached``: optional last-good rules (host,
    disallow_prefixes, allow_prefixes, crawl_delay_ms, cached_ts seconds).
    ``now_ts`` is EXPLICIT (seconds) — determinism is the engine-wide
    contract, nothing reads a wall clock.

    Output: one row per host with ``policy`` plus effective
    (disallow_prefixes, allow_prefixes, crawl_delay_ms) — directly
    consumable by :func:`apply_robots` / ``CrawlEngine.bootstrap(robots=…)``
    (the composition seam: policy resolution happens once at robots-fetch
    time, the engine sees only effective rules).

    Scale shape: the robots surface is per-host tiny (this whole table is
    the broadcast side downstream); only the 2xx subset pays the
    pandas-UDF parse, the rest is codegen CASE logic over a host-keyed
    left join."""
    st = F.col("status")
    ok = st.isNotNull() & (st >= 200) & (st < 300) & \
        F.col("robots_txt").isNotNull()
    parsed = parse_robots_table(
        fetches.filter(ok).select("host", "robots_txt"),
        user_agent=user_agent).withColumn("policy", F.lit("parsed"))

    rest = fetches.filter(~ok).select("host", "status")
    if cached is None:
        cached = fetches.sparkSession.createDataFrame(
            [], f"host string, {ROBOTS_RULES_SCHEMA}, cached_ts long")
    # a production robots cache accretes GENERATIONS per host; elect the
    # newest (max cached_ts, remaining fields as deterministic tiebreak)
    # or the host-keyed left join below fans out duplicate rule rows and
    # every downstream URL of that host duplicates
    cached = (cached.groupBy("host")
              .agg(F.max(F.struct("cached_ts", "crawl_delay_ms",
                                  "disallow_prefixes", "allow_prefixes"))
                   .alias("_g"))
              .select("host", F.col("_g.disallow_prefixes")
                      .alias("disallow_prefixes"),
                      F.col("_g.allow_prefixes").alias("allow_prefixes"),
                      F.col("_g.crawl_delay_ms").alias("crawl_delay_ms"),
                      F.col("_g.cached_ts").alias("cached_ts")))
    fresh = (F.col("cached_ts").isNotNull()
             & (F.lit(int(now_ts)) - F.col("cached_ts")
                <= F.lit(int(max_cache_age_s))))
    unreachable = st.isNull() | (st >= 500)
    empty = F.array().cast("array<string>")
    policy = (F.when(~unreachable, F.lit("allow_all"))
              .when(fresh, F.lit("cached"))
              .otherwise(F.lit("deny_all")))
    resolved = (rest.join(F.broadcast(cached), "host", "left")
                .withColumn("policy", policy)
                .select(
                    "host",
                    F.when(F.col("policy") == "cached",
                           F.col("disallow_prefixes"))
                    .when(F.col("policy") == "deny_all",
                          F.array(F.lit("/"))).otherwise(empty)
                    .alias("disallow_prefixes"),
                    F.when(F.col("policy") == "cached",
                           F.col("allow_prefixes")).otherwise(empty)
                    .alias("allow_prefixes"),
                    F.when(F.col("policy") == "cached",
                           F.col("crawl_delay_ms"))
                    .cast("long").alias("crawl_delay_ms"),
                    "policy"))
    return parsed.select(*resolved.columns).unionByName(resolved)


def url_trap_signals(urls: DataFrame, *, host_col: str = "host",
                     path_col: str = "path", query_col: str = "query",
                     min_variants: int = 50) -> DataFrame:
    """Crawler-trap detection: per-host signals for paths whose QUERY
    VARIANT count explodes — calendars, faceted search, session ids —
    the URL spaces that are infinite even though the content isn't. A
    (host, path) is a trap candidate when ≥ ``min_variants`` distinct
    query strings were discovered for it. Output per host: n_paths,
    n_trap_paths, max_variants, worst_path (deterministic min-by on
    (−variants, path)). The frontier consumes the verdict as a
    broadcast gate (hosts/paths ≪ urls), the same shape as
    host_reputation — the reference crawls a fixed 10-URL list and
    cannot meet traps (scripts/news.py:3-7); a discovery crawler meets
    them immediately.

    Scale shape: one (host, path, query)-distinct + (host, path) count
    (map-side partials on 8-byte-ish keys), one per-host rollup —
    aggregates all the way down, no windows, no UDFs; query strings
    collapse to hashes before shuffling."""
    per_path = (urls.select(F.col(host_col).alias("host"),
                            F.col(path_col).alias("path"),
                            F.xxhash64(F.col(query_col)).alias("_q"))
                .distinct()
                .groupBy("host", "path")
                .agg(F.count("*").alias("n_variants")))
    return (per_path.groupBy("host")
            .agg(F.count("*").alias("n_paths"),
                 F.sum((F.col("n_variants") >= F.lit(min_variants))
                       .cast("int")).cast("long").alias("n_trap_paths"),
                 F.max("n_variants").alias("max_variants"),
                 F.min_by("path", F.struct(
                     (-F.col("n_variants")).alias("_neg"),
                     F.col("path"))).alias("worst_path")))


def cap_trap_variants(frontier: DataFrame, *, max_variants: int,
                      order_cols=None) -> tuple:
    """Frontier-side crawler-trap cap (the enforcement half of
    url_trap_signals): per (host, path) — path taken from canonical_url,
    query excluded — at most ``max_variants`` pending URLs survive, the
    deterministic FRONTIER_ORDER-best ones; the rest are DROPPED (a
    crawler abandons a calendar, it doesn't queue it forever). Returns
    (kept, dropped).

    Scale shape: the window runs ONLY over rows of paths whose pending
    count exceeds the cap (same pattern as select_round_batch's
    hot-host branch): a count aggregate finds the trap paths, the
    verdict broadcasts (trap paths ≪ paths by construction — that's
    what makes them traps), cold rows bypass the window entirely. A
    single mega-trap path still lands on one reducer, but its input is
    that path's rows only — and the cap itself keeps re-applying every
    round, so the pending set for a capped path never grows unbounded."""
    path_expr = F.regexp_extract(
        F.col("canonical_url"),
        r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    tagged = frontier.withColumn("_tp", path_expr)
    hot = (tagged.groupBy("host", "_tp")
           .agg(F.count("*").alias("_n"))
           .filter(F.col("_n") > max_variants)
           .select("host", "_tp", F.lit(True).alias("_hot")))
    j = tagged.join(F.broadcast(hot), ["host", "_tp"], "left")
    cold = j.filter(F.col("_hot").isNull()).drop("_tp", "_hot")
    w = Window.partitionBy("host", "_tp").orderBy(*order_exprs(order_cols))
    ranked = (j.filter(F.col("_hot").isNotNull())
              .withColumn("_tr", F.row_number().over(w)))
    kept = (cold.unionByName(
        ranked.filter(F.col("_tr") <= max_variants)
        .drop("_tp", "_hot", "_tr")))
    dropped = (ranked.filter(F.col("_tr") > max_variants)
               .drop("_tp", "_hot", "_tr"))
    return kept, dropped


def assign_fetch_slots(urls: DataFrame, *, n_slots: int,
                       hot_threshold: int = 1000,
                       host_col: str = "host",
                       persist: bool = True) -> DataFrame:
    """Host → fetch-slot bin packing: assign every host to one of
    ``n_slots`` fetcher slots (executors / politeness lanes) so per-slot
    pending load balances. Politeness pins a host to ONE slot (its
    crawl-delay clock lives there — splitting a host across fetchers
    breaks rate limiting, which is why the engine's round batches group
    by host, plans/crawl.py); the reference never faces this because one
    process fetches everything sequentially (scripts/news.py:37-48).

    Two-tier assignment (the hot/cold split url_trap_signals and
    cap_trap_variants use):
    - HOT hosts (pending > hot_threshold) get exact serpentine placement:
      ranked by (pending desc, host), rank r lands in slot r%K on even
      passes and K-1-r%K on odd passes — the boustrophedon LPT
      approximation, so the 2nd-heaviest host never stacks on the 1st.
      The global window is safe because hot hosts are BOUNDED (≪ hosts
      by construction — that's what makes them hot).
    - COLD hosts hash to a slot (md5-prefix mod K — bit-identical in the
      DuckDB oracle); with pending ≤ hot_threshold each, hashing is
      load-balanced in expectation and shuffle-free per row.

    Output: (host, pending, hot, slot). Deterministic: counts, md5, and
    rank tiebreaks only. Scale shape: one per-host count (map-side
    partials), one bounded-set window, no joins wider than the hot
    verdict."""
    per_host = (urls.groupBy(F.col(host_col).alias("host"))
                .agg(F.count("*").alias("pending")))
    if persist:
        # hot and cold branches both read per_host: without reuse each
        # branch re-scans the URL corpus and re-pays the count shuffle —
        # the host table is corpus-scan-expensive to build but tiny to
        # hold (hosts ≪ urls)
        from ..caching import bounded_persist
        per_host = bounded_persist(per_host, tag="fetch_slots")
    hot = per_host.filter(F.col("pending") > hot_threshold)
    cold = per_host.filter(F.col("pending") <= hot_threshold)
    w = Window.orderBy(F.desc("pending"), F.asc("host"))
    hot_assigned = (hot.withColumn("_idx", F.row_number().over(w) - 1)
                    .select("host", "pending", F.lit(True).alias("hot"),
                            F.when(
                                F.expr(f"_idx div {n_slots}") % 2 == 0,
                                F.col("_idx") % n_slots)
                            .otherwise(n_slots - 1 - F.col("_idx") % n_slots)
                            .cast("long").alias("slot")))
    cold_assigned = cold.select(
        "host", "pending", F.lit(False).alias("hot"),
        (F.conv(F.substring(F.md5(F.col("host")), 1, 8), 16, 10)
         .cast("long") % n_slots).alias("slot"))
    return hot_assigned.unionByName(cold_assigned)


def estimate_crawl_delays(fetches: DataFrame, *, host_col: str = "host",
                          latency_col: str = "latency_ms",
                          q_bp: int = 9500, factor_bp: int = 15000,
                          min_delay_ms: int = 100,
                          max_delay_ms: int = 30000) -> DataFrame:
    """Adaptive per-host politeness: derive next round's crawl delay
    from OBSERVED fetch latencies — robots Crawl-delay is a floor the
    server asked for; a polite crawler also backs off when the server
    is visibly slow (the "don't be the load" rule every production
    fleet implements). delay = clamp(factor × p-quantile latency),
    integers end-to-end.

    The quantile is the EXACT nearest-rank p(q_bp/10000): smallest
    latency v with cum_count(≤ v) ≥ ceil(q · n). No percentile_approx —
    approx sketches differ across engines and would break oracle
    parity; exactness here is cheap because of the histogram shape
    below.

    Scale shape — bounded histogram, not per-fetch windows: fetches
    collapse to (host, latency_ms) counts in ONE map-side-combined
    aggregate (the only exchange that sees fetch cardinality, and the
    combine collapses hot hosts' millions of fetches into ≤ ~30k
    distinct ms values). The cumulative walk runs as TWO window
    functions (running sum + partition total) sharing ONE
    exchange+sort whose per-host partition is bounded by the distinct
    latency values — a hot host with 10^8 fetches costs the same
    window state as a cold one, which is exactly what
    WindowExec-can't-skew-split demands. Output per host: n_fetches,
    q_ms (the quantile), delay_ms (clamped)."""
    counts = (fetches.select(F.col(host_col).alias("host"),
                             F.col(latency_col).cast("long").alias("lat"))
              # failed fetches log NULL latency; they must not inflate n
              # (a null can never be picked, but it would shift the rank)
              .filter(F.col("lat").isNotNull())
              .groupBy("host", "lat").agg(F.count("*").alias("c")))
    w = Window.partitionBy("host").orderBy("lat")
    wt = Window.partitionBy("host")
    cum = (counts.withColumn("cum", F.sum("c").over(w))
           .withColumn("n", F.sum("c").over(wt)))
    target = F.expr(f"(n * {q_bp} + 9999) div 10000")
    hit = cum.filter((F.col("cum") >= target) &
                     (F.col("cum") - F.col("c") < target))
    raw = F.expr(f"(lat * {factor_bp}) div 10000")
    return hit.select(
        "host", F.col("n").alias("n_fetches"), F.col("lat").alias("q_ms"),
        F.least(F.lit(max_delay_ms),
                F.greatest(F.lit(min_delay_ms), raw))
        .cast("long").alias("delay_ms"))


URL_BLOCKWORDS = ("casino", "viagra", "gambling", "pills", "xxx")


def url_prefilter(urls: DataFrame, *, url_col: str = "url",
                  blockwords: tuple = URL_BLOCKWORDS,
                  max_len: int = 220, max_depth: int = 8,
                  max_params: int = 8,
                  max_digit_bp: int = 4000) -> DataFrame:
    """URL-level pre-fetch filter (the RefinedWeb/UT1-blocklist stage):
    score every candidate url on lexical spam/junk features and emit a
    keep/drop verdict BEFORE any fetch is scheduled — at web scale the
    cheapest byte is the one never downloaded. Complements
    url_trap_signals (which needs the variant-count aggregate): this
    gate is per-row and stateless. Reference analog: the reference
    crawls a fixed hand-vetted 10-URL list (/root/reference/scripts/
    news.py:3-7) and never needs one; a discovery crawler filters every
    frontier candidate.

    Features (all on the lowercased url): total length, path depth
    (slash count of the path component), query-parameter count, digit
    density in basis points, and a blockword hit (adult/spam lexicon as
    one alternation regex). Verdict priority: blockword > params >
    digits > depth > length > ok.

    Scale shape (100 TB frontier): pure JVM expressions inside one
    whole-stage-codegen projection — zero shuffles, zero UDFs, no state;
    it composes as a filter on the frontier scan, so Parquet row groups
    are pruned by whatever predicate sits above it and the dropped rows
    never reach the scheduler exchange."""
    u = F.lower(F.col(url_col))
    path = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    n_len = F.length(u)
    depth = F.length(path) - F.length(F.replace(path, F.lit("/"), F.lit("")))
    n_params = (F.when(query == "", F.lit(0))
                .otherwise(F.length(query)
                           - F.length(F.replace(query, F.lit("&"),
                                                F.lit(""))) + 1))
    n_digits = n_len - F.length(F.regexp_replace(u, r"[0-9]", ""))
    staged = urls.withColumns({
        "url_len": n_len.cast("long"),
        "path_depth": depth.cast("long"),
        "n_params": n_params.cast("long"),
        "_nd": n_digits.cast("long"),
        "_blocked": u.rlike("|".join(blockwords)),
    })
    # integer `div` (bit-deterministic, host_reputation convention);
    # greatest(.,1) keeps ANSI div from aborting on an empty-string url
    digit_bp = F.expr("(10000 * _nd) div greatest(url_len, 1)")
    reason = (F.when(F.col("_blocked"), F.lit("blockword"))
              .when(F.col("n_params") > max_params, F.lit("params"))
              .when(digit_bp > max_digit_bp, F.lit("digits"))
              .when(F.col("path_depth") > max_depth, F.lit("depth"))
              .when(F.col("url_len") > max_len, F.lit("length"))
              .otherwise(F.lit("ok")))
    return (staged.withColumns({
        "digit_bp": digit_bp.cast("long"),
        "drop_reason": reason,
        "keep": reason == "ok",
    }).drop("_nd", "_blocked"))


# Tracking / session query parameters stripped by aggressive URL
# canonicalization — the Heritrix/Internet-Archive canonicalization-rule
# lexicon (utm_* is the Google Analytics family; gclid/fbclid/msclkid are
# click ids; *sessionid/sid are server session tokens that make every
# visit a "new" URL).
TRACKING_PARAM_RE = (r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|"
                     r"igshid|yclid|_ga|ref_src|phpsessid|jsessionid|"
                     r"sessionid|sid)(=|$)")


def url_tracking_canonical(urls: DataFrame, *, url_col: str = "url",
                           tracking_re: str = TRACKING_PARAM_RE) -> DataFrame:
    """Aggressive URL canonicalization for frontier dedup (the
    Heritrix canonicalization-rules stage): strip the fragment, strip a
    path-embedded ``;jsessionid=`` token, drop tracking/session query
    parameters, and SORT the surviving parameters — so the million
    ``?utm_source=`` variants of one page collapse to one frontier row
    BEFORE url_seen membership is consulted. Complements
    kernel.canonicalize_url (scheme/host/port normalization, query kept
    verbatim) and surt_key (ordering key; query kept verbatim): this is
    the lossy tier a crawl opts into per-policy, which is why it is a
    separate operator rather than a change to the lossless canonical.

    Output: input row + ``canon_url``, ``n_params_in``,
    ``n_params_kept``, ``changed``.

    Scale shape (100 TB frontier): pure JVM expressions — split /
    filter / array_sort / array_join inside one whole-stage-codegen
    projection; zero shuffles, zero UDFs. Downstream exact dedup on
    canon_url replaces dedup on the raw url and is strictly coarser.
    """
    u = F.substring_index(F.col(url_col), "#", 1)
    u = F.regexp_replace(u, r"(?i);jsessionid=[^;?#]*", "")
    staged = urls.withColumn("_u", u)
    query = (F.when(F.instr(F.col("_u"), "?") > 0,
                    F.expr("substring(_u, instr(_u, '?') + 1)"))
             .otherwise(F.lit("")))
    params = F.filter(F.split(query, "&"), lambda p: p != "")
    kept = F.array_sort(F.filter(
        params, lambda p: ~F.lower(p).rlike(tracking_re)))
    base = F.substring_index(F.col("_u"), "?", 1)
    canon = (F.when(F.size(kept) > 0,
                    F.concat(base, F.lit("?"), F.array_join(kept, "&")))
             .otherwise(base))
    return (staged.withColumns({
        "canon_url": canon,
        "n_params_in": F.size(params).cast("long"),
        "n_params_kept": F.size(kept).cast("long"),
    }).withColumn("changed", F.col("canon_url") != F.col(url_col))
        .drop("_u"))


def extract_directives(pages: DataFrame, *, url_col: str = "url",
                       html_col: str = "html") -> DataFrame:
    """Page-level crawl directives: meta-robots ``noindex``/``nofollow``
    and the ``rel=canonical`` target, extracted from raw HTML.

    The robots.txt layer (apply_robots / apply_robots_wildcard) gates
    fetching per host-path; these are the PER-PAGE directives a crawler
    honors after the fetch (Googlebot/Heritrix semantics): ``noindex``
    keeps the page out of the corpus/index while its links may still be
    followed, ``nofollow`` suppresses out-link discovery from this page,
    and ``rel=canonical`` folds duplicate URLs onto a canonical target
    BEFORE content dedup ever runs — the polite-web analog of the
    reference's URL-seen skip (/root/reference/scripts/news.py:17-34),
    driven by the publisher's own declaration instead of our hash.

    Output: input row + ``noindex``, ``nofollow`` (booleans),
    ``canonical_url`` (declared target, or the page's own URL when no
    tag / an empty href is present) and ``canonical_self``.

    Scale shape (100 TB): three case-insensitive regexp extractions over
    the html column inside ONE whole-stage-codegen projection — no
    shuffle, no UDF, and the html column is dropped from the output so
    the wide blob never crosses a downstream exchange. Canonical-group
    folding (groupBy canonical_url) then shuffles only the url-cardinality
    directive rows, never the payload.
    """
    html = F.col(html_col).cast("string")
    noindex, nofollow = meta_robots_flags(html)
    canon_href = F.regexp_extract(
        html, r'(?i)<link\s+rel="canonical"\s+href="([^"]*)"', 1)
    canonical = (F.when(canon_href == "", F.col(url_col))
                 .otherwise(canon_href))
    return (pages.withColumns({
        "noindex": noindex,
        "nofollow": nofollow,
        "canonical_url": canonical,
    }).withColumn("canonical_self", F.col("canonical_url") == F.col(url_col))
        .drop(html_col))


def meta_robots_flags(html: Column) -> tuple:
    """(noindex, nofollow) boolean Columns from a robots meta tag in raw
    HTML — either attribute order, any case. NULL html (failed fetch)
    yields false/false, so the flags are safe to filter on directly.
    Shared by extract_directives and CrawlEngine(honor_directives=True);
    pure JVM regexps, codegen-friendly."""
    content = F.concat_ws(
        " ",
        F.regexp_extract(
            html, r'(?i)<meta\s+name="robots"\s+content="([^"]*)"', 1),
        F.regexp_extract(
            html, r'(?i)<meta\s+content="([^"]*)"\s+name="robots"', 1))
    return (F.coalesce(content.rlike(r"(?i)\bnoindex\b"), F.lit(False)),
            F.coalesce(content.rlike(r"(?i)\bnofollow\b"), F.lit(False)))


def extract_meta_refresh(pages: DataFrame, *, url_col: str = "url",
                         html_col: str = "html") -> DataFrame:
    """Meta-refresh soft redirects: ``<meta http-equiv="refresh"
    content="N; url=TARGET">`` extracted from raw HTML as single-hop
    redirect edges ``(src, dst, refresh_delay)`` — pages with no (or a
    malformed) refresh tag are dropped.

    HTTP 3xx chains arrive as first-class records (see
    graph.resolve_redirect_chains); meta refresh is the SOFT redirect
    layer HTTP-only handling misses — parked domains, legacy "page
    moved" stubs, and interstitials redirect this way, and real crawlers
    (Heritrix, Nutch, Common Crawl's extractor) treat it as a redirect
    edge. The reference follows only HTTP redirects implicitly inside
    requests (/root/reference/scripts/trafilatura_scraper.py:43); a
    frontier must materialize these edges or it re-fetches the stub
    forever and never reaches the content.

    Both attribute orders are accepted, any case; delay parses as an
    integer (``refresh_delay = 0`` is the instant-redirect case —
    indistinguishable from a 301 for scheduling purposes).

    Scale shape (100 TB): four case-insensitive regexp extractions in
    ONE whole-stage-codegen projection, html dropped in the same
    projection — downstream chain resolution exchanges only
    url-cardinality edges, never the payload.
    """
    html = F.col(html_col).cast("string")
    pat_a = r'(?i)<meta\s+http-equiv="refresh"\s+content="(\d+);\s*url=([^"]*)"'
    pat_b = r'(?i)<meta\s+content="(\d+);\s*url=([^"]*)"\s+http-equiv="refresh"'
    # a page can carry BOTH attribute orders (templated heads duplicate
    # meta tags); prefer pattern A's pair wholesale — concatenating the
    # two extractions would weld '5'+'0' into delay 50 and a garbage url
    a_hit = F.regexp_extract(html, pat_a, 1) != ""
    delay = F.when(a_hit, F.regexp_extract(html, pat_a, 1)) \
        .otherwise(F.regexp_extract(html, pat_b, 1))
    target = F.when(a_hit, F.regexp_extract(html, pat_a, 2)) \
        .otherwise(F.regexp_extract(html, pat_b, 2))
    return (pages.select(
        F.col(url_col).alias("src"),
        target.alias("dst"),
        delay.alias("_delay"))
        .filter((F.col("dst") != "") & (F.col("_delay") != ""))
        .withColumn("refresh_delay", F.col("_delay").cast("long"))
        .drop("_delay"))


def revalidation_plan(history: DataFrame, pages: DataFrame, *,
                      page_col: str = "page_id", ts_col: str = "ts",
                      id_col: str = "fetch_id", changed_col: str = "changed",
                      etag_col: str = "has_etag",
                      lastmod_col: str = "has_last_modified",
                      bytes_col: str = "page_bytes",
                      header_bytes: int = 600) -> DataFrame:
    """Conditional-GET recrawl planning: per page, decide full fetch vs
    If-None-Match / If-Modified-Since revalidation and price the expected
    bandwidth (the HTTP-cache-validation layer Heritrix/Nutch run next to
    the Cho-Garcia-Molina revisit scheduler — see revisit_schedule).

    Inputs: the fetch ``history`` frame revisit_schedule consumes (one
    row per past fetch with a ``changed`` flag), plus a per-page frame
    with validator capability (served an ETag / a Last-Modified header)
    and the page's full-body transfer size.

    Output per page: n_fetches, n_changes, change_bp (observed change
    rate in basis points), mode ('conditional' when either validator is
    available, else 'full'), expected_bytes — a conditional request pays
    the full body only at the observed change rate and a ~header-sized
    304 otherwise, a full fetch always pays the body — and saved_bp, the
    bandwidth fraction the validator saves. Schedulers feed saved_bp
    into fetch budgeting: a 10^10-URL frontier whose hosts serve
    validators recrawls for ~the header bill on still pages.

    All math is integer basis points (ANSI-safe: n_fetches >= 1 by
    construction of the group, page_bytes is guarded). Scale shape: the
    history aggregate reuses revisit_schedule (ONE exchange — window and
    groupBy share the page-id partitioning); the validator join is
    page-cardinality on the same key, so AQE plans a co-partitioned or
    broadcast join, and no text/blob column moves at any point.
    """
    stats = revisit_schedule(history, page_col=page_col, ts_col=ts_col,
                             id_col=id_col, changed_col=changed_col)
    caps = pages.select(
        F.col(page_col).alias("page_id"),
        F.col(etag_col).alias("_etag"),
        F.col(lastmod_col).alias("_lastmod"),
        F.col(bytes_col).cast("long").alias("page_bytes"))
    j = stats.join(caps, "page_id")
    change_bp = F.expr("(10000 * n_changes) div n_fetches")
    conditional = F.col("_etag") | F.col("_lastmod")
    exp_cond = F.expr(
        f"(change_bp * page_bytes + (10000 - change_bp) * {header_bytes}) "
        "div 10000")
    expected = F.when(conditional, exp_cond).otherwise(F.col("page_bytes"))
    return (j.withColumn("change_bp", change_bp.cast("long"))
            .withColumn("mode", F.when(conditional, F.lit("conditional"))
                        .otherwise(F.lit("full")))
            .withColumn("expected_bytes", expected.cast("long"))
            .withColumn(
                "saved_bp",
                F.when(F.col("page_bytes") > 0,
                       F.expr("(10000 * (page_bytes - expected_bytes)) "
                              "div page_bytes"))
                .otherwise(F.lit(0)).cast("long"))
            .select("page_id", "n_fetches", "n_changes", "change_bp",
                    "mode", "page_bytes", "expected_bytes", "saved_bp"))


def dust_param_rules(pages: DataFrame, *, url_col: str = "url",
                     text_col: str = "text", min_support: int = 2,
                     max_aliases_per_group: int = 8) -> DataFrame:
    """DUST rule mining — learn which query parameters are
    content-irrelevant per host from observed duplicate content
    ("Do Not Crawl in the DUST: Different URLs with Similar Text",
    Bar-Yossef/Keidar/Schonfeld, WWW'07). url_tracking_canonical strips
    a FIXED lexicon (utm_*, session ids); this operator mines the
    site-specific rest of that lexicon from the crawl's own evidence, so
    the canonicalizer can be extended per host without hand-curation.
    Reference analog: the reference's URL-seen skip is exact-string
    (/root/reference/scripts/news.py:17-34) and refetches every alias;
    a learned rule collapses the alias family before the fetch.

    Semantics: group fetched pages by (host, path-base, content digest).
    A group holding >= 2 distinct URLs is an ALIAS GROUP: same bytes,
    different URLs, differing only in their query strings. Within an
    alias group a parameter is content-irrelevant evidence iff it varies
    across the aliases — present in some members but not all, or present
    with more than one value — while the content stayed byte-identical.
    Each alias group contributes 1 support to each such (host, param);
    rules with support >= min_support are emitted. Params that never
    vary inside any alias group (e.g. a ?page=N that selects content)
    are never flagged, because differing content lands in different
    digest groups by construction.

    Output: (host, param, support, n_alias_urls) ordered by host, param.

    Scale shape (100 TB corpus): the text column collapses to a 32-byte
    md5 in the scan projection and never crosses an exchange. No pair
    self-join — alias-group membership and per-param variance are both
    aggregates over (host, base, digest[, param]) keys, so the whole
    operator is two map-side-combined aggregates plus one group-sized
    join; the hot-group guard (max_aliases_per_group) bounds pathological
    digest groups (parked-domain farms) exactly like host_mirror_pairs'
    hot-digest guard.
    """
    u = F.col(url_col)
    host = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    base = F.substring_index(u, "?", 1)
    query = (F.when(F.instr(u, "?") > 0,
                    F.expr(f"substring({url_col}, instr({url_col}, '?') + 1)"))
             .otherwise(F.lit("")))
    params = F.filter(F.split(query, "&"), lambda p: p != "")
    g = pages.select(
        host.alias("host"), base.alias("base"),
        F.md5(F.col(text_col)).alias("digest"),
        u.alias("_url"), params.alias("_params"))
    # alias groups: >=2 distinct urls, same (host, base, digest); the
    # upper cap is the hot-group guard
    groups = (g.groupBy("host", "base", "digest")
              .agg(F.countDistinct("_url").alias("n_aliases"))
              .filter((F.col("n_aliases") >= 2)
                      & (F.col("n_aliases") <= max_aliases_per_group)))
    exploded = g.select(
        "host", "base", "digest", "_url",
        F.explode("_params").alias("_p")).select(
        "host", "base", "digest", "_url",
        F.substring_index(F.col("_p"), "=", 1).alias("param"),
        F.col("_p").alias("_pv"))
    per_param = (exploded.groupBy("host", "base", "digest", "param")
                 .agg(F.countDistinct("_url").alias("n_urls_with"),
                      F.countDistinct("_pv").alias("n_values")))
    varies = (per_param.join(groups, ["host", "base", "digest"])
              .filter((F.col("n_urls_with") < F.col("n_aliases"))
                      | (F.col("n_values") > 1)))
    return (varies.groupBy("host", "param")
            .agg(F.count(F.lit(1)).cast("long").alias("support"),
                 F.sum("n_aliases").cast("long").alias("n_alias_urls"))
            .filter(F.col("support") >= min_support)
            .orderBy("host", "param"))


def ip_politeness_groups(frontier: DataFrame, hostmap: DataFrame, *,
                         host_col: str = "host",
                         per_ip_budget: int = 16) -> DataFrame:
    """Per-IP politeness grouping: hosts that resolve to the same address
    share one politeness budget (Heritrix's ip-based queue-assignment
    policy). Virtual hosting means a thousand vanity domains can live on
    one server; per-host budgets alone would multiply the server's load a
    thousandfold. The reference never meets this (its 10 seed URLs are
    distinct hosts), but any discovery crawl does.

    Inputs: the frontier (or any per-host demand frame) and a
    ``hostmap`` of (host, ip) — in production the resolver cache table,
    here a deterministic fixture. Hosts absent from the map keep their
    own budget (ip = host sentinel), matching Heritrix's fallback.

    Output per host: ip, n_hosts_on_ip, host demand (n_urls), ip_budget,
    host_budget (the ip budget split evenly, remainder to the
    lexicographically-first hosts — deterministic, no arrival order),
    and throttled = demand exceeds the host's share.

    Scale shape (10^10-URL frontier): demand is one map-side-combined
    count per host; the hostmap join is host-cardinality (broadcast —
    the resolver cache is millions of rows, not billions); the per-ip
    rollup shuffles only (ip, host, n_urls) rows. No url-cardinality
    exchange anywhere past the first count.
    """
    demand = (frontier.groupBy(F.col(host_col).alias("host"))
              .agg(F.count(F.lit(1)).cast("long").alias("n_urls")))
    mapped = (demand.join(F.broadcast(hostmap.select(
        F.col(host_col).alias("host"), "ip")), "host", "left")
        .withColumn("ip", F.coalesce(F.col("ip"),
                                     F.concat(F.lit("self:"),
                                              F.col("host")))))
    w = Window.partitionBy("ip")
    rank = F.row_number().over(w.orderBy("host"))
    n_on_ip = F.count(F.lit(1)).over(w)
    staged = (mapped.withColumn("n_hosts_on_ip", n_on_ip.cast("long"))
              .withColumn("_rk", rank))
    # even split, remainder to the first (host-ordered) hosts
    share = F.expr(f"{per_ip_budget} div n_hosts_on_ip") + \
        F.when(F.col("_rk") <= F.expr(f"{per_ip_budget} % n_hosts_on_ip"),
               F.lit(1)).otherwise(F.lit(0))
    return (staged.withColumn("ip_budget",
                              F.lit(per_ip_budget).cast("long"))
            .withColumn("host_budget", share.cast("long"))
            .withColumn("throttled", F.col("n_urls") > F.col("host_budget"))
            .select("host", "ip", "n_hosts_on_ip", "n_urls",
                    "ip_budget", "host_budget", "throttled")
            .orderBy("host"))


def _hash32(col) -> F.Column:
    """md5-derived 32-bit integer of a string column — the engine-portable
    hash the oracle can reproduce (conv of the first 8 hex chars)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def rendezvous_shard(hosts: DataFrame, *, n_shards: int,
                     host_col: str = "host",
                     out_col: str = "shard") -> DataFrame:
    """Rendezvous (highest-random-weight) host→shard assignment — how a
    10^10-URL frontier is split across fetcher workers.

    Each host scores every shard with hash(host + '#' + shard) and lands
    on its argmax. Unlike ``hash(host) % n_shards`` (the naive split,
    assign_fetch_slots' shape), rendezvous hashing has MINIMAL-DISRUPTION
    resharding: removing one worker remaps ONLY that worker's hosts (each
    surviving host's argmax among the remaining shards is unchanged),
    instead of reshuffling ~(n-1)/n of all hosts the way mod-hashing
    does. Politeness state (crawl-delay clocks, robots caches, per-host
    budgets) is sticky per worker, so resharding cost IS fetch-state
    migration cost — at web scale this is why crawlers (and consistent-
    hash stores generally) don't mod-hash their frontier.

    Pure per-row projection: the score array is built with transform over
    sequence and folded with array_max/array_position — no shuffle, no
    UDF; ties (p < n_shards·2^-32 per host) break to the lowest shard id
    identically in Spark and the SQL oracle (first-match position).

    Output: input row + ``out_col`` (0-based winning shard)."""
    hc = F.col(host_col).cast("string")
    scores = F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        lambda s: _hash32(F.concat(hc, F.lit("#"), s.cast("string"))))
    return (hosts.withColumn("_scores", scores)
            .withColumn(out_col,
                        (F.expr("array_position(_scores, "
                                "array_max(_scores))") - 1).cast("long"))
            .drop("_scores"))


def distinct_linear_count(refs: DataFrame, *, key_col: str = "host",
                          item_col: str = "url",
                          m: int = 4096) -> DataFrame:
    """Per-key distinct-item estimation with BOUNDED state: linear
    (probabilistic) counting over an ``m``-bucket hash bitmap.

    A frontier needs per-host distinct-URL counts constantly (trap
    scoring, budget allocation, dedup-rate dashboards). Exact
    count(distinct url) at 10^10 rows shuffles every distinct URL string;
    the linear-counting sketch shuffles at most ``m`` small integers per
    host, a fixed ceiling regardless of corpus size: bucket = hash(item)
    % m, count the occupied buckets V, estimate n̂ = −m·ln(1 − V/m)
    (Whang et al. 1990 — the standard-error sweet spot below ~10·m
    distinct; beyond that HyperLogLog takes over, same plan shape with a
    register max instead of a bucket set).

    The estimate is fully deterministic: V and m are exact integers on
    both engines, and ln of the identical double rounds identically at
    the 4-decimal output precision. Output per key: n_refs (rows seen),
    buckets_used (V), est_distinct (n̂ rounded to 4dp) — callers wanting
    ground truth join an exact distinct at test scale, which is exactly
    what the registry oracle does to expose the sketch error."""
    bucket = _hash32(F.col(item_col).cast("string")) % m
    per_bucket = (refs.groupBy(F.col(key_col).alias("key"),
                               bucket.alias("_b"))
                  .agg(F.count(F.lit(1)).alias("_n")))
    return (per_bucket.groupBy("key")
            .agg(F.sum("_n").cast("long").alias("n_refs"),
                 F.count(F.lit(1)).cast("long").alias("buckets_used"))
            .withColumn(
                "est_distinct",
                # V = m saturates the sketch (ln 0): report NULL — the
                # caller's signal to fall back to HLL / a larger m
                F.when(F.col("buckets_used") >= m,
                       F.lit(None).cast("double"))
                .otherwise(F.round(
                    -F.lit(float(m))
                    * F.log((F.lit(m) - F.col("buckets_used"))
                            / F.lit(float(m))), 4))))


HLL_P = 8          # 2^8 = 256 registers
HLL_M = 1 << HLL_P
# Flajolet et al. 2007 bias constant for m ≥ 128
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_registers(refs: DataFrame, *, key_col: str = "host",
                  item_col: str = "url") -> DataFrame:
    """Per-key HyperLogLog registers: (key, bucket, m_rho).

    hash(item) splits into the top 8 bits (register index) and the low
    24 bits w; the register keeps max over items of rho(w) = leading
    zeros of w in a 24-bit window, plus one — computed EXACTLY as
    25 − length(bin(w)) (25 for w = 0), never via floor(log2(w)) whose
    last-ulp behavior at powers of two differs across libm builds.
    Everything is md5-derived integer arithmetic, so Spark and the
    DuckDB oracle materialize identical registers.

    This is the register frame, not the estimate, on purpose: registers
    MERGE by max — the property that makes HLL the distributed answer.
    Per-partition sketches, per-day sketches, per-shard sketches all
    combine with one more max-aggregate and lose nothing (proved by the
    union-vs-merge test). State: ≤ 256 (key, bucket, rho≤25) rows per
    key, a fixed ceiling at any corpus size."""
    h = _hash32(F.col(item_col).cast("string"))
    w = h % (1 << 24)
    rho = F.when(w == 0, F.lit(25)).otherwise(
        F.lit(25) - F.length(F.bin(w)))
    return (refs.select(F.col(key_col).alias("key"),
                        (h / (1 << 24)).cast("long").alias("bucket"),
                        rho.cast("long").alias("rho"))
            .groupBy("key", "bucket")
            .agg(F.max("rho").alias("m_rho")))


def hll_estimate(regs: DataFrame) -> DataFrame:
    """(key, est_distinct) from a register frame (hll_registers output
    or any max-merge of several). Raw estimate αm²/Σ2^(−M) with absent
    registers contributing 2⁰ = 1; below 2.5m with empty registers the
    standard small-range correction switches to linear counting over
    the register bitmap (m·ln(m/V)). All summands are exact binary
    fractions (2^−M, M ≤ 25), so the double sum is exact and the
    estimate is bit-deterministic; rounded to 4dp at the output."""
    m = HLL_M
    agg = (regs.groupBy("key")
           .agg(F.sum(F.pow(F.lit(2.0), -F.col("m_rho"))).alias("_s"),
                F.count(F.lit(1)).alias("_present")))
    raw = (F.lit(HLL_ALPHA * m * m)
           / (F.col("_s") + (F.lit(m) - F.col("_present"))))
    v = F.lit(m) - F.col("_present")  # empty registers
    est = F.when((raw <= 2.5 * m) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v)) \
        .otherwise(raw)
    return agg.select("key", F.round(est, 4).alias("est_distinct"))


def distinct_hll(refs: DataFrame, *, key_col: str = "host",
                 item_col: str = "url") -> DataFrame:
    """Per-key HLL distinct estimate: hll_registers ∘ hll_estimate.
    Two map-side-combined aggregates; at most 256 small integer rows
    per key ever cross an exchange — the unbounded-cardinality sibling
    of distinct_linear_count (which is more accurate below ~10·m but
    saturates; HLL never does)."""
    return hll_estimate(hll_registers(refs, key_col=key_col,
                                      item_col=item_col))
