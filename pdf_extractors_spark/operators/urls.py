"""URL canonicalization — the provenance key of a web-scale pipeline.

Crawled corpora carry one URL per document, and dedup/blocklist/rollup
stages all key on it; raw URLs disagree on case, default ports, ``www.``
prefixes, fragments, tracking parameters and parameter order, so the
canonical form IS the join key. Everything here is pure column regex/array
math — codegen, no UDF, replayable in ANSI SQL for the DuckDB oracle.

Canonical rules (documented order):

1. trim; drop the ``#fragment``
2. lowercase scheme and host; strip a leading ``www.``; strip the
   scheme's default port (``:80`` http, ``:443`` https)
3. strip trailing slashes from the path
4. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``), sort the
   survivors bytewise, re-join with ``&``
5. inputs with no ``scheme://`` pass through lower(trim(x)) unchanged —
   a canonicalizer must be total on dirty provenance columns

Reference scope: the reference engine keys provenance on file paths
(pdf-extractors' per-file manifests); at corpus scale the analogue is the
crawl URL, so this module is the web-scale generalization of that key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

_TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")


def canonical_url(col: Column | str) -> Column:
    """Canonical form of a URL column (rules in the module docstring)."""
    u = F.regexp_replace(F.trim(F.col(col) if isinstance(col, str) else col), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, ":80$", "")).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    path = F.regexp_replace(F.regexp_extract(u, _PATH_RE, 1), "/+$", "")
    params = F.filter(
        F.split(F.regexp_extract(u, _QUERY_RE, 1), "&", -1),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~p.startswith("fbclid")
        & ~p.startswith("gclid"),
    )
    query = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    return F.when(scheme == "", F.lower(F.trim(F.col(col) if isinstance(col, str) else col))).otherwise(
        canon
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-keyed exact dedup: annotate each row with its canonical URL
    and whether it is the keeper (min id per canonical key) — the same
    min-representative contract as ``dedup.exact_dedup``, keyed on
    provenance instead of content. One shuffle on the canonical URL
    (a short string; payloads never move); null URLs form their own
    single null-key group, exactly like a groupBy would treat them."""
    canon = canonical_url(url_col)
    w = Window.partitionBy("canonical_url")
    return df.select(
        F.col(id_col),
        canon.alias("canonical_url"),
    ).withColumn(
        "is_keeper", F.col(id_col) == F.min(id_col).over(w)
    )


def robots_filter(
    df: DataFrame,
    rules: DataFrame,
    path_col: str = "path",
    id_col: str = "doc_id",
) -> DataFrame:
    """Robots-rules URL filtering with longest-match-wins semantics (the
    de-facto robots.txt standard, RFC 9309 §2.2.2): ``rules`` is a tiny
    ``(prefix, allow)`` table; for each URL path the longest matching
    prefix decides, a length tie goes to allow, and a path matching no
    rule is allowed. Returns ``(id, path, allowed, matched_prefix)``
    with ``matched_prefix`` null for unmatched paths.

    Physical shape: the rule table is BROADCAST and the prefix match is
    a theta join, so the plan is a BroadcastNestedLoopJoin — which is
    the *correct* plan here, not an accident: robots rule sets are
    bounded (tens of rules), every corpus row streams past them once,
    and nothing shuffles. The winner is picked with one
    map-side-combined ``max(struct(len, allow, prefix))`` aggregation —
    struct comparison is field-ordered, so max = longest prefix, then
    allow=true on ties — rather than a window, keeping per-key state at
    one struct."""
    matched = df.select(F.col(id_col), F.col(path_col)).join(
        F.broadcast(rules.select("prefix", "allow")),
        F.col(path_col).startswith(F.col("prefix")),
        "left",
    )
    winner = F.max(
        F.struct(
            F.length("prefix").alias("plen"),
            F.col("allow"),
            F.col("prefix"),
        )
    ).alias("win")
    return (
        matched.groupBy(id_col, path_col)
        .agg(winner)
        .select(
            F.col(id_col),
            F.col(path_col),
            F.coalesce(F.col("win.allow"), F.lit(True)).alias("allowed"),
            F.col("win.prefix").alias("matched_prefix"),
        )
    )


def domain_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 3,
    block_below_bp: int = 3000,
) -> DataFrame:
    """Per-domain quality rollup — how domain blocklists are actually
    BUILT (the inverse of robots_filter, which consumes one): every
    document contributes its integer quality score to every domain its
    text links to; domains seen in ``min_docs``+ documents get a mean
    score and a block verdict. Curated lists (UT1, Blacklists UdS) are
    seeded exactly this way, from per-domain quality mass, then
    human-reviewed — the ``blocked`` column is the review queue.

    Emits ``(domain, n_docs, mean_quality_bp, blocked)`` with the mean
    in half-up basis points (exact integer division, replayable). A
    document linking the same domain twice counts ONCE (distinct per
    (doc, domain) — one spammy page cannot stuff its own domain's
    sample size).

    Shape: quality scoring is scan-fused column math
    (text_stats.quality_score contract); domains ride one
    regexp_extract_all + explode; the rollup is one map-side-combined
    groupBy(domain) over (domain, quality_bp) pairs — payloads never
    shuffle. The distinct collapses on the same (doc, domain) exchange
    AQE plans for the groupBy."""
    from .text_stats import quality_score

    q = quality_score(docs, text_col, id_col).select(id_col, "quality_bp")
    doms = docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                text_col, F.lit(r"https?://([A-Za-z0-9.-]+)"), 1
            )
        ).alias("domain"),
    ).distinct()
    per = doms.join(q, id_col).groupBy("domain").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("quality_bp").cast("long").alias("_total_bp"),
    )
    mean_bp = F.floor(
        (F.lit(2) * F.col("_total_bp") + F.col("n_docs"))
        / (F.lit(2) * F.col("n_docs"))
    ).cast("long")
    return (
        per.filter(F.col("n_docs") >= min_docs)
        .select(
            "domain",
            "n_docs",
            mean_bp.alias("mean_quality_bp"),
            (mean_bp < block_below_bp).alias("blocked"),
        )
    )


def url_frontier(
    candidates: DataFrame,
    url_col: str = "url",
    priority_col: str = "priority",
    per_host_cap: int | None = None,
) -> DataFrame:
    """Politeness-scheduled crawl frontier: assign every candidate URL
    a ``wave`` — the fetch round in which a crawler that takes at most
    ONE URL per host per round (the RFC-politeness contract) reaches
    it. Fetchers drain wave 1 across all hosts in parallel, then wave
    2, …: host-level politeness holds by construction while cross-host
    parallelism stays maximal, and the wave number is a pure function
    of the data — two schedulers over the same frontier agree.

    Within a host, order is ``(priority DESC, url)`` — integer
    priorities (a PageRank bucket, a quality tier), url as the total
    tiebreak. ``per_host_cap`` drops everything past the first N waves
    of a host (crawl-budget enforcement); null urls are dropped, null
    priorities sort last (priority of a URL nobody scored is lowest).

    Output: ``(url, host, wave, priority)``, one row per kept URL.

    Scale shape: ONE window partitioned by host — politeness is
    per-host by definition, so the window key is the natural partition
    key and no global funnel exists. Host skew (a 10^8-URL host) is
    real but bounded by ``per_host_cap``: enforcing the budget inside
    the window keeps the skewed host's tail from ever leaving its
    partition. Shuffle volume is (url, host, priority) — no payloads."""
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)
    )
    s = (
        candidates.select(
            F.col(url_col).alias("url"),
            F.col(priority_col).cast("long").alias("priority"),
        )
        .filter(F.col("url").isNotNull())
        .withColumn("host", host)
        .filter(F.col("host") != "")
    )
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc_nulls_last(), F.col("url")
    )
    ranked = s.withColumn("wave", F.row_number().over(w).cast("long"))
    if per_host_cap is not None:
        ranked = ranked.filter(F.col("wave") <= per_host_cap)
    return ranked.select("url", "host", "wave", "priority")
