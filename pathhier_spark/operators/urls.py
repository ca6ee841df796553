"""URL canonicalization + URL-keyed dedup — web-corpus plumbing the
reference never needed (its inputs are curated databases) but any
Common-Crawl-scale ingest does: the same page arrives under dozens of URL
spellings (case-variant scheme/host, default ports, tracking parameters,
fragments), and canonicalizing before dedup collapses them without touching
page content.

Everything is pure column expressions (map-only, scan speed) with
engine-portable regexes (identical semantics under Java regex and RE2), so
the whole chain carries a full DuckDB value oracle (q43).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# query parameters dropped during canonicalization: tracking/attribution
# noise that changes nothing about the fetched content
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s)-style URL:

      * scheme and host lowercased (path/query case is significant and kept)
      * default ports dropped (http:80, https:443); explicit others kept
      * fragment dropped (client-side only)
      * tracking query parameters removed (TRACKING_PARAM_RE), remaining
        parameters kept in their original order
      * empty path becomes '/'

    A value without a scheme separator is returned unchanged — relative
    references have no canonical absolute form without a base URL."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    rest = F.regexp_replace(url, _SCHEME_RE, "")
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    after_host = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_extract(after_host, r"^([^?#]*)", 1)
    query = F.regexp_extract(after_host, r"\?([^#]*)", 1)

    keep_port = F.when(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == ""),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    kept_params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(kept_params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        keep_port,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return F.when(scheme == "", url).otherwise(canon)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the first (minimum-id) row per canonical URL; output adds
    (canon_url, dup_count). Same combiner-friendly scale shape as
    exact_dedup (operators/dedup.py — min/count agg over two narrow
    columns, NULL-safe join-back, winner-only collapse): a window over
    canon_url would funnel a hot URL's every copy through one task.
    Canonicalization itself is map-only, so the only shuffle is the
    narrow winner aggregation."""
    from pathhier_spark.operators.dedup import exact_dedup

    with_canon = df.withColumn("canon_url", canonical_url(F.col(url_col)))
    out = exact_dedup(with_canon, text_col="canon_url", id_col=id_col)
    return out.withColumnRenamed("content_hash", "canon_hash")


def url_host(url: Column) -> Column:
    """Lowercased host of an absolute URL ('' when no scheme separator —
    a relative reference has no host)."""
    rest = F.regexp_replace(url, _SCHEME_RE, "")
    host = F.lower(F.regexp_extract(rest, r"^([^:/?#]*)", 1))
    return F.when(
        F.regexp_extract(url, _SCHEME_RE, 1) == "", F.lit("")
    ).otherwise(host)


def domain_stats(
    df: DataFrame,
    *,
    url_col: str = "url",
    chars_col: str = "n_chars",
    min_docs: int = 2,
    min_mean_chars: float = 50.0,
) -> DataFrame:
    """Per-domain (host) corpus statistics + a keep/drop curation decision —
    domain-level filtering, the coarsest and cheapest lever in web-corpus
    curation (one bad domain can contribute millions of junk pages; domain
    verdicts are made once on a tiny aggregate, then applied as a
    broadcast-able filter during ingest).

    Output per host: n_docs, n_urls (distinct canonical URLs — the
    crawl-frequency vs content-breadth signal), total/mean chars, and
    `keep` (enough docs AND long-enough pages). Plan: host extraction is
    map-only; distinct-URL counting is a two-level combiner-friendly
    aggregate (groupBy(host, canon_url) partial, then groupBy(host)) so
    no count-distinct state explosion; the result is domain-cardinality
    sized — small enough to broadcast back against the corpus."""
    # host from the RAW url, not the canonical one: url_host lowercases and
    # strips the port itself, so the result is identical either way and the
    # canonical string isn't re-parsed per row
    with_host = df.withColumn(
        "canon_url", canonical_url(F.col(url_col))
    ).withColumn("host", url_host(F.col(url_col)))
    per_url = with_host.groupBy("host", "canon_url").agg(
        F.count(F.lit(1)).alias("n_docs_url"),
        F.sum(F.col(chars_col).cast("long")).alias("chars_url"),
    )
    out = per_url.groupBy("host").agg(
        F.sum("n_docs_url").alias("n_docs"),
        F.count(F.lit(1)).alias("n_urls"),
        F.sum("chars_url").alias("total_chars"),
    )
    mean_chars = F.col("total_chars").cast("double") / F.col("n_docs")
    return out.select(
        "host",
        "n_docs",
        "n_urls",
        "total_chars",
        mean_chars.alias("mean_chars"),
        (
            (F.col("n_docs") >= F.lit(min_docs))
            & (mean_chars >= F.lit(float(min_mean_chars)))
        ).alias("keep"),
    )


HREF_RE = r'href="([^"]*)"'

# full <a ...>text</a> elements; group 1 = href, group 2 = inner text
# (nested-markup anchors fall outside [^<]* and are skipped — the same
# minimal-resolution stance as anchor_host_edges's href rules)
ANCHOR_RE = r'<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>'


def _resolve_dst_host(href, src_host):
    """Shared href→host resolution (anchor_host_edges semantics, pinned in
    tests/test_web_profile_ops.py): absolute → its host; protocol-relative
    → that host lowercased, port stripped; path-relative → the source
    host."""
    return (
        F.when(F.regexp_extract(href, _SCHEME_RE, 1) != "", url_host(href))
        .when(
            href.startswith("//"),
            F.lower(F.regexp_extract(href, r"^//([^:/?#]*)", 1)),
        )
        .otherwise(src_host)
    )


def anchor_host_edges(
    df: DataFrame,
    *,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Host-level link graph from raw HTML anchors — the web-KG edge
    extractor: every `href="..."` in a page becomes a (src_host, dst_host)
    edge, aggregated to (src_host, dst_host, internal, n_links). This is
    the Common-Crawl "web graph" construction step that feeds PageRank/HITS
    (q51/q57/q84 consume exactly this edge shape) and domain-curation
    joins (domain_stats): the reference links entities inside curated
    databases; a crawl links *hosts*, and the anchor graph is the only
    structure the crawl itself provides.

    Resolution rules (deliberately minimal and engine-portable):
      * absolute hrefs (with a scheme) -> url_host(href);
      * protocol-relative hrefs (`//host/path` — ubiquitous in real crawl
        HTML for CDN links) carry an explicit host: that host, lowercased,
        port stripped — NOT a self-edge;
      * path-relative hrefs resolve to the SOURCE host (we only build a
        host graph, so a same-host reference collapses to src_host — no
        path resolution needed);
      * empty hrefs are dropped;
      * `internal` = (dst_host == src_host); self-edges are kept but
        flagged, so PageRank callers can filter them in one predicate.

    Scale shape: extraction is regexp_extract_all + explode (map-only,
    scan speed, no Python); the only shuffle is the final combiner-friendly
    groupBy on (src_host, dst_host) whose cardinality is the host-pair
    graph, orders of magnitude below the page count. Hot hosts (every page
    links the same CDN) are exactly the keys map-side combining collapses
    before the shuffle."""
    src = url_host(F.col(url_col))
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(HREF_RE), F.lit(1))
    exploded = df.select(
        src.alias("src_host"), F.explode(hrefs).alias("href")
    ).where(F.col("href") != "")
    edges = exploded.select(
        "src_host",
        _resolve_dst_host(F.col("href"), F.col("src_host")).alias("dst_host"),
    ).where(F.col("dst_host") != "")
    return (
        edges.groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
        .select(
            "src_host",
            "dst_host",
            (F.col("dst_host") == F.col("src_host")).alias("internal"),
            "n_links",
        )
    )


def frontier_schedule(
    urls: DataFrame,
    *,
    url_col: str = "url",
    delay: int = 16,
    priority_col: str | None = None,
) -> DataFrame:
    """Crawl-frontier politeness scheduling: assign every URL a fetch
    slot such that two fetches against the SAME host are always >= delay
    slots apart — the per-host rate limit every polite crawler enforces —
    while different hosts interleave freely to keep the fetch fleet
    saturated. Each host starts at offset md5(host) % delay so hosts do
    not burst in lockstep at slot 0 (the thundering-herd smear).

    slot = offset(host) + (rank_within_host - 1) * delay, where rank is
    a row_number PARTITIONED BY HOST ordered by (priority, url) — the
    window parallelizes across hosts, and hosts are the natural crawl
    unit so no partition is ever data-sized. A host with k URLs finishes
    at slot ~k*delay regardless of corpus size: the schedule length is
    max per-host queue depth, not total URLs. Output: (url, host, slot).
    """
    host = url_host(F.col(url_col)).alias("host")
    order = [F.col(priority_col)] if priority_col else []
    order.append(F.col("url"))
    w = Window.partitionBy("host").orderBy(*order)
    offset = (
        F.conv(F.substring(F.md5(F.col("host")), 1, 8), 16, 10).cast("long")
        % delay
    )
    cols = [F.col(url_col).alias("url"), host]
    if priority_col:
        cols.append(F.col(priority_col))
    return (
        urls.select(*cols)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "url",
            "host",
            (offset + (F.col("rank") - 1) * delay).alias("slot"),
        )
    )


def url_prefix_filter(
    urls: DataFrame,
    rules: DataFrame,
    *,
    url_col: str = "url",
) -> DataFrame:
    """robots.txt-style longest-prefix-wins URL filtering: each rule is
    (prefix, allow 0/1); a URL's verdict comes from the LONGEST matching
    prefix (the robots.txt precedence rule), defaulting to allow when
    nothing matches. The rule set is crawl-config-sized (thousands), so
    it BROADCASTS; the match is a broadcast theta join on
    startswith(prefix) followed by ONE max_by per URL — one combiner
    groupBy, no window, and the corpus side never shuffles on anything
    but its own key.

    The argmax orders by the prefix STRING alone, which IS
    longest-prefix-wins: every rule matching a given URL is a prefix of
    that URL, so any two matching prefixes are prefixes of EACH OTHER —
    the longer is lexicographically greater, and equal-length distinct
    matches cannot exist. Output: input columns + (matched_prefix,
    allowed)."""
    r = rules.select(
        F.col("prefix"),
        F.col("allow").cast("long").alias("allow"),
    )
    matched = (
        urls.join(
            F.broadcast(r),
            F.col(url_col).startswith(F.col("prefix")),
            "left",
        )
        .groupBy(url_col)
        .agg(
            F.max_by(
                F.struct("prefix", "allow"), F.col("prefix")
            ).alias("win"),
        )
    )
    return matched.select(
        url_col,
        F.col("win.prefix").alias("matched_prefix"),
        F.coalesce(F.col("win.allow"), F.lit(1)).alias("allowed"),
    )


def anchor_text_dictionary(
    df: DataFrame,
    *,
    html_col: str = "html",
    url_col: str = "url",
    top: int = 5,
    min_refs: int = 1,
) -> DataFrame:
    """Anchor-text dictionary: the top external anchor phrases pointing at
    each host — "what the rest of the web calls this entity", the classic
    web-KG naming signal (anchor text has powered entity-name dictionaries
    since early search engines; it is exactly the kind of name/synonym
    evidence the reference's ontology dictionary supplies from curated
    databases, here mined from the crawl itself). Feeds the linking stage
    as extra alias rows per target host.

    Per ``ANCHOR_RE`` anchor: href resolves through the SAME rules as
    anchor_host_edges (shared ``_resolve_dst_host``); the inner text is
    normalized (lowercase, whitespace collapsed, trimmed). Only EXTERNAL
    anchors count (dst_host != src_host) — self-descriptions are navigation
    boilerplate, third-party descriptions are names; empty phrases and
    empty hrefs are dropped.

    Scale shape: extraction is regexp_extract_all + explode (map-only);
    the (dst_host, phrase) count is one combiner-friendly groupBy; the
    per-host top-k is a row_number window over the COUNT table (one
    shuffle on dst_host, never corpus rows). Hub hosts with millions of
    distinct singleton phrases are the skew case: ``min_refs`` prunes
    phrases below the threshold BEFORE the window (map-side, after the
    combiner), which is the lever at crawl scale — a phrase seen once is
    not a name. Output: (dst_host, phrase, n_refs, rnk), rnk 1..top by
    (n_refs DESC, phrase ASC) — a deterministic total order per host.
    """
    src = url_host(F.col(url_col))
    anchors = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), F.lit(0))
    exploded = df.select(
        src.alias("src_host"), F.explode(anchors).alias("m")
    ).select(
        "src_host",
        F.regexp_extract(F.col("m"), ANCHOR_RE, 1).alias("href"),
        F.trim(
            F.lower(
                F.regexp_replace(
                    F.regexp_extract(F.col("m"), ANCHOR_RE, 2),
                    r"\s+",
                    " ",
                )
            )
        ).alias("phrase"),
    ).where((F.col("href") != "") & (F.col("phrase") != ""))
    ext = exploded.select(
        _resolve_dst_host(F.col("href"), F.col("src_host")).alias("dst_host"),
        "src_host",
        "phrase",
    ).where(
        (F.col("dst_host") != "") & (F.col("dst_host") != F.col("src_host"))
    )
    counts = (
        ext.groupBy("dst_host", "phrase")
        .agg(F.count(F.lit(1)).alias("n_refs"))
        .filter(F.col("n_refs") >= F.lit(int(min_refs)))
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.desc("n_refs"), F.asc("phrase")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= F.lit(int(top)))
        .select("dst_host", "phrase", "n_refs", "rnk")
    )
