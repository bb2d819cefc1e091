"""Canonical-URL recrawl deduplication over the raw pages table.

Web crawls re-fetch the same resource under many spellings — scheme
casing, ``www.`` prefixes, default ports, trailing slashes, tracking
query strings, fragments.  Every production curation pipeline (C4,
CCNet, RefinedWeb §3.1) collapses these BEFORE content processing,
because it is the cheapest dedup there is: the decision reads only the
``url`` and ``warc_ts`` columns — the HTML payload never leaves
storage (cf. the reference's per-document upsert, which keys raw
``url`` only, ingestMD.py's MERGE-by-url).

Canonicalization (every step an RE2 regex, mirrored verbatim in the
DuckDB oracle):

  1. split ``scheme://host/path`` (query + fragment DROPPED — the
     aggressive recrawl convention; param-preserving variants belong
     to a politeness layer, not dedup);
  2. host: lowercase, strip leading ``www.``, strip default ports
     ``:80`` / ``:443`` (scheme is dropped with the split, so http
     and https recrawls collapse);
  3. path: strip trailing slashes (kept case-sensitive);
  4. URLs with no ``scheme://`` prefix canonicalize to their
     lowercased whole form.

Dedup keeps the EARLIEST crawl per canonical URL (ties broken by raw
url byte order) via a single min aggregate over the sort key
``strftime(ts) || '|' || url`` — one count+min hash aggregate, one
exchange, no shuffle of page payloads.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from neo4j_document_pipeline_ray.stages.grouped import (
    broadcast_join,
    hash_aggregate,
    partitioned_group_map,
)

_SPLIT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?P<host>[^/?#]+)(?P<path>[^?#]*)"
_TS_FMT = "%Y-%m-%d %H:%M:%S"  # fixed 19 chars; floor-to-second both sides


def canonicalize_urls(urls: "pa.ChunkedArray | pa.Array") -> "pa.Array":
    """Vectorized canonical form of a string array of URLs."""
    ex = pc.extract_regex(urls, _SPLIT_RE)
    host = pc.fill_null(pc.struct_field(ex, "host"), "")
    path = pc.fill_null(pc.struct_field(ex, "path"), "")
    host = pc.utf8_lower(host)
    host = pc.replace_substring_regex(host, r"^www\.", "")
    host = pc.replace_substring_regex(host, r":(80|443)$", "")
    path = pc.replace_substring_regex(path, r"/+$", "")
    canon = pc.binary_join_element_wise(host, path, "")
    return pc.if_else(pc.equal(host, ""), pc.utf8_lower(urls), canon)


def _canon_batch(t: pa.Table) -> pa.Table:
    sec = pc.floor_temporal(t["warc_ts"], unit="second").cast(
        pa.timestamp("s"))
    sortkey = pc.binary_join_element_wise(
        pc.strftime(sec, format=_TS_FMT), t["url"], "|")
    return pa.table({
        "canon_url": canonicalize_urls(t["url"]),
        "k": sortkey,
    })


def url_dedup(pages: "ray.data.Dataset",
              num_partitions: "int | None" = None) -> "ray.data.Dataset":
    """Per canonical URL: page count and the kept (earliest) crawl.
    ``pages`` needs only ``url`` + ``warc_ts`` columns."""
    base = pages.map_batches(_canon_batch, batch_format="pyarrow")
    agg = hash_aggregate(base, "canon_url", [
        (None, "count", "n_pages"),
        ("k", "min", "k"),
    ], num_partitions=num_partitions)

    def split(t: pa.Table) -> pa.Table:
        return pa.table({
            "canon_url": t["canon_url"],
            "n_pages": t["n_pages"],
            "kept_url": pc.utf8_slice_codeunits(t["k"], 20),
            "first_ts": pc.utf8_slice_codeunits(t["k"], 0, 19),
        })

    return agg.map_batches(split, batch_format="pyarrow")


_HREF_RE = None  # compiled lazily (workers import this module cold)
_ABS_RE = None


def extract_links_batch(t: pa.Table) -> pa.Table:
    """One row per ``<a href>`` of each page: ``(src_url, href,
    dst_url)`` with ``dst_url`` resolved to absolute form.

    The hyperlink-graph construction primitive (host rank, anchor
    mining, crawl frontier all start here).  Multi-match extraction
    has no Arrow kernel, so the findall runs per row with a compiled
    module-level regex — same cost class as the HTML text parser
    stage, embarrassingly parallel.  Resolution rules (mirrored
    verbatim in :func:`links_sql`):

      * ``scheme://...``                    kept as-is;
      * ``//host/...``   protocol-relative: ``https:`` prepended;
      * ``/path``        root-relative: page origin prepended;
      * ``#...`` / ``javascript:`` / ``mailto:``  dropped;
      * anything else    relative: resolved against the page's
        directory (``regexp_replace(url, '[^/]*$', '')``).
    """
    import re

    global _HREF_RE, _ABS_RE
    if _HREF_RE is None:
        _HREF_RE = re.compile(r"<a\s[^>]*href=['\"]?([^'\">\s]+)")
        _ABS_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
    src, href, dst = [], [], []
    urls = t["url"].to_pylist()
    for url, html in zip(urls, t["html"].to_pylist()):
        base = re.sub(r"[^/]*$", "", url)
        origin_m = _ABS_RE.match(url)
        origin = ""
        if origin_m:
            end = url.find("/", origin_m.end())
            origin = url if end < 0 else url[:end]
        for h in _HREF_RE.findall(html.decode("utf-8")):
            hl = h.lower()
            if h.startswith("#") or hl.startswith(("javascript:",
                                                   "mailto:")):
                continue
            if _ABS_RE.match(h):
                d = h
            elif h.startswith("//"):
                d = "https:" + h
            elif h.startswith("/"):
                d = origin + h
            else:
                d = base + h
            src.append(url)
            href.append(h)
            dst.append(d)
    return pa.table({
        "src_url": pa.array(src, pa.string()),
        "href": pa.array(href, pa.string()),
        "dst_url": pa.array(dst, pa.string()),
    })


def page_links(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    """Hyperlink edge list of a pages Dataset (``url`` + ``html``)."""
    return pages.map_batches(extract_links_batch, batch_format="pyarrow")


def links_sql(pages_glob: str) -> str:
    """DuckDB mirror of :func:`extract_links_batch` — identical href
    regex (group 1 of ``regexp_extract_all``) and resolution CASE."""
    return f"""
    WITH l AS (
        SELECT url AS src_url,
               unnest(regexp_extract_all(decode(html),
                   '<a\\s[^>]*href=[''"]?([^''">\\s]+)', 1)) AS href
        FROM read_parquet('{pages_glob}')
    )
    SELECT src_url, href,
           CASE
             WHEN regexp_matches(href, '^[a-zA-Z][a-zA-Z0-9+.-]*://')
                  THEN href
             WHEN href LIKE '//%' THEN 'https:' || href
             WHEN href LIKE '/%' THEN regexp_extract(src_url,
                  '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)', 1) || href
             ELSE regexp_replace(src_url, '[^/]*$', '') || href
           END AS dst_url
    FROM l
    WHERE NOT (href LIKE '#%' OR lower(href) LIKE 'javascript:%'
               OR lower(href) LIKE 'mailto:%')
    """


_ANCHOR_RE = None


def extract_anchors_batch(t: pa.Table) -> pa.Table:
    """Per ``<a href>...text...</a>``: ``(dst_url, anchor)`` partial
    counts — anchor-text mining, the classic external naming signal
    for a page (search engines and web KGs weight anchor terms above
    on-page text).  Anchor normalization: whitespace-collapsed,
    trimmed, lowercased; empty anchors and fragment/mailto/javascript
    hrefs dropped.  Resolution shares :func:`extract_links_batch`'s
    rules."""
    import re

    global _ANCHOR_RE, _ABS_RE
    if _ANCHOR_RE is None:
        _ANCHOR_RE = re.compile(
            r"<a\s[^>]*href=['\"]?([^'\">\s]+)[^>]*>([^<]*)</a>")
        if _ABS_RE is None:
            _ABS_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
    counts: dict = {}
    for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        base = re.sub(r"[^/]*$", "", url)
        origin_m = _ABS_RE.match(url)
        origin = ""
        if origin_m:
            end = url.find("/", origin_m.end())
            origin = url if end < 0 else url[:end]
        for h, anchor in _ANCHOR_RE.findall(html.decode("utf-8")):
            hl = h.lower()
            if h.startswith("#") or hl.startswith(("javascript:",
                                                   "mailto:")):
                continue
            a = " ".join(anchor.split()).lower()
            if not a:
                continue
            if _ABS_RE.match(h):
                d = h
            elif h.startswith("//"):
                d = "https:" + h
            elif h.startswith("/"):
                d = origin + h
            else:
                d = base + h
            counts[(d, a)] = counts.get((d, a), 0) + 1
    keys = sorted(counts)
    return pa.table({
        "dst_url": pa.array([k[0] for k in keys], pa.string()),
        "anchor": pa.array([k[1] for k in keys], pa.string()),
        "n": pa.array([counts[k] for k in keys], pa.int64()),
    })


def anchor_terms(pages: "ray.data.Dataset", k: int = 100,
                 num_partitions: "int | None" = None) -> "ray.data.Dataset":
    """Global top-k (dst_url, anchor) pairs by citation count.  The
    per-batch dict collapse makes the exchange carry (pair, count)
    partials, not individual links."""
    partials = pages.map_batches(extract_anchors_batch,
                                 batch_format="pyarrow")
    agg = hash_aggregate(partials, ["dst_url", "anchor"],
                         [("n", "sum", "n")],
                         num_partitions=num_partitions)
    return agg.sort(["n", "dst_url", "anchor"],
                    descending=[True, False, False]).limit(k)


def anchor_terms_sql(pages_glob: str, k: int = 100) -> str:
    """DuckDB mirror — two aligned ``regexp_extract_all`` group pulls
    zip (href, anchor); the resolution CASE matches links_sql."""
    pat = "'<a\\s[^>]*href=[''\"]?([^''\">\\s]+)[^>]*>([^<]*)</a>'"
    return f"""
    WITH l AS (
        SELECT url AS src_url,
               unnest(regexp_extract_all(decode(html), {pat}, 1)) AS href,
               unnest(regexp_extract_all(decode(html), {pat}, 2)) AS a0
        FROM read_parquet('{pages_glob}')
    ), n AS (
        SELECT CASE
                 WHEN regexp_matches(href,
                      '^[a-zA-Z][a-zA-Z0-9+.-]*://') THEN href
                 WHEN href LIKE '//%' THEN 'https:' || href
                 WHEN href LIKE '/%' THEN regexp_extract(src_url,
                      '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)', 1) || href
                 ELSE regexp_replace(src_url, '[^/]*$', '') || href
               END AS dst_url,
               lower(trim(regexp_replace(a0, '\\s+', ' ', 'g'))) AS anchor
        FROM l
        WHERE NOT (href LIKE '#%' OR lower(href) LIKE 'javascript:%'
                   OR lower(href) LIKE 'mailto:%')
    )
    SELECT dst_url, anchor, CAST(count(*) AS BIGINT) AS n
    FROM n WHERE anchor <> ''
    GROUP BY dst_url, anchor
    ORDER BY n DESC, dst_url, anchor
    LIMIT {k}
    """


def url_dedup_sql(pages_glob: str) -> str:
    """DuckDB mirror — identical regex chain and sort key."""
    return f"""
    WITH c AS (
        SELECT url,
               lower(regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)([^?#]*)', 1))
                   AS host0,
               regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)([^?#]*)', 2)
                   AS path0,
               strftime(warc_ts, '{_TS_FMT}') || '|' || url AS k
        FROM read_parquet('{pages_glob}')
    ), n AS (
        SELECT CASE WHEN host0 = '' THEN lower(url)
                    ELSE regexp_replace(regexp_replace(host0,
                             '^www\\.', ''), ':(80|443)$', '')
                         || regexp_replace(path0, '/+$', '')
               END AS canon_url,
               k
        FROM c
    )
    SELECT canon_url,
           CAST(count(*) AS BIGINT) AS n_pages,
           substr(min(k), 21) AS kept_url,
           substr(min(k), 1, 19) AS first_ts
    FROM n GROUP BY canon_url
    """


def host_of(urls: "pa.ChunkedArray | pa.Array") -> "pa.Array":
    """Normalized host of absolute URLs ('' when not absolute) — the
    host steps of :func:`canonicalize_urls` (lowercase, strip leading
    ``www.``, strip default ports)."""
    ex = pc.extract_regex(urls, _SPLIT_RE)
    host = pc.fill_null(pc.struct_field(ex, "host"), "")
    host = pc.utf8_lower(host)
    host = pc.replace_substring_regex(host, r"^www\.", "")
    return pc.replace_substring_regex(host, r":(80|443)$", "")


def host_graph(pages: "ray.data.Dataset",
               num_partitions: "int | None" = None,
               drop_self: bool = False) -> "ray.data.Dataset":
    """Host-level link graph of the crawl: ``(src_host, dst_host,
    n_links)`` over normalized hosts, non-absolute endpoints dropped —
    the coarsening every web-scale ranking / crawl-scheduling pass
    runs first, because the host graph is orders of magnitude smaller
    than the page graph.  Intra-host links are KEPT by default (they
    dominate real crawls and carry the site-internal navigation
    signal); ``drop_self=True`` gives the cross-host-only coarsening.
    Page-sized work stays in-batch (href findall + host regex); only
    (host-pair, count) partials reach the exchange via
    hash_aggregate."""
    links = page_links(pages)

    def to_hosts(t: pa.Table) -> pa.Table:
        sh, dh = host_of(t["src_url"]), host_of(t["dst_url"])
        tb = pa.table({"src_host": sh, "dst_host": dh})
        keep = pc.and_(pc.not_equal(sh, ""), pc.not_equal(dh, ""))
        if drop_self:
            keep = pc.and_(keep, pc.not_equal(sh, dh))
        return tb.filter(keep)

    return hash_aggregate(
        links.map_batches(to_hosts, batch_format="pyarrow"),
        ["src_host", "dst_host"], [(None, "count", "n_links")],
        num_partitions=num_partitions, adaptive=True)


def host_rank(pages: "ray.data.Dataset", iters: int = 3,
              num_partitions: "int | None" = None) -> "ray.data.Dataset":
    """Integer PageRank over the host graph — the host-authority
    signal crawl schedulers and corpus-quality weights use (cf.
    Common Crawl's harmonic-centrality host ranking).  Hosts get the
    same pure-function ids as entities (``stable_id``, so the DuckDB
    unrolled-PageRank replay hash-matches); the name join-back rides
    broadcast_join's size gate (host table is host-count-sized, never
    link-count-sized).  Returns ``(host, rank_scaled)``."""
    from neo4j_document_pipeline_ray.functions.textnorm import stable_id
    from neo4j_document_pipeline_ray.pipelines.graph_algo import pagerank

    hg = host_graph(pages, num_partitions=num_partitions)

    def to_ids(t: pa.Table) -> pa.Table:
        sh, dh = t["src_host"].to_pylist(), t["dst_host"].to_pylist()
        ids = {h: stable_id(h) for h in set(sh) | set(dh)}
        return pa.table({
            "src_id": pa.array([ids[h] for h in sh], pa.int64()),
            "dst_id": pa.array([ids[h] for h in dh], pa.int64()),
        })

    pr = pagerank(hg.map_batches(to_ids, batch_format="pyarrow"),
                  iters=iters)

    def name_rows(t: pa.Table) -> pa.Table:
        hosts = sorted(set(t["src_host"].to_pylist())
                       | set(t["dst_host"].to_pylist()))
        return pa.table({
            "entity_id": pa.array([stable_id(h) for h in hosts],
                                  pa.int64()),
            "host": pa.array(hosts, pa.string()),
        })

    names = hash_aggregate(
        hg.map_batches(name_rows, batch_format="pyarrow"),
        ["entity_id", "host"], [(None, "count", "_m")],
        num_partitions=num_partitions,
        adaptive=True).drop_columns(["_m"])
    joined = broadcast_join(pr, names, on=("entity_id",),
                            num_partitions=num_partitions)
    return joined.select_columns(["host", "rank_scaled"])


def _typed_head(head: "ray.data.Dataset") -> pa.Table:
    """k-sized driver conversion of a top-k report to a TYPED arrow
    table: an empty Ray result loses its schema (schema-less blocks),
    which breaks downstream consumers and the oracle compare on
    corpora where the report is legitimately empty (e.g. no in-corpus
    citations)."""
    rows = head.take_all()
    return pa.table({
        "canon_url": pa.array([r["canon_url"] for r in rows],
                              pa.string()),
        "n_links": pa.array([r["n_links"] for r in rows], pa.int64()),
        "n_hosts": pa.array([r["n_hosts"] for r in rows], pa.int64()),
    })


def crawl_frontier(pages: "ray.data.Dataset", k: int = 100,
                   num_partitions: "int | None" = None,
                   page_urls: "ray.data.Dataset | None" = None
                   ) -> "ray.data.Dataset":
    """Top-k out-linked canonical URLs NOT already in the crawl,
    ranked by citing-host breadth, then citation count, then URL —
    the scheduler's next-fetch list.  The not-in-corpus test is the
    engine's tagged-union anti-join (no all-pairs, no driver set):
    link candidates and the corpus's canonical URLs hash-partition by
    canon_url; each partition subtracts and aggregates with pandas
    vectorized ops.  Only the aggregated frontier reaches the final
    sort+limit head (the anchor_terms convention).

    Pass ``page_urls`` as a url-only pruned read so the corpus side
    never ships HTML payloads; defaults to a column projection of
    ``pages``."""
    import numpy as np

    links = page_links(pages)
    if page_urls is None:
        page_urls = pages.select_columns(["url"])

    def cand(t: pa.Table) -> pa.Table:
        d = canonicalize_urls(t["dst_url"])
        tb = pa.table({
            "canon_url": d,
            "src_host": host_of(t["src_url"]),
            "is_left": pa.array(np.ones(len(d), dtype=bool)),
        })
        return tb.filter(pc.not_equal(d, ""))

    def present(t: pa.Table) -> pa.Table:
        c = pc.unique(canonicalize_urls(t["url"]))
        return pa.table({
            "canon_url": c,
            "src_host": pa.nulls(len(c), pa.string()),
            "is_left": pa.array(np.zeros(len(c), dtype=bool)),
        })

    tagged = links.map_batches(cand, batch_format="pyarrow").union(
        page_urls.map_batches(present, batch_format="pyarrow"))

    def subtract(df):
        import pandas as pd

        seen = df.loc[~df["is_left"], "canon_url"].unique()
        keep = df[df["is_left"] & ~df["canon_url"].isin(seen)]
        g = keep.groupby("canon_url", sort=False).agg(
            n_links=("src_host", "size"),
            n_hosts=("src_host", "nunique"))
        return pd.DataFrame({
            "canon_url": g.index.astype(str),
            "n_links": g["n_links"].astype("int64").values,
            "n_hosts": g["n_hosts"].astype("int64").values,
        })

    agg = partitioned_group_map(tagged, "canon_url", subtract,
                                num_partitions=num_partitions)
    head = agg.sort(["n_hosts", "n_links", "canon_url"],
                    descending=[True, True, False]).limit(k)
    return _typed_head(head)


_SPLIT_SQL = "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)([^?#]*)'"


def host_sql(url_expr: str) -> str:
    """DuckDB expression equal to :func:`host_of` on ``url_expr``."""
    return (f"regexp_replace(regexp_replace(lower(regexp_extract("
            f"{url_expr}, {_SPLIT_SQL}, 1)), '^www\\.', ''), "
            f"':(80|443)$', '')")


def canon_sql(url_expr: str) -> str:
    """DuckDB expression equal to :func:`canonicalize_urls` on
    ``url_expr`` (the url_dedup_sql CASE, inlined for any expr)."""
    return (f"CASE WHEN regexp_extract({url_expr}, {_SPLIT_SQL}, 1) = ''"
            f" THEN lower({url_expr})"
            f" ELSE {host_sql(url_expr)}"
            f" || regexp_replace(regexp_extract({url_expr},"
            f" {_SPLIT_SQL}, 2), '/+$', '') END")


def host_graph_sql(pages_glob: str, drop_self: bool = False) -> str:
    """DuckDB mirror of :func:`host_graph`."""
    self_filter = "AND src_host <> dst_host" if drop_self else ""
    return f"""
    WITH links AS ({links_sql(pages_glob)}),
    h AS (
        SELECT {host_sql('src_url')} AS src_host,
               {host_sql('dst_url')} AS dst_host
        FROM links
    )
    SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n_links
    FROM h
    WHERE src_host <> '' AND dst_host <> '' {self_filter}
    GROUP BY 1, 2
    """


def crawl_frontier_sql(pages_glob: str, k: int = 100) -> str:
    """DuckDB mirror of :func:`crawl_frontier`."""
    return f"""
    WITH links AS ({links_sql(pages_glob)}),
    cand AS (
        SELECT {canon_sql('dst_url')} AS canon_url,
               {host_sql('src_url')} AS src_host
        FROM links
    ),
    corpus AS (
        SELECT DISTINCT {canon_sql('url')} AS canon_url
        FROM read_parquet('{pages_glob}')
    ),
    f AS (
        SELECT canon_url,
               CAST(count(*) AS BIGINT) AS n_links,
               CAST(count(DISTINCT src_host) AS BIGINT) AS n_hosts
        FROM cand
        WHERE canon_url <> ''
          AND canon_url NOT IN (SELECT canon_url FROM corpus)
        GROUP BY canon_url
    )
    SELECT canon_url, n_links, n_hosts
    FROM f ORDER BY n_hosts DESC, n_links DESC, canon_url LIMIT {k}
    """


def host_harmonic(pages: "ray.data.Dataset", hops: int = 3,
                  num_partitions: "int | None" = None) -> "ray.data.Dataset":
    """Approximate harmonic centrality per host — the metric Common
    Crawl's public host ranking actually uses (Boldi/Vigna HyperBall;
    here the engine's KMV-sketch variant, bit-replayable in DuckDB).
    Runs over the UNDIRECTED cross-host graph; hosts with no
    cross-host edges keep the standard isolated-node score 0, so every
    host in the crawl appears exactly once.  Returns
    ``(host, harmonic_scaled)``."""
    from neo4j_document_pipeline_ray.functions.textnorm import stable_id
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        harmonic_centrality_approx,
    )

    hg = host_graph(pages, num_partitions=num_partitions)

    def to_ids(t: pa.Table) -> pa.Table:
        sh, dh = t["src_host"].to_pylist(), t["dst_host"].to_pylist()
        ids = {h: stable_id(h) for h in set(sh) | set(dh)}
        return pa.table({
            "src_id": pa.array([ids[h] for h in sh], pa.int64()),
            "dst_id": pa.array([ids[h] for h in dh], pa.int64()),
        })

    # host-graph-sided pin: the coarsened cross-host edge set (the
    # sketch rounds re-probe it every hop, and an all-intra-host crawl
    # makes it EMPTY — running `hops` rounds of empty exchanges just
    # to learn that costs ~30 s of executor fixed time at sf0.1)
    ids = hg.map_batches(to_ids, batch_format="pyarrow").map_batches(
        lambda t: t.filter(pc.not_equal(t["src_id"], t["dst_id"])),
        batch_format="pyarrow").materialize()

    def name_rows(t: pa.Table) -> pa.Table:
        hosts = sorted(set(t["src_host"].to_pylist())
                       | set(t["dst_host"].to_pylist()))
        return pa.table({
            "entity_id": pa.array([stable_id(h) for h in hosts],
                                  pa.int64()),
            "host": pa.array(hosts, pa.string()),
        })

    names = hash_aggregate(
        hg.map_batches(name_rows, batch_format="pyarrow"),
        ["entity_id", "host"], [(None, "count", "_m")],
        num_partitions=num_partitions,
        adaptive=True).drop_columns(["_m"])

    if ids.count() == 0:
        return names.map_batches(
            lambda t: pa.table({
                "host": t["host"],
                "harmonic_scaled": pa.array([0] * t.num_rows, pa.int64()),
            }), batch_format="pyarrow")

    hc = harmonic_centrality_approx(ids, hops=hops,
                                    num_partitions=num_partitions)
    joined = broadcast_join(names, hc, on=("entity_id",),
                            join_type="left_outer",
                            num_partitions=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t["host"],
            "harmonic_scaled": pc.fill_null(
                pc.cast(t["harmonic_scaled"], pa.int64()), 0),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def page_inlinks(pages: "ray.data.Dataset", k: int = 100,
                 num_partitions: "int | None" = None,
                 page_urls: "ray.data.Dataset | None" = None
                 ) -> "ray.data.Dataset":
    """Top-k IN-corpus citation report — the complement of
    :func:`crawl_frontier`: per crawled canonical URL, how many links
    point at it and from how many distinct hosts (the in-corpus
    authority signal quality weighting uses).  Same tagged-union
    hash-partition shape, with the subtraction inverted to a
    semi-join."""
    import numpy as np

    links = page_links(pages)
    if page_urls is None:
        page_urls = pages.select_columns(["url"])

    def cand(t: pa.Table) -> pa.Table:
        d = canonicalize_urls(t["dst_url"])
        tb = pa.table({
            "canon_url": d,
            "src_host": host_of(t["src_url"]),
            "is_left": pa.array(np.ones(len(d), dtype=bool)),
        })
        return tb.filter(pc.not_equal(d, ""))

    def present(t: pa.Table) -> pa.Table:
        c = pc.unique(canonicalize_urls(t["url"]))
        return pa.table({
            "canon_url": c,
            "src_host": pa.nulls(len(c), pa.string()),
            "is_left": pa.array(np.zeros(len(c), dtype=bool)),
        })

    tagged = links.map_batches(cand, batch_format="pyarrow").union(
        page_urls.map_batches(present, batch_format="pyarrow"))

    def keep_in_corpus(df):
        import pandas as pd

        seen = df.loc[~df["is_left"], "canon_url"].unique()
        keep = df[df["is_left"] & df["canon_url"].isin(seen)]
        g = keep.groupby("canon_url", sort=False).agg(
            n_links=("src_host", "size"),
            n_hosts=("src_host", "nunique"))
        return pd.DataFrame({
            "canon_url": g.index.astype(str),
            "n_links": g["n_links"].astype("int64").values,
            "n_hosts": g["n_hosts"].astype("int64").values,
        })

    agg = partitioned_group_map(tagged, "canon_url", keep_in_corpus,
                                num_partitions=num_partitions)
    head = agg.sort(["n_hosts", "n_links", "canon_url"],
                    descending=[True, True, False]).limit(k)
    return _typed_head(head)


def page_inlinks_sql(pages_glob: str, k: int = 100) -> str:
    """DuckDB mirror of :func:`page_inlinks`."""
    return f"""
    WITH links AS ({links_sql(pages_glob)}),
    cand AS (
        SELECT {canon_sql('dst_url')} AS canon_url,
               {host_sql('src_url')} AS src_host
        FROM links
    ),
    corpus AS (
        SELECT DISTINCT {canon_sql('url')} AS canon_url
        FROM read_parquet('{pages_glob}')
    ),
    f AS (
        SELECT canon_url,
               CAST(count(*) AS BIGINT) AS n_links,
               CAST(count(DISTINCT src_host) AS BIGINT) AS n_hosts
        FROM cand
        WHERE canon_url <> ''
          AND canon_url IN (SELECT canon_url FROM corpus)
        GROUP BY canon_url
    )
    SELECT canon_url, n_links, n_hosts
    FROM f ORDER BY n_hosts DESC, n_links DESC, canon_url LIMIT {k}
    """
