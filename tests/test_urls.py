"""Canonical-URL recrawl dedup (extras/urls.py): canonicalization
rules on messy URLs, earliest-crawl keep semantics, and DuckDB-mirror
parity on a written fixture."""

import datetime

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# four spellings of one resource (differing scheme, case, www, default
# port, trailing slash, query, fragment), one near-miss (real port),
# one path-case variant (distinct), one scheme-less url
FIXTURE = pd.DataFrame({
    "url": [
        "https://www.Example.com:443/a/b/?utm_source=x#frag",
        "http://example.COM/a/b",
        "HTTPS://EXAMPLE.com:443/a/b/",
        "http://www.example.com:80/a/b?session=9",
        "https://example.com:8080/a/b",     # non-default port: distinct
        "https://example.com/A/B",          # path case-sensitive
        "Example.com/plain",                # no scheme
    ],
    "warc_ts": [
        _ts("2024-01-03 10:00:00"),
        _ts("2024-01-01 09:30:00"),   # earliest of the 4-way group
        _ts("2024-01-02 08:00:00"),
        _ts("2024-01-04 07:00:00"),
        _ts("2024-01-05 06:00:00"),
        _ts("2024-01-06 05:00:00"),
        _ts("2024-01-07 04:00:00"),
    ],
})


class TestUrlDedup:
    def test_canonicalization_and_keep(self, ray_session):
        from neo4j_document_pipeline_ray.extras.urls import url_dedup

        got = {r["canon_url"]: r for r in url_dedup(
            ray.data.from_pandas(FIXTURE).repartition(3)).take_all()}
        assert set(got) == {
            "example.com/a/b", "example.com:8080/a/b",
            "example.com/A/B", "example.com/plain",
        }
        g = got["example.com/a/b"]
        assert g["n_pages"] == 4
        assert g["kept_url"] == "http://example.COM/a/b"
        assert g["first_ts"] == "2024-01-01 09:30:00"
        assert got["example.com:8080/a/b"]["n_pages"] == 1

    def test_duckdb_mirror_parity(self, ray_session, tmp_path):
        from neo4j_document_pipeline_ray.extras.urls import (
            url_dedup,
            url_dedup_sql,
        )

        p = str(tmp_path / "pages.parquet")
        pq.write_table(pa.Table.from_pandas(FIXTURE), p)
        got = (url_dedup(ray.data.read_parquet(p)).to_pandas()
               .sort_values("canon_url").reset_index(drop=True))
        want = duckdb.sql(
            url_dedup_sql(p) + " ORDER BY canon_url").df()
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False)

    def test_link_extraction_and_resolution(self, ray_session):
        from neo4j_document_pipeline_ray.extras.urls import page_links

        html = (b"<p><a href='https://other.net/abs'>a</a>"
                b"<a href=\"//cdn.example.com/x\">b</a>"
                b"<a href='/root-rel'>c</a>"
                b"<a href='sibling.html'>d</a>"
                b"<a href='#frag'>e</a>"
                b"<a href='mailto:x@y.z'>f</a>"
                b"<a href='JavaScript:void(0)'>g</a>"
                b"<a href=bare/path>h</a></p>")
        pages = ray.data.from_pandas(pd.DataFrame({
            "url": ["https://www.site.io/dir/page.html"],
            "html": [html],
        }))
        got = page_links(pages).take_all()
        dsts = [r["dst_url"] for r in got]
        assert dsts == [
            "https://other.net/abs",
            "https://cdn.example.com/x",
            "https://www.site.io/root-rel",
            "https://www.site.io/dir/sibling.html",
            "https://www.site.io/dir/bare/path",
        ]

    def test_links_duckdb_mirror_parity(self, ray_session, tmp_path):
        from neo4j_document_pipeline_ray.extras.urls import (
            links_sql,
            page_links,
        )

        df = pd.DataFrame({
            "url": ["https://a.io/d/p.html", "https://b.io/q"],
            "html": [
                b"<a href='/x'>1</a><a href=\"r.html\">2</a>",
                b"<nav><a href='https://a.io/d/p.html'>back</a></nav>"
                b"<a href='#top'>t</a>",
            ],
        })
        p = str(tmp_path / "pages.parquet")
        pq.write_table(pa.Table.from_pandas(df), p)
        got = (page_links(ray.data.read_parquet(p)).to_pandas()
               .sort_values(["src_url", "href"]).reset_index(drop=True))
        want = duckdb.sql(
            links_sql(p) + " ORDER BY src_url, href").df()
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False)

    def test_anchor_terms(self, ray_session):
        from neo4j_document_pipeline_ray.extras.urls import anchor_terms

        pages = ray.data.from_pandas(pd.DataFrame({
            "url": ["https://a.io/p1", "https://a.io/p2"],
            "html": [
                b"<a href='/x'>  Widget   Docs </a>"
                b"<a href='/x'>widget docs</a>"
                b"<a href='/y'></a>"           # empty anchor dropped
                b"<a href='#f'>skip</a>",
                b"<a href='https://a.io/x'>WIDGET DOCS</a>"
                b"<a href='/x'>other name</a>",
            ],
        }))
        got = [(r["dst_url"], r["anchor"], r["n"])
               for r in anchor_terms(pages, k=10).take_all()]
        assert got[0] == ("https://a.io/x", "widget docs", 3)
        assert ("https://a.io/x", "other name", 1) in got
        assert all(a != "" for _, a, _ in got)

    def test_anchor_terms_duckdb_parity(self, ray_session, tmp_path):
        from neo4j_document_pipeline_ray.extras.urls import (
            anchor_terms,
            anchor_terms_sql,
        )

        df = pd.DataFrame({
            "url": ["https://a.io/d/p.html", "https://b.io/q"],
            "html": [
                b"<a href='/x'>One Two</a><a href=\"r.html\">n</a>",
                b"<a href='https://a.io/x'>one  two</a>"
                b"<a href='mailto:z@q.c'>m</a>",
            ],
        })
        p = str(tmp_path / "pages.parquet")
        pq.write_table(pa.Table.from_pandas(df), p)
        got = anchor_terms(ray.data.read_parquet(p), k=10).to_pandas()
        want = duckdb.sql(anchor_terms_sql(p, 10)).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_tie_breaks_by_url_bytes(self, ray_session):
        from neo4j_document_pipeline_ray.extras.urls import url_dedup

        same_ts = pd.DataFrame({
            "url": ["https://t.io/x/", "http://t.io/x"],
            "warc_ts": [_ts("2024-02-02 00:00:00")] * 2,
        })
        (row,) = url_dedup(ray.data.from_pandas(same_ts)).take_all()
        assert row["kept_url"] == "http://t.io/x"  # 'h'<'h'.. http<https


def _multi_host_pages():
    """Three hosts; b/c both cite a; a links within itself and out to
    an uncrawled URL that c also cites."""
    return pd.DataFrame({
        "url": ["https://a.io/p1", "https://a.io/p2",
                "https://b.io/p1", "https://c.io/p1"],
        "html": [
            b"<a href='/p2'>self</a><a href='https://new.net/x'>n</a>",
            b"<a href='/p1'>self</a>",
            b"<a href='https://a.io/p1'>a</a>"
            b"<a href='https://www.A.io/p2'>a2</a>",
            b"<a href='https://a.io/p1'>a</a>"
            b"<a href='https://new.net/x/'>n</a>",
        ],
    })


class TestHostGraph:
    def test_counts_and_normalization(self, ray_session):
        from neo4j_document_pipeline_ray.extras.urls import host_graph

        pages = ray.data.from_pandas(_multi_host_pages()).repartition(2)
        got = {(r["src_host"], r["dst_host"]): r["n_links"]
               for r in host_graph(pages).take_all()}
        # www.A.io normalizes to a.io, self-host links kept
        assert got == {
            ("a.io", "a.io"): 2, ("a.io", "new.net"): 1,
            ("b.io", "a.io"): 2, ("c.io", "a.io"): 1,
            ("c.io", "new.net"): 1,
        }

    def test_drop_self(self, ray_session):
        from neo4j_document_pipeline_ray.extras.urls import host_graph

        pages = ray.data.from_pandas(_multi_host_pages())
        got = {(r["src_host"], r["dst_host"])
               for r in host_graph(pages, drop_self=True).take_all()}
        assert ("a.io", "a.io") not in got
        assert ("b.io", "a.io") in got

    def test_duckdb_mirror_parity(self, ray_session, tmp_path):
        import duckdb

        from neo4j_document_pipeline_ray.extras.urls import (
            host_graph,
            host_graph_sql,
        )

        p = str(tmp_path / "pages.parquet")
        pq.write_table(pa.Table.from_pandas(_multi_host_pages()), p)
        got = (host_graph(ray.data.read_parquet(p)).to_pandas()
               .sort_values(["src_host", "dst_host"])
               .reset_index(drop=True))
        want = duckdb.sql(
            host_graph_sql(p) + " ORDER BY src_host, dst_host").df()
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False)


class TestHostRank:
    def test_rank_orders_cited_host_first(self, ray_session):
        from neo4j_document_pipeline_ray.extras.urls import host_rank

        pages = ray.data.from_pandas(_multi_host_pages()).repartition(2)
        rows = {r["host"]: r["rank_scaled"]
                for r in host_rank(pages).take_all()}
        assert set(rows) == {"a.io", "b.io", "c.io", "new.net"}
        # a.io is cited by two hosts (+ itself); it must out-rank the
        # never-cited b.io and c.io
        assert rows["a.io"] > rows["b.io"]
        assert rows["a.io"] > rows["c.io"]

    def test_matches_integer_pagerank_reference(self, ray_session):
        from neo4j_document_pipeline_ray.extras.urls import host_rank
        from neo4j_document_pipeline_ray.functions.textnorm import (
            stable_id,
        )
        from neo4j_document_pipeline_ray.pipelines.graph_algo import (
            pagerank_reference,
        )

        pages = ray.data.from_pandas(_multi_host_pages())
        got = {r["host"]: r["rank_scaled"]
               for r in host_rank(pages).take_all()}
        hosts = ["a.io", "b.io", "c.io", "new.net"]
        ids = {h: stable_id(h) for h in hosts}
        pairs = {(ids["a.io"], ids["a.io"]), (ids["a.io"], ids["new.net"]),
                 (ids["b.io"], ids["a.io"]), (ids["c.io"], ids["a.io"]),
                 (ids["c.io"], ids["new.net"])}
        want = pagerank_reference(sorted(pairs), iters=3)
        assert {ids[h]: v for h, v in got.items()} == want


class TestCrawlFrontier:
    def test_frontier_excludes_crawled(self, ray_session):
        from neo4j_document_pipeline_ray.extras.urls import crawl_frontier

        pages = ray.data.from_pandas(_multi_host_pages()).repartition(2)
        rows = crawl_frontier(pages, k=10).to_pylist()
        by_url = {r["canon_url"]: r for r in rows}
        # crawled pages never appear, even when cited
        assert "a.io/p1" not in by_url and "a.io/p2" not in by_url
        # new.net/x cited by 2 hosts (trailing slash canonicalizes)
        assert by_url["new.net/x"]["n_links"] == 2
        assert by_url["new.net/x"]["n_hosts"] == 2
        # ranked first by host breadth
        assert rows[0]["canon_url"] == "new.net/x"

    def test_duckdb_mirror_parity(self, ray_session, tmp_path):
        import duckdb

        from neo4j_document_pipeline_ray.extras.urls import (
            crawl_frontier,
            crawl_frontier_sql,
        )

        p = str(tmp_path / "pages.parquet")
        pq.write_table(pa.Table.from_pandas(_multi_host_pages()), p)
        got = crawl_frontier(ray.data.read_parquet(p), k=5).to_pandas()
        want = duckdb.sql(crawl_frontier_sql(p, k=5)).df()
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False)


class TestHostHarmonic:
    def test_hub_ranks_first_and_total_over_hosts(self, ray_session):
        from neo4j_document_pipeline_ray.extras.urls import host_harmonic

        pages = ray.data.from_pandas(_multi_host_pages()).repartition(2)
        rows = {r["host"]: r["harmonic_scaled"]
                for r in host_harmonic(pages).take_all()}
        # every host appears exactly once; a.io is the cross-host hub
        assert set(rows) == {"a.io", "b.io", "c.io", "new.net"}
        assert rows["a.io"] == max(rows.values())
        assert all(v >= 0 for v in rows.values())

    def test_isolated_hosts_score_zero(self, ray_session):
        # single-host crawl: no cross-host edges, isolated score 0
        from neo4j_document_pipeline_ray.extras.urls import host_harmonic

        pages = ray.data.from_pandas(pd.DataFrame({
            "url": ["https://solo.io/p1", "https://solo.io/p2"],
            "html": [b"<a href='/p2'>x</a>", b"<a href='/p1'>y</a>"],
        }))
        assert host_harmonic(pages).take_all() == [
            {"host": "solo.io", "harmonic_scaled": 0}]

    def test_duckdb_mirror_parity(self, ray_session, tmp_path):
        import duckdb

        import __ray_entry__ as entry
        from neo4j_document_pipeline_ray.extras.urls import host_harmonic

        p = str(tmp_path / "pages.parquet")
        pq.write_table(pa.Table.from_pandas(_multi_host_pages()), p)
        got = (host_harmonic(ray.data.read_parquet(p)).to_pandas()
               .sort_values("host").reset_index(drop=True))
        want = duckdb.sql(
            entry._host_harmonic_sql(p) + " ORDER BY host").df()
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False)


class TestPageInlinks:
    def test_in_corpus_citations_only(self, ray_session):
        from neo4j_document_pipeline_ray.extras.urls import page_inlinks

        pages = ray.data.from_pandas(_multi_host_pages()).repartition(2)
        rows = page_inlinks(pages, k=10).to_pylist()
        by_url = {r["canon_url"]: r for r in rows}
        # the uncrawled new.net/x never appears (that's the frontier's)
        assert "new.net/x" not in by_url
        # a.io/p1 cited by a.io (self, from /p2), b.io and c.io
        assert by_url["a.io/p1"]["n_links"] == 3
        assert by_url["a.io/p1"]["n_hosts"] == 3
        # a.io/p2 cited by a.io (self) and b.io (www-normalized)
        assert by_url["a.io/p2"]["n_links"] == 2
        assert by_url["a.io/p2"]["n_hosts"] == 2
        assert rows[0]["canon_url"] in ("a.io/p1", "a.io/p2")

    def test_duckdb_mirror_parity(self, ray_session, tmp_path):
        import duckdb

        from neo4j_document_pipeline_ray.extras.urls import (
            page_inlinks,
            page_inlinks_sql,
        )

        p = str(tmp_path / "pages.parquet")
        pq.write_table(pa.Table.from_pandas(_multi_host_pages()), p)
        got = page_inlinks(ray.data.read_parquet(p), k=5).to_pandas()
        want = duckdb.sql(page_inlinks_sql(p, k=5)).df()
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False)
