"""Cross-document duplicated n-gram stats (extras/dupgrams.py):
distributed result vs the pure-Python replay, hand-built fixtures with
known spans, and a direct DuckDB-mirror parity check."""

import duckdb
import pandas as pd
import pytest

import ray.data

SF = "/root/testdata/sf0.001"

# doc 1 and 2 share an 8-word span (4 consecutive dup 5-grams); doc 3
# repeats a phrase WITHIN itself only (must NOT count — cross-doc df
# is 1); doc 4 is too short for any 5-gram (absent from output).
FIXTURE = [
    (1, "alpha beta gamma delta epsilon zeta eta theta unique one two"),
    (2, "prefix alpha beta gamma delta epsilon zeta eta theta suffix"),
    (3, "red blue green red blue green red blue green red blue green"),
    (4, "tiny doc"),
    (5, "wholly distinct words nowhere else repeated in this corpus"),
]


def _ds(rows):
    return ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
    )).repartition(3)


class TestDupNgrams:
    def test_fixture_matches_reference(self, ray_session):
        from neo4j_document_pipeline_ray.extras.dupgrams import (
            dup_ngram_reference,
            dup_ngram_stats,
        )

        got = {
            r["doc_id"]: (r["n_grams"], r["n_dup_grams"],
                          r["dup_rate_scaled"], r["max_dup_run"])
            for r in dup_ngram_stats(_ds(FIXTURE), num_partitions=4)
            .take_all()
        }
        assert got == dup_ngram_reference(FIXTURE)

    def test_known_spans(self, ray_session):
        from neo4j_document_pipeline_ray.extras.dupgrams import (
            dup_ngram_stats,
        )

        got = {
            r["doc_id"]: r
            for r in dup_ngram_stats(_ds(FIXTURE), num_partitions=4)
            .take_all()
        }
        assert 4 not in got  # shorter than the window: no grams
        # docs 1/2 share "alpha .. theta" (8 words = 4 shared 5-grams)
        assert got[1]["n_dup_grams"] == 4 and got[1]["max_dup_run"] == 4
        assert got[2]["n_dup_grams"] == 4 and got[2]["max_dup_run"] == 4
        # within-doc repetition alone is NOT cross-doc duplication
        assert got[3]["n_dup_grams"] == 0 and got[3]["max_dup_run"] == 0
        assert got[5]["n_dup_grams"] == 0
        assert got[1]["n_grams"] == 11 - 4  # 11 words -> 7 grams
        assert got[1]["dup_rate_scaled"] == 4 * 1_000_000 // 7

    def test_duckdb_mirror_parity(self, ray_session):
        from neo4j_document_pipeline_ray.extras.dupgrams import (
            DUP_NGRAM_SQL,
            dup_ngram_stats,
        )

        got = (
            dup_ngram_stats(_ds(FIXTURE), num_partitions=4)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(
            {"doc_id": [r[0] for r in FIXTURE],
             "text": [r[1] for r in FIXTURE]}))
        want = con.execute(
            DUP_NGRAM_SQL + " ORDER BY doc_id").df()
        con.close()
        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False)

    def test_corpus_smoke_rates_bounded(self, ray_session):
        from neo4j_document_pipeline_ray.extras.dupgrams import (
            docs_dup_ngrams,
        )

        rows = docs_dup_ngrams(SF).take_all()
        assert len(rows) > 0
        for r in rows:
            assert 0 <= r["n_dup_grams"] <= r["n_grams"]
            assert 0 <= r["dup_rate_scaled"] <= 1_000_000
            assert r["max_dup_run"] <= r["n_dup_grams"]
