"""Round-4 curation extras: benchmark decontamination, per-domain
token budgets, KMV distinct-count sketch — checked against in-process
Python truth on sf0.001 (the DuckDB hash gate covers them at sf0.01)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def _truth_grams(text):
    from neo4j_document_pipeline_ray.extras.decontam import gram_hashes

    return gram_hashes(text)


class TestDecontaminate:
    def test_matches_python_truth(self, ray_session, docs_df):
        from neo4j_document_pipeline_ray.extras.decontam import (
            docs_decontaminate,
        )

        got = (docs_decontaminate(SF).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        bench_grams = set()
        for _, r in docs_df[docs_df.doc_id % 97 == 0].iterrows():
            bench_grams.update(_truth_grams(r.text).tolist())
        rest = docs_df[docs_df.doc_id % 97 != 0]
        want_hits = {
            int(r.doc_id): int(sum(g in bench_grams
                                   for g in _truth_grams(r.text).tolist()))
            for _, r in rest.iterrows()
        }
        assert len(got) == len(rest)
        for _, r in got.iterrows():
            assert r.n_gram_hits == want_hits[int(r.doc_id)]
            assert r.contaminated == int(r.n_gram_hits > 0)
        # the fixture corpus genuinely collides (tiny vocab): the test
        # would be vacuous if nothing were ever flagged
        assert got.contaminated.sum() > 0

    def test_short_docs_never_flagged(self, ray_session):
        import ray

        from neo4j_document_pipeline_ray.extras.decontam import (
            benchmark_gram_set,
            decontaminate,
        )

        bench = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": ["alpha beta gamma delta epsilon zeta"],
        }))
        ref = benchmark_gram_set(bench)
        corpus = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            # doc 1: 4 words < window 5 -> no grams, can't be flagged
            # doc 2: contains the benchmark's first 5-gram
            "text": ["alpha beta gamma delta",
                     "x alpha beta gamma delta epsilon y"],
        }))
        out = {r["doc_id"]: r for r in decontaminate(corpus, ref).take_all()}
        assert out[1]["n_gram_hits"] == 0 and out[1]["contaminated"] == 0
        assert out[2]["n_gram_hits"] >= 1 and out[2]["contaminated"] == 1

    def test_oversized_benchmark_rejected(self, ray_session, monkeypatch):
        import ray

        from neo4j_document_pipeline_ray.extras import decontam

        monkeypatch.setattr(decontam, "MAX_BENCHMARK_GRAMS", 1)
        bench = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": ["one two three four five six seven eight nine"],
        }))
        with pytest.raises(ValueError, match="broadcasts the benchmark"):
            decontam.benchmark_gram_set(bench)


class TestDomainBudget:
    def test_prefix_of_hash_order_and_budget(self, ray_session, docs_df):
        from neo4j_document_pipeline_ray.extras.sampling import (
            docs_domain_budget,
            sample_key,
        )

        budget = 2000
        got = docs_domain_budget(SF, budget=budget).to_pandas()
        df = docs_df.copy()
        df["_h"] = sample_key(df.doc_id.to_numpy()).astype(np.int64)
        for src, g in df.groupby("source"):
            g = g.sort_values(["_h", "doc_id"], kind="mergesort")
            cum = g.n_chars.cumsum().to_numpy()
            before = cum - g.n_chars.to_numpy()
            want = g[before < budget]
            kept = got[got.source == src].sort_values("doc_id")
            assert sorted(kept.doc_id) == sorted(want.doc_id), src
            # every domain keeps at least its first row
            assert len(kept) >= 1
        # cum_weight is the inclusive prefix sum in kept order
        merged = got.merge(
            df[["doc_id", "_h"]], on="doc_id").sort_values(["source", "_h"])
        for _src, g in merged.groupby("source"):
            assert g.cum_weight.tolist() == g.n_chars.cumsum().tolist()

    def test_budgets_nest(self, ray_session):
        from neo4j_document_pipeline_ray.extras.sampling import (
            docs_domain_budget,
        )

        small = set(docs_domain_budget(SF, budget=800).to_pandas().doc_id)
        large = set(docs_domain_budget(SF, budget=3000).to_pandas().doc_id)
        assert small <= large


class TestDistinctKMV:
    def test_matches_python_truth(self, ray_session, docs_df):
        from neo4j_document_pipeline_ray.extras.textstats import (
            _FP_MOD_MASK,
            _KMV_SPACE,
            _word_hashes,
            distinct_tokens_kmv,
        )

        k = 8
        got = distinct_tokens_kmv(SF, k=k).to_pandas().iloc[0]
        all_h = np.unique(np.concatenate([
            _word_hashes(t) & _FP_MOD_MASK for t in docs_df.text
        ]))
        kth = int(np.sort(all_h)[k - 1])
        assert got.kmv_k == k
        assert got.kth_hash == kth
        assert got.est_distinct == ((k - 1) * _KMV_SPACE) // kth

    def test_fewer_than_k_distinct_is_exact(self, ray_session, tmp_path):
        from neo4j_document_pipeline_ray.extras.textstats import (
            distinct_tokens_kmv,
        )

        d = tmp_path / "sf"
        os.makedirs(d)
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["aa bb aa", "bb cc"],
        }), str(d / "documents.parquet"))
        got = distinct_tokens_kmv(str(d), k=8).to_pandas().iloc[0]
        assert got.est_distinct == 3  # exact: only aa/bb/cc exist

    def test_estimate_within_kmv_error_bound(self, ray_session, docs_df):
        """KMV relative error is ~1/sqrt(k-2); with the fixture's tiny
        vocabulary assert the loose 3-sigma envelope."""
        from neo4j_document_pipeline_ray.extras.textstats import (
            distinct_tokens_kmv,
        )

        k = 8
        got = distinct_tokens_kmv(SF, k=k).to_pandas().iloc[0]
        exact = len({w for t in docs_df.text for w in t.lower().split()})
        sigma = exact / np.sqrt(k - 2)
        assert abs(got.est_distinct - exact) <= 3 * sigma


class TestVectorizedFNVKernel:
    """The batch FNV/gram kernels must be bit-identical to the scalar
    reference path (_word_hashes + per-doc sliding windows)."""

    CASES = [
        "",                       # empty
        "   ",                    # whitespace only
        "one",                    # single word, no separator in buffer
        "a b c d",                # shorter than the gram window
        "alpha beta gamma delta epsilon zeta eta",
        "MIXED Case\tTabs\nand newlines   collapse",
        "unicode café naïve 中文 über",  # multi-byte utf-8
        "repeat repeat repeat repeat repeat repeat",
    ]

    def test_word_hashes_match_scalar(self):
        from neo4j_document_pipeline_ray.extras.textstats import (
            _word_hashes,
            _word_hashes_texts,
        )

        hs, offs = _word_hashes_texts(self.CASES)
        for i, text in enumerate(self.CASES):
            got = hs[offs[i]:offs[i + 1]]
            want = _word_hashes(text)
            assert got.tolist() == want.tolist(), text

    def test_gram_hashes_match_scalar(self):
        from neo4j_document_pipeline_ray.extras.textstats import (
            _FP_MOD_MASK,
            _FP_WEIGHTS,
            _WINDOW,
            _flat_gram_hashes,
            _word_hashes,
            _word_hashes_texts,
        )

        grams, gdoc = _flat_gram_hashes(*_word_hashes_texts(self.CASES))
        for i, text in enumerate(self.CASES):
            hs = _word_hashes(text)
            if len(hs) >= _WINDOW:
                win = np.lib.stride_tricks.sliding_window_view(hs, _WINDOW)
                want = ((win * _FP_WEIGHTS).sum(axis=1, dtype=np.uint64)
                        & _FP_MOD_MASK).tolist()
            else:
                want = []
            assert grams[gdoc == i].tolist() == want, text

    def test_fingerprint_batch_matches_scalar_reference(self, docs_df):
        from neo4j_document_pipeline_ray.extras.textstats import (
            _FP_MOD_MASK,
            _FP_WEIGHTS,
            _WINDOW,
            _word_hashes,
            fingerprint_batch,
        )

        texts = list(docs_df.text[:50]) + self.CASES
        t = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": texts,
        })
        got = fingerprint_batch(t).to_pydict()
        for i, text in enumerate(texts):
            hs = _word_hashes(text)
            if len(hs) >= _WINDOW:
                win = np.lib.stride_tricks.sliding_window_view(hs, _WINDOW)
                grams = ((win * _FP_WEIGHTS).sum(axis=1, dtype=np.uint64)
                         & _FP_MOD_MASK)
                fp, ng = int(grams.min()), len(grams)
            elif len(hs):
                fp, ng = int(hs.min() & _FP_MOD_MASK), 1
            else:
                fp, ng = 0, 0
            assert got["fingerprint"][i] == fp, text
            assert got["n_grams"][i] == ng, text


class TestGroupedKMV:
    def test_matches_per_group_python_truth(self, ray_session, docs_df):
        from neo4j_document_pipeline_ray.extras.textstats import (
            _FP_MOD_MASK,
            _KMV_SPACE,
            _word_hashes,
            grouped_distinct_tokens_kmv,
        )

        k = 8
        got = {r["lang"]: r for r in
               grouped_distinct_tokens_kmv(SF, k=k).take_all()}
        assert set(got) == set(docs_df["lang"])
        for lang, g in docs_df.groupby("lang"):
            all_h = np.unique(np.concatenate([
                _word_hashes(t) & _FP_MOD_MASK for t in g.text
            ]))
            r = got[lang]
            if len(all_h) < k:
                assert r["est_distinct"] == len(all_h)
            else:
                kth = int(np.sort(all_h)[k - 1])
                assert r["kth_hash"] == kth
                assert r["est_distinct"] == ((k - 1) * _KMV_SPACE) // kth
