"""Prefix-filtered exact Jaccard (extras/dedup.py:prefix_jaccard_pairs):
must equal the naive all-pairs operator, with candidates drawn only
from document-frequency-ordered prefixes."""

import pandas as pd
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


class TestPrefixJaccard:
    def test_equals_naive_operator_on_corpus(self, ray_session):
        from neo4j_document_pipeline_ray.extras.dedup import (
            ngram_jaccard_pairs,
            prefix_jaccard_pairs,
        )

        docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                     columns=["doc_id", "text"])
        got = {(r["doc_a"], r["doc_b"]): r["jaccard_scaled"]
               for r in prefix_jaccard_pairs(docs).take_all()}
        naive = {(r["a"], r["b"]): r["jaccard"]
                 for r in ngram_jaccard_pairs(docs, n=3,
                                              threshold=0.8).take_all()}
        assert set(got) == set(naive)
        assert len(got) > 0  # the corpus plants near-dups
        for pair, scaled in got.items():
            assert abs(naive[pair] - scaled / 1_000_000) < 2e-6

    def test_fixture_semantics(self, ray_session):
        from neo4j_document_pipeline_ray.extras.dedup import (
            prefix_jaccard_pairs,
        )

        base = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lambda mu nu xi omicron pi rho sigma tau")
        rows = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": [
                base,
                base + " upsilon",              # near-identical: J >= 0.8
                "alpha beta gamma " + "q r s t u v w x y z " * 3,  # low J
                "totally different words here with no overlap at all",
            ],
        })
        got = {(r["doc_a"], r["doc_b"]): r
               for r in prefix_jaccard_pairs(
                   ray.data.from_pandas(rows).repartition(2)).take_all()}
        assert set(got) == {(1, 2)}
        r = got[(1, 2)]
        # doc1: 17 grams, doc2: 18, shared 17 -> J = 17/18
        assert r["n_shared"] == 17
        assert r["jaccard_scaled"] == 17 * 1_000_000 // 18

    def test_prefix_length_rule(self):
        from neo4j_document_pipeline_ray.extras.dedup import (
            _prefix_per_doc,
        )

        # one doc, 10 grams, df all 1: p = 10 - ceil(8) + 1 = 3
        df = pd.DataFrame({
            "doc_id": [7] * 10,
            "gram": list(range(10)),
            "dfreq": [1] * 10,
        })
        out = _prefix_per_doc(4, 5)(df)
        assert len(out) == 3
        assert list(out["gram"]) == [0, 1, 2]  # df ties break by gram
        assert set(out["L"]) == {10}


class TestAliasCandidates:
    def test_near_miss_names_surface(self, ray_session):
        from neo4j_document_pipeline_ray.stages.entity_link import (
            alias_candidates,
        )

        nodes = ray.data.from_pandas(pd.DataFrame({
            "entity_id": pd.Series([1, 2, 3, 4, 5], dtype="int64"),
            "norm_key": [
                "acme corp",            # J(1,2) = 2/3 >= 1/2 -> pair
                "acme corp inc",
                "acme",                 # J(3,1) = 1/2 -> pair; J(3,2)=1/3
                "zeta systems",         # no token overlap
                "",                     # empty key never pairs
            ],
        }))
        out = {(r["entity_a"], r["entity_b"]):
               (r["n_shared"], r["jaccard_scaled"])
               for r in alias_candidates(nodes, num_partitions=4).take_all()}
        assert out == {
            (1, 2): (2, 2 * 1_000_000 // 3),
            (1, 3): (1, 1_000_000 // 2),
        }

    def test_exact_duplicate_key_is_full_score(self, ray_session):
        from neo4j_document_pipeline_ray.stages.entity_link import (
            alias_candidates,
        )

        nodes = ray.data.from_pandas(pd.DataFrame({
            "entity_id": pd.Series([10, 20], dtype="int64"),
            "norm_key": ["united states", "united states"],
        }))
        out = alias_candidates(nodes, num_partitions=4).take_all()
        assert [(r["entity_a"], r["entity_b"], r["jaccard_scaled"])
                for r in out] == [(10, 20, 1_000_000)]
