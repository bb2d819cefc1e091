"""BPE pair counting (extras/bpe.py) vs a Counter replay and the
DuckDB mirror."""

import collections

import duckdb
import pandas as pd
import pytest

import ray.data


FIXTURE = ["the theme thesis", "aa aa aaa", "x", ""]


def _replay(texts, k):
    c = collections.Counter()
    for s in texts:
        for w in s.lower().split():
            for i in range(len(w) - 1):
                c[w[i:i + 2]] += 1
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


class TestBpePairs:
    def test_matches_counter(self, ray_session):
        from neo4j_document_pipeline_ray.extras.bpe import bpe_top_pairs

        ds = ray.data.from_pandas(
            pd.DataFrame({"text": FIXTURE})).repartition(3)
        got = [(r["pair"], r["n"])
               for r in bpe_top_pairs(ds, k=10).take_all()]
        assert got == _replay(FIXTURE, 10)
        # 'aa' counted per overlapping position: 'aa'->1, 'aaa'->2
        assert dict(got)["aa"] == 2 * 1 + 2  # two 'aa' words + 'aaa'

    def test_duckdb_mirror_parity(self, ray_session):
        from neo4j_document_pipeline_ray.extras.bpe import (
            bpe_pairs_sql,
            bpe_top_pairs,
        )

        ds = ray.data.from_pandas(pd.DataFrame({"text": FIXTURE}))
        got = bpe_top_pairs(ds, k=10).to_pandas()
        con = duckdb.connect()
        con.register("documents", pd.DataFrame({"text": FIXTURE}))
        want = con.execute(bpe_pairs_sql(10)).df()
        con.close()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestBpeTrain:
    def test_matches_python_reference(self, ray_session):
        import pyarrow as pa
        import ray.data

        from neo4j_document_pipeline_ray.extras.bpe import (
            bpe_train,
            bpe_train_reference,
        )

        texts = ["the theater is there", "the thin theme",
                 "aaaa aa a banana bandana", "", "THE The the"] * 3
        docs = ray.data.from_arrow(
            pa.table({"text": pa.array(texts, pa.string())}))
        got = [(r["iter"], r["left"], r["right"], r["pair_n"])
               for r in bpe_train(docs, iters=4).to_pylist()]
        assert got == bpe_train_reference(texts, iters=4)
        # round 1 must be (t, h): "th" appears in the/theater/there/
        # thin/theme; round 2 merges the new 'th' symbol with 'e'
        assert got[0][1:3] == ("t", "h")
        assert got[1][1:3] == ("th", "e")

    def test_merge_word_non_overlapping(self):
        from neo4j_document_pipeline_ray.extras.bpe import _merge_word

        assert _merge_word("a\ta\ta", "a", "a") == "aa\ta"
        assert _merge_word("a\ta\ta\ta", "a", "a") == "aa\taa"
        assert _merge_word("b\ta\ta", "b", "a") == "ba\ta"
        assert _merge_word("x\ty", "a", "b") == "x\ty"


class TestBpeEncode:
    def test_counts_match_pure_python(self, ray_session):
        import pyarrow as pa

        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.bpe import (
            _merge_word,
            bpe_encode_counts,
            bpe_train_reference,
        )

        texts = ["the cat the hat", "the the the", "cat hat   cat",
                 "", "   ", "a"]
        merges = [(l, r) for _, l, r, _ in
                  bpe_train_reference(texts, iters=3)]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))
        got = {r["doc_id"]: (r["n_bpe_tokens"], r["n_words"])
               for r in bpe_encode_counts(ds, merges).take_all()}

        def width(w):
            syms = "\t".join(w)
            for l, r in merges:
                syms = _merge_word(syms, l, r)
            return syms.count("\t") + 1

        want = {}
        for i, s in enumerate(texts):
            words = s.lower().split()
            if words:
                want[i] = (sum(width(w) for w in words), len(words))
        assert got == want  # empty docs (3, 4) drop

    def test_merges_shrink_counts(self, ray_session):
        import pyarrow as pa

        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.bpe import (
            bpe_encode_counts,
        )

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["abab abab"], pa.string()),
        }))
        no_merge = bpe_encode_counts(ds, []).take_all()[0]
        merged = bpe_encode_counts(ds, [("a", "b"), ("ab", "ab")]
                                   ).take_all()[0]
        assert no_merge["n_bpe_tokens"] == 8
        assert merged["n_bpe_tokens"] == 2
