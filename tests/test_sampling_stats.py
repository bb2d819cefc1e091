"""Curation extras: heavy-hitter tokens, exact quantiles, stratified
sampling — checked against in-process Python truth on sf0.001."""

import collections

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


class TestTopTokens:
    def test_matches_counter(self, ray_session, docs_df):
        from neo4j_document_pipeline_ray.extras.textstats import top_tokens

        got = top_tokens(SF, k=20).take_all()
        c = collections.Counter()
        for text in docs_df["text"]:
            c.update(tok for tok in text.lower().split() if tok)
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        assert [(r["token"], r["n"]) for r in got] == want


class TestLengthQuantiles:
    def test_matches_kth_smallest(self, ray_session, docs_df):
        from neo4j_document_pipeline_ray.extras.textstats import length_quantiles

        got = length_quantiles(SF).to_pydict()
        v = np.sort(docs_df["n_chars"].to_numpy())
        n = len(v)
        for q, val in zip(got["q"], got["value"]):
            kth = int(np.ceil(round(q * n, 9)))  # ceil(q*n), float-safe
            assert val == v[kth - 1], (q, val, v[kth - 1])


class TestGroupedLengthQuantiles:
    def test_matches_per_group_kth_smallest(self, ray_session, docs_df):
        from neo4j_document_pipeline_ray.extras.textstats import (
            grouped_length_quantiles,
        )

        got = grouped_length_quantiles(SF).to_pandas()
        langs = set(docs_df["lang"])
        assert set(got["lang"]) == langs
        for lang, g in got.groupby("lang"):
            v = np.sort(
                docs_df.loc[docs_df["lang"] == lang, "n_chars"].to_numpy())
            n = len(v)
            assert len(g) == 3
            for q, val in zip(g["q"], g["value"]):
                kth = int(np.ceil(round(q * n, 9)))
                assert val == v[kth - 1], (lang, q, val, v[kth - 1])


class TestPagesSectionStats:
    def test_matches_duckdb(self, ray_session):
        import duckdb

        import __ray_entry__ as entry
        from neo4j_document_pipeline_ray.sources.corpus import ensure_corpus

        got = entry.queries()["pages_section_stats"](SF).to_pandas()
        pages = ensure_corpus(SF)["pages"] + "/*.parquet"
        want = duckdb.sql(f"""
            WITH b AS (
                SELECT regexp_extract(url,
                           '^https?://[^/]+/([^/]+)', 1) AS section,
                       lang, octet_length(html) AS hb
                FROM read_parquet('{pages}')
            )
            SELECT section, CAST(count(*) AS BIGINT) AS n_pages,
                   CAST(sum(hb) AS BIGINT) AS total_html_bytes,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
            FROM b GROUP BY section ORDER BY section
        """).df()
        got = got.sort_values("section").reset_index(drop=True)
        cols = ["section", "n_pages", "total_html_bytes", "n_langs"]
        assert got[cols].values.tolist() == want[cols].values.tolist()


class TestStratifiedSample:
    def test_ranks_and_counts(self, ray_session, docs_df):
        from neo4j_document_pipeline_ray.extras.sampling import (
            docs_stratified_sample,
        )

        got = docs_stratified_sample(SF, per_stratum=7).to_pandas()
        per = got.groupby("lang")["sample_rank"].agg(["count", "min", "max"])
        for lang, row in per.iterrows():
            avail = int((docs_df["lang"] == lang).sum())
            expect = min(7, avail)
            assert row["count"] == expect
            assert row["min"] == 1 and row["max"] == expect
        # ranks are contiguous 1..n per stratum
        for _lang, g in got.groupby("lang"):
            assert sorted(g["sample_rank"]) == list(range(1, len(g) + 1))

    def test_deterministic_and_nested(self, ray_session):
        from neo4j_document_pipeline_ray.extras.sampling import (
            docs_stratified_sample,
        )

        a = docs_stratified_sample(SF, per_stratum=5).to_pandas()
        b = docs_stratified_sample(SF, per_stratum=5).to_pandas()
        key = ["doc_id", "lang", "sample_rank"]
        assert sorted(map(tuple, a[key].values.tolist())) == \
               sorted(map(tuple, b[key].values.tolist()))
        wide = docs_stratified_sample(SF, per_stratum=20).to_pandas()
        narrow_set = set(map(tuple, a[key].values.tolist()))
        wide_set = set(map(tuple, wide[key].values.tolist()))
        assert narrow_set <= wide_set  # same hash order -> nested samples

    def test_sample_key_vectorized_matches_scalar(self):
        from neo4j_document_pipeline_ray.extras.sampling import sample_key

        ids = np.array([0, 1, 7, 123456789], dtype=np.int64)
        got = sample_key(ids)
        want = [(i * 2654435761) % (2**32) for i in ids.tolist()]
        assert got.tolist() == want


class TestRepetition:
    def test_edge_cases_match_hand_computed(self, ray_session):
        import pyarrow as pa

        from neo4j_document_pipeline_ray.extras.textstats import (
            REP_SCALE,
            repetition_batch,
        )

        t = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array([
                "a b\na b\nc",          # dup line "a b" (x2), 3 lines
                "",                     # empty doc
                "   \n\t\n",            # whitespace only
                "x y x y x y",          # top 2-gram "x y" 3x of 5 grams
                "solo",                 # 1 word, no grams, 1 line
            ], pa.string()),
        })
        out = {r["doc_id"]: r for r in repetition_batch(t).to_pylist()}

        d1 = out[1]
        assert d1["n_lines"] == 3
        # 3 lines, 2 distinct -> 1/3 duplicated
        assert d1["dup_line_frac_scaled"] == (1 * REP_SCALE) // 3
        # dup chars: second "a b" occurrence = 3 chars of 7 total
        assert d1["dup_char_frac_scaled"] == (3 * REP_SCALE) // 7
        # grams in "a b" lines... whole doc words: a b a b c ->
        # grams: "a b","b a","a b","b c"; top "a b" 2x, covers 2*2=4
        # chars of 5 word chars
        assert d1["top_2gram_frac_scaled"] == (4 * REP_SCALE) // 5

        for empty_id in (2, 3):
            e = out[empty_id]
            assert e["n_lines"] == 0
            assert e["dup_line_frac_scaled"] == 0
            assert e["dup_char_frac_scaled"] == 0
            assert e["top_2gram_frac_scaled"] == 0

        d4 = out[4]
        assert d4["n_lines"] == 1
        assert d4["dup_line_frac_scaled"] == 0
        # "x y" 3x among grams, covers 3*2=6 of 6 word chars
        assert d4["top_2gram_frac_scaled"] == REP_SCALE

        d5 = out[5]
        assert d5["n_lines"] == 1
        assert d5["top_2gram_frac_scaled"] == 0


class TestSalientTerms:
    def test_hand_computed(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.extras.textstats import (
            SALIENCE_SCALE,
            salient_terms,
        )

        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([
                "apple apple banana",   # apple tf=2/3, df=1; banana df=2
                "banana cherry",        # cherry df=1
                "",                     # empty: no rows
            ], pa.string()),
        }), tmp_path / "documents.parquet")

        rows = salient_terms(str(tmp_path), k=2).take_all()
        got = {(r["doc_id"], r["token"]): (r["tf"], r["salience_scaled"])
               for r in rows}
        n = 3
        # doc1: apple (2*3*S)//(3*1), banana (1*3*S)//(3*2)
        assert got[(1, "apple")] == (2, (2 * n * SALIENCE_SCALE) // 3)
        assert got[(1, "banana")] == (1, (1 * n * SALIENCE_SCALE) // 6)
        # doc2: cherry rarer than banana -> ranked, both kept (k=2)
        assert got[(2, "cherry")] == (1, (1 * n * SALIENCE_SCALE) // 2)
        assert got[(2, "banana")] == (1, (1 * n * SALIENCE_SCALE) // 4)
        # empty doc contributes nothing; k caps per-doc rows
        assert len(rows) == 4


class TestCurationFilter:
    def test_each_rule_fires(self, ray_session):
        import pyarrow as pa

        from neo4j_document_pipeline_ray.extras.textstats import filter_batch

        good = ("the quick brown fox jumps over the lazy dog and then "
                "rests in the shade for a while")
        docs = {
            1: good,                                   # keep
            2: "too few",                              # word_count
            3: "a b c d e f g h",                      # mean_word_length (1)
            4: "\n".join(["the same line is here"] * 10),   # dup_lines
            5: "the cat " * 30,                        # top_2gram
            6: "zzz qqq www eee rrr ttt yyy uuu iii "
               "ooo ppp aaa sss ddd fff ggg",           # no_stopwords
            7: "the !!! and ??? of ,,, to ;;; in ### for @@@ with %%%",
        }
        t = pa.table({
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        })
        out = {r["doc_id"]: r for r in filter_batch(t).to_pylist()}
        assert out[1] == {"doc_id": 1, "keep": True, "reason": ""}
        assert out[2]["reason"] == "word_count"
        assert out[3]["reason"] == "mean_word_length"
        assert out[4]["reason"] == "dup_lines"
        assert out[5]["reason"] == "top_2gram"
        assert out[6]["reason"] == "no_stopwords"
        assert out[7]["reason"] == "punctuation"
        assert all(not out[i]["keep"] for i in range(2, 8))


class TestDomainReputation:
    def test_dup_and_means(self, ray_session, tmp_path, monkeypatch):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.extras.textstats import (
            domain_reputation,
        )

        d = tmp_path / "sf"
        os.makedirs(d)
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["same text here", "same text here",
                     "unique one!", "other, 42"],
            "source": ["a", "b", "b", "b"],
        }), str(d / "documents.parquet"))
        got = {r["source"]: r
               for r in domain_reputation(str(d)).take_all()}
        # dup flag is CORPUS-wide: the copy in 'a' and the copy in 'b'
        # both count as duplicated
        assert got["a"]["n_dup_docs"] == 1 and got["a"]["n_docs"] == 1
        assert got["b"]["n_dup_docs"] == 1 and got["b"]["n_docs"] == 3
        assert got["a"]["mean_words_scaled"] == 3 * 1_000_000
        # 'b': words 3 + 2 + 2 = 7 over 3 docs
        assert got["b"]["mean_words_scaled"] == 7 * 1_000_000 // 3


class TestDocsSplit:
    def test_partitions_and_determinism(self, ray_session):
        from neo4j_document_pipeline_ray.extras.sampling import docs_split

        rows1 = sorted(
            ((r["split"], r["lang"], r["n_docs"], r["n_tokens"],
              r["n_chars"]) for r in
             docs_split("/root/testdata/sf0.001").take_all()))
        rows2 = sorted(
            ((r["split"], r["lang"], r["n_docs"], r["n_tokens"],
              r["n_chars"]) for r in
             docs_split("/root/testdata/sf0.001",
                        num_partitions=2).take_all()))
        assert rows1 == rows2  # partitioning-invariant
        splits = {r[0] for r in rows1}
        assert splits <= {"train", "val", "test"}
        n_train = sum(r[2] for r in rows1 if r[0] == "train")
        n_all = sum(r[2] for r in rows1)
        assert n_all > 0
        # hash split should land near 80% (loose band; deterministic)
        assert 0.6 * n_all <= n_train <= 0.95 * n_all


class TestTableProfile:
    def test_exact_below_k_and_nulls(self, ray_session):
        import pyarrow as pa

        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.profile import (
            table_profile,
        )

        ds = rd.from_arrow(pa.table({
            "a": pa.array([1, 2, 2, None, 3], pa.int64()),
            "b": pa.array(["x", "x", None, None, ""], pa.string()),
        })).repartition(3)
        got = {r["col"]: r for r in table_profile(
            ds, ["a", "b"], k=8).to_pylist()}
        assert got["a"]["n_rows"] == 5 and got["a"]["n_nulls"] == 1
        assert got["a"]["est_distinct"] == 3  # exact below k
        assert got["b"]["n_rows"] == 5 and got["b"]["n_nulls"] == 2
        assert got["b"]["est_distinct"] == 2  # "x" and ""

    def test_duckdb_mirror_parity(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.profile import (
            table_profile,
            table_profile_sql,
        )

        t = pa.table({
            "num": pa.array(list(range(50)) + [None], pa.int64()),
            "txt": pa.array([f"v{i % 7}" for i in range(50)] + [None],
                            pa.string()),
        })
        p = str(tmp_path / "t.parquet")
        pq.write_table(t, p)
        got = table_profile(rd.read_parquet(p), ["num", "txt"],
                            k=16).to_pandas().sort_values("col") \
            .reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW tbl AS SELECT * "
                    f"FROM read_parquet('{p}')")
        want = con.execute(
            table_profile_sql("tbl", ["num", "txt"], k=16)
            + " ORDER BY col").df()
        import pandas as pd

        pd.testing.assert_frame_equal(
            got[want.columns.tolist()], want, check_dtype=False)


class TestTrainShards:
    def test_deterministic_cover_and_seed_bump(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.sampling import (
            train_shards,
        )

        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(list(range(100)), pa.int64())}))
        a = train_shards(docs, n_shards=4, seed=1).to_pandas()
        # every doc exactly once; positions contiguous per shard
        assert sorted(a["doc_id"]) == list(range(100))
        for s, grp in a.groupby("shard"):
            assert sorted(grp["pos"]) == list(range(len(grp)))
        # reproducible
        b = train_shards(docs, n_shards=4, seed=1).to_pandas()
        key = ["doc_id", "shard", "pos"]
        assert a.sort_values(key).reset_index(drop=True).equals(
            b.sort_values(key).reset_index(drop=True))
        # a seed bump reshuffles
        c = train_shards(docs, n_shards=4, seed=2).to_pandas()
        merged = a.merge(c, on="doc_id", suffixes=("_a", "_c"))
        assert (merged["shard_a"] != merged["shard_c"]).any()
