"""Tests for curation extras: dedup, similarity, text stats, multimodal."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(ray_session, rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(
        [{"doc_id": i, "text": t} for i, t in enumerate(rows)],
        schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    ))


BASE = ("the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest while the sun sets slowly behind hills ") * 5


class TestExactDedup:
    def test_groups(self, ray_session):
        from neo4j_document_pipeline_ray.extras.dedup import exact_dedup

        ds = _docs_ds(ray_session, ["aaa", "bbb", "aaa", "aaa", "ccc"])
        out = {r["text_hash"]: r for r in exact_dedup(ds).take_all()}
        sizes = sorted(r["n_docs"] for r in out.values())
        assert sizes == [1, 1, 3]
        trip = [r for r in out.values() if r["n_docs"] == 3][0]
        assert trip["keep_doc_id"] == 0


class TestMinhash:
    def test_near_dups_found_and_distinct_not(self, ray_session):
        from neo4j_document_pipeline_ray.extras.dedup import minhash_dedup_pairs

        near = BASE.replace("quick", "rapid")  # tiny edit
        other = ("completely different content about economic policy and "
                 "infrastructure spending in urban regions every year ") * 6
        ds = _docs_ds(ray_session, [BASE, near, other, BASE])
        pairs = {(r["a"], r["b"]) for r in minhash_dedup_pairs(ds, 0.5).take_all()}
        assert (0, 1) in pairs          # near-dup caught
        assert (0, 3) in pairs          # exact dup caught
        assert not any(2 in p for p in pairs)  # distinct doc untouched

    def test_near_dedup_keep_filters_clusters(self, ray_session):
        from neo4j_document_pipeline_ray.extras.dedup import near_dedup_keep

        near = BASE.replace("quick", "rapid")
        other = ("completely different content about economic policy and "
                 "infrastructure spending in urban regions every year ") * 6
        # docs 0,1,3 form one near-dup cluster; 2 is a singleton
        ds = _docs_ds(ray_session, [BASE, near, other, BASE])
        kept = {r["doc_id"]: r["cluster_size"]
                for r in near_dedup_keep(ds, 0.5).take_all()}
        assert kept == {0: 3, 2: 1}  # min doc_id survives, sized; singleton kept

    def test_near_dedup_keep_no_dups(self, ray_session):
        from neo4j_document_pipeline_ray.extras.dedup import near_dedup_keep

        a = ("completely different content about economic policy and "
             "infrastructure spending in urban regions every year ") * 6
        ds = _docs_ds(ray_session, [BASE, a])
        kept = {r["doc_id"]: r["cluster_size"]
                for r in near_dedup_keep(ds, 0.5).take_all()}
        assert kept == {0: 1, 1: 1}

    def test_signature_jaccard_estimate(self):
        from neo4j_document_pipeline_ray.extras.dedup import (
            estimate_jaccard,
            minhash_signature,
        )

        s1 = minhash_signature(BASE)
        s2 = minhash_signature(BASE)
        assert estimate_jaccard(s1, s2) == 1.0
        s3 = minhash_signature("entirely unrelated words " * 30)
        assert estimate_jaccard(s1, s3) < 0.2

    def test_signatures_match_duckdb_oracle(self):
        """The SQL mirror replays _shingle_hashes + minhash_signature
        bit-for-bit, including numpy's uint64 wrap-around and the
        1/2/3-word shingle-window edge cases."""
        import duckdb

        from neo4j_document_pipeline_ray.extras.dedup import (
            _minhash_ctes,
            minhash_signature,
        )

        texts = [BASE, "", "one", "two words", "exactly three words"]
        con = duckdb.connect()
        con.register("documents", pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))
        rows = con.execute(
            "WITH " + _minhash_ctes(0.8, 50)
            + " SELECT doc_id, i, v FROM sigs ORDER BY doc_id, i"
        ).fetchall()
        got = {}
        for doc_id, i, v in rows:
            got.setdefault(doc_id, [0] * 64)[i] = int(v)
        for d, text in enumerate(texts):
            assert got[d] == [int(x) for x in minhash_signature(text)], d

    def test_pairs_and_components_match_duckdb_oracle(self, ray_session):
        """End-to-end: banded candidates (incl. the bucket_cap
        all-pairs/chain rule), est-Jaccard verify, and the recursive
        components closure all agree with the Ray path."""
        import duckdb

        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.dedup import (
            _minhash_components_sql,
            _minhash_pairs_sql,
            connected_components,
            minhash_dedup_pairs,
        )

        long = (BASE + " and then naps in warm afternoon sun for hours ") * 4
        texts = ([long, long.replace("naps", "rests"), long,
                  "unrelated economic policy text about ports " * 10,
                  "", "", "one", "one"]
                 # two hot boilerplate clusters of 4 -> exceed cap=3
                 + [f"boilerplate footer text everywhere {i % 2} " * 6
                    for i in range(8)])
        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        ds = rd.from_arrow(tbl)
        got = sorted((r["a"], r["b"], round(r["est_jaccard"], 9))
                     for r in minhash_dedup_pairs(
                         ds, threshold=0.8, bucket_cap=3).take_all())
        con = duckdb.connect()
        con.register("documents", tbl)
        want = sorted((a, b, round(e, 9)) for a, b, e in
                      con.execute(_minhash_pairs_sql(0.8, 3)).fetchall())
        assert got == want and len(got) > 0

        pairs = minhash_dedup_pairs(ds, threshold=0.8, bucket_cap=3)
        comp_ray = sorted(
            (r["node"], r["component"]) for r in
            connected_components(pairs.select_columns(["a", "b"])).take_all())
        comp_sql = sorted(map(tuple, con.execute(
            _minhash_components_sql(0.8, 3)).fetchall()))
        assert comp_ray == comp_sql


class TestConnectedComponents:
    def test_two_components(self, ray_session):
        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.dedup import connected_components

        pairs = rd.from_arrow(pa.table({
            "a": pa.array([1, 2, 10, 11], pa.int64()),
            "b": pa.array([2, 3, 11, 12], pa.int64()),
        }))
        comp = {r["node"]: r["component"] for r in connected_components(pairs).take_all()}
        assert comp[1] == comp[2] == comp[3] == 1
        assert comp[10] == comp[11] == comp[12] == 10

    def test_chain_converges(self, ray_session):
        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.dedup import connected_components

        # a long chain is the worst case for label propagation
        n = 40
        pairs = rd.from_arrow(pa.table({
            "a": pa.array(list(range(n - 1)), pa.int64()),
            "b": pa.array(list(range(1, n)), pa.int64()),
        }))
        comp = {r["node"]: r["component"] for r in
                connected_components(pairs, max_rounds=8).take_all()}
        assert set(comp.values()) == {0}


class TestSimhash:
    def test_near_pairs(self, ray_session):
        from neo4j_document_pipeline_ray.extras.dedup import simhash_near_pairs

        near = BASE.replace("lazy", "idle")
        other = "unrelated economic policy text about ports and tariffs " * 10
        ds = _docs_ds(ray_session, [BASE, near, other])
        pairs = {(r["a"], r["b"]) for r in simhash_near_pairs(ds, 6).take_all()}
        assert (0, 1) in pairs
        assert not any(2 in p for p in pairs)

    def test_hamming(self):
        from neo4j_document_pipeline_ray.extras.dedup import hamming64

        assert hamming64(0b1011, 0b1001) == 1
        assert hamming64(0, (1 << 64) - 1) == 64

    def test_pairs_match_duckdb_oracle(self, ray_session):
        """SIMHASH_PAIRS_SQL mirrors the whole path (FNV word hash,
        sign-sum sketch, band candidates, hamming verify) bit-for-bit."""
        import duckdb

        from neo4j_document_pipeline_ray.extras.dedup import (
            SIMHASH_PAIRS_SQL,
            simhash_near_pairs,
        )

        texts = [BASE, BASE.replace("lazy", "idle"),
                 "unrelated economic policy text about ports and tariffs " * 10,
                 ""]
        ds = _docs_ds(ray_session, texts)
        got = {(r["a"], r["b"]) for r in
               simhash_near_pairs(ds, max_hamming=3).take_all()}
        con = duckdb.connect()
        con.register("documents", pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))
        want = set(map(tuple, con.execute(SIMHASH_PAIRS_SQL).fetchall()))
        assert got == want

    def test_simhash_bucket_cap_logged_and_truncated(self, caplog):
        import logging

        import pandas as pd

        from neo4j_document_pipeline_ray.extras.dedup import (
            _make_simhash_bucket_partition,
        )

        fn = _make_simhash_bucket_partition(max_hamming=64, cap=3)
        df = pd.DataFrame({
            "bucket": ["hot"] * 5 + ["cold"] * 2,
            "doc_id": list(range(5)) + [7, 8],
            "simhash": [0] * 7,
        })
        with caplog.at_level(logging.WARNING):
            out = fn(df)
        assert "max_bucket_docs=3" in caplog.text and "1 band bucket(s)" in caplog.text
        pairs = {(r.a, r.b) for r in out.itertuples()}
        # hot bucket truncated to first 3 docs -> C(3,2) pairs + cold pair
        assert pairs == {(0, 1), (0, 2), (1, 2), (7, 8)}

    def test_simhash_uncapped_is_silent_and_exact(self, caplog):
        import logging

        import pandas as pd

        from neo4j_document_pipeline_ray.extras.dedup import (
            _make_simhash_bucket_partition,
        )

        fn = _make_simhash_bucket_partition(max_hamming=64, cap=None)
        df = pd.DataFrame({"bucket": ["b"] * 4, "doc_id": [3, 1, 2, 0],
                           "simhash": [0] * 4})
        with caplog.at_level(logging.WARNING):
            out = fn(df)
        assert caplog.text == ""
        assert len(out) == 6  # C(4,2), fully exact

    def test_minhash_hot_bucket_cap_logged_and_chained(self, caplog):
        """A bucket above bucket_cap must emit all-pairs on the capped
        head, chain the overflow to the head doc, and LOG the cap."""
        import logging

        import pandas as pd

        from neo4j_document_pipeline_ray.extras.dedup import (
            _make_pairs_partition,
        )

        fn = _make_pairs_partition(bucket_cap=4)
        df = pd.DataFrame({"bucket": ["hot"] * 10 + ["cold"] * 2,
                           "doc_id": list(range(10)) + [100, 101]})
        with caplog.at_level(logging.WARNING):
            out = fn(df)
        assert "bucket_cap=4" in caplog.text and "1 bucket(s)" in caplog.text
        hot = out[out["a"] < 100]
        # C(4,2)=6 all-pairs + 6 chained overflow docs
        assert len(hot) == 12
        assert (hot[hot["b"] >= 4]["a"] == 0).all()  # chained to head
        assert len(out[out["a"] >= 100]) == 1  # cold bucket untouched


class TestCapLogging:
    """Verdict r2 #10: every silent-cap site must LOG its drops; these
    unit-test the partition bodies directly (the logs fire inside Ray
    workers in the pipeline, where caplog cannot reach)."""

    def test_gram_cap_logged_and_dropped(self, caplog):
        import logging

        import pandas as pd

        from neo4j_document_pipeline_ray.extras.dedup import (
            _make_gram_pairs_partition,
        )

        fn = _make_gram_pairs_partition(cap=3)
        df = pd.DataFrame({
            "gram": [1] * 5 + [2] * 2,          # gram 1 shared by 5 > cap
            "doc_id": list(range(5)) + [7, 8],
        })
        with caplog.at_level(logging.WARNING):
            out = fn(df)
        assert "max_gram_docs=3" in caplog.text and "1 gram(s)" in caplog.text
        # hot gram dropped entirely; cold gram emits its one pair
        assert [(r.a, r.b) for r in out.itertuples()] == [(7, 8)]

    def test_gram_cap_uncapped_is_silent_and_exact(self, caplog):
        import logging

        import pandas as pd

        from neo4j_document_pipeline_ray.extras.dedup import (
            _make_gram_pairs_partition,
        )

        fn = _make_gram_pairs_partition(cap=None)
        df = pd.DataFrame({"gram": [1] * 4, "doc_id": [3, 1, 2, 0]})
        with caplog.at_level(logging.WARNING):
            out = fn(df)
        assert caplog.text == ""
        assert len(out) == 6  # C(4,2), fully exact

    def test_near_dup_bucket_cap_logged_and_truncated(self, caplog):
        import logging

        import numpy as np
        import pandas as pd

        from neo4j_document_pipeline_ray.extras.similarity import (
            _make_bucket_pairs,
        )

        fn = _make_bucket_pairs(threshold=0.9, bucket_cap=2)
        v = np.array([1.0, 2.0, 3.0])
        g = pd.DataFrame({
            "bucket": [5, 5, 5],
            "vec_id": [30, 10, 20],
            "embedding": [v, v, v],
        })
        with caplog.at_level(logging.WARNING):
            out = fn(g)
        assert "bucket_cap=2" in caplog.text and "1 of 3" in caplog.text
        # only the two lowest vec_ids compared
        assert [(r.a, r.b) for r in out.itertuples()] == [(10, 20)]

    def test_ngram_pipeline_hot_gram_capped_vs_exact(self, ray_session):
        """End-to-end: with every gram shared by 3 docs and cap=2, pair
        generation drops them all (empty result); the exact default
        finds all 3 pairs at jaccard 1.0."""
        import pyarrow as pa
        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.dedup import (
            ngram_jaccard_pairs,
        )

        text = "alpha beta gamma delta epsilon zeta"
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([text] * 3, pa.string()),
        })
        exact = ngram_jaccard_pairs(rd.from_arrow(t), n=3, threshold=0.8)
        assert sorted((r["a"], r["b"], r["jaccard"])
                      for r in exact.take_all()) == [
            (1, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0)]
        capped = ngram_jaccard_pairs(rd.from_arrow(t), n=3, threshold=0.8,
                                     max_gram_docs=2)
        assert capped.count() == 0


class TestSimilarity:
    @pytest.fixture()
    def emb(self, ray_session):
        import ray.data as rd

        return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")

    def test_brute_force_matches_duckdb(self, ray_session, emb):
        import duckdb

        from neo4j_document_pipeline_ray.extras.similarity import (
            brute_force_topk,
            query_vector,
        )

        q = query_vector("/root/testdata/sf0.001")
        got = brute_force_topk(emb, q, k=10).take_all()
        want = duckdb.sql("""
            SELECT e.vec_id,
                   round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM
                        read_parquet('/root/testdata/sf0.001/embeddings.parquet')
                        WHERE vec_id = 0)), 6) AS sim
            FROM read_parquet('/root/testdata/sf0.001/embeddings.parquet') e
            ORDER BY sim DESC, e.vec_id LIMIT 10
        """).fetchall()
        assert [(r["vec_id"], r["sim"]) for r in got] == want

    def test_lsh_recall(self, ray_session, emb):
        from neo4j_document_pipeline_ray.extras.similarity import (
            brute_force_topk,
            lsh_topk,
            query_vector,
        )

        q = query_vector("/root/testdata/sf0.001")
        exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).take_all()}
        approx = {r["vec_id"] for r in lsh_topk(emb, q, k=10, multiprobe=2).take_all()}
        assert len(exact & approx) >= 5  # recall@10 >= 0.5 with multiprobe 2

    def test_near_dup_bucket_cap_bounds_pairs(self, ray_session):
        """With bucket_cap=2, a bucket of 3 identical vectors yields only
        the single capped pair instead of all three."""
        import pyarrow as pa
        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.similarity import (
            embedding_near_dup_pairs,
        )

        v = [1.0, 2.0, 3.0, 4.0]
        t = pa.table({
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array([v, v, v], pa.list_(pa.float64())),
        })
        full = embedding_near_dup_pairs(rd.from_arrow(t), 0.95).take_all()
        capped = embedding_near_dup_pairs(
            rd.from_arrow(t), 0.95, bucket_cap=2).take_all()
        assert len(full) == 3
        assert [(r["a"], r["b"]) for r in capped] == [(1, 2)]

    def test_lsh_index_pruned_read_matches_scan(self, ray_session, emb, tmp_path):
        """The bucket-partitioned index must (a) return exactly what the
        full-scan LSH filter returns and (b) read well under 20% of rows."""
        from neo4j_document_pipeline_ray.extras.similarity import (
            build_ann_index,
            index_scan_fraction,
            lsh_index_topk,
            lsh_topk,
            query_vector,
        )

        q = query_vector("/root/testdata/sf0.001")
        idx = str(tmp_path / "ann_index")
        build_ann_index(emb, idx)
        got = lsh_index_topk(idx, q, k=10, multiprobe=2).take_all()
        want = lsh_topk(emb, q, k=10, multiprobe=2).take_all()
        assert [(r["vec_id"], r["sim"]) for r in got] == [
            (r["vec_id"], r["sim"]) for r in want
        ]
        frac = index_scan_fraction(idx, q, multiprobe=2)
        assert 0 < frac < 0.20, f"index scan fraction {frac:.2%}"

    def test_ann_index_n_planes_threaded(self, ray_session, emb, tmp_path):
        """A non-default n_planes must govern the actual bucketing (not
        just the recorded metadata) and remain queryable."""
        import os

        from neo4j_document_pipeline_ray.extras.similarity import (
            build_ann_index,
            index_scan_fraction,
            lsh_index_topk,
            query_vector,
        )

        idx = str(tmp_path / "np5")
        meta = build_ann_index(emb, idx, n_planes=5)
        assert meta["n_planes"] == 5 and meta["n_rows"] > 0
        bks = [int(d.split("=")[1]) for d in os.listdir(idx)
               if d.startswith("bucket=")]
        assert bks and max(bks) < 32  # 2^5 bucket space
        q = query_vector("/root/testdata/sf0.001")
        assert len(lsh_index_topk(idx, q, k=5, multiprobe=1).take_all()) == 5
        assert 0 < index_scan_fraction(idx, q, multiprobe=1) < 1.0

    def test_label_topk_per_group(self, ray_session, emb):
        from neo4j_document_pipeline_ray.extras.similarity import (
            label_topk,
            query_vector,
        )

        q = query_vector("/root/testdata/sf0.001")
        rows = label_topk(emb, q, k=5).take_all()
        by_label = {}
        for r in rows:
            by_label.setdefault(r["label"], []).append(r["sim"])
        for label, sims in by_label.items():
            assert len(sims) <= 5
            assert sims == sorted(sims, reverse=True)


class TestSemDedup:
    SF = "/root/testdata/sf0.001"

    def test_matches_python_replay(self, ray_session):
        import pyarrow.parquet as pq
        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.similarity import (
            semdedup,
            semdedup_reference,
        )

        emb = rd.read_parquet(f"{self.SF}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        got = {r["vec_id"]: (r["cluster"], r["keep"])
               for r in semdedup(emb, threshold=0.8).take_all()}
        t = pq.read_table(f"{self.SF}/embeddings.parquet")  # file order
        rows = list(zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist()))
        want = semdedup_reference(rows, threshold=0.8)
        assert got == want
        assert len(got) == t.num_rows

    def test_planted_copies_dropped_originals_kept(self, ray_session):
        import __ray_entry__ as entry

        out = entry.queries()["emb_semdedup"](self.SF).take_all()
        by_id = {r["vec_id"]: r for r in out}
        n = len(out) // 2
        assert len(out) == 2 * n
        for vid, r in by_id.items():
            if vid >= 1_000_000:
                # a scaled copy points the same direction: same
                # cluster as its original, cosine exactly 1.0 -> drop
                assert not r["keep"], vid
                assert r["cluster"] == by_id[vid - 1_000_000]["cluster"]
            else:
                # no raw pair reaches 0.95 cosine: originals all stay
                assert r["keep"], vid


class TestIVF:
    @pytest.fixture()
    def emb(self, ray_session):
        import ray.data as rd

        return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")

    def test_full_probe_equals_brute_force(self, ray_session, emb, tmp_path):
        """nprobe = n_centroids reads every partition, so the IVF path
        must reproduce the exact scan bit-for-bit."""
        from neo4j_document_pipeline_ray.extras.similarity import (
            brute_force_topk,
            build_ivf_index,
            ivf_index_topk,
            query_vector,
        )

        q = query_vector("/root/testdata/sf0.001")
        idx = str(tmp_path / "ivf_index")
        meta = build_ivf_index(emb, idx, n_centroids=16)
        assert meta["n_rows"] == 500
        got = ivf_index_topk(idx, q, k=10, nprobe=16).take_all()
        want = brute_force_topk(emb, q, k=10).take_all()
        assert [(r["vec_id"], r["sim"]) for r in got] == [
            (r["vec_id"], r["sim"]) for r in want
        ]

    def test_pruned_probe_recall_and_scan_fraction(self, ray_session, emb, tmp_path):
        from neo4j_document_pipeline_ray.extras.similarity import (
            brute_force_topk,
            build_ivf_index,
            ivf_index_topk,
            ivf_scan_fraction,
            query_vector,
        )

        q = query_vector("/root/testdata/sf0.001")
        idx = str(tmp_path / "ivf_index")
        build_ivf_index(emb, idx, n_centroids=16)
        exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).take_all()}
        approx = {r["vec_id"] for r in
                  ivf_index_topk(idx, q, k=10, nprobe=4).take_all()}
        assert len(exact & approx) >= 7  # recall@10 (measured 0.9 here)
        frac = ivf_scan_fraction(idx, q, nprobe=4)
        assert 0 < frac < 0.5, f"IVF scan fraction {frac:.2%}"

    def test_probe_ranks_query_centroid_first(self, ray_session, emb, tmp_path):
        """The partition holding the query vector itself must be the
        first probed centroid."""
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.extras.similarity import (
            build_ivf_index,
            ivf_probe_centroids,
            query_vector,
        )

        q = query_vector("/root/testdata/sf0.001")
        idx = str(tmp_path / "ivf_index")
        build_ivf_index(emb, idx, n_centroids=16)
        first = ivf_probe_centroids(idx, q, nprobe=1)[0]
        part = pq.read_table(f"{idx}/centroid={first}")
        assert 0 in set(part["vec_id"].to_pylist())

    def test_hash_sample_deterministic_and_unbiased(self, ray_session, emb):
        """The training sample is a pure function of the ids (stable
        across runs) and not a prefix of the input order."""
        import numpy as np
        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.similarity import _hash_sample

        a = _hash_sample(emb, "vec_id", "embedding", 100)
        b = _hash_sample(
            rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet"),
            "vec_id", "embedding", 100)
        assert np.array_equal(a, b)
        assert 25 <= len(a) <= 100  # 1.5x-threshold sample, capped
        # prefix-bias check: reconstruct which ids got sampled
        import pyarrow.parquet as pq
        t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
        by_vec = {tuple(np.asarray(e, dtype=np.float64)): i
                  for i, e in enumerate(t["embedding"].to_pylist())}
        picked = [by_vec[tuple(row)] for row in a]
        assert max(picked) > 250  # reaches past the first half of input

    def test_training_is_deterministic(self):
        import numpy as np

        from neo4j_document_pipeline_ray.extras.similarity import (
            train_ivf_centroids,
        )

        rng = np.random.default_rng(3)
        sample = rng.standard_normal((200, 8))
        a = train_ivf_centroids(sample, 4)
        b = train_ivf_centroids(sample.copy(), 4)
        assert np.array_equal(a, b)
        with pytest.raises(ValueError):
            train_ivf_centroids(sample[:3], 4)


class TestTextStats:
    def test_token_count_matches_python(self, ray_session):
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.extras.textstats import token_count

        got = {r["doc_id"]: r["n_tokens"]
               for r in token_count("/root/testdata/sf0.001").take_all()}
        for row in pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pylist():
            assert got[row["doc_id"]] == len(row["text"].split())

    def test_doc_hybrid_topk_channels(self, ray_session, tmp_path):
        """BM25 rewards query-token-rich docs; the cosine channel must
        equal exact cosine vs the vec_id-0 query; blend = 0.6/0.4."""
        import numpy as np
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.extras.similarity import (
            doc_hybrid_topk,
        )

        d = tmp_path / "hyb"
        d.mkdir()
        texts = ["hash join table scan hash join",   # all query tokens
                 "column stream window batch",        # none
                 "table scan filter group"]           # some
        pq.write_table(pa.Table.from_pylist(
            [{"doc_id": i, "text": t} for i, t in enumerate(texts)]),
            str(d / "documents.parquet"))
        rng = np.random.default_rng(7)
        vecs = rng.normal(size=(3, 8)).astype("float32")
        pq.write_table(pa.Table.from_pylist(
            [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(3)]),
            str(d / "embeddings.parquet"))

        rows = {r["doc_id"]: r for r in doc_hybrid_topk(str(d), k=3).take_all()}
        assert rows[0]["bm25"] > rows[2]["bm25"] > rows[1]["bm25"] == 0.0
        v = vecs.astype(np.float64)
        q = v[0] / np.linalg.norm(v[0])
        for i in range(3):
            cos = float(v[i] @ q / np.linalg.norm(v[i]))
            assert abs(rows[i]["cos_sim"] - round(cos, 6)) < 2e-6
            assert abs(rows[i]["hybrid"]
                       - round(0.6 * rows[i]["bm25"]
                               + 0.4 * rows[i]["cos_sim"], 6)) < 3e-6

    def test_token_pack_greedy_boundaries(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.extras.textstats import token_pack

        # one partition (n_parts=1), capacity 5: docs of 3,3,5,9,0,2
        # tokens pack as [3]->bin0, [3]->bin1 (3+3>5), [5]->bin2,
        # [9 oversize -> own bin3 counted as capacity], [0 -> stays
        # bin3? no: fill=5(capped)>0 and 5+0>5 false -> bin3], [2 ->
        # 5+2>5 -> bin4]
        rows = [
            {"doc_id": i, "text": " ".join(["w"] * n)}
            for i, n in enumerate([3, 3, 5, 9, 0, 2])
        ]
        d = tmp_path / "pack"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = {r["doc_id"]: (r["bin"], r["n_tokens"])
               for r in token_pack(str(d), capacity=5, n_parts=1).take_all()}
        assert got == {0: (0, 3), 1: (1, 3), 2: (2, 5),
                       3: (3, 9), 4: (3, 0), 5: (4, 2)}

    def test_token_pack_partition_locality(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.extras.textstats import token_pack

        rows = [{"doc_id": i, "text": " ".join(["w"] * 4)} for i in range(8)]
        d = tmp_path / "pack2"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        out = token_pack(str(d), capacity=8, n_parts=2).take_all()
        # part = doc_id % 2; within each part, two 4-token docs per bin
        for r in out:
            assert r["part"] == r["doc_id"] % 2
        by_part_bin = {}
        for r in out:
            by_part_bin.setdefault((r["part"], r["bin"]), []).append(r["doc_id"])
        assert {k: sorted(v) for k, v in sorted(by_part_bin.items())} == {
            (0, 0): [0, 2], (0, 1): [4, 6], (1, 0): [1, 3], (1, 1): [5, 7]}

    def test_lang_id(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.extras.textstats import lang_id

        rows = [
            {"doc_id": 0, "text": "the cat and the dog are in the house"},
            {"doc_id": 1, "text": "program ini dan yang itu di kampung untuk semua"},
        ]
        d = tmp_path / "langid"
        d.mkdir()
        pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
        got = {r["doc_id"]: r["pred_lang"] for r in lang_id(str(d)).take_all()}
        assert got == {0: "en", 1: "ms"}

    def test_fingerprint_deterministic(self, ray_session):
        from neo4j_document_pipeline_ray.extras.textstats import fingerprints

        a = sorted((r["doc_id"], r["fingerprint"])
                   for r in fingerprints("/root/testdata/sf0.001").take_all())
        b = sorted((r["doc_id"], r["fingerprint"])
                   for r in fingerprints("/root/testdata/sf0.001").take_all())
        assert a == b
        assert len({fp for _, fp in a}) > 100  # discriminative


class TestMultimodal:
    def test_plumbing(self, ray_session):
        from neo4j_document_pipeline_ray.extras.multimodal import (
            FEATURE_DIM,
            extract_media_features,
            synthesize_media,
        )

        out = extract_media_features(synthesize_media(n=30)).take_all()
        assert len(out) == 30
        for r in out:
            assert len(r["feature"]) == FEATURE_DIM
            assert r["n_bytes"] > 0
            assert abs(float(np.linalg.norm(r["feature"])) - 1.0) < 1e-3

    def test_deterministic(self, ray_session):
        from neo4j_document_pipeline_ray.extras.multimodal import (
            extract_media_features,
            synthesize_media,
        )

        a = {r["media_id"]: list(r["feature"])
             for r in extract_media_features(synthesize_media(n=10)).take_all()}
        b = {r["media_id"]: list(r["feature"])
             for r in extract_media_features(synthesize_media(n=10)).take_all()}
        assert a == b

    def test_real_decoder_is_explicit_stub(self):
        from neo4j_document_pipeline_ray.extras.multimodal import (
            RealDecoder,
            RealImageDecoder,
        )

        with pytest.raises(NotImplementedError):
            RealDecoder("image").decode(b"\x89PNG")
        with pytest.raises(NotImplementedError):
            RealImageDecoder().decode(b"\x89PNG", 2, 2)

    def test_resize_nearest_exact(self):
        from neo4j_document_pipeline_ray.extras.multimodal import resize_nearest

        img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        out = resize_nearest(img, 3, 2)
        assert out.shape == (2, 3, 3)
        # rows map to (0*4)//2=0, (1*4)//2=2; cols to 0, 2, 4
        assert (out == img[[0, 2]][:, [0, 2, 4]]).all()

    def test_resize_stage(self, ray_session):
        from neo4j_document_pipeline_ray.extras.multimodal import (
            resize_images,
            synthesize_media,
        )

        rows = resize_images(synthesize_media(n=30), target=(32, 24)).take_all()
        assert len(rows) == 30
        for r in rows:
            if r["kind"] == "image":
                assert (r["width"], r["height"]) == (32, 24)
                assert len(r["payload"]) == 32 * 24 * 3
            else:
                assert r["payload"] is None and r["width"] is None

    def test_frame_sampling(self, ray_session):
        from neo4j_document_pipeline_ray.extras.multimodal import (
            sample_frames,
            synthesize_media,
        )

        media = synthesize_media(n=30)
        videos = [r for r in media.take_all() if r["kind"] == "video"]
        rows = sample_frames(media, n_frames=4).take_all()
        assert len(rows) == 4 * len(videos)
        by_id: dict = {}
        for r in rows:
            by_id.setdefault(r["media_id"], []).append(r)
            assert len(r["payload"]) == 36 * 64 * 3
        durs = {v["media_id"]: v["duration_ms"] for v in videos}
        for mid, frames in by_id.items():
            ts = sorted(f["ts_ms"] for f in frames)
            # mid-of-segment rule: (i + 0.5) * duration / 4
            want = [int((i + 0.5) * durs[mid] / 4) for i in range(4)]
            assert ts == want


class TestMultiQueryANN:
    def test_each_query_matches_single_query_path(self, ray_session):
        import numpy as np
        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.similarity import (
            brute_force_topk,
            multi_query_topk,
        )

        rng = np.random.default_rng(7)
        n, dim = 200, 16
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
        emb = rd.from_arrow(pa.table({
            "vec_id": pa.array(list(range(n)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        }))
        qids = np.array([3, 7], dtype=np.int64)
        qmat = vecs[[3, 7]].astype(np.float64)
        rows = multi_query_topk(emb, qids, qmat, k=5).take_all()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(
                (r["vec_id"], r["sim"]))
        for qi, qid in enumerate(qids):
            single = [(r["vec_id"], r["sim"]) for r in
                      brute_force_topk(emb, qmat[qi], k=5).take_all()]
            assert by_q[int(qid)] == single
            # the query vector itself is its own best match
            assert by_q[int(qid)][0][0] == int(qid)


class TestSegmentDedup:
    def _run(self, texts, **kw):
        import pyarrow as pa

        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.dedup import segment_dedup

        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }))
        return {r["doc_id"]: (r["n_segments"], r["n_removed"],
                              r["n_tokens_kept"])
                for r in segment_dedup(ds, **kw).take_all()}

    def test_boilerplate_removed_everywhere(self, ray_session):
        # "c1 c2 c3" opens 5 docs -> boilerplate at min_docs=5; the
        # 6th doc has only unique segments
        texts = [f"c1 c2 c3 u{i}a u{i}b u{i}c" for i in range(5)]
        texts.append("z1 z2 z3 z4 z5 z6")
        got = self._run(texts, window=3, min_docs=5)
        for i in range(5):
            assert got[i] == (2, 1, 3)  # 2 segments, 1 removed, 3 kept
        assert got[5] == (2, 0, 6)

    def test_within_doc_repeat_counts_once_for_df(self, ray_session):
        # one doc repeating a segment 10 times is NOT boilerplate:
        # df counts DISTINCT docs
        texts = ["r1 r2 r3 " * 10 + "tail1 tail2 tail3"]
        got = self._run(texts, window=3, min_docs=2)
        assert got[0] == (11, 0, 33)

    def test_short_tail_segment_and_empty_doc(self, ray_session):
        texts = ["a b c d e", "   ", ""]
        got = self._run(texts, window=3, min_docs=2)
        # 5 tokens -> segments "a b c" + "d e"; empty docs emit nothing
        assert got == {0: (2, 0, 5)}

    def test_threshold_boundary(self, ray_session):
        # segment in exactly min_docs-1 docs survives
        texts = [f"k1 k2 k3 u{i}x u{i}y u{i}z" for i in range(4)]
        got = self._run(texts, window=3, min_docs=5)
        assert all(v == (2, 0, 6) for v in got.values())


class TestImportance:
    def _docs(self, rows):
        import pyarrow as pa

        import ray.data as rd

        return rd.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "is_target": pa.array([r[2] for r in rows], pa.bool_()),
        }))

    @staticmethod
    def _reference(rows):
        import math

        from collections import Counter

        c_s, c_t = Counter(), Counter()
        for _, text, tgt in rows:
            for tok in text.lower().split():
                c_s[tok] += 1
                if tgt:
                    c_t[tok] += 1
        v = len(c_s)
        n_s, n_t = sum(c_s.values()), sum(c_t.values())
        out = {}
        for did, text, _ in rows:
            toks = text.lower().split()
            if not toks:
                continue
            s = sum(math.log((c_t[w] + 1) / (n_t + v))
                    - math.log((c_s[w] + 1) / (n_s + v)) for w in toks)
            out[did] = s / len(toks)
        return out

    def test_matches_python_reference(self, ray_session):
        from neo4j_document_pipeline_ray.extras.importance import (
            dsir_importance,
        )

        rows = [
            (1, "alpha beta alpha", True),
            (2, "alpha beta gamma", True),
            (3, "delta delta epsilon", False),
            (4, "alpha delta", False),
            (5, "", False),
        ]
        got = {r["doc_id"]: r["importance"]
               for r in dsir_importance(self._docs(rows)).take_all()}
        want = self._reference(rows)
        assert set(got) == set(want)  # empty doc excluded
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9
        # target-looking docs rank above source-only docs
        assert got[1] > got[3] and got[2] > got[3]


class TestWeightedSample:
    def test_matches_exact_replay_and_is_deterministic(self, ray_session):
        import math

        import pyarrow as pa

        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.sampling import (
            weighted_sample_topk,
        )

        ids = list(range(1, 201))
        w = [(i % 7) for i in ids]  # includes zero weights (i%7==0)
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": pa.array(w, pa.int64()),
        }))

        def replay(k):
            pr = []
            for i, wi in zip(ids, w):
                if wi <= 0:
                    continue
                u = ((i * 2654435761) % 4294967296 + 1) / 4294967297.0
                pr.append((-math.log(u) / wi, i))
            return [i for _, i in sorted(pr)[:k]]

        got = [r["doc_id"] for r in
               weighted_sample_topk(ds, "doc_id", "n_chars", k=25).take_all()]
        assert got == replay(25)
        # zero-weight rows can never be drawn
        assert all(g % 7 != 0 for g in got)
        got2 = [r["doc_id"] for r in
                weighted_sample_topk(ds, "doc_id", "n_chars", k=25).take_all()]
        assert got2 == got


class TestFamiliarityBucket:
    def test_terciles_and_exact_scores(self, ray_session):
        import pyarrow as pa

        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.textstats import (
            familiarity_bucket,
        )

        # "common" appears 6x corpus-wide, each u_i once -> doc fams
        # separate cleanly into three groups of 2
        texts = {
            1: "common common", 2: "common common",          # fam high
            3: "common u3", 4: "common u4",                  # fam mid
            5: "u5a u5b", 6: "u6a u6b",                      # fam low
        }
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        }))
        rows = {r["doc_id"]: r for r in familiarity_bucket(ds).take_all()}
        assert rows[1]["fam"] == 6_000_000  # mean count 6
        assert rows[3]["fam"] == 3_500_000  # (6+1)/2
        assert rows[5]["fam"] == 1_000_000
        assert rows[1]["bucket"] == rows[2]["bucket"] == "head"
        assert rows[3]["bucket"] == rows[4]["bucket"] == "middle"
        assert rows[5]["bucket"] == rows[6]["bucket"] == "tail"


class TestBitextMining:
    def test_matches_numpy_replay(self, ray_session):
        import numpy as np
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.extras.similarity import (
            _read_embeddings,
            bitext_mine,
        )

        sf = "/root/testdata/sf0.001"
        got = {r["src_id"]: (r["dst_id"], r["sim"], r["margin"])
               for r in bitext_mine(_read_embeddings(sf)).take_all()}

        t = pq.read_table(f"{sf}/embeddings.parquet")
        ids = np.asarray(t["vec_id"].to_pylist())
        lab = np.asarray(t["label"].to_pylist())
        m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        u = m / n
        src, dst = np.flatnonzero(lab == 0), np.flatnonzero(lab == 1)
        assert set(got) == set(ids[src])
        for i in src:
            sims = np.round(u[dst] @ u[i], 6)
            order = np.lexsort((ids[dst], -sims))
            best, second = order[0], order[1]
            margin = (round(float(sims[best]) / float(sims[second]), 6)
                      if sims[second] > 0 else 0.0)
            assert got[ids[i]] == (ids[dst][best], sims[best], margin)

    def test_single_candidate_margin_zero(self, ray_session):
        import pandas as pd

        import ray.data

        from neo4j_document_pipeline_ray.extras.similarity import (
            bitext_mine,
        )

        df = pd.DataFrame({
            "vec_id": [1, 2],
            "embedding": [[1.0, 0.0], [0.6, 0.8]],
            "label": [0, 1],
        })
        (row,) = bitext_mine(ray.data.from_pandas(df)).take_all()
        assert (row["src_id"], row["dst_id"]) == (1, 2)
        assert row["margin"] == 0.0


class TestPQ:
    @pytest.fixture()
    def emb(self, ray_session):
        import ray.data as rd

        return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")

    def test_exact_on_codebook_points(self, ray_session, tmp_path):
        """A corpus whose rows all equal one of 16 base vectors (the
        first 16 rows covering every base) trains codebooks that
        reconstruct exactly, so ADC == the exact cosine scan."""
        import numpy as np
        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.similarity import (
            brute_force_topk,
            build_pq_index,
            pq_topk,
        )

        rng = np.random.default_rng(11)
        base = rng.normal(size=(16, 64))
        rows = np.array([base[i % 16] for i in range(200)])
        ds = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(200), pa.int64()),
            "embedding": pa.array(rows.tolist(),
                                  pa.list_(pa.float64())),
        }))
        idx = str(tmp_path / "pq_index")
        meta = build_pq_index(ds, idx)
        assert meta["n_rows"] == 200 and meta["m"] == 8
        q = rng.normal(size=64)
        got = pq_topk(idx, q, k=10).take_all()
        want = brute_force_topk(ds, q, k=10).take_all()
        assert [(r["vec_id"], r["sim"]) for r in got] == [
            (r["vec_id"], r["sim"]) for r in want]

    def test_rerank_recall_and_compression(self, ray_session, emb, tmp_path):
        from neo4j_document_pipeline_ray.extras.similarity import (
            brute_force_topk,
            build_pq_index,
            pq_bytes_per_vector,
            pq_topk,
            query_vector,
        )

        q = query_vector("/root/testdata/sf0.001")
        idx = str(tmp_path / "pq_index")
        meta = build_pq_index(emb, idx)
        pq_b, raw_b = pq_bytes_per_vector(meta)
        assert raw_b // pq_b == 32  # dim 64 float32 -> 8 uint8 codes
        exact = {r["vec_id"]
                 for r in brute_force_topk(emb, q, k=10).take_all()}
        approx = {r["vec_id"]
                  for r in pq_topk(idx, q, k=10, rerank=50,
                                   embeddings=emb).take_all()}
        assert len(exact & approx) >= 6, (exact, approx)

    def test_rerank_head_is_exactly_scored(self, ray_session, emb, tmp_path):
        """Every vec_id the reranked head returns must carry its EXACT
        cosine (identical to the brute-force sim for that id)."""
        from neo4j_document_pipeline_ray.extras.similarity import (
            brute_force_topk,
            build_pq_index,
            pq_topk,
            query_vector,
        )

        q = query_vector("/root/testdata/sf0.001")
        idx = str(tmp_path / "pq_index")
        build_pq_index(emb, idx)
        exact = {r["vec_id"]: r["sim"]
                 for r in brute_force_topk(emb, q, k=500).take_all()}
        for r in pq_topk(idx, q, k=10, rerank=50,
                         embeddings=emb).take_all():
            assert exact[r["vec_id"]] == r["sim"]


class TestIVFUpdate:
    def test_appended_vectors_are_queryable_exactly(self, ray_session,
                                                    tmp_path):
        """Build on the first half, fold in the second half: a full
        probe over the updated index must equal brute force over the
        WHOLE corpus."""
        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.similarity import (
            brute_force_topk,
            build_ivf_index,
            ivf_index_topk,
            query_vector,
            read_index_meta,
            update_ivf_index,
        )

        emb = rd.read_parquet(
            "/root/testdata/sf0.001/embeddings.parquet")
        first = emb.filter(lambda r: r["vec_id"] < 250)
        second = emb.filter(lambda r: r["vec_id"] >= 250)
        idx = str(tmp_path / "ivf_index")
        build_ivf_index(first, idx, n_centroids=8, train_rows=250)
        assert read_index_meta(idx)["n_rows"] == 250
        meta = update_ivf_index(second, idx)
        assert meta["n_rows"] == 500
        q = query_vector("/root/testdata/sf0.001")
        got = ivf_index_topk(idx, q, k=10, nprobe=8).take_all()
        want = brute_force_topk(emb, q, k=10).take_all()
        assert [(r["vec_id"], r["sim"]) for r in got] == [
            (r["vec_id"], r["sim"]) for r in want]

    def test_update_is_rerunnable_after_partial_state(self, ray_session,
                                                      tmp_path):
        """Meta n_rows is footer-derived, so a second update over a
        disjoint slice lands on top of the first cleanly."""
        import ray.data as rd

        from neo4j_document_pipeline_ray.extras.similarity import (
            build_ivf_index,
            read_index_meta,
            update_ivf_index,
        )

        emb = rd.read_parquet(
            "/root/testdata/sf0.001/embeddings.parquet")
        idx = str(tmp_path / "ivf_index")
        build_ivf_index(emb.filter(lambda r: r["vec_id"] < 200), idx,
                        n_centroids=8, train_rows=200)
        update_ivf_index(
            emb.filter(lambda r: 200 <= r["vec_id"] < 350), idx)
        update_ivf_index(emb.filter(lambda r: r["vec_id"] >= 350), idx)
        assert read_index_meta(idx)["n_rows"] == 500


class TestNBLangClassifier:
    SF = "/root/testdata/sf0.001"

    def test_matches_duckdb_replay(self, ray_session):
        import duckdb

        from neo4j_document_pipeline_ray.extras.textstats import (
            NB_LANG_SQL,
            nb_lang_classifier,
        )

        got = (nb_lang_classifier(self.SF).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{self.SF}/documents.parquet')")
        want = (con.execute(NB_LANG_SQL).df()
                .sort_values("doc_id").reset_index(drop=True))
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["pred_lang"].tolist() == want["pred_lang"].tolist()
        assert (got["score_scaled"].to_numpy(np.int64)
                == want["score_scaled"].to_numpy(np.int64)).all()

    def test_self_train_beats_majority_baseline(self, ray_session):
        """The synthetic corpus's lang label is only weakly coupled to
        its (shared-vocabulary) text, so the contract is: training-set
        accuracy strictly above the majority-class baseline — i.e. the
        classifier learned SOMETHING — and no invented classes."""
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.extras.textstats import (
            nb_lang_classifier,
        )

        pred = nb_lang_classifier(self.SF).to_pandas()
        truth = pq.read_table(
            f"{self.SF}/documents.parquet", columns=["doc_id", "lang"]
        ).to_pandas()
        m = pred.merge(truth, on="doc_id")
        assert len(m) == len(truth)
        assert set(m["pred_lang"]) <= set(truth["lang"])
        acc = (m["pred_lang"] == m["lang"]).mean()
        majority = truth["lang"].value_counts(normalize=True).max()
        assert acc > majority, (acc, majority)

    def test_separable_corpus_is_perfect(self, ray_session, tmp_path):
        """Disjoint per-class vocabularies -> NB must recover every
        label exactly (and ties on the all-unseen doc break to the
        lexicographically smallest class in BOTH engines)."""
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.extras.textstats import (
            nb_lang_classifier,
        )

        rows = []
        words = {"aa": "rot blau grun", "bb": "rouge bleu vert",
                 "cc": "rojo azul verde"}
        i = 0
        for lang, vocab in words.items():
            for _ in range(6):
                rows.append({"doc_id": i, "lang": lang,
                             "text": vocab + " " + vocab.split()[i % 3]})
                i += 1
        rows.append({"doc_id": i, "lang": "aa", "text": "zzz unseen"})
        t = pa.Table.from_pylist(rows)
        pq.write_table(t, str(tmp_path / "documents.parquet"))
        pred = (nb_lang_classifier(str(tmp_path)).to_pandas()
                .sort_values("doc_id"))
        # all-unseen doc: identical unseen-token mass, prior breaks the
        # tie toward the (equal-count) lexicographically smallest class
        assert pred["pred_lang"].tolist()[:-1] == (
            ["aa"] * 6 + ["bb"] * 6 + ["cc"] * 6)
        assert pred["pred_lang"].tolist()[-1] == "aa"


class TestAnnRecall:
    @pytest.fixture()
    def emb(self, ray_session):
        import ray.data as rd

        return rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")

    def _indexes(self, emb, tmp_path):
        from neo4j_document_pipeline_ray.extras.similarity import (
            build_ann_index,
            build_ivf_index,
        )

        lsh = str(tmp_path / "lsh")
        ivf = str(tmp_path / "ivf")
        build_ann_index(emb, lsh)
        build_ivf_index(emb, ivf, n_centroids=16)
        return lsh, ivf

    def test_full_probe_recall_is_one(self, ray_session, emb, tmp_path):
        """IVF with nprobe = n_centroids reads everything -> 1000
        milli-recall for every query, by the exactness pin."""
        import numpy as np

        from neo4j_document_pipeline_ray.extras.similarity import (
            ann_recall_report,
            query_matrix,
        )

        lsh, ivf = self._indexes(emb, tmp_path)
        qids, qmat = query_matrix("/root/testdata/sf0.001", [0, 1])
        rows = ann_recall_report(
            emb, lsh, ivf, np.asarray(qids), qmat,
            k=10, multiprobe=2, nprobe=16).take_all()
        assert len(rows) == 4  # 2 methods x 2 queries
        ivf_rows = [r for r in rows if r["method"] == "ivf"]
        assert all(r["recall_milli"] == 1000 and r["n_hit"] == 10
                   for r in ivf_rows)
        for r in rows:
            assert 0 <= r["recall_milli"] <= 1000
            assert r["n_hit"] <= 10

    def test_deterministic(self, ray_session, emb, tmp_path):
        import numpy as np

        from neo4j_document_pipeline_ray.extras.similarity import (
            ann_recall_report,
            query_matrix,
        )

        lsh, ivf = self._indexes(emb, tmp_path)
        qids, qmat = query_matrix("/root/testdata/sf0.001", [0, 1, 2])

        def run():
            return sorted(
                (r["method"], r["query_id"], r["n_hit"],
                 r["recall_milli"])
                for r in ann_recall_report(
                    emb, lsh, ivf, np.asarray(qids), qmat,
                    k=10, multiprobe=2, nprobe=4).take_all())

        assert run() == run()
