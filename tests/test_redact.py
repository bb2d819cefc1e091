"""Blocklist / PII scrubbing (extras/redact.py) and the corpus-LM
unigram log-probability score (extras/textstats.py)."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


class TestBlocklistPattern:
    def test_sorted_and_deduped(self):
        from neo4j_document_pipeline_ray.extras.redact import (
            blocklist_pattern,
        )

        assert (blocklist_pattern(["b", "a", "b"])
                == blocklist_pattern(("a", "b")))
        with pytest.raises(ValueError):
            blocklist_pattern([])


class TestScrub:
    def test_blocklist_whole_word(self, ray_session, tmp_path):
        from neo4j_document_pipeline_ray.extras.redact import (
            scrub_blocklist,
        )

        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([
                "spark and sparkle",        # word hit, substring miss
                "customer spark customer",  # three hits
                "nothing here",
            ], pa.string()),
        }), tmp_path / "documents.parquet")
        got = {r["doc_id"]: r for r in scrub_blocklist(
            str(tmp_path), terms=("spark", "customer")).take_all()}
        assert got[1]["n_scrubbed"] == 1
        assert got[1]["scrubbed"] == "[SCRUBBED] and sparkle"
        assert got[2]["n_scrubbed"] == 3
        assert got[2]["scrubbed"] == "[SCRUBBED] [SCRUBBED] [SCRUBBED]"
        assert got[3]["n_scrubbed"] == 0
        assert got[3]["scrubbed"] == "nothing here"

    def test_pii_patterns(self, ray_session, tmp_path):
        from neo4j_document_pipeline_ray.extras.redact import scrub_pii

        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "mail bob.smith+x@ex-ample.co.uk now",
                "call +1 (555) 123-4567 or 555.987.6543",
                "host 192.168.0.1 responded",
                "versions 1.2 and 3.4.5 are fine",  # not an IPv4
            ], pa.string()),
        }), tmp_path / "documents.parquet")
        got = {r["doc_id"]: r for r in scrub_pii(str(tmp_path)).take_all()}
        assert got[1]["scrubbed"] == "mail [SCRUBBED] now"
        assert got[2]["n_scrubbed"] == 2
        assert "555" not in got[2]["scrubbed"]
        assert got[3]["scrubbed"] == "host [SCRUBBED] responded"
        assert got[4]["n_scrubbed"] == 0

    def test_all_docs_kept(self, ray_session):
        from neo4j_document_pipeline_ray.extras.redact import (
            scrub_blocklist,
        )

        n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
        assert scrub_blocklist(SF).count() == n_docs


class TestUnigramLogprob:
    def test_hand_computed(self, ray_session, tmp_path):
        from neo4j_document_pipeline_ray.extras.textstats import (
            unigram_logprob,
        )

        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([
                "a a b",   # counts: a=3, b=2, c=1 over both docs
                "A b  c",  # lowercased + multi-space split
                "",        # empty: no output row
            ], pa.string()),
        }), tmp_path / "documents.parquet")
        got = {r["doc_id"]: r for r in
               unigram_logprob(str(tmp_path)).take_all()}
        tot = 6.0
        la, lb, lc = (math.log(3 / tot), math.log(2 / tot),
                      math.log(1 / tot))
        assert set(got) == {1, 2}
        assert got[1]["n_tokens"] == 3
        assert got[1]["avg_logprob"] == pytest.approx((2 * la + lb) / 3)
        assert got[2]["n_tokens"] == 3
        assert got[2]["avg_logprob"] == pytest.approx((la + lb + lc) / 3)

    def test_corpus_scores_bounded(self, ray_session):
        from neo4j_document_pipeline_ray.extras.textstats import (
            unigram_logprob,
        )

        df = unigram_logprob(SF).to_pandas()
        n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
        assert len(df) == n_docs  # sf0.001 has no empty docs
        assert (df["avg_logprob"] < 0).all()
        assert np.isfinite(df["avg_logprob"]).all()
