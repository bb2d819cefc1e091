"""HTTPEmbedderBackend: the reference's vLLM /embeddings client
semantics (batch POST + index re-sort, 3-attempt exponential backoff,
per-item fallback after a failed batch — ``ingestMD.py:222-284``,
``graphutil.py:81-153``) exercised unit-level and end-to-end through
the actor-pool embedding stage with a mock HTTP server.
"""

from types import SimpleNamespace

import numpy as np
import pytest

from neo4j_document_pipeline_ray.stages.embed import (
    HashEmbedder,
    HTTPEmbedderBackend,
)

DIM = 8
_REF = HashEmbedder(DIM)


def _vec(text: str):
    return [float(x) for x in _REF.embed([text])[0]]


class MockSession:
    """httpx.Client surface: post() -> response with raise_for_status
    + json().  Serves HashEmbedder vectors; programmable failures."""

    def __init__(self, fail_first_n=0, poison=None, shuffle_index=False):
        self.fail_first_n = fail_first_n      # fail the first N requests
        self.poison = poison                  # text that always errors
        self.shuffle_index = shuffle_index    # serve items out of order
        self.requests = []

    def post(self, path, json=None):
        assert path == "/embeddings"
        texts = json["input"]
        self.requests.append(list(texts))
        if self.fail_first_n > 0:
            self.fail_first_n -= 1
            raise ConnectionError("mock endpoint down")
        if self.poison is not None and self.poison in texts:
            raise RuntimeError("poison item in batch")
        items = [{"index": i, "embedding": _vec(t)}
                 for i, t in enumerate(texts)]
        if self.shuffle_index:
            items = items[::-1]  # reversed, index field still correct
        payload = {"data": items}
        return SimpleNamespace(raise_for_status=lambda: None,
                               json=lambda: payload)


def _backend(session, **kw):
    sleeps = []
    be = HTTPEmbedderBackend(
        lambda: session, dim=DIM, sleep=sleeps.append, **kw)
    return be, sleeps


class TestUnit:
    def test_lazy_session_and_batch_roundtrip(self):
        calls = {"n": 0}
        sess = MockSession()

        def factory():
            calls["n"] += 1
            return sess

        be = HTTPEmbedderBackend(factory, dim=DIM, sleep=lambda s: None)
        assert calls["n"] == 0  # nothing built on the driver
        out = be.embed(["a", "b"])
        assert calls["n"] == 1
        assert out.shape == (2, DIM) and out.dtype == np.float32
        assert np.array_equal(out, _REF.embed(["a", "b"]))
        be.embed(["c"])
        assert calls["n"] == 1  # session reused
        # ONE batch POST per embed() call
        assert sess.requests == [["a", "b"], ["c"]]

    def test_index_resort(self):
        be, _ = _backend(MockSession(shuffle_index=True))
        out = be.embed(["x", "y", "z"])
        assert np.array_equal(out, _REF.embed(["x", "y", "z"]))

    def test_backoff_then_success(self):
        """graphutil.py:92 — waits 0.5 s then 1 s, succeeds on the 3rd."""
        be, sleeps = _backend(MockSession(fail_first_n=2))
        out = be.embed(["a"])
        assert np.array_equal(out, _REF.embed(["a"]))
        assert sleeps == [0.5, 1.0]
        assert be.n_failed == 0

    def test_batch_fail_falls_back_per_item(self):
        """ingestMD.py:278-284 — after the batch request exhausts its
        retries, each item gets its own request; the good items
        survive, the poison item becomes a zero vector."""
        sess = MockSession(poison="BAD")
        be, sleeps = _backend(sess)
        out = be.embed(["good1", "BAD", "good2"])
        assert np.array_equal(out[0], _REF.embed(["good1"])[0])
        assert np.array_equal(out[2], _REF.embed(["good2"])[0])
        assert not out[1].any()           # zero vector
        assert be.n_failed == 1
        # 3 batch attempts, then 1 per good item, 3 per poison item
        assert len(sess.requests) == 3 + 1 + 3 + 1
        # backoff paid inside the batch retries and the poison retries
        assert sleeps == [0.5, 1.0, 0.5, 1.0]

    def test_total_failure_raises_nothing_returns_zeros(self):
        be, _ = _backend(MockSession(fail_first_n=100))
        out = be.embed(["a", "b"])
        assert out.shape == (2, DIM) and not out.any()
        assert be.n_failed == 2

    def test_dim_probe_mismatch_raises(self):
        sess = MockSession()
        be = HTTPEmbedderBackend(lambda: sess, dim=DIM + 1,
                                 sleep=lambda s: None)
        with pytest.raises(RuntimeError, match="dim"):
            be.embed(["a"])


class TestEndToEnd:
    def test_build_embeddings_with_mock_http_equals_default(
        self, ray_session, small_corpus
    ):
        """The HTTP backend through the ACTOR POOL must reproduce the
        default hash-embedder table exactly: the mock server answers
        with HashEmbedder vectors, so any difference is a bug in the
        backend plumbing (batching, ordering, actor lifecycle).

        The factory is defined INSIDE the test so cloudpickle ships it
        by value (this module is not importable in Ray workers)."""
        import ray.data as rd

        def mock_factory():
            from types import SimpleNamespace as NS

            from neo4j_document_pipeline_ray.stages.embed import (
                HashEmbedder as HE,
            )

            ref = HE(64)

            def post(path, json=None):
                texts = json["input"]
                vecs = ref.embed(texts)
                payload = {"data": [
                    {"index": i, "embedding": [float(x) for x in vecs[i]]}
                    for i in range(len(texts))
                ]}
                return NS(raise_for_status=lambda: None,
                          json=lambda: payload)

            return NS(post=post)

        from neo4j_document_pipeline_ray.config import PipelineConfig
        from neo4j_document_pipeline_ray.pipelines.kg_build import (
            extract_docs,
        )
        from neo4j_document_pipeline_ray.stages.chunker import chunk_docs
        from neo4j_document_pipeline_ray.stages.embed import build_embeddings
        from neo4j_document_pipeline_ray.stages.normalize import (
            normalize_triples,
        )
        from neo4j_document_pipeline_ray.stages.triple_extract import (
            extract_triples,
        )

        pages = rd.read_parquet(small_corpus["pages"], columns=["url", "html"])
        cfg = PipelineConfig(extract_concurrency=2, embed_concurrency=2,
                             join_partitions=4)
        docs = extract_docs(pages, cfg)
        norm = normalize_triples(
            extract_triples(chunk_docs(docs, cfg), cfg), cfg).materialize()

        def frame(ds):
            return ds.to_pandas().sort_values("text_key").reset_index(
                drop=True)

        want = frame(build_embeddings(norm, cfg))
        got = frame(build_embeddings(
            norm, cfg,
            backend=HTTPEmbedderBackend(mock_factory, dim=64)))
        assert len(want) > 0
        assert len(got) == len(want)
        assert want.equals(got)
