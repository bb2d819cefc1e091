"""The chat-completion extraction backend + the reference's response
parse hardening (ingestMD.py:123-156), exercised end-to-end through the
actor-pool extraction stage with a mock OpenAI-style client.
"""

import json
from types import SimpleNamespace

import pytest

from neo4j_document_pipeline_ray.stages.triple_extract import (
    LLMTripleBackend,
    parse_llm_triples,
)

TRIPLE = {"subject": "A", "predicate": "funds", "object": "B",
          "subject_type": "Policy", "object_type": "Target"}
JS = json.dumps([TRIPLE])


class TestParseHardening:
    def test_plain_list(self):
        assert parse_llm_triples(JS) == [TRIPLE]

    def test_fenced(self):
        assert parse_llm_triples(f"```\n{JS}\n```") == [TRIPLE]

    def test_fenced_json_tag(self):
        assert parse_llm_triples(f"```json\n{JS}\n```") == [TRIPLE]

    def test_prose_around_array(self):
        assert parse_llm_triples(f"Here you go:\n{JS}\nHope it helps!") == [TRIPLE]

    def test_prose_and_fence(self):
        assert parse_llm_triples(f"Sure!\n```json\n{JS}\n```\ndone") == [TRIPLE]

    def test_non_list_json(self):
        assert parse_llm_triples('{"subject": "A"}') == []

    def test_non_dict_items_dropped(self):
        assert parse_llm_triples(json.dumps([TRIPLE, "junk", 3])) == [TRIPLE]

    def test_garbage(self):
        assert parse_llm_triples("not json at all") == []

    def test_empty_and_none(self):
        assert parse_llm_triples("") == []
        assert parse_llm_triples(None) == []


def _response(content: str):
    return SimpleNamespace(
        choices=[SimpleNamespace(message=SimpleNamespace(content=content))]
    )


class MockLLMClient:
    """OpenAI-surface mock: answers with the rule extractor's triples for
    the chunk, wrapped in the messy formats real models emit."""

    def __init__(self, fail_marker: str | None = None):
        self._fail = fail_marker
        self.chat = SimpleNamespace(
            completions=SimpleNamespace(create=self._create)
        )

    def _create(self, model, messages, temperature):
        from neo4j_document_pipeline_ray.functions.rules import (
            extract_rule_triples,
        )

        text = messages[1]["content"].split("Text:\n", 1)[1]
        if self._fail and self._fail in text:
            raise ConnectionError("mock endpoint down")
        triples = extract_rule_triples(text)
        js = json.dumps(triples)
        # deterministic per-chunk variety of response dressings
        style = sum(text.encode()[:16]) % 3
        if style == 0:
            content = f"```json\n{js}\n```"
        elif style == 1:
            content = f"Here are the extracted triples:\n{js}\nLet me know!"
        else:
            content = f"```\n{js}\n```"
        return _response(content)


_FACTORY_CALLS = {"n": 0}


def _mock_factory():
    _FACTORY_CALLS["n"] += 1
    return MockLLMClient()


class TestBackend:
    def test_lazy_client_and_roundtrip(self):
        _FACTORY_CALLS["n"] = 0
        be = LLMTripleBackend(_mock_factory)
        assert _FACTORY_CALLS["n"] == 0  # nothing built on the driver
        out = be('The Policy "P One" delivers the Target "T Two".')
        assert _FACTORY_CALLS["n"] == 1
        assert out and all(isinstance(t, dict) for t in out)
        be("more text")
        assert _FACTORY_CALLS["n"] == 1  # client reused

    def test_request_failure_returns_empty(self):
        be = LLMTripleBackend(lambda: MockLLMClient(fail_marker="BOOM"))
        assert be("BOOM please") == []


class TestEndToEnd:
    def test_build_kg_with_mock_llm_equals_rule_truth(
        self, ray_session, small_corpus
    ):
        """The mock-HTTP backend through the ACTOR POOL must reproduce
        the rule-backend KG exactly: the model responses are the rule
        triples in fenced/prose dressing, so any difference would be a
        bug in the backend plumbing or the parse hardening.

        The factory is defined INSIDE this function so cloudpickle ships
        it by value — this test module is not importable in Ray worker
        processes, and a by-reference pickle of a module-level mock
        makes actor construction fail and the pool retry forever."""
        import ray.data as rd

        def mock_factory():
            from types import SimpleNamespace as NS
            import json as _json

            def create(model, messages, temperature):
                from neo4j_document_pipeline_ray.functions.rules import (
                    extract_rule_triples,
                )

                text = messages[1]["content"].split("Text:\n", 1)[1]
                js = _json.dumps(extract_rule_triples(text))
                style = sum(text.encode()[:16]) % 3
                content = [
                    f"```json\n{js}\n```",
                    f"Here are the extracted triples:\n{js}\nLet me know!",
                    f"```\n{js}\n```",
                ][style]
                return NS(choices=[NS(message=NS(content=content))])

            return NS(chat=NS(completions=NS(create=create)))

        from neo4j_document_pipeline_ray.config import PipelineConfig
        from neo4j_document_pipeline_ray.pipelines.kg_build import build_kg
        from neo4j_document_pipeline_ray.stages.triple_extract import (
            make_llm_backend,
        )

        pages = rd.read_parquet(small_corpus["pages"], columns=["url", "html"])
        cfg = PipelineConfig(extract_concurrency=2, embed_concurrency=2,
                             join_partitions=4)
        want = build_kg(pages, cfg, with_embeddings=False)
        got = build_kg(pages, cfg, with_embeddings=False,
                       extract_backend=make_llm_backend(mock_factory))
        import numpy as _np

        def canon(df):
            df = df.copy()
            for c in df.columns:
                if df[c].map(
                    lambda x: isinstance(x, (list, tuple, _np.ndarray))
                ).any():  # sources is list-typed; compare via stable JSON
                    df[c] = df[c].map(lambda x: json.dumps(list(x)))
            return df.sort_values(list(df.columns)).reset_index(drop=True)

        for name in ("nodes", "edges", "mentions"):
            w = canon(want[name].to_pandas())
            g = canon(got[name].to_pandas())
            assert g.equals(w), f"{name} differs between mock-LLM and rule backends"
