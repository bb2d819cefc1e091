"""Unit tests for the scalar kernels vs reference semantics."""

from hypothesis import given, strategies as st

from neo4j_document_pipeline_ray.functions.textnorm import (
    canonicalize_text,
    clean_name,
    norm_space,
    normalize_name_for_key,
    safe_label,
    sha256_hex,
    stable_id,
    to_json_compact,
)


class TestCanonicalize:
    def test_crlf_and_cr(self):
        assert canonicalize_text("a\r\nb\rc") == "a\nb\nc"

    def test_newline_runs(self):
        assert canonicalize_text("a\n\n\n\nb") == "a\n\nb"
        assert canonicalize_text("a\n\nb") == "a\n\nb"

    def test_trailing_ws_per_line(self):
        assert canonicalize_text("a  \t\nb\t ") == "a\nb"

    def test_space_runs(self):
        assert canonicalize_text("a   b\tc") == "a b\tc"  # single tab kept
        assert canonicalize_text("a \t b") == "a b"

    def test_strip_and_empty(self):
        assert canonicalize_text("  x  ") == "x"
        assert canonicalize_text(None) == ""
        assert canonicalize_text("") == ""

    @given(st.text())
    def test_idempotent(self, s):
        once = canonicalize_text(s)
        assert canonicalize_text(once) == once


class TestSafeLabel:
    def test_basic(self):
        assert safe_label("Time Period") == "Time_Period"
        assert safe_label("hasTimeline") == "hasTimeline"

    def test_fallbacks(self):
        assert safe_label(None) == "Entity"
        assert safe_label("", "RELATED_TO") == "RELATED_TO"

    def test_whitespace_only_reference_quirk(self):
        # reference: "   " passes the falsy check, strips to ""
        assert safe_label("   ") == ""

    def test_specials_and_truncation(self):
        assert safe_label("a-b.c") == "a_b_c"
        assert safe_label("x" * 100) == "x" * 64


class TestNormalizeKey:
    def test_number_words(self):
        assert normalize_name_for_key("Six Pillars") == "6 pillars"
        assert normalize_name_for_key("six pillars") == "6 pillars"
        assert normalize_name_for_key("6 Pillars") == "6 pillars"
        assert normalize_name_for_key("Six Pillars.") == "6 pillars"

    def test_punctuation_and_spaces(self):
        assert normalize_name_for_key("MyDigital-Initiative") == "mydigital initiative"
        assert normalize_name_for_key("  A,,B  ") == "a b"

    def test_only_whole_tokens_mapped(self):
        assert normalize_name_for_key("onefield") == "onefield"

    def test_empty(self):
        assert normalize_name_for_key(None) == ""


class TestCleanName:
    def test_primitives(self):
        assert clean_name("x") == "x"
        assert clean_name(5) == "5"
        assert clean_name(True) == "True"
        assert clean_name(None) is None

    def test_dict_json_compact(self):
        assert clean_name({"start": "2021", "end": ""}) == '{"start":"2021","end":""}'


class TestHashing:
    def test_sha256(self):
        assert sha256_hex("abc") == (
            "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
        )

    def test_stable_id_matches_duckdb_formula(self):
        import duckdb

        for key in ["6 pillars", "", "united states"]:
            expected = duckdb.sql(
                f"SELECT CAST(concat('0x', substr(sha256('{key}'),1,15)) AS BIGINT)"
            ).fetchone()[0]
            assert stable_id(key) == expected


def test_norm_space():
    assert norm_space(" a \t b\nc ") == "a b c"
    assert norm_space(None) == ""


def test_to_json_compact():
    assert to_json_compact({"a": 1}) == '{"a":1}'
