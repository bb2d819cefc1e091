from hypothesis import given, settings, strategies as st

from neo4j_document_pipeline_ray.functions import tokenizer
from neo4j_document_pipeline_ray.functions.chunking import chunk_text, split_by_tokens


class TestTokenizer:
    @given(st.text())
    @settings(max_examples=200)
    def test_lossless_roundtrip(self, s):
        assert tokenizer.decode(tokenizer.encode(s)) == s

    def test_count_matches_encode(self):
        for s in ["", "hello world", "a1 b2 -- c!", "x\n\ny"]:
            assert tokenizer.count_tokens(s) == len(tokenizer.encode(s))

    def test_word_scale(self):
        # roughly one token per word for plain prose
        s = "the quick brown fox jumps over the lazy dog"
        assert 9 <= tokenizer.count_tokens(s) <= 12


class TestSplitByTokens:
    def test_concat_preserves_text(self):
        s = "one two three four five six seven eight nine ten"
        parts = split_by_tokens(s, 3)
        assert "".join(parts) == s

    def test_window_sizes(self):
        s = " ".join(f"w{i}" for i in range(100))
        parts = split_by_tokens(s, 10)
        assert all(tokenizer.count_tokens(p) <= 10 for p in parts)


class TestChunker:
    def test_single_small_doc(self):
        assert chunk_text("hello world", 100) == ["hello world"]

    def test_empty(self):
        assert chunk_text("", 100) == []
        assert chunk_text("\n\n\n", 100) == []

    def test_budget_respected(self):
        paras = [" ".join(f"p{i}w{j}" for j in range(30)) for i in range(20)]
        doc = "\n\n".join(paras)
        for c in chunk_text(doc, 50):
            assert tokenizer.count_tokens(c) <= 50

    def test_greedy_packing(self):
        # two 10-token paragraphs fit one 30-token chunk
        doc = "a b c d e f g h i j\n\nk l m n o p q r s t"
        chunks = chunk_text(doc, 50)
        assert len(chunks) == 1
        assert chunks[0] == doc

    def test_oversize_paragraph_sliced(self):
        big = " ".join(f"w{i}" for i in range(500))
        chunks = chunk_text(f"intro\n\n{big}\n\noutro", 100)
        assert len(chunks) > 3
        for c in chunks:
            assert tokenizer.count_tokens(c) <= 100

    def test_paragraphs_never_split_when_they_fit(self):
        import string

        words = ["".join(w) for w in __import__("itertools").product(string.ascii_lowercase, repeat=2)]
        paras = [" ".join(words[i * 30 : (i + 1) * 30]) for i in range(10)]
        doc = "\n\n".join(paras)
        got_paras = []
        for c in chunk_text(doc, 70):
            got_paras.extend(c.split("\n\n"))
        assert got_paras == paras

    @given(
        st.lists(
            st.text(alphabet="abc def\n", min_size=1, max_size=80), min_size=1, max_size=12
        )
    )
    @settings(max_examples=50)
    def test_content_preserved_modulo_paragraph_joins(self, paras):
        from neo4j_document_pipeline_ray.functions.textnorm import canonicalize_text

        doc = canonicalize_text("\n\n".join(paras))
        chunks = chunk_text(doc, 40)
        # re-joining all chunk paragraphs reproduces the doc's paragraphs
        # except where an oversize paragraph was token-sliced
        rejoined = "\n\n".join(chunks)
        src_words = doc.replace("\n", " ").split()
        out_words = rejoined.replace("\n", " ").split()
        assert src_words == out_words


class TestChunksSQLOracle:
    def test_sql_mirror_matches_chunk_text(self, tmp_path):
        """chunks_sql reproduces chunk_text exactly — packing, flushes,
        and the oversize token-slicing branch — chunk_id included."""
        import hashlib

        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from neo4j_document_pipeline_ray.functions.chunking import chunks_sql

        texts = [
            "hello world",                                   # single chunk
            "",                                              # no chunks
            "\n\n".join("para %d word " % i * 8 for i in range(40)),  # packing
            "x " * 900,                                      # oversize para
            ("small para\n\n" + "y " * 900 + "\n\nanother tail para"),
        ]
        f = tmp_path / "pages.parquet"
        pq.write_table(pa.table({"text": pa.array(texts, pa.string())}), f)

        want = set()
        for t in texts:
            doc_id = hashlib.sha256(t.encode()).hexdigest()
            for idx, c in enumerate(chunk_text(t, 200, 0)):
                want.add((doc_id, idx, hashlib.sha256(c.encode()).hexdigest()))
        assert len({d for d, _, _ in want}) == 4  # empty doc emits nothing
        assert max(i for _, i, _ in want) >= 3    # multi-chunk docs present

        got = set(map(tuple,
                      duckdb.execute(chunks_sql(str(f), 200)).fetchall()))
        assert got == want
