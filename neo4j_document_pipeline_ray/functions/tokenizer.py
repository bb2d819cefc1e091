"""Deterministic tokenizer used for chunk budgeting.

The reference counts tokens with tiktoken's ``cl100k_base``
(``ingestMD.py:32``).  tiktoken is unavailable in this environment (and
pulls network-downloaded vocabularies), so the engine defines its own
deterministic, dependency-free tokenizer with the same *role*: a
monotone token count for greedy chunk packing, plus an exact
encode/slice/decode roundtrip for splitting oversize paragraphs
(reference ``ingestMD.py:74-81``).

Tokens are maximal runs matched by a BPE-shaped regex (word with
optional leading spaces, number, punctuation run, whitespace run).  The
concatenation of the token list is exactly the input string, so slicing
by token indices and re-joining is lossless — the property
``_split_by_tokens`` relies on.

This is a documented divergence from the reference: chunk *boundaries*
differ from a tiktoken-based run, but chunking is an internal batching
concern — the emitted triple set (the conformance target, P/R vs the
oracle) does not depend on where chunk boundaries fall for the corpus
shapes the extractors handle (paragraphs are never split mid-sentence
unless a single paragraph exceeds the whole chunk budget).
"""

from __future__ import annotations

import re
from typing import List

# Order matters: space-prefixed word/number/punct first (BPE-style leading
# space absorption), bare whitespace runs last.  Every character matches
# some alternative, so ``"".join(encode(s)) == s`` for all s.
_TOKEN_RE = re.compile(
    r"[ \t]*[A-Za-z]+(?:'[A-Za-z]+)?"   # word, optional apostrophe suffix
    r"|[ \t]*[0-9]+"                    # number run
    r"|[ \t]*[^\sA-Za-z0-9]+"           # punctuation/symbol run
    r"|\s+"                             # whitespace (incl. newlines)
)


def encode(text: str) -> List[str]:
    """Split ``text`` into tokens; lossless: ``''.join(encode(t)) == t``."""
    if not text:
        return []
    return _TOKEN_RE.findall(text)


def decode(tokens: List[str]) -> str:
    return "".join(tokens)


def count_tokens(text: str) -> int:
    if not text:
        return 0
    return sum(1 for _ in _TOKEN_RE.finditer(text))
