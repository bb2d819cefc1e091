"""Text canonicalization, naming, and identity functions.

These are the deterministic scalar kernels of the pipeline.  Each one
reproduces the observable behavior of a reference function (cited per
function); the implementations are original.

All of these run inside ``map_batches`` bodies; the hot ones
(`canonicalize_text`) are applied per string over Arrow columns, the
rest run on the (much smaller) triple/entity rows.
"""

from __future__ import annotations

import hashlib
import json
import re
from typing import Any, Optional

# reference ingestMD.py:31 — characters allowed in a label / rel type
_LABEL_BAD = re.compile(r"[^A-Za-z0-9_]")

# canonicalization regexes (reference ingestMD.py:61-66 semantics)
_MANY_NL = re.compile(r"\n{3,}")
_TRAIL_WS = re.compile(r"[ \t]+$", re.MULTILINE)
_WS_RUN = re.compile(r"[ \t]{2,}")

_WS_ANY = re.compile(r"\s+")

# reference graphutil.py:635-638 — number words mapped to digits in dedup keys
_NUM_WORDS = {
    "one": "1", "two": "2", "three": "3", "four": "4", "five": "5",
    "six": "6", "seven": "7", "eight": "8", "nine": "9", "ten": "10",
}
_NON_KEY = re.compile(r"[^a-z0-9 ]+")


def canonicalize_text(text: Optional[str]) -> str:
    """Whitespace-canonical form of a document (reference ``ingestMD.py:61-66``).

    CRLF/CR -> LF; runs of 3+ newlines -> exactly 2; trailing
    spaces/tabs stripped per line; internal runs of 2+ spaces/tabs -> one
    space; leading/trailing whitespace stripped.  This is the
    byte-identity invariant target: extracted page text must equal the
    oracle ``text`` column byte-for-byte per url.
    """
    t = (text or "").replace("\r\n", "\n").replace("\r", "\n")
    t = _MANY_NL.sub("\n\n", t)
    t = _TRAIL_WS.sub("", t)
    t = _WS_RUN.sub(" ", t)
    return t.strip()


def sha256_hex(s: str) -> str:
    """Content hash used for ``doc_id`` and ``chunk_id`` (reference ``ingestMD.py:68-69``)."""
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def safe_label(x: Optional[str], fallback: str = "Entity") -> str:
    """Sanitize a node label / relationship type (reference ``ingestMD.py:57-59``).

    Falsy input -> fallback; strip; spaces -> ``_``; any other
    non-``[A-Za-z0-9_]`` -> ``_``; truncated to 64 chars.  (Note the
    reference quirk: a whitespace-only input passes the falsy check and
    sanitizes to the empty string — reproduced.)
    """
    x = (x or fallback).strip().replace(" ", "_")
    return _LABEL_BAD.sub("_", x)[:64]


def norm_space(s: Optional[str]) -> str:
    """Collapse all whitespace to single spaces and strip (reference ``ingestMD.py:161-162``)."""
    return _WS_ANY.sub(" ", (s or "").strip())


def to_json_compact(x: Any) -> str:
    """Compact JSON stringification fallback (reference ``ingestMD.py:286-290``)."""
    try:
        return json.dumps(x, separators=(",", ":"), ensure_ascii=False)
    except Exception:
        return str(x)


def clean_name(s: Any) -> Optional[str]:
    """Stringify a triple object (reference ``ingestMD.py:317-322``).

    None -> None; primitives -> ``str``; everything else -> compact JSON.
    """
    if s is None:
        return None
    if isinstance(s, (str, int, float, bool)):
        return str(s)
    return to_json_compact(s)


def normalize_name_for_key(name: Optional[str]) -> str:
    """Entity canonicalization key (reference ``graphutil.py:640-651``).

    Lowercase; non-``[a-z0-9 ]`` -> space; number words one..ten ->
    digits; collapse spaces.  In the reference this runs at read time to
    dedup displayed relations; here it is the shuffle key for entity
    linking, so ``"Six Pillars"``, ``"six pillars"`` and ``"6 Pillars."``
    land in one group and collapse to one canonical entity.
    """
    s = (name or "").lower()
    s = _NON_KEY.sub(" ", s)
    return " ".join(_NUM_WORDS.get(tok, tok) for tok in s.split())


def stable_id(key: str) -> int:
    """Deterministic 60-bit entity id from a canonicalization key.

    ``int(sha256(key)[:15], 16)`` — stable across runs, partitionings and
    cluster sizes (the north-star requirement the reference meets with
    Neo4j ``MERGE`` identity).  60 bits keeps it positive in int64 and
    reproducible in the DuckDB oracle via
    ``CAST(concat('0x', substr(sha256(k),1,15)) AS BIGINT)``.
    """
    return int(hashlib.sha256(key.encode("utf-8")).hexdigest()[:15], 16)
