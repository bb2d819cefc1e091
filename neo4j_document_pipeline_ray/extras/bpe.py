"""BPE pair-frequency counting — the inner loop of tokenizer training.

Byte-pair-encoding vocabulary induction (Sennrich et al. 2016; GPT-2's
byte-level variant) repeatedly counts the most frequent ADJACENT
symbol pair over the corpus and merges it.  The count step is the
distributed part — at 100 TB it is a classic two-phase aggregate whose
exchange carries (pair, count) partials (at byte level at most 65,536
keys per batch, so the shuffle is trivially small regardless of corpus
size).  This module implements iteration-0 exactly: adjacent BYTE
pairs within whitespace words (no cross-word pairs — the word-boundary
convention of the original BPE), fully vectorized:

  one ``' '.join`` buffer per batch -> ``buf[:-1] * 256 + buf[1:]``
  with the space positions masked -> one ``np.bincount`` -> the
  per-batch partial is at most 64Ki rows.

Tokenization convention matches :func:`textstats.top_tokens`
(lowercase, whitespace split).  The DuckDB mirror counts CHARACTER
pairs — identical for ASCII corpora (the documents table is ASCII;
same caveat as FINGERPRINT_SQL).  Later merge iterations re-run the
same count with a pair-merged symbol stream; the count kernel is the
reusable piece.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.extras.textstats import _read_documents
from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate


def pair_counts_batch(t: pa.Table) -> pa.Table:
    """Per-batch (pair, n) partials over adjacent within-word byte
    pairs.  The join buffer uses ``0x20`` as the separator — words
    contain no whitespace, so masking space positions removes exactly
    the cross-word pairs."""
    words = [w for s in t["text"].to_pylist()
             for w in (s or "").lower().split()]
    if not words:
        return pa.table({"pair": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    buf = np.frombuffer(" ".join(words).encode("utf-8"), dtype=np.uint8)
    if len(buf) < 2:
        return pa.table({"pair": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    a, b = buf[:-1], buf[1:]
    mask = (a != 0x20) & (b != 0x20)
    codes = a[mask].astype(np.int64) * 256 + b[mask]
    cnt = np.bincount(codes, minlength=65536)
    nz = np.flatnonzero(cnt)
    pairs = [bytes([c >> 8, c & 255]).decode("latin-1") for c in nz]
    return pa.table({
        "pair": pa.array(pairs, pa.string()),
        "n": pa.array(cnt[nz], pa.int64()),
    })


def bpe_top_pairs(docs: "ray.data.Dataset", k: int = 50,
                  num_partitions: "int | None" = None) -> "ray.data.Dataset":
    agg = hash_aggregate(
        docs.select_columns(["text"]).map_batches(
            pair_counts_batch, batch_format="pyarrow"),
        "pair", [("n", "sum", "n")], num_partitions=num_partitions)
    return agg.sort(["n", "pair"], descending=[True, False]).limit(k)


def docs_bpe_pairs(sf_dir: str, k: int = 50) -> "ray.data.Dataset":
    return bpe_top_pairs(_read_documents(sf_dir, ["text"]), k=k)


def bpe_pairs_sql(k: int = 50) -> str:
    return f"""
    WITH w AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
        FROM documents WHERE trim(text) <> ''
    ), p AS (
        SELECT unnest(list_transform(range(1, length(w)),
                                     j -> substr(w, j, 2))) AS pair
        FROM w WHERE length(w) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {k}
    """


BPE_PAIRS_SQL = bpe_pairs_sql()


# --- full BPE training loop -------------------------------------------------

def _merge_word(syms: str, left: str, right: str) -> str:
    """Apply ONE merge rule to a tab-joined symbol string, replacing
    non-overlapping (left, right) symbol pairs left-to-right — the
    standard BPE apply step.  Tab-delimited fold: a merged token
    ``left+right`` can never retrigger as the LEFT side in the same
    pass because the suffix check includes the delimiter."""
    out = []
    toks = syms.split("\t")
    i = 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return "\t".join(out)


def bpe_train(
    docs: "ray.data.Dataset",
    iters: int = 3,
    num_partitions: "int | None" = None,
) -> pa.Table:
    """FULL BPE vocabulary-induction loop (Sennrich et al. 2016): k
    rounds of count-argmax-merge, returning one row per learned merge
    ``(iter, left, right, pair_n)``.

    Shape: ONE corpus pass builds the (word, n) frequency table — the
    only corpus-sized exchange; every round after that works on the
    VOCAB table (distinct words), exactly like single-node BPE trainers
    operate on the word-freq dict, but distributed: per round one
    vocab-sided pair-count aggregate (in-batch partials, so the
    exchange carries (pair, n) rows), one driver-side argmax over the
    tiny aggregate, and one vocab rewrite gated by a VECTORIZED
    contains-prefilter (only words containing the merged pair are
    re-folded in Python; later merges touch a vanishing vocab
    fraction).  Tokenization matches :func:`pair_counts_batch`
    (lowercase, whitespace split); ties break on (count desc, left,
    right) — deterministic, mirrored by the SQL ORDER BY.
    """
    import pyarrow.compute as pc

    def words_batch(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for s in t["text"].to_pylist():
            c.update((s or "").lower().split())
        return pa.table({
            "word": pa.array(list(c.keys()), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        })

    vocab = hash_aggregate(
        docs.select_columns(["text"]).map_batches(
            words_batch, batch_format="pyarrow"),
        "word", [("n", "sum", "n")], num_partitions=num_partitions)

    def seed_syms(t: pa.Table) -> pa.Table:
        return pa.table({
            "syms": pa.array(["\t".join(w) for w in
                              t["word"].to_pylist()], pa.string()),
            "n": t["n"],
        })

    vocab = vocab.map_batches(
        seed_syms, batch_format="pyarrow").materialize()

    out = []
    for it in range(1, iters + 1):
        def pair_partial(t: pa.Table) -> pa.Table:
            from collections import Counter

            c: Counter = Counter()
            for syms, n in zip(t["syms"].to_pylist(),
                               t["n"].to_pylist()):
                toks = syms.split("\t")
                for a, b in zip(toks, toks[1:]):
                    c[(a, b)] += n
            ls, rs = ([p[0] for p in c], [p[1] for p in c])
            return pa.table({
                "l": pa.array(ls, pa.string()),
                "r": pa.array(rs, pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            })

        agg = hash_aggregate(
            vocab.map_batches(pair_partial, batch_format="pyarrow"),
            ["l", "r"], [("n", "sum", "pn")],
            num_partitions=num_partitions)
        top = agg.sort(["pn", "l", "r"],
                       descending=[True, False, False]).take(1)
        if not top:
            break
        left, right, pn = top[0]["l"], top[0]["r"], int(top[0]["pn"])
        out.append((it, left, right, pn))

        needle = f"\t{left}\t{right}\t"

        def apply(t: pa.Table, _l=left, _r=right, _nd=needle) -> pa.Table:
            padded = pc.binary_join_element_wise(
                pa.scalar("\t"), t["syms"], pa.scalar("\t"), "")
            hit = pc.match_substring(padded, _nd).to_numpy(
                zero_copy_only=False)
            syms = t["syms"].to_pylist()
            merged = [
                _merge_word(s, _l, _r) if h else s
                for s, h in zip(syms, hit)
            ]
            return pa.table({
                "syms": pa.array(merged, pa.string()),
                "n": t["n"],
            })

        vocab = vocab.map_batches(
            apply, batch_format="pyarrow").materialize()

    return pa.table({
        "iter": pa.array([r[0] for r in out], pa.int64()),
        "left": pa.array([r[1] for r in out], pa.string()),
        "right": pa.array([r[2] for r in out], pa.string()),
        "pair_n": pa.array([r[3] for r in out], pa.int64()),
    })


def bpe_train_reference(texts, iters: int = 3) -> list:
    """Pure-Python replay of the exact training semantics (test
    oracle)."""
    from collections import Counter

    vocab: Counter = Counter()
    for s in texts:
        vocab.update((s or "").lower().split())
    syms = {w: "\t".join(w) for w in vocab}
    out = []
    for it in range(1, iters + 1):
        pc_: Counter = Counter()
        for w, n in vocab.items():
            toks = syms[w].split("\t")
            for a, b in zip(toks, toks[1:]):
                pc_[(a, b)] += n
        if not pc_:
            break
        (left, right), pn = min(
            pc_.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((it, left, right, pn))
        for w in syms:
            syms[w] = _merge_word(syms[w], left, right)
    return out


def docs_bpe_train(sf_dir: str, iters: int = 3) -> pa.Table:
    return bpe_train(_read_documents(sf_dir, ["text"]), iters=iters)


def bpe_train_sql(iters: int = 3) -> str:
    """DuckDB replay of :func:`bpe_train` — unrolled count-argmax-merge
    rounds; the merge apply is the same tab-delimited left-to-right
    fold (`list_reduce` with the delimiter-guarded suffix check), ties
    break on (count DESC, l, r) under binary collation = Python str
    order for ASCII (same caveat as FINGERPRINT_SQL)."""
    tab = "chr(9)"
    ctes = [f"""
    w AS MATERIALIZED (
        SELECT w AS word, count(*) AS n FROM (
            SELECT unnest(regexp_split_to_array(trim(lower(text)),
                                                '\\s+')) AS w
            FROM documents WHERE trim(text) <> ''
        ) GROUP BY w
    ), s0 AS MATERIALIZED (
        SELECT array_to_string(
                   list_transform(range(1, length(word) + 1),
                                  i -> substr(word, i, 1)), {tab}) AS syms,
               n
        FROM w
    )"""]
    for k in range(1, iters + 1):
        ctes.append(f"""
    p{k} AS MATERIALIZED (
        SELECT pr.l AS l, pr.r AS r, sum(n) AS pn FROM (
            SELECT n, unnest(list_transform(
                       range(1, len(toks)),
                       i -> {{'l': toks[i], 'r': toks[i + 1]}})) AS pr
            FROM (SELECT string_split(syms, {tab}) AS toks, n
                  FROM s{k - 1})
            WHERE len(toks) >= 2
        ) GROUP BY 1, 2
    ), t{k} AS MATERIALIZED (
        SELECT l, r, pn FROM p{k} ORDER BY pn DESC, l, r LIMIT 1
    ), s{k} AS MATERIALIZED (
        SELECT CASE
            WHEN NOT contains({tab} || s.syms || {tab},
                              {tab} || t.l || {tab} || t.r || {tab})
            THEN s.syms
            ELSE substr(list_reduce(
                list_prepend('', string_split(s.syms, {tab})),
                (acc, x) -> CASE WHEN ends_with(acc, {tab} || t.l)
                                      AND x = t.r
                            THEN acc || x
                            ELSE acc || {tab} || x END), 2)
            END AS syms, s.n
        FROM s{k - 1} s CROSS JOIN t{k} t
    )""")
    union = " UNION ALL ".join(
        f"""SELECT CAST({k} AS BIGINT) AS iter, l AS "left",
                   r AS "right", CAST(pn AS BIGINT) AS pair_n
            FROM t{k}""" for k in range(1, iters + 1))
    return "WITH " + ",".join(ctes) + " " + union


def bpe_encode_counts(
    docs: "ray.data.Dataset",
    merges: "list[tuple[str, str]]",
) -> "ray.data.Dataset":
    """Tokenize the corpus with a TRAINED merge list — the step that
    actually runs over 100 TB once the vocabulary exists.  Per doc:
    lowercase whitespace words, each folded through the merge rules in
    training order; returns ``(doc_id, n_bpe_tokens, n_words)`` (docs
    with no words drop, matching the trainer's word table).

    Shape: pure map — no exchange at all; the merge list is a
    driver-side constant (vocab-sized) captured in the task closure,
    and a per-batch word memo collapses the fold to once per DISTINCT
    word per batch (Zipf makes that a small fraction of tokens)."""
    rules = [(str(a), str(b)) for a, b in merges]

    def enc(t: pa.Table) -> pa.Table:
        memo: dict = {}

        def width(w: str) -> int:
            got = memo.get(w)
            if got is None:
                syms = "\t".join(w)
                for lft, rgt in rules:
                    syms = _merge_word(syms, lft, rgt)
                got = memo[w] = syms.count("\t") + 1
            return got

        ids, ntok, nw = [], [], []
        for doc_id, s in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            words = (s or "").lower().split()
            if not words:
                continue
            ids.append(doc_id)
            ntok.append(sum(width(w) for w in words))
            nw.append(len(words))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_bpe_tokens": pa.array(ntok, pa.int64()),
            "n_words": pa.array(nw, pa.int64()),
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        enc, batch_format="pyarrow")


def docs_bpe_encode(sf_dir: str, iters: int = 3) -> "ray.data.Dataset":
    """Train ``iters`` merges, then tokenize the corpus with them."""
    trained = docs_bpe_train(sf_dir, iters=iters)
    merges = list(zip(trained["left"].to_pylist(),
                      trained["right"].to_pylist()))
    return bpe_encode_counts(_read_documents(sf_dir, ["doc_id", "text"]),
                             merges)


def bpe_encode_sql(iters: int = 3) -> str:
    """DuckDB replay of :func:`docs_bpe_encode`: the train chain keyed
    by word (v0..v{iters}), then per-doc word occurrences joined to the
    folded per-word token widths."""
    tab = "chr(9)"
    ctes = [f"""
    w AS MATERIALIZED (
        SELECT w AS word, count(*) AS n FROM (
            SELECT unnest(regexp_split_to_array(trim(lower(text)),
                                                '\\s+')) AS w
            FROM documents WHERE trim(text) <> ''
        ) GROUP BY w
    ), v0 AS MATERIALIZED (
        SELECT word,
               array_to_string(
                   list_transform(range(1, length(word) + 1),
                                  i -> substr(word, i, 1)), {tab}) AS syms
        FROM w
    )"""]
    for k in range(1, iters + 1):
        ctes.append(f"""
    p{k} AS MATERIALIZED (
        SELECT pr.l AS l, pr.r AS r, sum(n) AS pn FROM (
            SELECT w.n, unnest(list_transform(
                       range(1, len(toks)),
                       i -> {{'l': toks[i], 'r': toks[i + 1]}})) AS pr
            FROM (SELECT word, string_split(syms, {tab}) AS toks
                  FROM v{k - 1}) v JOIN w USING (word)
            WHERE len(toks) >= 2
        ) GROUP BY 1, 2
    ), t{k} AS MATERIALIZED (
        SELECT l, r FROM p{k} ORDER BY pn DESC, l, r LIMIT 1
    ), v{k} AS MATERIALIZED (
        SELECT v.word, CASE
            WHEN NOT contains({tab} || v.syms || {tab},
                              {tab} || t.l || {tab} || t.r || {tab})
            THEN v.syms
            ELSE substr(list_reduce(
                list_prepend('', string_split(v.syms, {tab})),
                (acc, x) -> CASE WHEN ends_with(acc, {tab} || t.l)
                                      AND x = t.r
                            THEN acc || x
                            ELSE acc || {tab} || x END), 2)
            END AS syms
        FROM v{k - 1} v CROSS JOIN t{k} t
    )""")
    return "WITH " + ",".join(ctes) + f"""
    , tokmap AS (
        SELECT word, len(string_split(syms, {tab})) AS ntok
        FROM v{iters}
    ), docwords AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)),
                                                    '\\s+')) AS word
        FROM documents WHERE trim(text) <> ''
    )
    SELECT doc_id,
           CAST(sum(ntok) AS BIGINT) AS n_bpe_tokens,
           CAST(count(*) AS BIGINT) AS n_words
    FROM docwords JOIN tokmap USING (word)
    GROUP BY doc_id
    """


BPE_ENCODE_SQL = bpe_encode_sql()
