"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline on the sf0.001
synthetic page corpus.  ``queries()`` exposes every implemented
operator/pipeline from SURVEY.md §2 as ``sf_dir -> result`` callables;
``oracle_sql()`` gives the DuckDB-equivalent SQL.  The KG pipeline's
input corpus is synthesized deterministically (seeded) to
``/tmp/graft_pages/<sf>/{pages,truth}.parquet``; the oracle SQL reads
the same files via ``read_parquet`` so both sides see identical input.

Ray is initialised by the driver BEFORE this module is imported; nothing
here calls ``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

_SF001 = "/root/testdata/sf0.01"
_PAGES_001 = "/tmp/graft_pages/sf0.01/pages/*.parquet"
_TRUTH_001 = "/tmp/graft_pages/sf0.01/truth.parquet"

# number-word map mirrored from functions/textnorm.py (graphutil.py:635-638)
_NUM_WORDS = [("one", "1"), ("two", "2"), ("three", "3"), ("four", "4"),
              ("five", "5"), ("six", "6"), ("seven", "7"), ("eight", "8"),
              ("nine", "9"), ("ten", "10")]


def _norm_sql(col: str) -> str:
    """DuckDB expression equal to functions.textnorm.normalize_name_for_key."""
    cases = " ".join(f"WHEN '{w}' THEN '{d}'" for w, d in _NUM_WORDS)
    return (
        "array_to_string(list_transform(list_filter("
        f"string_split_regex(trim(regexp_replace(lower({col}), '[^a-z0-9 ]+', ' ', 'g')), ' +'),"
        " x -> x <> ''),"
        f" x -> CASE x {cases} ELSE x END), ' ')"
    )


def _eid_sql(norm_expr: str) -> str:
    """DuckDB expression equal to functions.textnorm.stable_id."""
    return f"CAST(concat('0x', substr(sha256({norm_expr}), 1, 15)) AS BIGINT)"


_EMB_DIM = 64


def _hash_emb_sql(text_expr: str) -> str:
    """DuckDB DOUBLE[] replay of the pipeline's hash embedder."""
    from neo4j_document_pipeline_ray.stages.embed import (
        hash_embedding_list_sql,
    )

    return hash_embedding_list_sql(text_expr, _EMB_DIM)


def _qvec_sql() -> str:
    """The unit-normalized question vector as a DOUBLE[] literal
    (same float64 values the Ray kernel scores against)."""
    from neo4j_document_pipeline_ray.pipelines.graphrag import (
        _unit,
        embed_question,
    )

    q = _unit(embed_question(_QUESTION))
    return "[" + ", ".join(repr(float(x)) for x in q) + "]"


def _lsh_bucket_sql(emb_expr: str = "e", n_planes: int = 8,
                    dim: int | None = None) -> str:
    """DuckDB expression for the LSH hyperplane-sign bucket of an
    embedding column — bit i set iff dot(e, plane_i) > 0, replaying
    extras.similarity._bucket_of with the plane matrix (a pure
    function of the fixed seed) baked in as DOUBLE[] literals."""
    from neo4j_document_pipeline_ray.extras.similarity import _planes

    pl = _planes(dim or _EMB_DIM, n_planes)
    terms = []
    for i, row in enumerate(pl):
        lit = "[" + ", ".join(repr(float(x)) for x in row) + "]"
        terms.append(
            f"(CASE WHEN list_inner_product({emb_expr}, {lit}) > 0"
            f" THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def _probed_buckets_sql(multiprobe: int = 2, n_planes: int = 8) -> str:
    """The multiprobe bucket set for the fixed question vector — a pure
    function of (question, seed, multiprobe), independent of any
    pipeline output, so baking it into the oracle is not circular."""
    from neo4j_document_pipeline_ray.extras.similarity import _probe_buckets
    from neo4j_document_pipeline_ray.pipelines.graphrag import embed_question

    probe = _probe_buckets(embed_question(_QUESTION), multiprobe, n_planes)
    return ", ".join(str(b) for b in probe)


#: the sf the driver runs its oracle comparison at (same convention as
#: _TRUTH_001) — ANN oracles that bake query-derived literals read the
#: query vector from here, matching the driver's `embeddings` view
_ORACLE_SF = "/root/testdata/sf0.01"


def _semdedup_oracle_sql(threshold: float = 0.95,
                         n_centroids: int = 16) -> str:
    """Exact SQL twin of emb_semdedup: the k-means centroids are the
    same deterministic replay as the IVF oracle (trained on the
    AUGMENTED sample — originals then 2x-scaled copies, the query's
    batch layout), assignment is argmax-cosine/lowest-id, and the
    published greedy within-cluster scan is a recursive CTE that walks
    each cluster in ascending vec_id carrying the kept unit vectors —
    a row is kept iff its max dot against them is <= threshold."""
    import numpy as np
    import pyarrow.parquet as pq

    from neo4j_document_pipeline_ray.extras.similarity import (
        train_ivf_centroids,
    )

    t = pq.read_table(_ORACLE_SF + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    cents = train_ivf_centroids(np.vstack([m, m * 2.0]), n_centroids)
    rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            j, ", ".join(repr(float(x)) for x in cents[j]))
        for j in range(n_centroids)
    )
    return f"""
        WITH RECURSIVE
        base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ),
        aug AS (
            SELECT vec_id, e FROM base
            UNION ALL
            SELECT vec_id + 1000000, list_transform(e, x -> x * 2.0)
            FROM base
        ),
        cents(cid, c) AS (VALUES {rows}),
        normed AS (
            SELECT vec_id,
                   list_transform(e, x -> x /
                       (CASE WHEN sqrt(list_inner_product(e, e)) = 0
                             THEN 1.0
                             ELSE sqrt(list_inner_product(e, e))
                        END)) AS u
            FROM aug
        ),
        sims AS (
            SELECT vec_id, u, CAST(cid AS BIGINT) AS cid,
                   list_inner_product(u, c) AS s
            FROM normed CROSS JOIN cents
        ),
        members AS (
            SELECT vec_id, u, cid AS cluster,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY s DESC, cid) AS arn
            FROM sims
        ),
        ordered AS (
            SELECT vec_id, u, cluster,
                   row_number() OVER (
                       PARTITION BY cluster ORDER BY vec_id) AS rn
            FROM members WHERE arn = 1
        ),
        walk AS (
            SELECT cluster, 0 AS rn, CAST(NULL AS BIGINT) AS vec_id,
                   false AS keep, CAST([] AS DOUBLE[][]) AS kept
            FROM (SELECT DISTINCT cluster FROM ordered)
          UNION ALL
            SELECT o.cluster, o.rn, o.vec_id,
                   (len(w.kept) = 0 OR coalesce(list_max(
                        list_transform(w.kept,
                            kv -> list_inner_product(kv, o.u))),
                        -2.0) <= {threshold!r}) AS keep,
                   CASE WHEN (len(w.kept) = 0 OR coalesce(list_max(
                            list_transform(w.kept,
                                kv -> list_inner_product(kv, o.u))),
                            -2.0) <= {threshold!r})
                        THEN list_append(w.kept, o.u)
                        ELSE w.kept END
            FROM walk w
            JOIN ordered o
              ON o.cluster = w.cluster AND o.rn = w.rn + 1
        )
        SELECT vec_id, cluster, keep FROM walk WHERE rn > 0
    """


def _ann_recall_oracle_sql(k: int = 10, multiprobe: int = 2,
                           nprobe: int = 4, n_planes: int = 8,
                           n_centroids: int = 16) -> str:
    """Exact SQL twin of the recall@k audit: both approximate tiers
    (LSH probed buckets, IVF probed centroid partitions) AND the exact
    truth sets are computed in SQL for the fixed 4-query batch, then
    intersected — recall_milli = n_hit * 1000 // k, integer-exact."""
    import numpy as np
    import pyarrow.parquet as pq

    from neo4j_document_pipeline_ray.extras.similarity import (
        _probe_buckets,
        train_ivf_centroids,
    )

    t = pq.read_table(_ORACLE_SF + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    qids = [0, 1, 2, 3]
    qvs = [m[ids.index(v)] for v in qids]
    cents = train_ivf_centroids(m, n_centroids)
    cent_rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            j, ", ".join(repr(float(x)) for x in cents[j]))
        for j in range(n_centroids))
    q_rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            v, ", ".join(repr(float(x)) for x in qv))
        for v, qv in zip(qids, qvs))
    lsh_rows = ", ".join(
        f"({v}, {b})"
        for v, qv in zip(qids, qvs)
        for b in _probe_buckets(qv, multiprobe, n_planes))
    ivf_rows = ", ".join(
        f"({v}, {int(c)})"
        for v, qv in zip(qids, qvs)
        for c in np.argsort(
            -(cents @ (qv / max(np.linalg.norm(qv), 1e-12))),
            kind="stable")[:nprobe])
    return f"""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ),
        cents(cid, c) AS (VALUES {cent_rows}),
        q(qid, qv) AS (VALUES {q_rows}),
        rows_b AS (
            SELECT vec_id, e, {_lsh_bucket_sql("e", n_planes, 64)} AS bucket
            FROM base
        ),
        asg AS (
            SELECT vec_id, cid FROM (
                SELECT b.vec_id, cents.cid,
                       row_number() OVER (
                           PARTITION BY b.vec_id
                           ORDER BY list_inner_product(
                               list_transform(b.e, x -> x /
                                   (CASE WHEN sqrt(list_inner_product(
                                             b.e, b.e)) = 0
                                         THEN 1.0
                                         ELSE sqrt(list_inner_product(
                                             b.e, b.e)) END)),
                               cents.c) DESC, cents.cid) AS rn
                FROM base b CROSS JOIN cents
            ) WHERE rn = 1
        ),
        scored AS (
            SELECT q.qid, rb.vec_id, rb.bucket, a.cid,
                   round(list_cosine_similarity(rb.e, q.qv), 6) AS sim
            FROM rows_b rb JOIN asg a USING (vec_id) CROSS JOIN q
        ),
        exact AS (
            SELECT qid, vec_id FROM (
                SELECT qid, vec_id, row_number() OVER (
                    PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
                FROM scored
            ) WHERE rn <= {k}
        ),
        lshp(qid, bucket) AS (VALUES {lsh_rows}),
        ivfp(qid, cid) AS (VALUES {ivf_rows}),
        lsh_top AS (
            SELECT qid, vec_id FROM (
                SELECT s.qid AS qid, s.vec_id AS vec_id,
                       row_number() OVER (
                           PARTITION BY s.qid
                           ORDER BY s.sim DESC, s.vec_id) AS rn
                FROM scored s
                JOIN lshp p ON p.qid = s.qid AND p.bucket = s.bucket
            ) WHERE rn <= {k}
        ),
        ivf_top AS (
            SELECT qid, vec_id FROM (
                SELECT s.qid AS qid, s.vec_id AS vec_id,
                       row_number() OVER (
                           PARTITION BY s.qid
                           ORDER BY s.sim DESC, s.vec_id) AS rn
                FROM scored s
                JOIN ivfp p ON p.qid = s.qid AND p.cid = s.cid
            ) WHERE rn <= {k}
        ),
        hits AS (
            SELECT 'lsh' AS method, CAST(q.qid AS BIGINT) AS query_id,
                   (SELECT count(*) FROM lsh_top t
                    JOIN exact x ON x.qid = t.qid
                                AND x.vec_id = t.vec_id
                    WHERE t.qid = q.qid) AS n_hit
            FROM q
            UNION ALL
            SELECT 'ivf', CAST(q.qid AS BIGINT),
                   (SELECT count(*) FROM ivf_top t
                    JOIN exact x ON x.qid = t.qid
                                AND x.vec_id = t.vec_id
                    WHERE t.qid = q.qid)
            FROM q
        )
        SELECT method, query_id, n_hit,
               (n_hit * 1000) // {k} AS recall_milli
        FROM hits
    """


def _pq_oracle_sql(k: int = 10, rerank: int = 50, m: int = 8,
                   ks: int = 16) -> str:
    """Exact SQL twin of ann_pq_topk: per-subspace codebooks are the
    deterministic k-means replay (baked with their |c|^2 and
    query-block inner products precomputed by the same numpy the
    pipeline uses), encoding is argmin-L2/lowest-id in SQL, the ADC
    score is the LUT sum, and the top-``rerank`` candidate head is
    re-scored exactly — the published ADC + re-rank serving shape,
    end-to-end deterministic."""
    import numpy as np
    import pyarrow.parquet as pq

    from neo4j_document_pipeline_ray.extras.similarity import (
        train_pq_codebooks,
    )

    t = pq.read_table(_ORACLE_SF + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    sample = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    books = train_pq_codebooks(sample, m, ks)
    sub = sample.shape[1] // m
    q = sample[ids.index(0)]
    qn = q / max(np.linalg.norm(q), 1e-12)
    lut_ip = np.stack([books[j] @ qn[j * sub:(j + 1) * sub]
                       for j in range(m)])
    lut_n2 = (books ** 2).sum(axis=-1)
    rows = ", ".join(
        "({}, {}, [{}]::DOUBLE[], {!r}, {!r})".format(
            j, c, ", ".join(repr(float(x)) for x in books[j, c]),
            float(lut_n2[j, c]), float(lut_ip[j, c]))
        for j in range(m) for c in range(ks)
    )
    qlit = "[" + ", ".join(repr(float(x)) for x in qn) + "]"
    return f"""
        WITH books(j, cid, c, n2, qip) AS (VALUES {rows}),
        base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ),
        blocks AS (
            SELECT vec_id, CAST(r.j AS INTEGER) AS j,
                   e[r.j * {sub} + 1 : (r.j + 1) * {sub}] AS x
            FROM base CROSS JOIN range({m}) r(j)
        ),
        dists AS (
            SELECT vec_id, b.j, b.cid, b.n2, b.qip,
                   -2.0 * list_inner_product(x, b.c) + b.n2 AS d
            FROM blocks JOIN books b ON b.j = blocks.j
        ),
        codes AS (
            SELECT vec_id, j, n2, qip FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id, j ORDER BY d, cid) AS rn
                FROM dists
            ) WHERE rn = 1
        ),
        adc AS (
            SELECT vec_id,
                   round(sum(qip) /
                         sqrt(greatest(sum(n2), 1e-24)), 6) AS sim
            FROM codes GROUP BY vec_id
        ),
        cand AS (
            SELECT vec_id FROM adc
            ORDER BY sim DESC, vec_id
            LIMIT {max(k, rerank)}
        )
        SELECT b.vec_id,
               round(list_inner_product(e, {qlit}) /
                     (CASE WHEN sqrt(list_inner_product(e, e)) = 0
                           THEN 1.0
                           ELSE sqrt(list_inner_product(e, e))
                      END), 6) AS sim
        FROM base b JOIN cand USING (vec_id)
        ORDER BY sim DESC, b.vec_id
        LIMIT {k}
    """


def _ivf_topk_sql(parts) -> str:
    """Exact SQL twin of an IVF index query: assign every vector to its
    argmax-cosine centroid (lowest id on ties — the index's partition
    rule), then exact cosine top-k restricted to the probed
    partitions."""
    rows, probe = parts
    return f"""
        WITH cents(cid, c) AS (VALUES {rows}),
        n AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                   (CASE WHEN sqrt(list_inner_product(
                             CAST(embedding AS DOUBLE[]),
                             CAST(embedding AS DOUBLE[]))) = 0
                         THEN 1.0
                         ELSE sqrt(list_inner_product(
                             CAST(embedding AS DOUBLE[]),
                             CAST(embedding AS DOUBLE[])))
                    END) AS nrm
            FROM embeddings
        ), sims AS (
            SELECT vec_id, e, cid,
                   list_inner_product(
                       list_transform(e, x -> x / nrm), c) AS s
            FROM n CROSS JOIN cents
        ), assigned AS (
            SELECT vec_id, e, cid,
                   row_number() OVER (
                       PARTITION BY vec_id
                       ORDER BY s DESC, cid) AS rn
            FROM sims
        )
        SELECT vec_id,
               round(list_cosine_similarity(e,
                   (SELECT CAST(embedding AS DOUBLE[])
                    FROM embeddings WHERE vec_id = 0)), 6) AS sim
        FROM assigned
        WHERE rn = 1 AND cid IN ({probe})
        ORDER BY sim DESC, vec_id
        LIMIT 10
    """


def _ann_probed_buckets_sql(multiprobe: int = 2, n_planes: int = 8) -> str:
    """Multiprobe bucket set for the embeddings-table query vector
    (vec_id 0 of the oracle sf) — a pure function of (query vector,
    plane seed, multiprobe), so the LSH index query gets an EXACT SQL
    twin: cosine top-k restricted to the probed buckets."""
    from neo4j_document_pipeline_ray.extras.similarity import (
        _probe_buckets,
        query_vector,
    )

    probe = _probe_buckets(query_vector(_ORACLE_SF), multiprobe, n_planes)
    return ", ".join(str(b) for b in probe)


def _ivf_oracle_parts(n_centroids: int = 16, nprobe: int = 4,
                      first_half_only: bool = False):
    """(centroid VALUES rows, probed-centroid id list) for the IVF
    oracle: replays the index's deterministic training — at the oracle
    sf the corpus (500 rows) is under ``train_rows``, so the training
    sample is ALL (or, for the frozen-centroid update variant, the
    first half's) vectors in file order — with the pipeline's own
    ``train_ivf_centroids`` (init = first k rows, 5 iterations,
    argmax/lowest-id ties).  The centroids define the partitioning
    rule, exactly as the LSH planes do for the bucket oracle."""
    import numpy as np
    import pyarrow.parquet as pq

    from neo4j_document_pipeline_ray.extras.similarity import (
        train_ivf_centroids,
    )

    t = pq.read_table(_ORACLE_SF + "/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist())
    sample = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    q = sample[list(ids).index(0)]
    if first_half_only:
        sample = sample[ids < len(ids) // 2]
    cents = train_ivf_centroids(sample, n_centroids)
    q = q / max(np.linalg.norm(q), 1e-12)
    order = np.argsort(-(cents @ q), kind="stable")[:nprobe]
    rows = ", ".join(
        "({}, [{}]::DOUBLE[])".format(
            j, ", ".join(repr(float(x)) for x in cents[j]))
        for j in range(n_centroids)
    )
    return rows, ", ".join(str(int(j)) for j in order)


def _corpus(sf_dir: str):
    from neo4j_document_pipeline_ray.sources.corpus import ensure_corpus

    return ensure_corpus(sf_dir)


def _cfg():
    from neo4j_document_pipeline_ray.config import PipelineConfig

    return PipelineConfig(extract_concurrency=2, embed_concurrency=2, join_partitions=8)


_KG_CACHE: dict = {}


def _kg(sf_dir: str):
    """Build (or reuse) the KG tables for one scale factor.

    The driver calls each kg_* query independently; the pipeline runs
    once per sf and the materialized tables are shared."""
    if sf_dir in _KG_CACHE:
        return _KG_CACHE[sf_dir]
    import ray.data as rd

    from neo4j_document_pipeline_ray.pipelines.kg_build import build_kg

    paths = _corpus(sf_dir)
    pages = rd.read_parquet(paths["pages"], columns=["url", "html"])
    out = build_kg(pages, _cfg())
    out = {k: v.materialize() for k, v in out.items()}
    _KG_CACHE[sf_dir] = out
    return out


def entry() -> Any:
    """Flagship pipeline on sf0.001: pages -> KG snapshot; returns nodes."""
    return _kg("/root/testdata/sf0.001")["nodes"]


# ---------------------------------------------------------------------------
# query callables
# ---------------------------------------------------------------------------

def _q_kg_extract_text(sf_dir: str):
    import ray.data as rd

    from neo4j_document_pipeline_ray.stages.extract_text import extract_docs

    paths = _corpus(sf_dir)
    pages = rd.read_parquet(paths["pages"], columns=["url", "html"])
    return extract_docs(pages).select_columns(["url", "doc_id", "text"])


def _q_kg_docs(sf_dir: str):
    import ray.data as rd

    from neo4j_document_pipeline_ray.pipelines.kg_build import dedupe_docs
    from neo4j_document_pipeline_ray.stages.extract_text import extract_docs

    paths = _corpus(sf_dir)
    pages = rd.read_parquet(paths["pages"], columns=["url", "html"])
    return dedupe_docs(extract_docs(pages))


def _q_kg_triples(sf_dir: str):
    from neo4j_document_pipeline_ray.stages.grouped import distinct_by

    cols = ["subject", "predicate", "rel_type", "object", "subject_type",
            "object_type", "object_kind", "start", "end", "term", "count"]
    out = _kg(sf_dir)["triples"].select_columns(cols)
    # distributed full-row distinct, hash-partitioned by subject (rows
    # with equal tuples share the subject, so each lands whole)
    return distinct_by(out, "subject", subset=cols, num_partitions=8)


def _q_kg_triple_pr(sf_dir: str):
    """MEASURED triple precision/recall of the built snapshot against
    the corpus truth table — the north rule's acceptance metric
    (P/R >= 0.95) computed per round as a one-row artifact.  The Ray
    side independently derives the extracted distinct-triple set from
    the real pipeline and set-compares it to truth; the oracle encodes
    the invariant (exact extraction: P = R = 1.0 at truth's counts),
    so any extraction drift fails the hash gate."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    cols = ["subject", "predicate", "rel_type", "object", "subject_type",
            "object_type", "object_kind", "start", "end", "term", "count"]
    NULL = "\x1e"  # sentinel so NULL keys compare equal on both sides
    SEP = "\x1f"

    def keyed(flag: int):
        def fn(t: pa.Table) -> pa.Table:
            parts = [
                pc.fill_null(pc.cast(t[c], pa.string()), NULL) for c in cols
            ]
            key = pc.binary_join_element_wise(*parts, SEP)
            return pa.table({
                "key": key,
                "flag": pa.array([flag] * t.num_rows, pa.int64()),
            })

        return fn

    ext = _kg(sf_dir)["triples"].select_columns(cols).map_batches(
        keyed(1), batch_format="pyarrow")
    truth = rd.read_parquet(_corpus(sf_dir)["truth"],
                            columns=cols).map_batches(
        keyed(2), batch_format="pyarrow")
    # distinct per side, then per-key flag sum: 1=extracted only,
    # 2=truth only, 3=matched
    both = hash_aggregate(ext.union(truth), ["key", "flag"],
                          [(None, "count", "_m")],
                          num_partitions=8).drop_columns(["_m"])
    tagged = hash_aggregate(both, "key", [("flag", "sum", "s")],
                            num_partitions=8)

    def partial(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        return pa.table({
            "_k": pa.array([1], pa.int64()),
            "n_extracted": pa.array(
                [int(((s == 1) | (s == 3)).sum())], pa.int64()),
            "n_truth": pa.array(
                [int(((s == 2) | (s == 3)).sum())], pa.int64()),
            "n_matched": pa.array([int((s == 3).sum())], pa.int64()),
        })

    tot = hash_aggregate(
        tagged.map_batches(partial, batch_format="pyarrow"), "_k", [
            ("n_extracted", "sum", "n_extracted"),
            ("n_truth", "sum", "n_truth"),
            ("n_matched", "sum", "n_matched"),
        ], num_partitions=1)

    def finish(t: pa.Table) -> pa.Table:
        ne = max(int(t["n_extracted"][0].as_py()), 1)
        nt = max(int(t["n_truth"][0].as_py()), 1)
        nm = int(t["n_matched"][0].as_py())
        return pa.table({
            "n_truth": t["n_truth"],
            "n_extracted": t["n_extracted"],
            "n_matched": t["n_matched"],
            "precision_scaled": pa.array([nm * 1_000_000 // ne], pa.int64()),
            "recall_scaled": pa.array([nm * 1_000_000 // nt], pa.int64()),
        })

    return tot.map_batches(finish, batch_format="pyarrow")


def _q_kg_nodes(sf_dir: str):
    return _kg(sf_dir)["nodes"].select_columns(
        ["entity_id", "label", "name", "norm_key"]
    )


def _q_kg_edges(sf_dir: str):
    import pyarrow as pa

    edges = _kg(sf_dir)["edges"]

    def proj(t: pa.Table) -> pa.Table:
        terms = [x or "" for x in t["term"].to_pylist()]
        srcs = t["sources"].to_pylist()
        return pa.table({
            "src_id": t["src_id"],
            "rel_type": t["rel_type"],
            "dst_id": t["dst_id"],
            "term_key": pa.array(terms, pa.string()),
            "sources_csv": pa.array([",".join(s) for s in srcs], pa.string()),
            "n_sources": pa.array([len(s) for s in srcs], pa.int64()),
        })

    return edges.map_batches(proj, batch_format="pyarrow")


def _q_kg_mentions(sf_dir: str):
    return _kg(sf_dir)["mentions"]


def _q_kg_chunks(sf_dir: str):
    import ray.data as rd

    from neo4j_document_pipeline_ray.pipelines.kg_build import dedupe_docs
    from neo4j_document_pipeline_ray.stages.chunker import chunk_docs
    from neo4j_document_pipeline_ray.stages.extract_text import extract_docs

    paths = _corpus(sf_dir)
    pages = rd.read_parquet(paths["pages"], columns=["url", "html"])
    docs = dedupe_docs(extract_docs(pages))
    return chunk_docs(docs).select_columns(["doc_id", "chunk_idx", "chunk_id"])


def _q_kg_embeddings(sf_dir: str):
    """Distinct-key embeddings table, unpivoted to (text_key, i, val)
    so the driver can hash-compare against the DuckDB replay of the
    hash embedder (``hash_embedding_list_sql``): each ``val`` is the
    exact float64 widening of the pipeline's float32 component."""
    import numpy as np
    import pyarrow as pa

    def unpivot(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"text_key": pa.array([], pa.string()),
                             "i": pa.array([], pa.int64()),
                             "val": pa.array([], pa.float64())})
        mat = np.stack([np.asarray(v, dtype=np.float32)
                        for v in t["embedding"].to_pylist()])
        n, d = mat.shape
        keys = pa.array(
            np.repeat(np.asarray(t["text_key"].to_pylist(), dtype=object), d),
            pa.string())
        return pa.table({
            "text_key": keys,
            "i": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "val": pa.array(mat.astype(np.float64).ravel(), pa.float64()),
        })

    return _kg(sf_dir)["embeddings"].map_batches(
        unpivot, batch_format="pyarrow")


def _q_doc_hybrid_topk(sf_dir: str):
    """Hybrid document retrieval: Lucene-default BM25 over doc text +
    embedding cosine vs the fixed query vector, blended 0.6/0.4 — the
    corpus-level analog of the KG hybrid channel."""
    from neo4j_document_pipeline_ray.extras.similarity import doc_hybrid_topk

    return doc_hybrid_topk(sf_dir, k=10)


def _q_ann_topk(sf_dir: str):
    import os

    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.similarity import (
        brute_force_topk,
        query_vector,
    )

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return brute_force_topk(emb, query_vector(sf_dir), k=10)


def _q_ann_label_topk(sf_dir: str):
    import os

    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.similarity import label_topk, query_vector

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return label_topk(emb, query_vector(sf_dir), k=5)


def _q_ann_multi_topk(sf_dir: str):
    """Batch brute-force ANN: 3 query vectors scored in ONE corpus
    pass (per-batch matmul against the broadcast query matrix,
    partial top-k per (batch, query), per-query head in hash
    partitions)."""
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.similarity import (
        multi_query_topk,
        query_matrix,
    )

    import os

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qids, qmat = query_matrix(sf_dir, [0, 1, 2])
    return multi_query_topk(emb, qids, qmat, k=10)


def _q_ann_lsh_topk(sf_dir: str):
    """LSH top-k through the PRUNED index path: bucket-partitioned
    parquet built once per sf, query reads only probed partitions."""
    import os

    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.similarity import (
        build_ann_index,
        lsh_index_topk,
        query_vector,
    )

    # cache key = content fingerprint of the source parquet, so a
    # regenerated corpus under the same sf name gets a fresh index; the
    # build itself is atomic (temp dir + os.replace), so an existing
    # dir is always a complete index
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb_path)
    idx = os.path.join(
        "/tmp/graft_ann_index",
        f"{os.path.basename(os.path.normpath(sf_dir))}"
        f"-{st.st_size}-{int(st.st_mtime)}",
    )
    if not os.path.isdir(idx):
        emb = rd.read_parquet(emb_path)
        build_ann_index(emb, idx)
    return lsh_index_topk(idx, query_vector(sf_dir), k=10, multiprobe=2)


def _q_ann_ivf_topk(sf_dir: str):
    """IVF top-k through the coarse-quantizer index path: centroid-
    partitioned parquet built once per source fingerprint, query reads
    only the nprobe nearest-centroid partitions.  Deterministic end to
    end — the fixed-seed k-means replay is baked into an EXACT SQL
    twin (_ivf_topk_sql); pytest additionally pins
    nprobe=n_centroids == brute force and recall."""
    import os

    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.similarity import (
        build_ivf_index,
        ivf_index_topk,
        query_vector,
    )

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb_path)
    idx = os.path.join(
        "/tmp/graft_ivf_index",
        f"{os.path.basename(os.path.normpath(sf_dir))}"
        f"-{st.st_size}-{int(st.st_mtime)}",
    )
    if not os.path.isdir(idx):
        build_ivf_index(rd.read_parquet(emb_path), idx, n_centroids=16)
    return ivf_index_topk(idx, query_vector(sf_dir), k=10, nprobe=4)


def _q_ann_recall(sf_dir: str):
    """Recall@10 of both approximate index tiers (LSH multiprobe=2,
    IVF nprobe=4) against the exact scan, for a 4-query batch — the
    per-round index-quality artifact.  Deterministic end to end: both
    tiers and the truth sets have an EXACT SQL twin
    (_ann_recall_oracle_sql); the full-probe==exact bound is pinned in
    pytest."""
    import os

    import numpy as np
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.similarity import (
        ann_recall_report,
        build_ann_index,
        build_ivf_index,
        query_matrix,
    )

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb_path)
    tag = (f"{os.path.basename(os.path.normpath(sf_dir))}"
           f"-{st.st_size}-{int(st.st_mtime)}")
    lsh = os.path.join("/tmp/graft_ann_index", tag)
    ivf = os.path.join("/tmp/graft_ivf_index", tag)
    if not os.path.isdir(lsh):
        build_ann_index(rd.read_parquet(emb_path), lsh)
    if not os.path.isdir(ivf):
        build_ivf_index(rd.read_parquet(emb_path), ivf, n_centroids=16)
    qids, qmat = query_matrix(sf_dir, [0, 1, 2, 3])
    return ann_recall_report(
        rd.read_parquet(emb_path), lsh, ivf,
        np.asarray(qids), qmat, k=10, multiprobe=2, nprobe=4)


def _q_minhash_pairs(sf_dir: str):
    import os

    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.dedup import minhash_dedup_pairs

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return minhash_dedup_pairs(docs, threshold=0.8)


def _q_near_dedup_keep(sf_dir: str):
    import os

    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.dedup import near_dedup_keep

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return near_dedup_keep(docs, threshold=0.8)


def _q_minhash_components(sf_dir: str):
    import os

    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.dedup import (
        connected_components,
        minhash_dedup_pairs,
    )

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    # the VERIFIED pair list is small (near-dup pairs only) — pin it so
    # the emptiness probe + CC input don't re-run the LSH pipeline
    pairs = minhash_dedup_pairs(docs, threshold=0.8).materialize()
    if pairs.count() == 0:
        import pandas as pd

        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "component": pd.Series([], dtype="int64")})
    return connected_components(pairs.select_columns(["a", "b"]))


def _q_simhash_pairs(sf_dir: str):
    import os

    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.dedup import simhash_near_pairs

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return simhash_near_pairs(docs, max_hamming=3)


def _q_emb_near_dup(sf_dir: str):
    """Near-dup detection over the embeddings table AUGMENTED with one
    deterministic scaled copy per vector (vec_id + 1,000,000; embedding
    doubled — scaling is exact in fp, preserves every hyperplane sign,
    and gives cosine exactly 1.0).  The raw synthetic embeddings contain
    no pair above 0.52 cosine, so without planting, a threshold-0.95
    near-dup check can never return a row — the planted copies make the
    check discriminative (the operator must find exactly them) and
    SQL-expressible (all-pairs cosine in DuckDB)."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.similarity import (
        embedding_near_dup_pairs,
    )

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])

    def augment(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in t["embedding"].to_pylist()])
        pert = mat * 2.0
        return pa.table({
            "vec_id": pa.array(
                np.concatenate([ids, ids + 1_000_000]), pa.int64()),
            "embedding": pa.array(
                list(np.concatenate([mat, pert])),
                pa.list_(pa.float64())),
        })

    aug = emb.map_batches(augment, batch_format="pyarrow")
    out = embedding_near_dup_pairs(aug, threshold=0.95)
    return out.sort(["a", "b"])


def _q_emb_semdedup(sf_dir: str):
    """SemDeDup (k-means clusters + within-cluster cosine dedup,
    extras/similarity.py:semdedup) over the embeddings table augmented
    with the same planted scaled copies as emb_near_dup: a copy points
    the SAME direction, so it lands in its original's cluster with
    cosine exactly 1.0 and must come back keep=false while every
    original (no raw pair above 0.52) stays keep=true — the invariant
    tests/test_extras.py pins.  The k-means replay + recursive-CTE
    greedy scan form an EXACT SQL twin (_semdedup_oracle_sql)."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.similarity import semdedup

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])

    def augment(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack([np.asarray(v, dtype=np.float64)
                        for v in t["embedding"].to_pylist()])
        pert = mat * 2.0
        return pa.table({
            "vec_id": pa.array(
                np.concatenate([ids, ids + 1_000_000]), pa.int64()),
            "embedding": pa.array(
                list(np.concatenate([mat, pert])),
                pa.list_(pa.float64())),
        })

    aug = emb.map_batches(augment, batch_format="pyarrow")
    return semdedup(aug, threshold=0.95)


def _q_lang_id(sf_dir: str):
    from neo4j_document_pipeline_ray.extras.textstats import lang_id

    return lang_id(sf_dir)


def _q_rel_profile(sf_dir: str):
    """Generic column profile of the orders table: per column row
    count, null count and KMV distinct sketch — all columns in ONE
    streaming pass with zero exchanges (extras/profile.py)."""
    import os

    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.profile import table_profile

    ds = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"))
    return table_profile(ds, ["o_orderkey", "o_custkey",
                              "o_orderstatus", "o_orderpriority"])


def _q_docs_bpe_encode(sf_dir: str):
    """Tokenize the corpus with the trained BPE merges: per-doc token
    count under the learned vocabulary (extras/bpe.py:docs_bpe_encode
    — the pass that actually runs over 100 TB once training is
    done)."""
    from neo4j_document_pipeline_ray.extras.bpe import docs_bpe_encode

    return docs_bpe_encode(sf_dir, iters=3)


def _q_lang_confusion(sf_dir: str):
    """Language-ID accuracy audit: (true lang, predicted lang, n)
    confusion counts against the corpus's lang column."""
    from neo4j_document_pipeline_ray.extras.textstats import (
        lang_confusion,
    )

    return lang_confusion(sf_dir)


def _q_docs_repetition(sf_dir: str):
    """Gopher-style repetition signals (dup-line / dup-char /
    top-2-gram fractions, integer-scaled) over documents."""
    from neo4j_document_pipeline_ray.extras.textstats import repetition_stats

    return repetition_stats(sf_dir)


def _q_docs_dup_ngrams(sf_dir: str):
    """Cross-document duplicated n-gram rate + longest shared span per
    doc — the ExactSubstr dedup signal (Lee et al. 2021) at word-gram
    granularity (extras/dupgrams.py; gram-hash partitions compute df,
    doc-hash partitions fold flags into rate and run)."""
    from neo4j_document_pipeline_ray.extras.dupgrams import docs_dup_ngrams

    return docs_dup_ngrams(sf_dir)


def _q_docs_prefix_jaccard(sf_dir: str):
    """Exact n-gram Jaccard pairs via PREFIX FILTERING (SSJoin /
    PPJoin) — candidates only from df-ordered rare-gram prefixes, so
    no lossy caps at scale; output provably equals the naive operator
    (extras/dedup.py:prefix_jaccard_pairs; pinned in pytest)."""
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.dedup import (
        prefix_jaccard_pairs,
    )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return prefix_jaccard_pairs(docs)


def _q_docs_dedup_eval(sf_dir: str):
    """One-row dedup-quality audit — precision/recall of the MinHash
    near-dup detector against the EXACT Jaccard >= 0.8 pair set (the
    prefix-filtered SSJoin kernel): the "measure, don't guess" twin of
    ann_recall for the dedup tier.  Deterministic minhash seeds +
    exact truth make the milli scores stable artifacts; everything
    after the two pair kernels is k-sized."""
    import os

    import pyarrow as pa
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.dedup import (
        minhash_dedup_pairs,
        prefix_jaccard_pairs,
    )
    from neo4j_document_pipeline_ray.stages.grouped import broadcast_join

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    truth = prefix_jaccard_pairs(docs).select_columns(
        ["doc_a", "doc_b"]).map_batches(
        lambda t: pa.table({"a": t["doc_a"], "b": t["doc_b"]}),
        batch_format="pyarrow").materialize()
    found = minhash_dedup_pairs(docs, threshold=0.8).select_columns(
        ["a", "b"]).materialize()
    n_truth, n_found = truth.count(), found.count()
    n_hit = 0
    if n_truth and n_found:
        n_hit = broadcast_join(found, truth, on=("a", "b")).count()
    return rd.from_arrow(pa.table({
        "method": pa.array(["minhash"], pa.string()),
        "n_truth": pa.array([n_truth], pa.int64()),
        "n_found": pa.array([n_found], pa.int64()),
        "n_hit": pa.array([n_hit], pa.int64()),
        "precision_milli": pa.array(
            [n_hit * 1000 // n_found if n_found else 0], pa.int64()),
        "recall_milli": pa.array(
            [n_hit * 1000 // n_truth if n_truth else 0], pa.int64()),
    }))


def _q_docs_domain_reputation(sf_dir: str):
    """Per-source reputation rollup: doc count, exact-dup count, and
    integer-scaled quality means — the per-domain table RefinedWeb/C4
    -style curation keys its domain decisions on
    (extras/textstats.py:domain_reputation)."""
    from neo4j_document_pipeline_ray.extras.textstats import (
        domain_reputation,
    )

    return domain_reputation(sf_dir)


def _q_emb_bitext(sf_dir: str):
    """Cross-label translation-pair mining with a ratio-test margin
    (LASER/CCMatrix shape): best label-1 match per label-0 vector,
    margin = best/second cosine — hubness-robust, unlike raw cosine
    (extras/similarity.py:bitext_mine; src matrix broadcast once,
    dst side streams)."""
    from neo4j_document_pipeline_ray.extras.similarity import (
        _read_embeddings,
        bitext_mine,
    )

    return bitext_mine(_read_embeddings(sf_dir))


def _q_docs_kmv_by_lang(sf_dir: str):
    """Per-language KMV distinct-token sketch — mergeable sketch as a
    GROUPED aggregate with distributed finalize (no driver data path;
    safe at millions of groups), vs the global docs_distinct_kmv
    (extras/textstats.py:grouped_distinct_tokens_kmv)."""
    from neo4j_document_pipeline_ray.extras.textstats import (
        grouped_distinct_tokens_kmv,
    )

    return grouped_distinct_tokens_kmv(sf_dir)


def _q_docs_bpe_train(sf_dir: str):
    """Full BPE vocabulary-induction loop: 3 rounds of
    count-argmax-merge over the distributed word-frequency table (one
    corpus pass; every round after is vocab-sided with a vectorized
    contains-prefilter on the rewrite)."""
    from neo4j_document_pipeline_ray.extras.bpe import docs_bpe_train

    return docs_bpe_train(sf_dir, iters=3)


def _q_docs_bpe_pairs(sf_dir: str):
    """Top adjacent byte pairs over within-word positions — BPE
    tokenizer-training iteration 0 (extras/bpe.py; per-batch bincount
    partials cap the exchange at 64Ki keys per batch)."""
    from neo4j_document_pipeline_ray.extras.bpe import docs_bpe_pairs

    return docs_bpe_pairs(sf_dir)


def _q_docs_curation_filter(sf_dir: str):
    """Composed C4/Gopher-style keep/drop gate with first-failing-rule
    reasons - the curation decision a pre-training pipeline applies
    after computing the repetition/quality signals."""
    from neo4j_document_pipeline_ray.extras.textstats import curation_filter

    return curation_filter(sf_dir)


def _q_docs_salient_terms(sf_dir: str):
    """Top-3 salient tokens per doc (integer TF-IDF surrogate): batch-
    local tf, one hash-aggregated df table broadcast back, per-batch
    top-k - the keyword-extraction pass of a corpus index."""
    from neo4j_document_pipeline_ray.extras.textstats import salient_terms

    return salient_terms(sf_dir, k=3)


def _q_fingerprints(sf_dir: str):
    from neo4j_document_pipeline_ray.extras.textstats import fingerprints

    return fingerprints(sf_dir)


def _q_docs_scrub(sf_dir: str):
    """Blocklist scrub: whole-word regex rewrite of blocklisted terms
    (RE2 on both engines), zero-exchange single pass; the PII variant
    shares the kernel and is covered in pytest."""
    from neo4j_document_pipeline_ray.extras.redact import scrub_blocklist

    return scrub_blocklist(sf_dir)


def _q_docs_unigram_logprob(sf_dir: str):
    """Corpus-LM quality score: mean unigram ln-probability per doc —
    one vocabulary hash aggregate broadcast once, then a zero-exchange
    scoring pass."""
    from neo4j_document_pipeline_ray.extras.textstats import unigram_logprob

    return unigram_logprob(sf_dir)


def _q_docs_nb_lang(sf_dir: str):
    """Trained multinomial Naive Bayes classifier (the fastText-style
    supervised curation stage): one (lang, token) hash aggregate trains
    the model, broadcast once; scoring is a zero-exchange argmax pass
    with integer fixed-point log-likelihoods (hash-exact)."""
    from neo4j_document_pipeline_ray.extras.textstats import (
        nb_lang_classifier,
    )

    return nb_lang_classifier(sf_dir)


# fixed retrieval inputs for the oracle-checked query-layer entries;
# tokens chosen to overlap many entity surface forms so the keyword
# channel's scoring/ranking is exercised on a non-trivial result set
_QUESTION = ('How does the "National Broadband Plan" support the Six Pillars '
             'and the rural skills initiative rollout?')
_KHOP_SEED_NAMES = ["United States", "Six Pillars"]


def _q_kg_vector_topk(sf_dir: str):
    from neo4j_document_pipeline_ray.pipelines.graphrag import (
        embed_question,
        vector_topk,
    )

    return vector_topk(_kg(sf_dir)["nodes"], embed_question(_QUESTION), k=10)


def _q_kg_keyword_topk(sf_dir: str):
    from neo4j_document_pipeline_ray.pipelines.graphrag import keyword_topk

    return keyword_topk(_kg(sf_dir)["nodes"], _QUESTION, k=12)


def _q_kg_bm25_topk(sf_dir: str):
    from neo4j_document_pipeline_ray.pipelines.graphrag import bm25_topk

    return bm25_topk(_kg(sf_dir)["nodes"], _QUESTION, k=12)


# per-session index dirs (rebuilt on first use so stale on-disk state
# from an older corpus can never leak into a check)
_IDX_CACHE: dict = {}


def _text_index_dir(sf_dir: str) -> str:
    import os

    from neo4j_document_pipeline_ray.pipelines.graphrag import build_text_index

    key = ("text", sf_dir)
    if key not in _IDX_CACHE:
        d = f"/tmp/graft_text_index/{os.path.basename(os.path.normpath(sf_dir))}"
        build_text_index(_kg(sf_dir)["nodes"], d)
        _IDX_CACHE[key] = d
    return _IDX_CACHE[key]


def _node_ann_index_dir(sf_dir: str) -> str:
    import os

    from neo4j_document_pipeline_ray.pipelines.graphrag import build_node_ann_index

    key = ("ann", sf_dir)
    if key not in _IDX_CACHE:
        d = f"/tmp/graft_node_ann/{os.path.basename(os.path.normpath(sf_dir))}"
        build_node_ann_index(_kg(sf_dir)["nodes"], d)
        _IDX_CACHE[key] = d
    return _IDX_CACHE[key]


def _q_kg_bm25_index_topk(sf_dir: str):
    """BM25 channel through the PERSISTED text index (token + n-gram df
    from pruned reads; no corpus-stats scan) — result identical to
    kg_bm25_topk, checked against the same SQL oracle."""
    from neo4j_document_pipeline_ray.pipelines.graphrag import bm25_index_topk

    return bm25_index_topk(_kg(sf_dir)["nodes"], _text_index_dir(sf_dir),
                           _QUESTION, k=12)


def _q_kg_vector_index_topk(sf_dir: str):
    """Vector channel through the PERSISTED node-ANN index (probed
    bucket partitions only; hash embedder -> rows-only under the
    driver, pinned == vector_topk in pytest)."""
    from neo4j_document_pipeline_ray.pipelines.graphrag import (
        embed_question,
        vector_index_topk,
    )

    return vector_index_topk(_node_ann_index_dir(sf_dir),
                             embed_question(_QUESTION), k=10, multiprobe=2)


def _khop_seeds() -> list[int]:
    from neo4j_document_pipeline_ray.functions.textnorm import (
        normalize_name_for_key,
        stable_id,
    )

    return [stable_id(normalize_name_for_key(n)) for n in _KHOP_SEED_NAMES]


def _q_kg_khop(sf_dir: str):
    import pandas as pd

    from neo4j_document_pipeline_ray.pipelines.graphrag import khop_entity_ids

    ids = khop_entity_ids(_kg(sf_dir)["edges"], _khop_seeds(), max_hops=1)
    return pd.DataFrame({"entity_id": pd.Series(ids, dtype="int64")})


def _q_kg_pagerank(sf_dir: str):
    """Integer PageRank over the KG edge table (3 rounds, 85/100
    damping, scale 1e9) — the bulk graph-analytics pass Neo4j would
    provide in the reference.  Integer arithmetic makes the distributed
    result bit-identical to the unrolled-SQL oracle."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import pagerank

    return pagerank(_kg(sf_dir)["edges"], iters=3)


def _q_kg_degree_topk(sf_dir: str):
    from neo4j_document_pipeline_ray.pipelines.graph_algo import degree_topk

    return degree_topk(_kg(sf_dir)["edges"], k=20)


def _q_kg_triangles(sf_dir: str):
    """Per-node triangle counts over the KG edge table (Neo4j GDS
    triangleCount analog) — degree-ordered node-iterator, wedge
    closure by hash-partitioned intersection."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        triangle_counts,
    )

    return triangle_counts(_kg(sf_dir)["edges"])


def _q_kg_components(sf_dir: str):
    """Weakly-connected components over the KG edge table (Neo4j GDS
    wcc analog): bounded-round min-label propagation with pointer
    jumping (extras/dedup.py:connected_components), applied to the
    distinct undirected entity-pair set."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_document_pipeline_ray.extras.dedup import connected_components
    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    edges = _kg(sf_dir)["edges"]

    def canon(t: pa.Table) -> pa.Table:
        s, d = t["src_id"], t["dst_id"]
        return pa.table({
            "a": pc.min_element_wise(s, d),
            "b": pc.max_element_wise(s, d),
        })

    pairs = hash_aggregate(
        edges.select_columns(["src_id", "dst_id"])
             .map_batches(canon, batch_format="pyarrow"),
        ["a", "b"], [(None, "count", "_m")],
    ).drop_columns(["_m"])
    out = connected_components(pairs, max_rounds=16)
    return out.map_batches(
        lambda t: pa.table(
            {"entity_id": t["node"], "component": t["component"]}),
        batch_format="pyarrow")


def _q_kg_neighborhood(sf_dir: str):
    """Approximate neighborhood function N(h) over the KG entity graph
    (ANF / HyperBall with KMV sketches): one row per hop with the
    estimated number of (node, node-within-h-hops) pairs — the
    effective-diameter / connectivity profile of the extracted graph.
    Integer sketch semantics make the distributed run hash-match the
    unrolled DuckDB replay bit for bit."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        neighborhood_function,
    )

    return neighborhood_function(_kg(sf_dir)["edges"], hops=3)


def _q_kg_conflicts(sf_dir: str):
    """Constraint-violation audit: subjects asserting 2+ distinct
    objects under a mostly-functional relation (fun >= 0.8 from the
    cardinality profile) — the top-100 worst contradictions a KG
    curation pass reviews first
    (pipelines/graph_algo.py:functional_conflicts).  Typed k-sized
    head: the synthetic corpus has NO functional relations (max fun
    0.22), so the report is legitimately empty here and an untyped
    empty Dataset would lose its schema."""
    import pyarrow as pa

    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        functional_conflicts,
    )

    head = functional_conflicts(_kg(sf_dir)["edges"]).sort(
        ["n_objects", "rel_type", "src_id"],
        descending=[True, False, False]).limit(100)
    rows = head.take_all()
    return pa.table({
        "rel_type": pa.array([r["rel_type"] for r in rows], pa.string()),
        "src_id": pa.array([r["src_id"] for r in rows], pa.int64()),
        "n_objects": pa.array([r["n_objects"] for r in rows],
                              pa.int64()),
    })


def _q_kg_eff_diameter(sf_dir: str):
    """Integer effective diameter (smallest hop covering >=90% of the
    final ANF mass) — the one-row graph-compactness audit derived from
    the same KMV sketch pass as kg_neighborhood, so the DuckDB replay
    of that sketch hash-matches this too."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        effective_diameter,
    )

    return effective_diameter(_kg(sf_dir)["edges"], hops=3)


def _q_kg_rel_cardinality(sf_dir: str):
    """Per-relation functionality / inverse-functionality audit
    (AMIE's fun/ifun): distinct-subject and distinct-object counts per
    rel_type over the snapshot's unique edge identities, integer
    scaled.  The schema-quality report that separates 1:1 relations
    from fan-out relations."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        relation_cardinality,
    )

    return relation_cardinality(_kg(sf_dir)["edges"])


def _q_kg_pagerank_asof(sf_dir: str):
    """Time-sliced centrality: integer PageRank over only the edges
    whose validity window contains the as-of year (open bounds always
    valid) — 'who mattered in 2025', the temporal analytics twin of
    kg_pagerank.  One extra vectorized window filter before the same
    distinct + unrolled-PR path."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_document_pipeline_ray.pipelines.graph_algo import pagerank

    year = "2025"
    t = _kg(sf_dir)["triples"].select_columns(
        ["src_id", "dst_id", "start", "end"])

    def valid(tb: pa.Table) -> pa.Table:
        s = pc.fill_null(tb["start"], "")
        e = pc.fill_null(tb["end"], "")
        ok = pc.and_(
            pc.or_(pc.equal(s, ""), pc.less_equal(s, year)),
            pc.or_(pc.equal(e, ""), pc.greater_equal(e, year)))
        return pa.table({"src_id": tb["src_id"],
                         "dst_id": tb["dst_id"]}).filter(ok)

    return pagerank(t.map_batches(valid, batch_format="pyarrow"),
                    iters=3)


def _q_kg_ego_nets(sf_dir: str):
    """GNN training-data generation: per-seed bounded-fanout ego-net
    edge lists (GraphSAGE neighborhood sampling, deterministic
    lowest-id fanout) for the fixed khop seeds
    (pipelines/graph_algo.py:ego_net_sample)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        ego_net_sample,
    )

    return ego_net_sample(_kg(sf_dir)["edges"], _khop_seeds(), hops=2)


def _q_kg_edge_split(sf_dir: str):
    """Transductive link-prediction eval split: deterministic ~10%
    test slice of the distinct (s, r, d) identities by stable identity
    hash, filtered to edges whose BOTH endpoints also appear in the
    train remainder — the standard leakage rule (a test edge touching
    an unseen entity can't be scored by an embedding model trained on
    the rest).  Train-endpoint set is node-sided (ray.put once, read
    per batch); bucket flag is the same sha256 stable_id the entity
    ids use, so the DuckDB replay hash-matches.  Returns the surviving
    test edges."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from neo4j_document_pipeline_ray.functions.textnorm import stable_id
    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    ident = hash_aggregate(
        _kg(sf_dir)["edges"].select_columns(
            ["src_id", "rel_type", "dst_id"]),
        ["src_id", "rel_type", "dst_id"], [(None, "count", "_m")],
        num_partitions=8).drop_columns(["_m"])

    def flag(t: pa.Table) -> pa.Table:
        b = [stable_id(f"{s}|{r}|{d}") % 10
             for s, r, d in zip(t["src_id"].to_pylist(),
                                t["rel_type"].to_pylist(),
                                t["dst_id"].to_pylist())]
        return t.append_column("bucket", pa.array(b, pa.int64()))

    flagged = ident.map_batches(flag, batch_format="pyarrow")
    train = flagged.map_batches(
        lambda t: t.filter(pc.not_equal(t["bucket"], 7)),
        batch_format="pyarrow")

    def ends(t: pa.Table) -> pa.Table:
        return pa.table({"n": pa.concat_arrays([
            t["src_id"].combine_chunks(),
            t["dst_id"].combine_chunks()])})

    train_nodes = hash_aggregate(
        train.map_batches(ends, batch_format="pyarrow"), "n",
        [(None, "count", "_m")], num_partitions=8).drop_columns(["_m"])
    nodes_arr = pa.concat_tables(
        [x for x in ray.get(train_nodes.to_arrow_refs())
         if x.num_rows])["n"].combine_chunks()
    ref = ray.put(nodes_arr)

    def keep(t: pa.Table) -> pa.Table:
        tn = ray.get(ref)
        sel = t.filter(pc.equal(t["bucket"], 7))
        ok = pc.and_(pc.is_in(sel["src_id"], tn),
                     pc.is_in(sel["dst_id"], tn))
        return sel.filter(ok).select(["src_id", "rel_type", "dst_id"])

    return flagged.map_batches(keep, batch_format="pyarrow")


def _q_kg_verbalized(sf_dir: str):
    """KG→text corpus synthesis (KELM / T-REx style): one verbalized
    sentence per distinct surface triple with its corpus support —
    the synthetic-text channel for LM pretraining over the KG.  Pure
    map + one pre-combined count exchange; the sentence is a
    deterministic concat, so the DuckDB mirror hash-matches."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    from neo4j_document_pipeline_ray.stages.grouped import distinct_by

    ident = ["subject", "predicate", "rel_type", "object",
             "subject_type", "object_type", "object_kind",
             "start", "end", "term", "count"]
    t = _kg(sf_dir)["triples"].select_columns(ident)
    # distinct_by, not a keyed aggregate: start/end/term carry nulls
    # (same reason kg_triples uses it)
    distinct = distinct_by(t, "subject", subset=ident, num_partitions=8)
    agg = hash_aggregate(
        distinct.select_columns(["subject", "predicate", "object"]),
        ["subject", "predicate", "object"],
        [(None, "count", "n")], num_partitions=8)

    def verbalize(tb: pa.Table) -> pa.Table:
        sent = pc.binary_join_element_wise(
            tb["subject"], tb["predicate"], tb["object"], " ")
        return tb.append_column(
            "sentence", pc.binary_join_element_wise(sent, ".", ""))

    return agg.map_batches(verbalize, batch_format="pyarrow")


_SALIENCE_K = 5
_SALIENCE_SCALE = 10**6


def _q_kg_entity_salience(sf_dir: str):
    """Per-document salient entities (Gamon et al.'s entity-salience
    task, the doc→entity ranking an entity-centric index serves):
    top-5 entities per doc by the repo's integer TF-IDF surrogate
    ``tf * N * scale // (doc_len * df)`` over DISTINCT per-doc triple
    endpoint occurrences.  Shape: one distinct exchange, one
    (doc, entity) count aggregate, two node/doc-sided broadcast
    joins, and a doc-keyed partitioned group head (per-doc rank runs
    AFTER repartitioning by doc — a plain map_batches head would
    break on split blocks)."""
    import numpy as np
    import pandas as pd

    from neo4j_document_pipeline_ray.stages.grouped import (
        broadcast_join,
        distinct_by,
        hash_aggregate,
        partitioned_group_map,
    )

    ident = ["subject", "predicate", "rel_type", "object",
             "subject_type", "object_type", "object_kind",
             "start", "end", "term", "count"]
    t = _kg(sf_dir)["triples"].select_columns(
        ["doc_id", "src_id", "dst_id"] + ident)
    d = distinct_by(t, "doc_id",
                    subset=["doc_id", "src_id", "dst_id"] + ident,
                    num_partitions=8)

    def unpivot(tb: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        dc = tb["doc_id"].combine_chunks()
        return pa.table({
            "doc_id": pa.concat_arrays([dc, dc]),
            "entity_id": pa.concat_arrays([
                tb["src_id"].combine_chunks(),
                tb["dst_id"].combine_chunks()]),
        })

    tf = hash_aggregate(
        d.map_batches(unpivot, batch_format="pyarrow"),
        ["doc_id", "entity_id"], [(None, "count", "tf")],
        num_partitions=8,
    ).materialize()
    dl = hash_aggregate(
        tf.select_columns(["doc_id", "tf"]), "doc_id",
        [("tf", "sum", "dlen")], num_partitions=8)
    df_t = hash_aggregate(
        tf.select_columns(["entity_id"]), "entity_id",
        [(None, "count", "df")], num_partitions=8)
    n_docs = dl.count()

    j = broadcast_join(tf, dl, on=("doc_id",), num_partitions=8)
    j = broadcast_join(j, df_t, on=("entity_id",), num_partitions=8)

    def score(tb: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        tfv = tb["tf"].to_numpy(zero_copy_only=False)
        dlen = tb["dlen"].to_numpy(zero_copy_only=False)
        dfv = tb["df"].to_numpy(zero_copy_only=False)
        sal = (tfv * n_docs * _SALIENCE_SCALE) // (dlen * dfv)
        return pa.table({
            "doc_id": tb["doc_id"], "entity_id": tb["entity_id"],
            "salience_scaled": pa.array(sal, pa.int64()),
        })

    scored = j.map_batches(score, batch_format="pyarrow")

    def head(g: "pd.DataFrame") -> "pd.DataFrame":
        if g.empty:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=object),
                "entity_id": pd.Series([], dtype="int64"),
                "rank": pd.Series([], dtype="int64"),
                "salience_scaled": pd.Series([], dtype="int64"),
            })
        g = g.sort_values(
            ["doc_id", "salience_scaled", "entity_id"],
            ascending=[True, False, True], kind="mergesort")
        g["rank"] = (g.groupby("doc_id").cumcount() + 1).astype("int64")
        out = g[g["rank"] <= _SALIENCE_K]
        return out[["doc_id", "entity_id", "rank", "salience_scaled"]]

    return partitioned_group_map(scored, "doc_id", head,
                                 num_partitions=8)


_CARD_FACTS = 8


def _q_kg_entity_cards(sf_dir: str):
    """Per-entity "card": canonical name + the first 8 distinct
    (predicate, object) facts in deterministic order + the total fact
    count — entity-LEVEL KG→text corpus synthesis (the entity-card
    twin of kg_verbalized's per-triple sentences: KELM-style corpus
    construction aggregates a subject's facts into one passage).
    Shape: one distinct exchange + one entity-keyed partitioned group
    map; group size is bounded by entity out-degree."""
    import pandas as pd

    from neo4j_document_pipeline_ray.stages.grouped import (
        hash_aggregate,
        partitioned_group_map,
    )

    t = _kg(sf_dir)["triples"].select_columns(
        ["src_id", "subject", "predicate", "object"])
    d = hash_aggregate(
        t, ["src_id", "subject", "predicate", "object"],
        [(None, "count", "_m")], num_partitions=8,
    ).drop_columns(["_m"])

    cap = _CARD_FACTS

    def cards(df: "pd.DataFrame") -> "pd.DataFrame":
        if df.empty:
            return pd.DataFrame({
                "entity_id": pd.Series([], dtype="int64"),
                "name": pd.Series([], dtype=object),
                "n_facts": pd.Series([], dtype="int64"),
                "card": pd.Series([], dtype=object),
            })
        rep = df.groupby("src_id")["subject"].min()
        f = df[["src_id", "predicate", "object"]].drop_duplicates()
        f = f.sort_values(["src_id", "predicate", "object"],
                          kind="mergesort")
        f["fact"] = f["predicate"] + " " + f["object"]
        g = f.groupby("src_id")["fact"]
        n = g.size()
        head = g.apply(lambda s: "; ".join(s.iloc[:cap]))
        out = pd.DataFrame({
            "entity_id": n.index.to_numpy().astype("int64"),
            "name": rep.reindex(n.index).to_numpy(),
            "n_facts": n.to_numpy().astype("int64"),
        })
        out["card"] = (out["name"] + ": "
                       + head.reindex(n.index).to_numpy() + ".")
        return out

    return partitioned_group_map(d, "src_id", cards, num_partitions=8)


def _q_kg_distant_pairs(sf_dir: str):
    """Distant-supervision RE training pairs (Mintz et al.): every
    (KB edge, co-mentioning document) with a gold/silver provenance
    flag (pipelines/graph_algo.py:distant_supervision)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        distant_supervision,
    )

    kg = _kg(sf_dir)
    return distant_supervision(kg["mentions"], kg["edges"], kg["triples"])


_DS_SPAN = 300  # max distance between the two mention starts


def _q_kg_distant_contexts(sf_dir: str):
    """The text side of distant supervision: for every distant pair
    whose BOTH canonical names occur verbatim in the document within
    ``_DS_SPAN`` chars of each other, the covering ±60-char context
    window plus both offsets — the actual input rows an RE trainer
    consumes (pairs alone are labels without text).

    Shape: reuses distant_supervision's pair stream; the two name
    maps are node-sided broadcast joins; document text ships through
    the doc_id hash join once; finds are vectorized per distinct name
    within each batch (the kg_mention_contexts kernel, run twice)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        distant_supervision,
    )
    from neo4j_document_pipeline_ray.stages.grouped import (
        broadcast_join,
        safe_join,
    )

    kg = _kg(sf_dir)
    pairs = distant_supervision(
        kg["mentions"], kg["edges"], kg["triples"]).select_columns(
        ["doc_id", "src_id", "rel_type", "dst_id"])

    def named(col, alias):
        return kg["nodes"].map_batches(
            lambda t, _c=col, _a=alias: pa.table(
                {_c: t["entity_id"], _a: t["name"]}),
            batch_format="pyarrow")

    x = broadcast_join(pairs, named("src_id", "s_name"), on=("src_id",))
    x = broadcast_join(x, named("dst_id", "d_name"), on=("dst_id",))

    # FUSED reduce-side join: a hash join would replicate the ~3 KB doc
    # text onto every one of the 418k pair rows and push ~1 GB of
    # duplicated text through the object store into the contexts map
    # (measured 33 s at sf0.01).  Instead pairs and doc text are
    # co-partitioned by doc_id (text ships ONCE per doc) and the
    # contexts — the only small output — are computed inside the
    # partition task.
    from neo4j_document_pipeline_ray.stages.grouped import (
        partitioned_group_map,
    )

    _COLS = ["doc_id", "src_id", "rel_type", "dst_id", "s_name",
             "d_name", "text"]

    def tag_pairs(t: pa.Table) -> pa.Table:
        t = t.append_column("text", pa.nulls(t.num_rows, pa.string()))
        return t.select(_COLS)

    def tag_docs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "doc_id": t["doc_id"],
            "src_id": pa.nulls(n, pa.int64()),
            "rel_type": pa.nulls(n, pa.string()),
            "dst_id": pa.nulls(n, pa.int64()),
            "s_name": pa.nulls(n, pa.string()),
            "d_name": pa.nulls(n, pa.string()),
            "text": t["text"],
        })

    both = x.map_batches(tag_pairs, batch_format="pyarrow").union(
        kg["docs"].select_columns(["doc_id", "text"]).map_batches(
            tag_docs, batch_format="pyarrow"))

    def _find(t, col):
        offs = np.full(t.num_rows, -1, dtype=np.int64)
        idx_by_name: dict = {}
        for i, nm in enumerate(t[col].to_pylist()):
            idx_by_name.setdefault(nm, []).append(i)
        for nm, idxs in idx_by_name.items():
            if not nm:
                continue
            sub = t["text"].take(pa.array(idxs))
            offs[np.asarray(idxs)] = pc.find_substring(
                sub, nm).to_numpy(zero_copy_only=False)
        return offs

    def contexts_partition(t: pa.Table) -> pa.Table:
        is_doc = pc.is_valid(t["text"])
        docs_part = t.filter(is_doc)
        prs = t.filter(pc.invert(is_doc))
        txt = dict(zip(docs_part["doc_id"].to_pylist(),
                       docs_part["text"].to_pylist()))
        texts = [txt.get(d) for d in prs["doc_id"].to_pylist()]
        have = pa.array([x is not None for x in texts])
        prs = prs.filter(have)  # inner-join semantics
        texts = [x for x in texts if x is not None]
        t2 = prs.drop_columns(["text"]).append_column(
            "text", pa.array(texts, pa.string()))
        o1, o2 = _find(t2, "s_name"), _find(t2, "d_name")
        keep = (o1 >= 0) & (o2 >= 0) & (np.abs(o1 - o2) <= _DS_SPAN)
        sub = t2.filter(pa.array(keep))
        o1, o2 = o1[keep], o2[keep]
        texts = sub["text"].to_pylist()
        sn = sub["s_name"].to_pylist()
        dn = sub["d_name"].to_pylist()
        ctx = []
        for s, a, b, p1, p2 in zip(texts, sn, dn, o1, o2):
            lo = max(0, min(p1, p2) - _CTX_PAD)
            hi = min(len(s), max(p1 + len(a), p2 + len(b)) + _CTX_PAD)
            ctx.append(s[lo:hi])
        return pa.table({
            "doc_id": sub["doc_id"],
            "src_id": sub["src_id"],
            "rel_type": sub["rel_type"],
            "dst_id": sub["dst_id"],
            "src_offset": pa.array(o1, pa.int64()),
            "dst_offset": pa.array(o2, pa.int64()),
            "context": pa.array(ctx, pa.string()),
        })

    return partitioned_group_map(both, "doc_id", contexts_partition,
                                 batch_format="pyarrow")


def _q_ann_pq_topk(sf_dir: str):
    """PQ top-k through the asymmetric-distance code table (32x
    compression at dim 64 / m 8) with exact re-rank of the candidate
    head — the memory-bound ANN layout for corpora whose raw vectors
    cannot be scanned.  Deterministic end to end — codebook replay +
    in-SQL encode + ADC + re-rank form an EXACT SQL twin
    (_pq_oracle_sql); pytest additionally pins exact reconstruction ==
    brute force and rerank recall."""
    import os

    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.similarity import (
        build_pq_index,
        pq_topk,
        query_vector,
    )

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb_path)
    idx = os.path.join(
        "/tmp/graft_pq_index",
        f"{os.path.basename(os.path.normpath(sf_dir))}"
        f"-{st.st_size}-{int(st.st_mtime)}",
    )
    if not os.path.isdir(idx):
        build_pq_index(rd.read_parquet(emb_path), idx)
    return pq_topk(idx, query_vector(sf_dir), k=10, rerank=50,
                   embeddings=rd.read_parquet(emb_path))


def _q_ann_ivf_update_topk(sf_dir: str):
    """IVF index maintenance: build on the first half of the corpus,
    fold the second half in WITHOUT retraining (frozen centroids,
    per-partition appends), query through the updated index.
    Deterministic — the frozen first-half centroids bake into an EXACT
    SQL twin; pytest additionally pins full-probe-after-update ==
    brute force over the whole corpus."""
    import os

    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.similarity import (
        build_ivf_index,
        ivf_index_topk,
        query_vector,
        update_ivf_index,
    )

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(emb_path)
    idx = os.path.join(
        "/tmp/graft_ivf_upd_index",
        f"{os.path.basename(os.path.normpath(sf_dir))}"
        f"-{st.st_size}-{int(st.st_mtime)}",
    )
    emb = rd.read_parquet(emb_path)
    n = emb.count()
    if not os.path.isdir(idx):
        build_ivf_index(emb.filter(lambda r: r["vec_id"] < n // 2),
                        idx, n_centroids=16)
        update_ivf_index(emb.filter(lambda r: r["vec_id"] >= n // 2),
                         idx)
    return ivf_index_topk(idx, query_vector(sf_dir), k=10, nprobe=4)


def _q_kg_harmonic(sf_dir: str):
    """Approximate harmonic centrality from the HyperBall/KMV sketch
    rounds (Boldi/Vigna 2013) — integer telescoped weighting, one
    node-keyed sum."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        harmonic_centrality_approx,
    )

    return harmonic_centrality_approx(_kg(sf_dir)["edges"], hops=3)


def _q_kg_betweenness(sf_dir: str):
    """Pivot-sampled truncated-Brandes betweenness over the KG entity
    graph — integer-scaled dependency accumulation from the top-degree
    pivots."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        betweenness_approx,
    )

    return betweenness_approx(_kg(sf_dir)["edges"])


def _q_kg_wl_roles(sf_dir: str):
    """Weisfeiler-Leman structural-role histogram over the typed KG
    edge table (2 refinement rounds): (wl_label, n_nodes), largest
    roles first — the graph's 1-WL fingerprint and per-node role ids
    for entity clustering / GNN features."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        wl_roles_histogram,
    )

    return wl_roles_histogram(_kg(sf_dir)["edges"], rounds=2)


def _q_kg_scc(sf_dir: str):
    """Strongly connected components over the DIRECTED KG edge set
    (GDS scc analog; kg_components is the undirected view): per-node
    (entity_id, scc_id) with scc_id = min entity id of the component —
    the bowtie decomposition (giant SCC vs in/out DAG tendrils)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        strongly_connected_components,
    )

    return strongly_connected_components(_kg(sf_dir)["edges"])


def _q_kg_bowtie(sf_dir: str):
    """Broder bowtie decomposition: per node SCC / IN / OUT / OTHER
    relative to the largest strongly connected component — the
    web-graph structure report, composed from the SCC pass + two
    directed multi-seed BFS sweeps."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        bowtie_classes,
    )

    return bowtie_classes(_kg(sf_dir)["edges"])


def _q_kg_triads(sf_dir: str):
    """Directed triad census over closed triads — the motif profile
    (feed-forward vs cycle vs mutual-core triangle mass) that
    separates citation-like from social-like graph shapes."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        triad_census,
    )

    return triad_census(_kg(sf_dir)["edges"])


def _q_kg_struct_profile(sf_dir: str):
    """One-row structural audit: reciprocity (directed edges whose
    reverse exists) + Newman degree assortativity, both exact in
    integer math — the lead numbers of a graph-shape report."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        structural_profile,
    )

    return structural_profile(_kg(sf_dir)["edges"])


def _q_kg_truss(sf_dir: str):
    """4-truss of the KG edge set: edges kept only while they sit in
    >= 2 triangles of OTHER kept edges (iterative peeling to the
    fixpoint) — the community-corroborated relation subgraph, with
    within-truss support per edge."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        ktruss,
    )

    return ktruss(_kg(sf_dir)["edges"], k=4)


def _q_kg_negative(sf_dir: str):
    """Deterministic hash-bucket negative edge samples — the non-edge
    training pairs a KG-embedding trainer consumes next to kg_edges
    and kg_walks."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        negative_samples,
    )

    return negative_samples(_kg(sf_dir)["edges"])


def _q_kg_rules(sf_dir: str):
    """AMIE-style 2-atom chain rules over the typed edge table: top
    chains by path support, closure counts and integer confidence."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        rule_mining,
    )

    return rule_mining(_kg(sf_dir)["edges"])


_CTX_PAD = 60


def _q_kg_mention_contexts(sf_dir: str):
    """NER/RE training-data generation from the KG: for every (doc,
    entity) mention whose canonical name occurs verbatim in the
    document, the FIRST occurrence offset and a ±60-char context
    window — the labeled spans an extraction-model trainer consumes.

    Shape: the name map is node-sided (broadcast-gated); document text
    ships through the doc_id hash join exactly once; the find is
    vectorized per distinct name within each batch
    (pc.find_substring over that name's rows)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_document_pipeline_ray.stages.grouped import (
        broadcast_join,
        safe_join,
    )

    kg = _kg(sf_dir)
    named = broadcast_join(
        kg["mentions"], kg["nodes"].select_columns(["entity_id", "name"]),
        on=("entity_id",))
    rows = safe_join(named, kg["docs"].select_columns(["doc_id", "text"]),
                     join_type="inner", num_partitions=8, on=("doc_id",))

    def contexts(t: pa.Table) -> pa.Table:
        names = t["name"].to_pylist()
        text = t["text"]
        offs = np.full(t.num_rows, -1, dtype=np.int64)
        idx_by_name: dict = {}
        for i, nm in enumerate(names):
            idx_by_name.setdefault(nm, []).append(i)
        for nm, idxs in idx_by_name.items():
            if not nm:
                continue
            sub = text.take(pa.array(idxs))
            found = pc.find_substring(sub, nm).to_numpy(
                zero_copy_only=False)
            offs[np.asarray(idxs)] = found
        keep = offs >= 0
        sub = t.filter(pa.array(keep))
        off = offs[keep]
        texts = sub["text"].to_pylist()
        nms = sub["name"].to_pylist()
        ctx = [
            s[max(0, o - _CTX_PAD): min(len(s), o + len(nm) + _CTX_PAD)]
            for s, nm, o in zip(texts, nms, off)
        ]
        return pa.table({
            "doc_id": sub["doc_id"],
            "entity_id": sub["entity_id"],
            "name_offset": pa.array(off, pa.int64()),
            "context": pa.array(ctx, pa.string()),
        })

    return rows.map_batches(contexts, batch_format="pyarrow")


def _q_kg_alias_candidates(sf_dir: str):
    """Near-miss alias candidates the exact norm-key merge cannot
    catch: token-set Jaccard >= 1/2 over normalized entity names via
    the uncapped prefix-filtered SSJoin kernel."""
    from neo4j_document_pipeline_ray.stages.entity_link import (
        alias_candidates,
    )

    return alias_candidates(_kg(sf_dir)["nodes"])


def _q_kg_entity_timeline(sf_dir: str):
    """Per-entity temporal profile — first/last crawl timestamp and
    document frequency — from the mentions table joined to page
    ``warc_ts``: the temporal-KG dimension (entity timelines) over
    crawl metadata, node-sided after one doc-keyed aggregate."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from neo4j_document_pipeline_ray.functions.textnorm import sha256_hex
    from neo4j_document_pipeline_ray.stages.grouped import (
        broadcast_join,
        hash_aggregate,
    )

    mentions = _kg(sf_dir)["mentions"]
    pages = rd.read_parquet(_corpus(sf_dir)["pages"],
                            columns=["text", "warc_ts"])

    def doc_ts(t: pa.Table) -> pa.Table:
        ids = [sha256_hex(x or "") for x in t["text"].to_pylist()]
        ts = pc.cast(pc.cast(t["warc_ts"], pa.timestamp("us")), pa.int64())
        return pa.table({"doc_id": pa.array(ids, pa.string()), "ts": ts})

    spans = hash_aggregate(
        pages.map_batches(doc_ts, batch_format="pyarrow"),
        "doc_id", [("ts", "min", "f"), ("ts", "max", "l")])
    j = broadcast_join(mentions, spans, on=("doc_id",))
    return hash_aggregate(
        j.select_columns(["entity_id", "f", "l"]), "entity_id",
        [("f", "min", "first_seen_us"), ("l", "max", "last_seen_us"),
         (None, "count", "n_docs")])


def _q_kg_edge_timeline(sf_dir: str):
    """Per-EDGE temporal profile: first/last crawl timestamp and
    supporting-document count per (src, rel, dst) — the edge-level
    twin of kg_entity_timeline (a temporal KG's edge validity
    window)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from neo4j_document_pipeline_ray.functions.textnorm import sha256_hex
    from neo4j_document_pipeline_ray.stages.grouped import (
        broadcast_join,
        hash_aggregate,
    )

    t = _kg(sf_dir)["triples"].select_columns(
        ["src_id", "rel_type", "dst_id", "doc_id"])
    prov = hash_aggregate(
        t, ["src_id", "rel_type", "dst_id", "doc_id"],
        [(None, "count", "_m")]).drop_columns(["_m"])

    pages = rd.read_parquet(_corpus(sf_dir)["pages"],
                            columns=["text", "warc_ts"])

    def doc_ts(tb: pa.Table) -> pa.Table:
        ids = [sha256_hex(x or "") for x in tb["text"].to_pylist()]
        ts = pc.cast(pc.cast(tb["warc_ts"], pa.timestamp("us")),
                     pa.int64())
        return pa.table({"doc_id": pa.array(ids, pa.string()),
                         "ts": ts})

    spans = hash_aggregate(
        pages.map_batches(doc_ts, batch_format="pyarrow"),
        "doc_id", [("ts", "min", "f"), ("ts", "max", "l")])
    j = broadcast_join(prov, spans, on=("doc_id",))
    return hash_aggregate(
        j.select_columns(["src_id", "rel_type", "dst_id", "f", "l"]),
        ["src_id", "rel_type", "dst_id"],
        [("f", "min", "first_seen_us"), ("l", "max", "last_seen_us"),
         (None, "count", "n_docs")])


def _q_kg_domain_entities(sf_dir: str):
    """Per-domain KG profile: documents, distinct entities and mention
    rows per URL host — where each slice of the graph comes from (the
    provenance rollup a crawl-curation pass reads next to
    docs_domain_reputation)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_document_pipeline_ray.stages.grouped import (
        broadcast_join,
        hash_aggregate,
    )

    kg = _kg(sf_dir)

    def dom(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["url"], r"^https?://(?P<host>[^/]+)")
        host = pc.struct_field(ex, "host")
        return pa.table({"doc_id": t["doc_id"],
                         "domain": pc.fill_null(host, "")})

    dmap = kg["docs"].select_columns(["doc_id", "url"]).map_batches(
        dom, batch_format="pyarrow")
    docs_per = hash_aggregate(dmap.select_columns(["domain"]),
                              "domain", [(None, "count", "n_docs")])
    m = broadcast_join(kg["mentions"], dmap, on=("doc_id",))
    ment_per = hash_aggregate(m.select_columns(["domain"]),
                              "domain", [(None, "count", "n_mentions")])
    de = hash_aggregate(m.select_columns(["domain", "entity_id"]),
                        ["domain", "entity_id"],
                        [(None, "count", "_m")]).drop_columns(["_m"])
    ent_per = hash_aggregate(de.select_columns(["domain"]),
                             "domain", [(None, "count", "n_entities")])
    out = broadcast_join(docs_per, ent_per, on=("domain",),
                         join_type="left_outer")
    out = broadcast_join(out, ment_per, on=("domain",),
                         join_type="left_outer")
    return out.map_batches(
        lambda t: pa.table({
            "domain": t["domain"],
            "n_docs": t["n_docs"],
            "n_entities": pc.fill_null(t["n_entities"], 0),
            "n_mentions": pc.fill_null(t["n_mentions"], 0),
        }),
        batch_format="pyarrow")


def _q_kg_path_between(sf_dir: str):
    """Deterministic shortest path between the two fixed seed
    entities (min-parent BFS; the reference's Neo4j shortestPath
    'how are X and Y related' query)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        shortest_path_between,
    )

    s, t = _khop_seeds()[:2]
    return shortest_path_between(_kg(sf_dir)["edges"], s, t)


def _q_kg_degree_hist(sf_dir: str):
    """Log2-bucket degree histogram — the power-law-tail audit of the
    extracted entity graph (same degree definition as kg_degree_topk)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        degree_histogram,
    )

    return degree_histogram(_kg(sf_dir)["edges"])


def _q_kg_diff(sf_dir: str):
    """Snapshot-diff audit for the incremental path: when the corpus
    half whose doc_id starts 8-f is retracted, which edges survive on
    remaining provenance and which lose ALL support — the retraction
    twin of pipelines/incremental.py's additive fold.  Pure
    provenance-side aggregation (one distinct + one group exchange);
    nothing rebuilds."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    t = _kg(sf_dir)["triples"].select_columns(
        ["src_id", "rel_type", "dst_id", "doc_id"])
    prov = hash_aggregate(
        t, ["src_id", "rel_type", "dst_id", "doc_id"],
        [(None, "count", "_m")]).drop_columns(["_m"])

    def tag(tb: pa.Table) -> pa.Table:
        keep = pc.less(pc.utf8_slice_codeunits(tb["doc_id"], 0, 1), "8")
        return pa.table({
            "src_id": tb["src_id"], "rel_type": tb["rel_type"],
            "dst_id": tb["dst_id"],
            "kept": pc.cast(keep, pa.int64()),
        })

    agg = hash_aggregate(
        prov.map_batches(tag, batch_format="pyarrow"),
        ["src_id", "rel_type", "dst_id"],
        [(None, "count", "n_docs"), ("kept", "sum", "n_docs_kept")])

    def status(tb: pa.Table) -> pa.Table:
        dropped = pc.equal(tb["n_docs_kept"], 0)
        return tb.append_column(
            "status",
            pc.if_else(dropped, pa.scalar("dropped"), pa.scalar("kept")))

    return agg.map_batches(status, batch_format="pyarrow")


def _q_kg_msf(sf_dir: str):
    """Minimum spanning forest over the KG entity graph (distributed
    Boruvka; deterministic distinct edge order makes the forest unique
    and hash-checkable against an unrolled-SQL Boruvka replay)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        minimum_spanning_forest,
    )

    return minimum_spanning_forest(_kg(sf_dir)["edges"])


def _q_kg_export_neo4j(sf_dir: str):
    """Neo4j bulk-import export (the scale path to the reference's
    target database): write the snapshot as neo4j-admin CSV parts
    (distributed, headerless parts + typed header files), then read
    the node parts back - the returned table must hash-match the
    kg_nodes oracle, proving the export preserves content exactly."""
    import glob
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.csv as pacsv

    from neo4j_document_pipeline_ray.sources.export import export_neo4j_bulk

    kg = _kg(sf_dir)
    out_dir = tempfile.mkdtemp(prefix="graft_neo4j_export_")
    try:
        out = export_neo4j_bulk(kg, out_dir)
        parts = []
        # explicit types: inference would turn an all-numeric name into
        # int64 (mismatching the varchar oracle) and round-trip a null
        # name as empty string
        conv = pacsv.ConvertOptions(column_types={
            "entity_id": pa.int64(), "name": pa.string(),
            "norm_key": pa.string(), "label": pa.string(),
        })
        for p in sorted(glob.glob(os.path.join(out["nodes_dir"], "*.csv"))):
            parts.append(pacsv.read_csv(
                p,
                read_options=pacsv.ReadOptions(
                    column_names=["entity_id", "name", "norm_key", "label"]),
                convert_options=conv))
        t = pa.concat_tables(parts)
        return t.select(["entity_id", "label", "name", "norm_key"])
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _q_kg_integrity(sf_dir: str):
    """Snapshot integrity audit in one row: node/edge counts, orphan
    edge endpoints (endpoint id absent from the nodes table - must be
    0 by construction since ids are pure functions of norm_key), and
    self-loop count.  The orphan check is a distributed anti-join:
    endpoint ids probe the broadcast node-id set per batch."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    kg = _kg(sf_dir)
    nodes = kg["nodes"].select_columns(["entity_id"])
    edges = kg["edges"].select_columns(["src_id", "dst_id"])

    ids_ref = ray.put(pa.concat_tables(
        ray.get(nodes.to_arrow_refs()))["entity_id"].combine_chunks())

    def audit(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        orph = pc.sum(pc.cast(pc.invert(pc.is_in(
            pa.concat_arrays([t["src_id"].combine_chunks(),
                              t["dst_id"].combine_chunks()]),
            value_set=ids)), pa.int64())).as_py() or 0
        loops = pc.sum(pc.cast(pc.equal(t["src_id"], t["dst_id"]),
                               pa.int64())).as_py() or 0
        return pa.table({
            "n_edges": pa.array([t.num_rows], pa.int64()),
            "n_orphan_endpoints": pa.array([orph], pa.int64()),
            "n_self_loops": pa.array([loops], pa.int64()),
        })

    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    partials = edges.map_batches(audit, batch_format="pyarrow").map_batches(
        lambda t: t.append_column("_k", pa.array([1] * t.num_rows, pa.int64())),
        batch_format="pyarrow")
    # zero-valued seed row: an empty edges table must still audit to
    # exactly one row of zero counts (the SQL oracle always returns one
    # row) — the degenerate case the audit exists to catch
    import ray.data as _rd

    seed = _rd.from_arrow(pa.table({
        "n_edges": pa.array([0], pa.int64()),
        "n_orphan_endpoints": pa.array([0], pa.int64()),
        "n_self_loops": pa.array([0], pa.int64()),
        "_k": pa.array([1], pa.int64()),
    }))
    partials = partials.union(seed)
    agg = hash_aggregate(partials, "_k", [
        ("n_edges", "sum", "n_edges"),
        ("n_orphan_endpoints", "sum", "n_orphan_endpoints"),
        ("n_self_loops", "sum", "n_self_loops"),
    ], num_partitions=1)
    n_nodes = kg["nodes"].count()
    return agg.map_batches(
        lambda t: pa.table({
            "n_nodes": pa.array([n_nodes] * t.num_rows, pa.int64()),
            "n_edges": t["n_edges"],
            "n_orphan_endpoints": t["n_orphan_endpoints"],
            "n_self_loops": t["n_self_loops"],
        }),
        batch_format="pyarrow")


_KCORE_K = 12


def _q_kg_kcore(sf_dir: str):
    """k-core decomposition of the KG (Neo4j GDS kcore analog):
    surviving nodes of iterative peeling at k=_KCORE_K with their
    in-core degree (pipelines/graph_algo.py:kcore)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import kcore

    return kcore(_kg(sf_dir)["edges"], k=_KCORE_K)


def _q_kg_ppr(sf_dir: str):
    """Personalized PageRank from the top-degree entity (3 rounds,
    85/100 damping) — the relevance-to-a-seed ranking a GraphRAG
    retrieval layer uses to order expansion (Neo4j GDS analog).
    Integer arithmetic; mirrored by an unrolled DuckDB oracle."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        personalized_pagerank,
    )

    return personalized_pagerank(_kg(sf_dir)["edges"], iters=3)


_LPA_ROUNDS = 4


def _q_kg_communities(sf_dir: str):
    """Synchronous label-propagation communities over the KG (Neo4j
    GDS labelPropagation analog), fixed rounds, min-of-modal-label
    tie-break (pipelines/graph_algo.py:label_prop_communities)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        label_prop_communities,
    )

    return label_prop_communities(_kg(sf_dir)["edges"], rounds=_LPA_ROUNDS)


def _q_kg_truss_support(sf_dir: str):
    """Per-edge triangle support (the k-truss peeling quantity): how
    many common neighbors corroborate each extracted edge."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        edge_triangle_support,
    )

    return edge_triangle_support(_kg(sf_dir)["edges"])


def _q_kg_supergraph(sf_dir: str):
    """Community-coarsened supergraph: per (community, community) pair
    the distinct-edge count (internal edges on the diagonal, cut sizes
    off it)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        community_supergraph,
    )

    return community_supergraph(_kg(sf_dir)["edges"], rounds=_LPA_ROUNDS)


def _q_kg_sssp(sf_dir: str):
    """BFS hop distances from the top-degree entity over the
    undirected KG — the distance-decay input of a retrieval ranker
    (reference's APOC BFS returns the neighborhood set only,
    graphutil.py:547-632)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        bfs_distances,
    )

    return bfs_distances(_kg(sf_dir)["edges"])


def _q_kg_sssp_weighted(sf_dir: str):
    """Weighted shortest-path costs from the top-degree entity —
    integer Bellman-Ford over deterministic synthetic edge weights,
    the traversal-COST generalization of kg_sssp
    (pipelines/graph_algo.py:sssp_weighted)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        sssp_weighted,
    )

    return sssp_weighted(_kg(sf_dir)["edges"])


def _q_kg_node_similarity(sf_dir: str):
    """Neighbor-set Jaccard top-20 (Neo4j GDS nodeSimilarity analog) —
    the entity-conflation signal of a KG curation pass
    (pipelines/graph_algo.py:node_similarity_topk)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        node_similarity_topk,
    )

    return node_similarity_topk(_kg(sf_dir)["edges"], k=20)


def _q_kg_link_pred_ra_topk(sf_dir: str):
    """Resource-allocation link prediction: top-20 non-adjacent pairs
    by integer-scaled sum of 1/deg over common neighbors
    (pipelines/graph_algo.py:link_prediction_ra_topk)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        link_prediction_ra_topk,
    )

    return link_prediction_ra_topk(_kg(sf_dir)["edges"], k=20)


def _q_kg_schema_report(sf_dir: str):
    """Graph-schema report (src label, rel type, dst label, edge
    count) - the reference's schema-visualization endpoint
    (main.py:656-726), which walks Neo4j's db.schema.visualization.
    Node labels broadcast onto the streaming edge table twice, then
    one two-phase hash aggregate."""
    import pyarrow as pa

    from neo4j_document_pipeline_ray.stages.grouped import (
        broadcast_join,
        hash_aggregate,
    )

    kg = _kg(sf_dir)
    nodes = kg["nodes"].select_columns(["entity_id", "label"])
    edges = kg["edges"].select_columns(["src_id", "rel_type", "dst_id"])

    j1 = broadcast_join(edges, nodes, on=("src_id",),
                        right_on=("entity_id",))
    j1 = j1.map_batches(
        lambda t: t.rename_columns(
            [{"label": "src_label"}.get(c, c) for c in t.schema.names]),
        batch_format="pyarrow")
    j2 = broadcast_join(j1, nodes, on=("dst_id",),
                        right_on=("entity_id",))
    j2 = j2.map_batches(
        lambda t: t.rename_columns(
            [{"label": "dst_label"}.get(c, c) for c in t.schema.names]),
        batch_format="pyarrow")
    return hash_aggregate(
        j2.select_columns(["src_label", "rel_type", "dst_label"]),
        ["src_label", "rel_type", "dst_label"],
        [(None, "count", "n_edges")],
    )


def _q_kg_link_pred_topk(sf_dir: str):
    """Link prediction: top non-adjacent entity pairs by common-
    neighbor count - the propose-missing-edges pass of a KG curation
    review.  Full-adjacency wedges in hash partitions, one pair-count
    aggregate, existing edges removed by a left-outer broadcast join."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        link_prediction_topk,
    )

    return link_prediction_topk(_kg(sf_dir)["edges"], k=20)


def _q_kg_cooccur_topk(sf_dir: str):
    """Top entity pairs by doc-level co-occurrence lift over the
    mentions table — the relatedness signal for KG edge proposal /
    conflation review.  Integer lift, so the SQL replay hash-matches."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        cooccurrence_topk,
    )

    return cooccurrence_topk(_kg(sf_dir)["mentions"], k=50, min_count=2)


def _q_kg_hits(sf_dir: str):
    """Integer HITS hubs/authorities over the directed KG — the
    mutual-recursion centrality (hub = survey entity, authority = the
    entity facts converge on) PageRank conflates
    (pipelines/graph_algo.py:hits)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import hits

    return hits(_kg(sf_dir)["edges"], iters=3)


def _q_kg_clustering(sf_dir: str):
    """Per-node local clustering coefficient (Watts-Strogatz):
    2*tri/(deg*(deg-1)) integer-scaled — separates hub spokes from
    clique members (pipelines/graph_algo.py:clustering_coefficient)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        clustering_coefficient,
    )

    return clustering_coefficient(_kg(sf_dir)["edges"])


def _q_kg_walks(sf_dir: str):
    """Deterministic random-walk corpus over the KG (DeepWalk data
    generation): 2 walks x 3 steps from every non-sink node; each step
    picks the out-neighbor minimizing an integer hash, so the corpus
    is bit-identical under any partitioning
    (pipelines/graph_algo.py:random_walks)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        random_walks,
    )

    return random_walks(_kg(sf_dir)["edges"], walks_per_node=2, steps=3)


def _q_kg_skipgrams(sf_dir: str):
    """(center, context, n) skip-gram pairs from the deterministic
    walk corpus (window 2) — the word2vec-style co-occurrence matrix a
    graph-embedding trainer consumes
    (pipelines/graph_algo.py:walk_skipgram_pairs)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        walk_skipgram_pairs,
    )

    return walk_skipgram_pairs(_kg(sf_dir)["edges"], walks_per_node=2,
                               steps=3, window=2)


def _q_kg_related_docs(sf_dir: str):
    """Top related-document pairs by shared entities (integer Jaccard
    over the doc x entity bipartite mentions graph, ubiquitous
    entities excluded) — the 'related pages' signal
    (pipelines/graph_algo.py:related_docs_topk)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        related_docs_topk,
    )

    return related_docs_topk(
        _kg(sf_dir)["mentions"], k=50, min_shared=2, max_entity_docs=50)


def _q_kg_graphrag_batch(sf_dir: str):
    """Batch retrieval serving: a GraphRAGServer actor pool (LocalKG
    rebuilt once per actor from ray.put tier refs) answers a question
    log as a streaming map_batches - the offline-RAG throughput shape.
    Rows-only: formatting is not SQL; per-question parity with
    graphrag() is pinned in tests/test_graphrag.py."""
    import pyarrow as pa

    import ray.data as rd

    from neo4j_document_pipeline_ray.pipelines.graphrag_local import (
        graphrag_serve_batch,
    )

    questions = [
        _QUESTION,
        "Who announced the National Broadband Plan?",
        "What is the capital of Malaysia?",
        "Which pillar does the National AI Roadmap belong to?",
    ]
    qds = rd.from_arrow(pa.table({
        "question_id": pa.array(list(range(len(questions))), pa.int64()),
        "question": pa.array(questions, pa.string()),
    }))
    return graphrag_serve_batch(_kg(sf_dir), qds, top_k=5, hops=2,
                                concurrency=2)


def _q_kg_graphrag(sf_dir: str):
    import pandas as pd

    from neo4j_document_pipeline_ray.pipelines.graphrag import graphrag

    res = graphrag(_kg(sf_dir), _QUESTION, top_k=5, hops=2)
    return pd.DataFrame({"fact": res["facts"].splitlines()})


def _q_kg_graphrag_seeds(sf_dir: str):
    """The /graphrag DECISION CORE, oracle-checked: hybrid blend ->
    MMR (lambda=0.7) -> document round-robin diversification ->
    one-seed-per-document dedup, exactly the seed-selection chain of
    graphrag() (main.py:221-400).  Returns the diversified candidate
    list with ranks, blended scores, and the seed flags — everything
    the facts formatter consumes except the snippet text."""
    import numpy as np
    import pandas as pd

    from neo4j_document_pipeline_ray.pipelines.graphrag import (
        _filter_by_ids,
        diversify_by_document,
        doc_titles_for_nodes,
        embed_question,
        first_doc_for_nodes,
        hybrid_candidates,
        mmr_select,
        one_seed_per_document,
    )

    kg = _kg(sf_dir)
    qvec = embed_question(_QUESTION)
    cands = hybrid_candidates(kg["nodes"], _QUESTION, qvec,
                              k_vec=12, k_kw=12,
                              alpha_vec=0.6, beta_kw=0.4)
    ids = [c["entity_id"] for c in cands]
    emb_rows = _filter_by_ids(kg["nodes"], ids, "entity_id") \
        .select_columns(["entity_id", "embedding"]).take_all()
    embs = {int(r["entity_id"]): np.asarray(r["embedding"],
                                            dtype=np.float32)
            for r in emb_rows}
    sel = mmr_select(cands, embs, k=5)
    sel_ids = [c["entity_id"] for c in sel]
    titles = doc_titles_for_nodes(kg["mentions"], kg["docs"], sel_ids)
    div = diversify_by_document(sel, titles, k=len(sel))
    first_doc = first_doc_for_nodes(kg["mentions"],
                                    [c["entity_id"] for c in div])
    seeds = set(one_seed_per_document(div, first_doc))
    return pd.DataFrame({
        "rank": pd.Series(range(len(div)), dtype="int64"),
        "entity_id": pd.Series([c["entity_id"] for c in div],
                               dtype="int64"),
        "label": [c["label"] for c in div],
        "name": [c["name"] for c in div],
        "score": pd.Series([c["score"] for c in div], dtype="float64"),
        "is_seed": pd.Series(
            [int(c["entity_id"] in seeds) for c in div], dtype="int64"),
    })


def _q_docs_train_shards(sf_dir: str):
    """Deterministic seeded shuffle of the corpus into training shards
    (shard, pos) — the reproducible write layout a training-data
    export streams into; reshuffle = seed bump, no global sort."""
    from neo4j_document_pipeline_ray.extras.sampling import (
        docs_train_shards,
    )

    return docs_train_shards(sf_dir)


def _q_pages_lang_stats(sf_dir: str):
    """Language distribution + crawl-time range over the raw pages table
    (the curation pre-filter a web corpus runs before extraction; uses
    the input_hint's lang/warc_ts columns)."""
    import ray.data as rd

    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    paths = _corpus(sf_dir)
    pages = rd.read_parquet(paths["pages"], columns=["lang", "warc_ts"])
    out = hash_aggregate(pages, "lang", [
        (None, "count", "n"),
        ("warc_ts", "min", "first_ts"),
        ("warc_ts", "max", "last_ts"),
    ], num_partitions=2)

    def fmt(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        # Arrow's %S prints fractional seconds; floor to second
        # precision first so the text matches DuckDB's strftime
        def _fmt(col):
            sec = pc.floor_temporal(col, unit="second").cast(
                pa.timestamp("s"))
            return pc.strftime(sec, format="%Y-%m-%d %H:%M:%S")

        return pa.table({
            "lang": t["lang"],
            "n": t["n"],
            "first_ts": _fmt(t["first_ts"]),
            "last_ts": _fmt(t["last_ts"]),
        })

    return out.map_batches(fmt, batch_format="pyarrow")


def _q_pages_url_dedup(sf_dir: str):
    """Canonical-URL recrawl dedup over raw pages: collapse scheme /
    www / default-port / trailing-slash / query-string spellings, keep
    the earliest crawl per canonical URL — reads only url+warc_ts, the
    HTML payload never leaves storage (extras/urls.py)."""
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.urls import url_dedup

    paths = _corpus(sf_dir)
    pages = rd.read_parquet(paths["pages"], columns=["url", "warc_ts"])
    return url_dedup(pages)


def _q_pages_links(sf_dir: str):
    """Hyperlink edge list of the crawl: per-page href extraction +
    absolute-URL resolution — the web-graph construction primitive
    (host rank / crawl frontier / anchor mining start here;
    extras/urls.py:page_links)."""
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.urls import page_links

    paths = _corpus(sf_dir)
    return page_links(rd.read_parquet(paths["pages"],
                                      columns=["url", "html"]))


def _q_pages_host_graph(sf_dir: str):
    """Host-level link graph (src_host, dst_host, n_links) — the
    page-graph coarsening every web-scale ranking / crawl-scheduling
    pass runs first (extras/urls.py:host_graph)."""
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.urls import host_graph

    paths = _corpus(sf_dir)
    return host_graph(rd.read_parquet(paths["pages"],
                                      columns=["url", "html"]))


def _q_pages_host_rank(sf_dir: str):
    """Integer PageRank over the host graph — the host-authority
    signal for crawl prioritization and corpus quality weighting
    (extras/urls.py:host_rank; same stable_id + unrolled-PR replay
    contract as kg_pagerank)."""
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.urls import host_rank

    paths = _corpus(sf_dir)
    return host_rank(rd.read_parquet(paths["pages"],
                                     columns=["url", "html"]))


def _q_pages_host_harmonic(sf_dir: str):
    """Approximate harmonic centrality per host (the Common Crawl
    host-ranking metric) over the cross-host graph; isolated hosts
    score 0 (extras/urls.py:host_harmonic; KMV sketch, bit-replayable
    like kg_harmonic)."""
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.urls import host_harmonic

    paths = _corpus(sf_dir)
    return host_harmonic(rd.read_parquet(paths["pages"],
                                         columns=["url", "html"]))


def _q_pages_crawl_frontier(sf_dir: str):
    """Top-k out-linked canonical URLs not already crawled, ranked by
    citing-host breadth then citation count — the crawl scheduler's
    next-fetch list (extras/urls.py:crawl_frontier; tagged-union
    anti-join against the corpus's canonical URLs)."""
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.urls import crawl_frontier

    paths = _corpus(sf_dir)
    return crawl_frontier(
        rd.read_parquet(paths["pages"], columns=["url", "html"]),
        k=100,
        page_urls=rd.read_parquet(paths["pages"], columns=["url"]))


def _q_pages_url_templates(sf_dir: str):
    """URL template mining: canonical paths with digit runs collapsed
    to 'N', counted per (host, template) — the crawl-ops report that
    surfaces calendar traps / infinite URL spaces before they eat the
    fetch budget.  Pure map + one pre-combined count exchange."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.urls import (
        _SPLIT_RE,
        host_of,
    )
    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    paths = _corpus(sf_dir)
    pages = rd.read_parquet(paths["pages"], columns=["url"])

    def prep(t: pa.Table) -> pa.Table:
        host = host_of(t["url"])
        path = pc.fill_null(pc.struct_field(
            pc.extract_regex(t["url"], _SPLIT_RE), "path"), "")
        path = pc.replace_substring_regex(path, r"/+$", "")
        return pa.table({
            "host": host,
            "template": pc.replace_substring_regex(path, r"[0-9]+", "N"),
        })

    return hash_aggregate(
        pages.map_batches(prep, batch_format="pyarrow"),
        ["host", "template"], [(None, "count", "n_pages")],
        num_partitions=4)


def _q_pages_inlinks(sf_dir: str):
    """Top-k in-corpus citation report: per crawled canonical URL the
    inbound link count and citing-host breadth — the complement of
    pages_crawl_frontier (extras/urls.py:page_inlinks)."""
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.urls import page_inlinks

    paths = _corpus(sf_dir)
    return page_inlinks(
        rd.read_parquet(paths["pages"], columns=["url", "html"]),
        k=100,
        page_urls=rd.read_parquet(paths["pages"], columns=["url"]))


def _q_pages_anchor_terms(sf_dir: str):
    """Top (dst_url, anchor-text) citation pairs — anchor mining, the
    external naming signal web KGs weight above on-page text
    (extras/urls.py:anchor_terms; per-batch dict collapse keeps the
    exchange at (pair, count) partials)."""
    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.urls import anchor_terms

    paths = _corpus(sf_dir)
    return anchor_terms(rd.read_parquet(paths["pages"],
                                        columns=["url", "html"]))


def _q_pages_section_stats(sf_dir: str):
    """Per-site-section crawl profile over the raw pages table:
    section = first URL path segment (RE2 extract, '' when absent —
    DuckDB's regexp_extract convention), page count, total raw HTML
    bytes, and EXACT distinct-language count (two-phase: a
    (section, lang) distinct aggregate, then a section-keyed count) —
    the per-section crawl audit a web-curation pass runs before
    extraction, the section analog of pages_lang_stats."""
    import ray.data as rd

    from neo4j_document_pipeline_ray.stages.grouped import (
        broadcast_join,
        hash_aggregate,
    )

    paths = _corpus(sf_dir)
    pages = rd.read_parquet(paths["pages"], columns=["url", "lang", "html"])

    def prep(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        ex = pc.extract_regex(t["url"], r"^https?://[^/]+/(?P<sec>[^/]+)")
        return pa.table({
            "section": pc.fill_null(pc.struct_field(ex, "sec"), ""),
            "lang": t["lang"],
            "html_bytes": pc.cast(pc.binary_length(t["html"]), pa.int64()),
        })

    # base is lazy and consumed by two streaming passes (no pin)
    base = pages.map_batches(prep, batch_format="pyarrow")
    sl = hash_aggregate(
        base.select_columns(["section", "lang"]), ["section", "lang"],
        [(None, "count", "_m")], num_partitions=4).drop_columns(["_m"])
    nl = hash_aggregate(sl, "section", [(None, "count", "n_langs")],
                        num_partitions=4)
    agg = hash_aggregate(
        base.select_columns(["section", "html_bytes"]), "section",
        [(None, "count", "n_pages"),
         ("html_bytes", "sum", "total_html_bytes")], num_partitions=4)
    return broadcast_join(agg, nl, on=("section",))


def _q_kg_label_counts(sf_dir: str):
    """Per-label node counts (the reference's stats/graph-schema
    endpoints, main.py:600-623, 656-726) — two-phase Arrow
    ``hash_aggregate``, not Ray's sort-based aggregate."""
    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    nodes = _kg(sf_dir)["nodes"].select_columns(["label"])
    return hash_aggregate(nodes, "label", [("label", "count", "n")],
                          num_partitions=4)


def _q_kg_rel_counts(sf_dir: str):
    """Per-rel-type edge counts (main.py:600-623)."""
    from neo4j_document_pipeline_ray.stages.grouped import hash_aggregate

    edges = _kg(sf_dir)["edges"].select_columns(["rel_type"])
    return hash_aggregate(edges, "rel_type", [("rel_type", "count", "n")],
                          num_partitions=4)


def _q_ngram_jaccard(sf_dir: str):
    import os

    import ray.data as rd

    from neo4j_document_pipeline_ray.extras.dedup import ngram_jaccard_pairs

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id", "text"])
    return ngram_jaccard_pairs(docs, threshold=0.8)


def _q_mm_features(sf_dir: str):
    from neo4j_document_pipeline_ray.extras.multimodal import (
        extract_media_features,
        synthesize_media,
    )

    return extract_media_features(synthesize_media(n=96)).drop_columns(["feature"])


def _q_mm_resize(sf_dir: str):
    """Image resize plumbing: decode seam -> nearest-neighbor resize ->
    raw RGB payload; payload dropped for the check (n_bytes kept)."""
    import pyarrow as pa

    from neo4j_document_pipeline_ray.extras.multimodal import (
        resize_images,
        synthesize_media,
    )

    out = resize_images(synthesize_media(n=96), target=(32, 24))

    def summarize(t: pa.Table) -> pa.Table:
        n_bytes = [len(p) if p is not None else 0
                   for p in t["payload"].to_pylist()]
        return pa.table({
            "media_id": t["media_id"], "kind": t["kind"],
            "width": t["width"], "height": t["height"],
            "n_bytes": pa.array(n_bytes, pa.int64()),
        })

    return out.map_batches(summarize, batch_format="pyarrow")


def _q_mm_resize_png(sf_dir: str):
    """Image resize over REAL PNG payloads through the production
    decode seam (stdlib PNG codec, extras/png.py — no PIL in this
    sandbox): bytes -> pixels -> nearest-neighbor resize.  Pixel-exact
    oracle lives in pytest (tests/test_png.py); rows-only here (SQL
    cannot decode PNG)."""
    import pyarrow as pa

    from neo4j_document_pipeline_ray.extras.multimodal import (
        RealImageDecoder,
        resize_images,
        synthesize_media,
    )

    out = resize_images(synthesize_media(n=96, real_png=True),
                        target=(32, 24), decoder=RealImageDecoder())

    def summarize(t: pa.Table) -> pa.Table:
        n_bytes = [len(p) if p is not None else 0
                   for p in t["payload"].to_pylist()]
        return pa.table({
            "media_id": t["media_id"], "kind": t["kind"],
            "width": t["width"], "height": t["height"],
            "n_bytes": pa.array(n_bytes, pa.int64()),
        })

    return out.map_batches(summarize, batch_format="pyarrow")


def _q_mm_frames(sf_dir: str):
    """Video frame sampling: row-expanding actor stage; payload dropped."""
    import pyarrow as pa

    from neo4j_document_pipeline_ray.extras.multimodal import (
        sample_frames,
        synthesize_media,
    )

    out = sample_frames(synthesize_media(n=96), n_frames=4)

    def summarize(t: pa.Table) -> pa.Table:
        n_bytes = [len(p) for p in t["payload"].to_pylist()]
        return pa.table({
            "media_id": t["media_id"], "frame_idx": t["frame_idx"],
            "ts_ms": t["ts_ms"], "n_bytes": pa.array(n_bytes, pa.int64()),
        })

    return out.map_batches(summarize, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    from neo4j_document_pipeline_ray.extras.decontam import docs_decontaminate
    from neo4j_document_pipeline_ray.extras.importance import docs_importance
    from neo4j_document_pipeline_ray.extras.dedup import (
        exact_dedup_sf,
        segment_dedup_sf,
    )
    from neo4j_document_pipeline_ray.extras.sampling import (
        docs_domain_budget,
        docs_split,
        docs_stratified_sample,
        docs_weighted_sample,
    )
    from neo4j_document_pipeline_ray.extras.textstats import (
        distinct_tokens_kmv,
        docs_ppl_bucket,
        grouped_length_quantiles,
        length_quantiles,
        quality_stats,
        token_count,
        token_pack,
        top_tokens,
    )
    from neo4j_document_pipeline_ray.pipelines import relational as rel
    from neo4j_document_pipeline_ray.pipelines import windows as win

    # pre-materialize the synthetic corpus the oracle SQL reads
    _corpus(_SF001)

    return {
        # --- KG construction pipeline (SURVEY.md §2.1-2.5) ---
        "kg_extract_text": _q_kg_extract_text,
        "kg_docs": _q_kg_docs,
        "kg_triples": _q_kg_triples,
        "kg_triple_pr": _q_kg_triple_pr,
        "kg_nodes": _q_kg_nodes,
        "kg_edges": _q_kg_edges,
        "kg_mentions": _q_kg_mentions,
        "kg_chunks": _q_kg_chunks,
        "kg_embeddings": _q_kg_embeddings,
        # --- query layer over the KG (graphutil.py retrieval semantics) ---
        "kg_vector_topk": _q_kg_vector_topk,
        "kg_vector_index_topk": _q_kg_vector_index_topk,
        "kg_keyword_topk": _q_kg_keyword_topk,
        "kg_bm25_topk": _q_kg_bm25_topk,
        "kg_bm25_index_topk": _q_kg_bm25_index_topk,
        "kg_khop": _q_kg_khop,
        "kg_graphrag_seeds": _q_kg_graphrag_seeds,
        "docs_train_shards": _q_docs_train_shards,
        "pages_lang_stats": _q_pages_lang_stats,
        "pages_section_stats": _q_pages_section_stats,
        "pages_url_dedup": _q_pages_url_dedup,
        "pages_links": _q_pages_links,
        "pages_host_graph": _q_pages_host_graph,
        "pages_host_rank": _q_pages_host_rank,
        "pages_host_harmonic": _q_pages_host_harmonic,
        "pages_crawl_frontier": _q_pages_crawl_frontier,
        "pages_inlinks": _q_pages_inlinks,
        "pages_url_templates": _q_pages_url_templates,
        "pages_anchor_terms": _q_pages_anchor_terms,
        "kg_label_counts": _q_kg_label_counts,
        "kg_rel_counts": _q_kg_rel_counts,
        "kg_pagerank": _q_kg_pagerank,
        "kg_degree_topk": _q_kg_degree_topk,
        "kg_triangles": _q_kg_triangles,
        "kg_cooccur_topk": _q_kg_cooccur_topk,
        "kg_related_docs": _q_kg_related_docs,
        "kg_walks": _q_kg_walks,
        "kg_clustering": _q_kg_clustering,
        "kg_skipgrams": _q_kg_skipgrams,
        "kg_hits": _q_kg_hits,
        "kg_link_pred_topk": _q_kg_link_pred_topk,
        "kg_link_pred_ra_topk": _q_kg_link_pred_ra_topk,
        "kg_node_similarity": _q_kg_node_similarity,
        "kg_components": _q_kg_components,
        "kg_neighborhood": _q_kg_neighborhood,
        "kg_eff_diameter": _q_kg_eff_diameter,
        "kg_rel_cardinality": _q_kg_rel_cardinality,
        "kg_conflicts": _q_kg_conflicts,
        "kg_distant_pairs": _q_kg_distant_pairs,
        "kg_verbalized": _q_kg_verbalized,
        "kg_pagerank_asof": _q_kg_pagerank_asof,
        "kg_ego_nets": _q_kg_ego_nets,
        "kg_distant_contexts": _q_kg_distant_contexts,
        "kg_edge_split": _q_kg_edge_split,
        "kg_harmonic": _q_kg_harmonic,
        "kg_betweenness": _q_kg_betweenness,
        "kg_wl_roles": _q_kg_wl_roles,
        "kg_scc": _q_kg_scc,
        "kg_struct_profile": _q_kg_struct_profile,
        "kg_truss": _q_kg_truss,
        "kg_entity_cards": _q_kg_entity_cards,
        "kg_bowtie": _q_kg_bowtie,
        "kg_entity_salience": _q_kg_entity_salience,
        "ann_recall": _q_ann_recall,
        "kg_triads": _q_kg_triads,
        "kg_negative": _q_kg_negative,
        "kg_rules": _q_kg_rules,
        "kg_mention_contexts": _q_kg_mention_contexts,
        "kg_alias_candidates": _q_kg_alias_candidates,
        "kg_entity_timeline": _q_kg_entity_timeline,
        "kg_edge_timeline": _q_kg_edge_timeline,
        "kg_domain_entities": _q_kg_domain_entities,
        "kg_path_between": _q_kg_path_between,
        "kg_degree_hist": _q_kg_degree_hist,
        "kg_diff": _q_kg_diff,
        "kg_msf": _q_kg_msf,
        "kg_kcore": _q_kg_kcore,
        "kg_ppr": _q_kg_ppr,
        "kg_communities": _q_kg_communities,
        "kg_supergraph": _q_kg_supergraph,
        "kg_truss_support": _q_kg_truss_support,
        "kg_sssp": _q_kg_sssp,
        "kg_sssp_weighted": _q_kg_sssp_weighted,
        "kg_schema_report": _q_kg_schema_report,
        "kg_integrity": _q_kg_integrity,
        "kg_export_neo4j": _q_kg_export_neo4j,
        "kg_graphrag": _q_kg_graphrag,
        "kg_graphrag_batch": _q_kg_graphrag_batch,
        # --- generic relational operators (§2.4-2.8) ---
        "rel_lineitem_agg": rel.q_lineitem_agg,
        "rel_segment_topk": rel.q_segment_revenue_topk,
        "rel_brand_supplier": rel.q_brand_supplier_stats,
        "rel_events_hourly": rel.q_events_hourly,
        "rel_orders_top": rel.q_orders_top,
        "rel_union_distinct": rel.q_nation_region_union,
        "rel_lineitem_rollup": rel.q_lineitem_rollup,
        "rel_events_pivot": rel.q_events_pivot,
        "rel_events_coverage": rel.q_events_coverage,
        "rel_orders_no_lineitem": rel.q_orders_no_lineitem,
        "rel_revenue_by_nation": rel.q_revenue_by_nation,
        "rel_orders_running": rel.q_orders_running,
        # --- temporal operators over the event stream (§2.8 class) ---
        "events_sessions": win.q_events_sessions,
        "events_sliding_window": win.q_events_sliding_window,
        "events_band_pairs": win.q_events_band_pairs,
        "events_asof_purchase": win.q_events_asof_purchase,
        "events_anomaly": win.q_events_anomaly,
        "events_range_join": win.q_events_range_join,
        "events_funnel": win.q_events_funnel,
        "events_transitions": win.q_events_transitions,
        "events_retention": win.q_events_retention,
        "events_late_data": win.q_events_late_data,
        # --- training-data curation extras ---
        "docs_token_count": token_count,
        "docs_token_pack": token_pack,
        "docs_quality": quality_stats,
        "docs_top_tokens": top_tokens,
        "docs_length_quantiles": length_quantiles,
        "docs_len_quantiles_by_lang": grouped_length_quantiles,
        "docs_stratified_sample": docs_stratified_sample,
        "docs_split": docs_split,
        "docs_weighted_sample": docs_weighted_sample,
        "docs_domain_budget": docs_domain_budget,
        "docs_decontaminate": docs_decontaminate,
        "docs_distinct_kmv": distinct_tokens_kmv,
        "docs_exact_dedup": exact_dedup_sf,
        "docs_segment_dedup": segment_dedup_sf,
        "docs_importance": docs_importance,
        "docs_lang_id": _q_lang_id,
        "docs_lang_confusion": _q_lang_confusion,
        "docs_bpe_encode": _q_docs_bpe_encode,
        "rel_profile": _q_rel_profile,
        "docs_fingerprint": _q_fingerprints,
        "docs_repetition": _q_docs_repetition,
        "docs_dup_ngrams": _q_docs_dup_ngrams,
        "docs_bpe_pairs": _q_docs_bpe_pairs,
        "docs_bpe_train": _q_docs_bpe_train,
        "docs_prefix_jaccard": _q_docs_prefix_jaccard,
        "docs_dedup_eval": _q_docs_dedup_eval,
        "docs_kmv_by_lang": _q_docs_kmv_by_lang,
        "docs_domain_reputation": _q_docs_domain_reputation,
        "emb_bitext": _q_emb_bitext,
        "docs_salient_terms": _q_docs_salient_terms,
        "docs_curation_filter": _q_docs_curation_filter,
        "docs_scrub": _q_docs_scrub,
        "docs_ppl_bucket": docs_ppl_bucket,
        "docs_unigram_logprob": _q_docs_unigram_logprob,
        "docs_nb_lang": _q_docs_nb_lang,
        "docs_ngram_jaccard": _q_ngram_jaccard,
        "docs_minhash_pairs": _q_minhash_pairs,
        "docs_minhash_components": _q_minhash_components,
        "docs_near_dedup_keep": _q_near_dedup_keep,
        "docs_simhash_pairs": _q_simhash_pairs,
        "docs_hybrid_topk": _q_doc_hybrid_topk,
        "ann_topk": _q_ann_topk,
        "ann_label_topk": _q_ann_label_topk,
        "ann_multi_topk": _q_ann_multi_topk,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "ann_pq_topk": _q_ann_pq_topk,
        "ann_ivf_update_topk": _q_ann_ivf_update_topk,
        "emb_near_dup": _q_emb_near_dup,
        "emb_semdedup": _q_emb_semdedup,
        "mm_features": _q_mm_features,
        "mm_resize": _q_mm_resize,
        "mm_resize_png": _q_mm_resize_png,
        "mm_frames": _q_mm_frames,
    }


def _keyword_topk_sql(nname: str) -> str:
    """Oracle for the deterministic fulltext stand-in: score nodes of
    the truth-derived entity set by query-token / anchor-phrase matches
    on the normalized name, exactly as pipelines.graphrag.keyword_topk.
    Token and phrase sets are computed by the SAME Python helpers the
    Ray path uses and inlined as literals."""
    from neo4j_document_pipeline_ray.functions.textnorm import normalize_name_for_key
    from neo4j_document_pipeline_ray.pipelines.graphrag import _query_terms

    anchors, terms = _query_terms(_QUESTION)
    toks = sorted({t for term in terms for t in normalize_name_for_key(term).split()})
    phrases = sorted({normalize_name_for_key(a) for a in anchors if " " in a})
    tok_score = " + ".join(
        f"CASE WHEN list_contains(string_split(norm_key, ' '), '{t}') THEN 1 ELSE 0 END"
        for t in toks
    ) or "0"
    phrase_score = " + ".join(
        f"CASE WHEN norm_key LIKE '%{p}%' THEN 1 ELSE 0 END" for p in phrases
    ) or "0"
    return f"""
        WITH m AS (
            SELECT subject AS name, subject_type AS label
            FROM read_parquet('{_TRUTH_001}')
            UNION ALL
            SELECT object, object_type FROM read_parquet('{_TRUTH_001}')
        ), k AS (
            SELECT name, label, {nname} AS norm_key FROM m
        ), g AS (
            SELECT norm_key, min(name || chr(31) || label) AS rep
            FROM k GROUP BY norm_key
        ), scored AS (
            SELECT {_eid_sql('norm_key')} AS entity_id,
                   split_part(rep, chr(31), 2) AS label,
                   split_part(rep, chr(31), 1) AS name,
                   CAST(({tok_score}) + ({phrase_score}) AS DOUBLE) AS score
            FROM g
        )
        SELECT entity_id, label, name, score FROM scored
        WHERE score > 0
        ORDER BY score DESC, entity_id
        LIMIT 12
    """


def _bm25_topk_sql(nname: str) -> str:
    """Oracle for the BM25 fulltext channel: Lucene-default BM25
    (k1=1.2, b=0.75) over the truth-derived node-name corpus, with the
    float expression tree mirrored operation-for-operation from
    ``pipelines.graphrag._bm25_score`` (literals written as the same
    compound constants, e.g. ``1.2 + 1.0``, left-associative sums in
    the same sorted term order) so the rounded doubles hash-match."""
    from neo4j_document_pipeline_ray.pipelines.graphrag import _bm25_query

    toks, phrases = _bm25_query(_QUESTION)

    df_cols = []
    for i, t in enumerate(toks):
        df_cols.append(
            "(SELECT count(*) FROM docs WHERE "
            f"list_contains(string_split(norm_key, ' '), '{t}')) AS df_t{i}"
        )
    for i, p in enumerate(phrases):
        df_cols.append(
            "(SELECT count(*) FROM docs WHERE "
            f"instr(' ' || norm_key || ' ', ' {p} ') > 0) AS df_p{i}"
        )

    norm = "1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)"
    terms = []
    for i, t in enumerate(toks):
        tf = f"len(list_filter(string_split(norm_key, ' '), x -> x = '{t}'))"
        idf = f"ln(1.0 + (n - df_t{i} + 0.5) / (df_t{i} + 0.5))"
        terms.append(
            f"CASE WHEN {tf} > 0 THEN {idf} * ({tf} * (1.2 + 1.0)) / "
            f"({tf} + {norm}) ELSE 0.0 END"
        )
    for i, p in enumerate(phrases):
        idf = f"ln(1.0 + (n - df_p{i} + 0.5) / (df_p{i} + 0.5))"
        terms.append(
            f"CASE WHEN instr(' ' || norm_key || ' ', ' {p} ') > 0 THEN "
            f"{idf} * (1.2 + 1.0) / (1.0 + {norm}) ELSE 0.0 END"
        )
    score = " + ".join(terms) or "0.0"

    return f"""
        WITH m AS (
            SELECT subject AS name, subject_type AS label
            FROM read_parquet('{_TRUTH_001}')
            UNION ALL
            SELECT object, object_type FROM read_parquet('{_TRUTH_001}')
        ), k AS (
            SELECT name, label, {nname} AS norm_key FROM m
        ), g AS (
            SELECT norm_key, min(name || chr(31) || label) AS rep
            FROM k GROUP BY norm_key
        ), docs AS (
            SELECT {_eid_sql('norm_key')} AS entity_id,
                   split_part(rep, chr(31), 2) AS label,
                   split_part(rep, chr(31), 1) AS name,
                   norm_key,
                   CASE WHEN norm_key = '' THEN 0
                        ELSE len(string_split(norm_key, ' ')) END AS dl
            FROM g
        ), stats AS (
            SELECT count(*) AS n,
                   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
            FROM docs
        ), dfs AS (
            SELECT {', '.join(df_cols)}
        ), scored AS (
            SELECT entity_id, label, name,
                   round(0.0 + {score}, 6) AS score
            FROM docs, stats, dfs
        )
        SELECT entity_id, label, name, score FROM scored
        WHERE score > 0
        ORDER BY score DESC, entity_id
        LIMIT 12
    """


def _vector_topk_sql(nname: str, k: int = 10) -> str:
    """Oracle for the vector channel (cosine top-k of the question
    vector against the truth-derived node embeddings — the exact
    hash-embedder SQL twin), parameterized by k so the hybrid seed
    oracle can reuse it at channel depth 12."""
    return f"""
        WITH m AS (
            SELECT subject AS name, subject_type AS label
            FROM read_parquet('{_TRUTH_001}')
            UNION ALL
            SELECT object, object_type FROM read_parquet('{_TRUTH_001}')
        ), k AS (
            SELECT name, label, {nname} AS norm_key FROM m
        ), g AS (
            SELECT norm_key, min(name || chr(31) || label) AS rep
            FROM k GROUP BY norm_key
        ), nodes_t AS (
            SELECT {_eid_sql('norm_key')} AS entity_id,
                   split_part(rep, chr(31), 2) AS label,
                   split_part(rep, chr(31), 1) AS name
            FROM g
        ), emb AS (
            SELECT entity_id, label, name,
                   {_hash_emb_sql("(label || ':' || name)")} AS e
            FROM nodes_t
        ), scored AS (
            SELECT entity_id, label, name,
                   round(list_inner_product(e, {_qvec_sql()}) /
                         (CASE WHEN sqrt(list_inner_product(e, e)) = 0
                               THEN 1.0
                               ELSE sqrt(list_inner_product(e, e))
                          END), 6) AS score
            FROM emb
        )
        SELECT entity_id, label, name, score FROM scored
        ORDER BY score DESC, entity_id
        LIMIT {k}
    """


def _graphrag_seeds_sql(nname: str, top_k: int = 5) -> str:
    """Exact SQL twin of the /graphrag DECISION CORE — the part that
    chooses what to retrieve: hybrid blend (per-channel max + min-max
    normalize + renormalized 0.6/0.4 weights, graphutil.py:401-447),
    MMR selection (lambda=0.7 greedy, graphutil.py:452-497; unrolled
    k-1 steps — only the selected SET matters downstream, not pick
    order), document round-robin diversification (graphutil.py:512-542
    — expressible as ORDER BY (within-bucket rank, bucket rank)), and
    one-seed-per-document dedup (main.py:316-333).  The snippet-bearing
    facts formatting stays rows-only (source_text has no truth-side
    replay); every numeric decision feeding it is checked here."""
    lam, mu = 0.7, 0.3
    steps = []
    for h in range(1, top_k):
        steps.append(f"""
        simx{h} AS MATERIALIZED (
            SELECT u1.entity_id AS cand,
                   max(list_inner_product(u1.u, u2.u)) AS m
            FROM uemb u1, sel{h - 1} s
            JOIN uemb u2 ON u2.entity_id = s.entity_id
            GROUP BY u1.entity_id
        ), val{h} AS MATERIALIZED (
            SELECT c.pos, c.entity_id,
                   {lam!r} * c.score - {mu!r} * coalesce(x.m, 0.0)
                       AS val
            FROM cands c
            LEFT JOIN simx{h} x ON x.cand = c.entity_id
            WHERE c.pos NOT IN (SELECT pos FROM sel{h - 1})
        ), pick{h} AS MATERIALIZED (
            SELECT pos, entity_id FROM (
                SELECT pos, entity_id, row_number() OVER (
                    ORDER BY val DESC, pos) AS rn
                FROM val{h}
            ) WHERE rn = 1
        ), sel{h} AS MATERIALIZED (
            SELECT pos, entity_id FROM sel{h - 1}
            UNION ALL SELECT pos, entity_id FROM pick{h}
        )""")
    return f"""
        WITH vch AS MATERIALIZED (
            SELECT * FROM ({_vector_topk_sql(nname, 12)})
        ), kch AS MATERIALIZED (
            SELECT * FROM ({_bm25_topk_sql(nname)})
        ), both_ch AS (
            SELECT coalesce(v.entity_id, b.entity_id) AS entity_id,
                   coalesce(v.label, b.label) AS label,
                   coalesce(v.name, b.name) AS name,
                   coalesce(v.score, 0.0) AS vec,
                   coalesce(b.score, 0.0) AS kw
            FROM vch v FULL OUTER JOIN kch b ON v.entity_id = b.entity_id
        ), mm AS (
            SELECT min(vec) AS vlo, max(vec) AS vhi,
                   min(kw) AS klo, max(kw) AS khi
            FROM both_ch
        ), blended AS (
            SELECT entity_id, label, name,
                   round(0.6 * (CASE WHEN vhi - vlo < 1e-12 THEN 0.5
                                     ELSE (vec - vlo) / (vhi - vlo) END)
                       + 0.4 * (CASE WHEN khi - klo < 1e-12 THEN 0.5
                                     ELSE (kw - klo) / (khi - klo) END),
                         6) AS score
            FROM both_ch, mm
        ), cands AS MATERIALIZED (
            SELECT entity_id, label, name, score,
                   row_number() OVER (ORDER BY score DESC, entity_id)
                       AS pos
            FROM blended
        ), uemb AS MATERIALIZED (
            SELECT c.entity_id,
                   list_transform(e.e, x -> x /
                       (CASE WHEN sqrt(list_inner_product(e.e, e.e)) = 0
                             THEN 1.0
                             ELSE sqrt(list_inner_product(e.e, e.e))
                        END)) AS u
            FROM cands c JOIN (
                SELECT {_eid_sql('norm_key')} AS entity_id,
                       {_hash_emb_sql(
                           "(split_part(rep, chr(31), 2) || ':' || "
                           "split_part(rep, chr(31), 1))")} AS e
                FROM (
                    SELECT norm_key,
                           min(name || chr(31) || label) AS rep
                    FROM (
                        SELECT name, label, {nname} AS norm_key FROM (
                            SELECT subject AS name,
                                   subject_type AS label
                            FROM read_parquet('{_TRUTH_001}')
                            UNION ALL
                            SELECT object, object_type
                            FROM read_parquet('{_TRUTH_001}')
                        )
                    ) GROUP BY norm_key
                )
            ) e ON e.entity_id = c.entity_id
        ), sel0 AS MATERIALIZED (
            SELECT pos, entity_id FROM cands WHERE pos = 1
        ),{",".join(steps)},
        mmr AS (
            SELECT c.entity_id, c.label, c.name, c.score
            FROM cands c JOIN sel{top_k - 1} s ON s.pos = c.pos
        ),
        ment AS MATERIALIZED (
            SELECT DISTINCT doc_id, {_eid_sql(nname)} AS entity_id
            FROM (
                SELECT sha256(p.text) AS doc_id, tr.subject AS name
                FROM read_parquet('{_TRUTH_001}') tr
                JOIN read_parquet('{_PAGES_001}') p USING (url)
                UNION ALL
                SELECT sha256(p.text), tr.object
                FROM read_parquet('{_TRUTH_001}') tr
                JOIN read_parquet('{_PAGES_001}') p USING (url)
            )
        ), first_doc AS MATERIALIZED (
            SELECT entity_id, min(doc_id) AS doc_id
            FROM ment GROUP BY entity_id
        ), titles_t AS MATERIALIZED (
            SELECT sha256(text) AS doc_id,
                   regexp_extract(min(url), '([^/]+)$', 1) AS title
            FROM read_parquet('{_PAGES_001}')
            GROUP BY sha256(text)
        ), with_bucket AS (
            SELECT m.*,
                   coalesce(nullif(t.title, ''), '__NO_DOC__') AS bucket
            FROM mmr m
            LEFT JOIN first_doc f ON f.entity_id = m.entity_id
            LEFT JOIN titles_t t ON t.doc_id = f.doc_id
        ), ranked AS (
            SELECT *, row_number() OVER (
                       PARTITION BY bucket
                       ORDER BY score DESC, entity_id) AS rb,
                   max(score) OVER (PARTITION BY bucket) AS bbest
            FROM with_bucket
        ), border AS (
            SELECT bucket, dense_rank() OVER (
                       ORDER BY bbest DESC, bucket) AS bo
            FROM (SELECT DISTINCT bucket, bbest FROM ranked)
        ), diversified AS (
            SELECT r.entity_id, r.label, r.name, r.score,
                   CAST(row_number() OVER (ORDER BY r.rb, b.bo) - 1
                        AS BIGINT) AS rank
            FROM ranked r JOIN border b ON b.bucket = r.bucket
        ), seeded AS (
            SELECT d.*,
                   CASE WHEN row_number() OVER (
                            PARTITION BY coalesce(
                                nullif(f.doc_id, ''),
                                CAST(d.entity_id AS VARCHAR))
                            ORDER BY d.rank) = 1
                        THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
                   END AS is_seed
            FROM diversified d
            LEFT JOIN first_doc f ON f.entity_id = d.entity_id
        )
        SELECT rank, entity_id, label, name, score, is_seed
        FROM seeded
    """


def _khop_sql(nsub: str, nobj: str) -> str:
    """Oracle for the 1-hop undirected neighborhood of the fixed seeds
    over the truth-derived edge set (NODE_GLOBAL uniqueness = plain
    DISTINCT closure; 1 hop keeps the result a strict subgraph of the
    dense sf0.01 graph so the check is discriminative)."""
    seeds = _khop_seeds()
    values = ", ".join(f"({i})" for i in seeds)
    return f"""
        WITH e AS (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), und AS (
            SELECT s AS a, d AS b FROM e UNION SELECT d, s FROM e
        ), seeds(id) AS (
            SELECT * FROM (VALUES {values})
        ), h1 AS (
            SELECT id FROM seeds
            UNION
            SELECT und.b FROM und JOIN seeds ON und.a = seeds.id
        )
        SELECT id AS entity_id FROM h1
    """


def _ego_sql(nsub: str, nobj: str, seeds: "list[int]",
             hops: int = 2, fanout: "int | None" = None) -> str:
    """Unrolled replay of graph_algo.ego_net_sample: per hop a
    frontier-edge join capped at ``fanout`` lowest peers per
    (seed, node) via row_number, a seen anti-join, and the union of
    per-hop capped edge sets."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        EGO_FANOUT,
    )

    f = EGO_FANOUT if fanout is None else fanout
    pairs = ", ".join(f"({s}, {s})" for s in sorted(set(seeds)))
    ctes = [f"""
        e0 AS (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), ee AS (
            SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
            FROM e0 WHERE s <> d
        ), bo AS (
            SELECT a AS node, b AS peer FROM ee
            UNION ALL SELECT b, a FROM ee
        ), f0(seed_id, node) AS (
            SELECT * FROM (VALUES {pairs})
        ), seen0 AS (
            SELECT seed_id, node FROM f0
        )"""]
    for h in range(1, hops + 1):
        ctes.append(f"""
        cap{h} AS (
            SELECT seed_id, node, peer FROM (
                SELECT fr.seed_id, bo.node, bo.peer,
                       row_number() OVER (PARTITION BY fr.seed_id,
                                          bo.node ORDER BY bo.peer) AS rn
                FROM f{h - 1} fr JOIN bo ON bo.node = fr.node
            ) WHERE rn <= {f}
        ), f{h} AS (
            SELECT DISTINCT c.seed_id, c.peer AS node
            FROM cap{h} c LEFT JOIN seen{h - 1} s
              ON s.seed_id = c.seed_id AND s.node = c.peer
            WHERE s.node IS NULL
        ), seen{h} AS (
            SELECT seed_id, node FROM seen{h - 1}
            UNION SELECT seed_id, node FROM f{h}
        )""")
    union = " UNION ALL ".join(
        f"""SELECT seed_id, CAST({h} AS BIGINT) AS hop,
                   node AS src_id, peer AS dst_id FROM cap{h}"""
        for h in range(1, hops + 1))
    return "WITH " + ",".join(ctes) + " " + union


def _pagerank_unroll(edges_cte: str, iters: int, tail: str) -> str:
    """Shared unrolled integer-PageRank CTE chain — exact because both
    sides use only BIGINT floor arithmetic.  ``edges_cte`` must define
    (possibly after preceding CTEs) a CTE ``e(s, d)`` of DISTINCT
    directed edges; ``tail`` is the final SELECT over ``i{iters}``."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import PR_SCALE

    num, den = 85, 100
    base = (PR_SCALE * (den - num)) // den
    ctes = [edges_cte + f""", nodes AS (
            SELECT s AS id FROM e UNION SELECT d FROM e
        ), deg AS (
            SELECT s, count(*) AS outdeg FROM e GROUP BY s
        ), i0 AS (
            SELECT id, CAST({PR_SCALE} AS BIGINT) AS r FROM nodes
        )"""]
    for k in range(1, iters + 1):
        ctes.append(f"""
        i{k} AS (
            SELECT n.id,
                   CAST({base} + ({num} * coalesce(si.s_in, 0)) // {den}
                        AS BIGINT) AS r
            FROM nodes n LEFT JOIN (
                SELECT e.d AS id, sum(p.r // dg.outdeg) AS s_in
                FROM e JOIN i{k-1} p ON e.s = p.id
                       JOIN deg dg ON dg.s = e.s
                GROUP BY e.d
            ) si ON n.id = si.id
        )""")
    return "WITH " + ",".join(ctes) + " " + tail


def _pagerank_sql(nsub: str, nobj: str, iters: int = 3) -> str:
    """Unrolled integer-PageRank mirror of pipelines/graph_algo.py
    over the truth-table entity graph."""
    edges = f"""
        e AS (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        )"""
    return _pagerank_unroll(
        edges, iters,
        f"SELECT id AS entity_id, r AS rank_scaled FROM i{iters}")


def _host_rank_sql(pages_glob: str, iters: int = 3) -> str:
    """Unrolled integer-PageRank replay over the host graph — same
    link extraction + host normalization as extras/urls.host_graph,
    same stable_id host ids as extras/urls.host_rank."""
    from neo4j_document_pipeline_ray.extras.urls import host_sql, links_sql

    hs, hd = host_sql("src_url"), host_sql("dst_url")
    edges = f"""
        links AS ({links_sql(pages_glob)}),
        hg AS (
            SELECT DISTINCT {hs} AS a, {hd} AS b
            FROM links
            WHERE {hs} <> '' AND {hd} <> ''
        ),
        e AS (
            SELECT {_eid_sql('a')} AS s, {_eid_sql('b')} AS d FROM hg
        )"""
    tail = f"""
        SELECT m.host, r.r AS rank_scaled
        FROM i{iters} r JOIN (
            SELECT host, {_eid_sql('host')} AS id FROM (
                SELECT a AS host FROM hg UNION SELECT b FROM hg)
        ) m ON m.id = r.id"""
    return _pagerank_unroll(edges, iters, tail)


def _kmv_sketch_ctes(nsub: str, nobj: str, hops: int,
                     e0_cte: "str | None" = None) -> list:
    """Shared CTE prefix for the KMV-sketch oracles (neighborhood
    function + harmonic centrality): distinct undirected truth edges,
    the splitmix-style 61-bit hash (HUGEINT emulation of mod-2^64
    arithmetic — multipliers are < 2^62 so products fit INT128), and
    ``hops`` unrolled k-smallest-distinct merge rounds s0..s{hops}.
    ``e0_cte`` overrides the edge source: a string of CTEs ending with
    ``e0(s, d)`` (used by the host-graph harmonic replay)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        NF_K, NF_SPACE, _NF_A, _NF_B, _NF_C1,
    )

    k = NF_K
    m64 = 1 << 64
    head = e0_cte if e0_cte is not None else f"""
        e0 AS (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        )"""
    ctes = [head + f""", ee AS (
            SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
            FROM e0 WHERE s <> d
        ), n AS (
            SELECT a AS node FROM ee UNION SELECT b FROM ee
        ), bo AS (
            SELECT a AS node, b AS peer FROM ee
            UNION ALL SELECT b, a FROM ee
            UNION ALL SELECT node, node FROM n
        ), s0 AS (
            SELECT node, CAST(CAST(xor(z5, z5 >> 31) AS HUGEINT)
                              % {NF_SPACE} AS BIGINT) AS h
            FROM (
              SELECT node, CAST((CAST(xor(z3, z3 >> 27) AS HUGEINT)
                                 * {_NF_B}) % {m64} AS UBIGINT) AS z5
              FROM (
                SELECT node, CAST((CAST(xor(z1, z1 >> 30) AS HUGEINT)
                                   * {_NF_A}) % {m64} AS UBIGINT) AS z3
                FROM (
                  SELECT node, CAST((CAST(node AS HUGEINT) + {_NF_C1})
                                    % {m64} AS UBIGINT) AS z1
                  FROM n))))"""]
    for r in range(1, hops + 1):
        ctes.append(f"""
        s{r} AS (
            SELECT node, h FROM (
                SELECT node, h,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY h) AS rn
                FROM (SELECT DISTINCT bo.node AS node, s.h
                      FROM bo JOIN s{r-1} s ON s.node = bo.peer)
            ) WHERE rn <= {k}
        )""")
    return ctes


def _neighborhood_sql(nsub: str, nobj: str, hops: int = 3) -> str:
    """Unrolled KMV-sketch replay of graph_algo.neighborhood_function
    over the shared sketch CTEs; same integer estimator."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        NF_K, NF_SPACE,
    )

    k = NF_K
    ctes = _kmv_sketch_ctes(nsub, nobj, hops)
    nf = [f"""
        nf{r} AS (
            SELECT CAST({r} AS BIGINT) AS hop,
                   CAST(COALESCE(sum(est), 0) AS BIGINT) AS nf_est
            FROM (
                SELECT node,
                       CASE WHEN count(*) < {k} THEN count(*)
                            ELSE (CAST({k - 1} AS HUGEINT) * {NF_SPACE})
                                 // max(h) END AS est
                FROM s{r} GROUP BY node)
        )""" for r in range(0, hops + 1)]
    union = " UNION ALL ".join(
        f"SELECT hop, nf_est FROM nf{r}" for r in range(0, hops + 1))
    return ("WITH " + ",".join(ctes + nf) + " " + union)


def _wl_nf61_sql(col: str) -> str:
    """Inline DuckDB expression for the splitmix 61-bit hash chain
    (same constants as graph_algo._nf_hash, HUGEINT mod-2^64
    emulation).  ``col`` must be a plain column reference — the chain
    repeats it, so a compound expression would re-evaluate."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        _NF_A, _NF_B, _NF_C1, WL_M61,
    )

    m64 = 1 << 64
    z1 = f"CAST((CAST({col} AS HUGEINT) + {_NF_C1}) % {m64} AS UBIGINT)"
    z3 = (f"CAST((CAST(xor({z1}, {z1} >> 30) AS HUGEINT) * {_NF_A})"
          f" % {m64} AS UBIGINT)")
    z5 = (f"CAST((CAST(xor({z3}, {z3} >> 27) AS HUGEINT) * {_NF_B})"
          f" % {m64} AS UBIGINT)")
    return (f"CAST(CAST(xor({z5}, {z5} >> 31) AS HUGEINT)"
            f" % {WL_M61} AS BIGINT)")


def _wl_fnv61_sql(col: str) -> str:
    """Inline DuckDB FNV-1a-64 fold masked to 61 bits — the twin of
    graph_algo._wl_fnv61 (shared constants with extras/profile.py;
    ``ascii`` == byte value because rel labels are safe_label ASCII)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import WL_M61

    m64 = 1 << 64
    return (
        "list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), "
        f"list_transform(range(1, length({col}) + 1), "
        f"i -> CAST(ascii(substr({col}, i, 1)) AS HUGEINT))), "
        "(acc, b) -> (CAST(xor(CAST(acc AS UBIGINT), CAST(b AS UBIGINT)) "
        f"AS HUGEINT) * 1099511628211) % {m64}) % {WL_M61}")


def _wl_sql(nsub: str, nobj: str, rounds: int = 2) -> str:
    """Unrolled replay of graph_algo.wl_roles over the truth-table
    typed edge set: per round the two directed message populations,
    the splitmix-hashed messages, the commutative multiset signature
    (count, sum mod P1, hashed sum mod P2, min), and the label fold."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        WL_M61, WL_P1, WL_P2,
    )

    ctes = [f"""
        e AS MATERIALIZED (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, rel_type,
                   {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), er AS MATERIALIZED (
            SELECT s, d, CAST({_wl_fnv61_sql('rel_type')} AS BIGINT) AS hr
            FROM e
        ), n0 AS (
            SELECT DISTINCT node FROM (
                SELECT s AS node FROM er UNION ALL SELECT d FROM er)
        ), l0 AS MATERIALIZED (
            SELECT node, CAST(0 AS BIGINT) AS lbl FROM n0
        )"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""
        pre{r} AS (
            SELECT er.s AS node,
                   CAST((1 + 3 * CAST(er.hr AS HUGEINT)
                           + 5 * CAST(l.lbl AS HUGEINT))
                        % {WL_M61} AS BIGINT) AS p
            FROM er JOIN l{r - 1} l ON l.node = er.d
            UNION ALL
            SELECT er.d,
                   CAST((2 + 3 * CAST(er.hr AS HUGEINT)
                           + 5 * CAST(l.lbl AS HUGEINT))
                        % {WL_M61} AS BIGINT)
            FROM er JOIN l{r - 1} l ON l.node = er.s
        ), msg{r} AS (
            SELECT node, {_wl_nf61_sql('p')} AS m FROM pre{r}
        ), agg{r} AS (
            SELECT node, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(m % {WL_P1}) % {WL_P1} AS BIGINT) AS s1,
                   CAST(sum({_wl_nf61_sql('m')} % {WL_P2}) % {WL_P2}
                        AS BIGINT) AS s2,
                   min(m) AS mn
            FROM msg{r} GROUP BY node
        ), cmb{r} AS (
            SELECT a.node,
                   CAST(((7 * CAST(l.lbl AS HUGEINT)) % {WL_M61}
                       + (3 * CAST(a.s1 AS HUGEINT)) % {WL_M61}
                       + (5 * CAST(a.s2 AS HUGEINT)) % {WL_M61}
                       + (11 * CAST(a.mn AS HUGEINT)) % {WL_M61}
                       + a.n) % {WL_M61} AS BIGINT) AS p
            FROM agg{r} a JOIN l{r - 1} l ON l.node = a.node
        ), l{r} AS MATERIALIZED (
            SELECT node, {_wl_nf61_sql('p')} AS lbl FROM cmb{r}
        )""")
    return ("WITH " + ",".join(ctes) + f"""
        SELECT lbl AS wl_label, CAST(count(*) AS BIGINT) AS n_nodes
        FROM l{rounds} GROUP BY lbl
        ORDER BY n_nodes DESC, wl_label""")


def _scc_sql(nsub: str, nobj: str) -> str:
    """Ground-truth SCC over the truth-table directed edge set via
    mutual reachability: a and b share a component iff reach(a,b) AND
    reach(b,a); scc_id = min of the mutual set (always includes the
    node itself).  The closure is independent of graph_algo's
    label-refinement rounds — it checks the OUTPUT contract, not the
    algorithm."""
    return f"""
        WITH RECURSIVE e0 AS (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), n AS (
            SELECT DISTINCT node FROM (
                SELECT s AS node FROM e0 UNION ALL SELECT d FROM e0)
        ), e AS (
            SELECT s, d FROM e0 WHERE s <> d
        ), reach(a, b) AS (
            SELECT node, node FROM n
            UNION
            SELECT reach.a, e.d FROM reach JOIN e ON e.s = reach.b
        )
        SELECT r1.a AS entity_id, min(r1.b) AS scc_id
        FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
        GROUP BY r1.a"""


def _triads_sql(nsub: str, nobj: str) -> str:
    """Mirror of graph_algo.triad_census: dyad-state table, the
    standard ordered 3-join triangle enumeration (n1<n2<n3), and a
    27-entry CASE GENERATED from the same TRIAD_LABELS dict the Ray
    kernel indexes — label parity is by construction."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        TRIAD_LABELS,
    )

    case = " ".join(
        f"WHEN {c} THEN '{TRIAD_LABELS[c]}'" for c in range(27))
    return f"""
        WITH e0 AS (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), dd AS (
            SELECT s, d FROM e0 WHERE s <> d
        ), est AS (
            SELECT least(s, d) AS lo, greatest(s, d) AS hi,
                   CAST(max(CASE WHEN s < d THEN 1 ELSE 0 END)
                        + 2 * max(CASE WHEN s > d THEN 1 ELSE 0 END)
                        AS BIGINT) AS st
            FROM dd GROUP BY lo, hi
        ), tri AS (
            SELECT e1.st AS s12, e2.st AS s13, e3.st AS s23
            FROM est e1
            JOIN est e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
            JOIN est e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
        )
        SELECT CASE (s12 - 1) * 9 + (s13 - 1) * 3 + (s23 - 1)
               {case} END AS triad,
               CAST(count(*) AS BIGINT) AS n
        FROM tri GROUP BY triad
        ORDER BY n DESC, triad"""


def _entity_salience_sql(nsub: str, nobj: str) -> str:
    """Mirror of _q_kg_entity_salience: one representative url per
    doc (min url — duplicate pages yield identical truth triples),
    distinct per-doc triples, endpoint unpivot, the integer TF-IDF
    surrogate, and a row_number head per doc."""
    k, s = _SALIENCE_K, _SALIENCE_SCALE
    return f"""
        WITH p AS (
            SELECT url, sha256(text) AS doc_id
            FROM read_parquet('{_PAGES_001}')
        ), rep AS (
            SELECT doc_id, min(url) AS url FROM p GROUP BY doc_id
        ), t AS (
            SELECT DISTINCT rep.doc_id, tr.subject, tr.predicate,
                   tr.rel_type, tr.object, tr.subject_type,
                   tr.object_type, tr.object_kind, tr."start",
                   tr."end", tr.term, tr."count",
                   {_eid_sql(nsub)} AS src_id,
                   {_eid_sql(nobj)} AS dst_id
            FROM read_parquet('{_TRUTH_001}') tr
            JOIN rep ON tr.url = rep.url
        ), m AS (
            SELECT doc_id, src_id AS entity_id FROM t
            UNION ALL SELECT doc_id, dst_id FROM t
        ), tf AS (
            SELECT doc_id, entity_id, CAST(count(*) AS BIGINT) AS tf
            FROM m GROUP BY doc_id, entity_id
        ), dl AS (
            SELECT doc_id, sum(tf) AS dlen FROM tf GROUP BY doc_id
        ), dfx AS (
            SELECT entity_id, CAST(count(*) AS BIGINT) AS df
            FROM tf GROUP BY entity_id
        ), nd AS (
            SELECT count(*) AS n FROM dl
        ), sc AS (
            SELECT tf.doc_id, tf.entity_id,
                   CAST((CAST(tf.tf AS HUGEINT) * nd.n * {s})
                        // (dl.dlen * dfx.df) AS BIGINT)
                       AS salience_scaled
            FROM tf
            JOIN dl ON dl.doc_id = tf.doc_id
            JOIN dfx ON dfx.entity_id = tf.entity_id
            CROSS JOIN nd
        ), r AS (
            SELECT doc_id, entity_id, salience_scaled,
                   CAST(row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY salience_scaled DESC, entity_id)
                       AS BIGINT) AS rank
            FROM sc
        )
        SELECT doc_id, entity_id, rank, salience_scaled
        FROM r WHERE rank <= {k}"""


def _entity_cards_sql(nsub: str) -> str:
    """Mirror of _q_kg_entity_cards: distinct per-subject facts,
    row_number cap inside an ordered string_agg (NULLs from the CASE
    are skipped, which IS the cap), min(subject) as the canonical
    name."""
    return f"""
        WITH d AS (
            SELECT DISTINCT {_eid_sql(nsub)} AS entity_id,
                   subject, predicate, object
            FROM read_parquet('{_TRUTH_001}')
        ), rep AS (
            SELECT entity_id, min(subject) AS name
            FROM d GROUP BY entity_id
        ), f AS (
            SELECT DISTINCT entity_id, predicate, object FROM d
        ), o AS (
            SELECT entity_id, predicate, object,
                   row_number() OVER (
                       PARTITION BY entity_id
                       ORDER BY predicate, object) AS rn
            FROM f
        ), agg AS (
            SELECT entity_id, CAST(count(*) AS BIGINT) AS n_facts,
                   string_agg(
                       CASE WHEN rn <= {_CARD_FACTS}
                            THEN predicate || ' ' || object END,
                       '; ' ORDER BY rn) AS facts
            FROM o GROUP BY entity_id
        )
        SELECT a.entity_id, r.name, a.n_facts,
               r.name || ': ' || a.facts || '.' AS card
        FROM agg a JOIN rep r ON r.entity_id = a.entity_id"""


def _ktruss_sql(nsub: str, nobj: str) -> str:
    """Recursive peeling replay of graph_algo.ktruss: each iteration
    recomputes within-set triangle support from the previous round's
    working table (three recursive references — the same DuckDB
    multi-reference the kg_kcore oracle relies on; adjacency is
    derived in-iteration via UNION ALL so every join stays an
    equi-join), emitting rows only while the set strictly shrinks;
    the final support is recomputed over the fixpoint set."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        TRUSS_K,
    )

    k = TRUSS_K
    return f"""
        WITH RECURSIVE e0 AS (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), ee AS (
            SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
            FROM e0 WHERE s <> d
        ), keep(round, a, b, cnt) AS (
            SELECT 0, a, b, CAST(count(*) OVER () AS BIGINT) FROM ee
            UNION ALL
            SELECT round, a, b, csize FROM (
                SELECT round, a, b, prev_cnt,
                       CAST(count(*) OVER () AS BIGINT) AS csize
                FROM (
                    SELECT min(t.round) + 1 AS round, t.a, t.b,
                           min(t.cnt) AS prev_cnt
                    FROM keep t
                    JOIN (SELECT a AS node, b AS peer FROM keep
                          UNION ALL SELECT b, a FROM keep) n1
                      ON n1.node = t.a
                    JOIN (SELECT a AS node, b AS peer FROM keep
                          UNION ALL SELECT b, a FROM keep) n2
                      ON n2.node = t.b AND n2.peer = n1.peer
                    GROUP BY t.a, t.b
                    HAVING count(*) >= {k} - 2
                ) s
            ) s2 WHERE csize < prev_cnt
        ), fin AS (
            SELECT a, b FROM keep
            WHERE round = (SELECT max(round) FROM keep)
        )
        SELECT t.a AS entity_a, t.b AS entity_b,
               CAST(count(*) AS BIGINT) AS support
        FROM fin t
        JOIN (SELECT a AS node, b AS peer FROM fin
              UNION ALL SELECT b, a FROM fin) n1
          ON n1.node = t.a
        JOIN (SELECT a AS node, b AS peer FROM fin
              UNION ALL SELECT b, a FROM fin) n2
          ON n2.node = t.b AND n2.peer = n1.peer
        GROUP BY t.a, t.b
        HAVING count(*) >= {k} - 2"""


def _struct_profile_sql(nsub: str, nobj: str) -> str:
    """Mirror of graph_algo.structural_profile: reciprocity from the
    canonical-pair count (2 == reciprocal on a distinct input) and
    assortativity as the sqrt-free symmetric Pearson ratio in HUGEINT,
    sign-magnitude truncated division matching the Python side."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        ASSORT_SCALE,
    )

    s = ASSORT_SCALE
    return f"""
        WITH e0 AS (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), nn AS (
            SELECT count(*) AS n_nodes FROM (
                SELECT DISTINCT node FROM (
                    SELECT s AS node FROM e0 UNION ALL SELECT d FROM e0))
        ), dd AS (
            SELECT s, d FROM e0 WHERE s <> d
        ), und AS (
            SELECT least(s, d) AS lo, greatest(s, d) AS hi,
                   count(*) AS c
            FROM dd GROUP BY lo, hi
        ), bo AS (
            SELECT lo AS node, hi AS peer FROM und
            UNION ALL SELECT hi, lo FROM und
        ), deg AS (
            SELECT node, CAST(count(*) AS BIGINT) AS deg
            FROM bo GROUP BY node
        ), mom AS (
            SELECT CAST(count(*) AS HUGEINT) AS m,
                   coalesce(sum(CAST(dx.deg AS HUGEINT)), 0) AS sx,
                   coalesce(sum(CAST(dx.deg AS HUGEINT) * dx.deg), 0)
                       AS sxx,
                   coalesce(sum(CAST(dx.deg AS HUGEINT) * dy.deg), 0)
                       AS sxy
            FROM bo JOIN deg dx ON dx.node = bo.node
                    JOIN deg dy ON dy.node = bo.peer
        ), cnts AS (
            SELECT (SELECT count(*) FROM dd) AS n_directed,
                   (SELECT count(*) FROM und) AS n_undirected,
                   (SELECT coalesce(
                        sum(CASE WHEN c = 2 THEN 2 ELSE 0 END), 0)
                    FROM und) AS n_reciprocal
        )
        SELECT CAST(nn.n_nodes AS BIGINT) AS n_nodes,
               CAST(c.n_directed AS BIGINT) AS n_directed,
               CAST(c.n_undirected AS BIGINT) AS n_undirected,
               CAST(c.n_reciprocal AS BIGINT) AS n_reciprocal,
               CAST(CASE WHEN c.n_directed = 0 THEN 0
                    ELSE (CAST(c.n_reciprocal AS HUGEINT) * {s})
                         // c.n_directed END AS BIGINT)
                   AS reciprocity_scaled,
               CAST(CASE WHEN (mom.m * mom.sxx - mom.sx * mom.sx) = 0
                         THEN 0
                    ELSE (CASE WHEN (mom.m * mom.sxy
                                     - mom.sx * mom.sx) >= 0
                               THEN 1 ELSE -1 END)
                         * ((abs(mom.m * mom.sxy - mom.sx * mom.sx)
                             * {s})
                            // (mom.m * mom.sxx - mom.sx * mom.sx))
                    END AS BIGINT) AS assortativity_scaled
        FROM nn, cnts c, mom"""


def _bowtie_sql(nsub: str, nobj: str) -> str:
    """Bowtie mirror: the same mutual-reachability closure as
    _scc_sql, then the giant component (max size, ties min id) and
    the forward/backward reach sets read DIRECTLY off the closure
    (reach(a, b) already holds every directed reachability pair)."""
    return f"""
        WITH RECURSIVE e0 AS (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), n AS (
            SELECT DISTINCT node FROM (
                SELECT s AS node FROM e0 UNION ALL SELECT d FROM e0)
        ), e AS (
            SELECT s, d FROM e0 WHERE s <> d
        ), reach(a, b) AS (
            SELECT node, node FROM n
            UNION
            SELECT reach.a, e.d FROM reach JOIN e ON e.s = reach.b
        ), scc AS (
            SELECT r1.a AS entity_id, min(r1.b) AS scc_id
            FROM reach r1 JOIN reach r2
              ON r2.a = r1.b AND r2.b = r1.a
            GROUP BY r1.a
        ), giant AS (
            SELECT scc_id FROM scc GROUP BY scc_id
            ORDER BY count(*) DESC, scc_id LIMIT 1
        ), core AS (
            SELECT entity_id FROM scc
            WHERE scc_id = (SELECT scc_id FROM giant)
        ), fset AS (
            SELECT DISTINCT r.b AS entity_id
            FROM reach r JOIN core c ON r.a = c.entity_id
        ), bset AS (
            SELECT DISTINCT r.a AS entity_id
            FROM reach r JOIN core c ON r.b = c.entity_id
        )
        SELECT s.entity_id,
               CASE WHEN s.scc_id = (SELECT scc_id FROM giant)
                    THEN 'SCC'
                    WHEN f.entity_id IS NOT NULL THEN 'OUT'
                    WHEN b.entity_id IS NOT NULL THEN 'IN'
                    ELSE 'OTHER' END AS bowtie
        FROM scc s
        LEFT JOIN fset f ON f.entity_id = s.entity_id
        LEFT JOIN bset b ON b.entity_id = s.entity_id"""


def _betweenness_sql(nsub: str, nobj: str) -> str:
    """Unrolled replay of graph_algo.betweenness_approx: multi-source
    level-synchronous BFS keyed on (pvt, node) — the pivot loop
    becomes a key column, not query duplication — then the backward
    dependency levels with the same per-successor integer floor."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        BC_LEVELS, BC_PIVOTS, BC_SCALE,
    )

    L, P, S = BC_LEVELS, BC_PIVOTS, BC_SCALE
    ctes = [f"""
        e0 AS MATERIALIZED (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), ee AS MATERIALIZED (
            SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
            FROM e0 WHERE s <> d
        ), bo AS MATERIALIZED (
            SELECT a AS node, b AS peer FROM ee
            UNION ALL SELECT b, a FROM ee
        ), pv AS MATERIALIZED (
            SELECT node FROM (
                SELECT node, count(*) AS deg FROM bo GROUP BY node)
            ORDER BY deg DESC, node LIMIT {P}
        ), f0 AS MATERIALIZED (
            SELECT node AS pvt, node, CAST(1 AS BIGINT) AS sigma
            FROM pv
        ), d0 AS MATERIALIZED (
            SELECT pvt, node, sigma FROM f0
        )"""]
    for l in range(1, L + 1):
        ctes.append(f"""
        f{l} AS MATERIALIZED (
            SELECT f.pvt, bo.peer AS node,
                   CAST(sum(f.sigma) AS BIGINT) AS sigma
            FROM f{l - 1} f JOIN bo ON bo.node = f.node
            LEFT JOIN d{l - 1} seen
              ON seen.pvt = f.pvt AND seen.node = bo.peer
            WHERE seen.node IS NULL
            GROUP BY 1, 2
        ), d{l} AS MATERIALIZED (
            SELECT pvt, node, sigma FROM d{l - 1}
            UNION ALL SELECT pvt, node, sigma FROM f{l}
        )""")
    ctes.append(f"""
        b{L} AS (
            SELECT pvt, node, CAST(0 AS BIGINT) AS dep
            FROM f{L} WHERE FALSE
        )""")
    for l in range(L - 1, -1, -1):
        ctes.append(f"""
        b{l} AS MATERIALIZED (
            SELECT v.pvt, v.node,
                   CAST(sum((v.sigma * ({S} + COALESCE(bb.dep, 0)))
                            // w.sigma) AS BIGINT) AS dep
            FROM f{l} v
            JOIN bo ON bo.node = v.node
            JOIN f{l + 1} w
              ON w.pvt = v.pvt AND w.node = bo.peer
            LEFT JOIN b{l + 1} bb
              ON bb.pvt = v.pvt AND bb.node = w.node
            GROUP BY 1, 2
        )""")
    union = " UNION ALL ".join(
        f"SELECT pvt, node, dep FROM b{l}" for l in range(0, L))
    return ("WITH " + ",".join(ctes) + f"""
        SELECT node AS entity_id,
               CAST(sum(dep) AS BIGINT) AS betweenness_scaled
        FROM ({union}) WHERE node <> pvt
        GROUP BY node HAVING sum(dep) <> 0""")


def _negative_sql(nsub: str, nobj: str) -> str:
    """Unrolled replay of graph_algo.negative_samples: same splitmix
    hash chain (subquery-nested HUGEINT emulation) for node buckets
    and trial candidates, same min-id bucket reps, same anti-join."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        NEG_BUCKETS, NEG_TRIALS, NF_SPACE, _NEG_STEP, _NF_A, _NF_B,
        _NF_C1,
    )

    m64 = 1 << 64

    def chain(carry: str, expr: str) -> str:
        return f"""
            SELECT {carry},
                   CAST(CAST(xor(z5, z5 >> 31) AS HUGEINT)
                        % {NF_SPACE} AS BIGINT) % {NEG_BUCKETS} AS b
            FROM (
              SELECT {carry}, CAST((CAST(xor(z3, z3 >> 27) AS HUGEINT)
                                    * {_NF_B}) % {m64} AS UBIGINT) AS z5
              FROM (
                SELECT {carry}, CAST((CAST(xor(z1, z1 >> 30) AS HUGEINT)
                                      * {_NF_A}) % {m64} AS UBIGINT) AS z3
                FROM (
                  SELECT {carry}, CAST((CAST({expr} AS HUGEINT)
                                        + {_NF_C1}) % {m64}
                                       AS UBIGINT) AS z1
                  FROM __SRC__)))"""

    hb = chain("node", "node").replace("__SRC__", "n")
    cand = chain("node, trial", f"node + trial * {_NEG_STEP}").replace(
        "__SRC__",
        f"(SELECT node, unnest(range({NEG_TRIALS})) AS trial FROM n)")
    return f"""
        WITH e0 AS MATERIALIZED (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), ee AS MATERIALIZED (
            SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
            FROM e0 WHERE s <> d
        ), n AS MATERIALIZED (
            SELECT DISTINCT a AS node FROM ee
            UNION SELECT DISTINCT b FROM ee
        ), hb AS MATERIALIZED ({hb}
        ), reps AS MATERIALIZED (
            SELECT b, min(node) AS rep FROM hb GROUP BY b
        ), cand AS MATERIALIZED ({cand}
        )
        SELECT c.node AS entity_id, c.trial, r.rep AS neg_id
        FROM cand c JOIN reps r USING (b)
        WHERE r.rep <> c.node
          AND NOT EXISTS (
            SELECT 1 FROM ee
            WHERE ee.a = least(c.node, r.rep)
              AND ee.b = greatest(c.node, r.rep))
    """


def _rules_sql(nsub: str, nobj: str) -> str:
    """Replay of graph_algo.rule_mining — the oracle graph is small,
    so direct wedge joins replace the per-mid count-vector trick."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        RULE_SCALE, RULE_TOPK,
    )

    return f"""
        WITH t AS MATERIALIZED (
            SELECT DISTINCT {_eid_sql(nsub)} AS a, rel_type AS r,
                            {_eid_sql(nobj)} AS c
            FROM read_parquet('{_TRUTH_001}')
        ), e AS MATERIALIZED (
            SELECT * FROM t WHERE a <> c
        ), paths AS MATERIALIZED (
            SELECT e1.r AS r1, e2.r AS r2, count(*) AS n_paths
            FROM e e1 JOIN e e2 ON e2.a = e1.c AND e2.c <> e1.a
            GROUP BY 1, 2
        ), topk AS MATERIALIZED (
            SELECT r1, r2, n_paths FROM paths
            ORDER BY n_paths DESC, r1, r2 LIMIT {RULE_TOPK}
        ), closed AS MATERIALIZED (
            SELECT e1.r AS r1, e2.r AS r2, e3.r AS r3,
                   count(*) AS n_closed
            FROM e e1
            JOIN e e2 ON e2.a = e1.c AND e2.c <> e1.a
            JOIN topk tp ON tp.r1 = e1.r AND tp.r2 = e2.r
            JOIN e e3 ON e3.a = e1.a AND e3.c = e2.c
            GROUP BY 1, 2, 3
        )
        SELECT c.r1, c.r2, c.r3,
               CAST(tp.n_paths AS BIGINT) AS n_paths,
               CAST(c.n_closed AS BIGINT) AS n_closed,
               CAST(c.n_closed * {RULE_SCALE}
                    // greatest(tp.n_paths, 1) AS BIGINT) AS conf_scaled
        FROM closed c JOIN topk tp USING (r1, r2)
    """


def _path_sql(nsub: str, nobj: str, source: int, target: int,
              rounds: int = 8) -> str:
    """Unrolled replay of graph_algo.shortest_path_between: min-parent
    BFS levels, then a parent-chain walk from the target.  Levels past
    the target's distance exist in the unroll but the chain never
    touches them, so the result equals the early-exiting operator."""
    ctes = [f"""
        e0 AS MATERIALIZED (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), ee AS MATERIALIZED (
            SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
            FROM e0 WHERE s <> d
        ), bo AS MATERIALIZED (
            SELECT a AS node, b AS peer FROM ee
            UNION ALL SELECT b, a FROM ee
        ), f0 AS (
            SELECT CAST({source} AS BIGINT) AS node,
                   CAST(NULL AS BIGINT) AS parent
        ), d0 AS (
            SELECT node FROM f0
        )"""]
    for l in range(1, rounds + 1):
        ctes.append(f"""
        f{l} AS MATERIALIZED (
            SELECT bo.peer AS node, min(f.node) AS parent
            FROM f{l - 1} f JOIN bo ON bo.node = f.node
            LEFT JOIN d{l - 1} s ON s.node = bo.peer
            WHERE s.node IS NULL
            GROUP BY bo.peer
        ), d{l} AS MATERIALIZED (
            SELECT node FROM d{l - 1}
            UNION ALL SELECT node FROM f{l}
        )""")
    pm = " UNION ALL ".join(
        f"SELECT node, parent, CAST({l} AS BIGINT) AS dist FROM f{l}"
        for l in range(0, rounds + 1))
    ctes.append(f"""
        pm AS MATERIALIZED ({pm}),
        r0 AS (SELECT node, parent, dist FROM pm
               WHERE node = {target})""")
    for k in range(1, rounds + 1):
        ctes.append(f"""
        r{k} AS (SELECT pm.node, pm.parent, pm.dist
                 FROM pm JOIN r{k - 1} ON pm.node = r{k - 1}.parent)""")
    union = " UNION ALL ".join(
        f"SELECT dist AS step, node AS entity_id FROM r{k}"
        for k in range(0, rounds + 1))
    return "WITH " + ",".join(ctes) + " " + union


def _harmonic_sql(nsub: str, nobj: str, hops: int = 3,
                  e0_cte: "str | None" = None,
                  tail: "str | None" = None) -> str:
    """Unrolled replay of graph_algo.harmonic_centrality_approx: the
    shared sketch CTEs + per-round per-node estimates combined with
    the telescoped integer weights (weight(0) = −S, weight(h) =
    S//h − S//(h+1), weight(H) = S//H).  ``e0_cte``/``tail`` override
    the edge source and the final SELECT (host-graph replay); the
    default tail groups per node over the weighted union ``{union}``
    placeholder."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        HARMONIC_SCALE, NF_K, NF_SPACE,
    )

    k = NF_K
    s = HARMONIC_SCALE

    def weight(h: int) -> int:
        if h == 0:
            return -s
        if h == hops:
            return s // h
        return s // h - s // (h + 1)

    ctes = _kmv_sketch_ctes(nsub, nobj, hops, e0_cte=e0_cte)
    per = [f"""
        hc{r} AS (
            SELECT node,
                   CAST({weight(r)} AS BIGINT)
                   * CAST(CASE WHEN count(*) < {k} THEN count(*)
                          ELSE (CAST({k - 1} AS HUGEINT) * {NF_SPACE})
                               // max(h) END AS BIGINT) AS c
            FROM s{r} GROUP BY node
        )""" for r in range(0, hops + 1)]
    union = " UNION ALL ".join(
        f"SELECT node, c FROM hc{r}" for r in range(0, hops + 1))
    if tail is None:
        tail = f""" SELECT node AS entity_id,
                           CAST(sum(c) AS BIGINT) AS harmonic_scaled
                    FROM ({union}) GROUP BY node"""
    else:
        tail = tail.format(union=union)
    return "WITH " + ",".join(ctes + per) + " " + tail


def _host_harmonic_sql(pages_glob: str, hops: int = 3) -> str:
    """Host-graph replay of the harmonic-centrality sketch: same KMV
    rounds over stable_id host ids, host names joined back, hosts with
    no cross-host edges kept at the standard isolated-node score 0."""
    from neo4j_document_pipeline_ray.extras.urls import host_sql, links_sql

    hs, hd = host_sql("src_url"), host_sql("dst_url")
    e0 = f"""
        links AS ({links_sql(pages_glob)}),
        hg AS (
            SELECT DISTINCT {hs} AS a0, {hd} AS b0
            FROM links
            WHERE {hs} <> '' AND {hd} <> ''
        ),
        e0 AS (
            SELECT {_eid_sql('a0')} AS s, {_eid_sql('b0')} AS d FROM hg
        )"""
    tail = f"""
        SELECT m.host,
               CAST(coalesce(hsum.v, 0) AS BIGINT) AS harmonic_scaled
        FROM (
            SELECT host, {_eid_sql('host')} AS id FROM (
                SELECT a0 AS host FROM hg UNION SELECT b0 FROM hg)
        ) m LEFT JOIN (
            SELECT node, sum(c) AS v FROM ({{union}}) GROUP BY node
        ) hsum ON hsum.node = m.id"""
    return _harmonic_sql("", "", hops=hops, e0_cte=e0, tail=tail)


def _msf_sql(nsub: str, nobj: str, rounds: int = 9) -> str:
    """Unrolled Boruvka replay of graph_algo.minimum_spanning_forest.
    The (w, lo, hi) total order is all-distinct, so the forest is
    unique and round-for-round replay must agree bit-for-bit.  Each
    round: a recursive-CTE closure labels components of the
    forest-so-far, every component picks its min crossing edge, picked
    edges join the forest.  ``rounds=9`` covers 2^9 nodes (sf0.01 has
    a few hundred); components at least halve per round."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        SSSP_WEIGHT_MOD,
    )

    # NO recursive CTEs: inside WITH RECURSIVE DuckDB inlines every
    # CTE reference (measured: e0 went 0.1 s -> 33 s) and UNION loses
    # its dedup semantics.  Component labels come from an UNROLLED
    # DOUBLING closure of the forest-so-far instead: after k doubling
    # steps the adjacency covers 2^k-hop paths, so ``doublings`` steps
    # close any forest path over <= 2^doublings nodes.
    doublings = max(1, (rounds + 1))
    ctes = [f"""
        e0 AS MATERIALIZED (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), e AS MATERIALIZED (
            SELECT DISTINCT least(s, d) AS lo, greatest(s, d) AS hi,
                   1 + (least(s, d) + greatest(s, d))
                       % {SSSP_WEIGHT_MOD} AS w
            FROM e0 WHERE s <> d
        ), n AS MATERIALIZED (
            SELECT DISTINCT lo AS node FROM e
            UNION SELECT DISTINCT hi FROM e
        ), comp0 AS MATERIALIZED (
            SELECT node, node AS comp FROM n
        )"""]
    # each round closes only the MERGE graph (one node per component,
    # shrinks geometrically) and remaps the cumulative node->comp map
    # through it — never re-closes the whole forest
    for r in range(rounds):
        ctes.append(f"""
        crossing{r} AS MATERIALIZED (
            SELECT e.lo, e.hi, e.w, ca.comp AS ca, cb.comp AS cb
            FROM e JOIN comp{r} ca ON ca.node = e.lo
                   JOIN comp{r} cb ON cb.node = e.hi
            WHERE ca.comp <> cb.comp
        ), picked{r} AS MATERIALIZED (
            SELECT DISTINCT lo, hi, w FROM (
                SELECT comp, w, lo, hi,
                       row_number() OVER (PARTITION BY comp
                                          ORDER BY w, lo, hi) AS rn
                FROM (SELECT ca AS comp, w, lo, hi FROM crossing{r}
                      UNION ALL
                      SELECT cb, w, lo, hi FROM crossing{r})
            ) WHERE rn = 1
        ), b{r}_0 AS MATERIALIZED (
            SELECT ca AS x, cb AS y FROM (
                SELECT DISTINCT c.ca, c.cb
                FROM crossing{r} c JOIN picked{r} p
                  ON p.lo = c.lo AND p.hi = c.hi)
            UNION ALL
            SELECT cb, ca FROM (
                SELECT DISTINCT c.ca, c.cb
                FROM crossing{r} c JOIN picked{r} p
                  ON p.lo = c.lo AND p.hi = c.hi)
            UNION ALL
            SELECT DISTINCT ca, ca FROM crossing{r}
            UNION ALL
            SELECT DISTINCT cb, cb FROM crossing{r}
        )""")
        for k in range(doublings):
            ctes.append(f"""
        b{r}_{k + 1} AS MATERIALIZED (
            SELECT DISTINCT p.x, q.y
            FROM b{r}_{k} p JOIN b{r}_{k} q ON p.y = q.x
        )""")
        ctes.append(f"""
        cc{r} AS MATERIALIZED (
            SELECT x AS id, min(y) AS newc
            FROM b{r}_{doublings} GROUP BY x
        ), comp{r + 1} AS MATERIALIZED (
            SELECT c.node, COALESCE(cc.newc, c.comp) AS comp
            FROM comp{r} c LEFT JOIN cc{r} cc ON cc.id = c.comp
        )""")
    union = " UNION ALL ".join(
        f"SELECT lo, hi, w FROM picked{r}" for r in range(rounds))
    return ("WITH " + ",".join(ctes)
            + f""" SELECT lo AS entity_a, hi AS entity_b, w AS weight
                   FROM ({union})""")


def _ppr_sql(nsub: str, nobj: str, iters: int = 3) -> str:
    """Unrolled integer personalized-PageRank mirror of
    pipelines/graph_algo.py:personalized_pagerank — seed = argmax
    total degree (tie min id) over the distinct directed pair set."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import PR_SCALE

    num, den = 85, 100
    base = (PR_SCALE * (den - num)) // den
    ctes = [f"""
        e AS (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), nodes AS (
            SELECT s AS id FROM e UNION SELECT d FROM e
        ), deg AS (
            SELECT s, count(*) AS outdeg FROM e GROUP BY s
        ), dg2 AS (
            SELECT id, count(*) AS dg
            FROM (SELECT s AS id FROM e UNION ALL SELECT d FROM e)
            GROUP BY id
        ), sd AS (
            SELECT id FROM dg2 ORDER BY dg DESC, id LIMIT 1
        ), i0 AS (
            SELECT id, CAST(CASE WHEN id = (SELECT id FROM sd)
                                 THEN {PR_SCALE} ELSE 0 END AS BIGINT) AS r
            FROM nodes
        )"""]
    for k in range(1, iters + 1):
        ctes.append(f"""
        i{k} AS (
            SELECT n.id,
                   CAST(CASE WHEN n.id = (SELECT id FROM sd)
                             THEN {base} ELSE 0 END
                        + ({num} * coalesce(si.s_in, 0)) // {den}
                        AS BIGINT) AS r
            FROM nodes n LEFT JOIN (
                SELECT e.d AS id, sum(p.r // dg.outdeg) AS s_in
                FROM e JOIN i{k-1} p ON e.s = p.id
                       JOIN deg dg ON dg.s = e.s
                GROUP BY e.d
            ) si ON n.id = si.id
        )""")
    return ("WITH " + ",".join(ctes)
            + f" SELECT id AS entity_id, r AS rank_scaled FROM i{iters}")


def _undirected_sql(nsub: str, nobj: str) -> str:
    """Shared CTE prelude: distinct undirected self-loop-free edge set
    (``ee``) and its both-directions adjacency (``bo``) from the
    ground-truth triples — the graph convention of kcore/triangles."""
    return f"""
        e0 AS (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), ee AS (
            SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
            FROM e0 WHERE s <> d
        ), bo AS (
            SELECT a AS node, b AS peer FROM ee
            UNION ALL SELECT b, a FROM ee
        )"""


def _lpa_ctes(nsub: str, nobj: str, rounds: int = 4) -> list:
    """Shared unrolled synchronous-LPA label CTEs (final labels in
    l{rounds}); used by the communities and supergraph oracles."""
    ctes = [_undirected_sql(nsub, nobj) + """
        , l0 AS (
            SELECT DISTINCT node AS id, node AS lab FROM bo
        )"""]
    for k in range(1, rounds + 1):
        ctes.append(f"""
        c{k} AS (
            SELECT b.node, l.lab, count(*) AS n
            FROM bo b JOIN l{k-1} l ON b.peer = l.id
            GROUP BY 1, 2
        ), l{k} AS (
            SELECT node AS id, min(lab) AS lab
            FROM (SELECT node, lab, n,
                         max(n) OVER (PARTITION BY node) AS mx
                  FROM c{k})
            WHERE n = mx GROUP BY node
        )""")
    return ctes


def _lpa_sql(nsub: str, nobj: str, rounds: int = 4) -> str:
    """Unrolled synchronous label-propagation mirror of
    pipelines/graph_algo.py:label_prop_communities."""
    ctes = _lpa_ctes(nsub, nobj, rounds)
    return ("WITH " + ",".join(ctes)
            + f" SELECT id AS entity_id, lab AS community FROM l{rounds}")


def _supergraph_sql(nsub: str, nobj: str, rounds: int = 4) -> str:
    """Mirror of graph_algo.community_supergraph: the LPA label CTEs
    plus one endpoint-label aggregate over the distinct edge set."""
    ctes = _lpa_ctes(nsub, nobj, rounds)
    return ("WITH " + ",".join(ctes) + f"""
        SELECT least(la.lab, lb.lab) AS community_a,
               greatest(la.lab, lb.lab) AS community_b,
               count(*) AS n_edges
        FROM ee JOIN l{rounds} la ON la.id = ee.a
                JOIN l{rounds} lb ON lb.id = ee.b
        GROUP BY 1, 2""")


def _sssp_sql(nsub: str, nobj: str, max_rounds: int = 32) -> str:
    """Recursive-CTE BFS mirror of pipelines/graph_algo.py:
    bfs_distances — min hop distance from the top-degree node."""
    return f"""
        WITH RECURSIVE {_undirected_sql(nsub, nobj)},
        dg AS (
            SELECT node, count(*) AS dg FROM bo GROUP BY node
        ), sd AS (
            SELECT node FROM dg ORDER BY dg DESC, node LIMIT 1
        ), p(node, d) AS (
            SELECT node, 0 FROM sd
            UNION
            SELECT b.peer, p.d + 1
            FROM p JOIN bo b ON b.node = p.node
            WHERE p.d < {max_rounds}
        )
        SELECT node AS entity_id, CAST(min(d) AS BIGINT) AS dist
        FROM p GROUP BY node
    """


def _hits_sql(nsub: str, nobj: str, iters: int = 3) -> str:
    """Unrolled integer-HITS mirror of pipelines/graph_algo.py:hits.
    Every CTE is MATERIALIZED (see _sssp_weighted_sql's note), and the
    max-normalizer re-reads the materialized raw table."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        HITS_SCALE,
    )

    s = HITS_SCALE
    ctes = [f"""
        e AS MATERIALIZED (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), nd AS MATERIALIZED (
            SELECT DISTINCT x AS id FROM (
                SELECT s AS x FROM e UNION ALL SELECT d FROM e)
        ), a0 AS MATERIALIZED (
            SELECT id, CAST({s} AS BIGINT) AS sc FROM nd
        )"""]
    for k in range(1, iters + 1):
        ctes.append(f"""
        hr{k} AS MATERIALIZED (
            SELECT nd.id,
                   CAST(COALESCE(sum(a.sc), 0) AS BIGINT) AS raw
            FROM nd LEFT JOIN e ON e.s = nd.id
                    LEFT JOIN a{k-1} a ON a.id = e.d
            GROUP BY nd.id
        ), h{k} AS MATERIALIZED (
            SELECT id, CAST(raw // greatest(1,
                ((SELECT max(raw) FROM hr{k}) + {s} - 1) // {s})
                AS BIGINT) AS sc
            FROM hr{k}
        ), ar{k} AS MATERIALIZED (
            SELECT nd.id,
                   CAST(COALESCE(sum(h.sc), 0) AS BIGINT) AS raw
            FROM nd LEFT JOIN e ON e.d = nd.id
                    LEFT JOIN h{k} h ON h.id = e.s
            GROUP BY nd.id
        ), a{k} AS MATERIALIZED (
            SELECT id, CAST(raw // greatest(1,
                ((SELECT max(raw) FROM ar{k}) + {s} - 1) // {s})
                AS BIGINT) AS sc
            FROM ar{k}
        )""")
    return ("WITH " + ",".join(ctes) + f"""
        SELECT h.id AS entity_id, h.sc AS hub_scaled,
               a.sc AS auth_scaled
        FROM h{iters} h JOIN a{iters} a ON a.id = h.id""")


def _walks_sql(nsub: str, nobj: str, walks_per_node: int = 2,
               steps: int = 3) -> str:
    """Unrolled mirror of pipelines/graph_algo.py:random_walks — the
    hash is uint64-wrap-then-mod emulated in HUGEINT (products stay
    below 2^101, within HUGEINT range)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        _WALK_A,
        _WALK_B,
        _WALK_C,
        _WALK_D,
        WALK_M61,
    )

    m64 = 1 << 64
    ctes = [f"""
        e AS MATERIALIZED (
            SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
            FROM read_parquet('{_TRUTH_001}')
        ), f0 AS MATERIALIZED (
            SELECT seeds.s AS seed, CAST(w.w AS BIGINT) AS walk,
                   seeds.s AS cur
            FROM (SELECT DISTINCT s FROM e) seeds
            CROSS JOIN (SELECT unnest(range({walks_per_node})) AS w) w
        )"""]
    for k in range(1, steps + 1):
        ctes.append(f"""
        c{k} AS MATERIALIZED (
            SELECT f.seed, f.walk, e.d,
                   ((CAST(f.seed AS HUGEINT) * {_WALK_A}
                     + CAST(f.walk AS HUGEINT) * {_WALK_B}
                     + CAST({k} AS HUGEINT) * {_WALK_C}
                     + CAST(e.d AS HUGEINT) * {_WALK_D}) % {m64})
                   % {WALK_M61} AS h
            FROM f{k-1} f JOIN e ON e.s = f.cur
        ), f{k} AS MATERIALIZED (
            SELECT seed, walk, d AS cur FROM (
                SELECT seed, walk, d,
                       row_number() OVER (PARTITION BY seed, walk
                                          ORDER BY h, d) AS rn
                FROM c{k}) WHERE rn = 1
        )""")
    selects = ["SELECT seed, walk, CAST(0 AS BIGINT) AS step, "
               "cur AS node FROM f0"]
    for k in range(1, steps + 1):
        selects.append(f"SELECT seed, walk, CAST({k} AS BIGINT), cur "
                       f"FROM f{k}")
    return "WITH " + ",".join(ctes) + " " + " UNION ALL ".join(selects)


def _sssp_weighted_sql(nsub: str, nobj: str, rounds: int = 24) -> str:
    """Unrolled-round Bellman-Ford mirror of pipelines/graph_algo.py:
    sssp_weighted — both sides compute the identical synchronous
    integer recurrence (the Ray loop's early exit fires only at the
    fixpoint, which equals every later round's state)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        SSSP_WEIGHT_MOD,
    )

    # each round references the previous one ONCE (relaxation over an
    # adjacency extended with zero-weight self-edges == min(keep,
    # relax)), and the adjacency + round CTEs are MATERIALIZED:
    # DuckDB inlines plain CTEs, and optimizing the 24-level inlined
    # megaquery takes minutes (a twice-referenced d{k-1} would even be
    # exponential)
    ctes = [_undirected_sql(nsub, nobj) + f"""
        , wt AS (
            SELECT a, b, 1 + ((a + b) % {SSSP_WEIGHT_MOD}) AS w FROM ee
        ), bow AS MATERIALIZED (
            SELECT a AS node, b AS peer, w FROM wt
            UNION ALL SELECT b, a, w FROM wt
            UNION ALL SELECT node, node, 0
                      FROM (SELECT DISTINCT node FROM bo)
        ), dg AS (
            SELECT node, count(*) AS dg FROM bo GROUP BY node
        ), sd AS (
            SELECT node FROM dg ORDER BY dg DESC, node LIMIT 1
        ), d0 AS (
            SELECT node, CAST(0 AS BIGINT) AS dist FROM sd
        )"""]
    for k in range(1, rounds + 1):
        ctes.append(f"""
        d{k} AS MATERIALIZED (
            SELECT b.peer AS node, min(x.dist + b.w) AS dist
            FROM d{k-1} x JOIN bow b ON b.node = x.node
            GROUP BY b.peer
        )""")
    return ("WITH " + ",".join(ctes)
            + f" SELECT node AS entity_id, dist FROM d{rounds}")


def _link_pred_ra_sql(nsub: str, nobj: str, k: int = 20) -> str:
    """Exact SQL mirror of pipelines/graph_algo.py:
    link_prediction_ra_topk (integer-scaled resource allocation)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import RA_SCALE

    return f"""
        WITH {_undirected_sql(nsub, nobj)},
        deg AS (
            SELECT node, count(*) AS dg FROM bo GROUP BY node
        ), w AS (
            SELECT x.peer AS a, y.peer AS b, {RA_SCALE} // d.dg AS ra
            FROM bo x JOIN bo y ON x.node = y.node AND x.peer < y.peer
            JOIN deg d ON d.node = x.node
        ), cn AS (
            SELECT a, b,
                   CAST(count(*) AS BIGINT) AS common_neighbors,
                   CAST(sum(ra) AS BIGINT) AS ra_scaled
            FROM w GROUP BY a, b
        )
        SELECT cn.a AS entity_a, cn.b AS entity_b,
               cn.ra_scaled, cn.common_neighbors
        FROM cn LEFT JOIN ee ON cn.a = ee.a AND cn.b = ee.b
        WHERE ee.a IS NULL
        ORDER BY cn.ra_scaled DESC, cn.a, cn.b
        LIMIT {k}
    """


def _node_similarity_sql(nsub: str, nobj: str, k: int = 20) -> str:
    """Exact SQL mirror of pipelines/graph_algo.py:node_similarity_topk
    (integer-scaled neighbor-set Jaccard, adjacent pairs included)."""
    from neo4j_document_pipeline_ray.pipelines.graph_algo import (
        JACCARD_SCALE,
    )

    return f"""
        WITH {_undirected_sql(nsub, nobj)},
        deg AS (
            SELECT node, count(*) AS dg FROM bo GROUP BY node
        ), w AS (
            SELECT x.peer AS a, y.peer AS b
            FROM bo x JOIN bo y ON x.node = y.node AND x.peer < y.peer
        ), cn AS (
            SELECT a, b, CAST(count(*) AS BIGINT) AS intersection
            FROM w GROUP BY a, b
        )
        SELECT cn.a AS entity_a, cn.b AS entity_b, cn.intersection,
               CAST(({JACCARD_SCALE} * cn.intersection)
                    // (da.dg + db.dg - cn.intersection) AS BIGINT)
                 AS jaccard_scaled
        FROM cn JOIN deg da ON da.node = cn.a
                JOIN deg db ON db.node = cn.b
        ORDER BY jaccard_scaled DESC, cn.a, cn.b
        LIMIT {k}
    """


def oracle_sql() -> dict[str, str]:
    from neo4j_document_pipeline_ray.extras.dedup import (
        EXACT_DEDUP_SQL,
        SEGMENT_DEDUP_SQL,
        MINHASH_COMPONENTS_SQL,
        MINHASH_PAIRS_SQL,
        NEAR_DEDUP_KEEP_SQL,
        NGRAM_JACCARD_SQL,
        PREFIX_JACCARD_SQL,
        SIMHASH_PAIRS_SQL,
    )
    from neo4j_document_pipeline_ray.extras.decontam import (
        docs_decontaminate_sql,
    )
    from neo4j_document_pipeline_ray.extras.bpe import (
        BPE_ENCODE_SQL,
        BPE_PAIRS_SQL,
    )
    from neo4j_document_pipeline_ray.extras.bpe import bpe_train_sql as _bpe_train_sql
    from neo4j_document_pipeline_ray.extras.dupgrams import DUP_NGRAM_SQL
    from neo4j_document_pipeline_ray.extras.profile import (
        table_profile_sql as _profile_sql,
    )
    from neo4j_document_pipeline_ray.extras.urls import (
        _SPLIT_SQL as _SPLIT_EXPR_SQL,
    )
    from neo4j_document_pipeline_ray.extras.urls import (
        host_sql as _host_expr_sql,
    )
    from neo4j_document_pipeline_ray.extras.urls import (
        anchor_terms_sql,
        crawl_frontier_sql,
        host_graph_sql,
        links_sql,
        page_inlinks_sql,
        url_dedup_sql,
    )
    from neo4j_document_pipeline_ray.extras.sampling import (
        docs_domain_budget_sql,
        docs_weighted_sample_sql,
        docs_split_sql,
        docs_stratified_sample_sql,
    )
    from neo4j_document_pipeline_ray.extras.redact import scrub_blocklist_sql
    from neo4j_document_pipeline_ray.extras.similarity import (
        BITEXT_SQL,
        DOC_HYBRID_SQL,
    )
    from neo4j_document_pipeline_ray.extras.textstats import (
        DOMAIN_REP_SQL,
        FINGERPRINT_SQL,
        CURATION_FILTER_SQL,
        REPETITION_SQL,
        PPL_BUCKET_SQL,
        UNIGRAM_LOGPROB_SQL,
        NB_LANG_SQL,
        distinct_tokens_kmv_sql,
        grouped_distinct_tokens_kmv_sql,
        salient_terms_sql,
        LANG_CONFUSION_SQL,
        LANG_ID_SQL,
        QUALITY_SQL,
        TOKEN_COUNT_SQL,
        TOKEN_PACK_SQL,
        grouped_length_quantiles_sql,
        length_quantiles_sql,
        top_tokens_sql,
    )
    from neo4j_document_pipeline_ray.extras.importance import (
        DOCS_IMPORTANCE_SQL,
    )
    from neo4j_document_pipeline_ray.functions.chunking import chunks_sql
    from neo4j_document_pipeline_ray.pipelines import relational as rel
    from neo4j_document_pipeline_ray.pipelines import windows as win

    _corpus(_SF001)

    nsub = _norm_sql("subject")
    nobj = _norm_sql("object")
    nname = _norm_sql("name")

    return {
        "kg_extract_text": f"""
            SELECT url, sha256(text) AS doc_id, text
            FROM read_parquet('{_PAGES_001}')
        """,
        "kg_docs": f"""
            SELECT sha256(text) AS doc_id,
                   min(url) AS url,
                   regexp_extract(min(url), '([^/]+)$', 1) AS title,
                   min(text) AS text
            FROM read_parquet('{_PAGES_001}')
            GROUP BY sha256(text)
        """,
        "kg_triples": f"""
            SELECT DISTINCT subject, predicate, rel_type, object, subject_type,
                            object_type, object_kind, "start", "end", term, "count"
            FROM read_parquet('{_TRUTH_001}')
        """,
        # the north rule's P/R >= 0.95 acceptance metric: the oracle
        # encodes the exact-extraction invariant (P = R = 1.0 at the
        # truth set's cardinality); the Ray side measures the REAL
        # pipeline, so extraction drift fails this hash gate
        "kg_triple_pr": f"""
            WITH t AS (
                SELECT DISTINCT subject, predicate, rel_type, object,
                       subject_type, object_type, object_kind,
                       "start", "end", term, "count"
                FROM read_parquet('{_TRUTH_001}')
            )
            SELECT CAST(count(*) AS BIGINT) AS n_truth,
                   CAST(count(*) AS BIGINT) AS n_extracted,
                   CAST(count(*) AS BIGINT) AS n_matched,
                   CAST(1000000 AS BIGINT) AS precision_scaled,
                   CAST(1000000 AS BIGINT) AS recall_scaled
            FROM t
        """,
        "kg_nodes": f"""
            WITH m AS (
                SELECT subject AS name, subject_type AS label
                FROM read_parquet('{_TRUTH_001}')
                UNION ALL
                SELECT object, object_type FROM read_parquet('{_TRUTH_001}')
            ), k AS (
                SELECT name, label, {nname} AS norm_key FROM m
            ), g AS (
                SELECT norm_key, min(name || chr(31) || label) AS rep
                FROM k GROUP BY norm_key
            )
            SELECT {_eid_sql('norm_key')} AS entity_id,
                   split_part(rep, chr(31), 2) AS label,
                   split_part(rep, chr(31), 1) AS name,
                   norm_key
            FROM g
        """,
        "kg_edges": f"""
            WITH t AS (
                SELECT tr.*, sha256(p.text) AS doc_id
                FROM read_parquet('{_TRUTH_001}') tr
                JOIN read_parquet('{_PAGES_001}') p USING (url)
            )
            SELECT {_eid_sql(nsub)} AS src_id,
                   rel_type,
                   {_eid_sql(nobj)} AS dst_id,
                   coalesce(term, '') AS term_key,
                   array_to_string(list(DISTINCT doc_id ORDER BY doc_id), ',') AS sources_csv,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_sources
            FROM t
            GROUP BY 1, 2, 3, 4
        """,
        "kg_mentions": f"""
            WITH t AS (
                SELECT tr.*, sha256(p.text) AS doc_id
                FROM read_parquet('{_TRUTH_001}') tr
                JOIN read_parquet('{_PAGES_001}') p USING (url)
            ), m AS (
                SELECT doc_id, subject AS name FROM t
                UNION ALL
                SELECT doc_id, object FROM t
            )
            SELECT DISTINCT doc_id, {_eid_sql(nname)} AS entity_id FROM m
        """,
        # greedy paragraph-packing chunker mirrored as a list_reduce
        # fold (functions/chunking.py:chunks_sql); chunk_id = sha256 of
        # the reconstructed chunk text, so the hash check pins the
        # exact chunk boundaries, not just counts
        "kg_chunks": chunks_sql(_PAGES_001),
        "kg_keyword_topk": _keyword_topk_sql(nname),
        "kg_bm25_topk": _bm25_topk_sql(nname),
        # the indexed BM25 path must produce byte-identical results to
        # the scan path, so it shares the same oracle
        "kg_bm25_index_topk": _bm25_topk_sql(nname),
        "kg_khop": _khop_sql(nsub, nobj),
        "kg_graphrag_seeds": _graphrag_seeds_sql(nname),
        "docs_train_shards": __import__(
            "neo4j_document_pipeline_ray.extras.sampling",
            fromlist=["docs_train_shards_sql"]).docs_train_shards_sql(),
        "kg_ego_nets": _ego_sql(nsub, nobj, _khop_seeds()),
        "kg_pagerank": _pagerank_sql(nsub, nobj),
        "kg_ppr": _ppr_sql(nsub, nobj),
        "kg_communities": _lpa_sql(nsub, nobj, rounds=_LPA_ROUNDS),
        "kg_supergraph": _supergraph_sql(nsub, nobj, rounds=_LPA_ROUNDS),
        "kg_truss_support": f"""
            WITH e0 AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
                FROM read_parquet('{_TRUTH_001}')
            ), ee AS (
                SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                FROM e0 WHERE s <> d
            ), tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM ee e1
                JOIN ee e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN ee e3 ON e3.a = e1.b AND e3.b = e2.b
            ), sup AS (
                SELECT x AS lo, y AS hi FROM tri
                UNION ALL SELECT x, z FROM tri
                UNION ALL SELECT y, z FROM tri
            )
            SELECT lo AS entity_a, hi AS entity_b,
                   count(*) AS support
            FROM sup GROUP BY 1, 2
        """,
        "kg_sssp": _sssp_sql(nsub, nobj),
        "kg_sssp_weighted": _sssp_weighted_sql(nsub, nobj),
        "kg_hits": _hits_sql(nsub, nobj, iters=3),
        "kg_walks": _walks_sql(nsub, nobj, walks_per_node=2, steps=3),
        "kg_skipgrams": f"""
            WITH w AS ({_walks_sql(nsub, nobj, walks_per_node=2,
                                   steps=3)})
            SELECT a.node AS center, b.node AS context,
                   CAST(count(*) AS BIGINT) AS n
            FROM w a JOIN w b
              ON a.seed = b.seed AND a.walk = b.walk
             AND a.step <> b.step AND abs(a.step - b.step) <= 2
            GROUP BY a.node, b.node
        """,
        "kg_link_pred_ra_topk": _link_pred_ra_sql(nsub, nobj, k=20),
        "kg_node_similarity": _node_similarity_sql(nsub, nobj, k=20),
        "kg_degree_topk": f"""
            WITH e AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
                FROM read_parquet('{_TRUTH_001}')
            ), ends AS (
                SELECT s AS entity_id, 1 AS is_out FROM e
                UNION ALL
                SELECT d, 0 FROM e
            )
            SELECT entity_id,
                   CAST(sum(is_out) AS BIGINT) AS out_deg,
                   count(*) - CAST(sum(is_out) AS BIGINT) AS in_deg,
                   count(*) AS degree
            FROM ends GROUP BY entity_id
            ORDER BY degree DESC, entity_id
            LIMIT 20
        """,
        "kg_triangles": f"""
            WITH e0 AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
                FROM read_parquet('{_TRUTH_001}')
            ), e AS (
                SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                FROM e0 WHERE s <> d
            ), tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1
                JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
            ), ends AS (
                SELECT x AS entity_id FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
            )
            SELECT entity_id, count(*) AS n_triangles
            FROM ends GROUP BY entity_id
        """,
        "kg_clustering": f"""
            WITH e0 AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
                FROM read_parquet('{_TRUTH_001}')
            ), e AS (
                SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                FROM e0 WHERE s <> d
            ), deg AS (
                SELECT entity_id, count(*) AS degree FROM (
                    SELECT a AS entity_id FROM e
                    UNION ALL SELECT b FROM e)
                GROUP BY entity_id
            ), tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1
                JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
            ), tc AS (
                SELECT entity_id, count(*) AS n_triangles FROM (
                    SELECT x AS entity_id FROM tri
                    UNION ALL SELECT y FROM tri
                    UNION ALL SELECT z FROM tri)
                GROUP BY entity_id
            )
            SELECT d.entity_id, d.degree,
                   CAST(COALESCE(tc.n_triangles, 0) AS BIGINT)
                       AS n_triangles,
                   CAST(CASE WHEN d.degree >= 2 THEN
                            2 * COALESCE(tc.n_triangles, 0) * 1000000
                            // (d.degree * (d.degree - 1))
                        ELSE 0 END AS BIGINT) AS cc_scaled
            FROM deg d LEFT JOIN tc USING (entity_id)
        """,
        "kg_neighborhood": _neighborhood_sql(nsub, nobj),
        # same sketch replay, reduced to the one-row 90%-coverage head
        "kg_eff_diameter": f"""
            WITH nfq AS ({_neighborhood_sql(nsub, nobj)})
            SELECT hop AS eff_diameter_hop, nf_est AS nf_at_hop,
                   (SELECT nf_est FROM nfq WHERE hop = 3) AS nf_max
            FROM nfq
            WHERE 10 * nf_est
                  >= 9 * (SELECT nf_est FROM nfq WHERE hop = 3)
            ORDER BY hop LIMIT 1
        """,
        # time-sliced PageRank: same unroll, window-filtered edge set
        "kg_pagerank_asof": _pagerank_unroll(f"""
            e AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s,
                       {_eid_sql(nobj)} AS d
                FROM read_parquet('{_TRUTH_001}')
                WHERE (coalesce("start", '') = '' OR "start" <= '2025')
                  AND (coalesce("end", '') = '' OR "end" >= '2025')
            )""", 3,
            "SELECT id AS entity_id, r AS rank_scaled FROM i3"),
        # transductive split: same sha256 stable_id bucket + both-
        # endpoints-in-train filter
        "kg_edge_split": f"""
            WITH e AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s, rel_type,
                       {_eid_sql(nobj)} AS d
                FROM read_parquet('{_TRUTH_001}')
            ), k AS (
                SELECT s, rel_type, d,
                       {_eid_sql("concat(CAST(s AS VARCHAR), '|',"
                                 " rel_type, '|',"
                                 " CAST(d AS VARCHAR))")} % 10
                           AS bucket
                FROM e
            ), tn AS (
                SELECT s AS n FROM k WHERE bucket <> 7
                UNION SELECT d FROM k WHERE bucket <> 7
            )
            SELECT s AS src_id, rel_type, d AS dst_id
            FROM k
            WHERE bucket = 7
              AND s IN (SELECT n FROM tn)
              AND d IN (SELECT n FROM tn)
        """,
        # KELM-style verbalization: distinct-assertion support per
        # surface triple, deterministic sentence concat
        "kg_verbalized": f"""
            WITH t AS (
                SELECT DISTINCT subject, predicate, rel_type, object,
                       subject_type, object_type, object_kind,
                       "start", "end", term, "count"
                FROM read_parquet('{_TRUTH_001}')
            )
            SELECT subject, predicate, object,
                   CAST(count(*) AS BIGINT) AS n,
                   subject || ' ' || predicate || ' ' || object || '.'
                       AS sentence
            FROM t GROUP BY 1, 2, 3
        """,
        # functional-conflict audit: fun >= 0.8 relations from the same
        # cardinality profile, then subjects with 2+ distinct objects
        "kg_conflicts": f"""
            WITH e AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s, rel_type,
                       {_eid_sql(nobj)} AS d,
                       coalesce(term, '') AS term_key
                FROM read_parquet('{_TRUTH_001}')
            ), card AS (
                SELECT rel_type,
                       (1000000 * count(DISTINCT s)) // count(*) AS fs
                FROM e GROUP BY rel_type
            ), funcs AS (
                SELECT rel_type FROM card WHERE fs >= 800000
            ), de AS (
                SELECT DISTINCT rel_type, s, d FROM e
                WHERE rel_type IN (SELECT rel_type FROM funcs)
            )
            SELECT rel_type, s AS src_id,
                   CAST(count(*) AS BIGINT) AS n_objects
            FROM de GROUP BY rel_type, s
            HAVING count(*) > 1
            ORDER BY n_objects DESC, rel_type, src_id LIMIT 100
        """,
        # distant supervision: doc-level mentions (the kg_mentions set)
        # self-joined into ordered pairs, filtered to KB edges, gold
        # iff the doc is provenance of that exact (s, r, d)
        "kg_distant_pairs": f"""
            WITH t AS (
                SELECT tr.*, sha256(p.text) AS doc_id
                FROM read_parquet('{_TRUTH_001}') tr
                JOIN read_parquet('{_PAGES_001}') p USING (url)
            ), m AS (
                SELECT DISTINCT doc_id, entity_id FROM (
                    SELECT doc_id, {_eid_sql(nsub)} AS entity_id FROM t
                    UNION ALL
                    SELECT doc_id, {_eid_sql(nobj)} FROM t)
            ), e AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS src_id, rel_type,
                       {_eid_sql(nobj)} AS dst_id
                FROM t
            ), prov AS (
                SELECT DISTINCT doc_id, {_eid_sql(nsub)} AS src_id,
                       rel_type, {_eid_sql(nobj)} AS dst_id
                FROM t
            ), pairs AS (
                SELECT a.doc_id, a.entity_id AS src_id,
                       b.entity_id AS dst_id
                FROM m a JOIN m b USING (doc_id)
                WHERE a.entity_id <> b.entity_id
            )
            SELECT p.doc_id, p.src_id, e.rel_type, p.dst_id,
                   CAST(CASE WHEN pr.doc_id IS NULL THEN 0 ELSE 1 END
                        AS BIGINT) AS is_gold
            FROM pairs p
            JOIN e ON e.src_id = p.src_id AND e.dst_id = p.dst_id
            LEFT JOIN prov pr
              ON pr.doc_id = p.doc_id AND pr.src_id = p.src_id
             AND pr.rel_type = e.rel_type AND pr.dst_id = p.dst_id
        """,
        # distant-pair context windows: the pairs CTE chain + the
        # mention_contexts name/doc machinery, strpos run per endpoint
        "kg_distant_contexts": f"""
            WITH t AS (
                SELECT tr.*, sha256(p.text) AS doc_id
                FROM read_parquet('{_TRUTH_001}') tr
                JOIN read_parquet('{_PAGES_001}') p USING (url)
            ), m AS (
                SELECT DISTINCT doc_id, entity_id FROM (
                    SELECT doc_id, {_eid_sql(nsub)} AS entity_id FROM t
                    UNION ALL
                    SELECT doc_id, {_eid_sql(nobj)} FROM t)
            ), e AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS src_id, rel_type,
                       {_eid_sql(nobj)} AS dst_id
                FROM t
            ), pool AS (
                SELECT subject AS name, subject_type AS label,
                       {nsub} AS norm_key
                FROM read_parquet('{_TRUTH_001}')
                UNION ALL
                SELECT object, object_type, {nobj}
                FROM read_parquet('{_TRUTH_001}')
            ), nm AS (
                SELECT {_eid_sql('norm_key')} AS entity_id,
                       split_part(min(name || chr(31) || label),
                                  chr(31), 1) AS name
                FROM pool GROUP BY norm_key
            ), docs AS (
                SELECT sha256(text) AS doc_id, min(text) AS text
                FROM read_parquet('{_PAGES_001}') GROUP BY 1
            ), pairs AS (
                SELECT a.doc_id, a.entity_id AS src_id,
                       b.entity_id AS dst_id
                FROM m a JOIN m b USING (doc_id)
                WHERE a.entity_id <> b.entity_id
            ), j AS (
                SELECT p.doc_id, p.src_id, e.rel_type, p.dst_id,
                       ns.name AS s_name, nd.name AS d_name, d.text,
                       strpos(d.text, ns.name) AS p1,
                       strpos(d.text, nd.name) AS p2
                FROM pairs p
                JOIN e ON e.src_id = p.src_id AND e.dst_id = p.dst_id
                JOIN nm ns ON ns.entity_id = p.src_id
                JOIN nm nd ON nd.entity_id = p.dst_id
                JOIN docs d ON d.doc_id = p.doc_id
                WHERE ns.name <> '' AND nd.name <> ''
            ), w AS (
                SELECT *,
                       greatest(0, least(p1, p2) - 1 - {_CTX_PAD}) AS lo,
                       least(len(text),
                             greatest(p1 - 1 + len(s_name),
                                      p2 - 1 + len(d_name))
                             + {_CTX_PAD}) AS hi
                FROM j
                WHERE p1 > 0 AND p2 > 0
                  AND greatest(p1, p2) - least(p1, p2) <= {_DS_SPAN}
            )
            SELECT doc_id, src_id, rel_type, dst_id,
                   CAST(p1 - 1 AS BIGINT) AS src_offset,
                   CAST(p2 - 1 AS BIGINT) AS dst_offset,
                   substr(text, lo + 1, hi - lo) AS context
            FROM w
        """,
        # AMIE fun/ifun over the same edge identity as kg_rel_counts
        "kg_rel_cardinality": f"""
            WITH e AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s, rel_type,
                       {_eid_sql(nobj)} AS d,
                       coalesce(term, '') AS term_key
                FROM read_parquet('{_TRUTH_001}')
            )
            SELECT rel_type,
                   count(*) AS n_edges,
                   count(DISTINCT s) AS n_src,
                   count(DISTINCT d) AS n_dst,
                   CAST((1000000 * count(DISTINCT s)) // count(*)
                        AS BIGINT) AS func_scaled,
                   CAST((1000000 * count(DISTINCT d)) // count(*)
                        AS BIGINT) AS inv_func_scaled
            FROM e GROUP BY rel_type
        """,
        "kg_harmonic": _harmonic_sql(nsub, nobj),
        "kg_path_between": _path_sql(nsub, nobj, *_khop_seeds()[:2]),
        "kg_betweenness": _betweenness_sql(nsub, nobj),
        "kg_wl_roles": _wl_sql(nsub, nobj),
        "kg_scc": _scc_sql(nsub, nobj),
        "kg_struct_profile": _struct_profile_sql(nsub, nobj),
        "kg_truss": _ktruss_sql(nsub, nobj),
        "kg_entity_cards": _entity_cards_sql(nsub),
        "kg_bowtie": _bowtie_sql(nsub, nobj),
        "kg_entity_salience": _entity_salience_sql(nsub, nobj),
        "kg_triads": _triads_sql(nsub, nobj),
        "kg_negative": _negative_sql(nsub, nobj),
        "kg_rules": _rules_sql(nsub, nobj),
        "kg_msf": _msf_sql(nsub, nobj),
        "kg_edge_timeline": f"""
            WITH t AS (
                SELECT tr.*, sha256(p.text) AS doc_id
                FROM read_parquet('{_TRUTH_001}') tr
                JOIN read_parquet('{_PAGES_001}') p USING (url)
            ), prov AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS src_id, rel_type,
                                {_eid_sql(nobj)} AS dst_id, doc_id
                FROM t
            ), spans AS (
                SELECT sha256(text) AS doc_id,
                       min(epoch_us(warc_ts)) AS f,
                       max(epoch_us(warc_ts)) AS l
                FROM read_parquet('{_PAGES_001}') GROUP BY 1
            )
            SELECT src_id, rel_type, dst_id,
                   min(f) AS first_seen_us,
                   max(l) AS last_seen_us,
                   count(*) AS n_docs
            FROM prov JOIN spans USING (doc_id)
            GROUP BY 1, 2, 3
        """,
        "kg_domain_entities": f"""
            WITH t AS (
                SELECT tr.*, sha256(p.text) AS doc_id
                FROM read_parquet('{_TRUTH_001}') tr
                JOIN read_parquet('{_PAGES_001}') p USING (url)
            ), m AS (
                SELECT doc_id, subject AS name FROM t
                UNION ALL SELECT doc_id, object FROM t
            ), men AS (
                SELECT DISTINCT doc_id, {_eid_sql(nname)} AS entity_id
                FROM m
            ), docs AS (
                SELECT sha256(text) AS doc_id,
                       COALESCE(regexp_extract(min(url),
                                '^https?://([^/]+)', 1), '') AS domain
                FROM read_parquet('{_PAGES_001}')
                GROUP BY sha256(text)
            ), dp AS (
                SELECT domain, count(*) AS n_docs FROM docs GROUP BY 1
            ), mm AS (
                SELECT d.domain, men.entity_id
                FROM men JOIN docs d USING (doc_id)
            ), mp AS (
                SELECT domain, count(*) AS n_mentions FROM mm GROUP BY 1
            ), ep AS (
                SELECT domain, count(*) AS n_entities
                FROM (SELECT DISTINCT domain, entity_id FROM mm)
                GROUP BY 1
            )
            SELECT dp.domain, dp.n_docs,
                   COALESCE(ep.n_entities, 0) AS n_entities,
                   COALESCE(mp.n_mentions, 0) AS n_mentions
            FROM dp LEFT JOIN ep USING (domain)
                    LEFT JOIN mp USING (domain)
        """,
        "kg_entity_timeline": f"""
            WITH t AS (
                SELECT tr.*, sha256(p.text) AS doc_id
                FROM read_parquet('{_TRUTH_001}') tr
                JOIN read_parquet('{_PAGES_001}') p USING (url)
            ), m AS (
                SELECT doc_id, subject AS name FROM t
                UNION ALL SELECT doc_id, object FROM t
            ), men AS (
                SELECT DISTINCT doc_id, {_eid_sql(nname)} AS entity_id
                FROM m
            ), spans AS (
                SELECT sha256(text) AS doc_id,
                       min(epoch_us(warc_ts)) AS f,
                       max(epoch_us(warc_ts)) AS l
                FROM read_parquet('{_PAGES_001}') GROUP BY 1
            )
            SELECT entity_id,
                   min(f) AS first_seen_us,
                   max(l) AS last_seen_us,
                   count(*) AS n_docs
            FROM men JOIN spans USING (doc_id)
            GROUP BY entity_id
        """,
        "kg_diff": f"""
            WITH t AS (
                SELECT tr.*, sha256(p.text) AS doc_id
                FROM read_parquet('{_TRUTH_001}') tr
                JOIN read_parquet('{_PAGES_001}') p USING (url)
            ), prov AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS src_id, rel_type,
                                {_eid_sql(nobj)} AS dst_id, doc_id
                FROM t
            ), agg AS (
                SELECT src_id, rel_type, dst_id,
                       count(*) AS n_docs,
                       sum(CASE WHEN substr(doc_id, 1, 1) < '8'
                                THEN 1 ELSE 0 END) AS n_kept
                FROM prov GROUP BY 1, 2, 3
            )
            SELECT src_id, rel_type, dst_id,
                   CAST(n_docs AS BIGINT) AS n_docs,
                   CAST(n_kept AS BIGINT) AS n_docs_kept,
                   CASE WHEN n_kept = 0 THEN 'dropped'
                        ELSE 'kept' END AS status
            FROM agg
        """,
        # offsets are byte-based on the Arrow side and char-based in
        # DuckDB — identical for this ASCII corpus (the FINGERPRINT_SQL
        # caveat)
        "kg_mention_contexts": f"""
            WITH t AS (
                SELECT tr.*, sha256(p.text) AS doc_id
                FROM read_parquet('{_TRUTH_001}') tr
                JOIN read_parquet('{_PAGES_001}') p USING (url)
            ), m AS (
                SELECT doc_id, subject AS name FROM t
                UNION ALL SELECT doc_id, object FROM t
            ), men AS (
                SELECT DISTINCT doc_id, {_eid_sql(nname)} AS entity_id
                FROM m
            ), pool AS (
                SELECT subject AS name, subject_type AS label,
                       {nsub} AS norm_key
                FROM read_parquet('{_TRUTH_001}')
                UNION ALL
                SELECT object, object_type, {nobj}
                FROM read_parquet('{_TRUTH_001}')
            ), nm AS (
                SELECT {_eid_sql('norm_key')} AS entity_id,
                       split_part(min(name || chr(31) || label),
                                  chr(31), 1) AS name
                FROM pool GROUP BY norm_key
            ), docs AS (
                SELECT sha256(text) AS doc_id, min(text) AS text
                FROM read_parquet('{_PAGES_001}') GROUP BY 1
            ), j AS (
                SELECT men.doc_id, men.entity_id, nm.name, d.text,
                       strpos(d.text, nm.name) AS pos1
                FROM men JOIN nm USING (entity_id)
                         JOIN docs d ON d.doc_id = men.doc_id
                WHERE nm.name <> ''
            )
            SELECT doc_id, entity_id,
                   CAST(pos1 - 1 AS BIGINT) AS name_offset,
                   substr(text, greatest(0, pos1 - 1 - {_CTX_PAD}) + 1,
                          least(len(text),
                                pos1 - 1 + len(name) + {_CTX_PAD})
                          - greatest(0, pos1 - 1 - {_CTX_PAD}))
                       AS context
            FROM j WHERE pos1 > 0
        """,
        "kg_degree_hist": f"""
            WITH e AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
                FROM read_parquet('{_TRUTH_001}')
            ), ends AS (
                SELECT s AS entity_id FROM e
                UNION ALL SELECT d FROM e
            ), deg AS (
                SELECT entity_id, count(*) AS degree
                FROM ends GROUP BY entity_id
            ), b AS (
                SELECT CAST(floor(log2(degree)) AS BIGINT) AS bucket
                FROM deg
            )
            SELECT bucket,
                   CAST(power(2, bucket) AS BIGINT) AS min_degree,
                   count(*) AS n_nodes
            FROM b GROUP BY bucket
        """,
        # token-set Jaccard over normalized names: same tokenization as
        # extras/dedup._gram_words ([a-z0-9]+ on the lowercased key);
        # the FNV word hash needs no replay because candidates are
        # verified on full token sets (collision-free on this corpus,
        # same convention as PREFIX_JACCARD_SQL)
        "kg_alias_candidates": f"""
            WITH m AS (
                SELECT subject AS name FROM read_parquet('{_TRUTH_001}')
                UNION ALL
                SELECT object FROM read_parquet('{_TRUTH_001}')
            ), g AS (
                SELECT DISTINCT {nname} AS norm_key FROM m
            ), nodes AS (
                SELECT {_eid_sql('norm_key')} AS entity_id, norm_key FROM g
            ), tok AS (
                SELECT DISTINCT entity_id, unnest(list_filter(
                    string_split_regex(lower(norm_key), '[^a-z0-9]+'),
                    x -> x <> '')) AS w
                FROM nodes
            ), sizes AS (
                SELECT entity_id, count(*) AS n FROM tok GROUP BY entity_id
            ), inter AS (
                SELECT ta.entity_id AS a, tb.entity_id AS b,
                       count(*) AS i
                FROM tok ta JOIN tok tb
                  ON ta.w = tb.w AND ta.entity_id < tb.entity_id
                GROUP BY 1, 2
            )
            SELECT a AS entity_a, b AS entity_b,
                   CAST(i AS BIGINT) AS n_shared,
                   CAST(i * 1000000 // (sa.n + sb.n - i) AS BIGINT)
                       AS jaccard_scaled
            FROM inter
            JOIN sizes sa ON sa.entity_id = a
            JOIN sizes sb ON sb.entity_id = b
            WHERE 2 * i >= 1 * (sa.n + sb.n - i)
        """,
        "kg_components": f"""
            WITH RECURSIVE e0 AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
                FROM read_parquet('{_TRUTH_001}')
            ), e AS (
                SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e0
            ), n AS (
                SELECT a AS id FROM e UNION SELECT b FROM e
            ), reach(id, r) AS (
                SELECT id, id FROM n
                UNION
                SELECT reach.id,
                       CASE WHEN e.a = reach.r THEN e.b ELSE e.a END
                FROM reach JOIN e ON e.a = reach.r OR e.b = reach.r
            )
            SELECT id AS entity_id, min(r) AS component
            FROM reach GROUP BY id
        """,
        # k-core by recursive peeling: each iteration recomputes the
        # surviving set from the previous round's working table (DuckDB
        # permits the multi-reference), emitting rows only while the
        # set strictly shrinks; the final peel applied OUTSIDE the
        # recursion returns the fixpoint set (or the empty core when
        # the last candidate round peeled to nothing)
        "kg_kcore": f"""
            WITH RECURSIVE e0 AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
                FROM read_parquet('{_TRUTH_001}')
            ), ee AS (
                SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                FROM e0 WHERE s <> d
            ), bo AS (
                SELECT a AS node, b AS peer FROM ee
                UNION ALL SELECT b, a FROM ee
            ), keep(round, node, cnt) AS (
                SELECT 0, node, CAST(count(*) OVER () AS BIGINT) FROM (
                    SELECT node FROM bo
                    GROUP BY node HAVING count(*) >= {_KCORE_K}
                )
                UNION ALL
                SELECT round, node, csize FROM (
                    SELECT round, node, prev_cnt,
                           CAST(count(*) OVER () AS BIGINT) AS csize
                    FROM (
                        SELECT min(k1.round) + 1 AS round, b.node AS node,
                               min(k1.cnt) AS prev_cnt
                        FROM bo b
                        JOIN keep k1 ON b.node = k1.node
                        JOIN keep k2 ON b.peer = k2.node
                        GROUP BY b.node
                        HAVING count(*) >= {_KCORE_K}
                    ) s
                ) s2 WHERE csize < prev_cnt
            ), fin AS (
                SELECT node FROM keep
                WHERE round = (SELECT max(round) FROM keep)
            )
            SELECT b.node AS entity_id, CAST(count(*) AS BIGINT) AS deg
            FROM bo b
            JOIN fin f1 ON b.node = f1.node
            JOIN fin f2 ON b.peer = f2.node
            GROUP BY b.node HAVING count(*) >= {_KCORE_K}
        """,
        "kg_export_neo4j": f"""
            WITH m AS (
                SELECT subject AS name, subject_type AS label
                FROM read_parquet('{_TRUTH_001}')
                UNION ALL
                SELECT object, object_type FROM read_parquet('{_TRUTH_001}')
            ), k AS (
                SELECT name, label, {nname} AS norm_key FROM m
            ), g AS (
                SELECT norm_key, min(name || chr(31) || label) AS rep
                FROM k GROUP BY norm_key
            )
            SELECT {_eid_sql('norm_key')} AS entity_id,
                   split_part(rep, chr(31), 2) AS label,
                   split_part(rep, chr(31), 1) AS name,
                   norm_key
            FROM g
        """,
        "kg_integrity": f"""
            WITH m AS (
                SELECT subject AS name FROM read_parquet('{_TRUTH_001}')
                UNION ALL
                SELECT object FROM read_parquet('{_TRUTH_001}')
            ), nodes AS (
                SELECT DISTINCT {_eid_sql(nname)} AS entity_id FROM m
            ), e AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s, rel_type,
                       {_eid_sql(nobj)} AS d, coalesce(term, '') AS term_key
                FROM read_parquet('{_TRUTH_001}')
            )
            SELECT (SELECT count(*) FROM nodes) AS n_nodes,
                   (SELECT count(*) FROM e) AS n_edges,
                   (SELECT count(*) FROM (
                        SELECT s AS id FROM e UNION ALL SELECT d FROM e)
                    WHERE id NOT IN (SELECT entity_id FROM nodes))
                       AS n_orphan_endpoints,
                   (SELECT count(*) FROM e WHERE s = d) AS n_self_loops
        """,
        "kg_schema_report": f"""
            WITH m AS (
                SELECT subject AS name, subject_type AS label
                FROM read_parquet('{_TRUTH_001}')
                UNION ALL
                SELECT object, object_type FROM read_parquet('{_TRUTH_001}')
            ), k AS (
                SELECT name, label, {nname} AS norm_key FROM m
            ), g AS (
                SELECT norm_key, min(name || chr(31) || label) AS rep
                FROM k GROUP BY norm_key
            ), nodes AS (
                SELECT {_eid_sql('norm_key')} AS entity_id,
                       split_part(rep, chr(31), 2) AS label
                FROM g
            ), e AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s, rel_type,
                       {_eid_sql(nobj)} AS d, coalesce(term, '') AS term_key
                FROM read_parquet('{_TRUTH_001}')
            )
            SELECT ns.label AS src_label, e.rel_type,
                   nd.label AS dst_label, count(*) AS n_edges
            FROM e
            JOIN nodes ns ON ns.entity_id = e.s
            JOIN nodes nd ON nd.entity_id = e.d
            GROUP BY 1, 2, 3
        """,
        "kg_link_pred_topk": f"""
            WITH e0 AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s, {_eid_sql(nobj)} AS d
                FROM read_parquet('{_TRUTH_001}')
            ), e AS (
                SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                FROM e0 WHERE s <> d
            ), nb AS (
                SELECT a AS u, b AS v FROM e
                UNION ALL SELECT b, a FROM e
            ), w AS (
                SELECT n1.v AS entity_a, n2.v AS entity_b,
                       count(*) AS common_neighbors
                FROM nb n1 JOIN nb n2 ON n1.u = n2.u AND n1.v < n2.v
                GROUP BY 1, 2
            )
            SELECT entity_a, entity_b, common_neighbors FROM w
            WHERE NOT EXISTS (SELECT 1 FROM e
                              WHERE e.a = w.entity_a AND e.b = w.entity_b)
            ORDER BY common_neighbors DESC, entity_a, entity_b
            LIMIT 20
        """,
        "kg_cooccur_topk": f"""
            WITH t AS (
                SELECT tr.*, sha256(p.text) AS doc_id
                FROM read_parquet('{_TRUTH_001}') tr
                JOIN read_parquet('{_PAGES_001}') p USING (url)
            ), m AS (
                SELECT DISTINCT doc_id, {_eid_sql(nname)} AS entity_id FROM (
                    SELECT doc_id, subject AS name FROM t
                    UNION ALL SELECT doc_id, object FROM t
                )
            ), nd AS (
                SELECT count(DISTINCT doc_id) AS n FROM m
            ), c AS (
                SELECT entity_id, count(*) AS cnt FROM m GROUP BY 1
            ), p2 AS (
                SELECT m1.entity_id AS entity_a, m2.entity_id AS entity_b,
                       count(*) AS n_docs_both
                FROM m m1 JOIN m m2 ON m1.doc_id = m2.doc_id
                                    AND m1.entity_id < m2.entity_id
                GROUP BY 1, 2
            )
            SELECT entity_a, entity_b, n_docs_both,
                   CAST((n_docs_both * (SELECT n FROM nd) * 1000000)
                        // (ca.cnt * cb.cnt) AS BIGINT) AS lift_scaled
            FROM p2
            JOIN c ca ON ca.entity_id = entity_a
            JOIN c cb ON cb.entity_id = entity_b
            WHERE n_docs_both >= 2
            ORDER BY lift_scaled DESC, entity_a, entity_b
            LIMIT 50
        """,
        "kg_related_docs": f"""
            WITH t AS (
                SELECT tr.*, sha256(p.text) AS doc_id
                FROM read_parquet('{_TRUTH_001}') tr
                JOIN read_parquet('{_PAGES_001}') p USING (url)
            ), m AS (
                SELECT DISTINCT doc_id, {_eid_sql(nname)} AS entity_id FROM (
                    SELECT doc_id, subject AS name FROM t
                    UNION ALL SELECT doc_id, object FROM t
                )
            ), edf AS (
                SELECT entity_id, count(*) AS df FROM m GROUP BY 1
            ), mk AS (
                SELECT m.doc_id, m.entity_id
                FROM m JOIN edf USING (entity_id) WHERE df <= 50
            ), sz AS (
                SELECT doc_id, count(*) AS sz FROM mk GROUP BY 1
            ), p2 AS (
                SELECT m1.doc_id AS doc_a, m2.doc_id AS doc_b,
                       count(*) AS shared_entities
                FROM mk m1 JOIN mk m2 ON m1.entity_id = m2.entity_id
                                      AND m1.doc_id < m2.doc_id
                GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   CAST(shared_entities AS BIGINT) AS shared_entities,
                   CAST((1000000 * shared_entities)
                        // (sa.sz + sb.sz - shared_entities)
                        AS BIGINT) AS jaccard_scaled
            FROM p2
            JOIN sz sa ON sa.doc_id = doc_a
            JOIN sz sb ON sb.doc_id = doc_b
            WHERE shared_entities >= 2
            ORDER BY jaccard_scaled DESC, doc_a, doc_b
            LIMIT 50
        """,
        "pages_url_dedup": url_dedup_sql(_PAGES_001),
        "pages_links": links_sql(_PAGES_001),
        "pages_host_graph": host_graph_sql(_PAGES_001),
        "pages_host_rank": _host_rank_sql(_PAGES_001),
        "pages_host_harmonic": _host_harmonic_sql(_PAGES_001),
        "pages_crawl_frontier": crawl_frontier_sql(_PAGES_001, k=100),
        "pages_inlinks": page_inlinks_sql(_PAGES_001, k=100),
        "pages_url_templates": f"""
            SELECT host, template,
                   CAST(count(*) AS BIGINT) AS n_pages
            FROM (
                SELECT {_host_expr_sql('url')} AS host,
                       regexp_replace(regexp_replace(
                           regexp_extract(url, {_SPLIT_EXPR_SQL}, 2),
                           '/+$', ''), '[0-9]+', 'N', 'g') AS template
                FROM read_parquet('{_PAGES_001}')
            ) GROUP BY 1, 2
        """,
        "pages_anchor_terms": anchor_terms_sql(_PAGES_001),
        "pages_section_stats": f"""
            WITH b AS (
                SELECT regexp_extract(url,
                           '^https?://[^/]+/([^/]+)', 1) AS section,
                       lang, octet_length(html) AS hb
                FROM read_parquet('{_PAGES_001}')
            )
            SELECT section, CAST(count(*) AS BIGINT) AS n_pages,
                   CAST(sum(hb) AS BIGINT) AS total_html_bytes,
                   CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
            FROM b GROUP BY section
        """,
        "pages_lang_stats": f"""
            SELECT lang, count(*) AS n,
                   strftime(min(warc_ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
                   strftime(max(warc_ts), '%Y-%m-%d %H:%M:%S') AS last_ts
            FROM read_parquet('{_PAGES_001}')
            GROUP BY lang
        """,
        "kg_label_counts": f"""
            WITH m AS (
                SELECT subject AS name, subject_type AS label
                FROM read_parquet('{_TRUTH_001}')
                UNION ALL
                SELECT object, object_type FROM read_parquet('{_TRUTH_001}')
            ), k AS (
                SELECT name, label, {nname} AS norm_key FROM m
            ), g AS (
                SELECT norm_key, min(name || chr(31) || label) AS rep
                FROM k GROUP BY norm_key
            )
            SELECT split_part(rep, chr(31), 2) AS label, count(*) AS n
            FROM g GROUP BY 1
        """,
        "kg_rel_counts": f"""
            WITH e AS (
                SELECT DISTINCT {_eid_sql(nsub)} AS s, rel_type,
                       {_eid_sql(nobj)} AS d, coalesce(term, '') AS term_key
                FROM read_parquet('{_TRUTH_001}')
            )
            SELECT rel_type, count(*) AS n FROM e GROUP BY 1
        """,
        "rel_lineitem_agg": rel.Q_LINEITEM_AGG_SQL,
        "rel_segment_topk": rel.Q_SEGMENT_REVENUE_TOPK_SQL,
        "rel_brand_supplier": rel.Q_BRAND_SUPPLIER_STATS_SQL,
        "rel_events_hourly": rel.Q_EVENTS_HOURLY_SQL,
        "rel_orders_top": rel.Q_ORDERS_TOP_SQL,
        "rel_union_distinct": rel.Q_NATION_REGION_UNION_SQL,
        "rel_lineitem_rollup": rel.Q_LINEITEM_ROLLUP_SQL,
        "rel_events_pivot": rel.Q_EVENTS_PIVOT_SQL,
        "rel_events_coverage": rel.Q_EVENTS_COVERAGE_SQL,
        "rel_orders_no_lineitem": rel.Q_ORDERS_NO_LINEITEM_SQL,
        "rel_revenue_by_nation": rel.Q_REVENUE_BY_NATION_SQL,
        "rel_orders_running": rel.Q_ORDERS_RUNNING_SQL,
        "events_sessions": win.events_sessions_sql(),
        "events_sliding_window": win.events_sliding_window_sql(),
        "events_band_pairs": win.events_band_pairs_sql(),
        "events_asof_purchase": win.EVENTS_ASOF_PURCHASE_SQL,
        "events_anomaly": win.events_anomaly_sql(),
        "events_range_join": win.events_range_join_sql(),
        "events_funnel": win.events_funnel_sql(),
        "events_transitions": win.EVENTS_TRANSITIONS_SQL,
        "events_retention": win.EVENTS_RETENTION_SQL,
        "events_late_data": win.events_late_data_sql(),
        "docs_token_count": TOKEN_COUNT_SQL,
        "docs_token_pack": TOKEN_PACK_SQL,
        "docs_quality": QUALITY_SQL,
        "docs_top_tokens": top_tokens_sql(),
        "docs_length_quantiles": length_quantiles_sql(),
        "docs_len_quantiles_by_lang": grouped_length_quantiles_sql(),
        "docs_stratified_sample": docs_stratified_sample_sql(),
        "docs_split": docs_split_sql(),
        "docs_domain_budget": docs_domain_budget_sql(),
        "docs_weighted_sample": docs_weighted_sample_sql(),
        "docs_decontaminate": docs_decontaminate_sql(),
        "docs_distinct_kmv": distinct_tokens_kmv_sql(),
        "docs_kmv_by_lang": grouped_distinct_tokens_kmv_sql(),
        "docs_domain_reputation": DOMAIN_REP_SQL,
        "emb_bitext": BITEXT_SQL,
        "docs_lang_id": LANG_ID_SQL,
        "docs_lang_confusion": LANG_CONFUSION_SQL,
        "docs_fingerprint": FINGERPRINT_SQL,
        "docs_repetition": REPETITION_SQL,
        "docs_dup_ngrams": DUP_NGRAM_SQL,
        "docs_bpe_pairs": BPE_PAIRS_SQL,
        "docs_bpe_encode": BPE_ENCODE_SQL,
        "rel_profile": _profile_sql(
            "orders", ["o_orderkey", "o_custkey",
                       "o_orderstatus", "o_orderpriority"]),
        "docs_bpe_train": _bpe_train_sql(3),
        "docs_prefix_jaccard": PREFIX_JACCARD_SQL,
        "docs_dedup_eval": f"""
            WITH truth AS ({PREFIX_JACCARD_SQL}),
            found AS ({MINHASH_PAIRS_SQL}),
            hit AS (
                SELECT count(*) AS h FROM truth t
                JOIN found f ON f.a = t.doc_a AND f.b = t.doc_b
            ), c AS (
                SELECT (SELECT count(*) FROM truth) AS nt,
                       (SELECT count(*) FROM found) AS nf,
                       (SELECT h FROM hit) AS nh
            )
            SELECT 'minhash' AS method,
                   CAST(nt AS BIGINT) AS n_truth,
                   CAST(nf AS BIGINT) AS n_found,
                   CAST(nh AS BIGINT) AS n_hit,
                   CAST(CASE WHEN nf = 0 THEN 0
                        ELSE nh * 1000 // nf END AS BIGINT)
                       AS precision_milli,
                   CAST(CASE WHEN nt = 0 THEN 0
                        ELSE nh * 1000 // nt END AS BIGINT)
                       AS recall_milli
            FROM c
        """,
        "docs_salient_terms": salient_terms_sql(3),
        "docs_curation_filter": CURATION_FILTER_SQL,
        "docs_scrub": scrub_blocklist_sql(),
        "docs_unigram_logprob": UNIGRAM_LOGPROB_SQL,
        "docs_nb_lang": NB_LANG_SQL,
        "docs_ppl_bucket": PPL_BUCKET_SQL,
        "docs_exact_dedup": EXACT_DEDUP_SQL,
        "docs_segment_dedup": SEGMENT_DEDUP_SQL,
        "docs_importance": DOCS_IMPORTANCE_SQL,
        "docs_ngram_jaccard": NGRAM_JACCARD_SQL,
        # exact given the band recall guarantee (hamming <= 3 over 4
        # bands => one band equal by pigeonhole); the SQL mirrors the
        # banded candidate join + hamming verify bit-for-bit
        "docs_simhash_pairs": SIMHASH_PAIRS_SQL,
        # full replay of the sketch in SQL (FNV word hashes, polynomial
        # shingles, 64 affine permutations with numpy's uint64 wrap,
        # banded buckets incl. the cap/chain rule, est-Jaccard verify);
        # components add an exact reachability closure (min-label),
        # which the bounded-round Ray propagation converges to
        "docs_minhash_pairs": MINHASH_PAIRS_SQL,
        "docs_minhash_components": MINHASH_COMPONENTS_SQL,
        "docs_near_dedup_keep": NEAR_DEDUP_KEEP_SQL,
        "docs_hybrid_topk": DOC_HYBRID_SQL,
        "ann_topk": """
            SELECT e.vec_id,
                   round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS sim
            FROM embeddings e
            ORDER BY sim DESC, e.vec_id
            LIMIT 10
        """,
        # ann_ivf_topk: the IVF index query is deterministic end to end
        # too — centroids are a fixed-seed k-means replay (baked as
        # literals by _ivf_oracle_parts), a vector's partition is the
        # argmax-cosine centroid (lowest id on ties), the probed set is
        # a pure function of the query — so the SQL twin is the exact
        # cosine top-k restricted to the probed partitions.
        "ann_ivf_topk": _ivf_topk_sql(_ivf_oracle_parts(16, 4)),
        # emb_semdedup: the greedy within-cluster scan is a recursive
        # CTE over the same deterministic k-means replay — see
        # _semdedup_oracle_sql.
        "emb_semdedup": _semdedup_oracle_sql(0.95, 16),
        # ann_pq_topk: codebook replay + in-SQL encode + ADC LUT sum +
        # exact re-rank of the candidate head — see _pq_oracle_sql.
        "ann_pq_topk": _pq_oracle_sql(10, 50),
        # ann_recall: both tiers AND the truth sets in SQL, then the
        # integer intersection — see _ann_recall_oracle_sql.
        "ann_recall": _ann_recall_oracle_sql(10, 2, 4),
        # ann_ivf_update_topk: the update folds the second half in with
        # FROZEN centroids, so every vector's partition follows the
        # same first-half-trained assignment rule — same SQL twin,
        # first-half centroids.
        "ann_ivf_update_topk": _ivf_topk_sql(
            _ivf_oracle_parts(16, 4, first_half_only=True)),
        # ann_lsh_topk: like kg_vector_index_topk, the "approximate"
        # LSH index query is deterministic end to end — bucket =
        # hyperplane signs over the stored vectors, probed set a pure
        # function of the query — so its SQL twin is the exact cosine
        # top-k restricted to the probed buckets.
        "ann_lsh_topk": f"""
            WITH b AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                FROM embeddings
            ), bucketed AS (
                SELECT vec_id, e, {_lsh_bucket_sql("e", 8, 64)} AS bucket
                FROM b
            )
            SELECT vec_id,
                   round(list_cosine_similarity(e,
                       (SELECT CAST(embedding AS DOUBLE[])
                        FROM embeddings WHERE vec_id = 0)), 6) AS sim
            FROM bucketed
            WHERE bucket IN ({_ann_probed_buckets_sql(2)})
            ORDER BY sim DESC, vec_id
            LIMIT 10
        """,
        "ann_multi_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                FROM embeddings WHERE vec_id IN (0, 1, 2)
            ), s AS (
                SELECT q.query_id, e.vec_id,
                       round(list_cosine_similarity(
                           CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS sim
                FROM embeddings e CROSS JOIN q
            ), r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
                FROM s
            )
            SELECT query_id, vec_id, sim FROM r WHERE rn <= 10
        """,
        "ann_label_topk": """
            SELECT vec_id, label, sim FROM (
                SELECT vec_id, label,
                       round(list_cosine_similarity(
                           CAST(embedding AS DOUBLE[]),
                           (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) AS sim,
                       row_number() OVER (
                           PARTITION BY label
                           ORDER BY round(list_cosine_similarity(
                               CAST(embedding AS DOUBLE[]),
                               (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6) DESC,
                           vec_id) AS rn
                FROM embeddings
            ) WHERE rn <= 5
        """,
        # The LSH bucketing only narrows WHICH pairs are compared; the
        # kept pairs must equal the exact all-pairs result because every
        # planted copy shares its original's bucket (scaling preserves
        # hyperplane signs), so brute-force SQL is a valid oracle.
        "emb_near_dup": """
            WITH base AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                FROM embeddings
            ), aug AS (
                SELECT vec_id, emb FROM base
                UNION ALL
                SELECT vec_id + 1000000, list_transform(emb, x -> x * 2.0)
                FROM base
            )
            SELECT x.vec_id AS a, y.vec_id AS b,
                   round(list_cosine_similarity(x.emb, y.emb), 6) AS sim
            FROM aug x JOIN aug y ON x.vec_id < y.vec_id
            WHERE list_cosine_similarity(x.emb, y.emb) >= 0.95
            ORDER BY a, b
        """,
        # kg_embeddings / kg_vector_topk: the hash embedder is pure
        # integer math + exact float steps, replayed bit-for-bit by
        # hash_embedding_list_sql (stages/embed.py).
        "kg_embeddings": f"""
            WITH tr AS (
                -- distribution rows key the relation on the fixed
                -- HAS_INITIATIVE_COUNT rel_type (normalize.py:146),
                -- all other kinds on the raw predicate
                SELECT DISTINCT subject, object, subject_type, object_type,
                       CASE WHEN object_kind = 'distribution'
                            THEN rel_type ELSE predicate END AS relword
                FROM read_parquet('{_TRUTH_001}')
            ), keys AS (
                SELECT DISTINCT text_key FROM (
                    SELECT subject_type || ':' || subject AS text_key FROM tr
                    UNION
                    SELECT object_type || ':' || object FROM tr
                    UNION
                    SELECT subject || ' ' || relword || ' ' || object
                    FROM tr
                )
            ), emb AS (
                SELECT text_key, {_hash_emb_sql("text_key")} AS e
                FROM keys
            )
            SELECT text_key, r.i AS i, e[r.i + 1] AS val
            FROM emb CROSS JOIN range({_EMB_DIM}) r(i)
        """,
        "kg_vector_topk": _vector_topk_sql(nname, 10),
        # kg_vector_index_topk: the probed-bucket restriction is itself
        # deterministic (hyperplane signs over the exact hash-embedding
        # twin + a query bucket set that is a pure function of the
        # question), so the "approximate" index query has an EXACT SQL
        # twin: cosine top-k restricted to the probed buckets.
        "kg_vector_index_topk": f"""
            WITH m AS (
                SELECT subject AS name, subject_type AS label
                FROM read_parquet('{_TRUTH_001}')
                UNION ALL
                SELECT object, object_type FROM read_parquet('{_TRUTH_001}')
            ), k AS (
                SELECT name, label, {nname} AS norm_key FROM m
            ), g AS (
                SELECT norm_key, min(name || chr(31) || label) AS rep
                FROM k GROUP BY norm_key
            ), nodes_t AS (
                SELECT {_eid_sql('norm_key')} AS entity_id,
                       split_part(rep, chr(31), 2) AS label,
                       split_part(rep, chr(31), 1) AS name
                FROM g
            ), emb AS (
                SELECT entity_id, label, name,
                       {_hash_emb_sql("(label || ':' || name)")} AS e
                FROM nodes_t
            ), bucketed AS (
                SELECT entity_id, label, name, e,
                       {_lsh_bucket_sql("e")} AS bucket
                FROM emb
            ), scored AS (
                SELECT entity_id, label, name,
                       round(list_inner_product(e, {_qvec_sql()}) /
                             (CASE WHEN sqrt(list_inner_product(e, e)) = 0
                                   THEN 1.0
                                   ELSE sqrt(list_inner_product(e, e))
                              END), 6) AS score
                FROM bucketed
                WHERE bucket IN ({_probed_buckets_sql(2)})
            )
            SELECT entity_id, label, name, score FROM scored
            ORDER BY score DESC, entity_id
            LIMIT 10
        """,
        # mm_features / mm_resize / mm_frames: binary-codec
        # surfaces (payload bytes -> pixels) have no SQL form ->
        # rows-only, verified against exact pytest oracles instead;
        # kg_graphrag's formatting layer likewise stays rows-only while
        # every numeric channel feeding it is hash-checked above.
    }
