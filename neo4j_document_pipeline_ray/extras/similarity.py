"""Similarity search over embedding columns.

The reference serves vector search through Neo4j per-label cosine
vector indexes with a merged global top-k (``graphutil.py:364-391``);
here the same capability is a distributed scan:

  brute-force  broadcast the query matrix once (ray.put); every batch
               does one float64 matmul + a partial top-k; a tiny final
               sort/limit merges partials
  per-label    groupby(label).map_groups top-k (T1 analog)
  LSH-bucketed random-hyperplane sign buckets narrow the scan at scale
               (probing the query's bucket ± multiprobe neighbors)

Vectors travel as Arrow ``list<float>``; batches convert zero-copy-ish
to a contiguous ndarray per batch for the matmul.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _read_embeddings(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _batch_matrix(t: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = t[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    dim = len(arr[0])
    return flat.reshape(-1, dim)


def query_vector(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """Deterministic query: the embedding of a fixed vec_id."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    idx = tbl["vec_id"].to_pylist().index(vec_id)
    return np.asarray(tbl["embedding"][idx].as_py(), dtype=np.float64)


def brute_force_topk(
    embeddings: "ray.data.Dataset", query: np.ndarray, k: int = 10
) -> "ray.data.Dataset":
    """Exact cosine top-k: per-batch partial top-k, then a tiny global sort."""
    q_ref = ray.put(query)

    def score(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _batch_matrix(t)
        qn = q / np.linalg.norm(q)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((m @ qn) / norms, 6)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        if len(sims) > k:
            # partial top-k with the SAME tie-break as the global sort
            # (sim desc, vec_id asc) so boundary ties are kept correctly
            part = np.lexsort((ids, -sims))[:k]
            ids, sims = ids[part], sims[part]
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "sim": pa.array(sims, pa.float64()),
        })

    scored = embeddings.map_batches(score, batch_format="pyarrow")
    return scored.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


def label_topk(
    embeddings: "ray.data.Dataset", query: np.ndarray, k: int = 5
) -> "ray.data.Dataset":
    """Per-label cosine top-k — the reference's per-label vector indexes
    + merged results (``graphutil.py:364-391``) as a grouped operator."""
    q_ref = ray.put(query)

    def score(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _batch_matrix(t)
        qn = q / np.linalg.norm(q)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ qn) / norms
        return pa.table({
            "vec_id": t["vec_id"],
            "label": t["label"],
            "sim": pa.array(np.round(sims, 6), pa.float64()),
        })

    def topk_group(g):
        import pandas as pd

        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        return g

    scored = embeddings.map_batches(score, batch_format="pyarrow")
    return scored.groupby("label").map_groups(topk_group, batch_format="pandas")


# --- LSH-bucketed scan (the scale path) -----------------------------------

_N_PLANES = 8


def _planes(dim: int, n_planes: int = _N_PLANES) -> np.ndarray:
    return np.random.default_rng(0xA11CE).standard_normal((n_planes, dim))


def _bucket_of(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (m @ planes.T) > 0
    n = planes.shape[0]
    return (signs.astype(np.uint32) << np.arange(n, dtype=np.uint32)).sum(axis=1)


def lsh_topk(
    embeddings: "ray.data.Dataset",
    query: np.ndarray,
    k: int = 10,
    multiprobe: int = 1,
) -> "ray.data.Dataset":
    """Approximate top-k: only rows whose hyperplane-sign bucket is within
    ``multiprobe`` bit flips of the query's bucket are scored.  Recall
    is tested against brute force in the suite; at 100 TB the bucket
    column would be precomputed and partitioned on."""
    dim = len(query)
    planes = _planes(dim)
    qb = int(_bucket_of(query[None, :], planes)[0])
    probe = {qb}
    for r in range(multiprobe):
        for b in list(probe):
            for i in range(_N_PLANES):
                probe.add(b ^ (1 << i))
    probe_arr = sorted(probe)
    q_ref = ray.put(query)

    def score(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _batch_matrix(t)
        buckets = _bucket_of(m, planes)
        mask = np.isin(buckets, probe_arr)
        if not mask.any():
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        m = m[mask]
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)[mask]
        qn = q / np.linalg.norm(q)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ qn) / norms
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "sim": pa.array(np.round(sims, 6), pa.float64()),
        })

    scored = embeddings.map_batches(score, batch_format="pyarrow")
    return scored.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


def build_ann_index(
    embeddings: "ray.data.Dataset", index_dir: str, n_planes: int = _N_PLANES,
    id_col: str = "vec_id", emb_col: str = "embedding",
    payload_cols: tuple = (),
) -> dict:
    """Materialize the LSH index: embeddings written as parquet
    PARTITIONED by the hyperplane-sign bucket, so a query reads only its
    probed partitions — the role of the reference's persistent per-label
    vector indexes (``ingestMD.py:692-702``), expressed as data layout.

    ``payload_cols`` ride along in the index rows so a query can return
    them without a join back onto the source table (the graphrag node
    index carries label/name this way).  The planes are a pure function
    of ``(seed, dim, n_planes)``; the meta manifest records
    dim/n_planes/n_rows so queries re-derive them — ``n_planes`` here
    governs the actual bucketing, not just the metadata.

    The build is ATOMIC: rows land in a temp dir that is ``os.replace``d
    into place, so a crashed build never leaves a partial index that a
    cache-by-existence caller would silently use.
    """
    import json
    import shutil

    pay = tuple(payload_cols)

    def with_bucket(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, col=emb_col)
        planes = _planes(m.shape[1], n_planes)
        b = _bucket_of(m, planes).astype(np.int64)
        cols = {"vec_id": t[id_col]}
        for c in pay:
            cols[c] = t[c]
        cols["embedding"] = t[emb_col]
        return pa.table(cols).append_column(
            "bucket", pa.array(b, pa.int64()))

    first = embeddings.limit(1).take_all()
    dim = len(first[0][emb_col])
    tmp_dir = index_dir.rstrip("/") + ".tmp"
    for d in (tmp_dir, index_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
    ds = embeddings.map_batches(with_bucket, batch_format="pyarrow")
    ds.write_parquet(tmp_dir, partition_cols=["bucket"])
    meta = {"dim": dim, "n_planes": n_planes,
            "n_rows": _index_rows(tmp_dir), "payload_cols": list(pay)}
    with open(os.path.join(tmp_dir, "_meta.json"), "w") as f:
        json.dump(meta, f)
    os.replace(tmp_dir, index_dir)
    return meta


def _index_rows(index_dir: str) -> int:
    """Total indexed rows from parquet footers (no data read)."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(index_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def read_index_meta(index_dir: str) -> dict:
    import json

    with open(os.path.join(index_dir, "_meta.json")) as f:
        return json.load(f)


def _probe_buckets(query: np.ndarray, multiprobe: int,
                   n_planes: int = _N_PLANES) -> list:
    planes = _planes(len(query), n_planes)
    qb = int(_bucket_of(query[None, :], planes)[0])
    probe = {qb}
    for _ in range(multiprobe):
        for b in list(probe):
            for i in range(n_planes):
                probe.add(b ^ (1 << i))
    return sorted(probe)


def probe_partition_files(index_dir: str, query: np.ndarray,
                          multiprobe: int = 1) -> list:
    """Parquet files of the probed bucket partitions of a
    :func:`build_ann_index` layout (n_planes from the index's meta)."""
    meta = read_index_meta(index_dir)
    probe = set(_probe_buckets(query, multiprobe, meta["n_planes"]))
    return _partition_files(index_dir, "bucket", probe)


def _pruned_topk(files: list, query: np.ndarray, k: int) -> "ray.data.Dataset":
    """Exact cosine top-k over the given parquet files only: per-batch
    partial top-k with the global-sort tie-break (sim desc, vec_id asc),
    then a tiny final sort/limit.  Shared by the LSH and IVF index
    queries — the index layouts differ, the pruned scan does not."""
    if not files:
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }))
    q_ref = ray.put(query)

    def score(t: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _batch_matrix(t)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        qn = q / np.linalg.norm(q)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((m @ qn) / norms, 6)
        if len(sims) > k:
            part = np.lexsort((ids, -sims))[:k]  # global-sort tie-break
            ids, sims = ids[part], sims[part]
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "sim": pa.array(sims, pa.float64()),
        })

    scored = ray.data.read_parquet(files, columns=["vec_id", "embedding"]) \
        .map_batches(score, batch_format="pyarrow")
    return scored.sort(["sim", "vec_id"], descending=[True, False]).limit(k)


def _partition_files(index_dir: str, prefix: str, ids: set) -> list:
    """Parquet files of the ``<prefix>=<id>`` partitions in ``ids``."""
    files = []
    for name in sorted(os.listdir(index_dir)):
        if not name.startswith(prefix + "="):
            continue
        if int(name.split("=", 1)[1]) not in ids:
            continue
        d = os.path.join(index_dir, name)
        files.extend(
            sorted(os.path.join(d, f) for f in os.listdir(d)
                   if f.endswith(".parquet"))
        )
    return files


def _partition_scan_fraction(index_dir: str, prefix: str, ids: set) -> float:
    """Fraction of indexed rows the probed partitions hold (footers only)."""
    import pyarrow.parquet as pq

    total = read = 0
    for name in os.listdir(index_dir):
        if not name.startswith(prefix + "="):
            continue
        d = os.path.join(index_dir, name)
        rows = sum(
            pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
            for f in os.listdir(d) if f.endswith(".parquet")
        )
        total += rows
        if int(name.split("=", 1)[1]) in ids:
            read += rows
    return read / total if total else 0.0


def lsh_index_topk(
    index_dir: str,
    query: np.ndarray,
    k: int = 10,
    multiprobe: int = 1,
) -> "ray.data.Dataset":
    """Approximate top-k against a :func:`build_ann_index` layout: read
    ONLY the partitions of the probed buckets (multiprobe=1 probes 9 of
    256 — a few percent of rows leave storage), then score and merge
    partial top-ks.  Produces results identical to :func:`lsh_topk`
    with the same ``multiprobe`` (pinned in the suite), without the
    full scan."""
    files = probe_partition_files(index_dir, query, multiprobe)
    return _pruned_topk(files, query, k)


def index_scan_fraction(index_dir: str, query: np.ndarray,
                        multiprobe: int = 1) -> float:
    """Fraction of indexed rows a query would read (footer counts only)."""
    probe = set(_probe_buckets(
        query, multiprobe, read_index_meta(index_dir)["n_planes"]))
    return _partition_scan_fraction(index_dir, "bucket", probe)


# --- IVF (coarse-quantizer) index ------------------------------------------
#
# The second scale path the LSH layout doesn't cover: hyperplane signs
# ignore the data distribution, so clustered corpora waste probes on
# empty sign-buckets.  IVF trains a coarse quantizer (spherical k-means)
# on a bounded sample and partitions the index by nearest centroid —
# probing the ``nprobe`` centroids closest to the query reads only
# those partitions (FAISS's IndexIVFFlat layout, expressed as parquet
# partitioning; training on a bounded sample is standard IVF practice).


def train_ivf_centroids(
    sample: np.ndarray, n_centroids: int, iters: int = 5
) -> np.ndarray:
    """Deterministic spherical k-means: init = the first ``n_centroids``
    sample rows, fixed iteration count, ties to the lowest centroid id
    (argmax semantics).  The sample is normalized; empty centroids keep
    their previous position."""
    n = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    if len(n) < n_centroids:
        raise ValueError(f"need >= {n_centroids} training rows, got {len(n)}")
    c = n[:n_centroids].copy()
    for _ in range(iters):
        assign = (n @ c.T).argmax(axis=1)
        for j in range(n_centroids):  # k iterations, not row iterations
            sel = n[assign == j]
            if len(sel):
                v = sel.sum(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    c[j] = v / norm
    return c


def _hash_sample(embeddings: "ray.data.Dataset", id_col: str,
                 emb_col: str, train_rows: int) -> np.ndarray:
    """Deterministic unbiased training sample: keep rows whose stable
    id-hash falls under ``~1.5 * train_rows / n`` of the hash space
    (so a sorted or clustered input ordering cannot bias the
    centroids), then cap at ``train_rows``.  One cheap count + one
    filtered pass — build-time only."""
    import pandas as pd

    n = embeddings.count()
    if n <= train_rows:
        rows = embeddings.take_all()
        return np.asarray([r[emb_col] for r in rows], dtype=np.float64)

    threshold = min(1 << 32, int((1 << 32) * 1.5 * train_rows / n))

    def keep(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t[id_col].to_pandas(), index=False).to_numpy()
        return t.filter(pa.array((h % (1 << 32)) < threshold))

    rows = embeddings.map_batches(keep, batch_format="pyarrow") \
        .limit(train_rows).take_all()
    if len(rows) < train_rows // 4:  # pathological id distribution
        rows = embeddings.limit(train_rows).take_all()
    return np.asarray([r[emb_col] for r in rows], dtype=np.float64)


def build_ivf_index(
    embeddings: "ray.data.Dataset", index_dir: str,
    n_centroids: int = 16, iters: int = 5, train_rows: int = 4096,
    id_col: str = "vec_id", emb_col: str = "embedding",
    payload_cols: tuple = (),
) -> dict:
    """Materialize an IVF index: train centroids on a deterministic
    id-hash sample of ``train_rows`` rows (unbiased by input ordering —
    see :func:`_hash_sample`), then one assignment pass writes the
    embeddings as parquet PARTITIONED by nearest-centroid id.
    Centroids travel in ``_meta.json`` so a query re-ranks them without
    touching the data.  Build is atomic (temp dir + ``os.replace``),
    like :func:`build_ann_index`."""
    import json
    import shutil

    sample = _hash_sample(embeddings, id_col, emb_col, train_rows)
    cents = train_ivf_centroids(sample, n_centroids, iters)
    pay = tuple(payload_cols)

    def with_centroid(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, col=emb_col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        assign = ((m / norms[:, None]) @ cents.T).argmax(axis=1)
        cols = {"vec_id": t[id_col]}
        for c in pay:
            cols[c] = t[c]
        cols["embedding"] = t[emb_col]
        return pa.table(cols).append_column(
            "centroid", pa.array(assign.astype(np.int64), pa.int64()))

    tmp_dir = index_dir.rstrip("/") + ".tmp"
    for d in (tmp_dir, index_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
    embeddings.map_batches(with_centroid, batch_format="pyarrow") \
        .write_parquet(tmp_dir, partition_cols=["centroid"])
    meta = {
        "dim": int(cents.shape[1]), "n_centroids": n_centroids,
        "n_rows": _index_rows(tmp_dir), "payload_cols": list(pay),
        "centroids": cents.tolist(),
    }
    with open(os.path.join(tmp_dir, "_meta.json"), "w") as f:
        json.dump(meta, f)
    os.replace(tmp_dir, index_dir)
    return meta


def ivf_probe_centroids(index_dir: str, query: np.ndarray,
                        nprobe: int = 4) -> list:
    """The ``nprobe`` centroid ids nearest the query (cosine), from the
    index's own metadata."""
    meta = read_index_meta(index_dir)
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    q = query / max(np.linalg.norm(query), 1e-12)
    order = np.argsort(-(cents @ q), kind="stable")
    return [int(i) for i in order[:nprobe]]


def ivf_index_topk(
    index_dir: str, query: np.ndarray, k: int = 10, nprobe: int = 4
) -> "ray.data.Dataset":
    """Approximate top-k against a :func:`build_ivf_index` layout: exact
    cosine over ONLY the ``nprobe`` probed centroid partitions.  With
    ``nprobe = n_centroids`` this equals the brute-force scan exactly
    (pinned in the suite)."""
    probe = set(ivf_probe_centroids(index_dir, query, nprobe))
    return _pruned_topk(_partition_files(index_dir, "centroid", probe),
                        query, k)


def ivf_scan_fraction(index_dir: str, query: np.ndarray,
                      nprobe: int = 4) -> float:
    """Fraction of indexed rows an IVF query reads (footer counts only)."""
    probe = set(ivf_probe_centroids(index_dir, query, nprobe))
    return _partition_scan_fraction(index_dir, "centroid", probe)


def embedding_near_dup_pairs(
    embeddings: "ray.data.Dataset",
    threshold: float = 0.95,
    bucket_cap: int = 200,
) -> "ray.data.Dataset":
    """Embedding-cosine near-dup: bucket by hyperplane signs, pairwise
    cosine within buckets, keep pairs >= threshold.

    A bucket larger than ``bucket_cap`` is truncated to its
    ``bucket_cap`` lowest vec_ids before the O(n^2) compare (boilerplate
    embeddings can flood one bucket); every truncation is LOGGED with
    the dropped count — no silent cap."""
    def with_bucket(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t)
        planes = _planes(m.shape[1])
        return pa.table({
            "vec_id": t["vec_id"],
            "bucket": pa.array(_bucket_of(m, planes).astype(np.int64), pa.int64()),
            "embedding": t["embedding"],
        })

    bucketed = embeddings.map_batches(with_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(
        _make_bucket_pairs(threshold, bucket_cap), batch_format="pandas")


def _make_bucket_pairs(threshold: float, bucket_cap: int):
    """One LSH bucket -> thresholded cosine pairs (module-level so the
    cap-logging behavior is unit-testable outside a Ray worker)."""

    def bucket_pairs(g):
        import logging

        import pandas as pd

        g = g.sort_values("vec_id", kind="mergesort")
        ids = g["vec_id"].to_numpy()
        if len(ids) > bucket_cap:
            logging.getLogger(__name__).warning(
                "near-dup bucket %s truncated: %d of %d members dropped "
                "(bucket_cap=%d)", int(g["bucket"].iloc[0]),
                len(ids) - bucket_cap, len(ids), bucket_cap,
            )
        mat = np.stack(g["embedding"].to_numpy())[:bucket_cap].astype(np.float64)
        ids = ids[:bucket_cap]
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ mat.T) / np.outer(norms, norms)
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        iu, ju = iu[keep], ju[keep]
        return pd.DataFrame({
            "a": pd.Series(ids[iu], dtype="int64"),
            "b": pd.Series(ids[ju], dtype="int64"),
            "sim": np.round(sims[iu, ju], 6),
        })

    return bucket_pairs


# --- SemDeDup (semantic dedup via k-means clusters) -------------------------


def semdedup(
    embeddings: "ray.data.Dataset",
    threshold: float = 0.95,
    n_centroids: int = 16,
    iters: int = 5,
    train_rows: int = 4096,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = k-means over the embedding space, then
    within-cluster cosine near-dup removal — the published scale trick
    is exactly that clustering REPLACES the all-pairs compare
    (:func:`embedding_near_dup_pairs`'s LSH buckets catch near-copies;
    SemDeDup's learned clusters catch *semantic* duplicates that hash
    to different buckets).

    Deterministic end to end: centroids from
    :func:`train_ivf_centroids` on an id-hash sample (unbiased by
    input order), argmax-to-lowest-centroid assignment, then a greedy
    ascending-``vec_id`` scan per cluster — a row is DROPPED when its
    cosine to any already-kept row of its cluster exceeds
    ``threshold``.  The within-cluster scan is sequential by
    construction (that is the published algorithm); CLUSTERS are the
    parallel unit — each runs in a hash partition, and cluster sizes
    are what ``n_centroids`` bounds (size k ∝ corpus for a fixed
    average cluster size).

    Returns ``(vec_id, cluster, keep)`` for every input row.
    """
    import pandas as pd

    sample = _hash_sample(embeddings, id_col, emb_col, train_rows)
    cents = train_ivf_centroids(sample, n_centroids, iters)

    def assign(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, col=emb_col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        a = ((m / norms[:, None]) @ cents.T).argmax(axis=1)
        return pa.table({
            "vec_id": t[id_col],
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
            "embedding": t[emb_col],
        })

    assigned = embeddings.map_batches(assign, batch_format="pyarrow")

    def dedup_groups(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["cluster", "vec_id"], kind="mergesort")
        cl = df["cluster"].to_numpy()
        ids = df["vec_id"].to_numpy()
        mat = np.stack(df["embedding"].to_numpy()).astype(np.float64) \
            if len(df) else np.zeros((0, 1))
        keep = np.zeros(len(df), dtype=bool)
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        ends_ = np.r_[starts[1:], len(cl)]
        for s, e in zip(starts, ends_):
            u = mat[s:e]
            norms = np.linalg.norm(u, axis=1)
            norms[norms == 0] = 1.0
            u = u / norms[:, None]
            kept = np.empty_like(u)
            kn = 0
            for i in range(e - s):
                if kn == 0 or float((kept[:kn] @ u[i]).max()) <= threshold:
                    kept[kn] = u[i]
                    kn += 1
                    keep[s + i] = True
        return pd.DataFrame({
            "vec_id": pd.Series(ids, dtype="int64"),
            "cluster": pd.Series(cl, dtype="int64"),
            "keep": pd.Series(keep, dtype="bool"),
        })

    from neo4j_document_pipeline_ray.stages.grouped import (
        partitioned_group_map,
    )

    return partitioned_group_map(
        assigned, "cluster", dedup_groups, num_partitions=num_partitions)


def semdedup_reference(
    rows, threshold: float = 0.95, n_centroids: int = 16,
    iters: int = 5,
) -> dict:
    """Pure-Python/numpy replay (test oracle) over in-memory
    ``(vec_id, embedding)`` rows, training on ALL rows in the GIVEN
    order (callers pass corpora below ``train_rows``, where
    ``_hash_sample`` degenerates to the dataset order): vec_id ->
    (cluster, keep).  The greedy scan is ascending vec_id regardless
    of input order, like the distributed operator."""
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    mat = np.asarray([r[1] for r in rows], dtype=np.float64)
    cents = train_ivf_centroids(mat, n_centroids, iters)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    u = mat / norms[:, None]
    assign = (u @ cents.T).argmax(axis=1)
    out = {}
    kept_by_cluster: dict = {}
    for i in np.argsort(ids, kind="stable"):
        vid, c = int(ids[i]), int(assign[i])
        kept = kept_by_cluster.setdefault(c, [])
        if kept and max(float(k @ u[i]) for k in kept) > threshold:
            out[vid] = (c, False)
        else:
            kept.append(u[i])
            out[vid] = (c, True)
    return out


def query_matrix(sf_dir: str, vec_ids) -> "tuple":
    """Deterministic query batch: embeddings of fixed vec_ids, as
    (ids array, row-major matrix)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    pos = {v: i for i, v in enumerate(tbl["vec_id"].to_pylist())}
    rows = [np.asarray(tbl["embedding"][pos[v]].as_py(), dtype=np.float64)
            for v in vec_ids]
    return np.asarray(list(vec_ids), dtype=np.int64), np.vstack(rows)


def multi_query_topk(
    embeddings: "ray.data.Dataset",
    query_ids: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Exact cosine top-k for a BATCH of queries in one corpus pass —
    the production shape of brute-force ANN (a retrieval job scores a
    query log, not one vector).  The query matrix is ``ray.put`` once
    (one object-store copy per node); each batch is a single
    ``(batch x dim) @ (dim x q)`` matmul; per-(batch, query) partial
    top-k bounds the exchange at ``batches * q * k`` rows; the final
    per-query head runs in hash partitions.  Same rounded-float64
    kernel and (sim desc, vec_id) tie-break as :func:`brute_force_topk`.
    """
    q_norms = np.linalg.norm(queries, axis=1, keepdims=True)
    q_norms[q_norms == 0] = 1.0  # zero query -> 0 sims, like corpus rows
    qn = queries / q_norms
    q_ref = ray.put((np.asarray(query_ids, dtype=np.int64), qn.T.copy()))

    def score(t: pa.Table) -> pa.Table:
        qids, qt = ray.get(q_ref)
        m = _batch_matrix(t)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((m @ qt) / norms[:, None], 6)  # b x q
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        for j in range(sims.shape[1]):
            col = sims[:, j]
            if len(col) > k:
                part = np.lexsort((ids, -col))[:k]
            else:
                part = np.arange(len(col))
            out_q.append(np.full(len(part), qids[j], dtype=np.int64))
            out_v.append(ids[part])
            out_s.append(col[part])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64()),
        })

    from neo4j_document_pipeline_ray.stages.grouped import (
        partitioned_group_map,
    )

    partials = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        score, batch_format="pyarrow")

    def head_per_query(df):
        df = df.sort_values(["query_id", "sim", "vec_id"],
                            ascending=[True, False, True], kind="mergesort")
        return (df.groupby("query_id").head(k)
                  [["query_id", "vec_id", "sim"]])

    out = partitioned_group_map(
        partials, "query_id", head_per_query, num_partitions=num_partitions)
    return out.sort(["query_id", "sim", "vec_id"],
                    descending=[False, True, False])


# --- doc-level hybrid retrieval --------------------------------------------

DOC_QUERY_TOKENS = ("hash", "join", "table", "scan")


def doc_hybrid_topk(
    sf_dir: str,
    k: int = 10,
    alpha: float = 0.6,
    beta: float = 0.4,
    query_tokens: tuple = DOC_QUERY_TOKENS,
) -> "ray.data.Dataset":
    """Hybrid document retrieval — the corpus-level analog of the KG
    query layer's vector+keyword blend (``graphrag.hybrid_candidates``):
    Lucene-default BM25 (k1=1.2, b=0.75) over the document TEXT plus
    embedding cosine against the fixed query vector (vec_id 0), blended
    ``alpha * bm25 + beta * cosine``, top-k by blend.

    Scale shape: one tiny stats pass (per-batch partials for N, total
    doc length, per-term df — a handful of scalars reach the driver and
    ride into the scoring closure), then ONE streaming scoring pass over
    docs joined to their embeddings (size-gated broadcast), per-batch
    partial top-k, small global sort.  The float expression tree is
    mirrored operation-for-operation by ``DOC_HYBRID_SQL`` so the
    rounded doubles hash-match (same discipline as the KG BM25 oracle,
    ``__ray_entry__._bm25_topk_sql``).

    Returns ``(doc_id, bm25, cos_sim, hybrid)``.
    """
    import os as _os

    from neo4j_document_pipeline_ray.stages.grouped import broadcast_join

    docs = ray.data.read_parquet(
        _os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    emb = ray.data.read_parquet(
        _os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"])
    q = query_vector(sf_dir)

    # ---- stats pass: N, sum(dl), df per query term (scalars only) ----
    def stats_batch(t: pa.Table) -> pa.Table:
        n, sum_dl = 0, 0
        df = [0] * len(query_tokens)
        for text in t["text"].to_pylist():
            toks = (text or "").lower().split()
            n += 1
            sum_dl += len(toks)
            tokset = set(toks)
            for i, qt in enumerate(query_tokens):
                if qt in tokset:
                    df[i] += 1
        cols = {"n": [n], "sum_dl": [sum_dl]}
        cols.update({f"df_{i}": [df[i]] for i in range(len(df))})
        return pa.table({kk: pa.array(vv, pa.int64())
                         for kk, vv in cols.items()})

    parts = docs.map_batches(stats_batch, batch_format="pyarrow").take_all()
    n_docs = float(sum(p["n"] for p in parts))
    avgdl = float(sum(p["sum_dl"] for p in parts)) / n_docs
    dfs = [float(sum(p[f"df_{i}"] for p in parts))
           for i in range(len(query_tokens))]

    # ---- two streaming channel passes (each emits a narrow scalar
    # table — pyarrow's hash join cannot carry list columns as payload,
    # and the embedding lists must not ride an exchange anyway) ----
    qn = q / np.linalg.norm(q)

    def bm25_batch(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        bm25 = np.empty(len(ids), dtype=np.float64)
        for r, text in enumerate(t["text"].to_pylist()):
            toks = (text or "").lower().split()
            dl = float(len(toks))
            denom_norm = 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)
            score = 0.0
            for i, qt in enumerate(query_tokens):  # fixed term order
                tf = float(toks.count(qt))
                if tf > 0:
                    idf = np.log(1.0 + (n_docs - dfs[i] + 0.5)
                                 / (dfs[i] + 0.5))
                    score = score + idf * (tf * (1.2 + 1.0)) / (tf + denom_norm)
            bm25[r] = score
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "bm25_raw": pa.array(bm25, pa.float64()),
        })

    def cos_batch(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        cos = m @ qn / norms
        return pa.table({
            "vec_id": t["vec_id"],
            "cos_raw": pa.array(cos, pa.float64()),
        })

    bm = docs.map_batches(bm25_batch, batch_format="pyarrow")
    cs = emb.map_batches(cos_batch, batch_format="pyarrow")
    joined = broadcast_join(bm, cs, on=("doc_id",), right_on=("vec_id",),
                            join_type="inner", num_partitions=None)

    def blend_batch(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"].to_pylist(), dtype=np.int64)
        bm25 = t["bm25_raw"].to_numpy(zero_copy_only=False)
        cos = t["cos_raw"].to_numpy(zero_copy_only=False)
        hybrid = np.round(alpha * bm25 + beta * cos, 6)
        bm25_r = np.round(bm25, 6)
        cos_r = np.round(cos, 6)
        if len(ids) > k:  # same tie-break as the global sort
            part = np.lexsort((ids, -hybrid))[:k]
            ids, bm25_r, cos_r, hybrid = (
                ids[part], bm25_r[part], cos_r[part], hybrid[part])
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "bm25": pa.array(bm25_r, pa.float64()),
            "cos_sim": pa.array(cos_r, pa.float64()),
            "hybrid": pa.array(hybrid, pa.float64()),
        })

    scored = joined.map_batches(blend_batch, batch_format="pyarrow")
    return scored.sort(["hybrid", "doc_id"],
                       descending=[True, False]).limit(k)


def doc_hybrid_sql(k: int = 10, alpha: float = 0.6, beta: float = 0.4,
                   query_tokens: tuple = DOC_QUERY_TOKENS) -> str:
    """DuckDB mirror of :func:`doc_hybrid_topk` — the BM25 expression
    tree written operation-for-operation (compound literals like
    ``1.2 + 1.0`` kept verbatim, terms summed left-associatively in
    query order) over the same tokenization (``lower`` + whitespace
    split)."""
    df_cols = ", ".join(
        f"(SELECT count(*) FROM c WHERE list_contains(toks, '{qt}'))*1.0"
        f" AS df_{i}"
        for i, qt in enumerate(query_tokens))
    norm = "1.2 * (1.0 - 0.75 + 0.75 * len(toks) / st.avgdl)"
    score = "0.0"
    for i, qt in enumerate(query_tokens):
        tf = f"len(list_filter(toks, x -> x = '{qt}'))"
        idf = f"ln(1.0 + (st.n - st.df_{i} + 0.5) / (st.df_{i} + 0.5))"
        score = (f"({score}) + (CASE WHEN {tf} > 0 THEN {idf} * "
                 f"({tf} * (1.2 + 1.0)) / ({tf} + {norm}) ELSE 0.0 END)")
    return f"""
        WITH c AS (
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                        ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
                   END AS toks
            FROM documents
        ), st AS (
            SELECT count(*)*1.0 AS n,
                   sum(len(toks))*1.0 / (count(*)*1.0) AS avgdl,
                   {df_cols}
            FROM c
        ), s AS (
            SELECT c.doc_id,
                   {score} AS bm25_raw,
                   list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       (SELECT CAST(embedding AS DOUBLE[])
                        FROM embeddings WHERE vec_id = 0)) AS cos_raw
            FROM c
            JOIN embeddings e ON e.vec_id = c.doc_id
            CROSS JOIN st
        )
        SELECT doc_id,
               round(bm25_raw, 6) AS bm25,
               round(cos_raw, 6) AS cos_sim,
               round({alpha} * bm25_raw + {beta} * cos_raw, 6) AS hybrid
        FROM s
        ORDER BY hybrid DESC, doc_id
        LIMIT {k}"""


DOC_HYBRID_SQL = doc_hybrid_sql()


# --- bitext-style cross-label mining (ratio-test margin) --------------------

BITEXT_MAX_SRC_BYTES = 256 << 20  # same rationale as BROADCAST_MAX_BYTES


def bitext_mine(
    embeddings: "ray.data.Dataset",
    src_label: int = 0,
    dst_label: int = 1,
    num_partitions: "int | None" = None,
) -> "ray.data.Dataset":
    """Cross-label translation-pair mining (the LASER/CCMatrix shape,
    Artetxe & Schwenk 2019): for every vector of ``src_label``, the
    best match among ``dst_label`` vectors with a RATIO-TEST margin
    ``sim_best / sim_second`` — the score that separates true
    translations from hubness artifacts, which raw cosine can't.

    Scale shape: the source side is packed into one normalized query
    matrix IN A WORKER (``to_arrow_refs`` -> remote concat, no driver
    data path) and broadcast once; the destination side STREAMS through
    one matmul per batch with per-(batch, query) top-2 partials, then a
    per-query head in hash partitions — one pass over the big side per
    source shard, exactly :func:`multi_query_topk`'s query-log shape.
    A source shard above ``BITEXT_MAX_SRC_BYTES`` is rejected with
    guidance (mine per source shard; the index path is IVF/LSH).

    Margin convention (mirrored in the oracle): second candidate
    missing or with sim <= 0 -> margin 0.0; all floats rounded to 6
    before comparison like every ANN kernel here.
    """
    import ray

    from neo4j_document_pipeline_ray.stages.grouped import (
        drop_empty_blocks,
        partitioned_group_map,
    )

    def has_label(lbl):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["label"], lbl))

        return fn

    src = drop_empty_blocks(
        embeddings.select_columns(["vec_id", "embedding", "label"])
        .map_batches(has_label(src_label), batch_format="pyarrow")
        .drop_columns(["label"])).materialize()
    size = src.size_bytes() or 0
    if size > BITEXT_MAX_SRC_BYTES:
        raise ValueError(
            f"bitext source side is {size} bytes "
            f"(> {BITEXT_MAX_SRC_BYTES}); mine per source shard — this "
            "operator broadcasts the source matrix once per shard")

    @ray.remote(num_cpus=0)
    def _pack(*tables):
        ts = [t for t in tables if t.num_rows]
        if not ts:
            return np.zeros(0, dtype=np.int64), np.zeros((0, 0))
        t = pa.concat_tables(ts)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        m = _batch_matrix(t)
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return ids, (m / n).T.copy()

    q_ref = _pack.remote(*src.to_arrow_refs())

    def score(t: pa.Table) -> pa.Table:
        qids, qt = ray.get(q_ref)
        t = t.filter(pc.equal(t["label"], dst_label))
        if t.num_rows == 0 or len(qids) == 0:
            return pa.table({
                "src_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            })
        m = _batch_matrix(t)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((m @ qt) / norms[:, None], 6)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        out_q, out_v, out_s = [], [], []
        for j in range(sims.shape[1]):
            col = sims[:, j]
            part = (np.lexsort((ids, -col))[:2] if len(col) > 2
                    else np.arange(len(col)))
            out_q.append(np.full(len(part), qids[j], dtype=np.int64))
            out_v.append(ids[part])
            out_s.append(col[part])
        return pa.table({
            "src_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "sim": pa.array(np.concatenate(out_s), pa.float64()),
        })

    partials = embeddings.select_columns(
        ["vec_id", "embedding", "label"]).map_batches(
        score, batch_format="pyarrow")

    def finish(df):
        import pandas as pd

        df = df.sort_values(["src_id", "sim", "vec_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
        top = df.groupby("src_id", sort=True).head(2)
        rows = []
        for src_id, g in top.groupby("src_id", sort=True):
            best = g.iloc[0]
            margin = 0.0
            if len(g) > 1 and g.iloc[1]["sim"] > 0:
                margin = round(float(best["sim"]) / float(g.iloc[1]["sim"]),
                               6)
            rows.append((src_id, int(best["vec_id"]),
                         float(best["sim"]), margin))
        return pd.DataFrame(rows, columns=["src_id", "dst_id", "sim",
                                           "margin"])

    return partitioned_group_map(partials, "src_id", finish,
                                 num_partitions=num_partitions)


def bitext_sql(src_label: int = 0, dst_label: int = 1) -> str:
    return f"""
    WITH s AS (
        SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS se
        FROM embeddings WHERE label = {src_label}
    ), d AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de
        FROM embeddings WHERE label = {dst_label}
    ), x AS (
        SELECT s.src_id, d.vec_id,
               round(list_cosine_similarity(d.de, s.se), 6) AS sim
        FROM s CROSS JOIN d
    ), r AS (
        SELECT *, row_number() OVER (
            PARTITION BY src_id ORDER BY sim DESC, vec_id) AS rn
        FROM x
    )
    SELECT a.src_id, a.vec_id AS dst_id, a.sim,
           CASE WHEN b.sim IS NULL OR b.sim <= 0 THEN 0.0
                ELSE round(a.sim / b.sim, 6) END AS margin
    FROM r a LEFT JOIN r b ON b.src_id = a.src_id AND b.rn = 2
    WHERE a.rn = 1
    """


BITEXT_SQL = bitext_sql()


# --- product quantization (PQ) --------------------------------------------

PQ_M = 8    # subspaces; dim must be divisible by M
PQ_K = 16   # codes per subspace (one uint8 column each)


def train_pq_codebooks(sample: np.ndarray, m: int = PQ_M,
                       ks: int = PQ_K, iters: int = 5) -> np.ndarray:
    """Deterministic per-subspace L2 k-means (Jégou et al., TPAMI'11):
    split the dim into ``m`` contiguous blocks; per block, init = the
    first ``ks`` sample rows, fixed iteration count, ties to the
    lowest code id (argmin semantics), empty codes keep their previous
    position.  Returns ``(m, ks, dim//m)`` float64 codebooks."""
    n, dim = sample.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if n < ks:
        raise ValueError(f"need >= {ks} training rows, got {n}")
    sub = dim // m
    books = np.empty((m, ks, sub), dtype=np.float64)
    for j in range(m):
        x = sample[:, j * sub:(j + 1) * sub]
        c = x[:ks].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=-1)
            assign = d2.argmin(axis=1)
            for q in range(ks):  # ks iterations, not row iterations
                sel = x[assign == q]
                if len(sel):
                    c[q] = sel.mean(axis=0)
        books[j] = c
    return books


def pq_encode(m_matrix: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Vectorized encoder: per subspace, argmin L2 against that
    subspace's codebook.  Returns ``(n, m)`` uint8 codes."""
    n = len(m_matrix)
    m, ks, sub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        x = m_matrix[:, j * sub:(j + 1) * sub]
        # |x - c|^2 = |x|^2 - 2 x.c + |c|^2; |x|^2 is per-row constant
        d = -2.0 * (x @ books[j].T) + (books[j] ** 2).sum(axis=1)[None, :]
        codes[:, j] = d.argmin(axis=1).astype(np.uint8)
    return codes


def build_pq_index(
    embeddings: "ray.data.Dataset", index_dir: str,
    m: int = PQ_M, ks: int = PQ_K, iters: int = 5,
    train_rows: int = 4096,
    id_col: str = "vec_id", emb_col: str = "embedding",
) -> dict:
    """Materialize a PQ code table: train per-subspace codebooks on
    the deterministic id-hash sample, then one encode pass writes
    ``(vec_id, c0..c{m-1})`` uint8 columns — dim*4 / m bytes per
    vector of compression (32x at dim 64, m 8), the memory-bound ANN
    layout for corpora whose raw vectors cannot be held or scanned.
    Codebooks travel in ``_meta.json``; build is atomic like
    :func:`build_ivf_index`."""
    import json
    import shutil

    sample = _hash_sample(embeddings, id_col, emb_col, train_rows)
    books = train_pq_codebooks(sample, m, ks, iters)

    def encode(t: pa.Table) -> pa.Table:
        mat = _batch_matrix(t, col=emb_col)
        codes = pq_encode(mat, books)
        cols = {"vec_id": t[id_col]}
        for j in range(m):
            cols[f"c{j}"] = pa.array(codes[:, j], pa.uint8())
        return pa.table(cols)

    tmp_dir = index_dir.rstrip("/") + ".tmp"
    for d in (tmp_dir, index_dir):
        if os.path.isdir(d):
            shutil.rmtree(d)
    embeddings.map_batches(encode, batch_format="pyarrow") \
        .write_parquet(tmp_dir)
    meta = {
        "dim": int(books.shape[0] * books.shape[2]), "m": m, "ks": ks,
        "n_rows": _index_rows(tmp_dir),
        "codebooks": books.tolist(),
    }
    with open(os.path.join(tmp_dir, "_meta.json"), "w") as f:
        json.dump(meta, f)
    os.replace(tmp_dir, index_dir)
    return meta


def pq_topk(index_dir: str, query: np.ndarray, k: int = 10,
            rerank: int = 0,
            embeddings: "ray.data.Dataset | None" = None
            ) -> "ray.data.Dataset":
    """Approximate cosine top-k by asymmetric distance over the PQ
    code table: per subspace a ``ks``-entry LUT of inner products and
    of code norms (subspace blocks are orthogonal, so the
    reconstruction's norm is EXACT from the per-code norms); per batch
    the score is two uint8 gathers + a sum — the raw vectors are never
    read.  With ``rerank > 0`` the top ``rerank`` PQ candidates are
    re-scored exactly against ``embeddings`` (pruned ``is_in``
    filter), the standard ADC + re-rank serving shape."""
    import json

    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    books = np.asarray(meta["codebooks"], dtype=np.float64)
    m, ks, sub = books.shape
    qn = query / max(np.linalg.norm(query), 1e-12)
    # LUTs: ip[j, q] = q-block . code, n2[j, q] = |code|^2
    lut_ip = np.stack([books[j] @ qn[j * sub:(j + 1) * sub]
                       for j in range(m)])
    lut_n2 = (books ** 2).sum(axis=-1)
    n_cand = max(k, rerank)
    lut_ref = ray.put((lut_ip, lut_n2))

    def score(t: pa.Table) -> pa.Table:
        ip_t, n2_t = ray.get(lut_ref)
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        ip = np.zeros(len(ids), dtype=np.float64)
        n2 = np.zeros(len(ids), dtype=np.float64)
        for j in range(m):
            c = t[f"c{j}"].to_numpy(zero_copy_only=False)
            ip += ip_t[j][c]
            n2 += n2_t[j][c]
        sims = np.round(ip / np.sqrt(np.maximum(n2, 1e-24)), 6)
        if len(sims) > n_cand:
            part = np.lexsort((ids, -sims))[:n_cand]
            ids, sims = ids[part], sims[part]
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "sim": pa.array(sims, pa.float64()),
        })

    cand = ray.data.read_parquet(index_dir) \
        .map_batches(score, batch_format="pyarrow") \
        .sort(["sim", "vec_id"], descending=[True, False]).limit(n_cand)
    if not rerank:
        return cand.limit(k)

    # k-sized candidate head -> exact re-rank over a pruned filter
    ids = [r["vec_id"] for r in cand.take_all()]
    keep = pa.array(sorted(ids), pa.int64())

    def exact(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.is_in(t["vec_id"], keep))
        if not sel.num_rows:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        mat = _batch_matrix(sel)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = np.round((mat @ qn) / norms, 6)
        return pa.table({
            "vec_id": sel["vec_id"],
            "sim": pa.array(sims, pa.float64()),
        })

    return embeddings.map_batches(exact, batch_format="pyarrow") \
        .sort(["sim", "vec_id"], descending=[True, False]).limit(k)


def pq_bytes_per_vector(meta: dict) -> tuple:
    """(pq_bytes, raw_bytes) per vector — the compression the code
    table buys over scanning float32 embeddings."""
    return meta["m"], meta["dim"] * 4


def update_ivf_index(
    embeddings_new: "ray.data.Dataset", index_dir: str,
    id_col: str = "vec_id", emb_col: str = "embedding",
) -> dict:
    """Fold NEW vectors into an existing IVF index WITHOUT retraining:
    assign against the frozen centroids from ``_meta.json`` and append
    per-partition parquet files — the standard serving-index
    maintenance shape (appends keep the layout queryable between the
    periodic rebuilds that absorb centroid drift; recall degrades only
    as the data distribution drifts from the frozen codebook).

    Crash behavior: the assignment pass writes to a temp dir, files
    are then moved per-partition (each move atomic); a crash mid-move
    leaves a queryable index containing a prefix of the new vectors,
    and meta's ``n_rows`` is recomputed from footers on the next
    update.  The probe path lists partition files dynamically, so
    queries need no meta bump to see appended data."""
    import json
    import shutil

    meta = read_index_meta(index_dir)
    cents = np.asarray(meta["centroids"], dtype=np.float64)
    pay = tuple(meta.get("payload_cols", ()))

    def with_centroid(t: pa.Table) -> pa.Table:
        m = _batch_matrix(t, col=emb_col)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        assign = ((m / norms[:, None]) @ cents.T).argmax(axis=1)
        cols = {"vec_id": t[id_col]}
        for c in pay:
            cols[c] = t[c]
        cols["embedding"] = t[emb_col]
        return pa.table(cols).append_column(
            "centroid", pa.array(assign.astype(np.int64), pa.int64()))

    tmp_dir = index_dir.rstrip("/") + ".update.tmp"
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    embeddings_new.map_batches(with_centroid, batch_format="pyarrow") \
        .write_parquet(tmp_dir, partition_cols=["centroid"])
    for part in sorted(os.listdir(tmp_dir)):
        src = os.path.join(tmp_dir, part)
        if not os.path.isdir(src):
            continue
        dst = os.path.join(index_dir, part)
        os.makedirs(dst, exist_ok=True)
        for f in sorted(os.listdir(src)):
            os.replace(os.path.join(src, f),
                       os.path.join(dst, f"upd-{f}"))
    shutil.rmtree(tmp_dir)
    meta["n_rows"] = _index_rows(index_dir)
    tmp_meta = os.path.join(index_dir, "_meta.json.tmp")
    with open(tmp_meta, "w") as f:
        json.dump(meta, f)
    os.replace(tmp_meta, os.path.join(index_dir, "_meta.json"))
    return meta


# --- ANN recall eval --------------------------------------------------------


def ann_recall_report(
    embeddings: "ray.data.Dataset",
    lsh_dir: str,
    ivf_dir: str,
    query_ids: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    multiprobe: int = 2,
    nprobe: int = 4,
) -> "ray.data.Dataset":
    """Recall@k of the approximate serving tiers against the exact
    scan, per query — the "measure, don't guess" audit an index owner
    runs after every (re)build: LSH (``multiprobe`` buckets) and IVF
    (``nprobe`` centroid partitions) results intersected with the
    brute-force truth set.

    Cost shape: ONE full corpus pass for the whole query batch (the
    :func:`multi_query_topk` matmul path), then per query two pruned
    index reads (a few percent of rows each).  Everything the driver
    touches is k-sized.  Deterministic end to end (deterministic
    indexes, rounded-float64 kernels, fixed tie-breaks), so the milli
    recalls are stable artifacts, not noisy estimates.

    Returns ``(method, query_id, n_hit, recall_milli)``, one row per
    (index tier, query).
    """
    from neo4j_document_pipeline_ray.extras.similarity import (
        ivf_index_topk,
        lsh_index_topk,
        multi_query_topk,
    )

    qids = np.asarray(query_ids, dtype=np.int64)
    truth = multi_query_topk(embeddings, qids, queries, k=k).take_all()
    truth_sets: dict = {}
    for r in truth:
        truth_sets.setdefault(int(r["query_id"]), set()).add(
            int(r["vec_id"]))

    methods, out_q, hits, recall = [], [], [], []
    for name, fn in (
        ("lsh", lambda q: lsh_index_topk(
            lsh_dir, q, k=k, multiprobe=multiprobe)),
        ("ivf", lambda q: ivf_index_topk(
            ivf_dir, q, k=k, nprobe=nprobe)),
    ):
        for j, qid in enumerate(qids):
            got = {int(r["vec_id"]) for r in fn(queries[j]).take_all()}
            want = truth_sets.get(int(qid), set())
            n_hit = len(got & want)
            methods.append(name)
            out_q.append(int(qid))
            hits.append(n_hit)
            recall.append(n_hit * 1000 // max(len(want), 1))

    return ray.data.from_arrow(pa.table({
        "method": pa.array(methods, pa.string()),
        "query_id": pa.array(out_q, pa.int64()),
        "n_hit": pa.array(hits, pa.int64()),
        "recall_milli": pa.array(recall, pa.int64()),
    }))
