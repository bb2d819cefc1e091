"""Stage 6: edge aggregation (MERGE-equivalent upsert + source accumulation).

Reference semantics (``ingestMD.py:513-546``):

* edge identity = ``(subject node, rel_type, object node)``, extended by
  ``term`` for distribution edges (``apoc.merge.relationship(sub, label,
  {term}, {}, pl)``, ``ingestMD.py:614``);
* ``sources`` accumulates the distinct doc_ids that asserted the edge
  (append-if-absent, ``ingestMD.py:520-525``) — made deterministic here
  as the *sorted* distinct list (FIXTURES.md invariant 3);
* ``embedding``, ``source_text_full`` and ``count`` are last-write-wins
  in the reference (ingestion-order dependent); here "last" is the
  deterministic maximum of ``(doc_id, chunk_idx)`` over contributing
  mentions — documented divergence, invisible to set-level P/R.

Two-phase aggregation: a stateless ``map_batches`` partial pass folds
each batch down to one row per edge key (hub edges collapse before the
exchange — the skew mitigation), then a partition-wise vectorized merge
unions source lists and applies the deterministic-last rule.

The provenance snippet (``source_text``, <=1 KB) is the widest column
and its exchange strategy is size-dependent (``cfg.edge_text_exchange``):

* ``inline`` — ship the text through the edge exchange.  Fastest when
  the triples table is small: the extra distinct + join barriers of the
  ref path cost more than the text bytes (measured ~60% slower at
  sf0.1 scale).
* ``ref`` — ship a 16-hex content hash and join the distinct
  ``(src_ref, src_text)`` snippet table onto the winning edges.  Wins
  when text dominates the exchange (measured ~3x less exchanged bytes
  at 240k docs, where the inline exchange hit object-store pressure).
* ``auto`` (default) — ``ref`` iff the materialized input exceeds
  ``cfg.edge_ref_threshold_bytes``.
"""

from __future__ import annotations

import hashlib
import json
from typing import List, Optional

import pandas as pd
import pyarrow as pa

import ray.data

from neo4j_document_pipeline_ray.config import PipelineConfig

_EXCHANGE_COLS = ["src_id", "dst_id", "rel_type", "term", "object_kind",
                  "src_norm_key", "dst_norm_key", "sources_json", "source_text",
                  "count", "rel_key", "start", "end"]

# columns the edge aggregation actually consumes from the triples table —
# the pruned-read column set for stage B (snapshot.py reads exactly these)
EDGE_INPUT_COLS = ["src_id", "dst_id", "rel_type", "term", "object_kind",
                   "src_norm_key", "dst_norm_key", "src_text", "count",
                   "rel_key", "start", "end", "doc_id", "chunk_idx"]



def _merge_edges_df(df: pd.DataFrame, out_cols: List[str]) -> pd.DataFrame:
    """Vectorized merge of ALL edge groups in one frame.

    last-wins fields come from the max-``ord`` row per edge key;
    ``sources`` is the sorted union of the rows' doc-id lists.
    ``sources_json`` stays JSON-serialized until after the joins
    (Arrow's hash join cannot carry list-typed payload columns).
    """
    df = df.sort_values(["edge_key", "ord"], kind="mergesort")
    last = df.groupby("edge_key", sort=False).tail(1).set_index("edge_key")

    exploded = df[["edge_key"]].assign(src=df["sources_json"].map(json.loads)).explode("src")
    uniq = exploded.drop_duplicates().sort_values(["edge_key", "src"], kind="mergesort")
    srcs = uniq.groupby("edge_key", sort=False)["src"].agg(list).map(json.dumps)

    last = last.copy()
    last["sources_json"] = srcs
    return last.reset_index()[out_cols]


def _src_ref(text) -> str:
    if text is None:
        return ""
    return hashlib.blake2b(str(text).encode("utf-8"), digest_size=8).hexdigest()


def edge_key_of(batch: pa.Table) -> "pa.Array":
    """The edge identity key ``src|rel_type|dst|term`` (the MERGE key,
    ``ingestMD.py:513-546``) as a vectorized expression — shared by the
    partial pass and the incremental re-merge so a committed edge row
    reconstructs exactly the key its partials carried."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(
        pc.cast(batch["src_id"], pa.string()),
        # str(None) is "None" in the reference scalar path
        pc.coalesce(batch["rel_type"], pa.scalar("None")),
        pc.cast(batch["dst_id"], pa.string()),
        pc.coalesce(batch["term"], pa.scalar("")), "|")


def _partial_edges_batch(batch: pa.Table, keep_text: bool = True) -> pa.Table:
    """In-batch partial aggregation: one row per edge key leaves the
    batch, so hub edges collapse before the exchange.  With
    ``keep_text=False`` the 1 KB snippet is replaced by its hash.

    Pure-Arrow: sort by (edge_key, ord) then hash ``group_by`` with
    ``last`` aggregates implements last-wins, and ``distinct`` on
    doc_id collects the per-edge source set — measured ~3x less CPU
    than the equivalent pandas body (110 -> 40 ms per 4096-row batch),
    byte-identical output.  Only the tiny per-edge source-list JSON
    encode and the ``src_ref`` hashing stay in Python (#edges rows, not
    #triples)."""
    import pyarrow.compute as pc

    ek = edge_key_of(batch)
    ordc = pc.binary_join_element_wise(
        batch["doc_id"],
        pc.utf8_lpad(pc.cast(batch["chunk_idx"], pa.string()), 6, "0"), ":")
    b2 = batch.append_column("edge_key", ek).append_column("ord", ordc)
    b2 = b2.sort_by([("edge_key", "ascending"), ("ord", "ascending")])
    # skip_nulls=False: "last" must mean the max-ord ROW's value, nulls
    # included (pandas tail(1) semantics) — Arrow's default would take
    # the last NON-null, resurrecting overwritten fields
    _keep = pc.ScalarAggregateOptions(skip_nulls=False)
    agg = b2.group_by("edge_key", use_threads=False).aggregate(
        [("src_id", "last", _keep), ("dst_id", "last", _keep),
         ("rel_type", "last", _keep), ("term", "last", _keep),
         ("object_kind", "last", _keep),
         ("src_norm_key", "last", _keep), ("dst_norm_key", "last", _keep),
         ("src_text", "last", _keep), ("count", "last", _keep),
         ("rel_key", "last", _keep),
         ("start", "last", _keep), ("end", "last", _keep),
         ("ord", "last", _keep),
         ("doc_id", "distinct")])
    srcs = [json.dumps(sorted(x)) for x in agg["doc_id_distinct"].to_pylist()]
    cols = {
        "edge_key": agg["edge_key"],
        "src_id": agg["src_id_last"], "dst_id": agg["dst_id_last"],
        "rel_type": agg["rel_type_last"], "term": agg["term_last"],
        "object_kind": agg["object_kind_last"],
        "src_norm_key": agg["src_norm_key_last"],
        "dst_norm_key": agg["dst_norm_key_last"],
        "sources_json": pa.array(srcs, pa.string()),
        "count": agg["count_last"], "rel_key": agg["rel_key_last"],
        "start": agg["start_last"], "end": agg["end_last"],
        "ord": agg["ord_last"],
    }
    if keep_text:
        cols["source_text"] = agg["src_text_last"]
    else:
        cols["src_ref"] = pa.array(
            [_src_ref(x) for x in agg["src_text_last"].to_pylist()],
            pa.string())
    text_col = "source_text" if keep_text else "src_ref"
    order = (["edge_key"]
             + [c if c != "source_text" else text_col for c in _EXCHANGE_COLS]
             + ["ord"])
    return pa.table({k: cols[k] for k in order})


def _merge_edges_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Final merge of the partial rows of one hash partition (pandas
    reference implementation; the production path is the Arrow variant
    below, verified equivalent)."""
    text_col = "source_text" if "source_text" in df.columns else "src_ref"
    cols = [c if c != "source_text" else text_col for c in _EXCHANGE_COLS]
    return _merge_edges_df(df, cols)


def _merge_edges_partition_arrow(p: pa.Table, keep_ord: bool = False) -> pa.Table:
    """Arrow-native final merge of one hash partition: sort by
    (edge_key, ord) + ``last`` aggregates for the last-wins fields;
    the ``sources_json`` union explodes the JSON lists with string
    kernels (doc ids are hex — no JSON escapes), distincts
    (edge_key, doc) pairs, and re-joins per key.  Measured ~1.6x less
    CPU than the pandas body on a 116k-row partition with identical
    output (separator whitespace aside — consumers parse, not compare,
    the JSON).

    ``keep_ord=True`` carries the winning row's ``ord`` (the max
    ``doc_id:chunk_idx`` mention ordinal) into the output — persisted
    in the snapshot so a later INCREMENTAL merge of new-shard partials
    can re-apply the deterministic-last rule against the committed
    winner (the merge is associative only with the ordinal kept)."""
    import pyarrow.compute as pc

    text_col = "source_text" if "source_text" in p.schema.names else "src_ref"
    cols = [c if c != "source_text" else text_col for c in _EXCHANGE_COLS]
    if keep_ord:
        cols = cols + ["ord"]
    p = p.sort_by([("edge_key", "ascending"), ("ord", "ascending")])
    # row-wise last (see _partial_edges_batch): keep the winner's nulls
    _keep = pc.ScalarAggregateOptions(skip_nulls=False)
    agg = p.group_by("edge_key", use_threads=False).aggregate(
        [(c, "last", _keep) for c in cols if c != "sources_json"])
    # tolerate both '","' and '", "' separators (pandas-era partials)
    inner = pc.utf8_trim(
        pc.replace_substring(p["sources_json"], " ", ""), '[]"')
    lists = pc.split_pattern(inner, '","')
    flat = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    parent = pc.list_parent_indices(flat)
    ek = p["edge_key"]
    ek = ek.combine_chunks() if isinstance(ek, pa.ChunkedArray) else ek
    ex = pa.table({"edge_key": ek.take(parent), "s": flat.flatten()})
    ex = ex.group_by(["edge_key", "s"], use_threads=False).aggregate([])
    ex = ex.sort_by([("edge_key", "ascending"), ("s", "ascending")])
    g = ex.group_by("edge_key", use_threads=False).aggregate([("s", "list")])
    joined = pc.binary_join(g["s_list"], '","')
    n = len(g)
    sj = pc.binary_join_element_wise(
        pa.array(['["'] * n), joined, pa.array(['"]'] * n), "")
    g2 = pa.table({"edge_key": g["edge_key"], "sources_json": sj})
    merged = agg.join(g2, keys=["edge_key"])
    return pa.table({
        c: (merged["sources_json"] if c == "sources_json"
            else merged[f"{c}_last"])
        for c in cols
    })


def _prov_pairs_batch(batch: pa.Table, text_col: str = "src_text") -> pa.Table:
    """(src_ref, source_text) pairs, deduped within batch."""
    texts = batch[text_col].to_pylist()
    seen = {}
    for t in texts:
        if t is None:
            continue
        r = _src_ref(t)
        if r not in seen:
            seen[r] = t
    return pa.table({
        "src_ref": pa.array(list(seen.keys()), pa.string()),
        "source_text": pa.array(list(seen.values()), pa.string()),
    })


def _drop_ref_col(batch: pa.Table) -> pa.Table:
    return batch.select([n for n in batch.schema.names if n != "src_ref"])


def decode_sources_batch(batch: pa.Table) -> pa.Table:
    """sources_json -> sources list<string> (post-join restore)."""
    srcs = [json.loads(s) for s in batch["sources_json"].to_pylist()]
    idx = batch.schema.get_field_index("sources_json")
    return batch.set_column(idx, "sources_json", pa.array(srcs, pa.list_(pa.string()))).rename_columns(
        [n if n != "sources_json" else "sources" for n in batch.schema.names]
    )


def _use_ref_exchange(
    triples: "ray.data.Dataset", cfg: PipelineConfig,
    input_bytes: Optional[int] = None,
) -> bool:
    mode = cfg.edge_text_exchange
    if mode not in ("inline", "ref", "auto"):
        raise ValueError(
            f"edge_text_exchange must be 'inline', 'ref' or 'auto', got {mode!r}"
        )
    if mode in ("inline", "ref"):
        return mode == "ref"
    if input_bytes is not None:
        # caller-supplied estimate (parquet-footer uncompressed bytes) —
        # lets a LAZY input decide without materializing it
        return input_bytes > cfg.edge_ref_threshold_bytes
    from neo4j_document_pipeline_ray.stages.grouped import (
        plan_size_estimate,
    )

    est = plan_size_estimate(triples, source_ok=True)
    if est is not None:
        # zero-execution metadata estimate (exact for materialized /
        # read-rooted lineages) — size_bytes() on a lazy map lineage
        # would execute the whole plan just to measure it
        return est > cfg.edge_ref_threshold_bytes
    try:
        size = triples.size_bytes() or 0
    except Exception:
        size = 0
    return size > cfg.edge_ref_threshold_bytes


def build_edges(
    triples: "ray.data.Dataset",
    cfg: Optional[PipelineConfig] = None,
    prov_source: Optional["ray.data.Dataset"] = None,
    input_bytes: Optional[int] = None,
    keep_ord: bool = False,
) -> "ray.data.Dataset":
    """Doc-level triples -> aggregated edges table (with ``source_text``).

    ``triples`` may be LAZY (a pruned ``read_parquet``) — nothing here
    forces materialization.  Under the ``ref`` exchange the snippet
    table needs a second pass over ``src_text``; pass ``prov_source``
    (e.g. a pruned single-column re-read of the checkpointed triples
    parquet) so that pass doesn't re-execute the full ``triples`` plan.
    ``input_bytes`` feeds the ``auto`` exchange decision for lazy
    inputs (parquet-footer uncompressed size).  ``keep_ord`` keeps the
    winning mention ordinal per edge (see
    :func:`_merge_edges_partition_arrow`) for incremental re-merge.
    """
    import functools

    from neo4j_document_pipeline_ray.stages.grouped import (
        broadcast_join,
        distinct_by,
        partitioned_group_map,
    )

    cfg = cfg or PipelineConfig()
    use_ref = _use_ref_exchange(triples, cfg, input_bytes)
    keep_text = not use_ref
    # input_bytes is in parquet-FOOTER units (post-encoding); the
    # exchange gate wants in-memory bytes
    from neo4j_document_pipeline_ray.stages.grouped import FOOTER_TO_ARROW

    mem_hint = input_bytes * FOOTER_TO_ARROW if input_bytes else None
    partial = triples.map_batches(
        lambda t: _partial_edges_batch(t, keep_text=keep_text),
        batch_format="pyarrow", batch_size=cfg.agg_batch_size,
    )
    merged = partitioned_group_map(
        partial, "edge_key",
        functools.partial(_merge_edges_partition_arrow, keep_ord=keep_ord),
        num_partitions=None, batch_format="pyarrow", adaptive=True,
        # footer-bytes hint: a corpus-sized merge goes straight to the
        # sorted exchange (no materialize-to-measure copy) and gets a
        # size-derived partition count
        size_hint=mem_hint, partition_floor=cfg.shuffle_partitions,
    )
    if not use_ref:
        return merged
    prov = distinct_by(
        (prov_source if prov_source is not None else triples)
        .select_columns(["src_text"]).map_batches(
            _prov_pairs_batch, batch_format="pyarrow",
            batch_size=cfg.agg_batch_size,
        ),
        "src_ref",
        num_partitions=None, adaptive=True,
        # src_text dominates the triples payload, so the total input
        # estimate is a tight upper bound for the snippet exchange
        size_hint=mem_hint, partition_floor=cfg.join_partitions,
    )
    joined = broadcast_join(
        merged, prov, on=("src_ref",), join_type="left_outer",
        num_partitions=cfg.join_partitions,
    )
    return joined.map_batches(_drop_ref_col, batch_format="pyarrow")
