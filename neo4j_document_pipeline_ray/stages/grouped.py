"""Partition-wise grouped execution.

``Dataset.groupby(key).map_groups(fn)`` invokes Python once per group —
prohibitive when there are hundreds of thousands of tiny groups (edge
keys, LSH buckets).  This helper keeps the same co-location guarantee
with two orders of magnitude less call overhead:

1. a vectorized ``map_batches`` adds ``_pk = hash(key) % P``;
2. ``groupby(_pk).map_groups`` runs the user's *partition* function —
   a vectorized pandas body that processes ALL groups of one partition
   at once (every group is complete within its partition because the
   partition key is a pure function of the group key).

The hash is ``pandas.util.hash_pandas_object`` with its fixed default
key — deterministic across processes and runs, so output content does
not depend on P or the partitioning.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


#: adaptive fast-path ceiling: exchanges whose WHOLE input fits under
#: this run as ONE merge task instead of an all-to-all sort (Ray 2.49's
#: sort-based groupby costs seconds of fixed overhead per exchange at
#: 32 CPUs — measured 7.4 s for a 4.5k-row group map).  64 MB keeps the
#: single task trivially cheap while any real corpus-scale exchange
#: falls through to the sort path.
SMALL_EXCHANGE_BYTES = 64 << 20

#: size-derived partitioning: one hash partition per this many input
#: bytes (a partition must fit one reducer's heap with headroom — every
#: group of one ``_pk`` is processed by a single ``map_groups`` call).
TARGET_PARTITION_BYTES = 256 << 20

#: floor when nothing is known about the input size — the historical
#: fixed default, so sandbox-scale behavior is unchanged.
DEFAULT_PARTITION_FLOOR = 16

#: parquet-footer ``total_byte_size`` is AFTER dictionary/RLE encoding,
#: not decoded size: measured on the sf0.1 triples table, in-memory
#: Arrow is 5.2-7.5x the footer sum.  Callers whose size evidence is
#: footer bytes multiply by this (conservatively low) factor before
#: passing ``size_hint``, which is in estimated IN-MEMORY bytes.
FOOTER_TO_ARROW = 4


def plan_size_estimate(ds: "ray.data.Dataset", source_ok: bool = False):
    """Zero-execution byte-size estimate of a dataset.

    Exact (no Ray job runs) when the lineage root already knows its
    size — a ``read_parquet`` (parquet-footer estimate) or an
    already-materialized dataset (block metadata).  Returns ``None``
    when intermediate map stages hide the size, unless ``source_ok``:
    then the lineage is walked to its source op(s) and THEIR estimate
    is returned as a rough proxy (valid for roughly size-preserving or
    shrinking pipelines — partial aggregation, column projection)."""
    try:
        m = ds._logical_plan.dag.infer_metadata()
        if m.size_bytes is not None:
            return m.size_bytes
    except Exception:
        return None
    if not source_ok:
        return None
    try:
        sizes, stack, seen = [], [ds._logical_plan.dag], set()
        while stack:
            op = stack.pop()
            if id(op) in seen:
                continue
            seen.add(id(op))
            deps = op.input_dependencies
            if deps:
                stack.extend(deps)
            else:
                sizes.append(op.infer_metadata().size_bytes)
        if sizes and all(s is not None for s in sizes):
            return sum(sizes)
    except Exception:
        pass
    return None


def derive_partitions(
    size_bytes, floor: int = DEFAULT_PARTITION_FLOOR,
    target_bytes: int = TARGET_PARTITION_BYTES,
) -> int:
    """Partition count scaled to the input: ``ceil(bytes / target)``,
    floored at the historical fixed default so small inputs keep their
    measured sandbox behavior while a 100 TB exchange gets ~400k
    partitions instead of a 16-way reducer-memory cliff."""
    if not size_bytes:
        return floor
    return max(floor, -(-int(size_bytes) // target_bytes))


def partitioned_group_map(
    ds: "ray.data.Dataset",
    key_col: str,
    partition_fn: Callable,
    num_partitions: "int | None" = None,
    batch_format: str = "pandas",
    adaptive: bool = False,
    size_hint: "int | None" = None,
    partition_floor: int = DEFAULT_PARTITION_FLOOR,
) -> "ray.data.Dataset":
    """``adaptive=True`` opts into the small-exchange fast path: when
    the input fits ``SMALL_EXCHANGE_BYTES``, the whole map runs as one
    task with no all-to-all.  The small-vs-sorted decision is made from
    METADATA first — ``size_hint`` (caller-supplied, e.g. parquet-footer
    uncompressed bytes of a lazy read) or the plan's own zero-execution
    estimate — and the input is materialized to check only when that
    estimate is absent or already under the threshold, so a
    corpus-sized exchange never pays an extra full copy through the
    object store just to learn it is big.

    ``num_partitions=None`` derives the partition count from the same
    size evidence (``derive_partitions``), flooring at
    ``partition_floor``; pass an int to pin it."""
    known = size_hint if size_hint is not None else plan_size_estimate(ds)
    if num_partitions is None:
        est = known if known is not None else plan_size_estimate(
            ds, source_ok=True)
        num_partitions = derive_partitions(est, partition_floor)
    key_cols = [key_col] if isinstance(key_col, str) else list(key_col)

    def add_pk(t: pa.Table) -> pa.Table:
        # Arrow in/out: only the KEY column(s) round-trip through pandas
        # (for the stable hash); the payload bytes stay zero-copy Arrow
        # instead of a full to_pandas/from_pandas cycle per batch.
        if len(key_cols) == 1:
            keys = t.column(key_cols[0]).to_pandas()
        else:
            keys = t.select(key_cols).to_pandas()
        pk = (
            pd.util.hash_pandas_object(keys, index=False) % num_partitions
        ).astype("int64")
        return t.append_column("_pk", pa.array(pk.to_numpy(), pa.int64()))

    if batch_format == "pandas":
        def run_partition(df: pd.DataFrame) -> pd.DataFrame:
            return partition_fn(df.drop(columns=["_pk"]))
    else:
        def run_partition(t: pa.Table) -> pa.Table:
            return partition_fn(t.drop_columns(["_pk"]))

    if adaptive and (known is None or known <= SMALL_EXCHANGE_BYTES):
        # metadata said small (or gave no answer): materializing to
        # check is cheap / accepted by the caller's contract.  When
        # metadata already said BIG, this block is skipped entirely —
        # straight to the sorted exchange, zero extra copy.
        import ray

        mat = ds.map_batches(lambda t: t,
                             batch_format="pyarrow").materialize()
        if (mat.size_bytes() or 0) <= SMALL_EXCHANGE_BYTES:
            tbls = [t for t in ray.get(mat.to_arrow_refs())
                    if t.num_rows and t.schema.names]
            if not tbls:
                return mat
            one = ray.data.from_arrow(
                pa.concat_tables(tbls).combine_chunks())
            if batch_format == "pandas":
                return one.map_batches(
                    lambda df: partition_fn(df),
                    batch_format="pandas", batch_size=None)
            return one.map_batches(
                lambda t: partition_fn(t),
                batch_format="pyarrow", batch_size=None)
        ds = mat  # big after all: fall through to the sorted exchange

    with_pk = ds.map_batches(add_pk, batch_format="pyarrow")
    return with_pk.groupby("_pk").map_groups(run_partition, batch_format=batch_format)


def _null_fill_value(typ):
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return ""
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        return b""
    if pa.types.is_boolean(typ):
        return False
    return pa.scalar(0).cast(typ)


def null_safe_group_keys(t: pa.Table, cols: "list[str]"):
    """pyarrow's hash grouper mis-compares rows when ~11+ key columns
    carry nulls (the second byte of the row-encoded null mask; pinned
    by tests/test_grouped.py::test_distinct_many_null_key_columns on a
    repro captured from the real triples table).  Encode each nullable
    key EXACTLY as (null-filled value, validity bit): groups are
    unchanged, but no key column carries a null, which sidesteps the
    bug.  Returns ``(table, key_cols, restore)`` where ``restore`` maps
    original column -> its validity column for re-nulling the output.
    """
    keys: "list[str]" = []
    restore: "dict[str, str]" = {}
    for c in cols:
        a = t[c]
        if a.null_count == 0:
            keys.append(c)
            continue
        vc = f"__valid__{c}"
        filled = pc.fill_null(a, _null_fill_value(a.type))
        t = t.set_column(t.schema.get_field_index(c), c, filled)
        t = t.append_column(vc, pc.is_valid(a))
        keys.append(c)
        keys.append(vc)
        restore[c] = vc
    return t, keys, restore


def distinct_by(
    ds: "ray.data.Dataset",
    key_col: str,
    subset: "list[str] | None" = None,
    num_partitions: "int | None" = None,
    adaptive: bool = False,
    size_hint: "int | None" = None,
    partition_floor: int = DEFAULT_PARTITION_FLOOR,
) -> "ray.data.Dataset":
    """Global DISTINCT on ``subset`` (default ``[key_col]``), hash-
    partitioned by ``key_col`` — every column in ``subset`` must be a
    pure function of rows sharing ``key_col``'s partition.  ~5x faster
    than ``groupby().aggregate(Count)`` (Ray 2.49's sort-based
    aggregate costs ~100 CPU-us/row; pandas ``drop_duplicates`` is
    vectorized)."""
    cols = subset or [key_col]

    def fn(t: pa.Table) -> pa.Table:
        others = [c for c in t.schema.names if c not in cols]
        work, keys, restore = null_safe_group_keys(t, cols)
        # 'first' per key matches pandas drop_duplicates (keep='first');
        # skip_nulls=False keeps the first ROW's nulls
        opts = pc.ScalarAggregateOptions(skip_nulls=False)
        agg = work.group_by(keys, use_threads=False).aggregate(
            [(c, "first", opts) for c in others])
        out = {}
        for c in t.schema.names:
            if c in cols:
                col = agg[c]
                if c in restore:
                    col = pc.if_else(
                        agg[restore[c]], col, pa.nulls(len(col), col.type))
                out[c] = col
            else:
                out[c] = agg[f"{c}_first"]
        return pa.table(out)

    return partitioned_group_map(
        ds, key_col, fn, num_partitions, batch_format="pyarrow",
        adaptive=adaptive, size_hint=size_hint,
        partition_floor=partition_floor,
    )


def min_by_key(
    ds: "ray.data.Dataset", key_col: str,
    num_partitions: "int | None" = None,
    adaptive: bool = False,
    size_hint: "int | None" = None,
    partition_floor: int = DEFAULT_PARTITION_FLOOR,
) -> "ray.data.Dataset":
    """Per-key minimum of every other column (vectorized replacement
    for ``groupby(key).aggregate(Min(...), ...)``).  String minima are
    byte-order, identical to pandas' (UTF-8 preserves code-point
    order); nulls are skipped on both sides."""

    def fn(t: pa.Table) -> pa.Table:
        others = [c for c in t.schema.names if c != key_col]
        agg = t.group_by(key_col, use_threads=False).aggregate(
            [(c, "min") for c in others])
        return pa.table({
            c: (agg[c] if c == key_col else agg[f"{c}_min"])
            for c in t.schema.names
        })

    return partitioned_group_map(ds, key_col, fn, num_partitions,
                                 batch_format="pyarrow",
                                 adaptive=adaptive, size_hint=size_hint,
                                 partition_floor=partition_floor)


_MERGE_FN = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def hash_aggregate(
    ds: "ray.data.Dataset",
    keys: "str | list[str]",
    specs: "list[tuple]",
    num_partitions: "int | None" = None,
    adaptive: bool = False,
    size_hint: "int | None" = None,
    partition_floor: int = DEFAULT_PARTITION_FLOOR,
) -> "ray.data.Dataset":
    """Two-phase grouped aggregation in Arrow: an in-batch partial
    ``group_by`` collapses every batch to one row per key (so the
    exchange moves partials, and hot keys cannot swamp a reducer),
    then a partition-wise merge re-aggregates with the combining
    function.  Replaces ``Dataset.groupby().aggregate`` (Ray 2.49's
    sort-based aggregate costs ~100 CPU-us/row) for the associative
    aggregates.

    ``specs`` is a list of ``(col, fn, alias)`` with ``fn`` in
    {sum, min, max, count}; ``col`` is ignored for ``count`` (row
    count).  At most one count spec per call.
    """
    key_cols = [keys] if isinstance(keys, str) else list(keys)

    def _plan(t_group, phase: str):
        aggs, renames = [], []
        for col, fn, alias in specs:
            if phase == "partial":
                if fn == "count":
                    aggs.append(([], "count_all"))
                    renames.append(("count_all", alias))
                else:
                    aggs.append((col, fn))
                    renames.append((f"{col}_{fn}", alias))
            else:
                m = _MERGE_FN[fn]
                aggs.append((alias, m))
                renames.append((f"{alias}_{m}", alias))
        return aggs, renames

    def _run(t: pa.Table, phase: str) -> pa.Table:
        aggs, renames = _plan(None, phase)
        agg = t.group_by(key_cols, use_threads=False).aggregate(aggs)
        out = {k: agg[k] for k in key_cols}
        for src, alias in renames:
            out[alias] = agg[src]
        return pa.table(out)

    partial = ds.map_batches(lambda t: _run(t, "partial"),
                             batch_format="pyarrow")
    if size_hint is None:
        # the partial pass hides the root's size from the plan; the
        # pre-partial input is an upper bound on the exchange input
        size_hint = plan_size_estimate(ds)
    return partitioned_group_map(
        partial, key_cols, lambda t: _run(t, "merge"), num_partitions,
        batch_format="pyarrow", adaptive=adaptive, size_hint=size_hint,
        partition_floor=partition_floor,
    )


#: logical ops that cannot emit the SCHEMA-LESS zero-row blocks Ray
#: 2.49's all-to-all operators produce (see drop_empty_blocks): reads
#: carry file-footer schemas, map-family ops pass schemas through, and
#: in-memory sources are born with one.  Sort/Aggregate/Repartition and
#: anything unrecognized are treated as unsafe.
_SCHEMA_SAFE_OPS = frozenset({
    "Read", "MapBatches", "MapRows", "Filter", "Project", "FlatMap",
    "Union", "Limit", "FromArrow", "FromPandas", "FromItems",
    "FromNumpy", "InputData",
})


def lineage_schema_safe(ds: "ray.data.Dataset") -> bool:
    """True when every op in ``ds``'s logical lineage is in
    ``_SCHEMA_SAFE_OPS`` — such a dataset cannot contain schema-less
    empty blocks, so join guards may skip the materializing
    ``drop_empty_blocks`` copy entirely (the difference between a
    streaming join and pinning a corpus-sized side at 100 TB)."""
    try:
        stack, seen = [ds._logical_plan.dag], set()
        while stack:
            op = stack.pop()
            if id(op) in seen:
                continue
            seen.add(id(op))
            if type(op).__name__ not in _SCHEMA_SAFE_OPS:
                return False
            stack.extend(op.input_dependencies)
        return True
    except Exception:
        return False


def drop_empty_blocks(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Remove the SCHEMA-LESS zero-row blocks that Ray 2.49's hash
    aggregates / ``map_groups`` emit for partitions that received no
    rows — pyarrow hash joins abort on them ("No match for FieldRef").

    A ``map_batches`` pass cannot fix this: the executor passes empty
    blocks through *without invoking the UDF* (an acknowledged
    workaround in ``plan_udf_map_op.py`` — "some all-to-all operators
    output empty blocks with no schema").  So the drop is block-level:
    an identity map first coerces every non-empty block to Arrow, then
    the zero-row blocks are filtered out by *metadata* — only object
    refs are touched, no block data moves to the driver.
    """
    import ray
    import ray.data
    from ray.data.dataset import MaterializedDataset

    if isinstance(ds, MaterializedDataset):
        # Already-materialized input: inspect block metadata directly; if
        # clean, return it untouched — no identity pass, no extra copy.
        metas = [
            m for b in ds.iter_internal_ref_bundles() for (_r, m) in b.blocks
        ]
        if all(m.num_rows is None or m.num_rows > 0 for m in metas):
            return ds
    elif lineage_schema_safe(ds):
        # No all-to-all in the lineage -> no schema-less empties are
        # possible: keep the dataset LAZY (a corpus-sized join side
        # streams into the join instead of being pinned here).
        return ds

    mat = ds.map_batches(lambda t: t, batch_format="pyarrow").materialize()
    refs, total = [], 0
    for bundle in mat.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            total += 1
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(block_ref)
    if not refs or len(refs) == total:
        return mat  # fully empty, or nothing to drop
    return ray.data.from_arrow_refs(refs)


def safe_join(
    left: "ray.data.Dataset", right: "ray.data.Dataset", **kwargs
) -> "ray.data.Dataset":
    """``Dataset.join`` with both sides sanitized via
    :func:`drop_empty_blocks`.  Use this instead of raw ``join``
    whenever either side may descend from a groupby/aggregate/map_groups
    without an intervening materialization — at small data scales (and
    with sparse hash partitions at any scale) those ops leave
    schema-less empty blocks that abort the pyarrow hash join.

    ``num_partitions=None`` (or absent) derives the join partition
    count from the larger side's zero-execution size estimate
    (``Dataset.join`` itself requires an int)."""
    left = drop_empty_blocks(left)
    right = drop_empty_blocks(right)
    if kwargs.get("num_partitions") is None:
        est = max(
            (plan_size_estimate(s, source_ok=True) or 0)
            for s in (left, right)
        )
        kwargs["num_partitions"] = derive_partitions(est, floor=8)
    return left.join(right, **kwargs)


# default ceiling for broadcasting a join side (fits next to a batch
# in a worker heap; measured: broadcasting a ~470 MB side regressed the
# probe stage ~5x vs the hash join — keep this conservative)
BROADCAST_MAX_BYTES = 256 << 20


def broadcast_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: tuple,
    right_on: "tuple | None" = None,
    join_type: str = "inner",
    num_partitions: "int | None" = None,
    broadcast_max_bytes: int = BROADCAST_MAX_BYTES,
) -> "ray.data.Dataset":
    """Join with a broadcast small side when it fits, else hash join.

    The small side is ``ray.put`` once (one object-store copy per node,
    zero-copy reads in every task) and each left batch runs a local
    pyarrow hash join against it — no all-to-all exchange and no
    barrier for the left side, which keeps streaming.  Falls back to
    the shuffle-based :func:`safe_join` when the right side exceeds
    ``broadcast_max_bytes`` (e.g. at full corpus scale).
    """
    import ray

    right = drop_empty_blocks(right)
    from ray.data.dataset import MaterializedDataset

    # metadata-first size gate (the adaptive-exchange rule): a right
    # side that is KNOWN big from plan metadata goes straight to the
    # hash join without being pinned here just to measure it
    est = plan_size_estimate(right)
    if est is not None and est > broadcast_max_bytes:
        return safe_join(
            left, right, join_type=join_type, num_partitions=num_partitions,
            on=on, right_on=right_on,
        )
    if not isinstance(right, MaterializedDataset):
        right = right.materialize()
    size = right.size_bytes() or 0
    if size > broadcast_max_bytes:
        return safe_join(
            left, right, join_type=join_type, num_partitions=num_partitions,
            on=on, right_on=right_on,
        )

    refs = right.to_arrow_refs()

    @ray.remote(num_cpus=0)
    def _concat(*tables):
        non_empty = [t for t in tables if t.num_rows and t.schema.names]
        if not non_empty:
            return tables[0]
        return pa.concat_tables(non_empty).combine_chunks()

    right_ref = _concat.remote(*refs)
    left_keys = list(on)
    right_keys = list(right_on) if right_on is not None else left_keys
    pa_join_type = {"inner": "inner", "left_outer": "left outer"}[join_type]

    def join_batch(t: pa.Table) -> pa.Table:
        small = ray.get(right_ref)  # zero-copy from local object store
        return t.join(small, keys=left_keys, right_keys=right_keys,
                      join_type=pa_join_type)

    # Sanitize/materialize the left side: fusing the probe map into an
    # upstream sort pipeline measured ~3x slower than staging it, and
    # post-aggregation left sides are small relative to their inputs.
    left = drop_empty_blocks(left)
    # batch_size=None: one pyarrow join per BLOCK — the Acero plan setup
    # is the per-call fixed cost, so batching small would dominate
    return left.map_batches(join_batch, batch_format="pyarrow", batch_size=None)
