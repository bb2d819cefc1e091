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

import ray.data


def partitioned_group_map(
    ds: "ray.data.Dataset",
    key_col: str,
    partition_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    def add_pk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_pk"] = (
            pd.util.hash_pandas_object(df[key_col], index=False) % num_partitions
        ).astype("int64")
        return df

    def run_partition(df: pd.DataFrame) -> pd.DataFrame:
        out = partition_fn(df.drop(columns=["_pk"]))
        return out

    with_pk = ds.map_batches(add_pk, batch_format="pandas")
    return with_pk.groupby("_pk").map_groups(run_partition, batch_format="pandas")
