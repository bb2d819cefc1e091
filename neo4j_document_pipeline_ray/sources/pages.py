"""Readers for the page table (and other Parquet inputs).

The reference discovers ``*.md`` files on local disk and reads them one
at a time (``ingestMD.py:705-712, 734-735``).  Here the source of truth
is a Parquet table of web pages with the ``input_hint`` schema
``(url, warc_ts, html, text, lang)``; discovery, ordering and sharding
are the Parquet reader's job.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import ray.data


PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(
    path: Union[str, Sequence[str]],
    columns: Optional[List[str]] = None,
    **kwargs,
) -> "ray.data.Dataset":
    """Read the pages table with column pruning.

    The KG pipeline only needs ``url`` and ``html`` (the oracle ``text``
    column is for conformance checks) — pass ``columns`` so row groups
    for unused columns never leave storage.
    """
    return ray.data.read_parquet(path, columns=columns, **kwargs)
