"""Multimodal column plumbing: opaque binary payloads through Ray Data.

Image/audio/video content rides as ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages.  The actual
codecs (PIL/ffmpeg/torchaudio) are NOT available in this environment,
so the decode step is stubbed two ways:

* ``RealDecoder`` raises ``NotImplementedError`` with the dependency it
  would need — the seam where a deployment plugs a real codec;
* ``FakeDecoder`` produces a deterministic feature vector from the raw
  bytes (blake2-seeded), so the Ray-side plumbing — schema, batch
  sizing for wide binary rows, actor signature, output layout — is real
  and tested end-to-end.

Scale notes: binary payloads make rows wide, so the stage runs with a
small ``batch_size`` and the payload column is dropped in the output
(features only) — the same "drop the heavy column as early as
possible" rule the KG pipeline applies to raw HTML.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),        # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),        # typed metadata (nullable per kind)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

FEATURE_DIM = 16


class RealDecoder:
    """The production decode seam — requires codec libraries."""

    def __init__(self, kind: str = "image"):
        self.kind = kind

    def decode(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            f"decoding {self.kind} requires PIL/ffmpeg, not available in "
            "this environment; use FakeDecoder for plumbing tests"
        )


class FakeDecoder:
    """Deterministic stand-in: bytes -> unit-norm feature vector."""

    def __init__(self, dim: int = FEATURE_DIM):
        self.dim = dim

    def decode(self, payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
        v = np.random.default_rng(seed).standard_normal(self.dim)
        return (v / np.linalg.norm(v)).astype(np.float32)


class MediaFeatureExtractor:
    """Actor-pool stage: decode + feature-extract binary media batches.

    ``__init__`` holds the (expensive) decoder/model once per actor;
    ``__call__`` processes one Arrow batch and drops the payload column.
    """

    def __init__(self, decoder: Optional[object] = None):
        self._decoder = decoder or FakeDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decoder.decode(p) if p is not None else None
            for p in batch["payload"].to_pylist()
        ]
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "n_bytes": pa.array(
                [len(p) if p is not None else 0 for p in batch["payload"].to_pylist()],
                pa.int64()),
            "feature": pa.array(feats, pa.list_(pa.float32())),
        })


def extract_media_features(
    media: "ray.data.Dataset",
    decoder: Optional[object] = None,
    concurrency: int | tuple = 2,
    batch_size: int = 64,   # small: payload rows are wide
) -> "ray.data.Dataset":
    kwargs = {}
    if decoder is not None:
        kwargs["fn_constructor_kwargs"] = {"decoder": decoder}
    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        **kwargs,
    )


def synthesize_media(n: int = 64, seed: int = 7) -> "ray.data.Dataset":
    """Deterministic fake media table (documents' bytes as payloads)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(256 + int(rng.integers(0, 512)))
        rows.append({
            "media_id": i,
            "kind": kind,
            "payload": payload,
            "width": 640 if kind == "image" else None,
            "height": 480 if kind == "image" else None,
            "duration_ms": int(rng.integers(1000, 60000)) if kind != "image" else None,
        })
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
