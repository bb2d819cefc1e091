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


def _pixel_features(px: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic feature vector from REAL pixels (HxWx3 uint8):
    per-channel mean/std, an 8-bin luminance histogram, and log-dims —
    unit-normalized float32.  Not a learned embedding (no model in this
    sandbox), but a pure function of the decoded image, so tests can
    assert bytes -> pixels -> features end-to-end."""
    f = px.reshape(-1, 3).astype(np.float64)
    lum = f @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 256.0))
    v = np.concatenate([
        f.mean(axis=0) / 255.0,
        f.std(axis=0) / 255.0,
        hist / max(1, lum.size),
        [np.log1p(px.shape[0]) / 16.0, np.log1p(px.shape[1]) / 16.0],
    ])
    if v.size < dim:
        v = np.pad(v, (0, dim - v.size))
    v = v[:dim]
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


class RealDecoder:
    """The production decode seam.

    Decode order: PIL when importable (any format it supports), else
    the pure-stdlib PNG codec (``extras/png.py``) for PNG payloads;
    anything else raises ``NotImplementedError`` naming the missing
    dependency — the seam a deployment fills with its codec stack."""

    def __init__(self, kind: str = "image"):
        self.kind = kind
        try:  # lazy, optional: the sandbox has no PIL
            from PIL import Image  # type: ignore

            self._pil = Image
        except ImportError:
            self._pil = None

    def _pixels(self, payload: bytes) -> np.ndarray:
        from neo4j_document_pipeline_ray.extras.png import decode_png, is_png

        if self.kind == "image":
            if self._pil is not None:
                import io

                im = self._pil.open(io.BytesIO(payload)).convert("RGB")
                return np.asarray(im, dtype=np.uint8)
            if is_png(payload):
                return decode_png(payload)
        raise NotImplementedError(
            f"decoding {self.kind} payloads of this format requires "
            "PIL/ffmpeg, not available in this environment; PNG images "
            "decode via the stdlib codec, use FakeDecoder otherwise"
        )

    def decode(self, payload: bytes) -> np.ndarray:
        return _pixel_features(self._pixels(payload))


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


# --- image resize ---------------------------------------------------------


class RealImageDecoder:
    """Production pixel-decode seam: PIL when importable, stdlib PNG
    codec for PNG payloads otherwise; other formats raise with the
    missing dependency named."""

    def __init__(self):
        try:
            from PIL import Image  # type: ignore

            self._pil = Image
        except ImportError:
            self._pil = None

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        from neo4j_document_pipeline_ray.extras.png import decode_png, is_png

        if self._pil is not None:
            import io

            im = self._pil.open(io.BytesIO(payload)).convert("RGB")
            return np.asarray(im, dtype=np.uint8)
        if is_png(payload):
            return decode_png(payload)
        raise NotImplementedError(
            "pixel decoding of non-PNG payloads requires PIL, not "
            "available in this environment; PNG decodes via the stdlib "
            "codec, use FakeImageDecoder for plumbing tests"
        )


class FakeImageDecoder:
    """Deterministic stand-in: bytes + dims -> uint8 HxWx3 array."""

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        seed = int.from_bytes(
            hashlib.blake2b(payload, digest_size=8).digest(), "little")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize via pure index arithmetic (deterministic,
    no interpolation library)."""
    h, w = img.shape[:2]
    rows = (np.arange(th) * h) // th
    cols = (np.arange(tw) * w) // tw
    return img[rows[:, None], cols[None, :]]


class ImageResizer:
    """Actor-pool stage: decode -> nearest-neighbor resize -> raw RGB
    payload with updated dims.  ``__init__`` holds the decoder once per
    actor; rows whose ``kind`` != image pass through undecoded with a
    null output payload."""

    def __init__(self, decoder: Optional[object] = None,
                 target: tuple = (224, 224)):
        self._decoder = decoder or FakeImageDecoder()
        self._tw, self._th = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, widths, heights = [], [], []
        for kind, p, w, h in zip(
            batch["kind"].to_pylist(), batch["payload"].to_pylist(),
            batch["width"].to_pylist(), batch["height"].to_pylist(),
        ):
            if kind != "image" or p is None:
                payloads.append(None); widths.append(None); heights.append(None)
                continue
            img = self._decoder.decode(p, w, h)
            out = resize_nearest(img, self._tw, self._th)
            payloads.append(out.tobytes())
            widths.append(self._tw); heights.append(self._th)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        })


def resize_images(
    media: "ray.data.Dataset",
    target: tuple = (224, 224),
    decoder: Optional[object] = None,
    concurrency: int | tuple = 2,
    batch_size: int = 64,
) -> "ray.data.Dataset":
    kwargs = {"fn_constructor_kwargs": {"target": target}}
    if decoder is not None:
        kwargs["fn_constructor_kwargs"]["decoder"] = decoder
    return media.map_batches(
        ImageResizer, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, **kwargs,
    )


# --- video frame sampling -------------------------------------------------


class FakeFrameDecoder:
    """Deterministic stand-in: (payload, frame_idx) -> uint8 frame."""

    def __init__(self, width: int = 64, height: int = 36):
        self.width, self.height = width, height

    def decode_frame(self, payload: bytes, frame_idx: int) -> np.ndarray:
        seed = int.from_bytes(
            hashlib.blake2b(payload + frame_idx.to_bytes(4, "little"),
                            digest_size=8).digest(), "little")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(self.height, self.width, 3),
                            dtype=np.uint8)


class FrameSampler:
    """Actor-pool stage: one video row -> ``n_frames`` rows sampled at
    evenly spaced timestamps (``(i + 0.5) * duration / n``, the
    mid-of-segment rule).  Row-expanding map: output schema is
    (media_id, frame_idx, ts_ms, payload)."""

    def __init__(self, decoder: Optional[object] = None, n_frames: int = 4,
                 fps: float = 30.0):
        self._decoder = decoder or FakeFrameDecoder()
        self._n = n_frames
        self._fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, tss, frames = [], [], [], []
        for mid, kind, p, dur in zip(
            batch["media_id"].to_pylist(), batch["kind"].to_pylist(),
            batch["payload"].to_pylist(), batch["duration_ms"].to_pylist(),
        ):
            if kind != "video" or p is None or not dur:
                continue
            for i in range(self._n):
                ts = (i + 0.5) * dur / self._n
                frame_idx = int(ts / 1000.0 * self._fps)
                ids.append(mid)
                idxs.append(frame_idx)
                tss.append(int(ts))
                frames.append(
                    self._decoder.decode_frame(p, frame_idx).tobytes())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "ts_ms": pa.array(tss, pa.int64()),
            "payload": pa.array(frames, pa.binary()),
        })


def sample_frames(
    media: "ray.data.Dataset",
    n_frames: int = 4,
    decoder: Optional[object] = None,
    concurrency: int | tuple = 2,
    batch_size: int = 32,   # row-expanding stage: keep input batches small
) -> "ray.data.Dataset":
    kwargs = {"fn_constructor_kwargs": {"n_frames": n_frames}}
    if decoder is not None:
        kwargs["fn_constructor_kwargs"]["decoder"] = decoder
    return media.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, **kwargs,
    )


def synthesize_media(
    n: int = 64, seed: int = 7, real_png: bool = False
) -> "ray.data.Dataset":
    """Deterministic fake media table (documents' bytes as payloads).

    ``real_png=True`` makes every image row's payload an actual PNG
    (stdlib-encoded random pixels) so the REAL decode path — not the
    hash-fake — runs end-to-end in this sandbox."""
    from neo4j_document_pipeline_ray.extras.png import encode_png

    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image" and real_png:
            w = 8 + int(rng.integers(0, 25))
            h = 8 + int(rng.integers(0, 25))
            payload = encode_png(
                rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
        else:
            w, h = 640, 480
            payload = rng.bytes(256 + int(rng.integers(0, 512)))
        rows.append({
            "media_id": i,
            "kind": kind,
            "payload": payload,
            "width": w if kind == "image" else None,
            "height": h if kind == "image" else None,
            "duration_ms": int(rng.integers(1000, 60000)) if kind != "image" else None,
        })
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
