"""Pure-stdlib PNG codec for the multimodal decode seam.

The sandbox has no PIL/libjpeg, but PNG needs only ``zlib`` (stdlib)
plus the per-row filter reconstruction from the PNG spec (RFC 2083
§6) — enough to make the image stages (``extras/multimodal.py``)
process REAL pixel data end-to-end instead of hash-fakes, with a
deterministic encoder so tests can synthesize known bytes→pixels
pairs.

Scope (deliberately minimal, asserted on): 8-bit depth, color types
0 (gray), 2 (RGB), 6 (RGBA); no interlacing, no palette.  Output is
always HxWx3 uint8 (gray replicated, alpha dropped) — the layout the
downstream resize/feature stages consume.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per pixel by PNG color type (supported subset)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def is_png(payload: bytes) -> bool:
    return isinstance(payload, (bytes, bytearray)) and bytes(payload[:8]) == _SIG


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> HxWx3 uint8 (RGB).  Raises ``ValueError`` on
    non-PNG input or an unsupported feature (interlace/palette/16-bit)."""
    if not is_png(payload):
        raise ValueError("not a PNG payload")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # len + type + body + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or color not in _CHANNELS or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color}, "
                    f"interlace={interlace}); supported: 8-bit gray/RGB/RGBA")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    nch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=off + 1).astype(np.int32)
        if ftype == 0:          # None
            cur = line
        elif ftype == 2:        # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:        # Sub (sequential in x)
            cur = line.copy()
            for x in range(nch, stride):
                cur[x] = (cur[x] + cur[x - nch]) & 0xFF
        elif ftype == 3:        # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - nch] if x >= nch else 0
                cur[x] = (cur[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:        # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - nch]) if x >= nch else 0
                ul = int(prev[x - nch]) if x >= nch else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        prev = cur.astype(np.uint8)
        out[y] = prev
    px = out.reshape(height, width, nch)
    if nch == 1:
        return np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])


def encode_png(img: np.ndarray) -> bytes:
    """HxWx3 (or HxW gray) uint8 -> PNG bytes, filter 0 on every row —
    fully deterministic, so tests get stable bytes→pixels fixtures."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        color, nch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, nch = 2, 3
    else:
        raise ValueError("encode_png expects HxW or HxWx3 uint8")
    h, w = a.shape[:2]
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(a[y].tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
            + chunk(b"IEND", b""))
