"""Minimal pure-stdlib PNG codec (zlib + struct — no new dependency).

Exists so the multimodal REAL-decode branch is executable in this
container (Pillow absent): ``decode_png`` handles 8-bit grayscale /
gray+alpha / RGB / RGBA, non-interlaced, all five scanline filters
(None/Sub/Up/Average/Paeth, PNG spec §9); ``encode_png`` writes the same
subset and deliberately cycles the filter type per scanline so a decoder
round-trip exercises every unfilter path. Pure Python over tiny payloads
is the point — production deployments plug Pillow/torchvision into the
same ``extract_features`` kernel; this codec keeps the default pipeline's
decode branch honest end-to-end (see operators/multimodal.py).

Scale note: runs inside the Arrow-batched mapInPandas kernel, so cost is
per-payload Python but fully data-parallel across partitions; the
reference has no media path at all (builder's-brief addition).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, int, bytearray]:
    """PNG bytes → (width, height, channels, recovered scanline bytes).

    Supports bit depth 8, color types 0/2/4/6, no interlace. Raises
    ``ValueError`` on anything else (callers treat that as undecodable
    and fall through to their strict/fake policy).
    """
    if payload[:8] != _SIG:
        raise ValueError("not a PNG signature")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            try:
                ihdr = struct.unpack(">IIBBBBB", data)
            except struct.error as e:  # truncated mid-IHDR
                raise ValueError(f"truncated IHDR: {e}") from e
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth} color={color} interlace={interlace})")
    if comp != 0 or filt != 0:
        # only deflate/adaptive-filtering exist in the spec; anything else
        # would inflate to garbage rather than pixels — reject, don't guess
        raise ValueError(f"unsupported PNG (compression={comp} filter_method={filt})")
    ch = _CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # truncated/corrupt IDAT
        raise ValueError(f"corrupt IDAT: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = bytearray(h * stride)
    prev_start = -1
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        base = y * stride
        for x in range(stride):
            a = out[base + x - ch] if x >= ch else 0
            b = out[prev_start + x] if prev_start >= 0 else 0
            c = out[prev_start + x - ch] if (prev_start >= 0 and x >= ch) else 0
            if f == 0:
                v = line[x]
            elif f == 1:
                v = line[x] + a
            elif f == 2:
                v = line[x] + b
            elif f == 3:
                v = line[x] + (a + b) // 2
            elif f == 4:
                v = line[x] + _paeth(a, b, c)
            else:
                raise ValueError(f"bad filter type {f}")
            out[base + x] = v & 0xFF
        prev_start = base
    return w, h, ch, out


def to_gray(w: int, h: int, ch: int, pix: bytearray) -> list[int]:
    """Flattened 0-255 luma plane. RGB(A) uses the integer ITU-R 601 luma
    (299r+587g+114b)//1000 — the same weights Pillow's convert("L")
    applies, so the two codec branches agree on grayscale semantics."""
    if ch == 1:
        return list(pix)
    if ch == 2:  # gray + alpha: luma is the gray channel
        return list(pix[0::2])
    out = []
    for i in range(0, len(pix), ch):
        out.append((299 * pix[i] + 587 * pix[i + 1] + 114 * pix[i + 2]) // 1000)
    return out


def resize_nearest(gray: list[int], w: int, h: int, dim: int) -> list[list[int]]:
    """Deterministic nearest-neighbor resample to dim×dim (integer index
    mapping src = (dst * src_extent) // dim — no float coordinates, so
    every engine/host derives the identical pixel grid)."""
    return [
        [gray[((ty * h) // dim) * w + ((tx * w) // dim)] for tx in range(dim)]
        for ty in range(dim)
    ]


def column_mean_features(grid: list[list[int]], dim: int) -> list[float]:
    """Per-column mean of the dim×dim luma grid, scaled to [0,1]. Integer
    sum first, ONE float division last — sequential-sum parity with any
    pure-Python oracle re-derivation (no numpy reduction-order drift)."""
    return [sum(grid[ty][tx] for ty in range(dim)) / (dim * 255.0) for tx in range(dim)]


def encode_png(width: int, height: int, channels: int, pix: bytes) -> bytes:
    """Encode raw 8-bit scanlines as a PNG, cycling the scanline filter
    (y % 5) so decoders must implement every unfilter type to round-trip."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pix) != height * stride:
        raise ValueError("pixel buffer length mismatch")
    raw = bytearray()
    for y in range(height):
        f = y % 5
        raw.append(f)
        base = y * stride
        for x in range(stride):
            v = pix[base + x]
            a = pix[base + x - channels] if x >= channels else 0
            b = pix[base - stride + x] if y > 0 else 0
            c = pix[base - stride + x - channels] if (y > 0 and x >= channels) else 0
            if f == 0:
                raw.append(v)
            elif f == 1:
                raw.append((v - a) & 0xFF)
            elif f == 2:
                raw.append((v - b) & 0xFF)
            elif f == 3:
                raw.append((v - (a + b) // 2) & 0xFF)
            else:
                raw.append((v - _paeth(a, b, c)) & 0xFF)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )
