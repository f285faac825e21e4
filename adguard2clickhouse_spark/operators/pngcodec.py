"""Dependency-free PNG codec (stdlib zlib + struct + numpy).

Round-4 de-stub of the one X5 path that still needed Pillow: PNG's
IDAT stream is plain zlib, and the five scanline filters (none, sub,
up, average, paeth) are a page of the public spec (RFC 2083 §6 /
W3C PNG 2nd ed. §9). With this module, image content decode executes
for REAL in a container with no imaging library at all — the Pillow
branch in operators.multimodal remains for the other formats.

Scope (explicit, errors otherwise — never silently wrong pixels):
bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+A),
6 (RGBA), non-interlaced. Output is always an (h, w, 3) uint8 RGB
array (alpha dropped, gray broadcast), matching what the PIL branch's
``convert("RGB")`` yields for opaque images.

The encoder exists for fixtures and oracles: it can deliberately
cycle the filter type per row (``filter_mode="cycle"``), so a decoder
that mis-reverses ANY of the five filters produces wrong pixel sums
and fails the x5_png_pixel_stats hash gate.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Per-byte Paeth predictor on int16 arrays (a=left, b=up, c=upleft)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _filter_row(ftype: int, raw: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    """Apply filter ``ftype`` to one raw scanline (uint8 1-D)."""
    left = np.concatenate([np.zeros(bpp, np.uint8), raw[:-bpp]]) if len(raw) >= bpp else np.zeros_like(raw)
    upleft = np.concatenate([np.zeros(bpp, np.uint8), prior[:-bpp]]) if len(prior) >= bpp else np.zeros_like(prior)
    if ftype == 0:
        return raw.copy()
    if ftype == 1:
        return (raw.astype(np.int16) - left).astype(np.uint8)
    if ftype == 2:
        return (raw.astype(np.int16) - prior).astype(np.uint8)
    if ftype == 3:
        avg = (left.astype(np.int16) + prior.astype(np.int16)) // 2
        return (raw.astype(np.int16) - avg).astype(np.uint8)
    if ftype == 4:
        return (raw.astype(np.int16) - _paeth(left, prior, upleft)).astype(np.uint8)
    raise ValueError(f"unknown PNG filter type {ftype}")


def _unfilter_row(ftype: int, filt: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse filter ``ftype``; sub/average/paeth need the running
    left neighbor, so they reconstruct byte-serially per pixel group."""
    n = len(filt)
    if ftype == 0:
        return filt.copy()
    if ftype == 2:
        return (filt.astype(np.int16) + prior).astype(np.uint8)
    out = np.empty(n, np.uint8)
    if ftype == 1:
        out[:bpp] = filt[:bpp]
        for i in range(bpp, n):
            out[i] = (int(filt[i]) + int(out[i - bpp])) & 0xFF
        return out
    if ftype == 3:
        for i in range(n):
            left = int(out[i - bpp]) if i >= bpp else 0
            out[i] = (int(filt[i]) + (left + int(prior[i])) // 2) & 0xFF
        return out
    if ftype == 4:
        for i in range(n):
            a = int(out[i - bpp]) if i >= bpp else 0
            b = int(prior[i])
            c = int(prior[i - bpp]) if i >= bpp else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (int(filt[i]) + pred) & 0xFF
        return out
    raise ValueError(f"unknown PNG filter type {ftype}")


def encode_png(pixels: np.ndarray, filter_mode: str = "cycle") -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a valid PNG (color type
    2, bit depth 8, real CRCs, one zlib IDAT).

    ``filter_mode``: "none" writes filter 0 everywhere; "cycle" writes
    filter ``row % 5`` — every filter type appears in any image with
    >= 5 rows, making decode correctness observable in pixel sums.
    """
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png expects an (h, w, 3) uint8 array")
    h, w = arr.shape[:2]
    bpp = 3
    prior = np.zeros(w * bpp, np.uint8)
    stream = bytearray()
    for y in range(h):
        raw = arr[y].reshape(-1)
        ftype = 0 if filter_mode == "none" else y % 5
        stream.append(ftype)
        stream += _filter_row(ftype, raw, prior, bpp).tobytes()
        prior = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(stream)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG payload to an (h, w, 3) uint8 RGB array.

    Real decode: chunk walk, zlib inflate of the concatenated IDATs,
    per-row unfilter, channel reshape. Raises ValueError on anything
    outside the supported scope (interlace, bit depth != 8) instead of
    guessing.
    """
    if data[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    width = height = None
    bitdepth = ctype = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            width, height, bitdepth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln  # length + tag + body + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bitdepth != 8:
        raise ValueError(f"unsupported PNG bit depth {bitdepth} (only 8)")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {ctype}")
    ch = _CHANNELS[ctype]
    bpp = ch  # bytes per pixel at bit depth 8
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    rows = np.empty((height, stride), np.uint8)
    prior = np.zeros(stride, np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        filt = np.frombuffer(raw, np.uint8, stride, off + 1)
        rows[y] = _unfilter_row(ftype, filt, prior, bpp)
        prior = rows[y]
    px = rows.reshape(height, width, ch)
    if ctype == 2:
        return px.copy()
    if ctype == 6:
        return px[:, :, :3].copy()
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # ctype == 3: palette lookup
    if palette is None:
        raise ValueError("palette PNG missing PLTE")
    return palette[px[:, :, 0]]
