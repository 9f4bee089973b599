"""Minimal real PNG codec — no external libraries.

PNG is zlib (stdlib) + per-scanline byte filters, so a correct decoder
needs no codec dependency: parse chunks, inflate IDAT, undo filters.
Supports the common subset: 8-bit depth, non-interlaced, color types
0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA).  The encoder writes
filter-0 scanlines.

This exists so the multimodal decode step (functions.multimodal.
decode_image / resize_image) is END-TO-END REAL in this environment:
PIL is preferred when installed (production path), this pure-numpy
decoder is the fallback.  Per-row unfiltering for Sub/Average/Paeth is
sequential by definition (each byte depends on the reconstructed left
neighbour); rows are processed with numpy where the filter allows.
Spec: https://www.w3.org/TR/png-3/ (filters §9).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise PngError("truncated chunk")
        yield ctype, body
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array of shape (h, w, channels).

    Raises PngError on anything that is not a supported PNG (the callers
    fall back to their byte-level interpretation)."""
    if not data.startswith(_SIG):
        raise PngError("not a PNG signature")
    width = height = None
    color_type = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise PngError(f"unsupported bit depth {bit_depth}")
            if color_type not in _CHANNELS:
                raise PngError(f"unsupported color type {color_type}")
            if comp != 0 or filt != 0:
                raise PngError("unsupported compression/filter method")
            if interlace != 0:
                raise PngError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat.extend(body)
    if width is None or not idat:
        raise PngError("missing IHDR/IDAT")
    c = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # corrupt stream
        raise PngError(f"inflate failed: {e}") from None
    stride = width * c
    if len(raw) != height * (stride + 1):
        raise PngError("scanline size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up — fully vectorized
            rec = line + prev
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth — left-sequential
            rec = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                left = rec[i - c] if i >= c else 0
                up = int(prev[i])
                ul = int(prev[i - c]) if i >= c else 0
                if ftype == 1:
                    rec[i] = line[i] + (left & 0xFF)
                elif ftype == 3:
                    rec[i] = line[i] + (((left & 0xFF) + up) >> 1)
                else:
                    rec[i] = line[i] + _paeth(left & 0xFF, up, ul)
        else:
            raise PngError(f"bad filter type {ftype}")
        prev = (rec & 0xFF).astype(np.uint8)
        out[y] = prev
    return out.reshape(height, width, c)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) or (h, w, channels in {1,2,3,4}) -> PNG bytes
    (filter-0 scanlines, zlib default level)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise PngError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * c)], axis=1
    )
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(rows.tobytes()))
        + _chunk(b"IEND", b"")
    )


def to_gray(rgb: np.ndarray) -> np.ndarray:
    """(h, w, c) -> (h, w) integer luma (ITU-R BT.601 coefficients in
    integer arithmetic, deterministic across platforms)."""
    if rgb.shape[2] == 1:
        return rgb[:, :, 0]
    if rgb.shape[2] == 2:  # gray + alpha
        return rgb[:, :, 0]
    r = rgb[:, :, 0].astype(np.int32)
    g = rgb[:, :, 1].astype(np.int32)
    b = rgb[:, :, 2].astype(np.int32)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
