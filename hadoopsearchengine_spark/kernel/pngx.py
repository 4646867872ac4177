"""Pure-numpy+zlib PNG codec (RFC 2083 / ISO 15948, 8/16-bit, Adam7).

Companion to ``kernel.jpegx``: the sandbox has no PIL, and PNG needs
nothing beyond stdlib ``zlib`` and numpy. The DECODER handles color types
0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha) and 6 (RGBA) —
alpha/transparency dropped: the pipeline output is RGB — multiple IDAT
chunks, all five scanline filters (None/Sub/Up/Average/Paeth — Sub/Up
vectorized, Average/Paeth per-pixel over byte lanes), and — since r4 —
16-bit sample depth (filters run over the byte-expanded scanlines per the
spec; output downconverts by high byte) and Adam7 INTERLACED streams (the
seven sub-images are independently filtered pass blocks scattered back on
the (x0, y0, dx, dy) grids). Sub-8-bit depths (1/2/4) remain out of scope
(vanishingly rare on the modern web) — ValueError, callers fall back per
``functions.multimodal`` policy.

The ENCODER exists so the codec is testable in this PIL-free sandbox
(fixtures are generated, not vendored): 8-bit (uint8 input) or 16-bit
(uint16 input) RGB/RGBA/gray, per-row filter 0 or 2, optional Adam7
interlacing, one IDAT.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 pass grids: (x0, y0, dx, dy)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, up_filter: bool = False,
               interlace: bool = False) -> bytes:
    """(h, w), (h, w, 3) or (h, w, 4) uint8 (-> depth 8) or uint16
    (-> depth 16) -> PNG bytes. up_filter=True emits per-row filter type 2
    (Up) instead of 0 — exercising the decoder's unfilter path with a
    non-trivial filter; interlace=True emits Adam7 pass blocks."""
    img = np.asarray(img)
    if img.dtype not in (np.uint8, np.uint16):
        # a silent astype(uint8) would wrap int32/float pixels modulo 256
        # and produce a valid-looking PNG with wrong content (ADVICE r4)
        raise ValueError(
            f"encode_png needs uint8 or uint16 pixels, got {img.dtype}")
    depth = 16 if img.dtype == np.uint16 else 8
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if depth == 16:                                   # byte-expand, BE
        byt = np.ascontiguousarray(img.astype(">u2")).view(
            np.uint8).reshape(h, w, c * 2)
    else:
        byt = img.astype(np.uint8)

    def filt(block: np.ndarray) -> np.ndarray:
        ph = block.shape[0]
        if up_filter:
            prev = np.zeros((1,) + block.shape[1:], np.uint8)
            raw = block - np.concatenate([prev, block[:-1]], axis=0)
            ftype = 2
        else:
            raw, ftype = block, 0
        return np.concatenate(
            [np.full((ph, 1), ftype, np.uint8),
             raw.reshape(ph, -1)], axis=1)

    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = byt[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(filt(sub).tobytes())
        data = b"".join(parts)
    else:
        data = filt(byt).tobytes()
    out = bytearray(_SIG)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype,
                                       0, 0, int(interlace)))
    out += _chunk(b"IDAT", zlib.compress(data, 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(data: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """(h, 1+stride) filtered scanlines -> (h, stride) recon bytes."""
    recon = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ft = int(data[r, 0])
        line = data[r, 1:].astype(np.int64)
        up = recon[r - 1].astype(np.int64) if r else np.zeros(
            stride, np.int64)
        if ft == 0:
            recon[r] = line
        elif ft == 1:                                 # Sub: lane-wise cumsum
            lanes = line.reshape(-1, bpp)
            recon[r] = (np.cumsum(lanes, axis=0) % 256).reshape(
                stride).astype(np.uint8)
        elif ft == 2:                                 # Up
            recon[r] = ((line + up) % 256).astype(np.uint8)
        elif ft == 3:                                 # Average
            out = np.zeros(stride, np.int64)
            for i in range(stride):
                left = out[i - bpp] if i >= bpp else 0
                out[i] = (line[i] + (left + up[i]) // 2) % 256
            recon[r] = out.astype(np.uint8)
        elif ft == 4:                                 # Paeth
            out = np.zeros(stride, np.int64)
            for i in range(stride):
                left = out[i - bpp] if i >= bpp else 0
                ul = up[i - bpp] if i >= bpp else 0
                out[i] = (line[i] + _paeth(int(left), int(up[i]),
                                           int(ul))) % 256
            recon[r] = out.astype(np.uint8)
        else:
            raise ValueError(f"png: bad filter type {ft}")
    return recon


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB (alpha dropped after gray/palette
    expansion; 16-bit samples downconvert by high byte; Adam7 passes are
    de-interlaced). Raises ValueError on sub-8-bit depth streams AND on
    truncated/corrupt payloads (bad zlib stream, short chunks, out-of-range
    palette indices) — the multimodal fallback contract catches ValueError
    only."""
    try:
        return _decode_png(payload)
    except ValueError:
        raise
    except (IndexError, KeyError, TypeError, struct.error,
            zlib.error) as e:
        raise ValueError(
            f"png: malformed stream ({type(e).__name__})") from e


def _decode_png(payload: bytes) -> np.ndarray:
    d = bytes(payload)
    if d[:8] != _SIG:
        raise ValueError("not a png")
    i = 8
    w = h = depth = ctype = interlace = -1
    idat = bytearray()
    palette = None
    while i + 8 <= len(d):
        ln, tag = struct.unpack_from(">I4s", d, i)
        body = d[i + 8:i + 8 + ln]
        i += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth not in (8, 16):
                raise ValueError("png: only 8/16-bit depth supported")
            if depth == 16 and ctype == 3:
                raise ValueError("png: 16-bit palette is not legal PNG")
            if interlace not in (0, 1):
                raise ValueError("png: bad interlace method")
            if comp or filt or ctype not in _CHANNELS:
                raise ValueError("png: bad IHDR")
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if h < 0 or not idat:
        raise ValueError("png: missing IHDR/IDAT")
    c = _CHANNELS[ctype]
    bps = depth // 8
    bpp = c * bps                                     # filter bytes-per-px
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    if interlace:
        grid = np.zeros((h, w, bpp), np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            stride = pw * bpp
            need = ph * (stride + 1)
            if pos + need > len(raw):
                raise ValueError("png: IDAT length mismatch")
            rec = _unfilter(raw[pos:pos + need].reshape(ph, stride + 1),
                            ph, stride, bpp)
            grid[y0::dy, x0::dx] = rec.reshape(ph, pw, bpp)
            pos += need
        if pos != len(raw):
            raise ValueError("png: IDAT length mismatch")
    else:
        stride = w * bpp
        if len(raw) != h * (stride + 1):
            raise ValueError("png: IDAT length mismatch")
        grid = _unfilter(raw.reshape(h, stride + 1), h, stride,
                         bpp).reshape(h, w, bpp)
    # 16-bit downconverts by high byte (big-endian sample order)
    px = grid.reshape(h, w, c, bps)[:, :, :, 0]
    if ctype == 3:
        if palette is None:
            raise ValueError("png: palette image without PLTE")
        return palette[px[:, :, 0]]
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]
