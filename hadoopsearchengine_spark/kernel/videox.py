"""Pure-python MJPEG-AVI video codec (RIFF AVI, public Microsoft spec).

Upgrades the video leg of the multimodal family from stub to REAL for its
most tractable container: Motion-JPEG in AVI is a RIFF chunk list whose
``00dc``/``00db`` chunks are ordinary JPEG frames — the chunk walking is
the same discipline as ``wavx`` (WAVE is RIFF too) and the frames decode
through ``kernel.jpegx`` (baseline AND progressive). Other codecs
(H.26x/VP9/AV1) genuinely need libav and stay behind the fake/stub policy.

The ENCODER writes a spec-shaped minimal AVI (hdrl with avih + one vids
stream header declaring MJPG, a movi list of even-padded 00dc frames, and
an idx1 index) so fixtures are real files other tools can read; the
DECODER tolerates missing idx1 and extra chunks, walking LISTs to movi.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpegx import decode_jpeg, encode_jpeg


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _list(tag: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", tag + body)


def encode_mjpeg_avi(frames: list, fps: int = 10,
                     quality: int = 85) -> bytes:
    """List of (h, w, 3) uint8 RGB frames -> MJPEG AVI bytes. All frames
    must share one size (the AVI headers declare a single geometry)."""
    if not frames:
        raise ValueError("avi: no frames")
    h, w = frames[0].shape[0], frames[0].shape[1]
    payloads = []
    for f in frames:
        if f.shape[0] != h or f.shape[1] != w:
            raise ValueError("avi: frames must share one size")
        payloads.append(encode_jpeg(np.asarray(f, np.uint8), quality))
    n = len(payloads)
    bufsize = max(len(p) for p in payloads)
    avih = struct.pack("<14I", 1_000_000 // fps, bufsize * fps, 0, 0x10,
                       n, 0, 1, bufsize, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, n, bufsize,
                                            0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_items = [_chunk(b"00dc", p) for p in payloads]
    movi = _list(b"movi", b"".join(movi_items))
    idx, off = [], 4                                  # offsets into movi
    for item, p in zip(movi_items, payloads):
        idx.append(b"00dc" + struct.pack("<III", 0x10, off, len(p)))
        off += len(item)
    idx1 = _chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def mjpeg_avi_frames(payload: bytes) -> list[tuple[int, bytes]]:
    """AVI bytes -> [(byte_offset, jpeg_bytes)] for every video frame chunk
    (00dc/00db), in stream order. Raises ValueError on non-AVI or malformed
    chunk lists — the multimodal fallback contract."""
    try:
        return _frames(payload)
    except ValueError:
        raise
    except (IndexError, struct.error, TypeError) as e:
        raise ValueError(f"avi: malformed stream ({type(e).__name__})") from e


def _frames(payload: bytes) -> list[tuple[int, bytes]]:
    d = bytes(payload)
    if len(d) < 12 or d[0:4] != b"RIFF" or d[8:12] != b"AVI ":
        raise ValueError("not an avi")
    out: list[tuple[int, bytes]] = []

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            tag, size = struct.unpack_from("<4sI", d, pos)
            body_lo = pos + 8
            body_hi = body_lo + size
            if body_hi > hi:
                raise ValueError("avi: chunk overruns parent")
            if tag == b"LIST":
                walk(body_lo + 4, body_hi)            # skip list type
            elif tag[2:4] in (b"dc", b"db"):
                out.append((body_lo, d[body_lo:body_hi]))
            pos = body_hi + (size & 1)

    walk(12, len(d))
    if not out:
        raise ValueError("avi: no video frame chunks")
    return out


def decode_mjpeg_avi(payload: bytes) -> list[np.ndarray]:
    """AVI bytes -> list of (h, w, 3) uint8 RGB frames (JPEG-decoded)."""
    return [decode_jpeg(p) for _, p in mjpeg_avi_frames(payload)]
