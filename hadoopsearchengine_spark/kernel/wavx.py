"""Pure-numpy RIFF/WAVE audio codec (PCM 8/16/32-bit + IEEE float32).

Completes the audio leg of the multimodal family the way ``imagex``/
``jpegx``/``pngx`` do images: no libav/soundfile in this sandbox, and PCM
WAV needs nothing beyond struct + numpy. The DECODER walks the RIFF chunk
list (tolerating extra chunks like LIST/fact, word-aligned sizes per the
spec), reads ``fmt `` (format 1 = integer PCM, 3 = IEEE float; also 0xFFFE
WAVE_FORMAT_EXTENSIBLE with those subformats), and converts ``data`` to
float64 in [-1, 1] x (frames, channels). The ENCODER exists for fixtures
(int16 PCM; tests cross-check it against the stdlib ``wave`` module — two
independent implementations of the same public spec).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(frames,) or (frames, channels) int16 -> WAV bytes (PCM 16-bit LE)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    frames, ch = s.shape
    data = s.tobytes()
    block = ch * 2
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, ch, rate, rate * block, block, 16,
        b"data", len(data))
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (float64 samples in [-1, 1], shape (frames, channels),
    sample_rate). Raises ValueError on non-PCM/float formats, malformed
    chunk lists and truncated data — the multimodal fallback contract."""
    try:
        return _decode_wav(payload)
    except ValueError:
        raise
    except (IndexError, struct.error, TypeError) as e:
        raise ValueError(f"wav: malformed stream ({type(e).__name__})") from e


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    d = bytes(payload)
    if len(d) < 12 or d[0:4] != b"RIFF" or d[8:12] != b"WAVE":
        raise ValueError("not a wav")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(d):
        cid, size = struct.unpack_from("<4sI", d, pos)
        pos += 8
        body = d[pos:pos + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("wav: short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if fmt[0] == 0xFFFE and size >= 40:       # EXTENSIBLE
                sub = struct.unpack_from("<H", body, 24)[0]
                fmt = (sub,) + fmt[1:]
        elif cid == b"data":
            if len(body) != size:
                raise ValueError("wav: truncated data chunk")
            data = body
        pos += size + (size & 1)                      # chunks word-align
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt/data chunk")
    audio_format, ch, rate, _byte_rate, _block, bits = fmt
    if ch < 1:
        raise ValueError("wav: zero channels")
    if audio_format == 1:                             # integer PCM
        if bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float64)
                 - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float64) / 2147483648.0
        else:
            raise ValueError(f"wav: unsupported PCM bit depth {bits}")
    elif audio_format == 3:                           # IEEE float
        if bits == 32:
            x = np.frombuffer(data, "<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, "<f8").astype(np.float64)
        else:
            raise ValueError(f"wav: unsupported float bit depth {bits}")
    else:
        raise ValueError(f"wav: unsupported audio format {audio_format}")
    if len(x) % ch:
        raise ValueError("wav: data not a whole number of frames")
    return x.reshape(-1, ch), rate
