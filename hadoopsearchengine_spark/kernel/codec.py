"""Posting-payload codec: delta + LEB128 varint, numpy-vectorized.

Re-expresses the reference's compressed posting storage (varint "escaped
items", reference MyStuff.h:270-371; 6-byte packed hits,
DyableSort/CompileLookupIndex/HitTypeWordDivision.h:88-105) as a vectorized
kernel: sorted doc ids are delta-encoded (first value absolute) and the gap /
tf / position streams are LEB128-packed. No per-element Python loops — both
encode and decode are O(total_bytes) numpy array ops, so the same code is the
hot path inside ``applyInPandas`` at build time and inside the query scorer.

Pure numpy; shared verbatim with the oracle.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * k) for k in range(1, 10)]


def encode_varints(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array -> bytes. Vectorized."""
    arr = np.ascontiguousarray(values, dtype=np.uint64)
    if arr.size == 0:
        return b""
    nbytes = np.ones(arr.shape, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (arr >= t).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    total = int(offsets[-1] + nbytes[-1])
    out = np.zeros(total, dtype=np.uint8)
    max_b = int(nbytes.max())
    for j in range(max_b):
        mask = nbytes > j
        vals = (arr[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        byte = vals.astype(np.uint8)
        cont = (nbytes[mask] - 1) > j
        byte[cont] |= 0x80
        out[offsets[mask] + j] = byte
    return out.tobytes()


def decode_varints(buf: bytes) -> np.ndarray:
    """Inverse of encode_varints -> uint64 array. Vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_term = (b & 0x80) == 0  # terminator byte of each value
    # group id per byte: number of terminators strictly before this byte
    group = np.concatenate(([0], np.cumsum(is_term)[:-1])).astype(np.int64)
    n_vals = int(is_term.sum())
    # position of byte within its group
    starts = np.concatenate(([0], np.flatnonzero(is_term)[:-1] + 1))
    pos_in_group = np.arange(b.size, dtype=np.int64) - starts[group]
    payload = (b & 0x7F).astype(np.uint64) << (7 * pos_in_group).astype(np.uint64)
    out = np.zeros(n_vals, dtype=np.uint64)
    np.add.at(out, group, payload)
    return out


def encode_deltas(sorted_ids: np.ndarray) -> bytes:
    """Delta-encode a strictly-increasing int array (first value absolute),
    then pack with the best-of codec (tagged varint or FOR-bitpack, whichever
    is smaller for this stream). Matches the reference's doc-gap layout with
    the PForDelta-family packing the north star names."""
    arr = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if arr.size == 0:
        return b""
    gaps = np.empty_like(arr)
    gaps[0] = arr[0]
    np.subtract(arr[1:], arr[:-1], out=gaps[1:])
    if arr.size > 1 and gaps[1:].min() <= 0:
        raise ValueError("doc ids must be strictly increasing")
    return encode_best(gaps.astype(np.uint64))


def decode_deltas(buf: bytes) -> np.ndarray:
    """Inverse of encode_deltas -> int64 array of absolute ids."""
    gaps = decode_best(buf)
    return np.cumsum(gaps.astype(np.int64))


def encode_tfs(tfs: np.ndarray) -> bytes:
    """tf stream: best-of codec (tfs are tiny -> bitpack usually wins)."""
    return encode_best(np.ascontiguousarray(tfs, dtype=np.uint64))


def decode_tfs(buf: bytes) -> np.ndarray:
    return decode_best(buf)


def encode_positions(positions_concat: np.ndarray, counts: np.ndarray) -> bytes:
    """Pack the concatenated per-doc position lists. Positions within each doc
    are delta-encoded (first absolute) so typical values stay 1-byte."""
    pos = np.ascontiguousarray(positions_concat, dtype=np.int64)
    if pos.size == 0:
        return b""
    deltas = np.empty_like(pos)
    deltas[0] = pos[0]
    np.subtract(pos[1:], pos[:-1], out=deltas[1:])
    # reset the delta chain at each doc boundary (store absolute first pos);
    # zero-count docs (tf=0 anchor-/meta-only posting rows) own no positions
    # and must not contribute a boundary (their "start" aliases the next
    # doc's — or falls past the end for trailing zeros)
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    starts = starts[counts > 0]
    deltas[starts] = pos[starts]
    return encode_best(deltas.astype(np.uint64))


def decode_positions(buf: bytes, counts: np.ndarray) -> np.ndarray:
    """Inverse of encode_positions -> concatenated absolute positions."""
    deltas = decode_best(buf).astype(np.int64)
    if deltas.size == 0:
        return deltas
    out = np.cumsum(deltas)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
    # the global cumsum carries across doc boundaries; subtract, per element,
    # the cumsum value just before its doc's start
    prefix = np.concatenate(([0], out))[starts]
    correction = np.repeat(prefix, counts.astype(np.int64))
    return out - correction


# -- FOR/bit-packed codec (the PForDelta family; north-star names
#    "varint/PForDelta-compressed" payloads). Frame-of-reference + fixed
#    bit-width packing, numpy-vectorized; an alternative to LEB128 for dense
#    gap/tf streams. Layout: [width:1B][n:varint][packed little-endian bits]
#    with width=255 marking a raw 8-byte fallback. --


def encode_bitpack(values: np.ndarray) -> bytes:
    """Fixed-width bit-pack a uint64 array (frame of reference = 0; callers
    delta-encode first). Vectorized via np.unpackbits on the byte matrix."""
    arr = np.ascontiguousarray(values, dtype=np.uint64)
    n = arr.size
    if n == 0:
        return b"\x00" + encode_varints(np.array([0], dtype=np.uint64))
    mx = int(arr.max())
    width = max(1, mx.bit_length())
    header = bytes([width if width < 64 else 255]) + encode_varints(
        np.array([n], dtype=np.uint64))
    if width >= 64:
        return header + arr.tobytes()
    # bits[i, j] = bit j of value i (LSB first)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((arr[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    flat = bits.reshape(-1)
    pad = (-flat.size) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
    packed = np.packbits(flat, bitorder="little")
    return header + packed.tobytes()


def decode_bitpack(buf: bytes) -> np.ndarray:
    """Inverse of encode_bitpack."""
    width = buf[0]
    rest = np.frombuffer(buf, dtype=np.uint8, offset=1)
    # varint n: find its end
    end = 0
    while rest[end] & 0x80:
        end += 1
    n = int(decode_varints(rest[:end + 1].tobytes())[0])
    payload = rest[end + 1:]
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 255:
        return np.frombuffer(payload.tobytes(), dtype=np.uint64, count=n)
    flat = np.unpackbits(payload, bitorder="little")[: n * width]
    bits = flat.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def encode_best(values: np.ndarray) -> bytes:
    """Pick the smaller of varint vs bitpack, tagged with a 1-byte marker
    (0x56 'V' varint, 0x42 'B' bitpack). Decoders dispatch on the tag."""
    v = encode_varints(values)
    b = encode_bitpack(values)
    if len(v) <= len(b):
        return b"\x56" + v
    return b"\x42" + b


def decode_best(buf: bytes) -> np.ndarray:
    if not buf:
        return np.empty(0, dtype=np.uint64)
    tag, rest = buf[0], buf[1:]
    if tag == 0x56:
        return decode_varints(rest)
    if tag == 0x42:
        return decode_bitpack(rest)
    raise ValueError(f"unknown codec tag {tag}")
