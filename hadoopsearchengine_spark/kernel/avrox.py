"""Minimal pure-stdlib Avro Object Container File codec.

Apache Iceberg stores its manifest lists and manifest files as Avro OCF
(Avro 1.11 spec, "Object Container Files") — the only part of the Iceberg
metadata tree that is not JSON. No avro library ships in this sandbox, so
this module implements the subset the Iceberg metadata layer uses:

- READ: generic, schema-driven — the writer schema embedded in the file
  header drives decoding, so any Iceberg-producing writer's manifests
  decode without hardcoded field lists. Types: null, boolean, int, long,
  float, double, bytes, string, fixed, enum, array, map, union, record;
  codecs: null and deflate (raw RFC-1951 streams per the spec).
- WRITE: same type subset, null codec — enough to produce spec-valid
  manifest/manifest-list files (fixtures AND the production-lite writer in
  sources/iceberg.py).

Binary encoding per the Avro spec: zigzag-varint ints/longs, length-
prefixed bytes/strings, little-endian IEEE float/double, block-encoded
arrays/maps (negative block count = size-prefixed), union = index + value.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------- primitives
def _read_long(b: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = b.read(1)
        if not byte:
            raise ValueError("avro: truncated varint")
        v = byte[0]
        acc |= (v & 0x7F) << shift
        if not v & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)                    # zigzag decode


def _write_long(out: bytearray, v: int) -> None:
    v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v - 1) << 1 | 1)
    while True:
        if v < 0x80:
            out.append(v)
            return
        out.append((v & 0x7F) | 0x80)
        v >>= 7


def _read_bytes(b: io.BytesIO) -> bytes:
    n = _read_long(b)
    data = b.read(n)
    if len(data) != n:
        raise ValueError("avro: truncated bytes")
    return data


def _write_bytes(out: bytearray, data: bytes) -> None:
    _write_long(out, len(data))
    out += data


# ------------------------------------------------------------------- decode
def _decode(b: io.BytesIO, schema, names: dict):
    if isinstance(schema, str):
        schema = names.get(schema, schema)
    if isinstance(schema, list):                      # union
        idx = _read_long(b)
        return _decode(b, schema[idx], names)
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):               # nested type def
            return _decode(b, t, names)
    if t == "null":
        return None
    if t == "boolean":
        return b.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(b)
    if t == "float":
        return struct.unpack("<f", b.read(4))[0]
    if t == "double":
        return struct.unpack("<d", b.read(8))[0]
    if t == "bytes":
        return _read_bytes(b)
    if t == "string":
        return _read_bytes(b).decode("utf-8")
    if t == "fixed":
        names[schema["name"]] = schema
        return b.read(schema["size"])
    if t == "enum":
        names[schema["name"]] = schema
        return schema["symbols"][_read_long(b)]
    if t == "array":
        out = []
        while True:
            n = _read_long(b)
            if n == 0:
                return out
            if n < 0:
                _read_long(b)                         # block byte size
                n = -n
            for _ in range(n):
                out.append(_decode(b, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            n = _read_long(b)
            if n == 0:
                return out
            if n < 0:
                _read_long(b)
                n = -n
            for _ in range(n):
                k = _read_bytes(b).decode("utf-8")
                out[k] = _decode(b, schema["values"], names)
    if t == "record":
        names[schema["name"]] = schema
        return {f["name"]: _decode(b, f["type"], names)
                for f in schema["fields"]}
    raise ValueError(f"avro: unsupported type {t!r}")


# ------------------------------------------------------------------- encode
def _encode(out: bytearray, schema, value, names: dict) -> None:
    if isinstance(schema, str):
        schema = names.get(schema, schema)
    if isinstance(schema, list):                      # union
        # branch selection matches the value's PYTHON TYPE, not merely
        # "first non-null" (ADVICE r4: a ["long","string"] union would have
        # encoded a string against the long branch). bool checked before
        # int: bool is an int subclass.
        _PY = {"boolean": bool, "int": int, "long": int, "float": float,
               "double": float, "string": str, "bytes": (bytes, bytearray),
               "record": dict, "map": dict, "array": (list, tuple),
               "enum": str, "fixed": (bytes, bytearray)}
        non_null = [(i, br) for i, br in enumerate(schema)
                    if (br if isinstance(br, str) else br["type"]) != "null"]
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch["type"]
            if value is None and bt == "null":
                _write_long(out, i)
                return
        if value is None:
            raise ValueError("avro: None for union without a null branch")
        for i, branch in non_null:
            bt = branch if isinstance(branch, str) else branch["type"]
            py = _PY.get(bt if isinstance(bt, str) else None)
            matches = (py is not None and isinstance(value, py)
                       and not (py is int and isinstance(value, bool)
                                and bt != "boolean"))
            # float branches also accept ints (Avro promotes)
            if py is float and isinstance(value, int) \
                    and not isinstance(value, bool):
                matches = True
            if matches or len(non_null) == 1:
                _write_long(out, i)
                _encode(out, branch, value, names)
                return
        raise ValueError(
            f"avro: no union branch for {type(value).__name__} value")
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):
            _encode(out, t, value, names)
            return
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out += struct.pack("<f", value)
    elif t == "double":
        out += struct.pack("<d", value)
    elif t == "bytes":
        _write_bytes(out, bytes(value))
    elif t == "string":
        _write_bytes(out, value.encode("utf-8"))
    elif t == "fixed":
        names[schema["name"]] = schema
        assert len(value) == schema["size"]
        out += bytes(value)
    elif t == "enum":
        names[schema["name"]] = schema
        _write_long(out, schema["symbols"].index(value))
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(out, schema["items"], item, names)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(out, schema["values"], v, names)
        _write_long(out, 0)
    elif t == "record":
        names[schema["name"]] = schema
        for f in schema["fields"]:
            if f["name"] not in value and "default" not in f:
                raise ValueError(f"avro: missing field {f['name']}")
            _encode(out, f["type"], value.get(f["name"], f.get("default")),
                    names)
    else:
        raise ValueError(f"avro: unsupported type {t!r}")


# ---------------------------------------------------------------------- OCF
def read_ocf(payload: bytes) -> tuple[dict, list]:
    """Avro OCF bytes -> (file metadata dict, list of decoded records)."""
    b = io.BytesIO(payload)
    if b.read(4) != MAGIC:
        raise ValueError("avro: bad OCF magic")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(b, meta_schema, {})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec}")
    sync = b.read(16)
    records = []
    while True:
        head = b.read(1)
        if not head:
            break
        b.seek(-1, io.SEEK_CUR)
        n = _read_long(b)
        size = _read_long(b)
        block = b.read(size)
        if len(block) != size:
            raise ValueError("avro: truncated block")
        if codec == "deflate":
            block = zlib.decompress(block, -15)       # raw RFC-1951
        bb = io.BytesIO(block)
        names: dict = {}
        for _ in range(n):
            records.append(_decode(bb, schema, names))
        if b.read(16) != sync:
            raise ValueError("avro: sync marker mismatch")
    return meta, records


def write_ocf(schema: dict, records: list,
              sync: bytes = b"\x00" * 15 + b"\x01") -> bytes:
    """(schema dict, records) -> Avro OCF bytes (null codec, one block).
    ``sync`` is fixed by default — determinism beats collision resistance
    for metadata files we both write and read."""
    out = bytearray(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": b"null"}
    _encode(out, {"type": "map", "values": "bytes"}, meta, {})
    assert len(sync) == 16
    out += sync
    body = bytearray()
    names: dict = {}
    for rec in records:
        _encode(body, schema, rec, names)
    _write_long(out, len(records))
    _write_long(out, len(body))
    out += body
    out += sync
    return bytes(out)
