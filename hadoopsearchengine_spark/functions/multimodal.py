"""Multimodal (binary) column plumbing: treat image/audio/video payloads as
opaque ``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The actual media decode is STUBBED (no image/audio libraries in this
container): ``decode_image_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces deterministic fake features
(documented below) so the Spark-side plumbing — schema, batching, partition
behavior — is real and tested. Swap ``_decode_one`` for a PIL/libav call in a
real deployment; nothing else changes.

Batch shape: mapInPandas receives Arrow record batches
(spark.sql.execution.arrow.maxRecordsPerBatch rows); each batch is processed
columnar-wise, features returned as a new DataFrame — one output row per
input row.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame

FEATURES_SCHEMA = ("media_id long, n_bytes int, sha1 string, width int, "
                   "height int, mean_luma double")


def _decode_one(payload: bytes, fake: bool):
    """STUB: real deployments replace this with an image decode. The fake
    derives (width, height, mean_luma) deterministically from the payload's
    sha1 so tests have stable expectations."""
    if not fake:
        raise NotImplementedError(
            "media decode requires an image library not present in this "
            "environment; pass fake=True for the deterministic stub")
    sha = hashlib.sha1(payload).hexdigest()
    h = int(sha[:8], 16)
    return {
        "n_bytes": len(payload),
        "sha1": sha,
        "width": 16 + h % 1024,
        "height": 16 + (h >> 10) % 1024,
        "mean_luma": round((h % 255001) / 1000.0, 3),
    }


def extract_media_features(df: DataFrame, media_col: str, id_col: str,
                           fake: bool = True) -> DataFrame:
    """(id, binary) -> FEATURES_SCHEMA via Arrow-batched mapInPandas."""
    def run(batches):
        for pdf in batches:
            feats = [_decode_one(p, fake) for p in pdf[media_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, media_col).mapInPandas(
        run, schema=FEATURES_SCHEMA)


def resize_images(df: DataFrame, media_col: str, id_col: str,
                  out_w: int = 64, out_h: int = 64,
                  fake: bool = True) -> DataFrame:
    """Resize plumbing: (id, binary) -> (id, out_w, out_h, thumb binary).
    The resample itself is STUBBED (deterministic byte-fold of the payload
    into out_w*out_h bytes) — swap for PIL in a real deployment; schema,
    batching and output contract are real."""
    import numpy as np

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[media_col]):
                if not fake:
                    raise NotImplementedError("image resample needs PIL")
                raw = np.frombuffer(bytes(payload) or b"\0", dtype=np.uint8)
                n = out_w * out_h
                reps = int(np.ceil(n / max(len(raw), 1)))
                thumb = np.tile(raw, reps)[:n]
                rows.append((int(mid), out_w, out_h, thumb.tobytes()))
            yield pd.DataFrame(
                rows, columns=["media_id", "out_w", "out_h", "thumb"])

    return df.select(id_col, media_col).mapInPandas(
        run, schema="media_id long, out_w int, out_h int, thumb binary")


def sample_frames(df: DataFrame, media_col: str, id_col: str,
                  n_frames: int = 4, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing for video payloads: (id, binary) ->
    one row per sampled frame (id, frame_no, offset, frame binary). The
    decoder is STUBBED: 'frames' are evenly-spaced 256-byte slices —
    swap for libav in a real deployment."""
    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[media_col]):
                if not fake:
                    raise NotImplementedError("video decode needs libav")
                raw = bytes(payload)
                if not raw:
                    continue
                step = max(len(raw) // n_frames, 1)
                for f in range(min(n_frames, len(raw))):
                    off = f * step
                    rows.append((int(mid), f, off, raw[off:off + 256]))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_no", "offset", "frame"])

    return df.select(id_col, media_col).mapInPandas(
        run, schema="media_id long, frame_no int, offset long, frame binary")
