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
