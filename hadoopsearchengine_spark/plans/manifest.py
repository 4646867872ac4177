"""Lineage manifest: per-stage (and per-output-file) records enabling
checkpoint resume.

Generalizes the reference's bookkeeping (per-set doc counts rescanned on
restart, reference DyableParseTREC/DyableParseHTML/DyableParseHTML.cpp:231-234
+ DyableCommand/DyableCommand.cpp:106-127; per-division dictionary sizes,
DyableHitList/DyableLogFile/IndexLogFile.h:238-257): each completed stage
appends rows

    (stage, partition, input_ref, output_ref, rows, bytes, checksum,
     completed_ts)

where ``input_ref`` is a fingerprint of the stage's inputs + parameters, so a
resume run can prove the cached output is still valid before skipping the
stage. Writes are write-then-commit: the stage's parquet lands first, the
manifest row only after, so a kill at any point leaves either no record (stage
re-runs) or a complete, valid output (stage skips).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

MANIFEST_NAME = "_manifest"


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, MANIFEST_NAME)


def fingerprint(*parts) -> str:
    payload = json.dumps(parts, sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _scan_output(path: str) -> tuple[int, str]:
    """(total_bytes, checksum of sorted (name, size) list) for an output dir."""
    entries = []
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.startswith(("_", ".")):
                continue
            fp = os.path.join(root, f)
            entries.append((os.path.relpath(fp, path), os.path.getsize(fp)))
    entries.sort()
    total = sum(sz for _, sz in entries)
    return total, fingerprint(entries)


class Manifest:
    def __init__(self, spark, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.path = _manifest_path(index_dir)

    def _load(self):
        if not os.path.exists(self.path):
            return []
        import pyarrow.parquet as pq
        rows = []
        for name in sorted(os.listdir(self.path)):
            # skip in-flight temp files (dot-prefixed) and non-parquet noise
            if name.startswith((".", "_")) or not name.endswith(".parquet"):
                continue
            fp = os.path.join(self.path, name)
            try:
                rows.extend(pq.read_table(fp).to_pylist())
            except Exception:
                # a torn/corrupt record (e.g. kill mid-write before the
                # rename landed on a non-atomic filesystem) must not poison
                # resume for every OTHER stage: treat it as absent — the
                # worst case is one stage re-running.
                continue
        return rows

    def completed(self, stage: str, input_ref: str) -> bool:
        """True iff `stage` completed with the same input fingerprint AND its
        recorded output still exists unchanged on disk."""
        for row in self._load():
            if row["stage"] == stage and row["input_ref"] == input_ref:
                out = row["output_ref"]
                if os.path.exists(out):
                    _bytes, chksum = _scan_output(out)
                    if chksum == row["checksum"]:
                        return True
        return False

    def record(self, stage: str, input_ref: str, output_path: str,
               rows: int, partition: int = -1) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq
        total_bytes, chksum = _scan_output(output_path)
        row = {
            "stage": stage, "partition": partition, "input_ref": input_ref,
            "output_ref": output_path, "rows": rows, "bytes": total_bytes,
            "checksum": chksum, "completed_ts": time.time(),
        }
        table = pa.Table.from_pylist([row])
        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{stage}-{fingerprint(stage, input_ref)}.parquet"
        final = os.path.join(self.path, fname)
        # write-then-rename: concurrent stages (concurrent_stages=True) may
        # call completed()/_load while this record is mid-write, and a kill
        # mid-write must not leave a torn file at the final name. The dot
        # prefix is skipped by _load and _scan_output; os.rename is atomic
        # on POSIX.
        tmp = os.path.join(self.path, f".{fname}.tmp")
        pq.write_table(table, tmp)
        os.rename(tmp, final)

    def rows(self):
        return self._load()
