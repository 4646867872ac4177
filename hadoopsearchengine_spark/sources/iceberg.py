"""Iceberg-or-parquet loader for the pages corpus.

The production input (north rule / SURVEY §3) is an Iceberg table
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)``. Iceberg needs the ``iceberg-spark-runtime`` jar on the
Spark classpath plus a catalog conf — neither ships in this sandbox, so
the loader degrades explicitly:

- ``iceberg:<catalog.db.table>``  -> ``spark.read.format("iceberg")`` —
  raises a clear RuntimeError up front if the runtime jar is absent
  (rather than Spark's opaque ClassNotFoundException mid-plan).
- ``parquet:<path>`` or a bare path -> ``spark.read.parquet`` (the layout
  every test and bench uses; Parquet files are exactly what an Iceberg
  table stores under its metadata layer, so the engine is
  format-indifferent downstream).

``ICEBERG_CATALOG_CONF`` documents the standard catalog wiring a real
deploy passes to ``session.get_spark(extra_conf=...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

# Standard Iceberg catalog conf (hadoop-catalog flavor) for a real cluster;
# pass through get_spark(extra_conf={...ICEBERG_CATALOG_CONF(...)})
def ICEBERG_CATALOG_CONF(name: str, warehouse: str) -> dict[str, str]:
    return {
        f"spark.sql.catalog.{name}":
            "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{name}.type": "hadoop",
        f"spark.sql.catalog.{name}.warehouse": warehouse,
        "spark.sql.extensions":
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions",
    }


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the iceberg-spark-runtime jar is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, ref: str) -> DataFrame:
    """Load the pages corpus from ``iceberg:<table-or-path>`` /
    ``parquet:<path>`` / a bare parquet path.

    ``iceberg:`` resolution order: the iceberg-spark-runtime jar when
    present (full Iceberg semantics); otherwise, if the ref is a table
    DIRECTORY (hadoop-catalog layout with ``metadata/``), the pure-python
    metadata reader below — real version-hint -> metadata.json -> Avro
    manifest-list -> Avro manifests -> parquet planning, no jars needed."""
    if ref.startswith("iceberg:"):
        table = ref[len("iceberg:"):]
        if iceberg_available(spark):
            return spark.read.format("iceberg").load(table)
        import os
        if os.path.isdir(os.path.join(table, "metadata")):
            return read_iceberg_table(spark, table)
        raise RuntimeError(
            "iceberg-spark-runtime is not on the Spark classpath and "
            f"{table!r} is not a hadoop-catalog table directory; add the "
            "jar + a catalog conf (see ICEBERG_CATALOG_CONF), pass a "
            "table path, or point at parquet instead")
    if ref.startswith("parquet:"):
        ref = ref[len("parquet:"):]
    return spark.read.parquet(ref)


# ---------------------------------------------------------------------------
# Pure-python Iceberg v2 metadata layer (hadoop catalog, unpartitioned,
# append-only). The Iceberg table format is a PUBLIC spec
# (https://iceberg.apache.org/spec/): JSON table metadata + Avro manifest
# lists/manifests over parquet data files. Only the Avro layer needs code
# (kernel/avrox.py); everything else is JSON. Scale note: manifest reading
# is DRIVER-side by design — that is exactly where Spark's own Iceberg
# DataSource does its scan planning — and the data files still stream
# through Spark's parquet reader with pushdown/pruning intact.
#
# Subset honesty: v2, unpartitioned specs, data manifests + POSITION
# delete files (merge-on-read applied as a Spark anti-join on
# (_metadata.file_path, _metadata.row_index) — r5) + EQUALITY delete
# files (null-safe broadcast join per equality_ids group, sequence-number
# scoped — r5). null+deflate Avro codecs on read, null on
# write. A jar-equipped cluster should prefer the native path (read_pages
# tries it first); this layer makes the north rule's input format WORK in
# jar-less environments and pins the wire format with round-trip tests.
# ---------------------------------------------------------------------------

_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_data_files_count", "type": "int", "field-id": 504},
        {"name": "existing_data_files_count", "type": "int",
         "field-id": 505},
        {"name": "deleted_data_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ]}

_MANIFEST_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None,
         "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 4},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "content", "type": "int", "field-id": 134},
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                {"name": "partition", "field-id": 102, "type": {
                    "type": "record", "name": "r102", "fields": []}},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long",
                 "field-id": 104},
                # spec field 135: the table field ids an EQUALITY delete
                # file (content=2) matches on; null for data/position files.
                # Optional-with-default so manifests written before r5
                # decode unchanged (OCF embeds its writer schema anyway).
                {"name": "equality_ids",
                 "type": ["null", {"type": "array", "items": "int",
                                   "element-id": 136}],
                 "default": None, "field-id": 135},
            ]}},
    ]}

_ICEBERG_TYPES = {  # Spark simpleString -> Iceberg primitive type
    "string": "string", "long": "long", "bigint": "long", "int": "int",
    "integer": "int", "double": "double", "float": "float",
    "boolean": "boolean", "binary": "binary", "date": "date",
    "timestamp": "timestamptz", "timestamp_ntz": "timestamp",
}


def _strip_scheme(p: str) -> str:
    return p[len("file:"):] if p.startswith("file:") else p


def write_iceberg_table(df: DataFrame, table_dir: str) -> dict:
    """Materialize ``df`` as an Iceberg v2 hadoop-catalog table at
    ``table_dir`` (data/ parquet files + metadata/ JSON, Avro manifest +
    manifest list, version-hint). Unpartitioned, single append snapshot.
    Returns a summary dict (paths + counts)."""
    import glob
    import json
    import os
    import time
    import uuid

    import pyarrow.parquet as pq

    from ..kernel.avrox import write_ocf

    data_dir = os.path.join(table_dir, "data")
    meta_dir = os.path.join(table_dir, "metadata")
    df.write.mode("overwrite").parquet(data_dir)
    os.makedirs(meta_dir, exist_ok=True)

    files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
    entries, total_rows = [], 0
    snapshot_id = 1
    for p in files:
        n = pq.ParquetFile(p).metadata.num_rows
        total_rows += n
        entries.append({
            "status": 1,                              # ADDED
            "snapshot_id": snapshot_id,
            "sequence_number": 1,
            "file_sequence_number": 1,
            "data_file": {
                "content": 0,                         # DATA
                "file_path": os.path.abspath(p),
                "file_format": "PARQUET",
                "partition": {},
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(p),
            }})
    manifest_path = os.path.join(meta_dir, "manifest-1.avro")
    with open(manifest_path, "wb") as f:
        f.write(write_ocf(_MANIFEST_SCHEMA, entries))
    mlist_path = os.path.join(meta_dir, "snap-1-manifest-list.avro")
    with open(mlist_path, "wb") as f:
        f.write(write_ocf(_MANIFEST_LIST_SCHEMA, [{
            "manifest_path": os.path.abspath(manifest_path),
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": 1,
            "min_sequence_number": 1,
            "added_snapshot_id": snapshot_id,
            "added_data_files_count": len(entries),
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
            "added_rows_count": total_rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }]))

    fields = []
    for i, sf in enumerate(df.schema.fields):
        t = _ICEBERG_TYPES.get(sf.dataType.simpleString())
        if t is None:
            raise ValueError(
                f"iceberg writer: unsupported type {sf.dataType}")
        fields.append({"id": i + 1, "name": sf.name,
                       "required": not sf.nullable, "type": t})
    meta = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL,
                                     os.path.abspath(table_dir))),
        "location": os.path.abspath(table_dir),
        "last-sequence-number": 1,
        "last-updated-ms": int(time.time() * 1000),
        "last-column-id": len(fields),
        "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": fields}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": snapshot_id,
        "snapshots": [{
            "snapshot-id": snapshot_id,
            "sequence-number": 1,
            "timestamp-ms": int(time.time() * 1000),
            "manifest-list": os.path.abspath(mlist_path),
            "summary": {"operation": "append"},
            "schema-id": 0,
        }],
        "refs": {"main": {"snapshot-id": snapshot_id, "type": "branch"}},
    }
    with open(os.path.join(meta_dir, "v1.metadata.json"), "w") as f:
        json.dump(meta, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("1")
    return {"table_dir": table_dir, "data_files": len(entries),
            "rows": total_rows, "manifest": manifest_path,
            "manifest_list": mlist_path}


def _mlist_record(manifest_path: str, content: int, seq: int,
                  snap_id: int, n_files: int, n_rows: int) -> dict:
    """A manifest-list record for one freshly written manifest."""
    import os
    return {"manifest_path": os.path.abspath(manifest_path),
            "manifest_length": os.path.getsize(manifest_path),
            "partition_spec_id": 0, "content": content,
            "sequence_number": seq, "min_sequence_number": seq,
            "added_snapshot_id": snap_id,
            "added_data_files_count": n_files,
            "existing_data_files_count": 0, "deleted_data_files_count": 0,
            "added_rows_count": n_rows, "existing_rows_count": 0,
            "deleted_rows_count": 0}


def _commit_snapshot(table_dir: str, meta: dict, version: int,
                     mlist_records: list, snap_id: int, seq: int,
                     operation: str, parent_id: int | None) -> None:
    """The ONE commit tail every writer shares (append / delete / rewrite):
    write snap-{id}-manifest-list.avro, advance the metadata (sequence,
    current snapshot, snapshot list, main ref), write v{N+1}.metadata.json
    and flip the version hint. A protocol change (snapshot-log, catalog
    CAS) lands here once instead of diverging across writers."""
    import json
    import os
    import time

    from ..kernel.avrox import write_ocf

    meta_dir = os.path.join(table_dir, "metadata")
    mlist_path = os.path.join(meta_dir,
                              f"snap-{snap_id}-manifest-list.avro")
    with open(mlist_path, "wb") as f:
        f.write(write_ocf(_MANIFEST_LIST_SCHEMA, mlist_records))
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = int(time.time() * 1000)
    meta["current-snapshot-id"] = snap_id
    snap = {"snapshot-id": snap_id, "sequence-number": seq,
            "timestamp-ms": int(time.time() * 1000),
            "manifest-list": os.path.abspath(mlist_path),
            "summary": {"operation": operation}, "schema-id": 0}
    if parent_id is not None:
        snap["parent-snapshot-id"] = parent_id
    meta["snapshots"].append(snap)
    meta["refs"] = {"main": {"snapshot-id": snap_id, "type": "branch"}}
    with open(os.path.join(meta_dir,
                           f"v{version + 1}.metadata.json"), "w") as f:
        json.dump(meta, f, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(version + 1))


def append_iceberg_snapshot(df: DataFrame, table_dir: str) -> dict:
    """Append ``df`` to an existing table as a NEW snapshot: new parquet
    files into data/, a new Avro manifest, a manifest list carrying the
    previous snapshot's manifests forward plus the new one, and a
    v{N+1}.metadata.json with the snapshot log grown — the Iceberg commit
    protocol's result, minus the optimistic-locking CAS (single-writer
    in-sandbox; a real deploy uses the catalog's atomic swap). Earlier
    snapshots stay readable via read_iceberg_table(snapshot_id=...)."""
    import glob
    import json
    import os
    import time

    from ..kernel.avrox import read_ocf, write_ocf

    import pyarrow.parquet as pq

    meta_dir = os.path.join(table_dir, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        version = int(f.read().strip())
    with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as f:
        meta = json.load(f)
    prev_snap = next(s for s in meta["snapshots"]
                     if s["snapshot-id"] == meta["current-snapshot-id"])
    with open(_strip_scheme(prev_snap["manifest-list"]), "rb") as f:
        _, prev_manifests = read_ocf(f.read())

    data_dir = os.path.join(table_dir, "data")
    before = set(glob.glob(os.path.join(data_dir, "*.parquet")))
    # counted BEFORE the write (df could read from this same table) so the
    # glob set-difference attribution below is validated against the rows
    # actually appended (ADVICE r4: a concurrent writer or leftover staging
    # file would otherwise be silently mis-attributed to this snapshot)
    expected_rows = df.count()
    df.write.mode("append").parquet(data_dir)
    new_files = sorted(set(glob.glob(os.path.join(data_dir, "*.parquet")))
                       - before)
    snap_id = meta["current-snapshot-id"] + 1
    seq = meta["last-sequence-number"] + 1
    entries, total_rows = [], 0
    for p in new_files:
        n = pq.ParquetFile(p).metadata.num_rows
        total_rows += n
        entries.append({
            "status": 1, "snapshot_id": snap_id, "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {"content": 0, "file_path": os.path.abspath(p),
                          "file_format": "PARQUET", "partition": {},
                          "record_count": n,
                          "file_size_in_bytes": os.path.getsize(p)}})
    if total_rows != expected_rows:
        raise RuntimeError(
            f"iceberg append: new data files carry {total_rows} rows but "
            f"the appended DataFrame has {expected_rows} — another writer "
            "or leftover staging files in data/ corrupted file "
            "attribution; table metadata NOT updated")
    manifest_path = os.path.join(meta_dir, f"manifest-{snap_id}.avro")
    with open(manifest_path, "wb") as f:
        f.write(write_ocf(_MANIFEST_SCHEMA, entries))
    _commit_snapshot(
        table_dir, meta, version,
        prev_manifests + [_mlist_record(manifest_path, 0, seq, snap_id,
                                        len(entries), total_rows)],
        snap_id, seq, "append", prev_snap["snapshot-id"])
    return {"snapshot_id": snap_id, "data_files": len(new_files),
            "rows": total_rows}


def _load_meta(table_dir: str) -> dict:
    import json
    import os
    meta_dir = os.path.join(table_dir, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        version = int(f.read().strip())
    with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as f:
        meta = json.load(f)
    meta["_version"] = version
    return meta


def iceberg_scan(table_dir: str,
                 snapshot_id: int | None = None) -> dict:
    """Resolve a snapshot through the real metadata tree (version-hint ->
    vN.metadata.json -> manifest list (Avro) -> manifests (Avro)) into
    ``{"data": [paths], "position_deletes": [paths], "data_seqs":
    {path: data sequence number}, "equality_deletes": [{"path", "seq",
    "equality_ids"}]}``. Data manifests (content=0) contribute live DATA
    entries; delete manifests (content=1) contribute POSITION delete files
    (data_file.content=1) and EQUALITY delete files (content=2) with their
    equality field ids and data sequence numbers (Iceberg spec §Delete
    Formats; the seq drives the "applies only to data written BEFORE the
    delete" scoping in read_iceberg_table). ``snapshot_id=None`` reads the
    CURRENT snapshot; passing an id is time travel."""
    from ..kernel.avrox import read_ocf

    meta = _load_meta(table_dir)
    if meta.get("format-version") != 2:
        raise ValueError("iceberg: only format-version 2 supported")
    snap_id = (meta["current-snapshot-id"]
               if snapshot_id is None else snapshot_id)
    try:
        snap = next(s for s in meta["snapshots"]
                    if s["snapshot-id"] == snap_id)
    except StopIteration:
        raise ValueError(
            f"iceberg: snapshot {snap_id} not in table {table_dir!r}")
    with open(_strip_scheme(snap["manifest-list"]), "rb") as f:
        _, manifests = read_ocf(f.read())
    data, pos_deletes, eq_deletes, data_seqs = [], [], [], {}
    for m in manifests:
        with open(_strip_scheme(m["manifest_path"]), "rb") as f:
            _, entries = read_ocf(f.read())
        for e in entries:
            if e["status"] == 2:                      # DELETED entry
                continue
            d = e["data_file"]
            content = d.get("content", 0)
            if d["file_format"].upper() != "PARQUET":
                raise ValueError(
                    f"iceberg: unsupported file format {d['file_format']}")
            # seq inheritance (spec §Sequence Number Inheritance): an ADDED
            # entry with null seq inherits the manifest's sequence_number.
            seq = e.get("sequence_number")
            if seq is None:
                seq = m["sequence_number"]
            path = _strip_scheme(d["file_path"])
            if content == 0:
                data.append(path)
                data_seqs[path] = seq
            elif content == 1:
                pos_deletes.append(path)
            elif content == 2:
                eq_deletes.append({"path": path, "seq": seq,
                                   "equality_ids": d.get("equality_ids")
                                   or []})
            else:
                raise ValueError(
                    f"iceberg: unknown data_file content {content}")
    return {"data": data, "position_deletes": pos_deletes,
            "data_seqs": data_seqs, "equality_deletes": eq_deletes}


def iceberg_data_files(table_dir: str,
                       snapshot_id: int | None = None) -> list[str]:
    """A snapshot's live data-file paths (see iceberg_scan). Raises when the
    snapshot carries delete files — callers that want merge-on-read go
    through read_iceberg_table, which applies position deletes."""
    scan = iceberg_scan(table_dir, snapshot_id=snapshot_id)
    if scan["position_deletes"] or scan["equality_deletes"]:
        raise ValueError(
            "iceberg: snapshot carries delete files — use "
            "read_iceberg_table (applies them) instead of the raw file list")
    return scan["data"]


def iceberg_incremental_files(table_dir: str,
                              after_snapshot_id: int) -> list[str]:
    """Data files ADDED by snapshots newer than ``after_snapshot_id`` — the
    incremental-consumption primitive (Iceberg's incremental scan): a
    follower (e.g. streaming.incremental's delta indexer) remembers the
    last snapshot it processed and indexes only the new files of each
    append. Manifest granularity: a manifest whose added_snapshot_id is
    newer contributes its ADDED entries."""
    import os

    from ..kernel.avrox import read_ocf

    meta_dir = os.path.join(table_dir, "metadata")
    import json
    with open(os.path.join(meta_dir, "version-hint.text")) as f:
        version = int(f.read().strip())
    with open(os.path.join(meta_dir, f"v{version}.metadata.json")) as f:
        meta = json.load(f)
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    with open(_strip_scheme(snap["manifest-list"]), "rb") as f:
        _, manifests = read_ocf(f.read())
    paths = []
    for m in manifests:
        if m["added_snapshot_id"] <= after_snapshot_id:
            continue
        with open(_strip_scheme(m["manifest_path"]), "rb") as f:
            _, entries = read_ocf(f.read())
        for e in entries:
            if e["status"] == 1 and e["data_file"].get("content", 0) == 0:
                paths.append(_strip_scheme(e["data_file"]["file_path"]))
    return paths


def _commit_delete_snapshot(table_dir: str, write_parquet,
                            n_rows: int,
                            equality_ids: list[int] | None = None) -> dict:
    """Shared delete-snapshot commit for position (equality_ids=None) and
    equality deletes: calls ``write_parquet(del_path)`` to materialize the
    delete file, then writes a delete manifest (content per kind), a
    manifest list carrying the previous snapshot's manifests forward plus
    the delete manifest, and a new metadata version. Single-writer like
    append_iceberg_snapshot (a real deploy swaps metadata through the
    catalog CAS)."""
    import json
    import os
    import time

    from ..kernel.avrox import read_ocf, write_ocf

    meta_dir = os.path.join(table_dir, "metadata")
    meta = _load_meta(table_dir)
    version = meta.pop("_version")
    prev_snap = next(s for s in meta["snapshots"]
                     if s["snapshot-id"] == meta["current-snapshot-id"])
    with open(_strip_scheme(prev_snap["manifest-list"]), "rb") as f:
        _, prev_manifests = read_ocf(f.read())

    snap_id = meta["current-snapshot-id"] + 1
    seq = meta["last-sequence-number"] + 1
    kind = "eqdel" if equality_ids is not None else "del"
    del_path = os.path.join(table_dir, "data",
                            f"{kind}-{snap_id:05d}.parquet")
    write_parquet(del_path)
    entries = [{
        "status": 1, "snapshot_id": snap_id, "sequence_number": seq,
        "file_sequence_number": seq,
        "data_file": {
            # 1 = POSITION_DELETES, 2 = EQUALITY_DELETES (spec §Manifests)
            "content": 1 if equality_ids is None else 2,
            "file_path": os.path.abspath(del_path),
            "file_format": "PARQUET", "partition": {},
            "record_count": n_rows,
            "file_size_in_bytes": os.path.getsize(del_path),
            "equality_ids": equality_ids}}]
    manifest_path = os.path.join(meta_dir,
                                 f"manifest-{snap_id}-{kind}.avro")
    with open(manifest_path, "wb") as f:
        f.write(write_ocf(_MANIFEST_SCHEMA, entries))
    _commit_snapshot(
        table_dir, meta, version,
        prev_manifests + [_mlist_record(manifest_path, 1, seq, snap_id,
                                        1, n_rows)],      # DELETES manifest
        snap_id, seq, "delete", prev_snap["snapshot-id"])
    return {"snapshot_id": snap_id, "deletes": n_rows,
            "delete_file": del_path}


def write_position_deletes(table_dir: str,
                           deletes: list[tuple[str, int]]) -> dict:
    """Commit a POSITION-DELETE snapshot: one parquet delete file with the
    spec's (file_path: string, pos: long) schema, a delete manifest
    (content=1 entries), a manifest list carrying the previous snapshot's
    manifests forward plus the delete manifest, and a new metadata version.
    ``deletes``: (data file path as recorded in the manifests, 0-based row
    position within that file)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    def write_parquet(del_path):
        pq.write_table(pa.table({
            "file_path": pa.array([os.path.abspath(p) for p, _ in deletes],
                                  pa.string()),
            "pos": pa.array([int(i) for _, i in deletes], pa.int64()),
        }), del_path)

    return _commit_delete_snapshot(table_dir, write_parquet, len(deletes))


# Iceberg primitive type -> pyarrow type, for equality-delete files whose
# column types must match the table schema's.
def _pa_type(iceberg_type: str):
    import pyarrow as pa
    return {
        "string": pa.string(), "long": pa.int64(), "int": pa.int32(),
        "double": pa.float64(), "float": pa.float32(),
        "boolean": pa.bool_(), "binary": pa.binary(),
        "date": pa.date32(), "timestamp": pa.timestamp("us"),
        "timestamptz": pa.timestamp("us", tz="UTC"),
    }[iceberg_type]


def write_equality_deletes(table_dir: str, rows: list[dict]) -> dict:
    """Commit an EQUALITY-DELETE snapshot (spec §Equality Delete Files): a
    parquet file holding the delete rows' equality columns (the keys of
    ``rows`` — all rows must share one key set, which becomes the
    manifest's equality_ids via the table schema's field ids), committed
    with content=2 at the next sequence number. A data row is deleted iff
    some delete row matches it on ALL equality columns (null matches null)
    AND the row's data file has a STRICTLY SMALLER data sequence number —
    i.e. the delete applies only to data written before it; later appends
    are untouched (scoping applied in read_iceberg_table)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not rows:
        raise ValueError("iceberg: empty equality-delete row set")
    cols = sorted(rows[0])
    if any(sorted(r) != cols for r in rows):
        raise ValueError("iceberg: equality-delete rows must share one "
                         "column set")
    meta = _load_meta(table_dir)
    schema = next(s for s in meta["schemas"]
                  if s["schema-id"] == meta["current-schema-id"])
    by_name = {f["name"]: f for f in schema["fields"]}
    missing = [c for c in cols if c not in by_name]
    if missing:
        raise ValueError(f"iceberg: equality columns {missing} not in "
                         "table schema")
    ids = [by_name[c]["id"] for c in cols]

    def write_parquet(del_path):
        pq.write_table(pa.table({
            c: pa.array([r[c] for r in rows], _pa_type(by_name[c]["type"]))
            for c in cols}), del_path)

    out = _commit_delete_snapshot(table_dir, write_parquet, len(rows),
                                  equality_ids=ids)
    out["equality_ids"] = ids
    return out


def read_iceberg_table(spark: SparkSession, table_dir: str,
                       snapshot_id: int | None = None) -> DataFrame:
    """Iceberg v2 table directory -> DataFrame, without the runtime jar:
    python resolves the metadata tree to the live parquet file list, Spark
    scans them (pushdown/pruning intact). ``snapshot_id`` time-travels to
    an earlier snapshot.

    Merge-on-read: POSITION delete files are applied as a broadcast LEFT
    ANTI join of (_metadata.file_path, _metadata.row_index) against the
    delete set — Spark's parquet source exposes both for free, the delete
    set is tiny relative to the data (so broadcast; the corpus never
    shuffles), and position deletes name exact (file, row) coordinates so
    applying them needs no sequence-number reasoning. EQUALITY delete
    files (content=2) are applied per equality_ids group as a broadcast
    null-safe LEFT join on the equality columns, keeping a row unless a
    matching delete has a data sequence number STRICTLY GREATER than the
    row's data file's (spec scoping: an equality delete hits only data
    written before it — appends after the delete survive)."""
    from functools import reduce

    from pyspark.sql import functions as F

    scan = iceberg_scan(table_dir, snapshot_id=snapshot_id)
    paths = scan["data"]
    if not paths:
        raise ValueError(f"iceberg: table {table_dir!r} has no data files")
    df = spark.read.parquet(*paths)
    if not scan["position_deletes"] and not scan["equality_deletes"]:
        return df

    def norm(col):
        # canonical path form: file:///x, file:/x and /x all -> /x
        return F.regexp_replace(col, "^file:/*", "/")

    cols = df.columns
    df = df.select("*",
                   norm(F.col("_metadata.file_path")).alias("_fp"),
                   F.col("_metadata.row_index").alias("_ri"))
    if scan["position_deletes"]:
        dels = (spark.read.parquet(*scan["position_deletes"])
                .select(norm(F.col("file_path")).alias("_del_path"),
                        F.col("pos").alias("_del_pos"))
                .distinct())
        df = df.join(F.broadcast(dels),
                     (F.col("_fp") == F.col("_del_path"))
                     & (F.col("_ri") == F.col("_del_pos")),
                     "left_anti")
    if scan["equality_deletes"]:
        meta = _load_meta(table_dir)
        schema = next(s for s in meta["schemas"]
                      if s["schema-id"] == meta["current-schema-id"])
        by_id = {f["id"]: f["name"] for f in schema["fields"]}
        # each data row's data sequence number, from the scan plan (tiny
        # path->seq map, broadcast)
        seq_df = spark.createDataFrame(
            [(p, int(s)) for p, s in scan["data_seqs"].items()],
            "_seq_path string, _dseq long")
        # fail LOUDLY if a data file is missing from the seq map (a path
        # normalization mismatch would otherwise null _dseq and the filter
        # below would silently over-delete that file's matching rows)
        df = (df.join(F.broadcast(seq_df),
                      F.col("_fp") == F.col("_seq_path"), "left")
              .drop("_seq_path")
              .withColumn("_dseq", F.coalesce(
                  F.col("_dseq"),
                  F.raise_error(F.concat(
                      F.lit("iceberg: data file missing from the "
                            "sequence-number map: "), F.col("_fp"))))))
        groups: dict[tuple, list] = {}
        for d in scan["equality_deletes"]:
            groups.setdefault(tuple(d["equality_ids"]), []).append(d)
        for ids, files in sorted(groups.items()):
            names = [by_id[i] for i in ids]
            dels = None
            for d in files:
                part = (spark.read.parquet(d["path"]).select(*names)
                        .withColumn("_eqseq", F.lit(int(d["seq"]))))
                dels = part if dels is None else dels.unionByName(part)
            # one surviving (key -> max delete seq) row per key: a data row
            # dies iff ANY matching delete is newer, i.e. iff the max is
            dels = (dels.groupBy(*names).agg(F.max("_eqseq").alias("_eqseq"))
                    .select(*[F.col(n).alias(f"_eqd_{k}")
                              for k, n in enumerate(names)], "_eqseq"))
            cond = reduce(lambda a, b: a & b,
                          [df[n].eqNullSafe(F.col(f"_eqd_{k}"))
                           for k, n in enumerate(names)])
            df = (df.join(F.broadcast(dels), cond, "left")
                  .filter(F.col("_eqseq").isNull()
                          | (F.col("_eqseq") <= F.col("_dseq")))
                  .drop("_eqseq", *[f"_eqd_{k}"
                                    for k in range(len(names))]))
    return df.select(*cols)


# ------------------------------------------------------------- maintenance
# A 100 TB table with streaming appends accumulates exactly two kinds of
# debt the readers above pay for on every query: small data files + long
# manifest chains (scan-planning cost) and merge-on-read delete files
# (per-query join cost). These two ops are the jar-less analogs of Iceberg's
# rewrite_data_files and expire_snapshots maintenance actions.

def compact_table(spark: SparkSession, table_dir: str,
                  n_files: int = 1) -> dict:
    """Commit a REWRITE (compaction) snapshot: materialize the CURRENT live
    rows (position AND equality deletes applied), rewrite them as
    ``n_files`` parquet files, and commit a snapshot whose manifest list
    holds ONLY the new data manifest — small-file sprawl, manifest chains
    and merge-on-read delete debt all fold into a clean copy-on-write
    state. Earlier snapshots stay readable (time travel) until
    expire_snapshots reclaims them. ``n_files`` is the sandbox stand-in for
    a target-file-size knob (a 100 TB run sizes files at 256-1024 MB)."""
    import glob
    import json
    import os
    import time

    import pyarrow.parquet as pq

    from ..kernel.avrox import write_ocf

    meta = _load_meta(table_dir)
    version = meta.pop("_version")
    # persist: the merge-on-read plan (scan + delete joins) would otherwise
    # evaluate twice — once for the row-count guard, once for the rewrite
    live = read_iceberg_table(spark, table_dir).persist()
    expected_rows = live.count()

    data_dir = os.path.join(table_dir, "data")
    meta_dir = os.path.join(table_dir, "metadata")
    before = set(glob.glob(os.path.join(data_dir, "*.parquet")))
    # the source file list is pinned inside read_iceberg_table, so reading
    # and appending to the same data/ dir cannot self-feed
    try:
        live.repartition(n_files).write.mode("append").parquet(data_dir)
    finally:
        live.unpersist()
    new_files = sorted(set(glob.glob(os.path.join(data_dir, "*.parquet")))
                       - before)

    snap_id = meta["current-snapshot-id"] + 1
    seq = meta["last-sequence-number"] + 1
    entries, total_rows = [], 0
    for p in new_files:
        n = pq.ParquetFile(p).metadata.num_rows
        total_rows += n
        entries.append({
            "status": 1, "snapshot_id": snap_id, "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {"content": 0, "file_path": os.path.abspath(p),
                          "file_format": "PARQUET", "partition": {},
                          "record_count": n,
                          "file_size_in_bytes": os.path.getsize(p)}})
    if total_rows != expected_rows:
        for p in new_files:
            os.remove(p)
        raise RuntimeError(
            f"iceberg compact: rewrote {total_rows} rows but the live "
            f"table has {expected_rows} — another writer interfered; "
            "table metadata NOT updated")
    manifest_path = os.path.join(meta_dir, f"manifest-{snap_id}-rw.avro")
    with open(manifest_path, "wb") as f:
        f.write(write_ocf(_MANIFEST_SCHEMA, entries))
    # REPLACE semantics: the new manifest list references ONLY the rewrite
    # manifest — prior manifests (and their delete files) are no longer
    # part of the current snapshot
    _commit_snapshot(
        table_dir, meta, version,
        [_mlist_record(manifest_path, 0, seq, snap_id, len(entries),
                       total_rows)],
        snap_id, seq, "replace", meta["current-snapshot-id"])
    return {"snapshot_id": snap_id, "data_files": len(new_files),
            "rows": total_rows}


def _snapshot_file_refs(snap: dict) -> set:
    """Every file path a snapshot's manifest tree references (manifest
    list, manifests, data + delete files — any entry status, so carried-
    forward history can't be deleted out from under a kept snapshot)."""
    import os

    from ..kernel.avrox import read_ocf

    refs = set()
    mlist = os.path.abspath(_strip_scheme(snap["manifest-list"]))
    refs.add(mlist)
    with open(mlist, "rb") as f:
        _, manifests = read_ocf(f.read())
    for m in manifests:
        mp = os.path.abspath(_strip_scheme(m["manifest_path"]))
        refs.add(mp)
        with open(mp, "rb") as f:
            _, entries = read_ocf(f.read())
        for e in entries:
            refs.add(os.path.abspath(
                _strip_scheme(e["data_file"]["file_path"])))
    return refs


def expire_snapshots(table_dir: str, keep_last: int = 1,
                     remove_orphans: bool = False) -> dict:
    """Expire all but the newest ``keep_last`` snapshots (by snapshot id;
    the current snapshot is always kept): write a v{N+1}.metadata.json
    whose snapshot list holds only the kept ones, then DELETE every
    manifest list, manifest, data and delete file that no kept snapshot
    references. Time travel to an expired snapshot now raises; this is the
    storage-reclaim half of the compaction story (compact first, then
    expire, and the pre-compaction file sprawl is physically gone).

    ``remove_orphans=True`` additionally sweeps files that NO snapshot
    ever referenced — the debris a writer crashed between its data write
    and its metadata commit leaves behind (e.g. a failed compact_table's
    full rewritten copy), which reference-diffing alone can never see.
    Single-writer only, like every writer here: a concurrent in-flight
    append's not-yet-committed files would look like orphans."""
    import glob
    import json
    import os
    import time

    meta = _load_meta(table_dir)
    version = meta.pop("_version")
    snaps = sorted(meta["snapshots"], key=lambda s: s["snapshot-id"])
    kept = snaps[-max(keep_last, 1):]
    if not any(s["snapshot-id"] == meta["current-snapshot-id"]
               for s in kept):
        raise ValueError("iceberg expire: keep_last window excludes the "
                         "current snapshot")
    expired = snaps[:-max(keep_last, 1)]

    keep_refs = set()
    for s in kept:
        keep_refs |= _snapshot_file_refs(s)
    drop_refs = set()
    for s in expired:
        drop_refs |= _snapshot_file_refs(s)
    orphans = drop_refs - keep_refs
    if remove_orphans:
        on_disk = {os.path.abspath(p) for pat in
                   ("data/*.parquet", "metadata/manifest-*.avro",
                    "metadata/snap-*-manifest-list.avro")
                   for p in glob.glob(os.path.join(table_dir, pat))}
        orphans |= on_disk - keep_refs

    deleted = 0
    if expired:
        meta["snapshots"] = kept
        meta["last-updated-ms"] = int(time.time() * 1000)
        meta_dir = os.path.join(table_dir, "metadata")
        with open(os.path.join(meta_dir,
                               f"v{version + 1}.metadata.json"), "w") as f:
            json.dump(meta, f, indent=1)
        with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
            f.write(str(version + 1))
    # metadata committed first: a crash mid-delete leaves unreferenced
    # files (harmless), never a kept snapshot with missing files
    for p in sorted(orphans):
        if os.path.exists(p):
            os.remove(p)
            deleted += 1
    return {"expired": len(expired), "deleted_files": deleted}
