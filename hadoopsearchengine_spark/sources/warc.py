"""WARC-ish concatenated-record reader/writer.

The reference ingests concatenated HTTP-record files: a text header
terminated by a blank line carrying ``WARC-Target-URI:`` and
``Content-Length:``, followed by exactly Content-Length payload bytes
(reference DyableParseTREC/DyableParseHTML/DyableParseHTML.cpp:19-116, with
CRLF/NUL quirks at :30-36). This module re-expresses that scan Spark-first:

- ``write_warc``: pages DataFrame -> N ``.warc`` byte files (for tests and
  for interop with crawl-style inputs).
- ``read_warc``: ``spark.read.format("binaryFile")`` over the files, then one
  Arrow pass splitting each file's bytes into (url, html) records. A whole
  file is one row — the natural unit, since records are variable-length and
  self-describing; parallelism = number of files (crawl dumps ship thousands
  of segment files). Robust to CRLF vs LF and NUL bytes in headers.
"""

from __future__ import annotations

import pandas as pd

WARC_SCHEMA = "url string, html binary"


def record_bytes(url: str, html: bytes) -> bytes:
    header = (f"WARC/0.18\r\nWARC-Target-URI: {url}\r\n"
              f"Content-Length: {len(html)}\r\n\r\n").encode()
    return header + html + b"\r\n\r\n"


def parse_warc_bytes(blob: bytes) -> list[tuple[str, bytes]]:
    """Parse one file's concatenated records. Never raises; malformed
    trailing bytes are dropped (the reference skips corrupt doc sets,
    DocumentDatabase.h:10-16)."""
    out = []
    i, n = 0, len(blob)
    while i < n:
        end = blob.find(b"\r\n\r\n", i)
        if end == -1:
            break
        header = blob[i:end].decode("latin-1", errors="replace")
        url, length = None, None
        for line in header.replace("\x00", "").splitlines():
            low = line.lower()
            if low.startswith("warc-target-uri:"):
                url = line.split(":", 1)[1].strip()
            elif low.startswith("content-length:"):
                try:
                    length = int(line.split(":", 1)[1].strip())
                except ValueError:
                    length = None
        body_start = end + 4
        if url is None or length is None or body_start + length > n:
            # resync: look for the next record header
            nxt = blob.find(b"WARC/", body_start)
            if nxt == -1:
                break
            i = nxt
            continue
        out.append((url, blob[body_start:body_start + length]))
        i = body_start + length
        # skip the record separator
        while i < n and blob[i:i + 2] == b"\r\n":
            i += 2
    return out


def write_warc(spark, pages, out_dir: str, n_files: int = 8) -> None:
    """pages(url, html, ...) -> out_dir/part-*.warc (one file per
    partition)."""
    import os
    os.makedirs(out_dir, exist_ok=True)

    def dump(iterator):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        chunks = []
        for pdf in iterator:
            for url, html in zip(pdf["url"], pdf["html"]):
                chunks.append(record_bytes(url, bytes(html)))
        if chunks:
            with open(f"{out_dir}/part-{pid:05d}.warc", "wb") as f:
                f.write(b"".join(chunks))
        yield pd.DataFrame({"n": [len(chunks)]})

    (pages.select("url", "html").repartition(n_files)
     .mapInPandas(dump, schema="n long").count())


def read_warc(spark, path_glob: str):
    """.warc files -> DataFrame(url, html). One Arrow pass per file."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.warc").load(path_glob)
             .select("content"))

    def parse(iterator):
        for pdf in iterator:
            rows = []
            for blob in pdf["content"]:
                rows.extend(parse_warc_bytes(bytes(blob)))
            yield pd.DataFrame(rows, columns=["url", "html"])

    return files.mapInPandas(parse, schema=WARC_SCHEMA)
