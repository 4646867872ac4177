"""Structured Streaming incremental indexing + WARC-ish source round-trip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hadoopsearchengine_spark.sources.pages import synth_pages_local, write_pages
from hadoopsearchengine_spark.sources.warc import (
    parse_warc_bytes, read_warc, record_bytes, write_warc)
from hadoopsearchengine_spark.kernel.tokenize import tokenize


@pytest.fixture(scope="module")
def stream_pages(spark, workdir):
    path = f"{workdir}/stream_pages"
    write_pages(spark, 120, path)
    return path


def test_warc_roundtrip(spark, workdir, stream_pages):
    pages = spark.read.parquet(stream_pages)
    out = f"{workdir}/warc"
    write_warc(spark, pages, out, n_files=4)
    back = read_warc(spark, out).toPandas()
    want = pages.select("url", "html").toPandas()
    got = dict(zip(back["url"], back["html"]))
    assert len(got) == len(want)
    for url, html in zip(want["url"], want["html"]):
        assert bytes(got[url]) == bytes(html), url


def test_warc_parse_adversarial():
    # NUL in header, CRLF quirks, truncated record, garbage between records
    good = record_bytes("http://a.com/1", b"<p>one</p>")
    nul = (b"WARC/0.18\r\nWARC-Target\x00-URI: http://a.com/2\r\n"
           b"Content-Length: 6\r\n\r\nsixbyt\r\n\r\n")
    trunc = (b"WARC/0.18\r\nWARC-Target-URI: http://a.com/3\r\n"
             b"Content-Length: 9999\r\n\r\nshort")
    recs = parse_warc_bytes(good + b"garbage" + nul + trunc)
    urls = [u for u, _ in recs]
    assert "http://a.com/1" in urls
    assert parse_warc_bytes(b"") == []
    assert parse_warc_bytes(b"\x00\xff" * 50) == []


def test_streaming_token_counts(spark, stream_pages):
    from hadoopsearchengine_spark.streaming.incremental import (
        stream_token_counts)
    q = stream_token_counts(spark, stream_pages, "tc_test")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["term"]: r["cf"]
           for r in spark.sql("SELECT * FROM tc_test").collect()}
    # oracle: token counts over the same 120 deterministic pages
    want: dict[str, int] = {}
    for p in synth_pages_local(120):
        for t in tokenize(p["text"]):
            want[t] = want.get(t, 0) + 1
    assert got == want


def test_incremental_index_deltas(spark, workdir, stream_pages):
    from hadoopsearchengine_spark.streaming.incremental import (
        incremental_index, read_all_deltas)
    out = f"{workdir}/inc_idx"
    q = incremental_index(spark, stream_pages, out, files_per_trigger=2)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    deltas = read_all_deltas(spark, out)
    got = (deltas.groupBy("term").agg(F.sum("tf").alias("cf"))
           .toPandas().set_index("term")["cf"].to_dict())
    want: dict[str, int] = {}
    for p in synth_pages_local(120):
        for t in tokenize(p["text"]):
            want[t] = want.get(t, 0) + 1
    assert got == want
    # per-doc tf+positions must round-trip exactly for a sample url
    sample = synth_pages_local(120)[7]
    rows = deltas.filter(F.col("url") == sample["url"]).collect()
    per_term = {}
    for pos, t in enumerate(tokenize(sample["text"])):
        per_term.setdefault(t, []).append(pos)
    assert {r["term"]: list(r["positions"]) for r in rows} == per_term


def test_stateful_user_counters(spark, workdir):
    """applyInPandasWithState running counters: final state per user must
    equal the batch aggregate even when events arrive over 5 micro-batches."""
    import numpy as np
    from pyspark.sql import functions as F
    from hadoopsearchengine_spark.streaming.incremental import (
        stream_user_counters)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.repartition(5).write.mode("overwrite").parquet(f"{workdir}/ev5")
    q = stream_user_counters(spark, f"{workdir}/ev5", "uc_pytest",
                             files_per_trigger=1)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    raw = spark.sql("SELECT * FROM uc_pytest").toPandas()
    final = raw.sort_values("n_events").groupby("user_id").last().sort_index()
    want = (ev.groupBy("user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total_value"))
            .toPandas().set_index("user_id").sort_index())
    assert (final["n_events"] == want["n_events"]).all()
    np.testing.assert_allclose(final["total_value"], want["total_value"],
                               atol=1e-9)
    # state really crossed batches: more update rows than users
    assert len(raw) > len(final)


def test_multimodal_resize_and_frames(spark):
    from hadoopsearchengine_spark.functions.multimodal import (
        resize_images, sample_frames)
    df = spark.createDataFrame(
        [(1, bytes(range(200))), (2, b"xy")],
        "doc_id long, payload binary")
    thumbs = {r["media_id"]: r for r in
              resize_images(df, "payload", "doc_id", out_w=8,
                            out_h=8).collect()}
    assert len(bytes(thumbs[1]["thumb"])) == 64
    assert len(bytes(thumbs[2]["thumb"])) == 64  # short payload tiled
    assert bytes(thumbs[1]["thumb"])[:10] == bytes(range(10))
    frames = [r for r in sample_frames(df, "payload", "doc_id",
                                       n_frames=4).collect()
              if r["media_id"] == 1]
    assert [f["frame_no"] for f in frames] == [0, 1, 2, 3]
    assert frames[1]["offset"] == 50
    assert bytes(frames[1]["frame"])[0] == 50
