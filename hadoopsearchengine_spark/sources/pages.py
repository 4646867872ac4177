"""Deterministic synthetic `pages` corpus (FIXTURES.md §1).

Schema: (url string, warc_ts timestamp, html binary, text string, lang string)
— the input-table shape from BASELINE.json input_hint. `text` is written by
running the shared extraction kernel on `html`, so the table itself carries
the expected extraction and the engine must reproduce it byte-identically.

Every page is generated from ``np.random.Generator(PCG64(seed, page_id))`` —
a function of (seed, page_id) only — so the corpus is identical regardless of
partition count, generation order, or cluster size (SURVEY.md §7.4: the
reference's sequential per-client doc ids, DyableParseHTML.cpp:88-94, are NOT
stable and are deliberately not imitated).

The HTML exercises every extraction rule: titles, headers, paragraphs with
sentence structure, bold spans, links (absolute/relative/affiliated/dangling/
blacklisted-extension/illegal-char), images with short and long alt captions,
meta keywords, script/style blocks whose words must NOT be indexed.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from ..kernel.htmlx import extract

# ---- reference query set (DyableRequest/DyableQuery/DyableQuery.cpp:81-85,
#      query_log.txt:1) ----
REFERENCE_QUERIES = [
    "cold war", "egypt pyramids", "farming agriculture", "global warming",
    "roman emperor", "nervous system", "neural networks", "saturated fats",
    "amino acids", "photosynthesis", "rainforest", "caffeine",
]

STOPWORDS = (
    "the and of to in is was for on that with as are this by at from it an "
    "be or which not have has had were their they them then than but when "
    "into also its more some can may will would could should these those "
    "over under after before between"
).split()

BASE_TS = dt.datetime(2012, 2, 22, 0, 0, 0)  # reference crawl era
N_DOMAINS = 40
PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def build_vocab(v: int = 5000) -> list[str]:
    """Deterministic vocabulary, Zipf-ordered (index 0 = most frequent).
    Stopwords first, then filler stems with suffix variants, query terms
    planted mid-frequency, plus numeric tokens exercising the 4-5-digit rule
    and length outliers exercising the [2,16] rule."""
    qterms = sorted({t for q in REFERENCE_QUERIES for t in q.split()})
    vocab: list[str] = list(STOPWORDS)
    suffixes = ["", "s", "ed", "ing", "ly"]
    k = 0
    while len(vocab) < v:
        stem = f"w{k}x"  # never all-digit
        for suf in suffixes:
            if len(vocab) < v:
                vocab.append(stem + suf)
        k += 1
        if k % 17 == 3 and len(vocab) < v:
            vocab.append(str(1000 + (k * 7919) % 9000))        # 4-digit: kept
        if k % 29 == 5 and len(vocab) < v:
            vocab.append(str(100 + (k * 104729) % 900))        # 3-digit: dropped
        if k % 31 == 7 and len(vocab) < v:
            vocab.append(str(100000 + (k * 1299709) % 900000))  # 6-digit: dropped
        if k % 41 == 11 and len(vocab) < v:
            vocab.append("q" * 17)                              # too long: dropped
        if k % 43 == 13 and len(vocab) < v:
            vocab.append("z")                                   # too short: dropped
    # plant query terms at mid-frequency ranks (replace fillers)
    for i, t in enumerate(qterms):
        vocab[120 + i * 9] = t
    return vocab[:v]


_VOCAB = build_vocab()
_ZIPF_W = 1.0 / np.power(np.arange(1, len(_VOCAB) + 1, dtype=np.float64), 1.07)
_ZIPF_P = _ZIPF_W / _ZIPF_W.sum()
_QTERM_IDX = {t: _VOCAB.index(t) for q in REFERENCE_QUERIES for t in q.split()}


def _domain(site: int) -> str:
    return f"site{site}.example{site % 7}.com"


def page_url(page_id: int) -> str:
    # domain = page_id mod N_DOMAINS: stable, and same-domain ("affiliated")
    # neighbours are exactly the ids congruent mod N_DOMAINS
    return f"http://{_domain(page_id % N_DOMAINS)}/page/{page_id}"


def _sentenceize(words: list[str], rng: np.random.Generator) -> str:
    """Words -> sentences: capitalized start, '. ' ends every 6-14 words."""
    out, i = [], 0
    while i < len(words):
        n = int(rng.integers(6, 15))
        chunk = words[i:i + n]
        chunk[0] = chunk[0].capitalize()
        out.append(" ".join(chunk) + ".")
        i += n
    return " ".join(out)


def gen_page(page_id: int, n_pages: int, seed: int = 42) -> dict:
    """One deterministic page. Function of (seed, page_id, n_pages) only."""
    rng = np.random.Generator(np.random.PCG64([seed, page_id]))
    url = page_url(page_id)
    site = page_id % N_DOMAINS

    # 2% non-English junk pages
    if page_id % 50 == 17:
        junk = bytes(rng.integers(160, 255, size=400, dtype=np.uint8))
        html = (b"<html><title>\xc3\xa9\xc3\xa8</title><p>" + junk
                + b"</p></html>")
        res = extract(html, url)
        return {"url": url, "warc_ts": BASE_TS + dt.timedelta(seconds=page_id),
                "html": html, "text": res.text, "lang": "xx"}

    def draw(n: int) -> list[str]:
        return [_VOCAB[j] for j in rng.choice(len(_VOCAB), size=n, p=_ZIPF_P)]

    parts: list[str] = ["<html><head>"]
    title_words = draw(int(rng.integers(2, 9)))
    # plant query terms: page p serves query (p % 12) with graded tf
    qid = page_id % len(REFERENCE_QUERIES)
    qterms = REFERENCE_QUERIES[qid].split()
    grade = int((page_id // len(REFERENCE_QUERIES)) % 8) + 1
    if page_id % 3 != 2:  # 2/3 of pages actually carry their planted query
        title_words = qterms + title_words
    parts.append(f"<title>{' '.join(title_words)}</title>")
    if rng.random() < 0.3:
        parts.append(
            f'<meta name="keywords" content="{", ".join(draw(4))}">')
    parts.append("<style>body { color: red; } " + " ".join(draw(5))
                 + "</style></head><body>")
    parts.append(f"<h1>{' '.join(draw(int(rng.integers(2, 6))))}</h1>")

    n_paras = int(rng.integers(1, 13))
    for pi in range(n_paras):
        words = draw(int(rng.integers(20, 201)))
        if page_id % 3 != 2 and pi == 0:
            words = (qterms * grade) + words
        if rng.random() < 0.25:
            words[0] = f"<b>{words[0]}</b>"
        parts.append(f"<p>{_sentenceize(words, rng)}</p>")

    # links
    n_links = int(rng.integers(0, 16))
    zipf_targets = np.minimum(
        (rng.pareto(1.2, size=n_links) * 8).astype(np.int64), n_pages - 1)
    for li in range(n_links):
        r = rng.random()
        anchor = " ".join(draw(int(rng.integers(1, 4))))
        if r < 0.10:  # dangling (non-crawled target)
            href = f"http://external{int(rng.integers(0, 500))}.example.org/x"
        elif r < 0.30:  # affiliated: same-domain crawled target, relative href
            max_k = max(1, (n_pages - 1 - site) // N_DOMAINS + 1)
            tgt = site + N_DOMAINS * int(rng.integers(0, max_k))
            href = f"/page/{tgt}"
        elif r < 0.34:  # blacklisted extension → must be dropped
            href = f"http://site0.example0.com/img{li}.jpg"
        elif r < 0.37:  # illegal characters → must be dropped
            href = f"http://bad.example.com/a b<{li}>"
        else:  # absolute cross-domain to a crawled page
            href = page_url(int(zipf_targets[li]))
        parts.append(f'<a href="{href}">{anchor}</a>')

    # images: one long (kept) + maybe one short (dropped) caption
    if rng.random() < 0.5:
        parts.append(f'<img src="/i{page_id}.png" alt="{" ".join(draw(3))}">')
    if rng.random() < 0.3:
        parts.append(f'<img src="/j{page_id}.png" alt="ab">')  # <5 letters

    parts.append("<script>var x = 1; " + " ".join(draw(5)) + "</script>")
    parts.append("</body></html>")

    html = "".join(parts).encode("latin-1", errors="replace")
    res = extract(html, url)
    return {"url": url, "warc_ts": BASE_TS + dt.timedelta(seconds=page_id),
            "html": html, "text": res.text, "lang": "en"}


def synth_pages_local(n_pages: int, seed: int = 42) -> list[dict]:
    """Driver-side generation (oracle/tests, tiny-small scales)."""
    return [gen_page(i, n_pages, seed) for i in range(n_pages)]


def synth_pages_df(spark, n_pages: int, seed: int = 42, partitions: int = 0):
    """Distributed generation: mapInPandas over spark.range — deterministic
    per page_id, so identical output at any parallelism (scaling evidence
    depends on this)."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            rows = [gen_page(int(i), n_pages, seed) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    return (spark.range(0, n_pages, numPartitions=parts)
            .mapInPandas(gen, schema=PAGES_SCHEMA))


def write_pages(spark, n_pages: int, out_dir: str, seed: int = 42,
                partitions: int = 0) -> None:
    synth_pages_df(spark, n_pages, seed, partitions).write.mode(
        "overwrite").parquet(out_dir)
