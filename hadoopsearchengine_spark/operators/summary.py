"""Multi-excerpt document summaries with overlap removal.

The reference compiles a per-document display summary at query time
(DyableRequest/DocumentQuery/DocumentQuery/CompileSummary.h:1-672): a
cyclic WINDOW_SIZE=20-word window slides over the document; each window
instance is ranked by its keyword matches with keyword heterogeneity
taken into account (CompileSummary.h:22-27 comment block + CompareWindows
:94-137 — keyword score first, then alignment to sentence/paragraph
boundaries, then term count); selected windows are extended to sentence
boundaries (SentenceStart/SentenceEnd :185-247); and candidate summaries
that overlap an already-accepted summary's word range are rejected as
"providing no new information" (SummaryOverlap.h:1-150, a range tree over
word-id bounds).

Re-expressed, not ported: the cyclic-array/red-black-tree machinery is an
artifact of streaming C++; over a result page's worth of docs the same
semantics are a vectorized numpy sweep —

1. tokenize keeping character offsets + sentence starts/ends;
2. window score = number of DISTINCT query terms in the window (the
   heterogeneity term: repeated keywords do not add), stopword query terms
   excluded (the reference's EXCLUDE_WORD list gates singular keywords);
3. windows rank (score desc, sentence-aligned start desc, window start
   asc) — the deterministic subset of CompareWindows that survives
   re-scoping to plain text (no paragraph markup in extracted text);
4. greedy accept: a window overlapping an accepted span is rejected
   (SummaryOverlap); an accepted window first TIGHTENS to its keyword
   bounds (the keyword_start/keyword_end the reference tracks per window,
   CompileSummary.h:168-171 — its keyword_align_offset ranking exists to
   punish keywords hugging one window edge), then extends left to the
   nearest sentence start within 10 words and right to the nearest
   sentence end within 15 words (the SentenceStart/SentenceEnd search
   budgets);
5. excerpts return in DOCUMENT order, capped at ``max_excerpts``.

Scale shape: summaries run per result doc over the top-k list —
candidate-sized, query-time, never a corpus job. The engine method
(QueryEngine.summaries) fetches only the result docs' text via parquet
predicate pushdown, like snippets().
"""

from __future__ import annotations

import re

import numpy as np

from ..kernel.tokenize import tokenize
from ..functions.text import STOPWORDS

WINDOW_SIZE = 20          # CompileSummary.h WINDOW_SIZE
MIN_WINDOW_TERMS = 6      # AddWindowInst: windows under 6 terms are skipped
SENT_START_BUDGET = 10    # SentenceStart backward search budget
SENT_END_BUDGET = 15      # SentenceEnd forward search budget

_WORD_RE = re.compile(r"[A-Za-z0-9]+")
_SENT_END_CHARS = ".!?"


def _words_with_bounds(text: str):
    """(tokens_lower, char_start, char_end, is_sentence_start,
    is_sentence_end) arrays for every word of ``text``, sentence flags from
    the punctuation between words."""
    toks, starts, ends = [], [], []
    for m in _WORD_RE.finditer(text):
        toks.append(m.group(0).lower())
        starts.append(m.start())
        ends.append(m.end())
    n = len(toks)
    sent_start = np.zeros(n, dtype=bool)
    sent_end = np.zeros(n, dtype=bool)
    if n:
        sent_start[0] = True
        sent_end[n - 1] = True
    for i in range(n - 1):
        between = text[ends[i]:starts[i + 1]]
        if any(ch in between for ch in _SENT_END_CHARS):
            sent_end[i] = True
            sent_start[i + 1] = True
    return (toks, np.array(starts, dtype=np.int64),
            np.array(ends, dtype=np.int64), sent_start, sent_end)


def summarize(text: str, query: str, max_excerpts: int = 3,
              window: int = WINDOW_SIZE) -> list[str]:
    """Up to ``max_excerpts`` non-overlapping sentence-aligned excerpts of
    ``text`` covering the query terms, in document order (module docstring
    for the reference mapping). Empty when no non-stopword query term
    occurs in the text."""
    qterms = {t for t in tokenize(query) if t not in STOPWORDS}
    if not qterms or not text:
        return []
    toks, starts, ends, sent_start, sent_end = _words_with_bounds(text)
    n = len(toks)
    if n == 0:
        return []
    w = min(window, n)
    if w < 1:
        return []
    # per-window DISTINCT-term score, vectorized: one 0/1 indicator row per
    # query term, prefix-summed; window score = sum over terms of
    # (any occurrence in window) — the heterogeneity ranking (repeats of
    # one keyword do not add)
    n_win = n - w + 1
    score = np.zeros(n_win, dtype=np.int64)
    tok_arr = np.array(toks)
    any_hit = np.zeros(n, dtype=bool)
    for t in sorted(qterms):
        ind = (tok_arr == t)
        if not ind.any():
            continue
        any_hit |= ind
        cs = np.concatenate(([0], np.cumsum(ind)))
        score += (cs[w:] - cs[:-w]) > 0
    if not score.any():
        return []
    # rank: score desc, sentence-aligned start desc, position asc
    order = np.lexsort((np.arange(n_win),
                        ~sent_start[:n_win],
                        -score))
    taken: list[tuple[int, int]] = []   # accepted [start, end] word spans
    for wi in order:
        wi = int(wi)
        if score[wi] == 0 or len(taken) >= max_excerpts:
            break
        lo, hi = wi, wi + w - 1
        # SummaryOverlap: reject windows overlapping an accepted span
        if any(lo <= te and hi >= ts for ts, te in taken):
            continue
        # tighten to the window's keyword bounds before sentence extension
        hits = np.flatnonzero(any_hit[lo:hi + 1])
        lo, hi = lo + int(hits[0]), lo + int(hits[-1])
        # SentenceStart: extend left to a sentence start within the budget,
        # stopping early at another keyword (it belongs to its own window)
        for _ in range(SENT_START_BUDGET):
            if sent_start[lo] or lo == 0:
                break
            if any_hit[lo - 1]:
                break
            lo -= 1
        # SentenceEnd: extend right within the budget
        for _ in range(SENT_END_BUDGET):
            if sent_end[hi] or hi == n - 1:
                break
            if any_hit[hi + 1]:
                break
            hi += 1
        # re-check overlap after extension
        if any(lo <= te and hi >= ts for ts, te in taken):
            continue
        taken.append((lo, hi))
    taken.sort()

    def char_end(e: int) -> int:
        # include the sentence terminator (and closing quotes/parens) that
        # immediately follows the last word — display text reads as a
        # sentence, not a clipped fragment
        j = int(e)
        while j < len(text) and text[j] in " .!?\")'":
            j += 1
        for k in range(j - 1, int(e) - 1, -1):
            if text[k] in ".!?":
                return k + 1
        return int(e)

    return [text[starts[lo]:char_end(ends[hi])].strip()
            for lo, hi in taken]


PHRASE_MAX_WORDS = 6   # ClusterPhrase clips phrases well under its
                       # MAX_SENTENCE_NUM=24 sentence cap


def phrase_labels(text: str, query: str, top_n: int = 3,
                  max_words: int = PHRASE_MAX_WORDS) -> list[str]:
    """Cluster-phrase labels for a document/excerpt — the reference's
    CClusterPhrase (DocumentQuery/ClusterPhrase.h:34-37: "cluster phrases
    are used as labels to describe a given excerpt so an excerpt can be
    grouped in some way"). Re-expressed: candidate phrases are contiguous
    word runs between punctuation breaks (the reference's comma/sentence
    predicates on SIndvWord) containing at least one query term, clipped to
    ``max_words`` around the keyword hits; ranked by (distinct query terms
    desc, shorter first, document position asc — CompareKeyPhrases ranks by
    keyword matches then term count); deduped case-insensitively. Returns
    up to ``top_n`` phrases in rank order, original casing."""
    qterms = {t for t in tokenize(query) if t not in STOPWORDS}
    if not qterms or not text:
        return []
    toks, starts, ends, sent_start, sent_end = _words_with_bounds(text)
    n = len(toks)
    if n == 0:
        return []
    # break AFTER word i when punctuation (comma or sentence end) follows
    brk = np.zeros(n, dtype=bool)
    brk[n - 1] = True
    for i in range(n - 1):
        if any(ch in text[ends[i]:starts[i + 1]] for ch in ",;:.!?"):
            brk[i] = True
    hit = np.array([t in qterms for t in toks])
    cands: list[tuple[int, int, int, int]] = []   # (-score, len, pos, lo)
    run_start = 0
    spans: list[tuple[int, int]] = []
    for i in range(n):
        if brk[i]:
            spans.append((run_start, i))
            run_start = i + 1
    for lo, hi in spans:
        hs = np.flatnonzero(hit[lo:hi + 1])
        if not hs.size:
            continue
        # clip the run to max_words centered on the keyword span
        klo, khi = lo + int(hs[0]), lo + int(hs[-1])
        while khi - klo + 1 > max_words:          # over-long keyword span:
            khi -= 1                              # keep the leading hits
        pad = max_words - (khi - klo + 1)
        plo = max(lo, klo - pad // 2)
        phi = min(hi, plo + max_words - 1)
        plo = max(lo, phi - max_words + 1)
        score = len({toks[j] for j in range(plo, phi + 1)
                     if toks[j] in qterms})
        cands.append((-score, phi - plo + 1, plo, phi))
    cands.sort()
    out, seen = [], set()
    for _negs, _ln, plo, phi in cands:
        phrase = text[starts[plo]:ends[phi]]
        key = phrase.lower()
        if key in seen:
            continue
        seen.add(key)
        out.append(phrase)
        if len(out) == top_n:
            break
    return out
