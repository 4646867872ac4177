"""Tokenizer kernel.

Re-expresses the reference's token rules (reference
DyableDocument/DyableIndex/DocumentInstance.h:94-109, charset
DataStructure.h:751-754, scanner MyStuff.h:1474-1527):

- a token is a maximal ``[A-Za-z0-9]+`` run; everything else is a delimiter
- lowercased
- kept only if length in [2, 16]
- all-digit tokens kept only if 4-5 digits long
- position = index in the *kept* token sequence (0-based)

Suffix-stemming in the reference only sets a flag on the hit (longest known
suffix match, MyStuff.h:6895-6974); it does not change the indexed string, so
BM25 terms here are the raw kept tokens. ``stem_suffix`` is provided for
parity/analysis but is not in the scoring path.

This module is pure Python/stdlib and is imported verbatim by both the Spark
Arrow UDFs and the oracle — token identity is by construction.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r"[A-Za-z0-9]+")

MIN_TOKEN_LEN = 2
MAX_TOKEN_LEN = 16
MIN_DIGIT_LEN = 4
MAX_DIGIT_LEN = 5

# Known suffixes, longest-match (reference keeps a reversed-suffix trie with
# suffixes of length >=3, capped at 6 chars — MyStuff.h:6895-6974).
_SUFFIXES = ("ations", "ation", "ings", "ingly", "tion", "ment", "ness",
             "able", "ible", "edly", "ing", "est", "ers", "ies", "ly",
             "ed", "er", "es", "s")


def keep_token(tok: str) -> bool:
    """Filter rule for an already-lowercased [a-z0-9]+ token."""
    n = len(tok)
    if n < MIN_TOKEN_LEN or n > MAX_TOKEN_LEN:
        return False
    if tok.isdigit() and not (MIN_DIGIT_LEN <= n <= MAX_DIGIT_LEN):
        return False
    return True


def tokenize(text: str) -> list[str]:
    """text -> kept, lowercased tokens in document order.

    (findall + inlined filter: this is the hot path of the whole index
    build — semantics identical to keep_token over each lowered match.)"""
    out = []
    append = out.append
    for tok in TOKEN_RE.findall(text):
        n = len(tok)
        if n < 2 or n > 16:
            continue
        tok = tok.lower()
        if tok.isdigit() and not (4 <= n <= 5):
            continue
        append(tok)
    return out


def tokenize_with_positions(text: str) -> list[tuple[str, int]]:
    """text -> [(token, position)] where position indexes the kept sequence."""
    return [(t, i) for i, t in enumerate(tokenize(text))]


def stem_suffix(tok: str) -> str | None:
    """Longest known suffix of the token (>=3 chars must remain as the stem),
    or None. Flag-only in the reference; exposed for text-analysis ops."""
    for suf in _SUFFIXES:
        if len(tok) - len(suf) >= 3 and tok.endswith(suf):
            return suf
    return None
