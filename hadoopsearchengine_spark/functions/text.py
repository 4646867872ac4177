"""Text-analysis column functions, all JVM-side (whole-stage codegen — no
Python in the hot path).

``tokens_col`` is the engine tokenizer (kernel.tokenize rules) expressed as a
Catalyst expression tree: regexp_extract_all + transform + filter. It is
provably equivalent to the Python kernel (tests/test_functions.py checks them
against each other row-by-row) — so the `documents`-table ops run fully
vectorized in the JVM while the `pages` index pipeline shares the Python
kernel with the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ~50 English stopwords (the reference ships StopWords/ExcludeWords lists,
# FileStorage.h:592-607; this is our own public-knowledge list)
STOPWORDS = (
    "the and of to in is was for on that with as are this by at from it an "
    "be or which not have has had were their they them then than but when "
    "into also its more some can may will would could should these those "
    "over under after before between all each other there about out up down "
).split()


def tokens_col(c: Column) -> Column:
    """Kernel tokenizer as a JVM expression: maximal [A-Za-z0-9]+ runs of the
    RAW text, each token lowercased, length in [2,16], all-digit tokens only
    if 4-5 digits. Extract-then-lower (not lower-then-extract) to match
    kernel.tokenize exactly: lowercasing first can change token boundaries
    for characters like 'İ' whose lowercase is 'i' + a combining mark."""
    toks = F.transform(
        F.regexp_extract_all(c, F.lit("[A-Za-z0-9]+"), 0),
        lambda x: F.lower(x))
    return F.filter(
        toks,
        lambda x: F.length(x).between(2, 16)
        & (~x.rlike("^[0-9]+$") | F.length(x).between(4, 5)),
    )


def tokens_sql(col: str = "text") -> str:
    """The same tokenizer as DuckDB SQL (oracle side); extract-then-lower,
    see tokens_col."""
    return (
        f"list_filter(list_transform(regexp_extract_all({col}, "
        "'[A-Za-z0-9]+'), t -> lower(t)), "
        "t -> len(t) between 2 and 16 and "
        "(not regexp_matches(t, '^[0-9]+$') or len(t) between 4 and 5))"
    )


def char_shingles_df(df, text_col: str, id_col: str, k: int = 8):
    """Distinct k-char shingles per doc: (id, shingle). JVM-side via
    sequence+explode (no UDF). The shingle basis for MinHash/Jaccard dedup."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.greatest(F.length(text_col) - (k - 1), F.lit(1))),
                    lambda i: F.col(text_col).substr(i, F.lit(k)),
                )
            )
        ).alias("shingle"),
    )


def langid_col(tokens: Column) -> Column:
    """n-gram-free language-ID heuristic: share of tokens that are English
    stopwords. >= 8% -> 'en', no tokens -> 'empty', else 'unk'."""
    n = F.size(tokens)
    hits = F.size(F.filter(tokens, lambda x: x.isin(STOPWORDS)))
    return (F.when(n == 0, F.lit("empty"))
             .when(hits / n >= 0.08, F.lit("en"))
             .otherwise(F.lit("unk")))


def quality_cols(text: Column, tokens: Column) -> list[Column]:
    """Quality-scoring features: char count, token count, mean token length,
    stopword ratio, punctuation ratio (rounded for cross-engine stability)."""
    n_tok = F.size(tokens)
    n_char = F.length(text)
    stop = F.size(F.filter(tokens, lambda x: x.isin(STOPWORDS)))
    punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    mean_len = F.when(
        n_tok > 0,
        F.aggregate(tokens, F.lit(0), lambda a, x: a + F.length(x))
        .cast("double") / n_tok).otherwise(F.lit(0.0))

    # floor-truncate instead of round: these are ratios of exact integers, so
    # both engines hold the identical double and floor agrees everywhere,
    # while round() tie-breaking differs between Spark and DuckDB
    def trunc6(c):
        return F.floor(c * 1000000.0) / 1000000.0

    return [
        n_char.alias("n_chars"),
        n_tok.alias("n_tokens"),
        trunc6(mean_len).alias("mean_token_len"),
        trunc6(F.when(n_tok > 0, stop.cast("double") / n_tok)
                .otherwise(F.lit(0.0))).alias("stopword_ratio"),
        trunc6(punct.cast("double") / F.greatest(n_char, F.lit(1)))
        .alias("punct_ratio"),
    ]


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase text
    (exact-dup key robust to spacing)."""
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(norm)


# PII patterns shared by pii_scrub_cols and the DuckDB oracle: simple-regex
# subset that means the same thing in Java regex and RE2 (character classes
# and bounded repetition only — no lookaround, no backrefs). Applied in
# list order: emails first (their local part may contain digits a later
# pattern could chew into), then IPs, then international-format phones.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
     "<IP>"),
    ("phone", r"\+[0-9][0-9 -]{6,14}[0-9]", "<PHONE>"),
]


def pii_scrub_cols(text: Column) -> list[Column]:
    """[clean_text, n_email, n_ip, n_phone] — typed-placeholder PII
    redaction for training corpora (emails / IPv4s / international-format
    phones), entirely JVM regexp_replace/regexp_count (whole-stage
    codegen, zero shuffle: scrubbing is row-local). Counts are taken
    BEFORE any replacement so they are order-independent; replacements
    cascade in PII_PATTERNS order."""
    counts = [F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{n}")
              for n, pat, _ in PII_PATTERNS]
    clean = text
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return [clean.alias("clean_text")] + counts
