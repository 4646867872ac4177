"""Spell check / did-you-mean (operators/spell.py): the vectorized
SpellIndex DP must equal a brute-force reference Levenshtein, and
QueryEngine.did_you_mean must correct only unknown terms, ranked
(dist, df desc, term)."""

import random

import pytest

from hadoopsearchengine_spark.operators.spell import SpellIndex
from hadoopsearchengine_spark.operators.wand import QueryEngine


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_spellindex_matches_bruteforce():
    rng = random.Random(11)
    vocab = {}
    alpha = "abcdefg"
    for _ in range(400):
        t = "".join(rng.choice(alpha) for _ in range(rng.randint(2, 9)))
        vocab[t] = rng.randint(1, 500)
    idx = SpellIndex(vocab)
    for q in ("abcde", "gfe", "aaaaaaa", "bcdf", "xyz", "a"):
        got = idx.suggest(q, max_dist=2, topn=5)
        want = sorted(((d, -df, t) for t, df in vocab.items()
                       if (d := _lev(q, t)) <= 2))[:5]
        assert got == [(t, d, -ndf) for d, ndf, t in want], q
        for t, d, df in got:
            assert _lev(q, t) == d and vocab[t] == df


def test_spellindex_edges():
    idx = SpellIndex({"hello": 3})
    assert idx.suggest("") == []
    assert idx.suggest("x" * 40) == []          # beyond MAX_TERM_LEN
    assert idx.suggest("zzzzzzzzzzzz") == []    # out of length band
    assert SpellIndex({}).suggest("hello") == []


def test_did_you_mean_on_index(index_dir):
    eng = QueryEngine(index_dir)
    known = max(eng.term_df, key=lambda t: (eng.term_df[t], t))
    assert eng.did_you_mean(known) == {}        # known terms untouched
    typo = known[0] + known[2:] if len(known) >= 4 else known + "q"
    if typo in eng.term_id:
        pytest.skip("mutation collided with a real term")
    sugg = eng.did_you_mean(typo, max_dist=2, topn=3)
    assert list(sugg) == [typo]
    ranked = sugg[typo]
    assert known in [t for t, _, _ in ranked]
    assert ranked == sorted(ranked, key=lambda x: (x[1], -x[2], x[0]))
    # mixed query: only the unknown half is corrected
    mixed = eng.did_you_mean(f"{known} {typo}")
    assert list(mixed) == [typo]
