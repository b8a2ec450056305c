"""Bulk add_words parity with per-call add_word."""

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick


def test_add_words_basic():
    A = ahocorasick.Automaton()
    n = A.add_words(["he", "her", "he", ""], ["v1", "v2", "v3", "v4"])
    assert n == 2  # 'he' duplicate replaced, empty ignored
    assert len(A) == 2
    assert A.get("he") == "v3"  # replace semantics
    assert A.get("her") == "v2"


def test_add_words_matches_loop(rng):
    words = ["".join(chr(97 + c) for c in rng.integers(0, 4, rng.integers(1, 9)))
             for _ in range(500)]
    A = ahocorasick.Automaton()
    B = ahocorasick.Automaton()
    nb = 0
    for w in words:
        if B.add_word(w, w.upper()):
            nb += 1
    na = A.add_words(words, [w.upper() for w in words])
    assert na == nb
    assert sorted(A.items()) == sorted(B.items())
    A.make_automaton()
    B.make_automaton()
    hay = "".join(chr(97 + c) for c in rng.integers(0, 4, 3000))
    assert list(A.iter(hay)) == list(B.iter(hay))


def test_add_words_store_modes():
    L = ahocorasick.Automaton(ahocorasick.STORE_LENGTH)
    L.add_words(["abc", "de"])
    assert L.get("abc") == 3 and L.get("de") == 2

    I = ahocorasick.Automaton(ahocorasick.STORE_INTS)
    I.add_words(["a", "b"], [10, 20])
    assert I.get("a") == 10 and I.get("b") == 20
    # INTS without values falls back to per-call defaults
    J = ahocorasick.Automaton(ahocorasick.STORE_INTS)
    J.add_words(["x", "y"])
    assert J.get("x") == 1 and J.get("y") == 2

    S = ahocorasick.Automaton()
    with pytest.raises(ValueError):
        S.add_words(["a"])  # STORE_ANY requires values
    with pytest.raises(ValueError):
        S.add_words(["a"], [1, 2])  # length mismatch


def test_add_words_version_invalidation():
    A = ahocorasick.Automaton()
    A.add_word("x", 1)
    A.make_automaton()
    it = A.iter("x")
    A.add_words(["zz"], [2])
    assert A.kind == ahocorasick.TRIE
    with pytest.raises(ValueError):
        next(it)
