"""Canonical conformance corpus from the reference test suite.

Fixture and expected match list mirror reference tests/test_unit.py:530-556:
words "he her hers she" over haystack "_sherhershe_"; every engine must
reproduce the exact (end_index, value) sequence including ordering.
"""

import pytest

import pyahocorasick_tpu as ahocorasick

WORDS = "he her hers she".split()
STRING = "_sherhershe_"
CORRECT = [
    (3, "she"),
    (3, "he"),
    (4, "her"),
    (6, "he"),
    (7, "her"),
    (8, "hers"),
    (10, "she"),
    (10, "he"),
]


def make_automaton():
    A = ahocorasick.Automaton()
    for w in WORDS:
        A.add_word(w, w)
    A.make_automaton()
    return A


def test_iter_matches_reference(engine):
    A = make_automaton()
    assert list(A.iter(STRING)) == CORRECT


def test_find_all_equals_iter(engine):
    A = make_automaton()
    got = []
    A.find_all(STRING, lambda idx, val: got.append((idx, val)))
    assert got == CORRECT


def test_iter_start_end(engine):
    A = make_automaton()
    # reference: iter(string, start, end) scans the slice from the root
    assert list(A.iter(STRING, 0, 4)) == [(3, "she"), (3, "he")]
    assert list(A.iter(STRING, 2)) == [
        (3, "he"),
        (4, "her"),
        (6, "he"),
        (7, "her"),
        (8, "hers"),
        (10, "she"),
        (10, "he"),
    ]


def test_kind_lifecycle():
    A = ahocorasick.Automaton()
    assert A.kind == ahocorasick.EMPTY
    A.make_automaton()
    assert A.kind == ahocorasick.EMPTY  # empty trie is never converted
    A.add_word("he", "he")
    assert A.kind == ahocorasick.TRIE
    A.make_automaton()
    assert A.kind == ahocorasick.AHOCORASICK
    A.add_word("rollback?", True)
    assert A.kind == ahocorasick.TRIE


def test_iter_requires_automaton():
    A = ahocorasick.Automaton()
    A.add_word("he", "he")
    with pytest.raises(AttributeError):
        A.iter("he")


def test_find_all_noop_before_make():
    A = ahocorasick.Automaton()
    A.add_word("he", "he")
    got = []
    assert A.find_all(STRING, lambda *a: got.append(a)) is None
    assert got == []


def test_iterator_invalidation(engine):
    A = make_automaton()
    it = A.iter(STRING)
    next(it)
    A.add_word("new", "new")
    with pytest.raises(ValueError):
        next(it)


def test_streaming_set(engine):
    # reference docs/index.rst:122-157: chunked scanning with global indices
    A = make_automaton()
    it = A.iter("_sherhershe_")
    first = [next(it) for _ in range(8)]
    assert first == CORRECT
    with pytest.raises(StopIteration):
        next(it)
    it.set("_sherhershe_")
    assert list(it) == [(idx + 12, val) for idx, val in CORRECT]


def test_streaming_set_carries_state(engine):
    A = make_automaton()
    it = A.iter("_sh")
    assert list(it) == []
    it.set("e")  # "she"/"he" complete across the chunk boundary
    assert list(it) == [(3, "she"), (3, "he")]


def test_streaming_set_reset(engine):
    A = make_automaton()
    it = A.iter("_sh")
    assert list(it) == []
    it.set("e", True)
    assert list(it) == []


def test_values_and_stores(engine):
    A = ahocorasick.Automaton(ahocorasick.STORE_LENGTH)
    for w in WORDS:
        A.add_word(w)
    A.make_automaton()
    assert list(A.iter(STRING)) == [(i, len(v)) for i, v in CORRECT]

    B = ahocorasick.Automaton(ahocorasick.STORE_INTS)
    for i, w in enumerate(WORDS):
        B.add_word(w, i + 100)
    B.make_automaton()
    expected = {w: i + 100 for i, w in enumerate(WORDS)}
    assert list(B.iter(STRING)) == [(i, expected[v]) for i, v in CORRECT]


def test_key_sequence(engine):
    A = ahocorasick.Automaton(ahocorasick.STORE_ANY, ahocorasick.KEY_SEQUENCE)
    words = [tuple(map(ord, w)) for w in WORDS]
    for w in words:
        A.add_word(w, w)
    A.make_automaton()
    haystack = tuple(map(ord, STRING))
    got = list(A.iter(haystack))
    assert got == [(i, tuple(map(ord, v))) for i, v in CORRECT]


def test_large_random_parity(engine, rng):
    """Differential test: random dictionary + haystack, engine vs oracle."""
    import os

    words = set()
    while len(words) < 200:
        n = rng.integers(2, 8)
        words.add("".join(chr(97 + c) for c in rng.integers(0, 4, n)))
    A = ahocorasick.Automaton()
    for w in words:
        A.add_word(w, w)
    A.make_automaton()
    haystack = "".join(chr(97 + c) for c in rng.integers(0, 4, 5000))

    got = list(A.iter(haystack))

    # oracle: naive scan
    expected = []
    for end in range(len(haystack)):
        for w in sorted(words, key=len, reverse=True):
            if haystack.endswith(w, 0, end + 1):
                expected.append((end, w))
    assert got == expected
