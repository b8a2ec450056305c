"""Reduced-scale ports of the reference's manual stress scripts
(reference tests/pickle_stresstest.py, tests/removeword_stresstest.py) —
run automatically instead of by hand, at sizes that keep the suite fast.
"""

import pickle
import random

import pytest

import pyahocorasick_tpu as ahocorasick

CHARS = "abcdefghijklmnopqestuvwxyzABCDEFGHIJKLMNOPQESTUVWXYZ0123456789.,;:-"


def _random_words(n, seed, lo=1, hi=16):
    rng = random.Random(seed)
    return list(
        {
            "".join(rng.choice(CHARS) for _ in range(rng.randint(lo, hi)))
            for _ in range(n)
        }
    )


def test_pickle_stress_roundtrip():
    # reference pickle_stresstest.py: big random dictionary, pickle, compare
    words = _random_words(20_000, seed=5)
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        A.add_word(w, i)
    A.make_automaton()
    blob = pickle.dumps(A)
    B = pickle.loads(blob)
    assert B.kind == A.kind
    assert len(B) == len(A)
    assert sorted(A.items()) == sorted(B.items())
    hay = "".join(words[:200])
    assert list(A.iter(hay)) == list(B.iter(hay))


def test_pickle_stress_trie_kind_and_values():
    words = _random_words(5_000, seed=6)
    A = ahocorasick.Automaton()
    for w in words:
        A.add_word(w, (len(w), w))
    B = pickle.loads(pickle.dumps(A))  # TRIE kind (no make_automaton)
    assert B.kind == ahocorasick.TRIE
    for w in words[:500]:
        assert B.get(w) == (len(w), w)


def test_removeword_stress_full_drain():
    # reference removeword_stresstest.py: insert a dictionary, then remove
    # every word in random order, validating state at each step (sampled)
    words = _random_words(4_000, seed=7)
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        assert A.add_word(w, i)
    assert len(A) == len(words)

    rng = random.Random(8)
    shuffled = words[:]
    rng.shuffle(shuffled)
    for k, w in enumerate(shuffled):
        assert A.remove_word(w), w
        assert not A.remove_word(w)  # second removal reports absence
        if k % 500 == 0:
            assert not A.exists(w)
            assert len(A) == len(words) - k - 1
            # spot-check a few survivors
            for s in shuffled[k + 1 : k + 4]:
                assert A.exists(s), s
    assert len(A) == 0
    stats = A.get_stats()
    assert stats["words_count"] == 0


def test_removeword_stress_interleaved_with_compile():
    # removals must downgrade kind and invalidate compiled state correctly
    words = _random_words(1_000, seed=9)
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        A.add_word(w, i)
    rng = random.Random(10)
    victims = rng.sample(words, 50)
    for i, w in enumerate(victims):
        A.make_automaton()
        assert A.kind == ahocorasick.AHOCORASICK
        assert A.remove_word(w)
        assert A.kind == ahocorasick.TRIE  # reference src/trie.c:134
    A.make_automaton()
    # every removed word must be gone; every survivor queryable
    for w in victims:
        assert not A.exists(w)
    survivors = [w for w in words if w not in set(victims)]
    for w in survivors[:100]:
        assert A.exists(w)
