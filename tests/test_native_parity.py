"""Differential tests: native C++ backend vs the pure-Python oracle.

Runs the same randomized operation sequence against both trie backends and
asserts identical observable behavior (the reference's role for its
pure-Python twin, etc/py/pyahocorasick.py).
"""

import pickle

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native core not built"
)


def _build_pair(monkeypatch_env=None):
    import os

    A = ahocorasick.Automaton()  # native by default when available
    os.environ["PYAHOCORASICK_TPU_NATIVE"] = "0"
    try:
        from pyahocorasick_tpu.trie import Trie

        B = ahocorasick.Automaton()
        B._trie = Trie()  # force python backend
    finally:
        os.environ.pop("PYAHOCORASICK_TPU_NATIVE", None)
    return A, B


def test_random_op_sequence(rng):
    A, B = _build_pair()
    assert isinstance(A._trie, native.NativeTrie)

    words = []
    for step in range(3000):
        op = rng.integers(0, 10)
        n = int(rng.integers(1, 7))
        w = "".join(chr(97 + c) for c in rng.integers(0, 3, n))
        if op < 6:
            assert A.add_word(w, w) == B.add_word(w, w)
            words.append(w)
        elif op < 8:
            assert A.remove_word(w) == B.remove_word(w)
        else:
            assert A.exists(w) == B.exists(w)
            assert A.match(w) == B.match(w)
            assert A.longest_prefix(w + "xyz") == B.longest_prefix(w + "xyz")
            assert A.get(w, None) == B.get(w, None)

    assert len(A) == len(B)
    assert sorted(A.keys()) == sorted(B.keys())
    assert sorted(A.items()) == sorted(B.items())
    assert A.get_stats() == B.get_stats()

    A.make_automaton()
    B.make_automaton()
    hay = "".join(chr(97 + c) for c in rng.integers(0, 3, 4000))
    assert list(A.iter(hay)) == list(B.iter(hay))
    assert list(A.iter_long(hay)) == list(B.iter_long(hay))
    assert np.array_equal(A.count_matches(hay), B.count_matches(hay))

    # persistence round-trips across backends
    A2 = pickle.loads(pickle.dumps(A))
    assert list(A2.iter(hay)) == list(B.iter(hay))


def test_native_iter_long_streaming(rng):
    A = ahocorasick.Automaton()
    for w in ["he", "her", "hers", "she"]:
        A.add_word(w, w)
    A.make_automaton()
    assert isinstance(A._trie, native.NativeTrie)
    it = A.iter_long("_sherhershe_")
    assert list(it) == [(3, "she"), (8, "hers"), (10, "he")]
    it.set("_sherhershe_")
    assert list(it) == [(15, "she"), (20, "hers"), (22, "he")]


def test_native_remove_structures():
    A = ahocorasick.Automaton()
    for w in ["he", "her", "hers", "she"]:
        A.add_word(w, w)
    assert A.remove_word("hers")
    assert A.get_stats()["nodes_count"] == 7  # 's' tail pruned
    assert A.remove_word("he")
    assert "her" in A
    assert A.get_stats()["words_count"] == 2
