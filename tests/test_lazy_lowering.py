"""Two-phase lowering: make_automaton computes the sparse automaton (fail
links + CSR outputs) eagerly; the dense delta table materializes lazily.

Pins (a) sparse-scan/dense-scan parity on randomized corpora, (b) that the
lazy mode really defers the dense build, and (c) that results are identical
whichever phase a search hits.  Reference behavior baseline:
make_automaton = fail-link BFS only (src/Automaton.c:560-649); searches walk
fail chains at scan time (src/AutomatonSearchIter.c:157-300).
"""

import os
import random

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu import compiler, native


def _build(words, lower):
    old = os.environ.get("PYAHOCORASICK_TPU_LOWER")
    os.environ["PYAHOCORASICK_TPU_LOWER"] = lower
    try:
        A = ahocorasick.Automaton()
        for i, w in enumerate(words):
            A.add_word(w, i)
        A.make_automaton()
    finally:
        if old is None:
            del os.environ["PYAHOCORASICK_TPU_LOWER"]
        else:
            os.environ["PYAHOCORASICK_TPU_LOWER"] = old
    return A


WORDS = ["he", "her", "hers", "she", "shell", "x", "hex"]
HAY = "_sherhershe_hexhexshell_xx_"


def test_lazy_defers_dense():
    A = _build(WORDS, "lazy")
    assert not A._compiled.has_delta
    # sparse search works without the dense table
    res = list(A.iter(HAY))
    assert not A._compiled.has_delta
    B = _build(WORDS, "eager")
    assert B._compiled.has_delta
    assert res == list(B.iter(HAY))


def test_sparse_dense_parity_randomized():
    rng = random.Random(7)
    alphabet = "abc"
    words = list({
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(80)
    })
    hay = "".join(rng.choice(alphabet + "d") for _ in range(3000))
    A = _build(words, "lazy")
    B = _build(words, "eager")
    ra = list(A.iter(hay))
    rb = list(B.iter(hay))
    assert ra == rb
    assert not A._compiled.has_delta
    # find_all parity too
    got_a, got_b = [], []
    A.find_all(hay, lambda i, v: got_a.append((i, v)))
    B.find_all(hay, lambda i, v: got_b.append((i, v)))
    assert got_a == got_b == ra


def test_streaming_set_on_sparse():
    A = _build(WORDS, "lazy")
    it = A.iter("_sh")
    first = list(it)
    it.set("erhe")
    rest = list(it)
    whole = list(A.iter("_sherhe"))
    assert first + rest == whole
    assert not A._compiled.has_delta


def test_delta_property_builds_and_matches_sparse_tables():
    A = _build(WORDS, "lazy")
    c = A._compiled
    assert not c.has_delta
    delta = c.delta  # triggers the native threaded build
    assert c.has_delta
    S, K = c.num_states, c.num_classes
    assert delta.shape == (S, K)
    # dense transitions must agree with the sparse goto everywhere
    for s in range(S):
        for k in range(K):
            t = int(delta[s, k])
            # walk sparse goto from s on class k
            cur = s
            while True:
                lo, hi = int(c.child_off[cur]), int(c.child_off[cur + 1])
                nxt = -1
                for j in range(lo, hi):
                    if int(c.edge_cls[j]) == k:
                        nxt = j
                        break
                if nxt >= 0:
                    expected = nxt
                    break
                if cur == 0:
                    expected = 0
                    break
                cur = int(c.fail[cur])
            assert t == expected, (s, k, t, expected)


def test_numpy_fallback_matches_native():
    parent = None
    A = _build(WORDS, "eager")
    arrays = A._trie.bfs_arrays()
    parent, letter, eow, values = arrays
    native_c = compiler.compile_arrays(parent, letter, eow, values)
    if not native.available():
        pytest.skip("native core not built")
    os.environ["PYAHOCORASICK_TPU_NATIVE"] = "0"
    try:
        # force re-evaluation of availability
        native._TRIED = False
        native._EXT = None
        py_c = compiler.compile_arrays(parent, letter, eow, values)
    finally:
        del os.environ["PYAHOCORASICK_TPU_NATIVE"]
        native._TRIED = False
        native._EXT = None
    np.testing.assert_array_equal(native_c.fail, py_c.fail)
    np.testing.assert_array_equal(native_c.depth, py_c.depth)
    np.testing.assert_array_equal(native_c.word_id, py_c.word_id)
    np.testing.assert_array_equal(native_c.match_count, py_c.match_count)
    np.testing.assert_array_equal(native_c.out_offsets, py_c.out_offsets)
    np.testing.assert_array_equal(native_c.out_ids, py_c.out_ids)
    np.testing.assert_array_equal(native_c.root_goto, py_c.root_goto)
    np.testing.assert_array_equal(native_c.delta, py_c.delta)
