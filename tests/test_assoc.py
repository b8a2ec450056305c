"""Associative-scan cross-check engine (SURVEY §5.7 option ii): the
transition-composition decomposition must agree with both the sequential
oracle and the halo-blocked scan on every input — it makes no bounded-
history assumption, so agreement independently validates the halo proof
sketch of ops/cpu.py."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu.ops import assoc, cpu


def _build(words):
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        A.add_word(w, (i, w))
    A.make_automaton()
    return A


def _cls(compiled, text):
    return compiled.classes_of(
        np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    ).astype(np.int32)


def test_assoc_matches_oracle_canonical():
    A = _build("he her hers she".split())
    compiled = A._compiled
    cls = _cls(compiled, "_sherhershe_")
    want = cpu.scan_states_seq(compiled, cls, 0)
    got = assoc.scan_states_assoc(compiled, cls, block=4)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("block", [1, 3, 16, 257])
def test_assoc_block_size_invariant(block):
    rng = np.random.default_rng(7)
    words = [
        "".join(rng.choice(list("abc"), rng.integers(1, 9)))
        for _ in range(50)
    ]
    A = _build(list(set(words)))
    compiled = A._compiled
    text = "".join(rng.choice(list("abc_"), 700))
    cls = _cls(compiled, text)
    want = cpu.scan_states_seq(compiled, cls, 0)
    got = assoc.scan_states_assoc(compiled, cls, block=block)
    np.testing.assert_array_equal(got, want)


def test_assoc_agrees_with_halo_blocked_scan():
    """The two exact decompositions (bounded-history halo vs associative
    composition) must coincide — including with a nonempty halo carry."""
    rng = np.random.default_rng(11)
    words = list(
        {
            "".join(rng.choice(list("ab"), rng.integers(1, 12)))
            for _ in range(80)
        }
    )
    A = _build(words)
    compiled = A._compiled
    text = "".join(rng.choice(list("ab"), 2000))
    cls = _cls(compiled, text)
    halo = _cls(compiled, "abba" * 5)

    blocked = cpu.scan_states_blocked(compiled, cls, halo)
    got = assoc.scan_states_assoc(compiled, cls, halo, block=64)
    np.testing.assert_array_equal(got, blocked)


def test_assoc_worst_case_deep_state_carry():
    """Pattern 'a'*20 over all-'a' input: the automaton state carries
    unbounded history across every block boundary — the case the halo
    argument must handle and assoc handles trivially."""
    A = _build(["a" * 20, "aa"])
    compiled = A._compiled
    cls = _cls(compiled, "a" * 300)
    want = cpu.scan_states_seq(compiled, cls, 0)
    got = assoc.scan_states_assoc(compiled, cls, block=7)
    np.testing.assert_array_equal(got, want)


def test_assoc_gate():
    A = _build(["x"])
    compiled = A._compiled
    cls = _cls(compiled, "xxx")
    old = assoc._ASSOC_MAX_STATES
    try:
        assoc._ASSOC_MAX_STATES = 1
        with pytest.raises(ValueError, match="assoc engine gated"):
            assoc.scan_states_assoc(compiled, cls)
    finally:
        assoc._ASSOC_MAX_STATES = old


def test_assoc_empty_input():
    A = _build(["ab"])
    got = assoc.scan_states_assoc(A._compiled, np.empty(0, np.int32))
    assert got.size == 0
