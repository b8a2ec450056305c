"""Differential tests for the n-gram suffix-membership cascade counting
engine (ops/cascade.py) against the classic engines, which are themselves
pinned to the reference.

Covers: mixed pattern lengths 1..8 (short exact bitmaps, device-verified
l=4, host-verified l>=5), small alphabets that force deep/overlapping
structure, shared last-4-gram buckets, halos (streaming continuation),
unknown characters, and gate behavior (wide alphabets fall back).
"""

import random

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu import engines
from pyahocorasick_tpu.ops import cascade


def _build(words):
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        A.add_word(w, i)
    A.make_automaton()
    return A


def _counts_oracle(A, hay, end_min=None):
    """Counts indexed by the engine's pattern-id space (compiled.values)."""
    pid_of = {v: p for p, v in enumerate(A._compiled.values)}
    counts = np.zeros(len(A), dtype=np.int64)
    for end, v in A.iter(hay):
        if end_min is None or end >= end_min:
            counts[pid_of[v]] += 1
    return counts


def _cascade_counts(A, hay, halo=None):
    compiled = A._compiled
    letters = A._marshal_haystack(hay)
    cls = compiled.classes_of(letters).astype(np.int32)
    return cascade.count_matches_cascade(compiled, cls, halo)


def _with_values(words):
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        A.add_word(w, (i, w))
    A.make_automaton()
    return A


WORDS_MIXED = [
    "a", "b", "ab", "ba", "abc", "bca", "aaa",
    "abca", "aaaa", "abab",
    "ababa", "aabaa", "abcabc", "aaaaaaa", "abababab",
]


def test_mixed_lengths_random_text():
    A = _with_values(WORDS_MIXED)
    rng = random.Random(3)
    hay = "".join(rng.choice("abc") for _ in range(5000))
    got = _cascade_counts(A, hay)
    assert got is not None
    np.testing.assert_array_equal(got, _counts_oracle(A, hay))


def test_repetitive_deep_text():
    # aaaa... keeps every position deep: exercises buckets + host verify
    A = _with_values(["aaa", "aaaa", "aaaaa", "aaaaaaaa", "ab", "b"])
    hay = "a" * 400 + "b" + "a" * 100 + "ab" * 50
    got = _cascade_counts(A, hay)
    assert got is not None
    np.testing.assert_array_equal(got, _counts_oracle(A, hay))


def test_shared_last4_buckets():
    # many patterns sharing the same last 4 characters
    words = [suf + "wxyz" for suf in ["", "a", "ab", "abc", "q"]] + ["wxy"]
    A = _with_values(words)
    hay = "abwxyzaabcwxyzqwxyzwxyz" * 20
    got = _cascade_counts(A, hay)
    assert got is not None
    np.testing.assert_array_equal(got, _counts_oracle(A, hay))


def test_bucket_overflow_gates_out():
    # > _MAX_BUCKET patterns with identical last-4-gram: builder refuses
    words = [c + "wxyz" for c in "abcdefghij"]
    A = _with_values(words)
    assert _cascade_counts(A, "awxyz") is None


def test_unknown_chars_and_boundaries():
    A = _with_values(["he", "her", "hers", "she", "shell"])
    hay = "_sherhershe_##shell?he"
    got = _cascade_counts(A, hay)
    assert got is not None
    np.testing.assert_array_equal(got, _counts_oracle(A, hay))


def test_halo_continuation_matches_engine():
    A = _with_values(["abcd", "bcda", "dab", "abcdabc"])
    rng = random.Random(9)
    hay = "".join(rng.choice("abcd") for _ in range(4000))
    compiled = A._compiled
    letters = A._marshal_haystack(hay)
    cls = compiled.classes_of(letters).astype(np.int32)
    cut = 1777
    halo, rest = cls[:cut], cls[cut:]
    got = cascade.count_matches_cascade(compiled, rest, halo=halo)
    assert got is not None
    np.testing.assert_array_equal(got, _counts_oracle(A, hay, end_min=cut))


def test_randomized_differential_sweep():
    rng = random.Random(17)
    for trial in range(6):
        sigma = rng.choice(["ab", "abc", "abcde"])
        nw = rng.randint(5, 60)
        words = list({
            "".join(rng.choice(sigma) for _ in range(rng.randint(1, 9)))
            for _ in range(nw)
        })
        A = _with_values(words)
        hay = "".join(
            rng.choice(sigma + "xy") for _ in range(rng.randint(500, 6000))
        )
        got = _cascade_counts(A, hay)
        assert got is not None, (trial, sigma)
        np.testing.assert_array_equal(
            got, _counts_oracle(A, hay), err_msg=f"trial {trial}"
        )


def test_engine_dispatch_uses_cascade(monkeypatch):
    monkeypatch.setenv("PYAHOCORASICK_TPU_ENGINE", "cascade")
    A = _with_values(["he", "her", "hers", "she"])
    counts = A.count_matches("_sherhershe_" * 10)
    assert int(counts.sum()) == 80


def test_empty_and_tiny_inputs():
    A = _with_values(["abc", "b"])
    got = _cascade_counts(A, "")
    assert got is not None and int(got.sum()) == 0
    got = _cascade_counts(A, "b")
    assert got is not None
    np.testing.assert_array_equal(got, _counts_oracle(A, "b"))
    got = _cascade_counts(A, "ab")
    np.testing.assert_array_equal(got, _counts_oracle(A, "ab"))


def test_halo_crossing_matches():
    # matches that START inside the halo and END in the chunk must count
    A = _with_values(["abcdefg", "cdef", "xyz"])
    hay = "___abcdefg___xyzcdef"
    compiled = A._compiled
    letters = A._marshal_haystack(hay)
    cls = compiled.classes_of(letters).astype(np.int32)
    for cut in range(1, len(hay) - 1):
        halo, rest = cls[:cut], cls[cut:]
        got = cascade.count_matches_cascade(compiled, rest, halo=halo)
        assert got is not None
        want = _counts_oracle(A, hay, end_min=cut)
        np.testing.assert_array_equal(got, want, err_msg=f"cut={cut}")


def test_short_on_host_mode_matches():
    A = _with_values(WORDS_MIXED)
    rng = random.Random(5)
    hay = "".join(rng.choice("abc") for _ in range(4000))
    compiled = A._compiled
    letters = A._marshal_haystack(hay)
    cls = compiled.classes_of(letters).astype(np.int32)
    a = cascade.count_matches_cascade(compiled, cls, short_on_host=True)
    b = cascade.count_matches_cascade(compiled, cls, short_on_host=False)
    assert a is not None and b is not None
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, _counts_oracle(A, hay))
    # with a halo too
    cut = 1203
    a = cascade.count_matches_cascade(
        compiled, cls[cut:], halo=cls[:cut], short_on_host=True
    )
    np.testing.assert_array_equal(a, _counts_oracle(A, hay, end_min=cut))
