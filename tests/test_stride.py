"""Stride-2 engine parity: packed pair-table totals vs the oracle."""

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu.ops import stride


def _build(words):
    A = ahocorasick.Automaton()
    for w in words:
        A.add_word(w, w)
    A.make_automaton()
    return A


def test_stride2_build_and_total(rng):
    words = set()
    while len(words) < 80:
        n = rng.integers(1, 9)
        words.add("".join("acgt"[c] for c in rng.integers(0, 4, n)))
    A = _build(sorted(words))
    compiled = A._compiled
    s2 = stride.build_stride2(compiled)
    assert s2 is not None

    hay = "".join("acgt"[c] for c in rng.integers(0, 4, 100001))  # odd length
    cls = compiled.classes_of(
        np.frombuffer(hay.encode("utf-32-le"), dtype=np.uint32)
    ).astype(np.int32)

    total = stride.count_total_stride2(compiled, cls, block=64)
    expected = int(A.count_matches(hay).sum())
    assert total == expected


def test_stride2_with_halo(rng):
    A = _build(["acg", "cgt", "t"])
    compiled = A._compiled
    hay = "acgtacgt" * 100
    letters = np.frombuffer(hay.encode("utf-32-le"), dtype=np.uint32)
    cls = compiled.classes_of(letters).astype(np.int32)
    # split: halo from the first part must carry into the second
    split = 331
    t1 = stride.count_total_stride2(compiled, cls[:split], block=64)
    t2 = stride.count_total_stride2(
        compiled, cls[split:], halo=cls[:split], block=64
    )
    assert t1 + t2 == int(A.count_matches(hay).sum())


def test_count_total_api(rng):
    A = _build(["ab", "ba"])
    hay = "abab" * 10
    assert A.count_total(hay) == int(A.count_matches(hay).sum())


def test_stride2_infeasible_fallback():
    # huge synthetic alphabet makes K^2 blow past the budget -> returns None
    A = ahocorasick.Automaton()
    for i in range(300):
        A.add_word(chr(0x4E00 + i) + chr(0x4E00 + (i * 7) % 300), i)
    A.make_automaton()
    compiled = A._compiled
    s2 = stride.build_stride2(compiled, max_bytes=1000)
    assert s2 is None
