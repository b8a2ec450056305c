"""Pallas VMEM sweep-gather kernel: interpret-mode parity vs the oracle."""

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu.ops import cpu, pallas_scan


def build(words):
    A = ahocorasick.Automaton()
    for w in words:
        A.add_word(w, w)
    A.make_automaton()
    return A


def test_table_fits_logic():
    A = build(["he", "she"])
    assert pallas_scan.table_fits(A._compiled)


def test_pallas_states_parity(rng):
    words = sorted(
        {"".join(chr(97 + c) for c in rng.integers(0, 3, rng.integers(1, 6)))
         for _ in range(40)}
    )
    A = build(words)
    compiled = A._compiled
    assert pallas_scan.table_fits(compiled)

    hay = "".join(chr(97 + c) for c in rng.integers(0, 3, 7001))
    cls = compiled.classes_of(
        np.frombuffer(hay.encode("utf-32-le"), np.uint32)
    ).astype(np.int32)

    signed = pallas_scan.scan_signed_pallas(compiled, cls, interpret=True)
    states = signed & 0x7FFFFFFF
    flags = signed < 0

    expected = cpu.scan_states_seq(compiled, cls)
    assert np.array_equal(states, expected)
    assert np.array_equal(flags, compiled.match_count[expected] > 0)


def test_pallas_halo_carry(rng):
    A = build(["abc", "cab"])
    compiled = A._compiled
    hay = "abcab" * 500
    cls = compiled.classes_of(
        np.frombuffer(hay.encode("utf-32-le"), np.uint32)
    ).astype(np.int32)
    split = 1234
    s1 = pallas_scan.scan_signed_pallas(compiled, cls[:split], interpret=True)
    s2 = pallas_scan.scan_signed_pallas(
        compiled, cls[split:], halo=cls[:split], interpret=True
    )
    whole = cpu.scan_states_seq(compiled, cls)
    got = np.concatenate([s1 & 0x7FFFFFFF, s2 & 0x7FFFFFFF])
    assert np.array_equal(got, whole)


def test_pallas_rejects_big_automata():
    A = ahocorasick.Automaton()
    for i in range(2000):
        A.add_word("w%06d" % i, i)
    A.make_automaton()
    assert not pallas_scan.table_fits(A._compiled)
    with pytest.raises(ValueError):
        pallas_scan.scan_signed_pallas(
            A._compiled, np.zeros(10, np.int32), interpret=True
        )
