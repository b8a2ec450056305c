"""Differential tests for cascade full-match emission (ops/cascade_emit.py)
against the sequential oracle's iter() output — positions, pattern ids AND
reference emission order (end ascending, longest-first at equal end;
reference src/AutomatonSearchIter.c:157-197)."""

import random

import numpy as np

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu.ops import cascade_emit


def _with_values(words):
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        A.add_word(w, (i, w))
    A.make_automaton()
    return A


def _oracle_pairs(A, hay, end_min=None):
    pid_of = {v: p for p, v in enumerate(A._compiled.values)}
    out = []
    for end, v in A.iter(hay):
        if end_min is None or end >= end_min:
            out.append((end, pid_of[v]))
    return out


def _emit(A, hay, halo=None, base=0):
    compiled = A._compiled
    letters = A._marshal_haystack(hay)
    cls = compiled.classes_of(letters).astype(np.int32)
    if halo is not None:
        cut = halo
        return cascade_emit.emit_matches_cascade(
            compiled, cls[cut:], halo=cls[:cut], base=base
        )
    return cascade_emit.emit_matches_cascade(compiled, cls, base=base)


def _check(A, hay):
    res = _emit(A, hay)
    assert res is not None
    pos, pids = res
    want = _oracle_pairs(A, hay)
    got = list(zip(pos.tolist(), pids.tolist()))
    # note: oracle end indexes are end-of-match (inclusive), engine emits the
    # same convention via engines.emit parity
    assert got == want


WORDS_MIXED = [
    "a", "b", "ab", "ba", "abc", "bca", "aaa",
    "abca", "aaaa", "abab",
    "ababa", "aabaa", "abcabc", "aaaaaaa", "abababab",
]


def test_mixed_lengths_emission_order():
    A = _with_values(WORDS_MIXED)
    rng = random.Random(3)
    hay = "".join(rng.choice("abc") for _ in range(3000))
    _check(A, hay)


def test_repetitive_deep_text_emission():
    A = _with_values(["aaa", "aaaa", "aaaaa", "aaaaaaaa", "ab", "b"])
    hay = "a" * 300 + "b" + "a" * 80 + "ab" * 40
    _check(A, hay)


def test_classic_fixture_emission():
    A = _with_values(["he", "her", "hers", "she"])
    _check(A, "_sherhershe_" * 5)


def test_halo_and_base_offsets():
    A = _with_values(["abcd", "bcda", "dab", "abcdabc", "ab", "c"])
    rng = random.Random(9)
    hay = "".join(rng.choice("abcd") for _ in range(2500))
    compiled = A._compiled
    cut = 1009
    res = _emit(A, hay, halo=cut, base=cut)
    assert res is not None
    pos, pids = res
    want = _oracle_pairs(A, hay, end_min=cut)
    assert list(zip(pos.tolist(), pids.tolist())) == want


def test_randomized_differential_sweep_emission():
    rng = random.Random(23)
    for trial in range(5):
        sigma = rng.choice(["ab", "abc", "abcde"])
        nw = rng.randint(5, 50)
        words = list({
            "".join(rng.choice(sigma) for _ in range(rng.randint(1, 9)))
            for _ in range(nw)
        })
        A = _with_values(words)
        hay = "".join(
            rng.choice(sigma + "xy") for _ in range(rng.randint(400, 4000))
        )
        res = _emit(A, hay)
        assert res is not None, (trial, sigma)
        pos, pids = res
        assert list(zip(pos.tolist(), pids.tolist())) == _oracle_pairs(A, hay), (
            f"trial {trial}"
        )


def test_no_short_patterns_emission():
    # pure deep dictionary: the short machinery must stay disabled
    A = _with_values(["abcd", "abcde", "bcdea", "eabcd", "abcdeabcd"])
    rng = random.Random(7)
    hay = "".join(rng.choice("abcde") for _ in range(3000))
    _check(A, hay)


def test_empty_results_emission():
    A = _with_values(["zzz", "qqq"])
    res = _emit(A, "ababababab")
    assert res is not None
    pos, pids = res
    assert pos.size == 0 and pids.size == 0


def test_engine_dispatch_emission(monkeypatch):
    monkeypatch.setenv("PYAHOCORASICK_TPU_ENGINE", "cascade")
    A = _with_values(["he", "her", "hers", "she"])
    hay = "_sherhershe_" * 8
    got = list(A.find_all_arrays(hay)) if hasattr(A, "find_all_arrays") else None
    # public-path parity: iter() pairs equal the forced-cascade search output
    res = []
    A2 = _with_values(["he", "her", "hers", "she"])
    for end, v in A2.iter(hay):
        res.append((end, v))
    out = []

    def cb(end, v):
        out.append((end, v))

    A.find_all(hay, cb)
    assert out == res


def test_windowed_emission_matches_single_shot(monkeypatch):
    # force tiny windows so the multi-window path runs on CPU test sizes
    monkeypatch.setenv("PYAHOCORASICK_TPU_SEG_LOG2", "10")
    A = _with_values(WORDS_MIXED)
    rng = random.Random(11)
    hay = "".join(rng.choice("abc") for _ in range(5000))
    _check(A, hay)


def test_windowed_emission_with_halo(monkeypatch):
    monkeypatch.setenv("PYAHOCORASICK_TPU_SEG_LOG2", "10")
    A = _with_values(["abcd", "bcda", "dab", "ab", "c", "abcdabc"])
    rng = random.Random(13)
    hay = "".join(rng.choice("abcd") for _ in range(4200))
    cut = 701
    res = _emit(A, hay, halo=cut, base=cut)
    assert res is not None
    pos, pids = res
    assert list(zip(pos.tolist(), pids.tolist())) == _oracle_pairs(
        A, hay, end_min=cut
    )


def test_emit_fused_and_windowed_agree(monkeypatch):
    """The fused candidate path (default) and the windowed v2 core must
    produce identical reference-order streams."""
    import random

    rng = random.Random(21)
    words = sorted(
        {
            "".join(rng.choice("abcdefg") for _ in range(rng.randint(1, 9)))
            for _ in range(120)
        }
    )
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        A.add_word(w, i)
    A.make_automaton()
    compiled = A._compiled
    hay = "".join(rng.choice("abcdefg_") for _ in range(20000))
    cls = compiled.classes_of(
        np.frombuffer(hay.encode("utf-32-le"), np.uint32)
    ).astype(np.int32)

    monkeypatch.setenv("PYAHOCORASICK_TPU_EMIT_FUSED", "1")
    r_fused = cascade_emit.emit_matches_cascade(compiled, cls)
    monkeypatch.setenv("PYAHOCORASICK_TPU_EMIT_FUSED", "0")
    r_win = cascade_emit.emit_matches_cascade(compiled, cls)
    assert r_fused is not None and r_win is not None
    assert np.array_equal(r_fused[0], r_win[0])
    assert np.array_equal(r_fused[1], r_win[1])
