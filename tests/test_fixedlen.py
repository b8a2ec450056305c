"""Differential tests for the fixed-length fingerprint engine
(ops/fixedlen.py) — the BASELINE "CRISPR guides over DNA" specialization.

On CPU the kernel runs in pallas interpret mode (same math, no Mosaic):
these validate the segment-code / fingerprint construction, the host-device
hash mirror, bloom gating, per-tile slot escalation and the exact host
verification against the sequential oracle.  TPU-compiled parity runs in
bench.py over the same code path.
"""

import random

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu import engines
from pyahocorasick_tpu.ops import fixedlen


def _build(words):
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        A.add_word(w, i)
    A.make_automaton()
    return A._compiled


def _cls(compiled, s):
    return compiled.classes_of(
        np.frombuffer(s.encode("utf-32-le"), np.uint32)
    ).astype(np.int32)


def _counts(compiled, hay, halo=None):
    c = _cls(compiled, hay)
    h = _cls(compiled, halo) if halo is not None else None
    return fixedlen.count_matches_fixedlen(compiled, c, h)


def _oracle(compiled, hay, halo=None):
    c = _cls(compiled, hay)
    h = _cls(compiled, halo) if halo is not None else None
    return engines.count_matches(compiled, c, h)


def _dna_words(rng, n, L=20):
    return sorted(
        {"".join(rng.choice("acgt") for _ in range(L)) for _ in range(n)}
    )


def test_fixedlen_dna_matches_oracle():
    rng = random.Random(7)
    words = _dna_words(rng, 300)
    compiled = _build(words)
    # embed some true matches in random text
    hay = "".join(rng.choice("acgt") for _ in range(4000))
    for w in words[:10]:
        p = rng.randrange(len(hay) - 20)
        hay = hay[:p] + w + hay[p + 20:]
    got = _counts(compiled, hay)
    assert got is not None, "fixedlen engine unexpectedly gated"
    assert np.array_equal(got, _oracle(compiled, hay))
    assert got.sum() >= 10


def test_fixedlen_halo_boundary():
    rng = random.Random(8)
    words = _dna_words(rng, 100)
    compiled = _build(words)
    halo = "".join(rng.choice("acgt") for _ in range(64)) + words[0][:11]
    hay = words[0][11:] + "".join(rng.choice("acgt") for _ in range(3000))
    got = _counts(compiled, hay, halo)
    assert got is not None
    want = _oracle(compiled, hay, halo)
    assert np.array_equal(got, want)
    assert got[compiled.values.index(0) if False else 0] >= 0  # smoke
    # the straddling match must be counted exactly once
    assert got.sum() == want.sum() >= 1


def test_fixedlen_two_lengths_supported():
    # mixed k-mer panels (<= 3 distinct sizes) run as multiple fingerprint
    # families over SHARED bloom tables
    rng = random.Random(20)
    words = _dna_words(rng, 120, L=20) + _dna_words(rng, 120, L=23)
    compiled = _build(sorted(set(words)))
    t = fixedlen.build_fixedlen_tables(compiled)
    assert t is not None and len(t.families) == 2
    hay = "".join(rng.choice("acgt") for _ in range(6000))
    for w in (words[0], words[-1]):
        p = rng.randrange(len(hay) - 30)
        hay = hay[:p] + w + hay[p + len(w):]
    got = _counts(compiled, hay)
    assert got is not None
    assert np.array_equal(got, _oracle(compiled, hay))
    assert got.sum() >= 2


def test_fixedlen_two_length_emission_reference_order():
    # a shorter pattern that is a suffix of a longer one: both end at the
    # same position and the longer must be emitted first
    rng = random.Random(22)
    filler = _dna_words(rng, 60, L=9) + _dna_words(rng, 60, L=12)
    long_w = "acgtacgtacgt"   # 12
    short_w = long_w[-9:]     # 9, suffix of long_w
    words = sorted(set(filler + [long_w, short_w]))
    compiled = _build(words)
    hay = "tt" + long_w + "ttacg" + "".join(
        rng.choice("acgt") for _ in range(3000)
    )
    c = _cls(compiled, hay)
    got = fixedlen.emit_matches_fixedlen(compiled, c)
    assert got is not None
    want_pos, want_ids = engines.emit(compiled, c)
    assert np.array_equal(got[0], want_pos)
    assert np.array_equal(got[1], want_ids)


def test_fixedlen_gates_on_many_lengths():
    rng = random.Random(23)
    words = []
    for L in (8, 10, 12, 14, 16):  # 5 distinct sizes > _MAX_FAMILIES
        words += _dna_words(rng, 10, L=L)
    compiled = _build(sorted(set(words)))
    assert fixedlen.build_fixedlen_tables(compiled) is None


def test_fixedlen_gates_on_short_patterns():
    compiled = _build(["acg", "gta"])  # below _MIN_LEN
    assert fixedlen.build_fixedlen_tables(compiled) is None


def test_fixedlen_text_alphabet():
    # fixed length over a wide alphabet (K ~ 30): g shrinks to 4
    rng = random.Random(9)
    letters = "abcdefghijklmnopqrstuvwxyz_."
    words = sorted(
        {
            "".join(rng.choice(letters) for _ in range(9))
            for _ in range(200)
        }
    )
    compiled = _build(words)
    hay = "".join(rng.choice(letters) for _ in range(3000))
    for w in words[:5]:
        p = rng.randrange(len(hay) - 9)
        hay = hay[:p] + w + hay[p + 9:]
    got = _counts(compiled, hay)
    assert got is not None
    assert np.array_equal(got, _oracle(compiled, hay))


def test_fixedlen_dense_true_matches_escalate():
    # a haystack that is one pattern repeated: every L-th position matches;
    # per-tile fin slots must escalate (or the engine returns None) — never
    # a wrong count
    rng = random.Random(10)
    words = _dna_words(rng, 50)
    compiled = _build(words)
    hay = words[0] * 150 + "".join(rng.choice("acgt") for _ in range(500))
    got = _counts(compiled, hay)
    if got is not None:
        assert np.array_equal(got, _oracle(compiled, hay))
        assert got.sum() >= 150


def test_fixedlen_repeated_calls_reuse_rate_cache():
    rng = random.Random(11)
    words = _dna_words(rng, 120)
    compiled = _build(words)
    hay = "".join(rng.choice("acgt") for _ in range(3000))
    a = _counts(compiled, hay)
    b = _counts(compiled, hay)
    assert a is not None and b is not None
    assert np.array_equal(a, b)
    assert "fixedlen_rate" in compiled._cache


def test_fixedlen_engine_in_auto_chain(monkeypatch):
    rng = random.Random(12)
    # enough patterns that the automaton exceeds the small-table gate
    # (below it the bilinear MXU scan correctly outranks every cascade)
    words = _dna_words(rng, 3000)
    compiled = _build(words)
    # the auto chain only schedules the device engines on an accelerator
    # backend; tests run on CPU, so force that predicate
    monkeypatch.setattr(engines, "_device_backend", lambda: True)
    chain = engines.plan_chain(compiled, 1 << 20, "counts")
    assert "fixedlen" in chain
    assert chain.index("fixedlen") < chain.index("fused")


def test_fixedlen_empty_and_tiny_inputs():
    rng = random.Random(13)
    words = _dna_words(rng, 30)
    compiled = _build(words)
    assert _counts(compiled, "").sum() == 0
    assert _counts(compiled, "acgt").sum() == 0  # shorter than L


def test_fixedlen_emission_matches_oracle():
    rng = random.Random(15)
    words = _dna_words(rng, 250)
    compiled = _build(words)
    hay = "".join(rng.choice("acgt") for _ in range(5000))
    for w in words[:8]:
        p = rng.randrange(len(hay) - 20)
        hay = hay[:p] + w + hay[p + 20:]
    c = _cls(compiled, hay)
    got = fixedlen.emit_matches_fixedlen(compiled, c)
    assert got is not None
    pos, pids = engines.emit(compiled, c)
    assert np.array_equal(got[0], pos)
    assert np.array_equal(got[1], pids)
    assert got[0].size >= 8


def test_fixedlen_emission_halo_and_base():
    rng = random.Random(16)
    words = _dna_words(rng, 120)
    compiled = _build(words)
    halo = "".join(rng.choice("acgt") for _ in range(40)) + words[0][:9]
    hay = words[0][9:] + "".join(rng.choice("acgt") for _ in range(2500))
    ch, cc = _cls(compiled, halo), _cls(compiled, hay)
    got = fixedlen.emit_matches_fixedlen(compiled, cc, ch, base=1000)
    want_pos, want_ids = engines.emit(compiled, cc, ch, base=1000)
    assert got is not None
    assert np.array_equal(got[0], want_pos)
    assert np.array_equal(got[1], want_ids)
    assert got[0].size >= 1


def test_fixedlen_haystack_with_other_characters():
    """Characters outside the pattern alphabet (class 0: 'n' bases, etc.)
    must never produce matches through windows containing them."""
    rng = random.Random(18)
    words = _dna_words(rng, 150)
    compiled = _build(words)
    hay = "".join(rng.choice("acgtn") for _ in range(4000))
    hay += words[1] + "n" + words[2]  # adjacent to 'other' chars
    got = _counts(compiled, hay)
    assert got is not None
    assert np.array_equal(got, _oracle(compiled, hay))
    assert got[1] >= 1 and got[2] >= 1


def test_fixedlen_pattern_substring_window_shift():
    """Shifted windows sharing 19 of 20 chars with a pattern must not
    match (fingerprint families must not collide on near-misses)."""
    rng = random.Random(19)
    words = _dna_words(rng, 80)
    compiled = _build(words)
    w = words[0]
    # embed every 1-char-shifted corruption of w
    hay = "".join(
        w[:i] + ("a" if w[i] != "a" else "c") + w[i + 1:]
        for i in range(20)
    )
    got = _counts(compiled, hay)
    assert got is not None
    assert np.array_equal(got, _oracle(compiled, hay))


def test_fixedlen_saturated_bloom_gates_to_exact_fallback():
    """A dictionary containing EVERY possible window (stage-1 rate ~1.0)
    must overflow the slot cap at every tile and gate the engine at build;
    the dispatch chain still returns exact results."""
    import itertools

    import pyahocorasick_tpu as ahocorasick
    from pyahocorasick_tpu.ops import fixedlen

    A = ahocorasick.Automaton()
    for tup in itertools.product("abcd", repeat=5):
        A.add_word("".join(tup), 1)
    A.make_automaton()
    c = A._compiled
    hay = "abcdabcdddccbbaa" * 600
    cls = c.classes_of(
        np.frombuffer(hay.encode("utf-32-le"), np.uint32)
    ).astype(np.int32)
    # build succeeds (bloom fp on random codes is tiny) but EVERY stream
    # position is a true match: the per-tile slot cap overflows at
    # runtime, escalation cannot help (these are true hits, not fp), and
    # the engine must gate to None rather than drop candidates
    got = fixedlen.count_matches_fixedlen(c, cls)
    assert got is None
    counts = A.count_matches(hay)
    # every position >= 4 ends exactly one 5-mer window
    assert int(counts.sum()) == len(hay) - 4
