"""Differential tests for the small-automaton bilinear-MXU scan path
(ops/scan.py small_table_ok / _blocked_scan_signed_bilinear_jit): for
S*K <= 2^17 (ops/scan.py _BILINEAR_MAX_ENTRIES) the per-step state lookup
is a matmul, not a gather.  Replaces
the removed round-1 pallas_scan sweep kernel (its tpu.dynamic_gather
primitive measured scalarized on hardware)."""

import random

import numpy as np

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu.ops import scan as jax_scan


def _build(words):
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        A.add_word(w, (i, w))
    A.make_automaton()
    return A


def test_small_table_gate():
    A = _build(["he", "her", "hers", "she"])
    assert jax_scan.small_table_ok(A._compiled)
    rng = random.Random(1)
    big = _build(
        [
            "".join(rng.choice("abcdefghij") for _ in range(20))
            for _ in range(2000)
        ]
    )
    assert not jax_scan.small_table_ok(big._compiled)


def test_bilinear_matches_gather_scan():
    rng = random.Random(3)
    words = ["he", "her", "hers", "she", "shell", "ell", "l"]
    A = _build(words)
    compiled = A._compiled
    assert jax_scan.small_table_ok(compiled)
    hay = "".join(rng.choice("hersl_") for _ in range(5000))
    letters = A._marshal_haystack(hay)
    cls = compiled.classes_of(letters).astype(np.int32)

    got = jax_scan.matched_positions_jax(compiled, cls)  # bilinear path
    # reference flags from the plain gather scan
    cls_tl, B = jax_scan.prepare_scan_input(compiled, cls)
    import jax.numpy as jnp

    H = max(int(compiled.longest_word), 1)
    states = jax_scan._blocked_scan_signed_jit(
        jax_scan._signed_delta_flat(compiled), jnp.asarray(cls_tl),
        compiled.num_classes, H, B,
    )
    packed = np.asarray(jax_scan._pack_flags_jit(states))
    want = []
    Bq, W = packed.shape
    for b in range(Bq):
        for w in range(W):
            v = int(packed[b, w])
            while v:
                j = (v & -v).bit_length() - 1
                pos = (w * 32 + j) * B + b
                if pos < cls.size:
                    want.append(pos)
                v &= v - 1
    assert sorted(got.tolist()) == sorted(want)


def test_full_search_parity_via_engine():
    # end-to-end: iter() on a small automaton must agree across engines
    import os

    words = ["a", "ab", "abc", "bc", "c", "cab"]
    rng = random.Random(5)
    hay = "".join(rng.choice("abc_") for _ in range(4000))
    A = _build(words)
    want = list(A.iter(hay))  # dispatcher default
    os.environ["PYAHOCORASICK_TPU_ENGINE"] = "jax"
    try:
        B = _build(words)
        got = list(B.iter(hay))
    finally:
        os.environ.pop("PYAHOCORASICK_TPU_ENGINE", None)
    assert got == want
