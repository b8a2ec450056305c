"""Differential tests for the fused Pallas flag engine (ops/fused.py).

On CPU the kernel runs in pallas interpret mode (same math, no Mosaic), so
these validate the bloom construction, hash mirroring, AND-shift logic,
stage-2 filtering, budgets and exact verification against the sequential
oracle.  TPU-compiled parity is exercised by the benchmark (bench.py) and
the same code path.
"""

import random

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu import engines
from pyahocorasick_tpu.ops import cascade, fused


def _build(words):
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        A.add_word(w, i)
    A.make_automaton()
    return A._compiled


def _fused_counts(compiled, hay, halo=None):
    cls = compiled.classes_of(
        np.frombuffer(hay.encode("utf-32-le"), np.uint32)
    ).astype(np.int32)
    h = None
    if halo is not None:
        h = compiled.classes_of(
            np.frombuffer(halo.encode("utf-32-le"), np.uint32)
        ).astype(np.int32)
    got = fused.count_matches_fused(compiled, cls, h, short_on_host=False)
    return cls, h, got


def _oracle(compiled, cls, halo=None):
    return engines.count_matches(compiled, cls, halo)


def test_fused_matches_oracle_mixed_lengths():
    rng = random.Random(3)
    words = sorted(
        {
            "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 11)))
            for _ in range(160)
        }
    )
    compiled = _build(words)
    hay = "".join(rng.choice("abcdef_") for _ in range(5000))
    cls, _, got = _fused_counts(compiled, hay)
    assert got is not None, "fused engine unexpectedly gated"
    want = _oracle(compiled, cls)
    assert np.array_equal(got, want)


def test_fused_with_halo():
    words = ["abcde", "bcdef", "cdef", "ab", "f"]
    compiled = _build(words)
    # matches straddling the halo boundary must be found exactly once
    cls, h, got = _fused_counts(compiled, "cdefabcdefab", halo="zzab")
    assert got is not None
    want = _oracle(compiled, cls, h)
    assert np.array_equal(got, want)


def test_fused_deep_and_w4_paths():
    # only length-4 (W4 path) and length>=5 (B1+stage2 path) patterns
    words = ["abcd", "bcda", "abcde", "eabcd", "ddddd", "abcdefab"]
    compiled = _build(words)
    rng = random.Random(9)
    hay = "abcdeabcdefabddddddabcdabcd" + "".join(
        rng.choice("abcde") for _ in range(3000)
    )
    cls, _, got = _fused_counts(compiled, hay)
    assert got is not None
    assert np.array_equal(got, _oracle(compiled, cls))


def test_fused_no_length4plus_gates_out():
    compiled = _build(["a", "ab", "abc"])
    cls = compiled.classes_of(
        np.frombuffer("abcabc".encode("utf-32-le"), np.uint32)
    ).astype(np.int32)
    assert fused.count_matches_fused(compiled, cls) is None


def test_fused_empty_and_tiny():
    compiled = _build(["abcd", "bcdef"])
    cls = np.empty(0, np.int32)
    got = fused.count_matches_fused(compiled, cls, short_on_host=False)
    assert got is not None and got.sum() == 0
    cls, _, got = _fused_counts(compiled, "ab")
    assert got is not None and got.sum() == 0
    cls, _, got = _fused_counts(compiled, "abcd")
    assert got is not None and got.tolist() == [1, 0]


def test_fused_dense_matches_budget_fallback_is_none_or_exact():
    # adversarial: the haystack is one repeated pattern; either the budgets
    # hold and the result is exact, or the engine returns None (fallback)
    compiled = _build(["aaaa", "aaaaa", "baaaab"])
    cls = compiled.classes_of(
        np.frombuffer(("a" * 4000).encode("utf-32-le"), np.uint32)
    ).astype(np.int32)
    got = fused.count_matches_fused(compiled, cls, short_on_host=False)
    if got is not None:
        want = _oracle(compiled, cls)
        assert np.array_equal(got, want)


def test_fused_fuzz_vs_oracle():
    rng = random.Random(77)
    for trial in range(6):
        nw = rng.randint(5, 60)
        words = sorted(
            {
                "".join(
                    rng.choice("abc") for _ in range(rng.randint(4, 9))
                )
                for _ in range(nw)
            }
        )
        compiled = _build(words)
        hay = "".join(rng.choice("abc") for _ in range(rng.randint(50, 4000)))
        cls, _, got = _fused_counts(compiled, hay)
        want = _oracle(compiled, cls)
        if got is None:
            continue  # gated (dense 3-letter dictionaries can saturate)
        assert np.array_equal(got, want), (trial, words[:5])


def test_bloom_host_device_hash_mirror():
    # the host _hash_parts and device _hash_parts_dev must agree bit-exactly
    import jax.numpy as jnp

    codes = np.random.default_rng(0).integers(0, 1 << 24, 4096)
    for mult in (fused._M1, fused._M2, fused._M3):
        for nwords, wbits in ((256 * 128, 24), (128 * 128, 8)):
            hw, hbits = fused._hash_parts(codes, mult, nwords, wbits)
            dw, dbits = fused._hash_parts_dev(
                jnp.asarray(codes.astype(np.uint32)), mult, nwords, wbits
            )
            assert np.array_equal(hw, np.asarray(dw))
            assert len(hbits) == len(dbits) == (3 if wbits == 24 else 2)
            for hb, db in zip(hbits, dbits):
                assert np.array_equal(hb, np.asarray(db))


def test_two_phase_verify_matches_flat():
    """The two-phase bucket verify (fast path) and the flat single-phase
    program must agree on counts AND the deep candidate stream."""
    rng = random.Random(17)
    words = sorted(
        {
            "".join(rng.choice("abcde") for _ in range(rng.randint(4, 9)))
            for _ in range(200)
        }
    )
    compiled = _build(words)
    hay = "".join(rng.choice("abcde") for _ in range(20000))
    cls = compiled.classes_of(
        np.frombuffer(hay.encode("utf-32-le"), np.uint32)
    ).astype(np.int32)
    ct = cascade.build_tables(compiled)
    ft = fused.build_fused_tables(compiled)
    assert ct is not None and ft is not None
    (posbuf, codebuf, pvbufs, totals_dev, cls_dev, K, Npad, fs, vbuf,
     interp, cap) = (
        fused._flags_run(compiled, ct, ft, cls, cls.size, None)
    )
    vbud = min(fused._pow2(max(int(np.asarray(totals_dev)[2]), 1 << 10)),
               vbuf)
    dev = ct.device_arrays()
    out = {}
    for tp in (True, False):
        fn = fused._make_post_verify(
            K, max(ct.bucket_max, 1), vbud, ct.num_patterns, interp, tp
        )
        counts, _c16, dp, di, dtot, _ = fn(
            posbuf[:vbud], codebuf[:vbud], cls_dev,
            np.int32(0), np.int32(cls.size), dev,
        )
        nd = int(np.asarray(dtot))
        pairs = sorted(
            zip(np.asarray(dp)[:nd].tolist(), np.asarray(di)[:nd].tolist())
        )
        out[tp] = (np.asarray(counts).tolist(), nd, pairs)
    assert out[True] == out[False]


def test_hash_verify_multi_deep_buckets():
    """Buckets holding several l>=5 patterns with the SAME last-4-gram must
    route through the hash verify's side path (multi bit) and still count
    exactly — including coexisting length-4 patterns of that gram."""
    words = [
        "abcd",          # l4 entry of the 'abcd' bucket
        "xabcd", "yabcd", "zzabcd", "wwwabcd",   # 4 deep, same last4
        "qrstu", "pqrstu",                        # 2 deep, same last4
        "mmmm", "nmmmm",
    ]
    compiled = _build(words)
    hv = fused.build_hash_verify(
        compiled, cascade.build_tables(compiled)
    )
    assert hv is not None
    rng = random.Random(11)
    base = "".join(rng.choice("abcdqrstuxyzw_") for _ in range(4000))
    hay = base[:500] + "zzabcd" + base[500:900] + "pqrstu" + \
        base[900:1500] + "nmmmmabcd" + base[1500:]
    cls, _, got = _fused_counts(compiled, hay)
    assert got is not None, "fused engine unexpectedly gated"
    want = _oracle(compiled, cls)
    assert np.array_equal(got, want)


def test_hash_verify_matches_bucket_verify_counts():
    """End-to-end counts with the hash verify must equal the counts from
    the flat bucket-walk verify on the same candidate stream."""
    rng = random.Random(5)
    alpha = "abcdefghijklmnop"
    words = sorted(
        {
            "".join(rng.choice(alpha) for _ in range(rng.randint(4, 12)))
            for _ in range(300)
        }
    )
    compiled = _build(words)
    hay = "".join(rng.choice(alpha) for _ in range(30000))
    cls = compiled.classes_of(
        np.frombuffer(hay.encode("utf-32-le"), np.uint32)
    ).astype(np.int32)
    got = fused.count_matches_fused(compiled, cls, short_on_host=False)
    assert got is not None
    want = _oracle(compiled, cls)
    assert np.array_equal(got, want)


def test_emit_speculative_refetch_branch():
    """When the cached e4 rate under-sizes the speculative pair fetch, the
    caller must refetch the full prefix and still return every pair."""
    rng = random.Random(23)
    alpha = "abcdefghij"
    words = sorted(
        {
            "".join(rng.choice(alpha) for _ in range(rng.randint(4, 8)))
            for _ in range(120)
        }
    )
    compiled = _build(words)
    hay = "".join(rng.choice(alpha) for _ in range(40000))
    cls = compiled.classes_of(
        np.frombuffer(hay.encode("utf-32-le"), np.uint32)
    ).astype(np.int32)
    full = fused.emit_candidates_fused(compiled, cls)
    assert full is not None
    # poison the learned e4 rate so the speculative prefix is tiny
    compiled._cache["fused_e4rate"] = 1e-9
    again = fused.emit_candidates_fused(compiled, cls)
    assert again is not None
    for a, b in zip(full, again):
        np.testing.assert_array_equal(a, b)


def test_flags_run_ignores_mismatched_staged():
    """A staged stream padded for a different tile geometry must be
    ignored (repadded internally), not crash or corrupt results."""
    import jax.numpy as jnp

    rng = random.Random(29)
    alpha = "abcdefgh"
    words = sorted(
        {
            "".join(rng.choice(alpha) for _ in range(rng.randint(4, 7)))
            for _ in range(60)
        }
    )
    compiled = _build(words)
    hay = "".join(rng.choice(alpha) for _ in range(9000))
    cls = compiled.classes_of(
        np.frombuffer(hay.encode("utf-32-le"), np.uint32)
    ).astype(np.int32)
    want = fused.count_matches_fused(compiled, cls, short_on_host=False)
    assert want is not None
    bad = np.zeros(12345, np.int8)  # wrong padded length
    bad[: cls.size] = cls
    got = fused.count_matches_fused(
        compiled, cls, staged=jnp.asarray(bad), short_on_host=False
    )
    assert got is not None
    np.testing.assert_array_equal(got, want)
