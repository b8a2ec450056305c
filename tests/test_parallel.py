"""Multi-chip sharded search on a virtual 8-device CPU mesh: parity between
the SPMD (pattern x data)-sharded counts and the single-chip engines."""

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu.parallel import ShardedAutomaton, make_mesh
from pyahocorasick_tpu.utils import letters_of_haystack


def _build(words):
    A = ahocorasick.Automaton()
    for w in words:
        A.add_word(w, w)
    A.make_automaton()
    return A


@pytest.mark.parametrize("kp,kd", [(1, 8), (2, 4), (4, 2)])
def test_sharded_counts_parity(rng, kp, kd):
    import jax

    if len(jax.devices()) < kp * kd:
        pytest.skip("needs 8 devices")

    words = set()
    while len(words) < 97:
        n = rng.integers(2, 9)
        words.add("".join(chr(97 + c) for c in rng.integers(0, 4, n)))
    words = sorted(words)
    haystack = "".join(chr(97 + c) for c in rng.integers(0, 4, 20000))

    # reference counts from the single-chip engine
    A = _build(words)
    ref_counts = A.count_matches(haystack)
    # map pattern-id -> word via compiled values
    ref_by_word = {}
    for pid, value in enumerate(A._compiled.values):
        ref_by_word[value] = ref_counts[pid]

    # sharded: round-robin split of the dictionary
    shards = [words[i::kp] for i in range(kp)]
    autos = [_build(s) for s in shards]
    mesh = make_mesh(n_pattern=kp, n_data=kd)
    sharded = ShardedAutomaton([a._compiled for a in autos], mesh)

    letters = letters_of_haystack(haystack, ahocorasick.KEY_STRING)
    counts = sharded.count_matches(letters)

    got_by_word = {}
    off = 0
    for a in autos:
        for pid, value in enumerate(a._compiled.values):
            got_by_word[value] = counts[off + pid]
        off += a._compiled.num_patterns

    assert set(got_by_word) == set(ref_by_word)
    for w in ref_by_word:
        assert got_by_word[w] == ref_by_word[w], w


@pytest.mark.parametrize("kp,kd", [(1, 8), (2, 4)])
def test_sharded_search_emission_parity(rng, kp, kd):
    """Full emission across the mesh must equal single-chip search_arrays,
    including the (position, longest-first) reference order."""
    import jax

    if len(jax.devices()) < kp * kd:
        pytest.skip("needs 8 devices")

    words = set()
    while len(words) < 53:
        n = rng.integers(2, 7)
        words.add("".join(chr(97 + c) for c in rng.integers(0, 3, n)))
    words = sorted(words)
    haystack = "".join(chr(97 + c) for c in rng.integers(0, 3, 9001))

    A = _build(words)
    ref_pos, ref_pids, ref_values = A.search_arrays(haystack)
    ref = [(int(p), ref_values[int(i)]) for p, i in zip(ref_pos, ref_pids)]

    shards = [words[i::kp] for i in range(kp)]
    autos = [_build(s) for s in shards]
    mesh = make_mesh(n_pattern=kp, n_data=kd)
    sharded = ShardedAutomaton([a._compiled for a in autos], mesh)
    letters = letters_of_haystack(haystack, ahocorasick.KEY_STRING)
    pos, gpids = sharded.search(letters, cap_per_device=4096)
    values = sharded.values_of(gpids)
    got = [(int(p), v) for p, v in zip(pos, values)]
    assert got == ref


def test_sharded_search_overflow_retry(rng):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    A = _build(["a"])
    mesh = make_mesh(n_pattern=1, n_data=8)
    sharded = ShardedAutomaton([A._compiled], mesh)
    haystack = "a" * 5000  # every position matches: overflows tiny caps
    letters = letters_of_haystack(haystack, ahocorasick.KEY_STRING)
    pos, gpids = sharded.search(letters, cap_per_device=16)
    assert pos.size == 5000
    assert np.array_equal(pos, np.arange(5000))


def test_sharded_matches_total(rng):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    words = ["ab", "ba", "aab"]
    A = _build(words)
    haystack = "abab" * 5000
    mesh = make_mesh(n_pattern=1, n_data=8)
    sharded = ShardedAutomaton([A._compiled], mesh)
    letters = letters_of_haystack(haystack, ahocorasick.KEY_STRING)
    counts = sharded.count_matches(letters)
    assert counts.sum() == A.count_matches(haystack).sum()
