"""Hot/cold projection-automaton engine (ops/hotcold.py): differential
tests against the sequential oracle.  The engine's contract: exact
any-match flags for matches of length in [4, d] (device; lengths <= 3 are
host-histogram work) and the exact list of matches of length > d (host
patch), for any dictionary, block size, and stride — including pathological inputs whose deep episodes span blocks."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu.ops import cpu, hotcold


def _build(words):
    A = ahocorasick.Automaton()
    for i, w in enumerate(sorted(set(words))):
        A.add_word(w, (i, w))
    A.make_automaton()
    return A


def _cls(compiled, text):
    return compiled.classes_of(
        np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    ).astype(np.int32)


def _oracle(compiled, cls, d, halo=None):
    """(mid-matched-position count, deep matches) from the seq oracle.
    The device any-match bits cover lengths [4, d] only (lengths <= 3 are
    host-histogram work)."""
    states = cpu.scan_states_blocked(compiled, cls, halo)
    pos, pids = cpu.emit_matches(compiled, states)
    lens = compiled.word_len[pids]
    short_positions = np.unique(pos[(lens >= 4) & (lens <= d)]).size
    dmask = lens > d
    return short_positions, pos[dmask], pids[dmask]


def _run(words, text, d, s, halo_text=None, block=None):
    A = _build(words)
    c = A._compiled
    ht = hotcold.build_hotcold(c, plan=(d, s))
    assert ht is not None
    c._cache["hotcold"] = ht
    cls = _cls(c, text)
    halo = _cls(c, halo_text) if halo_text else None
    res = hotcold.hotcold_scan(c, cls, halo=halo, block=block)
    assert res is not None
    want_short, want_dpos, want_dpid = _oracle(c, cls, d, halo)
    assert res.short_positions_count == want_short
    np.testing.assert_array_equal(res.deep_pos, want_dpos)
    np.testing.assert_array_equal(res.deep_pid, want_dpid)
    return res


def test_canonical_fixture():
    _run("he her hers she".split(), "_sherhershe_" * 3, d=3, s=2)


@pytest.mark.parametrize("d,s", [(3, 2), (4, 2), (3, 3), (4, 4)])
def test_random_small_alphabet(d, s):
    rng = np.random.default_rng(5)
    words = [
        "".join(rng.choice(list("abc"), rng.integers(1, 10)))
        for _ in range(60)
    ]
    text = "".join(rng.choice(list("abc_"), 3000))
    _run(words, text, d=d, s=s)


def test_worst_case_long_episodes():
    """'a'*24 over all-a input: one unbounded episode spanning every block —
    patch dedupe must emit each deep match exactly once."""
    _run(["a" * 24, "aaa", "ba"], "a" * 500, d=3, s=2, block=64)


def test_episode_crossing_lane_boundary():
    rng = np.random.default_rng(9)
    words = ["abcabcab", "bca", "cab", "abc"]
    text = "".join(rng.choice(list("abcx"), 2000))
    _run(words, text, d=3, s=2, block=32)


def test_halo_episode_continuation():
    """A deep episode that starts inside the halo (previous chunk) must
    still yield the deep matches ending in the current chunk."""
    words = ["abcdefgh", "bc"]
    halo = "xxabcde"  # episode (depth 5 > d) live at the chunk boundary
    chunk = "fghabc"  # 'abcdefgh' ends at chunk position 2
    _run(words, chunk, d=3, s=2, halo_text=halo)


def test_fully_hot_automaton_no_patches():
    """d >= max depth: everything is hot, zero deep work."""
    words = ["ab", "bc", "ca"]
    res = _run(words, "abcabcab" * 20, d=3, s=2)
    assert res.deep_pos.size == 0


def test_patch_python_matches_native():
    """The pure-python patcher and the native one agree (the suite may run
    either depending on the extension)."""
    rng = np.random.default_rng(21)
    words = [
        "".join(rng.choice(list("ab"), rng.integers(1, 14)))
        for _ in range(40)
    ]
    A = _build(words)
    c = A._compiled
    cls = _cls(c, "".join(rng.choice(list("ab"), 1500)))
    d, s = 3, 2
    groups = np.arange(0, 1500, 64, dtype=np.int64)
    got_py = hotcold._patch_python(c, cls, groups, s, d)
    from pyahocorasick_tpu import native

    if native.available():
        got_nat = native.patch_deep(c, cls, groups, s, d)
        np.testing.assert_array_equal(got_py[0], got_nat[0])
        np.testing.assert_array_equal(got_py[1], got_nat[1])


def test_plan_picks_something_reasonable():
    rng = np.random.default_rng(33)
    words = [
        "".join(rng.choice(list("abcdefghijklmnop"), rng.integers(3, 20)))
        for _ in range(3000)
    ]
    A = _build(words)
    p = hotcold.plan_hotcold(A._compiled)
    assert p is not None
    d, s = p
    assert 2 <= d and 2 <= s <= 5


def test_auto_plan_scan_end_to_end():
    rng = np.random.default_rng(41)
    words = [
        "".join(rng.choice(list("abcdefgh"), rng.integers(3, 16)))
        for _ in range(800)
    ]
    A = _build(words)
    c = A._compiled
    ht = hotcold.build_hotcold(c)
    if ht is None:
        pytest.skip("no feasible hot/cold plan for this dictionary")
    cls = _cls(c, "".join(rng.choice(list("abcdefgh_"), 20000)))
    res = hotcold.hotcold_scan(c, cls)
    assert res is not None
    want_short, want_dpos, want_dpid = _oracle(c, cls, ht.d)
    assert res.short_positions_count == want_short
    np.testing.assert_array_equal(res.deep_pos, want_dpos)
    np.testing.assert_array_equal(res.deep_pid, want_dpid)


def _count_oracle(compiled, cls, halo=None):
    states = cpu.scan_states_blocked(compiled, cls, halo)
    _, pids = cpu.emit_matches(compiled, states)
    return np.bincount(pids, minlength=compiled.num_patterns).astype(np.int64)


@pytest.mark.parametrize("d,s", [(3, 2), (4, 2), (3, 4)])
def test_count_matches_exact(d, s):
    rng = np.random.default_rng(17)
    words = [
        "".join(rng.choice(list("abcd"), rng.integers(1, 12)))
        for _ in range(80)
    ]
    A = _build(words)
    c = A._compiled
    ht = hotcold.build_hotcold(c, plan=(d, s))
    c._cache["hotcold"] = ht
    cls = _cls(c, "".join(rng.choice(list("abcd_"), 5000)))
    got = hotcold.hotcold_count_matches(c, cls)
    assert got is not None
    np.testing.assert_array_equal(got, _count_oracle(c, cls))


def test_count_matches_with_halo():
    words = ["abcdefgh", "bc", "cdef"]
    A = _build(words)
    c = A._compiled
    ht = hotcold.build_hotcold(c, plan=(3, 2))
    c._cache["hotcold"] = ht
    halo = _cls(c, "xxabcde")
    cls = _cls(c, "fghabcbcdefx" * 4)
    got = hotcold.hotcold_count_matches(c, cls, halo=halo)
    assert got is not None
    np.testing.assert_array_equal(got, _count_oracle(c, cls, halo))


def test_count_matches_dense_input():
    """Every position matches: budgets grow but results stay exact."""
    A = _build(["aa", "aaa", "a" * 9])
    c = A._compiled
    ht = hotcold.build_hotcold(c, plan=(3, 2))
    c._cache["hotcold"] = ht
    cls = _cls(c, "a" * 4000)
    got = hotcold.hotcold_count_matches(c, cls)
    assert got is not None
    np.testing.assert_array_equal(got, _count_oracle(c, cls))


def test_empty_input():
    A = _build(["abc"])
    res = hotcold.hotcold_scan(A._compiled, np.empty(0, np.int32))
    # either gated (None) or empty result — both acceptable contracts
    if res is not None:
        assert res.short_positions_count == 0 and res.deep_pos.size == 0
