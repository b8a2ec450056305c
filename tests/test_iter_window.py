"""SearchIter internal windowing: lazy iter() must hold only O(window)
match buffers even on match-dense inputs (the reference's iterator is O(1)
per step, src/AutomatonSearchIter.c:243-300), and the window seams must be
invisible: same stream, same continuation semantics.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu import iterators


@pytest.fixture
def tiny_window(monkeypatch):
    monkeypatch.setenv("PYAHOCORASICK_TPU_ITER_WINDOW", "7")


def _build(words):
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        A.add_word(w, (i, w))
    A.make_automaton()
    return A


def test_window_seams_invisible(tiny_window):
    A = _build("he her hers she e".split())
    hay = "_sherhershe_hehehe_ushers_" * 5
    got = list(A.iter(hay))
    os.environ.pop("PYAHOCORASICK_TPU_ITER_WINDOW", None)
    want = list(A.iter(hay))
    assert got == want
    assert len(got) > 20


def test_window_overlapping_matches_cross_seam(tiny_window):
    # matches longer than the window still emitted exactly once, in order
    A = _build(["aaaaaaaaaa", "aaa", "a"])
    hay = "a" * 40
    got = list(A.iter(hay))
    # every position emits "a"; >=2 emits "aaa"; >=9 emits the 10-mer
    want_count = 40 + 38 + 31
    assert len(got) == want_count
    positions = [p for p, _ in got]
    assert positions == sorted(positions)


def test_window_with_ignore_white_space(tiny_window):
    A = _build(["ab", "ba"])
    hay = "a b a\tb\nb a  ab" * 3
    got = list(A.iter(hay, ignore_white_space=True))
    os.environ.pop("PYAHOCORASICK_TPU_ITER_WINDOW", None)
    want = list(A.iter(hay, ignore_white_space=True))
    assert got == want and len(got) > 5


def test_window_set_mid_iteration(tiny_window):
    A = _build("he her hers she".split())
    it = A.iter("_sherhershe")
    first = [next(it) for _ in range(3)]
    it.set("rs_hers")  # continuation state must survive the window machinery
    rest = list(it)
    os.environ.pop("PYAHOCORASICK_TPU_ITER_WINDOW", None)
    it2 = A.iter("_sherhershe")
    first2 = [next(it2) for _ in range(3)]
    it2.set("rs_hers")
    rest2 = list(it2)
    assert first == first2 and rest == rest2


_MEM_SCRIPT = r"""
import os, sys

def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return 0.0

import pyahocorasick_tpu as ahocorasick

A = ahocorasick.Automaton()
A.add_word("aa", (0, "aa"))
A.make_automaton()
n = 1 << 22  # 4M chars -> ~4M matches (~64 MB at 16 B/match if eager)
hay = "a" * n
os.environ["PYAHOCORASICK_TPU_ITER_WINDOW"] = str(1 << 16)
# warm the device-engine runtime (jax CPU client, jit caches): its
# one-time footprint is not what this test bounds
for _ in A.iter("a" * (1 << 17)):
    pass
base = rss_mb()
it = A.iter(hay)
for _ in range(10):
    next(it)
grown = rss_mb() - base
# O(n) letter/class arrays (~20 MB at u32+i32) plus engine staging are
# expected; the eager-match buffers we guard against would add ~64 MB
# (4M matches x 16 B) on top of that baseline
assert grown < 55, f"iter() grew RSS by {grown:.0f} MB"
assert sum(1 for _ in it) == n - 1 - 10
print("OK", grown)
"""


@pytest.mark.skipif(not sys.platform.startswith("linux"), reason="/proc only")
def test_iter_memory_bounded():
    """Match-dense haystack: materializing all matches would need ~64 MB of
    position/pid buffers; the windowed iterator must stay far below that.
    Runs in a fresh subprocess: RSS deltas measured mid-suite are polluted
    by allocator/jax arena reuse from earlier tests."""
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYAHOCORASICK_TPU_ITER_WINDOW", None)
    res = subprocess.run(
        [sys.executable, "-c", _MEM_SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert res.returncode == 0, res.stderr + res.stdout
    assert res.stdout.startswith("OK")
