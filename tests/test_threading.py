"""Concurrent host scanning: the native scan paths release the GIL, so
multiple threads achieve real parallel throughput and identical results."""

import threading

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native core not built"
)


def test_parallel_scans_are_consistent(rng):
    A = ahocorasick.Automaton()
    words = sorted(
        {"".join(chr(97 + c) for c in rng.integers(0, 4, rng.integers(2, 7)))
         for _ in range(200)}
    )
    for w in words:
        A.add_word(w, w)
    A.make_automaton()
    hays = [
        "".join(chr(97 + c) for c in rng.integers(0, 4, 50_000))
        for _ in range(4)
    ]
    expected = [A.search_arrays(h)[0].size for h in hays]

    results = [None] * 4
    def work(i):
        pos, pids, _ = A.search_arrays(hays[i])
        results[i] = pos.size

    threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == expected
