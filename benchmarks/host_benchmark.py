#!/usr/bin/env python3
"""Host benchmark reproducing the reference harness's workload shape
(reference etc/benchmarks/benchmark.py:114-117): insert 1M random words of
length 3..32, make_automaton(), 1M existing + 1M missing get() lookups, one
iter() scan over a 1M-char random haystack.

Reference numbers (Xeon E3-1505M, CPython 3.9): add 1.040s, build 6.015s,
2M gets 1.307s, scan 0.279s (etc/benchmarks/results/python3-xeon-u.txt).

Usage: python benchmarks/host_benchmark.py [n_words]
"""

import os
import string
import sys
import time

import numpy as np

# host benchmark: keep the scan on the host engines (the TPU path is bench.py)
os.environ.setdefault("PYAHOCORASICK_TPU_ENGINE", "seq")


class Elapsed:
    def __init__(self, label):
        self.label = label

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        print(f"{self.label}: {time.time() - self.t0:.3f} s", flush=True)


def main():
    sys.path.insert(0, ".")
    import pyahocorasick_tpu as ahocorasick

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rng = np.random.default_rng(2024)
    letters = np.frombuffer(string.ascii_letters.encode(), dtype=np.uint8)

    lens = rng.integers(3, 33, n)
    flat = letters[rng.integers(0, letters.size, int(lens.sum()))]
    words, off = [], 0
    for ln in lens:
        words.append(bytes(flat[off : off + ln]).decode())
        off += ln
    missing = [w + "#" for w in words]  # "#" is outside the alphabet

    A = ahocorasick.Automaton()
    with Elapsed(f"add {n} words"):
        for i, w in enumerate(words):
            A.add_word(w, i)

    with Elapsed("make_automaton (incl. dense DFA lowering)"):
        A.make_automaton()

    with Elapsed(f"{2*n} get() lookups"):
        for w in words:
            A.get(w, None)
        for w in missing:
            A.get(w, None)

    haystack = bytes(letters[rng.integers(0, letters.size, 1_000_000)]).decode()
    with Elapsed("iter() scan 1M chars (lazy tuple emission)"):
        count = sum(1 for _ in A.iter(haystack))
    print(f"  matches: {count}")

    with Elapsed("search_arrays 1M chars (bulk)"):
        pos, pids, _ = A.search_arrays(haystack)
    print(f"  matches: {pos.size}")


if __name__ == "__main__":
    main()
