#!/usr/bin/env python3
"""Host benchmark reproducing the reference harness's workload shape
(reference etc/benchmarks/benchmark.py:114-117): insert 1M random words of
length 3..32, make_automaton(), 1M existing + 1M missing get() lookups, one
iter() scan over a 1M-char random haystack.

Reference numbers (Xeon E3-1505M, CPython 3.9): add 1.040s, build 6.015s,
2M gets 1.307s, scan 0.279s (etc/benchmarks/results/python3-xeon-u.txt).

Measurement notes for the target VMs (see PLAN.md "Measured hardware facts"):

* First-touch page faults can cost 10-60s/GB depending on host-side memory
  pressure, and overall memory latency swings several-fold between runs.
  Every phase therefore runs ``--reps`` times (default 2) and the MINIMUM is
  reported — the first pass doubles as the page warmup.
* ``make_automaton()`` here computes fail links + CSR output metadata (the
  reference's make_automaton computes only fail links).  The dense DFA
  table used by bulk/device scans lowers lazily; its cost is reported as a
  separate "dense lowering" line (the reference has no equivalent: it pays
  an extra fail-chain walk per scanned character instead).

Usage: python benchmarks/host_benchmark.py [n_words] [--reps N]
"""

import os
import string
import sys
import time

import numpy as np

# host benchmark: keep the scan on the host engines (the TPU path is bench.py)
os.environ.setdefault("PYAHOCORASICK_TPU_ENGINE", "seq")


def best_of(reps, fn):
    best = None
    for _ in range(reps):
        t0 = time.time()
        result = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, result


def main():
    sys.path.insert(0, ".")
    import pyahocorasick_tpu as ahocorasick

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_000_000
    reps = 2
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])

    rng = np.random.default_rng(2024)
    letters = np.frombuffer(string.ascii_letters.encode(), dtype=np.uint8)

    lens = rng.integers(3, 33, n)
    flat = letters[rng.integers(0, letters.size, int(lens.sum()))]
    words, off = [], 0
    for ln in lens:
        words.append(bytes(flat[off : off + ln]).decode())
        off += ln
    missing = [w + "#" for w in words]  # "#" is outside the alphabet

    def build_add_loop():
        A = ahocorasick.Automaton()
        for i, w in enumerate(words):
            A.add_word(w, i)
        return A

    t, A = best_of(reps, build_add_loop)
    print(f"add {n} words (add_word loop, min of {reps}): {t:.3f} s", flush=True)

    def build_bulk():
        A = ahocorasick.Automaton()
        A.add_words(words, list(range(n)))
        return A

    t, A = best_of(reps, build_bulk)
    print(f"add {n} words (bulk add_words, min of {reps}): {t:.3f} s", flush=True)

    def make():
        A._kind = 1  # TRIE: force a rebuild on repeat reps
        A._compiled = None
        A.make_automaton()
        return A

    t, _ = best_of(reps, make)
    print(f"make_automaton (fail links + CSR, min of {reps}): {t:.3f} s", flush=True)

    def gets():
        for w in words:
            A.get(w, None)
        for w in missing:
            A.get(w, None)

    t, _ = best_of(reps, gets)
    print(f"{2*n} get() lookups (min of {reps}): {t:.3f} s", flush=True)

    haystack = bytes(letters[rng.integers(0, letters.size, 1_000_000)]).decode()

    t, count = best_of(reps, lambda: sum(1 for _ in A.iter(haystack)))
    dense = "dense" if A._compiled.has_delta else "sparse"
    print(f"iter() scan 1M chars ({dense} engine, lazy tuples): {t:.3f} s"
          f"  [matches: {count}]", flush=True)

    t0 = time.time()
    A._compiled.delta  # noqa: B018 - force the lazy dense lowering
    print(f"dense DFA lowering (lazy, threaded): {time.time() - t0:.3f} s", flush=True)

    t, count2 = best_of(reps, lambda: sum(1 for _ in A.iter(haystack)))
    print(f"iter() scan 1M chars (dense engine): {t:.3f} s  [matches: {count2}]",
          flush=True)
    assert count == count2

    t, res = best_of(reps, lambda: A.search_arrays(haystack))
    print(f"search_arrays 1M chars (bulk): {t:.3f} s  [matches: {res[0].size}]",
          flush=True)


if __name__ == "__main__":
    main()
