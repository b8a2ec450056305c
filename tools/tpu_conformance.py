"""TPU-compiled conformance check (round-5).

The pytest suite exercises the device engines in pallas INTERPRET mode
(CPU); the benchmark validates one fixture end to end.  This script runs
the PRODUCTION compiled kernels on the live chip against the host oracle
on FRESH dictionaries (different seeds) with planted occurrences, at the
bench input size so every program comes from the persistent cache:

  * text-like 100k dictionary (tile 4096 / cap 256 fused path),
  * 30-keyword dictionary (tile 8192 / cap 64 path),
  * DNA 100k 20-mers (fixedlen tile/bloom co-selected path),

comparing exact per-pattern counts AND full (end, id) emission streams.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CHARS = int(os.environ.get("BENCH_CHARS", 1 << 27))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(words):
    import pyahocorasick_tpu as ahocorasick

    A = ahocorasick.Automaton()
    n = 0
    for w in words:
        if A.add_word(w, n):
            n += 1
    A.make_automaton()
    return A


def plant(hay_bytes, words, rng, n_plant):
    hay = bytearray(hay_bytes)
    for _ in range(n_plant):
        w = words[rng.integers(0, len(words))].encode()
        p = int(rng.integers(0, len(hay) - len(w)))
        hay[p: p + len(w)] = w
    return bytes(hay)


def oracle_counts_emit(A, cls):
    from pyahocorasick_tpu import engines, native

    compiled = A._compiled
    pos, pids, _ = native.scan_emit_sparse(compiled, cls, None, 0)
    counts = np.bincount(pids, minlength=compiled.num_patterns).astype(
        np.int64
    )
    return counts, pos, pids.astype(np.int64)


def check(name, A, cls):
    import jax.numpy as jnp

    from pyahocorasick_tpu.ops import cascade_emit, fixedlen, fused

    compiled = A._compiled
    t0 = time.time()
    ocounts, opos, oids = oracle_counts_emit(A, cls)
    log(f"[{name}] oracle {time.time()-t0:.1f}s ({opos.size} matches)")

    # device counts via the auto-dispatch engines (fused or fixedlen)
    from pyahocorasick_tpu import engines

    t0 = time.time()
    dcounts = engines.count_matches(compiled, cls)
    eng = engines.last_engine.get("counts")
    assert np.array_equal(dcounts, ocounts), (
        f"{name}: counts mismatch via {eng}"
    )
    log(f"[{name}] counts OK via {eng} ({time.time()-t0:.1f}s, "
        f"total={int(dcounts.sum())})")

    t0 = time.time()
    dpos, dids = engines.emit(compiled, cls)
    eng = engines.last_engine.get("emit")
    assert np.array_equal(dpos, opos), f"{name}: emit positions via {eng}"
    assert np.array_equal(dids, oids), f"{name}: emit ids via {eng}"
    log(f"[{name}] emission OK via {eng} ({time.time()-t0:.1f}s, "
        f"{dpos.size} pairs in reference order)")


def main():
    import string

    from pyahocorasick_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()

    # 1. text-like (fused tile 4096 / cap 256)
    rng = np.random.default_rng(777)
    letters = np.frombuffer(string.ascii_letters.encode(), np.uint8)
    words = [
        bytes(letters[rng.integers(0, letters.size, n)]).decode()
        for n in rng.integers(3, 33, 100_000)
    ]
    A = build(words)
    hay = bytes(letters[rng.integers(0, letters.size, N_CHARS)])
    hay = plant(hay, words, rng, 3000)
    cls = A._compiled.classes_of(
        np.frombuffer(hay.decode().encode("utf-32-le"), np.uint32)
    ).astype(np.int32)
    check("text-100k", A, cls)

    # 2. small dictionary (fused tile 8192 / cap 64)
    rng = np.random.default_rng(778)
    letters = np.frombuffer(b"abcdefghijklmnop", np.uint8)
    words = [
        bytes(letters[rng.integers(0, letters.size, n)]).decode()
        for n in rng.integers(4, 13, 30)
    ]
    B = build(words)
    hay = bytes(letters[rng.integers(0, letters.size, N_CHARS)])
    hay = plant(hay, words, rng, 3000)
    cls = B._compiled.classes_of(
        np.frombuffer(hay.decode().encode("utf-32-le"), np.uint32)
    ).astype(np.int32)
    check("small-30", B, cls)

    # 3. DNA 20-mers (fixedlen co-selected tile)
    rng = np.random.default_rng(779)
    letters = np.frombuffer(b"acgt", np.uint8)
    words = [
        bytes(letters[rng.integers(0, 4, 20)]).decode()
        for _ in range(100_000)
    ]
    C = build(words)
    hay = bytes(letters[rng.integers(0, 4, N_CHARS)])
    hay = plant(hay, words, rng, 3000)
    cls = C._compiled.classes_of(
        np.frombuffer(hay.decode().encode("utf-32-le"), np.uint32)
    ).astype(np.int32)
    check("dna-100k", C, cls)

    log("TPU CONFORMANCE: ALL OK")


if __name__ == "__main__":
    main()
