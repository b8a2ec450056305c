"""Cold-start decomposition for the headline engines (VERDICT r4 item 5).

For each engine, with a WARM persistent compile cache, splits the first-
query latency into: host table build, jit trace+lower+cache-load, and
first dispatch+fetch.  Identifies what must shrink to reach <= 3 s.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CHARS = int(os.environ.get("BENCH_CHARS", 1 << 27))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import string

    import jax.numpy as jnp

    import pyahocorasick_tpu as ahocorasick
    from pyahocorasick_tpu.ops import cascade as C
    from pyahocorasick_tpu.ops import cascade_emit as CE
    from pyahocorasick_tpu.ops import fixedlen as FL
    from pyahocorasick_tpu.ops import fused as F
    from pyahocorasick_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    rng = np.random.default_rng(42)

    # --- text 100k: cascade + fused + emit
    letters = np.frombuffer(string.ascii_letters.encode(), dtype=np.uint8)
    A = ahocorasick.Automaton()
    for n in rng.integers(3, 33, 100_000):
        A.add_word(bytes(letters[rng.integers(0, letters.size, n)]).decode(), 1)
    A.make_automaton()
    compiled = A._compiled
    hay = letters[rng.integers(0, letters.size, N_CHARS)]
    cls = compiled.classes_of(hay.astype(np.uint32)).astype(np.int32)
    Npad = F._bucket_tiles(-(-N_CHARS // F._TILE)) * F._TILE
    pad = np.zeros(Npad, np.int8)
    pad[:N_CHARS] = cls
    t0 = time.time()
    staged = jnp.asarray(pad)
    np.asarray(staged[:1])
    log(f"[stage] class-stream transfer {time.time()-t0:.2f}s")

    t0 = time.time()
    ct = C.build_tables(compiled)
    log(f"[cascade] build_tables {time.time()-t0:.2f}s")
    t0 = time.time()
    ct.device_arrays()
    log(f"[cascade] device_arrays {time.time()-t0:.2f}s")
    t0 = time.time()
    ft = F.build_fused_tables(compiled)
    log(f"[fused] build tables {time.time()-t0:.2f}s")
    t0 = time.time()
    hv = F.build_hash_verify(compiled, ct)
    log(f"[fused] hash verify build {time.time()-t0:.2f}s")
    t0 = time.time()
    r = F.count_matches_fused(compiled, cls, staged=staged)
    log(f"[fused] first call {time.time()-t0:.2f}s (tot={int(r.sum())})")

    t0 = time.time()
    r = CE.emit_matches_cascade(compiled, cls, staged=staged)
    log(f"[emit] first call {time.time()-t0:.2f}s ({r[0].size} pairs)")

    staged_c = jnp.asarray(np.ascontiguousarray(cls.astype(np.int8)))
    np.asarray(staged_c[:1])
    t0 = time.time()
    r = C.count_matches_cascade(
        compiled, cls, staged=staged_c, short_on_host=True
    )
    ok = "gated" if r is None else int(r.sum())
    log(f"[cascade] first call {time.time()-t0:.2f}s ({ok})")

    # --- dna fixedlen
    rngd = np.random.default_rng(44)
    letters_d = np.frombuffer(b"acgt", dtype=np.uint8)
    B = ahocorasick.Automaton()
    for _ in range(100_000):
        B.add_word(
            bytes(letters_d[rngd.integers(0, 4, 20)]).decode(), 1
        )
    B.make_automaton()
    cb = B._compiled
    hayd = letters_d[rngd.integers(0, 4, N_CHARS)]
    clsd = cb.classes_of(hayd.astype(np.uint32)).astype(np.int32)
    padd = np.zeros(Npad, np.int8)
    padd[:N_CHARS] = clsd
    stagedd = jnp.asarray(padd)
    np.asarray(stagedd[:1])
    t0 = time.time()
    ftab = FL.build_fixedlen_tables(cb)
    log(f"[dna] build tables {time.time()-t0:.2f}s (r1={ftab.r1}, "
        f"cap={getattr(ftab, 'cap', '?')})")
    t0 = time.time()
    r = FL.count_matches_fixedlen(cb, clsd, staged=stagedd)
    log(f"[dna] first call {time.time()-t0:.2f}s (tot={int(r.sum())})")
    t0 = time.time()
    r = FL.count_matches_fixedlen(cb, clsd, staged=stagedd)
    log(f"[dna] second call {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
