"""Split the fixedlen first-call latency: trace/lower vs compile-or-load
vs first dispatch (round-5, VERDICT item 5)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CHARS = int(os.environ.get("BENCH_CHARS", 1 << 27))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import pyahocorasick_tpu as ahocorasick
    from pyahocorasick_tpu.ops import fixedlen as FL
    from pyahocorasick_tpu.ops import fused as F
    from pyahocorasick_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    rngd = np.random.default_rng(44)
    letters_d = np.frombuffer(b"acgt", dtype=np.uint8)
    B = ahocorasick.Automaton()
    for _ in range(100_000):
        B.add_word(bytes(letters_d[rngd.integers(0, 4, 20)]).decode(), 1)
    B.make_automaton()
    cb = B._compiled
    hayd = letters_d[rngd.integers(0, 4, N_CHARS)]
    clsd = cb.classes_of(hayd.astype(np.uint32)).astype(np.int32)
    Npad = F._bucket_tiles(-(-N_CHARS // F._TILE)) * F._TILE
    padd = np.zeros(Npad, np.int8)
    padd[:N_CHARS] = clsd
    t0 = time.time()
    stagedd = jnp.asarray(padd)
    np.asarray(stagedd[:1])
    log(f"[stage] {time.time()-t0:.2f}s")

    t0 = time.time()
    t = FL.build_fixedlen_tables(cb)
    log(f"[tables] {time.time()-t0:.2f}s")
    n_tiles = F._bucket_tiles(-(-N_CHARS // FL._TILE))
    cap = t.cap
    fin_slots = min(cap, FL._fin_slots_for(t))
    vbud = FL._fixedlen_budgets(n_tiles, t, fin_slots)
    t0 = time.time()
    fn = FL._make_scan_fn(
        t.K, t.g, t.W, t.multsW, t.families, t.r1, t.r2,
        n_tiles, fin_slots, vbud, False, cap,
    )
    log(f"[make_fn] {time.time()-t0:.2f}s")
    d = t.device_arrays()
    t0 = time.time()
    lowered = fn.lower(stagedd, d["B1T"], d["S2"])
    log(f"[trace+lower] {time.time()-t0:.2f}s")
    t0 = time.time()
    compiled_fn = lowered.compile()
    log(f"[compile-or-load] {time.time()-t0:.2f}s")
    t0 = time.time()
    buf = compiled_fn(stagedd, d["B1T"], d["S2"])
    np.asarray(buf[:8])
    log(f"[first dispatch+fetch] {time.time()-t0:.2f}s")
    t0 = time.time()
    buf = compiled_fn(stagedd, d["B1T"], d["S2"])
    np.asarray(buf[:8])
    log(f"[second dispatch+fetch] {time.time()-t0:.2f}s")


if __name__ == "__main__":
    main()
