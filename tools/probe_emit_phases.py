"""Emission-path phase profile on the bench dictionary (round-5).

Phases: flags jit1, emit-hash verify + fetches, host short emit (native
LUT pass), final merge — to target the emit_GBps >= 0.2 bar precisely.
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
    from pyahocorasick_tpu.ops import fused as F
    from pyahocorasick_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    rng = np.random.default_rng(42)
    letters = np.frombuffer(string.ascii_letters.encode(), dtype=np.uint8)
    A = ahocorasick.Automaton()
    for n in rng.integers(3, 33, 100_000):
        A.add_word(bytes(letters[rng.integers(0, letters.size, n)]).decode(), 1)
    A.make_automaton()
    compiled = A._compiled
    ct = C.build_tables(compiled)
    et = CE._emit_tables(compiled, ct)
    hay = letters[rng.integers(0, letters.size, N_CHARS)]
    cls = compiled.classes_of(hay.astype(np.uint32)).astype(np.int32)
    Npad = F._bucket_tiles(-(-N_CHARS // F._TILE)) * F._TILE
    pad = np.zeros(Npad, np.int8)
    pad[:N_CHARS] = cls
    staged = jnp.asarray(pad)
    np.asarray(staged[:1])

    # full emit (warm everything first)
    r = CE.emit_matches_cascade(compiled, cls, staged=staged)
    ts = []
    for _ in range(3):
        t0 = time.time()
        r = CE.emit_matches_cascade(compiled, cls, staged=staged)
        ts.append(time.time() - t0)
    log(f"emit end-to-end best {min(ts)*1e3:.1f} ms -> "
        f"{N_CHARS/min(ts)/1e9:.3f} GB/s ({r[0].size} matches)")

    # phase: host short emit alone
    ts = []
    for _ in range(3):
        t0 = time.time()
        sp, si = CE._short_emit_host(et, ct.K, cls, 0)
        ts.append(time.time() - t0)
    log(f"short_emit_host {min(ts)*1e3:.1f} ms ({sp.size} pairs)")

    # phase: device candidates (fused emit) alone
    ts = []
    for _ in range(3):
        t0 = time.time()
        rr = F.emit_candidates_fused(compiled, cls, staged=staged)
        ts.append(time.time() - t0)
    p4, i4, dp, di = rr
    log(f"emit_candidates_fused {min(ts)*1e3:.1f} ms "
        f"(e4={p4.size} deep={dp.size})")

    # phase: deep host verify + merge alone
    eq = C._verify_deep_mask(ct, cls, dp, di)
    parts_pos = [p4, dp[eq]]
    parts_id = [i4, di[eq]]
    wl = compiled.word_len
    ts = []
    for _ in range(3):
        t0 = time.time()
        CE._merge_reference_order(parts_pos, parts_id, sp, si, wl)
        ts.append(time.time() - t0)
    log(f"merge {min(ts)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
