"""Small-dictionary fused emission at FUSED_TILE=8192 (round-5): the
kernel's per-tile fixed costs (prefix chain, fin machinery, assembly)
halve per char with the bigger tile, and small dictionaries run cap=64 so
the (cap, n) buffers stay within Mosaic limits (tile 8192 / cap 512 was
rejected in round 4; cap 64 is 8x smaller).

Run with: PYAHOCORASICK_TPU_FUSED_TILE=8192 python tools/probe_small_tile.py
and compare against the default-tile run.
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
    import jax.numpy as jnp

    import pyahocorasick_tpu as ahocorasick
    from pyahocorasick_tpu.ops import cascade_emit as CE
    from pyahocorasick_tpu.ops import fused as F
    from pyahocorasick_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    log(f"FUSED_TILE={F._TILE}")
    rng = np.random.default_rng(43)
    letters = np.frombuffer(b"abcdefghijklmnop", dtype=np.uint8)
    A = ahocorasick.Automaton()
    for n in rng.integers(4, 13, 30):
        A.add_word(bytes(letters[rng.integers(0, letters.size, n)]).decode(), 1)
    A.make_automaton()
    compiled = A._compiled
    hay = letters[rng.integers(0, letters.size, N_CHARS)]
    cls = compiled.classes_of(hay.astype(np.uint32)).astype(np.int32)
    ft = F.build_fused_tables(compiled)
    log(f"r1={ft.r1} r4={ft.r4} cap={ft.cap} tile={ft.tile}")
    Npad = F._bucket_tiles(-(-N_CHARS // ft.tile)) * ft.tile
    pad = np.zeros(Npad, np.int8)
    pad[:N_CHARS] = cls
    staged = jnp.asarray(pad)
    np.asarray(staged[:1])

    t0 = time.time()
    r = CE.emit_matches_cascade(compiled, cls, staged=staged)
    log(f"cold {time.time()-t0:.2f}s ({r[0].size} matches)")
    ts = []
    for _ in range(4):
        t0 = time.time()
        r = CE.emit_matches_cascade(compiled, cls, staged=staged)
        ts.append(time.time() - t0)
    log(f"emit best {min(ts)*1e3:.1f} ms -> {N_CHARS/min(ts)/1e9:.3f} GB/s")

    t0 = time.time()
    c = F.count_matches_fused(compiled, cls, staged=staged)
    log(f"counts cold {time.time()-t0:.2f}s (tot={int(c.sum())})")
    ts = []
    for _ in range(4):
        t0 = time.time()
        F.count_matches_fused(compiled, cls, staged=staged)
        ts.append(time.time() - t0)
    log(f"counts best {min(ts)*1e3:.1f} ms -> {N_CHARS/min(ts)/1e9:.3f} GB/s")


if __name__ == "__main__":
    main()
