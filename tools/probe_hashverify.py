"""End-to-end fused counts timing with the round-5 hash verify + pair-key
stage 2, on the bench dictionary (100k words len 3-32, 134M chars).

Prints: cold, warm-best end-to-end, jit1-only warm (flags+assembly), and
the implied verify+post cost; checks the exact match total (3,228,104 at
seed 42 / 2^27 chars).
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
    from pyahocorasick_tpu.ops import fused as F
    from pyahocorasick_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    rng = np.random.default_rng(42)
    letters = np.frombuffer(string.ascii_letters.encode(), dtype=np.uint8)
    t0 = time.time()
    A = ahocorasick.Automaton()
    for n in rng.integers(3, 33, 100_000):
        A.add_word(bytes(letters[rng.integers(0, letters.size, n)]).decode(), 1)
    A.make_automaton()
    compiled = A._compiled
    ct = C.build_tables(compiled)
    ft = F.build_fused_tables(compiled)
    hv = F.build_hash_verify(compiled, ct)
    log(f"build {time.time()-t0:.1f}s  r2p={ft.r2p} "
        f"fin_est={ft.fin_est:.2e} true_est={F._true_rate(ft, ct, compiled.num_classes):.2e} "
        f"hv={'ok lgH=%d' % hv.lgH if hv else 'NONE'}")

    hay = letters[rng.integers(0, letters.size, N_CHARS)]
    cls = compiled.classes_of(hay.astype(np.uint32)).astype(np.int32)
    # stage the padded class stream once (the relay moves ~45 MB/s: an
    # unstaged call pays ~3 s of transfer at 134M chars — bench.py stages
    # exactly like this)
    n_tiles0 = F._bucket_tiles(-(-N_CHARS // F._TILE))
    pad0 = np.zeros(n_tiles0 * F._TILE, np.int8)
    pad0[:N_CHARS] = cls
    staged = jnp.asarray(pad0)
    np.asarray(staged[:1])

    t0 = time.time()
    counts = F.count_matches_fused(
        compiled, cls, staged=staged, short_on_host=True
    )
    cold = time.time() - t0
    tot = int(counts.sum())
    log(f"cold {cold:.2f}s  total={tot}")

    ts = []
    for _ in range(4):
        t0 = time.time()
        c2 = F.count_matches_fused(
            compiled, cls, staged=staged, short_on_host=True
        )
        ts.append(time.time() - t0)
        assert int(c2.sum()) == tot
    best = min(ts)
    log(f"warm best {best*1e3:.1f} ms -> {N_CHARS/best/1e9:.3f} GB/s "
        f"({best/N_CHARS*1e9:.2f} ns/char)  rate_meas={compiled._cache.get('fused_rate')}")

    # flags-only (jit1) for the stage split
    n_tiles = F._bucket_tiles(-(-N_CHARS // F._TILE))
    Npad = n_tiles * F._TILE
    pad = np.zeros(Npad, np.int8)
    pad[:N_CHARS] = cls
    cls_dev = jnp.asarray(pad)
    np.asarray(cls_dev[:1])
    out = F._flags_run(compiled, ct, ft, cls, N_CHARS, cls_dev)
    np.asarray(out[3])
    ts = []
    for _ in range(3):
        t0 = time.time()
        o = F._flags_run(compiled, ct, ft, cls, N_CHARS, cls_dev)
        np.asarray(o[3])
        ts.append(time.time() - t0)
    log(f"jit1 warm {min(ts)*1e3:.1f} ms -> {min(ts)/N_CHARS*1e9:.2f} ns/char")
    log(f"implied verify+short+deep+relay: {(best-min(ts))/N_CHARS*1e9:.2f} ns/char")


if __name__ == "__main__":
    main()
