"""Stage timing for the cascade pipeline on the real chip.

Times, each as its own jit with a scalar checksum output (relay rule):
  flags   — g4 codes + hashes + all bloom fetches + AND/pack, summed
  blocks  — flags + per-_BLK block-any + block compaction
  full    — the production core (counts + deep candidates)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PATTERNS = int(os.environ.get("BENCH_PATTERNS", 100_000))
N_CHARS = int(os.environ.get("BENCH_CHARS", 1 << 26))


def main():
    import string

    import jax
    import jax.numpy as jnp

    import pyahocorasick_tpu as ahocorasick
    from pyahocorasick_tpu.ops import cascade as C

    rng = np.random.default_rng(42)
    letters = np.frombuffer(string.ascii_letters.encode(), dtype=np.uint8)
    lengths = rng.integers(3, 33, N_PATTERNS)
    A = ahocorasick.Automaton()
    for n in lengths:
        A.add_word(bytes(letters[rng.integers(0, letters.size, n)]).decode(), 1)
    A.make_automaton()
    compiled = A._compiled
    t = C.build_tables(compiled)
    d = t.device_arrays()
    hay = letters[rng.integers(0, letters.size, N_CHARS)]
    cls = compiled.classes_of(hay.astype(np.uint32)).astype(np.int8)
    cls_dev = jnp.asarray(cls)
    K = t.K
    K2, K3 = K * K, K * K * K
    chunk = 1 << int(os.environ.get("PYAHOCORASICK_TPU_CHUNK_LOG2", 18))

    def flags_of(cls_i8):
        N = cls_i8.shape[0]
        c = cls_i8.astype(jnp.int32)
        c1 = jnp.pad(c, (1, 0))[:N]
        c2 = jnp.pad(c, (2, 0))[:N]
        c3 = jnp.pad(c, (3, 0))[:N]
        g4 = c3 * K3 + c2 * K2 + c1 * K + c

        def fchunk(cg4):
            u = cg4.astype(jnp.uint32)
            fw = jnp.int32(1)
            for j, wb in enumerate(t.wbits_w4):
                fw = fw & C._bloom_bit(d[f"bw4_{j}"], u, C._MULTS[j], wb)
            fs = jnp.int32(1)
            fb = jnp.int32(1)
            for j, wb in enumerate(t.wbits_suf):
                fs = fs & C._bloom_bit(d[f"bsuf_{j}"], u, C._MULTS[j], wb)
                fb = fb & C._bloom_bit(d[f"bsufb_{j}"], u, C._MULTS[j], wb)
            return fw | (fs << 1) | (fb << 2)

        pad = (-N) % chunk
        packed = jax.lax.map(
            fchunk, jnp.pad(g4, (0, pad)).reshape(-1, chunk)
        ).reshape(-1)[:N]
        pos = jnp.arange(N, dtype=jnp.int32)
        fw4 = packed & 1
        fsuf = (packed >> 1) & 1
        fb_prev = jnp.pad((packed >> 2) & 1, (1, 0))[:N]
        f5 = fsuf & fb_prev & (pos >= 4)
        return ((fw4 | f5) & (pos >= 3)).astype(jnp.int8)

    @jax.jit
    def stage_flags(cls_i8):
        return flags_of(cls_i8).astype(jnp.int32).sum()

    @jax.jit
    def stage_blocks(cls_i8):
        flag = flags_of(cls_i8)
        N = cls_i8.shape[0]
        padb = (-N) % C._BLK
        fpad = jnp.pad(flag, (0, padb))
        nblk = fpad.shape[0] // C._BLK
        blk_any = fpad.reshape(nblk, C._BLK).max(axis=1).astype(jnp.int32)
        bbud = max(1 << 12, nblk >> 3)
        bbuf, btot = C._compact(blk_any, bbud)
        return bbuf.sum() + btot

    def run(fn, label):
        t0 = time.time()
        r = np.asarray(fn(cls_dev))
        print(f"{label}: compile+run {time.time()-t0:.1f}s (={r})", flush=True)
        times = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(fn(cls_dev))
            times.append(time.time() - t0)
        best = min(times)
        print(f"{label}: {best*1e3:.1f} ms -> {best/N_CHARS*1e9:.2f} ns/char", flush=True)

    run(stage_flags, "flags ")
    run(stage_blocks, "blocks")

    def full():
        return C.count_matches_cascade(
            compiled, cls.astype(np.int32), staged=cls_dev, short_on_host=True
        )

    t0 = time.time()
    c0 = full()
    print(f"full  : compile+run {time.time()-t0:.1f}s (sum={c0.sum()})", flush=True)
    times = []
    for _ in range(3):
        t0 = time.time()
        full()
        times.append(time.time() - t0)
    best = min(times)
    print(f"full  : {best*1e3:.1f} ms -> {best/N_CHARS*1e9:.2f} ns/char", flush=True)


if __name__ == "__main__":
    main()
