"""Stage-level timing of the cascade counting pipeline on the live device.

Builds the benchmark automaton (100k random words, len 3-32) and times jitted
sub-pipelines that cut the full core (ops/cascade.py) at successive stages,
each reduced to a scalar on device (relay fetch of non-scalars is ~10 MB/s —
see PLAN.md):

  g4      : 3-gram/4-gram code construction only
  blooms  : + the 8 bilinear bloom fetches and flag packing
  compact : + hierarchical block compaction (the two scatter passes)
  core    : the full deep pipeline incl. S4/bucket verify (no short hist)
  hist    : the l<=3 device histogram alone

Usage: python tools/probe_cascade.py [n_chars_log2]
"""

import os
import string
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    nlog = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    n_chars = 1 << nlog
    import pyahocorasick_tpu as ahocorasick
    from pyahocorasick_tpu.ops import cascade

    rng = np.random.default_rng(42)
    letters = np.frombuffer(string.ascii_letters.encode(), dtype=np.uint8)
    lengths = rng.integers(3, 33, 100_000)
    A = ahocorasick.Automaton()
    for n in lengths:
        A.add_word(bytes(letters[rng.integers(0, letters.size, n)]).decode(), 1)
    t0 = time.time()
    A.make_automaton()
    compiled = A._compiled
    print(f"make_automaton {time.time()-t0:.1f}s", flush=True)

    hay = letters[rng.integers(0, letters.size, n_chars)]
    cls = compiled.classes_of(hay.astype(np.uint32)).astype(np.int32)

    t = cascade.build_tables(compiled)
    assert t is not None
    d = t.device_arrays()

    import jax
    import jax.numpy as jnp

    K = t.K
    K2, K3 = K * K, K * K * K
    chunk = 1 << 18
    cls_dev = jnp.asarray(cls.astype(np.int8))
    np.asarray(jnp.sum(cls_dev[:8]))  # warm device

    def stage_g4(cls_i8):
        cls32 = cls_i8.astype(jnp.int32)
        N = cls32.shape[0]
        c1 = jnp.pad(cls32, (1, 0))[:N]
        c2 = jnp.pad(cls32, (2, 0))[:N]
        c3 = jnp.pad(cls32, (3, 0))[:N]
        g3 = c2 * K2 + c1 * K + cls32
        g4 = c3 * K3 + g3
        return g4.sum()

    def _flags(cls_i8):
        cls32 = cls_i8.astype(jnp.int32)
        N = cls32.shape[0]
        c1 = jnp.pad(cls32, (1, 0))[:N]
        c2 = jnp.pad(cls32, (2, 0))[:N]
        c3 = jnp.pad(cls32, (3, 0))[:N]
        g4 = c3 * K3 + c2 * K2 + c1 * K + cls32
        pad = (-N) % chunk

        def flags_chunk(cg4):
            u = cg4.astype(jnp.uint32)
            fw = cascade._bloom_bit(
                d["bw4_0"], u, cascade._MULTS[0]
            ) & cascade._bloom_bit(d["bw4_1"], u, cascade._MULTS[1])
            fs = jnp.int32(1)
            fb = jnp.int32(1)
            for j in range(3):
                fs = fs & cascade._bloom_bit(d[f"bsuf_{j}"], u, cascade._MULTS[j])
                fb = fb & cascade._bloom_bit(d[f"bsufb_{j}"], u, cascade._MULTS[j])
            return fw | (fs << 1) | (fb << 2)

        packed = jax.lax.map(
            flags_chunk, jnp.pad(g4, (0, pad)).reshape(-1, chunk)
        ).reshape(-1)[:N]
        pos = jnp.arange(N, dtype=jnp.int32)
        fw4 = packed & 1
        fsuf = (packed >> 1) & 1
        fb_prev = jnp.pad((packed >> 2) & 1, (1, 0))[:N]
        f5 = fsuf & fb_prev & (pos >= 4)
        return ((fw4 | f5) & (pos >= 3)).astype(jnp.int8)

    def stage_blooms(cls_i8):
        return _flags(cls_i8).astype(jnp.int32).sum()

    N = n_chars
    nblk = -(-N // cascade._BLK)
    bbud = max(1 << 12, nblk >> 3)
    cbud = max(1 << 12, N >> 8)

    def stage_compact(cls_i8):
        flag = _flags(cls_i8)
        padb = (-N) % cascade._BLK
        fpad = jnp.pad(flag, (0, padb))
        nb = fpad.shape[0] // cascade._BLK
        blk_any = fpad.reshape(nb, cascade._BLK).max(axis=1).astype(jnp.int32)
        bbuf, btot = cascade._compact(blk_any, bbud)
        bvalid = bbuf >= 0
        bpos = (
            jnp.maximum(bbuf, 0)[:, None] * cascade._BLK
            + jnp.arange(cascade._BLK, dtype=jnp.int32)[None, :]
        )
        cflag = jnp.take(fpad, jnp.minimum(bpos, N - 1), mode="clip")
        cflag = (cflag.astype(jnp.int32) * bvalid[:, None] * (bpos < N)).reshape(-1)
        cbuf, ctot = cascade._compact(cflag, cbud)
        return btot + ctot + cbuf.sum()

    def stage_hist(cls_i8):
        cls32 = cls_i8.astype(jnp.int32)
        N = cls32.shape[0]
        c1 = jnp.pad(cls32, (1, 0))[:N]
        c2 = jnp.pad(cls32, (2, 0))[:N]
        g3 = c2 * K2 + c1 * K + cls32
        pos = jnp.arange(N, dtype=jnp.int32)
        gm = jnp.where(pos >= 2, g3, jnp.int32(K3))
        hist = jnp.zeros((K3 + 1,), jnp.int32).at[gm].add(1, mode="drop")[:K3]
        return hist.sum()

    key = (
        t.K, (False, False, False), t.has4, t.has5,
        max(t.bucket_max, 1), bbud, cbud, t.num_patterns,
    )
    core = cascade._get_core(key)

    def stage_core(cls_i8):
        counts, dp, di, totals = core(cls_i8, np.int32(0), d)
        return counts.sum() + totals.sum()

    for name, fn in [
        ("g4", stage_g4),
        ("hist", stage_hist),
        ("blooms", stage_blooms),
        ("compact", stage_compact),
        ("core", stage_core),
    ]:
        jf = jax.jit(fn) if name != "core" else fn
        t0 = time.time()
        r = np.asarray(jf(cls_dev))
        print(f"{name:8s} compile+run {time.time()-t0:6.1f}s", flush=True)
        times = []
        for _ in range(4):
            t0 = time.time()
            np.asarray(jf(cls_dev))
            times.append(time.time() - t0)
        best = min(times)
        print(
            f"{name:8s} {best*1e3:8.1f} ms  {best/n_chars*1e9:6.2f} ns/char  "
            f"({n_chars/best/1e9:.3f} GB/s)  [r={r}]",
            flush=True,
        )


if __name__ == "__main__":
    main()
