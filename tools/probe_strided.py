"""Length-stratified strided prefilter probe (VERDICT r4 "next round" #1).

Question under test: can the stage-1 flags floor (PLAN.md "single-chip
1 GB/s question") be beaten by probing the LONG pattern stratum only every
s positions?  A pattern of length L >= g + s - 1 contains a g-gram ending
on any stride-s grid; because the occurrence alignment (mod s) is unknown,
each long pattern must insert its grams at s consecutive end offsets — the
key set grows s-fold while the probe rate drops s-fold, so the streamed
bloom bits/char are unchanged AT EQUAL fp; the potential win is (a) the
per-probe VPU machinery (hash, onehot, word selects, prefix compaction)
amortizing over s chars, and (b) fp relaxation by the verification budget.

Scheme measured here (s in {2, 4}, g = 8):
* long stratum = patterns with L >= s + 7; key_j = pair-mix of the two
  4-gram codes ending at (end-j-4, end-j), j in 0..s-1 — an 8-gram
  fingerprint, so a SINGLE probe per grid position suffices (no AND-shift;
  the 8-gram true rate is ~|keys|/K^8 ~ 0).
* short-deep stratum = 5 <= L <= s + 6 keeps the per-char AND-shift bloom
  of ops/fused.py, but over its own (much smaller) key set.
* the grid g4/u8 streams are built by XLA strided slices OUTSIDE the
  kernel (full-stream in-kernel g4 was load-bearing at stride 1; at
  stride 4 the prep touches N/4 outputs).

Outputs per config: warm ns/char (including XLA prep), stage-1 survivor
rate per char, and the prep-only cost — enough to decide productization
or commit a measured refutation (the VERDICT's required artifact).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CHARS = int(os.environ.get("BENCH_CHARS", 1 << 27))
TILE = 4096


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pattern_tails(compiled, min_len, max_tail):
    """Per-pattern edge-class tails[t] = class at position len-1-t, for
    patterns with depth >= min_len.  Returns (tails[max_tail+1, n], lens)."""
    depth = compiled.depth
    word_id = compiled.word_id
    idx = np.nonzero((word_id >= 0) & (depth >= min_len))[0]
    parent = compiled.parent.astype(np.int64)
    edge_cls = compiled.edge_cls
    chain = idx.copy()
    tails = []
    for _ in range(max_tail + 1):
        tails.append(edge_cls[chain].astype(np.int64))
        chain = parent[chain]
    return np.stack(tails), depth[idx].astype(np.int64)


def main():
    import string

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import pyahocorasick_tpu as ahocorasick
    from pyahocorasick_tpu.ops import cascade as C
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
    K = compiled.num_classes
    C5 = np.uint64(F._C5)

    hay = letters[rng.integers(0, letters.size, N_CHARS)]
    cls = compiled.classes_of(hay.astype(np.uint32)).astype(np.int32)
    Npad = -(-N_CHARS // (TILE * 4)) * TILE * 4
    pad = np.zeros(Npad, np.int8)
    pad[:N_CHARS] = cls
    cls_dev = jnp.asarray(pad)
    np.asarray(cls_dev[:1])

    def g4code(tails, j):
        return (
            tails[j + 3] * K**3 + tails[j + 2] * K**2
            + tails[j + 1] * K + tails[j]
        )

    # ---- key sets per stratum
    tails_all, lens_all = pattern_tails(compiled, 5, 15)
    deep_all = np.union1d(ct.codes_suf, ct.codes_sufb)
    strata = {}
    for s in (2, 4):
        lmin_long = s + 7
        long_m = lens_all >= lmin_long
        short_m = ~long_m  # 5..s+6
        keys = []
        for j in range(s):
            gA = g4code(tails_all[:, long_m], j)
            gB = g4code(tails_all[:, long_m], j + 4)
            keys.append(
                ((gA.astype(np.uint64) * C5 + gB.astype(np.uint64))
                 & np.uint64(0xFFFFFFFF)).astype(np.int64)
            )
        keys = np.unique(np.concatenate(keys)) if keys else np.zeros(0)
        # short-deep per-char AND-shift families (suf + sufb of stratum)
        sufs = np.unique(g4code(tails_all[:, short_m], 0))
        sufbs = np.unique(g4code(tails_all[:, short_m], 1))
        sd = np.union1d(sufs, sufbs)
        strata[s] = (keys, sd, int(long_m.sum()), int(short_m.sum()))
        log(f"s={s}: long_patterns={long_m.sum()} keys={keys.size} "
            f"short_deep_patterns={short_m.sum()} sd_codes={sd.size}")
    log(f"baseline deep codes (all l>=5): {deep_all.size}")

    # ---- generic (1, T)-stream bloom-count kernel
    def make_count_call(rows, n_tiles, and_shift):
        def kernel(bT_ref, u_ref, out_ref):
            u = u_ref[0].astype(jnp.uint32)  # (1, T)
            w, bits = F._hash_parts_dev(u, F._M1, rows * 128, F._WBITS_F32)
            a = w >> 7
            csel = w & 127
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (rows, TILE), 0)
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (128, TILE), 0)
            oh = (a == iota_r).astype(jnp.bfloat16)
            r3 = jax.lax.dot_general(
                bT_ref[:], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            csel_m = csel == iota_c

            def word_of(rs):
                return (
                    jnp.where(csel_m, rs, 0.0)
                    .sum(axis=0, keepdims=True).astype(jnp.int32)
                )

            w0 = word_of(r3[0:128])
            w1 = word_of(r3[128:256])
            w2 = word_of(r3[256:384])
            hit = (
                (w0 >> bits[0]) & (w1 >> (bits[1] - 8))
                & (w2 >> (bits[2] - 16)) & 1
            )
            if and_shift:
                hit = hit & pltpu.roll(hit, 1, axis=1)
            out_ref[0] = jnp.broadcast_to(
                hit.sum().reshape(1, 1), (1, 8)
            )

        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((384, rows), lambda t: (0, 0)),
                pl.BlockSpec((1, 1, TILE), lambda t: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, 8), lambda t: (t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 1, 8), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
        )

    def bloom_dev(codes, rows):
        B = F._bloom_build(codes, F._M1, rows, F._WBITS_F32)
        w24 = np.asarray(B, np.float64).astype(np.int64)
        b1t = np.concatenate(
            [np.ascontiguousarray(((w24 >> (8 * t)) & 0xFF).T)
             for t in range(3)], 0
        )
        return jnp.asarray(b1t, dtype=jnp.bfloat16)

    results = {}

    def run(name, fn, *args):
        t0 = time.time()
        r = int(np.asarray(fn(*args)))
        log(f"{name:24s} compile+run {time.time()-t0:6.1f}s")
        ts = []
        for _ in range(3):
            t0 = time.time()
            r = int(np.asarray(fn(*args)))
            ts.append(time.time() - t0)
        ns = min(ts) / N_CHARS * 1e9
        rate = r / N_CHARS
        results[name] = (ns, rate)
        log(f"{name:24s} best {min(ts)*1e3:7.1f} ms -> {ns:5.2f} ns/char"
            f"  rate={rate:.2e}/char")

    # ---- baseline: per-char g4 stream + bloom at rows r (prep in XLA to
    # keep kernels comparable; production does g4 in-kernel at ~equal cost)
    def make_full(rows, and_shift):
        n_tiles = Npad // TILE
        call = make_count_call(rows, n_tiles, and_shift)

        @jax.jit
        def fn(cd, bT):
            c = cd.astype(jnp.int32)
            c1 = jnp.pad(c, (1, 0))[:-1]
            c2 = jnp.pad(c, (2, 0))[:-2]
            c3 = jnp.pad(c, (3, 0))[:-3]
            g4 = ((c3 * K + c2) * K + c1) * K + c
            return call(bT, g4.reshape(n_tiles, 1, TILE))[:, 0, 0].sum()

        return fn

    # ---- strided: grid g4 via strided slices; u8 = cur*C5 + prev_grid
    def make_strided(rows, s):
        m = Npad // s
        n_tiles = m // TILE
        call = make_count_call(rows, n_tiles, False)
        kgap = 4 // s  # grid steps between the paired grams

        @jax.jit
        def fn(cd, bT):
            c = cd.astype(jnp.int32)
            c0 = c[s - 1::s]
            c1 = jnp.pad(c, (1, 0))[:-1][s - 1::s]
            c2 = jnp.pad(c, (2, 0))[:-2][s - 1::s]
            c3 = jnp.pad(c, (3, 0))[:-3][s - 1::s]
            g4g = ((c3 * K + c2) * K + c1) * K + c0
            prev = jnp.pad(g4g, (kgap, 0))[:-kgap]
            u8 = (
                g4g.astype(jnp.uint32) * jnp.uint32(F._C5)
                + prev.astype(jnp.uint32)
            ).astype(jnp.int32)
            return call(bT, u8.reshape(n_tiles, 1, TILE))[:, 0, 0].sum()

        return fn

    @jax.jit
    def prep_only(cd):
        c = cd.astype(jnp.int32)
        c0 = c[3::4]
        c1 = jnp.pad(c, (1, 0))[:-1][3::4]
        c2 = jnp.pad(c, (2, 0))[:-2][3::4]
        c3 = jnp.pad(c, (3, 0))[:-3][3::4]
        g4g = ((c3 * K + c2) * K + c1) * K + c0
        prev = jnp.pad(g4g, (1, 0))[:-1]
        u8 = g4g.astype(jnp.uint32) * jnp.uint32(F._C5) + prev.astype(
            jnp.uint32
        )
        return u8.astype(jnp.int32).sum()

    run("prep-only s=4", prep_only, cls_dev)

    # baseline configs: the production-equivalent AND-shift bloom over ALL
    # deep codes at 256 rows, and the short-deep stratum at its own rows
    run("full@256 AND (baseline)", make_full(256, True),
        cls_dev, bloom_dev(deep_all, 256))
    for s in (2, 4):
        keys, sd, nlong, nshort = strata[s]
        r_sd = min(max(F._pow2(-(-sd.size // 1024)), 64), 4096)
        run(f"shortdeep@{r_sd} AND s={s}", make_full(r_sd, True),
            cls_dev, bloom_dev(sd, r_sd))
        for rows in ((512, 1024) if s == 4 else (512,)):
            run(f"strided s={s} u8@{rows}", make_strided(rows, s),
                cls_dev, bloom_dev(keys, rows))

    # ---- kernel-only strided cost: u8 grid stream precomputed on the
    # HOST (production could comb-stage at transfer time for free), so the
    # measurement isolates the probe kernel from the pathological XLA
    # strided-slice prep measured above
    for s, rows in ((4, 1024), (4, 512)):
        keys, sd, nlong, nshort = strata[s]
        m = Npad // s
        cgrid = pad.astype(np.int64)
        c0 = cgrid[s - 1::s]
        c1 = np.concatenate([[0], cgrid[:-1]])[s - 1::s]
        c2 = np.concatenate([[0, 0], cgrid[:-2]])[s - 1::s]
        c3 = np.concatenate([[0, 0, 0], cgrid[:-3]])[s - 1::s]
        g4g = ((c3 * K + c2) * K + c1) * K + c0
        kgap = 4 // s
        prev = np.concatenate([np.zeros(kgap, np.int64), g4g[:-kgap]])
        u8 = (
            (g4g.astype(np.uint64) * C5 + prev.astype(np.uint64))
            & np.uint64(0xFFFFFFFF)
        ).astype(np.int32)
        n_tiles = m // TILE
        u8_dev = jnp.asarray(u8.reshape(n_tiles, 1, TILE))
        np.asarray(u8_dev[:1, :, :1])
        call = make_count_call(rows, n_tiles, False)

        @jax.jit
        def kfn(u, bT):
            return call(bT, u)[:, 0, 0].sum()

        run(f"prestaged s={s} u8@{rows}", kfn, u8_dev,
            bloom_dev(keys, rows))

    log("---- summary (ns/char, rate/char)")
    for k, (ns, rate) in results.items():
        log(f"{k:28s} {ns:5.2f}  {rate:.2e}")
    # combined-scheme estimates
    for s in (2, 4):
        keys, sd, nlong, nshort = strata[s]
        r_sd = min(max(F._pow2(-(-sd.size // 1024)), 64), 4096)
        tot = 0.0
        srate = 0.0
        for nm in (f"shortdeep@{r_sd} AND s={s}",):
            tot += results[nm][0]
            srate += results[nm][1]
        for rows in ((1024,) if s == 4 else (512,)):
            nm = f"strided s={s} u8@{rows}"
            tot += results[nm][0]
            srate += results[nm][1]
        base = results["full@256 AND (baseline)"]
        log(f"scheme s={s}: flags {tot:5.2f} ns/char vs baseline "
            f"{base[0]:5.2f}; s1 rate {srate:.2e} vs {base[1]:.2e}")


if __name__ == "__main__":
    main()
