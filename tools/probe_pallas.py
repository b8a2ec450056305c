"""Probe: is Pallas/Mosaic viable on this backend, and at what cost?

Questions answered (PLAN.md will record results):
  P0  does a trivial pallas_call compile + run at all?
  P1  in-kernel MXU matmul (the bilinear fetch core) — ns per (2048,R)@(R,128)
  P2  sequential grid with VMEM accumulator output (index_map -> same block)
  P3  in-kernel onehot build + bilinear word fetch end to end, exactness
  P4  fused flags kernel sketch: g4 -> hash -> onehot -> MXU fetch -> bit
      test -> AND-shift -> per-tile survivor count; ns/char
Timing rule (PLAN.md): always fetch a small result to host via np.asarray.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from pyahocorasick_tpu.utils.compile_cache import ensure_compile_cache

ensure_compile_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, reps=5):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return min(ts)


# ---------------------------------------------------------------- P0: trivial
def p0():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    x = jnp.ones((256, 128), jnp.float32)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    t0 = time.time()
    r = np.asarray(run(x))
    log(f"P0 trivial pallas: OK ({time.time()-t0:.1f}s compile), sum={r.sum()}")


# ------------------------------------------------- P1: in-kernel MXU matmul
def p1(R=256, T=2048, iters=64):
    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((8, 128), jnp.float32)
        def body(i, acc):
            r = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
            return acc + r[:8]
        acc = jax.lax.fori_loop(0, iters, body, acc)
        o_ref[:] = acc

    a = jnp.ones((T, R), jnp.float32)
    b = jnp.ones((R, 128), jnp.float32)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    best = timeit(lambda: np.asarray(run(a, b)))
    per = best / iters / T * 1e9
    log(f"P1 MXU (T={T},R={R}) x{iters}: {best*1e3:.2f} ms -> {per:.3f} ns/row")


# ---------------------- P2: sequential grid, accumulator output across steps
def p2(tiles=64, T=512):
    # blocks must have last-two dims divisible by (8, 128): feed 3-D
    # (tiles, 8, T//8) with block (1, 8, T//8)
    W = T // 8

    def kernel(x_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        # scalar stores to VMEM are rejected; accumulate whole-block
        o_ref[:] = o_ref[:] + jnp.sum(x_ref[:])

    x = jnp.arange(tiles * T, dtype=jnp.float32).reshape(tiles, 8, W)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(x)

    r = float(np.asarray(run(x))[0, 0])
    want = float(np.arange(tiles * T, dtype=np.float32).sum(dtype=np.float32))
    log(f"P2 sequential-grid accumulator: got {r}, want ~{want}, "
        f"ok={abs(r - want) < abs(want) * 1e-3}")


# ---------------- P3: in-kernel bilinear word fetch (onehot + MXU), exactness
def p3(R=256, T=2048):
    rng = np.random.default_rng(0)
    table = rng.integers(0, 1 << 24, (R, 128)).astype(np.float32)
    idx = rng.integers(0, R * 128, T).astype(np.int32)

    def kernel(tab_ref, idx_ref, o_ref):
        ix = idx_ref[:].reshape(T, 1)
        a = ix >> 7
        b = ix & 127
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (T, R), 1)
        oh = (a == iota_r).astype(jnp.float32)
        r = jax.lax.dot_general(
            oh, tab_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
        w = jnp.where(b == iota_c, r, 0.0).sum(axis=1).astype(jnp.int32)
        o_ref[:] = w.reshape(T // 128, 128)

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T // 128, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    got = np.asarray(run(jnp.asarray(table), jnp.asarray(idx))).reshape(-1)
    want = table.reshape(-1)[idx].astype(np.int32)
    ok = (got == want).all()
    log(f"P3 in-kernel bilinear fetch exact: {ok}")
    if not ok:
        bad = np.nonzero(got != want)[0][:5]
        log("   mism at", bad, got[bad], want[bad])


# -------- P4: fused flags sketch over a long input; measures ns/char
def p4(R=256, T=2048, n_tiles=4096, reps=5):
    N = T * n_tiles
    rng = np.random.default_rng(1)
    tab = rng.integers(0, 1 << 24, (R, 128)).astype(np.float32)
    g4 = rng.integers(0, 7_890_481, N).astype(np.int32)  # K=53: K^4
    MULT = np.uint32(0x9E3779B1)

    def kernel(tab_ref, g4_ref, o_ref, carry_ref):
        # layout rule (measured): Mosaic cannot shape-cast across the
        # sublane/lane split, so the block arrives as (T, 1) and stays there.
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
            carry_ref[0] = 0

        g = g4_ref[:]  # (T, 1) int32
        h = (g.astype(jnp.uint32) * MULT).astype(jnp.uint32)
        widx = ((h >> jnp.uint32(18)) % jnp.uint32(R * 128)).astype(jnp.int32)
        b1 = ((h & jnp.uint32(4095)) % jnp.uint32(24)).astype(jnp.int32)
        b2 = (((h >> jnp.uint32(5)) & jnp.uint32(4095)) % jnp.uint32(24)).astype(jnp.int32)
        a = widx >> 7
        c = widx & 127
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (T, R), 1)
        oh = (a == iota_r).astype(jnp.float32)
        r = jax.lax.dot_general(
            oh, tab_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
        w = jnp.where(c == iota_c, r, 0.0).sum(axis=1, keepdims=True).astype(jnp.int32)
        hit = ((w >> b1) & (w >> b2) & 1).astype(jnp.int32)  # (T,1)
        # AND with previous position's hit: roll along sublanes + SMEM carry
        rolled = pltpu.roll(hit, 1, axis=0)
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        prev = jnp.where(iota_t == 0, carry_ref[0], rolled)
        flag = hit & prev
        carry_ref[0] = jnp.sum(jnp.where(iota_t == T - 1, hit, 0))
        o_ref[:] = o_ref[:] + jnp.sum(flag)

    @jax.jit
    def run(tab, g4):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (T, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(tab, g4)

    tab_d = jnp.asarray(tab)
    g4_d = jnp.asarray(g4.reshape(n_tiles * T, 1))
    t0 = time.time()
    cnt = int(np.asarray(run(tab_d, g4_d))[0, 0])
    log(f"P4 compile+run: {time.time()-t0:.1f}s, survivors={cnt} ({cnt/N:.4%})")
    best = timeit(lambda: np.asarray(run(tab_d, g4_d)), reps)
    log(
        f"P4 fused flags (R={R}, N={N/1e6:.0f}M): {best*1e3:.1f} ms -> "
        f"{best/N*1e9:.3f} ns/char = {N/best/1e9:.3f} GB/s"
    )




# -------- P5: lax.map over a no-grid tile kernel (the production shape).
# Measures the full fused stage-1 pipeline: hash -> onehot -> MXU bloom fetch
# -> bit pair test -> AND-shift (in-tile, tiles overlap by 1) -> per-tile
# survivor count.  No pallas grid at all: one kernel per map step.
def p5(R=256, T=2048, n_tiles=4096, reps=5):
    N = T * n_tiles
    rng = np.random.default_rng(1)
    tab = rng.integers(0, 1 << 24, (R, 128)).astype(np.float32)
    g4 = rng.integers(0, 7_890_481, N + 1).astype(np.int32)
    MULT = np.uint32(0x9E3779B1)

    def kernel(tab_ref, g4_ref, o_ref):
        g = g4_ref[:]  # (T+8, 1): position i of the tile is row i+1's g4...
        h = (g.astype(jnp.uint32) * MULT).astype(jnp.uint32)
        widx = ((h >> jnp.uint32(13)) % jnp.uint32(R * 128)).astype(jnp.int32)
        b1 = ((h & jnp.uint32(0xFFF)) % jnp.uint32(24)).astype(jnp.int32)
        b2f = ((h >> jnp.uint32(6)) & jnp.uint32(0x3F)) % jnp.uint32(23)
        b2 = ((b1 + 1 + b2f.astype(jnp.int32)) % 24).astype(jnp.int32)
        a = widx >> 7
        c = widx & 127
        Tp = T + 8
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (Tp, R), 1)
        oh = (a == iota_r).astype(jnp.float32)
        r = jax.lax.dot_general(
            oh, tab_ref[:], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (Tp, 128), 1)
        w = jnp.where(c == iota_c, r, 0.0).sum(axis=1, keepdims=True).astype(jnp.int32)
        hit = ((w >> b1) & (w >> b2) & 1).astype(jnp.int32)  # (Tp,1)
        prev = pltpu.roll(hit, 1, axis=0)
        flag = (hit & prev)[8:]  # first 8 rows are overlap/halo
        o_ref[:] = jnp.zeros_like(o_ref) + jnp.sum(flag)

    from functools import partial

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(tab, tiles):
        outs = jax.lax.map(lambda t: call(tab, t), tiles)
        return outs[:, 0, 0].sum()

    # tile t covers positions [t*T, (t+1)*T), input rows t*T-7 .. (t+1)*T
    idx = (
        np.arange(n_tiles)[:, None] * T + np.arange(-7, T + 1)[None, :]
    ).clip(0)
    tiles = jnp.asarray(g4[idx][..., None])  # (n_tiles, T+8, 1)
    tab_d = jnp.asarray(tab)
    t0 = time.time()
    cnt = int(np.asarray(run(tab_d, tiles)))
    log(f"P5 compile+run: {time.time()-t0:.1f}s, survivors={cnt} ({cnt/N:.4%})")
    best = timeit(lambda: np.asarray(run(tab_d, tiles)), reps)
    log(
        f"P5 map-of-kernels flags (R={R}, N={N/1e6:.0f}M): {best*1e3:.1f} ms"
        f" -> {best/N*1e9:.3f} ns/char = {N/best/1e9:.3f} GB/s"
    )



# -------- P6: the PRODUCTION kernel shape — pow2-only hashing (no integer
# modulo: P5 measured 9.8 ns/char with %24/%23 on (T,1) tensors), stage-1
# B1(f32,16-bit words)+W4(bf16,8-bit) blooms, in-kernel chunked-TRI prefix
# compaction to C2 slots, stage-2 blooms on survivors, O-matmul unpack.
def p6(R=256, T=2048, C2=128, n_tiles=4096, reps=5, interpret=False):
    OV = 8
    Tp = T + OV
    N = T * n_tiles
    M1, M2, M3 = 0x9E3779B1, 0x85EBCA77, 0xC2B2AE35
    rng = np.random.default_rng(1)

    def mktab(rows, bits, frac):
        # random table with ~frac of bits set (to control survivor rates)
        w = (
            rng.random((rows, 128, bits)) < frac
        ).astype(np.int64)
        words = (w * (1 << np.arange(bits))).sum(axis=2)
        return words.astype(np.float32)

    b1_t = mktab(R, 16, 0.22)      # pair pass ~ 0.048 -> AND-shift ~ 2.3e-3
    w4_t = mktab(128, 8, 0.06)     # pair ~ 3.6e-3
    s2a_t = mktab(128, 16, 0.38)
    s2b_t = mktab(128, 16, 0.38)
    w4b_t = mktab(128, 8, 0.06)
    g4 = rng.integers(0, 1 << 24, N).astype(np.int32)

    def fetch(tab, widx, bf16=False):
        rows = tab.shape[0]
        n = widx.shape[0]
        a = widx >> 7
        c = widx & 127
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (n, rows), 1)
        oh = (a == iota_r).astype(tab.dtype)
        r = jax.lax.dot_general(
            oh, tab, (((1,), (0,)), ((), ())),
            precision=(
                None if bf16 else jax.lax.Precision.HIGHEST
            ),
            preferred_element_type=jnp.float32,
        )
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
        return (
            jnp.where(c == iota_c, r, 0.0).sum(axis=1, keepdims=True)
        ).astype(jnp.int32)

    def bloom16(tab, u, mult, shift, mask):
        h = (u * jnp.uint32(mult)).astype(jnp.uint32)
        widx = ((h >> jnp.uint32(shift)) & jnp.uint32(mask)).astype(jnp.int32)
        b1 = (h & jnp.uint32(15)).astype(jnp.int32)
        b2 = (b1 + 1 + (((h >> jnp.uint32(4)) & jnp.uint32(7)).astype(jnp.int32))) & 15
        w = fetch(tab, widx)
        return (w >> b1) & (w >> b2) & 1

    def bloom8(tab, u, mult, shift):
        h = (u * jnp.uint32(mult)).astype(jnp.uint32)
        widx = ((h >> jnp.uint32(shift)) & jnp.uint32(16383)).astype(jnp.int32)
        b1 = (h & jnp.uint32(7)).astype(jnp.int32)
        b2 = (b1 + 1 + (((h >> jnp.uint32(3)) & jnp.uint32(3)).astype(jnp.int32))) & 7
        w = fetch(tab, widx, bf16=False)
        return (w >> b1) & (w >> b2) & 1

    B1MASK = R * 128 - 1

    def kernel(b1_ref, w4_ref, s2a_ref, s2b_ref, w4b_ref, g4_ref,
               mask_ref, meta_ref):
        g = g4_ref[:]                       # (Tp,1) i32
        u = g.astype(jnp.uint32)
        hit1 = bloom16(b1_ref[:], u, M1, 15, B1MASK)
        deep1 = hit1 & pltpu.roll(hit1, 1, axis=0)
        hw = bloom8(w4_ref[:], u, M2, 14)
        kinds = (deep1 | (hw << 1))[OV:]    # (T,1) bit0 deep, bit1 w4
        kinds_any = (kinds | (kinds >> 1)) & 1  # (T,1) int32 0/1
        ff = kinds_any.astype(jnp.float32)
        # --- chunked inclusive prefix (TRI matmuls, 16 chunks of 128)
        ii = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        TRI = (jj <= ii).astype(jnp.float32)
        I128 = (ii == jj).astype(jnp.int32)
        slots = []
        off = jnp.float32(0.0)
        for r in range(T // 128):
            fc = ff[r * 128:(r + 1) * 128]
            intra = jax.lax.dot_general(
                TRI, fc, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            slots.append(intra + off)
            off = off + jnp.sum(fc)
        incl = jnp.concatenate(slots, axis=0)      # (T,1) f32
        slot = incl.astype(jnp.int32) - 1
        # --- O (T, C2) scatter matrix
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (T, C2), 1)
        flagi = kinds_any  # (T,1) int32 0/1
        O = ((slot == iota_j).astype(jnp.int32) * flagi).astype(jnp.float32)
        # --- compact values (g4, g4prev, kinds) to (C2, 3)
        gp = pltpu.roll(g, 1, axis=0)
        V = jnp.concatenate(
            [g[OV:], gp[OV:], kinds], axis=1
        ).astype(jnp.float32)                      # (T,3)
        iota_jc = jax.lax.broadcasted_iota(jnp.int32, (C2, 128), 0)
        cv = jnp.zeros((C2, 3), jnp.float32)
        for r in range(T // 128):
            sc = slot[r * 128:(r + 1) * 128]       # (128,1)
            fc = kinds_any[r * 128:(r + 1) * 128]  # (128,1) int32
            # diag-extract "transpose": (128,1) column -> (1,128) row via
            # identity-mask multiply + sublane reduce (no shape cast needed)
            sr = (I128 * sc).sum(axis=0, keepdims=True)   # (1,128)
            fr = (I128 * fc).sum(axis=0, keepdims=True)   # (1,128) 0/1
            OcT = ((sr == iota_jc).astype(jnp.int32) * fr).astype(
                jnp.float32)
            cv = cv + jax.lax.dot_general(
                OcT, V[r * 128:(r + 1) * 128], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        cg4 = cv[:, 0:1].astype(jnp.int32)
        cgp = cv[:, 1:2].astype(jnp.int32)
        ck = cv[:, 2:3].astype(jnp.int32)
        u4 = cg4.astype(jnp.uint32)
        up = cgp.astype(jnp.uint32)
        d2 = bloom16(s2a_ref[:], u4, M2, 15, 16383) & bloom16(
            s2b_ref[:], up, M3, 15, 16383)
        w2 = bloom8(w4b_ref[:], u4, M3, 14)
        final_c = (((ck & 1) & d2) | (((ck >> 1) & 1) & w2)).astype(jnp.float32)
        fin = jax.lax.dot_general(
            O, final_c, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        mask_ref[:] = fin.astype(jnp.int32)
        meta_ref[:] = jnp.zeros_like(meta_ref) + off

    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, 1), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(tabs, g4_flat):
        g4pad = jnp.pad(g4_flat, (OV, 0))

        def tile_fn(t):
            sl = jax.lax.dynamic_slice(g4pad, (t * T,), (Tp,))
            m, meta = call(*tabs, sl[:, None])
            return jnp.sum(m), meta[0, 0]

        sums, metas = jax.lax.map(
            tile_fn, jnp.arange(n_tiles, dtype=jnp.int32)
        )
        return sums.sum(), metas.max()

    tabs = tuple(
        jnp.asarray(t if t is not w4_t and t is not w4b_t else t)
        for t in (b1_t, w4_t, s2a_t, s2b_t, w4b_t)
    )
    g4_d = jnp.asarray(g4)
    t0 = time.time()
    tot, mx = (np.asarray(x) for x in run(tabs, g4_d))
    log(
        f"P6 compile+run: {time.time()-t0:.1f}s, final={int(tot)} "
        f"({int(tot)/N:.5%}), max tile survivors={float(mx):.0f}/{C2}"
    )
    best = timeit(lambda: np.asarray(run(tabs, g4_d)[0]), reps)
    log(
        f"P6 full fused kernel (R={R}, C2={C2}, N={N/1e6:.0f}M): "
        f"{best*1e3:.1f} ms -> {best/N*1e9:.3f} ns/char = {N/best/1e9:.3f} GB/s"
    )



# -------- P7: P6 with a compile-size diet — fori_loop chunk loops and a
# host-precomputed block-diagonal triangular matrix for the intra-chunk
# prefix (P6's 16x unrolled matmul chain exceeded a 15-minute Mosaic
# compile).  Same math, ~4x smaller program.
def p7(R=256, T=2048, C2=128, n_tiles=4096, reps=5, interpret=False):
    OV = 8
    Tp = T + OV
    N = T * n_tiles
    M1, M2, M3 = 0x9E3779B1, 0x85EBCA77, 0xC2B2AE35
    rng = np.random.default_rng(1)

    def mktab(rows, bits, frac):
        w = (rng.random((rows, 128, bits)) < frac).astype(np.int64)
        words = (w * (1 << np.arange(bits))).sum(axis=2)
        return words.astype(np.float32)

    b1_t = mktab(R, 24, 0.27)      # k3 pass ~ 2% -> AND-shift ~ 4e-4
    w4_t = mktab(128, 8, 0.06)     # k2 pass ~ 3.6e-3
    s2a_t = mktab(128, 24, 0.38)
    s2b_t = mktab(128, 24, 0.38)
    w4b_t = mktab(128, 8, 0.06)
    g4 = rng.integers(0, 1 << 24, N).astype(np.int32)
    # block-diagonal inclusive-triangular (T,T) bf16: intra-chunk prefix in
    # ONE matmul (values <= 128, exact in bf16)
    ii = np.arange(T)
    bd = ((ii[:, None] // 128 == ii[None, :] // 128) &
          (ii[None, :] <= ii[:, None])).astype(np.float32)

    def fetch(tab, widx, highest=True):
        rows = tab.shape[0]
        n = widx.shape[0]
        a = widx >> 7
        c = widx & 127
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (n, rows), 1)
        oh = (a == iota_r).astype(tab.dtype)
        r = jax.lax.dot_general(
            oh, tab, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST if highest else None,
            preferred_element_type=jnp.float32,
        )
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
        return (
            jnp.where(c == iota_c, r, 0.0).sum(axis=1, keepdims=True)
        ).astype(jnp.int32)

    def bloom16(tab, u, mult, mask):
        h = (u * jnp.uint32(mult)).astype(jnp.uint32)
        widx = ((h >> jnp.uint32(15)) & jnp.uint32(mask)).astype(jnp.int32)
        b1 = (h & jnp.uint32(7)).astype(jnp.int32)
        b2 = 8 + ((h >> jnp.uint32(3)) & jnp.uint32(7)).astype(jnp.int32)
        b3 = 16 + ((h >> jnp.uint32(6)) & jnp.uint32(7)).astype(jnp.int32)
        w = fetch(tab, widx)
        return (w >> b1) & (w >> b2) & (w >> b3) & 1

    def bloom8(tab, u, mult):
        h = (u * jnp.uint32(mult)).astype(jnp.uint32)
        widx = ((h >> jnp.uint32(14)) & jnp.uint32(16383)).astype(jnp.int32)
        b1 = (h & jnp.uint32(3)).astype(jnp.int32)
        b2 = 4 + ((h >> jnp.uint32(2)) & jnp.uint32(3)).astype(jnp.int32)
        w = fetch(tab, widx)
        return (w >> b1) & (w >> b2) & 1

    B1MASK = R * 128 - 1

    def kernel(b1_ref, w4_ref, s2a_ref, s2b_ref, w4b_ref, bd_ref, g4_ref,
               mask_ref, meta_ref):
        g = g4_ref[:]                       # (Tp,1) i32
        u = g.astype(jnp.uint32)
        hit1 = bloom16(b1_ref[:], u, M1, B1MASK)
        deep1 = hit1 & pltpu.roll(hit1, 1, axis=0)
        hw = bloom8(w4_ref[:], u, M2)
        kinds = (deep1 | (hw << 1))[OV:]    # (T,1)
        kinds_any = (kinds | (kinds >> 1)) & 1
        ff = kinds_any.astype(jnp.float32)
        # --- intra-chunk inclusive prefix: ONE block-diag matmul (bf16)
        intra = jax.lax.dot_general(
            bd_ref[:], ff.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                    # (T,1) values <= 128
        # --- chunk offsets via a small fori loop (16 iters)
        def off_body(r, carry):
            offs, acc = carry
            tot = jnp.sum(
                jax.lax.dynamic_slice(ff, (r * 128, 0), (128, 1)))
            offs = jax.lax.dynamic_update_slice(
                offs, jnp.zeros((128, 1), jnp.float32) + acc, (r * 128, 0))
            return offs, acc + tot
        offs0 = jnp.zeros((T, 1), jnp.float32)
        offs, nsurv = jax.lax.fori_loop(
            0, T // 128, off_body, (offs0, jnp.float32(0.0)))
        incl = intra + offs
        slot = incl.astype(jnp.int32) - 1
        # --- O (T, C2)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (T, C2), 1)
        O = ((slot == iota_j).astype(jnp.int32) * kinds_any).astype(
            jnp.float32)
        # --- compact (g4, g4prev, kinds) -> (C2,3) via fori chunks
        gp = pltpu.roll(g, 1, axis=0)
        V = jnp.concatenate(
            [g[OV:], gp[OV:], kinds], axis=1).astype(jnp.float32)  # (T,3)
        ii2 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        jj2 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        I128 = (ii2 == jj2).astype(jnp.int32)
        iota_jc = jax.lax.broadcasted_iota(jnp.int32, (C2, 128), 0)

        def cv_body(r, cv):
            sc = jax.lax.dynamic_slice(slot, (r * 128, 0), (128, 1))
            fc = jax.lax.dynamic_slice(kinds_any, (r * 128, 0), (128, 1))
            sr = (I128 * sc).sum(axis=0, keepdims=True)
            fr = (I128 * fc).sum(axis=0, keepdims=True)
            OcT = ((sr == iota_jc).astype(jnp.int32) * fr).astype(
                jnp.float32)
            Vc = jax.lax.dynamic_slice(V, (r * 128, 0), (128, 3))
            return cv + jax.lax.dot_general(
                OcT, Vc, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
        cv = jax.lax.fori_loop(
            0, T // 128, cv_body, jnp.zeros((C2, 3), jnp.float32))
        cg4 = cv[:, 0:1].astype(jnp.int32)
        cgp = cv[:, 1:2].astype(jnp.int32)
        ck = cv[:, 2:3].astype(jnp.int32)
        d2 = bloom16(s2a_ref[:], cg4.astype(jnp.uint32), M2, 16383) & \
            bloom16(s2b_ref[:], cgp.astype(jnp.uint32), M3, 16383)
        w2 = bloom8(w4b_ref[:], cg4.astype(jnp.uint32), M3)
        final_c = (((ck & 1) & d2) | (((ck >> 1) & 1) & w2)).astype(
            jnp.float32)
        fin = jax.lax.dot_general(
            O, final_c, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        mask_ref[:] = fin.astype(jnp.int32)
        meta_ref[:] = jnp.zeros_like(meta_ref) + nsurv

    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, 1), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )

    @jax.jit
    def run(tabs, g4_flat):
        g4pad = jnp.pad(g4_flat, (OV, 0))

        def tile_fn(t):
            sl = jax.lax.dynamic_slice(g4pad, (t * T,), (Tp,))
            m, meta = call(*tabs, sl[:, None])
            return jnp.sum(m), meta[0, 0]

        sums, metas = jax.lax.map(
            tile_fn, jnp.arange(n_tiles, dtype=jnp.int32))
        return sums.sum(), metas.max()

    tabs = (
        jnp.asarray(b1_t), jnp.asarray(w4_t), jnp.asarray(s2a_t),
        jnp.asarray(s2b_t), jnp.asarray(w4b_t),
        jnp.asarray(bd, jnp.bfloat16),
    )
    g4_d = jnp.asarray(g4)
    t0 = time.time()
    tot, mx = (np.asarray(x) for x in run(tabs, g4_d))
    log(
        f"P7 compile+run: {time.time()-t0:.1f}s, final={int(tot)} "
        f"({int(tot)/N:.5%}), max tile survivors={float(mx):.0f}/{C2}"
    )
    best = timeit(lambda: np.asarray(run(tabs, g4_d)[0]), reps)
    log(
        f"P7 full fused kernel (R={R}, C2={C2}, N={N/1e6:.0f}M): "
        f"{best*1e3:.1f} ms -> {best/N*1e9:.3f} ns/char = {N/best/1e9:.3f} GB/s"
    )



# -------- P8: P7 with ref-based chunk loops — Mosaic has no dynamic_slice
# on VALUES (P7 failed), but dynamic slices of VMEM refs (pl.ds) lower
# fine, so intermediates round-trip through scratch refs.
def p8(R=256, T=2048, C2=128, n_tiles=4096, reps=5, interpret=False):
    OV = 8
    Tp = T + OV
    N = T * n_tiles
    M1, M2, M3 = 0x9E3779B1, 0x85EBCA77, 0xC2B2AE35
    rng = np.random.default_rng(1)

    def mktab(rows, bits, frac):
        w = (rng.random((rows, 128, bits)) < frac).astype(np.int64)
        words = (w * (1 << np.arange(bits))).sum(axis=2)
        return words.astype(np.float32)

    b1_t = mktab(R, 24, 0.27)
    w4_t = mktab(128, 8, 0.06)
    s2a_t = mktab(128, 24, 0.38)
    s2b_t = mktab(128, 24, 0.38)
    w4b_t = mktab(128, 8, 0.06)
    g4 = rng.integers(0, 1 << 24, N).astype(np.int32)
    ii = np.arange(T)
    bd = ((ii[:, None] // 128 == ii[None, :] // 128) &
          (ii[None, :] <= ii[:, None])).astype(np.float32)

    def fetch(tab, widx, highest=True):
        rows = tab.shape[0]
        n = widx.shape[0]
        a = widx >> 7
        c = widx & 127
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (n, rows), 1)
        oh = (a == iota_r).astype(tab.dtype)
        r = jax.lax.dot_general(
            oh, tab, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST if highest else None,
            preferred_element_type=jnp.float32,
        )
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
        return (
            jnp.where(c == iota_c, r, 0.0).sum(axis=1, keepdims=True)
        ).astype(jnp.int32)

    def bloom16(tab, u, mult, mask):
        h = (u * jnp.uint32(mult)).astype(jnp.uint32)
        widx = ((h >> jnp.uint32(15)) & jnp.uint32(mask)).astype(jnp.int32)
        b1 = (h & jnp.uint32(7)).astype(jnp.int32)
        b2 = 8 + ((h >> jnp.uint32(3)) & jnp.uint32(7)).astype(jnp.int32)
        b3 = 16 + ((h >> jnp.uint32(6)) & jnp.uint32(7)).astype(jnp.int32)
        w = fetch(tab, widx)
        return (w >> b1) & (w >> b2) & (w >> b3) & 1

    def bloom8(tab, u, mult):
        h = (u * jnp.uint32(mult)).astype(jnp.uint32)
        widx = ((h >> jnp.uint32(14)) & jnp.uint32(16383)).astype(jnp.int32)
        b1 = (h & jnp.uint32(3)).astype(jnp.int32)
        b2 = 4 + ((h >> jnp.uint32(2)) & jnp.uint32(3)).astype(jnp.int32)
        w = fetch(tab, widx)
        return (w >> b1) & (w >> b2) & 1

    B1MASK = R * 128 - 1

    def kernel(b1_ref, w4_ref, s2a_ref, s2b_ref, w4b_ref, bd_ref, g4_ref,
               mask_ref, meta_ref,
               ff_s, intra_s, slot_s, ka_s, g4c_s, gpc_s, kinds_s):
        g = g4_ref[:]                       # (Tp,1) i32
        u = g.astype(jnp.uint32)
        hit1 = bloom16(b1_ref[:], u, M1, B1MASK)
        deep1 = hit1 & pltpu.roll(hit1, 1, axis=0)
        hw = bloom8(w4_ref[:], u, M2)
        kinds = (deep1 | (hw << 1))[OV:]    # (T,1)
        ka = (kinds | (kinds >> 1)) & 1
        ff = ka.astype(jnp.float32)
        ff_s[:] = ff
        ka_s[:] = ka
        kinds_s[:] = kinds
        g4c_s[:] = g[OV:].astype(jnp.float32)
        gpc_s[:] = pltpu.roll(g, 1, axis=0)[OV:].astype(jnp.float32)
        intra_s[:] = jax.lax.dot_general(
            bd_ref[:], ff.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        def off_body(r, acc):
            fslice = ff_s[pl.ds(r * 128, 128), :]
            slot_s[pl.ds(r * 128, 128), :] = (
                intra_s[pl.ds(r * 128, 128), :] + acc
            ).astype(jnp.int32) - 1
            return acc + jnp.sum(fslice)

        nsurv = jax.lax.fori_loop(0, T // 128, off_body, jnp.float32(0.0))

        slot = slot_s[:]
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (T, C2), 1)
        O = ((slot == iota_j).astype(jnp.int32) * ka_s[:]).astype(
            jnp.float32)

        ii2 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        jj2 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        I128 = (ii2 == jj2).astype(jnp.int32)
        iota_jc = jax.lax.broadcasted_iota(jnp.int32, (C2, 128), 0)

        def cv_body(r, cv):
            sc = slot_s[pl.ds(r * 128, 128), :]
            fc = ka_s[pl.ds(r * 128, 128), :]
            sr = (I128 * sc).sum(axis=0, keepdims=True)
            fr = (I128 * fc).sum(axis=0, keepdims=True)
            OcT = ((sr == iota_jc).astype(jnp.int32) * fr).astype(
                jnp.float32)
            Vc = jnp.concatenate(
                [
                    g4c_s[pl.ds(r * 128, 128), :],
                    gpc_s[pl.ds(r * 128, 128), :],
                    kinds_s[pl.ds(r * 128, 128), :].astype(jnp.float32),
                ],
                axis=1,
            )
            return cv + jax.lax.dot_general(
                OcT, Vc, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

        cv = jax.lax.fori_loop(
            0, T // 128, cv_body, jnp.zeros((C2, 3), jnp.float32))
        cg4 = cv[:, 0:1].astype(jnp.int32)
        cgp = cv[:, 1:2].astype(jnp.int32)
        ck = cv[:, 2:3].astype(jnp.int32)
        d2 = bloom16(s2a_ref[:], cg4.astype(jnp.uint32), M2, 16383) & \
            bloom16(s2b_ref[:], cgp.astype(jnp.uint32), M3, 16383)
        w2 = bloom8(w4b_ref[:], cg4.astype(jnp.uint32), M3)
        final_c = (((ck & 1) & d2) | (((ck >> 1) & 1) & w2)).astype(
            jnp.float32)
        fin = jax.lax.dot_general(
            O, final_c, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        mask_ref[:] = fin.astype(jnp.int32)
        meta_ref[:] = jnp.zeros_like(meta_ref) + nsurv

    call = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, 1), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((T, 1), jnp.float32),   # ff
            pltpu.VMEM((T, 1), jnp.float32),   # intra
            pltpu.VMEM((T, 1), jnp.int32),     # slot
            pltpu.VMEM((T, 1), jnp.int32),     # ka
            pltpu.VMEM((T, 1), jnp.float32),   # g4 f32
            pltpu.VMEM((T, 1), jnp.float32),   # g4prev f32
            pltpu.VMEM((T, 1), jnp.int32),     # kinds
        ],
        interpret=interpret,
    )

    @jax.jit
    def run(tabs, g4_flat):
        g4pad = jnp.pad(g4_flat, (OV, 0))

        def tile_fn(t):
            sl = jax.lax.dynamic_slice(g4pad, (t * T,), (Tp,))
            m, meta = call(*tabs, sl[:, None])
            return jnp.sum(m), meta[0, 0]

        sums, metas = jax.lax.map(
            tile_fn, jnp.arange(n_tiles, dtype=jnp.int32))
        return sums.sum(), metas.max()

    tabs = (
        jnp.asarray(b1_t), jnp.asarray(w4_t), jnp.asarray(s2a_t),
        jnp.asarray(s2b_t), jnp.asarray(w4b_t),
        jnp.asarray(bd, jnp.bfloat16),
    )
    g4_d = jnp.asarray(g4)
    t0 = time.time()
    tot, mx = (np.asarray(x) for x in run(tabs, g4_d))
    log(
        f"P8 compile+run: {time.time()-t0:.1f}s, final={int(tot)} "
        f"({int(tot)/N:.5%}), max tile survivors={float(mx):.0f}/{C2}"
    )
    best = timeit(lambda: np.asarray(run(tabs, g4_d)[0]), reps)
    log(
        f"P8 full fused kernel (R={R}, C2={C2}, N={N/1e6:.0f}M): "
        f"{best*1e3:.1f} ms -> {best/N*1e9:.3f} ns/char = {N/best/1e9:.3f} GB/s"
    )



# -------- P9: production stage-1 kernel — pow2 hashes only, B1 (AND-shift)
# + W4, mask output; compaction stays in XLA.  The P5 9.8 ns/char came from
# non-pow2 modulos; this measures the clean stage-1 cost.
def p9(R=512, T=2048, n_tiles=4096, reps=5, interpret=False):
    OV = 8
    Tp = T + OV
    N = T * n_tiles
    M1, M2 = 0x9E3779B1, 0x85EBCA77
    rng = np.random.default_rng(1)

    def mktab(rows, bits, frac):
        w = (rng.random((rows, 128, bits)) < frac).astype(np.int64)
        words = (w * (1 << np.arange(bits))).sum(axis=2)
        return words.astype(np.float32)

    b1_t = mktab(R, 24, 0.31)      # k3 pass ~3% at per-bit 0.31
    w4_t = mktab(128, 8, 0.06)
    g4 = rng.integers(0, 1 << 24, N).astype(np.int32)

    def fetch(tab, widx):
        rows = tab.shape[0]
        n = widx.shape[0]
        a = widx >> 7
        c = widx & 127
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (n, rows), 1)
        oh = (a == iota_r).astype(tab.dtype)
        r = jax.lax.dot_general(
            oh, tab, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
        return (
            jnp.where(c == iota_c, r, 0.0).sum(axis=1, keepdims=True)
        ).astype(jnp.int32)

    B1MASK = R * 128 - 1

    def kernel(b1_ref, w4_ref, g4_ref, mask_ref):
        g = g4_ref[:]                       # (Tp,1) i32
        u = g.astype(jnp.uint32)
        h = (u * jnp.uint32(M1)).astype(jnp.uint32)
        widx = ((h >> jnp.uint32(15)) & jnp.uint32(B1MASK)).astype(jnp.int32)
        b1 = (h & jnp.uint32(7)).astype(jnp.int32)
        b2 = 8 + ((h >> jnp.uint32(3)) & jnp.uint32(7)).astype(jnp.int32)
        b3 = 16 + ((h >> jnp.uint32(6)) & jnp.uint32(7)).astype(jnp.int32)
        w = fetch(b1_ref[:], widx)
        hit1 = (w >> b1) & (w >> b2) & (w >> b3) & 1
        deep1 = hit1 & pltpu.roll(hit1, 1, axis=0)
        h4 = (u * jnp.uint32(M2)).astype(jnp.uint32)
        widx4 = ((h4 >> jnp.uint32(14)) & jnp.uint32(16383)).astype(jnp.int32)
        c1 = (h4 & jnp.uint32(3)).astype(jnp.int32)
        c2 = 4 + ((h4 >> jnp.uint32(2)) & jnp.uint32(3)).astype(jnp.int32)
        w4w = fetch(w4_ref[:], widx4)
        hw = (w4w >> c1) & (w4w >> c2) & 1
        mask_ref[:] = (deep1 | (hw << 1))[OV:]

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    @jax.jit
    def run(b1, w4, g4_flat):
        g4pad = jnp.pad(g4_flat, (OV, 0))

        def tile_fn(t):
            sl = jax.lax.dynamic_slice(g4pad, (t * T,), (Tp,))
            return jnp.sum(call(b1, w4, sl[:, None]))

        return jax.lax.map(
            tile_fn, jnp.arange(n_tiles, dtype=jnp.int32)).sum()

    b1_d, w4_d, g4_d = jnp.asarray(b1_t), jnp.asarray(w4_t), jnp.asarray(g4)
    t0 = time.time()
    tot = int(np.asarray(run(b1_d, w4_d, g4_d)))
    log(f"P9 compile+run: {time.time()-t0:.1f}s, s1 mask sum={tot} ({tot/N:.4%})")
    best = timeit(lambda: np.asarray(run(b1_d, w4_d, g4_d)), reps)
    log(
        f"P9 stage-1 kernel (R={R}, N={N/1e6:.0f}M): {best*1e3:.1f} ms -> "
        f"{best/N*1e9:.3f} ns/char = {N/best/1e9:.3f} GB/s"
    )


if __name__ == "__main__":
    which = sys.argv[1:] or ["p0", "p1", "p2", "p3", "p4"]
    for name in which:
        try:
            globals()[name]()
        except Exception as e:  # noqa: BLE001 — probe reports and continues
            log(f"{name} FAILED: {type(e).__name__}: {e}")
