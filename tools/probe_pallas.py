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

        o_ref[0, 0] += jnp.sum(x_ref[:])

    x = jnp.arange(tiles * T, dtype=jnp.float32).reshape(tiles, 8, W)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, 8, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(x)

    r = float(np.asarray(run(x))[0, 0])
    want = float(np.arange(tiles * T, dtype=np.float64).sum())
    log(f"P2 sequential-grid accumulator: got {r}, want {want}, ok={r == want}")


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
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[0, 0] = 0
            carry_ref[0] = 0

        g = g4_ref[:].reshape(T, 1)  # block (1, 8, T//8) -> (T, 1)
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
        # AND with previous position's hit (shift by one, carry across tiles)
        flat = hit.reshape(1, T)
        prev = jnp.concatenate(
            [carry_ref[0].reshape(1, 1), flat[:, : T - 1]], axis=1
        )
        flag = flat & prev
        carry_ref[0] = flat[0, T - 1]
        o_ref[0, 0] += jnp.sum(flag)

    @jax.jit
    def run(tab, g4):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 8, T // 8),
                    lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(tab, g4)

    tab_d = jnp.asarray(tab)
    g4_d = jnp.asarray(g4.reshape(n_tiles, 8, T // 8))
    t0 = time.time()
    cnt = int(np.asarray(run(tab_d, g4_d))[0, 0])
    log(f"P4 compile+run: {time.time()-t0:.1f}s, survivors={cnt} ({cnt/N:.4%})")
    best = timeit(lambda: np.asarray(run(tab_d, g4_d)), reps)
    log(
        f"P4 fused flags (R={R}, N={N/1e6:.0f}M): {best*1e3:.1f} ms -> "
        f"{best/N*1e9:.3f} ns/char = {N/best/1e9:.3f} GB/s"
    )


if __name__ == "__main__":
    which = sys.argv[1:] or ["p0", "p1", "p2", "p3", "p4"]
    for name in which:
        try:
            globals()[name]()
        except Exception as e:  # noqa: BLE001 — probe reports and continues
            log(f"{name} FAILED: {type(e).__name__}: {e}")
