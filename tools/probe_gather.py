"""Microbenchmark TPU gather primitives (run on the real chip).

Answers, in ns/lookup:
  A. XLA HBM gather baseline (table[idx]) at several table sizes
  B. Pallas VMEM sweep-gather: R-row sweep cost per 1024-lane batch
  C. Whether take_along_axis(axis=0) (cross-sublane gather) compiles,
     enabling 1024-entry tiles instead of 128-entry rows
  D. jnp.take on a 1-D VMEM table inside pallas (Mosaic native lowering?)

Usage: python tools/probe_gather.py [A|B|C|D|all]
Each case is timed with host fetch (np.asarray) because block_until_ready
lies through the remote relay (PLAN.md).
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 24  # lookups per run
CHUNKS_PER_BLOCK = 64  # 64 * 1024 lookups per kernel instance


def bench(fn, *args, reps=3, label=""):
    t0 = time.time()
    out = np.asarray(fn(*args))
    print(f"  {label}: compile+first {time.time()-t0:.2f}s", flush=True)
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = np.asarray(fn(*args))
        times.append(time.time() - t0)
    best = min(times)
    print(
        f"  {label}: {best*1e3:.2f} ms for {N} lookups -> "
        f"{best/N*1e9:.3f} ns/lookup (checksum {int(out.ravel()[:64].sum())})",
        flush=True,
    )
    return best / N * 1e9


def case_A():
    print("A. XLA HBM gather baseline", flush=True)

    @jax.jit
    def g(tab, idx):
        return jnp.take(tab, idx, axis=0).sum(axis=0)

    idx = jnp.asarray(np.random.randint(0, 4096, N, dtype=np.int32))
    for size in (4096, 1 << 17, 1 << 22, 1 << 26):
        tab = jnp.asarray(np.arange(size, dtype=np.int32))
        ix = jnp.minimum(idx, size - 1)
        bench(g, tab, ix.reshape(-1, 1024), label=f"XLA take, table {size}")


def _sweep_kernel(R, unroll):
    def kernel(tab_ref, idx_ref, out_ref):
        def body(c, _):
            idx = idx_ref[c]
            hi = jax.lax.shift_right_logical(idx, 7)
            lo = jax.lax.bitwise_and(idx, 127)
            acc = jnp.zeros((8, 128), jnp.int32)
            if unroll:
                for r in range(R):
                    v = jnp.take_along_axis(tab_ref[r], lo, axis=1)
                    acc = jnp.where(hi == r, v, acc)
            else:
                def row(r, acc):
                    v = jnp.take_along_axis(tab_ref[r], lo, axis=1)
                    return jnp.where(hi == r, v, acc)

                acc = jax.lax.fori_loop(0, R, row, acc)
            out_ref[c] = acc
            return _

        jax.lax.fori_loop(0, CHUNKS_PER_BLOCK, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("R", "unroll"))
def _sweep(tab, idx, R, unroll):
    nblocks = idx.shape[0] // CHUNKS_PER_BLOCK
    return pl.pallas_call(
        _sweep_kernel(R, unroll),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((R, 8, 128), lambda b: (0, 0, 0)),
            pl.BlockSpec(
                (CHUNKS_PER_BLOCK, 8, 128), lambda b: (b, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (CHUNKS_PER_BLOCK, 8, 128), lambda b: (b, 0, 0)
        ),
    )(tab, idx)


def case_B():
    print("B. Pallas sweep-gather (128-entry rows)", flush=True)
    nchunks = N // 1024
    for R in (8, 32, 128, 512):
        size = R * 128
        tab = np.arange(size, dtype=np.int32).reshape(R, 1, 128)
        tab = np.ascontiguousarray(tab.repeat(8, axis=1))
        idx = np.random.randint(0, size, (nchunks, 8, 128), dtype=np.int32)
        for unroll in (True, False) if R <= 128 else (False,):
            try:
                bench(
                    _sweep,
                    jnp.asarray(tab),
                    jnp.asarray(idx),
                    R,
                    unroll,
                    label=f"sweep R={R} unroll={unroll}",
                )
            except Exception as e:
                print(f"  sweep R={R} unroll={unroll}: FAIL {type(e).__name__}: {e}"[:300], flush=True)


def _kernel_2d():
    def kernel(tab_ref, idx_ref, out_ref):
        def body(c, _):
            idx = idx_ref[c]
            lo = jax.lax.bitwise_and(idx, 127)
            mid = jax.lax.bitwise_and(jax.lax.shift_right_logical(idx, 7), 7)
            tab = tab_ref[0]
            # stage 1: in-row gather; stage 2: cross-sublane gather
            v = jnp.take_along_axis(tab, lo, axis=1)
            v2 = jnp.take_along_axis(v, mid, axis=0)
            out_ref[c] = v2
            return _

        jax.lax.fori_loop(0, CHUNKS_PER_BLOCK, body, 0)

    return kernel


@jax.jit
def _gather2d(tab, idx):
    nblocks = idx.shape[0] // CHUNKS_PER_BLOCK
    return pl.pallas_call(
        _kernel_2d(),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda b: (0, 0, 0)),
            pl.BlockSpec((CHUNKS_PER_BLOCK, 8, 128), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (CHUNKS_PER_BLOCK, 8, 128), lambda b: (b, 0, 0)
        ),
    )(tab, idx)


def case_C():
    print("C. cross-sublane gather (take_along_axis axis=0)", flush=True)
    nchunks = N // 1024
    tab = np.arange(1024, dtype=np.int32).reshape(1, 8, 128)
    idx = np.random.randint(0, 1024, (nchunks, 8, 128), dtype=np.int32)
    try:
        ns = bench(
            _gather2d, jnp.asarray(tab), jnp.asarray(idx), label="2-stage 1024-entry"
        )
        # verify correctness: out[s,l] should equal tab[(idx>>7)&7, idx&127]
        out = np.asarray(_gather2d(jnp.asarray(tab), jnp.asarray(idx)))
        want = tab[0][(idx >> 7) & 7, idx & 127]
        print(f"  correct: {np.array_equal(out, want)}", flush=True)
    except Exception as e:
        print(f"  FAIL {type(e).__name__}: {e}"[:500], flush=True)


def _kernel_take1d(size):
    def kernel(tab_ref, idx_ref, out_ref):
        def body(c, _):
            idx = idx_ref[c]
            out_ref[c] = jnp.take(tab_ref[0, 0], idx.reshape(-1)).reshape(8, 128)
            return _

        jax.lax.fori_loop(0, CHUNKS_PER_BLOCK, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("size",))
def _take1d(tab, idx, size):
    nblocks = idx.shape[0] // CHUNKS_PER_BLOCK
    return pl.pallas_call(
        _kernel_take1d(size),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 1, size), lambda b: (0, 0, 0)),
            pl.BlockSpec((CHUNKS_PER_BLOCK, 8, 128), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (CHUNKS_PER_BLOCK, 8, 128), lambda b: (b, 0, 0)
        ),
    )(tab, idx)


def case_D():
    print("D. jnp.take on 1-D VMEM table in pallas", flush=True)
    nchunks = N // 1024
    for size in (1024, 8192, 1 << 17):
        tab = np.arange(size, dtype=np.int32).reshape(1, 1, size)
        idx = np.random.randint(0, size, (nchunks, 8, 128), dtype=np.int32)
        try:
            bench(
                _take1d,
                jnp.asarray(tab),
                jnp.asarray(idx),
                size,
                label=f"take1d size={size}",
            )
        except Exception as e:
            print(f"  take1d size={size}: FAIL {type(e).__name__}: {e}"[:300], flush=True)


# --- E: grid-pipelined sweep, no dynamic VMEM indexing ------------------

CH = 512  # sublane rows per block (CH x 128 lookups per grid step)


def _kernel_E(R):
    def kernel(tab_ref, idx_ref, out_ref):
        idx = idx_ref[:]
        hi = jax.lax.shift_right_logical(idx, 7)
        lo = jax.lax.bitwise_and(idx, 127)
        acc = jnp.zeros((CH, 128), jnp.int32)
        for r in range(R):
            trow = tab_ref[r]  # (8,128) static read
            tbig = jnp.tile(trow, (CH // 8, 1))
            v = jnp.take_along_axis(tbig, lo, axis=1)
            acc = jnp.where(hi == r, v, acc)
        out_ref[:] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("R",))
def _sweep_E(tab, idx, R):
    nblocks = idx.shape[0] // CH
    return pl.pallas_call(
        _kernel_E(R),
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((R, 8, 128), lambda b: (0, 0, 0)),
            pl.BlockSpec((CH, 128), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((CH, 128), lambda b: (b, 0)),
    )(tab, idx)


def _kernel_E1(tab_ref, idx_ref, out_ref):
    # table pre-replicated to (CH,128): a single dynamic_gather per block
    out_ref[:] = jnp.take_along_axis(
        tab_ref[:], jax.lax.bitwise_and(idx_ref[:], 127), axis=1
    )


@jax.jit
def _sweep_E1(tab_big, idx):
    nblocks = idx.shape[0] // CH
    return pl.pallas_call(
        _kernel_E1,
        out_shape=jax.ShapeDtypeStruct(idx.shape, jnp.int32),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((CH, 128), lambda b: (0, 0)),
            pl.BlockSpec((CH, 128), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((CH, 128), lambda b: (b, 0)),
    )(tab_big, idx)


def case_E():
    print("E. grid-pipelined sweep (static refs only)", flush=True)
    nrows = N // 128
    # E1: raw dynamic_gather throughput (128-entry table)
    tab_big = np.tile(np.arange(128, dtype=np.int32), (CH, 1))
    idx = np.random.randint(0, 128, (nrows, 128), dtype=np.int32)
    try:
        bench(_sweep_E1, jnp.asarray(tab_big), jnp.asarray(idx), label="E1 raw dg 128-entry")
        out = np.asarray(_sweep_E1(jnp.asarray(tab_big), jnp.asarray(idx)))
        print(f"  E1 correct: {np.array_equal(out, idx & 127)}", flush=True)
    except Exception as e:
        print(f"  E1 FAIL: {e}"[:300], flush=True)
    for R in (8, 37, 128, 512):
        size = R * 128
        tab = np.arange(size, dtype=np.int32).reshape(R, 1, 128)
        tab = np.ascontiguousarray(tab.repeat(8, axis=1))
        idx = np.random.randint(0, size, (nrows, 128), dtype=np.int32)
        try:
            ns = bench(_sweep_E, jnp.asarray(tab), jnp.asarray(idx), R, label=f"E sweep R={R}")
            out = np.asarray(_sweep_E(jnp.asarray(tab), jnp.asarray(idx), R))
            print(f"  E R={R} correct: {np.array_equal(out, idx)}", flush=True)
        except Exception as e:
            print(f"  E R={R} FAIL: {type(e).__name__} {e}"[:300], flush=True)


# --- F: bilinear MXU gather (no gather primitive at all) ----------------
# fetch W[a, b] for idx = a*128 + b via onehot(a) @ W then row-dot onehot(b).
# W is f32 with values < 2^24 (exact); for bitmaps use 16-bit words.


def _bilinear_chunk(W, idx):
    a = idx >> 7
    b = idx & 127
    oh_a = jax.nn.one_hot(a, 128, dtype=jnp.float32)  # (B,128)
    r = oh_a @ W  # (B,128) MXU
    oh_b = jax.nn.one_hot(b, 128, dtype=jnp.float32)
    return (r * oh_b).sum(axis=1).astype(jnp.int32)


@jax.jit
def _bilinear(W, idx):  # idx: (nchunks, B')
    return jax.lax.map(lambda ix: _bilinear_chunk(W, ix), idx)


@jax.jit
def _bilinear_flat(W, idx):  # let XLA choose the layout, single shot
    return _bilinear_chunk(W, idx)


def case_F():
    print("F. bilinear MXU gather, 16384-entry table", flush=True)
    Wnp = np.random.randint(0, 1 << 16, (128, 128)).astype(np.float32)
    idx = np.random.randint(0, 16384, N, dtype=np.int32)
    want_head = Wnp.reshape(-1)[idx[:64]].astype(np.int64).sum()
    for chunk in (1 << 16, 1 << 20):
        ix = jnp.asarray(idx.reshape(-1, chunk))
        ns = bench(
            _bilinear, jnp.asarray(Wnp), ix, label=f"bilinear chunk={chunk}"
        )
    out = np.asarray(_bilinear(jnp.asarray(Wnp), jnp.asarray(idx.reshape(-1, 1 << 20))))
    ok = np.array_equal(out.reshape(-1), Wnp.reshape(-1)[idx].astype(np.int32))
    print(f"  correct: {ok}", flush=True)
    bench(
        _bilinear_flat,
        jnp.asarray(Wnp),
        jnp.asarray(idx),
        label="bilinear single-shot",
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"devices: {jax.devices()}", flush=True)
    for c in "ABCDEF":
        if which in ("all", c):
            globals()[f"case_{c}"]()
