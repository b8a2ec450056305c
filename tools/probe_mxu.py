"""Probe: matmul-gather (bilinear LUT fetch) throughput by dtype on the TPU.

The cascade engine's device cost is dominated by bloom-word fetches done as
onehot(idx_hi) @ table  (MXU row fetch)  then a VPU column select.  Round 1
used f32 tables at Precision.HIGHEST (exact to 2^24) — measured ~0.55 ns per
(128,128)-table lookup, i.e. ~59 Tflop/s.  v5e peaks: bf16 ~197 Tflop/s,
int8 ~394 Top/s.  If XLA hits those paths AND fuses the onehot build, bloom
fetches get 3-7x cheaper (bf16 words exact to 2^8, int8 words to 2^7).

Timing rules (PLAN.md): through the relay, block_until_ready() lies and
fetches run at ~10 MB/s — every timing reduces to a scalar on device and
fetches with np.asarray.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def bench(fn, *args, reps=5, label=""):
    t0 = time.time()
    r = np.asarray(fn(*args))
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        r = np.asarray(fn(*args))
        times.append(time.time() - t0)
    best = min(times)
    print(f"{label:44s} compile {compile_s:6.1f}s  best {best*1e3:8.2f} ms  -> {r!r:.40s}")
    return best


N = 1 << 24  # lookups per launch (big: per-dispatch overhead is ~25 ms)


@partial(jax.jit, static_argnums=(1, 2, 3))
def lut_fetch(idx, R, C, kind):
    """Fetch word = T[idx // C][idx % C] for random T, sum the words.

    kind: f32h = f32 HIGHEST (r1 baseline), bf16, int8, f32d = f32 default.
    Table contents are deterministic from (R, C) so exactness is checkable.
    """
    a = idx // C
    b = idx % C
    iota_r = jnp.arange(R, dtype=jnp.int32)
    iota_c = jnp.arange(C, dtype=jnp.int32)
    tvals = jnp.asarray(
        (np.arange(R * C, dtype=np.int64) * 2654435761)
        % ((1 << 24) if kind.startswith("f32") else (1 << 7) if kind == "int8" else (1 << 8)),
        dtype=jnp.int32,
    )
    if kind == "int8":
        tab = tvals.reshape(R, C).astype(jnp.int8)
        oh = (a[:, None] == iota_r[None, :]).astype(jnp.int8)
        row = jax.lax.dot_general(
            oh, tab, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        ohc = b[:, None] == iota_c[None, :]
        w = jnp.where(ohc, row, 0).sum(axis=1)
    elif kind == "bf16":
        tab = tvals.reshape(R, C).astype(jnp.bfloat16)
        oh = (a[:, None] == iota_r[None, :]).astype(jnp.bfloat16)
        row = jax.lax.dot_general(
            oh, tab, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        ohc = b[:, None] == iota_c[None, :]
        w = jnp.where(ohc, row, 0.0).sum(axis=1).astype(jnp.int32)
    else:
        prec = jax.lax.Precision.HIGHEST if kind == "f32h" else jax.lax.Precision.DEFAULT
        tab = tvals.reshape(R, C).astype(jnp.float32)
        oh = (a[:, None] == iota_r[None, :]).astype(jnp.float32)
        row = jax.lax.dot_general(oh, tab, (((1,), (0,)), ((), ())), precision=prec)
        ohc = b[:, None] == iota_c[None, :]
        w = jnp.where(ohc, row, 0.0).sum(axis=1).astype(jnp.int32)
    return w.astype(jnp.int64).sum()


def expected(idx, R, C, kind):
    tvals = (np.arange(R * C, dtype=np.int64) * 2654435761) % (
        (1 << 24) if kind.startswith("f32") else (1 << 7) if kind == "int8" else (1 << 8)
    )
    return int(tvals[idx].sum())


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    configs = [
        (128, 128, "f32h"),   # round-1 baseline primitive
        (128, 128, "bf16"),
        (128, 128, "int8"),
        (512, 128, "int8"),
        (256, 256, "int8"),
        (512, 256, "int8"),
        (512, 128, "bf16"),
    ]
    for R, C, kind in configs:
        idx = rng.integers(0, R * C, N).astype(np.int32)
        di = jnp.asarray(idx)
        got = int(np.asarray(lut_fetch(di, R, C, kind))) & 0xFFFFFFFF
        want = expected(idx, R, C, kind) & 0xFFFFFFFF  # checksum mod 2^32
        ok = "EXACT" if got == want else f"WRONG ({got} != {want})"
        best = bench(lut_fetch, di, R, C, kind, label=f"lut R={R} C={C} {kind} [{ok}]")
        per = best / N * 1e9
        flops = 2 * R * C
        print(f"    -> {per:.3f} ns/lookup, {flops/per/1e3:.1f} Tops effective")


if __name__ == "__main__":
    main()
