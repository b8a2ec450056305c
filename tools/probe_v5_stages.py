"""Stage timing for the v5 fused kernel (round-4 wrap-up, informs round 5).

Variants (cumulative), tile 4096 / CAP 256, real automaton + tables:
  s1      — in-kernel g4 + stage-1 blooms (deep AND-shift + w4), count only
  prefix  — + lane prefix-sum
  pick    — + candidate select-reduce + picks + stage-2 blooms
  fincmp  — + second in-tile fin compaction + packed output (= production)
  jit1    — production flags fn incl. XLA assembly (cumsum+scatter)
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
    ft = F.build_fused_tables(compiled)
    K = compiled.num_classes
    hay = letters[rng.integers(0, letters.size, N_CHARS)]
    cls = compiled.classes_of(hay.astype(np.uint32)).astype(np.int32)

    TILE, OV, CAP, FIN = F._TILE, F._OVERLAP, F._CAP, 16
    n_tiles = F._bucket_tiles(-(-N_CHARS // TILE))
    Npad = n_tiles * TILE
    pad = np.zeros(Npad, np.int8)
    pad[:N_CHARS] = cls
    cls_dev = jnp.asarray(pad)
    np.asarray(cls_dev[:1])
    ftd = ft.device_arrays()
    r1, r4, r2p = ft.r1, ft.r4, ft.r2p
    _M1, _M2, _M3 = F._M1, F._M2, F._M3
    n = TILE + OV
    K2 = K * K

    def make_call(stages):
        def kernel(b1T_ref, w4T_ref, s2p_ref, s2w_ref, cls_ref, prev_ref,
                   out_ref):
            out_w = F._OUT_COLS * FIN
            ovc = jax.lax.slice(prev_ref[0], (0, TILE - OV), (1, TILE))
            c = jnp.concatenate([ovc, cls_ref[0]], axis=1).astype(jnp.int32)
            g2 = pltpu.roll(c, 1, axis=1) * K + c
            g = pltpu.roll(g2, 2, axis=1) * K2 + g2
            u = g.astype(jnp.uint32)
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)

            w, bits = F._hash_parts_dev(u, _M1, r1 * 128, F._WBITS_F32)
            a = w >> 7
            csel = w & 127
            iota_r1 = jax.lax.broadcasted_iota(jnp.int32, (r1, n), 0)
            oh1 = (a == iota_r1).astype(jnp.bfloat16)
            r3 = jax.lax.dot_general(
                b1T_ref[:], oh1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            csel_m = csel == iota_c

            def word_of(rs):
                return (
                    jnp.where(csel_m, rs, 0.0)
                    .sum(axis=0, keepdims=True)
                    .astype(jnp.int32)
                )

            w0 = word_of(r3[0:128])
            w1 = word_of(r3[128:256])
            w2 = word_of(r3[256:384])
            hit1 = (
                (w0 >> bits[0]) & (w1 >> (bits[1] - 8))
                & (w2 >> (bits[2] - 16)) & 1
            )
            prev1 = pltpu.roll(hit1, 1, axis=1)
            deep1 = hit1 & prev1
            w4, bits4 = F._hash_parts_dev(u, _M2, r4 * 128, F._WBITS_BF16)
            a4 = w4 >> 7
            c4 = w4 & 127
            iota_r4 = jax.lax.broadcasted_iota(jnp.int32, (r4, n), 0)
            oh4 = (a4 == iota_r4).astype(jnp.bfloat16)
            rw = jax.lax.dot_general(
                w4T_ref[:], oh4, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            w4w = (
                jnp.where(c4 == iota_c, rw, 0.0)
                .sum(axis=0, keepdims=True).astype(jnp.int32)
            )
            w41 = (w4w >> bits4[0]) & (w4w >> bits4[1]) & 1
            kind = deep1 | (w41 << 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            hit = ((kind > 0) & (lane >= OV)).astype(jnp.int32)

            if stages < 2:
                out_ref[0] = jnp.broadcast_to(
                    hit.sum().reshape(1, 1), (1, out_w)
                )
                return

            cs = hit
            k = 1
            while k < n:
                cs = cs + jnp.where(lane >= k, pltpu.roll(cs, k, axis=1), 0)
                k <<= 1
            slot = cs - 1
            total = jax.lax.slice(cs, (0, n - 1), (1, n))
            if stages < 3:
                out_ref[0] = jnp.broadcast_to(total, (1, out_w))
                return

            iota_cap = jax.lax.broadcasted_iota(jnp.int32, (CAP, n), 0)
            seli = ((slot == iota_cap) & (hit > 0)).astype(jnp.int32)

            def pick(v):
                return (seli * v).sum(axis=1, keepdims=True)

            gi = g.astype(jnp.int32)
            cand_ck = pick(gi | (kind << 24))
            cand_prev = pick(pltpu.roll(gi, 1, axis=1))
            cand_pos = pick(lane - OV)
            cand_code = cand_ck & 0xFFFFFF
            cand_kind = cand_ck >> 24
            iota_col = jax.lax.broadcasted_iota(jnp.int32, (CAP, 1), 0)
            cand_valid = (iota_col < total).astype(jnp.int32)

            def bloom_col(tab, uu, mult):
                rows = tab.shape[0]
                wv, bb = F._hash_parts_dev(uu, mult, rows * 128, F._WBITS_BF16)
                av = wv >> 7
                cv = wv & 127
                iota_rows = jax.lax.broadcasted_iota(jnp.int32, (CAP, rows), 1)
                ohv = (av == iota_rows).astype(tab.dtype)
                rv = jax.lax.dot_general(
                    ohv, tab, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                iota_l = jax.lax.broadcasted_iota(jnp.int32, (CAP, 128), 1)
                wordv = (
                    jnp.where(cv == iota_l, rv, 0.0)
                    .sum(axis=1, keepdims=True).astype(jnp.int32)
                )
                h = wordv >> bb[0]
                for b in bb[1:]:
                    h = h & (wordv >> b)
                return h & 1

            u2 = cand_code.astype(jnp.uint32)
            upv = cand_prev.astype(jnp.uint32)
            u5 = (u2 * jnp.uint32(F._C5) + upv).astype(jnp.uint32)
            d2 = (
                bloom_col(s2p_ref[0], u5, _M2)
                & bloom_col(s2p_ref[1], u5, _M3)
            )
            w2b = bloom_col(s2w_ref[0], u2, _M3)
            kd = cand_kind & 1
            kw = (cand_kind >> 1) & 1
            fin = cand_valid * ((kd & d2) | (kw & w2b))
            if stages < 4:
                out_ref[0] = jnp.broadcast_to(
                    (fin.sum() + total.reshape(())).reshape(1, 1), (1, out_w)
                )
                return
            # full fin-compact path = production; not duplicated here
            out_ref[0] = jnp.zeros((1, out_w), jnp.int32)

        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((384, r1), lambda t: (0, 0)),
                pl.BlockSpec((128, r4), lambda t: (0, 0)),
                pl.BlockSpec((2, r2p, 128), lambda t: (0, 0, 0)),
                pl.BlockSpec((1, 256, 128), lambda t: (0, 0, 0)),
                pl.BlockSpec((1, 1, TILE), lambda t: (t, 0, 0)),
                pl.BlockSpec(
                    (1, 1, TILE), lambda t: (jnp.maximum(t - 1, 0), 0, 0)
                ),
            ],
            out_specs=pl.BlockSpec((1, 1, F._OUT_COLS * FIN), lambda t: (t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 1, F._OUT_COLS * FIN), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
        )

    for name, stages in (("s1", 1), ("prefix", 2), ("pick+s2", 3)):
        call = make_call(stages)

        @jax.jit
        def fn(cd, b1, w4t, s2p, s2w):
            return call(b1, w4t, s2p, s2w, cd.reshape(n_tiles, 1, TILE),
                        cd.reshape(n_tiles, 1, TILE))[:, 0, :].sum()

        t0 = time.time()
        r = np.asarray(fn(cls_dev, ftd["B1T"], ftd["W4T"], ftd["S2P"],
                          ftd["S2W"]))
        log(f"{name:8s} compile+run {time.time()-t0:6.1f}s (chk={int(r)})")
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(fn(cls_dev, ftd["B1T"], ftd["W4T"], ftd["S2P"],
                          ftd["S2W"]))
            ts.append(time.time() - t0)
        log(f"{name:8s} best {min(ts)*1e3:8.1f} ms -> "
            f"{min(ts)/N_CHARS*1e9:5.2f} ns/char")

    # production jit1 for reference
    fin_slots = F._fin_slots_for(ft, ct, K)
    vbuf = F._vbuf_budget(n_tiles, ft, ct, K, fin_slots)
    fkey = (K, r1, r4, r2p, n_tiles, vbuf, fin_slots, ft.has5, ft.has_w4,
            False)
    fn1 = F._make_flags_fn(*fkey)
    t0 = time.time()
    out = fn1(cls_dev, ftd["B1T"], ftd["W4T"], ftd["S2P"], ftd["S2W"])
    np.asarray(out[3])
    log(f"jit1     compile+run {time.time()-t0:6.1f}s")
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(fn1(cls_dev, ftd["B1T"], ftd["W4T"], ftd["S2P"],
                       ftd["S2W"])[3])
        ts.append(time.time() - t0)
    log(f"jit1     best {min(ts)*1e3:8.1f} ms -> "
        f"{min(ts)/N_CHARS*1e9:5.2f} ns/char")


if __name__ == "__main__":
    main()
