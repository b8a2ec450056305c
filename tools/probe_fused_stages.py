"""Stage timing for the FUSED Pallas flag kernel on the real chip (round 4).

Compiles stage-gated variants of ops/fused.py's kernel over the same 100k-
pattern text automaton the bench uses and reports ns/char for each, so the
round-4 levers attack the measured hot spot instead of the estimated one.

Variants (cumulative unless noted):
  disp    — g4 prep + a trivial copy kernel + scalar fetch: dispatch floor
  s1deep  — stage-1 deep bloom only (3-split bf16 B1, AND-shift)
  s1f32   — stage-1 deep bloom via ONE premultiplied f32-HIGHEST table
            (lever 1: one word-select instead of three)   [not cumulative]
  s1all   — s1deep + w4 bloom
  prefix  — + lane prefix-sum + total
  compact — + candidate select-reduce (no stage 2)
  full    — production kernel (stage 2 + packed output)
  full8k  — production kernel at tile 8192 / CAP 512      [not cumulative]

Timing rule (PLAN.md): fetch a small result to host via np.asarray.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PATTERNS = int(os.environ.get("BENCH_PATTERNS", 100_000))
N_CHARS = int(os.environ.get("BENCH_CHARS", 1 << 24))
VARIANTS = os.environ.get("PROBE_VARIANTS", "").split(",")
INTERP = os.environ.get("PROBE_INTERP", "0") == "1"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import string

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import pyahocorasick_tpu as ahocorasick
    from pyahocorasick_tpu.ops import fused as F
    from pyahocorasick_tpu.ops import cascade as C
    from pyahocorasick_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    _M1, _M2, _M3 = F._M1, F._M2, F._M3

    rng = np.random.default_rng(42)
    letters = np.frombuffer(string.ascii_letters.encode(), dtype=np.uint8)
    lengths = rng.integers(3, 33, N_PATTERNS)
    A = ahocorasick.Automaton()
    for n in lengths:
        A.add_word(bytes(letters[rng.integers(0, letters.size, n)]).decode(), 1)
    A.make_automaton()
    compiled = A._compiled
    ct = C.build_tables(compiled)
    ft = F.build_fused_tables(compiled)
    assert ft is not None and ft.ok
    K = compiled.num_classes
    log(f"s1_est={ft.s1_est:.4f} fin_est={ft.fin_est:.2e} r1={ft.r1} r4={ft.r4}")

    hay = letters[rng.integers(0, letters.size, N_CHARS)]
    cls = compiled.classes_of(hay.astype(np.uint32)).astype(np.int32)

    ftd = ft.device_arrays()
    # premultiplied single-block f32 table for the s1f32 variant:
    # B1[w] as a 24-bit value, fetched exactly under Precision.HIGHEST
    b1_24 = (
        np.asarray(ft.B1s[0], np.float64)
        + 256.0 * np.asarray(ft.B1s[1], np.float64)
        + 65536.0 * np.asarray(ft.B1s[2], np.float64)
    )
    B1T24 = jnp.asarray(np.ascontiguousarray(b1_24.T), dtype=jnp.float32)

    r1, r4, r2s = ft.r1, ft.r4, ft.r2s
    has5, has_w4 = ft.has5, ft.has_w4

    def make_kernel(tile, ov, cap, stages, f32_b1=False):
        n = tile + ov

        def kernel(b1T_ref, w4T_ref, s2_ref, g4_ref, ov_ref, out_ref):
            out_w = 2 * cap
            g = jnp.concatenate([ov_ref[0], g4_ref[0]], axis=1)
            u = g.astype(jnp.uint32)
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
            zero_row = jnp.zeros((1, n), jnp.int32)

            if stages >= 1 and has5:
                w, bits = F._hash_parts_dev(u, _M1, r1 * 128, F._WBITS_F32)
                a = w >> 7
                csel = w & 127
                iota_r1 = jax.lax.broadcasted_iota(jnp.int32, (r1, n), 0)
                csel_m = csel == iota_c
                if f32_b1:
                    oh1 = (a == iota_r1).astype(jnp.float32)
                    rr = jax.lax.dot_general(
                        b1T_ref[:], oh1, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )  # (128, n) 24-bit words
                    w24 = (
                        jnp.where(csel_m, rr, 0.0)
                        .sum(axis=0, keepdims=True)
                        .astype(jnp.int32)
                    )
                    hit1 = (
                        (w24 >> bits[0])
                        & (w24 >> bits[1])
                        & (w24 >> bits[2])
                        & 1
                    )
                else:
                    oh1 = (a == iota_r1).astype(jnp.bfloat16)
                    r3 = jax.lax.dot_general(
                        b1T_ref[:], oh1, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

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
                        (w0 >> bits[0])
                        & (w1 >> (bits[1] - 8))
                        & (w2 >> (bits[2] - 16))
                        & 1
                    )
                prev1 = pltpu.roll(hit1, 1, axis=1)
                deep1 = hit1 & prev1
            else:
                deep1 = zero_row

            if stages >= 2 and has_w4:
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
                    .sum(axis=0, keepdims=True)
                    .astype(jnp.int32)
                )
                w41 = (w4w >> bits4[0]) & (w4w >> bits4[1]) & 1
            else:
                w41 = zero_row

            kind = deep1 | (w41 << 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            hit = ((kind > 0) & (lane >= ov)).astype(jnp.int32)

            if stages < 3:  # just count the stage-1 survivors
                total = hit.sum()
                out_ref[0] = jnp.broadcast_to(
                    total.reshape(1, 1), (1, out_w)
                )
                return

            c = hit
            k = 1
            while k < n:
                c = c + jnp.where(lane >= k, pltpu.roll(c, k, axis=1), 0)
                k <<= 1
            slot = c - 1
            total = jax.lax.slice(c, (0, n - 1), (1, n))

            if stages < 4:
                out_ref[0] = jnp.broadcast_to(total, (1, out_w))
                return

            iota_cap = jax.lax.broadcasted_iota(jnp.int32, (cap, n), 0)
            seli = ((slot == iota_cap) & (hit > 0)).astype(jnp.int32)

            def pick(vals_1n):
                return (seli * vals_1n).sum(axis=1, keepdims=True)

            gi = g.astype(jnp.int32)
            cand_ck = pick(gi | (kind << 24))
            cand_prev = pick(pltpu.roll(gi, 1, axis=1))
            cand_pos = pick(lane - ov)
            cand_code = cand_ck & 0xFFFFFF
            cand_kind = cand_ck >> 24
            cand_valid = pick(hit)

            if stages < 5:
                fin = cand_valid
            else:
                def bloom_col(tab, uu, mult):
                    rows = tab.shape[0]
                    wv, bb = F._hash_parts_dev(
                        uu, mult, rows * 128, F._WBITS_BF16
                    )
                    av = wv >> 7
                    cv = wv & 127
                    iota_rows = jax.lax.broadcasted_iota(
                        jnp.int32, (cap, rows), 1
                    )
                    ohv = (av == iota_rows).astype(tab.dtype)
                    rv = jax.lax.dot_general(
                        ohv, tab, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    iota_l = jax.lax.broadcasted_iota(jnp.int32, (cap, 128), 1)
                    wordv = (
                        jnp.where(cv == iota_l, rv, 0.0)
                        .sum(axis=1, keepdims=True)
                        .astype(jnp.int32)
                    )
                    h = wordv >> bb[0]
                    for b in bb[1:]:
                        h = h & (wordv >> b)
                    return h & 1

                u2 = cand_code.astype(jnp.uint32)
                upv = cand_prev.astype(jnp.uint32)
                if has5:
                    d2 = (
                        bloom_col(s2_ref[0], u2, _M2)
                        & bloom_col(s2_ref[1], u2, _M3)
                        & bloom_col(s2_ref[2], upv, _M2)
                        & bloom_col(s2_ref[3], upv, _M3)
                    )
                else:
                    d2 = jnp.zeros((cap, 1), jnp.int32)
                if has_w4:
                    w2b = bloom_col(s2_ref[4], u2, _M3)
                else:
                    w2b = jnp.zeros((cap, 1), jnp.int32)
                kd = cand_kind & 1
                kw = (cand_kind >> 1) & 1
                fin = cand_valid * ((kd & d2) | (kw & w2b))

            entry = (cand_pos & 0x7FF) | (cand_kind << 11) | (fin << 13)
            eye = (
                jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
            ).astype(jnp.int32)
            row = (eye * entry).sum(axis=0, keepdims=True)
            cnt = jnp.broadcast_to(total, (1, cap))
            out_ref[0] = jnp.concatenate([row, cnt], axis=1)

        return kernel

    def make_fn(tile, ov, cap, stages, f32_b1=False, trivial=False):
        n_tiles = F._bucket_tiles(-(-N_CHARS // tile))
        Npad = n_tiles * tile
        out_w = 2 * cap

        if trivial:
            def kernel(b1T_ref, w4T_ref, s2_ref, g4_ref, ov_ref, out_ref):
                s = g4_ref[0].sum()
                out_ref[0] = jnp.broadcast_to(
                    s.reshape(1, 1).astype(jnp.int32), (1, out_w)
                )
        else:
            kernel = make_kernel(tile, ov, cap, stages, f32_b1)

        b1_shape = (128, r1) if f32_b1 else (384, r1)
        call = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(b1_shape, lambda t: (0, 0)),
                pl.BlockSpec((128, r4), lambda t: (0, 0)),
                pl.BlockSpec((5, r2s, 128), lambda t: (0, 0, 0)),
                pl.BlockSpec((1, 1, tile), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, 1, ov), lambda t: (t, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, out_w), lambda t: (t, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 1, out_w), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
            interpret=INTERP,
        )
        K2, K3 = K * K, K * K * K

        def fn(cls_i8, b1T_tab, w4T_tab, s2_tab):
            N = cls_i8.shape[0]
            c = cls_i8.astype(jnp.int32)
            c1 = jnp.pad(c, (1, 0))[:N]
            c2 = jnp.pad(c, (2, 0))[:N]
            c3 = jnp.pad(c, (3, 0))[:N]
            g4 = c3 * K3 + c2 * K2 + c1 * K + c
            g4pad = jnp.pad(g4, (ov, 0))
            ovmat = g4pad[:N].reshape(n_tiles, 1, tile)[:, :, :ov]
            cand = call(
                b1T_tab, w4T_tab, s2_tab, g4.reshape(n_tiles, 1, tile), ovmat
            )
            return cand[:, 0, :].sum()  # scalar fetch: relay rule

        return jax.jit(fn), Npad

    pad_to = F._bucket_tiles(-(-N_CHARS // 2048)) * 2048
    pad = np.zeros(max(pad_to, N_CHARS), np.int8)
    pad[:N_CHARS] = cls
    cls_dev = jnp.asarray(pad[:pad_to])
    pad8k = F._bucket_tiles(-(-N_CHARS // 8192)) * 8192
    pad2 = np.zeros(pad8k, np.int8)
    pad2[:N_CHARS] = cls
    cls_dev8k = jnp.asarray(pad2)

    cases = [
        ("disp", dict(tile=2048, ov=128, cap=128, stages=0, trivial=True)),
        ("s1deep", dict(tile=2048, ov=128, cap=128, stages=1)),
        ("s1f32", dict(tile=2048, ov=128, cap=128, stages=1, f32_b1=True)),
        ("s1all", dict(tile=2048, ov=128, cap=128, stages=2)),
        ("prefix", dict(tile=2048, ov=128, cap=128, stages=3)),
        ("compact", dict(tile=2048, ov=128, cap=128, stages=4)),
        ("full", dict(tile=2048, ov=128, cap=128, stages=5)),
        ("full8k", dict(tile=8192, ov=128, cap=512, stages=5)),
    ]
    if VARIANTS and VARIANTS != [""]:
        cases = [c for c in cases if c[0] in VARIANTS]

    for name, kw in cases:
        f32_b1 = kw.get("f32_b1", False)
        b1 = B1T24 if f32_b1 else ftd["B1T"]
        dev_in = cls_dev8k if kw["tile"] == 8192 else cls_dev
        try:
            fn, _ = make_fn(**kw)
            t0 = time.time()
            r = np.asarray(fn(dev_in, b1, ftd["W4T"], ftd["S2"]))
            compile_s = time.time() - t0
            ts = []
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn(dev_in, b1, ftd["W4T"], ftd["S2"]))
                ts.append(time.time() - t0)
            best = min(ts)
            log(
                f"{name:8s}: compile {compile_s:6.1f}s, best {best*1e3:8.2f} ms"
                f" -> {best/N_CHARS*1e9:6.3f} ns/char  (chk={int(r)})"
            )
        except Exception as e:  # noqa: BLE001
            log(f"{name:8s}: FAILED {e!r:.200}")


if __name__ == "__main__":
    main()
