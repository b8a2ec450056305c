"""Fixed-length fingerprint engine: exact counts for dictionaries whose
patterns all share ONE length L (the BASELINE "CRISPR guides over DNA"
workload: 100k 20-mers, K=5).

Why a separate engine: the fused kernel (ops/fused.py) keys its blooms on
last-4-gram codes, and a K=5 alphabet has only 5^4 = 625 of those — the
blooms saturate at 100k patterns and the engine gates out (round-3 matrix
routed DNA to the hot/cold gather engine at 0.14 GB/s).  A fixed-length
dictionary admits a far stronger invariant: a match ends at position i iff
the WHOLE last-L-gram equals some pattern, so one 32-bit rolling window
fingerprint replaces the suffix-family machinery entirely.

Design (same (1, n) lane-stream kernel shape as ops/fused.py):

* The window is split into ceil(L/g) segments of g chars (g = largest m
  with K^m <= 2^24, e.g. 10 for DNA): each segment's base-K code stream is
  built in-kernel from the class stream by log-doubling lane rolls, and
  the fingerprint is sum_s C_s * code_s(i - s*g) in wrapping uint32 —
  ~15 (1, n)-land VPU ops per char (~0.1 ns, measured op costs in PLAN.md).
* Stage 1: ONE k=3-in-24-bit-word bloom over the P pattern fingerprints,
  fetched by the 3-split bf16 bilinear trick of ops/fused.py (a
  premultiplied f32 HIGHEST table measured 1.7x slower — probe r4).
* Survivors are compacted in-kernel (prefix-sum + onehot select) and pay
  stage 2: two more k=3 bloom families on the SAME fingerprint (different
  multipliers).  False-positive floor = the 32-bit fingerprint collision
  rate P/2^32 ~ 2e-5 — every survivor is exactly verified on the host
  against a window->pattern dict, so the engine is exact.
* The XLA post (same jit as the kernel: one dispatch, one relay round
  trip) compacts survivor positions into a small static buffer.

Capability replaced: reference src/trie.c:177-194 ahocorasick_next (the
per-char DFA hot loop) for the fixed-length dictionary case.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..compiler import CompiledAutomaton
from . import fused as _f

_M1, _M2, _M3 = _f._M1, _f._M2, _f._M3

_TILE = int(os.environ.get("PYAHOCORASICK_TPU_FIXEDLEN_TILE", 2048))
_OVERLAP = 128
_CAP = int(os.environ.get("PYAHOCORASICK_TPU_FIXEDLEN_CAP", 128))

_MIN_LEN = 5            # below this the cascade's short machinery wins
_MAX_LEN = _OVERLAP - 8  # all lane rolls must stay inside the overlap

# segment-combination multipliers (odd -> invertible mod 2^32); shared by
# the host pattern hashes and the in-kernel stream hash
_SEG_MULTS = [(0x9E3779B1 * (2 * s + 1)) & 0xFFFFFFFF | 1 for s in range(32)]


def _pow2_parts(m: int) -> list:
    """Descending power-of-two decomposition of m (oldest segment first)."""
    return [1 << b for b in range(m.bit_length() - 1, -1, -1) if m & (1 << b)]


class FixedLenTables:
    """Host-side tables: bloom families over pattern window fingerprints
    plus the exact window -> pattern-id dict for host verification."""

    def __init__(self, compiled: CompiledAutomaton, r1: int | None = None):
        self.ok = False
        P = compiled.num_patterns
        K = compiled.num_classes
        if P == 0 or K < 2:
            return
        depth = compiled.depth
        word_id = compiled.word_id
        eidx = np.nonzero(word_id >= 0)[0]
        lens = depth[eidx]
        L = int(lens[0]) if lens.size else 0
        if L < _MIN_LEN or L > _MAX_LEN or not bool((lens == L).all()):
            return  # not a single-fixed-length dictionary
        # largest per-segment gram with codes < 2^24 (the bloom hash input
        # is the MIXED 32-bit fingerprint, but each segment code multiplies
        # a 32-bit constant, so segment codes themselves must not overflow
        # the exact int32 stream math)
        g = 1
        while K ** (g + 1) <= (1 << 24) and g + 1 <= L:
            g += 1
        if g < 2:
            return  # alphabet too wide to pack segments (K > 2^12)
        self.L, self.K, self.g = L, K, g
        self.num_segs = -(-L // g)
        self.seg_mults = _SEG_MULTS[: self.num_segs]

        # pattern class matrix (P, L) by ascending the parent chain
        parent = compiled.parent
        edge_cls = compiled.edge_cls
        mat = np.zeros((eidx.size, L), np.int32)
        cur = eidx.copy()
        for t in range(L):
            mat[:, L - 1 - t] = edge_cls[cur]
            cur = parent[cur]
        self.pids = word_id[eidx].astype(np.int64)
        self.pat_mat = mat
        self.verify_map = {
            mat[r].tobytes(): int(self.pids[r]) for r in range(mat.shape[0])
        }

        h = self.hash_rows(mat)
        r1 = r1 or int(os.environ.get("PYAHOCORASICK_TPU_FIXEDLEN_B1", 256))
        if r1 & (r1 - 1):
            r1 = 1 << (r1 - 1).bit_length()
        self.r1 = r1
        r2 = int(os.environ.get("PYAHOCORASICK_TPU_FIXEDLEN_B2", 256))
        if r2 & (r2 - 1):
            r2 = 1 << (r2 - 1).bit_length()
        self.r2 = r2
        self.B1 = _f._bloom_build(h, _M1, r1, _f._WBITS_F32)
        w24 = np.asarray(self.B1, np.float64).astype(np.int64)
        self.B1s = np.stack([(w24 >> (8 * t)) & 0xFF for t in range(3)])
        self.S2 = np.stack(
            [
                np.asarray(_f._bloom_build(h, m, r2, _f._WBITS_F32), np.float32)
                for m in (_M2, _M3)
            ]
        )  # (2, r2, 128) f32 24-bit words

        p1 = _f._bloom_pass_rate(self.B1, _M1, _f._WBITS_F32)
        p2a = _f._bloom_pass_rate(self.S2[0], _M2, _f._WBITS_F32)
        p2b = _f._bloom_pass_rate(self.S2[1], _M3, _f._WBITS_F32)
        self.s1_est = p1
        # final rate: joint bloom fp + the 32-bit fingerprint collision
        # floor (survivors of it are killed by the exact host verify)
        self.fin_est = p1 * p2a * p2b + P / 2.0**32
        mu = p1 * (_TILE + _OVERLAP)
        if mu + 5.0 * (mu**0.5) > _CAP:
            return  # bloom too loaded for the per-tile slots: caller may
            # rebuild with a doubled r1 (escalation) or fall back
        self.ok = True

    def hash_rows(self, mat: np.ndarray) -> np.ndarray:
        """uint32 window fingerprints for (R, L) class rows (host mirror of
        the in-kernel stream hash)."""
        L, K, g = self.L, self.K, self.g
        h = np.zeros(mat.shape[0], np.uint64)
        for s in range(self.num_segs):
            end = L - s * g
            start = max(end - g, 0)
            code = np.zeros(mat.shape[0], np.uint64)
            for j in range(start, end):
                code = code * np.uint64(K) + mat[:, j].astype(np.uint64)
            h = (h + code * np.uint64(self.seg_mults[s])) & np.uint64(
                0xFFFFFFFF
            )
        return h.astype(np.int64)

    def device_arrays(self):
        import jax.numpy as jnp

        if not hasattr(self, "_dev"):
            b1t = np.concatenate(
                [np.ascontiguousarray(self.B1s[t].T) for t in range(3)], 0
            )  # (384, r1)
            self._dev = {
                "B1T": jnp.asarray(b1t, dtype=jnp.bfloat16),
                "S2": jnp.asarray(self.S2, dtype=jnp.float32),
            }
        return self._dev


def build_fixedlen_tables(
    compiled: CompiledAutomaton, r1: int | None = None
) -> Optional[FixedLenTables]:
    key = "fixedlen" if r1 is None else f"fixedlen_r{r1}"
    cache = compiled._cache
    if key not in cache:
        try:
            t = FixedLenTables(compiled, r1)
            cache[key] = t if t.ok else None
        except MemoryError:
            cache[key] = None
    return cache[key]


# ---------------------------------------------------------------------------
# device side


def _make_kernel(K: int, L: int, g: int, num_segs: int, seg_mults,
                 r1: int, r2: int, tile: int, ov: int, cap: int):
    """(1, n) lane-stream kernel: in-kernel rolling fingerprints, stage-1
    bloom, in-kernel compaction, stage-2 blooms on candidates."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    n = tile + ov
    r = L - g * (num_segs - 1)  # oldest (possibly partial) segment length

    def kernel(b1T_ref, s2_ref, cls_ref, ovc_ref, out_ref):
        c = jnp.concatenate([ovc_ref[0], cls_ref[0]], axis=1).astype(
            jnp.int32
        )  # (1, n)

        # ---- pow2 gram-code streams by log-doubling rolls
        levels = {1: c}
        m = 1
        top = max(g, r)
        while 2 * m <= top:
            levels[2 * m] = (
                pltpu.roll(levels[m], m, axis=1) * (K ** m) + levels[m]
            )
            m *= 2

        def gram_stream(mlen):
            parts = _pow2_parts(mlen)
            cur = levels[parts[0]]
            for p in parts[1:]:
                cur = pltpu.roll(cur, p, axis=1) * (K ** p) + levels[p]
            return cur

        gg = gram_stream(g)
        gr = gg if r == g else gram_stream(r)

        # ---- window fingerprint (wrapping uint32)
        h = jnp.zeros((1, n), jnp.uint32)
        for s in range(num_segs):
            seg = gr if s == num_segs - 1 else gg
            rolled = pltpu.roll(seg, s * g, axis=1) if s else seg
            h = h + rolled.astype(jnp.uint32) * jnp.uint32(seg_mults[s])

        # ---- stage 1: 3-split bf16 bloom (shared hash/onehot; ops/fused.py)
        w, bits = _f._hash_parts_dev(h, _M1, r1 * 128, _f._WBITS_F32)
        a = w >> 7
        csel = w & 127
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
        iota_r1 = jax.lax.broadcasted_iota(jnp.int32, (r1, n), 0)
        oh1 = (a == iota_r1).astype(jnp.bfloat16)
        r3 = jax.lax.dot_general(
            b1T_ref[:], oh1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (384, n)
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
            (w0 >> bits[0]) & (w1 >> (bits[1] - 8)) & (w2 >> (bits[2] - 16))
            & 1
        )
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        hit = (hit1 & (lane >= ov)).astype(jnp.int32)

        # ---- prefix-sum compaction to <= cap sublane slots
        cs = hit
        k = 1
        while k < n:
            cs = cs + jnp.where(lane >= k, pltpu.roll(cs, k, axis=1), 0)
            k <<= 1
        slot = cs - 1
        total = jax.lax.slice(cs, (0, n - 1), (1, n))  # (1, 1)
        iota_cap = jax.lax.broadcasted_iota(jnp.int32, (cap, n), 0)
        seli = ((slot == iota_cap) & (hit > 0)).astype(jnp.int32)

        def pick(vals_1n):
            return (seli * vals_1n).sum(axis=1, keepdims=True)

        cand_pos = pick(lane - ov)
        cand_h = pick(h.astype(jnp.int32))  # same 32 bits, int view
        cand_valid = pick(hit)

        # ---- stage 2: two k=3 f32 bloom families on the fingerprint
        def bloom_col(tab, uu, mult):
            rows = tab.shape[0]
            wv, bb = _f._hash_parts_dev(uu, mult, rows * 128, _f._WBITS_F32)
            av = wv >> 7
            cv = wv & 127
            iota_rows = jax.lax.broadcasted_iota(jnp.int32, (cap, rows), 1)
            ohv = (av == iota_rows).astype(jnp.float32)
            rv = jax.lax.dot_general(
                ohv, tab, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # (cap, 128)
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (cap, 128), 1)
            wordv = (
                jnp.where(cv == iota_l, rv, 0.0)
                .sum(axis=1, keepdims=True)
                .astype(jnp.int32)
            )
            hh = wordv >> bb[0]
            for b in bb[1:]:
                hh = hh & (wordv >> b)
            return hh & 1

        u2 = cand_h.astype(jnp.uint32)
        fin = (
            cand_valid & bloom_col(s2_ref[0], u2, _M2)
            & bloom_col(s2_ref[1], u2, _M3)
        )

        # entry: pos (12 bits) | fin << 14
        entry = (cand_pos & 0xFFF) | (fin << 14)
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
        ).astype(jnp.int32)
        row = (eye * entry).sum(axis=0, keepdims=True)  # (1, cap)
        cnt = jnp.broadcast_to(total, (1, cap))
        out_ref[0] = jnp.concatenate([row, cnt], axis=1)  # (1, 2*cap)

    return kernel


def _make_scan_fn(K, L, g, num_segs, seg_mults, r1, r2, n_tiles,
                  gb1, gb2, vbud, interpret):
    """jit: (cls_i8 padded, B1T, S2) -> (positions (vbud,), totals[3]).
    Kernel + global compaction + position extraction in ONE dispatch."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .cascade import _compact

    T, OV, cap = _TILE, _OVERLAP, _CAP
    kernel = _make_kernel(
        K, L, g, num_segs, tuple(seg_mults), r1, r2, T, OV, cap
    )
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((384, r1), lambda t: (0, 0)),
            pl.BlockSpec((2, r2, 128), lambda t: (0, 0, 0)),
            pl.BlockSpec((1, 1, T), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, OV), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 2 * cap), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, 2 * cap), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )

    def fn(cls_i8, b1T, s2):
        N = cls_i8.shape[0]
        cls3 = cls_i8.reshape(n_tiles, 1, T)
        clspad = jnp.pad(cls_i8, (OV, 0))
        ovmat = clspad[:N].reshape(n_tiles, 1, T)[:, :, :OV]
        cand = call(b1T, s2, cls3, ovmat).reshape(n_tiles, 2 * cap)
        ovf = cand[:, cap].max()
        entries = cand[:, :cap].reshape(-1)
        fin = (entries >> 14) & 1
        m = entries.shape[0]
        pad = (-m) % 32
        f = jnp.pad(fin, (0, pad))
        blk = (f.reshape(-1, 32).max(axis=1) > 0).astype(jnp.int32)
        b1i, t1 = _compact(blk, gb1)
        bval = b1i >= 0
        idx32 = (
            jnp.maximum(b1i, 0)[:, None] * 32
            + jnp.arange(32, dtype=jnp.int32)[None, :]
        )
        sub = (
            jnp.take(f, idx32.reshape(-1), mode="clip").reshape(-1, 32)
            * bval[:, None]
        )
        b2i, t2 = _compact(sub.reshape(-1), vbud)
        gidx = jnp.where(
            b2i >= 0,
            jnp.take(idx32.reshape(-1), jnp.maximum(b2i, 0), mode="clip"),
            -1,
        )
        iv = jnp.maximum(gidx, 0)
        e = jnp.take(entries, jnp.minimum(iv, m - 1), mode="clip")
        pos = jnp.where(gidx >= 0, (iv // cap) * T + (e & 0xFFF), -1)
        return pos, jnp.stack([ovf, t1, t2])

    return jax.jit(fn)


_SCAN_CACHE: dict = {}


def _fixedlen_budgets(n_tiles: int, ft) -> tuple:
    m = n_tiles * _CAP
    N = n_tiles * _TILE
    rate = ft.fin_est
    vbud = min(
        max(_f._pow2(int(rate * N * 4)), 1 << 12), _f._pow2(m)
    )
    p32 = 1.0 - (1.0 - min(rate * _TILE / _CAP, 1.0)) ** 32
    gb1 = min(
        _f._pow2(-(-m // 32)), max(1 << 12, _f._pow2(m / 32 * p32 * 4))
    )
    return gb1, vbud


def count_matches_fixedlen(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: Optional[np.ndarray] = None,
    staged=None,
    short_on_host: bool = True,  # signature-compatible; no short patterns
) -> Optional[np.ndarray]:
    """Per-pattern int64 counts via the fixed-length fingerprint kernel, or
    None when gated (mixed lengths, saturated bloom, budget overflow).  A
    per-tile slot overflow escalates once to a 4x bloom before giving up
    (real corpora with repeats can exceed the uniform-text load model)."""
    ft = build_fixedlen_tables(compiled)
    if ft is None:
        return None
    import jax.numpy as jnp

    P = compiled.num_patterns
    L = ft.L
    if halo is not None and halo.size:
        H = max(int(compiled.longest_word), 1)
        h = halo[-H:]
        full = np.concatenate([h.astype(np.int32), cls])
        vstart = int(h.size)
    else:
        full = cls
        vstart = 0
    N = int(full.size)
    if N < L:
        return np.zeros(P, np.int64)

    def run(t, staged_in):
        n_tiles = _f._bucket_tiles(-(-N // _TILE))
        Npad = n_tiles * _TILE
        gb1, vbud = _fixedlen_budgets(n_tiles, t)
        interp = _use_interpret()
        key = (t.K, L, t.g, t.num_segs, tuple(t.seg_mults), t.r1, t.r2,
               n_tiles, gb1, vbud, interp)
        if key not in _SCAN_CACHE:
            from ..utils.compile_cache import ensure_compile_cache

            ensure_compile_cache()
            _SCAN_CACHE[key] = _make_scan_fn(
                t.K, L, t.g, t.num_segs, t.seg_mults, t.r1, t.r2,
                n_tiles, gb1, vbud, interp,
            )
        if staged_in is not None:
            cls_dev = staged_in
        else:
            pad = np.zeros(Npad, np.int8)
            pad[:N] = full
            cls_dev = jnp.asarray(pad)
        d = t.device_arrays()
        pos, totals = _SCAN_CACHE[key](cls_dev, d["B1T"], d["S2"])
        totals = np.asarray(totals)
        if totals[1] > gb1 or totals[2] > vbud:
            return None, int(totals[0])
        npos = int(totals[2])
        return np.asarray(pos[: _f._pow2(max(npos, 1))])[:npos], int(
            totals[0]
        )

    positions, ovf = run(ft, staged)
    if ovf > _CAP:
        # escalate once: 4x bloom rows cuts the stage-1 rate ~64x
        ft2 = build_fixedlen_tables(compiled, r1=ft.r1 * 4)
        if ft2 is None:
            return None
        positions, ovf = run(ft2, None if staged is None else staged)
        if ovf > _CAP or positions is None:
            return None
    elif positions is None:
        return None

    # exact host verification of the (rare) survivors
    counts = np.zeros(P, np.int64)
    if positions.size:
        vm = ft.verify_map
        pmin = max(vstart, L - 1)
        for p in positions:
            p = int(p)
            if p < pmin or p >= N:
                continue
            pid = vm.get(full[p - L + 1: p + 1].astype(np.int32).tobytes())
            if pid is not None:
                counts[pid] += 1
    return counts


def _use_interpret() -> bool:
    import jax

    return jax.default_backend() != "tpu"
