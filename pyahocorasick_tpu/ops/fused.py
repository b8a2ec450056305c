"""Fused Pallas flag kernel: one pass, VMEM-resident blooms, in-kernel
compaction — the engine that breaks the ~6 ns/char XLA dispatch floor.

Flag-stage redesign vs ops/cascade.py (measured there: 8 bilinear bloom
fetches + 3-level XLA compaction ≈ 5.5-6.7 ns/char):

* ONE shared f32 bloom ``B1`` holds the last-4-gram codes of BOTH the
  suffix (``suf``) and the shifted-suffix (``sufb``) families of l>=5
  patterns.  A deep candidate needs ``B1[g4(i)] AND B1[g4(i-1)]`` — the
  second term is a one-position shift of the same lookup stream, so the
  suf+sufb test costs ONE dense fetch per character instead of six.
* k=2 bloom bits are packed in the SAME word (distinct bit positions of
  the fetched 24-bit word), so the second hash test is free.
* Length-4 patterns get one bf16 table ``W4`` (8-bit words, k=2 in-word).
* Stage-1 survivors (~0.5-2% of positions) are compacted IN-KERNEL (prefix
  sums and scatters expressed as small constant matmuls — Mosaic has no
  vector gather/scatter, but a 0/1-matrix multiply is one) and only they
  pay the stage-2 tests: two more f32 tables per deep family and one more
  bf16 table for w4, pushing the false-positive rate to ~1e-5.
* The kernel emits a full-size final-flag mask (rate ~1e-4), which the
  ordinary XLA hierarchical compaction + exact S4/bucket verification of
  ops/cascade.py consumes at negligible cost.

Exactness: blooms only ever produce false POSITIVES (every true match's
codes are inserted at build time); everything a bloom passes is re-verified
exactly (device bucket compare for l==4, host text compare for l>=5), and
budget overflows return None so the caller falls back to an exact engine.
Replaces the per-char hot loop of reference src/trie.c:177-194.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..compiler import CompiledAutomaton
from . import cascade as _c

_M1, _M2, _M3 = 0x9E3779B1, 0x85EBCA77, 0xC2B2AE35
_WBITS_F32 = 24  # f32 round-trips ints to 2^24: 24 usable bloom bits/word
_WBITS_BF16 = 8  # bf16 mantissa: 8 exact bits/word

# tile length of the kernel (positions per grid step); OVERLAP extra leading
# lanes make the one-position-shifted stream local to the tile.  Positions
# ride the LANE axis: a (N, 1) column stream is laid out by XLA as (8, 128)
# tiles with one useful column — 128x HBM padding (measured: 8 GB for a 64 MB
# stream) — so every stream here is (1, n) row-major and every table operand
# is pre-transposed to (128, rows).
_TILE = 2048
_OVERLAP = 128


# Hashing is POWER-OF-2 ONLY: integer modulo by non-pow2 constants lowers
# to a many-op division sequence on the VPU (measured ~6 ns/char extra in
# tools/probe_pallas.py P5 vs P6).  f32 words use k=3 bloom bits in three
# DISJOINT 8-bit slots of the 24-bit word; bf16 words use k=2 bits in two
# 4-bit slots.  Each bit is uniform within its slot, so the false-positive
# rate is (1-(1-1/slot)^load)^k with no in-word bias.


def _hash_parts(codes: np.ndarray, mult: int, nwords: int, wbits: int):
    """(word index, bit positions...) per code — mirrored exactly on the
    device (uint32 wraparound multiply; see _hash_parts_dev)."""
    assert nwords & (nwords - 1) == 0, "nwords must be a power of two"
    h = (codes.astype(np.uint64) * np.uint64(mult)) & np.uint64(0xFFFFFFFF)
    if wbits == _WBITS_F32:
        w = ((h >> np.uint64(15)) & np.uint64(nwords - 1)).astype(np.int64)
        b1 = (h & np.uint64(7)).astype(np.int64)
        b2 = 8 + ((h >> np.uint64(3)) & np.uint64(7)).astype(np.int64)
        b3 = 16 + ((h >> np.uint64(6)) & np.uint64(7)).astype(np.int64)
        return w, (b1, b2, b3)
    w = ((h >> np.uint64(14)) & np.uint64(nwords - 1)).astype(np.int64)
    b1 = (h & np.uint64(3)).astype(np.int64)
    b2 = 4 + ((h >> np.uint64(2)) & np.uint64(3)).astype(np.int64)
    return w, (b1, b2)


def _bloom_build(codes: np.ndarray, mult: int, rows: int, wbits: int):
    """(rows, 128) float table with the k-in-word bits of every code set."""
    nwords = rows * 128
    words = np.zeros(nwords, dtype=np.int64)
    if codes.size:
        w, bits = _hash_parts(codes, mult, nwords, wbits)
        for b in bits:
            np.bitwise_or.at(words, w, np.int64(1) << b)
    if wbits <= _WBITS_BF16:
        try:
            import jax.numpy as jnp

            dt = jnp.bfloat16
        except ImportError:  # pragma: no cover - numpy-only envs
            dt = np.float32
    else:
        dt = np.float32
    return words.astype(dt).reshape(rows, 128)


def _bloom_pass_rate(tab: np.ndarray, mult: int, wbits: int, n=1 << 16):
    """Measured P(uniform random code passes the k-in-word test)."""
    rows = tab.shape[0]
    rng = np.random.default_rng(12345)
    codes = rng.integers(0, 1 << 24, n)
    w, bits = _hash_parts(codes, mult, rows * 128, wbits)
    words = np.asarray(tab, np.float64).reshape(-1).astype(np.int64)
    ww = words[w]
    hit = np.ones(n, np.int64)
    for b in bits:
        hit &= (ww >> b) & 1
    return float(hit.mean())


class FusedTables:
    """Flag tables for the fused kernel (verification data comes from the
    shared CascadeTables of ops/cascade.py)."""

    def __init__(
        self, ct: _c.CascadeTables, r1: int | None = None, r4: int | None = None
    ):
        self.ok = False
        if not (ct.ok and ct.has4):
            return
        r1 = r1 or int(os.environ.get("PYAHOCORASICK_TPU_B1_ROWS", 256))
        if r1 & (r1 - 1):
            r1 = 1 << (r1 - 1).bit_length()  # hashing needs pow2 word counts
        # W4 is bf16 (0.17 ns/char per 128 rows, PLAN.md): rows are cheap, so
        # default 256 keeps p_w4 well under the deep bloom's p^2 term
        r4 = r4 or int(os.environ.get("PYAHOCORASICK_TPU_W4_ROWS", 256))
        if r4 & (r4 - 1):
            r4 = 1 << (r4 - 1).bit_length()
        deep_codes = np.union1d(ct.codes_suf, ct.codes_sufb)
        self.has5 = ct.has5
        self.has_w4 = ct.codes_w4.size > 0
        self.r1 = r1
        self.r4 = r4
        # stage-1
        self.B1 = _bloom_build(deep_codes, _M1, r1, _WBITS_F32)
        self.W4 = _bloom_build(ct.codes_w4, _M2, r4, _WBITS_BF16)
        # stage-2 (budget-sized application, so table count is cheap here)
        self.S2a = _bloom_build(ct.codes_suf, _M2, 128, _WBITS_F32)
        self.S2b = _bloom_build(ct.codes_suf, _M3, 128, _WBITS_F32)
        self.S2c = _bloom_build(ct.codes_sufb, _M2, 128, _WBITS_F32)
        self.S2d = _bloom_build(ct.codes_sufb, _M3, 128, _WBITS_F32)
        self.W4b = _bloom_build(ct.codes_w4, _M3, 128, _WBITS_BF16)

        # expected stage-1 survivor rate on uniform input: gates the engine
        # (a saturated bloom would overflow the in-kernel compaction caps)
        p_b1 = _bloom_pass_rate(self.B1, _M1, _WBITS_F32) if self.has5 else 0.0
        p_w4 = (
            _bloom_pass_rate(self.W4, _M2, _WBITS_BF16) if self.has_w4 else 0.0
        )
        self.s1_est = p_b1 * p_b1 + p_w4
        # compaction budgets are sized from s1_est (see _budgets), so the
        # gate only needs to bound the budget-sized work, not protect caps
        if self.s1_est > 0.045:
            return  # dictionary too dense for the fused caps: use cascade
        self.ok = True

    def device_arrays(self):
        import jax.numpy as jnp

        if not hasattr(self, "_dev"):
            self._dev = {
                k: jnp.asarray(getattr(self, k))
                for k in ("B1", "W4", "S2a", "S2b", "S2c", "S2d", "W4b")
            }
            # lane-major kernel operands: tables pre-transposed on host
            self._dev["B1T"] = jnp.asarray(np.ascontiguousarray(self.B1.T))
            self._dev["W4T"] = jnp.asarray(
                np.ascontiguousarray(np.asarray(self.W4).T)
            )
        return self._dev


def build_fused_tables(compiled: CompiledAutomaton) -> Optional[FusedTables]:
    cache = compiled._cache
    if "fused" not in cache:
        ct = _c.build_tables(compiled)
        ft = None
        if ct is not None:
            try:
                t = FusedTables(ct)
                ft = t if t.ok else None
            except MemoryError:
                ft = None
        cache["fused"] = ft
    return cache["fused"]


# ---------------------------------------------------------------------------
# device side


def _hash_parts_dev(u, mult: int, nwords: int, wbits: int):
    """Device mirror of _hash_parts (uint32 wraparound multiply; pow2 masks
    only — non-pow2 modulo costs ~6 ns/char on the VPU, PLAN.md)."""
    import jax.numpy as jnp

    h = (u * jnp.uint32(mult)).astype(jnp.uint32)
    if wbits == _WBITS_F32:
        w = ((h >> jnp.uint32(15)) & jnp.uint32(nwords - 1)).astype(jnp.int32)
        b1 = (h & jnp.uint32(7)).astype(jnp.int32)
        b2 = 8 + ((h >> jnp.uint32(3)) & jnp.uint32(7)).astype(jnp.int32)
        b3 = 16 + ((h >> jnp.uint32(6)) & jnp.uint32(7)).astype(jnp.int32)
        return w, (b1, b2, b3)
    w = ((h >> jnp.uint32(14)) & jnp.uint32(nwords - 1)).astype(jnp.int32)
    b1 = (h & jnp.uint32(3)).astype(jnp.int32)
    b2 = 4 + ((h >> jnp.uint32(2)) & jnp.uint32(3)).astype(jnp.int32)
    return w, (b1, b2)


def _kernel_bloom(tabT_val, u_row, mult: int, wbits: int):
    """In-kernel k-in-word bloom test: (1, n) uint32 codes -> (1, n) int32
    0/1.  Lane-major bilinear-MXU fetch: the word-row onehot lives on the
    SUBLANE axis ((rows, n)), the pre-transposed table (128, rows) contracts
    it on the MXU to (128, n), and the in-row word select reduces sublanes.
    f32 tables run at Precision.HIGHEST so 24-bit words are exact (bf16
    tables are exact to 2^8 at native precision — HIGHEST on a bf16 lhs is
    rejected by Mosaic, measured)."""
    import jax
    import jax.numpy as jnp

    rows = tabT_val.shape[1]
    n = u_row.shape[1]
    w, bits = _hash_parts_dev(u_row, mult, rows * 128, wbits)  # (1, n) each
    a = w >> 7
    c = w & 127
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 0)
    oh = (a == iota_r).astype(tabT_val.dtype)  # (rows, n)
    r = jax.lax.dot_general(
        tabT_val, oh, (((1,), (0,)), ((), ())),
        precision=(
            jax.lax.Precision.HIGHEST if wbits == _WBITS_F32 else None
        ),
        preferred_element_type=jnp.float32,
    )  # (128, n)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
    word = (
        jnp.where(c == iota_c, r, 0.0).sum(axis=0, keepdims=True)
    ).astype(jnp.int32)  # (1, n)
    hit = (word >> bits[0])
    for b in bits[1:]:
        hit = hit & (word >> b)
    return hit & 1


def _make_flags_kernel(r1: int, tile: int, ov: int):
    """Stage-1 flag kernel body: ONE B1 fetch (AND-shifted against itself for
    the deep suf&sufb test) plus ONE W4 fetch; emits the per-tile stage-1
    mask.  All tensors stay in the (rows, 1) layout — Mosaic cannot shape-
    cast across the sublane/lane split (measured, tools/probe_pallas.py).
    The ``ov`` elements preceding the tile arrive as a separate block so the
    one-position shift of the B1 hit stream stays tile-local."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    def kernel(b1T_ref, w4T_ref, g4_ref, ov_ref, mask_ref):
        # stream blocks are (1, 1, tile): the unit middle dim satisfies the
        # "second-to-minor divisible by 8 or whole-array" block rule; [0]
        # squeezes it (a static leading-dim slice, no sublane/lane crossing)
        g = jnp.concatenate([ov_ref[0], g4_ref[0]], axis=1)  # (1, ov+tile)
        u = g.astype(jnp.uint32)
        hit1 = _kernel_bloom(b1T_ref[:], u, _M1, _WBITS_F32)
        prev1 = pltpu.roll(hit1, 1, axis=1)
        deep1 = hit1 & prev1
        w41 = _kernel_bloom(w4T_ref[:], u, _M2, _WBITS_BF16)
        # basic slice + unit-dim store (mixing None with slices in one
        # subscript lowers to a gather, which Mosaic rejects)
        mask_ref[0] = (deep1 | (w41 << 1))[:, ov:]

    return kernel


def _flags_call(r1: int, r4: int, tile: int, ov: int, n_tiles: int, interpret: bool):
    """One GRIDDED pallas_call over all tiles: a single compiled kernel with
    a hardware-managed grid loop.  (The v1 wrapper mapped a per-tile kernel
    with lax.map — a map-of-kernel pipeline whose remote compile exceeds 25
    minutes at bench tile counts, see PLAN.md; the grid form compiles once.)"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _make_flags_kernel(r1, tile, ov)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((128, r1), lambda t: (0, 0)),
            pl.BlockSpec((128, r4), lambda t: (0, 0)),
            pl.BlockSpec((1, 1, tile), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, ov), lambda t: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile), lambda t: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )


def _use_interpret() -> bool:
    import jax

    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# XLA pipeline: g4 codes -> map(kernel) -> hierarchical compaction ->
# stage-2 blooms on the budget-sized candidates -> exact bucket verify


def _bloom_bit2_xla(tab, codes_u32, mult: int, wbits: int):
    """XLA-side k-in-word bloom test on a budget-sized 1-D code array."""
    rows = tab.shape[0]
    w, bits = _hash_parts_dev(codes_u32, mult, rows * 128, wbits)
    word = _c._bilinear_word(tab, w)
    hit = word >> bits[0]
    for b in bits[1:]:
        hit = hit & (word >> b)
    return hit & 1


def _make_flags_fn(K: int, r1: int, r4: int, n_tiles: int, interpret: bool):
    """jit: int8 classes -> (stage1 mask (N,), g4 codes (N,)) via ONE
    gridded Pallas call.  Each grid step reads its (tile, 1) block of the
    code stream plus an (ov, 1) block of the ov codes that precede the tile
    (precomputed by slicing the padded stream with a stride-tile reshape)."""
    import jax
    import jax.numpy as jnp

    T, OV = _TILE, _OVERLAP
    K2, K3 = K * K, K * K * K
    call = _flags_call(r1, r4, T, OV, n_tiles, interpret)

    def fn(cls_i8, b1T_tab, w4T_tab):
        N = cls_i8.shape[0]  # == n_tiles * T
        cls = cls_i8.astype(jnp.int32)
        c1 = jnp.pad(cls, (1, 0))[:N]
        c2 = jnp.pad(cls, (2, 0))[:N]
        c3 = jnp.pad(cls, (3, 0))[:N]
        g4 = c3 * K3 + c2 * K2 + c1 * K + cls
        g4pad = jnp.pad(g4, (OV, 0))
        # ov codes preceding tile t = g4pad[t*T : t*T+OV]
        ovmat = g4pad[:N].reshape(n_tiles, 1, T)[:, :, :OV]
        mask = call(
            b1T_tab, w4T_tab, g4.reshape(n_tiles, 1, T), ovmat
        ).reshape(N)
        return mask, g4

    return jax.jit(fn)


def _make_post_fn(
    has5, has_w4, bucket_max, bbud, sbud, cbud, P, interpret
):
    """jit: (mask, g4, vstart) -> (counts, deep_pos, deep_id, totals).

    The compaction is the 3-level hierarchy of ops/cascade.py (budget-sized
    scatters only); stage-2 blooms then kill surviving stage-1 false
    positives before the exact S4/bucket verification."""
    import jax
    import jax.numpy as jnp

    from .cascade import _BLK, _DEEP_BUDGET, _bucket_verify, _compact

    def fn(mask, g4, vstart, n_valid, d, ft):
        N = mask.shape[0]
        pos = jnp.arange(N, dtype=jnp.int32)
        # n_valid masks the tile padding: repeated class-0 tails could
        # otherwise fake candidates that survive the exact g4 compare
        s1 = (mask > 0) & (pos >= jnp.maximum(vstart, 3)) & (pos < n_valid)
        flag = s1.astype(jnp.int8)

        counts = jnp.zeros((P + 1,), jnp.int32)

        # 3-level hierarchical compaction (cascade.py:449-489 design)
        padb = (-N) % _BLK
        fpad = jnp.pad(flag, (0, padb))
        nblk = fpad.shape[0] // _BLK
        f8 = fpad.reshape(nblk * 4, 8).max(axis=1)
        blk_any = f8.reshape(nblk, 4).max(axis=1).astype(jnp.int32)
        bbuf, btot = _compact(blk_any, bbud)
        bvalid = bbuf >= 0
        s8pos = (
            jnp.maximum(bbuf, 0)[:, None] * 4
            + jnp.arange(4, dtype=jnp.int32)[None, :]
        )
        sflag = (
            jnp.take(f8, jnp.minimum(s8pos, nblk * 4 - 1), mode="clip")
            .astype(jnp.int32)
            * bvalid[:, None]
        ).reshape(-1)
        sbuf, stot = _compact(sflag, sbud)
        svalid = sbuf >= 0
        g8 = jnp.take(s8pos.reshape(-1), jnp.maximum(sbuf, 0), mode="clip")
        cpos = g8[:, None] * 8 + jnp.arange(8, dtype=jnp.int32)[None, :]
        cflag = (
            jnp.take(fpad, jnp.minimum(cpos, N - 1), mode="clip")
            .astype(jnp.int32)
            * svalid[:, None]
            * (cpos < N)
        ).reshape(-1)
        cbuf, ctot = _compact(cflag, cbud)
        cvalid = cbuf >= 0
        ep = jnp.take(cpos.reshape(-1), jnp.maximum(cbuf, 0), mode="clip")

        # stage-2 blooms on the compacted candidates
        eg4 = jnp.take(g4, ep, mode="clip")
        egp = jnp.take(g4, jnp.maximum(ep - 1, 0), mode="clip")
        kinds = jnp.take(mask, ep, mode="clip")
        kd = (kinds & 1) > 0
        kw = (kinds & 2) > 0
        u4 = eg4.astype(jnp.uint32)
        up = egp.astype(jnp.uint32)
        if has5:
            d2 = (
                _bloom_bit2_xla(ft["S2a"], u4, _M2, _WBITS_F32)
                & _bloom_bit2_xla(ft["S2b"], u4, _M3, _WBITS_F32)
                & _bloom_bit2_xla(ft["S2c"], up, _M2, _WBITS_F32)
                & _bloom_bit2_xla(ft["S2d"], up, _M3, _WBITS_F32)
            ) > 0
        else:
            d2 = jnp.zeros_like(kd)
        if has_w4:
            w2 = _bloom_bit2_xla(ft["W4b"], u4, _M3, _WBITS_BF16) > 0
        else:
            w2 = jnp.zeros_like(kw)
        final = cvalid & ((kd & d2) | (kw & w2))

        counts, deep_flag, deep_ids = _bucket_verify(
            d, ep, eg4, final, g4, counts, P, bucket_max, cbud
        )
        dbuf, dtot = _compact(deep_flag.reshape(-1), _DEEP_BUDGET)
        dvalid = dbuf >= 0
        di = jnp.maximum(dbuf, 0)
        deep_pos = jnp.where(
            dvalid, jnp.take(ep, di // bucket_max, mode="clip"), -1
        )
        deep_id = jnp.where(
            dvalid, jnp.take(deep_ids.reshape(-1), di, mode="clip"), -1
        )
        return (
            counts[:P],
            deep_pos,
            deep_id,
            jnp.stack([btot, stot, ctot, dtot]),
        )

    return jax.jit(fn)


_FLAGS_CACHE: dict = {}
_POST_CACHE: dict = {}


def _pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def _budgets(N: int, s1: float):
    """Compaction budgets sized from the estimated stage-1 survivor rate
    (x3 safety, floor 4096, rounded to powers of two so the set of compiled
    post programs stays bounded); overflow is detected and returns None."""
    if N <= (1 << 16):
        nblk = -(-N // 32)
        return nblk, N, N
    p32 = 1.0 - (1.0 - s1) ** 32
    p8 = 1.0 - (1.0 - s1) ** 8
    nblk = -(-N // 32)
    bbud = min(nblk, max(1 << 12, _pow2(nblk * p32 * 3)))
    sbud = min(nblk * 4, max(1 << 12, _pow2((N // 8) * p8 * 3)))
    cbud = min(N, max(1 << 12, _pow2(N * s1 * 3)))
    return bbud, sbud, cbud


def _bucket_tiles(n_tiles: int) -> int:
    """Round the tile count up to {1, 1.25, 1.5, 1.75} x 2^k so the flags
    program compiles for a bounded set of shapes (<= 25% padding waste)."""
    if n_tiles <= 4:
        return n_tiles
    k = (n_tiles - 1).bit_length() - 1
    base = 1 << k
    for frac in (4, 5, 6, 7, 8):
        cand = base * frac // 4
        if cand >= n_tiles:
            return cand
    return base * 2


def count_matches_fused(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: Optional[np.ndarray] = None,
    staged=None,
    short_on_host: bool = True,
) -> Optional[np.ndarray]:
    """Per-pattern int64 counts via the fused flag kernel, or None when the
    engine is gated (no l>=4 patterns, saturated blooms, budget overflow) —
    the caller then falls back to the cascade/classic engines.  Exact for
    the same reasons as the cascade (every bloom pass is re-verified)."""
    ct = _c.build_tables(compiled)
    if ct is None:
        return None
    ft = build_fused_tables(compiled)
    if ft is None:
        return None
    import jax.numpy as jnp

    if halo is not None and halo.size:
        H = max(int(compiled.longest_word), 1)
        h = halo[-H:]
        full = np.concatenate([h.astype(np.int32), cls])
        vstart = int(h.size)
    else:
        full = cls
        vstart = 0
    N = int(full.size)
    if N == 0:
        return np.zeros(compiled.num_patterns, np.int64)

    # pad to a bucketed number of kernel tiles (class 0 tail cannot create
    # candidates that survive verification; bucketing bounds the set of
    # compiled flag programs at <= 25% padding waste)
    n_tiles = _bucket_tiles(-(-N // _TILE))
    Npad = n_tiles * _TILE
    bbud, sbud, cbud = _budgets(Npad, max(ft.s1_est, 1e-4))

    interp = _use_interpret()
    fkey = (compiled.num_classes, ft.r1, ft.r4, n_tiles, interp)
    if fkey not in _FLAGS_CACHE:
        from ..utils.compile_cache import ensure_compile_cache

        ensure_compile_cache()
        _FLAGS_CACHE[fkey] = _make_flags_fn(*fkey)
    pkey = (
        ft.has5, ft.has_w4, max(ct.bucket_max, 1), bbud, sbud, cbud,
        ct.num_patterns, interp,
    )
    if pkey not in _POST_CACHE:
        _POST_CACHE[pkey] = _make_post_fn(*pkey)

    if staged is not None:
        cls_dev = staged
    else:
        pad = np.zeros(Npad, np.int8)
        pad[:N] = full
        cls_dev = jnp.asarray(pad)

    dev = ct.device_arrays()
    ftd = ft.device_arrays()

    host_thread = None
    host_box: dict = {}
    any_short = any(ct.has)
    if short_on_host and any_short:
        import threading

        def _host_hist():
            try:
                host_box["counts"] = _c._short_counts_host(ct, full, vstart)
            except BaseException as exc:  # noqa: BLE001
                host_box["error"] = exc

        host_thread = threading.Thread(target=_host_hist)
        host_thread.start()

    mask, g4 = _FLAGS_CACHE[fkey](cls_dev, ftd["B1T"], ftd["W4T"])
    counts, deep_pos, deep_id, totals = _POST_CACHE[pkey](
        mask, g4, np.int32(vstart), np.int32(N), dev, ftd
    )
    totals = np.asarray(totals)
    if host_thread is not None:
        host_thread.join()
    from .cascade import _DEEP_BUDGET

    if (
        totals[0] > bbud
        or totals[1] > sbud
        or totals[2] > cbud
        or totals[3] > _DEEP_BUDGET
    ):
        return None  # budget overflow: caller falls back to an exact engine
    counts = np.asarray(counts).astype(np.int64)

    if short_on_host and any_short:
        if "counts" not in host_box:
            return None
        counts += host_box["counts"]
    elif any_short:
        # short lengths are exact-histogram work; without the host thread,
        # compute them synchronously (tests, small inputs)
        counts += _c._short_counts_host(ct, full, vstart)

    ndeep = int(totals[3])
    if ndeep:
        dp = np.asarray(deep_pos[:ndeep])
        di = np.asarray(deep_id[:ndeep])
        counts += _c._verify_deep_host(ct, full, vstart, dp, di)
    return counts
