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
_TILE = int(os.environ.get("PYAHOCORASICK_TPU_FUSED_TILE", 4096))
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


def _bloom_pass_rate(tab: np.ndarray, mult: int, wbits: int, n=1 << 16,
                     span: int = 1 << 24):
    """Measured P(uniform random code passes the k-in-word test)."""
    rows = tab.shape[0]
    rng = np.random.default_rng(12345)
    codes = rng.integers(0, span, n)
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
        # the kernel packs candidate entries as g4_code | kind << 24: only
        # collision-free while g4 codes fit 24 bits (cascade._MAX_K == 64
        # makes K**4 <= 2**24; a future _MAX_K bump must widen the packing)
        if ct.K ** 4 > 1 << 24:
            return
        deep_codes = np.union1d(ct.codes_suf, ct.codes_sufb)
        # table rows scale with the dictionary (pow2, floors): stage-1 MXU
        # cost is proportional to r1, so a 30-pattern dictionary must not
        # stream the 100k-pattern table (~4.4 bloom bits/key at the floor
        # keeps the measured fp profile of the fixed 256 rows of round 4)
        if r1 is None:
            env = os.environ.get("PYAHOCORASICK_TPU_B1_ROWS")
            r1 = (
                int(env)
                if env
                else min(max(_pow2(-(-int(deep_codes.size) // 1024)), 64),
                         4096)
            )
        if r1 & (r1 - 1):
            r1 = 1 << (r1 - 1).bit_length()  # hashing needs pow2 word counts
        if r4 is None:
            # in-word k=2 blooms scale LINEARLY at low fill (a lone key in
            # a word passes a matching probe at (1/4)^2; measured fp ~=
            # load/16), so ~8 words/key reproduces the round-4 fp of the
            # flat 256-row table at the bench dictionary
            env = os.environ.get("PYAHOCORASICK_TPU_W4_ROWS")
            r4 = (
                int(env)
                if env
                else min(max(_pow2(-(-int(ct.codes_w4.size) // 16)), 64),
                         1024)
            )
        if r4 & (r4 - 1):
            r4 = 1 << (r4 - 1).bit_length()
        self.has5 = ct.has5
        self.has_w4 = ct.codes_w4.size > 0
        self.r1 = r1
        self.r4 = r4
        # stage-1 deep bloom: 24-bit words built with the f32 hash layout,
        # then SPLIT into three bf16 tables of 8-bit words (bf16 is exact to
        # 2^8 and runs without Precision.HIGHEST — 2x cheaper on the MXU for
        # the same bloom bits).  The three tables share one hash/onehot.
        self.B1 = _bloom_build(deep_codes, _M1, r1, _WBITS_F32)
        w24 = np.asarray(self.B1, np.float64).astype(np.int64)
        self.B1s = np.stack(
            [(w24 >> (8 * t)) & 0xFF for t in range(3)]
        )  # (3, r1, 128) int
        self.W4 = _bloom_build(ct.codes_w4, _M2, r4, _WBITS_BF16)
        # stage-2 deep test: TWO bf16 tables keyed on the JOINT
        # (g4(i), g4(i-1)) pair key — the patterns' actual last-5-grams
        # (cascade._mix_pair) — instead of independent suf/sufb membership.
        # Independent tests pass every CORRELATED pair (g4(i) in suf AND
        # g4(i-1) in sufb with no pattern joining them), measured ~1e-3/char
        # on the 100k bench dictionary: the dominant verify load.  The pair
        # key kills those at bloom-fp rate, and costs 2 bloom_cols instead
        # of 4.  Rows scale with the pair-key count (~n deep patterns).
        n5 = int(ct.codes_pair5.size)
        r2p = 1 << max(int(6 * n5 / 1024 - 1).bit_length(), 8)
        r2p = min(max(r2p, 256), 2048)
        self.r2p = r2p
        self.S2P = np.stack(
            [
                np.asarray(x, np.float32)
                for x in (
                    _bloom_build(ct.codes_pair5, _M2, r2p, _WBITS_BF16),
                    _bloom_build(ct.codes_pair5, _M3, r2p, _WBITS_BF16),
                )
            ]
        )  # (2, r2p, 128)
        self.S2W = np.asarray(
            _bloom_build(ct.codes_w4, _M3, 256, _WBITS_BF16), np.float32
        ).reshape(1, 256, 128)

        # expected stage-1 survivor rate on uniform input: gates the engine
        # (a saturated bloom would overflow the in-kernel compaction caps)
        p_b1 = _bloom_pass_rate(self.B1, _M1, _WBITS_F32) if self.has5 else 0.0
        p_w4 = (
            _bloom_pass_rate(self.W4, _M2, _WBITS_BF16) if self.has_w4 else 0.0
        )
        self.s1_est = p_b1 * p_b1 + p_w4
        # final (post-stage-2) survivor-rate estimate, for post budgets
        span32 = 1 << 32  # pair keys span full uint32
        p5a = _bloom_pass_rate(self.S2P[0], _M2, _WBITS_BF16, span=span32)
        p5b = _bloom_pass_rate(self.S2P[1], _M3, _WBITS_BF16, span=span32)
        p2w = _bloom_pass_rate(self.S2W[0], _M3, _WBITS_BF16)
        self.p5_joint = p5a * p5b
        self.fin_est = p_b1 * p_b1 * p5a * p5b + p_w4 * p2w
        # per-tile candidate occupancy gate: mean stage-1 survivors per tile
        # plus 5 sigma must fit the _CAP in-kernel slots (binomial tail; a
        # runtime per-tile overflow check still guards the exactness)
        mu = self.s1_est * (_TILE + _OVERLAP)
        if mu + 5.0 * (mu**0.5) > _CAP:
            return  # dictionary too dense for the fused caps: use cascade
        # adaptive candidate slots: the (cap, n) select/pick machinery and
        # (cap, rows) stage-2 scale with cap, so small dictionaries (tiny
        # stage-1 rates) run with 64 slots instead of 256; a runtime
        # overflow escalates via compiled._cache['fused_cap']
        self.cap = max(64, min(_CAP, _pow2(int(mu + 5.0 * (mu**0.5) + 1))))
        self.tile = _TILE
        # sparse dictionaries take a DOUBLE tile: the kernel's per-tile
        # fixed costs (prefix chain, fin machinery, assembly) halve per
        # char, measured 0.47 -> 0.61 GB/s small-dictionary emission.
        # Only with cap = 64 — tile 8192 / cap 512 exceeded Mosaic limits
        # in round 4 (cap 64 buffers are 8x smaller).
        mu8 = self.s1_est * (8192 + _OVERLAP)
        if (
            _TILE == 4096
            and not os.environ.get("PYAHOCORASICK_TPU_FUSED_TILE")
            and mu8 + 5.0 * (mu8**0.5) <= 48
        ):
            self.tile = 8192
            self.cap = 64
        self.ok = True

    def device_arrays(self):
        import jax.numpy as jnp

        if not hasattr(self, "_dev"):
            # kernel operands: stage-1 tables pre-transposed to (128, rows)
            # lane-major form; the three B1 splits stacked on sublanes
            b1t = np.concatenate(
                [np.ascontiguousarray(self.B1s[t].T) for t in range(3)], 0
            )  # (384, r1)
            self._dev = {
                "B1T": jnp.asarray(b1t, dtype=jnp.bfloat16),
                "W4T": jnp.asarray(
                    np.ascontiguousarray(np.asarray(self.W4, np.float32).T),
                    dtype=jnp.bfloat16,
                ),
                "S2P": jnp.asarray(self.S2P, dtype=jnp.bfloat16),
                "S2W": jnp.asarray(self.S2W, dtype=jnp.bfloat16),
            }
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


_CAP = int(os.environ.get("PYAHOCORASICK_TPU_FUSED_CAP", 256))
# final (post-stage-2) survivors are compacted IN-KERNEL a second time, to
# _FIN slots per tile (measured final rate ~1.5e-3/char -> ~3 per 2048-tile;
# a tile overflowing _FIN returns None and the caller falls back), so the
# XLA post only assembles n_tiles*_FIN values — the round-4 v4 post's
# two-level compaction over n_tiles*_CAP entries cost ~1.4 ns/char in
# XLA gathers (measured), dwarfing the kernel itself.
_FIN = int(os.environ.get("PYAHOCORASICK_TPU_FUSED_FIN", 16))
# out layout: [pos | code | pv4 | fin_cnt | s1_cnt] x F
# (pv4 = g4 code at ep-4: the hash verify's gather-free anchor window)
_OUT_COLS = 5

# device mirror of cascade._C5 (joint last-5 pair key)
_C5 = 0x9E3779B9


def _make_flags_kernel(K: int, r1: int, r4: int, r2p: int, tile: int,
                       ov: int, has5: bool, has_w4: bool, cap: int = _CAP,
                       fin_slots: int = _FIN):
    """One-pass fused kernel: g4 codes built IN-KERNEL from the raw class
    stream (two lane rolls — the round-3 XLA prep of pads/multiplies over
    the full 134M-char stream measured ~1.5 ns/char, dwarfing the kernel's
    own 2.3; tools/probe_fused_stages.py), stage-1 blooms on the full
    (1, n) lane stream, lane-axis compaction of the survivors (log-shift
    prefix sum + onehot select-reduce — Mosaic has no vector gather, but a
    0/1 multiply-reduce is one), stage-2 blooms on the <=CAP compacted
    candidates, and a packed per-tile candidate list as output.  The XLA
    post thus only ever touches final-rate (~1e-4) survivors.

    Stage-1 deep test: the three bf16 B1 splits share ONE hash/onehot and
    are stacked on sublanes, so one (384, r1) @ (r1, n) MXU contraction
    fetches all 24 bloom bits; the suf&sufb AND rides a one-lane roll.
    (A premultiplied single-block f32 table at Precision.HIGHEST measured
    1.7x SLOWER than the 3-split — probe r4 's1f32' — so bf16 stays.)"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = tile + ov
    K2 = K * K

    def kernel(b1T_ref, w4T_ref, s2p_ref, s2w_ref, cls_ref, prev_ref,
               out_ref):
        # prev_ref is the PREVIOUS tile's block (same array, index map
        # t-1): its last `ov` lanes are the overlap history.  Tile 0 sees
        # its own block there — i.e. garbage history — but g4 codes only
        # reach back 3 chars and candidate positions < 3 are masked in the
        # verify, so garbage can only create false candidates (verified
        # away), never lose true ones.
        ovc = jax.lax.slice(prev_ref[0], (0, tile - ov), (1, tile))
        c = jnp.concatenate([ovc, cls_ref[0]], axis=1).astype(
            jnp.int32
        )  # (1, n) class stream
        # last-4-gram codes via lane rolls; lanes < 3 see wrapped garbage,
        # but candidate positions are masked to lane >= ov (>= 3) below and
        # the global first tile's ov block is zero-padded by the caller
        # (matching the zero-history g4 the XLA prep produced in v3)
        g2 = pltpu.roll(c, 1, axis=1) * K + c
        g = pltpu.roll(g2, 2, axis=1) * K2 + g2  # (1, n) g4 codes
        u = g.astype(jnp.uint32)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (128, n), 0)
        zero_row = jnp.zeros((1, n), jnp.int32)

        # ---- stage 1: deep bloom (3 stacked bf16 tables, shared onehot)
        if has5:
            w, bits = _hash_parts_dev(u, _M1, r1 * 128, _WBITS_F32)
            a = w >> 7
            csel = w & 127
            iota_r1 = jax.lax.broadcasted_iota(jnp.int32, (r1, n), 0)
            oh1 = (a == iota_r1).astype(jnp.bfloat16)  # (r1, n)
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
                (w0 >> bits[0])
                & (w1 >> (bits[1] - 8))
                & (w2 >> (bits[2] - 16))
                & 1
            )
            prev1 = pltpu.roll(hit1, 1, axis=1)
            deep1 = hit1 & prev1
        else:
            deep1 = zero_row

        # ---- stage 1: w4 bloom
        if has_w4:
            w4, bits4 = _hash_parts_dev(u, _M2, r4 * 128, _WBITS_BF16)
            a4 = w4 >> 7
            c4 = w4 & 127
            iota_r4 = jax.lax.broadcasted_iota(jnp.int32, (r4, n), 0)
            oh4 = (a4 == iota_r4).astype(jnp.bfloat16)
            rw = jax.lax.dot_general(
                w4T_ref[:], oh4, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (128, n)
            w4w = (
                jnp.where(c4 == iota_c, rw, 0.0)
                .sum(axis=0, keepdims=True)
                .astype(jnp.int32)
            )
            w41 = (w4w >> bits4[0]) & (w4w >> bits4[1]) & 1
        else:
            w41 = zero_row

        kind = deep1 | (w41 << 1)  # (1, n)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        hit = ((kind > 0) & (lane >= ov)).astype(jnp.int32)

        # ---- lane-axis inclusive prefix sum (Hillis-Steele via rolls)
        cs = hit
        k = 1
        while k < n:
            cs = cs + jnp.where(lane >= k, pltpu.roll(cs, k, axis=1), 0)
            k <<= 1
        slot = cs - 1
        total = jax.lax.slice(cs, (0, n - 1), (1, n))  # (1, 1)

        # ---- compact to sublanes: (CAP, n) onehot select-reduce
        iota_cap = jax.lax.broadcasted_iota(jnp.int32, (cap, n), 0)
        seli = ((slot == iota_cap) & (hit > 0)).astype(jnp.int32)

        def pick(vals_1n):  # (1, n) int32 -> (CAP, 1)
            return (seli * vals_1n).sum(axis=1, keepdims=True)

        gi = g.astype(jnp.int32)
        cand_ck = pick(gi | (kind << 24))          # code (24b) | kind
        cand_prev = pick(pltpu.roll(gi, 1, axis=1))
        # g4 at ep-4 (chars ep-7..ep-4): the hash verify's gather-free
        # anchor window — lengths 5..8 start inside it (low digits) and
        # lengths >= 9 compare their own 4-gram at pattern end-4 (round-5)
        cand_prev4 = pick(pltpu.roll(gi, 4, axis=1))
        cand_pos = pick(lane - ov)
        cand_code = cand_ck & 0xFFFFFF
        cand_kind = cand_ck >> 24
        # slot i occupied iff i < total (slots fill in prefix order):
        # cheaper than a fourth (cap, n) pick
        iota_col = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
        cand_valid = (iota_col < total).astype(jnp.int32)

        # ---- stage 2 on the compacted candidates (column-major blooms)
        def bloom_col(tab, uu, mult):
            rows = tab.shape[0]
            wv, bb = _hash_parts_dev(uu, mult, rows * 128, _WBITS_BF16)
            av = wv >> 7
            cv = wv & 127
            iota_rows = jax.lax.broadcasted_iota(jnp.int32, (cap, rows), 1)
            ohv = (av == iota_rows).astype(tab.dtype)
            rv = jax.lax.dot_general(
                ohv, tab, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (CAP, 128)
            iota_l = jax.lax.broadcasted_iota(jnp.int32, (cap, 128), 1)
            wordv = (
                jnp.where(cv == iota_l, rv, 0.0)
                .sum(axis=1, keepdims=True)
                .astype(jnp.int32)
            )
            h = wordv >> bb[0]
            for b in bb[1:]:
                h = h & (wordv >> b)
            return h & 1  # (CAP, 1)

        u2 = cand_code.astype(jnp.uint32)
        upv = cand_prev.astype(jnp.uint32)
        if has5:
            # joint last-5 pair key (host mirror: cascade._mix_pair) —
            # correlated (suf, sufb) pairs with no pattern joining them
            # fail these at bloom-fp rate instead of passing outright
            u5 = (u2 * jnp.uint32(_C5) + upv).astype(jnp.uint32)
            d2 = (
                bloom_col(s2p_ref[0], u5, _M2)
                & bloom_col(s2p_ref[1], u5, _M3)
            )
        else:
            d2 = jnp.zeros((cap, 1), jnp.int32)
        if has_w4:
            w2b = bloom_col(s2w_ref[0], u2, _M3)
        else:
            w2b = jnp.zeros((cap, 1), jnp.int32)
        kd = cand_kind & 1
        kw = (cand_kind >> 1) & 1
        fin = cand_valid * ((kd & d2) | (kw & w2b))

        # ---- (CAP, 1) -> (1, CAP) diag extract of the final survivors
        eye = (
            jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (cap, cap), 1)
        ).astype(jnp.int32)
        gpos = cand_pos + pl.program_id(0) * tile  # global end positions
        prow = (eye * gpos).sum(axis=0, keepdims=True)  # (1, CAP)
        crow = (eye * cand_code).sum(axis=0, keepdims=True)
        pv_rows = [(eye * cand_prev4).sum(axis=0, keepdims=True)]
        frow = (eye * fin).sum(axis=0, keepdims=True)

        # ---- second in-tile compaction: fin survivors -> _FIN row slots
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
        cs2 = frow
        k = 1
        while k < cap:
            cs2 = cs2 + jnp.where(
                lane_c >= k, pltpu.roll(cs2, k, axis=1), 0
            )
            k <<= 1
        slot2 = cs2 - 1
        fin_cnt = jax.lax.slice(cs2, (0, cap - 1), (1, cap))  # (1, 1)
        iota_f = jax.lax.broadcasted_iota(jnp.int32, (fin_slots, cap), 0)
        sel2 = ((slot2 == iota_f) & (frow > 0)).astype(jnp.int32)
        pcol = (sel2 * prow).sum(axis=1, keepdims=True)  # (fin_slots, 1)
        ccol = (sel2 * crow).sum(axis=1, keepdims=True)
        pvcols = [
            (sel2 * pvr).sum(axis=1, keepdims=True) for pvr in pv_rows
        ]
        # mark empty slots with -1 positions
        vcol = (sel2 * jnp.ones((1, cap), jnp.int32)).sum(
            axis=1, keepdims=True
        )
        pcol = jnp.where(vcol > 0, pcol, -1)
        eyef = (
            jax.lax.broadcasted_iota(jnp.int32, (fin_slots, fin_slots), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (fin_slots, fin_slots), 1)
        ).astype(jnp.int32)
        prow2 = (eyef * pcol).sum(axis=0, keepdims=True)  # (1, fin_slots)
        crow2 = (eyef * ccol).sum(axis=0, keepdims=True)
        pvrow2 = [
            (eyef * pvc).sum(axis=0, keepdims=True) for pvc in pvcols
        ]
        out_ref[0] = jnp.concatenate(
            [
                prow2,
                crow2,
                *pvrow2,
                jnp.broadcast_to(fin_cnt, (1, fin_slots)),
                jnp.broadcast_to(total, (1, fin_slots)),
            ],
            axis=1,
        )  # (1, _OUT_COLS*fin_slots)

    return kernel


def _flags_call(K: int, r1: int, r4: int, r2p: int, tile: int, ov: int,
                n_tiles: int, has5: bool, has_w4: bool, interpret: bool,
                cap: int = _CAP, fin_slots: int = _FIN):
    """One GRIDDED pallas_call over all tiles: a single compiled kernel with
    a hardware-managed grid loop.  (The v1 wrapper mapped a per-tile kernel
    with lax.map — a map-of-kernel pipeline whose remote compile exceeds 25
    minutes at bench tile counts, see PLAN.md; the grid form compiles once.)"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _make_flags_kernel(K, r1, r4, r2p, tile, ov, has5, has_w4,
                                cap, fin_slots)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((384, r1), lambda t: (0, 0)),
            pl.BlockSpec((128, r4), lambda t: (0, 0)),
            pl.BlockSpec((2, r2p, 128), lambda t: (0, 0, 0)),
            pl.BlockSpec((1, 256, 128), lambda t: (0, 0, 0)),
            pl.BlockSpec((1, 1, tile), lambda t: (t, 0, 0)),
            # previous tile of the SAME class array (overlap history);
            # building a shifted ovmat in XLA cost two full-stream passes
            pl.BlockSpec(
                (1, 1, tile), lambda t: (jnp.maximum(t - 1, 0), 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, _OUT_COLS * fin_slots), lambda t: (t, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, 1, _OUT_COLS * fin_slots), jnp.int32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )


def _use_interpret() -> bool:
    import jax

    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# XLA pipeline (v5): raw classes -> gridded kernel (in-kernel g4 + flags +
# stage-1 compaction + stage-2 + SECOND in-tile compaction to _FIN slots)
# -> one cheap cumsum+scatter assembly of the survivor positions/codes in
# the SAME jit (the v4 two-level gather compaction over n_tiles*_CAP
# entries measured ~1.4 ns/char) -> exact S4/bucket verify on a tightly
# sized buffer (sized from the measured per-automaton survivor rate after
# the first call, speculative dispatch — verify cost scales with budget
# slack, measured 436 ns/slot).


def _make_flags_fn(K: int, r1: int, r4: int, r2p: int, n_tiles: int,
                   vbuf: int, fin_slots: int, has5: bool, has_w4: bool,
                   interpret: bool, cap: int = _CAP, tile: int = _TILE):
    """jit: int8 classes (padded to n_tiles*_TILE) ->
    (posbuf (vbuf,), codebuf (vbuf,), pvbufs (4, vbuf),
    totals[s1_max, fin_max, total])."""
    import jax
    import jax.numpy as jnp

    T, OV, F = tile, _OVERLAP, fin_slots
    call = _flags_call(K, r1, r4, r2p, T, OV, n_tiles, has5, has_w4,
                       interpret, cap, fin_slots)

    def fn(cls_i8, b1T_tab, w4T_tab, s2p_tab, s2w_tab):
        cls3 = cls_i8.reshape(n_tiles, 1, T)
        cand = call(b1T_tab, w4T_tab, s2p_tab, s2w_tab, cls3, cls3).reshape(
            n_tiles, _OUT_COLS * F
        )
        pos_t = cand[:, :F]
        code_t = cand[:, F: 2 * F]
        pv_t = [cand[:, 2 * F: 3 * F]]
        fcnt = jnp.minimum(cand[:, 3 * F], F)
        s1max = cand[:, 4 * F].max()
        fmax = cand[:, 3 * F].max()
        csum = jnp.cumsum(fcnt)
        total = csum[-1]
        off = csum - fcnt
        j = jnp.arange(F, dtype=jnp.int32)[None, :]
        valid = j < fcnt[:, None]
        dst = jnp.where(valid, off[:, None] + j, vbuf)
        posbuf = (
            jnp.full((vbuf + 1,), -1, jnp.int32)
            .at[dst.reshape(-1)]
            .set(jnp.where(valid, pos_t, -1).reshape(-1), mode="drop")
        )[:vbuf]
        codebuf = (
            jnp.zeros((vbuf + 1,), jnp.int32)
            .at[dst.reshape(-1)]
            .set(jnp.where(valid, code_t, 0).reshape(-1), mode="drop")
        )[:vbuf]
        pvbufs = jnp.stack(
            [
                (
                    jnp.zeros((vbuf + 1,), jnp.int32)
                    .at[dst.reshape(-1)]
                    .set(
                        jnp.where(valid, pv, 0).reshape(-1), mode="drop"
                    )
                )[:vbuf]
                for pv in pv_t
            ]
        )
        return posbuf, codebuf, pvbufs, jnp.stack([s1max, fmax, total])

    return jax.jit(fn)


def _make_post_verify(K, bucket_max, vbud, P, interpret,
                      two_phase: bool = True):
    """jit: (posbuf_slice, codebuf_slice, cls_i8, vstart, n_valid, d) ->
    (counts, deep_pos, deep_id, dtot, mtot).  Runs the exact S4/bucket
    verification on the (speculatively) sized survivor list; g4 codes at
    candidate positions come from the kernel's code output, and the match-
    start codes are recomputed from 4 class gathers (the full g4 stream is
    never materialized since v4).

    TWO-PHASE bucket walk (measured: the t>=1 iterations cost 27 ms each
    at a 262k budget, yet most last4 buckets hold ONE pattern): phase 1
    runs t=0 for every slot; slots whose bucket has >= 2 entries are
    compacted into a vbud/4 side list and only they pay t>=1.  ``mtot``
    reports the side-list occupancy — an overflow (> vbud/4 multi-pattern
    candidates, adversarial) makes the caller re-dispatch the flat
    single-phase program (two_phase=False) so counts stay exact."""
    import jax
    import jax.numpy as jnp

    from .cascade import _DEEP_BUDGET, _compact

    mbud = max(vbud // 4, 1 << 10)

    def fn(posbuf, codebuf, cls_i8, vstart, n_valid, d):
        counts = jnp.zeros((P + 1,), jnp.int32)
        ep = posbuf
        cval = (ep >= jnp.maximum(vstart, 3)) & (ep < n_valid)
        eg4 = codebuf

        def g4_of(cls_take, pos):
            def cc(q):
                return cls_take(jnp.clip(q, 0, n_valid - 1))

            return (
                ((cc(pos - 3) * K + cc(pos - 2)) * K + cc(pos - 1)) * K
                + cc(pos)
            )

        def cls_take(q):
            return jnp.take(cls_i8, q, mode="clip").astype(jnp.int32)

        w = jnp.take(d["s4_words"], eg4 >> 5, mode="clip")
        hit = cval & (((w >> (eg4 & 31)) & 1) > 0)
        rank = jnp.take(
            d["s4_rank"], eg4 >> 5, mode="clip"
        ) + jax.lax.population_count(
            w & ((jnp.int32(1) << (eg4 & 31)) - 1)
        )
        off = jnp.take(d["bucket_off"], rank, mode="clip")
        end = jnp.take(d["bucket_off"], rank + 1, mode="clip")

        def bucket_iter(counts, ep_v, off_v, live, t):
            ci = off_v + t
            cl = jnp.take(d["cand_len"], ci, mode="clip")
            cs4 = jnp.take(d["cand_start4"], ci, mode="clip")
            cid = jnp.take(d["cand_id"], ci, mode="clip")
            sp = ep_v - cl + 4
            inb = live & (sp >= 3)
            okstart = inb & (g4_of(cls_take, jnp.maximum(sp, 0)) == cs4)
            is4 = okstart & (cl == 4)
            counts = counts.at[jnp.where(is4, cid, P)].add(1, mode="drop")
            isdeep = okstart & (cl >= 5)
            return counts, isdeep.astype(jnp.int32), cid

        n_phase1 = bucket_max if not two_phase else 1
        deep_flag = jnp.zeros((vbud, bucket_max), jnp.int32)
        deep_ids = jnp.zeros((vbud, bucket_max), jnp.int32)
        for t in range(n_phase1):
            counts, df, cid = bucket_iter(
                counts, ep, off, hit & (off + t < end), t
            )
            deep_flag = deep_flag.at[:, t].set(df)
            deep_ids = deep_ids.at[:, t].set(cid)

        mtot = jnp.int32(0)
        mdeep_flag = jnp.zeros((mbud, max(bucket_max - 1, 1)), jnp.int32)
        mdeep_ids = jnp.zeros((mbud, max(bucket_max - 1, 1)), jnp.int32)
        msel = jnp.zeros((mbud,), jnp.int32)
        if two_phase and bucket_max > 1:
            multi = (hit & (end - off >= 2)).astype(jnp.int32)
            mbuf, mtot = _compact(multi, mbud)
            mvalid = mbuf >= 0
            mi = jnp.maximum(mbuf, 0)
            mep = jnp.take(ep, mi, mode="clip")
            moff = jnp.take(off, mi, mode="clip")
            mend = jnp.take(end, mi, mode="clip")
            msel = jnp.where(mvalid, mi, vbud)
            for t in range(1, bucket_max):
                counts, df, cid = bucket_iter(
                    counts, mep, moff, mvalid & (moff + t < mend), t
                )
                mdeep_flag = mdeep_flag.at[:, t - 1].set(df)
                mdeep_ids = mdeep_ids.at[:, t - 1].set(cid)

        dbuf, dtot1 = _compact(deep_flag.reshape(-1), _DEEP_BUDGET)
        dvalid = dbuf >= 0
        di = jnp.maximum(dbuf, 0)
        deep_pos = jnp.where(
            dvalid, jnp.take(ep, di // bucket_max, mode="clip"), -1
        )
        deep_id = jnp.where(
            dvalid, jnp.take(deep_ids.reshape(-1), di, mode="clip"), -1
        )
        if two_phase and bucket_max > 1:
            mb = max(bucket_max - 1, 1)
            dbuf2, dtot2 = _compact(mdeep_flag.reshape(-1), _DEEP_BUDGET)
            dvalid2 = dbuf2 >= 0
            di2 = jnp.maximum(dbuf2, 0)
            slot2 = jnp.take(msel, di2 // mb, mode="clip")
            deep_pos2 = jnp.where(
                dvalid2,
                jnp.take(ep, jnp.minimum(slot2, vbud - 1), mode="clip"),
                -1,
            )
            deep_id2 = jnp.where(
                dvalid2,
                jnp.take(mdeep_ids.reshape(-1), di2, mode="clip"),
                -1,
            )
            # concatenate the two deep streams back to back
            deep_pos = jnp.concatenate([deep_pos, deep_pos2])
            deep_id = jnp.concatenate([deep_id, deep_id2])
            dtot = dtot1 + dtot2
            # splice: move phase-2 entries up against phase-1's tail
            idx = jnp.arange(deep_pos.shape[0], dtype=jnp.int32)
            take_from = jnp.where(
                idx < dtot1, idx, idx - dtot1 + _DEEP_BUDGET
            )
            deep_pos = jnp.take(deep_pos, take_from, mode="clip")
            deep_id = jnp.take(deep_id, take_from, mode="clip")
            deep_pos = jnp.where(idx < dtot, deep_pos, -1)[:_DEEP_BUDGET]
            deep_id = jnp.where(idx < dtot, deep_id, -1)[:_DEEP_BUDGET]
        else:
            dtot = dtot1
        # int16 copy of the counts with an overflow flag appended: the
        # relay fetch moves ~10 MB/s, so halving the (P,) buffer saves
        # ~20 ms at 100k patterns; the int32 original stays device-side
        # for the (rare) refetch when any count exceeds int16
        c32 = counts[:P]
        ovf16 = (c32.max() >= (1 << 15)).astype(jnp.int16)
        c16 = jnp.concatenate(
            [c32.astype(jnp.int16), ovf16.reshape(1)]
        )
        return c32, c16, deep_pos, deep_id, dtot, mtot

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# hash-table verify (round-5): replaces the ~11-gather S4/rank/bucket walk
# with a 2-probe open-addressing lookup per candidate.  One table slot per
# DISTINCT last-4-gram code carries everything the common case needs
# inline: the (unique) length-4 pattern id, and the first deep entry's
# (anchor code, anchor selector, id).  Start anchors are compared against
# the kernel-emitted g4 codes at ep-1..ep-4 — zero gathers.  Rare cases
# (probe clusters > 2, buckets with >= 2 deep entries) compact into a side
# list that pays the classic bucket walk.

_HM = 0xB4B82E39  # odd multiplicative hash for the verify table


class HashVerifyTables:
    """Open-addressing table over distinct last-4 codes of l>=4 patterns."""

    def __init__(self, ct: _c.CascadeTables):
        self.ok = False
        n_uniq = int(ct.bucket_keys.size)
        if n_uniq == 0 or ct.num_patterns >= (1 << 24):
            return
        keys = ct.bucket_keys.astype(np.int64)
        sizes = np.diff(ct.bucket_off).astype(np.int64)
        bucket_of = np.repeat(np.arange(n_uniq, dtype=np.int64), sizes)
        lens = ct.cand_len.astype(np.int64)
        has_l4 = np.zeros(n_uniq, np.int64)
        l4_id = np.zeros(n_uniq, np.int64)
        m4 = lens == 4
        has_l4[bucket_of[m4]] = 1
        l4_id[bucket_of[m4]] = ct.cand_id[m4]
        deep = lens >= 5
        dloc = np.nonzero(deep)[0]
        nd = np.bincount(bucket_of[dloc], minlength=n_uniq)
        first_deep = np.full(n_uniq, 0, np.int64)
        first_deep[bucket_of[dloc[::-1]]] = dloc[::-1]  # first entry wins
        cl = lens[first_deep]
        sel = np.minimum(np.maximum(cl - 4, 1), 5)
        # anchor values against the kernel's pv4 (= g4 code of chars
        # ep-7..ep-4): lengths 5..7 start INSIDE that window, so their
        # anchor is the pattern's first (cl-4) chars = the TOP digits of
        # start4, compared against pv4 mod K^(cl-4); length 8 compares the
        # full start4; lengths >= 9 compare their own 4-gram at pattern
        # end-4 (cand_anchor9)
        K = int(ct.K)
        start4 = ct.cand_start4[first_deep].astype(np.int64)
        kpow = np.int64(K) ** np.minimum(4 - np.minimum(sel, 4), 3)
        anchor = np.where(
            sel <= 3,
            start4 // kpow,
            np.where(
                cl <= 8, start4,
                ct.cand_anchor9[first_deep].astype(np.int64),
            ),
        )
        meta = (
            l4_id
            | (has_l4 << 24)
            | ((nd >= 1).astype(np.int64) << 25)
            | ((nd >= 2).astype(np.int64) << 26)
        )
        d1 = anchor | (sel << 24)
        d2 = ct.cand_id[first_deep].astype(np.int64)

        H = max(1 << int(max(4 * n_uniq - 1, 1)).bit_length(), 1 << 10)
        self.lgH = H.bit_length() - 1
        hv_key = np.full(H, -1, np.int64)
        slot_of = np.full(n_uniq, -1, np.int64)
        h0 = (
            (keys.astype(np.uint64) * np.uint64(_HM))
            & np.uint64(0xFFFFFFFF)
        ) >> np.uint64(32 - self.lgH)
        h0 = h0.astype(np.int64)
        dist = np.zeros(n_uniq, np.int64)
        pending = np.arange(n_uniq)
        for _ in range(4 * self.lgH + 64):
            if pending.size == 0:
                break
            slots = (h0[pending] + dist[pending]) & (H - 1)
            free = hv_key[slots] == -1
            fidx = np.nonzero(free)[0]
            if fidx.size:
                fs = slots[fidx]
                _, first = np.unique(fs, return_index=True)
                winners = fidx[first]
                hv_key[slots[winners]] = keys[pending[winners]]
                slot_of[pending[winners]] = slots[winners]
                placed = np.zeros(pending.size, bool)
                placed[winners] = True
                pending = pending[~placed]
            dist[pending] += 1
        if pending.size:
            return  # pathological clustering: keep the bucket walk
        meta_t = np.zeros(H, np.int64)
        d1_t = np.zeros(H, np.int64)
        d2_t = np.zeros(H, np.int64)
        meta_t[slot_of] = meta
        d1_t[slot_of] = d1
        d2_t[slot_of] = d2
        self.key = hv_key.astype(np.int32)
        self.meta = meta_t.astype(np.int32)
        self.d1 = d1_t.astype(np.int32)
        self.d2 = d2_t.astype(np.int32)
        self.ok = True

    def device_arrays(self):
        import jax.numpy as jnp

        if not hasattr(self, "_dev"):
            self._dev = {
                "key": jnp.asarray(self.key),
                "meta": jnp.asarray(self.meta),
                "d1": jnp.asarray(self.d1),
                "d2": jnp.asarray(self.d2),
            }
        return self._dev


def build_hash_verify(
    compiled: CompiledAutomaton, ct: _c.CascadeTables
) -> Optional[HashVerifyTables]:
    cache = compiled._cache
    if "hashverify" not in cache:
        try:
            t = HashVerifyTables(ct)
            cache["hashverify"] = t if t.ok else None
        except MemoryError:
            cache["hashverify"] = None
    return cache["hashverify"]


def _make_post_verify_hash(K, bucket_max, lgH, vbud, P, interpret):
    """jit: (posbuf, codebuf, pv1..pv4, cls_i8, vstart, n_valid, d, hv) ->
    (counts32, counts16, deep_pos, deep_id, dtot, mtot) — the hash-probe
    verify.  Phase 1 resolves every candidate whose key lands within two
    probes and whose bucket holds at most one deep entry; the rest compact
    into an mbud side list that runs the classic bucket walk (l==4 counting
    there is gated to unresolved slots so nothing counts twice).  ``mtot``
    reports side-list occupancy: an overflow makes the caller re-dispatch
    the flat bucket-walk program, so exactness never rides the fast path."""
    import jax
    import jax.numpy as jnp

    from .cascade import _DEEP_BUDGET, _compact

    mbud = max(vbud // 4, 1 << 10)
    H = 1 << lgH

    def fn(posbuf, codebuf, pv4, totals3, cls_i8, vstart, n_valid, d,
           hv):
        counts = jnp.zeros((P + 1,), jnp.int32)
        ep = posbuf
        cval = (ep >= jnp.maximum(vstart, 3)) & (ep < n_valid)
        eg4 = codebuf
        u = eg4.astype(jnp.uint32)
        h0 = ((u * jnp.uint32(_HM)) >> jnp.uint32(32 - lgH)).astype(
            jnp.int32
        )
        h1 = (h0 + 1) & (H - 1)
        k0 = jnp.take(hv["key"], h0, mode="clip")
        k1 = jnp.take(hv["key"], h1, mode="clip")
        m0 = k0 == eg4
        found = m0 | (k1 == eg4)
        hm = jnp.where(m0, h0, h1)
        meta = jnp.take(hv["meta"], hm, mode="clip")
        is4 = cval & found & (((meta >> 24) & 1) > 0)
        counts = counts.at[jnp.where(is4, meta & 0xFFFFFF, P)].add(
            1, mode="drop"
        )
        hasd = ((meta >> 25) & 1) > 0
        multi = ((meta >> 26) & 1) > 0
        d1 = jnp.take(hv["d1"], hm, mode="clip")
        anchor = d1 & 0xFFFFFF
        sel = d1 >> 24
        # lengths 5..7 start inside pv4's window: compare its low digits
        modm = jnp.where(sel == 1, K, jnp.where(sel == 2, K * K, K**3))
        pkv = jnp.where(sel <= 3, pv4 % modm, pv4)
        okd = cval & found & hasd & ~multi & (pkv == anchor)
        dbuf, dtot1 = _compact(okd.astype(jnp.int32), _DEEP_BUDGET)
        dvalid = dbuf >= 0
        di = jnp.maximum(dbuf, 0)
        deep_pos = jnp.where(dvalid, jnp.take(ep, di, mode="clip"), -1)
        deep_id = jnp.where(
            dvalid,
            jnp.take(hv["d2"], jnp.take(hm, di, mode="clip"), mode="clip"),
            -1,
        )

        # ---- side list: unresolved probes or multi-deep buckets
        unresolved = cval & ~found & (k0 != -1) & (k1 != -1)
        sidefl = (unresolved | (cval & found & multi & hasd)).astype(
            jnp.int32
        )
        mbuf, mtot = _compact(sidefl, mbud)
        mvalid = mbuf >= 0
        mi = jnp.maximum(mbuf, 0)
        mep = jnp.take(ep, mi, mode="clip")
        meg4 = jnp.take(eg4, mi, mode="clip")
        allow4 = jnp.take(unresolved.astype(jnp.int32), mi, mode="clip") > 0
        w = jnp.take(d["s4_words"], meg4 >> 5, mode="clip")
        hit = mvalid & (((w >> (meg4 & 31)) & 1) > 0)
        rank = jnp.take(
            d["s4_rank"], meg4 >> 5, mode="clip"
        ) + jax.lax.population_count(
            w & ((jnp.int32(1) << (meg4 & 31)) - 1)
        )
        off = jnp.take(d["bucket_off"], rank, mode="clip")
        end = jnp.take(d["bucket_off"], rank + 1, mode="clip")

        def g4_of(pos):
            def cc(q):
                return jnp.take(
                    cls_i8, jnp.clip(q, 0, n_valid - 1), mode="clip"
                ).astype(jnp.int32)

            return (
                ((cc(pos - 3) * K + cc(pos - 2)) * K + cc(pos - 1)) * K
                + cc(pos)
            )

        mb = max(bucket_max, 1)
        mdeep_flag = jnp.zeros((mbud, mb), jnp.int32)
        mdeep_ids = jnp.zeros((mbud, mb), jnp.int32)
        for t in range(bucket_max):
            ci = off + t
            live = hit & (ci < end)
            clv = jnp.take(d["cand_len"], ci, mode="clip")
            cs4 = jnp.take(d["cand_start4"], ci, mode="clip")
            cid = jnp.take(d["cand_id"], ci, mode="clip")
            sp = mep - clv + 4
            inb = live & (sp >= 3)
            okstart = inb & (g4_of(jnp.maximum(sp, 0)) == cs4)
            is4s = okstart & (clv == 4) & allow4
            counts = counts.at[jnp.where(is4s, cid, P)].add(1, mode="drop")
            isdeep = okstart & (clv >= 5)
            mdeep_flag = mdeep_flag.at[:, t].set(isdeep.astype(jnp.int32))
            mdeep_ids = mdeep_ids.at[:, t].set(cid)

        dbuf2, dtot2 = _compact(mdeep_flag.reshape(-1), _DEEP_BUDGET)
        dvalid2 = dbuf2 >= 0
        di2 = jnp.maximum(dbuf2, 0)
        deep_pos2 = jnp.where(
            dvalid2, jnp.take(mep, di2 // mb, mode="clip"), -1
        )
        deep_id2 = jnp.where(
            dvalid2, jnp.take(mdeep_ids.reshape(-1), di2, mode="clip"), -1
        )
        deep_pos = jnp.concatenate([deep_pos, deep_pos2])
        deep_id = jnp.concatenate([deep_id, deep_id2])
        dtot = dtot1 + dtot2
        idx = jnp.arange(deep_pos.shape[0], dtype=jnp.int32)
        take_from = jnp.where(idx < dtot1, idx, idx - dtot1 + _DEEP_BUDGET)
        deep_pos = jnp.take(deep_pos, take_from, mode="clip")
        deep_id = jnp.take(deep_id, take_from, mode="clip")
        deep_pos = jnp.where(idx < dtot, deep_pos, -1)[:_DEEP_BUDGET]
        deep_id = jnp.where(idx < dtot, deep_id, -1)[:_DEEP_BUDGET]

        c32 = counts[:P]
        # ONE fetched buffer: [hdr_lo(6) | hdr_hi(6) | counts16(P)] int16.
        # The relay costs ~25-50 ms PER round trip (PLAN.md), so the
        # totals from the flags jit, dtot, mtot, the counts-overflow flag
        # and the counts all ride one int16 array; deep pairs pack into
        # int64 and are fetched only when dtot > 0.
        ovf = (c32.max() >= (1 << 15)).astype(jnp.int32)
        hdr = jnp.stack(
            [totals3[0], totals3[1], totals3[2], dtot, mtot, ovf]
        )
        lo = (hdr & 0xFFFF).astype(jnp.int16)
        hi = ((hdr >> 16) & 0xFFFF).astype(jnp.int16)
        packed = jnp.concatenate([lo, hi, c32.astype(jnp.int16)])
        # deep pairs interleaved [pos0, id0, pos1, id1, ...]: one prefix
        # fetch of 2*dtot int32 when deep candidates exist
        deep_pairs = jnp.stack([deep_pos, deep_id], axis=1).reshape(-1)
        return c32, packed, deep_pairs

    return jax.jit(fn)


_FLAGS_CACHE: dict = {}
_POST_CACHE: dict = {}


def _pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def _true_rate(ft, ct, K: int) -> float:
    """Estimated TRUE candidate rate on uniform text: l4 pattern hits, real
    last-5-gram hits, plus the correlated deep-suffix pairs DAMPED by the
    stage-2 pair-key bloom (they no longer pass outright — round-5)."""
    k4 = float(K) ** 4
    k5 = float(K) ** 5
    # the suf/sufb pair correlation factor is measured: actual survivor
    # rate at the 100k-pattern bench dictionary is ~4.6x the independence
    # product (round-4 probe); 8x keeps headroom
    corr = 8.0 * ((ct.codes_suf.size / k4) * (ct.codes_sufb.size / k4))
    return (
        ct.codes_w4.size / k4
        + ct.codes_pair5.size / k5
        + corr * getattr(ft, "p5_joint", 1.0)
    )


def _fin_slots_for(ft, ct, K: int) -> int:
    """Per-tile final-survivor slots: sparse dictionaries (the 100k-text
    bench: ~3 survivors per 2048-tile) use the cheap minimum; dense-match
    dictionaries (small alphabets / short patterns, where true candidates
    are plentiful) scale up to _CAP so the engine still engages."""
    mu = (ft.fin_est + _true_rate(ft, ct, K)) * (_TILE + _OVERLAP)
    need = _pow2(int(mu + 5.0 * (mu**0.5) + 1))
    return max(_FIN, min(_CAP, need))


def _vbuf_budget(n_tiles: int, ft, ct, K: int, fin_slots: int) -> int:
    """Static size of the survivor assembly buffer: estimated final rate
    (measured bloom fp + true-candidate estimate) with 8x headroom, pow2 so
    the compiled program set stays bounded.  Slack here costs only scatter
    buffer bytes (unlike the verify budget, whose cost scales with it)."""
    m = n_tiles * fin_slots
    N = n_tiles * _TILE
    rate = ft.fin_est + _true_rate(ft, ct, K)
    return min(_pow2(m), max(1 << 15, _pow2(N * rate * 8)))


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


def _flags_run(compiled, ct, ft, full, N, staged):
    """Shared front half of the fused pipelines: pad/bucket the class
    stream, build or fetch the compiled flags program, dispatch it.
    Returns (posbuf, codebuf, totals_dev, cls_dev, K, Npad, fin_slots,
    vbuf, interp) — all device values still in flight."""
    import jax.numpy as jnp

    cap = max(getattr(ft, "cap", _CAP),
              compiled._cache.get("fused_cap", 0))
    tile = getattr(ft, "tile", _TILE)
    if tile != _TILE and (cap > 64 or _use_interpret()):
        # runtime cap escalation drops to the default tile; interpret
        # mode (CPU tests) keeps the small tile — the python-evaluated
        # kernel costs scale with tile width
        tile = _TILE
    # pad to a bucketed number of kernel tiles (class 0 tail cannot create
    # candidates that survive verification; bucketing bounds the set of
    # compiled flag programs at <= 25% padding waste)
    n_tiles = _bucket_tiles(-(-N // tile))
    Npad = n_tiles * tile
    K = compiled.num_classes
    # per-tile slot / buffer sizing: estimates, escalated (and remembered
    # on the automaton) when an input's true-match density overflows them
    fin_slots = max(
        _fin_slots_for(ft, ct, K), compiled._cache.get("fused_fin", 0)
    )
    vbuf = max(
        _vbuf_budget(n_tiles, ft, ct, K, fin_slots),
        min(_pow2(n_tiles * fin_slots),
            compiled._cache.get("fused_vbuf", 0)),
    )

    interp = _use_interpret()
    fkey = (K, ft.r1, ft.r4, ft.r2p, n_tiles, vbuf, fin_slots,
            ft.has5, ft.has_w4, interp, cap, tile)
    if fkey not in _FLAGS_CACHE:
        from ..utils.compile_cache import ensure_compile_cache

        ensure_compile_cache()
        _FLAGS_CACHE[fkey] = _make_flags_fn(*fkey)

    if staged is not None and int(staged.shape[0]) != Npad:
        staged = None  # caller staged for a different tile geometry
    if staged is not None:
        cls_dev = staged
    else:
        pad = np.zeros(Npad, np.int8)
        pad[:N] = full
        cls_dev = jnp.asarray(pad)

    ftd = ft.device_arrays()
    posbuf, codebuf, pvbufs, totals_dev = _FLAGS_CACHE[fkey](
        cls_dev, ftd["B1T"], ftd["W4T"], ftd["S2P"], ftd["S2W"]
    )
    return (posbuf, codebuf, pvbufs, totals_dev, cls_dev, K, Npad,
            fin_slots, vbuf, interp, cap)


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

    dev = ct.device_arrays()

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

    (posbuf, codebuf, pvbufs, totals_dev, cls_dev, K, Npad, fin_slots,
     vbuf, interp, cap) = _flags_run(compiled, ct, ft, full, N, staged)
    from .cascade import _DEEP_BUDGET

    # Verify sizing: the verify's cost scales with its budget (measured
    # ~436 ns/slot incl. slack), so size from the MEASURED survivor rate of
    # earlier calls on this automaton when available (bench reps and
    # chunked streaming hit this path), else the build-time estimate; the
    # speculative dispatch avoids a totals round trip, and a miss
    # re-dispatches once at the actual pow2-rounded count.
    rate_meas = compiled._cache.get("fused_rate")
    if rate_meas is not None:
        est = rate_meas * 1.05  # pow2 rounding supplies the real headroom
    else:
        est = (ft.fin_est + _true_rate(ft, ct, K)) * 4
    vbud = min(max(_pow2(int(est * Npad)), 1 << 13), vbuf)

    hv = build_hash_verify(compiled, ct)

    hv_dev = hv.device_arrays() if hv is not None else None

    def _verify_hash(vb):
        vkey = ("hash", K, max(ct.bucket_max, 1), hv.lgH, vb,
                ct.num_patterns, interp)
        if vkey not in _POST_CACHE:
            _POST_CACHE[vkey] = _make_post_verify_hash(*vkey[1:])
        return _POST_CACHE[vkey](
            posbuf[:vb], codebuf[:vb], pvbufs[0][:vb], totals_dev,
            cls_dev, np.int32(vstart), np.int32(N), dev, hv_dev,
        )

    def _verify_bucket(vb, two_phase=True):
        vkey = (K, max(ct.bucket_max, 1), vb, ct.num_patterns, interp,
                two_phase)
        if vkey not in _POST_CACHE:
            _POST_CACHE[vkey] = _make_post_verify(*vkey)
        return _POST_CACHE[vkey](
            posbuf[:vb], codebuf[:vb], cls_dev, np.int32(vstart),
            np.int32(N), dev
        )

    def _parse_packed(ph):
        hdr = (
            (ph[6:12].view(np.uint16).astype(np.int64) << 16)
            | ph[0:6].view(np.uint16).astype(np.int64)
        )
        return hdr, ph[12:]

    counts = deep64 = None
    dtot = 0
    if hv is not None:
        c32_dev, packed_dev, deep64_dev = _verify_hash(vbud)
        hdr, c16 = _parse_packed(np.asarray(packed_dev))  # ONE round trip
        totals = hdr[:3]
        dtot, mtot, ovf = int(hdr[3]), int(hdr[4]), int(hdr[5])
    else:
        counts32, counts16, deep_pos, deep_id, dtot_dev, mtot_dev = (
            _verify_bucket(vbud)
        )
        totals = np.asarray(totals_dev)
        dtot, mtot, ovf = -1, int(np.asarray(mtot_dev)), -1

    if totals[0] > cap or totals[1] > fin_slots or totals[2] > vbuf:
        if host_thread is not None:
            host_thread.join()
        # slot/buffer overflow: escalate (once per level, remembered on
        # the automaton) and re-run; stage-1 overflow beyond the _CAP
        # ceiling has no escalation — that automaton/input needs cascade
        retry = False
        if totals[0] > cap and cap < _CAP:
            compiled._cache["fused_cap"] = min(
                _pow2(int(totals[0]) * 2), _CAP
            )
            retry = True
        if totals[0] <= _CAP:
            if totals[1] > fin_slots and fin_slots < _CAP:
                compiled._cache["fused_fin"] = min(
                    _pow2(int(totals[1]) * 2), _CAP
                )
                retry = True
            if totals[2] > vbuf:
                nv = _pow2(int(totals[2]) * 2)
                if nv <= _pow2(n_tiles * _CAP):
                    compiled._cache["fused_vbuf"] = nv
                    retry = True
        if retry:
            return count_matches_fused(
                compiled, cls, halo, staged, short_on_host
            )
        return None  # slot/budget overflow: caller falls back (exactness)
    if totals[2] > 0:
        # a zero-candidate run (e.g. the all-zeros prewarm input) must not
        # poison the measured rate: it would shrink the next speculative
        # verify budget and force a re-dispatch on the first real corpus
        compiled._cache["fused_rate"] = max(
            float(totals[2]) / max(Npad, 1), rate_meas or 0.0
        )
    if totals[2] > vbud:
        # speculation too small (rare: rate far above the estimate) — run
        # the verify again at the actual pow2-rounded survivor count
        vbud = min(_pow2(max(int(totals[2]), 1 << 12)), vbuf)
        if hv is not None:
            c32_dev, packed_dev, deep64_dev = _verify_hash(vbud)
            hdr, c16 = _parse_packed(np.asarray(packed_dev))
            dtot, mtot, ovf = int(hdr[3]), int(hdr[4]), int(hdr[5])
        else:
            counts32, counts16, deep_pos, deep_id, dtot_dev, mtot_dev = (
                _verify_bucket(vbud)
            )
            mtot = int(np.asarray(mtot_dev))
    if mtot > max(vbud // 4, 1 << 10):
        # side list overflowed (adversarial bucket/cluster density): redo
        # with the flat single-phase bucket-walk program — exactness never
        # rides the fast path's occupancy assumption
        counts32, counts16, deep_pos, deep_id, dtot_dev, _ = (
            _verify_bucket(vbud, two_phase=False)
        )
        dtot, ovf = -1, -1

    if dtot < 0:  # bucket-walk path: separate fetches (rare)
        dtot = int(np.asarray(dtot_dev))
    if host_thread is not None:
        host_thread.join()

    if dtot > _DEEP_BUDGET:
        return None
    if ovf == 0:
        counts = c16.astype(np.int64)
    elif ovf > 0:
        counts = np.asarray(c32_dev).astype(np.int64)
    else:
        c16f = np.asarray(counts16)
        if c16f[-1]:
            counts = np.asarray(counts32).astype(np.int64)
        else:
            counts = c16f[:-1].astype(np.int64)
    totals = np.concatenate([np.asarray(totals), np.asarray([dtot])])

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
        if ovf >= 0:  # hash path: one interleaved prefix fetch
            dpair = np.asarray(deep64_dev[: 2 * ndeep]).astype(np.int64)
            dp = dpair[0::2]
            di = dpair[1::2]
        else:
            dp = np.asarray(deep_pos[:ndeep])
            di = np.asarray(deep_id[:ndeep])
        counts += _c._verify_deep_host(ct, full, vstart, dp, di)
    return counts


# ---------------------------------------------------------------------------
# emission support: the same flags pipeline, but the verify COLLECTS the
# confirmed (position, id) pairs — l==4 exactly on device, l>=5 flagged for
# the host text compare — instead of scattering counts.  cascade_emit.py
# merges these with the host short-length stream (the round-3 emit core
# still ran the v2-era XLA flags at ~6 ns/char; the fused kernel does the
# same candidate discovery at ~2.5).


def _make_post_verify_emit(K, bucket_max, vbud, P, interp):
    """jit: (posbuf_slice, codebuf_slice, cls_i8, vstart, n_valid, d) ->
    (pos4, id4, e4tot, deep_pos, deep_id, dtot)."""
    import jax
    import jax.numpy as jnp

    from .cascade import _DEEP_BUDGET, _bucket_verify, _compact

    e4bud = vbud  # confirmed l4 pairs are a subset of the candidates

    def fn(posbuf, codebuf, cls_i8, vstart, n_valid, d):
        counts = jnp.zeros((P + 1,), jnp.int32)
        ep = posbuf
        cval = (ep >= jnp.maximum(vstart, 3)) & (ep < n_valid)
        eg4 = codebuf

        def g4_of(pos):
            def cc(q):
                return jnp.take(
                    cls_i8, jnp.clip(q, 0, n_valid - 1), mode="clip"
                ).astype(jnp.int32)

            return (
                ((cc(pos - 3) * K + cc(pos - 2)) * K + cc(pos - 1)) * K
                + cc(pos)
            )

        counts, deep_flag, deep_ids, e4_flag = _bucket_verify(
            d, ep, eg4, cval, g4_of, counts, P, bucket_max, vbud
        )

        def expand(flag2d, ids2d, bud):
            buf, tot = _compact(flag2d.reshape(-1), bud)
            valid = buf >= 0
            bi = jnp.maximum(buf, 0)
            pos = jnp.where(
                valid, jnp.take(ep, bi // bucket_max, mode="clip"), -1
            )
            pid = jnp.where(
                valid, jnp.take(ids2d.reshape(-1), bi, mode="clip"), -1
            )
            return pos, pid, tot

        pos4, id4, e4tot = expand(e4_flag, deep_ids, e4bud)
        deep_pos, deep_id, dtot = expand(deep_flag, deep_ids, _DEEP_BUDGET)
        return pos4, id4, e4tot, deep_pos, deep_id, dtot

    return jax.jit(fn)


def _make_post_verify_emit_hash(K, bucket_max, lgH, vbud, P, interpret):
    """Hash-probe variant of the emission post: same phase-1 as the counts
    hash verify, but confirmed l==4 hits compact into (position, id) pairs
    and deep anchors into host-verify candidates.  Side list (probe
    clusters > 2 / multi-deep buckets) pays the classic bucket walk; its
    pair streams are spliced after phase 1's (the caller re-sorts into
    reference order, so intra-stream order is irrelevant)."""
    import jax
    import jax.numpy as jnp

    from .cascade import _DEEP_BUDGET, _compact

    mbud = max(vbud // 4, 1 << 10)
    H = 1 << lgH

    def fn(posbuf, codebuf, pv4, totals3, cls_i8, vstart, n_valid, d,
           hv):
        ep = posbuf
        cval = (ep >= jnp.maximum(vstart, 3)) & (ep < n_valid)
        eg4 = codebuf
        u = eg4.astype(jnp.uint32)
        h0 = ((u * jnp.uint32(_HM)) >> jnp.uint32(32 - lgH)).astype(
            jnp.int32
        )
        h1 = (h0 + 1) & (H - 1)
        k0 = jnp.take(hv["key"], h0, mode="clip")
        k1 = jnp.take(hv["key"], h1, mode="clip")
        m0 = k0 == eg4
        found = m0 | (k1 == eg4)
        hm = jnp.where(m0, h0, h1)
        meta = jnp.take(hv["meta"], hm, mode="clip")
        is4 = cval & found & (((meta >> 24) & 1) > 0)
        hasd = ((meta >> 25) & 1) > 0
        multi = ((meta >> 26) & 1) > 0
        d1 = jnp.take(hv["d1"], hm, mode="clip")
        anchor = d1 & 0xFFFFFF
        sel = d1 >> 24
        # lengths 5..7 start inside pv4's window: compare its low digits
        modm = jnp.where(sel == 1, K, jnp.where(sel == 2, K * K, K**3))
        pkv = jnp.where(sel <= 3, pv4 % modm, pv4)
        okd = cval & found & hasd & ~multi & (pkv == anchor)

        def compact_pairs(flag, ids_full, bud):
            buf, tot = _compact(flag.astype(jnp.int32), bud)
            valid = buf >= 0
            bi = jnp.maximum(buf, 0)
            p = jnp.where(valid, jnp.take(ep, bi, mode="clip"), -1)
            i = jnp.where(valid, jnp.take(ids_full, bi, mode="clip"), -1)
            return p, i, tot

        l4_ids = meta & 0xFFFFFF
        pos4, id4, e4tot1 = compact_pairs(is4, l4_ids, vbud)
        deep_ids1 = jnp.take(hv["d2"], hm, mode="clip")
        dp1, di1, dtot1 = compact_pairs(okd, deep_ids1, _DEEP_BUDGET)

        # ---- side list
        unresolved = cval & ~found & (k0 != -1) & (k1 != -1)
        sidefl = (unresolved | (cval & found & multi & hasd)).astype(
            jnp.int32
        )
        mbuf, mtot = _compact(sidefl, mbud)
        mvalid = mbuf >= 0
        mi = jnp.maximum(mbuf, 0)
        mep = jnp.take(ep, mi, mode="clip")
        meg4 = jnp.take(eg4, mi, mode="clip")
        allow4 = jnp.take(unresolved.astype(jnp.int32), mi, mode="clip") > 0
        w = jnp.take(d["s4_words"], meg4 >> 5, mode="clip")
        hit = mvalid & (((w >> (meg4 & 31)) & 1) > 0)
        rank = jnp.take(
            d["s4_rank"], meg4 >> 5, mode="clip"
        ) + jax.lax.population_count(
            w & ((jnp.int32(1) << (meg4 & 31)) - 1)
        )
        off = jnp.take(d["bucket_off"], rank, mode="clip")
        end = jnp.take(d["bucket_off"], rank + 1, mode="clip")

        def g4_of(pos):
            def cc(q):
                return jnp.take(
                    cls_i8, jnp.clip(q, 0, n_valid - 1), mode="clip"
                ).astype(jnp.int32)

            return (
                ((cc(pos - 3) * K + cc(pos - 2)) * K + cc(pos - 1)) * K
                + cc(pos)
            )

        mb = max(bucket_max, 1)
        me4_flag = jnp.zeros((mbud, mb), jnp.int32)
        mdeep_flag = jnp.zeros((mbud, mb), jnp.int32)
        mids = jnp.zeros((mbud, mb), jnp.int32)
        for t in range(bucket_max):
            ci = off + t
            live = hit & (ci < end)
            clv = jnp.take(d["cand_len"], ci, mode="clip")
            cs4 = jnp.take(d["cand_start4"], ci, mode="clip")
            cid = jnp.take(d["cand_id"], ci, mode="clip")
            sp = mep - clv + 4
            inb = live & (sp >= 3)
            okstart = inb & (g4_of(jnp.maximum(sp, 0)) == cs4)
            me4_flag = me4_flag.at[:, t].set(
                (okstart & (clv == 4) & allow4).astype(jnp.int32)
            )
            mdeep_flag = mdeep_flag.at[:, t].set(
                (okstart & (clv >= 5)).astype(jnp.int32)
            )
            mids = mids.at[:, t].set(cid)

        def expand_side(flag2d, bud):
            buf, tot = _compact(flag2d.reshape(-1), bud)
            valid = buf >= 0
            bi = jnp.maximum(buf, 0)
            p = jnp.where(
                valid, jnp.take(mep, bi // mb, mode="clip"), -1
            )
            i = jnp.where(
                valid, jnp.take(mids.reshape(-1), bi, mode="clip"), -1
            )
            return p, i, tot

        pos4s, id4s, e4tot2 = expand_side(me4_flag, vbud)
        dp2, di2, dtot2 = expand_side(mdeep_flag, _DEEP_BUDGET)

        def splice(p1, i1, t1, p2, i2, t2, bud):
            p = jnp.concatenate([p1, p2])
            i = jnp.concatenate([i1, i2])
            tot = t1 + t2
            idx = jnp.arange(p.shape[0], dtype=jnp.int32)
            take_from = jnp.where(idx < t1, idx, idx - t1 + bud)
            p = jnp.take(p, take_from, mode="clip")
            i = jnp.take(i, take_from, mode="clip")
            p = jnp.where(idx < tot, p, -1)[:bud]
            i = jnp.where(idx < tot, i, -1)[:bud]
            return p, i, tot

        pos4, id4, e4tot = splice(
            pos4, id4, e4tot1, pos4s, id4s, e4tot2, vbud
        )
        deep_pos, deep_id, dtot = splice(
            dp1, di1, dtot1, dp2, di2, dtot2, _DEEP_BUDGET
        )
        # ONE fetched buffer [hdr(6) | e4 pairs interleaved]: the relay
        # costs ~25-50 ms per round trip, so the caller speculatively
        # fetches the header plus a rate-sized pair prefix in one go;
        # deep pairs fetch on demand (usually empty)
        hdr = jnp.stack(
            [totals3[0], totals3[1], totals3[2], e4tot, dtot, mtot]
        )
        e4_pairs = jnp.stack([pos4, id4], axis=1).reshape(-1)
        deep_pairs = jnp.stack([deep_pos, deep_id], axis=1).reshape(-1)
        return jnp.concatenate([hdr, e4_pairs]), deep_pairs

    return jax.jit(fn)


def emit_candidates_fused(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: Optional[np.ndarray] = None,
    staged=None,
):
    """Confirmed deep-match pairs for emission, or None when gated.

    Returns (pos4 int64, id4 int64, deep_pos int64, deep_id int64) where
    (pos4, id4) are EXACT l==4 matches (device-verified) and the deep
    arrays are l>=5 candidates both of whose 4-gram anchors matched — the
    caller must text-compare them on the host (cascade._verify_deep_mask).
    Positions are indices into the halo-extended stream."""
    ct = _c.build_tables(compiled)
    if ct is None or not ct.has4:
        return None
    ft = build_fused_tables(compiled)
    if ft is None:
        return None

    if halo is not None and halo.size:
        H = max(int(compiled.longest_word), 1)
        h = halo[-H:]
        full = np.concatenate([h.astype(np.int32), cls])
        vstart = int(h.size)
    else:
        full = cls
        vstart = 0
    N = int(full.size)
    empty = np.empty(0, np.int64)
    if N == 0:
        return empty, empty, empty, empty

    dev = ct.device_arrays()
    (posbuf, codebuf, pvbufs, totals_dev, cls_dev, K, Npad, fin_slots,
     vbuf, interp, cap) = _flags_run(compiled, ct, ft, full, N, staged)
    from .cascade import _DEEP_BUDGET

    rate_meas = compiled._cache.get("fused_rate")
    if rate_meas is not None:
        est = rate_meas * 1.05
    else:
        est = (ft.fin_est + _true_rate(ft, ct, K)) * 4
    vbud = min(max(_pow2(int(est * Npad)), 1 << 13), vbuf)

    hv = build_hash_verify(compiled, ct)

    hv_dev = hv.device_arrays() if hv is not None else None

    def _verify_hash(vb):
        vkey = ("emit-hash", K, max(ct.bucket_max, 1), hv.lgH, vb,
                ct.num_patterns, interp)
        if vkey not in _POST_CACHE:
            _POST_CACHE[vkey] = _make_post_verify_emit_hash(*vkey[1:])
        return _POST_CACHE[vkey](
            posbuf[:vb], codebuf[:vb], pvbufs[0][:vb], totals_dev,
            cls_dev, np.int32(vstart), np.int32(N), dev, hv_dev,
        )

    def _verify_bucket(vb):
        vkey = ("emit", K, max(ct.bucket_max, 1), vb, ct.num_patterns,
                interp)
        if vkey not in _POST_CACHE:
            _POST_CACHE[vkey] = _make_post_verify_emit(*vkey[1:])
        return _POST_CACHE[vkey](
            posbuf[:vb], codebuf[:vb], cls_dev, np.int32(vstart),
            np.int32(N), dev
        )

    use_hash = hv is not None

    def _fetch_hash(hp_dev):
        # speculative single fetch: header + measured-rate e4 prefix
        e4rate = compiled._cache.get("fused_e4rate")
        spec = (
            _pow2(max(int(e4rate * Npad * 1.05), 1 << 10))
            if e4rate is not None
            else 1 << 12
        )
        buf = np.asarray(hp_dev[: 6 + 2 * min(spec, vbud)])
        return buf[:6], buf[6:]

    if use_hash:
        hp_dev, deep_pairs = _verify_hash(vbud)
        hdr, e4_buf = _fetch_hash(hp_dev)  # ONE round trip
        totals = hdr[:3]
        e4tot, dtot, mtot = int(hdr[3]), int(hdr[4]), int(hdr[5])
    else:
        out = _verify_bucket(vbud)
        totals = np.asarray(totals_dev)
        e4tot = dtot = mtot = -1
    if totals[0] > cap or totals[1] > fin_slots or totals[2] > vbuf:
        if totals[0] > cap and cap < _CAP:
            # remember the stage-1 slot need; the next call (e.g. the
            # caller's fallback retry) compiles with more slots
            compiled._cache["fused_cap"] = min(
                _pow2(int(totals[0]) * 2), _CAP
            )
        return None
    if totals[2] > 0:
        compiled._cache["fused_rate"] = max(
            float(totals[2]) / max(Npad, 1), rate_meas or 0.0
        )
    if totals[2] > vbud:
        vbud = min(_pow2(max(int(totals[2]), 1 << 12)), vbuf)
        if use_hash:
            hp_dev, deep_pairs = _verify_hash(vbud)
            hdr, e4_buf = _fetch_hash(hp_dev)
            e4tot, dtot, mtot = int(hdr[3]), int(hdr[4]), int(hdr[5])
        else:
            out = _verify_bucket(vbud)
    if use_hash and mtot > max(vbud // 4, 1 << 10):
        # hash side list overflowed: flat bucket-walk program instead
        use_hash = False
        out = _verify_bucket(vbud)
    if use_hash:
        if e4tot > vbud or dtot > _DEEP_BUDGET:
            return None
        compiled._cache["fused_e4rate"] = max(
            e4tot / max(Npad, 1), compiled._cache.get("fused_e4rate", 0.0)
        )
        if e4tot:
            if 2 * e4tot > e4_buf.size:
                # speculation short: fetch the full pow2-rounded prefix
                e4_buf = np.asarray(
                    hp_dev[6: 6 + 2 * _pow2(max(e4tot, 1))]
                )
            pair = e4_buf[: 2 * e4tot].astype(np.int64)
            p4, i4 = pair[0::2], pair[1::2]
        else:
            p4 = i4 = empty
        if dtot:
            pair = np.asarray(
                deep_pairs[: 2 * _pow2(max(dtot, 1))]
            )[: 2 * dtot].astype(np.int64)
            dp, di = pair[0::2], pair[1::2]
        else:
            dp = di = empty
        return p4, i4, dp, di

    pos4b, id4b, e4tot_dev, deep_pos, deep_id, dtot_dev = out
    e4tot = int(np.asarray(e4tot_dev))
    dtot = int(np.asarray(dtot_dev))
    if e4tot > vbud or dtot > _DEEP_BUDGET:
        return None
    if e4tot:
        p4 = np.asarray(pos4b[: _pow2(max(e4tot, 1))])[:e4tot].astype(
            np.int64
        )
        i4 = np.asarray(id4b[: _pow2(max(e4tot, 1))])[:e4tot].astype(
            np.int64
        )
    else:
        p4 = i4 = empty
    if dtot:
        dp = np.asarray(deep_pos[: _pow2(max(dtot, 1))])[:dtot].astype(
            np.int64
        )
        di = np.asarray(deep_id[: _pow2(max(dtot, 1))])[:dtot].astype(
            np.int64
        )
    else:
        dp = di = empty
    return p4, i4, dp, di
