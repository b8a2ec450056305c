"""Full ``(end_index, pattern_id)`` emission from the cascade pipeline.

The counting cascade (ops/cascade.py) proves which positions can hold
matches without a per-character DFA gather; this module extends it to the
reference's flagship semantics — ``iter()``/``find_all()`` emission of every
match tuple (reference src/AutomatonSearchIter.c:157-300) — still with no
DFA scan.  Work splits across host and device by what each is good at:

* **Lengths 1-3 on the host**, overlapped with the device windows: a match
  of length <= 3 is a 3-gram (2-gram, 1-gram) table hit, so one vectorized
  pass over ``id_lut[g_l]`` yields every short match exactly.  This mirrors
  the counting engine's hybrid histogram mode and keeps the (potentially
  millions of) short tuples off the device->host fetch path.
* **Lengths >= 4 on the device**: the counting machinery's bloom flags +
  3-level compaction + exact S4/start-4-gram verification, except that l==4
  confirmations compact into a (position, id) buffer instead of a counts
  scatter.  l >= 5 candidates (two matched 4-gram anchors) go to the host
  for the final full-text compare, as in counting.
* **Windowed execution**: inputs beyond ``_SEG`` chars run as fixed-shape
  windows (longest_word-char context + _SEG payload — exact by the halo
  property), so device memory is bounded and one compile serves any length.
* Reference emission order — end index ascending, longest pattern first at
  equal end (fail-chain order, reference src/AutomatonSearchIter.c:157-197)
  — is restored by one host lexsort on (position, -length): at a fixed end
  position all matching patterns are suffixes of one another, so descending
  length equals fail-chain order.

Budget overflow (match- or candidate-dense adversarial inputs) returns None
and the caller falls back to the classic engines, so results stay exact.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..compiler import CompiledAutomaton
from . import cascade as C


def _pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 1).bit_length()


class EmitTables:
    """Host id LUTs for the short lengths: K^l -> pattern id (or -1)."""

    def __init__(self, t: C.CascadeTables):
        K = t.K
        self.id_luts = [None, None, None]
        for ell in (1, 2, 3):
            codes = t.short_codes[ell - 1]
            if codes is None:
                continue
            lut = np.full(K**ell, -1, np.int32)
            lut[codes.astype(np.int64)] = t.short_ids[ell - 1]
            self.id_luts[ell - 1] = lut


def _emit_tables(compiled: CompiledAutomaton, t: C.CascadeTables) -> EmitTables:
    cache = compiled._cache
    if "cascade_emit" not in cache:
        cache["cascade_emit"] = EmitTables(t)
    return cache["cascade_emit"]


def _short_emit_host(et: EmitTables, K: int, full: np.ndarray, vstart: int):
    """Exact (end_position, id) pairs for lengths 1-3 via LUT scans, in
    reference order (end ascending, longest first at equal end)."""
    from .. import native

    lut1, lut2, lut3 = et.id_luts
    r = native.emit_short(full, K, vstart, lut1, lut2, lut3)
    if r is not None:
        return r[0], r[1].astype(np.int64)
    # numpy fallback: per-length vectorized LUT scans, then one lexsort back
    # into reference order (end ascending, longest first at equal end)
    c = np.asarray(full, np.int32)
    N = c.size
    parts = []  # (positions, ids, length)
    if lut1 is not None and N > vstart:
        ids = lut1[c[vstart:]]
        p = np.nonzero(ids >= 0)[0]
        parts.append((p + vstart, ids[p], 1))
    if lut2 is not None and N >= 2:
        g2 = c[1:] + K * c[:-1]  # g2[j] ends at j+1
        lo = max(vstart - 1, 0)
        ids = lut2[g2[lo:]]
        p = np.nonzero(ids >= 0)[0]
        parts.append((p + lo + 1, ids[p], 2))
    if lut3 is not None and N >= 3:
        g3 = c[2:] + K * c[1:-1] + K * K * c[:-2]  # g3[j] ends at j+2
        lo = max(vstart - 2, 0)
        ids = lut3[g3[lo:]]
        p = np.nonzero(ids >= 0)[0]
        parts.append((p + lo + 2, ids[p], 3))
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    pos = np.concatenate([p for p, _, _ in parts]).astype(np.int64)
    ids = np.concatenate([i for _, i, _ in parts]).astype(np.int64)
    lenkey = np.concatenate(
        [np.full(p.size, -ell, np.int64) for p, _, ell in parts]
    )
    order = np.lexsort((lenkey, pos))
    return pos[order], ids[order]


def _make_emit_core(
    K, has4, has5, wbits_w4, wbits_suf, bucket_max, bbud, sbud, cbud,
    e4bud, dbud,
):
    import jax
    import jax.numpy as jnp

    K2, K3 = K * K, K * K * K
    chunk = 1 << int(os.environ.get("PYAHOCORASICK_TPU_CHUNK_LOG2", 18))

    def core(cls_i8, valid_from, d):
        N = cls_i8.shape[0]
        cls = cls_i8.astype(jnp.int32)
        pos = jnp.arange(N, dtype=jnp.int32)
        c1 = jnp.pad(cls, (1, 0))[:N]
        c2 = jnp.pad(cls, (2, 0))[:N]
        c3 = jnp.pad(cls, (3, 0))[:N]
        g4 = c3 * K3 + c2 * K2 + c1 * K + cls
        vstart = valid_from.astype(jnp.int32)

        def flags_chunk(cg4):
            u = cg4.astype(jnp.uint32)
            fw = jnp.int32(1)
            for j, wb in enumerate(wbits_w4):
                fw = fw & C._bloom_bit(d[f"bw4_{j}"], u, C._MULTS[j], wb)
            packed = fw
            if has5:
                fs = jnp.int32(1)
                fb = jnp.int32(1)
                for j, wb in enumerate(wbits_suf):
                    fs = fs & C._bloom_bit(d[f"bsuf_{j}"], u, C._MULTS[j], wb)
                    fb = fb & C._bloom_bit(d[f"bsufb_{j}"], u, C._MULTS[j], wb)
                packed = packed | (fs << 1) | (fb << 2)
            return packed

        pad = (-N) % chunk
        packed = jax.lax.map(
            flags_chunk, jnp.pad(g4, (0, pad)).reshape(-1, chunk)
        ).reshape(-1)[:N]

        fw4 = packed & 1
        if has5:
            fsuf = (packed >> 1) & 1
            fb_prev = jnp.pad((packed >> 2) & 1, (1, 0))[:N]
            f5 = fsuf & fb_prev & (pos >= 4)
        else:
            f5 = jnp.zeros_like(fw4)
        flag = ((fw4 | f5) & (pos >= jnp.maximum(vstart, 3))).astype(jnp.int8)

        cbuf, (btot, stot, ctot) = _compact3_buf(flag, N, bbud, sbud, cbud)
        cvalid = cbuf >= 0
        ep = jnp.maximum(cbuf, 0)
        eg4 = jnp.take(g4, ep, mode="clip")
        w = jnp.take(d["s4_words"], eg4 >> 5, mode="clip")
        hit = cvalid & (((w >> (eg4 & 31)) & 1) > 0)
        rank = jnp.take(
            d["s4_rank"], eg4 >> 5, mode="clip"
        ) + jax.lax.population_count(w & ((jnp.int32(1) << (eg4 & 31)) - 1))
        off = jnp.take(d["bucket_off"], rank, mode="clip")
        end = jnp.take(d["bucket_off"], rank + 1, mode="clip")
        e4_flag = jnp.zeros((cbud, bucket_max), jnp.int32)
        deep_flag = jnp.zeros((cbud, bucket_max), jnp.int32)
        all_ids = jnp.zeros((cbud, bucket_max), jnp.int32)
        for t in range(bucket_max):
            ci = off + t
            live = hit & (ci < end)
            cl = jnp.take(d["cand_len"], ci, mode="clip")
            cs4 = jnp.take(d["cand_start4"], ci, mode="clip")
            cid = jnp.take(d["cand_id"], ci, mode="clip")
            sp4 = ep - cl + 4  # end of the match's first 4-gram
            inb = live & (sp4 >= 3)
            okstart = inb & (
                jnp.take(g4, jnp.maximum(sp4, 0), mode="clip") == cs4
            )
            e4_flag = e4_flag.at[:, t].set(
                (okstart & (cl == 4)).astype(jnp.int32)
            )
            deep_flag = deep_flag.at[:, t].set(
                (okstart & (cl >= 5)).astype(jnp.int32)
            )
            all_ids = all_ids.at[:, t].set(cid)

        def expand(flat_flag, bud):
            buf, tot = C._compact(flat_flag.reshape(-1), bud)
            valid = buf >= 0
            di = jnp.maximum(buf, 0)
            p = jnp.where(
                valid, jnp.take(ep, di // bucket_max, mode="clip"), -1
            )
            i = jnp.where(
                valid, jnp.take(all_ids.reshape(-1), di, mode="clip"), -1
            )
            return p, i, tot

        pos4, id4, e4tot = expand(e4_flag, e4bud)
        deep_pos, deep_id, dtot = expand(deep_flag, dbud)

        return (
            pos4, id4, deep_pos, deep_id,
            jnp.stack([btot, stot, ctot, e4tot, dtot]),
        )

    return jax.jit(core)


def _compact3_buf(flag, N, bbud, sbud, cbud):
    """3-level hierarchical compaction (see ops/cascade.py): 32-blocks ->
    8-blocks -> positions; every scatter runs over a budget-sized array."""
    import jax.numpy as jnp

    BLK = C._BLK
    padb = (-N) % BLK
    fpad = jnp.pad(flag, (0, padb))
    nblk = fpad.shape[0] // BLK
    f8 = fpad.reshape(nblk * 4, 8).max(axis=1)
    blk_any = f8.reshape(nblk, 4).max(axis=1).astype(jnp.int32)
    bbuf, btot = C._compact(blk_any, bbud)
    bvalid = bbuf >= 0
    s8pos = (
        jnp.maximum(bbuf, 0)[:, None] * 4
        + jnp.arange(4, dtype=jnp.int32)[None, :]
    )
    sflag = (
        jnp.take(f8, jnp.minimum(s8pos, nblk * 4 - 1), mode="clip").astype(
            jnp.int32
        )
        * bvalid[:, None]
    ).reshape(-1)
    sbuf, stot = C._compact(sflag, sbud)
    svalid = sbuf >= 0
    g8 = jnp.take(s8pos.reshape(-1), jnp.maximum(sbuf, 0), mode="clip")
    cpos = g8[:, None] * 8 + jnp.arange(8, dtype=jnp.int32)[None, :]
    cflag = (
        jnp.take(fpad, jnp.minimum(cpos, N - 1), mode="clip").astype(jnp.int32)
        * svalid[:, None]
        * (cpos < N)
    ).reshape(-1)
    cbuf, ctot = C._compact(cflag, cbud)
    ep = jnp.where(
        cbuf >= 0,
        jnp.take(cpos.reshape(-1), jnp.maximum(cbuf, 0), mode="clip"),
        -1,
    )
    return ep, (btot, stot, ctot)


_EMIT_CORE_CACHE: dict = {}


def _get_emit_core(key):
    if key not in _EMIT_CORE_CACHE:
        from ..utils.compile_cache import ensure_compile_cache

        ensure_compile_cache()
        _EMIT_CORE_CACHE[key] = _make_emit_core(*key)
    return _EMIT_CORE_CACHE[key]


def emit_matches_cascade(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: Optional[np.ndarray] = None,
    base: int = 0,
    staged=None,
):
    """(end_positions int64, pattern_ids int64) in reference emission order,
    or None when the cascade cannot run (gates / budget overflow) — the
    caller then uses the classic engine.  Exact by construction: short
    lengths are table lookups on host, l==4 is verified on device, l>=5 on
    host by full text compare.
    """
    t = C.build_tables(compiled)
    if t is None:
        return None
    import jax
    import jax.numpy as jnp

    if halo is not None and halo.size:
        H0 = max(int(compiled.longest_word), 1)
        h = halo[-H0:]
        full = np.concatenate([h.astype(np.int32), cls])
        vstart = int(h.size)
    else:
        full = cls
        vstart = 0
    N = int(full.size)
    if N == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)

    et = _emit_tables(compiled, t)
    wl = compiled.word_len

    # --- fused fast path: candidate discovery via the v5 Pallas kernel
    # (ops/fused.py) — one gridded dispatch instead of the windowed v2-era
    # XLA flags (~6 ns/char measured); short lengths overlap on the host
    if t.has4 and os.environ.get("PYAHOCORASICK_TPU_EMIT_FUSED", "1") != "0":
        from . import fused as F

        if F.build_fused_tables(compiled) is not None:
            import threading

            sbox = {}

            def _short():
                try:
                    if any(et.id_luts[i] is not None for i in range(3)):
                        sp, si = _short_emit_host(et, t.K, full, vstart)
                        sbox["r"] = (sp - vstart + base, si)
                    else:
                        sbox["r"] = (None, None)
                except BaseException as exc:  # noqa: BLE001
                    sbox["e"] = exc

            th = threading.Thread(target=_short)
            th.start()
            fstaged = staged
            if fstaged is not None:
                ftf = F.build_fused_tables(compiled)
                tile = getattr(ftf, "tile", F._TILE) if ftf else F._TILE
                exp = F._bucket_tiles(-(-N // tile)) * tile
                if int(fstaged.shape[0]) != exp:
                    fstaged = None  # caller staged an unpadded stream
            r = F.emit_candidates_fused(compiled, cls, halo, staged=fstaged)
            th.join()
            if "e" in sbox:
                raise sbox["e"]
            if r is not None:
                p4, i4, dp, di = r
                parts_pos = []
                parts_id = []
                if p4.size:
                    parts_pos.append(p4 - vstart + base)
                    parts_id.append(i4)
                if dp.size:
                    eq = C._verify_deep_mask(t, full, dp, di)
                    if eq.any():
                        parts_pos.append(dp[eq] - vstart + base)
                        parts_id.append(di[eq])
                spos, sids = sbox["r"]
                return _merge_reference_order(
                    parts_pos, parts_id, spos, sids, wl
                )
            # fused gated at runtime: fall through to the windowed core

    # --- windowing geometry (exact: any match fits in a longest_word span)
    SEG = 1 << int(os.environ.get("PYAHOCORASICK_TPU_SEG_LOG2", 26))
    H = max(int(compiled.longest_word), 1)
    if N > SEG + H and t.has4:
        prepend = H - vstart
        payload = N - vstart
        nwin = -(-payload // SEG)
        fullp = np.concatenate(
            [
                np.zeros(prepend, full.dtype),
                full,
                np.zeros(nwin * SEG - payload, full.dtype),
            ]
        )
        win_shape = H + SEG
    else:
        prepend = 0
        nwin = 1
        fullp = full
        win_shape = N

    # --- device budgets (per window; overflow -> None -> classic fallback)
    dev_parts = []
    if t.has4:
        small = win_shape <= (1 << 16)
        nblk = -(-win_shape // C._BLK)
        bbud = nblk if small else max(1 << 12, nblk >> 3)
        cbud = win_shape if small else max(1 << 12, win_shape >> 8)
        sbud = cbud
        e4bud = min(_pow2(2 * cbud), cbud * max(t.bucket_max, 1))
        dbud = C._DEEP_BUDGET
        key = (
            t.K, t.has4, t.has5, t.wbits_w4, t.wbits_suf,
            max(t.bucket_max, 1), bbud, sbud, cbud, e4bud, dbud,
        )
        core = _get_emit_core(key)
        dev = t.device_arrays()
        if staged is not None:
            fullp_dev = (
                staged
                if nwin == 1
                else jnp.pad(staged, (prepend, fullp.size - prepend - N))
            )
        else:
            fullp_dev = jnp.asarray(fullp.astype(np.int8))
        # dispatch every window asynchronously, then overlap host work
        for w in range(nwin):
            if nwin == 1:
                win_dev, wvstart, woff = fullp_dev, vstart, -vstart + base
            else:
                lo = w * SEG
                win_dev = jax.lax.slice(fullp_dev, (lo,), (lo + win_shape,))
                wvstart, woff = H, lo - H + base
            out = core(win_dev, np.int32(wvstart), dev)
            dev_parts.append((w, woff, out))

    # --- short matches on host, overlapped with the device windows
    spos = sids = None
    if any(et.id_luts[i] is not None for i in range(3)):
        spos, sids = _short_emit_host(et, t.K, full, vstart)
        spos = spos - vstart + base

    parts_pos = []
    parts_id = []
    for w, woff, out in dev_parts:
        pos4, id4, deep_pos, deep_id, totals = out
        totals = np.asarray(totals)
        btot, stot, ctot, e4tot, dtot = (int(x) for x in totals)
        if btot > bbud or stot > sbud or ctot > cbud or e4tot > e4bud or (
            dtot > dbud
        ):
            return None  # candidate-dense input: classic engine instead
        if e4tot:
            parts_pos.append(
                np.asarray(pos4[:e4tot]).astype(np.int64) + woff
            )
            parts_id.append(np.asarray(id4[:e4tot]).astype(np.int64))
        if dtot:
            dp = np.asarray(deep_pos[:dtot])
            di = np.asarray(deep_id[:dtot])
            if nwin == 1:
                wfull = fullp
            else:
                lo = w * SEG
                wfull = fullp[lo : lo + win_shape]
            eq = C._verify_deep_mask(t, wfull, dp, di)
            if eq.any():
                parts_pos.append(dp[eq].astype(np.int64) + woff)
                parts_id.append(di[eq].astype(np.int64))

    return _merge_reference_order(parts_pos, parts_id, spos, sids, wl)


def _merge_reference_order(parts_pos, parts_id, spos, sids, wl):
    """Merge the deep (l>=4) pair stream with the short stream into
    reference emission order: end ascending, longer pattern first at equal
    end (fail-chain order).  The short stream is already ordered; only the
    small deep stream is sorted, then a linear two-stream merge."""
    if parts_pos:
        pos_d = np.concatenate(parts_pos)
        id_d = np.concatenate(parts_id)
        lens_d = wl[id_d].astype(np.int64)
        order = np.lexsort((-lens_d, pos_d))
        pos_d, id_d = pos_d[order], id_d[order]
    else:
        pos_d = np.empty(0, np.int64)
        id_d = np.empty(0, np.int64)
    if spos is None or spos.size == 0:
        return pos_d, id_d
    if pos_d.size == 0:
        return spos.astype(np.int64), sids.astype(np.int64)
    ins = np.searchsorted(spos, pos_d, side="left") + np.arange(pos_d.size)
    total = spos.size + pos_d.size
    pos_all = np.empty(total, np.int64)
    id_all = np.empty(total, np.int64)
    mask = np.ones(total, bool)
    mask[ins] = False
    pos_all[ins] = pos_d
    id_all[ins] = id_d
    pos_all[mask] = spos
    id_all[mask] = sids
    return pos_all, id_all
