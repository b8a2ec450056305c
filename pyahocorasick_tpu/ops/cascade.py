"""N-gram suffix-membership cascade: per-pattern match counting without a
per-character DFA gather.

Motivation (PLAN.md hardware facts): the classic blocked DFA scan pays one
~8 ns XLA HBM gather per character; dense scatters cost ~7 ns/element too.
This engine restructures exact counting around ops TPUs are actually fast
at, with exactly ONE dense scatter (a histogram) on the whole input:

* Lengths 1-3: a match is a 3-gram (2-gram, 1-gram) equality, so all short
  counts come from ONE device histogram of 3-gram codes: counts of length-3
  patterns are direct bins, lengths 1-2 are marginals of the same histogram
  plus O(1) boundary corrections applied on the host.
* Lengths >= 4: a candidate end position must pass bloom filters fetched
  with the **bilinear MXU gather** (onehot(hi) @ W then row-dot onehot(lo),
  f32 HIGHEST precision — exact, ~0.55 ns/lookup, no gather instruction):
  two tables keyed by the 4-gram codes of length-4 words, and for lengths
  >= 5 three tables on the last-4-gram suffix AND three on the
  one-shifted suffix (the same bilinear output shifted by one position).
  The surviving flag rate is ~0.1% on non-adversarial corpora, which makes
  compaction affordable at *block* granularity (a scatter over N/32
  elements, not N).  Surviving candidates fetch their per-suffix pattern
  bucket (exact S4 bitmap + popcount rank) and each candidate (l,
  first-4-gram, id) is verified by comparing the 4-gram at the match start.
  l == 4 is thereby verified exactly on device; l >= 5 survivors (two
  4-gram anchors matched — vanishingly rare) are returned to the host,
  which compares the full pattern text exactly.
* Budget overflows (match- or candidate-dense adversarial inputs) make the
  engine return None and the caller falls back to the classic blocked DFA
  scan, so results are always exact.

Reference parity: per-pattern counts equal len(list(A.iter(s))) aggregated
by pattern — the reference's match semantics (src/AutomatonSearchIter.c:
157-197, every suffix word at every end position).  This module needs only
the *sparse* compiled automaton (no dense delta), so ``make_automaton``
stays cheap on huge dictionaries.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..compiler import CompiledAutomaton

# gates
_MAX_K = 64  # K^4 codes must stay well under 2^31; hist3 = K^3+1 bins
_MAX_BUCKET = 8  # max patterns sharing a last-4-gram before we bail
# Each f32 bloom table is one (128,128) bilinear table = 16384 words; f32
# round-trips integers exactly up to 2^24, so each word packs 24 bloom bits
# (393216 bits/table).  Small families use bf16 tables instead: same 16384
# words but only 8 exact bits each (131072 bits) at 1/3 the MXU passes —
# the probed roofline is ~790k bloom-bits/ns for BOTH dtypes
# (tools/probe_mxu.py: f32-HIGHEST 0.51 ns, bf16 0.17 ns per 128x128 fetch),
# so dtype choice is purely a table-granularity knob.
_BLOOM_WORDS = 1 << 14
_BLOOM_WBITS = 24
_BLOOM_WBITS_BF16 = 8
_DEEP_BUDGET = 1 << 14  # device->host candidate budget for l>=5
_BLK = 32  # block size for hierarchical candidate compaction

_MULTS = (0x9E3779B1, 0x85EBCA77, 0xC2B2AE35)

# joint (last4, shifted-last4) pair key: odd multiplier so the mix is a
# bijection of last4 for each fixed last4b (wrapping uint32); mirrored by
# the device in ops/fused.py stage 2
_C5 = 0x9E3779B9


def _mix_pair(last4: np.ndarray, last4b: np.ndarray) -> np.ndarray:
    return (
        (last4.astype(np.uint64) * np.uint64(_C5)
         + last4b.astype(np.uint64))
        & np.uint64(0xFFFFFFFF)
    ).astype(np.int64)


def _bloom_tables(
    codes: np.ndarray, wbits_list: tuple = (_BLOOM_WBITS,) * 2
) -> list:
    # hash -> (word, bit): 14 high hash bits pick the word; the bit is a
    # uniform modulo of the next hash bits (a biased mapping like (b*24)>>5
    # doubles the fill rate on half the bits and measurably raises the
    # false-positive rate).  Host/device mirrored (_bloom_bit).
    tabs = []
    for mult, wbits in zip(_MULTS, wbits_list):
        h = (codes.astype(np.uint64) * mult) & 0xFFFFFFFF
        widx = ((h >> 18) & (_BLOOM_WORDS - 1)).astype(np.int64)
        bit = ((h & 8191) % wbits).astype(np.int64)  # bits disjoint from widx
        bb = np.zeros(_BLOOM_WORDS, dtype=np.int64)
        np.bitwise_or.at(bb, widx, np.int64(1) << bit)
        tabs.append(_to_bilinear(bb, wbits))
    return tabs


def _to_bilinear(words: np.ndarray, wbits: int = _BLOOM_WBITS) -> np.ndarray:
    """Pack <=16384 words into a (128,128) bilinear table.

    wbits <= 8 packs into bf16 (exact to 2^8, 1 MXU pass at HIGHEST);
    wbits <= 24 packs into f32 (exact to 2^24, 3 bf16 passes)."""
    assert words.size <= 16384, words.size
    assert words.size == 0 or int(words.max()) < (1 << wbits)
    if wbits <= _BLOOM_WBITS_BF16:
        try:
            import jax.numpy as jnp

            dt = jnp.bfloat16
        except ImportError:  # numpy-only environments: f32 is always exact
            dt = np.float32
        tab = np.zeros(16384, dt)
    else:
        tab = np.zeros(16384, np.float32)
    tab[: words.size] = words.astype(tab.dtype)
    return tab.reshape(128, 128)


class CascadeTables:
    """Host-side numpy tables; device copies cached per automaton."""

    def __init__(self, compiled: CompiledAutomaton):
        self.ok = False
        K = compiled.num_classes
        self.K = K
        if K > _MAX_K or compiled.num_states <= 1:
            return
        depth = compiled.depth
        word_id = compiled.word_id
        edge_cls = compiled.edge_cls
        parent = compiled.parent.astype(np.int64)
        P = compiled.num_patterns
        if P == 0:
            return

        # per-state g-codes up to depth 4 (BFS order: parents precede children)
        ls = compiled.level_starts
        S = compiled.num_states
        g = np.zeros(S, dtype=np.int64)
        for d in range(1, len(ls) - 1):
            lo, hi = int(ls[d]), int(ls[d + 1])
            if d <= 4:
                g[lo:hi] = g[parent[lo:hi]] * K + edge_cls[lo:hi]

        # short words (l <= 3): histogram bins + host boundary-fix maps
        self.short_codes = [None, None, None]  # g-codes per length
        self.short_ids = [None, None, None]
        self.short_maps = [None, None, None]  # host dict code -> id
        for ell in (1, 2, 3):
            eidx = np.nonzero((word_id >= 0) & (depth == ell))[0]
            if eidx.size == 0:
                continue
            codes = g[eidx].astype(np.int64)
            self.short_codes[ell - 1] = codes.astype(np.int32)
            self.short_ids[ell - 1] = word_id[eidx]
            self.short_maps[ell - 1] = dict(
                zip(codes.tolist(), word_id[eidx].tolist())
            )
        self.has = [self.short_codes[i] is not None for i in range(3)]

        # deep patterns (l >= 4): last-4-gram buckets
        didx = np.nonzero((word_id >= 0) & (depth >= 4))[0]
        self.has4 = didx.size > 0
        self.bucket_off = np.zeros(1, np.int32)
        self.bucket_keys = np.zeros(0, np.int64)
        self.cand_len = self.cand_start4 = self.cand_id = np.zeros(0, np.int32)
        self.cand_anchor9 = np.zeros(0, np.int32)
        self.s4_words = np.zeros(1, np.int32)
        self.s4_rank = np.zeros(1, np.int32)
        # bloom configs: (wbits per hash table); 24 -> f32 table (393k bits,
        # ~0.51 ns/lookup), 8 -> bf16 table (131k bits, ~0.17 ns/lookup).
        # w4 holds few entries (length-4 words only) so two cheap bf16
        # tables suffice; suf/sufb get two f32 + one bf16 — joint FP for the
        # suf&sufb AND ~0.05% at 100k patterns, at 2.7 ns/char total vs the
        # round-1 config's 4.4 ns (six f32 tables).
        self.wbits_w4 = (8, 8)
        self.wbits_suf = (24, 24, 8)
        zero_bloom = _to_bilinear(np.zeros(1, np.int64))
        zero_bloom8 = _to_bilinear(np.zeros(1, np.int64), _BLOOM_WBITS_BF16)
        self.ksuf = len(self.wbits_suf)
        self.bw4 = [zero_bloom8] * len(self.wbits_w4)
        self.bsuf = [
            zero_bloom if w > 8 else zero_bloom8 for w in self.wbits_suf
        ]
        self.bsufb = list(self.bsuf)
        self.deep_cls = np.zeros((0, 0), np.int32)
        self.deep_len = np.zeros(0, np.int32)
        self.deep_id_of_row = np.zeros(0, np.int32)
        self.bucket_max = 0
        self.has5 = False
        # raw code sets, kept for the fused Pallas flag kernel (ops/fused.py)
        self.codes_w4 = np.zeros(0, np.int64)
        self.codes_suf = np.zeros(0, np.int64)
        self.codes_sufb = np.zeros(0, np.int64)
        self.codes_pair5 = np.zeros(0, np.int64)
        if self.has4:
            # last-4 / shifted-last-4 grams by ascending the parent chain
            lens = depth[didx].astype(np.int64)
            chain = didx.copy()
            tails = []  # edge classes from the end: l-1, l-2, ...
            for _ in range(8):
                tails.append(edge_cls[chain].astype(np.int64))
                chain = parent[chain]
            last4 = tails[0] + K * (
                tails[1] + K * (tails[2] + K * tails[3])
            )
            last4b = tails[1] + K * (
                tails[2] + K * (tails[3] + K * tails[4])
            )  # only meaningful for l >= 5
            # 4-gram ending 4 before the pattern end (chars l-8..l-5):
            # the hash verify's terminal-8 anchor for lengths >= 9
            # (garbage for l < 8 — only consumed where cand_len >= 9)
            anchor9 = tails[4] + K * (
                tails[5] + K * (tails[6] + K * tails[7])
            )
            # first4: ascend to depth 4 then take that state's g-code
            cur = didx.copy()
            rem = lens - 4
            for _ in range(max(int(lens.max()) - 4, 0)):
                step = rem > 0
                cur = np.where(step, parent[cur], cur)
                rem -= step
            first4 = g[cur]

            order = np.argsort(last4, kind="stable")
            last4_s = last4[order]
            uniq, start = np.unique(last4_s, return_index=True)
            sizes = np.diff(np.append(start, last4_s.size))
            if int(sizes.max()) > _MAX_BUCKET:
                return
            self.bucket_max = int(sizes.max())
            self.bucket_off = np.append(start, last4_s.size).astype(np.int32)
            self.bucket_keys = uniq.astype(np.int64)  # sorted distinct last4
            self.cand_len = lens[order].astype(np.int32)
            self.cand_start4 = first4[order].astype(np.int32)
            self.cand_id = word_id[didx][order]
            self.cand_anchor9 = anchor9[order].astype(np.int32)

            # exact S4 bitmap over K^4 + rank prefix (popcount bucket index)
            space4 = K**4
            words = np.zeros((space4 + 31) // 32, dtype=np.int64)
            np.bitwise_or.at(words, uniq >> 5, np.int64(1) << (uniq & 31))
            self.s4_words = words.astype(np.uint32).view(np.int32)
            pops = np.unpackbits(
                words.astype(np.uint32).view(np.uint8).reshape(-1, 4),
                axis=1, bitorder="little",
            ).sum(axis=1)
            rank = np.zeros(words.size, np.int64)
            np.cumsum(pops[:-1], out=rank[1:])
            self.s4_rank = rank.astype(np.int32)

            # blooms: W4 (exact-4 words, few entries -> cheap bf16 tables),
            # and for l>=5 the suffix pair.  k=2 hash tables per family keeps
            # the joint suf&sufb false-positive rate ~(n/m)^4 well under the
            # compaction budget for n <= _K3_ENTRIES; denser dictionaries get
            # a third table instead of overflowing into the classic engine.
            w4 = np.unique(last4[lens == 4])
            self.codes_w4 = w4
            if w4.size:
                self.bw4 = _bloom_tables(w4, self.wbits_w4)
            deep = lens >= 5
            self.has5 = bool(deep.any())
            if self.has5:
                suf_u = np.unique(last4[deep])
                sufb_u = np.unique(last4b[deep])
                self.codes_suf = suf_u
                self.codes_sufb = sufb_u
                # joint last-5-gram keys: a TRUE deep match has
                # (g4(i), g4(i-1)) equal to some pattern's
                # (last4, shifted-last4) PAIR — testing the pair kills the
                # correlated suf x sufb survivors (~1e-3/char measured on
                # the bench dictionary) that independent membership lets
                # through, roughly halving the verify load (round-5)
                self.codes_pair5 = np.unique(
                    _mix_pair(last4[deep], last4b[deep])
                )
                self.ksuf = len(self.wbits_suf)
                self.bsuf = _bloom_tables(suf_u, self.wbits_suf)
                self.bsufb = _bloom_tables(sufb_u, self.wbits_suf)

            # host verify data for l >= 5: padded class matrices
            vidx = didx[depth[didx] >= 5]
            if vidx.size:
                vl = depth[vidx]
                L = int(vl.max())
                mat = np.zeros((vidx.size, L), np.int32)
                cur = vidx.copy()
                for t in range(L):
                    rows = np.nonzero(vl > t)[0]
                    mat[rows, vl[rows] - 1 - t] = edge_cls[cur[rows]]
                    cur[rows] = parent[cur[rows]]
                self.deep_cls = mat
                self.deep_len = vl.astype(np.int32)
                rowmap = np.full(P, -1, np.int32)
                rowmap[word_id[vidx]] = np.arange(vidx.size, dtype=np.int32)
                self.deep_id_of_row = rowmap

        self.num_patterns = P
        self.ok = True

    # device-array pytree (built lazily)
    def device_arrays(self):
        import jax.numpy as jnp

        if not hasattr(self, "_dev"):
            z = np.zeros(1, np.int32)
            self._dev = dict(
                sc1=jnp.asarray(self.short_codes[0] if self.has[0] else z),
                si1=jnp.asarray(self.short_ids[0] if self.has[0] else z),
                sc2=jnp.asarray(self.short_codes[1] if self.has[1] else z),
                si2=jnp.asarray(self.short_ids[1] if self.has[1] else z),
                sc3=jnp.asarray(self.short_codes[2] if self.has[2] else z),
                si3=jnp.asarray(self.short_ids[2] if self.has[2] else z),
                bw4_0=jnp.asarray(self.bw4[0]),
                bw4_1=jnp.asarray(self.bw4[1]),
                **{
                    f"bsuf_{j}": jnp.asarray(self.bsuf[j])
                    for j in range(len(self.bsuf))
                },
                **{
                    f"bsufb_{j}": jnp.asarray(self.bsufb[j])
                    for j in range(len(self.bsufb))
                },
                s4_words=jnp.asarray(self.s4_words),
                s4_rank=jnp.asarray(self.s4_rank),
                bucket_off=jnp.asarray(self.bucket_off),
                cand_len=jnp.asarray(self.cand_len),
                cand_start4=jnp.asarray(self.cand_start4),
                cand_id=jnp.asarray(self.cand_id),
            )
        return self._dev


def build_tables(compiled: CompiledAutomaton) -> Optional[CascadeTables]:
    cache = compiled._cache
    if "cascade" not in cache:
        try:
            t = CascadeTables(compiled)
        except MemoryError:
            t = None
        cache["cascade"] = t if (t is not None and t.ok) else None
    return cache["cascade"]


# ---------------------------------------------------------------------------
# device pipeline


def _bilinear_word(tab, idx):
    """Exact fetch of packed words from an (R, 128) bilinear table (MXU).

    Exactness is load-bearing: f32 round-trips integers up to 2**24 (bf16
    tables up to 2**8), and the dot runs at ``Precision.HIGHEST`` with f32
    accumulation so no intermediate drops mantissa bits (``_to_bilinear``
    asserts the packing invariant on the host side).  Cost scales with the
    table size (2*R*128 flops per lookup), so keep R minimal."""
    import jax
    import jax.numpy as jnp

    R = tab.shape[0]
    a = idx >> 7
    b = idx & 127
    iota_r = jnp.arange(R, dtype=jnp.int32)
    oh_a = (a[:, None] == iota_r[None, :]).astype(tab.dtype)
    r = jax.lax.dot_general(
        oh_a, tab, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    iota_c = jnp.arange(128, dtype=jnp.int32)
    oh_b = b[:, None] == iota_c[None, :]
    return jnp.where(oh_b, r, 0.0).sum(axis=1).astype(jnp.int32)


def _bloom_bit(tab, g4u, mult, wbits=_BLOOM_WBITS):
    import jax.numpy as jnp

    h = g4u * jnp.uint32(mult)
    widx = ((h >> 18) & (_BLOOM_WORDS - 1)).astype(jnp.int32)
    bit = (h & 8191).astype(jnp.int32) % wbits
    return (_bilinear_word(tab, widx) >> bit) & 1


def _bucket_verify(d, ep, eg4, cvalid, g4, counts, P, bucket_max, cbud):
    """Exact S4-bitmap membership + per-bucket verification of candidate end
    positions (shared by the cascade cores): l==4 candidates are counted
    exactly on device; l>=5 survivors are flagged for host text compare.

    Returns (counts, deep_flag[cbud, bucket_max], deep_ids[...],
    e4_flag[cbud, bucket_max]): e4_flag marks EXACT l==4 confirmations so
    emission callers can compact (position, id) pairs; counts callers let
    XLA dead-code-eliminate it."""
    import jax
    import jax.numpy as jnp

    w = jnp.take(d["s4_words"], eg4 >> 5, mode="clip")
    hit = cvalid & (((w >> (eg4 & 31)) & 1) > 0)
    rank = jnp.take(
        d["s4_rank"], eg4 >> 5, mode="clip"
    ) + jax.lax.population_count(
        w & ((jnp.int32(1) << (eg4 & 31)) - 1)
    )
    off = jnp.take(d["bucket_off"], rank, mode="clip")
    end = jnp.take(d["bucket_off"], rank + 1, mode="clip")
    deep_flag = jnp.zeros((cbud, bucket_max), jnp.int32)
    deep_ids = jnp.zeros((cbud, bucket_max), jnp.int32)
    e4_flag = jnp.zeros((cbud, bucket_max), jnp.int32)
    for t in range(bucket_max):
        ci = off + t
        live = hit & (ci < end)
        cl = jnp.take(d["cand_len"], ci, mode="clip")
        cs4 = jnp.take(d["cand_start4"], ci, mode="clip")
        cid = jnp.take(d["cand_id"], ci, mode="clip")
        sp = ep - cl + 4  # end of the match's first 4-gram
        inb = live & (sp >= 3)
        # g4 may be the materialized code array or a position->code callable
        # (the fused v4 kernel builds g4 in-kernel and never materializes the
        # full stream; its verify recomputes codes from 4 cls gathers)
        g4v = (
            g4(jnp.maximum(sp, 0))
            if callable(g4)
            else jnp.take(g4, jnp.maximum(sp, 0), mode="clip")
        )
        okstart = inb & (g4v == cs4)
        is4 = okstart & (cl == 4)
        counts = counts.at[jnp.where(is4, cid, P)].add(1, mode="drop")
        isdeep = okstart & (cl >= 5)
        deep_flag = deep_flag.at[:, t].set(isdeep.astype(jnp.int32))
        deep_ids = deep_ids.at[:, t].set(cid)
        e4_flag = e4_flag.at[:, t].set(is4.astype(jnp.int32))
    return counts, deep_flag, deep_ids, e4_flag


def _compact(flags_i32, budget):
    """positions of set flags, padded with -1; returns (buf, total)."""
    import jax.numpy as jnp

    csum = jnp.cumsum(flags_i32)
    total = csum[-1]
    slot = jnp.where(flags_i32 > 0, csum - 1, budget)
    buf = jnp.full((budget + 1,), -1, jnp.int32)
    pos = jnp.arange(flags_i32.shape[0], dtype=jnp.int32)
    buf = buf.at[jnp.minimum(slot, budget)].set(
        jnp.where(flags_i32 > 0, pos, -1)
    )
    return buf[:budget], total


def _make_core(
    K, has, has4, has5, wbits_w4, wbits_suf, bucket_max, bbud, sbud, cbud, P
):
    # has may be all-False when the caller computes short counts host-side
    import jax
    import jax.numpy as jnp

    K2, K3 = K * K, K * K * K
    # chunking bounds the (chunk, 128) onehot intermediates of the bloom
    # fetches (2^18 -> ~128 MB per live buffer)
    chunk = 1 << int(os.environ.get("PYAHOCORASICK_TPU_CHUNK_LOG2", 18))
    has1, has2, has3 = has

    def core(cls_i8, valid_from, d):
        N = cls_i8.shape[0]
        cls = cls_i8.astype(jnp.int32)
        pos = jnp.arange(N, dtype=jnp.int32)
        c1 = jnp.pad(cls, (1, 0))[:N]
        c2 = jnp.pad(cls, (2, 0))[:N]
        c3 = jnp.pad(cls, (3, 0))[:N]
        g3 = c2 * K2 + c1 * K + cls
        g4 = c3 * K3 + g3
        vstart = valid_from.astype(jnp.int32)

        counts = jnp.zeros((P + 1,), jnp.int32)

        # --- short lengths: ONE dense histogram of 3-gram codes
        if has1 or has2 or has3:
            gm = jnp.where(
                pos >= jnp.maximum(vstart, 2), g3, jnp.int32(K3)
            )
            hist = jnp.zeros((K3 + 1,), jnp.int32).at[gm].add(
                1, mode="drop"
            )[:K3]
            if has3:
                counts = counts.at[d["si3"]].add(
                    jnp.take(hist, d["sc3"], mode="clip")
                )
            if has2:
                hist2 = hist.reshape(K, K2).sum(axis=0)
                counts = counts.at[d["si2"]].add(
                    jnp.take(hist2, d["sc2"], mode="clip")
                )
            if has1:
                hist1 = hist.reshape(K2, K).sum(axis=0)
                counts = counts.at[d["si1"]].add(
                    jnp.take(hist1, d["sc1"], mode="clip")
                )

        deep_pos = jnp.full((_DEEP_BUDGET,), -1, jnp.int32)
        deep_id = jnp.full((_DEEP_BUDGET,), -1, jnp.int32)
        dtot = jnp.int32(0)
        btot = jnp.int32(0)
        stot = jnp.int32(0)
        ctot = jnp.int32(0)
        if has4:
            # --- dense flags via chunked bilinear bloom fetches
            pad = (-N) % chunk

            def flags_chunk(cg4):
                u = cg4.astype(jnp.uint32)
                fw = jnp.int32(1)
                for j, wb in enumerate(wbits_w4):
                    fw = fw & _bloom_bit(d[f"bw4_{j}"], u, _MULTS[j], wb)
                if has5:
                    fs = jnp.int32(1)
                    fb = jnp.int32(1)
                    for j, wb in enumerate(wbits_suf):
                        fs = fs & _bloom_bit(d[f"bsuf_{j}"], u, _MULTS[j], wb)
                        fb = fb & _bloom_bit(d[f"bsufb_{j}"], u, _MULTS[j], wb)
                else:
                    fs = jnp.zeros_like(cg4)
                    fb = jnp.zeros_like(cg4)
                return fw | (fs << 1) | (fb << 2)

            packed = jax.lax.map(
                flags_chunk, jnp.pad(g4, (0, pad)).reshape(-1, chunk)
            ).reshape(-1)[:N]
            fw4 = packed & 1
            if has5:
                # suffix blooms at i AND shifted-suffix blooms at i-1
                fsuf = (packed >> 1) & 1
                fb_prev = jnp.pad((packed >> 2) & 1, (1, 0))[:N]
                f5 = fsuf & fb_prev & (pos >= 4)
            else:
                f5 = jnp.zeros_like(fw4)
            flag = (
                (fw4 | f5)
                & (pos >= jnp.maximum(vstart, 3))
            ).astype(jnp.int8)

            # --- 3-level hierarchical compaction: 32-blocks -> 8-blocks ->
            # positions.  XLA scatters cost ~7.5 ns/source-element, so each
            # level's compaction must run over a budget-sized array, never a
            # N-proportional one: level-1 scatters N/32, level-2 bbud*4,
            # level-3 sbud*8 (sbud = cbud; a live 8-block implies >= 1
            # candidate so the count can never exceed ctot <= cbud).
            padb = (-N) % _BLK
            fpad = jnp.pad(flag, (0, padb))
            nblk = fpad.shape[0] // _BLK
            f8 = fpad.reshape(nblk * 4, 8).max(axis=1)  # any per 8-chars
            blk_any = f8.reshape(nblk, 4).max(axis=1).astype(jnp.int32)
            bbuf, btot = _compact(blk_any, bbud)
            bvalid = bbuf >= 0
            s8pos = (
                jnp.maximum(bbuf, 0)[:, None] * 4
                + jnp.arange(4, dtype=jnp.int32)[None, :]
            )  # (bbud, 4) indices into f8
            sflag = (
                jnp.take(f8, jnp.minimum(s8pos, nblk * 4 - 1), mode="clip")
                .astype(jnp.int32)
                * bvalid[:, None]
            ).reshape(-1)
            sbuf, stot = _compact(sflag, sbud)
            svalid = sbuf >= 0
            g8 = jnp.take(
                s8pos.reshape(-1), jnp.maximum(sbuf, 0), mode="clip"
            )  # live 8-block global index
            cpos = (
                g8[:, None] * 8 + jnp.arange(8, dtype=jnp.int32)[None, :]
            )  # (sbud, 8) absolute char positions
            cflag = (
                jnp.take(fpad, jnp.minimum(cpos, N - 1), mode="clip")
                .astype(jnp.int32)
                * svalid[:, None]
                * (cpos < N)
            ).reshape(-1)
            cbuf, ctot = _compact(cflag, cbud)
            cvalid = cbuf >= 0
            ep = jnp.take(
                cpos.reshape(-1), jnp.maximum(cbuf, 0), mode="clip"
            )  # candidate end positions
            eg4 = jnp.take(g4, ep, mode="clip")

            # --- exact S4 membership + bucket rank via popcount
            counts, deep_flag, deep_ids, _ = _bucket_verify(
                d, ep, eg4, cvalid, g4, counts, P, bucket_max, cbud
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

    return jax.jit(core)


_CORE_CACHE: dict = {}


def _get_core(key):
    if key not in _CORE_CACHE:
        from ..utils.compile_cache import ensure_compile_cache

        ensure_compile_cache()
        _CORE_CACHE[key] = _make_core(*key)
    return _CORE_CACHE[key]


def count_matches_cascade(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: Optional[np.ndarray] = None,
    staged=None,
    short_on_host: bool = False,
) -> Optional[np.ndarray]:
    """Per-pattern int64 counts, or None if the cascade cannot run (gates,
    budget overflow).  Exact: every device-side shortcut is either exact or
    re-verified, and overflow falls back to the caller's classic engine.

    ``staged`` may carry a pre-uploaded device int8 class array (bench use).
    ``short_on_host`` moves the l<=3 histogram to a host thread running
    concurrently with the device flag pipeline — the host pass is O(text)
    with a dictionary-independent constant, so it overlaps the device work
    entirely on large inputs (and avoids the device's ~7 ns/char scatter).
    """
    t = build_tables(compiled)
    if t is None:
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

    # budgets: full coverage for small inputs; ~2x expected sparse rates for
    # big ones — overflow means a candidate-dense corpus, where the classic
    # engine is the right tool anyway (the caller falls back on None).
    small = N <= (1 << 16)
    nblk = -(-N // _BLK)
    bbud = nblk if small else max(1 << 12, nblk >> 3)
    cbud = N if small else max(1 << 12, N >> 8)
    sbud = cbud  # a live 8-block contains >= 1 candidate, so stot <= ctot
    any_short = any(t.has)
    host_short = short_on_host and any_short
    has_dev = (False, False, False) if host_short else tuple(t.has)
    key = (
        t.K, has_dev, t.has4, t.has5, t.wbits_w4, t.wbits_suf,
        max(t.bucket_max, 1), bbud, sbud, cbud, t.num_patterns,
    )
    core = _get_core(key)
    dev = t.device_arrays()
    if staged is not None:
        cls_dev = staged
    else:
        cls_dev = jnp.asarray(full.astype(np.int8))

    host_thread = None
    host_box = {}
    if host_short:
        import threading

        def _host_hist():
            try:
                host_box["counts"] = _short_counts_host(t, full, vstart)
            except BaseException as exc:  # noqa: BLE001 — recompute on main
                host_box["error"] = exc

        host_thread = threading.Thread(target=_host_hist)
        host_thread.start()
    counts, deep_pos, deep_id, totals = core(cls_dev, np.int32(vstart), dev)
    totals = np.asarray(totals)
    if host_thread is not None:
        host_thread.join()
    if (
        totals[0] > bbud
        or totals[1] > sbud
        or totals[2] > cbud
        or totals[3] > _DEEP_BUDGET
    ):
        return None  # budget overflow: caller uses the classic engine
    counts = np.asarray(counts).astype(np.int64)
    if host_short:
        if "counts" not in host_box:
            # the histogram thread died (e.g. MemoryError on the K^3 hist):
            # fall back to the exact classic engine rather than raising
            return None
        counts += host_box["counts"]

    # host boundary corrections for the l<=2 marginals
    for ell in (1, 2) if not host_short else ():
        m = t.short_maps[ell - 1]
        if not m:
            continue
        lo = max(vstart, ell - 1)
        hi = max(vstart, 2)
        for p in range(lo, min(hi, N)):
            code = 0
            for c in full[max(p - ell + 1, 0) : p + 1]:
                code = code * t.K + int(c)
            pid = m.get(code)
            if pid is not None:
                counts[pid] += 1

    ndeep = int(totals[3])
    if ndeep:
        dp = np.asarray(deep_pos[:ndeep])
        di = np.asarray(deep_id[:ndeep])
        counts += _verify_deep_host(t, full, vstart, dp, di)
    return counts


def _verify_deep_mask(t: CascadeTables, cls, dpos, dids) -> np.ndarray:
    """Exact host verification of l>=5 candidates by full text compare;
    returns a boolean mask over the candidate list."""
    rows = t.deep_id_of_row[dids]
    lens = t.deep_len[rows].astype(np.int64)
    okb = (dpos - lens + 1 >= 0) & (rows >= 0)
    L = t.deep_cls.shape[1]
    starts = np.maximum(dpos.astype(np.int64) - lens + 1, 0)
    win = starts[:, None] + np.arange(L)[None, :]
    win = np.minimum(win, cls.size - 1)
    text = np.asarray(cls, np.int32)[win]
    patt = t.deep_cls[rows]
    lmask = np.arange(L)[None, :] < lens[:, None]
    return ((text == patt) | ~lmask).all(axis=1) & okb


def _verify_deep_host(t: CascadeTables, cls, vstart, dpos, dids):
    """Per-pattern counts of host-verified l>=5 candidates."""
    counts = np.zeros(t.num_patterns, np.int64)
    eq = _verify_deep_mask(t, cls, dpos, dids)
    np.add.at(counts, dids[eq], 1)
    return counts


def _short_counts_host(t: CascadeTables, full, vstart):
    """Exact l<=3 counts on the host: one vectorized 3-gram histogram plus
    marginals and boundary corrections (numpy releases the GIL, so this
    overlaps the device flag pipeline)."""
    K = t.K
    K2, K3 = K * K, K * K * K
    cls = np.asarray(full)
    N = cls.size
    counts = np.zeros(t.num_patterns, np.int64)
    lo3 = max(vstart, 2)
    if N > lo3:
        from .. import native

        hist = native.hist3(cls, K, lo3)
        if hist is None:  # pure-python fallback
            # int64 up front: K2 * cls must not overflow narrow input dtypes
            g3 = (
                cls[lo3:].astype(np.int64)
                + K * cls[lo3 - 1 : N - 1].astype(np.int64)
                + K2 * cls[lo3 - 2 : N - 2].astype(np.int64)
            )
            hist = np.bincount(g3, minlength=K3)
        if t.has[2]:
            counts[t.short_ids[2]] += hist[t.short_codes[2]]
        if t.has[1]:
            hist2 = hist.reshape(K, K2).sum(axis=0)
            counts[t.short_ids[1]] += hist2[t.short_codes[1]]
        if t.has[0]:
            hist1 = hist.reshape(K2, K).sum(axis=0)
            counts[t.short_ids[0]] += hist1[t.short_codes[0]]
    for ell in (1, 2):
        m = t.short_maps[ell - 1]
        if not m:
            continue
        lo = max(vstart, ell - 1)
        hi = max(vstart, 2)
        for p in range(lo, min(hi, N)):
            code = 0
            for c in cls[max(p - ell + 1, 0) : p + 1]:
                code = code * K + int(c)
            pid = m.get(code)
            if pid is not None:
                counts[pid] += 1
    return counts
