"""Hot/cold two-level DFA scan: depth-truncated projection automaton with
stride-s packed transitions + sparse host patch for the cold tail.

The mid/large-dictionary scan problem (SURVEY §7 "hard parts"): the XLA HBM
gather costs ~16 ns per lookup inside a lax.scan (serial dependency chain;
PLAN.md), so the classic one-gather-per-char DFA scan is pinned, and the
stride-2 composed table (one gather per TWO chars, ops/stride.py) needs
S*K^2 entries — infeasible beyond ~200k states for text alphabets.

This engine breaks the trade-off with a *projection automaton*:

* Hot states = the BFS prefix of depth <= d (states are level-ordered, so
  this is just ids < level_starts[d+1]).  Define proj(t) = the deepest
  suffix-state of t with depth <= d (follow fail links).  The truncated
  table ``hot[s, c] = proj(delta_full(s, c))`` tracks proj(true state)
  EXACTLY for every position: if h = proj(t) then, because any suffix-prefix
  of length <= d+1 at position i extends a suffix-prefix of length <= d at
  i-1, delta_full(h, c) equals the longest suffix-prefix of length <= d+1,
  whose proj is proj(delta_full(t, c)).  Induction does the rest.
* Matches of length <= d are exact in the hot scan: a match of length
  l <= d ending at i is a suffix of proj(t_i), so it sits on the hot
  state's (full) output chain — ``match_count[hot_state] > 0`` is the
  per-position any-match flag with zero extra gathers.
* Transitions that would enter depth d+1 (leave the hot set) are flagged in
  the packed entry.  Every position whose TRUE state is deeper than d lies
  in an "episode" whose first position carries such a flag (entering depth
  d+1 from depth <= d means the previous hot state was the true state).
  Episodes are re-scanned exactly on the host by the sparse automaton
  (native aho_patch_deep), emitting only matches of length > d; a match of
  length l ending at q in an episode entered at p satisfies
  l <= depth(q) <= d+1 + (q - p), so it starts at >= p-d and a root-start
  scan from p-d finds it.
* Because the hot state space is small (<= 2^20) the table is composed to
  stride s (one gather advances s characters), with per-offset any-match
  and deep-entry bits packed alongside the state id in one int32:
  ``entry = state | am_bits << 20 | deep_bits << (20+s)``.

Cost model: ~16/s ns/char for the gathers + (entry rate)*(episode
len)*host patch, with d chosen so the estimated entry rate n_{d+1}/K^(d+1)
is tiny.  For 100k random text patterns (K~53): d=4, s=2 → ~8.8 ns/char
(measured); for 100k DNA 20-mers (K=5): d~12, s=5 → ~3.2 ns/char — both
past the stride-1 wall, with a smooth curve across automaton sizes (small
automatons are entirely hot: rate 0, no patches at all).

Replaces the per-char hot loop of reference src/trie.c:177-194 for the
regime between the bilinear gate (ops/scan.py) and the cascade's
counting-only domain (ops/cascade.py).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np

from ..compiler import CompiledAutomaton

_SB = 20  # state bits in a packed entry
_SMASK = (1 << _SB) - 1

_GATHER_NS = 16.0  # measured IN-SCAN XLA gather cost per lookup (PLAN.md)
_PATCH_NS = 12.0  # host patch cost per episode char (sparse C++ walk)


def _env_bytes() -> int:
    # v5e has 16 GB HBM; the table is the only large device buffer of this
    # engine, so a 6 GB default leaves room for the haystack + ys while
    # letting compact alphabets reach stride 5 (DNA: 450k states x 5^5)
    return int(os.environ.get("PYAHOCORASICK_TPU_HOTCOLD_BYTES", 6_000_000_000))


def _env_rate() -> float:
    return float(os.environ.get("PYAHOCORASICK_TPU_HOTCOLD_RATE", 0.004))


def plan_hotcold(
    compiled: CompiledAutomaton,
    budget: int | None = None,
    max_rate: float | None = None,
    full: bool = False,
):
    """Choose (d, s): depth cutoff and stride, minimizing the modeled
    ns/char; None when no feasible configuration beats the stride-1 wall.
    With ``full=True`` returns (cost_ns_per_char, d, s, table_bytes) so
    callers (the bench matrix) can skip the engine when another engine
    already beats the model, or when the table build would blow the time
    budget (r3: a 544 s build for a losing 0.079 GB/s; VERDICT item 3)."""
    budget = budget or _env_bytes()
    max_rate = max_rate if max_rate is not None else _env_rate()
    ls = np.asarray(compiled.level_starts)
    K = compiled.num_classes
    S = compiled.num_states
    max_depth = len(ls) - 2
    if max_depth < 1 or K < 2 or S < 2:
        return None
    best = None
    # d >= 3: the host hist3 pass covers lengths <= 3 (overlapped), the
    # device any-match bits cover [4, d], the patch covers > d — d < 3
    # would double-count length-3 matches between host and patch
    for d in range(3, max_depth + 1):
        S_hot = int(ls[d + 1]) if d + 1 < len(ls) else S
        if S_hot > (1 << _SB):
            break
        n_next = int(ls[d + 2] - ls[d + 1]) if d + 2 < len(ls) else 0
        # uniform-char estimate of P(position is a deep entry); class 0
        # ("not in alphabet") rarely occurs in real haystacks, so the
        # effective alphabet is K-1 (for DNA the difference is 18x at d=12)
        Ke = max(K - 1, 1)
        rate = n_next / float(Ke ** min(d + 1, 30)) if n_next else 0.0
        if rate > max_rate:
            continue
        for s in (5, 4, 3, 2):
            if _SB + 2 * s > 31:
                continue
            if S_hot * (K**s) >= 1 << 31:
                # the device gather index st*Ks + c is int32: a larger
                # table would silently wrap and corrupt the scan (reachable
                # only by raising PYAHOCORASICK_TPU_HOTCOLD_BYTES past
                # ~8.5 GB; ADVICE r3)
                continue
            tbytes = S_hot * (K**s) * 4
            if tbytes > budget:
                continue
            # random-gather cost grows with table footprint past ~1 GB
            # (measured r3: ~16 ns at <=0.3 GB, ~21 at 1.9 GB, ~65 at
            # 4.4 GB) — bigger stride is NOT free once the table balloons
            gather_ns = _GATHER_NS + 8.0 * max(0.0, tbytes / 1e9 - 1.0) ** 2
            # deep-plane compaction: the level-2 pass touches
            # nplane * 4 * p32 elements at ~16 ns (gather+scatter); at
            # dense deep rates this dominated the DNA bench (measured
            # ~2.8 ns/char at a 0.6% group rate)
            p32 = 1.0 - (1.0 - min(rate * s, 1.0)) ** 32
            comp_ns = 4.0 * p32 * 16.0 / s
            cost = (
                gather_ns / s
                + rate * (d + 4) * _PATCH_NS
                + comp_ns
                + 0.3 * tbytes / budget  # prefer smaller tables on ties
            )
            if best is None or cost < best[0]:
                best = (cost, d, s, tbytes)
    if best is None or best[0] >= _GATHER_NS * 0.95:
        return None
    if full:
        return best
    return best[1], best[2]


class HotColdTables:
    def __init__(self, d: int, s: int, K: int, table: np.ndarray, hot1):
        self.d = d
        self.s = s
        self.K = K
        self.Ks = K**s
        self.table = table  # [S_hot, K^s] int32 packed
        self.hot1 = hot1  # [S_hot, K] int32 stride-1 states (count path)
        self.S_hot = table.shape[0]
        self._dev = None
        self._dev1 = None

    def device_table(self):
        import jax.numpy as jnp

        if self._dev is None:
            self._dev = jnp.asarray(self.table.reshape(-1))
        return self._dev

    def device_hot1(self):
        import jax.numpy as jnp

        if self._dev1 is None:
            self._dev1 = jnp.asarray(self.hot1.reshape(-1))
        return self._dev1


def _hot1(compiled: CompiledAutomaton, d: int):
    """Depth-truncated stride-1 tables: (next [S_hot,K] int32,
    am [S_hot,K] uint8 0/1, deep [S_hot,K] uint8 0/1)."""
    ls = np.asarray(compiled.level_starts)
    S = compiled.num_states
    nlev = len(ls) - 1  # number of levels (root = level 0)
    S_hot = int(ls[d + 1]) if d + 1 < len(ls) else S
    K = compiled.num_classes
    fail = compiled.fail
    parent = compiled.parent
    edge_cls = compiled.edge_cls

    hot = np.zeros((S_hot, K), np.int32)
    deep = np.zeros((S_hot, K), np.uint8)
    top = min(d, nlev - 1)
    for lev in range(top + 1):
        lo, hi = int(ls[lev]), int(ls[lev + 1])
        if lev > 0:
            ids = np.arange(lo, hi)
            hot[ids] = hot[fail[ids]]
            # fail rows carry no deep flags (their states are shallower than
            # d, so their true children are hot) — nothing to inherit
        if lev + 2 <= nlev:  # children of this level exist
            clo, chi = int(ls[lev + 1]), int(ls[lev + 2])
            cids = np.arange(clo, chi)
            p = parent[cids].astype(np.int64)
            c = edge_cls[cids]
            if lev + 1 <= d:
                hot[p, c] = cids.astype(np.int32)
            else:  # cold child: project one fail step (depth(fail) <= d)
                hot[p, c] = fail[cids]
                deep[p, c] = 1
    # any-match bits cover lengths [4, d] ONLY: the <=3 lengths are counted
    # by the overlapped host histogram (cascade _short_counts_host) — on
    # short-heavy dictionaries they make the flag plane ~2.4% dense, which
    # swamps the budget compaction (measured 37 ns/char); restricted to >=4
    # the plane stays sparse (~n4/K^4)
    mc = compiled.match_count[:S_hot].astype(np.int64)
    end = int(compiled.out_offsets[S_hot])
    ids = compiled.out_ids[:end]
    rows = np.repeat(np.arange(S_hot, dtype=np.int64), mc)
    long_mask = compiled.word_len[ids] >= 4
    mc4 = np.bincount(rows[long_mask], minlength=S_hot)
    am = (mc4[hot] > 0).astype(np.uint8)
    return hot, am, deep


def _compose(st_a, am_a, dp_a, span_a, st_b, am_b, dp_b):
    """Compose two stride tables: result consumes span_a + span_b chars.
    Flag bitmasks concatenate (b's bits shifted up by span_a).  Native path:
    one parallel streaming pass (the tables reach ~2 GB; numpy's fancy-index
    temporaries made this the dominant build cost)."""
    S = st_a.shape[0]
    Ka = st_a.shape[1]
    Kb = st_b.shape[1]
    from .. import native

    if native.available():
        ext = native._load()
        if hasattr(ext, "hotcold_compose"):
            st = np.empty((S, Ka * Kb), np.int32)
            am = np.empty((S, Ka * Kb), np.uint8)
            dp = np.empty((S, Ka * Kb), np.uint8)
            ext.hotcold_compose(
                np.ascontiguousarray(st_a), np.ascontiguousarray(am_a),
                np.ascontiguousarray(dp_a), Ka,
                np.ascontiguousarray(st_b), np.ascontiguousarray(am_b),
                np.ascontiguousarray(dp_b), Kb,
                int(span_a), st, am, dp, min(4, os.cpu_count() or 1),
            )
            return st, am, dp
    mid = st_a  # [S, Ka]
    st = st_b[mid]  # [S, Ka, Kb]
    am = am_a[..., None] | (am_b[mid] << span_a)
    dp = dp_a[..., None] | (dp_b[mid] << span_a)
    return (
        st.reshape(S, -1),
        am.reshape(S, -1),
        dp.reshape(S, -1),
    )


def build_hotcold(
    compiled: CompiledAutomaton, plan=None
) -> Optional[HotColdTables]:
    cache = compiled._cache
    if "hotcold" in cache and plan is None:
        return cache["hotcold"]
    p = plan or plan_hotcold(compiled)
    if p is None:
        if plan is None:
            cache["hotcold"] = None
        return None
    d, s = p
    st, am, dp = _hot1(compiled, d)
    # am/dp are uint8 bitmasks over stride offsets; compose to span s
    pieces = {1: (st, am, dp)}

    def get(n):
        if n not in pieces:
            half = n // 2
            a = get(half)
            b = get(n - half)
            pieces[n] = _compose(a[0], a[1], a[2], half, b[0], b[1], b[2])
        return pieces[n]

    st_s, am_s, dp_s = get(s)
    from .. import native

    if native.available() and hasattr(native._load(), "hotcold_pack"):
        packed = np.empty(st_s.shape, np.int32)
        native._load().hotcold_pack(
            np.ascontiguousarray(st_s), np.ascontiguousarray(am_s),
            np.ascontiguousarray(dp_s), s, packed,
            min(4, os.cpu_count() or 1),
        )
    else:
        packed = (
            st_s
            | (am_s.astype(np.int32) << _SB)
            | (dp_s.astype(np.int32) << (_SB + s))
        )
    ht = HotColdTables(d, s, compiled.num_classes, packed, st)
    if plan is None:
        cache["hotcold"] = ht
    return ht


# ---------------------------------------------------------------------------
# input prep


def prepare_hotcold_input(
    compiled: CompiledAutomaton,
    ht: HotColdTables,
    cls: np.ndarray,
    halo: np.ndarray | None = None,
    block: int | None = None,
):
    """Window the class array into [steps, Lp] stride-group codes.
    Returns (codes_tl, warm_steps, B)."""
    from .scan import _round_up_pow2, choose_block

    s, K = ht.s, ht.K
    N = int(cls.size)
    H = max(int(compiled.longest_word), 1)
    H = -(-H // s) * s  # halo multiple of the stride
    B = block or choose_block(N, H)
    B = max(B, H)
    B = -(-B // s) * s
    L = -(-N // B)
    Lp = max(_round_up_pow2(L), 32)

    ext = np.zeros(H + Lp * B, dtype=np.int32)
    if halo is not None and halo.size:
        h = halo[-H:]
        ext[H - h.size : H] = h
    ext[H : H + N] = cls
    win = np.lib.stride_tricks.sliding_window_view(ext, H + B)[::B][:Lp]
    g = win.reshape(Lp, (H + B) // s, s)
    codes = np.zeros(g.shape[:2], np.int64)
    for j in range(s):
        codes = codes * K + g[:, :, j]
    dtype = (
        np.uint8
        if ht.Ks <= 256
        else (np.uint16 if ht.Ks <= 65536 else np.int32)
    )
    codes_tl = np.ascontiguousarray(codes.T).astype(dtype)  # [steps, Lp]
    return codes_tl, H // s, B


# ---------------------------------------------------------------------------
# device scans (warmup / body / compaction are separate dispatches: chained
# scans inside one jit hang the remote TPU compiler, see PLAN.md)


@functools.lru_cache(maxsize=None)
def _get_fns():
    import jax
    import jax.numpy as jnp

    from .cascade import _compact

    @functools.partial(jax.jit, static_argnames=("Ks",))
    def warmup(table_flat, pc, Ks):
        L = pc.shape[1]

        def step(st, c):
            return table_flat[st * Ks + c.astype(jnp.int32)] & _SMASK, ()

        fin, _ = jax.lax.scan(step, jnp.zeros((L,), jnp.int32), pc)
        return fin

    @functools.partial(jax.jit, static_argnames=("Ks", "s"))
    def body(table_flat, pc, init, Ks, s):
        amask = (1 << s) - 1

        def step(carry, c):
            st, nm = carry
            e = table_flat[st * Ks + c.astype(jnp.int32)]
            st2 = e & _SMASK
            am = (e >> _SB) & amask
            cnt = am & 1
            for j in range(1, s):
                cnt = cnt + ((am >> j) & 1)
            return (st2, nm + cnt), e  # full packed entries as ys

        (fin, nm), plane = jax.lax.scan(
            step, (init, jnp.zeros_like(init)), pc
        )
        return fin, nm, plane  # plane: [steps, L] packed entries

    def _compact2(flat, bud1, bud2):
        """Two-level compaction of nonzero int32 entries; returns
        (flat_indices [bud2] (-1 pad), totals [2])."""
        n = flat.shape[0]
        pad = (-n) % 32
        f = jnp.pad(flat, (0, pad))
        nblk = f.shape[0] // 32
        blk = (f.reshape(nblk, 32).max(axis=1) > 0).astype(jnp.int32)
        b1, t1 = _compact(blk, bud1)
        valid = b1 >= 0
        idx = (
            jnp.maximum(b1, 0)[:, None] * 32
            + jnp.arange(32, dtype=jnp.int32)[None, :]
        )  # [bud1, 32] indices into f
        sub = (
            jnp.take(f, idx.reshape(-1), mode="clip").reshape(-1, 32)
            * valid[:, None]
        )
        sflags = (sub.reshape(-1) > 0).astype(jnp.int32)
        b2, t2 = _compact(sflags, bud2)
        v2 = b2 >= 0
        gidx = jnp.take(idx.reshape(-1), jnp.maximum(b2, 0), mode="clip")
        return jnp.where(v2, gidx, -1), jnp.stack([t1, t2])

    @functools.partial(jax.jit, static_argnames=("s", "bud1", "bud2"))
    def compact_deep(plane, s, bud1, bud2):
        """Compaction of deep-flagged entries of the packed plane."""
        amask = (1 << s) - 1
        return _compact2(
            (plane.reshape(-1) >> (_SB + s)) & amask, bud1, bud2
        )

    @functools.partial(
        jax.jit, static_argnames=("K", "s", "S_hot", "bud1", "bud2")
    )
    def count_hist(plane, pc, init, hot1_flat, K, s, S_hot, bud1, bud2):
        """Histogram over proj-states at short-matched positions.

        Matched GROUPS are budget-compacted; each walks its s chars with the
        stride-1 hot table from the previous entry's state (all budget-sized
        work), scatter-adding every flagged offset's state.  The host folds
        the histogram through the hot states' CSR output lists — per-pattern
        counts of all matches with length <= d, no per-position fetch."""
        amask = (1 << s) - 1
        flat = plane.reshape(-1)
        am = (flat >> _SB) & amask
        idx, totals = _compact2(am, bud1, bud2)
        v = idx >= 0
        iv = jnp.maximum(idx, 0)
        L = plane.shape[1]
        prev = iv - L
        sprev = jnp.where(
            prev >= 0,
            jnp.take(flat, jnp.maximum(prev, 0), mode="clip") & _SMASK,
            jnp.take(init, iv % L, mode="clip"),
        )
        pcv = jnp.take(pc.reshape(-1), iv, mode="clip").astype(jnp.int32)
        fl = jnp.take(am, iv, mode="clip") * v
        st = sprev
        hist = jnp.zeros((S_hot,), jnp.int32)
        for j in range(s):
            c = (pcv // (K ** (s - 1 - j))) % K
            st = hot1_flat[st * K + c]
            hist = hist.at[st].add(((fl >> j) & 1))
        return hist, totals

    return warmup, body, compact_deep, count_hist


def _pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def _deep_budgets(compiled, ht, nplane: int):
    """Compaction budgets for the deep plane, from the planning rate
    estimate (x4 safety, pow2 so the compiled shape set stays bounded)."""
    ls = np.asarray(compiled.level_starts)
    n_next = int(ls[ht.d + 2] - ls[ht.d + 1]) if ht.d + 2 < len(ls) else 0
    Ke = max(ht.K - 1, 1)  # class 0 rarely occurs (see plan_hotcold)
    rate = n_next / float(Ke ** min(ht.d + 1, 30)) if n_next else 0.0
    r_group = min(1.0, rate * ht.s)
    bud1 = min(
        _pow2(nplane // 32),
        max(1 << 12, _pow2(nplane / 32 * min(1.0, r_group * 32) * 4)),
    )
    bud2 = min(_pow2(nplane), max(1 << 12, _pow2(nplane * r_group * 4)))
    return bud1, bud2


# ---------------------------------------------------------------------------
# host patch (python fallback mirrors native aho_patch_deep)


def _patch_python(compiled, cls, groups, span, d, base=0):
    edge_cls = compiled.edge_cls
    child_off = compiled.child_off
    fail = compiled.fail
    root_goto = compiled.root_goto
    depth = compiled.depth
    mc = compiled.match_count
    offs = compiled.out_offsets
    oids = compiled.out_ids
    wlen = compiled.word_len
    n = int(cls.size)

    def goto(s, c):
        while True:
            if s == 0:
                return int(root_goto[c])
            lo, hi = int(child_off[s]), int(child_off[s + 1])
            for j in range(lo, hi):
                if edge_cls[j] == c:
                    return j
            s = int(fail[s])

    warm = max(int(compiled.longest_word), int(d))
    out_pos, out_pid = [], []
    done = -1
    for p in groups:
        p = int(p)
        q = max(p, done + 1)
        gend = p + span
        if q >= gend or q >= n:
            continue
        a = max(q - warm, 0)  # warm >= longest_word: exact for ANY boundary
        s = 0
        for i in range(a, q):
            s = goto(s, int(cls[i]))
        for i in range(q, n):
            s = goto(s, int(cls[i]))
            done = i
            if depth[s] > d:
                m = int(mc[s])
                if m:
                    off = int(offs[s])
                    for j in range(m):
                        pid = int(oids[off + j])
                        if wlen[pid] > d:
                            out_pos.append(base + i)
                            out_pid.append(pid)
            elif i >= gend - 1:
                break
    return np.asarray(out_pos, np.int64), np.asarray(out_pid, np.int32)


def _patch(compiled, cls, groups, span, d, base=0):
    from .. import native

    if native.available():
        return native.patch_deep(compiled, cls, groups, span, d, base)
    return _patch_python(compiled, cls, groups, span, d, base)


# ---------------------------------------------------------------------------
# glue


class HotColdResult:
    """Exact scan decomposition: ``short_positions_count`` = number of
    positions where >= 1 match of length in [4, d] ends (device, from the
    packed any-match bits; lengths <= 3 are host-histogram work, see
    _hot1); (deep_pos, deep_pid) = every match of length > d (host patch),
    position-sorted."""

    def __init__(self, short_positions_count, deep_pos, deep_pid, d, s):
        self.short_positions_count = int(short_positions_count)
        self.deep_pos = deep_pos
        self.deep_pid = deep_pid
        self.d = d
        self.s = s


def hotcold_scan(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: np.ndarray | None = None,
    staged=None,
    block: int | None = None,
) -> Optional[HotColdResult]:
    """Run the hot/cold engine over a haystack; None when gated (no feasible
    plan or deep-compaction budget overflow — caller falls back)."""
    ht = build_hotcold(compiled)
    if ht is None:
        return None
    import jax.numpy as jnp

    N = int(cls.size)
    if N == 0:
        return HotColdResult(0, np.empty(0, np.int64), np.empty(0, np.int32), ht.d, ht.s)

    if staged is not None:
        pc_dev, warm, B = staged
    else:
        codes_tl, warm, B = prepare_hotcold_input(compiled, ht, cls, halo, block)
        pc_dev = jnp.asarray(codes_tl)

    warmup, body, compact_deep, _ = _get_fns()
    tab = ht.device_table()
    init = warmup(tab, pc_dev[:warm], ht.Ks)
    fin, nm, plane = body(tab, pc_dev[warm:], init, ht.Ks, ht.s)

    steps = int(pc_dev.shape[0]) - warm
    L = int(pc_dev.shape[1])
    nplane = steps * L
    # budgets from the planning rate estimate (x4 safety, pow2, floors)
    bud1, bud2 = _deep_budgets(compiled, ht, nplane)
    gidx, totals = compact_deep(plane, ht.s, bud1, bud2)

    # fetch discipline: the relay moves ~10 MB/s (PLAN.md), so reduce nm to
    # a scalar on device and fetch only the occupied prefix of the deep
    # buffer (totals first, then a pow2-rounded slice)
    import jax.numpy as jnp2

    nm_total = int(np.asarray(jnp2.sum(nm)))
    totals = np.asarray(totals)
    if totals[0] > bud1 or totals[1] > bud2:
        return None  # unexpectedly dense deep plane: fall back to exact path
    nd = int(totals[1])
    gidx_host = (
        np.asarray(gidx[: _pow2(max(nd, 1))]) if nd else np.empty(0, np.int64)
    )

    deep_pos, deep_pid = _deep_matches(
        compiled, ht, gidx_host, L, B, N, cls, halo
    )
    return HotColdResult(nm_total, deep_pos, deep_pid, ht.d, ht.s)


def _deep_matches(compiled, ht, gidx, L, B, N, cls, halo):
    """Host side of the deep path: compacted flat plane indices -> patched
    (pos, pid) arrays for every match of length > d."""
    gidx = gidx[gidx >= 0]
    # flat index -> global char position of the group start
    t_idx = gidx // L
    l_idx = gidx % L
    pos = l_idx.astype(np.int64) * B + t_idx.astype(np.int64) * ht.s
    pos = np.unique(pos[pos < N])

    # Episodes that BEGIN inside a user-provided halo carry no body flag; a
    # synthetic group at position 0 (scanned with the halo as context) covers
    # them: if depth(t_0) <= d it breaks immediately, else it follows the
    # episode exactly like any other group.
    if halo is not None and halo.size:
        H = max(int(compiled.longest_word), 1)
        h = np.ascontiguousarray(halo[-H:], np.int32)
        hs = int(h.size)
        ext = np.concatenate([h, np.ascontiguousarray(cls, np.int32)])
        groups = np.concatenate([np.asarray([hs], np.int64), pos + hs])
        return _patch(compiled, ext, groups, ht.s, ht.d, -hs)
    return _patch(compiled, cls, pos, ht.s, ht.d, 0)


def _hot_csr(compiled, ht):
    """Cached (rows, ids) of the hot states' CSR output lists RESTRICTED to
    pattern lengths >= 4 (matching the any-match bit semantics): counts[pid]
    folds as counts[ids] += hist[rows]."""
    cache = compiled._cache
    key = ("hotcold_csr", ht.d)
    if key not in cache:
        mc = compiled.match_count[: ht.S_hot].astype(np.int64)
        end = int(compiled.out_offsets[ht.S_hot])
        ids = compiled.out_ids[:end]
        rows = np.repeat(np.arange(ht.S_hot, dtype=np.int64), mc)
        keep = compiled.word_len[ids] >= 4
        cache[key] = (rows[keep], ids[keep])
    return cache[key]


def hotcold_count_matches(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: np.ndarray | None = None,
    staged=None,
    block: int | None = None,
):
    """Exact per-pattern int64 counts via the hot/cold engine, or None when
    gated.  Device work: the stride-s scan plus budget-sized compactions and
    a proj-state histogram (no per-position fetch — only the [S_hot]
    histogram and sparse deep groups come back to the host)."""
    ht = build_hotcold(compiled)
    if ht is None:
        return None
    import jax.numpy as jnp

    N = int(cls.size)
    P = compiled.num_patterns
    if N == 0:
        return np.zeros(P, np.int64)

    # lengths <= 3 are counted on the host (hist3 LUT, GIL-released),
    # overlapped with the device scan — the device any-match bits only
    # cover [4, d] (see _hot1)
    has_short = compiled.word_len.size and int(compiled.word_len.min()) <= 3
    short_thread = None
    short_box: dict = {}
    if has_short:
        from . import cascade as _c

        ct = _c.build_tables(compiled)
        if ct is None or not any(ct.has):
            return None  # no exact host path for the short lengths

        def _short():
            try:
                if halo is not None and halo.size:
                    H = max(int(compiled.longest_word), 1)
                    full = np.concatenate(
                        [halo[-H:].astype(np.int32), cls]
                    )
                    vs = min(int(halo[-H:].size), H)
                else:
                    full, vs = cls, 0
                short_box["counts"] = _c._short_counts_host(ct, full, vs)
            except BaseException as exc:  # noqa: BLE001
                short_box["error"] = exc

        import threading

        short_thread = threading.Thread(target=_short)
        short_thread.start()

    if staged is not None:
        pc_dev, warm, B = staged
    else:
        codes_tl, warm, B = prepare_hotcold_input(compiled, ht, cls, halo, block)
        pc_dev = jnp.asarray(codes_tl)

    warmup, body, compact_deep, count_hist = _get_fns()
    tab = ht.device_table()
    init = warmup(tab, pc_dev[:warm], ht.Ks)
    fin, nm, plane = body(tab, pc_dev[warm:], init, ht.Ks, ht.s)

    steps = int(pc_dev.shape[0]) - warm
    L = int(pc_dev.shape[1])
    nplane = steps * L

    # short-match histogram: budgets sized from the measured match count
    # (device scalar reduce: fetching the [L] per-lane counts would cost
    # ~0.4 s through the relay at bench lane counts)
    total_short = int(np.asarray(jnp.sum(nm)))
    bud2m = min(_pow2(nplane), max(1 << 12, _pow2(total_short * 2)))
    bud1m = min(
        _pow2(-(-nplane // 32)),
        max(1 << 12, _pow2(min(nplane / 32, total_short) * 2)),
    )
    hist, totals_m = count_hist(
        plane, pc_dev[warm:], init, ht.device_hot1(),
        ht.K, ht.s, ht.S_hot, bud1m, bud2m,
    )
    def _bail():
        # join the host short-count thread on EVERY exit path (an early
        # budget-overflow return previously left it running; ADVICE r3)
        if short_thread is not None:
            short_thread.join()
        return None

    totals_m = np.asarray(totals_m)
    if totals_m[0] > bud1m or totals_m[1] > bud2m:
        return _bail()

    counts = np.zeros(P, np.int64)
    rows, ids = _hot_csr(compiled, ht)
    np.add.at(counts, ids, np.asarray(hist).astype(np.int64)[rows])

    # deep matches via the compaction + host patch
    bud1, bud2 = _deep_budgets(compiled, ht, nplane)
    gidx, totals = compact_deep(plane, ht.s, bud1, bud2)
    totals = np.asarray(totals)
    if totals[0] > bud1 or totals[1] > bud2:
        return _bail()
    nd = int(totals[1])
    gidx_host = (
        np.asarray(gidx[: _pow2(max(nd, 1))]) if nd else np.empty(0, np.int64)
    )
    _, deep_pid = _deep_matches(
        compiled, ht, gidx_host, L, B, N, cls, halo
    )
    if deep_pid.size:
        counts += np.bincount(deep_pid, minlength=P).astype(np.int64)
    if short_thread is not None:
        short_thread.join()
        if "counts" not in short_box:
            # a MemoryError degrades to the fallback chain; anything else
            # is a real bug in the host histogram — surface it instead of
            # silently returning engine-gated (ADVICE r3)
            err = short_box.get("error")
            if err is not None and not isinstance(err, MemoryError):
                raise err
            return None
        counts += short_box["counts"]
    return counts
