"""JAX/XLA blocked DFA scan — the single-chip device hot path.

The haystack (as alphabet-class ids) is cut into L blocks of B positions; each
block is prefixed by a halo of H = longest_word preceding characters, which
makes every block's scan exactly independent (see ops/cpu.py for the proof
sketch).  One ``lax.scan`` over the H+B time steps then advances all L lanes
per step with a single vectorized gather:

    states = delta_flat[states * K + cls_t]        # [L] int32 gather

so the device executes N/L sequential steps instead of N — the TPU-native
replacement for the reference's char-at-a-time loop
(src/AutomatonSearchIter.c:243-300, src/trie.c:177-194).

Shapes are bucketed (L padded to a power of two) so jit caches a small number
of executables per automaton.

This module is imported lazily: host-only workflows never pay for jax startup.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler import CompiledAutomaton


def _device_tables(compiled: CompiledAutomaton):
    cache = compiled._cache
    tabs = cache.get("jax_tables")
    if tabs is None:
        from ..utils.compile_cache import ensure_compile_cache

        ensure_compile_cache()
        delta_flat = jnp.asarray(compiled.delta.reshape(-1), dtype=jnp.int32)
        match_count = jnp.asarray(compiled.match_count, dtype=jnp.int32)
        row_of = np.repeat(
            np.arange(compiled.num_states, dtype=np.int32),
            compiled.match_count.astype(np.int64),
        )
        tabs = {
            "delta_flat": delta_flat,
            "match_count": match_count,
            "out_ids": jnp.asarray(compiled.out_ids, dtype=jnp.int32),
            "row_of": jnp.asarray(row_of, dtype=jnp.int32),
        }
        cache["jax_tables"] = tabs
    return tabs


@functools.partial(jax.jit, static_argnames=("K", "H", "B"))
def _blocked_scan_jit(delta_flat, cls_tl, K: int, H: int, B: int):
    """cls_tl: [H+B, L] int32 class ids (time-major).  Returns [B, L] states."""
    L = cls_tl.shape[1]
    init = jnp.zeros((L,), dtype=jnp.int32)

    def step(states, cls_t):
        nxt = delta_flat[states * K + cls_t.astype(jnp.int32)]
        return nxt, nxt

    _, seq = jax.lax.scan(step, init, cls_tl)
    return seq[H:]


@functools.partial(jax.jit, static_argnames=("K", "H", "B"))
def _blocked_scan_final_jit(delta_flat, cls_tl, K: int, H: int, B: int):
    """Scan without materializing per-position states: returns final per-lane
    states only (isolates pure transition throughput for benchmarking)."""
    L = cls_tl.shape[1]
    init = jnp.zeros((L,), dtype=jnp.int32)

    def step(states, cls_t):
        return delta_flat[states * K + cls_t.astype(jnp.int32)], ()

    fin, _ = jax.lax.scan(step, init, cls_tl)
    return fin


def _round_up_pow2(x: int, floor: int = 1) -> int:
    n = max(x, floor)
    return 1 << (n - 1).bit_length()


def _signed_delta_flat(compiled: CompiledAutomaton):
    """Device transition table with the has-match flag packed in the sign bit
    of each entry: one gather yields both next state and match flag."""
    cache = compiled._cache
    if "delta_signed_dev" not in cache:
        has_match = compiled.match_count > 0  # per TARGET state
        signed = compiled.delta | (
            has_match[compiled.delta].astype(np.int32) << 31
        )
        cache["delta_signed_dev"] = jnp.asarray(signed.reshape(-1))
    return cache["delta_signed_dev"]


@functools.partial(jax.jit, static_argnames=("K", "H", "B"))
def _blocked_scan_signed_jit(delta_signed_flat, cls_tl, K: int, H: int, B: int):
    """Scan over the sign-packed table; returns [B, L] signed states (sign
    bit = match flag).  Kept as a plain single scan with ys shaped like xs —
    other shapes hang the remote TPU compiler (see PLAN.md)."""
    L = cls_tl.shape[1]

    def step(states, cls_t):
        nxt = delta_signed_flat[
            (states & 0x7FFFFFFF) * K + cls_t.astype(jnp.int32)
        ]
        return nxt, nxt

    init = jnp.zeros((L,), dtype=jnp.int32)
    _, seq = jax.lax.scan(step, init, cls_tl)
    return seq[H:]


# --- small-automaton fast path: bilinear-MXU state lookup -------------------
# For S*K <= _BILINEAR_MAX_ENTRIES the whole signed transition table fits one
# (R, 128) f32 bilinear table, and the per-step lookup becomes a small matmul
# (onehot(state*K+cls) @ table) instead of a ~7-8 ns/element XLA HBM gather —
# the dominant production case of "dozens of keywords" runs at matmul speed.
# The match flag packs at bit 23 (f32 is exact to 2^24); the step re-encodes
# it into the sign bit so every downstream consumer of signed states is
# unchanged.  (This replaces the round-1 pallas_scan.py sweep kernel, whose
# tpu.dynamic_gather primitive measured ~110 ns/element — scalarized — on
# this backend; the bilinear lookup is ~0.55 ns at R=128, see
# tools/probe_mxu.py and PLAN.md.)

# measured on-chip (tools/probe_mxu.py + /tmp probes): ns/char ~= 0.58 +
# 0.0048 * R  (R = table rows = entries/128): 0.9 GB/s at 30-120 patterns,
# 0.45 GB/s at 400, crossover vs the 7-8 ns HBM gather near R ~ 1500.
# Gate at 2^17 entries (R = 1024, ~0.18 GB/s — still >2x the gather path).
_BILINEAR_MAX_ENTRIES = 1 << 17


def small_table_ok(compiled: CompiledAutomaton) -> bool:
    return (
        compiled.num_states * compiled.num_classes <= _BILINEAR_MAX_ENTRIES
        and compiled.num_states < (1 << 22)
    )


def _bilinear_signed_table(compiled: CompiledAutomaton):
    cache = compiled._cache
    if "delta_bilinear_dev" not in cache:
        has_match = compiled.match_count > 0  # per TARGET state
        entries = compiled.delta | (
            has_match[compiled.delta].astype(np.int32) << 23
        )
        flat = entries.reshape(-1)
        R = max(-(-flat.size // 128), 1)
        pad = np.zeros(R * 128, np.float32)
        pad[: flat.size] = flat
        cache["delta_bilinear_dev"] = jnp.asarray(pad.reshape(R, 128))
    return cache["delta_bilinear_dev"]


@functools.partial(jax.jit, static_argnames=("K", "H", "B"))
def _blocked_scan_signed_bilinear_jit(tab, cls_tl, K: int, H: int, B: int):
    from .cascade import _bilinear_word

    L = cls_tl.shape[1]

    def step(states, cls_t):
        w = _bilinear_word(tab, states * K + cls_t.astype(jnp.int32))
        nxt = w & 0x7FFFFF
        signed = jnp.where(
            (w >> 23) > 0, nxt | jnp.int32(-2147483648), nxt
        )
        return nxt, signed

    init = jnp.zeros((L,), dtype=jnp.int32)
    _, seq = jax.lax.scan(step, init, cls_tl)
    return seq[H:]


@functools.partial(jax.jit, static_argnames=())
def _pack_flags_jit(states_signed):
    """[B, L] signed states -> [B, L//32] uint32 lane-packed match flags
    (separate dispatch: pure elementwise/reduce program)."""
    B, L = states_signed.shape
    flags = (states_signed < 0).astype(jnp.uint32).reshape(B, L // 32, 32)
    pows = jnp.ones((1,), jnp.uint32) << jax.lax.broadcasted_iota(
        jnp.uint32, (1, 1, 32), 2
    )
    return (flags * pows).sum(axis=2, dtype=jnp.uint32)


def _blocked_flags(compiled, cls_tl_dev, K: int, H: int, B: int):
    if small_table_ok(compiled):
        states = _blocked_scan_signed_bilinear_jit(
            _bilinear_signed_table(compiled), cls_tl_dev, K, H, B
        )
    else:
        states = _blocked_scan_signed_jit(
            _signed_delta_flat(compiled), cls_tl_dev, K, H, B
        )
    return _pack_flags_jit(states)


def prepare_scan_input(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: np.ndarray | None = None,
    block: int | None = None,
):
    """Host windowing into the [H+B, Lp] class matrix (shared by the scan
    kernels); returns (cls_tl, B)."""
    N = int(cls.size)
    H = max(int(compiled.longest_word), 1)
    B = block or choose_block(N, H)
    B = max(B, H)
    L = -(-N // B)
    Lp = max(_round_up_pow2(L), 32)

    # smallest dtype that holds the class ids: the staging transfer rides
    # a ~45 MB/s relay (536 MB of int32 at 134M chars measured 12 s, and
    # async staging lands it inside the first timed call); the scan jits
    # widen per step on device
    K = compiled.num_classes
    dt = np.int8 if K <= 127 else (np.int16 if K <= 32767 else np.int32)
    ext = np.zeros(H + Lp * B, dtype=dt)
    if halo is not None and halo.size:
        h = halo[-H:]
        ext[H - h.size : H] = h
    ext[H : H + N] = cls
    win = np.lib.stride_tricks.sliding_window_view(ext, H + B)[::B][:Lp]
    return np.ascontiguousarray(win.T), B


def matched_positions_jax(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: np.ndarray | None = None,
    block: int | None = None,
    staged=None,
) -> np.ndarray:
    """Sorted positions (int64) where at least one match ends, computed with
    scan-only device cost (flags ride the transition entries' sign bit).
    ``staged`` may carry a pre-transferred (cls_tl_device, B) pair."""
    N = int(cls.size)
    if N == 0:
        return np.empty(0, dtype=np.int64)
    H = max(int(compiled.longest_word), 1)
    if staged is None:
        cls_tl, B = prepare_scan_input(compiled, cls, halo, block)
        cls_tl_dev = jnp.asarray(cls_tl)
    else:
        cls_tl_dev, B = staged

    packed = np.asarray(
        _blocked_flags(compiled, cls_tl_dev, compiled.num_classes, H, B)
    )  # [B, Lp//32] uint32

    # sparse unpack: only words with set bits are expanded
    t_idx, w_idx = np.nonzero(packed)
    if t_idx.size == 0:
        return np.empty(0, dtype=np.int64)
    words = packed[t_idx, w_idx]
    bits = (words[:, None] >> np.arange(32, dtype=np.uint32)[None, :]) & 1
    rows, lanes_lo = np.nonzero(bits)
    lanes = w_idx[rows].astype(np.int64) * 32 + lanes_lo
    positions = lanes * B + t_idx[rows]
    positions = positions[positions < N]
    positions.sort(kind="stable")
    return positions


def choose_block(N: int, H: int) -> int:
    """Pick a block length: bounded halo overhead, enough lanes to fill the
    vector units, bounded step count."""
    B = max(8 * H, 128)  # halo overhead <= 12.5%
    # aim for >= 1024 lanes when the input allows it
    while B > 128 and N // B < 1024:
        B //= 2
    return max(B, max(H, 1))


def scan_states_jax(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: np.ndarray | None = None,
    block: int | None = None,
) -> np.ndarray:
    """Blocked scan on the default JAX backend; returns numpy int32 states."""
    N = int(cls.size)
    if N == 0:
        return np.empty(0, dtype=np.int32)
    H = max(int(compiled.longest_word), 1)
    B = block or choose_block(N, H)
    B = max(B, H)
    L = -(-N // B)
    Lp = _round_up_pow2(L)

    ext = np.zeros(H + Lp * B, dtype=np.int32)
    if halo is not None and halo.size:
        h = halo[-H:]
        ext[H - h.size : H] = h
    ext[H : H + N] = cls

    win = np.lib.stride_tricks.sliding_window_view(ext, H + B)[::B][:Lp]
    cls_tl = np.ascontiguousarray(win.T)  # [H+B, Lp]

    tabs = _device_tables(compiled)
    out = _blocked_scan_jit(tabs["delta_flat"], jnp.asarray(cls_tl), compiled.num_classes, H, B)
    out = np.asarray(out)  # [B, Lp]
    return out.T.reshape(Lp * B)[:N]


@functools.partial(jax.jit, static_argnames=("K", "H", "B", "S", "P"))
def _blocked_count_jit(
    delta_flat, match_count, out_ids, row_of, cls_tl, n_valid, K, H, B, S, P
):
    """Counts-only fused pass: per-pattern match counts without materializing
    the state sequence on host.  n_valid masks tail padding."""
    L = cls_tl.shape[1]
    init = jnp.zeros((L,), dtype=jnp.int32)

    def step(states, cls_t):
        nxt = delta_flat[states * K + cls_t.astype(jnp.int32)]
        return nxt, nxt

    _, seq = jax.lax.scan(step, init, cls_tl)
    states = seq[H:]  # [B, L]
    # global position of (t, lane) = lane * B + t
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, (B, L), 1) * B
        + jax.lax.broadcasted_iota(jnp.int32, (B, L), 0)
    )
    valid = pos < n_valid
    states = jnp.where(valid, states, 0)
    # histogram of visited states (state 0 polluted by padding, but root is
    # never a word so it contributes no matches)
    hist = jnp.zeros((S,), dtype=jnp.int32).at[states.reshape(-1)].add(1)
    contrib = hist[row_of]
    counts = jnp.zeros((P,), dtype=jnp.int32).at[out_ids].add(contrib)
    return counts


def count_matches_jax(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: np.ndarray | None = None,
    block: int | None = None,
) -> np.ndarray:
    """Per-pattern counts over a haystack, computed fully on device."""
    N = int(cls.size)
    P = compiled.num_patterns
    if N == 0:
        return np.zeros(P, dtype=np.int64)
    H = max(int(compiled.longest_word), 1)
    B = block or choose_block(N, H)
    B = max(B, H)
    L = -(-N // B)
    Lp = _round_up_pow2(L)

    ext = np.zeros(H + Lp * B, dtype=np.int32)
    if halo is not None and halo.size:
        h = halo[-H:]
        ext[H - h.size : H] = h
    ext[H : H + N] = cls
    win = np.lib.stride_tricks.sliding_window_view(ext, H + B)[::B][:Lp]
    cls_tl = np.ascontiguousarray(win.T)

    tabs = _device_tables(compiled)
    counts = _blocked_count_jit(
        tabs["delta_flat"],
        tabs["match_count"],
        tabs["out_ids"],
        tabs["row_of"],
        jnp.asarray(cls_tl),
        jnp.int32(N),
        compiled.num_classes,
        H,
        B,
        compiled.num_states,
        P,
    )
    return np.asarray(counts).astype(np.int64)
