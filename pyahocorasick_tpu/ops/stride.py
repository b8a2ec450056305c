"""Stride-2 transition tables: two input characters per gather.

The scan recurrence cost on TPU is ~1 serialized gather per character (see
PLAN.md).  For compact alphabets the classic countermeasure is a composed
table over character *pairs*:

    delta2[s, c1*K + c2] = delta[delta[s, c1], c2]

halving the sequential gather count.  Match information for BOTH positions is
packed into the same int32 entry (counts in the bits above the state id), so
total match counting costs zero extra gathers:

    entry = next_state | (mc(mid) + mc(end)) << state_bits

Feasible when S*K^2*4B fits the memory budget (DNA K=5: ~25x S; ASCII text
K~53: only small automata) and when packed counts cannot overflow — both are
checked at build time, with automatic fallback to the stride-1 engine.
"""

from __future__ import annotations

import functools

import numpy as np

from ..compiler import CompiledAutomaton

_DEFAULT_BUDGET = 2 << 30  # 2 GiB


def build_stride2(compiled: CompiledAutomaton, max_bytes: int = _DEFAULT_BUDGET):
    """Build (and cache) the packed stride-2 table, or None if infeasible."""
    cache = compiled._cache
    if "stride2" in cache:
        return cache["stride2"]
    S, K = compiled.num_states, compiled.num_classes
    result = None
    if S * K * K * 4 <= max_bytes:
        state_bits = max(int(S - 1).bit_length(), 1)
        count_bits = 31 - state_bits
        if count_bits >= 2:
            delta = compiled.delta.astype(np.int32)
            mid = delta  # [S, K] state after first char
            nxt = delta[mid]  # [S, K, K] state after both
            mc2 = (
                compiled.match_count[mid][:, :, None]
                + compiled.match_count[nxt]
            )
            if int(mc2.max(initial=0)) < (1 << count_bits):
                packed = nxt | (mc2.astype(np.int32) << state_bits)
                result = {
                    "table": packed.reshape(S, K * K),
                    "state_bits": state_bits,
                    "state_mask": (1 << state_bits) - 1,
                }
    cache["stride2"] = result
    return result


def _device_stride2(compiled: CompiledAutomaton):
    import jax.numpy as jnp

    cache = compiled._cache
    if "stride2_dev" not in cache:
        s2 = build_stride2(compiled)
        cache["stride2_dev"] = (
            None
            if s2 is None
            else {
                "table_flat": jnp.asarray(s2["table"].reshape(-1)),
                "state_bits": s2["state_bits"],
                "state_mask": s2["state_mask"],
            }
        )
    return cache["stride2_dev"]


def prepare_stride2_input(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: np.ndarray | None = None,
    block: int | None = None,
):
    """Host-side windowing into the pair-class matrix [steps, Lp].

    The dtype is minimized (uint8/uint16 when K^2 allows) to cut the
    host->device transfer; the kernel widens on device."""
    N = int(cls.size)
    K = compiled.num_classes
    H = max(int(compiled.longest_word), 1)
    H += H & 1  # even halo so pairs align
    from .scan import _round_up_pow2, choose_block

    B = block or choose_block(N, H)
    B = max(B, H)
    B += B & 1
    L = -(-N // B)
    Lp = _round_up_pow2(L)

    ext = np.zeros(H + Lp * B, dtype=np.int32)
    if halo is not None and halo.size:
        h = halo[-H:]
        ext[H - h.size : H] = h
    ext[H : H + N] = cls
    # tail padding cannot create phantom matches: class-0 transitions only
    # reach root, whose match count is 0.
    win = np.lib.stride_tricks.sliding_window_view(ext, H + B)[::B][:Lp]
    pairs = win[:, 0::2].astype(np.int32) * K + win[:, 1::2]
    K2 = K * K
    dtype = np.uint8 if K2 <= 256 else (np.uint16 if K2 <= 65536 else np.int32)
    cls2_tl = np.ascontiguousarray(pairs.T).astype(dtype)  # [(H+B)/2, Lp]
    return cls2_tl, H // 2


def count_total_stride2(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: np.ndarray | None = None,
    block: int | None = None,
    device_input=None,
):
    """Total match count over the haystack with the stride-2 engine, or None
    when the packed table is infeasible for this automaton.

    ``device_input`` may carry a pre-staged (cls2_tl_device, H2) pair (see
    prepare_stride2_input) so repeated scans skip windowing + transfer."""
    import jax.numpy as jnp

    dev = _device_stride2(compiled)
    if dev is None:
        return None
    if int(cls.size) == 0 and device_input is None:
        return 0

    K = compiled.num_classes
    if device_input is None:
        cls2_tl, H2 = prepare_stride2_input(compiled, cls, halo, block)
        cls2_dev = jnp.asarray(cls2_tl)
    else:
        cls2_dev, H2 = device_input

    out = _stride2_count_jit(
        dev["table_flat"],
        cls2_dev,
        K * K,
        H2,
        dev["state_bits"],
        dev["state_mask"],
    )
    return int(np.asarray(out).astype(np.int64).sum())


@functools.lru_cache(maxsize=None)
def _get_stride2_fns():
    import jax
    import jax.numpy as jnp

    # two separate single-scan dispatches: nested/chained scans and tuple xs
    # hang the remote TPU compiler (see PLAN.md)
    @functools.partial(jax.jit, static_argnames=("K2", "state_mask"))
    def warmup(table_flat, cls2_halo, K2, state_mask):
        L = cls2_halo.shape[1]

        def step(s, c2):
            return table_flat[s * K2 + c2.astype(jnp.int32)] & state_mask, ()

        fin, _ = jax.lax.scan(step, jnp.zeros((L,), jnp.int32), cls2_halo)
        return fin

    @functools.partial(
        jax.jit, static_argnames=("K2", "state_bits", "state_mask")
    )
    def count(table_flat, cls2_body, init_states, K2, state_bits, state_mask):
        def step(carry, c2):
            s, acc = carry
            e = table_flat[s * K2 + c2.astype(jnp.int32)]
            return (e & state_mask, acc + (e >> state_bits)), ()

        (s_f, acc), _ = jax.lax.scan(
            step,
            (init_states, jnp.zeros_like(init_states)),
            cls2_body,
        )
        # per-lane totals summed on host in int64 (totals can exceed 2^31)
        return acc

    return warmup, count


def _stride2_count_jit(table_flat, cls2_tl, K2, H2, state_bits, state_mask):
    warmup, count = _get_stride2_fns()
    init = warmup(table_flat, cls2_tl[:H2], K2, state_mask)
    return count(table_flat, cls2_tl[H2:], init, K2, state_bits, state_mask)
