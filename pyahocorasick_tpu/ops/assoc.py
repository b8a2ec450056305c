"""Exact associative-scan engine: transition-function composition.

SURVEY §5.7 option (ii): instead of the halo-blocked decomposition (which
relies on the bounded-history argument of ops/cpu.py), each block computes
its full state-mapping vector ``f_b : S -> S`` ("where does every possible
entry state end up after this block"), the per-block maps are combined with
``jax.lax.associative_scan`` (function composition is associative), and each
block is then re-scanned from its now-known exact entry state.

This makes NO assumption about match/window locality — it is exact for any
automaton and any block size — so it serves as an independent correctness
cross-check of the halo decomposition (the two engines must agree on every
input; see tests/test_assoc.py).  Cost is O(N * S) work instead of O(N),
so it is gated to small automatons (``_ASSOC_MAX_STATES``) and used as a
verification rig, not a production path.

Semantics replaced: the sequential per-char hot loop of reference
src/trie.c:177-194 / src/AutomatonSearchIter.c:243-300.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..compiler import CompiledAutomaton

# compose-maps work is O(S) per character; keep this a correctness rig
_ASSOC_MAX_STATES = int(os.environ.get("PYAHOCORASICK_TPU_ASSOC_MAX_STATES", 4096))


def assoc_ok(compiled: CompiledAutomaton) -> bool:
    return compiled.num_states <= _ASSOC_MAX_STATES


@functools.partial(jax.jit, static_argnames=("K", "B", "S"))
def _assoc_scan_jit(delta_flat, cls_tl, init_state, K: int, B: int, S: int):
    """cls_tl: [B, L] time-major class ids.  Returns [B, L] states with
    exact cross-block carry via associative composition of block maps."""
    L = cls_tl.shape[1]

    # 1. per-block transition map: f_l[s] = state after block l starting at s
    ident = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (L, S))

    def step_map(maps, cls_t):
        nxt = delta_flat[maps * K + cls_t[:, None]]
        return nxt, ()

    maps, _ = jax.lax.scan(step_map, ident, cls_tl)  # [L, S]

    # 2. inclusive composition across blocks: comp_l = f_l . f_{l-1} ... f_0
    def compose(f, g):
        # f applied first, then g (elements are [batch, S] maps)
        return jnp.take_along_axis(g, f, axis=1)

    comp = jax.lax.associative_scan(compose, maps, axis=0)  # [L, S]

    # 3. exact entry state of block l = comp_{l-1}[init]
    entry = jnp.concatenate(
        [
            jnp.full((1,), init_state, dtype=jnp.int32),
            comp[:-1, init_state],
        ]
    )

    # 4. re-scan every block from its exact entry state
    def step(states, cls_t):
        nxt = delta_flat[states * K + cls_t]
        return nxt, nxt

    _, seq = jax.lax.scan(step, entry, cls_tl)
    return seq  # [B, L]


def scan_states_assoc(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: np.ndarray | None = None,
    block: int | None = None,
) -> np.ndarray:
    """Per-position int32 DFA states via associative map composition.

    Exact for any automaton/input (no halo-length assumption); gated by
    ``assoc_ok`` because the map computation costs O(S) per character.
    """
    if not assoc_ok(compiled):
        raise ValueError(
            f"assoc engine gated: {compiled.num_states} states > "
            f"{_ASSOC_MAX_STATES} (PYAHOCORASICK_TPU_ASSOC_MAX_STATES)"
        )
    N = int(cls.size)
    if N == 0:
        return np.empty(0, dtype=np.int32)
    K = compiled.num_classes
    S = compiled.num_states

    init_state = 0
    if halo is not None and halo.size:
        from . import cpu

        H = max(int(compiled.longest_word), 1)
        hs = cpu.scan_states_seq(compiled, halo[-H:].astype(np.int32), 0)
        init_state = int(hs[-1]) if hs.size else 0

    B = block or max(256, 1 << max(int(np.sqrt(N)).bit_length() - 1, 8))
    L = -(-N // B)
    ext = np.zeros(L * B, dtype=np.int32)
    ext[:N] = cls
    cls_tl = np.ascontiguousarray(ext.reshape(L, B).T)  # [B, L]

    from .scan import _device_tables

    tabs = _device_tables(compiled)
    out = np.asarray(
        _assoc_scan_jit(
            tabs["delta_flat"], jnp.asarray(cls_tl), jnp.int32(init_state), K, B, S
        )
    )  # [B, L]
    return out.T.reshape(L * B)[:N]
