"""Host (numpy) search engines.

Two engines over the dense DFA tables:

* ``scan_states_seq`` — the plain sequential scan.  This is the differential
  oracle (the role the reference's pure-Python twin etc/py/pyahocorasick.py
  plays for the C extension) and the engine for tiny inputs.
* ``scan_states_blocked`` — the same halo-block decomposition the TPU kernels
  use, executed with numpy fancy indexing: L independent lanes each advance
  one char per step, so the per-step work is one vectorized gather of L
  elements.  Exactness of the decomposition: the AC state after reading text t
  is the longest suffix of t that is a trie node, whose length is bounded by
  the automaton depth D; scanning only the last D chars of t from the root
  therefore reproduces the state, so a block preceded by a halo of D true
  characters (class-0-padded at stream start) is exactly independent.  This is
  the carry model the reference expresses sequentially via iter().set()
  (src/AutomatonSearchIter.c:303-368).

Both return the per-position state sequence; match expansion happens in
``emit_matches`` via the precomputed CSR output lists, preserving the
reference's emission order (end ascending, longest-first at equal end).
"""

from __future__ import annotations

import numpy as np

from ..compiler import CompiledAutomaton


def scan_states_seq(
    compiled: CompiledAutomaton, cls: np.ndarray, state: int = 0
) -> np.ndarray:
    """Sequential oracle: returns int32 states after each input class."""
    delta = compiled.delta
    out = np.empty(cls.size, dtype=np.int32)
    s = state
    for i, c in enumerate(cls):
        s = delta[s, c]
        out[i] = s
    return out


def _blocked_matrix(ext: np.ndarray, H: int, B: int, L: int) -> np.ndarray:
    """Zero-copy [L, H+B] overlapping-window view of the extended buffer."""
    win = np.lib.stride_tricks.sliding_window_view(ext, H + B)
    return win[:: B][:L]


def scan_states_blocked(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: np.ndarray | None = None,
    block: int = 256,
) -> np.ndarray:
    """Lane-parallel scan; exact, identical output to scan_states_seq started
    from the state implied by ``halo`` (the last chars already consumed)."""
    N = int(cls.size)
    if N == 0:
        return np.empty(0, dtype=np.int32)
    H = max(int(compiled.longest_word), 1)
    B = max(block, H)  # keep halo overhead bounded
    L = -(-N // B)

    ext = np.zeros(H + L * B, dtype=np.int32)
    if halo is not None and halo.size:
        h = halo[-H:]
        ext[H - h.size : H] = h
    ext[H : H + N] = cls

    mat = _blocked_matrix(ext, H, B, L)  # [L, H+B]
    delta_flat = compiled.delta.reshape(-1)
    K = compiled.num_classes

    states = np.zeros(L, dtype=np.int64)
    out = np.empty((B, L), dtype=np.int32)
    colmaj = np.ascontiguousarray(mat.T)  # [H+B, L]
    for t in range(H):
        states = delta_flat[states * K + colmaj[t]]
    for t in range(B):
        states = delta_flat[states * K + colmaj[H + t]]
        out[t] = states
    return out.T.reshape(L * B)[:N]


def emit_matches(compiled: CompiledAutomaton, states: np.ndarray, base: int = 0):
    """Expand per-position states into (end_positions, pattern_ids) arrays via
    the CSR output lists.  Order matches the reference exactly."""
    mc = compiled.match_count[states]
    hit = np.nonzero(mc)[0]
    if hit.size == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    counts = mc[hit].astype(np.int64)
    starts = compiled.out_offsets[states[hit]]
    total = int(counts.sum())
    # index into out_ids: starts[j] + (0..counts[j]-1) for each hit j
    cum = np.zeros(hit.size, dtype=np.int64)
    np.cumsum(counts[:-1], out=cum[1:])
    flat = np.repeat(starts - cum, counts) + np.arange(total, dtype=np.int64)
    pids = compiled.out_ids[flat].astype(np.int64)
    positions = np.repeat(hit + base, counts)
    return positions, pids


def expand_matches(
    compiled: CompiledAutomaton, positions: np.ndarray, states_at: np.ndarray
):
    """CSR-expand matches given sparse (position, state) pairs (positions
    ascending).  Same output contract as emit_matches."""
    counts = compiled.match_count[states_at].astype(np.int64)
    keep = counts > 0
    if not keep.all():
        positions, states_at, counts = (
            positions[keep],
            states_at[keep],
            counts[keep],
        )
    if positions.size == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    starts = compiled.out_offsets[states_at]
    total = int(counts.sum())
    cum = np.zeros(positions.size, dtype=np.int64)
    np.cumsum(counts[:-1], out=cum[1:])
    flat = np.repeat(starts - cum, counts) + np.arange(total, dtype=np.int64)
    pids = compiled.out_ids[flat].astype(np.int64)
    out_pos = np.repeat(positions, counts)
    return out_pos, pids


def count_matches(compiled: CompiledAutomaton, states: np.ndarray) -> np.ndarray:
    """Per-pattern match counts from a state sequence (numpy reference for the
    device counts kernel)."""
    hist = np.bincount(states, minlength=compiled.num_states).astype(np.int64)
    row_of = np.repeat(
        np.arange(compiled.num_states), compiled.match_count.astype(np.int64)
    )
    counts = np.zeros(compiled.num_patterns, dtype=np.int64)
    np.add.at(counts, compiled.out_ids.astype(np.int64), hist[row_of])
    return counts
