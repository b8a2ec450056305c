"""Lowering: host trie  ->  DFA tables ready for the TPU scan kernels.

This is the TPU-native replacement for the reference's ``make_automaton()`` BFS
(src/Automaton.c:560-649) *plus* the goto/fail resolution that the reference
performs at search time (``ahocorasick_next``, src/trie.c:177-194).

Two-phase design:

1. **make_automaton() (eager, cheap).**  BFS-export the trie and compute fail
   links, depths, pattern ids and CSR output lists by fail-chain walking —
   the same algorithm and cost as the reference's make_automaton.  After this
   phase the host iterators can already search via the sparse goto (child
   runs + fail chains; native ``scan_emit_sparse``).
2. **Dense lowering (lazy).**  The fully fail-resolved transition table
   ``delta[S, K]`` — the form the device kernels gather from
   (``state' = delta[state, cls]``) — is built on first access of
   ``CompiledAutomaton.delta`` and cached.  For big dictionaries this is a
   multi-GB array; deferring it means trie-style workloads (build + exact
   lookups + a few scans) never pay for it, while bulk/device scans amortize
   it across the corpus.  Small automata (``S*K <= _EAGER_DENSE_ENTRIES``)
   are lowered eagerly since the cost is negligible.

Layout decisions (all chosen for the TPU memory system):

* **Alphabet compaction.**  Letters are uint32 code units; only letters that
  actually appear in some pattern can change the automaton state.  Every other
  letter maps to class 0, whose column is identically root.  The table is
  therefore [S, K] with K = distinct letters + 1 — e.g. K=5 for DNA instead of
  a 4-billion-wide (or even 256-wide) alphabet axis.
* **BFS state numbering.**  States are numbered level by level (root = 0), so
  each BFS level occupies a contiguous id range and the whole construction
  vectorizes: a level's rows start as a copy of their fail rows, then the
  level's own goto edges are scattered on top.  A node's children occupy the
  contiguous range [child_off[p], child_off[p+1]) — the sparse goto form.
* **Match metadata.**  Emission never walks fail chains at runtime: per state
  we store match_count (number of patterns ending there) and a CSR list of
  pattern ids in fail-chain order — the reference's emission order (deepest /
  longest pattern first at equal end index; src/AutomatonSearchIter.c:157-197).
* **iter_long support.**  depth[], word_id[] and fail[] are enough to replay
  the reference's longest-match rules on the dense DFA
  (src/AutomatonSearchIterLong.c:100-152): a goto edge was taken iff the DFA
  step increased depth by one, and the "emit immediately when the direct fail
  node is a word" rule needs word_id[fail[s]].
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

# S*K at or below this: build the dense table eagerly inside make_automaton
# (64 MB of int32 — sub-100ms); above: defer to first .delta access.
_EAGER_DENSE_ENTRIES = 1 << 24


def _lower_mode() -> str:
    # PYAHOCORASICK_TPU_LOWER = auto (default) | eager | lazy
    return os.environ.get("PYAHOCORASICK_TPU_LOWER", "auto")


class CompiledAutomaton:
    """Compiled form of an Aho-Corasick automaton.

    Sparse structures (fail/depth/word_id/match_count/CSR outputs/child runs)
    are always present; the dense ``delta`` table materializes lazily via the
    property.  All arrays are numpy on host; device (jax) copies are created
    lazily and cached by the search engines in ``_cache``.
    """

    def __init__(
        self,
        *,
        letters: np.ndarray,  # [K-1] uint32, sorted distinct letters
        fail: np.ndarray,  # [S] int32
        depth: np.ndarray,  # [S] int32
        word_id: np.ndarray,  # [S] int32, pattern id if eow else -1
        match_count: np.ndarray,  # [S] int32
        out_offsets: np.ndarray,  # [S+1] int64 CSR offsets
        out_ids: np.ndarray,  # [total] int32, fail-chain order
        word_len: np.ndarray,  # [P] int32 pattern lengths
        values: List,  # [P] per-pattern values (host side)
        longest_word: int,  # halo size for blocked scans
        num_classes: int,
        # sparse goto structures (None only on legacy/numpy eager paths)
        parent: Optional[np.ndarray] = None,  # [S] uint32 BFS parents
        edge_cls: Optional[np.ndarray] = None,  # [S] int32 class on edge into i
        child_off: Optional[np.ndarray] = None,  # [S+1] int64 child runs
        root_goto: Optional[np.ndarray] = None,  # [K] int32
        level_starts: Optional[np.ndarray] = None,  # [nlevels+1] int64
        delta: Optional[np.ndarray] = None,  # [S, K] int32 dense, or None
    ):
        self.letters = letters
        self.fail = fail
        self.depth = depth
        self.word_id = word_id
        self.match_count = match_count
        self.out_offsets = out_offsets
        self.out_ids = out_ids
        self.word_len = word_len
        self.values = values
        self.longest_word = longest_word
        self.parent = parent
        self.edge_cls = edge_cls
        self.child_off = child_off
        self.root_goto = root_goto
        self.level_starts = level_starts
        self._num_classes = int(num_classes)
        self._delta = delta
        self._cache: dict = {}

    @property
    def num_states(self) -> int:
        return int(self.fail.shape[0])

    @property
    def num_classes(self) -> int:
        return self._num_classes

    @property
    def num_patterns(self) -> int:
        return len(self.values)

    # -- dense table (lazy) ---------------------------------------------------

    @property
    def has_delta(self) -> bool:
        return self._delta is not None

    @property
    def delta(self) -> np.ndarray:
        if self._delta is None:
            self._delta = self._build_delta()
        return self._delta

    def _build_delta(self) -> np.ndarray:
        S, K = self.num_states, self.num_classes
        delta = np.zeros((S, K), dtype=np.int32)
        if S <= 1:
            return delta
        from . import native

        if native.available() and self.parent is not None:
            ext = native._load()
            nthreads = max(1, min(4, os.cpu_count() or 1))
            ext.build_delta(
                self.parent,
                self.edge_cls,
                np.ascontiguousarray(self.fail, np.int32),
                K,
                self.level_starts,
                delta,
                nthreads,
            )
            return delta
        # numpy fallback: per-level vectorized construction from fail links
        ls = self.level_starts
        parent_idx = self.parent.astype(np.int64)
        edge_cls = self.edge_cls
        fail = self.fail
        num_levels = len(ls) - 1
        for d in range(num_levels):
            lo, hi = int(ls[d]), int(ls[d + 1])
            ids = np.arange(lo, hi)
            if d > 0:
                delta[ids] = delta[fail[ids]]
            if d + 1 < num_levels:
                clo, chi = int(ls[d + 1]), int(ls[d + 2])
                cids = np.arange(clo, chi)
                delta[parent_idx[cids], edge_cls[cids]] = cids.astype(np.int32)
        return delta

    # -- alphabet mapping ---------------------------------------------------

    def classes_of(self, letters_u32: np.ndarray) -> np.ndarray:
        """Map raw uint32 letters to alphabet classes (0 = not in alphabet)."""
        if letters_u32.size == 0:
            return np.empty(0, dtype=np.int32)
        lut = self._cache.get("lut")
        if lut is None and self.letters.size and int(self.letters[-1]) < (1 << 20):
            # Dense LUT for compact alphabets (covers all of Unicode cheaply).
            lut = np.zeros(int(self.letters[-1]) + 2, dtype=np.int32)
            lut[self.letters.astype(np.int64)] = np.arange(
                1, self.letters.size + 1, dtype=np.int32
            )
            self._cache["lut"] = lut
        if lut is not None:
            idx = letters_u32.astype(np.int64)
            np.minimum(idx, lut.size - 1, out=idx)
            return lut[idx]
        if self.letters.size == 0:
            return np.zeros(letters_u32.size, dtype=np.int32)
        # General path: binary search over the sorted alphabet.
        pos = np.searchsorted(self.letters, letters_u32)
        pos = np.minimum(pos, self.letters.size - 1)
        hit = self.letters[pos] == letters_u32
        return np.where(hit, (pos + 1).astype(np.int32), np.int32(0))


def compile_trie(trie, store: int, count: int) -> Optional[CompiledAutomaton]:
    """Lower a host trie into a CompiledAutomaton (None for an empty trie).

    Equivalent of automaton_make_automaton (src/Automaton.c:560-649); the
    dense-DFA resolution half is deferred (see module docstring).
    """
    arrays = trie.bfs_arrays()
    if arrays is None:
        return None
    parent, letter, eow, values_all = arrays
    return compile_arrays(parent, letter, eow, values_all)


def levels_from_parents(parent: np.ndarray) -> list:
    """BFS level boundaries from a BFS-ordered parent array.

    In BFS export order the parent column is non-decreasing, so each level's
    children occupy a contiguous range found by binary search.
    """
    S = parent.size
    level_starts = [0, 1]
    while level_starts[-1] < S:
        lo, hi = level_starts[-2], level_starts[-1]
        # children of [lo, hi) among indices >= 1
        chi = int(np.searchsorted(parent[1:], hi - 1, side="right")) + 1
        if chi == hi:  # no further children
            break
        level_starts.append(chi)
    return level_starts


def compile_arrays(
    parent: np.ndarray, letter: np.ndarray, eow: np.ndarray, values_all: List
) -> Optional[CompiledAutomaton]:
    """Lowering from BFS arrays (parent u32[S], letter u32[S], eow bool/u8[S],
    values_all = per-eow-node values in BFS order)."""
    S = int(parent.size)
    if S == 0:
        return None
    parent_u32 = np.ascontiguousarray(parent, np.uint32)
    edge_letter_arr = np.asarray(letter, np.uint32)
    eow_u8 = np.ascontiguousarray(eow, np.uint8)
    level_starts = levels_from_parents(parent_u32)

    # ---- alphabet classes ------------------------------------------------
    edge_cls = np.zeros(S, dtype=np.int32)
    if S <= 1:
        letters = np.empty(0, np.uint32)
    elif int(edge_letter_arr[1:].max()) < (1 << 21):
        # mask/LUT path: O(S) without the sort np.unique would do (letters
        # here are code points; 2 MB of flags covers all of Unicode)
        top = int(edge_letter_arr[1:].max()) + 1
        mask = np.zeros(top, dtype=bool)
        mask[edge_letter_arr[1:]] = True
        letters = np.nonzero(mask)[0].astype(np.uint32)
        lut = np.zeros(top, dtype=np.int32)
        lut[letters] = np.arange(1, letters.size + 1, dtype=np.int32)
        edge_cls[1:] = lut[edge_letter_arr[1:]]
    else:
        letters = np.unique(edge_letter_arr[1:]).astype(np.uint32)
        edge_cls[1:] = (np.searchsorted(letters, edge_letter_arr[1:]) + 1).astype(
            np.int32
        )
    K = int(letters.size) + 1

    # ---- eow / pattern ids / sparse goto structures ----------------------
    values = list(values_all)

    ls = np.asarray(level_starts, np.int64)
    cls_i32 = edge_cls
    # children of p occupy [child_off[p], child_off[p+1]); BFS order groups
    # children consecutively by ascending parent id, starting at index 1
    counts = np.bincount(parent_u32[1:], minlength=S) if S > 1 else np.zeros(S, np.int64)
    child_off = np.empty(S + 1, np.int64)
    child_off[0] = 1
    np.cumsum(counts, out=child_off[1:])
    child_off[1:] += 1

    from . import native

    if native.available():
        ext = native._load()
        nthreads = max(1, min(4, os.cpu_count() or 1))
        root_goto = np.zeros(K, dtype=np.int32)
        fail = np.zeros(S, dtype=np.int32)
        depth = np.zeros(S, dtype=np.int32)
        word_id = np.empty(S, dtype=np.int32)
        match_count = np.zeros(S, dtype=np.int32)
        out_link = np.zeros(S, dtype=np.int32)
        total = ext.fail_links(
            parent_u32, cls_i32, eow_u8, K, ls, child_off,
            root_goto, fail, depth, word_id, match_count, out_link, nthreads,
        )
        out_offsets = np.zeros(S + 1, dtype=np.int64)
        out_ids = np.empty(total, dtype=np.int32)
        ext.fill_out_ids_linked(
            eow_u8, out_link, word_id, match_count, out_offsets, out_ids
        )
    else:
        fail, depth, word_id, match_count, out_offsets, out_ids, root_goto = (
            _sparse_tables_numpy(
                parent_u32.astype(np.int64), cls_i32, eow_u8.astype(bool),
                ls, child_off, K,
            )
        )
    eow_idx = np.nonzero(eow_u8)[0]

    word_len = depth[eow_idx].astype(np.int32)
    longest_word = int(depth.max()) if S > 1 else 0

    compiled = CompiledAutomaton(
        letters=letters,
        fail=fail,
        depth=depth,
        word_id=word_id,
        match_count=match_count,
        out_offsets=out_offsets,
        out_ids=out_ids,
        word_len=word_len,
        values=values,
        longest_word=longest_word,
        num_classes=K,
        parent=parent_u32,
        edge_cls=cls_i32,
        child_off=child_off,
        root_goto=root_goto,
        level_starts=ls,
    )
    mode = _lower_mode()
    if mode == "eager" or (mode == "auto" and S * K <= _EAGER_DENSE_ENTRIES):
        compiled.delta  # materialize now
    return compiled


def _sparse_tables_numpy(parent_idx, edge_cls, eow, level_starts, child_off, K):
    """Pure-numpy fallback for fail links + match metadata (vectorized per
    level via a temporary dense construction for fail resolution)."""
    S = parent_idx.size
    fail = np.zeros(S, dtype=np.int32)
    depth = np.zeros(S, dtype=np.int32)
    num_levels = len(level_starts) - 1

    # per-level dense rows only for fail resolution; memory equals the dense
    # table, acceptable for the non-native fallback environment (small S)
    delta = np.zeros((S, K), dtype=np.int32)
    for d in range(num_levels):
        lo, hi = int(level_starts[d]), int(level_starts[d + 1])
        ids = np.arange(lo, hi)
        depth[lo:hi] = d
        if d > 0:
            delta[ids] = delta[fail[ids]]
        if d + 1 < num_levels:
            clo, chi = int(level_starts[d + 1]), int(level_starts[d + 2])
            cids = np.arange(clo, chi)
            if d == 0:
                fail[cids] = 0
            else:
                fail[cids] = delta[parent_idx[cids], edge_cls[cids]]
            delta[parent_idx[cids], edge_cls[cids]] = cids.astype(np.int32)

    word_id = np.full(S, -1, dtype=np.int32)
    eow_idx = np.nonzero(eow)[0]
    word_id[eow_idx] = np.arange(eow_idx.size, dtype=np.int32)

    match_count = np.zeros(S, dtype=np.int32)
    for d in range(num_levels):
        lo, hi = int(level_starts[d]), int(level_starts[d + 1])
        match_count[lo:hi] = eow[lo:hi].astype(np.int32) + match_count[fail[lo:hi]]

    out_offsets = np.zeros(S + 1, dtype=np.int64)
    np.cumsum(match_count, out=out_offsets[1:])
    total = int(out_offsets[-1])
    out_ids = np.empty(total, dtype=np.int32)

    # out_link[s] = nearest strict fail-ancestor that is a word (or 0 = none);
    # root is never a word, so 0 doubles as the chain terminator.
    out_link = np.zeros(S, dtype=np.int64)
    for d in range(1, num_levels):
        lo, hi = int(level_starts[d]), int(level_starts[d + 1])
        f = fail[lo:hi]
        out_link[lo:hi] = np.where(eow[f], f, out_link[f])

    if total:
        all_ids = np.arange(S, dtype=np.int64)
        cur = np.where(eow, all_ids, out_link)
        remaining = match_count.copy()
        t = 0
        active = np.nonzero(remaining > 0)[0]
        while active.size:
            out_ids[out_offsets[active] + t] = word_id[cur[active]]
            cur[active] = out_link[cur[active]]
            remaining[active] -= 1
            t += 1
            active = active[remaining[active] > 0]

    root_goto = np.zeros(K, dtype=np.int32)
    if S > 1:
        c0, c1 = int(child_off[0]), int(child_off[1])
        root_goto[edge_cls[c0:c1]] = np.arange(c0, c1, dtype=np.int32)
    return fail, depth, word_id, match_count, out_offsets, out_ids, root_goto
