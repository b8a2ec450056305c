"""Lowering: host trie  ->  dense DFA tables ready for the TPU scan kernels.

This is the TPU-native replacement for the reference's ``make_automaton()`` BFS
(src/Automaton.c:560-649) *plus* the goto/fail resolution that the reference
performs at search time (``ahocorasick_next``, src/trie.c:177-194).  Instead of
pointer-chasing with fail-chain walks per input character, we precompute the
fully-resolved DFA transition table so the device hot loop is a single gather:

    state[i+1] = delta[state[i], cls[i]]

Layout decisions (all chosen for the TPU memory system):

* **Alphabet compaction.**  Letters are uint32 code units; only letters that
  actually appear in some pattern can change the automaton state.  Every other
  letter maps to class 0, whose column is identically root.  The table is
  therefore [S, K] with K = distinct letters + 1 — e.g. K=5 for DNA instead of
  a 4-billion-wide (or even 256-wide) alphabet axis.
* **BFS state numbering.**  States are numbered level by level (root = 0), so
  each BFS level occupies a contiguous id range and the whole construction
  vectorizes: a level's rows start as a copy of their fail rows (numpy fancy
  indexing), then the level's own goto edges are scattered on top.  Fail links
  come out of the same recurrence: fail[child] = delta[fail[parent], cls].
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

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class CompiledAutomaton:
    """Immutable dense form of an Aho-Corasick automaton.

    All arrays are numpy on host; device (jax) copies are created lazily and
    cached by the search engines.
    """

    # alphabet
    letters: np.ndarray  # [K-1] uint32, sorted distinct letters
    # transitions
    delta: np.ndarray  # [S, K] int32, fully fail-resolved DFA
    fail: np.ndarray  # [S] int32
    depth: np.ndarray  # [S] int32
    # match metadata
    word_id: np.ndarray  # [S] int32, pattern id if eow else -1
    match_count: np.ndarray  # [S] int32, #patterns ending at this state
    out_offsets: np.ndarray  # [S+1] int64 CSR offsets
    out_ids: np.ndarray  # [total] int32 pattern ids, fail-chain order
    word_len: np.ndarray  # [P] int32 pattern lengths
    values: List  # [P] per-pattern values (host side)
    longest_word: int  # halo size for blocked scans

    # lazily-populated caches (device arrays etc.)
    _cache: dict = field(default_factory=dict, repr=False)

    @property
    def num_states(self) -> int:
        return self.delta.shape[0]

    @property
    def num_classes(self) -> int:
        return self.delta.shape[1]

    @property
    def num_patterns(self) -> int:
        return len(self.values)

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

    Equivalent of automaton_make_automaton (src/Automaton.c:560-649) fused with
    full DFA resolution and output-list precomputation.
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
    """Vectorized lowering from BFS arrays (parent u32[S], letter u32[S],
    eow bool/u8[S], values_all = per-eow-node values in BFS order)."""
    S = int(parent.size)
    if S == 0:
        return None
    parent_idx = parent.astype(np.int64)
    edge_letter_arr = letter.astype(np.uint32)
    eow = eow.astype(bool)
    level_starts = levels_from_parents(parent_idx)

    # ---- alphabet classes ------------------------------------------------
    edge_cls = np.zeros(S, dtype=np.int64)
    if S <= 1:
        letters = np.empty(0, np.uint32)
    elif int(edge_letter_arr[1:].max()) < (1 << 21):
        # mask/LUT path: O(S) without the sort np.unique would do (letters
        # here are code points; 2 MB of flags covers all of Unicode)
        top = int(edge_letter_arr[1:].max()) + 1
        mask = np.zeros(top, dtype=bool)
        mask[edge_letter_arr[1:]] = True
        letters = np.nonzero(mask)[0].astype(np.uint32)
        lut = np.zeros(top, dtype=np.int64)
        lut[letters] = np.arange(1, letters.size + 1)
        edge_cls[1:] = lut[edge_letter_arr[1:]]
    else:
        letters = np.unique(edge_letter_arr[1:]).astype(np.uint32)
        edge_cls[1:] = np.searchsorted(letters, edge_letter_arr[1:]) + 1
    K = int(letters.size) + 1

    # ---- eow / pattern ids ----------------------------------------------
    word_id = np.full(S, -1, dtype=np.int32)
    eow_idx = np.nonzero(eow)[0]
    word_id[eow_idx] = np.arange(eow_idx.size, dtype=np.int32)
    depth = np.zeros(S, dtype=np.int32)
    for d in range(1, len(level_starts) - 1):
        depth[level_starts[d] : level_starts[d + 1]] = d
    word_len = depth[eow_idx].astype(np.int32)
    values = list(values_all)
    longest_word = int(depth.max()) if S > 1 else 0

    # ---- DFA + fail + outputs: native fast path -------------------------
    from . import native

    if native.available():
        ext = native._load()
        eow_u8 = np.ascontiguousarray(eow, np.uint8)
        cls_i32 = np.ascontiguousarray(edge_cls, np.int32)
        parent_u32 = np.ascontiguousarray(parent, np.uint32)
        ls = np.asarray(level_starts, np.int64)
        delta = np.zeros((S, K), dtype=np.int32)
        fail = np.zeros(S, dtype=np.int32)
        depth = np.zeros(S, dtype=np.int32)
        word_id = np.empty(S, dtype=np.int32)
        match_count = np.zeros(S, dtype=np.int32)
        total = ext.build_tables(
            parent_u32, cls_i32, eow_u8, K, ls, delta, fail, depth,
            word_id, match_count,
        )
        out_offsets = np.zeros(S + 1, dtype=np.int64)
        out_ids = np.empty(total, dtype=np.int32)
        ext.fill_out_ids(eow_u8, fail, word_id, match_count, out_offsets, out_ids)
        word_len = depth[eow_idx].astype(np.int32)
        return CompiledAutomaton(
            letters=letters,
            delta=delta,
            fail=fail,
            depth=depth,
            word_id=word_id,
            match_count=match_count,
            out_offsets=out_offsets,
            out_ids=out_ids,
            word_len=word_len,
            values=values,
            longest_word=longest_word,
        )

    # ---- vectorized per-level DFA + fail construction (numpy fallback) --
    delta = np.zeros((S, K), dtype=np.int32)
    fail = np.zeros(S, dtype=np.int32)

    num_levels = len(level_starts) - 1
    for d in range(num_levels):
        lo, hi = level_starts[d], level_starts[d + 1]
        ids = np.arange(lo, hi)
        if d > 0:
            # start from the fail state's fully-resolved row
            delta[ids] = delta[fail[ids]]
        # children of this level live in the next contiguous range; their fail
        # links resolve against rows of strictly shallower levels (final).
        if d + 1 < num_levels:
            clo, chi = level_starts[d + 1], level_starts[d + 2]
            cids = np.arange(clo, chi)
            if d == 0:
                fail[cids] = 0  # root children fail to root
            else:
                fail[cids] = delta[fail[parent_idx[cids]], edge_cls[cids]]
            # overwrite goto edges on this level's rows
            delta[parent_idx[cids], edge_cls[cids]] = cids.astype(np.int32)

    # ---- match counts + CSR output lists (fail-chain order) -------------
    match_count = np.zeros(S, dtype=np.int32)
    for d in range(num_levels):
        lo, hi = level_starts[d], level_starts[d + 1]
        match_count[lo:hi] = eow[lo:hi].astype(np.int32) + match_count[fail[lo:hi]]

    out_offsets = np.zeros(S + 1, dtype=np.int64)
    np.cumsum(match_count, out=out_offsets[1:])
    total = int(out_offsets[-1])
    out_ids = np.empty(total, dtype=np.int32)

    # out_link[s] = nearest strict fail-ancestor that is a word (or 0 = none);
    # root is never a word, so 0 doubles as the chain terminator.
    out_link = np.zeros(S, dtype=np.int64)
    for d in range(1, num_levels):
        lo, hi = level_starts[d], level_starts[d + 1]
        f = fail[lo:hi]
        out_link[lo:hi] = np.where(eow[f], f, out_link[f])

    if total:
        # chain head: the state itself when eow, else its out_link
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

    return CompiledAutomaton(
        letters=letters,
        delta=delta,
        fail=fail,
        depth=depth,
        word_id=word_id,
        match_count=match_count,
        out_offsets=out_offsets,
        out_ids=out_ids,
        word_len=word_len,
        values=values,
        longest_word=longest_word,
    )
