"""Iterator objects: iter(), iter_long(), keys()/values()/items().

These reproduce the reference's lazy iterator protocol — including streaming
``set()`` re-targeting with global ``shift`` accounting and version-based
invalidation — on top of the bulk dense-scan engines.

* ``SearchIter`` (reference: src/AutomatonSearchIter.c): matches for the whole
  current chunk are computed in one engine call (device scan + CSR expansion)
  and then replayed lazily.  Continuation state across ``set()`` chunks is the
  last ``longest_word`` consumed classes (exact; see ops/cpu.py) — note the
  reference instead carries a raw automaton state pointer
  (src/AutomatonSearchIter.c:303-368): same semantics, different mechanics.
* ``SearchIterLong`` (reference: src/AutomatonSearchIterLong.c:100-152): exact
  replay of the longest-non-overlapping-match rules on the dense DFA.  On the
  DFA a goto edge was taken iff the new state is non-root (any fail-chain
  descent lands strictly shallower than depth+1, and edges never target root),
  and a *direct* edge iff depth increases by exactly one.
* ``ItemsIter`` (reference: src/AutomatonItemsIter.c): explicit-stack DFS with
  children visited in reverse insertion order (the reference pushes edges
  first-to-last onto a LIFO), wildcard and matchtype gating.
"""

from __future__ import annotations

import os

import numpy as np

from . import engines
from .constants import (
    MATCH_AT_LEAST_PREFIX,
    MATCH_AT_MOST_PREFIX,
    MATCH_EXACT_LENGTH,
)

_INVALIDATED_MSG = (
    "underlaying automaton has changed, iterator is not valid anymore"
)

# whitespace predicate mirroring iswspace() used by the reference
# (src/AutomatonSearchIter.c:269-275); built from Python's str.isspace over the
# BMP, which covers the unicode space set.
_WS_CODEPOINTS = None


def _ws_set() -> frozenset:
    global _WS_CODEPOINTS
    if _WS_CODEPOINTS is None:
        _WS_CODEPOINTS = frozenset(
            cp for cp in range(0x3001) if chr(cp).isspace()
        )
    return _WS_CODEPOINTS


def _nonspace_mask(letters: np.ndarray) -> np.ndarray:
    ws = np.fromiter(sorted(_ws_set()), dtype=np.uint32)
    return ~np.isin(letters, ws)


def _iter_window() -> int:
    """Positions scanned per internal window of SearchIter.

    Bounds host memory on match-dense inputs: the reference's iterator is
    O(1) per step (src/AutomatonSearchIter.c:243-300); ours batches matches
    per window, so peak match-buffer memory is O(window * max_chain), never
    O(total_matches).  Mirrors the 2^26-char device windowing of
    ops/cascade_emit.py at a host-friendly default."""
    return max(int(os.environ.get("PYAHOCORASICK_TPU_ITER_WINDOW", 1 << 22)), 1)


class SearchIter:
    """Lazy Aho-Corasick scan; yields (end_index + shift, value)."""

    def __init__(self, automaton, string, start, end, ignore_white_space=False):
        self._automaton = automaton
        self._version = automaton._version
        self._compiled = automaton._compiled
        self._ignore_white_space = bool(ignore_white_space)
        self._shift = 0
        self._halo = np.empty(0, dtype=np.int32)  # classes fed so far (tail)
        self._index = -1
        self._carry_pids = np.empty(0, dtype=np.int64)
        self._load_chunk(string, start, end)

    # -- chunk management ---------------------------------------------------

    def _load_chunk(self, string, start, end):
        letters = self._automaton._marshal_haystack(string)
        n = letters.size
        start = min(max(start, 0), n)
        end = min(max(end, 0), n)
        self._end = end

        segment = letters[start:end]
        if self._ignore_white_space:
            keep = _nonspace_mask(segment)
            fed_positions = np.nonzero(keep)[0] + start
            segment = segment[keep]
        else:
            fed_positions = None

        cls = self._compiled.classes_of(segment).astype(np.int32)
        # retain continuation classes for a future set() call
        H = max(int(self._compiled.longest_word), 1)
        self._all_cls = cls
        # map from absolute position -> count of fed classes up to it, needed
        # when set() is called mid-iteration (state must roll back to the last
        # reported position)
        self._fed_positions = fed_positions
        self._start = start
        if cls.size >= H:  # avoid a full-chunk copy just for the tail
            self._halo_if_exhausted = cls[-H:].copy()
        else:
            self._halo_if_exhausted = np.concatenate([self._halo, cls])[-H:]
        # matches are computed per window (bounded memory), not per chunk
        self._wcursor = 0
        self._first_window = True
        self._positions = np.empty(0, dtype=np.int64)
        self._pids = np.empty(0, dtype=np.int64)
        self._cursor = 0
        self._next_window()

    def _next_window(self) -> bool:
        """Compute matches for the next window of the current chunk; returns
        False when the chunk is exhausted."""
        cls = self._all_cls
        wc = self._wcursor
        if not self._first_window and wc >= cls.size:
            return False
        H = max(int(self._compiled.longest_word), 1)
        chunk = cls[wc : wc + _iter_window()]
        halo = np.concatenate([self._halo, cls[max(wc - H, 0) : wc]])[-H:]
        pos, pids = engines.emit(self._compiled, chunk, halo)
        pos = pos + wc
        if self._fed_positions is not None:
            positions = self._fed_positions[pos] if pos.size else pos
        else:
            positions = pos + self._start
        if self._first_window and self._carry_pids.size:
            # output chain kept across set() without reset: the reference
            # reports these leftovers at index -1 + shift
            # (src/AutomatonSearchIter.c:157-197,343-356)
            positions = np.concatenate(
                [np.full(self._carry_pids.size, -1, dtype=np.int64), positions]
            )
            pids = np.concatenate([self._carry_pids, pids])
            self._carry_pids = np.empty(0, dtype=np.int64)
        self._first_window = False
        self._wcursor = wc + chunk.size
        self._positions = positions
        self._pids = pids.astype(np.int64, copy=False)
        self._cursor = 0
        return True

    def _halo_at_index(self) -> np.ndarray:
        """Continuation classes as of self._index (last reported position)."""
        H = max(int(self._compiled.longest_word), 1)
        if self._index < 0:
            return self._halo
        if self._index >= self._end:
            return self._halo_if_exhausted
        # number of fed chars with position <= index
        if self._fed_positions is not None:
            nfed = int(np.searchsorted(self._fed_positions, self._index, "right"))
        else:
            nfed = self._index - self._start + 1
        return np.concatenate([self._halo, self._all_cls[:nfed]])[-H:]

    # -- iterator protocol --------------------------------------------------

    def __iter__(self):
        return self

    def __next__(self):
        if self._version != self._automaton._version:
            raise ValueError(_INVALIDATED_MSG)
        while True:
            if self._cursor < self._positions.size:
                i = self._cursor
                self._cursor += 1
                self._index = int(self._positions[i])
                value = self._automaton._value_of_pid(int(self._pids[i]))
                return (self._index + self._shift, value)
            if not self._next_window():
                break
        self._index = self._end
        raise StopIteration

    def _pending_pids(self) -> np.ndarray:
        """Unemitted fail-chain outputs at the current position (the
        reference's live ``iter->output`` chain)."""
        c, pos = self._cursor, self._positions
        if c >= pos.size:
            return np.empty(0, dtype=np.int64)
        if c > 0:
            ref = pos[c - 1]
        elif pos.size and pos[0] == -1:
            ref = -1  # carried pending from an earlier set()
        else:
            return np.empty(0, dtype=np.int64)
        stop = int(np.searchsorted(pos, ref, side="right"))
        if stop <= c:
            return np.empty(0, dtype=np.int64)
        return self._pids[c:stop].astype(np.int64)

    def set(self, string, reset=False):
        """Swap the input keeping (or resetting) automaton state and shift
        (reference: src/AutomatonSearchIter.c:303-368)."""
        if reset:
            self._shift = 0
            self._halo = np.empty(0, dtype=np.int32)
            self._carry_pids = np.empty(0, dtype=np.int64)
        else:
            self._carry_pids = self._pending_pids()
            self._halo = self._halo_at_index()
            if self._index >= 0:
                self._shift += self._index
        self._index = -1
        letters_len = len(string)
        self._load_chunk(string, 0, letters_len)


class SearchIterLong:
    """Longest non-overlapping match scan (reference-exact, incl. the
    single-level fail-word early-emission rule of issue 133)."""

    def __init__(self, automaton, string, start, end):
        self._automaton = automaton
        self._version = automaton._version
        self._compiled = automaton._compiled
        self._shift = 0
        self._state = 0
        self._last_index = -1
        self._last_pid = -1
        self._index = start - 1
        from . import native

        self._batch = native.available()
        self._load(string, start, end)

    def _load(self, string, start, end):
        letters = self._automaton._marshal_haystack(string)
        self._cls = self._compiled.classes_of(letters).astype(np.int32)
        self._end = end
        if self._batch:
            from . import native

            st0 = (self._state, self._index, self._last_pid, self._last_index)
            pos, pids, stf = native.iter_long_scan(
                self._compiled, self._cls, end, st0
            )
            self._bpos = pos
            self._bpids = pids
            self._bfinal = stf
            self._bcursor = 0

    def __iter__(self):
        return self

    def _emit(self):
        value = self._automaton._value_of_pid(self._last_pid)
        result = (self._shift + self._last_index, value)
        # restart at root right after the emitted match (non-overlap rule)
        self._state = 0
        self._index = self._last_index
        self._last_pid = -1
        self._last_index = -1
        return result

    def __next__(self):
        if self._version != self._automaton._version:
            raise ValueError(_INVALIDATED_MSG)

        if self._batch:
            # native batch replay: at every yield boundary the machine state
            # is exactly (root, index=pos_k, no pending), so replay is
            # faithful including mid-stream set()
            if self._bcursor < self._bpos.size:
                i = self._bcursor
                self._bcursor += 1
                pos = int(self._bpos[i])
                value = self._automaton._value_of_pid(int(self._bpids[i]))
                self._state, self._index = 0, pos
                self._last_pid, self._last_index = -1, -1
                return (self._shift + pos, value)
            self._state, _idx, self._last_pid, self._last_index = self._bfinal
            self._index = self._end  # reference semantics at exhaustion
            raise StopIteration

        c_ = self._compiled
        delta, depth, word_id, fail = c_.delta, c_.depth, c_.word_id, c_.fail

        if self._last_pid != -1:
            return self._emit()

        self._index += 1
        while self._index < self._end:
            c = int(self._cls[self._index]) if self._index < self._cls.size else 0
            s = self._state
            nxt = int(delta[s, c])
            direct = int(depth[nxt]) == int(depth[s]) + 1
            if direct:
                if word_id[nxt] != -1:
                    self._last_pid = int(word_id[nxt])
                    self._last_index = self._index
                else:
                    f = int(fail[nxt])
                    if f != 0 and word_id[f] != -1:
                        self._last_pid = int(word_id[f])
                        self._last_index = self._index
                        return self._emit()
                self._state = nxt
                self._index += 1
            else:
                if self._last_pid != -1:
                    return self._emit()
                if nxt == 0:
                    # no fail-chain node has this edge: consume the char
                    self._state = 0
                    self._index += 1
                else:
                    # an ancestor had the edge; take it (with word checks)
                    if word_id[nxt] != -1:
                        self._last_pid = int(word_id[nxt])
                        self._last_index = self._index
                    else:
                        f = int(fail[nxt])
                        if f != 0 and word_id[f] != -1:
                            self._last_pid = int(word_id[f])
                            self._last_index = self._index
                            return self._emit()
                    self._state = nxt
                    self._index += 1

        if self._last_pid != -1:
            return self._emit()
        raise StopIteration

    def set(self, string, reset=False):
        if not reset and self._index >= 0:
            self._shift += self._index
        if reset:
            self._state = 0
            self._shift = 0
            self._last_pid = -1
            self._last_index = -1
        self._index = -1
        self._load(string, 0, len(string))


class ItemsIter:
    """DFS over the host trie for keys()/values()/items()."""

    KEYS = 0
    VALUES = 1
    ITEMS = 2

    def __init__(self, automaton, kind, pattern, use_wildcard, wildcard, matchtype):
        self._automaton = automaton
        self._version = automaton._version
        self._kind = kind
        self._pattern = pattern  # list of int letters
        self._use_wildcard = use_wildcard
        self._wildcard = wildcard
        self._matchtype = matchtype
        self._buffer = []
        root = automaton._trie.root
        self._stack = [(root, 0, 0)] if root is not None else []

    def __iter__(self):
        return self

    def __next__(self):
        if self._version != self._automaton._version:
            raise ValueError(
                "The underlying automaton has changed: this iterator "
                "is no longer valid."
            )
        plen = len(self._pattern)
        while self._stack:
            node, letter, depth = self._stack.pop()

            if self._matchtype != MATCH_AT_LEAST_PREFIX and depth > plen:
                continue

            if self._matchtype == MATCH_EXACT_LENGTH:
                output = depth == plen
            elif self._matchtype == MATCH_AT_MOST_PREFIX:
                output = depth <= plen
            else:
                output = depth >= plen

            # push children: all of them beyond the pattern or on a wildcard
            # position, else only the single pattern letter
            if depth >= plen or (
                self._use_wildcard and self._pattern[depth] == self._wildcard
            ):
                for lt, child in node.children.items():
                    self._stack.append((child, lt, depth + 1))
            else:
                child = node.children.get(self._pattern[depth])
                if child is not None:
                    self._stack.append((child, self._pattern[depth], depth + 1))

            if self._kind != ItemsIter.VALUES:
                del self._buffer[depth - 1 if depth else 0 :]
                if depth:
                    self._buffer.append(letter)

            if output and node.eow:
                if self._kind == ItemsIter.KEYS:
                    return self._automaton._key_of_letters(self._buffer)
                elif self._kind == ItemsIter.VALUES:
                    return node.value
                else:
                    return (
                        self._automaton._key_of_letters(self._buffer),
                        node.value,
                    )
        raise StopIteration
