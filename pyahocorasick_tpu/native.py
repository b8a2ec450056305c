"""Bindings for the native host core (_native/module.cpp + core.cpp).

The primary binding is the CPython extension ``_ahocore`` (METH_FASTCALL,
zero-copy str access) — per-call overhead is what lets trie mutation match the
reference C extension's build speed.  When the extension has not been built
(``make -C pyahocorasick_tpu/_native``), the pure-Python trie serves as the
fallback and differential oracle.  PYAHOCORASICK_TPU_NATIVE=0 forces Python.

Keys passed to the trie layer are either ``str`` (KEY_STRING fast path) or
contiguous uint32 numpy arrays (KEY_SEQUENCE, already validated upstream).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

_EXT = None
_TRIED = False


def _load():
    global _EXT, _TRIED
    if _TRIED:
        return _EXT
    _TRIED = True
    if os.environ.get("PYAHOCORASICK_TPU_NATIVE", "1") == "0":
        return None
    try:
        from ._native import _ahocore  # type: ignore

        _EXT = _ahocore
        _warn_if_stale()
    except ImportError:
        _EXT = _try_autobuild()
    return _EXT


def _try_autobuild():
    """Build the extension in-place on first import when the .so is absent
    (fresh checkouts).  Fails quietly to the Python fallback."""
    if os.environ.get("PYAHOCORASICK_TPU_AUTOBUILD", "1") == "0":
        return None
    import subprocess
    import sys

    d = os.path.join(os.path.dirname(__file__), "_native")
    try:
        subprocess.run(
            ["make", "-s"],
            cwd=d,
            check=True,
            timeout=300,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
    except Exception:
        return None
    try:
        import importlib

        return importlib.import_module(
            "._native._ahocore", package=__package__
        )
    except ImportError:
        return None


def _warn_if_stale():
    """Warn when the built extension predates its sources."""
    import warnings

    d = os.path.join(os.path.dirname(__file__), "_native")
    try:
        so = max(
            os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.startswith("_ahocore") and f.endswith(".so")
        )
        src = max(
            os.path.getmtime(os.path.join(d, f))
            for f in ("core.cpp", "module.cpp")
        )
        if src > so:
            warnings.warn(
                "pyahocorasick_tpu native core is older than its sources; "
                "run `make -C pyahocorasick_tpu/_native`",
                RuntimeWarning,
            )
    except (OSError, ValueError):
        pass


def available() -> bool:
    return _load() is not None


def _as_u32(key) -> np.ndarray:
    return np.ascontiguousarray(key, dtype=np.uint32)


class NativeTrie:
    """Drop-in counterpart of trie.Trie backed by the C++ arena trie.

    Values (arbitrary Python objects) live in the extension's per-trie
    value store (one strong reference per node id, see module.cpp PyTrie)
    — the round-3 host-side dict cost ~0.3 us of PyLong boxing + dict ops
    per add/get vs the reference's in-node value pointer.
    """

    def __init__(self):
        self._ext = _load()
        self._h = self._ext.new()

    @property
    def root(self):
        if not self._ext.has_root(self._h):
            return None
        return NativeNodeRef(self, 0)

    def add_word(self, key):
        if isinstance(key, str):
            nid, new = self._ext.add_word(self._h, key)
        else:
            nid, new = self._ext.add_word_buf(self._h, _as_u32(key))
        return NativeNodeRef(self, nid), bool(new)

    def remove_word(self, key):
        if isinstance(key, str):
            found, old = self._ext.remove_word(self._h, key)
        else:
            found, old = self._ext.remove_word_buf(self._h, _as_u32(key))
        if not found:
            return False, None
        return True, self._ext.val_pop(self._h, old)

    def find(self, key):
        if isinstance(key, str):
            nid = self._ext.find(self._h, key)
        else:
            nid = self._ext.find_buf(self._h, _as_u32(key))
        if nid < 0:
            return None
        return NativeNodeRef(self, nid)

    def longest_prefix(self, key) -> int:
        if isinstance(key, str):
            return self._ext.longest_prefix(self._h, key)
        return self._ext.longest_prefix_buf(self._h, _as_u32(key))

    def clear(self):
        self._ext.clear(self._h)  # also clears the value store

    def bfs_arrays(self):
        S = self._ext.bfs_size(self._h)
        if S == 0:
            return None
        parent = np.empty(S, np.uint32)
        letter = np.empty(S, np.uint32)
        eow = np.empty(S, np.uint8)
        slot = np.empty(S, np.int64)
        self._ext.bfs_export(self._h, parent, letter, eow, slot)
        eow_rows = np.nonzero(eow)[0]
        ext, h = self._ext, self._h
        values = [ext.val_get(h, s) for s in slot[eow_rows].tolist()]
        return parent, letter, eow, values

    def import_arrays(self, parent, letter, eow, values):
        parent = np.ascontiguousarray(parent, np.uint32)
        letter = np.ascontiguousarray(letter, np.uint32)
        eow_arr = np.ascontiguousarray(eow, np.uint8)
        self._ext.import_arrays(self._h, parent, letter, eow_arr)
        ext, h = self._ext, self._h
        for i, nid in enumerate(np.nonzero(eow_arr)[0].tolist()):
            ext.val_set(h, nid, values[i])

    def stats(self):
        nodes, words, links, depth_max, total = self._ext.stats(self._h)
        return {
            "nodes_count": nodes,
            "words_count": words,
            "longest_word": depth_max,
            "links_count": links,
            "sizeof_node": 32,
            "total_size": total,
        }


class NativeNodeRef:
    __slots__ = ("_trie", "_id")

    def __init__(self, trie: NativeTrie, nid: int):
        self._trie = trie
        self._id = int(nid)

    @property
    def eow(self) -> bool:
        return self._trie._ext.node_eow(self._trie._h, self._id)

    @property
    def value(self):
        return self._trie._ext.val_get(self._trie._h, self._id)

    @value.setter
    def value(self, v):
        t = self._trie
        t._ext.val_set(t._h, self._id, v)
        t._ext.set_value(t._h, self._id, self._id)

    @property
    def children(self):
        """Insertion-ordered {letter: NativeNodeRef}; used by the
        keys()/items() DFS only."""
        t = self._trie
        return {
            letter: NativeNodeRef(t, child)
            for letter, child in t._ext.node_edges(t._h, self._id)
        }


# ---------------------------------------------------------------------------
# sequential scans on compiled tables (host fast path)
# ---------------------------------------------------------------------------


def scan_states(compiled, cls: np.ndarray, state: int = 0) -> np.ndarray:
    ext = _load()
    cls = np.ascontiguousarray(cls, dtype=np.int32)
    out = np.empty(cls.size, np.int32)
    ext.scan_states(compiled.delta, compiled.num_classes, cls, state, out)
    return out


_BLOCKED_MIN = 4096


def scan_states_blocked(compiled, cls: np.ndarray, halo=None) -> np.ndarray:
    """Interleaved-lane host scan (DRAM-latency hiding); exact via the halo
    property.  ``halo`` = previously consumed classes (tail kept)."""
    ext_mod = _load()
    H = max(int(compiled.longest_word), 1)
    if halo is not None and halo.size:
        h = np.ascontiguousarray(halo[-H:], dtype=np.int32)
        buf = np.concatenate([h, np.ascontiguousarray(cls, np.int32)])
        out = np.empty(buf.size, np.int32)
        ext_mod.scan_states_blocked(
            compiled.delta, compiled.num_classes, buf, H, out
        )
        return out[h.size :]
    cls = np.ascontiguousarray(cls, dtype=np.int32)
    out = np.empty(cls.size, np.int32)
    ext_mod.scan_states_blocked(compiled.delta, compiled.num_classes, cls, H, out)
    return out


def scan_states_parallel(
    compiled, cls: np.ndarray, halo=None, threads: int | None = None
) -> np.ndarray:
    """Multi-threaded blocked scan: slices share nothing (each thread's slice
    carries its own exact halo) and the C loops release the GIL, so this
    scales with cores."""
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    if threads is None:
        # opt-in: on memory-starved hosts extra threads can thrash the
        # miss-parallelism the 16 interleaved lanes already use
        threads = int(_os.environ.get("PYAHOCORASICK_TPU_HOST_THREADS", 1))
    N = int(cls.size)
    if threads <= 1 or N < 1 << 18:
        return scan_states_blocked(compiled, cls, halo)

    ext_mod = _load()
    H = max(int(compiled.longest_word), 1)
    if halo is not None and halo.size:
        h = np.ascontiguousarray(halo[-H:], dtype=np.int32)
        buf = np.concatenate([h, np.ascontiguousarray(cls, np.int32)])
        off = h.size
    else:
        buf = np.ascontiguousarray(cls, dtype=np.int32)
        off = 0
    total = buf.size
    out = np.empty(total, np.int32)
    per = -(-N // threads)

    def work(i):
        lo = off + i * per          # absolute slice start in buf
        hi = min(lo + per, total)
        if hi <= lo:
            return
        start = max(lo - H, 0)
        seg = buf[start:hi]
        seg_out = np.empty(seg.size, np.int32)
        ext_mod.scan_states_blocked(
            compiled.delta, compiled.num_classes, seg, H, seg_out
        )
        out[lo:hi] = seg_out[lo - start :]

    with ThreadPoolExecutor(max_workers=threads) as pool:
        list(pool.map(work, range(threads)))
    return out[off:]


def emit_from_states(compiled, states: np.ndarray, base: int = 0):
    """(positions, pids) from precomputed states, reference order."""
    ext = _load()
    states = np.ascontiguousarray(states, np.int32)
    n = ext.emit_from_states(
        compiled.match_count,
        compiled.out_offsets,
        compiled.out_ids,
        states,
        base,
        None,
        None,
        0,
    )
    pos = np.empty(n, np.int64)
    pid = np.empty(n, np.int32)
    if n:
        ext.emit_from_states(
            compiled.match_count,
            compiled.out_offsets,
            compiled.out_ids,
            states,
            base,
            pos,
            pid,
            n,
        )
    return pos, pid


def scan_emit(compiled, cls: np.ndarray, state: int = 0, base: int = 0):
    """Returns (positions i64[], pids i32[], final_state) in reference order."""
    ext = _load()
    cls = np.ascontiguousarray(cls, dtype=np.int32)
    empty64 = np.empty(0, np.int64)
    n, _fin = ext.scan_emit(
        compiled.delta,
        compiled.num_classes,
        compiled.match_count,
        compiled.out_offsets,
        compiled.out_ids,
        cls,
        state,
        base,
        None,
        None,
        0,
    )
    pos = np.empty(n, np.int64)
    pid = np.empty(n, np.int32)
    _, fin = ext.scan_emit(
        compiled.delta,
        compiled.num_classes,
        compiled.match_count,
        compiled.out_offsets,
        compiled.out_ids,
        cls,
        state,
        base,
        pos,
        pid,
        n,
    )
    return pos, pid, int(fin)


def scan_emit_sparse(compiled, cls: np.ndarray, halo=None, base: int = 0):
    """Sequential scan + emission on the SPARSE automaton (no dense table
    needed): goto via child runs + fail chains, reference scan-loop shape.
    Returns (positions i64[], pids i32[], final_state)."""
    ext = _load()
    cls = np.ascontiguousarray(cls, dtype=np.int32)
    state = 0
    if halo is not None and halo.size:
        H = max(int(compiled.longest_word), 1)
        h = np.ascontiguousarray(halo[-H:], dtype=np.int32)
        _, state = ext.scan_emit_sparse(
            compiled.edge_cls, compiled.child_off, compiled.fail,
            compiled.root_goto, compiled.match_count, compiled.out_offsets,
            compiled.out_ids, h, 0, 0, None, None, 0,
        )
    n, _fin = ext.scan_emit_sparse(
        compiled.edge_cls, compiled.child_off, compiled.fail,
        compiled.root_goto, compiled.match_count, compiled.out_offsets,
        compiled.out_ids, cls, state, base, None, None, 0,
    )
    pos = np.empty(n, np.int64)
    pid = np.empty(n, np.int32)
    _, fin = ext.scan_emit_sparse(
        compiled.edge_cls, compiled.child_off, compiled.fail,
        compiled.root_goto, compiled.match_count, compiled.out_offsets,
        compiled.out_ids, cls, state, base, pos, pid, n,
    )
    return pos, pid, int(fin)


def resolve_states(compiled, cls: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """States at sparse positions via <=H host transitions each (halo
    property); cls must include any needed preceding context."""
    ext = _load()
    cls = np.ascontiguousarray(cls, dtype=np.int32)
    pos = np.ascontiguousarray(positions, dtype=np.int64)
    out = np.empty(pos.size, np.int32)
    H = max(int(compiled.longest_word), 1)
    ext.resolve_states(compiled.delta, compiled.num_classes, cls, pos, H, out)
    return out


def patch_deep(compiled, cls: np.ndarray, groups: np.ndarray, span: int,
               d: int, base: int = 0):
    """Deep-episode patch for the hot/cold engine (ops/hotcold.py): re-scan
    the flagged groups with the sparse full automaton, emitting only matches
    of length > d (the hot scan is exact for shorter ones).  Returns
    (pos i64[], pid i32[]), position-sorted."""
    ext = _load()
    cls = np.ascontiguousarray(cls, dtype=np.int32)
    groups = np.ascontiguousarray(groups, dtype=np.int64)
    wlen = np.ascontiguousarray(compiled.word_len, dtype=np.int32)
    depth = np.ascontiguousarray(compiled.depth, dtype=np.int32)
    warm = max(int(compiled.longest_word), int(d))
    head = (
        compiled.edge_cls, compiled.child_off, compiled.fail,
        compiled.root_goto, depth, compiled.match_count,
        compiled.out_offsets, compiled.out_ids, wlen, cls, groups,
        int(span), int(d), warm, int(base),
    )
    n = ext.patch_deep(*head, None, None, 0)
    pos = np.empty(n, np.int64)
    pid = np.empty(n, np.int32)
    if n:
        ext.patch_deep(*head, pos, pid, n)
    return pos, pid


def hist3(cls: np.ndarray, K: int, start: int = 0):
    """3-gram-code histogram (int64, K**3 bins) over positions >=
    max(start, 2), or None when the extension is unavailable.  Releases the
    GIL, so it overlaps device dispatch in the cascade hybrid mode."""
    ext = _load()
    if ext is None or not hasattr(ext, "hist3"):
        return None
    cls = np.ascontiguousarray(cls, dtype=np.int32)
    hist = np.zeros(int(K) ** 3, np.int64)
    ext.hist3(cls, int(K), int(start), hist)
    return hist


def emit_short(cls: np.ndarray, K: int, vstart: int, lut1, lut2, lut3):
    """(end_positions int64, pattern_ids int32) for every length<=3 match,
    via a single C++ pass over the K^l id LUTs (length-descending at equal
    end = reference fail-chain order).  None when the extension is missing.
    Releases the GIL, so it overlaps device work in the cascade hybrid."""
    ext = _load()
    if ext is None or not hasattr(ext, "emit_short"):
        return None
    cls = np.ascontiguousarray(cls, dtype=np.int32)
    empty = np.empty(0, np.int32)

    def prep(lut):
        return empty if lut is None else np.ascontiguousarray(lut, np.int32)

    pos_b, id_b = ext.emit_short(
        cls, int(K), int(vstart), prep(lut1), prep(lut2), prep(lut3)
    )
    return (
        np.frombuffer(pos_b, dtype=np.int64),
        np.frombuffer(id_b, dtype=np.int32),
    )


def iter_long_scan(compiled, cls: np.ndarray, end: int, state_tuple, cap=None):
    """Batch iter_long over cls[state.index+1:end].

    Returns (positions, pids, new_state_tuple); state_tuple =
    (state, index, last_pid, last_index)."""
    ext = _load()
    cls = np.ascontiguousarray(cls, dtype=np.int32)
    st0 = tuple(state_tuple)
    if cap is None:
        # guess low; the scan still counts everything and we re-run with the
        # exact size if the guess was short
        cap = min(max(int(end) - int(st0[1]), 1), 1 << 20)

    def run(c):
        pos = np.empty(c, np.int64)
        pid = np.empty(c, np.int32)
        n, st = ext.iter_long_scan(
            compiled.delta,
            compiled.num_classes,
            compiled.depth,
            compiled.word_id,
            compiled.fail,
            cls,
            int(end),
            st0,
            pos,
            pid,
            c,
        )
        return pos, pid, n, st

    pos, pid, n, st = run(cap)
    if n > cap:
        pos, pid, n, st = run(n)
    return pos[:n], pid[:n], st
