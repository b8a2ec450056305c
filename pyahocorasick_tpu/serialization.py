"""Persistence: pickle protocol + streaming save()/load().

Two formats, mirroring the reference's two subsystems:

* **Pickle** (reference: src/Automaton_pickle.c): ``__reduce__`` returns the
  7-tuple ``(blob_chunks, kind, store, key_type, count, longest_word, values)``
  and the Automaton constructor accepts it back.  Instead of raw C node
  structs, the blob holds the trie in BFS array form (parent ids, edge
  letters, eow bitmap) — chunked into <=16 MB bytes objects like the
  reference's pickle_data.c:29-125 so huge automatons never need one giant
  contiguous buffer.  Unpickling validates every structural invariant and
  raises ValueError on malformed/malicious input (the contract pinned by the
  reference's tests/test_unpickle.py).

* **save/load** (reference: src/custompickle/): streaming file format with a
  magic header/footer.  Values are serialized through a user callable for
  STORE_ANY (or stored as raw int64 otherwise), exactly like the reference's
  serializer/deserializer protocol.

The AHOCORASICK kind is restored by *recompiling* the dense DFA from the
restored trie — the compiled form is a pure function of the trie, so this
preserves semantics while keeping the wire format small and validatable.
"""

from __future__ import annotations

import struct

import numpy as np

from .constants import AHOCORASICK, STORE_ANY

PICKLE_MAGIC = b"pyahocorasick-tpu-pickle-01"
SAVE_MAGIC = b"pyahocorasick_tpu002"
CHUNK = 16 * 1024 * 1024  # reference uses 16 MB pickle chunks

_SAVE_HEADER = struct.Struct("<20siiiqqq")  # magic, kind, store, key_type, count, longest, S
_SAVE_FOOTER = struct.Struct("<20sq")


def _trie_to_arrays(automaton):
    """BFS-serialize the host trie: (parent u32[S], letter u32[S], eow u8[S],
    values list in BFS-eow order)."""
    arrays = automaton._trie.bfs_arrays()
    if arrays is None:
        return (
            np.empty(0, np.uint32),
            np.empty(0, np.uint32),
            np.empty(0, np.uint8),
            [],
        )
    return arrays


def _arrays_to_blob(parent, letter, eow) -> list:
    """Pack arrays into a list of <=16MB bytes chunks with a small header."""
    S = parent.size
    head = PICKLE_MAGIC + struct.pack("<q", S)
    payload = b"".join(
        [head, parent.tobytes(), letter.tobytes(), eow.tobytes()]
    )
    return [payload[i : i + CHUNK] for i in range(0, len(payload), CHUNK)] or [head]


def _blob_to_arrays(blob: list):
    for chunk in blob:
        if not isinstance(chunk, bytes):
            raise ValueError("Incorrect pickle data: expected bytes chunks.")
    payload = b"".join(blob)
    if len(payload) < len(PICKLE_MAGIC) + 8:
        raise ValueError("Incorrect pickle data: truncated header.")
    if payload[: len(PICKLE_MAGIC)] != PICKLE_MAGIC:
        raise ValueError("Incorrect pickle data: bad magic.")
    (S,) = struct.unpack_from("<q", payload, len(PICKLE_MAGIC))
    off = len(PICKLE_MAGIC) + 8
    if S < 0 or len(payload) != off + S * 4 + S * 4 + S:
        raise ValueError("Incorrect pickle data: size mismatch.")
    parent = np.frombuffer(payload, np.uint32, S, off)
    letter = np.frombuffer(payload, np.uint32, S, off + 4 * S)
    eow = np.frombuffer(payload, np.uint8, S, off + 8 * S)
    return parent, letter, eow


def _rebuild_trie(automaton, parent, letter, eow, values):
    """Reconstruct the host trie with full validation (the analog of
    automaton_unpickle's bounds checks, src/Automaton_pickle.c:326-488)."""
    from . import native
    from .trie import Trie, TrieNode

    S = parent.size
    if S == 0:
        automaton._trie = Trie()
        automaton._refresh_fastpath()
        return

    n_words = int(eow.sum())
    if values is not None and len(values) != n_words:
        raise ValueError("Incorrect pickle data: wrong number of values.")

    if S > 1:
        p = parent[1:].astype(np.int64)
        if (p >= np.arange(1, S)).any():
            # BFS order invariant: parent strictly precedes child
            raise ValueError("Incorrect pickle data: node id out of range.")
        # duplicate-edge check: (parent, letter) pairs must be unique
        key = p * (1 << 32) + letter[1:].astype(np.int64)
        if np.unique(key).size != S - 1:
            raise ValueError("Incorrect pickle data: duplicate edge.")

    if native.available():
        trie = native.NativeTrie()
        vlist = values if values is not None else [None] * n_words
        trie.import_arrays(parent, letter, eow, vlist)
        automaton._trie = trie
        automaton._refresh_fastpath()
        return

    trie = Trie()
    nodes = [TrieNode() for _ in range(S)]
    trie.root = nodes[0]
    vi = 0
    for i in range(1, S):
        par = nodes[int(parent[i])]
        par.children[int(letter[i])] = nodes[i]
    for i in range(S):
        if eow[i]:
            nodes[i].eow = True
            if values is not None:
                nodes[i].value = values[vi]
                vi += 1
    automaton._trie = trie
    automaton._refresh_fastpath()


def reduce_automaton(automaton):
    from .automaton import Automaton

    parent, letter, eow, values = _trie_to_arrays(automaton)
    blob = _arrays_to_blob(parent, letter, eow)
    return (
        automaton.__class__,
        (
            blob,
            automaton._kind,
            automaton._store,
            automaton._key_type,
            automaton._count,
            automaton._longest_word,
            values,
        ),
    )


def unpickle_into(automaton, blob, values):
    parent, letter, eow = _blob_to_arrays(blob)
    _rebuild_trie(automaton, parent, letter, eow, values)


# ----------------------------------------------------------------------
# streaming save/load (reference: src/custompickle/)
# ----------------------------------------------------------------------


def save_automaton(automaton, path, serializer):
    parent, letter, eow, values = _trie_to_arrays(automaton)
    S = parent.size
    with open(path, "wb") as f:
        f.write(
            _SAVE_HEADER.pack(
                SAVE_MAGIC,
                automaton._kind,
                automaton._store,
                automaton._key_type,
                automaton._count,
                automaton._longest_word,
                S,
            )
        )
        f.write(parent.tobytes())
        f.write(letter.tobytes())
        f.write(eow.tobytes())
        if automaton._store == STORE_ANY:
            for v in values:
                data = serializer(v)
                if not isinstance(data, bytes):
                    raise TypeError("serializer must return bytes")
                f.write(struct.pack("<q", len(data)))
                f.write(data)
        else:
            np.asarray(values, dtype=np.int64).tofile(f)
        f.write(_SAVE_FOOTER.pack(SAVE_MAGIC, S))


def load_automaton(path, deserializer, cls=None):
    """Module-level load(path, deserializer) (reference:
    src/custompickle/load/module_automaton_load.c:13-36)."""
    from .automaton import Automaton

    if not isinstance(path, str):
        raise TypeError("the first argument must be a string")
    if not callable(deserializer):
        raise TypeError("the second argument must be a callable object")

    automaton = (cls or Automaton)()
    with open(path, "rb") as f:
        head = f.read(_SAVE_HEADER.size)
        if len(head) != _SAVE_HEADER.size:
            raise ValueError("Failed to load automaton: truncated header.")
        magic, kind, store, key_type, count, longest_word, S = _SAVE_HEADER.unpack(head)
        if magic != SAVE_MAGIC:
            raise ValueError("Failed to load automaton: invalid magic string.")
        from .automaton import _check_kind, _check_key_type, _check_store

        _check_store(store)
        _check_kind(kind)
        _check_key_type(key_type)
        if S < 0 or count < 0 or longest_word < 0:
            raise ValueError("Failed to load automaton: corrupted header.")

        parent = np.fromfile(f, np.uint32, S)
        letter = np.fromfile(f, np.uint32, S)
        eow = np.fromfile(f, np.uint8, S)
        if parent.size != S or letter.size != S or eow.size != S:
            raise ValueError("Failed to load automaton: truncated node data.")
        n_words = int(eow.sum())
        if store == STORE_ANY:
            values = []
            for _ in range(n_words):
                lenb = f.read(8)
                if len(lenb) != 8:
                    raise ValueError("Failed to load automaton: truncated values.")
                (ln,) = struct.unpack("<q", lenb)
                if ln < 0:
                    raise ValueError("Failed to load automaton: corrupted value size.")
                data = f.read(ln)
                if len(data) != ln:
                    raise ValueError("Failed to load automaton: truncated values.")
                values.append(deserializer(data))
        else:
            values = np.fromfile(f, np.int64, n_words)
            if values.size != n_words:
                raise ValueError("Failed to load automaton: truncated values.")
            values = [int(v) for v in values]

        foot = f.read(_SAVE_FOOTER.size)
        if len(foot) != _SAVE_FOOTER.size:
            raise ValueError("Failed to load automaton: truncated footer.")
        fmagic, fS = _SAVE_FOOTER.unpack(foot)
        if fmagic != SAVE_MAGIC or fS != S:
            raise ValueError("Failed to load automaton: invalid footer.")

    _rebuild_trie(automaton, parent, letter, eow, values)
    automaton._kind = kind
    automaton._store = store
    automaton._key_type = key_type
    automaton._count = count
    automaton._longest_word = longest_word
    if kind == AHOCORASICK:
        automaton._recompile()
    return automaton
