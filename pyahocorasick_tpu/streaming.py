"""Streaming bulk APIs: scan corpora larger than memory, chunk by chunk.

The reference's streaming story is the iterator-level ``set()`` carry
(src/AutomatonSearchIter.c:303-368).  These helpers are the bulk/TPU-native
equivalent: the caller feeds chunks (bytes of a file, records of a dataset)
and the carry between device launches is just the last ``longest_word``
consumed classes (exact; see ops/cpu.py for why).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import numpy as np

from . import engines
from .constants import AHOCORASICK


def _require_automaton(automaton):
    if automaton._kind != AHOCORASICK:
        raise AttributeError(
            "not an automaton yet; add some words and call make_automaton"
        )
    return automaton._ensure_compiled()


def count_matches_chunks(automaton, chunks: Iterable) -> np.ndarray:
    """Per-pattern counts over a stream of haystack chunks."""
    compiled = _require_automaton(automaton)
    H = max(int(compiled.longest_word), 1)
    halo = np.empty(0, dtype=np.int32)
    total = np.zeros(compiled.num_patterns, dtype=np.int64)
    for chunk in chunks:
        letters = automaton._marshal_haystack(chunk)
        cls = compiled.classes_of(letters).astype(np.int32)
        total += engines.count_matches(compiled, cls, halo)
        halo = np.concatenate([halo, cls])[-H:]
    return total


def iter_matches_chunks(automaton, chunks: Iterable) -> Iterator[Tuple[int, object]]:
    """Yield (global_end_index, value) across a stream of chunks, in the
    reference's emission order, with global index accounting."""
    compiled = _require_automaton(automaton)
    H = max(int(compiled.longest_word), 1)
    halo = np.empty(0, dtype=np.int32)
    shift = 0
    values = compiled.values
    for chunk in chunks:
        letters = automaton._marshal_haystack(chunk)
        cls = compiled.classes_of(letters).astype(np.int32)
        positions, pids = engines.emit(compiled, cls, halo, base=shift)
        for pos, pid in zip(positions.tolist(), pids.tolist()):
            yield (pos, values[pid])
        halo = np.concatenate([halo, cls])[-H:]
        shift += int(letters.size)
