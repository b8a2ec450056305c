"""pyahocorasick_tpu — a TPU-native multi-pattern string search framework.

A from-scratch re-design of the capabilities of pyahocorasick
(https://github.com/WojciechMula/pyahocorasick) for TPU hardware:

* the mutable dict-like trie lives on the host;
* ``make_automaton()`` lowers it to a dense, alphabet-compacted DFA
  transition table (the classic "advanced" Aho-Corasick construction),
  vectorized per BFS level;
* searching runs as a lane-parallel halo-blocked scan under ``jax.jit``
  (XLA/Pallas), scaling across chips via ``jax.sharding`` meshes
  (see pyahocorasick_tpu.parallel);
* the reference's full Python API — iterators, streaming ``set()``,
  keys/values/items with wildcards, pickle and streaming save/load,
  stats/dump introspection — is preserved with exact semantics.

Drop-in usage:

    import pyahocorasick_tpu as ahocorasick
    A = ahocorasick.Automaton()
    A.add_word("hers", (0, "hers"))
    A.make_automaton()
    for end, val in A.iter("ushers"):
        ...
"""

from .automaton import Automaton
from .constants import (
    AHOCORASICK,
    EMPTY,
    KEY_SEQUENCE,
    KEY_STRING,
    MATCH_AT_LEAST_PREFIX,
    MATCH_AT_MOST_PREFIX,
    MATCH_EXACT_LENGTH,
    STORE_ANY,
    STORE_INTS,
    STORE_LENGTH,
    TRIE,
    unicode,
)


def load(*args):
    """Load an automaton saved with ``Automaton.save()`` (reference:
    src/custompickle/load/module_automaton_load.c:13-36)."""
    from . import serialization

    if len(args) != 2:
        raise ValueError("expected exactly two arguments")
    return serialization.load_automaton(args[0], args[1])


__version__ = "0.1.0"

__all__ = [
    "Automaton",
    "load",
    "EMPTY",
    "TRIE",
    "AHOCORASICK",
    "STORE_INTS",
    "STORE_LENGTH",
    "STORE_ANY",
    "KEY_STRING",
    "KEY_SEQUENCE",
    "MATCH_EXACT_LENGTH",
    "MATCH_AT_MOST_PREFIX",
    "MATCH_AT_LEAST_PREFIX",
    "unicode",
]
