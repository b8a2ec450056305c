"""Public enum constants of the ``pyahocorasick_tpu`` module.

These integer values are public API, chosen for drop-in compatibility with the
reference pyahocorasick module (reference: src/Automaton.h:16-41,
src/AutomatonItemsIter.h:26-30, exported in src/pyahocorasick.c:113-128).
"""

# Automaton.kind lifecycle (reference: src/Automaton.h:16-20)
EMPTY = 0
TRIE = 1
AHOCORASICK = 2

# Automaton value-store modes (reference: src/Automaton.h:27-31)
STORE_INTS = 10
STORE_LENGTH = 20
STORE_ANY = 30

# Automaton key types (reference: src/Automaton.h:38-41)
KEY_STRING = 100
KEY_SEQUENCE = 200

# keys()/values()/items() match modes (reference: src/AutomatonItemsIter.h:26-30)
MATCH_EXACT_LENGTH = 0
MATCH_AT_MOST_PREFIX = 1
MATCH_AT_LEAST_PREFIX = 2

# Build flavour flag: the reference exposes `ahocorasick.unicode` telling whether
# the C extension was compiled for str or bytes keys (src/pyahocorasick.c:130-134).
# This framework always supports full unicode str keys.
unicode = True
