"""Bytes-keyed variant of the Automaton (the reference's AHOCORASICK_BYTES
compile-time build, reference setup.py:16-33 / src/common.h:50-67, offered
here as a runtime class instead of a build flag).

``bytes_build.Automaton`` accepts and returns ``bytes`` keys; haystacks are
``bytes``; letters are the byte values 0..255.  Everything else (stores,
KEY_SEQUENCE mode, search semantics, persistence) is identical to the str
build.  Error messages mirror the reference bytes build ("bytes expected" /
"bytes required").
"""

from __future__ import annotations

import numpy as np

from . import automaton as _base
from .constants import KEY_SEQUENCE, KEY_STRING
from .utils import letters_of_key

# byte strings never contain unicode whitespace beyond ASCII + latin-1
unicode = False


class Automaton(_base.Automaton):
    _fast_str_keys = False  # keys are bytes; marshalling overridden below

    """Automaton keyed by bytes (letters = byte values)."""

    def _marshal_key(self, key):
        if self._key_type == KEY_STRING:
            if not isinstance(key, bytes):
                raise TypeError("bytes expected")
            return (
                np.frombuffer(key, dtype=np.uint8).astype(np.uint32),
                len(key),
            )
        arr = letters_of_key(key, KEY_SEQUENCE)
        return arr, int(arr.size)

    def _marshal_haystack(self, obj):
        if self._key_type == KEY_STRING:
            if not isinstance(obj, bytes):
                raise TypeError("bytes required")
            return np.frombuffer(obj, dtype=np.uint8).astype(np.uint32)
        return super()._marshal_haystack(obj)

    def _key_of_letters(self, letters):
        if self._key_type == KEY_STRING:
            return bytes(bytearray(int(x) for x in letters))
        return super()._key_of_letters(letters)

    def _items_iter(self, kind, args):
        # prefix/wildcard arguments are bytes in this build
        args = list(args)
        conv = []
        for i, a in enumerate(args[:2]):
            if a is None:
                conv.append(None)
            elif isinstance(a, bytes):
                conv.append(np.frombuffer(a, dtype=np.uint8).astype(np.uint32))
            else:
                raise TypeError("bytes expected")
        from .iterators import ItemsIter

        pattern = [int(x) for x in conv[0]] if len(conv) >= 1 and conv[0] is not None else []
        use_wildcard = False
        wildcard = 0
        if len(conv) >= 2 and conv[1] is not None:
            if conv[1].size != 1:
                raise ValueError("Wildcard must be a single character.")
            wildcard = int(conv[1][0])
            use_wildcard = True
        from .constants import (
            MATCH_AT_LEAST_PREFIX,
            MATCH_AT_MOST_PREFIX,
            MATCH_EXACT_LENGTH,
        )

        if len(args) >= 3 and args[2] is not None:
            matchtype = int(args[2])
            if matchtype not in (
                MATCH_AT_LEAST_PREFIX,
                MATCH_AT_MOST_PREFIX,
                MATCH_EXACT_LENGTH,
            ):
                raise ValueError(
                    "The optional how third argument must be one of: "
                    "MATCH_EXACT_LENGTH, MATCH_AT_LEAST_PREFIX or MATCH_AT_LEAST_PREFIX"
                )
        else:
            matchtype = MATCH_EXACT_LENGTH if use_wildcard else MATCH_AT_LEAST_PREFIX
        return ItemsIter(self, kind, pattern, use_wildcard, wildcard, matchtype)


def load(path, deserializer):
    from . import serialization

    result = serialization.load_automaton(path, deserializer, cls=Automaton)
    return result
