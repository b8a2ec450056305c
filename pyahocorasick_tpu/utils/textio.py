"""Input marshalling: Python keys/haystacks -> uint32 letter arrays.

The framework operates on a single unified letter domain: uint32 code units.

* ``str`` keys/haystacks become arrays of Unicode code points (the reference's
  UCS-4 unicode build; src/common.h:50-67, src/utils.c:145-236).
* ``KEY_SEQUENCE`` keys/haystacks are tuples of ints in [0, 2**32-1]
  (src/utils.c:238-289).

Using numpy arrays makes long-haystack conversion a single vectorized
``encode('utf-32-le')`` + ``frombuffer`` instead of a per-character loop.
Error types/messages mirror the reference implementation.
"""

from __future__ import annotations

import operator

import numpy as np

from ..constants import KEY_SEQUENCE, KEY_STRING

_EMPTY_U32 = np.empty(0, dtype=np.uint32)


def _letters_of_str(s: str) -> np.ndarray:
    if not s:
        return _EMPTY_U32
    # UTF-32-LE is exactly the UCS-4 code point sequence.
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


def _letters_of_tuple(t: tuple) -> np.ndarray:
    # Mirrors __read_sequence__from_tuple (src/utils.c:238-276): each item must
    # be a number in [0, 4294967295].
    n = len(t)
    out = np.empty(n, dtype=np.uint32)
    for i, item in enumerate(t):
        try:
            value = item.__index__()
        except AttributeError:
            raise ValueError("item #%d is not a number" % i) from None
        if value < 0 or value > 0xFFFFFFFF:
            raise ValueError(
                "item #%d: value %d outside range [0..4294967295]" % (i, value)
            )
        out[i] = value
    return out


def letters_of_key(obj, key_type: int) -> np.ndarray:
    """Convert a key object to a uint32 letter array (reference: prepare_input,
    src/utils.c:362-409)."""
    if key_type == KEY_STRING:
        if not isinstance(obj, str):
            raise TypeError("string expected")
        return _letters_of_str(obj)
    elif key_type == KEY_SEQUENCE:
        if not isinstance(obj, tuple):
            raise TypeError("argument is not a supported sequence type")
        return _letters_of_tuple(obj)
    else:  # pragma: no cover - internal invariant
        raise SystemError("invalid key_type")


def letters_of_haystack(obj, key_type: int) -> np.ndarray:
    """Convert a search-input object to a uint32 letter array.

    The reference's iter()/iter_long() require str (unicode build) for
    KEY_STRING automatons and tuple for KEY_SEQUENCE (src/Automaton.c:903-964).
    """
    if key_type == KEY_STRING:
        if not isinstance(obj, str):
            raise TypeError("string required")
        return _letters_of_str(obj)
    else:
        if not isinstance(obj, tuple):
            raise TypeError("tuple required")
        return _letters_of_tuple(obj)


def key_from_letters(letters, key_type: int):
    """Inverse conversion used by keys()/items() to materialize keys."""
    if key_type == KEY_STRING:
        return "".join(map(chr, letters))
    return tuple(int(x) for x in letters)


def parse_start_end(args, idx_start, idx_end, min_, max_):
    """Reference-exact optional [start[, end]] parsing including the negative
    index quirks (src/utils.c:292-359: negative start means ``max + start`` but
    negative end means ``max - 1 + end``)."""
    start, end = min_, max_

    if len(args) > idx_start:
        start = operator.index(args[idx_start])
        if start < 0:
            start = max_ + start
        if start < min_ or start >= max_:
            raise IndexError("start index not in range %d..%d" % (min_, max_))

        if len(args) > idx_end:
            end = operator.index(args[idx_end])
            if end < 0:
                end = max_ - 1 + end
            if end < min_ or end > max_:
                raise IndexError("end index not in range %d..%d" % (min_, max_))

    return start, end
