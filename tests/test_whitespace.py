"""ignore_white_space searching (reference tests/test_unit.py:810-857)."""

import pytest

import pyahocorasick_tpu as ahocorasick

WORDS = "he her hers she".split()
STRING = "_sh e rher she_"
CORRECT = [
    (4, "she"),
    (4, "he"),
    (6, "her"),
    (8, "he"),
    (9, "her"),
    (11, "hers"),
    (13, "she"),
    (13, "he"),
]


def build():
    A = ahocorasick.Automaton()
    for w in WORDS:
        A.add_word(w, w)
    A.make_automaton()
    return A


def test_ignore_white_space(engine):
    A = build()
    assert list(A.iter(STRING, ignore_white_space=True)) == CORRECT


def test_ignore_white_space_start(engine):
    A = build()
    assert list(A.iter(STRING, ignore_white_space=True, start=12)) == [(13, "he")]


def test_without_flag_no_matches_across_space(engine):
    A = build()
    assert list(A.iter(STRING)) == [(8, "he"), (9, "her"), (13, "she"), (13, "he")]


def test_wrong_keyword():
    A = build()
    with pytest.raises(TypeError):
        A.iter(STRING, ignore_white_space2=True)


def test_streaming_with_whitespace(engine):
    A = build()
    it = A.iter("_sh ")
    assert list(it) == []
    # note: without ignore_white_space the space resets matching
    it.set("e")
    assert list(it) == []

    it2 = A.iter("_sh ", ignore_white_space=True)
    assert list(it2) == []
    it2.set("e")
    assert list(it2) == [(4, "she"), (4, "he")]
