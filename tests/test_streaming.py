"""Streaming bulk APIs: chunked counts/matches must equal whole-corpus runs."""

import numpy as np

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu import streaming


def build(words):
    A = ahocorasick.Automaton()
    for w in words:
        A.add_word(w, w)
    A.make_automaton()
    return A


def test_chunked_counts_match_whole(rng, engine):
    words = {"ab", "bab", "abab", "bb"}
    A = build(words)
    hay = "".join("ab"[c] for c in rng.integers(0, 2, 10000))
    whole = A.count_matches(hay)
    chunks = [hay[i : i + 777] for i in range(0, len(hay), 777)]
    chunked = streaming.count_matches_chunks(A, chunks)
    assert np.array_equal(whole, chunked)


def test_chunked_iter_matches_whole(rng, engine):
    words = {"he", "her", "hers", "she"}
    A = build(words)
    hay = "_sherhershe_ ushers " * 50
    whole = list(A.iter(hay))
    chunks = [hay[i : i + 13] for i in range(0, len(hay), 13)]
    got = list(streaming.iter_matches_chunks(A, chunks))
    assert got == whole


def test_tool_dump2dot():
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.dump2dot import dump2dot

    A = build(["he", "she"])
    dot = dump2dot(A)
    assert dot.startswith("digraph")
    assert "doublecircle" in dot  # eow nodes
    assert "->" in dot
