"""Mirrors of the reference's per-issue regression tests
(reference tests/test_issue_*.py) plus edge semantics from test_unit.py."""

import pickle

import pytest

import pyahocorasick_tpu as ahocorasick


def build(words, store=None):
    A = ahocorasick.Automaton(*([] if store is None else [store]))
    for w in words:
        if store in (ahocorasick.STORE_INTS, ahocorasick.STORE_LENGTH):
            A.add_word(w)
        else:
            A.add_word(w, w)
    A.make_automaton()
    return A


def test_issue10_start_end(engine):
    """find_all/iter respect [start, end) including negative indexing."""
    A = build(["he"])
    hits = []
    A.find_all("he he he", lambda i, v: hits.append(i))
    assert hits == [1, 4, 7]
    hits = []
    A.find_all("he he he", lambda i, v: hits.append(i), 2)
    assert hits == [4, 7]
    hits = []
    A.find_all("he he he", lambda i, v: hits.append(i), 2, 5)
    assert hits == [4]
    with pytest.raises(IndexError):
        A.find_all("he", lambda *a: None, 99)


def test_issue26_store_ints_pickle():
    A = ahocorasick.Automaton(ahocorasick.STORE_INTS)
    for w in ["he", "she"]:
        A.add_word(w)
    A.make_automaton()
    B = pickle.loads(pickle.dumps(A))
    assert B.store == ahocorasick.STORE_INTS
    assert sorted(B.items()) == sorted(A.items())
    assert list(B.iter("ushers")) == list(A.iter("ushers"))


def test_issue56_find_all_equals_iter(engine):
    A = build(["he", "her", "hers", "she"])
    s = "_sherhershe_"
    got = []
    A.find_all(s, lambda i, v: got.append((i, v)))
    assert got == list(A.iter(s))


def test_issue19_clear_invalidates():
    A = build(["he"])
    it = A.iter("hehe")
    next(it)
    A.clear()
    with pytest.raises(ValueError):
        next(it)


def test_issue50_large_pickle():
    # many words -> multi-chunk-capable blob path exercises sizes
    A = ahocorasick.Automaton()
    for i in range(5000):
        A.add_word("w%05d" % i, i)
    A.make_automaton()
    B = pickle.loads(pickle.dumps(A))
    assert len(B) == 5000
    assert B.get("w04999") == 4999


def test_empty_automaton_pickle():
    A = ahocorasick.Automaton()
    B = pickle.loads(pickle.dumps(A))
    assert B.kind == ahocorasick.EMPTY
    assert len(B) == 0


def test_trie_only_pickle():
    A = ahocorasick.Automaton()
    A.add_word("abc", 1)
    B = pickle.loads(pickle.dumps(A))
    assert B.kind == ahocorasick.TRIE
    assert B.get("abc") == 1
    assert B.make_automaton() is None
    assert list(B.iter("xabcx")) == [(3, 1)]


def test_iter_sentinel_minus_one(engine):
    """start/end of -1 mean 'default' for iter() (reference
    automaton_iter start_tmp/end_tmp sentinels, src/Automaton.c:952-959)."""
    A = build(["he"])
    assert list(A.iter("hehe", -1, -1)) == [(1, "he"), (3, "he")]


def test_match_empty_string():
    A = ahocorasick.Automaton()
    assert not A.match("")  # EMPTY automaton: no root
    A.add_word("x", 1)
    assert A.match("")  # root exists -> empty prefix matches
    assert not A.exists("")
    assert A.longest_prefix("") == 0


def test_make_automaton_on_empty_returns_false():
    A = ahocorasick.Automaton()
    assert A.make_automaton() is False
    assert A.kind == ahocorasick.EMPTY


def test_add_after_remove_all():
    A = ahocorasick.Automaton()
    A.add_word("ab", 1)
    A.remove_word("ab")
    assert len(A) == 0
    assert A.add_word("cd", 2) is True
    A.make_automaton()
    assert list(A.iter("abcd")) == [(3, 2)]


def test_values_iterator_with_prefix():
    A = ahocorasick.Automaton()
    for w, v in [("he", 1), ("her", 2), ("she", 3)]:
        A.add_word(w, v)
    assert sorted(A.values("he")) == [1, 2]
    assert sorted(A.items("he")) == [("he", 1), ("her", 2)]
