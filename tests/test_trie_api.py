"""Dict-like trie API parity (reference tests/test_unit.py:54-390, 392-497)."""

import pytest

import pyahocorasick_tpu as ahocorasick


def test_add_word_returns():
    A = ahocorasick.Automaton()
    assert A.add_word("he", 1) is True
    assert A.add_word("he", 2) is False  # replace
    assert A.get("he") == 2
    assert A.add_word("", 3) is False
    assert len(A) == 1


def test_store_ints_default_value():
    A = ahocorasick.Automaton(ahocorasick.STORE_INTS)
    A.add_word("a")
    A.add_word("b")
    assert A.get("a") == 1
    assert A.get("b") == 2
    A.add_word("c", 42)
    assert A.get("c") == 42
    with pytest.raises(TypeError):
        A.add_word("d", "not an int")


def test_store_length():
    A = ahocorasick.Automaton(ahocorasick.STORE_LENGTH)
    A.add_word("hello")
    assert A.get("hello") == 5


def test_remove_word():
    A = ahocorasick.Automaton()
    for w in ["he", "her", "hers", "she"]:
        A.add_word(w, w)
    assert A.remove_word("her") is True
    assert A.remove_word("her") is False
    assert A.remove_word("") is False
    assert len(A) == 3
    assert "her" not in A
    assert "hers" in A  # tail preserved
    assert A.kind == ahocorasick.TRIE
    # structural: removing a leaf prunes the dangling tail
    assert A.remove_word("hers") is True
    assert "he" in A
    stats = A.get_stats()
    assert stats["words_count"] == 2


def test_remove_downgrades_kind():
    A = ahocorasick.Automaton()
    A.add_word("abc", 1)
    A.add_word("xyz", 2)
    A.make_automaton()
    assert A.kind == ahocorasick.AHOCORASICK
    A.remove_word("abc")
    assert A.kind == ahocorasick.TRIE


def test_pop():
    A = ahocorasick.Automaton()
    A.add_word("key", "value")
    assert A.pop("key") == "value"
    with pytest.raises(KeyError):
        A.pop("key")
    with pytest.raises(KeyError):
        A.pop("missing")
    assert len(A) == 0


def test_clear():
    A = ahocorasick.Automaton()
    A.add_word("x", 1)
    A.make_automaton()
    A.clear()
    assert A.kind == ahocorasick.EMPTY
    assert len(A) == 0
    assert "x" not in A


def test_exists_match_longest_prefix():
    A = ahocorasick.Automaton()
    A.add_word("hers", 1)
    assert A.exists("hers")
    assert not A.exists("her")
    assert A.match("her")
    assert A.match("hers")
    assert not A.match("x")
    assert A.longest_prefix("hershey") == 4
    assert A.longest_prefix("usher") == 0


def test_get():
    A = ahocorasick.Automaton()
    A.add_word("k", "v")
    assert A.get("k") == "v"
    assert A.get("missing", "default") == "default"
    with pytest.raises(KeyError):
        A.get("missing")
    with pytest.raises(TypeError):
        A.get("k", 1, 2)


def test_keys_values_items():
    A = ahocorasick.Automaton()
    words = {"he": 1, "her": 2, "hers": 3, "she": 4}
    for k, v in words.items():
        A.add_word(k, v)
    assert sorted(A.keys()) == sorted(words)
    assert sorted(A.values()) == sorted(words.values())
    assert sorted(A.items()) == sorted(words.items())
    assert sorted(A) == sorted(words)  # __iter__ == keys


def test_keys_prefix():
    A = ahocorasick.Automaton()
    for w in ["he", "her", "hers", "she"]:
        A.add_word(w, w)
    assert sorted(A.keys("he")) == ["he", "her", "hers"]
    assert sorted(A.keys("she")) == ["she"]
    assert sorted(A.keys("x")) == []


def test_keys_wildcard_and_matchtype():
    A = ahocorasick.Automaton()
    for w in ["he", "ha", "hi", "she", "hee"]:
        A.add_word(w, w)
    # wildcard defaults to MATCH_EXACT_LENGTH
    assert sorted(A.keys("h?", "?")) == ["ha", "he", "hi"]
    assert sorted(A.keys("?e", "?")) == ["he"]
    assert sorted(A.keys("h?", "?", ahocorasick.MATCH_AT_LEAST_PREFIX)) == [
        "ha",
        "he",
        "hee",
        "hi",
    ]
    assert sorted(A.keys("hee", "?", ahocorasick.MATCH_AT_MOST_PREFIX)) == [
        "he",
        "hee",
    ]
    with pytest.raises(ValueError):
        A.keys("h", "??")
    with pytest.raises(ValueError):
        A.keys("h", "?", 17)


def test_items_iterator_invalidation():
    A = ahocorasick.Automaton()
    A.add_word("ab", 1)
    A.add_word("cd", 2)
    it = A.keys()
    next(it)
    A.add_word("new", 3)
    with pytest.raises(ValueError):
        next(it)


def test_key_sequence_api():
    A = ahocorasick.Automaton(ahocorasick.STORE_ANY, ahocorasick.KEY_SEQUENCE)
    A.add_word((43, 89), "ab")
    A.add_word((43, 89, 64), "abc")
    assert (43, 89) in A
    assert A.get((43, 89)) == "ab"
    assert A.longest_prefix((43, 89, 99)) == 2
    assert sorted(A.keys()) == [(43, 89), (43, 89, 64)]
    with pytest.raises(TypeError):
        A.add_word([1, 2], "list not tuple")
    with pytest.raises(ValueError):
        A.add_word((1, -2), "negative")
    with pytest.raises(ValueError):
        A.add_word((1, 2**33), "too big")


def test_get_stats():
    A = ahocorasick.Automaton()
    for w in ["he", "her", "hers", "she"]:
        A.add_word(w, w)
    stats = A.get_stats()
    # root + h,e,r,s + s,h,e = 8 nodes
    assert stats["nodes_count"] == 8
    assert stats["words_count"] == 4
    assert stats["longest_word"] == 4
    assert stats["links_count"] == 7
    assert stats["total_size"] > 0


def test_dump():
    A = ahocorasick.Automaton()
    assert A.dump() is None
    for w in ["he", "she"]:
        A.add_word(w, w)
    A.make_automaton()
    nodes, edges, fail = A.dump()
    assert len(nodes) == 6  # root + h,e + s,h,e
    assert len(edges) == 5
    assert len(fail) == 6
    eows = sum(flag for _, flag in nodes)
    assert eows == 2


def test_dump_key_sequence_large_letters():
    # KEY_SEQUENCE letters are full uint32 (utils/textio.py) and may exceed
    # chr()'s 0x10FFFF range: dump() must emit int edge labels, not crash
    A = ahocorasick.Automaton(ahocorasick.STORE_ANY, ahocorasick.KEY_SEQUENCE)
    A.add_word((0x7FFFFFFF, 2, 0x200000), "big")
    A.add_word((1, 2), "small")
    A.make_automaton()
    nodes, edges, fail = A.dump()
    assert len(nodes) == 6
    letters = {letter for _, letter, _ in edges}
    assert 0x7FFFFFFF in letters and 0x200000 in letters
    assert all(isinstance(letter, int) for _, letter, _ in edges)


def test_sizeof():
    import sys

    A = ahocorasick.Automaton()
    empty = sys.getsizeof(A)
    A.add_word("word", 1)
    assert sys.getsizeof(A) > empty


def test_len_is_count_not_nodes():
    A = ahocorasick.Automaton()
    A.add_word("abcdef", 1)
    assert len(A) == 1


def test_profile_scan():
    A = ahocorasick.Automaton()
    for i, w in enumerate("he her hers she".split()):
        A.add_word(w, i)
    A.make_automaton()
    p = A.profile_scan("_sherhershe_" * 500)
    for key in (
        "engine", "marshal_s", "classify_s", "engine_cold_s", "engine_s",
        "ns_per_char", "GBps", "n_chars",
    ):
        assert key in p, key
    assert p["n_chars"] == 12 * 500
    assert p["engine_s"] > 0 and p["GBps"] > 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        A.profile_scan("x", mode="bogus")
    B = ahocorasick.Automaton()
    with _pytest.raises(AttributeError):
        B.profile_scan("x")


def test_prewarm():
    A = ahocorasick.Automaton()
    for w in ["he", "hers", "she"]:
        A.add_word(w, w)
    A.make_automaton()
    th = A.prewarm(1 << 12)
    th.join(60)
    assert not th.is_alive()
    # he@{3,6,10}, she@{3,10}, hers@7
    assert sum(1 for _ in A.iter("_sherhershe_")) == 6
    B = ahocorasick.Automaton()
    with pytest.raises(AttributeError):
        B.prewarm()
