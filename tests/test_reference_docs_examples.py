"""The reference documentation's worked examples, verbatim
(reference docs/index.rst:274-345 and the streaming section 122-157)."""

import pyahocorasick_tpu as ahocorasick


def test_quickstart_example():
    A = ahocorasick.Automaton()
    for index, word in enumerate("he her hers she".split()):
        A.add_word(word, (index, word))

    assert "he" in A
    assert "HER" not in A
    assert A.get("he") == (0, "he")
    assert A.get("she") == (3, "she")
    assert A.get("cat", "<not exists>") == "<not exists>"
    try:
        A.get("dog")
        assert False
    except KeyError:
        pass

    assert A.remove_word("he") is True
    assert A.remove_word("he") is False
    assert A.pop("she") == (3, "she")
    assert "she" not in A

    A = ahocorasick.Automaton()
    for index, word in enumerate("he her hers she".split()):
        A.add_word(word, (index, word))
    A.make_automaton()
    result = list(A.iter("_hershe_"))
    # docs/index.rst:313-319
    assert result == [
        (2, (0, "he")),
        (3, (1, "her")),
        (4, (2, "hers")),
        (6, (3, "she")),
        (6, (0, "he")),
    ]


def test_keys_wildcard_example():
    A = ahocorasick.Automaton()
    for index, word in enumerate("cat catastropha rat rate bat".split()):
        A.add_word(word, index)

    assert sorted(A.keys("cat")) == ["cat", "catastropha"]
    assert sorted(A.keys("?at", "?", ahocorasick.MATCH_EXACT_LENGTH)) == [
        "bat",
        "cat",
        "rat",
    ]
    assert sorted(A.keys("?at?", "?", ahocorasick.MATCH_AT_MOST_PREFIX)) == [
        "bat",
        "cat",
        "rat",
        "rate",
    ]
    # note: docs/index.rst:345 lists all five words here, but the actual
    # reference extension returns only the length>=4 matches — we match the
    # implementation, not the stale docs
    assert sorted(A.keys("?at?", "?", ahocorasick.MATCH_AT_LEAST_PREFIX)) == [
        "catastropha",
        "rate",
    ]


def test_streaming_docs_example():
    """docs/index.rst:122-157: iter().set() chunked scanning."""
    A = ahocorasick.Automaton()
    for word in ["abc", "bcd"]:
        A.add_word(word, word)
    A.make_automaton()

    chunks = ["ab", "cd", "abcd"]
    whole = "".join(chunks)
    expected = list(A.iter(whole))

    it = A.iter("")
    got = []
    for chunk in chunks:
        it.set(chunk)
        got.extend(it)
    assert got == expected
