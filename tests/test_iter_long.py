"""iter_long semantics, incl. the reference's issue-133 corner cases
(reference tests/test_issue_133.py, tests/test_unit.py:1491-1525)."""

import pyahocorasick_tpu as ahocorasick


def build(words):
    A = ahocorasick.Automaton()
    for w in words:
        A.add_word(w, w)
    A.make_automaton()
    return A


def test_iter_long_basic():
    A = build(["he", "her", "hers", "she"])
    assert list(A.iter_long("_sherhershe_")) == [
        (3, "she"),
        (8, "hers"),
        (10, "he"),
    ]


def test_issue133_1():
    A = build(["b", "abc"])
    assert list(A.iter_long("abb")) == [(1, "b"), (2, "b")]


def test_issue133_2():
    A = build(["b", "c", "abd"])
    assert list(A.iter_long("abc")) == [(1, "b"), (2, "c")]


def test_issue133_multibyte():
    A = build(["知识产权", "国家知识产权局"])
    assert list(A.iter_long("国家知识产权")) == [(5, "知识产权")]


def test_iter_long_sequence():
    A = ahocorasick.Automaton(ahocorasick.STORE_ANY, ahocorasick.KEY_SEQUENCE)
    for w in [(1, 2), (1, 2, 3)]:
        A.add_word(w, w)
    A.make_automaton()
    assert list(A.iter_long((0, 1, 2, 3, 1, 2))) == [(3, (1, 2, 3)), (5, (1, 2))]


def test_iter_long_start_end():
    A = build(["he", "her", "hers", "she"])
    # scanning "herh": he@3 then her@4 extend; miss at 'h' emits the last
    # recorded match (her@4), reference restarts after it
    assert list(A.iter_long("_sherhershe_", 2, 6)) == [(4, "her")]


def test_iter_long_set_streaming():
    A = build(["he", "her", "hers", "she"])
    it = A.iter_long("_sherhershe_")
    assert list(it) == [(3, "she"), (8, "hers"), (10, "he")]
    it.set("_sherhershe_")
    assert list(it) == [(15, "she"), (20, "hers"), (22, "he")]
    it.set("_sherhershe_", True)
    assert list(it) == [(3, "she"), (8, "hers"), (10, "he")]


def test_iter_long_invalidation():
    A = build(["he", "she"])
    it = A.iter_long("she")
    A.add_word("x", "x")
    try:
        next(it)
        assert False
    except ValueError:
        pass


def test_iter_long_vs_naive_greedy(rng=None):
    """Randomized differential test against a direct transcription of the
    reference algorithm run on the host trie."""
    import numpy as np

    rng = np.random.default_rng(7)
    words = set()
    while len(words) < 60:
        n = rng.integers(1, 6)
        words.add("".join(chr(97 + c) for c in rng.integers(0, 3, n)))
    A = build(sorted(words))
    hay = "".join(chr(97 + c) for c in rng.integers(0, 3, 3000))

    # naive transcription of AutomatonSearchIterLong.c:100-152 on an
    # independently-built dict trie (self-contained oracle)
    class N:
        __slots__ = ("children", "eow", "value")

        def __init__(self):
            self.children, self.eow, self.value = {}, False, None

    root = N()
    for w in sorted(words):
        node = root
        for ch in w:
            node = node.children.setdefault(ord(ch), N())
        node.eow, node.value = True, w

    def goto(node, ch):
        return node.children.get(ord(ch))

    fails = {}
    from collections import deque

    fails[id(root)] = None
    q = deque()
    for child in root.children.values():
        fails[id(child)] = root
        q.append(child)
    while q:
        node = q.popleft()
        for letter, child in node.children.items():
            q.append(child)
            f = fails[id(node)]
            while f is not None and letter not in f.children:
                f = fails[id(f)]
            nxt = f.children.get(letter) if f is not None else None
            fails[id(child)] = nxt if nxt is not None and nxt is not child else root

    out = []
    state = root
    index = -1
    last = None
    last_index = -1
    end = len(hay)

    def emit():
        nonlocal state, index, last, last_index
        out.append((last_index, last.value))
        state = root
        index = last_index
        last = None
        last_index = -1

    index += 1
    while True:
        progressed = False
        while index < end:
            nxt = goto(state, hay[index])
            if nxt is not None:
                if nxt.eow:
                    last = nxt
                    last_index = index
                else:
                    f = fails[id(nxt)]
                    if f is not None and f is not root and f.eow:
                        last = f
                        last_index = index
                        emit()
                        index += 1
                        break
                state = nxt
                index += 1
            else:
                if last is not None:
                    emit()
                    index += 1
                    break
                else:
                    while True:
                        state = fails[id(state)]
                        if state is None:
                            state = root
                            index += 1
                            break
                        elif goto(state, hay[index]) is not None:
                            break
        else:
            if last is not None:
                emit()
                index += 1
                continue
            break

    assert list(A.iter_long(hay)) == out
