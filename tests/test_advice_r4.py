"""Regression tests for the round-4 advisor findings (ADVICE.md r4).

1. (high) fixedlen must gate out for alphabets with > 127 classes: the
   class stream is staged int8, so wider class ids would wrap negative and
   true matches were silently lost (length-8 words over ~200 classes
   returned 0 matches).
2. (medium) the auto chain lists 'sparse' for counts/total on lazy-lowered
   automata, but count_matches/count_total had no 'sparse' branch — the
   plan said 'sparse' while the dense fallback ran.
3. (low) forced PYAHOCORASICK_TPU_ENGINE=sparse on a build without the
   native extension must gate + fall back, not raise.
"""

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu import engines, native
from pyahocorasick_tpu.ops import fixedlen


def _wide_alphabet_automaton(n_classes=201, n_words=40, L=8, seed=0):
    rng = np.random.default_rng(seed)
    alphabet = [chr(0x100 + i) for i in range(n_classes)]
    A = ahocorasick.Automaton()
    words = sorted(
        {"".join(rng.choice(alphabet, L)) for _ in range(n_words)}
    )
    for i, w in enumerate(words):
        A.add_word(w, i)
    A.make_automaton()
    hay = "".join(rng.choice(alphabet, 4000))
    hay = hay[:50] + words[0] + hay[50 + L: 2000] + words[1] + hay[2000 + 2 * L:]
    return A, hay, words


def test_fixedlen_gates_wide_alphabet():
    A, hay, _ = _wide_alphabet_automaton()
    c = A._compiled
    assert c.num_classes > 127
    assert fixedlen.build_fixedlen_tables(c) is None


def test_wide_alphabet_counts_exact():
    # before the fix this configuration silently returned 0 matches when
    # fixedlen was first in the chain
    A, hay, _ = _wide_alphabet_automaton()
    expected = list(A.iter(hay))
    assert len(expected) >= 2
    counts = A.count_matches(hay)
    assert int(counts.sum()) == len(expected)


def test_sparse_counts_branch_runs(monkeypatch):
    if not native.available():
        pytest.skip("native core not built")
    monkeypatch.setenv("PYAHOCORASICK_TPU_LOWER", "lazy")
    A = ahocorasick.Automaton()
    for i, w in enumerate(["he", "her", "hers", "she"]):
        A.add_word(w, i)
    A.make_automaton()
    c = A._compiled
    assert not c.has_delta and c.child_off is not None
    hay = "_sherhershe_" * 3
    chain = engines.plan_chain(c, len(hay), "counts")
    if "sparse" in chain:
        counts = A.count_matches(hay)
        assert engines.last_engine["counts"] == "sparse"
        # the plan's first entry is the engine actually taken
        assert engines.describe_plan(c, len(hay), "counts") == "sparse"
    else:
        counts = A.count_matches(hay)
    seq = np.zeros(c.num_patterns, np.int64)
    for _, v in A.iter(hay):
        seq[v] += 1
    # counts index by internal pattern id (not insertion order): compare
    # as a multiset plus the total
    assert sorted(counts.tolist()) == sorted(seq.tolist())
    assert int(counts.sum()) == int(seq.sum())
    # total through the same branch
    total = A.count_total(hay)
    assert total == int(seq.sum())
    if "sparse" in engines.plan_chain(c, len(hay), "total"):
        assert engines.last_engine["total"] == "sparse"
    assert not c.has_delta  # none of the above forced the dense lowering


def test_forced_sparse_gates_without_native(monkeypatch):
    monkeypatch.setenv("PYAHOCORASICK_TPU_ENGINE", "sparse")
    monkeypatch.setenv("PYAHOCORASICK_TPU_NATIVE", "0")
    native._TRIED = False
    native._EXT = None
    try:
        A = ahocorasick.Automaton()
        for i, w in enumerate(["ab", "abc", "bc"]):
            A.add_word(w, i)
        A.make_automaton()
        hay = "xabcxbcx"
        with pytest.warns(RuntimeWarning, match="gated"):
            res = list(A.iter(hay))  # no crash: falls through the chain
        exp = [(2, 0), (3, 1), (3, 2), (6, 2)]
        assert res == [(e, v) for e, v in exp]
        with pytest.warns(RuntimeWarning, match="gated"):
            counts = A.count_matches(hay)
        assert int(counts.sum()) == 4
        with pytest.warns(RuntimeWarning, match="gated"):
            assert A.count_total(hay) == 4
    finally:
        native._TRIED = False
        native._EXT = None
