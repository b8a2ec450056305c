"""Large-input engine coverage: inputs big enough to cross the blocked-scan
and jax-dispatch thresholds, checked against the pure-Python oracle."""

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu.ops import cpu


def _oracle_matches(A, hay):
    compiled = A._compiled
    cls = compiled.classes_of(
        np.frombuffer(hay.encode("utf-32-le"), np.uint32)
    ).astype(np.int32)
    states = cpu.scan_states_seq(compiled, cls)
    return cpu.emit_matches(compiled, states)


@pytest.fixture(scope="module")
def big_case():
    rng = np.random.default_rng(99)
    A = ahocorasick.Automaton()
    words = set()
    while len(words) < 400:
        n = rng.integers(2, 9)
        words.add("".join(chr(97 + c) for c in rng.integers(0, 4, n)))
    for w in sorted(words):
        A.add_word(w, w)
    A.make_automaton()
    hay = "".join(chr(97 + c) for c in rng.integers(0, 4, 300_000))
    return A, hay


def test_blocked_host_scan_parity(big_case, monkeypatch):
    A, hay = big_case
    exp_pos, exp_pids = _oracle_matches(A, hay)
    monkeypatch.setenv("PYAHOCORASICK_TPU_ENGINE", "seq")  # native blocked
    pos, pids, _ = A.search_arrays(hay)
    assert np.array_equal(pos, exp_pos) and np.array_equal(pids, exp_pids)


def test_numpy_engine_parity(big_case, monkeypatch):
    A, hay = big_case
    exp_pos, exp_pids = _oracle_matches(A, hay)
    monkeypatch.setenv("PYAHOCORASICK_TPU_ENGINE", "numpy")
    pos, pids, _ = A.search_arrays(hay)
    assert np.array_equal(pos, exp_pos) and np.array_equal(pids, exp_pids)


def test_jax_sparse_engine_parity(big_case, monkeypatch):
    A, hay = big_case
    exp_pos, exp_pids = _oracle_matches(A, hay)
    monkeypatch.setenv("PYAHOCORASICK_TPU_ENGINE", "jax")
    pos, pids, _ = A.search_arrays(hay)
    assert np.array_equal(pos, exp_pos) and np.array_equal(pids, exp_pids)
    counts = A.count_matches(hay)
    assert counts.sum() == exp_pos.size


def test_auto_engine_over_threshold(big_case, monkeypatch):
    A, hay = big_case
    monkeypatch.delenv("PYAHOCORASICK_TPU_ENGINE", raising=False)
    exp_pos, exp_pids = _oracle_matches(A, hay)
    pos, pids, _ = A.search_arrays(hay)  # auto: jax path at this size
    assert np.array_equal(pos, exp_pos) and np.array_equal(pids, exp_pids)


def test_streaming_chunks_large(big_case, monkeypatch):
    from pyahocorasick_tpu import streaming

    A, hay = big_case
    monkeypatch.setenv("PYAHOCORASICK_TPU_ENGINE", "seq")
    exp_pos, exp_pids = _oracle_matches(A, hay)
    chunks = [hay[i : i + 37777] for i in range(0, len(hay), 37777)]
    got = list(streaming.iter_matches_chunks(A, chunks))
    values = A._compiled.values
    exp = [(int(p), values[int(i)]) for p, i in zip(exp_pos, exp_pids)]
    assert got == exp
