"""Routing-table tests for the unified engine dispatcher (engines.plan_chain).

VERDICT r3 item 9: one plan function honors PYAHOCORASICK_TPU_ENGINE for
every op, and ``describe_plan`` output must equal the engine actually taken
(recorded in ``engines.last_engine``).
"""

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu import engines


@pytest.fixture
def compiled():
    A = ahocorasick.Automaton()
    for i, w in enumerate("he her hers she banana bandana".split()):
        A.add_word(w, i)
    A.make_automaton()
    return A._compiled


@pytest.fixture
def big_compiled():
    import random

    rng = random.Random(3)
    A = ahocorasick.Automaton()
    words = {
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(8))
        for _ in range(4000)
    }
    for i, w in enumerate(sorted(words)):
        A.add_word(w, i)
    A.make_automaton()
    return A._compiled


def _cls(compiled, s):
    return compiled.classes_of(
        np.frombuffer(s.encode("utf-32-le"), np.uint32)
    ).astype(np.int32)


def test_auto_chain_small_input_prefers_host(compiled):
    chain = engines.plan_chain(compiled, 100, "counts")
    assert chain[-1] in ("seq", "numpy")
    assert "fused" not in chain  # below _JAX_MIN


def test_auto_chain_device_engines_order(big_compiled, monkeypatch):
    monkeypatch.setattr(engines, "_device_backend", lambda: True)
    chain = engines.plan_chain(big_compiled, 1 << 22, "counts")
    assert chain.index("fixedlen") < chain.index("fused") < chain.index(
        "cascade"
    )
    assert chain[-1] in ("seq", "numpy")
    # hotcold only when a table is prebuilt
    assert "hotcold" not in chain
    big_compiled._cache["hotcold"] = object()
    chain2 = engines.plan_chain(big_compiled, 1 << 22, "counts")
    assert "hotcold" in chain2
    del big_compiled._cache["hotcold"]


def test_forced_engine_leads_chain(compiled, monkeypatch):
    monkeypatch.setenv("PYAHOCORASICK_TPU_ENGINE", "cascade")
    chain = engines.plan_chain(compiled, 1 << 20, "counts")
    assert chain[0] == "cascade"
    assert chain[-1] in ("seq", "numpy")  # exact fallback always present


def test_forced_engine_not_applicable_degrades(compiled, monkeypatch):
    monkeypatch.setenv("PYAHOCORASICK_TPU_ENGINE", "stride")
    # stride has no meaning for scan: host fallback semantics
    assert engines.plan_chain(compiled, 1 << 20, "scan") == ["seq"]


@pytest.mark.parametrize("forced", ["seq", "numpy", "jax"])
def test_describe_plan_matches_engine_taken(compiled, monkeypatch, forced):
    monkeypatch.setenv("PYAHOCORASICK_TPU_ENGINE", forced)
    cls = _cls(compiled, "sherhershe_banana_bandana" * 40)
    plan = engines.describe_plan(compiled, cls.size, "counts")
    engines.count_matches(compiled, cls)
    assert engines.last_engine["counts"] == plan == forced


def test_describe_plan_matches_engine_taken_auto(compiled):
    cls = _cls(compiled, "sherhershe" * 20000)  # above _JAX_MIN
    plan = engines.describe_plan(compiled, cls.size, "counts")
    engines.count_matches(compiled, cls)
    taken = engines.last_engine["counts"]
    # on CPU backends the device cascade is not scheduled: plan == taken
    assert taken == plan


def test_count_total_honors_forcing(compiled, monkeypatch):
    cls = _cls(compiled, "sherhershe" * 20000)
    want = int(engines.count_matches(compiled, cls).sum())
    for forced in ("seq", "numpy", "jax"):
        monkeypatch.setenv("PYAHOCORASICK_TPU_ENGINE", forced)
        got = engines.count_total(compiled, cls)
        assert got == want
        assert engines.last_engine["total"] in (forced, "stride")
        if forced != "jax":
            # the stride engine is only reachable from jax/auto plans
            assert engines.last_engine["total"] == forced


def test_forced_gated_engine_warns(big_compiled, monkeypatch):
    import warnings

    # force assoc on an automaton too large for the assoc gate
    from pyahocorasick_tpu.ops import assoc

    if assoc.assoc_ok(big_compiled):
        pytest.skip("automaton small enough for assoc")
    monkeypatch.setenv("PYAHOCORASICK_TPU_ENGINE", "assoc")
    cls = _cls(big_compiled, "abcdefgh" * 20000)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        engines.scan_states(big_compiled, cls)
    assert any(
        isinstance(w.message, RuntimeWarning)
        and "gated out" in str(w.message)
        for w in rec
    ), [str(w.message) for w in rec]


def test_emit_and_counts_agree_across_plans(compiled):
    cls = _cls(compiled, "_sherhershe_banana_bandana_" * 3000)
    pos, pids = engines.emit(compiled, cls)
    counts = engines.count_matches(compiled, cls)
    assert counts.sum() == pos.size
    assert np.array_equal(
        np.bincount(pids, minlength=compiled.num_patterns), counts
    )


def test_prewarm_warms_planned_engines(rng):
    """prewarm(n) must warm exactly the engines plan_chain selects at
    size n and report them; a first query at the hinted size then builds
    no new compiled program (VERDICT r4 item 8)."""
    import string as _string

    import pyahocorasick_tpu as ahocorasick
    from pyahocorasick_tpu import engines
    from pyahocorasick_tpu.ops import fused

    A = ahocorasick.Automaton()
    letters = np.frombuffer(_string.ascii_letters.encode(), np.uint8)
    for n in rng.integers(3, 12, 300):
        A.add_word(bytes(letters[rng.integers(0, letters.size, n)]).decode(), 1)
    A.make_automaton()
    n = 1 << 17  # above the device-dispatch floor
    th = A.prewarm(n)
    th.join(300)
    assert not th.is_alive()
    assert th.plan == engines.plan_chain(A._compiled, n, "counts")
    assert th.warmed in th.plan
    keys_before = set(fused._FLAGS_CACHE) | set(fused._POST_CACHE)
    hay = bytes(letters[rng.integers(0, letters.size, n)]).decode()
    A.count_matches(hay)
    assert engines.last_engine["counts"] == th.warmed
    if th.warmed == "fused":
        keys_after = set(fused._FLAGS_CACHE) | set(fused._POST_CACHE)
        assert keys_after == keys_before
