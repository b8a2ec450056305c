"""Systematic allocation-fault sweep over the WHOLE public API surface.

The reference sweeps a one-shot failure through every allocation and every
wrapped C-API call of its full unit suite, asserting the only outcome is a
clean MemoryError — never a crash, never a corrupted object
(reference runtest.sh:156-266, src/utils.c:13-61, src/pycallfault/).

This is the analog for the native core's counted allocation events
(_native/core.cpp alloc_guard): one workload touches every API family —
trie mutation, make_automaton lowering, queries, iterators (iter,
iter_long, items/keys/values), streaming set(), pickle, custom save/load,
stats/dump — and the sweep arms a failure at each allocation id.  After
every injected failure the same objects must still answer queries, accept
further mutations, and a disarmed retry must produce exact results.

Python-layer failure paths (user callables raising mid save/load) are
exercised separately below: the contract is clean propagation, usable
objects, and partial files that load as ValueError, never a crash.
"""

import os
import pickle
import random

import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu import native

ext = native._load()
pytestmark = pytest.mark.skipif(
    ext is None or not hasattr(ext, "_alloc_fail_arm"),
    reason="native extension with fault injection unavailable",
)

WORDS = None


def _words():
    global WORDS
    if WORDS is None:
        rng = random.Random(7)
        WORDS = sorted(
            {
                "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 9)))
                for _ in range(90)
            }
        )
    return WORDS


def _full_api_workload(tmp_path):
    """One pass over every public API family; returns a fingerprint tuple
    that a fault-free rerun must reproduce exactly."""
    words = _words()
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        A.add_word(w, i)
    # mutation family
    A.remove_word(words[5])
    assert A.pop(words[6]) == 6
    A.add_word(words[5], -5)
    A.add_word(words[6], -6)
    # query family
    assert words[0] in A
    assert A.match(words[1][:1])
    lp = A.longest_prefix(words[2] + "zz")
    g = A.get(words[3])
    # items family
    ks = list(A.keys())
    vs = list(A.values())
    its = list(A.items(words[0][:1]))
    # lowering + search family
    A.make_automaton()
    hay = "abcdefabcdeffedcba" * 12
    matches = list(A.iter(hay))
    longs = list(A.iter_long(hay))
    got_fa = []
    A.find_all(hay, lambda i, v: got_fa.append((i, v)))
    assert got_fa == matches
    it = A.iter(hay[:10])
    first = list(it)
    it.set(hay[10:30])
    second = list(it)
    # introspection family
    st = A.get_stats()
    dmp = A.dump()
    sz = A.__sizeof__()
    # persistence family
    blob = pickle.dumps(A)
    B = pickle.loads(blob)
    assert list(B.iter(hay)) == matches
    path = str(tmp_path / "a.autsave")
    A.save(path, pickle.dumps)
    C = ahocorasick.load(path, pickle.loads)
    assert list(C.iter(hay)) == matches
    return (
        len(matches),
        len(longs),
        len(first) + len(second),
        len(ks),
        len(vs),
        len(its),
        lp,
        g,
        st["nodes_count"],
        len(dmp[1]),
        sz > 0,
    )


def test_full_api_alloc_sweep(tmp_path):
    ext._alloc_fail_arm(-1)
    want = _full_api_workload(tmp_path)
    total = ext._alloc_fail_arm(-1)
    assert total > 100, total

    # dense over the build/lowering prefix, sampled over the tail — the
    # reference sweeps every id (runtest.sh:156-215); sampling keeps this
    # under CI budget while still crossing every API family's allocations
    ids = list(range(1, min(total, 200) + 1))
    ids += list(range(201, total + 1, max(total // 80, 1)))
    hit = 0
    for n in ids:
        ext._alloc_fail_arm(n)
        try:
            got = _full_api_workload(tmp_path)
            assert got == want
        except MemoryError:
            hit += 1
        finally:
            ext._alloc_fail_arm(-1)
    assert hit > 0, "sweep never hit an allocation site"
    # disarmed afterwards, the workload must still be exact
    assert _full_api_workload(tmp_path) == want


def test_interrupted_serialization_saves_no_corruption(tmp_path):
    """A value serializer raising mid-save must propagate cleanly, leave the
    automaton usable, and a truncated/partial file must load as ValueError
    (reference custompickle validates header/footer, custompickle.c:5-52)."""
    A = ahocorasick.Automaton()
    for i, w in enumerate(_words()):
        A.add_word(w, ("v", i))
    A.make_automaton()
    want = list(A.iter("abcdefabc"))

    calls = {"n": 0}

    def exploding(v):
        calls["n"] += 1
        if calls["n"] == 30:
            raise MemoryError("injected")
        return pickle.dumps(v)

    path = str(tmp_path / "partial.autsave")
    with pytest.raises(MemoryError):
        A.save(path, exploding)
    # the automaton is untouched
    assert list(A.iter("abcdefabc")) == want
    # the partial file must not load as a silently-wrong automaton
    if os.path.exists(path):
        with pytest.raises((ValueError, EOFError, MemoryError)):
            ahocorasick.load(path, pickle.loads)


def test_interrupted_deserialization_is_clean(tmp_path):
    A = ahocorasick.Automaton()
    for i, w in enumerate(_words()):
        A.add_word(w, ("v", i))
    A.make_automaton()
    path = str(tmp_path / "ok.autsave")
    A.save(path, pickle.dumps)

    calls = {"n": 0}

    def exploding_load(b):
        calls["n"] += 1
        if calls["n"] == 20:
            raise MemoryError("injected")
        return pickle.loads(b)

    with pytest.raises(MemoryError):
        ahocorasick.load(path, exploding_load)
    # a clean retry still works
    B = ahocorasick.load(path, pickle.loads)
    assert list(B.iter("abcdefabc")) == list(A.iter("abcdefabc"))


def test_unpickle_alloc_faults(tmp_path):
    """Unpickling under injected allocation failures: MemoryError or exact
    result, never a crash or silently-wrong automaton."""
    A = ahocorasick.Automaton()
    for i, w in enumerate(_words()):
        A.add_word(w, i)
    A.make_automaton()
    blob = pickle.dumps(A)
    want = list(A.iter("abcdefabc"))
    ext._alloc_fail_arm(-1)
    pickle.loads(blob)
    total = ext._alloc_fail_arm(-1)
    step = max(total // 50, 1)
    for n in range(1, total + 1, step):
        ext._alloc_fail_arm(n)
        try:
            B = pickle.loads(blob)
            assert list(B.iter("abcdefabc")) == want
        except MemoryError:
            pass
        finally:
            ext._alloc_fail_arm(-1)


# ---------------------------------------------------------------------------
# Python-call fault sweep: the analog of the reference's pycallfault rig
# (src/pycallfault/pycallfault.h:5-59, runtest.sh:246-266), which fails the
# Nth wrapped C-API call across its suite.  Here the Nth PYTHON-LEVEL
# operation the library performs on user-supplied objects raises — value
# dunders (__reduce__ in pickle, __eq__/__hash__, __index__ for STORE_INTS
# marshalling), the find_all callback, and the save/load serializer
# callables.  Contract: the injected exception propagates cleanly (its own
# type, not a crash or a swallowed pass), every object stays usable, and a
# disarmed rerun is exact.


class _PyCallCounter:
    def __init__(self):
        self.n = 0
        self.fail_at = -1

    def tick(self):
        self.n += 1
        if self.n == self.fail_at:
            raise _InjectedFault(f"injected python-call fault at #{self.n}")


class _InjectedFault(RuntimeError):
    pass


_CTR = _PyCallCounter()


class _Val:
    """User value whose every dunder the library might invoke is counted."""

    def __init__(self, i):
        self.i = i

    def __reduce__(self):
        _CTR.tick()
        return (_Val, (self.i,))

    def __eq__(self, other):
        _CTR.tick()
        return isinstance(other, _Val) and other.i == self.i

    def __hash__(self):
        _CTR.tick()
        return hash(self.i)

    def __index__(self):
        _CTR.tick()
        return self.i


def _counting_serializer(obj):
    _CTR.tick()
    return pickle.dumps(obj)


def _counting_deserializer(blob):
    _CTR.tick()
    return pickle.loads(blob)


def _pycall_workload(tmp_path):
    words = _words()
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        A.add_word(w, _Val(i))
    assert A.get(words[3]) == _Val(3)          # __eq__
    B_ints = ahocorasick.Automaton(ahocorasick.STORE_INTS)
    for i, w in enumerate(words[:20]):
        B_ints.add_word(w, _Val(i + 1))        # __index__ marshalling
    A.make_automaton()
    hay = "abcdefabcdeffedcba" * 8
    matches = list(A.iter(hay))
    got_fa = []
    A.find_all(hay, lambda i, v: (_CTR.tick(), got_fa.append((i, v))))
    assert got_fa == matches                   # callback + __eq__ per value
    blob = pickle.dumps(A)                     # __reduce__ per value
    C = pickle.loads(blob)
    assert list(C.iter(hay)) == matches
    path = str(tmp_path / "pycall.autsave")
    A.save(path, _counting_serializer)         # counted serializer
    D = ahocorasick.load(path, _counting_deserializer)
    assert list(D.iter(hay)) == matches
    return (len(matches), len(got_fa), sorted(B_ints.values()))


def test_pycall_fault_sweep(tmp_path):
    _CTR.fail_at = -1
    _CTR.n = 0
    want = _pycall_workload(tmp_path)
    total = _CTR.n
    assert total > 50, total

    step = max(total // 120, 1)
    hit = 0
    for n in range(1, total + 1, step):
        _CTR.n = 0
        _CTR.fail_at = n
        try:
            got = _pycall_workload(tmp_path)
            assert got == want
        except _InjectedFault:
            hit += 1
        except AssertionError:
            raise
        finally:
            _CTR.fail_at = -1
        # after every injected failure the API must still work end to end
        _CTR.n = 0
        assert _pycall_workload(tmp_path) == want
    assert hit > 0, "sweep never hit a python-level call site"
