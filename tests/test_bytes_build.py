"""Bytes-keyed build variant (reference AHOCORASICK_BYTES compile flag;
behavior matrix from reference tests/pytestingutils.py conv() shim)."""

import pickle

import pytest

from pyahocorasick_tpu import bytes_build


def build():
    A = bytes_build.Automaton()
    for w in [b"he", b"her", b"hers", b"she"]:
        A.add_word(w, w)
    A.make_automaton()
    return A


def test_bytes_roundtrip(engine):
    A = build()
    got = list(A.iter(b"_sherhershe_"))
    assert got == [
        (3, b"she"),
        (3, b"he"),
        (4, b"her"),
        (6, b"he"),
        (7, b"her"),
        (8, b"hers"),
        (10, b"she"),
        (10, b"he"),
    ]


def test_bytes_type_errors():
    A = bytes_build.Automaton()
    with pytest.raises(TypeError, match="bytes expected"):
        A.add_word("str", 1)
    A.add_word(b"he", 1)
    A.make_automaton()
    with pytest.raises(TypeError, match="bytes required"):
        A.iter("str")


def test_bytes_keys_items():
    A = build()
    assert sorted(A.keys()) == [b"he", b"her", b"hers", b"she"]
    assert sorted(A.keys(b"he")) == [b"he", b"her", b"hers"]
    assert sorted(A.keys(b"h?", b"?")) == [b"he"]
    assert (b"she", b"she") in list(A.items())


def test_bytes_pickle_and_save(tmp_path):
    A = build()
    B = pickle.loads(pickle.dumps(A))
    assert isinstance(B, bytes_build.Automaton)
    assert sorted(B.keys()) == sorted(A.keys())

    p = str(tmp_path / "a.bin")
    A.save(p, pickle.dumps)
    C = bytes_build.load(p, pickle.loads)
    assert isinstance(C, bytes_build.Automaton)
    assert list(C.iter(b"ushers")) == list(A.iter(b"ushers"))


def test_bytes_iter_long():
    A = build()
    assert list(A.iter_long(b"_sherhershe_")) == [
        (3, b"she"),
        (8, b"hers"),
        (10, b"he"),
    ]


def test_bytes_high_bytes():
    A = bytes_build.Automaton()
    A.add_word(b"\xff\xfe", "hi")
    A.make_automaton()
    assert list(A.iter(b"a\xff\xfeb")) == [(2, "hi")]
    assert sorted(A.keys()) == [b"\xff\xfe"]
