"""Adversarial deserialization: malformed/malicious pickle payloads and save
files must raise clean exceptions, never crash (the contract pinned by the
reference's tests/test_unpickle.py:129-433 for ITS wire format; exercised
here against ours)."""

import pickle
import struct

import numpy as np
import pytest

import pyahocorasick_tpu as ahocorasick
from pyahocorasick_tpu import serialization as ser


def build():
    A = ahocorasick.Automaton()
    for i, w in enumerate(["he", "her", "hers", "she"]):
        A.add_word(w, i)
    A.make_automaton()
    return A


def reduced(A):
    cls_, args = A.__reduce__()
    return cls_, list(args)


def blob_bytes(args):
    return b"".join(args[0])


def make_blob(parent, letter, eow):
    head = ser.PICKLE_MAGIC + struct.pack("<q", parent.size)
    return [
        head
        + parent.astype(np.uint32).tobytes()
        + letter.astype(np.uint32).tobytes()
        + eow.astype(np.uint8).tobytes()
    ]


def test_roundtrip_ok():
    A = build()
    B = pickle.loads(pickle.dumps(A))
    assert sorted(B.keys()) == sorted(A.keys())
    assert B.kind == ahocorasick.AHOCORASICK


def test_wrong_kind_store_keytype():
    cls_, args = reduced(build())
    for idx, bad in [(1, 42), (2, 7), (3, -1)]:
        a = list(args)
        a[idx] = bad
        with pytest.raises(ValueError):
            cls_(*a)


def test_blob_not_list():
    cls_, args = reduced(build())
    args[0] = b"not a list"
    with pytest.raises(TypeError):
        cls_(*args)


def test_blob_chunk_not_bytes():
    cls_, args = reduced(build())
    args[0] = [12345]
    with pytest.raises(ValueError):
        cls_(*args)


def test_truncated_blob():
    cls_, args = reduced(build())
    payload = blob_bytes(args)
    for cut in [0, 5, len(payload) // 2, len(payload) - 1]:
        a = list(args)
        a[0] = [payload[:cut]]
        with pytest.raises(ValueError):
            cls_(*a)


def test_bad_magic():
    cls_, args = reduced(build())
    payload = blob_bytes(args)
    a = list(args)
    a[0] = [b"X" * len(payload)]
    with pytest.raises(ValueError):
        cls_(*a)


def test_negative_node_count():
    cls_, args = reduced(build())
    a = list(args)
    a[0] = [ser.PICKLE_MAGIC + struct.pack("<q", -5)]
    with pytest.raises(ValueError):
        cls_(*a)


def test_forward_parent_reference():
    # parent id >= child id breaks the BFS invariant -> must be rejected
    parent = np.array([0, 2, 1], dtype=np.uint32)  # node 1 claims parent 2
    letter = np.array([0, 97, 98], dtype=np.uint32)
    eow = np.array([0, 1, 1], dtype=np.uint8)
    cls_, args = reduced(build())
    a = list(args)
    a[0] = make_blob(parent, letter, eow)
    a[6] = ["x", "y"]
    with pytest.raises(ValueError):
        cls_(*a)


def test_duplicate_edge():
    parent = np.array([0, 0, 0], dtype=np.uint32)
    letter = np.array([0, 97, 97], dtype=np.uint32)  # two 'a' edges from root
    eow = np.array([0, 1, 1], dtype=np.uint8)
    cls_, args = reduced(build())
    a = list(args)
    a[0] = make_blob(parent, letter, eow)
    a[6] = ["x", "y"]
    with pytest.raises(ValueError):
        cls_(*a)


def test_wrong_value_count():
    cls_, args = reduced(build())
    a = list(args)
    a[6] = a[6][:-1]  # one value too few
    with pytest.raises(ValueError):
        cls_(*a)


def test_values_survive_roundtrip_refcounts():
    # objects with shared identity keep identity through pickling of the list
    A = ahocorasick.Automaton()
    shared = ("shared",)
    A.add_word("a", shared)
    A.add_word("b", shared)
    B = pickle.loads(pickle.dumps(A))
    va, vb = B.get("a"), B.get("b")
    assert va == vb == shared
    assert va is vb  # pickle memoization preserves sharing


# ---- save/load file corruption -------------------------------------------


def _save(tmp_path, A):
    p = str(tmp_path / "a.bin")
    A.save(p, pickle.dumps)
    return p


def test_load_truncated_file(tmp_path):
    p = _save(tmp_path, build())
    data = open(p, "rb").read()
    for cut in [0, 10, len(data) // 2, len(data) - 1]:
        open(p, "wb").write(data[:cut])
        with pytest.raises(ValueError):
            ahocorasick.load(p, pickle.loads)


def test_load_bad_magic(tmp_path):
    p = _save(tmp_path, build())
    data = bytearray(open(p, "rb").read())
    data[0] ^= 0xFF
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        ahocorasick.load(p, pickle.loads)


def test_load_corrupt_footer(tmp_path):
    p = _save(tmp_path, build())
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        ahocorasick.load(p, pickle.loads)


def test_load_arg_validation(tmp_path):
    p = _save(tmp_path, build())
    with pytest.raises(TypeError):
        ahocorasick.load(123, pickle.loads)
    with pytest.raises(TypeError):
        ahocorasick.load(p, "not callable")


def test_save_arg_count_by_store(tmp_path):
    A = build()  # STORE_ANY
    with pytest.raises(ValueError, match="expected exactly two arguments"):
        A.save(str(tmp_path / "x.bin"))
    B = ahocorasick.Automaton(ahocorasick.STORE_INTS)
    B.add_word("a")
    with pytest.raises(ValueError, match="expected exactly one argument"):
        B.save(str(tmp_path / "y.bin"), pickle.dumps)


def test_save_load_store_matrix(tmp_path):
    for store, addargs in [
        (ahocorasick.STORE_ANY, lambda i: ((i, "v"),)),
        (ahocorasick.STORE_INTS, lambda i: (i + 7,)),
        (ahocorasick.STORE_LENGTH, lambda i: ()),
    ]:
        A = ahocorasick.Automaton(store)
        words = ["he", "her", "hers", "she"]
        for i, w in enumerate(words):
            A.add_word(w, *addargs(i))
        A.make_automaton()
        p = str(tmp_path / f"s{store}.bin")
        if store == ahocorasick.STORE_ANY:
            A.save(p, pickle.dumps)
            B = ahocorasick.load(p, pickle.loads)
        else:
            A.save(p)
            B = ahocorasick.load(p, pickle.loads)
        assert B.store == store
        assert sorted(B.items()) == sorted(A.items())
        assert list(B.iter("_sherhershe_")) == list(A.iter("_sherhershe_"))
