// CPython extension wrapping the native host core (core.cpp).
//
// This is the low-overhead binding used by native.py: str keys are read
// directly from the PyUnicode representation (UCS1/2/4) with no intermediate
// numpy arrays or ctypes marshalling, mirroring how the reference extension
// consumes PEP-393 strings (reference src/utils.c:145-236) — the per-call
// cost is what lets build-time match the reference's C numbers.
//
// Buffer-based variants (suffix _buf) accept any contiguous uint32 buffer and
// serve KEY_SEQUENCE tuples (marshalled/validated in Python) and the compiled
// numpy tables for the sequential scan paths.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include "core.cpp"

namespace {

// Allocation failures must surface as Python MemoryError, never crash —
// the contract the reference enforces with its ALLOC_FAIL injection harness
// (reference src/utils.c:13-61, runtest.sh mallocfaults).
template <typename F>
PyObject* guarded(F&& f) {
    try {
        return f();
    } catch (const std::bad_alloc&) {
        return PyErr_NoMemory();
    } catch (const std::exception& e) {
        PyErr_SetString(PyExc_RuntimeError, e.what());
        return NULL;
    }
}

constexpr const char* kCapsuleName = "pyahocorasick_tpu._native.trie";

// The capsule owns the core trie PLUS the Python value store: one strong
// PyObject* per node id (dense vector — node ids are arena indices).  The
// reference stores the value pointer inside its C node (src/trienode.h);
// keeping values host-side in a Python dict cost ~0.3 us per add/get in
// PyLong boxing + dict ops (measured head-to-head, round 4).  Values that
// participate in reference cycles through the automaton are not traversed
// by the GC (the capsule is opaque) — same trade-off as the reference's
// pre-tp_traverse versions.
struct PyTrie {
    Trie t;
    std::vector<PyObject*> vals;

    void val_set(int64_t nid, PyObject* v) {
        if ((size_t)nid >= vals.size()) vals.resize((size_t)nid + 1, nullptr);
        Py_XDECREF(vals[(size_t)nid]);
        Py_INCREF(v);
        vals[(size_t)nid] = v;
    }
    PyObject* val_peek(int64_t nid) const {
        if (nid < 0 || (size_t)nid >= vals.size()) return nullptr;
        return vals[(size_t)nid];
    }
    void val_clear_all() {
        for (PyObject* v : vals) Py_XDECREF(v);
        vals.clear();
    }
    ~PyTrie() { val_clear_all(); }
};

Trie* get_trie(PyObject* cap) {
    return &static_cast<PyTrie*>(PyCapsule_GetPointer(cap, kCapsuleName))->t;
}

void capsule_destructor(PyObject* cap) {
    PyTrie* t = static_cast<PyTrie*>(PyCapsule_GetPointer(cap, kCapsuleName));
    delete t;
}

PyTrie* get_pytrie(PyObject* cap) {
    return static_cast<PyTrie*>(PyCapsule_GetPointer(cap, kCapsuleName));
}

// Extract letters from a str into a stack/heap buffer.  Returns false and
// sets a TypeError for non-str.
struct Letters {
    uint32_t stack[64];
    uint32_t* heap = nullptr;
    uint32_t* data = nullptr;
    Py_ssize_t len = 0;
    ~Letters() { PyMem_Free(heap); }

    bool from_unicode(PyObject* obj) {
        if (!PyUnicode_Check(obj)) {
            PyErr_SetString(PyExc_TypeError, "string expected");
            return false;
        }
        len = PyUnicode_GET_LENGTH(obj);
        int kind = PyUnicode_KIND(obj);
        const void* src = PyUnicode_DATA(obj);
        if (kind == PyUnicode_4BYTE_KIND) {
            data = (uint32_t*)src;  // zero copy
            return true;
        }
        if ((size_t)len <= sizeof(stack) / sizeof(stack[0])) {
            data = stack;
        } else {
            heap = (uint32_t*)PyMem_Malloc((size_t)len * 4);
            if (!heap) {
                PyErr_NoMemory();
                return false;
            }
            data = heap;
        }
        if (kind == PyUnicode_1BYTE_KIND) {
            const Py_UCS1* s = (const Py_UCS1*)src;
            for (Py_ssize_t i = 0; i < len; i++) data[i] = s[i];
        } else {
            const Py_UCS2* s = (const Py_UCS2*)src;
            for (Py_ssize_t i = 0; i < len; i++) data[i] = s[i];
        }
        return true;
    }
};

bool get_u32_buffer(PyObject* obj, Py_buffer* view) {
    if (PyObject_GetBuffer(obj, view, PyBUF_C_CONTIGUOUS) != 0) return false;
    if (view->itemsize != 4) {
        PyBuffer_Release(view);
        PyErr_SetString(PyExc_TypeError, "expected a uint32/int32 buffer");
        return false;
    }
    return true;
}

// ---------------------------------------------------------------- methods

PyObject* m_new(PyObject*, PyObject*) {
    return PyCapsule_New(new PyTrie(), kCapsuleName, capsule_destructor);
}

PyObject* m_clear(PyObject*, PyObject* cap) {
    PyTrie* pt = get_pytrie(cap);
    aho_trie_clear(&pt->t);
    pt->val_clear_all();
    Py_RETURN_NONE;
}

PyObject* m_has_root(PyObject*, PyObject* cap) {
    return PyBool_FromLong(aho_trie_has_root(get_trie(cap)));
}

PyObject* m_add_word(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    Trie* t = get_trie(args[0]);
    Letters w;
    if (!w.from_unicode(args[1])) return NULL;
    return guarded([&]() {
        int64_t node = aho_trie_add_word(t, w.data, w.len);
        return Py_BuildValue("Li", (long long)node, aho_trie_last_new(t));
    });
}

PyObject* m_add_word_buf(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    Trie* t = get_trie(args[0]);
    Py_buffer view;
    if (!get_u32_buffer(args[1], &view)) return NULL;
    PyObject* r = guarded([&]() {
        int64_t node =
            aho_trie_add_word(t, (const uint32_t*)view.buf, view.len / 4);
        return Py_BuildValue("Li", (long long)node, aho_trie_last_new(t));
    });
    PyBuffer_Release(&view);
    return r;
}

PyObject* m_add_words(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // (trie, sequence_of_str) -> (list_of_node_ids, new_count); the whole
    // loop runs in C so bulk dictionary builds cost ~the reference's add loop
    Trie* t = get_trie(args[0]);
    PyObject* seq = PySequence_Fast(args[1], "expected a sequence of strings");
    if (!seq) return NULL;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    PyObject* ids = PyList_New(n);
    if (!ids) {
        Py_DECREF(seq);
        return NULL;
    }
    int64_t new_count = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject* word = PySequence_Fast_GET_ITEM(seq, i);
        Letters w;
        if (!w.from_unicode(word)) {
            Py_DECREF(seq);
            Py_DECREF(ids);
            return NULL;
        }
        PyObject* r = guarded([&]() {
            int64_t node =
                w.len ? aho_trie_add_word(t, w.data, w.len) : -1;
            if (w.len && t->last_new) new_count++;
            return PyLong_FromLongLong(node);
        });
        if (!r) {
            Py_DECREF(seq);
            Py_DECREF(ids);
            return NULL;
        }
        PyList_SET_ITEM(ids, i, r);
    }
    Py_DECREF(seq);
    return Py_BuildValue("NL", ids, (long long)new_count);
}

PyObject* m_find(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    Trie* t = get_trie(args[0]);
    Letters w;
    if (!w.from_unicode(args[1])) return NULL;
    return PyLong_FromLongLong(aho_trie_find(t, w.data, w.len));
}

PyObject* m_find_buf(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    Trie* t = get_trie(args[0]);
    Py_buffer view;
    if (!get_u32_buffer(args[1], &view)) return NULL;
    int64_t r = aho_trie_find(t, (const uint32_t*)view.buf, view.len / 4);
    PyBuffer_Release(&view);
    return PyLong_FromLongLong(r);
}

PyObject* m_find_eow(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    Trie* t = get_trie(args[0]);
    Letters w;
    if (!w.from_unicode(args[1])) return NULL;
    return PyLong_FromLongLong(aho_trie_find_eow(t, w.data, w.len));
}

// Hot-path fusion for Automaton.add_word (head-to-head parity with the
// reference's all-C src/Automaton.c:201-300): one FASTCALL does the trie
// insert AND the values-dict store, returning the new-word bool — the
// round-3 Python wrapper paid a tuple build/unpack plus a bytecode dict
// store per call (measured 1.24x the reference on 1M adds).
// args: (capsule, key_str, value) -> True iff new word
PyObject* m_add_word_store(PyObject*, PyObject* const* args,
                           Py_ssize_t nargs) {
    PyTrie* pt = get_pytrie(args[0]);
    Letters w;
    if (!w.from_unicode(args[1])) return NULL;
    int64_t node = -1;
    PyObject* r = guarded([&]() {
        node = aho_trie_add_word(&pt->t, w.data, w.len);
        return PyBool_FromLong(aho_trie_last_new(&pt->t));
    });
    if (!r) return NULL;
    pt->val_set(node, args[2]);
    return r;
}

// Hot-path fusion for Automaton.get: find the end-of-word node and fetch
// its value in one call.  args: (capsule, key_str[, default]) -> value;
// raises KeyError without a default.
PyObject* m_get_value(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    PyTrie* pt = get_pytrie(args[0]);
    Letters w;
    if (!w.from_unicode(args[1])) return NULL;
    int64_t node = aho_trie_find_eow(&pt->t, w.data, w.len);
    PyObject* v = pt->val_peek(node);
    if (v) { Py_INCREF(v); return v; }
    if (nargs >= 3) { Py_INCREF(args[2]); return args[2]; }
    PyErr_SetNone(PyExc_KeyError);
    return NULL;
}

// value-store primitives for the non-hot paths (NodeRef.value,
// remove/pop, BFS export/import)
PyObject* m_val_set(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    PyTrie* pt = get_pytrie(args[0]);
    int64_t nid = PyLong_AsLongLong(args[1]);
    if (nid < 0 && PyErr_Occurred()) return NULL;
    pt->val_set(nid, args[2]);
    Py_RETURN_NONE;
}

PyObject* m_val_get(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    PyTrie* pt = get_pytrie(args[0]);
    int64_t nid = PyLong_AsLongLong(args[1]);
    if (nid < 0 && PyErr_Occurred()) return NULL;
    PyObject* v = pt->val_peek(nid);
    if (!v) Py_RETURN_NONE;
    Py_INCREF(v);
    return v;
}

PyObject* m_val_pop(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    PyTrie* pt = get_pytrie(args[0]);
    int64_t nid = PyLong_AsLongLong(args[1]);
    if (nid < 0 && PyErr_Occurred()) return NULL;
    PyObject* v = pt->val_peek(nid);
    if (!v) Py_RETURN_NONE;
    pt->vals[(size_t)nid] = nullptr;  // transfer the reference to the caller
    return v;
}

PyObject* m_find_eow_buf(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    Trie* t = get_trie(args[0]);
    Py_buffer view;
    if (!get_u32_buffer(args[1], &view)) return NULL;
    int64_t r = aho_trie_find_eow(t, (const uint32_t*)view.buf, view.len / 4);
    PyBuffer_Release(&view);
    return PyLong_FromLongLong(r);
}

PyObject* m_remove_word(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    Trie* t = get_trie(args[0]);
    Letters w;
    if (!w.from_unicode(args[1])) return NULL;
    int64_t old = 0;
    int found = aho_trie_remove_word(t, w.data, w.len, &old);
    return Py_BuildValue("iL", found, (long long)old);
}

PyObject* m_remove_word_buf(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    Trie* t = get_trie(args[0]);
    Py_buffer view;
    if (!get_u32_buffer(args[1], &view)) return NULL;
    int64_t old = 0;
    int found = aho_trie_remove_word(t, (const uint32_t*)view.buf, view.len / 4, &old);
    PyBuffer_Release(&view);
    return Py_BuildValue("iL", found, (long long)old);
}

PyObject* m_longest_prefix(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    Trie* t = get_trie(args[0]);
    Letters w;
    if (!w.from_unicode(args[1])) return NULL;
    return PyLong_FromLongLong(aho_trie_longest_prefix(t, w.data, w.len));
}

PyObject* m_longest_prefix_buf(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    Trie* t = get_trie(args[0]);
    Py_buffer view;
    if (!get_u32_buffer(args[1], &view)) return NULL;
    int64_t r = aho_trie_longest_prefix(t, (const uint32_t*)view.buf, view.len / 4);
    PyBuffer_Release(&view);
    return PyLong_FromLongLong(r);
}

PyObject* m_node_eow(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    return PyBool_FromLong(
        aho_trie_node_eow(get_trie(args[0]), PyLong_AsLongLong(args[1])));
}

PyObject* m_set_value(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    aho_trie_set_value(get_trie(args[0]), PyLong_AsLongLong(args[1]),
                       PyLong_AsLongLong(args[2]));
    Py_RETURN_NONE;
}

PyObject* m_bfs_size(PyObject*, PyObject* cap) {
    return guarded(
        [&]() { return PyLong_FromLongLong(aho_trie_bfs_size(get_trie(cap))); });
}

PyObject* m_bfs_export(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // args: cap, parent_buf(u32), letter_buf(u32), eow_buf(u8), value_buf(i64)
    Trie* t = get_trie(args[0]);
    Py_buffer p, l, e, v;
    if (PyObject_GetBuffer(args[1], &p, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) return NULL;
    if (PyObject_GetBuffer(args[2], &l, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) { PyBuffer_Release(&p); return NULL; }
    if (PyObject_GetBuffer(args[3], &e, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) { PyBuffer_Release(&p); PyBuffer_Release(&l); return NULL; }
    if (PyObject_GetBuffer(args[4], &v, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) { PyBuffer_Release(&p); PyBuffer_Release(&l); PyBuffer_Release(&e); return NULL; }
    PyObject* r = guarded([&]() {
        aho_trie_bfs_export(t, (uint32_t*)p.buf, (uint32_t*)l.buf,
                            (uint8_t*)e.buf, (int64_t*)v.buf);
        Py_RETURN_NONE;
    });
    PyBuffer_Release(&p); PyBuffer_Release(&l); PyBuffer_Release(&e); PyBuffer_Release(&v);
    return r;
}

PyObject* m_import_arrays(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    Trie* t = get_trie(args[0]);
    Py_buffer p, l, e;
    if (PyObject_GetBuffer(args[1], &p, PyBUF_C_CONTIGUOUS)) return NULL;
    if (PyObject_GetBuffer(args[2], &l, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&p); return NULL; }
    if (PyObject_GetBuffer(args[3], &e, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&p); PyBuffer_Release(&l); return NULL; }
    PyObject* r = guarded([&]() {
        aho_trie_import(t, (const uint32_t*)p.buf, (const uint32_t*)l.buf,
                        (const uint8_t*)e.buf, p.len / 4);
        Py_RETURN_NONE;
    });
    PyBuffer_Release(&p); PyBuffer_Release(&l); PyBuffer_Release(&e);
    return r;
}

PyObject* m_stats(PyObject*, PyObject* cap) {
    int64_t nodes, words, links, depth_max, total;
    aho_trie_stats(get_trie(cap), &nodes, &words, &links, &depth_max, &total);
    return Py_BuildValue("LLLLL", (long long)nodes, (long long)words,
                         (long long)links, (long long)depth_max, (long long)total);
}

PyObject* m_node_edges(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    Trie* t = get_trie(args[0]);
    int64_t id = PyLong_AsLongLong(args[1]);
    int64_t deg = aho_trie_node_degree(t, id);
    PyObject* list = PyList_New(deg);
    if (!list) return NULL;
    std::vector<uint32_t> letters((size_t)deg);
    std::vector<int64_t> children((size_t)deg);
    if (deg) aho_trie_node_edges(t, id, letters.data(), children.data());
    for (int64_t i = 0; i < deg; i++) {
        PyObject* tup = Py_BuildValue("kL", (unsigned long)letters[(size_t)i],
                                      (long long)children[(size_t)i]);
        if (!tup) { Py_DECREF(list); return NULL; }
        PyList_SET_ITEM(list, i, tup);
    }
    return list;
}

PyObject* m_build_tables(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // parent(u32), cls(i32), eow(u8), K, level_starts(i64),
    // delta(i32 w), fail(i32 w), depth(i32 w), word_id(i32 w), mc(i32 w)
    Py_buffer p, c, e, ls, delta, fail, dep, wid, mc;
    long K = PyLong_AsLong(args[3]);
    PyObject* bufs[9] = {args[0], args[1], args[2], args[4], args[5],
                         args[6], args[7], args[8], args[9]};
    Py_buffer* views[9] = {&p, &c, &e, &ls, &delta, &fail, &dep, &wid, &mc};
    int flags[9] = {PyBUF_C_CONTIGUOUS, PyBUF_C_CONTIGUOUS, PyBUF_C_CONTIGUOUS,
                    PyBUF_C_CONTIGUOUS, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE,
                    PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE,
                    PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE,
                    PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE,
                    PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE};
    for (int i = 0; i < 9; i++) {
        if (PyObject_GetBuffer(bufs[i], views[i], flags[i])) {
            for (int j = 0; j < i; j++) PyBuffer_Release(views[j]);
            return NULL;
        }
    }
    int64_t S = p.len / 4;
    int64_t nlevels = ls.len / 8 - 1;
    PyObject* r = guarded([&]() {
        int64_t total = aho_build_tables(
            (const uint32_t*)p.buf, (const int32_t*)c.buf,
            (const uint8_t*)e.buf, S, (int32_t)K, (const int64_t*)ls.buf,
            nlevels, (int32_t*)delta.buf, (int32_t*)fail.buf,
            (int32_t*)dep.buf, (int32_t*)wid.buf, (int32_t*)mc.buf);
        return PyLong_FromLongLong(total);
    });
    for (int i = 0; i < 9; i++) PyBuffer_Release(views[i]);
    return r;
}

// Helper: grab N buffers with given writability flags; returns false (with
// everything released and an exception set) on failure.
struct Buffers {
    Py_buffer views[16];
    int count = 0;
    ~Buffers() {
        for (int i = 0; i < count; i++) PyBuffer_Release(&views[i]);
    }
    bool grab(PyObject* obj, bool writable) {
        int flags = PyBUF_C_CONTIGUOUS | (writable ? PyBUF_WRITABLE : 0);
        if (PyObject_GetBuffer(obj, &views[count], flags)) return false;
        count++;
        return true;
    }
    void* buf(int i) { return views[i].buf; }
    int64_t len(int i) { return views[i].len; }
};

PyObject* m_fail_links(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // parent(u32), cls(i32), eow(u8), K, level_starts(i64), child_off(i64),
    // root_goto(i32 w, zeroed), fail(i32 w), depth(i32 w), word_id(i32 w),
    // mc(i32 w), out_link(i32 w), nthreads -> total
    long K = PyLong_AsLong(args[3]);
    long nthreads = PyLong_AsLong(args[12]);
    Buffers b;
    if (!b.grab(args[0], false) || !b.grab(args[1], false) ||
        !b.grab(args[2], false) || !b.grab(args[4], false) ||
        !b.grab(args[5], false) || !b.grab(args[6], true) ||
        !b.grab(args[7], true) || !b.grab(args[8], true) ||
        !b.grab(args[9], true) || !b.grab(args[10], true) ||
        !b.grab(args[11], true))
        return NULL;
    int64_t S = b.len(0) / 4;
    int64_t nlevels = b.len(3) / 8 - 1;
    int64_t total = 0;
    bool oom = false;
    Py_BEGIN_ALLOW_THREADS
    try {
        total = aho_fail_links(
            (const uint32_t*)b.buf(0), (const int32_t*)b.buf(1),
            (const uint8_t*)b.buf(2), S, (int32_t)K, (const int64_t*)b.buf(3),
            nlevels, (const int64_t*)b.buf(4), (int32_t*)b.buf(5),
            (int32_t*)b.buf(6), (int32_t*)b.buf(7), (int32_t*)b.buf(8),
            (int32_t*)b.buf(9), (int32_t*)b.buf(10), (int32_t)nthreads);
    } catch (const std::bad_alloc&) {
        oom = true;
    }
    Py_END_ALLOW_THREADS
    if (oom) return PyErr_NoMemory();
    return PyLong_FromLongLong(total);
}

PyObject* m_fill_out_ids_linked(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // eow(u8), out_link(i32), word_id(i32), mc(i32), out_offsets(i64 w),
    // out_ids(i32 w)
    Buffers b;
    if (!b.grab(args[0], false) || !b.grab(args[1], false) ||
        !b.grab(args[2], false) || !b.grab(args[3], false) ||
        !b.grab(args[4], true) || !b.grab(args[5], true))
        return NULL;
    Py_BEGIN_ALLOW_THREADS
    aho_fill_out_ids_linked((const uint8_t*)b.buf(0), (const int32_t*)b.buf(1),
                            (const int32_t*)b.buf(2), (const int32_t*)b.buf(3),
                            b.len(0), (int64_t*)b.buf(4), (int32_t*)b.buf(5));
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

PyObject* m_build_delta(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // parent(u32), cls(i32), fail(i32), K, level_starts(i64), delta(i32 w),
    // nthreads
    long K = PyLong_AsLong(args[3]);
    long nthreads = PyLong_AsLong(args[6]);
    Buffers b;
    if (!b.grab(args[0], false) || !b.grab(args[1], false) ||
        !b.grab(args[2], false) || !b.grab(args[4], false) ||
        !b.grab(args[5], true))
        return NULL;
    int64_t S = b.len(0) / 4;
    int64_t nlevels = b.len(3) / 8 - 1;
    bool oom = false;
    Py_BEGIN_ALLOW_THREADS
    try {
        aho_build_delta((const uint32_t*)b.buf(0), (const int32_t*)b.buf(1),
                        (const int32_t*)b.buf(2), S, (int32_t)K,
                        (const int64_t*)b.buf(3), nlevels,
                        (int32_t*)b.buf(4), (int32_t)nthreads);
    } catch (const std::bad_alloc&) {
        oom = true;
    }
    Py_END_ALLOW_THREADS
    if (oom) return PyErr_NoMemory();
    Py_RETURN_NONE;
}

PyObject* m_scan_emit_sparse(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // cls_nodes(i32), child_off(i64), fail(i32), root_goto(i32), mc(i32),
    // offs(i64), oids(i32), cls(i32), s0, base, out_pos|None, out_pid|None,
    // cap -> (n, final_state)
    long s0 = PyLong_AsLong(args[8]);
    long long base = PyLong_AsLongLong(args[9]);
    long long cap = PyLong_AsLongLong(args[12]);
    Buffers b;
    if (!b.grab(args[0], false) || !b.grab(args[1], false) ||
        !b.grab(args[2], false) || !b.grab(args[3], false) ||
        !b.grab(args[4], false) || !b.grab(args[5], false) ||
        !b.grab(args[6], false) || !b.grab(args[7], false))
        return NULL;
    int64_t* out_pos = NULL;
    int32_t* out_pid = NULL;
    bool have_out = args[10] != Py_None;
    if (have_out) {
        if (!b.grab(args[10], true) || !b.grab(args[11], true)) return NULL;
        out_pos = (int64_t*)b.buf(8);
        out_pid = (int32_t*)b.buf(9);
    }
    int32_t fin = 0;
    int64_t n;
    Py_BEGIN_ALLOW_THREADS
    n = aho_scan_emit_sparse(
        (const int32_t*)b.buf(0), (const int64_t*)b.buf(1),
        (const int32_t*)b.buf(2), (const int32_t*)b.buf(3),
        (const int32_t*)b.buf(4), (const int64_t*)b.buf(5),
        (const int32_t*)b.buf(6), (const int32_t*)b.buf(7), b.len(7) / 4,
        (int32_t)s0, base, out_pos, out_pid, cap, &fin);
    Py_END_ALLOW_THREADS
    return Py_BuildValue("Li", (long long)n, (int)fin);
}

PyObject* m_patch_deep(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // cls_nodes(i32), child_off(i64), fail(i32), root_goto(i32), depth(i32),
    // mc(i32), offs(i64), oids(i32), wlen(i32), cls(i32), groups(i64),
    // span, d, warm, base, out_pos(w)|None, out_pid(w)|None, cap -> n
    long span = PyLong_AsLong(args[11]);
    long d = PyLong_AsLong(args[12]);
    long warm = PyLong_AsLong(args[13]);
    long long base = PyLong_AsLongLong(args[14]);
    long long cap = PyLong_AsLongLong(args[17]);
    if (PyErr_Occurred()) return NULL;
    Buffers b;
    for (int i = 0; i < 11; i++)
        if (!b.grab(args[i], false)) return NULL;
    int64_t* out_pos = NULL;
    int32_t* out_pid = NULL;
    if (args[15] != Py_None) {
        if (!b.grab(args[15], true) || !b.grab(args[16], true)) return NULL;
        out_pos = (int64_t*)b.buf(11);
        out_pid = (int32_t*)b.buf(12);
    }
    int64_t n;
    Py_BEGIN_ALLOW_THREADS
    n = aho_patch_deep(
        (const int32_t*)b.buf(0), (const int64_t*)b.buf(1),
        (const int32_t*)b.buf(2), (const int32_t*)b.buf(3),
        (const int32_t*)b.buf(4), (const int32_t*)b.buf(5),
        (const int64_t*)b.buf(6), (const int32_t*)b.buf(7),
        (const int32_t*)b.buf(8), (const int32_t*)b.buf(9), b.len(9) / 4,
        (const int64_t*)b.buf(10), b.len(10) / 8, (int32_t)span, (int32_t)d,
        (int32_t)warm, base, out_pos, out_pid, cap);
    Py_END_ALLOW_THREADS
    return PyLong_FromLongLong((long long)n);
}

PyObject* m_hotcold_compose(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // stA(i32), amA(u8), dpA(u8), Ka, stB(i32), amB(u8), dpB(u8), Kb,
    // spanA, stO(i32 w), amO(u8 w), dpO(u8 w), nthreads
    long long Ka = PyLong_AsLongLong(args[3]);
    long long Kb = PyLong_AsLongLong(args[7]);
    long spanA = PyLong_AsLong(args[8]);
    long nthreads = PyLong_AsLong(args[12]);
    if (PyErr_Occurred()) return NULL;
    Buffers b;
    if (!b.grab(args[0], false) || !b.grab(args[1], false) ||
        !b.grab(args[2], false) || !b.grab(args[4], false) ||
        !b.grab(args[5], false) || !b.grab(args[6], false) ||
        !b.grab(args[9], true) || !b.grab(args[10], true) ||
        !b.grab(args[11], true))
        return NULL;
    int64_t S = b.len(0) / 4 / Ka;
    Py_BEGIN_ALLOW_THREADS
    aho_hotcold_compose(
        (const int32_t*)b.buf(0), (const uint8_t*)b.buf(1),
        (const uint8_t*)b.buf(2), Ka, (const int32_t*)b.buf(3),
        (const uint8_t*)b.buf(4), (const uint8_t*)b.buf(5), Kb, S,
        (int32_t)spanA, (int32_t*)b.buf(6), (uint8_t*)b.buf(7),
        (uint8_t*)b.buf(8), (int32_t)nthreads);
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

PyObject* m_hotcold_pack(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // st(i32), am(u8), dp(u8), span, out(i32 w), nthreads
    long span = PyLong_AsLong(args[3]);
    long nthreads = PyLong_AsLong(args[5]);
    if (PyErr_Occurred()) return NULL;
    Buffers b;
    if (!b.grab(args[0], false) || !b.grab(args[1], false) ||
        !b.grab(args[2], false) || !b.grab(args[4], true))
        return NULL;
    Py_BEGIN_ALLOW_THREADS
    aho_hotcold_pack((const int32_t*)b.buf(0), (const uint8_t*)b.buf(1),
                     (const uint8_t*)b.buf(2), b.len(0) / 4, (int32_t)span,
                     (int32_t*)b.buf(3), (int32_t)nthreads);
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

PyObject* m_fill_out_ids(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // eow(u8), fail(i32), word_id(i32), mc(i32), out_offsets(i64 w), out_ids(i32 w)
    Py_buffer e, fl, wid, mc, offs, oids;
    if (PyObject_GetBuffer(args[0], &e, PyBUF_C_CONTIGUOUS)) return NULL;
    if (PyObject_GetBuffer(args[1], &fl, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&e); return NULL; }
    if (PyObject_GetBuffer(args[2], &wid, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&e); PyBuffer_Release(&fl); return NULL; }
    if (PyObject_GetBuffer(args[3], &mc, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&e); PyBuffer_Release(&fl); PyBuffer_Release(&wid); return NULL; }
    if (PyObject_GetBuffer(args[4], &offs, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) { PyBuffer_Release(&e); PyBuffer_Release(&fl); PyBuffer_Release(&wid); PyBuffer_Release(&mc); return NULL; }
    if (PyObject_GetBuffer(args[5], &oids, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) { PyBuffer_Release(&e); PyBuffer_Release(&fl); PyBuffer_Release(&wid); PyBuffer_Release(&mc); PyBuffer_Release(&offs); return NULL; }
    aho_fill_out_ids((const uint8_t*)e.buf, (const int32_t*)fl.buf,
                     (const int32_t*)wid.buf, (const int32_t*)mc.buf,
                     e.len, (int64_t*)offs.buf, (int32_t*)oids.buf);
    PyBuffer_Release(&e); PyBuffer_Release(&fl); PyBuffer_Release(&wid);
    PyBuffer_Release(&mc); PyBuffer_Release(&offs); PyBuffer_Release(&oids);
    Py_RETURN_NONE;
}

// ---- sequential scans over compiled tables ----------------------------

PyObject* m_scan_states(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // delta(i32 buf), K, cls(i32 buf), s0, out(i32 buf writable)
    Py_buffer delta, cls, out;
    long K = PyLong_AsLong(args[1]);
    long s0 = PyLong_AsLong(args[3]);
    if (PyObject_GetBuffer(args[0], &delta, PyBUF_C_CONTIGUOUS)) return NULL;
    if (PyObject_GetBuffer(args[2], &cls, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&delta); return NULL; }
    if (PyObject_GetBuffer(args[4], &out, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) { PyBuffer_Release(&delta); PyBuffer_Release(&cls); return NULL; }
    int32_t fin;
    Py_BEGIN_ALLOW_THREADS
    fin = aho_scan_states((const int32_t*)delta.buf, (int32_t)K,
                          (const int32_t*)cls.buf, cls.len / 4, (int32_t)s0,
                          (int32_t*)out.buf);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&delta); PyBuffer_Release(&cls); PyBuffer_Release(&out);
    return PyLong_FromLong(fin);
}

PyObject* m_scan_emit(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // delta, K, mc, offs, oids, cls, s0, base, out_pos|None, out_pid|None, cap
    Py_buffer delta, mc, offs, oids, cls;
    long K = PyLong_AsLong(args[1]);
    long s0 = PyLong_AsLong(args[6]);
    long long base = PyLong_AsLongLong(args[7]);
    long long cap = PyLong_AsLongLong(args[10]);
    if (PyObject_GetBuffer(args[0], &delta, PyBUF_C_CONTIGUOUS)) return NULL;
    if (PyObject_GetBuffer(args[2], &mc, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&delta); return NULL; }
    if (PyObject_GetBuffer(args[3], &offs, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&delta); PyBuffer_Release(&mc); return NULL; }
    if (PyObject_GetBuffer(args[4], &oids, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&delta); PyBuffer_Release(&mc); PyBuffer_Release(&offs); return NULL; }
    if (PyObject_GetBuffer(args[5], &cls, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&delta); PyBuffer_Release(&mc); PyBuffer_Release(&offs); PyBuffer_Release(&oids); return NULL; }
    int64_t* out_pos = NULL;
    int32_t* out_pid = NULL;
    Py_buffer pos_b, pid_b;
    bool have_out = args[8] != Py_None;
    if (have_out) {
        if (PyObject_GetBuffer(args[8], &pos_b, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) { PyBuffer_Release(&delta); PyBuffer_Release(&mc); PyBuffer_Release(&offs); PyBuffer_Release(&oids); PyBuffer_Release(&cls); return NULL; }
        if (PyObject_GetBuffer(args[9], &pid_b, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) { PyBuffer_Release(&delta); PyBuffer_Release(&mc); PyBuffer_Release(&offs); PyBuffer_Release(&oids); PyBuffer_Release(&cls); PyBuffer_Release(&pos_b); return NULL; }
        out_pos = (int64_t*)pos_b.buf;
        out_pid = (int32_t*)pid_b.buf;
    }
    int32_t fin = 0;
    int64_t n;
    Py_BEGIN_ALLOW_THREADS
    n = aho_scan_emit((const int32_t*)delta.buf, (int32_t)K,
                      (const int32_t*)mc.buf, (const int64_t*)offs.buf,
                      (const int32_t*)oids.buf, (const int32_t*)cls.buf,
                      cls.len / 4, (int32_t)s0, base, out_pos, out_pid,
                      cap, &fin);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&delta); PyBuffer_Release(&mc); PyBuffer_Release(&offs);
    PyBuffer_Release(&oids); PyBuffer_Release(&cls);
    if (have_out) { PyBuffer_Release(&pos_b); PyBuffer_Release(&pid_b); }
    return Py_BuildValue("Li", (long long)n, (int)fin);
}

PyObject* m_scan_states_blocked(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // delta(i32), K, cls(i32), H, out(i32 w)
    Py_buffer delta, cls, out;
    long K = PyLong_AsLong(args[1]);
    long H = PyLong_AsLong(args[3]);
    if (PyObject_GetBuffer(args[0], &delta, PyBUF_C_CONTIGUOUS)) return NULL;
    if (PyObject_GetBuffer(args[2], &cls, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&delta); return NULL; }
    if (PyObject_GetBuffer(args[4], &out, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) { PyBuffer_Release(&delta); PyBuffer_Release(&cls); return NULL; }
    Py_BEGIN_ALLOW_THREADS
    aho_scan_states_blocked((const int32_t*)delta.buf, (int32_t)K,
                            (const int32_t*)cls.buf, cls.len / 4, (int32_t)H,
                            (int32_t*)out.buf);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&delta); PyBuffer_Release(&cls); PyBuffer_Release(&out);
    Py_RETURN_NONE;
}

PyObject* m_emit_from_states(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // mc(i32), offs(i64), oids(i32), states(i32), base, out_pos|None, out_pid|None, cap
    Py_buffer mc, offs, oids, st;
    long long base = PyLong_AsLongLong(args[4]);
    long long cap = PyLong_AsLongLong(args[7]);
    if (PyObject_GetBuffer(args[0], &mc, PyBUF_C_CONTIGUOUS)) return NULL;
    if (PyObject_GetBuffer(args[1], &offs, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&mc); return NULL; }
    if (PyObject_GetBuffer(args[2], &oids, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&mc); PyBuffer_Release(&offs); return NULL; }
    if (PyObject_GetBuffer(args[3], &st, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&mc); PyBuffer_Release(&offs); PyBuffer_Release(&oids); return NULL; }
    int64_t* out_pos = NULL;
    int32_t* out_pid = NULL;
    Py_buffer pos_b, pid_b;
    bool have_out = args[5] != Py_None;
    if (have_out) {
        if (PyObject_GetBuffer(args[5], &pos_b, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) { PyBuffer_Release(&mc); PyBuffer_Release(&offs); PyBuffer_Release(&oids); PyBuffer_Release(&st); return NULL; }
        if (PyObject_GetBuffer(args[6], &pid_b, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) { PyBuffer_Release(&mc); PyBuffer_Release(&offs); PyBuffer_Release(&oids); PyBuffer_Release(&st); PyBuffer_Release(&pos_b); return NULL; }
        out_pos = (int64_t*)pos_b.buf;
        out_pid = (int32_t*)pid_b.buf;
    }
    int64_t nmatch;
    Py_BEGIN_ALLOW_THREADS
    nmatch = aho_emit_from_states(
        (const int32_t*)mc.buf, (const int64_t*)offs.buf,
        (const int32_t*)oids.buf, (const int32_t*)st.buf, st.len / 4, base,
        out_pos, out_pid, cap);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&mc); PyBuffer_Release(&offs); PyBuffer_Release(&oids);
    PyBuffer_Release(&st);
    if (have_out) { PyBuffer_Release(&pos_b); PyBuffer_Release(&pid_b); }
    return PyLong_FromLongLong(nmatch);
}

PyObject* m_resolve_states(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // delta(i32), K, cls(i32), pos(i64), H, out(i32 w)
    Py_buffer delta, cls, pos, out;
    long K = PyLong_AsLong(args[1]);
    long H = PyLong_AsLong(args[4]);
    if (PyObject_GetBuffer(args[0], &delta, PyBUF_C_CONTIGUOUS)) return NULL;
    if (PyObject_GetBuffer(args[2], &cls, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&delta); return NULL; }
    if (PyObject_GetBuffer(args[3], &pos, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&delta); PyBuffer_Release(&cls); return NULL; }
    if (PyObject_GetBuffer(args[5], &out, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) { PyBuffer_Release(&delta); PyBuffer_Release(&cls); PyBuffer_Release(&pos); return NULL; }
    Py_BEGIN_ALLOW_THREADS
    aho_resolve_states((const int32_t*)delta.buf, (int32_t)K,
                       (const int32_t*)cls.buf, cls.len / 4,
                       (const int64_t*)pos.buf, pos.len / 8, (int32_t)H,
                       (int32_t*)out.buf);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&delta); PyBuffer_Release(&cls); PyBuffer_Release(&pos);
    PyBuffer_Release(&out);
    Py_RETURN_NONE;
}

PyObject* m_hist3(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // cls(i32), K, start, hist(i64 w, zeroed by caller, K^3 bins)
    long K = PyLong_AsLong(args[1]);
    long long start = PyLong_AsLongLong(args[2]);
    if (PyErr_Occurred()) return NULL;  // non-int K/start
    Buffers b;
    if (!b.grab(args[0], false) || !b.grab(args[3], true)) return NULL;
    if (K < 1 || b.len(1) != (int64_t)K * K * K * 8) {
        PyErr_SetString(PyExc_ValueError,
                        "hist3: hist buffer must hold K^3 int64 bins");
        return NULL;
    }
    Py_BEGIN_ALLOW_THREADS
    aho_hist3((const int32_t*)b.buf(0), b.len(0) / 4, (int32_t)K, start,
              (int64_t*)b.buf(1));
    Py_END_ALLOW_THREADS
    Py_RETURN_NONE;
}

PyObject* m_alloc_fail_arm(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    long long n = PyLong_AsLongLong(args[0]);
    if (PyErr_Occurred()) return NULL;
    return PyLong_FromLongLong(aho_alloc_fail_arm(n));
}

PyObject* m_alloc_calls(PyObject*, PyObject*) {
    return PyLong_FromLongLong(aho_alloc_calls());
}

PyObject* m_emit_short(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // cls(i32), K, vstart, lut1(i32), lut2(i32), lut3(i32) -> (pos i64, id i32)
    // zero-length luts mean "no patterns of that length"; sizes validated
    // against K^l before the GIL is released.
    long K = PyLong_AsLong(args[1]);
    long long vstart = PyLong_AsLongLong(args[2]);
    if (PyErr_Occurred()) return NULL;
    Buffers b;
    if (!b.grab(args[0], false) || !b.grab(args[3], false) ||
        !b.grab(args[4], false) || !b.grab(args[5], false))
        return NULL;
    if (K < 1 ||
        (b.len(1) != 0 && b.len(1) != (int64_t)K * 4) ||
        (b.len(2) != 0 && b.len(2) != (int64_t)K * K * 4) ||
        (b.len(3) != 0 && b.len(3) != (int64_t)K * K * K * 4)) {
        PyErr_SetString(PyExc_ValueError,
                        "emit_short: lut sizes must be K^l int32");
        return NULL;
    }
    const int32_t* cls = (const int32_t*)b.buf(0);
    int64_t n = b.len(0) / 4;
    const int32_t* l1 = b.len(1) ? (const int32_t*)b.buf(1) : NULL;
    const int32_t* l2 = b.len(2) ? (const int32_t*)b.buf(2) : NULL;
    const int32_t* l3 = b.len(3) ? (const int32_t*)b.buf(3) : NULL;
    // threaded above ~4M chars: the count+fill passes were the emission
    // critical path at 134M chars (725 ms single-threaded, round-5)
    int64_t nchunks = 1;
    if (n >= (int64_t)1 << 22) {
        unsigned hc = std::thread::hardware_concurrency();
        nchunks = hc > 8 ? 8 : (hc ? hc : 1);
    }
    std::vector<int64_t> chunk_counts((size_t)nchunks, 0);
    std::vector<int64_t> chunk_written((size_t)nchunks, 0);
    int64_t cnt = 0;
    Py_BEGIN_ALLOW_THREADS
    cnt = aho_emit_short_count_mt(cls, n, (int32_t)K, vstart, l1, l2, l3,
                                  chunk_counts.data(), nchunks);
    Py_END_ALLOW_THREADS
    PyObject* pos_bytes = PyByteArray_FromStringAndSize(NULL, cnt * 8);
    PyObject* id_bytes = PyByteArray_FromStringAndSize(NULL, cnt * 4);
    if (!pos_bytes || !id_bytes) {
        Py_XDECREF(pos_bytes);
        Py_XDECREF(id_bytes);
        return NULL;
    }
    int64_t written = 0;
    Py_BEGIN_ALLOW_THREADS
    // per-chunk counts cap the fill: the count and fill passes both run
    // without the GIL, so a concurrently mutated cls buffer must not
    // overflow the bytearrays.
    written = aho_emit_short_fill_mt(
        cls, n, (int32_t)K, vstart, l1, l2, l3, chunk_counts.data(),
        nchunks, (int64_t*)PyByteArray_AS_STRING(pos_bytes),
        (int32_t*)PyByteArray_AS_STRING(id_bytes), chunk_written.data());
    Py_END_ALLOW_THREADS
    if (written < cnt) {  // fewer matches than counted: shrink to fit
        if (PyByteArray_Resize(pos_bytes, written * 8) ||
            PyByteArray_Resize(id_bytes, written * 4)) {
            Py_DECREF(pos_bytes);
            Py_DECREF(id_bytes);
            return NULL;
        }
    }
    PyObject* out = PyTuple_Pack(2, pos_bytes, id_bytes);
    Py_DECREF(pos_bytes);
    Py_DECREF(id_bytes);
    return out;
}

PyObject* m_iter_long_scan(PyObject*, PyObject* const* args, Py_ssize_t nargs) {
    // delta, K, depth, word_id, fail, cls, end, state(4-tuple),
    // out_pos, out_pid, cap  ->  (n, state-tuple)
    Py_buffer delta, dep, wid, fl, cls, pos_b, pid_b;
    long K = PyLong_AsLong(args[1]);
    long long end = PyLong_AsLongLong(args[6]);
    long long cap = PyLong_AsLongLong(args[10]);
    IterLongState st;
    if (!PyArg_ParseTuple(args[7], "iLiL", &st.state, &st.index, &st.last_pid,
                          &st.last_index))
        return NULL;
    if (PyObject_GetBuffer(args[0], &delta, PyBUF_C_CONTIGUOUS)) return NULL;
    if (PyObject_GetBuffer(args[2], &dep, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&delta); return NULL; }
    if (PyObject_GetBuffer(args[3], &wid, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&delta); PyBuffer_Release(&dep); return NULL; }
    if (PyObject_GetBuffer(args[4], &fl, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&delta); PyBuffer_Release(&dep); PyBuffer_Release(&wid); return NULL; }
    if (PyObject_GetBuffer(args[5], &cls, PyBUF_C_CONTIGUOUS)) { PyBuffer_Release(&delta); PyBuffer_Release(&dep); PyBuffer_Release(&wid); PyBuffer_Release(&fl); return NULL; }
    if (PyObject_GetBuffer(args[8], &pos_b, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) { PyBuffer_Release(&delta); PyBuffer_Release(&dep); PyBuffer_Release(&wid); PyBuffer_Release(&fl); PyBuffer_Release(&cls); return NULL; }
    if (PyObject_GetBuffer(args[9], &pid_b, PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE)) { PyBuffer_Release(&delta); PyBuffer_Release(&dep); PyBuffer_Release(&wid); PyBuffer_Release(&fl); PyBuffer_Release(&cls); PyBuffer_Release(&pos_b); return NULL; }
    int64_t n;
    Py_BEGIN_ALLOW_THREADS
    n = aho_iter_long_scan(
        (const int32_t*)delta.buf, (int32_t)K, (const int32_t*)dep.buf,
        (const int32_t*)wid.buf, (const int32_t*)fl.buf, (const int32_t*)cls.buf,
        end, &st, (int64_t*)pos_b.buf, (int32_t*)pid_b.buf, cap);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&delta); PyBuffer_Release(&dep); PyBuffer_Release(&wid);
    PyBuffer_Release(&fl); PyBuffer_Release(&cls); PyBuffer_Release(&pos_b);
    PyBuffer_Release(&pid_b);
    return Py_BuildValue("L(iLiL)", (long long)n, st.state, (long long)st.index,
                         st.last_pid, (long long)st.last_index);
}

PyMethodDef methods[] = {
    {"new", (PyCFunction)m_new, METH_NOARGS, ""},
    {"clear", (PyCFunction)m_clear, METH_O, ""},
    {"has_root", (PyCFunction)m_has_root, METH_O, ""},
    {"add_word", (PyCFunction)(void*)m_add_word, METH_FASTCALL, ""},
    {"add_word_buf", (PyCFunction)(void*)m_add_word_buf, METH_FASTCALL, ""},
    {"add_words", (PyCFunction)(void*)m_add_words, METH_FASTCALL, ""},
    {"find", (PyCFunction)(void*)m_find, METH_FASTCALL, ""},
    {"find_buf", (PyCFunction)(void*)m_find_buf, METH_FASTCALL, ""},
    {"find_eow", (PyCFunction)(void*)m_find_eow, METH_FASTCALL, ""},
    {"add_word_store", (PyCFunction)(void*)m_add_word_store, METH_FASTCALL, ""},
    {"get_value", (PyCFunction)(void*)m_get_value, METH_FASTCALL, ""},
    {"val_set", (PyCFunction)(void*)m_val_set, METH_FASTCALL, ""},
    {"val_get", (PyCFunction)(void*)m_val_get, METH_FASTCALL, ""},
    {"val_pop", (PyCFunction)(void*)m_val_pop, METH_FASTCALL, ""},
    {"find_eow_buf", (PyCFunction)(void*)m_find_eow_buf, METH_FASTCALL, ""},
    {"remove_word", (PyCFunction)(void*)m_remove_word, METH_FASTCALL, ""},
    {"remove_word_buf", (PyCFunction)(void*)m_remove_word_buf, METH_FASTCALL, ""},
    {"longest_prefix", (PyCFunction)(void*)m_longest_prefix, METH_FASTCALL, ""},
    {"longest_prefix_buf", (PyCFunction)(void*)m_longest_prefix_buf, METH_FASTCALL, ""},
    {"node_eow", (PyCFunction)(void*)m_node_eow, METH_FASTCALL, ""},
    {"set_value", (PyCFunction)(void*)m_set_value, METH_FASTCALL, ""},
    {"bfs_size", (PyCFunction)m_bfs_size, METH_O, ""},
    {"bfs_export", (PyCFunction)(void*)m_bfs_export, METH_FASTCALL, ""},
    {"import_arrays", (PyCFunction)(void*)m_import_arrays, METH_FASTCALL, ""},
    {"stats", (PyCFunction)m_stats, METH_O, ""},
    {"node_edges", (PyCFunction)(void*)m_node_edges, METH_FASTCALL, ""},
    {"build_tables", (PyCFunction)(void*)m_build_tables, METH_FASTCALL, ""},
    {"fail_links", (PyCFunction)(void*)m_fail_links, METH_FASTCALL, ""},
    {"fill_out_ids_linked", (PyCFunction)(void*)m_fill_out_ids_linked, METH_FASTCALL, ""},
    {"build_delta", (PyCFunction)(void*)m_build_delta, METH_FASTCALL, ""},
    {"scan_emit_sparse", (PyCFunction)(void*)m_scan_emit_sparse, METH_FASTCALL, ""},
    {"patch_deep", (PyCFunction)(void*)m_patch_deep, METH_FASTCALL, ""},
    {"hotcold_compose", (PyCFunction)(void*)m_hotcold_compose, METH_FASTCALL, ""},
    {"hotcold_pack", (PyCFunction)(void*)m_hotcold_pack, METH_FASTCALL, ""},
    {"fill_out_ids", (PyCFunction)(void*)m_fill_out_ids, METH_FASTCALL, ""},
    {"scan_states", (PyCFunction)(void*)m_scan_states, METH_FASTCALL, ""},
    {"scan_emit", (PyCFunction)(void*)m_scan_emit, METH_FASTCALL, ""},
    {"scan_states_blocked", (PyCFunction)(void*)m_scan_states_blocked, METH_FASTCALL, ""},
    {"emit_from_states", (PyCFunction)(void*)m_emit_from_states, METH_FASTCALL, ""},
    {"resolve_states", (PyCFunction)(void*)m_resolve_states, METH_FASTCALL, ""},
    {"hist3", (PyCFunction)(void*)m_hist3, METH_FASTCALL, ""},
    {"emit_short", (PyCFunction)(void*)m_emit_short, METH_FASTCALL, ""},
    {"_alloc_fail_arm", (PyCFunction)(void*)m_alloc_fail_arm, METH_FASTCALL, ""},
    {"_alloc_calls", (PyCFunction)(void*)m_alloc_calls, METH_NOARGS, ""},
    {"iter_long_scan", (PyCFunction)(void*)m_iter_long_scan, METH_FASTCALL, ""},
    {NULL, NULL, 0, NULL},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_ahocore", "native host core", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__ahocore(void) { return PyModule_Create(&moduledef); }
