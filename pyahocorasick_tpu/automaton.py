"""The Automaton class: pyahocorasick's full API surface, TPU-native inside.

The mutable phase (add_word/remove_word/...) lives on a host trie;
``make_automaton()`` lowers it to dense DFA tables (compiler.py) that the
JAX/Pallas scan engines execute; iterators re-expose the reference's lazy
protocol on top (iterators.py).

Behavioral parity notes are cited per method against /root/reference sources.
"""

from __future__ import annotations

import os

import numpy as np

from . import engines
from .compiler import CompiledAutomaton, compile_trie
from .constants import (
    AHOCORASICK,
    EMPTY,
    KEY_SEQUENCE,
    KEY_STRING,
    MATCH_AT_LEAST_PREFIX,
    MATCH_AT_MOST_PREFIX,
    MATCH_EXACT_LENGTH,
    STORE_ANY,
    STORE_INTS,
    STORE_LENGTH,
    TRIE,
)
from .iterators import ItemsIter, SearchIter, SearchIterLong
from .trie import Trie
from .utils import letters_of_haystack, letters_of_key, parse_start_end

# Mimic the reference's C struct sizes so __sizeof__/get_stats report the same
# kind of numbers (x86-64 layout; reference tests/test_unpickle.py:42-59).
_SIZEOF_TRIENODE = 32
_SIZEOF_AUTOMATON = 200


def _new_trie():
    """Pick the trie backend: native C++ core when built (see _native/), else
    the pure-Python oracle.  PYAHOCORASICK_TPU_NATIVE=0 forces Python."""
    from . import native

    if native.available():
        return native.NativeTrie()
    return Trie()


def _check_store(store):
    if store not in (STORE_LENGTH, STORE_INTS, STORE_ANY):
        raise ValueError(
            "store value must be one of ahocorasick.STORE_LENGTH, STORE_INTS or STORE_ANY"
        )


def _check_kind(kind):
    if kind not in (EMPTY, TRIE, AHOCORASICK):
        raise ValueError("kind value must be one of ahocorasick.EMPTY, TRIE or AHOCORASICK")


def _check_key_type(key_type):
    if key_type not in (KEY_STRING, KEY_SEQUENCE):
        raise ValueError("key_type must have value KEY_STRING or KEY_SEQUENCE")


class Automaton:
    """Trie/Aho-Corasick automaton with a dict-like interface.

    Constructor mirrors the reference (src/Automaton.c:96-181): either
    ``Automaton([store[, key_type]])`` or the internal 7-tuple unpickle form.
    """

    # subclasses that re-define key marshalling (e.g. the bytes build) must
    # turn off the direct str->native fast paths
    _fast_str_keys = True

    def __init__(self, *args):
        self._trie = _new_trie()  # property setter refreshes the fast path
        self._kind = EMPTY
        self._store = STORE_ANY
        self._key_type = KEY_STRING
        self._count = 0
        self._longest_word = 0
        self._version = 0
        self._compiled: CompiledAutomaton | None = None
        self._stats_cache = None
        self._stats_version = -1

        if len(args) == 7:
            from . import serialization

            blob, kind, store, key_type, count, longest_word, values = args
            _check_store(store)
            _check_kind(kind)
            _check_key_type(key_type)
            if not isinstance(blob, list):
                raise TypeError("Expected list")
            if kind != EMPTY:
                if values is None:
                    values = None
                serialization.unpickle_into(self, blob, values)
                self._kind = kind
                self._store = store
                self._key_type = key_type
                self._count = count
                self._longest_word = longest_word
                if kind == AHOCORASICK:
                    self._recompile()
        else:
            store, key_type = STORE_ANY, KEY_STRING
            # reference parses positionally with "ii" then "i" and silently
            # ignores non-int args (src/Automaton.c:149-173)
            ints = []
            for a in args[:2]:
                try:
                    ints.append(int(a.__index__()))
                except (AttributeError, TypeError):
                    ints = None
                    break
            if ints:
                if len(ints) >= 1:
                    store = ints[0]
                    _check_store(store)
                if len(ints) == 2:
                    key_type = ints[1]
                    _check_key_type(key_type)
            self._store = store
            self._key_type = key_type

    @property
    def _trie(self):
        return self._trie_obj

    @_trie.setter
    def _trie(self, trie):
        # keep the cached (ext_module, handle) fast-path pair in sync with
        # the backing trie — attribute-chain cost on the per-call paths
        # measured ~0.1 us at 1M-add rates, and a stale pair after a trie
        # swap (unpickle, tests forcing the Python backend) silently
        # queries the WRONG trie
        self._trie_obj = trie
        self._refresh_fastpath()

    def _refresh_fastpath(self):
        """Recompute the cached (ext_module, handle) fast-path pair (also
        exposed for callers that mutate the trie's identity in place)."""
        trie = self._trie_obj
        ext = getattr(trie, "_ext", None)
        self._exth = (ext, trie._h) if ext is not None else None

    # ------------------------------------------------------------------
    # read-only attributes
    # ------------------------------------------------------------------

    @property
    def kind(self):
        return self._kind

    @property
    def store(self):
        return self._store

    @property
    def key_type(self):
        return self._key_type

    # ------------------------------------------------------------------
    # mutation
    # ------------------------------------------------------------------

    def _marshal_key(self, key):
        """Validate a key and return (backend_key, length).  str keys pass
        through untouched (the native backend reads PyUnicode directly);
        KEY_SEQUENCE tuples are validated into uint32 arrays."""
        if self._key_type == KEY_STRING:
            if not isinstance(key, str):
                raise TypeError("string expected")
            return key, len(key)
        arr = letters_of_key(key, KEY_SEQUENCE)
        return arr, int(arr.size)

    def _marshal_haystack(self, obj):
        """Search-input -> uint32 letter array (type errors mirror the
        reference's iter()/find_all() checks, src/Automaton.c:903-964)."""
        return letters_of_haystack(obj, self._key_type)

    def _key_of_letters(self, letters):
        """Inverse mapping used by keys()/items() to materialize keys."""
        from .utils import key_from_letters

        return key_from_letters(letters, self._key_type)

    def _value_for(self, args, wordlen):
        """Store-specific value dispatch (src/Automaton.c:216-252)."""
        if self._store == STORE_ANY:
            if not args:
                raise ValueError("A value object is required as second argument.")
            return args[0]
        if self._store == STORE_INTS:
            if args:
                try:
                    return args[0].__index__()
                except AttributeError:
                    raise TypeError(
                        "An integer value is required as second argument."
                    ) from None
            return self._count + 1
        return wordlen  # STORE_LENGTH

    def add_word(self, key, *args):
        """Add a word to the trie, returning True only when the word is new.

        ``add_word(key)`` uses the store's default value (STORE_INTS: the
        running word count + 1; STORE_LENGTH: the key's length; STORE_ANY
        requires an explicit value).  ``add_word(key, value)`` stores/replaces
        the value.  The empty key stores nothing and returns False.  Adding
        to a compiled automaton downgrades ``kind`` back to TRIE — call
        :meth:`make_automaton` again before searching.

        >>> A = Automaton()
        >>> A.add_word("he", (0, "he"))
        True
        >>> A.add_word("he", "replacement")  # existing key: value replaced
        False

        (reference src/Automaton.c:201-300)"""
        # fast path: native trie + str key -> ONE extension call doing both
        # the insert and the values-dict store (head-to-head parity with
        # the reference's all-C add_word; the split call + Python dict
        # store measured 1.24x slower on 1M adds)
        eh = self._exth if self._fast_str_keys else None
        if eh is not None and self._key_type == KEY_STRING and type(key) is str:
            wordlen = len(key)
            # inline the dominant STORE_ANY case of _value_for: the method
            # call costs ~0.15 us per add at 1M-word build rates
            if args and self._store == STORE_ANY:
                value = args[0]
            else:
                value = self._value_for(args, wordlen)
            if wordlen == 0:
                return False
            new_word = eh[0].add_word_store(eh[1], key, value)
            self._kind = TRIE
            self._compiled = None
            if new_word:
                self._version += 1
                self._count += 1
                if wordlen > self._longest_word:
                    self._longest_word = wordlen
                return True
            return False

        key, wordlen = self._marshal_key(key)
        value = self._value_for(args, wordlen)

        if wordlen == 0:
            return False

        node, new_word = self._trie.add_word(key)
        node.value = value
        self._kind = TRIE
        self._compiled = None

        if new_word:
            self._version += 1
            self._count += 1
            if wordlen > self._longest_word:
                self._longest_word = wordlen
            return True
        return False

    def add_words(self, keys, values=None):
        """Bulk insertion (TPU-native extension; no reference counterpart).

        ``keys`` is a sequence of keys; ``values`` an optional equal-length
        sequence (required for STORE_ANY).  Per-element semantics match
        add_word (replace on duplicates).  Returns the number of new words.
        The whole trie walk runs in the native core for str keys, making
        million-word dictionary builds cost what the reference's C loop does.
        """
        from . import native

        keys = list(keys)
        if values is not None:
            values = list(values)
            if len(values) != len(keys):
                raise ValueError("keys and values must have equal length")
        if self._store == STORE_ANY and values is None:
            raise ValueError("A value object is required as second argument.")

        fast = (
            native.available()
            and self._key_type == KEY_STRING
            and isinstance(self._trie, native.NativeTrie)
            and not (self._store == STORE_INTS and values is None)
            and all(isinstance(k, str) for k in keys)
        )
        if not fast:
            new = 0
            for i, k in enumerate(keys):
                args = (values[i],) if values is not None else ()
                if self.add_word(k, *args):
                    new += 1
            return new

        trie = self._trie
        ids, new_count = trie._ext.add_words(trie._h, keys)
        val_set, h = trie._ext.val_set, trie._h
        longest = self._longest_word
        import operator

        for i, nid in enumerate(ids):
            if nid < 0:  # empty key
                continue
            if self._store == STORE_LENGTH:
                value = len(keys[i])
            elif self._store == STORE_INTS:
                value = operator.index(values[i])
            else:
                value = values[i]
            val_set(h, nid, value)
            if len(keys[i]) > longest:
                longest = len(keys[i])
        if any(len(k) > 0 for k in keys):
            self._kind = TRIE
            self._compiled = None
        if new_count:
            self._version += 1
            self._count += new_count
            self._longest_word = longest
        return int(new_count)

    def remove_word(self, key):
        """Remove a word; returns True when it was present.

        Prunes now-dangling trie tails, downgrades ``kind`` to TRIE and
        invalidates live iterators.
        (reference src/Automaton.c:302-350, src/trie.c:66-136)"""
        key, wordlen = self._marshal_key(key)
        if wordlen == 0:
            return False
        found, _ = self._trie.remove_word(key)
        if found:
            self._kind = TRIE
            self._compiled = None
            self._version += 1
            self._count -= 1
        return found

    def pop(self, key):
        """Remove a word and return its value; KeyError when absent.

        Same side effects as :meth:`remove_word`.
        (reference src/Automaton.c:353-371)"""
        key, wordlen = self._marshal_key(key)
        found, value = (False, None) if wordlen == 0 else self._trie.remove_word(key)
        if not found:
            raise KeyError()
        self._kind = TRIE
        self._compiled = None
        self._version += 1
        self._count -= 1
        return value

    def clear(self):
        """Remove every word; ``kind`` becomes EMPTY.
        (reference src/Automaton.c:375-417)"""
        self._trie.clear()
        self._count = 0
        self._longest_word = 0
        self._kind = EMPTY
        self._compiled = None
        self._version += 1

    # ------------------------------------------------------------------
    # queries
    # ------------------------------------------------------------------

    def __len__(self):
        return self._count

    def exists(self, key):
        """True when ``key`` is a complete stored word (== ``key in A``).
        Prefixes of stored words do NOT count — see :meth:`match`.
        (reference src/Automaton.c:420-457)"""
        trie = self._trie
        ext = getattr(trie, "_ext", None) if self._fast_str_keys else None
        if ext is not None and self._key_type == KEY_STRING:
            # ext raises the same TypeError("string expected") for non-str
            return ext.find_eow(trie._h, key) >= 0
        node = trie.find(self._marshal_key(key)[0])
        return bool(node is not None and node.eow)

    __contains__ = exists

    def match(self, key):
        """True when ``key`` is a prefix of (or equal to) any stored word.

        >>> A.add_word("hers", 1); A.match("he"), A.exists("he")
        (True, False)

        (reference src/Automaton.c:460-479)"""
        trie = self._trie
        ext = getattr(trie, "_ext", None) if self._fast_str_keys else None
        if ext is not None and self._key_type == KEY_STRING:
            return ext.find(trie._h, key) >= 0
        return trie.find(self._marshal_key(key)[0]) is not None

    def longest_prefix(self, key):
        """Length of the longest stored-word path-prefix of ``key``.

        >>> A.add_word("hers", 1); A.longest_prefix("herself!")
        4

        (reference trie_longest, src/trie.c:158-174)"""
        trie = self._trie
        ext = getattr(trie, "_ext", None) if self._fast_str_keys else None
        if ext is not None and self._key_type == KEY_STRING:
            return ext.longest_prefix(trie._h, key)
        return trie.longest_prefix(self._marshal_key(key)[0])

    def get(self, key, *args):
        """Value stored for ``key``; with a second argument, that default
        instead of KeyError when the key is absent.
        (reference src/Automaton.c:501-552)"""
        if len(args) > 1:
            raise TypeError("get() takes one or two arguments (%d given)" % (1 + len(args)))
        eh = self._exth if self._fast_str_keys else None
        if eh is not None and self._key_type == KEY_STRING:
            # one C call: find_eow + value fetch + default/KeyError
            return eh[0].get_value(eh[1], key, *args)
        node = self._trie.find(self._marshal_key(key)[0])
        if node is not None and node.eow:
            return node.value
        if args:
            return args[0]
        raise KeyError()

    # ------------------------------------------------------------------
    # compilation
    # ------------------------------------------------------------------

    def make_automaton(self):
        """Compile the trie into a searchable Aho-Corasick automaton.

        Computes failure links (BFS) and lowers the trie to the search
        engines' table form; afterwards ``kind == AHOCORASICK`` and the
        search methods (:meth:`iter`, :meth:`find_all`, ...) work.  No-op
        (returns False) unless ``kind == TRIE``.  Any later mutation
        downgrades the kind again; just recall this method.

        (reference BFS src/Automaton.c:560-649; here vectorized per level —
        see compiler.py — with the dense device table materialized lazily)"""
        if self._kind != TRIE:
            return False
        self._recompile()
        self._kind = AHOCORASICK
        self._version += 1
        return None

    def _recompile(self):
        self._compiled = compile_trie(self._trie, self._store, self._count)

    def _ensure_compiled(self) -> CompiledAutomaton:
        if self._compiled is None:
            self._recompile()
        return self._compiled

    def _value_of_pid(self, pid: int):
        return self._compiled.values[pid]

    # ------------------------------------------------------------------
    # search
    # ------------------------------------------------------------------

    def find_all(self, string, callback, *args):
        """Eager search: invoke ``callback(end_index, value)`` for every
        match of every stored word in ``string[start:end]``.

        Equivalent to ``for end, val in A.iter(string, *args):
        callback(end, val)``.  (reference src/Automaton.c:652-719)"""
        if self._kind != AHOCORASICK:
            return None
        if not callable(callback):
            raise TypeError("The callback argument must be a callable such as a function.")
        letters = self._marshal_haystack(string)
        start, end = parse_start_end(args, 0, 1, 0, letters.size)
        compiled = self._ensure_compiled()
        cls = compiled.classes_of(letters[start:end]).astype(np.int32)
        positions, pids = engines.emit(compiled, cls, base=start)
        values = compiled.values
        for pos, pid in zip(positions.tolist(), pids.tolist()):
            callback(pos, values[pid])
        return None

    def iter(self, string, start=-1, end=-1, ignore_white_space=False):
        """Lazy search iterator over ``string[start:end]`` yielding
        ``(end_index, value)`` for every occurrence of every stored word —
        overlapping and nested matches included, ordered by end index
        ascending, longest word first at equal ends.

        ``end`` is exclusive; negative indices follow slice semantics.
        ``ignore_white_space=True`` skips whitespace without consuming
        automaton state.  The returned iterator's ``set(next_chunk)``
        re-targets it for streaming: automaton state carries across chunks
        and reported indices stay global (``set(chunk, True)`` resets).
        Raises AttributeError until :meth:`make_automaton` has been called;
        mutating the automaton mid-iteration raises ValueError.

        >>> list(A.iter("_sherhershe_"))[:3]
        [(3, 'she'), (3, 'he'), (4, 'her')]

        (reference src/Automaton.c:875-966, src/AutomatonSearchIter.c)"""
        if self._kind != AHOCORASICK:
            raise AttributeError(
                "Not an Aho-Corasick automaton yet: call add_word to add "
                "some keys and call make_automaton to convert the trie to "
                "an automaton."
            )
        letters = self._marshal_haystack(string)  # validates the input type
        s = 0 if start == -1 else int(start)
        e = int(letters.size) if end == -1 else int(end)
        self._ensure_compiled()
        return SearchIter(self, string, s, e, ignore_white_space)

    def iter_long(self, string, *args):
        """Like :meth:`iter` but reports only the longest non-overlapping
        matches (greedy left-to-right tiling).  Also supports ``set()``.
        (reference src/Automaton.c:969-1041, src/AutomatonSearchIterLong.c,
        incl. the issue-133 corner-case rules)"""
        if self._kind != AHOCORASICK:
            raise AttributeError("not an automaton yet; add some words and call make_automaton")
        letters = self._marshal_haystack(string)
        start, end = parse_start_end(args, 0, 1, 0, letters.size)
        self._ensure_compiled()
        return SearchIterLong(self, string, start, end)

    # ------------------------------------------------------------------
    # bulk / array APIs (TPU-native extensions; no reference counterpart)
    # ------------------------------------------------------------------

    def search_arrays(self, string):
        """Bulk search: returns (end_indices, pattern_ids, values_list).

        ``values_list`` is indexable by pattern id.  This is the zero-overhead
        path for large corpora: the scan runs as the blocked device kernel and
        only compacted match arrays come back to the host.
        """
        if self._kind != AHOCORASICK:
            raise AttributeError("not an automaton yet; add some words and call make_automaton")
        compiled = self._ensure_compiled()
        letters = self._marshal_haystack(string)
        cls = compiled.classes_of(letters).astype(np.int32)
        positions, pids = engines.emit(compiled, cls)
        return positions, pids, compiled.values

    def count_matches(self, string):
        """Per-pattern match counts as an int64 array (device-side reduction;
        the counts-only mode of BASELINE config 'CRISPR guides over DNA')."""
        if self._kind != AHOCORASICK:
            raise AttributeError("not an automaton yet; add some words and call make_automaton")
        compiled = self._ensure_compiled()
        letters = self._marshal_haystack(string)
        cls = compiled.classes_of(letters).astype(np.int32)
        return engines.count_matches(compiled, cls)

    def count_total(self, string):
        """Total number of matches over the haystack.

        Uses the packed stride-2 engine (two chars per device gather, counts
        folded into the transition entries; ops/stride.py) when the automaton
        admits it, else falls back to the per-pattern counts reduction.
        """
        if self._kind != AHOCORASICK:
            raise AttributeError("not an automaton yet; add some words and call make_automaton")
        compiled = self._ensure_compiled()
        letters = self._marshal_haystack(string)
        cls = compiled.classes_of(letters).astype(np.int32)
        return engines.count_total(compiled, cls)

    def prewarm(self, n_chars_hint=1 << 27, mode="counts", engine=None):
        """Start compiling/loading the device scan programs in a background
        thread and return the (started) ``threading.Thread``.

        Device engines jit-compile per input-size bucket, so the warmup
        runs ``mode`` end-to-end at EXACTLY ``n_chars_hint`` characters:
        it warms precisely the engines :func:`engines.plan_chain` selects
        at that size (VERDICT r4 item 8) — prewarming the default hint
        then querying a much smaller corpus still compiles for the smaller
        bucket.  The returned thread carries two attributes: ``plan`` (the
        engine chain planned for the hinted size) and, once joined,
        ``warmed`` (the engine that actually ran).  Call ``prewarm`` right
        after ``make_automaton`` with the approximate corpus size and
        overlap the latency with your own data loading; ``join()`` the
        thread (or just issue the first query) when ready.  The reference
        has no analog — searches there start cold by construction
        (src/AutomatonSearchIter.c).

        Example::

            A.make_automaton()
            t = A.prewarm(len(corpus))
            corpus = load_corpus()   # overlaps the compile
            t.join()
            assert t.warmed in t.plan
            hits = A.count_matches(corpus)   # warm
        """
        import threading

        if self._kind != AHOCORASICK:
            raise AttributeError(
                "not an automaton yet; add some words and call make_automaton"
            )
        if mode not in ("counts", "emit"):
            raise ValueError("mode must be 'counts' or 'emit'")
        compiled = self._ensure_compiled()
        if engine is None:
            run = (
                (lambda c: engines.count_matches(compiled, c))
                if mode == "counts"
                else (lambda c: engines.emit(compiled, c))
            )
        else:
            # warm one SPECIFIC device engine (the auto chain stops at the
            # first engine that succeeds, so engines further down — e.g.
            # the cascade fallback — never load their programs otherwise)
            if mode == "counts":
                def run(c, _e=engine):
                    return engines._counts_device_engine(
                        _e, compiled, c, None
                    )
            else:
                raise ValueError(
                    "engine= prewarm is only supported for mode='counts'"
                )

        def _warm():
            try:
                # a pseudo-random class stream, NOT zeros: a constant
                # stream gives every position the same n-gram codes, and
                # if that one value passes a stage-1 bloom the candidate
                # machinery floods (and would poison the escalation
                # caches); random streams warm at realistic rates
                cls = np.random.default_rng(0).integers(
                    0, max(compiled.num_classes, 1), int(n_chars_hint)
                ).astype(np.int32)
                run(cls)
                if int(n_chars_hint) >= (1 << 22):
                    # second pass: the first call measured the survivor
                    # rate, and the device engines size their speculative
                    # verify programs from it — warm THOSE (the first
                    # pass used the build-time estimate's bucket)
                    run(cls)
                th.warmed = (
                    engine
                    if engine is not None
                    else engines.last_engine.get(mode)
                )
            except Exception:  # noqa: BLE001 — warmup is best-effort
                pass

        th = threading.Thread(target=_warm, daemon=True)
        th.plan = (
            [engine]
            if engine is not None
            else engines.plan_chain(compiled, int(n_chars_hint), mode)
        )
        th.warmed = None
        th.start()
        return th

    def profile_scan(self, string, mode="counts", reps=3):
        """Per-stage wall-clock profile of one scan over ``string``.

        Returns a dict with the planned engine, per-stage seconds
        (``marshal``, ``classify``, cold and warm ``engine`` time), warm
        ``ns_per_char`` and ``GBps``.  ``mode`` is ``"counts"`` (per-pattern
        reduction) or ``"emit"`` (full match emission).  Set
        ``PYAHOCORASICK_TPU_TRACE=<dir>`` to also capture a JAX profiler
        trace of the warm runs (view with TensorBoard or Perfetto).

        This productizes the stage instrumentation the benchmarks use
        (reference analog: etc/benchmarks/benchmark.py's ElapsedTime) —
        the reference ships no user-callable profiler; a TPU library needs
        one because throughput depends on dispatch mode and compile cache
        state.

        Example::

            >>> A = Automaton(); _ = A.add_word("he", 1)
            >>> A.make_automaton()
            >>> p = A.profile_scan("hehehe" * 1000)
            >>> sorted(p)[:3]
            ['GBps', 'engine', 'engine_cold_s']
        """
        import time as _time

        if self._kind != AHOCORASICK:
            raise AttributeError(
                "not an automaton yet; add some words and call make_automaton"
            )
        if mode not in ("counts", "emit"):
            raise ValueError("mode must be 'counts' or 'emit'")
        compiled = self._ensure_compiled()
        out = {}
        t0 = _time.perf_counter()
        letters = self._marshal_haystack(string)
        out["marshal_s"] = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        cls = compiled.classes_of(letters).astype(np.int32)
        out["classify_s"] = _time.perf_counter() - t0
        n = int(cls.size)
        out["n_chars"] = n
        out["engine"] = engines.describe_plan(compiled, n)

        run = (
            (lambda: engines.count_matches(compiled, cls))
            if mode == "counts"
            else (lambda: engines.emit(compiled, cls))
        )
        t0 = _time.perf_counter()
        run()
        out["engine_cold_s"] = _time.perf_counter() - t0

        trace_dir = os.environ.get("PYAHOCORASICK_TPU_TRACE")
        ctx = None
        if trace_dir:
            try:
                import jax

                ctx = jax.profiler.trace(trace_dir)
            except Exception:  # noqa: BLE001 — tracing is best-effort
                ctx = None
        if ctx is not None:
            ctx.__enter__()
        try:
            best = float("inf")
            for _ in range(max(int(reps), 1)):
                t0 = _time.perf_counter()
                run()
                best = min(best, _time.perf_counter() - t0)
        finally:
            if ctx is not None:
                ctx.__exit__(None, None, None)
        out["engine_s"] = best
        out["ns_per_char"] = best / max(n, 1) * 1e9
        out["GBps"] = n / best / 1e9 if best > 0 else float("inf")
        if trace_dir:
            out["trace_dir"] = trace_dir
        return out

    # ------------------------------------------------------------------
    # keys / values / items
    # ------------------------------------------------------------------

    def _items_iter(self, kind, args):
        pattern = []
        use_wildcard = False
        wildcard = 0
        if len(args) >= 1 and args[0] is not None:
            pattern = [int(x) for x in letters_of_key(args[0], self._key_type)]
        if len(args) >= 2 and args[1] is not None:
            wl = letters_of_key(args[1], self._key_type)
            if wl.size != 1:
                raise ValueError("Wildcard must be a single character.")
            wildcard = int(wl[0])
            use_wildcard = True
        if len(args) >= 3 and args[2] is not None:
            matchtype = int(args[2])
            if matchtype not in (
                MATCH_AT_LEAST_PREFIX,
                MATCH_AT_MOST_PREFIX,
                MATCH_EXACT_LENGTH,
            ):
                raise ValueError(
                    "The optional how third argument must be one of: "
                    "MATCH_EXACT_LENGTH, MATCH_AT_LEAST_PREFIX or MATCH_AT_LEAST_PREFIX"
                )
        else:
            matchtype = MATCH_EXACT_LENGTH if use_wildcard else MATCH_AT_LEAST_PREFIX
        return ItemsIter(self, kind, pattern, use_wildcard, wildcard, matchtype)

    def keys(self, *args):
        return self._items_iter(ItemsIter.KEYS, args)

    def values(self, *args):
        return self._items_iter(ItemsIter.VALUES, args)

    def items(self, *args):
        return self._items_iter(ItemsIter.ITEMS, args)

    def __iter__(self):
        return self.keys()

    # ------------------------------------------------------------------
    # introspection
    # ------------------------------------------------------------------

    def get_stats(self):
        """Dict of automaton statistics: ``nodes_count``, ``words_count``,
        ``longest_word``, ``links_count``, ``sizeof_node``, ``total_size``.
        Recomputed only after mutations (cached per version, like the
        reference src/Automaton.c:1044-1096)."""
        if self._stats_version != self._version or self._stats_cache is None:
            if self._kind != EMPTY and self._trie.root is not None:
                self._stats_cache = self._trie.stats()
            else:
                self._stats_cache = {
                    "nodes_count": 0,
                    "words_count": 0,
                    "longest_word": 0,
                    "links_count": 0,
                    "sizeof_node": _SIZEOF_TRIENODE,
                    "total_size": 0,
                }
            self._stats_version = self._version
        return dict(self._stats_cache)

    def dump(self):
        """Graph triple (nodes, edges, fail) with int node ids; node ids are
        BFS indices (the reference uses pointers — opaque ids either way;
        src/Automaton.c:1100-1180)."""
        if self._kind == EMPTY:
            return None
        arrays = self._trie.bfs_arrays()
        if arrays is None:
            return None
        parent, letter, eow, _values = arrays
        S = parent.size
        nodes = [(i, int(eow[i])) for i in range(S)]
        if self._key_type == KEY_SEQUENCE:
            # sequence letters are full uint32 (utils/textio.py:44-47) and
            # may exceed chr()'s 0x10FFFF range: emit int edge labels
            edges = [
                (int(parent[i]), int(letter[i]), i) for i in range(1, S)
            ]
        else:
            edges = [
                (int(parent[i]), chr(int(letter[i])), i) for i in range(1, S)
            ]
        fail = []
        if self._kind == AHOCORASICK and self._compiled is not None:
            fail = [(i, int(self._compiled.fail[i])) for i in range(S)]
        return (nodes, edges, fail)

    def __sizeof__(self):
        size = _SIZEOF_AUTOMATON
        if self._kind != EMPTY:
            size += self.get_stats()["total_size"]
        return size

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------

    def __reduce__(self):
        from . import serialization

        return serialization.reduce_automaton(self)

    def save(self, *args):
        """Write the automaton to ``path`` in the streaming file format
        (low peak memory; validated magic header/footer).

        ``save(path, serializer)`` for STORE_ANY — the serializer (e.g.
        ``pickle.dumps``) converts each value to bytes; ``save(path)`` for
        the int stores.  Reload with module-level ``load(path,
        deserializer)``.  (reference src/custompickle/; arg validation
        mirrors pyhelpers.c:8-44)"""
        from . import serialization

        if self._store == STORE_ANY:
            if len(args) != 2:
                raise ValueError("expected exactly two arguments")
        else:
            if len(args) != 1:
                raise ValueError("expected exactly one argument")
        path = args[0]
        serializer = args[1] if len(args) == 2 else None
        if not isinstance(path, str):
            raise TypeError("the first argument must be a string")
        if self._store == STORE_ANY and not callable(serializer):
            raise TypeError("the second argument must be a callable object")
        serialization.save_automaton(self, path, serializer)
