"""Engine dispatch: pick the best available scan engine for an input size.

Engines (all bit-identical in output, covered by differential tests):

* ``seq``   — Python/numpy sequential oracle (tiny inputs, ground truth)
* ``numpy`` — lane-parallel halo-blocked scan in numpy
* ``jax``   — the same decomposition as a jitted XLA program on the default
              backend (TPU in production, CPU in tests)

Selection is automatic by input size; ``PYAHOCORASICK_TPU_ENGINE`` forces one
(values: auto, seq, numpy, jax) — the test suite uses this to run the whole
conformance corpus on every engine.
"""

from __future__ import annotations

import os

import numpy as np

from .compiler import CompiledAutomaton
from .ops import cpu

_JAX_MIN = 1 << 16  # below this, device dispatch overhead dominates
_NUMPY_MIN = 1 << 11

_jax_failed = False


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


def scan_states(
    compiled: CompiledAutomaton, cls: np.ndarray, halo: np.ndarray | None = None
) -> np.ndarray:
    """Return int32 DFA states after each position of ``cls``, given that the
    characters in ``halo`` (may be empty) were consumed immediately before."""
    global _jax_failed
    engine = _forced()
    N = int(cls.size)

    if engine == "auto":
        from . import native

        if N >= _JAX_MIN and not _jax_failed:
            engine = "jax"
        elif native.available():
            engine = "seq"  # native sequential beats numpy lanes on host
        elif N >= _NUMPY_MIN:
            engine = "numpy"
        else:
            engine = "seq"

    if engine == "assoc":
        # associative transition-composition decomposition (ops/assoc.py):
        # exact with no bounded-history assumption; correctness cross-check
        try:
            from .ops import assoc

            if assoc.assoc_ok(compiled):
                return assoc.scan_states_assoc(compiled, cls, halo)
        except ImportError:
            _jax_failed = True
        engine = "numpy"  # gated out (too many states): exact fallback

    if engine == "jax":
        try:
            from .ops import scan as jax_scan

            return jax_scan.scan_states_jax(compiled, cls, halo)
        except ImportError:  # jax unavailable: degrade permanently
            _jax_failed = True
            engine = "numpy"

    if engine == "numpy":
        return cpu.scan_states_blocked(compiled, cls, halo)

    from . import native

    if native.available():
        if N >= native._BLOCKED_MIN:
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


def describe_plan(compiled: CompiledAutomaton, n: int) -> str:
    """Name of the engine the auto dispatcher would pick for an n-char scan
    (introspection only; the actual call may still fall back on gating)."""
    forced = _forced()
    if forced != "auto":
        return forced
    if n < _NUMPY_MIN:
        return "seq"
    if n < _JAX_MIN or _jax_failed:
        return "numpy"
    if _small_table(compiled):
        return "jax:bilinear-small"
    if _device_backend():
        return "cascade"
    return "jax:blocked-scan"


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
    engine = _forced()
    N = int(cls.size)
    if engine == "cascade" or (
        engine == "auto"
        and N >= _JAX_MIN
        and not _jax_failed
        and _device_backend()
        and not _small_table(compiled)  # bilinear scan beats the cascade
    ):
        # cascade emission: exact bitmap short matches + verified deep
        # candidates, no per-char DFA gather; None -> classic path below
        try:
            from .ops import cascade_emit

            res = cascade_emit.emit_matches_cascade(compiled, cls, halo, base)
            if res is not None:
                return res
        except ImportError:
            _jax_failed = True
        if engine == "cascade":
            engine = "auto"
    if not compiled.has_delta and compiled.child_off is not None:
        # dense table not yet lowered: scan sparsely (goto via child runs +
        # fail chains) unless the input is big enough that lowering pays for
        # itself (device path amortizes the build over the corpus)
        from . import native

        if (
            native.available()
            and engine in ("auto", "seq")
            and (N < _JAX_MIN or N < compiled.num_states)
        ):
            pos, pids, _ = native.scan_emit_sparse(compiled, cls, halo, base)
            return pos, pids
    if engine == "auto" and N >= _JAX_MIN and not _jax_failed:
        engine = "jax"
    if engine == "jax":
        from . import native

        if native.available():
            try:
                from .ops import scan as jax_scan

                positions = jax_scan.matched_positions_jax(compiled, cls, halo)
                if positions.size == 0:
                    return (
                        np.empty(0, dtype=np.int64),
                        np.empty(0, dtype=np.int64),
                    )
                H = max(int(compiled.longest_word), 1)
                # dense-match texts: window re-resolution would cost ~H per
                # position, so switch to full state materialization instead
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
                    states_at = native.resolve_states(compiled, cls, positions)
                pos, pids = cpu.expand_matches(compiled, positions, states_at)
                return pos + base, pids
            except ImportError:
                _jax_failed = True
    states = scan_states(compiled, cls, halo)
    return cpu.emit_matches(compiled, states, base=base)


def count_matches(
    compiled: CompiledAutomaton, cls: np.ndarray, halo: np.ndarray | None = None
) -> np.ndarray:
    """Per-pattern int64 match counts for a haystack."""
    global _jax_failed
    engine = _forced()
    N = int(cls.size)
    if engine == "fused" or (
        engine == "auto"
        and N >= _JAX_MIN
        and not _jax_failed
        and _device_backend()
        and not _small_table(compiled)
    ):
        # the fused Pallas flag kernel (ops/fused.py) — measured 1.4x the
        # cascade at 100k patterns (PLAN.md r3); falls through to the
        # cascade/classic chain when gated or over budget
        try:
            from . import native
            from .ops import fused as fused_ops

            res = fused_ops.count_matches_fused(
                compiled, cls, halo, short_on_host=native.available()
            )
            if res is not None:
                return res
        except ImportError:
            _jax_failed = True
        if engine == "fused":
            engine = "auto"
    if engine == "cascade" or (
        engine == "auto"
        and N >= _JAX_MIN
        and not _jax_failed
        and _device_backend()
        and not _small_table(compiled)  # bilinear scan beats the cascade
    ):
        # n-gram suffix-membership cascade: no per-char DFA gather at all.
        # Returns None when gated out (alphabet too wide, shared-suffix
        # buckets too deep, candidate budgets overflowed) — exact otherwise.
        try:
            from . import native
            from .ops import cascade as cascade_ops

            # hybrid: the l<=3 histogram runs on the host (native hist3,
            # ~2 ns/char, GIL-released) overlapped with the device flag
            # pipeline — the device-side scatter is the engine's single
            # most expensive op (~7 ns/char, see PLAN.md)
            res = cascade_ops.count_matches_cascade(
                compiled, cls, halo, short_on_host=native.available()
            )
            if res is not None:
                return res
        except ImportError:
            _jax_failed = True
        if engine == "cascade":
            engine = "auto"  # gated out: pick the classic path below
    if engine == "hotcold" or (
        engine == "auto"
        and N >= _JAX_MIN
        and not _jax_failed
        and _device_backend()
        and "hotcold" in compiled._cache  # auto never pays the table build
        and compiled._cache["hotcold"] is not None
    ):
        # hot/cold projection-automaton counts (ops/hotcold.py): stride-s
        # device scan + proj-state histogram + sparse deep patch.  Forcing
        # the engine builds the table; auto only uses a prebuilt one.
        try:
            from .ops import hotcold as hotcold_ops

            res = hotcold_ops.hotcold_count_matches(compiled, cls, halo)
            if res is not None:
                return res
        except ImportError:
            _jax_failed = True
        if engine == "hotcold":
            engine = "auto"
    if engine == "auto":
        engine = "jax" if (N >= _JAX_MIN and not _jax_failed) else "numpy"
    if engine == "jax":
        from . import native

        if native.available():
            try:
                # sparse-flags pipeline: device cost = scan-only
                _, pids = emit(compiled, cls, halo)
                counts = np.bincount(
                    pids, minlength=compiled.num_patterns
                ).astype(np.int64)
                return counts
            except ImportError:
                _jax_failed = True
        try:
            from .ops import scan as jax_scan

            return jax_scan.count_matches_jax(compiled, cls, halo)
        except ImportError:
            _jax_failed = True
    states = scan_states(compiled, cls, halo)
    return cpu.count_matches(compiled, states)
