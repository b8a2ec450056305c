"""Headline benchmark matrix for the TPU engines.

Default (BENCH_MODE=matrix) measures every headline metric and prints ONE
JSON line whose primary value is the best exact per-pattern-counts
throughput at 100k patterns:

  {"metric": "scan_GBps_100k_patterns", "value": N, "unit": "GB/s",
   "vs_baseline": N, "cold_start_s": N, "engine": "...",
   "small_GBps": N, "dna_GBps": N, "scan_raw_GBps": N, ...}

vs_baseline compares against the reference pyahocorasick's committed number:
1,000,000-char iter() scan in 0.279 s on a Xeon E3-1505M
(reference etc/benchmarks/results/python3-xeon-u.txt:8) = 3.584 MB/s.

Individual modes remain selectable: BENCH_MODE in {cascade, cascade_hybrid,
fused, small, dna, scan, scan_raw, scan_mid, counts, sparse, emit}.
Env knobs: BENCH_PATTERNS, BENCH_CHARS, BENCH_REPS, BENCH_BLOCK,
BENCH_DEVICE_DEADLINE, BENCH_MATRIX_BUDGET.
"""

import json
import os
import signal
import string
import sys
import time

import numpy as np

REF_BYTES_PER_SEC = 1_000_000 / 0.279

# the TPU tunnel can wedge indefinitely (see PLAN.md); give the device path a
# deadline and fall back to the host C++ engine so a number is always recorded.
# 1100 s: the matrix itself takes ~600 s warm, and the first device op after
# another process releases the TPU can stall up to ~5 min (tunnel handshake)
DEVICE_DEADLINE_S = int(os.environ.get("BENCH_DEVICE_DEADLINE", 1100))


class _DeviceTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise _DeviceTimeout()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _enable_cache():
    try:
        import jax

        from pyahocorasick_tpu.utils.compile_cache import ensure_compile_cache

        ensure_compile_cache()
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


def _build(kind, n_patterns, rng):
    import pyahocorasick_tpu as ahocorasick

    if kind == "small":
        letters = np.frombuffer(b"abcdefghijklmnop", dtype=np.uint8)
        lengths = rng.integers(4, 13, n_patterns)
    elif kind == "dna":
        letters = np.frombuffer(b"acgt", dtype=np.uint8)
        lengths = np.full(n_patterns, 20)  # CRISPR-guide 20-mers
    else:
        letters = np.frombuffer(string.ascii_letters.encode(), dtype=np.uint8)
        lengths = rng.integers(3, 33, n_patterns)

    t0 = time.time()
    A = ahocorasick.Automaton()
    seen = 0
    for n in lengths:
        w = bytes(letters[rng.integers(0, letters.size, n)]).decode()
        if A.add_word(w, seen):
            seen += 1
    build_s = time.time() - t0
    t0 = time.time()
    A.make_automaton()
    compiled = A._compiled
    log(
        f"[{kind}] trie {build_s:.2f}s ({seen} words), make_automaton "
        f"{time.time()-t0:.2f}s (S={compiled.num_states}, K={compiled.num_classes})"
    )
    return A, compiled, letters


def _haystack(compiled, letters, n_chars, rng):
    hay = letters[rng.integers(0, letters.size, n_chars)]
    return compiled.classes_of(hay.astype(np.uint32)).astype(np.int32)


def _stage(arr):
    """Device-put with a forced completion: jnp.asarray is async, so an
    unforced staging transfer (536 MB of int32 at ~45 MB/s relay = 12 s,
    measured) lands inside the first timed call and masquerades as compile
    time.  (block_until_ready does not block through the relay — fetch.)"""
    import jax.numpy as jnp

    d = jnp.asarray(arr)
    np.asarray(d.ravel()[:1])
    return d


def _time_best(fn, reps):
    t0 = time.time()
    first = fn()
    cold = time.time() - t0
    times = []
    for _ in range(max(reps, 1)):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return first, cold, min(times)


# --------------------------------------------------------------- sub-benches


def bench_counts(compiled, cls, n_chars, reps, engine, best_ns=None,
                 left_s=None):
    """Exact per-pattern counts via the cascade, fused, or hotcold engine;
    returns (GB/s, cold_s) or None when gated."""
    import jax.numpy as jnp

    if engine == "hotcold":
        from pyahocorasick_tpu.ops import hotcold

        pf = hotcold.plan_hotcold(compiled, full=True)
        if pf is None:
            log("[hotcold-counts] no feasible plan")
            return None
        cost_ns, d, s, tbytes = pf
        # skip when a measured engine already beats the MODEL, or when the
        # table build alone would eat the remaining matrix budget (round-3
        # burned 544 s building a table for a losing 0.079 GB/s; VERDICT)
        if best_ns is not None and cost_ns >= best_ns:
            log(
                f"[hotcold-counts] skipped: modeled {cost_ns:.1f} ns/char "
                f">= measured best {best_ns:.1f}"
            )
            return None
        est_build = tbytes / 60e6  # measured table-build ~60-100 MB/s
        if left_s is not None and est_build > left_s * 0.4:
            log(
                f"[hotcold-counts] skipped: est. build {est_build:.0f}s "
                f"vs {left_s:.0f}s budget left"
            )
            return None
        ht = hotcold.build_hotcold(compiled)
        if ht is None:
            return None
        codes_tl, warm, B = hotcold.prepare_hotcold_input(compiled, ht, cls)
        hc_staged = (_stage(codes_tl), warm, B)

        def run():
            return hotcold.hotcold_count_matches(
                compiled, cls, staged=hc_staged
            )

        first, cold, best = _time_best(run, reps)
        if first is None:
            return None
        log(
            f"[hotcold-counts] cold {cold:.2f}s, best {best*1e3:.1f} ms -> "
            f"{n_chars/best/1e9:.3f} GB/s, total {int(first.sum())}"
        )
        return n_chars / best / 1e9, cold

    staged = _stage(np.ascontiguousarray(cls.astype(np.int8)))
    if engine == "fused":
        from pyahocorasick_tpu.ops import fused

        ftb = fused.build_fused_tables(compiled)
        tile = getattr(ftb, "tile", fused._TILE) if ftb else fused._TILE
        Npad = fused._bucket_tiles(-(-n_chars // tile)) * tile
        pad = np.zeros(Npad, np.int8)
        pad[:n_chars] = cls
        staged = _stage(pad)

        def run():
            return fused.count_matches_fused(
                compiled, cls, staged=staged, short_on_host=True
            )

    else:
        from pyahocorasick_tpu.ops import cascade

        tabs = cascade.build_tables(compiled)
        if tabs is None:
            return None
        tabs.device_arrays()

        def run():
            return cascade.count_matches_cascade(
                compiled, cls, staged=staged, short_on_host=True
            )

    first, cold, best = _time_best(run, reps)
    if first is None:
        return None
    log(
        f"[{engine}] cold {cold:.2f}s, best {best*1e3:.1f} ms -> "
        f"{n_chars/best/1e9:.3f} GB/s, total matches {int(first.sum())}"
    )
    return n_chars / best / 1e9, cold


def bench_small(n_chars, reps, rng):
    """30-keyword dictionary: bilinear-MXU DFA scan with packed flags."""
    from pyahocorasick_tpu.ops import scan as jax_scan

    import jax.numpy as jnp

    _, compiled, letters = _build("small", 30, rng)
    cls = _haystack(compiled, letters, n_chars, rng)
    assert jax_scan.small_table_ok(compiled)
    cls_tl, B = jax_scan.prepare_scan_input(compiled, cls, block=1024)
    dev = _stage(cls_tl)
    H = max(int(compiled.longest_word), 1)
    tab = jax_scan._bilinear_signed_table(compiled)

    def run():
        s = jax_scan._blocked_scan_signed_bilinear_jit(
            tab, dev, compiled.num_classes, H, B
        )
        return np.asarray(jax_scan._pack_flags_jit(s)[:8, :8])

    _, cold, best = _time_best(run, reps)
    gbps = n_chars / best / 1e9
    log(f"[small] cold {cold:.2f}s, best {best*1e3:.1f} ms -> {gbps:.3f} GB/s")
    return gbps, cold


def bench_dna(n_patterns, n_chars, reps, rng):
    """100k 20-mer guides over ACGT: fixed-length fingerprint kernel
    (ops/fixedlen.py), falling back to the hot/cold stride-4 scan and then
    the stride-2 packed counts."""
    from pyahocorasick_tpu.ops import fixedlen, stride

    import jax.numpy as jnp

    A, compiled, letters = _build("dna", n_patterns, rng)
    th = A.prewarm(n_chars)  # overlap program load with haystack prep
    cls = _haystack(compiled, letters, n_chars, rng)

    ftab = fixedlen.build_fixedlen_tables(compiled)
    if ftab is None:
        log("[dna] fixedlen tables gated at build")
    if ftab is not None:
        tile = getattr(ftab, "tile", fixedlen._TILE)
        Npad = fixedlen._f._bucket_tiles(-(-n_chars // tile)) * tile
        pad = np.zeros(Npad, np.int8)
        pad[:n_chars] = cls
        staged = _stage(pad)
        th.join(120)

        def run():
            return fixedlen.count_matches_fixedlen(
                compiled, cls, staged=staged
            )

        first, cold, best = _time_best(run, reps)
        if first is not None:
            gbps = n_chars / best / 1e9
            log(
                f"[dna] fixedlen cold {cold:.2f}s, best {best*1e3:.1f} ms "
                f"-> {gbps:.3f} GB/s, total {int(first.sum())}"
            )
            return gbps, cold
        log("[dna] fixedlen gated at runtime; falling back")

    r = bench_hotcold(compiled, cls, n_chars, reps, label="dna")
    if r is not None:
        return r[0], r[1]

    s2 = stride.build_stride2(compiled)
    log(f"[dna] stride2 table: {'ok' if s2 else 'infeasible'}")
    cls2_tl, H2 = stride.prepare_stride2_input(compiled, cls)
    staged = (_stage(cls2_tl), H2)

    def run():
        return stride.count_total_stride2(compiled, cls, device_input=staged)

    first, cold, best = _time_best(run, reps)
    gbps = n_chars / best / 1e9
    log(
        f"[dna] cold {cold:.2f}s, best {best*1e3:.1f} ms -> {gbps:.3f} GB/s, "
        f"total {first}"
    )
    return gbps, cold


def bench_small_emit(n_chars, reps, rng):
    """Full (end, id) emission on the 30-keyword dictionary — the
    reference's flagship semantic at the dominant production size
    (VERDICT r4 item 3: small-dictionary emission must ride the device
    candidate path, not a packed-flag relay fetch)."""
    from pyahocorasick_tpu import engines
    from pyahocorasick_tpu.ops import cascade_emit, fused

    A, compiled, letters = _build("small", 30, rng)
    th = A.prewarm(n_chars, mode="emit")
    cls = _haystack(compiled, letters, n_chars, rng)
    ftb = fused.build_fused_tables(compiled)
    tile = getattr(ftb, "tile", fused._TILE) if ftb else fused._TILE
    Npad = fused._bucket_tiles(-(-n_chars // tile)) * tile
    pad = np.zeros(Npad, np.int8)
    pad[:n_chars] = cls
    staged = _stage(pad)
    th.join(120)

    def run():
        r = cascade_emit.emit_matches_cascade(compiled, cls, staged=staged)
        if r is None:  # gated: route like the public API would
            r = engines.emit(compiled, cls)
        return r

    first, cold, best = _time_best(run, reps)
    gbps = n_chars / best / 1e9
    log(
        f"[small_emit] cold {cold:.2f}s, best {best*1e3:.1f} ms -> "
        f"{gbps:.3f} GB/s ({first[0].size} matches)"
    )
    return gbps, cold


def bench_mixed(n_patterns, n_chars, reps, rng):
    """Mixed k-mer panel: half 20-mers, half 23-mers over ACGT (CRISPR
    guides + PAM-extended) — two fixedlen fingerprint families sharing
    blooms (VERDICT r4 item 4: tracked in the driver, not just PLAN)."""
    import pyahocorasick_tpu as ahocorasick
    from pyahocorasick_tpu.ops import fixedlen

    letters = np.frombuffer(b"acgt", dtype=np.uint8)
    t0 = time.time()
    A = ahocorasick.Automaton()
    seen = 0
    for i in range(n_patterns):
        n = 20 if i % 2 == 0 else 23
        w = bytes(letters[rng.integers(0, letters.size, n)]).decode()
        if A.add_word(w, seen):
            seen += 1
    A.make_automaton()
    compiled = A._compiled
    log(
        f"[mixed] trie+automaton {time.time()-t0:.2f}s ({seen} words, "
        f"S={compiled.num_states})"
    )
    th = A.prewarm(n_chars)  # overlap program load with haystack prep
    cls = _haystack(compiled, letters, n_chars, rng)
    ftab = fixedlen.build_fixedlen_tables(compiled)
    if ftab is None:
        log("[mixed] fixedlen tables gated at build")
        return None
    tile = getattr(ftab, "tile", fixedlen._TILE)
    Npad = fixedlen._f._bucket_tiles(-(-n_chars // tile)) * tile
    pad = np.zeros(Npad, np.int8)
    pad[:n_chars] = cls
    staged = _stage(pad)
    th.join(120)

    def run():
        return fixedlen.count_matches_fixedlen(compiled, cls, staged=staged)

    first, cold, best = _time_best(run, reps)
    if first is None:
        log("[mixed] fixedlen gated at runtime")
        return None
    gbps = n_chars / best / 1e9
    log(
        f"[mixed] cold {cold:.2f}s, best {best*1e3:.1f} ms -> "
        f"{gbps:.3f} GB/s, total {int(first.sum())}"
    )
    return gbps, cold


def bench_scan_raw(compiled, cls, n_chars, reps):
    """Raw stride-1 DFA transition throughput (final states only)."""
    import threading

    from pyahocorasick_tpu.ops import scan as jax_scan

    import jax.numpy as jnp

    H = max(int(compiled.longest_word), 1)
    B = jax_scan.choose_block(n_chars, H)
    # overlap the dense-delta staging (~320 MB at 45 MB/s relay) and the
    # program load with the host-side input windowing: warm on an
    # all-zeros DEVICE array of the same shape (no host transfer)
    L = -(-n_chars // B)
    Lp = max(jax_scan._round_up_pow2(L), 32)
    box = {}

    def _warm():
        try:
            tabs = jax_scan._device_tables(compiled)
            z = jnp.zeros((H + B, Lp), jnp.int8)
            np.asarray(
                jax_scan._blocked_scan_final_jit(
                    tabs["delta_flat"], z, compiled.num_classes, H, B
                )[:1]
            )
            box["tabs"] = tabs
        except Exception as e:  # noqa: BLE001
            box["err"] = e

    th = threading.Thread(target=_warm, daemon=True)
    th.start()
    cls_tl, B = jax_scan.prepare_scan_input(compiled, cls, block=B)
    dev = _stage(cls_tl)
    th.join(180)
    tabs = box.get("tabs") or jax_scan._device_tables(compiled)

    def run():
        return np.asarray(
            jax_scan._blocked_scan_final_jit(
                tabs["delta_flat"], dev, compiled.num_classes, H, B
            )
        )

    _, cold, best = _time_best(run, reps)
    gbps = n_chars / best / 1e9
    log(f"[scan] cold {cold:.2f}s, best {best*1e3:.1f} ms -> {gbps:.3f} GB/s")
    return gbps, cold


def bench_hotcold(compiled, cls, n_chars, reps, label="hotcold",
                  left_s=None):
    """Exact scan via the hot/cold projection-automaton engine: short-match
    positions counted on device, deep matches patched on host (overlapped
    inside hotcold_scan).  Returns (GB/s, cold_s, build_s) or None."""
    import jax.numpy as jnp

    from pyahocorasick_tpu.ops import hotcold

    if left_s is not None:
        pf = hotcold.plan_hotcold(compiled, full=True)
        if pf is None:
            log(f"[{label}] no feasible plan")
            return None
        if pf[3] / 60e6 > left_s * 0.4:  # table build ~60-100 MB/s
            log(
                f"[{label}] skipped: est. build {pf[3]/60e6:.0f}s vs "
                f"{left_s:.0f}s budget left"
            )
            return None
    t0 = time.time()
    ht = hotcold.build_hotcold(compiled)
    build_s = time.time() - t0
    if ht is None:
        log(f"[{label}] no feasible plan")
        return None
    log(
        f"[{label}] plan d={ht.d} s={ht.s} S_hot={ht.S_hot} "
        f"table={ht.table.nbytes/1e9:.2f}GB (built {build_s:.1f}s)"
    )
    codes_tl, warm, B = hotcold.prepare_hotcold_input(compiled, ht, cls)
    staged = (_stage(codes_tl), warm, B)

    def run():
        return hotcold.hotcold_scan(compiled, cls, staged=staged)

    first, cold, best = _time_best(run, reps)
    if first is None:
        return None
    gbps = n_chars / best / 1e9
    log(
        f"[{label}] cold {cold:.2f}s, best {best*1e3:.1f} ms -> {gbps:.3f} "
        f"GB/s, short_pos={first.short_positions_count} "
        f"deep={first.deep_pos.size}"
    )
    return gbps, cold, build_s


def bench_scan_mid(n_chars, reps, rng):
    """Mid-size dictionary (10k patterns, ~150k states): stride-2 packed
    scan — the hot/cold regime between the bilinear gate and the HBM
    gather wall (S*K^2 fits the table budget here)."""
    from pyahocorasick_tpu.ops import stride

    import jax.numpy as jnp

    _, compiled, letters = _build("text", 10_000, rng)
    cls = _haystack(compiled, letters, n_chars, rng)
    s2 = stride.build_stride2(compiled)
    if s2 is None:
        log("[scan_mid] stride2 infeasible")
        return None
    cls2_tl, H2 = stride.prepare_stride2_input(compiled, cls)
    staged = (_stage(cls2_tl), H2)

    def run():
        return stride.count_total_stride2(compiled, cls, device_input=staged)

    _, cold, best = _time_best(run, reps)
    gbps = n_chars / best / 1e9
    log(
        f"[scan_mid] cold {cold:.2f}s, best {best*1e3:.1f} ms -> "
        f"{gbps:.3f} GB/s (S={compiled.num_states})"
    )
    return gbps, cold


# ------------------------------------------------------------------- matrix


def run_matrix(n_patterns, n_chars, reps):
    budget = float(os.environ.get("BENCH_MATRIX_BUDGET", DEVICE_DEADLINE_S * 0.85))
    t_start = time.time()
    out = {}

    def left():
        return budget - (time.time() - t_start)

    rng = np.random.default_rng(42)
    A, compiled, letters = _build("text", n_patterns, rng)
    # overlap the device program loads with haystack generation — the same
    # overlap a real user gets from Automaton.prewarm during data load.
    # Three documented prewarms cover the text-config engines measured
    # below: auto counts (fused), the cascade fallback, and emission (the
    # cache-warm "cold start" is dominated by the ~2 MB/s relay load of
    # 10-35 MB compiled executables — probe_cold_split.py).
    # SEQUENTIAL warms inside one thread: concurrent prewarms race on the
    # measured-rate cache, so the set of rate-sized verify programs warmed
    # varied run to run (measured: fused cold flapping 0.5 <-> 10.5 s)
    import threading as _threading

    def _warm_all():
        A.prewarm(n_chars).join()
        A.prewarm(n_chars, mode="emit").join()
        A.prewarm(n_chars, engine="cascade").join()

    th = _threading.Thread(target=_warm_all, daemon=True)
    th.start()
    cls = _haystack(compiled, letters, n_chars, rng)
    t0 = time.time()
    # cap the blocking wait: the first device op after another process
    # releases the TPU can stall minutes (PLAN.md), and the engines warm
    # themselves on first call anyway
    th.join(min(DEVICE_DEADLINE_S / 2, 240))
    out["prewarm_wait_s"] = round(time.time() - t0, 2)
    log(f"[prewarm] blocking wait after haystack prep: {out['prewarm_wait_s']}s")

    skip = set(
        s for s in os.environ.get("BENCH_SKIP", "").split(",") if s
    )

    def _retry_if_degraded(key, run_fn, floor_gbps):
        """The shared tunnel occasionally degrades ~25x for minutes at a
        time (measured 2026-08-21: a 4096^3 matmul at 35 ms vs ~1 ms,
        recovering by itself).  If a headline entry lands implausibly
        below its floor, wait out the window once and re-measure,
        keeping the better number and flagging the record."""
        if out.get(key, floor_gbps) >= floor_gbps or left() < 120:
            return
        log(f"[{key}] {out[key]} GB/s is below the {floor_gbps} sanity "
            f"floor: transient tunnel degradation suspected; retrying "
            f"in 60 s")
        time.sleep(60)
        try:
            r = run_fn()
        except Exception as e:  # noqa: BLE001
            log(f"[{key}] retry failed: {e!r}")
            return
        if r is not None and r[0] > out.get(key, 0.0):
            out[key] = round(r[0], 4)
            out[key.replace('_GBps', '_cold_s')] = round(r[1], 2)
        out["degraded_window"] = True

    # 1. headline: exact counts at 100k patterns — fused, cascade, hotcold
    for engine in ("fused", "cascade", "hotcold"):
        if engine in skip or left() < 60:
            continue
        best_gbps = max(
            (out.get(f"{e}_GBps", 0.0) for e in ("fused", "cascade")),
            default=0.0,
        )
        best_ns = 1.0 / best_gbps if best_gbps else None
        try:
            r = bench_counts(
                compiled, cls, n_chars, reps, engine,
                best_ns=best_ns, left_s=left(),
            )
        except Exception as e:  # noqa: BLE001
            log(f"[{engine}] failed: {e!r}")
            r = None
        if r is not None:
            key = engine
            out[f"{key}_GBps"], out[f"{key}_cold_s"] = round(r[0], 4), round(
                r[1], 2
            )

    _retry_if_degraded(
        "fused_GBps",
        lambda: bench_counts(compiled, cls, n_chars, reps, "fused",
                             left_s=left()),
        0.1,
    )

    # 1b. full (end, pattern_id) emission in reference order — the
    # reference's flagship semantic (src/AutomatonSearchIter.c:157-300)
    if left() > 90 and "emit" not in skip:
        try:
            import jax.numpy as jnp

            from pyahocorasick_tpu.ops import cascade_emit

            staged = _stage(cls.astype(np.int8))

            def erun():
                return cascade_emit.emit_matches_cascade(
                    compiled, cls, staged=staged
                )

            first, cold, best = _time_best(erun, reps)
            if first is not None:
                g = n_chars / best / 1e9
                out["emit_GBps"], out["emit_cold_s"] = round(g, 4), round(
                    cold, 2
                )
                out["emit_matches"] = int(first[0].size)
                log(
                    f"[emit] cold {cold:.2f}s, best {best*1e3:.1f} ms -> "
                    f"{g:.3f} GB/s ({out['emit_matches']} matches)"
                )
            else:
                log("[emit] cascade emission gated")
        except Exception as e:  # noqa: BLE001
            log(f"[emit] failed: {e!r}")

    # 2. small dictionary (bilinear MXU scan)
    if left() > 60:
        try:
            g, c = bench_small(n_chars, reps, np.random.default_rng(43))
            out["small_GBps"], out["small_cold_s"] = round(g, 4), round(c, 2)
        except Exception as e:  # noqa: BLE001
            log(f"[small] failed: {e!r}")

    # 2b. small-dictionary emission
    if left() > 60 and "small_emit" not in skip:
        try:
            g, c = bench_small_emit(n_chars, reps, np.random.default_rng(43))
            out["small_emit_GBps"], out["small_emit_cold_s"] = (
                round(g, 4), round(c, 2),
            )
        except Exception as e:  # noqa: BLE001
            log(f"[small_emit] failed: {e!r}")

    # 3. DNA 20-mers (stride-2)
    if left() > 90:
        try:
            g, c = bench_dna(
                n_patterns, n_chars, reps, np.random.default_rng(44)
            )
            out["dna_GBps"], out["dna_cold_s"] = round(g, 4), round(c, 2)
        except Exception as e:  # noqa: BLE001
            log(f"[dna] failed: {e!r}")

    # 3b. mixed k-mer panel (two fixedlen families)
    if left() > 90 and "mixed" not in skip:
        try:
            r = bench_mixed(
                n_patterns, n_chars, reps, np.random.default_rng(46)
            )
            if r:
                out["mixed_GBps"], out["mixed_cold_s"] = (
                    round(r[0], 4), round(r[1], 2),
                )
        except Exception as e:  # noqa: BLE001
            log(f"[mixed] failed: {e!r}")

    # 4. exact-scan bracket: RETIRED from the default matrix (VERDICT r4
    # item 7).  The hot/cold projection scan spent ~55 s of driver budget
    # (10 s table build + 45 s cold) to record 0.09 GB/s — state
    # materialization is gather-bound on this part (~16 ns/lookup in-scan,
    # PLAN.md) and no engine class changes that; exact per-position
    # RESULTS (counts/emission) are what users consume and those run
    # through the fused candidate path at 2-3x the throughput.  The
    # engines remain available: BENCH_SCAN_BRACKET=1 restores the
    # entries, and `PYAHOCORASICK_TPU_ENGINE=hotcold` forces the engine.
    if os.environ.get("BENCH_SCAN_BRACKET") == "1":
        if left() > 120:
            try:
                r = bench_hotcold(compiled, cls, n_chars, reps, left_s=left())
                if r:
                    out["scan_GBps"], out["scan_cold_s"] = (
                        round(r[0], 4), round(r[1], 2),
                    )
                    out["scan_table_build_s"] = round(r[2], 1)
            except Exception as e:  # noqa: BLE001
                log(f"[hotcold] failed: {e!r}")

        # 4b. mid-size stride-2 scan (1.7 GB stride-2 table: the staging
        # alone exceeds any cold-start budget; diagnostic only)
        if left() > 90:
            try:
                r = bench_scan_mid(n_chars, reps, np.random.default_rng(45))
                if r:
                    out["scan_mid_GBps"], out["scan_mid_cold_s"] = round(
                        r[0], 4
                    ), round(r[1], 2)
            except Exception as e:  # noqa: BLE001
                log(f"[scan_mid] failed: {e!r}")

    # 5. raw stride-1 DFA scan at 100k patterns (gather-wall reference)
    if left() > 60:
        try:
            g, c = bench_scan_raw(compiled, cls, n_chars, reps)
            out["scan_raw_GBps"], out["scan_raw_cold_s"] = round(g, 4), round(
                c, 2
            )
        except Exception as e:  # noqa: BLE001
            log(f"[scan] failed: {e!r}")

    # primary metric: best exact-counts throughput at 100k patterns
    candidates = [
        (out.get("fused_GBps"), "fused"),
        (out.get("cascade_GBps"), "cascade_hybrid"),
        (out.get("hotcold_GBps"), "hotcold"),
    ]
    candidates = [c for c in candidates if c[0]]
    if not candidates:
        return None
    value, engine = max(candidates)
    cold_key = {"cascade_hybrid": "cascade"}.get(engine, engine)
    cold = out.get(f"{cold_key}_cold_s")
    rec = {
        "metric": "scan_GBps_100k_patterns",
        "value": value,
        "unit": "GB/s",
        "vs_baseline": round(value * 1e9 / REF_BYTES_PER_SEC, 2),
        "cold_start_s": cold,
        "engine": engine,
    }
    rec.update(out)
    return rec


def main():
    n_patterns = int(os.environ.get("BENCH_PATTERNS", 100_000))
    n_chars = int(os.environ.get("BENCH_CHARS", 1 << 27))  # 134M chars
    reps = int(os.environ.get("BENCH_REPS", 3))
    mode = os.environ.get("BENCH_MODE", "matrix")

    _enable_cache()
    import pyahocorasick_tpu as ahocorasick  # noqa: F401

    def host_fallback(reason):
        log(f"DEVICE PATH FAILED ({reason}); falling back to host engine")
        _host_fallback_standalone()
        sys.exit(0)

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(DEVICE_DEADLINE_S)
    try:
        import jax
        import jax.numpy as jnp

        log(
            f"backend: {jax.default_backend()}, devices: {jax.devices()}, "
            f"mode={mode}"
        )
        np.asarray(jnp.ones((4,)).sum())  # liveness (fetch through relay)
    except (_DeviceTimeout, Exception) as e:  # noqa: BLE001
        signal.alarm(0)
        host_fallback(repr(e) if not isinstance(e, _DeviceTimeout) else "timeout")

    try:
        if mode == "matrix":
            rec = run_matrix(n_patterns, n_chars, reps)
            if rec is None:
                host_fallback("all matrix modes gated/failed")
            print(json.dumps(rec))
        else:
            _run_single_mode(mode, n_patterns, n_chars, reps, host_fallback)
    except _DeviceTimeout:
        signal.alarm(0)
        host_fallback("timeout mid-run")
    finally:
        signal.alarm(0)


def _run_single_mode(mode, n_patterns, n_chars, reps, host_fallback):
    rng = np.random.default_rng(42)
    if mode == "small":
        g, c = bench_small(n_chars, reps, rng)
        print(
            json.dumps(
                {
                    "metric": "small_dict_scan_GBps_30_patterns",
                    "value": round(g, 4),
                    "unit": "GB/s",
                    "vs_baseline": round(g * 1e9 / REF_BYTES_PER_SEC, 2),
                    "cold_start_s": round(c, 2),
                }
            )
        )
        return
    if mode == "dna":
        g, c = bench_dna(n_patterns, n_chars, reps, rng)
        print(
            json.dumps(
                {
                    "metric": "dna_counts_GBps_100k_guides",
                    "value": round(g, 4),
                    "unit": "GB/s",
                    "vs_baseline": round(g * 1e9 / REF_BYTES_PER_SEC, 2),
                    "cold_start_s": round(c, 2),
                }
            )
        )
        return
    if mode == "scan_mid":
        r = bench_scan_mid(n_chars, reps, rng)
        if r is None:
            host_fallback("stride2 infeasible")
        print(
            json.dumps(
                {
                    "metric": "scan_mid_GBps_10k_patterns",
                    "value": round(r[0], 4),
                    "unit": "GB/s",
                    "vs_baseline": round(r[0] * 1e9 / REF_BYTES_PER_SEC, 2),
                    "cold_start_s": round(r[1], 2),
                }
            )
        )
        return

    _, compiled, letters = _build("text", n_patterns, rng)
    cls = _haystack(compiled, letters, n_chars, rng)
    if mode == "scan":
        # exact hot/cold scan (VERDICT r2 item 2); scan_raw stays the
        # stride-1 gather-wall reference
        r = bench_hotcold(compiled, cls, n_chars, reps)
        if r is None:
            host_fallback("no hot/cold plan")
        print(
            json.dumps(
                {
                    "metric": "scan_GBps_100k_patterns_hotcold",
                    "value": round(r[0], 4),
                    "unit": "GB/s",
                    "vs_baseline": round(r[0] * 1e9 / REF_BYTES_PER_SEC, 2),
                    "cold_start_s": round(r[1], 2),
                    "table_build_s": round(r[2], 1),
                }
            )
        )
        return
    if mode in ("cascade", "cascade_hybrid", "fused", "counts", "hotcold"):
        engine = mode if mode in ("fused", "hotcold") else "cascade"
        r = bench_counts(compiled, cls, n_chars, reps, engine)
        if r is None:
            host_fallback(f"{engine} gated")
        print(
            json.dumps(
                {
                    "metric": "scan_GBps_100k_patterns",
                    "value": round(r[0], 4),
                    "unit": "GB/s",
                    "vs_baseline": round(r[0] * 1e9 / REF_BYTES_PER_SEC, 2),
                    "cold_start_s": round(r[1], 2),
                    "engine": mode,
                }
            )
        )
        return
    if mode == "scan_raw":
        g, c = bench_scan_raw(compiled, cls, n_chars, reps)
        print(
            json.dumps(
                {
                    "metric": "scan_raw_GBps_100k_patterns",
                    "value": round(g, 4),
                    "unit": "GB/s",
                    "vs_baseline": round(g * 1e9 / REF_BYTES_PER_SEC, 2),
                    "cold_start_s": round(c, 2),
                }
            )
        )
        return
    if mode == "emit":
        import jax.numpy as jnp

        from pyahocorasick_tpu.ops import cascade_emit

        staged = jnp.asarray(cls.astype(np.int8))

        def run():
            return cascade_emit.emit_matches_cascade(compiled, cls, staged=staged)

        first, cold, best = _time_best(run, reps)
        if first is None:
            host_fallback("cascade emit gated")
        gbps = n_chars / best / 1e9
        log(f"[emit] cold {cold:.2f}s, best {best*1e3:.1f} ms -> {gbps:.3f} GB/s")
        print(
            json.dumps(
                {
                    "metric": "emit_GBps_100k_patterns",
                    "value": round(gbps, 4),
                    "unit": "GB/s",
                    "vs_baseline": round(gbps * 1e9 / REF_BYTES_PER_SEC, 2),
                    "cold_start_s": round(cold, 2),
                    "matches": int(first[0].size),
                }
            )
        )
        return
    host_fallback(f"unknown mode {mode}")


def supervised_main():
    """Run the device benchmark in a child process with a hard deadline; on
    timeout or crash, fall back to the host-engine metric in the parent.
    (An in-process SIGALRM cannot interrupt a wedged device call.)"""
    import subprocess

    if os.environ.get("BENCH_CHILD") == "1":
        main()
        return

    import tempfile

    env = dict(os.environ, BENCH_CHILD="1")
    out_path = tempfile.mktemp(prefix="bench_child_")
    ok = False
    with open(out_path, "w") as out_f:
        # file-based stdout + its own process group: a killed child's
        # grandchildren can hold capture pipes open forever otherwise
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            stdout=out_f,
            stderr=None,  # inherit
            start_new_session=True,
        )
        try:
            rc = proc.wait(timeout=DEVICE_DEADLINE_S)
            ok = rc == 0
            if not ok:
                log(f"device child failed (rc={rc}); host fallback")
        except subprocess.TimeoutExpired:
            log(f"device child exceeded {DEVICE_DEADLINE_S}s; host fallback")
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except OSError:
                pass
    if ok:
        with open(out_path) as f:
            line = next((l for l in f if l.startswith("{")), None)
        if line:
            print(line.strip())
            return
        log("device child produced no result; host fallback")

    _host_fallback_standalone()


def _host_fallback_standalone():
    """Rebuild on the host and report the blocked-scan metric."""
    n_patterns = int(os.environ.get("BENCH_PATTERNS", 100_000))
    n_chars = int(os.environ.get("BENCH_CHARS", 1 << 25))
    reps = int(os.environ.get("BENCH_REPS", 3))

    os.environ["PYAHOCORASICK_TPU_ENGINE"] = "seq"
    import pyahocorasick_tpu as ahocorasick
    from pyahocorasick_tpu import native

    rng = np.random.default_rng(42)
    letters = np.frombuffer(string.ascii_letters.encode(), dtype=np.uint8)
    lengths = rng.integers(3, 33, n_patterns)
    A = ahocorasick.Automaton()
    for n in lengths:
        A.add_word(bytes(letters[rng.integers(0, letters.size, n)]).decode(), 1)
    A.make_automaton()
    compiled = A._compiled
    hay = letters[rng.integers(0, letters.size, n_chars)]
    cls = compiled.classes_of(hay.astype(np.uint32)).astype(np.int32)

    times = []
    for _ in range(max(reps, 1)):
        t0 = time.time()
        native.scan_states_blocked(compiled, cls)
        times.append(time.time() - t0)
    best = min(times)
    gbps = n_chars / best / 1e9
    log(f"host blocked scan: {best*1e3:.1f} ms -> {gbps:.3f} GB/s")
    print(
        json.dumps(
            {
                "metric": "scan_GBps_100k_patterns_host_fallback",
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(n_chars / best / REF_BYTES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    supervised_main()
