"""Headline benchmark: haystack scan throughput at 100k patterns.

Prints ONE JSON line:
  {"metric": "scan_GBps_100k_patterns", "value": N, "unit": "GB/s",
   "vs_baseline": N}

vs_baseline compares against the reference pyahocorasick's committed number:
1,000,000-char iter() scan in 0.279 s on a Xeon E3-1505M
(reference etc/benchmarks/results/python3-xeon-u.txt:8) = 3.584 MB/s.

Runs on whatever the default JAX backend is (the TPU under the driver).
Env knobs: BENCH_PATTERNS, BENCH_CHARS, BENCH_REPS, BENCH_BLOCK.
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
# deadline and fall back to the host C++ engine so a number is always recorded
DEVICE_DEADLINE_S = int(os.environ.get("BENCH_DEVICE_DEADLINE", 900))


class _DeviceTimeout(Exception):
    pass


def _alarm(signum, frame):
    raise _DeviceTimeout()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n_patterns = int(os.environ.get("BENCH_PATTERNS", 100_000))
    n_chars = int(os.environ.get("BENCH_CHARS", 1 << 27))  # 134M chars
    reps = int(os.environ.get("BENCH_REPS", 5))
    # counts | scan | dna | cascade | cascade_hybrid
    mode = os.environ.get("BENCH_MODE", "cascade_hybrid")

    # persistent compilation cache: a user's first query on a big automaton
    # pays the ~40-90 s remote compile only once per (automaton shape, mode)
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass

    import pyahocorasick_tpu as ahocorasick

    rng = np.random.default_rng(42)
    if mode == "small":
        # the small-dictionary production case: dozens of keywords ->
        # bilinear-MXU state lookups (S*K fits one table), no HBM gather
        n_patterns = int(os.environ.get("BENCH_PATTERNS", 30))
        letters = np.frombuffer(b"abcdefghijklmnop", dtype=np.uint8)
        lengths = rng.integers(4, 13, n_patterns)
    elif mode == "dna":
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
    log(f"build trie: {time.time()-t0:.2f}s ({seen} unique words)")

    t0 = time.time()
    A.make_automaton()
    compiled = A._compiled
    log(
        f"make_automaton: {time.time()-t0:.2f}s "
        f"(S={compiled.num_states}, K={compiled.num_classes})"
    )

    hay = letters[rng.integers(0, letters.size, n_chars)]
    cls = compiled.classes_of(hay.astype(np.uint32)).astype(np.int32)

    def host_fallback(reason):
        """Device unreachable: record the host C++ engine number instead."""
        log(f"DEVICE PATH FAILED ({reason}); falling back to host engine")
        from pyahocorasick_tpu import native

        times = []
        for _ in range(max(reps, 1)):
            t0 = time.time()
            states = native.scan_states_blocked(compiled, cls)
            np.bincount(
                compiled.match_count[states], minlength=2
            )  # touch results
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
        sys.exit(0)

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(DEVICE_DEADLINE_S)
    try:
        import jax
        import jax.numpy as jnp

        log(
            f"backend: {jax.default_backend()}, devices: {jax.devices()}, mode={mode}"
        )
        jnp.ones((4,)).sum().block_until_ready()  # cheap liveness check
        np.asarray(jnp.ones((4,)).sum())
    except (_DeviceTimeout, Exception) as e:  # noqa: BLE001
        signal.alarm(0)
        host_fallback(repr(e) if not isinstance(e, _DeviceTimeout) else "timeout")

    try:
        _run_device_modes(
            mode, compiled, cls, n_chars, reps, host_fallback, jnp
        )
    except _DeviceTimeout:
        signal.alarm(0)
        host_fallback("timeout mid-run")
    finally:
        signal.alarm(0)


def _run_device_modes(mode, compiled, cls, n_chars, reps, host_fallback, jnp):
    import time

    from pyahocorasick_tpu.ops import scan as jax_scan

    if mode == "small":
        assert jax_scan.small_table_ok(compiled), "automaton too big for small mode"
        cls_tl, B = jax_scan.prepare_scan_input(compiled, cls, block=1024)
        dev = jnp.asarray(cls_tl)
        H = max(int(compiled.longest_word), 1)
        tab = jax_scan._bilinear_signed_table(compiled)

        def run_small():
            s = jax_scan._blocked_scan_signed_bilinear_jit(
                tab, dev, compiled.num_classes, H, B
            )
            # packed flags: the full match-position product, fetched sparsely
            return np.asarray(jax_scan._pack_flags_jit(s)[:8, :8])

        t0 = time.time()
        run_small()
        cold_s = time.time() - t0
        log(f"compile+first run: {cold_s:.2f}s")
        times = []
        for _ in range(reps):
            t0 = time.time()
            run_small()
            times.append(time.time() - t0)
        best = min(times)
        gbps = n_chars / best / 1e9
        log(f"small bilinear scan: {best*1e3:.1f} ms -> {gbps:.3f} GB/s")
        print(
            json.dumps(
                {
                    "metric": "small_dict_scan_GBps_30_patterns",
                    "value": round(gbps, 4),
                    "unit": "GB/s",
                    "vs_baseline": round(n_chars / best / REF_BYTES_PER_SEC, 2),
                    "cold_start_s": round(cold_s, 2),
                }
            )
        )
        return

    if mode in ("cascade", "cascade_hybrid"):
        from pyahocorasick_tpu.ops import cascade

        tabs = cascade.build_tables(compiled)
        if tabs is None:
            log("cascade gated out; falling back to counts mode")
            mode = "counts"
        else:
            tabs.device_arrays()  # upload tables pre-timing
            staged = jnp.asarray(cls.astype(np.int8))
            hybrid = mode == "cascade_hybrid"

            def run_cascade():
                return cascade.count_matches_cascade(
                    compiled, cls, staged=staged, short_on_host=hybrid
                )

            t0 = time.time()
            counts0 = run_cascade()
            cold_s = time.time() - t0
            log(
                f"compile+first run: {cold_s:.2f}s, "
                f"total matches {int(counts0.sum()) if counts0 is not None else 'GATED'}"
            )
            if counts0 is None:
                host_fallback("cascade budget overflow")
            times = []
            for _ in range(reps):
                t0 = time.time()
                run_cascade()
                times.append(time.time() - t0)
            best = min(times)
            gbps = n_chars / best / 1e9
            log(f"cascade counts: {best*1e3:.1f} ms -> {gbps:.3f} GB/s")
            print(
                json.dumps(
                    {
                        "metric": "scan_GBps_100k_patterns",
                        "value": round(gbps, 4),
                        "unit": "GB/s",
                        "vs_baseline": round(
                            n_chars / best / REF_BYTES_PER_SEC, 2
                        ),
                        "cold_start_s": round(cold_s, 2),
                    }
                )
            )
            return

    if mode == "emit":
        # full (end_index, pattern_id) emission — the reference's iter()/
        # find_all() semantics (src/AutomatonSearchIter.c:157-300) through
        # the cascade pipeline.  Note: results are materialized on host, so
        # through the remote relay (~10 MB/s fetch) match-dense corpora are
        # transfer-bound; the metric is still end-to-end honest.
        from pyahocorasick_tpu.ops import cascade_emit

        staged = jnp.asarray(cls.astype(np.int8))

        def run_emit():
            return cascade_emit.emit_matches_cascade(
                compiled, cls, staged=staged
            )

        t0 = time.time()
        r0 = run_emit()
        cold_s = time.time() - t0
        if r0 is None:
            host_fallback("cascade emit gated/overflowed")
        log(
            f"compile+first run: {cold_s:.2f}s, matches emitted {r0[0].size}"
        )
        times = []
        for _ in range(reps):
            t0 = time.time()
            run_emit()
            times.append(time.time() - t0)
        best = min(times)
        gbps = n_chars / best / 1e9
        log(f"cascade emit: {best*1e3:.1f} ms -> {gbps:.3f} GB/s")
        print(
            json.dumps(
                {
                    "metric": "emit_GBps_100k_patterns",
                    "value": round(gbps, 4),
                    "unit": "GB/s",
                    "vs_baseline": round(n_chars / best / REF_BYTES_PER_SEC, 2),
                    "cold_start_s": round(cold_s, 2),
                    "matches": int(r0[0].size),
                }
            )
        )
        return

    if mode == "dna":
        from pyahocorasick_tpu.ops import stride

        s2 = stride.build_stride2(compiled)
        log(f"stride2 table: {'ok' if s2 else 'infeasible'}")
        cls2_tl, H2 = stride.prepare_stride2_input(compiled, cls)
        staged = (jnp.asarray(cls2_tl), H2)
        log(f"staged pair classes: {cls2_tl.shape} {cls2_tl.dtype}")

        def run_dna():
            return stride.count_total_stride2(compiled, cls, device_input=staged)

        t0 = time.time()
        total = run_dna()
        log(f"compile+first run: {time.time()-t0:.2f}s, total matches {total}")
        times = []
        for _ in range(reps):
            t0 = time.time()
            run_dna()
            times.append(time.time() - t0)
        best = min(times)
        gbps = n_chars / best / 1e9
        log(f"dna stride2: {best*1e3:.1f} ms -> {gbps:.3f} GB/s")
        print(
            json.dumps(
                {
                    "metric": "dna_counts_GBps_100k_guides",
                    "value": round(gbps, 4),
                    "unit": "GB/s",
                    "vs_baseline": round(n_chars / best / REF_BYTES_PER_SEC, 2),
                }
            )
        )
        return

    H = max(int(compiled.longest_word), 1)
    B = int(os.environ.get("BENCH_BLOCK", 0)) or jax_scan.choose_block(n_chars, H)
    B = max(B, H)
    L = -(-n_chars // B)
    Lp = 1 << (L - 1).bit_length()
    ext = np.zeros(H + Lp * B, dtype=np.int32)
    ext[H : H + n_chars] = cls
    win = np.lib.stride_tricks.sliding_window_view(ext, H + B)[::B][:Lp]
    cls_tl = jnp.asarray(np.ascontiguousarray(win.T))
    tabs = jax_scan._device_tables(compiled)

    if mode == "sparse":
        from pyahocorasick_tpu import native as native_mod
        from pyahocorasick_tpu.ops import cpu as cpu_ops

        cls_tl2, B2 = jax_scan.prepare_scan_input(compiled, cls)
        staged = (jnp.asarray(cls_tl2), B2)

        def run_sparse():
            positions = jax_scan.matched_positions_jax(
                compiled, cls, staged=staged
            )
            states_at = native_mod.resolve_states(compiled, cls, positions)
            _, pids = cpu_ops.expand_matches(compiled, positions, states_at)
            return np.bincount(pids, minlength=compiled.num_patterns)

        t0 = time.time()
        counts0 = run_sparse()
        log(
            f"compile+first run: {time.time()-t0:.2f}s, "
            f"total matches {int(counts0.sum())}"
        )
        times = []
        for _ in range(reps):
            t0 = time.time()
            run_sparse()
            times.append(time.time() - t0)
        best = min(times)
        gbps = n_chars / best / 1e9
        log(f"sparse counts: {best*1e3:.1f} ms -> {gbps:.3f} GB/s")
        print(
            json.dumps(
                {
                    "metric": "scan_GBps_100k_patterns",
                    "value": round(gbps, 4),
                    "unit": "GB/s",
                    "vs_baseline": round(n_chars / best / REF_BYTES_PER_SEC, 2),
                }
            )
        )
        return

    def run_counts():
        if mode == "scan":
            out = jax_scan._blocked_scan_final_jit(
                tabs["delta_flat"], cls_tl, compiled.num_classes, H, B
            )
        else:
            out = jax_scan._blocked_count_jit(
                tabs["delta_flat"],
                tabs["match_count"],
                tabs["out_ids"],
                tabs["row_of"],
                cls_tl,
                jnp.int32(n_chars),
                compiled.num_classes,
                H,
                B,
                compiled.num_states,
                compiled.num_patterns,
            )
        # fetch to host: through remote-relay backends block_until_ready()
        # can return before execution finishes; a device_get cannot
        return np.asarray(out)

    t0 = time.time()
    counts = run_counts()
    log(f"compile+first run: {time.time()-t0:.2f}s, total matches {int(counts.sum())}")

    times = []
    for _ in range(reps):
        t0 = time.time()
        run_counts()
        times.append(time.time() - t0)
    best = min(times)
    bytes_per_sec = n_chars / best
    gbps = bytes_per_sec / 1e9
    log(f"scan: {best*1e3:.1f} ms for {n_chars/1e6:.0f} Mchars -> {gbps:.3f} GB/s")
    log(f"block={B}, lanes={Lp}, halo={H}")

    print(
        json.dumps(
            {
                "metric": "scan_GBps_100k_patterns",
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(bytes_per_sec / REF_BYTES_PER_SEC, 2),
            }
        )
    )


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
    reps = int(os.environ.get("BENCH_REPS", 5))

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
