"""Multi-device scaling-efficiency harness.

Measures sharded count/emission wall-clock at 1/2/4/.../N devices over a
(pattern x data) mesh and prints per-point throughput plus parallel
efficiency vs the 1-device run — the harness that produces the BASELINE.md
">=90% at 2 hosts" figure the moment real multi-chip hardware is attached.

On a single-chip or CPU-only machine, run with a virtual device mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/scaling.py

Virtual CPU devices share host cores, so those numbers are a CORRECTNESS
RIG for the harness itself (they routinely show <100% efficiency from core
oversubscription); only real-chip runs are performance claims.  Results are
printed as one JSON line per mesh size:

    {"devices": N, "mode": "counts", "seconds": s, "GBps": g,
     "efficiency_vs_1dev": e}

Env knobs: SCALE_PATTERNS (default 2000), SCALE_CHARS (default 2^22),
SCALE_REPS (default 3), SCALE_MODES (counts,emit).
"""

import json
import os
import string
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n_patterns = int(os.environ.get("SCALE_PATTERNS", 2000))
    n_chars = int(os.environ.get("SCALE_CHARS", 1 << 22))
    reps = int(os.environ.get("SCALE_REPS", 3))
    modes = os.environ.get("SCALE_MODES", "counts,emit").split(",")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the session env may pin a TPU platform plugin before main() runs;
        # force the requested backend via live config (same workaround as
        # tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")

    import pyahocorasick_tpu as ahocorasick
    from pyahocorasick_tpu.parallel import ShardedAutomaton, make_mesh
    from pyahocorasick_tpu.utils import letters_of_haystack

    devices = jax.devices()
    log(f"backend={jax.default_backend()} devices={len(devices)}")

    rng = np.random.default_rng(42)
    letters = np.frombuffer(string.ascii_letters.encode(), np.uint8)
    A = ahocorasick.Automaton()
    for n in rng.integers(3, 17, n_patterns):
        A.add_word(bytes(letters[rng.integers(0, letters.size, n)]).decode(), 1)
    A.make_automaton()
    compiled = A._compiled
    hay = bytes(letters[rng.integers(0, letters.size, n_chars)]).decode()
    lets = letters_of_haystack(hay, ahocorasick.KEY_STRING)

    sizes = []
    d = 1
    while d <= len(devices):
        sizes.append(d)
        d *= 2

    base = {}
    for mode in modes:
        for nd in sizes:
            mesh = make_mesh(n_pattern=1, n_data=nd, devices=devices[:nd])
            sa = ShardedAutomaton([compiled], mesh)

            def run():
                if mode == "counts":
                    return sa.count_matches(lets)
                return sa.search(lets)

            run()  # compile + warm
            times = []
            for _ in range(reps):
                t0 = time.time()
                run()
                times.append(time.time() - t0)
            best = min(times)
            gbps = n_chars / best / 1e9
            key = mode
            if nd == 1:
                base[key] = best
            eff = base[key] / (best * nd) if key in base else float("nan")
            log(
                f"{mode}: {nd} device(s) {best*1e3:8.1f} ms "
                f"{gbps:6.3f} GB/s  eff={eff:5.1%}"
            )
            print(
                json.dumps(
                    {
                        "devices": nd,
                        "mode": mode,
                        "seconds": round(best, 5),
                        "GBps": round(gbps, 4),
                        "efficiency_vs_1dev": round(eff, 4),
                        "backend": jax.default_backend(),
                        "virtual_mesh": jax.default_backend() == "cpu",
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
