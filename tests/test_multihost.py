"""Multi-host execution tests: 2 real OS processes connected with
jax.distributed over a local coordinator, CPU backend with 2 virtual
devices per process (4 global).  Verifies (VERDICT round-1 item 5):

* multihost.initialize() actually executes and forms a cluster
* multihost.process_shard() slices a haystack with exact halos, and the
  per-process partial counts sum to the single-process ground truth
* ShardedAutomaton.count_matches runs over a mesh whose data axis spans
  the two processes and every process gets the full, exact counts
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    import numpy as np

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()
    sys.path.insert(0, os.environ["REPO_DIR"])

    import jax as _jax_cfg

    # the session env may pin a TPU platform plugin at import time: force
    # cpu via live config (same workaround as tests/conftest.py), then
    # enable cross-process CPU collectives (gloo); device count comes from
    # --xla_force_host_platform_device_count in the parent-provided env
    _jax_cfg.config.update("jax_platforms", "cpu")
    _jax_cfg.config.update("jax_cpu_collectives_implementation", "gloo")

    import pyahocorasick_tpu as ahocorasick
    from pyahocorasick_tpu import engines
    from pyahocorasick_tpu.parallel import multihost, sharded

    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]

    multihost.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    import jax

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()

    words = ["he", "her", "hers", "she", "shell", "hehe"]
    A = ahocorasick.Automaton()
    for i, w in enumerate(words):
        A.add_word(w, i)
    A.make_automaton()
    compiled = A._compiled

    rng = np.random.default_rng(7)
    hay = "".join(rng.choice(list("hers_l"), 4003))
    letters = np.frombuffer(hay.encode("utf-32-le"), dtype=np.uint32).copy()

    # ground truth on this process alone (host engine)
    cls_full = compiled.classes_of(letters).astype(np.int32)
    want = engines.count_matches(compiled, cls_full)

    # --- process_shard: per-process partial counts sum to the full counts
    H = max(int(compiled.longest_word), 1)
    local, off = multihost.process_shard(letters, H)
    cls_local = compiled.classes_of(local).astype(np.int32)
    halo_n = min(H, off)
    if halo_n:
        part = engines.count_matches(
            compiled, cls_local[halo_n:], halo=cls_local[:halo_n]
        )
    else:
        part = engines.count_matches(compiled, cls_local)
    from jax.experimental import multihost_utils

    parts = multihost_utils.process_allgather(
        jax.numpy.asarray(part.astype(np.int64))
    )
    total = np.asarray(parts).reshape(nproc, -1).sum(axis=0)
    assert np.array_equal(total, want), (total, want)

    # --- global-mesh sharded counts spanning both processes
    mesh = sharded.make_mesh(n_pattern=1)
    sa = sharded.ShardedAutomaton([compiled], mesh)
    got = sa.count_matches(letters)
    assert np.array_equal(got, want), (got.tolist(), want.tolist())

    # --- multi-host FULL EMISSION parity with the single-process stream
    # (reference order: end ascending, longest-first at equal ends)
    pos_want, pid_want = engines.emit(compiled, cls_full)
    pos_got, pid_got = sa.search(letters)
    assert np.array_equal(pos_got, pos_want), (pos_got[:20], pos_want[:20])
    assert np.array_equal(pid_got, pid_want)

    # --- same with the dictionary split over a 2x1 (pattern x data) mesh:
    # exercises cross-shard reassembly of the global order across hosts
    pairs = [(w, i) for i, w in enumerate(words)]
    shards2 = sharded.split_patterns(pairs, 2)
    autos = []
    for shard in shards2:
        B = ahocorasick.Automaton()
        for w, v in shard:
            B.add_word(w, v)
        B.make_automaton()
        autos.append(B._compiled)
    mesh2 = sharded.make_mesh(n_pattern=2)
    sa2 = sharded.ShardedAutomaton(autos, mesh2)
    pos2, pid2 = sa2.search(letters)
    vals2 = sa2.values_of(pid2)
    vals_want = [int(compiled.values[p]) for p in pid_want]
    assert np.array_equal(pos2, pos_want), (pos2[:20], pos_want[:20])
    assert list(vals2) == vals_want

    print(json.dumps({"pid": pid, "total": int(got.sum()),
                      "emitted": int(pos_got.size)}))
    """
)


@pytest.mark.skipif(os.name != "posix", reason="posix subprocess test")
def test_two_process_cluster_counts(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, REPO_DIR=repo)
    env.pop("PYAHOCORASICK_TPU_ENGINE", None)
    # must be set before the interpreter starts: sitecustomize may import
    # jax (registering a TPU plugin) before the worker script runs
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", coord],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert outs[0]["total"] == outs[1]["total"] > 0
