"""Multi-host (pod-slice) execution support.

The reference has no distributed runtime (SURVEY.md §2.3); this subsystem
provides the TPU-native equivalent: one process per host, connected with
``jax.distributed``, running the same SPMD sharded-search program over a
global (pattern x data) mesh whose data axis spans hosts — collectives ride
ICI within a slice and DCN across slices.

Single-host multi-chip needs none of this (ShardedAutomaton works directly);
multi-host adds only: (1) initialize() at process start, (2) building the
haystack shards per process with ``global_haystack_array``.

Typical use (same script on every host):

    from pyahocorasick_tpu.parallel import multihost, make_mesh, ShardedAutomaton

    multihost.initialize()                  # reads env set by the launcher
    mesh = make_mesh(n_pattern=1)           # all global devices
    sharded = ShardedAutomaton([A._compiled], mesh)
    counts = sharded.count_matches(letters) # identical on every host
"""

from __future__ import annotations

import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Connect this process to the jax.distributed cluster.

    With no arguments, relies on the TPU launcher environment (the common
    case on Cloud TPU pods).  Safe to call once per process, before any
    other jax API."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def process_shard(letters_u32: np.ndarray, halo: int):
    """Split a (host-resident) haystack into this process's slice plus its
    exact halo prefix.  Every process must pass the same letters array (e.g.
    read from shared storage); returns (local_letters, local_offset).

    For corpora too large for any single host, read only the
    [offset - halo, offset + local_n) byte range from storage instead."""
    import jax

    nproc = jax.process_count()
    pid = jax.process_index()
    n = int(letters_u32.size)
    per = -(-n // nproc)
    lo = pid * per
    hi = min(lo + per, n)
    start = max(lo - halo, 0)
    return letters_u32[start:hi], lo
