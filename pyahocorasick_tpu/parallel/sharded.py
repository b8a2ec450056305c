"""Multi-chip search: SPMD sharding of haystack and pattern set over a mesh.

The reference is strictly single-process (SURVEY.md §2.3); this subsystem is
new, designed for TPU pods:

* **data axis** — the haystack is sharded into contiguous chunks, one per
  mesh column.  Each shard is prefixed with a halo of ``longest_word`` true
  predecessor characters (prepared host-side, or exchanged with ``ppermute``
  for device-resident corpora), which makes shard scans exactly independent —
  the same decomposition the single-chip blocked kernel uses, one level up.
* **pattern axis** — the dictionary is split into sub-automata; each mesh row
  owns one sub-automaton (padded to a common shape) and scans the full data
  shard with it.  This scales the *automaton* memory (the dense delta table)
  across chips, the expert/tensor-parallel analog for this workload.

Per-pattern match counts are reduced with ``psum`` over the data axis — the
collective rides ICI.  The transition tables are replicated along data and
sharded along pattern, so no per-step communication happens at all: the scan
is embarrassingly SPMD between reductions.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_pattern: int = 1, n_data: int | None = None, devices=None) -> Mesh:
    """Build a (pattern, data) mesh from the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_pattern
    use = np.array(devices[: n_pattern * n_data]).reshape(n_pattern, n_data)
    return Mesh(use, ("pattern", "data"))


def _pad_to(arr: np.ndarray, shape) -> np.ndarray:
    out = np.zeros(shape, dtype=arr.dtype)
    out[tuple(slice(0, s) for s in arr.shape)] = arr
    return out


def split_patterns(items: Sequence, k: int) -> List[List]:
    """Round-robin split of (key, value) pairs into k shards."""
    shards = [[] for _ in range(k)]
    for i, item in enumerate(items):
        shards[i % k].append(item)
    return shards


class ShardedAutomaton:
    """A pattern-sharded, data-parallel search plan over a mesh.

    Build from a list of per-shard CompiledAutomaton (use ``from_automaton``
    for the common case).  Tables are padded to a common shape and laid out
    [n_pattern, ...] so one SPMD program serves every device.
    """

    def __init__(self, compiled_shards, mesh: Mesh):
        self.mesh = mesh
        self.shards = list(compiled_shards)
        kp = mesh.shape["pattern"]
        if len(self.shards) != kp:
            raise ValueError("need exactly one compiled shard per pattern row")

        S = max(c.num_states for c in self.shards)
        K = max(c.num_classes for c in self.shards)
        E = max(int(c.out_ids.size) for c in self.shards)
        Pm = max(c.num_patterns for c in self.shards)
        self.S, self.K, self.Pmax = S, K, Pm
        self.H = max(max(int(c.longest_word) for c in self.shards), 1)

        def stack(get, shape, dtype):
            return np.stack([_pad_to(get(c).astype(dtype), shape) for c in self.shards])

        # delta rows of padding states point to root: harmless self-loops.
        # Pad 2D first: every shard must share the global row stride K.
        self.delta_flat = np.stack(
            [
                _pad_to(c.delta.astype(np.int32), (S, K)).reshape(-1)
                for c in self.shards
            ]
        )
        self.match_count = stack(lambda c: c.match_count, (S,), np.int32)
        self.out_ids = stack(lambda c: c.out_ids, (E,), np.int32)
        row_of = [
            np.repeat(np.arange(c.num_states, dtype=np.int32), c.match_count)
            for c in self.shards
        ]
        self.row_of = np.stack([_pad_to(r, (E,)) for r in row_of])
        # padded CSR entries must not contribute: point them at pattern Pm
        # (one extra slot, dropped after reduction)
        for i, c in enumerate(self.shards):
            self.out_ids[i, c.out_ids.size :] = Pm
            self.row_of[i, c.out_ids.size :] = 0

        self._count_fn = None
        self._search_fns: dict = {}
        # per-shard metadata for reassembling emission results
        self.shard_offsets = np.cumsum(
            [0] + [c.num_patterns for c in self.shards]
        )
        self.word_len_all = np.concatenate(
            [c.word_len for c in self.shards]
        ) if self.shards else np.empty(0, np.int32)

    # -- result fetching ----------------------------------------------------

    @staticmethod
    def _fetch_global(arr) -> np.ndarray:
        """Device output -> full numpy array on every process.

        Single-process outputs are fully addressable and transfer directly.
        Multi-process outputs sharded over a mesh spanning hosts are not:
        every process gathers the remote shards (DCN allgather), so all
        processes hold the identical global result — the same contract the
        multi-host count path provides."""
        if jax.process_count() > 1 and not arr.is_fully_addressable:
            from jax.experimental import multihost_utils

            arr = multihost_utils.process_allgather(arr, tiled=True)
        return np.asarray(arr)

    # -- input staging ------------------------------------------------------

    def _stage(self, arr_np: np.ndarray, spec: P):
        """Host numpy -> global device array with the given PartitionSpec.

        Single-process: a plain transfer.  Multi-process (jax.distributed):
        every process holds the same host copy and contributes only its
        addressable shards via make_array_from_callback — the only legal way
        to build a global array that spans hosts."""
        sharding = jax.sharding.NamedSharding(self.mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(arr_np, sharding)
        return jax.make_array_from_callback(
            arr_np.shape, sharding, lambda idx: np.ascontiguousarray(arr_np[idx])
        )

    # -- per-shard class mapping -----------------------------------------

    def classes_per_shard(self, letters_u32: np.ndarray) -> np.ndarray:
        """[kp, N] class ids: each pattern shard has its own alphabet."""
        return np.stack(
            [c.classes_of(letters_u32).astype(np.int32) for c in self.shards]
        )

    # -- the SPMD step ----------------------------------------------------

    def _build_count_fn(self, B: int, Lloc: int):
        mesh = self.mesh
        S, K, Pm, H = self.S, self.K, self.Pmax, self.H
        steps = H + B

        def local_scan_counts(delta_flat, row_of, out_ids, ext_cls, n_valid):
            # local shapes: delta_flat [1, S*K], row_of/out_ids [1, E],
            # ext_cls [1, 1, H + Lloc*B], n_valid [1, 1]
            df = delta_flat[0]
            ext = ext_cls[0, 0]
            # lane j scans ext[j*B : j*B + H + B]
            idx = (
                jax.lax.broadcasted_iota(jnp.int32, (steps, Lloc), 1) * B
                + jax.lax.broadcasted_iota(jnp.int32, (steps, Lloc), 0)
            )
            cls_tl = ext[idx]  # [steps, Lloc]

            def step(states, cls_t):
                nxt = df[states * K + cls_t]
                return nxt, nxt

            init = jnp.zeros((Lloc,), dtype=jnp.int32)
            _, seq = jax.lax.scan(step, init, cls_tl)
            states = seq[H:]  # [B, Lloc]
            pos = (
                jax.lax.broadcasted_iota(jnp.int32, (B, Lloc), 1) * B
                + jax.lax.broadcasted_iota(jnp.int32, (B, Lloc), 0)
            )
            states = jnp.where(pos < n_valid[0, 0], states, 0)
            hist = jnp.zeros((S,), jnp.int32).at[states.reshape(-1)].add(1)
            contrib = hist[row_of[0]]
            counts = (
                jnp.zeros((Pm + 1,), jnp.int32).at[out_ids[0]].add(contrib)[:Pm]
            )
            counts = jax.lax.psum(counts, "data")
            return counts[None]

        from jax import shard_map

        fn = shard_map(
            local_scan_counts,
            mesh=mesh,
            in_specs=(
                P("pattern"),
                P("pattern"),
                P("pattern"),
                P("pattern", "data"),
                P("pattern", "data"),
            ),
            out_specs=P("pattern"),
            check_vma=False,
        )
        return jax.jit(fn)

    def _build_search_fn(self, B: int, Lloc: int, CAP: int):
        mesh = self.mesh
        S, K, H = self.S, self.K, self.H
        steps = H + B

        def local_scan_emit(delta_flat, match_count, ext_cls, n_valid):
            # out: per-device (count [1,1,1], positions [1,1,CAP], states [1,1,CAP])
            df = delta_flat[0]
            mc = match_count[0]
            ext = ext_cls[0, 0]
            idx = (
                jax.lax.broadcasted_iota(jnp.int32, (steps, Lloc), 1) * B
                + jax.lax.broadcasted_iota(jnp.int32, (steps, Lloc), 0)
            )
            cls_tl = ext[idx]

            def step(states, cls_t):
                nxt = df[states * K + cls_t]
                return nxt, nxt

            init = jnp.zeros((Lloc,), dtype=jnp.int32)
            _, seq = jax.lax.scan(step, init, cls_tl)
            # position-major order so compaction preserves ascending positions
            states = seq[H:].T.reshape(-1)  # [Lloc*B]
            pos = jax.lax.broadcasted_iota(jnp.int32, (Lloc * B, 1), 0)[:, 0]
            valid = pos < n_valid[0, 0]
            flag = (mc[states] > 0) & valid
            dst = jnp.cumsum(flag.astype(jnp.int32)) - 1
            count = jnp.where(flag.size, dst[-1] + 1, 0)
            dst = jnp.where(flag, jnp.minimum(dst, CAP - 1), CAP)
            buf_pos = (
                jnp.full((CAP + 1,), -1, jnp.int32).at[dst].set(pos, mode="drop")
            )[:CAP]
            buf_state = (
                jnp.zeros((CAP + 1,), jnp.int32).at[dst].set(states, mode="drop")
            )[:CAP]
            return (
                count.reshape(1, 1, 1),
                buf_pos.reshape(1, 1, CAP),
                buf_state.reshape(1, 1, CAP),
            )

        from jax import shard_map

        fn = shard_map(
            local_scan_emit,
            mesh=mesh,
            in_specs=(
                P("pattern"),
                P("pattern"),
                P("pattern", "data"),
                P("pattern", "data"),
            ),
            out_specs=(
                P("pattern", "data"),
                P("pattern", "data"),
                P("pattern", "data"),
            ),
            check_vma=False,
        )
        return jax.jit(fn)

    def search(
        self,
        letters_u32: np.ndarray,
        block: int = 256,
        cap_per_device: int = 1 << 16,
    ):
        """Full match emission across the mesh.

        Returns (end_positions int64[], global_pattern_ids int64[]) in the
        reference's exact order (position ascending, longest pattern first at
        equal positions — fail-chain order).  Pattern ids are shard-major;
        ``values_of`` maps them back to values.
        """
        mesh = self.mesh
        kp, kd = mesh.shape["pattern"], mesh.shape["data"]
        H = self.H
        N = int(letters_u32.size)
        B = max(block, H)
        Nloc = -(-N // kd)
        Lloc = -(-Nloc // B)

        cls_all = self.classes_per_shard(letters_u32)
        ext = np.zeros((kp, kd, H + Lloc * B), dtype=np.int32)
        n_valid = np.zeros((kp, kd), dtype=np.int32)
        for d in range(kd):
            lo = d * Nloc
            hi = min(lo + Nloc, N)
            if hi <= lo:
                continue
            ext[:, d, H : H + (hi - lo)] = cls_all[:, lo:hi]
            halo = cls_all[:, max(lo - H, 0) : lo]
            if halo.shape[1]:
                ext[:, d, H - halo.shape[1] : H] = halo
            n_valid[:, d] = hi - lo

        # Optimistic single pass: the emission kernel always counts exactly,
        # so an overflowing first pass yields the exact per-device need and
        # ONE re-run with CAP rounded up to a power of two is guaranteed to
        # fit.  Rounding keeps the set of compiled programs bounded (no
        # per-input re-jit); compiled variants are cached by (B, Lloc, CAP).
        CAP = int(cap_per_device)
        for _ in range(2):
            key = (B, Lloc, CAP)
            fn = self._search_fns.get(key)
            if fn is None:
                fn = self._search_fns[key] = self._build_search_fn(B, Lloc, CAP)
            with self.mesh:
                counts, pos_buf, state_buf = fn(
                    self._stage(self.delta_flat, P("pattern")),
                    self._stage(self.match_count, P("pattern")),
                    self._stage(ext, P("pattern", "data")),
                    self._stage(n_valid, P("pattern", "data")),
                )
            counts = self._fetch_global(counts)[..., 0]  # [kp, kd]
            need = int(counts.max(initial=0))
            if need <= CAP:
                break
            CAP = 1 << max(need - 1, 1).bit_length()
        if need > CAP:
            # unreachable for deterministic kernels (the second pass sizes CAP
            # from the first pass's exact counts); fail loudly rather than
            # consume silently truncated buffers if that ever changes
            raise RuntimeError(
                f"sharded search overflow: need {need} > CAP {CAP}"
            )
        # Multi-host: gather the per-device match buffers so every process
        # reassembles the identical global stream (reference emission order,
        # src/AutomatonSearchIter.c:157-300, reproduced across hosts).
        # Introspection for the scaling harness: the gathered volume is the
        # PADDED buffers (pos + state, int32 each), not the match count —
        # this is the quantity real-hardware projections must charge.
        self.last_search_stats = {
            "cap_per_device": CAP,
            "max_matches_per_device": need,
            "gathered_bytes": int(2 * 4 * kp * kd * CAP + 4 * kp * kd),
        }
        pos_buf = self._fetch_global(pos_buf)
        state_buf = self._fetch_global(state_buf)

        all_pos, all_pid = [], []
        for i, c in enumerate(self.shards):
            for d in range(kd):
                m = int(counts[i, d])
                if not m:
                    continue
                pos = pos_buf[i, d, :m].astype(np.int64) + d * Nloc
                states = state_buf[i, d, :m]
                # CSR expansion on host (order: fail-chain per position)
                mc = c.match_count[states].astype(np.int64)
                starts = c.out_offsets[states]
                total = int(mc.sum())
                cum = np.zeros(m, np.int64)
                np.cumsum(mc[:-1], out=cum[1:])
                flat = np.repeat(starts - cum, mc) + np.arange(total, dtype=np.int64)
                all_pid.append(
                    c.out_ids[flat].astype(np.int64) + self.shard_offsets[i]
                )
                all_pos.append(np.repeat(pos, mc))
        if not all_pos:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        pos = np.concatenate(all_pos)
        pid = np.concatenate(all_pid)
        # global reference order: end ascending, longer pattern first at ties
        order = np.lexsort((-self.word_len_all[pid], pos))
        return pos[order], pid[order]

    def values_of(self, global_pids: np.ndarray):
        """Map shard-major global pattern ids back to stored values."""
        out = []
        bounds = self.shard_offsets
        for g in global_pids:
            i = int(np.searchsorted(bounds, g, side="right")) - 1
            out.append(self.shards[i].values[int(g - bounds[i])])
        return out

    def count_matches(self, letters_u32: np.ndarray, block: int = 256) -> np.ndarray:
        """Per-pattern global counts; returns int64 [sum of shard pattern
        counts] in shard-major order (use ``unsplit`` to reorder)."""
        mesh = self.mesh
        kp = mesh.shape["pattern"]
        kd = mesh.shape["data"]
        H = self.H
        N = int(letters_u32.size)
        B = max(block, H)

        # per-device chunk of the haystack, each with its true halo prefix
        Nloc = -(-N // kd)
        Lloc = -(-Nloc // B)
        Nloc_pad = Lloc * B
        cls_all = self.classes_per_shard(letters_u32)  # [kp, N]
        ext = np.zeros((kp, kd, H + Nloc_pad), dtype=np.int32)
        n_valid = np.zeros((kp, kd), dtype=np.int32)
        for d in range(kd):
            lo = d * Nloc
            hi = min(lo + Nloc, N)
            if hi <= lo:
                continue
            ext[:, d, H : H + (hi - lo)] = cls_all[:, lo:hi]
            halo = cls_all[:, max(lo - H, 0) : lo]
            if halo.shape[1]:
                ext[:, d, H - halo.shape[1] : H] = halo
            n_valid[:, d] = hi - lo

        key = (B, Lloc)
        if self._count_fn is None or self._count_key != key:
            self._count_fn = self._build_count_fn(B, Lloc)
            self._count_key = key

        with self.mesh:
            out = self._count_fn(
                self._stage(self.delta_flat, P("pattern")),
                self._stage(self.row_of, P("pattern")),
                self._stage(self.out_ids, P("pattern")),
                self._stage(ext, P("pattern", "data")),
                self._stage(n_valid, P("pattern", "data")),
            )
        if jax.process_count() > 1 and not out.is_fully_addressable:
            # pattern rows live on other hosts: gather the global result
            # (with kp == 1 the psum-reduced output is replicated everywhere
            # and this branch is skipped)
            from jax.experimental import multihost_utils

            out = multihost_utils.process_allgather(out, tiled=True)
        out = np.asarray(out)  # [kp, Pmax]
        return np.concatenate(
            [out[i, : c.num_patterns] for i, c in enumerate(self.shards)]
        ).astype(np.int64)
