"""Pallas TPU kernel: DFA scan with the transition table resident in VMEM.

Motivation (PLAN.md): XLA's HBM gather costs ~7 ns/element and bounds the
general scan at ~0.1 GB/s/chip.  Mosaic's hardware gather
(`tpu.dynamic_gather`) only supports tile-local lookups where the table tile
and index tile share the same (8, 128) shape — so this kernel targets *small*
automata (table <= a few thousand entries, i.e. keyword sets of dozens of
patterns, a very common production case) and implements the full-table lookup
as a sweep over 128-wide tiles held in VMEM registers:

    for each tile t:  acc = where(idx >> 7 == t, gather_tile(t, idx & 127), acc)

Per scan step that is ~3 VPU ops per tile on (8, 128) lanes — no HBM traffic
at all in the hot loop.

The kernel processes L = 1024 lanes (the native (8, 128) vector shape) and
steps through the halo-blocked class matrix like the XLA engines, producing
the same signed states (sign bit = match flag).  Use ``scan_signed_pallas``
as a drop-in for the signed XLA scan; correctness is pinned by interpret-mode
tests, and the TPU path is opt-in via PYAHOCORASICK_TPU_PALLAS=1 until
validated on hardware.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..compiler import CompiledAutomaton

LANES = 1024  # 8 sublanes x 128 lanes
MAX_TILES = 64  # table capacity: 64 * 128 = 8192 entries


def table_fits(compiled: CompiledAutomaton) -> bool:
    return compiled.num_states * compiled.num_classes <= MAX_TILES * 128


def _kernel(ntiles: int, steps: int, K: int):
    def kernel(tab_ref, cls_ref, out_ref):
        # tab_ref: [ntiles, 8, 128] (each tile row replicated across sublanes)
        # cls_ref: [steps, 8, 128] class ids
        # out_ref: [steps, 8, 128] signed states after each step
        def body(t, states):
            idx = states * K + cls_ref[t]
            hi = jax.lax.shift_right_logical(idx, 7)
            lo = jax.lax.bitwise_and(idx, 127)
            acc = jnp.zeros((8, 128), jnp.int32)
            for tile in range(ntiles):
                v = jnp.take_along_axis(tab_ref[tile], lo, axis=1)
                acc = jnp.where(hi == tile, v, acc)
            out_ref[t] = acc
            return jax.lax.bitwise_and(acc, 0x7FFFFFFF)

        jax.lax.fori_loop(0, steps, body, jnp.zeros((8, 128), jnp.int32))

    return kernel


@functools.partial(
    jax.jit, static_argnames=("ntiles", "steps", "K", "interpret")
)
def _pallas_scan(tab_tiles, cls_steps, ntiles, steps, K, interpret=False):
    return pl.pallas_call(
        _kernel(ntiles, steps, K),
        out_shape=jax.ShapeDtypeStruct((steps, 8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(tab_tiles, cls_steps)


def _tiled_signed_table(compiled: CompiledAutomaton) -> np.ndarray:
    cache = compiled._cache
    if "pallas_tab" not in cache:
        has_match = compiled.match_count > 0
        signed = compiled.delta | (
            has_match[compiled.delta].astype(np.int32) << 31
        )
        flat = signed.reshape(-1)
        ntiles = max(-(-flat.size // 128), 1)
        padded = np.zeros(ntiles * 128, np.int32)
        padded[: flat.size] = flat
        tiles = padded.reshape(ntiles, 1, 128).repeat(8, axis=1)
        cache["pallas_tab"] = np.ascontiguousarray(tiles)
    return cache["pallas_tab"]


def scan_signed_pallas(
    compiled: CompiledAutomaton,
    cls: np.ndarray,
    halo: np.ndarray | None = None,
    interpret: bool = False,
) -> np.ndarray:
    """Signed per-position states via the VMEM sweep-gather kernel.

    Lane layout matches the XLA blocked engines: 1024 lanes, block
    B = ceil(N/1024) rounded so every lane runs H halo steps first.
    Returns int32[N] signed states (sign bit = match flag).
    """
    if not table_fits(compiled):
        raise ValueError("automaton too large for the VMEM pallas kernel")
    N = int(cls.size)
    if N == 0:
        return np.empty(0, np.int32)
    H = max(int(compiled.longest_word), 1)
    B = max(-(-N // LANES), 1)
    steps = H + B

    ext = np.zeros(H + LANES * B, dtype=np.int32)
    if halo is not None and halo.size:
        h = halo[-H:]
        ext[H - h.size : H] = h
    ext[H : H + N] = cls
    win = np.lib.stride_tricks.sliding_window_view(ext, H + B)[::B][:LANES]
    cls_tl = np.ascontiguousarray(win.T).reshape(steps, 8, 128)

    tab = _tiled_signed_table(compiled)
    out = np.asarray(
        _pallas_scan(
            jnp.asarray(tab),
            jnp.asarray(cls_tl),
            tab.shape[0],
            steps,
            compiled.num_classes,
            interpret,
        )
    )  # [steps, 8, 128]
    states = out[H:].reshape(B, LANES).T.reshape(LANES * B)[:N]
    return states
