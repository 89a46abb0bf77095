"""Pallas TPU kernel: batched per-env terrain-patch extraction.

XLA lowers the batched dynamic-slice gather (terrain/patch.py extract) to a
generic scattered gather (~10 ms for 4096 envs) — the single hottest op in
the env step after the physics.  This kernel replaces it with explicit
strided DMAs from the pre-blocked table (terrain/patch.py make_source):
each grid program issues K async HBM->VMEM copies (one per env: dynamic
block index, sublane-aligned row offset, full 128-lane minor dim) and
overlaps their latency, leaving the op bandwidth-bound.

Falls back to the XLA gather on non-TPU backends (tests run the fallback
plus an interpret-mode parity check of this kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..terrain.patch import PATCH_C, PATCH_R

ENVS_PER_PROGRAM = 8


def _kernel(starts_ref, blocks_ref, out_ref, sems):
    g = pl.program_id(0)
    K = ENVS_PER_PROGRAM

    def dma(k):
        i = g * K + k
        r0 = starts_ref[0, i]
        b = starts_ref[1, i]
        return pltpu.make_async_copy(
            blocks_ref.at[:, b, pl.ds(r0, PATCH_R), :],
            out_ref.at[:, k],
            sems.at[k])

    # issue all K copies, then wait: latency overlaps across envs
    for k in range(K):
        dma(k).start()
    for k in range(K):
        dma(k).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def extract_patches_pallas(blocks, starts, interpret: bool = False):
    """blocks (T,B,R_pad,128) f32, starts (N,2) int32 (row, col_block) ->
    (T,N,PATCH_R,PATCH_C) f32 (table-major: no transpose for consumers)."""
    T = blocks.shape[0]
    N = starts.shape[0]
    K = ENVS_PER_PROGRAM
    pad = (-N) % K
    if pad:
        starts = jnp.concatenate(
            [starts, jnp.zeros((pad, 2), dtype=starts.dtype)], axis=0)
    n_pad = N + pad
    # SMEM pads each row: ship the prefetch operand as (2, N), not (N, 2)
    starts = starts.T

    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // K,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (T, K, PATCH_R, PATCH_C),
                lambda g, s: (0, g, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
        ),
        out_shape=jax.ShapeDtypeStruct((T, n_pad, PATCH_R, PATCH_C),
                                       blocks.dtype),
        interpret=interpret,
    )(starts, blocks)
    return out[:, :N]


# --- physics contact window: raw-table rows [r0+16, r0+56) ------------------

def _window_kernel(win_r0, win_r, starts_ref, blocks_ref, out_ref, sems):
    g = pl.program_id(0)
    K = ENVS_PER_PROGRAM

    def dma(k):
        i = g * K + k
        r0 = starts_ref[0, i]
        b = starts_ref[1, i]
        return pltpu.make_async_copy(
            blocks_ref.at[0, b, pl.ds(r0 + win_r0, win_r), :],
            out_ref.at[k],
            sems.at[k])

    for k in range(K):
        dma(k).start()
    for k in range(K):
        dma(k).wait()


@functools.partial(jax.jit, static_argnames=("win_r0", "win_r", "interpret"))
def extract_windows_pallas(blocks, starts, win_r0: int = 16, win_r: int = 40,
                           interpret: bool = False):
    """Raw-table contact windows: blocks (T,B,R_pad,128), starts (N,2) ->
    (N, win_r, PATCH_C) f32 rows [r0+win_r0, r0+win_r0+win_r) of table 0
    (the physics mega-kernel's terrain input; see physics/pallas_substep)."""
    N = starts.shape[0]
    K = ENVS_PER_PROGRAM
    pad = (-N) % K
    if pad:
        starts = jnp.concatenate(
            [starts, jnp.zeros((pad, 2), dtype=starts.dtype)], axis=0)
    n_pad = N + pad
    starts = starts.T

    out = pl.pallas_call(
        functools.partial(_window_kernel, win_r0, win_r),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // K,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (K, win_r, PATCH_C),
                lambda g, s: (g, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, win_r, PATCH_C), blocks.dtype),
        interpret=interpret,
    )(starts, blocks)
    return out[:N]
