"""Pallas TPU kernel: batched per-env terrain-patch extraction.

XLA lowers the batched dynamic-slice gather (terrain/patch.py extract) to a
generic scattered gather (~10 ms for 4096 envs) — the single hottest op in
the env step after the physics.  This kernel replaces it with explicit
strided DMAs: each grid program issues K async HBM->VMEM copies (one per
env, all T tables in one slab) and overlaps their latency, leaving the op
bandwidth-bound (~200 MB per step, well under a millisecond on HBM).

Falls back to the XLA gather on non-TPU backends (tests run the fallback
plus a small interpret-mode parity check).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ENVS_PER_PROGRAM = 8


def _kernel(P: int, T: int, starts_ref, tables_ref, out_ref, sems):
    g = pl.program_id(0)
    K = ENVS_PER_PROGRAM

    def dma(k):
        i = g * K + k
        r0 = starts_ref[i, 0]
        c0 = starts_ref[i, 1]
        return pltpu.make_async_copy(
            tables_ref.at[:, pl.ds(r0, P), pl.ds(c0, P)],
            out_ref.at[k],
            sems.at[k])

    # issue all K copies, then wait: latency overlaps across envs
    for k in range(K):
        dma(k).start()
    for k in range(K):
        dma(k).wait()


@functools.partial(jax.jit, static_argnames=("patch", "interpret"))
def extract_patches_pallas(tables, starts, patch: int, interpret: bool = False):
    """tables (T,R,C) f32, starts (N,2) int32 -> (N,T,P,P) f32."""
    T = tables.shape[0]
    N = starts.shape[0]
    K = ENVS_PER_PROGRAM
    pad = (-N) % K
    if pad:
        starts = jnp.concatenate(
            [starts, jnp.zeros((pad, 2), dtype=starts.dtype)], axis=0)
    n_pad = N + pad

    out = pl.pallas_call(
        functools.partial(_kernel, patch, T),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // K,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(
                (K, T, patch, patch),
                lambda g, s: (g, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((K,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, T, patch, patch),
                                       tables.dtype),
        interpret=interpret,
    )(starts, tables)
    return out[:N]
