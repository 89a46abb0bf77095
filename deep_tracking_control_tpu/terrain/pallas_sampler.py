"""Pallas TPU kernel: fused terrain-patch extraction + height sampling.

Replaces the XLA chain (pallas_patch extraction of 3 tables -> HBM ->
sample_nearest one-hot einsums) for the per-step terrain queries:

  * the 693-point min3 observation scan   (legged_robot.py:1279-1317)
  * the 4-point max10 foot clearance      (legged_robot.py:1443-1472)
  * 21 bilinear height+slope "planes" at the body contact points (feeds
    the physics mega-kernel's frozen-plane body contacts)

The XLA path materializes the (3, N, 64, 128) patches and the (N, 693, P)
one-hot row/col weights in HBM (~1.5 GB of traffic per step at 4096 envs);
here each grid program DMAs per-env slabs into VMEM (double-buffered
across envs), builds the one-hot weights in registers, and writes only the
(N, 736) results.

v2 layout (measured against v1's row-first form):
  * pooled tables stream as bfloat16 (PatchSource.blocks16) — the nearest
    queries run in bf16 anyway (patch.sample_nearest); raw stays f32.
  * the scan contraction is COLUMN-FIRST on the MXU — contracting the
    128-lane col dim uses the full MXU K width (dot (64,128)@(128,704)),
    and the row stage is a 64-sublane one-hot mul+reduce on the VPU (half
    the elementwise work of the row-first form's 128-row col stage).

Numerics match terrain/patch.py exactly: nearest sampling in bf16 (same
justification as sample_nearest), bilinear+slope in f32 with the same
clip/slope-cap semantics.  Parity: tests/test_pallas_sampler.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .patch import PATCH_C, PATCH_R, PatchSource

# query layout in the packed (N, Q_TOT) coordinate arrays
Q_MIN3 = 704          # 693 scan points + padding
Q_MAX10 = 8           # 4 feet + padding
Q_BIL = 24            # 21 body points + padding
Q_TOT = Q_MIN3 + Q_MAX10 + Q_BIL
ENVS_PER_PROGRAM = 8
# slab rows: PATCH_R + 16.  bf16 tiles are (8,128)x2-packed, so slab DMAs
# must start at PROVABLY 16-aligned rows with 16-multiple lengths: the
# host passes r0 // 16 and the kernel multiplies back (Mosaic can prove
# (16*k) alignment; a runtime-8-aligned r0 it cannot).  Row coords carry
# the +(r0 % 16) shift, applied outside the kernel after the edge clip.
SLAB_R = PATCH_R + 16


def _kernel(hs: float,
            starts_ref, raw_ref, pooled_ref, fr_ref, fc_ref,
            h_out, gx_out, gy_out,
            raw_slab, pooled_slab, sem_r, sem_p):
    g = pl.program_id(0)
    E = ENVS_PER_PROGRAM

    def dma_raw(slot, k):
        i = g * E + k
        r0 = starts_ref[0, i] * 16     # host passes r0 // 16 (see SLAB_R)
        b = starts_ref[1, i]
        return pltpu.make_async_copy(
            raw_ref.at[0, b, pl.ds(r0, SLAB_R), :],
            raw_slab.at[slot], sem_r.at[slot])

    def dma_pooled(slot, k):
        i = g * E + k
        r0 = starts_ref[0, i] * 16
        b = starts_ref[1, i]
        return pltpu.make_async_copy(
            pooled_ref.at[:, b, pl.ds(r0, SLAB_R), :],
            pooled_slab.at[slot], sem_p.at[slot])

    dma_raw(0, 0).start()
    dma_pooled(0, 0).start()
    # queries stay in LANES throughout (a (Q,1)-sublane layout forces
    # pathological relayouts); one-hots are built TRANSPOSED — (R, Q) /
    # (C, Q)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (SLAB_R, 1), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (PATCH_C, 1), 0)
    dn_rows = (((0,), (0,)), ((), ()))        # contract dim 0 with dim 0
    dn_cols = (((1,), (0,)), ((), ()))        # contract cols with dim 0

    for k in range(E):
        if k + 1 < E:
            dma_raw((k + 1) % 2, k + 1).start()
            dma_pooled((k + 1) % 2, k + 1).start()
        dma_raw(k % 2, k).wait()
        dma_pooled(k % 2, k).wait()
        s_raw = raw_slab[k % 2]               # (SLAB_R, PATCH_C) f32
        s_pool = pooled_slab[k % 2]           # (2, SLAB_R, PATCH_C) bf16
        fr = fr_ref[k][None, :]               # (1, Q_TOT)
        fc = fc_ref[k][None, :]

        # ---- nearest one-hots for the min3 scan + max10 clearance -------
        # column-first: cols[r, q] = dot(slab (R, 128), wc (128, Q)) runs
        # the FULL 128-wide MXU contraction; the row stage is a one-hot
        # mul + 64-sublane reduce on the VPU.
        near = slice(0, Q_MIN3 + Q_MAX10)
        ir = jnp.clip(jnp.floor(fr[:, near]), 0, SLAB_R - 1
                      ).astype(jnp.int32)
        ic = jnp.clip(jnp.floor(fc[:, near]), 0, PATCH_C - 1
                      ).astype(jnp.int32)
        wr = (iota_r == ir).astype(jnp.float32)       # (72, 712)
        wc = (iota_c == ic).astype(jnp.bfloat16)      # (128, 712)
        cols_min3 = jax.lax.dot_general(
            s_pool[0], wc[:, :Q_MIN3], dn_cols,
            preferred_element_type=jnp.float32)       # (72, 704)
        h_min3 = jnp.sum(cols_min3 * wr[:, :Q_MIN3], axis=0)
        cols_max10 = jax.lax.dot_general(
            s_pool[1], wc[:, Q_MIN3:], dn_cols,
            preferred_element_type=jnp.float32)       # (64, 8)
        h_max10 = jnp.sum(cols_max10 * wr[:, Q_MIN3:], axis=0)

        # ---- bilinear height + slope from the raw table ------------------
        bil = slice(Q_MIN3 + Q_MAX10, Q_TOT)
        frb, fcb = fr[:, bil], fc[:, bil]             # (1, 24)
        i0 = jnp.clip(jnp.floor(frb), 0, SLAB_R - 2).astype(jnp.int32)
        tx = jnp.clip(frb - i0.astype(jnp.float32), 0.0, 1.0)
        j0 = jnp.clip(jnp.floor(fcb), 0, PATCH_C - 2).astype(jnp.int32)
        ty = jnp.clip(fcb - j0.astype(jnp.float32), 0.0, 1.0)
        e0r = (iota_r == i0).astype(jnp.float32)      # (72, 24)
        e1r = (iota_r == i0 + 1).astype(jnp.float32)
        wrb = e0r * (1.0 - tx) + e1r * tx
        dwrb = e1r - e0r
        e0c = (iota_c == j0).astype(jnp.float32)      # (128, 24)
        e1c = (iota_c == j0 + 1).astype(jnp.float32)
        wcb = e0c * (1.0 - ty) + e1c * ty
        dwcb = e1c - e0c
        rows_w = jax.lax.dot_general(s_raw, wrb, dn_rows,
                                     preferred_element_type=jnp.float32)
        rows_d = jax.lax.dot_general(s_raw, dwrb, dn_rows,
                                     preferred_element_type=jnp.float32)
        h_b = jnp.sum(rows_w * wcb, axis=0)
        cap = 3.0
        gx = jnp.clip(jnp.sum(rows_d * wcb, axis=0) / hs, -cap, cap)
        gy = jnp.clip(jnp.sum(rows_w * dwcb, axis=0) / hs, -cap, cap)

        h_out[k, 0:Q_MIN3] = h_min3
        h_out[k, Q_MIN3:Q_MIN3 + Q_MAX10] = h_max10
        h_out[k, Q_MIN3 + Q_MAX10:Q_TOT] = h_b
        gx_out[k, :] = gx
        gy_out[k, :] = gy


@functools.partial(jax.jit, static_argnames=("hs", "interpret"))
def _sample_all_pallas(blocks, blocks16, starts, fr, fc, hs: float,
                       interpret: bool = False):
    N = starts.shape[0]
    E = ENVS_PER_PROGRAM
    # bf16 slabs DMA from the 16-aligned floor of r0; row coords get the
    # +(r0 % 16) in-slab shift.  The clip-to-patch-edge happens BEFORE the
    # shift so out-of-patch queries clamp to the same cell as the XLA path
    # (clip(f, 0, R-1) then floor == floor-then-clip for these bounds).
    delta = jnp.remainder(starts[:, 0], 16)
    starts = starts.at[:, 0].set(starts[:, 0] // 16)
    fr = jnp.clip(fr, 0, PATCH_R - 1)
    # Bilinear queries (last Q_BIL cols) must match _weights_corner's
    # i0 <= PATCH_R-2 clip: at the exact bottom edge fr == PATCH_R-1 the
    # kernel's floor would pick rows (R-1, R) — row R is slab padding.
    # Backing fr off the edge by 1e-4 cells lands floor on R-2 with
    # t = 1-1e-4 (height error < 2e-5 m), using rows (R-2, R-1) like the
    # XLA path.  Unreachable for current body-point queries; edge-proof
    # for future callers.
    fr = fr.at[:, Q_MIN3 + Q_MAX10:].min(PATCH_R - 1 - 1e-4)
    fr = fr + delta[:, None].astype(fr.dtype)
    pad = (-N) % E
    if pad:
        starts = jnp.concatenate(
            [starts, jnp.zeros((pad, 2), dtype=starts.dtype)], axis=0)
        fr = jnp.concatenate([fr, jnp.zeros((pad, Q_TOT), fr.dtype)], axis=0)
        fc = jnp.concatenate([fc, jnp.zeros((pad, Q_TOT), fc.dtype)], axis=0)
    n_pad = N + pad
    starts = starts.T                         # SMEM prefetch as (2, N)

    def espec(q):
        # index_map gets (grid_idx, scalar_prefetch_ref)
        return pl.BlockSpec((E, q), lambda g, s: (g, 0),
                            memory_space=pltpu.VMEM)

    h, gx, gy = pl.pallas_call(
        functools.partial(_kernel, hs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // E,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      espec(Q_TOT), espec(Q_TOT)],
            out_specs=(espec(Q_TOT), espec(Q_BIL), espec(Q_BIL)),
            scratch_shapes=[
                pltpu.VMEM((2, SLAB_R, PATCH_C), jnp.float32),
                pltpu.VMEM((2, 2, SLAB_R, PATCH_C), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct((n_pad, Q_TOT), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, Q_BIL), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, Q_BIL), jnp.float32)),
        interpret=interpret,
    )(starts, blocks, blocks16, fr, fc)
    return h[:N], gx[:N], gy[:N]


def sample_all(src: PatchSource, starts, origin, qx, qy,
               interpret: bool = False):
    """Fused terrain sampling for one step.

    src: the 3-table PatchSource; starts (N,2) int32 from patch_starts;
    origin (N,2) world xy of patch cell (0,0); qx/qy (N, Q_TOT) world
    coords packed as [693 scan | pad | 4 feet | pad | 21 body | pad]
    (pad queries must hold in-range coords, e.g. the env origin).

    Returns (h (N, Q_TOT), gx (N, Q_BIL), gy (N, Q_BIL)):
      h[:, :693]      min3 nearest heights (the observation scan)
      h[:, 704:708]   max10 nearest heights (foot clearance)
      h[:, 712:733]   raw bilinear heights (body planes)
      gx/gy[:, :21]   bilinear slopes at the body points
    """
    hs = src.horizontal_scale
    fr = (qx - origin[:, 0:1]) / hs
    fc = (qy - origin[:, 1:2]) / hs
    return _sample_all_pallas(src.blocks, src.blocks16, starts, fr, fc, hs,
                              interpret=interpret)
