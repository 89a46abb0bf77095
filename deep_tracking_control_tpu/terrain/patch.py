"""Per-env terrain patches + matmul-based height sampling (TPU fast path).

Scattered `jnp.take` gathers dominate the step time on TPU (the 693-point
height scan alone costs more than the physics).  TPU-first redesign:

1. At init the heightfield (plus min3/max10 pooled variants) is re-blocked
   into OVERLAPPING 128-column slabs at 64-column stride, padded so every
   slab is full.  This makes per-env patch extraction a lane-aligned
   strided copy: leading (block) index + sublane-aligned row offset + full
   128-lane minor dim — exactly what the TPU DMA engine supports.
2. Once per policy step, a (64, 128)-cell patch is extracted around each
   robot — on TPU via a Pallas DMA kernel (ops/pallas_patch.py), elsewhere
   via batched dynamic-slice.
3. Every height query (contact bilinear+slope, the min-of-3 observation
   scan, the max-of-10 foot clearance) becomes a SEPARABLE ONE-HOT MATMUL
   against the local patch: h[k] = w_row[k] @ patch @ w_col[k] (MXU work,
   with bilinear weights for interpolation and difference weights for
   slopes).
4. The min3 / max10 stencils are applied ONCE at init as pooled copies of
   the whole heightfield, so their runtime query is a nearest-neighbor
   matmul-gather from the pooled patch.

Patch coverage: rows [r0, r0+64), cols [64b, 64b+128) chosen so the robot
sits >= 24 rows / 32 cols from every edge — covers the rotated 33x21 scan
grid (radius 0.94 m at 0.05 m scale = 19 cells) plus per-step drift.

Numerical parity with terrain/grid.py's direct gathers is tested in
tests/test_patch.py.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .grid import TerrainGrid

PATCH_R = 64        # rows per patch (sublane-aligned starts)
COL_BLOCK = 64      # column stride between overlapping slabs
PATCH_C = 128       # columns per patch (full lane width)
ROW_ALIGN = 8       # f32 sublane tile


def pooled_tables(grid: TerrainGrid):
    """Static min3/max10 pooled heightfields (meters).

    min3:  min(h[i,j], h[i+1,j], h[i,j+1])      (legged_robot.py:1311-1315)
    max10: max over the 10-point stencil        (legged_robot.py:1455-1468)
    """
    h = grid.height
    if grid.is_plane:
        return h, h

    def shift(a, dx, dy):
        return jnp.roll(a, (-dx, -dy), axis=(0, 1))

    min3 = jnp.minimum(jnp.minimum(h, shift(h, 1, 0)), shift(h, 0, 1))
    offs = [(0, 0), (1, 0), (0, 1), (2, 0), (0, 2),
            (1, 1), (-1, 0), (0, -1), (-2, 0), (0, -2)]
    max10 = h
    for dx, dy in offs[1:]:
        max10 = jnp.maximum(max10, shift(h, dx, dy))
    return min3, max10


@dataclasses.dataclass
class PatchSource:
    """Blocked patch source: blocks (T, B, R_pad, 128), + grid geometry.

    blocks16 is a bfloat16 copy of the POOLED tables (min3, max10) —
    (2, B, R_pad, 128) — for the fused sampler kernel's slab DMA: the
    nearest-sampled obs/clearance queries run in bf16 anyway (see
    sample_nearest), so storing bf16 halves the per-env DMA without any
    additional rounding.  The raw table stays f32 (contact precision)."""
    blocks: jnp.ndarray
    blocks16: jnp.ndarray
    n_blocks: int
    n_rows: int
    horizontal_scale: float
    border_size: float

    def tree_flatten(self):
        return (self.blocks, self.blocks16), (
            self.n_blocks, self.n_rows,
            self.horizontal_scale, self.border_size)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], *aux)


jax.tree_util.register_pytree_node(
    PatchSource, PatchSource.tree_flatten, PatchSource.tree_unflatten)


def make_source(grid: TerrainGrid, tables) -> PatchSource:
    """Re-block (T, R, C) tables into (T, B, R_pad, 128) overlapping slabs."""
    T, R, C = tables.shape
    n_blocks = max(-(-C // COL_BLOCK), 1)
    # pad cols so every slab [64b, 64b+128) is full, rows so r0+64 <= R_pad
    pad_c = n_blocks * COL_BLOCK + (PATCH_C - COL_BLOCK) - C
    # +16 rows beyond the PATCH_R slab: the bf16 pooled tables must be
    # DMA'd from 16-aligned row starts (bf16 (8,128)x2 packed tiling), so
    # the fused sampler reads a [r0 & ~15, r0 & ~15 + 72) superset slab
    pad_r = PATCH_R + 16
    padded = jnp.pad(tables, ((0, 0), (0, pad_r), (0, max(pad_c, 0))),
                     mode="edge")
    blocks = jnp.stack([padded[:, :, b * COL_BLOCK:b * COL_BLOCK + PATCH_C]
                        for b in range(n_blocks)], axis=1)
    return PatchSource(blocks=blocks,
                       blocks16=blocks[1:].astype(jnp.bfloat16),
                       n_blocks=n_blocks, n_rows=R,
                       horizontal_scale=grid.horizontal_scale,
                       border_size=grid.border_size)


def patch_starts(src: PatchSource, base_xy):
    """Per-env (row_start, col_block) (N,2) int32 + world origin (N,2)."""
    hs = src.horizontal_scale
    fr = (base_xy[:, 0] + src.border_size) / hs - PATCH_R / 2
    r0 = jnp.floor(fr / ROW_ALIGN).astype(jnp.int32) * ROW_ALIGN
    r0 = jnp.clip(r0, 0, max(src.n_rows - 1, 0))
    fc = (base_xy[:, 1] + src.border_size) / hs - PATCH_C / 2
    b = jnp.clip(jnp.round(fc / COL_BLOCK).astype(jnp.int32),
                 0, src.n_blocks - 1)
    origin = jnp.stack(
        [r0.astype(jnp.float32) * hs - src.border_size,
         (b * COL_BLOCK).astype(jnp.float32) * hs - src.border_size], axis=1)
    return jnp.stack([r0, b], axis=1), origin


def extract(src: PatchSource, starts):
    """Patch extraction: -> (T, N, PATCH_R, PATCH_C).

    TPU: Pallas DMA kernel (ops/pallas_patch.py); else dynamic-slice."""
    if jax.default_backend() != "cpu":
        from ..ops.pallas_patch import extract_patches_pallas
        return extract_patches_pallas(src.blocks, starts)  # (T,N,Pr,Pc)

    def one(s):
        return jax.lax.dynamic_slice(
            src.blocks, (0, s[1], s[0], 0),
            (src.blocks.shape[0], 1, PATCH_R, PATCH_C))[:, 0]
    return jnp.swapaxes(jax.vmap(one)(starts), 0, 1)


def _weights_nearest(f, size):
    """(N,K) fractional local coords -> (N,K,size) one-hot at floor(f)."""
    idx = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, size - 1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    return (idx[..., None] == iota).astype(jnp.float32)


def _weights_bilinear(f, size):
    """-> (w (N,K,size), dw (N,K,size)) bilinear + derivative weights."""
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, size - 2)
    t = jnp.clip(f - i0.astype(f.dtype), 0.0, 1.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    e0 = (i0[..., None] == iota).astype(jnp.float32)
    e1 = ((i0 + 1)[..., None] == iota).astype(jnp.float32)
    w = e0 * (1.0 - t)[..., None] + e1 * t[..., None]
    dw = e1 - e0
    return w, dw


def _rowdot(w_r, patches):
    """(N,K,Pr) x (N,Pr,Pc) -> (N,K,Pc) row contraction (MXU)."""
    return jnp.einsum("nkp,npq->nkq", w_r, patches,
                      preferred_element_type=jnp.float32)


def _weights_corner(f, size):
    """(N,K) fractional coords -> (e0, e1, t): one-hots at floor(f) and
    floor(f)+1 plus the fractional part (clipped like _weights_bilinear)."""
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, size - 2)
    t = jnp.clip(f - i0.astype(f.dtype), 0.0, 1.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
    e0 = (i0[..., None] == iota).astype(jnp.float32)
    e1 = ((i0 + 1)[..., None] == iota).astype(jnp.float32)
    return e0, e1, t


def sample_bilinear_slope(patches, origin, hs, x, y):
    """Bilinear height + slope + max corner at world (x, y): (N,K) each ->
    (h, dh/dx, dh/dy, h_max) (N,K).  Contact-solver query (replaces
    grid.height_and_slope; identical corner algebra)."""
    fr = (x - origin[:, 0:1]) / hs
    fc = (y - origin[:, 1:2]) / hs
    e0r, e1r, tx = _weights_corner(fr, PATCH_R)
    e0c, e1c, ty = _weights_corner(fc, PATCH_C)
    rows0 = _rowdot(e0r, patches)
    rows1 = _rowdot(e1r, patches)
    c00 = jnp.einsum("nkq,nkq->nk", rows0, e0c)
    c10 = jnp.einsum("nkq,nkq->nk", rows1, e0c)
    c01 = jnp.einsum("nkq,nkq->nk", rows0, e1c)
    c11 = jnp.einsum("nkq,nkq->nk", rows1, e1c)
    h = (c00 * (1 - tx) * (1 - ty) + c10 * tx * (1 - ty)
         + c01 * (1 - tx) * ty + c11 * tx * ty)
    dhdx = ((c10 - c00) * (1 - ty) + (c11 - c01) * ty) / hs
    dhdy = ((c01 - c00) * (1 - tx) + (c11 - c10) * tx) / hs
    h_max = jnp.maximum(jnp.maximum(c00, c10), jnp.maximum(c01, c11))
    cap = 3.0   # slope cap, same as grid.height_and_slope
    return (h, jnp.clip(dhdx, -cap, cap), jnp.clip(dhdy, -cap, cap), h_max)


def sample_nearest(patches, origin, hs, x, y):
    """Integer-cell lookup at world (x, y) from a (pooled) patch:
    (N,K) -> (N,K).  Used for the min3 scan and max10 clearance.

    Runs in bfloat16: the one-hot weights are exact in bf16 and the height
    values feed observations/rewards that already carry +-0.1 uniform noise
    (legged_robot.py:229,361), so the <=0.4% bf16 rounding of the heights is
    far inside the noise budget — while halving the dominant HBM traffic
    (the materialized (N,K,P) weight tensors)."""
    fr = (x - origin[:, 0:1]) / hs
    fc = (y - origin[:, 1:2]) / hs
    wr = _weights_nearest(fr, PATCH_R).astype(jnp.bfloat16)
    wc = _weights_nearest(fc, PATCH_C).astype(jnp.bfloat16)
    # COLUMN stage first: contracting the 128-lane col dim uses the full
    # MXU K width (the row dim is only 64) and the (N, K, 64) intermediate
    # is half the size of the row-first (N, K, 128) one
    cols = jnp.einsum("nkq,npq->nkp", wc, patches.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    return jnp.einsum("nkp,nkp->nk", cols, wr.astype(jnp.float32))


def extract_window(src: PatchSource, starts, win_r0: int = 16,
                   win_r: int = 40, interpret: bool = False):
    """Physics contact window: raw-table rows [r0+win_r0, r0+win_r0+win_r)
    -> (N, win_r, PATCH_C).  TPU: DMA kernel; CPU: dynamic-slice fallback."""
    if jax.default_backend() != "cpu" or interpret:
        from ..ops.pallas_patch import extract_windows_pallas
        return extract_windows_pallas(src.blocks, starts, win_r0, win_r,
                                      interpret=interpret)

    def one(s):
        return jax.lax.dynamic_slice(
            src.blocks, (0, s[1], s[0] + win_r0, 0),
            (1, 1, win_r, PATCH_C))[0, 0]
    return jax.vmap(one)(starts)
