"""Device-resident heightfield grid + query functions.

Replaces the reference's terrain upload + height_samples tensor
(legged_robot.py:969-1004) and the height query kernels
(`_get_heights` legged_robot.py:1279-1317, `_get_foot_clearance` :1443-1472).

The grid stays heightfield-native (no trimesh conversion): PhysX needed the
trimesh because its heightfield contact is unreliable (SURVEY.md §7.4); our
contact solver consumes the heightfield directly via bilinear interpolation.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class TerrainGrid:
    """Static terrain container (fields are jnp arrays / python scalars)."""
    height: jnp.ndarray        # (rows, cols) float32 heights in meters
    horizontal_scale: float    # m per cell (legged_robot_config.py:19)
    border_size: float         # m (legged_robot_config.py:21)
    is_plane: bool = False

    def tree_flatten(self):
        return (self.height,), (self.horizontal_scale, self.border_size, self.is_plane)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


import jax.tree_util
jax.tree_util.register_pytree_node(
    TerrainGrid, TerrainGrid.tree_flatten, TerrainGrid.tree_unflatten)


def flat_grid(size_m: float = 16.0, horizontal_scale: float = 0.05) -> TerrainGrid:
    n = int(size_m / horizontal_scale)
    return TerrainGrid(height=jnp.zeros((n, n), dtype=jnp.float32),
                       horizontal_scale=horizontal_scale,
                       border_size=size_m / 2, is_plane=True)


def _cell_coords(grid: TerrainGrid, x, y):
    """World xy -> fractional grid coords (fx, fy), clipped inside the grid."""
    fx = (x + grid.border_size) / grid.horizontal_scale
    fy = (y + grid.border_size) / grid.horizontal_scale
    fx = jnp.clip(fx, 0.0, grid.height.shape[0] - 1.001)
    fy = jnp.clip(fy, 0.0, grid.height.shape[1] - 1.001)
    return fx, fy


def _gather(grid: TerrainGrid, ix, iy):
    """Flat gather from the heightfield: int coords -> heights."""
    cols = grid.height.shape[1]
    flat = grid.height.reshape(-1)
    return jnp.take(flat, ix * cols + iy, mode="clip")


def height_and_slope(grid: TerrainGrid, x, y):
    """Bilinear height + slope + max corner at world xy (contact query).

    Returns (h, dh/dx, dh/dy, h_max).  h_max — the highest of the cell's 4
    corners — is the rim-top support height for the sphere-on-corner cliff
    contact (physics/engine.py SimParams.cliff_threshold).  Slopes are
    geometry-capped at 3.0 (slope_treshold analog, terrain.py:40-43).
    """
    if grid.is_plane:
        z = jnp.zeros_like(x)
        return z, z, z, z
    fx, fy = _cell_coords(grid, x, y)
    ix = jnp.floor(fx).astype(jnp.int32)
    iy = jnp.floor(fy).astype(jnp.int32)
    tx = fx - ix
    ty = fy - iy
    h00 = _gather(grid, ix, iy)
    h10 = _gather(grid, ix + 1, iy)
    h01 = _gather(grid, ix, iy + 1)
    h11 = _gather(grid, ix + 1, iy + 1)
    h = (h00 * (1 - tx) * (1 - ty) + h10 * tx * (1 - ty)
         + h01 * (1 - tx) * ty + h11 * tx * ty)
    dhdx = ((h10 - h00) * (1 - ty) + (h11 - h01) * ty) / grid.horizontal_scale
    dhdy = ((h01 - h00) * (1 - tx) + (h11 - h10) * tx) / grid.horizontal_scale
    h_max = jnp.maximum(jnp.maximum(h00, h10), jnp.maximum(h01, h11))
    cap = 3.0
    return (h, jnp.clip(dhdx, -cap, cap), jnp.clip(dhdy, -cap, cap), h_max)


def height_min3(grid: TerrainGrid, x, y):
    """min(h[p], h[p+dx], h[p+dy]) observation sampling.

    Exact parity with the reference height scan (legged_robot.py:1303-1317).
    """
    if grid.is_plane:
        return jnp.zeros_like(x)
    fx = (x + grid.border_size) / grid.horizontal_scale
    fy = (y + grid.border_size) / grid.horizontal_scale
    ix = jnp.clip(fx.astype(jnp.int32), 0, grid.height.shape[0] - 2)
    iy = jnp.clip(fy.astype(jnp.int32), 0, grid.height.shape[1] - 2)
    h1 = _gather(grid, ix, iy)
    h2 = _gather(grid, ix + 1, iy)
    h3 = _gather(grid, ix, iy + 1)
    return jnp.minimum(jnp.minimum(h1, h2), h3)


def height_max10(grid: TerrainGrid, x, y):
    """max over the 10-neighbor stencil — foot-clearance sampling.

    Exact parity with `_get_foot_clearance` (legged_robot.py:1450-1469).
    """
    if grid.is_plane:
        return jnp.zeros_like(x)
    fx = (x + grid.border_size) / grid.horizontal_scale
    fy = (y + grid.border_size) / grid.horizontal_scale
    ix = jnp.clip(fx.astype(jnp.int32), 1, grid.height.shape[0] - 3)
    iy = jnp.clip(fy.astype(jnp.int32), 1, grid.height.shape[1] - 3)
    offs = [(0, 0), (1, 0), (0, 1), (2, 0), (0, 2),
            (1, 1), (-1, 0), (0, -1), (-2, 0), (0, -2)]
    h = _gather(grid, ix, iy)
    for dx, dy in offs[1:]:
        h = jnp.maximum(h, _gather(grid, ix + dx, iy + dy))
    return h
