"""Patch-based matmul height sampling vs direct gather parity."""
import numpy as np

import jax.numpy as jnp

from deep_tracking_control_tpu.terrain import grid as tgrid, patch as tpatch


def _grid(cells=256, hs=0.05, seed=0):
    rng = np.random.default_rng(seed)
    hf = rng.normal(0, 0.15, (cells, cells)).astype(np.float32)
    return tgrid.TerrainGrid(jnp.asarray(hf), hs, border_size=cells * hs / 2,
                             is_plane=False)


def test_pooled_tables_match_stencils():
    grid = _grid(64)
    min3, max10 = tpatch.pooled_tables(grid)
    h = np.asarray(grid.height)
    i, j = 10, 20
    assert np.isclose(np.asarray(min3)[i, j],
                      min(h[i, j], h[i + 1, j], h[i, j + 1]))
    offs = [(0, 0), (1, 0), (0, 1), (2, 0), (0, 2),
            (1, 1), (-1, 0), (0, -1), (-2, 0), (0, -2)]
    want = max(h[i + dx, j + dy] for dx, dy in offs)
    assert np.isclose(np.asarray(max10)[i, j], want)


def test_patch_bilinear_matches_grid_query():
    grid = _grid()
    rng = np.random.default_rng(1)
    N, K = 8, 24
    base = rng.uniform(-2.0, 2.0, (N, 2)).astype(np.float32)
    src = tpatch.make_source(grid, grid.height[None])
    starts, origin = tpatch.patch_starts(src, jnp.asarray(base))
    patches = tpatch.extract(src, starts)[0]
    # query points within +-1 m of each base
    x = base[:, 0:1] + rng.uniform(-1, 1, (N, K)).astype(np.float32)
    y = base[:, 1:2] + rng.uniform(-1, 1, (N, K)).astype(np.float32)
    h, dx, dy, hmx = tpatch.sample_bilinear_slope(
        patches, origin, grid.horizontal_scale, jnp.asarray(x), jnp.asarray(y))
    h2, dx2, dy2, hmx2 = tgrid.height_and_slope(grid, jnp.asarray(x), jnp.asarray(y))
    # fp32 coordinate rounding can flip the cell at exact boundaries
    np.testing.assert_allclose(np.asarray(h), np.asarray(h2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx2), atol=2e-2)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dy2), atol=2e-2)


def test_patch_min3_matches_direct():
    grid = _grid()
    min3, _ = tpatch.pooled_tables(grid)
    rng = np.random.default_rng(2)
    N, K = 8, 64
    base = rng.uniform(-2.0, 2.0, (N, 2)).astype(np.float32)
    src = tpatch.make_source(grid, min3[None])
    starts, origin = tpatch.patch_starts(src, jnp.asarray(base))
    patches = tpatch.extract(src, starts)[0]
    x = base[:, 0:1] + rng.uniform(-1, 1, (N, K)).astype(np.float32)
    y = base[:, 1:2] + rng.uniform(-1, 1, (N, K)).astype(np.float32)
    got = tpatch.sample_nearest(patches, origin, grid.horizontal_scale,
                                jnp.asarray(x), jnp.asarray(y))
    want = tgrid.height_min3(grid, jnp.asarray(x), jnp.asarray(y))
    # bf16 sampling: heights rounded to ~0.4% relative
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-2, rtol=5e-3)


def test_patch_clamps_at_border():
    grid = _grid(128)
    # robot beyond the map corner: start clamps, queries clip into the patch
    base = jnp.asarray([[-100.0, -100.0], [100.0, 100.0]])
    src = tpatch.make_source(grid, grid.height[None])
    starts, origin = tpatch.patch_starts(src, base)
    assert np.all(np.asarray(starts) >= 0)
    patches = tpatch.extract(src, starts)[0]
    h, _, _, _ = tpatch.sample_bilinear_slope(
        patches, origin, grid.horizontal_scale,
        base[:, 0:1], base[:, 1:2])
    assert np.all(np.isfinite(np.asarray(h)))


def test_pallas_kernel_interpret_parity():
    """The Pallas DMA extraction matches the dynamic-slice fallback
    (interpret mode on CPU)."""
    from deep_tracking_control_tpu.ops.pallas_patch import (
        extract_patches_pallas)
    grid = _grid(200)
    src = tpatch.make_source(grid, grid.height[None])
    rng = np.random.default_rng(3)
    base = rng.uniform(-3.0, 3.0, (6, 2)).astype(np.float32)
    starts, origin = tpatch.patch_starts(src, jnp.asarray(base))
    want = tpatch.extract(src, starts)                 # cpu fallback
    got = extract_patches_pallas(src.blocks, starts, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
