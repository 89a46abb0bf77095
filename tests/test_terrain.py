"""Terrain generator + grid query tests."""
import numpy as np

import jax.numpy as jnp

from deep_tracking_control_tpu.env.config import TerrainCfg
from deep_tracking_control_tpu.terrain import grid as tgrid
from deep_tracking_control_tpu.terrain.generator import (
    SubTerrain, Terrain, gap_terrain, pyramid_sloped_terrain,
    pyramid_stairs_terrain, stepping_stones_terrain)


def _sub(hs=0.05):
    return SubTerrain(width=160, length=160, vertical_scale=0.005,
                      horizontal_scale=hs)


def test_world_shapes_and_origins():
    cfg = TerrainCfg(num_rows=3, num_cols=2, border_size=5.0)
    t = Terrain(cfg, seed=0)
    lpx = int(cfg.terrain_length / cfg.horizontal_scale)
    assert t.height_field_raw.shape == (3 * lpx + 2 * t.border,
                                        2 * lpx + 2 * t.border)
    assert t.env_origins.shape == (3, 2, 3)
    # origins at tile centers (terrain.py:153-154)
    np.testing.assert_allclose(t.env_origins[0, 0, :2], [4.0, 4.0])
    np.testing.assert_allclose(t.env_origins[2, 1, :2], [20.0, 12.0])


def test_determinism():
    cfg = TerrainCfg(num_rows=2, num_cols=2, border_size=2.0)
    a = Terrain(cfg, seed=7).height_field_raw
    b = Terrain(cfg, seed=7).height_field_raw
    c = Terrain(cfg, seed=8).height_field_raw
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_pyramid_slope_monotone():
    rng = np.random.default_rng(0)
    t = pyramid_sloped_terrain(_sub(), rng, slope=0.4, platform_size=3.0)
    h = t.height_field_raw
    # height increases toward the center (outside the platform)
    assert h[80, 80] == h.max()
    assert h[0, 0] == 0
    assert h[40, 80] < h[70, 80] or h[40, 80] <= h.max()


def test_stairs_step_heights():
    rng = np.random.default_rng(0)
    t = pyramid_stairs_terrain(_sub(), rng, step_width=0.31, step_height=0.1,
                               platform_size=3.0)
    h = t.height_field_raw
    levels = np.unique(h)
    step = int(0.1 / 0.005)
    diffs = np.diff(levels)
    assert np.all(diffs == step)


def test_stepping_stones_has_holes_and_platform():
    rng = np.random.default_rng(0)
    t = stepping_stones_terrain(_sub(), rng, stone_size=0.6,
                                stone_distance=0.06, max_height=0.0,
                                platform_size=1.0, depth=-2.0)
    h = t.height_field_raw
    depth = int(-2.0 / 0.005)
    assert (h == depth).any(), "no holes"
    assert h[80, 80] == 0, "center platform missing"


def test_gap_ring():
    rng = np.random.default_rng(0)
    t = gap_terrain(_sub(), rng, gap_size=0.5, platform_size=1.0)
    h = t.height_field_raw
    assert h[80, 80] == 0
    assert (h == -1000).any()


def test_grid_queries_match_numpy():
    cells = 64
    hs = 0.05
    rng = np.random.default_rng(0)
    hf = rng.normal(0, 0.1, (cells, cells)).astype(np.float32)
    grid = tgrid.TerrainGrid(jnp.asarray(hf), hs, border_size=cells * hs / 2,
                             is_plane=False)
    # min3 parity with the reference sampling (legged_robot.py:1303-1315)
    xs = np.array([0.0, 0.3, -0.5])
    ys = np.array([0.1, -0.2, 0.4])
    got = np.asarray(tgrid.height_min3(grid, jnp.asarray(xs), jnp.asarray(ys)))
    for k in range(3):
        px = int((xs[k] + grid.border_size) / hs)
        py = int((ys[k] + grid.border_size) / hs)
        px = np.clip(px, 0, cells - 2)
        py = np.clip(py, 0, cells - 2)
        want = min(hf[px, py], hf[px + 1, py], hf[px, py + 1])
        np.testing.assert_allclose(got[k], want, atol=1e-6)


def test_bilinear_interpolation_exact_on_plane():
    # a planar heightfield must be reproduced exactly with exact gradients
    cells, hs = 64, 0.05
    x = np.arange(cells) * hs
    hf = (0.2 * x[:, None] + 0.1 * x[None, :]).astype(np.float32)
    grid = tgrid.TerrainGrid(jnp.asarray(hf), hs, border_size=0.0,
                             is_plane=False)
    xq = jnp.asarray([0.512, 1.003, 2.25])
    yq = jnp.asarray([0.771, 0.5, 1.11])
    h, dx, dy, hmx = tgrid.height_and_slope(grid, xq, yq)
    np.testing.assert_allclose(np.asarray(h),
                               0.2 * np.asarray(xq) + 0.1 * np.asarray(yq),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx), 0.2, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy), 0.1, atol=1e-5)


def test_native_backend_structural_parity():
    """C++ generator (native/terrain_gen.cpp) produces the same world
    structure as the Python backend: shapes, origins xy, deterministic per
    seed, comparable tile statistics (independent RNG streams, so values
    differ but distributions must agree)."""
    from deep_tracking_control_tpu import native
    if not native.available():
        import pytest
        pytest.skip("native toolchain unavailable")
    cfg = TerrainCfg(num_rows=3, num_cols=2, border_size=5.0, curriculum=True)
    tn = Terrain(cfg, seed=3, backend="native")
    tp = Terrain(cfg, seed=3, backend="python")
    assert tn.backend == "native"
    assert tn.height_field_raw.shape == tp.height_field_raw.shape
    np.testing.assert_allclose(tn.env_origins[..., :2], tp.env_origins[..., :2])
    # determinism per seed
    tn2 = Terrain(cfg, seed=3, backend="native")
    assert np.array_equal(tn.height_field_raw, tn2.height_field_raw)
    # curriculum tiles are the same TYPES: stair rows must contain stairs etc.
    # compare per-tile value ranges loosely
    b = tn.border
    lpx = int(cfg.terrain_length / cfg.horizontal_scale)
    for i in range(cfg.num_rows):
        for j in range(cfg.num_cols):
            a = tn.height_field_raw[b + i*lpx:b+(i+1)*lpx, b + j*lpx:b+(j+1)*lpx]
            p = tp.height_field_raw[b + i*lpx:b+(i+1)*lpx, b + j*lpx:b+(j+1)*lpx]
            assert abs(int(a.max()) - int(p.max())) <= max(40, int(0.6*abs(int(p.max())))+40)


def test_selected_terrain_mode():
    """selected mode (terrain.py:64-77): one named generator fills all tiles."""
    cfg = TerrainCfg(num_rows=2, num_cols=2, border_size=2.0, curriculum=False,
                     selected=True,
                     selected_terrain_type="pyramid_stairs_terrain",
                     selected_terrain_kwargs=(("step_width", 0.31),
                                              ("step_height", 0.1),
                                              ("platform_size", 3.0)))
    t = Terrain(cfg, seed=0, backend="python")
    b = t.border
    lpx = int(cfg.terrain_length / cfg.horizontal_scale)
    step = int(0.1 / 0.005)
    for i in range(2):
        for j in range(2):
            tile = t.height_field_raw[b+i*lpx:b+(i+1)*lpx, b+j*lpx:b+(j+1)*lpx]
            levels = np.unique(tile)
            assert len(levels) > 3 and np.all(np.diff(levels) == step)


def test_selected_mode_survives_auto_backend():
    """Regression: the native backend only implements curriculum/randomized,
    so backend="auto" must route selected mode to the python generators
    (it used to silently return the default world, making every
    stepping-stone eval run on the wrong terrain)."""
    def cfg_for(stone):
        return TerrainCfg(num_rows=2, num_cols=2, border_size=2.0,
                          curriculum=False, selected=True,
                          selected_terrain_type="stepping_stones_terrain",
                          selected_terrain_kwargs=(("stone_size", stone),
                                                   ("stone_distance", 0.06),
                                                   ("max_height", 0.0),
                                                   ("platform_size", 1.0),
                                                   ("depth", -2.0)))
    t1 = Terrain(cfg_for(0.75), seed=8, backend="auto")
    t2 = Terrain(cfg_for(0.60), seed=8, backend="auto")
    assert t1.backend == "python"
    # stones worlds: gaps at depth -2 m exist, and stone size matters
    v = cfg_for(0.75).vertical_scale
    assert t1.height_field_raw.min() == int(-2.0 / v)
    assert not np.array_equal(t1.height_field_raw, t2.height_field_raw)
    import pytest
    with pytest.raises(RuntimeError):
        Terrain(cfg_for(0.75), seed=8, backend="native")


def test_stones_everywhere_wide_tile():
    """width > length takes the column-major fill branch
    (terrain.py:224-238); stones cover the tile, platform stays flat."""
    from deep_tracking_control_tpu.terrain.generator import (
        SubTerrain, stones_everywhere_terrain)
    rng = np.random.default_rng(7)
    t = SubTerrain(width=160, length=80, vertical_scale=0.005,
                   horizontal_scale=0.05)
    stones_everywhere_terrain(t, rng, stone_size=0.3, stone_distance=0.06,
                              max_height=0.05, platform_size=1.0, depth=-2.0)
    h = t.height_field_raw
    depth_cells = int(-2.0 / 0.005)
    # platform is flat zero
    assert np.all(h[77:83, 37:43] == 0)
    # holes exist at full depth and stones above them
    assert (h == depth_cells).any()
    assert (h > 0).any()
    # stones reach the far-x half (the column loop walked the width)
    assert (h[120:, :] > 0).any()
