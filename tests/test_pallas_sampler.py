"""Fused terrain-sampler kernel vs the XLA patch samplers.

terrain/pallas_sampler.sample_all must reproduce the reference sampling
semantics exactly: min3 nearest (legged_robot.py:1303-1317), max10 nearest
(:1450-1469), raw bilinear height+slope.  Interpret mode on CPU.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.env.config import TerrainCfg
from deep_tracking_control_tpu.terrain import patch as tpatch
from deep_tracking_control_tpu.terrain import pallas_sampler as psmp
from deep_tracking_control_tpu.terrain.generator import Terrain
from deep_tracking_control_tpu.terrain.grid import TerrainGrid


@pytest.fixture(scope="module")
def world():
    cfg = TerrainCfg(num_rows=2, num_cols=2, border_size=4.0)
    terr = Terrain(cfg, seed=3)
    grid = TerrainGrid(height=jnp.asarray(terr.heights_meters()),
                       horizontal_scale=cfg.horizontal_scale,
                       border_size=cfg.border_size, is_plane=False)
    m3, m10 = tpatch.pooled_tables(grid)
    src = tpatch.make_source(grid, jnp.stack([grid.height, m3, m10]))
    return grid, src, terr


def test_sample_all_matches_patch_samplers(world):
    grid, src, terr = world
    N = 8
    rng = np.random.default_rng(0)
    base = jnp.asarray(
        terr.env_origins.reshape(-1, 3)[rng.integers(0, 4, N)][:, :2]
        + rng.uniform(-0.4, 0.4, (N, 2)), dtype=jnp.float32)
    starts, origin = tpatch.patch_starts(src, base)
    patches = tpatch.extract(src, starts)

    # random queries around each base, packed into the kernel layout
    qx = base[:, 0:1] + jnp.asarray(rng.uniform(-1.0, 1.0, (N, psmp.Q_TOT)),
                                    dtype=jnp.float32)
    qy = base[:, 1:2] + jnp.asarray(rng.uniform(-1.0, 1.0, (N, psmp.Q_TOT)),
                                    dtype=jnp.float32)

    h, gx, gy = psmp.sample_all(src, starts, origin, qx, qy, interpret=True)

    hs = grid.horizontal_scale
    want_min3 = tpatch.sample_nearest(patches[1], origin, hs,
                                      qx[:, :psmp.Q_MIN3],
                                      qy[:, :psmp.Q_MIN3])
    np.testing.assert_allclose(np.asarray(h[:, :psmp.Q_MIN3]),
                               np.asarray(want_min3), atol=1e-5)

    s10 = slice(psmp.Q_MIN3, psmp.Q_MIN3 + psmp.Q_MAX10)
    want_max10 = tpatch.sample_nearest(patches[2], origin, hs,
                                       qx[:, s10], qy[:, s10])
    np.testing.assert_allclose(np.asarray(h[:, s10]),
                               np.asarray(want_max10), atol=1e-5)

    sb = slice(psmp.Q_MIN3 + psmp.Q_MAX10, psmp.Q_TOT)
    want_h, want_gx, want_gy, _ = tpatch.sample_bilinear_slope(
        patches[0], origin, hs, qx[:, sb], qy[:, sb])
    np.testing.assert_allclose(np.asarray(h[:, sb]), np.asarray(want_h),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(want_gx), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(want_gy), atol=1e-4)


def test_window_extractor_matches_patches(world):
    grid, src, terr = world
    N = 8
    rng = np.random.default_rng(1)
    base = jnp.asarray(
        terr.env_origins.reshape(-1, 3)[rng.integers(0, 4, N)][:, :2]
        + rng.uniform(-0.4, 0.4, (N, 2)), dtype=jnp.float32)
    starts, origin = tpatch.patch_starts(src, base)
    patches = tpatch.extract(src, starts)
    win = tpatch.extract_window(src, starts, 16, 40)
    np.testing.assert_array_equal(np.asarray(win),
                                  np.asarray(patches[0][:, 16:56]))
    win_i = tpatch.extract_window(src, starts, 16, 40, interpret=True)
    np.testing.assert_array_equal(np.asarray(win_i), np.asarray(win))


def test_fused_sampler_env_step(monkeypatch):
    """DTC_PALLAS_SAMPLER=1 routes the step's terrain queries through the
    fused kernel; observations match the XLA sampling path."""
    import dataclasses
    from deep_tracking_control_tpu.env.legged_env import LeggedEnv
    from deep_tracking_control_tpu.tasks.registry import get_cfgs
    task, _ = get_cfgs("lite3_dtc")
    task = dataclasses.replace(
        task,
        env=dataclasses.replace(task.env, num_envs=4),
        control=dataclasses.replace(task.control, decimation=2),
        terrain=dataclasses.replace(task.terrain, num_rows=2, num_cols=2,
                                    border_size=4.0,
                                    max_init_terrain_level=1))
    env = LeggedEnv(task)
    params, state = env.init(jax.random.PRNGKey(0))
    a = jnp.zeros((4, env.num_actions))
    k = jax.random.PRNGKey(5)
    env._pallas_interpret = True
    env._pallas_physics = True
    monkeypatch.setenv("DTC_PALLAS_SAMPLER", "0")
    s0, o0 = env.step(params, state, a, k)
    monkeypatch.setenv("DTC_PALLAS_SAMPLER", "1")
    s1, o1 = env.step(params, state, a, k)
    np.testing.assert_allclose(np.asarray(s0["measured_heights"]),
                               np.asarray(s1["measured_heights"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s0["measured_foot_clearance"]),
                               np.asarray(s1["measured_foot_clearance"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s0["planes"]),
                               np.asarray(s1["planes"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(o0["rew"]), np.asarray(o1["rew"]),
                               atol=1e-4)
