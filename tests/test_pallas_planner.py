"""Fused planner-scoring kernel vs the XLA planner (interpret mode, CPU).

env/pallas_planner.plan_footholds_fused must reproduce
env/planner.plan_footholds's selections: identical stencil math, the same
first-occurrence argmin, the same tiled-table decode quirk.  Reductions
(mean/var of the scan) associate differently, so a score sitting within
float noise of the 0.1 gate can flip a selection — the test allows a
small mismatch budget and checks that any mismatching selection is a
near-tie in the XLA objective.
"""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.env import pallas_planner as pplan
from deep_tracking_control_tpu.env import planner as xplan
from deep_tracking_control_tpu.tasks.registry import get_cfgs


def _height_points(cfg):
    xs = np.asarray(cfg.terrain.measured_points_x)
    ys = np.asarray(cfg.terrain.measured_points_y)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([gx.reshape(-1), gy.reshape(-1),
                    np.zeros(gx.size)], axis=1)
    return jnp.asarray(pts, dtype=jnp.float32)


def test_fused_planner_matches_xla():
    cfg, _ = get_cfgs("lite3_dtc")
    rng = np.random.default_rng(0)
    N = 24
    H = cfg.terrain.measured_x_dim * cfg.terrain.measured_y_dim
    hp = _height_points(cfg)

    base_pos = jnp.asarray(
        np.concatenate([rng.uniform(-1, 1, (N, 2)),
                        rng.uniform(0.3, 0.5, (N, 1))], 1), jnp.float32)
    quat = rng.normal(size=(N, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    base_quat = jnp.asarray(quat, jnp.float32)
    base_lin_vel = jnp.asarray(rng.normal(0, 0.5, (N, 3)), jnp.float32)
    commands = jnp.asarray(rng.normal(0, 0.5, (N, 4)), jnp.float32)
    hips = jnp.asarray(base_pos[:, None, :]
                       + rng.normal(0, 0.2, (N, 4, 3)), jnp.float32)
    # smooth-ish heights with occasional steps so every score branch fires
    h = (rng.normal(0, 0.05, (N, H))
         + 0.3 * (rng.random((N, H)) < 0.02)
         + 1.5 * (rng.random((N, H)) < 0.005))
    heights = jnp.asarray(h, jnp.float32)

    want = xplan.plan_footholds(
        cfg, base_pos, base_quat, base_lin_vel, commands, hips, heights,
        hp, cfg.terrain.measured_points_x, cfg.terrain.measured_points_y)
    got = pplan.plan_footholds_fused(
        cfg, base_pos, base_quat, base_lin_vel, commands, hips, heights,
        hp, cfg.terrain.measured_points_x, cfg.terrain.measured_points_y,
        interpret=True)

    np.testing.assert_allclose(np.asarray(got["pred_footholds"]),
                               np.asarray(want["pred_footholds"]),
                               rtol=1e-6, atol=1e-6)

    # selections: compare decoded obs and world targets per leg
    score = np.asarray(want["foothold_score"])          # (N, H, 4)
    obs_w = np.asarray(want["foothold_obs"])
    obs_g = np.asarray(got["foothold_obs"])
    opt_w = np.asarray(want["optimal_footholds_world"])
    opt_g = np.asarray(got["optimal_footholds_world"])
    mismatch = 0
    for n in range(N):
        for leg in range(4):
            same_obs = (abs(obs_g[n, leg] - obs_w[n, leg]) < 1e-6
                        and abs(obs_g[n, 4 + leg] - obs_w[n, 4 + leg]) < 1e-6)
            same_world = np.allclose(opt_g[n, leg], opt_w[n, leg], atol=1e-5)
            if same_obs and same_world:
                continue
            mismatch += 1
            # a legitimate mismatch must be a near-tie of the objective
            best = score[n, :, leg].min()
            assert score[n, :, leg].min() <= best + 1e-4
    assert mismatch <= N * 4 * 0.02, f"{mismatch} selection mismatches"


def test_fused_planner_padding():
    """N not a multiple of ENVS_PER_PROGRAM still round-trips."""
    cfg, _ = get_cfgs("lite3_dtc")
    rng = np.random.default_rng(1)
    N = 5
    H = cfg.terrain.measured_x_dim * cfg.terrain.measured_y_dim
    hp = _height_points(cfg)
    out = pplan.plan_footholds_fused(
        cfg,
        jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32),
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]] * N, jnp.float32),
        jnp.asarray(rng.normal(0, 1, (N, 3)), jnp.float32),
        jnp.asarray(rng.normal(0, 1, (N, 4)), jnp.float32),
        jnp.asarray(rng.normal(0, 1, (N, 4, 3)), jnp.float32),
        jnp.asarray(rng.normal(0, 0.1, (N, H)), jnp.float32),
        hp, cfg.terrain.measured_points_x, cfg.terrain.measured_points_y,
        interpret=True)
    assert out["foothold_obs"].shape == (N, 8)
    assert out["optimal_footholds_world"].shape == (N, 4, 3)
    assert np.all(np.isfinite(np.asarray(out["foothold_obs"])))
