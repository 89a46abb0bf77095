"""DTC foothold planner golden tests on synthetic heightfields."""
import numpy as np

import jax.numpy as jnp

from deep_tracking_control_tpu.env import planner
from deep_tracking_control_tpu.tasks.registry import get_cfgs

TASK, _ = get_cfgs("lite3_dtc")
MPX = TASK.terrain.measured_points_x
MPY = TASK.terrain.measured_points_y
H = len(MPX) * len(MPY)


def _height_points():
    gx, gy = np.meshgrid(np.asarray(MPX), np.asarray(MPY), indexing="ij")
    return np.stack([gx.flatten(), gy.flatten(),
                     np.zeros_like(gx.flatten())], axis=1).astype(np.float32)


def _inputs(N=2, yaw_cmd=0.0, vel=(0.0, 0.0, 0.0)):
    base_pos = np.tile([0.0, 0.0, 0.32], (N, 1)).astype(np.float32)
    base_quat = np.tile([0, 0, 0, 1.0], (N, 1)).astype(np.float32)
    base_lin_vel = np.tile(vel, (N, 1)).astype(np.float32)
    commands = np.zeros((N, 4), dtype=np.float32)
    commands[:, 2] = yaw_cmd
    # hips at the four shoulder x/y (Lite3 hip origins +- thigh offset)
    hips = np.tile(np.array([[0.1745, 0.1594, 0.1],
                             [0.1745, -0.1594, 0.1],
                             [-0.1745, 0.1594, 0.1],
                             [-0.1745, -0.1594, 0.1]], dtype=np.float32),
                   (N, 1, 1))
    heights = np.zeros((N, H), dtype=np.float32)
    return base_pos, base_quat, base_lin_vel, commands, hips, heights


def _run(heights=None, vel=(0, 0, 0), yaw_cmd=0.0):
    bp, bq, bv, cmd, hips, h0 = _inputs(vel=vel, yaw_cmd=yaw_cmd)
    h = h0 if heights is None else heights
    return planner.plan_footholds(
        TASK, jnp.asarray(bp), jnp.asarray(bq), jnp.asarray(bv),
        jnp.asarray(cmd), jnp.asarray(hips), jnp.asarray(h),
        _height_points(), MPX, MPY)


def test_flat_terrain_selects_near_nominal():
    """On flat ground (score ~0 everywhere) the argmin must pick the scan
    point nearest each nominal foothold."""
    out = _run()
    pred = np.asarray(out["pred_footholds"])            # (N,4,3)
    opt = np.asarray(out["optimal_footholds_world"])    # (N,4,3)
    # nominal = shoulder position at zero velocity (p_symmetric = 0)
    np.testing.assert_allclose(pred[0, 0, :2], [0.1745, 0.1594], atol=1e-5)
    # chosen world point within half a grid cell (0.025) of the nominal
    d = np.linalg.norm(opt[..., :2] - pred[..., :2], axis=-1)
    assert np.all(d <= 0.05 * np.sqrt(2) / 2 + 1e-5), d


def test_symmetry_term_shifts_forward():
    """Forward velocity shifts the prediction forward (Raibert symmetry):
    p_symmetric = (t_stance/2) v + 0.03 (v - v_cmd) (dtc.py:107-115)."""
    v = 1.0
    out = _run(vel=(v, 0, 0))
    pred = np.asarray(out["pred_footholds"])
    t_stance = TASK.dt
    expect_dx = t_stance / 2 * v + 0.03 * v    # cmd = 0
    np.testing.assert_allclose(pred[0, :, 0] - [0.1745, 0.1745, -0.1745, -0.1745],
                               expect_dx, atol=1e-5)


def test_high_cost_region_avoided():
    """Raise a rough bump at the nominal FL foothold: planner must choose a
    point farther away but smooth."""
    bp, bq, bv, cmd, hips, heights = _inputs()
    hp = _height_points()
    # a 0.4 m pedestal around the FL nominal foothold: large roughness
    # (|h - mean| > 1/3) drives the terrain score above the 0.1 cut (:148)
    near = (np.abs(hp[:, 0] - 0.1745) < 0.08) & (np.abs(hp[:, 1] - 0.1594) < 0.08)
    bump = 0.4 * near
    heights = heights + bump[None, :].astype(np.float32)
    out = planner.plan_footholds(
        TASK, jnp.asarray(bp), jnp.asarray(bq), jnp.asarray(bv),
        jnp.asarray(cmd), jnp.asarray(hips), jnp.asarray(heights),
        hp, MPX, MPY)
    opt = np.asarray(out["optimal_footholds_world"])[0, 0]
    # the chosen FL foothold is NOT inside the bumpy square
    inside = (abs(opt[0] - 0.1745) < 0.08) and (abs(opt[1] - 0.1594) < 0.08)
    flat_here = abs(opt[2]) < 1e-6
    assert flat_here or not inside, f"picked bumpy point {opt}"


def test_foothold_obs_encoding():
    """foothold_obs = (x_table[i%21], y_table[(i//21)%21]) — the reference's
    tiled-gather decode (legged_robot_dtc.py:184-195)."""
    out = _run()
    score = np.asarray(out["foothold_score"])[0]       # (H,4)
    idx = np.argmin(score, axis=0)
    obs = np.asarray(out["foothold_obs"])[0]
    ny = len(MPY)
    for leg in range(4):
        i = idx[leg]
        assert obs[leg] == np.float32(MPX[i % ny % len(MPX)]) or \
            np.isclose(obs[leg], MPX[(i % ny)])
        np.testing.assert_allclose(obs[4 + leg], MPY[(i // ny) % ny], atol=1e-6)


def test_yaw_command_rotates_shoulders():
    out0 = _run(yaw_cmd=0.0)
    out1 = _run(yaw_cmd=0.5)
    p0 = np.asarray(out0["pred_footholds"])[0, 0]
    p1 = np.asarray(out1["pred_footholds"])[0, 0]
    # rotating hip-to-base by 0.5 rad about z
    c, s = np.cos(0.5), np.sin(0.5)
    want = np.array([c * p0[0] - s * p0[1], s * p0[0] + c * p0[1]])
    np.testing.assert_allclose(p1[:2], want, atol=1e-5)
