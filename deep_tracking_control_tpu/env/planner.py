"""DTC foothold planner — pure tensor kernel fused into the env step.

Capability parity with the planner block of LeggedRobotDTC.post_physics_step
(legged_robot_dtc.py:100-204): nominal footholds from shoulder projection +
Raibert-style symmetry, terrain scoring (slope/roughness/edge), distance to
nominal, argmin selection per leg, and the 8-d foothold observation.

All arrays are env-leading (N, ...) here — this is network/obs-layer code.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import quat as qm


def rotate_positions_z(vecs, thetas):
    """Rotate (N,4,3) vectors about z by per-env angles (N,)
    (legged_robot_dtc.py:36-54)."""
    c = jnp.cos(thetas)[:, None]
    s = jnp.sin(thetas)[:, None]
    x, y, z = vecs[..., 0], vecs[..., 1], vecs[..., 2]
    return jnp.stack([c * x - s * y, s * x + c * y, z], axis=-1)


def plan_footholds(cfg, base_pos, base_quat, base_lin_vel, commands,
                   hip_positions, measured_heights, height_points,
                   measured_points_x, measured_points_y):
    """Compute the optimal-foothold observation and world targets.

    Args (env-leading):
      base_pos (N,3) world; base_quat (N,4) xyzw; base_lin_vel (N,3) BODY
      frame (matches reference use of self.base_lin_vel at
      legged_robot_dtc.py:111); commands (N,4); hip_positions (N,4,3) world
      thigh positions (thigh_indices bodies, legged_robot_dtc.py:100);
      measured_heights (N,H) world-z at the scan points; height_points (H,3)
      base-frame scan grid; measured_points_x/y: static tuples.

    Returns dict(foothold_obs (N,8), optimal_footholds_world (N,4,3),
                 foothold_score (N,H,4), heights_world (N,H,3),
                 pred_footholds (N,4,3)).
    """
    N = base_pos.shape[0]
    H = measured_heights.shape[1]
    nx = len(measured_points_x)
    ny = len(measured_points_y)

    # --- nominal footholds (legged_robot_dtc.py:103-115)
    hip_to_base = hip_positions - base_pos[:, None, :]
    yaw_vel_cmd = commands[:, 2]
    p_shoulder = base_pos[:, None, :] + rotate_positions_z(hip_to_base, yaw_vel_cmd)
    t_stance = cfg.dt                      # sim.dt * decimation (:107)
    fdbk_gain_k = 0.03
    cmd_lin_vel = jnp.concatenate(
        [commands[:, :2], jnp.zeros((N, 1), dtype=commands.dtype)], axis=1)
    v = base_lin_vel[:, None, :]
    p_symmetric = t_stance / 2.0 * v + fdbk_gain_k * (v - cmd_lin_vel[:, None, :])
    pred_footholds = p_shoulder + p_symmetric          # (N,4,3)

    # --- terrain scoring (legged_robot_dtc.py:124-148)
    # FLAT (N, H) layout throughout: the (N, 33, 21) grid view would put
    # 21 in the 128-lane minor dim; gradients run as lane shifts with
    # static boundary masks (same central-inside/one-sided-at-edges
    # semantics as torch.gradient / jnp.gradient)
    rel = measured_heights - base_pos[:, 2:3]          # (N, H)
    exception = (rel > 1.0) | (rel < -1.0)
    g = jnp.clip(rel, -0.5, 0.5)
    spacing = 0.05                                     # (:134 note)
    # d/dx: neighbor rows are +-ny in the flat index
    dx = jnp.concatenate(
        [(g[:, ny:2 * ny] - g[:, :ny]) / spacing,
         (g[:, 2 * ny:] - g[:, :-2 * ny]) / (2 * spacing),
         (g[:, -ny:] - g[:, -2 * ny:-ny]) / spacing], axis=1)
    # d/dy: neighbor cols are +-1, with one-sided edges at each j=0 / j=ny-1
    up = jnp.concatenate([g[:, 1:], g[:, -1:]], axis=1)
    dn = jnp.concatenate([g[:, :1], g[:, :-1]], axis=1)
    j = np.arange(H) % ny
    m_lo = jnp.asarray(j == 0)
    m_hi = jnp.asarray(j == ny - 1)
    dy = jnp.where(m_lo, (up - g) / spacing,
                   jnp.where(m_hi, (g - dn) / spacing,
                             (up - dn) / (2 * spacing)))
    slope = jnp.sqrt(dx * dx + dy * dy)
    h_mean = jnp.mean(g, axis=1, keepdims=True)
    roughness = jnp.abs(g - h_mean)
    edge = jnp.clip(jnp.sqrt(jnp.var(g, axis=1)), 0.0, 0.3)
    score = 0.2 * edge[:, None] + 1.0 * slope + 0.3 * roughness
    score = jnp.where(score < 0.1, score, 10.0)        # (:148)

    # --- world-frame scan points (:152-156) — component-plane (N, H) math
    # (a (N, H, 3) layout would put the 3-vector in the 128-lane minor dim)
    hp = jnp.asarray(height_points, dtype=base_pos.dtype)   # (H, 3) static
    cy, sy = qm.yaw_rot2d(base_quat)                        # (N,)
    hw_x = (cy[:, None] * hp[None, :, 0] - sy[:, None] * hp[None, :, 1]
            + base_pos[:, 0:1])                             # (N, H)
    hw_y = (sy[:, None] * hp[None, :, 0] + cy[:, None] * hp[None, :, 1]
            + base_pos[:, 1:2])
    heights_world = jnp.stack([hw_x, hw_y, measured_heights], axis=-1)

    # --- distance to nominal per leg (:158-170)
    # leg-leading (N,4,H) layout: H=693 rides the 128-lane minor dim (the
    # reference's (N,H,4) layout would leave 124/128 lanes idle on TPU)
    dx = pred_footholds[:, :, None, 0] - hw_x[:, None, :]
    dy = pred_footholds[:, :, None, 1] - hw_y[:, None, :]
    dis = jnp.sqrt(dx * dx + dy * dy)                  # (N,4,H)
    dis = jnp.where(dis < 0.16, dis, 10.0)
    total = score[:, None, :] * 0.2 + dis * 0.8
    total = jnp.where(exception[:, None, :], 10.0, total)

    # --- argmin per leg (ktop=1, :179-201)
    opt_idx = jnp.argmin(total, axis=2)                # (N,4)
    x_idx = jnp.remainder(opt_idx, ny)                 # (:184) column index
    y_idx = opt_idx // ny                              # (:185) row index
    mpx = jnp.asarray(measured_points_x, dtype=base_pos.dtype)
    mpy = jnp.asarray(measured_points_y, dtype=base_pos.dtype)
    # Reference-parity quirk (legged_robot_dtc.py:184-192): the flat index is
    # decoded as x <- remainder(i, y_dim), y <- i // y_dim, and the lookup
    # tables are expanded with torch.repeat — which TILES them — so the
    # y gather of indices up to 32 wraps modulo the 21-entry table.  The
    # observation the policy actually sees is therefore
    #   ( x_table[i % 21], y_table[(i // 21) % 21] ),
    # reproduced here bit-for-bit rather than "fixed".
    decoded_x = jnp.take(mpx, x_idx % nx)
    decoded_y = jnp.take(mpy, y_idx % ny)
    foothold_obs = jnp.concatenate([decoded_x, decoded_y], axis=1)  # (N,8)

    # per-component gathers keep the (N, H, 3) stack debug-only (DCE'd in
    # training; plan["heights_world"] is consumed by debug_viz alone)
    optimal_footholds_world = jnp.stack(
        [jnp.take_along_axis(hw_x, opt_idx, axis=1),
         jnp.take_along_axis(hw_y, opt_idx, axis=1),
         jnp.take_along_axis(measured_heights, opt_idx, axis=1)],
        axis=-1)                                       # (N,4,3)

    return dict(foothold_obs=foothold_obs,
                optimal_footholds_world=optimal_footholds_world,
                # public contract stays (N,H,4); the transpose only
                # materializes on the debug-viz path
                foothold_score=jnp.swapaxes(total, 1, 2),
                heights_world=heights_world,
                pred_footholds=pred_footholds)
