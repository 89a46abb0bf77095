"""Pallas TPU kernel: fused DTC foothold-planner scoring + selection.

Replaces the XLA planner pipeline (env/planner.py, itself a re-design of
LeggedRobotDTC.post_physics_step's planner block, legged_robot_dtc.py:
124-204) for the training hot path.  The XLA form materializes several
(N, 693) and (N, 4, 693) intermediates in HBM (~0.7 ms/step at 4096
envs); here each grid program keeps one (8, 693) height block in VMEM
and runs the whole chain — gradients, roughness/edge stats, per-leg
distance scoring, argmin selection, and the tiled-table decode — in
registers, writing only the (N, 24) result (8 obs + 4x3 world targets).

Semantics match env/planner.py:27-142 term for term:
  * dx/dy use the same one-sided-at-edges / central-inside stencils with
    the identical operation order (bit-equal elementwise math),
  * the argmin is first-occurrence over the flat H index, like
    jnp.argmin (ties at the 10.0 sentinel resolve to the lowest index),
  * the foothold decode reproduces the reference's tiled-table quirk
    ( x_table[i % ny], y_table[(i // ny) % ny] ) via precomputed per-flat
    -index lane tables.
Reductions (mean/var over the scan) use a different association than the
XLA reduce, so score can differ in the last ulp; selections only change
when a score sits within float noise of the 0.1 threshold (see
tests/test_pallas_planner.py for the tolerance treatment).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ENVS_PER_PROGRAM = 8
_BIG = 1.0e9


def _build_statics(height_points, mpx, mpy, nx, ny):
    """Static per-flat-index lane tables, rows:
    0 hp_x, 1 hp_y (base-frame scan grid), 2 tx, 3 ty (tiled decode
    tables), 4 m_lo, 5 m_hi (dy edge masks), 6 lane index (float)."""
    H = nx * ny
    hp = np.asarray(height_points, dtype=np.float32)
    j = np.arange(H) % ny
    i = np.arange(H) // ny
    tx = np.asarray(mpx, dtype=np.float32)[(np.arange(H) % ny) % nx]
    ty = np.asarray(mpy, dtype=np.float32)[i % ny]
    stat = np.stack([
        hp[:, 0], hp[:, 1], tx, ty,
        (j == 0).astype(np.float32), (j == ny - 1).astype(np.float32),
        np.arange(H, dtype=np.float32),
    ]).astype(np.float32)                                   # (7, H)
    return stat


def _kernel(ny: int, spacing: float,
            scal_ref, h_ref, stat_ref, out_ref):
    E = ENVS_PER_PROGRAM
    h = h_ref[...]                                          # (E, H) f32
    H = h.shape[1]
    bx = scal_ref[:, 0:1]
    by = scal_ref[:, 1:2]
    bz = scal_ref[:, 2:3]
    cy = scal_ref[:, 3:4]
    sy = scal_ref[:, 4:5]

    rel = h - bz
    exception = (rel > 1.0) | (rel < -1.0)
    g = jnp.clip(rel, -0.5, 0.5)

    # --- gradients: same stencils/op-order as planner.py:70-83 ----------
    s = spacing
    dx = jnp.concatenate(
        [(g[:, ny:2 * ny] - g[:, :ny]) / s,
         (g[:, 2 * ny:] - g[:, :-2 * ny]) / (2 * s),
         (g[:, -ny:] - g[:, -2 * ny:-ny]) / s], axis=1)
    up = jnp.concatenate([g[:, 1:], g[:, -1:]], axis=1)
    dn = jnp.concatenate([g[:, :1], g[:, :-1]], axis=1)
    m_lo = stat_ref[4:5, :] > 0.5                           # (1, H)
    m_hi = stat_ref[5:6, :] > 0.5
    dy = jnp.where(m_lo, (up - g) / s,
                   jnp.where(m_hi, (g - dn) / s, (up - dn) / (2 * s)))
    slope = jnp.sqrt(dx * dx + dy * dy)
    h_mean = jnp.mean(g, axis=1, keepdims=True)
    roughness = jnp.abs(g - h_mean)
    var = jnp.mean(g * g, axis=1, keepdims=True) - h_mean * h_mean
    edge = jnp.clip(jnp.sqrt(jnp.maximum(var, 0.0)), 0.0, 0.3)
    score = 0.2 * edge + 1.0 * slope + 0.3 * roughness
    score = jnp.where(score < 0.1, score, 10.0)             # planner.py:89

    # --- world scan coords (planner.py:93-98) ---------------------------
    hpx = stat_ref[0:1, :]
    hpy = stat_ref[1:2, :]
    hwx = cy * hpx - sy * hpy + bx                          # (E, H)
    hwy = sy * hpx + cy * hpy + by

    tx = stat_ref[2:3, :]
    ty = stat_ref[3:4, :]
    lane = stat_ref[6:7, :]                                 # float lane idx
    base_score = score * 0.2
    cols = []
    world = []
    for leg in range(4):
        px = scal_ref[:, 5 + leg:6 + leg]
        py = scal_ref[:, 9 + leg:10 + leg]
        ddx = px - hwx
        ddy = py - hwy
        dis = jnp.sqrt(ddx * ddx + ddy * ddy)
        dis = jnp.where(dis < 0.16, dis, 10.0)              # planner.py:107
        total = base_score + dis * 0.8
        total = jnp.where(exception, 10.0, total)
        m = jnp.min(total, axis=1, keepdims=True)
        # first-occurrence argmin, jnp.argmin semantics (planner.py:112)
        idx = jnp.min(jnp.where(total == m, lane, _BIG), axis=1,
                      keepdims=True)                        # (E, 1) float
        sel = lane == idx                                   # (E, H)
        pick = lambda a: jnp.sum(jnp.where(sel, a, 0.0), axis=1,
                                 keepdims=True)
        cols.append((pick(jnp.broadcast_to(tx, sel.shape)),
                     pick(jnp.broadcast_to(ty, sel.shape))))
        world.append((pick(hwx), pick(hwy), pick(h)))

    out = jnp.concatenate(
        [c[0] for c in cols] + [c[1] for c in cols]
        + [w[0] for w in world] + [w[1] for w in world]
        + [w[2] for w in world], axis=1)                    # (E, 20)
    out_ref[:, :20] = out


@functools.partial(jax.jit,
                   static_argnames=("nx", "ny", "spacing", "interpret"))
def _plan_pallas(scal, heights, stat, nx: int, ny: int, spacing: float,
                 interpret: bool = False):
    N, H = heights.shape
    E = ENVS_PER_PROGRAM
    pad = (-N) % E
    if pad:
        scal = jnp.concatenate([scal, jnp.zeros((pad, 16), scal.dtype)], 0)
        heights = jnp.concatenate(
            [heights, jnp.zeros((pad, H), heights.dtype)], 0)
    n_pad = N + pad
    out = pl.pallas_call(
        functools.partial(_kernel, ny, spacing),
        grid=(n_pad // E,),
        in_specs=[
            pl.BlockSpec((E, 16), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, H), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, H), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((E, 24), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 24), jnp.float32),
        interpret=interpret,
    )(scal, heights, stat)
    return out[:N]


def plan_footholds_fused(cfg, base_pos, base_quat, base_lin_vel, commands,
                         hip_positions, measured_heights, height_points,
                         measured_points_x, measured_points_y,
                         interpret: bool = False):
    """Kernel-backed plan_footholds (training path: no debug outputs).

    Same contract as planner.plan_footholds minus the debug-only fields
    (heights_world / foothold_score); returns dict(foothold_obs (N, 8),
    optimal_footholds_world (N, 4, 3), pred_footholds (N, 4, 3))."""
    from ..ops import quat as qm
    from . import planner as xplanner

    N = base_pos.shape[0]
    nx = len(measured_points_x)
    ny = len(measured_points_y)

    # nominal footholds (tiny, XLA): planner.py:49-59
    hip_to_base = hip_positions - base_pos[:, None, :]
    p_shoulder = base_pos[:, None, :] + xplanner.rotate_positions_z(
        hip_to_base, commands[:, 2])
    cmd_lin_vel = jnp.concatenate(
        [commands[:, :2], jnp.zeros((N, 1), dtype=commands.dtype)], axis=1)
    v = base_lin_vel[:, None, :]
    pred = p_shoulder + cfg.dt / 2.0 * v + 0.03 * (v - cmd_lin_vel[:, None, :])

    cy, sy = qm.yaw_rot2d(base_quat)
    scal = jnp.concatenate(
        [base_pos, cy[:, None], sy[:, None],
         pred[:, :, 0], pred[:, :, 1], jnp.zeros((N, 3), base_pos.dtype)],
        axis=1)                                             # (N, 16)

    # trace-time numpy (~700 floats); becomes an XLA constant
    stat = jnp.asarray(_build_statics(
        np.asarray(height_points), measured_points_x, measured_points_y,
        nx, ny))
    out = _plan_pallas(scal, measured_heights, stat,
                       nx=nx, ny=ny, spacing=0.05, interpret=interpret)
    foothold_obs = out[:, :8]
    optimal = jnp.stack([out[:, 8:12], out[:, 12:16], out[:, 16:20]],
                        axis=-1)                            # (N, 4, 3)
    return dict(foothold_obs=foothold_obs,
                optimal_footholds_world=optimal,
                pred_footholds=pred)
