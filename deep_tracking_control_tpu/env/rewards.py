"""Reward terms — vectorized parity with the reference's reward stack.

Sources: legged_robot.py:1320-1622 (base terms; where a term is defined
twice the LAST definition wins in a Python class body, so `pos_acc`
:1600, `powerchange` :1613 and `action_rate` :1620 are the live ones) and
legged_robot_dtc.py:522-586 (DTC terms, which shadow base versions).

Each term is fn(ctx) -> (N,), where ctx is a dict of step quantities
(env-leading layout).  Stateful terms (feet_air_time, foot_clearance's
stumble ring buffer, orientation's pitch filter) read previous-state fields
from ctx and write updates into ctx["updates"].

Term selection happens at TRACE time from the nonzero scales
(`_prepare_reward_function` parity, legged_robot.py:929-948); scales are
multiplied by dt (:939) by the caller.
"""
from __future__ import annotations

import jax.numpy as jnp


def _sq(x):
    return jnp.square(x)


# ---- plane-fit orientation helpers (legged_robot.py:1535-1596) -------------

def _plane_norm(ctx):
    # X = pinv(A) @ heights with A = [x, y, 1] rows over the scan grid; the
    # pinv is a constant (3,H) matrix precomputed by the env (ctx["plane_pinv"])
    X = ctx["measured_heights"] @ ctx["plane_pinv"].T          # (N,3)
    plane = jnp.stack([X[:, 0], X[:, 1], -jnp.ones_like(X[:, 0])], axis=1)
    return plane / jnp.linalg.norm(plane, axis=-1, keepdims=True)


def _orientation_common(ctx):
    from ..ops import quat as qm
    p_norm = -_plane_norm(ctx)
    pitch_est = jnp.arctan(p_norm[:, 0])
    roll_est = -jnp.arctan(p_norm[:, 1])
    pitch_clip = jnp.where((pitch_est >= -0.1) & (pitch_est <= 0.1), 0.0, pitch_est)
    roll_clip = jnp.where((roll_est >= -0.1) & (roll_est <= 0.1), 0.0, roll_est)
    new_pitch = ctx["pitch_est"] * 0.2 + 0.8 * pitch_clip
    ctx["updates"]["pitch_est"] = new_pitch
    quat = qm.quat_from_euler_xyz(roll_clip, new_pitch, jnp.zeros_like(roll_clip))
    gvec = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), quat[..., :3].shape)
    return qm.quat_rotate_inverse(quat, gvec)


def reward_orientation(ctx):
    p_local = _orientation_common(ctx)
    return jnp.sum(_sq(ctx["projected_gravity"][:, :1] - p_local[:, :1]), axis=1)


def reward_orientation_roll(ctx):
    p_local = _orientation_common(ctx)
    return jnp.abs(ctx["projected_gravity"][:, 1] - p_local[:, 1])


# ---- base terms -------------------------------------------------------------

def reward_lin_vel_z(ctx):
    return _sq(ctx["base_lin_vel"][:, 2])


def reward_ang_vel_xy(ctx):
    return jnp.sum(_sq(ctx["base_ang_vel"][:, :2]), axis=1)


def reward_torques(ctx):
    return jnp.sum(_sq(ctx["torques"]), axis=1)


def reward_dof_vel(ctx):
    return jnp.sum(_sq(ctx["dof_vel"]), axis=1)


def reward_dof_acc(ctx):
    return jnp.sum(_sq((ctx["last_dof_vel"] - ctx["dof_vel"]) / ctx["dt"]), axis=1)


def reward_action_rate(ctx):
    return jnp.sum(_sq(ctx["last_actions"] - ctx["actions"]), axis=1)


def reward_collision(ctx):
    cf = ctx["contact_forces"][:, ctx["penalised_idx"]]        # (N,K,3)
    return jnp.sum(1.0 * (jnp.linalg.norm(cf, axis=-1) > 0.1), axis=1)


def reward_termination(ctx):
    return (ctx["reset_buf"] & ~ctx["time_out_buf"]).astype(jnp.float32)


def reward_dof_pos_limits(ctx):
    q = ctx["dof_pos"]
    lo, hi = ctx["soft_dof_pos_limits"]
    out = -jnp.clip(q - lo, None, 0.0) + jnp.clip(q - hi, 0.0, None)
    return jnp.sum(out, axis=1)


def reward_dof_vel_limits(ctx):
    lim = ctx["dof_vel_limit"] * ctx["soft_dof_vel_limit"]
    return jnp.sum(jnp.clip(jnp.abs(ctx["dof_vel"]) - lim, 0.0, 1.0), axis=1)


def reward_torque_limits(ctx):
    lim = ctx["torque_limit"] * ctx["soft_torque_limit"]
    return jnp.sum(jnp.clip(jnp.abs(ctx["torques"]) - lim, 0.0, None), axis=1)


def reward_tracking_lin_vel(ctx):
    err = jnp.sum(_sq((ctx["commands"][:, :2] - ctx["base_lin_vel"][:, :2])
                      / ctx["lin_vel_x_max"]), axis=1)
    return jnp.exp(-err / ctx["tracking_sigma"])


def reward_tracking_ang_vel(ctx):
    err = _sq(ctx["commands"][:, 2] - ctx["base_ang_vel"][:, 2])
    return jnp.exp(-err / ctx["tracking_sigma"])


def reward_feet_air_time(ctx):
    """Stateful: reads/updates feet_air_time (legged_robot.py:1386-1414).

    By this point in the step, last_contacts was already set to the current
    contact in the callback stage (legged_robot.py:562-564), so the local
    contact_filt here equals the instantaneous contact mask.
    """
    contact = ctx["feet_contact"]                     # (N,4) bool, cf_z > 1
    contact_filt = contact | ctx["last_contacts"]
    air = ctx["feet_air_time"]
    first_contact = (air > 0.0) & contact_filt
    air = air + ctx["dt"]
    rew = jnp.sum((air - 0.5) * first_contact, axis=1)
    rew = rew * (jnp.linalg.norm(ctx["commands"][:, :2], axis=1) > 0.1)
    ctx["updates"]["feet_air_time"] = air * ~contact_filt
    return rew


def reward_stumble(ctx):
    cf = ctx["contact_forces"][:, ctx["feet_idx"]]
    return jnp.any(jnp.linalg.norm(cf[:, :, :2], axis=2)
                   > 5.0 * jnp.abs(cf[:, :, 2]), axis=1).astype(jnp.float32)


def reward_stand_still(ctx):
    return (jnp.sum(jnp.abs(ctx["dof_pos"] - ctx["default_dof_pos"]), axis=1)
            * (jnp.linalg.norm(ctx["commands"][:, :2], axis=1) < 0.1))


def reward_feet_contact_forces(ctx):
    cf = ctx["contact_forces"][:, ctx["feet_idx"]]
    return jnp.sum(jnp.clip(jnp.linalg.norm(cf, axis=-1)
                            - ctx["max_contact_force"], 0.0, None), axis=1)


def reward_power(ctx):
    return jnp.sum(jnp.clip(ctx["torques"] * ctx["dof_vel"], 0.0, None), axis=1)


def reward_smooth(ctx):
    return jnp.sum(_sq(ctx["actions"] - 2.0 * ctx["last_actions"]
                       + ctx["last_actions_2"]), axis=1)


def reward_foot_clearance(ctx):
    """Stateful via the 5-deep stumble ring buffer (legged_robot.py:1474-1492)."""
    cf = ctx["contact_forces"][:, ctx["feet_idx"]]
    stumb = (jnp.linalg.norm(cf[:, :, :2], axis=2)
             > 4.0 * jnp.abs(cf[:, :, 2]))                       # (N,4)
    buf = ctx["stumb_buffer"]                                    # (N,5,4)
    buf = jnp.concatenate([buf[:, 1:], stumb[:, None, :]], axis=1)
    ctx["updates"]["stumb_buffer"] = buf
    flag = jnp.any(buf, axis=1)
    clear = ctx["measured_foot_clearance"]
    return jnp.sum((~flag) * (clear > 0.18), axis=1).astype(jnp.float32)


def reward_feet_slip(ctx):
    contact = ctx["feet_contact"]
    contact_filt = contact | ctx["last_contacts"]
    fv = _sq(jnp.linalg.norm(ctx["foot_velocities"][:, :, 0:2], axis=2))
    return jnp.sum(contact_filt * fv, axis=1)


def reward_hip_pos(ctx):
    return jnp.sum(_sq(ctx["dof_pos"][:, ctx["hip_dof_idx"]]), axis=1)


def reward_powerchange(ctx):
    smooth_co = jnp.clip(ctx["commands"][:, 0], 1.0, None)
    p = jnp.sum(jnp.clip(ctx["torques"] * ctx["dof_vel"], 0.0, None), axis=1)
    return _sq(p / (ctx["robot_mass"] * 9.815 * smooth_co))


def reward_pos_acc(ctx):
    pts = ctx["acc_points"]                                      # (8,3) static
    v = ctx["base_lin_vel"][:, None, :]
    w = ctx["base_ang_vel"][:, None, :]
    pv = v + jnp.cross(jnp.broadcast_to(w, (w.shape[0], 8, 3)),
                       jnp.broadcast_to(pts, (w.shape[0], 8, 3)))
    return jnp.sum(_sq(jnp.linalg.norm(pv, axis=-1)), axis=1)


def reward_foot_acc(ctx):
    mask = jnp.where(ctx["terrain_levels"] > 5, 0.2, 1.0)[:, None]
    acc = jnp.linalg.norm(
        (ctx["last_foot_velocities"] - ctx["foot_velocities"]) / ctx["dt"],
        axis=-1)
    return jnp.sum(jnp.clip(mask * (acc - ctx["max_acc"]), 0.0, None), axis=1)


# ---- DTC terms (legged_robot_dtc.py:522-586) --------------------------------

def reward_big_pitch(ctx):
    return jnp.sum(jnp.abs(ctx["projected_gravity"][:, 0:1]) > 0.6,
                   axis=1).astype(jnp.float32)


def reward_feet_stumble(ctx):
    cf = ctx["contact_forces"][:, ctx["feet_idx"]]
    return jnp.any(jnp.linalg.norm(cf[:, :, :2], axis=2)
                   > 3.0 * jnp.abs(cf[:, :, 2]), axis=1).astype(jnp.float32)


def reward_base_height(ctx):
    foot_to_body = ctx["root_z"] - jnp.mean(ctx["foot_positions"][:, :, 2], axis=-1)
    return _sq(foot_to_body - ctx["base_height_target"])


def reward_foothold_miss(ctx):
    # foot below the hole line = missed foothold (dtc.py:536-539).  The
    # reference compares against world z=0 (annotated "for stepping stone
    # only"); here the line is the env-origin height so sunken tiles
    # (stairs-down) don't accrue a permanent penalty — identical on all
    # origin-z=0 tiles.
    min_z = jnp.min(ctx["foot_positions"][:, :, 2], axis=-1)
    return (min_z < ctx["env_origin_z"]).astype(jnp.float32)


def reward_soft_tracking_lin_vel(ctx, tolerance=0.0, lookback=3):
    # NOTE reference indexing (legged_robot_dtc.py:547): cmd over the last
    # `lookback` steps vs lin_vel at the single step -lookback — kept as-is.
    cmd = ctx["cmd_buffer"][:, -lookback:, :2]                  # (N,3,2)
    vel = ctx["lin_vel_buffer"][:, -lookback, :2][:, None, :]   # (N,1,2)
    d = jnp.sum(_sq((cmd - vel) / ctx["lin_vel_x_max"]), axis=-1)
    err = jnp.exp(-d / ctx["tracking_sigma"])
    return jnp.mean(err, axis=1)


def reward_soft_tracking_ang_vel(ctx, tolerance=0.15, lookback=4):
    cmd = ctx["cmd_buffer"][:, -lookback:, 2]                   # (N,4)
    ang = ctx["ang_vel_buffer"][:, -lookback:, 0]
    d = _sq((cmd - ang) / ctx["ang_vel_yaw_max"])
    d = jnp.where(d <= tolerance ** 2, 0.0, 1.0)
    err = jnp.exp(-d / ctx["tracking_sigma"])
    return jnp.mean(err, axis=1)


def reward_tracking_optimal_footholds(ctx):
    dis = jnp.linalg.norm(ctx["foot_positions"][:, :, :2]
                          - ctx["optimal_footholds_world"][:, :, :2], axis=-1)
    contact = ctx["contact_filt"].astype(jnp.float32)
    reward_per_foot = -jnp.log(0.8 + dis)
    return jnp.sum(jnp.where(contact == 1.0, reward_per_foot, 0.0), axis=-1)


REWARD_FUNCTIONS = {
    "lin_vel_z": reward_lin_vel_z,
    "ang_vel_xy": reward_ang_vel_xy,
    "torques": reward_torques,
    "dof_vel": reward_dof_vel,
    "dof_acc": reward_dof_acc,
    "action_rate": reward_action_rate,
    "collision": reward_collision,
    "dof_pos_limits": reward_dof_pos_limits,
    "dof_vel_limits": reward_dof_vel_limits,
    "torque_limits": reward_torque_limits,
    "tracking_lin_vel": reward_tracking_lin_vel,
    "tracking_ang_vel": reward_tracking_ang_vel,
    "feet_air_time": reward_feet_air_time,
    "stumble": reward_stumble,
    "stand_still": reward_stand_still,
    "feet_contact_forces": reward_feet_contact_forces,
    "power": reward_power,
    "smooth": reward_smooth,
    "foot_clearance": reward_foot_clearance,
    "feet_slip": reward_feet_slip,
    "hip_pos": reward_hip_pos,
    "powerchange": reward_powerchange,
    "pos_acc": reward_pos_acc,
    "foot_acc": reward_foot_acc,
    "orientation": reward_orientation,
    "orientation_roll": reward_orientation_roll,
    "big_pitch": reward_big_pitch,
    "feet_stumble": reward_feet_stumble,
    "base_height": reward_base_height,
    "foothold_miss": reward_foothold_miss,
    "soft_tracking_lin_vel": reward_soft_tracking_lin_vel,
    "soft_tracking_ang_vel": reward_soft_tracking_ang_vel,
    "tracking_optimal_footholds": reward_tracking_optimal_footholds,
}


def active_reward_names(scales) -> list:
    """Nonzero-scale terms, 'termination' last (added after the positive
    clip, legged_robot.py:285-291)."""
    import dataclasses as dc
    names = [f.name for f in dc.fields(scales)
             if getattr(scales, f.name) != 0.0 and f.name != "termination"]
    return names


def compute_rewards(names, scales_dt, ctx, only_positive, termination_scale_dt):
    """Sum scale_i * term_i, positive clip, then termination term
    (compute_reward parity, legged_robot.py:274-291).

    Returns (total (N,), per_term dict name->(N,), ctx["updates"] filled)."""
    total = jnp.zeros_like(ctx["root_z"])
    per_term = {}
    for name in names:
        rew = REWARD_FUNCTIONS[name](ctx) * scales_dt[name]
        per_term[name] = rew
        total = total + rew
    if only_positive:
        total = jnp.clip(total, 0.0, None)
    if termination_scale_dt != 0.0:
        rew = reward_termination(ctx) * termination_scale_dt
        per_term["termination"] = rew
        total = total + rew
    return total, per_term
