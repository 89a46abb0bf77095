"""Pallas TPU kernel: the full post-physics reward stack in ONE launch.

Replaces the XLA chain for rewards (env/rewards.py — reference
legged_robot.py:274-291,1320-1622 + legged_robot_dtc.py:522-586) plus the
episode-sum accumulation and the three stateful reward buffers
(feet_air_time, stumble ring buffer, pitch filter).  On the XLA path the
~33 active terms lower to dozens of small outer fusions over (N,)/(N,12)
arrays — each a separate kernel launch whose fixed cost dwarfs its
microseconds of VPU work.  Here one grid program per env tile computes
every term, the positive clip, the termination term, and the (K, N)
episode-sum accumulate in registers/VMEM.

Layout: ENV-TRAILING, like the physics mega-kernel — small component axes
lead (12 dofs / 4 feet / 3 vector comps as sublanes), the env tile rides
the 128 vector lanes.  The transposes this needs at the call boundary are
free where the producer is already component-leading (phys q/qd, the
contact-force and foot arrays from the physics info dict) and tiny
(< 0.2 MB) everywhere else; XLA cancels double transposes at compile
time.

The plane-fit orientation terms consume the precomputed (N, 2) plane
coefficients X = heights @ pinv.T (one MXU matmul the caller keeps in
XLA) instead of re-reading the (N, 693) height scan.

Numerics are plain f32 like env/rewards.py; summation order over the
small component axes differs (leading- vs trailing-axis reduction), so
parity is to ~1e-6 relative, pinned by tests/test_pallas_rewards.py
against rewards.compute_rewards in interpret mode and on hardware by
scripts/verify_kernels_tpu.py.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _row(x):
    """(TILE,) -> (1, TILE) (all per-env scalars stay 2D for Mosaic)."""
    return x.reshape(1, -1)


def _sum0(x):
    # Unrolled leading-axis sum.  Mosaic rejects vector.multi_reduction
    # (ADD) over a dimension whose layout has nonzero sublane offsets —
    # which is exactly what a middle-axis slice like fp[:, 2] of a
    # (4, 3, T) ref produces.  The leading axis here is tiny and static
    # (<= 12), so an unrolled row sum is the same VPU work without the
    # layout constraint.
    acc = x[0:1]
    for i in range(1, x.shape[0]):
        acc = acc + x[i:i + 1]
    return acc


def _min0(x):
    # Unrolled leading-axis min (same layout rationale as _sum0).
    acc = x[0:1]
    for i in range(1, x.shape[0]):
        acc = jnp.minimum(acc, x[i:i + 1])
    return acc


def _norm_sq2(x, y):
    return x * x + y * y


def _kernel(names, sum_names, scales_dt, st, only_positive,
            termination_scale_dt,
            # ---- traced refs (comp-leading, env tile trailing) ----
            q_ref, qd_ref, lqd_ref, act_ref, lact_ref, lact2_ref, tau_ref,
            blv_ref, bav_ref, pg_ref,
            cff_ref, cfp_ref,
            fc_ref, lc_ref, filt_ref, air_ref, stumb_ref,
            cmd_ref, cmdb_ref, lvb_ref, avb_ref,
            fp_ref, fv_ref, lfv_ref, opt_ref,
            clear_ref, planeX_ref, pitch_ref, lvl_ref, scal_ref, stat_ref,
            sums_ref,
            # ---- outputs ----
            rew_out, sums_out, air_out, stumb_out, pitch_out):
    """names: static list of active terms in reference order; st: dict of
    static FLOAT config constants; scal_ref rows: 0 root_z, 1 env_origin_z,
    2 reset_buf, 3 time_out_buf, 4 robot_mass, 5 lin_vel_x_max; stat_ref
    (12, 6) static per-dof columns: 0 soft lo, 1 soft hi, 2 vel limit,
    3 torque limit, 4 default pos, 5 hip mask (Pallas forbids captured
    array constants, so they ride a broadcast-block input)."""
    dt = st["dt"]
    stat = stat_ref[...]
    dof_lo = stat[:, 0:1]
    dof_hi = stat[:, 1:2]
    dof_vel_limit = stat[:, 2:3]
    torque_limit = stat[:, 3:4]
    default_dof_pos = stat[:, 4:5]
    hip_mask = stat[:, 5:6]
    q = q_ref[...]
    qd = qd_ref[...]
    tau = tau_ref[...]
    blv = blv_ref[...]
    bav = bav_ref[...]
    pg = pg_ref[...]
    cff = cff_ref[...]                    # (4, 3, T) feet contact forces
    fc = fc_ref[...]                      # (4, T) current contact (f32 0/1)
    lc = lc_ref[...]
    filt = filt_ref[...]
    cmd = cmd_ref[...]                    # (4, T)
    fp = fp_ref[...]                      # (4, 3, T) foot positions
    fv = fv_ref[...]
    scal = scal_ref[...]
    root_z = scal[0:1]
    origin_z = scal[1:2]
    reset_f = scal[2:3]
    timeout_f = scal[3:4]
    mass = scal[4:5]
    linmax = scal[5:6]

    cmd_norm2 = _norm_sq2(cmd[0:1], cmd[1:2])          # |cmd_xy|^2

    ctx_upd = {}

    def t_lin_vel_z():
        return jnp.square(blv[2:3])

    def t_ang_vel_xy():
        return _sum0(jnp.square(bav[:2]))

    def t_orientation_common():
        # plane-fit pitch/roll estimate (legged_robot.py:1535-1596); the
        # arctan over the plane normal happens OUTSIDE the kernel (no
        # Mosaic atan lowering) — planeX_ref carries the raw angles
        A = planeX_ref[...]
        pitch_est = A[0:1]
        roll_est = A[1:2]
        pitch_clip = jnp.where((pitch_est >= -0.1) & (pitch_est <= 0.1),
                               0.0, pitch_est)
        roll_clip = jnp.where((roll_est >= -0.1) & (roll_est <= 0.1),
                              0.0, roll_est)
        new_pitch = pitch_ref[...] * 0.2 + 0.8 * pitch_clip
        ctx_upd["pitch_est"] = new_pitch
        # quat_from_euler_xyz(roll_clip, new_pitch, 0) (ops/quat.py:157)
        cr, sr = jnp.cos(roll_clip * 0.5), jnp.sin(roll_clip * 0.5)
        cp, sp = jnp.cos(new_pitch * 0.5), jnp.sin(new_pitch * 0.5)
        qx, qy = sr * cp, cr * sp
        qz, qw = -sr * sp, cr * cp
        # quat_rotate_inverse(quat, (0,0,-1)) (ops/quat.py:55) expanded
        plx = 2.0 * (qw * qy - qx * qz)
        ply = -2.0 * (qw * qx + qy * qz)
        return plx, ply

    _ocm = [None]

    def ocm():
        if _ocm[0] is None:
            _ocm[0] = t_orientation_common()
        return _ocm[0]

    def t_orientation():
        plx, _ = ocm()
        return jnp.square(pg[0:1] - plx)

    def t_orientation_roll():
        _, ply = ocm()
        return jnp.abs(pg[1:2] - ply)

    def t_torques():
        return _sum0(jnp.square(tau))

    def t_dof_vel():
        return _sum0(jnp.square(qd))

    def t_dof_acc():
        return _sum0(jnp.square((lqd_ref[...] - qd) / dt))

    def t_action_rate():
        return _sum0(jnp.square(lact_ref[...] - act_ref[...]))

    def t_collision():
        cfp = cfp_ref[...]                 # (P, 3, T)
        n2 = cfp[:, 0] ** 2 + cfp[:, 1] ** 2 + cfp[:, 2] ** 2
        return _sum0((n2 > 0.1 ** 2).astype(jnp.float32))

    def t_termination():
        return reset_f * (1.0 - timeout_f)

    def t_dof_pos_limits():
        out = (-jnp.clip(q - dof_lo, None, 0.0)
               + jnp.clip(q - dof_hi, 0.0, None))
        return _sum0(out)

    def t_dof_vel_limits():
        lim = dof_vel_limit * st["soft_dof_vel_limit"]
        return _sum0(jnp.clip(jnp.abs(qd) - lim, 0.0, 1.0))

    def t_torque_limits():
        lim = torque_limit * st["soft_torque_limit"]
        return _sum0(jnp.clip(jnp.abs(tau) - lim, 0.0, None))

    def t_tracking_lin_vel():
        err = (_norm_sq2((cmd[0:1] - blv[0:1]) / linmax,
                         (cmd[1:2] - blv[1:2]) / linmax))
        return jnp.exp(-err / st["tracking_sigma"])

    def t_tracking_ang_vel():
        err = jnp.square(cmd[2:3] - bav[2:3])
        return jnp.exp(-err / st["tracking_sigma"])

    def t_feet_air_time():
        cfilt = jnp.maximum(fc, lc)              # contact | last_contacts
        air = air_ref[...]
        first = ((air > 0.0) & (cfilt > 0.0)).astype(jnp.float32)
        air = air + dt
        rew = _sum0((air - 0.5) * first)
        rew = rew * (cmd_norm2 > 0.1 ** 2).astype(jnp.float32)
        ctx_upd["feet_air_time"] = air * (1.0 - cfilt)
        return rew

    def t_stumble():
        n2 = _norm_sq2(cff[:, 0], cff[:, 1])
        hit = n2 > 25.0 * jnp.square(cff[:, 2])
        return (_sum0(hit.astype(jnp.float32)) > 0.0).astype(jnp.float32)

    def t_stand_still():
        s = _sum0(jnp.abs(q - default_dof_pos))
        return s * (cmd_norm2 < 0.1 ** 2).astype(jnp.float32)

    def t_feet_contact_forces():
        n = jnp.sqrt(cff[:, 0] ** 2 + cff[:, 1] ** 2 + cff[:, 2] ** 2)
        return _sum0(jnp.clip(n - st["max_contact_force"], 0.0, None))

    def t_power():
        return _sum0(jnp.clip(tau * qd, 0.0, None))

    def t_smooth():
        return _sum0(jnp.square(act_ref[...] - 2.0 * lact_ref[...]
                                + lact2_ref[...]))

    def t_foot_clearance():
        n2 = _norm_sq2(cff[:, 0], cff[:, 1])
        stumb = (n2 > 16.0 * jnp.square(cff[:, 2])).astype(jnp.float32)
        buf = stumb_ref[...]                     # (5, 4, T)
        newbuf = jnp.concatenate([buf[1:], stumb[None]], axis=0)
        ctx_upd["stumb_buffer"] = newbuf
        flag = jnp.max(newbuf, axis=0)           # any over the ring
        clear = clear_ref[...]
        return _sum0((1.0 - flag) * (clear > 0.18).astype(jnp.float32))

    def t_feet_slip():
        cfilt = jnp.maximum(fc, lc)
        return _sum0(cfilt * _norm_sq2(fv[:, 0], fv[:, 1]))

    def t_hip_pos():
        return _sum0(jnp.square(q) * hip_mask)

    def t_powerchange():
        smooth_co = jnp.clip(cmd[0:1], 1.0, None)
        p = _sum0(jnp.clip(tau * qd, 0.0, None))
        return jnp.square(p / (mass * 9.815 * smooth_co))

    def t_pos_acc():
        pts = st["acc_points"]                   # (8, 3) numpy
        vx, vy, vz = blv[0:1], blv[1:2], blv[2:3]
        wx, wy, wz = bav[0:1], bav[1:2], bav[2:3]
        acc = 0.0
        for i in range(pts.shape[0]):
            px, py, pz = (float(pts[i, 0]), float(pts[i, 1]),
                          float(pts[i, 2]))
            pvx = vx + wy * pz - wz * py
            pvy = vy + wz * px - wx * pz
            pvz = vz + wx * py - wy * px
            acc = acc + pvx * pvx + pvy * pvy + pvz * pvz
        return acc

    def t_foot_acc():
        mask = jnp.where(lvl_ref[...] > 5.0, 0.2, 1.0)
        lfv = lfv_ref[...]
        ax = (lfv[:, 0] - fv[:, 0]) / dt
        ay = (lfv[:, 1] - fv[:, 1]) / dt
        az = (lfv[:, 2] - fv[:, 2]) / dt
        acc = jnp.sqrt(ax * ax + ay * ay + az * az)
        return _sum0(jnp.clip(mask * (acc - st["max_acc"]), 0.0, None))

    def t_big_pitch():
        return (jnp.abs(pg[0:1]) > 0.6).astype(jnp.float32)

    def t_feet_stumble():
        n2 = _norm_sq2(cff[:, 0], cff[:, 1])
        hit = n2 > 9.0 * jnp.square(cff[:, 2])
        return (_sum0(hit.astype(jnp.float32)) > 0.0).astype(jnp.float32)

    def t_base_height():
        mean_fz = _sum0(fp[:, 2]) * 0.25
        return jnp.square(root_z - mean_fz - st["base_height_target"])

    def t_foothold_miss():
        min_z = _min0(fp[:, 2])
        return (min_z < origin_z).astype(jnp.float32)

    def t_soft_tracking_lin_vel():
        cmdb = cmdb_ref[...]                     # (4, 4, T) last-4 commands
        lvb = lvb_ref[...]                       # (2, T) lin vel at -3
        err = jnp.zeros_like(root_z)
        for k in (1, 2, 3):                      # cmd_buffer[:, -3:]
            d = (_norm_sq2((cmdb[k:k + 1, 0] - lvb[0:1]) / linmax,
                           (cmdb[k:k + 1, 1] - lvb[1:2]) / linmax))
            err = err + jnp.exp(-d / st["tracking_sigma"])
        return err / 3.0

    def t_soft_tracking_ang_vel():
        cmdb = cmdb_ref[...]
        avb = avb_ref[...]                       # (4, T) yaw rate, last 4
        tol2 = 0.15 ** 2
        err = jnp.zeros_like(root_z)
        for k in range(4):
            d = jnp.square((cmdb[k:k + 1, 2] - avb[k:k + 1])
                           / st["ang_vel_yaw_max"])
            d = jnp.where(d <= tol2, 0.0, 1.0)
            err = err + jnp.exp(-d / st["tracking_sigma"])
        return err / 4.0

    def t_tracking_optimal_footholds():
        opt = opt_ref[...]                       # (4, 2, T) optimal xy
        dis = jnp.sqrt(_norm_sq2(fp[:, 0] - opt[:, 0],
                                 fp[:, 1] - opt[:, 1]))
        per_foot = -jnp.log(0.8 + dis)
        return _sum0(jnp.where(filt == 1.0, per_foot, 0.0))

    table = {
        "lin_vel_z": t_lin_vel_z, "ang_vel_xy": t_ang_vel_xy,
        "orientation": t_orientation, "orientation_roll": t_orientation_roll,
        "torques": t_torques, "dof_vel": t_dof_vel, "dof_acc": t_dof_acc,
        "action_rate": t_action_rate, "collision": t_collision,
        "dof_pos_limits": t_dof_pos_limits,
        "dof_vel_limits": t_dof_vel_limits,
        "torque_limits": t_torque_limits,
        "tracking_lin_vel": t_tracking_lin_vel,
        "tracking_ang_vel": t_tracking_ang_vel,
        "feet_air_time": t_feet_air_time, "stumble": t_stumble,
        "stand_still": t_stand_still,
        "feet_contact_forces": t_feet_contact_forces,
        "power": t_power, "smooth": t_smooth,
        "foot_clearance": t_foot_clearance, "feet_slip": t_feet_slip,
        "hip_pos": t_hip_pos, "powerchange": t_powerchange,
        "pos_acc": t_pos_acc, "foot_acc": t_foot_acc,
        "big_pitch": t_big_pitch, "feet_stumble": t_feet_stumble,
        "base_height": t_base_height, "foothold_miss": t_foothold_miss,
        "soft_tracking_lin_vel": t_soft_tracking_lin_vel,
        "soft_tracking_ang_vel": t_soft_tracking_ang_vel,
        "tracking_optimal_footholds": t_tracking_optimal_footholds,
    }

    per_term = {}
    total = jnp.zeros_like(root_z)
    for name in names:
        r = table[name]() * scales_dt[name]
        per_term[name] = r
        total = total + r
    if only_positive:
        total = jnp.clip(total, 0.0, None)
    if termination_scale_dt != 0.0:
        r = t_termination() * termination_scale_dt
        per_term["termination"] = r
        total = total + r

    rew_out[...] = total
    sums_in = sums_ref[...]
    sums_out[...] = sums_in + jnp.concatenate(
        [per_term[n] for n in sum_names], axis=0)
    air_out[...] = ctx_upd.get("feet_air_time", air_ref[...])
    stumb_out[...] = ctx_upd.get("stumb_buffer", stumb_ref[...])
    pitch_out[...] = ctx_upd.get("pitch_est", pitch_ref[...])


def compute_rewards_fused(names, scales_dt, ctx, only_positive,
                          termination_scale_dt, sum_names, episode_sums,
                          tile=512, interpret=False):
    """Drop-in fused equivalent of rewards.compute_rewards + the episode
    sum accumulate.  Takes the SAME ctx dict env/legged_env.py builds
    (env-leading arrays) and returns (rew_buf (N,), new_episode_sums
    (K, N), updates dict) — updates carries feet_air_time / stumb_buffer /
    pitch_est exactly when the corresponding term is active, mirroring
    ctx["updates"] semantics."""
    N = ctx["root_z"].shape[0]
    while tile > 128 and N % tile:
        tile //= 2
    if N % tile:
        raise ValueError(f"num_envs {N} not divisible by tile {tile}")

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    tN = lambda x: f32(x).T                               # (N, D) -> (D, N)

    feet_idx = np.asarray(ctx["feet_idx"])
    pen_idx = np.asarray(ctx["penalised_idx"])
    cf = ctx["contact_forces"]                            # (N, B, 3)
    cff = jnp.transpose(cf[:, feet_idx], (1, 2, 0))       # (4, 3, N)
    cfp = jnp.transpose(cf[:, pen_idx], (1, 2, 0))        # (P, 3, N)

    nq = ctx["dof_pos"].shape[1]
    hip_mask = np.zeros((nq,), np.float32)
    hip_mask[np.asarray(ctx["hip_dof_idx"])] = 1.0
    lo, hi = ctx["soft_dof_pos_limits"]
    # per-dof static columns ride a broadcast-block input (Pallas forbids
    # captured array constants): see _kernel's stat_ref docstring
    stat = jnp.asarray(np.stack([
        np.asarray(lo, np.float32),
        np.asarray(hi, np.float32),
        np.asarray(ctx["dof_vel_limit"], np.float32),
        np.asarray(ctx["torque_limit"], np.float32),
        np.asarray(ctx["default_dof_pos"], np.float32).reshape(-1),
        hip_mask,
    ], axis=1))                                           # (nq, 6)
    st = dict(
        dt=float(ctx["dt"]),
        tracking_sigma=float(ctx["tracking_sigma"]),
        ang_vel_yaw_max=float(ctx["ang_vel_yaw_max"]),
        soft_dof_vel_limit=float(ctx["soft_dof_vel_limit"]),
        soft_torque_limit=float(ctx["soft_torque_limit"]),
        max_contact_force=float(ctx["max_contact_force"]),
        max_acc=float(ctx["max_acc"]),
        base_height_target=float(ctx["base_height_target"]),
        acc_points=np.asarray(ctx["acc_points"], np.float32),
    )

    # plane-fit pitch/roll estimates for the orientation terms, computed in
    # XLA: ONE MXU matmul the kernel would otherwise redo per tile
    # (rewards._plane_norm), and arctan, which Mosaic has no TC lowering
    # for (verified on-chip: "Unimplemented primitive ... atan").
    X = (ctx["measured_heights"] @ ctx["plane_pinv"].T)[:, :2].T
    pn = jnp.sqrt(X[0] ** 2 + X[1] ** 2 + 1.0)
    planeX = jnp.stack([jnp.arctan(-X[0] / pn),          # pitch_est raw
                        -jnp.arctan(-X[1] / pn)])        # roll_est raw

    mass = jnp.broadcast_to(f32(ctx["robot_mass"]).reshape(-1), (N,))
    scal = jnp.stack([
        f32(ctx["root_z"]),
        f32(ctx["env_origin_z"]) * jnp.ones((N,), jnp.float32),
        f32(ctx["reset_buf"]),
        f32(ctx["time_out_buf"]),
        mass,
        jnp.broadcast_to(f32(ctx["lin_vel_x_max"]), (N,)),
    ])                                                    # (6, N)

    inputs = [
        tN(ctx["dof_pos"]), tN(ctx["dof_vel"]), tN(ctx["last_dof_vel"]),
        tN(ctx["actions"]), tN(ctx["last_actions"]),
        tN(ctx["last_actions_2"]), tN(ctx["torques"]),
        tN(ctx["base_lin_vel"]), tN(ctx["base_ang_vel"]),
        tN(ctx["projected_gravity"]),
        cff, cfp,
        tN(ctx["feet_contact"]), tN(ctx["last_contacts"]),
        tN(ctx["contact_filt"]), tN(ctx["feet_air_time"]),
        jnp.transpose(f32(ctx["stumb_buffer"]), (1, 2, 0)),   # (5, 4, N)
        tN(ctx["commands"]),
        jnp.transpose(f32(ctx["cmd_buffer"][:, -4:]), (1, 2, 0)),  # (4,4,N)
        tN(ctx["lin_vel_buffer"][:, -3, :2]),                 # (2, N)
        tN(ctx["ang_vel_buffer"][:, -4:, 0]),                 # (4, N)
        jnp.transpose(f32(ctx["foot_positions"]), (1, 2, 0)),
        jnp.transpose(f32(ctx["foot_velocities"]), (1, 2, 0)),
        jnp.transpose(f32(ctx["last_foot_velocities"]), (1, 2, 0)),
        jnp.transpose(f32(ctx["optimal_footholds_world"][:, :, :2]),
                      (1, 2, 0)),                             # (4, 2, N)
        tN(ctx["measured_foot_clearance"]),
        f32(planeX),
        f32(ctx["pitch_est"]).reshape(1, N),
        f32(ctx["terrain_levels"]).reshape(1, N),
        scal,
        stat,
        f32(episode_sums),
    ]

    def bspec_shape(shape):
        lead = tuple(shape[:-1])
        zeros = (0,) * len(lead)
        return pl.BlockSpec(lead + (tile,), lambda i, z=zeros: z + (i,))

    def bspec(x):
        return bspec_shape(x.shape)

    K = len(sum_names)
    out_shapes = [
        jax.ShapeDtypeStruct((1, N), jnp.float32),        # rew
        jax.ShapeDtypeStruct((K, N), jnp.float32),        # episode sums
        jax.ShapeDtypeStruct((4, N), jnp.float32),        # feet_air_time
        jax.ShapeDtypeStruct((5, 4, N), jnp.float32),     # stumb buffer
        jax.ShapeDtypeStruct((1, N), jnp.float32),        # pitch_est
    ]
    kern = functools.partial(_kernel, tuple(names), tuple(sum_names),
                             dict(scales_dt), st, bool(only_positive),
                             float(termination_scale_dt))
    in_specs = [bspec(x) for x in inputs]
    # stat is env-invariant: every program reads the whole (nq, 6) block
    in_specs[-2] = pl.BlockSpec(stat.shape, lambda i: (0, 0))
    rew, sums, air, stumb, pitch = pl.pallas_call(
        kern,
        grid=(N // tile,),
        in_specs=in_specs,
        out_specs=[bspec_shape(s.shape) for s in out_shapes],
        out_shape=out_shapes,
        interpret=interpret,
    )(*inputs)

    updates = {}
    active = set(names)
    if "feet_air_time" in active:
        updates["feet_air_time"] = air.T
    if "foot_clearance" in active:
        updates["stumb_buffer"] = jnp.transpose(stumb, (2, 0, 1)) > 0.5
    if "orientation" in active or "orientation_roll" in active:
        updates["pitch_est"] = pitch[0]
    return rew[0], sums, updates
