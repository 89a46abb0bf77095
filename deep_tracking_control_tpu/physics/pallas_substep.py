"""Pallas TPU mega-kernel: the full decimation loop in ONE kernel.

Replaces the XLA decimation loop (legged_env.step decim_body -> physics/
sim.py sim_step; reference surface: the 4x `gym.simulate` loop,
legged_robot.py:102-111) for quadruped models.  The XLA path lowers each
substep to hundreds of small VPU fusions with HBM round-trips between them
(~1.45 ms/substep at 4096 envs); this kernel runs PD torques -> FK ->
heightfield contact -> ABA -> semi-implicit integration for all
``decimation`` substeps over a 128-env lane tile entirely in VMEM/vregs.

Terrain queries inside the kernel:
  * FEET sample bilinear height+slope per substep from a per-foot 16x16-cell
    band (80 cm) carved out of the per-env contact window at substep 0 —
    numerically identical to the patch sampler as long as the foot stays
    within the band (~±25 cm of its start-of-step position; clamped beyond).
    Stepping-stone rims stay exact at every substep — SURVEY §7 risk #1.
  * BODY points (torso/knee/shank spheres) use a local plane (h0, dh/dx,
    dh/dy) frozen at the previous step's point positions — they only carry
    load in falls; the <~2 cm staleness within one 20 ms step is far below
    the 5 cm grid cell.  Deliberate deviation, documented in PARITY.md.

Math parity: everything else reproduces physics/sim.py + engine.py +
quadruped.py op-for-op (same implicit contact solve, stiction anchors,
leg-batched ABA, integration); tests/test_pallas_substep.py checks the
kernel (interpret mode) against the XLA path.

Pallas constraint note: kernels may not capture ARRAY constants, so every
per-robot constant arrives either as a packed replicated input (cnq/caxis/
cr/cgeom/coff) or as inlined Python scalars.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import spatial as sp
from ..robot.model import RobotModel
from . import quadruped
from .engine import SimParams
from .sim import ContactGeometry

TILE = 128
# contact window carved from the 64x128 terrain patch (terrain/patch.py):
# the base sits at patch rows [32,40), cols [32,96); contact points lie
# within ±14 cells of the base.  Full 128-lane column width (a raw DMA
# slab, ops/pallas_patch.py extract_windows_pallas).
WIN_R0, WIN_R = 16, 40
WIN_C0, WIN_C = 0, 128
BAND = 16            # per-foot band: 16x16 cells = 80x80 cm


# ---------------------------------------------------------------------------
# trace-safe helpers (no array constants; scalars inline into the jaxpr)
# ---------------------------------------------------------------------------

def _quat_to_rotmat_t(q):
    """xyzw (4, T) -> (3, 3, T), mirroring ops/quat.py quat_to_rotmat."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        jnp.stack([1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)]),
        jnp.stack([2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)]),
        jnp.stack([2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)]),
    ])


def _quat_integrate_t(q, w_world, dt):
    """Exponential-map integration, env-last ((4,T), (3,T)); mirrors
    ops/quat.py quat_integrate + normalize."""
    angle = jnp.sqrt(w_world[0] ** 2 + w_world[1] ** 2 + w_world[2] ** 2)
    inv = 1.0 / jnp.maximum(angle, 1e-9)
    half = angle * (dt * 0.5)
    s, c = jnp.sin(half), jnp.cos(half)
    si = s * inv
    dq = jnp.stack([w_world[0] * si, w_world[1] * si, w_world[2] * si, c])
    ax, ay, az, aw = dq[0], dq[1], dq[2], dq[3]
    bx, by, bz, bw = q[0], q[1], q[2], q[3]
    out = jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ])
    norm = jnp.sqrt(out[0] ** 2 + out[1] ** 2 + out[2] ** 2 + out[3] ** 2)
    return out / jnp.maximum(norm, 1e-9)


def _axis_rotation_s(ax, ay, az, q):
    """sp.axis_rotation with the axis as Python scalars; q (..., T)."""
    c, s = jnp.cos(q), jnp.sin(q)
    C = 1.0 - c
    return jnp.stack([
        jnp.stack([c + ax * ax * C, ax * ay * C - az * s, ax * az * C + ay * s]),
        jnp.stack([ay * ax * C + az * s, c + ay * ay * C, ay * az * C - ax * s]),
        jnp.stack([az * ax * C - ay * s, az * ay * C + ax * s, c + az * az * C]),
    ])


def _smul(axis, v):
    """S * v for the joint motion subspace S = [axis; 0] with axis Python
    scalars; v (...,) -> (6, ...)."""
    z = jnp.zeros_like(v)
    return jnp.stack([axis[0] * v, axis[1] * v, axis[2] * v, z, z, z])


def _sdot(axis, m):
    """S^T m  (motion-subspace projection) with scalar axis; m (6, ...)."""
    return axis[0] * m[0] + axis[1] * m[1] + axis[2] * m[2]


def _const_vec3(r, like):
    """(3,)-of-floats -> (3, ...) traced array broadcast like `like[0]`."""
    ones = jnp.ones_like(like)
    return jnp.stack([float(r[0]) * ones, float(r[1]) * ones,
                      float(r[2]) * ones])


# ---------------------------------------------------------------------------
# in-kernel terrain sampling
# ---------------------------------------------------------------------------

def _extract_band(window, fr, fc):
    """Carve a (BAND, BAND, T) block around fractional cell (fr, fc).

    window: (WIN_R, WIN_C, T).  Band rows [8g, 8g+16) with
    g = clip(floor((fr - 2) / 8)): guarantees rows [i0-2, i0+4) inside.
    """
    g = jnp.clip(jnp.floor((fr - 2.0) / 8.0), 0, (WIN_R - BAND) // 8)
    h = jnp.clip(jnp.floor((fc - 2.0) / 8.0), 0, (WIN_C - BAND) // 8)
    band_rows = None
    for gi in range((WIN_R - BAND) // 8 + 1):
        m = (g == gi).astype(window.dtype)          # (T,)
        blk = window[8 * gi:8 * gi + BAND]          # (BAND, WIN_C, T)
        band_rows = blk * m if band_rows is None else band_rows + blk * m
    band = None
    for hi in range((WIN_C - BAND) // 8 + 1):
        m = (h == hi).astype(window.dtype)
        blk = band_rows[:, 8 * hi:8 * hi + BAND]    # (BAND, BAND, T)
        band = blk * m if band is None else band + blk * m
    return band, g * 8.0, h * 8.0


def _band_bilinear(band, fr, fc, hs):
    """Bilinear height + slope + max corner from a (BAND, BAND, T) band at
    local fractional cell coords — the same corner algebra as
    terrain/patch.py sample_bilinear_slope, same slope cap."""
    fr = jnp.clip(fr, 0.0, BAND - 1.001)
    fc = jnp.clip(fc, 0.0, BAND - 1.001)
    i0 = jnp.floor(fr)
    j0 = jnp.floor(fc)
    tx = fr - i0
    ty = fc - j0
    row0 = None
    row1 = None
    for r in range(BAND):
        w0 = (i0 == r).astype(band.dtype)
        w1 = (i0 == r - 1).astype(band.dtype)
        r0 = band[r] * w0
        r1 = band[r] * w1
        row0 = r0 if row0 is None else row0 + r0
        row1 = r1 if row1 is None else row1 + r1
    c00 = c10 = c01 = c11 = None
    for c in range(BAND):
        w0 = (j0 == c).astype(band.dtype)
        w1 = (j0 == c - 1).astype(band.dtype)
        a00 = row0[c] * w0
        a10 = row1[c] * w0
        a01 = row0[c] * w1
        a11 = row1[c] * w1
        c00 = a00 if c00 is None else c00 + a00
        c10 = a10 if c10 is None else c10 + a10
        c01 = a01 if c01 is None else c01 + a01
        c11 = a11 if c11 is None else c11 + a11
    hgt = (c00 * (1.0 - tx) * (1.0 - ty) + c10 * tx * (1.0 - ty)
           + c01 * (1.0 - tx) * ty + c11 * tx * ty)
    dx = ((c10 - c00) * (1.0 - ty) + (c11 - c01) * ty) / hs
    dy = ((c01 - c00) * (1.0 - tx) + (c11 - c10) * tx) / hs
    h_max = jnp.maximum(jnp.maximum(c00, c10), jnp.maximum(c01, c11))
    cap = 3.0
    return hgt, jnp.clip(dx, -cap, cap), jnp.clip(dy, -cap, cap), h_max


# ---------------------------------------------------------------------------
# env-last FK / ABA clones of physics/quadruped.py (kernel-safe: static
# python indexing only, constants as Python scalars)
# ---------------------------------------------------------------------------

def _fk(layout, state):
    T = state["pos"].shape[-1]
    R0 = _quat_to_rotmat_t(state["quat"])
    v0 = jnp.concatenate([sp.rtmul(R0, state["ang_vel"]),
                          sp.rtmul(R0, state["lin_vel"])])

    R_par = jnp.broadcast_to(R0[:, :, None, :], (3, 3, 4, T))
    x_par = jnp.broadcast_to(state["pos"][:, None, :], (3, 4, T))
    v_par = jnp.broadcast_to(v0[:, None, :], (6, 4, T))

    R_depth, x_depth, v_depth, E_depth, r_depth = [], [], [], [], []
    for d in range(3):
        axis = tuple(float(a) for a in layout.axis[d])
        q_cols = jnp.stack([state["q"][int(j)] for j in layout.joint_idx[d]])
        dq_cols = jnp.stack([state["qd"][int(j)] for j in layout.joint_idx[d]])
        Rj = _axis_rotation_s(axis[0], axis[1], axis[2], q_cols)  # (3,3,4,T)
        E = jnp.swapaxes(Rj, 0, 1)
        # child origin per leg: (3, 4, T) from per-leg floats
        r = jnp.stack([
            jnp.stack([jnp.full((T,), float(layout.r[d][leg][i]),
                                dtype=jnp.float32) for leg in range(4)])
            for i in range(3)])
        v = sp.xm_apply(E, r, v_par) + _smul(axis, dq_cols)
        R = sp.mmul(R_par, Rj)
        x = x_par + sp.rmul(R_par, r)
        R_depth.append(R)
        x_depth.append(x)
        v_depth.append(v)
        E_depth.append(E)
        r_depth.append(r)
        R_par, x_par, v_par = R, x, v

    def gather_body(arrs, base):
        out = [base]
        for leg in range(4):
            for d in range(3):
                out.append(arrs[d][..., leg, :])
        return jnp.stack(out)

    return dict(
        R=gather_body(R_depth, R0),
        x=gather_body(x_depth, state["pos"]),
        v=gather_body(v_depth, v0),
        E_depth=E_depth, r_depth=r_depth,
        R_depth=R_depth, v_depth=v_depth, v0=v0, R0=R0,
    )


def _body_points(kin, geom: ContactGeometry):
    """engine.body_point_state with static per-point indexing."""
    P = len(geom.dyn_idx)
    pos_list, vel_list = [], []
    for p in range(P):
        b = int(geom.dyn_idx[p])
        Rb = kin["R"][b]                              # (3,3,T)
        xb = kin["x"][b]
        vb = kin["v"][b]
        off = _const_vec3(geom.offset[p], xb[0])      # (3,T)
        pos_list.append(xb + sp.rmul(Rb, off))
        wl = vb[:3]
        vl = vb[3:]
        vel_b = vl + sp.cross3(wl, off)
        vel_list.append(sp.rmul(Rb, vel_b))
    return jnp.stack(pos_list), jnp.stack(vel_list)   # (P,3,T)


def _accumulate(nb, dyn_idx, kin, pts_pos, forces):
    P = forces.shape[0]
    T = forces.shape[-1]
    zero = jnp.zeros((6, T), dtype=forces.dtype)
    out = []
    for b in range(nb):
        acc = zero
        for p in range(P):
            if int(dyn_idx[p]) != b:
                continue
            arm = pts_pos[p] - kin["x"][b]            # (3,T)
            f = forces[p]
            n = sp.cross3(arm, f)
            acc = acc + jnp.concatenate([n, f])
        out.append(acc)
    return jnp.stack(out)                             # (nb,6,T)


def _aba(model, layout, inertias, kin, qd, tau, f_ext, sim: SimParams):
    T = qd.shape[-1]

    def depth_arr(a):
        return [jnp.stack([a[int(b)] for b in layout.body_idx[d]], axis=-2)
                for d in range(3)]

    I_depth = depth_arr(inertias)                     # (6,6,4,T)
    fx_depth = depth_arr(f_ext)                       # (6,4,T)
    qd_depth = [jnp.stack([qd[int(j)] for j in layout.joint_idx[d]])
                for d in range(3)]
    tau_depth = [jnp.stack([tau[int(j)] for j in layout.joint_idx[d]])
                 for d in range(3)]
    axes = [tuple(float(a) for a in layout.axis[d]) for d in range(3)]

    IA = []
    pA = []
    for d in range(3):
        v = kin["v_depth"][d]
        Iv = sp.imul(I_depth[d], v)
        p_i = sp.crf(v, Iv)
        Rb = kin["R_depth"][d]
        n_b = sp.rtmul(Rb, fx_depth[d][:3])
        f_b = sp.rtmul(Rb, fx_depth[d][3:])
        IA.append(I_depth[d])
        pA.append(p_i - jnp.concatenate([n_b, f_b]))

    I0 = inertias[0]
    v0 = kin["v0"]
    pA0 = sp.crf(v0, sp.imul(I0, v0))
    n0 = sp.rtmul(kin["R0"], f_ext[0][:3])
    f0 = sp.rtmul(kin["R0"], f_ext[0][3:])
    pA0 = pA0 - jnp.concatenate([n0, f0])
    IA0 = I0

    U = [None] * 3
    dinv = [None] * 3
    u = [None] * 3
    c = [None] * 3
    for d in range(3):
        c[d] = sp.crm(kin["v_depth"][d], _smul(axes[d], qd_depth[d]))

    for d in (2, 1, 0):
        # Ui = IA S = the axis-combination of IA's first three columns
        Ui = (axes[d][0] * IA[d][:, 0] + axes[d][1] * IA[d][:, 1]
              + axes[d][2] * IA[d][:, 2])             # (6,4,T)
        di = _sdot(axes[d], Ui) + sim.armature
        ui = (tau_depth[d] - sim.joint_friction * qd_depth[d]
              - _sdot(axes[d], pA[d]))
        U[d], dinv[d], u[d] = Ui, 1.0 / di, ui
        Ia = IA[d] - sp.outer_leading(Ui, Ui) * (1.0 / di)
        pa = pA[d] + sp.imul(Ia, c[d]) + Ui * (ui / di)
        E, r = kin["E_depth"][d], kin["r_depth"][d]
        Ia_p = sp.inertia_transform_to_parent(E, r, Ia)
        pa_p = sp.xf_inv_apply(E, r, pa)
        if d > 0:
            IA[d - 1] = IA[d - 1] + Ia_p
            pA[d - 1] = pA[d - 1] + pa_p
        else:
            # explicit leg sum (mid-axis reductions are layout-hostile)
            IA0 = IA0 + (Ia_p[..., 0, :] + Ia_p[..., 1, :]
                         + Ia_p[..., 2, :] + Ia_p[..., 3, :])
            pA0 = pA0 + (pa_p[..., 0, :] + pa_p[..., 1, :]
                         + pa_p[..., 2, :] + pa_p[..., 3, :])

    a0 = -sp.solve_spd6(IA0, pA0)

    a_par = jnp.broadcast_to(a0[:, None, :], (6, 4, T))
    qdd_depth = []
    for d in range(3):
        E, r = kin["E_depth"][d], kin["r_depth"][d]
        a_p = sp.xm_apply(E, r, a_par) + c[d]
        qdd_d = (u[d] - sp.dot_leading(U[d], a_p)) * dinv[d]
        a_par = a_p + _smul(axes[d], qdd_d)
        qdd_depth.append(qdd_d)                       # (4,T)

    rows = [None] * model.nq
    for d in range(3):
        for leg in range(4):
            rows[int(layout.joint_idx[d][leg])] = qdd_depth[d][leg]
    return jnp.stack(rows), a0


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _substep_kernel(model: RobotModel, layout, geom: ContactGeometry,
                    sim: SimParams, decimation: int, hs: float,
                    thigh_dyn_idx,
                    # refs ----------------------------------------------------
                    q_ref, qd_ref, pos_ref, quat_ref, lin_ref, ang_ref,
                    anchors_ref, inertias_ref, goals_ref, kp_ref, kd_ref,
                    strength_ref, offset_ref, friction_ref, restitution_ref,
                    window_ref, worigin_ref, planes_ref, cnq_ref, cgeom_ref,
                    # outputs -------------------------------------------------
                    q_out, qd_out, pos_out, quat_out, lin_out, ang_out,
                    anchors_out, report_out, footpos_out, footvel_out,
                    thigh_out, tau_out, bodypts_out):
    _substep_body(model, layout, geom, sim, decimation, hs, thigh_dyn_idx,
                  window_ref[:],
                  q_ref, qd_ref, pos_ref, quat_ref, lin_ref, ang_ref,
                  anchors_ref, inertias_ref, goals_ref, kp_ref, kd_ref,
                  strength_ref, offset_ref, friction_ref, restitution_ref,
                  worigin_ref, planes_ref, cnq_ref, cgeom_ref,
                  q_out, qd_out, pos_out, quat_out, lin_out, ang_out,
                  anchors_out, report_out, footpos_out, footvel_out,
                  thigh_out, tau_out, bodypts_out)


def _substep_kernel_fused(model: RobotModel, layout, geom: ContactGeometry,
                          sim: SimParams, decimation: int, hs: float,
                          thigh_dyn_idx, win_r0: int,
                          # scalar prefetch -----------------------------------
                          starts_ref,
                          # refs ----------------------------------------------
                          q_ref, qd_ref, pos_ref, quat_ref, lin_ref, ang_ref,
                          anchors_ref, inertias_ref, goals_ref, kp_ref, kd_ref,
                          strength_ref, offset_ref, friction_ref,
                          restitution_ref, blocks_ref, worigin_ref, planes_ref,
                          cnq_ref, cgeom_ref,
                          # outputs -------------------------------------------
                          q_out, qd_out, pos_out, quat_out, lin_out, ang_out,
                          anchors_out, report_out, footpos_out, footvel_out,
                          thigh_out, tau_out, bodypts_out,
                          # scratch -------------------------------------------
                          win_scratch, sems):
    """Fused-window variant: instead of a host-materialized env-last window
    (extract_windows_pallas + an XLA transpose = 3 extra HBM round-trips of
    the 84 MB window at 4096 envs), each grid program DMAs its tile's
    per-env (WIN_R, WIN_C) contact windows straight out of the blocked raw
    table (the ops/pallas_patch.py pattern) and transposes them to the
    env-last compute layout in VMEM."""
    g = pl.program_id(0)
    tile = win_scratch.shape[0]

    def dma(k):
        i = g * tile + k
        r0 = starts_ref[0, i]
        b = starts_ref[1, i]
        return pltpu.make_async_copy(
            blocks_ref.at[0, b, pl.ds(r0 + win_r0, win_scratch.shape[1]), :],
            win_scratch.at[k], sems.at[k])

    # issue all copies, then wait: latency overlaps across envs
    for k in range(tile):
        dma(k).start()
    for k in range(tile):
        dma(k).wait()
    window = jnp.transpose(win_scratch[:], (1, 2, 0))   # (WIN_R, WIN_C, tile)

    _substep_body(model, layout, geom, sim, decimation, hs, thigh_dyn_idx,
                  window,
                  q_ref, qd_ref, pos_ref, quat_ref, lin_ref, ang_ref,
                  anchors_ref, inertias_ref, goals_ref, kp_ref, kd_ref,
                  strength_ref, offset_ref, friction_ref, restitution_ref,
                  worigin_ref, planes_ref, cnq_ref, cgeom_ref,
                  q_out, qd_out, pos_out, quat_out, lin_out, ang_out,
                  anchors_out, report_out, footpos_out, footvel_out,
                  thigh_out, tau_out, bodypts_out)


def _substep_body(model: RobotModel, layout, geom: ContactGeometry,
                  sim: SimParams, decimation: int, hs: float,
                  thigh_dyn_idx, window,
                  # refs ------------------------------------------------------
                  q_ref, qd_ref, pos_ref, quat_ref, lin_ref, ang_ref,
                  anchors_ref, inertias_ref, goals_ref, kp_ref, kd_ref,
                  strength_ref, offset_ref, friction_ref, restitution_ref,
                  worigin_ref, planes_ref, cnq_ref, cgeom_ref,
                  # outputs ---------------------------------------------------
                  q_out, qd_out, pos_out, quat_out, lin_out, ang_out,
                  anchors_out, report_out, footpos_out, footvel_out,
                  thigh_out, tau_out, bodypts_out):
    nf = len(model.foot_body_index)
    P = len(geom.dyn_idx)
    nrb = model.num_bodies
    dt = sim.dt / sim.substeps

    q = q_ref[:]
    qd = qd_ref[:]
    pos = pos_ref[:]
    quat = quat_ref[:]
    lin_vel = lin_ref[:]
    ang_vel = ang_ref[:]
    anchors = anchors_ref[:]
    inertias = inertias_ref[:]
    worigin = worigin_ref[:]
    planes = planes_ref[:]
    friction = friction_ref[0]          # (1, T) block -> (T,)
    restitution = restitution_ref[0]
    kp = kp_ref[:]
    kd = kd_ref[:]
    strength = strength_ref[:]
    offset = offset_ref[:]
    # packed per-joint constants: rows = lim_lo, lim_hi, tau_lim, vel_lim
    cnq = cnq_ref[:]
    lim_lo = cnq[0][:, None]
    lim_hi = cnq[1][:, None]
    tau_lim_arr = cnq[2][:, None]
    vel_lim = cnq[3][:, None]
    # packed per-point constants: rows = radius, eff_mass
    cgeom = cgeom_ref[:]
    radius = cgeom[0][:, None]
    eff_mass = cgeom[1][:, None]

    bands = [None] * nf
    band_org = [None] * nf

    tau_last = None
    kin_last = None
    pts_last = None
    vel_last = None
    forces_last = None

    for s in range(decimation * sim.substeps):
        # ---- PD torques (legged_env.decim_body, legged_robot.py:595-630)
        goal = goals_ref[s]                          # (nq, T)
        tau = kp * (goal - q + offset) - kd * qd
        tau = tau * strength
        tau = jnp.clip(tau, -tau_lim_arr, tau_lim_arr)
        tau_last = tau
        # joint-limit spring (sim.py:123-127)
        tl = (sim.limit_stiffness * (jnp.maximum(lim_lo - q, 0.0)
                                     - jnp.maximum(q - lim_hi, 0.0))
              - sim.limit_damping * qd * ((q < lim_lo) | (q > lim_hi)))
        tau_eff = tau + tl

        # ---- FK (quadruped.fk, env-last) --------------------------------
        state = dict(pos=pos, quat=quat, lin_vel=lin_vel, ang_vel=ang_vel,
                     q=q, qd=qd)
        kin = _fk(layout, state)
        kin_last = kin

        # ---- contact point world state (engine.body_point_state) --------
        pts_pos, pts_vel = _body_points(kin, geom)
        pts_last, vel_last = pts_pos, pts_vel

        # ---- terrain height + slope per point ---------------------------
        h_list, gx_list, gy_list, hmax_list = [], [], [], []
        for p in range(P):
            x = pts_pos[p, 0]
            y = pts_pos[p, 1]
            if p < nf:
                fr = (x - worigin[0]) / hs
                fc = (y - worigin[1]) / hs
                if s == 0:
                    bands[p], g8, h8 = _extract_band(window, fr, fc)
                    band_org[p] = (g8, h8)
                hb, dxb, dyb, hmx = _band_bilinear(
                    bands[p], fr - band_org[p][0], fc - band_org[p][1], hs)
                h_list.append(hb)
                gx_list.append(dxb)
                gy_list.append(dyb)
                hmax_list.append(hmx)
            else:
                # frozen local plane (planes: (P-nf, 5, T) = h0,gx,gy,x0,y0)
                pp = planes[p - nf]
                hp = pp[0] + pp[1] * (x - pp[3]) + pp[2] * (y - pp[4])
                h_list.append(hp)
                gx_list.append(pp[1])
                gy_list.append(pp[2])
                hmax_list.append(hp)      # planes: no corner support
        h = jnp.stack(h_list)                        # (P, T)
        dhdx = jnp.stack(gx_list)
        dhdy = jnp.stack(gy_list)
        h_max = jnp.stack(hmax_list)

        # ---- anchored penalty contact (engine.heightfield_contact) ------
        x, y, z = pts_pos[:, 0], pts_pos[:, 1], pts_pos[:, 2]
        zr = z - radius
        cliff = (jnp.abs(dhdx) >= sim.cliff_threshold) | \
                (jnp.abs(dhdy) >= sim.cliff_threshold)
        near_top = (h_max - zr) < sim.cliff_active_depth
        cliff_sup = cliff & near_top
        h_eff = jnp.where(cliff_sup, h_max, h)
        ncap = sim.normal_slope_cap
        gxn = jnp.where(cliff_sup, 0.0,
                        jnp.where(cliff, dhdx, jnp.clip(dhdx, -ncap, ncap)))
        gyn = jnp.where(cliff_sup, 0.0,
                        jnp.where(cliff, dhdy, jnp.clip(dhdy, -ncap, ncap)))
        nx, ny = -gxn, -gyn
        inv_norm = jax.lax.rsqrt(nx * nx + ny * ny + 1.0)
        nx, ny, nz = nx * inv_norm, ny * inv_norm, inv_norm
        pen = h_eff - zr
        vx, vy, vz = pts_vel[:, 0], pts_vel[:, 1], pts_vel[:, 2]
        vn = vx * nx + vy * ny + vz * nz
        active = (pen > 0.0) & (pen < 0.5)
        damp = jnp.where(vn < 0.0, sim.contact_damping,
                         sim.contact_damping * (1.0 - restitution))
        k = sim.contact_stiffness
        denom = 1.0 + (k * dt + damp) * dt / eff_mass
        fn = (k * pen - (k * dt + damp) * vn) / denom
        fn = jnp.clip(fn, 0.0, sim.max_contact_force) * active

        kt, ct = sim.tangential_stiffness, sim.tangential_damping
        disp_x = x - anchors[:, 0]
        disp_y = y - anchors[:, 1]
        inv_t = 1.0 / (1.0 + (kt * dt + ct) * dt / eff_mass)
        ft_x = -(kt * disp_x + ct * vx) * inv_t
        ft_y = -(kt * disp_y + ct * vy) * inv_t
        ft_mag = jnp.sqrt(ft_x * ft_x + ft_y * ft_y + 1e-12)
        ft_max = friction * fn
        scale = jnp.minimum(1.0, ft_max / ft_mag)
        ft_x = ft_x * scale * active
        ft_y = ft_y * scale * active
        slip = (scale < 1.0) & active
        new_ax = jnp.where(active & ~slip, anchors[:, 0],
                           jnp.where(slip, x + ft_x / kt, x))
        new_ay = jnp.where(active & ~slip, anchors[:, 1],
                           jnp.where(slip, y + ft_y / kt, y))
        anchors = jnp.stack([new_ax, new_ay], axis=1)
        fx = nx * fn + ft_x
        fy = ny * fn + ft_y
        fz = nz * fn
        forces = jnp.stack([fx, fy, fz], axis=1)     # (P, 3, T)
        forces_last = forces

        # ---- per-body spatial forces (engine.accumulate_body_forces) ----
        f_ext = _accumulate(model.nb, geom.dyn_idx, kin, pts_pos, forces)

        # ---- ABA + integrate (engine.integrate) --------------------------
        qdd, a0 = _aba(model, layout, inertias, kin, qd, tau_eff, f_ext, sim)

        R0 = kin["R0"]
        zg = jnp.zeros_like(pos[0])
        g_w = jnp.stack([zg, zg, zg + sim.gravity])
        g_b = sp.rtmul(R0, g_w)
        a0_true = a0 + jnp.concatenate([jnp.zeros_like(g_b), g_b])
        v0 = kin["v0"] + dt * a0_true
        w_w = sp.rmul(R0, v0[:3])
        v_w = sp.rmul(R0, v0[3:])
        v_w = jnp.clip(v_w, -100.0, 100.0)
        w_w = jnp.clip(w_w, -50.0, 50.0)
        qd = qd + dt * qdd
        qd = jnp.clip(qd, -vel_lim, vel_lim)
        q = q + dt * qd
        pos = pos + dt * v_w
        quat = _quat_integrate_t(quat, w_w, dt)
        lin_vel, ang_vel = v_w, w_w

    # ---- outputs (reporting mirrors sim.py:150-162 last-substep fields) ---
    q_out[:] = q
    qd_out[:] = qd
    pos_out[:] = pos
    quat_out[:] = quat
    lin_out[:] = lin_vel
    ang_out[:] = ang_vel
    anchors_out[:] = anchors
    tau_out[:] = tau_last
    zero = jnp.zeros(forces_last.shape[1:], dtype=jnp.float32)
    rep = []
    for b in range(nrb):
        acc = zero
        for p in range(P):
            if geom.report_idx[p] == b:
                acc = acc + forces_last[p]
        rep.append(acc)
    report_out[:] = jnp.stack(rep) / sim.substeps
    footpos_out[:] = pts_last[:nf]
    footvel_out[:] = vel_last[:nf]
    # body-point positions: the NEXT step's frozen-plane anchors
    bodypts_out[:] = pts_last[nf:]
    # thigh world positions for the planner (legged_env thigh_dyn_idx)
    thigh_out[:] = jnp.stack([kin_last["x"][int(i)] for i in thigh_dyn_idx])


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

def decimation_step(model: RobotModel, geom: ContactGeometry, sim: SimParams,
                    decimation: int, thigh_dyn_idx, inertias, phys, anchors,
                    goals, kp_eff, kd_eff, strengths, offsets, friction,
                    restitution, window, win_origin, planes, hs,
                    interpret: bool = False, blocks=None, starts=None,
                    win_r0: int = WIN_R0):
    """Run `decimation` physics substeps in one Pallas call.

    All array args are env-LAST:
      phys: dict(pos (3,N), quat (4,N), lin_vel, ang_vel, q (nq,N), qd)
      anchors (P,2,N); inertias (nb,6,6,N)
      goals (decimation, nq, N) PD joint-position targets
      kp_eff/kd_eff/strengths/offsets (nq,N); friction/restitution (N,)
      window (WIN_R, WIN_C, N) contact heightfield window (meters), OR
        window=None with blocks (T, B, R_pad, 128) + starts (N, 2) int32
        (terrain/patch.py patch_starts layout) — the kernel then DMAs the
        per-env windows itself from the raw table and transposes in VMEM,
        skipping the host-side extract + transpose HBM round-trips
      win_origin (2, N) world xy of window cell (0,0)
      planes (P-nf, 5, N) frozen local planes for body points
    Returns (phys', anchors', info) like physics/sim.py sim_step.
    """
    layout = quadruped.quad_layout(model)
    assert layout is not None, "pallas path requires the quadruped layout"
    assert sim.substeps == 1, "pallas path reports last-substep contacts"
    N = phys["pos"].shape[-1]
    nf = len(model.foot_body_index)
    P = len(geom.dyn_idx)
    nrb = model.num_bodies
    nq = model.nq
    nsub = decimation * sim.substeps

    tile = TILE if (N % TILE == 0) else N
    grid = (N // tile,)

    def espec(*lead):
        """BlockSpec for an env-last array with the given leading dims.

        The index map takes *_ so the same spec works with and without a
        scalar-prefetch operand (which is appended to index-map args)."""
        nlead = len(lead)
        return pl.BlockSpec(tuple(lead) + (tile,),
                            lambda g, *_, _n=nlead: (0,) * _n + (g,),
                            memory_space=pltpu.VMEM)

    def cspec(*shape):
        """Replicated (grid-invariant) constant input."""
        nd = len(shape)
        return pl.BlockSpec(tuple(shape), lambda g, *_, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    fused_window = window is None
    if fused_window:
        kernel = functools.partial(_substep_kernel_fused, model, layout, geom,
                                   sim, decimation, hs,
                                   tuple(int(i) for i in thigh_dyn_idx),
                                   int(win_r0))
    else:
        kernel = functools.partial(_substep_kernel, model, layout, geom, sim,
                                   decimation, hs,
                                   tuple(int(i) for i in thigh_dyn_idx))

    cnq = jnp.asarray(np.stack([
        model.pos_limit[:, 0], model.pos_limit[:, 1],
        0.8 * model.effort_limit, model.vel_limit]), dtype=jnp.float32)
    cgeom = jnp.asarray(np.stack([geom.radius, geom.eff_mass]),
                        dtype=jnp.float32)

    out_shapes = (
        jax.ShapeDtypeStruct((nq, N), jnp.float32),       # q
        jax.ShapeDtypeStruct((nq, N), jnp.float32),       # qd
        jax.ShapeDtypeStruct((3, N), jnp.float32),        # pos
        jax.ShapeDtypeStruct((4, N), jnp.float32),        # quat
        jax.ShapeDtypeStruct((3, N), jnp.float32),        # lin_vel
        jax.ShapeDtypeStruct((3, N), jnp.float32),        # ang_vel
        jax.ShapeDtypeStruct((P, 2, N), jnp.float32),     # anchors
        jax.ShapeDtypeStruct((nrb, 3, N), jnp.float32),   # contact report
        jax.ShapeDtypeStruct((nf, 3, N), jnp.float32),    # foot pos
        jax.ShapeDtypeStruct((nf, 3, N), jnp.float32),    # foot vel
        jax.ShapeDtypeStruct((4, 3, N), jnp.float32),     # thigh pos
        jax.ShapeDtypeStruct((nq, N), jnp.float32),       # torques
        jax.ShapeDtypeStruct((P - nf, 3, N), jnp.float32),  # body points
    )
    out_specs = (espec(nq), espec(nq), espec(3), espec(4), espec(3), espec(3),
                 espec(P, 2), espec(nrb, 3), espec(nf, 3), espec(nf, 3),
                 espec(4, 3), espec(nq), espec(P - nf, 3))
    in_specs = [espec(nq), espec(nq), espec(3), espec(4), espec(3), espec(3),
                espec(P, 2), espec(model.nb, 6, 6), espec(nsub, nq),
                espec(nq), espec(nq), espec(nq), espec(nq),
                espec(1), espec(1)]
    operands = [phys["q"], phys["qd"], phys["pos"], phys["quat"],
                phys["lin_vel"], phys["ang_vel"], anchors, inertias, goals,
                kp_eff, kd_eff, strengths, offsets,
                friction.reshape(1, N), restitution.reshape(1, N)]
    tail_specs = [espec(2), espec(P - nf, 5), cspec(4, nq), cspec(2, P)]
    tail_operands = [win_origin, planes, cnq, cgeom]

    if fused_window:
        # starts arrive (N, 2); ship SMEM-friendly as (2, n_pad) like
        # ops/pallas_patch.py (SMEM pads each row)
        pad = (-N) % tile
        if pad:
            starts = jnp.concatenate(
                [starts, jnp.zeros((pad, 2), dtype=starts.dtype)], axis=0)
        starts_t = starts.T
        outs = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=in_specs
                + [pl.BlockSpec(memory_space=pl.ANY)] + tail_specs,
                out_specs=out_specs,
                scratch_shapes=[
                    pltpu.VMEM((tile, WIN_R, WIN_C), blocks.dtype),
                    pltpu.SemaphoreType.DMA((tile,))],
            ),
            out_shape=out_shapes,
            interpret=interpret,
        )(starts_t, *operands, blocks, *tail_operands)
    else:
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs + [espec(WIN_R, WIN_C)] + tail_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(*operands, window, *tail_operands)

    (q, qd, pos, quat, lin_vel, ang_vel, anchors_n, report, foot_pos,
     foot_vel, thigh_pos, torques, body_pts) = outs
    phys_n = dict(pos=pos, quat=quat, lin_vel=lin_vel, ang_vel=ang_vel,
                  q=q, qd=qd)
    info = dict(contact_forces=report, foot_pos=foot_pos, foot_vel=foot_vel,
                thigh_pos=thigh_pos, torques=torques, body_pts=body_pts)
    return phys_n, anchors_n, info
