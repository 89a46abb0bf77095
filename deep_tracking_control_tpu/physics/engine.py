"""Articulated rigid-body physics in JAX — the PhysX replacement.

The reference delegates all dynamics to the external isaacgym binary (PhysX
TGS on CUDA); only its call surface is visible (SURVEY.md §2.9,
legged_robot.py:102-111 simulate loop, :755-784 state tensors).  This module
provides the equivalent capability as pure JAX: batched Featherstone
articulated-body dynamics (ABA) over the kinematic tree, penalty-based
heightfield contact, and semi-implicit Euler integration — one fused XLA
program over the whole env batch.

Layout: component axes lead, env batch axis trails (see ops/spatial.py).
State mirrors Isaac's root-state layout: world-frame base pos / xyzw quat /
world lin vel / world ang vel (legged_robot.py:140-147 slices).

Solver-fidelity notes vs the reference PhysX config
(legged_robot_config.py:209-226): dt defaults to 0.005; PhysX's TGS position
iterations are replaced by (a) an implicitly-solved penalty normal spring,
(b) stiction-anchor tangential friction, (c) a small joint armature
regularizer, and (d) a per-contact force clamp playing the role of
max_depenetration_velocity.  Behavioural gates (drop/stand/friction tests)
live in tests/test_physics.py.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import spatial as sp
from ..ops import quat as qm
from ..robot.model import RobotModel


@dataclasses.dataclass(frozen=True)
class SimParams:
    """Static solver parameters (legged_robot_config.py:209-226 equivalents)."""
    dt: float = 0.005
    substeps: int = 1                 # inner contact/integration substeps
    gravity: float = -9.81
    contact_stiffness: float = 12000.0   # N/m (URDF foot contact: 30000, softened for explicit stepping)
    contact_damping: float = 150.0       # N s/m, on approach
    friction_vel_eps: float = 0.1        # regularized Coulomb slip velocity [m/s]
    max_contact_force: float = 1500.0    # per-point clamp (max_depenetration analog)
    armature: float = 0.008              # kg m^2, TGS-stabilization analog
    joint_friction: float = 0.02         # N m viscous
    bounce_threshold: float = 0.5        # [m/s] (legged_robot_config.py:222)
    limit_stiffness: float = 300.0       # N m/rad joint-limit spring
    limit_damping: float = 3.0           # N m s/rad beyond the limit
    tangential_stiffness: float = 12000.0  # N/m stiction anchor spring
    tangential_damping: float = 80.0     # N s/m tangential
    # slope cap for the CONTACT NORMAL on walkable cells (the samplers cap
    # geometry at 3.0); 1.0 = 45deg, above every walkable generated slope.
    normal_slope_cap: float = 1.0
    # Cliff cells (bilinear pseudo-slope >= cliff_threshold: stepping-stone
    # rims, stair risers) get sphere-on-corner semantics: a point within
    # cliff_active_depth of the cell's TOP corner is supported AT the top
    # with an UP normal (PhysX-on-trimesh rim behavior: a foot half-on a
    # rim stands on the flat top, no lateral ejection); a point deeper down
    # hits the face ramp with the full tilted normal (the riser "wall").
    # The foot radius (0.022) ~ half a grid cell, so corner support within
    # one cell of the edge is exactly the sphere-resting-on-corner contact.
    cliff_threshold: float = 2.0
    cliff_active_depth: float = 0.06


class PhysicsState(dict):
    """Physics state pytree (plain dict for pytree simplicity).

    keys: pos (3,N), quat (4,N) xyzw, lin_vel (3,N) world, ang_vel (3,N)
    world, q (nq,N), qd (nq,N).
    """


def make_state(pos, quat, lin_vel, ang_vel, q, qd) -> dict:
    return dict(pos=pos, quat=quat, lin_vel=lin_vel, ang_vel=ang_vel, q=q, qd=qd)


def make_inertias(model: RobotModel, payload=None, com_disp=None,
                  link_mass_scale=None, num_envs: int | None = None):
    """Per-env spatial inertias (nb, 6, 6, N) with domain randomization.

    payload (N,) adds mass to the base; com_disp (3,N) displaces the base COM
    (legged_robot.py:511-527 _process_rigid_body_props); link_mass_scale (N,)
    scales non-base link masses (:520-525).  Also returns per-env total mass
    (N,) (robot_mass, used by the powerchange reward legged_robot.py:1512).
    """
    N = num_envs if num_envs is not None else (
        payload.shape[-1] if payload is not None else 1)
    ones = jnp.ones((N,), dtype=jnp.float32)
    inertias = []
    total_mass = jnp.zeros((N,), dtype=jnp.float32)
    for i in range(model.nb):
        m = jnp.asarray(model.mass[i], dtype=jnp.float32) * ones
        c = jnp.asarray(model.com[i], dtype=jnp.float32)[:, None] * ones
        Ic = jnp.asarray(model.inertia[i], dtype=jnp.float32)[:, :, None] * ones
        if i == 0:
            if payload is not None:
                m = m + payload
            if com_disp is not None:
                c = c + com_disp
        elif link_mass_scale is not None:
            m = m * link_mass_scale
            Ic = Ic * link_mass_scale
        total_mass = total_mass + m
        inertias.append(sp.spatial_inertia(m, c, Ic))
    return jnp.stack(inertias), total_mass


def fk(model: RobotModel, state: dict):
    """Forward kinematics + velocities.

    Returns dict with, per dynamic body (leading index b over nb):
      R (nb,3,3,N) body->world, x (nb,3,N) world origin,
      v (nb,6,N) spatial velocity in BODY coords,
      and per-joint child transform E (list of (3,3,N)), r (list (3,)).
    """
    N = state["pos"].shape[-1]
    R0 = qm.quat_to_rotmat(jnp.moveaxis(state["quat"], 0, -1))  # (N,3,3)
    R0 = jnp.moveaxis(R0, 0, -1)  # (3,3,N)
    w0_b = sp.rtmul(R0, state["ang_vel"])
    v0_b = sp.rtmul(R0, state["lin_vel"])
    R = [R0]
    x = [state["pos"]]
    v = [jnp.concatenate([w0_b, v0_b])]
    E_list, r_list = [None], [None]
    for i in range(1, model.nb):
        j = i - 1
        p = int(model.parent[i])
        qj = state["q"][j]
        Rj = sp.axis_rotation(model.joint_axis[j], qj)          # (3,3,N)
        R_pc = jnp.asarray(model.joint_R[j], dtype=jnp.float32)[:, :, None]
        R_pc = sp.mmul(jnp.broadcast_to(R_pc, (3, 3, N)), Rj)   # child axes in parent coords
        E = jnp.swapaxes(R_pc, 0, 1)                            # parent->child coord xform
        r = jnp.asarray(model.joint_t[j], dtype=jnp.float32)[:, None]
        S = jnp.concatenate([jnp.asarray(model.joint_axis[j], dtype=jnp.float32),
                             jnp.zeros(3, dtype=jnp.float32)])[:, None]
        vi = sp.xm_apply(E, r, v[p]) + S * state["qd"][j]
        R.append(sp.mmul(R[p], R_pc))
        x.append(x[p] + sp.rmul(R[p], jnp.broadcast_to(r, (3, N))))
        v.append(vi)
        E_list.append(E)
        r_list.append(r)
    return dict(R=jnp.stack(R), x=jnp.stack(x), v=jnp.stack(v),
                E=E_list, r=r_list)


def body_point_state(kin, dyn_idx: np.ndarray, offsets: np.ndarray):
    """World position & velocity of fixed body-frame points.

    dyn_idx (P,) int, offsets (P,3) static -> pos (P,3,N), vel (P,3,N).
    Point velocity = R (v_b + w_b x c)  (spatial velocity at body origin).
    """
    Rb = kin["R"][dyn_idx]            # (P,3,3,N)
    xb = kin["x"][dyn_idx]            # (P,3,N)
    vb = kin["v"][dyn_idx]            # (P,6,N)
    N = xb.shape[-1]
    P = len(dyn_idx)
    off = jnp.broadcast_to(
        jnp.asarray(offsets, dtype=jnp.float32)[:, :, None], (P, 3, N))
    pos = xb + jnp.einsum("pij...,pj...->pi...", Rb, off)
    wl = jnp.moveaxis(vb[:, :3], 1, 0)   # (3,P,N)
    vl = jnp.moveaxis(vb[:, 3:], 1, 0)
    cl = jnp.moveaxis(off, 1, 0)
    vel_b = vl + sp.cross3(wl, cl)       # (3,P,N)
    vel = jnp.einsum("pij...,jp...->pi...", Rb, vel_b)  # (P,3,N)
    return pos, vel


def aba(model: RobotModel, inertias, kin, qd, tau, f_ext, sim: SimParams):
    """Featherstone articulated-body algorithm (batched, env-trailing).

    inertias: (nb,6,6,N); qd: (nq,N); tau: (nq,N) joint torques;
    f_ext: (nb,6,N) spatial forces on each body in WORLD-aligned coords at
    the body origin ([torque; force]).
    Returns (qdd (nq,N), a0 (6,N) base spatial acceleration in base coords,
    in the gravity-as-apparent-acceleration form).
    """
    nb = model.nb
    v = kin["v"]
    N = v.shape[-1]
    S = [jnp.concatenate([jnp.asarray(model.joint_axis[j], dtype=jnp.float32),
                          jnp.zeros(3, dtype=jnp.float32)]) for j in range(nb - 1)]

    IA = [inertias[i] for i in range(nb)]
    pA = []
    for i in range(nb):
        vi = v[i]
        Iv = sp.imul(IA[i], vi)
        p_i = sp.crf(vi, Iv)
        # external force: world-aligned coords at body origin -> body coords
        Rb = kin["R"][i]
        fx = f_ext[i]
        n_b = sp.rtmul(Rb, fx[:3])
        f_b = sp.rtmul(Rb, fx[3:])
        pA.append(p_i - jnp.concatenate([n_b, f_b]))

    U = [None] * nb
    d = [None] * nb
    u = [None] * nb
    c = [None] * nb
    for i in range(1, nb):
        c[i] = sp.crm(v[i], S[i - 1][:, None] * qd[i - 1])  # v_i x (S qdot)

    # backward pass
    for i in range(nb - 1, 0, -1):
        j = i - 1
        p = int(model.parent[i])
        Si = S[j][:, None]
        Ui = sp.imul(IA[i], jnp.broadcast_to(Si, (6, N)))
        di = sp.dot_leading(jnp.broadcast_to(Si, (6, N)), Ui) + sim.armature
        tau_j = tau[j] - sim.joint_friction * qd[j]
        ui = tau_j - sp.dot_leading(jnp.broadcast_to(Si, (6, N)), pA[i])
        U[i], d[i], u[i] = Ui, di, ui
        Ia = IA[i] - sp.outer_leading(Ui, Ui) / di
        pa = pA[i] + sp.imul(Ia, c[i]) + Ui * (ui / di)
        E, r = kin["E"][i], kin["r"][i]
        IA[p] = IA[p] + sp.inertia_transform_to_parent(E, r, Ia)
        pA[p] = pA[p] + sp.xf_inv_apply(E, r, pa)

    # base: solve IA0 a0 = -pA0  (gravity handled as apparent acceleration)
    # unrolled LDL^T in the lane-aligned layout (a batched LU kernel is slow)
    a0 = -sp.solve_spd6(IA[0], pA[0])

    a = [a0]
    qdd = []
    for i in range(1, nb):
        j = i - 1
        p = int(model.parent[i])
        E, r = kin["E"][i], kin["r"][i]
        Si = S[j][:, None]
        a_p = sp.xm_apply(E, r, a[p]) + c[i]
        qdd_j = (u[i] - sp.dot_leading(U[i], a_p)) / d[i]
        a.append(a_p + Si * qdd_j)
        qdd.append(qdd_j)
    return jnp.stack(qdd), a0


def integrate(model: RobotModel, state: dict, kin, qdd, a0, sim: SimParams, dt):
    """Semi-implicit Euler step in the TPU-first layout."""
    R0 = kin["R"][0]
    # true base accel = apparent + gravity (in base coords)
    g_w = jnp.array([0.0, 0.0, sim.gravity], dtype=jnp.float32)[:, None]
    g_b = sp.rtmul(R0, jnp.broadcast_to(g_w, state["pos"].shape))
    a0_true = a0 + jnp.concatenate([jnp.zeros_like(g_b), g_b])
    v0 = kin["v"][0] + dt * a0_true
    w_w = sp.rmul(R0, v0[:3])
    v_w = sp.rmul(R0, v0[3:])
    # clamp base velocities (asset max_linear/max_angular_velocity analog)
    v_w = jnp.clip(v_w, -100.0, 100.0)
    w_w = jnp.clip(w_w, -50.0, 50.0)

    qd = state["qd"] + dt * qdd
    vel_lim = jnp.asarray(model.vel_limit, dtype=jnp.float32)[:, None]
    qd = jnp.clip(qd, -vel_lim, vel_lim)
    q = state["q"] + dt * qd

    pos = state["pos"] + dt * v_w
    quat_n = qm.quat_integrate(jnp.moveaxis(state["quat"], 0, -1),
                               jnp.moveaxis(w_w, 0, -1), dt)
    return make_state(pos, jnp.moveaxis(quat_n, -1, 0), v_w, w_w, q, qd)


def heightfield_contact(points_pos, points_vel, point_radius, point_eff_mass,
                        anchors, terrain_fn, friction, restitution,
                        sim: SimParams, dt):
    """Anchored penalty contact of spheres against a heightfield.

    points_pos/vel: (P,3,N); point_radius, point_eff_mass: (P,) static;
    anchors: (P,2,N) world-xy stiction anchors carried in the physics state.
    terrain_fn(x, y) -> (height, dh/dx, dh/dy, h_max) where h_max is the
    MAX of the bilinear cell's four corner heights (the rim-top support
    height; see SimParams.cliff_threshold).
    friction/restitution: (N,) per-env (DR buckets, legged_robot.py:438-460).
    Returns (forces (P,3,N) world, new_anchors (P,2,N)).

    Solver design (the PhysX-TGS behavioural analog):
    * Normal: spring-damper solved IMPLICITLY against the point's effective
      mass — fn = (k pen - (k dt + d) vn) / (1 + (k dt + d) dt / m_eff) —
      unconditionally stable for light links (a raw explicit spring violates
      k dt^2/m << 1 for a 0.17 kg foot at dt = 0.005), restitution ~ 0
      matching the reference terrain (legged_robot_config.py:28); per-env
      restitution DR softens the separation damping.
    * Tangential: true STICTION via per-contact anchor springs.  A velocity-
      level friction force can only decelerate m_eff per step, which creeps
      under sustained load (slopes, stair edges); the anchor spring holds
      position exactly until the friction cone |ft| <= mu fn saturates, then
      the anchor slides to the cone boundary (standard anchored-friction
      contact; what stepping-stone footholds need).
    """
    x, y, z = points_pos[:, 0], points_pos[:, 1], points_pos[:, 2]
    h, dhdx, dhdy, h_max = terrain_fn(x, y)
    zr = z - point_radius[:, None]

    # cliff cells: sphere-on-corner support near the TOP (normal up, height
    # = max corner), face ramp below (tilted normal = the riser wall)
    cliff = (jnp.abs(dhdx) >= sim.cliff_threshold) | \
            (jnp.abs(dhdy) >= sim.cliff_threshold)
    near_top = (h_max - zr) < sim.cliff_active_depth
    cliff_sup = cliff & near_top
    h_eff = jnp.where(cliff_sup, h_max, h)

    # normal: up on corner support; capped tilt on walkable cells; full
    # (geometry-capped) tilt on cliff faces
    ncap = sim.normal_slope_cap
    gx = jnp.where(cliff_sup, 0.0,
                   jnp.where(cliff, dhdx, jnp.clip(dhdx, -ncap, ncap)))
    gy = jnp.where(cliff_sup, 0.0,
                   jnp.where(cliff, dhdy, jnp.clip(dhdy, -ncap, ncap)))
    nx, ny, nz = -gx, -gy, jnp.ones_like(h)
    inv_norm = jax.lax.rsqrt(nx * nx + ny * ny + 1.0)
    nx, ny, nz = nx * inv_norm, ny * inv_norm, nz * inv_norm

    pen = h_eff - zr                                          # vertical penetration
    vx, vy, vz = points_vel[:, 0], points_vel[:, 1], points_vel[:, 2]
    vn = vx * nx + vy * ny + vz * nz                          # >0 separating

    active = (pen > 0.0) & (pen < 0.5)                        # deep-pen guard
    m_eff = point_eff_mass[:, None]
    damp = jnp.where(vn < 0.0, sim.contact_damping,
                     sim.contact_damping * (1.0 - restitution))
    k = sim.contact_stiffness
    denom = 1.0 + (k * dt + damp) * dt / m_eff
    fn = (k * pen - (k * dt + damp) * vn) / denom
    fn = jnp.clip(fn, 0.0, sim.max_contact_force) * active

    # anchored stiction (implicit spring + damping on tangential velocity)
    kt, ct = sim.tangential_stiffness, sim.tangential_damping
    disp_x = x - anchors[:, 0]
    disp_y = y - anchors[:, 1]
    inv_t = 1.0 / (1.0 + (kt * dt + ct) * dt / m_eff)
    ft_x = -(kt * disp_x + ct * vx) * inv_t
    ft_y = -(kt * disp_y + ct * vy) * inv_t
    ft_mag = jnp.sqrt(ft_x * ft_x + ft_y * ft_y + 1e-12)
    ft_max = friction * fn
    scale = jnp.minimum(1.0, ft_max / ft_mag)
    ft_x = ft_x * scale * active
    ft_y = ft_y * scale * active

    # anchor update: follow the point when inactive; when the cone saturates,
    # slide the anchor so the spring sits exactly on the cone boundary
    slip = (scale < 1.0) & active
    new_ax = jnp.where(active & ~slip, anchors[:, 0],
                       jnp.where(slip, x + ft_x / kt, x))
    new_ay = jnp.where(active & ~slip, anchors[:, 1],
                       jnp.where(slip, y + ft_y / kt, y))
    new_anchors = jnp.stack([new_ax, new_ay], axis=1)

    fx = nx * fn + ft_x
    fy = ny * fn + ft_y
    fz = nz * fn
    return jnp.stack([fx, fy, fz], axis=1), new_anchors      # (P,3,N)


def accumulate_body_forces(nb, point_dyn_idx: np.ndarray, kin,
                           points_pos, forces):
    """Sum world point forces into per-dynamic-body spatial forces (nb,6,N),
    expressed world-aligned at each body origin."""
    xb = kin["x"][point_dyn_idx]                       # (P,3,N)
    arm = jnp.moveaxis(points_pos - xb, 1, 0)          # (3,P,N)
    f = jnp.moveaxis(forces, 1, 0)                     # (3,P,N)
    n = sp.cross3(arm, f)                              # torque about body origin
    wrench = jnp.concatenate([n, f])                   # (6,P,N)
    # segment-sum over the small static point axis as explicit adds (a
    # one-hot einsum would lower to a layout-thrashing dot_general)
    N = wrench.shape[-1]
    zero = jnp.zeros((6, N), dtype=wrench.dtype)
    out = []
    for b in range(nb):
        idxs = [p for p in range(len(point_dyn_idx)) if point_dyn_idx[p] == b]
        acc = zero
        for p in idxs:
            acc = acc + wrench[:, p]
        out.append(acc)
    return jnp.stack(out)
