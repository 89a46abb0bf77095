"""One physics step: FK -> contacts -> ABA -> integrate.

Equivalent capability to the reference's `gym.simulate(self.sim)` call
(legged_robot.py:107) plus the refresh_*/acquire_* state-tensor surface
(legged_robot.py:755-784): each step returns the new physics state and the
per-reporting-body net contact forces / body states the env layer consumes.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..robot.model import RobotModel
from . import engine, quadruped
from .engine import SimParams


@dataclasses.dataclass(frozen=True)
class ContactGeometry:
    """Static contact sample points for a robot.

    Feet come from the URDF sphere collision (Lite3.urdf:127-132).  The other
    bodies' mesh collision shapes are approximated by sample spheres — they
    only feed the penalized/termination-contact logic (legged_robot.py:181,
    1350-1352) and keep a fallen robot from sinking through terrain.
    """
    dyn_idx: np.ndarray      # (P,) dynamic body of each point
    report_idx: np.ndarray   # (P,) reporting body for contact-force sums
    offset: np.ndarray       # (P,3) in body frame
    radius: np.ndarray       # (P,)
    eff_mass: np.ndarray     # (P,) effective mass for the implicit contact solve


def default_contact_geometry(model: RobotModel) -> ContactGeometry:
    dyn_idx, report_idx, offset, radius = [], [], [], []

    # feet (exact URDF spheres)
    for k in range(len(model.foot_body_index)):
        dyn_idx.append(int(model.foot_dyn_index[k]))
        report_idx.append(int(model.foot_body_index[k]))
        offset.append(model.foot_offset[k])
        radius.append(float(model.foot_radius[k]))

    # torso: 4 bottom corners + 4 top corners scaled from torso size
    torso_i = 0
    hx = float(np.max(np.abs(model.joint_t[0::3][:, 0]))) if model.nq >= 3 else 0.2
    hy = float(np.max(np.abs(model.joint_t[0::3][:, 1]))) + 0.02
    hz = 0.055
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                dyn_idx.append(torso_i)
                report_idx.append(0)
                offset.append(np.array([sx * hx, sy * hy, sz * hz]))
                radius.append(0.03)

    # knee point on each thigh (thigh tip) and mid-shank point
    dyn_names = model.dynamic_body_names
    for i, n in enumerate(dyn_names):
        if "THIGH" in n:
            knee_off = model.joint_t[i + 1 - 1] if i + 1 < model.nb else None
            # the child (shank) joint origin in thigh frame:
            child = [k for k in range(1, model.nb) if model.parent[k] == i]
            if child:
                t = model.joint_t[child[0] - 1]
                dyn_idx.append(i)
                report_idx.append(model.body_index(n))
                offset.append(t.copy())
                radius.append(0.03)
        if "SHANK" in n:
            # mid-shank bump (the knee housing), from the shank COM position
            dyn_idx.append(i)
            report_idx.append(model.body_index(n))
            offset.append(np.array([0.02, 0.0, model.com[i][2] * 0.8]))
            radius.append(0.025)

    dyn_idx = np.array(dyn_idx, dtype=np.int32)
    # effective mass of a point = merged mass of the body it attaches to
    # (the lightest mass the contact impulse must arrest in one step)
    eff_mass = np.maximum(model.mass[dyn_idx], 0.05).astype(np.float32)
    return ContactGeometry(
        dyn_idx=dyn_idx,
        report_idx=np.array(report_idx, dtype=np.int32),
        offset=np.stack(offset),
        radius=np.array(radius, dtype=np.float32),
        eff_mass=eff_mass,
    )


def init_anchors(geom: ContactGeometry, num_envs: int):
    """Fresh stiction anchors (reset together with the physics state)."""
    return jnp.zeros((len(geom.dyn_idx), 2, num_envs), dtype=jnp.float32)


def sim_step(model: RobotModel, geom: ContactGeometry, sim: SimParams,
             inertias, state: dict, anchors, tau, terrain_fn, friction,
             restitution, push_force=None):
    """Advance physics by sim.dt (with sim.substeps inner substeps).

    tau: (nq,N) joint torques held constant across substeps (matches the
    reference: torques set once per `gym.simulate` call, legged_robot.py:
    102-107).  push_force: optional (3,N) world force on the base (the
    `forces` buffer surface, legged_robot.py:550-556).

    Returns (new_state, info) where info carries:
      contact_forces (num_bodies, 3, N) net world contact force per reporting
      body; foot_pos / foot_vel (nf, 3, N); kin of the LAST substep.
    """
    nf = len(model.foot_body_index)
    dt = sim.dt / sim.substeps
    nrb = model.num_bodies

    contact_rep = None
    kin = None
    foot_pos = foot_vel = None
    # joint-limit enforcement (PhysX enforces URDF limits natively)
    lim_lo = jnp.asarray(model.pos_limit[:, 0], dtype=jnp.float32)[:, None]
    lim_hi = jnp.asarray(model.pos_limit[:, 1], dtype=jnp.float32)[:, None]
    layout = quadruped.quad_layout(model)
    for _ in range(sim.substeps):
        q = state["q"]
        tau_lim = (sim.limit_stiffness * (jnp.maximum(lim_lo - q, 0.0)
                                          - jnp.maximum(q - lim_hi, 0.0))
                   - sim.limit_damping * state["qd"]
                   * ((q < lim_lo) | (q > lim_hi)))
        kin = (quadruped.fk(model, layout, state) if layout is not None
               else engine.fk(model, state))
        pts_pos, pts_vel = engine.body_point_state(kin, geom.dyn_idx, geom.offset)
        forces, anchors = engine.heightfield_contact(
            pts_pos, pts_vel, jnp.asarray(geom.radius),
            jnp.asarray(geom.eff_mass), anchors, terrain_fn,
            friction, restitution, sim, dt)
        f_ext = engine.accumulate_body_forces(model.nb, geom.dyn_idx, kin,
                                              pts_pos, forces)
        if push_force is not None:
            zeros3 = jnp.zeros_like(push_force)
            base_wrench = jnp.concatenate([zeros3, push_force])
            f_ext = f_ext.at[0].add(base_wrench)
        if layout is not None:
            qdd, a0 = quadruped.aba(model, layout, inertias, kin,
                                    state["qd"], tau + tau_lim, f_ext, sim)
        else:
            qdd, a0 = engine.aba(model, inertias, kin, state["qd"],
                                 tau + tau_lim, f_ext, sim)
        state = engine.integrate(model, state, kin, qdd, a0, sim, dt)

        # reporting-body contact force sums (net_contact_force tensor
        # analog), as static per-body adds (see accumulate_body_forces)
        zero = jnp.zeros(forces.shape[1:], dtype=forces.dtype)
        rep = jnp.stack([
            sum((forces[p] for p in range(len(geom.report_idx))
                 if geom.report_idx[p] == b), zero)
            for b in range(nrb)])
        contact_rep = rep if contact_rep is None else contact_rep + rep
        foot_pos = pts_pos[:nf]
        foot_vel = pts_vel[:nf]

    contact_rep = contact_rep / sim.substeps
    info = dict(contact_forces=contact_rep, foot_pos=foot_pos,
                foot_vel=foot_vel, kin=kin)
    return state, anchors, info
