"""Contact-solver stress tests where DTC lives: rims, edges, friction cones.

SURVEY.md §7 ranks contact fidelity on stair edges / stepping-stone rims as
risk #1; the reference delegates these cases to PhysX TGS (solver knobs
legged_robot_config.py:215-226).  These tests pin the behavioral contract
of the anchored-stiction penalty solver (physics/engine.py):

  * a loaded point half-on a stone rim holds position (no tangential creep)
  * Coulomb cone on a 0.4-slope: mu below tan(theta) slides, above sticks
  * a fast step-down over a stair edge lands on the lower tread (no tunnel)
  * a full Lite3 standing with feet on rim edges neither creeps nor sinks
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.physics import engine, sim as psim
from deep_tracking_control_tpu.robot import quadrupeds

SIM = engine.SimParams()
DT = SIM.dt


def _point_sim(terrain_fn, x0, v0, mu, steps, mass=0.6, radius=0.0,
               ext_force=(0.0, 0.0, 0.0)):
    """Integrate one contact point under gravity + ext_force through the
    anchored penalty contact — the isolated foot-on-terrain system."""
    pos = jnp.asarray(x0, dtype=jnp.float32).reshape(1, 3, 1)
    vel = jnp.asarray(v0, dtype=jnp.float32).reshape(1, 3, 1)
    anchors = pos[:, :2, :]
    fr = jnp.full((1,), mu, dtype=jnp.float32)
    rest = jnp.zeros((1,), dtype=jnp.float32)
    g = jnp.asarray([0.0, 0.0, SIM.gravity], dtype=jnp.float32).reshape(1, 3, 1)
    fext = jnp.asarray(ext_force, dtype=jnp.float32).reshape(1, 3, 1)
    rad = np.array([radius], dtype=np.float32)
    m_eff = np.array([mass], dtype=np.float32)

    @jax.jit
    def run(pos, vel, anchors):
        def body(c, _):
            pos, vel, anchors = c
            f, anchors = engine.heightfield_contact(
                pos, vel, jnp.asarray(rad), jnp.asarray(m_eff), anchors,
                terrain_fn, fr, rest, SIM, DT)
            acc = g + (f + fext) / mass
            vel = vel + DT * acc
            pos = pos + DT * vel
            return (pos, vel, anchors), pos[0, :, 0]
        (pos, vel, anchors), traj = jax.lax.scan(body, (pos, vel, anchors),
                                                 None, length=steps)
        return pos, vel, traj

    pos, vel, traj = run(pos, vel, anchors)
    return np.asarray(pos)[0, :, 0], np.asarray(vel)[0, :, 0], np.asarray(traj)


def test_rim_hold_no_creep():
    """A point loaded ON the rim of a stone (strong edge slope under the
    contact normal) must hold its xy position for a full second."""
    # stone occupies x < 0 at h=0; hole at depth -2 for x > 0; the bilinear
    # cell at the rim produces a steep capped slope like the real grid
    def terrain_fn(x, y):
        h = jnp.where(x < 0.0, 0.0, jnp.maximum(-2.0, -x * 40.0))
        dhdx = jnp.where((x > -0.025) & (x < 0.05), -3.0, 0.0)  # capped slope
        h_max = jnp.where(x < 0.05, 0.0, h)    # cell max corner = stone top
        return h, dhdx, jnp.zeros_like(x), h_max

    # start ON the stone 1 cm from the edge, pressed by half a robot weight
    p0, v0, traj = _point_sim(terrain_fn, [-0.01, 0.0, -0.005], [0, 0, 0],
                              mu=1.0, steps=200, ext_force=(0.0, 0.0, -30.0))
    assert abs(p0[0] - (-0.01)) < 0.004, p0   # < 4 mm drift in 1 s
    assert abs(p0[1]) < 0.004, p0
    assert p0[2] > -0.02, p0                  # supported, not falling


def test_friction_cone_on_slope():
    """tan(theta)=0.4 incline: mu=0.2 slides down, mu=0.6 sticks."""
    def terrain_fn(x, y):
        h = -0.4 * x
        return h, jnp.full_like(x, -0.4), jnp.zeros_like(x), h + 0.02

    # low friction: must slide (downhill = +x)
    p_lo, v_lo, _ = _point_sim(terrain_fn, [0.0, 0.0, -0.005], [0, 0, 0],
                               mu=0.2, steps=200)
    assert p_lo[0] > 0.05, p_lo               # slid noticeably downhill
    # high friction: must stick
    p_hi, v_hi, _ = _point_sim(terrain_fn, [0.0, 0.0, -0.005], [0, 0, 0],
                               mu=0.6, steps=200)
    assert abs(p_hi[0]) < 0.005, p_hi
    assert np.linalg.norm(v_hi[:2]) < 0.01, v_hi


def test_stair_edge_step_down_no_tunnel():
    """A point moving fast over a stair edge drops to the LOWER tread and
    stops there — it must not pass through either surface."""
    def terrain_fn(x, y):
        h = jnp.where(x < 0.0, 0.0, -0.15)    # 15 cm riser at x=0
        return h, jnp.zeros_like(x), jnp.zeros_like(x), h

    # just past the edge at 1 m/s, falling 3 m/s (hard touchdown on the
    # lower tread; a start BEFORE the edge correctly sticks on the upper
    # tread — the hard landing saturates friction and kills the slide)
    p, v, traj = _point_sim(terrain_fn, [0.02, 0.0, 0.0], [1.0, 0.0, -3.0],
                            mu=0.6, steps=200)
    assert p[2] > -0.17, p                    # never below the lower tread
    assert p[2] < -0.10, p                    # settled ON the lower tread
    assert np.min(traj[:, 2]) > -0.20         # no transient tunneling


def test_lite3_stands_on_stone_rims():
    """Full robot: Lite3 standing with front feet on stone rims (half-on,
    steep slope at the contact) holds pose for 1 s — no creep, no sink."""
    model = quadrupeds.get_robot("lite3")
    geom = psim.default_contact_geometry(model)
    inertias, _ = engine.make_inertias(model, num_envs=1)
    N = 1

    # stones at the front-feet x (+0.18): rim passes through the foot
    # center line; hind feet on solid ground
    def terrain_fn(x, y):
        hole = (x > 0.18) & (x < 0.45)
        h = jnp.where(hole, -2.0, 0.0)
        dhdx = jnp.where((x > 0.155) & (x < 0.23), -3.0, 0.0)
        # rim cells (within one cell of the edges) keep the stone-top max
        h_max = jnp.where((x > 0.23) & (x < 0.40), h, 0.0)
        return h, dhdx, jnp.zeros_like(x), h_max

    q0 = np.array([0.0, -0.934, 1.571] * 4, dtype=np.float32)
    phys = engine.make_state(
        pos=jnp.asarray([[0.0], [0.0], [0.335]]),
        quat=jnp.zeros((4, N)).at[3].set(1.0),
        lin_vel=jnp.zeros((3, N)), ang_vel=jnp.zeros((3, N)),
        q=jnp.asarray(q0)[:, None], qd=jnp.zeros((12, N)))
    anchors = psim.init_anchors(geom, N)
    fr = jnp.full((N,), 0.8)
    rest = jnp.zeros((N,))
    kp = 30.0 * jnp.ones((12, N))
    kd = 1.0 * jnp.ones((12, N))
    goal = jnp.asarray(q0)[:, None]

    @jax.jit
    def run(phys, anchors):
        def body(c, _):
            phys, anchors = c
            tau = kp * (goal - phys["q"]) - kd * phys["qd"]
            phys, anchors, info = psim.sim_step(
                model, geom, SIM, inertias, phys, anchors, tau,
                terrain_fn, fr, rest)
            return (phys, anchors), (phys["pos"][:, 0],
                                     info["foot_pos"][:, :, 0])
        (phys, anchors), (base_traj, foot_traj) = jax.lax.scan(
            body, (phys, anchors), None, length=200)
        return base_traj, foot_traj

    base_traj, foot_traj = run(phys, anchors)
    base_traj = np.asarray(base_traj)
    foot_traj = np.asarray(foot_traj)
    # base holds height (no sink through rims, no launch)
    assert base_traj[-1, 2] > 0.24, base_traj[-1]
    assert base_traj[-1, 2] < 0.40, base_traj[-1]
    # base xy creep < 3 cm over 1 s
    assert np.linalg.norm(base_traj[-1, :2]) < 0.03, base_traj[-1]
    # front feet (x ~ +0.18) never tunnel into the hole (z stays near 0)
    front = foot_traj[:, foot_traj[0, :, 0] > 0.05, :]
    assert np.min(front[..., 2]) > -0.08, np.min(front[..., 2])
