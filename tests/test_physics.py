"""Behavioral gates for the physics engine (the PhysX replacement).

Strategy per SURVEY.md §4: analytic cases (free fall, pendulum energy) +
behavioral gates (drop test settles, default-pose standing is stable).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.robot import quadrupeds
from deep_tracking_control_tpu.physics import engine, sim as psim
from deep_tracking_control_tpu.physics.engine import SimParams
from deep_tracking_control_tpu.terrain import grid as tgrid

MODEL = quadrupeds.lite3()
GEOM = psim.default_contact_geometry(MODEL)

DEFAULT_Q = np.array([0.1, -1.0, 1.8, -0.1, -1.0, 1.8,
                      0.1, -1.0, 1.8, -0.1, -1.0, 1.8])  # lite3_dtc_config.py:58-73


def make_state(n=2, pos_z=0.4, q=None):
    q = DEFAULT_Q if q is None else q
    return engine.make_state(
        pos=jnp.zeros((3, n)).at[2].set(pos_z),
        quat=jnp.zeros((4, n)).at[3].set(1.0),
        lin_vel=jnp.zeros((3, n)),
        ang_vel=jnp.zeros((3, n)),
        q=jnp.broadcast_to(jnp.asarray(q, dtype=jnp.float32)[:, None], (12, n)),
        qd=jnp.zeros((12, n)),
    )


def run_steps(state, n_steps, sim=None, tau=None, terrain=None, n_env=2):
    sim = sim or SimParams()
    terrain = terrain or tgrid.flat_grid()
    inertias, _ = engine.make_inertias(MODEL, num_envs=n_env)
    friction = jnp.ones(n_env)
    restitution = jnp.zeros(n_env)
    tau = jnp.zeros((12, n_env)) if tau is None else tau
    tfn = lambda x, y: tgrid.height_and_slope(terrain, x, y)

    anchors = psim.init_anchors(GEOM, n_env)

    @jax.jit
    def body(state, anchors):
        state, anchors, info = psim.sim_step(MODEL, GEOM, sim, inertias, state,
                                             anchors, tau, tfn, friction,
                                             restitution)
        return state, anchors, info

    info = None
    for _ in range(n_steps):
        state, anchors, info = body(state, anchors)
    return state, info


def test_free_fall():
    """No contact (high above ground): base falls at g, no spin."""
    state = make_state(pos_z=10.0)
    sim = SimParams()
    T = 0.2
    n = int(T / sim.dt)
    state, _ = run_steps(state, n, sim)
    z = np.asarray(state["pos"][2])
    # z = z0 - g t^2 / 2 (semi-implicit Euler adds +g*dt*t/2 correction)
    want = 10.0 - 0.5 * 9.81 * T**2
    np.testing.assert_allclose(z, want, atol=0.03)
    vz = np.asarray(state["lin_vel"][2])
    np.testing.assert_allclose(vz, -9.81 * T, atol=1e-2)
    # gravity creates no joint acceleration coupling spin at zero torque?
    # (joints DO accelerate under gravity; just check finiteness here)
    assert np.all(np.isfinite(np.asarray(state["q"])))


def test_fixed_joint_gravity_consistency():
    """Joint accelerations from ABA match a simple pendulum analytically.

    Lock the base by giving the 'torso' enormous inertia; command one leg as
    a pendulum: qdd = -(m g l / I) sin(theta)-ish at the HipY joint.  We
    check against finite differences of total energy instead: with zero
    torque and no contact, energy must be conserved.
    """
    sim = SimParams(armature=0.0, joint_friction=0.0)
    n = 2
    state = make_state(n=n, pos_z=50.0)
    inertias, mass = engine.make_inertias(MODEL, num_envs=n)
    tfn = lambda x, y: tgrid.height_and_slope(tgrid.flat_grid(), x, y)

    def energy(state):
        kin = engine.fk(MODEL, state)
        e = 0.0
        for i in range(MODEL.nb):
            v = kin["v"][i]
            Iv = jnp.einsum("ij...,j...->i...", inertias[i], v)
            e = e + 0.5 * jnp.einsum("i...,i...->...", v, Iv)
            com_w = kin["x"][i] + jnp.einsum(
                "ij...,j->i...", kin["R"][i], jnp.asarray(MODEL.com[i], dtype=jnp.float32))
            e = e + MODEL.mass[i] * 9.81 * com_w[2]
        return e

    anchors = psim.init_anchors(GEOM, n)

    @jax.jit
    def step(state, anchors):
        state, anchors, _ = psim.sim_step(MODEL, GEOM, sim, inertias, state,
                                          anchors, jnp.zeros((12, n)), tfn,
                                          jnp.ones(n), jnp.zeros(n))
        return state, anchors

    e0 = np.asarray(energy(state))
    for _ in range(40):  # 0.2 s of free flight with swinging legs
        state, anchors = step(state, anchors)
    e1 = np.asarray(energy(state))
    np.testing.assert_allclose(e1, e0, rtol=2e-3)


def test_drop_settles():
    """Drop with zero torque: the robot collapses onto its belly and rests
    (contact force supports exactly the robot weight; no explosion)."""
    state = make_state(n=2, pos_z=0.45)
    state, info = run_steps(state, 400)  # 2 s
    z = np.asarray(state["pos"][2])
    assert np.all(z > 0.05) and np.all(z < 0.5), f"settled z={z}"
    v = np.asarray(state["lin_vel"])
    assert np.all(np.abs(v) < 0.2), f"residual vel {v}"
    fp = np.asarray(info["foot_pos"][:, 2])
    assert np.all(fp < 0.1)
    # net contact force supports the weight at rest
    fz = np.asarray(info["contact_forces"][:, 2].sum(0))
    weight = MODEL.mass.sum() * 9.81
    np.testing.assert_allclose(fz, weight, rtol=0.15)


@pytest.mark.smoke
def test_standing_with_pd():
    """PD controller at default pose keeps the robot upright for 1 s."""
    n = 2
    state = make_state(n=n, pos_z=0.30)
    inertias, _ = engine.make_inertias(MODEL, num_envs=n)
    terrain = tgrid.flat_grid()
    tfn = lambda x, y: tgrid.height_and_slope(terrain, x, y)
    sim = SimParams()
    kp, kd = 25.0, 0.5  # lite3_dtc_config.py:104-105
    q_goal = jnp.asarray(DEFAULT_Q, dtype=jnp.float32)[:, None]
    effort = jnp.asarray(0.8 * MODEL.effort_limit, dtype=jnp.float32)[:, None]

    anchors = psim.init_anchors(GEOM, n)

    @jax.jit
    def step(state, anchors):
        tau = kp * (q_goal - state["q"]) - kd * state["qd"]
        tau = jnp.clip(tau, -effort, effort)
        state, anchors, info = psim.sim_step(MODEL, GEOM, sim, inertias, state,
                                             anchors, tau, tfn, jnp.ones(n),
                                             jnp.zeros(n))
        return state, anchors, info

    for _ in range(300):  # 1.5 s
        state, anchors, info = step(state, anchors)
    z = np.asarray(state["pos"][2])
    # gravity sag against kp=25 brings stance from 0.28 to ~0.21
    assert np.all(z > 0.15) and np.all(z < 0.4), f"standing height {z}"
    up = np.asarray(state["quat"][3])  # w close to 1 => roughly upright
    assert np.all(np.abs(up) > 0.99), f"tilted, quat w = {up}"
    q = np.asarray(state["q"])
    np.testing.assert_allclose(q, np.broadcast_to(DEFAULT_Q[:, None], q.shape),
                               atol=0.4)
    qd = np.asarray(state["qd"])
    # near-static: a small stiction/PD limit cycle (~0.1 rad/s) is acceptable
    assert np.all(np.abs(qd) < 0.5), "did not reach near-static equilibrium"


def test_friction_holds_on_slope():
    """On a 15-degree slope with mu=1.0 the standing robot must not slide."""
    n = 2
    slope = 0.27  # tan(15 deg)
    size, hs = 16.0, 0.05
    cells = int(size / hs)
    xs = (np.arange(cells) * hs - size / 2)
    hf = np.broadcast_to((xs * slope).astype(np.float32)[:, None], (cells, cells))
    terrain = tgrid.TerrainGrid(jnp.asarray(hf), hs, size / 2, is_plane=False)
    tfn = lambda x, y: tgrid.height_and_slope(terrain, x, y)
    inertias, _ = engine.make_inertias(MODEL, num_envs=n)
    sim = SimParams()
    kp, kd = 25.0, 0.5
    q_goal = jnp.asarray(DEFAULT_Q, dtype=jnp.float32)[:, None]
    state = make_state(n=n, pos_z=0.34)

    anchors = psim.init_anchors(GEOM, n)

    @jax.jit
    def step(state, anchors):
        tau = jnp.clip(kp * (q_goal - state["q"]) - kd * state["qd"], -24.0, 24.0)
        state, anchors, info = psim.sim_step(MODEL, GEOM, sim, inertias, state,
                                             anchors, tau, tfn, jnp.ones(n),
                                             jnp.zeros(n))
        return state, anchors, info

    for _ in range(300):
        state, anchors, _ = step(state, anchors)
    x = np.asarray(state["pos"][0])
    assert np.all(np.abs(x) < 0.25), f"slid to x={x}"
    assert np.all(np.asarray(state["pos"][2]) > 0.1)
