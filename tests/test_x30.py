"""X30 task: env construction + physics stability with X30 gains."""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.env.legged_env import LeggedEnv
from deep_tracking_control_tpu.physics import engine, sim as psim
from deep_tracking_control_tpu.physics.engine import SimParams
from deep_tracking_control_tpu.robot import quadrupeds
from deep_tracking_control_tpu.tasks.registry import get_cfgs
from deep_tracking_control_tpu.terrain import grid as tgrid


def test_x30_env_smoke():
    task, _ = get_cfgs("x30_dtc")
    task = dataclasses.replace(
        task,
        env=dataclasses.replace(task.env, num_envs=2),
        terrain=dataclasses.replace(task.terrain, num_rows=2, num_cols=2,
                                    border_size=4.0, max_init_terrain_level=1))
    env = LeggedEnv(task)
    assert env.model.name == "X30"
    # X30 gains resolved by substring (x30_dtc_config.py:118-119)
    np.testing.assert_allclose(env.p_gains[[0, 1, 2]], [120.0, 120.0, 150.0])
    np.testing.assert_allclose(env.d_gains[[0, 1, 2]], [3.0, 3.0, 3.5])
    params, state = env.init(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(3):
        state, out = step(params, state, jnp.zeros((2, 12)),
                          jax.random.PRNGKey(i))
    assert np.all(np.isfinite(np.asarray(out["obs"])))
    assert np.all(np.isfinite(np.asarray(out["rew"])))
    # x30 termination bodies: TORSO registered
    assert len(env.termination_idx) == 1


def test_x30_standing():
    """X30 with its PD gains stands on flat ground (31 kg robot)."""
    model = quadrupeds.x30()
    geom = psim.default_contact_geometry(model)
    default_q = np.array([0.1, -0.715, 1.43] * 4, dtype=np.float32)
    n = 2
    state = engine.make_state(
        pos=jnp.zeros((3, n)).at[2].set(0.48),
        quat=jnp.zeros((4, n)).at[3].set(1.0),
        lin_vel=jnp.zeros((3, n)), ang_vel=jnp.zeros((3, n)),
        q=jnp.broadcast_to(jnp.asarray(default_q)[:, None], (12, n)),
        qd=jnp.zeros((12, n)))
    inertias, _ = engine.make_inertias(model, num_envs=n)
    terrain = tgrid.flat_grid()
    tfn = lambda x, y: tgrid.height_and_slope(terrain, x, y)
    sim = SimParams()
    anchors = psim.init_anchors(geom, n)
    kp = jnp.asarray([120.0, 120.0, 150.0] * 4)[:, None]
    kd = jnp.asarray([3.0, 3.0, 3.5] * 4)[:, None]
    qg = jnp.asarray(default_q)[:, None]
    eff = jnp.asarray(0.8 * model.effort_limit)[:, None]

    @jax.jit
    def step(state, anchors):
        tau = jnp.clip(kp * (qg - state["q"]) - kd * state["qd"], -eff, eff)
        return psim.sim_step(model, geom, sim, inertias, state, anchors, tau,
                             tfn, jnp.ones(n), jnp.zeros(n))

    for _ in range(300):
        state, anchors, info = step(state, anchors)
    z = np.asarray(state["pos"][2])
    assert np.all(z > 0.3) and np.all(z < 0.6), f"X30 standing height {z}"
    assert np.all(np.abs(np.asarray(state["quat"][3])) > 0.99)
    fz = np.asarray(info["contact_forces"][:, 2].sum(0))
    weight = model.mass.sum() * 9.81
    np.testing.assert_allclose(fz, weight, rtol=0.3)
