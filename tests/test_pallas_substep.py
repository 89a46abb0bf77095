"""Pallas decimation mega-kernel vs the XLA physics path.

The kernel (physics/pallas_substep.py) must reproduce the XLA decimation
loop (legged_env.step decim_body -> sim.sim_step) numerically: feet sample
the identical bilinear patch values from in-kernel bands; the only
documented deviation is frozen per-step planes for BODY contact points
(irrelevant while the robot stands on its feet).  Runs in interpret mode on
the CPU backend.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.env.legged_env import LeggedEnv
from deep_tracking_control_tpu.tasks.registry import get_cfgs


@pytest.fixture(scope="module")
def tiny_env():
    task, _ = get_cfgs("lite3_dtc")
    task = dataclasses.replace(
        task,
        env=dataclasses.replace(task.env, num_envs=4),
        # decimation 2 halves the interpret-mode substeps (dt changes with
        # it — parity holds at any decimation)
        control=dataclasses.replace(task.control, decimation=2),
        terrain=dataclasses.replace(task.terrain, num_rows=2, num_cols=2,
                                    border_size=4.0,
                                    max_init_terrain_level=1))
    return LeggedEnv(task)


def test_kernel_matches_xla_over_steps(tiny_env):
    """3 policy steps of drop + settle: state trajectories match the XLA
    path to float tolerance (chaos grows the bound)."""
    env = tiny_env
    key = jax.random.PRNGKey(0)
    params, state0 = env.init(key)
    actions = 0.1 * jax.random.normal(jax.random.PRNGKey(7),
                                      (3, 4, env.num_actions))

    def run(state, interpret):
        env._pallas_interpret = interpret
        env._pallas_physics = interpret   # CPU backend: kernel iff interpret
        outs = []
        for t in range(3):
            state, out = env.step(params, state, actions[t],
                                  jax.random.PRNGKey(100 + t))
            outs.append(out)
        return state, outs

    sx, ox = run(state0, False)
    sk, ok = run(state0, True)
    env._pallas_physics = True   # restore gate

    for k in ("pos", "q", "qd", "lin_vel", "ang_vel", "quat"):
        np.testing.assert_allclose(np.asarray(sx["phys"][k]),
                                   np.asarray(sk["phys"][k]),
                                   atol=5e-3, rtol=1e-3,
                                   err_msg=f"phys[{k}] diverged")
    np.testing.assert_allclose(np.asarray(ox[-1]["rew"]),
                               np.asarray(ok[-1]["rew"]), atol=1e-2)
    np.testing.assert_array_equal(np.asarray(ox[-1]["done"]),
                                  np.asarray(ok[-1]["done"]))


def test_kernel_single_step_tight(tiny_env):
    """One policy step from reset: near-bitwise parity (no body contact,
    identical sampling)."""
    env = tiny_env
    params, state = env.init(jax.random.PRNGKey(3))
    a = jnp.zeros((4, env.num_actions))
    k = jax.random.PRNGKey(11)
    env._pallas_interpret = False
    env._pallas_physics = False
    sx, _ = env.step(params, state, a, k)
    env._pallas_interpret = True
    env._pallas_physics = True
    sk, _ = env.step(params, state, a, k)
    for key_ in ("pos", "q", "qd", "lin_vel", "ang_vel", "quat"):
        np.testing.assert_allclose(np.asarray(sx["phys"][key_]),
                                   np.asarray(sk["phys"][key_]),
                                   atol=2e-5, rtol=1e-5)


def test_fused_window_matches_materialized(tiny_env, monkeypatch):
    """The in-kernel window DMA (_substep_kernel_fused) must be bitwise
    identical to the host-materialized extract+transpose path — same rows,
    same layout, same math."""
    env = tiny_env
    params, state = env.init(jax.random.PRNGKey(3))
    a = jnp.zeros((4, env.num_actions))
    k = jax.random.PRNGKey(11)
    env._pallas_interpret = True
    env._pallas_physics = True
    monkeypatch.setenv("DTC_FUSED_WINDOW", "0")
    s0, o0 = env.step(params, state, a, k)
    monkeypatch.setenv("DTC_FUSED_WINDOW", "1")
    s1, o1 = env.step(params, state, a, k)
    env._pallas_interpret = False
    for key_ in ("pos", "q", "qd", "lin_vel", "ang_vel", "quat"):
        np.testing.assert_array_equal(np.asarray(s0["phys"][key_]),
                                      np.asarray(s1["phys"][key_]),
                                      err_msg=f"phys[{key_}] differs")
    np.testing.assert_array_equal(np.asarray(o0["rew"]),
                                  np.asarray(o1["rew"]))


def test_kernel_settles_standing(tiny_env):
    """Long-horizon behavioral gate: under zero actions the robot settles
    on its feet (no explosion, no sink-through) with the kernel path."""
    env = tiny_env
    params, state = env.init(jax.random.PRNGKey(5))
    env._pallas_interpret = True
    env._pallas_physics = True
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(0)
    a = jnp.zeros((4, env.num_actions))
    for t in range(12):
        key, k = jax.random.split(key)
        state, out = step(params, state, a, k)
    env._pallas_interpret = False
    z = np.asarray(state["phys"]["pos"][2])
    oz = np.asarray(state["env_origins"][:, 2])
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(state["phys"])[0])))
    # bases rest between 5 cm and 45 cm above their tile origin
    assert np.all(z - oz > 0.02), (z, oz)
    assert np.all(z - oz < 0.5), (z, oz)
