"""45-dim non-DTC observation layout (lite3_rough_config.py:8).

The non-DTC tasks use the 53-dim DTC layout minus the 8-dim foothold
block; this pins the layout (width, block placement, history width) and
trains lite3_rough end-to-end for two iterations at the 45-dim width.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.env.legged_env import LeggedEnv
from deep_tracking_control_tpu.runner.train import OnPolicyRunner
from deep_tracking_control_tpu.tasks.registry import get_cfgs


def _tiny_rough(num_envs=8, T=4):
    task, train = get_cfgs("lite3_rough")
    task = dataclasses.replace(
        task,
        env=dataclasses.replace(task.env, num_envs=num_envs),
        terrain=dataclasses.replace(task.terrain, num_rows=2, num_cols=2,
                                    border_size=4.0,
                                    max_init_terrain_level=1),
        # obs noise draws are shape-dependent (a (N,53) uniform and a
        # (N,45) uniform differ everywhere), so pin it off for the
        # 45-vs-53 column comparison
        noise=dataclasses.replace(task.noise, add_noise=False))
    train = dataclasses.replace(
        train,
        runner=dataclasses.replace(train.runner, num_steps_per_env=T),
        algorithm=dataclasses.replace(train.algorithm,
                                      num_learning_epochs=1,
                                      num_mini_batches=2))
    return task, train


def test_45_dim_layout_matches_53_minus_foothold():
    task, _ = _tiny_rough()
    assert task.env.num_observations == 45
    env = LeggedEnv(task, terrain_seed=1)
    params, state = env.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    acts = 0.1 * jax.random.normal(key, (env.num_envs, env.num_actions))
    state, out = jax.jit(env.step)(params, state, acts, key)
    assert out["obs"].shape == (env.num_envs, 45)
    assert state["obs_history"].shape == (env.num_envs, 45 * 5)

    # same seeds on the 53-dim layout: the first 45 dims agree, the DTC
    # tail is the (zeroed) foothold block
    task53 = dataclasses.replace(
        task, env=dataclasses.replace(task.env, num_observations=53))
    env53 = LeggedEnv(task53, terrain_seed=1)
    params53, state53 = env53.init(jax.random.PRNGKey(0))
    state53, out53 = jax.jit(env53.step)(params53, state53, acts, key)
    np.testing.assert_allclose(np.asarray(out["obs"]),
                               np.asarray(out53["obs"][:, :45]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out53["obs"][:, 45:]), 0.0)


def test_invalid_obs_width_rejected():
    task, _ = _tiny_rough()
    task = dataclasses.replace(
        task, env=dataclasses.replace(task.env, num_observations=50))
    try:
        LeggedEnv(task, terrain_seed=1)
    except ValueError as e:
        assert "num_observations" in str(e)
    else:
        raise AssertionError("50-dim layout should be rejected")


def test_rough_trains_end_to_end_at_45():
    task, train = _tiny_rough()
    env = LeggedEnv(task)
    runner = OnPolicyRunner(env, train, log_dir=None)
    runner.learn(2, log_every=10**9)
    assert runner.current_learning_iteration == 2
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(runner.params))
