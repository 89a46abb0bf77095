"""Sharded-vs-unsharded training equivalence (VERDICT r2 #6).

The env-axis GSPMD sharding (parallel/mesh.py) must not change the math:
with jax_threefry_partitionable the random draws are layout-independent,
so a 1-device and an 8-device run of the SAME seeded training program may
differ only by reduction order (advantage normalization, gradient means).
We assert:
  * iteration-1 update from identical rollouts yields near-identical
    params and loss scalars,
  * a 10-iteration run stays finite and tracks the unsharded loss
    trajectory through the early (pre-chaos-amplification) iterations,
  * the 8-device run's env state is actually laid out across all devices.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.env.legged_env import LeggedEnv
from deep_tracking_control_tpu.parallel import mesh as pmesh
from deep_tracking_control_tpu.runner.train import OnPolicyRunner
from deep_tracking_control_tpu.tasks.registry import get_cfgs


def _tiny(num_envs=16, T=4):
    task, train = get_cfgs("lite3_dtc")
    task = dataclasses.replace(
        task,
        env=dataclasses.replace(task.env, num_envs=num_envs),
        terrain=dataclasses.replace(task.terrain, num_rows=2, num_cols=2,
                                    border_size=4.0,
                                    max_init_terrain_level=1))
    train = dataclasses.replace(
        train,
        runner=dataclasses.replace(train.runner, num_steps_per_env=T),
        algorithm=dataclasses.replace(train.algorithm,
                                      num_learning_epochs=1,
                                      num_mini_batches=2,
                                      # pin an explicit stratum count so
                                      # the 1-dev and 8-dev runs draw the
                                      # SAME minibatch partition (auto
                                      # would give S=1 vs S=8)
                                      shuffle_strata=8))
    return task, train


def _make_runner(n_devices):
    task, train = _tiny()
    env = LeggedEnv(task)
    mesh = pmesh.make_mesh(jax.devices()[:n_devices])
    return OnPolicyRunner(env, train, log_dir=None, mesh=mesh)


def _run_iters(runner, n):
    """Drive n raw train iterations, returning the per-iteration stats."""
    out = []
    for _ in range(n):
        (runner.params, runner.opt_state, runner.vae_opt_state,
         runner.learning_rate, runner.env_state, runner._log_state,
         runner.key, stats) = runner._train_iter(
            runner.params, runner.opt_state, runner.vae_opt_state,
            runner.learning_rate, runner.env_params, runner.env_state,
            runner._log_state, runner.key)
        import numpy as _np
        out.append(dict(zip(runner._stat_names,
                            _np.asarray(jax.device_get(stats)))))
    return out


def test_sharded_training_matches_unsharded():
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    r1 = _make_runner(1)
    r8 = _make_runner(8)

    # the 8-device runner really spans all 8 devices
    obs_devices = {d for d in r8.env_state["obs"].sharding.device_set}
    assert len(obs_devices) == 8

    # identical seeded init: same params, same env state
    for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(r8.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(r1.env_state["obs"]),
                               np.asarray(r8.env_state["obs"]),
                               rtol=0, atol=1e-6)

    s1 = _run_iters(r1, 10)
    s8 = _run_iters(r8, 10)

    # iteration 1: same rollout, update differs only by reduction order
    for k in ("value_loss", "surrogate_loss", "recons_loss", "height_loss"):
        np.testing.assert_allclose(s1[0][k], s8[0][k], rtol=2e-3, atol=1e-5,
                                   err_msg=f"iter-1 {k}")
    # early iterations: loss trajectories track before chaotic
    # amplification through contact dynamics takes over
    for i in range(3):
        np.testing.assert_allclose(
            s1[i]["value_loss"], s8[i]["value_loss"], rtol=5e-2, atol=1e-3,
            err_msg=f"iter-{i} value_loss")

    # all 10 iterations stay finite on both layouts
    for i in range(10):
        for k, v in s8[i].items():
            assert np.all(np.isfinite(v)), (i, k)
        for k, v in s1[i].items():
            assert np.all(np.isfinite(v)), (i, k)


@pytest.mark.smoke
def test_sharded_params_close_after_one_update():
    r1 = _make_runner(1)
    r8 = _make_runner(8)
    _run_iters(r1, 1)
    _run_iters(r8, 1)
    for a, b in zip(jax.tree.leaves(r1.params), jax.tree.leaves(r8.params)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        # atol raised 2e-4 -> 2e-3 for the stratified shuffle: the
        # device-local gather changes bf16 reduction orders at shard
        # boundaries, and Adam's sqrt(v) normalization amplifies
        # near-zero-grad coordinates up to the lr scale (observed: a few
        # isolated elements at 5e-4..1.1e-3 of 299k).  This check guards
        # gross layout divergence; the tight equivalence gate is the
        # loss-trajectory comparison in
        # test_sharded_training_matches_unsharded.
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-3)
