"""ActorCriticRecurrent trained end-to-end through OnPolicyRunner.

Reference parity: policy_class_name is user-selectable and
`ActorCriticRecurrent` is a registered choice
(on_policy_runner.py:60-65 `eval(self.cfg["policy_class_name"])`,
actor_critic_recurrent.py:40); the carries are collected during the rollout
and the update replays the RNN from the rollout-start carry (the
static-shape equivalent of rollout_storage.py:217-267).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.agent.ppo import PPO
from deep_tracking_control_tpu.env.config import AlgorithmCfg
from deep_tracking_control_tpu.env.legged_env import LeggedEnv
from deep_tracking_control_tpu.models.networks import ActorCriticRecurrent
from deep_tracking_control_tpu.runner.train import OnPolicyRunner
from deep_tracking_control_tpu.tasks.registry import get_cfgs


def _tiny_recurrent(num_envs=8, T=4):
    task, train = get_cfgs("lite3_dtc")
    task = dataclasses.replace(
        task,
        env=dataclasses.replace(task.env, num_envs=num_envs),
        terrain=dataclasses.replace(task.terrain, num_rows=2, num_cols=2,
                                    border_size=4.0, max_init_terrain_level=1))
    train = dataclasses.replace(
        train,
        runner=dataclasses.replace(train.runner, num_steps_per_env=T),
        policy=dataclasses.replace(train.policy,
                                   policy_class_name="ActorCriticRecurrent",
                                   rnn_hidden_size=32,
                                   actor_hidden_dims=(32,),
                                   critic_hidden_dims=(32,)),
        algorithm=dataclasses.replace(train.algorithm, num_learning_epochs=1,
                                      num_mini_batches=2))
    return task, train


@pytest.fixture(scope="module")
def recurrent_runner():
    task, train = _tiny_recurrent()
    env = LeggedEnv(task)
    runner = OnPolicyRunner(env, train, log_dir=None)
    runner.learn(2, log_every=10**9)
    return runner


def test_recurrent_trains_end_to_end(recurrent_runner):
    leaves = jax.tree.leaves(recurrent_runner.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert recurrent_runner.current_learning_iteration == 2
    # the carries were threaded through iterations and are live
    ca = recurrent_runner._log_state["carry_a"]
    assert np.asarray(jax.tree.leaves(ca)[0]).shape == (8, 32)


def test_recurrent_inference_policy(recurrent_runner):
    runner = recurrent_runner
    policy = runner.get_inference_policy()
    carry = (runner.init_carry(runner.env.num_envs),
             runner.init_carry(runner.env.num_envs))
    obs = runner.env_state["obs"]
    a1, carry = policy(obs, carry)
    a2, carry = policy(obs, carry)
    assert a1.shape == (8, 12)
    assert np.all(np.isfinite(np.asarray(a1)))
    # the carry advances: same obs, different hidden state -> different action
    assert float(np.max(np.abs(np.asarray(a1 - a2)))) > 0


def test_replay_matches_collection():
    """PPO._replay reproduces the collection-path means/values exactly when
    fed the stored dones — the correctness contract of the replay-based
    recurrent update (vs split_and_pad of rollout_storage.py:217-267)."""
    net = ActorCriticRecurrent(num_obs=6, num_critic_obs=6, num_actions=3,
                               rnn_hidden_size=8, actor_hidden=(8,),
                               critic_hidden=(8,))
    T, N, H = 5, 4, 8
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((N, 6)),
                      jnp.zeros((N, 6)), jnp.zeros((N, H)), jnp.zeros((N, H)))
    ppo = PPO(net=net, alg=AlgorithmCfg(), policy_kind="recurrent")
    rng = np.random.default_rng(3)
    obs_seq = jnp.asarray(rng.normal(size=(T, N, 6)), dtype=jnp.float32)
    dones = jnp.asarray(rng.random((T, N)) < 0.3)

    # collection: act, then reset carries where done (as the runner does)
    ca = cc = jnp.zeros((N, H))
    init_a, init_c = ca, cc
    mus, vals = [], []
    for t in range(T):
        a, ca, cc = ppo.act_recurrent(params, obs_seq[t], ca, cc,
                                      jax.random.PRNGKey(t))
        mus.append(a["mu"])
        vals.append(a["values"])
        reset = dones[t][:, None]
        ca = jnp.where(reset, 0.0, ca)
        cc = jnp.where(reset, 0.0, cc)

    mean, std, value = ppo._replay(params, obs_seq, dones, init_a, init_c)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(jnp.stack(mus)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(value), np.asarray(jnp.stack(vals)),
                               rtol=1e-5, atol=1e-6)
