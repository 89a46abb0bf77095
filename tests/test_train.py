"""End-to-end training smoke + checkpoint round-trip + multichip dry run."""
import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.env.legged_env import LeggedEnv
from deep_tracking_control_tpu.runner.train import OnPolicyRunner
from deep_tracking_control_tpu.tasks.registry import get_cfgs


def _tiny(num_envs=8, T=4):
    task, train = get_cfgs("lite3_dtc")
    task = dataclasses.replace(
        task,
        env=dataclasses.replace(task.env, num_envs=num_envs),
        terrain=dataclasses.replace(task.terrain, num_rows=2, num_cols=2,
                                    border_size=4.0, max_init_terrain_level=1))
    train = dataclasses.replace(
        train,
        runner=dataclasses.replace(train.runner, num_steps_per_env=T),
        algorithm=dataclasses.replace(train.algorithm, num_learning_epochs=1,
                                      num_mini_batches=2))
    return task, train


@pytest.fixture(scope="module")
def trained_runner():
    task, train = _tiny()
    env = LeggedEnv(task)
    runner = OnPolicyRunner(env, train, log_dir=None)
    runner.learn(2, log_every=10**9)
    return runner


@pytest.mark.smoke
def test_training_updates_params(trained_runner):
    leaves = jax.tree.leaves(trained_runner.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert trained_runner.current_learning_iteration == 2


@pytest.mark.smoke
def test_checkpoint_roundtrip(trained_runner, tmp_path):
    runner = trained_runner
    path = os.path.join(str(tmp_path), "model_2")
    runner.save(path)
    # rebuild fresh and load
    task, train = _tiny()
    env2 = LeggedEnv(task)
    runner2 = OnPolicyRunner(env2, train, log_dir=None)
    runner2.load(path)
    for a, b in zip(jax.tree.leaves(runner.params),
                    jax.tree.leaves(runner2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert runner2.current_learning_iteration == 2
    # restored env/curriculum state (beyond-reference capability, SURVEY §5)
    np.testing.assert_array_equal(
        np.asarray(runner.env_state["terrain_levels"]),
        np.asarray(runner2.env_state["terrain_levels"]))
    # and training continues
    runner2.learn(1, log_every=10**9)


def test_inference_policy(trained_runner):
    policy = trained_runner.get_inference_policy(teacher=True)
    s = trained_runner.env_state
    actions = policy(s["obs"], s["obs_history"], s["privileged_obs"])
    assert actions.shape == (trained_runner.env.num_envs, 12)
    assert np.all(np.isfinite(np.asarray(actions)))


@pytest.mark.smoke
def test_multichip_dryrun():
    """The FULL sharded train step on all (8 virtual CPU) devices."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as g
    n = len(jax.devices())
    assert n == 8, f"conftest should give 8 cpu devices, got {n}"
    g.dryrun_multichip(n)


def test_checkpoint_restore_into_different_env_count(trained_runner, tmp_path):
    """Eval-style restore: params/optimizer restored, fresh env state kept
    when the checkpoint's env count differs (play.py path)."""
    path = os.path.join(str(tmp_path), "model_x")
    trained_runner.save(path)
    task, train = _tiny(num_envs=4)      # checkpoint was saved with 8
    env = LeggedEnv(task)
    runner = OnPolicyRunner(env, train, log_dir=None)
    runner.load(path, load_optimizer=False)
    for a, b in zip(jax.tree.leaves(trained_runner.params),
                    jax.tree.leaves(runner.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert runner.env_state["commands"].shape[0] == 4
    policy = runner.get_inference_policy()
    s = runner.env_state
    actions = policy(s["obs"], s["obs_history"], s["privileged_obs"])
    assert actions.shape == (4, 12)


def test_policy_export_roundtrip(trained_runner, tmp_path):
    """StableHLO export (runner/export.py): serialize act_teacher, reload,
    outputs match the live network (TorchScript-export capability analog)."""
    from deep_tracking_control_tpu.runner import export as pexp
    runner = trained_runner
    env = runner.env
    out = pexp.export_policy(runner.net, runner.params, env.num_obs,
                             env.num_obs_history, env.num_privileged_obs,
                             str(tmp_path), batch_size=env.num_envs)
    assert os.path.exists(out)
    fn = pexp.load_policy(str(tmp_path))
    s = runner.env_state
    got = fn(s["obs"], s["obs_history"], s["privileged_obs"])
    want = runner.get_inference_policy()(s["obs"], s["obs_history"],
                                         s["privileged_obs"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_perf_split_and_random_ep_len():
    """Two-program mode (Perf/collection time + Perf/learning_time parity,
    on_policy_runner.py:143-155,196-198) trains identically-shaped state;
    init_at_random_ep_len desynchronizes initial episode lengths
    (on_policy_runner.py:105-109)."""
    import jax.numpy as jnp
    task, train = _tiny()
    train = dataclasses.replace(
        train, runner=dataclasses.replace(train.runner, perf_split=True))
    env = LeggedEnv(task)
    runner = OnPolicyRunner(env, train, log_dir=None)
    assert hasattr(runner, "_collect_fn") and hasattr(runner, "_update_fn")
    runner.learn(2, log_every=10**9, init_at_random_ep_len=True)
    leaves = jax.tree.leaves(runner.params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_terrain_level_metric_is_fleet_mean():
    """Episode/terrain_level logs the mean post-curriculum level over ALL
    envs (legged_robot.py:259 logs torch.mean(self.terrain_levels))."""
    task, train = _tiny()
    env = LeggedEnv(task)
    runner = OnPolicyRunner(env, train, log_dir=None)
    params, state = runner.env_params, runner.env_state
    key = jax.random.PRNGKey(0)
    a = jnp.zeros((env.num_envs, env.num_actions))
    new_state, out = jax.jit(env.step)(params, state, a, key)
    m = out["metrics"]
    lv = np.asarray(new_state["terrain_levels"], dtype=np.float32)
    np.testing.assert_allclose(float(m["terrain_level"]),
                               float(lv.mean()), rtol=1e-6)


def test_checkpoint_metadata_hardening(trained_runner, tmp_path):
    """tree_metadata raises loudly on unrecognized metadata instead of
    letting load() silently fall back to fresh env state (VERDICT r2 #8):
    the fresh-env fallback must fire ONLY on genuine env-count or
    cross-task structure mismatch."""
    from deep_tracking_control_tpu.runner import checkpoint as ckpt

    path = os.path.join(str(tmp_path), "model_2")
    trained_runner.save(path)

    # well-formed checkpoint: metadata resolves to a dict with env pieces
    meta = ckpt.tree_metadata(path)
    assert "env_state" in meta and "env_params" in meta

    # a checkpoint that is missing params (foreign tree): loud failure
    bad = os.path.join(str(tmp_path), "foreign")
    ckpt.save(bad, dict(weights=trained_runner.params))
    with pytest.raises(RuntimeError, match="params"):
        ckpt.tree_metadata(bad)

    # load() propagates the failure instead of falling back to fresh env
    task, train = _tiny()
    runner = OnPolicyRunner(LeggedEnv(task), train, log_dir=None)
    with pytest.raises(RuntimeError):
        runner.load(bad)

    # a nonexistent path fails loudly too
    with pytest.raises(Exception):
        runner.load(os.path.join(str(tmp_path), "missing"))


def test_cross_task_resume_shape_mismatch(trained_runner, tmp_path):
    """Cross-task resume where the active reward-term count differs (the
    x30_rough K=17 -> x30_dtc K=18 staged protocol): episode_sums is one
    (K, N) stack, so the trees have IDENTICAL structure but incompatible
    shapes.  load() must fall back to a fresh env state instead of
    adopting a tree that only explodes later inside the jitted step."""
    path = os.path.join(str(tmp_path), "model_x")
    trained_runner.save(path)

    task, train = _tiny()
    task = dataclasses.replace(
        task, rewards=dataclasses.replace(
            task.rewards, scales=dataclasses.replace(
                task.rewards.scales, smooth=0.0)))
    runner2 = OnPolicyRunner(LeggedEnv(task), train, log_dir=None)
    assert (runner2.env_state["episode_sums"].shape[0]
            != trained_runner.env_state["episode_sums"].shape[0])
    before = runner2.env_state
    runner2.load(path)
    # params/iteration transferred; env state kept fresh
    for a, b in zip(jax.tree.leaves(trained_runner.params),
                    jax.tree.leaves(runner2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert runner2.env_state is before
    runner2.learn(1, log_every=10**9)


def test_light_checkpoint_roundtrip(trained_runner, tmp_path):
    """save(full=False) — the periodic-save scope (params/optimizer/RNG,
    matching the reference's torch.save scope, on_policy_runner.py:249-255)
    — restores params and iteration and keeps a fresh env state."""
    path = os.path.join(str(tmp_path), "model_light")
    trained_runner.save(path, full=False)

    from deep_tracking_control_tpu.runner import checkpoint as ckpt
    meta = ckpt.tree_metadata(path)
    assert "params" in meta and "env_state" not in meta

    task, train = _tiny()
    runner2 = OnPolicyRunner(LeggedEnv(task), train, log_dir=None)
    before_env = runner2.env_state
    runner2.load(path)
    for a, b in zip(jax.tree.leaves(trained_runner.params),
                    jax.tree.leaves(runner2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert runner2.current_learning_iteration == \
        trained_runner.current_learning_iteration
    # env state untouched (fresh), and training continues from it
    assert runner2.env_state is before_env
    runner2.learn(1, log_every=10**9)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree.leaves(runner2.params))


@pytest.mark.smoke
def test_strict_parity_switch(monkeypatch):
    """DTC_STRICT_PARITY=1 flips every deliberate reference-semantics
    deviation off at once (VERDICT r4 item 8): sequential update ordering,
    per-row minibatch permutation, f32 rollout storage, and all Pallas
    kernel gates — even when the per-gate env vars try to force them on."""
    from deep_tracking_control_tpu.utils import flags

    monkeypatch.setenv("DTC_STRICT_PARITY", "1")
    monkeypatch.setenv("DTC_PALLAS_PHYSICS", "1")   # overridden by parity
    monkeypatch.setenv("DTC_PALLAS_RNG", "1")
    monkeypatch.setenv("DTC_PALLAS_GATHER", "1")
    assert flags.strict_parity()
    for gate, default in [("DTC_PALLAS_PHYSICS", "1"),
                          ("DTC_PALLAS_SAMPLER", "1"),
                          ("DTC_PALLAS_PLANNER", "1"),
                          ("DTC_PALLAS_REWARDS", "0"),
                          ("DTC_PALLAS_RNG", "0"),
                          ("DTC_PALLAS_OBS", "0"),
                          ("DTC_PALLAS_GATHER", "0"),
                          ("DTC_FUSED_WINDOW", "1")]:
        assert flags.kernel_flag(gate, default) is False, gate

    task, train = _tiny()
    train = dataclasses.replace(
        train, runner=dataclasses.replace(train.runner, perf_split=True))
    env = LeggedEnv(task)
    assert env._pallas_physics is False
    assert env._pallas_rng is False and env._pallas_obs is False
    runner = OnPolicyRunner(env, train, log_dir=None)
    # reference update semantics restored (rsl_rl ppo.py:197-254 ordering,
    # rollout_storage.py:165 per-row permutation)
    assert runner.cfg.algorithm.fused_joint_step is False
    assert runner.cfg.algorithm.minibatch_perm_granule == 1
    assert runner.cfg.algorithm.shuffle_strata == 1
    # f32 rollout storage (rollout_storage.py:30-60): inspect the actual
    # collection output through the perf_split two-program path
    runner.learn(1, log_every=10**9)
    key = jax.random.PRNGKey(0)
    # mirror learn()'s call shape; env_state is donated, so rebind it
    runner.env_state, runner._log_state, batch, _ = runner._collect_fn(
        runner.params, runner.env_params, runner.env_state,
        runner._log_state, key)
    assert batch["privileged_obs"].dtype == jnp.float32
    assert batch["obs_history"].dtype == jnp.float32


@pytest.mark.smoke
def test_block_dispatch_matches_single(tmp_path):
    """iters_per_dispatch=K chains K train iterations into one program
    (lax.scan over train_iter); the in-graph key chain makes the math
    identical to K single dispatches."""
    def run(k_block, iters=4):
        task, train = _tiny()
        train = dataclasses.replace(
            train, runner=dataclasses.replace(
                train.runner, iters_per_dispatch=k_block))
        env = LeggedEnv(task)
        runner = OnPolicyRunner(env, train, log_dir=None)
        runner.learn(iters, log_every=10**9)
        assert runner.current_learning_iteration == iters
        return runner.params

    p1 = run(1)
    p4 = run(4)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-5, atol=2e-6)


def test_block_dispatch_save_boundaries(tmp_path):
    """Block dispatch + periodic saves (VERDICT r4 weak-item 7): with
    log_dir set, blocks may only END on a save iteration, so model_{j}
    always holds the params from right after iteration j.  Drive
    learn(10) with save_interval=4 and K=3 against a K=1 reference run
    with the same seed and compare every checkpoint bitwise."""
    from deep_tracking_control_tpu.runner import checkpoint as ckpt

    def run(k_block, log_dir):
        task, train = _tiny()
        train = dataclasses.replace(
            train, runner=dataclasses.replace(
                train.runner, iters_per_dispatch=k_block, save_interval=4))
        runner = OnPolicyRunner(LeggedEnv(task), train, log_dir=log_dir)
        runner.learn(10, log_every=10**9)
        assert runner.current_learning_iteration == 10
        return runner

    d1 = os.path.join(str(tmp_path), "k1")
    d3 = os.path.join(str(tmp_path), "k3")
    os.makedirs(d1), os.makedirs(d3)
    run(1, d1)
    run(3, d3)

    for d in (d1, d3):
        saved = sorted(f for f in os.listdir(d) if f.startswith("model_"))
        # light saves at the save_interval boundaries + the final full save
        assert saved == ["model_0", "model_10", "model_4", "model_8"], (d, saved)

    for name in ("model_0", "model_4", "model_8", "model_10"):
        t1 = ckpt.load_raw(os.path.join(d1, name))
        t3 = ckpt.load_raw(os.path.join(d3, name))
        for a, b in zip(jax.tree.leaves(t1["params"]),
                        jax.tree.leaves(t3["params"])):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=2e-5, atol=2e-6,
                                       err_msg=name)
