"""Environment-level tests: obs layout, resets, determinism, reward wiring."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.env.legged_env import LeggedEnv
from deep_tracking_control_tpu.tasks.registry import get_cfgs


@pytest.fixture(scope="module")
def small_env():
    task, _ = get_cfgs("lite3_dtc")
    task = dataclasses.replace(
        task,
        env=dataclasses.replace(task.env, num_envs=4),
        terrain=dataclasses.replace(task.terrain, num_rows=2, num_cols=2,
                                    border_size=4.0, max_init_terrain_level=1),
        noise=dataclasses.replace(task.noise, add_noise=False),
        domain_rand=dataclasses.replace(task.domain_rand, push_robots=False))
    env = LeggedEnv(task)
    key = jax.random.PRNGKey(0)
    params, state = env.init(key)
    step = jax.jit(env.step)
    # one step to populate obs
    state, out = step(params, state, jnp.zeros((4, 12)), jax.random.PRNGKey(1))
    return env, params, state, step, out


@pytest.mark.smoke
def test_obs_layout(small_env):
    """53-d obs layout (dtc.py:259-272): [ang_vel*0.25, gravity, cmd*scale,
    (q-q_def)*1, qd*0.05, actions, foothold(8)].

    Reset envs use pre-reset derived quantities (reference semantics:
    compute_observations runs after reset_idx but the base quantities are
    refreshed only next step) — so compare non-reset envs only."""
    env, params, state, step, out = small_env
    obs = np.asarray(out["obs"])
    assert obs.shape == (4, 53)
    live = ~np.asarray(out["done"])
    assert live.any(), "all envs reset; adjust fixture"
    phys = state["phys"]
    from deep_tracking_control_tpu.ops import quat as qm
    bq = jnp.asarray(phys["quat"].T)
    ang = np.asarray(qm.quat_rotate_inverse(bq, phys["ang_vel"].T)) * 0.25
    np.testing.assert_allclose(obs[live, 0:3], ang[live], atol=1e-5)
    grav = np.asarray(qm.quat_rotate_inverse(
        bq, jnp.broadcast_to(jnp.array([0., 0., -1.]), (4, 3))))
    np.testing.assert_allclose(obs[live, 3:6], grav[live], atol=1e-5)
    q = np.asarray(phys["q"].T)
    np.testing.assert_allclose(obs[live, 9:21],
                               (q - env.default_dof_pos[None, :])[live],
                               atol=1e-5)
    np.testing.assert_allclose(obs[live, 21:33],
                               (np.asarray(phys["qd"].T) * 0.05)[live],
                               atol=1e-5)
    np.testing.assert_allclose(obs[:, 33:45], np.asarray(state["actions"]),
                               atol=1e-6)
    np.testing.assert_allclose(obs[:, 45:53],
                               np.asarray(state["foothold_obs"]), atol=1e-6)


def test_privileged_obs_layout(small_env):
    """1389-d privileged obs (dtc.py:274-281): [noisy heights(693),
    force*0.005(3), clean heights(693)]."""
    env, params, state, step, out = small_env
    priv = np.asarray(out["privileged_obs"])
    assert priv.shape == (4, 693 + 3 + 693)
    # pushes disabled -> force block is exactly 0
    np.testing.assert_allclose(priv[:, 693:696], 0.0)
    # noisy heights = clean + U(-0.1,0.1) + offset; check bounded difference
    d = priv[:, :693] - priv[:, 696:]
    assert np.all(np.abs(d) <= 0.1 + np.abs(np.asarray(
        state["height_noise_offset"]))[:, None] + 1e-5)


@pytest.mark.smoke
def test_reset_on_timeout(small_env):
    env, params, state, step, out = small_env
    # force timeout: set episode length near the max
    state2 = {**state, "episode_length":
              jnp.full((4,), env.max_episode_length, dtype=jnp.int32)}
    state3, out3 = step(params, state2, jnp.zeros((4, 12)),
                        jax.random.PRNGKey(2))
    assert np.all(np.asarray(out3["done"]))
    assert np.all(np.asarray(out3["time_out"]))
    # episode length cleared for the new episode
    assert np.all(np.asarray(state3["episode_length"]) == 0)
    # episode sums were flushed to metrics and cleared ((K, N) stack)
    np.testing.assert_allclose(np.asarray(state3["episode_sums"]), 0.0)
    assert float(out3["metrics"]["n_done"]) == 4.0


@pytest.mark.smoke
def test_step_determinism(small_env):
    env, params, state, step, _ = small_env
    a = 0.3 * jax.random.normal(jax.random.PRNGKey(5), (4, 12))
    s1, o1 = step(params, state, a, jax.random.PRNGKey(9))
    s2, o2 = step(params, state, a, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(o1["obs"]), np.asarray(o2["obs"]))
    np.testing.assert_array_equal(np.asarray(s1["phys"]["q"]),
                                  np.asarray(s2["phys"]["q"]))
    s3, o3 = step(params, state, a, jax.random.PRNGKey(10))
    # different key -> physics identical for envs that did NOT reset (the
    # lag-buffer index draw is the only physics-path randomness and is
    # identical in distribution; resets inject fresh randomness)
    live = ~np.asarray(o1["done"]) & ~np.asarray(o3["done"])
    if live.any():
        np.testing.assert_allclose(np.asarray(s3["phys"]["pos"])[:, live],
                                   np.asarray(s1["phys"]["pos"])[:, live],
                                   atol=0.05)


def test_reward_termination_sign(small_env):
    """termination scale is negative; on non-timeout termination the term
    contributes scale*1 (legged_robot.py:285-291)."""
    env, params, state, step, _ = small_env
    assert "termination" in env.episode_sum_names
    assert env.termination_scale_dt < 0


def test_episode_metrics_names(small_env):
    env, params, state, step, out = small_env
    for n in env.reward_names:
        assert f"rew_{n}" in out["metrics"]
    assert "terrain_level" in out["metrics"]


def test_commands_small_zeroed(small_env):
    """Commands with |v_xy| <= 0.1 are zeroed (legged_robot.py:591)."""
    env, params, state, step, _ = small_env
    c = np.asarray(state["commands"])
    nrm = np.linalg.norm(c[:, :2], axis=1)
    assert np.all((nrm == 0.0) | (nrm > 0.1))


def test_vec_env_adapter():
    """VecEnv facade: reference-style stateful API over the pure core."""
    import dataclasses as dc
    from deep_tracking_control_tpu.env.vec_env import VecEnv
    task, _ = get_cfgs("lite3_dtc")
    task = dc.replace(
        task,
        env=dc.replace(task.env, num_envs=2),
        terrain=dc.replace(task.terrain, num_rows=2, num_cols=2,
                           border_size=4.0, max_init_terrain_level=1))
    venv = VecEnv(LeggedEnv(task), seed=0)
    assert venv.num_obs == 53 and venv.num_privileged_obs == 1389
    obs = venv.reset()
    assert obs["obs"].shape == (2, 53)
    obs, rew, done, info = venv.step(jnp.zeros((2, 12)))
    assert obs["obs_history"].shape == (2, 265)
    assert rew.shape == (2,) and done.shape == (2,)
    assert "time_outs" in info and "episode" in info


def test_plane_task_smoke():
    """lite3_fast: plane terrain path (no heightfield, zero height scan)."""
    task, _ = get_cfgs("lite3_fast")
    task = dataclasses.replace(
        task, env=dataclasses.replace(task.env, num_envs=2),
        noise=dataclasses.replace(task.noise, add_noise=False))
    env = LeggedEnv(task)
    assert env.grid.is_plane and env.patch_src is None
    params, state = jax.jit(env.init)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(3):
        state, out = step(params, state, jnp.zeros((2, 12)),
                          jax.random.PRNGKey(i))
    # plane: measured heights (and therefore the height obs block) are zero
    np.testing.assert_allclose(np.asarray(state["measured_heights"]), 0.0)
    assert np.all(np.isfinite(np.asarray(out["obs"])))
    # +-4 m/s command range (lite3_fast_config.py:41)
    assert float(state["command_lin_vel_x"][1]) == 4.0


def test_command_curriculum_widens():
    """update_command_curriculum parity (legged_robot.py:716-726): when the
    tracking reward of resetting envs exceeds 80% of its ceiling at the
    episode-boundary gate, the lin_vel_x range widens by 0.5 up to
    max_curriculum."""
    task, _ = get_cfgs("lite3_rough")   # has tracking_lin_vel active
    task = dataclasses.replace(
        task,
        env=dataclasses.replace(task.env, num_envs=4),
        commands=dataclasses.replace(task.commands, curriculum=True,
                                     max_curriculum=2.0),
        terrain=dataclasses.replace(task.terrain, num_rows=2, num_cols=2,
                                    border_size=4.0, max_init_terrain_level=1))
    env = LeggedEnv(task)
    params, state = jax.jit(env.init)(jax.random.PRNGKey(0))
    r0 = np.asarray(state["command_lin_vel_x"]).copy()
    # craft a state at the curriculum gate with saturated tracking sums
    scale = env.reward_scales_dt["tracking_lin_vel"]
    row = env.episode_sum_names.index("tracking_lin_vel")
    sums = jnp.asarray(state["episode_sums"]).at[row].set(
        0.95 * scale * env.max_episode_length)
    gated = {**state,
             "episode_sums": sums,
             "common_step": jnp.asarray(env.max_episode_length - 1,
                                        dtype=jnp.int32),
             "episode_length": jnp.full((4,), env.max_episode_length,
                                        dtype=jnp.int32)}  # force timeout
    new_state, out = jax.jit(env.step)(params, gated, jnp.zeros((4, 12)),
                                       jax.random.PRNGKey(1))
    assert np.all(np.asarray(out["done"]))
    r1 = np.asarray(new_state["command_lin_vel_x"])
    np.testing.assert_allclose(r1, [r0[0] - 0.5, r0[1] + 0.5], atol=1e-6)


def test_debug_viz_renders(tmp_path, small_env):
    """Foothold debug frame renders to PNG (viewer _draw_debug_vis analog)."""
    import dataclasses as dc
    from deep_tracking_control_tpu.utils.debug_viz import draw_foothold_debug
    env, params, state, step, out = small_env
    task = dc.replace(env.cfg, env=dc.replace(env.cfg.env, num_envs=2,
                                              debug_viz=True))
    env2 = LeggedEnv(task)
    p2, s2 = jax.jit(env2.init)(jax.random.PRNGKey(0))
    s2, o2 = jax.jit(env2.step)(p2, s2, jnp.zeros((2, 12)),
                                jax.random.PRNGKey(1))
    assert "debug" in o2
    d = o2["debug"]
    path = draw_foothold_debug(
        str(tmp_path / "dbg.png"), np.asarray(env2.grid.height),
        env2.grid.horizontal_scale, env2.grid.border_size,
        np.asarray(s2["phys"]["pos"][:, 0]),
        np.asarray(d["heights_world"][0]),
        np.asarray(d["foothold_score"][0]),
        np.asarray(d["pred_footholds"][0]),
        np.asarray(s2["optimal_footholds_world"][0]),
        np.asarray(d["foot_positions"][0]))
    import os as _os
    assert _os.path.getsize(path) > 5000


def test_descent_command_clamp():
    """CommandsCfg.descent_clamp (round-5 X30 intervention): planar command
    speed is rescaled to <= descent_clamp ONLY on descent-family columns
    (rough_slope / stairs_down) at terrain_level >= descent_clamp_level;
    direction is preserved and all other envs keep their commands."""
    task, _ = get_cfgs("lite3_dtc")
    task = dataclasses.replace(
        task,
        env=dataclasses.replace(task.env, num_envs=8),
        commands=dataclasses.replace(task.commands, descent_clamp=0.5,
                                     descent_clamp_level=3),
        terrain=dataclasses.replace(
            task.terrain, num_rows=4, num_cols=4, border_size=4.0,
            max_init_terrain_level=1,
            # cols: 0=slope, 1=rough_slope, 2=stairs_up, 3=stairs_down
            terrain_proportions=(0.25, 0.25, 0.25, 0.25)))
    env = LeggedEnv(task)
    assert env._descent_cols is not None
    np.testing.assert_array_equal(env._descent_cols,
                                  [False, True, False, True])

    commands = jnp.tile(jnp.asarray([0.6, 0.8, 0.3, 0.0]), (8, 1))  # |v|=1.0
    types = jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3], jnp.int32)
    levels = jnp.asarray([3, 3, 3, 3, 2, 2, 2, 2], jnp.int32)
    out = np.asarray(env._clamp_descent_commands(commands, types, levels))

    speed = np.linalg.norm(out[:, :2], axis=1)
    # clamped: descent cols at level >= 3 only
    np.testing.assert_allclose(speed[[1, 3]], 0.5, rtol=1e-6)
    np.testing.assert_allclose(speed[[0, 2, 4, 5, 6, 7]], 1.0, rtol=1e-6)
    # direction preserved on the clamped rows
    np.testing.assert_allclose(out[1, :2] / speed[1],
                               [0.6, 0.8], rtol=1e-6)
    # yaw untouched everywhere
    np.testing.assert_allclose(out[:, 2], 0.3, rtol=1e-6)

    # the x30_dtc_descent task variant wires the clamp in; plain x30_dtc
    # stays at exact reference command semantics
    t_desc, _ = get_cfgs("x30_dtc_descent")
    t_ref, _ = get_cfgs("x30_dtc")
    assert t_desc.commands.descent_clamp == 0.5
    assert t_ref.commands.descent_clamp == 0.0
    assert dataclasses.replace(
        t_desc, commands=dataclasses.replace(
            t_desc.commands, descent_clamp=0.0)) == t_ref
