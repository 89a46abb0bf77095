"""TeleopSession: the reference keyboard-control semantics
(base_task.py:141-176) driven headlessly with scripted key events."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.env.legged_env import LeggedEnv
from deep_tracking_control_tpu.tasks.registry import get_cfgs
from deep_tracking_control_tpu.utils.teleop import TeleopSession


def _session(num_envs=4):
    cfg, _ = get_cfgs("lite3_dtc")
    cfg = dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, num_envs=num_envs,
                                debug_viz=True),
        commands=dataclasses.replace(cfg.commands, resampling_time=1e6),
        terrain=dataclasses.replace(cfg.terrain, num_rows=2, num_cols=2,
                                    border_size=4.0, curriculum=False,
                                    max_init_terrain_level=1),
        noise=dataclasses.replace(cfg.noise, add_noise=False),
        domain_rand=dataclasses.replace(cfg.domain_rand,
                                        push_robots=False),
    )
    env = LeggedEnv(cfg, terrain_seed=1)
    params, state = env.init(jax.random.PRNGKey(0))

    def policy(obs, obs_history, privileged_obs):
        return jnp.zeros((env.num_envs, env.num_actions))

    return TeleopSession(env, params, state, policy,
                         jax.random.PRNGKey(1), lin_vel_scale=2.0)


def test_key_bindings_update_commands():
    s = _session()
    vx0 = float(s.cmd[0])
    assert s.handle_key(ord("w")) and s.handle_key(ord("w"))
    s.handle_key(ord("s"))
    assert np.isclose(s.cmd[0], vx0 + 0.2), "W/S apply +/-0.2 to vx"
    vy0 = float(s.cmd[1])
    s.handle_key(ord("a"))
    assert np.isclose(s.cmd[1], vy0 + 0.2), "A is +vy (robot-left)"
    # heading mode: Q steers the heading target (col 3)
    h0 = float(s.cmd[3])
    s.handle_key(ord("q"))
    assert s.heading_mode and np.isclose(s.cmd[3], h0 + 0.2)
    # the override lands in env state on step
    tel = s.step()
    assert np.isclose(tel["cmd"][0], vx0 + 0.2)
    assert set(tel) >= {"cmd", "vel", "z", "ep_len", "rew", "contacts",
                        "done", "lookat"}


def test_lookat_switch_and_digit():
    s = _session()
    s.handle_key(ord("n"))
    assert s.lookat == 1
    s.handle_key(ord("p"))
    s.handle_key(ord("p"))
    assert s.lookat == s.env.num_envs - 1, "P wraps (base_task.py:153)"
    s.handle_key(ord("2"))
    assert s.lookat == 2
    s.handle_key(ord("8"))
    assert s.lookat == s.env.num_envs - 1, "digit clamps to num_envs"


def test_reset_key_resets_only_lookat_env():
    s = _session()
    for _ in range(3):
        s.step()
    lens = np.asarray(s.state["episode_length"])
    assert lens.min() >= 3
    s.handle_key(ord("1"))
    s.handle_key(ord("r"))
    lens = np.asarray(s.state["episode_length"])
    assert lens[1] == 0, "R resets the looked-at env"
    assert lens[0] >= 3 and lens[2] >= 3, "others keep their episodes"


def test_quit_and_ascii_map():
    s = _session()
    s.step()
    rows = s.ascii_map(rows=11, cols=21)
    assert len(rows) == 11 and all(len(r) == 21 for r in rows)
    assert any("B" in r for r in rows), "base marker present"
    assert not s.handle_key(27) and s.quit, "ESC ends the session"
