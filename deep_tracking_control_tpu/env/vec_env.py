"""VecEnv / HistoryWrapper-style adapter over the functional LeggedEnv.

The framework's core is pure-functional (env/legged_env.py); this module
provides the reference's stateful API surface for users migrating from
rsl_rl (rsl_rl/env/vec_env.py:36-59 ABC and
rsl_rl/env/wrappers/history_wrapper.py:6-53): `step(actions)` returns the
HistoryWrapper dict {obs, privileged_obs, obs_history, base_vel} plus
(rew, done, info), and num_obs/num_privileged_obs/... attributes.

Note this adapter re-enters jit per call; the training runner bypasses it
(the rollout lives inside one compiled program).  It exists for
evaluation, scripting, and API parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .legged_env import LeggedEnv


class VecEnv:
    """Stateful vectorized-env facade (VecEnv ABC + HistoryWrapper parity)."""

    def __init__(self, env: LeggedEnv, seed: int = 0):
        self.env = env
        self.num_envs = env.num_envs
        self.num_obs = env.num_obs
        self.num_privileged_obs = env.num_privileged_obs
        self.num_actions = env.num_actions
        self.num_obs_history = env.num_obs_history
        self.max_episode_length = env.max_episode_length
        self._key = jax.random.PRNGKey(seed)
        self._step = jax.jit(env.step)
        self.params, self.state = jax.jit(env.init)(self._next_key())
        self.extras = {}

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------------
    def step(self, actions):
        """(obs_dict, rew, done, info) — HistoryWrapper.step parity
        (history_wrapper.py:18-24)."""
        self.state, out = self._step(self.params, self.state,
                                     jnp.asarray(actions), self._next_key())
        self.extras = {"episode": out["metrics"], "time_outs": out["time_out"]}
        obs_dict = {"obs": out["obs"], "privileged_obs": out["privileged_obs"],
                    "obs_history": out["obs_history"],
                    "base_vel": out["base_vel"]}
        return obs_dict, out["rew"], out["done"], self.extras

    def reset(self):
        """Reset ALL envs (BaseTask.reset parity, base_task.py:115-121)."""
        self.state, out = jax.jit(self.env.reset)(self.params, self.state,
                                                  self._next_key())
        return {"obs": out["obs"], "privileged_obs": out["privileged_obs"],
                "obs_history": out["obs_history"],
                "base_vel": out["base_vel"]}

    def get_observations(self):
        s = self.state
        return {"obs": s["obs"], "privileged_obs": s["privileged_obs"],
                "obs_history": s["obs_history"], "base_vel": s["base_vel"]}

    def get_privileged_observations(self):
        return self.state["privileged_obs"]

    def get_reward_buf(self):
        return self.state["rew_buf"]

    @property
    def episode_length_buf(self):
        return self.state["episode_length"]

    @property
    def reset_buf(self):
        return self.state["reset_buf"]
