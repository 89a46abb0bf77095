"""Fused obs-assembly kernel (experimental/pallas_obs.py) vs the XLA math.

The TPU interpret mode stubs prng_random_bits to zero bits, which the
kernel maps to the constant -1.0 — so an exact replica of the XLA obs
math with noise == -1.0 pins EVERY assembly op (concats, scales, height
chain, clips, history roll) bit-for-bit.  The real noise distribution is
gated on hardware by scripts/verify_kernels_tpu.py.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.env.legged_env import LeggedEnv
from deep_tracking_control_tpu.experimental import pallas_obs
from deep_tracking_control_tpu.tasks.registry import get_cfgs


def _env(task="lite3_dtc", num_envs=16, add_noise=True, num_obs=None):
    cfg, _ = get_cfgs(task)
    envcfg = dataclasses.replace(cfg.env, num_envs=num_envs)
    if num_obs is not None:
        envcfg = dataclasses.replace(envcfg, num_observations=num_obs)
    cfg = dataclasses.replace(
        cfg,
        env=envcfg,
        terrain=dataclasses.replace(cfg.terrain, num_rows=2, num_cols=2,
                                    border_size=4.0,
                                    max_init_terrain_level=1),
        noise=dataclasses.replace(cfg.noise, add_noise=add_noise))
    return LeggedEnv(cfg, terrain_seed=1)


def _fake_inputs(env, seed=0):
    rng = np.random.default_rng(seed)
    N, nq = env.num_envs, env.model.nq
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    state = dict(
        commands=r(N, 4),
        phys=dict(q=r(nq, N), qd=r(nq, N)),
        actions=r(N, env.num_actions),
        foothold_obs=r(N, 8),
        push_force=r(N, 3),
        height_noise_offset=r(N),
        obs_history=r(N, env.num_obs_history),
    )
    return (state, r(N, 3), r(N, 3), r(N, 3), 0.5 * r(N, 693))


def _xla_replica(env, state, base_pos, base_ang_vel, projected_gravity,
                 measured_heights, noise=-1.0):
    cfg = env.cfg
    os_ = cfg.normalization.obs_scales
    parts = [
        base_ang_vel * os_.ang_vel,
        projected_gravity,
        state["commands"][:, :3] * jnp.asarray(env.commands_scale),
        (state["phys"]["q"].T - jnp.asarray(env.default_dof_pos)[None, :])
        * os_.dof_pos,
        state["phys"]["qd"].T * os_.dof_vel,
        state["actions"],
    ]
    if env._obs_has_foothold:
        parts.append(state["foothold_obs"])
    obs = jnp.concatenate(parts, axis=1)
    heights = jnp.clip(
        base_pos[:, 2:3] - cfg.rewards.base_height_target - measured_heights,
        -1.0, 1.0) * os_.height_measurements
    noisy = heights + noise * 0.1 + state["height_noise_offset"][:, None]
    priv = jnp.concatenate([noisy, state["push_force"] * os_.force, heights],
                           axis=1)
    if cfg.noise.add_noise:
        obs = obs + noise * jnp.asarray(env.noise_scale_vec)[None, :]
    c = cfg.normalization.clip_observations
    obs = jnp.clip(obs, -c, c)
    priv = jnp.clip(priv, -c, c)
    hist = jnp.concatenate([state["obs_history"][:, env.num_obs:], obs],
                           axis=1)
    return obs, priv, hist


@pytest.mark.parametrize("add_noise", [True, False])
def test_fused_obs_matches_xla_math(add_noise):
    env = _env(add_noise=add_noise)
    state, bav, pg, bp3, mh = _fake_inputs(env)
    base_pos = jnp.concatenate([bp3[:, :2], 0.3 + 0.1 * bp3[:, 2:3]], axis=1)
    obs, priv, hist = pallas_obs.compute_observations_fused(
        env, state, base_pos, bav, pg, mh, jax.random.PRNGKey(3),
        interpret=True)
    eobs, epriv, ehist = _xla_replica(env, state, base_pos, bav, pg, mh)
    np.testing.assert_allclose(np.asarray(obs), np.asarray(eobs),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(priv), np.asarray(epriv),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hist), np.asarray(ehist),
                               rtol=1e-6, atol=1e-6)


def test_fused_obs_45_dim_layout():
    env = _env(task="lite3_rough", num_envs=16)
    assert not env._obs_has_foothold and env.num_obs == 45
    state, bav, pg, bp3, mh = _fake_inputs(env, seed=1)
    base_pos = jnp.concatenate([bp3[:, :2], 0.3 + 0.1 * bp3[:, 2:3]], axis=1)
    obs, priv, hist = pallas_obs.compute_observations_fused(
        env, state, base_pos, bav, pg, mh, jax.random.PRNGKey(4),
        interpret=True)
    eobs, epriv, ehist = _xla_replica(env, state, base_pos, bav, pg, mh)
    assert obs.shape == (16, 45) and hist.shape == (16, 45 * 5)
    np.testing.assert_allclose(np.asarray(obs), np.asarray(eobs),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hist), np.asarray(ehist),
                               rtol=1e-6, atol=1e-6)


def test_env_step_on_obs_kernel_path():
    env = _env(num_envs=8)
    env._pallas_obs = True
    env._pallas_interpret = True
    params, state = env.init(jax.random.PRNGKey(0))
    acts = jnp.zeros((env.num_envs, env.num_actions))
    state, out = jax.jit(env.step)(params, state, acts,
                                   jax.random.PRNGKey(2))
    assert out["obs"].shape == (8, env.num_obs)
    assert np.all(np.isfinite(np.asarray(out["obs"])))
    assert np.all(np.isfinite(np.asarray(out["privileged_obs"])))
    assert state["obs_history"].shape == (8, env.num_obs_history)
