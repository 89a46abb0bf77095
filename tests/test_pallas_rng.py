"""HW-PRNG noise kernel (experimental/pallas_rng.py): plumbing on CPU.

The TPU interpret mode stubs prng_random_bits to zeros, so these tests
pin shapes, dtype, wiring, and the env integration path; the
distribution gate (mean/var/decorrelation) runs on hardware in
scripts/verify_kernels_tpu.py.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.env.legged_env import LeggedEnv
from deep_tracking_control_tpu.experimental import pallas_rng
from deep_tracking_control_tpu.tasks.registry import get_cfgs


def test_uniform_pm1_shapes_and_range():
    u = pallas_rng.uniform_pm1(jax.random.PRNGKey(0), (256, 693),
                               interpret=True)
    assert u.shape == (256, 693) and u.dtype == jnp.float32
    v = np.asarray(u)
    assert np.all(v >= -1.0) and np.all(v < 1.0)


def test_uniform_pm1_tile_divisibility():
    # 384 % 512 != 0: tile backs off to a divisor >= 128
    u = pallas_rng.uniform_pm1(jax.random.PRNGKey(1), (384, 53),
                               interpret=True)
    assert u.shape == (384, 53)
    with pytest.raises(ValueError):
        pallas_rng.uniform_pm1(jax.random.PRNGKey(1), (100, 53),
                               interpret=True)


def test_env_step_on_hw_rng_path():
    cfg, _ = get_cfgs("lite3_dtc")
    cfg = dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, num_envs=8),
        terrain=dataclasses.replace(cfg.terrain, num_rows=2, num_cols=2,
                                    border_size=4.0,
                                    max_init_terrain_level=1))
    env = LeggedEnv(cfg, terrain_seed=1)
    env._pallas_rng = True
    env._pallas_interpret = True
    params, state = env.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(2)
    acts = jnp.zeros((env.num_envs, env.num_actions))
    state, out = jax.jit(env.step)(params, state, acts, key)
    assert out["obs"].shape == (8, env.num_obs)
    assert np.all(np.isfinite(np.asarray(out["obs"])))
    assert np.all(np.isfinite(np.asarray(out["privileged_obs"])))
