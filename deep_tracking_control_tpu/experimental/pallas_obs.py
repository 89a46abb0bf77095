"""Pallas TPU kernel: the full observation assembly in ONE launch.

Replaces the XLA tail of env.step (legged_env.py _compute_observations —
reference legged_robot_dtc.py:254-288 + history_wrapper.py:17-24): the
53/45-dim obs concat + scaling, the observation noise add, the height-scan
clip chain, the (N, 1389) privileged concat with its measurement noise,
both clips, and the obs-history roll — plus both uniform noise draws from
the TPU core's hardware PRNG (see ops/pallas_rng.py for the stream
deviation note; this kernel inlines the same generator so the bits never
touch HBM).

On the XLA path these lower to several fusions over (N, 693)/(N, 1389)
arrays plus two full threefry evaluations; here one grid program per env
tile does everything in VMEM.

Layout: ENV-LEADING (unlike the physics/rewards kernels) — every op here
is elementwise per env with feature-dim concatenation, so features ride
the 128 lanes and the concat offsets are static lane slices the Mosaic
compiler handles; env tiles ride the grid.

Numerics with noise disabled are bit-identical to the XLA path (same op
order); with noise enabled the uniform stream differs (HW PRNG vs
threefry), pinned behaviorally on hardware by scripts/verify_kernels_tpu.py
and exactly in interpret mode by tests/test_pallas_obs.py (the interpret
PRNG stub yields constant -1.0 noise, which the test replicates).

Opt-in via DTC_PALLAS_OBS=1 until the on-device A/B flips the default.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _uniform_bits(shape):
    bits = pltpu.prng_random_bits(shape)
    ubits = lax.bitcast_convert_type(bits, jnp.uint32)
    # >>9 clears the top 9 bits, so a bitcast to int32 is sign-safe; Mosaic
    # has no uint32->f32 convert, only int32->f32.
    u23 = lax.bitcast_convert_type(ubits >> jnp.uint32(9), jnp.int32)
    return u23.astype(jnp.float32) * (2.0 ** -22) - 1.0


def _kernel(st, has_foothold, add_noise,
            bav_ref, pg_ref, cmd_ref, q_ref, qd_ref, act_ref, foot_ref,
            basez_ref, mh_ref, push_ref, hno_ref, hist_ref,
            nv_ref, dq_ref, cs_ref, seed_ref,
            obs_out, priv_out, hist_out):
    """st: static float config dict.  Broadcast-block inputs (Pallas forbids
    captured array constants): nv (1, num_obs) noise-scale vector, dq
    (1, nq) default dof pos, cs (1, 3) command scales."""
    # Mosaic caps prng_seed at 2 values; fold the grid index into the
    # second word with an odd multiplier so tiles stay decorrelated.
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] + pl.program_id(0) * jnp.int32(-1640531527))

    parts = [
        bav_ref[...] * st["ang_vel"],
        pg_ref[...],
        cmd_ref[...][:, :3] * cs_ref[...],
        (q_ref[...] - dq_ref[...]) * st["dof_pos"],
        qd_ref[...] * st["dof_vel"],
        act_ref[...],
    ]
    if has_foothold:                      # 53-dim DTC layout (dtc.py:269)
        parts.append(foot_ref[...])
    obs = jnp.concatenate(parts, axis=1)

    heights = jnp.clip(basez_ref[...] - st["height_target"] - mh_ref[...],
                       -1.0, 1.0) * st["height_meas"]            # dtc.py:275
    noisy = (heights + _uniform_bits(heights.shape) * 0.1
             + hno_ref[...])                   # legged_robot.py:229-230
    priv = jnp.concatenate(
        [noisy, push_ref[...] * st["force"], heights], axis=1)

    if add_noise:                                  # dtc.py:284-287
        obs = obs + _uniform_bits(obs.shape) * nv_ref[...]

    clip = st["clip_obs"]
    obs = jnp.clip(obs, -clip, clip)
    priv = jnp.clip(priv, -clip, clip)

    obs_out[...] = obs
    priv_out[...] = priv
    # HistoryWrapper.step roll (history_wrapper.py:17-24)
    num_obs = obs.shape[1]
    hist_out[...] = jnp.concatenate(
        [hist_ref[...][:, num_obs:], obs], axis=1)


def compute_observations_fused(env, state, base_pos, base_ang_vel,
                               projected_gravity, measured_heights, key,
                               tile=256, interpret=False):
    """Fused equivalent of the obs tail of LeggedEnv._compute_observations.

    Returns (obs (N, num_obs), privileged (N, P), obs_history (N, H)).
    Both noise draws come from the in-kernel HW PRNG seeded by `key`.
    """
    cfg = env.cfg
    N = env.num_envs
    os_ = cfg.normalization.obs_scales
    while tile > 8 and N % tile:
        tile //= 2
    if N % tile:
        raise ValueError(f"num_envs {N} not divisible by tile {tile}")

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    kd = jnp.asarray(jax.random.key_data(key)).reshape(-1)[:2]
    seed = lax.bitcast_convert_type(kd.astype(jnp.uint32), jnp.int32)

    st = dict(
        ang_vel=float(os_.ang_vel), dof_pos=float(os_.dof_pos),
        dof_vel=float(os_.dof_vel), force=float(os_.force),
        height_meas=float(os_.height_measurements),
        height_target=float(cfg.rewards.base_height_target),
        clip_obs=float(cfg.normalization.clip_observations),
    )

    inputs = [
        f32(base_ang_vel), f32(projected_gravity),
        f32(state["commands"]), f32(state["phys"]["q"].T),
        f32(state["phys"]["qd"].T), f32(state["actions"]),
        f32(state["foothold_obs"]), f32(base_pos[:, 2:3]),
        f32(measured_heights), f32(state["push_force"]),
        f32(state["height_noise_offset"][:, None]),
        f32(state["obs_history"]),
        f32(np.asarray(env.noise_scale_vec).reshape(1, -1)),
        f32(np.asarray(env.default_dof_pos).reshape(1, -1)),
        f32(np.asarray(env.commands_scale).reshape(1, -1)),
    ]

    def bspec(x):
        return pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0))

    in_specs = [bspec(x) for x in inputs[:12]]
    # broadcast-block rows: every program reads the whole (1, D) row
    in_specs += [pl.BlockSpec(x.shape, lambda i: (0, 0))
                 for x in inputs[12:]]
    in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))

    P = measured_heights.shape[1] * 2 + 3
    H = state["obs_history"].shape[1]
    out_shapes = [
        jax.ShapeDtypeStruct((N, env.num_obs), jnp.float32),
        jax.ShapeDtypeStruct((N, P), jnp.float32),
        jax.ShapeDtypeStruct((N, H), jnp.float32),
    ]
    kern = functools.partial(_kernel, st, bool(env._obs_has_foothold),
                             bool(cfg.noise.add_noise))
    obs, priv, hist = pl.pallas_call(
        kern,
        grid=(N // tile,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((tile, s.shape[1]), lambda i: (i, 0))
                   for s in out_shapes],
        out_shape=out_shapes,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*inputs, seed)
    return obs, priv, hist
