"""Elimination profiling of env.step on the live backend.

Device tracing is unavailable over the remote tunnel, so this measures
component costs by differencing: time the full env.step scan, then
variants with one component stubbed out (planner off, rewards zeroed,
resets identity, obs noise off, pushes off).  Each variant recompiles.

Usage: python scripts/profile_elim.py [--num_envs 4096] [--steps 50]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(name, fn, *args, steps):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / steps * 1e3
    print(f"{name:14s}: {dt:8.3f} ms/step", flush=True)
    return dt


def make_env(task_mod=None):
    from deep_tracking_control_tpu.env.legged_env import LeggedEnv
    from deep_tracking_control_tpu.tasks.registry import get_cfgs
    cfg, _ = get_cfgs("lite3_dtc")
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, num_envs=NUM_ENVS))
    if task_mod:
        cfg = task_mod(cfg)
    return LeggedEnv(cfg, terrain_seed=1)


def scan_fn(env, T):
    @jax.jit
    def env_scan(params, state, key):
        def body(s, k):
            s, out = env.step(params, s, jnp.zeros((NUM_ENVS, env.num_actions)), k)
            return s, out["rew"]
        s, rews = jax.lax.scan(body, state, jax.random.split(key, T))
        return s["phys"]["pos"], rews
    return env_scan


def main():
    global NUM_ENVS
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()
    NUM_ENVS = args.num_envs
    T = args.steps
    key = jax.random.PRNGKey(0)

    from deep_tracking_control_tpu.env import legged_env as le, rewards as rw

    env = make_env()
    params, state = env.init(key)
    print(f"backend={jax.default_backend()} N={NUM_ENVS} T={T}", flush=True)
    base = timed("full", scan_fn(env, T), params, state, key, steps=T)

    # planner off (foothold obs zeroed; obs dims unchanged)
    env2 = make_env(lambda c: dataclasses.replace(c, use_dtc_planner=False))
    p2, s2 = env2.init(key)
    timed("no-planner", scan_fn(env2, T), p2, s2, key, steps=T)

    # XLA planner instead of the fused scoring kernel
    os.environ["DTC_PALLAS_PLANNER"] = "0"
    try:
        env2b = make_env()
        p2b, s2b = env2b.init(key)
        timed("xla-planner", scan_fn(env2b, T), p2b, s2b, key, steps=T)
    finally:
        os.environ.pop("DTC_PALLAS_PLANNER", None)

    # XLA reward stack instead of the fused kernel
    os.environ["DTC_PALLAS_REWARDS"] = "0"
    try:
        env2c = make_env()
        p2c, s2c = env2c.init(key)
        timed("xla-rewards", scan_fn(env2c, T), p2c, s2c, key, steps=T)
    finally:
        os.environ.pop("DTC_PALLAS_REWARDS", None)

    # rewards zeroed (one zeros vector; termination kept for resets) —
    # forces the XLA path so the monkeypatch actually eliminates the work
    orig_cr = rw.compute_rewards
    def zero_cr(names, sdt, ctx, op, tdt):
        z = jnp.zeros_like(ctx["root_z"])
        pt = {n: z for n in names}
        if tdt != 0.0:
            pt["termination"] = z
        return z, pt
    rw.compute_rewards = zero_cr
    os.environ["DTC_PALLAS_REWARDS"] = "0"
    try:
        env3 = make_env()
        p3, s3 = env3.init(key)
        timed("no-rewards", scan_fn(env3, T), p3, s3, key, steps=T)
    finally:
        rw.compute_rewards = orig_cr
        os.environ.pop("DTC_PALLAS_REWARDS", None)

    # resets identity
    orig_ar = le.LeggedEnv._apply_reset
    le.LeggedEnv._apply_reset = lambda self, state, done, key: state
    try:
        env4 = make_env()
        p4, s4 = env4.init(key)
        timed("no-resets", scan_fn(env4, T), p4, s4, key, steps=T)
    finally:
        le.LeggedEnv._apply_reset = orig_ar

    # obs noise off
    env5 = make_env(lambda c: dataclasses.replace(
        c, noise=dataclasses.replace(c.noise, add_noise=False)))
    p5, s5 = env5.init(key)
    timed("no-noise", scan_fn(env5, T), p5, s5, key, steps=T)

    # pushes off
    env6 = make_env(lambda c: dataclasses.replace(
        c, domain_rand=dataclasses.replace(c.domain_rand,
                                           push_robots=False)))
    p6, s6 = env6.init(key)
    timed("no-push", scan_fn(env6, T), p6, s6, key, steps=T)

    # opt-in kernels ON (A/B against "full" with the current defaults)
    for name, envvars in [
            ("materialized-win", {"DTC_FUSED_WINDOW": "0"}),
            ("pallas-rew", {"DTC_PALLAS_REWARDS": "1"}),
            ("hw-rng", {"DTC_PALLAS_RNG": "1"}),
            ("pallas-obs", {"DTC_PALLAS_OBS": "1"}),
            ("rew+rng", {"DTC_PALLAS_REWARDS": "1", "DTC_PALLAS_RNG": "1"}),
            ("rew+obs", {"DTC_PALLAS_REWARDS": "1", "DTC_PALLAS_OBS": "1"}),
            ("rew+rng+obs", {"DTC_PALLAS_REWARDS": "1",
                             "DTC_PALLAS_RNG": "1", "DTC_PALLAS_OBS": "1"}),
    ]:
        for k, v in envvars.items():
            os.environ[k] = v
        try:
            env7 = make_env()
            p7, s7 = env7.init(key)
            timed(name, scan_fn(env7, T), p7, s7, key, steps=T)
        finally:
            for k in envvars:
                os.environ.pop(k, None)

    # post-physics stubbed entirely: action lag + planner goals + the
    # decimation kernel (and its slab DMAs) only — lower-bounds the
    # physics pipeline; full minus this = all env logic after physics
    orig_pp = le.LeggedEnv._post_physics_step
    def stub_pp(self, params, state, info, key):
        return state, dict(rew=state["phys"]["pos"][0])
    le.LeggedEnv._post_physics_step = stub_pp
    try:
        env9 = make_env()
        p9, s9 = env9.init(key)
        timed("pre+physics", scan_fn(env9, T), p9, s9, key, steps=T)
    finally:
        le.LeggedEnv._post_physics_step = orig_pp

    # command resampling stubbed (the per-step masked redraw + widening)
    orig_rc = le.LeggedEnv._resample_commands_where
    le.LeggedEnv._resample_commands_where = (
        lambda self, commands, *a, **k: commands)
    try:
        env10 = make_env()
        p10, s10 = env10.init(key)
        timed("no-cmd", scan_fn(env10, T), p10, s10, key, steps=T)
    finally:
        le.LeggedEnv._resample_commands_where = orig_rc

    # observations stubbed (obs/priv/history frozen): upper-bounds the
    # whole obs-assembly + noise cost in one number
    orig_co = le.LeggedEnv._compute_observations
    def stub_co(self, params, state, base_pos, base_quat, base_lin_vel,
                base_ang_vel, projected_gravity, measured_heights, key,
                done):
        return state, dict(obs=state["obs"],
                           privileged_obs=state["privileged_obs"],
                           base_vel=state["base_vel"])
    le.LeggedEnv._compute_observations = stub_co
    try:
        env8 = make_env()
        p8, s8 = env8.init(key)
        timed("no-obs", scan_fn(env8, T), p8, s8, key, steps=T)
    finally:
        le.LeggedEnv._compute_observations = orig_co


if __name__ == "__main__":
    main()
