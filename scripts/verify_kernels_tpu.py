"""On-device A/B parity harness: Pallas kernel paths vs the XLA fallbacks.

The interpret-mode tests (tests/test_pallas_*.py) pin kernel NUMERICS on
CPU; this script validates the real Mosaic lowering on the live TPU chip:
it steps the same initial env state through the full env.step pipeline
with (A) all Pallas kernels enabled and (B) `DTC_PALLAS_PHYSICS=0
DTC_PALLAS_SAMPLER=0 DTC_PALLAS_PLANNER=0 DTC_PALLAS_REWARDS=0
DTC_PALLAS_RNG=0 DTC_PALLAS_OBS=0`, then compares

  1. short-horizon state trajectories (20 steps, before chaos amplifies
     the bf16-vs-f32 sampling differences), and
  2. long-horizon aggregate behavior (--steps, default 500): mean reward,
     termination counts, contact rates, mean base height.

Tolerances are documented inline; run on TPU as part of the verify
recipe (.claude/skills/verify/SKILL.md).  Exit code 0 = pass.

Usage: python scripts/verify_kernels_tpu.py [--num_envs 1024] [--steps 500]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_env(num_envs):
    from deep_tracking_control_tpu.env.legged_env import LeggedEnv
    from deep_tracking_control_tpu.tasks.registry import get_cfgs
    cfg, _ = get_cfgs("lite3_dtc")
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, num_envs=num_envs))
    return LeggedEnv(cfg, terrain_seed=1)


def run(env, T, key):
    """T steps with a seeded random-walk action policy; returns per-step
    aggregates + the final/early state snapshots."""
    N = env.num_envs

    @jax.jit
    def go(params, state, key):
        def body(carry, k):
            state, act = carry
            k_a, k_e = jax.random.split(k)
            act = jnp.clip(act + 0.1 * jax.random.normal(
                k_a, (N, env.num_actions)), -1.0, 1.0)
            state, out = env.step(params, state, act, k_e)
            stats = dict(
                rew=jnp.mean(out["rew"]),
                done=jnp.sum(out["done"].astype(jnp.float32)),
                height=jnp.mean(state["phys"]["pos"][2]),
                contact=jnp.mean(
                    state["last_contacts"].astype(jnp.float32)),
                q=jnp.mean(jnp.abs(state["phys"]["q"])),
            )
            return (state, act), stats
        (state, _), stats = jax.lax.scan(
            body, (state, jnp.zeros((N, env.num_actions))),
            jax.random.split(key, T))
        return state, stats

    params, state = env.init(jax.random.PRNGKey(7))
    state, stats = go(params, state, key)
    return jax.device_get(stats), jax.device_get(
        dict(pos=state["phys"]["pos"], q=state["phys"]["q"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=500)
    args = ap.parse_args()
    key = jax.random.PRNGKey(3)
    print(f"backend={jax.default_backend()} N={args.num_envs} "
          f"T={args.steps}", flush=True)

    failures = []

    def check(name, a, b, tol, rel=False):
        d = abs(a - b) / (abs(b) + 1e-9) if rel else abs(a - b)
        ok = d <= tol
        print(f"{name:28s}: kernel={a:12.5f} xla={b:12.5f} "
              f"{'rel ' if rel else ''}diff={d:9.2e} tol={tol:g} "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            failures.append(name)

    # ---- A: kernels on (default) --------------------------------------
    env_a = build_env(args.num_envs)
    stats_a, snap_a = run(env_a, args.steps, key)
    short_a, _ = run(env_a, 20, key)

    # ---- B: XLA fallbacks ---------------------------------------------
    for v in ("DTC_PALLAS_PHYSICS", "DTC_PALLAS_SAMPLER",
              "DTC_PALLAS_PLANNER", "DTC_PALLAS_REWARDS",
              "DTC_PALLAS_RNG", "DTC_PALLAS_OBS"):
        os.environ[v] = "0"
    try:
        env_b = build_env(args.num_envs)
        stats_b, snap_b = run(env_b, args.steps, key)
        short_b, _ = run(env_b, 20, key)
    finally:
        for v in ("DTC_PALLAS_PHYSICS", "DTC_PALLAS_SAMPLER",
                  "DTC_PALLAS_PLANNER", "DTC_PALLAS_REWARDS",
                  "DTC_PALLAS_RNG", "DTC_PALLAS_OBS"):
            os.environ.pop(v, None)

    # ---- 1. short horizon: stepwise means track closely ----------------
    # bf16 nearest sampling + the kernels' different reduce associations
    # give per-step noise ~1e-3; 20 steps keeps chaos below that scale.
    for k in ("rew", "height", "q", "contact"):
        check(f"short20 mean {k}", float(np.mean(short_a[k])),
              float(np.mean(short_b[k])), 0.02, rel=True)

    # ---- 2. long horizon: aggregate behavior equivalence ---------------
    # trajectories decorrelate (chaotic dynamics), so compare the
    # distributional aggregates over N envs x T steps; 3% relative.
    for k in ("rew", "height", "q", "contact"):
        check(f"long mean {k}", float(np.mean(stats_a[k])),
              float(np.mean(stats_b[k])), 0.03, rel=True)
    check("long done/step", float(np.mean(stats_a["done"])),
          float(np.mean(stats_b["done"])),
          max(0.05 * args.num_envs / 1024, 0.05 + 0.1 * float(
              np.mean(stats_b["done"]))))

    # ---- 3. HW PRNG distribution gate (experimental/pallas_rng.py) ------
    # The noise STREAM deviates from threefry by design; gate the
    # distribution itself: mean ~0, var ~1/3 (uniform [-1,1)), key and
    # tile decorrelation.  Interpret mode stubs the PRNG, so this only
    # runs on real hardware.
    if jax.default_backend() != "cpu":
        from deep_tracking_control_tpu.experimental import pallas_rng
        u1 = np.asarray(pallas_rng.uniform_pm1(
            jax.random.PRNGKey(11), (4096, 693)))
        u2 = np.asarray(pallas_rng.uniform_pm1(
            jax.random.PRNGKey(12), (4096, 693)))
        check("hwrng mean", float(u1.mean()), 0.0, 0.01)
        check("hwrng var", float(u1.var()), 1.0 / 3.0, 0.02, rel=True)
        check("hwrng key corr", float(np.corrcoef(
            u1.ravel()[:500000], u2.ravel()[:500000])[0, 1]), 0.0, 0.01)
        check("hwrng tile corr", float(np.corrcoef(
            u1[:512].ravel(), u1[512:1024].ravel())[0, 1]), 0.0, 0.01)
        check("hwrng range", float(np.abs(u1).max()), 1.0, 1e-5)

    if failures:
        print(f"PARITY FAIL: {failures}", flush=True)
        sys.exit(1)
    print("PARITY OK: kernel and XLA paths behaviorally equivalent",
          flush=True)


if __name__ == "__main__":
    main()
