"""Benchmark the Pallas decimation kernel vs the XLA physics path on TPU.

Times full env.step scans (physics + sampler + planner + rewards) with the
kernel enabled vs disabled, plus bare-physics scans.
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
    dt = time.perf_counter() - t0
    print(f"{name:16s}: {dt / steps * 1e3:8.3f} ms/step", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    from deep_tracking_control_tpu.env.legged_env import LeggedEnv
    from deep_tracking_control_tpu.tasks.registry import get_cfgs

    cfg, _ = get_cfgs("lite3_dtc")
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, num_envs=args.num_envs))
    env = LeggedEnv(cfg, terrain_seed=1)
    N = args.num_envs
    T = args.steps
    key = jax.random.PRNGKey(0)
    params, state = env.init(key)
    print(f"backend={jax.default_backend()} N={N} steps={T} "
          f"kernel_gate={env._pallas_physics}", flush=True)

    def make_scan():
        @jax.jit
        def env_scan(params, state, key):
            def body(s, k):
                s, out = env.step(params, s,
                                  jnp.zeros((N, env.num_actions)), k)
                return s, out["rew"]
            s, rews = jax.lax.scan(body, state, jax.random.split(key, T))
            return s["phys"]["pos"], rews
        return env_scan

    env._pallas_physics = True
    timed("env_step kernel", make_scan(), params, state, key, steps=T)
    # fused-sampler variant (DTC_PALLAS_SAMPLER is read at trace time)
    os.environ["DTC_PALLAS_SAMPLER"] = "1"
    timed("env_step k+sampler", make_scan(), params, state, key, steps=T)
    os.environ["DTC_PALLAS_SAMPLER"] = "0"
    env._pallas_physics = False
    timed("env_step xla", make_scan(), params, state, key, steps=T)


if __name__ == "__main__":
    main()
