"""Capture a jax.profiler trace of the env.step scan on the live backend.

Writes a TensorBoard trace to --out (default /tmp/dtc_trace); inspect with
`tensorboard --logdir <out>` or the trace_viewer JSON under
<out>/plugins/profile/*/*.trace.json.gz.  If device tracing is unsupported
over the remote tunnel this still records host-side activity.

Usage: python scripts/profile_trace.py [--num_envs 4096] [--steps 20]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="/tmp/dtc_trace")
    args = ap.parse_args()

    from deep_tracking_control_tpu.env.legged_env import LeggedEnv
    from deep_tracking_control_tpu.tasks.registry import get_cfgs

    cfg, _ = get_cfgs("lite3_dtc")
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, num_envs=args.num_envs))
    env = LeggedEnv(cfg, terrain_seed=1)
    N, T = args.num_envs, args.steps
    key = jax.random.PRNGKey(0)
    params, state = env.init(key)

    @jax.jit
    def env_scan(params, state, key):
        def body(s, k):
            s, out = env.step(params, s, jnp.zeros((N, env.num_actions)), k)
            return s, out["rew"]
        s, rews = jax.lax.scan(body, state, jax.random.split(key, T))
        return s["phys"]["pos"], rews

    out = env_scan(params, state, key)
    jax.block_until_ready(out)            # compile + warmup
    with jax.profiler.trace(args.out):
        out = env_scan(params, state, key)
        jax.block_until_ready(out)
    print(f"trace written to {args.out}", flush=True)


if __name__ == "__main__":
    main()
