"""Collection-vs-learning wall-clock split on the live backend (TPU).

Builds OnPolicyRunner in perf_split mode (two jitted programs) and times
each phase over repeated iterations — the profiling counterpart of the
reference's Perf/collection time + Perf/learning_time telemetry
(on_policy_runner.py:143-155,196-198).

Usage: python scripts/profile_train.py [--num_envs 4096] [--iters 10]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from deep_tracking_control_tpu.env.legged_env import LeggedEnv
    from deep_tracking_control_tpu.runner.train import OnPolicyRunner
    from deep_tracking_control_tpu.tasks.registry import get_cfgs

    task_cfg, train_cfg = get_cfgs("lite3_dtc")
    task_cfg = dataclasses.replace(
        task_cfg, env=dataclasses.replace(task_cfg.env,
                                          num_envs=args.num_envs))
    train_cfg = dataclasses.replace(
        train_cfg, runner=dataclasses.replace(train_cfg.runner,
                                              perf_split=True))
    env = LeggedEnv(task_cfg, terrain_seed=1)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    T = train_cfg.runner.num_steps_per_env
    N = args.num_envs

    key = jax.random.PRNGKey(0)

    def one_iter():
        nonlocal key
        key, k_roll, k_upd = jax.random.split(key, 3)
        t0 = time.perf_counter()
        env_state, log_state, batch, aux = runner._collect_fn(
            runner.params, runner.env_params, runner.env_state,
            runner._log_state, k_roll)
        jax.block_until_ready(batch)
        t1 = time.perf_counter()
        out = runner._update_fn(
            runner.params, runner.opt_state, runner.vae_opt_state,
            runner.learning_rate, batch, k_upd)
        jax.block_until_ready(out)
        t2 = time.perf_counter()
        (runner.params, runner.opt_state, runner.vae_opt_state,
         runner.learning_rate) = out[:4]
        runner.env_state = env_state
        runner._log_state = log_state
        return t1 - t0, t2 - t1

    one_iter()                                     # compile + warmup
    tc = tl = 0.0
    for _ in range(args.iters):
        c, l = one_iter()
        tc += c
        tl += l
    tc /= args.iters
    tl /= args.iters
    steps = T * N
    print(f"collection: {tc * 1e3:8.2f} ms/iter "
          f"({tc / T * 1e3:6.3f} ms/env-step)")
    print(f"learning  : {tl * 1e3:8.2f} ms/iter "
          f"({tl / T * 1e3:6.3f} ms/env-step-equiv)")
    print(f"total     : {(tc + tl) * 1e3:8.2f} ms/iter "
          f"-> {steps / (tc + tl):,.0f} env steps/s")


if __name__ == "__main__":
    main()
