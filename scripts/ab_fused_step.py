"""A/B: sequential VAE-then-policy minibatch step (exact reference
ordering, ppo.py:197-254 then :265) vs the fused joint step
(AlgorithmCfg.fused_joint_step: one shared encoder forward, both grads at
the pre-VAE-step params).

Evidence backing the PARITY.md "Known deviations" entry: same seed, short
lite3_dtc training runs — learning curves should be indistinguishable
(within run-to-run noise) while the fused run spends less time in the
update.  Prints a small table + per-variant wall time.

Usage: python scripts/ab_fused_step.py [--iters 300] [--num_envs 4096]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_variant(fused, iters, num_envs, seed=1):
    import jax
    from deep_tracking_control_tpu.env.legged_env import LeggedEnv
    from deep_tracking_control_tpu.runner.train import OnPolicyRunner
    from deep_tracking_control_tpu.tasks.registry import get_cfgs

    task_cfg, train_cfg = get_cfgs("lite3_dtc")
    task_cfg = dataclasses.replace(
        task_cfg, env=dataclasses.replace(task_cfg.env, num_envs=num_envs))
    train_cfg = dataclasses.replace(
        train_cfg,
        runner=dataclasses.replace(train_cfg.runner, seed=seed),
        algorithm=dataclasses.replace(train_cfg.algorithm,
                                      fused_joint_step=fused))
    env = LeggedEnv(task_cfg, terrain_seed=1)

    curve = []

    class Recorder:
        def add_scalar(self, k, v, it):
            if k in ("Train/mean_reward", "Train/mean_episode_length"):
                curve.append((it, k, v))

    runner = OnPolicyRunner(env, train_cfg, log_dir="/tmp/ab_fused",
                            writer=Recorder())
    t0 = time.time()
    runner.learn(iters, log_every=10, init_at_random_ep_len=True)
    dt = time.time() - t0
    rew = {it: v for it, k, v in curve if k == "Train/mean_reward"}
    ln = {it: v for it, k, v in curve if k == "Train/mean_episode_length"}
    return rew, ln, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--num_envs", type=int, default=4096)
    args = ap.parse_args()

    results = {}
    for fused in (False, True):
        print(f"=== fused_joint_step={fused} ===", flush=True)
        results[fused] = run_variant(fused, args.iters, args.num_envs)

    print(f"\n{'it':>6s} {'rew seq':>10s} {'rew fused':>10s} "
          f"{'len seq':>10s} {'len fused':>10s}", flush=True)
    rs, ls, ts = results[False]
    rf, lf, tf = results[True]
    for it in sorted(set(rs) & set(rf)):
        print(f"{it:6d} {rs[it]:10.3f} {rf[it]:10.3f} "
              f"{ls.get(it, float('nan')):10.1f} "
              f"{lf.get(it, float('nan')):10.1f}", flush=True)
    print(f"\nwall: seq {ts:.1f}s  fused {tf:.1f}s "
          f"({(ts - tf) / max(ts, 1e-9) * 100:+.1f}% faster fused)",
          flush=True)
    final = sorted(set(rs) & set(rf))[-1]
    print(f"final rewards: seq {rs[final]:.3f} vs fused {rf[final]:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
