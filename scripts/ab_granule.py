"""A/B: minibatch_perm_granule=1 (exact reference shuffle) vs the TPU
group-granule shuffle, same seed, short lite3_dtc training runs.

Evidence backing the PARITY.md "Known deviations" entry: the two runs
should show indistinguishable learning progress (reward/episode-length
curves within run-to-run noise) while the granule run spends less time in
the update.  Prints a small table + per-variant mean iteration time.

Usage: python scripts/ab_granule.py [--iters 300] [--num_envs 4096]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_variant(granule, iters, num_envs, seed=1):
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
                                      minibatch_perm_granule=granule))
    env = LeggedEnv(task_cfg, terrain_seed=1)

    curve = []

    class Recorder:
        def add_scalar(self, k, v, it):
            if k in ("Train/mean_reward", "Train/mean_episode_length"):
                curve.append((it, k, v))

    runner = OnPolicyRunner(env, train_cfg, log_dir="/tmp/ab_granule",
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
    for g in (1, 16):
        print(f"=== granule {g} ===", flush=True)
        results[g] = run_variant(g, args.iters, args.num_envs)

    print(f"\n{'it':>6s} {'rew G=1':>10s} {'rew G=16':>10s} "
          f"{'len G=1':>10s} {'len G=16':>10s}", flush=True)
    r1, l1, t1 = results[1]
    r16, l16, t16 = results[16]
    for it in sorted(set(r1) & set(r16)):
        print(f"{it:6d} {r1[it]:10.3f} {r16[it]:10.3f} "
              f"{l1.get(it, float('nan')):10.1f} "
              f"{l16.get(it, float('nan')):10.1f}", flush=True)
    print(f"\nwall: G=1 {t1:.1f}s  G=16 {t16:.1f}s "
          f"({(t1 - t16) / max(t1, 1e-9) * 100:+.1f}% faster with G=16)",
          flush=True)
    final = sorted(set(r1) & set(r16))[-1]
    print(f"final rewards: G=1 {r1[final]:.3f} vs G=16 {r16[final]:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
