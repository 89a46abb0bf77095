"""Benchmark: full TRAINING throughput of the DTC pipeline on real hardware.

North-star metric (BASELINE.md): env steps/sec/chip at 4096 envs for the
Lite3 DTC task, measured over complete training iterations — physics (4 sim
substeps), height scan, foothold planner, rewards, resets, policy inference,
GAE, and the 5x4-minibatch PPO+VAE update — i.e. the same quantity as the
reference's Perf/total_fps (on_policy_runner.py:185).  vs_baseline is
against the reference stack's derived ~55k env steps/s (BASELINE.md).

Prints ONE JSON line.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    from deep_tracking_control_tpu.env.legged_env import LeggedEnv
    from deep_tracking_control_tpu.runner.train import OnPolicyRunner
    from deep_tracking_control_tpu.tasks.registry import get_cfgs

    N = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    ITERS = int(os.environ.get("BENCH_ITERS", 30))
    task_cfg, train_cfg = get_cfgs("lite3_dtc")
    task_cfg = dataclasses.replace(
        task_cfg, env=dataclasses.replace(task_cfg.env, num_envs=N))
    if os.environ.get("BENCH_FUSED_JOINT", "0") == "1":   # A/B hook
        train_cfg = dataclasses.replace(
            train_cfg, algorithm=dataclasses.replace(
                train_cfg.algorithm, fused_joint_step=True))
    if "BENCH_SHUFFLE_STRATA" in os.environ:              # A/B hook
        train_cfg = dataclasses.replace(
            train_cfg, algorithm=dataclasses.replace(
                train_cfg.algorithm, shuffle_strata=int(
                    os.environ["BENCH_SHUFFLE_STRATA"])))
    if "BENCH_ITERS_PER_DISPATCH" in os.environ:          # A/B hook
        try:
            k_override = int(os.environ["BENCH_ITERS_PER_DISPATCH"])
        except ValueError:
            sys.exit("BENCH_ITERS_PER_DISPATCH must be an integer >= 1")
        if k_override < 1:
            sys.exit("BENCH_ITERS_PER_DISPATCH must be >= 1")
        # Clamp K to ITERS: learn() only engages the block graph when
        # >= K iterations remain, so a K > ITERS would pay a ~10-min
        # remote block compile for a program the timed window never
        # runs while silently measuring single dispatch (ADVICE r4).
        train_cfg = dataclasses.replace(
            train_cfg, runner=dataclasses.replace(
                train_cfg.runner,
                iters_per_dispatch=min(k_override, ITERS)))
    env = LeggedEnv(task_cfg, terrain_seed=1)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None)

    T = train_cfg.runner.num_steps_per_env
    # Warmup must compile every dispatch program the measured loop uses;
    # with K > 1 (opt-in block dispatch) that includes the K-iteration
    # block graph, so warm K + 3 iterations.
    K = train_cfg.runner.iters_per_dispatch
    runner.learn(K + 3, log_every=10 ** 9)      # warmup + compile

    t0 = time.perf_counter()
    runner.learn(ITERS, log_every=10 ** 9)
    jax.block_until_ready(runner.params)
    dt = time.perf_counter() - t0

    sps = N * T * ITERS / dt
    baseline = 55_000.0   # BASELINE.md derived reference training fps
    print(json.dumps({
        "metric": "dtc_train_env_steps_per_sec",
        "value": round(sps, 1),
        "unit": "env_steps/s/chip",
        "vs_baseline": round(sps / baseline, 2),
    }))


if __name__ == "__main__":
    main()
