"""XLA cost_analysis of the two hot graphs: one env.step and one PPO update.

Prints total FLOPs + bytes accessed per graph and the implied 100%-MXU /
100%-HBM floor on this chip, to calibrate docs/perf.md rooflines against
measured wall times (profile_elim.py / profile_update_chain.py).

Usage: python scripts/cost_analysis.py [--num_envs 4096]
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# v5e peak: ~197 TFLOP/s bf16, ~394 TOP/s int8, HBM ~819 GB/s
PEAK_FLOPS = 197e12
PEAK_BW = 819e9


def report(name, lowered):
    c = lowered.compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    fl = c.get("flops", 0.0)
    by = c.get("bytes accessed", 0.0)
    print(f"{name:14s}: {fl/1e12:8.3f} TFLOP  {by/1e9:8.3f} GB  "
          f"mxu_floor={fl/PEAK_FLOPS*1e3:7.3f} ms  "
          f"hbm_floor={by/PEAK_BW*1e3:7.3f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4096)
    args = ap.parse_args()
    N = args.num_envs

    from deep_tracking_control_tpu.env.legged_env import LeggedEnv
    from deep_tracking_control_tpu.runner.train import OnPolicyRunner
    from deep_tracking_control_tpu.tasks.registry import get_cfgs

    task_cfg, train_cfg = get_cfgs("lite3_dtc")
    task_cfg = dataclasses.replace(
        task_cfg, env=dataclasses.replace(task_cfg.env, num_envs=N))
    env = LeggedEnv(task_cfg, terrain_seed=1)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    T = train_cfg.runner.num_steps_per_env
    key = jax.random.PRNGKey(0)
    params, state = env.init(key)

    # ---- one env.step
    step = jax.jit(lambda p, s, k: env.step(
        p, s, jnp.zeros((N, env.num_actions)), k))
    report("env.step", step.lower(params, state, key))

    # ---- one policy act forward
    act = jax.jit(lambda p, o, h, po, bv, k: runner.ppo.act(p, o, h, po, bv, k))
    obs = jnp.zeros((N, 53))
    report("act", act.lower(runner.params, obs,
                            jnp.zeros((N, 265), jnp.bfloat16),
                            jnp.zeros((N, 1389), jnp.bfloat16),
                            jnp.zeros((N, 3)), key))

    # ---- one PPO update (batch shapes as stored by the runner)
    def zb(*shape, dt=jnp.float32):
        return jnp.zeros((T, N) + tuple(shape), dt)
    batch = dict(obs=zb(53), next_obs=zb(53),
                 privileged_obs=zb(1389, dt=jnp.bfloat16),
                 obs_history=zb(265, dt=jnp.bfloat16),
                 base_vel=zb(3), actions=zb(12),
                 values=zb(), returns=zb(), advantages=zb(),
                 old_log_prob=zb(), old_mu=zb(12),
                 old_sigma=jnp.ones((T, N, 12)))
    upd = jax.jit(runner.ppo.update)
    report("update", upd.lower(runner.params, runner.opt_state,
                               runner.vae_opt_state, runner.learning_rate,
                               batch, key))


if __name__ == "__main__":
    main()
