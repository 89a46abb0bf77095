"""Benchmark: env throughput of the full DTC pipeline on real hardware.

North-star metric (BASELINE.md): env steps/sec/chip at 4096 envs for the
Lite3 DTC task — physics (4 sim substeps), height scan, foothold planner,
rewards, resets, AND policy inference per env step, i.e. the reference's
"collection" path.  vs_baseline is against the reference stack's derived
~55k env steps/s (BASELINE.md, derived from README.md:55 + configs).

Prints ONE JSON line.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    from deep_tracking_control_tpu.env.legged_env import LeggedEnv
    from deep_tracking_control_tpu.models.networks import ActorCriticDecoder
    from deep_tracking_control_tpu.tasks.registry import get_cfgs

    N = int(os.environ.get("BENCH_NUM_ENVS", 4096))
    STEPS = int(os.environ.get("BENCH_STEPS", 200))
    task_cfg, train_cfg = get_cfgs("lite3_dtc")
    task_cfg = dataclasses.replace(
        task_cfg, env=dataclasses.replace(task_cfg.env, num_envs=N))
    env = LeggedEnv(task_cfg, terrain_seed=1)

    net = ActorCriticDecoder(num_obs=env.num_obs,
                             num_privileged_obs=env.num_privileged_obs,
                             num_actions=env.num_actions,
                             obs_history_dim=env.num_obs_history,
                             terrain_dim=env.num_height_points)
    key = jax.random.PRNGKey(0)
    k_env, k_net, k_run = jax.random.split(key, 3)
    params, state = env.init(k_env)
    net_params = net.init(k_net, state["obs"][:1], state["obs_history"][:1],
                          state["privileged_obs"][:1], state["base_vel"][:1],
                          jax.random.PRNGKey(1))

    def collect_chunk(net_params, params, state, key):
        def body(carry, k):
            state = carry
            k1, k2, k3 = jax.random.split(k, 3)
            mean, std, _, _ = net.apply(net_params, state["obs"],
                                        state["obs_history"],
                                        state["privileged_obs"], k1,
                                        method=net.act_stats)
            actions = mean + std * jax.random.normal(k2, mean.shape)
            state, out = env.step(params, state, actions, k3)
            return state, out["rew"]

        state, rews = jax.lax.scan(body, state, jax.random.split(key, STEPS))
        return state, jnp.mean(rews)

    chunk = jax.jit(collect_chunk, donate_argnums=(2,))

    # warmup / compile
    state, _ = chunk(net_params, params, state, jax.random.PRNGKey(10))
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    n_chunks = 3
    for i in range(n_chunks):
        state, mr = chunk(net_params, params, state, jax.random.PRNGKey(20 + i))
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    env_steps = N * STEPS * n_chunks
    sps = env_steps / dt
    baseline = 55_000.0   # BASELINE.md derived reference throughput
    print(json.dumps({
        "metric": "dtc_env_steps_per_sec",
        "value": round(sps, 1),
        "unit": "env_steps/s/chip",
        "vs_baseline": round(sps / baseline, 2),
    }))


if __name__ == "__main__":
    main()
