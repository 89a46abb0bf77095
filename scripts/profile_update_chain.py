"""Update-level bench with real sync: N chained PPO updates in ONE jit.

The axon tunnel neither syncs on block_until_ready nor times isolated
dispatches faithfully; here the full ppo.update runs CHAIN times inside
one lax.scan (params/opt-state carried), the result is scalarized, and a
device_get forces completion.  The measured null-call RPC baseline is
subtracted.

Variants: DMA gather on/off (DTC_PALLAS_GATHER), median vs mean filter.
Usage: python scripts/profile_update_chain.py [--num_envs 4096]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

CHAIN = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4096)
    args = ap.parse_args()
    N = args.num_envs

    from deep_tracking_control_tpu.agent.ppo import PPO
    from deep_tracking_control_tpu.env.legged_env import LeggedEnv
    from deep_tracking_control_tpu.runner.train import OnPolicyRunner
    from deep_tracking_control_tpu.tasks.registry import get_cfgs

    task_cfg, train_cfg = get_cfgs("lite3_dtc")
    task_cfg = dataclasses.replace(
        task_cfg, env=dataclasses.replace(task_cfg.env, num_envs=N))
    env = LeggedEnv(task_cfg, terrain_seed=1)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    T = train_cfg.runner.num_steps_per_env
    ppo = runner.ppo

    @jax.jit
    def make_batch(key):
        def z(*shape, dt=jnp.float32):
            return jnp.zeros((T, N) + tuple(shape), dt)
        return dict(obs=z(53), next_obs=z(53),
                    privileged_obs=z(1389, dt=jnp.bfloat16),
                    obs_history=z(265, dt=jnp.bfloat16),
                    base_vel=z(3), actions=z(12),
                    values=z(), returns=z(), advantages=z(),
                    old_log_prob=z(), old_mu=z(12),
                    old_sigma=jnp.ones((T, N, 12)))

    batch = make_batch(jax.random.PRNGKey(0))

    nil = jax.jit(lambda x: x + 1.0)
    jax.device_get(nil(jnp.zeros(())))
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_get(nil(jnp.zeros(())))
    rpc = (time.perf_counter() - t0) / 3
    print(f"rpc baseline: {rpc*1e3:.1f} ms", flush=True)

    def bench(name, p):
        def chain_fn(params, opt_state, vae_opt_state, lr, b, key):
            def body(carry, k):
                params, opt_state, vae_opt_state, lr = carry
                params, opt_state, vae_opt_state, lr, _ = p.update(
                    params, opt_state, vae_opt_state, lr, b, k)
                return (params, opt_state, vae_opt_state, lr), None
            (params, *_), _ = jax.lax.scan(
                body, (params, opt_state, vae_opt_state, lr),
                jax.random.split(key, CHAIN))
            return sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                       for x in jax.tree.leaves(params))
        fn = jax.jit(chain_fn)
        argsv = (runner.params, runner.opt_state, runner.vae_opt_state,
                 runner.learning_rate, batch)
        jax.device_get(fn(*argsv, jax.random.PRNGKey(1)))
        t0 = time.perf_counter()
        jax.device_get(fn(*argsv, jax.random.PRNGKey(2)))
        dt = (time.perf_counter() - t0 - rpc) / CHAIN * 1e3
        print(f"{name:26s}: {dt:8.2f} ms/update", flush=True)
        return dt

    bench("update (default)", ppo)
    os.environ["DTC_PALLAS_GATHER"] = "0"
    try:
        bench("update (xla gather)", ppo)
    finally:
        os.environ.pop("DTC_PALLAS_GATHER", None)
    ppom = PPO(net=ppo.net.clone(outlier_filter="mean"), alg=ppo.alg,
               policy_kind=ppo.policy_kind)
    bench("update (mean filter)", ppom)
    pg1 = PPO(net=ppo.net,
              alg=dataclasses.replace(ppo.alg, minibatch_perm_granule=1),
              policy_kind=ppo.policy_kind)
    bench("update (G=1 exact)", pg1)
    pfj = PPO(net=ppo.net,
              alg=dataclasses.replace(ppo.alg, fused_joint_step=True),
              policy_kind=ppo.policy_kind)
    bench("update (fused joint)", pfj)

    # ---- elimination ladder: component costs by difference (the axon
    # tunnel can't time isolated dispatches, so each PPO.disable variant
    # stubs one component out of the full chained update) ----
    if os.environ.get("PROFILE_ELIM", "1") == "1":
        for name, dis in [
            ("  minus vae step", ("vae",)),
            ("  minus actor net", ("actor",)),
            ("  minus critic net", ("critic",)),
            ("  minus optimizers", ("opt",)),
            ("  gather+optimizers", ("vae", "actor", "critic")),
            ("  gather only", ("vae", "actor", "critic", "opt")),
        ]:
            bench(name, dataclasses.replace(ppo, disable=dis))


if __name__ == "__main__":
    main()
