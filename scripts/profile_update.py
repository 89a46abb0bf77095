"""Time the PPO/VAE update in isolation on the live backend.

Builds a device-resident synthetic batch (zeros via jit) and times
ppo.update alone, plus the policy act() forward at rollout batch size —
the two non-env components of the training iteration.

Usage: python scripts/profile_update.py [--num_envs 4096]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:12s}: {dt:8.2f} ms", flush=True)
    return dt


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
    ppo = runner.ppo

    @jax.jit
    def make_batch(key):
        def z(*shape):
            return jnp.zeros((T, N) + tuple(shape))
        return dict(obs=z(53), next_obs=z(53), privileged_obs=z(1389),
                    obs_history=z(265), base_vel=z(3), actions=z(12),
                    values=z(), returns=z(), advantages=z(),
                    old_log_prob=z(), old_mu=z(12),
                    old_sigma=jnp.ones((T, N, 12)))

    batch = make_batch(jax.random.PRNGKey(0))

    upd = jax.jit(lambda p, o, v, lr, b, k: ppo.update(p, o, v, lr, b, k))
    timed("update", upd, runner.params, runner.opt_state,
          runner.vae_opt_state, runner.learning_rate, batch,
          jax.random.PRNGKey(1))

    import dataclasses as dc
    from deep_tracking_control_tpu.agent.ppo import PPO

    # granule ablation: exact per-row shuffle (G=1) vs the configured cap
    g_now = ppo.alg.minibatch_perm_granule
    for g in sorted({1, 16, 64, g_now}):
        ppog = PPO(net=ppo.net,
                   alg=dc.replace(ppo.alg, minibatch_perm_granule=g),
                   policy_kind=ppo.policy_kind)
        updg = jax.jit(lambda p, o, v, lr, b, k, _pg=ppog:
                       _pg.update(p, o, v, lr, b, k))
        timed(f"update G={g}", updg, runner.params, runner.opt_state,
              runner.vae_opt_state, runner.learning_rate, batch,
              jax.random.PRNGKey(1))

    # latent_var outlier-filter ablation: exact median vs masked mean
    net_mean = ppo.net.clone(outlier_filter="mean")
    ppom = PPO(net=net_mean, alg=ppo.alg, policy_kind=ppo.policy_kind)
    updm = jax.jit(lambda p, o, v, lr, b, k: ppom.update(p, o, v, lr, b, k))
    timed("update mean", updm, runner.params, runner.opt_state,
          runner.vae_opt_state, runner.learning_rate, batch,
          jax.random.PRNGKey(1))

    # 1-epoch variant: separates per-minibatch cost from fixed overhead
    ppo1 = PPO(net=ppo.net, alg=dc.replace(ppo.alg, num_learning_epochs=1),
               policy_kind=ppo.policy_kind)
    upd1 = jax.jit(lambda p, o, v, lr, b, k: ppo1.update(p, o, v, lr, b, k))
    timed("update e1", upd1, runner.params, runner.opt_state,
          runner.vae_opt_state, runner.learning_rate, batch,
          jax.random.PRNGKey(1))

    # single-minibatch VAE fwd+bwd and policy fwd+bwd, no optimizer: the
    # raw per-minibatch compute (x20 = the update's MXU floor)
    mb_n = T * N // ppo.alg.num_mini_batches
    mb = dict(obs=jnp.zeros((mb_n, 53)), next_obs=jnp.zeros((mb_n, 53)),
              privileged_obs=jnp.zeros((mb_n, 1389)),
              obs_history=jnp.zeros((mb_n, 265)),
              base_vel=jnp.zeros((mb_n, 3)), actions=jnp.zeros((mb_n, 12)),
              values=jnp.zeros(mb_n), returns=jnp.zeros(mb_n),
              advantages=jnp.zeros(mb_n), old_log_prob=jnp.zeros(mb_n),
              old_mu=jnp.zeros((mb_n, 12)), old_sigma=jnp.ones((mb_n, 12)))
    net = ppo.net

    @jax.jit
    def vae_fb(params, k):
        def loss(p):
            r, v, kl, h = net.apply(p, mb["obs_history"],
                                    mb["privileged_obs"], mb["next_obs"],
                                    mb["base_vel"], k,
                                    method=net.vae_losses)
            return r + v + kl + h
        return jax.grad(loss)(params)

    timed("vae f/b  x1", vae_fb, runner.params, jax.random.PRNGKey(3))

    @jax.jit
    def pol_fb(params, k):
        def loss(p):
            mean, std, _, _ = net.apply(p, mb["obs"], mb["obs_history"],
                                        mb["privileged_obs"], k,
                                        method=net.act_stats)
            value = net.apply(p, mb["obs"], mb["privileged_obs"],
                              mb["base_vel"], method=net.evaluate)
            return jnp.mean(mean) + jnp.mean(std) + jnp.mean(value)
        return jax.grad(loss)(params)

    timed("pol f/b  x1", pol_fb, runner.params, jax.random.PRNGKey(4))

    # rollout-side policy forward at (N,) batch, T times inside one jit
    @jax.jit
    def act_scan(params, key):
        obs = jnp.zeros((N, 53))
        hist = jnp.zeros((N, 265))
        priv = jnp.zeros((N, 1389))
        bv = jnp.zeros((N, 3))
        def body(c, k):
            a = ppo.act(params, obs, hist, priv, bv, k)
            return c, a["log_prob"]
        _, lps = jax.lax.scan(body, 0, jax.random.split(key, T))
        return lps
    dt = timed("act x24", act_scan, runner.params, jax.random.PRNGKey(2))
    print(f"act per step: {dt / T:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
