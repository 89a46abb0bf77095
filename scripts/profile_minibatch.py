"""Decompose the PPO minibatch step cost on the live backend.

Chained measurements inside one lax.scan/jit (params carried through each
iteration so nothing can be elided): VAE fwd+bwd, policy fwd+bwd, the
optimizer applications, and sub-pieces (terrain encoder alone, median
filter on/off).  All at the lite3_dtc minibatch size T*N/4.

Usage: python scripts/profile_minibatch.py [--num_envs 4096]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

STEPS = 200
_BASELINE = [0.0]


def timed(name, fn, *args):
    # device_get forces real completion (block_until_ready does NOT sync
    # on the axon tunnel); the null-call RPC baseline (min over trials —
    # it jitters 35-80 ms with tunnel load) is subtracted and the
    # residual divided by the chain length.  STEPS=200 keeps the chain
    # an order of magnitude above the baseline jitter.
    out = jax.device_get(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    dt = (best - _BASELINE[0]) / STEPS * 1e3
    print(f"{name:22s}: {dt:8.3f} ms", flush=True)
    return dt


def _scalarize(tree):
    return sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
               for x in jax.tree.leaves(tree))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4096)
    args = ap.parse_args()
    N = args.num_envs

    from deep_tracking_control_tpu.agent.ppo import PPO, make_optimizers
    from deep_tracking_control_tpu.env.legged_env import LeggedEnv
    from deep_tracking_control_tpu.runner.train import OnPolicyRunner
    from deep_tracking_control_tpu.tasks.registry import get_cfgs

    task_cfg, train_cfg = get_cfgs("lite3_dtc")
    task_cfg = dataclasses.replace(
        task_cfg, env=dataclasses.replace(task_cfg.env, num_envs=N))
    env = LeggedEnv(task_cfg, terrain_seed=1)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    T = train_cfg.runner.num_steps_per_env
    alg = train_cfg.algorithm
    mb = T * N // alg.num_mini_batches
    net = runner.ppo.net
    net_mean = net.clone(outlier_filter="mean")
    main_opt, vae_opt = make_optimizers(alg)

    data = dict(obs=jnp.zeros((mb, 53)), next_obs=jnp.zeros((mb, 53)),
                privileged_obs=jnp.zeros((mb, 1389), jnp.bfloat16),
                obs_history=jnp.zeros((mb, 265), jnp.bfloat16),
                base_vel=jnp.zeros((mb, 3)), actions=jnp.zeros((mb, 12)),
                values=jnp.zeros(mb), returns=jnp.zeros(mb),
                advantages=jnp.zeros(mb), old_log_prob=jnp.zeros(mb),
                old_mu=jnp.zeros((mb, 12)), old_sigma=jnp.ones((mb, 12)))

    # measure the null-call RPC baseline first
    nil = jax.jit(lambda x: x + 1.0)
    jax.device_get(nil(jnp.zeros(())))
    trials = []
    for _ in range(6):
        t0 = time.perf_counter()
        jax.device_get(nil(jnp.zeros(())))
        trials.append(time.perf_counter() - t0)
    _BASELINE[0] = min(trials)
    print(f"rpc baseline (min of 6): {_BASELINE[0]*1e3:.1f} ms", flush=True)

    def chain(step_fn):
        @jax.jit
        def run(params, key):
            def body(p, k):
                return step_fn(p, k), None
            p, _ = jax.lax.scan(body, params,
                                jax.random.split(key, STEPS))
            return _scalarize(p)
        return run

    def apply_grads(params, grads):
        # cheap SGD apply keeps the dependence chain without timing Adam
        return jax.tree.map(lambda p, g: p - 1e-9 * g, params, grads)

    def vae_step(nn):
        def f(params, k):
            def loss(p):
                r, v, kl, h = nn.apply(
                    p, data["obs_history"], data["privileged_obs"],
                    data["next_obs"], data["base_vel"], k,
                    method=nn.vae_losses)
                return r + v + alg.kld_weight * kl + h
            return apply_grads(params, jax.grad(loss)(params))
        return f

    def pol_step(nn):
        def f(params, k):
            def loss(p):
                mean, std, _, _ = nn.apply(
                    p, data["obs"], data["obs_history"],
                    data["privileged_obs"], k, method=nn.act_stats)
                value = nn.apply(p, data["obs"], data["privileged_obs"],
                                 data["base_vel"], method=nn.evaluate)
                lp = jnp.sum(-0.5 * jnp.square(data["actions"] - mean)
                             / (std * std), axis=-1)
                return (jnp.mean(lp * data["advantages"])
                        + jnp.mean(jnp.square(value - data["returns"])))
            return apply_grads(params, jax.grad(loss)(params))
        return f

    key = jax.random.PRNGKey(0)
    timed("vae f/b median", chain(vae_step(net)), runner.params, key)
    timed("vae f/b mean", chain(vae_step(net_mean)), runner.params, key)
    timed("pol f/b median", chain(pol_step(net)), runner.params, key)
    timed("pol f/b mean", chain(pol_step(net_mean)), runner.params, key)

    # terrain encoder alone (the FLOPs-dominant submodule), fwd+bwd
    def terr_step(params, k):
        def loss(p):
            l_t = net.apply(p, data["privileged_obs"][..., :693],
                            method=lambda m, x: m.vae.encode_terrain(x))
            return jnp.mean(jnp.square(l_t))
        return apply_grads(params, jax.grad(loss)(params))
    timed("terrain enc f/b", chain(terr_step), runner.params, key)

    # critic alone
    def critic_step(params, k):
        def loss(p):
            v = net.apply(p, data["obs"], data["privileged_obs"],
                          data["base_vel"], method=net.evaluate)
            return jnp.mean(jnp.square(v))
        return apply_grads(params, jax.grad(loss)(params))
    timed("critic f/b", chain(critic_step), runner.params, key)

    # both optimizers applied to zero-like grads (state churn cost)
    opt_state = main_opt.init(runner.params)
    vae_state = vae_opt.init(runner.params)

    @jax.jit
    def opt_chain(params, opt_state, vae_state):
        def body(carry, _):
            p, os_, vs = carry
            g = jax.tree.map(jnp.zeros_like, p)
            vu, vs = vae_opt.update(g, vs, p)
            u, os_ = main_opt.update(g, os_, p)
            p = jax.tree.map(lambda a, b, c: a + b + c, p, u, vu)
            return (p, os_, vs), None
        out, _ = jax.lax.scan(body, (params, opt_state, vae_state),
                              jnp.arange(STEPS))
        return _scalarize(out[0])
    t0 = timed("2x optimizer", opt_chain, runner.params, opt_state,
               vae_state)

    # median filter in isolation at both call sizes
    from deep_tracking_control_tpu.models.networks import masked_median

    for n in (mb * 16, N * 16):
        x0 = jax.random.normal(jax.random.PRNGKey(1), (n,))

        @jax.jit
        def med_chain(x):
            def body(xx, _):
                m = masked_median(xx, jnp.abs(xx) < 2.0)
                return xx * 0.9999 + m * 1e-6, None
            out, _ = jax.lax.scan(body, x, jnp.arange(STEPS))
            return jnp.sum(out)
        timed(f"masked_median n={n}", med_chain, x0)


if __name__ == "__main__":
    main()
