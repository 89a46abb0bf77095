"""Microbenchmark the minibatch permutation gather on the live backend.

Measures chained group-gathers INSIDE one lax.scan/jit (per CLAUDE.md:
isolated dispatches over the axon tunnel mis-time badly and XLA can
narrow/cache unchained gathers), for the lite3_dtc batch shapes
(T=24, N=4096).  Each scan iteration re-permutes the whole batch and
feeds the result to the next iteration, so nothing can be elided.

Usage: python scripts/profile_gather.py [--num_envs 4096]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

STEPS = 20


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"{name:20s}: {dt:8.2f} ms/gather", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4096)
    args = ap.parse_args()
    T, N = 24, args.num_envs
    R = T * N

    @jax.jit
    def make(key):
        def z(*s, dt=jnp.float32):
            return jnp.zeros((T * N,) + s, dt)
        return dict(obs=z(53), next_obs=z(53),
                    privileged_obs=z(1389, dt=jnp.bfloat16),
                    obs_history=z(265, dt=jnp.bfloat16),
                    base_vel=z(3), actions=z(12), values=z(), returns=z(),
                    advantages=z(), old_log_prob=z(), old_mu=z(12),
                    old_sigma=z(12))

    batch = make(jax.random.PRNGKey(0))
    big = ("privileged_obs", "obs_history")

    def chain(G, keys):
        def run(b, key):
            def body(bb, k):
                perm = jax.random.permutation(k, R // G)
                bb = {kk: v.reshape((R // G, G) + v.shape[1:])[perm]
                            .reshape(v.shape)
                      for kk, v in bb.items() if kk in keys}
                return bb, None
            sel = {k: v for k, v in b.items() if k in keys}
            out, _ = jax.lax.scan(body, sel, jax.random.split(key, STEPS))
            return out
        return jax.jit(run)

    allk = tuple(batch.keys())
    smallk = tuple(k for k in allk if k not in big)
    for G in (1, 8, 16, 64, 256):
        timed(f"gather all G={G}", chain(G, allk), batch,
              jax.random.PRNGKey(1))
    for G in (1, 16):
        timed(f"gather big G={G}", chain(G, big), batch,
              jax.random.PRNGKey(1))
        timed(f"gather small G={G}", chain(G, smallk), batch,
              jax.random.PRNGKey(1))


if __name__ == "__main__":
    main()
