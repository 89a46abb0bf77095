"""Per-component step-time breakdown on the live backend (TPU).

Times, each as a lax.scan inside one jit (per-call RPC is ~100 ms on the
axon tunnel, so never time eager calls):
  physics   — 4 sim substeps (the decimation loop) with patch terrain_fn
  sampler   — patch extraction + 693-pt min3 scan + 4-pt max10 clearance
  planner   — DTC foothold scoring/argmin
  env_step  — the full env.step (everything above + rewards/resets/obs)

Usage: python scripts/profile_step.py [--num_envs 4096] [--steps 50]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(name, fn, *args, steps):
    out = fn(*args)
    jax.block_until_ready(out)            # compile + warmup
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name:10s}: {dt / steps * 1e3:8.3f} ms/step "
          f"({dt:6.3f} s / {steps} steps)", flush=True)
    return dt / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    from deep_tracking_control_tpu.env.legged_env import LeggedEnv
    from deep_tracking_control_tpu.physics import sim as psim
    from deep_tracking_control_tpu.terrain import patch as tpatch
    from deep_tracking_control_tpu.env import planner
    from deep_tracking_control_tpu.tasks.registry import get_cfgs

    cfg, _ = get_cfgs("lite3_dtc")
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, num_envs=args.num_envs))
    env = LeggedEnv(cfg, terrain_seed=1)
    N = args.num_envs
    key = jax.random.PRNGKey(0)
    params, state = env.init(key)
    params = jax.device_put(params)
    state = jax.device_put(state)
    T = args.steps
    print(f"backend={jax.default_backend()} devices={len(jax.devices())} "
          f"N={N} steps={T}", flush=True)

    # ---- full env.step ---------------------------------------------------
    @jax.jit
    def env_scan(params, state, key):
        def body(s, k):
            s, out = env.step(params, s, jnp.zeros((N, env.num_actions)), k)
            return s, out["rew"]
        s, rews = jax.lax.scan(body, state, jax.random.split(key, T))
        return s["phys"]["pos"], rews

    t_env = timed("env_step", env_scan, params, state, key, steps=T)

    # ---- physics only (4 substeps, patch terrain) --------------------------
    hs = env.grid.horizontal_scale

    @jax.jit
    def phys_scan(params, state, key):
        phys, anchors = state["phys"], state["anchors"]
        tau = jnp.zeros((env.model.nq, N))

        def body(c, _):
            phys, anchors = c
            starts, origin = tpatch.patch_starts(env.patch_src,
                                                 phys["pos"].T[:, :2])
            patches = tpatch.extract(env.patch_src, starts)

            def terrain_fn(x, y):
                h, dx, dy, hmx = tpatch.sample_bilinear_slope(
                    patches[0], origin, hs, x.T, y.T)
                return h.T, dx.T, dy.T, hmx.T

            for _i in range(4):
                phys, anchors, info = psim.sim_step(
                    env.model, env.geom, env.cfg.sim, params["inertias"],
                    phys, anchors, tau, terrain_fn, params["friction"],
                    params["restitution"])
            return (phys, anchors), info["contact_forces"][0, 2]

        (phys, anchors), cf = jax.lax.scan(body, (phys, anchors),
                                           None, length=T)
        return phys["pos"], cf

    t_phys = timed("physics", phys_scan, params, state, key, steps=T)

    # ---- sampler: patch extraction + 693-pt min3 + max10 -------------------
    hp = jnp.asarray(env.height_points)

    @jax.jit
    def sampler_scan(state, key):
        from deep_tracking_control_tpu.ops import quat as qm
        phys = state["phys"]
        base_pos = phys["pos"].T
        base_quat = phys["quat"].T

        def body(c, k):
            base_pos, acc = c
            starts, origin = tpatch.patch_starts(env.patch_src,
                                                 base_pos[:, :2])
            patches = tpatch.extract(env.patch_src, starts)
            pts = qm.quat_apply_yaw(base_quat[:, None, :],
                                    jnp.broadcast_to(hp, (N,) + hp.shape))
            pts = pts + base_pos[:, None, :]
            mh = tpatch.sample_nearest(patches[1], origin, hs,
                                       pts[..., 0], pts[..., 1])
            h10 = tpatch.sample_nearest(patches[2], origin, hs,
                                        pts[..., :4, 0], pts[..., :4, 1])
            # make the carry depend on the result so scan can't hoist it
            base_pos = base_pos + 1e-9 * jnp.mean(mh, axis=1, keepdims=True)
            return (base_pos, acc + jnp.mean(mh) + jnp.mean(h10)), None

        (bp, acc), _ = jax.lax.scan(body, (base_pos, 0.0), None, length=T)
        return acc

    t_smp = timed("sampler", sampler_scan, state, key, steps=T)

    # ---- planner ------------------------------------------------------------
    @jax.jit
    def planner_scan(state, key):
        from deep_tracking_control_tpu.ops import quat as qm
        phys = state["phys"]
        base_pos = phys["pos"].T
        base_quat = phys["quat"].T
        base_lin_vel = qm.quat_rotate_inverse(base_quat, phys["lin_vel"].T)
        commands = state["commands"]
        hips = jnp.zeros((N, 4, 3)) + base_pos[:, None, :]
        mh = state["measured_heights"]

        def body(c, _):
            bp, acc = c
            plan = planner.plan_footholds(
                env.cfg, bp, base_quat, base_lin_vel, commands, hips,
                mh, env.height_points,
                env.cfg.terrain.measured_points_x,
                env.cfg.terrain.measured_points_y)
            bp = bp + 1e-9 * plan["foothold_obs"][:, :3]
            return (bp, acc + jnp.mean(plan["foothold_obs"])), None

        (bp, acc), _ = jax.lax.scan(body, (base_pos, 0.0), None, length=T)
        return acc

    t_pln = timed("planner", planner_scan, state, key, steps=T)

    print(f"other (rewards/resets/obs): "
          f"{(t_env - t_phys - t_smp - t_pln) * 1e3:8.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
