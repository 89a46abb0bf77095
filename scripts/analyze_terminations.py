"""Per-cause / per-terrain termination analysis for a trained policy.

Answers "what ends episodes early?" (e.g. the X30 DTC len~615 plateau,
VERDICT r3 #6): rolls the deterministic teacher policy on the training
curriculum world and tallies, per termination cause (torso contact force,
gravity flip, height-below-terrain, timeout — check_termination parity,
legged_robot_dtc.py:229-245) and per terrain level/type, how episodes end.

Usage: python scripts/analyze_terminations.py --task x30_dtc
           --log_root logs [--num_envs 256] [--steps 2000]
           [--level L]   # pin all envs to curriculum level L (else mixed)
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# the axon TPU plugin overrides JAX_PLATFORMS at interpreter start; this
# flag re-forces the CPU backend after import (same trick as tests/conftest)
if os.environ.get("DTC_FORCE_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

from deep_tracking_control_tpu.env.legged_env import LeggedEnv
from deep_tracking_control_tpu.runner.train import OnPolicyRunner
from deep_tracking_control_tpu.runner import checkpoint as ckpt
from deep_tracking_control_tpu.tasks.registry import get_cfgs
from deep_tracking_control_tpu.utils.cli import get_args, update_cfg_from_args

from deep_tracking_control_tpu.terrain.generator import column_families


def main():
    args = get_args(extra=[
        (["--steps"], dict(type=int, default=2000)),
        (["--level"], dict(type=int, default=-1)),
    ])
    task_cfg, train_cfg = get_cfgs(args.task)
    task_cfg, train_cfg = update_cfg_from_args(task_cfg, train_cfg, args)
    N = args.num_envs or 256
    task_cfg = dataclasses.replace(
        task_cfg,
        env=dataclasses.replace(task_cfg.env, num_envs=N,
                                play_command=False),
        terrain=dataclasses.replace(task_cfg.terrain, curriculum=True,
                                    max_init_terrain_level=(
                                        args.level if args.level >= 0
                                        else task_cfg.terrain.num_rows - 1)),
        noise=dataclasses.replace(task_cfg.noise, add_noise=False),
        domain_rand=dataclasses.replace(task_cfg.domain_rand,
                                        push_robots=False),
    )
    env = LeggedEnv(task_cfg, terrain_seed=train_cfg.runner.seed + 3)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    root = os.path.join(args.log_root, train_cfg.runner.experiment_name)
    path = ckpt.get_load_path(root, train_cfg.runner.load_run,
                              train_cfg.runner.checkpoint)
    print(f"Loading policy from {path}", flush=True)
    runner.load(path, load_optimizer=False)
    # DTC_EVAL_RAW_LT=1 evaluates on the TRAINING input layout
    # (act_deterministic: raw l_t) instead of the reference's
    # act_teacher belief substitution — see networks.act_teacher.
    policy = runner.get_inference_policy(
        teacher=os.environ.get("DTC_EVAL_RAW_LT", "0") != "1")
    params, state = runner.env_params, runner.env_state
    if args.level >= 0:
        state = {**state, "terrain_levels":
                 jnp.full_like(state["terrain_levels"], args.level)}

    T = args.steps
    CAUSES = ("term_contact", "term_gravity", "term_height", "term_timeout")

    @jax.jit
    def rollout(params, state, key):
        def body(c, k):
            state = c
            a = policy(state["obs"], state["obs_history"],
                       state["privileged_obs"])
            # freeze the curriculum so per-level attribution stays stable
            lv = state["terrain_levels"]
            state, out = env.step(params, state, a, k)
            state = {**state, "terrain_levels": lv}
            m = out["metrics"]
            # per-(cause, level, type) termination tallies
            done = out["done"]
            lvl = lv
            typ = state["terrain_types"]
            stats = dict(
                ep_len_sum=jnp.sum(
                    jnp.where(done, 0.0, 1.0)),  # live-step count
                n_done=m["n_done"],
                **{c: m[c] for c in CAUSES})
            onehot_lvl = jax.nn.one_hot(lvl, env.cfg.terrain.num_rows)
            onehot_typ = jax.nn.one_hot(typ, env.cfg.terrain.num_cols)
            dn = done.astype(jnp.float32)
            non_to = (done & ~out["time_out"]).astype(jnp.float32)
            stats["done_by_level"] = jnp.sum(dn[:, None] * onehot_lvl, 0)
            stats["fall_by_level"] = jnp.sum(non_to[:, None] * onehot_lvl, 0)
            stats["done_by_type"] = jnp.sum(dn[:, None] * onehot_typ, 0)
            stats["fall_by_type"] = jnp.sum(non_to[:, None] * onehot_typ, 0)
            return state, stats
        return jax.lax.scan(body, state, jax.random.split(key, T))

    state, stats = rollout(params, state, jax.random.PRNGKey(11))
    stats = jax.device_get(jax.tree.map(lambda x: jnp.sum(x, 0), stats))

    n_done = max(stats["n_done"], 1.0)
    print(f"\n=== {args.task} over {N} envs x {T} steps "
          f"(level={'mixed' if args.level < 0 else args.level}) ===")
    print(f"episodes ended: {int(stats['n_done'])}   "
          f"mean ep len ~ {N * T / n_done:.0f} steps")
    print("\ncause rates (per ended episode; causes may co-fire):")
    for c in CAUSES:
        print(f"  {c:14s}: {stats[c] / n_done:7.3f}")
    print("\nterminations by terrain level (row = difficulty):")
    for i, (d, f) in enumerate(zip(stats["done_by_level"],
                                   stats["fall_by_level"])):
        if d > 0:
            print(f"  level {i:2d}: ended {int(d):6d}  non-timeout "
                  f"{int(f):6d}  ({100 * f / max(d, 1):.0f}% falls)")
    print("\nterminations by terrain column (type):")
    fam_by_col = column_families(env.cfg.terrain)
    for i, (d, f) in enumerate(zip(stats["done_by_type"],
                                   stats["fall_by_type"])):
        name = fam_by_col[i]
        if d > 0:
            print(f"  {name:16s}: ended {int(d):6d}  non-timeout "
                  f"{int(f):6d}  ({100 * f / max(d, 1):.0f}% falls)")


if __name__ == "__main__":
    main()
