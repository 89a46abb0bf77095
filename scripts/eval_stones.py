"""Stepping-stone evaluation: tracking error + fall rate on the headline
DTC terrain.

Builds a selected-terrain world (every tile stepping_stones, the task the
paper/README headline — reference capability anchor: play.py's
stepping-stone-heavy proportions, scripts/play.py:33-36), loads the latest
checkpoint, rolls the deterministic teacher policy, and reports:
  * mean |v_cmd - v| tracking error (xy) over non-fallen steps
  * fall rate: non-timeout terminations per commanded-episode
  * mean episode length

Usage: python scripts/eval_stones.py --task lite3_dtc --log_root <logs>
       [--num_envs 64] [--steps 1500] [--difficulty 0.45]
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


def evaluate(args, num_envs=None, steps=None, difficulty=0.45):
    num_envs = num_envs or getattr(args, "num_envs", None) or 64
    steps = steps or 1500
    task_cfg, train_cfg = get_cfgs(args.task)
    task_cfg, train_cfg = update_cfg_from_args(task_cfg, train_cfg, args)
    # stepping-stone selected world at a fixed difficulty
    stone_size = 1.0 * (1.05 - difficulty)
    task_cfg = dataclasses.replace(
        task_cfg,
        env=dataclasses.replace(task_cfg.env, num_envs=num_envs,
                                play_command=False),
        terrain=dataclasses.replace(
            task_cfg.terrain, num_rows=3, num_cols=3, curriculum=False,
            border_size=8.0, selected=True,
            selected_terrain_type="stepping_stones_terrain",
            selected_terrain_kwargs=(
                ("stone_size", stone_size),
                ("stone_distance", 0.06),
                ("max_height", 0.0),
                ("platform_size", 1.0),
                ("depth", -2.0),
            )),
        noise=dataclasses.replace(task_cfg.noise, add_noise=False),
        domain_rand=dataclasses.replace(task_cfg.domain_rand,
                                        push_robots=False,
                                        randomize_friction=False),
    )
    env = LeggedEnv(task_cfg, terrain_seed=train_cfg.runner.seed + 7)
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

    N = env.num_envs
    # base_vel in step outputs carries the obs scaling; un-scale with the
    # task's configured factor (ObsScales.lin_vel), not a literal
    lin_vel_scale = task_cfg.normalization.obs_scales.lin_vel

    T = steps

    @jax.jit
    def rollout(params, state, key):
        def body(c, k):
            state = c
            a = policy(state["obs"], state["obs_history"],
                       state["privileged_obs"])
            state, out = env.step(params, state, a, k)
            err = jnp.linalg.norm(
                state["commands"][:, :2]
                - out["base_vel"][:, :2] / lin_vel_scale,
                axis=1)
            fall = out["done"] & ~out["time_out"]
            return state, (err, fall, out["done"])
        state, (errs, falls, dones) = jax.lax.scan(
            body, state, jax.random.split(key, T))
        return state, errs, falls, dones

    params, state = runner.env_params, runner.env_state
    state, errs, falls, dones = rollout(params, state,
                                        jax.random.PRNGKey(42))
    errs = np.asarray(errs)
    falls = np.asarray(falls)
    dones = np.asarray(dones)
    n_falls = falls.sum()
    n_eps = max(dones.sum(), 1)
    # mean tracking error over all steps (fallen envs reset immediately)
    report = {
        "terrain": f"stepping_stones(difficulty={difficulty}, "
                   f"stone={stone_size:.2f}m)",
        "envs": N, "steps": steps,
        "tracking_err_xy_mean_mps": float(errs.mean()),
        "tracking_err_xy_p90_mps": float(np.quantile(errs, 0.9)),
        "fall_rate_per_episode": float(n_falls / n_eps),
        "falls": int(n_falls), "episodes": int(dones.sum()),
        "mean_episode_length": float(steps * N / max(dones.sum(), 1)),
    }
    for k, v in report.items():
        print(f"{k}: {v}", flush=True)
    return report


if __name__ == "__main__":
    evaluate(get_args())
