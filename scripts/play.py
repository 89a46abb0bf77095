"""Policy evaluation (legged_gym/scripts/play.py parity, headless).

Loads the latest checkpoint, overrides the config for evaluation (few envs,
no noise / no pushes / no curriculum, play commands — play.py:18-36), rolls
the deterministic teacher policy, and prints commanded-vs-actual velocity
and height every step (play_single.py:52-62 behavior).
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


def play(args, steps: int = 1000):
    task_cfg, train_cfg = get_cfgs(args.task)
    task_cfg, train_cfg = update_cfg_from_args(task_cfg, train_cfg, args)
    # eval overrides (play.py:17-36): <=100 envs, 3x3 grid, curriculum /
    # noise / pushes / friction-rand off, random eval commands
    # (play_commond=False), and the stepping-stone-heavy terrain mix
    # [0,0,0,0,0,.2,0,0,.8] (20% stepping stones + 80% stones everywhere)
    task_cfg = dataclasses.replace(
        task_cfg,
        env=dataclasses.replace(task_cfg.env,
                                num_envs=min(task_cfg.env.num_envs, 100),
                                play_command=False,
                                # debug_viz forced on in eval
                                # (play.py:41 env.debug_viz = True)
                                debug_viz=True),
        terrain=dataclasses.replace(
            task_cfg.terrain, num_rows=3, num_cols=3,
            curriculum=False, border_size=8.0,
            terrain_proportions=(0.0, 0.0, 0.0, 0.0, 0.0, 0.2, 0.0, 0.0)),
        noise=dataclasses.replace(task_cfg.noise, add_noise=False),
        domain_rand=dataclasses.replace(task_cfg.domain_rand,
                                        push_robots=False,
                                        randomize_friction=False),
    )
    env = LeggedEnv(task_cfg, terrain_seed=train_cfg.runner.seed)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    root = os.path.join(args.log_root, train_cfg.runner.experiment_name)
    path = ckpt.get_load_path(root, train_cfg.runner.load_run,
                              train_cfg.runner.checkpoint)
    print(f"Loading policy from {path}")
    runner.load(path, load_optimizer=False)
    policy = runner.get_inference_policy(teacher=True)

    step = jax.jit(env.step)
    params, state = runner.env_params, runner.env_state
    key = jax.random.PRNGKey(123)
    render = getattr(args, "render", False)
    rec = []
    for i in range(steps):
        actions = policy(state["obs"], state["obs_history"],
                         state["privileged_obs"])
        key, k = jax.random.split(key)
        state, out = step(params, state, actions, k)
        if render and "debug" in out and i < args.render_steps:
            d = out["debug"]
            rec.append(dict(
                base_pos=np.asarray(state["phys"]["pos"][:, 0]),
                base_quat=np.asarray(state["phys"]["quat"][:, 0]),
                q=np.asarray(state["phys"]["q"][:, 0]),
                foot_positions=np.asarray(d["foot_positions"][0]),
                pred_footholds=np.asarray(d["pred_footholds"][0]),
                optimal_footholds=np.asarray(
                    state["optimal_footholds_world"][0]),
                commands=np.asarray(state["commands"][0]),
                base_vel=np.asarray(out["base_vel"][0])
                / task_cfg.normalization.obs_scales.lin_vel,
            ))
        if i % 10 == 0:
            cmd = np.asarray(state["commands"][0])
            vel = (np.asarray(out["base_vel"][0])
                   / task_cfg.normalization.obs_scales.lin_vel)
            z = float(state["phys"]["pos"][2, 0])
            print(f"step {i:5d} cmd=({cmd[0]:+.2f},{cmd[1]:+.2f}) "
                  f"vel=({vel[0]:+.2f},{vel[1]:+.2f}) z={z:+.3f}")
            if "debug" in out and i % 100 == 0:
                from deep_tracking_control_tpu.utils.debug_viz import (
                    draw_foothold_debug)
                d = out["debug"]
                draw_foothold_debug(
                    f"/tmp/dtc_debug_{i:05d}.png",
                    np.asarray(env.grid.height), env.grid.horizontal_scale,
                    env.grid.border_size,
                    np.asarray(state["phys"]["pos"][:, 0]),
                    np.asarray(d["heights_world"][0]),
                    np.asarray(d["foothold_score"][0]),
                    np.asarray(d["pred_footholds"][0]),
                    np.asarray(state["optimal_footholds_world"][0]),
                    np.asarray(d["foot_positions"][0]))
    if rec:
        if getattr(args, "render3d", False):
            from deep_tracking_control_tpu.utils.viewer3d import (
                render_3d_animation)
            out_path = render_3d_animation(
                args.render_path, np.asarray(env.grid.height),
                env.grid.horizontal_scale, env.grid.border_size,
                env.model, rec, title=f"{args.task} 3D gait")
        else:
            from deep_tracking_control_tpu.utils.render_anim import (
                render_gait_animation)
            out_path = render_gait_animation(
                args.render_path, np.asarray(env.grid.height),
                env.grid.horizontal_scale, env.grid.border_size, rec,
                stride=2, title=f"{args.task} gait")
        print(f"Wrote animation to {out_path} ({len(rec)} frames)")


if __name__ == "__main__":
    play(get_args())
