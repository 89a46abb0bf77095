"""Single-robot evaluation (legged_gym/scripts/play_single.py parity).

One env, fixed forward command, per-step commanded-vs-actual telemetry and
a state log (utils/logger.py) printed at the end.
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from deep_tracking_control_tpu.env.legged_env import LeggedEnv
from deep_tracking_control_tpu.runner.train import OnPolicyRunner
from deep_tracking_control_tpu.runner import checkpoint as ckpt
from deep_tracking_control_tpu.tasks.registry import get_cfgs
from deep_tracking_control_tpu.utils.cli import get_args, update_cfg_from_args
from deep_tracking_control_tpu.utils.logger import Logger


def play_single(args, steps: int = 500):
    task_cfg, train_cfg = get_cfgs(args.task)
    task_cfg, train_cfg = update_cfg_from_args(task_cfg, train_cfg, args)
    task_cfg = dataclasses.replace(
        task_cfg,
        env=dataclasses.replace(task_cfg.env, num_envs=1, play_command=True),
        terrain=dataclasses.replace(task_cfg.terrain, num_rows=1, num_cols=1,
                                    curriculum=False, border_size=8.0),
        noise=dataclasses.replace(task_cfg.noise, add_noise=False),
        domain_rand=dataclasses.replace(task_cfg.domain_rand,
                                        push_robots=False))
    env = LeggedEnv(task_cfg, terrain_seed=train_cfg.runner.seed)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    root = os.path.join(args.log_root, train_cfg.runner.experiment_name)
    path = ckpt.get_load_path(root, train_cfg.runner.load_run,
                              train_cfg.runner.checkpoint)
    runner.load(path, load_optimizer=False)
    policy = runner.get_inference_policy(teacher=True)

    logger = Logger(task_cfg.dt)
    step = jax.jit(env.step)
    params, state = runner.env_params, runner.env_state
    key = jax.random.PRNGKey(7)
    for i in range(steps):
        actions = policy(state["obs"], state["obs_history"],
                         state["privileged_obs"])
        key, k = jax.random.split(key)
        state, out = step(params, state, actions, k)
        cmd = np.asarray(state["commands"][0])
        vel = np.asarray(out["base_vel"][0]) / 2.0
        z = float(state["phys"]["pos"][2, 0])
        logger.log_states(dict(cmd_x=cmd[0], vel_x=vel[0], base_z=z))
        print(f"step {i:5d} cmd_x={cmd[0]:+.2f} vel_x={vel[0]:+.2f} z={z:+.3f}")
    logger.print_rewards()


if __name__ == "__main__":
    play_single(get_args())
