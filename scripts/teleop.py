"""Interactive keyboard teleop (the reference viewer's control surface,
headless).

Drives a trained policy live from the terminal with the reference's key
bindings (base_task.py:63-95,130-190): W/S vx, A/D vy, Q/E turn, R reset,
P/N or 0-8 switch the looked-at env, ESC/x quit.  Renders a curses panel:
telemetry + a top-down ASCII heightfield with base/feet/foothold markers
(the headless analog of _draw_debug_vis, legged_robot_dtc.py:460-520).

Usage:
  python scripts/teleop.py --task lite3_dtc --log_root logs [--num_envs 4]
  python scripts/teleop.py --task lite3_dtc --zero_policy   # no checkpoint

On the live TPU each step is ~100 ms of RPC, i.e. ~10 Hz interactive rate.
"""
import curses
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deep_tracking_control_tpu.env.legged_env import LeggedEnv
from deep_tracking_control_tpu.runner.train import OnPolicyRunner
from deep_tracking_control_tpu.runner import checkpoint as ckpt
from deep_tracking_control_tpu.tasks.registry import get_cfgs
from deep_tracking_control_tpu.utils.cli import get_args, update_cfg_from_args
from deep_tracking_control_tpu.utils.teleop import TeleopSession


def build(args):
    task_cfg, train_cfg = get_cfgs(args.task)
    task_cfg, train_cfg = update_cfg_from_args(task_cfg, train_cfg, args)
    n = getattr(args, "num_envs", None) or 4
    # eval overrides as in play.py, plus: commands never resample
    # mid-episode (the keyboard owns them) and debug_viz on for the
    # foothold markers.
    task_cfg = dataclasses.replace(
        task_cfg,
        env=dataclasses.replace(task_cfg.env, num_envs=min(n, 9),
                                play_command=False, debug_viz=True),
        commands=dataclasses.replace(task_cfg.commands,
                                     resampling_time=1e6),
        terrain=dataclasses.replace(
            task_cfg.terrain, num_rows=3, num_cols=3,
            curriculum=False, border_size=8.0),
        noise=dataclasses.replace(task_cfg.noise, add_noise=False),
        domain_rand=dataclasses.replace(task_cfg.domain_rand,
                                        push_robots=False,
                                        randomize_friction=False),
    )
    env = LeggedEnv(task_cfg, terrain_seed=train_cfg.runner.seed)
    runner = OnPolicyRunner(env, train_cfg, log_dir=None)
    if getattr(args, "zero_policy", False):
        def policy(obs, obs_history, privileged_obs):
            return jnp.zeros((env.num_envs, env.num_actions))
    else:
        root = os.path.join(args.log_root, train_cfg.runner.experiment_name)
        path = ckpt.get_load_path(root, train_cfg.runner.load_run,
                                  train_cfg.runner.checkpoint)
        print(f"Loading policy from {path}")
        runner.load(path, load_optimizer=False)
        raw = runner.get_inference_policy(teacher=True)
        if runner.ppo.policy_kind == "recurrent":
            # carry-threading signature (obs, (ca, cc)) -> adapt to the
            # session's (obs, obs_history, privileged_obs) interface
            carry = {"c": (runner.init_carry(env.num_envs),
                           runner.init_carry(env.num_envs))}
            def policy(obs, obs_history, privileged_obs):
                acts, carry["c"] = raw(obs, carry["c"])
                return acts
        else:
            policy = raw
    params, state = runner.env_params, runner.env_state
    return TeleopSession(env, params, state, policy, jax.random.PRNGKey(1),
                         lin_vel_scale=task_cfg.normalization.obs_scales
                         .lin_vel)


HELP = "W/S vx  A/D vy  Q/E turn  R reset  P/N/0-8 env  ESC quit"


def ui(stdscr, sess):
    curses.curs_set(0)
    stdscr.nodelay(True)
    hz, t_last = 0.0, time.time()
    while True:
        ch = stdscr.getch()
        while ch != -1:                      # drain the key queue
            if not sess.handle_key(ch):
                return
            ch = stdscr.getch()
        tel = sess.step()
        now = time.time()
        hz = 0.9 * hz + 0.1 / max(now - t_last, 1e-6)
        t_last = now

        stdscr.erase()
        c = tel["cmd"]
        stdscr.addstr(0, 0, f"env {tel['lookat']}  {hz:5.1f} Hz   {HELP}")
        stdscr.addstr(
            1, 0,
            f"cmd vx={c[0]:+.2f} vy={c[1]:+.2f} yaw={c[2]:+.2f} "
            f"hdg={c[3]:+.2f} | vel=({tel['vel'][0]:+.2f},"
            f"{tel['vel'][1]:+.2f}) m/s  z={tel['z']:+.3f} m")
        feet = "".join("#" if b else "." for b in tel["contacts"])
        stdscr.addstr(2, 0, f"feet[{feet}]  rew={tel['rew']:+.3f}  "
                            f"len={tel['ep_len']:4d}"
                            f"{'  RESET' if tel['done'] else ''}")
        maxy, maxx = stdscr.getmaxyx()
        rows = max(min(maxy - 5, 31), 5)
        cols = max(min(maxx - 2, 71), 11)
        for r, line in enumerate(sess.ascii_map(rows, cols)):
            if 4 + r >= maxy - 1:
                break
            stdscr.addstr(4 + r, 0, line[:maxx - 1])
        stdscr.refresh()


def main():
    args = get_args(extra=[
        (["--zero_policy"], dict(action="store_true",
                                 help="drive with zero actions (no ckpt)")),
    ])
    sess = build(args)
    sess.step()  # compile before entering the UI (first step is slow)
    curses.wrapper(ui, sess)
    print("teleop ended")


if __name__ == "__main__":
    main()
