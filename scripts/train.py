"""Training entry point (legged_gym/scripts/train.py parity)."""
import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon TPU plugin overrides JAX_PLATFORMS at interpreter start; this
# flag re-forces the CPU backend after import (same trick as tests/conftest)
if os.environ.get("DTC_FORCE_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")

from deep_tracking_control_tpu.env.legged_env import LeggedEnv
from deep_tracking_control_tpu.runner.train import OnPolicyRunner
from deep_tracking_control_tpu.runner import checkpoint as ckpt
from deep_tracking_control_tpu.tasks.registry import get_cfgs
from deep_tracking_control_tpu.utils.cli import get_args, update_cfg_from_args


def train(args):
    task_cfg, train_cfg = get_cfgs(args.task)
    task_cfg, train_cfg = update_cfg_from_args(task_cfg, train_cfg, args)

    run_name = datetime.now().strftime("%b%d_%H-%M-%S") + "_" \
        + train_cfg.runner.run_name
    log_dir = os.path.join(args.log_root, train_cfg.runner.experiment_name,
                           run_name)
    os.makedirs(log_dir, exist_ok=True)

    # reward-scale snapshot (train.py:15-28 parity)
    with open(os.path.join(log_dir, "reward_scale.ini"), "w") as f:
        import dataclasses as dc
        for fld in dc.fields(task_cfg.rewards.scales):
            f.write(f"{fld.name} = {getattr(task_cfg.rewards.scales, fld.name)}\n")

    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter
        writer = SummaryWriter(log_dir=log_dir, flush_secs=10)
    except Exception:
        pass

    env = LeggedEnv(task_cfg, terrain_seed=train_cfg.runner.seed)
    runner = OnPolicyRunner(env, train_cfg, log_dir=log_dir, writer=writer)
    if train_cfg.runner.resume:
        root = os.path.join(args.log_root, train_cfg.runner.experiment_name)
        path = ckpt.get_load_path(root, train_cfg.runner.load_run,
                                  train_cfg.runner.checkpoint)
        print(f"Loading checkpoint {path}")
        runner.load(path)
    # init_at_random_ep_len=True matches the reference training entry
    # (on_policy_runner.py:105-109 via train.py)
    runner.learn(train_cfg.runner.max_iterations, init_at_random_ep_len=True)


if __name__ == "__main__":
    train(get_args())
