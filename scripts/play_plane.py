"""Flat-plane evaluation (legged_gym/scripts/play_plane.py parity):
like play_single but forces mesh_type='plane'."""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep_tracking_control_tpu.tasks.registry import get_cfgs  # noqa: E402
from deep_tracking_control_tpu.utils.cli import get_args  # noqa: E402
import play_single  # noqa: E402


def play_plane(args, steps: int = 500):
    task_cfg, _ = get_cfgs(args.task)

    orig_get_cfgs = play_single.get_cfgs

    def patched(name):
        t, tr = orig_get_cfgs(name)
        t = dataclasses.replace(
            t, terrain=dataclasses.replace(t.terrain, mesh_type="plane",
                                           curriculum=False))
        return t, tr

    play_single.get_cfgs = patched
    try:
        play_single.play_single(args, steps=steps)
    finally:
        play_single.get_cfgs = orig_get_cfgs


if __name__ == "__main__":
    play_plane(get_args())
