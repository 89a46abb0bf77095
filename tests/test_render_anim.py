"""Headless gait animation writes a multi-frame GIF (viewer replacement)."""
import numpy as np

from deep_tracking_control_tpu.utils.render_anim import render_gait_animation


def test_render_gait_animation(tmp_path):
    rng = np.random.default_rng(0)
    hf = rng.normal(scale=0.05, size=(80, 80)).astype(np.float32)
    frames = []
    for i in range(6):
        base = np.array([0.5 + 0.1 * i, 0.5 + 0.02 * i, 0.35])
        frames.append(dict(
            base_pos=base,
            foot_positions=base + rng.normal(scale=0.2, size=(4, 3)),
            pred_footholds=base + rng.normal(scale=0.3, size=(4, 3)),
            optimal_footholds=base + rng.normal(scale=0.3, size=(4, 3)),
            commands=np.array([0.5, 0.0, 0.0]),
            base_vel=np.array([0.45, 0.01, 0.0]),
        ))
    out = str(tmp_path / "gait.gif")
    path = render_gait_animation(out, hf, 0.05, 1.0, frames, fps=10)
    from PIL import Image
    im = Image.open(path)
    assert im.format == "GIF"
    im.seek(5)          # frame 6 exists
    assert im.size[0] > 100
