"""3D viewer: FK parity with the physics engine and a GIF smoke test."""
import numpy as np

from deep_tracking_control_tpu.robot import quadrupeds
from deep_tracking_control_tpu.utils.viewer3d import (
    fk_positions, foot_positions_from_fk, render_3d_animation)


def _random_pose(rng, model):
    pos = np.array([1.0, 2.0, 0.4]) + rng.normal(scale=0.1, size=3)
    q4 = rng.normal(size=4)
    q4 /= np.linalg.norm(q4)
    q = rng.uniform(model.pos_limit[:, 0], model.pos_limit[:, 1])
    return pos, q4, q


def test_fk_matches_engine():
    """viewer3d's numpy FK == physics/engine.py fk() body origins."""
    import jax.numpy as jnp
    from deep_tracking_control_tpu.physics import engine

    model = quadrupeds.lite3()
    rng = np.random.default_rng(3)
    for _ in range(3):
        pos, q4, q = _random_pose(rng, model)
        x_np, R_np = fk_positions(model, pos, q4, q)
        state = engine.make_state(
            jnp.asarray(pos, jnp.float32)[:, None],
            jnp.asarray(q4, jnp.float32)[:, None],
            jnp.zeros((3, 1)), jnp.zeros((3, 1)),
            jnp.asarray(q, jnp.float32)[:, None], jnp.zeros((model.nq, 1)))
        kin = engine.fk(model, state)
        x_jax = np.asarray(kin["x"])[:, :, 0]
        R_jax = np.asarray(kin["R"])[:, :, :, 0]
        np.testing.assert_allclose(x_np, x_jax, atol=2e-5)
        np.testing.assert_allclose(R_np, R_jax, atol=2e-5)


def test_feet_from_fk_match_engine_points():
    """Welded-foot world positions agree with engine.body_point_state."""
    import jax.numpy as jnp
    from deep_tracking_control_tpu.physics import engine

    model = quadrupeds.x30()
    rng = np.random.default_rng(5)
    pos, q4, q = _random_pose(rng, model)
    x_np, R_np = fk_positions(model, pos, q4, q)
    feet_np = foot_positions_from_fk(model, x_np, R_np)

    state = engine.make_state(
        jnp.asarray(pos, jnp.float32)[:, None],
        jnp.asarray(q4, jnp.float32)[:, None],
        jnp.zeros((3, 1)), jnp.zeros((3, 1)),
        jnp.asarray(q, jnp.float32)[:, None], jnp.zeros((model.nq, 1)))
    kin = engine.fk(model, state)
    fpos, _ = engine.body_point_state(kin, model.foot_dyn_index,
                                      model.foot_offset)
    np.testing.assert_allclose(feet_np, np.asarray(fpos)[:, :, 0], atol=2e-5)


def test_render_3d_animation(tmp_path):
    model = quadrupeds.lite3()
    rng = np.random.default_rng(0)
    hf = rng.normal(scale=0.04, size=(80, 80)).astype(np.float32)
    frames = []
    for i in range(6):
        base = np.array([0.6 + 0.08 * i, 0.6, 0.35])
        frames.append(dict(
            base_pos=base,
            base_quat=np.array([0.0, 0.0, 0.0, 1.0]),
            q=np.tile([0.0, -1.0, 1.8], 4),
            pred_footholds=base + rng.normal(scale=0.25, size=(4, 3)),
            optimal_footholds=base + rng.normal(scale=0.25, size=(4, 3)),
            commands=np.array([0.5, 0.0, 0.0]),
        ))
    out = str(tmp_path / "gait3d.gif")
    path = render_3d_animation(out, hf, 0.05, 1.0, model, frames,
                               fps=10, stride=1)
    from PIL import Image
    im = Image.open(path)
    assert im.format == "GIF"
    im.seek(5)
    assert im.size[0] > 100
