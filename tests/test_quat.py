"""Unit tests for quaternion/rotation ops against scipy ground truth."""
import numpy as np
import pytest

pytestmark = pytest.mark.smoke
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from deep_tracking_control_tpu.ops import quat as qm


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_quats(rng, n=64):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotate_matches_scipy(rng):
    q = random_quats(rng)
    v = rng.normal(size=(64, 3))
    got = np.asarray(qm.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    want = R.from_quat(q).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_rotate_inverse(rng):
    q = random_quats(rng)
    v = rng.normal(size=(64, 3))
    got = np.asarray(qm.quat_rotate_inverse(jnp.asarray(q), jnp.asarray(v)))
    want = R.from_quat(q).apply(v, inverse=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_mul(rng):
    a, b = random_quats(rng), random_quats(rng)
    got = np.asarray(qm.quat_mul(jnp.asarray(a), jnp.asarray(b)))
    want = (R.from_quat(a) * R.from_quat(b)).as_quat()
    # quaternion double cover: compare up to sign
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-5)


def test_quat_to_rotmat(rng):
    q = random_quats(rng)
    got = np.asarray(qm.quat_to_rotmat(jnp.asarray(q)))
    want = R.from_quat(q).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotmat_to_quat_roundtrip(rng):
    q = random_quats(rng)
    m = qm.quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(qm.rotmat_to_quat(m))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-4)


def test_euler_roundtrip(rng):
    roll = rng.uniform(-1.2, 1.2, 32)
    pitch = rng.uniform(-1.2, 1.2, 32)
    yaw = rng.uniform(-3.0, 3.0, 32)
    q = qm.quat_from_euler_xyz(jnp.asarray(roll), jnp.asarray(pitch), jnp.asarray(yaw))
    r2, p2, y2 = qm.get_euler_xyz(q)
    np.testing.assert_allclose(np.asarray(r2), roll, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p2), pitch, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y2), yaw, atol=1e-5)


def test_quat_apply_yaw_pure_yaw(rng):
    # for pure-yaw quats: x axis -> (cos yaw, sin yaw, 0)
    yaw = rng.uniform(-3, 3, 16)
    zeros = jnp.zeros(16)
    q = qm.quat_from_euler_xyz(zeros, zeros, jnp.asarray(yaw))
    v = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), (16, 3))
    got = np.asarray(qm.quat_apply_yaw(q, v))
    np.testing.assert_allclose(got[:, 0], np.cos(yaw), atol=1e-5)
    np.testing.assert_allclose(got[:, 1], np.sin(yaw), atol=1e-5)
    np.testing.assert_allclose(got[:, 2], 0.0, atol=1e-5)


def test_quat_apply_yaw_reference_semantics(rng):
    # parity with legged_gym/utils/math.py:7-12: zero x,y; normalize; apply
    q = random_quats(rng, 16)
    v = rng.normal(size=(16, 3))
    qy = q.copy()
    qy[:, :2] = 0.0
    qy /= np.linalg.norm(qy, axis=-1, keepdims=True)
    want = R.from_quat(qy).apply(v)
    got = np.asarray(qm.quat_apply_yaw(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_wrap_to_pi():
    a = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 2 * np.pi, 7.0])
    got = np.asarray(qm.wrap_to_pi(a))
    assert np.all(got <= np.pi + 1e-6)
    assert np.all(got > -np.pi - 1e-6)
    np.testing.assert_allclose(np.cos(got), np.cos(np.asarray(a)), atol=1e-6)
    np.testing.assert_allclose(np.sin(got), np.sin(np.asarray(a)), atol=1e-6)


def test_quat_integrate_constant_rate():
    # integrating w=(0,0,1) for 1s in 100 steps ~ 1 rad yaw
    q = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    w = jnp.array([[0.0, 0.0, 1.0]])
    for _ in range(100):
        q = qm.quat_integrate(q, w, 0.01)
    _, _, yaw = qm.get_euler_xyz(q)
    np.testing.assert_allclose(np.asarray(yaw), 1.0, atol=1e-3)


def test_yaw_rot2d_matches_quat_apply_yaw():
    """yaw_rot2d's planar rotation == quat_apply_yaw on xy for random quats."""
    rng = np.random.default_rng(3)
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    want = np.asarray(qm.quat_apply_yaw(jnp.asarray(q), jnp.asarray(v)))
    c, s = qm.yaw_rot2d(jnp.asarray(q))
    c, s = np.asarray(c), np.asarray(s)
    got_x = c * v[:, 0] - s * v[:, 1]
    got_y = s * v[:, 0] + c * v[:, 1]
    np.testing.assert_allclose(got_x, want[:, 0], atol=1e-5)
    np.testing.assert_allclose(got_y, want[:, 1], atol=1e-5)
    np.testing.assert_allclose(c * c + s * s, 1.0, atol=1e-5)
