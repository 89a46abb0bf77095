"""Quaternion / rotation ops (JAX, TPU-first).

Pure functions over arrays with a trailing quaternion axis in **xyzw** order
(matches the Isaac Gym root-state layout the reference consumes:
/root/reference/legged_gym/envs/base/legged_robot.py:140-147, root quats are
``root_states[:, 3:7]`` in xyzw).

Semantics mirrored from the reference call surface:
  - quat_rotate / quat_rotate_inverse (isaacgym.torch_utils, used at
    legged_robot.py:141-147)
  - quat_apply_yaw (legged_gym/utils/math.py:7-12)
  - wrap_to_pi (legged_gym/utils/math.py:14-18)
  - get_euler_xyz (legged_gym/utils/isaacgym_utils.py:13-33)
  - quat_from_euler_xyz (isaacgym.torch_utils, used at legged_robot.py:1571)

Everything broadcasts over leading batch axes and is jit/vmap safe.
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize(v: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Normalize along the last axis."""
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b for xyzw quaternions."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q (body->world if q is body pose)."""
    qvec = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qvec, v)
    return v + qw * t + jnp.cross(qvec, t)


def quat_rotate_inverse(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the inverse of q (world->body if q is body pose)."""
    qvec = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qvec, v)
    return v - qw * t + jnp.cross(qvec, t)


def quat_apply_yaw(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by only the yaw component of q.

    Mirrors legged_gym/utils/math.py:7-12 (zero the x,y components, renormalize,
    then apply).
    """
    q_yaw = jnp.concatenate([jnp.zeros_like(q[..., :2]), q[..., 2:4]], axis=-1)
    return quat_rotate(normalize(q_yaw), v)


def yaw_rot2d(q: jnp.ndarray, eps: float = 1e-18):
    """(cos, sin) of the yaw angle of q (xyzw).

    The planar form of quat_apply_yaw: rotating (px, py) by yaw is
    (c*px - s*py, s*px + c*py).  Used where the (..., 3) vector layout
    would waste TPU lanes (e.g. the 693-point scan grids: component-plane
    (N, H) math instead of (N, H, 3)).

    With q_yaw = normalize([0, 0, z, w]): cos = (w^2 - z^2) / (w^2 + z^2),
    sin = 2 w z / (w^2 + z^2) (half-angle identities)."""
    z, w = q[..., 2], q[..., 3]
    inv = 1.0 / (w * w + z * z + eps)
    return (w * w - z * z) * inv, 2.0 * w * z * inv


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """xyzw quaternion -> 3x3 rotation matrix (body->world)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> xyzw quaternion (branch-free Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate solutions, pick numerically-best by largest pivot
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2.0
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2.0
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2.0
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2.0
    cand_w = jnp.stack([
        jnp.sign(m21 - m12) * qx,
        jnp.sign(m02 - m20) * qy,
        jnp.sign(m10 - m01) * qz,
        qw,
    ], axis=-1)
    cand_x = jnp.stack([
        qx,
        jnp.sign(m10 + m01) * qy,
        jnp.sign(m02 + m20) * qz,
        jnp.sign(m21 - m12) * qw,
    ], axis=-1)
    cand_y = jnp.stack([
        jnp.sign(m01 + m10) * qx,
        qy,
        jnp.sign(m21 + m12) * qz,
        jnp.sign(m02 - m20) * qw,
    ], axis=-1)
    cand_z = jnp.stack([
        jnp.sign(m20 + m02) * qx,
        jnp.sign(m12 + m21) * qy,
        qz,
        jnp.sign(m10 - m01) * qw,
    ], axis=-1)
    pivots = jnp.stack([qx, qy, qz, qw], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    idx = best[..., None, None]
    cands = jnp.stack([cand_x, cand_y, cand_z, cand_w], axis=-2)
    q = jnp.take_along_axis(cands, jnp.broadcast_to(idx, cands.shape[:-2] + (1, 4)), axis=-2)[..., 0, :]
    return normalize(q)


def axis_angle_to_quat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis + angle -> xyzw quaternion."""
    half = angle * 0.5
    s = jnp.sin(half)
    return jnp.concatenate(
        [axis * s[..., None], jnp.cos(half)[..., None]], axis=-1
    )


def quat_from_euler_xyz(roll: jnp.ndarray, pitch: jnp.ndarray, yaw: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic xyz Euler angles -> xyzw quaternion (isaacgym.torch_utils parity)."""
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def get_euler_xyz(q: jnp.ndarray):
    """xyzw quaternion -> (roll, pitch, yaw).

    Parity with legged_gym/utils/isaacgym_utils.py:13-33.
    """
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = qw * qw - qx * qx - qy * qy + qz * qz
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    sinp = jnp.clip(2.0 * (qw * qy - qz * qx), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = qw * qw + qx * qx - qy * qy - qz * qz
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return roll, pitch, yaw


def yaw_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Extract the yaw-only quaternion of q."""
    return normalize(
        jnp.concatenate([jnp.zeros_like(q[..., :2]), q[..., 2:4]], axis=-1)
    )


def wrap_to_pi(angles: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to (-pi, pi]. Parity with legged_gym/utils/math.py:14-18."""
    a = jnp.mod(angles, 2.0 * jnp.pi)
    return a - 2.0 * jnp.pi * (a > jnp.pi)


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate orientation with world-frame angular velocity (exponential map)."""
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    axis = omega_world / jnp.maximum(angle, 1e-9)
    dq = axis_angle_to_quat(axis, (angle * dt)[..., 0])
    return normalize(quat_mul(dq, q))


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector -> 3x3 skew-symmetric (cross product) matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))
