"""Spatial (6D) rigid-body algebra in JAX — TPU-first layout.

This is the math core of the physics engine that replaces the reference's
external PhysX dependency (see SURVEY.md §2.9; the reference has no physics
source, only the call surface in legged_robot.py:755-784).

Conventions (Featherstone, "Rigid Body Dynamics Algorithms"):
  - motion vector  m = [omega(3); v(3)]
  - force  vector  f = [n(3); f(3)]          (torque about frame origin first)
  - spatial inertia I is 6x6 about the body-frame origin.

TPU-first layout: ALL arrays put vector/matrix component axes FIRST and the
environment batch axis LAST:  motion (6, N), rotation (3, 3, N), inertia
(6, 6, N).  The trailing N axis maps onto the 128-wide VPU lanes with no
padding waste; a (N, 6) layout would waste ~95% of each (8,128) f32 tile and
force relayouts around every op.  Static per-robot constants stay as plain
numpy and broadcast over the trailing axis.
"""
from __future__ import annotations

import jax.numpy as jnp


def cross3(a, b):
    """Cross product over leading component axis: (3, ...) x (3, ...)."""
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )


def rmul(R, v):
    """(3,3,...) @ (3,...) -> (3,...). R maps coords; batch trails.

    Unrolled multiply-adds: einsum would lower to dot_general, which on TPU
    transposes these tiny leading dims toward the MXU — pure VPU elementwise
    fuses into the surrounding chains instead."""
    return jnp.stack([
        R[0, 0] * v[0] + R[0, 1] * v[1] + R[0, 2] * v[2],
        R[1, 0] * v[0] + R[1, 1] * v[1] + R[1, 2] * v[2],
        R[2, 0] * v[0] + R[2, 1] * v[1] + R[2, 2] * v[2],
    ])


def rtmul(R, v):
    """R^T @ v with trailing batch (unrolled, see rmul)."""
    return jnp.stack([
        R[0, 0] * v[0] + R[1, 0] * v[1] + R[2, 0] * v[2],
        R[0, 1] * v[0] + R[1, 1] * v[1] + R[2, 1] * v[2],
        R[0, 2] * v[0] + R[1, 2] * v[1] + R[2, 2] * v[2],
    ])


def mmul(A, B):
    """(r,k,...) @ (k,c,...) -> (r,c,...) as unrolled multiply-adds."""
    r, k = A.shape[0], A.shape[1]
    c = B.shape[1]
    rows = []
    for i in range(r):
        cols = []
        for j in range(c):
            acc = A[i, 0] * B[0, j]
            for l in range(1, k):
                acc = acc + A[i, l] * B[l, j]
            cols.append(acc)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def dot_leading(a, b):
    """Sum_i a[i]*b[i] over the leading axis (unrolled)."""
    acc = a[0] * b[0]
    for i in range(1, a.shape[0]):
        acc = acc + a[i] * b[i]
    return acc


def outer_leading(a, b):
    """(n,...),(m,...) -> (n,m,...) outer product on leading axes."""
    return jnp.stack([jnp.stack([a[i] * b[j] for j in range(b.shape[0])])
                      for i in range(a.shape[0])])


# ---------------------------------------------------------------------------
# Spatial coordinate transforms.
#
# A child frame c has origin r (expressed in parent coords) and rotation
# E = c_R_p (maps parent coords -> child coords).  The motion transform
# cXp = [[E, 0], [-E r^, E]] maps motion vectors from parent to child coords;
# the force transform is its inverse-transpose.
# ---------------------------------------------------------------------------

def xm_apply(E, r, m):
    """Motion vector: parent coords -> child coords. m: (6, ...)."""
    w, v = m[:3], m[3:]
    wc = rmul(E, w)
    vc = rmul(E, v - cross3(r, w))
    return jnp.concatenate([wc, vc])


def xm_inv_apply(E, r, m):
    """Motion vector: child coords -> parent coords."""
    w, v = m[:3], m[3:]
    wp = rtmul(E, w)
    vp = rtmul(E, v) + cross3(r, wp)
    return jnp.concatenate([wp, vp])


def xf_apply(E, r, f):
    """Force vector: parent coords -> child coords."""
    n, ff = f[:3], f[3:]
    fc = rmul(E, ff)
    nc = rmul(E, n - cross3(r, ff))
    return jnp.concatenate([nc, fc])


def xf_inv_apply(E, r, f):
    """Force vector: child coords -> parent coords."""
    n, ff = f[:3], f[3:]
    fp = rtmul(E, ff)
    np_ = rtmul(E, n) + cross3(r, fp)
    return jnp.concatenate([np_, fp])


def crm(v, m):
    """Motion cross product  v x m  (both (6, ...))."""
    w, vl = v[:3], v[3:]
    mw, mv = m[:3], m[3:]
    return jnp.concatenate([cross3(w, mw), cross3(vl, mw) + cross3(w, mv)])


def crf(v, f):
    """Force cross product  v x* f."""
    w, vl = v[:3], v[3:]
    n, ff = f[:3], f[3:]
    return jnp.concatenate([cross3(w, n) + cross3(vl, ff), cross3(w, ff)])


def motion_xform_matrix(E, r):
    """Build the 6x6 motion transform cXp = [[E,0],[-E r^, E]], trailing batch.

    E: (3,3,...), r: (3,...) -> (6,6,...).
    """
    batch = jnp.broadcast_shapes(E.shape[2:], r.shape[1:])
    Eb = jnp.broadcast_to(E, (3, 3) + batch)
    zero = jnp.zeros((3, 3) + batch, dtype=Eb.dtype)
    rb = jnp.broadcast_to(r, (3,) + batch)
    rx, ry, rz = rb[0], rb[1], rb[2]
    z = jnp.zeros(batch, dtype=Eb.dtype)
    rhat = jnp.stack([
        jnp.stack([z, -rz, ry]),
        jnp.stack([rz, z, -rx]),
        jnp.stack([-ry, rx, z]),
    ])
    nErh = -mmul(Eb, jnp.broadcast_to(rhat, (3, 3) + batch))
    top = jnp.concatenate([Eb, zero], axis=1)
    bot = jnp.concatenate([nErh, Eb], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def inertia_transform_to_parent(E, r, I_c):
    """Articulated inertia: child coords -> parent coords.

    I^p = X^T I^c X with X = cXp = [[E,0],[F,E]], F = -E r^ (Featherstone
    2.66), evaluated block-wise on 3x3 blocks — avoids materializing the
    half-zero 6x6 transform and its double 6x6x6 contraction:
      I^p = [[E^T(AE+BF) + F^T(CE+DF),  E^T B E + F^T D E],
             [E^T(CE+DF),               E^T D E]].
    I_c: (6,6,...) -> (6,6,...).
    """
    A, B = I_c[:3, :3], I_c[:3, 3:]
    C, D = I_c[3:, :3], I_c[3:, 3:]
    batch = jnp.broadcast_shapes(E.shape[2:], r.shape[1:])
    rb = jnp.broadcast_to(r, (3,) + batch)
    rx, ry, rz = rb[0], rb[1], rb[2]
    z = jnp.zeros(batch, dtype=E.dtype)
    rhat = jnp.stack([
        jnp.stack([z, -rz, ry]),
        jnp.stack([rz, z, -rx]),
        jnp.stack([-ry, rx, z]),
    ])
    Eb = jnp.broadcast_to(E, (3, 3) + batch)
    F = -mmul(Eb, rhat)
    Et = jnp.swapaxes(Eb, 0, 1)
    Ft = jnp.swapaxes(F, 0, 1)
    AE_BF = mmul(A, Eb) + mmul(B, F)
    CE_DF = mmul(C, Eb) + mmul(D, F)
    DE = mmul(D, Eb)
    bl = mmul(Et, CE_DF)                      # bottom-left = top-right^T
    top = jnp.concatenate([mmul(Et, AE_BF) + mmul(Ft, CE_DF),
                           jnp.swapaxes(bl, 0, 1)], axis=1)
    bot = jnp.concatenate([bl, mmul(Et, DE)], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def spatial_inertia(mass, com, inertia_com):
    """Spatial inertia (6,6) about the body origin from mass/COM/I_com.

    mass: (...), com: (3, ...), inertia_com: (3,3,...).
    I = [[I_com + m c^ c^T, m c^], [m c^T, m 1]].
    """
    cx, cy, cz = com[0], com[1], com[2]
    z = jnp.zeros_like(cx)
    chat = jnp.stack([
        jnp.stack([z, -cz, cy]),
        jnp.stack([cz, z, -cx]),
        jnp.stack([-cy, cx, z]),
    ])
    m_chat = mass * chat
    top_left = inertia_com + mmul(m_chat, jnp.swapaxes(chat, 0, 1))
    top = jnp.concatenate([top_left, m_chat], axis=1)
    eye = jnp.zeros_like(chat).at[0, 0].set(1.0).at[1, 1].set(1.0).at[2, 2].set(1.0)
    bot = jnp.concatenate([jnp.swapaxes(m_chat, 0, 1), mass * eye], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def imul(I, m):
    """(6,6,...) @ (6,...) -> (6,...) as unrolled multiply-adds."""
    out = []
    for i in range(6):
        acc = I[i, 0] * m[0]
        for j in range(1, 6):
            acc = acc + I[i, j] * m[j]
        out.append(acc)
    return jnp.stack(out)


def solve_spd6(A, b, reg: float = 1e-8):
    """Solve A x = b for symmetric positive-definite 6x6 A, batched on the
    trailing axis, via an unrolled LDL^T factorization.

    A: (6,6,...), b: (6,...) -> x: (6,...).  Replaces jnp.linalg.solve for
    the ABA base solve: the unrolled factorization is ~60 fused VPU ops on
    the lane-aligned trailing batch instead of a batched LU kernel.
    """
    n = 6
    L = [[None] * n for _ in range(n)]
    D = [None] * n
    for j in range(n):
        d = A[j, j] + reg
        for k in range(j):
            d = d - L[j][k] * L[j][k] * D[k]
        D[j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k] * D[k]
            L[i][j] = s * inv_d
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s
    # diagonal + backward substitution L^T x = y / D
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i] / D[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s
    return jnp.stack(x)


def axis_rotation(axis, q):
    """Rodrigues rotation about a fixed unit axis by batched angle q.

    axis: (3,) static; q: (...) -> R (3,3,...) with R @ v rotating v by +q
    about axis (child-axes-in-parent-coords when used as a joint rotation).
    """
    ax = jnp.asarray(axis, dtype=q.dtype)
    c, s = jnp.cos(q), jnp.sin(q)
    x, y, z = ax[0], ax[1], ax[2]
    one = jnp.ones_like(q)
    C = 1.0 - c
    R = jnp.stack([
        jnp.stack([c + x * x * C, x * y * C - z * s, x * z * C + y * s]),
        jnp.stack([y * x * C + z * s, c + y * y * C, y * z * C - x * s]),
        jnp.stack([z * x * C - y * s, z * y * C + x * s, c + z * z * C]),
    ])
    return R * jnp.ones_like(one)
