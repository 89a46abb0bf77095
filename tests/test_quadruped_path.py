"""Numerical parity: leg-batched quadruped FK/ABA vs the generic engine."""
import numpy as np

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.physics import engine, quadruped
from deep_tracking_control_tpu.physics.engine import SimParams
from deep_tracking_control_tpu.robot import quadrupeds

MODEL = quadrupeds.lite3()
SIM = SimParams()


def _rand_state(n=3, seed=0):
    rng = np.random.default_rng(seed)
    quat = rng.normal(size=(4, n))
    quat /= np.linalg.norm(quat, axis=0, keepdims=True)
    return engine.make_state(
        pos=jnp.asarray(rng.normal(size=(3, n)), dtype=jnp.float32),
        quat=jnp.asarray(quat, dtype=jnp.float32),
        lin_vel=jnp.asarray(rng.normal(size=(3, n)), dtype=jnp.float32),
        ang_vel=jnp.asarray(rng.normal(size=(3, n)), dtype=jnp.float32),
        q=jnp.asarray(rng.uniform(-1, 1, size=(12, n)), dtype=jnp.float32),
        qd=jnp.asarray(rng.normal(size=(12, n)), dtype=jnp.float32),
    )


def test_layout_detected():
    layout = quadruped.quad_layout(MODEL)
    assert layout is not None
    assert quadruped.quad_layout(quadrupeds.x30()) is not None
    np.testing.assert_array_equal(layout.body_idx[:, 0], [1, 2, 3])
    np.testing.assert_array_equal(layout.joint_idx[:, 1], [3, 4, 5])


def test_fk_parity():
    state = _rand_state()
    layout = quadruped.quad_layout(MODEL)
    a = engine.fk(MODEL, state)
    b = quadruped.fk(MODEL, layout, state)
    np.testing.assert_allclose(np.asarray(a["R"]), np.asarray(b["R"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a["x"]), np.asarray(b["x"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a["v"]), np.asarray(b["v"]),
                               atol=1e-4)


def test_aba_parity():
    n = 3
    state = _rand_state(n)
    layout = quadruped.quad_layout(MODEL)
    inertias, _ = engine.make_inertias(MODEL, num_envs=n)
    rng = np.random.default_rng(1)
    tau = jnp.asarray(rng.normal(size=(12, n)), dtype=jnp.float32)
    f_ext = jnp.asarray(rng.normal(size=(13, 6, n)), dtype=jnp.float32)

    kin_a = engine.fk(MODEL, state)
    qdd_a, a0_a = engine.aba(MODEL, inertias, kin_a, state["qd"], tau,
                             f_ext, SIM)
    kin_b = quadruped.fk(MODEL, layout, state)
    qdd_b, a0_b = quadruped.aba(MODEL, layout, inertias, kin_b, state["qd"],
                                tau, f_ext, SIM)
    np.testing.assert_allclose(np.asarray(qdd_a), np.asarray(qdd_b),
                               rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(a0_a), np.asarray(a0_b),
                               rtol=2e-3, atol=2e-2)


def test_solve_spd6():
    from deep_tracking_control_tpu.ops.spatial import solve_spd6
    rng = np.random.default_rng(0)
    n = 8
    M = rng.normal(size=(n, 6, 6))
    A = np.einsum("nij,nkj->nik", M, M) + 0.1 * np.eye(6)
    b = rng.normal(size=(n, 6))
    x = np.asarray(solve_spd6(jnp.asarray(A.transpose(1, 2, 0)),
                              jnp.asarray(b.T)))
    want = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(x.T, want, rtol=1e-3, atol=1e-4)
