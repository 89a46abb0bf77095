"""LeggedEnv — the vectorized quadruped environment as pure functions.

Capability parity with LeggedRobot / LeggedRobotDTC (legged_robot.py:55-1622,
legged_robot_dtc.py:29-586) redesigned TPU-first: one EnvState pytree,
`step(params, state, actions, key)` fully jit-able, masked functional resets
(`jnp.where` instead of reset_idx index writes), the physics engine inside a
decimation loop, and the DTC planner fused into the step.

Layout note: the physics core uses env-trailing arrays (see ops/spatial.py);
everything obs/reward-facing here is env-leading (N, D) as the networks
consume it.  The transposes at the boundary are fused away by XLA.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quat as qm
from ..utils.flags import kernel_flag
from ..physics import engine, pallas_substep as psub, quadruped, sim as psim
from ..robot import quadrupeds
from ..robot.model import RobotModel, load_urdf
from ..terrain import grid as tgrid
from ..terrain import patch as tpatch
from ..terrain.generator import DESCENT_FAMILIES, Terrain, column_families
from . import pallas_planner as pplanner, planner, rewards as rew_mod
from .config import TaskCfg


def _uniform(key, shape, lo, hi):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


class LeggedEnv:
    """Static env object: holds the robot model, terrain, and constants.

    All step/reset logic is in pure methods over (params, state) pytrees.
    """

    def __init__(self, cfg: TaskCfg, terrain_seed: int = 0):
        self.cfg = cfg
        if cfg.asset.robot.endswith(".urdf"):
            self.model: RobotModel = load_urdf(cfg.asset.robot)
        else:
            self.model = quadrupeds.get_robot(cfg.asset.robot)
        self.geom = psim.default_contact_geometry(self.model)
        m = self.model

        # --- terrain -------------------------------------------------------
        if cfg.terrain.mesh_type in ("heightfield", "trimesh"):
            self.terrain = Terrain(cfg.terrain, seed=terrain_seed)
            self.grid = tgrid.TerrainGrid(
                height=jnp.asarray(self.terrain.heights_meters()),
                horizontal_scale=cfg.terrain.horizontal_scale,
                border_size=cfg.terrain.border_size,
                is_plane=False)
            self.terrain_origins = jnp.asarray(
                self.terrain.env_origins, dtype=jnp.float32)  # (rows,cols,3)
            self.custom_origins = True
        else:
            self.terrain = None
            self.grid = tgrid.flat_grid(
                size_m=2 * cfg.terrain.border_size,
                horizontal_scale=cfg.terrain.horizontal_scale)
            self.terrain_origins = None
            self.custom_origins = False
        # pooled min3/max10 tables re-blocked into the patch source
        # (terrain/patch.py): [0]=raw, [1]=min3, [2]=max10
        if not self.grid.is_plane:
            _min3, _max10 = tpatch.pooled_tables(self.grid)
            self.patch_src = tpatch.make_source(
                self.grid, jnp.stack([self.grid.height, _min3, _max10]))
        else:
            self.patch_src = None

        # --- joint constants (legged_robot.py:872-888, 495-508) -------------
        jn = m.joint_names
        self.default_dof_pos = np.zeros(m.nq, dtype=np.float32)
        dja = dict(cfg.init_state.default_joint_angles)
        p_gains = np.zeros(m.nq, dtype=np.float32)
        d_gains = np.zeros(m.nq, dtype=np.float32)
        for i, name in enumerate(jn):
            self.default_dof_pos[i] = dja.get(name, 0.0)
            for key, val in cfg.control.stiffness:
                if key in name:
                    p_gains[i] = val
            for key, val in cfg.control.damping:
                if key in name:
                    d_gains[i] = val
        self.p_gains, self.d_gains = p_gains, d_gains
        self.torque_limits = (0.8 * m.effort_limit).astype(np.float32)  # :503
        self.dof_vel_limits = m.vel_limit.astype(np.float32)
        lo, hi = m.pos_limit[:, 0], m.pos_limit[:, 1]
        mid, rng = (lo + hi) / 2, hi - lo
        s = cfg.rewards.soft_dof_pos_limit
        self.soft_dof_pos_limits = (
            (mid - 0.5 * rng * s).astype(np.float32),
            (mid + 0.5 * rng * s).astype(np.float32))               # :504-508
        self.dof_pos_limits = (lo.astype(np.float32), hi.astype(np.float32))

        # --- body index sets (legged_robot_dtc.py:362-457) ------------------
        self.feet_idx = np.array(
            [i for i, n in enumerate(m.body_names) if cfg.asset.foot_name in n],
            dtype=np.int32)
        self.penalised_idx = np.array(sorted(
            {i for kw in cfg.asset.penalize_contacts_on for i in m.match_bodies(kw)}),
            dtype=np.int32)
        self.termination_idx = np.array(sorted(
            {i for kw in cfg.asset.terminate_after_contacts_on
             for i in m.match_bodies(kw)}), dtype=np.int32)
        self.collision_idx = np.array(sorted(
            {i for kw in cfg.asset.collision_state for i in m.match_bodies(kw)}),
            dtype=np.int32)
        # thigh bodies give the planner's "hip" positions (dtc.py:100,367)
        self.thigh_dyn_idx = np.array(
            [m.body_dyn_index[i] for i, n in enumerate(m.body_names)
             if cfg.asset.thigh_name in n], dtype=np.int32)
        # hip DOF indices by joint name (dtc.py:365-372)
        self.hip_dof_idx = np.array(
            [i for i, n in enumerate(jn) if "HipX" in n], dtype=np.int32)

        # --- height scan constants (legged_robot.py:1263-1277) --------------
        gx, gy = np.meshgrid(np.asarray(cfg.terrain.measured_points_x),
                             np.asarray(cfg.terrain.measured_points_y),
                             indexing="ij")
        self.num_height_points = gx.size
        self.height_points = np.stack(
            [gx.flatten(), gy.flatten(), np.zeros_like(gx.flatten())],
            axis=1).astype(np.float32)                              # (H,3)
        A = self.height_points.copy()
        A[:, 2] = 1.0
        self.plane_pinv = (np.linalg.inv(A.T @ A) @ A.T).astype(np.float32)

        # pos_acc corner points (legged_robot.py:1600-1611, live /2 variant)
        corners = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                            for sz in (-1, 1)], dtype=np.float32)
        self.acc_points = corners * np.array([0.3, 0.2, 0.15],
                                             dtype=np.float32) / 2.0

        self.commands_scale = np.array(
            [cfg.normalization.obs_scales.lin_vel,
             cfg.normalization.obs_scales.lin_vel,
             cfg.normalization.obs_scales.ang_vel], dtype=np.float32)
        # descent-command clamp (CommandsCfg.descent_clamp): per-column
        # descent-family mask under the curriculum layout; None = disabled
        self._descent_cols = None
        if (cfg.commands.descent_clamp > 0.0 and self.terrain is not None
                and cfg.terrain.curriculum and not cfg.terrain.selected):
            fams = column_families(cfg.terrain)
            self._descent_cols = np.array(
                [f in DESCENT_FAMILIES for f in fams], dtype=bool)
        self.noise_scale_vec = self._make_noise_scale_vec()

        # reward bookkeeping (legged_robot.py:929-948): dt-scaled nonzero terms
        sc = cfg.rewards.scales
        self.reward_names = rew_mod.active_reward_names(sc)
        self.reward_scales_dt = {n: getattr(sc, n) * cfg.dt
                                 for n in self.reward_names}
        self.termination_scale_dt = sc.termination * cfg.dt
        self.episode_sum_names = list(self.reward_names)
        if sc.termination != 0.0:
            self.episode_sum_names.append("termination")

        self.num_obs = cfg.env.num_observations
        self.num_privileged_obs = cfg.env.num_privileged_obs
        self.num_actions = cfg.env.num_actions
        self.num_envs = cfg.env.num_envs
        self.num_obs_history = cfg.env.num_observation_history * self.num_obs
        self.max_episode_length = cfg.max_episode_length
        # 45- vs 53-dim obs layout: the DTC layout appends the 8-dim
        # foothold block (dtc.py:269, foothold_obs); the non-DTC tasks use
        # 45 (lite3_rough_config.py:8) without it.  (The reference's
        # committed 45-dim path is actually broken — base
        # compute_observations reads the subclass-only self.foothold_obs,
        # legged_robot.py:353 — here 45 simply omits the block.)
        base_w = 9 + 2 * self.model.nq + self.num_actions
        if self.num_obs == base_w + 8:
            self._obs_has_foothold = True
        elif self.num_obs == base_w:
            self._obs_has_foothold = False
        else:
            raise ValueError(
                f"num_observations={self.num_obs} matches neither the "
                f"{base_w}-dim base layout nor the {base_w + 8}-dim DTC "
                f"layout")

        # fused Pallas decimation kernel (physics/pallas_substep.py): used on
        # TPU for quadruped models on heightfield terrain; the XLA path stays
        # the reference implementation (CPU tests, exotic models, planes).
        # DTC_PALLAS_PHYSICS=0 disables it for A/B runs.
        self._pallas_physics = (
            kernel_flag("DTC_PALLAS_PHYSICS", "1")
            and self.patch_src is not None
            and quadruped.quad_layout(self.model) is not None
            and cfg.sim.substeps == 1)
        # big per-step noise draws from the TPU HW PRNG (experimental/pallas_rng.py)
        # instead of XLA threefry.  Opt-in (DTC_PALLAS_RNG=1) until the
        # on-device A/B flips the default; noise STREAM differs from the
        # XLA path (documented there + PARITY.md).
        self._pallas_rng = kernel_flag("DTC_PALLAS_RNG", "0")
        # fused obs-assembly kernel (experimental/pallas_obs.py), opt-in; subsumes
        # the HW-RNG draws at the obs site when enabled
        self._pallas_obs = kernel_flag("DTC_PALLAS_OBS", "0")
        self._pallas_interpret = False     # tests flip this to run on CPU

    # ------------------------------------------------------------------
    def _make_noise_scale_vec(self) -> np.ndarray:
        """Obs-noise scale vector (parity: legged_robot.py:729-752)."""
        cfg = self.cfg
        ns = cfg.noise.noise_scales
        lvl = cfg.noise.noise_level
        os_ = cfg.normalization.obs_scales
        nq = self.model.nq
        v = np.zeros(cfg.env.num_observations, dtype=np.float32)
        v[0:3] = ns.ang_vel * lvl * os_.ang_vel
        v[3:6] = ns.gravity * lvl
        v[6:9] = 0.0
        v[9:9 + nq] = ns.dof_pos * lvl * os_.dof_pos
        v[9 + nq:9 + 2 * nq] = ns.dof_vel * lvl * os_.dof_vel
        # remaining (actions + foothold obs) noise-free (:749)
        return v

    def _terrain_fn(self):
        grid = self.grid
        return lambda x, y: tgrid.height_and_slope(grid, x, y)

    # ------------------------------------------------------------------
    # construction of params + initial state
    # ------------------------------------------------------------------
    def init(self, key):
        """Create (params, state): per-env DR draws + zero state + full reset.

        Mirrors _create_envs per-env randomization (legged_robot.py:416-527)
        and _init_buffers (:755-905).
        """
        cfg = self.cfg
        N = self.num_envs
        m = self.model
        kf, kr, kp_, kc, kl, klev, korig, krst = jax.random.split(key, 8)

        dr = cfg.domain_rand
        # friction/restitution buckets (legged_robot.py:429-460): 320 buckets
        nb_buckets = 64 * 5
        fb = _uniform(kf, (nb_buckets,), *dr.friction_range)
        rb = _uniform(kr, (nb_buckets,), *dr.restitution_range)
        fid = jax.random.randint(jax.random.fold_in(kf, 1), (N,), 0, nb_buckets)
        rid = jax.random.randint(jax.random.fold_in(kr, 1), (N,), 0, nb_buckets)
        friction = fb[fid] if dr.randomize_friction else jnp.ones(N)
        restitution = rb[rid] if dr.randomize_restitution else jnp.zeros(N)

        payload = (_uniform(kp_, (N,), *dr.added_mass_range)
                   if dr.randomize_base_mass else jnp.zeros(N))
        com_disp = (_uniform(kc, (3, N), -dr.max_push_force_offset,
                             dr.max_push_force_offset) * 0.0)  # COM rand off by default
        link_scale = (_uniform(kl, (N,), *dr.link_mass_range)
                      if dr.randomize_link_mass else None)
        inertias, robot_mass = engine.make_inertias(
            m, payload=payload, com_disp=com_disp,
            link_mass_scale=link_scale, num_envs=N)
        params = dict(inertias=inertias, robot_mass=robot_mass,
                      friction=friction.astype(jnp.float32),
                      restitution=restitution.astype(jnp.float32))

        # terrain levels/types/origins (legged_robot.py:1201-1228)
        if self.custom_origins:
            rows = cfg.terrain.num_rows
            cols = cfg.terrain.num_cols
            max_init = cfg.terrain.max_init_terrain_level
            if not cfg.terrain.curriculum:
                max_init = rows - 1
            levels = jax.random.randint(klev, (N,), 0, max_init + 1)
            types = (jnp.arange(N) // max(N / cols, 1e-9)).astype(jnp.int32)
            types = jnp.clip(types, 0, cols - 1)
            origins = self.terrain_origins[levels, types]
        else:
            levels = jnp.zeros((N,), dtype=jnp.int32)
            types = jnp.zeros((N,), dtype=jnp.int32)
            ncols = int(np.floor(np.sqrt(N)))
            nrows = int(np.ceil(N / ncols))
            xx, yy = jnp.meshgrid(jnp.arange(nrows), jnp.arange(ncols),
                                  indexing="ij")
            spacing = cfg.env.env_spacing
            origins = jnp.stack(
                [spacing * xx.flatten()[:N], spacing * yy.flatten()[:N],
                 jnp.zeros(N)], axis=1).astype(jnp.float32)

        zeros_q = jnp.zeros((m.nq, N), dtype=jnp.float32)
        phys = engine.make_state(
            pos=jnp.zeros((3, N), dtype=jnp.float32),
            quat=jnp.zeros((4, N), dtype=jnp.float32).at[3].set(1.0),
            lin_vel=jnp.zeros((3, N), dtype=jnp.float32),
            ang_vel=jnp.zeros((3, N), dtype=jnp.float32),
            q=zeros_q, qd=zeros_q)

        nq, nf = m.nq, len(self.feet_idx)
        state = dict(
            phys=phys,
            anchors=psim.init_anchors(self.geom, N),
            commands=jnp.zeros((N, 4), dtype=jnp.float32),
            command_lin_vel_x=jnp.asarray(cfg.commands.ranges.lin_vel_x,
                                          dtype=jnp.float32),
            episode_length=jnp.zeros((N,), dtype=jnp.int32),
            common_step=jnp.zeros((), dtype=jnp.int32),
            actions=jnp.zeros((N, nq), dtype=jnp.float32),
            last_actions=jnp.zeros((N, nq), dtype=jnp.float32),
            last_actions_2=jnp.zeros((N, nq), dtype=jnp.float32),
            last_dof_vel=jnp.zeros((N, nq), dtype=jnp.float32),
            last_foot_velocities=jnp.zeros((N, nf, 3), dtype=jnp.float32),
            feet_air_time=jnp.zeros((N, nf), dtype=jnp.float32),
            last_contacts=jnp.zeros((N, nf), dtype=bool),
            contact_filt=jnp.zeros((N, nf), dtype=bool),
            stumb_buffer=jnp.zeros((N, 5, nf), dtype=bool),
            lag_buffer=jnp.zeros((N, dr.lag_timesteps, nq), dtype=jnp.float32),
            lin_vel_buffer=jnp.zeros((N, 10, 2), dtype=jnp.float32),
            ang_vel_buffer=jnp.zeros((N, 10, 1), dtype=jnp.float32),
            cmd_buffer=jnp.zeros((N, 10, 4), dtype=jnp.float32),
            height_noise_offset=jnp.zeros((N,), dtype=jnp.float32),
            terrain_levels=levels.astype(jnp.int32),
            terrain_types=types.astype(jnp.int32),
            env_origins=origins,
            push_force=jnp.zeros((N, 3), dtype=jnp.float32),
            motor_strengths=jnp.ones((N, nq), dtype=jnp.float32),
            kp_factors=jnp.ones((N, nq), dtype=jnp.float32),
            kd_factors=jnp.ones((N, nq), dtype=jnp.float32),
            motor_offsets=jnp.zeros((N, nq), dtype=jnp.float32),
            # ONE (K, N) stack instead of a K-entry dict of (N,): the 34
            # per-term accumulations/resets/metric reductions become single
            # fused ops instead of 34 separate XLA fusion roots
            episode_sums=jnp.zeros((len(self.episode_sum_names), N),
                                   dtype=jnp.float32),
            pitch_est=jnp.zeros((N,), dtype=jnp.float32),
            obs_history=jnp.zeros((N, self.num_obs_history), dtype=jnp.float32),
            obs=jnp.zeros((N, self.num_obs), dtype=jnp.float32),
            privileged_obs=jnp.zeros((N, self.num_privileged_obs),
                                     dtype=jnp.float32),
            base_vel=jnp.zeros((N, 3), dtype=jnp.float32),
            foothold_obs=jnp.zeros((N, 8), dtype=jnp.float32),
            optimal_footholds_world=jnp.zeros((N, nf, 3), dtype=jnp.float32),
            torques=jnp.zeros((N, nq), dtype=jnp.float32),
            # body contact-point positions from the previous step's last
            # substep: the frozen-plane anchors of the Pallas physics path
            body_pts=jnp.zeros(
                (len(self.geom.dyn_idx) - len(self.feet_idx), 3, N),
                dtype=jnp.float32),
            # per-body-point frozen contact planes [h0, gx, gy, x0, y0],
            # refreshed each step by the fused sampler; h0=-1e4 means "no
            # contact" (reset-safe: a just-reset env's stale plane must not
            # fire spurious body contacts)
            planes=jnp.zeros(
                (len(self.geom.dyn_idx) - len(self.feet_idx), 5, N),
                dtype=jnp.float32).at[:, 0].set(-1e4),
            reset_buf=jnp.zeros((N,), dtype=bool),
            time_out_buf=jnp.zeros((N,), dtype=bool),
            rew_buf=jnp.zeros((N,), dtype=jnp.float32),
            measured_heights=jnp.zeros((N, self.num_height_points),
                                       dtype=jnp.float32),
            measured_foot_clearance=jnp.zeros((N, nf), dtype=jnp.float32),
        )
        # full reset of every env, then a zero-action step to populate obs
        state = self._apply_reset(state, jnp.ones((N,), dtype=bool), krst)
        return params, state

    def reset(self, params, state, key):
        """Reset all envs (BaseTask.reset parity: reset_idx(all) + zero step,
        base_task.py:115-121)."""
        k1, k2 = jax.random.split(key)
        N = self.num_envs
        state = self._apply_reset(state, jnp.ones((N,), dtype=bool), k1)
        return self.step(params, state, jnp.zeros((N, self.num_actions)), k2)

    # ------------------------------------------------------------------
    # step
    # ------------------------------------------------------------------
    def step(self, params, state, actions, key):
        """One policy step (LeggedRobot.step + DTC post_physics_step).

        Returns (new_state, out) with out = dict(obs, privileged_obs,
        obs_history, base_vel, rew, done, time_out, metrics)."""
        cfg = self.cfg
        N = self.num_envs
        m = self.model
        clip_a = cfg.normalization.clip_actions
        actions = jnp.clip(actions, -clip_a, clip_a)          # :98-99

        k_lag, k_post = jax.random.split(key)
        phys, anchors = state["phys"], state["anchors"]
        lag = state["lag_buffer"]
        default_q = jnp.asarray(self.default_dof_pos)
        torques = state["torques"]

        use_kernel = self._pallas_physics and (
            self._pallas_interpret or jax.default_backend() != "cpu")
        # fused terrain-sampler kernel (terrain/pallas_sampler.py): default
        # on the kernel path — one kernel for scan + clearance + body
        # planes with NO patch extraction and no materialized one-hots
        # (7.5 -> 4.7 ms/step at 4096 envs vs the XLA einsum sampler).
        # DTC_PALLAS_SAMPLER=0 falls back for A/B runs.
        use_sampler = (use_kernel and cfg.terrain.measure_heights
                       and kernel_flag("DTC_PALLAS_SAMPLER", "1"))

        # per-env terrain patches, extracted once per policy step; all
        # height queries this step run as matmul-samples from the patches
        # (terrain/patch.py; the robot drifts < the patch margin per step).
        # On the fused-kernel path the 3-table patches are NEVER
        # materialized: physics gets a raw DMA window and the post-physics
        # queries run in the fused sampler kernel (terrain/pallas_sampler).
        terrain_fn = None
        win = None
        if self.patch_src is not None:
            starts, patch_origin = tpatch.patch_starts(self.patch_src,
                                                       phys["pos"].T[:, :2])
            hs = self.grid.horizontal_scale
            if use_sampler:
                patches = None
                if kernel_flag("DTC_FUSED_WINDOW", "1"):
                    # the substep kernel DMAs its own per-env contact
                    # windows from the raw table (pallas_substep
                    # _substep_kernel_fused) — no host-side extract +
                    # transpose HBM round-trips.  DTC_FUSED_WINDOW=0
                    # falls back to the materialized window for A/B.
                    win = None
                else:
                    win = tpatch.extract_window(
                        self.patch_src, starts, psub.WIN_R0, psub.WIN_R,
                        interpret=self._pallas_interpret)   # (N, 40, 128)
            else:
                patches = tpatch.extract(self.patch_src, starts)  # (3,N,Pr,Pc)

                def terrain_fn(x, y):
                    # physics layout (K, N) -> sampler layout (N, K), back
                    h, dx, dy, hmx = tpatch.sample_bilinear_slope(
                        patches[0], patch_origin, hs, x.T, y.T)
                    return h.T, dx.T, dy.T, hmx.T
        else:
            patches, patch_origin, starts = None, None, None
            terrain_fn = self._terrain_fn()

        actions_scaled = actions * cfg.control.action_scale
        # action-lag indices: one randint(1,5) shared across envs per sim
        # step (np RNG parity, legged_robot.py:608-614)
        choices = jax.random.randint(k_lag, (cfg.control.decimation,), 1, 5)

        if use_kernel:
            # --- fused Pallas decimation kernel (pallas_substep.py) -------
            # PD goals per substep: the lag-buffer roll is q-independent,
            # so the `decimation` targets precompute outside the kernel
            goals = []
            for choice in choices:
                lag = jnp.concatenate([lag[:, 1:], actions_scaled[:, None, :]],
                                      axis=1)
                g = jnp.take(lag, choice, axis=1) + default_q[None, :]
                g = jnp.clip(g, self.dof_pos_limits[0],
                             self.dof_pos_limits[1])
                goals.append(g.T)
            goals = jnp.stack(goals)                        # (decim, nq, N)
            kp_eff = (self.p_gains * state["kp_factors"]).T
            kd_eff = (self.d_gains * state["kd_factors"]).T
            if use_sampler and win is None:
                window = None                # fused in-kernel window DMA
            elif win is not None:
                window = jnp.transpose(win, (1, 2, 0))      # (40, 128, N)
            else:
                window = jnp.transpose(
                    patches[0][:, psub.WIN_R0:psub.WIN_R0 + psub.WIN_R],
                    (1, 2, 0))
            worigin = (patch_origin + hs * jnp.array(
                [psub.WIN_R0, psub.WIN_C0], dtype=jnp.float32)).T
            # body-point contact planes sampled at the END of the previous
            # step (or reset-safe); refreshed post-physics below
            planes = state["planes"]
            phys, anchors, kinfo = psub.decimation_step(
                m, self.geom, cfg.sim, cfg.control.decimation,
                self.thigh_dyn_idx, params["inertias"], phys, anchors,
                goals, kp_eff, kd_eff, state["motor_strengths"].T,
                state["motor_offsets"].T, params["friction"],
                params["restitution"], window, worigin, planes, hs,
                interpret=self._pallas_interpret,
                blocks=self.patch_src.blocks if window is None else None,
                starts=starts if window is None else None)
            torques = kinfo.pop("torques").T
            body_pts = kinfo.pop("body_pts")
            info = kinfo
            state = {**state, "phys": phys, "anchors": anchors,
                     "lag_buffer": lag, "actions": actions,
                     "torques": torques, "body_pts": body_pts}
            info["patches"] = patches
            info["patch_origin"] = patch_origin
            info["starts"] = starts
            info["use_kernel"] = True
            info["use_sampler"] = use_sampler
            return self._post_physics_step(params, state, info, k_post)

        def decim_body(carry, choice):                        # :102-111
            phys, anchors, lag = carry
            lag = jnp.concatenate([lag[:, 1:], actions_scaled[:, None, :]],
                                  axis=1)
            goal = jnp.take(lag, choice, axis=1) + default_q[None, :]
            goal = jnp.clip(goal, self.dof_pos_limits[0], self.dof_pos_limits[1])
            q_t = phys["q"].T
            qd_t = phys["qd"].T
            tau = (self.p_gains * state["kp_factors"]
                   * (goal - q_t + state["motor_offsets"])
                   - self.d_gains * state["kd_factors"] * qd_t)  # :616-618
            tau = tau * state["motor_strengths"]
            tau = jnp.clip(tau, -self.torque_limits, self.torque_limits)
            phys, anchors, info = psim.sim_step(
                m, self.geom, cfg.sim, params["inertias"], phys, anchors,
                tau.T, terrain_fn, params["friction"], params["restitution"])
            y = dict(torques=tau,
                     contact_forces=info["contact_forces"],
                     foot_pos=info["foot_pos"], foot_vel=info["foot_vel"],
                     thigh_pos=info["kin"]["x"][self.thigh_dyn_idx])
            return (phys, anchors, lag), y

        (phys, anchors, lag), ys = jax.lax.scan(
            decim_body, (phys, anchors, lag), choices)
        # env logic consumes the state after the LAST sim substep
        # (refresh_* parity, dtc.py:61-63)
        info = {k: v[-1] for k, v in ys.items() if k != "torques"}
        torques = ys["torques"][-1]

        state = {**state, "phys": phys, "anchors": anchors, "lag_buffer": lag,
                 "actions": actions, "torques": torques}
        info["patches"] = patches
        info["patch_origin"] = patch_origin
        return self._post_physics_step(params, state, info, k_post)

    # ------------------------------------------------------------------
    def _post_physics_step(self, params, state, info, key):
        """Parity with LeggedRobotDTC.post_physics_step (dtc.py:56-227)."""
        cfg = self.cfg
        N = self.num_envs
        phys = state["phys"]
        keys = jax.random.split(key, 8)

        episode_length = state["episode_length"] + 1
        common_step = state["common_step"] + 1

        base_pos = phys["pos"].T                              # (N,3)
        base_quat = phys["quat"].T
        base_lin_vel = qm.quat_rotate_inverse(base_quat, phys["lin_vel"].T)
        base_ang_vel = qm.quat_rotate_inverse(base_quat, phys["ang_vel"].T)
        gvec = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (N, 3))
        projected_gravity = qm.quat_rotate_inverse(base_quat, gvec)
        dof_pos = phys["q"].T
        dof_vel = phys["qd"].T
        foot_positions = jnp.transpose(info["foot_pos"], (2, 0, 1))  # (N,4,3)
        foot_velocities = jnp.transpose(info["foot_vel"], (2, 0, 1))
        contact_forces = jnp.transpose(info["contact_forces"], (2, 0, 1))  # (N,B,3)

        # roll soft-tracking buffers (dtc.py:76-81)
        lin_vel_buffer = jnp.concatenate(
            [state["lin_vel_buffer"][:, 1:], base_lin_vel[:, None, :2]], axis=1)
        ang_vel_buffer = jnp.concatenate(
            [state["ang_vel_buffer"][:, 1:], base_ang_vel[:, None, 2:3]], axis=1)

        # ---- callback (legged_robot.py:529-564) ----------------------------
        commands = state["commands"]
        resample_every = int(cfg.commands.resampling_time / cfg.dt)
        need_resample = (episode_length % resample_every) == 0
        commands = self._resample_commands_where(
            commands, need_resample, state["command_lin_vel_x"], keys[0])
        commands = self._clamp_descent_commands(
            commands, state["terrain_types"], state["terrain_levels"])
        if cfg.commands.heading_command:                      # :536-539
            fwd = qm.quat_rotate(base_quat,
                                 jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]),
                                                  (N, 3)))
            heading = jnp.arctan2(fwd[:, 1], fwd[:, 0])
            commands = commands.at[:, 2].set(
                jnp.clip(0.5 * qm.wrap_to_pi(commands[:, 3] - heading),
                         -1.5, 1.5))
        cmd_buffer = jnp.concatenate(
            [state["cmd_buffer"][:, 1:], commands[:, None, :]], axis=1)

        # height scan (min-of-3 sampling, legged_robot.py:1279-1317) from
        # the pooled-min3 patch (terrain/patch.py); on the kernel path ALL
        # of this step's terrain queries (scan + foot clearance + next-step
        # body planes) run in ONE fused Pallas kernel
        fused_h10 = None
        planes_next = None

        def scan_xy():
            # world scan-point x/y as (N, H) component planes — the (N,H,3)
            # vector layout would put the 3-dim in the 128-lane minor dim
            hp = jnp.asarray(self.height_points)         # (H, 3) static
            cy, sy = qm.yaw_rot2d(base_quat)
            px = (cy[:, None] * hp[None, :, 0] - sy[:, None] * hp[None, :, 1]
                  + base_pos[:, 0:1])
            py = (sy[:, None] * hp[None, :, 0] + cy[:, None] * hp[None, :, 1]
                  + base_pos[:, 1:2])
            return px, py

        if info.get("use_sampler"):
            from ..terrain import pallas_sampler as psmp
            sx, sy_ = scan_xy()
            scan_c = (sx, sy_)
            bp = state["body_pts"]                       # (Pb, 3, N)
            nb = bp.shape[0]
            nf = foot_positions.shape[1]
            nh = self.num_height_points

            def packq(c):
                fill = base_pos[:, c:c + 1]
                return jnp.concatenate([
                    scan_c[c],
                    jnp.broadcast_to(fill, (N, psmp.Q_MIN3 - nh)),
                    foot_positions[..., c],
                    jnp.broadcast_to(fill, (N, psmp.Q_MAX10 - nf)),
                    bp[:, c].T,
                    jnp.broadcast_to(fill, (N, psmp.Q_BIL - nb)),
                ], axis=1)

            h_all, gxs, gys = psmp.sample_all(
                self.patch_src, info["starts"], info["patch_origin"],
                packq(0), packq(1), interpret=self._pallas_interpret)
            measured_heights = h_all[:, :nh]
            fused_h10 = h_all[:, psmp.Q_MIN3:psmp.Q_MIN3 + nf]
            off = psmp.Q_MIN3 + psmp.Q_MAX10
            planes_next = jnp.stack(
                [h_all[:, off:off + nb].T, gxs[:, :nb].T, gys[:, :nb].T,
                 bp[:, 0], bp[:, 1]], axis=1)            # (Pb, 5, N)
        elif cfg.terrain.measure_heights and not self.grid.is_plane:
            px, py = scan_xy()
            measured_heights = tpatch.sample_nearest(
                info["patches"][1], info["patch_origin"],
                self.grid.horizontal_scale, px, py)
        else:
            # plane: zero heights (legged_robot.py:1292-1293)
            measured_heights = jnp.zeros((N, self.num_height_points))
        if info.get("use_kernel") and planes_next is None:
            # kernel physics without the fused sampler (e.g. heights off):
            # refresh next-step body planes from the materialized patches
            bp = state["body_pts"]
            if info.get("patches") is not None:
                h0, gx0, gy0, _ = tpatch.sample_bilinear_slope(
                    info["patches"][0], info["patch_origin"],
                    self.grid.horizontal_scale, bp[:, 0].T, bp[:, 1].T)
                planes_next = jnp.stack(
                    [h0.T, gx0.T, gy0.T, bp[:, 0], bp[:, 1]], axis=1)

        # random pushes (legged_robot.py:546-556, 673-678)
        push_force = state["push_force"]
        if cfg.domain_rand.push_robots:
            interval = self.cfg.push_interval
            do_push = (common_step % interval) == 0
            in_window = (common_step % interval) < 2
            new_vxy = _uniform(keys[1], (N, 2), -cfg.domain_rand.max_push_vel_xy,
                               cfg.domain_rand.max_push_vel_xy)
            lin_vel_w = phys["lin_vel"]
            lin_vel_w = jnp.where(do_push, lin_vel_w.at[:2].set(new_vxy.T),
                                  lin_vel_w)
            phys = {**phys, "lin_vel": lin_vel_w}
            mf = cfg.domain_rand.max_push_force_xy
            new_force = jnp.zeros((N, 3)).at[:, :2].set(
                _uniform(keys[2], (N, 2), -mf, mf))
            push_force = jnp.where(in_window,
                                   jnp.where(do_push, new_force, push_force),
                                   jnp.zeros((N, 3)))

        # foot clearance (max-of-10 sampling, legged_robot.py:1443-1472)
        # from the pooled-max10 patch (or the fused sampler result)
        if cfg.terrain.measure_foot_clearance and not self.grid.is_plane:
            if fused_h10 is not None:
                h10 = fused_h10
            else:
                h10 = tpatch.sample_nearest(
                    info["patches"][2], info["patch_origin"],
                    self.grid.horizontal_scale,
                    foot_positions[..., 0], foot_positions[..., 1])
            measured_foot_clearance = foot_positions[..., 2] - h10
        else:
            measured_foot_clearance = foot_positions[..., 2]

        # contact filter (legged_robot.py:561-564)
        feet_contact = contact_forces[:, self.feet_idx, 2] > 1.0
        contact_filt = feet_contact | state["last_contacts"]
        last_contacts = feet_contact

        # ---- DTC foothold planner (dtc.py:100-204) --------------------------
        if cfg.use_dtc_planner and cfg.terrain.measure_heights:
            hips = jnp.transpose(info["thigh_pos"], (2, 0, 1))
            # fused scoring kernel (env/pallas_planner.py) on the kernel
            # path: one VMEM pass instead of the XLA (N,693)/(N,4,693)
            # intermediate chain.  Debug viz needs the full score tensor,
            # so it stays on the XLA planner.  DTC_PALLAS_PLANNER=0 for A/B.
            use_planner_kernel = (
                bool(info.get("use_kernel")) and not cfg.env.debug_viz
                and kernel_flag("DTC_PALLAS_PLANNER", "1"))
            if use_planner_kernel:
                plan = pplanner.plan_footholds_fused(
                    cfg, base_pos, base_quat, base_lin_vel, commands, hips,
                    measured_heights, self.height_points,
                    cfg.terrain.measured_points_x,
                    cfg.terrain.measured_points_y,
                    interpret=self._pallas_interpret)
            else:
                plan = planner.plan_footholds(
                    cfg, base_pos, base_quat, base_lin_vel, commands, hips,
                    measured_heights, self.height_points,
                    cfg.terrain.measured_points_x,
                    cfg.terrain.measured_points_y)
            foothold_obs = plan["foothold_obs"]
            optimal_footholds_world = plan["optimal_footholds_world"]
            debug = (dict(heights_world=plan["heights_world"],
                          foothold_score=plan["foothold_score"],
                          pred_footholds=plan["pred_footholds"],
                          foot_positions=foot_positions)
                     if cfg.env.debug_viz else None)
        else:
            foothold_obs = state["foothold_obs"] * 0.0
            optimal_footholds_world = foot_positions
            debug = None

        # ---- termination (dtc.py:229-251 / legged_robot.py:178-198) --------
        if len(self.termination_idx):
            cf_term = contact_forces[:, self.termination_idx]
            term_contact = jnp.any(
                jnp.linalg.norm(cf_term, axis=-1) > 100.0, axis=1)
        else:
            term_contact = jnp.zeros((N,), dtype=bool)
        reset_buf = term_contact
        time_out_buf = episode_length > self.max_episode_length
        reset_buf = reset_buf | time_out_buf
        term_gravity = jnp.zeros((N,), dtype=bool)
        term_height = jnp.zeros((N,), dtype=bool)
        if cfg.use_dtc_planner:
            term_gravity = projected_gravity[:, 2] > 0.2          # :239
            reset_buf = reset_buf | term_gravity
            if cfg.terrain.measure_heights:
                ny = cfg.terrain.measured_y_dim
                lo_i, hi_i = 10 * ny, (cfg.terrain.measured_x_dim - 10) * ny
                # Reference check (dtc.py:243-245): mean(z - clip(h, 0)) <
                # 0.15.  The clip makes stepping-stone holes count as level
                # ground so falling in terminates — but it ALSO insta-kills
                # every spawn on tiles whose platform sits below world zero
                # (stairs-down pyramids), permanently locking those env
                # columns into 1-step episodes.  Deliberate fix: measure
                # relative to the env origin height; identical to the
                # reference on every tile with origin z = 0.
                oz = state["env_origins"][:, 2:3]
                center = jnp.clip(measured_heights[:, lo_i:hi_i] - oz,
                                  0.0, None)
                term_height = jnp.mean(
                    base_pos[:, 2:3] - oz - center, axis=1) < 0.15
                reset_buf = reset_buf | term_height
        else:
            if cfg.terrain.measure_heights:
                ny = cfg.terrain.measured_y_dim
                lo_i, hi_i = 13 * ny, (cfg.terrain.measured_x_dim - 13) * ny
                term_height = jnp.mean(
                    base_pos[:, 2:3] - measured_heights[:, lo_i:hi_i],
                    axis=1) < 0.1
                reset_buf = reset_buf | term_height
            below_feet = jnp.mean(
                base_pos[:, 2:3] - foot_positions[:, :, 2], axis=1) < 0.1
            term_height = term_height | below_feet
            reset_buf = reset_buf | below_feet

        # ---- rewards (legged_robot.py:274-291) ------------------------------
        ctx = dict(
            dt=cfg.dt,
            base_lin_vel=base_lin_vel, base_ang_vel=base_ang_vel,
            projected_gravity=projected_gravity,
            dof_pos=dof_pos, dof_vel=dof_vel,
            last_dof_vel=state["last_dof_vel"],
            actions=state["actions"], last_actions=state["last_actions"],
            last_actions_2=state["last_actions_2"],
            torques=state["torques"],
            contact_forces=contact_forces,
            feet_idx=self.feet_idx, penalised_idx=self.penalised_idx,
            hip_dof_idx=self.hip_dof_idx,
            feet_contact=feet_contact, last_contacts=last_contacts,
            contact_filt=contact_filt,
            feet_air_time=state["feet_air_time"],
            stumb_buffer=state["stumb_buffer"],
            commands=commands,
            cmd_buffer=cmd_buffer, lin_vel_buffer=lin_vel_buffer,
            ang_vel_buffer=ang_vel_buffer,
            lin_vel_x_max=state["command_lin_vel_x"][1],
            ang_vel_yaw_max=cfg.commands.ranges.ang_vel_yaw[1],
            tracking_sigma=cfg.rewards.tracking_sigma,
            # static per-dof constants stay numpy: the fused rewards kernel
            # bakes them into its (nq, 6) static block with np.asarray, and
            # this JAX version traces jnp constants created inside jit
            # (np.asarray on them raises TracerArrayConversionError).
            default_dof_pos=np.asarray(self.default_dof_pos)[None, :],
            soft_dof_pos_limits=self.soft_dof_pos_limits,
            dof_vel_limit=self.dof_vel_limits,
            soft_dof_vel_limit=cfg.rewards.soft_dof_vel_limit,
            torque_limit=self.torque_limits,
            soft_torque_limit=cfg.rewards.soft_torque_limit,
            max_contact_force=cfg.rewards.max_contact_force,
            max_acc=cfg.rewards.max_acc,
            base_height_target=cfg.rewards.base_height_target,
            robot_mass=params["robot_mass"],
            foot_positions=foot_positions, foot_velocities=foot_velocities,
            last_foot_velocities=state["last_foot_velocities"],
            measured_foot_clearance=measured_foot_clearance,
            measured_heights=measured_heights,
            plane_pinv=self.plane_pinv,
            pitch_est=state["pitch_est"],
            terrain_levels=state["terrain_levels"],
            acc_points=self.acc_points,
            optimal_footholds_world=optimal_footholds_world,
            root_z=base_pos[:, 2],
            env_origin_z=state["env_origins"][:, 2],
            reset_buf=reset_buf, time_out_buf=time_out_buf,
            updates={},
        )
        # fused rewards kernel (experimental/pallas_rewards.py): every active term,
        # the positive clip, the termination term, the (K, N) episode-sum
        # accumulate, and the stateful buffer updates in ONE launch
        # (the XLA path lowers to dozens of small outer fusions).
        # DTC_PALLAS_REWARDS=0 falls back for A/B runs.  (Opt-in until the
        # on-device parity run lands — flip the default to "1" with the
        # recorded verify_kernels_tpu pass.)
        use_rewards_kernel = (
            bool(info.get("use_kernel"))
            and kernel_flag("DTC_PALLAS_REWARDS", "0")
            and N % 128 == 0
            and len(self.feet_idx) == 4)
        if use_rewards_kernel:
            from ..experimental import pallas_rewards as prw
            rew_buf, episode_sums, upd = prw.compute_rewards_fused(
                self.reward_names, self.reward_scales_dt, ctx,
                cfg.rewards.only_positive_rewards,
                self.termination_scale_dt, self.episode_sum_names,
                state["episode_sums"], interpret=self._pallas_interpret)
            ctx["updates"] = upd
        else:
            rew_buf, per_term = rew_mod.compute_rewards(
                self.reward_names, self.reward_scales_dt, ctx,
                cfg.rewards.only_positive_rewards, self.termination_scale_dt)
            episode_sums = state["episode_sums"] + jnp.stack(
                [per_term[n] for n in self.episode_sum_names])

        # ---- masked reset (legged_robot.py:200-272) -------------------------
        mid_state = {**state,
                     "phys": phys,
                     "episode_length": episode_length,
                     "common_step": common_step,
                     "commands": commands,
                     "cmd_buffer": cmd_buffer,
                     "lin_vel_buffer": lin_vel_buffer,
                     "ang_vel_buffer": ang_vel_buffer,
                     "push_force": push_force,
                     "last_contacts": last_contacts,
                     "contact_filt": contact_filt,
                     "feet_air_time": ctx["updates"].get(
                         "feet_air_time", state["feet_air_time"]),
                     "stumb_buffer": ctx["updates"].get(
                         "stumb_buffer", state["stumb_buffer"]),
                     "pitch_est": ctx["updates"].get(
                         "pitch_est", state["pitch_est"]),
                     "episode_sums": episode_sums,
                     "measured_heights": measured_heights,
                     "measured_foot_clearance": measured_foot_clearance,
                     "reset_buf": reset_buf,
                     "time_out_buf": time_out_buf,
                     "rew_buf": rew_buf,
                     "foothold_obs": foothold_obs,
                     "optimal_footholds_world": optimal_footholds_world,
                     }
        if planes_next is not None:
            mid_state["planes"] = planes_next
        metrics = self._reset_metrics(mid_state, reset_buf)
        # per-cause termination tally (predicates are not mutually
        # exclusive; each done env counts under every cause that fired) —
        # diagnosis surface for plateaus like the X30 len-615 analysis
        f32 = jnp.float32
        metrics["term_contact"] = jnp.sum(term_contact.astype(f32))
        metrics["term_gravity"] = jnp.sum(term_gravity.astype(f32))
        metrics["term_height"] = jnp.sum(term_height.astype(f32))
        metrics["term_timeout"] = jnp.sum(time_out_buf.astype(f32))
        new_state = self._apply_reset(mid_state, reset_buf, keys[3])
        # mean terrain level over ALL envs AFTER the curriculum update
        # (legged_robot.py:259 logs torch.mean(self.terrain_levels.float())
        # over the whole fleet); the 24-step scan sums these per-step means
        # and the host divides by num_steps_per_env
        metrics["terrain_level"] = jnp.mean(
            new_state["terrain_levels"].astype(jnp.float32))

        # ---- observations (dtc.py:254-288) ----------------------------------
        new_state, obs_out = self._compute_observations(
            params, new_state, base_pos, base_quat, base_lin_vel,
            base_ang_vel, projected_gravity, measured_heights, keys[4],
            reset_buf)

        # post-step bookkeeping (dtc.py:215-223)
        new_state = {**new_state,
                     "last_actions_2": new_state["last_actions"],
                     "last_actions": new_state["actions"],
                     "last_dof_vel": new_state["phys"]["qd"].T,
                     "last_foot_velocities": foot_velocities}

        out = dict(obs=obs_out["obs"],
                   privileged_obs=obs_out["privileged_obs"],
                   obs_history=new_state["obs_history"],
                   base_vel=obs_out["base_vel"],
                   rew=rew_buf, done=reset_buf, time_out=time_out_buf,
                   metrics=metrics)
        if debug is not None:
            out["debug"] = debug               # env.debug_viz (config :12)
        return new_state, out

    # ------------------------------------------------------------------
    def _resample_commands_where(self, commands, mask, lin_vel_x_range, key):
        """_resample_commands parity (legged_robot.py:567-593), masked."""
        cfg = self.cfg
        N = commands.shape[0]
        r = cfg.commands.ranges
        k1, k2, k3 = jax.random.split(key, 3)
        new_c = jnp.zeros_like(commands)
        new_c = new_c.at[:, 0].set(_uniform(k1, (N,), lin_vel_x_range[0],
                                            lin_vel_x_range[1]))
        new_c = new_c.at[:, 1].set(_uniform(k2, (N,), *r.lin_vel_y))
        if cfg.commands.heading_command:
            new_c = new_c.at[:, 3].set(_uniform(k3, (N,), *r.heading))
        else:
            new_c = new_c.at[:, 2].set(_uniform(k3, (N,), *r.ang_vel_yaw))
        if cfg.env.play_command:                               # :580-587
            new_c = new_c.at[:, 0].set(0.5).at[:, 1].set(0.0)
            if cfg.commands.heading_command:
                new_c = new_c.at[:, 3].set(0.0)
            else:
                new_c = new_c.at[:, 2].set(0.0)
        # zero small commands (:591)
        small = jnp.linalg.norm(new_c[:, :2], axis=1) <= 0.1
        new_c = new_c.at[:, :2].multiply(jnp.where(small, 0.0, 1.0)[:, None])
        mask = jnp.asarray(mask)
        if mask.ndim == 0:
            mask = jnp.broadcast_to(mask, (N,))
        return jnp.where(mask[:, None], new_c, commands)

    # ------------------------------------------------------------------
    def _clamp_descent_commands(self, commands, types, levels):
        """Rescale planar commands to <= descent_clamp m/s on descent-family
        columns at terrain_level >= descent_clamp_level (CommandsCfg; no
        reference analog — round-5 X30 descent-frontier intervention).
        Direction is preserved; yaw/heading commands are untouched."""
        c = self.cfg.commands
        if self._descent_cols is None:
            return commands
        on_descent = (jnp.asarray(self._descent_cols)[types]
                      & (levels >= c.descent_clamp_level))
        speed = jnp.linalg.norm(commands[:, :2], axis=1)
        scale = jnp.where(on_descent & (speed > c.descent_clamp),
                          c.descent_clamp / jnp.maximum(speed, 1e-6), 1.0)
        return commands.at[:, :2].multiply(scale[:, None])

    # ------------------------------------------------------------------
    def _reset_metrics(self, state, done):
        """Episode logging at reset (legged_robot.py:252-261): per-term sums
        over done envs (host divides by count for means)."""
        n_done = jnp.sum(done.astype(jnp.float32))
        out = {"n_done": n_done}
        sums = jnp.sum(jnp.where(done[None, :], state["episode_sums"], 0.0),
                       axis=1) / self.cfg.env.episode_length_s      # (K,)
        for i, n in enumerate(self.episode_sum_names):
            out["rew_" + n] = sums[i]
        return out

    # ------------------------------------------------------------------
    def _apply_reset(self, state, done, key):
        """Masked functional reset of `done` envs (reset_idx parity,
        legged_robot.py:200-272 + dtc.py:291-315)."""
        cfg = self.cfg
        N = self.num_envs
        m = self.model
        keys = jax.random.split(key, 10)
        d1 = done[:, None]

        # command curriculum (update_command_curriculum,
        # legged_robot.py:716-726): widen lin_vel_x when the tracking
        # reward of the resetting envs exceeds 80% of its ceiling; updated
        # only every max_episode_length steps (reset_idx gating, :216-217)
        cmd_range = state["command_lin_vel_x"]
        if cfg.commands.curriculum and "tracking_lin_vel" in self.episode_sum_names:
            gate = (state["common_step"] % self.max_episode_length) == 0
            n_done = jnp.maximum(jnp.sum(done.astype(jnp.float32)), 1.0)
            tl_row = self.episode_sum_names.index("tracking_lin_vel")
            mean_track = jnp.sum(jnp.where(
                done, state["episode_sums"][tl_row], 0.0)) / n_done
            good = (mean_track / self.max_episode_length
                    > 0.8 * self.reward_scales_dt["tracking_lin_vel"])
            mc = cfg.commands.max_curriculum
            widened = jnp.stack([jnp.clip(cmd_range[0] - 0.5, -mc, 0.0),
                                 jnp.clip(cmd_range[1] + 0.5, 0.0, mc)])
            cmd_range = jnp.where(gate & good & (jnp.sum(done) > 0),
                                  widened, cmd_range)

        # terrain curriculum (legged_robot.py:690-714)
        levels = state["terrain_levels"]
        env_origins = state["env_origins"]
        if self.custom_origins and cfg.terrain.curriculum:
            base_xy = state["phys"]["pos"].T[:, :2]
            distance = jnp.linalg.norm(base_xy - env_origins[:, :2], axis=1)
            move_up = distance > cfg.terrain.terrain_length * 0.6
            cmd_dist = (jnp.linalg.norm(state["commands"][:, :2], axis=1)
                        * cfg.env.episode_length_s * 0.5)
            move_down = (distance < cmd_dist) & ~move_up
            new_levels = levels + 1 * move_up - 1 * move_down
            max_level = cfg.terrain.num_rows
            rand_levels = jax.random.randint(keys[0], (N,), 0, max_level)
            new_levels = jnp.where(new_levels >= max_level, rand_levels,
                                   jnp.clip(new_levels, 0, None))
            levels = jnp.where(done, new_levels, levels)
            env_origins = jnp.where(
                d1, self.terrain_origins[levels, state["terrain_types"]],
                env_origins)

        # DOF reset: default * U(0.5, 1.5), qd = 0 (legged_robot.py:632-641)
        lo, hi = cfg.domain_rand.init_joint_range
        q_new = (jnp.asarray(self.default_dof_pos)[None, :]
                 * _uniform(keys[1], (N, m.nq), lo, hi))
        phys = state["phys"]
        q = jnp.where(d1, q_new, phys["q"].T).T
        qd = jnp.where(d1, 0.0, phys["qd"].T).T

        # root reset (dtc.py:291-315): origin + U(-0.5,0.5) xy, vel U(-0.5,0.5)
        init_pos = jnp.asarray(cfg.init_state.pos)
        xy_off = 0.5 if cfg.use_dtc_planner else 1.0
        pos_new = env_origins + init_pos[None, :]
        if self.custom_origins:
            pos_new = pos_new.at[:, :2].add(
                _uniform(keys[2], (N, 2), -xy_off, xy_off))
        pos = jnp.where(d1, pos_new, phys["pos"].T).T
        quat_new = jnp.broadcast_to(jnp.asarray(cfg.init_state.rot), (N, 4))
        quat = jnp.where(d1, quat_new, phys["quat"].T).T
        vel6 = _uniform(keys[3], (N, 6), -0.5, 0.5)
        lin_vel = jnp.where(d1, vel6[:, :3], phys["lin_vel"].T).T
        ang_vel = jnp.where(d1, vel6[:, 3:], phys["ang_vel"].T).T
        phys = dict(pos=pos, quat=quat, lin_vel=lin_vel, ang_vel=ang_vel,
                    q=q, qd=qd)

        # commands for reset envs (legged_robot.py:225)
        commands = self._resample_commands_where(
            state["commands"], done, cmd_range, keys[4])
        # clamp against the POST-curriculum levels the env respawns at
        commands = self._clamp_descent_commands(
            commands, state["terrain_types"], levels)

        # per-episode actuator DR (legged_robot.py:465-481): one scalar/env
        dr = cfg.domain_rand
        def _dr_field(old, k, rng, enabled):
            if not enabled:
                return old
            new = _uniform(k, (N, 1), rng[0], rng[1])
            new = jnp.broadcast_to(new, old.shape)
            return jnp.where(d1, new, old)
        motor_strengths = _dr_field(state["motor_strengths"], keys[5],
                                    dr.motor_strength, dr.randomize_motor_strength)
        kp_factors = _dr_field(state["kp_factors"], keys[6], dr.kp_range,
                               dr.randomize_kp_factor)
        kd_factors = _dr_field(state["kd_factors"], keys[7], dr.kd_range,
                               dr.randomize_kd_factor)

        # height-scan episode offset ~ N(0, 0.02) (legged_robot.py:229-230)
        hno = jnp.where(done,
                        0.02 * jax.random.normal(keys[8], (N,)),
                        state["height_noise_offset"])

        # anchors: snap to reset base xy (contacts re-anchor on first touch)
        anchors = jnp.where(done[None, None, :],
                            jnp.stack([pos[0], pos[1]])[None, :, :],
                            state["anchors"])
        # body plane anchors: snap to the reset base (refreshed next step);
        # planes go contact-free (h0=-1e4) so a stale plane from the old
        # location can't push on the respawned body for the first step
        body_pts = jnp.where(done[None, None, :], pos[None],
                             state["body_pts"])
        safe_plane = jnp.stack([jnp.full((N,), -1e4), jnp.zeros(N),
                                jnp.zeros(N), pos[0], pos[1]])     # (5, N)
        planes = jnp.where(done[None, None, :], safe_plane[None],
                           state["planes"])

        zeros_nq = jnp.zeros((N, m.nq))
        return {**state,
                "command_lin_vel_x": cmd_range,
                "phys": phys,
                "anchors": anchors,
                "body_pts": body_pts,
                "planes": planes,
                "terrain_levels": levels,
                "env_origins": env_origins,
                "commands": commands,
                "motor_strengths": motor_strengths,
                "kp_factors": kp_factors,
                "kd_factors": kd_factors,
                "height_noise_offset": hno,
                "last_actions": jnp.where(d1, 0.0, state["last_actions"]),
                "last_actions_2": jnp.where(d1, 0.0, state["last_actions_2"]),
                "last_dof_vel": jnp.where(d1, 0.0, state["last_dof_vel"]),
                "feet_air_time": jnp.where(d1, 0.0, state["feet_air_time"]),
                "episode_length": jnp.where(done, 0, state["episode_length"]),
                "pitch_est": jnp.where(done, 0.0, state["pitch_est"]),
                "last_contacts": jnp.where(d1, False, state["last_contacts"]),
                "contact_filt": jnp.where(d1, False, state["contact_filt"]),
                "stumb_buffer": jnp.where(done[:, None, None], False,
                                          state["stumb_buffer"]),
                "lag_buffer": jnp.where(done[:, None, None], 0.0,
                                        state["lag_buffer"]),
                "lin_vel_buffer": jnp.where(done[:, None, None], 0.0,
                                            state["lin_vel_buffer"]),
                "ang_vel_buffer": jnp.where(done[:, None, None], 0.0,
                                            state["ang_vel_buffer"]),
                "cmd_buffer": jnp.where(done[:, None, None], 0.0,
                                        state["cmd_buffer"]),
                "episode_sums": jnp.where(done[None, :], 0.0,
                                          state["episode_sums"]),
                }

    # ------------------------------------------------------------------
    def _compute_observations(self, params, state, base_pos, base_quat,
                              base_lin_vel, base_ang_vel, projected_gravity,
                              measured_heights, key, done):
        """Obs assembly (dtc.py:254-288).

        NOTE: matches the reference's ordering — observations are computed
        AFTER reset_idx but from the pre-reset derived quantities for
        non-reset envs; for just-reset envs the reference also uses STALE
        derived quantities (they refresh only next step).  We keep the same
        semantics by using the passed-in pre-reset quantities plus the
        post-reset dof state, exactly like compute_observations reading
        self.dof_pos after reset (legged_robot.py:163).
        """
        cfg = self.cfg
        N = self.num_envs
        os_ = cfg.normalization.obs_scales

        # fused obs kernel (experimental/pallas_obs.py): obs concat + noise + height
        # chain + privileged concat + clips + history roll in one launch,
        # with both noise draws from the in-kernel HW PRNG.  Opt-in
        # (DTC_PALLAS_OBS=1) until the on-device A/B flips the default.
        use_obs_kernel = (self._pallas_obs and cfg.terrain.measure_heights
                          and (self._pallas_interpret
                               or jax.default_backend() != "cpu"))
        if use_obs_kernel:
            from ..experimental import pallas_obs
            obs, privileged, obs_history = \
                pallas_obs.compute_observations_fused(
                    self, state, base_pos, base_ang_vel, projected_gravity,
                    measured_heights, key,
                    interpret=self._pallas_interpret)
            base_vel = base_lin_vel * os_.lin_vel
            new_state = {**state, "obs": obs, "privileged_obs": privileged,
                         "obs_history": obs_history, "base_vel": base_vel}
            return new_state, dict(obs=obs, privileged_obs=privileged,
                                   base_vel=base_vel)

        dof_pos = state["phys"]["q"].T
        dof_vel = state["phys"]["qd"].T
        parts = [
            base_ang_vel * os_.ang_vel,
            projected_gravity,
            state["commands"][:, :3] * jnp.asarray(self.commands_scale),
            (dof_pos - jnp.asarray(self.default_dof_pos)[None, :]) * os_.dof_pos,
            dof_vel * os_.dof_vel,
            state["actions"],
        ]
        if self._obs_has_foothold:          # 53-dim DTC layout (dtc.py:269)
            parts.append(state["foothold_obs"])
        obs = jnp.concatenate(parts, axis=1)

        heights = jnp.clip(
            base_pos[:, 2:3] - cfg.rewards.base_height_target - measured_heights,
            -1.0, 1.0) * os_.height_measurements                 # dtc.py:275
        k1, k2 = jax.random.split(key)
        use_hw_rng = self._pallas_rng and (
            self._pallas_interpret or jax.default_backend() != "cpu")
        if use_hw_rng:
            from ..experimental import pallas_rng
            height_noise = pallas_rng.uniform_pm1(
                k1, heights.shape, interpret=self._pallas_interpret)
        else:
            height_noise = _uniform(k1, heights.shape, -1.0, 1.0)
        noisy_heights = (heights
                         + height_noise * 0.1
                         + state["height_noise_offset"][:, None])
        privileged = jnp.concatenate([
            noisy_heights,
            state["push_force"] * os_.force,                     # forces[:,0,:]
            heights,
        ], axis=1)

        if cfg.noise.add_noise:                                  # dtc.py:284-287
            if use_hw_rng:
                from ..experimental import pallas_rng
                obs_noise = pallas_rng.uniform_pm1(
                    k2, obs.shape, interpret=self._pallas_interpret)
            else:
                obs_noise = _uniform(k2, obs.shape, -1.0, 1.0)
            obs = obs + obs_noise * jnp.asarray(self.noise_scale_vec)[None, :]

        clip_obs = cfg.normalization.clip_observations
        obs = jnp.clip(obs, -clip_obs, clip_obs)                 # step :118-121
        privileged = jnp.clip(privileged, -clip_obs, clip_obs)

        # HistoryWrapper.step parity (history_wrapper.py:17-24): roll history
        # AFTER computing obs; the reference does NOT zero history on resets
        # (reset_idx of the wrapper is never called).
        obs_history = jnp.concatenate(
            [state["obs_history"][:, self.num_obs:], obs], axis=1)
        base_vel = base_lin_vel * os_.lin_vel                    # get_base_vel

        new_state = {**state, "obs": obs, "privileged_obs": privileged,
                     "obs_history": obs_history, "base_vel": base_vel}
        return new_state, dict(obs=obs, privileged_obs=privileged,
                               base_vel=base_vel)
