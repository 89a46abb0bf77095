"""OnPolicyRunner — rollout + PPO update as ONE jitted, mesh-sharded program.

Capability parity with rsl_rl/runners/on_policy_runner.py:45-274 (training
loop, TensorBoard + console telemetry, save/load, inference-policy getter),
redesigned TPU-first: the 24-step rollout (lax.scan), GAE, and the full
5x4-minibatch PPO/VAE update compile into a single XLA program whose env
axis is sharded over the device mesh; XLA inserts the gradient/metric
collectives (parallel/mesh.py).
"""
from __future__ import annotations

import os
import time
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..agent.ppo import PPO, make_optimizers
from ..env.config import TrainCfg
from ..env.legged_env import LeggedEnv
from ..models.networks import (ActorCritic, ActorCriticDecoder,
                               ActorCriticRecurrent)
from ..parallel import mesh as pmesh
from ..utils import flags


class OnPolicyRunner:
    def __init__(self, env: LeggedEnv, train_cfg: TrainCfg,
                 log_dir: Optional[str] = None, mesh=None, writer=None):
        self.env = env
        if flags.strict_parity():
            # strict-parity master switch (PARITY.md "Known deviations"):
            # restore exact reference update semantics — sequential
            # VAE-then-policy ordering (rsl_rl ppo.py:197-254) and per-row
            # minibatch permutation (rollout_storage.py:165).  The kernel
            # gates and bf16 storage are forced off at their own sites via
            # utils/flags.
            import dataclasses as _dc
            train_cfg = _dc.replace(train_cfg, algorithm=_dc.replace(
                train_cfg.algorithm, fused_joint_step=False,
                minibatch_perm_granule=1, shuffle_strata=1))
        self.cfg = train_cfg
        self.log_dir = log_dir
        if mesh is None:
            # largest device prefix that divides the env count
            devs = jax.devices()
            n = len(devs)
            while n > 1 and env.num_envs % n:
                n -= 1
            mesh = pmesh.make_mesh(devs[:n])
        self.mesh = mesh
        self.writer = writer
        self.current_learning_iteration = 0
        self.tot_timesteps = 0
        self.tot_time = 0.0

        pol = train_cfg.policy
        key = jax.random.PRNGKey(train_cfg.runner.seed)
        self.key, k_net, k_env = jax.random.split(key, 3)
        if pol.policy_class_name == "ActorCriticDecoder":
            self.net = ActorCriticDecoder(
                num_obs=env.num_obs,
                num_privileged_obs=env.num_privileged_obs,
                num_actions=env.num_actions,
                obs_history_dim=env.num_obs_history,
                terrain_dim=env.num_height_points,
                terrain_latent=pol.terrain_latent,
                z_dim=pol.cenet_latent,
                actor_hidden=tuple(pol.actor_hidden_dims),
                critic_hidden=tuple(pol.critic_hidden_dims),
                activation=pol.activation,
                init_noise_std=pol.init_noise_std,
                outlier_filter=pol.outlier_filter)
            dummy = (jnp.zeros((1, env.num_obs)),
                     jnp.zeros((1, env.num_obs_history)),
                     jnp.zeros((1, env.num_privileged_obs)),
                     jnp.zeros((1, 3)), jax.random.PRNGKey(0))
            policy_kind = "decoder"
        elif pol.policy_class_name == "ActorCritic":
            self.net = ActorCritic(
                num_obs=env.num_obs, num_critic_obs=env.num_obs,
                num_actions=env.num_actions,
                actor_hidden=tuple(pol.actor_hidden_dims),
                critic_hidden=tuple(pol.critic_hidden_dims),
                activation=pol.activation,
                init_noise_std=pol.init_noise_std)
            dummy = (jnp.zeros((1, env.num_obs)), jnp.zeros((1, env.num_obs)))
            policy_kind = "mlp"
        elif pol.policy_class_name == "ActorCriticRecurrent":
            # RNN policy (actor_critic_recurrent.py:40): carries are
            # collected during the rollout scan and the update replays the
            # RNN from the rollout-start carry (PPO.update_recurrent)
            self.net = ActorCriticRecurrent(
                num_obs=env.num_obs, num_critic_obs=env.num_obs,
                num_actions=env.num_actions,
                rnn_hidden_size=pol.rnn_hidden_size,
                rnn_type=pol.rnn_type,
                actor_hidden=tuple(pol.actor_hidden_dims),
                critic_hidden=tuple(pol.critic_hidden_dims),
                activation=pol.activation,
                init_noise_std=pol.init_noise_std)
            c1 = self.init_carry(1)
            dummy = (jnp.zeros((1, env.num_obs)), jnp.zeros((1, env.num_obs)),
                     c1, c1)
            policy_kind = "recurrent"
        else:
            raise ValueError(
                f"unsupported policy_class_name {pol.policy_class_name!r}")
        self.ppo = PPO(net=self.net, alg=train_cfg.algorithm,
                       policy_kind=policy_kind,
                       # resolves shuffle_strata=0 (auto): device-local
                       # minibatch shuffle on meshes, exact global
                       # permutation on a single chip
                       n_env_shards=self.mesh.shape[pmesh.ENV_AXIS])
        self.params = self.net.init(k_net, *dummy)
        main_opt, vae_opt = make_optimizers(train_cfg.algorithm)
        self.opt_state = main_opt.init(self.params)
        self.vae_opt_state = vae_opt.init(self.params)
        self.learning_rate = jnp.asarray(train_cfg.algorithm.learning_rate)

        # env init, computed directly INTO the mesh sharding (works for
        # process-spanning meshes too: no host-side global array is ever
        # materialized — see parallel/distributed.py for the pod-slice path)
        with self.mesh:
            abs_params, abs_state = jax.eval_shape(env.init, k_env)
        p_shard = pmesh.tree_shardings(self.mesh, abs_params, env.num_envs)
        shardings = pmesh.tree_shardings(self.mesh, abs_state, env.num_envs)
        init_fn = jax.jit(env.init, out_shardings=(p_shard, shardings))
        with self.mesh:
            self.env_params, self.env_state = init_fn(k_env)

        self._state_shardings = shardings
        self._params_shardings = p_shard
        self._repl = pmesh.replicated(self.mesh)
        # episode stats (on_policy_runner.py:103-106); the recurrent policy's
        # hidden-state carries live here too (per-env, env-sharded)
        self.rewbuffer = deque(maxlen=100)
        self.lenbuffer = deque(maxlen=100)
        def make_log_state():
            log_state = dict(cur_reward_sum=jnp.zeros(env.num_envs),
                             cur_episode_length=jnp.zeros(env.num_envs))
            if policy_kind == "recurrent":
                log_state["carry_a"] = self.init_carry(env.num_envs)
                log_state["carry_c"] = self.init_carry(env.num_envs)
            return log_state

        ls_shard = jax.tree.map(lambda _: pmesh.env_leading(self.mesh),
                                jax.eval_shape(make_log_state))
        self._log_state = jax.jit(make_log_state,
                                  out_shardings=ls_shard)()

        self._train_iter = self._build_train_iter()

    # ------------------------------------------------------------------
    def init_carry(self, num_envs: int):
        """Fresh RNN carry for the recurrent policy: zeros (N, H) for GRU,
        ((N, H), (N, H)) for LSTM — the flax cell defaults."""
        pol = self.cfg.policy
        z = jnp.zeros((num_envs, pol.rnn_hidden_size))
        return z if pol.rnn_type == "gru" else (z, z)

    # ------------------------------------------------------------------
    def _build_train_iter(self):
        env = self.env
        ppo = self.ppo
        net = self.net
        T = self.cfg.runner.num_steps_per_env
        gamma = self.cfg.algorithm.gamma

        recurrent = ppo.policy_kind == "recurrent"

        def collect(params, env_params, env_state, log_state, key):
            """Rollout scan + GAE: the 'collection' phase
            (on_policy_runner.py:112-146)."""
            k_roll = key
            init_carry_a = log_state.get("carry_a")
            init_carry_c = log_state.get("carry_c")

            def rollout_body(carry, k):
                env_state, log_state = carry
                obs = env_state["obs"]
                priv = env_state["privileged_obs"]
                hist = env_state["obs_history"]
                base_vel = env_state["base_vel"]
                k_act, k_env = jax.random.split(k)
                if recurrent:
                    a, ca, cc = ppo.act_recurrent(
                        params, obs, log_state["carry_a"],
                        log_state["carry_c"], k_act)
                else:
                    a = ppo.act(params, obs, hist, priv, base_vel, k_act)
                env_state, out = env.step(env_params, env_state,
                                          a["actions"], k_env)
                # timeout bootstrap (ppo.py:160-163)
                rew = out["rew"] + gamma * a["values"] * out["time_out"]
                # the two big fields are stored bf16: both are consumed
                # ONLY as network inputs (every Dense runs dtype=bf16, so
                # the first-layer cast makes bf16 storage numerically
                # identical) except the VAE height-loss target, where the
                # 0.4% bf16 rounding sits far inside the height scan's
                # +-0.1 obs noise.  Halves the update's dominant HBM
                # traffic (the (T*N, 1389+265) permutation gather).
                # DTC_STRICT_PARITY=1 restores the reference's all-f32
                # storage (rollout_storage.py:30-60).
                store_dt = (jnp.float32 if flags.strict_parity()
                            else jnp.bfloat16)
                trans = dict(obs=obs,
                             privileged_obs=priv.astype(store_dt),
                             obs_history=hist.astype(store_dt),
                             base_vel=base_vel, actions=a["actions"],
                             values=a["values"], old_log_prob=a["log_prob"],
                             old_mu=a["mu"], old_sigma=a["sigma"],
                             next_obs=out["obs"], rewards=rew,
                             dones=out["done"])
                # episode bookkeeping (on_policy_runner.py:130-140)
                crs = log_state["cur_reward_sum"] + out["rew"]
                cel = log_state["cur_episode_length"] + 1.0
                done_f = out["done"].astype(jnp.float32)
                ep = dict(ep_rew_sum=jnp.sum(crs * done_f),
                          ep_len_sum=jnp.sum(cel * done_f),
                          ep_count=jnp.sum(done_f))
                log_state = {**log_state,
                             "cur_reward_sum": crs * (1.0 - done_f),
                             "cur_episode_length": cel * (1.0 - done_f)}
                if recurrent:
                    # carry reset at dones (actor_critic.reset, ppo.py:170)
                    reset = out["done"][:, None]
                    log_state["carry_a"] = jax.tree.map(
                        lambda c: jnp.where(reset, 0.0, c), ca)
                    log_state["carry_c"] = jax.tree.map(
                        lambda c: jnp.where(reset, 0.0, c), cc)
                return (env_state, log_state), (trans, out["metrics"], ep)

            (env_state, log_state), (batch, metrics, ep) = jax.lax.scan(
                rollout_body, (env_state, log_state),
                jax.random.split(k_roll, T))

            if recurrent:
                _, _, last_values, _, _ = net.apply(
                    params, env_state["obs"], env_state["obs"],
                    log_state["carry_a"], log_state["carry_c"])
            else:
                last_values = ppo._value(params, env_state["obs"],
                                         env_state["privileged_obs"],
                                         env_state["base_vel"])
            returns, advantages = ppo.compute_gae(
                batch["rewards"], batch["dones"], batch["values"], last_values)
            batch = {**batch, "returns": returns, "advantages": advantages}
            batch.pop("rewards")

            if recurrent:
                batch = dict(obs=batch["obs"], actions=batch["actions"],
                             values=batch["values"],
                             old_log_prob=batch["old_log_prob"],
                             old_mu=batch["old_mu"],
                             old_sigma=batch["old_sigma"],
                             returns=batch["returns"],
                             advantages=batch["advantages"],
                             dones=batch["dones"],
                             init_carry_a=init_carry_a,
                             init_carry_c=init_carry_c)
            else:
                batch.pop("dones")

            metrics_sum = jax.tree.map(lambda x: jnp.sum(x, axis=0), metrics)
            ep_sum = jax.tree.map(lambda x: jnp.sum(x, axis=0), ep)
            aux = {**{"metric_" + k: v for k, v in metrics_sum.items()},
                   **ep_sum}
            return env_state, log_state, batch, aux

        def do_update(params, opt_state, vae_opt_state, lr, batch, key):
            """The 'learning' phase (on_policy_runner.py:148-151)."""
            if recurrent:
                params, opt_state, lr, stats = ppo.update_recurrent(
                    params, opt_state, lr, batch, key)
            else:
                params, opt_state, vae_opt_state, lr, stats = ppo.update(
                    params, opt_state, vae_opt_state, lr, batch, key)
            return params, opt_state, vae_opt_state, lr, stats

        # Scalar stats leave the device as ONE packed f32 vector: each
        # jax array fetched separately is its own RPC on the remote-TPU
        # tunnel, and the ~45 per-iteration scalars cost ~45 ms/iter of
        # host overhead when issued individually (~20% of the iteration).
        # The name order is recorded at trace time (sorted) and used by
        # learn() to unpack.  The RNG key is threaded THROUGH the graph
        # for the same reason: a host-side jax.random.split is one more
        # dispatched device program per iteration.
        stat_names = self._stat_names = []

        def train_iter(params, opt_state, vae_opt_state, lr,
                       env_params, env_state, log_state, key):
            k_roll, k_upd, key_next = jax.random.split(key, 3)
            env_state, log_state, batch, aux = collect(
                params, env_params, env_state, log_state, k_roll)
            params, opt_state, vae_opt_state, lr, stats = do_update(
                params, opt_state, vae_opt_state, lr, batch, k_upd)
            stats = {**stats, **aux,
                     "mean_noise_std": jnp.mean(params["params"]["std"])}
            stat_names[:] = sorted(stats)
            vec = jnp.stack([stats[n].astype(jnp.float32)
                             for n in stat_names])
            return (params, opt_state, vae_opt_state, lr, env_state,
                    log_state, key_next, vec)

        repl = self._repl
        log_shardings = jax.tree.map(lambda _: pmesh.env_leading(self.mesh),
                                     self._log_state)

        # K-iteration block: one dispatched program runs K full train
        # iterations (lax.scan over train_iter) and returns the packed
        # stat vectors as a (K, S) matrix.  Per-dispatch host/RPC cost on
        # the remote-TPU tunnel drops to ~1/K (see RunnerCfg
        # .iters_per_dispatch); the math is identical to K single
        # dispatches because the body is train_iter itself, including the
        # in-graph key chain.
        self._train_block = None
        K = self.cfg.runner.iters_per_dispatch
        if K > 1 and not self.cfg.runner.perf_split:
            def train_block(params, opt_state, vae_opt_state, lr,
                            env_params, env_state, log_state, key):
                def body(carry, _):
                    (params, opt_state, vae_opt_state, lr, env_state,
                     log_state, key) = carry
                    (params, opt_state, vae_opt_state, lr, env_state,
                     log_state, key, vec) = train_iter(
                        params, opt_state, vae_opt_state, lr, env_params,
                        env_state, log_state, key)
                    return (params, opt_state, vae_opt_state, lr,
                            env_state, log_state, key), vec
                (params, opt_state, vae_opt_state, lr, env_state,
                 log_state, key), vecs = jax.lax.scan(
                    body, (params, opt_state, vae_opt_state, lr,
                           env_state, log_state, key), None, length=K)
                return (params, opt_state, vae_opt_state, lr, env_state,
                        log_state, key, vecs)

            self._train_block = jax.jit(
                train_block,
                in_shardings=(repl, repl, repl, repl,
                              self._params_shardings,
                              self._state_shardings, log_shardings, repl),
                donate_argnums=(5,))

        if self.cfg.runner.perf_split:
            # two-program mode: real collection-vs-learn wall-clock split
            # (Perf/collection time + Perf/learning_time parity,
            # on_policy_runner.py:143-155,196-198).  Costs one extra host
            # round-trip per iteration, so it is opt-in.
            self._collect_fn = jax.jit(
                collect,
                in_shardings=(repl, self._params_shardings,
                              self._state_shardings, log_shardings, repl),
                donate_argnums=(2,))
            self._update_fn = jax.jit(do_update)
        return jax.jit(
            train_iter,
            in_shardings=(repl, repl, repl, repl, self._params_shardings,
                          self._state_shardings, log_shardings, repl),
            donate_argnums=(5,))

    # ------------------------------------------------------------------
    def learn(self, num_learning_iterations: int, log_every: int = 10,
              init_at_random_ep_len: bool = False):
        """Training loop (OnPolicyRunner.learn, on_policy_runner.py:86-163)."""
        save_interval = self.cfg.runner.save_interval
        T = self.cfg.runner.num_steps_per_env
        N = self.env.num_envs
        start_it = self.current_learning_iteration
        if init_at_random_ep_len and start_it == 0:
            # randomize initial episode lengths so env resets desynchronize
            # from iteration 0 (on_policy_runner.py:105-109)
            self.key, k = jax.random.split(self.key)
            ep_len = jax.jit(
                lambda kk: jax.random.randint(
                    kk, (N,), 0, self.env.max_episode_length,
                    dtype=jnp.int32),
                out_shardings=pmesh.env_leading(self.mesh))(k)
            self.env_state = {**self.env_state, "episode_length": ep_len}
        tot_iter = start_it + num_learning_iterations

        # stats are consumed ONE iteration late: the device->host fetch of
        # iteration i's scalars overlaps iteration i+1's compute instead of
        # stalling the chip for the transfer round-trip (~100-150 ms on the
        # axon tunnel).  Identical rewbuffer/TB content, shifted one loop.
        pending = None                   # (it, device stats, perf)
        t_consume = time.time()

        def consume(p_it, p_stats, p_perf):
            nonlocal t_consume
            stats = jax.device_get(p_stats)
            if isinstance(stats, dict):       # perf_split path
                rows = [stats]
            else:                              # packed (S,) or block (K, S)
                arr = np.asarray(stats)
                if arr.ndim == 1:
                    arr = arr[None]
                rows = [dict(zip(self._stat_names, r)) for r in arr]
            now = time.time()
            dt_iter = (now - t_consume) / len(rows)
            t_consume = now
            for i, row in enumerate(rows):
                self.tot_timesteps += T * N
                self.tot_time += dt_iter
                if row["ep_count"] > 0:
                    self.rewbuffer.append(
                        float(row["ep_rew_sum"] / row["ep_count"]))
                    self.lenbuffer.append(
                        float(row["ep_len_sum"] / row["ep_count"]))
                if self.log_dir is not None and ((p_it + i) % log_every == 0):
                    self._log(p_it + i, row, dt_iter, perf=p_perf)

        it = start_it
        K = self.cfg.runner.iters_per_dispatch
        while it < tot_iter:
            t0 = time.time()
            perf = None
            # chain K iterations into one dispatch when a full block fits
            # before the next checkpoint boundary (model_{j} must hold the
            # params right after iteration j, so a save iteration may only
            # be the block's LAST element)
            nb = 1
            if self._train_block is not None and tot_iter - it >= K:
                if self.log_dir is None:
                    nb = K
                else:
                    j_save = it + (-it) % save_interval
                    if j_save - it + 1 >= K:
                        nb = K
            if self.cfg.runner.perf_split:
                # two-program mode: measure collection vs learning
                # (on_policy_runner.py:113,142-155)
                self.key, k = jax.random.split(self.key)
                k_roll, k_upd = jax.random.split(k)
                (self.env_state, self._log_state, batch, aux) = \
                    self._collect_fn(self.params, self.env_params,
                                     self.env_state, self._log_state, k_roll)
                aux = jax.device_get(aux)
                t_collect = time.time() - t0
                t1 = time.time()
                (self.params, self.opt_state, self.vae_opt_state,
                 self.learning_rate, stats) = self._update_fn(
                    self.params, self.opt_state, self.vae_opt_state,
                    self.learning_rate, batch, k_upd)
                stats = {**jax.device_get(stats), **aux}
                t_learn = time.time() - t1
                perf = (t_collect, t_learn)
            else:
                fn = self._train_block if nb > 1 else self._train_iter
                (self.params, self.opt_state, self.vae_opt_state,
                 self.learning_rate, self.env_state, self._log_state,
                 self.key, stats) = fn(
                    self.params, self.opt_state, self.vae_opt_state,
                    self.learning_rate, self.env_params, self.env_state,
                    self._log_state, self.key)
                stats.copy_to_host_async()
            if pending is not None:
                consume(*pending)
            pending = (it, stats, perf)
            last_it = it + nb - 1
            if self.log_dir is not None and last_it % save_interval == 0:
                # periodic saves are LIGHT (params/optimizer/RNG — the
                # reference's save scope; a full env-state checkpoint
                # costs ~3 s at 4096 envs) and ASYNC: the device->host
                # fetch of ~30 MB rides the remote-TPU tunnel at a few
                # seconds a piece, so a synchronous save every 50
                # iterations adds ~25 min to a 20k-iteration run.  A
                # worker thread fetches + writes while the device runs
                # ahead on already-dispatched iterations.  The final
                # checkpoint below is always full and synchronous.
                self._save_async(os.path.join(self.log_dir,
                                              f"model_{last_it}"))
            self.current_learning_iteration = last_it + 1
            it += nb
        if pending is not None:
            consume(*pending)
        self._join_save()
        if self.log_dir is not None:
            self.save(os.path.join(
                self.log_dir, f"model_{self.current_learning_iteration}"))

    # ------------------------------------------------------------------
    def _log(self, it, stats, dt_iter, perf=None):
        """TensorBoard scalars matching on_policy_runner.py:187-203."""
        fps = int(self.cfg.runner.num_steps_per_env * self.env.num_envs
                  / max(dt_iter, 1e-9))
        w = self.writer
        scalars = {
            "Loss/value_function": float(stats["value_loss"]),
            "Loss/surrogate": float(stats["surrogate_loss"]),
            "Loss/Reconstruction": float(stats["recons_loss"]),
            "Loss/Vel_estimation": float(stats["vel_loss"]),
            "Loss/KL_div": float(stats["kld_loss"]),
            "Loss/height": float(stats["height_loss"]),
            "Loss/learning_rate": float(stats["lr"]),
            # computed in-graph on the fast path (a host-side fetch of the
            # std param is an extra per-iteration RPC on the remote tunnel)
            "Policy/mean_noise_std": float(
                stats["mean_noise_std"]) if "mean_noise_std" in stats
            else float(np.mean(np.asarray(self.params["params"]["std"]))),
            "Perf/total_fps": fps,
            "Perf/iter_time": dt_iter,
        }
        if perf is not None:
            # exact reference scalar names (on_policy_runner.py:196-197)
            scalars["Perf/collection time"] = perf[0]
            scalars["Perf/learning_time"] = perf[1]
        n_done = max(float(stats.get("metric_n_done", 0.0)), 1.0)
        for k, v in stats.items():
            if k.startswith("metric_rew_"):
                scalars["Episode/" + k[7:]] = float(v) / n_done
            elif k.startswith("metric_term_"):
                # per-cause termination rate (fraction of ended episodes;
                # causes may co-fire) — plateau diagnosis surface
                scalars["Episode/" + k[7:]] = float(v) / n_done
        if "metric_terrain_level" in stats:
            # iteration mean of the per-step fleet-wide mean terrain level
            # (legged_robot.py:259 logs torch.mean over ALL envs)
            scalars["Episode/terrain_level"] = float(
                stats["metric_terrain_level"]) \
                / self.cfg.runner.num_steps_per_env
        if len(self.rewbuffer) > 0:
            scalars["Train/mean_reward"] = float(np.mean(self.rewbuffer))
            scalars["Train/mean_episode_length"] = float(np.mean(self.lenbuffer))
        if w is not None:
            for k, v in scalars.items():
                w.add_scalar(k, v, it)
        msg = (f"it {it:6d} | fps {fps:9d} | "
               f"rew {scalars.get('Train/mean_reward', float('nan')):8.3f} | "
               f"len {scalars.get('Train/mean_episode_length', float('nan')):7.1f} | "
               f"vloss {scalars['Loss/value_function']:8.4f} | "
               f"surr {scalars['Loss/surrogate']:8.4f} | "
               f"lr {scalars['Loss/learning_rate']:.1e}")
        print(msg, flush=True)

    # ------------------------------------------------------------------
    def _join_save(self):
        """Wait for an in-flight async save; re-raise its failure."""
        t = getattr(self, "_save_thread", None)
        if t is not None:
            t.join()
            self._save_thread = None
            err = getattr(self, "_save_error", None)
            if err is not None:
                self._save_error = None
                raise err

    def _save_async(self, path: str):
        """Light checkpoint written by a worker thread.

        Snapshots the current param/optimizer references (immutable jax
        arrays — the training loop rebinding self.params cannot mutate
        them), starts the device->host fetch, and hands the write to a
        thread so the device keeps running already-dispatched iterations.
        At most one save is in flight; a second request joins the first."""
        import threading

        self._join_save()
        tree = dict(
            params=self.params,
            opt_state=self.opt_state,
            vae_opt_state=self.vae_opt_state,
            learning_rate=self.learning_rate,
            iter=self.current_learning_iteration,
            key=self.key,
        )
        for leaf in jax.tree.leaves(tree):
            if hasattr(leaf, "copy_to_host_async"):
                leaf.copy_to_host_async()

        def work():
            try:
                from . import checkpoint as ckpt
                ckpt.save(path, jax.tree.map(
                    lambda x: np.asarray(x) if hasattr(x, "device") else x,
                    tree))
            except BaseException as e:   # surfaced at the next join
                self._save_error = e

        self._save_error = None
        self._save_thread = threading.Thread(target=work, daemon=True)
        self._save_thread.start()

    def save(self, path: str, infos=None, full: bool = True):
        """Checkpoint (save parity on_policy_runner.py:249-255; with
        full=True — the default — extended to include env/curriculum/RNG
        state per SURVEY.md §5).  full=False writes the reference's save
        scope (params/optimizers/lr/iteration/RNG only): ~30x smaller and
        ~10x faster, used for periodic mid-training saves."""
        from . import checkpoint as ckpt
        tree = dict(
            params=self.params,
            opt_state=self.opt_state,
            vae_opt_state=self.vae_opt_state,
            learning_rate=self.learning_rate,
            iter=self.current_learning_iteration,
            key=self.key,
        )
        if full:
            tree.update(env_state=self.env_state,
                        env_params=self.env_params)
        ckpt.save(path, tree)

    def load(self, path: str, load_optimizer: bool = True):
        """Restore a checkpoint.  Env/curriculum state is adopted only when
        the checkpoint's env count matches this runner's (evaluation
        typically rebuilds with fewer envs — then only params/optimizer/RNG
        are restored, like the reference's torch.load path,
        on_policy_runner.py:257-264)."""
        from . import checkpoint as ckpt
        # restore template: runner objects for params/optimizers (preserves
        # the optax NamedTuple state classes), STORED shapes for env pieces
        # (the checkpoint may hold a different env count than this runner).
        # tree_metadata raises on unrecognized orbax metadata shapes so a
        # broken load can never silently fall into the fresh-env path.
        meta = ckpt.tree_metadata(path)

        def abstract(m):
            return jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(tuple(x.shape), x.dtype), m)

        template = dict(
            params=self.params,
            opt_state=self.opt_state,
            vae_opt_state=self.vae_opt_state,
            learning_rate=self.learning_rate,
            iter=0,
            key=self.key,
        )
        has_env = "env_state" in meta
        if has_env:
            template.update(env_state=abstract(meta["env_state"]),
                            env_params=abstract(meta["env_params"]))
        restored = ckpt.load(path, template)
        self.params = restored["params"]
        if load_optimizer:
            self.opt_state = restored["opt_state"]
            self.vae_opt_state = restored["vae_opt_state"]
            self.learning_rate = restored["learning_rate"]
        self.current_learning_iteration = int(restored["iter"])
        self.key = restored["key"]
        if not has_env:
            # light checkpoint (periodic save): the reference's scope —
            # params/optimizer transfer, env state starts fresh
            print("light checkpoint (no env state): keeping fresh env state")
            return
        ck_envs = restored["env_state"]["commands"].shape[0]

        def compatible(stored, ours):
            # Structure alone is not enough: episode_sums is one (K, N)
            # stack whose K is the task's active reward-term count, so a
            # cross-task resume (x30_rough K=17 -> x30_dtc K=18) has
            # identical structure but incompatible shapes and would only
            # explode later inside the jitted step.  Require exact leaf
            # shape+dtype equality (same env count -> shapes must match
            # exactly for a same-task resume).
            if jax.tree.structure(stored) != jax.tree.structure(ours):
                return False
            return all(
                tuple(a.shape) == tuple(b.shape) and a.dtype == b.dtype
                for a, b in zip(jax.tree.leaves(stored),
                                jax.tree.leaves(ours)))

        same_struct = (compatible(restored["env_state"], self.env_state)
                       and compatible(restored["env_params"],
                                      self.env_params))
        if ck_envs == self.env.num_envs and same_struct:
            self.env_state = pmesh.apply_shardings(restored["env_state"],
                                                   self._state_shardings)
            self.env_params = pmesh.apply_shardings(restored["env_params"],
                                                    self._params_shardings)
        else:
            # cross-task resume (e.g. rough_X30 -> x30_dtc: different
            # active reward terms in the episode-sum metrics) or env-count
            # change: params/optimizer transfer, env state starts fresh
            print(f"checkpoint env state (envs={ck_envs}, "
                  f"same_struct={same_struct}) incompatible with runner "
                  f"(envs={self.env.num_envs}): keeping fresh env state")

    # ------------------------------------------------------------------
    def get_inference_policy(self, teacher: bool = True):
        """act_expert analog (on_policy_runner.py:266-273): a jitted
        deterministic policy obs_dict -> actions."""
        net = self.net
        params = self.params
        if self.ppo.policy_kind == "mlp":
            @jax.jit
            def policy(obs, obs_history, privileged_obs):
                mean, _, _ = net.apply(params, obs, obs)
                return mean
            return policy

        if self.ppo.policy_kind == "recurrent":
            # carry-threading policy (act_inference with hidden state,
            # actor_critic_recurrent.py:81-86): (obs, (ca, cc)) ->
            # (actions, (ca, cc)); get a fresh carry from init_carry(N)
            @jax.jit
            def policy(obs, carry):
                ca, cc = carry
                mean, _, _, ca, cc = net.apply(params, obs, obs, ca, cc)
                return mean, (ca, cc)
            return policy

        method = net.act_teacher if teacher else net.act_deterministic

        @jax.jit
        def policy(obs, obs_history, privileged_obs):
            return net.apply(params, obs, obs_history, privileged_obs,
                             method=method)

        return policy
