"""PPO + joint VAE training — one fused, jit-able update.

Capability parity with rsl_rl's PPO (ppo.py:42-357) and RolloutStorage
(rollout_storage.py:36-214), redesigned TPU-first:
  - the rollout is a lax.scan producing stacked (T, N, ...) pytrees (no
    mutable storage object),
  - GAE is a reverse lax.scan (compute_returns, rollout_storage.py:138-152),
  - the 5-epoch x 4-minibatch update is a lax.scan over permuted index
    blocks (mini_batch_generator, rollout_storage.py:162-214),
  - two optimizers: main Adam over ALL params with adaptive-KL learning rate
    (ppo.py:78,295-307) and a VAE Adam over the vae subtree (ppo.py:79);
    within each minibatch the VAE step runs first, then the policy step on
    the updated VAE params (ppo.py:249-254 before :265), exactly like the
    reference's sequential optimizer calls.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..env.config import AlgorithmCfg


def normal_log_prob(mean, std, x):
    """Sum of independent Normal log-probs over the action axis."""
    var = std * std
    lp = -0.5 * jnp.square(x - mean) / var - jnp.log(std) \
        - 0.5 * jnp.log(2.0 * jnp.pi)
    return jnp.sum(lp, axis=-1)


def normal_entropy(std):
    return jnp.sum(0.5 + 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(std), axis=-1)


def make_optimizers(alg: AlgorithmCfg):
    """(main, vae) optax chains; main LR is injected (adaptive KL)."""
    main = optax.chain(
        optax.clip_by_global_norm(alg.max_grad_norm),
        optax.inject_hyperparams(optax.adam)(learning_rate=alg.learning_rate),
    )
    vae = optax.chain(
        optax.clip_by_global_norm(alg.max_grad_norm),
        optax.adam(alg.vae_learning_rate),
    )
    return main, vae


@dataclasses.dataclass
class PPO:
    """Pure-function PPO over an actor-critic flax module.

    policy_kind:
      "decoder" — ActorCriticDecoder (the reference's live teacher path):
        actor consumes [obs, z, mu_vel, l_t], critic the privileged obs,
        and the update includes the joint VAE step (ppo.py:197-254).
      "mlp" — plain ActorCritic (actor_critic.py:38): actor(obs),
        critic(obs) (critic_observations = observations,
        rollout_storage.py:175), no VAE step.
      "recurrent" — ActorCriticRecurrent (actor_critic_recurrent.py:40):
        GRU/LSTM carries collected during rollout; the update REPLAYS the
        RNN over the stored (T, N) rollout from the rollout-start carry
        with in-sequence resets at dones, minibatching over the env axis —
        the static-shape equivalent of the reference's split-and-pad
        recurrent generator (rollout_storage.py:217-267).
    """
    net: Any                       # flax module
    alg: AlgorithmCfg
    policy_kind: str = "decoder"
    # env-shard count of the training mesh (runner sets this); resolves
    # AlgorithmCfg.shuffle_strata=0 (auto): S=1 on a single device (the
    # exact round-4 fast path), S=n_env_shards on meshes so the
    # minibatch shuffle stays device-local (data-parallel update)
    n_env_shards: int = 1
    # Elimination-profiling hooks (scripts/profile_update_chain.py): any
    # of "vae" / "actor" / "critic" / "opt" stubs that component out of
    # update() so its cost can be measured by difference on hardware
    # where isolated-dispatch timing is unreliable (the axon tunnel).
    # Static at trace time; () in production.
    disable: Tuple[str, ...] = ()

    def _stats(self, params, obs, obs_history, privileged_obs, rng):
        if self.policy_kind == "decoder":
            mean, std, _, _ = self.net.apply(
                params, obs, obs_history, privileged_obs, rng,
                method=self.net.act_stats)
            return mean, std
        mean, std, _ = self.net.apply(params, obs, obs)
        return mean, std

    def _value(self, params, obs, privileged_obs, base_vel):
        if self.policy_kind == "decoder":
            return self.net.apply(params, obs, privileged_obs, base_vel,
                                  method=self.net.evaluate)
        _, _, value = self.net.apply(params, obs, obs)
        return value

    # ---------------- recurrent helpers ----------------
    def act_recurrent(self, params, obs, carry_a, carry_c, key):
        """One recurrent acting step; returns stats + new carries."""
        mean, std, value, carry_a, carry_c = self.net.apply(
            params, obs, obs, carry_a, carry_c)
        actions = mean + std * jax.random.normal(key, mean.shape)
        log_prob = normal_log_prob(mean, std, actions)
        return dict(actions=actions, log_prob=log_prob, values=value,
                    mu=mean, sigma=std), carry_a, carry_c

    def _replay(self, params, obs_seq, dones, init_a, init_c):
        """Replay the RNN over (T, M, D) with carry resets at dones.

        dones[t] is the done flag RETURNED by env.step at step t, so the
        carry is zeroed after consuming obs[t] — exactly mirroring the
        collection path (actor_critic.reset(dones) in process_env_step,
        ppo.py:157,170)."""
        def step(carry, inp):
            ca, cc = carry
            obs, done = inp
            mean, std, value, ca, cc = self.net.apply(params, obs, obs, ca, cc)
            reset = done[:, None]
            ca = jax.tree.map(lambda c: jnp.where(reset, 0.0, c), ca)
            cc = jax.tree.map(lambda c: jnp.where(reset, 0.0, c), cc)
            return (ca, cc), (mean, std, value)
        _, (mean, std, value) = jax.lax.scan(step, (init_a, init_c),
                                             (obs_seq, dones))
        return mean, std, value

    # ---------------- acting (collection) ----------------
    def act(self, params, obs, obs_history, privileged_obs, base_vel, key):
        """Sample actions + stats (PPO.act, ppo.py:137-155)."""
        k_z, k_a = jax.random.split(key)
        mean, std = self._stats(params, obs, obs_history, privileged_obs, k_z)
        actions = mean + std * jax.random.normal(k_a, mean.shape)
        log_prob = normal_log_prob(mean, std, actions)
        values = self._value(params, obs, privileged_obs, base_vel)
        return dict(actions=actions, log_prob=log_prob, values=values,
                    mu=mean, sigma=std)

    # ---------------- GAE ----------------
    def compute_gae(self, rewards, dones, values, last_values):
        """compute_returns parity (rollout_storage.py:138-152).

        rewards/dones/values: (T, N); last_values: (N,).
        Returns (returns, normalized advantages)."""
        gamma, lam = self.alg.gamma, self.alg.lam

        def body(adv_next, x):
            rew, done, val, next_val = x
            not_terminal = 1.0 - done
            delta = rew + not_terminal * gamma * next_val - val
            adv = delta + not_terminal * gamma * lam * adv_next
            return adv, adv

        next_values = jnp.concatenate([values[1:], last_values[None]], axis=0)
        _, advs = jax.lax.scan(
            body, jnp.zeros_like(last_values),
            (rewards, dones.astype(jnp.float32), values, next_values),
            reverse=True)
        returns = advs + values
        advantages = (advs - advs.mean()) / (advs.std() + 1e-8)
        return returns, advantages

    # ---------------- recurrent update ----------------
    def update_recurrent(self, params, opt_state, learning_rate, batch, key):
        """Recurrent PPO update: minibatch over ENVS, replay the RNN over
        the T axis from the stored rollout-start carry (the TPU-native
        reccurent_mini_batch_generator, rollout_storage.py:217-267)."""
        alg = self.alg
        main_opt, _ = make_optimizers(alg)
        T, N = batch["values"].shape
        nmb = alg.num_mini_batches
        mb_envs = N // nmb
        k_perm, k_upd = jax.random.split(key)
        # a FRESH env permutation per epoch (reccurent_mini_batch_generator
        # draws randperm inside the epoch loop, rollout_storage.py:224)
        idx = jnp.concatenate([
            jax.random.permutation(k, N)[:nmb * mb_envs].reshape(nmb, mb_envs)
            for k in jax.random.split(k_perm, alg.num_learning_epochs)])

        def minibatch_step(carry, xs):
            params, opt_state, lr = carry
            env_idx, k = xs
            # sequences are (T, N, ...); the rollout-start carries are (N, H)
            # (tree-mapped: LSTM carries are (c, h) tuples)
            mb = {k_: jax.tree.map(
                      lambda x: jnp.take(
                          x, env_idx,
                          axis=0 if k_.startswith("init_carry") else 1), v)
                  for k_, v in batch.items()}

            def pol_loss_fn(p):
                mean, std, value = self._replay(
                    p, mb["obs"], mb["dones"],
                    mb["init_carry_a"], mb["init_carry_c"])
                log_prob = normal_log_prob(mean, std, mb["actions"])
                ratio = jnp.exp(log_prob - mb["old_log_prob"])
                adv = mb["advantages"]
                surr = -adv * ratio
                surr_c = -adv * jnp.clip(ratio, 1.0 - alg.clip_param,
                                         1.0 + alg.clip_param)
                surrogate_loss = jnp.mean(jnp.maximum(surr, surr_c))
                v_clipped = mb["values"] + jnp.clip(
                    value - mb["values"], -alg.clip_param, alg.clip_param)
                v_loss = jnp.maximum(jnp.square(value - mb["returns"]),
                                     jnp.square(v_clipped - mb["returns"]))
                value_loss = jnp.mean(v_loss)
                entropy = jnp.mean(normal_entropy(std))
                loss = (surrogate_loss + alg.value_loss_coef * value_loss
                        - alg.entropy_coef * entropy)
                kl = jnp.sum(
                    jnp.log(std / mb["old_sigma"] + 1e-5)
                    + (jnp.square(mb["old_sigma"])
                       + jnp.square(mb["old_mu"] - mean))
                    / (2.0 * jnp.square(std)) - 0.5, axis=-1)
                return loss, (surrogate_loss, value_loss, entropy,
                              jnp.mean(kl))

            (loss, (surr_l, val_l, ent, kl_mean)), grads = \
                jax.value_and_grad(pol_loss_fn, has_aux=True)(params)
            if alg.schedule == "adaptive" and alg.desired_kl is not None:
                lr = jnp.where(kl_mean > alg.desired_kl * 2.0,
                               jnp.maximum(1e-5, lr / 1.5), lr)
                lr = jnp.where((kl_mean < alg.desired_kl / 2.0) & (kl_mean > 0),
                               jnp.minimum(1e-2, lr * 1.5), lr)
            inj = opt_state[1]
            inj = inj._replace(hyperparams={**inj.hyperparams,
                                            "learning_rate": lr})
            opt_state = (opt_state[0], inj)
            updates, opt_state = main_opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            zero = jnp.zeros(())
            stats = dict(value_loss=val_l, surrogate_loss=surr_l, entropy=ent,
                         kl=kl_mean, recons_loss=zero, vel_loss=zero,
                         kld_loss=zero, height_loss=zero, lr=lr)
            return (params, opt_state, lr), stats

        n_steps = idx.shape[0]
        (params, opt_state, learning_rate), stats = jax.lax.scan(
            minibatch_step, (params, opt_state, learning_rate),
            (idx, jax.random.split(k_upd, n_steps)))
        return params, opt_state, learning_rate, jax.tree.map(jnp.mean, stats)

    # ---------------- update ----------------
    def update(self, params, opt_state, vae_opt_state, learning_rate,
               batch: Dict[str, jnp.ndarray], key):
        """5 epochs x 4 minibatches over the flattened (T*N) batch
        (PPO.update, ppo.py:174-357).

        batch fields are (T, N, ...) stacked transitions with keys:
        obs, next_obs, privileged_obs, obs_history, base_vel, actions,
        values, returns, advantages, old_log_prob, old_mu, old_sigma.
        Returns (params, opt_state, vae_opt_state, learning_rate, stats)."""
        alg = self.alg
        main_opt, vae_opt = make_optimizers(alg)
        T, N = batch["values"].shape
        total = T * N
        nmb = alg.num_mini_batches
        mb_size = total // nmb

        k_perm, k_upd = jax.random.split(key)
        # ONE permutation reused across epochs (rollout_storage.py:165
        # draws randperm once outside the epoch loop), applied to the flat
        # batch ONCE — minibatches are then contiguous slices, so the
        # expensive row gather happens 1x per update instead of
        # epochs*minibatches times.  With minibatch_perm_granule G > 1 the
        # permutation runs over groups of G flat-adjacent rows: TPU gathers
        # are issue-bound on tiny rows, so widening each transfer G-fold
        # takes the shuffle from ~12 ms to ~1 ms at 4096 envs (see
        # AlgorithmCfg.minibatch_perm_granule; PARITY.md "Known deviations").
        #
        # The permutation is STRATIFIED into S env-block strata
        # (AlgorithmCfg.shuffle_strata): rows live in an (S, T*N/S)
        # layout, each stratum draws its own group permutation, and every
        # minibatch takes an equal contiguous per-stratum slice.  With
        # the env axis sharded over D | S devices the shuffle gather
        # never crosses a device boundary, so the update runs
        # data-parallel — per-device HLO shows one gradient all-reduce
        # per minibatch step instead of GSPMD all-gathering the whole
        # rollout and replicating the update
        # (tests/test_multichip_scaling.py).  S=1 reproduces the single
        # global permutation exactly.
        import math
        from ..utils.flags import kernel_flag, strict_parity
        want_s = (int(alg.shuffle_strata) if alg.shuffle_strata > 0
                  else max(int(self.n_env_shards), 1))   # 0 = auto
        S = 1 if strict_parity() else math.gcd(want_s, N)
        # per-stratum minibatch slices must be whole: shrink S through the
        # divisors of N until nmb divides the per-stratum row count
        while S > 1 and (total // S) % nmb:
            S -= 1
            while N % S:
                S -= 1
        rows_s = total // S                    # rows per stratum
        mb_s = rows_s // nmb                   # minibatch rows per stratum
        # the configured granule is a CAP: the effective granule is its gcd
        # with the per-stratum minibatch slice so tiny batches stay valid
        G = math.gcd(max(int(alg.minibatch_perm_granule), 1), mb_s)
        # Measured on v5e at 4096 envs (scripts/profile_update_chain.py):
        # G=1 XLA 90.2 ms/update, G=16 XLA 82.8, G=16 Pallas DMA 84.8 —
        # the grouping is the win (wide rows amortize the per-row issue
        # cost) and XLA's gather on 16-row groups already runs at
        # bandwidth, so the Pallas kernel (experimental/pallas_gather.py)
        # stays opt-in for A/B (DTC_PALLAS_GATHER=1; S=1 layout only).
        if S == 1:
            # exact round-4 single-permutation path (same RNG stream, same
            # HLO): flatten (total,), one global group permutation, then
            # view as (1, total) for the unified minibatch slicing below
            flat = jax.tree.map(
                lambda x: x.reshape((total,) + x.shape[2:]), batch)
            perm = jax.random.permutation(k_perm, total // G)
            use_dma = (kernel_flag("DTC_PALLAS_GATHER", "0")
                       and jax.default_backend() != "cpu")
            if use_dma:
                from ..experimental.pallas_gather import permute_groups
                flat = permute_groups(flat, perm, G)
            else:
                flat = jax.tree.map(
                    lambda x: x.reshape((total // G, G) + x.shape[1:])[perm]
                               .reshape((total,) + x.shape[1:]),
                    flat)
            flat = jax.tree.map(lambda x: x[None], flat)   # (1, total, ...)
        else:
            # (S, rows_s, ...): stratum s = env block [s*N/S, (s+1)*N/S)
            # over all T timesteps, flattened time-major like S=1; each
            # stratum draws its own group permutation (device-local under
            # env-axis sharding with D | S)
            flat = jax.tree.map(
                lambda x: x.reshape((T, S, N // S) + x.shape[2:])
                           .swapaxes(0, 1)
                           .reshape((S, rows_s) + x.shape[2:]),
                batch)
            perm = jax.vmap(
                lambda k: jax.random.permutation(k, rows_s // G))(
                jax.random.split(k_perm, S))       # (S, rows_s // G)
            flat = jax.tree.map(
                lambda x: jnp.take_along_axis(
                    x.reshape((S, rows_s // G, G) + x.shape[2:]),
                    perm.reshape((S, rows_s // G)
                                 + (1,) * (x.ndim - 1)),
                    axis=1).reshape((S, rows_s) + x.shape[2:]),
                flat)
        offsets = jnp.tile(jnp.arange(nmb) * mb_s,
                           alg.num_learning_epochs)

        def pol_terms(mean, std, value, mb):
            """Surrogate/value/entropy/KL pieces shared by the sequential
            and fused paths (ppo.py:265-335)."""
            log_prob = normal_log_prob(mean, std, mb["actions"])
            ratio = jnp.exp(log_prob - mb["old_log_prob"])
            adv = mb["advantages"]
            surr = -adv * ratio
            surr_clipped = -adv * jnp.clip(ratio, 1.0 - alg.clip_param,
                                           1.0 + alg.clip_param)
            surrogate_loss = jnp.mean(jnp.maximum(surr, surr_clipped))
            if alg.use_clipped_value_loss:                # ppo.py:318-323
                v_clipped = mb["values"] + jnp.clip(
                    value - mb["values"], -alg.clip_param, alg.clip_param)
                v_loss = jnp.maximum(jnp.square(value - mb["returns"]),
                                     jnp.square(v_clipped - mb["returns"]))
                value_loss = jnp.mean(v_loss)
            else:
                value_loss = jnp.mean(jnp.square(mb["returns"] - value))
            entropy = jnp.mean(normal_entropy(std))
            loss = (surrogate_loss + alg.value_loss_coef * value_loss
                    - alg.entropy_coef * entropy)
            # adaptive-KL statistic (ppo.py:295-299)
            kl = jnp.sum(
                jnp.log(std / mb["old_sigma"] + 1e-5)
                + (jnp.square(mb["old_sigma"])
                   + jnp.square(mb["old_mu"] - mean))
                / (2.0 * jnp.square(std)) - 0.5, axis=-1)
            return loss, surrogate_loss, value_loss, entropy, jnp.mean(kl)

        dis = self.disable    # elimination-profiling hooks, () in prod

        def minibatch_step(carry, xs):
            params, opt_state, vae_opt_state, lr = carry
            start, k = xs
            # equal per-stratum slices, merged over the stratum axis into
            # the (mb_size, ...) minibatch (S=1: a plain contiguous slice)
            mb = jax.tree.map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, start, mb_s, 1)
                             .reshape((mb_size,) + x.shape[2:]),
                flat)
            k_vae, k_pol = jax.random.split(k)

            def stats_or_stub(p):
                if "actor" in dis:
                    return mb["old_mu"], mb["old_sigma"]
                return self._stats(p, mb["obs"], mb["obs_history"],
                                   mb["privileged_obs"], k_pol)

            def value_or_stub(p):
                if "critic" in dis:
                    return mb["values"]
                return self._value(p, mb["obs"], mb["privileged_obs"],
                                   mb["base_vel"])

            if (self.policy_kind == "decoder" and alg.fused_joint_step
                    and "vae" not in dis):
                # ---- fused VAE+policy step: both losses differentiated at
                # the SAME params (no mid-minibatch VAE refresh — the
                # documented deviation, PARITY.md), as two value_and_grad
                # calls.  Two separate grad calls beat one two-cotangent
                # vjp: a vjp seeded (1,0)/(0,1) runs the FULL joint
                # backward twice (the zero cotangent is a runtime value,
                # so XLA can't prune the other head's subgraph), while two
                # grads each sweep only their own head and XLA CSEs the
                # shared encoder forward (cenet_stats + terrain encoder)
                # between them — ~8% fewer MACs than the sequential path.
                def vae_loss_fn(p):
                    recons, vel, kld, height = self.net.apply(
                        p, mb["obs_history"], mb["privileged_obs"],
                        mb["next_obs"], mb["base_vel"], k_vae,
                        method=self.net.vae_losses)
                    loss = recons + vel + alg.kld_weight * kld + height
                    if alg.belief_loss_coef > 0.0:
                        # belief distillation (config.py belief_loss_coef;
                        # trace-time gate keeps the default HLO unchanged)
                        loss = loss + alg.belief_loss_coef * self.net.apply(
                            p, mb["obs_history"], mb["privileged_obs"],
                            method=self.net.belief_loss)
                    return loss, (recons, vel, kld, height)

                def pol_loss_fn(p):
                    mean, std = stats_or_stub(p)
                    value = value_or_stub(p)
                    loss, surr_l, val_l, ent, kl_mean = pol_terms(
                        mean, std, value, mb)
                    return loss, (surr_l, val_l, ent, kl_mean)

                (_, (recons_l, vel_l, kld_l, height_l)), vae_grads = \
                    jax.value_and_grad(vae_loss_fn, has_aux=True)(params)
                (loss, (surr_l, val_l, ent, kl_mean)), grads = \
                    jax.value_and_grad(pol_loss_fn, has_aux=True)(params)
                if "opt" not in dis:
                    vae_updates, vae_opt_state = vae_opt.update(
                        vae_grads, vae_opt_state, params)
                    params = optax.apply_updates(params,
                                                 mask_non_vae(vae_updates))
            else:
                if self.policy_kind == "decoder" and "vae" not in dis:
                    # ---- VAE step (ppo.py:197-254)
                    def vae_loss_fn(p):
                        recons, vel, kld, height = self.net.apply(
                            p, mb["obs_history"], mb["privileged_obs"],
                            mb["next_obs"], mb["base_vel"], k_vae,
                            method=self.net.vae_losses)
                        loss = recons + vel + alg.kld_weight * kld + height
                        if alg.belief_loss_coef > 0.0:
                            loss = (loss + alg.belief_loss_coef
                                    * self.net.apply(
                                        p, mb["obs_history"],
                                        mb["privileged_obs"],
                                        method=self.net.belief_loss))
                        return loss, (recons, vel, kld, height)

                    (vae_loss, (recons_l, vel_l, kld_l, height_l)), \
                        vae_grads = jax.value_and_grad(
                            vae_loss_fn, has_aux=True)(params)
                    if "opt" not in dis:
                        vae_updates, vae_opt_state = vae_opt.update(
                            vae_grads, vae_opt_state, params)
                        # only vae-subtree grads are nonzero; apply directly
                        params = optax.apply_updates(
                            params, mask_non_vae(vae_updates))
                else:
                    zero = jnp.zeros(())
                    recons_l = vel_l = kld_l = height_l = zero

                # ---- policy step (ppo.py:265-335)
                def pol_loss_fn(p):
                    mean, std = stats_or_stub(p)
                    value = value_or_stub(p)
                    loss, surr_l, val_l, ent, kl_mean = pol_terms(
                        mean, std, value, mb)
                    return loss, (surr_l, val_l, ent, kl_mean)

                (loss, (surr_l, val_l, ent, kl_mean)), grads = \
                    jax.value_and_grad(pol_loss_fn, has_aux=True)(params)

            # adaptive learning rate (ppo.py:300-307)
            if alg.schedule == "adaptive" and alg.desired_kl is not None:
                lr = jnp.where(kl_mean > alg.desired_kl * 2.0,
                               jnp.maximum(1e-5, lr / 1.5), lr)
                lr = jnp.where((kl_mean < alg.desired_kl / 2.0) & (kl_mean > 0),
                               jnp.minimum(1e-2, lr * 1.5), lr)
            if "opt" not in dis:
                inj = opt_state[1]
                inj = inj._replace(hyperparams={**inj.hyperparams,
                                                "learning_rate": lr})
                opt_state = (opt_state[0], inj)
                updates, opt_state = main_opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            else:
                # keep the carry dependent on the grads so XLA can't DCE
                # the backward pass itself when only the optimizer is out
                lr = lr + 0.0 * sum(jnp.sum(g.astype(jnp.float32))
                                    for g in jax.tree.leaves(grads))

            stats = dict(value_loss=val_l, surrogate_loss=surr_l,
                         entropy=ent, kl=kl_mean, recons_loss=recons_l,
                         vel_loss=vel_l, kld_loss=kld_l, height_loss=height_l,
                         lr=lr)
            return (params, opt_state, vae_opt_state, lr), stats

        n_steps = offsets.shape[0]
        (params, opt_state, vae_opt_state, learning_rate), stats = \
            jax.lax.scan(minibatch_step,
                         (params, opt_state, vae_opt_state, learning_rate),
                         (offsets, jax.random.split(k_upd, n_steps)))
        mean_stats = jax.tree.map(jnp.mean, stats)
        return params, opt_state, vae_opt_state, learning_rate, mean_stats


def mask_non_vae(updates):
    """Zero every update outside the vae subtree (the VAE optimizer of
    ppo.py:79 steps only actor_critic.vae parameters)."""
    def mask(path, leaf):
        keep = any(getattr(p, "key", None) == "vae" for p in path)
        return leaf if keep else jnp.zeros_like(leaf)
    return jax.tree_util.tree_map_with_path(mask, updates)
