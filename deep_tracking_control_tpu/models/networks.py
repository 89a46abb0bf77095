"""Actor-critic networks (flax.linen) — ActorCriticDecoder family.

Capability parity with rsl_rl/modules/actor_critic_decoder.py (the live
teacher path) plus the baseline ActorCritic / ActorCriticRecurrent
(actor_critic.py:38, actor_critic_recurrent.py:40).

Architecture (dims from AC_Args, actor_critic_decoder.py:36-88,118-119):
  Vae:
    cenet_encoder  265 -> 128 -> 64            (ReLU)
    latent_mu      64 -> 19  (3 vel + 16 z mean)
    latent_var     64 -> 16  (log-variance)
    cenet_decoder  (16+3+512) -> 64 -> 128 -> 53
    terrain_encoder 693 -> 512 -> 512 -> 512
    terrain_decoder 512 -> 512 -> 512 -> 693
    memory_mlp     (265+512) -> 256 -> 128 -> 512
  actor_body  (53+16+3+512) -> 512 -> 256 -> 128 -> 12   (ELU)
  critic_body (53+3+3+693)=752 -> 512 -> 256 -> 128 -> 1 (ELU)
  learned global std (12,), init 1.0 (:364)

Weight init follows the reference: default (lecun-ish) for each stack's first
Linear, orthogonal(gain 0.01) for the rest (layer_init, :268-272).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _activation(name: str):
    return {"elu": nn.elu, "relu": nn.relu, "selu": nn.selu,
            "crelu": nn.relu, "lrelu": nn.leaky_relu, "tanh": nn.tanh,
            "sigmoid": nn.sigmoid}[name]


class MLP(nn.Module):
    """Stack with reference init: first layer default, rest orthogonal(0.01).

    `dtype` is the COMPUTE dtype (TPU-first default bfloat16: 4x MXU rate);
    parameters stay float32 and the output is cast back to float32 so all
    PPO/loss math stays full precision."""
    hidden: Sequence[int]
    out: int
    act: str = "relu"
    final_act: bool = False
    dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x):
        act = _activation(self.act)
        cdt = jnp.dtype(self.dtype)
        x = x.astype(cdt)
        dims = list(self.hidden) + [self.out]
        for i, d in enumerate(dims):
            if i == 0:
                x = nn.Dense(d, dtype=cdt)(x)
            else:
                x = nn.Dense(d, dtype=cdt,
                             kernel_init=nn.initializers.orthogonal(0.01))(x)
            if i < len(dims) - 1 or self.final_act:
                x = act(x)
        return x.astype(jnp.float32)


def _bf16_concat(*parts):
    """Concatenate MLP inputs in bfloat16.

    Every MLP's first Dense casts its input to bf16 anyway, so casting the
    parts BEFORE the concat feeds the matmul bit-identical values while
    halving the materialized concat buffer and skipping the f32 upcast of
    already-bf16 fields (privileged_obs slices arrive bf16 from rollout
    storage) — pure HBM-traffic savings, no numeric change."""
    return jnp.concatenate([p.astype(jnp.bfloat16) for p in parts],
                           axis=-1)


_MEDIAN_WAYS = 15        # thresholds per bisection pass
_MEDIAN_PASSES = 10      # collapse uint32: ceil(log_15 2^32) + 1 pinning pass


def masked_median(x, valid):
    """Exact median of ``x[valid]`` — the lower middle element for even
    counts, matching ``torch.Tensor.median`` — without a TPU sort.

    Multiway bisection over the monotonic uint32 image of float32: each
    pass counts keys below W evenly spaced thresholds of the current
    range in one (W, n) compare+reduce (full-lane VPU work), narrowing
    the range ~W x, so 10 passes at W=15 pin the k-th smallest key
    exactly (vs 32 passes for binary bisection).  W=15 is the measured
    sweet spot: per-pass cost on v5e fits ~(19 + 0.7*W) us at n=24576
    (a fixed dependent-reduction latency plus (W, n) traffic), so the
    wider W=1023 / 5-pass variant measured 2 ms/call vs 0.16 — pass
    count and per-pass work trade off, and 15 ways balances them.
    Overflow note: s*(W-1) <= r - r/W + W - 1 < 2^32 for r >= W^2, and
    < W^2 otherwise, so the threshold products never wrap uint32.  A
    final masked max over the equal elements reconnects the gradient to
    the selected element, mirroring torch's ``t[outliers] = median``
    assignment semantics (actor_critic_decoder.py:293-299)."""
    W = _MEDIAN_WAYS
    flat = x.reshape(-1).astype(jnp.float32)
    v = valid.reshape(-1)
    bits = jax.lax.bitcast_convert_type(flat, jnp.int32)
    # order-preserving f32 -> uint32: flip sign bit for positives, all
    # bits for negatives (standard radix-sort key transform)
    key = jnp.where(bits < 0, ~bits,
                    bits ^ jnp.int32(-2**31)).astype(jnp.uint32)
    n = jnp.sum(v)
    k = (n + 1) // 2                         # 1-based lower-middle rank
    jw = jnp.arange(W, dtype=jnp.uint32)

    def body(_, lh):
        lo, hi = lh                          # invariant: kth key in [lo, hi]
        s = (hi - lo) // W + 1
        # t[0] = lo; capped at hi so no uint32 wrap (see overflow note)
        t = lo + jnp.minimum(s * jw, hi - lo)
        c = jnp.sum(v[None, :] & (key[None, :] <= t[:, None]), axis=1)
        ge = c >= k                          # monotone in j
        idx = jnp.argmax(ge)                 # first satisfied threshold
        anyg = ge[W - 1]                     # monotone -> any == last
        # ge[0]:   kth == lo               -> [lo, lo]
        # first j: kth in (t[j-1], t[j]]   -> [t[j-1]+1, t[j]]
        # none:    kth in (t[W-1], hi]     -> [t[W-1]+1, hi]  (t[W-1] < hi)
        lo2 = jnp.where(anyg,
                        jnp.where(idx == 0, lo,
                                  t[jnp.maximum(idx, 1) - 1] + 1),
                        t[W - 1] + 1)
        hi2 = jnp.where(anyg, t[idx], hi)
        return lo2, hi2

    lo, _ = jax.lax.fori_loop(
        0, _MEDIAN_PASSES, body, (jnp.uint32(0), jnp.uint32(2**32 - 1)))
    ib = lo.astype(jnp.int32)
    med_bits = jnp.where(ib < 0, ib ^ jnp.int32(-2**31), ~ib)
    med = jax.lax.bitcast_convert_type(med_bits, jnp.float32)
    # differentiable reconnection: max over the (valid) elements equal to
    # the median value — grads flow to one selected element, like torch
    sel = v & (flat == jax.lax.stop_gradient(med))
    return jnp.max(jnp.where(sel, flat, -jnp.inf))


class Vae(nn.Module):
    """CE-net + terrain autoencoder + belief memory MLP (Vae, :91-303)."""
    num_obs: int = 53
    obs_history_dim: int = 265
    terrain_dim: int = 693
    terrain_latent: int = 512
    z_dim: int = 16
    # latent_var outlier filter: "median" = exact reference semantics
    # (median of the non-outliers via masked_median); "mean" = masked mean
    # of the non-outliers (round-1/2 cheap approximation, kept as fallback)
    outlier_filter: str = "median"

    def setup(self):
        self.cenet_encoder = MLP(hidden=(128,), out=64, act="relu",
                                 name="cenet_encoder")
        self.latent_mu = nn.Dense(3 + self.z_dim, name="latent_mu",
                                  kernel_init=nn.initializers.orthogonal(0.01))
        self.latent_var = nn.Dense(self.z_dim, name="latent_var",
                                   kernel_init=nn.initializers.orthogonal(0.01))
        self.cenet_decoder = MLP(hidden=(64, 128), out=self.num_obs,
                                 act="relu", name="cenet_decoder")
        self.terrain_encoder = MLP(hidden=(512, 512), out=self.terrain_latent,
                                   act="relu", name="terrain_encoder")
        self.terrain_decoder = MLP(hidden=(512, 512), out=self.terrain_dim,
                                   act="relu", name="terrain_decoder")
        self.memory_mlp = MLP(hidden=(256, 128), out=self.terrain_latent,
                              act="relu", name="memory_mlp")

    def __call__(self, obs_history, rng):
        return self.cenet_forward(obs_history, rng)

    def cenet_forward(self, obs_history, rng):
        """(mu(19), logvar(16), z(16)) with the latent_var outlier->median
        filter (:286-302)."""
        mu, logvar = self.cenet_stats(obs_history)
        z = self.reparam(mu, logvar, rng)
        return mu, logvar, z

    def cenet_stats(self, obs_history):
        """Deterministic encoder half of cenet_forward: (mu, filtered
        logvar) without the reparameterized sample, so a joint VAE+policy
        forward can run the encoder (and the outlier filter) ONCE and draw
        two independent z samples from the shared stats."""
        e = self.cenet_encoder(obs_history)
        mu = self.latent_mu(e)
        logvar = self.latent_var(e)
        # outlier handling (:293-299): replace >2-sigma entries (over the
        # whole batch) with the median of the non-outliers.  "median" runs
        # the exact reference semantics via the sort-free masked_median;
        # "mean" is the cheap masked-mean approximation (within 2 sigma of
        # the median by construction; the filter only fires on rare
        # >2-sigma entries).
        m = jnp.mean(logvar)
        s = jnp.std(logvar)
        outliers = jnp.abs(logvar - m) > 2.0 * s
        valid = ~outliers
        if self.outlier_filter == "median":
            center = masked_median(logvar, valid)
        else:
            center = (jnp.sum(jnp.where(valid, logvar, 0.0))
                      / jnp.maximum(jnp.sum(valid), 1))
        logvar = jnp.where(outliers, center, logvar)
        return mu, logvar

    def reparam(self, mu, logvar, rng):
        """Reparameterized sample z ~ N(mu[3:], exp(logvar)) (:274-284)."""
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, std.shape, dtype=std.dtype)
        return mu[..., 3:] + eps * std

    def encode_terrain(self, heights):
        return self.terrain_encoder(heights)

    def decode_terrain(self, l_t):
        return self.terrain_decoder(l_t)

    def decode_cenet(self, z, vel, l_t):
        return self.cenet_decoder(_bf16_concat(z, vel, l_t))

    def belief(self, obs_history, l_t):
        """Teacher-inference belief (act_teacher, :516-518)."""
        b_t1 = self.memory_mlp(_bf16_concat(obs_history, l_t))
        return b_t1 + l_t * b_t1


class ActorCriticDecoder(nn.Module):
    """The DTC teacher actor-critic (ActorCriticDecoder, :305-563)."""
    num_obs: int = 53
    num_privileged_obs: int = 1389
    num_actions: int = 12
    obs_history_dim: int = 265
    terrain_dim: int = 693
    terrain_latent: int = 512
    z_dim: int = 16
    actor_hidden: Sequence[int] = (512, 256, 128)
    critic_hidden: Sequence[int] = (512, 256, 128)
    activation: str = "elu"
    init_noise_std: float = 1.0
    is_recurrent: bool = False
    outlier_filter: str = "median"

    def setup(self):
        self.vae = Vae(num_obs=self.num_obs,
                       obs_history_dim=self.obs_history_dim,
                       terrain_dim=self.terrain_dim,
                       terrain_latent=self.terrain_latent, z_dim=self.z_dim,
                       outlier_filter=self.outlier_filter)
        self.actor_body = MLP(hidden=self.actor_hidden, out=self.num_actions,
                              act=self.activation, name="actor_body")
        self.critic_body = MLP(hidden=self.critic_hidden, out=1,
                               act=self.activation, name="critic_body")
        self.std = self.param(
            "std", lambda key, shape: self.init_noise_std * jnp.ones(shape),
            (self.num_actions,))

    def __call__(self, obs, obs_history, privileged_obs, base_vel, rng):
        """Init/inspection: exercises EVERY submodule so flax creates all
        parameters (actor, critic, both VAE decoders, belief memory)."""
        mean, _, _, l_t = self.act_stats(obs, obs_history, privileged_obs, rng)
        value = self.evaluate(obs, privileged_obs, base_vel)
        losses = self.vae_losses(obs_history, privileged_obs, obs, base_vel, rng)
        _ = self.vae.belief(obs_history, l_t)
        return mean, value, losses

    def act_stats(self, obs, obs_history, privileged_obs, rng):
        """Training-path distribution stats (update_distribution, :409-437).

        Returns (mean, std, (mu, logvar, z)) with l_t fed raw to the actor.
        """
        mu, logvar, z = self.vae.cenet_forward(obs_history, rng)
        l_t = self.vae.encode_terrain(privileged_obs[..., :self.terrain_dim])
        mean = self.actor_body(_bf16_concat(
            obs, z, mu[..., :3], l_t))                   # :431
        std = jnp.broadcast_to(self.std, mean.shape)
        return mean, std, (mu, logvar, z), l_t

    def act_teacher(self, obs, obs_history, privileged_obs):
        """Deterministic teacher policy for eval/deployment (:504-538):
        uses latent mu (no sampling) and the belief-encoder path.

        REFERENCE QUIRK reproduced faithfully: training optimizes the
        actor with RAW l_t in the last input slot (update_distribution
        :431) but act_teacher substitutes b_t = b_t1 + l_t*b_t1 from the
        belief memory_mlp — whose parameters receive gradients from
        NEITHER optimizer (no loss touches vae.belief), so b_t is a
        random small-scale feature of (hist, l_t).  How robust a trained
        policy is to this l_t -> b_t swap varies run to run; use
        act_deterministic for the training-consistent input layout."""
        e = self.vae.cenet_encoder(obs_history)
        latent = self.vae.latent_mu(e)
        l_t = self.vae.encode_terrain(privileged_obs[..., :self.terrain_dim])
        b_t = self.vae.belief(obs_history, l_t)
        return self.actor_body(_bf16_concat(
            obs, latent[..., 3:], latent[..., :3], b_t))             # :520

    def act_deterministic(self, obs, obs_history, privileged_obs):
        """Deterministic actor on the TRAINING input layout: latent means
        (no reparameterized sample) + RAW l_t — exactly the feature
        layout update_distribution (:431) optimizes, minus the sampling
        noise.  No reference analog (the reference evaluates only via
        act_teacher's belief substitution, see above)."""
        e = self.vae.cenet_encoder(obs_history)
        latent = self.vae.latent_mu(e)
        l_t = self.vae.encode_terrain(privileged_obs[..., :self.terrain_dim])
        return self.actor_body(_bf16_concat(
            obs, latent[..., 3:], latent[..., :3], l_t))

    def evaluate(self, obs, privileged_obs, base_vel):
        """Critic (evaluate, :540-551): [obs, base_vel, force(3), clean
        heights(693)] = 752."""
        td = self.terrain_dim
        x = _bf16_concat(obs, base_vel,
                         privileged_obs[..., td:td + 3],
                         privileged_obs[..., td + 3:])
        return self.critic_body(x)[..., 0]

    def vae_losses(self, obs_history, privileged_obs, next_obs, base_vel, rng):
        """VAE training pieces (ppo.py:197-247)."""
        td = self.terrain_dim
        mu, logvar, z = self.vae.cenet_forward(obs_history, rng)
        l_t = self.vae.encode_terrain(privileged_obs[..., :td])
        recons = self.vae.decode_cenet(z, mu[..., :3], l_t)
        recons_loss = jnp.mean(jnp.mean(jnp.square(recons - next_obs), axis=-1))
        height_recon = self.vae.decode_terrain(l_t)
        height_loss = jnp.mean(jnp.square(height_recon
                                          - privileged_obs[..., td + 3:]))
        vel_loss = jnp.mean(jnp.square(mu[..., :3] - base_vel))
        kld = jnp.mean(-0.5 * jnp.sum(
            1 + logvar - jnp.square(mu[..., 3:]) - jnp.exp(logvar), axis=-1))
        return recons_loss, vel_loss, kld, height_loss

    def belief_loss(self, obs_history, privileged_obs):
        """Belief-distillation loss (AlgorithmCfg.belief_loss_coef; no
        reference analog): train vae.memory_mlp so the deployment-path
        belief b_t reconstructs the terrain latent the actor was trained
        on.  l_t is stop-gradiented as both input and target, so only the
        memory_mlp moves — the terrain encoder keeps its reference
        training signal."""
        l_t = jax.lax.stop_gradient(
            self.vae.encode_terrain(privileged_obs[..., :self.terrain_dim]))
        b_t = self.vae.belief(obs_history, l_t)
        return jnp.mean(jnp.square(b_t - l_t))

    def joint_forward(self, obs, obs_history, privileged_obs, next_obs,
                      base_vel, k_vae, k_pol):
        """One shared forward for the fused VAE+policy minibatch step
        (AlgorithmCfg.fused_joint_step; PARITY.md "Known deviations").

        The sequential reference update (ppo.py:197-254 then :265) runs
        cenet_forward + encode_terrain TWICE per minibatch — once inside
        the VAE loss, once inside update_distribution — with a VAE
        optimizer step in between.  Here both heads read ONE encoder
        forward (and one outlier-filter pass); the VAE and policy losses
        still get independent z draws (k_vae / k_pol), matching the
        reference's two reparameterized samples.

        Returns (vae_parts, mean, std, value) where vae_parts =
        (recons_loss, vel_loss, kld, height_loss)."""
        td = self.terrain_dim
        mu, logvar = self.vae.cenet_stats(obs_history)
        l_t = self.vae.encode_terrain(privileged_obs[..., :td])
        # ---- VAE head (vae_losses)
        z_v = self.vae.reparam(mu, logvar, k_vae)
        recons = self.vae.decode_cenet(z_v, mu[..., :3], l_t)
        recons_loss = jnp.mean(jnp.mean(jnp.square(recons - next_obs),
                                        axis=-1))
        height_recon = self.vae.decode_terrain(l_t)
        height_loss = jnp.mean(jnp.square(height_recon
                                          - privileged_obs[..., td + 3:]))
        vel_loss = jnp.mean(jnp.square(mu[..., :3] - base_vel))
        kld = jnp.mean(-0.5 * jnp.sum(
            1 + logvar - jnp.square(mu[..., 3:]) - jnp.exp(logvar), axis=-1))
        # ---- policy head (act_stats, :431)
        z_p = self.vae.reparam(mu, logvar, k_pol)
        mean = self.actor_body(_bf16_concat(obs, z_p, mu[..., :3], l_t))
        std = jnp.broadcast_to(self.std, mean.shape)
        value = self.evaluate(obs, privileged_obs, base_vel)
        return (recons_loss, vel_loss, kld, height_loss), mean, std, value


class ActorCritic(nn.Module):
    """Baseline MLP actor-critic (actor_critic.py:38-155)."""
    num_obs: int = 53
    num_critic_obs: int = 53
    num_actions: int = 12
    actor_hidden: Sequence[int] = (512, 256, 128)
    critic_hidden: Sequence[int] = (512, 256, 128)
    activation: str = "elu"
    init_noise_std: float = 1.0

    def setup(self):
        self.actor = MLP(hidden=self.actor_hidden, out=self.num_actions,
                         act=self.activation)
        self.critic = MLP(hidden=self.critic_hidden, out=1,
                          act=self.activation)
        self.std = self.param(
            "std", lambda key, shape: self.init_noise_std * jnp.ones(shape),
            (self.num_actions,))

    def __call__(self, obs, critic_obs):
        mean = self.actor(obs)
        value = self.critic(critic_obs)[..., 0]
        return mean, jnp.broadcast_to(self.std, mean.shape), value


class Memory(nn.Module):
    """GRU/LSTM memory (Memory, actor_critic_decoder.py:584-614)."""
    hidden_size: int = 256
    rnn_type: str = "gru"

    @nn.compact
    def __call__(self, x, carry):
        if self.rnn_type == "gru":
            cell = nn.GRUCell(features=self.hidden_size)
        else:
            cell = nn.OptimizedLSTMCell(features=self.hidden_size)
        carry, out = cell(carry, x)
        return carry, out

    def initialize_carry(self, rng, batch_dims):
        if self.rnn_type == "gru":
            return nn.GRUCell(features=self.hidden_size).initialize_carry(
                rng, batch_dims + (self.hidden_size,))
        return nn.OptimizedLSTMCell(features=self.hidden_size).initialize_carry(
            rng, batch_dims + (self.hidden_size,))


class ActorCriticRecurrent(nn.Module):
    """RNN actor-critic (actor_critic_recurrent.py:40-115): obs -> RNN ->
    MLP heads; carries (actor, critic) hidden states."""
    num_obs: int = 53
    num_critic_obs: int = 53
    num_actions: int = 12
    rnn_hidden_size: int = 256
    rnn_type: str = "gru"
    actor_hidden: Sequence[int] = (512, 256, 128)
    critic_hidden: Sequence[int] = (512, 256, 128)
    activation: str = "elu"
    init_noise_std: float = 1.0

    def setup(self):
        self.memory_a = Memory(hidden_size=self.rnn_hidden_size,
                               rnn_type=self.rnn_type)
        self.memory_c = Memory(hidden_size=self.rnn_hidden_size,
                               rnn_type=self.rnn_type)
        self.actor = MLP(hidden=self.actor_hidden, out=self.num_actions,
                         act=self.activation)
        self.critic = MLP(hidden=self.critic_hidden, out=1,
                          act=self.activation)
        self.std = self.param(
            "std", lambda key, shape: self.init_noise_std * jnp.ones(shape),
            (self.num_actions,))

    def __call__(self, obs, critic_obs, carry_a, carry_c):
        carry_a, ha = self.memory_a(obs, carry_a)
        carry_c, hc = self.memory_c(critic_obs, carry_c)
        mean = self.actor(ha)
        value = self.critic(hc)[..., 0]
        return mean, jnp.broadcast_to(self.std, mean.shape), value, carry_a, carry_c
