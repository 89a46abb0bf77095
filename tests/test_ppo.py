"""PPO numerics: GAE vs numpy reference, log-prob vs scipy, update smoke."""
import numpy as np
import pytest
import scipy.stats

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.agent.ppo import (PPO, make_optimizers,
                                                 normal_entropy,
                                                 normal_log_prob)
from deep_tracking_control_tpu.env.config import AlgorithmCfg
from deep_tracking_control_tpu.models.networks import ActorCriticDecoder


def test_normal_log_prob_matches_scipy():
    rng = np.random.default_rng(0)
    mean = rng.normal(size=(5, 12))
    std = np.abs(rng.normal(size=(12,))) + 0.1
    x = rng.normal(size=(5, 12))
    got = np.asarray(normal_log_prob(jnp.asarray(mean),
                                     jnp.asarray(np.broadcast_to(std, mean.shape)),
                                     jnp.asarray(x)))
    want = scipy.stats.norm(mean, std).logpdf(x).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    ent = np.asarray(normal_entropy(jnp.asarray(np.broadcast_to(std, mean.shape))))
    np.testing.assert_allclose(ent, scipy.stats.norm(0, std).entropy().sum(),
                               rtol=1e-5)


def _gae_numpy(rewards, dones, values, last_values, gamma, lam):
    """Literal port of compute_returns (rollout_storage.py:138-152)."""
    T, N = rewards.shape
    returns = np.zeros_like(rewards)
    advantage = np.zeros(N)
    for step in reversed(range(T)):
        next_values = last_values if step == T - 1 else values[step + 1]
        not_terminal = 1.0 - dones[step]
        delta = rewards[step] + not_terminal * gamma * next_values - values[step]
        advantage = delta + not_terminal * gamma * lam * advantage
        returns[step] = advantage + values[step]
    advs = returns - values
    advs = (advs - advs.mean()) / (advs.std() + 1e-8)
    return returns, advs


@pytest.mark.smoke
def test_gae_matches_reference_numpy():
    rng = np.random.default_rng(0)
    T, N = 24, 16
    rewards = rng.normal(size=(T, N)).astype(np.float32)
    dones = (rng.random((T, N)) < 0.1).astype(np.float32)
    values = rng.normal(size=(T, N)).astype(np.float32)
    last_values = rng.normal(size=(N,)).astype(np.float32)
    alg = AlgorithmCfg()
    ppo = PPO(net=None, alg=alg)
    ret, adv = ppo.compute_gae(jnp.asarray(rewards), jnp.asarray(dones),
                               jnp.asarray(values), jnp.asarray(last_values))
    ret_np, adv_np = _gae_numpy(rewards, dones, values, last_values,
                                alg.gamma, alg.lam)
    np.testing.assert_allclose(np.asarray(ret), ret_np, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(adv), adv_np, rtol=2e-3, atol=2e-4)


def _tiny_net_and_batch(T=8, N=4):
    net = ActorCriticDecoder(num_obs=53, num_privileged_obs=1389,
                             num_actions=12, obs_history_dim=265,
                             terrain_dim=693, terrain_latent=32,
                             actor_hidden=(32,), critic_hidden=(32,))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((1, 53)), jnp.zeros((1, 265)),
                      jnp.zeros((1, 1389)), jnp.zeros((1, 3)),
                      jax.random.PRNGKey(1))
    batch = dict(
        obs=rng.normal(size=(T, N, 53)),
        next_obs=rng.normal(size=(T, N, 53)),
        privileged_obs=rng.normal(size=(T, N, 1389)),
        obs_history=rng.normal(size=(T, N, 265)),
        base_vel=rng.normal(size=(T, N, 3)),
        actions=rng.normal(size=(T, N, 12)),
        values=rng.normal(size=(T, N)),
        returns=rng.normal(size=(T, N)),
        advantages=rng.normal(size=(T, N)),
        old_log_prob=rng.normal(size=(T, N)),
        old_mu=rng.normal(size=(T, N, 12)) * 0.1,
        old_sigma=np.ones((T, N, 12)),
    )
    batch = {k: jnp.asarray(v, dtype=jnp.float32) for k, v in batch.items()}
    return net, params, batch


@pytest.mark.smoke
def test_update_changes_params_and_adapts_lr():
    net, params, batch = _tiny_net_and_batch()
    alg = AlgorithmCfg(num_learning_epochs=2, num_mini_batches=2)
    ppo = PPO(net=net, alg=alg)
    main_opt, vae_opt = make_optimizers(alg)
    opt_state = main_opt.init(params)
    vae_opt_state = vae_opt.init(params)
    lr = jnp.asarray(alg.learning_rate)
    new_params, _, _, new_lr, stats = jax.jit(ppo.update)(
        params, opt_state, vae_opt_state, lr, batch, jax.random.PRNGKey(2))
    diff = max(float(jnp.max(jnp.abs(a - b))) for a, b in
               zip(jax.tree.leaves(params), jax.tree.leaves(new_params)))
    assert diff > 0 and np.isfinite(diff)
    # adaptive LR stays in the reference clamp band (ppo.py:302-304)
    assert 1e-5 <= float(new_lr) <= 1e-2
    for k in ("value_loss", "surrogate_loss", "recons_loss", "vel_loss",
              "kld_loss", "height_loss", "kl"):
        assert np.isfinite(float(stats[k])), k


def test_update_disable_hooks():
    """PPO.disable elimination-profiling hooks: every variant traces and
    produces finite stats; full elimination keeps params unchanged."""
    net, params, batch = _tiny_net_and_batch(T=2, N=4)
    alg = AlgorithmCfg(num_learning_epochs=1, num_mini_batches=2,
                       fused_joint_step=True)
    main_opt, vae_opt = make_optimizers(alg)
    opt_state = main_opt.init(params)
    vae_opt_state = vae_opt.init(params)
    lr = jnp.asarray(alg.learning_rate)
    for dis in [("vae",), ("actor",), ("critic",), ("opt",),
                ("vae", "actor", "critic", "opt")]:
        ppo = PPO(net=net, alg=alg, disable=dis)
        new_params, _, _, _, stats = jax.jit(ppo.update)(
            params, opt_state, vae_opt_state, lr, batch,
            jax.random.PRNGKey(2))
        assert all(np.isfinite(float(v)) for v in stats.values()), dis
        if "opt" in dis:
            for a, b in zip(jax.tree.leaves(params),
                            jax.tree.leaves(new_params)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.smoke
def test_shuffle_strata_partition_invariance():
    """Stratified shuffle (AlgorithmCfg.shuffle_strata): with ONE
    minibatch per epoch the partition is trivial — every row lands in the
    single minibatch whatever S is — and all loss terms are means over
    rows, so the RNG-free part of the update (critic path; the VAE/actor
    reparam draws pair noise with POSITIONS, not row identities, so they
    are stubbed via the elimination hooks) must agree across S up to
    reduction order.  This pins the stratified layout/gather math to the
    S=1 (reference-exact) path."""
    net, params, batch = _tiny_net_and_batch(T=8, N=4)
    outs = []
    for strata in (1, 4):
        alg = AlgorithmCfg(num_learning_epochs=2, num_mini_batches=1,
                           shuffle_strata=strata, fused_joint_step=False)
        ppo = PPO(net=net, alg=alg, disable=("vae", "actor"))
        main_opt, vae_opt = make_optimizers(alg)
        outs.append(jax.jit(ppo.update)(
            params, main_opt.init(params), vae_opt.init(params),
            jnp.asarray(alg.learning_rate), batch, jax.random.PRNGKey(2)))
    # bf16 network compute makes row order visible at ~1e-5 absolute
    # (reduction-order noise through 2 Adam steps); a layout/partition BUG
    # (wrong/duplicated rows) shifts params at the 1e-3 gradient scale
    for a, b in zip(jax.tree.leaves(outs[0][0]), jax.tree.leaves(outs[1][0])):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=5e-2, atol=1e-4)
    # and a real multi-minibatch stratified update trains finitely
    alg = AlgorithmCfg(num_learning_epochs=2, num_mini_batches=2,
                       shuffle_strata=4, minibatch_perm_granule=2)
    ppo = PPO(net=net, alg=alg)
    main_opt, vae_opt = make_optimizers(alg)
    new_params, _, _, _, stats = jax.jit(ppo.update)(
        params, main_opt.init(params), vae_opt.init(params),
        jnp.asarray(alg.learning_rate), batch, jax.random.PRNGKey(3))
    assert all(np.isfinite(float(v)) for v in stats.values())
    diff = max(float(jnp.max(jnp.abs(a - b))) for a, b in
               zip(jax.tree.leaves(params), jax.tree.leaves(new_params)))
    assert diff > 0


def test_update_with_perm_granule():
    """Group-granule shuffle (minibatch_perm_granule > 1) runs the same
    update pipeline: params move, stats stay finite, and the adaptive LR
    stays in the clamp band.  Granule caps that don't divide the minibatch
    size degrade via gcd (here mb=16, granule 8 -> effective 8)."""
    net, params, batch = _tiny_net_and_batch(T=8, N=4)
    alg = AlgorithmCfg(num_learning_epochs=2, num_mini_batches=2,
                       minibatch_perm_granule=8)
    ppo = PPO(net=net, alg=alg)
    main_opt, vae_opt = make_optimizers(alg)
    opt_state = main_opt.init(params)
    vae_opt_state = vae_opt.init(params)
    new_params, _, _, new_lr, stats = jax.jit(ppo.update)(
        params, opt_state, vae_opt_state, jnp.asarray(alg.learning_rate),
        batch, jax.random.PRNGKey(2))
    diff = max(float(jnp.max(jnp.abs(a - b))) for a, b in
               zip(jax.tree.leaves(params), jax.tree.leaves(new_params)))
    assert diff > 0 and np.isfinite(diff)
    assert 1e-5 <= float(new_lr) <= 1e-2
    for k in ("value_loss", "surrogate_loss", "kl"):
        assert np.isfinite(float(stats[k])), k


@pytest.mark.smoke
def test_vae_optimizer_only_touches_vae():
    """The VAE step must not move actor/critic params (ppo.py:79 scoping)."""
    net, params, batch = _tiny_net_and_batch(T=2, N=2)
    alg = AlgorithmCfg(num_learning_epochs=1, num_mini_batches=1,
                       learning_rate=0.0, schedule="fixed")  # freeze main opt
    ppo = PPO(net=net, alg=alg)
    main_opt, vae_opt = make_optimizers(alg)
    opt_state = main_opt.init(params)
    vae_opt_state = vae_opt.init(params)
    new_params, *_ = jax.jit(ppo.update)(
        params, opt_state, vae_opt_state, jnp.asarray(0.0), batch,
        jax.random.PRNGKey(0))
    p0 = params["params"]
    p1 = new_params["params"]
    # actor/critic/std unchanged
    for k in ("actor_body", "critic_body"):
        for a, b in zip(jax.tree.leaves(p0[k]), jax.tree.leaves(p1[k])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(p0["std"]), np.asarray(p1["std"]))
    # vae changed
    diff = max(float(jnp.max(jnp.abs(a - b))) for a, b in
               zip(jax.tree.leaves(p0["vae"]), jax.tree.leaves(p1["vae"])))
    assert diff > 0


def test_recurrent_update():
    """Recurrent PPO path: replay-based update changes params, stays finite."""
    from deep_tracking_control_tpu.models.networks import ActorCriticRecurrent
    net = ActorCriticRecurrent(num_obs=10, num_critic_obs=10, num_actions=4,
                               rnn_hidden_size=16, actor_hidden=(16,),
                               critic_hidden=(16,))
    rng = np.random.default_rng(0)
    T, N, H = 6, 8, 16
    carry = jnp.zeros((N, 10))
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((N, 10)),
                      jnp.zeros((N, 10)), jnp.zeros((N, H)), jnp.zeros((N, H)))
    alg = AlgorithmCfg(num_learning_epochs=1, num_mini_batches=2)
    ppo = PPO(net=net, alg=alg, policy_kind="recurrent")
    # collect a rollout with act_recurrent
    ca = cc = jnp.zeros((N, H))
    init_a, init_c = ca, cc
    rows = []
    key = jax.random.PRNGKey(1)
    obs_seq = jnp.asarray(rng.normal(size=(T, N, 10)), dtype=jnp.float32)
    dones = jnp.asarray(rng.random((T, N)) < 0.2)
    for t in range(T):
        key, k = jax.random.split(key)
        a, ca, cc = ppo.act_recurrent(params, obs_seq[t], ca, cc, k)
        rows.append(a)
    stack = lambda k: jnp.stack([r[k] for r in rows])
    batch = dict(obs=obs_seq, actions=stack("actions"),
                 values=stack("values"), old_log_prob=stack("log_prob"),
                 old_mu=stack("mu"), old_sigma=stack("sigma"),
                 returns=stack("values") + 0.1,
                 advantages=jnp.asarray(rng.normal(size=(T, N)), dtype=jnp.float32),
                 dones=dones,
                 init_carry_a=jnp.broadcast_to(init_a, (T,) + init_a.shape)[0],
                 init_carry_c=init_c)
    # init carries are per-env (not per-step): shape (N,H)
    batch["init_carry_a"] = init_a
    main_opt, _ = make_optimizers(alg)
    opt_state = main_opt.init(params)
    new_params, _, new_lr, stats = jax.jit(ppo.update_recurrent)(
        params, opt_state, jnp.asarray(alg.learning_rate), batch,
        jax.random.PRNGKey(3))
    diff = max(float(jnp.max(jnp.abs(a - b))) for a, b in
               zip(jax.tree.leaves(params), jax.tree.leaves(new_params)))
    assert diff > 0 and np.isfinite(diff)
    assert np.isfinite(float(stats["value_loss"]))


def test_masked_median_exact():
    """masked_median == torch.Tensor.median semantics (lower middle of the
    valid subset) across sizes, signs, ties, and gradients."""
    from deep_tracking_control_tpu.models.networks import masked_median
    rng = np.random.default_rng(0)
    fn = jax.jit(masked_median)
    for n, frac in [(7, 1.0), (8, 1.0), (1000, 0.8), (4096 * 16, 0.95),
                    (5, 0.4), (33, 0.7)]:
        x = rng.normal(scale=3.0, size=n).astype(np.float32)
        if n > 100:   # inject ties and negatives
            x[::7] = x[0]
            x[1::11] = -0.0
        valid = rng.random(n) < frac
        if not valid.any():
            valid[0] = True
        got = float(fn(jnp.asarray(x), jnp.asarray(valid)))
        sub = np.sort(x[valid])
        want = float(sub[(len(sub) - 1) // 2])   # torch lower-middle
        assert got == want, (n, frac, got, want)
    # extreme magnitudes exercise the full uint32 key range of the
    # multiway bisection (thresholds near the range ends, cap at hi)
    ext = np.array([-3.4e38, -1e-38, -0.0, 0.0, 1e-38, 1.0, 3.4e38,
                    2.0, -7.5], dtype=np.float32)
    got = float(fn(jnp.asarray(ext), jnp.ones(len(ext), bool)))
    assert got == float(np.sort(ext)[(len(ext) - 1) // 2])
    # gradient flows to exactly one selected element (torch assignment
    # semantics) and is finite
    x = jnp.asarray(rng.normal(size=64).astype(np.float32))
    v = jnp.ones(64, bool)
    g = jax.grad(lambda a: masked_median(a, v))(x)
    assert float(jnp.sum(g)) == 1.0 and int(jnp.sum(g != 0)) == 1


def test_outlier_filter_median_vs_mean_paths():
    """Both filter variants run and agree when there are no outliers."""
    from deep_tracking_control_tpu.models.networks import Vae
    key = jax.random.PRNGKey(0)
    hist = jax.random.normal(key, (32, 265))
    for flt in ("median", "mean"):
        vae = Vae(outlier_filter=flt)
        params = vae.init(key, hist, key)
        mu, logvar, z = vae.apply(params, hist, key)
        assert np.all(np.isfinite(np.asarray(logvar)))


def test_joint_forward_matches_separate_passes():
    """joint_forward (the fused-step forward) must reproduce vae_losses,
    act_stats, and evaluate bit-for-bit given the same two RNG keys — the
    fusion shares the encoder, it does not change any math."""
    net, params, batch = _tiny_net_and_batch(T=2, N=4)
    obs = batch["obs"][0]
    oh = batch["obs_history"][0]
    po = batch["privileged_obs"][0]
    nobs = batch["next_obs"][0]
    bv = batch["base_vel"][0]
    kv, kp = jax.random.split(jax.random.PRNGKey(3))
    vae_parts, mean, std, value = net.apply(
        params, obs, oh, po, nobs, bv, kv, kp, method=net.joint_forward)
    ref_parts = net.apply(params, oh, po, nobs, bv, kv,
                          method=net.vae_losses)
    ref_mean, ref_std, _, _ = net.apply(params, obs, oh, po, kp,
                                        method=net.act_stats)
    ref_value = net.apply(params, obs, po, bv, method=net.evaluate)
    for a, b in zip(vae_parts, ref_parts):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(std), np.asarray(ref_std))
    np.testing.assert_allclose(np.asarray(value), np.asarray(ref_value),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.smoke
def test_fused_joint_step_close_to_sequential():
    """fused_joint_step=True takes both grads at the pre-VAE-step params
    (Jacobi ordering) instead of re-running the policy forward after the
    VAE optimizer step (Gauss-Seidel, the reference).  The resulting
    one-update param drift must be far smaller than the update itself,
    and the VAE subtree must move identically when the main opt is frozen.
    """
    net, params, batch = _tiny_net_and_batch(T=4, N=4)
    key = jax.random.PRNGKey(7)

    def run(fused, lr=None, schedule="adaptive"):
        alg = AlgorithmCfg(num_learning_epochs=2, num_mini_batches=2,
                           fused_joint_step=fused,
                           **({"learning_rate": lr, "schedule": schedule}
                              if lr is not None else {}))
        ppo = PPO(net=net, alg=alg)
        main_opt, vae_opt = make_optimizers(alg)
        new_params, _, _, new_lr, stats = jax.jit(ppo.update)(
            params, main_opt.init(params), vae_opt.init(params),
            jnp.asarray(alg.learning_rate), batch, key)
        return new_params, new_lr, stats

    p_seq, lr_seq, s_seq = run(False)
    p_fus, lr_fus, s_fus = run(True)
    for k in ("value_loss", "surrogate_loss", "recons_loss", "vel_loss",
              "kld_loss", "height_loss", "kl"):
        assert np.isfinite(float(s_fus[k])), k
    norm = lambda t: float(sum(jnp.sum(jnp.square(a))
                               for a in jax.tree.leaves(t)) ** 0.5)
    tsub = lambda a, b: jax.tree.map(lambda x, y: x - y, a, b)
    upd = norm(tsub(p_seq, params))
    drift = norm(tsub(p_fus, p_seq))
    assert upd > 0
    assert drift < 0.5 * upd, (drift, upd)
    # frozen main opt: the VAE subtree step is bit-compatible between the
    # two orderings (same params, same k_vae -> same grads)
    p_seq0, _, _ = run(False, lr=0.0, schedule="fixed")
    p_fus0, _, _ = run(True, lr=0.0, schedule="fixed")
    for a, b in zip(jax.tree.leaves(p_seq0["params"]["vae"]),
                    jax.tree.leaves(p_fus0["params"]["vae"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.smoke
def test_belief_loss_trains_memory_mlp():
    """belief_loss_coef (no reference analog, default 0): the reference's
    act_teacher deploys through vae.memory_mlp, which NO reference loss
    touches.  With the coef at 0 the module must stay at init (exact
    reference semantics); with coef > 0 the VAE step must move ONLY the
    belief head toward reconstructing l_t."""
    net, params, batch = _tiny_net_and_batch(T=4, N=4)

    def run(coef, steps=40):
        alg = AlgorithmCfg(num_learning_epochs=1, num_mini_batches=2,
                           belief_loss_coef=coef)
        ppo = PPO(net=net, alg=alg)
        main_opt, vae_opt = make_optimizers(alg)
        p, o, v, lr = (params, main_opt.init(params), vae_opt.init(params),
                       jnp.asarray(alg.learning_rate))
        upd = jax.jit(ppo.update)
        for i in range(steps):
            p, o, v, lr, _ = upd(p, o, v, lr, batch, jax.random.PRNGKey(i))
        return p

    mm0 = params["params"]["vae"]["memory_mlp"]
    p_off = run(0.0)
    for a, b in zip(jax.tree.leaves(mm0),
                    jax.tree.leaves(p_off["params"]["vae"]["memory_mlp"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    p_on = run(5.0)
    moved = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree.leaves(mm0),
        jax.tree.leaves(p_on["params"]["vae"]["memory_mlp"])))
    assert moved > 1e-5

    # the distillation works: after identical training, the coef>0 run's
    # belief tracks its l_t far better than the coef=0 run's (whose
    # memory_mlp sat still while the terrain encoder grew l_t away from
    # the near-zero init, where ||b_t - l_t|| is trivially ~0)
    hist = batch["obs_history"].reshape(-1, 265)
    priv = batch["privileged_obs"].reshape(-1, 1389)
    l_off = float(net.apply(p_off, hist, priv, method=net.belief_loss))
    l_on = float(net.apply(p_on, hist, priv, method=net.belief_loss))
    assert l_on < 0.5 * l_off, (l_on, l_off)

    # the belief head takes no DIRECT gradient path into the terrain
    # encoder (l_t is stop-gradiented): d(belief_loss)/d(encoder) == 0.
    # (Trained encoder WEIGHTS still differ slightly between runs via the
    # vae chain's clip_by_global_norm, whose norm includes the memory_mlp
    # grads — the same coupling any added loss term has under global
    # clipping.)
    g = jax.grad(lambda p: net.apply(p, hist, priv,
                                     method=net.belief_loss))(params)
    enc_norm = sum(float(jnp.sum(jnp.abs(x))) for x in
                   jax.tree.leaves(g["params"]["vae"]["terrain_encoder"]))
    mm_norm = sum(float(jnp.sum(jnp.abs(x))) for x in
                  jax.tree.leaves(g["params"]["vae"]["memory_mlp"]))
    assert enc_norm == 0.0 and mm_norm > 0.0
