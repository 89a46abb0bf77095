"""split/pad trajectory utilities + masked RNN replay."""
import numpy as np

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.agent.trajectories import (
    rnn_replay, split_and_pad_trajectories, unpad_trajectories)


def _manual_split(x, dones):
    """Reference semantics in plain python: split each env column at dones."""
    T, N = dones.shape
    trajs = []
    for n in range(N):
        start = 0
        for t in range(T):
            if dones[t, n]:
                trajs.append(x[start:t + 1, n])
                start = t + 1
        if start < T:
            trajs.append(x[start:, n])
    return trajs


def test_split_and_pad_matches_manual():
    rng = np.random.default_rng(0)
    T, N, D = 8, 3, 2
    x = rng.normal(size=(T, N, D)).astype(np.float32)
    dones = rng.random((T, N)) < 0.25
    padded, masks = split_and_pad_trajectories(jnp.asarray(x),
                                               jnp.asarray(dones))
    padded, masks = np.asarray(padded), np.asarray(masks)
    manual = _manual_split(x, dones)
    # every manual trajectory appears as a masked column prefix
    got = [padded[:int(masks[:, m].sum()), m]
           for m in range(masks.shape[1]) if masks[:, m].any()]
    assert len(got) == len(manual)
    got_sorted = sorted(got, key=lambda a: (a.shape[0], a.tobytes()))
    man_sorted = sorted(manual, key=lambda a: (a.shape[0], a.tobytes()))
    for g, m in zip(got_sorted, man_sorted):
        np.testing.assert_array_equal(g, m)


def test_unpad_roundtrip():
    rng = np.random.default_rng(1)
    T, N, D = 6, 4, 3
    x = rng.normal(size=(T, N, D)).astype(np.float32)
    dones = rng.random((T, N)) < 0.3
    padded, masks = split_and_pad_trajectories(jnp.asarray(x),
                                               jnp.asarray(dones))
    back = unpad_trajectories(padded, masks)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-6)


def test_rnn_replay_resets_carry():
    """Carry must restart at dones: compare against manual per-episode runs."""
    T, N, H = 6, 2, 4

    def cell(carry, x):
        new = 0.5 * carry + x
        return new, new

    rng = np.random.default_rng(2)
    xs = jnp.asarray(rng.normal(size=(T, N, H)).astype(np.float32))
    dones = np.zeros((T, N), dtype=bool)
    dones[2, 0] = True
    dones[4, 1] = True
    zero = jnp.zeros((N, H))
    _, outs = rnn_replay(cell, zero, xs, jnp.asarray(dones), zero)
    outs = np.asarray(outs)
    # env 0: steps 0-2 one episode, 3-5 fresh
    c = np.zeros(H)
    for t in range(3):
        c = 0.5 * c + np.asarray(xs[t, 0])
        np.testing.assert_allclose(outs[t, 0], c, atol=1e-6)
    c = np.zeros(H)
    for t in range(3, 6):
        c = 0.5 * c + np.asarray(xs[t, 0])
        np.testing.assert_allclose(outs[t, 0], c, atol=1e-6)
