"""Trajectory utilities for recurrent training.

Capability parity with rsl_rl/utils/utils.py:33-69
(split_and_pad_trajectories / unpad_trajectories), plus the TPU-first
alternative actually used for RNN training here: `rnn_replay`, which
re-runs a recurrent cell over the stored (T, N) rollout and RESETS the
carry where an episode ended.  With static shapes this is equivalent to
split-at-dones + padded-batch replay (what the reference's
reccurent_mini_batch_generator feeds the GRU, rollout_storage.py:217-267)
but needs no dynamic trajectory count — each env column is one padded
"trajectory stream" whose hidden state restarts at every done.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def split_and_pad_trajectories(tensor, dones):
    """Split env sequences at dones and pad to T (static shapes).

    tensor: (T, N, D); dones: (T, N) bool.  Returns (padded (T, M, D),
    masks (T, M)) with M = N * T (static upper bound on the trajectory
    count; empty slots have all-False masks).  Semantics match
    rsl_rl/utils/utils.py:33-64: trajectory k of env n starts one step
    after the (k-1)-th done and runs through the k-th done (or T).
    """
    T, N = dones.shape[:2]
    D = tensor.shape[2:]
    # trajectory id within each env column: cumsum of dones shifted by one
    shifted = jnp.concatenate(
        [jnp.zeros((1, N), dtype=jnp.int32), dones[:-1].astype(jnp.int32)],
        axis=0)
    traj_id = jnp.cumsum(shifted, axis=0)              # (T, N) in [0, T)
    # position within the trajectory
    def pos_scan(carry, d):
        pos = carry * (1 - d)        # restart at the step AFTER a done
        return pos + 1, pos
    _, pos = jax.lax.scan(pos_scan, jnp.zeros((N,), jnp.int32),
                          shifted)
    # scatter into (T, N*T, D): slot = n*T + traj_id
    slot = (jnp.arange(N)[None, :] * T + traj_id)      # (T, N)
    out = jnp.zeros((T, N * T) + D, dtype=tensor.dtype)
    mask = jnp.zeros((T, N * T), dtype=bool)
    t_idx = pos                                        # row within slot
    out = out.at[t_idx, slot].set(tensor)
    mask = mask.at[t_idx, slot].set(True)
    return out, mask


def unpad_trajectories(padded, masks):
    """Inverse of split_and_pad (utils.py:66-69 analog): gather the valid
    entries back into a dense (T, N, D) block, ordered by env then time.

    Requires the masks produced by split_and_pad_trajectories above."""
    T, M = masks.shape
    N = M // T
    # valid entries of slot n*T+k laid out consecutively per env
    # reconstruct by summing over trajectory slots at each (t_in_env) index
    flat = padded.reshape((T, N, T) + padded.shape[2:])
    m = masks.reshape(T, N, T)
    # each env-time step appears exactly once across (row, traj) pairs;
    # recover time index = prefix length of earlier trajectories + row
    lens = jnp.sum(m, axis=0)                          # (N, T) per-traj len
    starts = jnp.cumsum(lens, axis=1) - lens           # (N, T)
    t_global = starts[None, :, :] + jnp.arange(T)[:, None, None]  # (T,N,T)
    out = jnp.zeros((T, N) + padded.shape[2:], dtype=padded.dtype)
    out = out.at[jnp.clip(t_global, 0, T - 1),
                 jnp.arange(N)[None, :, None]].add(
        jnp.where(m[..., None] if padded.ndim > 2 else m, flat, 0))
    return out


def rnn_replay(cell_apply, init_carry, xs_seq, dones, reset_carry):
    """Replay a recurrent cell over a stored rollout with in-sequence
    resets (the TPU-native recurrent-minibatch equivalent).

    cell_apply(carry, x) -> (carry, out); dones: (T, N) episode ends
    AFTER each step; reset_carry: carry pytree to splice in at resets.
    Returns (final_carry, outs (T, N, H))."""
    def step(carry, inp):
        x, done = inp
        carry, out = cell_apply(carry, x)
        carry = jax.tree.map(
            lambda c, r: jnp.where(done[(...,) + (None,) * (c.ndim - 1)],
                                   r, c), carry, reset_carry)
        return carry, out

    return jax.lax.scan(step, init_carry, (xs_seq, dones))
