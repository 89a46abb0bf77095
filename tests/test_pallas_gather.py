"""Grouped DMA gather kernel vs the XLA reshape-gather (interpret mode)."""
import numpy as np

import jax
import jax.numpy as jnp

from deep_tracking_control_tpu.experimental.pallas_gather import permute_groups


def _want(x, perm, G):
    C = len(perm)
    return np.asarray(x).reshape((x.shape[0] // G, G) + x.shape[1:])[
        np.asarray(perm)].reshape((C * G,) + x.shape[1:])


def test_permute_groups_matches_xla():
    rng = np.random.default_rng(0)
    R, G = 512, 16
    flat = dict(
        priv=jnp.asarray(rng.normal(size=(R, 1389)), jnp.bfloat16),
        hist=jnp.asarray(rng.normal(size=(R, 265)), jnp.bfloat16),
        obs=jnp.asarray(rng.normal(size=(R, 53)), jnp.float32),
        mu=jnp.asarray(rng.normal(size=(R, 12)), jnp.float32),
        val=jnp.asarray(rng.normal(size=(R,)), jnp.float32),
    )
    perm = jnp.asarray(rng.permutation(R // G), jnp.int32)
    got = permute_groups(flat, perm, G, interpret=True)
    for k, x in flat.items():
        want = _want(x, perm, G)
        np.testing.assert_array_equal(
            np.asarray(got[k]).astype(np.float32),
            want.astype(np.float32), err_msg=k)
        assert got[k].dtype == x.dtype


def test_permute_groups_prefix_and_g1():
    """Prefix perms (truncated batch) and G=1 route through XLA paths."""
    rng = np.random.default_rng(1)
    R = 96
    flat = dict(a=jnp.asarray(rng.normal(size=(R, 200)), jnp.float32),
                b=jnp.asarray(rng.normal(size=(R, 3)), jnp.float32))
    perm = jnp.asarray(rng.permutation(R)[: R - 16], jnp.int32)
    got = permute_groups(flat, perm, 1, interpret=True)
    for k, x in flat.items():
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      _want(x, perm, 1), err_msg=k)
