"""Device-mesh sharding of the env axis (the framework's parallelism).

The reference's only parallel axis is the vectorized-env batch inside one
GPU (SURVEY.md §2, Parallelism); there is no NCCL/MPI.  The TPU-native
equivalent: shard the env dimension of the single fused rollout+learn XLA
program across a 1-D `jax.sharding.Mesh` ("env" axis), keep params
replicated, and let GSPMD insert the ICI collectives (gradient/metric
means, global advantage normalization) automatically.

Usage:
    mesh = make_mesh()                       # all local devices
    shardings = state_shardings(mesh, env_state, num_envs)
    step = jax.jit(fn, in_shardings=..., out_shardings=...)
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# partitionable counter-based RNG: random draws over the sharded env axis
# are generated locally per shard without host broadcast
jax.config.update("jax_threefry_partitionable", True)

ENV_AXIS = "env"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (ENV_AXIS,))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def env_leading(mesh: Mesh):
    return NamedSharding(mesh, P(ENV_AXIS))


def _spec_for_leaf(path_keys, leaf, num_envs) -> P:
    """Sharding rule for one env-state/params leaf.

    Physics-core arrays are env-TRAILING ((..., N), see ops/spatial.py);
    env-logic arrays are env-LEADING ((N, ...)); scalars and small config
    vectors are replicated.
    """
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path_keys]
    trailing_groups = {"phys", "anchors", "inertias", "body_pts", "planes",
                       "episode_sums"}
    if any(k in trailing_groups for k in keys):
        return P(*([None] * (len(shape) - 1) + [ENV_AXIS]))
    if shape[0] == num_envs:
        return P(*([ENV_AXIS] + [None] * (len(shape) - 1)))
    return P()


def tree_shardings(mesh: Mesh, tree, num_envs):
    """NamedSharding pytree for an env state/params pytree."""
    def fn(path, leaf):
        return NamedSharding(mesh, _spec_for_leaf(path, leaf, num_envs))
    return jax.tree_util.tree_map_with_path(fn, tree)


def apply_shardings(tree, shardings):
    """Device-put a pytree onto its shardings."""
    return jax.tree.map(jax.device_put, tree, shardings)
