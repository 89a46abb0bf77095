"""Multi-host (pod-slice) initialization for the env-axis mesh.

The reference is strictly single-GPU (SURVEY.md §2: a `--horovod` flag is
parsed and never read; no NCCL/MPI anywhere).  The TPU-native scale-out
keeps its one parallel axis — the env batch — and extends it across
processes: each host drives its local chips, the mesh spans every process,
and GSPMD reduces gradients/metrics over ICI/DCN exactly as in the
single-host case (parallel/mesh.py).

Usage on a pod slice (one process per host):

    from deep_tracking_control_tpu.parallel import distributed
    distributed.initialize()            # TPU pods: auto-detected coordinator
    mesh = distributed.global_mesh()    # all devices of all processes
    runner = OnPolicyRunner(env, train_cfg, mesh=mesh)
    runner.learn(...)

Everything else is unchanged: OnPolicyRunner materializes env state directly
into the mesh sharding with jit(out_shardings=...) (never on one host), the
terrain is rebuilt identically on every process from the shared seed, and
checkpoints go through orbax, which handles process-sharded global arrays.

For CPU-based rehearsal (tests/test_multihost.py) pass explicit coordinator
/ process counts and set `jax_num_cpu_devices` before calling.
"""
from __future__ import annotations

import jax

from . import mesh as pmesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None):
    """jax.distributed.initialize wrapper; no-op if already initialized.

    On TPU pods all arguments are auto-detected from the environment; on
    CPU/GPU rehearsal clusters pass them explicitly.
    """
    # don't touch the backend to detect prior initialization —
    # jax.process_count() would itself initialize XLA
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
        if local_device_ids is not None:
            kwargs.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kwargs)


def global_mesh():
    """1-D env-axis mesh over every device of every process."""
    return pmesh.make_mesh(jax.devices())


def warmup_collectives(mesh=None):
    """Create the cross-process collective contexts while every process is
    still synchronized at init.

    The first collective of a jitted program materializes the backend's
    communicator for its device group lazily AT EXECUTION TIME (gloo on
    CPU rehearsal clusters, with ~30 s connect/KV handshake deadlines).
    If the first collective sits behind a multi-minute program compile,
    processes reach it at different times — whichever arrives first times
    out waiting for peers that are still compiling (observed: the round-5
    stratified update pushed compile skew past the deadline and the
    2-process rehearsal test deadlocked in gloo setup).  A trivial
    replicated-sum here compiles in milliseconds, so all processes hit
    the group's first collective together; later program collectives
    reuse the established pairs.  Call right after initialize()."""
    import jax.numpy as jnp

    mesh = mesh if mesh is not None else global_mesh()
    x = jax.jit(
        lambda: jnp.ones((len(mesh.devices.flat),), jnp.float32),
        out_shardings=pmesh.env_leading(mesh))()
    total = jax.jit(jnp.sum, out_shardings=pmesh.replicated(mesh))(x)
    jax.block_until_ready(jax.device_get(total))
