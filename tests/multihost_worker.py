"""Worker for tests/test_multihost.py: one training iteration on a
2-process CPU rehearsal cluster with the env axis sharded globally."""
import dataclasses
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from deep_tracking_control_tpu.parallel import distributed

    distributed.initialize(f"localhost:{port}", num_processes, process_id)
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == 4 * num_processes
    # establish the gloo contexts while both processes are in lock-step
    # (the training program's first collective otherwise sits behind a
    # multi-minute compile whose skew exceeds gloo's 30 s handshake)
    distributed.warmup_collectives()
    print(f"[{process_id}] collectives warm", flush=True)

    from deep_tracking_control_tpu.env.legged_env import LeggedEnv
    from deep_tracking_control_tpu.runner.train import OnPolicyRunner
    from deep_tracking_control_tpu.tasks.registry import get_cfgs

    task, train = get_cfgs("lite3_dtc")
    task = dataclasses.replace(
        task,
        env=dataclasses.replace(task.env, num_envs=16),
        terrain=dataclasses.replace(task.terrain, num_rows=2, num_cols=2,
                                    border_size=4.0,
                                    max_init_terrain_level=1))
    train = dataclasses.replace(
        train,
        runner=dataclasses.replace(train.runner, num_steps_per_env=4),
        algorithm=dataclasses.replace(train.algorithm,
                                      num_learning_epochs=1,
                                      num_mini_batches=2))
    env = LeggedEnv(task)
    mesh = distributed.global_mesh()
    print(f"[{process_id}] env built, mesh {mesh.shape}", flush=True)
    runner = OnPolicyRunner(env, train, log_dir=None, mesh=mesh)
    print(f"[{process_id}] runner built", flush=True)
    runner.learn(1, log_every=10**9)
    print(f"[{process_id}] learned 1 iter", flush=True)

    # params are replicated: every process must print the same checksum
    leaves = jax.tree.leaves(runner.params)
    checksum = sum(float(jax.numpy.sum(jax.numpy.abs(l))) for l in leaves)
    print(f"CHECKSUM {process_id} {checksum:.6f}", flush=True)


if __name__ == "__main__":
    main()
