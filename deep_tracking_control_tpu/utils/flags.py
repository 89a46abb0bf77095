"""Central DTC_* env-flag reader + the strict-parity master switch.

`DTC_STRICT_PARITY=1` flips EVERY deliberate reference-semantics deviation
off at once (VERDICT r4 item 8) for debugging divergences against the
reference stack (rsl_rl ppo.py:197-254 ordering, rollout_storage.py:30-60
f32 storage, rollout_storage.py:165 per-row permutation):

  * Pallas kernel paths -> XLA reference paths (physics mega-kernel,
    fused sampler, fused planner scoring, fused rewards, HW RNG, obs
    kernel, DMA gather),
  * fused contact window -> materialized window,
  * bf16 rollout storage -> f32,
  * Jacobi fused_joint_step -> sequential VAE-then-policy ordering,
  * grouped minibatch permutation (G=16) -> per-row (granule 1).

Each deviation site consults this module so the switch cannot rot as new
gates are added: any new DTC_* kernel gate MUST be read via kernel_flag().
Test: tests/test_train.py::test_strict_parity_switch.
"""
import os


def strict_parity() -> bool:
    return os.environ.get("DTC_STRICT_PARITY", "0") == "1"


def kernel_flag(name: str, default: str) -> bool:
    """Read a DTC_* kernel/deviation gate ("0" = off, anything else = on).

    Strict-parity mode forces every gate off regardless of its own env var.
    """
    if strict_parity():
        return False
    return os.environ.get(name, default) != "0"
