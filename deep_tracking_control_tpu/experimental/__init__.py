"""Measured-negative Pallas kernels, kept OUT of the default import path.

Each module here is correct (interpret-mode tests + the on-device parity
runs in scripts/verify_kernels_tpu.py) but measured SLOWER than the XLA
default it replaces on the v5e (docs/perf.md "Negative result"):

  * pallas_rewards — fused reward stack kernel; XLA already folds the
    reward terms into adjacent fusions (A/B: 477.0k vs 498.2k full-train).
  * pallas_obs    — fused obs assembly + noise; same story.
  * pallas_rng    — HW-PRNG uniform noise; no step-level win, and the
    noise STREAM differs from threefry (PARITY.md).
  * pallas_gather — DMA minibatch permutation gather; XLA's G=16 grouped
    gather already runs at bandwidth (84.8 vs 82.8 ms/update).

They remain reachable via their opt-in gates (DTC_PALLAS_REWARDS=1,
DTC_PALLAS_OBS=1, DTC_PALLAS_RNG=1, DTC_PALLAS_GATHER=1) for future
hardware (the v5p bandwidth/MXU ratios may flip the verdicts) and for
A/B regression hunting; nothing imports them unless a gate is set.
Sunset decision: VERDICT r4 item 7.
"""
