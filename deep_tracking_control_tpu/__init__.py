"""deep_tracking_control_tpu — TPU-native Deep Tracking Control framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability of
priest-yang/Deep-Tracking-Control (legged_gym + rsl_rl + DTC foothold
planner on Isaac Gym): batched articulated-body physics, procedural terrain,
the DTC environment family, CE-net/VAE actor-critic, PPO, and an
SPMD training runner sharded over a device mesh.
"""
__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the full training iteration takes
# ~10-15 min to compile on the remote TPU service, and with no cache every
# process (train/bench/profile/eval) pays it again.  Keyed by HLO hash, so
# identical graphs across processes hit.  Opt out with DTC_COMPILE_CACHE=0
# (or point DTC_COMPILE_CACHE at a different directory).
_cache = _os.environ.get("DTC_COMPILE_CACHE", "")
if _cache != "0":
    if _cache in ("", "1"):
        _cache = _os.path.expanduser("~/.cache/dtc_tpu_xla")
    try:
        import jax as _jax
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
        # accept cache entries regardless of which flags produced them
        # (profiling env toggles don't change the HLO they key on)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # very old jax or readonly fs: run uncached
        pass
