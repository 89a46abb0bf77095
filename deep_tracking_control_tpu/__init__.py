"""deep_tracking_control_tpu — TPU-native Deep Tracking Control framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability of
priest-yang/Deep-Tracking-Control (legged_gym + rsl_rl + DTC foothold
planner on Isaac Gym): batched articulated-body physics, procedural terrain,
the DTC environment family, CE-net/VAE actor-critic, PPO, and an
SPMD training runner sharded over a device mesh.
"""
__version__ = "0.1.0"
