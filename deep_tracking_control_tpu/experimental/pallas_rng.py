"""Pallas TPU kernel: big per-step uniform noise draws from the core HW PRNG.

The env's two large per-step noise draws — the (N, 693) height-scan noise
and the (N, num_obs) observation noise (legged_robot.py:229-230 /
compute_observations noise add, reimplemented in env/legged_env.py
_compute_observations) — cost real VPU time on the XLA path: each is a
threefry2x32 evaluation (~100 integer ops per 2 outputs) over millions of
elements.  The TPU core has a hardware PRNG reachable only from Pallas
(pltpu.prng_seed / prng_random_bits); this kernel streams uniform bits
straight into the right layout at memory speed.

Deviation (documented here and in PARITY.md): the noise STREAM differs
from the XLA path (HW PRNG vs threefry) — same distribution, different
bits — so A/B parity vs the XLA path is behavioral (distribution moments
+ training equivalence), not bitwise.  Seeding: both threefry key words +
the grid program id, so different step keys give independent draws and
different env tiles are decorrelated.

Opt-in via DTC_PALLAS_RNG=1 until the on-device A/B flips the default
(same protocol as DTC_PALLAS_REWARDS).

NOTE: the TPU interpret mode (pltpu.InterpretParams) stubs
prng_random_bits to zeros, so CPU tests cover plumbing/shape only; the
distribution gate runs on hardware in scripts/verify_kernels_tpu.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seed_ref, o_ref):
    # Mosaic caps prng_seed at 2 values; fold the grid index into the
    # second word with an odd multiplier so tiles stay decorrelated.
    pltpu.prng_seed(seed_ref[0],
                    seed_ref[1] + pl.program_id(0) * jnp.int32(-1640531527))
    bits = pltpu.prng_random_bits(o_ref.shape)
    ubits = lax.bitcast_convert_type(bits, jnp.uint32)
    # top 23 bits -> f32 uniform [0, 2) -> [-1, 1)
    # >>9 clears the top 9 bits, so a bitcast to int32 is sign-safe; Mosaic
    # has no uint32->f32 convert, only int32->f32.
    u23 = lax.bitcast_convert_type(ubits >> jnp.uint32(9), jnp.int32)
    o_ref[...] = u23.astype(jnp.float32) * (2.0 ** -22) - 1.0


def uniform_pm1(key, shape, tile=512, interpret=False):
    """(N, D) float32 uniform in [-1, 1) from the TPU hardware PRNG.

    key: a threefry PRNGKey (raw (2,) uint32 or typed); its two words seed
    the HW PRNG together with the program id.
    """
    N, D = shape
    # back off to any divisor down to the f32 sublane count (8) so tiny
    # test envs run; perf path uses 512-row tiles
    while tile > 8 and N % tile:
        tile //= 2
    if N % tile:
        raise ValueError(f"rows {N} not divisible by tile {tile}")
    kd = jnp.asarray(jax.random.key_data(key)).reshape(-1)[:2]
    seed = lax.bitcast_convert_type(kd.astype(jnp.uint32), jnp.int32)
    return pl.pallas_call(
        _kernel,
        grid=(N // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((tile, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed)
