"""Pallas TPU kernel: grouped row gather (the minibatch shuffle).

XLA's dynamic row gather on TPU runs ~5x off HBM bandwidth for the PPO
batch shapes (~7 ms per update at 4096 envs, scripts/profile_gather.py);
this kernel streams one permuted GROUP of rows per grid step through VMEM
(AlgorithmCfg.minibatch_perm_granule packs rows into ~4-45 KB chunks, so
the pipelined copies run at bandwidth), touching each byte exactly twice
(HBM read + HBM write).

The gather is expressed through the grid pipeline itself — a
PrefetchScalarGridSpec whose input index_map reads the prefetched
permutation (`perm[g]`), the canonical TPU gather idiom — NOT via manual
make_async_copy row slices: Mosaic lane-pads HBM memrefs to 128-element
tiles, so a manually sliced (G, width) plane with width % 128 != 0 is an
illegal sub-tile copy, while pipeline-generated block copies handle the
padding natively.  Sources are shaped (C, G, width): the Pallas TPU
lowering requires the last two block dims to be divisible by (8, 128) or
equal the array dims, so blocks are (1, G, width) with G % 8 == 0 and the
width taken in full.

Used by agent/ppo.py's update for every batch field whose chunk row is
>= 512 bytes; scalar fields stay on the XLA gather.  Parity:
tests/test_pallas_gather.py (interpret mode) + the on-device run in
scripts/verify_kernels_tpu.py.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(n, perm_ref, *refs):
    del perm_ref  # consumed by the index maps
    srcs = refs[:n]
    outs = refs[n:2 * n]
    for a in range(n):
        outs[a][...] = srcs[a][...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather(perm, *srcs, interpret: bool = False):
    C = perm.shape[0]
    n = len(srcs)

    def in_spec(s):
        G, w = s.shape[1], s.shape[2]
        return pl.BlockSpec((1, G, w), lambda g, perm: (perm[g], 0, 0))

    def out_spec(s):
        G, w = s.shape[1], s.shape[2]
        return pl.BlockSpec((1, G, w), lambda g, perm: (g, 0, 0))

    out = pl.pallas_call(
        functools.partial(_kernel, n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=[in_spec(s) for s in srcs],
            out_specs=tuple(out_spec(s) for s in srcs),
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((C,) + s.shape[1:], s.dtype)
            for s in srcs),
        interpret=interpret,
    )(perm, *srcs)
    return out


def permute_groups(flat: dict, perm, G: int, min_row_bytes: int = 512,
                   interpret: bool = False):
    """Permute groups of G leading rows of every array in ``flat``.

    Equivalent to
    ``x.reshape((C, G) + rest)[perm].reshape((len(perm)*G,) + rest)``
    for each field, with wide chunk rows routed through the pipelined
    gather kernel and narrow ones through the XLA gather.  ``perm`` may
    select a prefix (len(perm) <= C).  The kernel path needs G % 8 == 0
    (Mosaic sublane divisibility); other granules fall back to XLA."""
    C = len(perm)
    kernel_ok = G % 8 == 0
    kernel_fields, xla_fields = [], []
    chunked = {}
    for k, x in flat.items():
        R = x.shape[0]
        rest = x.shape[1:]
        width = int(math.prod(rest)) if rest else 1
        xc = x.reshape((R // G, G, width))
        chunked[k] = (xc, rest)
        if kernel_ok and G * width * x.dtype.itemsize >= min_row_bytes:
            kernel_fields.append(k)
        else:
            xla_fields.append(k)

    out = {}
    if kernel_fields:
        srcs = [chunked[k][0] for k in kernel_fields]
        res = _gather(perm, *srcs, interpret=interpret)
        for k, r in zip(kernel_fields, res):
            rest = chunked[k][1]
            out[k] = r.reshape((C * G,) + rest)
    for k in xla_fields:
        xc, rest = chunked[k]
        out[k] = xc[perm].reshape((C * G,) + rest)
    return out
