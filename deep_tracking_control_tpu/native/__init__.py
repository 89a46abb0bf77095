"""ctypes binding for the native terrain generator (terrain_gen.cpp).

Compiles the shared library on first use if it's missing and g++ is
available; callers fall back to the pure-Python generator otherwise.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdtcterrain.so")
_SRC = os.path.join(_DIR, "terrain_gen.cpp")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                           check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.dtc_generate_terrain.restype = ctypes.c_int
    lib.dtc_generate_terrain.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def generate_terrain(cfg, seed: int):
    """Native world generation; returns (heightfield int16 (R,C),
    env_origins (rows, cols, 3)) or None if the library is unavailable.

    cfg is a TerrainCfg (env/config.py)."""
    lib = _load()
    if lib is None:
        return None
    lpx = int(cfg.terrain_length / cfg.horizontal_scale)
    wpx = int(cfg.terrain_width / cfg.horizontal_scale)
    border = int(cfg.border_size / cfg.horizontal_scale)
    rows = cfg.num_rows * lpx + 2 * border
    cols = cfg.num_cols * wpx + 2 * border
    hf = np.zeros((rows, cols), dtype=np.int16)
    origins = np.zeros((cfg.num_rows, cfg.num_cols, 3), dtype=np.float64)
    props = np.ascontiguousarray(cfg.terrain_proportions, dtype=np.float64)
    ret = lib.dtc_generate_terrain(
        cfg.num_rows, cfg.num_cols, cfg.terrain_length, cfg.terrain_width,
        cfg.border_size, cfg.horizontal_scale, cfg.vertical_scale,
        props.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(props),
        1 if cfg.curriculum else 0, seed,
        hf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        origins.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    assert ret == rows * 100000 + cols, "native terrain shape mismatch"
    return hf, origins
