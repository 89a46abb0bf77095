"""Orbax checkpointing of the full train-state pytree.

Replaces torch.save/load of model+optimizer+iter (on_policy_runner.py:
249-264) — and additionally checkpoints env state, curriculum levels, and
the PRNG key so resume continues the curriculum exactly (the reference
restarts it; SURVEY.md §5 checkpoint notes).
"""
from __future__ import annotations

import os
import re

import jax
import orbax.checkpoint as ocp


def save(path: str, tree):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(tree), force=True)
    ckptr.wait_until_finished()


def load_raw(path: str):
    """Restore with the stored shapes/dtypes (no abstract template).

    NOTE: container types degrade to dicts/lists — optimizer states lose
    their NamedTuple classes; use `load` with a template for those."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)


def metadata(path: str):
    """Stored tree metadata (shapes/dtypes) without reading array data."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.metadata(path)


def tree_metadata(path: str):
    """Stored tree metadata as a plain dict pytree, or raise.

    Handles both orbax metadata shapes explicitly — some versions return
    the metadata tree directly, others wrap it in an object carrying
    `item_metadata` — and FAILS LOUDLY on anything else, so orbax API
    drift can never silently degrade a resume into the fresh-env-state
    fallback in OnPolicyRunner.load."""
    meta = metadata(path)
    tree = getattr(meta, "item_metadata", meta)
    # some orbax versions nest once more (CompositeItemMetadata)
    if not isinstance(tree, dict):
        tree = getattr(tree, "tree", tree)
    if not isinstance(tree, dict) or "params" not in tree:
        raise RuntimeError(
            f"unrecognized orbax checkpoint metadata at {path}: "
            f"{type(meta).__name__} (expected a dict containing "
            "'params'; orbax API drift or a foreign checkpoint)")
    # 'env_state' may legitimately be absent: periodic saves are light
    # (OnPolicyRunner.save(full=False), the reference's save scope)
    return tree


def load(path: str, like_tree):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(getattr(x, "shape", ()),
                                       getattr(x, "dtype", None))
        if hasattr(x, "shape") else x, like_tree)
    return ckptr.restore(path, abstract)


def get_load_path(root: str, load_run: str = "-1", checkpoint: int = -1):
    """Checkpoint discovery (helpers.py:73-95): latest run dir / model_* by
    number unless explicitly given."""
    def has_ckpt(d):
        p = os.path.join(root, d)
        return any(re.match(r"model_(\d+)$", f) for f in os.listdir(p))

    runs = sorted(d for d in os.listdir(root)
                  if os.path.isdir(os.path.join(root, d)))
    if load_run in ("-1", -1):
        # latest run that actually contains checkpoints (a resume launch
        # creates its own empty run dir before loading — skip it)
        runs = [d for d in runs if has_ckpt(d)]
    if not runs:
        raise FileNotFoundError(f"no runs with checkpoints in {root}")
    run = runs[-1] if load_run in ("-1", -1) else load_run
    run_dir = os.path.join(root, run)
    models = [(int(m.group(1)), d) for d in os.listdir(run_dir)
              if (m := re.match(r"model_(\d+)$", d))]
    if not models:
        raise FileNotFoundError(f"no model_* checkpoints in {run_dir}")
    if checkpoint in (-1, "-1"):
        step, name = max(models)
    else:
        name = f"model_{checkpoint}"
    return os.path.join(run_dir, name)
