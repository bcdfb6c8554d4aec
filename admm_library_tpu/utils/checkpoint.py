"""Checkpoint / resume / elastic recovery (SURVEY.md §5.3-5.4).

Solver state is a tiny pytree — (x, z, y, rho) plus metadata — so
checkpointing is a host-side `np.savez` snapshot, and resume is the
ordinary warm-start path (A5): ADMM re-converges from any primal/dual
point, which makes elastic recovery (fewer devices, resharded batch)
essentially free. No orbax dependency needed at these sizes.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..solution import Solution

_META_KEYS = ("status", "iters", "r_prim", "r_dual", "obj", "rho")


def save_state(path: str, sol_or_state, extra: dict | None = None) -> None:
    """Snapshot a Solution (or any (x, z, y[, rho]) mapping) to `path`.

    Device arrays are fetched once; the file is written atomically
    (tmp + rename) so a crash mid-write never corrupts the last good
    checkpoint.
    """
    if isinstance(sol_or_state, Solution):
        state = {"x": sol_or_state.x, "z": sol_or_state.z,
                 "y": sol_or_state.y, "rho": sol_or_state.rho,
                 "iters": sol_or_state.iters}
    else:
        state = dict(sol_or_state)
    if extra:
        state.update(extra)
    host = {k: np.asarray(v) for k, v in state.items()}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **host)
    os.replace(tmp, path)


def load_state(path: str, dtype=None) -> dict:
    """Load a checkpoint into a dict of jnp arrays (warm-start inputs)."""
    with np.load(path) as data:
        out = {k: data[k] for k in data.files}
    if dtype is not None:
        out = {k: (v.astype(dtype) if np.issubdtype(v.dtype, np.floating)
                   else v) for k, v in out.items()}
    return {k: jnp.asarray(v) for k, v in out.items()}


def resume_warm_start(path: str):
    """(x0, z0, y0) warm-start triple from a checkpoint file.

    Elastic recovery: if the batch is being resharded onto fewer devices,
    slice/reshape the returned arrays before passing to the solver — the
    warm start is valid per-lane regardless of placement.
    """
    st = load_state(path)
    return st["x"], st["z"], st["y"]
