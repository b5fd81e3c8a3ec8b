"""Checkpoint/resume for inversion runs (orbax-backed).

The reference has no checkpointing (a render is one shot; SURVEY.md §5).
Long differentiable-inversion runs do want it: this saves/restores the
(params, opt_state, step) pytree so a fit survives preemption — the TPU-pod
reality the reference never faced.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save(path: str, state: Any) -> str:
    """Save a pytree checkpoint (overwrites)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def restore(path: str, like: Any) -> Any:
    """Restore a pytree checkpoint with the structure/shapes of ``like``."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(getattr(x, "shape", ()),
                                       getattr(x, "dtype", None)) if hasattr(
                                           x, "shape") else x, like)
    return ckptr.restore(os.path.abspath(path), target)
