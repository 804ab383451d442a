"""Checkpoint / resume for training state.

The reference is a stateless op library with no checkpointing
(SURVEY.md §5); the TPU framework trains models, so save/restore of the
``(params, opt_state, step)`` pytree is provided via Orbax (the standard
JAX checkpointing stack, async-capable and sharding-aware: restored arrays
land back on their meshes when a sharding pytree is supplied).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step"]


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, step: int, state: Any) -> str:
    """Write ``state`` (any pytree) under ``directory/step_<n>``."""
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    _checkpointer().save(path, state, force=True)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [int(name.split("_", 1)[1]) for name in os.listdir(directory)
             if name.startswith("step_") and name.split("_", 1)[1].isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       target: Any = None) -> Any:
    """Restore the pytree saved at ``step`` (default: latest).

    ``target`` (an abstract/structural pytree, e.g. the freshly-initialised
    state) guides dtypes/shardings; restored arrays are placed accordingly.
    """
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    import orbax.checkpoint as ocp

    kwargs = {}
    if target is not None:
        kwargs["restore_args"] = jax.tree.map(
            lambda x: ocp.ArrayRestoreArgs(
                sharding=getattr(x, "sharding", None), dtype=getattr(x, "dtype", None)
            ),
            target,
        )
    return _checkpointer().restore(path, **kwargs)
