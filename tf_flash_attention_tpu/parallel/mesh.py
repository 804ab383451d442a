"""Device-mesh helpers.

The reference is a single-GPU op library with zero multi-device code
(SURVEY.md §2: no NCCL/MPI, no tf.distribute).  The TPU build's scaling
story is mesh-first: all parallelism (data / head-tensor / context /
sequence) is expressed as named mesh axes + sharding specs, and XLA lowers
the named collectives onto ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "AXIS_DATA", "AXIS_MODEL", "AXIS_CONTEXT"]

AXIS_DATA = "data"
AXIS_MODEL = "model"
AXIS_CONTEXT = "context"


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = (AXIS_DATA, AXIS_MODEL),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    ``shape=None`` puts all devices on the first axis.  Axis sizes must
    multiply to the device count.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)
