"""Test configuration.

Tests run on CPU with 8 virtual devices (sharding tests build an 8-way
mesh); Pallas kernels run in interpreter mode there, mirroring the role of
the reference's no-GPU internal test oracle.  Set ``FA_TEST_TPU=1`` to run
the same suite compiled on real TPU hardware.
"""

import os

if not os.environ.get("FA_TEST_TPU"):
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not os.environ.get("FA_TEST_TPU"):
    # The axon TPU plugin ignores JAX_PLATFORMS; force via config.
    jax.config.update("jax_platforms", "cpu")
