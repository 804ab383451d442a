"""TPU-native flash attention framework.

A from-scratch JAX/Pallas re-design of the capabilities of
``nothingstopsme/tf_flash_attention`` (rule-based masked flash attention
with sequence-sync modes, 1d/2d sequences, forward + recompute backward),
extended with the TPU-first production stack: sharding (data/head/context
parallel, ring attention), quantized KV-cache decode serving, and analytic
FLOPs/roofline accounting.
"""

from .api import (  # noqa: F401
    full_1d,
    causal_1d,
    local_1d,
    full_2d,
    causal_2d,
    local_2d,
    flash_attention,
)
from .mask_rules import FullRule, CausalRule, LocalRule, make_rule  # noqa: F401
from .sync_modes import make_sync_pack, SYNC_MODES  # noqa: F401

__version__ = "0.1.0"
