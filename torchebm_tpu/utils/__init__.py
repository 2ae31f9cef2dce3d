"""Training + profiling utilities (reference ``torchebm/utils/__init__.py:10-16``)."""

from .data import prefetch_to_device, stack_batches
from .precision import Policy, bf16_policy, cast_floating, f32_policy
from .profiling import benchmark_fn, profile_context, record_function
from .training import (
    freeze_mask,
    latest_checkpoint_step,
    load_checkpoint,
    save_checkpoint,
    update_ema,
)

__all__ = [
    "stack_batches",
    "prefetch_to_device",
    "update_ema",
    "freeze_mask",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint_step",
    "profile_context",
    "record_function",
    "benchmark_fn",
    "Policy",
    "bf16_policy",
    "f32_policy",
    "cast_floating",
]
