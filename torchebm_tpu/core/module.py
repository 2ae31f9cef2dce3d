r"""Cross-cutting module-level helpers.

The reference's ``TorchEBMModule`` (``core/base_module.py:52-176``) exists to
solve torch-specific problems — device/dtype resolution from parameters,
``.to()`` cache invalidation, conditioning-dict device moves, CUDA autocast.
None of those have JAX analogues (placement is shardings, dtype follows
inputs, bf16 needs no autocast), so the class dissolves; what remains useful
is :func:`warn_once` (``base_module.py:33-49``): per-process once-only
warnings keyed by string, avoiding hot-loop ``warnings.warn`` overhead.
"""

from __future__ import annotations

import warnings
from typing import Set

__all__ = ["warn_once"]

_WARNED: Set[str] = set()


def warn_once(key: str, message: str, category=DeprecationWarning) -> None:
    """Emit ``message`` at most once per process for a given ``key``."""
    if key in _WARNED:
        return
    _WARNED.add(key)
    warnings.warn(message, category, stacklevel=3)
