r"""Guarded distributed helpers — the reference shim, jax.distributed-flavored.

Reference: ``torchebm/distributed.py:15-88``. Every helper degrades to an
identity/no-op in single-process runs; none of them is required by any default
``sample()``/loss path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = [
    "is_distributed",
    "get_rank",
    "get_world_size",
    "all_gather_cat",
    "broadcast_object",
    "psum_mean",
]


def is_distributed() -> bool:
    """True in a multi-process (multi-host) run (reference ``distributed.py:24-26``)."""
    return jax.process_count() > 1


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def all_gather_cat(x: Array, axis_name: str = "data", tiled: bool = True) -> Array:
    """All-gather + concat along dim 0 **inside** a ``shard_map``/``pmap`` body.

    The explicit-collective form of the reference's ``all_gather_cat``
    (``distributed.py:39-66``). Outside a mapped context (no axis bound),
    returns ``x`` unchanged — the single-process identity fallback. Note that
    under plain ``jit`` over sharded arrays this helper is unnecessary: XLA
    inserts the gather wherever the program consumes the global batch.
    """
    try:
        return jax.lax.all_gather(x, axis_name, axis=0, tiled=tiled)
    except NameError:
        return x


def psum_mean(x: Array, axis_name: str = "data") -> Array:
    """Cross-device mean inside a mapped context; identity when unmapped."""
    try:
        return jax.lax.pmean(x, axis_name)
    except NameError:
        return x


def broadcast_object(obj, src: int = 0):
    """Broadcast a picklable host object from ``src`` to all processes.

    Reference ``distributed.py:69-88``; single-process identity.
    """
    if not is_distributed():
        return obj
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(obj, is_source=get_rank() == src)
