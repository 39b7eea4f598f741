"""Batch casting/placement helpers (reference dev_fn/transform/cast.py:76
`map_copy_select_to` — the batch->device idiom used by every launcher)."""

from __future__ import annotations

from typing import Any, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp


def map_copy_select_to(
    mapping: dict[str, Any],
    *,
    select: Iterable[str],
    dtype: Optional[jnp.dtype] = None,
    sharding=None,
) -> dict[str, Any]:
    """Copy the selected keys of a host batch to device arrays (optionally
    casting float dtypes and applying a sharding); other keys pass through."""
    select = set(select)
    out: dict[str, Any] = {}
    for k, v in mapping.items():
        if k in select:
            a = jnp.asarray(np.asarray(v))
            if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
                a = a.astype(dtype)
            if sharding is not None:
                a = jax.device_put(a, sharding)
            out[k] = a
        else:
            out[k] = v
    return out
