"""Determinism / seeding (reference dev_fn/util/random_util.setup_seed with
per-rank offsets, launch/train.py:486-489).

JAX is deterministic by construction given explicit PRNG keys; this module
covers the host-side RNG surface (numpy, python random, data-loader shuffles)
and hands out the root device key.
"""

from __future__ import annotations

import random

import numpy as np
import jax


def setup_seed(seed: int, process_offset: bool = True) -> jax.Array:
    """Seed host RNGs (per-process offset like the reference's rank offset)
    and return the root jax PRNG key."""
    eff = seed + (jax.process_index() if process_offset else 0)
    random.seed(eff)
    np.random.seed(eff % (2**32))
    return jax.random.PRNGKey(eff)
