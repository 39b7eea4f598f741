"""Uniform random rotations (reference dev_fn/transform/random.py/random_np.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.transforms import quat_to_rotmat


def random_quat(key: jax.Array, shape: tuple[int, ...] = ()) -> jax.Array:
    """Uniform unit quaternions (w,x,y,z) via the Shoemake subgroup method."""
    k1, k2, k3 = jax.random.split(key, 3)
    u1 = jax.random.uniform(k1, shape)
    u2 = jax.random.uniform(k2, shape, minval=0.0, maxval=2 * jnp.pi)
    u3 = jax.random.uniform(k3, shape, minval=0.0, maxval=2 * jnp.pi)
    a = jnp.sqrt(1.0 - u1)
    b = jnp.sqrt(u1)
    return jnp.stack(
        (b * jnp.cos(u3), a * jnp.sin(u2), a * jnp.cos(u2), b * jnp.sin(u3)), axis=-1
    )


def random_rotmat(key: jax.Array, shape: tuple[int, ...] = ()) -> jax.Array:
    return quat_to_rotmat(random_quat(key, shape))
