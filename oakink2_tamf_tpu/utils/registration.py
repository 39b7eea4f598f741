"""Rigid point-set registration (Kabsch/Umeyama), pure JAX.
(Reference dev_fn/transform/registration.py.)"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.transforms import assemble_T


def kabsch(src: jax.Array, dst: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """Least-squares rigid transform aligning src -> dst.

    src, dst: [..., N, 3]; weights: optional [..., N].
    Returns transf [..., 4, 4] with dst ~= src @ R^T + t.
    """
    if weights is None:
        w = jnp.ones(src.shape[:-1], src.dtype)
    else:
        w = weights
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)

    mu_s = jnp.sum(src * w[..., None], axis=-2, keepdims=True)
    mu_d = jnp.sum(dst * w[..., None], axis=-2, keepdims=True)
    sc = src - mu_s
    dc = dst - mu_d

    H = jnp.einsum("...ni,...nj->...ij", sc * w[..., None], dc)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", Vt.swapaxes(-1, -2), U.swapaxes(-1, -2)))
    S = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), H.shape).copy()
    S = S.at[..., 2, 2].set(det)
    R = jnp.einsum("...ji,...jk,...lk->...il", Vt, S, U)
    t = mu_d[..., 0, :] - jnp.einsum("...ij,...j->...i", R, mu_s[..., 0, :])
    return assemble_T(t, R)
