"""Fused bidirectional nearest-neighbor (chamfer) Pallas TPU kernel.

Replaces the reference's CUDA chamfer extension (thirdparty/chamfer_distance,
wrapped at model/loss/chamfer_distance.py) on its hot path: the h2o/o2h signed
distances computed per frame between 778 hand verts and nobj*8192 object
points (segment_refine_model.py:142-168, extra_loss.py:146-178).

Why a kernel: the pairwise [P1, P2] distance matrix (25 MB/frame at P2=8192)
must never be materialized in HBM; each [P1, TILE] distance block lives only
in VMEM and both directions' running min/argmin accumulate in place.

MEASURED (v5e, F=160 P1=778 P2=8192): XLA's lax.scan streaming formulation in
core/geometry.py compiles to a fully-fused bandwidth-bound program
(~57us steady-state ~= HBM-roundtrip speed-of-light for the ~50 MB touched),
while this kernel's lane-dim argmin + broadcast relayouts run ~1ms. The XLA
path therefore REMAINS THE DEFAULT everywhere; this kernel is kept as the
explicit-VMEM implementation and a baseline for future kernel work.

Compute/TPU layout:
- x (hand verts) ride sublane-major as [P1p, 3] per frame (P1p = 778 -> 896);
- y (object points) ride lane-major as [3, TILE];
- the [P1p, TILE] distance block is built by VPU broadcasts
  (dx^2 + dy^2 + dz^2) — the contraction dim is 3, so the MXU has nothing to
  win; the op is VPU/bandwidth-bound;
- outputs are lane-major [1, P1p] / [1, TILE] rows; grid = (frames, y tiles)
  with frame-indexed output blocks so the running h2o min/argmin stay resident
  in VMEM across the tile loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nn_kernel(x_ref, yt_ref, yv_ref, h2o_d_ref, h2o_i_ref, o2h_d_ref, o2h_i_ref):
    """One (frame, y-tile) grid step.

    x_ref:   [1, P1p, 3] hand verts (pad rows = +1e6)
    yt_ref:  [1, 3, TILE] object tile, coordinate-major
    yv_ref:  [1, 1, TILE] validity (0 for padded object points)
    h2o_d/i: [1, 1, P1p] running min sq-dist / argmin over ALL y tiles
    o2h_d/i: [1, 1, TILE] per-tile min sq-dist / argmin over x
    """
    c = pl.program_id(1)
    x = x_ref[0]  # [P1p, 3]
    tile = yt_ref.shape[2]

    # pairwise squared distances via VPU broadcasts: [P1p, TILE]
    d = jnp.zeros((x.shape[0], tile), jnp.float32)
    for k in range(3):
        diff = x[:, k : k + 1] - yt_ref[0, k : k + 1, :]
        d += diff * diff

    yv = yv_ref[0]  # [1, TILE]
    d_masked = jnp.where(yv > 0, d, BIG)

    # h2o: running min over tiles
    tile_min = jnp.min(d_masked, axis=1)  # [P1p]
    tile_arg = jnp.argmin(d_masked, axis=1).astype(jnp.int32) + c * tile

    @pl.when(c == 0)
    def _():
        h2o_d_ref[0, 0, :] = tile_min
        h2o_i_ref[0, 0, :] = tile_arg

    @pl.when(c > 0)
    def _():
        prev = h2o_d_ref[0, 0, :]
        upd = tile_min < prev
        h2o_d_ref[0, 0, :] = jnp.where(upd, tile_min, prev)
        h2o_i_ref[0, 0, :] = jnp.where(upd, tile_arg, h2o_i_ref[0, 0, :])

    # o2h: per-y-point min over all x (x fully resident)
    o2h_d_ref[0, 0, :] = jnp.min(d, axis=0)
    o2h_i_ref[0, 0, :] = jnp.argmin(d, axis=0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def nn_bidirectional_pallas(
    x: jax.Array,  # [F, P1, 3] hand verts
    y: jax.Array,  # [F, P2, 3] object points
    y_valid: jax.Array | None = None,  # [F, P2] bool
    *,
    tile: int = 2048,
    interpret: bool = False,
):
    """Bidirectional NN: (h2o_sqdist [F,P1], h2o_idx [F,P1],
    o2h_sqdist [F,P2], o2h_idx [F,P2]). Invalid y handled via y_valid."""
    F, P1, _ = x.shape
    P2 = y.shape[1]
    P1p = _round_up(P1, 128)
    P2p = _round_up(P2, tile)

    if y_valid is None:
        y_valid = jnp.ones((F, P2), bool)
    if P1p != P1:
        x = jnp.concatenate([x, jnp.full((F, P1p - P1, 3), 1e6, x.dtype)], axis=1)
    if P2p != P2:
        y = jnp.concatenate([y, jnp.zeros((F, P2p - P2, 3), y.dtype)], axis=1)
        y_valid = jnp.concatenate([y_valid, jnp.zeros((F, P2p - P2), bool)], axis=1)

    yt = jnp.swapaxes(y.astype(jnp.float32), 1, 2)  # [F, 3, P2p]
    yv = y_valid.astype(jnp.int32)[:, None, :]  # [F, 1, P2p]

    n_tiles = P2p // tile
    grid = (F, n_tiles)

    out_shape = (
        jax.ShapeDtypeStruct((F, 1, P1p), jnp.float32),
        jax.ShapeDtypeStruct((F, 1, P1p), jnp.int32),
        jax.ShapeDtypeStruct((F, 1, P2p), jnp.float32),
        jax.ShapeDtypeStruct((F, 1, P2p), jnp.int32),
    )
    h2o_d, h2o_i, o2h_d, o2h_i = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, P1p, 3), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tile), lambda f, c: (f, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda f, c: (f, 0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda f, c: (f, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda f, c: (f, 0, c), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(x.astype(jnp.float32), yt, yv)

    return (
        h2o_d[:, 0, :P1],
        h2o_i[:, 0, :P1],
        o2h_d[:, 0, :P2],
        o2h_i[:, 0, :P2],
    )


def point2point_signed_pallas(
    x: jax.Array,  # [N, P1, 3]
    y: jax.Array,  # [N, P2, 3]
    x_normals: jax.Array | None = None,
    y_valid: jax.Array | None = None,
    *,
    tile: int = 2048,
    interpret: bool = False,
):
    """Drop-in for core.geometry.point2point_signed backed by the fused kernel.
    Returns (y2x_signed [N,P2], x2y_signed [N,P1], yidx_near [N,P2])."""
    h2o_d, h2o_i, o2h_d, o2h_i = nn_bidirectional_pallas(
        x, y, y_valid, tile=tile, interpret=interpret
    )

    x2y_dist = jnp.sqrt(jnp.maximum(h2o_d, 0.0))
    y2x_dist = jnp.sqrt(jnp.maximum(o2h_d, 0.0))

    # signs via normal . offset (chamfer wrapper semantics)
    x_near = jnp.take_along_axis(y, h2o_i[..., None], axis=1)  # nearest y per x
    y_near = jnp.take_along_axis(x, o2h_i[..., None], axis=1)  # nearest x per y
    x2y = x - x_near
    y2x = y - y_near

    if x_normals is not None:
        nn_ = jnp.take_along_axis(x_normals, o2h_i[..., None], axis=1)
        y2x_signed = y2x_dist * jnp.sign(jnp.sum(nn_ * y2x, axis=-1))
    else:
        y2x_signed = y2x_dist
    x2y_signed = x2y_dist  # no y normals in any TaMF call site

    if y_valid is not None:
        y2x_signed = jnp.where(y_valid, y2x_signed, 0.0)
    return y2x_signed, x2y_signed, o2h_i
