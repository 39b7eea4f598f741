"""Cluster-pruned nearest-neighbor (chamfer) Pallas TPU kernels.

The all-pairs kernel in ops/chamfer_pallas.py is OUTPUT-RATE-bound on the MXU:
each [128, 128] distance tile costs a full systolic pass regardless of the
K=5 augmented contraction depth, so a frame of 896x16384 pairs costs ~896
output tiles no matter how it is tiled (chamfer_pallas.py:74-89). Going
materially faster means NOT computing all pairs. This module prunes with a
two-stage cluster bound — exactly, not approximately:

1. y is partitioned into contiguous cells of S=128 points; per-cell stats
   (center, radius, one representative point) are computed per frame in XLA.
   TaMF's object clouds are rigidly-transformed canonical clouds
   (models/refine_r.multi_object_h2o_dist): cell membership is frame-constant,
   radii are rigid-invariant, and data/collate.py spatially sorts the
   canonical clouds (utils/pc_util.spatial_sort_indices) so contiguous cells
   are compact — tighter cells prune harder (correctness never depends on it).
2. Hand verts are Morton-sorted per frame (cheap argsort of interleaved-bit
   keys) so each 128-vert x tile is spatially compact, then per tile:
   ub_i = min_c d(x_i, rep_c) (a REAL point per cell — much tighter than
   center+radius) bounds the NN distance from above; cell c is a candidate
   iff d(x_i, center_c) <= ub_i + r_c for ANY vert of the tile. Candidates
   are compacted into per-(frame, tile) SMEM index lists; the kernel loops
   ONLY over candidates with a dynamic-trip fori_loop, one [S, 128] MXU block
   each.

Exactness sketch (valid vert i): ub_i >= d(i, NN) because reps are real valid
points; if NN's cell c* were excluded then d(i, center_c*) > ub_i + r_c* >=
d(i, NN) + r_c* >= d(i, center_c*) — contradiction. Pad/invalid y points
carry ||y||^2 = +BIG inside candidate cells (chamfer_pallas's validity trick);
all-invalid cells never become candidates.

LAYOUT IS THE OTHER HALF OF THE WIN. Any [*, 3]-minor f32 array is tile-
padded 3 -> 128 on TPU (a measured 42x HBM blowup, chamfer_pallas.py:22-28),
so prep/stat passes over [F, P2, 3] clouds cost more than the pruned kernel
itself (measured 40 + 31 ms vs ~30 ms of exact-kernel compute at F=256,
2x8192 pts). Everything here therefore runs coordinate-major: callers that
produce y by transforming canonical clouds should hand over `yT` [F, 3, P2]
directly (multi_object_h2o_dist emits it straight out of the rigid-transform
einsum — the [F, P2, 3] monster never exists); cell stats, bounds, kernels
and gradients all stay in [.., 3|5, P]-major shapes.

The backward prunes harder still: it only needs OWNER blocks — (x-tile, cell)
pairs that actually contain a nearest neighbor (h2o_idx // S, typically <= 8
cells/tile vs 128) — as one-hot MXU contractions.

tests/test_chamfer_cluster.py A/Bs every output and gradient against the
exact all-pairs kernels. Reference hot spots replaced at production shapes
(2 x 8192 points): model/loss/chamfer_distance.py:4-62,
segment_refine_model.py:142-168.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e30
S_CELL = 128  # y points per cell == one MXU output tile of x-tile pairs


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _dot(a, b, dims):
    """MXU matmul at HIGHEST precision (see chamfer_pallas._dot: the distance
    expansion is cancellation-limited; per-frame centering keeps magnitudes
    small so the ~2^-24 relative error stays below contact scales)."""
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _cost(flops: float, *arrays) -> "pl.CostEstimate":
    return pl.CostEstimate(
        flops=int(flops),
        transcendentals=0,
        bytes_accessed=int(
            sum(a.size * a.dtype.itemsize for a in arrays if a is not None)
        ),
    )


# ---------------------------------------------------------------------------
# Morton ordering of hand verts (per frame)
# ---------------------------------------------------------------------------


def _morton_perm(xT: jax.Array) -> jax.Array:
    """xT [F, 3, P1] -> perm [F, P1] sorting verts along a 3-D Morton curve of
    their own bounding box, so contiguous 128-vert tiles are spatially compact
    (tile candidate sets shrink to ~per-vert size). Pure int ops + argsort."""
    mn = jnp.min(xT, axis=2, keepdims=True)
    mx = jnp.max(xT, axis=2, keepdims=True)
    q = ((xT - mn) / jnp.maximum(mx - mn, 1e-9) * 255.0).astype(jnp.int32)  # [F,3,P1]
    key = jnp.zeros((q.shape[0], q.shape[2]), jnp.int32)  # [F, P1]
    for b in range(8):
        for c in range(3):
            key = key | (((q[:, c] >> b) & 1) << (3 * b + c))
    return jnp.argsort(key, axis=1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Stage 1 (XLA, coordinate-major): cell stats + candidate compaction
# ---------------------------------------------------------------------------


def _cell_stats_T(yT: jax.Array, y_valid: jax.Array):
    """yT [F, 3, Cp*S], y_valid [F, Cp*S] -> (centers [F, 3, C], radius [F, C],
    reps [F, 3, C] one valid representative point per cell, nonempty [F, C]).

    Stats over VALID members only. Every intermediate keeps the point axis
    minor (lane-major) — no [.., 3]-minor temps."""
    F, _, P2p = yT.shape
    C = P2p // S_CELL
    yr = yT.reshape(F, 3, C, S_CELL)
    vr = y_valid.reshape(F, C, S_CELL)
    cnt = jnp.sum(vr, axis=-1)  # [F, C]
    vf = vr[:, None].astype(yT.dtype)  # [F, 1, C, S]
    center = jnp.sum(yr * vf, axis=3) / jnp.maximum(cnt, 1)[:, None]  # [F, 3, C]
    d2 = jnp.sum((yr - center[..., None]) ** 2, axis=1)  # [F, C, S]
    d2v = jnp.where(vr, d2, 0.0)
    radius = jnp.sqrt(jnp.max(d2v, axis=-1))  # [F, C]
    # representative = the valid member closest to the center (tight ub anchor)
    rep_i = jnp.argmin(jnp.where(vr, d2, jnp.inf), axis=-1)  # [F, C]
    reps = jnp.take_along_axis(yr, rep_i[:, None, :, None], axis=3)[..., 0]  # [F,3,C]
    return center, radius, reps, cnt > 0


def _chunked_frames(fn, F: int, chunk: int, *args):
    """lax.map `fn` (vmapped over frames) over F in `chunk`-frame slabs so the
    [chunk, P1, C] intermediates never materialize at full F."""
    chunk = min(chunk, F)
    Fp = _round_up(F, chunk)
    if Fp != F:
        args = tuple(jnp.pad(a, ((0, Fp - F),) + ((0, 0),) * (a.ndim - 1)) for a in args)
    shaped = tuple(a.reshape((Fp // chunk, chunk) + a.shape[1:]) for a in args)
    out = jax.lax.map(lambda sl: jax.vmap(fn)(*sl), shaped)
    out = jax.tree.map(lambda o: o.reshape((Fp,) + o.shape[2:])[:F], out)
    return out


def _h2o_candidates(
    xT: jax.Array,  # [F, 3, P1p] coordinate-major (pad lanes arbitrary)
    x_valid: np.ndarray,  # [P1p] static bool
    centers: jax.Array,  # [F, 3, C]
    radius: jax.Array,  # [F, C]
    reps: jax.Array,  # [F, 3, C]
    nonempty: jax.Array,  # [F, C]
    *,
    frame_chunk: int = 256,
):
    """-> (cidx [F, T, C] i32 candidates-first order, ccount [F, T, 1]).

    All comparisons stay in SQUARED distance except one [P1p]-sized sqrt:
    cand <=> d(x, center_c) <= ub + r_c <=> dsq_center <= (ub + r_c)^2."""
    F, _, P1p = xT.shape
    T = P1p // 128
    C = centers.shape[2]
    xv = jnp.asarray(np.asarray(x_valid).reshape(T, 128))

    def one(xf, cf, rf, pf, nef):
        # xf [3, P1p]; cf/pf [3, C]
        xsq = jnp.sum(xf * xf, axis=0)  # [P1p]
        csq = jnp.sum(cf * cf, axis=0)  # [C]
        psq = jnp.sum(pf * pf, axis=0)
        dsq_c = xsq[:, None] + csq[None, :] - 2.0 * _dot(xf, cf, ((0,), (0,)))
        dsq_p = xsq[:, None] + psq[None, :] - 2.0 * _dot(xf, pf, ((0,), (0,)))
        dsq_p = jnp.where(nef[None, :], dsq_p, BIG)
        ub2 = jnp.min(dsq_p, axis=-1)  # [P1p]
        ub = jnp.sqrt(jnp.maximum(ub2, 0.0))
        any_cell = jnp.any(nef)
        thr = (ub[:, None] + rf[None, :] + 1e-6) ** 2 * (1.0 + 1e-5)
        thr = jnp.where(any_cell & nef[None, :], thr, -1.0)
        cand = dsq_c <= thr  # [P1p, C]
        candr = cand.reshape(T, 128, C) & xv[:, :, None]
        tile_cand = jnp.any(candr, axis=1)  # [T, C]
        order = jnp.argsort(~tile_cand, axis=-1, stable=True).astype(jnp.int32)
        count = jnp.sum(tile_cand, axis=-1).astype(jnp.int32)
        return order, count[:, None]  # [T, 1]: SMEM blocks need a trailing unit dim

    return _chunked_frames(one, F, frame_chunk, xT, centers, radius, reps, nonempty)


def _owner_lists(owner: jax.Array, weight_live: jax.Array, C: int):
    """Backward compaction. owner [F, T, 128] (cell id per vert), weight_live
    [F, T, 128] bool (vert carries a nonzero cotangent) ->
    (bidx [F, T, C] owners-first order, bcount [F, T, 1])."""
    F, T, _ = owner.shape
    rows = jnp.arange(F * T, dtype=jnp.int32)[:, None]
    hit = jnp.zeros((F * T, C), bool).at[
        rows, jnp.where(weight_live, owner, 0).reshape(F * T, 128)
    ].max(weight_live.reshape(F * T, 128))
    order = jnp.argsort(~hit, axis=-1, stable=True).astype(jnp.int32).reshape(F, T, C)
    count = jnp.sum(hit, axis=-1).astype(jnp.int32).reshape(F, T, 1)
    return order, count


# ---------------------------------------------------------------------------
# Operand prep (coordinate-major end to end)
# ---------------------------------------------------------------------------


def _as_yT(y, yT, y_valid):
    """Accept either layout; prefer the caller's coordinate-major yT."""
    if yT is None:
        yT = jnp.swapaxes(y.astype(jnp.float32), 1, 2)  # one-time 42x-padded read
    else:
        yT = yT.astype(jnp.float32)
    F, _, P2 = yT.shape
    if y_valid is None:
        y_valid = jnp.ones((F, P2), bool)
    return yT, y_valid


def _prep_cluster_operands(xT, yT, y_valid):
    """xT [F,3,P1p] (already Morton-permuted + padded), yT [F,3,P2] ->
    (xa [F,5,P1p], ya_cells [F,C,5,S], stats..., dims). Per-frame centering on
    the y mean (cancellation control, chamfer_pallas._prep_operands)."""
    F, _, P1p = xT.shape
    P2 = yT.shape[2]
    P2p = _round_up(P2, S_CELL)
    C = P2p // S_CELL

    ctr = jnp.mean(yT, axis=2, keepdims=True)  # [F, 3, 1]
    xT = xT - ctr
    yT = yT - ctr
    if P2p != P2:
        yT = jnp.pad(yT, ((0, 0), (0, 0), (0, P2p - P2)))
        y_valid = jnp.pad(y_valid, ((0, 0), (0, P2p - P2)))

    centers, radius, reps, nonempty = _cell_stats_T(yT, y_valid)

    xsq = jnp.sum(xT * xT, axis=1)  # [F, P1p] (pad lanes overwritten by caller)
    xa = jnp.concatenate(
        [-2.0 * xT, xsq[:, None], jnp.ones((F, 1, P1p), jnp.float32)], axis=1
    )  # [F, 5, P1p]

    ysq = jnp.sum(yT * yT, axis=1)
    ysq = jnp.where(y_valid, ysq, BIG)  # invalid points lose inside any cell
    ya = jnp.concatenate(
        [yT, jnp.ones((F, 1, P2p), jnp.float32), ysq[:, None]], axis=1
    )  # [F, 5, P2p]
    ya_cells = ya.reshape(F, 5, C, S_CELL).swapaxes(1, 2)  # [F, C, 5, S]
    return xa, ya_cells, xT, yT, centers, radius, reps, nonempty, (F, P2, P2p, C)


# ---------------------------------------------------------------------------
# Forward kernel (h2o direction)
# ---------------------------------------------------------------------------


def _h2o_cluster_kernel(cidx_ref, cnt_ref, xa_ref, ya_ref, d_ref, i_ref):
    """One frame per grid step.

    cidx: [1, T, C] SMEM candidate cell ids (candidates-first)
    cnt:  [1, T, 1] SMEM candidate counts
    xa:   [1, 5, P1p] VMEM augmented hand verts
    ya:   [1, C, 5, S] VMEM augmented object cells
    d/i:  [1, T, 128] running min sq-dist / global argmin per x tile
    """
    T = d_ref.shape[1]

    for t in range(T):  # static unroll (T = 7 at 778 verts)
        xa_t = xa_ref[0, :, t * 128 : (t + 1) * 128]  # [5, 128]
        n = cnt_ref[0, t, 0]

        def body(k, carry):
            best_d, best_i = carry
            c = cidx_ref[0, t, k]
            ya_c = ya_ref[0, pl.ds(c, 1)][0]  # [5, S]
            d = _dot(ya_c, xa_t, ((0,), (0,)))  # [S, 128]
            m = jnp.min(d, axis=0, keepdims=True)  # [1, 128]
            a = jnp.argmin(d, axis=0).astype(jnp.int32)[None, :] + c * S_CELL
            upd = m < best_d
            return jnp.where(upd, m, best_d), jnp.where(upd, a, best_i)

        best_d, best_i = jax.lax.fori_loop(
            0, n, body,
            (jnp.full((1, 128), BIG, jnp.float32), jnp.zeros((1, 128), jnp.int32)),
        )
        d_ref[0, t] = best_d[0]
        i_ref[0, t] = best_i[0]


def _h2o_cluster_forward(xT_perm, x_valid, yT, y_valid, interpret):
    """xT_perm [F, 3, P1p] Morton-permuted coordinate-major hand verts."""
    xa, ya_cells, xTc, _, centers, radius, reps, nonempty, (F, P2, P2p, C) = (
        _prep_cluster_operands(xT_perm, yT, y_valid)
    )
    P1p = xT_perm.shape[2]
    T = P1p // 128
    # pad lanes lose every comparison (and are excluded from tile unions)
    xa = jnp.where(
        jnp.asarray(x_valid)[None, None, :], xa,
        jnp.asarray([0.0, 0.0, 0.0, BIG, 1.0], jnp.float32)[None, :, None],
    )
    cidx, ccount = _h2o_candidates(xTc, x_valid, centers, radius, reps, nonempty)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda f: (f, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, 1), lambda f: (f, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 5, P1p), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 5, S_CELL), lambda f: (f, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, 128), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 128), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    h2o_d, h2o_i = pl.pallas_call(
        _h2o_cluster_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((F, T, 128), jnp.float32),
            jax.ShapeDtypeStruct((F, T, 128), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        # candidate-dependent; estimate ~1/8 of all pairs for scheduling
        cost_estimate=_cost(10 * F * P1p * P2p // 8, xa, ya_cells),
        interpret=interpret,
    )(cidx, ccount, xa, ya_cells)
    return h2o_d.reshape(F, P1p), h2o_i.reshape(F, P1p)


# ---------------------------------------------------------------------------
# Backward kernel (h2o direction, owner-pruned)
# ---------------------------------------------------------------------------


def _h2o_cluster_bwd_kernel(
    bidx_ref, bcnt_ref, xt_ref, yt_ref, h2oi_ref, xr_ref, gx_ref, gy_ref
):
    """Owner-block backward: gx_i = xr_i*(x_i - y_{j*}), gy_{j*} -= same —
    one-hot MXU contractions restricted to the blocks that contain a nearest
    neighbor (vs chamfer_pallas._nn_h2o_bwd_kernel over ALL blocks).

    bidx/bcnt: [1, T, C]/[1, T, 1] SMEM owner cell lists
    xt: [1, 3, P1p]; yt: [1, C, 3, S]; h2oi/xr: [1, T, 128]
    gx: [1, 3, P1p]; gy: [1, C, 3, S] (zero-filled first, accumulated)
    """
    T = h2oi_ref.shape[1]

    gy_ref[...] = jnp.zeros_like(gy_ref)

    for t in range(T):
        xt_t = xt_ref[0, :, t * 128 : (t + 1) * 128]  # [3, 128]
        h2oi_t = h2oi_ref[0, t][None, :]  # [1, 128]
        xr_t = xr_ref[0, t][None, :]  # [1, 128]
        n = bcnt_ref[0, t, 0]

        def body(k, gx_acc):
            c = bidx_ref[0, t, k]
            yt_c = yt_ref[0, pl.ds(c, 1)][0]  # [3, S]
            rows = (
                jax.lax.broadcasted_iota(jnp.int32, (S_CELL, 128), 0) + c * S_CELL
            )
            M2 = (rows == h2oi_t).astype(jnp.float32)  # [S, 128]
            y_at = _dot(yt_c, M2, ((1,), (0,)))  # [3, 128] (0 off-owner)
            owner = ((h2oi_t >= c * S_CELL) & (h2oi_t < (c + 1) * S_CELL)).astype(
                jnp.float32
            )
            u2 = xr_t * (owner * xt_t - y_at)  # [3, 128], zero off-owner
            gy_ref[0, pl.ds(c, 1)] -= _dot(u2, M2, ((1,), (1,)))[None]  # [1,3,S]
            return gx_acc + u2

        gx_t = jax.lax.fori_loop(0, n, body, jnp.zeros((3, 128), jnp.float32))
        gx_ref[0, :, t * 128 : (t + 1) * 128] = gx_t


def _h2o_cluster_backward(xT_perm, yT, h2o_i, xr, interpret):
    """xT_perm [F,3,P1p] permuted; h2o_i/xr [F, P1p] in PERMUTED vert order.
    -> (gx [F, 3, P1p] permuted order, gyT [F, 3, P2])."""
    F, _, P1p = xT_perm.shape
    P2 = yT.shape[2]
    P2p = _round_up(P2, S_CELL)
    C = P2p // S_CELL
    T = P1p // 128

    yTp = yT.astype(jnp.float32)
    if P2p != P2:
        yTp = jnp.pad(yTp, ((0, 0), (0, 0), (0, P2p - P2)))
    yt_cells = yTp.reshape(F, 3, C, S_CELL).swapaxes(1, 2)  # [F, C, 3, S]

    h2oi = h2o_i.reshape(F, T, 128)
    xrr = xr.reshape(F, T, 128)
    bidx, bcount = _owner_lists(h2oi // S_CELL, xrr != 0.0, C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda f: (f, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, 1), lambda f: (f, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, P1p), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 3, S_CELL), lambda f: (f, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 128), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 128), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, P1p), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 3, S_CELL), lambda f: (f, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    gx, gy = pl.pallas_call(
        _h2o_cluster_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((F, 3, P1p), jnp.float32),
            jax.ShapeDtypeStruct((F, C, 3, S_CELL), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=_cost(13 * F * P1p * P2p // 16, xT_perm, yt_cells, h2oi, xrr),
        interpret=interpret,
    )(bidx, bcount, xT_perm.astype(jnp.float32), yt_cells, h2oi, xrr)

    gyT = gy.swapaxes(1, 2).reshape(F, 3, P2p)[:, :, :P2]
    return gx, gyT


# ---------------------------------------------------------------------------
# Public h2o-only entry (custom VJP)
# ---------------------------------------------------------------------------


def point2point_h2o_cluster(
    x: jax.Array,  # [N, P1, 3] hand verts
    y: jax.Array | None = None,  # [N, P2, 3] object points, OR pass yT
    y_valid: jax.Array | None = None,
    *,
    yT: jax.Array | None = None,  # [N, 3, P2] coordinate-major (preferred)
    interpret: bool = False,
) -> jax.Array:
    """Unsigned x->y nearest distances [N, P1] via cluster-pruned search.

    Matches ops.chamfer_pallas.point2point_h2o_pallas / the XLA path to float
    tolerance (exact pruning; argmin TIES may resolve to a different equal
    minimizer). Same custom-VJP contract: NN indices are constants of the
    backward pass. Prefer passing `yT` — see the module docstring's layout
    section; gradients then flow to yT."""
    yTv, y_valid = _as_yT(y, yT, y_valid)
    return _p2h_cluster_core(x, yTv, y_valid, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _p2h_cluster_core(x, yT, y_valid, interpret):
    out, _ = _p2h_cluster_fwd(x, yT, y_valid, interpret)
    return out


def _x_perm_pad(x):
    """x [F, P1, 3] -> (xT_perm [F, 3, P1p], perm [F, P1], x_valid [P1p])."""
    F, P1, _ = x.shape
    P1p = _round_up(P1, 128)
    xT = jnp.swapaxes(x.astype(jnp.float32), 1, 2)  # [F, 3, P1] (small)
    perm = _morton_perm(xT)  # [F, P1]
    xTs = jnp.take_along_axis(xT, perm[:, None, :], axis=2)
    if P1p != P1:
        xTs = jnp.pad(xTs, ((0, 0), (0, 0), (0, P1p - P1)))
    x_valid = np.zeros(P1p, bool)
    x_valid[:P1] = True
    return xTs, perm, x_valid


def _p2h_cluster_fwd(x, yT, y_valid, interpret):
    F, P1, _ = x.shape
    xTs, perm, x_valid = _x_perm_pad(x)
    h2o_d, h2o_i = _h2o_cluster_forward(xTs, x_valid, yT, y_valid, interpret)
    inv = jnp.argsort(perm, axis=1)  # unsort back to MANO vert order
    x2y_dist = jnp.sqrt(jnp.maximum(jnp.take_along_axis(h2o_d[:, :P1], inv, 1), 0.0))

    from jax.ad_checkpoint import checkpoint_name

    x2y_dist = checkpoint_name(x2y_dist, "chamfer_res")
    h2o_i_s = checkpoint_name(h2o_i, "chamfer_res")  # PERMUTED order residual
    perm = checkpoint_name(perm, "chamfer_res")
    return x2y_dist, (x, yT, x2y_dist, h2o_i_s, perm)


def _p2h_cluster_bwd(interpret, residuals, cotangents):
    x, yT, x2y_dist, h2o_i_s, perm = residuals
    F, P1, _ = x.shape
    P1p = h2o_i_s.shape[1]
    xr = cotangents / jnp.maximum(x2y_dist, 1e-12)  # [F, P1] original order
    xr_s = jnp.take_along_axis(xr, perm, axis=1)  # permuted order
    if P1p != P1:
        xr_s = jnp.pad(xr_s, ((0, 0), (0, P1p - P1)))  # zero cotangents on pads
    xTs, _, _ = _x_perm_pad(x)  # recompute (cheap) rather than store
    gx_s, gyT = _h2o_cluster_backward(xTs, yT, h2o_i_s, xr_s, interpret)
    # un-permute gx lanes back to original vert order:
    # gx_orig[:, :, i] = gx_s[:, :, inv[f, i]] with inv = argsort(perm)
    inv = jnp.argsort(perm, axis=1)
    gx = jnp.take_along_axis(gx_s[:, :, :P1], inv[:, None, :], axis=2)
    g_valid = np.zeros((yT.shape[0], yT.shape[2]), dtype=jax.dtypes.float0)
    return jnp.swapaxes(gx, 1, 2), gyT, g_valid


_p2h_cluster_core.defvjp(_p2h_cluster_fwd, _p2h_cluster_bwd)


# ---------------------------------------------------------------------------
# Signed bidirectional variant (G's extra loss: o2h signed + h2o unsigned)
# ---------------------------------------------------------------------------


def _x_tile_stats(xT_perm: jax.Array, x_valid: np.ndarray):
    """xT_perm [F, 3, P1p] -> (centers [F,3,T], radius [F,T], reps [F,3,T],
    nonempty [T] static). Valid-lane masked; mirrors _cell_stats_T for x."""
    F, _, P1p = xT_perm.shape
    T = P1p // 128
    xr = xT_perm.reshape(F, 3, T, 128)
    vr = jnp.asarray(np.asarray(x_valid).reshape(T, 128))  # static
    cnt = jnp.sum(vr, axis=-1)  # [T] static-ish
    vf = vr[None, None].astype(xT_perm.dtype)
    center = jnp.sum(xr * vf, axis=3) / jnp.maximum(cnt, 1)[None, None]
    d2 = jnp.sum((xr - center[..., None]) ** 2, axis=1)  # [F, T, 128]
    rep_i = jnp.argmin(jnp.where(vr[None], d2, jnp.inf), axis=-1)  # [F, T]
    reps = jnp.take_along_axis(xr, rep_i[:, None, :, None], axis=3)[..., 0]
    radius = jnp.sqrt(jnp.max(jnp.where(vr[None], d2, 0.0), axis=-1))
    return center, radius, reps, np.asarray(x_valid).reshape(T, 128).any(axis=1)


def _o2h_candidates(
    y_centers, y_radius, y_nonempty,  # [F,3,C], [F,C], [F,C]
    x_centers, x_radius, x_reps, x_nonempty,  # [F,3,T], [F,T], [F,3,T], [T] static
    *,
    frame_chunk: int = 512,
):
    """Per y-cell candidate x-tiles: tile t is needed for cell cy iff
    d(c_cy, c_t) <= min_t' d(c_cy, rep_t') + 2 r_cy + r_t (+slack).
    (For y in cy: NN dist <= d(y, rep) <= d(c_cy, rep) + r_cy, and dist to
    tile t >= d(c_cy, c_t) - r_cy - r_t.)
    -> (cidx_y [F, C, T], cnt_y [F, C, 1])."""
    ne_x = jnp.asarray(x_nonempty)

    def one(cy, ry, ney, cx, rx, px):
        # cy [3,C]; cx/px [3,T]
        csq_y = jnp.sum(cy * cy, axis=0)  # [C]
        csq_x = jnp.sum(cx * cx, axis=0)  # [T]
        psq_x = jnp.sum(px * px, axis=0)
        dsq_cc = csq_y[:, None] + csq_x[None, :] - 2.0 * _dot(cy, cx, ((0,), (0,)))
        dsq_cr = csq_y[:, None] + psq_x[None, :] - 2.0 * _dot(cy, px, ((0,), (0,)))
        dsq_cr = jnp.where(ne_x[None, :], dsq_cr, BIG)
        minrep = jnp.sqrt(jnp.maximum(jnp.min(dsq_cr, axis=-1), 0.0))  # [C]
        thr = (minrep[:, None] + 2.0 * ry[:, None] + rx[None, :] + 1e-6) ** 2
        thr = thr * (1.0 + 1e-5)
        thr = jnp.where(ney[:, None] & ne_x[None, :], thr, -1.0)
        cand = dsq_cc <= thr  # [C, T]
        order = jnp.argsort(~cand, axis=-1, stable=True).astype(jnp.int32)
        count = jnp.sum(cand, axis=-1).astype(jnp.int32)
        return order, count[:, None]

    F = y_centers.shape[0]
    return _chunked_frames(
        one, F, frame_chunk, y_centers, y_radius, y_nonempty, x_centers, x_radius, x_reps
    )


def _signed_cluster_kernel(
    cidx_x_ref, cnt_x_ref, cidx_y_ref, cnt_y_ref,
    xa_t_ref, na_t_ref, ya_ref,
    h2o_d_ref, h2o_i_ref, o2h_d_ref, o2h_i_ref, o2h_s_ref,
):
    """One frame per grid step; both NN directions + the sign numerator.

    cidx_x/cnt_x: [1,T,C]/[1,T,1] SMEM h2o candidate cells per x tile
    cidx_y/cnt_y: [1,C,T]/[1,C,1] SMEM o2h candidate x tiles per y cell
    xa_t/na_t: [1,T,5,128] VMEM augmented verts / normals, tile-major
    ya: [1,C,5,S] VMEM augmented object cells
    h2o_d/i: [1,T,128]; o2h_d/i/s: [1,C,S]
    """
    T = h2o_d_ref.shape[1]
    C = o2h_d_ref.shape[1]

    # h2o direction (identical structure to _h2o_cluster_kernel)
    for t in range(T):
        xa_t = xa_t_ref[0, t]  # [5, 128]
        n = cnt_x_ref[0, t, 0]

        def body_x(k, carry):
            best_d, best_i = carry
            c = cidx_x_ref[0, t, k]
            ya_c = ya_ref[0, pl.ds(c, 1)][0]  # [5, S]
            d = _dot(ya_c, xa_t, ((0,), (0,)))  # [S, 128]
            m = jnp.min(d, axis=0, keepdims=True)
            a = jnp.argmin(d, axis=0).astype(jnp.int32)[None, :] + c * S_CELL
            upd = m < best_d
            return jnp.where(upd, m, best_d), jnp.where(upd, a, best_i)

        best_d, best_i = jax.lax.fori_loop(
            0, n, body_x,
            (jnp.full((1, 128), BIG, jnp.float32), jnp.zeros((1, 128), jnp.int32)),
        )
        h2o_d_ref[0, t] = best_d[0]
        h2o_i_ref[0, t] = best_i[0]

    # o2h direction + fused sign numerator at the argmin row
    def cell_body(c, _):
        ya_c = ya_ref[0, pl.ds(c, 1)][0]  # [5, S]
        n = cnt_y_ref[0, c, 0]

        def body_y(k, carry):
            best_d, best_i, best_s = carry
            t = cidx_y_ref[0, c, k]
            xa_t = xa_t_ref[0, pl.ds(t, 1)][0]  # [5, 128]
            na_t = na_t_ref[0, pl.ds(t, 1)][0]
            d = _dot(xa_t, ya_c, ((0,), (0,)))  # [128, S]
            s = _dot(na_t, ya_c, ((0,), (0,)))  # [128, S]
            m = jnp.min(d, axis=0, keepdims=True)  # [1, S]
            a_loc = jnp.argmin(d, axis=0).astype(jnp.int32)  # [S]
            a = a_loc[None, :] + t * 128
            rows = jax.lax.broadcasted_iota(jnp.int32, (128, S_CELL), 0)
            s_at = jnp.sum(
                jnp.where(rows == a_loc[None, :], s, 0.0), axis=0, keepdims=True
            )
            upd = m < best_d
            return (
                jnp.where(upd, m, best_d),
                jnp.where(upd, a, best_i),
                jnp.where(upd, s_at, best_s),
            )

        bd, bi, bs_ = jax.lax.fori_loop(
            0, n, body_y,
            (
                jnp.full((1, S_CELL), BIG, jnp.float32),
                jnp.zeros((1, S_CELL), jnp.int32),
                jnp.zeros((1, S_CELL), jnp.float32),
            ),
        )
        o2h_d_ref[0, pl.ds(c, 1)] = bd
        o2h_i_ref[0, pl.ds(c, 1)] = bi
        o2h_s_ref[0, pl.ds(c, 1)] = bs_
        return 0

    jax.lax.fori_loop(0, C, cell_body, 0)


def _signed_cluster_forward(xT_perm, x_valid, naT_perm, yT, y_valid, interpret):
    """-> (h2o_d [F,P1p], h2o_i, o2h_d [F,P2p], o2h_i, o2h_s), all in
    PERMUTED x index space / padded y space."""
    xa, ya_cells, xTc, yTc, centers, radius, reps, nonempty, (F, P2, P2p, C) = (
        _prep_cluster_operands(xT_perm, yT, y_valid)
    )
    P1p = xT_perm.shape[2]
    T = P1p // 128
    xa = jnp.where(
        jnp.asarray(x_valid)[None, None, :], xa,
        jnp.asarray([0.0, 0.0, 0.0, BIG, 1.0], jnp.float32)[None, :, None],
    )
    # augmented normals [n, -n.x, 0] against the SAME centered ya: the second
    # matmul yields n_i . y_j - n_i . x_i (chamfer_pallas._nn_kernel contract)
    ndx = -jnp.sum(naT_perm * xTc, axis=1)  # [F, P1p] (x centered in prep)
    na = jnp.concatenate(
        [naT_perm, ndx[:, None], jnp.zeros((F, 1, P1p), jnp.float32)], axis=1
    )
    xa_tiles = xa.reshape(F, 5, T, 128).swapaxes(1, 2)  # [F, T, 5, 128]
    na_tiles = na.reshape(F, 5, T, 128).swapaxes(1, 2)

    cidx_x, cnt_x = _h2o_candidates(xTc, x_valid, centers, radius, reps, nonempty)
    xc, xr_, xp, xne = _x_tile_stats(xTc, x_valid)
    cidx_y, cnt_y = _o2h_candidates(centers, radius, nonempty, xc, xr_, xp, xne)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda f: (f, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, 1), lambda f: (f, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, T), lambda f: (f, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, 1), lambda f: (f, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, 5, 128), lambda f: (f, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 5, 128), lambda f: (f, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 5, S_CELL), lambda f: (f, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, 128), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 128), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, S_CELL), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, S_CELL), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, S_CELL), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    h2o_d, h2o_i, o2h_d, o2h_i, o2h_s = pl.pallas_call(
        _signed_cluster_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((F, T, 128), jnp.float32),
            jax.ShapeDtypeStruct((F, T, 128), jnp.int32),
            jax.ShapeDtypeStruct((F, C, S_CELL), jnp.float32),
            jax.ShapeDtypeStruct((F, C, S_CELL), jnp.int32),
            jax.ShapeDtypeStruct((F, C, S_CELL), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=_cost(10 * F * P1p * P2p // 4, xa_tiles, na_tiles, ya_cells),
        interpret=interpret,
    )(cidx_x, cnt_x, cidx_y, cnt_y, xa_tiles, na_tiles, ya_cells)
    return (
        h2o_d.reshape(F, P1p),
        h2o_i.reshape(F, P1p),
        o2h_d.reshape(F, P2p),
        o2h_i.reshape(F, P2p),
        o2h_s.reshape(F, P2p),
    )


# ---------------------------------------------------------------------------
# Signed backward (union of owner blocks from BOTH directions)
# ---------------------------------------------------------------------------


def _signed_cluster_bwd_kernel(
    bidx_ref, bcnt_ref, xt_t_ref, yt_ref, yc_ref, oi_ref, h2oi_ref, xr_ref,
    gx_ref, gy_ref,
):
    """Both directions' gradients over the union owner blocks
    (chamfer_pallas._nn_bwd_kernel math, restricted):
      gy_j += yc_j (y_j - x_{i*});  gx_{i*} -= yc_j (y_j - x_{i*})
      gx_i += xr_i (x_i - y_{j*});  gy_{j*} -= xr_i (x_i - y_{j*})

    bidx/bcnt: [1,T,C]/[1,T,1] SMEM union owner-cell lists per x tile
    xt_t: [1,T,3,128]; yt: [1,C,3,S]; yc: [1,C,1,S]; oi: [1,C,1,S] (o2h argmin,
    PERMUTED global x index per y); h2oi/xr: [1,T,128]
    gx: [1,T,3,128]; gy: [1,C,3,S] (zero-filled, accumulated)
    """
    T = h2oi_ref.shape[1]

    gy_ref[...] = jnp.zeros_like(gy_ref)

    for t in range(T):
        xt_t = xt_t_ref[0, t]  # [3, 128]
        h2oi_t = h2oi_ref[0, t][None, :]  # [1, 128]
        xr_t = xr_ref[0, t][None, :]  # [1, 128]
        n = bcnt_ref[0, t, 0]

        def body(k, gx_acc):
            c = bidx_ref[0, t, k]
            yt_c = yt_ref[0, pl.ds(c, 1)][0]  # [3, S]
            yc_c = yc_ref[0, pl.ds(c, 1)][0]  # [1, S]
            oi_c = oi_ref[0, pl.ds(c, 1)][0]  # [1, S]

            # o2h side: M[i, s] = 1 iff t*128 + i == oi_c[s]
            rows = jax.lax.broadcasted_iota(jnp.int32, (128, S_CELL), 0) + t * 128
            M = (rows == oi_c).astype(jnp.float32)  # [128, S]
            x_nn = _dot(xt_t, M, ((1,), (0,)))  # [3, S] (0 off-owner)
            owner_y = ((oi_c >= t * 128) & (oi_c < (t + 1) * 128)).astype(jnp.float32)
            contrib = yc_c * (owner_y * yt_c - x_nn)  # [3, S]
            gy_ref[0, pl.ds(c, 1)] += contrib[None]
            gx_acc = gx_acc - _dot(contrib, M, ((1,), (1,)))  # [3, 128]

            # h2o side: M2[s, i] = 1 iff c*S + s == h2oi_t[i]
            rows2 = jax.lax.broadcasted_iota(jnp.int32, (S_CELL, 128), 0) + c * S_CELL
            M2 = (rows2 == h2oi_t).astype(jnp.float32)  # [S, 128]
            y_at = _dot(yt_c, M2, ((1,), (0,)))  # [3, 128]
            owner_x = ((h2oi_t >= c * S_CELL) & (h2oi_t < (c + 1) * S_CELL)).astype(
                jnp.float32
            )
            u2 = xr_t * (owner_x * xt_t - y_at)  # [3, 128]
            gy_ref[0, pl.ds(c, 1)] -= _dot(u2, M2, ((1,), (1,)))[None]
            return gx_acc + u2

        gx_ref[0, t] = jax.lax.fori_loop(0, n, body, jnp.zeros((3, 128), jnp.float32))


def _union_owner_lists(h2oi, xr_live, o2hi, yc_live, C: int, T: int):
    """Union of both directions' owner (x-tile, cell) pairs.
    h2oi [F,T,128] cell space via //S; o2hi [F,C,S] tile space via //128."""
    F = h2oi.shape[0]
    rows = jnp.arange(F * T, dtype=jnp.int32)[:, None]
    own_x = jnp.clip(h2oi // S_CELL, 0, C - 1)
    hit = jnp.zeros((F * T, C), bool).at[
        rows, jnp.where(xr_live, own_x, 0).reshape(F * T, 128)
    ].max(xr_live.reshape(F * T, 128))
    # o2h: pair (tile_of(oi), cell_of(y)) for every live y
    own_t = jnp.clip(o2hi // 128, 0, T - 1)  # [F, C, S]
    cell_ids = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32)[None, :, None], o2hi.shape
    )
    frame_ids = jnp.broadcast_to(
        jnp.arange(F, dtype=jnp.int32)[:, None, None], o2hi.shape
    )
    flat_rows = (frame_ids * T + own_t).reshape(-1)
    hit = hit.at[
        jnp.where(yc_live.reshape(-1), flat_rows, 0),
        jnp.where(yc_live.reshape(-1), cell_ids.reshape(-1), 0),
    ].max(yc_live.reshape(-1))
    order = jnp.argsort(~hit, axis=-1, stable=True).astype(jnp.int32).reshape(F, T, C)
    count = jnp.sum(hit, axis=-1).astype(jnp.int32).reshape(F, T, 1)
    return order, count


def _signed_cluster_backward(xT_perm, yT, h2oi, o2hi, xr, yc, interpret):
    """xr [F, P1p] permuted-order h2o cotangent rows; yc [F, P2] o2h rows.
    -> (gx_tiles [F, T, 3, 128] permuted, gyT [F, 3, P2])."""
    F, _, P1p = xT_perm.shape
    P2 = yT.shape[2]
    P2p = _round_up(P2, S_CELL)
    C = P2p // S_CELL
    T = P1p // 128

    yTp = yT.astype(jnp.float32)
    if P2p != P2:
        yTp = jnp.pad(yTp, ((0, 0), (0, 0), (0, P2p - P2)))
        o2hi = jnp.pad(o2hi, ((0, 0), (0, P2p - P2)))
        yc = jnp.pad(yc, ((0, 0), (0, P2p - P2)))  # zero cotangent on pads
    yt_cells = yTp.reshape(F, 3, C, S_CELL).swapaxes(1, 2)  # [F, C, 3, S]
    yc_cells = yc.reshape(F, C, 1, S_CELL)
    oi_cells = o2hi.reshape(F, C, 1, S_CELL)

    h2oi_t = h2oi.reshape(F, T, 128)
    xr_t = xr.reshape(F, T, 128)
    xt_tiles = xT_perm.astype(jnp.float32).reshape(F, 3, T, 128).swapaxes(1, 2)

    bidx, bcount = _union_owner_lists(
        h2oi_t, xr_t != 0.0, o2hi.reshape(F, C, S_CELL), yc.reshape(F, C, S_CELL) != 0.0,
        C, T,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda f: (f, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, 1), lambda f: (f, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, 3, 128), lambda f: (f, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 3, S_CELL), lambda f: (f, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1, S_CELL), lambda f: (f, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 1, S_CELL), lambda f: (f, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 128), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 128), lambda f: (f, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, 3, 128), lambda f: (f, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, 3, S_CELL), lambda f: (f, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    gx_tiles, gy = pl.pallas_call(
        _signed_cluster_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((F, T, 3, 128), jnp.float32),
            jax.ShapeDtypeStruct((F, C, 3, S_CELL), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=_cost(26 * F * P1p * P2p // 16, xt_tiles, yt_cells, h2oi_t, xr_t),
        interpret=interpret,
    )(bidx, bcount, xt_tiles, yt_cells, yc_cells, oi_cells, h2oi_t, xr_t)

    gyT = gy.swapaxes(1, 2).reshape(F, 3, P2p)[:, :, :P2]
    return gx_tiles, gyT


# ---------------------------------------------------------------------------
# Public signed entry (custom VJP)
# ---------------------------------------------------------------------------


def point2point_signed_cluster(
    x: jax.Array,  # [N, P1, 3] hand verts
    y: jax.Array | None = None,  # [N, P2, 3] object points, OR pass yT
    x_normals: jax.Array | None = None,
    y_valid: jax.Array | None = None,
    *,
    yT: jax.Array | None = None,  # [N, 3, P2] coordinate-major (preferred)
    interpret: bool = False,
):
    """Drop-in for core.geometry.point2point_signed via cluster-pruned search.
    Returns (y2x_signed [N,P2], x2y_signed [N,P1], yidx_near [N,P2]).

    Same custom-VJP contract as the exact kernel: NN indices are constants of
    the backward; normals enter only through sign() (zero gradient a.e.)."""
    has_normals = x_normals is not None
    if x_normals is None:
        x_normals = jnp.zeros_like(x)
    yTv, y_valid = _as_yT(y, yT, y_valid)
    return _p2ps_cluster_core(x, yTv, x_normals, y_valid, interpret, has_normals)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _p2ps_cluster_core(x, yT, x_normals, y_valid, interpret, has_normals):
    out, _ = _p2ps_cluster_fwd(x, yT, x_normals, y_valid, interpret, has_normals)
    return out


def _p2ps_cluster_fwd(x, yT, x_normals, y_valid, interpret, has_normals):
    F, P1, _ = x.shape
    P2 = yT.shape[2]
    xTs, perm, x_valid = _x_perm_pad(x)
    nT = jnp.swapaxes(x_normals.astype(jnp.float32), 1, 2)  # [F, 3, P1] (small)
    nTs = jnp.take_along_axis(nT, perm[:, None, :], axis=2)
    if xTs.shape[2] != P1:
        nTs = jnp.pad(nTs, ((0, 0), (0, 0), (0, xTs.shape[2] - P1)))
    h2o_d, h2o_i, o2h_d, o2h_i, o2h_s = _signed_cluster_forward(
        xTs, x_valid, nTs, yT, y_valid, interpret
    )
    inv = jnp.argsort(perm, axis=1)
    x2y_dist = jnp.sqrt(jnp.maximum(jnp.take_along_axis(h2o_d[:, :P1], inv, 1), 0.0))
    y2x_dist = jnp.sqrt(jnp.maximum(o2h_d[:, :P2], 0.0))
    sign = jnp.sign(o2h_s[:, :P2]) if has_normals else jnp.ones_like(y2x_dist)

    from jax.ad_checkpoint import checkpoint_name

    x2y_dist, y2x_dist, sign, h2o_i, o2h_i_r, perm_r = (
        checkpoint_name(t, "chamfer_res")
        for t in (x2y_dist, y2x_dist, sign, h2o_i, o2h_i[:, :P2], perm)
    )

    y2x_signed = jnp.where(y_valid, y2x_dist * sign, 0.0)
    x2y_signed = x2y_dist  # no y normals in any TaMF call site
    # public index output: map PERMUTED argmin positions back to MANO order
    yidx_near = jnp.take_along_axis(
        perm_r, jnp.clip(o2h_i_r, 0, P1 - 1), axis=1
    )
    residuals = (x, yT, x2y_dist, y2x_dist, sign, h2o_i, o2h_i_r, perm_r, y_valid)
    return (y2x_signed, x2y_signed, yidx_near), residuals


def _p2ps_cluster_bwd(interpret, has_normals, residuals, cotangents):
    x, yT, x2y_dist, y2x_dist, sign, h2o_i, o2h_i, perm, y_valid = residuals
    g_y2x, g_x2y, _ = cotangents  # no gradient through the int index output
    F, P1, _ = x.shape
    P1p = h2o_i.shape[1]

    xr = g_x2y / jnp.maximum(x2y_dist, 1e-12)  # [F, P1] original order
    xr_s = jnp.take_along_axis(xr, perm, axis=1)
    if P1p != P1:
        xr_s = jnp.pad(xr_s, ((0, 0), (0, P1p - P1)))
    yc = jnp.where(y_valid, sign, 0.0) * g_y2x / jnp.maximum(y2x_dist, 1e-12)

    xTs, _, _ = _x_perm_pad(x)
    gx_tiles, gyT = _signed_cluster_backward(
        xTs, yT, h2o_i, o2h_i, xr_s, yc, interpret
    )
    gx_s = gx_tiles.swapaxes(1, 2).reshape(F, 3, P1p)
    inv = jnp.argsort(perm, axis=1)
    gx = jnp.take_along_axis(gx_s[:, :, :P1], inv[:, None, :], axis=2)
    g_valid = np.zeros((yT.shape[0], yT.shape[2]), dtype=jax.dtypes.float0)
    return jnp.swapaxes(gx, 1, 2), gyT, jnp.zeros_like(x), g_valid


_p2ps_cluster_core.defvjp(_p2ps_cluster_fwd, _p2ps_cluster_bwd)
