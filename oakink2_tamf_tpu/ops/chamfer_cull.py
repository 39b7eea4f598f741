"""Bounds-culled EXACT hand->object nearest-neighbor kernel (TPU Pallas).

STATUS: LIVE — the default h2o route on TPU (core/geometry.point2point_h2o
"auto"); bit-identical to chamfer_pallas, 1.64x/1.69x fwd/grad at production
shapes.

The all-pairs h2o kernel (ops/chamfer_pallas.py) is OUTPUT-RATE-bound on the
MXU: every [P1p, P2] distance block costs ~P1p*P2/128 cycles no matter how
skinny the contraction is, so the only way down is to not emit distance tiles
that provably cannot win the min. This kernel culls with the triangle
inequality — unlike the retired candidate-budget cluster kernel
(ops/chamfer_cluster.py, whose fixed k_cells silently OVERESTIMATED h2o by
8 mm on realistic scenes), the cull here is EXACT BY CONSTRUCTION:

  For hand-region r of frame f (a contiguous 128-row block of the spatially
  sorted template permutation — anatomically, hence in every pose spatially,
  compact) with centroid c_fr and radius rr_fr, and object tile t (a
  contiguous `tile`-column block of the collate-time spatially sorted cloud),
  one [L*R, P2] centroid-to-point pass per group yields the EXACT per-tile
  distance d_t(f, r) = min_{j in t} d(c_fr, y_j), and with
  dmin = min_t d_t:

    lb(r, t) = d_t(f, r) - rr_fr   <= d(x_i, y_j)       for all i in r, j in
                                                         t  (triangle ineq.)
    ub(r)    = dmin(f, r) + rr_fr  >= min_j d(x_i, y_j)  for all i in r
                                      (every vert is within rr of c_fr)

  lb(r, t) > ub(r) + eps  =>  every pair (i in r, j in t) is STRICTLY farther
  than a bound each row i already beats => tile t cannot contain any row's
  argmin => skipping it changes neither the min values nor the selected
  neighbors. (The exact per-tile bound beats the centroid - tile-radius form
  by the tile radius — measured run-fraction 0.61 -> 0.49 on the grasp +
  far-object mix — and makes the cull rate nearly tile-size-independent, so
  the coarsest tile wins on grid-step overhead.)

Strictness matters: a skipped tile cannot even TIE the running min, so the
values (and the carried nearest-y coordinates, hence gradients) are
bit-identical to the all-pairs kernel's. The only divergence is tie-breaking
BETWEEN equal distances that the all-pairs kernel resolves by its 2048-column
tile order and this kernel by its `tile`-column order — measure-zero in real
geometry and value-identical either way.

The skip mask is precomputed in XLA (two tiny MXU passes over centroids,
~1% of the main pass) under stop_gradient — it only routes compute; the
differentiated path sees exact values either way. Per-(frame, region, tile)
flags ride to the kernel as an SMEM block (same pattern as the cluster
kernel's candidate lists) and gate each region block with pl.when, so a
culled block costs a scalar branch instead of an MXU pass.

Reference hot spot this accelerates: the CUDA chamfer consumed by
model/interaction_segment_refine_loss (h2o feature + dist loss) — reference
src/oakink2_tamf/model/segment_refine_model.py:142-168.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chamfer_pallas import BIG, _cost, _dot, _prep_operands, _round_up

# region rows: one 128-row block = one leaf of core/mano.hand_template_perm's
# spatial sort (ops/chamfer_cluster.template_perm, leaf=128) — anatomically
# compact, so the per-frame region radius stays a few cm in every pose
REGION_ROWS = 128


def _region_layout(P1: int, P1p: int):
    R = P1p // REGION_ROWS
    assert R * REGION_ROWS == P1p, (P1, P1p)
    return R


# ---------------------------------------------------------------------------
# skip-mask precompute (XLA, stop_gradient)
# ---------------------------------------------------------------------------


def _cull_mask(x, y, y_valid, tile, y_group, P1p, x_valid=None):
    """compute-flag mask [F, R, T] i32 (1 = run the block) + diagnostics.

    All geometry here is bound computation only — exactness never depends on
    it (a looser bound only computes more), so everything runs at standard
    precision except the ub pass, whose HIGHEST matmul keeps the bound VALID:
    ub must never undercut a true min, and the expansion's cancellation error
    at default precision (~1e-2 relative at cm scales) is large enough to do
    so. The +eps pads below absorb the remaining rounding.
    """
    F, P1, _ = x.shape
    G, P2, _ = y.shape
    L = y_group
    T = _round_up(P2, tile) // tile
    R = _region_layout(P1, P1p)

    x = jax.lax.stop_gradient(x).astype(jnp.float32)
    y = jax.lax.stop_gradient(y).astype(jnp.float32)

    # --- region stats over REAL rows (pad rows are sliced off by callers;
    # bounds only need to be valid for real rows) ---------------------------
    pad = P1p - P1
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    real = (jnp.arange(P1p) < P1).astype(jnp.float32)  # [P1p]
    xr = xp.reshape(F, R, REGION_ROWS, 3)
    wr = real.reshape(R, REGION_ROWS)
    cnt = jnp.maximum(jnp.sum(wr, axis=1), 1.0)  # [R]
    c_fr = jnp.sum(xr * wr[None, :, :, None], axis=2) / cnt[None, :, None]
    rr = jnp.sqrt(
        jnp.max(
            jnp.sum((xr - c_fr[:, :, None]) ** 2, axis=-1) * wr[None] , axis=2
        )
    )  # [F, R]

    # --- exact centroid-to-point distances, reduced per tile ---------------
    # ONE [L*R, P2] MXU pass per group gives BOTH bounds with no tile-radius
    # slack: d_t(f,r) = min_{j in tile t} d(c_fr, y_j) lower-bounds every
    # (region vert, tile point) pair within rr_fr, and its min over t is the
    # region's upper-bound anchor. Total slack per decision: 2*rr (~7 cm for
    # anatomical 128-vert regions) instead of 2*rr + tile_radius (~12 cm) —
    # measured run-fraction 0.61 -> 0.49 on the grasp+far-object mix.
    # d^2(c, y) = |c|^2 - 2 c.y + |y|^2, HIGHEST so the bounds stay bounds.
    # Centered on the group's y-mean (same as _prep_operands): the
    # expansion's cancellation error scales with the COORDINATE magnitudes,
    # and centering drops those from room-frame to scene-spread scale.
    hi = jax.lax.Precision.HIGHEST
    yc = jnp.mean(y, axis=1, keepdims=True)  # [G, 1, 3]
    y = y - yc
    cg = c_fr.reshape(G, L * R, 3) - yc
    cdot = jax.lax.dot_general(
        cg, jnp.swapaxes(y, 1, 2), (((2,), (1,)), ((0,), (0,))), precision=hi
    )  # [G, L*R, P2]
    d2 = (
        jnp.sum(cg * cg, axis=-1)[..., None]
        - 2.0 * cdot
        + jnp.sum(y * y, axis=-1)[:, None, :]
    )
    if y_valid is not None:
        # invalid columns lose every min; an all-invalid tile gets +inf and
        # is always culled (the kernel operand carries ysq=BIG there, so the
        # all-pairs kernel's values for such tiles never win either)
        d2 = jnp.where(y_valid[:, None, :], d2, jnp.inf)
    padp = T * tile - P2
    if padp:
        d2 = jnp.pad(d2, ((0, 0), (0, 0), (0, padp)), constant_values=jnp.inf)
    d_tile = jnp.sqrt(
        jnp.maximum(jnp.min(d2.reshape(G, L * R, T, tile), axis=-1), 0.0)
    ).reshape(F, R, T)
    dmin = jnp.min(d_tile, axis=-1)  # [F, R] exact centroid->cloud distance
    # eps: the skip proof needs eps >= 2x the bound pass's |d_computed -
    # d_true|. With centering, the HIGHEST expansion error on d^2 is
    # ~2^-24 * scene_spread^2 (~6e-9 m^2 at 0.3 m spread), whose worst
    # d-space amplification (d -> 0) is its sqrt ~1e-4 m. 1e-3 m covers
    # scenes up to ~4 m spread and widens the 2*rr (~6 cm) slack by ~2% —
    # rigor at no measurable cull-rate cost.
    run = d_tile - rr[:, :, None] <= (dmin + rr)[:, :, None] + 1e-3
    # inf <= inf is True: an ALL-invalid cloud (a padded object slot riding
    # through models/refine_r.multi_object_h2o_dist) would otherwise run
    # every tile to produce values the caller masks off anyway — cull them
    # all instead (outputs come out BIG; callers never read them).
    run = jnp.logical_and(run, jnp.isfinite(d_tile))
    if x_valid is not None:
        # frame-level skip (mask-padded frames whose outputs the loss zeroes
        # anyway): the reference pays NOTHING for them — it runs segments at
        # their true length — so skipping here recovers its dynamic-shape
        # advantage under this framework's static batch contract
        run = jnp.logical_and(run, x_valid[:, None, None])
    return run.astype(jnp.int32)  # [F, R, T]


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _cull_fwd_kernel(mask_ref, xa_ref, ya_ref, h2o_d_ref, h2od_s):
    """grid (F, T): per step, R pl.when-gated [REGION_ROWS, tile] blocks."""
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    R = mask_ref.shape[1]

    @pl.when(c == 0)
    def _():
        h2od_s[0, :] = jnp.full_like(h2od_s[0, :], BIG)

    for r in range(R):
        rows = slice(r * REGION_ROWS, (r + 1) * REGION_ROWS)

        @pl.when(mask_ref[0, r, c] != 0)
        def _(rows=rows):
            d = _dot(xa_ref[0][:, rows], ya_ref[0], ((0,), (0,)))
            tile_min = jnp.min(d, axis=1)  # [REGION_ROWS]
            prev = h2od_s[0, rows]
            h2od_s[0, rows] = jnp.minimum(tile_min, prev)

    @pl.when(c == nc - 1)
    def _():
        h2o_d_ref[0, 0, :] = h2od_s[0, :]


def _cull_dvec_kernel(mask_ref, xa_ref, ya_ref, h2o_d_ref, dvec_ref, h2od_s, yat_s):
    """fwd + nearest-y coordinate carry (the dvec backward trick of
    chamfer_pallas._nn_h2o_dvec_kernel, region-gated). The per-block select
    rides the MXU as a one-hot contraction [3, tile] x [tile', rows]."""
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    R = mask_ref.shape[1]
    tile = ya_ref.shape[2]

    @pl.when(c == 0)
    def _():
        h2od_s[0, :] = jnp.full_like(h2od_s[0, :], BIG)
        yat_s[:, :] = jnp.zeros_like(yat_s)

    for r in range(R):
        rows = slice(r * REGION_ROWS, (r + 1) * REGION_ROWS)

        @pl.when(mask_ref[0, r, c] != 0)
        def _(rows=rows):
            ya = ya_ref[0]
            d = _dot(xa_ref[0][:, rows], ya, ((0,), (0,)))  # [rows, tile]
            tile_min = jnp.min(d, axis=1)
            targ = jnp.argmin(d, axis=1).astype(jnp.int32)
            cols = jax.lax.broadcasted_iota(jnp.int32, (REGION_ROWS, tile), 1)
            M2 = (cols == targ[:, None]).astype(jnp.float32)
            # nearest-y coords: VPU masked reductions (exact — one nonzero
            # per row). An MXU one-hot contraction here MEASURED ~6x the
            # distance matmul per block (K=tile at HIGHEST = 6 bf16 passes x
            # K/128 accumulation steps for a 3-row output) and erased the
            # cull win at tile=1024; these three lane-sums mirror
            # chamfer_pallas._nn_h2o_dvec_kernel's proven select.
            yt = ya[0:3]
            ysel0 = jnp.sum(M2 * yt[0, :][None, :], axis=1)  # [rows]
            ysel1 = jnp.sum(M2 * yt[1, :][None, :], axis=1)
            ysel2 = jnp.sum(M2 * yt[2, :][None, :], axis=1)
            prev = h2od_s[0, rows]
            upd = tile_min < prev
            h2od_s[0, rows] = jnp.where(upd, tile_min, prev)
            yat_s[0, rows] = jnp.where(upd, ysel0, yat_s[0, rows])
            yat_s[1, rows] = jnp.where(upd, ysel1, yat_s[1, rows])
            yat_s[2, rows] = jnp.where(upd, ysel2, yat_s[2, rows])

    @pl.when(c == nc - 1)
    def _():
        h2o_d_ref[0, 0, :] = h2od_s[0, :]
        xt = xa_ref[0][0:3] * -0.5  # xa rows 0:3 carry -2x (centered)
        # rows whose running min is still BIG never saw a computed block
        # (pad rows of the last region when every tile culled for it) —
        # their dvec is arbitrary and sliced off by the caller
        dvec_ref[0, :, :] = xt - yat_s[:, :]


# ---------------------------------------------------------------------------
# forward wrappers
# ---------------------------------------------------------------------------


def _cull_forward(x, y, y_valid, x_valid, tile, interpret, y_group, with_dvec):
    xa, _, ya, (F, P1, P2, P1p, P2p, fb, Fp) = _prep_operands(
        x, y, y_valid, None, tile, y_group
    )
    assert fb == 1 and Fp == F
    R = _region_layout(P1, P1p)
    T = P2p // tile
    mask = _cull_mask(x, y, y_valid, tile, y_group, P1p, x_valid)

    grid = (F, T)
    in_specs = [
        pl.BlockSpec((1, R, T), lambda f, c: (f, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 5, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (1, 5, tile),
            (lambda f, c: (f, 0, c)) if y_group == 1 else (lambda f, c: (f // y_group, 0, c)),
            memory_space=pltpu.VMEM,
        ),
    ]
    _col = pl.BlockSpec((1, 1, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM)
    # cost: XLA sees the worst case; the actual cull rate is data-dependent
    cost = _cost(10 * F * P1p * P2p, xa, ya)
    if with_dvec:
        h2o_d, dvec = pl.pallas_call(
            _cull_dvec_kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(
                _col,
                pl.BlockSpec((1, 3, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((F, 1, P1p), jnp.float32),
                jax.ShapeDtypeStruct((F, 3, P1p), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, P1p), jnp.float32),
                pltpu.VMEM((3, P1p), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(mask, xa, ya)
        return h2o_d[:, 0, :P1], dvec
    (h2o_d,) = pl.pallas_call(
        _cull_fwd_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(_col,),
        out_shape=(jax.ShapeDtypeStruct((F, 1, P1p), jnp.float32),),
        scratch_shapes=[pltpu.VMEM((1, P1p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=cost,
        interpret=interpret,
    )(mask, xa, ya)
    return h2o_d[:, 0, :P1], None


# ---------------------------------------------------------------------------
# public entry — custom VJP, grad_y=False contract (same as the exact h2o
# kernel's dvec path: models/refine_r.py's object clouds are batch-derived)
# ---------------------------------------------------------------------------


def point2point_h2o_cull(
    x: jax.Array,  # [F, P1, 3]
    y: jax.Array | None = None,  # [G, P2, 3], G = F // y_group
    y_valid: jax.Array | None = None,
    *,
    yT: jax.Array | None = None,
    tile: int = 2048,
    y_group: int = 1,
    x_valid: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Bounds-culled EXACT x->y nearest distances [F, P1] (see module doc).

    Identical values to point2point_h2o_pallas for frames with
    x_valid=True; an x_valid=False frame culls EVERY tile and its outputs
    come out BIG (callers mask them — the loss-side call sites zero those
    frames anyway). Gradient w.r.t. x only (the
    y cotangent is zero by the grad_y=False contract). `tile` is the cull
    granularity. With the EXACT per-tile lower bound (min centroid->point,
    not centroid - tile radius) the cull rate barely moves with tile size,
    so the coarsest tile wins on per-step overhead: at the production
    P2=8192 (v5e, grasp + far-object mix) MEASURED fwd/grad vs the all-pairs
    kernel: tile=512 a wash (327k grid steps of overhead), 1024 = 1016/1254
    ms, 2048 = 972/1169 ms vs exact 1594/1978 ms — a 1.64x/1.69x win.
    """
    if y is None:
        y = jnp.swapaxes(yT, 1, 2)
    if y_valid is None:
        y_valid = jnp.ones(y.shape[:2], bool)
    if x_valid is None:
        x_valid = jnp.ones((x.shape[0],), bool)
    tile = min(tile, _round_up(y.shape[1], 128))
    return _cull_core(x, y, y_valid, x_valid, tile, interpret, y_group)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _cull_core(x, y, y_valid, x_valid, tile, interpret, y_group):
    h2o_d, _ = _cull_forward(x, y, y_valid, x_valid, tile, interpret, y_group, False)
    return jnp.sqrt(jnp.maximum(h2o_d, 0.0))


def _cull_fwd(x, y, y_valid, x_valid, tile, interpret, y_group):
    from jax.ad_checkpoint import checkpoint_name

    h2o_d, dvec = _cull_forward(x, y, y_valid, x_valid, tile, interpret, y_group, True)
    dist = jnp.sqrt(jnp.maximum(h2o_d, 0.0))
    dist = checkpoint_name(dist, "chamfer_res")
    dvec = checkpoint_name(dvec, "chamfer_res")
    structs = (
        jax.ShapeDtypeStruct(y.shape, y.dtype),
        jax.ShapeDtypeStruct(y_valid.shape, y_valid.dtype),
        jax.ShapeDtypeStruct(x_valid.shape, x_valid.dtype),
    )
    return dist, (dist, dvec, structs)


def _cull_bwd(tile, interpret, y_group, residuals, cotangents):
    dist, dvec, (y_s, valid_s, xv_s) = residuals
    P1 = dist.shape[1]
    xr = cotangents / jnp.maximum(dist, 1e-12)  # [F, P1]
    gxT = xr[:, None, :] * dvec[:, :, :P1]  # [F, 3, P1]
    gx = jnp.swapaxes(gxT, 1, 2)
    g_valid = np.zeros(valid_s.shape, dtype=jax.dtypes.float0)
    g_xvalid = np.zeros(xv_s.shape, dtype=jax.dtypes.float0)
    return gx, jnp.zeros(y_s.shape, y_s.dtype), g_valid, g_xvalid


_cull_core.defvjp(_cull_fwd, _cull_bwd)
