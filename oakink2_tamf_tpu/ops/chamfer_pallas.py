"""Fused bidirectional nearest-neighbor (chamfer) Pallas TPU kernel.

STATUS: LIVE — the default route for every bidirectional/signed query and the
exactness oracle the other chamfer kernels are verified against.

Replaces the reference's CUDA chamfer extension (thirdparty/chamfer_distance,
wrapped at model/loss/chamfer_distance.py) on its hot path: the h2o/o2h signed
distances computed per frame between 778 hand verts and nobj*8192 object
points (segment_refine_model.py:142-168, extra_loss.py:146-178).

Why a kernel: the pairwise [P1, P2] distance matrix (25 MB/frame at P2=8192)
must never be materialized in HBM; each [P1, TILE] distance block lives only
in VMEM and both directions' running min/argmin accumulate in place.

MEASURED (v5e, train-grade shapes with the custom VJP + MXU-native layouts
below): this kernel pair is 1.82x faster than the XLA lax.scan streaming
formulation in core/geometry.py, and is therefore THE DEFAULT on TPU —
core/geometry.point2point_signed routes impl="auto" -> Pallas on TPU
backends (core/geometry.py:138-148; see DESIGN.md "chamfer"). The XLA scan
path remains the portable fallback (CPU tests, non-TPU backends) and the
A/B baseline. (An earlier forward-only revision of this kernel lost to XLA
on lane-dim argmin relayouts; the history lives in git, not here.)

Compute/TPU layout:
- BOTH operands ride coordinate-major ([5, P1p] / [5, TILE] augmented rows —
  see _nn_kernel): any array whose MINOR dim is 3 gets tile-padded 3 -> 128
  by the TPU (8,128) layout, a 42x HBM blowup (measured 8.75 GB on the
  train-step's [20480,896,3] operand);
- the [P1p, TILE] squared-distance block is ONE MXU dot_general over the
  5-row augmented contraction (||x-y||^2 = -2x.y + ||x||^2 + ||y||^2) at
  HIGHEST precision (bf16 passes would destroy near-contact distances);
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


def _frame_block(F: int, P1p: int, tile: int) -> int:
    """Frames per grid step. MEASURED at the train shape (F=20480, 778x2048):
    FB=4 gives 715 ms vs 662 ms at FB=1 — per-step dispatch/DMA overhead is
    already hidden by Mosaic's pipelining, and the unrolled body only adds
    VMEM pressure. Kept at 1; the blocked plumbing stays for future tuning."""
    return 1


def _dot(a, b, dims):
    """MXU matmul at HIGHEST precision (6 bf16 passes, ~2^-24 relative).

    The ||x-y||^2 expansion is cancellation-limited: its absolute error
    scales with ||x||^2 + ||y||^2, not with the (tiny, near-contact)
    result. A 3-pass hi/lo split (~2^-16) was MEASURED to break the parity
    tests at unit point spread (26% of mins off at rtol 1e-4); per-frame
    centering in _nn_forward keeps the magnitudes — and hence the HIGHEST-
    precision error — small."""
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


# PERF NOTE (v5e, measured 2026-08): the per-(frame, tile) cost here is close
# to the pairwise floor, NOT reduction-bound as it first appears.
# - The augmented K=5 matmul is OUTPUT-RATE-bound on the MXU: each [128, 128]
#   output tile occupies a full systolic pass regardless of K, so the
#   [P1p, P2] block costs ~P1p*P2/128 cycles (~122 us/frame at 896x16384) —
#   a "matmul-only" microbenchmark reads 15 us only because Mosaic prunes the
#   unused columns.
# - jnp.min/argmin over the lane axis adds ~50-70 us/frame. A halving-tree of
#   elementwise minima (lane slices) CRASHES this Mosaic version's compiler
#   (tpu_compile_helper exit 1 / layout check "limits 112 vs 1"); a
#   reshape-based two-stage min compiles, matches exactly, and measured
#   NEUTRAL-to-slower (213 vs 190 us/frame at tile=16384) — the flat
#   reduction stays.
# Going materially faster requires not computing all pairs: that is
# ops/chamfer_cluster.py (per-object cluster pruning in the canonical frame,
# with an overflow certificate that preserves exactness — measured 1.75x this
# kernel on h2o fwd+bwd at 640x778x8192). This kernel remains the parity
# oracle and the default below the cluster path's break-even point.


def _nn_kernel(
    xa_ref, na_ref, ya_ref,
    h2o_d_ref, h2o_i_ref, o2h_d_ref, o2h_i_ref, o2h_dot_ref,
):
    """One (frame, y-tile) grid step.

    Squared distances come from ONE MXU matmul over an augmented coordinate
    axis: ||x-y||^2 = (-2x)·y + ||x||^2·1 + 1·||y||^2, so with
      xa = [-2x0, -2x1, -2x2, ||x||^2, 1]  (per hand vert, contraction-major)
      ya = [ y0,   y1,   y2,  1, ||y||^2]  (per object point)
    d = xa^T @ ya. Both operands are coordinate-MAJOR [5, N] so the minor dim
    is the large point axis — a [N, 3] minor layout would be tile-padded
    3 -> 128 by the TPU (measured: 8.75 GB for the train-step's [20480,896,3]
    operand). Contraction runs at HIGHEST precision: bf16 passes would lose
    the near-contact signed distances (~5e-3 m) to cancellation.

    The o2h SIGN numerator n_{i*}·(y_j - x_{i*}) is also fused: a second
    matmul with augmented normals na = [n0, n1, n2, -n·x, 0] against the SAME
    ya gives s_ij = n_i·y_j - n_i·x_i, and the argmin-selected s row comes
    from a one-hot compare — no HBM gathers anywhere (measured: the XLA
    take_along_axis epilogue cost 766 ms on the train step's 20480 frames).

    FB frames ride per grid step (blocks [FB, ...]) to amortize the per-step
    DMA/dispatch overhead — measured ~15 us/frame at FB=1 against ~5 us of
    actual VPU work on the [896, 2048] block.

    Validity masking is FREE: invalid/padded y points carry ||y||^2 = +1e30
    in ya, which adds BIG to their whole distance COLUMN — h2o never picks
    them, and o2h argmin per column is unchanged (a per-column constant
    shift). Their o2h distances come out +BIG and the wrapper zeroes them.
    This replaces a full [P1p, TILE] where() pass + a validity DMA per step.

    xa_ref:  [FB, 5, P1p] augmented hand verts (pad lanes: ||x||^2 = +1e30)
    na_ref:  [FB, 5, P1p] augmented hand normals
    ya_ref:  [FB, 5, TILE] augmented object tile (invalid: ||y||^2 = +1e30)
    h2o_d/i: [FB, 1, P1p] running min sq-dist / argmin over ALL y tiles
    o2h_d/i: [FB, 1, TILE] per-tile min sq-dist / argmin over x
    o2h_dot: [FB, 1, TILE] sign numerator at the o2h argmin
    """
    c = pl.program_id(1)
    tile = ya_ref.shape[2]

    for b in range(xa_ref.shape[0]):
        # pairwise squared distances on the MXU: [P1p, TILE]
        d = _dot(xa_ref[b], ya_ref[b], ((0,), (0,)))

        # h2o: running min over tiles
        tile_min = jnp.min(d, axis=1)  # [P1p]
        tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + c * tile

        @pl.when(c == 0)
        def _():
            h2o_d_ref[b, 0, :] = tile_min
            h2o_i_ref[b, 0, :] = tile_arg

        @pl.when(c > 0)
        def _():
            prev = h2o_d_ref[b, 0, :]
            upd = tile_min < prev
            h2o_d_ref[b, 0, :] = jnp.where(upd, tile_min, prev)
            h2o_i_ref[b, 0, :] = jnp.where(upd, tile_arg, h2o_i_ref[b, 0, :])

        # o2h: per-y-point min over all x (x fully resident)
        o2h_arg = jnp.argmin(d, axis=0).astype(jnp.int32)  # [TILE]
        o2h_d_ref[b, 0, :] = jnp.min(d, axis=0)
        o2h_i_ref[b, 0, :] = o2h_arg

        # sign numerator selected at the argmin row via one-hot compare
        s = _dot(na_ref[b], ya_ref[b], ((0,), (0,)))  # [P1p, TILE]
        rows = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
        o2h_dot_ref[b, 0, :] = jnp.sum(
            jnp.where(rows == o2h_arg[None, :], s, 0.0), axis=0
        )


def _prep_operands(x, y, y_valid, x_normals, tile, y_group=1):
    """Build the augmented coordinate-major kernel operands (xa, na, ya) —
    minor dim is the point axis, so the TPU (8,128) tiling pads nothing
    material. na is None when x_normals is None (h2o-only path skips it).

    y_group > 1 is the SHARED-Y mode: y is [G, P2, 3] with G = F // y_group
    and frame f searches cloud f // y_group. TaMF's object clouds are
    rigid transforms of per-(sample, object) canonical clouds, and distances
    are rigid-invariant, so call sites move the HAND into each object's
    canonical frame and share ONE ya per (sample, object) across all L
    frames — the per-frame ya/yT temporaries (measured 8.1 GB and the OOM
    at the bs64 2x8192 G step) collapse by a factor of y_group (=L)."""
    F, P1, _ = x.shape
    P2 = y.shape[1]
    P1p = _round_up(P1, 128)
    P2p = _round_up(P2, tile)
    assert F == y.shape[0] * y_group, (F, y.shape, y_group)

    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    # per-frame centering: distances are translation-invariant, and the
    # expansion's cancellation error scales with ||x||^2 + ||y||^2 — keep
    # the scene's own spread, not its absolute (room-frame) position. The
    # center comes from Y so that call sites sharing one object cloud across
    # several chamfer calls (R computes sample/refine/target h2o against the
    # SAME points) also share the shifted ya operand via CSE — centering on
    # x was measured to cost +4 GB HBM (OOM) on the R train step at P=8192.
    ctr = jnp.mean(y, axis=1, keepdims=True)  # [G, 1, 3]
    if y_group == 1:
        x = x - ctr
    else:
        x = (x.reshape(-1, y_group, P1, 3) - ctr[:, None]).reshape(F, P1, 3)
    y = y - ctr

    xT = jnp.swapaxes(x, 1, 2)  # [F, 3, P1]
    yT = jnp.swapaxes(y, 1, 2)  # [G, 3, P2]
    xsq = jnp.sum(x * x, axis=-1)  # [F, P1]
    ysq = jnp.sum(y * y, axis=-1)  # [G, P2]
    if y_valid is not None:
        # validity rides inside ysq (see _nn_kernel): invalid columns lose
        ysq = jnp.where(y_valid, ysq, BIG)
    if x_normals is not None:
        xn = x_normals.astype(jnp.float32)
        nT = jnp.swapaxes(xn, 1, 2)  # [F, 3, P1]
        ndx = -jnp.sum(xn * x, axis=-1)  # [F, P1]  (-n·x); x already centered
    if P1p != P1:
        pad = P1p - P1
        xT = jnp.pad(xT, ((0, 0), (0, 0), (0, pad)))
        xsq = jnp.pad(xsq, ((0, 0), (0, pad)), constant_values=BIG)  # pads lose
        if x_normals is not None:
            nT = jnp.pad(nT, ((0, 0), (0, 0), (0, pad)))
            ndx = jnp.pad(ndx, ((0, 0), (0, pad)))
    if P2p != P2:
        pad = P2p - P2
        yT = jnp.pad(yT, ((0, 0), (0, 0), (0, pad)))
        ysq = jnp.pad(ysq, ((0, 0), (0, pad)), constant_values=BIG)
    ones_y = jnp.ones((yT.shape[0], 1, P2p), jnp.float32)
    zeros_x = jnp.zeros((F, 1, P1p), jnp.float32)
    xa = jnp.concatenate([-2.0 * xT, xsq[:, None], 1.0 + zeros_x], axis=1)
    na = (
        jnp.concatenate([nT, ndx[:, None], zeros_x], axis=1)
        if x_normals is not None
        else None
    )
    ya = jnp.concatenate([yT, ones_y, ysq[:, None]], axis=1)  # [G, 5, P2p]

    fb = _frame_block(F, P1p, tile)
    if y_group > 1:
        # shared-y blocks are (1, ...) on the y side and the kernels index
        # ya_ref[b] over the x block — keep the two in lockstep at fb=1
        # (fb is 1 today anyway, see _frame_block)
        fb = 1
    Fp = _round_up(F, fb)
    if Fp != F:
        fpad = ((0, Fp - F), (0, 0), (0, 0))
        # pad frames are ZERO rows (jnp.pad default) — their outputs are
        # arbitrary and sliced off by the callers; dead today (fb=1 so
        # Fp == F), but if _frame_block is ever retuned > 1, do NOT rely on
        # pad frames losing comparisons
        xa = jnp.pad(xa, fpad)
        if y_group == 1:
            ya = jnp.pad(ya, fpad)
        if na is not None:
            na = jnp.pad(na, fpad)
    return xa, na, ya, (F, P1, P2, P1p, P2p, fb, Fp)


def _cost(flops: float, *arrays) -> "pl.CostEstimate":
    """Cost estimate for XLA cost analysis (custom calls otherwise report 0
    flops, which silently breaks MFU accounting in bench.py). `flops` counts
    the dominant MXU contractions; bytes from the operand/result footprints."""
    return pl.CostEstimate(
        flops=int(flops),
        transcendentals=0,
        bytes_accessed=int(sum(a.size * a.dtype.itemsize for a in arrays if a is not None)),
    )


def _nn_forward(x, y, y_valid, x_normals, tile, interpret, y_group=1):
    """Fused forward: (h2o_sqd [F,P1], h2o_i, o2h_sqd [F,P2], o2h_i, o2h_dot).

    y_group > 1: y is [G, P2, 3] shared by runs of y_group consecutive frames
    (see _prep_operands); outputs stay per-frame."""
    if x_normals is None:
        # zero normals still pay the full sign matmul per tile (~half this
        # kernel's MXU work). Acceptable: the ONLY production caller
        # (models/losses._per_object_signed) always passes normals; unsigned
        # production paths route to the h2o-only kernels instead. Revisit
        # with a normals-free kernel variant if an unsigned BIDIRECTIONAL
        # hot path ever appears.
        x_normals = jnp.zeros_like(x)
    xa, na, ya, (F, P1, P2, P1p, P2p, fb, Fp) = _prep_operands(
        x, y, y_valid, x_normals, tile, y_group
    )

    n_tiles = P2p // tile
    grid = (Fp // fb, n_tiles)

    out_shape = (
        jax.ShapeDtypeStruct((Fp, 1, P1p), jnp.float32),
        jax.ShapeDtypeStruct((Fp, 1, P1p), jnp.int32),
        jax.ShapeDtypeStruct((Fp, 1, P2p), jnp.float32),
        jax.ShapeDtypeStruct((Fp, 1, P2p), jnp.int32),
        jax.ShapeDtypeStruct((Fp, 1, P2p), jnp.float32),
    )
    _col = pl.BlockSpec((fb, 1, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM)
    _row = pl.BlockSpec((fb, 1, tile), lambda f, c: (f, 0, c), memory_space=pltpu.VMEM)
    # grouped mode: fb == 1, so the f grid index IS the frame index and the
    # ya block row is its group f // y_group
    _ya_spec = pl.BlockSpec(
        (fb, 5, tile),
        (lambda f, c: (f, 0, c)) if y_group == 1 else (lambda f, c: (f // y_group, 0, c)),
        memory_space=pltpu.VMEM,
    )
    h2o_d, h2o_i, o2h_d, o2h_i, o2h_dot = pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((fb, 5, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fb, 5, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
            _ya_spec,
        ],
        out_specs=(_col, _col, _row, _row, _row),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=_cost(10 * Fp * P1p * P2p, xa, na, ya),
        interpret=interpret,
    )(xa, na, ya)

    return (
        h2o_d[:F, 0, :P1],
        h2o_i[:F, 0, :P1],
        o2h_d[:F, 0, :P2],
        o2h_i[:F, 0, :P2],
        o2h_dot[:F, 0, :P2],
    )


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
    o2h_sqdist [F,P2], o2h_idx [F,P2]). Invalid y (y_valid=False) never win
    the h2o direction; their own o2h_sqdist comes back >= BIG (callers mask
    them out — see point2point_signed_pallas), their o2h_idx is exact."""
    h2o_d, h2o_i, o2h_d, o2h_i, _ = _nn_forward(x, y, y_valid, None, tile, interpret)
    return h2o_d, h2o_i, o2h_d, o2h_i


# ---------------------------------------------------------------------------
# h2o-only variant: R's refine path consumes ONLY the unsigned hand->object
# distances (segment_refine_model.py:142-168 uses h2o, never o2h), so the
# o2h min/argmin/sign work — a measured ~40% of the full kernel — is skipped.
# ---------------------------------------------------------------------------


def _nn_h2o_kernel(xa_ref, ya_ref, h2o_d_ref, h2o_i_ref):
    """h2o-only grid step: one augmented matmul + running min/argmin."""
    c = pl.program_id(1)
    tile = ya_ref.shape[2]

    for b in range(xa_ref.shape[0]):
        d = _dot(xa_ref[b], ya_ref[b], ((0,), (0,)))
        tile_min = jnp.min(d, axis=1)  # [P1p]
        tile_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + c * tile

        @pl.when(c == 0)
        def _():
            h2o_d_ref[b, 0, :] = tile_min
            h2o_i_ref[b, 0, :] = tile_arg

        @pl.when(c > 0)
        def _():
            prev = h2o_d_ref[b, 0, :]
            upd = tile_min < prev
            h2o_d_ref[b, 0, :] = jnp.where(upd, tile_min, prev)
            h2o_i_ref[b, 0, :] = jnp.where(upd, tile_arg, h2o_i_ref[b, 0, :])


def _nn_h2o_forward(x, y, y_valid, tile, interpret, y_group=1):
    """(h2o_sqdist [F,P1], h2o_idx [F,P1]). y_group: see _prep_operands."""
    xa, _, ya, (F, P1, P2, P1p, P2p, fb, Fp) = _prep_operands(
        x, y, y_valid, None, tile, y_group
    )
    grid = (Fp // fb, P2p // tile)
    _col = pl.BlockSpec((fb, 1, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM)
    _ya_spec = pl.BlockSpec(
        (fb, 5, tile),
        (lambda f, c: (f, 0, c)) if y_group == 1 else (lambda f, c: (f // y_group, 0, c)),
        memory_space=pltpu.VMEM,
    )
    h2o_d, h2o_i = pl.pallas_call(
        _nn_h2o_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((fb, 5, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
            _ya_spec,
        ],
        out_specs=(_col, _col),
        out_shape=(
            jax.ShapeDtypeStruct((Fp, 1, P1p), jnp.float32),
            jax.ShapeDtypeStruct((Fp, 1, P1p), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=_cost(10 * Fp * P1p * P2p, xa, ya),
        interpret=interpret,
    )(xa, ya)
    return h2o_d[:F, 0, :P1], h2o_i[:F, 0, :P1]


def _nn_h2o_dvec_kernel(xa_ref, ya_ref, h2o_d_ref, dvec_ref, h2od_s, yat_s):
    """h2o-only grid step that carries the nearest-y COORDINATES across the
    tile loop in VMEM scratch (the fused loss kernel's yat_s trick,
    ops/chamfer_loss.py) and emits the DIFFERENCE vector x - y* directly:

      h2o_d: [1, 1, P1p] running min squared distance
      dvec:  [1, 3, P1p] x - y_{j*} per hand vert (centered frames cancel)

    d(dist)/dx = (x - y*) / dist, so with dvec in hand the ENTIRE backward
    is two XLA elementwise ops — no backward kernel, no y re-streaming, no
    one-hot matmul. Same selection policy as _nn_h2o_kernel (within-tile
    argmin-first, strict < across tiles): bit-identical distances."""
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    tile = ya_ref.shape[2]
    P1p = xa_ref.shape[2]

    xa = xa_ref[0]  # [5, P1p]
    ya = ya_ref[0]  # [5, tile]
    yt = ya[0:3]

    d = _dot(xa, ya, ((0,), (0,)))  # [P1p, tile]
    tile_min = jnp.min(d, axis=1)  # [P1p]
    targ = jnp.argmin(d, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (P1p, tile), 1)
    M2 = (cols == targ[:, None]).astype(jnp.float32)  # [P1p, tile]
    ysel0 = jnp.sum(M2 * yt[0, :][None, :], axis=1)  # [P1p]
    ysel1 = jnp.sum(M2 * yt[1, :][None, :], axis=1)
    ysel2 = jnp.sum(M2 * yt[2, :][None, :], axis=1)

    @pl.when(c == 0)
    def _():
        h2od_s[0, :] = tile_min
        yat_s[0, :] = ysel0
        yat_s[1, :] = ysel1
        yat_s[2, :] = ysel2

    @pl.when(c > 0)
    def _():
        prev = h2od_s[0, :]
        upd = tile_min < prev
        h2od_s[0, :] = jnp.where(upd, tile_min, prev)
        yat_s[0, :] = jnp.where(upd, ysel0, yat_s[0, :])
        yat_s[1, :] = jnp.where(upd, ysel1, yat_s[1, :])
        yat_s[2, :] = jnp.where(upd, ysel2, yat_s[2, :])

    @pl.when(c == nc - 1)
    def _():
        h2o_d_ref[0, 0, :] = h2od_s[0, :]
        xt = xa[0:3] * -0.5  # centered x coordinates (xa rows 0:3 are -2x)
        dvec_ref[0, 0, :] = xt[0] - yat_s[0, :]
        dvec_ref[0, 1, :] = xt[1] - yat_s[1, :]
        dvec_ref[0, 2, :] = xt[2] - yat_s[2, :]


def _nn_h2o_dvec_forward(x, y, y_valid, tile, interpret, y_group=1):
    """(h2o_sqdist [F, P1], dvec [F, 3, P1p]) — the grad_y=False
    differentiation path's forward (see _p2h_fwd)."""
    xa, _, ya, (F, P1, P2, P1p, P2p, fb, Fp) = _prep_operands(
        x, y, y_valid, None, tile, y_group
    )
    assert fb == 1 and Fp == F  # _frame_block is pinned to 1 (measured)
    grid = (F, P2p // tile)
    _ya_spec = pl.BlockSpec(
        (1, 5, tile),
        (lambda f, c: (f, 0, c)) if y_group == 1 else (lambda f, c: (f // y_group, 0, c)),
        memory_space=pltpu.VMEM,
    )
    h2o_d, dvec = pl.pallas_call(
        _nn_h2o_dvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 5, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
            _ya_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, 1, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=_cost(10 * F * P1p * P2p, xa, ya),
        interpret=interpret,
    )(xa, ya)
    return h2o_d[:, 0, :P1], dvec


def _nn_h2o_bwd_kernel(xt_ref, yt_ref, h2oi_ref, xr_ref, gx_ref, gy_ref):
    """h2o-only backward (see _nn_bwd_kernel): only the x->y direction."""
    c = pl.program_id(1)
    tile = yt_ref.shape[2]
    P1p = xt_ref.shape[2]

    for b in range(xt_ref.shape[0]):
        xt = xt_ref[b]
        yt = yt_ref[b]
        h2oi = h2oi_ref[b]  # [1, P1p]
        xr = xr_ref[b]  # [1, P1p]

        rows2 = jax.lax.broadcasted_iota(jnp.int32, (tile, P1p), 0) + c * tile
        M2 = (rows2 == h2oi).astype(jnp.float32)
        y_at = _dot(yt, M2, ((1,), (0,)))  # [3, P1p], 0 off-owner
        owner = ((h2oi >= c * tile) & (h2oi < (c + 1) * tile)).astype(jnp.float32)
        u2 = xr * (owner * xt - y_at)  # [3, P1p], zero off-owner
        gy_ref[b] = -_dot(u2, M2, ((1,), (1,)))  # [3, TILE]

        @pl.when(c == 0)
        def _():
            gx_ref[b] = u2

        @pl.when(c > 0)
        def _():
            gx_ref[b] += u2


def _nn_h2o_bwd_kernel_nogy(xt_ref, yt_ref, h2oi_ref, xr_ref, gx_ref):
    """grad_y=False variant: the gy one-hot matmul — HALF this kernel's MXU
    work — and the [3, TILE] output stream are compiled out (no TaMF call
    site differentiates w.r.t. the object points; see point2point_h2o_pallas).

    gx comes out as PER-TILE partials [F, n_tiles, 3, P1p], summed by the
    caller in XLA: with the c-varying gy output gone, a c-accumulated gx
    would be the kernel's ONLY output and constant over the inner grid dim —
    MEASURED to destroy Mosaic's pipelining (signed variant: 1658 ms vs
    1074 ms for the gy=True kernel doing MORE work, F=2560 778x8192). A
    c-indexed output block restores the overlap."""
    c = pl.program_id(1)
    tile = yt_ref.shape[2]
    P1p = xt_ref.shape[2]

    for b in range(xt_ref.shape[0]):
        xt = xt_ref[b]
        yt = yt_ref[b]
        h2oi = h2oi_ref[b]  # [1, P1p]
        xr = xr_ref[b]  # [1, P1p]

        rows2 = jax.lax.broadcasted_iota(jnp.int32, (tile, P1p), 0) + c * tile
        M2 = (rows2 == h2oi).astype(jnp.float32)
        y_at = _dot(yt, M2, ((1,), (0,)))  # [3, P1p], 0 off-owner
        owner = ((h2oi >= c * tile) & (h2oi < (c + 1) * tile)).astype(jnp.float32)
        gx_ref[b, 0] = xr * (owner * xt - y_at)  # per-tile partial


def _nn_h2o_backward(x, y, h2o_i, xr, tile, interpret, grad_y=True, y_group=1):
    """Run _nn_h2o_bwd_kernel; returns (gx [F,P1,3], gy [F,P2,3] or None).
    y_group > 1 (shared y, see _prep_operands) requires grad_y=False: gy
    would need cross-frame accumulation into the shared cloud."""
    if y_group > 1 and grad_y:
        raise NotImplementedError("y_group > 1 requires grad_y=False")
    F, P1, _ = x.shape
    P2 = y.shape[1]
    P1p = _round_up(P1, 128)
    P2p = _round_up(P2, tile)

    xT = jnp.swapaxes(x.astype(jnp.float32), 1, 2)
    yT = jnp.swapaxes(y.astype(jnp.float32), 1, 2)  # [G, 3, P2]
    if P1p != P1:
        pad = P1p - P1
        xT = jnp.pad(xT, ((0, 0), (0, 0), (0, pad)))
        h2o_i = jnp.pad(h2o_i, ((0, 0), (0, pad)), constant_values=-1)
        xr = jnp.pad(xr, ((0, 0), (0, pad)))
    if P2p != P2:
        yT = jnp.pad(yT, ((0, 0), (0, 0), (0, P2p - P2)))

    h2o_i = h2o_i[:, None, :]
    xr = xr[:, None, :]
    fb = _frame_block(F, P1p, tile)
    if y_group > 1:
        fb = 1  # see _prep_operands
    Fp = _round_up(F, fb)
    if Fp != F:
        fpad = ((0, Fp - F), (0, 0), (0, 0))
        xT = jnp.pad(xT, fpad)
        if y_group == 1:
            yT = jnp.pad(yT, fpad)
        h2o_i = jnp.pad(h2o_i, fpad, constant_values=-1)
        xr = jnp.pad(xr, fpad)  # zero cotangents: pad frames contribute 0

    grid = (Fp // fb, P2p // tile)
    _yt_spec = pl.BlockSpec(
        (fb, 3, tile),
        (lambda f, c: (f, 0, c)) if y_group == 1 else (lambda f, c: (f // y_group, 0, c)),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec((fb, 3, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
        _yt_spec,
        pl.BlockSpec((fb, 1, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((fb, 1, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
    ]
    _gx_spec = pl.BlockSpec((fb, 3, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM)
    _gy_spec = pl.BlockSpec((fb, 3, tile), lambda f, c: (f, 0, c), memory_space=pltpu.VMEM)
    common = dict(
        grid=grid,
        in_specs=in_specs,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    if grad_y:
        gx, gy = pl.pallas_call(
            _nn_h2o_bwd_kernel,
            out_specs=(_gx_spec, _gy_spec),
            out_shape=(
                jax.ShapeDtypeStruct((Fp, 3, P1p), jnp.float32),
                jax.ShapeDtypeStruct((Fp, 3, P2p), jnp.float32),
            ),
            cost_estimate=_cost(13 * Fp * P1p * P2p, xT, yT, h2o_i, xr),
            **common,
        )(xT, yT, h2o_i, xr)
        return (
            jnp.swapaxes(gx[:F], 1, 2)[:, :P1],
            jnp.swapaxes(gy[:F], 1, 2)[:, :P2],
        )
    n_tiles = P2p // tile
    gx = pl.pallas_call(
        _nn_h2o_bwd_kernel_nogy,
        out_specs=pl.BlockSpec(
            (fb, 1, 3, P1p), lambda f, c: (f, c, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Fp, n_tiles, 3, P1p), jnp.float32),
        cost_estimate=_cost(7 * Fp * P1p * P2p, xT, yT, h2o_i, xr),
        **common,
    )(xT, yT, h2o_i, xr)
    gx = jnp.sum(gx, axis=1)  # tile partials -> total (cheap XLA reduce)
    return jnp.swapaxes(gx[:F], 1, 2)[:, :P1], None


def point2point_h2o_pallas(
    x: jax.Array,  # [N, P1, 3]
    y: jax.Array,  # [N, P2, 3]
    y_valid: jax.Array | None = None,
    *,
    tile: int = 2048,
    interpret: bool = False,
    grad_y: bool = True,
    y_group: int = 1,
) -> jax.Array:
    """Unsigned x->y nearest distances [N, P1] only (R's h2o feature/loss).

    Same custom-VJP structure as point2point_signed_pallas, with the o2h
    direction and the sign machinery compiled out entirely.

    grad_y=False returns ZERO gradient w.r.t. y and compiles the gy one-hot
    matmul (half the backward kernel) out — valid whenever y is not on the
    differentiation path (every TaMF loss differentiates only the hand verts;
    the object clouds are batch-derived: models/refine_r.py:179-195,
    models/losses.py:120-136).

    y_group > 1 is the SHARED-Y mode (requires grad_y=False): y is
    [N // y_group, P2, 3], frame f searches cloud f // y_group.
    """
    if y_valid is None:
        y_valid = jnp.ones(y.shape[:2], bool)
    if y_group > 1 and grad_y:
        raise NotImplementedError("y_group > 1 requires grad_y=False")
    return _p2h_core(x, y, y_valid, tile, interpret, grad_y, y_group)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _p2h_core(x, y, y_valid, tile, interpret, grad_y, y_group):
    # primal (non-differentiated calls, e.g. the stop_gradient'd sample /
    # target geometry): the plain forward, no residual machinery
    h2o_d, _ = _nn_h2o_forward(x, y, y_valid, tile, interpret, y_group)
    return jnp.sqrt(jnp.maximum(h2o_d, 0.0))


def _p2h_fwd(x, y, y_valid, tile, interpret, grad_y, y_group):
    from jax.ad_checkpoint import checkpoint_name

    if not grad_y:
        # dvec path: the forward carries x - y* out of the kernel (VPU
        # masked reductions overlapping the MXU distance pass), so the
        # backward is two XLA elementwise ops — the backward kernel and its
        # full y re-streaming (an entire second full-rate pass over
        # [P1p, P2] per frame) are GONE.
        h2o_d, dvec = _nn_h2o_dvec_forward(x, y, y_valid, tile, interpret, y_group)
        x2y_dist = jnp.sqrt(jnp.maximum(h2o_d, 0.0))
        x2y_dist = checkpoint_name(x2y_dist, "chamfer_res")
        dvec = checkpoint_name(dvec, "chamfer_res")
        structs = (
            jax.ShapeDtypeStruct(y.shape, y.dtype),
            jax.ShapeDtypeStruct(y_valid.shape, y_valid.dtype),
        )
        return x2y_dist, (x2y_dist, dvec, structs)

    h2o_d, h2o_i = _nn_h2o_forward(x, y, y_valid, tile, interpret, y_group)
    x2y_dist = jnp.sqrt(jnp.maximum(h2o_d, 0.0))
    x2y_dist = checkpoint_name(x2y_dist, "chamfer_res")
    h2o_i = checkpoint_name(h2o_i, "chamfer_res")
    return x2y_dist, (x, y, x2y_dist, h2o_i)


def _p2h_bwd(tile, interpret, grad_y, y_group, residuals, cotangents):
    import numpy as np

    if not grad_y:
        x2y_dist, dvec, (y_s, valid_s) = residuals
        P1 = x2y_dist.shape[1]
        xr = cotangents / jnp.maximum(x2y_dist, 1e-12)  # [F, P1]
        gxT = xr[:, None, :] * dvec[:, :, :P1]  # [F, 3, P1] lane-major
        gx = jnp.swapaxes(gxT, 1, 2)  # [F, P1, 3]
        g_valid = np.zeros(valid_s.shape, dtype=jax.dtypes.float0)
        return gx, jnp.zeros(y_s.shape, y_s.dtype), g_valid

    x, y, x2y_dist, h2o_i = residuals
    xr = cotangents / jnp.maximum(x2y_dist, 1e-12)
    gx, gy = _nn_h2o_backward(x, y, h2o_i, xr, tile, interpret, grad_y, y_group)
    if gy is None:
        gy = jnp.zeros_like(y)
    g_valid = np.zeros(y.shape[:2], dtype=jax.dtypes.float0)
    return gx, gy, g_valid


_p2h_core.defvjp(_p2h_fwd, _p2h_bwd)


def _nn_bwd_kernel(xt_ref, yt_ref, h2oi_ref, o2hi_ref, xr_ref, yc_ref, gx_ref, gy_ref):
    """Chamfer backward as one-hot MXU matmuls — a gather/scatter formulation
    (take_along_axis + .at[].add) measured ~3.6 s on the train step's 20480
    frames; one-hot contractions keep everything in VMEM on the MXU.

    Per (frame, y-tile): with i* = o2hi_j (nearest x per y) and j* = h2oi_i
    (nearest y per x, global index),
      gy_j += yc_j·(y_j - x_{i*});  gx_{i*} -= yc_j·(y_j - x_{i*})
      gx_i += xr_i·(x_i - y_{j*});  gy_{j*} -= xr_i·(x_i - y_{j*})
    where xr/yc are the cotangents pre-divided by the distances.

    xt/yt: [FB, 3, P1p] / [FB, 3, TILE] coordinate-major points
    h2oi:  [FB, 1, P1p] global nearest-y index per x (-1 on pad lanes)
    o2hi:  [FB, 1, TILE] nearest-x index per y
    xr/yc: [FB, 1, P1p] / [FB, 1, TILE] premultiplied cotangent rows (0 on pads)
    gx:    [FB, 3, P1p] accumulated over tiles;  gy: [FB, 3, TILE]
    """
    c = pl.program_id(1)
    tile = yt_ref.shape[2]
    P1p = xt_ref.shape[2]

    for b in range(xt_ref.shape[0]):
        xt = xt_ref[b]
        yt = yt_ref[b]
        h2oi = h2oi_ref[b]  # [1, P1p]
        o2hi = o2hi_ref[b]  # [1, TILE]
        xr = xr_ref[b]  # [1, P1p]
        yc = yc_ref[b]  # [1, TILE]

        # o2h side: M[i, j] = 1 iff i == o2hi_j
        rows = jax.lax.broadcasted_iota(jnp.int32, (P1p, tile), 0)
        M = (rows == o2hi).astype(jnp.float32)
        x_nn = _dot(xt, M, ((1,), (0,)))  # [3, TILE] = x_{i*_j}
        contrib = yc * (yt - x_nn)  # [3, TILE]
        gy = contrib
        gx = -_dot(contrib, M, ((1,), (1,)))  # [3, P1p]

        # h2o side: M2[j, i] = 1 iff c*tile + j == h2oi_i (owner tile only)
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (tile, P1p), 0) + c * tile
        M2 = (rows2 == h2oi).astype(jnp.float32)
        y_at = _dot(yt, M2, ((1,), (0,)))  # [3, P1p] = y_{j*_i} (0 off-owner)
        owner = ((h2oi >= c * tile) & (h2oi < (c + 1) * tile)).astype(jnp.float32)
        u2 = xr * (owner * xt - y_at)  # [3, P1p], zero off-owner
        gx = gx + u2
        gy = gy - _dot(u2, M2, ((1,), (1,)))  # [3, TILE]

        gy_ref[b] = gy

        @pl.when(c == 0)
        def _():
            gx_ref[b] = gx

        @pl.when(c > 0)
        def _():
            gx_ref[b] += gx


def _nn_bwd_kernel_nogy(xt_ref, yt_ref, h2oi_ref, o2hi_ref, xr_ref, yc_ref, gx_ref):
    """grad_y=False variant: drops the gy one-hot matmul (1 of 4) and the
    [3, TILE] gy output stream — valid whenever y is off the differentiation
    path (every TaMF call site; see point2point_signed_pallas).

    gx comes out as PER-TILE partials [F, n_tiles, 3, P1p] summed by the
    caller — see _nn_h2o_bwd_kernel_nogy for the measured Mosaic-pipelining
    rationale (a c-constant sole output serializes the grid)."""
    c = pl.program_id(1)
    tile = yt_ref.shape[2]
    P1p = xt_ref.shape[2]

    for b in range(xt_ref.shape[0]):
        xt = xt_ref[b]
        yt = yt_ref[b]
        h2oi = h2oi_ref[b]  # [1, P1p]
        o2hi = o2hi_ref[b]  # [1, TILE]
        xr = xr_ref[b]  # [1, P1p]
        yc = yc_ref[b]  # [1, TILE]

        # o2h side: M[i, j] = 1 iff i == o2hi_j
        rows = jax.lax.broadcasted_iota(jnp.int32, (P1p, tile), 0)
        M = (rows == o2hi).astype(jnp.float32)
        x_nn = _dot(xt, M, ((1,), (0,)))  # [3, TILE] = x_{i*_j}
        contrib = yc * (yt - x_nn)  # [3, TILE]
        gx = -_dot(contrib, M, ((1,), (1,)))  # [3, P1p]

        # h2o side: M2[j, i] = 1 iff c*tile + j == h2oi_i (owner tile only)
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (tile, P1p), 0) + c * tile
        M2 = (rows2 == h2oi).astype(jnp.float32)
        y_at = _dot(yt, M2, ((1,), (0,)))  # [3, P1p] = y_{j*_i} (0 off-owner)
        owner = ((h2oi >= c * tile) & (h2oi < (c + 1) * tile)).astype(jnp.float32)
        gx_ref[b, 0] = gx + xr * (owner * xt - y_at)  # per-tile partial


def _nn_backward(x, y, h2o_i, o2h_i, xr, yc, tile, interpret, grad_y=True, y_group=1):
    """Run _nn_bwd_kernel; returns (gx [F,P1,3], gy [F,P2,3] or None).
    y_group > 1 (shared y, see _prep_operands) requires grad_y=False."""
    if y_group > 1 and grad_y:
        raise NotImplementedError("y_group > 1 requires grad_y=False")
    F, P1, _ = x.shape
    P2 = y.shape[1]
    P1p = _round_up(P1, 128)
    P2p = _round_up(P2, tile)

    xT = jnp.swapaxes(x.astype(jnp.float32), 1, 2)
    yT = jnp.swapaxes(y.astype(jnp.float32), 1, 2)  # [G, 3, P2]
    if P1p != P1:
        pad = P1p - P1
        xT = jnp.pad(xT, ((0, 0), (0, 0), (0, pad)))
        h2o_i = jnp.pad(h2o_i, ((0, 0), (0, pad)), constant_values=-1)
        xr = jnp.pad(xr, ((0, 0), (0, pad)))
    if P2p != P2:
        pad = P2p - P2
        yT = jnp.pad(yT, ((0, 0), (0, 0), (0, pad)))
        o2h_i = jnp.pad(o2h_i, ((0, 0), (0, pad)))
        yc = jnp.pad(yc, ((0, 0), (0, pad)))

    h2o_i = h2o_i[:, None, :]
    o2h_i = o2h_i[:, None, :]
    xr = xr[:, None, :]
    yc = yc[:, None, :]
    fb = _frame_block(F, P1p, tile)
    if y_group > 1:
        fb = 1  # see _prep_operands
    Fp = _round_up(F, fb)
    if Fp != F:
        fpad = ((0, Fp - F), (0, 0), (0, 0))
        xT = jnp.pad(xT, fpad)
        if y_group == 1:
            yT = jnp.pad(yT, fpad)
        h2o_i = jnp.pad(h2o_i, fpad, constant_values=-1)
        o2h_i = jnp.pad(o2h_i, fpad)
        xr = jnp.pad(xr, fpad)  # zero cotangents: pad frames contribute 0
        yc = jnp.pad(yc, fpad)

    n_tiles = P2p // tile
    grid = (Fp // fb, n_tiles)
    _xcol = pl.BlockSpec((fb, 1, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM)
    _yrow = pl.BlockSpec((fb, 1, tile), lambda f, c: (f, 0, c), memory_space=pltpu.VMEM)
    _gx_spec = pl.BlockSpec((fb, 3, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM)
    _gy_spec = pl.BlockSpec((fb, 3, tile), lambda f, c: (f, 0, c), memory_space=pltpu.VMEM)
    _yt_spec = pl.BlockSpec(
        (fb, 3, tile),
        (lambda f, c: (f, 0, c)) if y_group == 1 else (lambda f, c: (f // y_group, 0, c)),
        memory_space=pltpu.VMEM,
    )
    common = dict(
        grid=grid,
        in_specs=[
            pl.BlockSpec((fb, 3, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
            _yt_spec,
            _xcol,
            _yrow,
            _xcol,
            _yrow,
        ],
        # two f32 one-hot [P1p, tile] masks blow the default 16M scoped vmem
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )
    if grad_y:
        gx, gy = pl.pallas_call(
            _nn_bwd_kernel,
            out_specs=(_gx_spec, _gy_spec),
            out_shape=(
                jax.ShapeDtypeStruct((Fp, 3, P1p), jnp.float32),
                jax.ShapeDtypeStruct((Fp, 3, P2p), jnp.float32),
            ),
            cost_estimate=_cost(26 * Fp * P1p * P2p, xT, yT, h2o_i, o2h_i, xr, yc),
            **common,
        )(xT, yT, h2o_i, o2h_i, xr, yc)
        return (
            jnp.swapaxes(gx[:F], 1, 2)[:, :P1],
            jnp.swapaxes(gy[:F], 1, 2)[:, :P2],
        )
    gx = pl.pallas_call(
        _nn_bwd_kernel_nogy,
        out_specs=pl.BlockSpec(
            (fb, 1, 3, P1p), lambda f, c: (f, c, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Fp, n_tiles, 3, P1p), jnp.float32),
        cost_estimate=_cost(20 * Fp * P1p * P2p, xT, yT, h2o_i, o2h_i, xr, yc),
        **common,
    )(xT, yT, h2o_i, o2h_i, xr, yc)
    gx = jnp.sum(gx, axis=1)  # tile partials -> total (cheap XLA reduce)
    return jnp.swapaxes(gx[:F], 1, 2)[:, :P1], None


def point2point_signed_pallas(
    x: jax.Array,  # [N, P1, 3]
    y: jax.Array,  # [N, P2, 3]
    x_normals: jax.Array | None = None,
    y_valid: jax.Array | None = None,
    *,
    tile: int = 2048,
    interpret: bool = False,
    grad_y: bool = True,
    y_group: int = 1,
):
    """Drop-in for core.geometry.point2point_signed backed by the fused kernel.
    Returns (y2x_signed [N,P2], x2y_signed [N,P1], yidx_near [N,P2]).

    y_group > 1 is the SHARED-Y mode (requires grad_y=False): y is
    [N // y_group, P2, 3] and frame f searches cloud f // y_group. Call sites
    move the hand into each object's canonical frame (rigid invariance) so
    the per-frame cloud operands — 8.1 GB at the bs64 2x8192 G train step,
    an OOM — collapse by a factor of y_group. Outputs stay per-frame.

    Differentiable via a custom VJP: the nearest-neighbor INDICES are treated
    as constants of the backward pass (correct almost everywhere — exactly the
    gradient torch autograd produces through the reference's CUDA chamfer +
    gather formulation). Both directions' gradients run through _nn_bwd_kernel
    (one-hot MXU contractions — no gathers/scatters). Normals enter only
    through sign(), whose gradient is zero a.e. (parity with torch .sign()).

    grad_y=False returns ZERO gradient w.r.t. y and compiles the gy one-hot
    matmul + output stream out of the backward — valid whenever y is not on
    the differentiation path (every TaMF loss differentiates only the hand
    verts; the object clouds are batch-derived: models/losses.py:120-136).
    """
    has_normals = x_normals is not None
    if x_normals is None:
        x_normals = jnp.zeros_like(x)
    if y_valid is None:
        y_valid = jnp.ones(y.shape[:2], bool)
    if y_group > 1 and grad_y:
        raise NotImplementedError("y_group > 1 requires grad_y=False")
    y2x_signed, x2y_signed, o2h_i = _p2ps_core(
        x, y, x_normals, y_valid, tile, interpret, has_normals, grad_y, y_group
    )
    return y2x_signed, x2y_signed, o2h_i


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _p2ps_core(x, y, x_normals, y_valid, tile, interpret, has_normals, grad_y, y_group):
    out, _ = _p2ps_fwd(
        x, y, x_normals, y_valid, tile, interpret, has_normals, grad_y, y_group
    )
    return out


def _p2ps_fwd(x, y, x_normals, y_valid, tile, interpret, has_normals, grad_y, y_group):
    h2o_d, h2o_i, o2h_d, o2h_i, o2h_dot = _nn_forward(
        x, y, y_valid, x_normals if has_normals else None, tile, interpret, y_group
    )
    x2y_dist = jnp.sqrt(jnp.maximum(h2o_d, 0.0))
    y2x_dist = jnp.sqrt(jnp.maximum(o2h_d, 0.0))
    if has_normals:
        sign = jnp.sign(o2h_dot)
    else:
        sign = jnp.ones_like(y2x_dist)

    # residuals are kept LEAN on purpose (train-step peak HBM): only rows
    # [F,P1]/[F,P2] survive; x/y alias the still-live primal inputs. They are
    # checkpoint-named BEFORE the signed outputs are derived, so a
    # surrounding jax.checkpoint(policy=save_only_these_names("chamfer_res"))
    # keeps them across the remat and the backward NEVER re-runs the forward
    # kernel (saves 2 kernel passes/train step, ~1.4 s at the G train shape).
    from jax.ad_checkpoint import checkpoint_name

    x2y_dist, y2x_dist, sign, h2o_i, o2h_i = (
        checkpoint_name(t, "chamfer_res")
        for t in (x2y_dist, y2x_dist, sign, h2o_i, o2h_i)
    )

    # y_valid is per-GROUP [G, P2] in shared-y mode; lift it to per-frame rows
    y_valid_f = (
        y_valid
        if y_group == 1
        else jnp.repeat(y_valid, y_group, axis=0)  # fused into the where()
    )
    if has_normals:
        y2x_signed = jnp.where(y_valid_f, y2x_dist * sign, 0.0)
    else:
        y2x_signed = jnp.where(y_valid_f, y2x_dist, 0.0)
    x2y_signed = x2y_dist  # no y normals in any TaMF call site
    residuals = (x, y, x2y_dist, y2x_dist, sign, h2o_i, o2h_i, y_valid)
    return (y2x_signed, x2y_signed, o2h_i), residuals


def _p2ps_bwd(tile, interpret, has_normals, grad_y, y_group, residuals, cotangents):
    import numpy as np

    x, y, x2y_dist, y2x_dist, sign, h2o_i, o2h_i, y_valid = residuals
    g_y2x, g_x2y, _ = cotangents  # no gradient through the int index output

    y_valid_f = y_valid if y_group == 1 else jnp.repeat(y_valid, y_group, axis=0)
    # cotangent rows pre-divided by distances (see _nn_bwd_kernel docstring)
    xr = g_x2y / jnp.maximum(x2y_dist, 1e-12)
    yc = jnp.where(y_valid_f, sign, 0.0) * g_y2x / jnp.maximum(y2x_dist, 1e-12)
    gx, gy = _nn_backward(
        x, y, h2o_i, o2h_i, xr, yc, tile, interpret, grad_y, y_group
    )
    if gy is None:
        gy = jnp.zeros_like(y)

    # x_normals only enters through sign() — zero gradient a.e. (torch parity);
    # y_valid is boolean -> float0 cotangent
    g_valid = np.zeros(y_valid.shape, dtype=jax.dtypes.float0)
    return gx, gy, jnp.zeros_like(gx), g_valid


_p2ps_core.defvjp(_p2ps_fwd, _p2ps_bwd)
