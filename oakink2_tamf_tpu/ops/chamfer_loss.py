"""Fused distance-LOSS Pallas kernel for G's geometric extra losses.

STATUS: LIVE — the default G dist-loss route on TPU (models/losses dist_impl
"auto"), via the plain kernel with sel_impl="mxu2" (2-pass bf16 one-hot
split select/gradient: 977 vs 1320 ms for the masked production pred pass,
v5e 2026-08-21; "mxu" remains the all-HIGHEST oracle). The region_cull=True
variant and the non-default sel_impl values ("vpu"/"vpu_g") are EXPERIMENTAL:
measured on v5e at the production G shape (bs=64 L=160 nobj=2 P=8192,
2026-08-21), region_cull is a wash — 1331 vs 1323 ms masked, 2875 vs 2945 ms
all-valid — because 2048-column y tiles are unions of 16 compact 128-point
sort leaves and span most of the object cloud, so the per-tile ANY over
columns almost never discharges a region (measured candidate fraction 0.9999
at that shape). A finer-grained cull needs per-leaf masks, not a bigger eps.
Note the x_perm the cull requires REORDERS first-min tie-breaks: at far
columns many hand rows are near-equidistant under the MXU's 2^-24 d2
rounding, and a reassigned winner can carry an opposed normal — flipping
the o2h SIGN and hence the 1.5/0.1 weight for that column (per-frame do
sums then move by O(|o2h|) on a handful of columns; bisected on v5e
2026-08-21: cull-vs-uncull at the SAME perm is bit-identical across
T∈{2,4}, y_group∈{1,4,8,16}, sorted prod-scale clouds — the delta is
entirely perm-tie-break, the same knife-edge any f32 implementation has).

The G train step's chamfer cost (reference extra_loss.py:146-178) is the
signed bidirectional pass over [F=bs*nobj*L, 778] hand verts x [P2=8192]
object points. Round-3 measured the composed pipeline (ops/chamfer_pallas
forward + custom-VJP backward) at 7.06 s of the 7.33 s production G step:
the o2h direction has F x P2 outputs per pass and each [P1p, TILE] MXU block
is OUTPUT-RATE-bound (a [128,128] output tile costs a full systolic pass
regardless of K), so the composed path pays ~5 full-rate passes per
(frame, tile) block: fwd distance + fwd sign matmul, then bwd x_nn one-hot,
bwd gx contraction, bwd y_at one-hot.

This kernel exploits that the loss CONSUMES only two scalars per frame
(dist_h = sum_i |(|h2o_i|) - (|h2o_g_i|)| * vw2_i and
 dist_o = sum_j |o2h_j - o2h_g_j| * w_j) plus their gradients w.r.t. the
hand verts — the [F, P2] signed field itself is never needed. So ONE pass
per (frame, tile) computes forward AND gradient together:

  1. d  = xa^T ya                 (MXU, the unavoidable distance pass)
  2. sel = [x; n] @ M_onehot      (MXU, 6 rows ride one pass: the o2h
                                   nearest-x coordinates AND its normal —
                                   this replaces the full [P1p,TILE] sign
                                   matmul of the composed forward)
  3. gx_do += u @ M^T             (MXU, the dist_o gradient contraction)

plus VPU work that overlaps the MXU: min/argmin reductions, the dist_o
weights/partials, and the h2o side carried across tiles in VMEM scratch —
running min + the nearest-y COORDINATES selected by a VPU one-hot (so the
composed backward's y_at one-hot matmul is gone entirely). 3 full-rate MXU
passes replace 5, the backward kernel and its operand re-streaming vanish,
and the custom VJP is two per-frame-scalar multiplies against the stored
gx arrays. In SYSTOLIC passes (what the MXU actually bills): pass 1 runs at
HIGHEST (6 bf16 subpasses — the cancellation-limited distance expansion
needs 2^-24, see chamfer_pallas._dot), while passes 2-3 contract against a
one-hot that is EXACT in bf16, so the default sel_impl="mxu2" runs each as
2 single-pass bf16 products (_dot_onehot_split): 10 subpasses per block
instead of 18, measured 977 vs 1320 ms on the masked production pred pass.

Semantics are bit-compatible with the composed path in models/losses.py
(same augmented-matmul distances, same first-min argmin ties, same
sign/weight rules, same eps guards); summation ORDER differs (in-kernel
per-tile sums vs XLA means) and the mxu2 select rounds at ~2^-17 (sign
flips only on knife-edge ties the reference's own f32 CUDA also has), so
tests compare at rtol.

Gradient convention (torch parity, as in ops/chamfer_pallas): nearest-
neighbor indices, sign(), and the weight selections are treated as
constants of the backward — exactly the gradient torch autograd produces
through the reference's CUDA chamfer + gather + where formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chamfer_pallas import BIG, _cost, _dot, _prep_operands, _round_up

# one hand-region = one 128-row block of the (optionally template-permuted)
# x rows — same layout contract as ops/chamfer_cull.REGION_ROWS
REGION_ROWS = 128


def _dot_high(a, b, dims):
    """MXU matmul at HIGH precision (3 bf16 passes, ~2^-16 relative).

    INTERPRET-ONLY: Mosaic's Pallas dot lowering rejects Precision.HIGH
    outright ("Unsupported dot precision: HIGH", lowering.py dot_general
    rule — found 2026-08-21 when the mxu_high variant, green under
    interpret-mode tests, refused to compile on v5e). Hardware call sites
    use _dot_onehot_split below instead."""
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32,
    )


def _dot_onehot_split(a, m, dims):
    """2-single-pass MXU contraction of f32 `a` against a ONE-HOT matrix.

    0.0/1.0 are exact in bf16, so only `a`'s rounding matters: split
    a = hi + lo with hi = f32(bf16(a)) (exact round-trip) and lo rounded to
    bf16 (|lo| <= 2^-9|a|, its own rounding <= 2^-8|lo|) — the two DEFAULT-
    precision (single systolic pass) products reconstruct a@m to ~2^-17
    relative in the f32 accumulator. vs _dot's HIGHEST (6 passes): 3x fewer
    MXU passes at 2^-17 instead of 2^-24 — ample for both users (see the
    sel/gpart call sites: coordinate selects ~0.05 m -> ~4e-7 m, gradient
    rows feeding an optimizer step at parity rtol 2e-3).

    ONLY sound when one operand is exactly representable in bf16 (here: the
    argmin one-hot). A general matmul needs the cross term lo@m_lo this
    split drops."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    mb = m.astype(jnp.bfloat16)
    kw = dict(
        dimension_numbers=(dims, ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    return jax.lax.dot_general(hi, mb, **kw) + jax.lax.dot_general(lo, mb, **kw)


def _dist_loss_kernel(
    valid_ref, xa_ref, xn_ref, ya_ref, og_ref, hg_ref, vw_ref,
    v_ref, dh_ref, gxdo_ref, gxdh_ref,
    h2od_s, yat_s, gxdo_s,
    *, sel_impl: str = "mxu",
):
    """One (frame, y-tile) grid step of the fused loss pass.

    xa_ref: [1, 5, P1p] augmented hand verts (see chamfer_pallas._nn_kernel;
            pad lanes carry ||x||^2 = +BIG and never win any argmin)
    xn_ref: [1, 6, P1p] stacked [centered x; normals] coordinate rows
    ya_ref: [1, 5, tile] augmented object tile (invalid columns: ysq=+BIG)
    og_ref: [1, 1, tile] GT signed o2h distances (cache or GT-pass output)
    hg_ref: [1, 1, P1p]  GT h2o distances (pad lanes 0)
    vw_ref: [1, 1, P1p]  v_weights2 contact weights (pad lanes 0 — this is
            what excludes pad x-lanes from dist_h and its gradient)
    v_ref:  [1, 1, tile] per-point dist_o integrand |o2h-o2h_g|*w (OUT, per tile)
    dh_ref: [1, 1, P1p]  per-vert dist_h integrand (OUT, written at last tile)
    gxdo_ref/gxdh_ref: [1, 3, P1p] d(dist_o)/dx, d(dist_h)/dx coordinate rows
            (OUT, written at last tile; caller scales by per-frame cotangents)
    h2od_s: [1, P1p] scratch — running h2o min sq-dist across tiles
    yat_s:  [3, P1p] scratch — nearest-y COORDINATES at the running argmin
    gxdo_s: [3, P1p] scratch — gx_do accumulator
    """
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    tile = ya_ref.shape[2]
    P1p = xa_ref.shape[2]

    # frame-level skip (valid_ref: SMEM i32, 0 = mask-padded frame or padded
    # object slot): the loss consumes these frames' sums TIMES ZERO, and the
    # reference pays nothing for them at all (it runs segments at their true
    # length, objects only as many as exist) — so the whole body is gated
    # and the outputs are zeroed instead. ~45% of production frames on
    # real-data batch statistics.
    fvalid = valid_ref[0, 0, 0] != 0

    @pl.when(jnp.logical_not(fvalid))
    def _():
        v_ref[0, 0, :] = jnp.zeros((tile,), jnp.float32)

        @pl.when(c == nc - 1)
        def _():
            dh_ref[0, 0, :] = jnp.zeros((P1p,), jnp.float32)
            gxdo_ref[0] = jnp.zeros((3, P1p), jnp.float32)
            gxdh_ref[0] = jnp.zeros((3, P1p), jnp.float32)

    @pl.when(fvalid)
    def _dist_loss_body():
        _dist_loss_step(
            xa_ref, xn_ref, ya_ref, og_ref, hg_ref, vw_ref,
            v_ref, dh_ref, gxdo_ref, gxdh_ref, h2od_s, yat_s, gxdo_s,
            c, nc, sel_impl,
        )


def _dist_loss_step(
    xa_ref, xn_ref, ya_ref, og_ref, hg_ref, vw_ref,
    v_ref, dh_ref, gxdo_ref, gxdh_ref,
    h2od_s, yat_s, gxdo_s,
    c, nc, sel_impl,
):
    """The valid-frame body of _dist_loss_kernel (see its docstring)."""
    tile = ya_ref.shape[2]
    P1p = xa_ref.shape[2]

    xa = xa_ref[0]  # [5, P1p]
    ya = ya_ref[0]  # [5, tile]
    xn = xn_ref[0]  # [6, P1p]
    xt = xn[0:3]  # centered x coordinates [3, P1p]
    yt = ya[0:3]  # centered y coordinates [3, tile]

    # 1) pairwise squared distances on the MXU (identical formulation to the
    #    composed forward: same operands, HIGHEST precision)
    d = _dot(xa, ya, ((0,), (0,)))  # [P1p, tile]

    # ---- o2h direction: per-y argmin over x (each y lives in ONE tile) ----
    o2h_arg = jnp.argmin(d, axis=0).astype(jnp.int32)  # [tile]
    o2h_d = jnp.min(d, axis=0)  # [tile]
    dist = jnp.sqrt(jnp.maximum(o2h_d, 0.0))
    valid = (ya[4, :] < BIG * 0.5).astype(jnp.float32)  # [tile]

    rows = jax.lax.broadcasted_iota(jnp.int32, (P1p, tile), 0)
    Mf = (rows == o2h_arg[None, :]).astype(jnp.float32)  # [P1p, tile]

    # 2) nearest-x coordinates AND normal in one K=P1p pass (6 rows <= one
    #    sublane tile — same MXU cost as selecting either alone)
    if sel_impl == "vpu":
        # masked sublane reductions instead of the MXU pass: overlaps the
        # distance matmul of the pipelined next grid step
        xnT = xn.T  # [P1p, 6]
        sel = jnp.concatenate(
            [jnp.sum(Mf * xnT[:, k:k + 1], axis=0)[None, :] for k in range(6)],
            axis=0,
        )  # [6, tile]
    elif sel_impl == "mxu":
        sel = _dot(xn, Mf, ((1,), (0,)))  # [6, tile]
    elif sel_impl == "mxu2":
        # 2 single-pass products against the exact-in-bf16 one-hot replace
        # HIGHEST's 6 (see _dot_onehot_split)
        sel = _dot_onehot_split(xn, Mf, ((1,), (0,)))
    else:  # "mxu_high" / "vpu_g": HIGH-precision select — INTERPRET-ONLY
        # (Mosaic rejects Precision.HIGH; kept as the interpret-mode
        # cross-check of the split's error model)
        sel = _dot_high(xn, Mf, ((1,), (0,)))
    x_nn = sel[0:3]
    n_at = sel[3:6]
    sdot = jnp.sum(n_at * (yt - x_nn), axis=0)  # sign numerator [tile]
    sign = jnp.sign(sdot)
    o2h_p = dist * sign * valid  # wrapper parity: invalid columns -> 0

    og = og_ref[0, 0, :]  # [tile]
    band = jnp.logical_and(og < 0.01, og > -0.005)
    w = jnp.where(band, 1.0, 0.1)
    w = jnp.where(o2h_p < 0.0, 1.5, w)  # penetration (extra_loss.py:159-162)
    diff = o2h_p - og
    v_ref[0, 0, :] = jnp.abs(diff) * w * valid

    # dist_o gradient rows: u_j = c_j * (x_{i*} - y_j) with
    # c_j = w * sgn(diff) * sign / max(dist, eps)  (eps guard = composed VJP)
    coef = w * jnp.sign(diff) * sign * valid / jnp.maximum(dist, 1e-12)
    u = coef[None, :] * (x_nn - yt)  # [3, tile]
    # 3) scatter-to-x as a one-hot contraction over the tile axis
    if sel_impl in ("vpu", "vpu_g"):
        # masked lane reductions (u rows broadcast across Mf's sublanes)
        gpart = jnp.concatenate(
            [jnp.sum(Mf * u[k][None, :], axis=1)[None, :] for k in range(3)],
            axis=0,
        )  # [3, P1p]
    elif sel_impl == "mxu":
        gpart = _dot(u, Mf, ((1,), (1,)))  # [3, P1p]
    elif sel_impl == "mxu2":
        gpart = _dot_onehot_split(u, Mf, ((1,), (1,)))
    else:
        gpart = _dot_high(u, Mf, ((1,), (1,)))

    # ---- h2o direction: running min + nearest-y coords carried in scratch --
    tile_min = jnp.min(d, axis=1)  # [P1p]
    targ = jnp.argmin(d, axis=1).astype(jnp.int32)  # [P1p]
    cols = jax.lax.broadcasted_iota(jnp.int32, (P1p, tile), 1)
    M2 = (cols == targ[:, None]).astype(jnp.float32)  # [P1p, tile]
    # y coords at the tile-local argmin, per x lane (VPU masked lane-reduce —
    # replaces the composed backward's K=tile one-hot MXU pass). Migrating
    # these three reduces to a _dot_onehot_split MXU pass was MEASURED
    # slightly SLOWER (1006 vs 977 ms masked production pass, v5e
    # 2026-08-21): the VPU work here overlaps the MXU pipeline already.
    ysel0 = jnp.sum(M2 * yt[0, :][None, :], axis=1)  # [P1p]
    ysel1 = jnp.sum(M2 * yt[1, :][None, :], axis=1)
    ysel2 = jnp.sum(M2 * yt[2, :][None, :], axis=1)

    @pl.when(c == 0)
    def _():
        gxdo_s[:, :] = gpart
        h2od_s[0, :] = tile_min
        yat_s[0, :] = ysel0
        yat_s[1, :] = ysel1
        yat_s[2, :] = ysel2

    @pl.when(c > 0)
    def _():
        gxdo_s[:, :] += gpart
        prev = h2od_s[0, :]
        upd = tile_min < prev
        h2od_s[0, :] = jnp.where(upd, tile_min, prev)
        yat_s[0, :] = jnp.where(upd, ysel0, yat_s[0, :])
        yat_s[1, :] = jnp.where(upd, ysel1, yat_s[1, :])
        yat_s[2, :] = jnp.where(upd, ysel2, yat_s[2, :])

    @pl.when(c == nc - 1)
    def _():
        gxdo_ref[0] = gxdo_s[:, :]
        hd = jnp.sqrt(jnp.maximum(h2od_s[0, :], 0.0))  # [P1p]
        hg = jnp.abs(hg_ref[0, 0, :])
        vw = vw_ref[0, 0, :]
        dh_ref[0, 0, :] = jnp.abs(hd - hg) * vw
        cfh = vw * jnp.sign(hd - hg) / jnp.maximum(hd, 1e-12)  # [P1p]
        gxdh_ref[0, 0, :] = cfh * (xt[0] - yat_s[0, :])
        gxdh_ref[0, 1, :] = cfh * (xt[1] - yat_s[1, :])
        gxdh_ref[0, 2, :] = cfh * (xt[2] - yat_s[2, :])


def _dl_plumbing(x, n, y, y_valid, o2h_g, h2o_g, vw2, tile, y_group):
    """Operand prep + the BlockSpec/shape plumbing SHARED by the plain and
    region-culled forwards (one definition so the two pallas_calls can never
    drift in contract — they differ only in kernel, first input and extra
    scratch)."""
    xa, na, ya, (F, P1, P2, P1p, P2p, fb, Fp) = _prep_operands(
        x, y, y_valid, n, tile, y_group
    )
    assert fb == 1 and Fp == F  # _frame_block is pinned to 1 (measured)
    # [centered x; normals]: xa rows 0:3 are -2x, na rows 0:3 are the normals
    xn = jnp.concatenate([xa[:, 0:3, :] * -0.5, na[:, 0:3, :]], axis=1)

    og = o2h_g.astype(jnp.float32)
    hg = h2o_g.astype(jnp.float32)
    if P2p != P2:
        og = jnp.pad(og, ((0, 0), (0, P2p - P2)))
    if P1p != P1:
        hg = jnp.pad(hg, ((0, 0), (0, P1p - P1)))
    og = og[:, None, :]  # [F, 1, P2p]
    hg = hg[:, None, :]  # [F, 1, P1p]
    vw = jnp.pad(vw2.astype(jnp.float32), (0, P1p - P1))[None, None, :]

    n_tiles = P2p // tile
    ya_spec = pl.BlockSpec(
        (1, 5, tile),
        (lambda f, c: (f, 0, c)) if y_group == 1 else (lambda f, c: (f // y_group, 0, c)),
        memory_space=pltpu.VMEM,
    )
    kw = dict(
        grid=(F, n_tiles),
        in_specs=[
            # callers PREPEND their first (SMEM) spec
            pl.BlockSpec((1, 5, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 6, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
            ya_spec,
            pl.BlockSpec((1, 1, tile), lambda f, c: (f, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P1p), lambda f, c: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, tile), lambda f, c: (f, 0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, P1p), lambda f, c: (f, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F, 1, P2p), jnp.float32),
            jax.ShapeDtypeStruct((F, 1, P1p), jnp.float32),
            jax.ShapeDtypeStruct((F, 3, P1p), jnp.float32),
            jax.ShapeDtypeStruct((F, 3, P1p), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, P1p), jnp.float32),
            pltpu.VMEM((3, P1p), jnp.float32),
            pltpu.VMEM((3, P1p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )
    return (xa, xn, ya, og, hg, vw), (F, P1, P2, P1p, P2p, n_tiles), kw


def _dist_loss_forward(
    x, n, y, y_valid, o2h_g, h2o_g, vw2, x_valid, tile, interpret, y_group,
    sel_impl="mxu",
):
    """Run the fused kernel. Returns (v_rows [F,P2], dh_rows [F,P1],
    gx_do [F,3,P1p], gx_dh [F,3,P1p]) — gx rows stay kernel-layout; the VJP
    scales and transposes them once."""
    (xa, xn, ya, og, hg, vw), (F, P1, P2, P1p, P2p, _), kw = _dl_plumbing(
        x, n, y, y_valid, o2h_g, h2o_g, vw2, tile, y_group
    )
    # [F, 1, 1] with a (1, 1, 1) block: TPU SMEM blocks must EQUAL the
    # array's trailing dims (or be (8,128)-divisible) — a [F, 1]/(1, 1) spec
    # fails Mosaic lowering on real TPU (it passes in interpret mode)
    if x_valid is None:
        vflag = jnp.ones((F, 1, 1), jnp.int32)
    else:
        vflag = x_valid.astype(jnp.int32).reshape(F, 1, 1)
    kw["in_specs"] = [
        pl.BlockSpec((1, 1, 1), lambda f, c: (f, 0, 0), memory_space=pltpu.SMEM)
    ] + kw["in_specs"]
    v_rows, dh_rows, gx_do, gx_dh = pl.pallas_call(
        functools.partial(_dist_loss_kernel, sel_impl=sel_impl),
        cost_estimate=_cost(16 * F * P1p * P2p, xa, xn, ya, og, hg),
        interpret=interpret,
        **kw,
    )(vflag, xa, xn, ya, og, hg, vw)
    return v_rows[:, 0, :P2], dh_rows[:, 0, :P1], gx_do, gx_dh


# ---------------------------------------------------------------------------
# region-culled variant: skip provably-losing [REGION_ROWS, tile] blocks
# ---------------------------------------------------------------------------


def _region_cull_mask(x, y, y_valid, tile, y_group, P1p, x_valid):
    """Per-(frame, region, tile) compute flags [F, R, T] i32:
    0 = skip the block, 1 = run (h2o side needs it), 3 = run AND the region
    may contain some column's o2h argmin (the select/scatter passes run).

    Both bounds are EXACT-by-construction triangle-inequality culls over the
    per-frame region centroids c_fr / radii rr (ops/chamfer_cull._cull_mask's
    machinery, extended with the o2h side):

      h2o:  tile t is skippable for region r iff
              d_t(f,r) - rr > min_t d_t(f,r) + rr + eps
            (no row in r can find its min in t — chamfer_cull.py:19-27).
      o2h:  region r is skippable for tile t iff for EVERY column j in t
              d(c_fr, y_j) - rr > ub_col(j) + eps,
              ub_col(j) = min_r' (d(c_fr', y_j) + rr_r')
            — every pair (i in r, j) is strictly farther than a distance
            some other region provably achieves for j, so r cannot hold any
            column's argmin. The ub's own argmin region always passes its
            test (d - rr <= d + rr), so every valid column keeps >= 1
            candidate region.

    Exactness never depends on the mask (a looser bound only computes more);
    the ub/lb pass runs HIGHEST-precision centered like _cull_mask, and
    eps = 1e-3 m absorbs its remaining rounding (see chamfer_cull.py:148-155).
    The [L*R, P2] column field is computed per GROUP under lax.map (peak
    ~L*R*P2 floats, not F*R*P2 — 37 MB instead of 4.7 GB at the production
    G shape)."""
    F, P1, _ = x.shape
    G_, P2, _ = y.shape
    L = y_group
    T = _round_up(P2, tile) // tile
    R = P1p // REGION_ROWS
    assert R * REGION_ROWS == P1p

    x = jax.lax.stop_gradient(x).astype(jnp.float32)
    y = jax.lax.stop_gradient(y).astype(jnp.float32)

    # region stats over REAL rows (pad rows carry xsq=BIG in the kernel
    # operand and can never win a column or a row-min that callers read)
    pad = P1p - P1
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    real = (jnp.arange(P1p) < P1).astype(jnp.float32)
    xr = xp.reshape(F, R, REGION_ROWS, 3)
    wr = real.reshape(R, REGION_ROWS)
    cnt = jnp.maximum(jnp.sum(wr, axis=1), 1.0)
    c_fr = jnp.sum(xr * wr[None, :, :, None], axis=2) / cnt[None, :, None]
    rr = jnp.sqrt(
        jnp.max(jnp.sum((xr - c_fr[:, :, None]) ** 2, axis=-1) * wr[None], axis=2)
    )  # [F, R]

    hi = jax.lax.Precision.HIGHEST
    yc = jnp.mean(y, axis=1, keepdims=True)  # [G, 1, 3]
    yctr = y - yc
    cg = c_fr.reshape(G_, L, R, 3) - yc[:, None]  # [G, L, R, 3]
    rr_g = rr.reshape(G_, L, R)
    padp = T * tile - P2
    EPS = 1e-3

    def per_group(args):
        yg, yvg, cgg, rrg = args  # [P2,3], [P2] bool, [L,R,3], [L,R]
        cdot = jax.lax.dot_general(
            cgg.reshape(L * R, 3), jnp.swapaxes(yg, 0, 1),
            (((1,), (0,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32,
        )  # [L*R, P2]
        d2 = (
            jnp.sum(cgg.reshape(L * R, 3) ** 2, axis=-1)[:, None]
            - 2.0 * cdot
            + jnp.sum(yg * yg, axis=-1)[None, :]
        )
        d2 = jnp.where(yvg[None, :], d2, jnp.inf)
        d_col = jnp.sqrt(jnp.maximum(d2, 0.0)).reshape(L, R, P2)
        rcol = rrg[:, :, None]  # [L, R, 1]
        # o2h: per-column candidate test, reduced to per-tile ANY
        ub_col = jnp.min(d_col + rcol, axis=1, keepdims=True)  # [L, 1, P2]
        need = jnp.logical_and(d_col - rcol <= ub_col + EPS, jnp.isfinite(d_col))
        if padp:
            need = jnp.pad(need, ((0, 0), (0, 0), (0, padp)))
            d_col = jnp.pad(
                d_col, ((0, 0), (0, 0), (0, padp)), constant_values=jnp.inf
            )
        cand = jnp.any(need.reshape(L, R, T, tile), axis=-1)  # [L, R, T]
        # h2o: exact per-tile centroid distance bound (chamfer_cull)
        d_tile = jnp.min(d_col.reshape(L, R, T, tile), axis=-1)
        dmin = jnp.min(d_tile, axis=-1, keepdims=True)
        run_h = jnp.logical_and(
            d_tile - rcol <= dmin + rcol + EPS, jnp.isfinite(d_tile)
        )
        return (jnp.logical_or(run_h, cand).astype(jnp.int8)
                + 2 * cand.astype(jnp.int8))  # [L, R, T]

    if y_valid is None:
        y_valid = jnp.ones((G_, P2), bool)
    m = jax.lax.map(per_group, (yctr, y_valid, cg, rr_g))  # [G, L, R, T]
    m = m.reshape(F, R, T).astype(jnp.int32)
    if x_valid is not None:
        m = m * x_valid.astype(jnp.int32)[:, None, None]
    return m


def _dist_loss_cull_kernel(
    mask_ref, xa_ref, xn_ref, ya_ref, og_ref, hg_ref, vw_ref,
    v_ref, dh_ref, gxdo_ref, gxdh_ref,
    h2od_s, yat_s, gxdo_s, colmin_s, winrow_s, sel_s,
):
    """Region-culled fused loss pass — one (frame, y-tile) grid step.

    Identical contract to _dist_loss_kernel, but the [P1p, tile] distance
    block is split into R pl.when-gated [REGION_ROWS, tile] blocks, driven by
    _region_cull_mask. Three gated static loops:

      1. run-gated (bit0): distance block -> h2o row-min carry (h2od_s/yat_s)
         AND o2h column-min carry (colmin_s/winrow_s — global winner row).
      2. candidate-gated (bit1): select the winner rows' [x; n] coordinates
         into sel_s via VPU one-hot sublane sums. EXACT f32 (one nonzero per
         column) — the uncull kernel's HIGHEST MXU select carries ~2^-24
         rounding, so the two kernels agree to ~1e-6 relative, not bitwise.
      3. candidate-gated: scatter the dist_o gradient rows u back to winner
         rows via VPU one-hot lane sums (an MXU K=tile one-hot contraction
         MEASURED ~6x the distance block — chamfer_cull.py:226-230).

    MXU work drops from 3 full-rate passes per (frame, tile) to
    live_fraction x 1 (the select/scatter passes leave the MXU entirely);
    the VPU work is per-live-region and pipelines under the MXU.

    h2o row-mins across skipped blocks stay BIG; rows that never computed
    (invalid frames, all-invalid clouds) emit dh = 0 and zero gradient rows
    (the 'hdone' gate) — same caller-masks-them contract as
    chamfer_cull.point2point_h2o_cull."""
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    tile = ya_ref.shape[2]
    P1p = xa_ref.shape[2]
    R = mask_ref.shape[1]

    @pl.when(c == 0)
    def _():
        h2od_s[0, :] = jnp.full((P1p,), BIG, jnp.float32)
        yat_s[:, :] = jnp.zeros_like(yat_s)
        gxdo_s[:, :] = jnp.zeros_like(gxdo_s)

    # per-tile column state (reset every grid step: each y column lives in
    # exactly one tile, so the o2h reduction completes within the step)
    colmin_s[0, :] = jnp.full((tile,), BIG, jnp.float32)
    winrow_s[0, :] = jnp.full((tile,), -1, jnp.int32)
    sel_s[:, :] = jnp.zeros_like(sel_s)

    ya = ya_ref[0]  # [5, tile]
    yt = ya[0:3]

    # ---- pass 1: gated distance blocks, both directions' running mins ----
    for r in range(R):
        rows = slice(r * REGION_ROWS, (r + 1) * REGION_ROWS)

        @pl.when(mask_ref[0, r, c] != 0)
        def _(rows=rows, r=r):
            d = _dot(xa_ref[0][:, rows], ya, ((0,), (0,)))  # [ROWS, tile]
            # h2o: running row-min + nearest-y coords (VPU one-hot, exact)
            tile_min = jnp.min(d, axis=1)
            targ = jnp.argmin(d, axis=1).astype(jnp.int32)
            cols = jax.lax.broadcasted_iota(jnp.int32, (REGION_ROWS, tile), 1)
            M2 = (cols == targ[:, None]).astype(jnp.float32)
            ysel0 = jnp.sum(M2 * yt[0, :][None, :], axis=1)
            ysel1 = jnp.sum(M2 * yt[1, :][None, :], axis=1)
            ysel2 = jnp.sum(M2 * yt[2, :][None, :], axis=1)
            prev = h2od_s[0, rows]
            upd = tile_min < prev
            h2od_s[0, rows] = jnp.where(upd, tile_min, prev)
            yat_s[0, rows] = jnp.where(upd, ysel0, yat_s[0, rows])
            yat_s[1, rows] = jnp.where(upd, ysel1, yat_s[1, rows])
            yat_s[2, rows] = jnp.where(upd, ysel2, yat_s[2, rows])
            # o2h: running column-min with the GLOBAL winner row. Strict '<'
            # keeps the FIRST minimal row across regions — the same
            # tie-break as the uncull kernel's full-P1p argmin (and a
            # skipped region can never tie: its bound is strict).
            cmin = jnp.min(d, axis=0)  # [tile]
            carg = jnp.argmin(d, axis=0).astype(jnp.int32) + r * REGION_ROWS
            prevc = colmin_s[0, :]
            updc = cmin < prevc
            colmin_s[0, :] = jnp.where(updc, cmin, prevc)
            winrow_s[0, :] = jnp.where(updc, carg, winrow_s[0, :])

    win = winrow_s[0, :]

    # ---- pass 2: winner [x; n] select (candidate regions only) ----
    for r in range(R):
        rows = slice(r * REGION_ROWS, (r + 1) * REGION_ROWS)

        @pl.when(mask_ref[0, r, c] >= 2)
        def _(rows=rows, r=r):
            rid = (
                jax.lax.broadcasted_iota(jnp.int32, (REGION_ROWS, tile), 0)
                + r * REGION_ROWS
            )
            Mf = (rid == win[None, :]).astype(jnp.float32)  # [ROWS, tile]
            xnr = xn_ref[0][:, rows]  # [6, ROWS]
            for k in range(6):
                sel_s[k, :] += jnp.sum(Mf * xnr[k, :][:, None], axis=0)

    # ---- per-column epilogue (identical math to _dist_loss_step) ----
    o2h_d = colmin_s[0, :]
    computed = (win >= 0).astype(jnp.float32)
    dist = jnp.sqrt(jnp.maximum(o2h_d, 0.0))
    valid = (ya[4, :] < BIG * 0.5).astype(jnp.float32) * computed
    x_nn = sel_s[0:3, :]
    n_at = sel_s[3:6, :]
    sdot = jnp.sum(n_at * (yt - x_nn), axis=0)
    sign = jnp.sign(sdot)
    o2h_p = dist * sign * valid

    og = og_ref[0, 0, :]
    band = jnp.logical_and(og < 0.01, og > -0.005)
    w = jnp.where(band, 1.0, 0.1)
    w = jnp.where(o2h_p < 0.0, 1.5, w)
    diff = o2h_p - og
    v_ref[0, 0, :] = jnp.abs(diff) * w * valid
    coef = w * jnp.sign(diff) * sign * valid / jnp.maximum(dist, 1e-12)
    u0 = coef * (x_nn[0] - yt[0])
    u1 = coef * (x_nn[1] - yt[1])
    u2 = coef * (x_nn[2] - yt[2])

    # ---- pass 3: dist_o gradient scatter to winner rows ----
    for r in range(R):
        rows = slice(r * REGION_ROWS, (r + 1) * REGION_ROWS)

        @pl.when(mask_ref[0, r, c] >= 2)
        def _(rows=rows, r=r):
            rid = (
                jax.lax.broadcasted_iota(jnp.int32, (REGION_ROWS, tile), 0)
                + r * REGION_ROWS
            )
            Mf = (rid == win[None, :]).astype(jnp.float32)
            gxdo_s[0, rows] += jnp.sum(Mf * u0[None, :], axis=1)
            gxdo_s[1, rows] += jnp.sum(Mf * u1[None, :], axis=1)
            gxdo_s[2, rows] += jnp.sum(Mf * u2[None, :], axis=1)

    @pl.when(c == nc - 1)
    def _():
        gxdo_ref[0] = gxdo_s[:, :]
        hdone = (h2od_s[0, :] < BIG * 0.5).astype(jnp.float32)
        hd = jnp.sqrt(jnp.maximum(h2od_s[0, :], 0.0))
        hg = jnp.abs(hg_ref[0, 0, :])
        vw = vw_ref[0, 0, :]
        dh_ref[0, 0, :] = jnp.abs(hd - hg) * vw * hdone
        cfh = vw * jnp.sign(hd - hg) * hdone / jnp.maximum(hd, 1e-12)
        xt = xn_ref[0][0:3]
        gxdh_ref[0, 0, :] = cfh * (xt[0] - yat_s[0, :])
        gxdh_ref[0, 1, :] = cfh * (xt[1] - yat_s[1, :])
        gxdh_ref[0, 2, :] = cfh * (xt[2] - yat_s[2, :])


def _dist_loss_forward_cull(
    x, n, y, y_valid, o2h_g, h2o_g, vw2, x_valid, tile, interpret, y_group,
):
    """Region-culled twin of _dist_loss_forward (same outputs/contract)."""
    (xa, xn, ya, og, hg, vw), (F, P1, P2, P1p, P2p, n_tiles), kw = _dl_plumbing(
        x, n, y, y_valid, o2h_g, h2o_g, vw2, tile, y_group
    )
    R = P1p // REGION_ROWS
    mask = _region_cull_mask(x, y, y_valid, tile, y_group, P1p, x_valid)
    kw["in_specs"] = [
        pl.BlockSpec((1, R, n_tiles), lambda f, c: (f, 0, 0), memory_space=pltpu.SMEM)
    ] + kw["in_specs"]
    kw["scratch_shapes"] = kw["scratch_shapes"] + [
        pltpu.VMEM((1, tile), jnp.float32),
        pltpu.VMEM((1, tile), jnp.int32),
        pltpu.VMEM((6, tile), jnp.float32),
    ]
    v_rows, dh_rows, gx_do, gx_dh = pl.pallas_call(
        _dist_loss_cull_kernel,
        # cost: worst case (XLA can't see the data-dependent cull rate); the
        # MXU floor is ~1/3 of the uncull kernel's 16*F*P1p*P2p
        cost_estimate=_cost(6 * F * P1p * P2p, xa, xn, ya, og, hg),
        interpret=interpret,
        **kw,
    )(mask, xa, xn, ya, og, hg, vw)
    return v_rows[:, 0, :P2], dh_rows[:, 0, :P1], gx_do, gx_dh


def chamfer_dist_loss(
    x: jax.Array,  # [F, P1, 3] hand verts (canonical object frames)
    x_normals: jax.Array,  # [F, P1, 3]
    y: jax.Array | None = None,  # [G, P2, 3] shared canonical clouds
    o2h_g: jax.Array = None,  # [F, P2] GT signed o2h (cache or GT pass)
    h2o_g: jax.Array = None,  # [F, P1] GT h2o distances
    vw2: jax.Array = None,  # [P1] v_weights2 contact weights
    y_valid: jax.Array | None = None,  # [G, P2] bool
    *,
    yT: jax.Array | None = None,  # [G, 3, P2] coordinate-major alternative
    y_group: int = 1,
    tile: int = 2048,
    x_valid: jax.Array | None = None,  # [F] bool: False = skip the frame
    # entirely and emit ZERO sums/gradients (mask-padded frames, padded
    # object slots — the caller's frame/object masks zero them anyway)
    interpret: bool = False,
    # "mxu2" (default): select/gradient contractions as 2 single-pass bf16
    # products against the exact-in-bf16 one-hot (_dot_onehot_split) —
    # MEASURED 977 vs 1320 ms for the production G pred pass on v5e
    # (bs=64 L=160 nobj=2 P=8192, masked, fwd+grad, 2026-08-21) at ~2^-17
    # select accuracy. "mxu" = all-HIGHEST oracle (6 passes each), "vpu"
    # masked VPU reductions (1210 ms), "mxu_high"/"vpu_g" interpret-only.
    sel_impl: str = "mxu2",
    region_cull: bool = False,
    x_perm=None,  # static [P1] int permutation (core/mano.hand_template_perm)
) -> tuple[jax.Array, jax.Array]:
    """Fused dist_o/dist_h loss partials: returns (do_f [F], dh_f [F]) where

      do_f = sum_j |o2h_p_j - o2h_g_j| * w_j           (w: 1.5/1.0/0.1 rule)
      dh_f = sum_i ||h2o_p_i| - |h2o_g_i|| * vw2_i

    — the raw per-frame SUMS of models/losses.py's dist integrands (the
    caller applies frame masks, 1/(L*P) means, per-object weights). The
    [F, P2] signed field is never materialized. Differentiable w.r.t. x via
    a custom VJP whose backward is two per-frame-scalar multiplies against
    gradient rows computed IN the forward pass (see module docstring).
    y_group: frame f searches cloud f // y_group (shared-Y mode, as in
    chamfer_pallas._prep_operands).

    region_cull=True routes to the bounds-culled kernel
    (_dist_loss_cull_kernel): identical math, but [REGION_ROWS, tile] blocks
    that provably contain no row-min NOR column-argmin are skipped. Pass
    x_perm (the spatial template sort) so the 128-row regions are compact —
    the permutation is applied to x/n/h2o_g/vw2 here and the x gradient maps
    back through the gather's own VJP; per-frame SUMS only reorder
    accumulation (rtol-level effect). Values vs the uncull kernel agree to
    ~1e-6 relative (the cull kernel's winner select is EXACT f32 VPU; the
    uncull kernel's MXU select rounds at ~2^-24)."""
    if y is None:
        y = jnp.swapaxes(yT, 1, 2)
    if x_valid is None:
        x_valid = jnp.ones((x.shape[0],), bool)
    if x_perm is not None:
        import numpy as np

        x_perm = np.asarray(x_perm)
        x = x[:, x_perm]
        x_normals = x_normals[:, x_perm]
        h2o_g = h2o_g[:, x_perm]
        vw2 = vw2[x_perm]
    return _dl_core(
        x, x_normals, y, y_valid, o2h_g, h2o_g, vw2, x_valid, tile, interpret,
        y_group, sel_impl, region_cull,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _dl_core(x, n, y, y_valid, o2h_g, h2o_g, vw2, x_valid, tile, interpret, y_group, sel_impl, region_cull):
    out, _ = _dl_fwd(
        x, n, y, y_valid, o2h_g, h2o_g, vw2, x_valid, tile, interpret, y_group,
        sel_impl, region_cull,
    )
    return out


def _dl_fwd(x, n, y, y_valid, o2h_g, h2o_g, vw2, x_valid, tile, interpret, y_group, sel_impl, region_cull):
    if region_cull:
        v_rows, dh_rows, gx_do, gx_dh = _dist_loss_forward_cull(
            x, n, y, y_valid, o2h_g, h2o_g, vw2, x_valid, tile, interpret,
            y_group,
        )
    else:
        v_rows, dh_rows, gx_do, gx_dh = _dist_loss_forward(
            x, n, y, y_valid, o2h_g, h2o_g, vw2, x_valid, tile, interpret,
            y_group, sel_impl,
        )
    do_f = jnp.sum(v_rows, axis=1)
    dh_f = jnp.sum(dh_rows, axis=1)

    # keep the gradient rows across a surrounding jax.checkpoint remat (the
    # G train step's policy saves "chamfer_res": the backward never re-runs
    # this kernel — same contract as chamfer_pallas._p2ps_fwd)
    from jax.ad_checkpoint import checkpoint_name

    gx_do = checkpoint_name(gx_do, "chamfer_res")
    gx_dh = checkpoint_name(gx_dh, "chamfer_res")
    # residuals hold ONLY the gradient rows + shape/dtype structs for the
    # zero cotangents (never the multi-hundred-MB GT fields themselves)
    structs = jax.tree.map(
        lambda a: None if a is None else jax.ShapeDtypeStruct(a.shape, a.dtype),
        (n, y, y_valid, o2h_g, h2o_g, vw2, x_valid),
        is_leaf=lambda a: a is None,
    )
    return (do_f, dh_f), (gx_do, gx_dh, x.shape[1], structs)


def _dl_bwd(tile, interpret, y_group, sel_impl, region_cull, residuals, cotangents):
    import numpy as np

    gx_do, gx_dh, p1, (n_s, y_s, valid_s, og_s, hg_s, vw_s, xv_s) = residuals
    c_do, c_dh = cotangents  # per-frame scalars [F]
    g = c_do[:, None, None] * gx_do + c_dh[:, None, None] * gx_dh  # [F,3,P1p]
    gx = jnp.swapaxes(g, 1, 2)[:, :p1, :]
    zeros = lambda s: jnp.zeros(s.shape, s.dtype)
    g_valid = (
        None if valid_s is None else np.zeros(valid_s.shape, dtype=jax.dtypes.float0)
    )
    g_xvalid = np.zeros(xv_s.shape, dtype=jax.dtypes.float0)
    # only x is on any differentiation path (normals enter through sign()
    # with zero gradient a.e.; y / GT fields are batch-derived constants)
    return (gx, zeros(n_s), zeros(y_s), g_valid, zeros(og_s), zeros(hg_s),
            zeros(vw_s), g_xvalid)


_dl_core.defvjp(_dl_fwd, _dl_bwd)
