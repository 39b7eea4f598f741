"""Parity tests for the fused dist-loss kernel (ops/chamfer_loss.py) against
the composed pipeline (point2point_signed + the models/losses.py dist math).

The fused kernel computes per-frame SUMS of the dist_o/dist_h integrands plus
their hand-vert gradients in one pass; these tests assert value AND gradient
parity with the composed XLA formulation (same math, different summation
order -> rtol comparisons) in Pallas interpret mode on CPU.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oakink2_tamf_tpu.core import geometry as G
from oakink2_tamf_tpu.ops import chamfer_loss as CL


def _composed_sums(x, n, y, o2h_g, h2o_g, vw2, y_valid=None, y_group=1):
    """The exact composed-path math from models/losses.py:266-277, reduced to
    per-frame sums (no frame masks / means — the fused kernel's contract)."""
    yy = jnp.repeat(y, y_group, axis=0)
    yv = jnp.repeat(y_valid, y_group, axis=0) if y_valid is not None else None
    o2h, h2o, _ = G.point2point_signed(
        x, yy, x_normals=n, y_valid=yv, backend="xla", chunk=512, grad_y=False
    )
    band = (o2h_g < 0.01) & (o2h_g > -0.005)
    w = jnp.where(band, 1.0, 0.1)
    w = jnp.where(o2h < 0.0, 1.5, w)
    do_f = jnp.sum(jnp.abs(o2h - o2h_g) * w, axis=1)
    dh_f = jnp.sum(jnp.abs(jnp.abs(h2o) - jnp.abs(h2o_g)) * vw2[None, :], axis=1)
    return do_f, dh_f


def _make_scene(rng, F, P1, P2, G_clouds=None, scale=0.02):
    """Hand-scale random scene: distances straddle the 5 mm/10 mm band
    thresholds so all three weight branches are exercised."""
    g = G_clouds or F
    x = jnp.asarray(rng.normal(size=(F, P1, 3)) * scale, jnp.float32)
    n = rng.normal(size=(F, P1, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.asarray(n, jnp.float32)
    y = jnp.asarray(rng.normal(size=(g, P2, 3)) * scale + 0.005, jnp.float32)
    return x, n, y


def _gt_fields(rng, x_like, n, y, y_valid, y_group):
    """GT o2h/h2o from an independent random hand pose over the SAME clouds
    (matches production: GT fields come from the GT hand)."""
    xg = x_like + jnp.asarray(
        rng.normal(size=x_like.shape) * 0.01, jnp.float32
    )
    yy = jnp.repeat(y, y_group, axis=0)
    yv = jnp.repeat(y_valid, y_group, axis=0) if y_valid is not None else None
    o2h_g, h2o_g, _ = G.point2point_signed(
        xg, yy, x_normals=n, y_valid=yv, backend="xla", chunk=512, grad_y=False
    )
    return jax.lax.stop_gradient(o2h_g), jax.lax.stop_gradient(h2o_g)


@pytest.mark.parametrize(
    "F,P1,P2,y_group,tile",
    [
        (4, 13, 300, 1, 512),  # single tile, x-lane padding
        (8, 13, 1100, 4, 512),  # multi-tile carry + shared-Y mode
    ],
)
def test_fused_value_parity(F, P1, P2, y_group, tile):
    rng = np.random.default_rng(0)
    x, n, y = _make_scene(rng, F, P1, P2, G_clouds=F // y_group)
    vw2 = jnp.asarray(rng.random(P1), jnp.float32)
    o2h_g, h2o_g = _gt_fields(rng, x, n, y, None, y_group)

    do_ref, dh_ref = _composed_sums(x, n, y, o2h_g, h2o_g, vw2, y_group=y_group)
    do_f, dh_f = CL.chamfer_dist_loss(
        x, n, y, o2h_g, h2o_g, vw2, y_group=y_group, tile=tile, interpret=True
    )
    np.testing.assert_allclose(np.asarray(do_f), np.asarray(do_ref), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dh_f), np.asarray(dh_ref), rtol=2e-4)


def test_fused_grad_parity():
    rng = np.random.default_rng(1)
    F, P1, P2, y_group, tile = 8, 13, 1100, 4, 512
    x, n, y = _make_scene(rng, F, P1, P2, G_clouds=F // y_group)
    vw2 = jnp.asarray(rng.random(P1), jnp.float32)
    o2h_g, h2o_g = _gt_fields(rng, x, n, y, None, y_group)
    a = jnp.asarray(rng.normal(size=F), jnp.float32)
    b = jnp.asarray(rng.normal(size=F), jnp.float32)

    def loss_composed(xx):
        do_f, dh_f = _composed_sums(xx, n, y, o2h_g, h2o_g, vw2, y_group=y_group)
        return jnp.sum(a * do_f) + jnp.sum(b * dh_f)

    def loss_fused(xx):
        # sel_impl="mxu": the all-HIGHEST oracle — this test pins the MATH
        # mapping vs the composed path; the default mxu2's ~2^-17 select can
        # legitimately flip knife-edge tangent signs (covered by the variant
        # test + the on-device bench selfcheck instead)
        do_f, dh_f = CL.chamfer_dist_loss(
            xx, n, y, o2h_g, h2o_g, vw2, y_group=y_group, tile=tile,
            interpret=True, sel_impl="mxu",
        )
        return jnp.sum(a * do_f) + jnp.sum(b * dh_f)

    v_ref, g_ref = jax.value_and_grad(loss_composed)(x)
    v_fused, g_fused = jax.value_and_grad(loss_fused)(x)
    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=2e-3, atol=1e-4
    )


@pytest.mark.parametrize("sel_impl", ["mxu_high", "vpu_g", "vpu", "mxu2"])
def test_fused_sel_impl_variants_match_default(sel_impl):
    """The select/gradient-pass variants (HIGH-precision MXU — interpret-only,
    Mosaic rejects it; the 2-pass bf16 one-hot split; VPU masked reductions)
    must match the default kernel: values exactly-ish (the select feeds
    sign() through well-separated numerators at hand scale), gradients at
    the parity rtol used for the composed A/B."""
    rng = np.random.default_rng(7)
    F, P1, P2, y_group, tile = 8, 13, 1100, 4, 512
    x, n, y = _make_scene(rng, F, P1, P2, G_clouds=F // y_group)
    vw2 = jnp.asarray(rng.random(P1), jnp.float32)
    o2h_g, h2o_g = _gt_fields(rng, x, n, y, None, y_group)
    a = jnp.asarray(rng.normal(size=F), jnp.float32)
    b = jnp.asarray(rng.normal(size=F), jnp.float32)

    def loss(xx, mode):
        do_f, dh_f = CL.chamfer_dist_loss(
            xx, n, y, o2h_g, h2o_g, vw2, y_group=y_group, tile=tile,
            interpret=True, sel_impl=mode,
        )
        return jnp.sum(a * do_f) + jnp.sum(b * dh_f), (do_f, dh_f)

    (v0, (do0, dh0)), g0 = jax.value_and_grad(
        lambda xx: loss(xx, "mxu"), has_aux=True
    )(x)
    (v1, (do1, dh1)), g1 = jax.value_and_grad(
        lambda xx: loss(xx, sel_impl), has_aux=True
    )(x)
    np.testing.assert_allclose(np.asarray(do1), np.asarray(do0), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dh1), np.asarray(dh0), rtol=2e-4)
    np.testing.assert_allclose(float(v1), float(v0), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=2e-3, atol=1e-4)


def test_fused_y_valid_parity():
    rng = np.random.default_rng(2)
    F, P1, P2, tile = 4, 13, 700, 512
    x, n, y = _make_scene(rng, F, P1, P2)
    y_valid = jnp.asarray(rng.random((F, P2)) > 0.3)
    vw2 = jnp.asarray(rng.random(P1), jnp.float32)
    o2h_g, h2o_g = _gt_fields(rng, x, n, y, y_valid, 1)

    do_ref, dh_ref = _composed_sums(x, n, y, o2h_g, h2o_g, vw2, y_valid=y_valid)
    do_f, dh_f = CL.chamfer_dist_loss(
        x, n, y, o2h_g, h2o_g, vw2, y_valid=y_valid, tile=tile, interpret=True
    )
    np.testing.assert_allclose(np.asarray(do_f), np.asarray(do_ref), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(dh_f), np.asarray(dh_ref), rtol=2e-4)


@pytest.mark.slow  # 60 s — the per-kernel parity tests above guard the same
# contracts at small shapes; this end-to-end sweep runs in the slow suite
def test_extra_loss_fused_matches_composed_end_to_end():
    """Full interaction_segment_extra_loss: dist_impl='fused' (interpret) vs
    'composed' must agree in value and in gradient w.r.t. model_output —
    including masked frames, a padded object slot, and the GT branch."""
    from oakink2_tamf_tpu.core import mano as M
    from oakink2_tamf_tpu.models import losses as LL
    from oakink2_tamf_tpu.models.refine_r import stack_mano_models

    rng = np.random.default_rng(3)
    BS, NOBJ, L, P = 2, 2, 6, 300
    mano_stack = stack_mano_models(
        M.synthetic_mano_model("right"), M.synthetic_mano_model("left")
    )
    assets = LL.load_contact_assets()
    cfg = LL.ExtraLossConfig()
    batch = {
        "pose_repr": jnp.asarray(rng.normal(size=(BS, L, 99)).astype(np.float32)),
        "shape": jnp.asarray(rng.normal(size=(BS, L, 10)).astype(np.float32)),
        "hand_side": jnp.asarray(np.array([0, 1], np.int32)),
        "obj_traj": jnp.asarray(rng.normal(size=(BS, NOBJ, L, 9)).astype(np.float32)),
        "obj_mask": jnp.asarray(np.array([[True, False], [True, True]])),
        "obj_points": jnp.asarray(
            rng.normal(size=(BS, NOBJ, P, 3)).astype(np.float32)
        ),
        "mask": jnp.asarray((rng.random((BS, L)) > 0.2).astype(np.float32)),
    }
    model_output = jnp.asarray(rng.normal(size=(BS, L, 99)).astype(np.float32))

    def run(impl):
        def f(mo):
            return LL.interaction_segment_extra_loss(
                mano_stack, assets, cfg, mo, batch, chunk=256,
                dist_impl=impl, interpret=True,
            )[0]

        return jax.value_and_grad(f)(model_output)

    v_ref, g_ref = run("composed")
    v_fused, g_fused = run("fused")
    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=2e-3, atol=1e-5
    )


def test_fused_degenerate_padded_slot_is_zero_and_finite():
    """A fully-padded object slot (x=0 from R=0,t=0; zero cloud; zero GT
    fields) must contribute exactly 0 with finite gradients — the all-zero
    geometry that collate padding produces (see core/geometry.py NaN note)."""
    F, P1, P2 = 2, 13, 256
    x = jnp.zeros((F, P1, 3), jnp.float32)
    n = jnp.zeros((F, P1, 3), jnp.float32)
    y = jnp.zeros((F, P2, 3), jnp.float32)
    o2h_g = jnp.zeros((F, P2), jnp.float32)
    h2o_g = jnp.zeros((F, P1), jnp.float32)
    vw2 = jnp.ones((P1,), jnp.float32)

    def loss(xx):
        do_f, dh_f = CL.chamfer_dist_loss(
            xx, n, y, o2h_g, h2o_g, vw2, tile=256, interpret=True
        )
        return jnp.sum(do_f) + jnp.sum(dh_f)

    v, g = jax.value_and_grad(loss)(x)
    assert float(v) == 0.0
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g), 0.0)


def _separated_scene(rng, F, P1, P2, G_clouds):
    """Elongated hand-like x (rows SPATIALLY SORTED, so 128-row regions are
    compact and distinct — the template-perm layout contract) + cloud with a
    near half and a FAR half (the grasp + far-object mix): the h2o bound
    must cull the far tiles and the o2h bound must cull regions far from
    each near tile while keeping >= 1 candidate per valid column."""
    x0 = np.stack(
        [
            rng.uniform(-0.2, 0.2, P1),
            rng.normal(size=P1) * 0.012,
            rng.normal(size=P1) * 0.012,
        ],
        axis=1,
    )  # finger-like rod, uniform along its axis
    x0 = x0[np.argsort(x0[:, 0])]  # spatial sort -> compact row regions
    x = jnp.asarray(
        x0[None] + rng.normal(size=(F, P1, 3)) * 0.002, jnp.float32
    )
    n = rng.normal(size=(F, P1, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    y_near = rng.normal(size=(G_clouds, P2 // 2, 3)) * 0.02 + np.array(
        [0.26, 0.0, 0.0]
    )  # grasped object off the "fingertip" end
    y_far = rng.normal(size=(G_clouds, P2 // 2, 3)) * 0.03 + np.array(
        [0.6, 0.0, 0.0]
    )
    y = jnp.asarray(np.concatenate([y_near, y_far], axis=1), jnp.float32)
    return x, jnp.asarray(n, jnp.float32), y


@pytest.mark.parametrize(
    "F,P1,P2,y_group,tile,use_valid",
    [
        (4, 13, 300, 1, 512, False),   # single tile, x-lane padding
        # the heavier shapes guard an EXPERIMENTAL route (region_cull is off
        # by default — see ops/chamfer_loss STATUS) -> slow suite
        pytest.param(8, 13, 1100, 4, 512, False, marks=pytest.mark.slow),
        pytest.param(4, 150, 1024, 2, 256, True, marks=pytest.mark.slow),
    ],
)
def test_region_cull_matches_fused(F, P1, P2, y_group, tile, use_valid):
    """region_cull=True must reproduce the plain fused kernel: h2o side
    bit-identical, o2h side to ~1e-6 rel (the cull kernel's winner select is
    exact f32 VPU vs the uncull kernel's ~2^-24 MXU select)."""
    rng = np.random.default_rng(11)
    x, n, y = _make_scene(rng, F, P1, P2, G_clouds=F // y_group)
    y_valid = (
        jnp.asarray(rng.random((F // y_group, P2)) > 0.3) if use_valid else None
    )
    vw2 = jnp.asarray(rng.random(P1), jnp.float32)
    o2h_g, h2o_g = _gt_fields(rng, x, n, y, y_valid, y_group)

    kw = dict(
        o2h_g=o2h_g, h2o_g=h2o_g, vw2=vw2, y_valid=y_valid, y_group=y_group,
        tile=tile, interpret=True,
        # the cull kernel's winner select is exact f32 VPU — compare against
        # the HIGHEST-precision oracle, not the default mxu2 rounding
        sel_impl="mxu",
    )
    do0, dh0 = CL.chamfer_dist_loss(x, n, y, **kw)
    do1, dh1 = CL.chamfer_dist_loss(x, n, y, **kw, region_cull=True)
    np.testing.assert_allclose(np.asarray(do1), np.asarray(do0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dh1), np.asarray(dh0), rtol=1e-6)

    a = jnp.asarray(rng.normal(size=F), jnp.float32)
    b = jnp.asarray(rng.normal(size=F), jnp.float32)

    def loss(xx, rc):
        do, dh = CL.chamfer_dist_loss(xx, n, y, **kw, region_cull=rc)
        return jnp.sum(a * do) + jnp.sum(b * dh)

    g0 = jax.grad(lambda xx: loss(xx, False))(x)
    g1 = jax.grad(lambda xx: loss(xx, True))(x)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g0), rtol=1e-4, atol=1e-6
    )


def test_region_cull_actually_culls_and_stays_exact():
    """On the separated grasp+far scene the mask must SKIP blocks (else the
    parity tests above are vacuous) while values still match the uncull
    kernel; x_valid frames and the x_perm plumbing ride along."""
    rng = np.random.default_rng(12)
    F, P1, P2, L, tile = 8, 500, 1024, 4, 256
    G_ = F // L
    x, n, y = _separated_scene(rng, F, P1, P2, G_)
    vw2 = jnp.asarray(rng.random(P1), jnp.float32)
    o2h_g, h2o_g = _gt_fields(rng, x, n, y, None, L)
    xv = jnp.asarray(np.array([1, 1, 0, 1, 1, 0, 1, 1], bool))
    perm = np.asarray(rng.permutation(P1))

    P1p = 512
    m = np.asarray(CL._region_cull_mask(x, y, None, tile, L, P1p, xv))
    assert m.shape == (F, 4, 4)
    # invalid frames all-zero; the "palm-end" region 0 (far from both
    # objects) must lose its o2h candidacy everywhere AND be fully culled
    # for the far tiles (2, 3); every valid column keeps >= 1 candidate
    assert (m[2] == 0).all() and (m[5] == 0).all()
    valid_f = np.array([0, 1, 3, 4, 6, 7])
    assert (m[valid_f][:, 0, :] < 2).all(), "region 0 should never be an o2h candidate"
    assert (m[valid_f][:, 0, 2:] == 0).all(), "region 0 far tiles should cull"
    run_frac = (m != 0).mean()
    assert run_frac <= 0.6, f"too few blocks culled (run_frac={run_frac})"
    assert (m[valid_f] >= 2).any(axis=1).all(), "every tile needs a candidate"

    kw = dict(
        o2h_g=o2h_g, h2o_g=h2o_g, vw2=vw2, y_group=L, tile=tile,
        x_valid=xv, interpret=True, sel_impl="mxu",  # oracle (see above)
    )
    do0, dh0 = CL.chamfer_dist_loss(x, n, y, **kw)
    do1, dh1 = CL.chamfer_dist_loss(x, n, y, **kw, region_cull=True)
    np.testing.assert_allclose(np.asarray(do1), np.asarray(do0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dh1), np.asarray(dh0), rtol=1e-6)

    # permuted run: sums invariant at rtol, gradient maps back through the
    # gather (compare against the unpermuted culled run)
    do2, dh2 = CL.chamfer_dist_loss(
        x, n, y, **kw, region_cull=True, x_perm=perm
    )
    np.testing.assert_allclose(np.asarray(do2), np.asarray(do1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dh2), np.asarray(dh1), rtol=1e-4)

    a = jnp.asarray(rng.normal(size=F), jnp.float32)
    b = jnp.asarray(rng.normal(size=F), jnp.float32)

    def loss(xx, **k):
        do, dh = CL.chamfer_dist_loss(xx, n, y, **kw, **k)
        return jnp.sum(a * do) + jnp.sum(b * dh)

    g1 = jax.grad(lambda xx: loss(xx, region_cull=True))(x)
    g2 = jax.grad(lambda xx: loss(xx, region_cull=True, x_perm=perm))(x)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-4, atol=1e-6)


def test_region_cull_degenerate_padded_slot_is_zero_and_finite():
    """The all-zero collate-padding geometry through the CULL route: zero
    sums, finite zero gradients (mirrors the uncull degenerate test)."""
    F, P1, P2 = 2, 13, 256
    x = jnp.zeros((F, P1, 3), jnp.float32)
    n = jnp.zeros((F, P1, 3), jnp.float32)
    y = jnp.zeros((F, P2, 3), jnp.float32)

    def loss(xx):
        do_f, dh_f = CL.chamfer_dist_loss(
            xx, n, y, o2h_g=jnp.zeros((F, P2)), h2o_g=jnp.zeros((F, P1)),
            vw2=jnp.ones((P1,)), tile=256, interpret=True, region_cull=True,
        )
        return jnp.sum(do_f) + jnp.sum(dh_f)

    v, g = jax.value_and_grad(loss)(x)
    assert float(v) == 0.0
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_chamfer_dist_loss_x_valid_skips_frames():
    """x_valid=False frames emit exactly zero sums and zero gradients; valid
    frames are bit-identical to the unmasked run."""
    rng = np.random.default_rng(21)
    F, G_, P1, P2, L = 8, 2, 778, 512, 4
    x = jnp.asarray(rng.normal(size=(F, P1, 3)).astype(np.float32) * 0.05)
    n = jnp.asarray(rng.normal(size=(F, P1, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(G_, P2, 3)).astype(np.float32) * 0.05)
    og = jnp.asarray(rng.normal(size=(F, P2)).astype(np.float32) * 0.01)
    hg = jnp.asarray(np.abs(rng.normal(size=(F, P1))).astype(np.float32) * 0.01)
    vw2 = jnp.asarray(np.abs(rng.normal(size=(P1,))).astype(np.float32))
    xv = jnp.asarray(np.array([1, 1, 0, 1, 0, 0, 1, 1], bool))

    def run(x_valid):
        return CL.chamfer_dist_loss(
            x, n, y, o2h_g=og, h2o_g=hg, vw2=vw2, y_group=L,
            x_valid=x_valid, interpret=True,
        )

    do_full, dh_full = run(None)
    do_m, dh_m = run(xv)
    v = np.asarray(xv)
    np.testing.assert_array_equal(np.asarray(do_m)[v], np.asarray(do_full)[v])
    np.testing.assert_array_equal(np.asarray(dh_m)[v], np.asarray(dh_full)[v])
    np.testing.assert_array_equal(np.asarray(do_m)[~v], 0.0)
    np.testing.assert_array_equal(np.asarray(dh_m)[~v], 0.0)

    # gradients: zero rows at skipped frames, bit-equal at valid frames
    gfull = jax.grad(lambda xx: jnp.sum(sum(CL.chamfer_dist_loss(
        xx, n, y, o2h_g=og, h2o_g=hg, vw2=vw2, y_group=L, interpret=True))))(x)
    gm = jax.grad(lambda xx: jnp.sum(sum(CL.chamfer_dist_loss(
        xx, n, y, o2h_g=og, h2o_g=hg, vw2=vw2, y_group=L, x_valid=xv,
        interpret=True))))(x)
    np.testing.assert_array_equal(np.asarray(gm)[v], np.asarray(gfull)[v])
    np.testing.assert_array_equal(np.asarray(gm)[~v], 0.0)
