"""Shape/behavior tests for G, R, encoder models and losses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oakink2_tamf_tpu.core import mano as M
from oakink2_tamf_tpu.models import losses as LL
from oakink2_tamf_tpu.models.encoder import EncoderConfig, SegmentEncoder
from oakink2_tamf_tpu.models.mdm_g import InteractionSegmentMDM, MDMConfig
from oakink2_tamf_tpu.models.refine_r import (
    RefineConfig,
    SegmentRefineNet,
    multi_object_h2o_dist,
    refine_forward,
    stack_mano_models,
)

BS, L, NOBJ, P = 2, 16, 2, 64


def make_cond(rng, bs=BS, L=L, nobj=NOBJ):
    return {
        "text_emb": jnp.asarray(rng.normal(size=(bs, 512)).astype(np.float32)),
        "hand_side": jnp.asarray(rng.integers(0, 2, size=(bs,)).astype(np.int32)),
        "shape": jnp.asarray(rng.normal(size=(bs, L, 10)).astype(np.float32)),
        "obj_traj": jnp.asarray(rng.normal(size=(bs, nobj, L, 9)).astype(np.float32)),
        "obj_embedding": jnp.asarray(rng.normal(size=(bs, nobj, 768)).astype(np.float32)),
        "obj_mask": jnp.asarray(np.array([[True, False], [True, True]])),
    }


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_mdm_g_forward(rng):
    cfg = MDMConfig(latent_dim=32, ff_size=64, num_layers=2, num_heads=4)
    model = InteractionSegmentMDM(cfg)
    x = jnp.asarray(rng.normal(size=(BS, L, 99)).astype(np.float32))
    t = jnp.asarray(np.array([3, 7], np.int32))
    cond = make_cond(rng)
    variables = model.init(jax.random.PRNGKey(0), x, t, cond)
    out = model.apply(variables, x, t, cond)
    assert out.shape == (BS, L, 99)
    assert np.all(np.isfinite(np.asarray(out)))

    # timestep changes output
    out2 = model.apply(variables, x, jnp.asarray(np.array([900, 900], np.int32)), cond)
    assert float(jnp.abs(out - out2).max()) > 1e-6

    # force_mask zeroes text contribution deterministically
    out3 = model.apply(variables, x, t, cond, force_mask=True)
    cond_zero = dict(cond)
    cond_zero["text_emb"] = jnp.zeros_like(cond["text_emb"])
    out4 = model.apply(variables, x, t, cond_zero)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out4), atol=1e-6)


def test_mdm_g_obj_pad_invariance(rng):
    """Adding a masked pad object must not change the output."""
    cfg = MDMConfig(latent_dim=32, ff_size=64, num_layers=1, num_heads=2)
    model = InteractionSegmentMDM(cfg)
    x = jnp.asarray(rng.normal(size=(1, L, 99)).astype(np.float32))
    t = jnp.asarray(np.array([5], np.int32))

    cond1 = make_cond(rng, bs=1, nobj=1)
    cond1["obj_mask"] = jnp.asarray(np.array([[True]]))
    variables = model.init(jax.random.PRNGKey(0), x, t, cond1)
    out1 = model.apply(variables, x, t, cond1)

    cond2 = dict(cond1)
    pad = lambda a: jnp.concatenate([a, jnp.full_like(a[:, :1], 123.0)], axis=1)
    cond2["obj_traj"] = pad(cond1["obj_traj"])
    cond2["obj_embedding"] = pad(cond1["obj_embedding"])
    cond2["obj_mask"] = jnp.asarray(np.array([[True, False]]))
    out2 = model.apply(variables, x, t, cond2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_refine_net_and_forward(rng):
    cfg = RefineConfig(latent_dim=32, ff_size=64, num_layers=1, num_heads=2)
    net = SegmentRefineNet(cfg)
    mano_stack = stack_mano_models(
        M.synthetic_mano_model("right"), M.synthetic_mano_model("left")
    )
    batch = {
        "sample_pose_repr": jnp.asarray(rng.normal(size=(BS, L, 99)).astype(np.float32)),
        "pose_repr": jnp.asarray(rng.normal(size=(BS, L, 99)).astype(np.float32)),
        "shape": jnp.asarray(rng.normal(size=(BS, L, 10)).astype(np.float32)),
        "hand_side": jnp.asarray(np.array([0, 1], np.int32)),
        "obj_traj": jnp.asarray(rng.normal(size=(BS, NOBJ, L, 9)).astype(np.float32)),
        "obj_embedding": jnp.asarray(rng.normal(size=(BS, NOBJ, 768)).astype(np.float32)),
        "obj_mask": jnp.asarray(np.array([[True, False], [True, True]])),
        "obj_points": jnp.asarray(rng.normal(size=(BS, NOBJ, P, 3)).astype(np.float32)),
        "mask": jnp.ones((BS, L), jnp.float32),
    }
    h2o0 = jnp.zeros((BS, L, 778))
    cond = {k: batch[k] for k in ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
    variables = net.init(jax.random.PRNGKey(0), batch["sample_pose_repr"], h2o0, cond)

    out = refine_forward(net, variables, mano_stack, batch, chunk=64)
    assert out["refine_pose_repr"].shape == (BS, L, 99)
    assert out["refine_hand_verts"].shape == (BS, L, 778, 3)
    assert out["refine_h2o_dist"].shape == (BS, L, 778)
    assert out["target_hand_joints"].shape == (BS, L, 21, 3)
    for v in out.values():
        assert np.all(np.isfinite(np.asarray(v)))

    # residual structure: tiny network output keeps x_in dominant — check the
    # refined pose is x_in + head (head bounded), not something unrelated
    assert float(jnp.abs(out["refine_pose_repr"] - batch["sample_pose_repr"]).mean()) < 10.0

    # loss computes
    assets = LL.load_contact_assets()
    loss, terms = LL.segment_refine_loss(assets, LL.RefineLossConfig(), out, batch)
    assert np.isfinite(float(loss))
    assert set(terms) == {"loss", "rec_joint", "rec_vert", "dist_h"}


def test_multi_object_h2o_pad_invariance(rng):
    """A masked pad object must not change h2o distances."""
    mano_stack = stack_mano_models(
        M.synthetic_mano_model("right"), M.synthetic_mano_model("left")
    )
    hv = jnp.asarray(rng.normal(size=(1, 4, 778, 3)).astype(np.float32))
    hn = jnp.asarray(rng.normal(size=(1, 4, 778, 3)).astype(np.float32))
    traj1 = jnp.asarray(rng.normal(size=(1, 1, 4, 9)).astype(np.float32))
    pts1 = jnp.asarray(rng.normal(size=(1, 1, P, 3)).astype(np.float32))
    h1 = multi_object_h2o_dist(hv, hn, traj1, pts1, jnp.asarray([[True]]), chunk=32)

    traj2 = jnp.concatenate([traj1, jnp.zeros_like(traj1)], axis=1)
    pts2 = jnp.concatenate([pts1, jnp.zeros_like(pts1)], axis=1)
    h2 = multi_object_h2o_dist(hv, hn, traj2, pts2, jnp.asarray([[True, False]]), chunk=32)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)


def test_multi_object_h2o_all_masked_finite(rng):
    """A sample with NO valid objects must yield FINITE distances (and finite
    gradients): an inf sentinel min'd over objects produced inf - inf = NaN
    in the refine loss, poisoning the whole batch's gradients."""
    hv = jnp.asarray(rng.normal(size=(1, 4, 778, 3)).astype(np.float32))
    hn = jnp.asarray(rng.normal(size=(1, 4, 778, 3)).astype(np.float32))
    traj = jnp.asarray(rng.normal(size=(1, 2, 4, 9)).astype(np.float32))
    pts = jnp.asarray(rng.normal(size=(1, 2, P, 3)).astype(np.float32))
    mask = jnp.asarray([[False, False]])
    h = multi_object_h2o_dist(hv, hn, traj, pts, mask, chunk=32)
    assert np.all(np.isfinite(np.asarray(h)))

    # |h2o(x) - h2o_target| at equal sentinel values must backprop zeros,
    # not NaN (the refine-loss dist_h shape on a degenerate sample)
    def loss(v):
        d = multi_object_h2o_dist(v, hn, traj, pts, mask, chunk=32)
        return jnp.sum(jnp.abs(d - jax.lax.stop_gradient(d)))

    g = jax.grad(loss)(hv)
    assert np.all(np.isfinite(np.asarray(g)))


def test_sample_geometry_padded_frame_dedup(rng):
    """sample_geometry(frame_mask=...) must (a) match the full pass on every
    valid frame and (b) emit the REFERENCE-exact degenerate value ||v_i|| of
    the zero-pose hand on zero-padded frames — where the full hand-into-
    canonical-frame pass CANNOT reproduce the reference (rot6d(0) -> R=0
    collapses the hand, see the sample_geometry docstring)."""
    from oakink2_tamf_tpu.models.refine_r import sample_geometry

    bs, Ls = 2, 8
    lens = [5, Ls]  # one padded sample, one full-length
    mask = np.zeros((bs, Ls), np.float32)
    for i, n in enumerate(lens):
        mask[i, :n] = 1.0
    pose = rng.normal(size=(bs, Ls, 99)).astype(np.float32) * mask[:, :, None]
    shape = rng.normal(size=(bs, Ls, 10)).astype(np.float32) * mask[:, :, None]
    traj = rng.normal(size=(bs, NOBJ, Ls, 9)).astype(np.float32)
    traj = traj * mask[:, None, :, None]
    batch = {
        "sample_pose_repr": jnp.asarray(pose),
        "shape": jnp.asarray(shape),
        "hand_side": jnp.asarray(np.array([0, 1], np.int32)),
        "obj_traj": jnp.asarray(traj),
        "obj_points": jnp.asarray(
            rng.normal(size=(bs, NOBJ, P, 3)).astype(np.float32) * 0.1
        ),
        "obj_mask": jnp.asarray(np.array([[True, False], [True, True]])),
    }
    mano_stack = stack_mano_models(
        M.synthetic_mano_model("right"), M.synthetic_mano_model("left")
    )
    full = sample_geometry(mano_stack, batch, chunk=32)
    fast = sample_geometry(
        mano_stack, batch, chunk=32, frame_mask=jnp.asarray(mask)
    )
    h_full = np.asarray(full["sample_h2o_dist"])
    h_fast = np.asarray(fast["sample_h2o_dist"])
    valid = mask > 0
    np.testing.assert_allclose(h_fast[valid], h_full[valid], rtol=1e-6)
    # padded frames: per-vert norm of the zero-pose hand (frame L-1 of the
    # padded sample), identical across its padded frames
    v_pad = np.asarray(fast["sample_hand_verts"])[0, -1]
    expect = np.linalg.norm(v_pad, axis=-1)
    for f in range(lens[0], Ls):
        np.testing.assert_allclose(h_fast[0, f], expect, rtol=1e-6)
    # MANO outputs are untouched by the dedup
    np.testing.assert_array_equal(
        np.asarray(fast["sample_hand_verts"]), np.asarray(full["sample_hand_verts"])
    )


def test_encoder_forward(rng):
    cfg = EncoderConfig(latent_dim=32, ff_size=64, num_layers=1, num_heads=2, output_dim=70)
    model = SegmentEncoder(cfg)
    x = jnp.asarray(rng.normal(size=(BS, L, 99)).astype(np.float32))
    cond = make_cond(rng)
    variables = model.init(jax.random.PRNGKey(0), x, cond)
    out = model.apply(variables, x, cond)
    assert out["encoding"].shape == (BS, 32)
    assert out["activation"].shape == (BS, 70)

    labels = jnp.asarray(np.array([3, 5], np.int32))
    loss, terms = LL.segment_encoder_loss(out, labels)
    assert np.isfinite(float(loss)) and 0.0 <= float(terms["acc"]) <= 1.0


def test_extra_loss(rng):
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
        "obj_points": jnp.asarray(rng.normal(size=(BS, NOBJ, P, 3)).astype(np.float32)),
        "mask": jnp.asarray((rng.random((BS, L)) > 0.2).astype(np.float32)),
    }
    model_output = jnp.asarray(rng.normal(size=(BS, L, 99)).astype(np.float32))
    loss, terms = LL.interaction_segment_extra_loss(
        mano_stack, assets, cfg, model_output, batch, chunk=64
    )
    assert np.isfinite(float(loss))
    assert set(terms) == {"loss", "rec_joint", "rec_vert", "edge_len", "dist_h", "dist_o"}
    # perfect prediction -> zero loss
    loss0, terms0 = LL.interaction_segment_extra_loss(
        mano_stack, assets, cfg, batch["pose_repr"], batch, chunk=64
    )
    assert float(loss0) < 1e-5

    # gradient flows
    g = jax.grad(
        lambda mo: LL.interaction_segment_extra_loss(mano_stack, assets, cfg, mo, batch, chunk=64)[0]
    )(model_output)
    assert np.all(np.isfinite(np.asarray(g))) and float(jnp.abs(g).max()) > 0

    # the experimental region-culled fused route (dist_impl="fused_cull",
    # interpret mode) must agree with the plain fused route through the full
    # loss — the template-perm tie-break sensitivity (ops/chamfer_loss
    # STATUS note) shows only at far columns under MXU rounding, which
    # interpret mode's exact f32 path doesn't have
    lf = lambda mo, impl: LL.interaction_segment_extra_loss(
        mano_stack, assets, cfg, mo, batch, chunk=64,
        dist_impl=impl, interpret=True,
    )[0]
    v_fused = float(lf(model_output, "fused"))
    v_cull = float(lf(model_output, "fused_cull"))
    np.testing.assert_allclose(v_cull, v_fused, rtol=1e-4)
    g_fused = jax.grad(lambda mo: lf(mo, "fused"))(model_output)
    g_cull = jax.grad(lambda mo: lf(mo, "fused_cull"))(model_output)
    np.testing.assert_allclose(
        np.asarray(g_cull), np.asarray(g_fused), rtol=2e-3, atol=1e-4
    )


def test_explicit_missing_contact_assets_raise(tmp_path):
    """Explicit vpe/c_weight paths that don't exist must raise, not silently
    substitute random contact weights (fail-loud contract, round-3 hardening)."""
    import pytest

    with pytest.raises(FileNotFoundError):
        LL.load_contact_assets(str(tmp_path / "vpe.npy"), str(tmp_path / "w.npy"))
    # one explicit + one missing is equally fatal
    import numpy as _np

    vpe = tmp_path / "vpe_ok.npy"
    _np.save(vpe, _np.zeros((4, 2), _np.int32))
    with pytest.raises(FileNotFoundError):
        LL.load_contact_assets(str(vpe), None)


def test_unset_contact_assets_warn_once(caplog):
    import logging

    LL._synthetic_assets_warned = False
    with caplog.at_level(logging.WARNING, logger="oakink2_tamf_tpu.models.losses"):
        a1 = LL.load_contact_assets()
        a2 = LL.load_contact_assets()
    assert a1.v_weights.shape == (778,)
    assert a2.vpe.shape[1] == 2
    warns = [r for r in caplog.records if "synthetic edges/weights" in r.message]
    assert len(warns) == 1
