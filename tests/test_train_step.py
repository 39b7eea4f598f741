"""Train-step tests on the virtual 8-device CPU mesh: G diffusion step with
extra losses, R step, encoder step, batched sampler; loss decreases on a fixed
batch; shardings compile and execute."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oakink2_tamf_tpu.core import diffusion as D
from oakink2_tamf_tpu.core import mano as M
from oakink2_tamf_tpu.data.synthetic import synthetic_batch, with_perturbed_sample
from oakink2_tamf_tpu.models import losses as LL
from oakink2_tamf_tpu.models.encoder import EncoderConfig, SegmentEncoder
from oakink2_tamf_tpu.models.mdm_g import InteractionSegmentMDM, MDMConfig
from oakink2_tamf_tpu.models.refine_r import RefineConfig, SegmentRefineNet, stack_mano_models
from oakink2_tamf_tpu.parallel import train as PT
from oakink2_tamf_tpu.parallel.mesh import make_mesh, shard_batch, replicate

L, NOBJ, P = 16, 2, 64


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests expect the 8-device CPU mesh"
    return make_mesh()


@pytest.fixture(scope="module")
def small_g():
    cfg = MDMConfig(latent_dim=32, ff_size=64, num_layers=2, num_heads=4, dropout=0.0)
    return InteractionSegmentMDM(cfg)


def init_g(model, batch):
    cond = PT.g_cond_from_batch(batch)
    x = batch["pose_repr"]
    t = jnp.zeros((x.shape[0],), jnp.int32)
    return model.init(jax.random.PRNGKey(0), x, t, cond)


def test_g_train_step_loss_decreases(mesh, small_g):
    rng = np.random.default_rng(0)
    batch = synthetic_batch(rng, batch_size=8, seq_len=L, max_nobj=NOBJ, n_obj_points=P)
    sched = D.tamf_schedule(50)
    params = init_g(small_g, batch)
    opt = PT.make_optimizer(base_lr=1e-3)
    state = PT.init_train_state(params, opt)
    step = PT.make_g_train_step(small_g, sched, opt, mesh=mesh)

    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(12):
        # same noise key each iter -> pure optimization progress signal
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["diffusion_loss"]))
    assert losses[-1] < losses[0], losses
    assert int(jax.device_get(state.step)) == 12


def test_g_train_step_with_extra_losses(mesh, small_g):
    rng = np.random.default_rng(1)
    batch = synthetic_batch(rng, batch_size=8, seq_len=L, max_nobj=NOBJ, n_obj_points=P)
    sched = D.tamf_schedule(20)
    params = init_g(small_g, batch)
    opt = PT.make_optimizer()
    state = PT.init_train_state(params, opt)
    mano_stack = stack_mano_models(M.synthetic_mano_model("right"), M.synthetic_mano_model("left"))
    assets = LL.load_contact_assets()
    step = PT.make_g_train_step(
        small_g, sched, opt, mano_stack, assets, LL.ExtraLossConfig(), chunk=64, mesh=mesh
    )
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert "extra/rec_joint" in metrics and np.isfinite(float(metrics["loss"]))


def test_g_sampler_batched(mesh, small_g):
    rng = np.random.default_rng(2)
    batch = synthetic_batch(rng, batch_size=8, seq_len=L, max_nobj=NOBJ, n_obj_points=P)
    sched = D.tamf_schedule(10)
    params = init_g(small_g, batch)
    sampler = PT.make_g_sampler(small_g, sched, mesh=mesh)
    out = sampler(replicate(params, mesh), shard_batch(batch, mesh), jax.random.PRNGKey(0))
    assert out.shape == (8, L, 99)
    assert np.all(np.isfinite(np.asarray(out)))


def test_g_sampler_parallel(mesh, small_g):
    """sampler='parallel' (Picard windows) compiles over the mesh and runs the
    real G model; numerics vs the sequential chain are in
    tests/test_parallel_sampler.py."""
    rng = np.random.default_rng(7)
    batch = synthetic_batch(rng, batch_size=8, seq_len=L, max_nobj=NOBJ, n_obj_points=P)
    sched = D.tamf_schedule(10)
    params = init_g(small_g, batch)
    sampler = PT.make_g_sampler(
        small_g, sched, sampler="parallel", mesh=mesh, parallel_window=4, parallel_tol=1e-2
    )
    out = sampler(replicate(params, mesh), shard_batch(batch, mesh), jax.random.PRNGKey(0))
    assert out.shape == (8, L, 99)
    assert np.all(np.isfinite(np.asarray(out)))


def test_r_train_step(mesh):
    rng = np.random.default_rng(3)
    batch = synthetic_batch(rng, batch_size=8, seq_len=L, max_nobj=NOBJ, n_obj_points=P)
    batch = with_perturbed_sample(batch, rng)
    net = SegmentRefineNet(RefineConfig(latent_dim=32, ff_size=64, num_layers=1, num_heads=2, dropout=0.0))
    mano_stack = stack_mano_models(M.synthetic_mano_model("right"), M.synthetic_mano_model("left"))
    assets = LL.load_contact_assets()

    cond = {k: batch[k] for k in ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
    h2o0 = jnp.zeros((8, L, 778))
    params = net.init(jax.random.PRNGKey(0), batch["sample_pose_repr"], h2o0, cond)
    opt = PT.make_optimizer(base_lr=1e-3)
    state = PT.init_train_state(params, opt)
    step = PT.make_r_train_step(net, opt, mano_stack, assets, LL.RefineLossConfig(), chunk=64, mesh=mesh)

    state = replicate(state, mesh)
    sbatch = shard_batch(batch, mesh)
    l0 = None
    for i in range(6):
        state, metrics = step(state, sbatch, jax.random.PRNGKey(5))
        if l0 is None:
            l0 = float(metrics["loss"])
    assert float(metrics["loss"]) < l0


def test_target_h2o_cache(mesh, tmp_path):
    """TargetH2OCache: precomputed target_h2o equals the inline target chamfer,
    target_geometry consumes it, and both storage modes round-trip."""
    from oakink2_tamf_tpu.data.collate import SegmentCollate
    from oakink2_tamf_tpu.data.target_cache import TargetH2OCache
    from oakink2_tamf_tpu.launch import common
    from oakink2_tamf_tpu.models.refine_r import target_geometry

    base = common.SyntheticSegments(size=6, seq_len=L, max_nobj=NOBJ, n_obj_points=P)
    collate = SegmentCollate(max_nobj=NOBJ, n_obj_points=P)
    mano_stack = stack_mano_models(M.synthetic_mano_model("right"), M.synthetic_mano_model("left"))

    cache = TargetH2OCache(base, mano_stack, collate, chunk=64, batch_size=4)
    assert cache.precompute() == 6
    assert cache.precompute() == 0  # idempotent

    batch = collate([cache[i] for i in range(4)])
    assert batch["target_h2o"].shape == (4, L, 778)
    db = {k: jnp.asarray(v) for k, v in common.device_batch(batch).items()}

    tg_cached = target_geometry(mano_stack, db, chunk=64)
    db_inline = {k: v for k, v in db.items() if k != "target_h2o"}
    tg_inline = target_geometry(mano_stack, db_inline, chunk=64)
    np.testing.assert_allclose(
        np.asarray(tg_cached["target_h2o_dist"]),
        np.asarray(tg_inline["target_h2o_dist"]), atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(tg_cached["target_hand_verts"]),
        np.asarray(tg_inline["target_hand_verts"]), atol=1e-6,
    )

    # disk-backed mode + lazy single-sample fallback (no precompute call)
    disk = TargetH2OCache(
        base, mano_stack, collate, chunk=64, batch_size=4, cache_dir=str(tmp_path / "t")
    )
    s = disk[2]  # cold miss -> computed + persisted
    np.testing.assert_allclose(s["target_h2o"], cache[2]["target_h2o"], atol=1e-5)
    assert disk._has(2) and not disk._has(0)


def test_target_cache_overflow_exact_fallback(mesh):
    """_run never persists an unproven cluster value: samples whose overflow
    certificate fires are recomputed with the exact all-pairs kernel (forced
    here via a fake fn — on CPU the auto route is exact and never overflows,
    which the zero-certificate assertion below also pins)."""
    from oakink2_tamf_tpu.data.collate import SegmentCollate
    from oakink2_tamf_tpu.data.target_cache import TargetH2OCache
    from oakink2_tamf_tpu.launch import common
    from oakink2_tamf_tpu.models.refine_r import (
        batch_recover_mano, multi_object_h2o_overflow,
    )

    base = common.SyntheticSegments(size=4, seq_len=L, max_nobj=NOBJ, n_obj_points=P)
    collate = SegmentCollate(max_nobj=NOBJ, n_obj_points=P)
    mano_stack = stack_mano_models(M.synthetic_mano_model("right"), M.synthetic_mano_model("left"))
    cache = TargetH2OCache(base, mano_stack, collate, chunk=64, batch_size=4)
    batch = collate([base[i] for i in range(4)])

    # off the cluster route the certificate is trivially clear
    verts, _, _ = batch_recover_mano(
        mano_stack, jnp.asarray(batch["pose_repr"]), batch["shape"], batch["hand_side"]
    )
    ovf = multi_object_h2o_overflow(
        verts, jnp.asarray(batch["obj_traj"]), jnp.asarray(batch["obj_points"]),
        jnp.asarray(batch["obj_mask"]), chunk=64,
    )
    assert np.asarray(ovf).shape == (4,) and int(np.asarray(ovf).sum()) == 0

    garbage = np.full((4, L, 778), 7.0, np.float32)
    fake_ovf = np.array([2, 0, 1, 0], np.int32)
    out = cache._run(lambda *a: (jnp.asarray(garbage), jnp.asarray(fake_ovf)), batch)
    exact = cache._run(cache._make_fn(), batch)  # true values (certificate clear)
    for k in range(4):
        if fake_ovf[k]:
            np.testing.assert_allclose(out[k], exact[k], atol=1e-5)
        else:
            np.testing.assert_array_equal(out[k], garbage[k])


def test_r_train_step_with_cached_target(mesh):
    """The R step with a batch-carried target_h2o produces the same loss as the
    inline target chamfer."""
    rng = np.random.default_rng(11)
    batch = synthetic_batch(rng, batch_size=8, seq_len=L, max_nobj=NOBJ, n_obj_points=P)
    batch = with_perturbed_sample(batch, rng)
    net = SegmentRefineNet(RefineConfig(latent_dim=32, ff_size=64, num_layers=1, num_heads=2, dropout=0.0))
    mano_stack = stack_mano_models(M.synthetic_mano_model("right"), M.synthetic_mano_model("left"))
    assets = LL.load_contact_assets()
    cond = {k: batch[k] for k in ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
    params = net.init(jax.random.PRNGKey(0), batch["sample_pose_repr"], jnp.zeros((8, L, 778)), cond)
    opt = PT.make_optimizer()
    step = PT.make_r_train_step(net, opt, mano_stack, assets, LL.RefineLossConfig(), chunk=64, mesh=mesh)

    from oakink2_tamf_tpu.models.refine_r import target_geometry

    tgt = target_geometry(mano_stack, batch, chunk=64)
    batch_cached = dict(batch, target_h2o=tgt["target_h2o_dist"])

    # independent buffer copies: the step donates its state, so two states
    # sharing leaves would hit deleted arrays on the second call
    params2 = jax.tree.map(jnp.array, params)
    s1 = replicate(PT.init_train_state(params, opt), mesh)
    s2 = replicate(PT.init_train_state(params2, opt), mesh)
    _, m_inline = step(s1, shard_batch(batch, mesh), jax.random.PRNGKey(5))
    _, m_cached = step(s2, shard_batch(batch_cached, mesh), jax.random.PRNGKey(5))
    np.testing.assert_allclose(
        float(m_cached["loss"]), float(m_inline["loss"]), rtol=1e-5, atol=1e-6
    )


def test_encoder_train_step(mesh):
    rng = np.random.default_rng(4)
    batch = synthetic_batch(rng, batch_size=16, seq_len=L, max_nobj=NOBJ, n_obj_points=P)
    model = SegmentEncoder(EncoderConfig(latent_dim=32, ff_size=64, num_layers=1, num_heads=2, dropout=0.0))
    cond = {k: batch[k] for k in ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
    params = model.init(jax.random.PRNGKey(0), batch["pose_repr"], cond)
    opt = PT.make_optimizer(base_lr=1e-3)
    state = PT.init_train_state(params, opt)
    step = PT.make_encoder_train_step(model, opt, mesh=mesh)

    state = replicate(state, mesh)
    sbatch = shard_batch(batch, mesh)
    l0 = None
    for i in range(10):
        state, metrics = step(state, sbatch, jax.random.PRNGKey(6))
        if l0 is None:
            l0 = float(metrics["ce"])
    assert float(metrics["ce"]) < l0
    assert 0.0 <= float(metrics["acc"]) <= 1.0


def test_per_param_clip():
    import optax

    tx = PT.per_param_clip(0.1)
    grads = {"a": jnp.ones((10,)) * 5.0, "b": jnp.asarray([0.001, 0.002])}
    clipped, _ = tx.update(grads, tx.init(grads))
    assert abs(float(jnp.linalg.norm(clipped["a"])) - 0.1) < 1e-5  # clipped
    np.testing.assert_allclose(np.asarray(clipped["b"]), np.asarray(grads["b"]), atol=1e-8)  # untouched


def test_multistep_lr():
    sch = PT.multistep_lr(1e-4, [100, 200], 0.5)
    assert abs(sch(0) - 1e-4) < 1e-12
    assert abs(sch(150) - 5e-5) < 1e-12
    assert abs(sch(250) - 2.5e-5) < 1e-12


def test_g_train_step_host_provided_t(mesh, small_g):
    """Importance-resampler path: t/t_weights arrive in the batch."""
    rng = np.random.default_rng(9)
    batch = synthetic_batch(rng, batch_size=8, seq_len=L, max_nobj=NOBJ, n_obj_points=P)
    sched = D.tamf_schedule(30)
    params = init_g(small_g, batch)
    opt = PT.make_optimizer()
    state = PT.init_train_state(params, opt)
    step = PT.make_g_train_step(small_g, sched, opt, mesh=mesh)

    batch = dict(batch)
    batch["t"] = jnp.asarray(np.arange(8) % 30, jnp.int32)
    batch["t_weights"] = jnp.full((8,), 0.5, jnp.float32)

    state = replicate(state, mesh)
    sbatch = shard_batch(batch, mesh)
    state, metrics = step(state, sbatch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(metrics["per_sample_t"]), np.arange(8) % 30)
    assert np.isfinite(float(metrics["diffusion_loss"]))


def test_gt_geom_cache(mesh, tmp_path):
    """GTGeomCache: precomputed gt_o2h/gt_h2o equal the inline GT-side signed
    chamfer, extra_loss_gt_geometry consumes them, and disk mode round-trips
    with real-object-row compression."""
    from oakink2_tamf_tpu.data.collate import SegmentCollate
    from oakink2_tamf_tpu.data.target_cache import GTGeomCache
    from oakink2_tamf_tpu.launch import common

    base = common.SyntheticSegments(size=6, seq_len=L, max_nobj=NOBJ, n_obj_points=P)
    collate = SegmentCollate(max_nobj=NOBJ, n_obj_points=P)
    mano_stack = stack_mano_models(M.synthetic_mano_model("right"), M.synthetic_mano_model("left"))

    cache = GTGeomCache(base, mano_stack, collate, chunk=64, batch_size=4)
    assert cache.precompute() == 6
    assert cache.precompute() == 0  # idempotent

    batch = collate([cache[i] for i in range(4)])
    assert batch["gt_o2h"].shape == (4, NOBJ, L, P)
    assert batch["gt_h2o"].shape == (4, NOBJ, L, 778)
    db = {k: jnp.asarray(v) for k, v in common.device_batch(batch).items()}
    # device_batch must FORWARD the cached keys — a filter that drops them
    # silently turns the whole cache into a no-op (the loss falls back to
    # the inline GT chamfer and this comparison becomes inline-vs-inline)
    assert "gt_o2h" in db and "gt_h2o" in db

    gg_cached = LL.extra_loss_gt_geometry(mano_stack, db, chunk=64)
    db_inline = {k: v for k, v in db.items() if k not in ("gt_o2h", "gt_h2o")}
    gg_inline = LL.extra_loss_gt_geometry(mano_stack, db_inline, chunk=64)
    # padded-object rows are garbage in BOTH paths (masked by om in the loss):
    # compare only the real-object rows
    nreal = np.asarray(batch["obj_num"]).astype(int)
    for k in ("o2h_g", "h2o_g"):
        for b in range(4):
            np.testing.assert_allclose(
                np.asarray(gg_cached[k])[b, : nreal[b]],
                np.asarray(gg_inline[k])[b, : nreal[b]], atol=1e-5,
            )

    disk = GTGeomCache(
        base, mano_stack, collate, chunk=64, batch_size=4, cache_dir=str(tmp_path / "g")
    )
    s = disk[2]  # cold miss -> computed + persisted (real rows only)
    np.testing.assert_allclose(s["gt_o2h"], cache[2]["gt_o2h"], atol=1e-5)
    np.testing.assert_allclose(s["gt_h2o"], cache[2]["gt_h2o"], atol=1e-5)
    assert disk._has(2) and not disk._has(0)


def test_g_train_step_with_cached_gt_geom(mesh, small_g):
    """The G step with batch-carried gt_o2h/gt_h2o produces the same loss as
    the inline GT chamfer (real-object terms only differ by float noise)."""
    rng = np.random.default_rng(13)
    batch = synthetic_batch(rng, batch_size=8, seq_len=L, max_nobj=NOBJ, n_obj_points=P)
    # force every object real so cached/inline paths see identical masked terms
    batch["obj_mask"] = np.ones_like(batch["obj_mask"])
    sched = D.tamf_schedule(20)
    params = init_g(small_g, batch)
    mano_stack = stack_mano_models(M.synthetic_mano_model("right"), M.synthetic_mano_model("left"))
    assets = LL.load_contact_assets()
    opt = PT.make_optimizer()
    step = PT.make_g_train_step(
        small_g, sched, opt, mano_stack, assets, LL.ExtraLossConfig(), chunk=64, mesh=mesh
    )

    gg = LL.extra_loss_gt_geometry(mano_stack, {k: jnp.asarray(v) for k, v in batch.items()}, chunk=64)
    batch_cached = dict(batch, gt_o2h=np.asarray(gg["o2h_g"]), gt_h2o=np.asarray(gg["h2o_g"]))

    params2 = jax.tree.map(jnp.array, params)
    s1 = replicate(PT.init_train_state(params, opt), mesh)
    s2 = replicate(PT.init_train_state(params2, opt), mesh)
    _, m_inline = step(s1, shard_batch(batch, mesh), jax.random.PRNGKey(5))
    _, m_cached = step(s2, shard_batch(batch_cached, mesh), jax.random.PRNGKey(5))
    np.testing.assert_allclose(
        float(m_cached["loss"]), float(m_inline["loss"]), rtol=2e-5
    )
    for k in ("extra/dist_h", "extra/dist_o"):
        np.testing.assert_allclose(
            float(m_cached[k]), float(m_inline[k]), rtol=2e-5
        )
