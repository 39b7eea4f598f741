"""Benchmark: reverse-diffusion samples/sec/chip on MF-MDM G arch_mdm_l,
plus train-step throughput (G with geometric losses, R with cached target h2o)
and MFU accounting.

Headline (BASELINE.json): full 1000-step DDPM reverse chain, arch_mdm_l
(latent 512, ff 2048, 8 layers), seq_len 160, conditioning identical in
structure to production.

- "ours": batched on-device lax.scan chain (the framework's sampling path).
- "reference-structure emulation": batch-size 1 with one dispatched device
  step per denoise iteration from a python loop — the reference's sampling
  shape (launch/sample.py:202-229: bs=1, 1000 sequential steps) measured on
  the SAME chip, so vs_baseline isolates the architectural win (batching +
  scan fusion) from hardware differences. The ratio moves with host load;
  the absolute samples/s and MFU numbers are the stable figures.

- MFU: XLA compiled-program cost_analysis flops / wall time / per-chip peak
  (bf16 MXU peak by device kind — the scaling-book convention; XLA lowers
  f32 matmuls onto the MXU). Reported per benchmark when the backend exposes
  cost analysis.

- train benchmarks (skip with BENCH_TRAIN=0): one optimizer step — G:
  arch_mdm_l + interaction_segment_extra_loss (MANO + chamfer), R: arch_mdm +
  refine_forward with the precomputed target-h2o path (the production default
  since round 2). Default shapes are LIGHTER than production (bs 32,
  2 x 4096 pts) to bound compile time through the TPU tunnel — regression
  canaries, not absolute claims; BENCH_TRAIN_BATCH=64 BENCH_OBJ_POINTS=8192
  reproduces the production numbers quoted in docs/DESIGN.md. The headline
  JSON is printed BEFORE the train benches and re-printed with train extras
  on completion (last line wins), so a harness timeout never loses the
  headline.

With >1 visible device, everything runs sharded over a 1-D data mesh and
values are reported PER CHIP.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Human-readable per-benchmark lines go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# per-chip bf16 MXU peak FLOP/s by device kind substring (scaling-book values)
PEAK_FLOPS = [
    ("v6 lite", 918e12), ("v6e", 918e12),
    ("v5 lite", 197e12), ("v5e", 197e12), ("v5litepod", 197e12),
    ("v5p", 459e12), ("v5", 459e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
]


def _peak_flops(device) -> float | None:
    kind = (getattr(device, "device_kind", "") or "").lower()
    if device.platform != "tpu":
        return None
    for sub, peak in PEAK_FLOPS:
        if sub in kind:
            return peak
    return None


def _flops_of(compiled) -> float | None:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        f = ca.get("flops")
        return float(f) if f and f > 0 else None
    except Exception:
        return None


def _prev_round_value() -> float | None:
    """Headline value from the newest BENCH_r*.json driver artifact (if any):
    the absolute-throughput regression gate compares against it."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        n = int(m.group(1))
        if best is None or n > best[0]:
            best = (n, p)
    if best is None:
        return None
    try:
        with open(best[1]) as f:
            rec = json.load(f)
        v = rec.get("parsed", rec).get("value")
        return float(v) if v else None
    except Exception:
        return None


def _kernel_selfcheck():
    """On-device chamfer-kernel exactness check, run at bench time on the
    real TPU (round-4 lesson, commit d94c742: a BlockSpec that PASSED Pallas
    interpret mode failed Mosaic lowering on hardware — interpret-mode test
    coverage cannot certify the compiled kernels; the reference's CUDA
    chamfer is implicitly exercised on-device every step).

    One small mixed scene — grasp cloud + far 70%-valid cloud, padded x
    lanes (P1=778 -> 7 regions), mask-skipped frames — checks:
      1. bounds-culled h2o kernel vs the all-pairs kernel: BIT-equal on
         valid frames (ops/chamfer_cull's exactness contract),
      2. fused dist-loss kernel AT THE PRODUCTION DEFAULT (sel_impl="mxu2",
         the 2-pass bf16 one-hot split) — values + grads vs the composed
         XLA formulation at the documented parity rtol,
      3. region-culled fused kernel vs the plain fused kernel, both at the
         sel_impl="mxu" HIGHEST oracle (~1e-5: the cull kernel's winner
         select is exact f32 vs the MXU select's 2^-24 rounding).
    Returns "ok" or raises AssertionError with the failing check."""
    import jax
    import jax.numpy as jnp

    from oakink2_tamf_tpu.core import geometry as G
    from oakink2_tamf_tpu.ops import chamfer_loss as CL
    from oakink2_tamf_tpu.ops.chamfer_cull import point2point_h2o_cull
    from oakink2_tamf_tpu.ops.chamfer_pallas import point2point_h2o_pallas

    rng = np.random.default_rng(42)
    F, P1, P2, Lg, tile = 8, 778, 4096, 4, 2048
    G_ = F // Lg
    x = jnp.asarray(rng.normal(size=(F, P1, 3)) * 0.05, jnp.float32)
    n = rng.normal(size=(F, P1, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    n = jnp.asarray(n, jnp.float32)
    y_np = rng.normal(size=(G_, P2, 3)) * 0.04
    y_np[1] += 0.5  # second cloud far (exercises the triangle-inequality cull)
    y = jnp.asarray(y_np, jnp.float32)
    yv_np = np.ones((G_, P2), bool)
    yv_np[1, rng.random(P2) < 0.3] = False  # partial validity
    y_valid = jnp.asarray(yv_np)
    xv_np = np.ones(F, bool)
    xv_np[2] = xv_np[5] = False  # frame-skip path exercised
    xv = jnp.asarray(xv_np)
    vw2 = jnp.asarray(rng.random(P1), jnp.float32)

    # 1. culled h2o vs all-pairs: bit-equal for valid frames
    # (point2point_h2o_pallas already returns sqrt'd distances [F, P1])
    d_ref = jax.jit(
        lambda xx: point2point_h2o_pallas(
            xx, y, y_valid=y_valid, y_group=Lg, grad_y=False)
    )(x)
    d_cull = jax.jit(
        lambda xx: point2point_h2o_cull(
            xx, y, y_valid=y_valid, y_group=Lg, x_valid=xv, tile=tile)
    )(x)
    ok = np.asarray(d_cull)[xv_np] == np.asarray(d_ref)[xv_np]
    assert ok.all(), (
        f"cull-vs-allpairs h2o mismatch: {(~ok).sum()} of {ok.size} values "
        f"differ (max {np.abs(np.asarray(d_cull)[xv_np] - np.asarray(d_ref)[xv_np]).max()})"
    )

    # composed-path oracle sums (the models/losses.py dist math, XLA backend)
    yy = jnp.repeat(y, Lg, axis=0)
    yvv = jnp.repeat(y_valid, Lg, axis=0)
    o2h_g, h2o_g, _ = G.point2point_signed(
        x + 0.01, yy, x_normals=n, y_valid=yvv, backend="xla", grad_y=False
    )
    o2h_g = jax.lax.stop_gradient(o2h_g)
    h2o_g = jax.lax.stop_gradient(h2o_g)

    def composed_sums(xx):
        o2h, h2o, _ = G.point2point_signed(
            xx, yy, x_normals=n, y_valid=yvv, backend="xla", grad_y=False
        )
        band = (o2h_g < 0.01) & (o2h_g > -0.005)
        w = jnp.where(band, 1.0, 0.1)
        w = jnp.where(o2h < 0.0, 1.5, w)
        do_f = jnp.sum(jnp.abs(o2h - o2h_g) * w, axis=1)
        dh_f = jnp.sum(
            jnp.abs(jnp.abs(h2o) - jnp.abs(h2o_g)) * vw2[None, :], axis=1
        )
        return do_f * xv, dh_f * xv

    a = jnp.asarray(rng.normal(size=F), jnp.float32)
    b = jnp.asarray(rng.normal(size=F), jnp.float32)

    def fused_sums(xx, **kw):
        return CL.chamfer_dist_loss(
            xx, n, y, o2h_g=o2h_g, h2o_g=h2o_g, vw2=vw2, y_valid=y_valid,
            y_group=Lg, tile=tile, x_valid=xv, **kw,
        )

    def run(f):
        def scal(xx):
            do_f, dh_f = f(xx)
            return jnp.sum(a * do_f) + jnp.sum(b * dh_f), (do_f, dh_f)

        (v, (do_f, dh_f)), g = jax.jit(
            jax.value_and_grad(scal, has_aux=True))(x)
        return np.asarray(do_f), np.asarray(dh_f), np.asarray(g)

    do_c, dh_c, g_c = run(composed_sums)
    do_f, dh_f, g_f = run(fused_sums)

    # 2. fused (production default mxu2) vs composed at the documented
    # parity rtol (test_chamfer_loss); grad atol 2e-3 absorbs the split
    # select's ~2^-17 rounding accumulated over a vertex's columns
    # (measured 1.2e-3 max abs on this scene vs gradient scale ~3)
    np.testing.assert_allclose(do_f, do_c, rtol=2e-4, err_msg="fused do_f")
    np.testing.assert_allclose(dh_f, dh_c, rtol=2e-4, err_msg="fused dh_f")
    np.testing.assert_allclose(g_f, g_c, rtol=2e-3, atol=2e-3, err_msg="fused grad")

    # 3. region-culled fused vs plain fused — BOTH at sel_impl="mxu" (the
    # HIGHEST oracle): the cull kernel's select is exact f32, while the
    # production default mxu2 rounds at ~2^-17 (checked against composed
    # above at the parity rtol)
    do_f, dh_f, g_f = run(lambda xx: fused_sums(xx, sel_impl="mxu"))
    do_r, dh_r, g_r = run(
        lambda xx: fused_sums(xx, region_cull=True, sel_impl="mxu")
    )
    np.testing.assert_allclose(do_r, do_f, rtol=1e-5, err_msg="region-cull do_f")
    np.testing.assert_allclose(dh_r, dh_f, rtol=1e-6, err_msg="region-cull dh_f")
    np.testing.assert_allclose(g_r, g_f, rtol=1e-4, atol=1e-6, err_msg="region-cull grad")
    return "ok"


def _timeit(fn, n_rep=3):
    """Best-of-n wall time; a scalar value fetch closes each rep (the TPU
    tunnel was observed to return early from block_until_ready with queued
    work — the fetch forces true completion)."""
    times = []
    for i in range(n_rep):
        t0 = time.perf_counter()
        out = fn(i)
        import jax

        leaf = jax.tree.leaves(out)[0]
        leaf.block_until_ready()
        _ = np.asarray(leaf).ravel()[0]
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_PRNG"):
        jax.config.update("jax_default_prng_impl", os.environ["BENCH_PRNG"])
    if os.environ.get("BENCH_PLATFORM"):
        # smoke-testing the bench itself off-TPU: the image's sitecustomize
        # pins jax_platforms="axon,cpu" at interpreter start, so the env var
        # JAX_PLATFORMS alone cannot reach the CPU backend
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    # persistent compile cache: the three big programs (scan chain + two train
    # steps) cost minutes to compile through the TPU tunnel; repeat runs reuse
    cache_dir = os.environ.get("TAMF_COMPILE_CACHE", os.path.expanduser("~/.cache/tamf_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from oakink2_tamf_tpu.core import diffusion as D
    from oakink2_tamf_tpu.data.synthetic import synthetic_batch
    from oakink2_tamf_tpu.models.mdm_g import InteractionSegmentMDM, MDMConfig
    from oakink2_tamf_tpu.parallel.train import g_cond_from_batch

    steps = int(os.environ.get("BENCH_STEPS", "1000"))
    # bs 64 measured best per-chip: 16.5 samples/s at 76% MFU vs 15.8 at 73%
    # for bs 32 (arch_mdm_l, v5e)
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    seq_len = int(os.environ.get("BENCH_SEQLEN", "160"))
    # emulation calibration length; the measured run auto-extends to
    # BENCH_REF_SECS per repetition (the 30-step denominator drifted +-30%
    # with host load across rounds r1-r3: 49.9 / 90.3 / 69.1)
    ref_iters = int(os.environ.get("BENCH_REF_STEPS", "30"))
    ref_secs = float(os.environ.get("BENCH_REF_SECS", "20"))
    ref_reps = int(os.environ.get("BENCH_REF_REPS", "3"))

    # the axon TPU tunnel intermittently stalls or reports UNAVAILABLE for a
    # while (observed: a 25-min silent block, then a raise); retry a few
    # times before giving up so a transient outage doesn't cost the round's
    # bench artifact. BENCH_DEVICE_RETRIES=0 disables the retries.
    retries = int(os.environ.get("BENCH_DEVICE_RETRIES", "3"))
    for attempt in range(retries + 1):
        try:
            devices = jax.devices()
            break
        except RuntimeError as e:
            if attempt >= retries:
                raise
            print(f"# jax.devices() failed ({e}); retry {attempt + 1}/{retries} "
                  "in 120 s", file=sys.stderr)
            time.sleep(120)
    n_dev = len(devices)
    peak = _peak_flops(devices[0])
    extra: dict = {"n_devices": n_dev, "device_kind": getattr(devices[0], "device_kind", "?")}

    # on-device kernel exactness gate (BENCH_SELFCHECK=0 skips): runs FIRST
    # so a Mosaic lowering/value regression fails the bench loudly instead of
    # surfacing as a crashed or silently-wrong train row later
    if devices[0].platform == "tpu" and os.environ.get("BENCH_SELFCHECK", "1") != "0":
        t0 = time.perf_counter()
        try:
            extra["kernel_selfcheck"] = _kernel_selfcheck()
            print(f"# kernel selfcheck: ok ({time.perf_counter() - t0:.0f}s)",
                  file=sys.stderr)
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"
            extra["kernel_selfcheck"] = f"FAILED: {msg[:500]}"
            print(json.dumps({
                "metric": "reverse_diffusion_samples_per_sec_per_chip_arch_mdm_l",
                "value": 0.0, "unit": "samples/s/chip", "vs_baseline": 0.0,
                "extra": extra,
            }), flush=True)
            print(f"# KERNEL SELFCHECK FAILED — aborting bench\n# {msg}",
                  file=sys.stderr)
            sys.exit(1)

    mesh = None
    if n_dev > 1:
        from oakink2_tamf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        batch = max(batch, n_dev) - (max(batch, n_dev) % n_dev)  # divisible
        print(f"# mesh over {n_dev} devices; global batch {batch}", file=sys.stderr)

    def maybe_shard(tree):
        if mesh is None:
            # device-resident ONCE before the timed loop: the rows measure
            # the STEP, not host->device transfer. A real loader overlaps
            # H2D with compute; over the axon tunnel an un-put batch reads
            # as seconds of fake step time (the round-4 GT-cache fields are
            # 168 MB at the canary shape, 671 MB at production — measured
            # +3.0 s on the canary G row before this was fixed).
            import jax.numpy as _jnp

            return jax.tree.map(_jnp.asarray, tree)
        from oakink2_tamf_tpu.parallel.mesh import shard_batch

        return shard_batch(tree, mesh)

    def maybe_rep(tree):
        if mesh is None:
            return tree
        from oakink2_tamf_tpu.parallel.mesh import replicate

        return replicate(tree, mesh)

    import dataclasses as _dc

    # float32 default: XLA already lowers f32 matmuls to bf16 MXU passes on TPU
    # (measured: explicit bf16 activations only add cast overhead — 16.6 vs
    # 17.1 samples/s). The compute_dtype knob stays for memory-bound regimes.
    compute_dtype = os.environ.get("BENCH_DTYPE", "float32")
    model = InteractionSegmentMDM(
        _dc.replace(MDMConfig.arch_mdm_l(), compute_dtype=compute_dtype)
    )
    sched = D.tamf_schedule(steps)
    rng = np.random.default_rng(0)
    b = synthetic_batch(rng, batch_size=batch, seq_len=seq_len, max_nobj=2, n_obj_points=64)
    cond = g_cond_from_batch(b)
    x = b["pose_repr"]
    t0 = jnp.zeros((batch,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t0, cond)
    if compute_dtype == "bfloat16":
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params,
        )

    # --- ours: batched scan chain -----------------------------------------
    def sample_batched(params, cond, key):
        def model_fn(xx, tt):
            return model.apply(params, xx, tt, cond, deterministic=True)

        return D.p_sample_loop(model_fn, sched, (batch, seq_len, 99), key, clip_denoised=False)

    if mesh is None:
        sample_jit = jax.jit(sample_batched)
    else:
        from oakink2_tamf_tpu.parallel.mesh import batch_sharding, replicated

        sample_jit = jax.jit(
            sample_batched,
            in_shardings=(replicated(mesh), batch_sharding(mesh), replicated(mesh)),
            out_shardings=batch_sharding(mesh),
        )
    params_r = maybe_rep(params)
    cond_s = maybe_shard(cond)
    # compile ONCE and reuse the executable (lower().compile() does not
    # populate the jit cache — calling sample_jit after would recompile)
    sample_exe = sample_jit.lower(params_r, cond_s, jax.random.PRNGKey(0)).compile()
    out = sample_exe(params_r, cond_s, jax.random.PRNGKey(0))
    _ = float(np.asarray(out).ravel()[0])  # warmup sync

    elapsed = _timeit(lambda i: sample_exe(params_r, cond_s, jax.random.PRNGKey(i + 1)))
    ours_sps = batch / elapsed / max(n_dev, 1)
    print(f"# sampling: {ours_sps:.2f} samples/s/chip ({elapsed:.3f}s/chain)", file=sys.stderr)

    # --- reference-structure emulation: bs=1, per-step dispatch ------------
    cond1 = jax.tree.map(lambda a: a[:1], cond)

    def one_step(params, cond, xx, t, key):
        def model_fn(z, tt):
            return model.apply(params, z, tt, cond, deterministic=True)

        return D.p_sample(model_fn, sched, xx, t, key, clip_denoised=False)["sample"]

    step_jit = jax.jit(one_step)
    xx = jax.random.normal(jax.random.PRNGKey(0), (1, seq_len, 99))
    xx = step_jit(params, cond1, xx, jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(0))
    _ = float(xx[0, 0, 0])

    # per-step python dispatch, device-chained like the torch loop (async
    # queue, no per-step host sync); ONE final value fetch closes the chain.
    # Stability (round-3 verdict #3): calibrate with `ref_iters` steps, then
    # extend each repetition to >= BENCH_REF_SECS of wall time and take the
    # MINIMUM per-step time of BENCH_REF_REPS repetitions. The emulation is
    # dispatch-bound, so host-CPU interference only ever ADDS time; min-of-N
    # is both the least-noisy estimator of the true per-step cost (the
    # headline numerator already uses best-of-n, _timeit above) and the
    # conservative one for the ratio (fastest reference -> lowest
    # vs_baseline). The round-3 median still moved 2x with a concurrent
    # pytest run; the min across reps with >= one quiet rep does not.
    def _emulate(n_iters):
        t_start = time.perf_counter()
        nonlocal xx
        for i in range(n_iters):
            t = jnp.full((1,), (steps - 1 - i) % steps, jnp.int32)
            xx = step_jit(params, cond1, xx, t, jax.random.PRNGKey(i))
        _ = float(xx[0, 0, 0])
        return (time.perf_counter() - t_start) / n_iters

    cal_step = _emulate(ref_iters)
    long_iters = max(ref_iters, min(20000, int(ref_secs / max(cal_step, 1e-6))))
    rep_times = sorted(_emulate(long_iters) for _ in range(ref_reps))
    ref_step_time = rep_times[0]  # min (see note above)
    ref_sps = 1.0 / (ref_step_time * steps)  # bs=1 sample takes `steps` dispatches
    spread = (rep_times[-1] - rep_times[0]) / ref_step_time
    extra["ref_emulation"] = {
        "iters_per_rep": long_iters, "reps": ref_reps,
        "rep_spread_frac": round(spread, 3),
        "samples_per_sec": round(ref_sps, 4),
    }
    print(
        f"# reference-structure emulation: {ref_sps:.4f} samples/s/chip "
        f"(min of {ref_reps} x {long_iters} steps, spread {spread:.1%})",
        file=sys.stderr,
    )
    if spread > 0.25:
        print(
            f"# WARNING: emulation rep spread {spread:.1%} > 25% — host-CPU "
            f"interference likely; vs_baseline uses the min rep but rerun on "
            f"an idle host to confirm.",
            file=sys.stderr,
        )

    # absolute-throughput regression gate vs the previous round's artifact:
    # vs_baseline is a RATIO and inherits emulation noise; the absolute
    # samples/s is the stable figure, so a drop there is flagged explicitly.
    prev = _prev_round_value()
    if prev is not None:
        extra["value_prev_round"] = prev

    if prev is not None:
        extra["regression_vs_prev"] = bool(ours_sps < 0.9 * prev)

    def emit():
        print(
            json.dumps(
                {
                    "metric": "reverse_diffusion_samples_per_sec_per_chip_arch_mdm_l",
                    "value": round(ours_sps, 4),
                    "unit": "samples/s/chip",
                    "vs_baseline": round(ours_sps / ref_sps, 2),
                    "extra": extra,
                }
            ),
            flush=True,
        )

    # PROGRESSIVE emission: every compile through the TPU tunnel costs minutes
    # and the tunnel backend does not persist compiled programs, so the
    # headline goes out NOW and each later section re-emits with richer
    # extras — a harness timeout keeps the best line produced so far (the
    # last JSON line wins).
    emit()

    # sampling MFU: XLA cost analysis counts a scan body ONCE (trip counts
    # are not multiplied) — flops come from one compiled denoiser forward
    # x steps (Lowered.cost_analysis returns None on this jax)
    fwd_jit = jax.jit(
        lambda p, c, xx, tt: model.apply(p, xx, tt, c, deterministic=True)
    )
    fwd_flops = _flops_of(
        fwd_jit.lower(
            params_r, cond_s,
            jax.ShapeDtypeStruct((batch, seq_len, 99), jnp.float32),
            jax.ShapeDtypeStruct((batch,), jnp.int32),
        ).compile()
    )
    sample_flops = fwd_flops * steps if fwd_flops else None
    if sample_flops:
        extra["sampling_tflops_per_chip"] = round(sample_flops / elapsed / n_dev / 1e12, 2)
        if peak:
            extra["sampling_mfu"] = round(sample_flops / elapsed / (peak * n_dev), 4)
        print(
            f"# sampling flops: {extra['sampling_tflops_per_chip']} TF/s/chip"
            + (f", MFU {extra['sampling_mfu']:.1%}" if "sampling_mfu" in extra else ""),
            file=sys.stderr,
        )
        emit()

    # --- train-step benchmarks ---------------------------------------------
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        try:
            _bench_train(extra, mesh, n_dev, peak, maybe_shard, maybe_rep, emit)
        except Exception as e:  # train bench is auxiliary; never sink the headline
            print(f"# train bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    # --- single-sequence latency (the serving case the reference actually
    # runs: bs=1, launch/sample.py). Sequential scan is THE default sampler;
    # the Picard-parallel chain was measured a 0.26x LOSS at this model size
    # (BENCH_r03.json; docs/DESIGN.md "parallel sampler") and is correctly
    # default-off in serving — re-measure it only under BENCH_PARALLEL=1 so
    # the driver artifact stops carrying a known-negative row as if it were
    # a live regression. Emitted last: auxiliary, never the headline.
    if os.environ.get("BENCH_LATENCY", "1") != "0" and n_dev == 1:
        try:
            def sample_seq1(params, cond, key):
                def model_fn(xx, tt):
                    return model.apply(params, xx, tt, cond, deterministic=True)
                return D.p_sample_loop(
                    model_fn, sched, (1, seq_len, 99), key, clip_denoised=False)

            seq_exe = jax.jit(sample_seq1).lower(
                params, cond1, jax.random.PRNGKey(0)).compile()
            _ = np.asarray(seq_exe(params, cond1, jax.random.PRNGKey(0)))
            seq_dt = _timeit(lambda i: seq_exe(params, cond1, jax.random.PRNGKey(i)))
            extra["latency_bs1_seq_s"] = round(seq_dt, 3)
            extra["parallel_sampler_viable"] = False  # measured 0.26x in r3
            print(f"# bs=1 latency: sequential {seq_dt:.3f}s", file=sys.stderr)

            if os.environ.get("BENCH_PARALLEL", "0") == "1":
                window = int(os.environ.get("BENCH_LATENCY_WINDOW", "64"))
                tol = float(os.environ.get("BENCH_LATENCY_TOL", "0.01"))

                def sample_par1(params, cond, key):
                    def model_fn(xx, tt):
                        return model.apply(params, xx, tt, cond, deterministic=True)
                    return D.p_sample_loop_parallel(
                        model_fn, sched, (1, seq_len, 99), key,
                        clip_denoised=False, window=window, tol=tol,
                        return_info=True)

                par_exe = jax.jit(sample_par1).lower(
                    params, cond1, jax.random.PRNGKey(0)).compile()
                out1, info1 = par_exe(params, cond1, jax.random.PRNGKey(0))
                _ = np.asarray(out1)
                sweeps = int(np.asarray(info1["n_sweeps"]))

                def _par_run(i):
                    o, _ = par_exe(params, cond1, jax.random.PRNGKey(i))
                    return o

                par_dt = _timeit(_par_run)
                extra["latency_bs1_parallel_s"] = round(par_dt, 3)
                extra["latency_parallel"] = {
                    "window": window, "tol": tol, "n_sweeps": sweeps,
                    "speedup": round(seq_dt / par_dt, 2),
                }
                extra["parallel_sampler_viable"] = bool(par_dt < seq_dt)
                print(
                    f"# bs=1 latency: parallel {par_dt:.3f}s "
                    f"({seq_dt / par_dt:.2f}x, {sweeps} sweeps of W={window})",
                    file=sys.stderr,
                )
            emit()
        except Exception as e:
            print(f"# latency bench failed: {type(e).__name__}: {e}", file=sys.stderr)


def _bench_train(extra, mesh, n_dev, peak, maybe_shard, maybe_rep, emit):
    """Train-step rows: one optimizer step for G (geometric losses) and R
    (cached-target path), each emitted WITH its shapes (a bare samples/s was
    read as a production number in round 2 when it was the light canary).
    Two rows by default: the light regression canary and the PRODUCTION row
    (bs 64, 2 x 8192 pts — the reference's real cloud size); the production
    G row also gets a step-time BUDGET (trunk+optimizer / MANO / chamfer /
    other) — MFU is the wrong lens for an output-rate-bound NN kernel."""
    import jax
    import jax.numpy as jnp

    from oakink2_tamf_tpu.core import mano as M
    from oakink2_tamf_tpu.data.synthetic import synthetic_batch, with_perturbed_sample
    from oakink2_tamf_tpu.core import diffusion as D
    from oakink2_tamf_tpu.models import losses as LL
    from oakink2_tamf_tpu.models.mdm_g import InteractionSegmentMDM, MDMConfig
    from oakink2_tamf_tpu.models.refine_r import (
        RefineConfig, SegmentRefineNet, stack_mano_models, target_geometry,
    )
    from oakink2_tamf_tpu.parallel import train as PT

    L = int(os.environ.get("BENCH_SEQLEN", "160"))
    nobj = 2
    chunk = int(os.environ.get("BENCH_CHUNK", "2048"))
    mano_stack = stack_mano_models(M.synthetic_mano_model("right"), M.synthetic_mano_model("left"))
    assets = LL.load_contact_assets()
    g_model = InteractionSegmentMDM(MDMConfig.arch_mdm_l())
    sched = D.tamf_schedule(1000)

    def measure(name, step_exe, state, sbatch, bs, P, batch, n_rep=3):
        state, _ = step_exe(state, sbatch, jax.random.PRNGKey(0))  # warm
        jax.tree.leaves(state.params)[0].block_until_ready()
        times = []
        for i in range(n_rep):
            t0 = time.perf_counter()
            state, metrics = step_exe(state, sbatch, jax.random.PRNGKey(i + 1))
            _ = float(np.asarray(metrics["loss"]))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        sps = bs / dt / max(n_dev, 1)
        extra[f"{name}_samples_per_sec_per_chip"] = round(sps, 2)
        extra[f"{name}_step_ms"] = round(dt * 1e3, 1)
        # valid fractions: the frame-skip kernels make step time a direct
        # function of the batch's mask statistics (round-4 verdict: without
        # these the headline step times aren't interpretable across rounds).
        # data/synthetic.py draws lengths uniform[16, L] and nobj uniform
        # {1..max_nobj} under a fixed seed; real-data statistics differ.
        fm = np.asarray(batch["mask"]) > 0  # [bs, L]
        om = np.asarray(batch["obj_mask"]).astype(bool)  # [bs, nobj]
        extra[f"{name}_shape"] = {
            "batch": bs, "seq_len": L, "nobj": nobj,
            "n_obj_points": P, "chunk": chunk,
            "valid_frac_frames": round(float(fm.mean()), 3),
            "valid_frac_slots": round(float(om.mean()), 3),
            "valid_frac_frame_objects": round(
                float((fm[:, None, :] & om[:, :, None]).mean()), 3
            ),
        }
        print(f"# {name} (bs{bs} {nobj}x{P}): {dt*1e3:.0f} ms/step, "
              f"{sps:.2f} samples/s/chip", file=sys.stderr)
        return state, dt

    # production default (config/production.yml): the GT-side signed chamfer
    # comes precomputed per segment (data/target_cache.GTGeomCache), so the
    # timed step carries gt_o2h/gt_h2o in the batch. BENCH_GT_CACHE=0
    # measures the uncached (in-step GT pass) variant instead.
    gt_cache = os.environ.get("BENCH_GT_CACHE", "1") != "0"

    def run_rows(tag, bs, P):
        if n_dev > 1:
            bs = max(bs, n_dev) - (max(bs, n_dev) % n_dev)
        rng = np.random.default_rng(1)
        batch = synthetic_batch(rng, batch_size=bs, seq_len=L, max_nobj=nobj, n_obj_points=P)
        if gt_cache:
            gg_fn = jax.jit(
                lambda b: LL.extra_loss_gt_geometry(mano_stack, b, chunk=chunk)
            )
            gg = gg_fn({k: jnp.asarray(batch[k]) for k in (
                "pose_repr", "shape", "hand_side", "obj_traj", "obj_points", "mask")})
            batch = dict(
                batch,
                gt_o2h=np.asarray(gg["o2h_g"], np.float32),
                gt_h2o=np.asarray(gg["h2o_g"], np.float32),
            )
            del gg, gg_fn

        # G train step: arch_mdm_l + extra geometric losses
        cond = PT.g_cond_from_batch(batch)
        params = g_model.init(
            jax.random.PRNGKey(0), batch["pose_repr"], np.zeros((bs,), np.int32), cond
        )
        opt = PT.make_optimizer()
        state = maybe_rep(PT.init_train_state(params, opt))
        step_g = PT.make_g_train_step(
            g_model, sched, opt, mano_stack, assets, LL.ExtraLossConfig(), chunk=chunk, mesh=mesh
        )
        sbatch = maybe_shard(batch)
        exe_g = step_g.lower(state, sbatch, jax.random.PRNGKey(0)).compile()
        state, g_dt = measure(f"train_g{tag}", exe_g, state, sbatch, bs, P, batch)
        extra[f"train_g{tag}_shape"]["gt_cache"] = gt_cache
        emit()
        del state, step_g, exe_g

        # R train step: arch_mdm + cached target h2o (production default);
        # the G-only gt_* fields are dropped (R never reads them — shipping
        # them would add a multi-hundred-MB dead H2D copy to the timing)
        batch = {k: v for k, v in batch.items() if not k.startswith("gt_")}
        rbatch = with_perturbed_sample(batch, rng)
        tgt_fn = jax.jit(lambda bb: target_geometry(mano_stack, bb, chunk=chunk)["target_h2o_dist"])
        rbatch = dict(rbatch, target_h2o=np.asarray(tgt_fn(rbatch)))
        net = SegmentRefineNet(RefineConfig())
        cond_r = {k: rbatch[k] for k in ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
        params = net.init(
            jax.random.PRNGKey(0), rbatch["sample_pose_repr"],
            jnp.zeros(rbatch["sample_pose_repr"].shape[:2] + (778,)), cond_r,
        )
        opt = PT.make_optimizer()
        state = maybe_rep(PT.init_train_state(params, opt))
        step_r = PT.make_r_train_step(net, opt, mano_stack, assets, LL.RefineLossConfig(), chunk=chunk, mesh=mesh)
        sbatch_r = maybe_shard(rbatch)
        exe_r = step_r.lower(state, sbatch_r, jax.random.PRNGKey(0)).compile()
        _, r_dt = measure(f"train_r{tag}", exe_r, state, sbatch_r, bs, P, rbatch)
        emit()
        if tag == "_prod" and os.environ.get("BENCH_BUDGET", "1") != "0":
            del state, step_r, exe_r
            _bench_r_budget(
                extra, emit, mesh, n_dev, net, mano_stack, rbatch, chunk, r_dt
            )
        return batch, cond, g_dt

    # light regression canary (round-2 comparable) ---------------------------
    bs0 = int(os.environ.get("BENCH_TRAIN_BATCH", "32"))
    P0 = int(os.environ.get("BENCH_OBJ_POINTS", "4096"))
    run_rows("", bs0, P0)

    # production row: the reference's true shapes ----------------------------
    if os.environ.get("BENCH_PROD", "1") != "0":
        bs1 = int(os.environ.get("BENCH_PROD_BATCH", "64"))
        P1 = int(os.environ.get("BENCH_PROD_OBJ_POINTS", "8192"))
        batch, cond, g_dt = run_rows("_prod", bs1, P1)
        if os.environ.get("BENCH_BUDGET", "1") != "0":
            _bench_g_budget(
                extra, emit, mesh, n_dev, maybe_shard, maybe_rep,
                g_model, sched, mano_stack, batch, cond, chunk, g_dt,
                gt_cache=gt_cache,
            )


def _bench_g_budget(extra, emit, mesh, n_dev, maybe_shard, maybe_rep,
                    g_model, sched, mano_stack, batch, cond, chunk, g_step_dt,
                    gt_cache=True):
    """Step-time budget for the production G step: trunk+optimizer (G step
    with the extra losses off), MANO fwd+bwd (pred grad + GT fwd, the step's
    actual MANO content), chamfer (the pred fused loss kernel, plus the GT
    signed fwd when the GT-geometry cache is off), and the residual
    (vert/joint/edge losses, bwd glue, dispatch)."""
    import jax
    import jax.numpy as jnp

    from oakink2_tamf_tpu.models import losses as LL
    from oakink2_tamf_tpu.models.refine_r import batch_recover_mano
    from oakink2_tamf_tpu.parallel import train as PT
    from oakink2_tamf_tpu.core import transforms as T

    bs = batch["pose_repr"].shape[0]
    sbatch = maybe_shard(batch)

    def timeit(exe, *args):
        out = exe(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = exe(*args)
            leaf = jax.tree.leaves(out)[0]
            leaf.block_until_ready()
            _ = np.asarray(leaf).ravel()[0]
            times.append(time.perf_counter() - t0)
        return min(times)

    # trunk + optimizer: the same step WITHOUT mano/assets/extra_cfg
    params = g_model.init(
        jax.random.PRNGKey(0), batch["pose_repr"], np.zeros((bs,), np.int32), cond
    )
    opt = PT.make_optimizer()
    state = maybe_rep(PT.init_train_state(params, opt))
    step = PT.make_g_train_step(g_model, sched, opt, mesh=mesh)
    exe = step.lower(state, sbatch, jax.random.PRNGKey(0)).compile()
    holder = {"state": state}  # state is donated: rebind per call

    def trunk_call():
        s, m = exe(holder["state"], sbatch, jax.random.PRNGKey(1))
        holder["state"] = s
        return m["loss"]

    trunk_dt = timeit(trunk_call)
    del exe, step, state, holder

    # MANO: pred fwd+bwd (grad wrt pose_repr) + GT fwd — the step's content.
    # Every operand is an explicit jit argument: closed-over arrays embed as
    # HLO literals and blow the tunnel's remote_compile body limit (HTTP 413).
    def mano_probe(pose, shape, hand_side):
        g = jax.grad(
            lambda p: sum(jnp.sum(t) for t in batch_recover_mano(
                mano_stack, p, shape, hand_side))
        )(pose)
        gt = batch_recover_mano(mano_stack, pose, shape, hand_side)
        return jnp.sum(g) + sum(jnp.sum(t) for t in gt)

    mano_args = (
        jnp.asarray(batch["pose_repr"]), jnp.asarray(batch["shape"]),
        jnp.asarray(batch["hand_side"]),
    )
    exe = jax.jit(mano_probe).lower(*mano_args).compile()
    mano_dt = timeit(lambda: exe(*mano_args))
    del exe

    # chamfer: the step's actual dist content — GT signed fwd (the composed
    # kernel; absent entirely under the GT-geometry cache) + the PRED side
    # via the fused loss kernel (fwd + grad in one pass, models/losses.
    # _dist_sums_fused — the dist_impl="auto" route on TPU)
    verts, _, normals = batch_recover_mano(
        mano_stack, jnp.asarray(batch["pose_repr"]), batch["shape"], batch["hand_side"]
    )
    transf = T.tslrot6d_to_transf(jnp.asarray(batch["obj_traj"]))
    obj_points = jnp.asarray(batch["obj_points"])
    from oakink2_tamf_tpu.models.losses import load_contact_assets

    vw2 = jnp.asarray(load_contact_assets().v_weights2)

    def gt_probe(v, n, tf, pts):
        o2h_g, h2o_g = LL._per_object_signed(v, n, tf, pts, chunk)
        return jnp.sum(o2h_g) + jnp.sum(h2o_g)

    exe = jax.jit(gt_probe).lower(verts, normals, transf, obj_points).compile()
    gt_chamfer_dt = timeit(lambda: exe(verts, normals, transf, obj_points))
    del exe

    o2h_g, h2o_g = jax.jit(
        lambda v, n, tf, pts: LL._per_object_signed(v, n, tf, pts, chunk)
    )(verts, normals, transf, obj_points)

    # explicit args only (see mano_probe note): o2h_g alone is 671 MB at the
    # production shape — closing over it 413s the tunnel compile.
    # The batch's seq/obj masks ride along: the real step frame-skips
    # mask-padded frames and padded object slots (x_valid in the fused
    # kernel), so a maskless probe overstates the chamfer pass by ~2.5x and
    # made round 4's budget incoherent (other_ms: -1626).
    def pred_probe(v, n, tf, pts, og, hg, vw, fm, om):
        def f(vv):
            do_f, dh_f = LL._dist_sums_fused(
                vv, n, tf, pts, og, hg, vw, chunk, seq_mask=fm, obj_mask=om
            )
            return jnp.sum(do_f) + jnp.sum(dh_f)
        return jnp.sum(jax.grad(f)(v))

    seq_mask = jnp.asarray(batch["mask"])
    obj_mask = jnp.asarray(batch["obj_mask"])
    pred_args = (verts, normals, transf, obj_points, o2h_g, h2o_g, vw2,
                 seq_mask, obj_mask)
    exe = jax.jit(pred_probe).lower(*pred_args).compile()
    pred_chamfer_dt = timeit(lambda: exe(*pred_args))
    del exe
    # the all-valid (maskless) variant: NOT a step component — kept for
    # cross-round comparability with the pre-frame-skip kernels
    # (BENCH_BUDGET_ALLVALID=0 skips its extra compile)
    allvalid_dt = None
    if os.environ.get("BENCH_BUDGET_ALLVALID", "1") != "0":
        def pred_probe_av(v, n, tf, pts, og, hg, vw):
            def f(vv):
                do_f, dh_f = LL._dist_sums_fused(
                    vv, n, tf, pts, og, hg, vw, chunk
                )
                return jnp.sum(do_f) + jnp.sum(dh_f)
            return jnp.sum(jax.grad(f)(v))

        av_args = (verts, normals, transf, obj_points, o2h_g, h2o_g, vw2)
        exe = jax.jit(pred_probe_av).lower(*av_args).compile()
        allvalid_dt = timeit(lambda: exe(*av_args))
        del exe
    # with the GT-geometry cache (production default) the step never runs
    # the GT fwd — only the pred fused pass counts against the step time
    chamfer_dt = pred_chamfer_dt + (0.0 if gt_cache else gt_chamfer_dt)

    budget = {
        "step_ms": round(g_step_dt * 1e3, 1),
        "trunk_opt_ms": round(trunk_dt * 1e3, 1),
        "mano_ms": round(mano_dt * 1e3, 1),
        "chamfer_ms": round(chamfer_dt * 1e3, 1),
        "chamfer_gt_fwd_ms": round(gt_chamfer_dt * 1e3, 1),
        "chamfer_pred_fused_ms": round(pred_chamfer_dt * 1e3, 1),
        "other_ms": round((g_step_dt - trunk_dt - mano_dt - chamfer_dt) * 1e3, 1),
    }
    if allvalid_dt is not None:
        budget["chamfer_pred_fused_allvalid_ms"] = round(allvalid_dt * 1e3, 1)
    extra["train_g_prod_budget"] = budget
    print(f"# train_g_prod budget: {budget}", file=sys.stderr)
    emit()


def _bench_r_budget(extra, emit, mesh, n_dev, net, mano_stack, rbatch,
                    chunk, r_step_dt):
    """Step-time budget for the production R step, mirroring the G budget:
    sample-branch geometry (MANO recovery + stop-gradient h2o of the input
    sample — parallel/train.make_r_train_step:301), refined-branch geometry
    fwd+bwd (MANO + the differentiated h2o cull pass, probed as a grad of
    the geometry alone), the transformer net fwd+bwd, and the residual
    (loss glue, optimizer, dispatch). The target branch is CACHED in the
    timed batch (target_h2o rides in) so it contributes nothing — the
    uncached target pass is the tgt_fn build cost reported by the caller.
    Components OVERLAP slightly (the net probe's dropout rng differs, the
    geometry probe repeats the MANO fwd the step shares), so other_ms is an
    approximation — same caveat as the G budget."""
    import jax
    import jax.numpy as jnp

    from oakink2_tamf_tpu.models.refine_r import (
        batch_recover_mano, multi_object_h2o_dist, sample_geometry,
    )
    from oakink2_tamf_tpu.core import mano as M

    def timeit(exe, *args):
        out = exe(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = exe(*args)
            leaf = jax.tree.leaves(out)[0]
            leaf.block_until_ready()
            _ = np.asarray(leaf).ravel()[0]
            times.append(time.perf_counter() - t0)
        return min(times)

    jb = {k: jnp.asarray(v) for k, v in rbatch.items()
          if k in ("sample_pose_repr", "shape", "hand_side", "obj_traj",
                   "obj_points", "obj_mask", "mask")}

    # sample branch: MANO recover + h2o (fwd only, stop-gradient in the
    # step) — WITH the step's frame_mask (padded-frame dedup); a maskless
    # probe re-created the round-4 incoherent-budget bug for R
    def sample_probe(pose, shape, hs, traj, pts, om, fm):
        sg = sample_geometry(
            mano_stack,
            {"sample_pose_repr": pose, "shape": shape, "hand_side": hs,
             "obj_traj": traj, "obj_points": pts, "obj_mask": om},
            chunk=chunk, frame_mask=fm,
        )
        return sum(jnp.sum(v) for v in sg.values())

    s_args = (jb["sample_pose_repr"], jb["shape"], jb["hand_side"],
              jb["obj_traj"], jb["obj_points"], jb["obj_mask"], jb["mask"])
    exe = jax.jit(sample_probe).lower(*s_args).compile()
    sample_dt = timeit(exe, *s_args)
    del exe

    # refined branch geometry fwd+bwd: grad through MANO + the h2o cull pass
    x_perm = M.hand_template_perm(mano_stack)

    def refine_geom_probe(pose, shape, hs, traj, pts, om, fm):
        def f(p):
            verts, joints, normals = batch_recover_mano(mano_stack, p, shape, hs)
            h2o = multi_object_h2o_dist(
                verts, normals, traj, pts, om, chunk=chunk, x_perm=x_perm,
                frame_mask=fm,
            )
            return jnp.sum(h2o) + jnp.sum(verts) + jnp.sum(joints)
        return jnp.sum(jax.grad(f)(pose))

    rg_args = s_args  # (..., jb["mask"]) — same trailing frame mask
    exe = jax.jit(refine_geom_probe).lower(*rg_args).compile()
    refine_geom_dt = timeit(exe, *rg_args)
    del exe

    # net fwd+bwd alone (transformer trunk + heads)
    cond_r = {k: jnp.asarray(rbatch[k]) for k in
              ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
    h2o_in = jnp.zeros(rbatch["sample_pose_repr"].shape[:2] + (778,))
    params = net.init(
        jax.random.PRNGKey(0), jb["sample_pose_repr"], h2o_in, cond_r
    )

    def net_probe(p, pose, h2o, cond):
        def f(pp):
            return jnp.sum(net.apply(pp, pose, h2o, cond))
        return jax.tree.leaves(jax.grad(f)(p))[0]

    n_args = (params, jb["sample_pose_repr"], h2o_in, cond_r)
    exe = jax.jit(net_probe).lower(*n_args).compile()
    net_dt = timeit(exe, *n_args)
    del exe

    budget = {
        "step_ms": round(r_step_dt * 1e3, 1),
        "sample_geom_ms": round(sample_dt * 1e3, 1),
        "refine_geom_ms": round(refine_geom_dt * 1e3, 1),
        "net_ms": round(net_dt * 1e3, 1),
        "target_geom_ms": 0.0,  # cached target_h2o in the timed batch
        "other_ms": round(
            (r_step_dt - sample_dt - refine_geom_dt - net_dt) * 1e3, 1
        ),
    }
    extra["train_r_prod_budget"] = budget
    print(f"# train_r_prod budget: {budget}", file=sys.stderr)
    emit()


if __name__ == "__main__":
    main()
