"""Benchmark: reverse-diffusion samples/sec/chip on MF-MDM G arch_mdm_l.

Measures the headline configuration (BASELINE.json): full 1000-step DDPM
reverse chain, arch_mdm_l (latent 512, ff 2048, 8 layers), seq_len 160,
conditioning identical in structure to production.

- "ours": batched on-device lax.scan chain (the framework's sampling path).
- "reference-structure emulation": batch-size 1 with one dispatched device
  step per denoise iteration from a python loop — the reference's sampling
  shape (launch/sample.py:202-229: bs=1, 1000 sequential steps) measured on
  the SAME chip, so vs_baseline isolates the architectural win (batching +
  scan fusion) from hardware differences.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # optional PRNG implementation override (threefry default; 'rbg' is a
    # faster counter-based generator — set via config because this image's
    # sitecustomize imports jax before env vars can apply)
    if os.environ.get("BENCH_PRNG"):
        jax.config.update("jax_default_prng_impl", os.environ["BENCH_PRNG"])

    from oakink2_tamf_tpu.core import diffusion as D
    from oakink2_tamf_tpu.data.synthetic import synthetic_batch
    from oakink2_tamf_tpu.models.mdm_g import InteractionSegmentMDM, MDMConfig
    from oakink2_tamf_tpu.parallel.train import g_cond_from_batch

    steps = int(os.environ.get("BENCH_STEPS", "1000"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    seq_len = int(os.environ.get("BENCH_SEQLEN", "160"))
    ref_iters = int(os.environ.get("BENCH_REF_STEPS", "50"))  # emulation sample count

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
        # pre-cast weights once so the scan body doesn't re-cast per step
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params,
        )

    # --- ours: batched scan chain -----------------------------------------
    def sample_batched(params, cond, key):
        def model_fn(xx, tt):
            return model.apply(params, xx, tt, cond, deterministic=True)

        return D.p_sample_loop(model_fn, sched, (batch, seq_len, 99), key, clip_denoised=False)

    sample_jit = jax.jit(sample_batched)
    out = sample_jit(params, cond, jax.random.PRNGKey(0))
    _ = float(out[0, 0, 0])  # compile + warmup (value fetch = hard sync)

    # per-rep timing with a scalar value fetch: block_until_ready through the
    # TPU tunnel was observed to return early with queued work, so each rep is
    # dispatch -> block -> fetch (the fetch forces true completion)
    n_rep = 3
    times = []
    for i in range(n_rep):
        t0 = time.perf_counter()
        out = sample_jit(params, cond, jax.random.PRNGKey(i + 1))
        out.block_until_ready()
        _ = float(out[0, 0, 0])
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    ours_sps = batch / elapsed

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
    # queue, no per-step host sync); ONE final value fetch closes the chain
    t_start = time.perf_counter()
    for i in range(ref_iters):
        t = jnp.full((1,), (steps - 1 - i) % steps, jnp.int32)
        xx = step_jit(params, cond1, xx, t, jax.random.PRNGKey(i))
    _ = float(xx[0, 0, 0])
    ref_step_time = (time.perf_counter() - t_start) / ref_iters
    ref_sps = 1.0 / (ref_step_time * steps)  # bs=1 sample takes `steps` dispatches

    print(
        json.dumps(
            {
                "metric": "reverse_diffusion_samples_per_sec_per_chip_arch_mdm_l",
                "value": round(ours_sps, 4),
                "unit": "samples/s/chip",
                "vs_baseline": round(ours_sps / ref_sps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
