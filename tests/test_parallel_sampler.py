"""Picard-parallel sampler (p_sample_loop_parallel) vs the sequential chain.

The parallel sampler pins per-step noises z_t = normal(fold_in(key, t)), so
the exact sequential chain with the same noises is reproducible in-test; the
sampler must match it bit-tightly at tol=0 (degenerate slide-by-1) and within
the imperceptibility bound at practical tolerances, in fewer sweeps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oakink2_tamf_tpu.core import diffusion as D

SHAPE = (2, 8, 6)


def model_fn(x, t_model):
    """Deterministic stand-in x0 predictor (bounded, t-dependent)."""
    return jnp.tanh(0.9 * x + 0.1 * jnp.sin(t_model.astype(jnp.float32))[:, None, None])


def sequential_chain(sched, key):
    """The ancestral chain with the parallel sampler's pinned noises."""
    T = sched.num_timesteps
    key, k_init = jax.random.split(key)
    img = jax.random.normal(k_init, SHAPE, jnp.float32)
    for t in reversed(range(T)):
        tt = jnp.full((SHAPE[0],), t, jnp.int32)
        out = D.p_mean_variance(model_fn, sched, img, tt)
        z = jax.random.normal(jax.random.fold_in(key, t), SHAPE, jnp.float32)
        nz = 1.0 if t > 0 else 0.0
        img = out["mean"] + nz * jnp.exp(0.5 * out["log_variance"]) * z
    return img


@pytest.fixture(scope="module")
def sched():
    return D.tamf_schedule(50, "cosine")


def test_tol_zero_matches_sequential(sched):
    key = jax.random.PRNGKey(0)
    ref = sequential_chain(sched, key)
    out, info = D.p_sample_loop_parallel(
        model_fn, sched, SHAPE, key, window=8, tol=0.0, return_info=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # tol=0 slides exactly 1/sweep (posterior_variance thresholds are > 0
    # for t >= 1, but drift is never exactly 0 until the fixed point)
    assert int(info["n_sweeps"]) == sched.num_timesteps


def test_practical_tol_fewer_sweeps_close_output(sched):
    key = jax.random.PRNGKey(1)
    ref = sequential_chain(sched, key)
    out, info = D.p_sample_loop_parallel(
        model_fn, sched, SHAPE, key, window=16, tol=1e-2, return_info=True
    )
    T = sched.num_timesteps
    assert int(info["n_sweeps"]) < T, "no parallel speedup at practical tol"
    # drift-bounded: each slide admits error <= tol * sigma_t per step
    err = float(jnp.abs(out - ref).max())
    assert err < 0.05, f"parallel sample drifted {err} from the chain"


def test_respaced_schedule(sched):
    key = jax.random.PRNGKey(2)
    sp = D.tamf_schedule(50, "cosine", timestep_respacing="10")
    ref = sequential_chain(sp, key)
    out = D.p_sample_loop_parallel(model_fn, sp, SHAPE, key, window=4, tol=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_jit_and_window_clamp(sched):
    """window > T clamps; the whole sampler jits (while_loop, static shapes)."""
    key = jax.random.PRNGKey(3)
    sp = D.tamf_schedule(50, "cosine", timestep_respacing="5")
    f = jax.jit(
        lambda k: D.p_sample_loop_parallel(model_fn, sp, SHAPE, k, window=64, tol=0.0)
    )
    out = f(key)
    ref = sequential_chain(sp, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
