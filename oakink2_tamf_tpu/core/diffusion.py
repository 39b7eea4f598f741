"""Gaussian diffusion engine as pure JAX functions over a precomputed schedule.

Functional re-design of the reference's guided-diffusion port
(model/diffusion/gaussian_diffusion.py, respace.py, diffusion_util.py):

- All schedule arrays are precomputed in float64 numpy (parity with gd.py:130-157)
  and stored as a `DiffusionSchedule` pytree of float32 device arrays.
- `q_sample` / `q_posterior_mean_variance` / `p_mean_variance` are pure functions
  indexed by a per-sample integer timestep vector.
- **The reverse chains run fully on-device as `lax.scan`** (`p_sample_loop`,
  `ddim_sample_loop`, `plms_sample_loop`) with threaded PRNG keys — replacing
  the reference's 1000-iteration python loop at batch size 1
  (launch/sample.py:202-229), the single biggest TPU win.
- Timestep respacing (respace.py space_timesteps/SpacedDiffusion) becomes a
  beta-remap preprocessing step producing a shorter schedule + `timestep_map`.
- The TaMF configuration (diffusion_util.py:5-31): 1000 steps, cosine betas,
  START_X prediction, FIXED_SMALL variance, masked-MSE loss, no respacing.

Data layout: x is [bs, seqlen, C] (time-major features last, TPU/lane friendly)
— NOT the reference's [bs, C, 1, seqlen]; adapters live at the model boundary.
"""

from __future__ import annotations

import enum
import math
from typing import Callable, NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp


class ModelMeanType(enum.Enum):
    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class ModelVarType(enum.Enum):
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED = "learned"
    LEARNED_RANGE = "learned_range"


class LossType(enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"


# ---------------------------------------------------------------------------
# Beta schedules (float64 numpy; parity with gd.py:20-62)
# ---------------------------------------------------------------------------


def get_named_beta_schedule(
    schedule_name: str, num_diffusion_timesteps: int, scale_betas: float = 1.0
) -> np.ndarray:
    if schedule_name == "linear":
        scale = scale_betas * 1000 / num_diffusion_timesteps
        return np.linspace(
            scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64
        )
    elif schedule_name == "cosine":
        return betas_for_alpha_bar(
            num_diffusion_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def betas_for_alpha_bar(num_diffusion_timesteps, alpha_bar, max_beta=0.999) -> np.ndarray:
    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas)


# ---------------------------------------------------------------------------
# Timestep respacing (parity with respace.py:8-58)
# ---------------------------------------------------------------------------


def space_timesteps(num_timesteps: int, section_counts) -> set[int]:
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim") :])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired_count} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        if section_count <= 1:
            frac_stride = 1
        else:
            frac_stride = (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken_steps = []
        for _ in range(section_count):
            taken_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken_steps
        start_idx += size
    return set(all_steps)


# ---------------------------------------------------------------------------
# Schedule pytree
# ---------------------------------------------------------------------------


class DiffusionSchedule(NamedTuple):
    """Precomputed per-timestep arrays (all [T] float32) + respacing metadata."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    alphas_cumprod_next: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    timestep_map: jax.Array  # [T] original-timestep index fed to the model
    rescale_factor: jax.Array  # scalar: 1000/original_T if rescale else 1.0

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    betas: np.ndarray,
    *,
    use_timesteps: Sequence[int] | set[int] | None = None,
    rescale_timesteps: bool = False,
) -> DiffusionSchedule:
    """Build the schedule; if `use_timesteps` is given, first remap betas onto
    that subset (SpacedDiffusion semantics, respace.py:60-105)."""
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    original_T = len(betas)

    if use_timesteps is not None:
        use = sorted(set(int(t) for t in use_timesteps))
        alphas_cumprod_full = np.cumprod(1.0 - betas)
        last_alpha_cumprod = 1.0
        new_betas = []
        for i, a in enumerate(alphas_cumprod_full):
            if i in set(use):
                new_betas.append(1 - a / last_alpha_cumprod)
                last_alpha_cumprod = a
        betas = np.array(new_betas, dtype=np.float64)
        timestep_map = np.array(use, dtype=np.int32)
    else:
        timestep_map = np.arange(original_T, dtype=np.int32)

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )
    # host numpy leaves: the schedule is a compile-time constant of every
    # jitted chain; device leaves would D2H-fetch at lowering (slow on tunnels)
    f32 = lambda a: np.asarray(a, np.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        alphas_cumprod_next=f32(alphas_cumprod_next),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        timestep_map=np.asarray(timestep_map),
        rescale_factor=np.asarray(
            1000.0 / original_T if rescale_timesteps else 1.0, np.float32
        ),
    )


def tamf_schedule(steps: int = 1000, noise_schedule: str = "cosine", timestep_respacing: str = "") -> DiffusionSchedule:
    """The factory every TaMF entry point uses (diffusion_util.py:5-31):
    cosine betas, START_X, FIXED_SMALL, MSE; optional respacing string."""
    betas = get_named_beta_schedule(noise_schedule, steps, scale_betas=1.0)
    use = space_timesteps(steps, timestep_respacing) if timestep_respacing else None
    return make_schedule(betas, use_timesteps=use, rescale_timesteps=False)


def _extract(arr: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """arr[t] broadcast to an x of rank `ndim` (gd.py:1265 _extract_into_tensor)."""
    out = jnp.take(arr, t)
    return out.reshape(out.shape + (1,) * (ndim - 1))


def model_timesteps(sched: DiffusionSchedule, t: jax.Array) -> jax.Array:
    """Map internal t to what the model sees (respacing remap, respace.py:107-119).

    Timesteps stay integer — models index a sinusoidal PE table with them.
    `rescale_timesteps` (float 0..1000 scaling) is carried in `rescale_factor`
    for API parity but is never enabled in any TaMF config (diffusion_util.py:28).
    """
    return jnp.take(sched.timestep_map, t)


# ---------------------------------------------------------------------------
# Forward process q
# ---------------------------------------------------------------------------


def q_mean_variance(sched: DiffusionSchedule, x_start: jax.Array, t: jax.Array):
    mean = _extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
    variance = _extract(1.0 - sched.alphas_cumprod, t, x_start.ndim)
    log_variance = _extract(sched.log_one_minus_alphas_cumprod, t, x_start.ndim)
    return mean, variance, log_variance


def q_sample(sched: DiffusionSchedule, x_start: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
    """Sample q(x_t | x_0) (gd.py:190-207)."""
    return (
        _extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
        + _extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
    )


def q_posterior_mean_variance(sched: DiffusionSchedule, x_start: jax.Array, x_t: jax.Array, t: jax.Array):
    """q(x_{t-1} | x_t, x_0) (gd.py:209-229)."""
    mean = (
        _extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
        + _extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t
    )
    variance = _extract(sched.posterior_variance, t, x_t.ndim)
    log_variance = _extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, variance, log_variance


# ---------------------------------------------------------------------------
# Reverse process p
# ---------------------------------------------------------------------------


def predict_xstart_from_eps(sched, x_t, t, eps):
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
        - _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps
    )


def predict_eps_from_xstart(sched, x_t, t, pred_xstart):
    return (
        _extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - pred_xstart
    ) / _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim)


def predict_xstart_from_xprev(sched, x_t, t, xprev):
    return (
        _extract(1.0 / sched.posterior_mean_coef1, t, x_t.ndim) * xprev
        - _extract(sched.posterior_mean_coef2 / sched.posterior_mean_coef1, t, x_t.ndim) * x_t
    )


def p_mean_variance(
    model_fn: Callable[[jax.Array, jax.Array], jax.Array],
    sched: DiffusionSchedule,
    x: jax.Array,
    t: jax.Array,
    *,
    clip_denoised: bool = False,
    denoised_fn: Callable | None = None,
    model_mean_type: ModelMeanType = ModelMeanType.START_X,
    model_var_type: ModelVarType = ModelVarType.FIXED_SMALL,
):
    """p(x_{t-1} | x_t) stats + pred_xstart (gd.py:231-344, fixed-variance paths).

    `model_fn(x, t_model)` closes over conditioning; t_model already respaced.
    """
    model_output = model_fn(x, model_timesteps(sched, t))

    if model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        # model emits 2C channels: [mean-prediction | variance values]
        # (gd.py:259-271; split on the LAST axis — this framework is
        # channel-last [bs, seq, C] vs the reference's [bs, C, 1, seq])
        C = x.shape[-1]
        if model_output.shape[-1] != 2 * C:
            raise ValueError(
                f"learned variance expects model output with {2 * C} channels, "
                f"got {model_output.shape[-1]}"
            )
        model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
        if model_var_type == ModelVarType.LEARNED:
            log_variance = model_var_values
            variance = jnp.exp(log_variance)
        else:
            # var values in [-1, 1] interpolate [posterior_var, beta] in
            # log space (gd.py:266-271)
            min_log = _extract(sched.posterior_log_variance_clipped, t, x.ndim)
            max_log = _extract(jnp.log(sched.betas), t, x.ndim)
            frac = (model_var_values + 1) / 2
            log_variance = frac * max_log + (1 - frac) * min_log
            variance = jnp.exp(log_variance)
    elif model_var_type == ModelVarType.FIXED_SMALL:
        variance = _extract(sched.posterior_variance, t, x.ndim)
        log_variance = _extract(sched.posterior_log_variance_clipped, t, x.ndim)
    else:  # FIXED_LARGE
        # betas with beta_0 replaced by posterior_variance[1] (gd.py:276-284)
        betas_large = jnp.concatenate(
            [sched.posterior_variance[1:2], sched.betas[1:]], axis=0
        )
        variance = _extract(betas_large, t, x.ndim)
        log_variance = jnp.log(variance)

    def process_xstart(xs):
        if denoised_fn is not None:
            xs = denoised_fn(xs)
        if clip_denoised:
            xs = jnp.clip(xs, -1.0, 1.0)
        return xs

    if model_mean_type == ModelMeanType.PREVIOUS_X:
        pred_xstart = process_xstart(predict_xstart_from_xprev(sched, x, t, model_output))
        mean = model_output
    elif model_mean_type == ModelMeanType.START_X:
        pred_xstart = process_xstart(model_output)
        mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    else:  # EPSILON
        pred_xstart = process_xstart(predict_xstart_from_eps(sched, x, t, model_output))
        mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)

    return {
        "mean": mean,
        "variance": variance,
        "log_variance": log_variance,
        "pred_xstart": pred_xstart,
        "model_output": model_output,
    }


def condition_mean(cond_fn, sched, p_mean_var, x, t):
    """Classifier-guidance mean shift (gd.py:346-360)."""
    gradient = cond_fn(x, model_timesteps(sched, t))
    return p_mean_var["mean"].astype(jnp.float32) + p_mean_var["variance"] * gradient.astype(jnp.float32)


def condition_score(cond_fn, sched, p_mean_var, x, t):
    """Song et al. score conditioning (gd.py:373-391)."""
    alpha_bar = _extract(sched.alphas_cumprod, t, x.ndim)
    eps = predict_eps_from_xstart(sched, x, t, p_mean_var["pred_xstart"])
    eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(x, model_timesteps(sched, t))
    pred_xstart = predict_xstart_from_eps(sched, x, t, eps)
    mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    out = dict(p_mean_var)
    out["pred_xstart"] = pred_xstart
    out["mean"] = mean
    return out


def p_sample(
    model_fn,
    sched: DiffusionSchedule,
    x: jax.Array,
    t: jax.Array,
    key: jax.Array,
    *,
    clip_denoised: bool = False,
    denoised_fn=None,
    cond_fn=None,
    const_noise: bool = False,
    model_mean_type: ModelMeanType = ModelMeanType.START_X,
    model_var_type: ModelVarType = ModelVarType.FIXED_SMALL,
):
    """One ancestral step x_t -> x_{t-1} (gd.py:412-462)."""
    out = p_mean_variance(
        model_fn, sched, x, t,
        clip_denoised=clip_denoised, denoised_fn=denoised_fn,
        model_mean_type=model_mean_type, model_var_type=model_var_type,
    )
    noise = jax.random.normal(key, x.shape, x.dtype)
    if const_noise:
        noise = jnp.broadcast_to(noise[0:1], x.shape)
    nonzero_mask = (t != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
    mean = out["mean"]
    if cond_fn is not None:
        mean = condition_mean(cond_fn, sched, out, x, t)
    sample = mean + nonzero_mask * jnp.exp(0.5 * out["log_variance"]) * noise
    return {"sample": sample, "pred_xstart": out["pred_xstart"]}


def p_sample_loop(
    model_fn,
    sched: DiffusionSchedule,
    shape: tuple[int, ...],
    key: jax.Array,
    *,
    noise: jax.Array | None = None,
    clip_denoised: bool = False,
    denoised_fn=None,
    cond_fn=None,
    const_noise: bool = False,
    skip_timesteps: int = 0,
    init_image: jax.Array | None = None,
    model_mean_type: ModelMeanType = ModelMeanType.START_X,
    model_var_type: ModelVarType = ModelVarType.FIXED_SMALL,
) -> jax.Array:
    """Full reverse chain as one on-device `lax.scan` (gd.py:506-640).

    Returns the final sample [bs, ...]. init_image/skip_timesteps follow the
    reference exactly (gd.py:605-612): any init_image is q_sampled at the
    start step USING THE INITIAL NOISE AS THE q_sample NOISE (even with
    skip_timesteps=0), and skip_timesteps without an init_image substitutes
    a zeros image (start marginal sqrt(1-alpha_bar)*noise, not unit noise).
    """
    T = sched.num_timesteps
    key, k_init = jax.random.split(key)
    img = jax.random.normal(k_init, shape, jnp.float32) if noise is None else noise

    t_start = T - skip_timesteps
    if skip_timesteps and init_image is None:
        init_image = jnp.zeros(shape, jnp.float32)
    if init_image is not None:
        t0 = jnp.full((shape[0],), t_start - 1, jnp.int32)
        img = q_sample(sched, init_image, t0, img)

    ts = jnp.arange(t_start - 1, -1, -1, dtype=jnp.int32)
    keys = jax.random.split(key, ts.shape[0])

    def body(img, inp):
        t_scalar, k = inp
        t = jnp.full((shape[0],), t_scalar, jnp.int32)
        out = p_sample(
            model_fn, sched, img, t, k,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn, cond_fn=cond_fn,
            const_noise=const_noise,
            model_mean_type=model_mean_type, model_var_type=model_var_type,
        )
        return out["sample"], None

    img, _ = jax.lax.scan(body, img, (ts, keys))
    return img


def p_sample_loop_parallel(
    model_fn,
    sched: DiffusionSchedule,
    shape: tuple[int, ...],
    key: jax.Array,
    *,
    window: int = 32,
    tol: float = 1e-2,
    noise: jax.Array | None = None,
    clip_denoised: bool = False,
    denoised_fn=None,
    cond_fn=None,
    model_mean_type: ModelMeanType = ModelMeanType.START_X,
    model_var_type: ModelVarType = ModelVarType.FIXED_SMALL,
    return_info: bool = False,
):
    """Picard-parallel ancestral sampling (ParaDiGMS, arXiv:2305.16317).

    Latency-oriented counterpart of `p_sample_loop`: the reverse chain with
    per-step noises pinned (z_t = normal(fold_in(key, t))) is a deterministic
    map, so a sliding window of `window` consecutive steps is solved by
    Picard iteration — every sweep evaluates ALL window steps as one batched
    model call (vmap folds the window into the matmul batch, exactly the
    regime where a small-batch chain leaves the MXU idle) and the window
    slides past each position whose per-element squared drift falls below
    tol**2 * posterior_variance[t] (the paper's imperceptibility criterion;
    position s+1 is exact after every sweep, so progress >= 1/sweep and
    tol=0 degenerates to the sequential chain). Wall-clock is
    n_sweeps * t(window-batched step) vs T * t(step): a win whenever the
    batched window eval is cheaper than `window` sequential evals.

    Not a reference feature (the reference samples bs=1, 1000 sequential
    steps — launch/sample.py:202-229); parity with `p_sample_loop` is in
    distribution, not in the pinned noises. `const_noise` and
    `skip_timesteps`/`init_image` are not supported here.

    Returns the final sample, or (sample, info) with info = {"n_sweeps",
    "n_model_evals"} (i32 scalars) if return_info.
    """
    T = sched.num_timesteps
    W = min(int(window), T)
    bs = shape[0]
    key, k_init = jax.random.split(key)
    img = jax.random.normal(k_init, shape, jnp.float32) if noise is None else noise

    def step(x, t_scalar):
        """x_{t-1} = g_t(x_t) with the pinned per-t noise."""
        t = jnp.full((bs,), t_scalar, jnp.int32)
        out = p_mean_variance(
            model_fn, sched, x, t,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_mean_type=model_mean_type, model_var_type=model_var_type,
        )
        mean = out["mean"]
        if cond_fn is not None:
            mean = condition_mean(cond_fn, sched, out, x, t)
        z = jax.random.normal(jax.random.fold_in(key, t_scalar), shape, jnp.float32)
        nz = (t_scalar > 0).astype(jnp.float32)
        return mean + nz * jnp.exp(0.5 * out["log_variance"]) * z

    # position p in [0, T]: x after p reverse steps; step at position p uses
    # timestep T-1-p. buf[j] = current guess for position s+j; buf[0] exact.
    buf0 = jnp.broadcast_to(img, (W + 1,) + shape)
    tol2 = jnp.asarray(tol, jnp.float32) ** 2

    def cond_fun(carry):
        _, s, _ = carry
        return s < T

    def body_fun(carry):
        buf, s, sweeps = carry
        ts_win = jnp.clip(T - 1 - (s + jnp.arange(W, dtype=jnp.int32)), 0, T - 1)
        y = jax.vmap(step)(buf[:W], ts_win)  # g applied pointwise, batched
        # Picard INTEGRAL form (paper eq. 6): anchor + cumulative increments.
        # Pointwise iteration (new[j+1] = g(old[j])) only advances the exact
        # frontier 1/sweep; cumulative sums propagate the anchor through the
        # whole window each sweep, so errors collapse in O(few) sweeps.
        new_vals = buf[0] + jnp.cumsum(y - buf[:W], axis=0)  # positions s+1..s+W
        # per-SAMPLE drift, gated by the worst sample: pooling the mean over
        # the whole batch would let converged elements mask one that still
        # has large Picard error, sliding its chain past unconverged states
        drift = jnp.max(
            jnp.mean(jnp.square(new_vals - buf[1:]).reshape(W, bs, -1), axis=-1),
            axis=-1,
        )
        # schedule leaves are host numpy (host-constant rule): device-gather
        thresh = tol2 * jnp.take(jnp.asarray(sched.posterior_variance), ts_win)
        ok = drift <= thresh
        # slide: 1 (position s+1 is exact) + leading converged positions
        m = 1 + jnp.sum(jnp.cumprod(ok[1:].astype(jnp.int32)))
        m = jnp.minimum(m, T - s)
        new_buf = jnp.concatenate([buf[:1], new_vals], axis=0)
        idx = jnp.minimum(jnp.arange(W + 1) + m, W)  # frontier-replicate fill
        return jnp.take(new_buf, idx, axis=0), s + m, sweeps + 1

    buf, _, sweeps = jax.lax.while_loop(cond_fun, body_fun, (buf0, jnp.int32(0), jnp.int32(0)))
    sample = buf[0]
    if return_info:
        return sample, {"n_sweeps": sweeps, "n_model_evals": sweeps * W}
    return sample


def p_sample_loop_trajectory(
    model_fn,
    sched: DiffusionSchedule,
    shape: tuple[int, ...],
    key: jax.Array,
    *,
    noise: jax.Array | None = None,
    clip_denoised: bool = False,
    denoised_fn=None,
    cond_fn=None,
    const_noise: bool = False,
    skip_timesteps: int = 0,
    init_image: jax.Array | None = None,
    dump_steps: Sequence[int] | None = None,
    with_pred_xstart: bool = False,
    model_mean_type: ModelMeanType = ModelMeanType.START_X,
    model_var_type: ModelVarType = ModelVarType.FIXED_SMALL,
):
    """Reverse chain that returns intermediate states — the functional
    equivalent of the reference's `p_sample_loop_progressive` generator +
    `dump_steps` (gd.py:506-640). A python generator cannot live inside a
    compiled scan, so the scan STACKS the per-step outputs instead; the
    caller slices what it needs.

    Returns a dict:
      - "sample": [bs, ...] the final x_0 sample
      - "trajectory": [S, bs, ...] the chain states, one per reverse step in
        chain order (index 0 = the t=T-1-skip step's output, index S-1 = the
        final sample); with `dump_steps` only those step indices are kept
        ([len(dump_steps), bs, ...], same semantics as the reference's dump).
      - "pred_xstart": same stacking of per-step x_0 predictions when
        `with_pred_xstart` (the progressive generator exposes them too).
    """
    T = sched.num_timesteps
    key, k_init = jax.random.split(key)
    img = jax.random.normal(k_init, shape, jnp.float32) if noise is None else noise

    t_start = T - skip_timesteps
    # reference init semantics (gd.py:605-612): zeros image when resuming
    # without one; any init_image q_sampled with the initial noise itself
    if skip_timesteps and init_image is None:
        init_image = jnp.zeros(shape, jnp.float32)
    if init_image is not None:
        t0 = jnp.full((shape[0],), t_start - 1, jnp.int32)
        img = q_sample(sched, init_image, t0, img)

    ts = jnp.arange(t_start - 1, -1, -1, dtype=jnp.int32)
    keys = jax.random.split(key, ts.shape[0])

    def body(img, inp):
        t_scalar, k = inp
        t = jnp.full((shape[0],), t_scalar, jnp.int32)
        out = p_sample(
            model_fn, sched, img, t, k,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn, cond_fn=cond_fn,
            const_noise=const_noise,
            model_mean_type=model_mean_type, model_var_type=model_var_type,
        )
        ys = (out["sample"], out["pred_xstart"]) if with_pred_xstart else out["sample"]
        return out["sample"], ys

    img, ys = jax.lax.scan(body, img, (ts, keys))
    traj, preds = ys if with_pred_xstart else (ys, None)
    if dump_steps is not None:
        idx = jnp.asarray(sorted(int(i) for i in dump_steps), jnp.int32)
        traj = jnp.take(traj, idx, axis=0)
        if preds is not None:
            preds = jnp.take(preds, idx, axis=0)
    out = {"sample": img, "trajectory": traj}
    if with_pred_xstart:
        out["pred_xstart"] = preds
    return out


def calc_bpd_loop(
    model_fn,
    sched: DiffusionSchedule,
    x_start: jax.Array,
    key: jax.Array,
    *,
    clip_denoised: bool = False,
    noise: jax.Array | None = None,
    model_mean_type: ModelMeanType = ModelMeanType.START_X,
):
    """Full variational lower-bound sweep (gd.py:1207-1262 calc_bpd_loop):
    one vb/xstart-MSE/eps-MSE evaluation per timestep, as a single on-device
    `lax.scan` over t = T-1..0 (the reference dispatches T separate forwards
    from python).

    `noise` [T, bs, ...] optionally pins the per-timestep q_sample draws
    (index 0 = t=T-1, matching scan order) — used by the parity tests.

    Returns {"total_bpd" [bs], "prior_bpd" [bs], "vb" [bs,T],
    "xstart_mse" [bs,T], "mse" [bs,T]}; column 0 of the [bs,T] arrays is
    t = T-1 (reference stacking order).
    """
    T = sched.num_timesteps
    bs = x_start.shape[0]
    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    if noise is None:
        noise = jax.random.normal(key, (T,) + x_start.shape, x_start.dtype)

    def body(_, inp):
        t_scalar, nz = inp
        t = jnp.full((bs,), t_scalar, jnp.int32)
        x_t = q_sample(sched, x_start, t, nz)
        out = vb_terms_bpd(
            model_fn, sched, x_start, x_t, t,
            clip_denoised=clip_denoised, model_mean_type=model_mean_type,
        )
        xstart_mse = mean_flat((out["pred_xstart"] - x_start) ** 2)
        eps = predict_eps_from_xstart(sched, x_t, t, out["pred_xstart"])
        eps_mse = mean_flat((eps - nz) ** 2)
        return 0, (out["output"], xstart_mse, eps_mse)

    _, (vb, xstart_mse, mse) = jax.lax.scan(body, 0, (ts, noise))
    vb = jnp.swapaxes(vb, 0, 1)  # [bs, T], column 0 = t=T-1
    xstart_mse = jnp.swapaxes(xstart_mse, 0, 1)
    mse = jnp.swapaxes(mse, 0, 1)
    pb = prior_bpd(sched, x_start)
    return {
        "total_bpd": jnp.sum(vb, axis=1) + pb,
        "prior_bpd": pb,
        "vb": vb,
        "xstart_mse": xstart_mse,
        "mse": mse,
    }


def ddim_sample_loop(
    model_fn,
    sched: DiffusionSchedule,
    shape: tuple[int, ...],
    key: jax.Array,
    *,
    noise: jax.Array | None = None,
    clip_denoised: bool = False,
    denoised_fn=None,
    cond_fn=None,
    eta: float = 0.0,
    model_mean_type: ModelMeanType = ModelMeanType.START_X,
) -> jax.Array:
    """DDIM chain as lax.scan (gd.py:642-780)."""
    T = sched.num_timesteps
    key, k_init = jax.random.split(key)
    img = jax.random.normal(k_init, shape, jnp.float32) if noise is None else noise
    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    keys = jax.random.split(key, T)

    def body(img, inp):
        t_scalar, k = inp
        t = jnp.full((shape[0],), t_scalar, jnp.int32)
        out = p_mean_variance(
            model_fn, sched, img, t,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            model_mean_type=model_mean_type, model_var_type=ModelVarType.FIXED_SMALL,
        )
        if cond_fn is not None:
            out = condition_score(cond_fn, sched, out, img, t)
        eps = predict_eps_from_xstart(sched, img, t, out["pred_xstart"])
        alpha_bar = _extract(sched.alphas_cumprod, t, img.ndim)
        alpha_bar_prev = _extract(sched.alphas_cumprod_prev, t, img.ndim)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        mean_pred = (
            out["pred_xstart"] * jnp.sqrt(alpha_bar_prev)
            + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        )
        nonzero_mask = (t != 0).astype(img.dtype).reshape((-1,) + (1,) * (img.ndim - 1))
        sample = mean_pred + nonzero_mask * sigma * jax.random.normal(k, img.shape, img.dtype)
        return sample, None

    img, _ = jax.lax.scan(body, img, (ts, keys))
    return img


def plms_sample_loop(
    model_fn,
    sched: DiffusionSchedule,
    shape: tuple[int, ...],
    key: jax.Array,
    *,
    noise: jax.Array | None = None,
    clip_denoised: bool = False,
    order: int = 2,
    model_mean_type: ModelMeanType = ModelMeanType.START_X,
) -> jax.Array:
    """Pseudo-linear-multistep sampler (gd.py:882-1077) as a scan carrying an
    eps ring buffer. Reference-exact structure: order defaults to 2
    (gd.py:982), the FIRST step (order > 1) is a Pseudo Improved Euler
    half-step pair — a second model eval at (mean_pred, t-1) with the two
    eps averaged (gd.py:932-939) — and the final t == 0 step returns the
    model's pred_xstart, not the Adams-Bashforth transfer (gd.py:963-964)."""
    assert 1 <= order <= 4
    T = sched.num_timesteps
    key, k_init = jax.random.split(key)
    img = jax.random.normal(k_init, shape, jnp.float32) if noise is None else noise
    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)

    def get_eps_x0(x, t):
        out = p_mean_variance(
            model_fn, sched, x, t,
            clip_denoised=clip_denoised, model_mean_type=model_mean_type,
        )
        return (
            predict_eps_from_xstart(sched, x, t, out["pred_xstart"]),
            out["pred_xstart"],
        )

    def ab_next_of(t_next, ndim):
        # t_next may be -1 => alpha_bar_prev = 1
        ab = jnp.where(
            t_next >= 0, jnp.take(sched.alphas_cumprod, jnp.maximum(t_next, 0)), 1.0
        )
        return ab.reshape((-1,) + (1,) * (ndim - 1))

    def transfer(x, t, t_next, eps):
        """Deterministic DDIM transfer using given eps (PLMS inner step)."""
        ab_next = ab_next_of(t_next, x.ndim)
        pred_x0 = predict_xstart_from_eps(sched, x, t, eps)
        return pred_x0 * jnp.sqrt(ab_next) + jnp.sqrt(1 - ab_next) * eps

    def body(carry, t_scalar):
        img, eps_buf, n_seen = carry
        t = jnp.full((shape[0],), t_scalar, jnp.int32)
        t_next = t - 1
        eps, pred_x0 = get_eps_x0(img, t)

        e0 = eps
        e1, e2, e3 = eps_buf[0], eps_buf[1], eps_buf[2]
        # Adams-Bashforth blends, selected by history length (min(order, n_seen+1))
        prime1 = (3 * e0 - e1) / 2
        prime2 = (23 * e0 - 16 * e1 + 5 * e2) / 12
        prime3 = (55 * e0 - 59 * e1 + 37 * e2 - 9 * e3) / 24

        def improved_euler(_):
            # gd.py:932-939 — only the first step (old_out None) pays the
            # extra model eval; lax.cond skips it on every later step
            ab_next = ab_next_of(t_next, img.ndim)
            mean_pred = pred_x0 * jnp.sqrt(ab_next) + jnp.sqrt(1 - ab_next) * e0
            eps_2, _ = get_eps_x0(mean_pred, jnp.maximum(t_next, 0))
            return (e0 + eps_2) / 2.0

        def adams_bashforth(_):
            eff_order = jnp.minimum(n_seen, order - 1)
            return jnp.select(
                [eff_order == 0, eff_order == 1, eff_order == 2],
                [e0, prime1, prime2],
                prime3,
            )

        eps_prime = (
            jax.lax.cond(n_seen == 0, improved_euler, adams_bashforth, None)
            if order > 1
            else e0
        )
        img_next = transfer(img, t, t_next, eps_prime)
        # final step (t == 0): the reference emits the model's pred_xstart
        nonzero = (t != 0).astype(img.dtype).reshape((-1,) + (1,) * (img.ndim - 1))
        img_next = img_next * nonzero + pred_x0 * (1 - nonzero)
        new_buf = jnp.stack([e0, e1, e2])
        return (img_next, new_buf, n_seen + 1), None

    eps_buf0 = jnp.zeros((3,) + shape, jnp.float32)
    (img, _, _), _ = jax.lax.scan(body, (img, eps_buf0, jnp.int32(0)), ts)
    return img


# ---------------------------------------------------------------------------
# Losses (gd.py:163-187 masked_l2; 1106-1188 training_losses; losses.py)
# ---------------------------------------------------------------------------


def sum_flat(x: jax.Array) -> jax.Array:
    return jnp.sum(x, axis=tuple(range(1, x.ndim)))


def mean_flat(x: jax.Array) -> jax.Array:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def masked_l2(a: jax.Array, b: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-sample masked MSE over [bs, seqlen, C] with mask [bs, seqlen]:
    sum((a-b)^2 * mask) / (sum(mask) * C)  — parity with gd.py masked_l2
    (n_entries there = njoints*nfeats = C here)."""
    m = mask[..., None].astype(a.dtype)
    loss = sum_flat((a - b) ** 2 * m)
    n_entries = a.shape[-1]
    non_zero = sum_flat(m) * n_entries  # = sum(mask) * C, parity with gd.py:163-187
    return loss / jnp.maximum(non_zero, 1e-8)


def training_losses(
    model_fn,
    sched: DiffusionSchedule,
    x_start: jax.Array,
    t: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    *,
    model_mean_type: ModelMeanType = ModelMeanType.START_X,
    model_var_type: ModelVarType = ModelVarType.FIXED_SMALL,
    loss_type: LossType = LossType.MSE,
    noise: jax.Array | None = None,
):
    """Masked-MSE diffusion loss; returns (per-sample loss [bs], aux dict with
    model_output for geometric extra losses — the reference's loss_callback hook
    gd.py:1182 becomes 'caller composes on model_output').

    KL/RESCALED_KL route the full loss through the variational bound
    (gd.py:1135-1147); MSE with a LEARNED* variance adds a frozen-mean vb
    term to the aux dict (gd.py:1148-1168). NOTE the reference deviates from
    upstream guided-diffusion by NOT folding the vb term into "loss"
    (gd.py:1180-1181 sets loss = mse; the upstream `mse + vb` line is
    commented out there) — we match the reference: aux["vb"] is reported,
    callers opt in to adding it."""
    if noise is None:
        noise = jax.random.normal(key, x_start.shape, x_start.dtype)
    x_t = q_sample(sched, x_start, t, noise)

    if loss_type in (LossType.KL, LossType.RESCALED_KL):
        vb = vb_terms_bpd(
            model_fn, sched, x_start, x_t, t, clip_denoised=False,
            model_mean_type=model_mean_type, model_var_type=model_var_type,
        )
        loss = vb["output"]
        if loss_type == LossType.RESCALED_KL:
            loss = loss * sched.num_timesteps
        return loss, {"x_t": x_t, "pred_xstart": vb["pred_xstart"]}

    model_output = model_fn(x_t, model_timesteps(sched, t))
    aux = {"x_t": x_t}
    if model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
        # variance learns through the variational bound with the mean
        # prediction FROZEN (gd.py:1155-1164)
        frozen_out = jnp.concatenate(
            [jax.lax.stop_gradient(model_output), model_var_values], axis=-1
        )
        vb = vb_terms_bpd(
            lambda *_: frozen_out, sched, x_start, x_t, t, clip_denoised=False,
            model_mean_type=model_mean_type, model_var_type=model_var_type,
        )["output"]
        if loss_type == LossType.RESCALED_MSE:
            # 1/1000 keeps the vb term from swamping the mse (gd.py:1165-1168)
            vb = vb * (sched.num_timesteps / 1000.0)
        aux["vb"] = vb
    target = {
        ModelMeanType.START_X: x_start,
        ModelMeanType.EPSILON: noise,
        ModelMeanType.PREVIOUS_X: q_posterior_mean_variance(sched, x_start, x_t, t)[0],
    }[model_mean_type]
    mse = masked_l2(target, model_output, mask)
    aux.update(model_output=model_output, target=target)
    return mse, aux


# ---------------------------------------------------------------------------
# VLB / likelihood terms (losses.py:12-68, gd.py:1079-1262)
# ---------------------------------------------------------------------------


def normal_kl(mean1, logvar1, mean2, logvar2):
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.maximum(cdf_delta, 1e-12))),
    )


def vb_terms_bpd(model_fn, sched, x_start, x_t, t, *, clip_denoised=False,
                 model_mean_type=ModelMeanType.START_X,
                 model_var_type=ModelVarType.FIXED_SMALL):
    """KL(q(x_{t-1}|x_t,x_0) || p(x_{t-1}|x_t)) in bits, decoder NLL at t=0."""
    true_mean, _, true_log_var = q_posterior_mean_variance(sched, x_start, x_t, t)
    out = p_mean_variance(
        model_fn, sched, x_t, t, clip_denoised=clip_denoised,
        model_mean_type=model_mean_type, model_var_type=model_var_type,
    )
    kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
    kl = mean_flat(kl) / np.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
    )
    decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out["pred_xstart"]}


def prior_bpd(sched, x_start):
    t = jnp.full((x_start.shape[0],), sched.num_timesteps - 1, jnp.int32)
    qt_mean, _, qt_log_var = q_mean_variance(sched, x_start, t)
    kl_prior = normal_kl(qt_mean, qt_log_var, jnp.zeros_like(qt_mean), jnp.zeros_like(qt_log_var))
    return mean_flat(kl_prior) / np.log(2.0)
