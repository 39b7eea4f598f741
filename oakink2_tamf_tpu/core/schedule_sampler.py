"""Diffusion timestep samplers (reference: model/diffusion/resample.py).

- UniformSampler: uniform t (what every TaMF config uses; launch/train.py:468)
- LossSecondMomentResampler: importance-samples t by per-timestep loss second
  moment. The reference syncs history with torch.distributed all_gather
  (resample.py:83-99); here history update happens on host from the already-
  device-averaged per-(t) losses — with a GSPMD data mesh the loss terms come
  back replicated, so no explicit collective is needed.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def create_named_schedule_sampler(name: str, num_timesteps: int):
    if name == "uniform":
        return UniformSampler(num_timesteps)
    elif name == "loss-second-moment":
        return LossSecondMomentResampler(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")


class UniformSampler:
    def __init__(self, num_timesteps: int):
        self.num_timesteps = num_timesteps

    def sample(self, key: jax.Array, batch: int) -> tuple[jax.Array, jax.Array]:
        """Returns (t [batch] int32, weights [batch] f32)."""
        t = jax.random.randint(key, (batch,), 0, self.num_timesteps, dtype=jnp.int32)
        return t, jnp.ones((batch,), jnp.float32)

    def update_with_losses(self, t, losses):  # no-op for uniform
        pass


class LossSecondMomentResampler:
    """Host-side importance sampler over timesteps (resample.py:119-147)."""

    def __init__(self, num_timesteps: int, history_per_term: int = 10, uniform_prob: float = 0.001):
        self.num_timesteps = num_timesteps
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros((num_timesteps, history_per_term), dtype=np.float64)
        self._loss_counts = np.zeros((num_timesteps,), dtype=np.int64)

    def _warmed_up(self) -> bool:
        return bool((self._loss_counts == self.history_per_term).all())

    def weights(self) -> np.ndarray:
        if not self._warmed_up():
            return np.ones((self.num_timesteps,), dtype=np.float64)
        w = np.sqrt(np.mean(self._loss_history**2, axis=-1))
        w = w / w.sum()
        w = w * (1 - self.uniform_prob)
        w = w + self.uniform_prob / len(w)
        return w

    def sample(self, key: jax.Array, batch: int) -> tuple[jax.Array, jax.Array]:
        w = self.weights()
        p = w / w.sum()
        logits = jnp.log(jnp.asarray(p, jnp.float32))
        t = jax.random.categorical(key, logits, shape=(batch,))
        weights = 1.0 / (len(p) * jnp.take(jnp.asarray(p, jnp.float32), t))
        return t.astype(jnp.int32), weights

    def update_with_losses(self, t, losses) -> None:
        """t, losses: host arrays (already globally consistent under GSPMD)."""
        t = np.asarray(t)
        losses = np.asarray(losses)
        for ti, li in zip(t.tolist(), losses.tolist()):
            if self._loss_counts[ti] == self.history_per_term:
                self._loss_history[ti, :-1] = self._loss_history[ti, 1:]
                self._loss_history[ti, -1] = li
            else:
                self._loss_history[ti, self._loss_counts[ti]] = li
                self._loss_counts[ti] += 1
