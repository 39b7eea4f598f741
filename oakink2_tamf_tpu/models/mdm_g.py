"""MF-MDM G: the conditional motion-diffusion transformer denoiser.

TPU-native re-design of reference model/interaction_segment_mdm.py
(`InterationSegmentMDM` — reference's typo kept out of our namespace).

Differences from the reference (all layout/engineering, not semantics):
- batch-first [bs, L, C] tensors (reference: [bs, C, 1, L] in/out, seq-first inside)
- the frozen CLIP text tower runs OUTSIDE the denoiser: `text_emb` [bs, 512]
  enters as conditioning. The reference re-encodes the same prompts through
  CLIP on every one of the 1000 denoise steps (mdm.py:145, SURVEY hot-loop #4);
  since CLIP is frozen this is pure recompute — we cache per-segment text
  embeddings once. Parity of values is preserved (same tower, same tokens).
- hand_side is an int id (0=rh, 1=lh), not a python string list
- object axes are padded to a static max_nobj with an `obj_mask`

Conditioning tokens, in reference order (mdm.py:141-171):
  [timestep, text, hand_side, hand_shape, obj_embed] + L motion frames,
  sinusoidal PE over the concatenated sequence, 8-layer post-LN encoder,
  output head on the trailing L positions.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .trunk import (
    HandShapeProcess,
    HandSideProcess,
    InputMerge,
    InputProcess,
    ObjectEmbedProcess,
    ObjectInputProcess,
    OutputProcess,
    PositionalEncoding,
    TimestepEmbedder,
    TransformerEncoder,
)


@dataclasses.dataclass(frozen=True)
class MDMConfig:
    """Mirrors the reference model YAMLs (config/arch_mdm.yml, arch_mdm_l.yml)."""

    input_dim: int = 99
    obj_input_dim: int = 9
    hand_shape_dim: int = 10
    obj_embed_dim: int = 768
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    clip_dim: int = 512
    cond_mask_prob: float = 0.0
    remat: bool = False
    compute_dtype: str = "float32"  # "bfloat16" puts trunk matmuls on the MXU fast path

    @classmethod
    def arch_mdm(cls) -> "MDMConfig":
        return cls(latent_dim=256, ff_size=1024)

    @classmethod
    def arch_mdm_l(cls) -> "MDMConfig":
        return cls(latent_dim=512, ff_size=2048)


NUM_COND_TOKENS_G = 5


class InteractionSegmentMDM(nn.Module):
    cfg: MDMConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [bs, L, 99] noisy pose_repr
        timesteps: jax.Array,  # [bs] int
        cond: dict[str, Any],
        *,
        deterministic: bool = True,
        force_mask: bool = False,
    ) -> jax.Array:
        cfg = self.cfg
        bs = x.shape[0]

        # --- conditioning tokens -----------------------------------------
        emb_timestep = TimestepEmbedder(cfg.latent_dim, name="embed_timestep")(timesteps)

        text_emb = cond["text_emb"].astype(jnp.float32)
        text_emb = self._mask_cond(text_emb, deterministic, force_mask)
        emb_text = nn.Dense(cfg.latent_dim, name="embed_text")(text_emb)

        emb_handside = HandSideProcess(cfg.latent_dim, name="hand_side_process")(cond["hand_side"])
        emb_shape = HandShapeProcess(cfg.latent_dim, name="hand_shape_process")(cond["shape"])
        emb_obj = ObjectEmbedProcess(cfg.latent_dim, name="obj_embed_process")(
            cond["obj_embedding"], cond["obj_mask"]
        )

        emb = jnp.stack([emb_timestep, emb_text, emb_handside, emb_shape, emb_obj], axis=1)
        emb = jnp.nan_to_num(emb)  # guard parity (mdm.py:158)

        # --- motion stream -----------------------------------------------
        hand_traj = InputProcess(cfg.latent_dim, name="input_process")(x)
        object_input = ObjectInputProcess(cfg.latent_dim, name="obj_input_process")(
            cond["obj_traj"], cond["obj_mask"]
        )
        merged = InputMerge(cfg.latent_dim, name="input_merge")(hand_traj, object_input)
        merged = jnp.nan_to_num(merged)

        # --- trunk ---------------------------------------------------------
        xseq = jnp.concatenate([emb, merged], axis=1)  # [bs, 5+L, d]
        xseq = PositionalEncoding(cfg.latent_dim, cfg.dropout, name="sequence_pos_encoder")(
            xseq, deterministic=deterministic
        )
        out = TransformerEncoder(
            d_model=cfg.latent_dim,
            num_heads=cfg.num_heads,
            ff_size=cfg.ff_size,
            num_layers=cfg.num_layers,
            dropout=cfg.dropout,
            activation=cfg.activation,
            remat=cfg.remat,
            dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
            name="seqTransEncoder",
        )(xseq, deterministic=deterministic)
        out = out[:, NUM_COND_TOKENS_G:]  # [bs, L, d]

        out = OutputProcess(cfg.input_dim, name="output_process")(out)
        return jnp.nan_to_num(out)

    def _mask_cond(self, cond_vec: jax.Array, deterministic: bool, force_mask: bool) -> jax.Array:
        """Classifier-free cond masking (mdm.py:99-109); cond_mask_prob=0 in all
        TaMF configs, the hook is kept for parity."""
        if force_mask:
            return jnp.zeros_like(cond_vec)
        if not deterministic and self.cfg.cond_mask_prob > 0.0:
            rng = self.make_rng("cond_mask")
            keep = jax.random.bernoulli(
                rng, 1.0 - self.cfg.cond_mask_prob, (cond_vec.shape[0], 1)
            )
            return cond_vec * keep.astype(cond_vec.dtype)
        return cond_vec
