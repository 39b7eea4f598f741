"""SegmentEncoder: the action-classification transformer used for FID
(reference model/segment_encoder.py).

Same trunk; 3 cond tokens + L motion frames + a trailing zero-initialized
classification token; the cls position's latent is the FID `encoding`, the MLP
head over it gives the 70-action `activation` logits.
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
    MLPHead,
    ObjectEmbedProcess,
    ObjectInputProcess,
    PositionalEncoding,
    TransformerEncoder,
)


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """config/arch_encoder.yml: latent 64, ff 128, 2 layers."""

    output_dim: int = 70
    input_dim: int = 99
    obj_input_dim: int = 9
    hand_shape_dim: int = 10
    obj_embed_dim: int = 768
    latent_dim: int = 64
    ff_size: int = 128
    num_layers: int = 2
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"


NUM_COND_TOKENS_E = 3


class SegmentEncoder(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(
        self,
        pose_repr: jax.Array,  # [bs, L, 99]
        cond: dict[str, Any],
        *,
        deterministic: bool = True,
    ) -> dict[str, jax.Array]:
        cfg = self.cfg
        bs = pose_repr.shape[0]

        emb_handside = HandSideProcess(cfg.latent_dim, name="hand_side_process")(cond["hand_side"])
        emb_shape = HandShapeProcess(cfg.latent_dim, name="hand_shape_process")(cond["shape"])
        emb_obj = ObjectEmbedProcess(cfg.latent_dim, name="obj_embed_process")(
            cond["obj_embedding"], cond["obj_mask"]
        )
        emb = jnp.stack([emb_handside, emb_shape, emb_obj], axis=1)
        emb = jnp.nan_to_num(emb)

        hand_traj = InputProcess(cfg.latent_dim, name="input_process")(pose_repr)
        object_input = ObjectInputProcess(cfg.latent_dim, name="obj_input_process")(
            cond["obj_traj"], cond["obj_mask"]
        )
        merged = InputMerge(cfg.latent_dim, name="input_merge")(hand_traj, object_input)
        merged = jnp.nan_to_num(merged)

        # zero-initialized trainless classification token (ref :52,
        # register_buffer — EXCLUDED from the reference's parameters()).
        # stop_gradient keeps it out of the differentiated set; the train
        # step additionally zeroes any optimizer update on the buffers
        # collection so weight decay can't drift it either.
        cls_token = self.variable(
            "buffers", "classification_token", lambda: jnp.zeros((1, 1, cfg.latent_dim))
        ).value
        cls_token = jax.lax.stop_gradient(cls_token)
        cls = jnp.broadcast_to(cls_token, (bs, 1, cfg.latent_dim))

        xseq = jnp.concatenate([emb, merged, cls], axis=1)  # [bs, 3+L+1, d]
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
            name="seqTransEncoder",
        )(xseq, deterministic=deterministic)

        encoding = out[:, -1]  # [bs, d] — the cls position
        activation = MLPHead(cfg.output_dim, cfg.latent_dim, name="output_process")(encoding)
        return {"encoding": encoding, "activation": activation}
