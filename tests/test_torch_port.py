"""End-to-end checkpoint-port parity: build a torch replica of the reference
G/encoder architectures (same state_dict key names, same math — the reference
modules themselves import CLIP/manotorch which aren't installable), convert its
weights with interop.torch_port, and require the flax forward to match the
torch forward to float tolerance."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

from oakink2_tamf_tpu.interop import torch_port as TP
from oakink2_tamf_tpu.interop.torch_replica import TorchRefG, TorchRefR
from oakink2_tamf_tpu.models.mdm_g import InteractionSegmentMDM, MDMConfig

D, HEADS, FF, LAYERS = 32, 4, 64, 2
L, BS, NOBJ = 10, 3, 2


def test_g_checkpoint_port_end_to_end():
    torch.manual_seed(0)
    ref = TorchRefG(d=D, heads=HEADS, ff=FF, layers=LAYERS).eval()
    rng = np.random.default_rng(0)

    x = rng.normal(size=(BS, L, 99)).astype(np.float32)
    t = np.array([3, 100, 999], np.int64)
    text_emb = rng.normal(size=(BS, 512)).astype(np.float32)
    hand_side = np.array([0, 1, 0], np.int32)
    shape = rng.normal(size=(BS, L, 10)).astype(np.float32)
    obj_traj = rng.normal(size=(BS, NOBJ, L, 9)).astype(np.float32)
    obj_embedding = rng.normal(size=(BS, NOBJ, 768)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(text_emb),
            torch.from_numpy(hand_side.astype(np.int64)), torch.from_numpy(shape),
            torch.from_numpy(obj_traj), torch.from_numpy(obj_embedding),
        ).numpy()

    sd = {k: v for k, v in ref.state_dict().items() if k != "pe"}
    variables = TP.convert_g_state_dict(sd, num_layers=LAYERS, num_heads=HEADS)

    model = InteractionSegmentMDM(
        MDMConfig(latent_dim=D, ff_size=FF, num_layers=LAYERS, num_heads=HEADS, dropout=0.0, activation="gelu_exact")
    )
    cond = {
        "text_emb": jnp.asarray(text_emb),
        "hand_side": jnp.asarray(hand_side),
        "shape": jnp.asarray(shape),
        "obj_traj": jnp.asarray(obj_traj),
        "obj_embedding": jnp.asarray(obj_embedding),
        "obj_mask": jnp.ones((BS, NOBJ), bool),  # all real -> masked mean == plain mean
    }
    out = model.apply(variables, jnp.asarray(x), jnp.asarray(t), cond, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-5)


def test_r_checkpoint_port_end_to_end():
    from oakink2_tamf_tpu.models.refine_r import RefineConfig, SegmentRefineNet

    torch.manual_seed(1)
    ref = TorchRefR(d=D, heads=HEADS, ff=FF, layers=LAYERS).eval()
    rng = np.random.default_rng(2)

    x_in = rng.normal(size=(BS, L, 99)).astype(np.float32)
    h2o = np.abs(rng.normal(size=(BS, L, 778))).astype(np.float32)
    hand_side = np.array([1, 0, 1], np.int32)
    shape = rng.normal(size=(BS, L, 10)).astype(np.float32)
    obj_traj = rng.normal(size=(BS, NOBJ, L, 9)).astype(np.float32)
    obj_embedding = rng.normal(size=(BS, NOBJ, 768)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x_in), torch.from_numpy(h2o),
            torch.from_numpy(hand_side.astype(np.int64)), torch.from_numpy(shape),
            torch.from_numpy(obj_traj), torch.from_numpy(obj_embedding),
        ).numpy()

    sd = {k: v for k, v in ref.state_dict().items() if k != "pe"}
    variables = TP.convert_r_state_dict(sd, num_layers=LAYERS, num_heads=HEADS)

    net = SegmentRefineNet(
        RefineConfig(latent_dim=D, ff_size=FF, num_layers=LAYERS, num_heads=HEADS,
                     dropout=0.0, activation="gelu_exact")
    )
    cond = {
        "hand_side": jnp.asarray(hand_side),
        "shape": jnp.asarray(shape),
        "obj_traj": jnp.asarray(obj_traj),
        "obj_embedding": jnp.asarray(obj_embedding),
        "obj_mask": jnp.ones((BS, NOBJ), bool),
    }
    out = net.apply(variables, jnp.asarray(x_in), jnp.asarray(h2o), cond, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=5e-5)


def test_encoder_checkpoint_port_shapes():
    """Structural check for the encoder converter (head Sequential remap +
    classification_token buffer)."""
    from oakink2_tamf_tpu.models.encoder import EncoderConfig, SegmentEncoder

    d, ff, layers, heads = 16, 32, 2, 4
    sd = {}
    def lin(prefix, i, o):
        sd[f"{prefix}.weight"] = torch.randn(o, i)
        sd[f"{prefix}.bias"] = torch.randn(o)

    lin("hand_shape_process.shape_embed", 10, d)
    lin("obj_embed_process.embedding", 768, d)
    lin("input_process.poseEmbedding", 99, d)
    lin("obj_input_process.poseEmbedding", 9, d)
    lin("input_merge.0", 2 * d, d)
    lin("input_merge.2", d, d)
    for i in range(layers):
        p = f"seqTransEncoder.layers.{i}"
        sd[f"{p}.self_attn.in_proj_weight"] = torch.randn(3 * d, d)
        sd[f"{p}.self_attn.in_proj_bias"] = torch.randn(3 * d)
        lin(f"{p}.self_attn.out_proj", d, d)
        lin(f"{p}.linear1", d, ff)
        lin(f"{p}.linear2", ff, d)
        sd[f"{p}.norm1.weight"] = torch.randn(d); sd[f"{p}.norm1.bias"] = torch.randn(d)
        sd[f"{p}.norm2.weight"] = torch.randn(d); sd[f"{p}.norm2.bias"] = torch.randn(d)
    lin("output_process.poseFinal.0", d, d)
    lin("output_process.poseFinal.2", d, d)
    lin("output_process.poseFinal.4", d, 70)
    sd["classification_token"] = torch.zeros(1, 1, d)

    variables = TP.convert_encoder_state_dict(sd, num_layers=layers, num_heads=heads)
    model = SegmentEncoder(EncoderConfig(latent_dim=d, ff_size=ff, num_layers=layers, num_heads=heads, dropout=0.0))
    rng = np.random.default_rng(1)
    cond = {
        "hand_side": jnp.asarray([0, 1], jnp.int32),
        "shape": jnp.asarray(rng.normal(size=(2, L, 10)).astype(np.float32)),
        "obj_traj": jnp.asarray(rng.normal(size=(2, NOBJ, L, 9)).astype(np.float32)),
        "obj_embedding": jnp.asarray(rng.normal(size=(2, NOBJ, 768)).astype(np.float32)),
        "obj_mask": jnp.ones((2, NOBJ), bool),
    }
    out = model.apply(
        variables, jnp.asarray(rng.normal(size=(2, L, 99)).astype(np.float32)), cond
    )
    assert out["encoding"].shape == (2, d)
    assert out["activation"].shape == (2, 70)
    assert np.all(np.isfinite(np.asarray(out["activation"])))


def test_port_activation_forces_gelu_exact(caplog):
    """Every .pt port path must run the net under torch's exact erf gelu —
    running ported weights under the tanh approximation corrupts parity."""
    import logging

    from oakink2_tamf_tpu.interop import torch_port as TP

    class FakeReg:
        def select(self, key):
            assert key == "model"
            return {"activation": "gelu"}

    with caplog.at_level(logging.WARNING, logger="oakink2_tamf_tpu.interop.torch_port"):
        act = TP.port_activation(FakeReg())
    assert act == "gelu_exact"
    assert any("forcing activation" in r.message for r in caplog.records)

    class FakeRegExact:
        def select(self, key):
            return {"activation": "gelu_exact"}

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="oakink2_tamf_tpu.interop.torch_port"):
        assert TP.port_activation(FakeRegExact()) == "gelu_exact"
    assert not any("forcing activation" in r.message for r in caplog.records)
