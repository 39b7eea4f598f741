"""Golden parity: flax EncoderLayer vs torch nn.TransformerEncoderLayer with
identical weights (the reference trunk's exact layer type, mdm.py:63-70).
Validates post-LN ordering, gelu, attention head math and our weight layout."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from oakink2_tamf_tpu.models.trunk import EncoderLayer, TransformerEncoder

D_MODEL, HEADS, FF, SEQ, BS = 32, 4, 64, 11, 3
HEAD_DIM = D_MODEL // HEADS


def torch_layer():
    torch.manual_seed(0)
    return torch.nn.TransformerEncoderLayer(
        d_model=D_MODEL, nhead=HEADS, dim_feedforward=FF, dropout=0.0,
        activation="gelu", batch_first=True,
    ).eval()


def port_weights(tl) -> dict:
    """torch layer state -> flax EncoderLayer params."""
    sd = {k: v.detach().numpy() for k, v in tl.state_dict().items()}
    w_in = sd["self_attn.in_proj_weight"]  # [3d, d]
    b_in = sd["self_attn.in_proj_bias"]
    wq, wk, wv = np.split(w_in, 3, axis=0)
    bq, bk, bv = np.split(b_in, 3, axis=0)

    def qkv(w, b):
        return {
            "kernel": w.T.reshape(D_MODEL, HEADS, HEAD_DIM),
            "bias": b.reshape(HEADS, HEAD_DIM),
        }

    return {
        "self_attn": {
            "query": qkv(wq, bq),
            "key": qkv(wk, bk),
            "value": qkv(wv, bv),
            "out": {
                "kernel": sd["self_attn.out_proj.weight"].T.reshape(HEADS, HEAD_DIM, D_MODEL),
                "bias": sd["self_attn.out_proj.bias"],
            },
        },
        "linear1": {"kernel": sd["linear1.weight"].T, "bias": sd["linear1.bias"]},
        "linear2": {"kernel": sd["linear2.weight"].T, "bias": sd["linear2.bias"]},
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
    }


def test_encoder_layer_matches_torch():
    tl = torch_layer()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(BS, SEQ, D_MODEL)).astype(np.float32)

    with torch.no_grad():
        ref = tl(torch.from_numpy(x)).numpy()

    layer = EncoderLayer(d_model=D_MODEL, num_heads=HEADS, ff_size=FF, dropout=0.0, activation="gelu_exact")
    params = {"params": port_weights(tl)}
    out = layer.apply(params, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_stacked_encoder_matches_torch():
    torch.manual_seed(1)
    layers = [torch_layer() for _ in range(3)]
    enc = torch.nn.TransformerEncoder(
        torch.nn.TransformerEncoderLayer(
            d_model=D_MODEL, nhead=HEADS, dim_feedforward=FF, dropout=0.0,
            activation="gelu", batch_first=True,
        ),
        num_layers=3,
    ).eval()

    rng = np.random.default_rng(1)
    x = rng.normal(size=(BS, SEQ, D_MODEL)).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(x)).numpy()

    params = {
        "params": {f"layer_{i}": port_weights(enc.layers[i]) for i in range(3)}
    }
    mine = TransformerEncoder(
        d_model=D_MODEL, num_heads=HEADS, ff_size=FF, num_layers=3, dropout=0.0,
        activation="gelu_exact",
    )
    out = mine.apply(params, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-5)
