"""Runtime tests: config layering/substitution, run-dir, checkpoint save/load."""

import argparse
import os

import numpy as np
import jax.numpy as jnp
import pytest

from oakink2_tamf_tpu.runtime import ckpt as CK
from oakink2_tamf_tpu.runtime.config import ConfigRegistry, UNSPECIFIED, substitute


def test_config_layering_and_override(tmp_path):
    y1 = tmp_path / "a.yml"
    y1.write_text("train:\n  batch_size: 32\n  lr: 0.001\nmodel:\n  latent_dim: 256\n")
    y2 = tmp_path / "b.yml"
    y2.write_text("model:\n  latent_dim: 512\n")

    reg = ConfigRegistry("testprog")
    reg.register("batch_size", prefix="train", category=int, default=8)
    reg.register("lr", prefix="train", category=float, default=1e-4)
    reg.register("latent_dim", prefix="model", category=int, default=64)
    reg.register("name", category=str, default="x")

    parser = argparse.ArgumentParser()
    reg.hook(parser)
    reg.parse(parser, ["--cfg", str(y1), "--cfg", str(y2), "--train.batch_size", "64"])

    assert reg.select("train")["batch_size"] == 64  # CLI wins
    assert reg.select("train")["lr"] == pytest.approx(0.001)  # yaml layer 1
    assert reg.select("model.latent_dim") == 512  # yaml layer 2 overrides layer 1
    assert reg.select("name") == "x"  # default


def test_config_list_and_file_subst(tmp_path):
    split = tmp_path / "split.txt"
    split.write_text("seq_a\nseq_b\n\nseq_a\n")

    reg = ConfigRegistry("p")
    reg.register("process_range", prefix="data", category=str, is_list=True, default=[])
    parser = argparse.ArgumentParser()
    reg.hook(parser)
    y = tmp_path / "c.yml"
    y.write_text(f"data:\n  process_range:\n    - '?(file:{split})'\n    - seq_c\n")
    reg.parse(parser, ["--cfg", str(y)])
    assert reg.select("data")["process_range"] == ["seq_a", "seq_b", "seq_c"]


def test_config_list_sep_respected():
    """List entries split ONLY on their registered separator — a
    colon-separated path list must keep commas inside elements (and vice
    versa), matching the reference's COLON_SEP/COMMA_SEP patterns."""
    reg = ConfigRegistry("p")
    reg.register("dirs", prefix="d", category=str, is_list=True, default=[], sep=":")
    reg.register("mile", prefix="t", category=int, is_list=True, default=[], sep=",")
    parser = argparse.ArgumentParser()
    reg.hook(parser)
    reg.parse(parser, ["--d.dirs", "/a/dir,with,commas:/b/dir", "--t.mile", "150,250"])
    assert reg.select("d")["dirs"] == ["/a/dir,with,commas", "/b/dir"]
    assert reg.select("t")["mile"] == [150, 250]


def test_config_list_subst_token_not_split(tmp_path):
    """A ?(file:...) substitution token passed on the CLI to a COLON-separated
    list entry must stay atomic — the separator inside the token is part of
    the substitution syntax, not a list boundary (docs/MIGRATION.md documents
    exactly this invocation for --train.process_range)."""
    split = tmp_path / "train.txt"
    split.write_text("seq_a\nseq_b\n")
    reg = ConfigRegistry("p")
    reg.register("process_range", prefix="data", category=str, is_list=True,
                 default=[], sep=":")
    parser = argparse.ArgumentParser()
    reg.hook(parser)
    reg.parse(parser, ["--data.process_range", f"?(file:{split}):seq_c"])
    assert reg.select("data")["process_range"] == ["seq_a", "seq_b", "seq_c"]


def test_unspecified_is_falsy():
    """Optional entries without defaults must read as falsy through the
    `select().get(key) or fallback` idiom every launcher uses."""
    assert not UNSPECIFIED
    assert (UNSPECIFIED or None) is None


def test_config_required_missing():
    reg = ConfigRegistry("p")
    reg.register("must", category=str, required=True)
    parser = argparse.ArgumentParser()
    reg.hook(parser)
    with pytest.raises(KeyError):
        reg.parse(parser, [])


def test_substitute_ts_and_prog():
    s = substitute("run_?(prog)_?(ts:date)", "myprog")
    assert s.startswith("run_myprog_20")
    assert "?(" not in s


def test_unregistered_yaml_passthrough(tmp_path):
    y = tmp_path / "free.yml"
    y.write_text("train:\n  loss:\n    coef_x: 0.5\n")
    reg = ConfigRegistry("p")
    parser = argparse.ArgumentParser()
    reg.hook(parser)
    reg.parse(parser, ["--cfg", str(y)])
    assert reg.select("train.loss")["coef_x"] == 0.5


def test_rundir_dry_vs_commit(tmp_path):
    rd = CK.RunDir("prog", exp_id="exp1", commit=False, root=str(tmp_path))
    rd.setup()
    assert not os.path.exists(rd.path)

    rd2 = CK.RunDir("prog", exp_id="exp1", commit=True, root=str(tmp_path))
    rd2.setup()
    assert os.path.isdir(rd2.path)
    rd2.dump_opt(run={"a": 1})
    rd2.dump_opt(run={"a": 2})  # rotation
    assert os.path.exists(os.path.join(rd2.path, "opt.yml"))
    assert os.path.exists(os.path.join(rd2.path, "opt.yml.00"))


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "params": {"dense": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros((4,))}},
        "step": jnp.asarray(17),
    }
    p = str(tmp_path / "save" / "model_0001.ckpt")
    CK.save_checkpoint(p, state)
    target = {
        "params": {"dense": {"kernel": jnp.zeros((3, 4)), "bias": jnp.ones((4,))}},
        "step": jnp.asarray(0),
    }
    restored = CK.load_checkpoint(p, target)
    np.testing.assert_array_equal(np.asarray(restored["params"]["dense"]["kernel"]), np.ones((3, 4)))
    assert int(restored["step"]) == 17


def test_checkpoint_filter_and_nonstrict(tmp_path):
    state = {"params": {"clip_model": {"w": jnp.ones((2,))}, "core": {"w": jnp.ones((2,)) * 3}}}
    p = str(tmp_path / "m.ckpt")
    CK.save_checkpoint(p, state, filter_out=("clip_model",))

    target = {"params": {"clip_model": {"w": jnp.zeros((2,))}, "core": {"w": jnp.zeros((2,))}}}
    restored = CK.load_checkpoint(p, target, strict=False)
    np.testing.assert_array_equal(np.asarray(restored["params"]["core"]["w"]), [3, 3])
    # clip subtree kept at target init (was filtered at save)
    np.testing.assert_array_equal(np.asarray(restored["params"]["clip_model"]["w"]), [0, 0])

    with pytest.raises(KeyError):
        CK.load_checkpoint(p, target, strict=True)


def test_checkpoint_preserves_namedtuple_nodes(tmp_path):
    from oakink2_tamf_tpu.parallel.train import TrainState

    state = TrainState(step=jnp.asarray(3), params={"w": jnp.ones((2, 2))}, opt_state=())
    p = str(tmp_path / "s.ckpt")
    CK.save_checkpoint(p, state)
    restored = CK.load_checkpoint(p, state)
    assert isinstance(restored, TrainState)
    assert int(restored.step) == 3


def test_orbax_checkpoint_roundtrip(tmp_path):
    from oakink2_tamf_tpu.parallel.train import TrainState

    state = TrainState(
        step=jnp.asarray(42), params={"dense": {"w": jnp.ones((3, 2)) * 2}}, opt_state=()
    )
    p = str(tmp_path / "ck.orbax")
    CK.save_checkpoint_orbax(p, state)
    restored = CK.load_checkpoint_orbax(p, state)
    assert isinstance(restored, TrainState)
    assert int(restored.step) == 42
    np.testing.assert_array_equal(np.asarray(restored.params["dense"]["w"]), np.ones((3, 2)) * 2)
