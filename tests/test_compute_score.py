"""compute_score CLI pipeline test on synthetic data: build a save_dict tree
(identity 'refinement' from GT geometry), then run CR / PSKL-J / FID runners."""

import argparse
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from oakink2_tamf_tpu.core import mano as M
from oakink2_tamf_tpu.eval import compute_score as CS
from oakink2_tamf_tpu.launch import common, param
from oakink2_tamf_tpu.models.refine_r import batch_recover_mano, stack_mano_models
from oakink2_tamf_tpu.runtime.config import ConfigRegistry

SMOKE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "config", "synthetic_smoke.yml"
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("score")
    reg = ConfigRegistry("test_score")
    param.reg_base_param(reg)
    param.reg_mano_param(reg)
    param.reg_model_param(reg)
    CS.reg_score_param(reg)
    parser = argparse.ArgumentParser()
    reg.hook(parser)
    reg.parse(parser, ["--cfg", SMOKE, "--score.sdf_resolution", "32", "--score.frame_stride", "16"])

    dataset = common.build_dataset(reg, "test")
    mano_stack = stack_mano_models(
        M.synthetic_mano_model("right"), M.synthetic_mano_model("left")
    )
    faces = {0: M.closed_faces(M.synthetic_mano_model("right")),
             1: M.closed_faces(M.synthetic_mano_model("left"))}

    # identity-refined save_dicts from GT
    save_dicts = {}
    sample_dir = str(tmp / "samples")
    for i in range(len(dataset)):
        s = dataset[i]
        hs_id = 0 if s["hand_side"] == "rh" else 1
        verts, joints, _ = batch_recover_mano(
            mano_stack,
            jnp.asarray(s["pose_repr"])[None],
            jnp.asarray(s["shape"])[None],
            jnp.asarray([hs_id], jnp.int32),
        )
        d = {
            "process_key": s["info"][0],
            "info": s["info"],
            "hand_side": s["hand_side"],
            "joints": np.asarray(joints[0]),
            "verts": np.asarray(verts[0]),
            "faces": faces[hs_id],
            "obj_list": s["obj_list"],
            "len": s["len"],
            "frame_id": s["frame_id"],
            "refine_pose_repr": s["pose_repr"],
        }
        fp = os.path.join(sample_dir, str(s["info"][0]).replace("/", "++"),
                          str(s["info"][1]), s["hand_side"], "save_dict.pkl")
        os.makedirs(os.path.dirname(fp), exist_ok=True)
        with open(fp, "wb") as f:
            pickle.dump(d, f)
        save_dicts[tuple(s["info"])] = d
    return reg, dataset, sample_dir, mano_stack


def test_load_save_dicts(setup):
    reg, dataset, sample_dir, _ = setup
    sd = CS.load_save_dicts(sample_dir)
    assert len(sd) == len(dataset)


def test_cr_identity_refinement(setup):
    reg, dataset, sample_dir, mano_stack = setup
    sd = CS.load_save_dicts(sample_dir)
    res = CS.run_cr(reg, dataset, sd, mano_stack)
    # identity refinement -> identical contact ratios
    assert res["gt_contact_ratio"] == pytest.approx(res["refined_contact_ratio"], abs=1e-9)
    assert res["n_frames"] > 0


def test_psklj_identity_refinement(setup):
    reg, dataset, sample_dir, mano_stack = setup
    sd = CS.load_save_dicts(sample_dir)
    res = CS.run_psklj(reg, dataset, sd, mano_stack)
    assert abs(res["psklj_gt_to_model"]) < 1e-9
    assert abs(res["psklj_model_to_gt"]) < 1e-9


def test_fid_identity_refinement(setup):
    reg, dataset, sample_dir, mano_stack = setup
    sd = CS.load_save_dicts(sample_dir)
    res = CS.run_fid(reg, dataset, sd, mano_stack)
    assert res["fid"] == pytest.approx(0.0, abs=1e-3)
    assert res["n_segments"] == len(dataset)


def test_fid_with_reference_pt_encoder(setup, tmp_path):
    """run_fid loads the reference's torch encoder checkpoint directly
    (README.md:206-211 recipe: --score.encoder_filepath .../model_0399.pt)."""
    import torch

    reg, dataset, sample_dir, mano_stack = setup
    d = int(reg.select("model").get("latent_dim", 32))
    ff = int(reg.select("model").get("ff_size", 64))
    layers = int(reg.select("model").get("num_layers", 2))

    # minimal reference-keyed encoder state_dict (same layout the reference's
    # save_state writes after the module-prefix strip)
    sd_t = {}
    def lin(prefix, i, o):
        sd_t[f"{prefix}.weight"] = torch.randn(o, i) * 0.05
        sd_t[f"{prefix}.bias"] = torch.randn(o) * 0.05

    lin("hand_shape_process.shape_embed", 10, d)
    lin("obj_embed_process.embedding", 768, d)
    lin("input_process.poseEmbedding", 99, d)
    lin("obj_input_process.poseEmbedding", 9, d)
    lin("input_merge.0", 2 * d, d)
    lin("input_merge.2", d, d)
    for i in range(layers):
        p = f"seqTransEncoder.layers.{i}"
        sd_t[f"{p}.self_attn.in_proj_weight"] = torch.randn(3 * d, d) * 0.05
        sd_t[f"{p}.self_attn.in_proj_bias"] = torch.randn(3 * d) * 0.05
        lin(f"{p}.self_attn.out_proj", d, d)
        lin(f"{p}.linear1", d, ff)
        lin(f"{p}.linear2", ff, d)
        sd_t[f"{p}.norm1.weight"] = torch.ones(d); sd_t[f"{p}.norm1.bias"] = torch.zeros(d)
        sd_t[f"{p}.norm2.weight"] = torch.ones(d); sd_t[f"{p}.norm2.bias"] = torch.zeros(d)
    lin("output_process.poseFinal.0", d, d)
    lin("output_process.poseFinal.2", d, d)
    lin("output_process.poseFinal.4", d, 70)
    sd_t["classification_token"] = torch.zeros(1, 1, d)
    fp = tmp_path / "model_0399.pt"
    torch.save(sd_t, fp)

    reg.values["score.encoder_filepath"] = str(fp)
    try:
        sd = CS.load_save_dicts(sample_dir)
        res = CS.run_fid(reg, dataset, sd, mano_stack)
        # identity refinement through ANY fixed encoder -> FID ~ 0
        assert res["fid"] == pytest.approx(0.0, abs=1e-3)
    finally:
        reg.values["score.encoder_filepath"] = ""


def test_siv_identity_refinement(setup):
    reg, dataset, sample_dir, mano_stack = setup
    sd = CS.load_save_dicts(sample_dir)
    # a 4-segment subset exercises the full SIV plumbing at 1/4 the cost
    keep = set(list(sd.keys())[:4])
    sd = {k: v for k, v in sd.items() if k in keep}
    res = CS.run_siv(reg, dataset, sd, mano_stack)
    # identity refinement -> identical SIV; values finite and non-negative
    assert res["n_frames"] > 0
    assert res["gt_siv_cm3"] == pytest.approx(res["refined_siv_cm3"], abs=1e-9)
    assert res["gt_siv_cm3"] >= 0.0
