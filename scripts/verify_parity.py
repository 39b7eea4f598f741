#!/usr/bin/env python
"""One-command end-to-end parity report against the reference implementation.

Runs every reference-parity check the available assets permit and prints one
PASS/FAIL/SKIP report (exit 1 on any FAIL). The pieces exist as scattered
env-gated tests; this unifies them for the day real weights show up
(VERDICT r2 item 9).

  python scripts/verify_parity.py \
      [--g_ckpt G.pt] [--r_ckpt R.pt] [--encoder_ckpt E.pt] \
      [--clip_ckpt ViT-B-32.pt] [--bpe bpe_simple_vocab_16e6.txt.gz] \
      [--pointbert_ckpt pointbert.pt] \
      [--mano_path MANO_DIR] [--reference_src /root/reference/src] \
      [--chain_steps 50]

Checks (each SKIPs when its asset/flag is absent):
  transforms    rotation/rigid-transform math vs the reference's own dev_fn
                torch code (tests/test_ref_parity_transforms.py, always runs)
  diffusion     bit-level schedule + zero-noise 50-step ancestral chain +
                DDIM chain vs the reference gaussian_diffusion engine
                imported from --reference_src (ref gd.py)
  tokenizer     golden OpenAI token ids (needs the real BPE merges; ref
                tokenization at mdm.py:111-132)
  clip          real OpenAI CLIP text checkpoint: flax tower vs the torch
                replica running the SAME weights
  g_forward     real G checkpoint: ported flax forward vs the torch replica
                (ref mdm.py:134-174); dims inferred from the state_dict
  g_chain       zero-noise {chain_steps}-step respaced reverse chain through
                the real ported G model vs reference SpacedDiffusion driving
                the torch replica (ref launch/sample.py:202-229 structure)
  r_forward     real R checkpoint: ported flax refine forward vs the torch
                replica (ref segment_refine_model.py:170-216)
  encoder       real FID-encoder checkpoint: encoding + activation parity
                (ref segment_encoder.py:17-70; drives eval/compute_score FID)
  pointbert     real Point-BERT checkpoint: flax tower vs the torch replica
                on the same weights (ref pointbert/point_encoder.py:103-144)
  mano          core/mano vs the committed real-manotorch golden fixture
                (tests/fixtures/mano_golden_real.npz, produced by
                scripts/dump_mano_golden.py) + kintree check vs --mano_path

All torch execution is CPU; jax runs on whatever platform is active (set
JAX_PLATFORMS=cpu off-TPU).
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

ATOL_FWD = 5e-4  # float32 torch-vs-XLA at real (512-dim, 8-layer) scale
ATOL_CHAIN = 2e-3  # 50 accumulated reverse steps


class Report:
    def __init__(self):
        self.rows = []

    def add(self, name, status, detail=""):
        self.rows.append((name, status, detail))
        print(f"[{status:4s}] {name:12s} {detail}", flush=True)

    def run(self, name, fn):
        try:
            out = fn()
        except SkipCheck as e:
            self.add(name, "SKIP", str(e))
        except Exception as e:
            traceback.print_exc()
            self.add(name, "FAIL", f"{type(e).__name__}: {e}")
        else:
            self.add(name, "PASS", out or "")

    def conclude(self) -> int:
        n = {"PASS": 0, "FAIL": 0, "SKIP": 0}
        for _, s, _ in self.rows:
            n[s] += 1
        print(f"\nparity report: {n['PASS']} passed, {n['FAIL']} failed, "
              f"{n['SKIP']} skipped")
        return 1 if n["FAIL"] else 0


class SkipCheck(Exception):
    pass


def _load_sd(path: str):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    for key in ("state_dict", "model", "network"):  # common wrapper layouts
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return {k.removeprefix("module."): v for k, v in obj.items()}


def _maxdiff(a, b) -> float:
    return float(np.max(np.abs(np.asarray(a) - np.asarray(b))))


def _synth_inputs(rng, bs=3, L=10, nobj=2):
    return {
        "x": rng.normal(size=(bs, L, 99)).astype(np.float32),
        "hand_side": np.array([0, 1, 0][:bs], np.int32),
        "shape": rng.normal(size=(bs, L, 10)).astype(np.float32),
        "obj_traj": rng.normal(size=(bs, nobj, L, 9)).astype(np.float32),
        "obj_embedding": rng.normal(size=(bs, nobj, 768)).astype(np.float32),
    }


def _jax_cond(inp, with_text=False):
    import jax.numpy as jnp

    bs, nobj = inp["obj_traj"].shape[0], inp["obj_traj"].shape[1]
    cond = {
        "hand_side": jnp.asarray(inp["hand_side"]),
        "shape": jnp.asarray(inp["shape"]),
        "obj_traj": jnp.asarray(inp["obj_traj"]),
        "obj_embedding": jnp.asarray(inp["obj_embedding"]),
        "obj_mask": jnp.ones((bs, nobj), bool),
    }
    if with_text:
        cond["text_emb"] = jnp.asarray(inp["text_emb"])
    return cond


def _torch_args(inp):
    import torch

    return dict(
        hand_side=torch.from_numpy(inp["hand_side"].astype(np.int64)),
        shape=torch.from_numpy(inp["shape"]),
        obj_traj=torch.from_numpy(inp["obj_traj"]),
        obj_embedding=torch.from_numpy(inp["obj_embedding"]),
    )


# ---------------------------------------------------------------------------
# checks
# ---------------------------------------------------------------------------


def _require_ref_import(reference_src: str, module: str) -> None:
    """A skipped-because-unimportable parity suite still exits 0 — convert
    'the reference module the suite needs cannot be imported' into a FAIL,
    so an all-skipped suite can never report PASS."""
    import importlib

    if reference_src not in sys.path:
        sys.path.insert(0, reference_src)
    try:
        importlib.import_module(module)
    except Exception as e:
        raise AssertionError(
            f"reference module {module!r} not importable from "
            f"{reference_src!r} ({e}) — the parity suite would skip "
            "everything and vacuously pass"
        )


def check_transforms(args):
    if not os.path.isdir(args.reference_src):
        raise SkipCheck(f"--reference_src not found: {args.reference_src}")
    import pytest

    _require_ref_import(args.reference_src, "dev_fn.transform.rotation")
    rc = pytest.main(["-q", "-x", os.path.join(REPO, "tests", "test_ref_parity_transforms.py"),
                      "-p", "no:cacheprovider"])
    if rc != 0:
        raise AssertionError(f"pytest rc={rc}")
    return "dev_fn rotation/rigid parity suite green"


def check_diffusion(args):
    if not os.path.isdir(args.reference_src):
        raise SkipCheck(f"--reference_src not found: {args.reference_src}")
    import pytest

    _require_ref_import(
        args.reference_src, "oakink2_tamf.model.diffusion.gaussian_diffusion"
    )
    rc = pytest.main(["-q", "-x", os.path.join(REPO, "tests", "test_diffusion.py"),
                      "-p", "no:cacheprovider"])
    if rc != 0:
        raise AssertionError(f"pytest rc={rc}")
    return "schedule + chain parity suite green (vs reference gd.py)"


def check_tokenizer(args):
    from oakink2_tamf_tpu.models import clip_text as C

    bpe = args.bpe or C.find_bpe_path()
    if not bpe:
        raise SkipCheck("CLIP BPE merges not found (--bpe / $TAMF_CLIP_BPE)")
    tok = C.ClipTokenizer(bpe)
    golden = {  # OpenAI SimpleTokenizer ids (tests/test_clip_text.py golden)
        "a photo of a cat": [320, 1125, 539, 320, 2368],
        "a photo of a dog": [320, 1125, 539, 320, 1929],
    }
    for text, ids in golden.items():
        got = tok.encode(text)
        assert got == ids, f"{text!r}: {got} != {ids}"
    out = tok.tokenize(["a photo of a cat"], context_length=77)
    np.testing.assert_array_equal(out[0, :7], [C.SOT, 320, 1125, 539, 320, 2368, C.EOT])
    return f"golden ids match ({bpe})"


def check_clip(args):
    if not args.clip_ckpt:
        raise SkipCheck("--clip_ckpt not given")
    import jax.numpy as jnp
    import torch

    from oakink2_tamf_tpu.interop.torch_replica import TorchClipText
    from oakink2_tamf_tpu.models import clip_text as C

    sd = _load_sd(args.clip_ckpt)
    layers = 1 + max(int(k.split(".")[2]) for k in sd if k.startswith("transformer.resblocks."))
    d = int(sd["ln_final.weight"].shape[0])
    # the converter reads the module constants; pin them to this checkpoint
    C.LAYERS, C.HEADS = layers, d // 64
    variables = C.load_openai_clip_text_params(args.clip_ckpt)
    vocab, ctx = sd["token_embedding.weight"].shape[0], sd["positional_embedding"].shape[0]
    embed = int(sd["text_projection"].shape[1])
    ref = TorchClipText(vocab=vocab, ctx=ctx, d=d, heads=d // 64, layers=layers,
                        embed_dim=embed).eval()
    missing = ref.load_state_dict({k: v for k, v in sd.items() if k in ref.state_dict()},
                                  strict=False)
    assert not set(missing.missing_keys) - {"causal"}, missing.missing_keys

    rng = np.random.default_rng(0)
    tokens = np.zeros((2, ctx), np.int64)
    for i in range(2):
        n = int(rng.integers(5, 20))
        tokens[i, 0] = vocab - 2
        tokens[i, 1: n - 1] = rng.integers(1, vocab - 2, size=n - 2)
        tokens[i, n - 1] = vocab - 1
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(tokens)).numpy()
    model = C.ClipTextEncoder(vocab_size=vocab, context_length=ctx, width=d,
                              heads=d // 64, layers=layers, embed_dim=embed)
    out = np.asarray(model.apply(variables, jnp.asarray(tokens.astype(np.int32))))
    diff = _maxdiff(out, ref_out)
    assert diff < ATOL_FWD, f"max|Δ|={diff:.2e}"
    return f"text features max|Δ|={diff:.2e} ({layers}L d{d})"


def _g_pair(args):
    """(torch replica, flax model+params, dims) from the real G checkpoint."""
    import torch

    from oakink2_tamf_tpu.interop import torch_port as TP
    from oakink2_tamf_tpu.interop.torch_replica import TorchRefG, infer_trunk_dims
    from oakink2_tamf_tpu.models.mdm_g import InteractionSegmentMDM, MDMConfig

    sd = _load_sd(args.g_ckpt)
    dims = infer_trunk_dims(sd)
    dims["heads"] = args.heads or dims["heads"]
    ref = TorchRefG(**dims).eval()
    res = ref.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items() if k != "pe"},
                              strict=False)
    missing = set(res.missing_keys) - {"pe"}  # deterministic sinusoidal buffer
    assert not missing, f"checkpoint missing keys: {sorted(missing)[:5]}"
    variables = TP.convert_g_state_dict(sd, num_layers=dims["layers"], num_heads=dims["heads"])
    model = InteractionSegmentMDM(MDMConfig(
        latent_dim=dims["d"], ff_size=dims["ff"], num_layers=dims["layers"],
        num_heads=dims["heads"], dropout=0.0, activation="gelu_exact",
    ))
    return ref, model, variables, dims


def check_g_forward(args):
    if not args.g_ckpt:
        raise SkipCheck("--g_ckpt not given")
    import jax.numpy as jnp
    import torch

    ref, model, variables, dims = _g_pair(args)
    rng = np.random.default_rng(0)
    inp = _synth_inputs(rng)
    inp["text_emb"] = rng.normal(size=(3, 512)).astype(np.float32)
    t = np.array([3, 100, 999], np.int64)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(inp["x"]), torch.from_numpy(t),
                      torch.from_numpy(inp["text_emb"]), **_torch_args(inp)).numpy()
    out = model.apply(variables, jnp.asarray(inp["x"]), jnp.asarray(t.astype(np.int32)),
                      _jax_cond(inp, with_text=True), deterministic=True)
    diff = _maxdiff(out, ref_out)
    assert diff < ATOL_FWD, f"max|Δ|={diff:.2e}"
    return f"forward max|Δ|={diff:.2e} ({dims['layers']}L d{dims['d']})"


def check_g_chain(args):
    if not args.g_ckpt:
        raise SkipCheck("--g_ckpt not given")
    if not os.path.isdir(args.reference_src):
        raise SkipCheck(f"--reference_src not found: {args.reference_src}")
    import jax.numpy as jnp
    import torch

    from oakink2_tamf_tpu.core import diffusion as D

    sys.path.insert(0, args.reference_src)
    from oakink2_tamf.model.diffusion import gaussian_diffusion as ref_gd
    from oakink2_tamf.model.diffusion.respace import SpacedDiffusion, space_timesteps

    ref, model, variables, _ = _g_pair(args)
    steps = args.chain_steps
    betas = ref_gd.get_named_beta_schedule("cosine", 1000)
    ref_diff = SpacedDiffusion(
        use_timesteps=space_timesteps(1000, str(steps)), betas=betas,
        model_mean_type=ref_gd.ModelMeanType.START_X,
        model_var_type=ref_gd.ModelVarType.FIXED_SMALL,
        loss_type=ref_gd.LossType.MSE,
    )
    mine = D.make_schedule(
        D.get_named_beta_schedule("cosine", 1000),
        use_timesteps=D.space_timesteps(1000, str(steps)),
    )

    rng = np.random.default_rng(7)
    inp = _synth_inputs(rng)
    inp["text_emb"] = rng.normal(size=(3, 512)).astype(np.float32)
    init = rng.normal(size=inp["x"].shape).astype(np.float32)
    targs = _torch_args(inp)

    # SpacedDiffusion's _wrap_model remaps t -> original timesteps before the
    # model call (respace.py:97-100), so pass the plain replica closure.
    class Closure(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.p = torch.nn.Parameter(torch.zeros(1))  # gd.py:599 device probe

        def forward(self, x, t, **kw):
            return ref(x, t, torch.from_numpy(inp["text_emb"]), **targs)

    orig = torch.randn_like
    try:
        torch.randn_like = lambda x, **kw: torch.zeros_like(x)
        with torch.no_grad():
            ref_out = ref_diff.p_sample_loop(
                Closure(), init.shape, noise=torch.from_numpy(init),
                clip_denoised=False, model_kwargs={}, progress=False,
            ).numpy()
    finally:
        torch.randn_like = orig

    cond = _jax_cond(inp, with_text=True)

    def model_fn(x, t):
        return model.apply(variables, x, t, cond, deterministic=True)

    x = jnp.asarray(init)
    for ts in range(steps - 1, -1, -1):
        t = jnp.full((x.shape[0],), ts, jnp.int32)
        x = D.p_mean_variance(model_fn, mine, x, t, clip_denoised=False)["mean"]
    diff = _maxdiff(x, ref_out)
    assert diff < ATOL_CHAIN, f"max|Δ|={diff:.2e}"
    return f"{steps}-step zero-noise chain max|Δ|={diff:.2e}"


def check_r_forward(args):
    if not args.r_ckpt:
        raise SkipCheck("--r_ckpt not given")
    import jax.numpy as jnp
    import torch

    from oakink2_tamf_tpu.interop import torch_port as TP
    from oakink2_tamf_tpu.interop.torch_replica import TorchRefR, infer_trunk_dims
    from oakink2_tamf_tpu.models.refine_r import RefineConfig, SegmentRefineNet

    sd = _load_sd(args.r_ckpt)
    dims = infer_trunk_dims(sd)
    dims["heads"] = args.heads or dims["heads"]
    ref = TorchRefR(**dims).eval()
    res = ref.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items() if k != "pe"},
                              strict=False)
    missing = set(res.missing_keys) - {"pe"}  # deterministic sinusoidal buffer
    assert not missing, f"checkpoint missing keys: {sorted(missing)[:5]}"
    variables = TP.convert_r_state_dict(sd, num_layers=dims["layers"], num_heads=dims["heads"])
    net = SegmentRefineNet(RefineConfig(
        latent_dim=dims["d"], ff_size=dims["ff"], num_layers=dims["layers"],
        num_heads=dims["heads"], dropout=0.0, activation="gelu_exact",
    ))

    rng = np.random.default_rng(2)
    inp = _synth_inputs(rng)
    h2o = np.abs(rng.normal(size=(3, 10, 778))).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(inp["x"]), torch.from_numpy(h2o),
                      **_torch_args(inp)).numpy()
    out = net.apply(variables, jnp.asarray(inp["x"]), jnp.asarray(h2o),
                    _jax_cond(inp), deterministic=True)
    diff = _maxdiff(out, ref_out)
    assert diff < ATOL_FWD, f"max|Δ|={diff:.2e}"
    return f"refine forward max|Δ|={diff:.2e} ({dims['layers']}L d{dims['d']})"


def check_encoder(args):
    if not args.encoder_ckpt:
        raise SkipCheck("--encoder_ckpt not given")
    import jax.numpy as jnp
    import torch

    from oakink2_tamf_tpu.interop import torch_port as TP
    from oakink2_tamf_tpu.interop.torch_replica import TorchRefEncoder, infer_trunk_dims
    from oakink2_tamf_tpu.models.encoder import EncoderConfig, SegmentEncoder

    sd = _load_sd(args.encoder_ckpt)
    dims = infer_trunk_dims(sd)
    dims["heads"] = args.heads or dims["heads"]
    out_dim = int(sd["output_process.poseFinal.4.weight"].shape[0])
    ref = TorchRefEncoder(out_dim=out_dim, **dims).eval()
    res = ref.load_state_dict({k: torch.as_tensor(v) for k, v in sd.items() if k != "pe"},
                              strict=False)
    missing = set(res.missing_keys) - {"pe"}  # deterministic sinusoidal buffer
    assert not missing, f"checkpoint missing keys: {sorted(missing)[:5]}"
    variables = TP.convert_encoder_state_dict(sd, num_layers=dims["layers"],
                                              num_heads=dims["heads"])
    model = SegmentEncoder(EncoderConfig(
        latent_dim=dims["d"], ff_size=dims["ff"], num_layers=dims["layers"],
        num_heads=dims["heads"], dropout=0.0, output_dim=out_dim,
        # ported torch checkpoint: exact erf gelu, same as check_g/check_r
        # (the tanh default drifts ~1e-3/activation against ATOL_FWD)
        activation="gelu_exact",
    ))
    rng = np.random.default_rng(5)
    inp = _synth_inputs(rng)
    with torch.no_grad():
        ref_enc, ref_act = ref(torch.from_numpy(inp["x"]), **_torch_args(inp))
    out = model.apply(variables, jnp.asarray(inp["x"]), _jax_cond(inp))
    d_enc = _maxdiff(out["encoding"], ref_enc.numpy())
    d_act = _maxdiff(out["activation"], ref_act.numpy())
    assert max(d_enc, d_act) < ATOL_FWD, f"enc|Δ|={d_enc:.2e} act|Δ|={d_act:.2e}"
    return f"FID encoding max|Δ|={d_enc:.2e}, logits max|Δ|={d_act:.2e}"


def check_pointbert(args):
    """Real Point-BERT checkpoint: flax tower vs the torch replica running
    the SAME weights (ref model/pointbert/point_encoder.py:103-144; the
    replica pins the reference's random FPS start to index 0 — see
    tests/test_pointbert_parity.py docstring)."""
    if not args.pointbert_ckpt:
        raise SkipCheck("--pointbert_ckpt not given")
    import importlib.util

    import jax.numpy as jnp
    import torch

    from oakink2_tamf_tpu.models import pointbert as PB

    spec = importlib.util.spec_from_file_location(
        "_pb_replica", os.path.join(REPO, "tests", "test_pointbert_parity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    ckpt = torch.load(args.pointbert_ckpt, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {
        k.removeprefix("module.point_encoder."): v
        for k, v in sd.items()
        if "point_encoder." in k or "module." not in k
    }
    trans_dim = int(sd["cls_token"].shape[-1])
    depth = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("blocks.blocks.")
    )
    encoder_dims = int(sd["encoder.second_conv.3.weight"].shape[0])
    # heads/grouping are not recoverable from weight shapes — take them from
    # the reference yaml matching this width (PointTransformer_base_8192point
    # vs _8192point_2layer), overridable via --heads
    known = {384: (6, 32, 512), 1152: (12, 48, 512)}
    heads, group_size, num_group = known.get(trans_dim, (args.heads or 6, 32, 512))
    cfg = PB.PointBertConfig(
        trans_dim=trans_dim, depth=depth, drop_path_rate=0.0,
        num_heads=args.heads or heads, group_size=group_size,
        num_group=num_group, encoder_dims=encoder_dims,
    )
    ref = mod.TorchPointTransformer(cfg).eval()
    res = ref.load_state_dict(
        {k: torch.as_tensor(v) for k, v in sd.items()}, strict=False
    )
    assert not res.missing_keys, f"checkpoint missing keys: {res.missing_keys[:5]}"
    variables = PB.convert_pointbert_state_dict(
        {k: np.asarray(v) for k, v in sd.items()}, cfg
    )
    rng = np.random.default_rng(11)
    pts = rng.normal(size=(2, 2048, 3)).astype(np.float32) * 0.08
    with torch.no_grad():
        ref_emb = ref(torch.from_numpy(pts)).numpy()
    out = np.asarray(
        PB.PointTransformer(cfg).apply(variables, jnp.asarray(pts), train=False)
    )
    d = _maxdiff(out, ref_emb)
    assert d < ATOL_FWD, f"embedding max|Δ|={d:.2e}"
    return f"obj embedding [{out.shape[1]}] max|Δ|={d:.2e} (d={trans_dim} depth={depth})"


def check_mano(args):
    fixture = os.path.join(REPO, "tests", "fixtures", "mano_golden_real.npz")
    if not os.path.isfile(fixture):
        raise SkipCheck("tests/fixtures/mano_golden_real.npz absent "
                        "(produce with scripts/dump_mano_golden.py)")
    env = dict(os.environ)
    if args.mano_path:
        env["TAMF_MANO_PATH"] = args.mano_path
    if "TAMF_MANO_PATH" not in env:
        raise SkipCheck("--mano_path / $TAMF_MANO_PATH not set")
    import subprocess

    rc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", "-x", "-p", "no:cacheprovider",
         os.path.join(REPO, "tests", "test_mano_golden.py")],
        env=env, cwd=REPO,
    ).returncode
    if rc != 0:
        raise AssertionError(f"pytest rc={rc}")
    return "real-manotorch golden + kintree suite green"


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--g_ckpt", default=os.environ.get("TAMF_G_CKPT"))
    p.add_argument("--r_ckpt", default=os.environ.get("TAMF_R_CKPT"))
    p.add_argument("--encoder_ckpt", default=os.environ.get("TAMF_ENCODER_CKPT"))
    p.add_argument("--clip_ckpt", default=os.environ.get("TAMF_CLIP_CKPT"))
    p.add_argument("--pointbert_ckpt", default=os.environ.get("TAMF_POINTBERT_CKPT"))
    p.add_argument("--bpe", default=None, help="CLIP merges (default: auto-discover)")
    p.add_argument("--mano_path", default=None)
    p.add_argument("--reference_src", default="/root/reference/src")
    p.add_argument("--chain_steps", type=int, default=50)
    p.add_argument("--heads", type=int, default=0,
                   help="attention heads override (0 = reference default 4)")
    p.add_argument("--skip_suites", action="store_true",
                   help="skip the pytest-backed transforms/diffusion suites")
    args = p.parse_args(argv)

    # the pytest-backed parity suites read the reference location from this
    # env var (tests/test_diffusion.py, test_ref_parity_transforms.py) —
    # without it a custom --reference_src would pass the isdir gate here but
    # the suites would skip against the hardcoded default and report PASS
    # with zero parity tests executed
    os.environ["TAMF_REF_SRC"] = args.reference_src

    if os.environ.get("JAX_PLATFORMS"):
        # the image's sitecustomize may override the env var after import;
        # config.update is the reliable override (see tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    rep = Report()
    if not args.skip_suites:
        rep.run("transforms", lambda: check_transforms(args))
        rep.run("diffusion", lambda: check_diffusion(args))
    rep.run("tokenizer", lambda: check_tokenizer(args))
    rep.run("clip", lambda: check_clip(args))
    rep.run("g_forward", lambda: check_g_forward(args))
    rep.run("g_chain", lambda: check_g_chain(args))
    rep.run("r_forward", lambda: check_r_forward(args))
    rep.run("encoder", lambda: check_encoder(args))
    rep.run("pointbert", lambda: check_pointbert(args))
    rep.run("mano", lambda: check_mano(args))
    return rep.conclude()


if __name__ == "__main__":
    sys.exit(main())
