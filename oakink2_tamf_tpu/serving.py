"""TamfPipeline: production serving wrapper for the full G -> R stack.

The reference has no serving story (inference = research scripts); this is the
framework-level API a deployment uses:

    pipe = TamfPipeline.load(g_ckpt, r_ckpt, mano_path=..., clip_ckpt=...)
    refined = pipe.generate(segments)            # list of sample dicts
    verts, joints = pipe.hand_geometry(refined, segments)

Engineering:
- fixed-size compiled batches: requests pad up to `batch_size` so every call
  hits the same jitted executable (no shape-churn recompiles);
- one persistent jitted sampler (scan chain) + one jitted refine forward;
- CLIP text features cached across requests;
- deterministic given the seed/key you pass.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .core import diffusion as D
from .core import mano as M
from .data.collate import SegmentCollate
from .models.clip_text import FrozenClipText
from .models.mdm_g import InteractionSegmentMDM, MDMConfig
from .models.refine_r import RefineConfig, SegmentRefineNet, refine_forward, stack_mano_models
from .parallel.train import g_cond_from_batch
from .runtime.ckpt import load_checkpoint


@dataclasses.dataclass
class TamfPipeline:
    g_model: InteractionSegmentMDM
    g_params: Any
    refine_net: SegmentRefineNet
    r_params: Any
    sched: D.DiffusionSchedule
    mano_stack: M.ManoModel
    clip: FrozenClipText
    batch_size: int = 16
    seq_len: int = 160
    max_nobj: int = 4
    n_obj_points: int = 2048
    sampler: str = "ddpm"
    parallel_window: int = 64
    parallel_tol: float = 1e-2

    def __post_init__(self):
        self._collate = SegmentCollate(max_nobj=self.max_nobj, n_obj_points=self.n_obj_points)

        def _run(g_params, r_params, batch, key):
            cond = g_cond_from_batch(batch)
            bs, L = batch["pose_repr"].shape[:2]

            def model_fn(x, t):
                return self.g_model.apply(g_params, x, t, cond, deterministic=True)

            shape = (bs, L, 99)
            if self.sampler == "ddpm":
                sample = D.p_sample_loop(model_fn, self.sched, shape, key, clip_denoised=False)
            elif self.sampler == "ddim":
                sample = D.ddim_sample_loop(model_fn, self.sched, shape, key, clip_denoised=False)
            elif self.sampler == "plms":
                sample = D.plms_sample_loop(model_fn, self.sched, shape, key, clip_denoised=False)
            elif self.sampler == "parallel":
                # latency-oriented small-batch serving: Picard windows batch
                # `parallel_window` chain steps into each model call
                sample = D.p_sample_loop_parallel(
                    model_fn, self.sched, shape, key, clip_denoised=False,
                    window=self.parallel_window, tol=self.parallel_tol,
                )
            else:
                raise ValueError(self.sampler)
            b2 = dict(batch)
            # zero G's output past each segment's true length before R: the
            # reference's R only ever sees samples through its save->load->
            # zero-pad collate (dataset/pose_repr_sample.py), so padded
            # frames are zeros there — raw chain output at padded frames is
            # sampler noise the reference R never conditions on. Also makes
            # the sample-h2o padded-frame dedup (loss_frame_mask) exact.
            b2["sample_pose_repr"] = sample * batch["mask"][:, :, None]
            out = refine_forward(
                self.refine_net, r_params, self.mano_stack, b2,
                deterministic=True, with_target=False,
                loss_frame_mask=batch["mask"],
            )
            return {
                "refine_pose_repr": out["refine_pose_repr"],
                "refine_hand_verts": out["refine_hand_verts"],
                "refine_hand_joints": out["refine_hand_joints"],
                "sample_pose_repr": sample,
            }

        self._run = jax.jit(_run)

    # ------------------------------------------------------------------

    @classmethod
    def load(
        cls,
        g_ckpt: Optional[str] = None,
        r_ckpt: Optional[str] = None,
        *,
        g_config: MDMConfig = MDMConfig.arch_mdm_l(),
        r_config: RefineConfig = RefineConfig(),
        mano_path: Optional[str] = None,
        clip_ckpt: Optional[str] = None,
        bpe_path: Optional[str] = None,
        diffusion_steps: int = 1000,
        timestep_respacing: str = "",
        **kwargs,
    ) -> "TamfPipeline":
        g_model = InteractionSegmentMDM(g_config)
        refine_net = SegmentRefineNet(r_config)
        sched = D.tamf_schedule(diffusion_steps, "cosine", timestep_respacing)
        mano_stack = stack_mano_models(
            M.get_mano_model(mano_path, "right"), M.get_mano_model(mano_path, "left")
        )
        clip = FrozenClipText(checkpoint_path=clip_ckpt, bpe_path=bpe_path)

        pipe = cls.__new__(cls)
        # init params with a probe batch of the pipeline's static shapes
        tmp = cls(
            g_model=g_model, g_params=None, refine_net=refine_net, r_params=None,
            sched=sched, mano_stack=mano_stack, clip=clip, **kwargs,
        )
        probe = tmp._probe_batch()
        cond = g_cond_from_batch(probe)
        g_params = g_model.init(
            jax.random.PRNGKey(0), probe["pose_repr"],
            np.zeros((probe["pose_repr"].shape[0],), np.int32), cond,
        )
        rcond = {k: probe[k] for k in ("hand_side", "shape", "obj_embedding", "obj_traj", "obj_mask")}
        h2o0 = jnp.zeros(probe["pose_repr"].shape[:2] + (778,))
        r_params = refine_net.init(jax.random.PRNGKey(1), probe["pose_repr"], h2o0, rcond)
        if g_ckpt:
            g_params = load_checkpoint(g_ckpt, g_params, strict=False)
        if r_ckpt:
            r_params = load_checkpoint(r_ckpt, r_params, strict=False)
        tmp.g_params = g_params
        tmp.r_params = r_params
        return tmp

    def _probe_batch(self) -> dict[str, Any]:
        from .data.synthetic import synthetic_batch

        rng = np.random.default_rng(0)
        b = synthetic_batch(
            rng, batch_size=self.batch_size, seq_len=self.seq_len,
            max_nobj=self.max_nobj, n_obj_points=self.n_obj_points,
        )
        return {k: b[k] for k in (
            "pose_repr", "mask", "shape", "hand_side", "text_emb",
            "obj_traj", "obj_embedding", "obj_mask", "obj_points",
        )}

    # ------------------------------------------------------------------

    def generate(
        self, segments: Sequence[dict[str, Any]], key: Optional[jax.Array] = None
    ) -> list[dict[str, np.ndarray]]:
        """Run the full G->R pipeline on per-segment sample dicts (the data
        contract of data/segment.py __getitem__). Returns one result dict per
        input segment with refined pose_repr / verts / joints."""
        if key is None:
            key = jax.random.PRNGKey(0)
        results: list[dict[str, np.ndarray]] = []
        for start in range(0, len(segments), self.batch_size):
            chunk = list(segments[start : start + self.batch_size])
            n_real = len(chunk)
            while len(chunk) < self.batch_size:  # pad to the compiled shape
                chunk.append(chunk[-1])
            batch = self._collate(chunk)
            batch["text_emb"] = self.clip.encode_text(batch["text"]).astype(np.float32)
            db = {k: batch[k] for k in (
                "pose_repr", "mask", "shape", "hand_side", "text_emb",
                "obj_traj", "obj_embedding", "obj_mask", "obj_points",
            )}
            key, k = jax.random.split(key)
            out = self._run(self.g_params, self.r_params, db, k)
            out = jax.device_get(out)
            for i in range(n_real):
                results.append(
                    {
                        "refine_pose_repr": np.asarray(out["refine_pose_repr"][i]),
                        "verts": np.asarray(out["refine_hand_verts"][i]),
                        "joints": np.asarray(out["refine_hand_joints"][i]),
                        "g_sample_pose_repr": np.asarray(out["sample_pose_repr"][i]),
                    }
                )
        return results
