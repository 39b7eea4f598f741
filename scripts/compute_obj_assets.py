#!/usr/bin/env python
"""Precompute per-object point clouds + PointBERT embeddings.

Replaces the reference's downloaded obj_pointcloud/ + obj_embedding/ assets
(README.md:118-126; config/obj_pointcloud.yml, obj_embedding.yml): samples
8192 surface points per object mesh and runs the JAX PointTransformer.

  python scripts/compute_obj_assets.py --mesh_dir <dir with obj_id.obj> \
      --out_pointcloud common/obj_pointcloud --out_embedding common/obj_embedding \
      [--pointbert_ckpt path.pt] --commit
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mesh_dir", required=True)
    p.add_argument("--out_pointcloud", default="common/obj_pointcloud")
    p.add_argument("--out_embedding", default="common/obj_embedding")
    p.add_argument("--n_points", type=int, default=8192)
    p.add_argument("--pointbert_ckpt", default="")
    p.add_argument("--commit", action="store_true")
    args = p.parse_args(argv)

    import jax

    from oakink2_tamf_tpu.models.pointbert import PointBertConfig, PointTransformer
    from oakink2_tamf_tpu.utils.mesh_io import load_obj, sample_surface

    meshes = sorted(f for f in os.listdir(args.mesh_dir) if f.endswith(".obj"))
    print(f"{len(meshes)} meshes in {args.mesh_dir}")

    model = PointTransformer(PointBertConfig())
    import jax.numpy as jnp

    probe = jnp.zeros((1, args.n_points, 3))
    variables = model.init(jax.random.PRNGKey(0), probe)
    if args.pointbert_ckpt:
        if args.pointbert_ckpt.endswith((".pt", ".pth")):
            # the reference's pretrained torch checkpoint (README.md:118-126)
            from oakink2_tamf_tpu.models.pointbert import load_pointbert_checkpoint

            variables = load_pointbert_checkpoint(args.pointbert_ckpt)
            print(f"ported reference Point-BERT torch checkpoint {args.pointbert_ckpt}")
        else:
            from oakink2_tamf_tpu.runtime.ckpt import load_checkpoint

            variables = load_checkpoint(args.pointbert_ckpt, variables, strict=False)
    else:
        print(
            "WARNING: no --pointbert_ckpt given — embeddings come from RANDOM-INIT "
            "weights and will NOT match the reference's downloaded obj_embedding/ assets"
        )
    apply_fn = jax.jit(lambda v, x: model.apply(v, x, train=False))

    if args.commit:
        os.makedirs(args.out_pointcloud, exist_ok=True)
        os.makedirs(args.out_embedding, exist_ok=True)

    for fname in meshes:
        oid = os.path.splitext(fname)[0]
        verts, faces = load_obj(os.path.join(args.mesh_dir, fname))
        pts = sample_surface(verts, faces, args.n_points)
        emb = np.asarray(apply_fn(variables, jnp.asarray(pts)[None]))[0]
        if args.commit:
            np.savez(os.path.join(args.out_pointcloud, f"{oid}.npz"), point=pts)
            np.save(os.path.join(args.out_embedding, f"{oid}.npy"), emb)
        print(f"{oid}: {pts.shape} points, {emb.shape} embedding")


if __name__ == "__main__":
    main()
