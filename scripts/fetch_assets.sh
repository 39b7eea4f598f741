#!/usr/bin/env bash
# Fetch the real assets a reference-parity run depends on (config/parity.yml).
#
# Mirrors the reference's manual download workflow (reference README.md
# "Train" steps 1-2 and "Evaluation" step 2); run from the repo root.
# MANO itself is license-gated and must be downloaded by hand.
set -euo pipefail

HF=https://huggingface.co/kelvin34501/OakInk2-TaMF/resolve/main
CLIP_BPE=https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz

mkdir -p asset common

# 1. MANO v1.2 (license-gated: manual). Expected layout:
#    asset/mano_v1_2/models/MANO_{LEFT,RIGHT}.pkl
if [ ! -f asset/mano_v1_2/models/MANO_RIGHT.pkl ]; then
  echo "!! MANO assets missing: register at https://mano.is.tue.mpg.de," \
       "download v1.2 and untar to asset/mano_v1_2 (see reference README)."
fi

# 2. CLIP BPE merges (models/clip_text.py refuses pretrained weights without it)
if [ ! -f asset/clip/bpe_simple_vocab_16e6.txt.gz ]; then
  mkdir -p asset/clip
  curl -L -o asset/clip/bpe_simple_vocab_16e6.txt.gz "$CLIP_BPE"
fi

# 3. grabnet contact assets (verts_per_edge.npy, rhand_weight.npy -> asset/grabnet).
# The reference README's own grabnet link points at encoder__fid_1.tar.xz
# (README.md:128-133) — VERIFY the untar actually produced asset/grabnet and
# fail loudly if it did not (training would otherwise proceed on the
# synthesized-fallback contact weights, models/losses.py fail-loud warning).
if [ ! -f asset/grabnet/rhand_weight.npy ]; then
  curl -L -o /tmp/grabnet_assets.tar.xz "$HF/encoder__fid_1.tar.xz"
  tar -xJf /tmp/grabnet_assets.tar.xz -C asset
  if [ ! -f asset/grabnet/rhand_weight.npy ]; then
    echo "!! the archive did not contain grabnet/ (the reference README's" \
         "link may be wrong): fetch verts_per_edge.npy + rhand_weight.npy" \
         "from https://github.com/otaheri/GrabNet /" \
         "https://github.com/oakink/OakInk-Grasp-Generation into asset/grabnet"
  fi
fi

# 4. precomputed PointBERT object embeddings + sampled point clouds -> common/
if [ ! -d common/retrieve_obj_embedding ]; then
  curl -L -o /tmp/obj_embedding.tar.xz "$HF/retrieve_obj_embedding.tar.xz"
  tar -xJf /tmp/obj_embedding.tar.xz -C common
fi
if [ ! -d common/retrieve_obj_pointcloud ]; then
  curl -L -o /tmp/obj_pointcloud.tar.xz "$HF/retrieve_obj_pointcloud.tar.xz"
  tar -xJf /tmp/obj_pointcloud.tar.xz -C common
fi

echo "done. verify the gates with:"
echo "  TAMF_MANO_PATH=asset/mano_v1_2 TAMF_CLIP_BPE=asset/clip/bpe_simple_vocab_16e6.txt.gz \\"
echo "    python -m pytest tests/test_mano_golden.py tests/test_clip_text.py -q"
