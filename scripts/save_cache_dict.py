#!/usr/bin/env python
"""Precompute the interaction-segment cache_dict pickles
(reference script/save_cache_dict.py workflow).

Requires the OakInk2 toolkit + raw dataset; with --data.synthetic true it
writes a cache built from the synthetic dataset instead (for pipeline tests).

  python scripts/save_cache_dict.py --cfg config/split.yml \
      --data.data_prefix /path/to/OakInk2 --out common/cache/train.pkl \
      --split train --commit
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oakink2_tamf_tpu.launch import common, param
from oakink2_tamf_tpu.runtime.config import ConfigRegistry


def main(argv=None):
    reg = ConfigRegistry("save_cache_dict")
    param.reg_base_param(reg)
    reg.register("out", category=str, default="common/cache/cache_dict.pkl")
    reg.register("split", category=str, default="train", choices=["train", "val", "test", "all"])
    parser = argparse.ArgumentParser()
    reg.hook(parser)
    reg.parse(parser, argv)

    split = reg.select("split")
    if reg.select("data").get("synthetic"):
        ds = common.build_dataset(reg, split if split != "all" else "train")
        cache = {
            "interaction_segment_info_list": [ds[i]["info"] for i in range(len(ds))],
            "interaction_segment_len_list": [ds[i]["len"] for i in range(len(ds))],
            "interaction_segment_pose_list": [],
            "interaction_segment_tsl_list": [],
            "interaction_segment_shape_list": [ds[i]["shape"] for i in range(len(ds))],
            "interaction_segment_hand_side_list": [ds[i]["hand_side"] for i in range(len(ds))],
            "interaction_segment_text_list": [ds[i]["text"] for i in range(len(ds))],
            "interaction_segment_obj_traj_list": [],
            "interaction_segment_frame_id_list": [ds[i]["frame_id"] for i in range(len(ds))],
            "interaction_object_list": [],
        }
        out = reg.select("out")
        if reg.values.get("commit"):
            os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
            with open(out, "wb") as f:
                pickle.dump(cache, f)
            print(f"wrote synthetic cache ({len(ds)} segments) to {out}")
        return

    # real data path: requires the oakink2 toolkit package
    try:
        from oakink2_toolkit.dataset import OakInk2__Dataset  # type: ignore
    except ImportError:
        raise SystemExit(
            "oakink2_toolkit is not installed in this environment; provide a "
            "cache_dict built elsewhere (the format is identical to the "
            "reference's) or run with --data.synthetic true"
        )

    from oakink2_tamf_tpu.data.segment import InteractionSegmentData

    toolkit = OakInk2__Dataset(
        dataset_prefix=reg.select("data")["data_prefix"], return_instantiated=True
    )
    ds = InteractionSegmentData(
        process_range_list=reg.select(split)["process_range"],
        data_prefix=reg.select("data")["data_prefix"],
        toolkit=toolkit,
    )
    out = reg.select("out")
    if reg.values.get("commit"):
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        ds.save_cache(out)
        print(f"wrote cache ({len(ds)} segments) to {out}")
    else:
        print(f"dry run: {len(ds)} segments collected (pass --commit to write)")


if __name__ == "__main__":
    main()
