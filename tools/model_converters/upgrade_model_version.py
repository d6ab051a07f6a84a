#!/usr/bin/env python
"""Upgrade mmdet-v1-convention checkpoints to the v2 class layout.

Reference parity: ``tools/model_converters/upgrade_model_version.py``.
v1 put the background class FIRST in classification heads and kept a
background group in per-class regression; v2 puts background LAST and drops
the background reg group. This reimplements those channel transforms
(reorder_cls_channel / truncate_cls_channel / truncate_reg_channel
semantics) on a raw ``.pth`` state dict, driven by key patterns instead of
a parsed config.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))

import numpy as np

HEAD_PREFIXES = ("bbox_head", "mask_head", "semantic_head", "grid_head",
                 "mask_iou_head")


def _roll_bg_to_last(arr, num_classes):
    """Move the v1 background channel (index 0) to the end (v2 layout).
    Works on flat (C,) biases and (C, ...) weights, including heads whose
    channel count is a multiple of num_classes (per-anchor conv heads)."""
    c = arr.shape[0]
    if c == num_classes:
        return np.concatenate([arr[1:], arr[:1]], axis=0)
    if c % num_classes == 0:
        grp = arr.reshape(-1, num_classes, *arr.shape[1:])
        grp = np.concatenate([grp[:, 1:], grp[:, :1]], axis=1)
        return grp.reshape(arr.shape)
    return arr


def _drop_bg_reg_group(arr, num_classes):
    """Drop the v1 background regression group (first 4 channels of a
    per-class box regressor)."""
    c = arr.shape[0]
    if c % num_classes == 0:
        grp = arr.reshape(num_classes, -1, *arr.shape[1:])[1:]
        return grp.reshape(-1, *arr.shape[1:])
    return arr


def convert(in_file, out_file, num_classes):
    import torch

    ckpt = torch.load(in_file, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    out = {}
    for key, val in sd.items():
        arr = val.numpy() if hasattr(val, "numpy") else np.asarray(val)
        is_head = any(key.startswith(h) or f".{h}" in key
                      for h in HEAD_PREFIXES)
        if is_head and ("cls" in key.rsplit(".", 2)[-2]
                        if key.count(".") >= 2 else "cls" in key):
            arr = _roll_bg_to_last(arr, num_classes)
        elif is_head and "reg" in key and arr.shape and \
                arr.shape[0] % num_classes == 0 and arr.shape[0] > 4:
            arr = _drop_bg_reg_group(arr, num_classes)
        out[key] = torch.from_numpy(np.ascontiguousarray(arr))
    payload = dict(ckpt) if "state_dict" in ckpt else {}
    payload["state_dict"] = out
    torch.save(payload, out_file)
    print(f"wrote {out_file} ({len(out)} tensors, "
          f"num_classes={num_classes})")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("in_file")
    p.add_argument("out_file")
    p.add_argument("--num-classes", type=int, default=81,
                   help="v1 class count INCLUDING background")
    a = p.parse_args()
    convert(a.in_file, a.out_file, a.num_classes)


if __name__ == "__main__":
    main()
