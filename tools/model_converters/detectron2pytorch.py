#!/usr/bin/env python
"""Detectron (caffe2) ResNet pickle -> torch-style state dict (reference
``tools/model_converters/detectron2pytorch.py``): caffe2 blob names
(``res2_0_branch2a_w``, affine-channel ``_s``/``_b``) map to
``layer1.0.conv1.weight`` / BN scale+bias with identity running stats
(detectron folds BN into affine channels).
"""

import argparse
import pickle

import numpy as np

ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}
BRANCH = {"branch2a": "conv1", "branch2b": "conv2", "branch2c": "conv3",
          "branch1": "downsample.0"}
BRANCH_BN = {"branch2a": "bn1", "branch2b": "bn2", "branch2c": "bn3",
             "branch1": "downsample.1"}


def convert(src, dst, depth):
    import torch

    with open(src, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    blobs = data.get("blobs", data)
    sd = {}

    def put_bn(caffe, name):
        w = np.asarray(blobs[caffe + "_s"])
        sd[name + ".weight"] = torch.from_numpy(w)
        sd[name + ".bias"] = torch.from_numpy(np.asarray(blobs[caffe + "_b"]))
        sd[name + ".running_mean"] = torch.zeros(w.shape[0])
        sd[name + ".running_var"] = torch.ones(w.shape[0])

    sd["conv1.weight"] = torch.from_numpy(np.asarray(blobs["conv1_w"]))
    put_bn("res_conv1_bn", "bn1")
    for stage, n_blocks in enumerate(ARCH[depth], start=2):
        for blk in range(n_blocks):
            for caffe_br, torch_conv in BRANCH.items():
                cname = f"res{stage}_{blk}_{caffe_br}"
                if cname + "_w" not in blobs:
                    continue
                prefix = f"layer{stage - 1}.{blk}"
                sd[f"{prefix}.{torch_conv}.weight"] = torch.from_numpy(
                    np.asarray(blobs[cname + "_w"]))
                put_bn(cname + "_bn", f"{prefix}.{BRANCH_BN[caffe_br]}")
    torch.save({"state_dict": sd}, dst)
    print(f"wrote {dst} ({len(sd)} tensors)")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("depth", type=int, choices=[50, 101])
    a = p.parse_args()
    convert(a.src, a.dst, a.depth)
