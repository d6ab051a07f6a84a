#!/usr/bin/env python
"""Upgrade legacy SSD checkpoints to the split-neck key layout.

Reference parity: ``tools/model_converters/upgrade_ssd_version.py``: the old
monolithic SSD backbone's ``extra`` convs move under
``neck.extra_layers.{i}.{j}.conv``, ``l2_norm`` moves under the neck, and
``bbox_head`` conv lists gain a ``.0`` module level.
"""

import argparse


def convert(in_file, out_file):
    import torch

    ckpt = torch.load(in_file, map_location="cpu")
    sd = ckpt.pop("state_dict", None) or ckpt
    out = {}
    for key, val in sd.items():
        if "extra" in key:
            idx = int(key.split(".")[2])
            leaf = key.split(".")[-1]
            new_key = f"neck.extra_layers.{idx // 2}.{idx % 2}.conv.{leaf}"
        elif "l2_norm" in key:
            new_key = "neck.l2_norm.weight"
        elif "bbox_head" in key:
            new_key = key[:21] + ".0" + key[21:]
        else:
            new_key = key
        out[new_key] = val
    torch.save({"state_dict": out, **({k: v for k, v in ckpt.items()
                                       if k != "state_dict"}
                                      if isinstance(ckpt, dict) else {})},
               out_file)
    print(f"wrote {out_file} ({len(out)} tensors)")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("in_file")
    p.add_argument("out_file")
    a = p.parse_args()
    convert(a.in_file, a.out_file)


if __name__ == "__main__":
    main()
