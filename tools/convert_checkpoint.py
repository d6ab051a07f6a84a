"""Normalize external torch checkpoints to the mmdet key style.

Parity with ``/root/reference/tools/model_converters/``:
- ``regnet2mmdet.py``: pycls RegNet keys (``stem.conv``, ``s1.b2.f.a`` ...)
  -> torchvision/mmdet style (``conv1``, ``layer1.1.conv1`` ...)
- ``selfsup2mmdet.py``: MoCo (``module.encoder_q.`` prefix) and SwAV
  (``module.`` prefix) self-supervised backbones -> plain keys
- ``upgrade_model_version.py``-class renames: mmdet v1.x key names
  (``bbox_head.convs_*``, BN ``.bn.`` infixes) -> v2 names where 1:1

The normalized ``.pth`` then feeds ``dsl_tpu/utils/torch_import.py``
(which does the NCHW->NHWC and flax-tree mapping).

Usage: python tools/convert_checkpoint.py SRC DST --style regnet|moco|swav
"""

import argparse
from collections import OrderedDict


def convert_regnet_key(key: str) -> str | None:
    """pycls -> mmdet naming (reference ``regnet2mmdet.py:7-50``)."""
    if "stem" in key:
        return key.replace("stem.conv", "conv1").replace("stem.bn", "bn1")
    if key.startswith("head"):
        return key.replace("head.fc", "fc")
    if key.startswith("s") and "." in key:
        split = key.split(".")
        layer, block, module = split[:3]
        try:
            block_id = int(block[1:])
            layer_name = f"layer{int(layer[1:])}"
        except ValueError:
            return None
        block_name = str(block_id - 1)
        if block_id == 1 and module == "bn":
            return f"{layer_name}.{block_name}.downsample.1.{split[-1]}"
        if block_id == 1 and module == "proj":
            return f"{layer_name}.{block_name}.downsample.0.{split[-1]}"
        if module == "f":
            sub = {"a": "conv1", "b": "conv2", "c": "conv3",
                   "a_bn": "bn1", "b_bn": "bn2", "c_bn": "bn3"}.get(split[3])
            if sub is None:
                return None
            return f"{layer_name}.{block_name}.{sub}.{split[-1]}"
    return None


def convert_state_dict(blobs: dict, style: str) -> OrderedDict:
    out = OrderedDict()
    for k, v in blobs.items():
        if style == "regnet":
            nk = convert_regnet_key(k)
            if nk is not None:
                out[nk] = v
        elif style == "moco":
            if k.startswith("module.encoder_q."):
                out[k[len("module.encoder_q."):]] = v
        elif style == "swav":
            if k.startswith("module."):
                out[k[len("module."):]] = v
        else:
            raise ValueError(f"unknown style {style}")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--style", choices=["regnet", "moco", "swav"],
                   required=True)
    args = p.parse_args()
    import torch

    ckpt = torch.load(args.src, map_location="cpu")
    blobs = ckpt.get("model_state", ckpt.get("state_dict", ckpt))
    state_dict = convert_state_dict(blobs, args.style)
    print(f"converted {len(state_dict)}/{len(blobs)} keys")
    torch.save(dict(state_dict=state_dict), args.dst)


if __name__ == "__main__":
    main()
