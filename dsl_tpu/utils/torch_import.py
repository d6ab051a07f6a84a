"""Torch checkpoint import: map reference .pth weights into flax variables.

Covers the two pretrained formats the DSL configs use (SURVEY.md §7 hard
part (e)): mmdet caffe-style ResNet checkpoints
(``backbone.layerX.Y.convZ.weight`` …) and the RLA ImageNet checkpoint
(``resnet50_rla_2283.pth.tar``: ``stages.S.B.convZ.weight``,
``stage_bns.S.B``, ``conv_outs.S``, ``recurrent_convs.S``). Conv kernels
transpose OIHW→HWIO; BN splits into params(scale, bias) +
batch_stats(mean, var).

torch (CPU build) is available in this environment for deserialization only —
no torch code runs on the compute path.
"""

from __future__ import annotations

import re

import numpy as np


def _load_state_dict(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    return {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in ckpt.items() if hasattr(v, "shape")}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _set(tree: dict, path: list[str], value: np.ndarray):
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    old = d.get(path[-1])
    if old is not None and tuple(old.shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"{old.shape} vs {value.shape}")
    d[path[-1]] = value


def _bn_to(params: dict, stats: dict, prefix: list[str], sd: dict,
           torch_key: str):
    _set(params, prefix + ["scale"], sd[torch_key + ".weight"])
    _set(params, prefix + ["bias"], sd[torch_key + ".bias"])
    _set(stats, prefix + ["mean"], sd[torch_key + ".running_mean"])
    _set(stats, prefix + ["var"], sd[torch_key + ".running_var"])


def load_rla_backbone(sd: dict, variables: dict,
                      backbone_key: str = "backbone") -> dict:
    """Map an RLA-ResNet torch state dict into our RLAResNet module tree."""
    import copy

    variables = copy.deepcopy(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables.get("batch_stats", {}))})
    params = variables["params"].setdefault(backbone_key, {})
    stats = variables["batch_stats"].setdefault(backbone_key, {})

    # strip common prefixes
    sd = {re.sub(r"^(module\.|backbone\.)", "", k): v for k, v in sd.items()}

    _set(params, ["conv1", "kernel"], _conv(sd["conv1.weight"]))
    _bn_to(params, stats, ["bn1"], sd, "bn1")

    n_blocks = [0, 0, 0, 0]
    for k in sd:
        m = re.match(r"stages\.(\d)\.(\d+)\.conv1\.weight", k)
        if m:
            s, b = int(m.group(1)), int(m.group(2))
            n_blocks[s] = max(n_blocks[s], b + 1)

    for s in range(4):
        _set(params, [f"conv_out{s}", "kernel"],
             _conv(sd[f"conv_outs.{s}.weight"]))
        _set(params, [f"recurrent_conv{s}", "kernel"],
             _conv(sd[f"recurrent_convs.{s}.weight"]))
        for b in range(n_blocks[s]):
            tp = f"stages.{s}.{b}"
            fp = f"layer{s + 1}_{b}"
            for ci in (1, 2, 3):
                _set(params, [fp, f"conv{ci}", "kernel"],
                     _conv(sd[f"{tp}.conv{ci}.weight"]))
                _bn_to(params, stats, [fp, f"bn{ci}"], sd, f"{tp}.bn{ci}")
            if f"{tp}.downsample.0.weight" in sd:
                _set(params, [fp, "downsample_conv", "kernel"],
                     _conv(sd[f"{tp}.downsample.0.weight"]))
                _bn_to(params, stats, [fp, "downsample_bn"], sd,
                       f"{tp}.downsample.1")
            _bn_to(params, stats, [f"stage_bn{s}_{b}"], sd,
                   f"stage_bns.{s}.{b}")
    return variables


def load_mmdet_resnet_backbone(sd: dict, variables: dict,
                               backbone_key: str = "backbone") -> dict:
    """Map an mmdet/torchvision ResNet state dict into our ResNet module."""
    import copy

    variables = copy.deepcopy(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables.get("batch_stats", {}))})
    params = variables["params"].setdefault(backbone_key, {})
    stats = variables["batch_stats"].setdefault(backbone_key, {})
    sd = {re.sub(r"^(module\.|backbone\.)", "", k): v for k, v in sd.items()}

    _set(params, ["conv1", "kernel"], _conv(sd["conv1.weight"]))
    _bn_to(params, stats, ["bn1"], sd, "bn1")
    for k in list(sd):
        m = re.match(r"layer(\d)\.(\d+)\.conv(\d)\.weight", k)
        if m:
            l, b, c = int(m.group(1)), int(m.group(2)), int(m.group(3))
            fp = f"layer{l}_{b}"
            _set(params, [fp, f"conv{c}", "kernel"], _conv(sd[k]))
            _bn_to(params, stats, [fp, f"bn{c}"], sd,
                   f"layer{l}.{b}.bn{c}")
        m = re.match(r"layer(\d)\.(\d+)\.downsample\.0\.weight", k)
        if m:
            l, b = int(m.group(1)), int(m.group(2))
            fp = f"layer{l}_{b}"
            _set(params, [fp, "downsample_conv", "kernel"], _conv(sd[k]))
            _bn_to(params, stats, [fp, "downsample_bn"], sd,
                   f"layer{l}.{b}.downsample.1")
    return variables


def load_torch_backbone(path: str, variables: dict,
                        backbone_type: str) -> dict:
    sd = _load_state_dict(path)
    if backbone_type in ("RLA_ResNet", "RLAResNet"):
        return load_rla_backbone(sd, variables)
    return load_mmdet_resnet_backbone(sd, variables)


def load_torch_detector(path: str, variables: dict) -> dict:
    """Best effort full-detector import (backbone + FPN + FCOS head)."""
    sd = _load_state_dict(path)
    bk = {k: v for k, v in sd.items() if k.startswith("backbone.")}
    if any("stages." in k for k in bk):
        variables = load_rla_backbone(bk, variables)
    elif bk:
        variables = load_mmdet_resnet_backbone(bk, variables)

    import copy

    variables = copy.deepcopy(variables)
    params = variables["params"]

    def set_if(path_flax, key, transform=lambda x: x):
        if key in sd:
            _set(params, path_flax, transform(sd[key]))

    # FPN: lateral_convs.N.conv / fpn_convs.N.conv (+ extra convs at N>=3)
    neck = params.get("neck", {})
    if neck:
        for i in range(3):
            set_if(["neck", f"lateral_conv{i}", "kernel"],
                   f"neck.lateral_convs.{i}.conv.weight", _conv)
            set_if(["neck", f"lateral_conv{i}", "bias"],
                   f"neck.lateral_convs.{i}.conv.bias")
            set_if(["neck", f"fpn_conv{i}", "kernel"],
                   f"neck.fpn_convs.{i}.conv.weight", _conv)
            set_if(["neck", f"fpn_conv{i}", "bias"],
                   f"neck.fpn_convs.{i}.conv.bias")
        for e in range(2):
            set_if(["neck", f"extra_conv{e}", "kernel"],
                   f"neck.fpn_convs.{3 + e}.conv.weight", _conv)
            set_if(["neck", f"extra_conv{e}", "bias"],
                   f"neck.fpn_convs.{3 + e}.conv.bias")

    # FCOS head: cls_convs/reg_convs (conv + GN), predictors, scales
    head = params.get("bbox_head", {})
    if head:
        n_stacked = sum(1 for k in head if k.startswith("cls_conv"))
        for i in range(n_stacked):
            set_if(["bbox_head", f"cls_conv{i}", "kernel"],
                   f"bbox_head.cls_convs.{i}.conv.weight", _conv)
            set_if(["bbox_head", f"cls_conv{i}", "bias"],
                   f"bbox_head.cls_convs.{i}.conv.bias")
            set_if(["bbox_head", f"cls_gn{i}", "scale"],
                   f"bbox_head.cls_convs.{i}.gn.weight")
            set_if(["bbox_head", f"cls_gn{i}", "bias"],
                   f"bbox_head.cls_convs.{i}.gn.bias")
            set_if(["bbox_head", f"reg_conv{i}", "kernel"],
                   f"bbox_head.reg_convs.{i}.conv.weight", _conv)
            set_if(["bbox_head", f"reg_conv{i}", "bias"],
                   f"bbox_head.reg_convs.{i}.conv.bias")
            set_if(["bbox_head", f"reg_gn{i}", "scale"],
                   f"bbox_head.reg_convs.{i}.gn.weight")
            set_if(["bbox_head", f"reg_gn{i}", "bias"],
                   f"bbox_head.reg_convs.{i}.gn.bias")
        for name in ("conv_cls", "conv_reg", "conv_centerness"):
            set_if(["bbox_head", name, "kernel"],
                   f"bbox_head.{name}.weight", _conv)
            set_if(["bbox_head", name, "bias"], f"bbox_head.{name}.bias")
        for i in range(5):
            set_if(["bbox_head", f"scale{i}", "scale"],
                   f"bbox_head.scales.{i}.scale",
                   lambda x: np.asarray(x).reshape(()))
    return variables
