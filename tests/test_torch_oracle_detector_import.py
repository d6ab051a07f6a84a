"""Full-detector checkpoint-import oracle: the reference's OWN
RLA-ResNet + FPN + (DSL) FCOSHead are instantiated in torch (mmcv's
ConvModule/Scale reproduced functionally, everything else loaded from
``/root/reference/mmdet``), every weight/BN-stat randomized, saved as a
real ``.pth`` with reference key names, imported via
``utils/torch_import.py load_torch_detector``, and the flax detector's
eval forward (per-level cls / stride-scaled bbox / centerness maps) must
match the torch eval forward.

This extends the backbone-only import proof (``test_torch_oracle.py``) to
the whole flagship model: a published DSL checkpoint
(``RLA_r50_...si-soft_singlestage`` epoch .pth) imports correctly
end-to-end — FPN lateral/fpn/extra convs, head towers with GN, the
per-level Scale factors, and the norm_on_bbox stride semantics.

Skipped automatically when /root/reference or torch is unavailable.
"""

import os.path as osp
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/mmdet"
REF_FCOS = osp.join(REF_ROOT, "models/dense_heads/fcos_head.py")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not osp.exists(REF_FCOS),
                                reason="reference tree not available")


def _load_reference_detector():
    """Load reference fpn.py + anchor_free_head.py + fcos_head.py (real
    code) with a functional mmcv ConvModule/Scale."""
    import importlib.util

    import torch.nn as nn

    new_mods = {}

    def _stub(name):
        mod = types.ModuleType(name)
        new_mods[name] = mod
        return mod

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = name.rsplit(".", 1)[0]
        new_mods[name] = mod
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    class ConvModule(nn.Module):
        """mmcv ConvModule: conv -> norm -> act, bias auto-off with norm,
        norm submodule named 'gn'/'bn' (state_dict key parity)."""

        def __init__(self, in_channels, out_channels, kernel_size,
                     stride=1, padding=0, dilation=1, groups=1,
                     bias="auto", conv_cfg=None, norm_cfg=None,
                     act_cfg=dict(type="ReLU"), inplace=True,
                     order=("conv", "norm", "act")):
            super().__init__()
            with_norm = norm_cfg is not None
            if bias == "auto":
                bias = not with_norm
            self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                                  stride, padding, dilation, groups,
                                  bias=bias)
            self._act = None
            if act_cfg is not None and act_cfg.get("type") == "ReLU":
                self._act = nn.ReLU()
            if with_norm:
                if norm_cfg["type"] == "GN":
                    self.gn = nn.GroupNorm(norm_cfg["num_groups"],
                                           out_channels)
                    self._norm = self.gn
                else:
                    self.bn = nn.BatchNorm2d(out_channels)
                    self._norm = self.bn
            else:
                self._norm = None

        def forward(self, x):
            x = self.conv(x)
            if self._norm is not None:
                x = self._norm(x)
            if self._act is not None:
                x = self._act(x)
            return x

    class Scale(nn.Module):
        def __init__(self, scale=1.0):
            super().__init__()
            self.scale = nn.Parameter(torch.tensor(float(scale)))

        def forward(self, x):
            return x * self.scale

    class _Reg:
        def __init__(self):
            self.classes = {}

        def register_module(self, *a, **k):
            def deco(cls):
                self.classes[cls.__name__] = cls
                return cls
            return deco

    mmcv = _stub("mmcv")
    mmcv.jit = lambda **kw: (lambda f: f)
    mmcv_cnn = _stub("mmcv.cnn")
    mmcv_cnn.ConvModule = ConvModule
    mmcv_cnn.Scale = Scale
    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()

    mmcv_runner = _stub("mmcv.runner")
    mmcv_runner.BaseModule = BaseModule
    mmcv_runner.force_fp32 = lambda **kw: (lambda f: f)
    mmcv_runner.auto_fp16 = lambda **kw: (lambda f: f)
    mmcv_ops = _stub("mmcv.ops")
    mmcv_ops.sigmoid_focal_loss = None    # CPU fallback path only
    mmcv.cnn, mmcv.runner, mmcv.ops = mmcv_cnn, mmcv_runner, mmcv_ops

    losses_reg = _Reg()

    def build_loss(cfg):
        cfg = dict(cfg)
        return losses_reg.classes[cfg.pop("type")](**cfg)

    for pkg in ("refdet", "refdet.models", "refdet.models.losses",
                "refdet.models.necks", "refdet.models.dense_heads"):
        _stub(pkg)
    builder = _stub("refdet.models.builder")
    builder.LOSSES = losses_reg
    builder.HEADS = _Reg()
    builder.NECKS = _Reg()
    builder.build_loss = build_loss

    # fake absolute mmdet.* the reference modules import
    mmdet_mod = _stub("mmdet")
    mmdet_core = _stub("mmdet.core")
    mmdet_utils = _stub("mmdet.utils")
    mmdet_cm = _stub("mmdet.utils.contextmanagers")
    mmdet_cm.completed = None
    mmdet_core.bbox_mapping_back = None
    mmdet_core.merge_aug_proposals = None
    mmdet_core.multiclass_nms = None
    mmdet_core.reduce_mean = lambda t: t
    # real core helpers so FCOSHead.loss is runnable (train-step oracle)
    for pkg in ("refdet.core", "refdet.core.bbox",
                "refdet.core.bbox.iou_calculators"):
        _stub(pkg)
    iou_builder = _stub("refdet.core.bbox.iou_calculators.builder")
    iou_builder.IOU_CALCULATORS = _Reg()

    from functools import partial

    def multi_apply(func, *args, **kwargs):
        pfunc = partial(func, **kwargs) if kwargs else func
        return tuple(map(list, zip(*map(pfunc, *args))))

    mmdet_core.multi_apply = multi_apply
    mmdet_mod.core, mmdet_mod.utils = mmdet_core, mmdet_utils
    mmdet_utils.contextmanagers = mmdet_cm

    saved = {k: sys.modules.get(k) for k in set(new_mods)}
    sys.modules.update(new_mods)
    try:
        iou2d = _load(
            "refdet.core.bbox.iou_calculators.iou2d_calculator",
            osp.join(REF_ROOT,
                     "core/bbox/iou_calculators/iou2d_calculator.py"))
        transforms = _load("refdet.core.bbox.transforms",
                           osp.join(REF_ROOT, "core/bbox/transforms.py"))
        mmdet_core.distance2bbox = transforms.distance2bbox
        mmdet_core.bbox_overlaps = iou2d.bbox_overlaps
        _load("refdet.models.losses.utils",
              osp.join(REF_ROOT, "models/losses/utils.py"))
        _load("refdet.models.losses.focal_loss",
              osp.join(REF_ROOT, "models/losses/focal_loss.py"))
        _load("refdet.models.losses.iou_loss",
              osp.join(REF_ROOT, "models/losses/iou_loss.py"))
        _load("refdet.models.losses.cross_entropy_loss",
              osp.join(REF_ROOT, "models/losses/cross_entropy_loss.py"))
        fpn = _load("refdet.models.necks.fpn",
                    osp.join(REF_ROOT, "models/necks/fpn.py"))
        _load("refdet.models.dense_heads.base_dense_head",
              osp.join(REF_ROOT,
                       "models/dense_heads/base_dense_head.py"))
        _load("refdet.models.dense_heads.dense_test_mixins",
              osp.join(REF_ROOT,
                       "models/dense_heads/dense_test_mixins.py"))
        _load("refdet.models.dense_heads.anchor_free_head",
              osp.join(REF_ROOT,
                       "models/dense_heads/anchor_free_head.py"))
        fcos = _load("refdet.models.dense_heads.fcos_head", REF_FCOS)
        return types.SimpleNamespace(FPN=fpn.FPN, FCOSHead=fcos.FCOSHead)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


LAYERS = [1, 1, 1, 3]   # stage-4 recurrent bn list needs >= 3 blocks
IMG = 160


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    """Randomized reference detector .pth + its eval forward maps."""
    sys.path.insert(0, osp.dirname(__file__))
    from test_torch_oracle import _load_reference_rla

    rla_mod = _load_reference_rla()
    parts = _load_reference_detector()

    torch.manual_seed(3)
    backbone = rla_mod.RLA_ResNet(layers=LAYERS, norm_eval=False,
                                  frozen_stages=-1)
    backbone.flops = True
    neck = parts.FPN(in_channels=[256, 512, 1024, 2048], out_channels=256,
                     start_level=1, add_extra_convs="on_output",
                     num_outs=5, relu_before_extra_convs=True)
    head = parts.FCOSHead(
        num_classes=8, in_channels=256, stacked_convs=4, feat_channels=256,
        strides=[8, 16, 32, 64, 128], norm_on_bbox=True,
        centerness_on_reg=True, center_sampling=True, conv_bias=True,
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="GIoULoss", loss_weight=1.0),
        loss_centerness=dict(type="CrossEntropyLoss", use_sigmoid=True,
                             loss_weight=1.0))
    with torch.no_grad():
        # randomize every parameter and BN stat so the mapping is tested
        for m in (backbone, neck, head):
            for p in m.parameters():
                p.copy_(torch.randn_like(p) * 0.05)
            for name, buf in m.named_buffers():
                if name.endswith("running_mean"):
                    buf.copy_(torch.randn_like(buf) * 0.1)
                elif name.endswith("running_var"):
                    buf.copy_(torch.rand_like(buf) * 0.5 + 0.75)
    backbone.eval(), neck.eval(), head.eval()

    sd = {}
    for prefix, m in (("backbone", backbone), ("neck", neck),
                      ("bbox_head", head)):
        for k, v in m.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    path = tmp_path_factory.mktemp("ckpt") / "dsl_fcos_rand.pth"
    torch.save({"state_dict": sd}, str(path))

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, IMG, IMG).astype(np.float32)
    with torch.no_grad():
        feats = backbone(torch.from_numpy(x))
        fpn_outs = neck(feats)
        cls, reg, cent = head(fpn_outs)
    return dict(path=str(path), x=x,
                cls=[c.numpy() for c in cls],
                reg=[r.numpy() for r in reg],
                cent=[c.numpy() for c in cent])


def test_full_detector_import_forward_matches(oracle):
    """Our FCOS-RLA built from the flagship config shape reproduces the
    reference torch eval forward after ``load_torch_detector``."""
    import jax
    import jax.numpy as jnp

    from dsl_tpu.models import build_detector
    from dsl_tpu.models.detectors.single_stage import \
        init_detector_variables
    from dsl_tpu.utils.torch_import import load_torch_detector

    det = build_detector(dict(
        type="FCOS",
        backbone=dict(type="RLA_ResNet", layers=LAYERS, frozen_stages=-1,
                      norm_eval=True, style="pytorch"),
        neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                  out_channels=256, start_level=1,
                  add_extra_convs="on_output", num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(type="FCOSHead", num_classes=8, in_channels=256,
                       stacked_convs=4, feat_channels=256,
                       strides=[8, 16, 32, 64, 128], norm_on_bbox=True,
                       centerness_on_reg=True, center_sampling=True,
                       conv_bias=True),
        test_cfg=dict(score_thr=0.05, nms=dict(iou_threshold=0.6),
                      max_per_img=100)))
    variables = init_detector_variables(
        det, jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3),
                                              jnp.float32))
    variables = load_torch_detector(oracle["path"], variables)

    x_nhwc = jnp.asarray(oracle["x"].transpose(0, 2, 3, 1))
    cls, reg, cent = det.apply(variables, x_nhwc, training=False)
    for lvl in range(5):
        ref_cls = oracle["cls"][lvl].transpose(0, 2, 3, 1)
        ref_reg = oracle["reg"][lvl].transpose(0, 2, 3, 1)
        ref_cent = oracle["cent"][lvl].transpose(0, 2, 3, 1)
        np.testing.assert_allclose(
            np.asarray(cls[lvl]), ref_cls, rtol=1e-3, atol=2e-3,
            err_msg=f"cls level {lvl}")
        np.testing.assert_allclose(
            np.asarray(reg[lvl]), ref_reg, rtol=1e-3,
            atol=2e-3 * (8 * 2 ** lvl),   # stride-scaled units
            err_msg=f"reg level {lvl}")
        np.testing.assert_allclose(
            np.asarray(cent[lvl]).reshape(ref_cent.shape), ref_cent,
            rtol=1e-3, atol=2e-3, err_msg=f"cent level {lvl}")
