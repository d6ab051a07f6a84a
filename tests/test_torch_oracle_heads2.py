"""Torch oracles, tranche 2: CenterNet / FoveaBox / YOLOF / AutoAssign /
RepPoints / PAA losses against the reference's OWN code.

Same approach as ``test_torch_oracle_anchor_heads.py``: the reference's
actual head ``loss``/``get_targets`` (``/root/reference/mmdet/models/
dense_heads/*.py``) runs on CPU with its real loss modules, assigners,
coders and target utils loaded from the reference tree (mmcv + registries
stubbed), and our dense K-padded implementations must reproduce every loss
component to fp32 tolerance.

Skipped automatically when /root/reference or torch is unavailable.
"""

import os.path as osp
import sys
import types
from functools import partial

import numpy as np
import pytest

REF_ROOT = "/root/reference/mmdet"
REF_CENTERNET = osp.join(REF_ROOT, "models/dense_heads/centernet_head.py")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not osp.exists(REF_CENTERNET),
                                reason="reference tree not available")

NUM_CLASSES = 6
STRIDES = (8, 16, 32, 64, 128)
SIZES = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
IMG_HW = (128, 160)
K_GT = 8


def _load_reference_heads2():
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
        new_mods[name] = mod
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    # ---- mmcv stubs --------------------------------------------------------
    mmcv = _stub("mmcv")
    mmcv.jit = lambda **kw: (lambda f: f)
    mmcv.is_tuple_of = lambda seq, t: isinstance(seq, tuple) and all(
        isinstance(x, t) for x in seq)
    mmcv_cnn = _stub("mmcv.cnn")

    class Scale(nn.Module):
        def __init__(self, scale=1.0):
            super().__init__()
            self.scale = nn.Parameter(torch.tensor(float(scale)))

        def forward(self, x):
            return x * self.scale

    class ConvModule(nn.Module):
        """Constructible stand-in (towers never forwarded by loss oracles)."""

        def __init__(self, in_c, out_c, k=None, stride=1, padding=0,
                     conv_cfg=None, norm_cfg=None, bias="auto",
                     kernel_size=None, **kw):
            super().__init__()
            k = k if k is not None else (kernel_size or 3)
            self.conv = nn.Conv2d(in_c, out_c, k, stride, padding,
                                  bias=(bias if isinstance(bias, bool)
                                        else norm_cfg is None))

        def forward(self, x):
            return self.conv(x)

    mmcv_cnn.Scale = Scale
    mmcv_cnn.ConvModule = ConvModule
    mmcv_cnn.DepthwiseSeparableConvModule = ConvModule
    mmcv_cnn.normal_init = lambda *a, **k: None
    mmcv_cnn.constant_init = lambda *a, **k: None
    mmcv_cnn.is_norm = lambda m: False
    mmcv_cnn.bias_init_with_prob = lambda p: float(-np.log((1 - p) / p))
    mmcv_runner = _stub("mmcv.runner")
    mmcv_runner.force_fp32 = lambda **kw: (lambda f: f)

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

    class ModuleList(nn.ModuleList):
        def __init__(self, modules=None, init_cfg=None):
            super().__init__(modules)

    mmcv_runner.BaseModule = BaseModule
    mmcv_runner.ModuleList = ModuleList
    mmcv_ops = _stub("mmcv.ops")

    def _no_cuda(*a, **k):
        raise RuntimeError("CUDA op must not be reached on CPU")

    mmcv_ops.sigmoid_focal_loss = _no_cuda
    mmcv_ops.batched_nms = _no_cuda

    class DeformConv2d(nn.Module):
        """Constructible stand-in (loss-only oracles never forward it)."""

        def __init__(self, in_c, out_c, k, stride=1, padding=0,
                     dilation=1, **kw):
            super().__init__()
            self.weight = nn.Parameter(torch.zeros(out_c, in_c, k, k))

        def forward(self, x, offset):
            raise RuntimeError("not to be forwarded in the oracle")

    class CornerPool(nn.Module):
        def __init__(self, mode):
            super().__init__()
            self.mode = mode

        def forward(self, x):
            raise RuntimeError("not to be forwarded in the oracle")

    mmcv_ops.DeformConv2d = DeformConv2d
    mmcv_ops.CornerPool = CornerPool
    mmcv.cnn, mmcv.runner, mmcv.ops = mmcv_cnn, mmcv_runner, mmcv_ops

    # ---- registry / builder stubs ------------------------------------------
    class _Reg:
        def __init__(self):
            self.classes = {}

        def register_module(self, *a, **k):
            def deco(cls):
                self.classes[cls.__name__] = cls
                return cls
            return deco

    regs = {n: _Reg() for n in
            ("LOSSES", "HEADS", "PRIOR_GENERATORS", "BBOX_ASSIGNERS",
             "BBOX_SAMPLERS", "BBOX_CODERS", "IOU_CALCULATORS")}

    def _build(reg):
        def build(cfg, **kw):
            cfg = dict(cfg)
            return regs[reg].classes[cfg.pop("type")](**cfg, **kw)
        return build

    mm_utils = _stub("mmdet.utils")

    class NiceRepr:
        def __repr__(self):
            return self.__class__.__name__

    util_mixins = types.ModuleType("mmdet.utils.util_mixins")
    util_mixins.NiceRepr = NiceRepr
    mm_utils.util_mixins = util_mixins
    new_mods["mmdet.utils.util_mixins"] = util_mixins

    for pkg in ("refmm3", "refmm3.core", "refmm3.core.anchor",
                "refmm3.core.bbox", "refmm3.core.bbox.assigners",
                "refmm3.core.bbox.samplers", "refmm3.core.bbox.coder",
                "refmm3.core.bbox.iou_calculators", "refmm3.models",
                "refmm3.models.losses", "refmm3.models.utils",
                "refmm3.models.dense_heads"):
        _stub(pkg)
    anchor_builder = _stub("refmm3.core.anchor.builder")
    anchor_builder.PRIOR_GENERATORS = regs["PRIOR_GENERATORS"]
    anchor_builder.ANCHOR_GENERATORS = regs["PRIOR_GENERATORS"]
    bbox_builder = _stub("refmm3.core.bbox.builder")
    bbox_builder.BBOX_ASSIGNERS = regs["BBOX_ASSIGNERS"]
    bbox_builder.BBOX_SAMPLERS = regs["BBOX_SAMPLERS"]
    bbox_builder.BBOX_CODERS = regs["BBOX_CODERS"]
    iou_builder = _stub("refmm3.core.bbox.iou_calculators.builder")
    iou_builder.IOU_CALCULATORS = regs["IOU_CALCULATORS"]
    models_builder = _stub("refmm3.models.builder")
    models_builder.HEADS = regs["HEADS"]
    models_builder.LOSSES = regs["LOSSES"]
    models_builder.build_loss = _build("LOSSES")

    saved = {k: sys.modules.get(k)
             for k in set(new_mods) | {"mmdet", "mmdet.core", "mmdet.utils",
                                       "mmdet.utils.util_mixins",
                                       "mmdet.models", "mmdet.models.utils",
                                       "mmdet.models.dense_heads",
                                       "mmdet.models.dense_heads.fcos_head",
                                       "mmdet.models.dense_heads.atss_head",
                                       "mmdet.models.dense_heads.paa_head",
                                       "mmdet.core.bbox",
                                       "mmdet.core.bbox.iou_calculators",
                                       "mmdet.core.anchor",
                                       "mmdet.core.anchor.point_generator"}}
    sys.modules.update(new_mods)
    sys.modules["mmdet.utils"] = mm_utils
    try:
        iou2d = _load(
            "refmm3.core.bbox.iou_calculators.iou2d_calculator",
            osp.join(REF_ROOT,
                     "core/bbox/iou_calculators/iou2d_calculator.py"))
        iou_pkg = sys.modules["refmm3.core.bbox.iou_calculators"]
        iou_pkg.build_iou_calculator = _build("IOU_CALCULATORS")
        iou_pkg.bbox_overlaps = iou2d.bbox_overlaps

        transforms = _load("refmm3.core.bbox.transforms",
                           osp.join(REF_ROOT, "core/bbox/transforms.py"))
        anchor_utils = _load("refmm3.core.anchor.utils",
                             osp.join(REF_ROOT, "core/anchor/utils.py"))
        _load("refmm3.core.anchor.anchor_generator",
              osp.join(REF_ROOT, "core/anchor/anchor_generator.py"))
        point_gen = _load("refmm3.core.anchor.point_generator",
                          osp.join(REF_ROOT,
                                   "core/anchor/point_generator.py"))
        _load("refmm3.core.bbox.coder.base_bbox_coder",
              osp.join(REF_ROOT, "core/bbox/coder/base_bbox_coder.py"))
        _load("refmm3.core.bbox.coder.delta_xywh_bbox_coder",
              osp.join(REF_ROOT,
                       "core/bbox/coder/delta_xywh_bbox_coder.py"))
        _load("refmm3.core.bbox.assigners.base_assigner",
              osp.join(REF_ROOT, "core/bbox/assigners/base_assigner.py"))
        _load("refmm3.core.bbox.assigners.assign_result",
              osp.join(REF_ROOT, "core/bbox/assigners/assign_result.py"))
        _load("refmm3.core.bbox.assigners.max_iou_assigner",
              osp.join(REF_ROOT,
                       "core/bbox/assigners/max_iou_assigner.py"))
        _load("refmm3.core.bbox.assigners.atss_assigner",
              osp.join(REF_ROOT, "core/bbox/assigners/atss_assigner.py"))
        _load("refmm3.core.bbox.assigners.point_assigner",
              osp.join(REF_ROOT, "core/bbox/assigners/point_assigner.py"))
        _load("refmm3.core.bbox.assigners.uniform_assigner",
              osp.join(REF_ROOT,
                       "core/bbox/assigners/uniform_assigner.py"))
        _load("refmm3.core.bbox.samplers.sampling_result",
              osp.join(REF_ROOT, "core/bbox/samplers/sampling_result.py"))
        _load("refmm3.core.bbox.samplers.base_sampler",
              osp.join(REF_ROOT, "core/bbox/samplers/base_sampler.py"))
        _load("refmm3.core.bbox.samplers.pseudo_sampler",
              osp.join(REF_ROOT, "core/bbox/samplers/pseudo_sampler.py"))

        def multi_apply(func, *args, **kwargs):
            pfunc = partial(func, **kwargs) if kwargs else func
            return tuple(map(list, zip(*map(pfunc, *args))))

        def unmap(data, count, inds, fill=0):
            """core/utils/misc.py:32 semantics."""
            inds = inds.type(torch.bool)
            if data.dim() == 1:
                ret = data.new_full((count,), fill)
                ret[inds] = data
            else:
                ret = data.new_full((count,) + data.size()[1:], fill)
                ret[inds, :] = data
            return ret

        def reduce_mean(t):
            return t

        mmdet_core = types.ModuleType("mmdet.core")
        mmdet_core.bbox_overlaps = iou2d.bbox_overlaps
        mmdet_core.distance2bbox = transforms.distance2bbox
        mmdet_core.bbox2distance = transforms.bbox2distance
        mmdet_core.bbox_cxcywh_to_xyxy = transforms.bbox_cxcywh_to_xyxy
        mmdet_core.bbox_xyxy_to_cxcywh = transforms.bbox_xyxy_to_cxcywh
        mmdet_core.multi_apply = multi_apply
        mmdet_core.reduce_mean = reduce_mean
        mmdet_core.unmap = unmap
        mmdet_core.anchor_inside_flags = anchor_utils.anchor_inside_flags
        mmdet_core.images_to_levels = anchor_utils.images_to_levels
        mmdet_core.multiclass_nms = None
        mmdet_core.fast_nms = None
        mmdet_core.bbox_mapping_back = None
        mmdet_core.merge_aug_proposals = None
        mmdet_core.build_anchor_generator = _build("PRIOR_GENERATORS")
        mmdet_core.build_prior_generator = _build("PRIOR_GENERATORS")
        mmdet_core.build_assigner = _build("BBOX_ASSIGNERS")
        mmdet_core.build_sampler = _build("BBOX_SAMPLERS")
        mmdet_core.build_bbox_coder = _build("BBOX_CODERS")
        mmdet_core_bbox = types.ModuleType("mmdet.core.bbox")
        mmdet_core_bbox.__path__ = []
        mmdet_core_bbox.bbox_overlaps = iou2d.bbox_overlaps
        mmdet_core.bbox = mmdet_core_bbox
        mmdet_core_iouc = types.ModuleType(
            "mmdet.core.bbox.iou_calculators")
        mmdet_core_iouc.bbox_overlaps = iou2d.bbox_overlaps
        mmdet_core_bbox.iou_calculators = mmdet_core_iouc

        mmdet_mod = types.ModuleType("mmdet")
        mmdet_mod.core = mmdet_core
        mmdet_mod.utils = mm_utils
        sys.modules["mmdet"] = mmdet_mod
        sys.modules["mmdet.core"] = mmdet_core
        sys.modules["mmdet.core.bbox"] = mmdet_core_bbox
        sys.modules["mmdet.core.bbox.iou_calculators"] = mmdet_core_iouc

        # ---- losses --------------------------------------------------------
        _load("refmm3.models.losses.utils",
              osp.join(REF_ROOT, "models/losses/utils.py"))
        _load("refmm3.models.losses.accuracy",
              osp.join(REF_ROOT, "models/losses/accuracy.py"))
        _load("refmm3.models.losses.focal_loss",
              osp.join(REF_ROOT, "models/losses/focal_loss.py"))
        _load("refmm3.models.losses.iou_loss",
              osp.join(REF_ROOT, "models/losses/iou_loss.py"))
        _load("refmm3.models.losses.cross_entropy_loss",
              osp.join(REF_ROOT, "models/losses/cross_entropy_loss.py"))
        _load("refmm3.models.losses.smooth_l1_loss",
              osp.join(REF_ROOT, "models/losses/smooth_l1_loss.py"))
        _load("refmm3.models.losses.gaussian_focal_loss",
              osp.join(REF_ROOT, "models/losses/gaussian_focal_loss.py"))

        # ---- models/utils/gaussian_target (real) ---------------------------
        gt_mod = _load("refmm3.models.utils.gaussian_target",
                       osp.join(REF_ROOT, "models/utils/gaussian_target.py"))
        utils_pkg = sys.modules["refmm3.models.utils"]
        utils_pkg.gaussian_radius = gt_mod.gaussian_radius
        utils_pkg.gen_gaussian_target = gt_mod.gen_gaussian_target
        utils_pkg.gaussian_target = gt_mod

        # fake "mmdet.models" package exposing HEADS/build_loss + utils
        mmdet_models = types.ModuleType("mmdet.models")
        mmdet_models.HEADS = regs["HEADS"]
        mmdet_models.build_loss = models_builder.build_loss
        mmdet_models.utils = utils_pkg
        sys.modules["mmdet.models"] = mmdet_models
        sys.modules["mmdet.models.utils"] = utils_pkg
        mmdet_mod.models = mmdet_models

        # ---- dense heads ---------------------------------------------------
        _load("refmm3.models.dense_heads.base_dense_head",
              osp.join(REF_ROOT, "models/dense_heads/base_dense_head.py"))
        mixins = _stub("refmm3.models.dense_heads.dense_test_mixins")

        class BBoxTestMixin:
            pass

        mixins.BBoxTestMixin = BBoxTestMixin
        sys.modules["refmm3.models.dense_heads.dense_test_mixins"] = mixins

        centernet = _load("refmm3.models.dense_heads.centernet_head",
                          REF_CENTERNET)

        # fake AnchorFreeHead matching the real one's loss-relevant surface
        # (same stand-in as test_torch_oracle_anchor_heads.py — towers are
        # never forwarded by loss-only oracles)
        afh = types.ModuleType("refmm3.models.dense_heads.anchor_free_head")

        class AnchorFreeHead(sys.modules[
                "refmm3.models.dense_heads.base_dense_head"].BaseDenseHead):
            _version = 1

            def __init__(self, num_classes, in_channels, feat_channels=256,
                         stacked_convs=4, strides=(4, 8, 16, 32, 64),
                         dcn_on_last_conv=False, conv_bias="auto",
                         loss_cls=None, loss_bbox=None, bbox_coder=None,
                         conv_cfg=None, norm_cfg=None, train_cfg=None,
                         test_cfg=None, init_cfg=None, **kw):
                super().__init__()
                self.num_classes = num_classes
                self.cls_out_channels = num_classes
                self.in_channels = in_channels
                self.feat_channels = feat_channels
                self.stacked_convs = stacked_convs
                self.strides = strides
                self.dcn_on_last_conv = dcn_on_last_conv
                self.conv_bias = conv_bias
                self.conv_cfg = conv_cfg
                self.norm_cfg = norm_cfg
                self.train_cfg = train_cfg
                self.test_cfg = test_cfg
                self.fp16_enabled = False
                self.loss_cls = models_builder.build_loss(
                    loss_cls or dict(type="FocalLoss", use_sigmoid=True,
                                     gamma=2.0, alpha=0.25,
                                     loss_weight=1.0))
                self.loss_bbox = models_builder.build_loss(
                    loss_bbox or dict(type="IoULoss", loss_weight=1.0))
                self._init_layers()

            def _init_cls_convs(self):
                self.cls_convs = nn.ModuleList()

            def _init_reg_convs(self):
                self.reg_convs = nn.ModuleList()

            def _init_predictor(self):
                self.conv_cls = nn.Conv2d(self.feat_channels,
                                          self.cls_out_channels, 3,
                                          padding=1)
                self.conv_reg = nn.Conv2d(self.feat_channels, 4, 3,
                                          padding=1)

            def _init_layers(self):
                self._init_cls_convs()
                self._init_reg_convs()
                self._init_predictor()

            def _get_points_single(self, featmap_size, stride, dtype,
                                   device, flatten=False):
                h, w = featmap_size
                x_range = torch.arange(w, device=device).to(dtype)
                y_range = torch.arange(h, device=device).to(dtype)
                y, x = torch.meshgrid(y_range, x_range)
                if flatten:
                    y, x = y.flatten(), x.flatten()
                return y, x

            def get_points(self, featmap_sizes, dtype, device,
                           flatten=False):
                return [self._get_points_single(featmap_sizes[i],
                                                self.strides[i], dtype,
                                                device, flatten)
                        for i in range(len(featmap_sizes))]

        afh.AnchorFreeHead = AnchorFreeHead
        new_mods["refmm3.models.dense_heads.anchor_free_head"] = afh
        sys.modules["refmm3.models.dense_heads.anchor_free_head"] = afh

        fovea = _load("refmm3.models.dense_heads.fovea_head",
                      osp.join(REF_ROOT, "models/dense_heads/fovea_head.py"))

        _load("refmm3.models.dense_heads.anchor_head",
              osp.join(REF_ROOT, "models/dense_heads/anchor_head.py"))
        yolof = _load("refmm3.models.dense_heads.yolof_head",
                      osp.join(REF_ROOT, "models/dense_heads/yolof_head.py"))

        # autoassign/paa import `mmdet.models.dense_heads.{atss,fcos,paa}`
        # absolutely — load the real modules and alias them there
        _load("refmm3.models.losses.gfocal_loss",
              osp.join(REF_ROOT, "models/losses/gfocal_loss.py"))
        atss = _load("refmm3.models.dense_heads.atss_head",
                     osp.join(REF_ROOT, "models/dense_heads/atss_head.py"))
        fcos = _load("refmm3.models.dense_heads.fcos_head",
                     osp.join(REF_ROOT, "models/dense_heads/fcos_head.py"))
        dh_pkg = types.ModuleType("mmdet.models.dense_heads")
        dh_pkg.ATSSHead = atss.ATSSHead
        dh_pkg.FCOSHead = fcos.FCOSHead
        sys.modules["mmdet.models.dense_heads"] = dh_pkg
        sys.modules["mmdet.models.dense_heads.atss_head"] = atss
        sys.modules["mmdet.models.dense_heads.fcos_head"] = fcos
        paa = _load("refmm3.models.dense_heads.paa_head",
                    osp.join(REF_ROOT, "models/dense_heads/paa_head.py"))
        sys.modules["mmdet.models.dense_heads.paa_head"] = paa
        dh_pkg.PAAHead = paa.PAAHead
        autoassign = _load(
            "refmm3.models.dense_heads.autoassign_head",
            osp.join(REF_ROOT, "models/dense_heads/autoassign_head.py"))

        # reppoints imports mmdet.core.anchor.point_generator absolutely
        core_anchor_pkg = types.ModuleType("mmdet.core.anchor")
        core_anchor_pkg.point_generator = point_gen
        sys.modules["mmdet.core.anchor"] = core_anchor_pkg
        sys.modules["mmdet.core.anchor.point_generator"] = point_gen
        mmdet_core.anchor = core_anchor_pkg
        reppoints = _load(
            "refmm3.models.dense_heads.reppoints_head",
            osp.join(REF_ROOT, "models/dense_heads/reppoints_head.py"))

        _load("refmm3.models.losses.ae_loss",
              osp.join(REF_ROOT, "models/losses/ae_loss.py"))
        corner = _load("refmm3.models.dense_heads.corner_head",
                       osp.join(REF_ROOT,
                                "models/dense_heads/corner_head.py"))
        centripetal = _load(
            "refmm3.models.dense_heads.centripetal_head",
            osp.join(REF_ROOT, "models/dense_heads/centripetal_head.py"))

        yolact = _load("refmm3.models.dense_heads.yolact_head",
                       osp.join(REF_ROOT,
                                "models/dense_heads/yolact_head.py"))

        ns = types.SimpleNamespace(
            YOLACTHead=yolact.YOLACTHead,
            CornerHead=corner.CornerHead,
            CentripetalHead=centripetal.CentripetalHead,
            RepPointsHead=reppoints.RepPointsHead,
            CenterNetHead=centernet.CenterNetHead,
            FoveaHead=fovea.FoveaHead,
            YOLOFHead=yolof.YOLOFHead,
            PAAHead=paa.PAAHead,
            AutoAssignHead=autoassign.AutoAssignHead,
        )
        return ns
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def ref_mod():
    return _load_reference_heads2()


class _Cfg(dict):
    """mmcv-Config-style attribute access over a plain dict."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _random_gts(rng, gt_counts, min_wh=8.0):
    H, W = IMG_HW
    gts, gt_labels = [], []
    for n in gt_counts:
        x1 = rng.rand(n) * W * 0.6
        y1 = rng.rand(n) * H * 0.6
        bw = rng.rand(n) * (W * 0.4) + min_wh
        bh = rng.rand(n) * (H * 0.4) + min_wh
        gts.append(np.stack([x1, y1, np.minimum(x1 + bw, W - 1),
                             np.minimum(y1 + bh, H - 1)],
                            -1).astype(np.float32))
        gt_labels.append(rng.randint(0, NUM_CLASSES, size=n)
                         .astype(np.int64))
    return gts, gt_labels


def _pad_gts(gts, gt_labels, k=K_GT):
    b = len(gts)
    gt_b = np.zeros((b, k, 4), np.float32)
    gt_l = np.zeros((b, k), np.int32)
    gt_v = np.zeros((b, k), bool)
    for i, g in enumerate(gts):
        gt_b[i, :len(g)] = g
        gt_l[i, :len(g)] = gt_labels[i]
        gt_v[i, :len(g)] = True
    return gt_b, gt_l, gt_v


def test_centernet_loss_matches_reference(ref_mod):
    """CenterNet (``centernet_head.py:115-249``): gaussian-radius splatted
    heatmap + GaussianFocal with eq(1) peak counting, L1 wh (x0.1) and
    offset at integer centers, avg_factor doubling for the 2-channel
    maps — our lax.scan on-device target generation must match the
    reference's per-box python loop exactly."""
    B = 3
    rng = np.random.RandomState(5)
    fh, fw = IMG_HW[0] // 4, IMG_HW[1] // 4
    heat = rng.randn(B, NUM_CLASSES, fh, fw).astype(np.float32)
    wh = (rng.randn(B, 2, fh, fw) * 3).astype(np.float32)
    off = rng.randn(B, 2, fh, fw).astype(np.float32)
    gts, gt_labels = _random_gts(rng, [4, 1, 6])

    head = ref_mod.CenterNetHead(in_channel=16, feat_channel=16,
                                 num_classes=NUM_CLASSES)
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([torch.sigmoid(t(heat))], [t(wh)], [t(off)],
                        [t(g) for g in gts], [t(l) for l in gt_labels],
                        metas)
    ref = {k: float(v) for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.centernet_head import (CenterNetHead,
                                                           centernet_loss)

    our_head = CenterNetHead(num_classes=NUM_CLASSES)
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    ours = centernet_loss(
        our_head, (nhwc(heat), nhwc(wh), nhwc(off)),
        dict(images=jnp.zeros((B, *IMG_HW, 3)),
             gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_center_heatmap", "loss_wh", "loss_offset"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_fovea_loss_matches_reference(ref_mod):
    """FoveaBox (``fovea_head.py:134-231``): sqrt-area scale assignment,
    sigma-shrunk fovea paint in DESCENDING-area order (smaller overwrite),
    log-space side distances clamped [1/16, 16], focal cls with the shipped
    gamma 1.5 / alpha 0.4 avg'd by num_pos + num_imgs, smooth-L1 (beta 0.11)
    avg'd by num_pos."""
    B = 3
    rng = np.random.RandomState(19)
    cls = [rng.randn(B, NUM_CLASSES, h, w).astype(np.float32)
           for h, w in SIZES]
    bbox = [(rng.randn(B, 4, h, w) * 0.5).astype(np.float32)
            for h, w in SIZES]
    gts, gt_labels = _random_gts(rng, [4, 1, 6])

    scale_ranges = ((1, 64), (32, 128), (64, 256), (128, 512), (256, 2048))
    head = ref_mod.FoveaHead(
        num_classes=NUM_CLASSES, in_channels=32, stacked_convs=1,
        feat_channels=32, strides=list(STRIDES),
        base_edge_list=[16, 32, 64, 128, 256], scale_ranges=scale_ranges,
        sigma=0.4,
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=1.50,
                      alpha=0.4, loss_weight=1.0),
        loss_bbox=dict(type="SmoothL1Loss", beta=0.11, loss_weight=1.0))
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(b) for b in bbox],
                        [t(g) for g in gts], [t(l) for l in gt_labels],
                        metas)
    ref = {k: float(v) for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.fovea_head import FoveaHead, fovea_loss

    our_head = FoveaHead(
        num_classes=NUM_CLASSES, strides=STRIDES,
        scale_ranges=scale_ranges,
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=1.50,
                      alpha=0.4, loss_weight=1.0),
        loss_bbox=dict(type="SmoothL1Loss", beta=0.11, loss_weight=1.0))
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = fovea_loss(our_head, nhwc(cls), nhwc(bbox),
                      dict(gt_bboxes=jnp.asarray(gt_b),
                           gt_labels=jnp.asarray(gt_l),
                           gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_yolact_bbox_cls_loss_matches_reference(ref_mod):
    """YOLACT box branch (``yolact_head.py:137-303``): MaxIoU(0.5/0.4,
    gt_max_assign_all=False) assignment, per-image OHEM softmax-CE with
    exact 3:1 topk hard negatives (our dense threshold trick must equal
    it), smooth-L1 ×1.5 on deltas, both averaged by total num_pos."""
    B = 2
    rng = np.random.RandomState(59)
    na = 3
    cls = [rng.randn(B, na * (NUM_CLASSES + 1), h, w).astype(np.float32)
           for h, w in SIZES]
    bbox = [(rng.randn(B, na * 4, h, w) * 0.3).astype(np.float32)
            for h, w in SIZES]
    gts, gt_labels = _random_gts(rng, [3, 2], min_wh=10.0)

    head = ref_mod.YOLACTHead(
        num_classes=NUM_CLASSES, in_channels=32, feat_channels=32,
        num_head_convs=1, num_protos=8, use_ohem=True,
        anchor_generator=dict(type="AnchorGenerator", octave_base_scale=3,
                              scales_per_octave=1, ratios=[0.5, 1.0, 2.0],
                              strides=list(STRIDES)),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0] * 4,
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=False,
                      reduction="none", loss_weight=1.0),
        loss_bbox=dict(type="SmoothL1Loss", beta=1.0, loss_weight=1.5),
        train_cfg=_Cfg(assigner=dict(type="MaxIoUAssigner",
                                     pos_iou_thr=0.5, neg_iou_thr=0.4,
                                     min_pos_iou=0.0, ignore_iof_thr=-1,
                                     gt_max_assign_all=False),
                       smoothl1_beta=1.0, allowed_border=-1,
                       pos_weight=-1, neg_pos_ratio=3, debug=False))
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref, _ = head.loss([t(c) for c in cls], [t(b) for b in bbox],
                           [t(g) for g in gts], [t(l) for l in gt_labels],
                           metas)
    ref = {k: float(sum(float(x) for x in v) if isinstance(v, list) else v)
           for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.yolact_head import (YOLACTHead,
                                                        yolact_loss)

    our_head = YOLACTHead(num_classes=NUM_CLASSES, strides=STRIDES,
                          num_protos=8)
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    coeff = tuple(jnp.zeros((B, h, w, 3 * 8)) for h, w in SIZES)
    protos = jnp.zeros((B, 32, 40, 8))
    segm = jnp.zeros((B, 16, 20, NUM_CLASSES))
    ours = yolact_loss(
        our_head, (nhwc(cls), nhwc(bbox), coeff, protos, segm),
        dict(images=jnp.zeros((B, *IMG_HW, 3)),
             gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v),
             gt_mask_crops=jnp.zeros((B, K_GT, 16, 16)),
             gt_masks_full=None))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_corner_loss_matches_reference(ref_mod):
    """CornerNet (``corner_head.py:323-649`` + ``ae_loss.py``): per-class
    gaussian corner splats (radius over ceil'd scaled w/h), peak-counted
    GaussianFocal /2, class-agnostic-masked smooth-L1 offsets, AE pull/push
    (0.25 each, per-image 1/N and 1/N(N-1)) — across 2 supervision levels."""
    B = 2
    rng = np.random.RandomState(47)
    fh, fw = IMG_HW[0] // 4, IMG_HW[1] // 4
    n_lvl = 2

    def maps(c):
        return [rng.randn(B, c, fh, fw).astype(np.float32)
                for _ in range(n_lvl)]

    tl_h, br_h = maps(NUM_CLASSES), maps(NUM_CLASSES)
    tl_e, br_e = maps(1), maps(1)
    tl_o, br_o = maps(2), maps(2)
    gts, gt_labels = _random_gts(rng, [3, 2])

    head = ref_mod.CornerHead(
        num_classes=NUM_CLASSES, in_channels=16, num_feat_levels=n_lvl,
        corner_emb_channels=1,
        loss_heatmap=dict(type="GaussianFocalLoss", alpha=2.0, gamma=4.0,
                          loss_weight=1.0),
        loss_embedding=dict(type="AssociativeEmbeddingLoss",
                            pull_weight=0.25, push_weight=0.25),
        loss_offset=dict(type="SmoothL1Loss", beta=1.0, loss_weight=1.0),
        train_cfg=None, test_cfg=None)
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([t(x) for x in tl_h], [t(x) for x in br_h],
                        [t(x) for x in tl_e], [t(x) for x in br_e],
                        [t(x) for x in tl_o], [t(x) for x in br_o],
                        [t(g) for g in gts], [t(l) for l in gt_labels],
                        metas)
    ref = {k: float(sum(float(x) for x in v) if isinstance(v, list) else v)
           for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.corner_head import (CornerHead,
                                                        corner_loss)

    our_head = CornerHead(num_classes=NUM_CLASSES, num_feat_levels=n_lvl)
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = corner_loss(
        our_head,
        (nhwc(tl_h), nhwc(br_h), nhwc(tl_e), nhwc(br_e), nhwc(tl_o),
         nhwc(br_o)),
        dict(images=jnp.zeros((B, *IMG_HW, 3)),
             gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("det_loss", "pull_loss", "push_loss", "off_loss"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_centripetal_loss_matches_reference(ref_mod):
    """CentripetalNet (``centripetal_head.py:loss_single``): corner det/
    offset as CornerNet plus guiding-shift (x0.05) and log-centripetal
    (x1.0) smooth-L1 at corner pixels."""
    B = 2
    rng = np.random.RandomState(53)
    fh, fw = IMG_HW[0] // 4, IMG_HW[1] // 4
    n_lvl = 2

    def maps(c):
        return [rng.randn(B, c, fh, fw).astype(np.float32)
                for _ in range(n_lvl)]

    tl_h, br_h = maps(NUM_CLASSES), maps(NUM_CLASSES)
    tl_o, br_o = maps(2), maps(2)
    tl_g, br_g = maps(2), maps(2)
    tl_c, br_c = maps(2), maps(2)
    gts, gt_labels = _random_gts(rng, [3, 2])

    head = ref_mod.CentripetalHead(
        num_classes=NUM_CLASSES, in_channels=16, num_feat_levels=n_lvl,
        corner_emb_channels=0,
        loss_heatmap=dict(type="GaussianFocalLoss", alpha=2.0, gamma=4.0,
                          loss_weight=1.0),
        loss_offset=dict(type="SmoothL1Loss", beta=1.0, loss_weight=1.0),
        loss_guiding_shift=dict(type="SmoothL1Loss", beta=1.0,
                                loss_weight=0.05),
        loss_centripetal_shift=dict(type="SmoothL1Loss", beta=1.0,
                                    loss_weight=1.0),
        train_cfg=None, test_cfg=None)
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([t(x) for x in tl_h], [t(x) for x in br_h],
                        [t(x) for x in tl_o], [t(x) for x in br_o],
                        [t(x) for x in tl_g], [t(x) for x in br_g],
                        [t(x) for x in tl_c], [t(x) for x in br_c],
                        [t(g) for g in gts], [t(l) for l in gt_labels],
                        metas)
    ref = {k: float(sum(float(x) for x in v) if isinstance(v, list) else v)
           for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.corner_head import (CentripetalHead,
                                                        centripetal_loss)

    our_head = CentripetalHead(num_classes=NUM_CLASSES,
                               num_feat_levels=n_lvl)
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = centripetal_loss(
        our_head,
        (nhwc(tl_h), nhwc(br_h), nhwc(tl_o), nhwc(br_o), nhwc(tl_g),
         nhwc(br_g), nhwc(tl_c), nhwc(br_c)),
        dict(images=jnp.zeros((B, *IMG_HW, 3)),
             gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    pairs = {"det_loss": "det_loss", "off_loss": "off_loss",
             "guiding_loss": "guiding_loss",
             "centripetal_loss": "centripetal_loss"}
    for ok, rk in pairs.items():
        np.testing.assert_allclose(
            ours[ok], ref[rk], rtol=5e-5, atol=1e-6,
            err_msg=f"{ok}: ours={ours[ok]} ref={ref[rk]}")


def test_reppoints_loss_matches_reference(ref_mod):
    """RepPoints (``reppoints_head.py:519-651``): offset-0 points,
    PointAssigner (scale-matched level, nearest-point with conflict-to-
    closer-gt) for the init stage, MaxIoU(0.5/0.4) on init-decoded boxes
    for refine, moment transform with torch's UNBIASED std, stride-
    normalized smooth-L1 (β0.11, ×0.5 init / ×1.0 refine) averaged by
    num_pos, focal cls averaged by refine num_pos."""
    B = 2
    rng = np.random.RandomState(43)
    n2 = 18
    cls = [rng.randn(B, NUM_CLASSES, h, w).astype(np.float32)
           for h, w in SIZES]
    p_init = [(rng.randn(B, n2, h, w) * 0.5).astype(np.float32)
              for h, w in SIZES]
    p_refine = [(rng.randn(B, n2, h, w) * 0.5).astype(np.float32)
                for h, w in SIZES]
    gts, gt_labels = _random_gts(rng, [4, 2])
    moment = (rng.randn(2) * 0.2).astype(np.float32)

    head = ref_mod.RepPointsHead(
        num_classes=NUM_CLASSES, in_channels=32, feat_channels=32,
        point_feat_channels=32, stacked_convs=1, num_points=9,
        point_strides=list(STRIDES), point_base_scale=4,
        transform_method="moment",
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox_init=dict(type="SmoothL1Loss", beta=0.11,
                            loss_weight=0.5),
        loss_bbox_refine=dict(type="SmoothL1Loss", beta=0.11,
                              loss_weight=1.0),
        train_cfg=_Cfg(
            init=_Cfg(assigner=dict(type="PointAssigner", scale=4,
                                    pos_num=1),
                      allowed_border=-1, pos_weight=-1, debug=False),
            refine=_Cfg(assigner=dict(type="MaxIoUAssigner",
                                      pos_iou_thr=0.5, neg_iou_thr=0.4,
                                      min_pos_iou=0, ignore_iof_thr=-1),
                        allowed_border=-1, pos_weight=-1, debug=False)))
    with torch.no_grad():
        head.moment_transfer.copy_(torch.from_numpy(moment))
    # valid_flags defaults to device='cuda' inside get_points
    _orig_vf = head.point_generator.valid_flags
    head.point_generator.valid_flags = (
        lambda fs, pad, device="cpu": _orig_vf(fs, pad, device="cpu"))
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(p) for p in p_init],
                        [t(p) for p in p_refine], [t(g) for g in gts],
                        [t(l) for l in gt_labels], metas)
    ref = {k: float(sum(v) if isinstance(v, list) else v)
           for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.reppoints_head import (RepPointsHead,
                                                           reppoints_loss)

    our_head = RepPointsHead(num_classes=NUM_CLASSES, strides=STRIDES)
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = reppoints_loss(
        our_head,
        (nhwc(cls), nhwc(p_init), nhwc(p_refine), jnp.asarray(moment)),
        dict(gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_pts_init", "loss_pts_refine"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_paa_loss_matches_reference(ref_mod):
    """PAA (``paa_head.py:85-407``): MaxIoU(0.1) candidates, joint
    focal+GIoU loss scoring, per-level topk pooling, sklearn GaussianMixture
    reassignment with separation scheme (c) — our fixed-iteration
    sklearn-replica EM must produce the same discrete positive set, and all
    three losses (focal/max(num_pos,B), IoU-weighted GIoU/Σiou,
    BCE×0.5/num_pos) must match."""
    pytest.importorskip("sklearn")
    B = 2
    rng = np.random.RandomState(41)
    cls = [rng.randn(B, NUM_CLASSES, h, w).astype(np.float32)
           for h, w in SIZES]
    bbox = [(rng.randn(B, 4, h, w) * 0.5).astype(np.float32)
            for h, w in SIZES]
    iou = [rng.randn(B, 1, h, w).astype(np.float32) for h, w in SIZES]
    gts, gt_labels = _random_gts(rng, [3, 2])

    head = ref_mod.PAAHead(
        num_classes=NUM_CLASSES, in_channels=32, stacked_convs=1,
        feat_channels=32, topk=9, covariance_type="diag",
        reg_decoded_bbox=True,
        anchor_generator=dict(type="AnchorGenerator", ratios=[1.0],
                              octave_base_scale=8, scales_per_octave=1,
                              strides=list(STRIDES)),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0] * 4,
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="GIoULoss", loss_weight=1.3),
        loss_centerness=dict(type="CrossEntropyLoss", use_sigmoid=True,
                             loss_weight=0.5),
        train_cfg=_Cfg(assigner=dict(type="MaxIoUAssigner",
                                     pos_iou_thr=0.1, neg_iou_thr=0.1,
                                     min_pos_iou=0, ignore_iof_thr=-1),
                       allowed_border=-1, pos_weight=-1, debug=False))
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(b) for b in bbox],
                        [t(i) for i in iou], [t(g) for g in gts],
                        [t(l) for l in gt_labels], metas)
    ref = {k: float(sum(v) if isinstance(v, list) else v)
           for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.paa_head import PAAHead, paa_loss

    our_head = PAAHead(num_classes=NUM_CLASSES, strides=STRIDES)
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = paa_loss(our_head, nhwc(cls), nhwc(bbox), nhwc(iou),
                    dict(gt_bboxes=jnp.asarray(gt_b),
                         gt_labels=jnp.asarray(gt_l),
                         gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox", "loss_iou"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_autoassign_loss_matches_reference(ref_mod):
    """AutoAssign (``autoassign_head.py:120-440``): learnable CenterPrior
    gaussians over stride-normalized offsets at offset-0 points, strict
    inside-gt test, exp(3p)-weighted positive bags / num_gt, IoU-decayed
    per-gt-normalized negative weights with last-gt-wins class scatter,
    prior-sum-normalized negative focal, center-prior regularizer."""
    B = 2
    rng = np.random.RandomState(37)
    cls = [rng.randn(B, NUM_CLASSES, h, w).astype(np.float32)
           for h, w in SIZES]
    # positive pixel-space distances (post relu x stride)
    bbox = [(rng.rand(B, 4, h, w) * 40 + 1).astype(np.float32)
            for h, w in SIZES]
    obj = [rng.randn(B, 1, h, w).astype(np.float32) for h, w in SIZES]
    gts, gt_labels = _random_gts(rng, [3, 2], min_wh=12.0)
    # random (non-default) center prior parameters exercise the gaussian
    p_mean = (rng.randn(NUM_CLASSES, 2) * 0.3).astype(np.float32)
    p_sigma = (rng.rand(NUM_CLASSES, 2) * 1.5 + 0.5).astype(np.float32)

    head = ref_mod.AutoAssignHead(
        num_classes=NUM_CLASSES, in_channels=32, stacked_convs=1,
        feat_channels=32, strides=list(STRIDES),
        loss_bbox=dict(type="GIoULoss", loss_weight=5.0),
        train_cfg=None, test_cfg=None)
    with torch.no_grad():
        head.center_prior.mean.copy_(torch.from_numpy(p_mean))
        head.center_prior.sigma.copy_(torch.from_numpy(p_sigma))
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(b) for b in bbox],
                        [t(o) for o in obj], [t(g) for g in gts],
                        [t(l) for l in gt_labels], metas)
    ref = {k: float(sum(v) if isinstance(v, list) else v)
           for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.autoassign_head import (AutoAssignHead,
                                                            autoassign_loss)

    our_head = AutoAssignHead(num_classes=NUM_CLASSES, strides=STRIDES)
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = autoassign_loss(
        our_head,
        (nhwc(cls), nhwc(bbox), nhwc(obj),
         (jnp.asarray(p_mean), jnp.asarray(p_sigma))),
        dict(gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_pos", "loss_neg", "loss_center"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_yolof_loss_matches_reference(ref_mod):
    """YOLOF (``yolof_head.py:134-344`` + ``uniform_assigner.py``): uniform
    matching with cxcywh cdist over BOTH ctr-clamp-decoded predictions and
    anchors, anchor-IoU pos-ignore, pred-IoU neg-ignore, last-wins label
    scatter in the reference's candidate order, GIoU over the duplicated
    candidate list averaged by unique positives."""
    B = 2
    rng = np.random.RandomState(29)
    na = 5
    fh, fw = 4, 5                      # stride 32 on a 128x160 image
    cls = [rng.randn(B, na * NUM_CLASSES, fh, fw).astype(np.float32)]
    bbox = [(rng.randn(B, na * 4, fh, fw) * 0.5).astype(np.float32)]
    gts, gt_labels = _random_gts(rng, [3, 2], min_wh=12.0)

    head = ref_mod.YOLOFHead(
        num_classes=NUM_CLASSES, in_channels=32,
        anchor_generator=dict(type="AnchorGenerator", ratios=[1.0],
                              scales=[1, 2, 4, 8, 16], strides=[32]),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0, 0.0, 0.0, 0.0],
                        target_stds=[1.0, 1.0, 1.0, 1.0],
                        add_ctr_clamp=True, ctr_clamp=32),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="GIoULoss", loss_weight=1.0),
        train_cfg=_Cfg(assigner=dict(type="UniformAssigner",
                                     pos_ignore_thr=0.15,
                                     neg_ignore_thr=0.7, match_times=4),
                       allowed_border=-1, pos_weight=-1, debug=False))
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(b) for b in bbox],
                        [t(g) for g in gts], [t(l) for l in gt_labels],
                        metas)
    ref = {k: float(sum(v) if isinstance(v, list) else v)
           for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.yolof_head import YOLOFHead, yolof_loss

    our_head = YOLOFHead(num_classes=NUM_CLASSES, strides=(32,),
                         anchor_scales=(1, 2, 4, 8, 16))
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = yolof_loss(our_head, nhwc(cls), nhwc(bbox),
                      dict(gt_bboxes=jnp.asarray(gt_b),
                           gt_labels=jnp.asarray(gt_l),
                           gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_paa_score_voting_matches_reference(ref_mod):
    """PAA score voting (``paa_head.py:608-674``): each post-NMS box becomes
    the exp(-(1-iou)^2/0.025)*score weighted mean of same-class candidates
    with IoU > 0.01. The reference re-groups outputs by class; we keep det
    order — compare as (label, score)-sorted sets."""
    import types as _types

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.paa_head import paa_score_voting

    rng = np.random.RandomState(21)
    c, p, d = 3, 40, 8
    x1 = rng.uniform(0, 60, p)
    y1 = rng.uniform(0, 60, p)
    mlvl_boxes = np.stack([x1, y1, x1 + rng.uniform(5, 30, p),
                           y1 + rng.uniform(5, 30, p)], 1).astype(np.float32)
    mlvl_scores = rng.rand(p, c).astype(np.float32)
    det_idx = rng.choice(p, d, replace=False)
    det_scores = rng.rand(d).astype(np.float32)
    det_bboxes = np.concatenate(
        [mlvl_boxes[det_idx], det_scores[:, None]], 1)
    det_labels = rng.randint(0, c, d).astype(np.int64)

    ref_self = _types.SimpleNamespace(cls_out_channels=c)
    ref_b, ref_l = ref_mod.PAAHead.score_voting(
        ref_self, torch.from_numpy(det_bboxes),
        torch.from_numpy(det_labels), torch.from_numpy(mlvl_boxes),
        torch.from_numpy(mlvl_scores), 0.1)

    voted = np.asarray(paa_score_voting(
        jnp.asarray(det_bboxes), jnp.asarray(det_labels),
        jnp.ones(d, bool), jnp.asarray(mlvl_boxes),
        jnp.asarray(mlvl_scores), 0.1))
    ours = np.concatenate([voted, det_bboxes[:, 4:5]], 1)

    def _key(arr, labels):
        order = np.lexsort((arr[:, 4], labels))
        return arr[order], labels[order]

    ro, rl = _key(ref_b.numpy(), ref_l.numpy())
    oo, ol = _key(ours, det_labels)
    np.testing.assert_array_equal(ol, rl)
    np.testing.assert_allclose(oo, ro, rtol=1e-4, atol=1e-4)
