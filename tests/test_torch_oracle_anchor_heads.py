"""Torch oracles for the anchor-tier (ATSS/GFL/Retina) losses against the reference's OWN code.

Extends the FCOS-oracle approach (``test_torch_oracle_fcos.py``) to the
anchor tier: the reference's actual ``ATSSHead.loss`` / ``get_targets``
(``/root/reference/mmdet/models/dense_heads/atss_head.py``) runs on CPU
with its real ``AnchorHead`` parent, ``AnchorGenerator``,
``DeltaXYWHBBoxCoder``, ``ATSSAssigner``, ``PseudoSampler``, anchor utils
and loss modules all loaded from the reference tree (mmcv + registries
stubbed), and our dense ``atss_loss`` must reproduce every component to
fp32 tolerance. Pins: anchor grids, ATSS candidate selection (topk center
distance + mean+std IoU threshold + inside-gt), delta decode, centerness
targets, GIoU x2.0 weighting, focal cls.

Skipped automatically when /root/reference or torch is unavailable.
"""

import os.path as osp
import sys
import types
from functools import partial

import numpy as np
import pytest

REF_ROOT = "/root/reference/mmdet"
REF_ATSS = osp.join(REF_ROOT, "models/dense_heads/atss_head.py")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not osp.exists(REF_ATSS),
                                reason="reference tree not available")

NUM_CLASSES = 6
STRIDES = (8, 16, 32, 64, 128)
SIZES = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
IMG_HW = (128, 160)
K_GT = 8


def _load_reference_anchor_tier():
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
        """Constructible stand-in (towers are never forwarded by the
        loss-only oracle)."""

        def __init__(self, in_c, out_c, k, stride=1, padding=0,
                     conv_cfg=None, norm_cfg=None, bias="auto", **kw):
            super().__init__()
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
    mmcv_cnn.bias_init_with_prob = lambda p: float(
        -np.log((1 - p) / p))
    mmcv_runner = _stub("mmcv.runner")
    mmcv_runner.force_fp32 = lambda **kw: (lambda f: f)

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

    mmcv_runner.BaseModule = BaseModule
    mmcv_ops = _stub("mmcv.ops")

    def _no_cuda(*a, **k):
        raise RuntimeError("CUDA op must not be reached on CPU")

    mmcv_ops.sigmoid_focal_loss = _no_cuda

    class DeformConv2d(nn.Module):
        """Constructible stand-in (loss-only oracles never forward it)."""

        def __init__(self, in_c, out_c, k, stride=1, padding=0,
                     dilation=1, **kw):
            super().__init__()
            self.weight = nn.Parameter(torch.zeros(out_c, in_c, k, k))

        def forward(self, x, offset):
            raise RuntimeError("not to be forwarded in the oracle")

    mmcv_ops.DeformConv2d = DeformConv2d
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

    # fake mmdet.utils.util_mixins (NiceRepr base used by results classes)
    mm_utils = _stub("mmdet.utils")

    class NiceRepr:
        def __repr__(self):
            return self.__class__.__name__

    util_mixins = types.ModuleType("mmdet.utils.util_mixins")
    util_mixins.NiceRepr = NiceRepr
    mm_utils.util_mixins = util_mixins
    new_mods["mmdet.utils.util_mixins"] = util_mixins

    # fake package scaffolding for relative imports
    for pkg in ("refmm2", "refmm2.core", "refmm2.core.anchor",
                "refmm2.core.bbox", "refmm2.core.bbox.assigners",
                "refmm2.core.bbox.samplers", "refmm2.core.bbox.coder",
                "refmm2.core.bbox.iou_calculators", "refmm2.models",
                "refmm2.models.losses", "refmm2.models.dense_heads"):
        _stub(pkg)
    anchor_builder = _stub("refmm2.core.anchor.builder")
    anchor_builder.PRIOR_GENERATORS = regs["PRIOR_GENERATORS"]
    anchor_builder.ANCHOR_GENERATORS = regs["PRIOR_GENERATORS"]
    bbox_builder = _stub("refmm2.core.bbox.builder")
    bbox_builder.BBOX_ASSIGNERS = regs["BBOX_ASSIGNERS"]
    bbox_builder.BBOX_SAMPLERS = regs["BBOX_SAMPLERS"]
    bbox_builder.BBOX_CODERS = regs["BBOX_CODERS"]
    iou_builder = _stub("refmm2.core.bbox.iou_calculators.builder")
    iou_builder.IOU_CALCULATORS = regs["IOU_CALCULATORS"]
    models_builder = _stub("refmm2.models.builder")
    models_builder.HEADS = regs["HEADS"]
    models_builder.LOSSES = regs["LOSSES"]
    models_builder.build_loss = _build("LOSSES")

    saved = {k: sys.modules.get(k)
             for k in set(new_mods) | {"mmdet", "mmdet.core",
                                       "mmdet.utils",
                                       "mmdet.utils.util_mixins"}}
    sys.modules.update(new_mods)
    sys.modules["mmdet.utils"] = mm_utils
    try:
        iou2d = _load(
            "refmm2.core.bbox.iou_calculators.iou2d_calculator",
            osp.join(REF_ROOT,
                     "core/bbox/iou_calculators/iou2d_calculator.py"))
        # iou_calculators package re-export used by atss_assigner
        iou_pkg = sys.modules["refmm2.core.bbox.iou_calculators"]
        iou_pkg.build_iou_calculator = _build("IOU_CALCULATORS")

        transforms = _load("refmm2.core.bbox.transforms",
                           osp.join(REF_ROOT, "core/bbox/transforms.py"))
        anchor_utils = _load("refmm2.core.anchor.utils",
                             osp.join(REF_ROOT, "core/anchor/utils.py"))
        anchor_gen = _load("refmm2.core.anchor.anchor_generator",
                           osp.join(REF_ROOT,
                                    "core/anchor/anchor_generator.py"))
        _load("refmm2.core.bbox.coder.base_bbox_coder",
              osp.join(REF_ROOT, "core/bbox/coder/base_bbox_coder.py"))
        _load("refmm2.core.bbox.coder.delta_xywh_bbox_coder",
              osp.join(REF_ROOT,
                       "core/bbox/coder/delta_xywh_bbox_coder.py"))
        _load("refmm2.core.bbox.assigners.base_assigner",
              osp.join(REF_ROOT, "core/bbox/assigners/base_assigner.py"))
        _load("refmm2.core.bbox.assigners.assign_result",
              osp.join(REF_ROOT, "core/bbox/assigners/assign_result.py"))
        _load("refmm2.core.bbox.assigners.atss_assigner",
              osp.join(REF_ROOT, "core/bbox/assigners/atss_assigner.py"))
        _load("refmm2.core.bbox.assigners.max_iou_assigner",
              osp.join(REF_ROOT,
                       "core/bbox/assigners/max_iou_assigner.py"))
        _load("refmm2.core.bbox.samplers.sampling_result",
              osp.join(REF_ROOT, "core/bbox/samplers/sampling_result.py"))
        _load("refmm2.core.bbox.samplers.base_sampler",
              osp.join(REF_ROOT, "core/bbox/samplers/base_sampler.py"))
        _load("refmm2.core.bbox.samplers.pseudo_sampler",
              osp.join(REF_ROOT, "core/bbox/samplers/pseudo_sampler.py"))

        def multi_apply(func, *args, **kwargs):
            pfunc = partial(func, **kwargs) if kwargs else func
            return tuple(map(list, zip(*map(pfunc, *args))))

        mmdet_core = types.ModuleType("mmdet.core")
        mmdet_core.bbox_overlaps = iou2d.bbox_overlaps
        mmdet_core.distance2bbox = transforms.distance2bbox
        mmdet_core.bbox2distance = transforms.bbox2distance
        mmdet_core.bbox_mapping_back = None
        mmdet_core.merge_aug_proposals = None
        mmdet_core.multiclass_nms = None
        mmdet_core.multi_apply = multi_apply
        mmdet_core.reduce_mean = lambda t: t
        mmdet_core.anchor_inside_flags = anchor_utils.anchor_inside_flags
        mmdet_core.images_to_levels = anchor_utils.images_to_levels
        def unmap(data, count, inds, fill=0):
            """core/utils/misc.py:32 semantics (tiny scatter util; the
            heavy misc.py module drags in mask structures)."""
            inds = inds.type(torch.bool)
            if data.dim() == 1:
                ret = data.new_full((count,), fill)
                ret[inds] = data
            else:
                ret = data.new_full((count,) + data.size()[1:], fill)
                ret[inds, :] = data
            return ret

        mmdet_core.unmap = unmap
        mmdet_core.build_anchor_generator = _build("PRIOR_GENERATORS")
        mmdet_core.build_assigner = _build("BBOX_ASSIGNERS")
        mmdet_core.build_sampler = _build("BBOX_SAMPLERS")
        mmdet_core.build_bbox_coder = _build("BBOX_CODERS")
        mmdet_core.build_prior_generator = _build("PRIOR_GENERATORS")
        mmdet_mod = types.ModuleType("mmdet")
        mmdet_mod.core = mmdet_core
        mmdet_mod.utils = mm_utils
        sys.modules["mmdet"] = mmdet_mod
        sys.modules["mmdet.core"] = mmdet_core

        _load("refmm2.models.losses.utils",
              osp.join(REF_ROOT, "models/losses/utils.py"))
        _load("refmm2.models.losses.focal_loss",
              osp.join(REF_ROOT, "models/losses/focal_loss.py"))
        _load("refmm2.models.losses.iou_loss",
              osp.join(REF_ROOT, "models/losses/iou_loss.py"))
        _load("refmm2.models.losses.cross_entropy_loss",
              osp.join(REF_ROOT, "models/losses/cross_entropy_loss.py"))

        # base_dense_head is real; dense_test_mixins stubbed (aug-test only)
        _load("refmm2.models.dense_heads.base_dense_head",
              osp.join(REF_ROOT, "models/dense_heads/base_dense_head.py"))
        mixins = _stub("refmm2.models.dense_heads.dense_test_mixins")

        class BBoxTestMixin:
            pass

        mixins.BBoxTestMixin = BBoxTestMixin
        sys.modules["refmm2.models.dense_heads.dense_test_mixins"] = mixins

        _load("refmm2.models.losses.gfocal_loss",
              osp.join(REF_ROOT, "models/losses/gfocal_loss.py"))
        _load("refmm2.models.losses.smooth_l1_loss",
              osp.join(REF_ROOT, "models/losses/smooth_l1_loss.py"))
        _load("refmm2.models.dense_heads.anchor_head",
              osp.join(REF_ROOT, "models/dense_heads/anchor_head.py"))
        atss = _load("refmm2.models.dense_heads.atss_head", REF_ATSS)
        gfl = _load("refmm2.models.dense_heads.gfl_head",
                    osp.join(REF_ROOT, "models/dense_heads/gfl_head.py"))
        retina = _load("refmm2.models.dense_heads.retina_head",
                       osp.join(REF_ROOT,
                                "models/dense_heads/retina_head.py"))
        # ssd_head does `from ..losses import smooth_l1_loss`
        sl1 = sys.modules["refmm2.models.losses.smooth_l1_loss"]
        sys.modules["refmm2.models.losses"].smooth_l1_loss = \
            sl1.smooth_l1_loss
        ssd = _load("refmm2.models.dense_heads.ssd_head",
                    osp.join(REF_ROOT, "models/dense_heads/ssd_head.py"))
        _load("refmm2.models.losses.varifocal_loss",
              osp.join(REF_ROOT, "models/losses/varifocal_loss.py"))
        # vfnet inherits ATSSHead + FCOSHead; fcos_head needs anchor_free
        afh = types.ModuleType(
            "refmm2.models.dense_heads.anchor_free_head")

        class AnchorFreeHead(sys.modules[
                "refmm2.models.dense_heads.base_dense_head"].BaseDenseHead):
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
                # real AnchorFreeHead defaults (vfnet calls
                # super(FCOSHead, self).__init__ without loss kwargs and
                # rebuilds its own losses afterwards)
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
        new_mods["refmm2.models.dense_heads.anchor_free_head"] = afh
        sys.modules["refmm2.models.dense_heads.anchor_free_head"] = afh
        _load("refmm2.models.dense_heads.fcos_head",
              osp.join(REF_ROOT, "models/dense_heads/fcos_head.py"))
        vfnet = _load("refmm2.models.dense_heads.vfnet_head",
                      osp.join(REF_ROOT,
                               "models/dense_heads/vfnet_head.py"))
        _load("refmm2.core.bbox.assigners.grid_assigner",
              osp.join(REF_ROOT, "core/bbox/assigners/grid_assigner.py"))
        _load("refmm2.core.bbox.coder.yolo_bbox_coder",
              osp.join(REF_ROOT, "core/bbox/coder/yolo_bbox_coder.py"))
        _load("refmm2.models.losses.mse_loss",
              osp.join(REF_ROOT, "models/losses/mse_loss.py"))
        yolo = _load("refmm2.models.dense_heads.yolo_head",
                     osp.join(REF_ROOT, "models/dense_heads/yolo_head.py"))
        fa = _load("refmm2.models.dense_heads.free_anchor_retina_head",
                   osp.join(REF_ROOT,
                            "models/dense_heads/free_anchor_retina_head.py"))
        _load("refmm2.models.losses.accuracy",
              osp.join(REF_ROOT, "models/losses/accuracy.py"))
        _load("refmm2.core.bbox.assigners.center_region_assigner",
              osp.join(REF_ROOT,
                       "core/bbox/assigners/center_region_assigner.py"))
        _load("refmm2.core.bbox.coder.tblr_bbox_coder",
              osp.join(REF_ROOT, "core/bbox/coder/tblr_bbox_coder.py"))
        fsaf = _load("refmm2.models.dense_heads.fsaf_head",
                     osp.join(REF_ROOT,
                              "models/dense_heads/fsaf_head.py"))
        ns = types.SimpleNamespace(ATSSHead=atss.ATSSHead,
                                   GFLHead=gfl.GFLHead,
                                   RetinaHead=retina.RetinaHead,
                                   SSDHead=ssd.SSDHead,
                                   VFNetHead=vfnet.VFNetHead,
                                   YOLOV3Head=yolo.YOLOV3Head,
                                   FreeAnchorRetinaHead=
                                   fa.FreeAnchorRetinaHead,
                                   FSAFHead=fsaf.FSAFHead)
        return ns
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def ref_mod():
    return _load_reference_anchor_tier()


class _Cfg(dict):
    """mmcv-Config-style attribute access over a plain dict."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _make_inputs(batch, seed, gt_counts):
    rng = np.random.RandomState(seed)
    cls = [rng.randn(batch, NUM_CLASSES, h, w).astype(np.float32)
           for h, w in SIZES]
    bbox = [(rng.randn(batch, 4, h, w) * 0.5).astype(np.float32)
            for h, w in SIZES]
    cent = [rng.randn(batch, 1, h, w).astype(np.float32) for h, w in SIZES]
    H, W = IMG_HW

    def _boxes(n):
        x1 = rng.rand(n) * W * 0.6
        y1 = rng.rand(n) * H * 0.6
        bw = rng.rand(n) * (W * 0.4) + 8.0
        bh = rng.rand(n) * (H * 0.4) + 8.0
        return np.stack([x1, y1, np.minimum(x1 + bw, W - 1),
                         np.minimum(y1 + bh, H - 1)], -1).astype(np.float32)

    gts = [_boxes(n) for n in gt_counts]
    gt_labels = [rng.randint(0, NUM_CLASSES, size=n).astype(np.int64)
                 for n in gt_counts]
    return cls, bbox, cent, gts, gt_labels


def test_atss_loss_matches_reference(ref_mod):
    B = 3
    cls, bbox, cent, gts, gt_labels = _make_inputs(
        B, seed=0, gt_counts=[3, 1, 5])
    head = ref_mod.ATSSHead(
        num_classes=NUM_CLASSES, in_channels=32, stacked_convs=1,
        feat_channels=32,
        anchor_generator=dict(type="AnchorGenerator", ratios=[1.0],
                              octave_base_scale=8, scales_per_octave=1,
                              strides=list(STRIDES)),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0] * 4,
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="GIoULoss", loss_weight=2.0),
        loss_centerness=dict(type="CrossEntropyLoss", use_sigmoid=True,
                             loss_weight=1.0),
        train_cfg=_Cfg(assigner=dict(type="ATSSAssigner", topk=9),
                       allowed_border=-1, pos_weight=-1, debug=False))
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(b) for b in bbox],
                        [t(c) for c in cent], [t(g) for g in gts],
                        [t(l) for l in gt_labels], metas)
    ref = {k: float(sum(v) if isinstance(v, list) else v)
           for k, v in ref.items()}

    # ---- ours (dense) -----------------------------------------------------
    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.atss_head import ATSSHead, atss_loss

    our_head = ATSSHead(num_classes=NUM_CLASSES, strides=STRIDES, topk=9)
    gt_b = np.zeros((B, K_GT, 4), np.float32)
    gt_l = np.zeros((B, K_GT), np.int32)
    gt_v = np.zeros((B, K_GT), bool)
    for i, g in enumerate(gts):
        gt_b[i, :len(g)] = g
        gt_l[i, :len(g)] = gt_labels[i]
        gt_v[i, :len(g)] = True
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = atss_loss(our_head, nhwc(cls), nhwc(bbox), nhwc(cent),
                     dict(gt_bboxes=jnp.asarray(gt_b),
                          gt_labels=jnp.asarray(gt_l),
                          gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox", "loss_centerness"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_gfl_loss_matches_reference(ref_mod):
    """GFL: QFL(IoU target) + score-weighted GIoU x2.0 + DFL x0.25 with
    score-sum normalization (reference gfl_head.py:222-330) — the exact
    weighting our round-3 fix installed."""
    B = 3
    REG_MAX = 8
    rng = np.random.RandomState(7)
    cls = [rng.randn(B, NUM_CLASSES, h, w).astype(np.float32)
           for h, w in SIZES]
    dist = [rng.randn(B, 4 * (REG_MAX + 1), h, w).astype(np.float32)
            for h, w in SIZES]
    H, W = IMG_HW
    gt_counts = [2, 4, 1]
    gts, gt_labels = [], []
    for n in gt_counts:
        x1 = rng.rand(n) * W * 0.6
        y1 = rng.rand(n) * H * 0.6
        bw = rng.rand(n) * (W * 0.4) + 8.0
        bh = rng.rand(n) * (H * 0.4) + 8.0
        gts.append(np.stack([x1, y1, np.minimum(x1 + bw, W - 1),
                             np.minimum(y1 + bh, H - 1)],
                            -1).astype(np.float32))
        gt_labels.append(rng.randint(0, NUM_CLASSES, size=n)
                         .astype(np.int64))

    head = ref_mod.GFLHead(
        num_classes=NUM_CLASSES, in_channels=32, stacked_convs=1,
        feat_channels=32, reg_max=REG_MAX,
        anchor_generator=dict(type="AnchorGenerator", ratios=[1.0],
                              octave_base_scale=8, scales_per_octave=1,
                              strides=list(STRIDES)),
        loss_cls=dict(type="QualityFocalLoss", use_sigmoid=True, beta=2.0,
                      loss_weight=1.0),
        loss_dfl=dict(type="DistributionFocalLoss", loss_weight=0.25),
        loss_bbox=dict(type="GIoULoss", loss_weight=2.0),
        train_cfg=_Cfg(assigner=dict(type="ATSSAssigner", topk=9),
                       allowed_border=-1, pos_weight=-1, debug=False))
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(d) for d in dist],
                        [t(g) for g in gts], [t(l) for l in gt_labels],
                        metas)
    ref = {k: float(sum(v) if isinstance(v, list) else v)
           for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.gfl_head import GFLHead, gfl_loss

    our_head = GFLHead(num_classes=NUM_CLASSES, strides=STRIDES,
                       reg_max=REG_MAX, topk=9)
    gt_b = np.zeros((B, K_GT, 4), np.float32)
    gt_l = np.zeros((B, K_GT), np.int32)
    gt_v = np.zeros((B, K_GT), bool)
    for i, g in enumerate(gts):
        gt_b[i, :len(g)] = g
        gt_l[i, :len(g)] = gt_labels[i]
        gt_v[i, :len(g)] = True
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = gfl_loss(our_head, nhwc(cls), nhwc(dist),
                    dict(gt_bboxes=jnp.asarray(gt_b),
                         gt_labels=jnp.asarray(gt_l),
                         gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox", "loss_dfl"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_retina_loss_matches_reference(ref_mod):
    """RetinaHead = stock AnchorHead.loss: MaxIoU assignment (incl. the
    low-quality each-gt-best-anchor rule), delta encoding with unit stds,
    focal cls avg'd by num_pos, L1 bbox — pins the anchor-based family's
    shared target machinery."""
    B = 3
    rng = np.random.RandomState(11)
    na = 9     # 3 scales x 3 ratios
    cls = [rng.randn(B, na * NUM_CLASSES, h, w).astype(np.float32)
           for h, w in SIZES]
    bbox = [(rng.randn(B, na * 4, h, w) * 0.3).astype(np.float32)
            for h, w in SIZES]
    H, W = IMG_HW
    gt_counts = [3, 2, 4]
    gts, gt_labels = [], []
    for n in gt_counts:
        x1 = rng.rand(n) * W * 0.6
        y1 = rng.rand(n) * H * 0.6
        bw = rng.rand(n) * (W * 0.4) + 10.0
        bh = rng.rand(n) * (H * 0.4) + 10.0
        gts.append(np.stack([x1, y1, np.minimum(x1 + bw, W - 1),
                             np.minimum(y1 + bh, H - 1)],
                            -1).astype(np.float32))
        gt_labels.append(rng.randint(0, NUM_CLASSES, size=n)
                         .astype(np.int64))

    head = ref_mod.RetinaHead(
        num_classes=NUM_CLASSES, in_channels=32, stacked_convs=1,
        feat_channels=32,
        anchor_generator=dict(type="AnchorGenerator",
                              octave_base_scale=4, scales_per_octave=3,
                              ratios=[0.5, 1.0, 2.0],
                              strides=list(STRIDES)),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0] * 4,
                        target_stds=[1.0] * 4),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="L1Loss", loss_weight=1.0),
        train_cfg=_Cfg(assigner=dict(type="MaxIoUAssigner",
                                     pos_iou_thr=0.5, neg_iou_thr=0.4,
                                     min_pos_iou=0,
                                     ignore_iof_thr=-1),
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
    from dsl_tpu.models.dense_heads.retina_head import (RetinaHead,
                                                        retina_loss)

    our_head = RetinaHead(num_classes=NUM_CLASSES, strides=STRIDES)
    gt_b = np.zeros((B, K_GT, 4), np.float32)
    gt_l = np.zeros((B, K_GT), np.int32)
    gt_v = np.zeros((B, K_GT), bool)
    for i, g in enumerate(gts):
        gt_b[i, :len(g)] = g
        gt_l[i, :len(g)] = gt_labels[i]
        gt_v[i, :len(g)] = True
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = retina_loss(our_head, nhwc(cls), nhwc(bbox),
                       dict(gt_bboxes=jnp.asarray(gt_b),
                            gt_labels=jnp.asarray(gt_l),
                            gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items() if k.startswith("loss")}
    for k in ("loss_cls", "loss_bbox"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_ssd_loss_matches_reference(ref_mod):
    """SSDHead: softmax CE with per-image hard-negative mining (topk
    3x-pos negatives by loss), smooth-L1 on deltas, num_pos averaging —
    our dense threshold-trick OHEM must equal the reference's exact topk."""
    B = 2
    rng = np.random.RandomState(13)
    na = 6     # 2 scales x 3 ratios
    cls = [rng.randn(B, na * (NUM_CLASSES + 1), h, w).astype(np.float32)
           for h, w in SIZES]
    bbox = [(rng.randn(B, na * 4, h, w) * 0.3).astype(np.float32)
            for h, w in SIZES]
    H, W = IMG_HW
    gt_counts = [3, 2]
    gts, gt_labels = [], []
    for n in gt_counts:
        x1 = rng.rand(n) * W * 0.6
        y1 = rng.rand(n) * H * 0.6
        bw = rng.rand(n) * (W * 0.4) + 10.0
        bh = rng.rand(n) * (H * 0.4) + 10.0
        gts.append(np.stack([x1, y1, np.minimum(x1 + bw, W - 1),
                             np.minimum(y1 + bh, H - 1)],
                            -1).astype(np.float32))
        gt_labels.append(rng.randint(0, NUM_CLASSES, size=n)
                         .astype(np.int64))

    head = ref_mod.SSDHead(
        num_classes=NUM_CLASSES, in_channels=[32] * 5,
        anchor_generator=dict(type="AnchorGenerator", scales=[4, 8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=list(STRIDES)),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0] * 4,
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        train_cfg=_Cfg(assigner=dict(type="MaxIoUAssigner",
                                     pos_iou_thr=0.5, neg_iou_thr=0.5,
                                     min_pos_iou=0.0,
                                     ignore_iof_thr=-1,
                                     gt_max_assign_all=False),
                       smoothl1_beta=1.0, allowed_border=-1,
                       pos_weight=-1, neg_pos_ratio=3, debug=False))
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
    from dsl_tpu.models.dense_heads.ssd_head import SSDHead, ssd_loss

    our_head = SSDHead(num_classes=NUM_CLASSES, strides=STRIDES,
                       anchor_scales=(4.0, 8.0),
                       anchor_ratios=(0.5, 1.0, 2.0),
                       target_stds=(0.1, 0.1, 0.2, 0.2),
                       pos_iou_thr=0.5, neg_iou_thr=0.5, neg_pos_ratio=3)
    gt_b = np.zeros((B, K_GT, 4), np.float32)
    gt_l = np.zeros((B, K_GT), np.int32)
    gt_v = np.zeros((B, K_GT), bool)
    for i, g in enumerate(gts):
        gt_b[i, :len(g)] = g
        gt_l[i, :len(g)] = gt_labels[i]
        gt_v[i, :len(g)] = True
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = ssd_loss(our_head, nhwc(cls), nhwc(bbox),
                    dict(gt_bboxes=jnp.asarray(gt_b),
                         gt_labels=jnp.asarray(gt_l),
                         gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_vfnet_loss_matches_reference(ref_mod):
    """VFNet: ATSS assignment on center_offset=0 anchors/points, IoU-
    weighted GIoU (x1.5 initial / x2.0 refine), varifocal cls with
    refined-IoU targets at the assigned class."""
    B = 2
    rng = np.random.RandomState(17)
    cls = [rng.randn(B, NUM_CLASSES, h, w).astype(np.float32)
           for h, w in SIZES]
    # distances must be positive (post-exp/scale semantics)
    ini = [(rng.rand(B, 4, h, w) * 32 + 1).astype(np.float32)
           for h, w in SIZES]
    ref_p = [(rng.rand(B, 4, h, w) * 32 + 1).astype(np.float32)
             for h, w in SIZES]
    H, W = IMG_HW
    gts, gt_labels = [], []
    for n in [3, 2]:
        x1 = rng.rand(n) * W * 0.6
        y1 = rng.rand(n) * H * 0.6
        bw = rng.rand(n) * (W * 0.4) + 10.0
        bh = rng.rand(n) * (H * 0.4) + 10.0
        gts.append(np.stack([x1, y1, np.minimum(x1 + bw, W - 1),
                             np.minimum(y1 + bh, H - 1)],
                            -1).astype(np.float32))
        gt_labels.append(rng.randint(0, NUM_CLASSES, size=n)
                         .astype(np.int64))

    head = ref_mod.VFNetHead(
        num_classes=NUM_CLASSES, in_channels=32, stacked_convs=1,
        feat_channels=32, strides=list(STRIDES),
        center_sampling=False, dcn_on_last_conv=False, use_atss=True,
        loss_cls=dict(type="VarifocalLoss", use_sigmoid=True,
                      alpha=0.75, gamma=2.0, iou_weighted=True,
                      loss_weight=1.0),
        loss_bbox=dict(type="GIoULoss", loss_weight=1.5),
        loss_bbox_refine=dict(type="GIoULoss", loss_weight=2.0),
        anchor_generator=dict(type="AnchorGenerator", ratios=[1.0],
                              octave_base_scale=8, scales_per_octave=1,
                              center_offset=0.0, strides=list(STRIDES)),
        train_cfg=_Cfg(assigner=dict(type="ATSSAssigner", topk=9),
                       allowed_border=-1, pos_weight=-1, debug=False))
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(b) for b in ini],
                        [t(b) for b in ref_p], [t(g) for g in gts],
                        [t(l) for l in gt_labels], metas)
    ref = {k: float(sum(v) if isinstance(v, list) else v)
           for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.vfnet_head import VFNetHead, vfnet_loss

    our_head = VFNetHead(num_classes=NUM_CLASSES, strides=STRIDES,
                         atss_topk=9)
    gt_b = np.zeros((B, K_GT, 4), np.float32)
    gt_l = np.zeros((B, K_GT), np.int32)
    gt_v = np.zeros((B, K_GT), bool)
    for i, g in enumerate(gts):
        gt_b[i, :len(g)] = g
        gt_l[i, :len(g)] = gt_labels[i]
        gt_v[i, :len(g)] = True
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = vfnet_loss(our_head, nhwc(cls), nhwc(ini), nhwc(ref_p),
                      dict(gt_bboxes=jnp.asarray(gt_b),
                           gt_labels=jnp.asarray(gt_l),
                           gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox", "loss_bbox_rf"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


@pytest.mark.parametrize("protocol", ["mean", "sum"])
def test_yolov3_loss_matches_reference(ref_mod, protocol):
    """YOLOv3: cross-level GridAssigner with responsible cells, YOLO coder
    targets, and BOTH normalization protocols — per-level element mean
    (reference head defaults) and global sum with xy/wh x2.0 (the shipped
    yolov3 config) — the round-3 rewrite of yolo_loss is pinned here."""
    if protocol == "sum":
        loss_dicts = dict(
            loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True,
                          loss_weight=1.0, reduction="sum"),
            loss_conf=dict(type="CrossEntropyLoss", use_sigmoid=True,
                           loss_weight=1.0, reduction="sum"),
            loss_xy=dict(type="CrossEntropyLoss", use_sigmoid=True,
                         loss_weight=2.0, reduction="sum"),
            loss_wh=dict(type="MSELoss", loss_weight=2.0, reduction="sum"))
    else:
        loss_dicts = {}
    B = 2
    rng = np.random.RandomState(23)
    na = 3
    yolo_sizes = [(4, 5), (8, 10), (16, 20)]     # strides 32, 16, 8
    cls = None
    pred_maps = [rng.randn(B, na * (5 + NUM_CLASSES), h, w)
                 .astype(np.float32) for h, w in yolo_sizes]
    H, W = IMG_HW
    gts, gt_labels = [], []
    for n in [3, 2]:
        x1 = rng.rand(n) * W * 0.6
        y1 = rng.rand(n) * H * 0.6
        bw = rng.rand(n) * (W * 0.4) + 12.0
        bh = rng.rand(n) * (H * 0.4) + 12.0
        gts.append(np.stack([x1, y1, np.minimum(x1 + bw, W - 1),
                             np.minimum(y1 + bh, H - 1)],
                            -1).astype(np.float32))
        gt_labels.append(rng.randint(0, NUM_CLASSES, size=n)
                         .astype(np.int64))

    base_sizes = [[(116, 90), (156, 198), (373, 326)],
                  [(30, 61), (62, 45), (59, 119)],
                  [(10, 13), (16, 30), (33, 23)]]
    head = ref_mod.YOLOV3Head(
        num_classes=NUM_CLASSES, in_channels=[32, 32, 32],
        out_channels=[32, 32, 32], featmap_strides=[32, 16, 8],
        anchor_generator=dict(type="YOLOAnchorGenerator",
                              base_sizes=base_sizes, strides=[32, 16, 8]),
        bbox_coder=dict(type="YOLOBBoxCoder"),
        train_cfg=_Cfg(assigner=dict(type="GridAssigner", pos_iou_thr=0.5,
                                     neg_iou_thr=0.5, min_pos_iou=0),
                       debug=False),
        **loss_dicts)
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([t(p) for p in pred_maps], [t(g) for g in gts],
                        [t(l) for l in gt_labels], metas)
    ref = {k: float(sum(v) if isinstance(v, list) else v)
           for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.yolo_head import YOLOV3Head, yolo_loss

    our_head = YOLOV3Head(num_classes=NUM_CLASSES, **loss_dicts)
    gt_b = np.zeros((B, K_GT, 4), np.float32)
    gt_l = np.zeros((B, K_GT), np.int32)
    gt_v = np.zeros((B, K_GT), bool)
    for i, g in enumerate(gts):
        gt_b[i, :len(g)] = g
        gt_l[i, :len(g)] = gt_labels[i]
        gt_v[i, :len(g)] = True
    preds = tuple(jnp.asarray(p.transpose(0, 2, 3, 1)) for p in pred_maps)
    ours = yolo_loss(our_head, preds,
                     dict(gt_bboxes=jnp.asarray(gt_b),
                          gt_labels=jnp.asarray(gt_l),
                          gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_conf", "loss_xy", "loss_wh"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_free_anchor_loss_matches_reference(ref_mod):
    """FreeAnchor: learning-to-match bags — saturated-linear box_prob with
    per-class scatter-max (negative term), top-k IoU bags with
    Mean-max(P_cls*P_loc) (positive term), smooth-L1 box likelihood
    (beta 0.11, w 0.75), (num_gt, num_gt*topk) normalizers.
    topk is chosen so no gt has an exact IoU tie at the bag boundary
    (torch top-k tie-breaking is arbitrary; verified tie-free for this
    seed)."""
    B = 2
    rng = np.random.RandomState(31)
    na = 9
    cls = [rng.randn(B, na * NUM_CLASSES, h, w).astype(np.float32)
           for h, w in SIZES]
    bbox = [(rng.randn(B, na * 4, h, w) * 0.3).astype(np.float32)
            for h, w in SIZES]
    H, W = IMG_HW
    gt_counts = [3, 2]
    gts, gt_labels = [], []
    for n in gt_counts:
        x1 = rng.rand(n) * W * 0.4
        y1 = rng.rand(n) * H * 0.4
        bw = rng.rand(n) * (W * 0.3) + 30.0
        bh = rng.rand(n) * (H * 0.3) + 30.0
        gts.append(np.stack([x1, y1, np.minimum(x1 + bw, W - 1),
                             np.minimum(y1 + bh, H - 1)],
                            -1).astype(np.float32))
        gt_labels.append(rng.randint(0, NUM_CLASSES, size=n)
                         .astype(np.int64))

    topk = 20
    head = ref_mod.FreeAnchorRetinaHead(
        num_classes=NUM_CLASSES, in_channels=32, stacked_convs=1,
        feat_channels=32, pre_anchor_topk=topk, bbox_thr=0.6,
        gamma=2.0, alpha=0.5,
        anchor_generator=dict(type="AnchorGenerator",
                              octave_base_scale=4, scales_per_octave=3,
                              ratios=[0.5, 1.0, 2.0],
                              strides=list(STRIDES)),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0] * 4,
                        target_stds=[1.0] * 4),
        loss_bbox=dict(type="SmoothL1Loss", beta=0.11, loss_weight=0.75),
        train_cfg=None)
    # FreeAnchor's loss() calls get_anchors() with the default device='cuda'
    _orig_get_anchors = head.get_anchors
    head.get_anchors = (lambda fs, metas, device="cpu":
                        _orig_get_anchors(fs, metas, device="cpu"))
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
    from dsl_tpu.models.dense_heads.free_anchor_head import (
        FreeAnchorRetinaHead, free_anchor_loss)

    our_head = FreeAnchorRetinaHead(num_classes=NUM_CLASSES,
                                    strides=STRIDES,
                                    pre_anchor_topk=topk)
    gt_b = np.zeros((B, K_GT, 4), np.float32)
    gt_l = np.zeros((B, K_GT), np.int32)
    gt_v = np.zeros((B, K_GT), bool)
    for i, g in enumerate(gts):
        gt_b[i, :len(g)] = g
        gt_l[i, :len(g)] = gt_labels[i]
        gt_v[i, :len(g)] = True
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = free_anchor_loss(our_head, nhwc(cls), nhwc(bbox),
                            dict(gt_bboxes=jnp.asarray(gt_b),
                                 gt_labels=jnp.asarray(gt_l),
                                 gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    pairs = {"loss_positive": "positive_bag_loss",
             "loss_negative": "negative_bag_loss"}
    for ok, rk in pairs.items():
        np.testing.assert_allclose(
            ours[ok], ref[rk], rtol=5e-5, atol=1e-6,
            err_msg=f"{ok}: ours={ours[ok]} ref={ref[rk]}")


def test_fsaf_loss_matches_reference(ref_mod):
    """FSAF: CenterRegionAssigner (core iof>0.01 + strict center-in-gt,
    smallest-area priority, shadowed (anchor, class) weight zeroing,
    same-class positive demotion, scaled ignore regions) + TBLR-decoded
    IoU loss + online level selection (per-gt min mean loss) + reweight
    (rejected positives zero only their label channel) + avg by surviving
    positives — reference ``fsaf_head.py:186-309`` +
    ``center_region_assigner.py:125-335``."""
    B = 3
    cls, bbox, _, gts, gt_labels = _make_inputs(
        B, seed=11, gt_counts=[4, 1, 6])
    # ignore regions for images 0 and 2 (image 1: empty tensor path)
    ig_rng = np.random.RandomState(99)
    H, W = IMG_HW

    def _ig(n):
        x1 = ig_rng.rand(n) * W * 0.5
        y1 = ig_rng.rand(n) * H * 0.5
        return np.stack([x1, y1, x1 + 30 + ig_rng.rand(n) * 40,
                         y1 + 25 + ig_rng.rand(n) * 40],
                        -1).astype(np.float32)

    igs = [_ig(2), np.zeros((0, 4), np.float32), _ig(1)]

    head = ref_mod.FSAFHead(
        NUM_CLASSES, 32, stacked_convs=1, feat_channels=32,
        reg_decoded_bbox=True,
        anchor_generator=dict(type="AnchorGenerator", octave_base_scale=1,
                              scales_per_octave=1, ratios=[1.0],
                              strides=list(STRIDES)),
        bbox_coder=dict(type="TBLRBBoxCoder", normalizer=4.0),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0, reduction="none"),
        loss_bbox=dict(type="IoULoss", eps=1e-6, loss_weight=1.0,
                       reduction="none"),
        train_cfg=_Cfg(assigner=dict(type="CenterRegionAssigner",
                                     pos_scale=0.2, neg_scale=0.2,
                                     min_pos_iof=0.01),
                       allowed_border=-1, pos_weight=-1, debug=False))
    t = torch.from_numpy
    metas = [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
             for _ in range(B)]
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(b) for b in bbox],
                        [t(g) for g in gts], [t(l) for l in gt_labels],
                        metas, gt_bboxes_ignore=[t(g) for g in igs])
    ref = {k: float(sum(v) if isinstance(v, list) else v)
           for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.fsaf_head import FSAFHead, fsaf_loss

    our_head = FSAFHead(num_classes=NUM_CLASSES, strides=STRIDES)
    gt_b = np.zeros((B, K_GT, 4), np.float32)
    gt_l = np.zeros((B, K_GT), np.int32)
    gt_v = np.zeros((B, K_GT), bool)
    ig_b = np.zeros((B, 2, 4), np.float32)
    ig_v = np.zeros((B, 2), bool)
    for i, g in enumerate(gts):
        gt_b[i, :len(g)] = g
        gt_l[i, :len(g)] = gt_labels[i]
        gt_v[i, :len(g)] = True
        ig_b[i, :len(igs[i])] = igs[i]
        ig_v[i, :len(igs[i])] = True
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = fsaf_loss(our_head, nhwc(cls), nhwc(bbox),
                     dict(gt_bboxes=jnp.asarray(gt_b),
                          gt_labels=jnp.asarray(gt_l),
                          gt_valid=jnp.asarray(gt_v),
                          ignore_bboxes=jnp.asarray(ig_b),
                          ignore_valid=jnp.asarray(ig_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox", "num_pos"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


# ---------------------------------------------------------------------------
# Predict-path oracles: get_bboxes (decode + nms_pre topk + multiclass NMS)
# ---------------------------------------------------------------------------

def _ref_predict_nms():
    """The reference's own multiclass_nms wired to a faithful greedy
    batched_nms (test_torch_oracle_postproc); also installs the
    ``mmdet.core.export.get_k_for_topk`` helper the batched
    ``_get_bboxes`` imports at call time."""
    import sys as _sys
    import os.path as _osp
    import types as _types

    _sys.path.insert(0, _osp.dirname(__file__))
    from test_torch_oracle_postproc import _load_reference_postproc

    def get_k_for_topk(k, size):
        # mmdet core/export/onnx_helper.py (eager branch)
        if k <= 0 or size <= 0:
            return -1
        return min(int(k), int(size))

    export_mod = _types.ModuleType("mmdet.core.export")
    export_mod.get_k_for_topk = get_k_for_topk
    core_mod = _sys.modules.get("mmdet.core") or _types.ModuleType(
        "mmdet.core")
    mmdet_mod = _sys.modules.get("mmdet") or _types.ModuleType("mmdet")
    core_mod.export = export_mod
    mmdet_mod.core = core_mod
    _sys.modules.setdefault("mmdet", mmdet_mod)
    _sys.modules.setdefault("mmdet.core", core_mod)
    _sys.modules["mmdet.core.export"] = export_mod
    return _load_reference_postproc().multiclass_nms


def _sorted_dets(dets, labels):
    order = np.argsort(-dets[:, 4], kind="mergesort")
    return dets[order], labels[order]


def test_retina_get_bboxes_matches_reference(ref_mod):
    """RetinaHead eval path: per-level sigmoid + nms_pre topk, delta2bbox
    decode w/ clip, rescale, multiclass NMS (anchor_head.py:492-726)."""
    rng = np.random.RandomState(8)
    B = 2
    cls = [rng.randn(B, NUM_CLASSES * 9, h, w).astype(np.float32)
           for h, w in SIZES]
    bbox = [rng.randn(B, 4 * 9, h, w).astype(np.float32) * 0.3
            for h, w in SIZES]

    head = ref_mod.RetinaHead(
        num_classes=NUM_CLASSES, in_channels=32, stacked_convs=1,
        feat_channels=32,
        anchor_generator=dict(type="AnchorGenerator",
                              octave_base_scale=4, scales_per_octave=3,
                              ratios=[0.5, 1.0, 2.0],
                              strides=list(STRIDES)),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0] * 4,
                        target_stds=[1.0] * 4),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="L1Loss", loss_weight=1.0))
    type(head).get_bboxes.__globals__["multiclass_nms"] = _ref_predict_nms()
    sf = np.asarray([1.25, 1.5, 1.25, 1.5], np.float32)
    metas = [dict(img_shape=(*IMG_HW, 3), scale_factor=sf)
             for _ in range(B)]
    cfg = _Cfg(nms_pre=200, min_bbox_size=0, score_thr=0.3,
               nms=_Cfg(type="nms", iou_threshold=0.5), max_per_img=20)
    t = torch.from_numpy
    with torch.no_grad():
        ref = head.get_bboxes([t(c) for c in cls], [t(b) for b in bbox],
                              metas, cfg=cfg, rescale=True)

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.retina_head import (RetinaHead,
                                                        retina_get_bboxes)

    our_head = RetinaHead(num_classes=NUM_CLASSES, strides=STRIDES)
    nhwc = lambda arrs: [jnp.asarray(a.transpose(0, 2, 3, 1)) for a in arrs]
    dets, labels, valid = retina_get_bboxes(
        our_head, nhwc(cls), nhwc(bbox),
        img_shapes=jnp.asarray([[IMG_HW[0], IMG_HW[1]]] * B, jnp.float32),
        scale_factors=jnp.asarray(np.tile(sf, (B, 1))),
        nms_pre=200, score_thr=0.3, iou_threshold=0.5, max_per_img=20)
    for bi in range(B):
        rd, rl = ref[bi]
        od, ol = _sorted_dets(np.asarray(dets[bi])[np.asarray(valid[bi])],
                              np.asarray(labels[bi])[np.asarray(valid[bi])])
        rd2, rl2 = _sorted_dets(rd.numpy(), rl.numpy())
        assert len(od) == len(rd2), (bi, len(od), len(rd2))
        np.testing.assert_allclose(od, rd2, rtol=1e-4, atol=1e-3,
                                   err_msg=f"img {bi}")
        np.testing.assert_array_equal(ol, rl2)


def test_gfl_get_bboxes_matches_reference(ref_mod):
    """GFL eval path: integral (softmax expectation) distance decode from
    anchor CENTERS, stride scaling, sigmoid scores, multiclass NMS
    (gfl_head.py get_bboxes/_get_bboxes)."""
    rng = np.random.RandomState(9)
    B = 2
    REG_MAX = 8
    cls = [rng.randn(B, NUM_CLASSES, h, w).astype(np.float32)
           for h, w in SIZES]
    dist = [rng.randn(B, 4 * (REG_MAX + 1), h, w).astype(np.float32)
            for h, w in SIZES]

    head = ref_mod.GFLHead(
        num_classes=NUM_CLASSES, in_channels=32, stacked_convs=1,
        feat_channels=32, reg_max=REG_MAX,
        anchor_generator=dict(type="AnchorGenerator", ratios=[1.0],
                              octave_base_scale=8, scales_per_octave=1,
                              strides=list(STRIDES)),
        loss_cls=dict(type="QualityFocalLoss", use_sigmoid=True, beta=2.0,
                      loss_weight=1.0),
        loss_dfl=dict(type="DistributionFocalLoss", loss_weight=0.25),
        loss_bbox=dict(type="GIoULoss", loss_weight=2.0))
    nms_impl = _ref_predict_nms()
    type(head).get_bboxes.__globals__["multiclass_nms"] = nms_impl
    type(head)._get_bboxes.__globals__["multiclass_nms"] = nms_impl
    sf = np.asarray([2.0, 2.0, 2.0, 2.0], np.float32)
    metas = [dict(img_shape=(*IMG_HW, 3), scale_factor=sf)
             for _ in range(B)]
    cfg = _Cfg(nms_pre=200, min_bbox_size=0, score_thr=0.25,
               nms=_Cfg(type="nms", iou_threshold=0.6), max_per_img=15)
    t = torch.from_numpy
    with torch.no_grad():
        ref = head.get_bboxes([t(c) for c in cls], [t(d) for d in dist],
                              metas, cfg=cfg, rescale=True)

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.gfl_head import GFLHead, gfl_get_bboxes

    our_head = GFLHead(num_classes=NUM_CLASSES, strides=STRIDES,
                       reg_max=REG_MAX)
    nhwc = lambda arrs: [jnp.asarray(a.transpose(0, 2, 3, 1)) for a in arrs]
    dets, labels, valid = gfl_get_bboxes(
        our_head, nhwc(cls), nhwc(dist),
        img_shapes=jnp.asarray([[IMG_HW[0], IMG_HW[1]]] * B, jnp.float32),
        scale_factors=jnp.asarray(np.tile(sf, (B, 1))),
        nms_pre=200, score_thr=0.25, iou_threshold=0.6, max_per_img=15)
    for bi in range(B):
        rd, rl = ref[bi]
        od, ol = _sorted_dets(np.asarray(dets[bi])[np.asarray(valid[bi])],
                              np.asarray(labels[bi])[np.asarray(valid[bi])])
        rd2, rl2 = _sorted_dets(rd.numpy(), rl.numpy())
        assert len(od) == len(rd2), (bi, len(od), len(rd2))
        np.testing.assert_allclose(od, rd2, rtol=1e-4, atol=1e-3,
                                   err_msg=f"img {bi}")
        np.testing.assert_array_equal(ol, rl2)
