"""Torch oracles, tranche 3: SABL / Guided-Anchoring (GA-Retina, GA-RPN)
losses against the reference's OWN code.

Same approach as ``test_torch_oracle_heads2.py``: the reference's actual
``loss``/target code (``/root/reference/mmdet/models/dense_heads/
{sabl_retina_head,guided_anchor_head,ga_rpn_head}.py``) runs on CPU with its
real assigners (``ApproxMaxIoUAssigner``), coders (``BucketingBBoxCoder``,
``DeltaXYWHBBoxCoder``), samplers and loss modules loaded from the reference
tree (mmcv + registries stubbed), and our dense K-padded implementations must
reproduce every loss component to fp32 tolerance.

Sampler determinism: where a config uses ``RandomSampler`` for the *cls*
branch (GA-RPN), the oracle uses a sampler ``num`` large enough that every
candidate is kept deterministically (same convention as
``test_torch_oracle_rcnn.py``). The GA *shape* branch keeps the real
``num=256`` sampler: only positive counts (<=128 here) and the deterministic
negative count enter the loss, never the random choice itself.

Skipped automatically when /root/reference or torch is unavailable.
"""

import os.path as osp
import sys
import types
from functools import partial

import numpy as np
import pytest

REF_ROOT = "/root/reference/mmdet"
REF_SABL = osp.join(REF_ROOT, "models/dense_heads/sabl_retina_head.py")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not osp.exists(REF_SABL),
                                reason="reference tree not available")

NUM_CLASSES = 6
STRIDES = (8, 16, 32, 64, 128)
SIZES = [(16, 20), (8, 10), (4, 5), (2, 3), (1, 2)]
IMG_HW = (128, 160)
K_GT = 8


def _load_reference_heads3():
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

    class ConfigDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        def __setattr__(self, k, v):
            self[k] = v

        def get(self, k, default=None):
            return dict.get(self, k, default)

    mmcv.ConfigDict = ConfigDict
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
    mmcv_cnn.Conv2d = nn.Conv2d
    mmcv_cnn.Linear = nn.Linear
    mmcv_cnn.build_activation_layer = lambda cfg: nn.ReLU()
    _stub("mmcv.cnn.bricks")
    bricks_tf = _stub("mmcv.cnn.bricks.transformer")

    class FFN(nn.Module):
        """Constructible stand-in (loss-only oracles never forward it)."""

        def __init__(self, *a, **k):
            super().__init__()

    class MultiheadAttention(nn.Module):
        """Constructible stand-in (loss-only oracles never forward it)."""

        def __init__(self, *a, **k):
            super().__init__()

    bricks_tf.FFN = FFN
    bricks_tf.MultiheadAttention = MultiheadAttention
    bricks_tf.build_positional_encoding = lambda cfg: nn.Identity()
    mmcv_cnn.build_norm_layer = lambda cfg, dim: ("ln", nn.LayerNorm(dim))
    mmcv_utils = _stub("mmcv.utils")

    class _McvRegistry:
        def __init__(self, name, **kw):
            self.classes = {}

        def register_module(self, *a, **k):
            def deco(cls):
                self.classes[cls.__name__] = cls
                return cls
            return deco

    def _mcv_build_from_cfg(cfg, registry, default_args=None):
        c = dict(cfg)
        if default_args:
            for k, v in default_args.items():
                c.setdefault(k, v)
        return registry.classes[c.pop("type")](**c)

    mmcv_utils.Registry = _McvRegistry
    mmcv_utils.build_from_cfg = _mcv_build_from_cfg
    mmcv_cnn.normal_init = lambda *a, **k: None
    mmcv_cnn.constant_init = lambda *a, **k: None
    mmcv_cnn.is_norm = lambda m: False
    mmcv_cnn.bias_init_with_prob = lambda p: float(-np.log((1 - p) / p))
    mmcv_runner = _stub("mmcv.runner")
    mmcv_runner.force_fp32 = lambda **kw: (lambda f: f)
    mmcv_runner.auto_fp16 = lambda **kw: (lambda f: f)

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
    mmcv_ops.nms = _no_cuda

    class DeformConv2d(nn.Module):
        """Constructible stand-in (loss-only oracles never forward it)."""

        def __init__(self, in_c, out_c, kernel_size=3, stride=1, padding=0,
                     dilation=1, **kw):
            super().__init__()
            k = kernel_size
            self.weight = nn.Parameter(torch.zeros(out_c, in_c, k, k))

        def forward(self, x, offset):
            raise RuntimeError("not to be forwarded in the oracle")

    class MaskedConv2d(nn.Conv2d):
        """Constructible stand-in; loss oracles never call forward."""

        def forward(self, x, mask=None):
            raise RuntimeError("not to be forwarded in the oracle")

    mmcv_ops.DeformConv2d = DeformConv2d
    mmcv_ops.MaskedConv2d = MaskedConv2d
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
        register = register_module

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

    for pkg in ("refmm4", "refmm4.core", "refmm4.core.anchor",
                "refmm4.core.bbox", "refmm4.core.bbox.assigners",
                "refmm4.core.bbox.samplers", "refmm4.core.bbox.coder",
                "refmm4.core.bbox.iou_calculators", "refmm4.models",
                "refmm4.models.losses", "refmm4.models.utils",
                "refmm4.models.dense_heads"):
        _stub(pkg)
    anchor_builder = _stub("refmm4.core.anchor.builder")
    anchor_builder.PRIOR_GENERATORS = regs["PRIOR_GENERATORS"]
    anchor_builder.ANCHOR_GENERATORS = regs["PRIOR_GENERATORS"]
    bbox_builder = _stub("refmm4.core.bbox.builder")
    bbox_builder.BBOX_ASSIGNERS = regs["BBOX_ASSIGNERS"]
    bbox_builder.BBOX_SAMPLERS = regs["BBOX_SAMPLERS"]
    bbox_builder.BBOX_CODERS = regs["BBOX_CODERS"]
    iou_builder = _stub("refmm4.core.bbox.iou_calculators.builder")
    iou_builder.IOU_CALCULATORS = regs["IOU_CALCULATORS"]
    models_builder = _stub("refmm4.models.builder")
    models_builder.HEADS = regs["HEADS"]
    models_builder.LOSSES = regs["LOSSES"]
    models_builder.build_loss = _build("LOSSES")

    saved = {k: sys.modules.get(k)
             for k in set(new_mods) | {"mmdet", "mmdet.core", "mmdet.utils",
                                       "mmdet.utils.util_mixins",
                                       "mmdet.models", "mmdet.models.utils",
                                       "mmdet.models.dense_heads",
                                       "mmdet.core.bbox",
                                       "mmdet.core.bbox.demodata",
                                       "mmdet.core.bbox.iou_calculators",
                                       "mmdet.core.bbox.transforms",
                                       "mmdet.models.utils.transformer",
                                       "mmdet.models.builder",
                                       "mmdet.models.losses",
                                       "mmdet.models.dense_heads.atss_head",
                                       "mmdet.core.anchor"}}
    sys.modules.update(new_mods)
    sys.modules["mmdet.utils"] = mm_utils
    try:
        iou2d = _load(
            "refmm4.core.bbox.iou_calculators.iou2d_calculator",
            osp.join(REF_ROOT,
                     "core/bbox/iou_calculators/iou2d_calculator.py"))
        iou_pkg = sys.modules["refmm4.core.bbox.iou_calculators"]
        iou_pkg.build_iou_calculator = _build("IOU_CALCULATORS")
        iou_pkg.bbox_overlaps = iou2d.bbox_overlaps

        transforms = _load("refmm4.core.bbox.transforms",
                           osp.join(REF_ROOT, "core/bbox/transforms.py"))
        sys.modules["refmm4.core.bbox"].transforms = transforms
        anchor_utils = _load("refmm4.core.anchor.utils",
                             osp.join(REF_ROOT, "core/anchor/utils.py"))
        _load("refmm4.core.anchor.anchor_generator",
              osp.join(REF_ROOT, "core/anchor/anchor_generator.py"))
        _load("refmm4.core.bbox.coder.base_bbox_coder",
              osp.join(REF_ROOT, "core/bbox/coder/base_bbox_coder.py"))
        _load("refmm4.core.bbox.coder.delta_xywh_bbox_coder",
              osp.join(REF_ROOT,
                       "core/bbox/coder/delta_xywh_bbox_coder.py"))
        _load("refmm4.core.bbox.coder.bucketing_bbox_coder",
              osp.join(REF_ROOT,
                       "core/bbox/coder/bucketing_bbox_coder.py"))
        _load("refmm4.core.bbox.assigners.base_assigner",
              osp.join(REF_ROOT, "core/bbox/assigners/base_assigner.py"))
        _load("refmm4.core.bbox.assigners.assign_result",
              osp.join(REF_ROOT, "core/bbox/assigners/assign_result.py"))
        _load("refmm4.core.bbox.assigners.max_iou_assigner",
              osp.join(REF_ROOT,
                       "core/bbox/assigners/max_iou_assigner.py"))
        _load("refmm4.core.bbox.assigners.approx_max_iou_assigner",
              osp.join(REF_ROOT,
                       "core/bbox/assigners/approx_max_iou_assigner.py"))
        _load("refmm4.core.bbox.assigners.atss_assigner",
              osp.join(REF_ROOT, "core/bbox/assigners/atss_assigner.py"))
        _load("refmm4.core.bbox.samplers.sampling_result",
              osp.join(REF_ROOT, "core/bbox/samplers/sampling_result.py"))
        _load("refmm4.core.bbox.samplers.base_sampler",
              osp.join(REF_ROOT, "core/bbox/samplers/base_sampler.py"))
        _load("refmm4.core.bbox.samplers.pseudo_sampler",
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

        mmdet_core = types.ModuleType("mmdet.core")
        mmdet_core.bbox_overlaps = iou2d.bbox_overlaps
        mmdet_core.distance2bbox = transforms.distance2bbox
        mmdet_core.bbox2distance = transforms.bbox2distance
        mmdet_core.multi_apply = multi_apply
        mmdet_core.reduce_mean = lambda t: t
        mmdet_core.unmap = unmap
        mmdet_core.calc_region = anchor_utils.calc_region
        mmdet_core.anchor_inside_flags = anchor_utils.anchor_inside_flags
        mmdet_core.images_to_levels = anchor_utils.images_to_levels
        mmdet_core.multiclass_nms = None
        mmdet_core.force_fp32 = mmcv_runner.force_fp32
        mmdet_core.build_anchor_generator = _build("PRIOR_GENERATORS")
        mmdet_core.build_prior_generator = _build("PRIOR_GENERATORS")
        mmdet_core.build_assigner = _build("BBOX_ASSIGNERS")
        mmdet_core.build_sampler = _build("BBOX_SAMPLERS")
        mmdet_core.build_bbox_coder = _build("BBOX_CODERS")
        mmdet_core.bbox_cxcywh_to_xyxy = transforms.bbox_cxcywh_to_xyxy
        mmdet_core.bbox_xyxy_to_cxcywh = transforms.bbox_xyxy_to_cxcywh
        mmdet_core_bbox = types.ModuleType("mmdet.core.bbox")
        mmdet_core_bbox.__path__ = []
        mmdet_core_bbox.bbox_overlaps = iou2d.bbox_overlaps
        demodata = types.ModuleType("mmdet.core.bbox.demodata")
        demodata.ensure_rng = lambda rng=None: np.random.RandomState(rng)
        mmdet_core_bbox.demodata = demodata
        mmdet_core_bbox.transforms = transforms
        mmdet_core_iouc = types.ModuleType("mmdet.core.bbox.iou_calculators")
        mmdet_core_iouc.bbox_overlaps = iou2d.bbox_overlaps
        mmdet_core_bbox.iou_calculators = mmdet_core_iouc
        mmdet_core.bbox = mmdet_core_bbox

        mmdet_mod = types.ModuleType("mmdet")
        mmdet_mod.core = mmdet_core
        mmdet_mod.utils = mm_utils
        sys.modules["mmdet"] = mmdet_mod
        sys.modules["mmdet.core"] = mmdet_core
        sys.modules["mmdet.core.bbox"] = mmdet_core_bbox
        sys.modules["mmdet.core.bbox.demodata"] = demodata
        sys.modules["mmdet.core.bbox.transforms"] = transforms
        sys.modules["mmdet.core.bbox.iou_calculators"] = mmdet_core_iouc

        rnd = _load("refmm4.core.bbox.samplers.random_sampler",
                    osp.join(REF_ROOT,
                             "core/bbox/samplers/random_sampler.py"))
        region = _load(
            "refmm4.core.bbox.assigners.region_assigner",
            osp.join(REF_ROOT, "core/bbox/assigners/region_assigner.py"))
        mmdet_core.RegionAssigner = region.RegionAssigner

        mc_pkg = _stub("refmm4.core.bbox.match_costs")
        sys.modules["refmm4.core.bbox.match_costs"] = mc_pkg
        mc_builder = _load("refmm4.core.bbox.match_costs.builder",
                           osp.join(REF_ROOT,
                                    "core/bbox/match_costs/builder.py"))
        _load("refmm4.core.bbox.match_costs.match_cost",
              osp.join(REF_ROOT, "core/bbox/match_costs/match_cost.py"))
        mc_pkg.build_match_cost = mc_builder.build_match_cost
        _load("refmm4.core.bbox.assigners.hungarian_assigner",
              osp.join(REF_ROOT,
                       "core/bbox/assigners/hungarian_assigner.py"))

        # ---- losses --------------------------------------------------------
        _load("refmm4.models.losses.utils",
              osp.join(REF_ROOT, "models/losses/utils.py"))
        _load("refmm4.models.losses.accuracy",
              osp.join(REF_ROOT, "models/losses/accuracy.py"))
        _load("refmm4.models.losses.focal_loss",
              osp.join(REF_ROOT, "models/losses/focal_loss.py"))
        _load("refmm4.models.losses.iou_loss",
              osp.join(REF_ROOT, "models/losses/iou_loss.py"))
        ce_mod = _load("refmm4.models.losses.cross_entropy_loss",
                       osp.join(REF_ROOT,
                                "models/losses/cross_entropy_loss.py"))
        sl1_mod = _load("refmm4.models.losses.smooth_l1_loss",
                        osp.join(REF_ROOT,
                                 "models/losses/smooth_l1_loss.py"))
        pisa_mod = _load("refmm4.models.losses.pisa_loss",
                         osp.join(REF_ROOT, "models/losses/pisa_loss.py"))
        _load("refmm4.models.losses.gfocal_loss",
              osp.join(REF_ROOT, "models/losses/gfocal_loss.py"))
        _load("refmm4.models.losses.kd_loss",
              osp.join(REF_ROOT, "models/losses/kd_loss.py"))
        losses_pkg = sys.modules["refmm4.models.losses"]
        losses_pkg.carl_loss = pisa_mod.carl_loss
        losses_pkg.isr_p = pisa_mod.isr_p
        losses_pkg.CrossEntropyLoss = ce_mod.CrossEntropyLoss
        losses_pkg.SmoothL1Loss = sl1_mod.SmoothL1Loss
        losses_pkg.smooth_l1_loss = sl1_mod.smooth_l1_loss

        mmdet_models = types.ModuleType("mmdet.models")
        mmdet_models.HEADS = regs["HEADS"]
        mmdet_models.build_loss = models_builder.build_loss
        sys.modules["mmdet.models"] = mmdet_models
        mmdet_mod.models = mmdet_models

        # ---- dense heads ---------------------------------------------------
        _load("refmm4.models.dense_heads.base_dense_head",
              osp.join(REF_ROOT, "models/dense_heads/base_dense_head.py"))
        mixins = _stub("refmm4.models.dense_heads.dense_test_mixins")

        class BBoxTestMixin:
            pass

        mixins.BBoxTestMixin = BBoxTestMixin
        sys.modules["refmm4.models.dense_heads.dense_test_mixins"] = mixins

        _load("refmm4.models.dense_heads.anchor_head",
              osp.join(REF_ROOT, "models/dense_heads/anchor_head.py"))
        ga = _load("refmm4.models.dense_heads.guided_anchor_head",
                   osp.join(REF_ROOT,
                            "models/dense_heads/guided_anchor_head.py"))
        sabl = _load("refmm4.models.dense_heads.sabl_retina_head", REF_SABL)
        garpn = _load("refmm4.models.dense_heads.ga_rpn_head",
                      osp.join(REF_ROOT,
                               "models/dense_heads/ga_rpn_head.py"))
        models_builder.build_head = _build("HEADS")
        _load("refmm4.models.dense_heads.rpn_head",
              osp.join(REF_ROOT, "models/dense_heads/rpn_head.py"))
        crpn = _load("refmm4.models.dense_heads.cascade_rpn_head",
                     osp.join(REF_ROOT,
                              "models/dense_heads/cascade_rpn_head.py"))
        _load("refmm4.models.dense_heads.retina_head",
              osp.join(REF_ROOT, "models/dense_heads/retina_head.py"))
        pisa_r = _load(
            "refmm4.models.dense_heads.pisa_retinanet_head",
            osp.join(REF_ROOT, "models/dense_heads/pisa_retinanet_head.py"))
        _load("refmm4.models.dense_heads.ssd_head",
              osp.join(REF_ROOT, "models/dense_heads/ssd_head.py"))
        pisa_s = _load(
            "refmm4.models.dense_heads.pisa_ssd_head",
            osp.join(REF_ROOT, "models/dense_heads/pisa_ssd_head.py"))
        _load("refmm4.models.dense_heads.gfl_head",
              osp.join(REF_ROOT, "models/dense_heads/gfl_head.py"))
        ld = _load("refmm4.models.dense_heads.ld_head",
                   osp.join(REF_ROOT, "models/dense_heads/ld_head.py"))

        # DETR: anchor_free_head stand-in + transformer build stub (the
        # loss oracle fabricates decoder outputs, no transformer forward)
        afh_mod = _stub("refmm4.models.dense_heads.anchor_free_head")
        sys.modules["refmm4.models.dense_heads.anchor_free_head"] = afh_mod
        base_dense = sys.modules[
            "refmm4.models.dense_heads.base_dense_head"]

        class AnchorFreeHead(base_dense.BaseDenseHead):
            pass

        afh_mod.AnchorFreeHead = AnchorFreeHead
        mm_models_utils = types.ModuleType("mmdet.models.utils")

        class _TransformerStub(nn.Module):
            def __init__(self):
                super().__init__()
                self.embed_dims = 256
                self.decoder = types.SimpleNamespace(num_layers=2)

        mm_models_utils.build_transformer = lambda cfg: _TransformerStub()
        mm_tf = types.ModuleType("mmdet.models.utils.transformer")
        mm_tf.inverse_sigmoid = lambda x, eps=1e-5: torch.log(
            x.clamp(min=eps) / (1 - x).clamp(min=eps))
        mm_models_utils.transformer = mm_tf
        sys.modules["mmdet.models.utils"] = mm_models_utils
        sys.modules["mmdet.models.utils.transformer"] = mm_tf
        mmdet_models.utils = mm_models_utils
        detr = _load("refmm4.models.dense_heads.detr_head",
                     osp.join(REF_ROOT, "models/dense_heads/detr_head.py"))
        ddetr = _load(
            "refmm4.models.dense_heads.deformable_detr_head",
            osp.join(REF_ROOT,
                     "models/dense_heads/deformable_detr_head.py"))

        # Sparse R-CNN DIIHead (stage set loss); BBoxHead base needs the
        # mmdet.models facade modules below
        mm_builder = types.ModuleType("mmdet.models.builder")
        mm_builder.HEADS = regs["HEADS"]
        mm_builder.build_loss = models_builder.build_loss
        sys.modules["mmdet.models.builder"] = mm_builder
        mmdet_models.builder = mm_builder
        acc_mod = sys.modules["refmm4.models.losses.accuracy"]
        mm_losses = types.ModuleType("mmdet.models.losses")
        mm_losses.accuracy = acc_mod.accuracy
        sys.modules["mmdet.models.losses"] = mm_losses
        mmdet_models.losses = mm_losses
        mm_models_utils.build_linear_layer = (
            lambda cfg, in_features, out_features:
            nn.Linear(in_features, out_features))
        atss_stub = types.ModuleType("mmdet.models.dense_heads.atss_head")
        atss_stub.reduce_mean = lambda t: t
        sys.modules["mmdet.models.dense_heads.atss_head"] = atss_stub
        for pkg in ("refmm4.models.roi_heads",
                    "refmm4.models.roi_heads.bbox_heads"):
            m = _stub(pkg)
            sys.modules[pkg] = m
        _load("refmm4.models.roi_heads.bbox_heads.bbox_head",
              osp.join(REF_ROOT,
                       "models/roi_heads/bbox_heads/bbox_head.py"))
        dii = _load("refmm4.models.roi_heads.bbox_heads.dii_head",
                    osp.join(REF_ROOT,
                             "models/roi_heads/bbox_heads/dii_head.py"))
        m = _stub("refmm4.models.roi_heads.mask_heads")
        sys.modules["refmm4.models.roi_heads.mask_heads"] = m
        grid = _load("refmm4.models.roi_heads.mask_heads.grid_head",
                     osp.join(REF_ROOT,
                              "models/roi_heads/mask_heads/grid_head.py"))

        hung_mod = sys.modules[
            "refmm4.core.bbox.assigners.hungarian_assigner"]
        pseudo_mod = sys.modules["refmm4.core.bbox.samplers.pseudo_sampler"]
        ns = types.SimpleNamespace(
            LDHead=ld.LDHead,
            DETRHead=detr.DETRHead,
            DeformableDETRHead=ddetr.DeformableDETRHead,
            DIIHead=dii.DIIHead,
            GridHead=grid.GridHead,
            HungarianAssigner=hung_mod.HungarianAssigner,
            PseudoSampler=pseudo_mod.PseudoSampler,
            bbox_xyxy_to_cxcywh=transforms.bbox_xyxy_to_cxcywh,
            SABLRetinaHead=sabl.SABLRetinaHead,
            GuidedAnchorHead=ga.GuidedAnchorHead,
            GARPNHead=garpn.GARPNHead,
            StageCascadeRPNHead=crpn.StageCascadeRPNHead,
            PISARetinaHead=pisa_r.PISARetinaHead,
            PISASSDHead=pisa_s.PISASSDHead,
            RandomSampler=rnd.RandomSampler,
        )
        return ns
    finally:
        # the RandomSampler lazily imports mmdet.core.bbox.demodata at
        # CONSTRUCTION time (inside the tests), so the fake mmdet tree must
        # outlive the loader; everything else is restored.
        keep = {"mmdet", "mmdet.core", "mmdet.core.bbox",
                "mmdet.core.bbox.demodata"}
        for k, v in saved.items():
            if k in keep and v is None:
                continue
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def ref_mod():
    return _load_reference_heads3()


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


def _metas(b):
    return [dict(img_shape=(*IMG_HW, 3), pad_shape=(*IMG_HW, 3))
            for _ in range(b)]


def _sum_ref(ref):
    return {k: float(sum(float(x) for x in v) if isinstance(v, list) else v)
            for k, v in ref.items()}


def test_sabl_loss_matches_reference(ref_mod):
    """SABL retina loss (``sabl_retina_head.py:437-521``): ApproxMaxIoU
    (0.5/0.4) assignment over the 9-approx groups, focal cls avg num_pos,
    bucket-cls BCE x1.5 avg num_pos*4*side_num, bucket-offset smooth-L1
    (beta 1/9) x1.5 avg num_pos*4*offset_topk, with the BucketingBBoxCoder's
    topk-offset / neighbor-ignore encode (``bucketing_bbox_coder.py:144-266``).
    """
    B = 2
    rng = np.random.RandomState(61)
    side = 7
    cls = [rng.randn(B, NUM_CLASSES, h, w).astype(np.float32)
           for h, w in SIZES]
    bcls = [(rng.randn(B, side * 4, h, w)).astype(np.float32)
            for h, w in SIZES]
    breg = [(rng.randn(B, side * 4, h, w) * 0.5).astype(np.float32)
            for h, w in SIZES]
    gts, gt_labels = _random_gts(rng, [3, 2], min_wh=16.0)

    head = ref_mod.SABLRetinaHead(
        num_classes=NUM_CLASSES, in_channels=32, feat_channels=32,
        stacked_convs=1,
        approx_anchor_generator=dict(
            type="AnchorGenerator", octave_base_scale=4, scales_per_octave=3,
            ratios=[0.5, 1.0, 2.0], strides=list(STRIDES)),
        square_anchor_generator=dict(
            type="AnchorGenerator", ratios=[1.0], scales=[4],
            strides=list(STRIDES)),
        bbox_coder=dict(type="BucketingBBoxCoder", num_buckets=14,
                        scale_factor=3.0),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox_cls=dict(type="CrossEntropyLoss", use_sigmoid=True,
                           loss_weight=1.5),
        loss_bbox_reg=dict(type="SmoothL1Loss", beta=1.0 / 9.0,
                           loss_weight=1.5),
        train_cfg=_Cfg(assigner=dict(type="ApproxMaxIoUAssigner",
                                     pos_iou_thr=0.5, neg_iou_thr=0.4,
                                     min_pos_iou=0.0, ignore_iof_thr=-1),
                       allowed_border=-1, pos_weight=-1, debug=False))
    t = torch.from_numpy
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls],
                        [(t(bc), t(br)) for bc, br in zip(bcls, breg)],
                        [t(g) for g in gts], [t(l) for l in gt_labels],
                        _metas(B))
    ref = _sum_ref(ref)

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.sabl_retina_head import (SABLRetinaHead,
                                                             sabl_loss)

    our_head = SABLRetinaHead(num_classes=NUM_CLASSES, strides=STRIDES)
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = sabl_loss(our_head, nhwc(cls), nhwc(bcls), nhwc(breg),
                     dict(gt_bboxes=jnp.asarray(gt_b),
                          gt_labels=jnp.asarray(gt_l),
                          gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox_cls", "loss_bbox_reg"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def _ga_retina_ref_head(ref_mod):
    return ref_mod.GuidedAnchorHead(
        num_classes=NUM_CLASSES, in_channels=32, feat_channels=32,
        approx_anchor_generator=dict(
            type="AnchorGenerator", octave_base_scale=4, scales_per_octave=3,
            ratios=[0.5, 1.0, 2.0], strides=list(STRIDES)),
        square_anchor_generator=dict(
            type="AnchorGenerator", ratios=[1.0], scales=[4],
            strides=list(STRIDES)),
        anchor_coder=dict(type="DeltaXYWHBBoxCoder",
                          target_means=[0.0] * 4, target_stds=[1.0] * 4),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0] * 4, target_stds=[1.0] * 4),
        loc_filter_thr=0.01,
        loss_loc=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_shape=dict(type="BoundedIoULoss", beta=0.2, loss_weight=1.0),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="SmoothL1Loss", beta=0.04, loss_weight=1.0),
        train_cfg=_Cfg(
            ga_assigner=dict(type="ApproxMaxIoUAssigner", pos_iou_thr=0.5,
                             neg_iou_thr=0.4, min_pos_iou=0.4,
                             ignore_iof_thr=-1),
            ga_sampler=dict(type="RandomSampler", num=256, pos_fraction=0.5,
                            neg_pos_ub=-1, add_gt_as_proposals=False),
            assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                          neg_iou_thr=0.5, min_pos_iou=0.0,
                          ignore_iof_thr=-1),
            allowed_border=-1, center_ratio=0.2, ignore_ratio=0.5,
            pos_weight=-1, debug=False))


def test_ga_retina_loss_matches_reference(ref_mod):
    """GA-Retina loss (``guided_anchor_head.py:640-742`` with the
    ``ga_retinanet_r50_caffe_fpn_1x_coco.py`` train_cfg): center/ignore
    region loc targets (``ga_loc_targets`` :374-474, avg HW*B/200),
    ApproxMaxIoU(0.5/0.4/min_pos 0.4) shape targets with RandomSampler-256
    fg+bg normalization, BoundedIoU shape loss on the std-scaled anchor
    decode, and focal/smooth-L1(beta .04) cls/bbox on the per-image guided
    anchors (MaxIoU 0.5/0.5)."""
    B = 2
    rng = np.random.RandomState(67)
    cls = [rng.randn(B, NUM_CLASSES, h, w).astype(np.float32)
           for h, w in SIZES]
    bbox = [(rng.randn(B, 4, h, w) * 0.3).astype(np.float32)
            for h, w in SIZES]
    shape = [(rng.randn(B, 2, h, w) * 0.4).astype(np.float32)
             for h, w in SIZES]
    loc = [rng.randn(B, 1, h, w).astype(np.float32) for h, w in SIZES]
    gts, gt_labels = _random_gts(rng, [3, 2], min_wh=16.0)

    head = _ga_retina_ref_head(ref_mod)
    t = torch.from_numpy
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(x) for x in bbox],
                        [t(s) for s in shape], [t(x) for x in loc],
                        [t(g) for g in gts], [t(l) for l in gt_labels],
                        _metas(B))
    ref = _sum_ref(ref)

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.ga_retina_head import (GARetinaHead,
                                                           ga_retina_loss)

    our_head = GARetinaHead(num_classes=NUM_CLASSES, strides=STRIDES)
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = ga_retina_loss(
        our_head, (nhwc(cls), nhwc(bbox), nhwc(shape), nhwc(loc)),
        dict(gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox", "loss_shape", "loss_loc"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_ga_rpn_loss_matches_reference(ref_mod):
    """GA-RPN loss (``ga_rpn_head.py:47-69`` + ``guided_anchor_head.py:
    640-742`` with the ``ga_rpn_r50_caffe_fpn_1x_coco.py`` train_cfg):
    class-agnostic BCE/smooth-L1 on the std-scaled guided anchors
    (anchor_coder stds .07/.14), MaxIoU(0.7/0.3/min_pos .3) with
    allowed_border=0 inside-filtering, ApproxMaxIoU shape targets with
    min_pos_iou=0.3 and RandomSampler-256 fg+bg normalization. The *cls*
    sampler uses a keep-everything num (our dense loss has no random
    subsample); the *shape* sampler keeps the real 256."""
    B = 2
    rng = np.random.RandomState(71)
    cls = [rng.randn(B, 1, h, w).astype(np.float32) for h, w in SIZES]
    bbox = [(rng.randn(B, 4, h, w) * 0.3).astype(np.float32)
            for h, w in SIZES]
    shape = [(rng.randn(B, 2, h, w) * 0.4).astype(np.float32)
             for h, w in SIZES]
    loc = [rng.randn(B, 1, h, w).astype(np.float32) for h, w in SIZES]
    gts, _ = _random_gts(rng, [3, 2], min_wh=24.0)

    num_pos_total = sum(h * w for h, w in SIZES)
    head = ref_mod.GARPNHead(
        in_channels=32, feat_channels=32,
        approx_anchor_generator=dict(
            type="AnchorGenerator", octave_base_scale=8, scales_per_octave=3,
            ratios=[0.5, 1.0, 2.0], strides=list(STRIDES)),
        square_anchor_generator=dict(
            type="AnchorGenerator", ratios=[1.0], scales=[8],
            strides=list(STRIDES)),
        anchor_coder=dict(type="DeltaXYWHBBoxCoder",
                          target_means=[0.0] * 4,
                          target_stds=[0.07, 0.07, 0.14, 0.14]),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=[0.0] * 4,
                        target_stds=[0.07, 0.07, 0.11, 0.11]),
        loc_filter_thr=0.01,
        loss_loc=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_shape=dict(type="BoundedIoULoss", beta=0.2, loss_weight=1.0),
        loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True,
                      loss_weight=1.0),
        loss_bbox=dict(type="SmoothL1Loss", beta=1.0, loss_weight=1.0),
        train_cfg=_Cfg(
            ga_assigner=dict(type="ApproxMaxIoUAssigner", pos_iou_thr=0.7,
                             neg_iou_thr=0.3, min_pos_iou=0.3,
                             ignore_iof_thr=-1),
            ga_sampler=dict(type="RandomSampler", num=256, pos_fraction=0.5,
                            neg_pos_ub=-1, add_gt_as_proposals=False),
            assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                          neg_iou_thr=0.3, min_pos_iou=0.3,
                          ignore_iof_thr=-1, match_low_quality=True),
            sampler=dict(type="RandomSampler", num=4 * num_pos_total,
                         pos_fraction=0.5, neg_pos_ub=-1,
                         add_gt_as_proposals=False),
            allowed_border=0, center_ratio=0.2, ignore_ratio=0.5,
            pos_weight=-1, debug=False))
    t = torch.from_numpy
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(x) for x in bbox],
                        [t(s) for s in shape], [t(x) for x in loc],
                        [t(g) for g in gts], _metas(B))
    ref = _sum_ref(ref)

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.ga_rpn_head import (GARPNHead,
                                                        ga_rpn_loss)

    our_head = GARPNHead(strides=STRIDES, octave_base_scale=8)
    gt_b, gt_l, gt_v = _pad_gts(gts, [np.zeros(len(g), np.int64)
                                      for g in gts])
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = ga_rpn_loss(
        our_head, (nhwc(cls), nhwc(bbox), nhwc(shape), nhwc(loc)),
        dict(gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v),
             img_shapes=jnp.asarray([[IMG_HW[0], IMG_HW[1]]] * B,
                                    dtype=jnp.float32)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_anchor_shape",
              "loss_anchor_loc"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_cascade_rpn_loss_matches_reference(ref_mod):
    """Cascade RPN two-stage loss (``cascade_rpn_head.py:93-501`` with the
    ``crpn_r50_caffe_fpn_1x_coco.py`` cfg): stage 1 RegionAssigner
    (sequential ignore/center overwrites, adjacent-level ignore applied
    last) + linear IoU x10 with the total-labels/200 avg factor; stage 2
    MaxIoU(0.7/0.7/min_pos .3) on refine_bboxes' image-clipped decode
    (stds .1/.5), BCE + linear IoU x10 averaged by pos+neg. The stage-2
    cls sampler uses a keep-everything num (dense loss, no random
    subsample)."""
    B = 2
    rng = np.random.RandomState(73)
    r1 = [(rng.randn(B, 4, h, w) * 0.3).astype(np.float32)
          for h, w in SIZES]
    s2 = [rng.randn(B, 1, h, w).astype(np.float32) for h, w in SIZES]
    r2 = [(rng.randn(B, 4, h, w) * 0.3).astype(np.float32)
          for h, w in SIZES]
    gts, _ = _random_gts(rng, [3, 2], min_wh=24.0)
    num_total = sum(h * w for h, w in SIZES)

    anchor_gen = dict(type="AnchorGenerator", scales=[8], ratios=[1.0],
                      strides=list(STRIDES))
    stage1 = ref_mod.StageCascadeRPNHead(
        in_channels=32, feat_channels=32, anchor_generator=dict(anchor_gen),
        adapt_cfg=dict(type="dilation", dilation=3), bridged_feature=True,
        sampling=False, with_cls=False, reg_decoded_bbox=True,
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=(0.0,) * 4,
                        target_stds=(0.1, 0.1, 0.5, 0.5)),
        loss_bbox=dict(type="IoULoss", linear=True, loss_weight=10.0),
        train_cfg=_Cfg(assigner=dict(type="RegionAssigner",
                                     center_ratio=0.2, ignore_ratio=0.5),
                       allowed_border=-1, pos_weight=-1, debug=False))
    stage2 = ref_mod.StageCascadeRPNHead(
        in_channels=32, feat_channels=32, anchor_generator=dict(anchor_gen),
        adapt_cfg=dict(type="offset"), bridged_feature=False,
        sampling=True, with_cls=True, reg_decoded_bbox=True,
        bbox_coder=dict(type="DeltaXYWHBBoxCoder",
                        target_means=(0.0,) * 4,
                        target_stds=(0.05, 0.05, 0.1, 0.1)),
        loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=True,
                      loss_weight=1.0),
        loss_bbox=dict(type="IoULoss", linear=True, loss_weight=10.0),
        train_cfg=_Cfg(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.7,
                                     neg_iou_thr=0.7, min_pos_iou=0.3,
                                     ignore_iof_thr=-1),
                       sampler=dict(type="RandomSampler", num=4 * num_total,
                                    pos_fraction=0.5, neg_pos_ub=-1,
                                    add_gt_as_proposals=False),
                       allowed_border=-1, pos_weight=-1, debug=False))
    t = torch.from_numpy
    metas = _metas(B)
    with torch.no_grad():
        anchor_list, valid_list = stage1.get_anchors(
            [s for s in SIZES], metas, device="cpu")
        l1 = stage1.loss(anchor_list, valid_list, [None] * len(SIZES),
                         [t(x) for x in r1], [t(g) for g in gts], metas)
        anchor_list2 = stage1.refine_bboxes(anchor_list,
                                            [t(x) for x in r1], metas)
        l2 = stage2.loss(anchor_list2, valid_list, [t(x) for x in s2],
                         [t(x) for x in r2], [t(g) for g in gts], metas)
    ref = dict(loss_rpn_reg_s1=_sum_ref(l1)["loss_rpn_reg"],
               loss_rpn_cls=_sum_ref(l2)["loss_rpn_cls"],
               loss_rpn_reg_s2=_sum_ref(l2)["loss_rpn_reg"])

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.cascade_rpn_head import (
        CascadeRPNHead, cascade_rpn_loss)

    our_head = CascadeRPNHead(strides=STRIDES, anchor_scale=8.0)
    gt_b, gt_l, gt_v = _pad_gts(gts, [np.zeros(len(g), np.int64)
                                      for g in gts])
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = cascade_rpn_loss(
        our_head, (nhwc(r1), nhwc(s2), nhwc(r2), None),
        dict(gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v),
             img_shapes=jnp.asarray([[IMG_HW[0], IMG_HW[1]]] * B,
                                    dtype=jnp.float32)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_rpn_reg_s1", "loss_rpn_cls", "loss_rpn_reg_s2"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_pisa_retina_loss_matches_reference(ref_mod):
    """PISA RetinaNet (``pisa_retinanet_head.py:21-154`` + ``losses/
    pisa_loss.py:8-183`` with the pisa_retinanet cfg): ISR-P IoU-HLR
    reweighting of the positive focal weights (two-level rank, loss-sum-
    preserving rescale), SmoothL1(beta .11) bbox loss, CARL weighted by
    normalized sigmoid scores at the gt class / num_pos."""
    B = 2
    rng = np.random.RandomState(79)
    na = 9
    cls = [rng.randn(B, na * NUM_CLASSES, h, w).astype(np.float32)
           for h, w in SIZES]
    bbox = [(rng.randn(B, na * 4, h, w) * 0.3).astype(np.float32)
            for h, w in SIZES]
    gts, gt_labels = _random_gts(rng, [4, 3], min_wh=12.0)

    head = ref_mod.PISARetinaHead(
        num_classes=NUM_CLASSES, in_channels=32, feat_channels=32,
        stacked_convs=1,
        anchor_generator=dict(type="AnchorGenerator", octave_base_scale=4,
                              scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                              strides=list(STRIDES)),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder", target_means=[0.0] * 4,
                        target_stds=[1.0] * 4),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="SmoothL1Loss", beta=0.11, loss_weight=1.0),
        train_cfg=_Cfg(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                     neg_iou_thr=0.4, min_pos_iou=0.0,
                                     ignore_iof_thr=-1),
                       isr=dict(k=2.0, bias=0.0),
                       carl=dict(k=1.0, bias=0.2),
                       allowed_border=-1, pos_weight=-1, debug=False))
    t = torch.from_numpy
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(x) for x in bbox],
                        [t(g) for g in gts], [t(l) for l in gt_labels],
                        _metas(B))
    ref = _sum_ref(ref)

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.pisa_heads import (PISARetinaHead,
                                                       pisa_retina_loss)

    our_head = PISARetinaHead(
        num_classes=NUM_CLASSES, strides=STRIDES,
        loss_bbox=dict(type="SmoothL1Loss", beta=0.11, loss_weight=1.0))
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = pisa_retina_loss(
        our_head, nhwc(cls), nhwc(bbox),
        dict(gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox", "loss_carl"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_ld_loss_matches_reference(ref_mod):
    """LD head (``ld_head.py:10-261`` with the ld_r18 cfg): the GFL losses
    plus KL distillation of the per-side distance distributions from the
    teacher's bbox branch (T=10, x0.25), weighted by the student's max
    sigmoid class score at positives, per-level sum/4 — NOT renormalized by
    the quality-weight sum, unlike loss_bbox/dfl."""
    B = 2
    rng = np.random.RandomState(89)
    nb = 17
    cls = [rng.randn(B, NUM_CLASSES, h, w).astype(np.float32)
           for h, w in SIZES]
    bbox = [rng.randn(B, 4 * nb, h, w).astype(np.float32)
            for h, w in SIZES]
    soft = [rng.randn(B, 4 * nb, h, w).astype(np.float32)
            for h, w in SIZES]
    gts, gt_labels = _random_gts(rng, [3, 2], min_wh=16.0)

    head = ref_mod.LDHead(
        num_classes=NUM_CLASSES, in_channels=32, feat_channels=32,
        stacked_convs=1,
        anchor_generator=dict(type="AnchorGenerator", ratios=[1.0],
                              octave_base_scale=8, scales_per_octave=1,
                              strides=list(STRIDES)),
        loss_cls=dict(type="QualityFocalLoss", use_sigmoid=True,
                      beta=2.0, loss_weight=1.0),
        loss_dfl=dict(type="DistributionFocalLoss", loss_weight=0.25),
        loss_bbox=dict(type="GIoULoss", loss_weight=2.0),
        loss_ld=dict(type="KnowledgeDistillationKLDivLoss",
                     loss_weight=0.25, T=10),
        reg_max=16,
        train_cfg=_Cfg(assigner=dict(type="ATSSAssigner", topk=9),
                       allowed_border=-1, pos_weight=-1, debug=False))
    t = torch.from_numpy
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(x) for x in bbox],
                        [t(g) for g in gts], [t(l) for l in gt_labels],
                        [t(s) for s in soft], _metas(B))
    ref = _sum_ref(ref)

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.ld_head import LDHead, ld_loss

    our_head = LDHead(num_classes=NUM_CLASSES, strides=STRIDES)
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = ld_loss(our_head, nhwc(cls), nhwc(bbox), nhwc(soft),
                   dict(gt_bboxes=jnp.asarray(gt_b),
                        gt_labels=jnp.asarray(gt_l),
                        gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox", "loss_dfl", "loss_ld"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_detr_loss_matches_reference(ref_mod):
    """DETR head loss (``detr_head.py:267-560``): HungarianAssigner over
    ClassificationCost(1) + BBoxL1Cost(5, normalized cxcywh) + IoUCost(giou,
    2), softmax CE with bg class weight 0.1 (avg = pos + 0.1*neg), L1 x5 and
    GIoU x2 averaged by num_pos, repeated per decoder layer (aux d0.*)."""
    B = 2
    L_DEC = 2
    Q = 20
    rng = np.random.RandomState(97)
    cls = rng.randn(L_DEC, B, Q, NUM_CLASSES + 1).astype(np.float32)
    bbox = (rng.rand(L_DEC, B, Q, 4) * 0.9 + 0.05).astype(np.float32)
    gts, gt_labels = _random_gts(rng, [3, 2], min_wh=16.0)

    head = ref_mod.DETRHead(
        num_classes=NUM_CLASSES, in_channels=32,
        num_query=Q,
        transformer=dict(act_cfg=dict(type="ReLU")),
        loss_cls=dict(type="CrossEntropyLoss", bg_cls_weight=0.1,
                      use_sigmoid=False, loss_weight=1.0, class_weight=1.0),
        loss_bbox=dict(type="L1Loss", loss_weight=5.0),
        loss_iou=dict(type="GIoULoss", loss_weight=2.0),
        train_cfg=dict(assigner=dict(
            type="HungarianAssigner",
            cls_cost=dict(type="ClassificationCost", weight=1.0),
            reg_cost=dict(type="BBoxL1Cost", weight=5.0),
            iou_cost=dict(type="IoUCost", iou_mode="giou", weight=2.0))))
    t = torch.from_numpy
    with torch.no_grad():
        ref = head.loss([t(cls)], [t(bbox)],
                        [t(g) for g in gts], [t(l) for l in gt_labels],
                        _metas(B))
    ref = {k: float(v) for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.detr_head import DETRHead, detr_loss

    our_head = DETRHead(num_classes=NUM_CLASSES, num_query=Q)
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    ours = detr_loss(
        our_head,
        (jnp.asarray(cls.transpose(1, 0, 2, 3)),
         jnp.asarray(bbox.transpose(1, 0, 2, 3))),
        dict(images=jnp.zeros((B, *IMG_HW, 3)),
             img_shapes=jnp.asarray([[IMG_HW[0], IMG_HW[1]]] * B,
                                    dtype=jnp.float32),
             gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    pairs = [("loss_cls", "loss_cls"), ("loss_bbox", "loss_bbox"),
             ("loss_iou", "loss_iou"), ("d0.loss_cls", "loss_cls_aux0"),
             ("d0.loss_bbox", "loss_bbox_aux0"),
             ("d0.loss_iou", "loss_iou_aux0")]
    for rk, ok in pairs:
        np.testing.assert_allclose(
            ours[ok], ref[rk], rtol=5e-5, atol=1e-6,
            err_msg=f"{rk}: ours={ours[ok]} ref={ref[rk]}")


def test_deformable_detr_loss_matches_reference(ref_mod):
    """Deformable-DETR loss (``deformable_detr_head.py:183-266``): the DETR
    set loss with sigmoid focal cls (x2, avg num_pos) and FocalLossCost(2) /
    BBoxL1Cost(5) / IoUCost(giou, 2) matching, per decoder layer."""
    B = 2
    L_DEC = 2
    Q = 20
    rng = np.random.RandomState(101)
    cls = rng.randn(L_DEC, B, Q, NUM_CLASSES).astype(np.float32)
    bbox = (rng.rand(L_DEC, B, Q, 4) * 0.9 + 0.05).astype(np.float32)
    gts, gt_labels = _random_gts(rng, [3, 2], min_wh=16.0)

    head = ref_mod.DeformableDETRHead(
        num_classes=NUM_CLASSES, in_channels=32,
        num_query=Q,
        transformer=dict(act_cfg=dict(type="ReLU")),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=2.0),
        loss_bbox=dict(type="L1Loss", loss_weight=5.0),
        loss_iou=dict(type="GIoULoss", loss_weight=2.0),
        train_cfg=dict(assigner=dict(
            type="HungarianAssigner",
            cls_cost=dict(type="FocalLossCost", weight=2.0),
            reg_cost=dict(type="BBoxL1Cost", weight=5.0),
            iou_cost=dict(type="IoUCost", iou_mode="giou", weight=2.0))))
    t = torch.from_numpy
    with torch.no_grad():
        ref = head.loss(t(cls), t(bbox), None, None,
                        [t(g) for g in gts], [t(l) for l in gt_labels],
                        _metas(B))
    ref = {k: float(v) for k, v in ref.items()}

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.deformable_detr_head import (
        DeformableDETRHead, deformable_detr_loss)

    our_head = DeformableDETRHead(num_classes=NUM_CLASSES, num_query=Q)
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    ours = deformable_detr_loss(
        our_head,
        (jnp.asarray(cls.transpose(1, 0, 2, 3)),
         jnp.asarray(bbox.transpose(1, 0, 2, 3))),
        dict(images=jnp.zeros((B, *IMG_HW, 3)),
             img_shapes=jnp.asarray([[IMG_HW[0], IMG_HW[1]]] * B,
                                    dtype=jnp.float32),
             gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    pairs = [("loss_cls", "loss_cls"), ("loss_bbox", "loss_bbox"),
             ("loss_iou", "loss_iou"), ("d0.loss_cls", "loss_cls_aux0"),
             ("d0.loss_bbox", "loss_bbox_aux0"),
             ("d0.loss_iou", "loss_iou_aux0")]
    for rk, ok in pairs:
        np.testing.assert_allclose(
            ours[ok], ref[rk], rtol=5e-5, atol=1e-6,
            err_msg=f"{rk}: ours={ours[ok]} ref={ref[rk]}")


def test_sparse_rcnn_stage_loss_matches_reference(ref_mod):
    """Sparse R-CNN stage set loss (``sparse_roi_head.py:195-225`` +
    ``dii_head.py:197-353``): HungarianAssigner over FocalLossCost(2) +
    BBoxL1Cost(5, box_format='xywh' — normalized CXCYWH) + IoUCost(giou, 2),
    then focal cls over all proposals and L1 (whwh-normalized) + GIoU on
    positives, all averaged by num_pos."""
    B = 2
    P = 12
    rng = np.random.RandomState(103)
    H, W = IMG_HW
    cls = rng.randn(B, P, NUM_CLASSES).astype(np.float32)
    # decoded stage boxes: random xyxy inside the image
    x1 = rng.rand(B, P) * W * 0.6
    y1 = rng.rand(B, P) * H * 0.6
    bw = rng.rand(B, P) * W * 0.35 + 8
    bh = rng.rand(B, P) * H * 0.35 + 8
    boxes = np.stack([x1, y1, np.minimum(x1 + bw, W - 1),
                      np.minimum(y1 + bh, H - 1)], -1).astype(np.float32)
    gts, gt_labels = _random_gts(rng, [3, 2], min_wh=16.0)

    head = ref_mod.DIIHead(
        num_classes=NUM_CLASSES, in_channels=32,
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=2.0),
        loss_bbox=dict(type="L1Loss", loss_weight=5.0),
        loss_iou=dict(type="GIoULoss", loss_weight=2.0),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder", target_means=[0.0] * 4,
                        target_stds=[0.5, 0.5, 1.0, 1.0],
                        clip_border=False))
    assigner = ref_mod.HungarianAssigner(
        cls_cost=dict(type="FocalLossCost", weight=2.0),
        reg_cost=dict(type="BBoxL1Cost", weight=5.0, box_format="xywh"),
        iou_cost=dict(type="IoUCost", iou_mode="giou", weight=2.0))
    sampler = ref_mod.PseudoSampler()
    t = torch.from_numpy
    whwh = torch.tensor([W, H, W, H], dtype=torch.float32)
    with torch.no_grad():
        sampling_results = []
        for i in range(B):
            ccwh = ref_mod.bbox_xyxy_to_cxcywh(t(boxes[i]) / whwh[None])
            ar = assigner.assign(ccwh, t(cls[i]), t(gts[i]),
                                 t(gt_labels[i]), _metas(B)[i])
            sampling_results.append(
                sampler.sample(ar, t(boxes[i]), t(gts[i])))
        targets = head.get_targets(sampling_results,
                                   [t(g) for g in gts],
                                   [t(l) for l in gt_labels],
                                   _Cfg(pos_weight=1), True)
        ref = head.loss(t(cls).view(-1, NUM_CLASSES), t(boxes).view(-1, 4),
                        *targets,
                        imgs_whwh=whwh[None, None].repeat(B, P, 1))
    ref = {k: float(v) for k, v in ref.items() if k != "pos_acc"}

    import jax.numpy as jnp
    from dsl_tpu.models.roi_heads.sparse_rcnn import sparse_stage_set_loss

    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    whwh_j = jnp.asarray([[W, H, W, H]] * B, jnp.float32)
    num_gt = jnp.asarray(float(sum(len(g) for g in gts)))
    ours = sparse_stage_set_loss(
        jnp.asarray(cls), jnp.asarray(boxes),
        jnp.clip(jnp.asarray(gt_l), 0, NUM_CLASSES - 1),
        jnp.asarray(gt_b), jnp.asarray(gt_v), whwh_j, NUM_CLASSES, num_gt)
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox", "loss_iou"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")


def test_pisa_roi_isr_carl_match_reference(ref_mod):
    """Two-stage ISR-P/CARL branch (``pisa_loss.py:8-183`` with (N, 5)
    rois, CLASS-SPECIFIC deltas (N, C*4) and softmax CE — the
    ``pisa_roi_head.py`` configuration): the reference isr_p rewrites the
    positive label weights; our isr_p_weights + rescale must produce the
    same weighted CE, and carl_loss the same score-weighted smooth-L1."""
    rng = np.random.RandomState(109)
    nc = 6
    B, P, K = 2, 16, 4
    N = B * P
    H, W = IMG_HW
    # per-image gts and roi assignment (first 5 rois of each image pos)
    gx1 = rng.rand(B, K) * W * 0.5
    gy1 = rng.rand(B, K) * H * 0.5
    gw = rng.rand(B, K) * 40 + 16
    gh = rng.rand(B, K) * 40 + 16
    gts = np.stack([gx1, gy1, gx1 + gw, gy1 + gh], -1).astype(np.float32)
    labels = np.full((B, P), nc, np.int64)
    assigned = np.zeros((B, P), np.int64)
    for i in range(B):
        labels[i, :5] = rng.randint(0, nc, size=5)
        assigned[i, :5] = rng.randint(0, K, size=5)
    rois = np.zeros((B, P, 4), np.float32)
    for i in range(B):
        for j in range(P):
            g = gts[i, assigned[i, j]]
            jit = rng.randn(4) * 4
            rois[i, j] = [max(g[0] + jit[0], 0), max(g[1] + jit[1], 0),
                          min(g[2] + jit[2], W - 1),
                          min(g[3] + jit[3], H - 1)]
    cls = rng.randn(N, nc + 1).astype(np.float32)
    bbox_pred = (rng.randn(N, nc * 4) * 0.3).astype(np.float32)

    t = torch.from_numpy
    import importlib
    pisa_mod = sys.modules.get("refmm4.models.losses.pisa_loss")
    ce_mod = sys.modules.get("refmm4.models.losses.cross_entropy_loss")
    sl1_mod = sys.modules.get("refmm4.models.losses.smooth_l1_loss")
    coder_mod = sys.modules.get(
        "refmm4.core.bbox.coder.delta_xywh_bbox_coder")
    coder = coder_mod.DeltaXYWHBBoxCoder(target_means=[0.0] * 4,
                                         target_stds=[0.1, 0.1, 0.2, 0.2])
    # flat (image-major) targets, encoded per roi against its gt
    flat_rois = np.concatenate(
        [np.repeat(np.arange(B), P)[:, None].astype(np.float32),
         rois.reshape(-1, 4)], axis=1)
    gt_per_roi = np.stack([gts[i, assigned[i, j]]
                           for i in range(B) for j in range(P)])
    with torch.no_grad():
        enc = coder.encode(t(rois.reshape(-1, 4)), t(gt_per_roi))
        flat_labels = t(labels.reshape(-1))
        pos = labels.reshape(-1) < nc
        bbox_targets = torch.zeros(N, 4)
        bbox_weights = torch.zeros(N, 4)
        bbox_targets[t(pos)] = enc[t(pos)]
        bbox_weights[t(pos)] = 1.0
        label_weights = torch.ones(N)
        srs = [types.SimpleNamespace(
            pos_assigned_gt_inds=t(assigned[i, :5])) for i in range(B)]
        new_t = pisa_mod.isr_p(
            t(cls), t(bbox_pred),
            (flat_labels, label_weights, bbox_targets, bbox_weights),
            t(flat_rois), srs, loss_cls=ce_mod.CrossEntropyLoss(),
            bbox_coder=coder, k=2.0, bias=0.0, num_class=nc)
        _, new_lw, _, _ = new_t
        ce_ref = torch.nn.functional.cross_entropy(
            t(cls), flat_labels, reduction="none")
        ref_loss_cls = float((ce_ref * new_lw).sum() / N)
        carl = pisa_mod.carl_loss(
            t(cls), flat_labels, t(bbox_pred), bbox_targets,
            sl1_mod.SmoothL1Loss(beta=1.0), k=1.0, bias=0.2,
            avg_factor=N, sigmoid=False, num_class=nc)
        ref_loss_carl = float(carl["loss_carl"])

    import jax
    import jax.numpy as jnp
    from dsl_tpu.core import losses as L
    from dsl_tpu.core.boxes import bbox2delta, bbox_overlaps, delta2bbox
    from dsl_tpu.core.pisa import (carl_weights, isr_p_rescale,
                                   isr_p_weights)

    jl = jnp.asarray(labels.reshape(-1).astype(np.int32))
    pos_mask = jnp.asarray(pos)
    stds = (0.1, 0.1, 0.2, 0.2)
    reg = jnp.asarray(bbox_pred).reshape(N, nc, 4)
    cls_idx = jnp.clip(jl, 0, nc - 1)
    reg_sel = jnp.take_along_axis(
        reg, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]
    decoded = delta2bbox(jnp.asarray(rois.reshape(-1, 4)), reg_sel,
                         (0, 0, 0, 0), stds)
    ious = bbox_overlaps(decoded, jnp.asarray(gt_per_roi), is_aligned=True)
    gt_ids = jnp.asarray(
        (np.repeat(np.arange(B), P) * K + assigned.reshape(-1))
        .astype(np.int32))
    isr_w = isr_p_weights(jl, pos_mask, gt_ids, ious, nc, k=2.0, bias=0.0)
    ce = L.cross_entropy(jnp.asarray(cls), jl, reduction="none")
    w = isr_p_rescale(ce, jnp.ones((N,)), isr_w, pos_mask)
    ours_loss_cls = float(jnp.sum(ce * w) / N)
    np.testing.assert_allclose(ours_loss_cls, ref_loss_cls, rtol=5e-5,
                               atol=1e-6, err_msg="isr_p weighted CE")

    tgt = bbox2delta(jnp.asarray(rois.reshape(-1, 4)),
                     jnp.asarray(gt_per_roi), (0, 0, 0, 0), stds)
    tgt = tgt * pos_mask[:, None]
    cw = carl_weights(jnp.asarray(cls), jl, pos_mask, nc, k=1.0,
                      bias=0.2, sigmoid=False)
    per_l1 = L.smooth_l1_loss(reg_sel, tgt, reduction="none").sum(-1)
    ours_loss_carl = float(jnp.sum(per_l1 * cw) / N)
    np.testing.assert_allclose(ours_loss_carl, ref_loss_carl, rtol=5e-5,
                               atol=1e-6, err_msg="carl")


def test_grid_targets_and_loss_match_reference(ref_mod):
    """Grid R-CNN grid head (``grid_head.py:223-295``): 2x-expanded roi,
    per-grid-point circle splat (int-truncated centers, radius 1) on the
    whole map, Grid-R-CNN-Plus sub-region crops, BCE x15 on fused+unfused —
    incl. the expanded-w <= grid_size small-box skip."""
    N = 6
    rng = np.random.RandomState(107)
    x1 = rng.rand(N) * 60
    y1 = rng.rand(N) * 50
    w = rng.rand(N) * 40 + 12
    h = rng.rand(N) * 40 + 12
    w[0] = 1.2            # expanded width 2.4 <= grid_size 3 -> skipped
    rois = np.stack([x1, y1, x1 + w, y1 + h], -1).astype(np.float32)
    gts = rois + rng.randn(N, 4).astype(np.float32) * 3.0

    head = ref_mod.GridHead(
        grid_points=9, num_convs=2, in_channels=32,
        point_feat_channels=8,
        loss_grid=dict(type="CrossEntropyLoss", use_sigmoid=True,
                       loss_weight=15.0),
        norm_cfg=dict(type="GN", num_groups=36))
    t = torch.from_numpy
    sr = types.SimpleNamespace(pos_bboxes=t(rois), pos_gt_bboxes=t(gts))
    with torch.no_grad():
        ref_t = head.get_targets([sr], _Cfg(pos_radius=1))
        half = ref_t.shape[-1]
        fused = rng.randn(N, 9, half, half).astype(np.float32)
        unfused = rng.randn(N, 9, half, half).astype(np.float32)
        ref_loss = float(head.loss(
            dict(fused=t(fused), unfused=t(unfused)), ref_t)["loss_grid"])

    import jax.numpy as jnp
    from dsl_tpu.models.roi_heads.grid_head import (GridHead, grid_loss,
                                                    grid_targets)

    our_head = GridHead(grid_points=9, roi_size=14)
    valid = jnp.ones((N,), jnp.float32)
    ours_t = grid_targets(our_head, jnp.asarray(rois), jnp.asarray(gts),
                          valid)
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(ours_t), -1, 1), ref_t.numpy(),
        err_msg="grid sub-targets differ")
    ours_loss = float(grid_loss(
        our_head,
        dict(fused=jnp.moveaxis(jnp.asarray(fused), 1, -1),
             unfused=jnp.moveaxis(jnp.asarray(unfused), 1, -1)),
        ours_t, valid))
    np.testing.assert_allclose(ours_loss, ref_loss, rtol=5e-5, atol=1e-6)


def test_pisa_ssd_loss_matches_reference(ref_mod):
    """PISA SSD (``pisa_ssd_head.py:11-139``): per-image OHEM CE on the
    ISR-P-reweighted labels (plain-CE rescale normalizer), SmoothL1(beta 1)
    bbox loss, CARL with softmax scores; all averaged by num_total_pos."""
    B = 2
    rng = np.random.RandomState(83)
    na = 6
    cls = [rng.randn(B, na * (NUM_CLASSES + 1), h, w).astype(np.float32)
           for h, w in SIZES]
    bbox = [(rng.randn(B, na * 4, h, w) * 0.3).astype(np.float32)
            for h, w in SIZES]
    gts, gt_labels = _random_gts(rng, [4, 3], min_wh=12.0)

    head = ref_mod.PISASSDHead(
        num_classes=NUM_CLASSES, in_channels=[32] * 5,
        anchor_generator=dict(type="AnchorGenerator", scales=[4, 8],
                              ratios=[0.5, 1.0, 2.0],
                              strides=list(STRIDES)),
        bbox_coder=dict(type="DeltaXYWHBBoxCoder", target_means=[0.0] * 4,
                        target_stds=[0.1, 0.1, 0.2, 0.2]),
        train_cfg=_Cfg(assigner=dict(type="MaxIoUAssigner", pos_iou_thr=0.5,
                                     neg_iou_thr=0.5, min_pos_iou=0.0,
                                     ignore_iof_thr=-1,
                                     gt_max_assign_all=False),
                       isr=dict(k=2.0, bias=0.0),
                       carl=dict(k=1.0, bias=0.2),
                       smoothl1_beta=1.0, allowed_border=-1,
                       pos_weight=-1, neg_pos_ratio=3, debug=False))
    t = torch.from_numpy
    with torch.no_grad():
        ref = head.loss([t(c) for c in cls], [t(x) for x in bbox],
                        [t(g) for g in gts], [t(l) for l in gt_labels],
                        _metas(B))
    ref = _sum_ref(ref)

    import jax.numpy as jnp
    from dsl_tpu.models.dense_heads.pisa_heads import (PISASSDHead,
                                                       pisa_ssd_loss)

    our_head = PISASSDHead(num_classes=NUM_CLASSES, strides=STRIDES,
                           anchor_scales=(4.0, 8.0),
                           anchor_ratios=(0.5, 1.0, 2.0),
                           target_stds=(0.1, 0.1, 0.2, 0.2),
                           pos_iou_thr=0.5, neg_iou_thr=0.5,
                           neg_pos_ratio=3)
    gt_b, gt_l, gt_v = _pad_gts(gts, gt_labels)
    nhwc = lambda arrs: tuple(jnp.asarray(a.transpose(0, 2, 3, 1))
                              for a in arrs)
    ours = pisa_ssd_loss(
        our_head, nhwc(cls), nhwc(bbox),
        dict(gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
             gt_valid=jnp.asarray(gt_v)))
    ours = {k: float(v) for k, v in ours.items()}
    for k in ("loss_cls", "loss_bbox", "loss_carl"):
        np.testing.assert_allclose(
            ours[k], ref[k], rtol=5e-5, atol=1e-6,
            err_msg=f"{k}: ours={ours[k]} ref={ref[k]}")
