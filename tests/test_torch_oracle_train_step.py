"""Backward + optimizer oracle: the full train step vs the reference's code.

The last un-oracled correctness layer (VERDICT r3 #2): every forward / loss /
predict / import path is pinned to the reference's own torch code, but
gradients and the SGD update were only self-tested. This test runs THREE full
training iterations on both sides from identical weights (shared ``.pth`` via
the proven import path) and identical batches, and asserts the per-parameter
updates and the loss trajectory match:

reference side (torch CPU, reference's own modules):
  RLA_ResNet (real ``resnet_rla.py``) -> real ``fpn.py`` -> real DSL
  ``fcos_head.py`` forward; ``FCOSHead.loss`` with ignore boxes, per-source
  ``loss_weight`` and the si-soft extra input; ``_parse_losses`` summing
  (``models/detectors/base.py:175-208``); ``clip_grad_norm_(35, 2)``
  (mmcv ``OptimizerHook``, ``apis/train.py:148-156``); ``torch.optim.SGD``
  (lr 0.01, momentum 0.9, wd 1e-4) with mmcv ``DefaultOptimizerConstructor``
  paramwise bias_lr_mult=2 / bias_decay_mult=0 (flagship config
  ``configs/fcos_semi/...singlestage.py:182-199``) under the linear-warmup lr
  schedule; ``frozen_stages=1`` + ``norm_eval`` via the reference backbone's
  own ``train()`` (``resnet_rla.py:333-385``).

repo side: ``make_train_step`` + ``build_optimizer_from_cfg`` +
``frozen_backbone_mask`` — the exact production wiring.

Checks: 3-step loss trajectory (incl. the si-soft warmup gate flipping at
iter 2), per-parameter deltas after 3 steps (momentum buffer coupling), and
frozen stem/stage-1/stage_bn3_2 params staying bit-identical.

Skipped automatically when /root/reference or torch is unavailable.
"""

import os.path as osp
import sys

import cv2
import numpy as np
import pytest

REF_ROOT = "/root/reference/mmdet"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not osp.exists(osp.join(REF_ROOT, "models/dense_heads/fcos_head.py")),
    reason="reference tree not available")

IMG = 128
NUM_CLASSES = 6
LAYERS = [1, 1, 1, 3]     # reference RLA hardcodes stage_bns[3][2]
FEAT = 64
STACKED = 2
BASE_LR, MOMENTUM, WD = 0.01, 0.9, 1e-4
WARMUP_ITERS, WARMUP_RATIO = 500, 1.0 / 3.0
CLIP = 35.0
N_STEPS = 3

HEAD_KW = dict(num_classes=NUM_CLASSES, in_channels=FEAT,
               feat_channels=FEAT, stacked_convs=STACKED,
               strides=[8, 16, 32, 64, 128], norm_on_bbox=True,
               centerness_on_reg=True, center_sampling=True,
               center_sample_radius=1.5, conv_bias=True,
               loss_weight=2.0, soft_weight=1.0, soft_warm_up=1)
LOSS_CFGS = dict(
    loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                  alpha=0.25, loss_weight=1.0),
    loss_bbox=dict(type="GIoULoss", loss_weight=1.0),
    loss_centerness=dict(type="CrossEntropyLoss", use_sigmoid=True,
                         loss_weight=1.0))


def _make_batch():
    """2 images (labeled, unlabeled) + an SI half-res copy of the last.

    The arrays are built once and fed bit-identically to both frameworks
    (the SI constructor itself is oracled in test_torch_oracle_si_append)."""
    rng = np.random.RandomState(11)
    imgs = rng.randn(3, IMG, IMG, 3).astype(np.float32) * 0.5
    half = cv2.resize(imgs[1], (IMG // 2, IMG // 2),
                      interpolation=cv2.INTER_LINEAR)
    imgs[2] = 0.0
    imgs[2, :IMG // 2, :IMG // 2] = half

    def _boxes(n, scale=1.0):
        x1 = rng.rand(n) * IMG * 0.6
        y1 = rng.rand(n) * IMG * 0.6
        bw = rng.rand(n) * (IMG * 0.35) + 8.0
        bh = rng.rand(n) * (IMG * 0.35) + 8.0
        return (np.stack([x1, y1, np.minimum(x1 + bw, IMG - 1),
                          np.minimum(y1 + bh, IMG - 1)], -1)
                .astype(np.float32) * scale)

    gts = [_boxes(3), _boxes(2)]
    gts.append(gts[1] * 0.5)
    labels = [rng.randint(0, NUM_CLASSES, size=len(g)).astype(np.int64)
              for g in gts[:2]]
    labels.append(labels[1].copy())
    igs = [_boxes(1), _boxes(2)]
    igs.append(igs[1] * 0.5)
    return imgs, gts, labels, igs


def _mmcv_sgd(modules):
    """torch.optim.SGD with mmcv DefaultOptimizerConstructor paramwise
    groups: bias of non-norm modules gets lr x2, decay x0."""
    import torch.nn as nn

    norm_types = (nn.modules.batchnorm._BatchNorm, nn.GroupNorm,
                  nn.LayerNorm, nn.InstanceNorm2d)
    groups = []
    for model in modules:
        for _, module in model.named_modules():
            is_norm = isinstance(module, norm_types)
            for pname, p in module.named_parameters(recurse=False):
                g = dict(params=[p], lr=BASE_LR, weight_decay=WD,
                         lr_mult=1.0)
                if pname == "bias" and not is_norm:
                    g["lr_mult"] = 2.0
                    g["weight_decay"] = 0.0
                groups.append(g)
    return torch.optim.SGD(groups, lr=BASE_LR, momentum=MOMENTUM,
                           weight_decay=WD), groups


def _warmup_lr(it):
    # mmcv linear warmup: base * (ratio + (1-ratio) * it/warmup_iters)
    frac = min(it / WARMUP_ITERS, 1.0)
    return BASE_LR * (WARMUP_RATIO + (1 - WARMUP_RATIO) * frac)


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    """Run 3 reference training iterations; return init/final .pth paths,
    the batch, and the loss trajectory."""
    sys.path.insert(0, osp.dirname(__file__))
    from test_torch_oracle import _load_reference_rla
    from test_torch_oracle_detector_import import _load_reference_detector

    rla_mod = _load_reference_rla()
    parts = _load_reference_detector()

    torch.manual_seed(5)
    backbone = rla_mod.RLA_ResNet(layers=LAYERS, norm_eval=True,
                                  frozen_stages=1)
    backbone.flops = True
    neck = parts.FPN(in_channels=[256, 512, 1024, 2048], out_channels=FEAT,
                     start_level=1, add_extra_convs="on_output",
                     num_outs=5, relu_before_extra_convs=True)
    head = parts.FCOSHead(**HEAD_KW, **LOSS_CFGS)
    with torch.no_grad():
        for m in (backbone, neck, head):
            for p in m.parameters():
                p.copy_(torch.randn_like(p) * 0.05)
            for name, buf in m.named_buffers():
                if name.endswith("running_mean"):
                    buf.copy_(torch.randn_like(buf) * 0.1)
                elif name.endswith("running_var"):
                    buf.copy_(torch.rand_like(buf) * 0.5 + 0.75)

    def _save(path):
        sd = {}
        for prefix, m in (("backbone", backbone), ("neck", neck),
                          ("bbox_head", head)):
            for k, v in m.state_dict().items():
                sd[f"{prefix}.{k}"] = v.clone()
        torch.save({"state_dict": sd}, str(path))

    d = tmp_path_factory.mktemp("train_oracle")
    _save(d / "init.pth")

    # engage frozen_stages + norm_eval through the reference's own train()
    backbone.train()
    neck.train()
    head.train()
    frozen_names = {f"backbone.{n}" for n, p in backbone.named_parameters()
                    if not p.requires_grad}
    assert any("stages.0." in n for n in frozen_names)
    assert any("stage_bns.3.2" in n for n in frozen_names)

    imgs, gts, labels, igs = _make_batch()
    timg = torch.from_numpy(imgs.transpose(0, 3, 1, 2)).contiguous()
    tgts = [torch.from_numpy(g) for g in gts]
    tlabels = [torch.from_numpy(l) for l in labels]
    tigs = [torch.from_numpy(g) for g in igs]
    metas = [dict(img_shape=(IMG, IMG, 3), pad_shape=(IMG, IMG, 3),
                  scale_factor=np.ones(4, np.float32)) for _ in range(3)]

    opt, groups = _mmcv_sgd([backbone, neck, head])
    all_params = [p for m in (backbone, neck, head) for p in m.parameters()]

    losses_t, grad_norms = [], []
    for it in range(N_STEPS):
        head.cur_iter = it
        lr = _warmup_lr(it)
        for g in groups:
            g["lr"] = lr * g["lr_mult"]
        opt.zero_grad()
        outs = head(neck(backbone(timg)))
        loss_dict = head.loss(*outs, tgts, tlabels, metas,
                              gt_bboxes_ignore=tigs)
        # _parse_losses (base.py:175-208): mean each, sum 'loss' keys
        total = sum(v.mean() for k, v in loss_dict.items() if "loss" in k)
        losses_t.append(float(total))
        total.backward()
        gn = torch.nn.utils.clip_grad_norm_(
            [p for p in all_params if p.requires_grad and p.grad is not None],
            max_norm=CLIP, norm_type=2)
        grad_norms.append(float(gn))
        opt.step()

    _save(d / "final.pth")
    return dict(init=str(d / "init.pth"), final=str(d / "final.pth"),
                imgs=imgs, gts=gts, labels=labels, igs=igs,
                losses=losses_t, grad_norms=grad_norms,
                frozen_names=frozen_names)


def _detector_cfg():
    return dict(
        type="FCOS",
        backbone=dict(type="RLA_ResNet", layers=LAYERS, frozen_stages=1,
                      norm_eval=True, style="pytorch"),
        neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                  out_channels=FEAT, start_level=1,
                  add_extra_convs="on_output", num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(type="FCOSHead", **HEAD_KW),
        test_cfg=dict(score_thr=0.05, nms=dict(iou_threshold=0.6),
                      max_per_img=100))


def test_train_step_matches_reference(oracle):
    import jax
    import jax.numpy as jnp

    from dsl_tpu.models import build_detector
    from dsl_tpu.models.detectors.single_stage import init_detector_variables
    from dsl_tpu.train import (build_optimizer_from_cfg, create_train_state,
                               frozen_backbone_mask, make_train_step)
    from dsl_tpu.utils.torch_import import load_torch_detector

    det = build_detector(_detector_cfg())
    variables = init_detector_variables(
        det, jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32))
    variables = load_torch_detector(oracle["init"], variables)
    init_params = jax.tree_util.tree_map(np.asarray, variables["params"])

    frozen = frozen_backbone_mask(variables["params"], frozen_stages=1)
    tx, _ = build_optimizer_from_cfg(
        variables["params"],
        dict(type="SGD", lr=BASE_LR, momentum=MOMENTUM, weight_decay=WD,
             paramwise_cfg=dict(bias_lr_mult=2.0, bias_decay_mult=0.0)),
        optimizer_config=dict(grad_clip=dict(max_norm=CLIP, norm_type=2)),
        lr_config=dict(policy="step", warmup="linear",
                       warmup_iters=WARMUP_ITERS,
                       warmup_ratio=WARMUP_RATIO, step=[20, 26]),
        steps_per_epoch=10000, frozen_mask=frozen)
    state = create_train_state(variables, tx, ema_ratio=0.99)
    step = jax.jit(make_train_step(det, tx, ema_interval=1,
                                   ema_start_iter=1, frozen_mask=frozen))

    imgs, gts, labels, igs = (oracle["imgs"], oracle["gts"],
                              oracle["labels"], oracle["igs"])
    K = 4
    gt_b = np.zeros((3, K, 4), np.float32)
    gt_l = np.zeros((3, K), np.int32)
    gt_v = np.zeros((3, K), bool)
    ig_b = np.zeros((3, K, 4), np.float32)
    ig_v = np.zeros((3, K), bool)
    for i in range(3):
        n, m = len(gts[i]), len(igs[i])
        gt_b[i, :n], gt_l[i, :n], gt_v[i, :n] = gts[i], labels[i], True
        ig_b[i, :m], ig_v[i, :m] = igs[i], True
    batch = dict(
        images=jnp.asarray(imgs),
        gt_bboxes=jnp.asarray(gt_b), gt_labels=jnp.asarray(gt_l),
        gt_valid=jnp.asarray(gt_v),
        ignore_bboxes=jnp.asarray(ig_b), ignore_valid=jnp.asarray(ig_v),
        # reference head.loss weights the second half of the batch by
        # loss_weight (fcos_head.py:217-234): B=3 -> [1, 2, 2]
        source_weight=jnp.asarray([1.0, 2.0, 2.0], jnp.float32),
        si_pair=dict(full=jnp.asarray([1], jnp.int32),
                     half=jnp.asarray([2], jnp.int32)),
    )

    losses_j, grad_norms_j = [], []
    for _ in range(N_STEPS):
        state, metrics = step(state, batch)
        losses_j.append(float(metrics["loss"]))
        grad_norms_j.append(float(metrics["grad_norm"]))

    # --- loss trajectory (incl. si-soft warmup gate flip at iter 2) -------
    np.testing.assert_allclose(losses_j, oracle["losses"], rtol=2e-4,
                               err_msg="loss trajectory diverged")
    np.testing.assert_allclose(grad_norms_j, oracle["grad_norms"], rtol=2e-3,
                               err_msg="pre-clip grad norm diverged")

    # --- per-parameter updates after 3 steps -------------------------------
    ref_vars = init_detector_variables(
        det, jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32))
    ref_vars = load_torch_detector(oracle["final"], ref_vars)
    ref_final = jax.tree_util.tree_map(np.asarray, ref_vars["params"])
    ours_final = jax.tree_util.tree_map(np.asarray, state.params)

    flat_ref = jax.tree_util.tree_flatten_with_path(ref_final)[0]
    flat_ours = jax.tree_util.tree_flatten_with_path(ours_final)[0]
    flat_init = jax.tree_util.tree_flatten_with_path(init_params)[0]
    assert len(flat_ref) == len(flat_ours) > 100
    checked_moving = 0
    stats = []
    for (path, rv), (_, ov), (_, iv) in zip(flat_ref, flat_ours, flat_init):
        name = jax.tree_util.keystr(path)
        ref_d = (rv - iv).ravel()
        our_d = (ov - iv).ravel()
        scale = float(max(np.abs(ref_d).max(), np.abs(our_d).max()))
        if scale > 0:
            checked_moving += 1
        err = float(np.abs(our_d - ref_d).max())
        stats.append((err / (0.02 * scale + 1e-7), err, scale, name))
    stats.sort(reverse=True)
    for ratio, err, scale, name in stats[:12]:
        print(f"  delta-err {err:.3e} / scale {scale:.3e} "
              f"(ratio {ratio:.2f}) {name}")
    assert checked_moving > 100, "almost nothing moved — degenerate oracle"
    # Per-parameter: 5% of that param's own update magnitude, with a 1e-5
    # absolute floor. fp32 backward noise between XLA and torch-CPU conv
    # algorithms reaches ~6% on cancellation-prone spatial-sum grads (deep
    # BN biases, measured) while any systematic optimizer error — sign,
    # momentum/wd coupling, lr mult, clip factor — is >=100% off on the
    # params it touches; the aggregate L2 check below bounds the total.
    for ratio, err, scale, name in stats:
        assert err <= max(0.05 * scale, 1e-5), (
            f"update mismatch at {name}: err {err:.3e} vs scale {scale:.3e}")
    # Aggregate: the concatenated update vector must match to 0.1% in L2 —
    # catches any systematic coupling/lr/wd error regardless of per-param
    # scale games.
    all_ref = np.concatenate([(rv - iv).ravel()
                              for (_, rv), (_, iv) in zip(flat_ref, flat_init)])
    all_ours = np.concatenate([(ov - iv).ravel()
                               for (_, ov), (_, iv) in zip(flat_ours, flat_init)])
    rel_l2 = np.linalg.norm(all_ours - all_ref) / np.linalg.norm(all_ref)
    print(f"  aggregate update rel-L2 error: {rel_l2:.3e}")
    assert rel_l2 < 1e-3, f"aggregate update error {rel_l2:.3e}"

    # --- frozen params stayed bit-identical on both sides -------------------
    frozen_checked = 0
    for (path, ov), (_, iv) in zip(flat_ours, flat_init):
        name = jax.tree_util.keystr(path)
        if (name.startswith("['backbone']['conv1']")      # stem
                or name.startswith("['backbone']['bn1']")
                or "'layer1_" in name                      # frozen_stages=1
                or "'stage_bn3_2'" in name):               # unconditional
            np.testing.assert_array_equal(
                ov, iv, err_msg=f"frozen {name} moved (ours)")
            frozen_checked += 1
    assert frozen_checked > 5
    layer1_checked = 0
    for (path, rv), (_, iv) in zip(flat_ref, flat_init):
        name = jax.tree_util.keystr(path)
        if "layer1_" in name:        # our stage-1 naming (layer1_<blk>)
            np.testing.assert_array_equal(
                rv, iv, err_msg=f"frozen {name} moved (reference)")
            layer1_checked += 1
    assert layer1_checked > 0
