"""Dynamic R-CNN, PISA RoI head, and GenericRoIExtractor tests."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.models.detectors.two_stage import (
    build_two_stage_detector, init_two_stage_variables, two_stage_loss,
    two_stage_predict)


def _cfg(det_type="FasterRCNN", train_cfg=None, **bbox_kw):
    return dict(
        type=det_type,
        backbone=dict(type="ResNet", depth=18, out_indices=(0, 1, 2, 3)),
        neck=dict(type="FPN", in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=0, num_outs=5),
        rpn_head=dict(type="RPNHead", in_channels=32, feat_channels=32,
                      strides=[4, 8, 16, 32, 64]),
        bbox_head=dict(type="Shared2FCBBoxHead", num_classes=4,
                       in_channels=32, roi_size=7, fc_channels=64, **bbox_kw),
        train_cfg=train_cfg,
        test_cfg=dict(rcnn=dict(score_thr=0.05,
                                nms=dict(iou_threshold=0.5),
                                max_per_img=10)),
    )


def _setup(cfg):
    det = build_two_stage_detector(cfg)
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                       jnp.float32)
    variables = init_two_stage_variables(det, jax.random.PRNGKey(0), imgs)
    batch = dict(
        images=imgs,
        gt_bboxes=jnp.asarray([[[4., 4., 40., 40.]], [[8., 8., 30., 30.]]]),
        gt_labels=jnp.asarray([[1], [2]], jnp.int32),
        gt_valid=jnp.ones((2, 1), bool),
        img_shapes=jnp.asarray([[64., 64.]] * 2),
    )
    return det, variables, batch


def test_dynamic_rcnn_loss_and_stats():
    det, variables, batch = _setup(_cfg(
        "DynamicRCNN",
        train_cfg=dict(dynamic_rcnn=dict(iou_topk=8, beta_topk=2,
                                         initial_iou=0.4, initial_beta=1.0,
                                         update_iter_interval=2))))
    batch = dict(batch, dyn_iou_thr=jnp.asarray(0.4),
                 dyn_beta=jnp.asarray(1.0))
    total, log = two_stage_loss(det, variables, batch,
                                rng_key=jax.random.PRNGKey(3),
                                num_proposals=64, num_samples=32)
    assert np.isfinite(float(total))
    assert 0.0 <= float(log["dynamic_iou"]) <= 1.0
    assert np.isfinite(float(log["dynamic_beta"]))
    # stats are logged but NOT summed into the total
    manual = sum(float(v) for k, v in log.items()
                 if "loss" in k and k != "loss")
    assert np.isclose(manual, float(log["loss"]), rtol=1e-5)

    # a different threshold gives a different loss through the SAME trace
    # (the threshold is a traced scalar, not baked in)
    traces = []

    def loss_of(thr):
        traces.append(1)        # runs only when jax (re)traces
        return two_stage_loss(
            det, variables, dict(batch, dyn_iou_thr=thr),
            rng_key=jax.random.PRNGKey(3), num_proposals=64,
            num_samples=32)[0]

    fn = jax.jit(loss_of)
    l1 = float(fn(jnp.asarray(0.3)))
    l2 = float(fn(jnp.asarray(0.9)))
    assert np.isfinite(l1) and np.isfinite(l2)
    assert len(traces) == 1, f"retraced {len(traces)} times"


def test_dynamic_schedule_host_update():
    from dsl_tpu.models.roi_heads.dynamic_pisa import DynamicRCNNSchedule

    s = DynamicRCNNSchedule(initial_iou=0.4, initial_beta=1.0,
                            update_iter_interval=4)
    for _ in range(3):
        s.update(0.6, 0.05)
        assert s.iou_thr == 0.4 and s.beta == 1.0   # no update yet
    s.update(0.6, 0.05)
    assert np.isclose(s.iou_thr, 0.6)               # mean of history
    assert np.isclose(s.beta, 0.05)                 # median, < initial
    # iou is floored at initial_iou; beta is re-derived each update and
    # capped at initial_beta (reference ``update_hyperparameters`` :133-155)
    for _ in range(4):
        s.update(0.1, 5.0)
    assert s.iou_thr == 0.4 and np.isclose(s.beta, 1.0)


def test_pisa_roi_loss_carl():
    det, variables, batch = _setup(_cfg(
        "PISAFasterRCNN",
        train_cfg=dict(isr=dict(k=2.0, bias=0.0),
                       carl=dict(k=1.0, bias=0.2))))
    total, log = two_stage_loss(det, variables, batch,
                                rng_key=jax.random.PRNGKey(3),
                                num_proposals=64, num_samples=32)
    assert np.isfinite(float(total))
    assert "loss_carl" in log and np.isfinite(float(log["loss_carl"]))
    assert float(log["loss_carl"]) >= 0

    g = jax.grad(lambda p: two_stage_loss(
        det, {**variables, "params": p}, batch,
        rng_key=jax.random.PRNGKey(3), num_proposals=64,
        num_samples=32)[0])(variables["params"])
    assert float(jnp.abs(g["bbox_head"]["fc_cls"]["kernel"]).sum()) > 0
    assert float(jnp.abs(g["bbox_head"]["fc_reg"]["kernel"]).sum()) > 0


def test_generic_roi_extractor_modes():
    from dsl_tpu.models.roi_heads.standard_roi_head import (
        extract_roi_feats_generic)

    feats = [jnp.asarray(np.random.RandomState(i).rand(2, s, s, 8),
                         jnp.float32)
             for i, s in enumerate((16, 8, 4, 2))]
    rois = jnp.asarray([[0., 4., 4., 40., 40.], [1., 0., 0., 20., 20.]])
    valid = jnp.ones((2,), bool)
    out_sum = extract_roi_feats_generic(feats, rois, valid,
                                        strides=(4, 8, 16, 32), roi_size=7)
    assert out_sum.shape == (2, 7, 7, 8)
    out_cat = extract_roi_feats_generic(feats, rois, valid,
                                        strides=(4, 8, 16, 32), roi_size=7,
                                        aggregation="concat")
    assert out_cat.shape == (2, 7, 7, 32)
    # sum equals the sum of concat's level blocks
    np.testing.assert_allclose(
        np.asarray(out_sum),
        np.asarray(out_cat).reshape(2, 7, 7, 4, 8).sum(3), rtol=1e-5)


def test_generic_extractor_end_to_end():
    det, variables, batch = _setup(_cfg(roi_extractor="sum"))
    total, _ = two_stage_loss(det, variables, batch,
                              rng_key=jax.random.PRNGKey(3),
                              num_proposals=64, num_samples=32)
    assert np.isfinite(float(total))
    dets, labels, valid = two_stage_predict(
        det, variables, batch["images"], img_shapes=batch["img_shapes"],
        num_proposals=64)
    assert dets.shape[-1] == 5


def test_seesaw_roi_head():
    from dsl_tpu.core.losses import SeesawCounter

    cfg = _cfg(loss_cls=dict(type="SeesawLoss", p=0.8, q=2.0))
    det, variables, batch = _setup(cfg)
    counter = SeesawCounter(4)
    counter.update(batch["gt_labels"], batch["gt_valid"])
    batch = dict(batch, cum_samples=jnp.asarray(counter.counts))
    total, log = two_stage_loss(det, variables, batch,
                                rng_key=jax.random.PRNGKey(3),
                                num_proposals=64, num_samples=32)
    assert np.isfinite(float(total))
    assert "loss_cls_objectness" in log
    # cls head emits C+2 channels
    k = variables["params"]["bbox_head"]["fc_cls"]["kernel"]
    assert k.shape[-1] == 4 + 2

    dets, labels, valid = two_stage_predict(
        det, variables, batch["images"], img_shapes=batch["img_shapes"],
        num_proposals=64)
    assert dets.shape[-1] == 5


def test_pisa_score_hlr_negatives():
    from dsl_tpu.core.pisa import score_hlr_weights

    # 3 negatives: two overlapping (one confident), one isolated low-score
    dec = jnp.asarray([[0., 0., 10., 10.], [1., 1., 11., 11.],
                       [50., 50., 60., 60.], [80., 80., 90., 90.]])
    scores = jnp.asarray([0.9, 0.6, 0.3, 0.01])
    neg = jnp.asarray([True, True, True, True])
    w = np.asarray(score_hlr_weights(dec, scores, neg, score_thr=0.05))
    # below score_thr -> easy background at the MINIMUM importance weight
    # (reference neg_label_weights[num_hlr:] = imp_weights.min())
    assert np.isclose(w[3], w[:3].min())
    # hardest (highest-score group leader) gets the largest learned weight
    assert w[0] >= w[1] and w[0] >= w[2]
    assert np.all(w > 0) and np.all(w <= 1.0 + 1e-6)

    det, variables, batch = _setup(_cfg(
        "PISAFasterRCNN",
        train_cfg=dict(isr=dict(k=2.0, bias=0.0),
                       carl=dict(k=1.0, bias=0.2),
                       isr_n=dict(k=0.5, bias=0.0))))
    total, log = two_stage_loss(det, variables, batch,
                                rng_key=jax.random.PRNGKey(3),
                                num_proposals=64, num_samples=32)
    assert np.isfinite(float(total))
    assert "loss_carl" in log
