"""Dynamic R-CNN and PISA RoI-head training variants.

Parity:
- Dynamic R-CNN (``/root/reference/mmdet/models/roi_heads/dynamic_roi_head.py``):
  the assigner's IoU threshold and the smooth-L1 beta are *training
  statistics* — per step the head records (a) the mean over images of the
  ``iou_topk``-th largest proposal IoU and (b) the ``beta_topk``·B-th
  smallest positive-target ``|dxy|`` mean; every ``update_iter_interval``
  iterations the host updates ``iou_thr = max(initial_iou, mean(iou_hist))``
  and ``beta = min(initial_beta, median(beta_hist))``.
- PISA RoI head (``/root/reference/mmdet/models/roi_heads/pisa_roi_head.py``):
  ISR-P reweights the positive classification loss by IoU-HLR rank and CARL
  couples the regression loss to the classification score
  (``mmdet/models/losses/pisa_loss.py``).

TPU redesign: the reference mutates assigner/loss attributes in-place
between iterations — impossible under jit. Here the dynamic hyperparameters
are *traced scalars* threaded through the batch dict
(``batch['dyn_iou_thr']``, ``batch['dyn_beta']``); the jitted step also
returns the raw statistics in its log vars (``dynamic_iou``,
``dynamic_beta``) and the host-side :class:`DynamicRCNNSchedule` integrates
them — same math, no retrace (scalar inputs are traced, not baked in).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dsl_tpu.core import losses as L
from dsl_tpu.core.boxes import bbox2delta, bbox_overlaps, delta2bbox
from dsl_tpu.core.pisa import carl_weights, isr_p_weights, isr_p_rescale
from dsl_tpu.models.roi_heads.standard_roi_head import (
    extract_roi_feats, sample_batch_rois)


def dynamic_iou_stat(proposals, prop_valid, gt_bboxes, gt_valid,
                     iou_topk: int = 75):
    """Mean over images of the ``iou_topk``-th largest proposal-vs-gt IoU
    (reference ``dynamic_roi_head.py:78-84``). Padded proposals/gt count as
    IoU 0, matching "low-quality proposal" semantics."""

    def per_image(props, pvalid, gtb, gtv):
        iou = bbox_overlaps(props, gtb)                  # (P, K)
        iou = iou * gtv[None, :].astype(iou.dtype)
        max_iou = iou.max(axis=1) * pvalid.astype(iou.dtype)
        k = min(iou_topk, max_iou.shape[0])
        top = jax.lax.top_k(max_iou, k)[0]
        return top[-1]

    return jnp.mean(jax.vmap(per_image)(
        proposals, prop_valid, gt_bboxes, gt_valid))


def dynamic_roi_loss(bbox_head, apply_fn, variables, feats, proposals,
                     prop_valid, batch, rng_key, strides=(4, 8, 16, 32),
                     num_samples: int = 256, iou_thr=0.4, beta=1.0,
                     iou_topk: int = 75, beta_topk: int = 10):
    """Standard Shared2FC roi loss with a traced assignment IoU threshold
    and traced smooth-L1 beta; additionally returns the two Dynamic R-CNN
    statistics as (non-loss) log vars."""
    nc = bbox_head.num_classes
    b = proposals.shape[0]
    iou_thr = jnp.asarray(iou_thr, jnp.float32)
    beta = jnp.asarray(beta, jnp.float32)

    # reference update_hyperparameters sets pos/neg/min_pos_iou all to the
    # live threshold with match_low_quality=False, so raising the threshold
    # actually removes forced low-quality positives
    samples = sample_batch_rois(proposals, prop_valid, batch, rng_key, nc,
                                num_samples=num_samples,
                                pos_iou_thr=iou_thr, neg_iou_thr=iou_thr,
                                min_pos_iou=iou_thr,
                                match_low_quality=False)
    rois, labels, assigned, valid, is_pos = (
        samples["rois"], samples["labels"], samples["assigned"],
        samples["valid"], samples["is_pos"])

    batch_idx = jnp.broadcast_to(
        jnp.arange(b)[:, None], (b, num_samples)).reshape(-1, 1)
    flat_rois = jnp.concatenate(
        [batch_idx.astype(jnp.float32), rois.reshape(-1, 4)], axis=1)
    roi_feats = extract_roi_feats(feats, flat_rois, valid.reshape(-1),
                                  strides, bbox_head.roi_size)
    cls_logits, reg = apply_fn(variables, roi_feats)

    flat_labels = labels.reshape(-1)
    flat_valid = valid.reshape(-1).astype(jnp.float32)
    flat_pos = is_pos.reshape(-1).astype(jnp.float32)
    num_valid = jnp.maximum(jnp.sum(flat_valid), 1.0)
    num_pos = jnp.maximum(jnp.sum(flat_pos), 1.0)

    loss_cls = L.cross_entropy(cls_logits, flat_labels, weight=flat_valid,
                               avg_factor=num_valid)
    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None],
        axis=1).reshape(-1, 4)
    tgt = bbox2delta(rois.reshape(-1, 4), gt, bbox_head.target_means,
                     bbox_head.target_stds)
    reg = reg.reshape(-1, nc, 4)
    cls_idx = jnp.clip(flat_labels, 0, nc - 1)
    reg_sel = jnp.take_along_axis(
        reg, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]
    # reference parity: reg averaged by the TOTAL sampled roi count
    # (``bbox_head.py:302`` avg_factor=bbox_targets.size(0)), not num_pos
    loss_reg = L.smooth_l1_loss(reg_sel, tgt, beta=beta,
                                weight=flat_pos[:, None],
                                avg_factor=num_valid)

    # statistics for the host-side schedule
    cur_iou = dynamic_iou_stat(proposals, prop_valid, batch["gt_bboxes"],
                               batch["gt_valid"], iou_topk=iou_topk)
    # beta stat: k-th smallest |dxy| mean over positives (ref :120-125)
    dxy = jnp.abs(tgt[:, :2]).mean(axis=1)
    dxy = jnp.where(flat_pos > 0, dxy, jnp.inf)
    order = jnp.sort(dxy)
    k_idx = jnp.minimum(jnp.asarray(beta_topk * b, jnp.int32),
                        num_pos.astype(jnp.int32)) - 1
    cur_beta = order[jnp.maximum(k_idx, 0)]
    cur_beta = jnp.where(jnp.isfinite(cur_beta), cur_beta, beta)

    acc = jnp.sum((jnp.argmax(cls_logits, -1) == flat_labels) * flat_valid) \
        / num_valid
    return dict(loss_cls=loss_cls, loss_bbox=loss_reg, acc=acc,
                dynamic_iou=cur_iou, dynamic_beta=cur_beta)


class DynamicRCNNSchedule:
    """Host-side integrator of the per-step statistics (reference
    ``update_hyperparameters`` :133-155). Feed each step's logged
    ``dynamic_iou``/``dynamic_beta``; read ``.iou_thr``/``.beta`` and put
    them in the next batch as ``dyn_iou_thr``/``dyn_beta``."""

    def __init__(self, initial_iou: float = 0.4, initial_beta: float = 1.0,
                 update_iter_interval: int = 100, eps: float = 1e-15):
        self.initial_iou = initial_iou
        self.initial_beta = initial_beta
        self.interval = update_iter_interval
        self.eps = eps
        self.iou_thr = initial_iou
        self.beta = initial_beta
        self._iou_hist: list[float] = []
        self._beta_hist: list[float] = []

    def update(self, cur_iou: float, cur_beta: float):
        import numpy as np

        self._iou_hist.append(float(cur_iou))
        self._beta_hist.append(float(cur_beta))
        if len(self._iou_hist) % self.interval == 0:
            self.iou_thr = max(self.initial_iou, float(np.mean(self._iou_hist)))
            self._iou_hist = []
            med = float(np.median(self._beta_hist))
            if med >= self.eps:
                self.beta = min(self.initial_beta, med)
            self._beta_hist = []
        return self.iou_thr, self.beta


def pisa_roi_loss(bbox_head, apply_fn, variables, feats, proposals,
                  prop_valid, batch, rng_key, strides=(4, 8, 16, 32),
                  num_samples: int = 256, isr_k: float = 2.0,
                  isr_bias: float = 0.0, carl_k: float = 1.0,
                  carl_bias: float = 0.2, isr_n: dict | None = None):
    """Shared2FC roi loss with ISR-P positive reweighting + CARL
    (reference ``pisa_roi_head.py:126-159``: softmax scores, decoded-pred
    IoU ranking, loss-sum-preserving rescale). ``isr_n`` enables Score-HLR
    negative reweighting (the reference's ScoreHLRSampler
    ``neg_label_weights``, ``score_hlr_sampler.py``)."""
    nc = bbox_head.num_classes
    b = proposals.shape[0]
    samples = sample_batch_rois(proposals, prop_valid, batch, rng_key, nc,
                                num_samples=num_samples)
    rois, labels, assigned, valid, is_pos = (
        samples["rois"], samples["labels"], samples["assigned"],
        samples["valid"], samples["is_pos"])

    batch_idx = jnp.broadcast_to(
        jnp.arange(b)[:, None], (b, num_samples)).reshape(-1, 1)
    flat_rois = jnp.concatenate(
        [batch_idx.astype(jnp.float32), rois.reshape(-1, 4)], axis=1)
    roi_feats = extract_roi_feats(feats, flat_rois, valid.reshape(-1),
                                  strides, bbox_head.roi_size)
    cls_logits, reg = apply_fn(variables, roi_feats)

    flat_labels = labels.reshape(-1)
    flat_valid = valid.reshape(-1).astype(jnp.float32)
    pos_mask = (is_pos.reshape(-1) > 0) & (valid.reshape(-1) > 0)
    flat_pos = pos_mask.astype(jnp.float32)
    num_valid = jnp.maximum(jnp.sum(flat_valid), 1.0)
    num_pos = jnp.maximum(jnp.sum(flat_pos), 1.0)

    gt = jnp.take_along_axis(
        batch["gt_bboxes"], jnp.maximum(assigned, 0)[..., None],
        axis=1).reshape(-1, 4)
    tgt = bbox2delta(rois.reshape(-1, 4), gt, bbox_head.target_means,
                     bbox_head.target_stds)
    reg = reg.reshape(-1, nc, 4)
    cls_idx = jnp.clip(flat_labels, 0, nc - 1)
    reg_sel = jnp.take_along_axis(
        reg, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]

    # ISR-P: rank positives by IoU(decoded pred, gt), reweight cls loss
    decoded = delta2bbox(rois.reshape(-1, 4), reg_sel,
                         bbox_head.target_means, bbox_head.target_stds)
    ious = bbox_overlaps(jax.lax.stop_gradient(decoded), gt,
                         is_aligned=True)
    # globally-unique gt id per positive
    gt_ids = (batch_idx.reshape(-1) * batch["gt_bboxes"].shape[1]
              + jnp.maximum(assigned.reshape(-1), 0))
    isr_w = isr_p_weights(flat_labels, pos_mask, gt_ids, ious, nc,
                          k=isr_k, bias=isr_bias)
    base_w = flat_valid
    if isr_n is not None:
        # ISR-N: negative label weights from Score-HLR of the predictions
        from dsl_tpu.core.pisa import score_hlr_weights

        probs = jax.nn.softmax(
            jax.lax.stop_gradient(cls_logits), axis=-1)[:, :nc]
        max_scores = probs.max(axis=-1)
        arg_cls = jnp.argmax(probs, axis=-1)
        reg_arg = jnp.take_along_axis(
            reg, arg_cls[:, None, None].repeat(4, -1), axis=1)[:, 0]
        dec_arg = delta2bbox(rois.reshape(-1, 4),
                             jax.lax.stop_gradient(reg_arg),
                             bbox_head.target_means, bbox_head.target_stds)
        neg_mask = (~pos_mask) & (valid.reshape(-1) > 0)
        neg_w = score_hlr_weights(
            dec_arg, max_scores, neg_mask,
            iou_thr=float(isr_n.get("iou_thr", 0.5)),
            k=float(isr_n.get("k", 0.5)),
            bias=float(isr_n.get("bias", 0.0)),
            score_thr=float(isr_n.get("score_thr", 0.05)))
        # loss-preserving rescale (reference ``score_hlr_sampler.py``:
        # norm_ratio = ori_selected_loss.sum() / new_loss.sum())
        ce0 = jax.lax.stop_gradient(L.cross_entropy(
            cls_logits, flat_labels, reduction="none"))
        negf = neg_mask.astype(jnp.float32)
        ratio = jnp.sum(ce0 * negf) / jnp.maximum(
            jnp.sum(ce0 * neg_w * negf), 1e-12)
        neg_w = jnp.where(neg_mask, neg_w * ratio, neg_w)
        base_w = base_w * neg_w
    per_roi_ce = L.cross_entropy(cls_logits, flat_labels, reduction="none")
    weights = isr_p_rescale(per_roi_ce, base_w, isr_w, pos_mask)
    loss_cls = jnp.sum(per_roi_ce * weights) / num_valid

    # reference parity: both reg and CARL average by the TOTAL sampled roi
    # count (``bbox_head.py:302``; ``pisa_loss.py:169-170``), not num_pos
    loss_reg = L.smooth_l1_loss(reg_sel, tgt, weight=flat_pos[:, None],
                                avg_factor=num_valid)
    # CARL on softmax scores (two-stage: sigmoid=False)
    cw = carl_weights(cls_logits, flat_labels, pos_mask, nc,
                      k=carl_k, bias=carl_bias, sigmoid=False)
    per_roi_l1 = L.smooth_l1_loss(reg_sel, tgt, reduction="none").sum(-1)
    loss_carl = jnp.sum(per_roi_l1 * cw) / num_valid

    acc = jnp.sum((jnp.argmax(cls_logits, -1) == flat_labels) * flat_valid) \
        / num_valid
    return dict(loss_cls=loss_cls, loss_bbox=loss_reg, loss_carl=loss_carl,
                acc=acc)
