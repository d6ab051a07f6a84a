"""Localization Distillation (LD) head + KD single-stage detector support.

Parity with ``/root/reference/mmdet/models/dense_heads/ld_head.py:10-261``
(GFL head + KL distillation of the per-side distance distributions from a
teacher's bbox branch, weighted by the student's max class score at
positives, per-level ``sum/4`` with loss weight 0.25 — NOT renormalized by
the quality sum, unlike loss_bbox/dfl) and
``detectors/kd_one_stage.py:11-100`` (teacher forward in eval mode,
gradients blocked).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dsl_tpu.registry import HEADS
from dsl_tpu.core import losses as L
from dsl_tpu.core.assigners import atss_assign
from dsl_tpu.models.dense_heads.gfl_head import GFLHead, gfl_loss


@HEADS.register
class LDHead(GFLHead):
    loss_ld_weight: float = 0.25
    ld_T: float = 10.0
    loss_ld: dict | None = None     # config parity


def ld_loss(head: LDHead, cls_scores, bbox_dists, teacher_dists, batch,
            axis_name=None):
    """GFL losses + the LD distillation term."""
    losses = gfl_loss(head, cls_scores, bbox_dists, batch,
                      axis_name=axis_name)

    nc = head.num_classes
    gen = head.make_anchor_generator()
    featmap_sizes = [tuple(c.shape[1:3]) for c in cls_scores]
    anchors = gen.flat_anchors(featmap_sizes)
    npl = gen.num_anchors(featmap_sizes)
    labels, _, _, _ = atss_assign(
        anchors, npl, batch["gt_bboxes"], batch["gt_labels"],
        batch["gt_valid"], topk=head.topk, num_classes=nc)
    pos = (labels < nc).astype(jnp.float32)                # (B, A)

    b = labels.shape[0]
    nb = head.reg_max + 1
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1, nc) for c in cls_scores], axis=1)
    stu = jnp.concatenate(
        [d.reshape(b, -1, 4, nb) for d in bbox_dists], axis=1)
    tea = jnp.concatenate(
        [d.reshape(b, -1, 4, nb) for d in teacher_dists], axis=1)
    tea = jax.lax.stop_gradient(tea)

    # weight = student's max sigmoid class score at positives (:89-90)
    w = jnp.max(jax.nn.sigmoid(jax.lax.stop_gradient(flat_cls)), axis=-1)
    w = w * pos                                            # (B, A)
    kd = L.kd_kl_div_loss(stu, tea, T=head.ld_T,
                          reduction="none")                # (B, A, 4)
    losses["loss_ld"] = head.loss_ld_weight * jnp.sum(
        kd * w[..., None]) / 4.0
    return losses
