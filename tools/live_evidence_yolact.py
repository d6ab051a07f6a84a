"""On-chip smoke for YOLACT with its reference neck config (bilinear FPN).

Builds the YOLACT detector from ``configs/yolact/yolact_r50_1x8_coco.py``
semantics (FPN ``upsample_cfg=dict(mode='bilinear')`` — the knob FPN now
honors), jits the full predict path (protonet mask assembly + fast NMS) and
runs it on whatever backend is live (TPU via the axon relay when up).
Prints one line per surface; used for the PARITY live-hardware evidence
inventory. Not a CLI the reference has — evidence tooling only.
"""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dsl_tpu.config import Config
    from dsl_tpu.models import build_detector
    from dsl_tpu.models.detectors.single_stage import (
        detector_predict, init_detector_variables)

    cfg = Config.fromfile("configs/yolact/yolact_r50_1x8_coco.py")
    det = build_detector(cfg.model)
    assert det.neck.upsample_cfg == dict(mode="bilinear"), \
        "YOLACT neck must carry the bilinear upsample_cfg"
    rng = jax.random.PRNGKey(0)
    variables = init_detector_variables(
        det, rng, jnp.zeros((1, 256, 256, 3), jnp.float32))

    imgs = jnp.asarray(
        np.random.RandomState(0).randn(2, 256, 256, 3).astype(np.float32))
    shapes = jnp.asarray([[256, 256], [200, 224]], jnp.float32)
    sfs = jnp.ones((2, 4), jnp.float32)

    def predict(v, im, sh, sf):
        return detector_predict(det, v, im, img_shapes=sh, scale_factors=sf,
                                test_cfg=dict(cfg.test_cfg))

    out = jax.jit(predict)(variables, imgs, shapes, sfs)
    dets = np.asarray(out[0])
    assert np.isfinite(dets).all()
    print(f"yolact_predict_on_{jax.devices()[0].platform}: "
          f"dets{dets.shape} finite=ok")


if __name__ == "__main__":
    main()
