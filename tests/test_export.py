"""StableHLO export artifact: serialize, reload, output equivalence."""

import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(REPO, "tools"))


@pytest.mark.slow
def test_export_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from export import export_detector
    from dsl_tpu.config import Config

    cfg = Config(dict(model=dict(
        type="FCOS",
        backbone=dict(type="ResNet", depth=18, out_indices=(1, 2, 3)),
        neck=dict(type="FPN", in_channels=[128, 256, 512], out_channels=32,
                  start_level=0, num_outs=5),
        bbox_head=dict(type="FCOSHead", num_classes=4, in_channels=32,
                       feat_channels=32, stacked_convs=1),
        test_cfg=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                      max_per_img=10))))

    blob, meta, (predict, args) = export_detector(cfg, batch=1,
                                                  canvas=(64, 64))
    assert meta["input_spec"]["images"] == [1, 64, 64, 3]
    assert meta["num_classes"] == 4
    assert len(blob) > 1000

    # reload from serialized bytes and compare against the live function
    reloaded = jexport.deserialize(blob)
    imgs = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                       jnp.float32)
    shapes = jnp.asarray([[64.0, 64.0]])
    sfs = jnp.ones((1, 4), jnp.float32)
    live = predict(imgs, shapes, sfs)
    rel = reloaded.call(imgs, shapes, sfs)
    for a, b in zip(jax.tree_util.tree_leaves(live),
                    jax.tree_util.tree_leaves(rel)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # int8 export: the quantized program serializes, reloads, and its
    # StableHLO carries int8 convolutions (the TensorRT-int8 analog)
    blob8, meta8, (predict8, _) = export_detector(cfg, batch=1,
                                                  canvas=(64, 64), int8=True)
    assert meta8["quantized"] == "int8-dynamic"
    rel8 = jexport.deserialize(blob8)
    assert "i8" in rel8.mlir_module()
    live8 = predict8(imgs, shapes, sfs)
    got8 = rel8.call(imgs, shapes, sfs)
    for a, b in zip(jax.tree_util.tree_leaves(live8),
                    jax.tree_util.tree_leaves(got8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
