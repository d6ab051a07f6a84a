"""Config sweep: every config in configs/ parses and its model builds
(reference parity: ``tests/test_runtime/test_config.py`` builds every config).
"""

import glob
import os.path as osp

import jax
import jax.numpy as jnp
import pytest

from dsl_tpu.config import Config
from dsl_tpu.models.detectors.single_stage import build_detector

CFG_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "configs")
ALL_CONFIGS = [p for p in glob.glob(osp.join(CFG_DIR, "**", "*.py"),
                                    recursive=True)
               if "_base_" not in p]


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: osp.basename(p))
def test_config_parses_and_builds(path):
    cfg = Config.fromfile(path)
    if osp.basename(osp.dirname(path)) == "common":
        # configs/common/* are modelless data/schedule fragments
        # (reference configs/common/mstrain_3x_coco.py)
        assert "data" in cfg and "train" in cfg.data
        assert "lr_config" in cfg
        return
    assert "model" in cfg
    det = build_detector(dict(cfg.model))
    head = det.bbox_heads[0] if hasattr(det, "bbox_heads") \
        else getattr(det, "bbox_head", None)
    if head is not None:
        assert head.num_classes > 0
    else:                     # proposals-only detector (configs/rpn)
        assert det.rpn_head is not None
    # data / schedule sections well-formed
    assert "data" in cfg and "train" in cfg.data
    assert "optimizer" in cfg


def test_flagship_config_tiny_forward():
    cfg = Config.fromfile(
        osp.join(CFG_DIR, "fcos_semi", "RLA_r50_fcos_semi_dsl.py"))
    model_cfg = dict(cfg.model)
    # shrink for test speed
    model_cfg["backbone"] = dict(type="RLA_ResNet", layers=[1, 1, 1, 1])
    model_cfg["neck"]["out_channels"] = 32
    model_cfg["bbox_head"]["in_channels"] = 32
    model_cfg["bbox_head"]["feat_channels"] = 32
    model_cfg["bbox_head"]["stacked_convs"] = 1
    det = build_detector(model_cfg)
    imgs = jnp.zeros((1, 64, 64, 3))
    variables = det.init(jax.random.PRNGKey(0), imgs)
    cls, bbox, cent = det.apply(variables, imgs, training=True)
    assert len(cls) == 5 and cls[0].shape[-1] == 80
