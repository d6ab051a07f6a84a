"""Torch checkpoint import: synthetic state dicts with the reference's key
naming (RLA ImageNet / mmdet detector formats) must land in the right flax
leaves with the right transposes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from dsl_tpu.models import RLAResNet, build_detector
from dsl_tpu.utils.torch_import import (
    load_rla_backbone, load_torch_detector)
from tests.test_models import _tiny_model_cfg


def _fill(shape, seed):
    rng = np.random.RandomState(seed)
    return torch.from_numpy(rng.rand(*shape).astype(np.float32))


def test_rla_backbone_import(tmp_path):
    model = RLAResNet(layers=(1, 1, 1, 1))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    # build a torch-style state dict with the RLA repo's naming
    sd = {}
    sd["conv1.weight"] = _fill((64, 3, 7, 7), 1)
    for part, shape in (("weight", (64,)), ("bias", (64,)),
                        ("running_mean", (64,)), ("running_var", (64,))):
        sd[f"bn1.{part}"] = _fill(shape, 2)
    planes = [64, 128, 256, 512]
    inplanes = 64
    for s in range(4):
        p = planes[s]
        sd[f"conv_outs.{s}.weight"] = _fill((32, p * 4, 1, 1), 10 + s)
        sd[f"recurrent_convs.{s}.weight"] = _fill((32, 32, 3, 3), 20 + s)
        tp = f"stages.{s}.0"
        sd[f"{tp}.conv1.weight"] = _fill((p, inplanes + 32, 1, 1), 30 + s)
        sd[f"{tp}.conv2.weight"] = _fill((p, p, 3, 3), 40 + s)
        sd[f"{tp}.conv3.weight"] = _fill((p * 4, p, 1, 1), 50 + s)
        for ci, ch in ((1, p), (2, p), (3, p * 4)):
            for part, shape in (("weight", (ch,)), ("bias", (ch,)),
                                ("running_mean", (ch,)),
                                ("running_var", (ch,))):
                sd[f"{tp}.bn{ci}.{part}"] = _fill(shape, 60 + s * 10 + ci)
        # downsample exists for every stage here (expansion mismatch)
        sd[f"{tp}.downsample.0.weight"] = _fill((p * 4, inplanes, 1, 1),
                                                70 + s)
        for part, shape in (("weight", (p * 4,)), ("bias", (p * 4,)),
                            ("running_mean", (p * 4,)),
                            ("running_var", (p * 4,))):
            sd[f"{tp}.downsample.1.{part}"] = _fill(shape, 80 + s)
        for part, shape in (("weight", (32,)), ("bias", (32,)),
                            ("running_mean", (32,)), ("running_var", (32,))):
            sd[f"stage_bns.{s}.0.{part}"] = _fill(shape, 90 + s)
        inplanes = p * 4

    sd_np = {k: v.numpy() for k, v in sd.items()}
    out = load_rla_backbone(sd_np, {"params": {"backbone":
                                               variables["params"]},
                                    "batch_stats": {"backbone":
                                                    variables.get(
                                                        "batch_stats", {})}})
    bp = out["params"]["backbone"]
    # conv kernels transposed OIHW->HWIO
    np.testing.assert_allclose(
        np.asarray(bp["conv1"]["kernel"]),
        sd_np["conv1.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(bp["layer2_0"]["conv2"]["kernel"]),
        sd_np["stages.1.0.conv2.weight"].transpose(2, 3, 1, 0))
    # BN split into params + batch_stats
    np.testing.assert_allclose(np.asarray(bp["bn1"]["scale"]),
                               sd_np["bn1.weight"])
    bs = out["batch_stats"]["backbone"]
    np.testing.assert_allclose(np.asarray(bs["bn1"]["mean"]),
                               sd_np["bn1.running_mean"])
    # the imported forward must run
    new_vars = {"params": bp, "batch_stats": bs}
    feats = RLAResNet(layers=(1, 1, 1, 1)).apply(new_vars,
                                                 jnp.zeros((1, 64, 64, 3)))
    assert feats[-1].shape == (1, 2, 2, 2048)


def test_detector_head_import():
    cfg = _tiny_model_cfg()
    det = build_detector(cfg)
    variables = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    sd = {
        "bbox_head.conv_cls.weight": _fill((4, 32, 3, 3), 1).numpy(),
        "bbox_head.conv_cls.bias": _fill((4,), 2).numpy(),
        "bbox_head.scales.0.scale": np.asarray(1.5, np.float32),
        "neck.lateral_convs.0.conv.weight": _fill((32, 128, 1, 1), 3).numpy(),
        "neck.lateral_convs.0.conv.bias": _fill((32,), 4).numpy(),
    }
    import dsl_tpu.utils.torch_import as ti

    orig = ti._load_state_dict
    ti._load_state_dict = lambda path: sd
    try:
        out = ti.load_torch_detector("fake.pth", variables)
    finally:
        ti._load_state_dict = orig
    np.testing.assert_allclose(
        np.asarray(out["params"]["bbox_head"]["conv_cls"]["kernel"]),
        sd["bbox_head.conv_cls.weight"].transpose(2, 3, 1, 0))
    assert float(out["params"]["bbox_head"]["scale0"]["scale"]) == 1.5
    np.testing.assert_allclose(
        np.asarray(out["params"]["neck"]["lateral_conv0"]["kernel"]),
        sd["neck.lateral_convs.0.conv.weight"].transpose(2, 3, 1, 0))
