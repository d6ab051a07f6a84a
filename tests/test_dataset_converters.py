"""Dataset converter (pascal_voc / cityscapes) and robustness_eval tests."""

import json
import os
import os.path as osp
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(REPO, "tools"))


def _write_voc(tmp_path):
    root = tmp_path / "VOC2007"
    (root / "ImageSets" / "Main").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main" / "trainval.txt").write_text("img0\n")
    (root / "Annotations" / "img0.xml").write_text("""
<annotation>
  <size><width>100</width><height>80</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>50</xmax><ymax>60</ymax>
    </bndbox></object>
  <object><name>person</name><difficult>1</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>30</xmax><ymax>40</ymax>
    </bndbox></object>
</annotation>""")
    return tmp_path


def test_pascal_voc_converter(tmp_path):
    from dataset_converters.pascal_voc import (VOC_CLASSES, cvt_to_coco_json,
                                               parse_xml)

    devkit = _write_voc(tmp_path)
    a = parse_xml(str(devkit / "VOC2007" / "Annotations" / "img0.xml"),
                  "VOC2007/JPEGImages/img0.jpg")
    assert a["width"] == 100 and len(a["objects"]) == 2
    coco = cvt_to_coco_json([a])
    assert len(coco["categories"]) == len(VOC_CLASSES)
    dog = coco["annotations"][0]
    assert dog["category_id"] == VOC_CLASSES.index("dog") + 1
    assert dog["bbox"] == [9, 19, 41, 41]          # 1-indexed -> -1 on min
    assert dog["iscrowd"] == 0
    assert coco["annotations"][1]["ignore"] == 1   # difficult


def test_cityscapes_converter(tmp_path):
    import cv2

    from dataset_converters.cityscapes import convert

    img_dir = tmp_path / "leftImg8bit" / "val" / "city"
    gt_dir = tmp_path / "gtFine" / "val" / "city"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    cv2.imwrite(str(img_dir / "a_leftImg8bit.png"),
                np.zeros((32, 48, 3), np.uint8))
    inst = np.zeros((32, 48), np.uint16)
    inst[2:10, 3:20] = 26001        # car instance 1
    inst[12:20, 5:15] = 24          # crowd person region
    inst[0:2, 0:2] = 7              # stuff (road) — ignored
    cv2.imwrite(str(gt_dir / "a_gtFine_instanceIds.png"), inst)

    out = tmp_path / "out.json"
    convert(str(tmp_path / "leftImg8bit" / "val"),
            str(tmp_path / "gtFine" / "val"), str(out))
    coco = json.loads(out.read_text())
    assert len(coco["images"]) == 1
    assert coco["images"][0]["file_name"] == os.path.join(
        "city", "a_leftImg8bit.png")
    anns = coco["annotations"]
    assert len(anns) == 2
    by_cat = {a["category_id"]: a for a in anns}
    car = by_cat[26]
    assert car["iscrowd"] == 0 and car["bbox"] == [3, 2, 17, 8]
    assert car["area"] == 17 * 8
    person = by_cat[24]
    assert person["iscrowd"] == 1

    # RLE roundtrip
    from dsl_tpu.core.masks import decode_rle

    m = decode_rle(car["segmentation"])
    assert m.sum() == car["area"]


def test_robustness_eval_aggregate():
    from robustness_eval import aggregate

    results = {
        "gaussian_noise@1": {"bbox_mAP": 0.3},
        "gaussian_noise@3": {"bbox_mAP": 0.2},
        "clean": {"bbox_mAP": 0.5},
    }
    P, mPC, rPC = aggregate(results)
    assert np.isclose(mPC["bbox_mAP"], 0.25)
    assert np.isclose(P["bbox_mAP"], 0.5)
    assert np.isclose(rPC["bbox_mAP"], 0.5)


def test_convert_checkpoint_styles():
    from convert_checkpoint import convert_regnet_key, convert_state_dict

    assert convert_regnet_key("stem.conv.weight") == "conv1.weight"
    assert convert_regnet_key("stem.bn.bias") == "bn1.bias"
    assert convert_regnet_key("head.fc.weight") == "fc.weight"
    assert convert_regnet_key("s1.b1.proj.weight") == \
        "layer1.0.downsample.0.weight"
    assert convert_regnet_key("s1.b1.bn.weight") == \
        "layer1.0.downsample.1.weight"
    assert convert_regnet_key("s2.b3.f.a_bn.running_mean") == \
        "layer2.2.bn1.running_mean"
    assert convert_regnet_key("s4.b1.f.c.weight") == "layer4.0.conv3.weight"

    moco = {"module.encoder_q.conv1.weight": 1,
            "module.encoder_k.conv1.weight": 2, "queue": 3}
    out = convert_state_dict(moco, "moco")
    assert dict(out) == {"conv1.weight": 1}
    swav = {"module.conv1.weight": 4, "prototypes.weight": 5}
    assert dict(convert_state_dict(swav, "swav")) == {"conv1.weight": 4}


def test_upgrade_model_version_channel_transforms(tmp_path):
    """v1->v2: cls background channel 0 moves to last; per-class reg drops
    the background group (reference upgrade_model_version.py semantics)."""
    import sys
    import os.path as osp
    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools",
                                "model_converters"))
    import numpy as np
    import torch
    from upgrade_model_version import convert

    nc = 5   # v1: 5 incl. background-first
    sd = {
        "bbox_head.retina_cls.bias": torch.arange(nc, dtype=torch.float32),
        "bbox_head.fc_reg.weight": torch.arange(
            nc * 4 * 3, dtype=torch.float32).reshape(nc * 4, 3),
        "backbone.conv1.weight": torch.ones(4, 3, 3, 3),
    }
    src, dst = str(tmp_path / "v1.pth"), str(tmp_path / "v2.pth")
    torch.save({"state_dict": sd}, src)
    convert(src, dst, num_classes=nc)
    out = torch.load(dst)["state_dict"]
    np.testing.assert_allclose(out["bbox_head.retina_cls.bias"].numpy(),
                               [1, 2, 3, 4, 0])       # bg rolled to last
    assert out["bbox_head.fc_reg.weight"].shape == ((nc - 1) * 4, 3)
    np.testing.assert_allclose(
        out["bbox_head.fc_reg.weight"].numpy(),
        sd["bbox_head.fc_reg.weight"].numpy()[4:])    # bg group dropped
    np.testing.assert_allclose(out["backbone.conv1.weight"].numpy(),
                               sd["backbone.conv1.weight"].numpy())


def test_upgrade_ssd_version_key_renames(tmp_path):
    import sys
    import os.path as osp
    sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools",
                                "model_converters"))
    import torch
    from upgrade_ssd_version import convert

    sd = {"backbone.extra.2.weight": torch.ones(1),
          "backbone.l2_norm.weight": torch.ones(1),
          "bbox_head.cls_convs.0.weight": torch.ones(1)}
    src, dst = str(tmp_path / "old.pth"), str(tmp_path / "new.pth")
    torch.save({"state_dict": sd}, src)
    convert(src, dst)
    out = torch.load(dst)["state_dict"]
    assert "neck.extra_layers.1.0.conv.weight" in out
    assert "neck.l2_norm.weight" in out
    assert "bbox_head.cls_convs.0.0.weight" in out
