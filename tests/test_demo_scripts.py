"""Smoke tests for the demo CLIs (video_demo, create_result_gif,
webcam_demo's frame-dump path is exercised through video parts)."""

import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
DEMO = osp.join(REPO, "demo")


def _tiny_cfg(tmp_path):
    from dsl_tpu.config import Config

    cfg = Config(dict(
        model=dict(
            type="FCOS",
            backbone=dict(type="ResNet", depth=18, out_indices=(1, 2, 3)),
            neck=dict(type="FPN", in_channels=[128, 256, 512],
                      out_channels=32, start_level=0, num_outs=5),
            bbox_head=dict(type="FCOSHead", num_classes=4, in_channels=32,
                           feat_channels=32, stacked_convs=1),
            test_cfg=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                          max_per_img=10),
        ),
        canvas_hw=(64, 64),
        data=dict(train=dict(), val=dict(), test=dict()),
        optimizer=dict(type="SGD", lr=0.01),
    ))
    path = tmp_path / "tiny_infer.py"
    cfg.dump(str(path))
    return str(path)


@pytest.mark.slow
def test_video_demo_and_gif(tmp_path, monkeypatch):
    import cv2

    cfg_path = _tiny_cfg(tmp_path)
    # synthetic 3-frame video
    vid = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5, (64, 64))
    rng = np.random.RandomState(0)
    for _ in range(3):
        w.write(rng.randint(0, 255, (64, 64, 3), np.uint8))
    w.release()

    sys.path.insert(0, DEMO)
    try:
        import importlib

        video_mod = importlib.import_module("video_demo")
        out = str(tmp_path / "out.mp4")
        monkeypatch.setattr(sys, "argv", [
            "video_demo.py", vid, cfg_path, "--out", out])
        video_mod.main()
        assert osp.exists(out)
        cap = cv2.VideoCapture(out)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
        cap.release()

        # gif from an image dir
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        for i in range(2):
            cv2.imwrite(str(img_dir / f"{i}.jpg"),
                        rng.randint(0, 255, (64, 64, 3), np.uint8))
        gif_mod = importlib.import_module("create_result_gif")
        gif_out = str(tmp_path / "res.gif")
        monkeypatch.setattr(sys, "argv", [
            "create_result_gif.py", str(img_dir), cfg_path,
            "--out", gif_out])
        gif_mod.main()
        from PIL import Image

        im = Image.open(gif_out)
        assert im.n_frames == 2
    finally:
        sys.path.remove(DEMO)
