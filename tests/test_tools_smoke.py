"""Smoke tests for the host-only analysis tools (analyze_logs,
eval_metric, compute_distribution, publish_model)."""

import json
import os
import os.path as osp
import sys

import numpy as np
import cv2
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(REPO, "tools"))


def test_analyze_logs_parses_text_and_json(tmp_path):
    from analyze_logs import parse_log

    log = tmp_path / "train.log"
    log.write_text(
        "2026-01-01 INFO Epoch [1][10/100] loss: 1.2345 loss_cls: 0.5 "
        "time: 0.17\n"
        "garbage line\n"
        '{"mode": "train", "epoch": 1, "iter": 20, "loss": 1.1}\n'
        '{"mode": "val", "bbox_mAP": 0.3}\n')
    rows = parse_log(str(log))
    assert len(rows) == 2
    assert rows[0]["epoch"] == 1 and rows[0]["iter"] == 10
    assert np.isclose(rows[0]["loss"], 1.2345)
    assert np.isclose(rows[1]["loss"], 1.1)


def test_eval_metric_cli(tmp_path, monkeypatch, capsys):
    import importlib

    from dsl_tpu.config import Config

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "a.jpg"),
                np.zeros((32, 32, 3), np.uint8))
    ann = dict(images=[dict(id=1, file_name="a.jpg", width=32, height=32)],
               categories=[dict(id=1, name="c")],
               annotations=[dict(id=1, image_id=1, category_id=1,
                                 bbox=[4, 4, 10, 10], area=100, iscrowd=0)])
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    dets = [dict(image_id=1, category_id=1, bbox=[4, 4, 10, 10],
                 score=0.9)]
    (tmp_path / "res.json").write_text(json.dumps(dets))
    cfg = Config(dict(
        model=dict(type="FCOS", bbox_head=dict(num_classes=1)),
        data=dict(test=dict(type="CocoDataset",
                            ann_file=str(tmp_path / "ann.json"),
                            img_prefix=str(img_dir), pipeline=[],
                            filter_empty_gt=False)),
        optimizer=dict(type="SGD", lr=0.01)))
    cfg_path = tmp_path / "cfg.py"
    cfg.dump(str(cfg_path))

    mod = importlib.import_module("eval_metric")
    monkeypatch.setattr(sys, "argv", ["eval_metric.py", str(cfg_path),
                                      str(tmp_path / "res.json")])
    mod.main()
    out = capsys.readouterr().out
    assert "Average Precision" in out or "AP" in out
    # a perfect single detection scores mAP 1.0
    assert "1.000" in out


def test_compute_distribution_cli(tmp_path, monkeypatch, capsys):
    import importlib

    for i, (n, tags, scores) in enumerate(
            [(2, ["cat", "dog"], [0.9, 0.4]), (0, [], [])]):
        (tmp_path / f"{i}.json").write_text(json.dumps(
            dict(targetNum=n, tags=tags, scores=scores)))
    mod = importlib.import_module("compute_distribution")
    mod.report(str(tmp_path), bins=5)
    out = capsys.readouterr().out
    assert "images: 2" in out and "boxes: 2" in out
    assert "empty imgs: 1" in out
    assert "cat: 0.900" in out


def test_publish_model_cli(tmp_path, monkeypatch, capsys):
    import glob
    import importlib

    from dsl_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    prefix = str(tmp_path / "epoch_1")
    state = dict(params={"w": np.ones((3,), np.float32)},
                 teacher_params={"w": np.full((3,), 2.0, np.float32)},
                 batch_stats={})
    save_checkpoint(prefix, state, meta=dict(epoch=1))

    # load by explicit path: tools/model_converters/publish_model.py (the
    # reference-layout alias, no main()) shadows the real module when
    # test_dataset_converters put its dir on sys.path first
    spec = importlib.util.spec_from_file_location(
        "publish_model_real", osp.join(REPO, "tools", "publish_model.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out_prefix = str(tmp_path / "published")
    monkeypatch.setattr(sys, "argv", ["publish_model.py", prefix,
                                      out_prefix, "--teacher"])
    mod.main()
    out = capsys.readouterr().out
    assert "published to" in out
    published = glob.glob(out_prefix + "-*")
    assert published, "publish_model wrote nothing"
    # published checkpoint reloads and carries the teacher weights as params
    pub_prefix = sorted(p for p in published
                        if p.endswith(".orbax"))[0][:-len(".orbax")]
    loaded, meta = load_checkpoint(pub_prefix, None)
    assert meta.get("published") is True
    np.testing.assert_allclose(np.asarray(loaded["params"]["w"]),
                               np.full((3,), 2.0))


def _tiny_dataset_cfg(tmp_path, with_pipeline=True):
    from dsl_tpu.config import Config

    img_dir = tmp_path / "imgs"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    cv2.imwrite(str(img_dir / "a.jpg"),
                rng.randint(0, 255, (48, 64, 3), np.uint8))
    ann = dict(images=[dict(id=1, file_name="a.jpg", width=64, height=48)],
               categories=[dict(id=1, name="c")],
               annotations=[dict(id=1, image_id=1, category_id=1,
                                 bbox=[4, 4, 20, 20], area=400, iscrowd=0)])
    (tmp_path / "ann.json").write_text(json.dumps(ann))
    pipeline = [
        dict(type="LoadImageFromFile"),
        dict(type="LoadAnnotations", with_bbox=True),
        dict(type="Resize", img_scale=(64, 48), keep_ratio=True),
        dict(type="RandomFlip", flip_ratio=0.0),
        dict(type="Normalize", mean=[0, 0, 0], std=[1, 1, 1], to_rgb=True),
        dict(type="Pad", size_divisor=32)] if with_pipeline else []
    ds = dict(type="CocoDataset", ann_file=str(tmp_path / "ann.json"),
              img_prefix=str(img_dir), pipeline=pipeline,
              filter_empty_gt=False)
    return Config(dict(
        model=dict(
            type="FCOS",
            backbone=dict(type="ResNet", depth=18, out_indices=(1, 2, 3)),
            neck=dict(type="FPN", in_channels=[128, 256, 512],
                      out_channels=32, start_level=0, num_outs=5),
            bbox_head=dict(type="FCOSHead", num_classes=1, in_channels=32,
                           feat_channels=32, stacked_convs=1),
            test_cfg=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                          max_per_img=5)),
        canvas_hw=(64, 64),
        data=dict(train=dict(ds), val=dict(ds), test=dict(ds)),
        optimizer=dict(type="SGD", lr=0.01)))


def test_browse_dataset_cli(tmp_path, monkeypatch):
    import importlib

    cfg = _tiny_dataset_cfg(tmp_path)
    cfg_path = tmp_path / "cfg.py"
    cfg.dump(str(cfg_path))
    mod = importlib.import_module("browse_dataset")
    out_dir = str(tmp_path / "browse")
    monkeypatch.setattr(sys, "argv", [
        "browse_dataset.py", str(cfg_path), "--output-dir", out_dir,
        "--number", "1"])
    mod.main()
    import glob

    assert glob.glob(osp.join(out_dir, "*")), "no visualization written"


def test_analyze_results_cli(tmp_path, monkeypatch):
    import importlib

    cfg = _tiny_dataset_cfg(tmp_path)
    cfg_path = tmp_path / "cfg.py"
    cfg.dump(str(cfg_path))
    dets = [dict(image_id=1, category_id=1, bbox=[4, 4, 20, 20], score=0.9)]
    (tmp_path / "res.json").write_text(json.dumps(dets))
    mod = importlib.import_module("analyze_results")
    show_dir = str(tmp_path / "analysis")
    monkeypatch.setattr(sys, "argv", [
        "analyze_results.py", str(cfg_path), str(tmp_path / "res.json"),
        "--show-dir", show_dir, "--topk", "1"])
    mod.main()
    import glob

    assert glob.glob(osp.join(show_dir, "**", "*"), recursive=True)


def test_benchmark_cli(tmp_path, monkeypatch, capsys):
    import importlib

    cfg = _tiny_dataset_cfg(tmp_path)
    cfg_path = tmp_path / "cfg.py"
    cfg.dump(str(cfg_path))
    mod = importlib.import_module("benchmark")
    monkeypatch.setattr(sys, "argv", [
        "benchmark.py", str(cfg_path), "--shape", "64", "64",
        "--iters", "2", "--warmup", "1"])
    mod.main()
    assert "img/s" in capsys.readouterr().out
    # int8 PTQ path: calibrate + quantized predict on the same tiny model
    monkeypatch.setattr(sys, "argv", [
        "benchmark.py", str(cfg_path), "--shape", "64", "64",
        "--iters", "2", "--warmup", "1", "--int8"])
    mod.main()
    assert "img/s" in capsys.readouterr().out


def test_get_flops_cli(tmp_path, monkeypatch, capsys):
    import importlib

    cfg = _tiny_dataset_cfg(tmp_path)
    cfg_path = tmp_path / "cfg.py"
    cfg.dump(str(cfg_path))
    mod = importlib.import_module("get_flops")
    monkeypatch.setattr(sys, "argv", [
        "get_flops.py", str(cfg_path), "--shape", "64", "64"])
    mod.main()
    out = capsys.readouterr().out
    assert "FLOP" in out or "flops" in out.lower()


@pytest.mark.slow
def test_serve_http_roundtrip(tmp_path, monkeypatch):
    import importlib
    import socket
    import threading
    import time
    import urllib.request

    cfg = _tiny_dataset_cfg(tmp_path)
    cfg_path = tmp_path / "cfg.py"
    cfg.dump(str(cfg_path))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    mod = importlib.import_module("serve")
    monkeypatch.setattr(sys, "argv", [
        "serve.py", str(cfg_path), "--port", str(port),
        "--score-thr", "0.0"])
    t = threading.Thread(target=mod.main, daemon=True)
    t.start()

    # wait for readiness via /health
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=2) as r:
                if r.status == 200:
                    break
        except Exception:
            time.sleep(1.0)
    else:
        pytest.fail("serve.py never became healthy")

    img = np.random.RandomState(0).randint(0, 255, (48, 64, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict", data=enc.tobytes(),
        headers={"Content-Type": "application/octet-stream"})
    with urllib.request.urlopen(req, timeout=60) as r:
        body = json.loads(r.read())
    assert "detections" in body
    for d in body["detections"]:
        assert set(d) == {"bbox", "score", "label", "class_name"}


def test_coco_error_analysis_cli(tmp_path, monkeypatch, capsys):
    import importlib

    cfg = _tiny_dataset_cfg(tmp_path)
    cfg_path = tmp_path / "cfg.py"
    cfg.dump(str(cfg_path))
    # one perfect detection, one badly localized duplicate
    dets = [dict(image_id=1, category_id=1, bbox=[4, 4, 20, 20], score=0.9),
            dict(image_id=1, category_id=1, bbox=[10, 10, 24, 24],
                 score=0.5)]
    (tmp_path / "res.json").write_text(json.dumps(dets))
    mod = importlib.import_module("coco_error_analysis")
    monkeypatch.setattr(sys, "argv", [
        "coco_error_analysis.py", str(cfg_path), str(tmp_path / "res.json")])
    mod.main()
    out = capsys.readouterr().out
    assert "AP@[.5:.95]" in out


@pytest.mark.slow
def test_test_robustness_cli(tmp_path, monkeypatch):
    import importlib

    cfg = _tiny_dataset_cfg(tmp_path)
    cfg_path = tmp_path / "cfg.py"
    cfg.dump(str(cfg_path))
    mod = importlib.import_module("test_robustness")

    # the corruption bank itself: every corruption produces a valid image
    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    for name in mod.CORRUPTION_SETS["all"]:
        out = mod.corrupt(img, name, 3)
        assert out.shape == img.shape and out.dtype == np.uint8
    # the benchmark set is the reference's full 15-corruption protocol
    assert len(mod.CORRUPTION_SETS["benchmark"]) == 15

    out_json = str(tmp_path / "robust.json")
    monkeypatch.setattr(sys, "argv", [
        "test_robustness.py", str(cfg_path),
        "--corruptions", "gaussian_noise",
        "--severities", "1", "--out", out_json])
    mod.main()
    res = json.loads(open(out_json).read())
    assert "gaussian_noise@1" in res and "mPC" in res
    assert np.isfinite(res["mPC"])

    # the aggregator consumes the output
    from robustness_eval import aggregate

    _, mPC, _ = aggregate(res)
    assert "bbox_mAP" in mPC


def test_tools_tree_covers_reference_listing():
    """Every tool path in the reference tree (``/root/reference/tools``)
    exists here — incl. the analysis_tools/misc/model_converters aliases
    and the deployment placeholders that map to the TPU equivalents."""
    ref_tools = osp.join("/root/reference", "tools")
    if not osp.isdir(ref_tools):
        pytest.skip("reference tree not available")
    missing = []
    for root, _, files in os.walk(ref_tools):
        rel = osp.relpath(root, ref_tools)
        for f in files:
            if not f.endswith((".py", ".sh")):
                continue
            if not osp.exists(osp.join(REPO, "tools", rel, f)):
                missing.append(osp.join(rel, f))
    assert not missing, f"reference tools missing here: {missing}"
