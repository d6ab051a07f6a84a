"""CLI smoke tests: tools/train.py + tools/test.py run end-to-end in-process
on the synthetic semi dataset (the reference's tools are only exercised
manually; here they're part of CI)."""

import json
import os.path as osp
import sys

import numpy as np
import pytest

TOOLS = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tools")


def _write_cfg(tmp_path):
    from tests.test_e2e_semi import _make_cfg, _make_data_dir

    _make_data_dir(tmp_path)
    cfg = _make_cfg(tmp_path, str(tmp_path / "adathres.json"))
    cfg_path = tmp_path / "tiny_semi.py"
    cfg.dump(str(cfg_path))
    return cfg_path


@pytest.mark.slow
def test_train_and_test_cli(tmp_path, monkeypatch):
    cfg_path = _write_cfg(tmp_path)
    work_dir = str(tmp_path / "work")

    sys.path.insert(0, TOOLS)
    try:
        import importlib

        train_mod = importlib.import_module("train")
        monkeypatch.setattr(sys, "argv", [
            "train.py", str(cfg_path), "--work-dir", work_dir,
            "--max-devices", "1"])
        train_mod.main()
        assert osp.exists(osp.join(work_dir, "epoch_1.meta.json"))
        assert osp.exists(osp.join(work_dir, "train.log"))

        test_mod = importlib.import_module("test")
        out_json = str(tmp_path / "results.bbox.json")
        monkeypatch.setattr(sys, "argv", [
            "test.py", str(cfg_path), osp.join(work_dir, "epoch_1"),
            "--ema", "--out", out_json])
        test_mod.main()
        assert osp.exists(out_json)
        with open(out_json) as f:
            dets = json.load(f)
        assert isinstance(dets, list)
    finally:
        sys.path.remove(TOOLS)


def test_print_config_cli(tmp_path, capsys):
    cfg_path = _write_cfg(tmp_path)
    from dsl_tpu.config import Config

    cfg = Config.fromfile(str(cfg_path))
    assert cfg.model["type"] == "FCOS"
    assert cfg.data["samples_per_gpu"] == 2
    text = cfg.pretty_text
    assert "FCOS" in text
