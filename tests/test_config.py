import os

import pytest

from dsl_tpu.config import Config
from dsl_tpu.registry import Registry, build_from_cfg


def test_config_fromstring_and_access():
    cfg = Config.fromstring("a = 1\nb = dict(c=[1, 2], d='x')\n")
    assert cfg.a == 1
    assert cfg.b.c == [1, 2]
    assert cfg.b.d == "x"
    assert "a" in cfg
    with pytest.raises(AttributeError):
        _ = cfg.missing


def test_config_base_inheritance(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("model = dict(type='FCOS', depth=50, neck=dict(ch=256))\n"
                    "lr = 0.01\n")
    child = tmp_path / "child.py"
    child.write_text("_base_ = './base.py'\n"
                     "model = dict(depth=101, neck=dict(extra=True))\n")
    cfg = Config.fromfile(str(child))
    assert cfg.model.type == "FCOS"        # inherited
    assert cfg.model.depth == 101          # overridden
    assert cfg.model.neck.ch == 256        # deep merge
    assert cfg.model.neck.extra is True
    assert cfg.lr == 0.01


def test_config_delete_key(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("opt = dict(type='SGD', momentum=0.9)\n")
    child = tmp_path / "child.py"
    child.write_text("_base_ = './base.py'\n"
                     "opt = dict(_delete_=True, type='Adam')\n")
    cfg = Config.fromfile(str(child))
    assert cfg.opt.type == "Adam"
    assert "momentum" not in cfg.opt


def test_merge_from_dict():
    cfg = Config.fromstring("model = dict(backbone=dict(depth=50))\nlr = 0.1\n")
    cfg.merge_from_dict({"model.backbone.depth": 101, "lr": 0.02})
    assert cfg.model.backbone.depth == 101
    assert cfg.lr == 0.02


def test_registry_build():
    REG = Registry("test")

    @REG.register
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = build_from_cfg(dict(type="Foo", a=1), REG)
    assert obj.a == 1 and obj.b == 2
    obj2 = build_from_cfg(dict(type="Foo", a=3), REG, default_args=dict(b=9))
    assert obj2.b == 9
    with pytest.raises(KeyError):
        build_from_cfg(dict(type="Bar"), REG)


def test_config_dump_roundtrip(tmp_path):
    cfg = Config.fromstring("a = dict(b=1, c='s')\nd = [1, 2]\n")
    out = tmp_path / "dump.py"
    cfg.dump(str(out))
    cfg2 = Config.fromfile(str(out))
    assert cfg2.a.b == 1 and cfg2.a.c == "s" and cfg2.d == [1, 2]
