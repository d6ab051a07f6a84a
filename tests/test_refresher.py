"""PseudoLabelRefresher scheduling + store integration with a stubbed
predict step (mock-runner style, reference test strategy §4)."""

import json

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from dsl_tpu.train.label_store import LabelStore
from dsl_tpu.train.semi import PseudoLabelRefresher


class FakeState:
    teacher_variables = {"params": {}}
    student_variables = {"params": {}}


@pytest.fixture
def env(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    infos = []
    for i in range(4):
        name = f"u{i}.jpg"
        cv2.imwrite(str(img_dir / name),
                    np.random.RandomState(i).randint(0, 255, (40, 60, 3),
                                                     np.uint8))
        infos.append(dict(filename=name, width=60, height=40))
    store = LabelStore(str(tmp_path / "annos"),
                       {"0": "a", "1": "b", "2": "bg"},
                       {"a": 0, "b": 1, "bg": 2})
    for info in infos:
        store.write(info["filename"], [], [], [])
    return img_dir, store, infos


def _make_refresher(img_dir, store, infos, **kw):
    r = PseudoLabelRefresher(
        detector=None, store=store, image_root=str(img_dir),
        image_infos=infos, canvas_hw=(64, 96), img_scale=(96, 64),
        refresh_batch=2, **kw)
    calls = []

    def fake_predict(variables, images, shapes, sfs):
        calls.append(images.shape[0])
        b = images.shape[0]
        dets = jnp.tile(jnp.asarray([[5., 5., 20., 20., 0.8]]), (b, 3, 1))
        labels = jnp.zeros((b, 3), jnp.int32)
        valid = jnp.tile(jnp.asarray([True, False, False]), (b, 1))
        return dets, labels, valid

    r._predict = fake_predict
    return r, calls


def test_refresh_images_writes_store(env):
    img_dir, store, infos = env
    r, calls = _make_refresher(img_dir, store, infos)
    r.refresh_images(FakeState(), ["u0.jpg", "u1.jpg"])
    data = store.read("u0.jpg")
    assert data["targetNum"] == 1
    assert data["tags"] == ["a"]
    assert abs(data["scores"][0] - 0.8) < 1e-6
    # untouched image keeps its empty record
    assert store.read("u2.jpg")["targetNum"] == 0


def test_iteration_mode_preload_lookahead(env):
    img_dir, store, infos = env
    r, calls = _make_refresher(img_dir, store, infos, mode="iteration",
                               start_point=1, interval=1, preload=1)
    upcoming = ["u0.jpg", "u1.jpg", "u2.jpg", "u3.jpg"]
    # iter 0 with preload 1, 1 consumed/iter -> refreshes position 1
    r.after_train_iter(FakeState(), epoch=0, upcoming=upcoming,
                       iter_in_epoch=0, consumed_per_iter=1)
    assert store.read("u1.jpg")["targetNum"] == 1
    assert store.read("u0.jpg")["targetNum"] == 0


def test_iteration_mode_start_point_gates(env):
    img_dir, store, infos = env
    r, calls = _make_refresher(img_dir, store, infos, mode="iteration",
                               start_point=8, interval=1, preload=0)
    r.after_train_iter(FakeState(), epoch=0,
                       upcoming=["u0.jpg"], iter_in_epoch=0,
                       consumed_per_iter=1)
    assert store.read("u0.jpg")["targetNum"] == 0    # before start epoch
    r.after_train_iter(FakeState(), epoch=7,
                       upcoming=["u0.jpg"], iter_in_epoch=0,
                       consumed_per_iter=1)
    assert store.read("u0.jpg")["targetNum"] == 1    # epoch 8 (1-based)


def test_epoch_mode_full_refresh_and_adathres(env, tmp_path):
    img_dir, store, infos = env
    r, calls = _make_refresher(img_dir, store, infos, mode="epoch",
                               start_point=1)
    ada = str(tmp_path / "adathres.json")
    r.after_train_epoch(FakeState(), epoch=0, adathres_file=ada)
    for info in infos:
        assert store.read(info["filename"])["targetNum"] == 1
    with open(ada) as f:
        result = json.load(f)
    assert "thres" in result and "a" in result["thres"]


def test_eval_flip_merges_by_nms(env):
    img_dir, store, infos = env
    r, calls = _make_refresher(img_dir, store, infos, eval_flip=True)
    r.refresh_images(FakeState(), ["u0.jpg"])
    # flipped + original detections of the same object fuse to >=1 box
    data = store.read("u0.jpg")
    assert data["targetNum"] >= 1
    assert len(calls) == 2  # two predict passes (orig + flip)
