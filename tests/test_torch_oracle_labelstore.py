"""Torch oracle for the DSL pseudo-label store refresh — the paper's core
mechanism. Executes the reference's OWN ``save_results2file``
(``/root/reference/mmdet/runner/hooks/unlabel_pred_hook.py:83-175``,
incl. ``parse_det_results``'s int-truncation + 6-decimal score rounding,
``gen_save_json_dict`` score-desc sorting, old-label fusion order,
background-class exclusion, per-class mmcv nms at iou with
score_threshold=0.1) against ``dsl_tpu/train/label_store.py
LabelStore.update`` on the same tmpdir store, for every
fuse/first_ignore combination.

Skipped automatically when /root/reference is unavailable.
"""

import json
import os
import os.path as osp
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/mmdet"
REF_HOOK = osp.join(REF_ROOT, "runner/hooks/unlabel_pred_hook.py")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not osp.exists(REF_HOOK),
                                reason="reference tree not available")


def _mmcv_nms(boxes, scores, iou_threshold, score_threshold=0.0):
    """Faithful mmcv ``nms`` stub (numpy in, numpy out): filter below
    score_threshold, greedy by score, suppress IoU > thr, return
    (dets (k, 5) score-desc, keep indices)."""
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    scores = np.asarray(scores, np.float32).reshape(-1)
    valid = np.where(scores >= score_threshold)[0] \
        if score_threshold > 0 else np.arange(len(scores))
    b, s = boxes[valid], scores[valid]
    order = np.argsort(-s, kind="mergesort")
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    supp = np.zeros(len(b), bool)
    keep = []
    for i in order:
        if supp[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(b[i, 0], b[:, 0])
        yy1 = np.maximum(b[i, 1], b[:, 1])
        xx2 = np.minimum(b[i, 2], b[:, 2])
        yy2 = np.minimum(b[i, 3], b[:, 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        iou = inter / np.maximum(areas[i] + areas - inter, 1e-10)
        supp |= iou > iou_threshold
        supp[i] = False
    keep = np.asarray(keep, np.int64)
    dets = np.concatenate([b[keep], s[keep, None]], axis=1)
    return dets, valid[keep]


def _load_reference_hook():
    import importlib.util

    new_mods = {}

    def _stub(name):
        mod = types.ModuleType(name)
        new_mods[name] = mod
        return mod

    mmcv = _stub("mmcv")
    mmcv_runner = _stub("mmcv.runner")
    mmcv_runner.Hook = object

    class _Reg:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    mmcv_runner.HOOKS = _Reg()
    mmcv_parallel = _stub("mmcv.parallel")
    mmcv_parallel.collate = lambda *a, **k: None
    mmcv_parallel.scatter = lambda *a, **k: None
    mmcv_ops = _stub("mmcv.ops")
    mmcv_ops.nms = _mmcv_nms
    mmcv.runner, mmcv.parallel, mmcv.ops = (mmcv_runner, mmcv_parallel,
                                            mmcv_ops)
    mmdet = _stub("mmdet")
    mmdet_ds = _stub("mmdet.datasets")
    mmdet_pipe = _stub("mmdet.datasets.pipelines")
    mmdet_pipe.Compose = object
    mmdet_api = _stub("mmdet.datasets.api_wrappers")
    mmdet_api.COCO = object
    mmdet.datasets = mmdet_ds
    mmdet_ds.pipelines, mmdet_ds.api_wrappers = mmdet_pipe, mmdet_api

    saved = {k: sys.modules.get(k) for k in set(new_mods)}
    sys.modules.update(new_mods)
    try:
        spec = importlib.util.spec_from_file_location("ref_unlabel_hook",
                                                      REF_HOOK)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_unlabel_hook"] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        sys.modules.pop("ref_unlabel_hook", None)


@pytest.fixture(scope="module")
def ref_mod():
    return _load_reference_hook()


CLASSES = ["car", "dog", "cat"]
ID2CAT = {"0": "car", "1": "dog", "2": "cat", "3": "bg"}
CAT2ID = {"car": 0, "dog": 1, "cat": 2, "bg": 3}


def _per_class_results(rng, n_per=5):
    """Per-class (n, 5) float det arrays with scores straddling thresholds."""
    out = []
    for _ in range(len(CLASSES)):
        x1 = rng.uniform(0, 60, n_per)
        y1 = rng.uniform(0, 60, n_per)
        arr = np.stack(
            [x1, y1, x1 + rng.uniform(5, 30, n_per),
             y1 + rng.uniform(5, 30, n_per),
             rng.uniform(0.02, 0.95, n_per)], 1).astype(np.float32)
        out.append(arr)
    return out


def _old_store(rng):
    n = 4
    x1 = rng.uniform(0, 50, n)
    y1 = rng.uniform(0, 50, n)
    rects = np.trunc(np.stack(
        [x1, y1, x1 + rng.uniform(8, 30, n),
         y1 + rng.uniform(8, 30, n)], 1)).astype(np.float64)
    return dict(imageName="full/img1.jpg", targetNum=n,
                rects=rects.tolist(),
                tags=[CLASSES[i % 3] for i in range(n)],
                masks=[[] for _ in range(n)],
                scores=[0.5, 0.9, 0.33, 0.71])


@pytest.mark.parametrize("fuse,first_ignore",
                         [(False, False), (True, False), (True, True)])
def test_label_refresh_matches_reference(ref_mod, fuse, first_ignore,
                                         tmp_path):
    from dsl_tpu.train.label_store import LabelStore

    rng = np.random.RandomState(11)
    result = _per_class_results(rng)
    old = _old_store(rng)

    # ---- reference layout: images/full/img1.jpg + annos/full/img1.jpg.json
    img_root = tmp_path / "images"
    (img_root / "full").mkdir(parents=True)
    img_path = str(img_root / "full" / "img1.jpg")
    ref_save = tmp_path / "ref_annos"
    (ref_save / "full").mkdir(parents=True)
    with open(ref_save / "full" / "img1.jpg.json", "w") as f:
        json.dump(old, f)
    ref_mod.save_results2file(
        [r.copy() for r in result], img_path, 120, 160, "json",
        "ckpt.pth", 0.1, ID2CAT, CAT2ID, str(img_root), str(ref_save),
        "Det", anno_root_path=str(ref_save), iou=0.55, fuse=fuse,
        first_ignore=first_ignore)
    with open(ref_save / "full" / "img1.jpg.json") as f:
        ref_out = json.load(f)

    # ---- ours: flat store dir keyed by image name
    our_root = tmp_path / "our_annos"
    store = LabelStore(str(our_root), ID2CAT, CAT2ID)
    with open(our_root / "img1.jpg.json", "w") as f:
        json.dump(old, f)
    boxes = np.concatenate([r[:, :4] for r in result])
    scores = np.concatenate([r[:, 4] for r in result])
    cids = np.concatenate([np.full(len(r), c)
                           for c, r in enumerate(result)])
    store.update("img1.jpg", boxes, scores, cids, infer_score_thre=0.1,
                 iou=0.55, fuse=fuse, first_ignore=first_ignore)
    our_out = store.read("img1.jpg")

    assert our_out["targetNum"] == ref_out["targetNum"], \
        (fuse, first_ignore, our_out["targetNum"], ref_out["targetNum"])
    assert our_out["imageName"] == ref_out["imageName"]
    # rects come out grouped per class in NMS order on both sides
    np.testing.assert_allclose(
        np.asarray(our_out["rects"], np.float64).reshape(-1, 4),
        np.asarray(ref_out["rects"], np.float64).reshape(-1, 4),
        rtol=0, atol=1e-4, err_msg=f"fuse={fuse} fi={first_ignore}")
    assert our_out["tags"] == ref_out["tags"]
    np.testing.assert_allclose(our_out["scores"], ref_out["scores"],
                               rtol=0, atol=2e-6)


def test_adathres_matches_reference(ref_mod, tmp_path):
    """``adathres`` (unlabel_pred_hook.py:295-367) vs our
    ``compute_adathres``: two rounds — fresh (0.3 score gate) then gated by
    the previous round's per-class thresholds; weights (mean-count /
    score-sum)^gamma2, thresholds clip((score-sum / mean-count)^gamma1 *
    base, ranges); new-in-round-2 classes always counted."""
    from dsl_tpu.train.label_store import LabelStore, compute_adathres

    rng = np.random.RandomState(3)
    ref_dir = tmp_path / "ref_annos"
    ref_dir.mkdir()
    our_root = tmp_path / "our_annos"
    store = LabelStore(str(our_root), ID2CAT, CAT2ID)
    names = []
    for i in range(6):
        name = f"img{i}.jpg"
        n = rng.randint(0, 5)
        tags = [CLASSES[rng.randint(3)] for _ in range(n)]
        if i == 5:
            tags = ["cat"] * n   # a class that may be new in round 2
        scores = rng.uniform(0.1, 0.9, n).round(4).tolist()
        rects = rng.uniform(0, 50, (n, 4)).round(0).tolist()
        data = dict(imageName="full/" + name, targetNum=n, rects=rects,
                    tags=tags, masks=[[] for _ in range(n)], scores=scores)
        with open(ref_dir / (name + ".json"), "w") as f:
            json.dump(data, f)
        with open(our_root / (name + ".json"), "w") as f:
            json.dump(data, f)
        names.append(name)

    ref_file = str(tmp_path / "ref_adathres.json")
    our_file = str(tmp_path / "our_adathres.json")
    input_list = ["root/full/" + n for n in names]
    for round_i in range(2):
        ref_mod.adathres(0, True, ref_file, ID2CAT, CAT2ID, input_list,
                         str(ref_dir),
                         dict(ranges=[0.3, 0.35], gamma1=0.05, gamma2=0.6,
                              base=0.3))
        compute_adathres(store, names, our_file, ranges=(0.3, 0.35),
                         gamma1=0.05, gamma2=0.6, base=0.3)
        with open(ref_file) as f:
            ref_out = json.load(f)
        with open(our_file) as f:
            our_out = json.load(f)
        for key in ("cat", "thres"):
            assert set(our_out[key]) == set(ref_out[key]), (round_i, key)
            for t in ref_out[key]:
                np.testing.assert_allclose(
                    our_out[key][t], ref_out[key][t], rtol=1e-9,
                    err_msg=f"round {round_i} {key} {t}")
        assert {int(k) for k in our_out["id"]} == \
            {int(k) for k in ref_out["id"]}
