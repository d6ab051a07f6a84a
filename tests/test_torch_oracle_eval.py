"""Torch oracles for the VOC-protocol evaluation tier: the reference's own
``mmdet/core/evaluation/mean_ap.py`` (``average_precision``,
``tpfp_default``, ``eval_map`` incl. scale_ranges and the voc07 11-point
mode) and ``recall.py`` (``eval_recalls`` greedy one-to-one matching),
executed on CPU with mmcv/terminaltables stubbed, against
``dsl_tpu/core/eval/mean_ap.py`` on adversarial random inputs (ignore boxes
that out-overlap real gts, duplicate detections, images with no gts,
fewer proposals than gts).

Skipped automatically when /root/reference is unavailable.
"""

import itertools
import os.path as osp
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference/mmdet"
REF_MAP = osp.join(REF_ROOT, "core/evaluation/mean_ap.py")

pytestmark = pytest.mark.skipif(not osp.exists(REF_MAP),
                                reason="reference tree not available")


def _load_reference_eval():
    import importlib.util

    new_mods = {}

    def _stub(name):
        mod = types.ModuleType(name)
        new_mods[name] = mod
        return mod

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = name.rsplit(".", 1)[0]
        new_mods[name] = mod
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    mmcv = _stub("mmcv")
    mmcv.is_str = lambda x: isinstance(x, str)
    mmcv_utils = _stub("mmcv.utils")
    mmcv_utils.print_log = lambda *a, **k: None
    mmcv.utils = mmcv_utils
    tt = _stub("terminaltables")

    class _Tbl:
        def __init__(self, *a, **k):
            self.inner_footing_row_border = False
            self.table = ""

    tt.AsciiTable = _Tbl

    class _FakePool:
        """Serial stand-in for multiprocessing.Pool (1-CPU container)."""

        def __init__(self, *a, **k):
            pass

        def starmap(self, fn, it):
            return list(itertools.starmap(fn, it))

        def close(self):
            pass

    for pkg in ("refe", "refe.core", "refe.core.evaluation"):
        _stub(pkg)

    saved = {k: sys.modules.get(k) for k in set(new_mods)}
    sys.modules.update(new_mods)
    try:
        _load("refe.core.evaluation.bbox_overlaps",
              osp.join(REF_ROOT, "core/evaluation/bbox_overlaps.py"))
        _load("refe.core.evaluation.class_names",
              osp.join(REF_ROOT, "core/evaluation/class_names.py"))
        m = _load("refe.core.evaluation.mean_ap", REF_MAP)
        m.Pool = _FakePool
        r = _load("refe.core.evaluation.recall",
                  osp.join(REF_ROOT, "core/evaluation/recall.py"))

        class _NpCompat:
            """Old-numpy behavior: ragged np.array -> object array (the
            reference's eval_recalls relies on it)."""

            def __getattr__(self, k):
                return getattr(np, k)

            def array(self, obj, *a, **k):
                try:
                    return np.array(obj, *a, **k)
                except ValueError:
                    out = np.empty(len(obj), dtype=object)
                    for i, o in enumerate(obj):
                        out[i] = o
                    return out

        r.np = _NpCompat()
        return types.SimpleNamespace(
            average_precision=m.average_precision,
            tpfp_default=m.tpfp_default, eval_map=m.eval_map,
            eval_recalls=r.eval_recalls)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def ref_mod():
    return _load_reference_eval()


def _random_eval_case(seed, num_imgs=6, num_classes=3):
    """Dets + annotations with adversarial structure: ignore boxes that can
    out-overlap real gts, duplicate dets, a no-gt image, a no-det class."""
    rng = np.random.RandomState(seed)
    dets, anns = [], []
    for i in range(num_imgs):
        n_gt = 0 if i == 3 else rng.randint(1, 5)
        boxes = []
        for _ in range(n_gt):
            x1, y1 = rng.uniform(0, 80, 2)
            boxes.append([x1, y1, x1 + rng.uniform(8, 40),
                          y1 + rng.uniform(8, 40)])
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        labels = rng.randint(0, num_classes, n_gt).astype(np.int64)
        n_ig = rng.randint(0, 3)
        ig = []
        for j in range(n_ig):
            if n_gt and rng.rand() < 0.7:
                b = boxes[rng.randint(n_gt)]
                ig.append(b + rng.uniform(-2, 2, 4))   # near a real gt
            else:
                x1, y1 = rng.uniform(0, 80, 2)
                ig.append([x1, y1, x1 + rng.uniform(8, 30),
                           y1 + rng.uniform(8, 30)])
        ig = np.asarray(ig, np.float32).reshape(-1, 4)
        ig_labels = rng.randint(0, num_classes, n_ig).astype(np.int64)
        ann = dict(bboxes=boxes, labels=labels, bboxes_ignore=ig,
                   labels_ignore=ig_labels)
        if i == 5:
            ann.pop("labels_ignore")       # exercise the None branch
        anns.append(ann)
        img_dets = []
        for c in range(num_classes):
            if c == 2 and i % 2:
                img_dets.append(np.zeros((0, 5), np.float32))
                continue
            src = np.concatenate([boxes[labels == c].reshape(-1, 4),
                                  ig.reshape(-1, 4)], axis=0)
            out = []
            for _ in range(rng.randint(0, 6)):
                if len(src) and rng.rand() < 0.8:
                    b = src[rng.randint(len(src))] + rng.uniform(-4, 4, 4)
                else:
                    x1, y1 = rng.uniform(0, 80, 2)
                    b = np.asarray([x1, y1, x1 + rng.uniform(8, 30),
                                    y1 + rng.uniform(8, 30)])
                b = [min(b[0], b[2] - 1), min(b[1], b[3] - 1),
                     max(b[2], b[0] + 1), max(b[3], b[1] + 1)]
                out.append(list(b) + [rng.rand()])
            if len(out) and rng.rand() < 0.5:
                out.append(list(out[0][:4]) + [rng.rand()])   # duplicate
            img_dets.append(np.asarray(out, np.float32).reshape(-1, 5))
        dets.append(img_dets)
    return dets, anns


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_eval_map_matches_reference(ref_mod, seed):
    from dsl_tpu.core.eval.mean_ap import eval_map

    dets, anns = _random_eval_case(seed)
    for dataset in (None, "voc07"):
        ref_map, ref_res = ref_mod.eval_map(dets, anns, iou_thr=0.5,
                                            dataset=dataset, nproc=1)
        our_map, our_res = eval_map(dets, anns, iou_thr=0.5,
                                    dataset=dataset)
        np.testing.assert_allclose(our_map, ref_map, rtol=1e-6, atol=1e-9,
                                   err_msg=f"mAP dataset={dataset}")
        for c, (r, o) in enumerate(zip(ref_res, our_res)):
            assert o["num_gts"] == r["num_gts"], f"class {c}"
            assert o["num_dets"] == r["num_dets"], f"class {c}"
            np.testing.assert_allclose(o["ap"], r["ap"], rtol=1e-6,
                                       atol=1e-9, err_msg=f"class {c}")


def test_eval_map_scale_ranges_matches_reference(ref_mod):
    from dsl_tpu.core.eval.mean_ap import eval_map

    dets, anns = _random_eval_case(7)
    ranges = [(0, 24), (24, 1e5)]
    ref_map, ref_res = ref_mod.eval_map(dets, anns, scale_ranges=ranges,
                                        iou_thr=0.5, nproc=1)
    our_map, our_res = eval_map(dets, anns, scale_ranges=ranges,
                                iou_thr=0.5)
    np.testing.assert_allclose(our_map, ref_map, rtol=1e-6, atol=1e-9)
    for r, o in zip(ref_res, our_res):
        np.testing.assert_array_equal(o["num_gts"], r["num_gts"])
        np.testing.assert_allclose(o["ap"], r["ap"], rtol=1e-6, atol=1e-9)


def test_tpfp_ignore_argmax_rule(ref_mod):
    """A det whose best IoU is with an IGNORE box is neither tp nor fp even
    if a real gt also clears the threshold — the reference's concatenated
    argmax rule. (Regression: we used to match the real gt.)"""
    from dsl_tpu.core.eval.mean_ap import tpfp_default

    gt = np.asarray([[0, 0, 10, 10]], np.float32)
    ig = np.asarray([[1, 1, 11, 11]], np.float32)
    det = np.asarray([[1, 1, 10.5, 10.5, 0.9]], np.float32)
    ref_tp, ref_fp = ref_mod.tpfp_default(det, gt, ig, 0.5)
    tp, fp = tpfp_default(det, gt, ig, 0.5)
    np.testing.assert_array_equal(tp, ref_tp)
    np.testing.assert_array_equal(fp, ref_fp)
    assert tp.sum() == 0 and fp.sum() == 0


@pytest.mark.parametrize("seed", [0, 4])
def test_eval_recalls_matches_reference(ref_mod, seed):
    from dsl_tpu.core.eval.mean_ap import eval_recalls

    rng = np.random.RandomState(seed)
    gts, props = [], []
    for i in range(5):
        n_gt = rng.randint(0, 6)
        g = []
        for _ in range(n_gt):
            x1, y1 = rng.uniform(0, 80, 2)
            g.append([x1, y1, x1 + rng.uniform(8, 40),
                      y1 + rng.uniform(8, 40)])
        gts.append(np.asarray(g, np.float32).reshape(-1, 4))
        n_p = rng.randint(1, 4) if i == 2 else rng.randint(4, 12)
        p = []
        for _ in range(n_p):
            if n_gt and rng.rand() < 0.7:
                b = gts[-1][rng.randint(n_gt)] + rng.uniform(-5, 5, 4)
            else:
                x1, y1 = rng.uniform(0, 80, 2)
                b = np.asarray([x1, y1, x1 + rng.uniform(8, 30),
                                y1 + rng.uniform(8, 30)])
            p.append([min(b[0], b[2] - 1), min(b[1], b[3] - 1),
                      max(b[2], b[0] + 1), max(b[3], b[1] + 1), rng.rand()])
        props.append(np.asarray(p, np.float32).reshape(-1, 5))
    nums = (1, 3, 10)
    thrs = (0.3, 0.5, 0.7)
    ref = ref_mod.eval_recalls(gts, [p.copy() for p in props],
                               proposal_nums=list(nums),
                               iou_thrs=list(thrs))
    ours = eval_recalls(gts, props, proposal_nums=nums, iou_thrs=thrs)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-9)


def test_average_precision_matches_reference(ref_mod):
    rng = np.random.RandomState(9)
    from dsl_tpu.core.eval.mean_ap import average_precision

    rec = np.sort(rng.rand(40)).astype(np.float32)
    prec = rng.rand(40).astype(np.float32)
    for mode in ("area", "11points"):
        np.testing.assert_allclose(
            average_precision(rec, prec, mode),
            ref_mod.average_precision(rec, prec, mode),
            rtol=1e-6, atol=1e-8, err_msg=mode)


@pytest.mark.parametrize("seed", [0, 6])
def test_eval_map_imagenet_matches_reference(ref_mod, seed):
    """dataset='det' -> tpfp_imagenet (adaptive per-gt IoU thr, gt-1
    offset, best-uncovered-gt matching)."""
    from dsl_tpu.core.eval.mean_ap import eval_map, tpfp_imagenet

    dets, anns = _random_eval_case(seed)
    ref_map, ref_res = ref_mod.eval_map(dets, anns, iou_thr=0.5,
                                        dataset="det", nproc=1)
    our_map, our_res = eval_map(dets, anns, iou_thr=0.5, dataset="det")
    np.testing.assert_allclose(our_map, ref_map, rtol=1e-6, atol=1e-9)
    for c, (r, o) in enumerate(zip(ref_res, our_res)):
        np.testing.assert_allclose(o["ap"], r["ap"], rtol=1e-6, atol=1e-9,
                                   err_msg=f"class {c}")
