"""Oracle: the scale-invariant input append vs the reference's OWN code.

Extracts the exact SI-append block from the reference runner source
(``/root/reference/mmdet/runner/hooks/semi_epoch_based_runner.py:186-204``,
the ``if self.scale_invariant:`` block inside ``train()``) and EXECUTES it in
torch on a synthetic padded batch with nonempty ``gt_bboxes_ignore``; then
asserts the repo's ``build_batch(scale_invariant=True)`` produces the same
half image, halved GT, halved ignore boxes, int-truncated half img_shape and
halved scale_factor.

Pinned because round-3 review found ``_half_res_copy`` keeping
full-resolution ignore boxes (displacing the half image's cls-loss ignore
masking by up to 2x) — this test fails on that code.
"""

import re
import textwrap

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dsl_tpu.data.formatting import build_batch, format_sample

REF = "/root/reference/mmdet/runner/hooks/semi_epoch_based_runner.py"


class _DC:
    """Minimal mmcv DataContainer stand-in (the block only touches .data)."""

    def __init__(self, data):
        self.data = data


def _extract_si_block():
    src = open(REF).read()
    start = src.index("if self.scale_invariant:")
    end = src.index("#### using the weak aug image")
    block = src[start:end]
    # keep only code lines (strip trailing blank/comment-only lines)
    lines = [ln for ln in block.splitlines() if ln.strip()]
    assert lines[0].lstrip().startswith("if self.scale_invariant:")
    # sanity: the block we extracted is the one that halves the ignore boxes
    assert any("gt_bboxes_ignore" in ln and "/2" in ln for ln in lines)
    base_indent = len(lines[0]) - len(lines[0].lstrip())
    return textwrap.dedent("\n".join(ln[base_indent:] for ln in lines))


def _run_reference_block(imgs_nchw, metas, gts, labels, ignores):
    """Execute the reference's own SI-append lines on a torch batch."""
    import copy as _copy

    class _Self:
        scale_invariant = True

    data_batch = {
        "img": _DC([imgs_nchw.clone()]),
        "img_metas": _DC([_copy.deepcopy(metas)]),
        "gt_bboxes": _DC([[t.clone() for t in gts]]),
        "gt_labels": _DC([[t.clone() for t in labels]]),
        "gt_bboxes_ignore": _DC([[t.clone() for t in ignores]]),
    }
    ns = {"self": _Self(), "data_batch": data_batch, "torch": torch,
          "copy": _copy}
    exec(compile(_extract_si_block(), REF, "exec"), ns)
    return data_batch


def _make_sample(rng, h, w, canvas, n_gt, n_ig):
    img = rng.standard_normal((h, w, 3)).astype(np.float32)
    gt = np.sort(rng.uniform(0, [w, h, w, h], (n_gt, 4)).astype(np.float32)
                 .reshape(n_gt, 2, 2), axis=1).reshape(n_gt, 4)
    ig = np.sort(rng.uniform(0, [w, h, w, h], (n_ig, 4)).astype(np.float32)
                 .reshape(n_ig, 2, 2), axis=1).reshape(n_ig, 4)
    labels = rng.integers(0, 80, (n_gt,)).astype(np.int64)
    res = dict(img=img, gt_bboxes=gt, gt_labels=labels, gt_bboxes_ignore=ig,
               scale_factor=np.array([1.6, 1.6, 1.6, 1.6], np.float32))
    return res, format_sample(res, canvas_hw=canvas)


def test_si_append_matches_reference_block():
    rng = np.random.default_rng(7)
    canvas = (96, 160)
    raw, fmt = [], []
    shapes = [(90, 150), (77, 160)]  # last image not canvas-filling
    for i, (h, w) in enumerate(shapes):
        r, f = _make_sample(rng, h, w, canvas, n_gt=4, n_ig=3)
        raw.append(r)
        fmt.append(f)

    # ---- reference side: padded NCHW batch + per-image tensor lists ----
    imgs = torch.zeros((2, 3, *canvas))
    metas = []
    for i, r in enumerate(raw):
        h, w = r["img"].shape[:2]
        imgs[i, :, :h, :w] = torch.from_numpy(r["img"]).permute(2, 0, 1)
        metas.append(dict(img_shape=(h, w, 3), pad_shape=(*canvas, 3),
                          scale_factor=r["scale_factor"].copy(),
                          filename=f"im{i}.jpg"))
    ref = _run_reference_block(
        imgs, metas,
        [torch.from_numpy(r["gt_bboxes"]) for r in raw],
        [torch.from_numpy(r["gt_labels"]) for r in raw],
        [torch.from_numpy(r["gt_bboxes_ignore"]) for r in raw])

    # ---- repo side ----
    batch = build_batch(fmt, scale_invariant=True)
    si_half = int(batch["si_pair"]["half"][0])
    assert batch["images"].shape[0] == 3 and si_half == 2

    # half image: reference resizes the WHOLE padded canvas bilinearly and
    # places it top-left (semi_epoch_based_runner.py:195-199)
    ref_half = ref["img"].data[0][2].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(batch["images"][si_half], ref_half,
                               atol=2e-3, rtol=0)
    # exact zeros outside the top-left half
    assert np.all(batch["images"][si_half, canvas[0] // 2:] == 0)
    assert np.all(batch["images"][si_half, :, canvas[1] // 2:] == 0)

    # halved GT boxes + copied labels (:201-202)
    v = batch["gt_valid"][si_half]
    np.testing.assert_allclose(batch["gt_bboxes"][si_half][v],
                               ref["gt_bboxes"].data[0][2].numpy(), atol=1e-6)
    np.testing.assert_array_equal(batch["gt_labels"][si_half][v],
                                  ref["gt_labels"].data[0][2].numpy())

    # halved IGNORE boxes (:203-204) — the round-3 parity bug
    iv = batch["ignore_valid"][si_half]
    np.testing.assert_allclose(
        batch["ignore_bboxes"][si_half][iv],
        ref["gt_bboxes_ignore"].data[0][2].numpy(), atol=1e-6)

    # img_shape halved with int truncation (:188), scale_factor /2 (:190)
    m = ref["img_metas"].data[0][2]
    np.testing.assert_array_equal(batch["img_shapes"][si_half],
                                  np.asarray(m["img_shape"][:2], np.float32))
    np.testing.assert_allclose(batch["scale_factors"][si_half],
                               m["scale_factor"], atol=1e-7)


def test_si_append_empty_ignore_stays_empty():
    """Reference only divides nonempty ignore tensors (:203-204) — with zero
    ignore boxes both sides must agree on an empty set."""
    rng = np.random.default_rng(3)
    canvas = (64, 96)
    r, f = _make_sample(rng, 61, 96, canvas, n_gt=2, n_ig=0)
    batch = build_batch([f], scale_invariant=True)
    si_half = int(batch["si_pair"]["half"][0])
    assert not batch["ignore_valid"][si_half].any()


def test_si_append_odd_valid_shape_truncates():
    """img_shape 77 -> 38 (int truncation), not 38.5."""
    rng = np.random.default_rng(5)
    canvas = (96, 160)
    r, f = _make_sample(rng, 77, 153, canvas, n_gt=1, n_ig=1)
    batch = build_batch([f], scale_invariant=True)
    si_half = int(batch["si_pair"]["half"][0])
    np.testing.assert_array_equal(batch["img_shapes"][si_half],
                                  np.array([38.0, 76.0], np.float32))
