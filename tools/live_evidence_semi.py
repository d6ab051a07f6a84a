"""On-chip e2e semi-supervised loop evidence.

VERDICT r3 next #7: the e2e teacher-student test runs only on the CPU mesh.
This CLI runs the full semi cycle on whatever backend is live (the real
TPU when the relay is up): tiny flagship (FCOS + RLA stem), 3 jitted train
steps with donation + EMA, an overlapped pseudo-label refresh against a
synthetic image dir + label store between every step (dispatch iter N,
complete during iter N+1 — exactly `SemiRunner.train_epoch`'s pattern),
then adathres recompute. Asserts finite losses, EMA teacher drift, and
refreshed store records; writes a JSON evidence record.

Usage: python tools/live_evidence_semi.py [--out evidence/live_semi.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_detector, _make_semi_batch
    from dsl_tpu.train import (
        build_optimizer_from_cfg, create_train_state, frozen_backbone_mask,
        make_train_step)
    from dsl_tpu.train.label_store import LabelStore, compute_adathres
    from dsl_tpu.train.semi import PseudoLabelRefresher

    platform = jax.devices()[0].platform
    det = _flagship_detector(tiny=True)
    variables = det.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 64, 64, 3), jnp.float32))
    frozen = frozen_backbone_mask(variables["params"], frozen_stages=1)
    tx, _ = build_optimizer_from_cfg(
        variables["params"],
        dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=1e-4,
             paramwise_cfg=dict(bias_lr_mult=2.0, bias_decay_mult=0.0)),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(warmup="linear", warmup_iters=500,
                       warmup_ratio=1.0 / 3, step=[20, 26]),
        steps_per_epoch=1000, frozen_mask=frozen)
    state = create_train_state(variables, tx, ema_ratio=0.9)
    jstep = jax.jit(make_train_step(det, tx, ema_interval=1,
                                    ema_start_iter=1, frozen_mask=frozen),
                    donate_argnums=(0,))
    batch = _make_semi_batch(jnp, b=4)

    tmp = tempfile.mkdtemp(prefix="live_semi_")
    img_dir = os.path.join(tmp, "imgs")
    os.makedirs(img_dir)
    infos = []
    for i in range(4):
        name = f"u{i}.jpg"
        cv2.imwrite(os.path.join(img_dir, name),
                    np.random.RandomState(i).randint(
                        0, 255, (48, 64, 3), np.uint8))
        infos.append(dict(filename=name, width=64, height=48))
    id2cat = {str(i): f"c{i}" for i in range(80)}
    cat2id = {f"c{i}": i for i in range(80)}
    store = LabelStore(os.path.join(tmp, "annos"), id2cat, cat2id)
    refresher = PseudoLabelRefresher(
        det, store, img_dir, infos,
        test_cfg=dict(nms_pre=100, score_thr=0.05,
                      nms=dict(iou_threshold=0.6), max_per_img=10),
        canvas_hw=(64, 96), img_scale=(96, 64), infer_score_thre=0.0,
        refresh_batch=2, refresh_per_iter=2)

    teacher0 = jax.tree_util.tree_map(
        np.array, state.teacher_variables["params"])

    losses = []
    pending = None
    t0 = time.perf_counter()
    for i in range(3):
        state, metrics = jstep(state, batch)
        if pending is not None:
            pending()            # complete iter N-1's refresh (overlap)
        pending = refresher.dispatch_refresh(
            state, [infos[(2 * i) % 4]["filename"],
                    infos[(2 * i + 1) % 4]["filename"]])
        losses.append(float(metrics["loss"]))
    if pending is not None:
        pending()
    dt = time.perf_counter() - t0

    assert all(np.isfinite(l) for l in losses), losses
    teacher1 = jax.tree_util.tree_map(
        np.array, state.teacher_variables["params"])
    drift = float(sum(
        np.abs(a - b).sum() for a, b in zip(
            jax.tree_util.tree_leaves(teacher0),
            jax.tree_util.tree_leaves(teacher1))))
    assert drift > 0, "EMA teacher never blended"

    recs = {}
    for info in infos:
        rec = store.read(info["filename"])
        assert "targetNum" in rec, rec
        recs[info["filename"]] = int(rec["targetNum"])

    thres = compute_adathres(store, [i["filename"] for i in infos],
                             os.path.join(tmp, "adathres.json"))

    out = dict(platform=platform, losses=[round(l, 4) for l in losses],
               teacher_l1_drift=round(drift, 6),
               store_target_nums=recs,
               adathres_classes=len(thres) if thres is not None else 0,
               wall_s_3iters=round(dt, 2))
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evidence/live_semi.json")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"live semi evidence on {platform}: {out}")


if __name__ == "__main__":
    main()
