"""On-chip TRAIN-STEP zoo evidence: jitted grad + SGD + EMA steps per family.

The loss/predict zoo (tools/live_evidence_zoo.py) proves forward lowering on
the real chip; this CLI proves the BACKWARD path lowers and optimizes there
too, for a representative slice of backward machinery: RoI
sampling/RoIAlign grads (two-stage, mask), cascade stages, anchor targets
(Retina/GFL's DFL integral), the device-Hungarian set loss (DETR), corner
pools + associative embedding (CornerNet), prototype masks (YOLACT), and
learned-proposal DII heads (Sparse R-CNN).

Per family: 3 full ``make_train_step`` iterations (donated state, in-graph
EMA) on the tiny-channel flagship; asserts every loss finite and that the
student params actually moved (update L2 > 0).

Usage:  python tools/live_evidence_trainstep.py
        [--out evidence/live_trainstep.json] [--families a,b,...]

Not a CLI the reference has — evidence tooling only (the reference's
analog assertion layer is tests/test_models/test_forward.py, CPU-only).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.live_evidence_zoo import FAMILIES, _batch  # noqa: E402

DEFAULT_FAMILIES = ("faster_rcnn,mask_rcnn,cascade_rcnn,retinanet,gfl,"
                    "detr,cornernet,yolact,sparse_rcnn,fcos_rla")


def run_family(name: str):
    import jax
    import jax.numpy as jnp

    from dsl_tpu.models.detectors.single_stage import (
        build_detector, init_detector_variables)
    from dsl_tpu.train import (
        build_optimizer_from_cfg, create_train_state, make_train_step)

    cfg = dict(FAMILIES[name])
    cfg.pop("test_cfg", None)
    det = build_detector(cfg)
    batch = _batch(jnp, with_mask_areas=(name == "ms_rcnn"))
    variables = init_detector_variables(
        det, jax.random.PRNGKey(0), batch["images"][:1])
    p0 = jax.tree_util.tree_map(np.array, variables["params"])

    tx, _ = build_optimizer_from_cfg(
        variables["params"],
        dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=1e-4),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(warmup_iters=10, warmup_ratio=0.5),
        steps_per_epoch=1000)
    state = create_train_state(variables, tx, ema_ratio=0.9)
    jstep = jax.jit(make_train_step(det, tx, ema_interval=1,
                                    ema_start_iter=1),
                    donate_argnums=(0,))

    t0 = time.perf_counter()
    losses = []
    for _ in range(3):
        state, metrics = jstep(state, batch)
        losses.append(float(metrics["loss"]))   # forces the chain
    t_3steps = time.perf_counter() - t0

    assert np.isfinite(losses).all(), f"{name}: non-finite loss {losses}"
    upd = jax.tree_util.tree_map(
        lambda a, b: float(np.linalg.norm(np.asarray(a, np.float64)
                                          - np.asarray(b, np.float64))),
        p0, jax.tree_util.tree_map(np.array, state.params))
    upd_l2 = float(np.sqrt(sum(
        v ** 2 for v in jax.tree_util.tree_leaves(upd))))
    assert upd_l2 > 0, f"{name}: params did not move"
    return dict(losses=[round(x, 4) for x in losses],
                update_l2=round(upd_l2, 5),
                t_3steps_s=round(t_3steps, 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evidence/live_trainstep.json")
    ap.add_argument("--families", default=DEFAULT_FAMILIES)
    args = ap.parse_args()

    import jax

    platform = jax.devices()[0].platform
    record = dict(platform=platform, families={})
    if os.path.exists(args.out):      # merge: successive runs accumulate
        with open(args.out) as f:
            prev = json.load(f)
        if prev.get("platform") == platform:
            record["families"].update(prev.get("families", {}))
    for name in args.families.split(","):
        name = name.strip()
        if not name:
            continue
        print(f"[{platform}] train-step {name} ...", flush=True)
        try:
            record["families"][name] = run_family(name)
            print(f"  ok: {record['families'][name]}", flush=True)
        except Exception as e:                          # noqa: BLE001
            record["families"][name] = dict(error=repr(e)[:300])
            print(f"  FAIL: {e!r}", flush=True)
        jax.clear_caches()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    n_ok = sum("error" not in v for v in record["families"].values())
    print(f"live train-step evidence: {n_ok}/{len(record['families'])} ok "
          f"on {platform} -> {args.out}")
    if n_ok < len(record["families"]):
        raise SystemExit(1)


if __name__ == "__main__":
    main()
