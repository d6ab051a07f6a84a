#!/usr/bin/env python
"""On-hardware evidence: int8 PTQ inference throughput on the flagship.

Runs the bs8 800x1344 u8-canvas predict (same program bench.py measures)
in bf16 and through `quantize_convs` (every conv int8 on the MXU), plus
int8 vs bf16 output agreement on one batch. Writes
``evidence/live_int8.json``.

Microbenchmark context (v5e, measured): 3x3x256 conv = 101.2 TF/s bf16 vs
181.9 TOP/s int8 (1.8x); int8 peak is 394 TOP/s vs 197 TF/s bf16.
"""

import json
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_detector
    from dsl_tpu.models.detectors.single_stage import detector_predict
    from dsl_tpu.utils.quantize import calibrate_convs, quantize_convs

    h, w, bs = 800, 1344, 8
    det = _flagship_detector()
    variables = det.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 256, 256, 3), jnp.float32))
    tc = dict(nms_pre=1000, score_thr=0.05, nms=dict(iou_threshold=0.6),
              max_per_img=100)
    mean = jnp.asarray([123.675, 116.28, 103.53], jnp.float32)
    std = jnp.asarray([58.395, 57.12, 57.375], jnp.float32)

    def predict(images_u8, img_shapes, scale_factors):
        images = (images_u8.astype(jnp.float32) - mean) / std
        return detector_predict(det, variables, images,
                                img_shapes=img_shapes,
                                scale_factors=scale_factors, test_cfg=tc,
                                compute_dtype=jnp.bfloat16)

    p_bf16 = jax.jit(predict)
    p_int8 = jax.jit(quantize_convs(predict))

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 255, (bs, h, w, 3), np.uint8))
    shapes = jnp.tile(jnp.asarray([[800.0, 1200.0]]), (bs, 1))
    sfs = jnp.ones((bs, 4), jnp.float32)

    out = {}

    def bench(fn, name, iters=30):
        # whole measurement under retry: relay compiles AND dispatch storms
        # die transiently; a failure must not kill the remaining benches
        for attempt in range(3):
            try:
                t0 = time.perf_counter()
                dets, labels, valid = fn(imgs, shapes, sfs)
                np.asarray(dets)
                out[f"{name}_compile_s"] = round(time.perf_counter() - t0, 1)
                t0 = time.perf_counter()
                for _ in range(iters):
                    dets, labels, valid = fn(imgs, shapes, sfs)
                np.asarray(dets)     # chain-forcing fetch (relay: no
                dt = time.perf_counter() - t0   # block_until_ready)
                out[f"{name}_img_per_sec"] = round(bs * iters / dt, 2)
                return dets, labels, valid
            except Exception as e:     # noqa: BLE001
                if attempt == 2:
                    out[f"{name}_error"] = str(e)[:200]
        return None, None, None

    def ratio(name):
        a, b = out.get(f"{name}_img_per_sec"), out.get("bf16_img_per_sec")
        if a and b:
            out[f"{name}_vs_bf16"] = round(a / b, 3)

    d16, l16, v16 = bench(p_bf16, "bf16")
    d8, l8, v8 = bench(p_int8, "int8_dynamic")
    ratio("int8_dynamic")

    # calibrated static scales: the quantize/dequant become fusable
    # elementwise ops (no per-conv range reduction) — the mode that should
    # realize the MXU int8 speedup end to end
    try:
        t0 = time.perf_counter()
        scales = calibrate_convs(predict, (imgs, shapes, sfs))
        out["calibrate_s"] = round(time.perf_counter() - t0, 1)
        out["n_convs"] = len(scales)
        p_cal = jax.jit(quantize_convs(predict, act_scales=scales))
        dc, lc, vc = bench(p_cal, "int8_calibrated")
        ratio("int8_calibrated")
        if dc is not None:
            d8, l8, v8 = dc, lc, vc
    except Exception as e:             # noqa: BLE001
        out["calibrate_error"] = str(e)[:200]

    # agreement on the shared batch: greedy same-label best-IoU pairing —
    # NMS may rank/threshold borderline boxes differently in the two
    # precisions, so positional (row-by-row) differencing would compare
    # unrelated detections
    if v16 is not None and v8 is not None:
        n_pairs, box_mad, score_mad = 0, 0.0, 0.0
        for bi in range(bs):
            a = np.asarray(d16[bi])[np.asarray(v16[bi])]
            la = np.asarray(l16[bi])[np.asarray(v16[bi])]
            c = np.asarray(d8[bi])[np.asarray(v8[bi])]
            lc_ = np.asarray(l8[bi])[np.asarray(v8[bi])]
            used = np.zeros(len(c), bool)
            for i in range(len(a)):
                best, bj = 0.0, -1
                for j in range(len(c)):
                    if used[j] or la[i] != lc_[j]:
                        continue
                    x1 = max(a[i, 0], c[j, 0]); y1 = max(a[i, 1], c[j, 1])
                    x2 = min(a[i, 2], c[j, 2]); y2 = min(a[i, 3], c[j, 3])
                    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
                    ua = ((a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
                          + (c[j, 2] - c[j, 0]) * (c[j, 3] - c[j, 1])
                          - inter)
                    iou = inter / max(ua, 1e-6)
                    if iou > best:
                        best, bj = iou, j
                if bj >= 0 and best > 0.5:
                    used[bj] = True
                    n_pairs += 1
                    box_mad += float(np.abs(a[i, :4] - c[bj, :4]).mean())
                    score_mad += float(abs(a[i, 4] - c[bj, 4]))
        if n_pairs:
            out["n_matched_dets"] = n_pairs
            out["box_mad_px"] = round(box_mad / n_pairs, 3)
            out["score_mad"] = round(score_mad / n_pairs, 4)
    out["platform"] = jax.devices()[0].platform
    out["device"] = str(jax.devices()[0])

    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    "evidence", "live_int8.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
