"""Benchmark: semi-supervised train-step throughput on the flagship model.

Measures images/sec/chip for the DSL teacher-student training step (FCOS +
RLA-ResNet-50 + FPN, labeled+unlabeled batch with per-source weights, SGD
update, EMA teacher blend — all inside one jitted program) at the reference's
training resolution bucket (800x1344, `Resize(1333,800)+Pad(size_divisor=32)`,
config `configs/fcos_semi/...singlestage.py:71-75`).

Baseline: the reference publishes no throughput (SURVEY.md §6). The
comparison constant below is mmdetection FCOS-R50 measured training
throughput on a V100 (~0.27 s/iter at 2 imgs/GPU ≈ 7.3 img/s/device), the
hardware/protocol the reference trained on (8xV100, 2 img/GPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

V100_REF_IMG_PER_SEC = 7.3  # mmdet FCOS-R50 train throughput per V100


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_detector, _make_semi_batch
    from dsl_tpu.train import (
        build_optimizer_from_cfg, create_train_state, frozen_backbone_mask,
        make_train_step)

    batch_size = 8          # 4 labeled + 4 unlabeled per chip
    h, w = 800, 1344

    det = _flagship_detector()
    # init at a small spatial size: parameter shapes are resolution-
    # independent and the full-res init forward would cost minutes
    variables = det.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 256, 256, 3), jnp.float32))
    frozen = frozen_backbone_mask(variables["params"], frozen_stages=1)
    tx, _ = build_optimizer_from_cfg(
        variables["params"],
        dict(type="SGD", lr=0.01, momentum=0.9, weight_decay=1e-4,
             paramwise_cfg=dict(bias_lr_mult=2.0, bias_decay_mult=0.0)),
        optimizer_config=dict(grad_clip=dict(max_norm=35)),
        lr_config=dict(warmup="linear", warmup_iters=500,
                       warmup_ratio=1.0 / 3, step=[20, 26]),
        steps_per_epoch=1000, frozen_mask=frozen)
    state = create_train_state(variables, tx, ema_ratio=0.99)
    step = make_train_step(det, tx, ema_interval=1,
                           ema_start_iter=1, compute_dtype=jnp.bfloat16,
                           frozen_mask=frozen)
    jstep = jax.jit(step, donate_argnums=(0,))

    batch = _make_semi_batch(jnp, b=batch_size, size=64)
    batch["images"] = jnp.asarray(
        np.random.RandomState(0).rand(batch_size, h, w, 3), jnp.float32)

    # XLA cost analysis of the whole compiled step -> achieved TFLOP/s & MFU
    # (VERDICT r1: report compute honesty, not just img/s). Same jit object
    # as the timed loop, so this shares the single compilation.
    try:
        step_flops = float(
            jstep.lower(state, batch).compile().cost_analysis()["flops"])
    except Exception:
        step_flops = float("nan")

    # warmup / compile. NOTE: force completion with a host transfer —
    # through the axon relay block_until_ready returns early, so timing must
    # be bracketed by an actual device->host fetch of the chained result.
    state, metrics = jstep(state, batch)
    float(metrics["loss"])

    # 30 iters amortizes the axon relay's ~5 ms/dispatch overhead
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = jstep(state, batch)
    final_loss = float(metrics["loss"])  # forces the whole state chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    img_per_sec = batch_size * iters / dt
    step_time = dt / iters
    achieved_tflops = step_flops / step_time / 1e12 \
        if np.isfinite(step_flops) else float("nan")
    # v5e bf16 peak: 197 TFLOP/s/chip
    mfu = achieved_tflops / 197.0 * 100.0
    print(json.dumps({
        "metric": "semi_train_step_images_per_sec_per_chip",
        "value": round(img_per_sec, 3),
        "unit": "img/s/chip @800x1344 bs8 fcos-rla-r50 bf16",
        "vs_baseline": round(img_per_sec / V100_REF_IMG_PER_SEC, 3),
        "achieved_tflops_per_sec": round(achieved_tflops, 2)
        if np.isfinite(achieved_tflops) else None,
        "mfu_pct_v5e_bf16": round(mfu, 2) if np.isfinite(mfu) else None,
        "step_flops": step_flops if np.isfinite(step_flops) else None,
    }))


if __name__ == "__main__":
    main()
