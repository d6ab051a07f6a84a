#!/usr/bin/env python
"""FLOPs/params counter via XLA cost analysis (reference parity:
``tools/analysis_tools/get_flops.py`` — instead of hook-based torch counting,
ask the compiled program itself)."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--shape", type=int, nargs=2, default=[800, 1344])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.config:
        from dsl_tpu.config import Config
        from dsl_tpu.models.detectors.single_stage import build_detector

        det = build_detector(dict(Config.fromfile(args.config).model))
    else:
        from __graft_entry__ import _flagship_detector

        det = _flagship_detector()

    h, w = args.shape
    imgs = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = det.init(jax.random.PRNGKey(0), imgs)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        variables["params"]))

    fn = jax.jit(lambda v, im: det.apply(v, im, training=False))
    lowered = fn.lower(variables, imgs)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
        flops = cost.get("flops", float("nan"))
    except Exception:
        flops = float("nan")
    print(f"input: 1x{h}x{w}x3")
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"forward flops (XLA cost analysis): {flops / 1e9:.2f} GFLOPs")


if __name__ == "__main__":
    main()
