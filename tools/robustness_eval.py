"""Aggregate robustness results: P / mPC / rPC.

Parity with ``/root/reference/tools/analysis_tools/robustness_eval.py``:
given a ``robustness.json`` produced by ``tools/test_robustness.py``
(``{corruption@severity: {metric: value}, ...}``) and optionally the clean
performance P (either a ``clean`` entry in the json, severity-0 entries, or
``--clean-json`` with plain eval metrics), prints per-metric

  P    = clean performance
  mPC  = mean performance under corruption (severities > 0)
  rPC  = mPC / P  (relative robustness)

Usage: python tools/robustness_eval.py robustness.json [--clean-json m.json]
"""

import argparse
import json

import numpy as np


def aggregate(results: dict, clean: dict | None = None):
    """Returns (P, mPC, rPC) dicts keyed by metric name."""
    corr = {k: v for k, v in results.items()
            if isinstance(v, dict) and "@" in k and not k.endswith("@0")}
    if clean is None:
        clean = results.get("clean")
    if clean is None:
        sev0 = [v for k, v in results.items()
                if isinstance(v, dict) and k.endswith("@0")]
        if sev0:
            clean = {m: float(np.mean([s[m] for s in sev0]))
                     for m in sev0[0]}
    metrics = sorted({m for v in corr.values() for m in v})
    mPC = {m: float(np.mean([v[m] for v in corr.values() if m in v]))
           for m in metrics}
    P = {m: float(clean[m]) for m in metrics} if clean else {}
    rPC = {m: (mPC[m] / P[m] if P.get(m) else float("nan"))
           for m in metrics} if P else {}
    return P, mPC, rPC


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results_json")
    p.add_argument("--clean-json", default=None,
                   help="metrics json of the uncorrupted eval (P)")
    args = p.parse_args()
    with open(args.results_json) as f:
        results = json.load(f)
    clean = None
    if args.clean_json:
        with open(args.clean_json) as f:
            clean = json.load(f)
    P, mPC, rPC = aggregate(results, clean)
    for m in mPC:
        line = f"{m:>16s}  mPC={mPC[m]:.4f}"
        if P:
            line += f"  P={P.get(m, float('nan')):.4f}"
        if rPC:
            line += f"  rPC={rPC.get(m, float('nan')):.4f}"
        print(line)


if __name__ == "__main__":
    main()
