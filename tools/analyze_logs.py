#!/usr/bin/env python
"""Training-log analysis (reference parity:
``tools/analysis_tools/analyze_logs.py``): parse the runner's text logs and
report/plot loss curves and timing stats."""

import argparse
import json
import re
import sys

LINE = re.compile(
    r"Epoch \[(\d+)\]\[(\d+)/(\d+)\] (.*)")
KV = re.compile(r"(\w+): ([-\d.naninf]+)")


def parse_log(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            if line.lstrip().startswith("{"):
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if row.get("mode") == "train":
                    rows.append(row)
                continue
            m = LINE.search(line)
            if not m:
                continue
            row = dict(epoch=int(m.group(1)), iter=int(m.group(2)),
                       total=int(m.group(3)))
            for k, v in KV.findall(m.group(4)):
                try:
                    row[k] = float(v)
                except ValueError:
                    pass
            rows.append(row)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log", help="train.log from a work dir")
    p.add_argument("--keys", nargs="+", default=["loss"])
    p.add_argument("--plot", help="write a PNG curve here (needs matplotlib)")
    p.add_argument("--json", action="store_true", help="dump rows as json")
    args = p.parse_args()

    rows = parse_log(args.log)
    if not rows:
        print("no training iterations found", file=sys.stderr)
        return
    if args.json:
        print(json.dumps(rows))
        return
    for key in args.keys:
        vals = [r[key] for r in rows if key in r]
        if not vals:
            continue
        print(f"{key}: first={vals[0]:.4f} last={vals[-1]:.4f} "
              f"min={min(vals):.4f} max={max(vals):.4f} n={len(vals)}")
    if "time" in rows[-1]:
        times = [r["time"] for r in rows if "time" in r]
        print(f"avg iter time: {sum(times) / len(times):.4f}s")
    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for key in args.keys:
            vals = [r[key] for r in rows if key in r]
            plt.plot(vals, label=key)
        plt.legend()
        plt.xlabel("log step")
        plt.savefig(args.plot)
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
