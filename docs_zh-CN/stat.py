#!/usr/bin/env python
"""Generate ``modelzoo_statistics.md`` (reference: docs/stat.py).

The reference counts checkpoint links in per-family ``configs/*/README.md``
files; this repo's configs tree is .py-file-for-file with the reference but
carries no per-family READMEs, so the statistics count config files per
family and cross-link the parity inventory instead.
"""
import glob
import os.path as osp

families = {}
for f in sorted(glob.glob(osp.join(osp.dirname(__file__),
                                   "../configs/*/*.py"))):
    fam = osp.basename(osp.dirname(f))
    if fam == "_base_":
        continue
    families.setdefault(fam, []).append(osp.basename(f))

lines = [
    "# Model Zoo Statistics",
    "",
    f"* Number of model families: {len(families)}",
    f"* Number of config files: {sum(len(v) for v in families.values())}",
    "",
    "Every family below builds in the config sweep"
    " (`tests/test_configs_build.py`) and one flagship per family runs"
    " loss+predict in `tests/test_configs_forward.py`; see `docs/model_zoo.md`"
    " and `PARITY.md` for the component inventory.",
    "",
]
for fam, cfgs in sorted(families.items()):
    lines.append(f"* [{fam}](../configs/{fam}) ({len(cfgs)} configs)")

out = osp.join(osp.dirname(__file__), "modelzoo_statistics.md")
with open(out, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {out}: {len(families)} families")
