"""Per-variant native-vs-decoy margin table for the contrastive sweep.

The sweep's primary outcome is whether a training-side variant FLIPS the
held-out energy inversion (round-4 gt_margin_probe: the native pose scores
ABOVE the sampled-decoy minimum on every fold-0 holdout target — so the
reference's min-energy selection, inference_base.py:653-657, cannot work).
ckpts/contrastive_sweep/README.md records rho/top1; this adds, for each
variant and energy key, how many holdout complexes have a healthy
(negative) margin and the mean margin, appended as a second README table.

    python scripts/contrastive_margins.py [--sweep-dir ...] [--keys ...]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from ranking_analysis import gt_margins

SWEEP_DIR = os.path.join(REPO, "ckpts/contrastive_sweep")
MARK = "## Native-vs-decoy margins"


def margin_table(sweep_dir, keys):
    lines = [MARK, "",
             "Margin = E(native) - min E(decoy); negative = healthy "
             "(the native would be picked). Round-4 diagnosis: inverted "
             "on 4/4 at every t.", "",
             "| variant | key | healthy | mean margin |",
             "|---|---|---|---|"]
    any_rows = False
    for name in sorted(os.listdir(sweep_dir)):
        csv_path = os.path.join(sweep_dir, name, "ranking_exp.csv")
        if not os.path.exists(csv_path):
            continue
        for key in keys:
            m = gt_margins([csv_path], key)
            if not m:
                continue
            any_rows = True
            neg = sum(v < 0 for v in m.values())
            lines.append(f"| {name} | {key} | {neg}/{len(m)} | "
                         f"{np.mean(list(m.values())):+.2f} |")
    lines.append("")
    return "\n".join(lines) if any_rows else ""


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--sweep-dir", default=SWEEP_DIR)
    ap.add_argument("--keys", default="energy_t1em05_mean,energy_t0.2_mean")
    args = ap.parse_args(argv)

    table = margin_table(args.sweep_dir, args.keys.split(","))
    if not table:
        print("no variant CSVs with gt rows found")
        return
    readme = os.path.join(args.sweep_dir, "README.md")
    text = open(readme).read() if os.path.exists(readme) else ""
    if MARK in text:  # re-entrant: replace the old margin section
        text = text[: text.index(MARK)]
    with open(readme, "w") as f:
        f.write(text.rstrip("\n") + "\n\n" + table)
    print(table)


if __name__ == "__main__":
    main()
