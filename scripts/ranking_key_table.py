"""Cross-fold rank-key comparison table (VERDICT r4 #1, eval-time half).

Aggregates every candidate ranking key that scripts/ranking_experiments.py
records (energy / icons / snorm at each re-scoring t, first-draw vs K-draw
mean, plus num_clashes) over all available fold ranking_exp.csv files and
writes one markdown table: Spearman rho(key, DockQ), min-key top-1 DockQ vs
the random-pick and best-of-P references, the beats-random fraction, and
for keys whose rho comes out positive (candidate inverted direction) the
argmax top-1 as well.  Also reports the native-vs-decoy GT energy margin
health per key (reference ranks by min terminal energy,
/root/reference/src/inference_base.py:653-657 — a healthy surface puts the
native BELOW every decoy).

    python scripts/ranking_key_table.py [--folds 0,1,2,3] [--out ...]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from ranking_analysis import analyze, gt_margins, load_rows, summarize

CV_DIR = os.path.join(REPO, "ckpts/db5_cv")


def top1_argmax(rows, key):
    """Top-1 DockQ when picking the MAX of `key` (direction check for keys
    with positive rho)."""
    picks, rand = [], []
    for _, rs in rows.items():
        rs = [r for r in rs if r.get(key) not in ("", None)]
        if len(rs) < 2:
            continue
        v = np.array([float(r[key]) for r in rs])
        dq = np.array([float(r["DockQ"]) for r in rs])
        picks.append(float(dq[int(np.argmax(v))]))
        rand.append(float(dq.mean()))
    beats = float(np.mean([p > r for p, r in zip(picks, rand)]))
    return float(np.mean(picks)), beats


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--folds", default="0,1,2,3")
    ap.add_argument("--out", default=os.path.join(CV_DIR, "ranking_keys.md"))
    args = ap.parse_args(argv)

    folds = [int(f) for f in args.folds.split(",")]
    paths = [os.path.join(CV_DIR, f"fold{i}", "ranking_exp.csv")
             for i in folds]
    paths = [p for p in paths if os.path.exists(p)]
    rows = load_rows(paths)

    hdr = list(next(iter(rows.values()))[0].keys())
    keys = ["energy", "num_clashes"] + [
        k for k in hdr if k.endswith(("_first", "_mean"))]

    table = []
    for k in keys:
        per = analyze(rows, energy_key=k)
        if not per:
            continue
        agg = summarize(per)
        entry = {"key": k, **agg}
        if agg["rho_dockq"] > 0:  # inverted-direction candidate
            entry["top1_max"], entry["beats_max"] = top1_argmax(rows, k)
        table.append(entry)
    table.sort(key=lambda e: e["rho_dockq"])

    ref = table[0]
    lines = [
        "# Rank-key comparison over held-out CV folds "
        f"({','.join(str(f) for f in folds)}; {len(rows)} complexes, "
        "40 poses each)",
        "",
        "Every eval-time ranking candidate, one row per key.  `top1(min)` ="
        " DockQ of the min-key pose; for positive-rho keys the argmax pick"
        " is shown too.  References: random pick "
        f"{ref['random']:.3f}, best-of-40 {ref['best']:.3f}.",
        "",
        "| key | rho(key,DockQ) | top1(min) | beats random | top1(max) |",
        "|---|---|---|---|---|",
    ]
    for e in table:
        mx = f"{e['top1_max']:.3f}" if "top1_max" in e else "—"
        lines.append(
            f"| {e['key']} | {e['rho_dockq']:+.3f} | {e['top1']:.3f} | "
            f"{e['frac_top1_beats_random']:.0%} | {mx} |")

    lines += ["", "## Native-vs-decoy margin health (want negative)", ""]
    for k in ("energy_t1em05_mean", "energy_t0.4_mean", "icons_t1em05_mean"):
        m = gt_margins(paths, k)
        if not m:
            continue
        neg = sum(v < 0 for v in m.values())
        lines.append(
            f"- `{k}`: {neg}/{len(m)} complexes healthy; "
            f"mean margin {np.mean(list(m.values())):+.2f}")
    lines += [
        "",
        "None of the raw keys above carries usable held-out signal; the",
        "learned leave-fold-out combination of them does (rho +0.157,",
        "permutation p = 5e-05) — see `reranker.md` in this directory and",
        "`--rank-by reranker` in the dock CLI.",
        "",
    ]

    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out} ({len(table)} keys)")


if __name__ == "__main__":
    main()
