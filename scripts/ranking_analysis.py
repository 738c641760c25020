"""Energy-ranking signal analysis over CV sweep CSVs (VERDICT r3 task 3).

The reference's thesis (DFMDock / MLSB'23) is that the learned energy both
guides sampling AND ranks the sampled poses (min-energy pick — reference
src/utils/metrics.py:56-71, inference.py:533).  Round 3 measured the top-1
min-energy pick underperforming a random pick on held-out targets; this
script quantifies the full ranking signal, not just top-1:

  per complex (40 poses):
    spearman(energy, DockQ)      — want NEGATIVE (low energy = good pose)
    top1   = DockQ of the min-energy pose
    random = mean DockQ over poses (expected value of a random pick)
    best   = max DockQ (the sampler's ceiling)
    regret = best - top1
    also spearman vs c_rmsd (want POSITIVE) — c_rmsd is a denser signal
    than DockQ (DockQ saturates at 0 for most held-out poses)

Usage:
  python scripts/ranking_analysis.py ckpts/db5_cv/fold*/holdout.csv
  python scripts/ranking_analysis.py --csv ... --out ckpts/ranking_base.md
"""
from __future__ import annotations

import argparse
import csv
import glob
import os
import sys
from collections import defaultdict

import numpy as np


def spearman(x, y):
    """Spearman rho without scipy: Pearson on average ranks (tie-aware)."""
    def ranks(v):
        v = np.asarray(v, np.float64)
        order = np.argsort(v, kind="mergesort")
        r = np.empty_like(v)
        r[order] = np.arange(len(v), dtype=np.float64)
        # average ranks over ties
        out = r.copy()
        uniq = {}
        for i, val in enumerate(v):
            uniq.setdefault(val, []).append(i)
        for idxs in uniq.values():
            if len(idxs) > 1:
                out[idxs] = np.mean([r[i] for i in idxs])
        return out

    rx, ry = ranks(x), ranks(y)
    sx, sy = rx.std(), ry.std()
    if sx == 0 or sy == 0:
        return float("nan")
    return float(((rx - rx.mean()) * (ry - ry.mean())).mean() / (sx * sy))


def load_rows(paths, include_gt=False):
    """Per-complex pose rows.  Rows with index == 'gt' are the native-pose
    energy probes ranking_experiments appends — excluded from ranking stats
    unless include_gt (see gt_margins)."""
    rows = defaultdict(list)
    for p in paths:
        with open(p) as f:
            for r in csv.DictReader(f):
                if not include_gt and r.get("index") == "gt":
                    continue
                rows[r["id"]].append(r)
    return rows


def gt_margins(paths, energy_key):
    """Per-complex (E_gt - min E_decoy) for one energy column; negative =
    the native outranks every decoy (healthy)."""
    all_rows = load_rows(paths, include_gt=True)
    out = {}
    for cid, rs in all_rows.items():
        gt = [r for r in rs if r.get("index") == "gt"]
        dec = [r for r in rs if r.get("index") != "gt"]
        dec = [r for r in dec if r.get(energy_key) not in ("", None)]
        if not gt or not dec or not gt[0].get(energy_key):
            continue
        e_gt = float(gt[0][energy_key])
        e_min = min(float(r[energy_key]) for r in dec)
        out[cid] = e_gt - e_min
    return out


def analyze(rows, energy_key="energy"):
    per = {}
    for cid, rs in sorted(rows.items()):
        # tolerate mixed-era CSVs: resumed runs leave '' in columns that were
        # added after the original rows were written (write_csv key union)
        rs = [r for r in rs if r.get(energy_key) not in ("", None)]
        if len(rs) < 2:
            continue
        e = np.array([float(r[energy_key]) for r in rs])
        dq = np.array([float(r["DockQ"]) for r in rs])
        crm = np.array([float(r["c_rmsd"]) for r in rs])
        top1 = dq[int(np.argmin(e))]
        per[cid] = {
            "n": len(rs),
            "rho_dockq": spearman(e, dq),        # want < 0
            "rho_crmsd": spearman(e, crm),       # want > 0
            "top1": top1,
            "random": float(dq.mean()),
            "best": float(dq.max()),
            "regret": float(dq.max() - top1),
            "top1_crmsd": float(crm[int(np.argmin(e))]),
            "random_crmsd": float(crm.mean()),
        }
    return per


def summarize(per):
    agg = {}
    for k in ("rho_dockq", "rho_crmsd", "top1", "random", "best", "regret"):
        vals = [v[k] for v in per.values() if np.isfinite(v[k])]
        agg[k] = float(np.mean(vals)) if vals else float("nan")
    agg["frac_top1_beats_random"] = float(np.mean(
        [v["top1"] > v["random"] for v in per.values()]))
    agg["frac_rho_dockq_neg"] = float(np.mean(
        [v["rho_dockq"] < 0 for v in per.values()
         if np.isfinite(v["rho_dockq"])]))
    agg["frac_rho_crmsd_pos"] = float(np.mean(
        [v["rho_crmsd"] > 0 for v in per.values()
         if np.isfinite(v["rho_crmsd"])]))
    return agg


def render(per, agg, title):
    out = [f"# {title}", "",
           "| id | rho(E,DockQ) | rho(E,c_rmsd) | top1 | random | best | regret |",
           "|---|---|---|---|---|---|---|"]
    for cid, v in sorted(per.items()):
        out.append(
            f"| {cid} | {v['rho_dockq']:+.3f} | {v['rho_crmsd']:+.3f} | "
            f"{v['top1']:.3f} | {v['random']:.3f} | {v['best']:.3f} | "
            f"{v['regret']:.3f} |")
    out += ["",
            f"mean rho(E,DockQ) = {agg['rho_dockq']:+.3f}  (want < 0; "
            f"{agg['frac_rho_dockq_neg']:.0%} of complexes negative)",
            f"mean rho(E,c_rmsd) = {agg['rho_crmsd']:+.3f}  (want > 0; "
            f"{agg['frac_rho_crmsd_pos']:.0%} positive)",
            f"mean top1 {agg['top1']:.3f} vs random {agg['random']:.3f} vs "
            f"best {agg['best']:.3f}  (top1 beats random on "
            f"{agg['frac_top1_beats_random']:.0%})", ""]
    return "\n".join(out)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="*",
                    default=sorted(glob.glob("ckpts/db5_cv/fold*/holdout.csv")))
    ap.add_argument("--energy-key", default="energy")
    ap.add_argument("--title", default="Energy-ranking signal (held-out CV)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    paths = args.csvs or sorted(glob.glob("ckpts/db5_cv/fold*/holdout.csv"))
    rows = load_rows(paths)
    if not rows:
        sys.exit(f"no rows found in {paths}")
    if args.energy_key == "all":
        # one summary line per energy_* column (H1/H2 comparison readout)
        seen = set()
        for rs in rows.values():
            for r in rs:
                seen.update(k for k, v in r.items() if v not in ("", None))
        keys = ["energy"] + sorted(
            k for k in seen
            if k.startswith(("energy_t", "icons_t", "snorm_t"))
            and not k.endswith("_std"))
        lines = [f"# {args.title} — signal comparison", "",
                 "| key | mean rho(E,DockQ) | %neg | top1 | random | best |"
                 " gt<all decoys | mean margin |",
                 "|---|---|---|---|---|---|---|---|"]
        for ek in keys:
            agg = summarize(analyze(rows, ek))
            m = gt_margins(paths, ek)
            if m:
                vals = list(m.values())
                gt_cols = (f" {sum(v < 0 for v in vals)}/{len(vals)} | "
                           f"{sum(vals) / len(vals):+.2f} |")
            else:
                gt_cols = " — | — |"
            lines.append(
                f"| {ek} | {agg['rho_dockq']:+.3f} | "
                f"{agg['frac_rho_dockq_neg']:.0%} | {agg['top1']:.3f} | "
                f"{agg['random']:.3f} | {agg['best']:.3f} |" + gt_cols)
        text = "\n".join(lines) + "\n"
    else:
        per = analyze(rows, args.energy_key)
        agg = summarize(per)
        text = render(per, agg, args.title)
    print(text)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
