"""Fit a linear pose re-ranker on the ranking-experiment features (round 4).

The reference ranks by the terminal energy alone (inference.py:533-535); on
held-out DB5 targets that pick underperforms random (ckpts/db5_cv/README.md).
ranking_experiments.py records a feature VECTOR per pose — energies at
several t values (K-draw means), interface self-consistency (icons),
predicted score magnitude (snorm), clash count — and this script asks
whether any linear combination ranks better than the energy itself.

Protocol (leave-fold-out, honest): for each fold f with a ranking_exp.csv,
fit ridge regression on the poses of every OTHER fold's CSV and evaluate
ranking on fold f.  Features and the DockQ target are z-scored WITHIN each
complex (ranking is a within-complex problem; absolute scales differ by
target size).  GT rows (index == 'gt') are excluded from both fit and eval —
the deployment scenario never has the native.

    python scripts/fit_reranker.py [ckpts/db5_cv/fold*/ranking_exp.csv]
        [--features energy,icons,snorm,clash] [--ridge 1.0] [--out README]

Pure numpy; runs anywhere (no TPU needed once the CSVs exist).
"""
from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def load(path):
    with open(path) as f:
        return [r for r in csv.DictReader(f)]


def feature_columns(rows, families):
    """All available mean-aggregated columns of the requested families."""
    keys = set()
    for r in rows:
        keys.update(k for k, v in r.items() if v not in ("", None))
    cols = []
    if "energy" in families:
        cols += sorted(k for k in keys
                       if k.startswith("energy_t") and k.endswith("_mean"))
    if "icons" in families:
        cols += sorted(k for k in keys
                       if k.startswith("icons_t") and k.endswith("_mean"))
    if "snorm" in families:
        cols += sorted(k for k in keys
                       if k.startswith("snorm_t") and k.endswith("_mean"))
    if "clash" in families and any("num_clashes" in r for r in rows):
        cols.append("num_clashes")
    return cols


def complex_matrix(rows, cols, label=""):
    """-> dict id -> (X [P, F] z-scored within complex, dockq [P]).

    Rows missing any feature cell (mixed-era resumed CSVs) are dropped and
    REPORTED — silent truncation would read as full coverage."""
    by_id = {}
    dropped = 0
    for r in rows:
        if r.get("index") == "gt":
            continue
        try:
            x = [float(r[c]) for c in cols]
            q = float(r["DockQ"])
        except (KeyError, TypeError, ValueError):
            dropped += 1
            continue
        by_id.setdefault(r["id"], []).append((x, q))
    out = {}
    for cid, xs in by_id.items():
        if len(xs) < 5:
            dropped += len(xs)
            continue
        X = np.array([x for x, _ in xs], np.float64)
        q = np.array([q for _, q in xs], np.float64)
        mu, sd = X.mean(0), X.std(0)
        X = (X - mu) / np.where(sd > 1e-12, sd, 1.0)
        qz = (q - q.mean()) / (q.std() if q.std() > 1e-12 else 1.0)
        out[cid] = (X, q, qz)
    if dropped:
        print(f"# WARNING {label}: dropped {dropped} rows lacking "
              f"feature cells (older-run CSV?); {len(out)} complexes kept",
              file=sys.stderr)
    return out


# tie-aware rank correlation — DockQ saturates at ~0 for most held-out
# poses, so ties are the COMMON case; the argsort-of-argsort shortcut would
# make rho depend on row order
from ranking_analysis import spearman  # noqa: E402


def fit_ridge(train, ridge):
    """Ridge on pooled z-scored rows: predict z(DockQ) from z(features)."""
    X = np.concatenate([X for X, _, _ in train.values()])
    y = np.concatenate([qz for _, _, qz in train.values()])
    f = X.shape[1]
    w = np.linalg.solve(X.T @ X + ridge * np.eye(f), X.T @ y)
    return w


def evaluate(test, w):
    rhos, top1, rand, best = [], [], [], []
    for cid, (X, q, _) in test.items():
        s = X @ w  # predicted z(DockQ): HIGHER = better
        rhos.append(spearman(s, q))
        top1.append(q[int(np.argmax(s))])
        rand.append(q.mean())
        best.append(q.max())
    return {
        "rho": float(np.nanmean(rhos)), "top1": float(np.mean(top1)),
        "random": float(np.mean(rand)), "best": float(np.mean(best)),
        "n_complexes": len(test),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="*",
                    default=sorted(glob.glob(
                        os.path.join(REPO, "ckpts/db5_cv/fold*/ranking_exp.csv"))))
    ap.add_argument("--features", default="energy,icons,snorm,clash")
    ap.add_argument("--ridge", type=float, default=1.0)
    ap.add_argument("--out", default=None,
                    help="write the markdown table here")
    ap.add_argument("--weights-out", default=None,
                    help="write the pooled-fit weight vector as JSON")
    args = ap.parse_args(argv)
    paths = args.csvs
    if len(paths) < 2:
        sys.exit(f"need >= 2 fold CSVs for leave-fold-out (got {paths})")
    families = args.features.split(",")

    all_rows = [load(p) for p in paths]
    cols = feature_columns(sum(all_rows, []), families)
    if not cols:
        sys.exit("no feature columns found — run ranking_experiments first")
    data = [complex_matrix(rows, cols, label=p)
            for rows, p in zip(all_rows, paths)]
    for p, d in zip(paths, data):
        if not d:
            print(f"# WARNING: {p} contributes no usable complexes",
                  file=sys.stderr)

    lines = ["# Learned linear re-ranker (leave-fold-out)", "",
             f"features ({len(cols)}): {', '.join(cols)}", "",
             "| held-out fold | rho(score,DockQ) | top1 | random | best | n |",
             "|---|---|---|---|---|---|"]
    aggs = []
    for i, p in enumerate(paths):
        train = {}
        for j, d in enumerate(data):
            if j != i:
                train.update(d)
        if not train or not data[i]:
            continue
        w = fit_ridge(train, args.ridge)
        agg = evaluate(data[i], w)
        aggs.append(agg)
        name = os.path.basename(os.path.dirname(p))
        lines.append(
            f"| {name} | {agg['rho']:+.3f} | {agg['top1']:.3f} | "
            f"{agg['random']:.3f} | {agg['best']:.3f} | {agg['n_complexes']} |")
    if aggs:
        lines.append(
            f"| **mean** | {np.mean([a['rho'] for a in aggs]):+.3f} | "
            f"{np.mean([a['top1'] for a in aggs]):.3f} | "
            f"{np.mean([a['random'] for a in aggs]):.3f} | "
            f"{np.mean([a['best'] for a in aggs]):.3f} | — |")
    text = "\n".join(lines) + "\n"
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    if args.weights_out:
        pooled = {}
        for d in data:
            pooled.update(d)
        w = fit_ridge(pooled, args.ridge)
        with open(args.weights_out, "w") as f:
            json.dump({"features": cols, "weights": list(map(float, w)),
                       "ridge": args.ridge, "note":
                       "score = z(features) @ weights; higher = better"}, f,
                      indent=1)
        print(f"pooled weights -> {args.weights_out}")


if __name__ == "__main__":
    main()
