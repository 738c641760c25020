"""Permutation significance for the leave-fold-out re-ranker result.

`ckpts/db5_cv/reranker.md` reports the learned linear re-ranker positive on
6/6 held-out folds (mean Spearman rho +0.157) with a thin top-1 margin
(0.036 vs random 0.032) on only 24 complexes — small enough that the claim
needs a null distribution, not just a point estimate.

Protocol: reproduce the exact leave-fold-out evaluation (fit on the other
folds' ranking_exp.csv rows, score the held-out fold's poses), then permute
DockQ *within each complex* B times and recompute (a) the 24-complex mean
tie-aware Spearman rho and (b) the mean top-1 DockQ of the argmax pick.
Within-complex permutation is the correct null here: it preserves each
complex's DockQ distribution (including the heavy ties at ~0) and the
re-ranker's score vector, breaking only the score-quality association.
One-sided p-values (direction was pre-specified: higher score = better).

Pure numpy on the committed CSVs; no TPU needed.

    python scripts/reranker_significance.py [--reps 20000] [--seed 0]
        [--out ckpts/db5_cv/reranker.md]   # appends a section

Reference context: ranking is the reference's pose-selection capability
(inference_base.py:653-657); this quantifies how confidently our learned
substitute beats chance where the raw energy key does not.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from fit_reranker import complex_matrix, feature_columns, fit_ridge, load  # noqa: E402


def _ranks(x: np.ndarray) -> np.ndarray:
    """Average ranks (tie-aware), matching scipy.stats.rankdata."""
    order = np.argsort(x, kind="stable")
    ranks = np.empty(len(x), np.float64)
    sx = x[order]
    i = 0
    while i < len(x):
        j = i
        while j + 1 < len(x) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    return ranks


def _z(x: np.ndarray) -> np.ndarray:
    sd = x.std()
    return (x - x.mean()) / (sd if sd > 1e-12 else 1.0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="*",
                    default=sorted(glob.glob(
                        os.path.join(REPO, "ckpts/db5_cv/fold*/ranking_exp.csv"))))
    ap.add_argument("--features", default="energy,icons,snorm,clash")
    ap.add_argument("--ridge", type=float, default=1.0)
    ap.add_argument("--reps", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="append the markdown section to this file")
    args = ap.parse_args(argv)

    all_rows = [load(p) for p in args.csvs]
    cols = feature_columns(sum(all_rows, []), args.features.split(","))
    data = [complex_matrix(rows, cols, label=p)
            for rows, p in zip(all_rows, args.csvs)]

    # leave-fold-out scores for every complex (the deployed evaluation)
    per_complex = []  # (complex id, score ranks z, dockq, dockq ranks)
    for i in range(len(data)):
        train = {}
        for j, d in enumerate(data):
            if j != i:
                train.update(d)
        if not train or not data[i]:
            continue
        w = fit_ridge(train, args.ridge)
        for cid, (X, q, _) in data[i].items():
            s = X @ w
            per_complex.append((cid, _z(_ranks(s)), q, _ranks(q)))

    n = len(per_complex)
    obs_rho = float(np.mean(
        [float(np.mean(zs * _z(rq))) for _, zs, _, rq in per_complex]))
    obs_top1 = float(np.mean(
        [q[int(np.argmax(zs))] for _, zs, q, _ in per_complex]))

    rng = np.random.default_rng(args.seed)
    B = args.reps
    null_rho = np.zeros(B)
    null_top1 = np.zeros(B)
    for _, zs, q, rq in per_complex:
        zrq = _z(rq)
        P = len(q)
        # [B, P] independent within-complex permutations
        perm = np.argsort(rng.random((B, P)), axis=1)
        null_rho += (zs[None, :] * zrq[perm]).mean(axis=1)
        null_top1 += q[perm[:, int(np.argmax(zs))]]
    null_rho /= n
    null_top1 /= n

    p_rho = float((np.sum(null_rho >= obs_rho) + 1) / (B + 1))
    p_top1 = float((np.sum(null_top1 >= obs_top1) + 1) / (B + 1))

    lines = [
        "",
        "## Permutation significance (within-complex DockQ shuffles)",
        "",
        f"{args.reps} permutations over {n} held-out complexes "
        f"(scripts/reranker_significance.py, seed {args.seed}):",
        "",
        "| statistic | observed | null mean ± sd | one-sided p |",
        "|---|---|---|---|",
        f"| mean Spearman rho | {obs_rho:+.3f} | "
        f"{null_rho.mean():+.3f} ± {null_rho.std():.3f} | **{p_rho:.4g}** |",
        f"| mean top-1 DockQ | {obs_top1:.3f} | "
        f"{null_top1.mean():.3f} ± {null_top1.std():.3f} | {p_top1:.3g} |",
        "",
    ]
    text = "\n".join(lines)
    print(text)
    if args.out:
        with open(args.out, "a") as f:
            f.write(text)
        print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
