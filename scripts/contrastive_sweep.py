"""Contrastive-loss knob sweep targeting the held-out ranking failure
(VERDICT r3 #3: min-energy picks underperform random on held-out targets).

Trains SHORT-recipe variants (default 800 epochs, otherwise the v2 recipe)
on fold0's 20-complex train split, then scores fold0's 4 held-out complexes
with scripts/ranking_experiments.py (Spearman of energy vs DockQ over 40
poses, multi-draw averaged energies, several t values) and aggregates one
comparison table.  The `base` variant is the control: the reference
construction (softplus(E_gt - E_noised) at the shared score-matching t,
reference score_model_mlsb.py:177-185) at the same short recipe, so every
comparison is apples-to-apples.

Re-entrant: trained variants (ckpt `last`) and finished CSVs are skipped.
ONE TPU process at a time (NOTES.md).

    python scripts/contrastive_sweep.py [--epochs 800] [--variants base,w5]
"""
from __future__ import annotations

import argparse
import csv
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SWEEP_DIR = os.path.join(REPO, "ckpts/contrastive_sweep")

# name -> extra cli/train flags
VARIANTS = {
    "base": [],
    "w5": ["--contrastive-weight", "5.0"],
    "m2": ["--contrastive-margin", "2.0"],
    "tc02": ["--contrastive-t-max", "0.2"],
    "tc02k4": ["--contrastive-t-max", "0.2", "--contrastive-negatives", "4"],
    # generalization lever: the held-out energy surface overfits the 20
    # training interfaces (NOTES r4 gt-margin probe) — adamw weight decay
    "wd1e3": ["--weight-decay", "1e-3"],
    "tc02k4wd": ["--contrastive-t-max", "0.2", "--contrastive-negatives",
                 "4", "--weight-decay", "1e-3"],
    # over-buried negatives: the exact decoy family the round-4 gt-margin
    # probe showed the held-out energy mis-ranking below the native
    "cl2": ["--contrastive-clash-negatives", "2"],
    "tc02k4cl2": ["--contrastive-t-max", "0.2", "--contrastive-negatives",
                  "4", "--contrastive-clash-negatives", "2"],
}


def fold_holdout(i=0):
    from dfmdock_tpu.data.dataset import NPZDataset

    ids = sorted(NPZDataset(os.path.join(REPO, "data/db5_npz")).ids)
    k = len(ids) // 6
    return ids[i * k : (i + 1) * k]


def run(cmd, log_path):
    print(f"+ {' '.join(cmd)}  (log: {log_path})", flush=True)
    with open(log_path, "a") as f:
        f.write(f"\n==== {time.ctime()}: {' '.join(cmd)}\n")
        f.flush()
        return subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT).returncode


def train_variant(name, flags, holdout, epochs):
    vdir = os.path.join(SWEEP_DIR, name)
    os.makedirs(vdir, exist_ok=True)
    if os.path.isdir(os.path.join(vdir, "last")):
        print(f"{name}: trained", flush=True)
        return 0
    cmd = [
        sys.executable, "-m", "dfmdock_tpu.cli.train",
        "--epochs", str(epochs), "--crop-size", "448",
        "--grad-energy", "--use-contrastive-loss",
        "--exclude-ids", ",".join(holdout),
        "--seed", "21",
        "--ckpt-dir", vdir,
        "--pool-refresh", "200", "--epochs-per-call", "10",
        "--log-every", "2000",
        "--metrics-json", os.path.join(vdir, "train_log.jsonl"),
    ] + flags
    return run(cmd, os.path.join(vdir, "train.out"))


def eval_variant(name, holdout, fold=0):
    vdir = os.path.join(SWEEP_DIR, name)
    out_csv = os.path.join(vdir, "ranking_exp.csv")
    if os.path.exists(out_csv):
        with open(out_csv) as f:
            got = {r["id"] for r in csv.DictReader(f)}
        if got >= set(holdout):
            print(f"{name}: evaluated", flush=True)
            return 0
    cmd = [
        sys.executable, "scripts/ranking_experiments.py",
        "--fold", str(fold), "--ckpt", os.path.join(vdir, "last"),
        "--ids", ",".join(holdout),
        "--t-list", "1e-5,0.1,0.2", "--k", "4",
        "--out-csv", out_csv, "--resume",
    ]
    return run(cmd, os.path.join(vdir, "eval.out"))


def aggregate(names, fold=0):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from ranking_analysis import analyze, load_rows, summarize

    lines = [f"# Contrastive sweep (fold{fold} holdout, short recipe)", "",
             "| variant | energy key | mean rho(E,DockQ) | top1 | random | best |",
             "|---|---|---|---|---|---|"]
    for name in names:
        p = os.path.join(SWEEP_DIR, name, "ranking_exp.csv")
        if not os.path.exists(p):
            continue
        rows = load_rows([p])
        some = next(iter(rows.values()))[0]
        keys = ["energy"] + sorted(
            k for k in some if k.startswith("energy_t") and k.endswith("_mean"))
        for ek in keys:
            per = analyze(rows, ek)
            agg = summarize(per)
            lines.append(
                f"| {name} | {ek} | {agg['rho_dockq']:+.3f} | "
                f"{agg['top1']:.3f} | {agg['random']:.3f} | {agg['best']:.3f} |")
    out = "\n".join(lines) + "\n"
    with open(os.path.join(SWEEP_DIR, "README.md"), "w") as f:
        f.write(out)
    print(out)


def main():
    global SWEEP_DIR
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=800)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--fold", type=int, default=0,
                    help="holdout fold (confirmation runs use fold 1)")
    ap.add_argument("--sweep-dir", default=SWEEP_DIR)
    args = ap.parse_args()
    SWEEP_DIR = args.sweep_dir
    names = [v for v in args.variants.split(",") if v]
    holdout = fold_holdout(args.fold)
    os.makedirs(SWEEP_DIR, exist_ok=True)
    for name in names:
        rc = train_variant(name, VARIANTS[name], holdout, args.epochs)
        if rc:
            print(f"{name}: train FAILED rc={rc}", flush=True)
            continue
        eval_variant(name, holdout, args.fold)
        aggregate(names, args.fold)


if __name__ == "__main__":
    main()
