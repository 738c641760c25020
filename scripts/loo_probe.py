"""Leave-one-out data-volume probe (VERDICT r3 #3): what does training on
23 complexes (vs the CV folds' 20) buy on a held-out target?

For each requested complex: train the v2 recipe with ONLY that complex
excluded, then run the reference eval protocol (40 samples, 40-step EM) and
the ranking probe on it.  Compares against the same complex's row in the
6-fold CV table (trained on 20).  Re-entrant like cv_folds.

    python scripts/loo_probe.py --ids 2SNI,1MLC,2A1A [--epochs 2000]
"""
from __future__ import annotations

import argparse
import csv
import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
LOO_DIR = os.path.join(REPO, "ckpts/db5_loo")


def run(cmd, log_path):
    print(f"+ {' '.join(cmd)}  (log: {log_path})", flush=True)
    with open(log_path, "a") as f:
        f.write(f"\n==== {time.ctime()}: {' '.join(cmd)}\n")
        f.flush()
        return subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT).returncode


def probe(cid, epochs):
    d = os.path.join(LOO_DIR, cid)
    os.makedirs(d, exist_ok=True)
    last = os.path.join(d, "last")
    if not os.path.isdir(last):
        cmd = [
            sys.executable, "-m", "dfmdock_tpu.cli.train",
            "--epochs", str(epochs), "--crop-size", "448",
            "--grad-energy", "--use-contrastive-loss",
            "--exclude-ids", cid,
            "--seed", "31",
            "--ckpt-dir", d,
            "--pool-refresh", "200", "--epochs-per-call", "10",
            "--save-every", "500", "--log-every", "2000",
            "--metrics-json", os.path.join(d, "train_log.jsonl"),
        ]
        saved = sorted(
            (int(m.group(1)), p)
            for p in glob.glob(os.path.join(d, "epoch*"))
            if (m := re.fullmatch(r".*epoch(\d+)", p))
        )
        if saved:
            done_epoch, ckpt = saved[-1]
            remaining = epochs - (done_epoch + 1)
            if remaining <= 0:
                import shutil

                shutil.copytree(ckpt, last)
            else:
                cmd += ["--resume", ckpt, "--save-offset", str(done_epoch + 1)]
                cmd[cmd.index("--epochs") + 1] = str(remaining)
        if not os.path.isdir(last):
            rc = run(cmd, os.path.join(d, "train.out"))
            if rc:
                return rc
    out_csv = os.path.join(d, "holdout.csv")
    if not os.path.exists(out_csv):
        rc = run([
            sys.executable, "-m", "dfmdock_tpu.cli.sweep",
            "--ckpt", last, "--ids", cid,
            "--num-samples", "40", "--seed", "5",
            "--out-csv", out_csv, "--resume",
        ], os.path.join(d, "eval.out"))
        if rc:
            return rc
    return 0


def aggregate(ids):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from ranking_analysis import analyze, load_rows

    cv = {}
    cv_csv = os.path.join(REPO, "ckpts/db5_cv/cv_table.csv")
    if os.path.exists(cv_csv):
        with open(cv_csv) as f:
            cv = {r["id"]: r for r in csv.DictReader(f)}
    lines = ["# Leave-one-out (23-complex train) vs 6-fold CV (20-complex)",
             "",
             "| id | LOO top1 | LOO random | LOO best | LOO rho(E,DockQ) |"
             " CV top1 | CV best |",
             "|---|---|---|---|---|---|---|"]
    for cid in ids:
        p = os.path.join(LOO_DIR, cid, "holdout.csv")
        if not os.path.exists(p):
            continue
        per = analyze(load_rows([p]))
        v = per[cid]
        c = cv.get(cid, {})
        lines.append(
            f"| {cid} | {v['top1']:.3f} | {v['random']:.3f} | "
            f"{v['best']:.3f} | {v['rho_dockq']:+.3f} | "
            f"{c.get('min_energy_pick', '—')} | {c.get('best_of_n', '—')} |")
    out = "\n".join(lines) + "\n"
    with open(os.path.join(LOO_DIR, "README.md"), "w") as f:
        f.write(out)
    print(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ids", default="2SNI,1MLC,2A1A")
    ap.add_argument("--epochs", type=int, default=2000)
    args = ap.parse_args()
    ids = [s for s in args.ids.split(",") if s]
    os.makedirs(LOO_DIR, exist_ok=True)
    for cid in ids:
        probe(cid, args.epochs)
        aggregate(ids)


if __name__ == "__main__":
    main()
