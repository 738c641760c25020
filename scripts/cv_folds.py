"""6-fold cross-validated DB5 quality table (VERDICT r3 item #3).

Rotates the held-out split over ALL 24 bundled complexes: 6 folds x 4
held-out complexes, each fold trained with the db5_holdout_v2 recipe
(mlsb lineage, 2000 epochs, grad-energy + contrastive, crop 448 —
ckpts/db5_holdout_v2/README.md) on the other 20, then evaluated on its 4
held-out targets with the reference protocol (40 samples, 40-step EM,
min-energy ranking — /root/reference/src/utils/metrics.py:56-71,
inference.py:533).

Re-entrant: finished folds (ckpt `last` present / holdout.csv complete) are
skipped, interrupted training resumes from the newest epoch checkpoint, and
the sweep itself resumes per-complex (--resume).  Run it in the background;
it serializes everything into ONE TPU process at a time.

    python scripts/cv_folds.py [--folds 0,1,2] [--epochs 2000]

Output: ckpts/db5_cv/fold{i}/ (ckpts + holdout.csv) and an aggregated
per-complex table in ckpts/db5_cv/README.md + cv_table.csv.
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
CV_DIR = os.path.join(REPO, "ckpts/db5_cv")


def fold_splits():
    from dfmdock_tpu.data.dataset import NPZDataset

    ids = sorted(NPZDataset(os.path.join(REPO, "data/db5_npz")).ids)
    assert len(ids) % 6 == 0, f"expected 24 ids, got {len(ids)}"
    k = len(ids) // 6
    return [ids[i * k : (i + 1) * k] for i in range(6)]


def run(cmd, log_path):
    print(f"+ {' '.join(cmd)}  (log: {log_path})", flush=True)
    with open(log_path, "a") as f:
        f.write(f"\n==== {time.ctime()}: {' '.join(cmd)}\n")
        f.flush()
        return subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT).returncode


def train_fold(i, holdout, epochs):
    fold_dir = os.path.join(CV_DIR, f"fold{i}")
    os.makedirs(fold_dir, exist_ok=True)
    if os.path.isdir(os.path.join(fold_dir, "last")):
        print(f"fold{i}: trained (last exists)", flush=True)
        return 0
    cmd = [
        sys.executable, "-m", "dfmdock_tpu.cli.train",
        "--epochs", str(epochs), "--crop-size", "448",
        "--grad-energy", "--use-contrastive-loss",
        "--exclude-ids", ",".join(holdout),
        "--seed", str(21 + i),
        "--ckpt-dir", fold_dir,
        "--pool-refresh", "200", "--epochs-per-call", "10",
        "--save-every", "500", "--log-every", "2000",
        "--metrics-json", os.path.join(fold_dir, "train_log.jsonl"),
    ]
    # resume from the newest epoch checkpoint after an interruption
    saved = sorted(
        (int(m.group(1)), d)
        for d in glob.glob(os.path.join(fold_dir, "epoch*"))
        if (m := re.fullmatch(r".*epoch(\d+)", d))
    )
    if saved:
        done_epoch, ckpt = saved[-1]
        remaining = epochs - (done_epoch + 1)
        if remaining <= 0:
            # promote WITHOUT extra training (ADVICE r3: the old path
            # trained 1 more epoch past the stated recipe): the epoch
            # checkpoint already holds the final params — copy it.
            print(f"fold{i}: epoch ckpt >= target; promoting {ckpt} to last",
                  flush=True)
            import shutil

            shutil.copytree(ckpt, os.path.join(fold_dir, "last"))
            with open(os.path.join(fold_dir, "EPOCHS.txt"), "w") as f:
                f.write(f"trained_epochs={done_epoch + 1}\n"
                        f"promoted_from=epoch{done_epoch}\n")
            return 0
        else:
            print(f"fold{i}: resuming from {ckpt} ({remaining} epochs left)",
                  flush=True)
            # --save-offset keeps checkpoint numbering absolute across
            # resumes (a resumed run otherwise restarts at epoch0 and
            # shadows the first run's dirs)
            cmd += ["--resume", ckpt, "--save-offset", str(done_epoch + 1)]
            cmd[cmd.index("--epochs") + 1] = str(remaining)
    return run(cmd, os.path.join(fold_dir, "train.out"))


def eval_fold(i, holdout):
    fold_dir = os.path.join(CV_DIR, f"fold{i}")
    out_csv = os.path.join(fold_dir, "holdout.csv")
    if os.path.exists(out_csv):
        with open(out_csv) as f:
            got = {r["id"] for r in csv.DictReader(f)}
        if got >= set(holdout):
            print(f"fold{i}: evaluated", flush=True)
            return 0
    cmd = [
        sys.executable, "-m", "dfmdock_tpu.cli.sweep",
        "--ckpt", os.path.join(fold_dir, "last"),
        "--ids", ",".join(holdout),
        "--num-samples", "40", "--seed", "5",
        "--out-csv", out_csv, "--resume",
    ]
    return run(cmd, os.path.join(fold_dir, "eval.out"))


def aggregate():
    import numpy as np

    splits = fold_splits()
    rows = []
    for i, holdout in enumerate(splits):
        path = os.path.join(CV_DIR, f"fold{i}", "holdout.csv")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            by_id = {}
            for r in csv.DictReader(f):
                by_id.setdefault(r["id"], []).append(
                    (float(r["DockQ"]), float(r["energy"]))
                )
        for cid in holdout:
            if cid not in by_id:
                continue
            dq = np.array([d for d, _ in by_id[cid]])
            en = np.array([e for _, e in by_id[cid]])
            rows.append({
                "id": cid, "fold": i, "n_samples": len(dq),
                "mean_dockq": round(float(dq.mean()), 3),
                "best_of_n": round(float(dq.max()), 3),
                "min_energy_pick": round(float(dq[en.argmin()]), 3),
            })
    if not rows:
        print("no results yet")
        return
    with open(os.path.join(CV_DIR, "cv_table.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)

    import numpy as np

    def col(name):
        return np.array([r[name] for r in rows])

    folds_done = sorted({r["fold"] for r in rows})
    lines = [
        "# db5_cv — 6-fold cross-validated held-out quality (round 3)",
        "",
        f"Folds completed so far: {folds_done} "
        f"({len(rows)}/24 complexes; the driver is re-entrant — rerun "
        "scripts/cv_folds.py to continue the rotation).",
        "",
        "Every bundled DB5 complex held out exactly once (6 folds x 4), each",
        "fold trained with the db5_holdout_v2 recipe (mlsb, 2000 epochs,",
        "grad-energy + contrastive, crop 448) on the other 20 and evaluated",
        "with the reference protocol: 40 samples, 40-step EM SDE, min-energy",
        "ranking (utils/metrics.py:56-71; 40 samples = inference.py:533).",
        "Produced by scripts/cv_folds.py (re-entrant).",
        "",
        "| complex | fold | mean DockQ | best-of-40 | min-energy pick |",
        "|---|---|---|---|---|",
    ]
    for r in sorted(rows, key=lambda r: r["id"]):
        lines.append(
            f"| {r['id']} | {r['fold']} | {r['mean_dockq']:.3f} | "
            f"{r['best_of_n']:.3f} | {r['min_energy_pick']:.3f} |"
        )
    acc = [
        ("mean", np.mean), ("median", np.median),
    ]
    for name, fn in acc:
        lines.append(
            f"| **{name} ({len(rows)} complexes)** | | "
            f"{fn(col('mean_dockq')):.3f} | {fn(col('best_of_n')):.3f} | "
            f"{fn(col('min_energy_pick')):.3f} |"
        )
    hits = {
        "acceptable (DockQ>=0.23)": (col("min_energy_pick") >= 0.23).sum(),
        "best-of-40 acceptable": (col("best_of_n") >= 0.23).sum(),
        "best-of-40 medium (>=0.49)": (col("best_of_n") >= 0.49).sum(),
    }
    lines += ["", "Success counts (of %d):" % len(rows), ""]
    lines += [f"- {k}: **{v}**" for k, v in hits.items()]
    lines.append("")
    with open(os.path.join(CV_DIR, "README.md"), "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--folds", default=None,
                    help="comma-separated fold indices (default: all 6)")
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--aggregate-only", action="store_true")
    args = ap.parse_args()

    splits = fold_splits()
    todo = (
        [int(x) for x in args.folds.split(",")] if args.folds
        else list(range(6))
    )
    if not args.aggregate_only:
        for i in todo:
            rc = train_fold(i, splits[i], args.epochs)
            if rc:
                print(f"fold{i}: train FAILED rc={rc}", flush=True)
                continue
            rc = eval_fold(i, splits[i])
            if rc:
                print(f"fold{i}: eval FAILED rc={rc}", flush=True)
            aggregate()
    aggregate()


if __name__ == "__main__":
    main()
