#!/bin/bash
# Round-5 queue, part 5 — deployment validation of --rank-by reranker:
# dock fold-5's four held-out complexes with the fold-5 checkpoint through
# the REAL CLI, ranking with leave-fold-5-out weights (no leakage), and
# tabulate reranker-pick vs min-energy-pick vs random/best DockQ.
cd /root/repo
Q=/tmp/r5queue2.log
say() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

if [ -n "$1" ]; then
  say "queue5: waiting for pid $1 to exit"
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  say "queue5: pid $1 gone"
fi

OUT=ckpts/db5_cv/fold5/deploy_rr
mkdir -p "$OUT"
say "queue5 step 1: dock fold-5 holdout with --rank-by reranker (CLI path)"
for id in 5HGG 5JMO 6B0S 7CEI; do
  if [ -s "$OUT/${id}.csv" ]; then say "queue5: $id done, skip"; continue; fi
  timeout 2400 python -m dfmdock_tpu.cli.dock \
    --npz data/db5_npz/${id}.npz --ckpt ckpts/db5_cv/fold5/last \
    --num-samples 40 --num-steps 40 --seed 7 \
    --rank-by reranker \
    --reranker-weights ckpts/db5_cv/reranker_weights_f5out.json \
    --out-dir "$OUT" --out-csv ${id}.csv >> /tmp/r5b_deploy_rr.log 2>&1
  say "queue5: dock $id exit=$?"
done

say "queue5 step 2: summary table"
python - >> /tmp/r5b_deploy_rr.log 2>&1 <<'PY'
import csv, glob, os
import numpy as np
out = "ckpts/db5_cv/fold5/deploy_rr"
lines = ["# --rank-by reranker deployment validation (fold-5 holdout, CLI path)",
         "",
         "Fresh 40-pose CLI runs (seed 7) on the fold-5 checkpoint; ranking",
         "weights fit on folds 0-4 only (`reranker_weights_f5out.json`) so the",
         "held-out targets are unseen by both the model and the re-ranker.",
         "",
         "| complex | reranker pick | min-energy pick | random (mean) | best-of-40 |",
         "|---|---|---|---|---|"]
agg = {"rr": [], "en": [], "rand": [], "best": []}
for p in sorted(glob.glob(os.path.join(out, "*.csv"))):
    rows = list(csv.DictReader(open(p)))
    if not rows or "rerank_score" not in rows[0]:
        continue
    q = np.array([float(r["DockQ"]) for r in rows])
    s = np.array([float(r["rerank_score"]) for r in rows])
    e = np.array([float(r["energy"]) for r in rows])
    cid = os.path.splitext(os.path.basename(p))[0]
    vals = (q[int(np.argmax(s))], q[int(np.argmin(e))], q.mean(), q.max())
    for k, v in zip(("rr", "en", "rand", "best"), vals):
        agg[k].append(v)
    lines.append(f"| {cid} | {vals[0]:.3f} | {vals[1]:.3f} | "
                 f"{vals[2]:.3f} | {vals[3]:.3f} |")
if agg["rr"]:
    lines.append(f"| **mean** | {np.mean(agg['rr']):.3f} | "
                 f"{np.mean(agg['en']):.3f} | {np.mean(agg['rand']):.3f} | "
                 f"{np.mean(agg['best']):.3f} |")
with open(os.path.join(out, "README.md"), "w") as f:
    f.write("\n".join(lines) + "\n")
print("wrote", os.path.join(out, "README.md"))
PY
say "queue5 done"
