#!/bin/bash
# Round-5 queue, part 2 (after the kernel A/Bs + bench recapture settled the
# defaults — NOTES.md round 5).  Remaining VERDICT r4 items, in value order:
#   0. wait for any live TPU process (train_bench) to exit
#   1. hw_parity rerun — must PASS now that 640 is out of the approx set;
#      regenerates scripts/hw_parity_out.json with SHA+timestamp
#   2. ranking_experiments folds 0-3 + fit_reranker   (VERDICT #1)
#   3. contrastive_sweep (margin-flip variants)       (VERDICT #1)
#   4. cv_folds 4,5                                   (VERDICT #4)
#   5. ranking folds 4,5 + reranker(all)              (VERDICT #1)
# Logs: /tmp/r5b_*.log; progress: /tmp/r5queue2.log.  ONE TPU process at a
# time; every step is re-entrant.
cd /root/repo
Q=/tmp/r5queue2.log
say() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

say "queue2 start"
if [ -n "$1" ]; then
  say "waiting for pid $1 to exit"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
  say "pid $1 gone"
fi

say "step 1: hw_parity (post-640-revert; must pass)"
timeout 1800 python scripts/hw_parity.py > /tmp/r5b_hwparity.log 2>&1
say "hw_parity exit=$?"

for f in 0 1 2 3; do
  say "step 2: ranking_experiments fold $f"
  timeout 5400 python scripts/ranking_experiments.py --fold $f --resume \
    > /tmp/r5b_rank$f.log 2>&1
  say "ranking fold $f exit=$?"
done

say "step 2a: fit_reranker on folds 0-3"
timeout 600 python scripts/fit_reranker.py \
  --out ckpts/db5_cv/reranker.md > /tmp/r5b_reranker.log 2>&1
say "fit_reranker exit=$?"

say "step 3: contrastive_sweep (trimmed: the margin-flip variants)"
timeout 18000 python scripts/contrastive_sweep.py \
  --variants base,tc02,tc02k4,cl2,tc02k4cl2,tc02k4wd \
  > /tmp/r5b_contrastive.log 2>&1
say "contrastive_sweep exit=$?"

say "step 4: cv_folds 4,5"
timeout 21600 python scripts/cv_folds.py --folds 4,5 > /tmp/r5b_cv45.log 2>&1
say "cv_folds exit=$?"

for f in 4 5; do
  say "step 5: ranking_experiments fold $f"
  timeout 5400 python scripts/ranking_experiments.py --fold $f --resume \
    > /tmp/r5b_rank$f.log 2>&1
  say "ranking fold $f exit=$?"
done

say "step 5a: fit_reranker on all folds"
timeout 600 python scripts/fit_reranker.py \
  --out ckpts/db5_cv/reranker.md \
  --weights-out ckpts/db5_cv/reranker_weights.json \
  > /tmp/r5b_reranker_all.log 2>&1
say "fit_reranker(all) exit=$?"

say "queue2 done"
