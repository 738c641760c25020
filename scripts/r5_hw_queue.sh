#!/bin/bash
# Round-5 hardware queue: the round-4 queue (scripts/r4_hw_queue.sh) never
# executed — the TPU tunnel was down all round.  This is the same work,
# reordered to the round-4 VERDICT's priorities so that if wall-clock runs
# out, the highest-value artifacts land first:
#   1. hw_parity          — compiled kernel gate, now stamps SHA+timestamp
#   2. edge_table A/B     — fresh committed artifact for the won kernel
#   2b. select_topk A/B   — decides the select_kernel default (VERDICT #2)
#   3. bench.py           — recapture headline with edge_table ON
#   3b. train_bench B sweep — dedx-restructure validation (VERDICT #5)
#   4. ranking_experiments folds 0-3 + fit_reranker (VERDICT #1, eval-only)
#   5. contrastive_sweep  — the margin-flip variants (VERDICT #1, training)
#   6. cv_folds 4,5       — finish the 24/24 rotation (VERDICT #4)
#   7. ranking folds 4,5 + reranker(all)
# Each step logs to /tmp/r5_*.log; queue progress to /tmp/r5queue.log.
# ONE TPU process at a time (NOTES.md); everything below is sequential and
# every long step is re-entrant, so re-running this script resumes.
cd /root/repo
Q=/tmp/r5queue.log
say() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

say "queue start; probing for TPU"
for i in $(seq 1 100); do
  if timeout 420 python -c "import jax, numpy as np, jax.numpy as jnp; x=jnp.ones((128,128)); print(float(np.asarray(x@x).sum()))" >/tmp/r5_probe.log 2>&1; then
    say "TPU alive after $i probes"

    say "step 1: hw_parity"
    timeout 1800 python scripts/hw_parity.py > /tmp/r5_hwparity.log 2>&1
    say "hw_parity exit=$?"

    say "step 2: edge_table_bench P=40"
    timeout 2400 python scripts/edge_table_bench.py 40 > /tmp/r5_etb.log 2>&1
    say "edge_table_bench exit=$?"

    say "step 2b: select_topk_bench P=40"
    timeout 2400 python scripts/select_topk_bench.py 40 > /tmp/r5_stb.log 2>&1
    say "select_topk_bench exit=$?"

    say "step 2c: select_topk_bench P=40 --edge-table"
    timeout 2400 python scripts/select_topk_bench.py 40 --edge-table \
      > /tmp/r5_stb_et.log 2>&1
    say "select_topk_bench(et) exit=$?"

    say "step 3: bench.py (edge_table default ON)"
    timeout 3000 python bench.py > /tmp/r5_bench.json 2>/tmp/r5_bench.log
    say "bench exit=$?"

    say "step 3b: train_bench B sweep (dedx restructure validation)"
    timeout 3600 python scripts/train_bench.py --epochs 50 --batches 1,4,8 \
      --json-out /tmp/r5_train_bench.json > /tmp/r5_train_bench.log 2>&1
    say "train_bench exit=$?"

    for f in 0 1 2 3; do
      say "step 4: ranking_experiments fold $f"
      timeout 5400 python scripts/ranking_experiments.py --fold $f --resume \
        > /tmp/r5_rank$f.log 2>&1
      say "ranking fold $f exit=$?"
    done

    say "step 4a: fit_reranker on folds 0-3 (CPU, cheap)"
    timeout 600 python scripts/fit_reranker.py \
      --out ckpts/db5_cv/reranker.md > /tmp/r5_reranker.log 2>&1
    say "fit_reranker exit=$?"

    say "step 4b: contrastive_sweep (trimmed: the margin-flip variants)"
    timeout 18000 python scripts/contrastive_sweep.py \
      --variants base,tc02,tc02k4,cl2,tc02k4cl2,tc02k4wd \
      > /tmp/r5_contrastive.log 2>&1
    say "contrastive_sweep exit=$?"

    say "step 5: cv_folds 4,5"
    timeout 21600 python scripts/cv_folds.py --folds 4,5 > /tmp/r5_cv45.log 2>&1
    say "cv_folds exit=$?"

    for f in 4 5; do
      say "step 6: ranking_experiments fold $f"
      timeout 5400 python scripts/ranking_experiments.py --fold $f --resume \
        > /tmp/r5_rank$f.log 2>&1
      say "ranking fold $f exit=$?"
    done

    say "step 6b: fit_reranker on all folds"
    timeout 600 python scripts/fit_reranker.py \
      --out ckpts/db5_cv/reranker.md \
      --weights-out ckpts/db5_cv/reranker_weights.json \
      > /tmp/r5_reranker_all.log 2>&1
    say "fit_reranker(all) exit=$?"

    say "queue done"
    exit 0
  fi
  say "probe $i failed; sleeping 120s"
  sleep 120
done
say "TPU never came back"
exit 1
