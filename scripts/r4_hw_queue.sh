#!/bin/bash
# Round-4 hardware queue: wait for the axon TPU tunnel, then run the round's
# TPU work in sequence (ONE process at a time, NOTES.md):
#   1. scripts/hw_parity.py          — compiled kernel gate (+ topk@640 +
#                                      select_topk bit-parity checks)
#   2. scripts/edge_table_bench.py   — the parked A/B (VERDICT r3 missing #5)
#   2b/2c. scripts/select_topk_bench.py — fused-selection A/B (VERDICT r3 #4)
#   3. bench.py                      — recapture the headline warm
#   4. ranking_experiments folds 0-3 — eval-only H1/H2 ranking probes
#   5. cv_folds --folds 4,5          — finish the 24/24 rotation (the long pole)
#   6. ranking_experiments folds 4,5
# Each step logs to /tmp/r4_*.log; queue progress to /tmp/r4queue.log.
cd /root/repo
Q=/tmp/r4queue.log
say() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

say "queue start; probing for TPU"
for i in $(seq 1 200); do
  if timeout 420 python -c "import jax, numpy as np, jax.numpy as jnp; x=jnp.ones((128,128)); print(float(np.asarray(x@x).sum()))" >/tmp/r4_probe.log 2>&1; then
    say "TPU alive after $i probes"

    say "step 1: hw_parity"
    timeout 1800 python scripts/hw_parity.py > /tmp/r4_hwparity.log 2>&1
    say "hw_parity exit=$?"

    say "step 2: edge_table_bench P=40"
    timeout 2400 python scripts/edge_table_bench.py 40 > /tmp/r4_etb.log 2>&1
    say "edge_table_bench exit=$?"

    say "step 2b: select_topk_bench P=40"
    timeout 2400 python scripts/select_topk_bench.py 40 > /tmp/r4_stb.log 2>&1
    say "select_topk_bench exit=$?"

    say "step 2c: select_topk_bench P=40 --edge-table"
    timeout 2400 python scripts/select_topk_bench.py 40 --edge-table \
      > /tmp/r4_stb_et.log 2>&1
    say "select_topk_bench(et) exit=$?"

    say "step 3: bench.py"
    timeout 3000 python bench.py > /tmp/r4_bench.json 2>/tmp/r4_bench.log
    say "bench exit=$?"

    say "step 3b: train_bench B sweep (dedx restructure validation)"
    timeout 3600 python scripts/train_bench.py --epochs 50 --batches 1,4,8 \
      --json-out /tmp/r4_train_bench.json > /tmp/r4_train_bench.log 2>&1
    say "train_bench exit=$?"

    for f in 0 1 2 3; do
      say "step 4: ranking_experiments fold $f"
      timeout 5400 python scripts/ranking_experiments.py --fold $f --resume \
        > /tmp/r4_rank$f.log 2>&1
      say "ranking fold $f exit=$?"
    done

    say "step 4a: fit_reranker on folds 0-3 (CPU, cheap)"
    timeout 600 python scripts/fit_reranker.py \
      --out ckpts/db5_cv/reranker.md > /tmp/r4_reranker.log 2>&1
    say "fit_reranker exit=$?"

    say "step 4b: contrastive_sweep (trimmed: the margin-flip variants)"
    timeout 14400 python scripts/contrastive_sweep.py \
      --variants base,tc02,tc02k4,cl2,tc02k4cl2,tc02k4wd \
      > /tmp/r4_contrastive.log 2>&1
    say "contrastive_sweep exit=$?"

    say "step 5: cv_folds 4,5"
    timeout 28800 python scripts/cv_folds.py --folds 4,5 > /tmp/r4_cv45.log 2>&1
    say "cv_folds exit=$?"

    for f in 4 5; do
      say "step 6: ranking_experiments fold $f"
      timeout 5400 python scripts/ranking_experiments.py --fold $f --resume \
        > /tmp/r4_rank$f.log 2>&1
      say "ranking fold $f exit=$?"
    done

    say "step 6b: fit_reranker on all folds"
    timeout 600 python scripts/fit_reranker.py \
      --out ckpts/db5_cv/reranker.md \
      --weights-out ckpts/db5_cv/reranker_weights.json \
      > /tmp/r4_reranker_all.log 2>&1
    say "fit_reranker(all) exit=$?"

    say "step 7: loo_probe (leave-one-out data-volume probe)"
    timeout 14400 python scripts/loo_probe.py > /tmp/r4_loo.log 2>&1
    say "loo_probe exit=$?"

    say "queue done"
    exit 0
  fi
  say "probe $i failed; sleeping 120s"
  sleep 120
done
say "TPU never came back"
exit 1
