#!/bin/bash
# Round-5 queue, part 4 — fold-1 confirmation of the sweep's margin-flip
# result: short-recipe base (control) vs tc02k4wd on the fold-1 holdout,
# then the native-vs-decoy margin table.  Starts when part 3 exits.
cd /root/repo
Q=/tmp/r5queue2.log
say() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

if [ -n "$1" ]; then
  say "queue4: waiting for pid $1 (queue3) to exit"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
  say "queue4: pid $1 gone"
fi

say "queue4 step 1: fold-1 confirmation sweep (base, tc02k4wd)"
timeout 10800 python scripts/contrastive_sweep.py \
  --variants base,tc02k4wd --fold 1 \
  --sweep-dir ckpts/contrastive_sweep_f1 > /tmp/r5b_confirm_f1.log 2>&1
say "confirm_f1 exit=$?"

say "queue4 step 2: margin table for the fold-1 confirmation"
JAX_PLATFORMS=cpu timeout 600 python scripts/contrastive_margins.py \
  --sweep-dir ckpts/contrastive_sweep_f1 >> /tmp/r5b_confirm_f1.log 2>&1
say "confirm_f1 margins exit=$?"

say "queue4 done"
