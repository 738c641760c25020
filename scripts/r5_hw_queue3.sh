#!/bin/bash
# Round-5 queue, part 3 — starts when part 2 (cv 4,5 + ranking 4,5 +
# reranker-all) exits.  VERDICT r4 #7: the xprof tranche with the settled
# kernel defaults (edge_table ON), plus the all-folds ranking key table.
# Logs: /tmp/r5b_profile.log, /tmp/r5b_keytable.log; progress /tmp/r5queue2.log.
cd /root/repo
Q=/tmp/r5queue2.log
say() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

if [ -n "$1" ]; then
  say "queue3: waiting for pid $1 (queue2) to exit"
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
  say "queue3: pid $1 gone"
fi

say "queue3 step 1: ranking_key_table folds 0-5"
JAX_PLATFORMS=cpu timeout 600 python scripts/ranking_key_table.py \
  --folds 0,1,2,3,4,5 > /tmp/r5b_keytable.log 2>&1
say "ranking_key_table exit=$?"

say "queue3 step 2: profile_sampler 40 (kernels-on xprof tranche)"
timeout 3600 python scripts/profile_sampler.py 40 > /tmp/r5b_profile.log 2>&1
say "profile_sampler exit=$?"

say "queue3 done"
