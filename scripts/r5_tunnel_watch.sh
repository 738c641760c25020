#!/bin/bash
# Round-5: wait for the axon tunnel to come back, then re-run the fold-1
# confirmation queue (re-entrant: base variant is done, tc02k4wd restarts).
cd /root/repo
Q=/tmp/r5queue2.log
say() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }
say "tunnel-watch: probing every 120 s"
while true; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: a@a)(jnp.ones((256,256)))
assert float(np.asarray(y).sum()) == 256.0*256
" > /dev/null 2>&1; then
    say "tunnel-watch: tunnel is back"
    break
  fi
  sleep 120
done
bash scripts/r5_hw_queue4.sh
