#!/bin/bash
# Wait for the axon TPU tunnel to come back, then (1) A/B the edge-table
# kernel (short), (2) run CV folds 4 and 5.  One TPU process at a time.
# Probes with a tiny matmul (devices() alone can hang); retries ~4h max.
cd /root/repo
for i in $(seq 1 48); do
  if timeout 240 python -c "import jax, numpy as np, jax.numpy as jnp; x=jnp.ones((128,128)); print(float(np.asarray(x@x).sum()))" >/tmp/tpu_probe.log 2>&1; then
    echo "$(date): TPU alive after $i probes" >> /tmp/cv45.log
    echo "$(date): running edge_table_bench" >> /tmp/cv45.log
    timeout 1800 python scripts/edge_table_bench.py 40 > /tmp/etb.log 2>&1
    echo "$(date): edge_table_bench exit=$? (log /tmp/etb.log)" >> /tmp/cv45.log
    exec python scripts/cv_folds.py --folds 4,5 >> /tmp/cv45.log 2>&1
  fi
  echo "$(date): probe $i failed, sleeping 240s" >> /tmp/cv45.log
  sleep 240
done
echo "$(date): TPU never came back after 48 probes" >> /tmp/cv45.log
