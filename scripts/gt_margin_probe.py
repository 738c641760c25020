"""GT-vs-decoy energy margin diagnostic (round 4, VERDICT r3 #3).

For each complex: score the NATIVE pose's energy over K independent
edge-sampling draws with a trained checkpoint and compare against the
sampled-decoy energy distribution from an existing sweep CSV.  A healthy
ranking energy puts the native BELOW every decoy (that is what min-energy
ranking assumes — reference src/utils/metrics.py:56-71); round-4 baseline
measured the opposite on all four fold0 held-out targets:

    1AVX: E(GT) -14.9+-0.95 | decoys min -28.2 mean -14.6
    1H1V: E(GT)  +7.9+-0.86 | decoys min -24.0 mean  -4.2
    1HCF: E(GT)  +3.7+-1.02 | decoys min -17.4 mean  -7.0
    1IRA: E(GT) -11.4+-0.57 | decoys min -30.9 mean -16.4

i.e. the held-out energy surface rewards over-contacted decoys over the
native — consistent with the reference's gt-vs-diffusion-noised contrastive
pair teaching a contact-count shortcut rather than interface geometry.
(Edge-draw noise is secondary: within-pose std is 0.1-0.23x the
between-pose spread.)

    python scripts/gt_margin_probe.py --ckpt ckpts/db5_cv/fold0/last \
        --csv ckpts/db5_cv/fold0/holdout.csv [--ids ...] [--k 12] [--cpu]
"""
from __future__ import annotations

import argparse
import csv
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--csv", required=True,
                    help="sweep/holdout CSV with per-pose energies")
    ap.add_argument("--ids", default=None)
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--t", type=float, default=1e-3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dfmdock_tpu.cli.common import load_model
    from dfmdock_tpu.config import DFMDockConfig, ModelConfig
    from dfmdock_tpu.data.dataset import NPZDataset, complex_to_batch

    cfg = DFMDockConfig(
        model=ModelConfig() if args.cpu else ModelConfig.fast())
    net, params = load_model(args.ckpt, cfg)
    ds = NPZDataset(os.path.join(REPO, "data/db5_npz"))

    sampled = {}
    with open(args.csv) as f:
        for r in csv.DictReader(f):
            sampled.setdefault(r["id"], []).append(float(r["energy"]))
    ids = args.ids.split(",") if args.ids else sorted(sampled)

    score = jax.jit(lambda p, b, k: net.apply(p, b, k, predict=True)["energy"])
    n_below = 0
    for cid in ids:
        raw = ds.load_raw(ds.ids.index(cid))
        b = {k: jnp.asarray(v) for k, v in complex_to_batch(raw).items()}
        b["t"] = jnp.float32(args.t)
        es = np.array([float(score(params, b, jax.random.PRNGKey(100 + k)))
                       for k in range(args.k)])
        s = np.array(sampled[cid])
        below = es.mean() < s.min()
        n_below += below
        print(f"{cid}: E(GT) {es.mean():+.3f}+-{es.std():.3f} | decoys "
              f"min {s.min():+.3f} mean {s.mean():+.3f} max {s.max():+.3f} "
              f"| GT-below-all-decoys: {bool(below)}", flush=True)
    print(f"native ranked below every decoy on {n_below}/{len(ids)} targets")


if __name__ == "__main__":
    main()
