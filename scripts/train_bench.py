"""Batched-training throughput: B complexes per optimizer step (VERDICT r2 #4).

For B in {1, 4, 8}: build the 48-row DB5 pool once, jit the pool epoch
runner at batch_size=B, and measure
  - marginal wall steps/s and samples/s (complexes/s) over WARM 10-epoch
    dispatches (first dispatch discarded: compile + the axon tunnel's
    first-execution stall), and
  - loss-vs-epochs: mean per-epoch loss after EPOCHS epochs from the same
    init/seed, showing grad-mean batching reaches comparable loss.

Recipe matches the quality runs (grad-energy + contrastive, crop 448).
Timing protocol per NOTES.md: params/opt_state stay device-resident; one
scalar sync per dispatch.

Run on the TPU: python scripts/train_bench.py [--epochs 100] [--batches 1,4,8]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dfmdock_tpu.cli.common import build_diffusers  # also sets the jit cache dir
from dfmdock_tpu.config import DFMDockConfig, ExperimentConfig, ModelConfig
from dfmdock_tpu.data.batching import round_up
from dfmdock_tpu.data.dataset import NPZDataset
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.train import make_optimizer
from dfmdock_tpu.train.losses import loss_fn
from dfmdock_tpu.train.pool import build_pool, make_epoch_runner

CHUNK = 10  # epochs per dispatch (tunnel-safe; NOTES.md round 3)


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--epochs", type=int, default=100,
                    help="epochs for the loss-vs-epochs comparison (multiple of 10)")
    ap.add_argument("--batches", default="1,4,8")
    ap.add_argument("--crop-size", type=int, default=448)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--plain", action="store_true",
                    help="plain loss (no grad-energy/contrastive): compares "
                         "wall steps/s against the 8.7 ms device step "
                         "(VERDICT r2 Weak #4 wall-vs-device gap)")
    args = ap.parse_args()
    assert args.epochs % CHUNK == 0

    cfg = DFMDockConfig(
        model=ModelConfig(),
        experiment=ExperimentConfig(grad_energy=not args.plain,
                                    use_contrastive_loss=not args.plain),
    )
    net = ScoreNet(cfg.model)
    r3, so3 = build_diffusers(cfg)
    ds = NPZDataset("data/db5_npz")
    rng = np.random.RandomState(0)
    pad_to = round_up(args.crop_size)
    pool_np = build_pool(ds, np.arange(len(ds)), args.crop_size, pad_to, rng)
    pool = {k: jnp.asarray(v) for k, v in pool_np.items()}
    rows = int(pool["x"].shape[0])
    params0 = net.init(jax.random.PRNGKey(0))
    opt = make_optimizer(params0, cfg.experiment)

    results = {}
    for b in [int(x) for x in args.batches.split(",")]:
        assert rows % b == 0, f"{rows} pool rows not divisible by B={b}"
        run = make_epoch_runner(net, r3, so3, cfg.experiment, opt, loss_fn,
                                batch_size=b)
        steps_per_epoch = rows // b

        # fresh device copies: run.multi donates params/opt_state, and
        # jnp.asarray on a jax Array is a no-op — reusing params0's buffers
        # across B values would hand the runner already-donated arrays
        params = jax.tree.map(lambda v: jnp.array(v, copy=True), params0)
        opt_state = opt.init(params)
        key = jax.random.PRNGKey(42)
        per_epoch_loss = []
        times = []
        for d in range(args.epochs // CHUNK):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            params, opt_state, ms = run.multi(params, opt_state, pool, sub, CHUNK)
            loss_chunk = np.asarray(ms["loss"])  # [CHUNK, steps] — syncs
            dt = time.perf_counter() - t0
            per_epoch_loss += [float(x) for x in loss_chunk.mean(1)]
            if d > 0:  # first dispatch = compile + first-exec stall
                times.append(dt)
        dt = float(np.median(times))
        steps_s = CHUNK * steps_per_epoch / dt
        results[b] = {
            "steps_per_epoch": steps_per_epoch,
            "sec_per_10epoch_dispatch": round(dt, 2),
            "wall_steps_per_sec": round(steps_s, 1),
            "wall_samples_per_sec": round(steps_s * b, 1),
            "final_loss_mean_last10": round(float(np.mean(per_epoch_loss[-10:])), 4),
            "loss_curve_every10": [round(float(x), 3) for x in per_epoch_loss[::10]],
        }
        print(f"B={b}: {json.dumps(results[b])}", flush=True)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
