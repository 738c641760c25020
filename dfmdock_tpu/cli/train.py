"""Training CLI — the src/run.py + train.py equivalent (argparse, no Hydra).

Trains either lineage on an NPZ dataset.  Default is the device-resident
POOL path (train/pool.py): featurize once, upload once, run whole epochs as
one jitted lax.scan with on-device rotation augmentation — measured 8.7 ms /
step vs ~1.1 s/step for the streaming host loop on this machine's TPU tunnel.
`--no-pool` falls back to per-step host featurization + H2D (for corpora too
large for HBM).

Example:
  python -m dfmdock_tpu.cli.train --data-dir data/db5_npz --lineage mlsb \\
      --epochs 2 --crop-size 448 --ckpt-dir ckpts/run0

Scaling: `--batch-size B` vmaps B complexes per optimizer step (grad-mean);
`--dp` shards that batch over every visible device (SURVEY §5 data
parallelism; the reference is strictly single-device batch_size=1).
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from dfmdock_tpu.config import DFMDockConfig, ExperimentConfig, ModelConfig
from dfmdock_tpu.data.batching import round_up
from dfmdock_tpu.data.dataset import NPZDataset
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.models.egnn_net import EGNNNet
from dfmdock_tpu.train import Trainer, make_optimizer
from dfmdock_tpu.train.dfmdock_losses import dfmdock_loss_fn
from dfmdock_tpu.train.losses import loss_fn as mlsb_loss_fn
from dfmdock_tpu.train.pool import build_pool, make_epoch_runner, make_training_batch

# re-exported for callers/scripts that import it from here
__all__ = ["make_training_batch", "dispatch_chunk", "main"]


def dispatch_chunk(epoch: int, epochs: int, per_call: int,
                   pool_refresh: int, save_every: int) -> int:
    """Epochs to run in the next jitted dispatch: per_call, clipped to the
    end of training and to the next pool-refresh / checkpoint boundary.

    Every distinct value compiles a separate executable (and pays the axon
    tunnel's multi-minute first-execution stall), so callers should pick
    epochs / pool_refresh / save_every as multiples of per_call — then this
    returns the same value every time (asserted in tests/test_train_pool.py).
    """
    chunk = min(epochs - epoch, per_call)
    if pool_refresh:
        chunk = min(chunk, pool_refresh - epoch % pool_refresh)
    if save_every:
        chunk = min(chunk, save_every - epoch % save_every)
    return chunk


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default="data/db5_npz")
    ap.add_argument("--lineage", choices=["mlsb", "dfmdock"], default="mlsb")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--crop-size", type=int, default=448)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--grad-energy", action="store_true")
    ap.add_argument("--use-contrastive-loss", action="store_true",
                    help="contrastive gt-vs-noised energy term (score_model_mlsb.py:177)")
    ap.add_argument("--use-confidence-loss", action="store_true",
                    help="confidence-head BCE vs l_RMSD<5 label (DFMDock lineage)")
    ap.add_argument("--use-dist-loss", action="store_true",
                    help="distogram CE head (DFMDock lineage)")
    ap.add_argument("--no-interface-loss", action="store_true",
                    help="disable the interface BCE term")
    ap.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="training compute dtype (f32 accumulation either way)")
    ap.add_argument("--exclude-ids", default=None,
                    help="comma-separated complex ids to HOLD OUT from training")
    ap.add_argument("--batch-size", type=int, default=1,
                    help="complexes per optimizer step (grad-mean; pool path "
                         "only; pool rows = complexes*variants must divide)")
    ap.add_argument("--dp", action="store_true",
                    help="shard each step's batch over all devices "
                         "(data-parallel; XLA inserts the grad psum over ICI; "
                         "identical math to single-device — pool path only)")
    ap.add_argument("--no-pool", action="store_true",
                    help="stream batches from the host per step instead of the "
                         "device-resident pool (for corpora larger than HBM)")
    ap.add_argument("--pool-variants", type=int, default=2,
                    help="augmented crop variants per complex in the pool")
    ap.add_argument("--pool-refresh", type=int, default=25,
                    help="rebuild the pool (resample crops/swaps) every N epochs")
    ap.add_argument("--epochs-per-call", type=int, default=10,
                    help="epochs per jitted dispatch (pool path); bounded by "
                         "--pool-refresh/--save-every boundaries. Keep "
                         "dispatches under ~30 s of device time: the axon "
                         "TPU tunnel kills (and can crash) the worker on "
                         "long silent dispatches (NOTES.md round 3), and "
                         "every DISTINCT chunk size is a separate "
                         "executable (compile + first-run stall) — pick "
                         "epochs/--pool-refresh/--save-every as multiples "
                         "of this so the chunk stays constant")
    ap.add_argument("--resume", default=None, help="orbax checkpoint dir to resume from")
    ap.add_argument("--save-offset", type=int, default=0,
                    help="added to epoch numbers in checkpoint dir names "
                         "(pass the already-trained epoch count when "
                         "resuming, so dir numbering stays absolute)")
    ap.add_argument("--save-every", type=int, default=0,
                    help="checkpoint every N epochs (0 = only 'last' at the end)")
    ap.add_argument("--weight-decay", type=float, default=0.0,
                    help="adamw weight decay (reference trains with 0; the "
                         "held-out energy surface overfits — see NOTES r4)")
    ap.add_argument("--contrastive-weight", type=float, default=1.0)
    ap.add_argument("--contrastive-margin", type=float, default=0.0)
    ap.add_argument("--contrastive-t-max", type=float, default=0.0,
                    help="> 0: build contrastive negatives at a separate "
                         "t_c ~ U(eps, t_max) (hard near-native negatives)")
    ap.add_argument("--contrastive-negatives", type=int, default=1,
                    help="> 1: K negatives, InfoNCE instead of softplus")
    ap.add_argument("--contrastive-clash-negatives", type=int, default=0,
                    help="additional over-buried negatives: native ligand "
                         "translated toward the receptor centroid by "
                         "U(1,5) A (targets the inverted held-out margin)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--metrics-json", default=None, help="append per-log-step JSONL here")
    args = ap.parse_args(argv)

    cfg = DFMDockConfig(
        model=ModelConfig(compute_dtype=args.compute_dtype),
        experiment=ExperimentConfig(
            lr=args.lr,
            weight_decay=args.weight_decay,
            grad_energy=args.grad_energy,
            use_contrastive_loss=args.use_contrastive_loss,
            contrastive_weight=args.contrastive_weight,
            contrastive_margin=args.contrastive_margin,
            contrastive_t_max=args.contrastive_t_max,
            contrastive_negatives=args.contrastive_negatives,
            contrastive_clash_negatives=args.contrastive_clash_negatives,
            use_confidence_loss=args.use_confidence_loss,
            use_dist_loss=args.use_dist_loss,
            use_interface_loss=not args.no_interface_loss,
        ),
    )
    net = ScoreNet(cfg.model) if args.lineage == "mlsb" else EGNNNet(cfg.model)
    loss = mlsb_loss_fn if args.lineage == "mlsb" else dfmdock_loss_fn

    params = net.init(jax.random.PRNGKey(args.seed))
    if args.resume:
        params = Trainer.load(args.resume, params)
        print(f"resumed params from {args.resume}")
    r3 = R3Diffuser(cfg.diffuser.r3)
    so3 = SO3Diffuser(cfg.diffuser.so3)

    if args.ckpt_dir:
        from dfmdock_tpu.config import to_yaml
        import os as _os

        _os.makedirs(args.ckpt_dir, exist_ok=True)
        to_yaml(cfg, f"{args.ckpt_dir}/config.yaml")

    ds = NPZDataset(args.data_dir)
    train_idxs = np.arange(len(ds))
    if args.exclude_ids:
        excl = {s.strip() for s in args.exclude_ids.split(",") if s.strip()}
        missing = sorted(excl - set(ds.ids))
        assert not missing, f"--exclude-ids not in dataset: {missing}"
        train_idxs = np.array([i for i in train_idxs if ds.ids[i] not in excl])
        print(f"training on {len(train_idxs)} complexes (held out: {sorted(excl)})")
    rng = np.random.RandomState(args.seed)
    pad_to = round_up(args.crop_size)

    import jax.numpy as jnp
    import optax

    opt = make_optimizer(params, cfg.experiment)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(args.seed + 1)
    it = 0
    log_f = open(args.metrics_json, "a") if args.metrics_json else None

    trainer = Trainer(net, r3, so3, cfg.experiment)

    def maybe_save(params, epoch):
        if args.ckpt_dir and args.save_every and (epoch + 1) % args.save_every == 0:
            # --save-offset keeps epoch-dir numbering ABSOLUTE across
            # --resume runs (without it, a resumed run restarts at epoch0
            # and its checkpoints shadow the first run's dirs, corrupting
            # re-entrant drivers' progress accounting under a second
            # interruption — scripts/cv_folds.py)
            trainer.save(params, f"{args.ckpt_dir}/epoch{epoch + args.save_offset}")

    def log_rows(rows):
        """Emit periodic metric lines.  The pool path materializes each
        epoch's metrics in one np.asarray sync (per EPOCH, not per step)
        before calling this; the no-pool path passes device scalars, which
        only block when a log line actually fires."""
        nonlocal it
        for m in rows:
            it += 1
            if it % args.log_every == 0:
                m = {
                    k: (v if isinstance(v, (int, str)) else round(float(v), 5))
                    for k, v in m.items()
                }
                m.update(step=it, t=round(time.time(), 1))
                print(m)
                if log_f:
                    log_f.write(json.dumps(m) + "\n")
                    log_f.flush()

    if not args.no_pool:
        mesh = None
        if args.dp:
            from dfmdock_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
            ndev = len(mesh.devices.flat)
            # batch_size == 1 runs the unsharded single-complex path where
            # dp would be silently inert (ADVICE r3) — reject it outright
            assert args.batch_size > 1 and args.batch_size % ndev == 0, (
                f"--dp requires --batch-size to be a multiple of the {ndev} "
                f"devices (>1); got {args.batch_size}, whose path is "
                f"single-device — drop --dp or raise --batch-size"
            )
            print(f"dp over {len(mesh.devices.flat)} devices, "
                  f"batch_size={args.batch_size}")
        run_epoch = make_epoch_runner(net, r3, so3, cfg.experiment, opt, loss,
                                      batch_size=args.batch_size, mesh=mesh)
        pool = None
        epoch = 0
        while epoch < args.epochs:
            if pool is None or (args.pool_refresh and epoch % args.pool_refresh == 0
                                and epoch > 0):
                pool_np = build_pool(
                    ds, train_idxs, args.crop_size, pad_to, rng,
                    variants=args.pool_variants,
                )
                pool = {k: jnp.asarray(v) for k, v in pool_np.items()}
            # run a CHUNK of epochs in one dispatch (per-dispatch host
            # round-trips through the tunnel dominate at 1 epoch/call):
            # bounded by the next pool refresh / checkpoint boundary
            chunk = dispatch_chunk(epoch, args.epochs, args.epochs_per_call,
                                   args.pool_refresh, args.save_every)
            key, sub = jax.random.split(key)
            if chunk == 1:
                params, opt_state, metrics = run_epoch(params, opt_state, pool, sub)
                ms = {k: np.asarray(v)[None] for k, v in metrics.items()}
            else:
                params, opt_state, metrics = run_epoch.multi(
                    params, opt_state, pool, sub, chunk
                )
                ms = {k: np.asarray(v) for k, v in metrics.items()}
            n_rows = ms[next(iter(ms))].shape[1]
            log_rows(
                [{**{k: float(ms[k][e, i]) for k in ms}, "epoch": epoch + e}
                 for e in range(chunk) for i in range(n_rows)]
            )
            epoch += chunk
            maybe_save(params, epoch - 1)
    else:
        @jax.jit
        def step(params, opt_state, batch, key):
            (l, metrics), grads = jax.value_and_grad(
                lambda p: loss(p, net, r3, so3, batch, key, cfg.experiment),
                has_aux=True,
            )(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, metrics

        for epoch in range(args.epochs):
            order = rng.permutation(train_idxs)
            for i in order:
                raw = ds.load_raw(int(i))
                batch_np = make_training_batch(raw, args.crop_size, pad_to, rng)
                batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
                key, sub = jax.random.split(key)
                params, opt_state, metrics = step(params, opt_state, batch, sub)
                log_rows([{**metrics, "epoch": epoch}])
            maybe_save(params, epoch)

    if args.ckpt_dir:
        trainer.save(params, f"{args.ckpt_dir}/last")
    print(f"trained {it} steps")


if __name__ == "__main__":
    main()
