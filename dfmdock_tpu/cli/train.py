"""Training CLI — the src/run.py + train.py equivalent (argparse, no Hydra).

Trains either lineage on an NPZ dataset with host-side cropping/augmentation
and the jitted optax step; multi-device data parallelism via --dp.

Example:
  python -m dfmdock_tpu.cli.train --data-dir data/db5_npz --lineage mlsb \\
      --epochs 2 --crop-size 448 --ckpt-dir ckpts/run0
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from dfmdock_tpu.config import DFMDockConfig, ExperimentConfig, ModelConfig
from dfmdock_tpu.data.batching import pad_complex, round_up
from dfmdock_tpu.data.crop import crop_complex
from dfmdock_tpu.data.dataset import NPZDataset
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.features.residues import sequence_to_onehot
from dfmdock_tpu.geom import random_rotation_matrix
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.models.egnn_net import EGNNNet
from dfmdock_tpu.train import Trainer, make_optimizer
from dfmdock_tpu.train.dfmdock_losses import dfmdock_loss_fn
from dfmdock_tpu.train.losses import loss_fn as mlsb_loss_fn


def make_training_batch(raw, crop_size, pad_to, rng, use_esm=True, shuffle_chains=True):
    """Featurize + augment one complex: optional rec/lig swap, crop, random
    global rotation (ppi_mlsb_dataset.py:380-403 semantics), padded output."""
    rec_x = np.concatenate([raw["rec_x"], sequence_to_onehot(raw["rec_seq"])], -1)
    lig_x = np.concatenate([raw["lig_x"], sequence_to_onehot(raw["lig_seq"])], -1)
    rec_pos, lig_pos = raw["rec_pos"], raw["lig_pos"]
    if not use_esm:
        rec_x = sequence_to_onehot(raw["rec_seq"])
        lig_x = sequence_to_onehot(raw["lig_seq"])

    if shuffle_chains and rng.rand() < 0.5:
        rec_x, lig_x = lig_x, rec_x
        rec_pos, lig_pos = lig_pos, rec_pos

    rec_x, lig_x, rec_pos, lig_pos, res_id, asym_id = crop_complex(
        rec_x, lig_x, rec_pos, lig_pos, crop_size, rng
    )

    # random global rotation about the CA centroid (augmentation)
    import jax.numpy as jnp
    from dfmdock_tpu.geom import random_rotation_matrix as rrm

    R = np.asarray(rrm(jax.random.PRNGKey(rng.randint(2**31))))
    pos = np.concatenate([rec_pos, lig_pos])
    cen = pos[:, 1].mean(0)
    pos = (pos - cen) @ R.T
    rec_pos, lig_pos = pos[: rec_pos.shape[0]], pos[rec_pos.shape[0]:]

    return pad_complex(
        rec_x.astype(np.float32),
        lig_x.astype(np.float32),
        rec_pos.astype(np.float32),
        lig_pos.astype(np.float32),
        pad_to=pad_to,
        res_id=res_id,
        asym_id=asym_id,
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data-dir", default="data/db5_npz")
    ap.add_argument("--lineage", choices=["mlsb", "dfmdock"], default="mlsb")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--crop-size", type=int, default=448)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--grad-energy", action="store_true")
    ap.add_argument("--resume", default=None, help="orbax checkpoint dir to resume from")
    ap.add_argument("--save-every", type=int, default=0,
                    help="checkpoint every N epochs (0 = only 'last' at the end)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--metrics-json", default=None, help="append per-log-step JSONL here")
    args = ap.parse_args(argv)

    cfg = DFMDockConfig(
        experiment=ExperimentConfig(lr=args.lr, grad_energy=args.grad_energy)
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
    rng = np.random.RandomState(args.seed)
    pad_to = round_up(args.crop_size)

    import functools
    import optax
    import jax.numpy as jnp

    opt = make_optimizer(params, cfg.experiment)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch, key):
        (l, metrics), grads = jax.value_and_grad(
            lambda p: loss(p, net, r3, so3, batch, key, cfg.experiment),
            has_aux=True,
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, metrics

    key = jax.random.PRNGKey(args.seed + 1)
    it = 0
    log_f = open(args.metrics_json, "a") if args.metrics_json else None
    for epoch in range(args.epochs):
        order = rng.permutation(len(ds))
        for i in order:
            raw = ds.load_raw(int(i))
            batch_np = make_training_batch(raw, args.crop_size, pad_to, rng)
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            key, sub = jax.random.split(key)
            params, opt_state, metrics = step(params, opt_state, batch, sub)
            it += 1
            if it % args.log_every == 0:
                m = {k: round(float(v), 5) for k, v in metrics.items()}
                m.update(step=it, epoch=epoch, t=round(time.time(), 1))
                print(m)
                if log_f:
                    log_f.write(json.dumps(m) + "\n")
                    log_f.flush()
        if args.ckpt_dir and args.save_every and (epoch + 1) % args.save_every == 0:
            Trainer(net, r3, so3, cfg.experiment).save(
                params, f"{args.ckpt_dir}/epoch{epoch}"
            )
    if args.ckpt_dir:
        Trainer(net, r3, so3, cfg.experiment).save(params, f"{args.ckpt_dir}/last")
    print(f"trained {it} steps")


if __name__ == "__main__":
    main()
