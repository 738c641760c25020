"""Optax training loop with orbax checkpointing.

Replaces PyTorch Lightning + Hydra instantiate (reference run.py/train.py)
with a jitted train step (AdamW, lr 1e-4, wd 0 — score_model_mlsb.py:267-273)
and an explicit host loop.  The Gaussian-Fourier time-embedding buffer is
frozen via an optax mask (it is `requires_grad=False` in the reference,
score_net_mlsb.py:168).
"""
from __future__ import annotations

import functools
import os
import time
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import optax

from dfmdock_tpu.config import ExperimentConfig
from dfmdock_tpu.train.losses import loss_fn


def _trainable_mask(params):
    """'train' for trainable leaves; the fixed Fourier buffer t_embed.W is
    'frozen' (requires_grad=False in the reference)."""

    def walk(p, path):
        if isinstance(p, dict):
            return {k: walk(v, path + (k,)) for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return type(p)(walk(v, path + (str(i),)) for i, v in enumerate(p))
        return "frozen" if (len(path) >= 2 and path[-2:] == ("t_embed", "W")) else "train"

    return walk(params, ())


def make_optimizer(params, exp: ExperimentConfig):
    return optax.multi_transform(
        {
            "train": optax.adamw(learning_rate=exp.lr, weight_decay=exp.weight_decay),
            "frozen": optax.set_to_zero(),
        },
        _trainable_mask(params),
    )


def train_step(params, opt_state, batch, key, *, net, r3, so3, exp, opt):
    """One jittable training step (single complex or vmapped batch)."""

    def loss_of(p):
        return loss_fn(p, net, r3, so3, batch, key, exp)

    (loss, metrics), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, metrics


class Trainer:
    """Host-side loop: iterate complexes, step, log, checkpoint best/last
    (replaces Lightning Trainer + ModelCheckpoint, configs/callbacks)."""

    def __init__(self, net, r3, so3, exp: ExperimentConfig, ckpt_dir: str | None = None):
        self.net = net
        self.r3 = r3
        self.so3 = so3
        self.exp = exp
        self.ckpt_dir = ckpt_dir

    def fit(
        self,
        params,
        train_batches: Iterable[dict],
        key: jax.Array,
        num_epochs: int = 1,
        val_batches: Iterable[dict] | None = None,
        log_every: int = 50,
        log_fn: Callable[[dict], None] | None = None,
    ):
        opt = make_optimizer(params, self.exp)
        opt_state = opt.init(params)
        step_fn = jax.jit(
            functools.partial(
                train_step, net=self.net, r3=self.r3, so3=self.so3, exp=self.exp, opt=opt
            )
        )

        best_val = float("inf")
        step = 0
        for epoch in range(num_epochs):
            for batch in train_batches:
                key, sub = jax.random.split(key)
                params, opt_state, metrics = step_fn(params, opt_state, batch, sub)
                step += 1
                if log_every and step % log_every == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    m.update(step=step, epoch=epoch, time=time.time())
                    if log_fn:
                        log_fn(m)
                    else:
                        print({k: round(v, 5) if isinstance(v, float) else v for k, v in m.items()})
            if val_batches is not None:
                val = self.evaluate(params, val_batches, key)
                if self.ckpt_dir and val["loss"] < best_val:
                    best_val = val["loss"]
                    self.save(params, os.path.join(self.ckpt_dir, "best"))
            if self.ckpt_dir:
                self.save(params, os.path.join(self.ckpt_dir, "last"))
        return params, opt_state

    def evaluate(self, params, batches, key):
        eval_fn = jax.jit(
            lambda p, b, k: loss_fn(p, self.net, self.r3, self.so3, b, k, self.exp)[1]
        )
        totals: dict[str, float] = {}
        n = 0
        for batch in batches:
            key, sub = jax.random.split(key)
            m = eval_fn(params, batch, sub)
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in totals.items()}

    def save(self, params, path: str):
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, params, force=True)
        ckptr.wait_until_finished()

    @staticmethod
    def load(path: str, like_params):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), like_params)
