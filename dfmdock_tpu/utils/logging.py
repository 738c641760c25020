"""Observability: logging, param counts, config dumps, profiling, wandb.

TPU-native replacement for the reference's Lightning/Hydra infra
(src/utils/utils.py): python logger, parameter-count summary (utils.py:113-
149), config tree dump (utils.py:71-110), optional wandb (configs/logger/
wandb.yaml), plus jax.profiler tracing around hot sections (the reference has
no profiler at all — SURVEY §5).
"""
from __future__ import annotations

import contextlib
import dataclasses
import json
import logging
import os
import time

import jax
import numpy as np

log = logging.getLogger("dfmdock_tpu")
if not log.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[%(asctime)s %(levelname)s] %(message)s"))
    log.addHandler(_h)
    log.setLevel(logging.INFO)


def param_counts(params) -> dict:
    """Total/trainable parameter counts (utils.py:140-148 parity; the frozen
    Fourier buffer is the only non-trainable leaf)."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    total = 0
    frozen = 0
    for path, leaf in leaves:
        n = int(np.prod(leaf.shape)) if hasattr(leaf, "shape") else 0
        total += n
        if "t_embed" in jax.tree_util.keystr(path) and "'W'" in jax.tree_util.keystr(path):
            frozen += n
    return {"total": total, "trainable": total - frozen, "non_trainable": frozen}


def config_tree(cfg, indent: int = 0) -> str:
    """Readable dataclass-tree dump (replaces the rich config printer)."""
    lines = []
    pad = "  " * indent
    if dataclasses.is_dataclass(cfg):
        for f in dataclasses.fields(cfg):
            v = getattr(cfg, f.name)
            if dataclasses.is_dataclass(v):
                lines.append(f"{pad}{f.name}:")
                lines.append(config_tree(v, indent + 1))
            else:
                lines.append(f"{pad}{f.name}: {v}")
    else:
        lines.append(f"{pad}{cfg}")
    return "\n".join(lines)


def config_to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace around a hot section (view with xprof/tensorboard).
    No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steps/sec (+ optional JSONL sink) for jitted loops."""

    def __init__(self, jsonl_path: str | None = None):
        self._t0 = time.perf_counter()
        self._steps = 0
        self._f = open(jsonl_path, "a") if jsonl_path else None

    def step(self, metrics: dict | None = None):
        self._steps += 1
        if self._f is not None:
            rec = {"step": self._steps, "t": time.time()}
            if metrics:
                rec.update({k: float(v) for k, v in metrics.items()})
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()

    @property
    def steps_per_sec(self) -> float:
        return self._steps / max(time.perf_counter() - self._t0, 1e-9)


class WandbLogger:
    """Optional weights-and-biases sink (no-op if wandb is unavailable or
    WANDB_MODE=disabled — mirrors the reference's guarded usage, run.py:6)."""

    def __init__(self, project: str = "dfmdock_tpu", config: dict | None = None):
        self._run = None
        try:
            import wandb  # noqa: F401

            if os.environ.get("WANDB_MODE") != "disabled":
                self._run = wandb.init(project=project, config=config or {})
        except Exception:
            self._run = None

    def log(self, metrics: dict, step: int | None = None):
        if self._run is not None:
            self._run.log(metrics, step=step)

    def finish(self):
        if self._run is not None:
            self._run.finish()
