"""Predicted-TM score from distogram-style logits + TM training loss.

Mirrors reference src/utils/loss.py:19-63 (compute_tm / get_tm_loss — present
in the reference inventory though unused by its shipped models).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _bin_centers(boundaries):
    step = boundaries[1] - boundaries[0]
    return jnp.concatenate([boundaries, boundaries[-1:] + step]) + step / 2


def compute_tm(logits: jnp.ndarray, max_bin: int = 31, no_bins: int = 64):
    """[R, L, no_bins] logits -> predicted TM scalar (loss.py:19-41)."""
    boundaries = jnp.linspace(0, max_bin, no_bins - 1)
    centers = _bin_centers(boundaries)
    n = max(logits.shape[0] + logits.shape[1], 19)
    d0 = 1.24 * (n - 15) ** (1.0 / 3) - 1.8
    probs = jax.nn.softmax(logits, -1)
    tm_per_bin = 1.0 / (1.0 + centers**2 / d0**2)
    pred = (probs * tm_per_bin).sum(-1)
    return jnp.maximum(pred.mean(0).max(), pred.mean(1).max())


def tm_loss(logits: jnp.ndarray, sq_diff: jnp.ndarray, max_bin: int = 31, no_bins: int = 64):
    """Cross-entropy against squared-error bins (loss.py:43-63)."""
    sq_diff = jax.lax.stop_gradient(sq_diff)
    boundaries = jnp.linspace(0, max_bin, no_bins - 1) ** 2
    true_bins = (sq_diff[..., None] > boundaries).sum(-1)
    logp = jax.nn.log_softmax(logits, -1)
    errors = -jnp.take_along_axis(logp, true_bins[..., None], -1).squeeze(-1)
    return errors.mean()


def distogram_loss(
    logits, dists, min_bin=3.25, max_bin=50.75, no_bins=64, pair_mask=None
):
    """64-bin distogram CE (loss.py:65-92), with optional padding mask."""
    boundaries = jnp.linspace(min_bin, max_bin, no_bins - 1) ** 2
    true_bins = (dists[..., None] ** 2 > boundaries).sum(-1)
    logp = jax.nn.log_softmax(logits, -1)
    errors = -jnp.take_along_axis(logp, true_bins[..., None], -1).squeeze(-1)
    if pair_mask is None:
        return errors.mean()
    return (errors * pair_mask).sum() / jnp.maximum(pair_mask.sum(), 1.0)
