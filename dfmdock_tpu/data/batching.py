"""Padded/bucketed batch construction.

Replaces the reference's dynamic per-complex tensor shapes (batch_size=1,
ragged N) with static padded shapes + masks so every complex of a bucket
compiles once on TPU.  Receptor rows come first, then ligand rows, then
padding — matching the reference's concat order (score_net_mlsb.py:359,365).
"""
from __future__ import annotations

import numpy as np

from dfmdock_tpu.models.score_net import ENERGY_ROW_CHUNK


def round_up(n: int, multiple: int = ENERGY_ROW_CHUNK) -> int:
    """Round n up to a multiple (bucketing: larger multiples trade padding
    waste for fewer XLA compilations across a dataset sweep)."""
    return ((n + multiple - 1) // multiple) * multiple


def pad_complex(
    rec_x: np.ndarray,
    lig_x: np.ndarray,
    rec_pos: np.ndarray,
    lig_pos: np.ndarray,
    pad_to: int | None = None,
    res_id: np.ndarray | None = None,
    asym_id: np.ndarray | None = None,
):
    """Build the static-shape batch dict (numpy; convert to jnp at the edge).

    Args:
      rec_x: [R, F]; lig_x: [L, F]; rec_pos: [R, 3, 3]; lig_pos: [L, 3, 3].
      pad_to: total padded N (default: R+L rounded up to the energy chunk).

    Returns a dict matching the ScoreNet batch contract (without 't').
    """
    R, L = rec_x.shape[0], lig_x.shape[0]
    n = R + L
    n_pad = round_up(n) if pad_to is None else pad_to
    if n_pad < n:
        raise ValueError(f"pad_to={n_pad} < complex size {n}")
    f = rec_x.shape[1]

    x = np.zeros((n_pad, f), np.float32)
    x[:R] = rec_x
    x[R : R + L] = lig_x

    pos = np.zeros((n_pad, 3, 3), np.float32)
    pos[:R] = rec_pos
    pos[R : R + L] = lig_pos

    node_mask = np.zeros(n_pad, bool)
    node_mask[:n] = True

    lig_mask = np.zeros(n_pad, np.float32)
    lig_mask[R : R + L] = 1.0

    # res_id runs over the concatenated complex (inference convention,
    # inference_base.py:235) unless original (cropped) ids are supplied;
    # asym_id 0=receptor 1=ligand
    rid = np.arange(n_pad, dtype=np.int32)
    if res_id is not None:
        rid[:n] = res_id
    aid = np.zeros(n_pad, np.int32)
    aid[R:] = 1
    if asym_id is not None:
        aid[:n] = asym_id

    return {
        "x": x,
        "pos": pos,
        "node_mask": node_mask,
        "lig_mask": lig_mask,
        "res_id": rid,
        "asym_id": aid,
        "n_rec": np.int32(R),
        "n_lig": np.int32(L),
    }
