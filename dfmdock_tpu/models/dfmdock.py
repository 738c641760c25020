"""DFMDock model wrapper: centering + EGNNNet (reference DFMDock.py:68-75).

The DFMDock-lineage net expects ligand-centered coordinates (the Lightning
wrapper's move_to_lig_center, DFMDock.py:254-257, all-backbone-atom mean).
This wrapper applies that centering so the EMSampler / CLIs can drive the
DFMDock lineage interchangeably with the mlsb ScoreNet.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dfmdock_tpu.config import ModelConfig
from dfmdock_tpu.models.egnn_net import EGNNNet


class DFMDockModel:
    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self.net = EGNNNet(cfg)

    def init(self, key):
        return self.net.init(key)

    def embed_nodes(self, params, x):
        return self.net.embed_nodes(params, x)

    def apply(self, params, batch, key, **kwargs):
        valid = batch["node_mask"].astype(jnp.float32)
        lig_valid = batch["lig_mask"] * valid
        pos = batch["pos"]
        n = jnp.maximum(lig_valid.sum(), 1.0)
        center = (pos * lig_valid[:, None, None]).sum((0, 1)) / (3.0 * n)
        b = dict(batch)
        b["pos"] = pos - jax.lax.stop_gradient(center)
        return self.net.apply(params, b, key, **kwargs)
