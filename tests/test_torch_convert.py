"""The readiness-kit checkpoint path on SYNTHETIC Lightning checkpoints.

The real reference weights are absent from the mount
(/root/reference/.MISSING_LARGE_BLOBS), so scripts/validate_external.py has
never run against them.  This pins the part that can be proven today: a
Lightning .ckpt laid out exactly like the reference saves it
(state_dict under the 'net.' LightningModule prefix + save_hyperparameters()
payload — score_model_mlsb.py:30,59 / DFMDock.py:66) loads through
utils/torch_convert.load_lightning_checkpoint into the same pytree the
in-memory converters produce, for BOTH lineages, honoring the checkpoint's
own model.depth.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_reference_parity import FEAT, _install_graphnorm_stub

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference mount absent")

from dfmdock_tpu.utils.torch_convert import (
    convert_egnn_net,
    convert_score_net,
    load_lightning_checkpoint,
)


def _save_lightning_ckpt(tmp_path, lineage, seed):
    _install_graphnorm_stub()
    import torch

    torch.manual_seed(seed)
    kw = dict(
        lm_embed_dim=FEAT, positional_embed_dim=66, spatial_embed_dim=100,
        node_dim=24, edge_dim=16, inner_dim=16, depth=3,
        dropout=0.0, cut_off=20.0, normalize=True,
    )
    if lineage == "mlsb":
        from models.score_net_mlsb import ModelConfig as RefConfig, Score_Net

        net = Score_Net(RefConfig(contact_embed_dim=1, **kw))
    else:
        from models.egnn_net import EGNN_Net, ModelConfig as RefConfig

        net = EGNN_Net(RefConfig(agg="mean", **kw))
    ckpt = {
        # LightningModule state_dict: module attr is `self.net`
        "state_dict": {f"net.{k}": v for k, v in net.state_dict().items()},
        "hyper_parameters": {"model": {"depth": 3, "node_dim": 24}},
        "epoch": 7,
    }
    path = str(tmp_path / f"{lineage}_synth.ckpt")
    torch.save(ckpt, path)
    return path, {k: v.numpy() for k, v in net.state_dict().items()}


@pytest.mark.parametrize("lineage", ["mlsb", "dfmdock"])
def test_load_lightning_checkpoint_roundtrip(tmp_path, lineage):
    path, raw_sd = _save_lightning_ckpt(tmp_path, lineage, seed=11)
    params, hparams = load_lightning_checkpoint(path, lineage=lineage)

    assert hparams["model"]["depth"] == 3
    conv = convert_score_net if lineage == "mlsb" else convert_egnn_net
    expect = conv(raw_sd, depth=3)

    import jax

    got_leaves = jax.tree_util.tree_leaves_with_path(params)
    exp_leaves = dict(jax.tree_util.tree_leaves_with_path(expect))
    assert len(got_leaves) == len(exp_leaves)
    for kp, leaf in got_leaves:
        np.testing.assert_array_equal(leaf, exp_leaves[kp], err_msg=str(kp))
