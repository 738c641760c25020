"""Numeric parity against the ACTUAL reference PyTorch networks.

The reference code at /root/reference (read-only mount) is imported as a test
oracle — never copied.  torch_geometric is absent, so its GraphNorm is
replaced by a stub implementing the documented PyG semantics (the same
formula dfmdock_tpu.models.modules.graph_norm implements).

The comparison runs in the deterministic small-graph regime: with
n = R + L < knn (20), the reference shrinks to knn=n / sample_size=0
(score_net_mlsb.py:89-94), making the edge set the full graph on both sides —
so forward outputs must agree numerically, which validates at once:
weight conversion (transposes, name map), 6D geometry + binning, relpos,
EGNN layer semantics incl. GraphNorm and attention, the energy/ires heads,
time embedding, and score rescaling.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference mount absent")

import jax
import jax.numpy as jnp

from dfmdock_tpu.config import ModelConfig
from dfmdock_tpu.data import pad_complex
from dfmdock_tpu.features.positional import relpos_onehot
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.models.egnn_net import EGNNNet
from dfmdock_tpu.utils.torch_convert import convert_egnn_net, convert_score_net

N_REC, N_LIG, FEAT = 10, 6, 32
SMALL = ModelConfig(
    lm_embed_dim=FEAT, node_dim=24, edge_dim=16, inner_dim=16, depth=3,
    dropout=0.0, cut_off=20.0, normalize=True,
)


def _install_graphnorm_stub():
    """PyG GraphNorm semantics: y = g*(x - a*mean)/sqrt(var(x - a*mean)+eps)+b."""
    import torch

    class GraphNorm(torch.nn.Module):
        def __init__(self, dim, eps=1e-5):
            super().__init__()
            self.eps = eps
            self.weight = torch.nn.Parameter(torch.ones(dim))
            self.bias = torch.nn.Parameter(torch.zeros(dim))
            self.mean_scale = torch.nn.Parameter(torch.ones(dim))

        def forward(self, x, batch=None):
            mean = x.mean(0, keepdim=True)
            out = x - mean * self.mean_scale
            var = out.pow(2).mean(0, keepdim=True)
            return self.weight * out / (var + self.eps).sqrt() + self.bias

    for name in ["torch_geometric", "torch_geometric.nn", "torch_geometric.nn.norm",
                 "torch_geometric.data", "torch_geometric.data.hetero_data"]:
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torch_geometric.nn.norm"].GraphNorm = GraphNorm
    if REF not in sys.path:
        sys.path.insert(0, REF)


def _make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    rec_ca = np.cumsum(rng.randn(N_REC, 3) * 2 + [3.8, 0, 0], axis=0)
    lig_ca = np.cumsum(rng.randn(N_LIG, 3) * 2 + [3.8, 0, 0], axis=0) + [8, 4, 0]
    mk = lambda ca: np.stack([ca - [1.4, 0.2, 0], ca, ca + [1.5, -0.1, 0]], 1)
    return (
        rng.randn(N_REC, FEAT).astype(np.float32),
        rng.randn(N_LIG, FEAT).astype(np.float32),
        mk(rec_ca).astype(np.float32),
        mk(lig_ca).astype(np.float32),
    )


def _torch_batch(rec_x, lig_x, rec_pos, lig_pos, t):
    import torch

    n = N_REC + N_LIG
    res_id = np.arange(n)
    asym = np.zeros(n, np.int32)
    asym[N_REC:] = 1
    pm = np.asarray(relpos_onehot(jnp.asarray(res_id), jnp.asarray(asym)))
    return {
        "rec_x": torch.from_numpy(rec_x),
        "lig_x": torch.from_numpy(lig_x),
        "rec_pos": torch.from_numpy(rec_pos.copy()),
        "lig_pos": torch.from_numpy(lig_pos.copy()),
        "t": torch.tensor([t]),
        "position_matrix": torch.from_numpy(pm),
    }


def _jax_batch(rec_x, lig_x, rec_pos, lig_pos, t):
    b = {k: jnp.asarray(v) for k, v in pad_complex(rec_x, lig_x, rec_pos, lig_pos).items()}
    b["t"] = jnp.float32(t)
    return b


def test_score_net_mlsb_parity():
    _install_graphnorm_stub()
    import torch
    from models.score_net_mlsb import Score_Net, ModelConfig as RefConfig

    torch.manual_seed(0)
    ref_cfg = RefConfig(
        lm_embed_dim=FEAT, positional_embed_dim=66, spatial_embed_dim=100,
        contact_embed_dim=1, node_dim=24, edge_dim=16, inner_dim=16, depth=3,
        dropout=0.0, cut_off=20.0, normalize=True,
    )
    ref = Score_Net(ref_cfg).eval()

    raw = _make_inputs()
    t = 0.7
    with torch.no_grad():
        ref_out = ref(_torch_batch(*raw, t), predict=True)

    params = jax.tree_util.tree_map(
        jnp.asarray, convert_score_net({k: v.numpy() for k, v in ref.state_dict().items()}, depth=3)
    )
    net = ScoreNet(SMALL)
    out = net.apply(params, _jax_batch(*raw, t), jax.random.PRNGKey(0), predict=True)

    np.testing.assert_allclose(
        float(out["energy"]), float(ref_out["energy"]), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["tr_score"]), ref_out["tr_score"].numpy(), rtol=2e-3, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["rot_score"]), ref_out["rot_score"].numpy(), rtol=2e-3, atol=2e-5
    )
    lig_rows = slice(N_REC, N_REC + N_LIG)
    np.testing.assert_allclose(
        np.asarray(out["f"])[lig_rows], ref_out["f"].numpy(), rtol=2e-3, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["ires"])[: N_REC + N_LIG], ref_out["ires"].numpy(),
        rtol=2e-3, atol=2e-5,
    )
    assert int(out["num_clashes"]) == int(ref_out["num_clashes"])


def test_egnn_net_dfmdock_parity():
    _install_graphnorm_stub()
    import torch
    from models.egnn_net import EGNN_Net, ModelConfig as RefConfig

    torch.manual_seed(1)
    ref_cfg = RefConfig(
        lm_embed_dim=FEAT, positional_embed_dim=66, spatial_embed_dim=100,
        node_dim=24, edge_dim=16, inner_dim=16, depth=3,
        dropout=0.0, cut_off=20.0, normalize=True, agg="mean",
    )
    ref = EGNN_Net(ref_cfg).eval()

    raw = _make_inputs(seed=4)
    t = 0.35
    with torch.no_grad():
        ref_out = ref(_torch_batch(*raw, t), predict=True)

    params = jax.tree_util.tree_map(
        jnp.asarray, convert_egnn_net({k: v.numpy() for k, v in ref.state_dict().items()}, depth=3)
    )
    net = EGNNNet(SMALL)
    out = net.apply(params, _jax_batch(*raw, t), jax.random.PRNGKey(0), predict=True)

    np.testing.assert_allclose(
        float(out["energy"]), float(ref_out["energy"]), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        float(out["confidence_logits"]), float(ref_out["confidence_logits"]),
        rtol=2e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["tr_score"]), ref_out["tr_score"].numpy(), rtol=2e-3, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["rot_score"]), ref_out["rot_score"].numpy(), rtol=2e-3, atol=2e-5
    )
    lig_rows = slice(N_REC, N_REC + N_LIG)
    np.testing.assert_allclose(
        np.asarray(out["f"])[lig_rows], ref_out["f"].numpy(), rtol=2e-3, atol=2e-5
    )
    assert int(out["num_clashes"]) == int(ref_out["num_clashes"])
