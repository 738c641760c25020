"""Fused Pallas EGCL kernel vs the XLA reference path (interpret mode on CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dfmdock_tpu.config import ModelConfig
from dfmdock_tpu.data import pad_complex
from dfmdock_tpu.models import ScoreNet

SMALL = ModelConfig(
    lm_embed_dim=32, node_dim=32, edge_dim=16, inner_dim=16, depth=2, dropout=0.0
)


def make_complex(n_rec=40, n_lig=24, feat=32, seed=13):
    RNG = np.random.RandomState(seed)
    rec_ca = np.cumsum(RNG.randn(n_rec, 3) * 2 + [3.8, 0, 0], axis=0)
    lig_ca = np.cumsum(RNG.randn(n_lig, 3) * 2 + [3.8, 0, 0], axis=0) + [10, 5, 0]
    rec_pos = np.stack([rec_ca - [1.4, 0, 0], rec_ca, rec_ca + [1.5, 0, 0]], 1)
    lig_pos = np.stack([lig_ca - [1.4, 0, 0], lig_ca, lig_ca + [1.5, 0, 0]], 1)
    return (
        RNG.randn(n_rec, feat).astype(np.float32),
        RNG.randn(n_lig, feat).astype(np.float32),
        rec_pos.astype(np.float32),
        lig_pos.astype(np.float32),
    )


def test_pallas_forward_matches_xla():
    raw = make_complex()
    batch = {k: jnp.asarray(v) for k, v in pad_complex(*raw).items()}
    batch["t"] = jnp.float32(0.5)
    key = jax.random.PRNGKey(1)

    net_xla = ScoreNet(SMALL)
    params = net_xla.init(jax.random.PRNGKey(0))
    net_pl = ScoreNet(dataclasses.replace(SMALL, use_pallas=True))

    o1 = net_xla.apply(params, batch, key, predict=True)
    o2 = net_pl.apply(params, batch, key, predict=True)

    # the kernel computes its matmuls in bf16 (f32 accumulation): agreement is
    # bf16-level, far below the SDE's injected noise
    np.testing.assert_allclose(float(o1["energy"]), float(o2["energy"]), rtol=1e-2)
    for k in ["tr_score", "rot_score", "f", "ires"]:
        np.testing.assert_allclose(
            np.asarray(o1[k]), np.asarray(o2[k]), rtol=5e-2, atol=2e-3
        )
    assert int(o1["num_clashes"]) == int(o2["num_clashes"])


def test_pallas_forward_vmapped():
    raw = make_complex(seed=17)
    batch = {k: jnp.asarray(v) for k, v in pad_complex(*raw).items()}
    batch["t"] = jnp.float32(0.3)
    net_pl = ScoreNet(dataclasses.replace(SMALL, use_pallas=True))
    params = net_pl.init(jax.random.PRNGKey(0))
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    out = jax.vmap(lambda k: net_pl.apply(params, batch, k, predict=True)["energy"])(keys)
    assert np.isfinite(np.asarray(out)).all()


def test_pallas_dfmdock_lineage_matches_xla():
    """The DFMDock EGNNNet's fused path (agg-only kernels, VERDICT r2
    Missing #4) against its XLA formulation."""
    from dfmdock_tpu.models.egnn_net import EGNNNet

    raw = make_complex(seed=23)
    batch = {k: jnp.asarray(v) for k, v in pad_complex(*raw).items()}
    batch["t"] = jnp.float32(0.4)
    key = jax.random.PRNGKey(3)

    net_xla = EGNNNet(SMALL)
    params = net_xla.init(jax.random.PRNGKey(0))
    net_pl = EGNNNet(dataclasses.replace(SMALL, use_pallas=True))

    o1 = net_xla.apply(params, batch, key, predict=True)
    o2 = net_pl.apply(params, batch, key, predict=True)

    np.testing.assert_allclose(float(o1["energy"]), float(o2["energy"]),
                               rtol=2e-2, atol=2e-3)
    for k in ["tr_score", "rot_score", "f", "ires_logits", "confidence_logits"]:
        np.testing.assert_allclose(
            np.asarray(o1[k]), np.asarray(o2[k]), rtol=5e-2, atol=2e-3
        )
    assert int(o1["num_clashes"]) == int(o2["num_clashes"])
