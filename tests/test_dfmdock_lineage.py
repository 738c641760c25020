"""Tests for the DFMDock lineage: EGNNNet, crops, and its loss suite."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfmdock_tpu.config import ExperimentConfig, ModelConfig, R3Config, SO3Config
from dfmdock_tpu.data import pad_complex
from dfmdock_tpu.data.crop import crop_complex, contiguous_crop_idxs, spatial_crop_idxs
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.geom import random_rotation_matrix
from dfmdock_tpu.models.egnn_net import EGNNNet
from dfmdock_tpu.train.dfmdock_losses import dfmdock_loss_fn

SO3_TEST = SO3Config(
    num_omega=300, num_sigma=100, expansion_L=400, cache_dir="/tmp/igso3_test_cache"
)
SMALL = ModelConfig(
    lm_embed_dim=32, node_dim=24, edge_dim=16, inner_dim=16, depth=2, dropout=0.0
)
DFM_EXP = ExperimentConfig(
    grad_energy=True,
    use_contrastive_loss=True,
    use_confidence_loss=True,
    use_dist_loss=True,
    use_interface_loss=True,
)


def make_complex(n_rec=32, n_lig=20, feat=32, seed=7):
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


def to_jnp(batch, t=0.5):
    out = {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, str)}
    out["t"] = jnp.float32(t)
    return out


@pytest.fixture(scope="module")
def net_and_params():
    net = EGNNNet(SMALL)
    return net, net.init(jax.random.PRNGKey(0))


def test_forward_shapes(net_and_params):
    net, params = net_and_params
    raw = make_complex()
    batch = to_jnp(pad_complex(*raw))
    out = net.apply(params, batch, jax.random.PRNGKey(1), predict=True)
    assert out["tr_score"].shape == (1, 3)
    assert out["rot_score"].shape == (1, 3)
    assert out["confidence_logits"].shape == ()
    assert out["ires_logits"].shape[1] == 1
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # force lives on valid ligand rows only
    f = np.asarray(out["f"])
    lig = np.asarray(batch["lig_mask"])
    assert np.abs(f[lig == 0]).max() == 0
    assert np.abs(f[lig == 1]).max() > 0


def test_pair_scan_matches_dense_energy(net_and_params):
    """The chunked pair scan must equal a direct dense computation."""
    net, params = net_and_params
    raw = make_complex()
    batch = to_jnp(pad_complex(*raw))
    out = net.apply(params, batch, jax.random.PRNGKey(2), return_energy=True)

    # dense recomputation of the energy head on the same hidden states:
    # rerun the core pieces with identical key
    # (simplest cross-check: energy is invariant to the chunk size)
    import dfmdock_tpu.models.egnn_net as m

    orig = m.ROW_CHUNK
    try:
        m.ROW_CHUNK = 16
        out2 = net.apply(params, batch, jax.random.PRNGKey(2), return_energy=True)
    finally:
        m.ROW_CHUNK = orig
    np.testing.assert_allclose(float(out), float(out2), rtol=1e-5)


def test_equivariance(net_and_params):
    net, params = net_and_params
    raw = make_complex()
    b1 = to_jnp(pad_complex(*raw))
    # this lineage expects caller-side centering; center both inputs so the
    # rotation acts about the origin
    from dfmdock_tpu.train.dfmdock_losses import _center_on_lig

    lig_valid = b1["lig_mask"] * b1["node_mask"].astype(jnp.float32)
    b1["pos"] = _center_on_lig(b1["pos"], lig_valid)
    R = random_rotation_matrix(jax.random.PRNGKey(9))
    b2 = dict(b1)
    b2["pos"] = b1["pos"] @ R.T

    key = jax.random.PRNGKey(3)
    o1 = net.apply(params, b1, key, predict=True)
    o2 = net.apply(params, b2, key, predict=True)
    np.testing.assert_allclose(float(o1["energy"]), float(o2["energy"]), rtol=1e-3, atol=1e-5)
    for k in ["tr_score", "rot_score", "f"]:
        np.testing.assert_allclose(
            np.asarray(o1[k] @ R.T), np.asarray(o2[k]), rtol=5e-2, atol=5e-4
        )


def test_dedx_finite_difference(net_and_params):
    net, params = net_and_params
    raw = make_complex(24, 16)
    batch = to_jnp(pad_complex(*raw))
    key = jax.random.PRNGKey(4)
    out = net.apply(params, batch, key, predict=False)
    dedx = np.asarray(out["dedx"])
    lig_rows = np.where(np.asarray(batch["lig_mask"]) > 0)[0]
    row, dim = int(lig_rows[5]), 2
    eps = 1e-2

    def energy_at(delta):
        pos = np.asarray(batch["pos"]).copy()
        pos[row, 1, dim] += delta
        b = dict(batch)
        b["pos"] = jnp.asarray(pos)
        return float(net.apply(params, b, key, return_energy=True))

    fd = (energy_at(eps) - energy_at(-eps)) / (2 * eps)
    np.testing.assert_allclose(-dedx[row, dim], fd, rtol=5e-2, atol=1e-4)


def test_dedx_matches_direct_autodiff(net_and_params):
    """Round-4 restructured dedx (backbone-VJP + scan-of-grad with the
    dist-feature gradient, egnn_net.apply) vs straight jax.grad of the
    energy — must agree to fp accumulation noise."""
    net, params = net_and_params
    raw = make_complex(24, 16)
    batch = to_jnp(pad_complex(*raw))
    key = jax.random.PRNGKey(4)
    out = net.apply(params, batch, key, predict=False)
    dedx = np.asarray(out["dedx"])

    def energy_of(pos):
        b = dict(batch)
        b["pos"] = pos
        return net.apply(params, b, key, return_energy=True)

    grads = jax.grad(energy_of)(batch["pos"])
    lig_valid = np.asarray(
        batch["lig_mask"] * batch["node_mask"].astype(jnp.float32))
    direct = -np.asarray(grads)[:, 1, :] * lig_valid[:, None]
    np.testing.assert_allclose(dedx, direct, rtol=1e-4, atol=1e-6)


def test_dfmdock_loss_terms(net_and_params):
    net, params = net_and_params
    r3 = R3Diffuser(R3Config())
    so3 = SO3Diffuser(SO3_TEST)
    batch = to_jnp(pad_complex(*make_complex()))
    loss, metrics = dfmdock_loss_fn(
        params, net, r3, so3, batch, jax.random.PRNGKey(5), DFM_EXP
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    for k in ["tr_loss", "rot_loss", "ec_loss", "dist_loss", "ires_loss", "el_loss"]:
        assert float(metrics[k]) > 0, k
    # gradcheck: no NaNs anywhere in the full second-order graph
    grads = jax.grad(
        lambda p: dfmdock_loss_fn(p, net, r3, so3, batch, jax.random.PRNGKey(5), DFM_EXP)[0]
    )(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_dfmdock_loss_jits(net_and_params):
    net, params = net_and_params
    r3 = R3Diffuser(R3Config())
    so3 = SO3Diffuser(SO3_TEST)
    batch = to_jnp(pad_complex(*make_complex()))
    f = jax.jit(
        lambda p, b, k: dfmdock_loss_fn(p, net, r3, so3, b, k, DFM_EXP)[0]
    )
    assert np.isfinite(float(f(params, batch, jax.random.PRNGKey(6))))


# ---------------------------------------------------------------------------
# crops


def test_crop_noop_when_small():
    raw = make_complex(30, 20)
    rx, lx, rp, lp, res_id, asym_id = crop_complex(*raw, crop_size=100)
    assert rx.shape[0] == 30 and lx.shape[0] == 20
    np.testing.assert_array_equal(res_id, np.arange(50))


def test_spatial_crop_keeps_interface():
    raw = make_complex(80, 60)
    rng = np.random.RandomState(0)
    rx, lx, rp, lp, res_id, asym_id = crop_complex(*raw, crop_size=64, rng=rng)
    assert rx.shape[0] + lx.shape[0] == 64
    # both chains survive and residues near the interface are included
    assert rx.shape[0] > 0 and lx.shape[0] > 0
    # res_id keeps original indices
    assert res_id.max() >= 64 or res_id.max() < 140
    assert (np.diff(res_id) > 0).all()
    # crop is centered on the interface: min rec-lig CA distance stays small
    d = np.linalg.norm(rp[:, None, 1] - lp[None, :, 1], axis=-1)
    assert d.min() < 15.0


def test_contiguous_crop_properties():
    rng = np.random.RandomState(1)
    asym = np.array([0] * 120 + [1] * 90)
    idxs = contiguous_crop_idxs(asym, 100, rng)
    assert len(idxs) <= 100
    assert len(idxs) >= 50
    # contiguous per chain
    per_chain = [idxs[idxs < 120], idxs[idxs >= 120] - 120]
    for seg in per_chain:
        if len(seg):
            assert (np.diff(seg) == 1).all()
