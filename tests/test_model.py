"""Tests for edge selection, EGNN, and the ScoreNet forward pass."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfmdock_tpu.config import ModelConfig
from dfmdock_tpu.data import pad_complex
from dfmdock_tpu.features.sixd import pairwise_ca_dist
from dfmdock_tpu.geom import random_rotation_matrix
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.models import modules as nnm
from dfmdock_tpu.models.edges import select_edges

RNG = np.random.RandomState(11)

SMALL = ModelConfig(
    lm_embed_dim=32, node_dim=24, edge_dim=16, inner_dim=16, depth=3, dropout=0.0
)


def make_complex(n_rec=40, n_lig=24, feat=32):
    rec_ca = np.cumsum(RNG.randn(n_rec, 3) * 2 + [3.8, 0, 0], axis=0)
    lig_ca = np.cumsum(RNG.randn(n_lig, 3) * 2 + [3.8, 0, 0], axis=0) + [10, 5, 0]
    rec_pos = np.stack([rec_ca - [1.4, 0, 0], rec_ca, rec_ca + [1.5, 0, 0]], 1)
    lig_pos = np.stack([lig_ca - [1.4, 0, 0], lig_ca, lig_ca + [1.5, 0, 0]], 1)
    rec_x = RNG.randn(n_rec, feat).astype(np.float32)
    lig_x = RNG.randn(n_lig, feat).astype(np.float32)
    return rec_x, lig_x, rec_pos.astype(np.float32), lig_pos.astype(np.float32)


def to_jnp(batch, t=0.5):
    out = {k: jnp.asarray(v) for k, v in batch.items()}
    out["t"] = jnp.float32(t)
    return out


# ---------------------------------------------------------------------------
# edge selection


def test_edges_small_graph_fully_connected():
    # n <= knn+sample: every valid node connects to every valid node (incl self)
    n, n_pad = 30, 64
    pts = RNG.randn(n, 3) * 5
    pos = np.zeros((n_pad, 3), np.float32)
    pos[:n] = pts
    mask = np.zeros(n_pad, bool)
    mask[:n] = True
    dist = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    idx, emask = select_edges(jax.random.PRNGKey(0), jnp.asarray(dist), jnp.asarray(mask))
    idx, emask = np.asarray(idx), np.asarray(emask)
    for i in range(n):
        neigh = set(idx[i][emask[i] > 0].tolist())
        assert neigh == set(range(n)), f"row {i}: {len(neigh)} neighbours"
    assert emask[n:].sum() == 0  # padded rows have no edges


def test_edges_large_graph_counts_and_no_duplicates():
    n = 200
    pts = np.cumsum(RNG.randn(n, 3) * 2 + [3.8, 0, 0], axis=0)
    dist = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    mask = np.ones(n, bool)
    idx, emask = select_edges(jax.random.PRNGKey(1), jnp.asarray(dist), jnp.asarray(mask))
    idx, emask = np.asarray(idx), np.asarray(emask)
    assert (emask.sum(-1) == 60).all()
    for i in range(0, n, 17):
        sel = idx[i][emask[i] > 0]
        assert len(set(sel.tolist())) == 60  # distinct
        # knn part contains self and the true 20 nearest
        true_knn = set(np.argsort(dist[i])[:20].tolist())
        assert set(idx[i][:20].tolist()) == true_knn


def test_edge_sampling_distribution():
    # sample_size=1: inclusion probability proportional to 1/d^3 over non-knn
    n = 30
    pts = RNG.randn(n, 3) * 8
    dist = np.linalg.norm(pts[:, None] - pts[None, :], axis=-1)
    mask = np.ones(n, bool)
    knn = 20
    row = 0
    true_knn = np.argsort(dist[row])[:knn]
    probs = 1.0 / np.maximum(dist[row], 1e-10) ** 3
    probs[true_knn] = 0
    probs /= probs.sum()

    draws = 4000
    keys = jax.random.split(jax.random.PRNGKey(2), draws)
    f = jax.jit(
        lambda k: select_edges(k, jnp.asarray(dist), jnp.asarray(mask), knn=knn, sample_size=1)[0][row, knn]
    )
    counts = np.zeros(n)
    sampled = np.asarray(jax.vmap(f)(keys))
    for s in sampled:
        counts[s] += 1
    emp = counts / draws
    # total variation distance small
    assert np.abs(emp - probs).sum() / 2 < 0.05


# ---------------------------------------------------------------------------
# ScoreNet forward


@pytest.fixture(scope="module")
def net_and_params():
    net = ScoreNet(SMALL)
    params = net.init(jax.random.PRNGKey(0))
    return net, params


def test_forward_shapes_and_finiteness(net_and_params):
    net, params = net_and_params
    batch = to_jnp(pad_complex(*make_complex()))
    out = net.apply(params, batch, jax.random.PRNGKey(1), predict=True)
    assert out["tr_score"].shape == (1, 3)
    assert out["rot_score"].shape == (1, 3)
    assert out["energy"].shape == ()
    assert out["f"].shape[1] == 3
    assert out["ires"].shape[1] == 1
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # force is zero on receptor + padded rows
    f = np.asarray(out["f"])
    lig = np.asarray(batch["lig_mask"])
    assert np.abs(f[lig == 0]).max() == 0


def test_padding_invariance_knn_only(net_and_params):
    # with deterministic edges (sample_size=0) the outputs must be identical
    # regardless of padded size
    cfg = dataclasses.replace(SMALL, sample_size=0, knn=20)
    net = ScoreNet(cfg)
    params = net.init(jax.random.PRNGKey(0))
    raw = make_complex(30, 20)
    b1 = to_jnp(pad_complex(*raw, pad_to=64))
    b2 = to_jnp(pad_complex(*raw, pad_to=128))
    o1 = net.apply(params, b1, jax.random.PRNGKey(3), predict=True)
    o2 = net.apply(params, b2, jax.random.PRNGKey(4), predict=True)
    np.testing.assert_allclose(float(o1["energy"]), float(o2["energy"]), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(o1["tr_score"]), np.asarray(o2["tr_score"]), rtol=2e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(o1["rot_score"]), np.asarray(o2["rot_score"]), rtol=2e-3, atol=1e-5
    )
    assert int(o1["num_clashes"]) == int(o2["num_clashes"])


def test_rotation_equivariance(net_and_params):
    net, params = net_and_params
    raw = make_complex(40, 24)
    b1 = to_jnp(pad_complex(*raw))
    R = random_rotation_matrix(jax.random.PRNGKey(7))
    b2 = dict(b1)
    b2["pos"] = b1["pos"] @ R.T + jnp.array([4.0, -7.0, 2.0])  # rigid motion

    key = jax.random.PRNGKey(5)
    o1 = net.apply(params, b1, key, predict=True)
    o2 = net.apply(params, b2, key, predict=True)

    # invariants
    np.testing.assert_allclose(float(o1["energy"]), float(o2["energy"]), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(o1["ires"]), np.asarray(o2["ires"]), rtol=1e-2, atol=1e-4
    )
    # equivariants: v -> v @ R.T
    for k in ["tr_score", "rot_score", "f"]:
        np.testing.assert_allclose(
            np.asarray(o1[k] @ R.T),
            np.asarray(o2[k]),
            rtol=5e-2,
            atol=5e-4,
        )


def test_translation_invariance_exact(net_and_params):
    net, params = net_and_params
    raw = make_complex(40, 24)
    b1 = to_jnp(pad_complex(*raw))
    b2 = dict(b1)
    b2["pos"] = b1["pos"] + jnp.array([100.0, -50.0, 25.0])
    key = jax.random.PRNGKey(6)
    o1 = net.apply(params, b1, key, predict=True)
    o2 = net.apply(params, b2, key, predict=True)
    np.testing.assert_allclose(float(o1["energy"]), float(o2["energy"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(o1["tr_score"]), np.asarray(o2["tr_score"]), rtol=1e-3, atol=1e-6
    )


def test_energy_scan_matches_dense(net_and_params):
    net, params = net_and_params
    n = 64
    h = jnp.asarray(RNG.randn(n, SMALL.node_dim).astype(np.float32))
    pair_mask = jnp.asarray((RNG.rand(n, n) < 0.3).astype(np.float32))
    got = float(net._energy(params["to_energy"], h, pair_mask))

    # dense reference
    w = params["to_energy"]["l0"]["w"]
    hi = jnp.broadcast_to(h[:, None, :], (n, n, SMALL.node_dim))
    hj = jnp.broadcast_to(h[None, :, :], (n, n, SMALL.node_dim))
    pre = jnp.concatenate([hi, hj], -1) @ w
    e = nnm.layer_norm(params["to_energy"]["ln"], pre)
    e = (jax.nn.silu(e) @ params["to_energy"]["l1"]["w"]).squeeze(-1)
    want = float((e * pair_mask).sum() / (pair_mask.sum() + 1e-6))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dedx_matches_finite_difference(net_and_params):
    net, params = net_and_params
    batch = to_jnp(pad_complex(*make_complex(24, 16)))
    key = jax.random.PRNGKey(8)
    out = net.apply(params, batch, key, predict=False)
    dedx = np.asarray(out["dedx"])

    # pick a valid ligand CA coordinate and finite-difference the energy
    lig_rows = np.where(np.asarray(batch["lig_mask"]) > 0)[0]
    row, dim = int(lig_rows[3]), 1
    eps = 1e-2

    def energy_at(delta):
        pos = np.asarray(batch["pos"]).copy()
        pos[row, 1, dim] += delta
        b = dict(batch)
        b["pos"] = jnp.asarray(pos)
        return float(net.apply(params, b, key, return_energy=True))

    fd = (energy_at(eps) - energy_at(-eps)) / (2 * eps)
    got = -dedx[row, dim]  # dedx = -dE/dx
    np.testing.assert_allclose(got, fd, rtol=5e-2, atol=1e-4)


def test_dedx_matches_direct_autodiff(net_and_params):
    """The round-4 restructured dedx (backbone-VJP + scan-of-grad energy
    head, score_net.apply) must equal the straight jax.grad of the energy
    w.r.t. pos — same keys, same math, different factorization — to fp
    accumulation noise (the FD test above is 5e-2-loose; this pins
    equivalence tight)."""
    net, params = net_and_params
    batch = to_jnp(pad_complex(*make_complex(24, 16)))
    key = jax.random.PRNGKey(8)
    out = net.apply(params, batch, key, predict=False)
    dedx = np.asarray(out["dedx"])

    def energy_of(pos):
        b = dict(batch)
        b["pos"] = pos
        return net.apply(params, b, key, return_energy=True)

    grads = jax.grad(energy_of)(batch["pos"])
    lig_valid = np.asarray(batch["lig_mask"] * batch["node_mask"])
    direct = -np.asarray(grads)[:, 1, :] * lig_valid[:, None]
    np.testing.assert_allclose(dedx, direct, rtol=1e-4, atol=1e-6)


def test_num_clashes(net_and_params):
    net, params = net_and_params
    raw = make_complex(30, 18)
    rec_x, lig_x, rec_pos, lig_pos = raw
    # force some clashes: move 3 ligand residues onto receptor CAs
    lig_pos = lig_pos.copy()
    lig_pos[:3] = rec_pos[:3]
    batch = to_jnp(pad_complex(rec_x, lig_x, rec_pos, lig_pos))
    out = net.apply(params, batch, jax.random.PRNGKey(9), predict=True)
    D = np.linalg.norm(rec_pos[:, None, 1] - lig_pos[None, :, 1], axis=-1)
    want = int((D <= 3.0).sum())
    assert int(out["num_clashes"]) == want


def test_jit_forward(net_and_params):
    net, params = net_and_params
    batch = to_jnp(pad_complex(*make_complex()))
    f = jax.jit(lambda p, b, k: net.apply(p, b, k, predict=True))
    out = f(params, batch, jax.random.PRNGKey(10))
    assert np.isfinite(float(out["energy"]))
