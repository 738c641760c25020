"""Fused kNN+Gumbel edge selection (ops/select_topk.py) vs the XLA
select_edges (models/edges.py), interpret mode on CPU.

Same PRNG key -> both paths draw the SAME Gumbel tensor (the kernel wrapper
precomputes it with the identical XLA ops), so for any graph with >= knn +
sample valid candidates the index tensors must be BIT-identical, not just
distribution-equal.  Tiny graphs may pick different padded slots; there only
edge_mask and the mask-selected indices must agree.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfmdock_tpu.models.edges import select_edges
from dfmdock_tpu.ops.select_topk import select_topk_fused


def make_dist(n_tot, n_valid, seed=7, with_ties=False):
    rng = np.random.RandomState(seed)
    ca = np.cumsum(rng.randn(n_tot, 3) * 2 + [3.8, 0, 0], axis=0)
    d = np.linalg.norm(ca[:, None] - ca[None, :], axis=-1).astype(np.float32)
    if with_ties:
        # exact duplicate distances exercise the lowest-index tie-break
        d = np.round(d / 4.0) * 4.0
    mask = np.arange(n_tot) < n_valid
    return jnp.asarray(d), jnp.asarray(mask)


@pytest.mark.parametrize("n_tot", [64, 128, 192, 256, 448])
def test_bit_identical_full_graphs(n_tot):
    dist, mask = make_dist(n_tot, n_tot)
    key = jax.random.PRNGKey(3)
    idx_ref, em_ref = select_edges(key, dist, mask)
    idx_k, em_k = select_topk_fused(key, dist, mask)
    np.testing.assert_array_equal(np.asarray(idx_ref), np.asarray(idx_k))
    np.testing.assert_array_equal(np.asarray(em_ref), np.asarray(em_k))


def test_bit_identical_with_ties():
    dist, mask = make_dist(128, 128, with_ties=True)
    key = jax.random.PRNGKey(11)
    idx_ref, em_ref = select_edges(key, dist, mask)
    idx_k, em_k = select_topk_fused(key, dist, mask)
    np.testing.assert_array_equal(np.asarray(idx_ref), np.asarray(idx_k))
    np.testing.assert_array_equal(np.asarray(em_ref), np.asarray(em_k))


@pytest.mark.parametrize("n_valid", [61, 100, 127])
def test_bit_identical_padded(n_valid):
    """Padded rows/cols active: >= knn+sample valid candidates remain."""
    dist, mask = make_dist(128, n_valid)
    key = jax.random.PRNGKey(5)
    idx_ref, em_ref = select_edges(key, dist, mask)
    idx_k, em_k = select_topk_fused(key, dist, mask)
    np.testing.assert_array_equal(np.asarray(em_ref), np.asarray(em_k))
    np.testing.assert_array_equal(np.asarray(idx_ref), np.asarray(idx_k))


@pytest.mark.parametrize("n_valid", [3, 10, 25, 59, 60])
def test_tiny_graphs_masked_parity(n_valid):
    """Below knn+sample valid nodes the padded-slot picks may differ between
    the paths (both pick among exact -1e30 ties), but the edge masks and the
    mask-selected indices must agree."""
    dist, mask = make_dist(64, n_valid)
    key = jax.random.PRNGKey(9)
    idx_ref, em_ref = select_edges(key, dist, mask)
    idx_k, em_k = select_topk_fused(key, dist, mask)
    np.testing.assert_array_equal(np.asarray(em_ref), np.asarray(em_k))
    np.testing.assert_array_equal(
        np.asarray(idx_ref * em_ref.astype(jnp.int32)),
        np.asarray(idx_k * em_k.astype(jnp.int32)),
    )


def test_knn_only():
    dist, mask = make_dist(64, 64)
    key = jax.random.PRNGKey(2)
    idx_ref, em_ref = select_edges(key, dist, mask, knn=20, sample_size=0)
    idx_k, em_k = select_topk_fused(key, dist, mask, knn=20, sample_size=0)
    np.testing.assert_array_equal(np.asarray(idx_ref), np.asarray(idx_k))
    np.testing.assert_array_equal(np.asarray(em_ref), np.asarray(em_k))


def test_vmapped_over_poses():
    """The sampler calls selection under vmap over poses."""
    dist, mask = make_dist(128, 100)
    keys = jax.random.split(jax.random.PRNGKey(4), 3)
    dists = jnp.stack([dist, dist * 1.5, dist + 0.25])
    ref = jax.vmap(lambda k, d: select_edges(k, d, mask))(keys, dists)
    fast = jax.vmap(lambda k, d: select_topk_fused(k, d, mask))(keys, dists)
    np.testing.assert_array_equal(np.asarray(ref[0]), np.asarray(fast[0]))
    np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(fast[1]))


def test_net_forward_parity():
    """Full Pallas predict forward with select_kernel on vs off is
    bit-identical: same key -> same Gumbel -> same graph -> same table."""
    import dataclasses

    from dfmdock_tpu.config import ModelConfig
    from dfmdock_tpu.data import pad_complex
    from dfmdock_tpu.models import ScoreNet

    cfg = ModelConfig(
        lm_embed_dim=32, node_dim=32, edge_dim=16, inner_dim=16, depth=2,
        dropout=0.0, use_pallas=True,
    )
    rng = np.random.RandomState(13)
    n_rec, n_lig, feat = 40, 24, 32
    rec_ca = np.cumsum(rng.randn(n_rec, 3) * 2 + [3.8, 0, 0], axis=0)
    lig_ca = np.cumsum(rng.randn(n_lig, 3) * 2 + [3.8, 0, 0], axis=0) + [10, 5, 0]
    raw = (
        rng.randn(n_rec, feat).astype(np.float32),
        rng.randn(n_lig, feat).astype(np.float32),
        np.stack([rec_ca - [1.4, 0, 0], rec_ca, rec_ca + [1.5, 0, 0]], 1).astype(np.float32),
        np.stack([lig_ca - [1.4, 0, 0], lig_ca, lig_ca + [1.5, 0, 0]], 1).astype(np.float32),
    )
    batch = {k: jnp.asarray(v) for k, v in pad_complex(*raw).items()}
    batch["t"] = jnp.float32(0.5)
    key = jax.random.PRNGKey(1)

    net_slow = ScoreNet(cfg)
    params = net_slow.init(jax.random.PRNGKey(0))
    net_fast = ScoreNet(dataclasses.replace(cfg, select_kernel=True))
    o1 = net_slow.apply(params, batch, key, predict=True)
    o2 = net_fast.apply(params, batch, key, predict=True)
    for k in ["energy", "tr_score", "rot_score", "f", "ires"]:
        np.testing.assert_array_equal(
            np.asarray(o1[k]), np.asarray(o2[k]), err_msg=k
        )


def test_dfmdock_lineage_forward_parity():
    """The EGNNNet (DFMDock lineage) call site is wired separately; same
    bit-identity contract on its Pallas predict path."""
    import dataclasses

    from dfmdock_tpu.config import ModelConfig
    from dfmdock_tpu.data import pad_complex
    from dfmdock_tpu.models.egnn_net import EGNNNet

    cfg = ModelConfig(
        lm_embed_dim=32, node_dim=24, edge_dim=16, inner_dim=16, depth=2,
        dropout=0.0, use_pallas=True,
    )
    rng = np.random.RandomState(7)
    n_rec, n_lig, feat = 32, 20, 32
    rec_ca = np.cumsum(rng.randn(n_rec, 3) * 2 + [3.8, 0, 0], axis=0)
    lig_ca = np.cumsum(rng.randn(n_lig, 3) * 2 + [3.8, 0, 0], axis=0) + [10, 5, 0]
    raw = (
        rng.randn(n_rec, feat).astype(np.float32),
        rng.randn(n_lig, feat).astype(np.float32),
        np.stack([rec_ca - [1.4, 0, 0], rec_ca, rec_ca + [1.5, 0, 0]], 1).astype(np.float32),
        np.stack([lig_ca - [1.4, 0, 0], lig_ca, lig_ca + [1.5, 0, 0]], 1).astype(np.float32),
    )
    batch = {k: jnp.asarray(v) for k, v in pad_complex(*raw).items()}
    batch["t"] = jnp.float32(0.4)
    key = jax.random.PRNGKey(6)

    net_slow = EGNNNet(cfg)
    params = net_slow.init(jax.random.PRNGKey(0))
    net_fast = EGNNNet(dataclasses.replace(cfg, select_kernel=True))
    o1 = net_slow.apply(params, batch, key, predict=True)
    o2 = net_fast.apply(params, batch, key, predict=True)
    for k in o1:
        if o1[k] is None:
            continue
        np.testing.assert_array_equal(
            np.asarray(o1[k]), np.asarray(o2[k]), err_msg=k
        )
