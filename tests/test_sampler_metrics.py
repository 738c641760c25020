"""Tests for the EM sampler, DockQ metrics, and the end-to-end slice."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfmdock_tpu.config import (
    DFMDockConfig,
    ModelConfig,
    R3Config,
    SamplerConfig,
    SO3Config,
)
from dfmdock_tpu.data import pad_complex
from dfmdock_tpu.data.dataset import NPZDataset, complex_to_batch
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.eval import compute_metrics
from dfmdock_tpu.geom import axis_angle_to_matrix
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.sampler import EMSampler
from dfmdock_tpu.sampler.em import clash_force, modify_coords, randomize_pose

RNG = np.random.RandomState(3)
SO3_TEST = SO3Config(
    num_omega=300, num_sigma=100, expansion_L=400, cache_dir="/tmp/igso3_test_cache"
)
SMALL = ModelConfig(
    lm_embed_dim=32, node_dim=24, edge_dim=16, inner_dim=16, depth=2, dropout=0.0
)
DB5_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data/db5_npz")


def make_complex(n_rec=32, n_lig=16, feat=32, seed=3):
    RNG = np.random.RandomState(seed)
    rec_ca = np.cumsum(RNG.randn(n_rec, 3) * 2 + [3.8, 0, 0], axis=0)
    lig_ca = np.cumsum(RNG.randn(n_lig, 3) * 2 + [3.8, 0, 0], axis=0) + [12, 6, 0]
    rec_pos = np.stack([rec_ca - [1.4, 0, 0], rec_ca, rec_ca + [1.5, 0, 0]], 1)
    lig_pos = np.stack([lig_ca - [1.4, 0, 0], lig_ca, lig_ca + [1.5, 0, 0]], 1)
    return (
        RNG.randn(n_rec, feat).astype(np.float32),
        RNG.randn(n_lig, feat).astype(np.float32),
        rec_pos.astype(np.float32),
        lig_pos.astype(np.float32),
    )


def to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, str)}


# ---------------------------------------------------------------------------
# metrics


def test_metrics_perfect_prediction():
    _, _, rec, lig = make_complex()
    m = compute_metrics((rec, lig), (rec, lig))
    assert m["c_rmsd"] < 1e-6 and m["i_rmsd"] < 1e-6 and m["l_rmsd"] < 1e-6
    assert m["fnat"] == pytest.approx(1.0, abs=1e-5)
    assert m["DockQ"] == pytest.approx(1.0, abs=1e-5)


def test_metrics_translated_ligand():
    _, _, rec, lig = make_complex()
    shift = np.array([20.0, 0, 0], np.float32)
    m = compute_metrics((rec, lig + shift), (rec, lig))
    assert m["l_rmsd"] == pytest.approx(20.0, rel=1e-5)
    assert 0.0 <= m["DockQ"] < 0.5
    # whole-complex rigid motion leaves everything invariant
    R = np.asarray(axis_angle_to_matrix(jnp.array([0.4, -0.2, 0.9])))
    m2 = compute_metrics((rec @ R.T + 5, lig @ R.T + 5), (rec, lig))
    assert m2["DockQ"] == pytest.approx(1.0, abs=1e-4)


# ---------------------------------------------------------------------------
# sampler pieces


def test_randomize_and_modify_roundtrip():
    batch = to_jnp(pad_complex(*make_complex()))
    cfg = SamplerConfig()
    pos1, tr_u, rot_u = randomize_pose(
        jax.random.PRNGKey(0), batch["pos"], batch["lig_mask"], batch["node_mask"], cfg
    )
    # receptor + padding untouched
    moved = np.asarray(pos1) - np.asarray(batch["pos"])
    lig = np.asarray(batch["lig_mask"])
    assert np.abs(moved[lig == 0]).max() == 0
    assert np.abs(moved[lig == 1]).max() > 1.0

    # applying (rot_u, tr_u) to the original ligand about its original CA
    # centroid reproduces pos1 (the modify_aa_coords contract,
    # inference_base.py:354-364)
    lig_rows = lig == 1
    orig = np.asarray(batch["pos"])[lig_rows]
    c = orig[:, 1].mean(0)
    R = np.asarray(axis_angle_to_matrix(rot_u.reshape(3)))
    expect = (orig - c) @ R.T + c + np.asarray(tr_u).reshape(3)
    np.testing.assert_allclose(np.asarray(pos1)[lig_rows], expect, atol=1e-3)


def test_clash_force_pushes_apart():
    rec_x, lig_x, rec_pos, lig_pos = make_complex()
    lig_pos = rec_pos[:16] + RNG.randn(16, 3, 3).astype(np.float32) * 0.3  # overlap
    batch = to_jnp(pad_complex(rec_x, lig_x, rec_pos, lig_pos))
    f = np.asarray(clash_force(batch["pos"], batch["lig_mask"], batch["node_mask"]))
    assert np.isfinite(f).all() and np.linalg.norm(f) > 0.01
    # no clash -> no force
    batch2 = to_jnp(pad_complex(rec_x, lig_x, rec_pos, rec_pos[:16] + 100.0))
    f2 = np.asarray(clash_force(batch2["pos"], batch2["lig_mask"], batch2["node_mask"]))
    assert np.abs(f2).max() < 1e-6


@pytest.fixture(scope="module")
def sampler_setup():
    net = ScoreNet(SMALL)
    params = net.init(jax.random.PRNGKey(0))
    r3 = R3Diffuser(R3Config())
    so3 = SO3Diffuser(SO3_TEST)
    return net, params, r3, so3


def test_sampler_runs_and_transform_contract(sampler_setup):
    net, params, r3, so3 = sampler_setup
    cfg = SamplerConfig(num_steps=6)
    sampler = EMSampler(net, r3, so3, cfg)
    batch = to_jnp(pad_complex(*make_complex()))
    out = sampler.sample_one(params, batch, jax.random.PRNGKey(1))

    lig = np.asarray(batch["lig_mask"]) == 1
    pos = np.asarray(out["pos"])
    orig = np.asarray(batch["pos"])
    # receptor + padding untouched through 6 steps
    assert np.abs(pos[~lig] - orig[~lig]).max() == 0
    assert np.isfinite(float(out["energy"]))

    # accumulated (rot_update, tr_update) applied to the ORIGINAL ligand
    # about its original CA centroid reproduces the final pose exactly
    c = orig[lig][:, 1].mean(0)
    R = np.asarray(axis_angle_to_matrix(out["rot_update"].reshape(3)))
    expect = (orig[lig] - c) @ R.T + c + np.asarray(out["tr_update"]).reshape(3)
    np.testing.assert_allclose(pos[lig], expect, atol=2e-2)


def test_sampler_vmap_poses_differ(sampler_setup):
    net, params, r3, so3 = sampler_setup
    cfg = SamplerConfig(num_steps=3)
    sampler = EMSampler(net, r3, so3, cfg)
    batch = to_jnp(pad_complex(*make_complex()))
    res = sampler.sample(params, batch, jax.random.PRNGKey(2), num_samples=3)
    assert res["pos"].shape[0] == 3
    assert res["energy"].shape == (3,)
    # independent poses are distinct
    p = np.asarray(res["pos"])
    assert np.abs(p[0] - p[1]).max() > 0.1
    idx = int(EMSampler.rank_by_energy(res))
    assert res["energy"][idx] == res["energy"].min()


def test_sampler_deterministic_given_key(sampler_setup):
    net, params, r3, so3 = sampler_setup
    cfg = SamplerConfig(num_steps=3)
    sampler = EMSampler(net, r3, so3, cfg)
    batch = to_jnp(pad_complex(*make_complex()))
    o1 = sampler.sample_one(params, batch, jax.random.PRNGKey(5))
    o2 = sampler.sample_one(params, batch, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(o1["pos"]), np.asarray(o2["pos"]))


def test_sampler_trajectory_recording(sampler_setup):
    net, params, r3, so3 = sampler_setup
    cfg = SamplerConfig(num_steps=4)
    sampler = EMSampler(net, r3, so3, cfg)
    batch = to_jnp(pad_complex(*make_complex()))
    out = sampler.sample_one(params, batch, jax.random.PRNGKey(3), record_trajectory=True)
    assert out["trajectory"].shape[0] == 4
    np.testing.assert_array_equal(
        np.asarray(out["trajectory"][-1]), np.asarray(out["pos"])
    )


# ---------------------------------------------------------------------------
# end-to-end slice on a converted DB5 complex (random weights)


@pytest.mark.skipif(not os.path.isdir(DB5_DIR), reason="db5 npz not converted")
def test_e2e_db5_complex():
    ds = NPZDataset(DB5_DIR)
    idx = ds.ids.index("1QA9")  # smallest complex
    raw = ds.load_raw(idx)
    batch = to_jnp(complex_to_batch(raw))
    assert batch["x"].shape[1] == 1301

    cfg = DFMDockConfig()
    net = ScoreNet(cfg.model)
    params = net.init(jax.random.PRNGKey(0))
    r3 = R3Diffuser(cfg.diffuser.r3)
    so3 = SO3Diffuser(SO3_TEST)
    sampler = EMSampler(net, r3, so3, dataclasses.replace(cfg.sampler, num_steps=3))

    res = sampler.sample(params, batch, jax.random.PRNGKey(1), num_samples=2)
    assert np.isfinite(np.asarray(res["energy"])).all()

    # unpad + score against the native pose
    R, L = int(raw["rec_x"].shape[0]), int(raw["lig_x"].shape[0])
    pos = np.asarray(res["pos"][int(EMSampler.rank_by_energy(res))])
    m = compute_metrics((pos[:R], pos[R : R + L]), (raw["rec_pos"], raw["lig_pos"]))
    assert 0 <= m["DockQ"] <= 1
    assert m["l_rmsd"] > 0
