"""Tests for observability utils, frames, TM losses, YAML config, CLI smoke."""
import dataclasses
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfmdock_tpu.config import DFMDockConfig, ModelConfig, from_yaml, to_yaml
from dfmdock_tpu.eval.tm import compute_tm, distogram_loss, tm_loss
from dfmdock_tpu.features.frames import pair_features, rbf, residue_frames
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.utils.logging import config_tree, param_counts

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_param_counts():
    net = ScoreNet(ModelConfig(lm_embed_dim=16, node_dim=8, edge_dim=8, inner_dim=8, depth=1))
    params = net.init(jax.random.PRNGKey(0))
    c = param_counts(params)
    assert c["total"] == c["trainable"] + c["non_trainable"]
    assert c["non_trainable"] == 4  # Fourier W: inner_dim // 2


def test_config_tree_and_yaml_roundtrip(tmp_path):
    cfg = DFMDockConfig()
    s = config_tree(cfg)
    assert "node_dim: 256" in s
    p = str(tmp_path / "c.yaml")
    to_yaml(cfg, p)
    cfg2 = from_yaml(p)
    assert cfg2 == cfg


def test_from_yaml_accepts_reference_layout(tmp_path):
    # a reference-style Hydra model YAML: _target_ + model/diffuser/experiment
    p = str(tmp_path / "ref.yaml")
    with open(p, "w") as f:
        f.write(
            """
_target_: models.score_model_mlsb.Score_Model
model:
  lm_embed_dim: 1301
  node_dim: 128
  cut_off: 20.0
diffuser:
  r3: {min_sigma: 0.1, max_sigma: 30.0}
  so3: {min_sigma: 0.1, max_sigma: 1.5}
experiment:
  lr: 0.0002
  grad_energy: true
"""
        )
    cfg = from_yaml(p)
    assert cfg.model.node_dim == 128
    assert cfg.experiment.lr == 0.0002
    assert cfg.experiment.grad_energy is True
    assert cfg.diffuser.so3.max_sigma == 1.5


def test_residue_frames_orthonormal():
    rng = np.random.RandomState(0)
    ca = np.cumsum(rng.randn(20, 3) * 2 + [3.8, 0, 0], axis=0)
    pos = np.stack([ca + rng.randn(20, 3) * 0.5 - [1.4, 0, 0], ca,
                    ca + rng.randn(20, 3) * 0.5 + [1.5, 0, 0]], 1).astype(np.float32)
    R = np.asarray(residue_frames(jnp.asarray(pos)))
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(np.einsum("nij,nkj->nik", R, R), eye, atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)
    feats = np.asarray(pair_features(jnp.asarray(pos[:, 1]), jnp.asarray(R)))
    assert feats.shape == (20, 20, 25)
    assert np.isfinite(feats).all()
    # RBF peaks where distance equals a center
    r = np.asarray(rbf(jnp.asarray([2.0]), 2.0, 22.0, 16))
    assert r[0, 0] == pytest.approx(1.0)


def test_tm_and_distogram():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(12, 10, 64).astype(np.float32))
    tm = float(compute_tm(logits))
    assert 0 < tm < 1
    sq = jnp.asarray((rng.rand(12, 10) * 100).astype(np.float32))
    assert float(tm_loss(logits, sq)) > 0
    d = jnp.asarray((rng.rand(12, 10) * 40 + 3).astype(np.float32))
    full = float(distogram_loss(logits, d))
    assert full > 0
    # perfect logits give lower loss than random
    boundaries = np.linspace(3.25, 50.75, 63) ** 2
    true_bins = (np.asarray(d)[..., None] ** 2 > boundaries).sum(-1)
    perfect = np.full((12, 10, 64), -30.0, np.float32)
    for i in range(12):
        for j in range(10):
            perfect[i, j, true_bins[i, j]] = 30.0
    assert float(distogram_loss(jnp.asarray(perfect), d)) < 1e-3


@pytest.mark.parametrize("args", [
    ["-m", "dfmdock_tpu.cli.dock", "--help"],
    ["-m", "dfmdock_tpu.cli.sweep", "--help"],
    ["-m", "dfmdock_tpu.cli.train", "--help"],
])
def test_cli_help(args):
    out = subprocess.run(
        [sys.executable] + args, capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"}, timeout=120,
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "usage" in out.stdout.lower()
