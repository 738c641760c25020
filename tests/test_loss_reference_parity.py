"""Loss-level parity vs the reference training steps (VERDICT.md Missing #3).

Drives the reference loss_fn (score_model_mlsb.py:65-191 / DFMDock.py:77-244)
and our pure-JAX loss functions with IDENTICAL injected (t, tr/rot
perturbation, gt scores, scalings) and converted weights, and asserts every
term matches: tr/rot score-matching (both the plain and axis/angle-decomposed
forms), the energy-conservation term (reference dedx autograd vs our
jax.grad), contrastive energy, interface BCE, confidence BCE, distogram CE.

Injection works by re-seeding the global numpy/torch RNGs and reproducing the
reference's draw sequence on its own diffuser objects (capture_loss_draws),
so the reference loss_fn needs no modification.
"""
import os

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference mount absent")

import jax
import jax.numpy as jnp

from dfmdock_tpu.config import ExperimentConfig, ModelConfig, R3Config, SO3Config
from dfmdock_tpu.data import pad_complex
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.features.positional import relpos_onehot
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.models.egnn_net import EGNNNet
from dfmdock_tpu.train.dfmdock_losses import dfmdock_loss_fn
from dfmdock_tpu.train.losses import interface_labels, loss_fn
from dfmdock_tpu.utils.torch_convert import convert_egnn_net, convert_score_net

from _ref_oracle import (
    capture_loss_draws,
    install_stubs,
    ref_dfmdock_model,
    ref_score_model,
)

N_REC, N_LIG, FEAT = 10, 6, 32
SMALL = ModelConfig(
    lm_embed_dim=FEAT, node_dim=24, edge_dim=16, inner_dim=16, depth=3,
    dropout=0.0, cut_off=20.0, normalize=True,
)


def _make_inputs(seed=21):
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


def _batches(raw, with_ires=False):
    import torch

    rec_x, lig_x, rec_pos, lig_pos = raw
    n = N_REC + N_LIG
    res_id = np.arange(n)
    asym = np.zeros(n, np.int32)
    asym[N_REC:] = 1
    pm = np.asarray(relpos_onehot(jnp.asarray(res_id), jnp.asarray(asym)))

    batch_t = {
        "rec_x": torch.from_numpy(rec_x),
        "lig_x": torch.from_numpy(lig_x),
        "rec_pos": torch.from_numpy(rec_pos.copy()),
        "lig_pos": torch.from_numpy(lig_pos.copy()),
        "position_matrix": torch.from_numpy(pm.copy()),
    }
    b = {
        k: jnp.asarray(v)
        for k, v in pad_complex(rec_x, lig_x, rec_pos, lig_pos).items()
    }
    if with_ires:
        labels = interface_labels(b["pos"], b["lig_mask"], b["node_mask"])
        b["ires"] = labels
        batch_t["ires"] = torch.from_numpy(np.asarray(labels)[:n].copy())
    return batch_t, b


def _assert_terms(ours, ref, keys, rtol=2e-4, atol=1e-6, rtol_overrides=None):
    import torch

    for k in keys:
        r = ref[k]
        r = float(r.detach()) if isinstance(r, torch.Tensor) else float(r)
        np.testing.assert_allclose(
            float(ours[k]), r, rtol=(rtol_overrides or {}).get(k, rtol),
            atol=atol, err_msg=f"term {k}",
        )


MLSB_CASES = {
    # the shipped config (configs/model/score_model_mlsb.yaml:30-41)
    "shipped": dict(),
    # dedx-autograd + axis/angle ec + contrastive: every term nonzero
    "grad_energy": dict(grad_energy=True, separate_energy_loss=True,
                        use_contrastive_loss=True),
    # the non-decomposed branches
    "plain_mse": dict(grad_energy=True, separate_energy_loss=False,
                      separate_tr_loss=False, separate_rot_loss=False),
}


@pytest.mark.parametrize("case", sorted(MLSB_CASES))
def test_mlsb_loss_parity(tmp_path, case):
    install_stubs()
    import torch
    from models.score_net_mlsb import ModelConfig as RefConfig

    overrides = MLSB_CASES[case]
    torch.manual_seed(31)
    ref_cfg = RefConfig(
        lm_embed_dim=FEAT, positional_embed_dim=66, spatial_embed_dim=100,
        contact_embed_dim=1, node_dim=24, edge_dim=16, inner_dim=16, depth=3,
        dropout=0.0, cut_off=20.0, normalize=True,
    )
    model = ref_score_model(
        ref_cfg, str(tmp_path / "igso3_ref"), experiment_overrides=overrides
    )
    model.net.eval()  # dropout=0 anyway; keep both sides deterministic

    raw = _make_inputs()
    batch_t, b = _batches(raw, with_ires=True)

    injected = capture_loss_draws(model, seed=101)
    np.random.seed(101)
    torch.manual_seed(101)
    ref_losses = model.loss_fn(dict(batch_t))

    params = jax.tree_util.tree_map(
        jnp.asarray,
        convert_score_net(
            {k: v.numpy() for k, v in model.net.state_dict().items()}, depth=3
        ),
    )
    net = ScoreNet(SMALL)
    exp = ExperimentConfig(**overrides)
    r3 = R3Diffuser(R3Config())
    so3 = SO3Diffuser(SO3Config(num_omega=100, num_sigma=50, expansion_L=200))
    _, ours = loss_fn(
        params, net, r3, so3, b, jax.random.PRNGKey(0), exp, injected=injected
    )

    _assert_terms(
        ours, ref_losses,
        ["tr_loss", "rot_loss", "ec_loss", "el_loss", "ires_loss", "loss"],
    )


def test_dfmdock_loss_parity(tmp_path):
    """All seven DFMDock terms at once: tr, rot, ec (dedx), contrastive,
    confidence, distogram, ires (DFMDock.py:77-244)."""
    install_stubs()
    import torch
    from models.egnn_net import ModelConfig as RefConfig

    torch.manual_seed(41)
    ref_cfg = RefConfig(
        lm_embed_dim=FEAT, positional_embed_dim=66, spatial_embed_dim=100,
        node_dim=24, edge_dim=16, inner_dim=16, depth=3,
        dropout=0.0, cut_off=20.0, normalize=True, agg="mean",
    )
    model = ref_dfmdock_model(ref_cfg, str(tmp_path / "igso3_ref"))
    model.net.eval()

    raw = _make_inputs(seed=23)
    batch_t, b = _batches(raw)

    injected = capture_loss_draws(model, seed=103)
    np.random.seed(103)
    torch.manual_seed(103)
    ref_losses = model.loss_fn(dict(batch_t))

    params = jax.tree_util.tree_map(
        jnp.asarray,
        convert_egnn_net(
            {k: v.numpy() for k, v in model.net.state_dict().items()}, depth=3
        ),
    )
    net = EGNNNet(SMALL)
    exp = ExperimentConfig(
        grad_energy=True, separate_energy_loss=True, use_contrastive_loss=True,
        use_confidence_loss=True, use_dist_loss=True, use_interface_loss=True,
    )
    r3 = R3Diffuser(R3Config())
    so3 = SO3Diffuser(SO3Config(num_omega=100, num_sigma=50, expansion_L=200))
    _, ours = dfmdock_loss_fn(
        params, net, r3, so3, b, jax.random.PRNGKey(0), exp, injected=injected
    )

    # ec is looser: |dedx| ~ 1e-5 here, so the axis decomposition
    # dedx/(|dedx|+1e-6) amplifies f32 noise (raw dedx agrees to ~4e-9 abs,
    # verified by direct comparison)
    _assert_terms(
        ours, ref_losses,
        ["tr_loss", "rot_loss", "ec_loss", "el_loss", "dist_loss",
         "ires_loss", "conf_loss", "loss"],
        rtol_overrides={"ec_loss": 3e-3},
    )
