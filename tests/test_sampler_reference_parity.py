"""End-to-end EM-sampler parity vs the reference inference loop.

Runs the reference Euler_Maruyama_sampler (inference_base.py:390-468) and our
EMSampler from the SAME initial pose with ZERO injected noise
(tr/rot_noise_scale=0 makes every reverse step the deterministic drift
g(t)^2 * score * dt), with converted random-init weights, in the
deterministic small-graph regime (n < knn -> full edge set on both sides).

This validates the COMPOSED chain the per-forward parity tests can't:
sigma schedules -> net forward -> SO3/R3 reverse updates -> modify_coords ->
next forward, step for step over all 40 steps (VERDICT.md Missing #2).
"""
import os

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference mount absent")

import jax
import jax.numpy as jnp

from dfmdock_tpu.config import ModelConfig, SamplerConfig, SO3Config, R3Config
from dfmdock_tpu.data import pad_complex
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.features.positional import relpos_onehot
from dfmdock_tpu.geom import axis_angle_to_matrix
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.sampler import EMSampler
from dfmdock_tpu.utils.torch_convert import convert_score_net

from _ref_oracle import install_stubs, ref_score_model

N_REC, N_LIG, FEAT = 10, 6, 32
SMALL = ModelConfig(
    lm_embed_dim=FEAT, node_dim=24, edge_dim=16, inner_dim=16, depth=3,
    dropout=0.0, cut_off=20.0, normalize=True,
)
NUM_STEPS = 40


def _make_inputs(seed=7):
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


class _Recorder:
    """Model wrapper recording each step's input ligand pose (the reference
    sampler mutates batch['lig_pos'] in place between forwards)."""

    def __init__(self, model):
        self.model = model
        self.so3_diffuser = model.so3_diffuser
        self.r3_diffuser = model.r3_diffuser
        self.lig_inputs = []

    def __call__(self, batch):
        self.lig_inputs.append(batch["lig_pos"].detach().numpy().copy())
        return self.model(batch)


def test_em_sampler_trajectory_parity(tmp_path):
    install_stubs()
    import torch
    from models.score_net_mlsb import ModelConfig as RefConfig
    import inference_base as ref_inf

    torch.manual_seed(3)
    ref_cfg = RefConfig(
        lm_embed_dim=FEAT, positional_embed_dim=66, spatial_embed_dim=100,
        contact_embed_dim=1, node_dim=24, edge_dim=16, inner_dim=16, depth=3,
        dropout=0.0, cut_off=20.0, normalize=True,
    )
    model = ref_score_model(ref_cfg, str(tmp_path / "igso3_ref")).eval()

    rec_x, lig_x, rec_pos, lig_pos = _make_inputs()
    n = N_REC + N_LIG
    res_id = np.arange(n)
    asym = np.zeros(n, np.int32)
    asym[N_REC:] = 1
    pm = np.asarray(relpos_onehot(jnp.asarray(res_id), jnp.asarray(asym)))

    # --- capture the reference's randomized initial pose, then re-seed so the
    # sampler reproduces it internally (randomize_pose draws from the global
    # numpy RNG via scipy Rotation.random and from torch's global RNG)
    def seed():
        np.random.seed(11)
        torch.manual_seed(11)

    seed()
    lig_pos0_t, tr0_t, rot0_t = ref_inf.randomize_pose(
        torch.from_numpy(rec_pos.copy()), torch.from_numpy(lig_pos.copy())
    )

    batch_t = {
        "rec_x": torch.from_numpy(rec_x),
        "lig_x": torch.from_numpy(lig_x),
        "rec_pos": torch.from_numpy(rec_pos.copy()),
        "lig_pos": torch.from_numpy(lig_pos.copy()),
        "position_matrix": torch.from_numpy(pm),
    }
    recorder = _Recorder(model)
    seed()
    with torch.no_grad():
        _, ref_final_lig, ref_rot_u, ref_tr_u, ref_out = (
            ref_inf.Euler_Maruyama_sampler(
                recorder, batch_t, num_steps=NUM_STEPS,
                tr_noise_scale=0.0, rot_noise_scale=0.0,
            )
        )
    # recorder.lig_inputs[0] is the initial pose; verify the re-seed worked
    np.testing.assert_allclose(
        recorder.lig_inputs[0], lig_pos0_t.numpy(), rtol=0, atol=0
    )

    # --- our sampler from the injected identical initial pose
    params = jax.tree_util.tree_map(
        jnp.asarray,
        convert_score_net(
            {k: v.numpy() for k, v in model.net.state_dict().items()}, depth=3
        ),
    )
    net = ScoreNet(SMALL)
    r3 = R3Diffuser(R3Config())
    so3 = SO3Diffuser(SO3Config(num_omega=100, num_sigma=50, expansion_L=200))
    cfg = SamplerConfig(
        num_steps=NUM_STEPS, tr_noise_scale=0.0, rot_noise_scale=0.0,
        center_mode="ca",
    )
    sampler = EMSampler(net, r3, so3, cfg)

    b = {
        k: jnp.asarray(v)
        for k, v in pad_complex(rec_x, lig_x, rec_pos, lig_pos).items()
    }
    pos0 = np.asarray(b["pos"]).copy()  # keep padding rows
    pos0[: N_REC + N_LIG] = np.concatenate([rec_pos, lig_pos0_t.numpy()], 0)
    init = (
        jnp.asarray(pos0),
        jnp.asarray(tr0_t.numpy()),
        jnp.asarray(rot0_t.numpy()),
    )
    res = sampler.sample_one(
        params, b, jax.random.PRNGKey(0), record_trajectory=True, init=init
    )

    lig_rows = slice(N_REC, N_REC + N_LIG)
    traj = np.asarray(res["trajectory"])[:, lig_rows]  # pos AFTER each step

    # reference lig_inputs[i+1] = pose after step i (the last entry is the
    # final re-evaluation forward at the terminal pose)
    ref_after = np.stack(recorder.lig_inputs[1:], 0)
    assert ref_after.shape[0] == NUM_STEPS
    scale = np.abs(ref_after).max()
    for i in range(NUM_STEPS):
        np.testing.assert_allclose(
            traj[i], ref_after[i], atol=2e-3 * scale,
            err_msg=f"ligand pose diverged at step {i}",
        )

    np.testing.assert_allclose(
        np.asarray(res["pos"])[lig_rows], ref_final_lig.numpy(),
        atol=2e-3 * scale,
    )
    np.testing.assert_allclose(
        np.asarray(res["tr_update"]), ref_tr_u.numpy(), atol=2e-3 * scale
    )
    # compare accumulated rotations as matrices (axis-angle has branch cuts)
    np.testing.assert_allclose(
        np.asarray(axis_angle_to_matrix(jnp.asarray(res["rot_update"][0]))),
        np.asarray(
            axis_angle_to_matrix(jnp.asarray(ref_rot_u.numpy().reshape(3)))
        ),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        float(res["energy"]), float(ref_out["energy"]), rtol=5e-3, atol=1e-4
    )


def test_em_sampler_ode_parity_mlsb_variant(tmp_path):
    """ODE-mode (probability-flow, 0.5*g^2*score*dt drift) trajectory parity
    vs the reference inference_mlsb sweep sampler (inference_mlsb.py:264-350),
    including its randomize_pose convention that recenters BOTH chains
    (:352-379: receptor to the origin, ligand to origin + rot + tr)."""
    install_stubs()
    import types

    import torch
    from models.score_net_mlsb import ModelConfig as RefConfig
    import inference_mlsb as ref_mlsb

    torch.manual_seed(5)
    ref_cfg = RefConfig(
        lm_embed_dim=FEAT, positional_embed_dim=66, spatial_embed_dim=100,
        contact_embed_dim=1, node_dim=24, edge_dim=16, inner_dim=16, depth=3,
        dropout=0.0, cut_off=20.0, normalize=True,
    )
    model = ref_score_model(ref_cfg, str(tmp_path / "igso3_ref")).eval()

    num_steps = 20
    shim = types.SimpleNamespace(
        model=model,
        device=torch.device("cpu"),
        data_conf=types.SimpleNamespace(
            num_steps=num_steps, tr_noise_scale=0.0, rot_noise_scale=0.0,
            use_clash_force=False,
        ),
        perturb_tr=True,
        perturb_rot=True,
    )
    shim.modify_coords = lambda x, rot, tr: ref_mlsb.Sampler.modify_coords(
        shim, x, rot, tr
    )
    shim.randomize_pose = lambda x1, x2: ref_mlsb.Sampler.randomize_pose(
        shim, x1, x2
    )

    rec_x, lig_x, rec_pos, lig_pos = _make_inputs(seed=13)
    n = N_REC + N_LIG
    res_id = np.arange(n)
    asym = np.zeros(n, np.int32)
    asym[N_REC:] = 1
    pm = np.asarray(relpos_onehot(jnp.asarray(res_id), jnp.asarray(asym)))

    def seed():
        np.random.seed(17)
        torch.manual_seed(17)

    seed()
    rec0_t, lig0_t, rot0_t, tr0_t = shim.randomize_pose(
        torch.from_numpy(rec_pos.copy()), torch.from_numpy(lig_pos.copy())
    )

    batch_t = {
        "rec_x": torch.from_numpy(rec_x),
        "lig_x": torch.from_numpy(lig_x),
        "rec_pos": torch.from_numpy(rec_pos.copy()),
        "lig_pos": torch.from_numpy(lig_pos.copy()),
        "position_matrix": torch.from_numpy(pm.copy()),
    }
    seed()
    with torch.no_grad():
        rec_trj, lig_trj, ref_energy, ref_clashes = (
            ref_mlsb.Sampler.Euler_Maruyama_sampler(shim, batch_t, ode=True)
        )
    np.testing.assert_allclose(lig_trj[0].numpy(), lig0_t.numpy(), atol=0)

    params = jax.tree_util.tree_map(
        jnp.asarray,
        convert_score_net(
            {k: v.numpy() for k, v in model.net.state_dict().items()}, depth=3
        ),
    )
    net = ScoreNet(SMALL)
    r3 = R3Diffuser(R3Config())
    so3 = SO3Diffuser(SO3Config(num_omega=100, num_sigma=50, expansion_L=200))
    cfg = SamplerConfig(num_steps=num_steps, ode=True, center_mode="ca")
    sampler = EMSampler(net, r3, so3, cfg)

    b = {
        k: jnp.asarray(v)
        for k, v in pad_complex(rec_x, lig_x, rec_pos, lig_pos).items()
    }
    pos0 = np.asarray(b["pos"]).copy()
    pos0[:N_REC] = rec0_t.numpy()
    pos0[N_REC : N_REC + N_LIG] = lig0_t.numpy()
    init = (
        jnp.asarray(pos0),
        jnp.asarray(tr0_t.numpy()),
        jnp.asarray(rot0_t.numpy()),
    )
    res = sampler.sample_one(
        params, b, jax.random.PRNGKey(0), record_trajectory=True, init=init
    )

    lig_rows = slice(N_REC, N_REC + N_LIG)
    traj = np.asarray(res["trajectory"])[:, lig_rows]
    ref_after = np.stack([x.numpy() for x in lig_trj[1:]], 0)
    assert ref_after.shape[0] == num_steps
    scale = np.abs(ref_after).max()
    for i in range(num_steps):
        np.testing.assert_allclose(
            traj[i], ref_after[i], atol=2e-3 * scale,
            err_msg=f"ODE ligand pose diverged at step {i}",
        )
    np.testing.assert_allclose(
        float(res["energy"]), float(ref_energy), rtol=5e-3, atol=1e-4
    )
    assert int(res["num_clashes"]) == int(ref_clashes)
