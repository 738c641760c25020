"""End-to-end coverage of sampler option combinations the other tests skip:
noise annealing (inference_mlsb's annealed noise scales), in-loop clash
force, and their composition with the pinder 'bb' centering convention."""
import dataclasses

import jax
import numpy as np

from dfmdock_tpu.config import DFMDockConfig, SamplerConfig
from dfmdock_tpu.data import pad_complex
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.sampler import EMSampler
from dfmdock_tpu.sampler.em import randomize_pose

from tests.test_sampler_metrics import SMALL, SO3_TEST, make_complex, to_jnp

BASE = SamplerConfig(num_steps=4, init_tr_sigma=4.0)


def _run(cfg, seed=3):
    full = DFMDockConfig(model=SMALL, sampler=cfg)
    net = ScoreNet(full.model)
    params = net.init(jax.random.PRNGKey(0))
    r3 = R3Diffuser(full.diffuser.r3)
    so3 = SO3Diffuser(SO3_TEST)
    s = EMSampler(net, r3, so3, cfg)
    batch = to_jnp(pad_complex(*make_complex(seed=41)))
    init = randomize_pose(
        jax.random.PRNGKey(seed), batch["pos"], batch["lig_mask"],
        batch["node_mask"], cfg,
    )
    out = jax.jit(
        lambda: s.sample_one(params, batch, jax.random.PRNGKey(seed + 1), init=init)
    )()
    return {k: np.asarray(v) for k, v in out.items()}, batch


def test_noise_annealing_changes_path_and_stays_finite():
    a, batch = _run(BASE)
    b, _ = _run(dataclasses.replace(BASE, noise_annealing=True))
    v = np.asarray(batch["node_mask"]).astype(bool)
    assert np.isfinite(b["pos"]).all()
    # annealed noise scales (= t) differ from the fixed 0.5 schedule
    assert np.abs(a["pos"][v] - b["pos"][v]).max() > 1e-3


def test_clash_force_in_loop():
    a, batch = _run(BASE)
    c, _ = _run(dataclasses.replace(BASE, use_clash_force=True, center_mode="bb"))
    v = np.asarray(batch["node_mask"]).astype(bool)
    assert np.isfinite(c["pos"]).all()
    assert np.isfinite(c["energy"]).all()
    # the clash nudge + bb centering produce a different trajectory
    assert np.abs(a["pos"][v] - c["pos"][v]).max() > 1e-3
    # receptor rows are never moved by the sampler
    rec = v & ~(np.asarray(batch["lig_mask"]) > 0)
    np.testing.assert_array_equal(
        c["pos"][rec], np.asarray(batch["pos"])[rec]
    )
