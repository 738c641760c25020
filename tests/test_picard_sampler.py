"""Parallel-in-time Picard ODE sampler: fixed point == sequential trajectory."""
import jax
import numpy as np

from dfmdock_tpu.config import DFMDockConfig, SamplerConfig, SO3Config
from dfmdock_tpu.data import pad_complex
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.sampler import EMSampler, PicardSampler
from dfmdock_tpu.sampler.em import randomize_pose

from tests.test_sampler_metrics import SMALL, SO3_TEST, make_complex, to_jnp

T = 6


def _setup(num_iters):
    cfg = DFMDockConfig(
        model=SMALL,
        sampler=SamplerConfig(num_steps=T, ode=True, init_tr_sigma=4.0),
    )
    net = ScoreNet(cfg.model)
    params = net.init(jax.random.PRNGKey(0))
    r3 = R3Diffuser(cfg.diffuser.r3)
    so3 = SO3Diffuser(SO3_TEST)
    em = EMSampler(net, r3, so3, cfg.sampler)
    pc = PicardSampler(net, r3, so3, cfg.sampler, num_iters=num_iters)
    return params, em, pc, cfg.sampler


def test_picard_converges_to_sequential_ode():
    raw = make_complex(seed=31)
    batch = to_jnp(pad_complex(*raw))
    params, em, pc, cfg = _setup(num_iters=T)  # T iterations always suffice
    key = jax.random.PRNGKey(7)

    init = randomize_pose(
        jax.random.fold_in(key, 0), batch["pos"], batch["lig_mask"],
        batch["node_mask"], cfg,
    )
    # same k_loop derivation: both samplers split(key) -> (k_init, k_loop)
    a = jax.jit(lambda: em.sample_one(params, batch, key, init=init))()
    b = jax.jit(lambda: pc.sample_one(params, batch, key, init=init))()

    v = np.asarray(batch["node_mask"]).astype(bool)
    np.testing.assert_allclose(
        np.asarray(b["pos"])[v], np.asarray(a["pos"])[v], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        float(b["energy"]), float(a["energy"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b["tr_update"]), np.asarray(a["tr_update"]), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(b["rot_update"]), np.asarray(a["rot_update"]), rtol=1e-3, atol=1e-4
    )


def test_picard_partial_iterations_improve():
    """Error vs the sequential solution must shrink with more iterations."""
    raw = make_complex(seed=32)
    batch = to_jnp(pad_complex(*raw))
    key = jax.random.PRNGKey(9)
    params, em, _, cfg = _setup(num_iters=1)
    init = randomize_pose(
        jax.random.fold_in(key, 1), batch["pos"], batch["lig_mask"],
        batch["node_mask"], cfg,
    )
    ref = np.asarray(jax.jit(lambda: em.sample_one(params, batch, key, init=init))()["pos"])
    v = np.asarray(batch["node_mask"]).astype(bool)

    errs = []
    for k_it in (1, 3, T):
        _, _, pc, _ = _setup(num_iters=k_it)
        got = np.asarray(jax.jit(lambda pc=pc: pc.sample_one(params, batch, key, init=init))()["pos"])
        errs.append(np.abs(got[v] - ref[v]).max())
    assert errs[2] <= errs[1] <= errs[0] + 1e-6, errs
    assert errs[2] < 1e-3
