"""Heun (2nd-order probability-flow ODE) integrator for the EM sampler."""
import jax
import jax.numpy as jnp
import numpy as np

from dfmdock_tpu.config import (
    DFMDockConfig,
    ModelConfig,
    SamplerConfig,
    SO3Config,
)
from dfmdock_tpu.data import pad_complex
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.sampler import EMSampler

from tests.test_sampler_metrics import SMALL, SO3_TEST, make_complex, to_jnp



def _setup(num_steps, integrator):
    cfg = DFMDockConfig(
        model=SMALL,
        sampler=SamplerConfig(
            num_steps=num_steps, ode=True, integrator=integrator, init_tr_sigma=5.0
        ),
    )
    net = ScoreNet(cfg.model)
    r3 = R3Diffuser(cfg.diffuser.r3)
    so3 = SO3Diffuser(SO3_TEST)
    return net, EMSampler(net, r3, so3, cfg.sampler)


def test_heun_runs_and_differs_from_em():
    raw = make_complex(seed=11)
    batch = to_jnp(pad_complex(*raw))
    net, em = _setup(8, "em")
    params = net.init(jax.random.PRNGKey(0))
    _, heun = _setup(8, "heun")

    key = jax.random.PRNGKey(5)
    a = jax.jit(lambda: em.sample_one(params, batch, key))()
    b = jax.jit(lambda: heun.sample_one(params, batch, key))()
    pa, pb = np.asarray(a["pos"]), np.asarray(b["pos"])
    assert np.isfinite(pb).all()
    # same init (same key), different integration path
    assert np.abs(pa - pb).max() > 1e-4


def test_heun_converges_to_em_ode_solution():
    """Both integrators discretize the SAME probability-flow ODE: with the
    identical initial pose, fine-step EM and coarse-step Heun must land near
    the same terminal pose (Heun's 2nd-order accuracy is the point)."""
    raw = make_complex(seed=12)
    batch = to_jnp(pad_complex(*raw))
    net, _ = _setup(8, "em")
    params = net.init(jax.random.PRNGKey(0))

    from dfmdock_tpu.sampler.em import randomize_pose

    cfg = SamplerConfig(ode=True, init_tr_sigma=5.0)
    init = randomize_pose(
        jax.random.PRNGKey(9), batch["pos"], batch["lig_mask"], batch["node_mask"], cfg
    )

    def run(num_steps, integrator):
        _, s = _setup(num_steps, integrator)
        out = jax.jit(
            lambda: s.sample_one(params, batch, jax.random.PRNGKey(1), init=init)
        )()
        return np.asarray(out["pos"])

    fine_em = run(160, "em")        # reference ODE solution
    coarse_em = run(10, "em")
    coarse_heun = run(10, "heun")

    v = np.asarray(batch["node_mask"]).astype(bool)
    err_em = np.abs(coarse_em[v] - fine_em[v]).max()
    err_heun = np.abs(coarse_heun[v] - fine_em[v]).max()
    # Heun at 10 steps must beat Euler at 10 steps against the fine solution
    assert err_heun < err_em, (err_heun, err_em)
    assert np.isfinite(err_heun)
