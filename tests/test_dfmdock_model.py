"""DFMDockModel wrapper: centering + sampler compatibility."""
import jax
import jax.numpy as jnp
import numpy as np

from dfmdock_tpu.config import ModelConfig, R3Config, SamplerConfig, SO3Config
from dfmdock_tpu.data import pad_complex
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.models.dfmdock import DFMDockModel
from dfmdock_tpu.sampler import EMSampler

SMALL = ModelConfig(
    lm_embed_dim=32, node_dim=24, edge_dim=16, inner_dim=16, depth=2, dropout=0.0
)
SO3_TEST = SO3Config(
    num_omega=300, num_sigma=100, expansion_L=400, cache_dir="/tmp/igso3_test_cache"
)


def make_complex(seed=21):
    RNG = np.random.RandomState(seed)
    rec_ca = np.cumsum(RNG.randn(30, 3) * 2 + [3.8, 0, 0], axis=0)
    lig_ca = np.cumsum(RNG.randn(18, 3) * 2 + [3.8, 0, 0], axis=0) + [10, 5, 0]
    mk = lambda ca: np.stack([ca - [1.4, 0, 0], ca, ca + [1.5, 0, 0]], 1)
    return pad_complex(
        RNG.randn(30, 32).astype(np.float32),
        RNG.randn(18, 32).astype(np.float32),
        mk(rec_ca).astype(np.float32),
        mk(lig_ca).astype(np.float32),
    )


def test_wrapper_translation_invariant():
    model = DFMDockModel(SMALL)
    params = model.init(jax.random.PRNGKey(0))
    b1 = {k: jnp.asarray(v) for k, v in make_complex().items()}
    b1["t"] = jnp.float32(0.5)
    b2 = dict(b1)
    b2["pos"] = b1["pos"] + jnp.array([50.0, -20.0, 5.0])
    key = jax.random.PRNGKey(1)
    o1 = model.apply(params, b1, key, predict=True)
    o2 = model.apply(params, b2, key, predict=True)
    np.testing.assert_allclose(float(o1["energy"]), float(o2["energy"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(o1["tr_score"]), np.asarray(o2["tr_score"]), rtol=1e-3, atol=1e-6
    )


def test_sampler_runs_with_dfmdock_lineage():
    model = DFMDockModel(SMALL)
    params = model.init(jax.random.PRNGKey(0))
    sampler = EMSampler(
        model,
        R3Diffuser(R3Config()),
        SO3Diffuser(SO3_TEST),
        SamplerConfig(num_steps=3, center_mode="bb"),
    )
    batch = {k: jnp.asarray(v) for k, v in make_complex().items()}
    out = sampler.sample(params, batch, jax.random.PRNGKey(2), num_samples=2)
    assert np.isfinite(np.asarray(out["energy"])).all()
    assert out["pos"].shape[0] == 2
