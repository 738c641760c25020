"""Golden tests for the R3 / SO3 VE-SDE diffusers against direct numpy math."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfmdock_tpu.config import R3Config, SO3Config
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.diffusion.igso3 import igso3_expansion, marginal_density

# small-but-faithful table config for fast tests
SO3_TEST = SO3Config(
    num_omega=300, num_sigma=100, expansion_L=400, cache_dir="/tmp/igso3_test_cache"
)


@pytest.fixture(scope="module")
def so3():
    return SO3Diffuser(SO3_TEST)


@pytest.fixture(scope="module")
def r3():
    return R3Diffuser(R3Config())


# ----------------------------------------------------------------------------
# R3


def test_r3_formulas(r3):
    t = 0.37
    sig = 0.1 * (30.0 / 0.1) ** t
    assert np.isclose(float(r3.sigma(t)), sig, rtol=1e-6)
    g = sig * np.sqrt(2 * np.log(30.0 / 0.1))
    assert np.isclose(float(r3.diffusion_coef(t)), g, rtol=1e-6)
    x = jnp.array([1.0, -2.0, 0.5])
    np.testing.assert_allclose(
        np.asarray(r3.score(x, t)), -np.asarray(x) / sig**2, rtol=1e-5
    )
    assert np.isclose(float(r3.score_scaling(t)), 1 / sig, rtol=1e-6)


def test_r3_forward_marginal_stats(r3):
    t = 0.8
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    trs, scores = jax.vmap(lambda k: r3.forward_marginal(k, t))(keys)
    sig = float(r3.sigma(t))
    emp = np.asarray(trs).std()
    assert abs(emp - sig) / sig < 0.05
    # score = -x / sigma^2 exactly
    np.testing.assert_allclose(
        np.asarray(scores), -np.asarray(trs) / sig**2, rtol=1e-4
    )


def test_r3_reverse_step_ode(r3):
    t, dt = 0.5, 0.025
    score = jnp.array([[1.0, 2.0, 3.0]])
    ode = r3.reverse_step(jax.random.PRNGKey(0), score, t, dt, ode=True)
    g = float(r3.diffusion_coef(t))
    np.testing.assert_allclose(np.asarray(ode), 0.5 * g**2 * np.asarray(score) * dt, rtol=1e-5)
    # noise_scale=0 reduces the SDE step to the deterministic drift
    sde0 = r3.reverse_step(jax.random.PRNGKey(0), score, t, dt, noise_scale=0.0)
    np.testing.assert_allclose(np.asarray(sde0), 2 * np.asarray(ode), rtol=1e-5)


# ----------------------------------------------------------------------------
# SO3


def test_so3_sigma_schedule(so3):
    # logarithmic schedule endpoints and monotonicity
    assert np.isclose(float(so3.sigma(0.0)), SO3_TEST.min_sigma, atol=1e-5)
    assert np.isclose(float(so3.sigma(1.0)), SO3_TEST.max_sigma, atol=1e-5)
    ts = jnp.linspace(0, 1, 50)
    sigs = np.asarray(so3.sigma(ts))
    assert (np.diff(sigs) > 0).all()
    # direct formula
    t = 0.3
    expected = np.log(t * np.e**1.5 + (1 - t) * np.e**0.1)
    assert np.isclose(float(so3.sigma(t)), expected, rtol=1e-5)


def test_so3_diffusion_coef(so3):
    t = 0.45
    sig = float(so3.sigma(t))
    expected = np.sqrt(2 * (np.e**1.5 - np.e**0.1) * sig / np.e**sig)
    assert np.isclose(float(so3.diffusion_coef(t)), expected, rtol=1e-5)


def test_so3_cdf_properties(so3):
    cdf = np.asarray(so3.cdf)
    assert (np.diff(cdf, axis=-1) >= -1e-9).all()
    # cdf[-1] ~ integral of the marginal density over (0, pi] ~ 1
    np.testing.assert_allclose(cdf[:, -1], 1.0, atol=0.02)


def test_so3_score_matches_numerical_gradient(so3):
    # score factor should equal d/dw log f(w; sigma) (up to the +1e-4 regularizer)
    t = 0.5
    idx = int(so3.t_to_idx(t))
    sigma = float(np.asarray(so3.discrete_sigma)[idx])
    omegas = np.linspace(0.3, 2.8, 7)
    h = 1e-5
    f = lambda w: igso3_expansion(np.asarray(w), np.full_like(np.asarray(w), sigma), L=SO3_TEST.expansion_L)
    num_grad = (np.log(f(omegas + h)) - np.log(f(omegas - h))) / (2 * h)
    vecs = jnp.asarray(np.stack([omegas, np.zeros_like(omegas), np.zeros_like(omegas)], -1))
    score = np.asarray(so3.score(vecs, t))
    np.testing.assert_allclose(score[:, 0], num_grad, rtol=5e-3, atol=1e-3)
    # the score is parallel to the input rotation vector
    np.testing.assert_allclose(score[:, 1:], 0.0, atol=1e-6)


def test_so3_cached_vs_live_score(so3):
    cached = SO3Diffuser(dataclasses.replace(SO3_TEST, use_cached_score=True))
    t = 0.7
    # keep |vec| < pi: outside the table's omega range the cached lookup clamps
    # to the last bin while the live series extrapolates (reference behaves the
    # same way; angles beyond pi are out-of-distribution for IGSO3)
    vecs = jax.random.normal(jax.random.PRNGKey(3), (16, 3)) * 0.5
    live = np.asarray(so3.score(vecs, t))
    look = np.asarray(cached.score(vecs, t))
    # table lookup quantizes omega; agreement is approximate
    np.testing.assert_allclose(look, live, rtol=0.05, atol=0.05)


def test_so3_sampling_matches_density(so3):
    t = 0.6
    n = 8000
    samples = np.asarray(so3.sample_igso3(jax.random.PRNGKey(1), t, n_samples=n))
    idx = int(so3.t_to_idx(t))
    pdf = np.asarray(so3.tables.pdf)[idx]
    omega = np.asarray(so3.tables.discrete_omega)
    mean_expected = (omega * pdf).sum() / pdf.sum()
    assert abs(samples.mean() - mean_expected) < 0.05
    assert (samples >= 0).all() and (samples <= np.pi).all()


def test_so3_sample_uniform_axis(so3):
    rots = np.asarray(so3.sample(jax.random.PRNGKey(2), 0.9, n_samples=4000))
    axes = rots / np.linalg.norm(rots, axis=-1, keepdims=True)
    assert np.abs(axes.mean(axis=0)).max() < 0.05


def test_so3_forward_marginal_and_reverse(so3):
    rot_t, score = so3.forward_marginal(jax.random.PRNGKey(4), 0.5)
    assert rot_t.shape == (1, 3) and score.shape == (1, 3)
    # score parallel (or anti-parallel) to rot_t
    cos = float(
        (rot_t * score).sum()
        / (np.linalg.norm(np.asarray(rot_t)) * np.linalg.norm(np.asarray(score)) + 1e-9)
    )
    assert abs(abs(cos) - 1) < 1e-4

    g = float(so3.diffusion_coef(0.5))
    ode = so3.reverse_step(jax.random.PRNGKey(0), score, 0.5, 0.02, ode=True)
    np.testing.assert_allclose(np.asarray(ode), 0.5 * g**2 * np.asarray(score) * 0.02, rtol=1e-5)


def test_so3_score_scaling_positive(so3):
    for t in [1e-3, 0.25, 0.5, 0.75, 1.0]:
        assert float(so3.score_scaling(t)) > 0


def test_so3_usable_under_jit(so3):
    @jax.jit
    def step(key, t):
        rot_t, score = so3.forward_marginal(key, t)
        return so3.reverse_step(key, score, t, 0.025)

    out = step(jax.random.PRNGKey(0), jnp.float32(0.4))
    assert np.isfinite(np.asarray(out)).all()
