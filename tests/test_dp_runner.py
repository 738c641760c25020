"""CLI-level pose-parallel runner (cli/common.make_runner --dp path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfmdock_tpu.cli.common import make_runner
from dfmdock_tpu.config import DFMDockConfig, SamplerConfig, SO3Config
from dfmdock_tpu.data import pad_complex
from dfmdock_tpu.diffusion import R3Diffuser, SO3Diffuser
from dfmdock_tpu.models import ScoreNet
from dfmdock_tpu.sampler import EMSampler

from tests.test_sampler_metrics import SMALL, SO3_TEST, make_complex, to_jnp



def _sampler():
    # ONE reverse step: with more, f32-level differences between the sharded
    # and single-device executables compound chaotically through the
    # axis-angle composition and the comparison below becomes meaningless
    cfg = DFMDockConfig(
        model=SMALL, sampler=SamplerConfig(num_steps=1, init_tr_sigma=5.0)
    )
    net = ScoreNet(cfg.model)
    params = net.init(jax.random.PRNGKey(0))
    return EMSampler(net, R3Diffuser(cfg.diffuser.r3), SO3Diffuser(SO3_TEST), cfg.sampler), params


def test_dp_runner_matches_single_device():
    """Same key -> same per-pose PRNG streams: the dp-sharded runner must
    reproduce the single-device vmap results exactly (the conftest provides
    an 8-virtual-device CPU mesh)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >1 device")
    sampler, params = _sampler()
    batch = to_jnp(pad_complex(*make_complex(seed=21)))
    key = jax.random.PRNGKey(3)
    p = 8

    ref = sampler.sample_jit(params, batch, key, p)
    dp = make_runner(sampler, p, dp=True)(params, batch, key)

    # sharded compilation reassociates reductions slightly differently from
    # the single-device executable — agreement is close-but-not-bit-exact
    for k in ["energy", "tr_update", "rot_update"]:
        np.testing.assert_allclose(
            np.asarray(dp[k]), np.asarray(ref[k]), rtol=2e-2, atol=1e-4
        )
    np.testing.assert_allclose(
        np.asarray(dp["pos"]), np.asarray(ref["pos"]), rtol=2e-2, atol=2e-2
    )
    # the pose axis really is sharded over the mesh
    shard_devs = {s.device for s in dp["energy"].addressable_shards}
    assert len(shard_devs) == min(p, len(jax.devices()))


def test_dp_runner_rejects_indivisible():
    sampler, _ = _sampler()
    if len(jax.devices()) < 2:
        pytest.skip("needs >1 device")
    with pytest.raises(AssertionError, match="divisible"):
        make_runner(sampler, num_samples=3, dp=True)
