"""R^3 translation VE-SDE diffuser (geometric sigma schedule), jit-native.

Mirrors reference src/utils/r3_diffuser.py:15-55; all methods are pure jnp
functions of traced inputs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dfmdock_tpu.config import R3Config


class R3Diffuser:
    def __init__(self, conf: R3Config):
        self.min_sigma = conf.min_sigma
        self.max_sigma = conf.max_sigma

    def sigma(self, t):
        return self.min_sigma * (self.max_sigma / self.min_sigma) ** t

    def diffusion_coef(self, t):
        return self.sigma(t) * jnp.sqrt(
            2 * (jnp.log(self.max_sigma) - jnp.log(self.min_sigma))
        )

    def score(self, tr_t, t):
        return -tr_t / self.sigma(t) ** 2

    def score_scaling(self, t):
        return 1.0 / self.sigma(t)

    def forward_marginal(self, key: jax.Array, t):
        """Sample tr_t ~ N(0, sigma(t)^2 I) and its score. Returns ([1,3], [1,3])."""
        z = jax.random.normal(key, (1, 3))
        tr_t = self.sigma(t) * z
        return tr_t, self.score(tr_t, t)

    def reverse_step(self, key, score_t, t, dt, noise_scale=1.0, ode: bool = False):
        """One reverse Euler-Maruyama step; returns the translation update."""
        g = self.diffusion_coef(t)
        if ode:
            return 0.5 * g**2 * score_t * dt
        z = noise_scale * jax.random.normal(key, score_t.shape)
        return g**2 * score_t * dt + g * jnp.sqrt(dt) * z
