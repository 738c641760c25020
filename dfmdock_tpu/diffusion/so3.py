"""SO(3) VE-SDE diffuser (IGSO3), jit-native.

Mirrors the semantics of reference src/utils/so3_diffuser.py:139-369 with a
TPU-first design: every method is a pure jnp function of traced inputs, so the
whole thing lives inside jitted train/sample steps.  Host-side numpy only runs
once, at table-build time (see diffusion.igso3).

Conventions: t in [0, 1]; rotations as axis-angle vectors [..., 3]; scores are
tangent vectors at the identity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dfmdock_tpu.config import SO3Config
from dfmdock_tpu.diffusion.igso3 import IGSO3Tables
from dfmdock_tpu.geom import axis_angle_to_matrix, matrix_to_axis_angle


class SO3Diffuser:
    def __init__(self, conf: SO3Config):
        if conf.schedule != "logarithmic":
            raise ValueError(f"Unrecognized schedule {conf.schedule}")
        self.conf = conf
        self.min_sigma = conf.min_sigma
        self.max_sigma = conf.max_sigma
        self.L = conf.expansion_L

        disc_sigma_np = self._sigma_np(np.linspace(0.0, 1.0, conf.num_sigma))
        self.tables = IGSO3Tables(conf, disc_sigma_np)

        # device constants (f32 is plenty for lookups)
        self.discrete_omega = jnp.asarray(self.tables.discrete_omega, jnp.float32)
        self.discrete_sigma = jnp.asarray(disc_sigma_np, jnp.float32)
        self.cdf = jnp.asarray(self.tables.cdf, jnp.float32)
        self.score_norms = jnp.asarray(self.tables.score_norms, jnp.float32)
        self._score_scaling = jnp.asarray(self.tables.score_scaling, jnp.float32)

    # -- schedule ------------------------------------------------------------

    def _sigma_np(self, t):
        return np.log(t * np.exp(self.max_sigma) + (1 - t) * np.exp(self.min_sigma))

    def sigma(self, t):
        """Logarithmic sigma(t) (reference so3_diffuser.py:210-217)."""
        return jnp.log(
            t * jnp.exp(self.max_sigma) + (1 - t) * jnp.exp(self.min_sigma)
        )

    def diffusion_coef(self, t):
        """g(t) (reference so3_diffuser.py:219-227)."""
        sig = self.sigma(t)
        return jnp.sqrt(
            2 * (jnp.exp(self.max_sigma) - jnp.exp(self.min_sigma)) * sig / jnp.exp(sig)
        )

    def t_to_idx(self, t):
        """Index into the sigma grid (np.digitize(right=False) - 1 semantics,
        reference so3_diffuser.py:206-231)."""
        return (
            jnp.searchsorted(self.discrete_sigma, self.sigma(t), side="right") - 1
        ).clip(0, self.conf.num_sigma - 1)

    # -- sampling ------------------------------------------------------------

    def sample_igso3(self, key: jax.Array, t, n_samples: int = 1):
        """Inverse-CDF sample of the rotation angle (so3_diffuser.py:233-249)."""
        u = jax.random.uniform(key, (n_samples,))
        cdf_row = self.cdf[self.t_to_idx(t)]
        return jnp.interp(u, cdf_row, self.discrete_omega)

    def sample(self, key: jax.Array, t, n_samples: int = 1):
        """Axis-angle samples from IGSO3(t): uniform axis x sampled angle
        (so3_diffuser.py:251-266)."""
        k_axis, k_angle = jax.random.split(key)
        x = jax.random.normal(k_axis, (n_samples, 3))
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x * self.sample_igso3(k_angle, t, n_samples)[:, None]

    # -- score ---------------------------------------------------------------

    def _score_norm_live(self, omega, t):
        """Truncated-series d/dw log f(w; sigma(t)) evaluated on device
        (so3_diffuser.py:28-68, 88-134 with use_torch=True semantics)."""
        sigma = self.discrete_sigma[self.t_to_idx(t)]
        ls = jnp.arange(self.L, dtype=jnp.float32)
        w = omega[..., None]
        e = jnp.broadcast_to(sigma, omega.shape)[..., None]
        pref = (2 * ls + 1) * jnp.exp(-ls * (ls + 1) * e**2 / 2)
        hi = jnp.sin(w * (ls + 0.5))
        lo = jnp.sin(w / 2)
        exp_val = (pref * hi / lo).sum(-1)
        dhi = (ls + 0.5) * jnp.cos(w * (ls + 0.5))
        dlo = 0.5 * jnp.cos(w / 2)
        dSigma = (pref * (lo * dhi - hi * dlo) / lo**2).sum(-1)
        return dSigma / (exp_val + 1e-4)

    def score(self, vec, t, eps: float = 1e-6):
        """Score of IGSO3 as a rotation vector (so3_diffuser.py:289-320).

        vec: [..., 3] axis-angle; t: scalar in [0, 1].
        """
        omega = jnp.linalg.norm(vec, axis=-1) + eps
        if self.conf.use_cached_score:
            idx = self.t_to_idx(t)
            row = self.score_norms[idx]
            # torch.bucketize(omega, discrete_omega[:-1]) == searchsorted(left)
            w_idx = jnp.searchsorted(self.discrete_omega[:-1], omega, side="left")
            norm = row[w_idx]
        else:
            norm = self._score_norm_live(omega, t)
        return norm[..., None] * vec / (omega[..., None] + eps)

    def score_scaling(self, t):
        """RMS score-norm / sqrt(3) used to normalize training losses
        (so3_diffuser.py:322-324)."""
        return self._score_scaling[self.t_to_idx(t)]

    # -- forward / reverse ---------------------------------------------------

    def forward_marginal(self, key: jax.Array, t, rot_0=None):
        """Sample a forward perturbation at time t and its score
        (so3_diffuser.py:326-342).

        Returns (rot_t [1, 3], rot_score [1, 3]).
        """
        sampled = self.sample(key, t, n_samples=1)
        score = self.score(sampled, t)
        if rot_0 is None:
            rot_t = sampled
        else:
            # right-compose: R(rot_0) @ R(sampled)
            rot_t = matrix_to_axis_angle(
                axis_angle_to_matrix(rot_0) @ axis_angle_to_matrix(sampled)
            )
        return rot_t, score

    def reverse_step(self, key, score_t, t, dt, noise_scale=1.0, ode: bool = False):
        """One Euler-Maruyama step of the reverse SDE as a tangent update
        (geodesic random walk; so3_diffuser.py:344-369).

        Returns perturb [..., 3] to compose with the current rotation.
        """
        g = self.diffusion_coef(t)
        if ode:
            return 0.5 * g**2 * score_t * dt
        z = noise_scale * jax.random.normal(key, score_t.shape)
        return g**2 * score_t * dt + g * jnp.sqrt(dt) * z
