"""IGSO(3) density tables: truncated-series pdf / cdf / score norms.

The isotropic Gaussian on SO(3) with concentration eps has marginal density
over the rotation angle omega (Leach et al. 2022, eq. 5; reparameterized so
eps = sqrt(2) * eps_leach, matching Brownian motion with t = eps^2):

    f(w; eps) = sum_{l=0}^{L} (2l+1) exp(-l(l+1) eps^2/2) sin(w(l+1/2)) / sin(w/2)
    p(w)      = f(w) (1 - cos w) / pi          (marginal over angle)
    score(w)  = d/dw log f(w)                   (via quotient rule)

Semantics mirror reference src/utils/so3_diffuser.py:28-134 (table build:
:150-198).  Tables are precomputed once in float64 numpy and cached to disk
keyed by the SO3Config, then used on-device as jnp constants.
"""
from __future__ import annotations

import hashlib
import os

import numpy as np

from dfmdock_tpu.config import SO3Config


def igso3_expansion(omega: np.ndarray, eps: np.ndarray, L: int = 1000) -> np.ndarray:
    """Truncated power series f(omega; eps). Shapes broadcast: omega [...],
    eps [...] -> [...]."""
    ls = np.arange(L, dtype=np.float64)
    omega = np.asarray(omega, dtype=np.float64)[..., None]
    eps = np.asarray(eps, dtype=np.float64)[..., None]
    p = (
        (2 * ls + 1)
        * np.exp(-ls * (ls + 1) * eps**2 / 2)
        * np.sin(omega * (ls + 0.5))
        / np.sin(omega / 2)
    )
    return p.sum(axis=-1)


def igso3_score_factor(
    expansion: np.ndarray, omega: np.ndarray, eps: np.ndarray, L: int = 1000
) -> np.ndarray:
    """d/dw log f(w; eps), via the quotient rule on each series term
    (reference so3_diffuser.py:88-134 incl. the +1e-4 regularizer)."""
    ls = np.arange(L, dtype=np.float64)
    omega = np.asarray(omega, dtype=np.float64)[..., None]
    eps = np.asarray(eps, dtype=np.float64)[..., None]
    hi = np.sin(omega * (ls + 0.5))
    dhi = (ls + 0.5) * np.cos(omega * (ls + 0.5))
    lo = np.sin(omega / 2)
    dlo = 0.5 * np.cos(omega / 2)
    dSigma = (
        (2 * ls + 1) * np.exp(-ls * (ls + 1) * eps**2 / 2) * (lo * dhi - hi * dlo) / lo**2
    ).sum(axis=-1)
    return dSigma / (expansion + 1e-4)


def marginal_density(expansion: np.ndarray, omega: np.ndarray) -> np.ndarray:
    """Density over the angle of rotation on [0, pi]."""
    return expansion * (1 - np.cos(omega)) / np.pi


class IGSO3Tables:
    """Precomputed grids over (sigma, omega).

    Attributes (all numpy float64):
      discrete_omega: [num_omega]        angle grid, (0, pi]
      discrete_sigma: [num_sigma]        sigma schedule grid over t in [0, 1]
      pdf:            [num_sigma, num_omega]
      cdf:            [num_sigma, num_omega]
      score_norms:    [num_sigma, num_omega]
      score_scaling:  [num_sigma]        RMS score norm / sqrt(3)
    """

    def __init__(self, conf: SO3Config, discrete_sigma: np.ndarray):
        self.discrete_omega = np.linspace(0, np.pi, conf.num_omega + 1)[1:]
        self.discrete_sigma = np.asarray(discrete_sigma, dtype=np.float64)

        cache_key = hashlib.sha1(
            repr(
                (
                    conf.num_omega,
                    conf.num_sigma,
                    conf.min_sigma,
                    conf.max_sigma,
                    conf.schedule,
                    conf.expansion_L,
                )
            ).encode()
        ).hexdigest()[:16]
        cache_path = os.path.join(conf.cache_dir, f"igso3_{cache_key}.npz")

        if os.path.exists(cache_path):
            with np.load(cache_path) as z:
                self.pdf = z["pdf"]
                self.cdf = z["cdf"]
                self.score_norms = z["score_norms"]
        else:
            self.pdf, self.cdf, self.score_norms = self._build(conf)
            os.makedirs(conf.cache_dir, exist_ok=True)
            tmp = cache_path + ".tmp.npz"
            np.savez(tmp, pdf=self.pdf, cdf=self.cdf, score_norms=self.score_norms)
            os.replace(tmp, cache_path)

        # score_scaling: RMS of score norms under the pdf, per sigma, / sqrt(3)
        # (reference so3_diffuser.py:194-198)
        self.score_scaling = np.sqrt(
            np.abs(
                (self.score_norms**2 * self.pdf).sum(-1) / self.pdf.sum(-1)
            )
        ) / np.sqrt(3)

    def _build(self, conf: SO3Config):
        num_omega = conf.num_omega
        omega = self.discrete_omega
        pdf = np.empty((len(self.discrete_sigma), num_omega))
        score_norms = np.empty_like(pdf)
        # chunk over sigma to bound the [chunk, num_omega, L] f64 intermediate
        chunk = max(1, int(4e8) // (num_omega * conf.expansion_L * 8))
        for s0 in range(0, len(self.discrete_sigma), chunk):
            s1 = min(s0 + chunk, len(self.discrete_sigma))
            sig = self.discrete_sigma[s0:s1, None]  # [c, 1]
            om = omega[None, :]  # [1, num_omega]
            exp_vals = igso3_expansion(
                np.broadcast_to(om, (s1 - s0, num_omega)),
                np.broadcast_to(sig, (s1 - s0, num_omega)),
                L=conf.expansion_L,
            )
            pdf[s0:s1] = marginal_density(exp_vals, om)
            score_norms[s0:s1] = igso3_score_factor(
                exp_vals,
                np.broadcast_to(om, (s1 - s0, num_omega)),
                np.broadcast_to(sig, (s1 - s0, num_omega)),
                L=conf.expansion_L,
            )
        cdf = pdf.cumsum(axis=-1) / num_omega * np.pi
        return pdf, cdf, score_norms
