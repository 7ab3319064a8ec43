"""Observation (noise) models.

Each model exposes the first/second derivative of ln P(y | f) evaluated at
the predictive marginal N(f; m, s2) — the (q, r) scalars that drive the
Csató–Opper sparse update (reference contract: src/gaussian_noise.h:8-9,
src/probit_noise.h:8-9, vector variant src/gaussian_noise_3d.h:11-12; use
site src/sparse_gp.hpp:134-137).

Design: a model is a NamedTuple of parameters plus pure functions
`dx_ln(model, y, m, s2) -> [dout]` and `dx2_ln(model, y, m, s2) -> scalar`.
`y`/`m` are always vectors of length dout (dout=1 for the scalar GP), which
unifies the reference's sparse_gp / sparse_gp_field duplication into one
code path. Closed forms mirror the reference; the tests cross-check them
against autodiff of the log-density.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Union

import jax.numpy as jnp
from jax.scipy.special import erf


class GaussianNoise(NamedTuple):
    """Gaussian observation model (reference: src/gaussian_noise.cpp:9-18 and
    its Dout-output twin src/gaussian_noise_3d.cpp:11-21 — both collapse to
    this single vectorised form)."""

    s20: jnp.ndarray  # noise variance

    def dx_ln(self, y: jnp.ndarray, m: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
        return (y - m) / (self.s20 + s2)

    def dx2_ln(self, y: jnp.ndarray, m: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
        return -1.0 / (self.s20 + s2)


class ProbitNoise(NamedTuple):
    """Probit classification model for binary y in {-1, +1}.

    Reference deviation (intentional): src/probit_noise.cpp:11-31 uses
    erf(z)/(2 sqrt 2) where the probit likelihood needs the normal CDF
    Phi(z) = (1 + erf(z / sqrt 2)) / 2 — the reference's form is zero at
    m = 0 so its very first update divides by zero; the class is linked
    but never instantiated upstream, i.e. it was never executed. Here the
    standard Csató–Opper classification moments are used:
      ln P(y|f) ~ ln Phi(y m / sigma),  sigma = sqrt(s20 + s2)
      dx_ln  = y phi(z) / (sigma Phi(z))
      dx2_ln = -(phi/Phi) (z + phi/Phi) / sigma^2
    with the usual numerically-safe phi/Phi ratio.
    """

    s20: jnp.ndarray

    def _ratio(self, z):
        """phi(z) / Phi(z), stable for very negative z."""
        phi = jnp.exp(-0.5 * z * z) / math.sqrt(2.0 * math.pi)
        Phi = 0.5 * (1.0 + erf(z / math.sqrt(2.0)))
        # asymptotic -z for z << 0 avoids 0/0
        safe = phi / jnp.maximum(Phi, 1e-30)
        return jnp.where(z < -8.0, -z, safe)

    def dx_ln(self, y: jnp.ndarray, m: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
        sigma = jnp.sqrt(self.s20 + s2)
        z = y * m / sigma
        return y / sigma * self._ratio(z)

    def dx2_ln(self, y: jnp.ndarray, m: jnp.ndarray, s2: jnp.ndarray) -> jnp.ndarray:
        sigma2 = self.s20 + s2
        sigma = jnp.sqrt(sigma2)
        z = jnp.sum(y * m) / sigma  # dout == 1 for probit; sum collapses the axis
        ratio = self._ratio(z)
        return -ratio * (z + ratio) / sigma2


NoiseModel = Union[GaussianNoise, ProbitNoise]


def gaussian_log_pdf(y, mu, var):
    """ln N(y; mu, var) — used by likelihood paths and as the autodiff
    ground truth for the closed forms above."""
    return -0.5 * math.log(2.0 * math.pi) - 0.5 * jnp.log(var) - 0.5 * (y - mu) ** 2 / var
