"""Analytic depth-from-defocus (DfD) solver.

Converts a pair of blur levels (eta1 from aperture rho_1, eta2 from rho_2) at
a boundary into metric depth via a closed form, after projecting the estimate
onto the valid DfD curve through three half-plane conditions in (eta1, eta2)
space. Parity target: reference utils/depth_etas.py:3-37.

Pure jnp, elementwise over arbitrary shapes; all constants are baked at
construction so the solver is a hashable static closure for jit.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from ..config import CamConfig, PatchConfig


@dataclasses.dataclass(frozen=True)
class DfDSolver:
    """Closed-form DfD constants (reference utils/depth_etas.py:4-21).

    numerator / denominator relate (eta1^2 - eta2^2), normalized by
    norm_factor = R // 2 pixels per unit patch coordinate.
    """

    numerator: float
    denominator_constant: float
    denominator_factor_root: float
    intercept: float
    s: float

    theta_mid: float = 3.0 / 4.0 * math.pi
    theta_wng: float = 1.0 / 4.0 * math.pi

    @classmethod
    def from_config(cls, cam: CamConfig, patch: PatchConfig) -> "DfDSolver":
        norm_factor = patch.R // 2
        numerator = 2.0 * cam.s**2 * (cam.rho_2 - cam.rho_1)
        denominator_constant = -cam.s * (cam.rho_1 - cam.rho_2) * (cam.rho_1 * cam.s + cam.rho_2 * cam.s - 2.0)
        denominator_factor_root = norm_factor * cam.pixel_pitch * patch.mag / cam.sigma_cam
        intercept = abs(cam.s * (cam.rho_2 - cam.rho_1)) * cam.sigma_cam / cam.pixel_pitch / patch.mag / norm_factor
        return cls(numerator=numerator,
                   denominator_constant=denominator_constant,
                   denominator_factor_root=denominator_factor_root,
                   intercept=intercept,
                   s=cam.s)

    @property
    def denominator_factor(self) -> float:
        return self.denominator_factor_root**2

    def etas2depth(self, eta1, eta2):
        """Project (eta1, eta2) onto the valid DfD curve, then invert to metric
        depth (reference utils/depth_etas.py:23-34). Elementwise."""
        b = self.intercept
        sw, cw = math.sin(self.theta_wng), math.cos(self.theta_wng)
        sm, cm = math.sin(self.theta_mid), math.cos(self.theta_mid)
        cond1 = -sw * eta1 + cw * (eta2 - b)
        cond2 = -sm * (eta1 - b) + cm * eta2
        cond3 = -sw * (eta1 - b) + cw * eta2
        eta11 = jnp.where(cond1 > 0, (eta1 + eta2 - b) / 2,
                          jnp.where(cond2 > 0, b + (eta1 - eta2 - b) / 2,
                                    jnp.where(cond3 < 0, b + (eta1 + eta2 - b) / 2, eta1)))
        eta22 = jnp.where(cond1 > 0, b + (eta1 + eta2 - b) / 2,
                          jnp.where(cond2 > 0, (eta2 - eta1 + b) / 2,
                                    jnp.where(cond3 < 0, (eta1 + eta2 - b) / 2, eta2)))
        return self.numerator / (self.denominator_factor * (eta11**2 - eta22**2) + self.denominator_constant)

    def depth2sigma(self, depth, rho_prime):
        """Inverse map: blur level (patch-normalized) at depth ``depth`` for an
        equivalent optical power rho_prime, used for refocus rendering
        (reference utils/depth_etas.py:36-37)."""
        return jnp.abs((1.0 / depth - rho_prime) * self.s + 1.0) / self.denominator_factor_root
