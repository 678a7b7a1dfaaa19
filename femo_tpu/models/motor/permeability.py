"""Nonlinear B-H relative-permeability law: piecewise linear / cubic / exp.

Capability parity with the reference's curve-fit pipeline
(/root/reference/examples/em_motor_opt/permeability/
piecewise_permeability.py:26-94): a material (B, mu_r) table is fitted with a
linear low-field portion and an exponential-decay saturated tail, joined by a
C^1 cubic blend solved from a 4x4 continuity system.  Evaluation is a nested
`jnp.where` — the `ufl.conditional` chain of motor_pde.py:16-26, traced.

The reference reads a proprietary material .tab file; here the default data
is generated from a standard analytic soft-iron saturation law, so the
framework is self-contained.  Any user table plugs into the same fit.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def default_silicon_steel(n: int = 40):
    """Synthetic (B [T], mu_r) samples resembling silicon core iron:
    initial mu_r ~ 3000 rising slightly, saturating toward mu_r -> 1."""
    B = np.linspace(0.05, 2.6, n)
    mu = 1.0 + 3500.0 / (1.0 + (B / 1.45) ** 9) + 300.0 * B / (1 + B**2)
    return B, mu


class PiecewiseBHCurve:
    """mu_r(|B|), piecewise: linear (B < x1), cubic (x1..x2), exp (B > x2)."""

    def __init__(self, B_data=None, mu_data=None, x1: float = 0.8,
                 x2: float = 1.4):
        if B_data is None:
            B_data, mu_data = default_silicon_steel()
        B_data = np.asarray(B_data, float)
        mu_data = np.asarray(mu_data, float)
        self.x1, self.x2 = x1, x2

        # linear fit on the low-field region
        lin = B_data < x1
        A = np.stack([B_data[lin], np.ones(lin.sum())], axis=1)
        self.lin_a, self.lin_b = np.linalg.lstsq(A, mu_data[lin], rcond=None)[0]

        # exponential-decay fit mu = a*exp(b*B + c) + 1 on the saturated tail
        tail = B_data > x2
        Bt, mt = B_data[tail], mu_data[tail]
        # log-linearize: log(mu - 1) = log(a) + c + b*B
        y = np.log(np.maximum(mt - 1.0, 1e-12))
        A2 = np.stack([Bt, np.ones(len(Bt))], axis=1)
        b_, logac = np.linalg.lstsq(A2, y, rcond=None)[0]
        self.exp_a, self.exp_b, self.exp_c = np.exp(logac), b_, 0.0

        # C^1 cubic blend between x1 and x2 (reference 4x4 system :61-69)
        f1 = self.lin_a * x1 + self.lin_b
        d1 = self.lin_a
        f2 = self._exp(x2)
        d2 = (f2 - 1.0) * self.exp_b
        M = np.array([
            [3 * x1**2, 2 * x1, 1, 0],
            [3 * x2**2, 2 * x2, 1, 0],
            [x1**3, x1**2, x1, 1],
            [x2**3, x2**2, x2, 1],
        ])
        self.cubic = np.linalg.solve(M, np.array([d1, d2, f1, f2]))

    def _exp(self, B):
        return self.exp_a * np.exp(self.exp_b * B + self.exp_c) + 1.0

    def __call__(self, B):
        """mu_r at |B| (jnp-traceable)."""
        c = self.cubic
        lin = self.lin_a * B + self.lin_b
        cub = c[0] * B**3 + c[1] * B**2 + c[2] * B + c[3]
        expd = self.exp_a * jnp.exp(self.exp_b * B + self.exp_c) + 1.0
        return jnp.where(B < self.x1, lin,
                         jnp.where(B < self.x2, cub, expd))

    def exp_coeff(self):
        """extractexpDecayCoeff parity."""
        return self.exp_a, self.exp_b, self.exp_c

    def cubic_bounds(self):
        """extractCubicBounds parity."""
        return self.x1, self.x2
