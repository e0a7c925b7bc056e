"""Analytic scalar test field with exact derivatives via jax.grad.

The numerical-accuracy oracle used by the WLSQ / interpolation tests (parity:
reference `src/utils/utilities.py` `Scalar_Eular_solution` :180-259, which uses
torch.autograd; here jax.grad + vmap give the exact gradient and Hessian).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def scalar_field_fn(phi_0=1.0, phi_x=0.5, phi_y=0.3, phi_xy=0.2,
                    alpha_x=1.5, alpha_y=1.2, alpha_xy=1.0, L=1.0):
    def phi(p):
        x, y = p[0], p[1]
        return (phi_0
                + phi_x * jnp.sin(alpha_x * jnp.pi * x / L)
                + phi_y * jnp.sin(alpha_y * jnp.pi * y / L)
                + phi_xy * jnp.cos(alpha_xy * jnp.pi * x * y / L ** 2))
    return phi


def eval_field(pos: np.ndarray, **kw) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (phi [N,1], grad [N,2], hessian [N,2,2]) exactly."""
    phi = scalar_field_fn(**kw)
    p = jnp.asarray(pos, jnp.float64 if pos.dtype == np.float64 else jnp.float32)
    vals = jax.vmap(phi)(p)
    grads = jax.vmap(jax.grad(phi))(p)
    hess = jax.vmap(jax.hessian(phi))(p)
    return (np.asarray(vals)[:, None], np.asarray(grads), np.asarray(hess))
