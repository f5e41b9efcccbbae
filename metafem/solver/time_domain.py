"""Generalized-alpha time integration + Newton loop.

Mirrors the reference's solver/04_Time_Domain.jl for an arbitrary number of
time levels (0 = static, 1 = first-order, 2 = second-order ODEs): the global
state x is stored ``[max_time_level + 1, basicfield_size]`` (the reference
flattens the level axis, 03_GlobalAssembly.jl:25-29).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class GeneralAlpha:
    """alpha/gamma parameter sets (04_Time_Domain.jl:1-8); dissipative=True
    selects backward-Euler-like gamma = (1, 1)."""
    alpha_params: Tuple[float, ...] = (1.0, 1.0, 1.0)
    gamma_params: Tuple[float, ...] = (0.5, 0.5)
    beta_params: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(1))
    K_params: np.ndarray = dataclasses.field(
        default_factory=lambda: np.ones(1))

    @classmethod
    def dissipative(cls) -> "GeneralAlpha":
        return cls(gamma_params=(1.0, 1.0))

    def update_time(self, dt: float, max_time_level: int) -> None:
        """beta_l = 1 / (prod(gamma[:l]) * dt^l); K_l = alpha_l * beta_l
        (update_Time!, 04_Time_Domain.jl:10-18)."""
        levels = max_time_level + 1
        prod_gamma = np.array(
            [np.prod(self.gamma_params[:i]) for i in range(levels)])
        dt_pow = np.array([dt ** i for i in range(levels)])
        self.beta_params = 1.0 / (prod_gamma * dt_pow)
        self.K_params = (np.asarray(self.alpha_params[:levels])
                         * self.beta_params)


def initialize_dx(x: jnp.ndarray, dt: float,
                  gamma_params: Tuple[float, ...]) -> jnp.ndarray:
    """Generalized-alpha predictor (initialize_dx!, 04_Time_Domain.jl:20-30):
    dx[l-1] = dt * (x[l] + gamma_l * dx[l]), top level down."""
    levels = x.shape[0]
    dx = jnp.zeros_like(x)
    for level in range(levels - 1, 0, -1):
        dx = dx.at[level - 1].set(
            dt * (x[level] + gamma_params[level - 1] * dx[level]))
    return dx


def update_dx(dx: jnp.ndarray, delta_x: jnp.ndarray,
              beta_params: np.ndarray) -> jnp.ndarray:
    """Corrector: dx[l] += beta_l * delta_x (update_dx!, :32-39)."""
    beta = jnp.asarray(beta_params, dtype=dx.dtype)
    return dx + beta[:, None] * delta_x[None, :].astype(dx.dtype)


def x_star_of(x: jnp.ndarray, dx: jnp.ndarray,
              alpha_params: Tuple[float, ...]) -> jnp.ndarray:
    """Stage state: x* = x + alpha ∘ dx (update_x_star!, :41-49)."""
    levels = x.shape[0]
    alpha = jnp.asarray(alpha_params[:levels], dtype=x.dtype)
    return x + alpha[:, None] * dx


def normalized_norm(v) -> float:
    return float(jnp.linalg.norm(v) / np.sqrt(v.size))
