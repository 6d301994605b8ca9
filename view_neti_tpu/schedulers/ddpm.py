"""DDPM training-time noise scheduler, as pure JAX functions.

Config parity with the diffusers DDPMScheduler the reference loads from the
SD repo (reference training/coach.py:614-618): scaled_linear betas
0.00085 -> 0.012 over 1000 steps; epsilon or v-prediction targets
(reference training/coach.py:201-209).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True, eq=False)
class DDPMSchedule:
    """Precomputed diffusion schedule. All arrays are float32 numpy at
    construction; jnp ops broadcast them on device at trace time.

    Hash/eq are defined on the generating config (not the derived arrays)
    so the schedule can ride as static metadata on jit-traversed pytrees."""
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "epsilon"
    alphas_cumprod: np.ndarray = field(init=False, repr=False, default=None)

    def _key(self):
        return (self.num_train_timesteps, self.beta_start, self.beta_end,
                self.beta_schedule, self.prediction_type)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return (isinstance(other, DDPMSchedule)
                and self._key() == other._key())

    def __post_init__(self):
        if self.beta_schedule == "scaled_linear":
            betas = np.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5,
                                self.num_train_timesteps,
                                dtype=np.float64) ** 2
        elif self.beta_schedule == "linear":
            betas = np.linspace(self.beta_start, self.beta_end,
                                self.num_train_timesteps, dtype=np.float64)
        else:
            raise NotImplementedError(self.beta_schedule)
        alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)
        object.__setattr__(self, "alphas_cumprod", alphas_cumprod)

    def _coeffs(self, timesteps: jnp.ndarray, ndim: int):
        acp = jnp.asarray(self.alphas_cumprod)[timesteps]
        sqrt_acp = jnp.sqrt(acp)
        sqrt_1m = jnp.sqrt(1.0 - acp)
        shape = (-1,) + (1,) * (ndim - 1)
        return sqrt_acp.reshape(shape), sqrt_1m.reshape(shape)

    def add_noise(self, samples: jnp.ndarray, noise: jnp.ndarray,
                  timesteps: jnp.ndarray) -> jnp.ndarray:
        """x_t = sqrt(acp_t) x_0 + sqrt(1 - acp_t) eps."""
        sqrt_acp, sqrt_1m = self._coeffs(timesteps, samples.ndim)
        return sqrt_acp * samples + sqrt_1m * noise

    def get_velocity(self, samples: jnp.ndarray, noise: jnp.ndarray,
                     timesteps: jnp.ndarray) -> jnp.ndarray:
        """v_t = sqrt(acp_t) eps - sqrt(1 - acp_t) x_0."""
        sqrt_acp, sqrt_1m = self._coeffs(timesteps, samples.ndim)
        return sqrt_acp * noise - sqrt_1m * samples

    def target(self, samples: jnp.ndarray, noise: jnp.ndarray,
               timesteps: jnp.ndarray) -> jnp.ndarray:
        """Training target per prediction_type (reference coach.py:201-209)."""
        if self.prediction_type == "epsilon":
            return noise
        if self.prediction_type == "v_prediction":
            return self.get_velocity(samples, noise, timesteps)
        raise ValueError(f"Unknown prediction type {self.prediction_type}")
