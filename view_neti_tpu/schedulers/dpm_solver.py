"""DPM-Solver++ (2M) multistep scheduler, pure JAX.

Config parity with the diffusers DPMSolverMultistepScheduler the reference
swaps in for validation/inference (reference training/validate.py:568-573):
algorithm dpmsolver++, solver_order 2, lower_order_final, scaled_linear
betas 0.00085 -> 0.012, epsilon or v prediction.

Designed to drive a lax.fori_loop: all per-step coefficients are precomputed
arrays indexed by the loop counter; `step` is a pure function of
(model_output, step_index, latents, prev_x0).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DPMSolverSchedule:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    prediction_type: str = "epsilon"
    solver_order: int = 2
    lower_order_final: bool = True
    alphas_cumprod: np.ndarray = field(init=False, repr=False, default=None)

    def __post_init__(self):
        betas = np.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5,
                            self.num_train_timesteps, dtype=np.float64) ** 2
        object.__setattr__(self, "alphas_cumprod",
                           np.cumprod(1.0 - betas))

    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """diffusers linspace spacing: linspace(0, N-1, n+1).round()[::-1][:-1]."""
        t = np.linspace(0, self.num_train_timesteps - 1,
                        num_inference_steps + 1).round()[::-1][:-1]
        return t.astype(np.int64)

    def coefficients(self, timesteps: np.ndarray):
        """Per-step (alpha_t, sigma_t, lambda_t) plus the t -> prev mapping.

        Returns dict of np arrays of length n+1 where index i corresponds to
        timesteps[i] and index n is the terminal state (t=0: alpha=1,
        sigma=0 handled via the "final" boundary conventions of diffusers:
        prev timestep of the last step is 0).
        """
        acp = self.alphas_cumprod
        # the "previous timestep" of the final solver step is t=0, which is a
        # real schedule index (diffusers convention)
        ts = list(timesteps) + [0]
        alpha = np.sqrt(np.asarray([acp[t] for t in ts], np.float64))
        sigma = np.sqrt(1.0 - np.asarray([acp[t] for t in ts], np.float64))
        sigma = np.maximum(sigma, 1e-12)
        lam = np.log(alpha) - np.log(sigma)
        return {"alpha": alpha.astype(np.float32),
                "sigma": sigma.astype(np.float32),
                "lambda": lam.astype(np.float32)}

    # -- pure step functions ------------------------------------------------

    def to_x0(self, model_output: jnp.ndarray, sample: jnp.ndarray,
              alpha_t, sigma_t) -> jnp.ndarray:
        if self.prediction_type == "epsilon":
            return (sample - sigma_t * model_output) / alpha_t
        if self.prediction_type == "v_prediction":
            return alpha_t * sample - sigma_t * model_output
        raise ValueError(self.prediction_type)

    @staticmethod
    def first_order_update(x0, sample, alpha, sigma, lam, i):
        """DPM-Solver++(1): x_{i+1} = (s_{i+1}/s_i) x - a_{i+1}(e^{-h}-1) x0."""
        h = lam[i + 1] - lam[i]
        return (sigma[i + 1] / sigma[i]) * sample \
            - alpha[i + 1] * (jnp.exp(-h) - 1.0) * x0

    @staticmethod
    def second_order_update(x0, x0_prev, sample, alpha, sigma, lam, i):
        """DPM-Solver++(2M) multistep update using the previous x0."""
        h = lam[i + 1] - lam[i]
        h_0 = lam[i] - lam[i - 1]
        r0 = h_0 / h
        d0 = x0
        d1 = (x0 - x0_prev) / r0
        return (sigma[i + 1] / sigma[i]) * sample \
            - alpha[i + 1] * (jnp.exp(-h) - 1.0) * d0 \
            - 0.5 * alpha[i + 1] * (jnp.exp(-h) - 1.0) * d1

    def step(self, model_output: jnp.ndarray, i: jnp.ndarray,
             sample: jnp.ndarray, x0_prev: jnp.ndarray,
             coeffs, num_steps: int
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One solver step inside a fori_loop. i is the traced loop index.

        Returns (new_sample, x0) — caller threads x0 as x0_prev.
        """
        alpha = jnp.asarray(coeffs["alpha"])
        sigma = jnp.asarray(coeffs["sigma"])
        lam = jnp.asarray(coeffs["lambda"])
        x0 = self.to_x0(model_output, sample, alpha[i], sigma[i])
        first = self.first_order_update(x0, sample, alpha, sigma, lam, i)
        if self.solver_order == 1:
            return first, x0
        second = self.second_order_update(x0, x0_prev, sample, alpha, sigma,
                                          lam, jnp.maximum(i, 1))
        use_first = (i == 0)
        # diffusers applies the final-step first-order fallback only for short
        # schedules (len(timesteps) < 15, scheduling_dpmsolver_multistep.py);
        # the reference runs 30 steps (reference training/validate.py:568-573)
        # so its last step stays second-order.
        if self.lower_order_final and num_steps < 15:
            use_first = use_first | (i == num_steps - 1)
        return jnp.where(use_first, first, second), x0
