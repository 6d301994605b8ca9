"""Positional encodings for the NeTI mappers.

Semantic parity with /root/reference/models/positional_encoding.py, rebuilt
functionally for JAX: frequency matrices are *fixed constants* generated once
from an explicit PRNG key (the reference stores them as nn.Parameters but
`.detach()`es them in every forward — effectively frozen, see reference
positional_encoding.py:187-189). For bit-parity with torch-seeded reference
checkpoints, frequency matrices can be supplied directly (loaded as data)
instead of generated.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def make_fourier_freqs(seed: int, dim: int, sigmas: Sequence[float]
                       ) -> jnp.ndarray:
    """Random Fourier frequency matrix, shape (dim // 2, len(sigmas)).

    Column i is N(0, sigmas[i]^2) (reference positional_encoding.py:164-169,
    which seeds torch.manual_seed(seed) then scales randn columns).
    """
    key = jax.random.PRNGKey(seed)
    w = jax.random.normal(key, (dim // 2, len(sigmas)), dtype=jnp.float32)
    return w * jnp.asarray(sigmas, dtype=jnp.float32)[None, :]


def fourier_encode(w: jnp.ndarray, x: jnp.ndarray,
                   normalize: bool = False) -> jnp.ndarray:
    """[sin(w @ x); cos(w @ x)] feature map.

    Args:
      w: (dim//2, nfeats) fixed frequency matrix.
      x: (B, nfeats) inputs, expected in [-1, 1].
    Returns:
      (B, dim) features; optionally L2-normalized per-sample (reference
      positional_encoding.py:174-195 computes (dim, B) then transposes).
    """
    if x.ndim == 1:
        x = x[:, None]
    proj = x @ jax.lax.stop_gradient(w).T  # (B, dim//2)
    v = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
    if normalize:
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v


def make_neti_freqs(seed: int, sigma_t: float, sigma_l: float,
                    num_w: int = 1024) -> jnp.ndarray:
    """Legacy NeTI (t, l) frequency matrix, shape (num_w, 2)
    (reference positional_encoding.py:13-21)."""
    key = jax.random.PRNGKey(seed)
    w = jax.random.normal(key, (num_w, 2), dtype=jnp.float32)
    return w * jnp.asarray([sigma_t, sigma_l], dtype=jnp.float32)[None, :]


def neti_encode(w: jnp.ndarray, t: jnp.ndarray, l: jnp.ndarray
                ) -> jnp.ndarray:
    """Legacy NeTI encoding of raw (t, l): normalized [sin; cos] features.

    Args: t, l: (B,) raw (unnormalized) timestep / layer index.
    Returns: (B, 2 * num_w) unit-norm features (reference
    positional_encoding.py:23-41).
    """
    x = jnp.stack([t, l], axis=-1).astype(jnp.float32)  # (B, 2)
    proj = x @ jax.lax.stop_gradient(w).T  # (B, num_w)
    v = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def neti_init_layer(w: jnp.ndarray, num_time_anchors: int, num_layers: int
                    ) -> jnp.ndarray:
    """Anchor-based init for the legacy input projection.

    Returns (num_time_anchors * num_layers, 2 * num_w), one encoded anchor
    per (t_anchor, l_anchor) pair — used as the weight of the input Dense
    layer (reference positional_encoding.py:43-51).
    """
    t_anchors = np.arange(0, 1000, 1000 // num_time_anchors)
    ts, ls = [], []
    for t in t_anchors:
        for l in range(num_layers):
            ts.append(float(t))
            ls.append(float(l))
    return neti_encode(w, jnp.asarray(ts), jnp.asarray(ls))


def basic_encode(t: jnp.ndarray, l: jnp.ndarray,
                 num_denoising_timesteps: int = 1000,
                 num_unet_layers: int = 16) -> jnp.ndarray:
    """Scale raw (t, l) to [-1, 1], shape (B, 2)
    (reference positional_encoding.py:54-76)."""
    tn = t.astype(jnp.float32) / (num_denoising_timesteps - 1) * 2 - 1
    ln = l.astype(jnp.float32) / (num_unet_layers - 1) * 2 - 1
    return jnp.stack([tn, ln], axis=-1)


def load_torch_fourier_freqs(path: str) -> jnp.ndarray:
    """Load a reference-exported frequency matrix (.npy) for seed parity.

    The reference generates freqs with torch.manual_seed, which JAX PRNG
    cannot reproduce; exact-parity runs export the torch tensor to .npy and
    load it here (SURVEY.md §7.3.3).
    """
    return jnp.asarray(np.load(path), dtype=jnp.float32)
