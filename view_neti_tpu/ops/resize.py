"""Cheap exact spatial resizes for the UNet/VAE up paths.

For the only case the SD architecture needs — integer 2x nearest
upsampling (diffusers Upsample2D with interpolate(scale_factor=2,
mode="nearest")) — a broadcast + contiguity-preserving reshape produces
identical values as pure data movement, independent of how
jax.image.resize lowers on any backend. (Measured on the tunneled v5e:
XLA already lowered the resize efficiently — this form is equivalent in
speed and guarantees it stays that way; torch-mirror golden tests pin
value equality with F.interpolate.)
"""
from __future__ import annotations

import jax.numpy as jnp


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, 2W, C), exact nearest-neighbor."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)
