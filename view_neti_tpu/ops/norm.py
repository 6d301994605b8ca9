"""Bandwidth-lean GroupNorm for the UNet/VAE hot path.

The models keep GroupNorm statistics in fp32 regardless of compute dtype
(matching diffusers' numerics on the frozen SD stack). The stock pattern
`nn.GroupNorm(dtype=fp32)(x).astype(bf16)` promotes the whole activation
tensor to fp32 inside flax before normalizing. FastGroupNorm computes the
same math — fp32 mean/var reductions, fp32 affine fold — but expresses the
normalize as ONE fused elementwise pass over the compute-dtype tensor, so
XLA reads/writes bf16-sized buffers on the multi-MB UNet/VAE activations.

Identical parameter tree to nn.GroupNorm ('scale', 'bias' of shape (C,));
callers instantiate with name="GroupNorm_0" to keep checkpoint/weight-port
paths unchanged. Equivalence is pinned by tests/test_models.py.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class FastGroupNorm(nn.Module):
    num_groups: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fold: bool = False):
        """Normalize x, or — with fold=True — return the per-(B, C) fp32
        affine (a, b) such that normalize(x) == x*a + b, for consumers
        that fuse the normalize into a downstream kernel
        (ops/fused_conv.py)."""
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        G = self.num_groups
        B = x.shape[0]
        xg = x.reshape(B, -1, G, C // G)
        x32 = xg.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
        mean2 = jnp.mean(jnp.square(x32), axis=(1, 3), keepdims=True)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        a = inv * scale.reshape(1, 1, G, C // G)
        b = bias.reshape(1, 1, G, C // G) - mean * a
        if fold:
            a_c = jnp.broadcast_to(a, (B, 1, G, C // G)).reshape(B, C)
            b_c = jnp.broadcast_to(b, (B, 1, G, C // G)).reshape(B, C)
            return a_c, b_c
        y = x32 * a + b
        return y.reshape(x.shape).astype(self.dtype)


def group_norm(num_groups: int, epsilon: float, dtype,
               name: str = "GroupNorm_0") -> nn.Module:
    """GroupNorm with fp32 statistics and compute-dtype output (fused
    normalize pass). `name` defaults to flax's auto-name for an anonymous
    nn.GroupNorm so existing param trees keep resolving."""
    return FastGroupNorm(num_groups=num_groups, epsilon=epsilon,
                         dtype=dtype, name=name)
