"""Pallas TPU fused GroupNorm-affine + SiLU + 3x3 conv (forward-only).

Why: the step profile (PARITY.md) shows the UNet/VAE conv sections running
at ~50 TFLOP/s vs the 67-76 TFLOP/s measured chip ceiling, while a bare 3x3
conv at the same shapes hits the ceiling (tools/profile_vae.py). The gap is
the elementwise traffic AROUND each conv: XLA materializes the normalized +
SiLU'd activation in HBM before the conv reads it back (norm->silu->conv is
1 extra read + 1 extra write of the full activation per section). This
kernel consumes the RAW activation once — the GroupNorm normalize (folded
to a per-(B,C) affine by a cheap jnp stats pass), SiLU, 3x3 conv, bias,
per-(B,Cout) time-embedding add, and residual add all happen in VMEM.

The reference inherits these sections from diffusers' CUDA ResnetBlock2D
(reference training/coach.py:628-640 loads the frozen UNet/VAE whose conv
blocks are norm->silu->conv chains); there is no first-party kernel to
mirror — this is the TPU-native fusion the architecture calls for.

Kernel design (see /opt/skills/guides/pallas_guide.md):
  * grid = (B, H/bh, Cout/ct), sequential on TPU; x stays in HBM
    (memory_space=ANY) and each (b, h-tile) DMAs a (bh+2, W, Cin) halo
    slab into persistent VMEM scratch (re-used across the ct-minor grid
    axis).
  * the affine+SiLU pass writes a FLAT ((bh+2)*(W+2), Cin) slab row by
    row, zeroing the width-pad columns and out-of-image halo rows with
    jnp.where (conv zero-padding applies AFTER norm+silu, and stale
    scratch may hold NaNs — where, not multiply).
  * the 3x3 conv is NINE shifted matmuls over that flat slab: because the
    accumulator keeps the padded width (bh*(W+2) rows), tap (dy, dx) is
    the CONTIGUOUS row slice starting at dy*(W+2)+dx — no gather/relayout,
    each tap a dense (bh*(W+2), Cin) @ (Cin, ct) MXU matmul with fp32
    accumulation. The two garbage columns per output row never leave the
    accumulator (the epilogue reads W columns per row).
  * forward-only (no custom VJP): gradients never flow through the frozen
    VAE (train_step.py wraps encode in stop_gradient) or through anything
    at inference. The UNet keeps the unfused path when training.

Numerics match the unfused chain: fp32 GroupNorm statistics (ops/norm.py
fold), normalize cast to the compute dtype BEFORE SiLU (same as
FastGroupNorm's output cast), matmuls accumulate fp32, epilogue adds in
fp32 then casts once.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Scoped-VMEM budget for one grid step (raw slab + flat silu'd slab +
# weights + accumulator + double-buffered IO blocks). Hardware VMEM is
# ~16 MB; leave headroom for Mosaic's own buffers.
_VMEM_BUDGET = 12 * 1024 * 1024


def _divisor_at_most(n: int, target: int, prefer_mult: int = 8) -> int:
    """Largest divisor of n that is <= target, preferring multiples of
    prefer_mult (sublane-friendly tile heights)."""
    cap = min(n, target)
    mult = [d for d in range(1, cap + 1)
            if n % d == 0 and d % prefer_mult == 0]
    if mult:
        return mult[-1]
    anyd = [d for d in range(1, cap + 1) if n % d == 0]
    return anyd[-1]


def _plan(H: int, W: int, Cin: int, Cout: int, itemsize: int,
          res_itemsize: int) -> Optional[tuple]:
    """Pick (bh, ct) fitting the VMEM budget, or None if unsupported.

    Larger bh amortizes the halo DMA and lengthens the matmul M dim;
    prefer the largest that fits."""
    ct_candidates = [d for d in range(Cout, 0, -1)
                     if Cout % d == 0 and (d % 128 == 0 or d == Cout)]
    for bh_target in (32, 16, 8, 4, 2, 1):
        bh = _divisor_at_most(H, bh_target)
        if bh > bh_target:
            continue
        wp = W + 2
        slab = (bh + 2) * W * Cin * itemsize
        sslab = ((bh + 2) * wp + 8) * Cin * itemsize
        for ct in ct_candidates:
            weights = 9 * Cin * ct * itemsize
            acc = bh * wp * ct * 4
            io = 2 * bh * W * ct * (itemsize + res_itemsize)
            if slab + sslab + weights + acc + io <= _VMEM_BUDGET:
                return bh, ct
    return None


def supported(x_shape, cout: int, itemsize: int = 2,
              has_residual: bool = False) -> bool:
    """Static gate: True when a VMEM-feasible (bh, ct) plan exists."""
    _, H, W, Cin = x_shape
    return _plan(H, W, Cin, cout, itemsize,
                 itemsize if has_residual else 0) is not None


def _kernel(x_hbm, a_ref, b_ref, w_ref, bias_ref, add_ref, res_ref,
            out_ref, slab, sslab, sem, *, bh: int, W: int, Cin: int,
            compute_dtype, has_bias: bool, has_add: bool, has_res: bool):
    bidx = pl.program_id(0)
    t = pl.program_id(1)
    co = pl.program_id(2)
    nt = pl.num_programs(1)
    Wp = W + 2
    ct = w_ref.shape[3]

    # ---- load + normalize the halo slab once per (b, h-tile) ----
    @pl.when(co == 0)
    def _load():
        y0 = t * bh
        main = pltpu.make_async_copy(
            x_hbm.at[bidx, pl.ds(y0, bh), :, :],
            slab.at[pl.ds(1, bh), :, :], sem)
        main.start()
        main.wait()

        @pl.when(t > 0)
        def _top():
            d = pltpu.make_async_copy(
                x_hbm.at[bidx, pl.ds(y0 - 1, 1), :, :],
                slab.at[pl.ds(0, 1), :, :], sem)
            d.start()
            d.wait()

        @pl.when(t < nt - 1)
        def _bot():
            d = pltpu.make_async_copy(
                x_hbm.at[bidx, pl.ds(y0 + bh, 1), :, :],
                slab.at[pl.ds(bh + 1, 1), :, :], sem)
            d.start()
            d.wait()

        # affine + SiLU, written row-by-row into the FLAT padded slab.
        # Width-pad columns and invalid halo rows are zeroed with
        # jnp.where — stale scratch may hold NaNs and conv zero-padding
        # applies to the POST-silu tensor.
        a = a_ref[pl.ds(bidx, 1), :][0].astype(jnp.float32)   # (Cin,)
        b = b_ref[pl.ds(bidx, 1), :][0].astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (Wp, Cin), 0)
        in_image = jnp.logical_and(col >= 1, col <= W)
        for r in range(bh + 2):
            xr = slab[r].astype(jnp.float32)           # (W, Cin)
            yr = (xr * a[None, :] + b[None, :]).astype(compute_dtype)
            yr = yr * jax.nn.sigmoid(yr.astype(jnp.float32)).astype(
                compute_dtype)
            # place into padded width: col 0 and col W+1 are pad
            row = jnp.zeros((Wp, Cin), compute_dtype)
            row = jax.lax.dynamic_update_slice_in_dim(row, yr, 1, 0)
            if r == 0:
                valid = t > 0
            elif r == bh + 1:
                valid = t < nt - 1
            else:
                valid = None
            if valid is not None:
                row = jnp.where(jnp.logical_and(valid, in_image), row,
                                jnp.zeros_like(row))
            else:
                row = jnp.where(in_image, row, jnp.zeros_like(row))
            sslab[pl.ds(r * Wp, Wp), :] = row

    # ---- 9 shifted matmuls over the flat slab ----
    acc = jnp.zeros((bh * Wp, ct), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = sslab[pl.ds(dy * Wp + dx, bh * Wp), :]
            acc = acc + jax.lax.dot_general(
                tap, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    # ---- epilogue: per output row, drop the 2 garbage columns ----
    extra = jnp.zeros((1, ct), jnp.float32)
    if has_bias:
        extra = extra + bias_ref[0].astype(jnp.float32)[None, :]
    if has_add:
        extra = extra + add_ref[pl.ds(bidx, 1), :].astype(jnp.float32)
    for i in range(bh):
        row = jax.lax.dynamic_slice_in_dim(acc, i * Wp, W, 0) + extra
        if has_res:
            row = row + res_ref[0, i].astype(jnp.float32)
        out_ref[0, i] = row.astype(out_ref.dtype)


def _default_interpret() -> bool:
    """Interpret the kernel when lowering for a non-TPU device (CPU tests).
    Same gating as ops/flash_attention.py."""
    try:
        d = jax.config.jax_default_device
        if d is not None:
            return d.platform != "tpu"
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def fused_affine_silu_conv3x3(x: jnp.ndarray, a: jnp.ndarray,
                              b: jnp.ndarray, kernel: jnp.ndarray,
                              bias: Optional[jnp.ndarray] = None,
                              add_bc: Optional[jnp.ndarray] = None,
                              residual: Optional[jnp.ndarray] = None,
                              out_dtype=None,
                              interpret: Optional[bool] = None
                              ) -> jnp.ndarray:
    """conv3x3(silu(a*x + b)) + bias + add_bc + residual; one HBM read of x.

    x: (B, H, W, Cin) NHWC. a, b: (B, Cin) per-sample affine (GroupNorm
    fold — ops/norm.py FastGroupNorm(fold=True)). kernel: (3, 3, Cin, Cout)
    in the COMPUTE dtype (caller casts, mirroring nn.Conv's dtype
    handling). bias: (Cout,). add_bc: (B, Cout), broadcast over H and W
    (the UNet ResnetBlock time-embedding add). residual: (B, H, W, Cout).
    SAME (stride 1, pad 1) convolution only.
    """
    B, H, W, Cin = x.shape
    Cout = kernel.shape[3]
    compute_dtype = kernel.dtype
    out_dtype = out_dtype or compute_dtype
    plan = _plan(H, W, Cin, Cout, jnp.dtype(compute_dtype).itemsize,
                 jnp.dtype(residual.dtype).itemsize
                 if residual is not None else 0)
    if plan is None:
        raise ValueError(
            f"fused_affine_silu_conv3x3: no VMEM-feasible plan for "
            f"{x.shape} -> {Cout}; gate with ops.fused_conv.supported()")
    bh, ct = plan
    if interpret is None:
        interpret = _default_interpret()

    has_bias = bias is not None
    has_add = add_bc is not None
    has_res = residual is not None
    bias_in = (bias.reshape(1, Cout) if has_bias
               else jnp.zeros((1, Cout), compute_dtype))
    add_in = add_bc if has_add else jnp.zeros((B, Cout), compute_dtype)
    res_in = residual if has_res else jnp.zeros(
        (B, 1, 1, Cout), compute_dtype)   # placeholder, never read

    res_spec = (pl.BlockSpec((1, bh, W, ct),
                             lambda bi, t, co: (bi, t, 0, co),
                             memory_space=pltpu.VMEM) if has_res else
                pl.BlockSpec((1, 1, 1, ct),
                             lambda bi, t, co: (0, 0, 0, co),
                             memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, W=W, Cin=Cin,
                          compute_dtype=compute_dtype, has_bias=has_bias,
                          has_add=has_add, has_res=has_res),
        grid=(B, H // bh, Cout // ct),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # x in HBM
            # full-array blocks: Mosaic requires sublane-dim blocks to be
            # 8-multiples OR the whole axis; B is small (<=9), keep whole
            pl.BlockSpec((B, Cin), lambda bi, t, co: (0, 0),
                         memory_space=pltpu.VMEM),           # a
            pl.BlockSpec((B, Cin), lambda bi, t, co: (0, 0),
                         memory_space=pltpu.VMEM),           # b
            pl.BlockSpec((3, 3, Cin, ct), lambda bi, t, co: (0, 0, 0, co),
                         memory_space=pltpu.VMEM),           # kernel
            pl.BlockSpec((1, ct), lambda bi, t, co: (0, co),
                         memory_space=pltpu.VMEM),           # bias
            pl.BlockSpec((B, ct), lambda bi, t, co: (0, co),
                         memory_space=pltpu.VMEM),           # add_bc
            res_spec,                                        # residual
        ],
        out_specs=pl.BlockSpec((1, bh, W, ct),
                               lambda bi, t, co: (bi, t, 0, co),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, W, Cin), x.dtype),            # raw slab
            pltpu.VMEM(((bh + 2) * (W + 2) + 8, Cin),
                       compute_dtype),                        # silu'd flat
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * Cin * Cout,
            bytes_accessed=(x.size * x.dtype.itemsize
                            + B * H * W * Cout
                            * jnp.dtype(out_dtype).itemsize),
            transcendentals=x.size),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 2 * 1024 * 1024),
        interpret=interpret,
    )(x, a.astype(jnp.float32), b.astype(jnp.float32), kernel,
      bias_in, add_in, res_in)
    return out


# ---------------------------------------------------------------------------
# flax param shim
# ---------------------------------------------------------------------------

import flax.linen as nn   # noqa: E402  (kept below the kernel, tiny shim)


class Conv3x3Params(nn.Module):
    """Declares nn.Conv-compatible (kernel, bias) params WITHOUT running a
    convolution — the fused kernel consumes them directly. Param names,
    shapes, dtypes, and initializers match nn.Conv(features, (3, 3)) so the
    param tree (and therefore checkpoints / the HF weight port) is byte-
    identical to the unfused branch."""
    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b
