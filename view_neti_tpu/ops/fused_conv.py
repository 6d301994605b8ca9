"""Pallas TPU fused GroupNorm-affine + SiLU + 3x3 conv (forward-only).

Why: the step profile (PARITY.md) shows the UNet/VAE conv sections running
below the 67-76 TFLOP/s measured chip ceiling: XLA materializes the
normalized + SiLU'd activation in HBM before the conv reads it back
(norm->silu->conv costs 1 extra read + 1 extra write of the full
activation per section). This kernel consumes the RAW activation once —
the GroupNorm normalize (folded to a per-(B,C) affine by a cheap jnp stats
pass), SiLU, 3x3 conv, bias, per-(B,Cout) time-embedding add, and residual
add all happen in VMEM.

The reference inherits these sections from diffusers' CUDA ResnetBlock2D
(reference training/coach.py:628-640 loads the frozen UNet/VAE whose conv
blocks are norm->silu->conv chains); there is no first-party kernel to
mirror — this is the TPU-native fusion the architecture calls for.

Kernel design (see /opt/skills/guides/pallas_guide.md):
  * grid = (B, H/bh, Cout/ct), sequential on TPU; x stays in HBM
    (memory_space=ANY) and each (b, h-tile) DMAs a (bh+2, W, Cin) halo
    slab into persistent VMEM scratch, then affine+SiLU+halo-masks it
    into a second persistent scratch — BOTH once per (b, h-tile),
    re-used across the ct-minor grid axis (multi-ct plans would
    otherwise recompute the SiLU per output tile). Out-of-image halo
    rows are zeroed with jnp.where (stale scratch may hold NaNs; conv
    zero-padding applies to the POST-silu tensor, so masking happens
    after the SiLU).
  * the 3x3 conv is nine (bh, W, Cin) x (Cin, ct) MXU contractions over
    ALIGNED views of the slab: row shifts are major-axis slices
    [dy:dy+bh] (no layout constraint) and column shifts use pltpu.roll
    along the sublane axis with the single wrapped column masked — every
    production W is a multiple of the sublane tile, so no relayout
    copies anywhere. fp32 accumulation; single-op epilogue.
  * forward-only (no custom VJP): gradients never flow through the frozen
    VAE (train_step.py wraps encode in stop_gradient) or through anything
    at inference. The UNet keeps the unfused path EVERYWHERE: training
    needs differentiability, and at inference fusing the UNet inside the
    denoise fori_loop regressed the whole program despite standalone
    per-site wins (1.54 -> 1.76 s/img measured r5; see
    builder.fuse_for_inference). Shipped fusion surface = the VAE.

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

# Planning budget for one grid step. Mosaic's scoped accounting charges
# the slab scratch, the transient affine/SiLU/rolled values, the fp32
# accumulator chain, and double-buffered IO blocks; the hardware scoped
# limit is ~16 MB, so plan well under it.
_VMEM_BUDGET = 9 * 1024 * 1024
_VMEM_LIMIT = 15 * 1024 * 1024


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

    Larger bh amortizes the halo DMA and lengthens the contraction M dim;
    prefer the largest that fits. The working-set estimate charges both
    slab scratches (raw + SiLU'd), the fp32 row transients of the affine
    pass, the partial-sum/rolled/accumulator chain, and the IO blocks."""
    ct_candidates = [d for d in range(Cout, 0, -1)
                     if Cout % d == 0 and (d % 128 == 0 or d == Cout)]
    for bh_target in (32, 16, 8, 4, 2, 1):
        bh = _divisor_at_most(H, bh_target)
        slab = (bh + 2) * W * Cin * itemsize
        rows = 3 * W * Cin * 4            # fp32 affine/SiLU row transients
        for ct in ct_candidates:
            weights = 9 * Cin * ct * itemsize
            acc = bh * W * ct * 4
            io = 2 * bh * W * ct * (itemsize + res_itemsize)
            # 2x slab: raw + silu'd scratch; 4x acc: partial-sum chain,
            # accumulator, and the rolled copy
            total = 2 * slab + rows + weights + 4 * acc + io
            if total <= _VMEM_BUDGET:
                return bh, ct
    return None


def _channels_aligned(cin: int, cout: int) -> bool:
    """Mosaic constraint (compiled mode only): the halo DMA slices the
    HBM memref along the minor (channel) axis, and slice shapes there must
    be lane-tile (128) aligned — a 320-channel UNet level lowers its x to
    a 384-padded memref and the (…, 320) slice is rejected ("Slice shape
    along dimension 3 must be aligned to tiling (128)", measured r5).
    Host-padding channels would re-materialize x in HBM, the exact traffic
    this kernel deletes, so unaligned sites keep the unfused path. All VAE
    levels (128/256/512) and the UNet 640/1280 levels qualify; only the
    UNet 320 level does not."""
    return cin % 128 == 0 and cout % 128 == 0


def profitable(x_shape, cout: int) -> bool:
    """Measured per-site profitability (tools/profile_fused_conv.py, r5,
    v5e). The kernel wins at 256-640 input channels everywhere and at
    128-channel levels with small batch; it LOSES in two regimes:
      * 128 channels at large batch — the VMEM plan is forced down to
        bh=4 (halo = +50% slab traffic) while XLA's conv on the big
        (9, 384, 512, 128) activation already runs near the bandwidth
        ceiling;
      * >=1280 channels at tiny spatial (UNet mid levels) — 10 ct tiles
        re-stream the weights while the contraction M dim (bh*W) starves
        the MXU.
    Numbers (TF/s unfused -> fused, VAE sites stable across reruns; the
    UNet sites have a measured +-13% noise floor — the fallback-vs-
    fallback L0 row differs by that much between runs):
      enc L0  (9, 384,512,128): 64.1 -> 49.5   LOSS  -> gated out
      enc L0  (1, 384,512,128): 32.3 -> 38.7   +20%
      enc L1  (9, 192,256,256): 78.3 -> 82.5   +5%
      enc L2  (9,  96,128,512): 77.4 -> 116.4  +50%
      dec up3 (1, 576,768,128): 41.3 -> 52.9   +28%
      dec up3 (3, 576,768,128): 28.3 -> 48.0   +70%
      dec up2 (1, 288,384,256): 57.5 -> 70.2   +22%
      dec up1 (1, 144,192,512): 73.2 -> 81.6   +11%
      unet L1 (2,  36, 48,640): 24.3 -> 27.0   +11%
      unet L2 (2,  18, 24,1280): 24.1 -> 12.6  LOSS  -> gated out
    (unet L0 (320ch) is excluded by _channels_aligned, not by policy.)
    """
    B, _, _, Cin = x_shape
    if Cin > 640:
        return False
    if Cin >= 256:
        return True
    return B <= 4


def supported(x_shape, cout: int, itemsize: int = 2,
              has_residual: bool = False,
              interpret: Optional[bool] = None) -> bool:
    """Static gate: True when a VMEM-feasible (bh, ct) plan exists and the
    channel dims satisfy compiled-mode DMA alignment (interpret mode — the
    CPU test path — has no alignment constraint). Callers deciding whether
    to fuse a model block should ALSO consult profitable()."""
    _, H, W, Cin = x_shape
    if interpret is None:
        interpret = _default_interpret()
    if not interpret and not _channels_aligned(Cin, cout):
        return False
    return _plan(H, W, Cin, cout, itemsize,
                 itemsize if has_residual else 0) is not None


def fusable(x_shape, cout: int, dtype, has_residual: bool = False) -> bool:
    """The ONE gate model code should use per norm->silu->conv3x3 site:
    measured profitability (profitable) AND a VMEM-feasible aligned plan
    (supported) for THIS site's input shape. Each conv in a ResnetBlock
    gates independently — conv2's input is (B, H, W, Cout), which differs
    from conv1's whenever the block changes channel count."""
    return (profitable(x_shape, cout)
            and supported(x_shape, cout, jnp.dtype(dtype).itemsize,
                          has_residual))


def _kernel(x_hbm, a_ref, b_ref, w_ref, bias_ref, add_ref, res_ref,
            out_ref, slab, sslab, sem, *, bh: int, W: int, Cin: int,
            compute_dtype, has_bias: bool, has_add: bool, has_res: bool,
            interpret: bool):
    bidx = pl.program_id(0)
    t = pl.program_id(1)
    co = pl.program_id(2)
    nt = pl.num_programs(1)
    ct = w_ref.shape[3]

    # ---- once per (b, h-tile), reused across the ct-minor axis: DMA the
    # halo slab from HBM, then affine + SiLU + halo-mask it into sslab.
    # Recomputing the SiLU per ct step is what sank the multi-ct-tile
    # plans (the 1280-channel UNet level runs 10 ct steps).
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

        a = a_ref[pl.ds(bidx, 1), :][0].astype(jnp.float32)   # (Cin,)
        b = b_ref[pl.ds(bidx, 1), :][0].astype(jnp.float32)
        # ROW-WISE: a whole-slab fp32 affine pass keeps ~3 slab-sized fp32
        # temporaries live and blows Mosaic's scoped-VMEM stack at the
        # 512-channel decoder level (measured 18.1M vs the 15M limit);
        # per-row the transients are (W, Cin) fp32.
        for r in range(bh + 2):
            xr = slab[r].astype(jnp.float32)                  # (W, Cin)
            yr = (xr * a[None, :] + b[None, :]).astype(compute_dtype)
            yr = yr * jax.nn.sigmoid(yr.astype(jnp.float32)).astype(
                compute_dtype)
            # out-of-image halo rows: slab holds stale data (maybe NaN) —
            # zero the POST-silu value (conv zero-padding semantics)
            if r == 0:
                yr = jnp.where(t > 0, yr, jnp.zeros_like(yr))
            elif r == bh + 1:
                yr = jnp.where(t < nt - 1, yr, jnp.zeros_like(yr))
            sslab[r] = yr

    # ---- nine MXU contractions over UNSHIFTED aligned views ----
    # Row shifts are major-axis slices y[dy:dy+bh] (no layout constraint).
    # Column shifts happen on the fp32 PARTIAL-SUM side: Mosaic's rotate
    # only supports 32-bit data, so rather than rolling the bf16 slab we
    # contract first and roll the fp32 partial sum — 2 rotates per grid
    # step instead of 2 bf16 relayouts. The single wrapped column (j=0
    # for dx=0, j=W-1 for dx=2) is conv zero-padding and gets masked.
    acc = jnp.zeros((bh, W, ct), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, W, ct), 1)
    for dx in range(3):
        p = jnp.zeros((bh, W, ct), jnp.float32)
        for dy in range(3):
            p = p + jax.lax.dot_general(
                sslab[dy:dy + bh], w_ref[dy, dx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        if dx == 1:
            acc = acc + p
        else:
            if interpret:
                p = jnp.roll(p, 1 - dx, axis=1)
            else:
                # pltpu.roll requires a non-negative shift; -1 == W-1
                p = pltpu.roll(p, (1 - dx) % W, axis=1)
            bad = (col == 0) if dx == 0 else (col == W - 1)
            acc = acc + jnp.where(bad, jnp.zeros_like(p), p)

    # ---- epilogue (single ops) ----
    if has_bias:
        acc = acc + bias_ref[0].astype(jnp.float32)[None, None, :]
    if has_add:
        acc = acc + add_ref[pl.ds(bidx, 1), :].astype(jnp.float32)[:, None, :]
    if has_res:
        acc = acc + res_ref[0].astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


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
    if interpret is None:
        interpret = _default_interpret()
    plan = _plan(H, W, Cin, Cout, jnp.dtype(compute_dtype).itemsize,
                 jnp.dtype(residual.dtype).itemsize
                 if residual is not None else 0)
    if plan is None or (not interpret
                        and not _channels_aligned(Cin, Cout)):
        raise ValueError(
            f"fused_affine_silu_conv3x3: no VMEM-feasible/aligned plan for "
            f"{x.shape} -> {Cout}; gate with ops.fused_conv.supported()")
    bh, ct = plan

    has_bias = bias is not None
    has_add = add_bc is not None
    has_res = residual is not None
    bias_in = (bias.reshape(1, Cout) if has_bias
               else jnp.zeros((1, Cout), compute_dtype))
    # fp32: the kernel dynamic-row-indexes (B, Cout) by batch, and Mosaic
    # can't prove sublane-pair alignment for packed 16-bit dynamic loads
    add_in = (add_bc.astype(jnp.float32) if has_add
              else jnp.zeros((B, Cout), jnp.float32))
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
                          has_add=has_add, has_res=has_res,
                          interpret=interpret),
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
            pltpu.VMEM((bh + 2, W, Cin), x.dtype),            # halo slab
            pltpu.VMEM((bh + 2, W, Cin), compute_dtype),      # silu'd slab
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * Cin * Cout,
            bytes_accessed=(x.size * x.dtype.itemsize
                            + B * H * W * Cout
                            * jnp.dtype(out_dtype).itemsize),
            transcendentals=x.size),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
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
