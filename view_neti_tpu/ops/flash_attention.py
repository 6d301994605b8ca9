"""Pallas TPU flash attention (forward + custom VJP backward).

Why: the UNet's self-attention over 64x64 latents is 4096 tokens; a naive
softmax(QK^T)V materializes (B*H, 4096, 4096) logits in HBM — the dominant
bandwidth cost of the whole train step. This kernel runs the online-softmax
streaming formulation entirely in VMEM, parallelized over (batch*heads,
query blocks) on the MXU, with fp32 accumulators.

Replaces the CUDA attention inherited by the reference through diffusers'
CrossAttention (reference models/xti_attention_processor.py:44-50 does
explicit bmm softmax bmm). The XTI K/V source split happens in the
projections upstream; this kernel sees plain (q, k, v).

Kernel design notes (see /opt/skills/guides/pallas_guide.md):
  * grid = (B*H, Lq / block_q); K/V streamed in block_k chunks inside the
    kernel body; running max/denominator in fp32.
  * Lk is padded to a lane multiple by the wrapper; padded keys are masked
    with -inf via a static iota mask (cross-attn Lk=77 -> 128).
  * head_dim is left unpadded; Mosaic tiles the lane dimension internally.
  * backward = two kernels (dq over q-blocks, dk/dv over k-blocks) using the
    saved logsumexp, standard flash-attention-2 recomputation.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Defaults from a measured sweep at the UNet's training shapes
# (tools/profile_attention.py) validated END-TO-END on the real chip:
# switching 256/256 -> 512/1024 tiles took the shipped train recipe from
# 26.2 to 31.2 imgs/sec/chip (bench.py, tail-median). In the sweep, the
# L=3072/d=40 fwd ran 4.9 vs 8.3 ms and fwd+dq-bwd 8.45 vs 13.6 ms.
# Whole-axis K blocks (bk=3072) were ~1 ms faster still standalone but
# blow the 16 MB scoped-VMEM limit when the bwd dkv kernel is compiled
# inside the full train-step program (20.7 MB scoped at bq=384/bk=3072) —
# select_blocks caps the tile product at a size verified in the REAL
# program, not just the microbenchmark. _pick_block snaps both to divisors
# for other lengths, so small shapes are unaffected.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024

# The kernels hold several f32 (bq, bk) tiles (logits/probs/dp/ds) plus
# accumulators in scoped VMEM at once; cap the tile product.
_MAX_TILE_ELEMS = 512 * 1024
_NEG_INF = -1e30


def _pick_block(n: int, target: int) -> int:
    """Largest divisor of n that is <= target and a multiple of 128 (or n).

    The 128 granularity keeps the (BH, 1, Lq) logsumexp output lane-tiled
    (TPU requires block lane dims to be 128-multiples or the full axis).
    """
    if n <= target:
        return n
    b = (target // 128) * 128
    while b >= 128:
        if n % b == 0:
            return b
        b -= 128
    return n


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                kv_len: int, block_k: int):
    q = q_ref[0].astype(jnp.float32) * scale          # (bq, d)
    bq = q.shape[0]
    lk_pad = k_ref.shape[1]
    num_kb = lk_pad // block_k

    def body(kb, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (bq, bk)
        if kv_len < lk_pad:                           # static: skip the mask
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + kb * block_k
            s = jnp.where(col < kv_len, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l

    acc, m, l = jax.lax.fori_loop(
        0, num_kb, body,
        (jnp.zeros((bq, q.shape[1]), jnp.float32),
         jnp.full((bq, 1), _NEG_INF, jnp.float32),
         jnp.zeros((bq, 1), jnp.float32)))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l))[:, 0]


def _flash_fwd(q, k, v, scale, kv_len, block_q, block_k,
               interpret=False):
    """q: (BH, Lq, d); k/v: (BH, Lk_pad, d). Returns (o, lse)."""
    BH, Lq, d = q.shape
    Lk_pad = k.shape[1]
    grid = (BH, Lq // block_q)
    out_shapes = (
        jax.ShapeDtypeStruct((BH, Lq, d), q.dtype),
        jax.ShapeDtypeStruct((BH, 1, Lq), jnp.float32),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_len=kv_len,
                          block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Lq * Lk_pad * d,
            bytes_accessed=(q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=BH * Lq * Lk_pad),
        interpret=interpret,
    )(q, k, v)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale: float, kv_len: int, block_k: int):
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]
    delta = delta_ref[0, 0][:, None]
    lk_pad = k_ref.shape[1]

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if kv_len < lk_pad:                           # static: skip the mask
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) \
                + kb * block_k
            s = jnp.where(col < kv_len, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, lk_pad // block_k, body, jnp.zeros_like(q))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale: float, kv_len: int,
                    lk_pad: int, block_q: int):
    k = k_ref[0].astype(jnp.float32)                  # (bk, d)
    v = v_ref[0].astype(jnp.float32)
    lq = q_ref.shape[1]
    kb = pl.program_id(1)
    col0 = kb * k.shape[0]

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # (bq, bk)
        if kv_len < lk_pad:                           # static: skip the mask
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col0
            s = jnp.where(col < kv_len, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk = dk + scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk, dv

    dk, dv = jax.lax.fori_loop(
        0, lq // block_q, body,
        (jnp.zeros_like(k), jnp.zeros_like(v)))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# --------------------------------------------------------------------------
# custom-vjp wrapper over (BH, L, d) tensors
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, scale, kv_len, block_q, block_k, interpret):
    o, _ = _flash_fwd(q, k, v, scale, kv_len, block_q, block_k, interpret)
    return o


def _flash_fwd_rule(q, k, v, scale, kv_len, block_q, block_k, interpret):
    o, lse = _flash_fwd(q, k, v, scale, kv_len, block_q, block_k, interpret)
    return o, (q, k, v, o, lse)


def _flash_bwd_rule(scale, kv_len, block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    BH, Lq, d = q.shape
    Lk_pad = k.shape[1]
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)[:, None, :]              # (BH, 1, Lq)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=kv_len,
                          block_k=block_k),
        grid=(BH, Lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    bk = min(block_k, Lk_pad)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=kv_len,
                          lk_pad=Lk_pad, block_q=block_q),
        grid=(BH, Lk_pad // bk),
        in_specs=[
            pl.BlockSpec((1, Lq, d), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lq, d), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lq), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Lq), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bk, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------

def _default_interpret() -> bool:
    """Interpret the kernel when lowering for a non-TPU device (CPU tests)."""
    try:
        d = jax.config.jax_default_device
        if d is not None:
            return d.platform != "tpu"
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def select_blocks(Lq_pad: int, Lk_pad: int) -> tuple:
    """Default (bq, bk) for padded lengths, capped so bq*bk stays within the
    scoped-VMEM-safe tile product. Both lengths must be 128-multiples (the
    wrapper pads q AND kv), so _pick_block always finds a divisor <= target
    and the cap can always shrink bk."""
    bq = _pick_block(Lq_pad, DEFAULT_BLOCK_Q)
    max_bk = max(128, (_MAX_TILE_ELEMS // bq) // 128 * 128)
    bk = _pick_block(Lk_pad, min(DEFAULT_BLOCK_K, max_bk))
    return bq, bk


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Flash attention over (B, Lq, H, d) / (B, Lk, H, d) tensors.

    block_q/block_k=None (production path) selects capped defaults via
    select_blocks. Explicit values are honored as-is after divisor
    snapping — sweeps (tools/profile_attention.py) must measure what the
    label says, and the caller owns the VMEM risk."""
    B, Lq, H, d = q.shape
    Lk = k.shape[1]
    scale = d ** -0.5
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, Lq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, Lk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, Lk, d)
    # pad q to a 128-sublane multiple: attention rows are independent, so
    # padded q rows just compute extra output rows sliced off below (and
    # their do cotangent is zero-padded by the slice's vjp, contributing
    # exactly zero to dk/dv). This removes whole-axis q blocks for lengths
    # with no 128-multiple divisor (e.g. 768x576 level-1 L=1728).
    qf = _pad_to(qf, 1, 128)
    # pad kv to a 128-lane multiple, mask inside the kernel
    kf = _pad_to(kf, 1, 128)
    vf = _pad_to(vf, 1, 128)
    d_bq, d_bk = select_blocks(qf.shape[1], kf.shape[1])
    bq = d_bq if block_q is None else _pick_block(qf.shape[1], block_q)
    bk = d_bk if block_k is None else _pick_block(kf.shape[1], block_k)
    if interpret is None:
        interpret = _default_interpret()
    o = _flash(qf, kf, vf, scale, Lk, bq, bk, interpret)
    return o[:, :Lq].reshape(B, H, Lq, d).transpose(0, 2, 1, 3)


_fallback_warned = set()


def flash_attention_compat(q, k, v) -> Optional[jnp.ndarray]:
    """Shape-gated entry used by ops.attention: returns None if the kernel
    shouldn't handle the shapes (caller falls back to jnp).

    The gate is STATIC shape checks only; kernel/compile errors propagate
    loudly rather than silently degrading to the O(Lq*Lk)-memory jnp path
    (a VMEM overflow or Mosaic regression must be visible, not a 10x
    throughput cliff with no signal). Since the wrapper pads q to
    128-sublane multiples (r4: e6e13c3 made the kernel Lq-agnostic), the
    only HARD requirements left are the head dim's (d%8==0, d<=256 —
    satisfied by every SD1.5/SD2.1 level: d in {40, 64, 80, 160}). Tiny
    ODD-length attentions (the UNet's 12x9=108-token deepest level at
    768x576) still route to jnp without a warning — the padding overhead
    plus kernel launch buys nothing at that size, and the jnp logits are
    a few KB."""
    B, Lq, H, d = q.shape
    Lk = k.shape[1]
    if d % 8 != 0 or d > 256:
        if Lq * Lk > 512 * 512:
            key = (Lq, Lk, d)
            if key not in _fallback_warned:
                _fallback_warned.add(key)
                import warnings
                warnings.warn(
                    f"flash attention: unsupported head dim for shape "
                    f"Lq={Lq} Lk={Lk} d={d} (need d%8==0, d<=256); "
                    f"falling back to jnp attention, which materializes "
                    f"(B*H, Lq, Lk) logits")
        return None
    if Lq % 8 != 0 and Lq < 128 and Lk < 128:
        return None   # tiny odd level: jnp is harmless and launch-free
    return flash_attention(q, k, v)
