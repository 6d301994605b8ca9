"""The jit-compiled textual-inversion train step.

One call = one micro-batch (the reference's inner loop body, reference
training/coach.py:154-229): VAE-encode pixels, sample noise + per-sample
timesteps with explicit PRNG, compute the 16-layer NeTI text conditioning in
one folded pass, UNet epsilon/v prediction, MSE, grads w.r.t. mapper params
only, activity-masked AdamW with optax.MultiSteps gradient accumulation.

Differences from the reference made possible by the functional design:
  * The embedding-row restore (reference coach.py:222-229) is unnecessary —
    the CLIP token table is not in the optimizer at all.
  * Donated buffers: trainable params + optimizer state are donated to the
    step for in-place updates on device.

Sharding: the step is jitted over a (dp, tp) jax.sharding.Mesh. The batch is
sharded over dp; frozen model weights are replicated (they fit on one chip —
SURVEY.md §2.3) or, optionally, heavy UNet/CLIP matmul kernels are sharded
over tp (parallel/mesh.py); gradients are reduced over ICI by XLA-inserted
collectives, never by hand.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from view_neti_tpu.models.unet import UNet2DCondition
from view_neti_tpu.models.vae import AutoencoderKL
from view_neti_tpu.schedulers.ddpm import DDPMSchedule
from view_neti_tpu.training.text_forward import (TextModels,
                                                 neti_text_conditioning)


@jax.tree_util.register_dataclass
@dataclass
class TrainBatch:
    """Device-side micro-batch (built host-side by the data pipeline).

    pixel_values carries images (B, H, W, 3) in [-1, 1], or — when the
    Coach's latent cache is active (augmentation-free configs) —
    precomputed VAE posterior moments (B, h, w, 8); the step is built with
    from_moments=True in that case and skips the ~40%-of-step-time VAE
    encoder entirely.
    """
    pixel_values: jnp.ndarray            # (B, H, W, 3) or (B, h, w, 8)
    input_ids: jnp.ndarray               # (B, L) int32
    input_ids_placeholder_object: jnp.ndarray   # (B,) int32, -1 if absent
    input_ids_placeholder_view: jnp.ndarray     # (B,) int32, -1 if absent
    # mode-3 scene index: scalar () int32 normally, or (G,) per-group
    # indices when fuse_accumulation packs G microbatch groups into one
    # device batch (text_forward/mesh special-case the 1-D layout)
    object_idx: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FrozenModels:
    """Module definitions (static) + frozen variables (pytree data).

    A registered pytree passed AS AN ARGUMENT to the jitted train step —
    never closed over (closure capture would inline ~2GB of frozen SD
    weights as literal HLO constants; see TextModels docstring)."""
    text: TextModels
    unet: UNet2DCondition = dataclasses.field(metadata=dict(static=True))
    unet_vars: Any = None
    vae: AutoencoderKL = dataclasses.field(
        default=None, metadata=dict(static=True))
    vae_vars: Any = None
    schedule: DDPMSchedule = dataclasses.field(
        default=None, metadata=dict(static=True))
    # device-resident uint8 base images (N, H, W, 3) for the augmented
    # recipe: the step gathers by batch.pixel_values indices so the host
    # sends only int32 indices per step (tunneled-TPU transfer is slow)
    pixel_cache: Any = None


def make_train_step(optimizer: optax.GradientTransformation,
                    compute_dtype: jnp.dtype = jnp.float32,
                    from_moments: bool = False,
                    augment=None,
                    cache_pixels: bool = False,
                    ) -> Callable:
    """Build the (un-jitted) train step.

    from_moments: batch.pixel_values holds precomputed VAE posterior
    moments (mean|logvar); sample latents directly (latent cache).

    augment: optional ops.device_augment.AugmentSpec — batch.pixel_values
    then holds cached uint8 base images (B, H, W, 3) and the stochastic
    augmentation suffix (jitter/blur/rotate/crop/flip) runs ON DEVICE inside
    this jit, fused ahead of the VAE encode. The host's per-step image work
    collapses to stacking cached uint8 arrays (the reference re-augments on
    the host every step, training/dataset.py:605-739).

    Returns step(trainable, opt_state, frozen: FrozenModels, batch, rng) ->
      (trainable, opt_state, metrics).
    """
    if augment is not None and from_moments:
        raise ValueError("device augmentation and the latent cache are "
                         "mutually exclusive")
    if cache_pixels and augment is None and not from_moments:
        raise ValueError("cache_pixels requires device augmentation or "
                         "the latent cache")

    def loss_fn(trainable, frozen, batch: TrainBatch, noisy, timesteps,
                target, rng_drop):
        ctx, ctx_b = neti_text_conditioning(
            frozen.text, trainable,
            input_ids=batch.input_ids,
            ph_obj_ids=batch.input_ids_placeholder_object,
            ph_view_ids=batch.input_ids_placeholder_view,
            timesteps=timesteps,
            object_idx=batch.object_idx,
            rng=rng_drop, train=True)
        pred = frozen.unet.apply(
            frozen.unet_vars, noisy.astype(compute_dtype),
            timesteps, ctx.astype(compute_dtype),
            ctx_b.astype(compute_dtype))
        return jnp.mean(
            (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)

    def step(trainable, opt_state, frozen: FrozenModels, batch: TrainBatch,
             rng):
        schedule = frozen.schedule
        r_vae, r_noise, r_t, r_drop, r_aug = jax.random.split(rng, 5)
        if augment is not None:
            from view_neti_tpu.ops import device_augment
            base = (frozen.pixel_cache[batch.pixel_values]
                    if cache_pixels else batch.pixel_values)
            pixels = device_augment.augment_batch(augment, r_aug, base)
            latents = frozen.vae.apply(
                frozen.vae_vars, pixels.astype(compute_dtype),
                r_vae, method=AutoencoderKL.encode_sample)
        elif from_moments:
            moments = (frozen.pixel_cache[batch.pixel_values]
                       if cache_pixels else batch.pixel_values)
            mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
            logvar = jnp.clip(logvar, -30.0, 20.0)
            eps = jax.random.normal(r_vae, mean.shape, jnp.float32)
            latents = (mean + jnp.exp(0.5 * logvar) * eps) \
                * frozen.vae.config.scaling_factor
        else:
            latents = frozen.vae.apply(
                frozen.vae_vars, batch.pixel_values.astype(compute_dtype),
                r_vae, method=AutoencoderKL.encode_sample)
        latents = jax.lax.stop_gradient(latents.astype(jnp.float32))
        noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
        B = latents.shape[0]
        timesteps = jax.random.randint(
            r_t, (B,), 0, schedule.num_train_timesteps)
        noisy = schedule.add_noise(latents, noise, timesteps)
        target = schedule.target(latents, noise, timesteps)

        loss, grads = jax.value_and_grad(loss_fn)(
            trainable, frozen, batch, noisy, timesteps, target, r_drop)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, {"total_loss": loss}

    return step


def make_multi_step(step_fn: Callable) -> Callable:
    """lax.scan W optimizer steps inside ONE jit dispatch.

    On a tunneled TPU every dispatch/fetch pays a ~30 ms host round-trip;
    with the device-resident pixel cache a batch is just int32 indices, so
    W windows of host data stack into (W, ...) arrays and the whole window
    runs device-side. Returns multi(trainable, opt_state, frozen,
    batches[W,...], rngs[W,2]) -> (trainable, opt_state,
    {"total_loss": (W,)}).
    """

    def multi(trainable, opt_state, frozen, batches, rngs):
        def body(carry, inp):
            tr, st = carry
            batch, key = inp
            tr, st, metrics = step_fn(tr, st, frozen, batch, key)
            return (tr, st), metrics["total_loss"]

        (trainable, opt_state), losses = jax.lax.scan(
            body, (trainable, opt_state), (batches, rngs))
        return trainable, opt_state, {"total_loss": losses}

    return multi


def jit_train_step(step_fn: Callable, mesh=None, batch_sharding=None,
                   replicated=None, frozen_sharding=None) -> Callable:
    """jit with buffer donation; optionally constrained to a mesh.

    With a mesh: trainable/opt_state replicated, batch sharded over 'dp',
    frozen weights per frozen_sharding (replicated or tp-sharded); XLA
    inserts the psum for the gradient all-reduce automatically since
    replicated outputs depend on dp-sharded inputs.
    """
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0, 1))
    return jax.jit(
        step_fn,
        in_shardings=(replicated, replicated,
                      frozen_sharding if frozen_sharding is not None
                      else replicated,
                      batch_sharding, replicated),
        out_shardings=(replicated, replicated, replicated),
        donate_argnums=(0, 1))
