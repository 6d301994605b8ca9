"""Jitted Stable Diffusion denoise pipeline with per-timestep NeTI contexts.

Parity with /root/reference/sd_pipeline_call.py:8-148 — CFG with uncond
embeddings from the plain text-encoder path, per-step prompt embeddings,
DPM-Solver++ stepping — redesigned TPU-first:

  * the whole denoise loop is ONE jit (lax.fori_loop), latents donated;
  * the CFG pair is fused into the batch dimension (the reference runs two
    sequential UNet calls per step, sd_pipeline_call.py:78-94);
  * per-timestep contexts are a stacked (T, 16, B, L, D) array indexed by
    the loop counter (the reference threads a list of dicts).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from view_neti_tpu.schedulers.dpm_solver import DPMSolverSchedule


def make_denoise_fn(unet, unet_vars_unused, schedule: DPMSolverSchedule,
                    num_inference_steps: int, guidance_scale: float = 7.5,
                    compute_dtype=jnp.float32, mesh=None):
    """Build the jitted denoise loop.

    Returns fn(latents0, unet_vars, context, context_bypass, uncond_ctx)
    -> latents. unet_vars is an ARGUMENT (not closed over): closure capture
    would inline ~2GB of frozen UNet weights as literal constants in the
    lowered program (see training/train_step.py FrozenModels).
      latents0: (N, h, w, 4) initial noise
      context/context_bypass: (T, 16, 1, L, D) per-step NeTI conditioning
      uncond_ctx: (1, L, D) negative-prompt hidden states

    With a mesh, the latent batch (camera views x seeds) dp-shards across
    devices and contexts replicate; unet_vars keep whatever placement the
    caller gave them (replicated or tp-sharded).
    """
    timesteps = schedule.set_timesteps(num_inference_steps)
    coeffs = schedule.coefficients(timesteps)
    ts = jnp.asarray(timesteps, jnp.float32)
    do_cfg = guidance_scale > 1.0

    def denoise(latents, unet_vars, context, context_bypass, uncond_ctx):
        N = latents.shape[0]
        n_layers = context.shape[1]
        n_ctx = context.shape[2]       # cams per batch (1 = single prompt)
        assert N % n_ctx == 0, (N, n_ctx)
        reps = N // n_ctx              # seeds per cam
        uncond = jnp.broadcast_to(
            uncond_ctx[None, :, :, :],
            (n_layers,) + uncond_ctx.shape).astype(compute_dtype)
        uncond = jnp.broadcast_to(
            uncond[:, :1], (n_layers, N) + uncond_ctx.shape[1:])

        def body(i, carry):
            lat, x0_prev = carry
            t = jnp.full((N,), ts[i])
            # cam-major batch layout: [cam0*reps, cam1*reps, ...]
            ctx = jnp.repeat(context[i], reps, axis=1).astype(compute_dtype)
            ctx_b = jnp.repeat(context_bypass[i], reps,
                               axis=1).astype(compute_dtype)
            if do_cfg:
                lat2 = jnp.concatenate([lat, lat], axis=0)
                t2 = jnp.concatenate([t, t], axis=0)
                ctx_cat = jnp.concatenate([uncond, ctx], axis=1)
                ctx_b_cat = jnp.concatenate([uncond, ctx_b], axis=1)
                eps2 = unet.apply(unet_vars, lat2.astype(compute_dtype), t2,
                                  ctx_cat, ctx_b_cat)
                eps_u, eps_c = jnp.split(eps2.astype(jnp.float32), 2, axis=0)
                eps = eps_u + guidance_scale * (eps_c - eps_u)
            else:
                eps = unet.apply(unet_vars, lat.astype(compute_dtype), t,
                                 ctx, ctx_b).astype(jnp.float32)
            new_lat, x0 = schedule.step(eps, i, lat, x0_prev, coeffs,
                                        num_inference_steps)
            return new_lat, x0

        latents = latents.astype(jnp.float32)
        out, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                   (latents, jnp.zeros_like(latents)))
        return out

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())
        return jax.jit(denoise, donate_argnums=(0,),
                       in_shardings=(dp, None, rep, rep, rep),
                       out_shardings=dp)
    return jax.jit(denoise, donate_argnums=(0,))


def generate(unet, unet_vars, vae, vae_vars, schedule: DPMSolverSchedule,
             context: jnp.ndarray, context_bypass: jnp.ndarray,
             uncond_ctx: jnp.ndarray, height: int, width: int,
             seeds, num_inference_steps: int = 30,
             guidance_scale: float = 7.5,
             compute_dtype=jnp.float32,
             denoise_fn=None, as_numpy: bool = True) -> np.ndarray:
    """Full text-to-image generation. Returns (S, H, W, 3) uint8 images,
    one per seed (reference eval protocol: fixed seeds per view,
    validate.py / inference_dtu.py). as_numpy=False defers the host fetch
    (returns the on-device array) so multi-prompt sweeps can overlap it
    with the next prompt's denoise — see generate_batch."""
    from view_neti_tpu.models.vae import AutoencoderKL
    if denoise_fn is None:
        denoise_fn = make_denoise_fn(unet, unet_vars, schedule,
                                     num_inference_steps, guidance_scale,
                                     compute_dtype)
    # spatial scale follows the VAE's downsampling depth (8x for SD)
    scale = 2 ** (len(vae.config.channel_mults) - 1)
    h, w = height // scale, width // scale
    lat0 = jnp.stack([
        jax.random.normal(jax.random.PRNGKey(int(s)), (h, w, 4),
                          jnp.float32)
        for s in seeds])
    latents = denoise_fn(lat0, unet_vars, context, context_bypass,
                         uncond_ctx)
    dev = _decode_jit(vae, vae_vars, latents.astype(compute_dtype))
    return np.asarray(dev) if as_numpy else dev


@functools.partial(jax.jit, static_argnums=0)
def _decode_jit(vae, vae_vars, latents):
    """VAE decode + uint8 quantization ON DEVICE: the reference fetches
    float images and converts on host (sd_pipeline_call.py:120-130); over
    the ~25 MB/s tunnel the f32 fetch alone was ~0.21 s/image at 768x576,
    so only the final uint8 (1 byte/px) crosses to host."""
    from view_neti_tpu.models.vae import AutoencoderKL
    img = vae.apply(vae_vars, latents, method=AutoencoderKL.decode)
    img = jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0, 1)
    return jnp.round(img * 255).astype(jnp.uint8)


def generate_batch(unet, unet_vars, vae, vae_vars,
                   schedule: DPMSolverSchedule,
                   contexts: jnp.ndarray, contexts_bypass: jnp.ndarray,
                   uncond_ctx: jnp.ndarray, height: int, width: int,
                   seeds, num_inference_steps: int = 30,
                   guidance_scale: float = 7.5,
                   compute_dtype=jnp.float32,
                   denoise_fn=None, mesh=None,
                   as_numpy: bool = True) -> np.ndarray:
    """Batched multi-prompt generation: contexts (T, 16, C, L, D) carries C
    prompts (e.g. C camera views); all C x len(seeds) images denoise in ONE
    jitted loop. Returns (C, S, H, W, 3) uint8.

    as_numpy=False returns the ON-DEVICE uint8 array instead of fetching:
    every dispatch here is async, so a multi-chunk sweep can enqueue the
    next chunk's conditioning+denoise BEFORE materializing this chunk's
    images — the ~0.16 s/chunk host fetch over the tunnel then overlaps
    device compute instead of idling it (see
    inference_dtu.dtu_generate_camidxs_to_preds).

    Seed semantics match the reference protocol: seed s produces the same
    initial latents for every prompt (reference inference_dtu.py:354-356
    reseeds the generator per seed).

    With a mesh, the (C*S) latent batch dp-shards across devices (the TPU
    replacement for the reference's one-GPU sequential view sweep)."""
    from view_neti_tpu.models.vae import AutoencoderKL
    if denoise_fn is None:
        denoise_fn = make_denoise_fn(unet, None, schedule,
                                     num_inference_steps, guidance_scale,
                                     compute_dtype, mesh=mesh)
    C = contexts.shape[2]
    S = len(seeds)
    scale = 2 ** (len(vae.config.channel_mults) - 1)
    h, w = height // scale, width // scale
    per_seed = [jax.random.normal(jax.random.PRNGKey(int(s)), (h, w, 4),
                                  jnp.float32) for s in seeds]
    lat0 = jnp.stack(per_seed * C)          # cam-major: [c0s0, c0s1, ...]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_dp = mesh.shape["dp"]
        assert (C * S) % n_dp == 0, (
            f"denoise batch C*S={C * S} must divide dp={n_dp}; pick a view "
            f"batch with views*seeds % dp == 0")
        lat0 = jax.device_put(lat0, NamedSharding(mesh, P("dp")))
    latents = denoise_fn(lat0, unet_vars, contexts, contexts_bypass,
                         uncond_ctx)
    dev = _decode_jit(vae, vae_vars, latents.astype(compute_dtype))
    dev = dev.reshape(C, S, *dev.shape[1:])
    return np.asarray(dev) if as_numpy else dev


@functools.partial(jax.jit, static_argnums=0)
def _clip_plain_jit(clip, clip_vars, ids):
    return clip.apply(clip_vars, ids)[0]


def encode_uncond(clip, clip_vars, tokenizer, negative_prompt: str = "",
                  max_length: Optional[int] = None) -> jnp.ndarray:
    """Negative-prompt hidden states via the plain CLIP path (reference
    sd_pipeline_call.py:36-41, 136-148)."""
    L = max_length or clip_vars["params"]["position_embedding"].shape[0]
    ids = tokenizer(negative_prompt or "", padding="max_length",
                    truncation=True, max_length=L).input_ids
    return _clip_plain_jit(clip, clip_vars, jnp.asarray(ids, jnp.int32))
