"""Independent torch mirror of the NeTI LEARNABLE stack + train step.

Test helper for tests/test_train_dynamics_golden.py. Written FROM the
reference's published semantics (reference models/neti_mapper.py:165-439,
models/net_clip_text_embedding.py:34-130,
models/neti_clip_text_encoder.py:57-218, training/coach.py:154-229) — NOT
from this repo's Flax code — so gradient/trajectory agreement between the
two implementations is meaningful evidence that the Flax backward pass and
optimizer reproduce torch autograd + torch.optim.AdamW (the reference's
actual training dynamics, reference training/coach.py:211-218, 727-746).

State-dict key names follow the reference checkpoint schema (net.0/net.1/
net.3/net.4, output_layer.0, encoder.w) so weights travel through the REAL
interop path (torch_interop.flax_from_torch_state).

The CLIP side reuses the REAL installed `transformers.CLIPTextModel`
submodules, with the NeTI injection (placeholder-row overwrite before
position embeddings) and the post-encoder bypass merge implemented here
exactly as the reference subclass does.
"""
import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

NUM_UNET_LAYERS = 16


class MirrorFourierEncoder(nn.Module):
    """FourierPositionalEncodingNDims (reference
    positional_encoding.py:146-195): fixed random frequency matrix w of
    shape (dim//2, nfeats); forward = [sin(w@x); cos(w@x)]. w is stored as
    a Parameter (the reference registers it as one) but detached every
    forward — effectively frozen."""

    def __init__(self, w: np.ndarray):
        super().__init__()
        self.w = nn.Parameter(torch.from_numpy(np.asarray(w, np.float32)))

    def forward(self, x):                      # x: (B, nfeats)
        proj = x @ self.w.detach().T           # (B, dim//2)
        return torch.cat([torch.sin(proj), torch.cos(proj)], dim=-1)


class MirrorNeTIMapper(nn.Module):
    """Arch-15 NeTI mapper (reference neti_mapper.py:165-229, 401-439,
    506-608): Fourier PE over scaled (t, l[, camera]) -> 2x(Linear,
    LayerNorm, LeakyReLU) -> output head; output split into word/bypass
    halves; optional norm-scaling of the word half."""

    def __init__(self, w: np.ndarray, hidden: int, output_dim: int,
                 output_bypass: bool = True):
        super().__init__()
        self.encoder = MirrorFourierEncoder(w)
        in_dim = w.shape[0] * 2
        self.output_bypass = output_bypass
        self.output_dim = output_dim
        self.net = nn.Sequential(
            nn.Linear(in_dim, hidden), nn.LayerNorm(hidden),
            nn.LeakyReLU(negative_slope=0.01),
            nn.Linear(hidden, hidden), nn.LayerNorm(hidden),
            nn.LeakyReLU(negative_slope=0.01))
        out = output_dim * (2 if output_bypass else 1)
        self.output_layer = nn.Sequential(nn.Linear(hidden, out))

    def forward(self, t, l, view_params=None, norm_scale=None):
        # reference neti_mapper.py:542-547: t/1000, l/num_layers (NOT N-1)
        t_s = t.float() / 1000.0 * 2 - 1
        l_s = l.float() / NUM_UNET_LAYERS * 2 - 1
        data = torch.stack([t_s, l_s], dim=-1)
        if view_params is not None:
            data = torch.cat([data, view_params.float()], dim=-1)
        h = self.net(self.encoder(data))
        out = self.output_layer(h)
        if self.output_bypass:
            word, bypass = out.chunk(2, dim=-1)
        else:
            word, bypass = out, None
        if norm_scale is not None:
            word = F.normalize(word, dim=-1) * norm_scale
        return word, bypass


def clip_causal_mask(L: int) -> torch.Tensor:
    m = torch.full((L, L), torch.finfo(torch.float32).min)
    return torch.triu(m, diagonal=1)[None, None]


def _overwrite_rows(tok_embeds, ids, ph_ids, word):
    """Replace the placeholder-token row of each prompt with the mapper
    word embedding (reference net_clip_text_embedding.py:95-98). Rows with
    ph_id == -1 never match and stay untouched."""
    mask = (ids == ph_ids[:, None]).unsqueeze(-1)
    return torch.where(mask, word[:, None, :], tok_embeds)


def _merge_bypass(hidden, ids, ph_ids, bypass, alpha, unconstrained):
    """Post-encoder bypass merge (reference
    neti_clip_text_encoder.py:129-180): constrained adds
    alpha * normalize(bypass) * ||existing|| to the placeholder row;
    unconstrained replaces it with normalize(bypass) * detached mean
    sequence norm."""
    mask = ids == ph_ids[:, None]                        # (B, L)
    has = mask.any(dim=1)                                # (B,)
    existing = (mask.float().unsqueeze(-1) * hidden).sum(dim=1)  # (B, D)
    b = F.normalize(bypass, dim=-1)
    if unconstrained:
        norm_term = hidden.norm(dim=-1).mean(dim=-1).detach()    # (B,)
        new = b * norm_term[:, None]
    else:
        new = existing + alpha * b * existing.norm(dim=-1, keepdim=True)
    write = mask.unsqueeze(-1) & has[:, None, None]
    return torch.where(write, new[:, None, :], hidden)


def neti_clip_forward(hf, ids,
                      word_obj=None, bypass_obj=None, ph_obj=None,
                      word_view=None, bypass_view=None, ph_view=None,
                      alpha_obj=0.2, alpha_view=0.2,
                      unconstrained_obj=False, unconstrained_view=False):
    """One NeTI text-encoder pass through the REAL transformers CLIP
    submodules. Returns (hidden, hidden_with_bypass), both post
    final-layer-norm (reference neti_clip_text_encoder.py:183-218)."""
    tm = hf.text_model
    B, L = ids.shape
    tok = tm.embeddings.token_embedding(ids)
    if word_obj is not None:
        tok = _overwrite_rows(tok, ids, ph_obj, word_obj)
    if word_view is not None:
        tok = _overwrite_rows(tok, ids, ph_view, word_view)
    pos = tm.embeddings.position_embedding(
        torch.arange(L, device=ids.device))
    x = tok + pos[None]
    causal = clip_causal_mask(L)
    for layer in tm.encoder.layers:
        x = layer(x, None, causal)[0]
    hidden = x
    hb = x
    any_bypass = bypass_obj is not None or bypass_view is not None
    if bypass_obj is not None:
        hb = _merge_bypass(hb, ids, ph_obj, bypass_obj, alpha_obj,
                           unconstrained_obj)
    if bypass_view is not None:
        hb = _merge_bypass(hb, ids, ph_view, bypass_view, alpha_view,
                           unconstrained_view)
    hidden = tm.final_layer_norm(hidden)
    hb = tm.final_layer_norm(hb) if any_bypass else hidden
    return hidden, hb


def text_conditioning(hf, mapper_obj, mapper_view, ids, ph_obj, ph_view,
                      timesteps, cam=None,
                      obj_norm_scale=None, view_norm_scale=None,
                      alpha_obj=0.2, alpha_view=0.2,
                      unconstrained_obj=False, unconstrained_view=False):
    """The reference's 16-pass conditioning sweep (reference
    training/coach.py:276-311): one full text-encoder forward per UNet
    cross-attention layer l, each feeding the mappers (t, l). Returns two
    lists of 16 (B, L, D) tensors: regular contexts (K source) and bypass
    contexts (V source)."""
    ctxs, ctxs_b = [], []
    for l in range(NUM_UNET_LAYERS):
        l_t = torch.full_like(timesteps.float(), float(l))
        word_obj = bypass_obj = None
        if mapper_obj is not None:
            word_obj, bypass_obj = mapper_obj(
                timesteps, l_t, norm_scale=obj_norm_scale)
        word_view = bypass_view = None
        if mapper_view is not None:
            word_view, bypass_view = mapper_view(
                timesteps, l_t, view_params=cam,
                norm_scale=view_norm_scale)
        hidden, hb = neti_clip_forward(
            hf, ids, word_obj=word_obj, bypass_obj=bypass_obj,
            ph_obj=ph_obj, word_view=word_view, bypass_view=bypass_view,
            ph_view=ph_view, alpha_obj=alpha_obj, alpha_view=alpha_view,
            unconstrained_obj=unconstrained_obj,
            unconstrained_view=unconstrained_view)
        ctxs.append(hidden)
        ctxs_b.append(hb)
    return ctxs, ctxs_b


def train_step_loss(vae, hf_clip, unet, mapper_obj, mapper_view,
                    pixels_nchw, ids, ph_obj, ph_view, cam,
                    eps_vae_nchw, noise_nchw, timesteps,
                    alphas_cumprod, scaling_factor,
                    obj_norm_scale=None, view_norm_scale=None,
                    alpha_obj=0.2, alpha_view=0.2,
                    unconstrained_obj=False, unconstrained_view=False,
                    prediction_type="epsilon"):
    """One full reference train-step loss (reference coach.py:154-213):
    VAE-encode + posterior sample (with INJECTED eps), add INJECTED noise
    at INJECTED timesteps, 16-layer NeTI conditioning, UNet prediction
    with K<-context / V<-bypass, MSE to the epsilon/v target. All
    stochastic draws are passed in so the loss is a deterministic function
    shared with the JAX side."""
    with torch.no_grad():
        moments = vae.moments(pixels_nchw)
        mean, logvar = moments.chunk(2, dim=1)
        logvar = torch.clamp(logvar, -30.0, 20.0)
        latents = (mean + torch.exp(0.5 * logvar) * eps_vae_nchw) \
            * scaling_factor
    acp = torch.from_numpy(
        np.asarray(alphas_cumprod, np.float32))[timesteps]
    sqrt_acp = torch.sqrt(acp)[:, None, None, None]
    sqrt_1m = torch.sqrt(1.0 - acp)[:, None, None, None]
    noisy = sqrt_acp * latents + sqrt_1m * noise_nchw
    if prediction_type == "epsilon":
        target = noise_nchw
    elif prediction_type == "v_prediction":
        target = sqrt_acp * noise_nchw - sqrt_1m * latents
    else:
        raise NotImplementedError(prediction_type)

    ctxs, ctxs_b = text_conditioning(
        hf_clip, mapper_obj, mapper_view, ids, ph_obj, ph_view,
        timesteps, cam=cam, obj_norm_scale=obj_norm_scale,
        view_norm_scale=view_norm_scale, alpha_obj=alpha_obj,
        alpha_view=alpha_view, unconstrained_obj=unconstrained_obj,
        unconstrained_view=unconstrained_view)
    contexts = [(c, cb) for c, cb in zip(ctxs, ctxs_b)]
    pred = unet(noisy, timesteps.float(), contexts)
    return F.mse_loss(pred, target)
