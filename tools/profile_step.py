#!/usr/bin/env python
"""Component timing of the mode-2 train step at bench shapes (B=9,
512x384, bf16, SD-1.5): VAE encode, text conditioning, UNet fwd,
UNet fwd+bwd, full step. Run on the real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_compile"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(os.environ.get("PROF_BATCH", "9"))
H, W = 384, 512


def timeit(name, f, *args, n=15):
    """Chained timing: each iteration's input is perturbed by a tiny
    function of the previous output, so the tunneled runtime cannot
    memoize identical executions (see CLAUDE.md; tools/profile_vae.py).
    f's FIRST array argument is perturbed; the final fetch of a scalar
    forces remote completion."""
    import jax.numpy as _jnp

    args = list(args)
    arr_i = next(i for i, a in enumerate(args)
                 if hasattr(a, "dtype") and hasattr(a, "ndim")
                 and a.ndim >= 1)

    # NOTE: all other args ride through as jit ARGUMENTS (rest) — closing
    # over frozen weight pytrees would inline them as HLO constants
    @jax.jit
    def step(x, eps, *rest):
        if _jnp.issubdtype(x.dtype, _jnp.integer):
            x_in = x + _jnp.round(eps * 1e25).astype(x.dtype)
        else:
            x_in = x + eps.astype(x.dtype)
        rebuilt = list(rest[:arr_i]) + [x_in] + list(rest[arr_i:])
        out = f(*rebuilt)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return out, _jnp.mean(leaf.astype(_jnp.float32)) * 1e-20

    x0 = args[arr_i]
    rest = args[:arr_i] + args[arr_i + 1:]
    out, eps = step(x0, _jnp.float32(0), *rest)
    float(eps)  # force completion of the warmup/compile
    t0 = time.time()
    for _ in range(n):
        out, eps = step(x0, eps, *rest)
    float(eps)  # scalar fetch = remote completion barrier
    dt = (time.time() - t0) / n * 1000
    print(f"{name:24s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from view_neti_tpu.models.unet import sd15_unet_config, UNet2DCondition
    from view_neti_tpu.models.clip_text import sd15_text_config
    from view_neti_tpu.models.vae import VAEConfig, AutoencoderKL
    from view_neti_tpu.training import builder
    from view_neti_tpu.tokenizer import FallbackTokenizer
    from view_neti_tpu.config import RunConfig, decode
    from view_neti_tpu.data import dtu as dtu_mod
    from view_neti_tpu.training.text_forward import neti_text_conditioning
    import tempfile

    arch = builder.SDArch(text=sd15_text_config(),
                          unet=sd15_unet_config(use_flash_attention=True),
                          vae=VAEConfig(), prediction_type="epsilon")
    cfg = decode(RunConfig, {
        "learnable_mode": 2,
        "model": {"arch_view_net": 15, "arch_view_disable_tl": False,
                  "word_embedding_dim": 768,
                  "normalize_view_mapper_output": True,
                  "output_bypass_alpha_view": 5.0, "pe_sigma_exp_key": 2},
        "data": {"camera_representation": "dtu-12d", "dtu_subset": 6},
        "optim": {"mixed_precision": "bf16"}})
    rng_np = np.random.RandomState(0)
    caldir = tempfile.mkdtemp()
    for i in range(1, 65):
        m = rng_np.randn(3, 4) * 100
        with open(os.path.join(caldir, f"pos_{i:03d}.txt"), "w") as f:
            f.write("\n".join(" ".join(f"{x:.4f}" for x in r) for r in m))
    tok = FallbackTokenizer()
    view_tokens = [dtu_mod.dtu_cam_params_to_token(
        rng_np.randn(3, 4).astype(np.float32) * 100, i)
        for i in dtu_mod.dtu_get_train_idxs(6)]
    built = builder.build_models(cfg, tok, view_tokens, ["<skull>"],
                                 arch=arch, compute_dtype=jnp.bfloat16,
                                 calibration_dir=caldir)
    frozen = built.frozen
    trainable = built.trainable

    pix = jnp.asarray(rng_np.uniform(-1, 1, (B, H, W, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    lat = jax.random.normal(key, (B, H // 8, W // 8, 4), jnp.bfloat16)
    t = jnp.full((B,), 500.0)
    L = built.arch.text.max_position_embeddings
    view_id = built.placeholder_view_token_ids[0]
    obj_id = built.placeholder_object_token_ids[0]
    ids = np.full((B, L), tok.eos_token_id, np.int32)
    ids[:, 0] = tok.bos_token_id
    ids[:, 1] = view_id
    ids[:, 7] = obj_id
    ids = jnp.asarray(ids)
    ph_o = jnp.full((B,), obj_id, jnp.int32)
    ph_v = jnp.full((B,), view_id, jnp.int32)

    vae_encode = jax.jit(lambda vv, x, r: frozen.vae.apply(
        vv, x.astype(jnp.bfloat16), r, method=AutoencoderKL.encode_sample))
    timeit("vae encode", vae_encode, frozen.vae_vars, pix, key)

    text_fn = jax.jit(lambda tr, tx, tt: neti_text_conditioning(
        tx, tr, ids, ph_o, ph_v, tt, jnp.asarray(0), train=False))
    ctx, ctx_b = text_fn(trainable, frozen.text, t)
    timeit("text conditioning", text_fn, trainable, frozen.text, t)

    unet_fwd = jax.jit(lambda uv, x, tt, c, cb: frozen.unet.apply(
        uv, x, tt, c.astype(jnp.bfloat16), cb.astype(jnp.bfloat16)))
    timeit("unet fwd", unet_fwd, frozen.unet_vars, lat, t, ctx, ctx_b)

    def loss_unet(uv, x, tt, c, cb):
        return jnp.mean(frozen.unet.apply(
            uv, x, tt, c.astype(jnp.bfloat16),
            cb.astype(jnp.bfloat16)).astype(jnp.float32) ** 2)

    # weights as ARGUMENTS (closure capture would inline GBs of constants)
    unet_fwdbwd = jax.jit(jax.grad(loss_unet, argnums=(3, 4)))
    timeit("unet fwd+bwd(wrt ctx)", unet_fwdbwd,
           frozen.unet_vars, lat, t, ctx, ctx_b)

    def loss_full(tr, frz, tt_key):
        r_n, r_t, r_d = jax.random.split(tt_key, 3)
        c, cb = neti_text_conditioning(frz.text, tr, ids, ph_o, ph_v, t,
                                       jnp.asarray(0), rng=r_d, train=True)
        pred = frz.unet.apply(frz.unet_vars, lat, t,
                              c.astype(jnp.bfloat16), cb.astype(jnp.bfloat16))
        return jnp.mean(pred.astype(jnp.float32) ** 2)

    text_unet_bwd = jax.jit(jax.grad(loss_full))
    timeit("text+unet fwd+bwd", text_unet_bwd, trainable, frozen, key)


if __name__ == "__main__":
    main()
