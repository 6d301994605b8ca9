"""DTU novel-view-synthesis evaluation engine.

Parity with /root/reference/training/inference_dtu.py:46-655, on the JAX
stack: rebuilds the conditioning state from checkpoint files (the reference
always reloads from disk so that in-training validation behaves exactly like
offline inference — inference_dtu.py:98-116; preserved here), extends the
view-mapper vocabulary to all 64 DTU cameras WITHOUT re-fitting the
normalization ranges, precomputes per-(t, l) prompt embeddings, runs the
jitted CFG denoise loop per camera, and computes the masked 300x400 metric
protocol (MSE/PSNR/SSIM/LPIPS, train/test split).
"""
from __future__ import annotations

import dataclasses as dc
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from PIL import Image, ImageOps

from view_neti_tpu.constants import DTU_MASKS, DTU_SPLIT_IDXS
from view_neti_tpu.checkpoint import CheckpointHandler
from view_neti_tpu.data import dtu as dtu_mod
from view_neti_tpu.inference.pipeline import (encode_uncond,
                                              generate_batch,
                                              make_denoise_fn)
from view_neti_tpu.inference.prompt_manager import PromptManager
from view_neti_tpu.ops import metrics as metrics_ops
from view_neti_tpu.schedulers.dpm_solver import DPMSolverSchedule
from view_neti_tpu.utils.vis import make_grid_np


def get_cam_idxs(dtu_subset: int
                 ) -> Tuple[List[int], List[int], List[int]]:
    """(all 34 eval idxs, train idxs, test idxs) — reference
    inference_dtu.py:46-56."""
    cam_idxs = sorted(DTU_SPLIT_IDXS['train'] + DTU_SPLIT_IDXS['test'])
    cam_idxs_train = dtu_mod.dtu_get_train_idxs(dtu_subset)
    cam_idxs_test = [i for i in cam_idxs if i not in cam_idxs_train]
    return cam_idxs, cam_idxs_train, cam_idxs_test


def dtu_get_gt_images(cam_idxs: Sequence[int], train_data_dir,
                      dtu_lighting: str, dtu_preprocess_key: int
                      ) -> Dict[int, Image.Image]:
    """GT images resized to eval resolution (reference
    inference_dtu.py:59-85)."""
    out = {}
    for idx in cam_idxs:
        f = Path(train_data_dir) / dtu_mod.dtu_cam_and_lighting_to_fname(
            idx, dtu_lighting)
        image = Image.open(f)
        if dtu_preprocess_key == -1:     # test-only miniature protocol
            image = image.resize((64, 48))
        elif dtu_preprocess_key == 0:
            image = ImageOps.expand(image, (0, 0, 0, 400), fill="black")
            assert image.size == (1600, 1600)
            image = image.resize((768, 768), Image.Resampling.BICUBIC)
        elif dtu_preprocess_key == 1:
            image = image.resize((768, 576))
        else:
            raise NotImplementedError(dtu_preprocess_key)
        out[idx] = image
    return out


def get_object_masks(cam_idxs: Sequence[int], scan_idx: int,
                     dtu_preprocess_key: int = 1,
                     masks_root: str = DTU_MASKS) -> Dict[int, Image.Image]:
    """RegNeRF idr object masks; all-white fallback when missing (reference
    inference_dtu.py:375-398)."""
    out = {}
    for cam_idx in cam_idxs:
        dir_mask = Path(masks_root) / f"scan{scan_idx}/mask"
        f_mask = (dir_mask / f"{cam_idx:03d}.png" if dir_mask.exists()
                  else dir_mask.parent / f"{cam_idx:03d}.png")
        try:
            mask = Image.open(f_mask).convert("RGB")
        except FileNotFoundError:
            mask = Image.new("RGB", (1600, 1200), color=(255, 255, 255))
        if dtu_preprocess_key == 1:
            mask = mask.resize((400, 300))
        out[cam_idx] = mask
    return out


def process_imgs(cam_idxs, cam_idxs_train, lookup_camidx_to_img_pred,
                 lookup_camidx_to_img_gt, lookup_camidx_to_mask):
    """Standardize arrays for metric computation (reference
    inference_dtu.py:401-466), NHWC numpy in [0, 1]:
      imgs_pred: (bs, n_seeds, 300, 400, 3)
      imgs_gt:   (bs, 300, 400, 3)
      masks:     (bs, 300, 400, 3) binarized at 0.01
      imgs_gt_plot: gt with a yellow header row on train views
    """
    imgs_pred = np.stack([lookup_camidx_to_img_pred[i] for i in cam_idxs])
    assert imgs_pred.ndim == 5, "expected (bs, n_seeds, h, w, 3)"
    imgs_gt = np.stack([np.asarray(lookup_camidx_to_img_gt[i])
                        for i in cam_idxs])
    masks = np.stack([np.asarray(lookup_camidx_to_mask[i])
                      for i in cam_idxs])

    h_pred, w_pred = imgs_pred.shape[2:4]
    h_gt, w_gt = imgs_gt.shape[1:3]
    assert h_gt / w_gt == h_pred / w_pred == 0.75, "DTU aspect must be 0.75"

    def resize_batch(arr, h_new=300, w_new=400):
        out = np.stack([
            np.asarray(Image.fromarray(a.astype(np.uint8)).resize(
                (w_new, h_new), Image.Resampling.BICUBIC))
            for a in arr.reshape((-1,) + arr.shape[-3:])])
        return out.reshape(arr.shape[:-3] + (h_new, w_new, 3))

    imgs_pred = resize_batch(imgs_pred).astype(np.float32) / 255.0
    imgs_gt = resize_batch(imgs_gt).astype(np.float32) / 255.0
    masks = resize_batch(masks).astype(np.float32) / 255.0
    masks = (masks > 0.01).astype(np.float32)

    headers = []
    for cam_idx in cam_idxs:
        if cam_idx in cam_idxs_train:
            header = np.ones((50, 400, 3), np.float32) * np.asarray(
                [1.0, 1.0, 0.0])
        else:
            header = np.zeros((50, 400, 3), np.float32)
        headers.append(header)
    imgs_gt_plot = np.stack([np.concatenate([h, g], axis=0)
                             for h, g in zip(headers, imgs_gt)])
    return imgs_pred, imgs_gt, masks, imgs_gt, imgs_gt_plot


def get_result_metrics_and_grids(cam_idxs, cam_idxs_train,
                                 imgs_pred_all_seeds, imgs_gt, masks,
                                 imgs_gt_plot, seeds, do_lpips=False,
                                 lpips_fn=None, title_prefix=""):
    """Masked metric suite + result sheets (reference
    inference_dtu.py:469-605). Returns the same dict keys."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    is_train = np.asarray([i in cam_idxs_train for i in cam_idxs])
    per_seed = {k: [] for k in ("mse", "psnr", "ssim", "lpips")}
    grids, figures, all_imgs_pred = [], [], []

    for si, seed in enumerate(seeds):
        imgs_pred = imgs_pred_all_seeds[:, si]
        all_imgs_pred.append(imgs_pred)
        mse_b = np.asarray(metrics_ops.masked_mse(
            jnp.asarray(imgs_pred), jnp.asarray(imgs_gt),
            jnp.asarray(masks)))
        psnr_b = np.asarray(metrics_ops.psnr_from_mse(jnp.asarray(mse_b)))
        ssim_b = np.asarray(metrics_ops.ssim(
            jnp.asarray(imgs_pred * masks), jnp.asarray(imgs_gt * masks)))
        if do_lpips and lpips_fn is not None:
            lp = lpips_fn(jnp.asarray(imgs_pred * masks) * 2 - 1,
                          jnp.asarray(imgs_gt * masks) * 2 - 1)
            lpips_b = np.asarray(lp)
        else:
            lpips_b = np.zeros_like(ssim_b)

        per_seed["mse"].append(mse_b)
        per_seed["psnr"].append(psnr_b)
        per_seed["ssim"].append(ssim_b)
        per_seed["lpips"].append(lpips_b)

        residual = ((imgs_pred - imgs_gt) + 1) / 2
        nrow = len(imgs_gt)
        grid = np.concatenate([
            make_grid_np(imgs_gt_plot, nrow),
            make_grid_np(imgs_pred, nrow),
            make_grid_np(imgs_pred * masks, nrow),
            make_grid_np(residual, nrow)], axis=0)
        grids.append(grid)

        def _m(arr):   # debug-truncated sweeps may lack a split
            return float(arr.mean()) if arr.size else float("nan")

        title = title_prefix + (
            f" PSNR: train {_m(psnr_b[is_train]):.3f}   "
            f"test {_m(psnr_b[~is_train]):.3f}  |  "
            f"MSE: train {_m(mse_b[is_train]):.3f}   "
            f"test {_m(mse_b[~is_train]):.3f}  |  "
            f"SSIM: train {_m(ssim_b[is_train]):.3f}   "
            f"test {_m(ssim_b[~is_train]):.3f}  |  "
            f"LPIPS: train {_m(lpips_b[is_train]):.3f}   "
            f"test {_m(lpips_b[~is_train]):.3f}")
        xticklabels = []
        for i, (it, p, m, s, l) in enumerate(
                zip(is_train, psnr_b, mse_b, ssim_b, lpips_b)):
            label = f"{p:.1f}\n{m:.4f}\n{s:.3f}\n{l:.3f}"
            if i == 0:
                label = "\n".join(
                    ml + mv for ml, mv in zip(
                        ["psnr ", "mse ", "ssim ", "lpips"],
                        label.split("\n")))
            if it:
                label += "\nTRAIN"
            xticklabels.append(label)
        img_ydim = imgs_gt.shape[1]
        xticks = np.linspace(0, grid.shape[1] - img_ydim,
                             len(xticklabels)) + img_ydim // 2
        f, axs = plt.subplots(figsize=(nrow, 5))
        axs.imshow(np.clip(grid, 0, 1))
        axs.set_xticks(xticks)
        axs.set_xticklabels(xticklabels, fontsize=6)
        axs.set_yticks([])
        axs.set(title=title)
        figures.append(f)

    def agg(key, mask):
        if not mask.any():      # debug-truncated sweeps may lack a split
            return float("nan")
        vals = np.concatenate([v[mask] for v in per_seed[key]])
        return float(vals.mean())

    return dict(
        figures=figures, grids=grids, imgs_pred=all_imgs_pred,
        imgs_gt=imgs_gt, imgs_gt_plot=imgs_gt_plot, masks=masks,
        mse_train_mean=agg("mse", is_train),
        mse_test_mean=agg("mse", ~is_train),
        psnr_train_mean=agg("psnr", is_train),
        psnr_test_mean=agg("psnr", ~is_train),
        ssim_train_mean=agg("ssim", is_train),
        ssim_test_mean=agg("ssim", ~is_train),
        lpips_train_mean=agg("lpips", is_train),
        lpips_test_mean=agg("lpips", ~is_train),
    )


def mse_to_psnr(mse):
    return -10.0 / np.log(10.0) * np.log(mse)


def split_placeholders(placeholder_tokens, placeholder_token_ids):
    """Split mixed token lists into view (<view prefix) and object subsets
    (reference inference_dtu.py:312-333)."""
    view, view_ids, obj, obj_ids = [], [], [], []
    for t, i in zip(placeholder_tokens, placeholder_token_ids):
        if t[:5] == "<view":
            view.append(t)
            view_ids.append(i)
        else:
            obj.append(t)
            obj_ids.append(i)
    return view, view_ids, obj, obj_ids


def dtu_generate_camidxs_to_preds(
        coach, trainable, cam_idxs: Sequence[int], step: int,
        num_denoising_steps: int = 30, seeds: Sequence[int] = (0, 1),
        eval_placeholder_object_token: Optional[str] = None,
        guidance_scale: float = 7.5,
        calibration_dir: Optional[str] = None,
        on_missing_ckpt: str = "warn") -> Dict[int, np.ndarray]:
    """Generate NVS predictions for every cam idx.

    Reload-from-checkpoint semantics (reference inference_dtu.py:88-199):
    mapper params come from the saved step-N checkpoint files, the view
    vocabulary is extended to all DTU cameras without re-fitting bounds,
    and prompts are "{view_token}. A photo of a {object}".

    The reference REQUIRES the reload so that in-training validation
    behaves exactly like offline inference (inference_dtu.py:118-123).
    When the step-N mapper file is absent this falls back to the LIVE
    trainable params — loudly: on_missing_ckpt="warn" logs a warning,
    "raise" raises FileNotFoundError (offline CLI default).
    """
    assert on_missing_ckpt in ("warn", "raise"), on_missing_ckpt
    cfg = coach.cfg
    exp_dir = Path(cfg.log.exp_dir)
    text = coach.built.frozen.text

    # --- reload mapper params from the saved checkpoints ----------------
    loaded = {k: v for k, v in trainable.items()}
    missing_ckpts = []
    if cfg.learnable_mode != 0:
        p = exp_dir / f"mapper-steps-{step}_view.msgpack"
        if p.exists():
            import jax
            _, payload = CheckpointHandler.load_mapper(p)
            loaded["view"] = jax.tree_util.tree_map(
                jnp.asarray, payload["mappers"]["view"]["params"])
        else:
            missing_ckpts.append(p.name)
    if cfg.learnable_mode != 1:
        p = exp_dir / f"mapper-steps-{step}_object.msgpack"
        if p.exists():
            _, payload = CheckpointHandler.load_mapper(p)
            stacked = [payload["mappers"][t]["params"]
                       for t in coach.placeholder_object_tokens]
            import jax
            loaded["object"] = jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *stacked)
        elif "object" in loaded and loaded["object"] is not None:
            missing_ckpts.append(p.name)
    if missing_ckpts:
        msg = (f"DTU eval at step {step}: mapper checkpoint(s) "
               f"{missing_ckpts} not found under {exp_dir}; the reference "
               "protocol requires reloading from disk so that validation "
               "== offline inference (reference inference_dtu.py:118-123)")
        if on_missing_ckpt == "raise":
            raise FileNotFoundError(msg)
        coach.logger.log_message(
            "WARNING: " + msg + " — falling back to LIVE trainable params")

    # --- extend view vocab to all DTU cameras ---------------------------
    kwargs = {}
    if calibration_dir is not None:
        kwargs["calibration_dir"] = calibration_dir
    lookup_tok, _ = dtu_mod.dtu_generate_dset_cam_tokens_params(**kwargs)
    table = coach.built.view_table
    new_tokens = [t for t in lookup_tok.values() if t not in table.tokens]
    coach.tokenizer.add_tokens(new_tokens)
    new_ids = [coach.tokenizer.convert_tokens_to_ids(t) for t in new_tokens]
    ext_table = table.extend(new_tokens, new_ids)
    text = dc.replace(
        text,
        view_table_ids=jnp.asarray(ext_table.token_ids),
        view_table_params=jnp.asarray(ext_table.params_scaled()))

    # --- conditioning + generation --------------------------------------
    schedule = DPMSolverSchedule(
        prediction_type=coach.built.frozen.schedule.prediction_type)
    timesteps = schedule.set_timesteps(num_denoising_steps)
    pm = PromptManager(
        coach.tokenizer, text, loaded, timesteps,
        placeholder_view_token_ids=list(ext_table.token_ids),
        placeholder_object_token_ids=coach.built.
        placeholder_object_token_ids,
        dtype=coach.compute_dtype)

    if eval_placeholder_object_token:
        object_token = eval_placeholder_object_token
    elif cfg.learnable_mode in (2, 3, 4, 5):
        object_token = coach.placeholder_object_tokens[0]
    else:
        object_token = cfg.data.fixed_object_token_or_path
    # mode-3 bank slice for the evaluated scene token
    object_idx = (coach.placeholder_object_tokens.index(object_token)
                  if object_token in coach.placeholder_object_tokens else 0)

    if cfg.data.dtu_preprocess_key == -1:   # test-only miniature protocol
        width, height = 64, 48
    elif cfg.data.dtu_preprocess_key == 1:
        width, height = 768, 576
    else:
        width, height = 768, 768

    frozen = coach.infer_frozen()
    uncond = encode_uncond(text.clip, text.clip_vars, coach.tokenizer)
    # batch several camera views through one denoise loop (TPU redesign:
    # the reference runs one view at a time, inference_dtu.py:246-260).
    # On one chip the 2xCFG x 3-seed batch already saturates the MXU, so
    # the default is 1; on a mesh the view batch defaults to the dp size
    # and the (views x seeds) denoise batch dp-shards across chips.
    mesh = getattr(coach, "mesh", None)
    n_dp = mesh.shape["dp"] if mesh is not None else 1
    vb_env = os.environ.get("VIEW_NETI_VIEW_BATCH")
    vb = int(vb_env) if vb_env else n_dp
    denoise = make_denoise_fn(frozen.unet, frozen.unet_vars, schedule,
                              num_denoising_steps, guidance_scale,
                              coach.compute_dtype, mesh=mesh)
    out: Dict[int, np.ndarray] = {}
    camidx_to_token = {i: t for i, t in lookup_tok.items()}
    # One-deep software pipeline (r5): dispatch chunk i+1's conditioning +
    # denoise BEFORE fetching chunk i's images. All device work is async,
    # so the ~0.16 s/chunk uint8 fetch over the tunnel overlaps the next
    # chunk's denoise instead of idling the chip (the reference fetches
    # synchronously per view, inference_dtu.py:246-260 — one GPU, no
    # tunnel, nothing to overlap).
    pending = None                        # (chunk, on-device images)
    def _drain(p):
        imgs = np.asarray(p[1])
        for ci, cam_idx in enumerate(p[0]):
            out[cam_idx] = imgs[ci]       # (n_seeds, H, W, 3) uint8
    for start in range(0, len(cam_idxs), vb):
        chunk = list(cam_idxs[start:start + vb])
        prompts = [f"{camidx_to_token[ci]}. A photo of a {object_token}"
                   for ci in chunk]
        # one batched conditioning precompute per chunk (r4): the view
        # axis rides the text batch, (T, 16, C, L, D)
        contexts, contexts_b = pm.embed_prompts(prompts,
                                                object_idx=object_idx)
        full = len(chunk) == vb
        dev_imgs = generate_batch(
            frozen.unet, frozen.unet_vars, frozen.vae, frozen.vae_vars,
            schedule, contexts, contexts_b, uncond, height, width, seeds,
            num_denoising_steps, guidance_scale, coach.compute_dtype,
            denoise_fn=denoise if full else None,
            mesh=mesh if full else None, as_numpy=False)
        if pending is not None:
            _drain(pending)
        pending = (chunk, dev_imgs)
    if pending is not None:
        _drain(pending)
    return out
