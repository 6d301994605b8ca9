"""ValidationHandler: in-training evaluation.

Parity with /root/reference/training/validate.py:29-600:
  * DTU path (modes 2/4/5): full 34-view NVS sweep + masked metrics +
    result sheets (infer_dtu, reference validate.py:65-186);
  * mode-3 path: loop eval_placeholder_object_tokens (infer_mode3,
    reference validate.py:188-314) + object-token-only renders
    (infer_disentangled_objects_dtu, validate.py:317-385);
  * mode-0 path: VALIDATION_PROMPTS text-to-image grid (validate.py:388-524).

The reference's modes!=3 bug of iterating a None token list (validate.py:95,
SURVEY.md §3.5) is fixed deliberately: [None] is used.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

from view_neti_tpu.inference.pipeline import (encode_uncond, generate,
                                              make_denoise_fn)
from view_neti_tpu.inference.prompt_manager import PromptManager
from view_neti_tpu.schedulers.dpm_solver import DPMSolverSchedule
from view_neti_tpu.training import inference_dtu
from view_neti_tpu.utils.vis import to_pil

MAX_SHEET_ROWS = 14  # reference validate.py:39 (max_rows)


def select_validation_view_tokens(placeholder_view_tokens,
                                  validation_view_tokens,
                                  is_dtu: bool,
                                  max_rows: int = MAX_SHEET_ROWS):
    """Pick the view tokens for the validation prompt sheet.

    Parity with reference validate.py:456-467: explicit
    eval.validation_view_tokens wins; otherwise sub-sample large vocabularies
    (every 30th beyond 100 tokens; every 3rd beyond 15 on DTU) and cap at
    max_rows - 1 rows.
    """
    if validation_view_tokens is not None:
        view_tokens = list(validation_view_tokens)
    else:
        view_tokens = list(placeholder_view_tokens)
    if len(view_tokens) > 100:
        view_tokens = view_tokens[::30]
    if is_dtu and len(view_tokens) > 15:
        view_tokens = view_tokens[::3]
    return view_tokens[:max_rows - 1]


class ValidationHandler:
    def __init__(self, cfg, masks_root: Optional[str] = None,
                 calibration_dir: Optional[str] = None,
                 lpips_fn=None):
        self.cfg = cfg
        self.masks_root = masks_root
        self.calibration_dir = calibration_dir
        self.lpips_fn = lpips_fn

    # ------------------------------------------------------------------
    def infer(self, coach, trainable, step: int) -> Optional[Dict]:
        """Dispatch per learnable mode (reference validate.py:388-437):
        mode 3 -> per-scene DTU sweeps; DTU view vocab -> DTU sweep +
        disentangled object renders (reference :414-423); mode 0 -> prompt
        bank; non-DTU modes 1/2/4/5 -> view-token prompt sheet
        (reference :456-497)."""
        cfg = self.cfg
        if cfg.debug:
            num_steps = 2
        else:
            num_steps = cfg.eval.num_denoising_steps
        if cfg.learnable_mode == 3:
            return self.infer_mode3(coach, trainable, step, num_steps)
        if self._is_dtu(coach):
            results = self.infer_dtu(coach, trainable, step, num_steps)
            # reference validate.py:419-423 runs the disentangled object
            # renders for every non-mode-3 DTU run too
            if coach.placeholder_object_tokens:
                self.infer_disentangled_objects_dtu(
                    coach, trainable, step, num_steps,
                    coach.placeholder_object_tokens)
            return results
        if cfg.learnable_mode == 0:
            return self.infer_mode0(coach, trainable, step, num_steps)
        return self.infer_prompt_sheet(coach, trainable, step, num_steps)

    @staticmethod
    def _is_dtu(coach) -> bool:
        """DTU iff the view vocabulary is DTU-coded (reference
        validate.py:51-54)."""
        toks = coach.placeholder_view_tokens
        return bool(toks) and "dtu" in toks[0]

    # ------------------------------------------------------------------
    def infer_prompt_sheet(self, coach, trainable, step: int,
                           num_steps: int) -> Dict:
        """View-token prompt grid for non-DTU modes 1/2/4/5 (reference
        validate.py:456-497): one row per (sub-sampled) view token, plus a
        view-free row for modes with a learnable object."""
        cfg = self.cfg
        view_tokens = select_validation_view_tokens(
            coach.placeholder_view_tokens, cfg.eval.validation_view_tokens,
            is_dtu=False)
        if cfg.learnable_mode == 1:
            obj = coach.train_dataset.fixed_object_token
            prompts = [f"{v}. A photo of a {obj}" for v in view_tokens]
        else:
            obj = coach.placeholder_object_tokens[0]
            prompts = [f"A photo of a {obj}"]
            prompts += [f"{v}. A photo of a {obj}" for v in view_tokens]
        out = Path(cfg.log.exp_dir) / f"val-image-{step}.png"
        sheet = self._render_prompts(coach, trainable, num_steps, prompts,
                                     out)
        coach.logger.log_images("validation", [sheet], step)
        return {"sheet": str(out), "prompts": prompts}

    # ------------------------------------------------------------------
    def infer_mode0(self, coach, trainable, step: int,
                    num_steps: int) -> Dict:
        """Text-to-image over the validation prompt bank."""
        cfg = self.cfg
        frozen = coach.infer_frozen()
        text = frozen.text
        schedule = DPMSolverSchedule(
            prediction_type=frozen.schedule.prediction_type)
        timesteps = schedule.set_timesteps(num_steps)
        pm = PromptManager(
            coach.tokenizer, text, trainable, timesteps,
            placeholder_view_token_ids=coach.built.
            placeholder_view_token_ids,
            placeholder_object_token_ids=coach.built.
            placeholder_object_token_ids,
            dtype=coach.compute_dtype)
        uncond = encode_uncond(text.clip, text.clip_vars, coach.tokenizer)
        res = cfg.data.resolution
        denoise = make_denoise_fn(frozen.unet, frozen.unet_vars, schedule,
                                  num_steps, 7.5, coach.compute_dtype)
        token = coach.placeholder_object_tokens[0]
        # one-deep pipeline (r5): enqueue the next prompt's denoise before
        # fetching this prompt's images (see inference_dtu sweep loop)
        rows, pending = [], None
        for prompt_tmpl in cfg.eval.validation_prompts:
            prompt = prompt_tmpl.format(token)
            ctx, ctx_b = pm.embed_prompt(prompt)
            dev = generate(frozen.unet, frozen.unet_vars, frozen.vae,
                           frozen.vae_vars, schedule, ctx, ctx_b, uncond,
                           res, res, cfg.eval.validation_seeds, num_steps,
                           7.5, coach.compute_dtype, denoise_fn=denoise,
                           as_numpy=False)
            if pending is not None:
                rows.append(np.concatenate(list(np.asarray(pending)),
                                           axis=1))
            pending = dev
        if pending is not None:
            rows.append(np.concatenate(list(np.asarray(pending)), axis=1))
        sheet = to_pil(np.concatenate(rows, axis=0).astype(np.uint8))
        out_path = Path(cfg.log.exp_dir) / f"val-images-{step}.png"
        sheet.save(out_path)
        coach.logger.log_message(f"saved validation sheet {out_path}")
        coach.logger.log_images("validation", [np.asarray(sheet)], step)
        return {"sheet": str(out_path)}

    # ------------------------------------------------------------------
    def infer_dtu(self, coach, trainable, step: int, num_steps: int,
                  eval_placeholder_object_token: Optional[str] = None,
                  return_instead_of_save: bool = False,
                  on_missing_ckpt: str = "warn") -> Dict:
        """Full DTU sweep + metrics (reference validate.py:65-186)."""
        cfg = self.cfg
        cam_idxs, cam_idxs_train, _ = inference_dtu.get_cam_idxs(
            cfg.data.dtu_subset)
        if cfg.debug:
            cam_idxs = cam_idxs[:2]
        preds = inference_dtu.dtu_generate_camidxs_to_preds(
            coach, trainable, cam_idxs, step,
            num_denoising_steps=num_steps,
            seeds=cfg.eval.validation_seeds,
            eval_placeholder_object_token=eval_placeholder_object_token,
            calibration_dir=self.calibration_dir,
            on_missing_ckpt=on_missing_ckpt)
        # mode 3: GT comes from the evaluated scene's subdirectory
        data_dir = Path(str(cfg.data.train_data_dir))
        if (eval_placeholder_object_token
                and cfg.learnable_mode == 3
                and hasattr(coach.train_dataset,
                            "lookup_object_to_placeholder_object_token")):
            inv = {t: s for s, t in coach.train_dataset.
                   lookup_object_to_placeholder_object_token.items()}
            data_dir = data_dir / inv[eval_placeholder_object_token]
        gts = inference_dtu.dtu_get_gt_images(
            cam_idxs, data_dir, cfg.data.dtu_lighting,
            cfg.data.dtu_preprocess_key)
        scan_idx = self._scan_idx(data_dir)
        masks = inference_dtu.get_object_masks(
            cam_idxs, scan_idx, cfg.data.dtu_preprocess_key,
            masks_root=self.masks_root or inference_dtu.DTU_MASKS)
        (imgs_pred, imgs_gt, masks_arr, _, imgs_gt_plot
         ) = inference_dtu.process_imgs(cam_idxs, cam_idxs_train, preds,
                                        gts, masks)
        results = inference_dtu.get_result_metrics_and_grids(
            cam_idxs, cam_idxs_train, imgs_pred, imgs_gt, masks_arr,
            imgs_gt_plot, cfg.eval.validation_seeds,
            do_lpips=self.lpips_fn is not None, lpips_fn=self.lpips_fn,
            title_prefix=f"step {step} |")
        if return_instead_of_save:
            return results
        out_dir = Path(cfg.log.exp_dir)
        tag = (f"-{eval_placeholder_object_token}"
               if eval_placeholder_object_token else "")
        # persist the raw prediction bundle so in-training sweeps can be
        # re-scored offline (reference validate.py:115-123 saves
        # validation-iter_*.pt every round; scripts/summarize_dtu.py here
        # consumes the msgpack equivalent)
        from flax import serialization
        bundle = {
            "imgs_pred": np.stack(results["imgs_pred"]),  # (S, bs, h, w, 3)
            "imgs_gt": results["imgs_gt"],
            "masks": results["masks"],
            "metrics": {k: v for k, v in results.items()
                        if k.endswith("_mean")},
            "seeds": np.asarray(cfg.eval.validation_seeds),
        }
        bundle_path = out_dir / (
            f"validation-iter_{step}-denoisesteps_{num_steps}"
            f"_numseeds_{len(cfg.eval.validation_seeds)}{tag}.msgpack")
        bundle_path.write_bytes(serialization.msgpack_serialize(bundle))
        for i, fig in enumerate(results["figures"]):
            fig.savefig(out_dir / f"val-dtu-step{step}{tag}-seed{i}.png",
                        dpi=150)
        metrics = {k: v for k, v in results.items()
                   if k.endswith("_mean")}
        coach.logger.log_metrics(
            {f"val{tag}/{k}": v for k, v in metrics.items()}, step)
        coach.logger.log_images(
            f"val{tag}", [np.clip(g, 0, 1) for g in results["grids"]], step)
        coach.logger.log_message(f"DTU val step {step}{tag}: {metrics}")
        return results

    def _scan_idx(self, data_dir=None) -> int:
        name = Path(str(data_dir or self.cfg.data.train_data_dir)).name
        digits = "".join(c for c in name if c.isdigit())
        return int(digits) if digits else 0

    # ------------------------------------------------------------------
    def infer_mode3(self, coach, trainable, step: int,
                    num_steps: int,
                    do_t2i_generalization: Optional[bool] = None,
                    do_disentangled: bool = True) -> Dict:
        """Per-object DTU sweeps for multi-scene pretraining (reference
        validate.py:188-314), plus the optional T2I view-generalization
        sweep (validate.py:268-314; gated off by default exactly like the
        reference's DO_T2I_GENERALIZATION) and object-token-only renders
        (infer_disentangled_objects_dtu, validate.py:317-385)."""
        cfg = self.cfg
        if do_t2i_generalization is None:
            do_t2i_generalization = cfg.eval.do_t2i_generalization
        tokens = (cfg.eval.eval_placeholder_object_tokens
                  or coach.placeholder_object_tokens[:1])
        all_results = {}
        for tok in tokens:
            all_results[tok] = self.infer_dtu(
                coach, trainable, step, num_steps,
                eval_placeholder_object_token=tok)
        if do_disentangled:
            self.infer_disentangled_objects_dtu(coach, trainable, step,
                                                num_steps, tokens)
        if do_t2i_generalization:
            self.infer_t2i_generalization(coach, trainable, step, num_steps)
        return all_results

    def infer_t2i_generalization(self, coach, trainable, step: int,
                                 num_steps: int,
                                 prompts: Optional[Sequence[str]] = None
                                 ) -> None:
        """T2I view control across the DTU cameras (reference
        validate.py:268-314): render free-text objects ("a koala", ...)
        VIEW-CONDITIONED over every eval cam_idx with seed 0, and stack a
        GT strip from the first training subset under the predictions."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from view_neti_tpu.constants import T2I_GENERALIZATION_PROMPTS

        cfg = self.cfg
        prompts = list(prompts or T2I_GENERALIZATION_PROMPTS)
        cam_idxs, _, _ = inference_dtu.get_cam_idxs(cfg.data.dtu_subset)
        if cfg.debug:
            cam_idxs = cam_idxs[:2]
            prompts = prompts[:1]
        # GT reference strip from the first train subset (reference
        # validate.py:289-298)
        data_dir = Path(str(cfg.data.train_data_dir))
        if cfg.data.train_data_subsets:
            data_dir = data_dir / cfg.data.train_data_subsets[0]
        gts = inference_dtu.dtu_get_gt_images(
            cam_idxs, data_dir, cfg.data.dtu_lighting,
            cfg.data.dtu_preprocess_key)
        gt_arr = np.stack([np.asarray(gts[i], np.float32) / 255.0
                           for i in cam_idxs])
        for i, prompt in enumerate(prompts):
            preds = inference_dtu.dtu_generate_camidxs_to_preds(
                coach, trainable, cam_idxs, step,
                num_denoising_steps=num_steps, seeds=[0],
                eval_placeholder_object_token=prompt,
                calibration_dir=self.calibration_dir)
            pred_arr = np.concatenate(
                [preds[idx].astype(np.float32) / 255.0
                 for idx in cam_idxs])                      # (n, H, W, 3)
            # predictions row over GT row, half resolution (reference
            # validate.py:299-302 make_grid(...)[::2, ::2])
            nrow = len(cam_idxs)
            from view_neti_tpu.utils.vis import make_grid_np
            grid = np.concatenate([make_grid_np(pred_arr, nrow),
                                   make_grid_np(gt_arr, nrow)],
                                  axis=0)[::2, ::2]
            f, axs = plt.subplots(figsize=(nrow, 3))
            axs.imshow(np.clip(grid, 0, 1))
            axs.set_axis_off()
            axs.set(title=prompt)
            out = Path(cfg.log.exp_dir) / (
                f"validation-iter_{step}-denoisesteps_"
                f"{cfg.eval.num_denoising_steps}_upsample_"
                f"{cfg.eval.dtu_upsample_key}_imgs_t2i_{i}.png")
            f.savefig(out, dpi=150)
            plt.close(f)
            coach.logger.log_message(f"saved t2i-generalization sheet {out}")
            coach.logger.log_images(f"val_t2i_{i}",
                                    [np.clip(grid, 0, 1)], step)

    def infer_disentangled_objects_dtu(self, coach, trainable, step: int,
                                       num_steps: int,
                                       tokens: Sequence[str]) -> None:
        """Object-token-only renders, no view conditioning (reference
        validate.py:317-385, incl. the >10-token sub-sampling at :335-337)."""
        tokens = list(tokens)
        if len(tokens) > 10:
            tokens = tokens[::3][:10]
        self._render_prompt_bank(coach, trainable, step, num_steps, tokens,
                                 tag="disentangled",
                                 templates=["A photo of a {}"])

    def _render_prompt_bank(self, coach, trainable, step: int,
                            num_steps: int, tokens: Sequence[str],
                            tag: str, templates=None) -> None:
        cfg = self.cfg
        templates = templates or cfg.eval.validation_prompts
        if cfg.debug:
            templates = templates[:1]
        prompts = [tmpl.format(tok) for tok in tokens for tmpl in templates]
        out = Path(cfg.log.exp_dir) / f"val-{tag}-step{step}.png"
        self._render_prompts(coach, trainable, num_steps, prompts, out,
                             tag=tag)

    def _render_prompts(self, coach, trainable, num_steps: int,
                        prompts: Sequence[str], out_path: Path,
                        tag: str = "validation") -> None:
        """Render each prompt across the validation seeds; one row per
        prompt, stacked into a sheet at out_path. The mode-3 object-mapper
        slice is resolved from the object token found in each prompt."""
        cfg = self.cfg
        frozen = coach.infer_frozen()
        text = frozen.text
        schedule = DPMSolverSchedule(
            prediction_type=frozen.schedule.prediction_type)
        ts = schedule.set_timesteps(num_steps)
        pm = PromptManager(
            coach.tokenizer, text, trainable, ts,
            placeholder_view_token_ids=coach.built.
            placeholder_view_token_ids,
            placeholder_object_token_ids=coach.built.
            placeholder_object_token_ids,
            dtype=coach.compute_dtype)
        uncond = encode_uncond(text.clip, text.clip_vars, coach.tokenizer)
        # square renders at the model's native training resolution
        res = 512 if cfg.data.dtu_preprocess_key != -1 else 32
        denoise = make_denoise_fn(frozen.unet, None, schedule, num_steps,
                                  7.5, coach.compute_dtype)
        # one-deep pipeline (r5): enqueue the next prompt's denoise before
        # fetching this prompt's images (see inference_dtu sweep loop)
        rows, pending = [], None
        for prompt in prompts:
            # resolve the mode-3 mapper slice by exact TOKEN ID membership
            # (substring matching misfires on nested token texts, e.g.
            # "<statue>" vs "<statue2>" without enforced delimiters)
            prompt_ids = set(int(x) for x in np.asarray(
                coach.tokenizer(
                    prompt, padding="max_length", truncation=True,
                    max_length=coach.tokenizer.model_max_length
                ).input_ids[0]).tolist())
            object_idx = 0
            for i, tok_id in enumerate(
                    coach.built.placeholder_object_token_ids or ()):
                if int(tok_id) in prompt_ids:
                    object_idx = i
                    break
            ctx, ctx_b = pm.embed_prompt(prompt, object_idx=object_idx)
            dev = generate(frozen.unet, frozen.unet_vars, frozen.vae,
                           frozen.vae_vars, schedule, ctx, ctx_b,
                           uncond, res, res,
                           cfg.eval.validation_seeds, num_steps, 7.5,
                           coach.compute_dtype, denoise_fn=denoise,
                           as_numpy=False)
            if pending is not None:
                rows.append(np.concatenate(list(np.asarray(pending)),
                                           axis=1))
            pending = dev
        if pending is not None:
            rows.append(np.concatenate(list(np.asarray(pending)), axis=1))
        sheet = to_pil(np.concatenate(rows, axis=0))
        sheet.save(out_path)
        coach.logger.log_message(f"saved {tag} sheet {out_path}")
        return np.asarray(sheet)
